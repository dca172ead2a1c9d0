"""Run statistics and profiling counters.

The reference's only observability channels are ad-hoc couts and the GLF
diagnostics columns (SURVEY.md §5); here every run tracks per-stage
timing and throughput (windows/s, pair-HMM cells/s, reads fetched,
error-row counts) and can emit a jax.profiler trace."""

from __future__ import annotations

import contextlib
import json
import time
from dataclasses import dataclass, field
from typing import Dict, Optional


@dataclass
class RunStats:
    windows_total: int = 0
    windows_ok: int = 0
    windows_error: int = 0
    error_messages: Dict[str, int] = field(default_factory=dict)
    reads_processed: int = 0
    haps_generated: int = 0
    pairs_scored: int = 0
    cells_scored: int = 0
    stage_seconds: Dict[str, float] = field(default_factory=dict)
    wall_start: float = field(default_factory=time.perf_counter)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.stage_seconds[name] = (self.stage_seconds.get(name, 0.0)
                                        + time.perf_counter() - t0)

    def record_window(self, n_reads: int, n_haps: int, max_read_len: int,
                      max_hap_len: int, num_t: int) -> None:
        self.windows_ok += 1
        self.reads_processed += n_reads
        self.haps_generated += n_haps
        self.pairs_scored += n_reads * n_haps
        self.cells_scored += (n_reads * n_haps * max_read_len
                              * 2 * (max_hap_len + 2) * num_t)

    def record_error(self, message: str) -> None:
        self.windows_error += 1
        self.error_messages[message] = self.error_messages.get(message, 0) + 1

    def summary(self) -> dict:
        wall = time.perf_counter() - self.wall_start
        return {
            "windows_total": self.windows_total,
            "windows_ok": self.windows_ok,
            "windows_error": self.windows_error,
            "error_messages": self.error_messages,
            "reads_processed": self.reads_processed,
            "haps_generated": self.haps_generated,
            "pairs_scored": self.pairs_scored,
            "cells_scored": self.cells_scored,
            "wall_seconds": wall,
            "windows_per_sec": self.windows_ok / wall if wall > 0 else 0.0,
            "cells_per_sec": self.cells_scored / wall if wall > 0 else 0.0,
            "stage_seconds": self.stage_seconds,
        }

    def dump(self, path: Optional[str] = None) -> str:
        s = json.dumps(self.summary(), indent=2, sort_keys=True)
        if path:
            with open(path, "w") as f:
                f.write(s + "\n")
        return s


@contextlib.contextmanager
def maybe_profile(trace_dir: Optional[str]):
    """jax.profiler trace when a directory is given."""
    if not trace_dir:
        yield
        return
    import jax
    with jax.profiler.trace(trace_dir):
        yield
