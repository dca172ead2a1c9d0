"""Scale-out driver: windows data-parallel across processes/hosts.

The reference's scale-out model is "run one dindel process per window
file on a cluster, then merge the GLF file list"
(makeWindows.py:46-54, mergeOutputDiploid.py:250-268).  This driver
automates the same model:

- single host: a process pool over window files, each worker running the
  (batched) window engine; per-shard GLF outputs are merged in window
  order, preserving the reference's restartability property (a shard is
  the checkpoint granularity — rerun a file, rerun its windows);
- multi host: call run_shards with this host's slice of the window files
  (e.g. files[host_id::num_hosts] under jax.distributed); every host
  writes its own GLF shards and host 0 merges, exactly like the
  list-of-GLF-files contract of the merge scripts.
"""

from __future__ import annotations

import os
from multiprocessing import get_context
from typing import List, Optional

from ..config import Parameters
from ..model import LibraryCollection


def _run_one(args):
    (window_file, bam_paths, fasta_path, params, lib_file, backend,
     out_prefix) = args
    # imports inside the worker keep fork-safety with jax
    from ..engine.batched import BatchedWindowEngine
    import numpy as np
    libraries = LibraryCollection()
    if lib_file:
        # NB: obs_params.map_unmapped_reads (the insert-size positional
        # prior) stays off — dead code in the reference binary
        # (DInDel.cpp:3979-3986); enable via Parameters explicitly
        params.map_unmapped_reads = True
        libraries.add_from_file(lib_file)
    params.file_name = out_prefix
    dp_impl = "pallas" if backend == "pallas" else "xla"
    dtype = np.float32 if backend == "pallas" else np.float64
    eng = BatchedWindowEngine([*bam_paths], fasta_path, params, libraries,
                              dp_impl=dp_impl, dtype=dtype)
    glf_path = out_prefix + ".glf.txt"
    eng.detect_indels(window_file, glf_path)
    stats = eng.stats.summary()
    eng.close()
    return glf_path, stats


def run_shards(window_files: List[str], bam_paths: List[str],
               fasta_path: str, params: Parameters, output_prefix: str,
               lib_file: Optional[str] = None, backend: str = "xla",
               num_workers: int = 0):
    """Run every window file, in parallel when num_workers > 1.
    Returns (glf_paths in window order, list of per-shard stats)."""
    jobs = []
    for i, wf in enumerate(window_files):
        jobs.append((wf, bam_paths, fasta_path, params, lib_file, backend,
                     f"{output_prefix}.shard{i}"))
    if num_workers and num_workers > 1 and len(jobs) > 1:
        ctx = get_context("spawn")  # fork is unsafe after jax init
        with ctx.Pool(num_workers) as pool:
            results = pool.map(_run_one, jobs)
    else:
        results = [_run_one(j) for j in jobs]
    glf_paths = [r[0] for r in results]
    stats = [r[1] for r in results]
    # shard-consistency check (SURVEY.md §5): every window of every input
    # file is processed exactly once — the distributed-era analogue of the
    # reference's duplicate-read buffer check
    for wf, st in zip(window_files, stats):
        with open(wf) as f:
            n_windows = sum(1 for line in f if line.strip())
        if st.get("windows_total") != n_windows:
            raise RuntimeError(
                f"shard consistency: {wf} has {n_windows} windows but the "
                f"worker processed {st.get('windows_total')}")
    return glf_paths, stats


def run_and_merge_diploid(window_files: List[str], bam_paths: List[str],
                          fasta_path: str, params: Parameters,
                          output_prefix: str, vcf_path: str,
                          sample_id: str = "SAMPLE",
                          num_workers: int = 0, backend: str = "xla"):
    """Full diploid pipeline tail: sharded calling + ordered VCF merge."""
    from .merge_diploid import merge_output_diploid
    params.do_diploid = True
    glf_paths, stats = run_shards(window_files, bam_paths, fasta_path,
                                  params, output_prefix,
                                  num_workers=num_workers, backend=backend)
    merge_output_diploid(glf_paths, vcf_path, fasta_path, sample_id=sample_id)
    return glf_paths, stats
