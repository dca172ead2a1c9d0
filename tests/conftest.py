import os
import subprocess
import sys
from pathlib import Path

# Force a CPU mesh with 8 virtual devices for sharding tests; the single
# real TPU is exercised only by bench.py.  (The environment presets
# JAX_PLATFORMS=axon, so this must be an override, not a setdefault.)
os.environ["JAX_PLATFORMS"] = "cpu"
prev = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in prev:
    os.environ["XLA_FLAGS"] = (prev + " --xla_force_host_platform_device_count=8").strip()

# sitecustomize imports jax at interpreter start (before this file runs), so
# the env vars above were already captured — override the live config too.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# CPU-only cache dir: axon/TPU runs write CPU AOT entries compiled with
# the REMOTE host's machine features into their cache; loading those in
# CPU tests changes codegen (FMA contraction) and breaks bit-equality
# assertions between fresh and cached executables.
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 "/tmp/jax_cache_cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_cpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

REFSHIM = REPO / "native" / "refshim"
REF_HMM = REFSHIM / "ref_hmm"
REF_NW = REFSHIM / "ref_nw"


def _build(target: str, sources, extra=()):
    exe = REFSHIM / target
    srcs = [str(s) for s in sources]
    newest = max(os.path.getmtime(s) for s in srcs if os.path.exists(s))
    if exe.exists() and os.path.getmtime(exe) > newest:
        return exe
    cmd = ["g++", "-O2", "-std=c++11", "-Wno-deprecated",
           "-include", str(REFSHIM / "stringhash_preempt.h"),
           "-I", str(REFSHIM), "-I", "/root/reference",
           *extra, *srcs, "-o", str(exe)]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
    except (subprocess.CalledProcessError, FileNotFoundError):
        return None
    return exe


def ref_hmm_exe():
    """Build (if possible) the reference-HMM differential driver."""
    if not Path("/root/reference/ObservationModelFB.cpp").exists():
        return None
    return _build("ref_hmm", [REFSHIM / "hmm_driver.cpp",
                              "/root/reference/ObservationModelFB.cpp"])


def ref_hapgen_exe():
    """Build (if possible) the reference haplotype-generation differential
    driver (HaplotypeDistribution + HDIterator2)."""
    if not Path("/root/reference/HaplotypeDistribution.cpp").exists():
        return None
    return _build("ref_hapgen", [REFSHIM / "hapgen_driver.cpp",
                                 "/root/reference/HaplotypeDistribution.cpp",
                                 "/root/reference/HapBlock.cpp"])


def ref_callers_exe():
    """Build (if possible) the reference diploid/pooled-caller differential
    driver (compiles the whole DInDel.cpp behind stub bam/boost headers)."""
    if not Path("/root/reference/DInDel.cpp").exists():
        return None
    return _build(
        "ref_callers",
        [REFSHIM / "callers_driver.cpp", REFSHIM / "refshim_defs.cpp",
         "/root/reference/DInDel.cpp",
         "/root/reference/ObservationModelFB.cpp",
         "/root/reference/HaplotypeDistribution.cpp",
         "/root/reference/HapBlock.cpp", "/root/reference/Faster.cpp"],
        extra=["-w", "-fpermissive", "-I", "/root/reference/seqan_library"])


def ref_getreads_exe():
    """Build (if possible) the DetInDel::getReads differential driver
    (whole DInDel.cpp behind the stub headers, with the bam.h fetch hook
    replaying synthetic bam1_t records)."""
    if not Path("/root/reference/DInDel.cpp").exists():
        return None
    return _build(
        "ref_getreads",
        [REFSHIM / "getreads_driver.cpp", REFSHIM / "refshim_defs.cpp",
         "/root/reference/DInDel.cpp",
         "/root/reference/ObservationModelFB.cpp",
         "/root/reference/HaplotypeDistribution.cpp",
         "/root/reference/HapBlock.cpp", "/root/reference/Faster.cpp"],
        extra=["-w", "-fpermissive", "-I", "/root/reference/seqan_library"])


def ref_window_exe():
    """Build (if possible) the composed whole-window differential driver
    (reference detectIndels end-to-end over synthetic bam1_t streams).

    -ftrivial-auto-var-init=zero + the driver's zeroing operator new pin
    the reference's uninitialized-memory UB (e.g. the --faster path's
    never-written MLAlignment stat fields, MLAlignment.hpp:35-48) to the
    defined-behavior zero subset our port implements."""
    if not Path("/root/reference/DInDel.cpp").exists():
        return None
    return _build(
        "ref_window",
        [REFSHIM / "window_driver.cpp", REFSHIM / "refshim_defs.cpp",
         "/root/reference/DInDel.cpp",
         "/root/reference/ObservationModelFB.cpp",
         "/root/reference/HaplotypeDistribution.cpp",
         "/root/reference/HapBlock.cpp", "/root/reference/Faster.cpp"],
        extra=["-w", "-fpermissive", "-ftrivial-auto-var-init=zero",
               "-I", "/root/reference/seqan_library"])


def ref_faster_exe():
    """Build (if possible) the reference sparse-HMM (--faster)
    differential driver."""
    if not Path("/root/reference/Faster.cpp").exists():
        return None
    return _build("ref_faster", [REFSHIM / "faster_driver.cpp",
                                 "/root/reference/Faster.cpp"])


def ref_nw_exe():
    """Build (if possible) the reference-SeqAn-NW differential driver."""
    if not Path("/root/reference/seqan_library").exists():
        return None
    exe = REFSHIM / "ref_nw"
    src = REFSHIM / "nw_driver.cpp"
    if not src.exists():
        return None
    if exe.exists() and os.path.getmtime(exe) > os.path.getmtime(src):
        return exe
    cmd = ["g++", "-O2", "-std=c++11", "-fpermissive", "-w",
           "-include", str(REFSHIM / "stringhash_preempt.h"),
           "-I", str(REFSHIM), "-I", "/root/reference",
           "-I", "/root/reference/seqan_library",
           str(src), "-o", str(exe)]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
    except (subprocess.CalledProcessError, FileNotFoundError):
        return None
    return exe
