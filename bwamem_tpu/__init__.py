"""bwamem_tpu — a TPU-native BWA-MEM-class short-read aligner.

Built from scratch in JAX/Pallas with the capabilities of the reference GPU
aligner (sunwookim028/bwa-mem-gpu, itself a CUDA rewrite of lh3/bwa 0.7.17
`mem`).  The behavior oracle is upstream CPU BWA-MEM; the acceleration
architecture is TPU-first: fixed-shape SoA read batches, FM-index queries as
vectorized gather+popcount, Smith-Waterman as row-parallel scans / Pallas
kernels, and data parallelism over `jax.sharding.Mesh`.

64-bit integer support is enabled at import: FM-index interval arithmetic on
human-scale genomes (2*l_pac > 2^32) requires int64 (reference: bwtint_t is
uint64_t, bwt.h:46).  Small-genome indexes use int32 device arrays for speed;
dtypes are always explicit throughout the package.
"""
import os

import jax

jax.config.update("jax_enable_x64", True)

# The axon TPU PJRT plugin ignores the JAX_PLATFORMS environment variable;
# honor it here through the config API so `JAX_PLATFORMS=cpu python -m
# bwamem_tpu.cli ...` (and any other entry point) really runs on the CPU.
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

# Persistent compilation cache.  The axon backend also ignores the
# JAX_COMPILATION_CACHE_DIR environment variable unless mirrored through the
# config API; without it every process pays the full XLA compile of the big
# fused pipeline programs (minutes) on startup.  Opt out with
# BWAMEM_TPU_JAX_CACHE=0; override the location by setting the variable to a
# path.
_cache = os.environ.get("BWAMEM_TPU_JAX_CACHE", "")
if _cache != "0":
    if not _cache or _cache == "1":
        _cache = os.environ.get("JAX_COMPILATION_CACHE_DIR") or \
            os.path.join(os.path.expanduser("~"), ".cache", "bwamem_tpu_jax")
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

__version__ = "0.1.0"

from bwamem_tpu.config import MemOptions  # noqa: E402,F401
