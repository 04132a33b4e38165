"""Test configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding paths compile
and execute without TPU hardware (the driver separately dry-runs the
multi-chip path; real-chip benchmarks happen in bench.py).
"""
import os
import subprocess
import sys
from pathlib import Path

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the shell may preset a TPU
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
# No persistent compilation cache under pytest: serializing the giant fused
# pipeline executables from a long-lived suite process segfaults inside the
# cache write (zstd over a multi-hundred-MB CPU executable; reproduced at
# tests 45-47 of the full suite, never in isolation).  CPU compiles are
# cheap; the cache's value is the TPU production path, which keeps it.
os.environ["BWAMEM_TPU_JAX_CACHE"] = "0"

# The axon PJRT plugin ignores the JAX_PLATFORMS env var — it must be forced
# through the config API before any backend initialization.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu"

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_xla_between_modules():
    """Free compiled executables between test modules.  With ~50 tests'
    worth of live CPU executables in one process, XLA's
    backend_compile_and_load segfaults on the next giant fused-pipeline
    compile (reproduced at tests 45-47 of the full suite across two
    rounds; every module passes in isolation).  Dropping the jit caches
    at module boundaries keeps the live-executable population bounded at
    what one module needs."""
    yield
    jax.clear_caches()


REPO = Path(__file__).resolve().parent.parent
ORACLE = REPO / "tools" / "oracle" / "bwa_oracle"
TESTDATA = REPO / ".testdata"


def _ensure_oracle() -> Path:
    if not ORACLE.exists():
        subprocess.run(["make", "-C", str(ORACLE.parent)], check=True,
                       capture_output=True)
    return ORACLE


@pytest.fixture(scope="session")
def oracle() -> Path:
    return _ensure_oracle()


@pytest.fixture(scope="session")
def built_index(tiny_dataset):
    """Our index for the tiny dataset, cached across test sessions."""
    from bwamem_tpu.index import BwaIndex, build_index
    prefix = tiny_dataset["prefix"] + ".ours"
    try:
        idx = BwaIndex.load(prefix)
        if idx.kmer_table is not None:
            return idx
    except FileNotFoundError:
        pass
    # with the k-mer fast-start table: every oracle-exactness test then
    # also covers the kmer-skip seeding path (on by default)
    idx = build_index(tiny_dataset["fa"], with_kmer_table=True)
    idx.save(prefix)
    return idx


@pytest.fixture(scope="session")
def tiny_dataset(oracle):
    """Small synthetic genome + reads, indexed by the oracle."""
    sys.path.insert(0, str(REPO / "tools"))
    import simdata

    TESTDATA.mkdir(exist_ok=True)
    prefix = TESTDATA / "t200k"
    fa, fq = str(prefix) + ".fa", str(prefix) + ".fq"
    if not os.path.exists(str(prefix) + ".sa"):
        contigs = simdata.make_genome(200_000, seed=7, n_contigs=2)
        simdata.write_fasta(contigs, fa)
        reads = simdata.sim_reads(contigs, 500, read_len=101, seed=8)
        simdata.write_fastq(reads, fq)
        subprocess.run([str(oracle), "index", fa, str(prefix)], check=True,
                       capture_output=True)
    return {"prefix": str(prefix), "fa": fa, "fq": fq}
