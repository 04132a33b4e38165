"""1000bp-read SAM parity: exercises the long-read chained-seed re-scoring
(mem_flt_chained_seeds + mem_seed_sw, bwamem.c:578-625 — gated ON for
l_query ≳ 800bp at default settings), score-keyed work order, band
doubling, and wide extension shape classes."""
import subprocess
import sys
from pathlib import Path

import pytest

from bwamem_tpu.io.fastq import read_fastx

N_READS = 24


@pytest.fixture(scope="module")
def long1k_fq(tmp_path_factory):
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    import simdata
    contigs = simdata.make_genome(200_000, seed=7, n_contigs=2)
    reads = simdata.sim_reads(contigs, N_READS, read_len=1000, seed=55,
                              sub_rate=0.02, indel_rate=0.003)
    fq = str(tmp_path_factory.mktemp("l1000") / "l1000.fq")
    simdata.write_fastq(reads, fq)
    return fq


def test_1000bp_sam_matches_cpu_bwa(oracle, tiny_dataset, built_index,
                                    long1k_fq):
    out = subprocess.run(
        [str(oracle), "mem", "-t", "1", tiny_dataset["prefix"], long1k_fq],
        capture_output=True, text=True, check=True)
    want = [l for l in out.stdout.splitlines() if not l.startswith("@")]

    from bwamem_tpu.pipeline.align import Aligner
    reads = list(read_fastx(long1k_fq))
    al = Aligner(built_index)
    got = al.align_batch_se(reads, 0)
    have = [l for s in got for l in s.rstrip("\n").split("\n") if l]
    assert len(want) == len(have), (len(want), len(have))
    n_bad = sum(1 for w, h in zip(want, have) if w != h)
    first = next(((w, h) for w, h in zip(want, have) if w != h), None)
    assert n_bad == 0, f"{n_bad}/{len(want)} records differ; first: {first!r}"


@pytest.fixture(scope="module")
def noisy1k_fq(tmp_path_factory):
    """ONT-like error profile: drives mem_seed_sw DROPS (weak short seeds)
    and >32-run CIGARs (the grow-and-retry in run_cigar_jobs)."""
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    import simdata
    contigs = simdata.make_genome(200_000, seed=7, n_contigs=2)
    reads = simdata.sim_reads(contigs, 16, read_len=1000, seed=66,
                              sub_rate=0.08, indel_rate=0.01)
    fq = str(tmp_path_factory.mktemp("l1000e") / "l1000e.fq")
    simdata.write_fastq(reads, fq)
    return fq


def test_noisy_1000bp_sam_matches_cpu_bwa(oracle, tiny_dataset, built_index,
                                          noisy1k_fq):
    out = subprocess.run(
        [str(oracle), "mem", "-t", "1", tiny_dataset["prefix"], noisy1k_fq],
        capture_output=True, text=True, check=True)
    want = [l for l in out.stdout.splitlines() if not l.startswith("@")]

    from bwamem_tpu.pipeline.align import Aligner
    reads = list(read_fastx(noisy1k_fq))
    al = Aligner(built_index)
    got = al.align_batch_se(reads, 0)
    have = [l for s in got for l in s.rstrip("\n").split("\n") if l]
    assert len(want) == len(have), (len(want), len(have))
    n_bad = sum(1 for w, h in zip(want, have) if w != h)
    assert n_bad == 0, f"{n_bad}/{len(want)} records differ"


@pytest.fixture(scope="module")
def long5k_fq(tmp_path_factory):
    """Reads past the 4095-column packing bound of the Mosaic/short-read
    kernels: these lanes must take the width-adaptive XLA extension
    (extend_host submit long_sel; the CPU spec handles arbitrary lengths,
    bwamem.c:730-741 — this used to raise ValueError at 4096bp)."""
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    import simdata
    contigs = simdata.make_genome(200_000, seed=7, n_contigs=2)
    reads = simdata.sim_reads(contigs, 4, read_len=5000, seed=77,
                              sub_rate=0.02, indel_rate=0.002)
    fq = str(tmp_path_factory.mktemp("l5000") / "l5000.fq")
    simdata.write_fastq(reads, fq)
    return fq


def test_5000bp_sam_matches_cpu_bwa(oracle, tiny_dataset, built_index,
                                    long5k_fq):
    out = subprocess.run(
        [str(oracle), "mem", "-t", "1", tiny_dataset["prefix"], long5k_fq],
        capture_output=True, text=True, check=True)
    want = [l for l in out.stdout.splitlines() if not l.startswith("@")]

    from bwamem_tpu.pipeline.align import Aligner
    reads = list(read_fastx(long5k_fq))
    al = Aligner(built_index)
    got = al.align_batch_se(reads, 0)
    have = [l for s in got for l in s.rstrip("\n").split("\n") if l]
    assert len(want) == len(have), (len(want), len(have))
    n_bad = sum(1 for w, h in zip(want, have) if w != h)
    first = next(((w, h) for w, h in zip(want, have) if w != h), None)
    assert n_bad == 0, f"{n_bad}/{len(want)} records differ; first: {first!r}"


def test_rescoring_gate():
    """The l_query gate (bwamem.c:610-611) must be OFF for short reads and
    ON for 1000bp reads at default options."""
    import math
    from bwamem_tpu.pipeline.chainflt_host import (MEM_MINSC_COEF,
                                                   MEM_SEEDSW_COEF)
    assert MEM_MINSC_COEF * math.log(250) > MEM_SEEDSW_COEF * 250
    assert MEM_MINSC_COEF * math.log(1000) <= MEM_SEEDSW_COEF * 1000
