"""250bp-read SAM parity (BASELINE.md acceptance ladder config 4: longer
reads exercise wider bands, more indels per read, and multi-chain splits)."""
import subprocess
import sys
from pathlib import Path

import pytest

from bwamem_tpu.io.fastq import read_fastx

N_READS = 48


@pytest.fixture(scope="module")
def long_fq(tiny_dataset, tmp_path_factory):
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    import simdata
    contigs = simdata.make_genome(200_000, seed=7, n_contigs=2)
    reads = simdata.sim_reads(contigs, N_READS, read_len=250, seed=33,
                              sub_rate=0.02, indel_rate=0.002)
    fq = str(tmp_path_factory.mktemp("l250") / "l250.fq")
    simdata.write_fastq(reads, fq)
    return fq


def test_250bp_sam_matches_cpu_bwa(oracle, tiny_dataset, built_index,
                                   long_fq):
    out = subprocess.run(
        [str(oracle), "mem", "-t", "1", tiny_dataset["prefix"], long_fq],
        capture_output=True, text=True, check=True)
    want = [l for l in out.stdout.splitlines() if not l.startswith("@")]

    from bwamem_tpu.pipeline.align import Aligner
    reads = list(read_fastx(long_fq))
    al = Aligner(built_index)
    got = al.align_batch_se(reads, 0)
    have = [l for s in got for l in s.rstrip("\n").split("\n") if l]
    n_bad = sum(1 for w, h in zip(want, have) if w != h)
    first = next(((w, h) for w, h in zip(want, have) if w != h), None)
    assert len(want) == len(have), (len(want), len(have))
    assert n_bad == 0, f"{n_bad}/{len(want)} records differ; first: {first!r}"
