"""Paired-end end-to-end SAM parity vs CPU bwa mem: insert-size inference,
mate rescue, pair scoring, PE flags/TLEN/mate fields must all be
bit-identical (BASELINE.md acceptance config 3 scaled down)."""
import subprocess
import sys
from pathlib import Path

import pytest

from bwamem_tpu.io.fastq import read_fastx, interleave

N_PAIRS = 100


@pytest.fixture(scope="module")
def pe_files(tiny_dataset, tmp_path_factory):
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    import simdata
    d = tmp_path_factory.mktemp("pe")
    # regenerate the same genome the fixture used (seed=7, 2 contigs)
    contigs = simdata.make_genome(200_000, seed=7, n_contigs=2)
    reads = simdata.sim_reads(contigs, 2 * N_PAIRS, read_len=101, seed=21,
                              paired=True)
    fq1, fq2 = str(d / "r1.fq"), str(d / "r2.fq")
    simdata.write_fastq(reads[0::2], fq1)
    simdata.write_fastq(reads[1::2], fq2)
    return fq1, fq2


@pytest.fixture(scope="module")
def oracle_pe_sam(oracle, tiny_dataset, pe_files):
    out = subprocess.run(
        [str(oracle), "mem", "-t", "1", tiny_dataset["prefix"],
         pe_files[0], pe_files[1]],
        capture_output=True, text=True, check=True)
    recs = [l for l in out.stdout.splitlines() if not l.startswith("@")]
    return recs


def test_pe_sam_matches_cpu_bwa(oracle_pe_sam, tiny_dataset, built_index,
                                pe_files):
    from bwamem_tpu.pipeline.align import Aligner
    reads = list(interleave(read_fastx(pe_files[0]),
                            read_fastx(pe_files[1])))
    al = Aligner(built_index)
    got = al.align_batch_pe(reads, 0)
    have = [l for s in got for l in s.rstrip("\n").split("\n") if l]
    want = oracle_pe_sam
    n_bad = sum(1 for w, h in zip(want, have) if w != h)
    first = next(((w, h) for w, h in zip(want, have) if w != h), None)
    assert len(want) == len(have), (len(want), len(have))
    assert n_bad == 0, f"{n_bad}/{len(want)} records differ; first: {first!r}"
