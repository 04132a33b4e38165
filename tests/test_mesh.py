"""Multi-chip production path: the full SE and PE pipelines shard-mapped
over an 8-virtual-device mesh must stay bit-identical to CPU bwa mem.

This is the TPU-native analog of SURVEY.md §5.8: reads data-parallel over
the mesh axis, FM-index replicated per device (the reference uploads one
index copy per GPU, cuda/streams.cu:16-104), PE insert-size stats computed
over the WHOLE batch (the one cross-read sync, reference bwamem.c:1236-1239
— gathered on host here, since every shard's regs come back for
finalization anyway), SAM emitted in read order.
"""
import itertools
import subprocess

import jax
import pytest

from bwamem_tpu.io.fastq import read_fastx, interleave

N_READS = 64


@pytest.fixture(scope="module")
def mesh8():
    from bwamem_tpu.parallel import make_mesh
    devs = jax.devices()
    assert len(devs) >= 8, "conftest forces 8 virtual CPU devices"
    return make_mesh(devs[:8])


@pytest.fixture(scope="module")
def oracle_sam(oracle, tiny_dataset, tmp_path_factory):
    fq = tmp_path_factory.mktemp("mesh") / "sub.fq"
    with open(tiny_dataset["fq"]) as f:
        lines = f.readlines()
    with open(fq, "w") as f:
        f.writelines(lines[: 4 * N_READS])
    out = subprocess.run(
        [str(oracle), "mem", "-t", "1", tiny_dataset["prefix"], str(fq)],
        capture_output=True, text=True, check=True)
    recs = [l for l in out.stdout.splitlines() if not l.startswith("@")]
    by_read: dict[str, list[str]] = {}
    for l in recs:
        by_read.setdefault(l.split("\t", 1)[0], []).append(l)
    return by_read


def test_se_sharded_matches_cpu_bwa(oracle_sam, tiny_dataset, built_index,
                                    mesh8):
    from bwamem_tpu.pipeline.align import Aligner
    reads = list(itertools.islice(read_fastx(tiny_dataset["fq"]), N_READS))
    al = Aligner(built_index, mesh=mesh8)
    got = al.align_batch_se(reads, 0)
    n_bad = 0
    first = None
    for r, sam in zip(reads, got):
        want = oracle_sam.get(r.name, [])
        have = [l for l in sam.rstrip("\n").split("\n") if l]
        if want != have:
            n_bad += 1
            if first is None:
                first = (r.name, want, have)
    assert n_bad == 0, (
        f"{n_bad}/{len(reads)} reads differ; first: {first!r}")


N_PAIRS = 24


@pytest.fixture(scope="module")
def pe_files(tiny_dataset, tmp_path_factory):
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    import simdata
    d = tmp_path_factory.mktemp("meshpe")
    contigs = simdata.make_genome(200_000, seed=7, n_contigs=2)
    reads = simdata.sim_reads(contigs, 2 * N_PAIRS, read_len=101, seed=33,
                              paired=True)
    fq1, fq2 = str(d / "r1.fq"), str(d / "r2.fq")
    simdata.write_fastq(reads[0::2], fq1)
    simdata.write_fastq(reads[1::2], fq2)
    return fq1, fq2


def test_pe_sharded_matches_cpu_bwa(oracle, tiny_dataset, built_index,
                                    mesh8, pe_files):
    from bwamem_tpu.pipeline.align import Aligner
    out = subprocess.run(
        [str(oracle), "mem", "-t", "1", tiny_dataset["prefix"],
         pe_files[0], pe_files[1]],
        capture_output=True, text=True, check=True)
    want = [l for l in out.stdout.splitlines() if not l.startswith("@")]
    reads = list(interleave(read_fastx(pe_files[0]),
                            read_fastx(pe_files[1])))
    al = Aligner(built_index, mesh=mesh8)
    got = al.align_batch_pe(reads, 0)
    have = [l for s in got for l in s.rstrip("\n").split("\n") if l]
    assert len(want) == len(have), (len(want), len(have))
    n_bad = sum(1 for w, h in zip(want, have) if w != h)
    first = next(((w, h) for w, h in zip(want, have) if w != h), None)
    assert n_bad == 0, f"{n_bad}/{len(want)} records differ; first: {first!r}"
