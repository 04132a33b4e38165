"""Acceptance-ladder rung 1 (BASELINE.md): bacterial-genome-scale,
repeat-rich exact-diff, plus the two at-scale index paths.

No network exists in this environment (the reference's datasets — E. coli
ASM886v2 + SRR10896389, reference Makefile:135 — cannot be fetched), so the
genome is synthetic but built to stress what real repetitive sequence
stresses: interspersed repeat families with diverged copies (XA/mapq/chain
filtering), tandem arrays (seed explosion, max_occ sampling), low-complexity
runs, and ambiguous bases.  Correctness predicate stays bit-identical SAM
vs CPU bwa mem.
"""
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from bwamem_tpu.io.fastq import read_fastx, interleave

REPO = Path(__file__).resolve().parent.parent
BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def make_repeat_genome(length: int, seed: int) -> dict[str, str]:
    """Repeat-rich genome: ~20% interspersed diverged repeat copies from a
    few families, tandem arrays, homopolymer runs, N gaps."""
    rng = np.random.default_rng(seed)
    arr = BASES[rng.integers(0, 4, size=length)]
    # 3 repeat families (transposon-like), 400-1500bp, copies at 1-8%
    # divergence scattered over the genome
    for fam in range(3):
        unit = BASES[rng.integers(0, 4, size=int(rng.integers(400, 1500)))]
        n_copies = length // 20_000
        for _ in range(n_copies):
            cp = unit.copy()
            div = rng.uniform(0.01, 0.08)
            nmut = int(len(cp) * div)
            pos = rng.integers(0, len(cp), size=nmut)
            cp[pos] = BASES[rng.integers(0, 4, size=nmut)]
            dst = int(rng.integers(0, length - len(cp)))
            arr[dst:dst + len(cp)] = cp
    # tandem arrays: unit 20-60bp x 10-40 copies
    for _ in range(length // 100_000):
        u = BASES[rng.integers(0, 4, size=int(rng.integers(20, 60)))]
        reps = int(rng.integers(10, 40))
        t = np.tile(u, reps)
        dst = int(rng.integers(0, length - len(t)))
        arr[dst:dst + len(t)] = t
    # homopolymers + N gaps
    for _ in range(length // 50_000):
        p = int(rng.integers(0, length - 30))
        arr[p:p + 30] = BASES[rng.integers(0, 4)]
    for _ in range(length // 200_000):
        p = int(rng.integers(0, length - 50))
        arr[p:p + 50] = ord("N")
    return {"ecoli_like": arr.tobytes().decode()}


@pytest.fixture(scope="module")
def ladder_dataset(oracle, tmp_path_factory):
    sys.path.insert(0, str(REPO / "tools"))
    import simdata
    d = Path(str(tmp_path_factory.mktemp("ladder")))
    contigs = make_repeat_genome(1_000_000, seed=11)
    fa = str(d / "g.fa")
    simdata.write_fasta(contigs, fa)
    prefix = str(d / "g")
    subprocess.run([str(oracle), "index", fa, prefix], check=True,
                   capture_output=True)
    se = simdata.sim_reads(contigs, 300, read_len=101, seed=12)
    fq = str(d / "se.fq")
    simdata.write_fastq(se, fq)
    pe = simdata.sim_reads(contigs, 300, read_len=101, seed=13, paired=True)
    fq1, fq2 = str(d / "r1.fq"), str(d / "r2.fq")
    simdata.write_fastq(pe[0::2], fq1)
    simdata.write_fastq(pe[1::2], fq2)
    from bwamem_tpu.index import build_index
    idx = build_index(fa, with_kmer_table=True)
    return dict(prefix=prefix, fa=fa, fq=fq, fq1=fq1, fq2=fq2, idx=idx,
                contigs=contigs)


def test_index_bit_identical_1mbp(ladder_dataset, tmp_path):
    ours = str(tmp_path / "ours")
    ladder_dataset["idx"].save_reference_format(ours)
    import filecmp
    for ext in (".pac", ".ann", ".amb", ".bwt", ".sa"):
        assert filecmp.cmp(ladder_dataset["prefix"] + ext, ours + ext,
                           shallow=False), ext


def test_ladder_se_exact(ladder_dataset, oracle):
    out = subprocess.run(
        [str(oracle), "mem", "-t", "1", ladder_dataset["prefix"],
         ladder_dataset["fq"]],
        capture_output=True, text=True, check=True)
    want = [l for l in out.stdout.splitlines() if not l.startswith("@")]
    from bwamem_tpu.pipeline.align import Aligner
    reads = list(read_fastx(ladder_dataset["fq"]))
    al = Aligner(ladder_dataset["idx"])
    got = al.align_batch_se(reads, 0)
    have = [l for s in got for l in s.rstrip("\n").split("\n") if l]
    assert len(want) == len(have), (len(want), len(have))
    n_bad = sum(1 for w, h in zip(want, have) if w != h)
    first = next(((w, h) for w, h in zip(want, have) if w != h), None)
    assert n_bad == 0, f"{n_bad}/{len(want)} differ; first: {first!r}"


def test_ladder_pe_exact(ladder_dataset, oracle):
    out = subprocess.run(
        [str(oracle), "mem", "-t", "1", ladder_dataset["prefix"],
         ladder_dataset["fq1"], ladder_dataset["fq2"]],
        capture_output=True, text=True, check=True)
    want = [l for l in out.stdout.splitlines() if not l.startswith("@")]
    from bwamem_tpu.pipeline.align import Aligner
    reads = list(interleave(read_fastx(ladder_dataset["fq1"]),
                            read_fastx(ladder_dataset["fq2"])))
    al = Aligner(ladder_dataset["idx"])
    got = al.align_batch_pe(reads, 0)
    have = [l for s in got for l in s.rstrip("\n").split("\n") if l]
    assert len(want) == len(have), (len(want), len(have))
    n_bad = sum(1 for w, h in zip(want, have) if w != h)
    first = next(((w, h) for w, h in zip(want, have) if w != h), None)
    assert n_bad == 0, f"{n_bad}/{len(want)} differ; first: {first!r}"


def test_i64_index_path_exact(tiny_dataset, built_index, oracle):
    """Drive the int64 FM path (16-word cmb rows, i64 occ/sa — the GRCh38
    representation) on the tiny dataset by forcing itype, and require the
    same bit-identical SAM (the i64 lowering must not change results)."""
    import unittest.mock as mock
    from bwamem_tpu.index.fmindex import BwaIndex
    from bwamem_tpu.pipeline.align import Aligner
    reads = list(read_fastx(tiny_dataset["fq"]))[:48]
    out = subprocess.run(
        [str(oracle), "mem", "-t", "1", tiny_dataset["prefix"],
         tiny_dataset["fq"]],
        capture_output=True, text=True, check=True)
    by_read = {}
    for l in out.stdout.splitlines():
        if not l.startswith("@"):
            by_read.setdefault(l.split("\t", 1)[0], []).append(l)
    with mock.patch.object(BwaIndex, "itype",
                           property(lambda self: np.int64)):
        assert built_index.itype == np.int64
        al = Aligner(built_index)
        got = al.align_batch_se(reads, 0)
    n_bad = 0
    first = None
    for r, sam in zip(reads, got):
        want = by_read.get(r.name, [])
        have = [l for l in sam.rstrip("\n").split("\n") if l]
        if want != have:
            n_bad += 1
            first = first or (r.name, want, have)
    assert n_bad == 0, f"{n_bad}/{len(reads)} differ; first: {first!r}"
