"""Extension-driver parity: align_regs must reproduce the oracle's raw
mem_chain2aln output (pre-dedup alignment regions) in order, field for
field."""
import subprocess

import numpy as np
import pytest

import bwamem_tpu  # noqa: F401
import jax.numpy as jnp

from bwamem_tpu.ops import fm as fmops
from bwamem_tpu.config import MemOptions
from bwamem_tpu.pipeline.seedchain import align_regs
from tests.test_smem import encode_reads


@pytest.fixture(scope="module")
def setup(tiny_dataset, oracle, built_index):
    prefix, fq = tiny_dataset["prefix"], tiny_dataset["fq"]
    idx = built_index
    fm = fmops.to_device(fmops.fm_from_index(idx))
    names, seqs = [], []
    with open(fq) as f:
        lines = f.read().splitlines()
    for i in range(0, len(lines), 4):
        names.append(lines[i][1:].split()[0])
        seqs.append(lines[i + 1])
    return idx, fm, names, seqs


def oracle_extregs(oracle, prefix, fq):
    out = subprocess.run([str(oracle), "extregs", prefix, str(fq)],
                         capture_output=True, text=True, check=True)
    golden = {}
    for line in out.stdout.splitlines():
        f_ = line.split("\t")
        golden.setdefault(f_[0], []).append(tuple(int(v) for v in f_[1:]))
    return golden


def run_align(idx, fm, seqs, pad_to=101):
    seq, l_seq = encode_reads(seqs, pad_to)
    offs = jnp.asarray(idx.contig_offsets(), dtype=fm.L2.dtype)
    res, regs = align_regs(fm, offs, jnp.asarray(idx.is_alt_flags()),
                           jnp.asarray(seq), jnp.asarray(l_seq), MemOptions())
    return regs


def regs_of(regs, r):
    out = []
    for j in range(int(regs.n[r])):
        out.append((int(regs.rb[r, j]), int(regs.re[r, j]),
                    int(regs.qb[r, j]), int(regs.qe[r, j]),
                    int(regs.rid[r, j]), int(regs.score[r, j]),
                    int(regs.truesc[r, j]), int(regs.w[r, j]),
                    int(regs.seedcov[r, j]), int(regs.seedlen0[r, j])))
    return out


def test_regions_match_oracle(setup, oracle, tiny_dataset):
    idx, fm, names, seqs = setup
    golden = oracle_extregs(oracle, tiny_dataset["prefix"],
                            tiny_dataset["fq"])
    n = 100
    regs = run_align(idx, fm, seqs[:n])
    assert not np.asarray(regs.overflow[:n]).any()
    mism = []
    for r in range(n):
        got = regs_of(regs, r)
        want = golden.get(names[r], [])
        if got != want:
            mism.append((names[r], want, got))
    assert not mism, f"{len(mism)}/{n} mismatch; first: {mism[0]}"


def test_regions_indel_reads(setup, oracle, tiny_dataset, tmp_path):
    """Reads with bigger indels exercise band retry + to-end decisions."""
    idx, fm, names, seqs = setup
    rng = np.random.default_rng(11)
    cases = []
    for s in seqs[:30]:
        b = list(s)
        p = int(rng.integers(20, 70))
        k = int(rng.integers(1, 12))
        if rng.random() < 0.5:
            del b[p:p + k]  # deletion in read
        else:
            b[p:p] = ["ACGT"[i] for i in rng.integers(0, 4, k)]
        cases.append("".join(b)[:101])
    fq = tmp_path / "ind.fq"
    with open(fq, "w") as f:
        for i, s in enumerate(cases):
            f.write(f"@ind{i}\n{s}\n+\n{'I' * len(s)}\n")
    golden = oracle_extregs(oracle, tiny_dataset["prefix"], fq)
    regs = run_align(idx, fm, cases)
    for r in range(len(cases)):
        assert regs_of(regs, r) == golden.get(f"ind{r}", []), f"read ind{r}"
