"""Seeding parity: collect_intervals must reproduce the oracle's 3-pass
mem_collect_intv interval set (start, end, SA-range, size) exactly."""
import subprocess
from collections import Counter

import numpy as np
import pytest

import bwamem_tpu  # noqa: F401
import jax.numpy as jnp

from bwamem_tpu.index import build_index
from bwamem_tpu.ops import fm as fmops
from bwamem_tpu.ops import smem as smemops

NT4 = np.full(256, 4, dtype=np.uint8)
for i, ch in enumerate("ACGT"):
    NT4[ord(ch)] = i
    NT4[ord(ch.lower())] = i


def encode_reads(reads, L):
    N = len(reads)
    seq = np.full((N, L), 4, dtype=np.uint8)
    l_seq = np.zeros(N, dtype=np.int32)
    for r, s in enumerate(reads):
        b = NT4[np.frombuffer(s.encode(), dtype=np.uint8)]
        seq[r, : len(b)] = b
        l_seq[r] = len(b)
    return seq, l_seq


@pytest.fixture(scope="module")
def setup(tiny_dataset, oracle):
    prefix, fq = tiny_dataset["prefix"], tiny_dataset["fq"]
    idx = build_index(tiny_dataset["fa"])
    fm = fmops.to_device(fmops.fm_from_index(idx))
    # read fastq
    names, seqs = [], []
    with open(fq) as f:
        lines = f.read().splitlines()
    for i in range(0, len(lines), 4):
        names.append(lines[i][1:].split()[0])
        seqs.append(lines[i + 1])
    # oracle smem dump: name, start, end, x0, x1, x2
    out = subprocess.run([str(oracle), "smem", prefix, fq],
                         capture_output=True, text=True, check=True)
    golden = {}
    for line in out.stdout.splitlines():
        f_ = line.split("\t")
        golden.setdefault(f_[0], []).append(
            (int(f_[1]), int(f_[2]), int(f_[3]), int(f_[5])))
    return idx, fm, names, seqs, golden


def run_collect(fm, seqs, caps=None):
    seq, l_seq = encode_reads(seqs, max(len(s) for s in seqs))
    caps = caps or smemops.SeedingCaps()
    return smemops.collect_intervals(
        fm, jnp.asarray(seq), jnp.asarray(l_seq),
        min_seed_len=19, split_len=28, split_width=10, max_mem_intv=20,
        caps=caps)


def intervals_of(iv, r):
    out = []
    v = np.asarray(iv.valid[r])
    for j in np.flatnonzero(v):
        out.append((int(iv.start[r, j]), int(iv.end[r, j]),
                    int(iv.x0[r, j]), int(iv.x2[r, j])))
    return out


def test_seeding_matches_oracle(setup):
    idx, fm, names, seqs, golden = setup
    n = 120  # subset for runtime
    iv = run_collect(fm, seqs[:n])
    assert not np.asarray(iv.overflow[:n]).any()
    mismatches = []
    for r in range(n):
        got = Counter(intervals_of(iv, r))
        want = Counter(golden.get(names[r], []))
        if got != want:
            mismatches.append((names[r], want - got, got - want))
    assert not mismatches, mismatches[:3]


def test_seeding_with_ambiguous_bases(setup, oracle, tiny_dataset, tmp_path):
    """Reads with Ns exercise pivot skipping and extension termination."""
    idx, fm, names, seqs, golden = setup
    mod = []
    for s in seqs[:20]:
        b = bytearray(s.encode())
        b[10] = ord("N")
        b[11] = ord("N")
        b[60] = ord("N")
        mod.append(bytes(b).decode())
    fq = tmp_path / "n.fq"
    with open(fq, "w") as f:
        for i, s in enumerate(mod):
            f.write(f"@n{i}\n{s}\n+\n{'I' * len(s)}\n")
    out = subprocess.run([str(oracle), "smem", tiny_dataset["prefix"], str(fq)],
                         capture_output=True, text=True, check=True)
    want = {}
    for line in out.stdout.splitlines():
        f_ = line.split("\t")
        want.setdefault(f_[0], []).append(
            (int(f_[1]), int(f_[2]), int(f_[3]), int(f_[5])))
    iv = run_collect(fm, mod)
    for r in range(len(mod)):
        assert Counter(intervals_of(iv, r)) == Counter(want.get(f"n{r}", [])), r


def test_short_and_edge_reads(setup, oracle, tiny_dataset, tmp_path):
    """Shorter-than-seed reads, all-N reads, exact 19bp matches."""
    idx, fm, names, seqs, golden = setup
    cases = [
        seqs[0][:15],          # too short for any seed
        "N" * 30,              # all ambiguous
        seqs[1][:19],          # exactly min_seed_len
        seqs[2][:25],
        "ACGT" * 8,            # likely absent pattern
    ]
    fq = tmp_path / "e.fq"
    with open(fq, "w") as f:
        for i, s in enumerate(cases):
            f.write(f"@e{i}\n{s}\n+\n{'I' * len(s)}\n")
    out = subprocess.run([str(oracle), "smem", tiny_dataset["prefix"], str(fq)],
                         capture_output=True, text=True, check=True)
    want = {}
    for line in out.stdout.splitlines():
        f_ = line.split("\t")
        want.setdefault(f_[0], []).append(
            (int(f_[1]), int(f_[2]), int(f_[3]), int(f_[5])))
    iv = run_collect(fm, cases)
    for r in range(len(cases)):
        assert Counter(intervals_of(iv, r)) == Counter(want.get(f"e{r}", [])), r


def test_back_extend_staged_matches_lockstep(setup):
    """back_extend_flat with a compaction ladder must equal the plain
    lockstep while_loop lane-for-lane (the ladder is a pure perf shape:
    survivors of each 4-step window move to a smaller arena)."""
    idx, fm, names, seqs, golden = setup
    seq, l_seq = encode_reads(seqs, max(len(s) for s in seqs))
    seq = jnp.asarray(seq)
    it = np.asarray(fm.L2).dtype
    rng = np.random.default_rng(7)
    M = 8192
    N = seq.shape[0]
    lane_read = jnp.asarray(rng.integers(0, N, M).astype(np.int32))
    pivot = jnp.asarray(rng.integers(0, 40, M).astype(np.int32))
    # random single-base init intervals (always valid FM intervals)
    base = rng.integers(0, 4, M).astype(np.int32)
    x0, x1, x2 = fmops.set_intv(fm, jnp.asarray(base))
    mi = jnp.asarray(rng.integers(1, 3, M).astype(it))
    valid = jnp.asarray(rng.random(M) < 0.9)
    s0, a0, b0 = smemops.back_extend_flat(
        fm, seq, lane_read, pivot, x0, x1, x2, mi, valid)
    # a full-width ladder can never overflow: pure parity check
    s1, a1, b1, over, need = smemops.back_extend_flat(
        fm, seq, lane_read, pivot, x0, x1, x2, mi, valid,
        stage_w=(M, M, M))
    assert not bool(over)
    np.testing.assert_array_equal(np.asarray(s0), np.asarray(s1))
    np.testing.assert_array_equal(np.asarray(a0), np.asarray(a1))
    np.testing.assert_array_equal(np.asarray(b0), np.asarray(b1))
    # a ladder sized from the reported need must fit AND stay exact
    w0 = 1 << int(np.ceil(np.log2(max(int(need), 2))))
    s2, a2, b2, over2, _ = smemops.back_extend_flat(
        fm, seq, lane_read, pivot, x0, x1, x2, mi, valid,
        stage_w=(w0, max(w0 >> 1, 512), max(w0 >> 2, 512)))
    assert not bool(over2)
    np.testing.assert_array_equal(np.asarray(s0), np.asarray(s2))
    np.testing.assert_array_equal(np.asarray(a0), np.asarray(a2))
    np.testing.assert_array_equal(np.asarray(b0), np.asarray(b2))
    # a too-small ladder must flag overflow rather than drop lanes
    _, _, _, over3, need3 = smemops.back_extend_flat(
        fm, seq, lane_read, pivot, x0, x1, x2, mi, valid,
        stage_w=(256, 128, 64))
    assert bool(over3) or int(need3) <= 256
