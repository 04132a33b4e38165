"""Local SW parity: ksw_align_batch must return the exact kswr_t tuple of
ksw_align2 (score, te, qe, score2, te2, tb, qb) for every lane."""
import subprocess

import numpy as np
import pytest

import bwamem_tpu  # noqa: F401
import jax.numpy as jnp

from bwamem_tpu.config import fill_scmat
from bwamem_tpu.ops import local_sw

BASES = "ACGT"
NT4 = {c: i for i, c in enumerate(BASES)}


def rand_seq(rng, n):
    return "".join(BASES[i] for i in rng.integers(0, 4, n))


def mutate(rng, s, sub=0.03, ind=0.01):
    out = []
    for ch in s:
        r = rng.random()
        if r < ind:
            continue
        if r < 2 * ind:
            out.append(BASES[rng.integers(0, 4)])
        if rng.random() < sub:
            out.append(BASES[rng.integers(0, 4)])
        else:
            out.append(ch)
    return "".join(out)


def gen_cases(seed, n):
    """(minsc, query, target) — mate-rescue-shaped: a ~100bp mate somewhere
    inside a few-hundred-bp reference window, sometimes twice (tandem, to
    exercise score2), sometimes absent."""
    rng = np.random.default_rng(seed)
    cases = []
    for i in range(n):
        qlen = int(rng.integers(30, 120))
        q = rand_seq(rng, qlen)
        kind = i % 4
        pre = rand_seq(rng, int(rng.integers(0, 200)))
        post = rand_seq(rng, int(rng.integers(0, 200)))
        if kind == 0:
            t = pre + mutate(rng, q) + post
        elif kind == 1:    # tandem: two copies → score2 path
            t = pre + mutate(rng, q) + rand_seq(rng, int(
                rng.integers(5, 120))) + mutate(rng, q, sub=0.06) + post
        elif kind == 2:    # no hit
            t = pre + post if pre + post else rand_seq(rng, 50)
        else:              # partial overlap at window edge
            t = mutate(rng, q)[: qlen // 2] + post
        cases.append((19, q, t))
    cases.append((19, "ACGTACGTACGTACGTACGTACG", "ACGTACGTACGTACGTACGTACG"))
    return cases


def oracle_align(oracle, cases):
    inp = "".join(f"A {m} {1 if len(q) < 250 else 0} {q} {t}\n"
                  for m, q, t in cases)
    out = subprocess.run([str(oracle), "ksw"], input=inp,
                         capture_output=True, text=True, check=True)
    return [tuple(int(v) for v in line.split())
            for line in out.stdout.splitlines()]


def run_batch(cases):
    B = len(cases)
    LQ = -(-max(len(q) for _, q, _ in cases) // 16) * 16  # room for phantoms
    LT = max(len(t) for *_, t in cases)
    query = np.full((B, LQ), 4, np.uint8)
    tgt = np.full((B, LT), 4, np.uint8)
    qlen = np.zeros(B, np.int32)
    tlen = np.zeros(B, np.int32)
    minsc = np.zeros(B, np.int32)
    for b, (m, q, t) in enumerate(cases):
        query[b, : len(q)] = [NT4[c] for c in q]
        tgt[b, : len(t)] = [NT4[c] for c in t]
        qlen[b], tlen[b], minsc[b] = len(q), len(t), m
    res = local_sw.ksw_align_batch(
        jnp.asarray(query), jnp.asarray(qlen), jnp.asarray(tgt),
        jnp.asarray(tlen), jnp.asarray(minsc), fill_scmat(1, 4),
        o_del=6, e_del=1, o_ins=6, e_ins=1, max_mat=1, p=16)
    return [tuple(int(x[b]) for x in res) for b in range(B)]


@pytest.mark.parametrize("seed", [0, 5])
def test_align_matches_ksw(oracle, seed):
    cases = gen_cases(seed, 120)
    want = oracle_align(oracle, cases)
    got = run_batch(cases)
    bad = [(i, want[i], got[i])
           for i in range(len(cases)) if want[i] != got[i]]
    assert not bad, f"{len(bad)}/{len(cases)} mismatch; first 3: {bad[:3]}"
