"""Smith-Waterman extension parity: extend_batch must return the exact
(score, qle, tle, gtle, gscore, max_off) tuple of ksw_extend2 for every
lane, across realistic and adversarial cases."""
import subprocess

import numpy as np
import pytest

import bwamem_tpu  # noqa: F401
import jax
import jax.numpy as jnp

from bwamem_tpu.ops import extend as extops

BASES = "ACGT"


def rand_seq(rng, n):
    return "".join(BASES[i] for i in rng.integers(0, 4, n))


def mutate(rng, s, sub=0.03, ind=0.01):
    out = []
    for ch in s:
        r = rng.random()
        if r < ind:          # deletion
            continue
        if r < 2 * ind:      # insertion
            out.append(BASES[rng.integers(0, 4)])
        if rng.random() < sub:
            out.append(BASES[rng.integers(0, 4)])
        else:
            out.append(ch)
    return "".join(out)


def gen_cases(seed, n):
    rng = np.random.default_rng(seed)
    cases = []  # (h0, w, end_bonus, query, target)
    for i in range(n):
        kind = i % 5
        qlen = int(rng.integers(5, 120))
        q = rand_seq(rng, qlen)
        if kind == 0:        # well-matched extension (typical right-ext)
            t = mutate(rng, q + rand_seq(rng, int(rng.integers(0, 60))))
        elif kind == 1:      # target shorter than query
            t = mutate(rng, q[: max(3, qlen // 2)])
        elif kind == 2:      # unrelated
            t = rand_seq(rng, int(rng.integers(5, 150)))
        elif kind == 3:      # heavy indels
            t = mutate(rng, q, sub=0.05, ind=0.08)
        else:                # long target, match in middle
            t = rand_seq(rng, 20) + mutate(rng, q) + rand_seq(rng, 30)
        h0 = int(rng.integers(1, 80))
        w = int(rng.choice([10, 100, 200]))
        eb = int(rng.choice([0, 5, 10]))
        cases.append((h0, w, eb, q, t))
    # hand-picked edges
    cases.append((19, 100, 5, "ACGT", "ACGT"))
    cases.append((1, 100, 5, "A", "T"))
    cases.append((50, 100, 5, "ACGTACGTAC", "ACGTACGTAC"))
    return cases


def oracle_extend(oracle, cases):
    inp = "".join(f"E {h0} {w} {eb} {q} {t}\n" for h0, w, eb, q, t in cases)
    out = subprocess.run([str(oracle), "ksw"], input=inp,
                         capture_output=True, text=True, check=True)
    return [tuple(int(v) for v in line.split())
            for line in out.stdout.splitlines()]


NT4 = {c: i for i, c in enumerate(BASES)}


def run_batch(cases):
    from bwamem_tpu.config import fill_scmat
    B = len(cases)
    LQ = max(len(q) for _, _, _, q, _ in cases)
    T = max(len(t) for *_, t in cases)
    query = np.full((B, LQ), 4, np.uint8)
    tgt = np.full((B, T), 4, np.uint8)
    qlen = np.zeros(B, np.int32)
    tlen = np.zeros(B, np.int32)
    h0 = np.zeros(B, np.int32)
    w = np.zeros(B, np.int32)
    eb = np.zeros(B, np.int32)
    for b, (h, ww, e, q, t) in enumerate(cases):
        query[b, : len(q)] = [NT4[c] for c in q]
        tgt[b, : len(t)] = [NT4[c] for c in t]
        qlen[b], tlen[b], h0[b], w[b], eb[b] = len(q), len(t), h, ww, e

    tgt_j = jnp.asarray(tgt)

    def target_at(i):
        return tgt_j[:, jnp.minimum(i, T - 1)].astype(jnp.int32)

    fn = jax.jit(lambda q_, ql, tl, h_, w_, e_: extops.extend_batch(
        q_, ql, target_at, tl, h_, w_, e_, fill_scmat(1, 4),
        o_del=6, e_del=1, o_ins=6, e_ins=1, zdrop=100, t_max=T))
    res = fn(jnp.asarray(query), jnp.asarray(qlen), jnp.asarray(tlen),
             jnp.asarray(h0), jnp.asarray(w), jnp.asarray(eb))
    return [tuple(int(x[b]) for x in res) for b in range(B)]


def test_extend_matches_ksw(oracle):
    cases = gen_cases(0, 200)
    want = oracle_extend(oracle, cases)
    got = run_batch(cases)
    bad = [(i, cases[i][:3], want[i], got[i])
           for i in range(len(cases)) if want[i] != got[i]]
    assert not bad, f"{len(bad)}/{len(cases)} mismatch; first 3: {bad[:3]}"


def test_extend_more_seeds(oracle):
    for seed in (7, 13):
        cases = gen_cases(seed, 100)
        want = oracle_extend(oracle, cases)
        got = run_batch(cases)
        assert want == got
