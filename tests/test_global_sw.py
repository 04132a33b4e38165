"""Banded global alignment parity: global_align_batch must return the exact
(score, cigar) pair of ksw_global2 for every lane."""
import subprocess

import numpy as np
import pytest

import bwamem_tpu  # noqa: F401
import jax.numpy as jnp

from bwamem_tpu.config import fill_scmat
from bwamem_tpu.ops import global_sw

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
    """(w, query, target) triples where the band always reaches the corner
    (w >= |tlen-qlen|), which is how bwa_gen_cigar2 always calls it
    (min_w = abs(rlen-l_query)+3, bwa.c:300)."""
    rng = np.random.default_rng(seed)
    cases = []
    for i in range(n):
        qlen = int(rng.integers(4, 150))
        q = rand_seq(rng, qlen)
        kind = i % 4
        if kind == 0:
            t = mutate(rng, q)
        elif kind == 1:
            t = mutate(rng, q, sub=0.08, ind=0.04)
        elif kind == 2:
            t = mutate(rng, q, sub=0.02, ind=0.10)
        else:
            t = rand_seq(rng, int(rng.integers(4, 150)))
        if not t:
            t = rand_seq(rng, 4)
        w = max(int(rng.choice([3, 10, 25, 60])), abs(len(t) - len(q)) + 3)
        cases.append((w, q, t))
    cases.append((3, "ACGT", "ACGT"))
    cases.append((5, "AAAA", "AATAA"))      # single insertion in target
    cases.append((5, "AATAA", "AAAA"))      # single deletion in target
    cases.append((10, "ACGTACGTAC", "TTTTTTTTTT"))
    return cases


def oracle_global(oracle, cases):
    inp = "".join(f"G {w} {q} {t}\n" for w, q, t in cases)
    out = subprocess.run([str(oracle), "ksw"], input=inp,
                         capture_output=True, text=True, check=True)
    res = []
    for line in out.stdout.splitlines():
        sc, cig = line.split(None, 1) if " " in line else (line, "")
        res.append((int(sc), cig.strip()))
    return res


def cigar_str(ops, lens, n):
    return "".join(f"{int(lens[k])}{'MIDSH'[int(ops[k])]}"
                   for k in range(int(n)))


def run_batch(cases, w_max):
    B = len(cases)
    LQ = max(len(q) for _, q, _ in cases)
    LT = max(len(t) for *_, t in cases)
    query = np.full((B, LQ), 4, np.uint8)
    tgt = np.full((B, LT), 4, np.uint8)
    qlen = np.zeros(B, np.int32)
    tlen = np.zeros(B, np.int32)
    w = np.zeros(B, np.int32)
    for b, (ww, q, t) in enumerate(cases):
        query[b, : len(q)] = [NT4[c] for c in q]
        tgt[b, : len(t)] = [NT4[c] for c in t]
        qlen[b], tlen[b], w[b] = len(q), len(t), ww
    res = global_sw.global_align_batch(
        jnp.asarray(query), jnp.asarray(qlen), jnp.asarray(tgt),
        jnp.asarray(tlen), jnp.asarray(w), fill_scmat(1, 4),
        o_del=6, e_del=1, o_ins=6, e_ins=1, w_max=w_max, max_cigar=64)
    out = []
    for b in range(B):
        assert not bool(res.overflow[b])
        out.append((int(res.score[b]),
                    cigar_str(res.ops[b], res.lens[b], res.n_cigar[b])))
    return out


@pytest.mark.parametrize("seed", [0, 7])
def test_global_matches_ksw(oracle, seed):
    cases = gen_cases(seed, 120)
    want = oracle_global(oracle, cases)
    got = run_batch(cases, w_max=165)
    bad = [(i, cases[i][0], want[i], got[i])
           for i in range(len(cases)) if want[i] != got[i]]
    assert not bad, f"{len(bad)}/{len(cases)} mismatch; first 3: {bad[:3]}"


@pytest.mark.parametrize("seed", [1, 11])
def test_native_matches_ksw(oracle, seed):
    """The host C kernel (native.ksw_global_batch) must return the exact
    (score, cigar) of ksw_global2 — same oracle corpus as the device op."""
    from bwamem_tpu import native
    if not native.available():
        pytest.skip("no system compiler")
    cases = gen_cases(seed, 120)
    want = oracle_global(oracle, cases)
    qs = [np.asarray([NT4[c] for c in q], np.uint8) for _, q, _ in cases]
    ts = [np.asarray([NT4[c] for c in t], np.uint8) for *_, t in cases]
    ws = [w for w, *_ in cases]
    sc, cg = native.ksw_global_batch(qs, ts, ws, np.asarray(fill_scmat(1, 4)),
                                     6, 1, 6, 1)
    got = [(int(sc[b]),
            "".join(f"{ln}{'MIDSH'[op]}" for op, ln in cg[b]))
           for b in range(len(cases))]
    bad = [(i, cases[i][0], want[i], got[i])
           for i in range(len(cases)) if want[i] != got[i]]
    assert not bad, f"{len(bad)}/{len(cases)} mismatch; first 3: {bad[:3]}"


def test_native_nm_md_matches_python():
    """nm_md_batch must reproduce finalize._nm_md on random cigar jobs."""
    from bwamem_tpu import native
    from bwamem_tpu import finalize as fin
    if not native.available():
        pytest.skip("no system compiler")
    rng = np.random.default_rng(5)
    cigars, qsegs, rseqs, revs = [], [], [], []
    for i in range(200):
        cig = []
        x = y = 0
        for _ in range(int(rng.integers(1, 6))):
            op = int(rng.choice([0, 0, 0, 1, 2]))
            ln = int(rng.integers(1, 30))
            cig.append((op, ln))
            x += ln if op != 2 else 0
            y += ln if op != 1 else 0
        q = rng.integers(0, 4, x).astype(np.uint8)
        r = rng.integers(0, 4, y).astype(np.uint8)
        # make most match so MD run-lengths exercise both branches
        n = min(x, y)
        r[:n] = np.where(rng.random(n) < 0.9, q[:n], r[:n])
        cigars.append(cig)
        qsegs.append(q)
        rseqs.append(r)
        revs.append(i % 2)
    nm, md = native.nm_md_batch(cigars, qsegs, rseqs,
                                np.asarray(revs, np.uint8))
    for i in range(len(cigars)):
        wnm, wmd = fin._nm_md(cigars[i], qsegs[i], rseqs[i], bool(revs[i]))
        assert (int(nm[i]), md[i]) == (wnm, wmd), (i, nm[i], md[i], wnm, wmd)
