"""Fuzz parity of the round-5 native host kernels against their specs:

  hostops.pair_batch        vs pair.mem_pair           (bwamem_pair.c:208-269)
  hostops.ksw_align_host    vs ops/local_sw device op  (ksw.c:112-369)

Both native kernels are production-path; the Python/device versions stay
the executable spec.
"""
import random

import numpy as np
import pytest

from bwamem_tpu import native
from bwamem_tpu import pair as pairmod
from bwamem_tpu.config import MemOptions
from bwamem_tpu.finalize import AlnReg

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no native compiler")


def _mkreg(rb, score, rid):
    r = AlnReg()
    r.rb, r.re, r.qb, r.qe, r.score, r.rid = rb, rb + 100, 0, 100, score, rid
    return r


def test_pair_batch_matches_mem_pair():
    rng = random.Random(7)
    opt = MemOptions()
    l_pac = 5_000_000
    ctg = np.array([0, 2_000_000, l_pac], np.int64)
    pes = [pairmod.PeStat() for _ in range(4)]
    pes[1] = pairmod.PeStat(low=50, high=900, failed=0, avg=400.0, std=80.0)
    pes[2] = pairmod.PeStat(low=30, high=500, failed=0, avg=250.0, std=0.0)
    n_pairs = 300
    allr = []
    for p in range(n_pairs):
        rid = rng.randint(0, 1)
        base, lim = int(ctg[rid]), int(ctg[rid + 1])
        pos = rng.randint(base, lim - 3000)
        ins = rng.randint(100, 1200)
        e0 = [_mkreg(pos, rng.randint(60, 200), rid)]
        e1 = [_mkreg(2 * l_pac - 1 - (pos + ins - 1),
                     rng.randint(60, 200), rid)]
        for e in (e0, e1):
            for _ in range(rng.randint(0, 3)):
                rid2 = rng.randint(0, 1)
                b2 = rng.randint(int(ctg[rid2]), int(ctg[rid2 + 1]) - 200)
                if rng.random() < 0.5:
                    b2 = 2 * l_pac - 1 - (b2 + 99)
                e.append(_mkreg(b2, rng.randint(20, 199), rid2))
        allr.append((e0, e1))

    want = [pairmod.mem_pair(opt, l_pac, ctg, pes, allr[p], 1000 + p,
                             [len(allr[p][0]), len(allr[p][1])])
            for p in range(n_pairs)]

    off0 = np.zeros(n_pairs + 1, np.int64)
    off1 = np.zeros(n_pairs + 1, np.int64)
    np.cumsum([len(a[0]) for a in allr], out=off0[1:])
    np.cumsum([len(a[1]) for a in allr], out=off1[1:])

    def flat(e, f, dt):
        return np.array([getattr(r, f) for a in allr for r in a[e]], dt)
    tmp = max(opt.a + opt.b, opt.o_del + opt.e_del, opt.o_ins + opt.e_ins)
    o, sub, nsub, z0, z1 = native.pair_batch(
        off0, off1,
        flat(0, "rb", np.int64), flat(0, "rid", np.int32),
        flat(0, "score", np.int32),
        flat(1, "rb", np.int64), flat(1, "rid", np.int32),
        flat(1, "score", np.int32),
        [1000 + p for p in range(n_pairs)], ctg, l_pac, pes, opt.a, tmp)
    got = [(int(o[p]), int(sub[p]), int(nsub[p]), [int(z0[p]), int(z1[p])])
           for p in range(n_pairs)]
    assert got == want
    assert sum(1 for g in got if g[0] > 0) > 50   # scoring path exercised


def test_ksw_align_host_matches_device_op():
    from bwamem_tpu.ops import local_sw
    rng = random.Random(3)
    mat = np.zeros((5, 5), np.int8)
    for i in range(4):
        for j in range(4):
            mat[i, j] = 1 if i == j else -4
    o_del = e_del = o_ins = e_ins = 0  # set below
    o_del, e_del, o_ins, e_ins = 6, 1, 6, 1
    for trial in range(2):
        p = 16 if trial == 0 else 8
        B = 24
        qs, ts, minsc = [], [], []
        for _ in range(B):
            ql = rng.randint(1, 140)
            tl = rng.randint(1, 500)
            q = np.array([rng.randrange(5) if rng.random() < 0.05
                          else rng.randrange(4) for _ in range(ql)],
                         np.uint8)
            t = np.array([rng.randrange(4) for _ in range(tl)], np.uint8)
            if rng.random() < 0.7 and tl > ql:
                s0 = rng.randint(0, tl - ql)
                for k in range(ql):
                    if rng.random() > 0.12:
                        t[s0 + k] = q[k]
            qs.append(q)
            ts.append(t)
            minsc.append(rng.randint(10, 40))
        LQ = max(-(-max(len(x) for x in qs) // p) * p, 32)
        LT = max(max(len(x) for x in ts), 64)
        qa = np.full((B, LQ), 4, np.uint8)
        ta = np.full((B, LT), 4, np.uint8)
        for b in range(B):
            qa[b, :len(qs[b])] = qs[b]
            ta[b, :len(ts[b])] = ts[b]
        res = local_sw.ksw_align_batch(
            qa, np.array([len(x) for x in qs], np.int32),
            ta, np.array([len(x) for x in ts], np.int32),
            np.array(minsc, np.int32), mat,
            o_del=o_del, e_del=e_del, o_ins=o_ins, e_ins=e_ins,
            max_mat=1, p=p)
        got = native.ksw_align_host(qs, ts, minsc, mat, o_del, e_del,
                                    o_ins, e_ins, 1, p)
        for k in ("score", "te", "qe", "score2", "te2", "tb", "qb"):
            assert np.array_equal(np.asarray(getattr(res, k)), got[k]), k
