"""Fused extension-dispatch parity.

1. extend_batch_pl2 — the Mosaic kernel with IN-KERNEL band-doubling
   (bwamem.c:732-741) — must equal the host-driven two-pass replay over
   extend_batch_pl on the same corpus (which test_pallas_ext pins to the
   XLA implementation and test_extend pins to the C ksw_extend2 oracle).
2. extend_regions with the fused one-dispatch-per-tile TPU path (forced
   into Pallas interpret mode on the CPU backend) must produce the exact
   AlnReg stream of the XLA host path.
"""
import numpy as np
import pytest

import bwamem_tpu  # noqa: F401
import jax.numpy as jnp

from bwamem_tpu.config import fill_scmat
from bwamem_tpu.ops import pallas_ext

from test_extend import gen_cases, NT4

W_OPT = 100


def _pack(cases):
    B = len(cases)
    Bp = (B + pallas_ext.TB - 1) // pallas_ext.TB * pallas_ext.TB
    LQ = max(len(q) for _, _, _, q, _ in cases)
    T = max(len(t) for *_, t in cases)
    qT = np.full((LQ, Bp), 4, np.int32)
    tT = np.full((T, Bp), 4, np.int32)
    qlen = np.zeros(Bp, np.int32)
    tlen = np.zeros(Bp, np.int32)
    h0 = np.ones(Bp, np.int32)
    eb = np.zeros(Bp, np.int32)
    for b, (h, _w, e, q, t) in enumerate(cases):
        qT[: len(q), b] = [NT4[c] for c in q]
        tT[: len(t), b] = [NT4[c] for c in t]
        qlen[b], tlen[b], h0[b], eb[b] = len(q), len(t), h, e
    return Bp, LQ, T, qT, tT, qlen, tlen, h0, eb


@pytest.mark.parametrize("seed,n", [(3, 150)])
def test_pl2_equals_host_band_doubling(seed, n):
    # per-case w is ignored: the band-doubling rule fixes pass 1 at opt.w
    cases = gen_cases(seed, n)
    Bp, LQ, T, qT, tT, qlen, tlen, h0, eb = _pack(cases)
    mat = np.asarray(fill_scmat(1, 4), np.int8)
    kw = dict(lq_max=LQ, t_max=T, mat_bytes=mat.tobytes(), o_del=6,
              e_del=1, o_ins=6, e_ins=1, zdrop=100, interpret=True)
    args = (jnp.asarray(qT), jnp.asarray(qlen), jnp.asarray(tT),
            jnp.asarray(tlen), jnp.asarray(h0))

    r1 = pallas_ext.extend_batch_pl(
        *args, jnp.full(Bp, W_OPT, jnp.int32), jnp.asarray(eb), **kw)
    r2 = pallas_ext.extend_batch_pl(
        *args, jnp.full(Bp, 2 * W_OPT, jnp.int32), jnp.asarray(eb), **kw)
    retry = ((np.asarray(r1.max_off) >= (W_OPT >> 1) + (W_OPT >> 2))
             & (np.asarray(r1.score) != h0) & (qlen > 0))
    want = [np.where(retry, np.asarray(b), np.asarray(a))
            for a, b in zip(r1, r2)]

    got, retried = pallas_ext.extend_batch_pl2(
        *args, jnp.asarray(eb), w_opt=W_OPT, **kw)
    assert (np.asarray(retried).astype(bool) == retry).all()
    for name, w_, g in zip(r1._fields, want, got):
        bad = np.nonzero(w_ != np.asarray(g))[0]
        assert bad.size == 0, f"{name}: {bad[:5]} want {w_[bad[:5]]} " \
                              f"got {np.asarray(g)[bad[:5]]}"


def _reg_key(r):
    return (r.rid, r.qb, r.qe, r.rb, r.re, r.score, r.truesc, r.w,
            r.seedcov, r.seedlen0, round(r.frac_rep, 9))


def test_fused_extend_regions_parity(built_index, tiny_dataset):
    from bwamem_tpu.io.fastq import read_fastx, pack_batch
    from bwamem_tpu.pipeline.align import Aligner, _bucket
    from bwamem_tpu.pipeline import seeding_host, extend_host

    reads = list(read_fastx(tiny_dataset["fq"]))[:48]
    al = Aligner(built_index)
    n = len(reads)
    N = _bucket(n, lo=8)
    L = _bucket(max(r.l_seq for r in reads), lo=32)
    seq, l_seq = pack_batch(reads, N, L)
    groups = seeding_host.front_half(al, reads, seq, l_seq)

    def run():
        out = [[] for _ in range(n)]
        for ridx, wr in groups:
            g_reads = [reads[i] for i in ridx]
            g = extend_host.extend_regions(al, g_reads, seq[ridx], wr)
            for gi, i in enumerate(ridx):
                out[i] = g[gi]
        return out

    base = run()
    assert any(len(r) for r in base)
    extend_host._PL_INTERPRET = True
    try:
        fused = run()
    finally:
        extend_host._PL_INTERPRET = False
    for i in range(n):
        a = [_reg_key(r) for r in base[i]]
        b = [_reg_key(r) for r in fused[i]]
        assert a == b, f"read {i}: {a} != {b}"
