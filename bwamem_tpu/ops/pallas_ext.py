"""Pallas TPU kernel for banded affine-gap extension (ksw_extend2).

Bit-exact reimplementation of ops/extend.extend_batch's loop (reference
ksw.c:380-479 semantics) as a Mosaic kernel.  Why: under XLA the row loop
mixes [B] per-lane vectors with [B, L1] state, which lowers to dozens of
layout-conversion / packed-bool ops per iteration (~1 ms/row observed on
the target backend).  The kernel stores everything QUERY-MAJOR —
state [L1p, TB] with lanes in the 128-wide minor dim — so per-lane scalars
are natural [1, TB] vectors, the F prefix-max runs along sublanes with
log-shift maxes, and one row costs a handful of fused VPU ops.

Grid: B/TB lane tiles; each tile runs its own while loop and exits as soon
as all of ITS lanes are done (tiles of short targets retire early).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bwamem_tpu.ops.extend import ExtendResult, _adjust_w, NEG

import sys as _sys

if _sys.getrecursionlimit() < 10000:
    # Mosaic lowering of the unrolled log-shift chains nests deeply
    _sys.setrecursionlimit(10000)

TB = 128            # lanes per grid step (minor dim)


def _ceil8(x):
    return (x + 7) // 8 * 8


def _dp_pass(qT, qlenv, tlen, h0, w, tT, active, *, LQ, L1p, t_max, mat,
             o_del, e_del, o_ins, e_ins, zdrop):
    """One full ksw_extend2 DP over the tile at band `w` ([1, TB] i32).
    Lanes with active == 0 are skipped (done from the start).  Returns
    (mx, max_j, max_i, max_ie, gscore, max_off), each [1, TB] i32."""
    i32 = jnp.int32
    oe_del = o_del + e_del
    oe_ins = o_ins + e_ins
    # x64 mode types bare Python scalars as i64[], which the Mosaic
    # convert-element-type rule cannot lower (infinite recursion) — every
    # scalar entering a jnp.where must be an explicit i32
    Z = jnp.int32(0)
    M1 = jnp.int32(-1)
    NEGc = jnp.int32(NEG)

    row = jax.lax.broadcasted_iota(i32, (L1p, TB), 0)   # j index (query col)

    # qpad codes [L1p, TB]: rows 0..LQ-1 hold the query, rest 4
    q = jnp.where((row < LQ) & (row < qlenv), qT, jnp.int32(4))
    # score profile per target symbol c: prof_c[j, lane] = mat[c][q[j, lane]]
    def prof_for(c):
        m = mat[c]
        p = jnp.full((L1p, TB), jnp.int32(m[4]), i32)
        for b in range(4):
            p = jnp.where(q == jnp.int32(b), jnp.int32(m[b]), p)
        return p

    prof = [prof_for(c) for c in range(5)]

    ramp = row * e_ins                                  # e*j per row

    # eh first row (ksw.c:395-397): eh_h[j] for j in [0..L1)
    v = h0 - oe_ins - (row - 1) * e_ins
    eh_h = jnp.where(row == 0, h0, jnp.maximum(v, 0))
    eh_h = jnp.where((row <= qlenv) & (row < L1p), eh_h, Z).astype(i32)
    eh_e = jnp.zeros((L1p, TB), i32)

    beg = jnp.zeros((1, TB), i32)
    end = qlenv.astype(i32)
    mx = h0.astype(i32)
    max_i = jnp.full((1, TB), -1, i32)
    max_j = jnp.full((1, TB), -1, i32)
    max_ie = jnp.full((1, TB), -1, i32)
    gscore = jnp.full((1, TB), -1, i32)
    max_off = jnp.zeros((1, TB), i32)
    # bool carries trip Mosaic's i8->i1 trunc
    done = ((tlen <= 0) | (active == Z)).astype(i32)

    def body(carry):
        (i, eh_h, eh_e, beg, end, mx, max_i, max_j, max_ie, gscore,
         max_off, done) = carry
        doneb = done != Z
        ip1 = i + jnp.int32(1)
        act = (~doneb) & (i < tlen)
        begi = jnp.maximum(beg, i - w)  # i32 scalar - [1,TB] i32
        endi = jnp.minimum(jnp.minimum(end, i + w + jnp.int32(1)), qlenv)

        tb = tT[pl.ds(jnp.minimum(i, jnp.int32(t_max - 1)), 1), :]  # [1, TB]
        qrow = prof[4]
        for c in range(4):
            qrow = jnp.where(tb == c, prof[c], qrow)

        win = (row >= begi) & (row < endi)              # over first LQ rows
        win = win & (row < LQ)

        M = eh_h
        E = eh_e
        Mq = jnp.where(M != Z, M + qrow, Z)             # rows 0..LQ-1 valid
        t_ins = jnp.maximum(Mq - oe_ins, Z)
        A = jnp.where(win, t_ins + ramp + e_ins, NEGc)
        # inclusive prefix max along rows: log static shifts down the
        # sublanes (static slice+concat — pltpu.roll lowers through an i64
        # rotate operand this backend rejects)
        def shdown(x, k, fill):
            return jnp.concatenate(
                [jnp.full((k, TB), fill, i32), x[:-k]], axis=0)

        G = A
        sh = 1
        while sh < L1p:
            G = jnp.maximum(G, shdown(G, sh, NEGc))
            sh <<= 1
        Gprev = shdown(G, 1, NEGc)
        F = jnp.maximum(Gprev - ramp, Z)
        F = jnp.where(row == begi, Z, F)

        h = jnp.maximum(jnp.maximum(Mq, E), F)
        h = jnp.where(win, h, Z)

        h1_init = jnp.where(begi == Z,
                            jnp.maximum(h0 - (o_del + e_del * ip1), Z),
                            Z)

        # packed row reductions: (h<<12|j) for m/mj, h at j==end-1
        mj_enc = jnp.max((h << 12) | row, axis=0, keepdims=True)
        h1_enc = jnp.max(jnp.where(row == endi - 1, h, NEGc), axis=0,
                         keepdims=True)
        m = mj_enc >> 12
        mj = jnp.where(m > Z, mj_enc & 0xFFF,
                       jnp.where(endi > begi, endi - 1, M1))

        e_new = jnp.maximum(E - e_del, jnp.maximum(Mq - oe_del, Z))

        # eh writes: eh_h[j] = H(i, j-1) for j in [beg, end]; shift h DOWN
        # one row; eh_e[j] in [beg, end); eh_e[end] = 0
        h_sh = shdown(h, 1, Z)
        wh = (row >= begi) & (row <= endi)
        new_h = jnp.where(row == begi, h1_init, h_sh)
        eh_h2 = jnp.where(wh & act, new_h, eh_h)
        we = (row >= begi) & (row < endi)
        eh_e2 = jnp.where(we & act, e_new, eh_e)
        eh_e2 = jnp.where((row == endi) & act, Z, eh_e2)

        h1_last = jnp.where(endi > begi, h1_enc, h1_init)
        reach = act & (endi == qlenv)
        upd_g = reach & (gscore <= h1_last)
        max_ie2 = jnp.where(reach & (gscore > h1_last), max_ie,
                            jnp.where(reach, jnp.int32(i), max_ie))
        gscore2 = jnp.where(upd_g, jnp.maximum(gscore, h1_last), gscore)

        brk0 = act & (m == Z)
        better = act & (m > mx)
        mx2 = jnp.where(better, m, mx)
        max_i2 = jnp.where(better, i, max_i)
        max_j2 = jnp.where(better, mj, max_j)
        off = jnp.abs(mj - i)
        max_off2 = jnp.where(better, jnp.maximum(max_off, off), max_off)
        di = i - max_i
        dj = mj - max_j
        # select over i32, not bool (Mosaic lacks i1 select lowering)
        gap = jnp.where(di > dj, (di - dj) * e_del, (dj - di) * e_ins)
        zd = mx - m - gap > zdrop
        brk1 = act & ~brk0 & ~better & (zdrop > 0) & zd

        # window shrink on the NEW eh values (one packed pass)
        nz = (eh_h2 != 0) | (eh_e2 != 0)
        BIGJ = jnp.int32(1 << 20)
        inwin = (row >= begi) & (row < endi)
        fst = jnp.max(jnp.where(inwin & nz, BIGJ - row, M1), axis=0,
                      keepdims=True)
        lst = jnp.max(jnp.where((row >= begi) & (row <= endi) & nz, row, M1),
                      axis=0, keepdims=True)
        first_nz = jnp.where(fst < Z, jnp.int32(L1p), BIGJ - fst)
        beg2 = jnp.minimum(first_nz, endi)
        end2 = jnp.minimum(lst + 2, qlenv)

        done2 = (doneb | brk0 | brk1 | (ip1 >= tlen)).astype(i32)
        keep = act & ~brk0 & ~brk1
        return (ip1, eh_h2, eh_e2,
                jnp.where(keep, beg2, beg),
                jnp.where(keep, end2, end),
                jnp.where(act & ~brk0, mx2, mx),
                jnp.where(act & ~brk0, max_i2, max_i),
                jnp.where(act & ~brk0, max_j2, max_j),
                jnp.where(act, max_ie2, max_ie),
                jnp.where(act, gscore2, gscore),
                jnp.where(act & ~brk0, max_off2, max_off),
                done2)

    def cond(carry):
        i = carry[0]
        done = carry[-1]
        # Mosaic can only squeeze 32-bit scalars: reduce in i32, not bool
        alive = jnp.max(jnp.int32(1) - done)
        return (i < jnp.int32(t_max)) & (alive > jnp.int32(0))

    init = (jnp.int32(0), eh_h, eh_e, beg, end, mx, max_i, max_j,
            max_ie, gscore, max_off, done)
    out = jax.lax.while_loop(cond, body, init)
    (_, _, _, _, _, mx, max_i, max_j, max_ie, gscore, max_off, _) = out
    return mx, max_j, max_i, max_ie, gscore, max_off


def _kernel(qT, qlen, tlenr, h0r, wr, ebr, tT, o_score, o_qle, o_tle,
            o_gtle, o_gscore, o_maxoff, *, LQ, L1p, t_max, mat, o_del,
            e_del, o_ins, e_ins, zdrop):
    one = jnp.ones((1, TB), jnp.int32)
    mx, max_j, max_i, max_ie, gscore, max_off = _dp_pass(
        qT[:], qlen[:], tlenr[:], h0r[:], wr[:], tT, one, LQ=LQ, L1p=L1p,
        t_max=t_max, mat=mat, o_del=o_del, e_del=e_del, o_ins=o_ins,
        e_ins=e_ins, zdrop=zdrop)
    o_score[:] = mx
    o_qle[:] = max_j + 1
    o_tle[:] = max_i + 1
    o_gtle[:] = max_ie + 1
    o_gscore[:] = gscore
    o_maxoff[:] = max_off


def _kernel_retry(qT, qlen, tlenr, h0r, w1r, w2r, thrr, tT, o_score, o_qle,
                  o_tle, o_gtle, o_gscore, o_maxoff, o_retry, *, LQ, L1p,
                  t_max, mat, o_del, e_del, o_ins, e_ins, zdrop):
    """Band-doubling in kernel (bwamem.c:732-741, MAX_BAND_TRY=2): pass 1
    at band w1; lanes with max_off >= thr AND score != h0 rerun at band w2
    (all other lanes sit out pass 2 — its while loop exits immediately when
    no lane in the tile needs the retry)."""
    i32 = jnp.int32
    Z = jnp.int32(0)
    qlenv = qlen[:]
    tlen = tlenr[:]
    h0 = h0r[:]
    one = jnp.ones((1, TB), i32)
    kw = dict(LQ=LQ, L1p=L1p, t_max=t_max, mat=mat, o_del=o_del,
              e_del=e_del, o_ins=o_ins, e_ins=e_ins, zdrop=zdrop)
    r1 = _dp_pass(qT[:], qlenv, tlen, h0, w1r[:], tT, one, **kw)
    retry = ((r1[5] >= thrr[:]) & (r1[0] != h0)
             & (qlenv > Z)).astype(i32)
    r2 = _dp_pass(qT[:], qlenv, tlen, h0, w2r[:], tT, retry, **kw)
    sel = [jnp.where(retry != Z, b, a) for a, b in zip(r1, r2)]
    mx, max_j, max_i, max_ie, gscore, max_off = sel
    o_score[:] = mx
    o_qle[:] = max_j + 1
    o_tle[:] = max_i + 1
    o_gtle[:] = max_ie + 1
    o_gscore[:] = gscore
    o_maxoff[:] = max_off
    o_retry[:] = retry


@functools.partial(jax.jit, static_argnames=(
    "lq_max", "t_max", "mat_bytes", "o_del", "e_del", "o_ins", "e_ins",
    "zdrop", "interpret"))
def extend_batch_pl(queryT, qlen, targetT, tlen, h0, w, end_bonus, *,
                    lq_max, t_max, mat_bytes, o_del, e_del, o_ins, e_ins,
                    zdrop, interpret=False):
    """queryT: [LQ, B] int32 nt4 (already reversed for left extensions);
    targetT: [t_max, B] int32; per-lane vectors [B].  B % 128 == 0."""
    B = queryT.shape[1]
    assert B % TB == 0
    LQ = lq_max
    L1p = _ceil8(LQ + 1)
    assert LQ <= 4095
    mat = np.frombuffer(mat_bytes, np.int8).reshape(5, 5).astype(int)
    matl = [[int(mat[c][b]) for b in range(5)] for c in range(5)]
    i32 = jnp.int32

    wadj = _adjust_w(w.astype(i32), qlen, int(mat.max()),
                     end_bonus.astype(i32), o_ins, e_ins, o_del, e_del)

    qT = jnp.zeros((L1p, B), i32).at[:LQ].set(queryT.astype(i32))
    grid = B // TB

    kernel = functools.partial(
        _kernel, LQ=LQ, L1p=L1p, t_max=t_max, mat=matl, o_del=o_del,
        e_del=e_del, o_ins=o_ins, e_ins=e_ins, zdrop=zdrop)

    def vec_spec():
        # the 0 literal must be i32: under x64 a bare int traces as i64 and
        # the index-map function then fails Mosaic legalization
        return pl.BlockSpec((1, TB), lambda g: (jnp.int32(0), g),
                            memory_space=pltpu.VMEM)

    outs = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((L1p, TB), lambda g: (jnp.int32(0), g),
                         memory_space=pltpu.VMEM),
            vec_spec(), vec_spec(), vec_spec(), vec_spec(), vec_spec(),
            pl.BlockSpec((t_max, TB), lambda g: (jnp.int32(0), g),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[vec_spec()] * 6,
        out_shape=[jax.ShapeDtypeStruct((1, B), jnp.int32)] * 6,
        interpret=interpret,
    )(qT, qlen.reshape(1, B).astype(i32), tlen.reshape(1, B).astype(i32),
      h0.reshape(1, B).astype(i32), wadj.reshape(1, B).astype(i32),
      end_bonus.reshape(1, B).astype(i32), targetT.astype(i32))
    score, qle, tle, gtle, gscore, max_off = (o.reshape(B) for o in outs)
    return ExtendResult(score=score, qle=qle, tle=tle, gtle=gtle,
                        gscore=gscore, max_off=max_off)


@functools.partial(jax.jit, static_argnames=(
    "lq_max", "t_max", "mat_bytes", "o_del", "e_del", "o_ins", "e_ins",
    "zdrop", "w_opt", "interpret"))
def extend_batch_pl2(queryT, qlen, targetT, tlen, h0, end_bonus, *,
                     lq_max, t_max, mat_bytes, o_del, e_del, o_ins, e_ins,
                     zdrop, w_opt, interpret=False):
    """extend_batch_pl + the band-doubling retry INSIDE the kernel: pass 1
    at w_opt, in-kernel retry at 2*w_opt for lanes whose pass-1 max_off
    crossed the (w>>1)+(w>>2) threshold with a changed score
    (bwamem.c:732-741).  Returns (ExtendResult, retried [B] int32) — the
    caller maps `retried` to aw = 2*w_opt vs w_opt."""
    B = queryT.shape[1]
    assert B % TB == 0
    LQ = lq_max
    L1p = _ceil8(LQ + 1)
    assert LQ <= 4095
    mat = np.frombuffer(mat_bytes, np.int8).reshape(5, 5).astype(int)
    matl = [[int(mat[c][b]) for b in range(5)] for c in range(5)]
    i32 = jnp.int32

    w1 = jnp.full((B,), w_opt, i32)
    w2 = jnp.full((B,), 2 * w_opt, i32)
    eb = end_bonus.astype(i32)
    wadj1 = _adjust_w(w1, qlen, int(mat.max()), eb, o_ins, e_ins,
                      o_del, e_del)
    wadj2 = _adjust_w(w2, qlen, int(mat.max()), eb, o_ins, e_ins,
                      o_del, e_del)
    thr = jnp.full((B,), (w_opt >> 1) + (w_opt >> 2), i32)

    qT = jnp.zeros((L1p, B), i32).at[:LQ].set(queryT.astype(i32))
    grid = B // TB

    kernel = functools.partial(
        _kernel_retry, LQ=LQ, L1p=L1p, t_max=t_max, mat=matl, o_del=o_del,
        e_del=e_del, o_ins=o_ins, e_ins=e_ins, zdrop=zdrop)

    def vec_spec():
        return pl.BlockSpec((1, TB), lambda g: (jnp.int32(0), g),
                            memory_space=pltpu.VMEM)

    outs = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((L1p, TB), lambda g: (jnp.int32(0), g),
                         memory_space=pltpu.VMEM),
            vec_spec(), vec_spec(), vec_spec(), vec_spec(), vec_spec(),
            vec_spec(),
            pl.BlockSpec((t_max, TB), lambda g: (jnp.int32(0), g),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[vec_spec()] * 7,
        out_shape=[jax.ShapeDtypeStruct((1, B), jnp.int32)] * 7,
        interpret=interpret,
    )(qT, qlen.reshape(1, B).astype(i32), tlen.reshape(1, B).astype(i32),
      h0.reshape(1, B).astype(i32), wadj1.reshape(1, B),
      wadj2.reshape(1, B), thr.reshape(1, B), targetT.astype(i32))
    score, qle, tle, gtle, gscore, max_off, retried = (
        o.reshape(B) for o in outs)
    return ExtendResult(score=score, qle=qle, tle=tle, gtle=gtle,
                        gscore=gscore, max_off=max_off), retried
