"""Banded global (Needleman-Wunsch) alignment with traceback — batched.

Exact semantics of ksw_global2 (reference ksw.c:504-606): banded affine-gap
DP over [max(i-w,0), min(i+w+1, qlen)) per target row with a 6-bit direction
byte per cell (h dir in bits 0-1, E-extend in bit 2, F-extend in bits 4-5),
followed by the which-state traceback and run-length cigar merging of
push_cigar (ksw.c:491-501).

TPU reorganization: one fori_loop step = one target row for EVERY lane; the
serial F recurrence F(i,j+1) = max(M(i,j)-oe_ins, F(i,j)-e_ins) is solved
per row with an associative prefix max over A(j) = M(j) + e_ins*j, giving
F(j) = maxprefix(A)(j-1) - oe_ins - e_ins*(j-1).  The direction matrix stays
in fixed shape [B, LT, n_col] (uint8); traceback runs as a lockstep masked
while_loop emitting fixed-capacity (op, len) run tables that the host turns
into CIGAR strings.

This op is the back half of the reference's FINALIZEALN stage
(FINALIZEALN_globalSW_kernel, cuda/bwamem_GPU.cu:3111-3183), minus the
device-side MD/NM string generation which we keep on host.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

NEG = -0x40000000


class GlobalResult(NamedTuple):
    score: jax.Array      # [B] int32 — H(tlen-1, qlen-1)
    ops: jax.Array        # [B, MC] int32 cigar op per run (0 M, 1 I, 2 D)
    lens: jax.Array       # [B, MC] int32 run lengths
    n_cigar: jax.Array    # [B] int32 runs used
    overflow: jax.Array   # [B] bool — more runs than MC (host fallback)


@functools.partial(jax.jit, static_argnames=(
    "w_max", "max_cigar", "o_del", "e_del", "o_ins", "e_ins", "with_cigar"))
def global_align_batch(query: jax.Array, qlen: jax.Array,
                       target: jax.Array, tlen: jax.Array,
                       w: jax.Array, mat: jax.Array, *,
                       o_del: int, e_del: int, o_ins: int, e_ins: int,
                       w_max: int, max_cigar: int = 32,
                       with_cigar: bool = True) -> GlobalResult:
    """Banded global alignment of B (query, target) pairs in lockstep.

    query/target: [B, LQ]/[B, LT] nt4 codes (callers pre-reverse both for
    reverse-strand hits so indels left-align, as bwa_gen_cigar2 bwa.c:275).
    w: [B] per-lane band (clamped to the static w_max bucket).
    """
    B, LQ = query.shape
    LT = target.shape[1]
    i32 = jnp.int32
    oe_del, oe_ins = o_del + e_del, o_ins + e_ins
    NCOL = min(LQ, 2 * w_max + 1)
    MC = max_cigar

    w = jnp.minimum(w.astype(i32), w_max)
    qlen = qlen.astype(i32)
    tlen = tlen.astype(i32)
    rows1 = jnp.arange(B, dtype=i32)

    jj = jnp.arange(LQ + 1, dtype=i32)[None, :]
    col = jj[:, :LQ]
    qpad = jnp.where(col < qlen[:, None], query.astype(i32), 4)
    matf = jnp.reshape(jnp.asarray(mat).astype(i32), (-1,))
    prof = jnp.stack([matf[c * 5 + qpad] for c in range(5)], axis=1)

    # first row (ksw.c:520-524): eh[j].h = -(o_ins+e_ins*j) for 1<=j<=w
    Hp = jnp.where(jj == 0, 0,
                   jnp.where((jj <= w[:, None]) & (jj <= qlen[:, None]),
                             -(o_ins + e_ins * jj), NEG)).astype(i32)
    Ep = jnp.full((B, LQ + 1), NEG, i32)
    z0 = jnp.zeros((B, LT, NCOL), jnp.uint8) if with_cigar else \
        jnp.zeros((B, 1, 1), jnp.uint8)

    ramp = e_ins * col

    def body(i, st):
        Hp, Ep, z = st
        act = i < tlen
        beg = jnp.maximum(i - w, 0)
        end = jnp.minimum(i + w + 1, qlen)
        tb = jax.lax.dynamic_index_in_dim(target, jnp.minimum(i, LT - 1),
                                          axis=1, keepdims=False)
        tbi = tb.astype(i32)[:, None]
        q = sum(jnp.where(tbi == c, prof[:, c], 0) for c in range(4)) \
            + jnp.where(tbi >= 4, prof[:, 4], 0)              # [B, LQ]
        win = (col >= beg[:, None]) & (col < end[:, None])

        m = Hp[:, :LQ] + q
        e = Ep[:, :LQ]
        # F prefix-max: F(j) = max_{j'<j}(M(j')+e*j') - oe - e*(j-1)
        A = jnp.where(win, m + ramp, NEG)
        G = jax.lax.associative_scan(jnp.maximum, A, axis=1)
        Gprev = jnp.concatenate([jnp.full((B, 1), NEG, i32), G[:, :-1]],
                                axis=1)
        F = jnp.where(Gprev <= NEG // 2, NEG,
                      Gprev - oe_ins - ramp + e_ins)

        d = jnp.where(m >= e, 0, 1).astype(jnp.uint8)
        h = jnp.maximum(m, e)
        d = jnp.where(h >= F, d, jnp.uint8(2))
        h = jnp.maximum(h, F)

        t_del = m - oe_del
        ebit = (e - e_del) > t_del
        e_new = jnp.maximum(e - e_del, t_del)
        fbit = (F - e_ins) > (m - oe_ins)
        d = d | (ebit.astype(jnp.uint8) << 2) | (fbit.astype(jnp.uint8) << 5)

        if with_cigar:
            cc = jnp.arange(NCOL, dtype=i32)[None, :]
            src = jnp.clip(beg[:, None] + cc, 0, LQ - 1)
            zrow = jnp.take_along_axis(d, src, axis=1)
            zrow = jnp.where(cc < (end - beg)[:, None], zrow, 0)
            z = jax.lax.dynamic_update_slice_in_dim(
                z, zrow[:, None, :], i, axis=1)

        h1_init = jnp.where(beg == 0, -(o_del + e_del * (i + 1)), NEG)
        h_sh = jnp.concatenate([jnp.zeros((B, 1), i32), h], axis=1)
        wh = (jj >= beg[:, None]) & (jj <= end[:, None])
        Hp2 = jnp.where(wh, jnp.where(jj == beg[:, None], h1_init[:, None],
                                      h_sh), Hp)
        we = (jj >= beg[:, None]) & (jj < end[:, None])
        e_pad = jnp.concatenate([e_new, jnp.full((B, 1), NEG, i32)], axis=1)
        Ep2 = jnp.where(we, e_pad,
                        jnp.where(jj == end[:, None], NEG, Ep))

        Hp = jnp.where(act[:, None], Hp2, Hp)
        Ep = jnp.where(act[:, None], Ep2, Ep)
        return Hp, Ep, z

    Hp, Ep, z = jax.lax.fori_loop(0, LT, body, (Hp, Ep, z0))
    score = jnp.take_along_axis(Hp, qlen[:, None], axis=1)[:, 0]

    if not with_cigar:
        zi = jnp.zeros((B,), i32)
        return GlobalResult(score, jnp.zeros((B, MC), i32),
                            jnp.zeros((B, MC), i32), zi, zi.astype(bool))

    # ---- traceback (ksw.c:589-603) ----
    # The walk itself only RECORDS the per-step `which` stream (one
    # contiguous [1, B] row write per step into a [S, B] buffer); the
    # run-length merging of push_cigar happens vectorized AFTERWARDS.
    # The per-step scatter pushes + [B, LT, NCOL] multi-dim gather of the
    # direct transcription cost ~280 ms per 2048-lane dispatch; the
    # flattened 1-D gather + deferred RLE runs ~5x faster.
    zf = z.reshape(B, -1)
    S = LT + LQ + 2                      # path length bound
    st0 = dict(
        i=tlen - 1,
        k=jnp.minimum(tlen - 1 + w + 1, qlen) - 1,
        which=jnp.zeros((B,), i32), s=jnp.zeros((), i32),
        wbuf=jnp.full((S, B), 3, jnp.uint8),     # 3 = inactive
    )

    def tcond(st):
        return jnp.any((st["i"] >= 0) & (st["k"] >= 0))

    def tbody(st):
        i, k = st["i"], st["k"]
        active = (i >= 0) & (k >= 0)
        beg = jnp.maximum(i - w, 0)
        ic = jnp.clip(i, 0, LT - 1)
        kc = jnp.clip(k - beg, 0, NCOL - 1)
        zi = zf[rows1, ic * NCOL + kc].astype(i32)
        which = (zi >> (st["which"] << 1)) & 3
        which = jnp.where(active, which, st["which"])
        rec = jnp.where(active, which, 3).astype(jnp.uint8)
        wbuf = jax.lax.dynamic_update_slice_in_dim(
            st["wbuf"], rec[None, :], st["s"], axis=0)
        di = jnp.where(which == 2, 0, 1)
        dk = jnp.where(which == 1, 0, 1)
        return dict(i=i - jnp.where(active, di, 0),
                    k=k - jnp.where(active, dk, 0), which=which,
                    s=st["s"] + 1, wbuf=wbuf)

    st = jax.lax.while_loop(tcond, tbody, st0)

    # run-length encode the recorded streams (push_cigar semantics):
    # which 0 → M, 1 → D, 2 → I; 3 marks steps past a lane's exit.
    # Runs are extracted with a per-lane SORT of run-start positions
    # (payload = op) — a lane's valid steps are contiguous from 0, so
    # run j's length is just start[j+1] - start[j].  TPU scatters run at
    # gather-like (slow) element rates; sort is vector-unit fast.
    wb = st["wbuf"].astype(i32).T                     # [B, S]
    opst = jnp.where(wb == 0, 0, jnp.where(wb == 1, 2,
                     jnp.where(wb == 2, 1, -1)))
    valid = opst >= 0
    prev = jnp.concatenate([jnp.full((B, 1), -2, i32), opst[:, :-1]],
                           axis=1)
    startr = valid & (opst != prev)
    srange = jnp.arange(S, dtype=i32)[None, :]
    nrun = jnp.sum(startr.astype(i32), axis=1)                   # [B]
    last_s = jnp.max(jnp.where(valid, srange, -1), axis=1)       # [B]
    last_op = jnp.sum(jnp.where(srange == last_s[:, None], opst, 0)
                      * valid.astype(i32), axis=1)               # [B]
    keys = jnp.where(startr, srange, S + 1)
    sk, so = jax.lax.sort((keys, opst), dimension=1, num_keys=1)
    if MC <= S:
        starts, ops_s = sk[:, :MC], so[:, :MC]
    else:     # retried with a giant cigar cap: runs can never exceed S
        starts = jnp.pad(sk, ((0, 0), (0, MC - S)), constant_values=S + 1)
        ops_s = jnp.pad(so, ((0, 0), (0, MC - S)))
    nxt = jnp.concatenate([starts[:, 1:], jnp.full((B, 1), S + 1, i32)],
                          axis=1)
    lens_s = jnp.minimum(nxt, last_s[:, None] + 1) - starts
    jr = jnp.arange(MC, dtype=i32)[None, :]
    run_ok = jr < jnp.minimum(nrun, MC)[:, None]
    ops = jnp.where(run_ok, ops_s, 0)
    lens = jnp.where(run_ok, lens_s, 0)

    # trailing run (ksw.c:598-599): leading deletions when i survived,
    # else leading insertions — the loop exit makes them mutually
    # exclusive (a lane exits as soon as i < 0 or k < 0)
    i_f, k_f = st["i"], st["k"]
    t_active = (i_f >= 0) | (k_f >= 0)
    t_op = jnp.where(i_f >= 0, 2, 1)
    t_len = jnp.where(i_f >= 0, i_f + 1, k_f + 1)
    t_merge = t_active & (nrun > 0) & (last_op == t_op)
    mslot = jnp.where(t_merge, jnp.minimum(nrun - 1, MC - 1), MC)
    lens = lens.at[rows1, mslot].add(t_len, mode="drop")
    t_new = t_active & ~t_merge
    aslot = jnp.where(t_new & (nrun < MC), nrun, MC)
    ops = ops.at[rows1, aslot].set(t_op, mode="drop")
    lens = lens.at[rows1, aslot].set(t_len, mode="drop")
    n = nrun + t_new.astype(i32)
    overflow = n > MC
    n = jnp.minimum(n, MC)

    # traceback emitted runs back-to-front; reverse per lane
    idx = jnp.clip(n[:, None] - 1 - jnp.arange(MC, dtype=i32)[None, :],
                   0, MC - 1)
    ops_r = jnp.take_along_axis(ops, idx, axis=1)
    lens_r = jnp.take_along_axis(lens, idx, axis=1)
    valid = jnp.arange(MC, dtype=i32)[None, :] < n[:, None]
    ops_r = jnp.where(valid, ops_r, 0)
    lens_r = jnp.where(valid, lens_r, 0)
    return GlobalResult(score, ops_r, lens_r, n, overflow)
