"""Banded affine-gap Smith-Waterman extension — batched, row-parallel.

Exact semantics of ksw_extend2 (reference ksw.c:380-479) — including the
adaptive [beg,end) window, z-drop row termination, the M==0 short-circuit
that forbids "100M3I3D20M"-style cigars, to-end (gscore) bookkeeping and
max_off tracking — but reorganized for the TPU VPU:

  * one grid step = one TARGET row for every lane in the batch;
  * the row's horizontal F-dependency (F(i,j+1) = max(H(i,j)-oe, F(i,j))-e)
    is resolved with a prefix-max scan: because an F-dominant H never opens
    a better F (oe > e), F(j) = max_{j'<j} (max(0, M(j')-oe) - (j-1-j')*e),
    which after adding e*j to both sides is a plain running maximum —
    O(log L) per row on the VPU instead of a serial chain;
  * per-lane scalars (beg, end, max, max_i/j, gscore, zdrop-done) ride in
    the fori_loop carry; finished lanes are masked, not retired.

ops/pallas_ext.py is the same algorithm as a Mosaic kernel (query-major
layout); this module is the reference-parity implementation and the
fallback for CPU execution.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

NEG = -0x40000000


class ExtendResult(NamedTuple):
    score: jax.Array     # [B] best local score (>= h0 semantics of ksw)
    qle: jax.Array       # [B] query end (local)
    tle: jax.Array       # [B] target end (local)
    gtle: jax.Array      # [B] target end of best to-query-end extension
    gscore: jax.Array    # [B] best to-query-end score (-1 if none)
    max_off: jax.Array   # [B] max diagonal offset of the best cell


def _adjust_w(w, qlen, max_mat, end_bonus, o_ins, e_ins, o_del, e_del):
    """Band clamp (ksw.c:399-407): w = min(w, max_ins, max_del)."""
    qf = qlen.astype(jnp.float64)
    max_ins = (qf * max_mat + end_bonus - o_ins) / e_ins + 1.0
    max_ins = jnp.maximum(max_ins.astype(jnp.int32), 1)
    max_del = (qf * max_mat + end_bonus - o_del) / e_del + 1.0
    max_del = jnp.maximum(max_del.astype(jnp.int32), 1)
    return jnp.minimum(jnp.minimum(w, max_ins), max_del)


def extend_batch(query: jax.Array, qlen: jax.Array,
                 target_at, tlen: jax.Array,
                 h0: jax.Array, w: jax.Array, end_bonus: jax.Array,
                 mat: jax.Array, *, o_del: int, e_del: int, o_ins: int,
                 e_ins: int, zdrop: int, t_max: int) -> ExtendResult:
    """Run ksw_extend2 for B lanes in lockstep.

    query:  [B, LQ] nt4 codes (already reversed for left extensions)
    qlen:   [B]
    target_at: callable (i:[B]) -> [B] nt4 code of target row i per lane
               (keeps reference bases in HBM; no [B, t_max] materialization)
    tlen:   [B]; t_max: static bound on rows
    h0:     [B] > 0 starting score; w: [B] band; end_bonus: [B]
    mat:    [5,5] int8 scoring matrix
    """
    B, LQ = query.shape
    L1 = LQ + 1
    i32 = jnp.int32
    # (h << SH) | col packing in the row reduction: SH = 12 keeps the
    # historical encoding (col < 2^12, score < 2^(31-12)) for short reads;
    # longer queries widen the column field, shrinking the score headroom
    # (score <= LQ*max_mat + end_bonus stays far below 2^(31-SH) for any
    # real scoring scheme — callers enforce it, extend_host.submit)
    SH = max(12, int(LQ).bit_length())
    CMASK = (1 << SH) - 1
    assert LQ <= CMASK, (LQ, SH)
    oe_del = o_del + e_del
    oe_ins = o_ins + e_ins
    max_mat = int(np.max(np.asarray(mat)))

    w = _adjust_w(w.astype(i32), qlen, max_mat, end_bonus.astype(i32),
                  o_ins, e_ins, o_del, e_del)

    jj = jnp.arange(L1, dtype=i32)[None, :]           # [1, L1]
    # first row of eh (ksw.c:395-397)
    v = h0[:, None] - oe_ins - (jj - 1) * e_ins
    eh_h = jnp.where(jj == 0, h0[:, None], jnp.maximum(v, 0))
    eh_h = jnp.where(jj <= qlen[:, None], eh_h, 0).astype(i32)
    eh_e = jnp.zeros((B, L1), i32)

    qpad = jnp.where(jj[:, :LQ] < qlen[:, None], query.astype(i32), 4)
    matf = jnp.asarray(np.asarray(mat).astype(np.int32).reshape(-1))
    # score-profile rows, precomputed per target symbol so the row loop
    # does a 5-way select instead of a per-row gather
    prof = jnp.stack([matf[c * 5 + qpad] for c in range(5)], axis=1)

    # decay offsets for the F prefix-max trick
    ramp = (jj[:, :LQ] * e_ins).astype(i32)           # e*j per column

    state = dict(
        eh_h=eh_h, eh_e=eh_e,
        beg=jnp.zeros((B,), i32), end=qlen.astype(i32),
        mx=h0.astype(i32), max_i=jnp.full((B,), -1, i32),
        max_j=jnp.full((B,), -1, i32), max_ie=jnp.full((B,), -1, i32),
        gscore=jnp.full((B,), -1, i32), max_off=jnp.zeros((B,), i32),
        done=tlen <= 0,
    )

    def body(i, st):
        act = (~st["done"]) & (i < tlen)
        beg = jnp.maximum(st["beg"], i - w)
        end = jnp.minimum(jnp.minimum(st["end"], i + w + 1), qlen.astype(i32))

        tb = target_at(i)                              # [B], garbage when
        # i >= tlen is fine: those lanes are done-masked below
        q = sum(jnp.where(tb[:, None] == c, prof[:, c], 0) for c in range(4))
        q = q + jnp.where(tb[:, None] >= 4, prof[:, 4], 0)

        col = jj[:, :LQ]                               # [B?, LQ] broadcast
        win = (col >= beg[:, None]) & (col < end[:, None])

        M = st["eh_h"][:, :LQ]
        E = st["eh_e"][:, :LQ]
        Mq = jnp.where(M != 0, M + q, 0)               # ksw.c:433 M?M+q:0
        # F via prefix-max with linear decay (first f at beg is 0)
        t_ins = jnp.maximum(Mq - oe_ins, 0)
        A = jnp.where(win, t_ins + ramp + e_ins, NEG)
        G = jax.lax.associative_scan(jnp.maximum, A, axis=1)
        Gprev = jnp.concatenate([jnp.full((B, 1), NEG, i32), G[:, :-1]],
                                axis=1)
        F = jnp.maximum(Gprev - ramp, 0)
        F = jnp.where(col == beg[:, None], 0, F)

        h = jnp.maximum(jnp.maximum(Mq, E), F)
        h = jnp.where(win, h, 0)

        # h1 entering column beg (ksw.c:420-423)
        h1_init = jnp.where(beg == 0,
                            jnp.maximum(h0 - (o_del + e_del * (i + 1)), 0), 0)

        # ONE packed reduction for (row max + its LAST attaining column) and
        # (h at column end-1): every standalone reduce/gather is a fusion
        # barrier with a large flat per-iteration cost on this backend, and
        # the per-lane h[end-1] gather was the single hottest op of the loop
        mj_enc = (h << SH) | col                # h < 2^(31-SH), col <= CMASK
        h1_enc = jnp.where(col == (end - 1)[:, None], h, NEG)
        packed = jnp.stack([mj_enc, h1_enc], axis=1)   # [B, 2, LQ]
        red = packed.max(axis=2)                       # [B, 2]
        m = red[:, 0] >> SH
        mj = jnp.where(m > 0, red[:, 0] & CMASK,
                       jnp.where(end > beg, end - 1, -1))

        # E update (ksw.c:439-443)
        e_new = jnp.maximum(E - e_del, jnp.maximum(Mq - oe_del, 0))

        # write back eh rows: eh_h[j] = H(i, j-1) for j in [beg, end];
        # eh_e[j] for j in [beg, end); eh_e[end] = 0
        h_sh = jnp.concatenate([jnp.zeros((B, 1), i32), h], axis=1)  # [B,L1]
        wh = (jj >= beg[:, None]) & (jj <= end[:, None])
        new_h = jnp.where(jj == beg[:, None], h1_init[:, None], h_sh)
        eh_h2 = jnp.where(wh & act[:, None], new_h, st["eh_h"])
        e_pad = jnp.concatenate([e_new, jnp.zeros((B, 1), i32)], axis=1)
        we = (jj >= beg[:, None]) & (jj < end[:, None])
        eh_e2 = jnp.where(we & act[:, None], e_pad, st["eh_e"])
        eh_e2 = jnp.where((jj == end[:, None]) & act[:, None], 0, eh_e2)

        # gscore at the last query column (ksw.c:450-453)
        h1_last = jnp.where(end > beg, red[:, 1], h1_init)
        reach = act & (end == qlen)
        upd_g = reach & (st["gscore"] <= h1_last)
        max_ie2 = jnp.where(reach & (st["gscore"] > h1_last), st["max_ie"],
                            jnp.where(reach, i, st["max_ie"]))
        gscore2 = jnp.where(upd_g, jnp.maximum(st["gscore"], h1_last),
                            st["gscore"])

        # break / max update (ksw.c:454-464)
        brk0 = act & (m == 0)
        better = act & (m > st["mx"])
        mx2 = jnp.where(better, m, st["mx"])
        max_i2 = jnp.where(better, i, st["max_i"])
        max_j2 = jnp.where(better, mj, st["max_j"])
        off = jnp.abs(mj - i)
        max_off2 = jnp.where(better, jnp.maximum(st["max_off"], off),
                             st["max_off"])
        di = i - st["max_i"]
        dj = mj - st["max_j"]
        zd = jnp.where(di > dj,
                       st["mx"] - m - (di - dj) * e_del > zdrop,
                       st["mx"] - m - (dj - di) * e_ins > zdrop)
        brk1 = act & ~brk0 & ~better & (zdrop > 0) & zd

        # window shrink (ksw.c:466-469) on the NEW eh values; both scans in
        # one packed reduction (no nz column exists in [beg, first_nz), so
        # the last-nz mask can start at beg instead of the serial beg2)
        nz = (eh_h2 != 0) | (eh_e2 != 0)
        inwin = (jj >= beg[:, None]) & (jj < end[:, None])
        BIGJ = jnp.int32(1 << 20)
        fst_enc = jnp.where(inwin & nz, BIGJ - jj, -1)
        lst_enc = jnp.where((jj >= beg[:, None]) & (jj <= end[:, None]) & nz,
                            jj, -1)
        red2 = jnp.stack([fst_enc, lst_enc], axis=1).max(axis=2)  # [B, 2]
        first_nz = jnp.where(red2[:, 0] < 0, L1, BIGJ - red2[:, 0])
        beg2 = jnp.minimum(first_nz, end)
        last_nz = red2[:, 1]
        end2 = jnp.minimum(last_nz + 2, qlen.astype(i32))

        done2 = st["done"] | brk0 | brk1 | (i + 1 >= tlen)
        keep = act & ~brk0 & ~brk1
        return dict(
            eh_h=eh_h2, eh_e=eh_e2,
            beg=jnp.where(keep, beg2, st["beg"]),
            end=jnp.where(keep, end2, st["end"]),
            mx=jnp.where(act & ~brk0, mx2, st["mx"]),
            max_i=jnp.where(act & ~brk0, max_i2, st["max_i"]),
            max_j=jnp.where(act & ~brk0, max_j2, st["max_j"]),
            max_ie=jnp.where(act, max_ie2, st["max_ie"]),
            gscore=jnp.where(act, gscore2, st["gscore"]),
            max_off=jnp.where(act & ~brk0, max_off2, st["max_off"]),
            done=done2,
        )

    def cond(carry):
        i, st = carry
        return (i < t_max) & jnp.any(~st["done"])

    def wbody(carry):
        i, st = carry
        return i + 1, body(i, st)

    _, st = jax.lax.while_loop(cond, wbody, (jnp.asarray(0, i32), state))
    return ExtendResult(score=st["mx"], qle=st["max_j"] + 1,
                        tle=st["max_i"] + 1, gtle=st["max_ie"] + 1,
                        gscore=st["gscore"], max_off=st["max_off"])
