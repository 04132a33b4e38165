"""Batched unbanded local Smith-Waterman — ksw_align2 semantics.

Exact behavior of the reference's SSE2 striped SW (ksw_u8/ksw_i16,
ksw.c:112-334) and the ksw_align2 two-pass start-finding wrapper
(ksw.c:343-369), used by mate rescue (mem_matesw, bwamem_pair.c:137-206)
with xtra = KSW_XSUBO | KSW_XSTART | minsc:

  * score/te:   best score; te = FIRST target row attaining it strictly;
  * qe:         minimum query index attaining the best row's maximum
                (the striped iteration order reduces to exactly this);
  * score2/te2: best row-max outside te ± ceil(score/max_mat), where
                consecutive qualifying rows (rowmax >= minsc) merge into
                one run keeping (run max, first row attaining it);
  * tb/qb:      from a second pass over the reversed prefixes with
                XSTOP = score (early stop at the first row reaching it);
                -1 when the second pass disagrees (ksw.c:365-366).

TPU reorganization mirrors ops/extend.py: one fori step = one target row
for every lane, the row's serial F recurrence solved with an associative
prefix max (valid because o_ins + e_ins > e_ins, so an F-derived H never
opens a better F), per-lane done masks instead of breaks.  Saturating-u8
quirks of ksw_u8 are unreachable for scores < 251, which mem_matesw
guarantees by choosing XBYTE only when l_ms * a < 250.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class KswResult(NamedTuple):
    score: jax.Array    # [B]
    te: jax.Array       # [B]
    qe: jax.Array       # [B]
    score2: jax.Array   # [B]
    te2: jax.Array      # [B]
    tb: jax.Array       # [B]
    qb: jax.Array       # [B]


def _pass(query, qlen, qpadlen, target, tlen, endsc, matf, o_del, e_del,
          o_ins, e_ins):
    """One striped-SW forward pass; returns (gmax, te, Hmax, rowmax).

    qpadlen = qlen rounded up to the SIMD stripe (16 for ksw_u8, 8 for
    ksw_i16): the reference's striped layout implicitly extends the query
    with phantom positions scoring 0 against every base (ksw_qinit,
    ksw.c:94-97 `k >= qlen? 0 : ...`), and those phantom columns carry
    "ghost" values into later row maxima — which changes score2/te2.
    Bit parity requires modeling them."""
    B, LQ = query.shape
    LT = target.shape[1]
    i32 = jnp.int32
    oe_del, oe_ins = o_del + e_del, o_ins + e_ins
    col = jnp.arange(LQ, dtype=i32)[None, :]
    qpad = jnp.where(col < qlen[:, None], query.astype(i32), 4)
    inq = col < qlen[:, None]
    inp = col < qpadlen[:, None]
    ramp = e_ins * col
    NEG = -0x40000000
    prof = jnp.stack([jnp.where(inq, matf[c * 5 + qpad], 0)
                      for c in range(5)], axis=1)

    state = dict(
        Hp=jnp.zeros((B, LQ), i32), E=jnp.zeros((B, LQ), i32),
        gmax=jnp.zeros((B,), i32), te=jnp.full((B,), -1, i32),
        Hmax=jnp.zeros((B, LQ), i32),
        rowmax=jnp.zeros((B, LT), i32),
        done=tlen <= 0,
    )

    def body(i, st):
        act = (~st["done"]) & (i < tlen)
        tb = jax.lax.dynamic_index_in_dim(target, jnp.minimum(i, LT - 1),
                                          axis=1, keepdims=False)
        tbi = tb.astype(i32)[:, None]
        S = sum(jnp.where(tbi == c, prof[:, c], 0) for c in range(4)) \
            + jnp.where(tbi >= 4, prof[:, 4], 0)
        Hp_sh = jnp.concatenate(
            [jnp.zeros((B, 1), i32), st["Hp"][:, :-1]], axis=1)
        M = jnp.maximum(Hp_sh + S, 0)
        ME = jnp.where(inp, jnp.maximum(M, st["E"]), 0)
        # F(j) = max(0, max_{j'<j}(ME(j') + e*j') - oe - e*(j-1))
        A = jnp.where(inp, ME + ramp, NEG)
        G = jax.lax.associative_scan(jnp.maximum, A, axis=1)
        Gp = jnp.concatenate([jnp.full((B, 1), NEG, i32), G[:, :-1]], axis=1)
        F = jnp.maximum(Gp - oe_ins - ramp + e_ins, 0)
        H = jnp.where(inp, jnp.maximum(ME, F), 0)
        E2 = jnp.where(
            inp, jnp.maximum(jnp.maximum(st["E"] - e_del, H - oe_del), 0), 0)

        imax = H.max(axis=1)
        rowmax = st["rowmax"].at[:, i].set(jnp.where(act, imax, 0))
        better = act & (imax > st["gmax"])
        gmax = jnp.where(better, imax, st["gmax"])
        te = jnp.where(better, i, st["te"])
        Hmax = jnp.where(better[:, None], H, st["Hmax"])
        done = st["done"] | (better & (gmax >= endsc)) | (i + 1 >= tlen)
        return dict(
            Hp=jnp.where(act[:, None], H, st["Hp"]),
            E=jnp.where(act[:, None], E2, st["E"]),
            gmax=gmax, te=te, Hmax=Hmax, rowmax=rowmax, done=done)

    st = jax.lax.fori_loop(0, LT, body, state)
    return st["gmax"], st["te"], st["Hmax"], st["rowmax"]


def _qe_from_hmax(Hmax, score):
    """Minimum query index attaining the snapshot row's max
    (ksw.c:218-221 reduced)."""
    LQ = Hmax.shape[1]
    m = Hmax.max(axis=1)
    col = jnp.arange(LQ, dtype=jnp.int32)[None, :]
    qe = jnp.where(Hmax == m[:, None], col, LQ).min(axis=1)
    return qe, m


def _score2(rowmax, tlen, te, score, minsc, max_mat):
    """b-array entry merging + exclusion window (ksw.c:204-213, 224-231).

    An entry (max, row) absorbs row i only when i == row + 1, advancing its
    row ONLY on strict improvement (ksw.c:206-212); any other qualifying
    row finalizes the entry and opens a new one.  At the end the best entry
    with row outside te ± ceil(score/max_mat) is score2 (first such entry
    wins ties, strictly-greater comparison)."""
    B, LT = rowmax.shape
    i32 = jnp.int32
    d = (score + max_mat - 1) // max_mat
    lo, hi = te - d, te + d

    def finalize(entry_max, entry_row, have, best2, best2_row, cond):
        outside = (entry_row < lo) | (entry_row > hi)
        take = cond & have & outside & (entry_max > best2)
        return (jnp.where(take, entry_max, best2),
                jnp.where(take, entry_row, best2_row))

    def body(i, st):
        entry_max, entry_row, have, best2, best2_row = st
        v = rowmax[:, i]
        ok = (i < tlen) & (v >= minsc)
        adjacent = have & (entry_row + 1 == i)
        improve = ok & adjacent & (v > entry_max)
        newent = ok & ~adjacent
        best2, best2_row = finalize(entry_max, entry_row, have,
                                    best2, best2_row, newent)
        entry_max = jnp.where(improve | newent, v, entry_max)
        entry_row = jnp.where(improve | newent, i, entry_row)
        have = have | ok
        return entry_max, entry_row, have, best2, best2_row

    z = jnp.zeros((B,), i32)
    entry_max, entry_row, have, best2, best2_row = jax.lax.fori_loop(
        0, LT, body, (z, jnp.full((B,), -2, i32), jnp.zeros((B,), bool),
                      jnp.full((B,), -1, i32), jnp.full((B,), -1, i32)))
    best2, best2_row = finalize(entry_max, entry_row, have, best2,
                                best2_row, jnp.ones((B,), bool))
    return best2, best2_row


@functools.partial(jax.jit, static_argnames=(
    "o_del", "e_del", "o_ins", "e_ins", "max_mat", "p"))
def ksw_align_batch(query: jax.Array, qlen: jax.Array, target: jax.Array,
                    tlen: jax.Array, minsc: jax.Array, mat: jax.Array, *,
                    o_del: int, e_del: int, o_ins: int, e_ins: int,
                    max_mat: int, p: int = 16) -> KswResult:
    """ksw_align2 with xtra = KSW_XSUBO | KSW_XSTART | minsc, batched.

    p is the SIMD stripe width of the emulated kernel: 16 for ksw_u8
    (chosen by mem_matesw when l_ms * a < 250), 8 for ksw_i16.  The query
    behaves as if padded to a multiple of p with phantom 0-scoring bases
    (see _pass); LQ must be >= max padded length."""
    B, LQ = query.shape
    LT = target.shape[1]
    i32 = jnp.int32
    matf = jnp.reshape(jnp.asarray(mat).astype(i32), (-1,))
    qlen = qlen.astype(i32)
    tlen = tlen.astype(i32)
    minsc = jnp.broadcast_to(jnp.asarray(minsc, i32), (B,))
    BIGS = jnp.asarray(0x10000, i32)

    def padlen(n):
        return jnp.minimum((n + p - 1) // p * p, LQ)

    gmax, te, Hmax, rowmax = _pass(query, qlen, padlen(qlen), target, tlen,
                                   BIGS, matf, o_del, e_del, o_ins, e_ins)
    qe, _ = _qe_from_hmax(Hmax, gmax)
    score2, te2 = _score2(rowmax, tlen, te, gmax, minsc, max_mat)

    # ---- second pass on reversed prefixes (KSW_XSTART, ksw.c:360-367) ----
    do2 = gmax >= minsc
    col_q = jnp.arange(LQ, dtype=i32)[None, :]
    col_t = jnp.arange(LT, dtype=i32)[None, :]
    q2len = jnp.where(do2, qe + 1, 0)
    t2len = jnp.where(do2, te + 1, 0)
    qidx = jnp.clip(qe[:, None] - col_q, 0, LQ - 1)
    tidx = jnp.clip(te[:, None] - col_t, 0, LT - 1)
    q2 = jnp.take_along_axis(query, qidx, axis=1)
    t2 = jnp.take_along_axis(target, tidx, axis=1)
    g2, te_r, Hmax2, _ = _pass(q2, q2len, padlen(q2len), t2, t2len, gmax,
                               matf, o_del, e_del, o_ins, e_ins)
    qe_r, _ = _qe_from_hmax(Hmax2, g2)
    agree = do2 & (g2 == gmax)
    tb = jnp.where(agree, te - te_r, -1)
    qb = jnp.where(agree, qe - qe_r, -1)
    return KswResult(score=gmax, te=te, qe=qe, score2=score2, te2=te2,
                     tb=tb, qb=qb)
