"""Chain → alignment-region driver (mem_chain2aln, bwamem.c:639-793).

The reference walks each read's filtered chains in order, and within a chain
its seeds from longest to shortest; each seed is either skipped (when nearly
contained in an already-computed alignment region and no overlapping longer
seed suggests a different alignment) or extended left+right with banded SW
(band-doubling retry, MAX_BAND_TRY=2).

TPU decomposition: all reads advance through their personal work list (seed
processing order = (chain filter order, seed length desc, slot desc)) in
lockstep *rounds*.  Each round
  1. scans forward over work items applying the skip test (vectorized over
     the read's existing regions and the seeds of the same chain),
  2. runs ONE batched left-extension and ONE batched right-extension
     (ops/extend.extend_batch) for every read's first non-skipped item —
     band-doubling folded in as a second masked pass,
  3. appends the new alignment region to the read's fixed-size region table.
Rounds repeat until every read exhausts its work list.  Reads needing more
regions than the cap are flagged for host fallback.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from bwamem_tpu.ops import fm as fmops
from bwamem_tpu.ops import extend as extops
from bwamem_tpu.ops.chain import Seeds, Chains, FilteredChains


class Regs(NamedTuple):
    """mem_alnreg_t equivalents (reference bwa.h:145-163)."""
    rb: jax.Array        # [N, R] it
    re: jax.Array        # [N, R] it
    qb: jax.Array        # [N, R] int32
    qe: jax.Array        # [N, R] int32
    score: jax.Array     # [N, R] int32
    truesc: jax.Array    # [N, R] int32
    w: jax.Array         # [N, R] int32
    seedcov: jax.Array   # [N, R] int32
    seedlen0: jax.Array  # [N, R] int32
    rid: jax.Array       # [N, R] int32
    frac_rep: jax.Array  # [N] float32
    n: jax.Array         # [N] int32
    overflow: jax.Array  # [N] bool


def _cal_max_gap(qlen, a: int, o_del: int, e_del: int, o_ins: int,
                 e_ins: int, w: int):
    """cal_max_gap (bwamem.c:628-635); C double arithmetic + int truncation."""
    qf = qlen.astype(jnp.float64)
    l_del = ((qf * a - o_del) / e_del + 1.0).astype(jnp.int32)
    l_ins = ((qf * a - o_ins) / e_ins + 1.0).astype(jnp.int32)
    l = jnp.maximum(jnp.maximum(l_del, l_ins), 1)
    return jnp.minimum(l, w * 2)


def chain_rmax(seeds: Seeds, chains: Chains, l_seq, fm: fmops.FM,
               ctg_offsets, *, a: int, o_del: int, e_del: int, o_ins: int,
               e_ins: int, w: int):
    """Reference window [rmax0, rmax1) per chain (bwamem.c:648-666),
    including the strand clip and the bns_fetch_seq contig clamp."""
    N, S = seeds.rbeg.shape
    C = chains.pos.shape[1]
    it = seeds.rbeg.dtype
    sc = chains.seed_chain
    in_ch = sc >= 0
    tgt = jnp.where(in_ch, sc, C)
    rows = jnp.arange(N, dtype=jnp.int32)[:, None]

    gap_l = _cal_max_gap(seeds.qbeg, a, o_del, e_del, o_ins, e_ins, w)
    rem = l_seq[:, None] - seeds.qbeg - seeds.len
    gap_r = _cal_max_gap(rem, a, o_del, e_del, o_ins, e_ins, w)
    b = seeds.rbeg - (seeds.qbeg + gap_l).astype(it)
    e = seeds.rbeg + seeds.len + (rem + gap_r).astype(it)

    big = 2 * fm.l_pac
    rmax0 = jnp.full((N, C), 0, it) + big
    rmax1 = jnp.zeros((N, C), it)
    rmax0 = rmax0.at[rows, tgt].min(jnp.where(in_ch, b, big), mode="drop")
    rmax1 = rmax1.at[rows, tgt].max(jnp.where(in_ch, e, 0), mode="drop")
    rmax0 = jnp.maximum(rmax0, 0)
    rmax1 = jnp.minimum(rmax1, big)
    crosses = (rmax0 < fm.l_pac) & (fm.l_pac < rmax1)
    first_fwd = chains.first_rbeg < fm.l_pac
    rmax1 = jnp.where(crosses & first_fwd, fm.l_pac, rmax1)
    rmax0 = jnp.where(crosses & ~first_fwd, fm.l_pac, rmax0)

    # bns_fetch_seq clamp to the contig holding the first seed (bntseq.c:426)
    pos_f, is_rev = fmops.depos(fm.l_pac, chains.first_rbeg)
    rid = jnp.clip(chains.rid, 0, None)
    far_beg = ctg_offsets[rid].astype(it)
    # contig end from the next offset (or l_pac for the last contig)
    n_ctg = ctg_offsets.shape[0]
    nxt = jnp.where(rid + 1 < n_ctg,
                    ctg_offsets[jnp.minimum(rid + 1, n_ctg - 1)].astype(it),
                    fm.l_pac)
    fb = jnp.where(is_rev, 2 * fm.l_pac - nxt, far_beg)
    fe = jnp.where(is_rev, 2 * fm.l_pac - far_beg, nxt)
    rmax0 = jnp.maximum(rmax0, fb)
    rmax1 = jnp.minimum(rmax1, fe)
    return rmax0, rmax1


class WorkList(NamedTuple):
    seed_slot: jax.Array   # [N, S] slot of w-th work item
    chain: jax.Array       # [N, S] chain of w-th item (-1 invalid)
    n: jax.Array           # [N]


def build_worklist(seeds: Seeds, chains: Chains,
                   fl: FilteredChains) -> WorkList:
    """Processing order: chains by filter order (kept only), seeds within a
    chain by (len desc, slot desc) — the reverse of the reference's
    ks_introsort_64 ascending (score<<32|i) walk (bwamem.c:669-674)."""
    N, S = seeds.rbeg.shape
    C = chains.pos.shape[1]
    rows = jnp.arange(N, dtype=jnp.int32)[:, None]
    # position of each chain in the filtered order
    ord_pos = jnp.zeros((N, C), jnp.int32).at[
        rows, fl.order].set(jnp.broadcast_to(jnp.arange(C, dtype=jnp.int32),
                                             (N, C)))
    kept_of_chain = jnp.zeros((N, C), jnp.int32).at[
        rows, fl.order].set(fl.kept)
    sc = chains.seed_chain
    in_kept = (sc >= 0) & (jnp.take_along_axis(
        kept_of_chain, jnp.clip(sc, 0, C - 1), axis=1) > 0) & seeds.valid
    p = jnp.take_along_axis(ord_pos, jnp.clip(sc, 0, C - 1), axis=1)
    slots = jnp.arange(S, dtype=jnp.int64)[None, :]
    LBIG = jnp.int64(1) << 40
    key = (p.astype(jnp.int64) << 24 | (512 - seeds.len.astype(jnp.int64)) << 12
           | (S - slots))
    key = jnp.where(in_kept, key, LBIG)
    order = jnp.argsort(key, axis=1)
    w_slot = order.astype(jnp.int32)
    w_chain = jnp.take_along_axis(jnp.where(in_kept, sc, -1), order, axis=1)
    n = in_kept.sum(axis=1).astype(jnp.int32)
    return WorkList(w_slot, w_chain, n)


def extend_all(fm: fmops.FM, ctg_offsets, ctg_is_alt, seq, l_seq,
               seeds: Seeds, chains: Chains, fl: FilteredChains, *,
               a: int, o_del: int, e_del: int, o_ins: int, e_ins: int,
               w: int, zdrop: int, pen_clip5: int, pen_clip3: int,
               mat, reg_cap: int = 16) -> Regs:
    N, LQ = seq.shape
    S = seeds.rbeg.shape[1]
    C = chains.pos.shape[1]
    it = seeds.rbeg.dtype
    rows1 = jnp.arange(N, dtype=jnp.int32)
    rows = rows1[:, None]
    matj = np.asarray(mat, dtype=np.int8)  # host constant (static under jit)

    wl = build_worklist(seeds, chains, fl)
    rmax0, rmax1 = chain_rmax(seeds, chains, l_seq, fm, ctg_offsets,
                              a=a, o_del=o_del, e_del=e_del, o_ins=o_ins,
                              e_ins=e_ins, w=w)
    T_MAX = LQ + 2 * w + 4

    # per-work-item seed fields, in work order
    wslot = wl.seed_slot
    w_rbeg = jnp.take_along_axis(seeds.rbeg, wslot, axis=1)
    w_qbeg = jnp.take_along_axis(seeds.qbeg, wslot, axis=1)
    w_len = jnp.take_along_axis(seeds.len, wslot, axis=1)
    w_chainv = wl.chain

    def skip_test(ptr, regs, marks):
        """Evaluate the containment-skip for each read's work item at ptr
        (bwamem.c:678-713).  Returns (is_skippable,)"""
        iptr = jnp.clip(ptr, 0, S - 1)
        s_rb = w_rbeg[rows1, iptr]
        s_qb = w_qbeg[rows1, iptr]
        s_len = w_len[rows1, iptr]
        s_ch = w_chainv[rows1, iptr]
        (rb, re, qb, qe, p_w, p_seedlen0, n_regs) = regs

        exist = jnp.arange(reg_cap, dtype=jnp.int32)[None, :] < n_regs[:, None]
        contained = (exist & (s_rb[:, None] >= rb) & (s_rb[:, None] + s_len[:, None] <= re)
                     & (s_qb[:, None] >= qb) & (s_qb[:, None] + s_len[:, None] <= qe))
        len_ok = (s_len[:, None] - p_seedlen0).astype(jnp.float64) <= \
            0.1 * l_seq.astype(jnp.float64)[:, None]
        qd = s_qb[:, None] - qb
        rd = (s_rb[:, None] - rb).astype(jnp.int32)
        mg = _cal_max_gap(jnp.minimum(qd, rd), a, o_del, e_del, o_ins, e_ins, w)
        ww = jnp.minimum(mg, p_w)
        around1 = (qd - rd < ww) & (rd - qd < ww)
        qd2 = qe - (s_qb[:, None] + s_len[:, None])
        rd2 = (re - (s_rb[:, None] + s_len[:, None])).astype(jnp.int32)
        mg2 = _cal_max_gap(jnp.minimum(qd2, rd2), a, o_del, e_del, o_ins,
                           e_ins, w)
        ww2 = jnp.minimum(mg2, p_w)
        around2 = (qd2 - rd2 < ww2) & (rd2 - qd2 < ww2)
        found = (contained & len_ok & (around1 | around2)).any(axis=1)

        # overlapping-seed exception (bwamem.c:699-706): longer unskipped
        # seeds of the same chain on a different diagonal
        same_chain = (chains.seed_chain == s_ch[:, None]) & (s_ch[:, None] >= 0)
        longer = (seeds.len > s_len[:, None]) | \
            ((seeds.len == s_len[:, None])
             & (jnp.arange(S, dtype=jnp.int32)[None, :] > wslot[rows1, iptr][:, None]))
        t_ok = same_chain & longer & (marks > 0) & \
            (seeds.len.astype(jnp.float64) >= s_len[:, None].astype(jnp.float64) * 0.95)
        t_qb = seeds.qbeg
        t_rb = seeds.rbeg
        c1 = ((s_qb[:, None] <= t_qb)
              & (s_qb[:, None] + s_len[:, None] - t_qb >= (s_len[:, None] >> 2))
              & ((t_qb - s_qb[:, None]).astype(it) != t_rb - s_rb[:, None]))
        c2 = ((t_qb <= s_qb[:, None])
              & (t_qb + seeds.len - s_qb[:, None] >= (s_len[:, None] >> 2))
              & ((s_qb[:, None] - t_qb).astype(it) != s_rb[:, None] - t_rb))
        diff_aln = (t_ok & (c1 | c2)).any(axis=1)
        return found & ~diff_aln

    def round_body(st):
        (ptr, marks, rb, re, qb, qe, r_score, r_truesc, r_w, r_cov, r_sl0,
         r_rid, n_regs, overflow, _) = st

        # ---- 1. advance ptr past skippable items ----
        def scan_body(_, carry):
            ptr, marks = carry
            active = ptr < wl.n
            skip = skip_test(ptr, (rb, re, qb, qe, r_w, r_sl0, n_regs),
                             marks) & active
            slot = wslot[rows1, jnp.clip(ptr, 0, S - 1)]
            marks2 = marks.at[rows1, slot].set(
                jnp.where(skip, 0, marks[rows1, slot]))
            return jnp.where(skip, ptr + 1, ptr), marks2

        ptr, marks = jax.lax.fori_loop(0, S, scan_body, (ptr, marks))

        # ---- 2. batched extension of the current item ----
        act = ptr < wl.n
        iptr = jnp.clip(ptr, 0, S - 1)
        s_rb = w_rbeg[rows1, iptr]
        s_qb = w_qbeg[rows1, iptr]
        s_len = w_len[rows1, iptr]
        s_ch = jnp.clip(w_chainv[rows1, iptr], 0, C - 1)
        c_rmax0 = rmax0[rows1, s_ch]
        c_rmax1 = rmax1[rows1, s_ch]
        c_rid = chains.rid[rows1, s_ch]

        cols = jnp.arange(LQ, dtype=jnp.int32)[None, :]
        wopt = jnp.full((N,), w, jnp.int32)

        # left: reversed query[0:qbeg], reversed ref[rmax0:rbeg]
        lq_idx = s_qb[:, None] - 1 - cols
        lquery = jnp.where(lq_idx >= 0, seq[rows, jnp.clip(lq_idx, 0, LQ - 1)],
                           4).astype(jnp.uint8)
        lqlen = jnp.where(act, s_qb, 0)
        ltlen = jnp.where(act, (s_rb - c_rmax0).astype(jnp.int32), 0)
        lh0 = jnp.maximum(s_len * a, 1)

        def l_target(i):
            return fmops.ref_base(fm, jnp.clip(s_rb - 1 - i.astype(it),
                                               0, 2 * fm.l_pac - 1))

        eb5 = jnp.full((N,), pen_clip5, jnp.int32)
        L0 = extops.extend_batch(lquery, lqlen, l_target, ltlen, lh0, wopt,
                                 eb5, matj, o_del=o_del, e_del=e_del,
                                 o_ins=o_ins, e_ins=e_ins, zdrop=zdrop,
                                 t_max=T_MAX)
        retryL = L0.max_off >= ((wopt >> 1) + (wopt >> 2))
        wL = jnp.where(retryL, wopt * 2, wopt)
        L1 = extops.extend_batch(lquery, lqlen, l_target, ltlen, lh0, wL,
                                 eb5, matj, o_del=o_del, e_del=e_del,
                                 o_ins=o_ins, e_ins=e_ins, zdrop=zdrop,
                                 t_max=T_MAX)
        Lres = jax.tree.map(lambda x1, x0: jnp.where(retryL, x1, x0), L1, L0)
        aw0 = wL

        has_left = act & (s_qb > 0)
        loc_l = (Lres.gscore <= 0) | (Lres.gscore <= Lres.score - pen_clip5)
        score_l = jnp.where(has_left, Lres.score, s_len * a)
        n_qb = jnp.where(has_left,
                         jnp.where(loc_l, s_qb - Lres.qle, 0), 0)
        n_rb = jnp.where(has_left,
                         jnp.where(loc_l, s_rb - Lres.tle,
                                   s_rb - Lres.gtle.astype(it)),
                         s_rb)
        truesc_l = jnp.where(has_left,
                             jnp.where(loc_l, Lres.score, Lres.gscore),
                             s_len * a)

        # right: query[qe:], ref[rbeg+len : rmax1]
        s_qe = s_qb + s_len
        rq_idx = s_qe[:, None] + cols
        rquery = jnp.where(rq_idx < l_seq[:, None],
                           seq[rows, jnp.clip(rq_idx, 0, LQ - 1)],
                           4).astype(jnp.uint8)
        rqlen = jnp.where(act, l_seq - s_qe, 0)
        rtlen = jnp.where(act, (c_rmax1 - (s_rb + s_len)).astype(jnp.int32), 0)
        sc0 = jnp.maximum(score_l, 1)

        def r_target(i):
            return fmops.ref_base(fm, jnp.clip(s_rb + s_len + i.astype(it),
                                               0, 2 * fm.l_pac - 1))

        eb3 = jnp.full((N,), pen_clip3, jnp.int32)
        R0 = extops.extend_batch(rquery, rqlen, r_target, rtlen, sc0, wopt,
                                 eb3, matj, o_del=o_del, e_del=e_del,
                                 o_ins=o_ins, e_ins=e_ins, zdrop=zdrop,
                                 t_max=T_MAX)
        retryR = R0.max_off >= ((wopt >> 1) + (wopt >> 2))
        wR = jnp.where(retryR, wopt * 2, wopt)
        R1 = extops.extend_batch(rquery, rqlen, r_target, rtlen, sc0, wR,
                                 eb3, matj, o_del=o_del, e_del=e_del,
                                 o_ins=o_ins, e_ins=e_ins, zdrop=zdrop,
                                 t_max=T_MAX)
        Rres = jax.tree.map(lambda x1, x0: jnp.where(retryR, x1, x0), R1, R0)
        aw1 = wR

        has_right = act & (s_qe < l_seq)
        loc_r = (Rres.gscore <= 0) | (Rres.gscore <= Rres.score - pen_clip3)
        score_f = jnp.where(has_right, Rres.score, score_l)
        n_qe = jnp.where(has_right,
                         jnp.where(loc_r, s_qe + Rres.qle, l_seq), l_seq)
        n_re = jnp.where(has_right,
                         jnp.where(loc_r, s_rb + s_len + Rres.tle.astype(it),
                                   s_rb + s_len + Rres.gtle.astype(it)),
                         s_rb + s_len)
        truesc_f = truesc_l + jnp.where(
            has_right, jnp.where(loc_r, Rres.score - sc0, Rres.gscore - sc0), 0)

        aw0 = jnp.where(has_left, aw0, wopt)
        aw1 = jnp.where(has_right, aw1, wopt)
        n_w = jnp.maximum(aw0, aw1)

        # seedcov (bwamem.c:781-786)
        in_chain = chains.seed_chain == w_chainv[rows1, iptr][:, None]
        cov_ok = (in_chain & (seeds.qbeg >= n_qb[:, None])
                  & (seeds.qbeg + seeds.len <= n_qe[:, None])
                  & (seeds.rbeg >= n_rb[:, None])
                  & (seeds.rbeg + seeds.len <= n_re[:, None]))
        cov = jnp.where(cov_ok, seeds.len, 0).sum(axis=1, dtype=jnp.int32)

        # ---- 3. append region ----
        can = act & (n_regs < reg_cap)
        slot = jnp.where(can, n_regs, reg_cap)
        rb2 = rb.at[rows1, slot].set(n_rb, mode="drop")
        re2 = re.at[rows1, slot].set(n_re, mode="drop")
        qb2 = qb.at[rows1, slot].set(n_qb, mode="drop")
        qe2 = qe.at[rows1, slot].set(n_qe, mode="drop")
        sc2 = r_score.at[rows1, slot].set(score_f, mode="drop")
        ts2 = r_truesc.at[rows1, slot].set(truesc_f, mode="drop")
        w2 = r_w.at[rows1, slot].set(n_w, mode="drop")
        cv2 = r_cov.at[rows1, slot].set(cov, mode="drop")
        sl2 = r_sl0.at[rows1, slot].set(s_len, mode="drop")
        rid2 = r_rid.at[rows1, slot].set(c_rid, mode="drop")
        overflow2 = overflow | (act & (n_regs >= reg_cap))
        n2 = n_regs + can.astype(jnp.int32)
        ptr2 = jnp.where(act, ptr + 1, ptr)
        return (ptr2, marks, rb2, re2, qb2, qe2, sc2, ts2, w2, cv2, sl2,
                rid2, n2, overflow2, act.any())

    z32 = jnp.zeros((N, reg_cap), jnp.int32)
    zit = jnp.zeros((N, reg_cap), it)
    init = (jnp.zeros((N,), jnp.int32), jnp.ones((N, S), jnp.int32),
            zit, zit, z32, z32, z32, z32, z32, z32, z32,
            jnp.full((N, reg_cap), -1, jnp.int32), jnp.zeros((N,), jnp.int32),
            jnp.zeros((N,), bool), jnp.asarray(True))

    def cond(st):
        ptr = st[0]
        return jnp.any(ptr < wl.n)

    st = jax.lax.while_loop(cond, round_body, init)
    (ptr, marks, rb, re, qb, qe, r_score, r_truesc, r_w, r_cov, r_sl0,
     r_rid, n_regs, overflow, _) = st
    return Regs(rb=rb, re=re, qb=qb, qe=qe, score=r_score, truesc=r_truesc,
                w=r_w, seedcov=r_cov, seedlen0=r_sl0, rid=r_rid,
                frac_rep=seeds.frac_rep / jnp.maximum(l_seq, 1).astype(jnp.float32),
                n=n_regs, overflow=overflow)
