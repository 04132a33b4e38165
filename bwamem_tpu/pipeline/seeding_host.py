"""Host-compacted front half: seeding → compact SA lookups → grouped
chaining/worklists.

Why this exists: the in-jit front half runs every stage at the fixed cap
shape [N, S=256] even though a typical read has ~2-20 seeds, so >90% of the
SA-lookup and chaining lanes are dead, and on the current TPU runtime every
gather op carries a large fixed cost.  This driver

  1. runs the (exact 3-pass) SMEM seeding on device,
  2. expands interval occurrences to seeds ON HOST (the occurrence-sampling
     arithmetic of mem_chain, bwamem.c:280-307 — pure indexing, no device
     work) into a COMPACT flat rank array,
  3. batch-translates only the real ranks through the device SA-walk,
  4. groups reads by seed count and runs chaining/filter/worklist at each
     group's snug shape class,

cutting device lanes to the work that exists.  Semantics are identical to
pipeline.seedchain.seed_chain_worklist (the all-device variant kept for the
single-program compile check).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from bwamem_tpu.config import MemOptions
from bwamem_tpu.ops import fm as fmops
from bwamem_tpu.ops import smem as smemops
from bwamem_tpu.ops import chain as chainops
from bwamem_tpu.pipeline import _shapes
from bwamem_tpu.pipeline import chainflt_host
from bwamem_tpu.ops import align_ext


def _bucket(x: int, lo: int = 8) -> int:
    n = lo
    while n < x:
        n <<= 1
    return n


@functools.partial(jax.jit, static_argnames=(
    "min_seed_len", "split_len", "split_width", "max_mem_intv", "caps"))
def _intervals_jit(fm, seq, l_seq, *, min_seed_len, split_len, split_width,
                   max_mem_intv, caps):
    return smemops.collect_intervals(
        fm, seq, l_seq, min_seed_len=min_seed_len, split_len=split_len,
        split_width=split_width, max_mem_intv=max_mem_intv, caps=caps)


@jax.jit
def _sa_lookup_jit(fm, ranks):
    return fmops.sa_lookup(fm, ranks)


@functools.partial(jax.jit, static_argnames=(
    "w", "max_chain_gap", "mask_level", "drop_ratio", "min_chain_weight",
    "max_chain_extend", "min_seed_len", "a", "o_del", "e_del", "o_ins",
    "e_ins"))
def _chain_worklist_jit(fm, ctg_offsets, ctg_is_alt, seeds, l_seq, *,
                        w, max_chain_gap, mask_level, drop_ratio,
                        min_chain_weight, max_chain_extend, min_seed_len,
                        a, o_del, e_del, o_ins, e_ins):
    ch = chainops.chain_seeds(seeds, ctg_is_alt, fm.l_pac, w=w,
                              max_chain_gap=max_chain_gap,
                              chain_cap=seeds.rbeg.shape[1])
    wt = chainops.chain_weights(seeds, ch)
    fl = chainops.filter_chains(
        ch, wt, seeds, mask_level=mask_level, drop_ratio=drop_ratio,
        min_seed_len=min_seed_len, max_chain_gap=max_chain_gap,
        min_chain_weight=min_chain_weight,
        max_chain_extend=max_chain_extend)
    wl = align_ext.build_worklist(seeds, ch, fl)
    rmax0, rmax1 = align_ext.chain_rmax(
        seeds, ch, l_seq, fm, ctg_offsets,
        a=a, o_del=o_del, e_del=e_del, o_ins=o_ins, e_ins=e_ins, w=w)
    return (ch.seed_chain, wl.seed_slot, wl.chain, wl.n, rmax0, rmax1,
            ch.rid, ch.overflow, wt, ch.pos, ch.first_qbeg, ch.last_qbeg,
            ch.last_len, ch.is_alt, ch.n)


class SeedsNp(NamedTuple):
    """Numpy view compatible with what extend_host consumes."""
    qbeg: np.ndarray
    rbeg: np.ndarray
    len: np.ndarray
    valid: np.ndarray
    frac_rep: np.ndarray


class WorklistNp(NamedTuple):
    seeds: SeedsNp
    seed_chain: np.ndarray
    wl_slot: np.ndarray
    wl_chain: np.ndarray
    wl_n: np.ndarray
    rmax0: np.ndarray
    rmax1: np.ndarray
    chain_rid: np.ndarray
    overflow: np.ndarray
    # per-chain summaries for the host tie-order fixup (chainflt_host)
    chain_w: np.ndarray     # [G, C] mem_chain_weight
    chain_pos: np.ndarray   # [G, C] B-tree key (creation rbeg)
    chain_fq: np.ndarray    # [G, C] chn_beg (first seed qbeg)
    chain_lq: np.ndarray    # [G, C] last seed qbeg
    chain_ll: np.ndarray    # [G, C] last seed len
    chain_alt: np.ndarray   # [G, C] bool
    chain_n: np.ndarray     # [G]


def _intv2rid_np(ctg_offsets, l_pac, rb, slen):
    """bns_intv2rid (bntseq.c:370-378), vectorized on host."""
    re = rb + slen
    pb = np.where(rb >= l_pac, 2 * l_pac - 1 - rb, rb)
    pe_in = re - 1
    pe = np.where(pe_in >= l_pac, 2 * l_pac - 1 - pe_in, pe_in)
    rid_b = np.searchsorted(ctg_offsets, pb, side="right") - 1
    rid_e = np.searchsorted(ctg_offsets, pe, side="right") - 1
    rid = np.where(rid_b == rid_e, rid_b, -1)
    return np.where((rb < l_pac) & (re > l_pac), -2, rid).astype(np.int32)


def front_half(al, reads, seq: np.ndarray, l_seq: np.ndarray,
               group_caps=(16, 64, 256, 1024)):
    """al: Aligner; returns {read_index: (group WorklistNp, row)} packaged
    as a list of (read_indices, WorklistNp) groups."""
    opt: MemOptions = al.opt
    n = len(reads)
    read_iv, iv_s, iv_e, iv_x0, iv_x2, _overflow = \
        collect_intervals_host(al, seq, l_seq, n)

    # ---- occurrence sampling (mem_chain loop, bwamem.c:280-307) ----
    counts = np.minimum(iv_x2, opt.max_occ).astype(np.int64)
    step = np.where(iv_x2 > opt.max_occ, iv_x2 // opt.max_occ, 1)
    M = int(counts.sum())
    owner = np.repeat(np.arange(counts.size, dtype=np.int64), counts)
    cum = np.concatenate([[0], np.cumsum(counts)])
    k_within = np.arange(M, dtype=np.int64) - cum[owner]
    ranks = iv_x0[owner] + k_within * step[owner]
    read_of = read_iv[owner].astype(np.int32)
    qbeg = iv_s[owner].astype(np.int32)
    slen = (iv_e - iv_s)[owner].astype(np.int32)

    # ---- compact device SA walk ----
    if M:
        Mp = _shapes.lanes(M, fine_lo=256, coarse_lo=1024)
        rk = np.zeros(Mp, dtype=np.asarray(al.fm.sa).dtype)
        rk[:M] = ranks
        rbeg = np.asarray(_sa_lookup_jit(al.fm, jnp.asarray(rk)))[:M]
        rbeg = rbeg.astype(np.int64)
    else:
        rbeg = np.zeros(0, np.int64)
    rid = _intv2rid_np(al.ctg_offsets_np, al.l_pac, rbeg, slen)
    keep = rid >= 0
    # per-read seed counts after rid filter?  The reference keeps invalid-rid
    # seeds OUT of chaining but they also never enter (mem_chain checks
    # bns_intv2rid < 0 → skip seed).  Drop them here; slot order preserved.
    read_of, qbeg, slen, rbeg, rid = (a[keep] for a in
                                      (read_of, qbeg, slen, rbeg, rid))
    seed_cnt = np.bincount(read_of, minlength=n)

    # ---- frac_rep (l_rep union, bwamem.c:272-279) ----
    l_rep = np.zeros(n, np.float32)
    rep = iv_x2 > opt.max_occ
    for i in np.unique(read_iv[rep]):
        b = e = lr = 0
        sel = rep & (read_iv == i)      # flat order is (start, end) asc
        for sb, se in zip(iv_s[sel], iv_e[sel]):
            if sb > e:
                lr += e - b
                b, e = int(sb), int(se)
            else:
                e = max(e, int(se))
        l_rep[i] = lr + (e - b)

    # ---- group reads by seed count; chain at snug shapes ----
    it = np.asarray(al.fm.L2).dtype
    order = np.argsort(read_of, kind="stable")
    starts = np.concatenate([[0], np.cumsum(seed_cnt)])

    def run_group(ridx, cap):
        G = ridx.size
        Gp = _shapes.lanes(G, fine_lo=8, coarse_lo=64)
        g_qbeg = np.zeros((Gp, cap), np.int32)
        g_rbeg = np.zeros((Gp, cap), it)
        g_len = np.zeros((Gp, cap), np.int32)
        g_rid = np.full((Gp, cap), -1, np.int32)
        g_valid = np.zeros((Gp, cap), bool)
        for gi, i in enumerate(ridx):
            sl = order[starts[i]:starts[i + 1]][:cap]
            c = sl.size
            g_qbeg[gi, :c] = qbeg[sl]
            g_rbeg[gi, :c] = rbeg[sl]
            g_len[gi, :c] = slen[sl]
            g_rid[gi, :c] = rid[sl]
            g_valid[gi, :c] = True
        g_l = np.ones(Gp, np.int32)
        g_l[:G] = l_seq[ridx]
        g_frac = np.pad(l_rep[ridx], (0, Gp - G))
        seeds = chainops.Seeds(
            rbeg=jnp.asarray(g_rbeg), qbeg=jnp.asarray(g_qbeg),
            len=jnp.asarray(g_len), rid=jnp.asarray(g_rid),
            valid=jnp.asarray(g_valid), frac_rep=jnp.asarray(g_frac),
            overflow=jnp.zeros(Gp, bool))
        out = _chain_worklist_jit(
            al.fm, al.ctg_offsets, al.ctg_is_alt, seeds, jnp.asarray(g_l),
            w=opt.w, max_chain_gap=opt.max_chain_gap,
            mask_level=opt.mask_level, drop_ratio=opt.drop_ratio,
            min_chain_weight=opt.min_chain_weight,
            max_chain_extend=opt.max_chain_extend,
            min_seed_len=opt.min_seed_len, a=opt.a, o_del=opt.o_del,
            e_del=opt.e_del, o_ins=opt.o_ins, e_ins=opt.e_ins)
        (seed_chain, wl_slot, wl_chain, wl_n, rmax0, rmax1, chain_rid,
         overflow, c_w, c_pos, c_fq, c_lq, c_ll, c_alt, c_n) = \
            (np.asarray(x) for x in out)
        wr = WorklistNp(
            seeds=SeedsNp(qbeg=g_qbeg, rbeg=g_rbeg, len=g_len,
                          valid=g_valid, frac_rep=g_frac),
            seed_chain=seed_chain.copy(), wl_slot=wl_slot.copy(),
            wl_chain=wl_chain.copy(), wl_n=wl_n.copy(), rmax0=rmax0,
            rmax1=rmax1, chain_rid=chain_rid, overflow=overflow,
            chain_w=c_w, chain_pos=c_pos, chain_fq=c_fq, chain_lq=c_lq,
            chain_ll=c_ll, chain_alt=c_alt, chain_n=c_n)
        chainflt_host.fix_tied_rows(wr, opt)
        return wr

    def g_tile(cap):
        # bound compile cost: loop-state size ~ G×cap (see _shapes.LANE_TILE)
        return max(128, 131072 // cap)

    groups = []
    assigned = np.zeros(n, bool)
    for cap in group_caps:
        sel = (~assigned) & (seed_cnt <= cap) & (seed_cnt > 0)
        assigned |= sel
        ridx = np.nonzero(sel)[0]
        for s0, c in _shapes.chunks(ridx.size, tile=g_tile(cap)):
            sub = ridx[s0:s0 + c]
            groups.append((sub, run_group(sub, cap)))
    # reads beyond the largest cap: truncated to the first `cap` seeds
    # (slot order == insertion order); flagged for the host fallback
    rest = np.nonzero((~assigned) & (seed_cnt > 0))[0]
    for s0, c in _shapes.chunks(rest.size, tile=g_tile(group_caps[-1])):
        sub = rest[s0:s0 + c]
        groups.append((sub, run_group(sub, group_caps[-1])))
    return groups


# --------------------------------------------------------------------------
# Host-compacted 3-pass interval collection: only live lanes hit the device.
# Semantics identical to ops.smem.collect_intervals (the all-device variant
# kept for the single-program path); validated by the same oracle tests.
# --------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("cap", "multi_pivot"))
def _fwd_scan_jit(fm, seq, l_seq, start, min_intv, *, cap, multi_pivot):
    return smemops.forward_scan(fm, seq, l_seq, start, min_intv, cap,
                                multi_pivot=multi_pivot)


@jax.jit
def _back_flat_jit(fm, seq, lane_read, pivot, x0, x1, x2, min_intv, valid):
    return smemops.back_extend_flat(fm, seq, lane_read, pivot, x0, x1, x2,
                                    min_intv, valid)


@functools.partial(jax.jit, static_argnames=("min_len", "max_intv", "cap"))
def _pass3_jit(fm, seq, l_seq, *, min_len, max_intv, cap):
    return smemops.pass3_scan(fm, seq, l_seq, min_len, max_intv, cap)


def _emit_np(pivot, s, end, n, cap):
    """bwt_smem1a emission rule on host (see smem.emit_mask)."""
    C = cap
    slots = np.arange(C)[None, :]
    valid = slots < n[:, None]
    nxt_same = np.concatenate([pivot[:, 1:] == pivot[:, :-1],
                               np.zeros((pivot.shape[0], 1), bool)], axis=1)
    nxt_valid = np.concatenate([slots[:, 1:] < n[:, None],
                                np.zeros((pivot.shape[0], 1), bool)], axis=1)
    s_next = np.concatenate([s[:, 1:], s[:, :1]], axis=1)
    last = ~(nxt_same & nxt_valid)
    return valid & (last | (s < s_next))


def collect_intervals_host(al, seq_np: np.ndarray, l_seq: np.ndarray,
                           n: int, caps=None, kmax0: int = 0,
                           emax0: int = 0):
    """Returns flat per-interval arrays (read, start, end, x0, x2) sorted by
    (read, start, end) — mem_collect_intv output (bwamem.c:137-185) plus an
    overflow flag per read.

    Pass 1 + pass 3 run as ONE fused device program that compacts its own
    lanes and returns flat SMEM arrays (a few MB) instead of [N, cap]
    candidate grids (tens of MB through the transport).  Pass 2 reseeds the
    (rare) long low-occ SMEMs through host-compacted lanes."""
    opt: MemOptions = al.opt
    it = np.asarray(al.fm.L2).dtype
    seq_j = jnp.asarray(seq_np)
    l_j = jnp.asarray(l_seq)
    N, Lr = seq_np.shape
    cap = 2 * Lr
    # every in-program gather pays ~ns per ARENA row (padding included), so
    # the arenas start at the size this Aligner last needed (typical reads
    # need ~10-30 candidates each) and grow via the retry loop below
    hist = getattr(al, "_seed_arena_hist", None)
    if hist is None:
        hist = al._seed_arena_hist = {}
    kmax = kmax0 or hist.get(("k", N)) or _bucket(N * 16, lo=1024)
    emax = emax0 or hist.get(("e", N)) or _bucket(N * 8, lo=1024)
    p3cap = 32
    while True:
        out = _pass1_fused_jit(
            al.fm, seq_j, l_j, cap=cap, kmax=kmax, emax=emax,
            min_seed_len=opt.min_seed_len,
            max_mem_intv=opt.max_mem_intv, p3cap=p3cap)
        (o_read, o_s, o_e, o_x0, o_x2, n_emit, p3x0, p3x2, p3s, p3e, p3n,
         c1over, p3over, cap_over) = (np.asarray(x) for x in out)
        # grow whichever arena overflowed and rerun: clamped-compaction
        # output is corrupt, silently truncating seeds is not an option
        retry = False
        if bool(cap_over):
            kmax, emax, retry = kmax * 2, emax * 2, True
        if c1over.any():
            cap, retry = cap * 2, True
        if p3over.any():
            p3cap, retry = p3cap * 2, True
        if not retry:
            break
    if kmax0 == 0:
        hist[("k", N)] = kmax
        hist[("e", N)] = emax
    K = int(n_emit)
    o_read, o_s, o_e = o_read[:K], o_s[:K], o_e[:K]
    o_x0, o_x2 = o_x0[:K], o_x2[:K]

    out_read = [o_read]
    out_s = [o_s]
    out_e = [o_e]
    out_x0 = [o_x0]
    out_x2 = [o_x2]

    # ---- pass 2 on compacted parent lanes (bwamem.c:155-165) ----
    qual = ((o_e - o_s) >= opt.split_len) & (o_x2 <= opt.split_width)
    pidx = np.nonzero(qual)[0]
    prow = o_read[pidx]
    c2over = np.zeros(n, bool)
    if pidx.size:
        M2 = pidx.size
        Mp = _shapes.lanes(M2, fine_lo=64, coarse_lo=64)
        pseq = np.full((Mp, Lr), 4, np.uint8)
        pseq[:M2] = seq_np[prow]
        pl = np.zeros(Mp, np.int32)
        pl[:M2] = l_seq[prow]
        pstart = np.zeros(Mp, np.int32)
        pstart[:M2] = (o_s[pidx] + o_e[pidx]) >> 1
        pmin = np.ones(Mp, it)
        pmin[:M2] = o_x2[pidx] + 1
        cand2 = 48
        while True:
            c2 = _fwd_scan_jit(al.fm, jnp.asarray(pseq), jnp.asarray(pl),
                               jnp.asarray(pstart), jnp.asarray(pmin),
                               cap=cand2, multi_pivot=False)
            c2 = jax.tree.map(np.asarray, c2)
            if not c2.overflow[:M2].any():
                break
            cand2 *= 2
        cnt2 = c2.n[:M2]
        rows2, slots2 = np.nonzero(
            np.arange(cand2)[None, :] < cnt2[:, None])
        if rows2.size:
            M = rows2.size
            Mp2 = _shapes.lanes(M, fine_lo=256, coarse_lo=256)
            lr = np.zeros(Mp2, np.int32)
            pv = np.zeros(Mp2, np.int32)
            bx0 = np.zeros(Mp2, it)
            bx1 = np.zeros(Mp2, it)
            bx2 = np.zeros(Mp2, it)
            mi = np.ones(Mp2, it)
            va = np.zeros(Mp2, bool)
            lr[:M] = prow[rows2]
            pv[:M] = c2.pivot[rows2, slots2]
            bx0[:M] = c2.x0[rows2, slots2]
            bx1[:M] = c2.x1[rows2, slots2]
            bx2[:M] = c2.x2[rows2, slots2]
            mi[:M] = pmin[rows2]
            va[:M] = True
            s2f, x0f2, x2f2 = (np.asarray(x)[:M] for x in _back_flat_jit(
                al.fm, seq_j, jnp.asarray(lr), jnp.asarray(pv),
                jnp.asarray(bx0), jnp.asarray(bx1), jnp.asarray(bx2),
                jnp.asarray(mi), jnp.asarray(va)))
            s2 = np.zeros((M2, cand2), np.int32)
            sx0_2 = np.zeros((M2, cand2), it)
            sx2_2 = np.zeros((M2, cand2), it)
            s2[rows2, slots2] = s2f
            sx0_2[rows2, slots2] = x0f2
            sx2_2[rows2, slots2] = x2f2
            e2 = c2.end[:M2]
            emit2 = _emit_np(c2.pivot[:M2], s2, e2, cnt2, cand2)
            smem2 = emit2 & ((e2 - s2) >= opt.min_seed_len)
            jr, jc = np.nonzero(smem2)
            out_read.append(prow[jr].astype(np.int32))
            out_s.append(s2[jr, jc])
            out_e.append(e2[jr, jc].astype(np.int32))
            out_x0.append(sx0_2[jr, jc])
            out_x2.append(sx2_2[jr, jc])
        np.logical_or.at(c2over, prow, c2.overflow[:M2])

    # ---- pass 3 (from the fused program) ----
    if opt.max_mem_intv > 0:
        kr, kc = np.nonzero(
            np.arange(p3s.shape[1])[None, :] < p3n[:n, None])
        out_read.append(kr.astype(np.int32))
        out_s.append(p3s[kr, kc])
        out_e.append(p3e[kr, kc])
        out_x0.append(p3x0[kr, kc])
        out_x2.append(p3x2[kr, kc])

    read_iv = np.concatenate(out_read)
    start = np.concatenate(out_s).astype(np.int64)
    end = np.concatenate(out_e).astype(np.int64)
    x0 = np.concatenate(out_x0).astype(np.int64)
    x2 = np.concatenate(out_x2).astype(np.int64)
    # sort by (read, start, end) — ks_introsort(mem_intv) on info
    order = np.lexsort((end, start, read_iv))
    overflow = c2over  # all caps retried to fit; kept for interface parity
    return (read_iv[order], start[order], end[order], x0[order], x2[order],
            overflow)


# --------------------------------------------------------------------------
# Fully fused pass-1 (+pass-3) program: forward scan → device-side lane
# compaction → backward extension → emission → compact SMEM output.  One
# dispatch, a few MB out, no [N, cap] candidate download (which was
# transport-bound on the tunneled chip).
# --------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=(
    "cap", "kmax", "emax", "min_seed_len", "max_mem_intv", "p3cap"))
def _pass1_fused_jit(fm, seq, l_seq, *, cap, kmax, emax, min_seed_len,
                     max_mem_intv, p3cap):
    N, L = seq.shape
    it = fm.L2.dtype
    i32 = jnp.int32
    c1 = smemops.forward_scan(fm, seq, l_seq, jnp.zeros((N,), i32),
                              jnp.ones((N,), it), cap, multi_pivot=True)
    rows = jnp.broadcast_to(jnp.arange(N, dtype=i32)[:, None], (N, cap))
    slots = jnp.broadcast_to(jnp.arange(cap, dtype=i32)[None, :], (N, cap))
    mask = slots < c1.n[:, None]
    fmask = mask.reshape(-1)
    pos = jnp.cumsum(fmask.astype(i32)) - 1
    k_over = pos[-1] + 1 > kmax
    tgt = jnp.where(fmask, jnp.minimum(pos, kmax - 1), kmax)

    def compact(a, dt):
        return jnp.zeros((kmax,), dt).at[tgt].set(
            a.reshape(-1).astype(dt), mode="drop")

    lane_read = compact(rows, i32)
    pivot = compact(c1.pivot, i32)
    fx0 = compact(c1.x0, it)
    fx1 = compact(c1.x1, it)
    fx2 = compact(c1.x2, it)
    nflat = jnp.minimum(pos[-1] + 1, kmax)
    fvalid = jnp.arange(kmax, dtype=i32) < nflat
    s_f, x0_f, x2_f = smemops.back_extend_flat(
        fm, seq, lane_read, pivot, fx0, fx1, fx2,
        jnp.ones((kmax,), it), fvalid)
    # scatter s back to the [N, cap] grid for the emission rule
    back = jnp.where(mask, jnp.clip(pos.reshape(N, cap), 0, kmax - 1), 0)
    s_grid = jnp.where(mask, s_f[back], 0)
    x0_grid = jnp.where(mask, x0_f[back], 0)
    x2_grid = jnp.where(mask, x2_f[back], 0)
    emit = smemops.emit_mask(c1, s_grid.reshape(-1))
    emit = emit & ((c1.end - s_grid) >= min_seed_len)
    # compact emitted SMEMs
    efl = emit.reshape(-1)
    epos = jnp.cumsum(efl.astype(i32)) - 1
    e_over = epos[-1] + 1 > emax
    etgt = jnp.where(efl, jnp.minimum(epos, emax - 1), emax)

    def ecompact(a, dt):
        return jnp.zeros((emax,), dt).at[etgt].set(
            a.reshape(-1).astype(dt), mode="drop")

    out_read = ecompact(rows, i32)
    out_s = ecompact(s_grid, i32)
    out_e = ecompact(c1.end, i32)
    out_x0 = ecompact(x0_grid, it)
    out_x2 = ecompact(x2_grid, it)
    n_emit = jnp.minimum(epos[-1] + 1, emax)

    if max_mem_intv > 0:
        p3 = smemops.pass3_scan(fm, seq, l_seq, min_seed_len, max_mem_intv,
                                p3cap)
        p3x0, p3x2, p3s, p3e, p3n, p3over = p3
    else:
        z = jnp.zeros((N, p3cap), it)
        zi = jnp.zeros((N, p3cap), i32)
        p3x0, p3x2, p3s, p3e = z, z, zi, zi
        p3n = jnp.zeros((N,), i32)
        p3over = jnp.zeros((N,), bool)
    # overflow taxonomy, so the host can retry with the right cap doubled:
    #   c1.overflow — per-read forward-scan candidate cap (`cap`)
    #   p3over      — per-read pass-3 emission cap (`p3cap`)
    #   k/e_over    — global compaction arenas (`kmax`/`emax`); past-cap
    #                 lanes are clamped into the last slot, so the output
    #                 is CORRUPT whenever these fire and must be retried
    return (out_read, out_s, out_e, out_x0, out_x2, n_emit,
            p3x0, p3x2, p3s, p3e, p3n, c1.overflow, p3over,
            k_over | e_over)
