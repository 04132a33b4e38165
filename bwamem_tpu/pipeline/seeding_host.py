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
from bwamem_tpu.parallel import mesh as pmesh
from bwamem_tpu.pipeline import _shapes
from bwamem_tpu.pipeline import chainflt_host
from bwamem_tpu.ops import align_ext
from bwamem_tpu.utils import fetchguard, timers


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


# Standalone single-pass scan wrappers.  The production mem pipeline uses
# the fused _collect_all_jit below; these remain the building blocks for
# the SMEM-enumeration CLI tools (fastmap, maxk — fastmap.c:324, maxk.c:12),
# which need raw per-pivot SMEMs rather than the 3-pass seeding output.

@functools.partial(jax.jit, static_argnames=("cap", "multi_pivot"))
def _fwd_scan_jit(fm, seq, l_seq, start, min_intv, *, cap, multi_pivot):
    return smemops.forward_scan(fm, seq, l_seq, start, min_intv, cap,
                                multi_pivot=multi_pivot)


@jax.jit
def _back_flat_jit(fm, seq, lane_read, pivot, x0, x1, x2, min_intv, valid):
    return smemops.back_extend_flat(fm, seq, lane_read, pivot, x0, x1, x2,
                                    min_intv, valid)


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


@functools.partial(jax.jit, static_argnames=(
    "arena", "w", "max_chain_gap", "mask_level", "drop_ratio",
    "min_chain_weight", "max_chain_extend", "min_seed_len", "a", "o_del",
    "e_del", "o_ins", "e_ins"))
def _chain_worklist_jit(fm, ctg_offsets, ctg_is_alt, seeds, l_seq, *,
                        arena, w, max_chain_gap, mask_level, drop_ratio,
                        min_chain_weight, max_chain_extend, min_seed_len,
                        a, o_del, e_del, o_ins, e_ins):
    """Chain + filter + worklist for one read group; outputs are COMPACTED
    to the work that exists and bit-packed (the padded [G, C] grids this
    used to ship cost ~14 MB D2H per batch on a ~40 MB/s transport):

      flat  [7, arena] i32 (or [4,.] i32 + [3,.] it when the index is
            int64): per-WORK-ITEM (slot<<16|chain) in read-major work
            order, then per-CHAIN (w<<16|fq), (lq<<16|ll), (rid<<1|alt),
            rmax0, rmax1, pos in read-major storage order
      sc16  [G, C] int16: seed → chain assignment (replay needs all seeds)
      cnts  [G] i32: wl_n<<16 | chain_n<<1 | overflow

    `arena` ≥ the group's true seed count guarantees no compaction
    overflow (work items and chains are each ≤ seeds)."""
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
    i32 = jnp.int32
    it = ch.pos.dtype
    G, C = ch.pos.shape
    slots = jnp.broadcast_to(jnp.arange(C, dtype=i32)[None, :], (G, C))
    wmask = (slots < wl.n[:, None]).reshape(-1)
    pkw = (wl.seed_slot.astype(i32) << 16) | (wl.chain.astype(i32) & 0xFFFF)
    (fw,), _, w_over, _ = _compact_flat(wmask, [(pkw, i32)], arena)
    cmask = (slots < ch.n[:, None]).reshape(-1)
    pk1 = (wt.astype(i32) << 16) | (ch.first_qbeg.astype(i32) & 0xFFFF)
    pk2 = (ch.last_qbeg.astype(i32) << 16) | (ch.last_len.astype(i32)
                                              & 0xFFFF)
    pk3 = (ch.rid.astype(i32) << 1) | ch.is_alt.astype(i32)
    (f1, f2, f3), _, c_over, _ = _compact_flat(
        cmask, [(pk1, i32), (pk2, i32), (pk3, i32)], arena)
    (fr0, fr1, fps), _, _, _ = _compact_flat(
        cmask, [(rmax0, it), (rmax1, it), (ch.pos, it)], arena)
    over = ch.overflow | w_over | c_over
    cnts = ((wl.n.astype(i32) << 16) | (ch.n.astype(i32) << 1)
            | over.astype(i32))
    sc16 = ch.seed_chain.astype(jnp.int16)
    if it == i32:
        flat = jnp.stack([fw, f1, f2, f3, fr0.astype(i32),
                          fr1.astype(i32), fps.astype(i32)])
        return flat, sc16, cnts
    return (jnp.stack([fw, f1, f2, f3]), jnp.stack([fr0, fr1, fps]),
            sc16, cnts)


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
    with timers.section("seed.collect"):
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
    mesh = getattr(al, "mesh", None)
    if M:
        with timers.section("seed.sa_walk"):
            Mp = _shapes.lanes(M, fine_lo=256, coarse_lo=1024)
            rk = np.zeros(Mp, dtype=np.dtype(al.fm.sa.dtype))
            rk[:M] = ranks
            sa_fn = (_sa_lookup_jit if mesh is None else
                     pmesh.rowmap(mesh, _sa_lookup_jit, (), (True, False)))
            rbeg = fetchguard.fetch([sa_fn(al.fm, jnp.asarray(rk))],
                                    what="sa_walk")[0][:M]
            timers.add_bytes("d2h.sa_walk", rbeg.nbytes)
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
    with timers.section("seed.l_rep"):
        l_rep = np.zeros(n, np.float32)
        rep = iv_x2 > opt.max_occ
        for i in np.unique(read_iv[rep]):
            b = e = lr = 0
            sel = rep & (read_iv == i)  # flat order is (start, end) asc
            for sb, se in zip(iv_s[sel], iv_e[sel]):
                if sb > e:
                    lr += e - b
                    b, e = int(sb), int(se)
                else:
                    e = max(e, int(se))
            l_rep[i] = lr + (e - b)

    # ---- group reads by seed count; chain at snug shapes ----
    it = np.dtype(al.fm.L2.dtype)
    order = np.argsort(read_of, kind="stable")
    starts = np.concatenate([[0], np.cumsum(seed_cnt)])

    def submit_group(ridx, cap):
        """Build the group's packed seed arrays and ENQUEUE the chaining
        dispatch; the fetch is deferred to drain_group so the D2H round
        trips of all group tiles overlap."""
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
        # arena ≥ true seed count ⇒ the device compactions cannot overflow
        # (work items and chains are each at most one per seed)
        arena = _bucket(max(int(g_valid.sum()), 1), lo=256)
        seeds = chainops.Seeds(
            rbeg=jnp.asarray(g_rbeg), qbeg=jnp.asarray(g_qbeg),
            len=jnp.asarray(g_len), rid=jnp.asarray(g_rid),
            valid=jnp.asarray(g_valid), frac_rep=jnp.asarray(g_frac),
            overflow=jnp.zeros(Gp, bool))
        statics = dict(
            arena=arena,
            w=opt.w, max_chain_gap=opt.max_chain_gap,
            mask_level=opt.mask_level, drop_ratio=opt.drop_ratio,
            min_chain_weight=opt.min_chain_weight,
            max_chain_extend=opt.max_chain_extend,
            min_seed_len=opt.min_seed_len, a=opt.a, o_del=opt.o_del,
            e_del=opt.e_del, o_ins=opt.o_ins, e_ins=opt.e_ins)
        i64_idx = it == np.int64
        if mesh is None:
            res = _chain_worklist_jit(al.fm, al.ctg_offsets, al.ctg_is_alt,
                                      seeds, jnp.asarray(g_l), **statics)
        else:
            out_mask = (("ax1", "ax1", False, False) if i64_idx
                        else ("ax1", False, False))
            fn = pmesh.rowmap(mesh, _chain_worklist_jit,
                              tuple(sorted(statics.items())),
                              (True, True, True, False, False),
                              out_mask=out_mask)
            res = fn(al.fm, al.ctg_offsets, al.ctg_is_alt, seeds,
                     jnp.asarray(g_l))
        for r in res:
            if r is not None:
                try:
                    r.copy_to_host_async()
                except Exception:
                    pass
        return ridx, (g_qbeg, g_rbeg, g_len, g_valid, g_frac), res, arena

    def drain_group(plan):
        ridx, (g_qbeg, g_rbeg, g_len, g_valid, g_frac), res, arena = plan
        if len(res) == 3:
            flat, sc16, cnts = fetchguard.fetch(res, what="chain_grid")
            fitp = flat[4:7].astype(it)
        else:
            flat, fitp, sc16, cnts = fetchguard.fetch(res,
                                                      what="chain_grid")
        timers.add_bytes("d2h.chain_grid",
                         flat.nbytes + fitp.nbytes + sc16.nbytes
                         + cnts.nbytes)
        Gp, C = sc16.shape
        nsh = flat.shape[1] // arena           # mesh shards stack arenas
        Gs = Gp // nsh
        wl_n = (cnts >> 16).astype(np.int32)
        chain_n = ((cnts >> 1) & 0x7FFF).astype(np.int32)
        if (cnts[:ridx.size] & 1).any():
            # cannot happen: arena >= group seed count bounds both
            # compactions and chain_cap == seed cap bounds the B-tree
            raise RuntimeError("chain worklist compaction overflow")
        wl_slot = np.zeros((Gp, C), np.int16)
        wl_chain = np.full((Gp, C), -1, np.int16)
        rmax0 = np.zeros((Gp, C), it)
        rmax1 = np.zeros((Gp, C), it)
        c_pos = np.zeros((Gp, C), it)
        c_w = np.zeros((Gp, C), np.int32)
        c_fq = np.zeros((Gp, C), np.int32)
        c_lq = np.zeros((Gp, C), np.int32)
        c_ll = np.zeros((Gp, C), np.int32)
        c_rid = np.full((Gp, C), -1, np.int32)
        c_alt = np.zeros((Gp, C), bool)

        def scatter(dst_list, src_list, counts_row, base, r0):
            """Unpack shard-local flat arrays into [rows, C] grids."""
            k = counts_row.sum()
            if not k:
                return
            rows_r = np.repeat(np.arange(counts_row.size), counts_row) + r0
            cum = np.concatenate([[0], np.cumsum(counts_row)])
            cols = np.arange(k) - cum[rows_r - r0]
            src_i = base + np.arange(k)
            for dst, src in zip(dst_list, src_list):
                dst[rows_r, cols] = src[src_i]

        for sh in range(nsh):
            r0 = sh * Gs
            base = sh * arena
            wv = flat[0]
            scatter([wl_slot, wl_chain],
                    [(wv >> 16).astype(np.int16),
                     (wv & 0xFFFF).astype(np.int16)],
                    wl_n[r0:r0 + Gs], base, r0)
            scatter([c_w, c_fq, c_lq, c_ll, c_rid, c_alt,
                     rmax0, rmax1, c_pos],
                    [flat[1] >> 16, flat[1] & 0xFFFF, flat[2] >> 16,
                     flat[2] & 0xFFFF, flat[3] >> 1,
                     (flat[3] & 1).astype(bool), fitp[0], fitp[1],
                     fitp[2]],
                    chain_n[r0:r0 + Gs], base, r0)
        wr = WorklistNp(
            seeds=SeedsNp(qbeg=g_qbeg, rbeg=g_rbeg, len=g_len,
                          valid=g_valid, frac_rep=g_frac),
            seed_chain=sc16.astype(np.int32), wl_slot=wl_slot,
            wl_chain=wl_chain, wl_n=wl_n, rmax0=rmax0,
            rmax1=rmax1, chain_rid=c_rid,
            overflow=(cnts & 1).astype(bool),
            chain_w=c_w, chain_pos=c_pos, chain_fq=c_fq, chain_lq=c_lq,
            chain_ll=c_ll, chain_alt=c_alt,
            chain_n=chain_n)
        chainflt_host.fix_tied_rows(wr, opt)
        return wr

    def g_tile(cap):
        # bound compile cost: loop-state size ~ G×cap (see _shapes.LANE_TILE)
        return max(128, 131072 // cap)

    plans = []
    with timers.section("seed.group_submit"):
        assigned = np.zeros(n, bool)
        for cap in group_caps:
            sel = (~assigned) & (seed_cnt <= cap) & (seed_cnt > 0)
            assigned |= sel
            ridx = np.nonzero(sel)[0]
            for s0, c in _shapes.chunks(ridx.size, tile=g_tile(cap)):
                plans.append(submit_group(ridx[s0:s0 + c], cap))
        # reads beyond the largest cap: truncated to the first `cap` seeds
        # (slot order == insertion order); flagged for the host fallback
        rest = np.nonzero((~assigned) & (seed_cnt > 0))[0]
        for s0, c in _shapes.chunks(rest.size, tile=g_tile(group_caps[-1])):
            plans.append(submit_group(rest[s0:s0 + c], group_caps[-1]))
    with timers.section("seed.group_drain"):
        return [(p[0], drain_group(p)) for p in plans]


# --------------------------------------------------------------------------
# Fused 3-pass interval collection: ONE device program runs pass 1 (SMEM
# forward scan + backward extension + emission), pass 2 (re-seeding of long
# low-occurrence SMEMs on device-compacted parent lanes), and pass 3
# (LAST-like short-seed scan), compacting each pass's emissions into flat
# arenas and returning ONE stacked array (+ packed meta/overflow word).
# Why: the tunneled TPU backend charges a ~25 ms round trip per fetched
# array and ~28 ms per dispatch; the previous host-driven pass-2 cost ~25
# fetches per batch, dominating the seeding phase.  Semantics are identical
# to ops.smem.collect_intervals / mem_collect_intv (bwamem.c:137-185);
# validated by test_smem / test_seeding_host / the e2e suite.
# --------------------------------------------------------------------------


def _compact_flat(mask, fields, arena):
    """Compact flat lanes: mask [T] bool; fields [(flat array, dtype)].
    Returns (outs [arena], n, overflow, pos) — pos is the target slot per
    source lane (for scattering results back to the source grid).  Lanes
    past the arena are DROPPED (mode=drop), so output is only valid when
    overflow is False — callers must retry with a bigger arena."""
    i32 = jnp.int32
    pos = jnp.cumsum(mask.astype(i32)) - 1
    n_all = pos[-1] + 1
    over = n_all > arena
    tgt = jnp.where(mask, jnp.minimum(pos, arena - 1), arena)
    outs = [jnp.zeros((arena,), dt).at[tgt].set(
        a.reshape(-1).astype(dt), mode="drop") for a, dt in fields]
    return outs, jnp.minimum(n_all, arena), over, pos


@functools.partial(jax.jit, static_argnames=(
    "cap", "kmax", "emax", "pmax", "cand2", "k2max", "e2max", "p3cap",
    "e3max", "min_seed_len", "split_len", "split_width", "max_mem_intv",
    "use_kmer"))
def _collect_all_jit(fm, seq, l_seq, *, cap, kmax, emax, pmax, cand2,
                     k2max, e2max, p3cap, e3max, min_seed_len, split_len,
                     split_width, max_mem_intv, use_kmer=False):
    N, L = seq.shape
    it = fm.L2.dtype
    i32 = jnp.int32

    # k-mer-12 fast-start intervals per read position (exactness argument
    # in ops.smem; only valid when min_seed_len >= 12, checked by caller)
    pre = smemops.kmer_pre(fm, seq, l_seq) if use_kmer else None

    # ---- pass 1: multi-pivot forward scan over full reads ----
    c1 = smemops.forward_scan(fm, seq, l_seq, jnp.zeros((N,), i32),
                              jnp.ones((N,), it), cap, multi_pivot=True,
                              pre=pre)
    rows = jnp.broadcast_to(jnp.arange(N, dtype=i32)[:, None], (N, cap))
    slots = jnp.broadcast_to(jnp.arange(cap, dtype=i32)[None, :], (N, cap))
    mask1 = (slots < c1.n[:, None]).reshape(-1)
    (lane_read, pivot, fx0, fx1, fx2), nk, k_over, pos1 = _compact_flat(
        mask1, [(rows, i32), (c1.pivot, i32), (c1.x0, it), (c1.x1, it),
                (c1.x2, it)], kmax)
    fvalid = jnp.arange(kmax, dtype=i32) < nk
    s_f, x0_f, x2_f = smemops.back_extend_flat(
        fm, seq, lane_read, pivot, fx0, fx1, fx2, jnp.ones((kmax,), it),
        fvalid)
    maskg = mask1.reshape(N, cap)
    back = jnp.where(maskg, jnp.minimum(pos1.reshape(N, cap), kmax - 1), 0)
    s_grid = jnp.where(maskg, s_f[back], 0)
    x0_grid = jnp.where(maskg, x0_f[back], 0)
    x2_grid = jnp.where(maskg, x2_f[back], 0)
    emit1 = smemops.emit_mask(c1, s_grid.reshape(-1))
    smem1 = emit1 & ((c1.end - s_grid) >= min_seed_len)
    (e_read, e_s, e_e, e_x0, e_x2), n1, e_over, _ = _compact_flat(
        smem1.reshape(-1), [(rows, it), (s_grid, it), (c1.end, it),
                            (x0_grid, it), (x2_grid, it)], emax)

    # ---- pass 2: re-seed long low-occ SMEMs (bwamem.c:155-165) on
    # device-compacted parent lanes ----
    lane1 = jnp.arange(emax, dtype=i32)
    qual = ((lane1 < n1) & ((e_e - e_s) >= split_len)
            & (e_x2 <= split_width))
    (p_read, p_start, p_min), n_par, p_over, _ = _compact_flat(
        qual, [(e_read, i32), ((e_s + e_e) >> 1, i32),
               (e_x2 + 1, it)], pmax)
    p_alive = jnp.arange(pmax, dtype=i32) < n_par
    p_lseq = jnp.where(p_alive, l_seq[p_read], 0).astype(l_seq.dtype)
    c2 = smemops.forward_scan(
        fm, seq, p_lseq, jnp.where(p_alive, p_start, 0),
        jnp.where(p_alive, p_min, 1), cand2, multi_pivot=False,
        lane_read=p_read)
    rows2 = jnp.broadcast_to(p_read[:, None], (pmax, cand2))
    slots2 = jnp.broadcast_to(jnp.arange(cand2, dtype=i32)[None, :],
                              (pmax, cand2))
    mask2 = (slots2 < c2.n[:, None]).reshape(-1)
    min2g = jnp.broadcast_to(p_min[:, None], (pmax, cand2))
    (lr2, pv2, bx0, bx1, bx2, mi2), nk2, k2_over, pos2 = _compact_flat(
        mask2, [(rows2, i32), (c2.pivot, i32), (c2.x0, it), (c2.x1, it),
                (c2.x2, it), (min2g, it)], k2max)
    v2 = jnp.arange(k2max, dtype=i32) < nk2
    s2f, x0f2, x2f2 = smemops.back_extend_flat(
        fm, seq, lr2, pv2, bx0, bx1, bx2, mi2, v2)
    mask2g = mask2.reshape(pmax, cand2)
    back2 = jnp.where(mask2g,
                      jnp.minimum(pos2.reshape(pmax, cand2), k2max - 1), 0)
    s2_grid = jnp.where(mask2g, s2f[back2], 0)
    x0_2g = jnp.where(mask2g, x0f2[back2], 0)
    x2_2g = jnp.where(mask2g, x2f2[back2], 0)
    emit2 = smemops.emit_mask(c2, s2_grid.reshape(-1))
    smem2 = emit2 & ((c2.end - s2_grid) >= min_seed_len)
    (e2_read, e2_s, e2_e, e2_x0, e2_x2), n2, e2_over, _ = _compact_flat(
        smem2.reshape(-1), [(rows2, it), (s2_grid, it), (c2.end, it),
                            (x0_2g, it), (x2_2g, it)], e2max)

    # ---- pass 3 (bwt_seed_strategy1) ----
    if max_mem_intv > 0:
        p3x0, p3x2, p3s, p3e, p3n, p3over, _, _ = smemops.pass3_scan(
            fm, seq, l_seq, min_seed_len, max_mem_intv, p3cap, pre=pre)
        rows3 = jnp.broadcast_to(jnp.arange(N, dtype=i32)[:, None],
                                 (N, p3cap))
        m3 = (jnp.broadcast_to(jnp.arange(p3cap, dtype=i32)[None, :],
                               (N, p3cap)) < p3n[:, None])
        (e3_read, e3_s, e3_e, e3_x0, e3_x2), n3, e3_over, _ = _compact_flat(
            m3.reshape(-1), [(rows3, it), (p3s, it), (p3e, it),
                             (p3x0, it), (p3x2, it)], e3max)
        p3_any = p3over.any()
        p3n_max = p3n.max()
    else:
        z = jnp.zeros((e3max,), it)
        e3_read = e3_s = e3_e = e3_x0 = e3_x2 = z
        n3 = jnp.zeros((), i32)
        e3_over = p3_any = jnp.zeros((), bool)
        p3n_max = jnp.zeros((), i32)

    # ---- ONE stacked output [5, emax+e2max+e3max+16] ----
    # meta block (last 16 cols): row 0 cols 0-3 = n1, n2, n3, flags;
    # row 1 cols 0-8 = per-arena high-water marks in _GROW_BITS order —
    # the host right-sizes the NEXT batch's arenas from these, so the
    # lockstep scans stop paying for dead lanes (arena >> live lanes was
    # ~40% of this program's wall time before)
    sec1 = jnp.stack([e_read, e_s, e_e, e_x0, e_x2])
    sec2 = jnp.stack([e2_read, e2_s, e2_e, e2_x0, e2_x2])
    sec3 = jnp.stack([e3_read, e3_s, e3_e, e3_x0, e3_x2])
    flags = (c1.overflow.any().astype(it)
             | (k_over.astype(it) << 1) | (e_over.astype(it) << 2)
             | (p_over.astype(it) << 3) | (c2.overflow.any().astype(it) << 4)
             | (k2_over.astype(it) << 5) | (e2_over.astype(it) << 6)
             | (p3_any.astype(it) << 7) | (e3_over.astype(it) << 8))
    hwm = jnp.stack([c1.n.max().astype(it), nk.astype(it), n1.astype(it),
                     n_par.astype(it), c2.n.max().astype(it),
                     nk2.astype(it), n2.astype(it),
                     p3n_max.astype(it), n3.astype(it)])
    meta = jnp.zeros((5, 16), it).at[0, :4].set(
        jnp.stack([n1.astype(it), n2.astype(it), n3.astype(it),
                   flags])).at[1, :9].set(hwm)
    return jnp.concatenate([sec1, sec2, sec3, meta], axis=1)


# which arena each overflow-flag bit grows (bit order must match `flags`)
_GROW_BITS = ("cap", "kmax", "emax", "pmax", "cand2", "k2max", "e2max",
              "p3cap", "e3max")


def collect_intervals_host(al, seq_np: np.ndarray, l_seq: np.ndarray,
                           n: int, caps=None, kmax0: int = 0,
                           emax0: int = 0):
    """Returns flat per-interval arrays (read, start, end, x0, x2) sorted by
    (read, start, end) — mem_collect_intv output (bwamem.c:137-185) plus an
    overflow flag per read (always all-False: every arena overflow is
    retried with a doubled arena until the output fits).

    All three passes run as ONE fused device program returning ONE stacked
    array; see _collect_all_jit.  kmax0/emax0 override the initial pass-1
    arena sizes (tests use tiny values to force the grow-and-retry path)."""
    opt: MemOptions = al.opt
    seq_j = jnp.asarray(seq_np)
    l_j = jnp.asarray(l_seq)
    N, Lr = seq_np.shape
    mesh = getattr(al, "mesh", None)
    ndev = 1 if mesh is None else mesh.devices.size
    Nl = N // ndev           # arenas are per shard under a mesh
    hist = getattr(al, "_seed_arena_hist", None)
    if hist is None:
        hist = al._seed_arena_hist = {}
    # defaults for the first batch of a shape; afterwards the measured
    # high-water marks (meta row 1) right-size every arena with 25%
    # headroom — the lockstep scans pay per arena LANE, live or dead, so
    # a pass-2 arena sized "generously" (the old fixed Nl*8) cost ~40% of
    # the fused program on workloads whose pass-2 is nearly empty
    defaults = {
        "cap": 2 * Lr,
        "kmax": _bucket(Nl * 16, lo=1024),
        "emax": _bucket(Nl * 8, lo=1024),
        "pmax": _bucket(Nl * 2, lo=256),
        "cand2": 48,
        "k2max": _bucket(Nl * 8, lo=1024),
        "e2max": _bucket(Nl * 4, lo=1024),
        "p3cap": 32,
        "e3max": _bucket(Nl * 2, lo=1024),
    }
    _FLOORS = {"cap": 64, "kmax": 1024, "emax": 1024, "pmax": 256,
               "cand2": 16, "k2max": 1024, "e2max": 1024, "p3cap": 16,
               "e3max": 1024}

    def from_hwm(name):
        h = hist.get(("hwm", name, N))
        if h is None:
            return None
        return _bucket(int(h + (h >> 2) + 1), lo=_FLOORS[name])

    sizes = {k: from_hwm(k) or defaults[k] for k in defaults}
    if kmax0:
        sizes["kmax"] = kmax0
    if emax0:
        sizes["emax"] = emax0
    # k-mer fast-start: only when the index carries the table and the skip
    # is provably exact (min_seed_len >= K, see ops.smem.kmer_pre)
    use_kmer = (al.fm.kmer is not None and getattr(opt, "use_kmer_table", True)
                and opt.min_seed_len >= smemops.KMER_K)
    while True:
        statics = dict(min_seed_len=opt.min_seed_len,
                       split_len=opt.split_len,
                       split_width=opt.split_width,
                       max_mem_intv=opt.max_mem_intv, use_kmer=use_kmer,
                       **sizes)
        with timers.section("seed.collect_rt"):
            if mesh is None:
                out = fetchguard.fetch(
                    [_collect_all_jit(al.fm, seq_j, l_j, **statics)],
                    what="seed_collect")[0]
            else:
                # shard-local arenas per chip; one program, one fetch
                fn = pmesh.rowmap(mesh, _collect_all_jit,
                                  tuple(sorted(statics.items())),
                                  (True, False, False), stacked_out=True)
                out = fetchguard.fetch([fn(al.fm, seq_j, l_j)],
                                       what="seed_collect")[0]
            timers.add_bytes("d2h.seed_collect", out.nbytes)
        shards = out.reshape(5, ndev, out.shape[1] // ndev)
        flags = 0
        for sh in range(ndev):
            flags |= int(shards[0, sh, -13])
        # grow whichever arena overflowed (in any shard) and rerun:
        # dropped-lane output is incomplete, silently truncating seeds is
        # not an option
        retry = False
        for bit, name in enumerate(_GROW_BITS):
            if (flags >> bit) & 1:
                sizes[name] *= 2
                retry = True
        if not retry:
            break
    # running max of the measured high-water marks sizes the next batch
    for bit, name in enumerate(_GROW_BITS):
        hwm = max(int(shards[1, sh, -16 + bit]) for sh in range(ndev))
        key = ("hwm", name, N)
        hist[key] = max(hist.get(key, 0), hwm)
    o1 = sizes["emax"]
    o2 = o1 + sizes["e2max"]
    Nl = N // ndev
    parts = []
    for sh in range(ndev):
        o = shards[:, sh, :]
        n1, n2, n3 = int(o[0, -16]), int(o[0, -15]), int(o[0, -14])
        p = np.concatenate([o[:, :n1], o[:, o1:o1 + n2],
                            o[:, o2:o2 + n3]], axis=1)
        if sh:
            p = p.copy()
            p[0] += sh * Nl      # shard-local read rows → batch rows
        parts.append(p)
    allv = parts[0] if ndev == 1 else np.concatenate(parts, axis=1)
    read_iv = allv[0].astype(np.int32)
    start = allv[1].astype(np.int64)
    end = allv[2].astype(np.int64)
    x0 = allv[3].astype(np.int64)
    x2 = allv[4].astype(np.int64)
    # sort by (read, start, end) — ks_introsort(mem_intv) on info; stable,
    # so ties keep pass-1 < pass-2 < pass-3 emission order
    order = np.lexsort((end, start, read_iv))
    overflow = np.zeros(n, bool)
    return (read_iv[order], start[order], end[order], x0[order], x2[order],
            overflow)
