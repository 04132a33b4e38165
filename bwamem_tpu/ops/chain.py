"""Seed expansion + chaining + chain filtering.

Replaces the reference's per-read kbtree insertion chaining (mem_chain,
bwamem.c:258-322, device B-tree cuda/kbtree_CUDA.cu) and the sequential
chain-shadowing filter (mem_chain_flt, bwamem.c:334-392) with read-lockstep
vectorized loops: every read processes one seed (or one chain) per step, and
the per-read "closest chain" lookup / kept-list scan becomes a masked
reduction over a fixed-width chain table.  All semantics — containment,
strand blocking, band/gap growth rules, weight = min(query,ref) coverage,
shadow marking with first-overlap resurrection (kept=1) — follow the
reference exactly; tests diff against the oracle's `chains` dump.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from bwamem_tpu.ops import fm as fmops
from bwamem_tpu.ops.smem import Intervals


class Seeds(NamedTuple):
    rbeg: jax.Array      # [N, S] it — both-strands start
    qbeg: jax.Array      # [N, S] int32
    len: jax.Array       # [N, S] int32
    rid: jax.Array       # [N, S] int32 (<0 = discarded)
    valid: jax.Array     # [N, S] bool
    frac_rep: jax.Array  # [N] float32
    overflow: jax.Array  # [N] bool


def expand_seeds(fm: fmops.FM, ctg_offsets: jax.Array, iv: Intervals,
                 max_occ: int, seed_cap: int) -> Seeds:
    """Occurrence sampling + SA translation (mem_chain loop, bwamem.c:280-307
    and SEEDCHAINING_translate_seedinfo, cuda/bwamem_GPU.cu:1783).

    Seed slot order = sorted-interval order × occurrence order, which is the
    reference's chaining insertion order.  step-sampling keeps exactly
    min(x2, max_occ) occurrences with stride floor(x2/max_occ).
    """
    N, I = iv.start.shape
    it = fm.L2.dtype
    counts = jnp.where(iv.valid, jnp.minimum(iv.x2, max_occ), 0)
    cum = jnp.cumsum(counts, axis=1)                      # [N, I]
    total = cum[:, -1]
    overflow = total > seed_cap

    slots = jnp.arange(seed_cap, dtype=it)[None, :]       # [1, S]
    # interval that owns each slot
    own = jax.vmap(lambda c, s: jnp.searchsorted(c, s, side="right"))(
        cum, jnp.broadcast_to(slots, (N, seed_cap))).astype(jnp.int32)
    own_c = jnp.clip(own, 0, I - 1)
    rows = jnp.arange(N, dtype=jnp.int32)[:, None]
    prev_cum = jnp.where(own_c > 0,
                         jnp.take_along_axis(cum, jnp.maximum(own_c - 1, 0),
                                             axis=1), 0)
    k_within = slots - prev_cum
    x0 = jnp.take_along_axis(iv.x0, own_c, axis=1)
    x2 = jnp.take_along_axis(iv.x2, own_c, axis=1)
    start = jnp.take_along_axis(iv.start, own_c, axis=1)
    end = jnp.take_along_axis(iv.end, own_c, axis=1)
    step = jnp.where(x2 > max_occ, x2 // max_occ, 1)
    valid = (slots < total[:, None])
    rank = jnp.where(valid, x0 + k_within * step, 0).astype(it)

    rbeg = fmops.sa_lookup(fm, rank)
    slen = (end - start).astype(jnp.int32)
    rid = fmops.intv2rid(fm, ctg_offsets, rbeg, rbeg + slen)
    valid = valid & (rid >= 0)

    # frac_rep: union length of intervals with x2 > max_occ (bwamem.c:272-279)
    rep = iv.valid & (iv.x2 > max_occ)
    sb = jnp.where(rep, iv.start, 0)
    se = jnp.where(rep, iv.end, 0)
    # running max of previous ends among rep intervals (sorted by start)
    run_end = jax.lax.associative_scan(
        jnp.maximum, jnp.where(rep, se, -1), axis=1)
    prev_end = jnp.concatenate(
        [jnp.full((N, 1), -1, run_end.dtype), run_end[:, :-1]], axis=1)
    contrib = jnp.where(rep, jnp.maximum(se - jnp.maximum(sb, prev_end), 0), 0)
    l_rep = contrib.sum(axis=1)
    return Seeds(rbeg=rbeg, qbeg=start, len=slen, rid=rid, valid=valid,
                 frac_rep=l_rep.astype(jnp.float32), overflow=overflow)


class Chains(NamedTuple):
    pos: jax.Array        # [N, C] it — first seed rbeg (B-tree key)
    rid: jax.Array        # [N, C] int32
    is_alt: jax.Array     # [N, C] bool
    first_qbeg: jax.Array  # [N, C] int32
    first_rbeg: jax.Array  # [N, C] it
    last_qbeg: jax.Array   # [N, C] int32
    last_rbeg: jax.Array   # [N, C] it
    last_len: jax.Array    # [N, C] int32
    n_seeds: jax.Array     # [N, C] int32
    n: jax.Array           # [N] chains created
    seed_chain: jax.Array  # [N, S] int32 — chain of each seed (-1 = none)
    overflow: jax.Array    # [N] bool


def chain_seeds(seeds: Seeds, ctg_is_alt: jax.Array, l_pac,
                w: int, max_chain_gap: int, chain_cap: int) -> Chains:
    """Sequential-equivalent chaining (mem_chain + test_and_merge,
    bwamem.c:197-307), lockstep over reads.

    For each seed in insertion order: find the chain with the largest
    pos <= rbeg (kb_intervalp's lower), try to merge per test_and_merge,
    else open a new chain keyed at rbeg.
    """
    N, S = seeds.rbeg.shape
    C = chain_cap
    it = seeds.rbeg.dtype
    rows = jnp.arange(N, dtype=jnp.int32)
    BIG = jnp.asarray(np.iinfo(np.int64 if it == jnp.int64 else np.int32).max,
                      it)

    # per-chain state in one [N, C, 8] array (pos, rid<<1|alt, fq, fr, lq,
    # lr, ll, ns — rid/fq/lq/ll/ns fit `it`).  C is small (~64), so the
    # loop body touches it with ONE-HOT masked reduces and writes — pure
    # VPU traffic over N*C*8 elements — instead of gathers/scatters, which
    # cost ~0.4-0.7 ms PER OP on the target backend regardless of size.
    P_POS, P_RA, P_FQ, P_FR, P_LQ, P_LR, P_LL, P_NS = range(8)
    lanesC = jnp.arange(C, dtype=jnp.int32)[None, :]

    def body(s, st):
        g, n, seed_chain, overflow = st
        rb = seeds.rbeg[:, s]
        qb = seeds.qbeg[:, s].astype(it)
        sl = seeds.len[:, s].astype(it)
        srid = seeds.rid[:, s]
        svalid = seeds.valid[:, s]

        pos = g[:, :, P_POS]
        exists = lanesC < n[:, None]
        cand = exists & (pos <= rb[:, None])
        has_lower = cand.any(axis=1)
        # argmax of (pos, j): later-created chain wins ties
        key = jnp.where(cand, pos, -BIG)
        maxpos = key.max(axis=1)
        tie = cand & (pos == maxpos[:, None])
        lower = jnp.where(tie, lanesC, -1).max(axis=1)

        oh_low = lanesC == lower[:, None]              # [N, C]
        c = jnp.where(oh_low[:, :, None], g, 0).sum(axis=1, dtype=it)
        c_rid = (c[:, P_RA] >> 1).astype(jnp.int32)
        c_fq, c_fr = c[:, P_FQ], c[:, P_FR]
        c_lq, c_lr, c_ll = c[:, P_LQ], c[:, P_LR], c[:, P_LL]
        qend = c_lq + c_ll
        rend = c_lr + c_ll

        same_rid = srid == c_rid
        contained = ((qb >= c_fq) & (qb + sl <= qend)
                     & (rb >= c_fr) & (rb + sl <= rend))
        strand_block = ((c_lr < l_pac) | (c_fr < l_pac)) & (rb >= l_pac)
        x = qb - c_lq
        y = rb - c_lr
        grow = ((y >= 0) & (x - y <= w) & (y - x <= w)
                & (x - c_ll < max_chain_gap) & (y - c_ll < max_chain_gap))
        merged = svalid & has_lower & same_rid & (contained
                                                  | (~strand_block & grow))
        appended = merged & ~contained
        new = svalid & ~merged & (n < C)

        # ONE masked write serves both cases (disjoint per lane): the
        # appended row keeps (pos, ra, fq, fr) and refreshes the tail; a
        # new chain writes the full row at slot n
        new_ra = ((srid.astype(it) << 1)
                  | (ctg_is_alt[jnp.clip(srid, 0, None)] > 0).astype(it))
        app_row = jnp.stack([c[:, P_POS], c[:, P_RA], c_fq, c_fr,
                             qb, rb, sl, c[:, P_NS] + 1], axis=-1)
        new_row = jnp.stack([rb, new_ra, qb, rb, qb, rb, sl,
                             jnp.ones_like(rb)], axis=-1)
        wmask = jnp.where(appended[:, None], oh_low,
                          new[:, None] & (lanesC == n[:, None]))
        wrow = jnp.where(appended[:, None], app_row, new_row)
        g = jnp.where(wmask[:, :, None], wrow[:, None, :], g)

        seed_chain = seed_chain.at[:, s].set(
            jnp.where(appended, jnp.clip(lower, 0, C - 1),
                      jnp.where(new, n, -1)))
        overflow = overflow | (svalid & ~merged & (n >= C))
        n = n + new.astype(jnp.int32)
        return g, n, seed_chain, overflow

    g0 = jnp.zeros((N, C, 8), it).at[:, :, P_POS].set(BIG)
    g0 = g0.at[:, :, P_RA].set(jnp.asarray(-2, it))   # rid -1, alt 0
    init = (g0, jnp.zeros((N,), jnp.int32),
            jnp.full((N, S), -1, jnp.int32), jnp.zeros((N,), bool))
    g, n, seed_chain, overflow = jax.lax.fori_loop(0, S, body, init,
                                                   unroll=4)
    return Chains(g[:, :, P_POS], (g[:, :, P_RA] >> 1).astype(jnp.int32),
                  (g[:, :, P_RA] & 1).astype(bool),
                  g[:, :, P_FQ].astype(jnp.int32), g[:, :, P_FR],
                  g[:, :, P_LQ].astype(jnp.int32), g[:, :, P_LR],
                  g[:, :, P_LL].astype(jnp.int32),
                  g[:, :, P_NS].astype(jnp.int32), n, seed_chain, overflow)


def seeds_by_chain(seeds: Seeds, chains: Chains, seed_cap: int):
    """Reorder seeds per read by (chain, insertion slot) and return
    (order, chain_of_sorted_seed, valid).  Within a chain the order equals
    insertion order, which test_and_merge guarantees is non-decreasing in
    both qbeg and rbeg — required by mem_chain_weight's sweep."""
    N, S = seeds.rbeg.shape
    in_chain = chains.seed_chain >= 0
    key = jnp.where(in_chain, chains.seed_chain, jnp.int32(2**30))
    order = jnp.argsort(key * (S + 1)
                        + jnp.arange(S, dtype=jnp.int32)[None, :], axis=1)
    sc = jnp.take_along_axis(chains.seed_chain, order, axis=1)
    return order, sc, sc >= 0


def chain_weights(seeds: Seeds, chains: Chains) -> jax.Array:
    """mem_chain_weight (bwamem.c:220-239): min of query- and ref-coverage
    of the chain's seeds, via segmented running-max sweeps."""
    N, S = seeds.rbeg.shape
    C = chains.pos.shape[1]
    order, sc, svalid = seeds_by_chain(seeds, chains, S)
    qb = jnp.take_along_axis(seeds.qbeg, order, axis=1).astype(jnp.int64)
    rb = jnp.take_along_axis(seeds.rbeg, order, axis=1).astype(jnp.int64)
    sl = jnp.take_along_axis(seeds.len, order, axis=1).astype(jnp.int64)

    def coverage(beg):
        endv = beg + sl
        seg_start = jnp.concatenate(
            [jnp.ones((N, 1), bool), sc[:, 1:] != sc[:, :-1]], axis=1)
        # segmented running max of previous ends
        def op(a, b):
            av, af = a
            bv, bf = b
            return jnp.where(bf, bv, jnp.maximum(av, bv)), af | bf
        vals = jnp.where(seg_start, endv, endv)  # scan over (end, flag)
        run, _ = jax.lax.associative_scan(op, (endv, seg_start), axis=1)
        prev = jnp.concatenate(
            [jnp.zeros((N, 1), jnp.int64), run[:, :-1]], axis=1)
        prev = jnp.where(seg_start, 0, prev)
        cov = jnp.where(svalid,
                        jnp.maximum(endv - jnp.maximum(beg, prev), 0), 0)
        out = jnp.zeros((N, C), jnp.int64)
        rows = jnp.arange(N, dtype=jnp.int32)[:, None]
        return out.at[rows, jnp.clip(sc, 0, C - 1)].add(
            jnp.where(svalid, cov, 0))

    wq = coverage(qb)
    wr = coverage(rb)
    w = jnp.minimum(wq, wr)
    return jnp.minimum(w, (1 << 30) - 1).astype(jnp.int32)


class FilteredChains(NamedTuple):
    order: jax.Array   # [N, C] chain indices in weight-desc processing order
    kept: jax.Array    # [N, C] 0/1/2/3 per ORDERED position
    w: jax.Array       # [N, C] weight per ordered position
    n: jax.Array       # [N] chains entering the filter


def filter_chains(chains: Chains, weights: jax.Array, seeds: Seeds,
                  *, mask_level: float, drop_ratio: float, min_seed_len: int,
                  max_chain_gap: int, min_chain_weight: int,
                  max_chain_extend: int) -> FilteredChains:
    """mem_chain_flt (bwamem.c:334-392), lockstep over reads.

    Chains are processed in weight-descending order (stable on the B-tree
    traversal order = pos ascending) against the kept list; shadowed chains
    with a sufficiently lower weight are dropped, and each kept chain's first
    shadowed victim is resurrected with kept=1 for mapq accuracy.
    """
    N, C = weights.shape
    # chain span on the query: first seed qbeg .. last seed qbeg+len
    beg = chains.first_qbeg
    end = chains.last_qbeg + chains.last_len
    exists = jnp.arange(C, dtype=jnp.int32)[None, :] < chains.n[:, None]
    heavy = exists & (weights >= min_chain_weight)
    # order: traversal order is pos ascending (with creation order as tie);
    # then stable sort by weight desc.
    trav_key = jnp.argsort(
        jnp.where(exists, chains.pos, jnp.iinfo(jnp.int32).max
                  if chains.pos.dtype == jnp.int32 else jnp.iinfo(jnp.int64).max),
        axis=1, stable=True)
    rows = jnp.arange(N, dtype=jnp.int32)[:, None]
    w_trav = jnp.take_along_axis(weights, trav_key, axis=1)
    h_trav = jnp.take_along_axis(heavy, trav_key, axis=1)
    sort2 = jnp.argsort(jnp.where(h_trav, -w_trav, jnp.int32(2**30)),
                        axis=1, stable=True)
    order = jnp.take_along_axis(trav_key, sort2, axis=1)  # [N, C]
    w_ord = jnp.take_along_axis(weights, order, axis=1)
    beg_o = jnp.take_along_axis(beg, order, axis=1)
    end_o = jnp.take_along_axis(end, order, axis=1)
    alt_o = jnp.take_along_axis(chains.is_alt, order, axis=1)
    n_f = jnp.take_along_axis(heavy, order, axis=1).sum(axis=1)

    kept0 = jnp.zeros((N, C), jnp.int32)
    first0 = jnp.full((N, C), -1, jnp.int32)
    li_all = end_o - beg_o

    def body(i, st):
        kept, first = st
        active = i < n_f                                  # [N]
        in_kept = (kept >= 2)                             # kept list members
        b_max = jnp.maximum(beg_o, beg_o[:, i][:, None])
        e_min = jnp.minimum(end_o, end_o[:, i][:, None])
        ovl = (e_min > b_max) & (~alt_o | alt_o[:, i][:, None])
        min_l = jnp.minimum(li_all, li_all[:, i][:, None])
        sig = ovl & ((e_min - b_max).astype(jnp.float32)
                     >= min_l.astype(jnp.float32) * mask_level) \
            & (min_l < max_chain_gap) & in_kept
        dropj = sig & ((w_ord[:, i][:, None].astype(jnp.float32)
                        < w_ord.astype(jnp.float32) * drop_ratio)
                       & (w_ord - w_ord[:, i][:, None] >= (min_seed_len << 1)))
        idxs = jnp.arange(C, dtype=jnp.int32)[None, :]
        brk = jnp.where(dropj, idxs, C).min(axis=1)       # first breaking j
        dropped = active & (brk < C)
        mark = sig & (idxs <= brk[:, None]) & (first < 0) & active[:, None]
        first = jnp.where(mark, i, first)
        large = (sig & (idxs <= brk[:, None])).any(axis=1)
        kept_i = jnp.where(dropped, 0, jnp.where(large, 2, 3))
        kept = kept.at[:, i].set(jnp.where(active & (i > 0), kept_i,
                                           kept[:, i]))
        return kept, first

    kept0 = kept0.at[:, 0].set(jnp.where(n_f > 0, 3, 0))
    kept, first = jax.lax.fori_loop(1, C, body, (kept0, first0))
    # resurrection: for kept chains with first >= 0, set kept[first] = 1
    is_kept = kept >= 2
    res = jnp.zeros((N, C), bool).at[
        rows, jnp.where(is_kept & (first >= 0), first, C)
    ].set(True, mode="drop")
    kept = jnp.where(res & (kept == 0), 1, kept)
    # max_chain_extend: cap the number of kept∈{1,2} chains
    ext = (kept == 1) | (kept == 2)
    cum_ext = jnp.cumsum(ext.astype(jnp.int32), axis=1)
    over = ext & (cum_ext > max_chain_extend)
    # once the cap is hit, all later kept<3 chains are dropped
    hit = jnp.cumsum(over.astype(jnp.int32), axis=1) > 0
    kept = jnp.where(hit & (kept < 3), 0, kept)
    return FilteredChains(order=order, kept=kept, w=w_ord, n=n_f)
