"""Device-resident front half: reads → extended alignment candidates in a
handful of chained device programs with ONE host fetch.

Round-2 profiling inverted the cost model this pipeline was built on: on the
current backend device compute runs at full HBM speed, while every H2D
upload crawls (~36 MB/s) and every dispatch+fetch round trip costs ~30 ms.
The host-compacted front half (pipeline/seeding_host.py) pays that transport
tax between every stage — seeding fetch, SA-rank upload/fetch, per-group
seed-grid uploads, worklist fetches, extension-lane uploads.  This module
keeps every intermediate on device:

  P1/P2/P3  3-pass SMEM seeding (ops/smem) emitting flat interval arenas
            (mem_collect_intv, reference bwamem.c:137-185)
  EXPAND    occurrence sampling + SA walk + rid filter + l_rep union +
            scatter into per-read seed grids (mem_chain head,
            bwamem.c:272-307)
  CHAIN     lockstep B-tree-equivalent chaining + chain weights + reference
            windows (mem_chain/mem_chain_weight, bwamem.c:197-332) + a
            compact per-chain arena for the host's exact filter
  EXT       every seed of every heavy chain extended speculatively by the
            fused extension kernel (left + band-doubling retry + right,
            ksw_extend2 / cuda/ksw_CUDA.cu:426-541 semantics; Pallas on
            TPU, the XLA row-scan on CPU) + per-item seedcov — packed into
            one fetchable result

The host then runs the EXACT mem_chain_flt (including the ks_introsort
tie-order replay, chainflt_host.chain_flt_exact) over the fetched per-chain
arena — superseding both the device stable-order filter and the old
dup-weight row patch — and replays mem_chain2aln's sequential skip/accept
walk (bwamem.c:674-793) with the extension results in hand.  Extending
dropped-chain seeds wastes only device lanes; acceptance is bit-identical
to the reference.

Reads that overflow the static caps (seed count > S) and long reads that
enter mem_flt_chained_seeds (bwamem.c:607-625) fall back to the
host-compacted path row-by-row.  Under a multi-chip mesh the six programs
run shard-mapped with shard-local arenas (_dispatch_mesh) and the host
merges the per-shard arenas before the replay.
"""
from __future__ import annotations

import functools
import json
import math
import os
import sys
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from bwamem_tpu.config import MemOptions
from bwamem_tpu.finalize import AlnReg
from bwamem_tpu.ops import align_ext
from bwamem_tpu.ops import chain as chainops
from bwamem_tpu.ops import fm as fmops
from bwamem_tpu.ops import smem as smemops
from bwamem_tpu.pipeline import _shapes
from bwamem_tpu.pipeline import chainflt_host
from bwamem_tpu.pipeline.seeding_host import _compact_flat
from bwamem_tpu.utils import fetchguard, timers


def _bucket(x: int, lo: int = 8) -> int:
    n = lo
    while n < x:
        n <<= 1
    return n


# ---------------------------------------------------------------------------
# P1: pass-1 SMEM scan (bwt_smem1a forward+backward over every pivot chain)
# ---------------------------------------------------------------------------

def _stage_ladder(base: int, width: int):
    """Static halving arena ladder for back_extend_flat compaction; empty
    for small batches (compaction overhead beats the win only at scale).

    Depth 8 (vs the former 3): candidate lifetimes are front-loaded
    (median 6 left steps, p90 = 10), so after the old 3x4 staged steps the
    closing while_loop still ran ~2% of the lanes at the FULL stage-3 width
    for up to ~40 more steps — the per-index gather cost of those dead-heavy
    rounds dominated the whole backward phase.  Deeper halving keeps the
    arena tracking the survivor count; the extra compactions are
    multi-operand sorts, which are near-free next to the gathers they
    shrink."""
    if width < 8192:
        return ()
    out = []
    for j in range(8):
        # Cap at the input arena width: a stage wider than its input can
        # never overflow but still runs its k steps.  base may exceed
        # `width` after need-driven growth — deep stages then get wider
        # (base>>j) while the top stays at `width`.  Uncapped-base clamping
        # in _dispatch (round 4) made growth a no-op: the same program
        # re-ran with the same deep-stage overflow forever — the "PE
        # wedge" was an infinite grow-and-retry loop, not a tunnel hang.
        w = min(max(base >> j, 512), width)
        if out and w == out[-1] == 512:
            break           # ladder hit the floor: extra 512-wide stages
        out.append(w)       # would re-run the same compaction for nothing
    return tuple(out)


def _p1_body(fm, seq, l_seq, *, cap, kmax, emax, min_seed_len, use_kmer,
            b1s, t1s):
    N, L = seq.shape
    it = fm.L2.dtype
    i32 = jnp.int32
    pre = smemops.kmer_pre0(fm, seq, l_seq) if use_kmer else None
    c1 = smemops.forward_scan(fm, seq, l_seq, jnp.zeros((N,), i32),
                              jnp.ones((N,), it), cap, multi_pivot=True,
                              pre=pre, max_steps=t1s)
    rows = jnp.broadcast_to(jnp.arange(N, dtype=i32)[:, None], (N, cap))
    slots = jnp.broadcast_to(jnp.arange(cap, dtype=i32)[None, :], (N, cap))
    mask1 = (slots < c1.n[:, None]).reshape(-1)
    (lane_read, pivot, fx0, fx1, fx2), nk, k_over, pos1 = _compact_flat(
        mask1, [(rows, i32), (c1.pivot, i32), (c1.x0, it), (c1.x1, it),
                (c1.x2, it)], kmax)
    fvalid = jnp.arange(kmax, dtype=i32) < nk
    st1 = _stage_ladder(b1s, kmax)
    if st1:
        s_f, x0_f, x2_f, b1_over, b1_need = smemops.back_extend_flat(
            fm, seq, lane_read, pivot, fx0, fx1, fx2, jnp.ones((kmax,), it),
            fvalid, stage_w=st1)
    else:
        s_f, x0_f, x2_f = smemops.back_extend_flat(
            fm, seq, lane_read, pivot, fx0, fx1, fx2, jnp.ones((kmax,), it),
            fvalid)
        b1_over = jnp.zeros((), bool)
        b1_need = jnp.zeros((), i32)
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
    sec1 = jnp.stack([e_read, e_s, e_e, e_x0, e_x2])
    flags = (c1.overflow.any().astype(i32)
             | (k_over.astype(i32) << 1) | (e_over.astype(i32) << 2)
             | (b1_over.astype(i32) << 9)
             | (c1.unfinished.astype(i32) << 11))
    meta = jnp.stack([n1.astype(i32), flags, c1.n.max().astype(i32),
                      nk.astype(i32), n1.astype(i32),
                      b1_need, c1.steps,
                      jnp.zeros((), i32)])
    return sec1, meta


# ---------------------------------------------------------------------------
# P2: re-seeding of long low-occurrence SMEMs (bwamem.c:155-165)
# ---------------------------------------------------------------------------

def _p2_body(fm, seq, l_seq, sec1, n1, *, pmax, cand2, k2max, e2max,
            min_seed_len, split_len, split_width, b2s, t2s):
    it = fm.L2.dtype
    i32 = jnp.int32
    emax = sec1.shape[1]
    e_read, e_s, e_e, e_x0, e_x2 = (sec1[i] for i in range(5))
    lane1 = jnp.arange(emax, dtype=i32)
    qual = ((lane1 < n1) & ((e_e - e_s) >= split_len)
            & (e_x2 <= split_width))
    (p_read, p_start, p_min), n_par, p_over, _ = _compact_flat(
        qual, [(e_read.astype(i32), i32),
               ((e_s + e_e).astype(i32) >> 1, i32), (e_x2 + 1, it)], pmax)
    p_alive = jnp.arange(pmax, dtype=i32) < n_par
    p_lseq = jnp.where(p_alive, l_seq[p_read], 0).astype(l_seq.dtype)
    c2 = smemops.forward_scan(
        fm, seq, p_lseq, jnp.where(p_alive, p_start, 0),
        jnp.where(p_alive, p_min, 1), cand2, multi_pivot=False,
        lane_read=p_read, max_steps=t2s)
    rows2 = jnp.broadcast_to(p_read[:, None], (pmax, cand2))
    slots2 = jnp.broadcast_to(jnp.arange(cand2, dtype=i32)[None, :],
                              (pmax, cand2))
    mask2 = (slots2 < c2.n[:, None]).reshape(-1)
    min2g = jnp.broadcast_to(p_min[:, None], (pmax, cand2))
    (lr2, pv2, bx0, bx1, bx2, mi2), nk2, k2_over, pos2 = _compact_flat(
        mask2, [(rows2, i32), (c2.pivot, i32), (c2.x0, it), (c2.x1, it),
                (c2.x2, it), (min2g, it)], k2max)
    v2 = jnp.arange(k2max, dtype=i32) < nk2
    st2 = _stage_ladder(b2s, k2max)
    if st2:
        s2f, x0f2, x2f2, b2_over, b2_need = smemops.back_extend_flat(
            fm, seq, lr2, pv2, bx0, bx1, bx2, mi2, v2, stage_w=st2)
    else:
        s2f, x0f2, x2f2 = smemops.back_extend_flat(
            fm, seq, lr2, pv2, bx0, bx1, bx2, mi2, v2)
        b2_over = jnp.zeros((), bool)
        b2_need = jnp.zeros((), i32)
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
    sec2 = jnp.stack([e2_read, e2_s, e2_e, e2_x0, e2_x2])
    flags = ((p_over.astype(i32) << 3) | (c2.overflow.any().astype(i32) << 4)
             | (k2_over.astype(i32) << 5) | (e2_over.astype(i32) << 6)
             | (b2_over.astype(i32) << 10)
             | (c2.unfinished.astype(i32) << 12))
    meta = jnp.stack([n2.astype(i32), flags, n_par.astype(i32),
                      c2.n.max().astype(i32), nk2.astype(i32),
                      n2.astype(i32), b2_need, c2.steps])
    return sec2, meta


# ---------------------------------------------------------------------------
# P3: LAST-like forward-only pass (bwt_seed_strategy1, bwt.c:358-379)
# ---------------------------------------------------------------------------

def _p3_body(fm, seq, l_seq, *, p3cap, e3max, min_seed_len, max_mem_intv,
            use_kmer, t3s):
    N, L = seq.shape
    it = fm.L2.dtype
    i32 = jnp.int32
    pre = smemops.kmer_pre(fm, seq, l_seq) if use_kmer else None
    p3x0, p3x2, p3s, p3e, p3n, p3over, p3steps, p3unf = smemops.pass3_scan(
        fm, seq, l_seq, min_seed_len, max_mem_intv, p3cap, pre=pre,
        max_steps=t3s)
    rows3 = jnp.broadcast_to(jnp.arange(N, dtype=i32)[:, None], (N, p3cap))
    m3 = (jnp.broadcast_to(jnp.arange(p3cap, dtype=i32)[None, :],
                           (N, p3cap)) < p3n[:, None])
    (e3_read, e3_s, e3_e, e3_x0, e3_x2), n3, e3_over, _ = _compact_flat(
        m3.reshape(-1), [(rows3, it), (p3s, it), (p3e, it),
                         (p3x0, it), (p3x2, it)], e3max)
    sec3 = jnp.stack([e3_read, e3_s, e3_e, e3_x0, e3_x2])
    flags = ((p3over.any().astype(i32) << 7) | (e3_over.astype(i32) << 8)
             | (p3unf.astype(i32) << 13))
    meta = jnp.stack([n3.astype(i32), flags, p3n.max().astype(i32),
                      n3.astype(i32), p3steps,
                      jnp.zeros((), i32), jnp.zeros((), i32),
                      jnp.zeros((), i32)])
    return sec3, meta


# ---------------------------------------------------------------------------
# EXPAND: flat intervals → per-read seed grids
# ---------------------------------------------------------------------------

def _expand_body(fm, ctg_offsets, sec1, n1, sec2, n2, sec3, n3, *, max_occ,
                a_seed, s_cap, n_reads):
    it = fm.L2.dtype
    i32 = jnp.int32
    N = n_reads
    S = s_cap
    e1, e2w, e3 = sec1.shape[1], sec2.shape[1], sec3.shape[1]
    read = jnp.concatenate([sec1[0], sec2[0], sec3[0]])
    s = jnp.concatenate([sec1[1], sec2[1], sec3[1]])
    e = jnp.concatenate([sec1[2], sec2[2], sec3[2]])
    x0 = jnp.concatenate([sec1[3], sec2[3], sec3[3]])
    x2 = jnp.concatenate([sec1[4], sec2[4], sec3[4]])
    A = read.shape[0]
    lane = jnp.arange(A, dtype=i32)
    valid = jnp.where(lane < e1, lane < n1,
                      jnp.where(lane < e1 + e2w, lane - e1 < n2,
                                lane - e1 - e2w < n3))
    # sort by (read, start, end) — ks_introsort(mem_intv) on info; stable,
    # ties keep pass-1 < pass-2 < pass-3 emission order (seeding_host's
    # np.lexsort equivalent)
    BIGR = jnp.asarray(np.iinfo(np.int64 if it == jnp.int64 else
                                np.int32).max, it)
    readk = jnp.where(valid, read, BIGR)
    readk, s, e, x0, x2, validi = jax.lax.sort(
        (readk, s, e, x0, x2, valid.astype(i32)), num_keys=3,
        is_stable=True)
    valid = validi != 0
    read = jnp.where(valid, readk, 0).astype(i32)

    # ---- occurrence sampling (mem_chain loop, bwamem.c:280-307) ----
    counts = jnp.where(valid, jnp.minimum(x2, max_occ), 0).astype(it)
    cum = jnp.cumsum(counts)
    total = cum[-1]
    seed_arena_over = total > a_seed
    slots = jnp.arange(a_seed, dtype=it)
    own = jnp.searchsorted(cum, slots, side="right").astype(i32)
    ownc = jnp.clip(own, 0, A - 1)
    prev = jnp.where(ownc > 0, cum[jnp.maximum(ownc - 1, 0)],
                     jnp.zeros((), it))
    k_within = slots - prev
    x0o = x0[ownc]
    x2o = x2[ownc]
    step = jnp.where(x2o > max_occ, x2o // max_occ, 1)
    svalid = slots < total
    rank = jnp.where(svalid, x0o + k_within * step, 0).astype(it)
    rbeg = fmops.sa_lookup(fm, rank)
    sread = jnp.where(svalid, read[ownc], N).astype(i32)
    qbeg = jnp.where(svalid, s[ownc], 0).astype(i32)
    slen = jnp.where(svalid, (e - s)[ownc], 0).astype(i32)
    rid = fmops.intv2rid(fm, ctg_offsets, rbeg, rbeg + slen)
    svalid = svalid & (rid >= 0)

    # per-read slot among valid seeds (invalid-rid seeds dropped BEFORE slot
    # assignment, matching seeding_host.front_half)
    csum = jnp.cumsum(svalid.astype(i32))
    seed_cnt = jnp.zeros((N,), i32).at[sread].add(svalid.astype(i32),
                                                  mode="drop")
    read_base = jnp.concatenate([jnp.zeros((1,), i32),
                                 jnp.cumsum(seed_cnt)[:-1]])
    slot = csum - 1 - read_base[jnp.clip(sread, 0, N - 1)]
    ok = svalid & (slot < S)
    tgt_r = jnp.where(ok, sread, N)
    tgt_s = jnp.where(ok, slot, 0)
    g_qbeg = jnp.zeros((N, S), i32).at[tgt_r, tgt_s].set(qbeg, mode="drop")
    g_len = jnp.zeros((N, S), i32).at[tgt_r, tgt_s].set(slen, mode="drop")
    g_rbeg = jnp.zeros((N, S), it).at[tgt_r, tgt_s].set(rbeg, mode="drop")
    g_rid = jnp.full((N, S), -1, i32).at[tgt_r, tgt_s].set(rid, mode="drop")
    g_valid = jnp.zeros((N, S), bool).at[tgt_r, tgt_s].set(ok, mode="drop")

    # ---- l_rep: union of repetitive intervals (bwamem.c:272-279) ----
    rep = valid & (x2 > max_occ)
    seg_start = jnp.concatenate(
        [jnp.ones((1,), bool), read[1:] != read[:-1]])

    def op(a, b):
        av, af = a
        bv, bf = b
        return jnp.where(bf, bv, jnp.maximum(av, bv)), af | bf

    ends = jnp.where(rep, e, -1)
    run, _ = jax.lax.associative_scan(op, (ends, seg_start))
    prev_end = jnp.concatenate([jnp.full((1,), -1, run.dtype), run[:-1]])
    prev_end = jnp.where(seg_start, -1, prev_end)
    contrib = jnp.where(rep, jnp.maximum(e - jnp.maximum(s, prev_end), 0), 0)
    l_rep = jnp.zeros((N,), it).at[read].add(
        contrib.astype(it), mode="drop")

    seeds = chainops.Seeds(
        rbeg=g_rbeg, qbeg=g_qbeg, len=g_len, rid=g_rid, valid=g_valid,
        frac_rep=l_rep.astype(jnp.float32),
        overflow=seed_cnt > S)
    cap31 = jnp.asarray(2**31 - 1, it)
    meta = jnp.stack([seed_arena_over.astype(i32),
                      jnp.minimum(total, cap31).astype(i32),
                      seed_cnt.max(), jnp.zeros((), i32),
                      jnp.zeros((), i32), jnp.zeros((), i32),
                      jnp.zeros((), i32), jnp.zeros((), i32)])
    return seeds, seed_cnt, l_rep, meta


# ---------------------------------------------------------------------------
# CHAIN: lockstep chaining + weights + windows + compact arenas
# ---------------------------------------------------------------------------

def _chain_body(fm, ctg_offsets, ctg_is_alt, seeds, l_seq, *, w,
               max_chain_gap, chain_cap, a_ch, a_it, min_chain_weight,
               a, o_del, e_del, o_ins, e_ins):
    i32 = jnp.int32
    it = seeds.rbeg.dtype
    N, S = seeds.qbeg.shape
    C = chain_cap
    ch = chainops.chain_seeds(seeds, ctg_is_alt, fm.l_pac, w=w,
                              max_chain_gap=max_chain_gap, chain_cap=C)
    wt = chainops.chain_weights(seeds, ch)
    rmax0, rmax1 = align_ext.chain_rmax(
        seeds, ch, l_seq, fm, ctg_offsets,
        a=a, o_del=o_del, e_del=e_del, o_ins=o_ins, e_ins=e_ins, w=w)
    # compact per-chain arena in (read-major, creation order) — the host
    # replays mem_chain_flt's exact B-tree traversal + introsort from it
    rows_c = jnp.broadcast_to(jnp.arange(N, dtype=i32)[:, None], (N, C))
    slots_c = jnp.broadcast_to(jnp.arange(C, dtype=i32)[None, :], (N, C))
    cmask = (slots_c < ch.n[:, None]).reshape(-1)
    beg = ch.first_qbeg
    end = ch.last_qbeg + ch.last_len
    pk_rid_alt = (ch.rid.astype(i32) << 1) | ch.is_alt.astype(i32)
    (c_read, c_w, c_beg, c_end, c_ra), n_ch, ch_arena_over, _ = \
        _compact_flat(cmask, [(rows_c, i32), (wt, i32), (beg, i32),
                              (end, i32), (pk_rid_alt, i32)], a_ch)
    (c_pos,), _, _, _ = _compact_flat(cmask, [(ch.pos, it)], a_ch)
    chain32 = jnp.stack([c_read, c_w, c_beg, c_end, c_ra])

    # ---- work items: every valid seed of every heavy chain ----
    sc = ch.seed_chain
    scc = jnp.clip(sc, 0, C - 1)
    heavy = jnp.take_along_axis(wt, scc, axis=1) >= min_chain_weight
    imask = (sc >= 0) & heavy & seeds.valid
    rows_s = jnp.broadcast_to(jnp.arange(N, dtype=i32)[:, None], (N, S))
    slots_s = jnp.broadcast_to(jnp.arange(S, dtype=i32)[None, :], (N, S))
    i_rmax0 = jnp.take_along_axis(rmax0, scc, axis=1)
    i_rmax1 = jnp.take_along_axis(rmax1, scc, axis=1)
    (i_read, i_slot, i_chain, i_qbeg, i_len), n_it, it_over, _ = \
        _compact_flat(imask.reshape(-1),
                      [(rows_s, i32), (slots_s, i32), (sc, i32),
                       (seeds.qbeg, i32), (seeds.len, i32)], a_it)
    (i_rbeg, i_r0, i_r1), _, _, _ = _compact_flat(
        imask.reshape(-1), [(seeds.rbeg, it), (i_rmax0, it), (i_rmax1, it)],
        a_it)
    # largest extension window over the items: sizes the NEXT batch's
    # static t_max (host checks the CURRENT batch didn't exceed it)
    tl = jnp.where(imask & (seeds.qbeg > 0), seeds.rbeg - i_rmax0, 0)
    qe = seeds.qbeg + seeds.len
    tr = jnp.where(imask & (qe < l_seq[:, None]),
                   i_rmax1 - (seeds.rbeg + seeds.len), 0)
    t_span = jnp.maximum(tl.max(), tr.max()).astype(i32)
    meta = jnp.stack([ch.overflow.any().astype(i32),
                      ch_arena_over.astype(i32), it_over.astype(i32),
                      n_ch.astype(i32), n_it.astype(i32),
                      ch.n.max().astype(i32), t_span,
                      jnp.zeros((), i32)])
    items32 = jnp.stack([i_read, i_slot, i_chain, i_qbeg, i_len])
    items_it = jnp.stack([i_rbeg, i_r0, i_r1])
    return ch.seed_chain, items32, items_it, chain32, c_pos, meta


# ---------------------------------------------------------------------------
# EXT: speculative fused extension of all work items + seedcov
# ---------------------------------------------------------------------------

def _qt_blocks(pac, l_pac, seqbatch, lane_read, q_start, q_sign, qlen,
               t_start, t_sign, tlen, *, lq_max, t_max):
    """[LQ, B] query and [LT, B] target nt4 blocks from the device-resident
    read batch + packed reference (extend_host._qt_blocks_dev semantics).

    Layout: everything is computed LANE-MAJOR ([B, L*]) then transposed —
    each lane's positions are consecutive, so the seq/pac gathers hit
    contiguous memory per row (the [L*, B] formulation made every adjacent
    gathered element a different read/ref location).  Index arithmetic runs
    in the index dtype (i32 for sub-2^31 genomes) — this backend emulates
    int64 vector ops as i32 pairs."""
    i32 = jnp.int32
    it = t_start.dtype
    L = seqbatch.shape[1]
    j = jnp.arange(lq_max, dtype=i32)[None, :]
    qidx = q_start.astype(i32)[:, None] + q_sign[:, None] * j
    q = jnp.take_along_axis(
        seqbatch[lane_read].astype(i32), jnp.clip(qidx, 0, L - 1), axis=1)
    q = jnp.where(j < qlen[:, None], q, 4)
    ti = jnp.arange(t_max, dtype=it)[None, :]
    pos = jnp.clip(t_start[:, None] + t_sign[:, None].astype(it) * ti,
                   0, 2 * l_pac - 1)
    is_rev = pos >= l_pac
    fpos = jnp.where(is_rev, 2 * l_pac - 1 - pos, pos)
    word = pac[(fpos >> 4).astype(i32)]
    fp32 = fpos.astype(i32)
    byte = (word >> (((fp32 & 15) >> 2) << 3).astype(jnp.uint32)) & 0xFF
    b = (byte >> (((3 - (fp32 & 3)) << 1).astype(jnp.uint32))) & 3
    b = jnp.where(is_rev, 3 - b.astype(i32), b.astype(i32))
    t = jnp.where(ti < tlen[:, None], b, 4)
    return q.T, t.T


def _ext_kernel(qT, qlen, tT, tlen, h0, eb, *, w_opt, lq_max, t_max, use_pl,
                interpret, **kw):
    if use_pl:
        from bwamem_tpu.ops import pallas_ext
        return pallas_ext.extend_batch_pl2(
            qT, qlen, tT, tlen, h0, eb, lq_max=lq_max, t_max=t_max,
            w_opt=w_opt, interpret=interpret, **kw)
    # XLA fallback (CPU tests / non-Mosaic backends): ops/extend.extend_batch
    # + the two-pass band-doubling retry of bwamem.c:732-741
    from bwamem_tpu.ops import extend as extops
    i32 = jnp.int32
    B = qlen.shape[0]
    mat = np.frombuffer(kw["mat_bytes"], np.int8).reshape(5, 5)
    query = qT.T.astype(jnp.uint8)

    def target_at(i):
        return jax.lax.dynamic_index_in_dim(
            tT, jnp.minimum(i, t_max - 1), axis=0, keepdims=False)

    kw2 = dict(mat=mat, o_del=kw["o_del"], e_del=kw["e_del"],
               o_ins=kw["o_ins"], e_ins=kw["e_ins"], zdrop=kw["zdrop"],
               t_max=t_max)
    w1 = jnp.full((B,), w_opt, i32)
    r1 = extops.extend_batch(query, qlen, target_at, tlen, h0, w1, eb, **kw2)
    retry = ((r1.max_off >= ((w_opt >> 1) + (w_opt >> 2)))
             & (r1.score != h0) & (qlen > 0))
    w2 = jnp.where(retry, w_opt * 2, w_opt).astype(i32)
    r2 = extops.extend_batch(query, qlen, target_at, tlen, h0, w2, eb, **kw2)
    res = jax.tree.map(lambda b_, a_: jnp.where(retry, b_, a_), r2, r1)
    return res, retry.astype(i32)


def _ext_core(fm, seq, l_seq, seed_chain, seeds_valid, seeds_qbeg, seeds_len,
              seeds_rbeg, iv, *, lq_max, t_max, mat_bytes,
              o_del, e_del, o_ins, e_ins, zdrop, w_opt, a, pen_clip5,
              pen_clip3, interpret=False, use_pl=True):
    """Fused left+right extension for a vector of work items + per-item
    seedcov (mem_chain2aln extension body, bwamem.c:717-786).  Returns the
    14 per-item result vectors in the INPUT item order."""
    i_read, i_slot, i_chain, i_qbeg, i_len, i_rbeg, i_r0, i_r1 = iv
    i32 = jnp.int32
    it = seeds_rbeg.dtype
    B = i_read.shape[0]

    # Sort the items by their extension-window size: each 128-lane kernel
    # tile's while loop exits when all of ITS lanes finish, so grouping
    # similar target lengths lets short tiles retire after ~their own tlen
    # steps instead of the batch max (the reference gets the same effect
    # from its w*rlen DeviceRadixSort before global SW,
    # cuda/bwamem_GPU.cu:3811-3824).  Outputs are unsorted at the end; the
    # two extra multi-operand sorts are ~free on this backend next to the
    # per-step cost they remove.
    ls_l = l_seq[jnp.clip(i_read, 0, l_seq.shape[0] - 1)].astype(i32)
    klen_l = jnp.where(i_qbeg > 0, i_rbeg - i_r0, 0).astype(i32)
    klen_r = jnp.where(i_qbeg + i_len < ls_l,
                       (i_r1 - (i_rbeg + i_len)).astype(i32), 0)
    skey = jnp.maximum(klen_l, klen_r)
    pos0 = jnp.arange(B, dtype=i32)
    (_, pos_s, i_read, i_slot, i_chain, i_qbeg, i_len, i_rbeg, i_r0,
     i_r1) = jax.lax.sort(
        (skey, pos0, i_read, i_slot, i_chain, i_qbeg, i_len, i_rbeg,
         i_r0, i_r1), num_keys=1)
    kw = dict(mat_bytes=mat_bytes, o_del=o_del, e_del=e_del, o_ins=o_ins,
              e_ins=e_ins, zdrop=zdrop)
    kker = dict(w_opt=w_opt, lq_max=lq_max, t_max=t_max, use_pl=use_pl,
                interpret=interpret, **kw)
    neg1 = jnp.full((B,), -1, i32)
    pos1 = jnp.ones((B,), i32)
    l_seq_i = l_seq[jnp.clip(i_read, 0, l_seq.shape[0] - 1)].astype(i32)

    # ---- left: reversed prefix vs [rmax0, rbeg) reversed ----
    qlen_l = i_qbeg.astype(i32)
    tlen_l = jnp.where(i_qbeg > 0, i_rbeg - i_r0, 0).astype(i32)
    h0_l = jnp.maximum(i_len * a, 1).astype(i32)
    qT, tT = _qt_blocks(fm.pac, fm.l_pac, seq, i_read, i_qbeg - 1, neg1,
                        qlen_l, i_rbeg - 1, neg1, tlen_l,
                        lq_max=lq_max, t_max=t_max)
    eb5 = jnp.full((B,), pen_clip5, i32)
    L, retL = _ext_kernel(qT, qlen_l, tT, tlen_l, h0_l, eb5, **kker)
    score_l = jnp.where(qlen_l > 0, L.score, (i_len * a).astype(i32))
    sc0 = jnp.maximum(score_l, 1)

    # ---- right: suffix vs [rbeg + len, rmax1) ----
    s_qe = i_qbeg + i_len
    qlen_r = (l_seq_i - s_qe).astype(i32)
    tlen_r = jnp.where(s_qe < l_seq_i,
                       (i_r1 - (i_rbeg + i_len)).astype(i32), 0)
    qT, tT = _qt_blocks(fm.pac, fm.l_pac, seq, i_read, s_qe, pos1,
                        qlen_r, i_rbeg + i_len, pos1, tlen_r,
                        lq_max=lq_max, t_max=t_max)
    eb3 = jnp.full((B,), pen_clip3, i32)
    R, retR = _ext_kernel(qT, qlen_r, tT, tlen_r, sc0, eb3, **kker)

    # ---- endpoint selection (bwamem.c:744-779) ----
    has_left = qlen_l > 0
    loc_l = (L.gscore <= 0) | (L.gscore <= L.score - pen_clip5)
    n_qb = jnp.where(has_left & loc_l, i_qbeg - L.qle, 0)
    n_rb = jnp.where(has_left,
                     jnp.where(loc_l, i_rbeg - L.tle, i_rbeg - L.gtle),
                     i_rbeg)
    truesc_l = jnp.where(has_left,
                         jnp.where(loc_l, L.score, L.gscore),
                         (i_len * a).astype(i32))
    has_right = s_qe < l_seq_i
    loc_r = (R.gscore <= 0) | (R.gscore <= R.score - pen_clip3)
    score_f = jnp.where(has_right, R.score, score_l)
    n_qe = jnp.where(has_right & loc_r, s_qe + R.qle, l_seq_i)
    n_re = jnp.where(has_right,
                     jnp.where(loc_r, i_rbeg + i_len + R.tle,
                               i_rbeg + i_len + R.gtle),
                     i_rbeg + i_len)
    truesc_f = truesc_l + jnp.where(
        has_right, jnp.where(loc_r, R.score - sc0, R.gscore - sc0), 0)
    aw0 = jnp.where(has_left & (retL != 0), w_opt * 2, w_opt)
    aw1 = jnp.where(has_right & (retR != 0), w_opt * 2, w_opt)
    n_w = jnp.maximum(aw0, aw1).astype(i32)

    # ---- seedcov (bwamem.c:781-786) ----
    rr = jnp.clip(i_read, 0, seeds_qbeg.shape[0] - 1)
    sd_qb = seeds_qbeg[rr]                        # [B, S]
    sd_len = seeds_len[rr]
    sd_rb = seeds_rbeg[rr]
    in_ch = seeds_valid[rr] & (seed_chain[rr] == i_chain[:, None])
    cov = (in_ch & (sd_qb >= n_qb[:, None])
           & (sd_qb + sd_len <= n_qe[:, None])
           & (sd_rb >= n_rb[:, None].astype(it))
           & (sd_rb + sd_len <= n_re[:, None].astype(it)))
    seedcov = jnp.where(cov, sd_len, 0).sum(axis=1, dtype=i32)

    # restore the input item order (one multi-operand sort keyed on the
    # pre-sort position)
    (_, i_read, i_slot, i_chain, i_qbeg, i_len, n_qb, n_qe, score_f,
     truesc_f, n_w, seedcov, i_rbeg, n_rb, n_re) = jax.lax.sort(
        (pos_s, i_read, i_slot, i_chain, i_qbeg, i_len, n_qb, n_qe,
         score_f, truesc_f, n_w, seedcov, i_rbeg, n_rb.astype(it),
         n_re.astype(it)), num_keys=1)
    return (i_read, i_slot, i_chain, i_qbeg, i_len, n_qb.astype(i32),
            n_qe.astype(i32), score_f, truesc_f, n_w, seedcov,
            i_rbeg, n_rb, n_re)


def _ext_body(fm, seq, l_seq, seed_chain, seeds_valid, seeds_qbeg, seeds_len,
              seeds_rbeg, items32, items_it, n_item, *, lq_max, t_max,
              mat_bytes, o_del, e_del, o_ins, e_ins, zdrop, w_opt, a,
              pen_clip5, pen_clip3, sel_cap=0, c_cap=0, interpret=False,
              use_pl=True):
    """EXT program: speculative fused extension over the flat item arena.

    sel_cap == 0: every lane extends (single-round mode; also the round-2
    program over a host-built item subset).  Output row 11 (has-result) is
    all ones.

    sel_cap > 0: TWO-ROUND mode, round 1 — only the srt-first work item of
    each (read, chain) group extends (the item the sequential accept/skip
    walk, bwamem.c:669-676 DESC srt order, processes first; its region is
    what the walk's containment skip test consults for the rest of the
    chain, so extending it first lets the host prepass kill ~half the
    remaining items before they ever reach the kernel — the measured
    round-5 waste split: 56.4% of speculative items die in that walk).
    The selection compacts to a `sel_cap`-lane arena; results scatter back
    to the full arena with row 11 marking which items have results.  If
    more than sel_cap groups exist the excess chains simply get no round-1
    result — the host prepass then routes ALL their items to round 2,
    which is correct (just less selective), so truncation needs no retry.

    Returns (out32 [12, A] i32, out_it [3, A] index-typed, m6 [8] i32
    meta; m6[0] = selected-group count for a_sel hwm tracking)."""
    i_read, i_slot, i_chain, i_qbeg, i_len = (items32[k] for k in range(5))
    i_rbeg, i_r0, i_r1 = (items_it[k] for k in range(3))
    i32 = jnp.int32
    A = i_read.shape[0]
    kcore = dict(lq_max=lq_max, t_max=t_max, mat_bytes=mat_bytes,
                 o_del=o_del, e_del=e_del, o_ins=o_ins, e_ins=e_ins,
                 zdrop=zdrop, w_opt=w_opt, a=a, pen_clip5=pen_clip5,
                 pen_clip3=pen_clip3, interpret=interpret, use_pl=use_pl)
    if sel_cap == 0:
        r = _ext_core(fm, seq, l_seq, seed_chain, seeds_valid, seeds_qbeg,
                      seeds_len, seeds_rbeg,
                      (i_read, i_slot, i_chain, i_qbeg, i_len, i_rbeg,
                       i_r0, i_r1), **kcore)
        out32 = jnp.stack(list(r[:11]) + [jnp.ones((A,), i32)])
        out_it = jnp.stack([r[11], r[12], r[13]])
        return out32, out_it, jnp.zeros((8,), i32)

    # ---- round-1 selection: srt-first item per (read, chain) ----
    posA = jnp.arange(A, dtype=i32)
    valid = posA < n_item
    NG = l_seq.shape[0] * c_cap
    gid = jnp.where(valid,
                    i_read * c_cap + jnp.clip(i_chain, 0, c_cap - 1), NG)
    # srt walks (len desc, insertion idx desc); within a read the arena is
    # in insertion (m asc) order, so (len, global pos) max = the first item
    pk = (i_len.astype(jnp.int64) << 32) | posA.astype(jnp.int64)
    gmax = jnp.full((NG + 1,), -1, jnp.int64).at[gid].max(pk)
    is_first = valid & (gmax[gid] == pk)
    n_sel = is_first.astype(i32).sum(dtype=i32)
    skey = jnp.where(is_first, 0, 1).astype(i32)
    (sk_s, sel_pos, s_read, s_slot, s_chain, s_qbeg, s_len, s_rbeg, s_r0,
     s_r1) = jax.lax.sort(
        (skey, posA, i_read, i_slot, i_chain, i_qbeg, i_len, i_rbeg,
         i_r0, i_r1), num_keys=2)
    sk_s, sel_pos = sk_s[:sel_cap], sel_pos[:sel_cap]
    has_lane = sk_s == 0
    # pad/unselected lanes: zero both extension windows so their kernel
    # tiles retire immediately (they sort to the cheap end anyway)
    s_qbeg = jnp.where(has_lane, s_qbeg[:sel_cap], 0)
    s_len = jnp.where(has_lane, s_len[:sel_cap], 0)
    s_rbeg = s_rbeg[:sel_cap]
    s_r0 = jnp.where(has_lane, s_r0[:sel_cap], s_rbeg)
    s_r1 = jnp.where(has_lane, s_r1[:sel_cap], s_rbeg)
    r = _ext_core(fm, seq, l_seq, seed_chain, seeds_valid, seeds_qbeg,
                  seeds_len, seeds_rbeg,
                  (s_read[:sel_cap], s_slot[:sel_cap], s_chain[:sel_cap],
                   s_qbeg, s_len, s_rbeg, s_r0, s_r1), **kcore)
    tgt = jnp.where(has_lane, sel_pos, A)

    def back(x):
        return jnp.zeros((A,), x.dtype).at[tgt].set(x, mode="drop")

    has_row = jnp.zeros((A,), i32).at[tgt].set(1, mode="drop")
    # identity rows keep the FULL arena values — the host walk reads the
    # seed fields of every item, extended or not.  Result-less lanes keep
    # their INPUT windows (rmax0/rmax1) in rows 1-2: that is exactly what
    # the round-2 dispatch needs back (the walk itself only ever reads
    # rows 1-2 of EMITTED items, which always carry results).
    hasb = has_row.astype(bool)
    out32 = jnp.stack([i_read, i_slot, i_chain, i_qbeg, i_len,
                       back(r[5]), back(r[6]), back(r[7]), back(r[8]),
                       back(r[9]), back(r[10]), has_row])
    out_it = jnp.stack([i_rbeg,
                        jnp.where(hasb, back(r[12]), i_r0),
                        jnp.where(hasb, back(r[13]), i_r1)])
    m6 = jnp.zeros((8,), i32).at[0].set(n_sel)
    return out32, out_it, m6


# single-chip jitted entry points (the mesh path shard-maps the raw bodies)
_p1_jit = functools.partial(jax.jit, static_argnames=(
    "cap", "kmax", "emax", "min_seed_len", "use_kmer", "b1s",
    "t1s"))(_p1_body)
_p2_jit = functools.partial(jax.jit, static_argnames=(
    "pmax", "cand2", "k2max", "e2max", "min_seed_len", "split_len",
    "split_width", "b2s", "t2s"))(_p2_body)
_p3_jit = functools.partial(jax.jit, static_argnames=(
    "p3cap", "e3max", "min_seed_len", "max_mem_intv", "use_kmer",
    "t3s"))(_p3_body)
_expand_jit = functools.partial(jax.jit, static_argnames=(
    "max_occ", "a_seed", "s_cap", "n_reads"))(_expand_body)
_chain_jit = functools.partial(jax.jit, static_argnames=(
    "w", "max_chain_gap", "chain_cap", "a_ch", "a_it", "min_chain_weight",
    "o_del", "e_del", "o_ins", "e_ins", "a"))(_chain_body)
_ext_jit = functools.partial(jax.jit, static_argnames=(
    "lq_max", "t_max", "mat_bytes", "o_del", "e_del", "o_ins", "e_ins",
    "zdrop", "w_opt", "a", "pen_clip5", "pen_clip3", "sel_cap", "c_cap",
    "interpret", "use_pl"))(_ext_body)


# ---------------------------------------------------------------------------
# Mesh (multi-chip) dispatch: the same six programs shard-mapped over a
# data-parallel mesh — reads sharded on their leading axis, the FM index
# replicated on every chip, every arena shard-local (parallel/mesh AXIS
# model; reference analog: one aligner instance per GPU with a per-GPU
# index copy, cuda/streams.cu:16-104,307-318).  Per-shard metas come back
# stacked [8, n_shards]; front_finish combines them (bitwise-OR for flag
# slots, max elsewhere) and merges the per-shard arenas into the global
# read-major layout the host replay expects.
# ---------------------------------------------------------------------------

def _p1_mesh(fm, seq, l_seq, **kw):
    sec1, m1 = _p1_body(fm, seq, l_seq, **kw)
    return sec1, m1[:, None]


def _p2_mesh(fm, seq, l_seq, sec1, m1, **kw):
    sec2, m2 = _p2_body(fm, seq, l_seq, sec1, m1[0, 0], **kw)
    return sec2, m2[:, None]


def _p3_mesh(fm, seq, l_seq, **kw):
    sec3, m3 = _p3_body(fm, seq, l_seq, **kw)
    return sec3, m3[:, None]


def _expand_mesh(fm, ctg_offsets, sec1, m1, sec2, m2, sec3, m3, **kw):
    seeds, seed_cnt, l_rep, m4 = _expand_body(
        fm, ctg_offsets, sec1, m1[0, 0], sec2, m2[0, 0], sec3, m3[0, 0],
        **kw)
    return seeds, seed_cnt, l_rep, m4[:, None]


def _chain_mesh(fm, ctg_offsets, ctg_is_alt, seeds, l_seq, **kw):
    seed_chain, items32, items_it, chain32, c_pos, m5 = _chain_body(
        fm, ctg_offsets, ctg_is_alt, seeds, l_seq, **kw)
    return (seed_chain, items32, items_it, chain32, c_pos[None, :],
            m5[:, None])


def _ext_mesh(fm, seq, l_seq, seed_chain, seeds_valid, seeds_qbeg,
              seeds_len, seeds_rbeg, items32, items_it, **kw):
    # mesh keeps single-round extension (sel_cap=0): the two-round driver's
    # mid-batch host prepass would serialize per-shard round trips
    out32, out_it, m6 = _ext_body(
        fm, seq, l_seq, seed_chain, seeds_valid, seeds_qbeg,
        seeds_len, seeds_rbeg, items32, items_it,
        jnp.zeros((), jnp.int32), sel_cap=0, c_cap=0, **kw)
    return out32, out_it, m6[:, None]


# ---------------------------------------------------------------------------
# Host driver
# ---------------------------------------------------------------------------

_GROW1 = ("cap", "kmax", "emax")
_GROW2 = ("pmax", "cand2", "k2max", "e2max")  # bits 3..6 of p2 flags
_GROW3 = ("p3cap", "e3max")                   # bits 7..8 of p3 flags
_GROWB = ("b1s", "b2s")                       # bits 9..10: back-ext ladders
_GROWT = ("t1s", "t2s", "t3s")                # bits 11..13: scan trip counts


def _hist_path(al) -> str | None:
    """On-disk location of the arena high-water history.  Compiles on this
    backend cost ~60s per program, and every arena growth is a new static
    shape — so the grow-and-retry walk from cold defaults costs MINUTES per
    process.  Persisting the converged sizes beside the XLA compilation
    cache makes every later process start at the final shapes and hit the
    persistent executable cache directly."""
    d = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if not d:
        return None
    # host-side index metadata only: materializing fm.* device scalars
    # here would enqueue a D2H behind whatever is in flight on the stream
    # (a hidden sync — the class of bug behind the round-4 stream wedge)
    fp = (f"{int(al.idx.seq_len)}-{int(al.idx.primary)}-"
          f"{len(al.ctg_names)}-{jax.default_backend()}")
    return os.path.join(d, f"front_hwm_{fp}.json")


def _hist_load(al) -> dict:
    hist = {}
    path = _hist_path(al)
    if path and os.path.exists(path):
        try:
            with open(path) as f:
                for k, v in json.load(f).items():
                    parts = k.split(":")
                    if len(parts) != 3:     # legacy N-only keys: discard —
                        continue            # they mix read-length classes
                    name, n, lr = parts
                    hist[("hwm", name, (int(n), int(lr)))] = int(v)
        except Exception:
            pass
    return hist


def _hist_save(al, hist: dict) -> None:
    path = _hist_path(al)
    if not path:
        return
    try:
        data = {f"{k[1]}:{k[2][0]}:{k[2][1]}": int(v)
                for k, v in hist.items()
                if isinstance(k, tuple) and k[0] == "hwm"}
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path))
        with os.fdopen(fd, "w") as f:
            json.dump(data, f)
        os.replace(tmp, path)
    except Exception:
        pass


def _sizes_for(al, N: int, Lr: int):
    """Arena sizes from the per-aligner high-water history (25% headroom),
    falling back to shape-scaled defaults on the first batch."""
    hist = getattr(al, "_front_hist", None)
    if hist is None:
        hist = al._front_hist = _hist_load(al)
    defaults = {
        "cap": 2 * Lr,
        "kmax": _bucket(N * 16, lo=1024),
        "emax": _bucket(N * 8, lo=1024),
        "pmax": _bucket(N * 2, lo=256),
        "cand2": 48,
        "k2max": _bucket(N * 8, lo=1024),
        "e2max": _bucket(N * 4, lo=1024),
        "p3cap": 32,
        "e3max": _bucket(N * 2, lo=1024),
        "a_seed": _bucket(N * 8, lo=1024),
        "s_cap": 64,
        "a_ch": _bucket(N * 4, lo=1024),
        "a_it": _bucket(N * 8, lo=1024),
        "a_sel": _bucket(N * 2, lo=1024),
        "b1s": _bucket(N * 8, lo=1024),
        "b2s": _bucket(N * 4, lo=1024),
    }
    # scan trip counts (fori_loop static trips; see ops/smem forward_scan):
    # bucketed to multiples of 32, not powers of two — a trip count only
    # scales time, not memory, so fine granularity avoids 2x overshoot
    defaults["t1s"] = -(-(Lr + (Lr >> 1) + 24) // 32) * 32
    defaults["t2s"] = -(-(Lr + 8) // 32) * 32
    defaults["t3s"] = defaults["t1s"]
    floors = {"cap": 64, "kmax": 1024, "emax": 1024, "pmax": 256,
              "cand2": 16, "k2max": 1024, "e2max": 1024, "p3cap": 16,
              "e3max": 1024, "a_seed": 1024, "s_cap": 16, "a_ch": 1024,
              "a_it": 1024, "a_sel": 1024, "b1s": 1024, "b2s": 1024,
              "t1s": 32, "t2s": 32, "t3s": 32}
    sizes = {}
    for k, d in defaults.items():
        h = hist.get(("hwm", k, (N, Lr)))
        if h is None:
            sizes[k] = d
        elif k in _GROWT:
            sizes[k] = max(-(-(int(h) + (int(h) >> 3) + 1) // 32) * 32,
                           floors[k])
        else:
            sizes[k] = _bucket(int(h + (h >> 2) + 1), lo=floors[k])
    return hist, sizes


def _note_hwm(hist, N, **vals):
    changed = False
    for k, v in vals.items():
        key = ("hwm", k, N)
        if int(v) > hist.get(key, 0):
            hist[key] = int(v)
            changed = True
    return changed


def gate_rows(opt: MemOptions, reads) -> set:
    """Rows entering mem_flt_chained_seeds (bwamem.c:607-611) — long reads
    whose seed re-scoring mutates the work order; they keep the host path."""
    rows = set()
    for i, r in enumerate(reads):
        L = r.l_seq
        if L <= 0:
            continue
        min_l = (chainflt_host.MEM_HSP_COEF * opt.min_chain_weight
                 if opt.min_chain_weight
                 else chainflt_host.MEM_MINSC_COEF * math.log(L))
        if min_l <= chainflt_host.MEM_SEEDSW_COEF * L:
            rows.add(i)
    return rows


def _mesh_nsh(al) -> int:
    mesh = getattr(al, "mesh", None)
    return 1 if mesh is None else int(mesh.devices.size)


def supported(al, reads) -> bool:
    """Whether this batch can take the device front (the host-compacted
    path remains for pathological score ranges).  Under a mesh the six
    programs run shard-mapped (see _dispatch_mesh)."""
    nsh = _mesh_nsh(al)
    if nsh > 1 and _bucket(len(reads), lo=8) < nsh:
        return False
    mat_max = int(np.max(np.asarray(al.opt.mat)))
    Lr = max((r.l_seq for r in reads), default=0)
    # the (h<<12)|col packing of both extension kernels needs every
    # reachable score < 2^18 (extend_host enforces the same bound)
    return 2 * Lr * max(al.opt.a, mat_max) < (1 << 18)


def front_start(al, reads, seq: np.ndarray, l_seq: np.ndarray):
    """Dispatch the device front for a batch WITHOUT fetching: packs + H2D,
    enqueues the 6-program chain, starts the D2H copies, and returns an
    opaque token for front_finish.  The split lets align_stream enqueue
    batch k+1's front while the host finalizes batch k (the reference's
    input/compute/output overlap, cuda/minibatch_process.cpp:196-208,
    recast as async dispatch on one device stream)."""
    opt: MemOptions = al.opt
    n = len(reads)
    N, Lr = seq.shape
    nsh = _mesh_nsh(al)
    Nkey = (N // nsh, Lr)     # (per-shard rows, read-len bucket) hwm key
    hist, sizes = _sizes_for(al, Nkey[0], Lr)
    use_kmer = (al.fm.kmer is not None
                and getattr(opt, "use_kmer_table", True)
                and opt.min_seed_len >= smemops.KMER_K)
    # two-round extension (round-1 select + host prepass + round-2 subset)
    # needs the native walk and a single chip; sel_cap == 0 keeps the
    # single-round program
    from bwamem_tpu import native as _native
    if (os.environ.get("BWAMEM_TPU_EXT2", "1") != "1" or nsh > 1
            or not _native.available()):
        sizes["a_sel"] = 0

    # long reads that enter mem_flt_chained_seeds (bwamem.c:607-611) keep
    # the host path: seed re-scoring mutates the work order
    fallback = gate_rows(opt, reads)
    if len(fallback) * 2 >= max(n, 1):
        # mostly long-read batch: dispatching the device front first would
        # just burn device time (and giant-shape compiles) on rows that all
        # fall back anyway
        return dict(abort=True, n=n)

    seq_dev = jnp.asarray(seq)
    l_dev = jnp.asarray(l_seq)
    timers.add_bytes("h2d.front_seq", seq.nbytes)

    # extension-window rows: hwm-sized (the device reports each batch's true
    # max span, m5[6]); the first batch uses the conservative chain-span
    # bound L + w + 2*cal_max_gap_bound (bwamem.c:648-666 windows over
    # test_and_merge-compatible seeds, |x-y| <= w)
    h_ts = hist.get(("hwm", "t_span", Nkey))
    gmax = min(max((Lr * opt.a - min(opt.o_del, opt.o_ins))
                   // min(opt.e_del, opt.e_ins) + 1, 1), 2 * opt.w)
    bound = Lr + opt.w + 2 * gmax + 8
    sizes["t_span"] = _bucket(min(int(h_ts + (h_ts >> 3) + 1), bound),
                              lo=128) if h_ts is not None \
        else _bucket(bound, lo=128)

    with timers.section("front.dispatch"):
        *arrs, ext2ctx = _dispatch(al, seq_dev, l_dev, sizes, use_kmer,
                                   N, Lr)
        arrs = tuple(arrs)
        if os.environ.get("BWAMEM_TPU_ASYNC_D2H") == "1":
            # Speculative D2H starts save ~100ms/batch on a healthy
            # transport, but ~12 queued copy requests behind a 6-program
            # chain can stall this tunnel for many minutes (round-5
            # bisect: the same chain runs in seconds when copies are
            # requested one stage at a time).  Off by default.
            for arr in arrs:
                try:
                    arr.copy_to_host_async()
                except Exception:
                    pass
    return dict(abort=False, reads=reads, n=n, N=N, Lr=Lr, hist=hist,
                sizes=sizes, use_kmer=use_kmer, fallback=fallback,
                seq_dev=seq_dev, l_dev=l_dev, arrs=arrs, nsh=nsh,
                Nkey=Nkey, ext2ctx=ext2ctx)


def front_finish(al, tok, _early=None):
    """Fetch + grow-and-retry + exact-filter replay for a front_start token.

    `_early`: callback invoked right BEFORE the blocking fetch — the
    stream driver dispatches the NEXT batch's front there, so the device
    queue drains straight from this batch's programs into the next
    batch's with zero idle (the fetch only waits on THIS batch's
    programs, which are already ahead in the queue).

    Returns (regs_out, fallback_rows): per-read AlnReg lists in
    mem_chain2aln emission order (pre-dedup) for every read NOT in
    fallback_rows; fallback rows (cap overflows, long reads entering
    mem_flt_chained_seeds) must be re-run through the host-compacted path.
    """
    if tok["abort"]:
        n = tok["n"]
        return [[] for _ in range(n)], sorted(range(n))
    reads, n, N, Lr = tok["reads"], tok["n"], tok["N"], tok["Lr"]
    hist, sizes, use_kmer = tok["hist"], tok["sizes"], tok["use_kmer"]
    fallback = tok["fallback"]
    seq_dev, l_dev = tok["seq_dev"], tok["l_dev"]
    nsh, Nkey = tok.get("nsh", 1), tok.get("Nkey", (N, Lr))
    meta_all, out32, out_it, chain32, c_pos, scl = tok["arrs"]

    if _early is not None:
        _early()
    try:
        return _finish_guarded(al, tok, reads, n, N, Lr, hist, sizes,
                               use_kmer, fallback, seq_dev, l_dev, nsh,
                               Nkey, meta_all, out32, out_it, chain32,
                               c_pos, scl)
    except fetchguard.FetchTimeout:
        # Tunnel wedge (round-4 failure mode): abandon this batch's device
        # results, stop using the device front for the rest of the process
        # (the host-compacted front's per-stage round trips have never
        # wedged), and re-run every row through the fallback path.  This is
        # the reference's check-and-bail discipline (errHandler.cuh:7-19)
        # adapted to a transport that hangs instead of erroring.
        al._front_disabled = True
        print("[bwamem_tpu] device front DISABLED after fetch timeout; "
              "re-running batch on the host-compacted front",
              file=sys.stderr, flush=True)
        return [[] for _ in range(n)], sorted(range(n))
    except RuntimeError as e:
        # Bounded-retry bailout (arena growth not converging) or a chain
        # table inconsistency: this batch re-runs on the host front; the
        # device front stays enabled for later batches.
        print(f"[bwamem_tpu] device front bailed for this batch: {e}; "
              "re-running on the host-compacted front", file=sys.stderr,
              flush=True)
        return [[] for _ in range(n)], sorted(range(n))


def _finish_guarded(al, tok, reads, n, N, Lr, hist, sizes, use_kmer,
                    fallback, seq_dev, l_dev, nsh, Nkey, meta_all, out32,
                    out_it, chain32, c_pos, scl):
    # meta slots holding bit-flags (combined across shards with OR; every
    # other slot is a count/hwm and combines with max)
    _FLAG_SLOTS = (1, 9, 17, 24, 32, 33, 34)
    meta_st = None
    retries = 0
    while True:
        with timers.section("front.fetch"):
            if os.environ.get("BWAMEM_TPU_ASYNC_D2H") == "1":
                for arr in (meta_all, out32, out_it, chain32, c_pos, scl):
                    try:
                        arr.copy_to_host_async()
                    except Exception:
                        pass
            _dbg("fetch meta...")
            meta_all = fetchguard.fetch([meta_all],
                                        what="front.meta")[0]
            _dbg("fetch meta done")
            if nsh > 1:
                meta_st = meta_all                      # [48, nsh]
                meta_all = meta_st.max(axis=1)
                for sl in _FLAG_SLOTS:
                    meta_all[sl] = np.bitwise_or.reduce(meta_st[sl])
            m1, m2, m3, m4, m5, m6 = (meta_all[8 * k: 8 * k + 8]
                                      for k in range(6))
            grow = []
            flags = int(m1[1]) | int(m2[1]) | int(m3[1])
            for bit, name in enumerate(_GROW1 + _GROW2 + _GROW3 + _GROWB
                                       + _GROWT):
                if (flags >> bit) & 1:
                    grow.append(name)
            if m4[0]:
                grow.append("a_seed")
            if m5[1]:
                grow.append("a_ch")
            if m5[2]:
                grow.append("a_it")
            if int(m5[6]) > sizes["t_span"]:
                # an extension window exceeded the hwm-sized t_max: results
                # would be silently truncated — grow and rerun
                sizes["t_span"] = _bucket(int(m5[6]), lo=128)
                _note_hwm(hist, Nkey, t_span=m5[6])
                grow.append(None)
            if grow:
                retries += 1
                if retries > 16:
                    # arena growth is not converging (a sizing bug, not a
                    # data property) — bail to the host front for this
                    # batch instead of looping forever (the round-4 "PE
                    # wedge": doubling a clamped ladder base re-ran the
                    # identical program indefinitely)
                    raise RuntimeError(
                        f"front arena growth did not converge: {grow} "
                        f"sizes={sizes}")
                for g in grow:
                    if g is not None:
                        sizes[g] *= 2
                # the back-extend ladders report the exact base width that
                # would have fit (b*_need) — jump straight there instead of
                # doubling through many compiles
                if "b1s" in grow:
                    sizes["b1s"] = max(sizes["b1s"],
                                       _bucket(int(m1[5]) + 1, lo=1024))
                if "b2s" in grow:
                    sizes["b2s"] = max(sizes["b2s"],
                                       _bucket(int(m2[6]) + 1, lo=1024))
                _dbg(f"grow {grow} retry {retries}")
                # DRAIN before re-dispatching: the previous attempt's
                # async D2H copies (started in front_start) are still in
                # flight, and enqueuing a new H2D + 6-program chain while
                # un-fetched copies are pending wedges the tunnel — the
                # round-4 PE hang (cold PE arenas → grow-retry → overlap).
                # Materializing the stale arrays both completes the copies
                # and bounds the wait; they are discarded.
                fetchguard.fetch([out32, out_it, chain32, c_pos, scl],
                                 what="front.drain")
                with timers.section("front.dispatch"):
                    (meta_all, out32, out_it, chain32, c_pos, scl,
                     ext2ctx) = _dispatch(al, seq_dev, l_dev, sizes,
                                          use_kmer, N, Lr)
                    tok["ext2ctx"] = ext2ctx
                continue
            out32, out_it, chain32, c_pos, scl = fetchguard.fetch(
                [out32, out_it, chain32, c_pos, scl], what="front.arenas")
            timers.add_bytes("d2h.front",
                             out32.nbytes + out_it.nbytes + chain32.nbytes
                             + c_pos.nbytes + scl.nbytes + meta_all.nbytes)
        break

    if _note_hwm(hist, Nkey, cap=m1[2], kmax=m1[3], emax=m1[4],
                 pmax=m2[2], cand2=m2[3], k2max=m2[4], e2max=m2[5],
                 p3cap=m3[2], e3max=m3[3],
                 a_seed=m4[1], s_cap=m4[2], a_ch=m5[3], a_it=m5[4],
                 t_span=m5[6], b1s=m1[5], b2s=m2[6],
                 t1s=m1[6], t2s=m2[7], t3s=m3[4], a_sel=m6[0]):
        _hist_save(al, hist)
    if m5[0]:
        raise RuntimeError("chain table overflow with chain_cap == seed cap")

    seed_cnt = scl[0].astype(np.int64)
    l_rep = scl[1]
    if nsh > 1:
        # merge the per-shard arenas into the global read-major layout:
        # shard s holds reads [s*Ns, (s+1)*Ns) with shard-local read ids
        Ns = N // nsh
        a_it = out32.shape[1] // nsh
        a_ch = chain32.shape[1] // nsh
        nit_s = meta_st[36].astype(np.int64)     # m5[4] per shard
        nch_s = meta_st[35].astype(np.int64)     # m5[3] per shard
        I = out32.reshape(out32.shape[0], nsh, a_it)
        T = out_it.reshape(out_it.shape[0], nsh, a_it)
        Cc = chain32.reshape(5, nsh, a_ch)
        Pp = c_pos.reshape(nsh, a_ch)
        i32p, itp, chp, pp = [], [], [], []
        for s in range(nsh):
            ni, nc = int(nit_s[s]), int(nch_s[s])
            blk = I[:, s, :ni].copy()
            blk[0] += s * Ns
            i32p.append(blk)
            itp.append(T[:, s, :ni])
            cb = Cc[:, s, :nc].copy()
            cb[0] += s * Ns
            chp.append(cb)
            pp.append(Pp[s, :nc])
        I32 = np.concatenate(i32p, axis=1)
        IIT = np.concatenate(itp, axis=1)
        CH32 = np.concatenate(chp, axis=1)
        CHPOS = np.concatenate(pp)
    else:
        n_ch, n_it = int(m5[3]), int(m5[4])
        I32 = out32[:, :n_it]
        IIT = out_it[:, :n_it]
        CH32 = chain32[:, :n_ch]
        CHPOS = c_pos[:n_ch]

    for i in np.nonzero(seed_cnt[:n] > sizes["s_cap"])[0]:
        fallback.add(int(i))

    # ---- two-round extension: prepass -> round-2 subset -> final walk ----
    ext2ctx = tok.get("ext2ctx")
    has = None
    if ext2ctx is not None and sizes.get("a_sel", 0) and nsh == 1:
        # fetched arrays are read-only views; round 2 writes results back
        if not I32.flags.writeable:
            I32 = np.array(I32)
        if not IIT.flags.writeable:
            IIT = np.array(IIT)
        has = np.ascontiguousarray(I32[11], np.uint8)
        needed = _replay(al, reads, I32, IIT, CH32, CHPOS, l_rep, n,
                         fallback, has_res=has, prepass=True)
        timers.count("ext.items", int(m6[0]) + len(needed))
        if len(needed):
            _ext2_run(al, ext2ctx, I32, IIT, needed, hist, Nkey)
            if _note_hwm(hist, Nkey, a_e2=len(needed)):
                _hist_save(al, hist)
            has[needed] = 1
    regs_out = _replay(al, reads, I32, IIT, CH32, CHPOS, l_rep, n, fallback,
                       has_res=has)
    return regs_out, sorted(fallback)


def _ext2_run(al, ctx, I32, IIT, needed, hist, Nkey):
    """Round-2 extension: one small dispatch over exactly the items the
    prepass still needs (same program as round 1 with sel_cap=0, arena
    hwm-bucketed on the needed count so the shape vocabulary stays tiny)."""
    k = len(needed)
    h = hist.get(("hwm", "a_e2", Nkey), 0)
    a2 = _bucket(max(int(h + (h >> 2) + 1), k), lo=1024)
    sub32 = np.zeros((5, a2), np.int32)
    sub32[:, :k] = I32[:5, needed]
    subit = np.zeros((3, a2), IIT.dtype)
    subit[:, :k] = IIT[:, needed]
    with timers.section("front.ext2"):
        timers.count("dispatch.front", 1)
        timers.add_bytes("h2d.front_seq", sub32.nbytes + subit.nbytes)
        o32d, oitd, _ = _ext_jit(
            al.fm, ctx["seq_dev"], ctx["l_dev"], ctx["seed_chain"],
            ctx["sv"], ctx["sq"], ctx["sl"], ctx["sr"],
            jnp.asarray(sub32), jnp.asarray(subit),
            jnp.asarray(k, jnp.int32), sel_cap=0, c_cap=0, **ctx["s6"])
        o32, oit = fetchguard.fetch([o32d, oitd], what="front.ext2")
        timers.add_bytes("d2h.front", o32.nbytes + oit.nbytes)
    I32[5:11, needed] = o32[5:11, :k]
    IIT[1:, needed] = oit[1:, :k]


def front_ext(al, reads, seq: np.ndarray, l_seq: np.ndarray):
    """Device front half + host exact-filter replay (dispatch + finish)."""
    return front_finish(al, front_start(al, reads, seq, l_seq))


_DEBUG = os.environ.get("BWAMEM_TPU_DEBUG") == "1"


def _dbg(msg: str) -> None:
    if _DEBUG:
        import time
        print(f"[front {time.strftime('%H:%M:%S')}] {msg}",
              file=sys.stderr, flush=True)


def _dispatch(al, seq_dev, l_dev, sizes, use_kmer, N, Lr):
    """Enqueue the device program chain; returns device arrays (no fetch)."""
    opt: MemOptions = al.opt
    s1 = dict(cap=sizes["cap"], kmax=sizes["kmax"], emax=sizes["emax"],
              min_seed_len=opt.min_seed_len, use_kmer=use_kmer,
              b1s=sizes["b1s"], t1s=sizes["t1s"])
    s2 = dict(pmax=sizes["pmax"], cand2=sizes["cand2"],
              k2max=sizes["k2max"], e2max=sizes["e2max"],
              min_seed_len=opt.min_seed_len, split_len=opt.split_len,
              split_width=opt.split_width,
              b2s=sizes["b2s"], t2s=sizes["t2s"])
    s3 = dict(p3cap=sizes["p3cap"], e3max=sizes["e3max"],
              min_seed_len=opt.min_seed_len,
              max_mem_intv=opt.max_mem_intv, use_kmer=use_kmer,
              t3s=sizes["t3s"])
    s4 = dict(max_occ=opt.max_occ, a_seed=sizes["a_seed"],
              s_cap=sizes["s_cap"], n_reads=N)
    s5 = dict(w=opt.w, max_chain_gap=opt.max_chain_gap,
              chain_cap=sizes["s_cap"], a_ch=sizes["a_ch"],
              a_it=sizes["a_it"], min_chain_weight=opt.min_chain_weight,
              a=opt.a, o_del=opt.o_del, e_del=opt.e_del, o_ins=opt.o_ins,
              e_ins=opt.e_ins)
    s6 = dict(lq_max=Lr, t_max=sizes["t_span"],
              mat_bytes=np.asarray(opt.mat, np.int8).tobytes(),
              o_del=opt.o_del, e_del=opt.e_del, o_ins=opt.o_ins,
              e_ins=opt.e_ins, zdrop=opt.zdrop, w_opt=opt.w, a=opt.a,
              pen_clip5=opt.pen_clip5, pen_clip3=opt.pen_clip3,
              use_pl=not _shapes._is_cpu())

    if _mesh_nsh(al) > 1:
        return _dispatch_mesh(al, seq_dev, l_dev, s1, s2, s3, s4, s5, s6)

    timers.count("dispatch.front", 6)
    _dbg(f"dispatch p1 N={N} Lr={Lr} sizes={sizes}")
    sec1, m1 = _p1_jit(al.fm, seq_dev, l_dev, **s1)
    _dbg("dispatch p2")
    sec2, m2 = _p2_jit(al.fm, seq_dev, l_dev, sec1, m1[0], **s2)
    _dbg("dispatch p3")
    sec3, m3 = _p3_jit(al.fm, seq_dev, l_dev, **s3)
    _dbg("dispatch expand")
    seeds, seed_cnt, l_rep, m4 = _expand_jit(
        al.fm, al.ctg_offsets, sec1, m1[0], sec2, m2[0], sec3, m3[0], **s4)
    _dbg("dispatch chain")
    seed_chain, items32, items_it, chain32, c_pos, m5 = _chain_jit(
        al.fm, al.ctg_offsets, al.ctg_is_alt, seeds, l_dev, **s5)
    _dbg("dispatch ext")
    out32, out_it, m6 = _ext_jit(
        al.fm, seq_dev, l_dev, seed_chain, seeds.valid, seeds.qbeg,
        seeds.len, seeds.rbeg, items32, items_it, m5[4],
        sel_cap=sizes.get("a_sel", 0), c_cap=sizes["s_cap"], **s6)
    _dbg("dispatch done")
    it = np.dtype(al.fm.L2.dtype)
    meta_all = jnp.concatenate([m1, m2, m3, m4, m5, m6])
    scl = jnp.stack([seed_cnt.astype(it), l_rep])
    # ext2 context: device refs the round-2 dispatch needs (the items come
    # back from the host as an explicit subset)
    ctx = dict(seq_dev=seq_dev, l_dev=l_dev, seed_chain=seed_chain,
               sv=seeds.valid, sq=seeds.qbeg, sl=seeds.len, sr=seeds.rbeg,
               s6=s6)
    return meta_all, out32, out_it, chain32, c_pos, scl, ctx


def _dispatch_mesh(al, seq_dev, l_dev, s1, s2, s3, s4, s5, s6):
    """Shard-mapped dispatch of the six front programs over al.mesh: reads
    data-parallel on their leading axis, FM replicated, arenas shard-local
    (the parallel/mesh AXIS model; reference: per-GPU index + sharded
    minibatches, cuda/streams.cu:16-104,307-318).  Outputs keep the
    stacked per-shard layout — front_finish merges them."""
    from bwamem_tpu.parallel import mesh as pmesh
    mesh = al.mesh
    nsh = int(mesh.devices.size)
    s4 = dict(s4, n_reads=s4["n_reads"] // nsh)
    timers.count("dispatch.front", 6)

    def t(d):
        return tuple(sorted(d.items()))

    sec1, m1 = pmesh.rowmap(
        mesh, _p1_mesh, t(s1), (True, False, False),
        out_mask=("ax1", "ax1"))(al.fm, seq_dev, l_dev)
    sec2, m2 = pmesh.rowmap(
        mesh, _p2_mesh, t(s2), (True, False, False, "ax1", "ax1"),
        out_mask=("ax1", "ax1"))(al.fm, seq_dev, l_dev, sec1, m1)
    sec3, m3 = pmesh.rowmap(
        mesh, _p3_mesh, t(s3), (True, False, False),
        out_mask=("ax1", "ax1"))(al.fm, seq_dev, l_dev)
    seeds, seed_cnt, l_rep, m4 = pmesh.rowmap(
        mesh, _expand_mesh, t(s4),
        (True, True, "ax1", "ax1", "ax1", "ax1", "ax1", "ax1"),
        out_mask=(False, False, False, "ax1"))(
            al.fm, al.ctg_offsets, sec1, m1, sec2, m2, sec3, m3)
    seed_chain, items32, items_it, chain32, c_pos, m5 = pmesh.rowmap(
        mesh, _chain_mesh, t(s5), (True, True, True, False, False),
        out_mask=(False, "ax1", "ax1", "ax1", "ax1", "ax1"))(
            al.fm, al.ctg_offsets, al.ctg_is_alt, seeds, l_dev)
    out32, out_it, m6 = pmesh.rowmap(
        mesh, _ext_mesh, t(s6),
        (True, False, False, False, False, False, False, False,
         "ax1", "ax1"),
        out_mask=("ax1", "ax1", "ax1"))(
            al.fm, seq_dev, l_dev, seed_chain, seeds.valid, seeds.qbeg,
            seeds.len, seeds.rbeg, items32, items_it)
    it = np.dtype(al.fm.L2.dtype)
    meta_all = jnp.concatenate([m1, m2, m3, m4, m5, m6])   # [48, nsh]
    scl = jnp.stack([seed_cnt.astype(it), l_rep])          # [2, N]
    return meta_all, out32, out_it, chain32, c_pos, scl, None


def _replay(al, reads, I32, IIT, CH32, CHPOS, l_rep, n, fallback,
            has_res=None, prepass=False):
    """Exact mem_chain_flt + mem_chain2aln skip/accept replay
    (bwamem.c:334-392, 674-793) over the fetched arenas.  Native
    hostops.replay_batch when available (the per-read/per-seed walk is
    branchy C-shaped work); _replay_py is the spec and fallback.

    Two-round extension contract (has_res = per-item result mask):
    prepass=True returns just the needed-item index array (round-2 work
    list).  prepass=False with has_res set is the FINAL walk — any read
    whose walk still needs a result-less item (a rare prepass/exact
    divergence: the prepass saw fewer regions, so its emitted set can
    differ) is demoted to the host-front fallback, keeping the output
    bit-identical unconditionally."""
    from bwamem_tpu import native
    if not native.available():
        assert has_res is None  # two-round is gated on native (front_start)
        return _replay_py(al, reads, I32, IIT, CH32, CHPOS, l_rep, n,
                          fallback)
    opt: MemOptions = al.opt
    with timers.section("front.prepass" if prepass else "front.replay"):
        (i_read, _i_slot, i_chain, i_qbeg, i_len, n_qb, n_qe, score,
         truesc, n_w, seedcov) = (I32[k] for k in range(11))
        i_rbeg, n_rb, n_re = IIT[0], IIT[1], IIT[2]
        c_read, c_w, c_beg, c_end, c_ra = (CH32[k] for k in range(5))
        ch_base = np.searchsorted(c_read, np.arange(n + 1))
        it_base = np.searchsorted(i_read, np.arange(n + 1))
        skip = np.zeros(n, np.uint8)
        for i in fallback:
            if i < n:
                skip[i] = 1
        l_seq = np.fromiter((r.l_seq for r in reads[:n]), np.int32, n)
        with timers.section("front.replay.native"):
            out_base, out_m, out_rid, needed = native.replay_batch(
                ch_base, c_w, c_beg, c_end, (c_ra & 1).astype(np.uint8),
                CHPOS, c_ra >> 1, it_base, i_chain, i_qbeg, i_len, i_rbeg,
                n_qb, n_qe, n_rb, n_re, n_w, skip, l_seq, opt,
                has_res=has_res)
        if prepass:
            return needed
        bad_reads = set()
        if has_res is not None and needed.size:
            # final walk hit unresolved items: demote those reads
            for r in (np.searchsorted(it_base, needed, side="right") - 1):
                bad_reads.add(int(r))
                fallback.add(int(r))
        # speculative-extension waste accounting: lanes extended on device
        # vs items surviving the exact filter + skip/accept walk
        if has_res is None:
            timers.count("ext.items", int(it_base[n]))
        timers.count("ext.accepted", len(out_m))
        # materialize AlnRegs (plain-python lists: ~1us/reg)
        qb_l = n_qb[out_m].tolist()
        qe_l = n_qe[out_m].tolist()
        rb_l = n_rb[out_m].tolist()
        re_l = n_re[out_m].tolist()
        sc_l = score[out_m].tolist()
        ts_l = truesc[out_m].tolist()
        w_l = n_w[out_m].tolist()
        sl_l = i_len[out_m].tolist()
        cov_l = seedcov[out_m].tolist()
        rid_l = out_rid.tolist()
        regs_out: list[list[AlnReg]] = [[] for _ in range(n)]
        ob = out_base.tolist()
        for i in range(n):
            b, e = ob[i], ob[i + 1]
            if b == e or i in bad_reads:
                continue
            frac_rep = float(l_rep[i]) / max(l_seq[i], 1)
            regs_out[i] = [
                AlnReg(rb=rb_l[j], re=re_l[j], qb=qb_l[j], qe=qe_l[j],
                       rid=rid_l[j], score=sc_l[j], truesc=ts_l[j],
                       w=w_l[j], seedcov=cov_l[j], seedlen0=sl_l[j],
                       frac_rep=frac_rep)
                for j in range(b, e)]
    return regs_out


def _replay_py(al, reads, I32, IIT, CH32, CHPOS, l_rep, n, fallback):
    """Pure-python replay spec (see _replay)."""
    opt: MemOptions = al.opt
    from bwamem_tpu.pipeline.extend_host import cal_max_gap

    (i_read, i_slot, i_chain, i_qbeg, i_len, n_qb, n_qe, score, truesc,
     n_w, seedcov) = (I32[k] for k in range(11))
    i_rbeg, n_rb, n_re = IIT[0], IIT[1], IIT[2]
    c_read, c_w, c_beg, c_end, c_ra = (CH32[k] for k in range(5))
    c_pos = CHPOS
    c_rid = c_ra >> 1
    c_alt = (c_ra & 1).astype(bool)

    # group by read (arenas are read-major)
    ch_base = np.searchsorted(c_read, np.arange(n + 1))
    it_base = np.searchsorted(i_read, np.arange(n + 1))

    regs_out: list[list[AlnReg]] = [[] for _ in range(n)]
    statics = dict(mask_level=opt.mask_level, drop_ratio=opt.drop_ratio,
                   min_seed_len=opt.min_seed_len,
                   max_chain_gap=opt.max_chain_gap,
                   min_chain_weight=opt.min_chain_weight,
                   max_chain_extend=opt.max_chain_extend)
    _t = timers.section("front.replay")
    _t.__enter__()
    for i in range(n):
        if i in fallback:
            continue
        cb, ce = int(ch_base[i]), int(ch_base[i + 1])
        nch = ce - cb
        if nch == 0:
            continue
        pos_i = c_pos[cb:ce]
        trav = sorted(range(nch), key=lambda c: (int(pos_i[c]), c))
        kept_ids = chainflt_host.chain_flt_exact(
            trav, c_w[cb:ce], c_beg[cb:ce], c_end[cb:ce], c_alt[cb:ce],
            **statics)
        if not kept_ids:
            continue
        ib, ie = int(it_base[i]), int(it_base[i + 1])
        # per-chain item lists in slot-asc (insertion) order
        by_chain: dict[int, list[int]] = {}
        for m in range(ib, ie):
            by_chain.setdefault(int(i_chain[m]), []).append(m)
        # work order: kept chains in sorted order; within a chain seeds by
        # (len desc, insertion idx desc) — the DESC walk of srt
        # (bwamem.c:669-676)
        work: list[int] = []
        wchain: list[int] = []
        for c in kept_ids:
            ms = by_chain.get(c, [])
            order = sorted(range(len(ms)),
                           key=lambda k: (int(i_len[ms[k]]), k),
                           reverse=True)
            for k in order:
                work.append(ms[k])
                wchain.append(c)
        lq = reads[i].l_seq
        frac_rep = float(l_rep[i]) / max(lq, 1)
        cnum = len(work)
        marks = [True] * cnum
        chain_items: dict[int, list[int]] = {}
        for k in range(cnum):
            chain_items.setdefault(wchain[k], []).append(k)
        regs = regs_out[i]
        for k in range(cnum):
            m = work[k]
            srb, sqb, slen = int(i_rbeg[m]), int(i_qbeg[m]), int(i_len[m])
            hit = -1
            for p in regs:
                if srb < p.rb or srb + slen > p.re or sqb < p.qb or \
                        sqb + slen > p.qe:
                    continue
                if slen - p.seedlen0 > .1 * lq:
                    continue
                qd, rd = sqb - p.qb, srb - p.rb
                w = min(cal_max_gap(opt, min(qd, rd)), p.w)
                if qd - rd < w and rd - qd < w:
                    hit = 1
                    break
                qd, rd = p.qe - (sqb + slen), p.re - (srb + slen)
                w = min(cal_max_gap(opt, min(qd, rd)), p.w)
                if qd - rd < w and rd - qd < w:
                    hit = 1
                    break
            if hit >= 0:
                # overlapping-seed exception (bwamem.c:699-711)
                mates = chain_items[wchain[k]]
                pos = mates.index(k)
                differs = False
                for k2 in mates[:pos][::-1]:
                    if not marks[k2]:
                        continue
                    m2 = work[k2]
                    tq, tr, tl_ = int(i_qbeg[m2]), int(i_rbeg[m2]), \
                        int(i_len[m2])
                    if tl_ < slen * .95:
                        continue
                    if sqb <= tq and sqb + slen - tq >= slen >> 2 and \
                            tq - sqb != tr - srb:
                        differs = True
                        break
                    if tq <= sqb and tq + tl_ - sqb >= slen >> 2 and \
                            sqb - tq != srb - tr:
                        differs = True
                        break
                if not differs:
                    marks[k] = False
                    continue
            r = AlnReg()
            r.rid = int(c_rid[cb + wchain[k]])
            r.qb, r.rb = int(n_qb[m]), int(n_rb[m])
            r.qe, r.re = int(n_qe[m]), int(n_re[m])
            r.score = int(score[m])
            r.truesc = int(truesc[m])
            r.w = int(n_w[m])
            r.seedlen0 = slen
            r.frac_rep = frac_rep
            r.seedcov = int(seedcov[m])
            regs.append(r)
    _t.__exit__(None, None, None)
    return regs_out
