"""SMEM seeding — batched 3-pass interval collection.

Reproduces mem_collect_intv (reference bwamem.c:137-185) output exactly, but
with a TPU-native decomposition instead of the per-read recursive loops of
bwt_smem1a (bwt.c:289-351):

  Phase A  — a lockstep *forward scanner*: every read advances one base per
             step through pass-1 pivots (pivot x jumps to the end of the
             longest match, ~2L total steps worst case), recording a
             "candidate" (the bidirectional interval before each interval-
             size change) into a fixed-size per-read buffer.
  Phase B  — *backward extension*: every candidate from every read/pivot is
             an independent lane; all lanes left-extend in lockstep until
             death.  This replaces the nested candidate loop of the
             reference's backward phase: we proved the per-candidate leftmost
             start s(cand) is monotone in candidate length, so the
             reference's curr/prev bookkeeping reduces to a per-candidate
             computation plus a vectorized emission rule:
                emit(cand) ⇔ cand is its pivot's longest, or
                             s(cand) < s(next longer candidate).
             This matches bwt_smem1a's "curr->n == 0 && i+1 < last start"
             emission logic including the duplicate-size drop (see
             tests/test_smem.py for the oracle equivalence check).
  Pass 2   — same two phases, seeded at (start+end)/2 of each long low-occ
             pass-1 SMEM with min_intv = parent_size+1 (bwamem.c:155-165).
  Pass 3   — LAST-like forward-only scanner (bwt_seed_strategy1,
             bwt.c:358-379).

All loops are lax.while_loop with per-lane masks; all shapes static.
Overflow of any fixed cap sets a per-read flag so the host can route those
reads to a fallback path (the reference instead mallocs, bwamem.c kvec).
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from bwamem_tpu.ops import fm as fmops


@dataclasses.dataclass(frozen=True)
class SeedingCaps:
    cand1: int = 64      # pass-1 candidates per read
    parents: int = 12    # pass-2 parent SMEMs per read
    cand2: int = 16      # pass-2 candidates per parent
    pass3: int = 16      # pass-3 intervals per read
    seeds: int = 256     # expanded seeds per read

    @property
    def intervals(self) -> int:
        return self.cand1 + self.parents * self.cand2 + self.pass3


KMER_K = 12      # matches index.build.KMER_K / reference KMER_K


def kmer_pre(fm: fmops.FM, seq: jax.Array, l_seq: jax.Array) -> jax.Array:
    """Per-position k-mer-12 fast-start intervals: pre[n, x] = the
    bi-interval (x0, x1, size) after matching q[x : x+12) forward, via ONE
    table gather per position instead of 12 FM extensions (reference
    cuda/bwt_CUDA.cu:253-258, table from kmers_index/hashKMer.hpp:58-81).
    size == -1 marks positions where the window leaves the read or crosses
    an ambiguous base (the scans must then take the normal init path)."""
    N, L = seq.shape
    i32 = jnp.int32
    code = jnp.zeros((N, L), i32)
    bad = jnp.zeros((N, L), bool)
    for j in range(KMER_K):
        b = jnp.concatenate(
            [seq[:, j:], jnp.full((N, j), 4, seq.dtype)], axis=1)
        code = code * 4 + jnp.clip(b.astype(i32), 0, 3)
        bad = bad | (b >= 4)
    posv = jnp.arange(L, dtype=i32)[None, :]
    valid = (~bad) & (posv + KMER_K <= l_seq[:, None])
    pre = fm.kmer[jnp.where(valid, code, 0)]          # [N, L, 3]
    return jnp.where(valid[:, :, None], pre,
                     jnp.asarray([0, 0, -1], pre.dtype))


def kmer_pre0(fm: fmops.FM, seq: jax.Array, l_seq: jax.Array) -> jax.Array:
    """Position-0-only variant of kmer_pre: the pass-1 multi-pivot scan
    consults the fast-start table ONLY for pivot 0 (see forward_scan), so
    gathering the full [N, L, 3] pre-table there wastes a large random
    gather.  Returns [N, 1, 3] (slot 0 = the position-0 interval)."""
    N, L = seq.shape
    i32 = jnp.int32
    code = jnp.zeros((N,), i32)
    bad = jnp.zeros((N,), bool)
    for j in range(KMER_K):
        b = seq[:, j] if j < L else jnp.full((N,), 4, seq.dtype)
        code = code * 4 + jnp.clip(b.astype(i32), 0, 3)
        bad = bad | (b >= 4)
    valid = (~bad) & (l_seq >= KMER_K)
    pre = fm.kmer[jnp.where(valid, code, 0)]          # [N, 3]
    pre = jnp.where(valid[:, None], pre,
                    jnp.asarray([0, 0, -1], pre.dtype))
    return pre[:, None, :]


PACKED_L_MAX = 512   # packed-seq base extraction gate (word count stays small)


def pack_seq(seq: jax.Array, l_seq: jax.Array | None = None):
    """[N, L] nt4 codes -> (b2, amb) packed words, both uint32 [N, W] with
    W = ceil(L/16).  Base p of row r sits at bits 2*(p&15) of b2[r, p>>4];
    its ambiguity bit (set for base >= 4 OR p >= l_seq) at bit (p&15) of
    amb[r, p>>4].

    The scan loops extract per-lane bases from these words with a one-hot
    select over W columns — pure VPU work — instead of a per-lane gather
    into seq, because on the target backend every gather op costs ~100 us
    regardless of size while ~W vector ops are free."""
    N, L = seq.shape
    W = (L + 15) // 16
    pad = W * 16 - L
    s = jnp.pad(seq, ((0, 0), (0, pad)), constant_values=4)
    isamb = s >= 4
    if l_seq is not None:
        pos = jnp.arange(W * 16, dtype=jnp.int32)[None, :]
        isamb = isamb | (pos >= l_seq[:, None])
    sh2 = (jnp.arange(16, dtype=jnp.uint32) * 2)[None, None, :]
    b = jnp.clip(s, 0, 3).astype(jnp.uint32).reshape(N, W, 16)
    b2 = (b << sh2).sum(-1).astype(jnp.uint32)
    sh1 = jnp.arange(16, dtype=jnp.uint32)[None, None, :]
    a = isamb.astype(jnp.uint32).reshape(N, W, 16)
    amb = (a << sh1).sum(-1).astype(jnp.uint32)
    return b2, amb


def base_at_packed(b2: jax.Array, amb: jax.Array, pos: jax.Array):
    """Per-lane base at pos from packed rows (b2/amb [..., W], pos [...]).
    Out-of-range or ambiguous positions read as 4.  No gathers."""
    W = b2.shape[-1]
    p = jnp.clip(pos, 0, W * 16 - 1)
    w = (p >> 4).astype(jnp.int32)
    sel = jnp.arange(W, dtype=jnp.int32) == w[..., None]
    word = jnp.where(sel, b2, jnp.uint32(0)).sum(-1).astype(jnp.uint32)
    aword = jnp.where(sel, amb, jnp.uint32(0)).sum(-1).astype(jnp.uint32)
    off = (p & 15).astype(jnp.uint32)
    bb = ((word >> (off * 2)) & 3).astype(jnp.int32)
    ab = ((aword >> off) & 1) != 0
    oob = (pos < 0) | (pos >= W * 16)
    return jnp.where(ab | oob, 4, bb)


class Candidates(NamedTuple):
    x0: jax.Array      # [N, C] interval (SA range start)
    x1: jax.Array      # [N, C] reverse-complement range start
    x2: jax.Array      # [N, C] size
    end: jax.Array     # [N, C] match end position (exclusive), int32
    pivot: jax.Array   # [N, C] pivot the candidate came from, int32
    n: jax.Array       # [N] number written
    overflow: jax.Array  # [N] bool
    steps: jax.Array = None       # [] int32 — loop iterations with work
    unfinished: jax.Array = None  # [] bool — max_steps was too small


def forward_scan(fm: fmops.FM, seq: jax.Array, l_seq: jax.Array,
                 start: jax.Array, min_intv: jax.Array, cap: int,
                 multi_pivot: bool, lane_read: jax.Array = None,
                 pre: jax.Array = None,
                 max_steps: int | None = None) -> Candidates:
    """Phase A.  seq: [N, L] nt4 codes (pad with 4); start: [N] first pivot
    (or the single pivot when multi_pivot=False); min_intv: [N].

    When `lane_read` is given, the scan runs over M = start.shape[0]
    compacted lanes, each reading row lane_read[m] of seq (l_seq then must
    already be gathered per lane) — used by the fused pass-2 re-seeding,
    which scans only qualifying parent lanes.

    `max_steps`: static trip count — the loop runs as an unrolled fori_loop
    (the backend charges ~90 us per loop ITERATION, ~4x less when unrolled)
    and reports `steps` (iterations that still had active lanes, the hwm to
    persist) and `unfinished` (some lane needed more steps: caller doubles
    max_steps and retries, same contract as the arena caps).  When None the
    loop is a while_loop that always completes.

    Candidate semantics match the forward loop of bwt_smem1a (bwt.c:304-321):
    push the previous interval on every size change / ambiguous base / read
    end; stop the pivot when the extended size < min_intv; next pivot = end
    of the longest match (the value bwt_smem1a returns).
    """
    L = seq.shape[1]
    N = start.shape[0] if lane_read is not None else seq.shape[0]
    it = fm.L2.dtype
    rows = jnp.arange(N, dtype=jnp.int32)          # lane index (scatters)
    rows_seq = (lane_read.astype(jnp.int32) if lane_read is not None
                else rows)                          # seq row per lane

    if L <= PACKED_L_MAX:
        b2a, amba = pack_seq(seq, None)
        b2r = b2a[rows_seq] if lane_read is not None else b2a
        ambr = amba[rows_seq] if lane_read is not None else amba

        def seq_at(pos):
            return jnp.where((pos >= 0) & (pos < l_seq),
                             base_at_packed(b2r, ambr, pos), 4)
    else:
        def seq_at(pos):
            p = jnp.clip(pos, 0, L - 1)
            return jnp.where((pos >= 0) & (pos < l_seq),
                             seq[rows_seq, p].astype(jnp.int32), 4)

    zero_i = jnp.zeros((N,), jnp.int32)
    zero_t = jnp.zeros((N,), it)
    state = dict(
        phase=jnp.where(start < l_seq, 0, 2).astype(jnp.int32),
        x=start.astype(jnp.int32),
        i=zero_i,
        ik0=zero_t, ik1=zero_t, ik2=zero_t,
        ik_end=zero_i,
    )
    if pre is not None:
        # k-mer-12 fast start for the FIRST pivot when it is position 0:
        # enter the loop already matched over [0, 12) with the precomputed
        # interval.  EXACT for pivot 0: all its candidates back-extend to
        # s = 0, so the emission rule (s < s_next) emits only the longest —
        # the candidates the jump skips (end < 12) are never emitted, and
        # interval sizes are non-increasing in end, so size >= min_intv at
        # end 12 implies no in-window termination either.
        p0 = pre[rows_seq, 0]                          # [N, 3]
        jump = ((state["phase"] == 0) & (start == 0)
                & (p0[:, 2] >= min_intv.astype(it))
                & (p0[:, 2] >= 0))
        K_i = jnp.int32(KMER_K)
        state["phase"] = jnp.where(jump, 1, state["phase"])
        state["i"] = jnp.where(jump, K_i, state["i"])
        state["ik_end"] = jnp.where(jump, K_i, state["ik_end"])
        state["ik0"] = jnp.where(jump, p0[:, 0], state["ik0"])
        state["ik1"] = jnp.where(jump, p0[:, 1], state["ik1"])
        state["ik2"] = jnp.where(jump, p0[:, 2], state["ik2"])

    def cond(st):
        return jnp.any(st["phase"] < 2)

    def core(st):
        """One scan step: returns (new core state, push mask, candidate
        fields [N, 5]).  Recording is the caller's concern — the while
        path scatters into a [N, cap] buffer; the fori path logs to a
        [T, N, 6] step journal with a free loop-index dynamic_update_slice
        (a per-step [N, cap, 5] scatter costs ~0.7 ms on the target
        backend; the dus is free)."""
        phase, x, i = st["phase"], st["x"], st["i"]
        ik0, ik1, ik2, ik_end = st["ik0"], st["ik1"], st["ik2"], st["ik_end"]

        # phases 0 and 1 are mutually exclusive per lane, so ONE seq fetch
        # serves both the pivot base q[x] (init) and the step base q[i]
        init = phase == 0
        ext = phase == 1
        q_at = seq_at(jnp.where(init, x, i))

        # ---- phase 0: initialize a pivot ----
        qx = q_at
        init_amb = init & (qx >= 4)
        init_ok = init & (qx < 4)
        s0, s1, s2 = fmops.set_intv(fm, jnp.clip(qx, 0, 3))
        ik0 = jnp.where(init_ok, s0, ik0)
        ik1 = jnp.where(init_ok, s1, ik1)
        ik2 = jnp.where(init_ok, s2, ik2)
        ik_end = jnp.where(init_ok, x + 1, ik_end)
        i = jnp.where(init_ok, x + 1, i)
        # skip ambiguous pivot: x+1 (bwt_smem1a returns x+1 when q[x]>3)
        x = jnp.where(init_amb, x + 1, x)
        phase = jnp.where(init_ok, 1, phase)
        phase = jnp.where(init_amb & (x >= l_seq), 2, phase)

        # ---- phase 1: one forward extension step at position i ----
        qi = q_at
        at_end = ext & (i >= l_seq)
        amb = ext & (i < l_seq) & (qi >= 4)
        do_ext = ext & (i < l_seq) & (qi < 4)
        n0, n1, ns = fmops.extend(fm, ik0, ik1, ik2, is_back=False)
        c = jnp.clip(3 - qi, 0, 3)
        e0 = fmops._select4(n0, c)
        e1 = fmops._select4(n1, c)
        e2 = fmops._select4(ns, c)
        size_change = do_ext & (e2 != ik2)
        too_small = size_change & (e2 < st_min_intv)
        push = at_end | amb | size_change
        finish = at_end | amb | too_small

        vals = jnp.stack([ik0, ik1, ik2, ik_end.astype(it),
                          st["x"].astype(it)], axis=-1)

        # ---- advance ----
        cont = do_ext & ~finish
        ik0 = jnp.where(cont, e0, ik0)
        ik1 = jnp.where(cont, e1, ik1)
        ik2 = jnp.where(cont, e2, ik2)
        ik_end = jnp.where(cont, i + 1, ik_end)
        i = jnp.where(cont, i + 1, i)

        if multi_pivot:
            x = jnp.where(finish, ik_end, x)
            phase = jnp.where(finish, jnp.where(x < l_seq, 0, 2), phase)
        else:
            phase = jnp.where(finish, 2, phase)

        return (dict(phase=phase, x=x, i=i, ik0=ik0, ik1=ik1, ik2=ik2,
                     ik_end=ik_end), push, vals)

    st_min_intv = min_intv.astype(it)
    if max_steps is None:
        state.update(cbuf=jnp.zeros((N, cap, 5), it), n=zero_i,
                     overflow=jnp.zeros((N,), bool))

        def body(st):
            nst, push, vals = core(st)
            slot = jnp.where(push & (st["n"] < cap), st["n"], cap)
            nst["cbuf"] = st["cbuf"].at[rows, slot, :].set(vals,
                                                           mode="drop")
            nst["n"] = st["n"] + (push & (st["n"] < cap)).astype(jnp.int32)
            nst["overflow"] = st["overflow"] | (push & (st["n"] >= cap))
            return nst

        st = jax.lax.while_loop(cond, body, state)
        steps = jnp.zeros((), jnp.int32)
        unfinished = jnp.zeros((), bool)
        cb, n_out, overflow = st["cbuf"], st["n"], st["overflow"]
    else:
        state["steps"] = jnp.zeros((), jnp.int32)
        state["rec"] = jnp.zeros((max_steps, N, 6), it)

        def fbody(t, st):
            active = jnp.any(st["phase"] < 2)
            steps = st["steps"] + active.astype(jnp.int32)
            rec = st["rec"]
            nst, push, vals = core(st)
            row = jnp.concatenate([push[:, None].astype(it), vals],
                                  axis=-1)
            z = jnp.zeros_like(t)
            nst["rec"] = jax.lax.dynamic_update_slice(
                rec, row[None], (t, z, z))
            nst["steps"] = steps
            return nst

        st = jax.lax.fori_loop(0, max_steps, fbody, state, unroll=4)
        steps = st["steps"]
        unfinished = jnp.any(st["phase"] < 2)
        # journal -> per-lane candidate grid: ONE scatter for the whole
        # scan instead of one per step
        P = jnp.transpose(st["rec"], (1, 0, 2))       # [N, T, 6]
        push = P[:, :, 0] > 0
        ord_slot = jnp.cumsum(push.astype(jnp.int32), axis=1) - 1
        n_out = push.sum(axis=1).astype(jnp.int32)
        overflow = n_out > cap
        n_out = jnp.minimum(n_out, cap)
        rowsT = jnp.broadcast_to(rows[:, None], (N, max_steps))
        slot = jnp.where(push & (ord_slot < cap), ord_slot, cap)
        cb = jnp.zeros((N, cap, 5), it).at[rowsT, slot, :].set(
            P[:, :, 1:6], mode="drop")
    return Candidates(cb[:, :, 0], cb[:, :, 1], cb[:, :, 2],
                      cb[:, :, 3].astype(jnp.int32),
                      cb[:, :, 4].astype(jnp.int32), n_out,
                      overflow, steps, unfinished)


def back_extend(fm: fmops.FM, seq: jax.Array, l_seq: jax.Array,
                cand: Candidates, read_of_lane: jax.Array,
                min_intv: jax.Array):
    """Phase B: flatten candidates to lanes and left-extend each to its
    leftmost start s with interval size >= min_intv (the backward loop of
    bwt_smem1a, bwt.c:326-345, made embarrassingly parallel).

    Returns (s, x0, x2) flattened [N*C]: the final interval of [s, end).
    """
    N, C = cand.x0.shape
    valid = (jnp.arange(C, dtype=jnp.int32)[None, :] < cand.n[:, None])
    s, x0, x2 = back_extend_flat(
        fm, seq, read_of_lane.reshape(-1), cand.pivot.reshape(-1),
        cand.x0.reshape(-1), cand.x1.reshape(-1), cand.x2.reshape(-1),
        min_intv.reshape(-1), valid.reshape(-1))
    return s, x0, x2, valid.reshape(-1)


def back_extend_flat(fm: fmops.FM, seq: jax.Array, lane_read: jax.Array,
                     pivot: jax.Array, x0, x1, x2, min_intv, valid,
                     stage_w: tuple = (), k_stage: int = 4):
    """Compact-lane backward extension: lanes [M] each carrying (read row,
    pivot, interval, min size).  Returns (s, x0, x2) — plus an overflow
    flag when `stage_w` is given.

    `stage_w`: static tuple of shrinking arena widths.  Candidate lifetimes
    are heavily front-loaded (measured on 101bp reads: median 6 left steps,
    p90 = 10, 2.7% past 12, max ~50), but a lockstep while_loop pays the
    per-gather-index cost for EVERY lane until the LAST one dies — on the
    target backend a gather costs ~0.3 ms + ~10 ns per index, so dead lanes
    dominate.  After every `k_stage` steps the alive lanes are compacted
    into the next (smaller) arena; lanes that no longer fit set the
    overflow flag (the caller grows the width ladder and retries — same
    contract as every other arena here).  Dead lanes' results are scattered
    back to their original slots at each compaction."""
    L = seq.shape[1]
    it = fm.L2.dtype
    M = lane_read.shape[0]
    mi = min_intv.astype(it)
    i = pivot - 1
    alive = valid
    s = pivot.astype(jnp.int32)

    packed = L <= PACKED_L_MAX
    if packed:
        b2a, amba = pack_seq(seq, None)

        def getseq(lr):
            return b2a[lr], amba[lr]          # ONE gather per (re)compaction
    else:
        def getseq(lr):
            return None, None

    def step(alive, i, s, x0, x1, x2, mi, lr, b2l, ambl):
        if packed:
            qi = base_at_packed(b2l, ambl, i)
        else:
            p = jnp.clip(i, 0, L - 1)
            qi = jnp.where(i >= 0, seq[lr, p].astype(jnp.int32), 4)
        n0, n1, ns = fmops.extend(fm, x0, x1, x2, is_back=True)
        c = jnp.clip(qi, 0, 3)
        e0 = fmops._select4(n0, c)
        e1 = fmops._select4(n1, c)
        e2 = fmops._select4(ns, c)
        ok = alive & (i >= 0) & (qi < 4) & (e2 >= mi)
        die = alive & ~ok
        s = jnp.where(die, i + 1, s)
        x0 = jnp.where(ok, e0, x0)
        x1 = jnp.where(ok, e1, x1)
        x2 = jnp.where(ok, e2, x2)
        i = jnp.where(ok, i - 1, i)
        return ok, i, s, x0, x1, x2

    if not stage_w:
        b2l, ambl = getseq(lane_read.astype(jnp.int32))

        def cond(st):
            return jnp.any(st[0])

        def body(st):
            return step(*st, mi, lane_read, b2l, ambl)

        alive, i, s, x0, x1, x2 = jax.lax.while_loop(
            cond, body, (alive, i, s, x0, x1, x2))
        return s, x0, x2

    from bwamem_tpu.pipeline.seeding_host import _compact_flat
    i32 = jnp.int32
    out_s = s
    out_x0 = x0
    out_x2 = x2
    orig = jnp.arange(M, dtype=i32)
    lr = lane_read.astype(i32)
    b2l, ambl = getseq(lr)
    over = jnp.zeros((), bool)
    # `need`: the smallest stage_w[0] that would have fit every stage's
    # survivors under the same halving ladder — the hwm the caller records
    need = jnp.zeros((), i32)
    for j, w in enumerate(stage_w):
        def kbody(_, st):
            return step(*st[:6], st[6], st[7], st[8], st[9]) + st[6:]

        alive, i, s, x0, x1, x2 = jax.lax.fori_loop(
            0, k_stage, kbody, (alive, i, s, x0, x1, x2, mi, lr, b2l, ambl),
            unroll=k_stage)[:6]
        # write back every lane's current result (final for dead lanes;
        # alive lanes get overwritten after later stages)
        out_s = out_s.at[orig].set(s, mode="drop")
        out_x0 = out_x0.at[orig].set(x0, mode="drop")
        out_x2 = out_x2.at[orig].set(x2, mode="drop")
        (i, s, x0, x1, x2, mi, lr, orig), n_al, o, _ = _compact_flat(
            alive, [(i, i32), (s, i32), (x0, it), (x1, it), (x2, it),
                    (mi, it), (lr, i32), (orig, i32)], w)
        over = over | o
        need = jnp.maximum(need, n_al.astype(i32) << j)
        lane_w = jnp.arange(w, dtype=i32)
        alive = lane_w < jnp.minimum(n_al, w)
        orig = jnp.where(alive, orig, M)
        b2l, ambl = getseq(lr)

    def cond(st):
        return jnp.any(st[0])

    def body(st):
        return step(*st[:6], mi, lr, b2l, ambl)

    alive, i, s, x0, x1, x2 = jax.lax.while_loop(
        cond, body, (alive, i, s, x0, x1, x2))
    out_s = out_s.at[orig].set(s, mode="drop")
    out_x0 = out_x0.at[orig].set(x0, mode="drop")
    out_x2 = out_x2.at[orig].set(x2, mode="drop")
    return out_s, out_x0, out_x2, over, need


def emit_mask(cand: Candidates, s: jax.Array) -> jax.Array:
    """Vectorized bwt_smem1a emission rule over per-read candidate buffers:
    a candidate is an SMEM iff it is its pivot's longest (last in slot order
    for that pivot) or its leftmost start is strictly left of the next-longer
    candidate's (bwt.c:331-337 containment check)."""
    N, C = cand.pivot.shape
    sl = s.reshape(N, C)
    slots = jnp.arange(C, dtype=jnp.int32)[None, :]
    valid = slots < cand.n[:, None]
    nxt_same_pivot = jnp.concatenate(
        [cand.pivot[:, 1:] == cand.pivot[:, :-1],
         jnp.zeros((N, 1), bool)], axis=1)
    nxt_valid = jnp.concatenate(
        [slots[:, 1:] < cand.n[:, None], jnp.zeros((N, 1), bool)], axis=1)
    s_next = jnp.concatenate([sl[:, 1:], sl[:, :1]], axis=1)
    is_last_of_pivot = ~(nxt_same_pivot & nxt_valid)
    return valid & (is_last_of_pivot | (sl < s_next))


def pass3_scan(fm: fmops.FM, seq: jax.Array, l_seq: jax.Array,
               min_len: int, max_intv: int, cap: int,
               pre: jax.Array = None, max_steps: int | None = None):
    """LAST-like 3rd pass (bwt_seed_strategy1, bwt.c:358-379): forward-only;
    emit the extended interval the first time its size drops below max_intv
    at length > min_len; restart at i+1.

    `pre` (from kmer_pre) fast-starts every restart 12 bases in.  EXACT
    when min_len >= 12 (caller must enforce): no emission can trigger at
    in-window lengths < min_len, ambiguous bases invalidate the window,
    and a zero-size window interval behaves like the scanned one (the
    length trigger, not the size, decides the restart position)."""
    N, L = seq.shape
    it = fm.L2.dtype
    rows = jnp.arange(N, dtype=jnp.int32)
    mi = jnp.asarray(max_intv, it)

    if L <= PACKED_L_MAX:
        b2a, amba = pack_seq(seq, None)

        def seq_at(pos):
            return jnp.where((pos >= 0) & (pos < l_seq),
                             base_at_packed(b2a, amba, pos), 4)
    else:
        def seq_at(pos):
            p = jnp.clip(pos, 0, L - 1)
            return jnp.where((pos >= 0) & (pos < l_seq),
                             seq[rows, p].astype(jnp.int32), 4)

    zero_t = jnp.zeros((N,), it)
    state = dict(
        phase=jnp.where(l_seq > 0, 0, 2).astype(jnp.int32),
        x=jnp.zeros((N,), jnp.int32), i=jnp.zeros((N,), jnp.int32),
        ik0=zero_t, ik1=zero_t, ik2=zero_t,
    )

    def cond(st):
        return jnp.any(st["phase"] < 2)

    def core(st):
        phase, x, i = st["phase"], st["x"], st["i"]
        ik0, ik1, ik2 = st["ik0"], st["ik1"], st["ik2"]

        init = phase == 0
        ext_pre = phase == 1
        q_at = seq_at(jnp.where(init, x, i))   # phases exclusive: 1 gather
        qx = q_at
        init_amb = init & (qx >= 4)
        init_ok = init & (qx < 4)
        s0, s1, s2 = fmops.set_intv(fm, jnp.clip(qx, 0, 3))
        if pre is not None:
            pk = pre[rows, jnp.clip(x, 0, L - 1)]          # [N, 3]
            jmp = init_ok & (pk[:, 2] >= 0)
            s0 = jnp.where(jmp, pk[:, 0], s0)
            s1 = jnp.where(jmp, pk[:, 1], s1)
            s2 = jnp.where(jmp, pk[:, 2], s2)
            i_init = jnp.where(jmp, x + KMER_K, x + 1)
        else:
            i_init = x + 1
        ik0 = jnp.where(init_ok, s0, ik0)
        ik1 = jnp.where(init_ok, s1, ik1)
        ik2 = jnp.where(init_ok, s2, ik2)
        i = jnp.where(init_ok, i_init, i)
        x = jnp.where(init_amb, x + 1, x)
        phase = jnp.where(init_ok, 1, phase)
        phase = jnp.where((phase == 0) & (x >= l_seq), 2, phase)

        ext = ext_pre
        qi = q_at
        at_end = ext & (i >= l_seq)            # return len, no emit
        amb = ext & (i < l_seq) & (qi >= 4)    # return i+1, no emit
        do_ext = ext & (i < l_seq) & (qi < 4)
        n0, n1, ns = fmops.extend(fm, ik0, ik1, ik2, is_back=False)
        c = jnp.clip(3 - qi, 0, 3)
        e0 = fmops._select4(n0, c)
        e1 = fmops._select4(n1, c)
        e2 = fmops._select4(ns, c)
        hit = do_ext & (e2 < mi) & ((i - x) >= min_len)
        emit = hit & (e2 > 0)

        vals = jnp.stack([e0, e2, x.astype(it), (i + 1).astype(it)],
                         axis=-1)

        cont = do_ext & ~hit
        ik0 = jnp.where(cont, e0, ik0)
        ik1 = jnp.where(cont, e1, ik1)
        ik2 = jnp.where(cont, e2, ik2)
        i = jnp.where(cont, i + 1, i)

        finish = at_end | amb | hit
        # next pivot: i+1 on hit/amb; len (done) on at_end
        x = jnp.where(amb | hit, i + 1, x)
        phase = jnp.where(finish, jnp.where(at_end | (x >= l_seq), 2, 0),
                          phase)
        return (dict(phase=phase, x=x, i=i, ik0=ik0, ik1=ik1, ik2=ik2),
                emit, vals)

    if max_steps is None:
        state.update(obuf=jnp.zeros((N, cap, 4), it),
                     n=jnp.zeros((N,), jnp.int32),
                     overflow=jnp.zeros((N,), bool))

        def body(st):
            nst, emit, vals = core(st)
            slot = jnp.where(emit & (st["n"] < cap), st["n"], cap)
            nst["obuf"] = st["obuf"].at[rows, slot, :].set(vals,
                                                           mode="drop")
            nst["n"] = st["n"] + (emit & (st["n"] < cap)).astype(jnp.int32)
            nst["overflow"] = st["overflow"] | (emit & (st["n"] >= cap))
            return nst

        st = jax.lax.while_loop(cond, body, state)
        steps = jnp.zeros((), jnp.int32)
        unfinished = jnp.zeros((), bool)
        ob, n_out, overflow = st["obuf"], st["n"], st["overflow"]
    else:
        state["steps"] = jnp.zeros((), jnp.int32)
        state["rec"] = jnp.zeros((max_steps, N, 5), it)

        def fbody(t, st):
            active = jnp.any(st["phase"] < 2)
            steps = st["steps"] + active.astype(jnp.int32)
            rec = st["rec"]
            nst, emit, vals = core(st)
            row = jnp.concatenate([emit[:, None].astype(it), vals],
                                  axis=-1)
            z = jnp.zeros_like(t)
            nst["rec"] = jax.lax.dynamic_update_slice(
                rec, row[None], (t, z, z))
            nst["steps"] = steps
            return nst

        st = jax.lax.fori_loop(0, max_steps, fbody, state, unroll=4)
        steps = st["steps"]
        unfinished = jnp.any(st["phase"] < 2)
        P = jnp.transpose(st["rec"], (1, 0, 2))       # [N, T, 5]
        emitm = P[:, :, 0] > 0
        ord_slot = jnp.cumsum(emitm.astype(jnp.int32), axis=1) - 1
        n_out = emitm.sum(axis=1).astype(jnp.int32)
        overflow = n_out > cap
        n_out = jnp.minimum(n_out, cap)
        rowsT = jnp.broadcast_to(rows[:, None], (N, max_steps))
        slot = jnp.where(emitm & (ord_slot < cap), ord_slot, cap)
        ob = jnp.zeros((N, cap, 4), it).at[rowsT, slot, :].set(
            P[:, :, 1:5], mode="drop")
    return (ob[:, :, 0], ob[:, :, 1], ob[:, :, 2].astype(jnp.int32),
            ob[:, :, 3].astype(jnp.int32), n_out, overflow,
            steps, unfinished)


class Intervals(NamedTuple):
    """Per-read collected seed intervals, sorted by (start, end) like
    ks_introsort(mem_intv) on info = start<<32|end (bwamem.c:184)."""
    start: jax.Array   # [N, I] int32
    end: jax.Array     # [N, I] int32
    x0: jax.Array      # [N, I] it — SA range start
    x2: jax.Array      # [N, I] it — occurrence count
    valid: jax.Array   # [N, I] bool
    overflow: jax.Array  # [N] bool


def collect_intervals(fm: fmops.FM, seq: jax.Array, l_seq: jax.Array,
                      min_seed_len: int, split_len: int, split_width: int,
                      max_mem_intv: int,
                      caps: SeedingCaps = SeedingCaps()) -> Intervals:
    """Full 3-pass mem_collect_intv (bwamem.c:137-185)."""
    N, L = seq.shape
    it = fm.L2.dtype
    one = jnp.ones((N,), it)

    # ---- pass 1 ----
    cand1 = forward_scan(fm, seq, l_seq, jnp.zeros((N,), jnp.int32), one,
                         caps.cand1, multi_pivot=True)
    lane_read1 = jnp.broadcast_to(
        jnp.arange(N, dtype=jnp.int32)[:, None], (N, caps.cand1))
    s1, sx0, sx2, valid1 = back_extend(
        fm, seq, l_seq, cand1, lane_read1,
        jnp.broadcast_to(one[:, None], (N, caps.cand1)))
    emit1 = emit_mask(cand1, s1)
    s1 = s1.reshape(N, caps.cand1)
    e1 = cand1.end
    len_ok1 = (e1 - s1) >= min_seed_len
    smem1 = emit1 & len_ok1
    sx0 = sx0.reshape(N, caps.cand1)
    sx2 = sx2.reshape(N, caps.cand1)

    # ---- pass 2: re-seed long low-occ SMEMs ----
    qual = smem1 & ((e1 - s1) >= split_len) & (sx2 <= split_width)
    # compact qualifying parents into [N, parents] slots
    order = jnp.argsort(~qual, axis=1, stable=True)[:, : caps.parents]
    rows = jnp.arange(N, dtype=jnp.int32)[:, None]
    p_valid = jnp.take_along_axis(qual, order, axis=1)
    p_start = jnp.take_along_axis(s1, order, axis=1)
    p_end = jnp.take_along_axis(e1, order, axis=1)
    p_size = jnp.take_along_axis(sx2, order, axis=1)
    parent_overflow = qual.sum(axis=1) > caps.parents

    NP = N * caps.parents
    lane_read2 = jnp.broadcast_to(rows, (N, caps.parents)).reshape(-1)
    pivot2 = ((p_start + p_end) >> 1).reshape(-1)
    min2 = (p_size + 1).reshape(-1).astype(it)
    l_seq2 = l_seq[lane_read2]
    seq2 = seq  # indexed through lane_read2 in scans below

    # single-pivot forward scan per parent lane
    c2 = forward_scan(fm, seq2[lane_read2], l_seq2,
                      jnp.where(p_valid.reshape(-1), pivot2, l_seq2),
                      min2, caps.cand2, multi_pivot=False)
    lane_read2b = jnp.broadcast_to(lane_read2[:, None], (NP, caps.cand2))
    min2b = jnp.broadcast_to(min2[:, None], (NP, caps.cand2))
    s2, sx0_2, sx2_2, valid2 = back_extend(
        fm, seq, l_seq, c2, lane_read2b, min2b)
    emit2 = emit_mask(c2, s2)
    s2 = s2.reshape(NP, caps.cand2)
    e2 = c2.end
    smem2 = emit2 & ((e2 - s2) >= min_seed_len)
    sx0_2 = sx0_2.reshape(NP, caps.cand2)
    sx2_2 = sx2_2.reshape(NP, caps.cand2)

    # ---- pass 3 ----
    if max_mem_intv > 0:
        p3x0, p3x2, p3s, p3e, p3n, p3over, _, _ = pass3_scan(
            fm, seq, l_seq, min_seed_len, max_mem_intv, caps.pass3)
        p3valid = jnp.arange(caps.pass3, dtype=jnp.int32)[None, :] < p3n[:, None]
    else:
        z = jnp.zeros((N, caps.pass3), it)
        p3x0, p3x2 = z, z
        p3s = jnp.zeros((N, caps.pass3), jnp.int32)
        p3e = jnp.zeros((N, caps.pass3), jnp.int32)
        p3valid = jnp.zeros((N, caps.pass3), bool)
        p3over = jnp.zeros((N,), bool)

    # ---- assemble + sort by (start, end) ----
    start = jnp.concatenate(
        [s1, s2.reshape(N, -1), p3s], axis=1)
    end = jnp.concatenate([e1, e2.reshape(N, -1), p3e], axis=1)
    x0 = jnp.concatenate([sx0, sx0_2.reshape(N, -1), p3x0], axis=1)
    x2 = jnp.concatenate([sx2, sx2_2.reshape(N, -1), p3x2], axis=1)
    valid = jnp.concatenate(
        [smem1, smem2.reshape(N, -1), p3valid], axis=1)

    key = (start.astype(jnp.int64) << 32) | end.astype(jnp.int64)
    key = jnp.where(valid, key, jnp.int64(2**62))
    order = jnp.argsort(key, axis=1, stable=True)
    take = lambda a: jnp.take_along_axis(a, order, axis=1)
    overflow = (cand1.overflow | c2.overflow.reshape(N, -1).any(axis=1)
                | parent_overflow | p3over)
    return Intervals(take(start), take(end), take(x0), take(x2),
                     take(valid), overflow)
