"""Flat speculative extension — the throughput path of mem_chain2aln.

The reference walks each read's work list sequentially because the
containment-skip test (bwamem.c:678-713) consults previously ACCEPTED
alignment regions.  The key observation for TPU: an item's extension result
does not depend on any other item — only its acceptance does.  So we:

  1. pull the device-computed work list (exact mem_chain2aln order),
  2. run ONE batched left-extension pass over every item (+ one compacted
     band-doubling retry pass), then one batched right-extension pass
     (h0 chains from the item's own left result),
  3. replay the sequential skip/accept logic on host with the extension
     results in hand — bit-identical to the reference, since a skipped
     item's (discarded) extension costs only device FLOPs.

This replaces the lockstep-rounds driver (ops/align_ext.extend_all, kept
for the in-jit single-program path) whose wall-clock scaled with the WORST
read's item count; here device work scales with the TOTAL item count and
lanes are shape-bucketed.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from bwamem_tpu.config import MemOptions
from bwamem_tpu.parallel import mesh as pmesh
from bwamem_tpu.pipeline import _shapes
from bwamem_tpu.finalize import AlnReg
from bwamem_tpu.ops import extend as extops
from bwamem_tpu.utils import fetchguard, timers


def _bucket(x: int, lo: int = 16) -> int:
    n = lo
    while n < x:
        n <<= 1
    return n


@functools.lru_cache(maxsize=8)
def _extend_flat_fn(mat_bytes: bytes, o_del: int, e_del: int, o_ins: int,
                    e_ins: int, zdrop: int):
    """Jitted flat extension kernel closing over a CONCRETE scoring matrix
    (extend_batch derives Python constants from it).

    Queries and targets are built ON DEVICE from the resident read batch
    and packed reference: each lane carries only (read row, q_start,
    q_sign, t_start, t_sign, lengths), so the host ships a few [B] vectors
    instead of [B, L] matrices through the transport (which dominated)."""
    mat = np.frombuffer(mat_bytes, np.int8).reshape(5, 5)

    @functools.partial(jax.jit, static_argnames=("lq_max", "t_max"))
    def fn(pac, l_pac, seqbatch, packed, *, lq_max, t_max):
        # ONE [10, B] i64 input per dispatch: every separate host array is
        # a separate H2D transfer on the tunneled backend (~tens of ms
        # apiece), which dominated the extension stage
        (lane_read, q_start, q_sign, qlen, t_start, t_sign, tlen, h0, w,
         end_bonus) = (packed[i] for i in range(10))
        i32 = jnp.int32
        lane_read = lane_read.astype(i32)
        qlen = qlen.astype(i32)
        tlen = tlen.astype(i32)
        h0 = h0.astype(i32)
        w = w.astype(i32)
        end_bonus = end_bonus.astype(i32)
        B = packed.shape[1]
        L = seqbatch.shape[1]
        j = jnp.arange(lq_max, dtype=jnp.int64)[None, :]
        qidx = q_start[:, None] + q_sign[:, None] * j
        query = jnp.where(
            j < qlen[:, None],
            seqbatch[lane_read[:, None],
                     jnp.clip(qidx, 0, L - 1).astype(i32)],
            4).astype(jnp.uint8)
        # target laid out [t_max, B]: the per-row access in the DP loop is
        # then a CONTIGUOUS row slice (a [B, t_max] column slice was a
        # strided per-row op that dominated the loop)
        ti = jnp.arange(t_max, dtype=jnp.int64)[:, None]
        pos = jnp.clip(t_start[None, :] + t_sign[None, :] * ti,
                       0, 2 * l_pac - 1)
        is_rev = pos >= l_pac
        fpos = jnp.where(is_rev, 2 * l_pac - 1 - pos, pos)
        word = pac[(fpos >> 4).astype(i32)]
        byte = (word >> (((fpos.astype(i32) & 15) >> 2) << 3).astype(
            jnp.uint32)) & 0xFF
        b = (byte >> (((3 - (fpos.astype(i32) & 3)) << 1).astype(
            jnp.uint32))) & 3
        b = jnp.where(is_rev, 3 - b.astype(i32), b.astype(i32))
        targetT = jnp.where(ti < tlen[None, :], b, 4).astype(jnp.uint8)

        def target_at(i):
            # scalar row index → contiguous row slice; rows past a lane's
            # tlen read padding, which extend_batch masks
            return jax.lax.dynamic_index_in_dim(
                targetT, jnp.minimum(i, t_max - 1), axis=0,
                keepdims=False).astype(i32)

        r = extops.extend_batch(query, qlen, target_at, tlen, h0, w,
                                end_bonus, mat, o_del=o_del, e_del=e_del,
                                o_ins=o_ins, e_ins=e_ins, zdrop=zdrop,
                                t_max=t_max)
        # ONE stacked output array → one D2H fetch per dispatch (the
        # tunneled backend charges a ~25 ms round-trip PER fetched array)
        return jnp.stack(list(r))

    return fn


def _qt_blocks_dev(pac, l_pac, seqbatch, lane_read, q_start, q_sign, qlen,
                   t_start, t_sign, tlen, *, lq_max, t_max):
    """Materialize the [lq_max, B] query and [t_max, B] target nt4 blocks
    on device from the resident read batch + packed reference (the Mosaic
    kernel consumes materialized blocks; see _extend_flat_fn_pl)."""
    i32 = jnp.int32
    L = seqbatch.shape[1]
    j = jnp.arange(lq_max, dtype=jnp.int64)[:, None]       # [LQ, 1]
    qidx = q_start[None, :] + q_sign[None, :] * j
    qT = jnp.where(
        j < qlen[None, :],
        seqbatch[lane_read[None, :],
                 jnp.clip(qidx, 0, L - 1).astype(i32)].astype(i32),
        4)
    ti = jnp.arange(t_max, dtype=jnp.int64)[:, None]
    pos = jnp.clip(t_start[None, :] + t_sign[None, :] * ti,
                   0, 2 * l_pac - 1)
    is_rev = pos >= l_pac
    fpos = jnp.where(is_rev, 2 * l_pac - 1 - pos, pos)
    word = pac[(fpos >> 4).astype(i32)]
    byte = (word >> (((fpos.astype(i32) & 15) >> 2) << 3).astype(
        jnp.uint32)) & 0xFF
    b = (byte >> (((3 - (fpos.astype(i32) & 3)) << 1).astype(
        jnp.uint32))) & 3
    b = jnp.where(is_rev, 3 - b.astype(i32), b.astype(i32))
    tT = jnp.where(ti < tlen[None, :], b, 4).astype(i32)
    return qT, tT


# tests flip this to run the fused Mosaic path in Pallas interpret mode on
# the CPU backend (parity vs the XLA host path); production never sets it
_PL_INTERPRET = False


@functools.lru_cache(maxsize=8)
def _extend_fused_fn(mat_bytes, o_del, e_del, o_ins, e_ins, zdrop, a,
                     pen_clip5, pen_clip3, w_opt, interpret=False):
    """ONE dispatch for the whole mem_chain2aln extension of a lane tile:
    left extension (+in-kernel band-doubling retry, bwamem.c:732-741),
    the left→right score handoff (h0 of the right pass = the selected
    left score, bwamem.c:744-753), and the right extension (+retry) —
    the reference runs this per seed inside one kernel
    (cuda/bwamem_GPU.cu:2616-2703); the previous host driver paid 4+
    sequential dispatch+fetch round trips (~25 ms each on the tunneled
    backend) per size class."""

    @functools.partial(jax.jit, static_argnames=("lq_max", "t_max"))
    def fn(pac, l_pac, seqbatch, packed, *, lq_max, t_max):
        from bwamem_tpu.ops import pallas_ext
        (lane_read, s_qb, s_len, s_rb, rmax0, rmax1, l_seq) = (
            packed[i] for i in range(7))
        i32 = jnp.int32
        B = packed.shape[1]
        lane_read = lane_read.astype(i32)
        neg1 = jnp.full((B,), -1, jnp.int64)
        pos1 = jnp.ones((B,), jnp.int64)
        kw = dict(mat_bytes=mat_bytes, o_del=o_del, e_del=e_del,
                  o_ins=o_ins, e_ins=e_ins, zdrop=zdrop, w_opt=w_opt,
                  interpret=interpret)

        # ---- left: reversed prefix vs [rmax0, s_rb) reversed ----
        qlen_l = s_qb.astype(i32)
        tlen_l = jnp.where(s_qb > 0, s_rb - rmax0, 0).astype(i32)
        h0_l = jnp.maximum(s_len * a, 1).astype(i32)
        qT, tT = _qt_blocks_dev(pac, l_pac, seqbatch, lane_read,
                                s_qb - 1, neg1, qlen_l, s_rb - 1, neg1,
                                tlen_l, lq_max=lq_max, t_max=t_max)
        eb5 = jnp.full((B,), pen_clip5, i32)
        L, retL = pallas_ext.extend_batch_pl2(
            qT, qlen_l, tT, tlen_l, h0_l, eb5, lq_max=lq_max, t_max=t_max,
            **kw)

        # h0 of the right pass: the accepted left score (bwamem.c:744)
        score_l = jnp.where(qlen_l > 0, L.score, (s_len * a).astype(i32))
        sc0 = jnp.maximum(score_l, 1)

        # ---- right: suffix vs [s_rb + s_len, rmax1) ----
        s_qe = s_qb + s_len
        qlen_r = (l_seq - s_qe).astype(i32)
        tlen_r = jnp.where(s_qe < l_seq, rmax1 - (s_rb + s_len),
                           0).astype(i32)
        qT, tT = _qt_blocks_dev(pac, l_pac, seqbatch, lane_read,
                                s_qe, pos1, qlen_r, s_rb + s_len, pos1,
                                tlen_r, lq_max=lq_max, t_max=t_max)
        eb3 = jnp.full((B,), pen_clip3, i32)
        R, retR = pallas_ext.extend_batch_pl2(
            qT, qlen_r, tT, tlen_r, sc0, eb3, lq_max=lq_max, t_max=t_max,
            **kw)
        # ONE stacked output → one D2H fetch for the entire stage
        return jnp.stack([L.score, L.qle, L.tle, L.gtle, L.gscore,
                          L.max_off, retL, R.score, R.qle, R.tle, R.gtle,
                          R.gscore, R.max_off, retR])

    return fn


@functools.lru_cache(maxsize=8)
def _extend_flat_fn_pl(mat_bytes: bytes, o_del: int, e_del: int, o_ins: int,
                       e_ins: int, zdrop: int):
    """TPU path: same on-device query/target construction as
    _extend_flat_fn, but the DP loop runs as the Mosaic kernel
    (ops/pallas_ext.extend_batch_pl — cf. the warp-wavefront
    ksw_extend_warp, reference cuda/ksw_CUDA.cu:426-541).  The query and
    target blocks are MATERIALIZED [L, B] arrays here: under XLA the
    per-row target slice re-fused the pac gather into every loop
    iteration, which multiplied its cost by the row count."""

    @functools.partial(jax.jit, static_argnames=("lq_max", "t_max"))
    def fn(pac, l_pac, seqbatch, packed, *, lq_max, t_max):
        from bwamem_tpu.ops import pallas_ext
        (lane_read, q_start, q_sign, qlen, t_start, t_sign, tlen, h0, w,
         end_bonus) = (packed[i] for i in range(10))
        i32 = jnp.int32
        lane_read = lane_read.astype(i32)
        qlen = qlen.astype(i32)
        tlen = tlen.astype(i32)
        h0 = h0.astype(i32)
        w = w.astype(i32)
        end_bonus = end_bonus.astype(i32)
        B = packed.shape[1]
        L = seqbatch.shape[1]
        j = jnp.arange(lq_max, dtype=jnp.int64)[:, None]       # [LQ, 1]
        qidx = q_start[None, :] + q_sign[None, :] * j
        qT = jnp.where(
            j < qlen[None, :],
            seqbatch[lane_read[None, :],
                     jnp.clip(qidx, 0, L - 1).astype(i32)].astype(i32),
            4)
        ti = jnp.arange(t_max, dtype=jnp.int64)[:, None]
        pos = jnp.clip(t_start[None, :] + t_sign[None, :] * ti,
                       0, 2 * l_pac - 1)
        is_rev = pos >= l_pac
        fpos = jnp.where(is_rev, 2 * l_pac - 1 - pos, pos)
        word = pac[(fpos >> 4).astype(i32)]
        byte = (word >> (((fpos.astype(i32) & 15) >> 2) << 3).astype(
            jnp.uint32)) & 0xFF
        b = (byte >> (((3 - (fpos.astype(i32) & 3)) << 1).astype(
            jnp.uint32))) & 3
        b = jnp.where(is_rev, 3 - b.astype(i32), b.astype(i32))
        tT = jnp.where(ti < tlen[None, :], b, 4).astype(i32)
        r = pallas_ext.extend_batch_pl(
            qT, qlen, tT, tlen, h0, w, end_bonus, lq_max=lq_max,
            t_max=t_max, mat_bytes=mat_bytes, o_del=o_del, e_del=e_del,
            o_ins=o_ins, e_ins=e_ins, zdrop=zdrop)
        return jnp.stack(list(r))

    return fn


def ref_base_np(pac: np.ndarray, l_pac: int, pos: np.ndarray) -> np.ndarray:
    """Vectorized both-strands base gather (bns_get_seq semantics)."""
    is_rev = pos >= l_pac
    fpos = np.where(is_rev, 2 * l_pac - 1 - pos, pos)
    fpos = np.clip(fpos, 0, l_pac - 1)
    b = (pac[fpos >> 2] >> (((~fpos) & 3) << 1).astype(np.uint8)) & 3
    return np.where(is_rev, 3 - b, b).astype(np.uint8)


def cal_max_gap(opt: MemOptions, qlen: int) -> int:
    """cal_max_gap (bwamem.c:628-637), C truncation semantics."""
    l_del = int((qlen * opt.a - opt.o_del) / opt.e_del + 1.)
    l_ins = int((qlen * opt.a - opt.o_ins) / opt.e_ins + 1.)
    l = max(l_del, l_ins, 1)
    return min(l, opt.w << 1)


class _ExtBatcher:
    """Runs a set of extension lanes through the jitted kernel, bucketed by
    (LQ, LT) shape class so one slow lane cannot stall thousands.

    Targets are NOT materialized up front: each lane carries (t_start,
    t_sign) into the reference and the per-class target block gathers only
    the Σ tlen bases that exist (a full [M, LTmax] pac gather dominated the
    whole pipeline before)."""

    def __init__(self, opt: MemOptions, mat, end_bonus: int, pac_dev,
                 l_pac: int, seq_dev, mesh=None):
        self.opt = opt
        self.mat = mat
        self.end_bonus = end_bonus
        self.pac_dev = pac_dev
        self.l_pac = l_pac
        self.seq_dev = seq_dev
        self.mesh = mesh

    FIELDS = ("score", "qle", "tle", "gtle", "gscore", "max_off")

    def submit(self, lane_read, q_start, q_sign, qlen, t_start, t_sign,
               tlen, h0, w):
        """Enqueue all device dispatches for these lanes WITHOUT fetching.
        Returns an opaque plan for drain(); dispatches of several submits
        overlap, so their D2H round-trips amortize."""
        M = len(qlen)
        plan = {"M": M, "parts": []}
        if M == 0:
            return plan
        use_pl = not _shapes._is_cpu()
        make = _extend_flat_fn_pl if use_pl else _extend_flat_fn
        base_fn = make(
            np.asarray(self.mat, np.int8).tobytes(), self.opt.o_del,
            self.opt.e_del, self.opt.o_ins, self.opt.e_ins, self.opt.zdrop)
        mesh = getattr(self, "mesh", None)
        if mesh is None:
            fn = base_fn
        else:
            def fn(*args, lq_max, t_max):
                # shard SW lanes over the mesh; pac/read batch replicated,
                # the packed [10, B] lane array split along B
                f = pmesh.rowmap(mesh, base_fn,
                                 (("lq_max", lq_max), ("t_max", t_max)),
                                 (True, True, True, "ax1"),
                                 stacked_out=True)
                return f(*args)
        # long-read lanes: the Mosaic kernel's (h << 12) | col packing and
        # L1p VMEM rows cap queries at 4095 and scores at 2^18; route wider
        # lanes through the XLA extend (whose packing shift widens with LQ,
        # ops/extend.py SH) — this is the mem long-read path
        # (bwamem.c:730-741 handles arbitrary lengths; >4kb reads used to
        # be rejected here)
        max_mat = int(np.max(np.asarray(self.mat)))
        need = h0.astype(np.int64) + qlen.astype(np.int64) * max_mat
        long_sel = (qlen > 4095) | (need >= (1 << 18))
        if long_sel.any():
            lqb = _bucket(int(qlen[long_sel].max()), lo=16)
            sh = max(12, int(lqb).bit_length())
            if int(need[long_sel].max()) >= (1 << (31 - sh)):
                raise ValueError(
                    "extension score bound exceeded even for the widened "
                    "packing: %d >= 2^%d; lower -A" %
                    (int(need.max()), 31 - sh))
            xla_fn = _extend_flat_fn(
                np.asarray(self.mat, np.int8).tobytes(), self.opt.o_del,
                self.opt.e_del, self.opt.o_ins, self.opt.e_ins,
                self.opt.zdrop)
            idx = np.nonzero(long_sel)[0]
            B = _shapes.lanes(idx.size, fine_lo=8, coarse_lo=8)
            LT = _bucket(max(int(tlen[idx].max()), 1), lo=16)
            packed = np.zeros((10, B), np.int64)
            packed[2, idx.size:] = 1
            packed[5, idx.size:] = 1
            packed[7, idx.size:] = 1
            packed[8, idx.size:] = self.opt.w
            packed[9] = self.end_bonus
            for r_, a in enumerate((lane_read, q_start, q_sign, qlen,
                                    t_start, t_sign, tlen, h0, w)):
                packed[r_, : idx.size] = a[idx]
            timers.count("dispatch.extend_long")
            res = xla_fn(self.pac_dev, self.l_pac, self.seq_dev,
                         jnp.asarray(packed), lq_max=lqb, t_max=LT)
            plan["parts"].append((idx, res))
        elig = ~long_sel
        # size classes by target length (the while_loop row count)
        classes = [64, 256, max(1024, _bucket(int(tlen.max()) if M else 1))]
        lq_fixed = _bucket(max(int(qlen[elig].max()) if elig.any() else 1,
                               1), lo=16)
        assigned = ~elig
        for tcap in classes:
            sel = (~assigned) & (tlen <= tcap)
            assigned |= sel
            cls_idx = np.nonzero(sel)[0]
            if cls_idx.size == 0:
                continue
            if _shapes._is_cpu():
                # snug classes: padded rows/cols are real compute on CPU
                LQ = _bucket(max(int(qlen[cls_idx].max()), 1), lo=16)
                LT = _bucket(max(min(tcap, int(tlen[cls_idx].max())), 1),
                             lo=16)
                tile = _shapes.LANE_TILE
            else:
                # exact class width: stable shape vocabulary; big lane
                # tiles (Mosaic compiles in ~1 s/shape, and every extra
                # dispatch pays the tunnel's per-fetch round-trip)
                LQ = lq_fixed
                LT = tcap
                tile = _shapes.PL_LANE_TILE

            for s0, c in _shapes.chunks(cls_idx.size, tile):
                idx = cls_idx[s0:s0 + c]
                B = _shapes.lanes(idx.size, fine_lo=8, coarse_lo=512)

                # ONE [10, B] H2D transfer per dispatch (separate arrays
                # each pay the tunnel's per-transfer round trip)
                packed = np.zeros((10, B), np.int64)
                packed[2, idx.size:] = 1      # q_sign pad
                packed[5, idx.size:] = 1      # t_sign pad
                packed[7, idx.size:] = 1      # h0 pad
                packed[8, idx.size:] = self.opt.w
                packed[9] = self.end_bonus
                for r_, a in enumerate((lane_read, q_start, q_sign, qlen,
                                        t_start, t_sign, tlen, h0, w)):
                    packed[r_, : idx.size] = a[idx]
                timers.count("dispatch.extend")
                res = fn(self.pac_dev, self.l_pac, self.seq_dev,
                         jnp.asarray(packed),
                         lq_max=LQ, t_max=LT)      # [6, B] stacked
                try:
                    res.copy_to_host_async()
                except Exception:
                    pass
                plan["parts"].append((idx, res))
        return plan

    @staticmethod
    def drain(plan):
        """Fetch all results of a submit() plan → dict of [M] arrays."""
        M = plan["M"]
        out = {k: np.zeros(M, np.int32) for k in _ExtBatcher.FIELDS}
        for idx, res in plan["parts"]:
            arr = fetchguard.fetch([res], what="extend")[0]
            timers.add_bytes("d2h.extend", arr.nbytes)
            for fi, k in enumerate(_ExtBatcher.FIELDS):
                out[k][idx] = arr[fi, : idx.size]
        return out

    def run(self, lane_read, q_start, q_sign, qlen, t_start, t_sign, tlen,
            h0, w):
        """All arrays [M]; returns dict of result arrays [M]."""
        return self.drain(self.submit(lane_read, q_start, q_sign, qlen,
                                      t_start, t_sign, tlen, h0, w))


def _extend_side(batcher, opt, lane_read, q_start, q_sign, qlen, t_start,
                 t_sign, tlen, h0):
    """MAX_BAND_TRY band-doubling (bwamem.c:732-741): pass 1 at w, retry at
    2w for lanes with max_off >= (w>>1)+(w>>2); returns results + aw."""
    M = len(qlen)
    w1 = np.full(M, opt.w, np.int32)
    r1 = batcher.run(lane_read, q_start, q_sign, qlen, t_start, t_sign,
                     tlen, h0, w1)
    retry = r1["max_off"] >= ((opt.w >> 1) + (opt.w >> 2))
    # reference break: `if (a->score == prev) break` (bwamem.c:735,741) —
    # prev is the score entering the pass (h0: seed score on the left,
    # left-extension score on the right)
    retry &= r1["score"] != h0
    retry &= qlen > 0
    aw = np.where(retry, opt.w * 2, opt.w).astype(np.int32)
    idx = np.nonzero(retry)[0]
    if idx.size:
        r2 = batcher.run(lane_read[idx], q_start[idx], q_sign[idx],
                         qlen[idx], t_start[idx], t_sign[idx], tlen[idx],
                         h0[idx], np.full(idx.size, opt.w * 2, np.int32))
        for k in r1:
            r1[k][idx] = r2[k]
    return r1, aw


def _extend_both_fused(al, opt, mat, seq_dev, ii, s_qb, s_len, s_rb, rmax0,
                       rmax1, l_seq):
    """TPU driver for _extend_fused_fn: classes lanes by the larger of the
    two target spans, ships ONE [7, B] array per tile, fetches ONE [14, B]
    result.  Returns (L results, aw0, R results, aw1) shaped like two
    _extend_side calls."""
    M = len(ii)
    mat_np = np.asarray(mat, np.int8)
    base_fn = _extend_fused_fn(
        mat_np.tobytes(), opt.o_del, opt.e_del, opt.o_ins, opt.e_ins,
        opt.zdrop, opt.a, opt.pen_clip5, opt.pen_clip3, opt.w,
        interpret=_PL_INTERPRET)
    mesh = getattr(al, "mesh", None)
    if mesh is None:
        fn = base_fn
    else:
        def fn(*args, lq_max, t_max):
            f = pmesh.rowmap(mesh, base_fn,
                             (("lq_max", lq_max), ("t_max", t_max)),
                             (True, True, True, "ax1"), stacked_out=True)
            return f(*args)

    qlen_l = s_qb.astype(np.int64)
    qlen_r = (l_seq - (s_qb + s_len)).astype(np.int64)
    # the (h << 12) | col packing bound (see _ExtBatcher.submit): the right
    # pass starts from the left result, so both windows count
    max_mat = int(mat_np.max())
    hi = int((np.maximum(s_len * opt.a, 1)
              + (qlen_l + qlen_r) * max_mat).max()) if M else 0
    if hi >= (1 << 18):
        raise ValueError(
            "extension score bound exceeded: %d >= 2^18; lower -A or "
            "split the read" % hi)
    tlen_l = np.where(s_qb > 0, s_rb - rmax0, 0)
    tlen_r = np.where(s_qb + s_len < l_seq, rmax1 - (s_rb + s_len), 0)
    tspan = np.maximum(tlen_l, tlen_r)
    lq_fixed = _bucket(max(int(max(qlen_l.max(), qlen_r.max())), 1), lo=16)

    classes = [64, 256, max(1024, _bucket(int(tspan.max()) if M else 1))]
    assigned = np.zeros(M, bool)
    parts = []
    for tcap in classes:
        sel = (~assigned) & (tspan <= tcap)
        assigned |= sel
        cls_idx = np.nonzero(sel)[0]
        if cls_idx.size == 0:
            continue
        for s0, c in _shapes.chunks(cls_idx.size, _shapes.PL_LANE_TILE):
            idx = cls_idx[s0:s0 + c]
            # the Mosaic kernel tiles lanes in blocks of TB=128
            B = max(_shapes.lanes(idx.size, fine_lo=8, coarse_lo=512), 128)
            packed = np.zeros((7, B), np.int64)
            for r_, a_ in enumerate((ii, s_qb, s_len, s_rb, rmax0, rmax1,
                                     l_seq)):
                packed[r_, : idx.size] = a_[idx]
            timers.count("dispatch.extend_fused")
            res = fn(al.fm.pac, al.l_pac, seq_dev,
                     jnp.asarray(packed), lq_max=lq_fixed, t_max=tcap)
            try:
                res.copy_to_host_async()
            except Exception:
                pass
            parts.append((idx, res))

    FIELDS = _ExtBatcher.FIELDS
    L = {k: np.zeros(M, np.int32) for k in FIELDS}
    R = {k: np.zeros(M, np.int32) for k in FIELDS}
    aw0 = np.full(M, opt.w, np.int32)
    aw1 = np.full(M, opt.w, np.int32)
    for idx, res in parts:
        arr = fetchguard.fetch([res], what="extend_fused")[0]
        timers.add_bytes("d2h.extend", arr.nbytes)
        k = idx.size
        for fi, name in enumerate(FIELDS):
            L[name][idx] = arr[fi, :k]
            R[name][idx] = arr[7 + fi, :k]
        aw0[idx] = np.where(arr[6, :k] != 0, opt.w * 2, opt.w)
        aw1[idx] = np.where(arr[13, :k] != 0, opt.w * 2, opt.w)
    return L, aw0, R, aw1


def extend_regions(al, reads, seq: np.ndarray, wr) -> list[list[AlnReg]]:
    """al: Aligner; reads: list[Read]; seq: packed [N, L] nt4 for THESE
    reads; wr: WorklistNp.  Returns per-read AlnReg lists in mem_chain2aln
    emission order."""
    opt: MemOptions = al.opt
    l_pac = al.l_pac
    n = len(reads)
    mat = opt.mat
    seq_dev = jnp.asarray(seq)

    # ---- flatten work items ----
    n_items = wr.wl_n
    ii, kk = [], []
    for i in range(n):
        c = int(n_items[i])
        if c:
            ii.extend([i] * c)
            kk.extend(range(c))
    M = len(ii)
    regs_out: list[list[AlnReg]] = [[] for _ in range(n)]
    if M == 0:
        return regs_out
    ii = np.asarray(ii, np.int32)
    kk = np.asarray(kk, np.int32)
    slot = wr.wl_slot[ii, kk]
    chn = wr.wl_chain[ii, kk]
    s_qb = wr.seeds.qbeg[ii, slot].astype(np.int64)
    s_len = wr.seeds.len[ii, slot].astype(np.int64)
    s_rb = wr.seeds.rbeg[ii, slot].astype(np.int64)
    rmax0 = wr.rmax0[ii, chn].astype(np.int64)
    rmax1 = wr.rmax1[ii, chn].astype(np.int64)
    rid = wr.chain_rid[ii, chn]
    l_seq = np.asarray([reads[i].l_seq for i in range(n)], np.int64)[ii]

    # ---- left extension lanes (reversed prefixes) ----
    lql = s_qb.astype(np.int32)
    ltl = np.where(s_qb > 0, s_rb - rmax0, 0).astype(np.int32)
    h0 = np.maximum(s_len * opt.a, 1).astype(np.int32)
    neg1 = np.full(M, -1, np.int64)
    mesh = getattr(al, "mesh", None)
    # the Mosaic kernel holds eh rows in VMEM and packs (h<<12)|col —
    # queries beyond 4095 take the side path, whose _ExtBatcher routes
    # oversized lanes through the width-adaptive XLA extend (long reads)
    fused = ((not _shapes._is_cpu()) or _PL_INTERPRET) and \
        int(l_seq.max() if M else 0) <= 4095
    if fused:
        # ONE dispatch per lane tile covers left + retry + right + retry
        with timers.section("ext.fused"):
            L, aw0, R, aw1 = _extend_both_fused(
                al, opt, mat, seq_dev, ii, s_qb, s_len, s_rb, rmax0,
                rmax1, l_seq)
    else:
        batcherL = _ExtBatcher(opt, mat, opt.pen_clip5, al.fm.pac, l_pac,
                               seq_dev, mesh=mesh)
        with timers.section("ext.left"):
            L, aw0 = _extend_side(batcherL, opt, ii, s_qb - 1, neg1, lql,
                                  s_rb - 1, neg1, ltl, h0)

    has_left = s_qb > 0
    loc_l = (L["gscore"] <= 0) | (L["gscore"] <= L["score"] - opt.pen_clip5)
    score_l = np.where(has_left, L["score"], (s_len * opt.a)).astype(np.int64)
    n_qb = np.where(has_left, np.where(loc_l, s_qb - L["qle"], 0), 0)
    n_rb = np.where(has_left,
                    np.where(loc_l, s_rb - L["tle"], s_rb - L["gtle"]),
                    s_rb)
    truesc_l = np.where(has_left,
                        np.where(loc_l, L["score"], L["gscore"]),
                        s_len * opt.a).astype(np.int64)
    aw0 = np.where(has_left, aw0, opt.w)

    # ---- right extension lanes ----
    s_qe = s_qb + s_len
    rql = (l_seq - s_qe).astype(np.int32)
    rtl = np.where(s_qe < l_seq, rmax1 - (s_rb + s_len), 0).astype(np.int32)
    sc0 = np.maximum(score_l, 1).astype(np.int32)
    pos1 = np.ones(M, np.int64)
    if not fused:
        batcherR = _ExtBatcher(opt, mat, opt.pen_clip3, al.fm.pac, l_pac,
                               seq_dev, mesh=mesh)
        with timers.section("ext.right"):
            R, aw1 = _extend_side(batcherR, opt, ii, s_qe, pos1, rql,
                                  s_rb + s_len, pos1, rtl, sc0)

    has_right = s_qe < l_seq
    loc_r = (R["gscore"] <= 0) | (R["gscore"] <= R["score"] - opt.pen_clip3)
    score_f = np.where(has_right, R["score"], score_l).astype(np.int64)
    n_qe = np.where(has_right,
                    np.where(loc_r, s_qe + R["qle"], l_seq), l_seq)
    n_re = np.where(has_right,
                    np.where(loc_r, s_rb + s_len + R["tle"],
                             s_rb + s_len + R["gtle"]),
                    s_rb + s_len)
    truesc_f = truesc_l + np.where(
        has_right, np.where(loc_r, R["score"] - sc0, R["gscore"] - sc0), 0)
    aw1 = np.where(has_right, aw1, opt.w)
    n_w = np.maximum(aw0, aw1)

    # ---- sequential replay (skip/accept, bwamem.c:674-713) ----
    _t_replay = timers.section("ext.replay")
    _t_replay.__enter__()
    # items are emitted grouped by read in k order, so item m of read i is
    # base[i] + k; per-item state is pulled into Python lists ONCE (scalar
    # numpy indexing per item dominated this loop in the batch profile)
    base = np.zeros(n + 1, np.int64)
    np.cumsum(np.asarray(n_items[:n], np.int64), out=base[1:])

    # seedcov (bwamem.c:781-786) for every item, vectorized: [M, S] seed
    # table gathered per item vs its own extended region bounds; it depends
    # only on the extension result, not on accept/skip decisions
    sd_qb_a = wr.seeds.qbeg[ii].astype(np.int64)          # [M, S]
    sd_len_a = wr.seeds.len[ii].astype(np.int64)
    sd_rb_a = wr.seeds.rbeg[ii].astype(np.int64)
    in_ch_a = wr.seeds.valid[ii] & (wr.seed_chain[ii] == chn[:, None])
    cov_a = ((sd_qb_a >= n_qb[:, None])
             & (sd_qb_a + sd_len_a <= n_qe[:, None])
             & (sd_rb_a >= n_rb[:, None])
             & (sd_rb_a + sd_len_a <= n_re[:, None]) & in_ch_a)
    seedcov_a = np.where(cov_a, sd_len_a, 0).sum(axis=1).tolist()

    s_rb_l, s_qb_l, s_len_l = s_rb.tolist(), s_qb.tolist(), s_len.tolist()
    n_qb_l, n_rb_l = n_qb.tolist(), n_rb.tolist()
    n_qe_l, n_re_l = n_qe.tolist(), n_re.tolist()
    score_l_, truesc_l_, n_w_l = score_f.tolist(), truesc_f.tolist(), \
        np.asarray(n_w).tolist()
    rid_l, chn_l = rid.tolist(), chn.tolist()
    frac_rep_raw = wr.seeds.frac_rep[:n].tolist()

    for i in range(n):
        c = int(n_items[i])
        if c == 0:
            continue
        b0 = int(base[i])
        lq = reads[i].l_seq
        # per-chain srt bookkeeping: worklist items of one chain appear in
        # srt-descending order; exception scan looks at EARLIER (longer)
        # items of the same chain whose mark is still set
        marks = [True] * c
        chain_items = {}     # chain -> [work indices in order]
        for k in range(c):
            chain_items.setdefault(chn_l[b0 + k], []).append(k)
        regs = regs_out[i]
        frac_rep = float(frac_rep_raw[i]) / max(lq, 1)
        for k in range(c):
            m = b0 + k
            srb, sqb, slen = s_rb_l[m], s_qb_l[m], s_len_l[m]
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
                mates = chain_items[chn_l[m]]
                pos = mates.index(k)
                differs = False
                for k2 in mates[:pos][::-1]:   # earlier = longer, srt asc
                    if not marks[k2]:
                        continue
                    m2 = b0 + k2
                    tq, tr, tl_ = s_qb_l[m2], s_rb_l[m2], s_len_l[m2]
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
            r.rid = rid_l[m]
            r.qb, r.rb = n_qb_l[m], n_rb_l[m]
            r.qe, r.re = n_qe_l[m], n_re_l[m]
            r.score = score_l_[m]
            r.truesc = truesc_l_[m]
            r.w = n_w_l[m]
            r.seedlen0 = slen
            r.frac_rep = frac_rep
            r.seedcov = seedcov_a[m]
            regs.append(r)
    _t_replay.__exit__(None, None, None)
    return regs_out
