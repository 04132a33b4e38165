"""FM-index primitives as batched JAX ops.

The reference computes occ() one rank at a time with 64-bit popcount tricks
inside each thread (bwt.c:98-220, cuda/bwt_CUDA.cu:38-179).  On TPU the same
math is a *batched* gather of one occ-checkpoint row + one 8-word BWT block
row per query, followed by vectorized 2-bit-match popcounts on the VPU — no
per-element loops.

Layout (built by bwamem_tpu.index.build):
  bwt  : uint32 [n_blocks, 8]   — 128 bases per block, base i of word w at
                                  bit (15-(i&15))*2 (same packing as bwt.h:74)
  occ  : it    [n_blocks+1, 4]  — counts of each base in B[0:128*b)
  L2   : it    [5]              — cumulative symbol counts, C() array
  sa   : it    [n_sa]           — SA_full[r] for r % sa_intv == 0
`it` is int32 for seq_len < 2^31 (small genomes) else int64 — the reference
always uses uint64 (bwtint_t, bwt.h:46); we narrow when safe for VPU speed.

Conventions match the reference exactly:
  * occ4(k) counts B[0..k] INCLUSIVE with the $-position adjustment
    k -= (k >= primary) and occ4(-1) == 0 (bwt_occ4, bwt.c:169-186);
  * extend() is the bidirectional bwt_extend (bwt.c:262-275): intervals are
    (x0, x1, size) triples; is_back=False extends the match on the RIGHT via
    the reverse-complement coordinate x1 (callers pass c = 3 - base).
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

OCC_INTV_SHIFT = 7
OCC_INTERVAL = 128


@functools.partial(jax.tree_util.register_dataclass,
                   data_fields=["cmb", "L2", "sa", "primary",
                                "seq_len", "l_pac", "pac", "kmer"],
                   meta_fields=["sa_intv", "i64"])
@dataclasses.dataclass(frozen=True)
class FM:
    """Device FM-index.

    cmb packs the occ checkpoint row AND the 128-base BWT block into ONE
    row so every occ query is a single HBM gather — the same cache-line
    interleaving idea as the reference's on-disk layout (bwt.h:74-82,
    bwt_bwtupdate_core), re-derived for the TPU where the per-gather-op
    cost dominates.  Layout per row (all uint32):
      words 0-3   occ counts of A/C/G/T in B[0 : 128*b)  (low 32 bits)
      words 4-11  the 2-bit-packed BWT block
      words 12-15 (i64 indexes only) high 32 bits of the occ counts
    """
    cmb: jax.Array       # uint32 [nb, 12] (or [nb, 16] when i64)
    L2: jax.Array        # it [5]
    sa: jax.Array        # it [n_sa]
    primary: jax.Array   # it []
    seq_len: jax.Array   # it []
    l_pac: jax.Array     # it []
    pac: jax.Array       # uint32 [ceil(l_pac/16)] packed forward 2-bit ref
    # optional k-mer-12 fast-start table [4^12, 3] it (x0, x1, size): the
    # bi-interval after the first 12 forward extensions of an SMEM search
    # (reference kmers_index/hashKMer.hpp:58-81, used at
    # cuda/bwt_CUDA.cu:253-258).  None when the index was built without it.
    kmer: jax.Array | None = None
    sa_intv: int = 32    # static (power of two)
    i64: bool = False    # static: 64-bit occ counts (genomes >= 2^31)


def fm_from_index(idx) -> FM:
    """Host BwaIndex → device-ready FM pytree (numpy; jax.device_put by
    caller with the desired sharding)."""
    it = idx.itype
    i64 = it == np.int64
    nb = (idx.seq_len + OCC_INTERVAL - 1) // OCC_INTERVAL
    words = np.zeros((nb, 8), dtype=np.uint32)
    flat = idx.bwt_words
    words.reshape(-1)[: len(flat)] = flat
    occ = idx.occ[:nb].astype(np.uint64)
    cols = [occ.astype(np.uint32), words.view(np.uint32)]
    if i64:
        cols.append((occ >> 32).astype(np.uint32))
    cmb = np.concatenate(cols, axis=1)
    pac_bytes = np.concatenate(
        [idx.pac, np.zeros((-len(idx.pac)) % 4, dtype=np.uint8)])
    pac_words = pac_bytes.view(np.uint32)
    kmer = None
    if idx.kmer_table is not None:
        x0, x1, sz = idx.kmer_table
        kmer = np.stack([x0.astype(it), x1.astype(it), sz.astype(it)],
                        axis=1)
    return FM(
        kmer=kmer,
        cmb=cmb,
        L2=idx.L2.astype(it),
        sa=idx.sa_samples.astype(it),
        primary=np.asarray(idx.primary, dtype=it),
        seq_len=np.asarray(idx.seq_len, dtype=it),
        l_pac=np.asarray(idx.l_pac, dtype=it),
        pac=pac_words,
        sa_intv=idx.sa_intv,
        i64=i64,
    )


def to_device(fm: FM, sharding=None) -> FM:
    """Place the FM pytree on device (replicated under `sharding` if given).
    Required before use inside jit/while_loop — host NumPy arrays cannot be
    indexed by traced values."""
    put = (lambda a: jax.device_put(a, sharding)) if sharding is not None \
        else jnp.asarray
    return jax.tree.map(put, fm)


_WORD_OFFS = np.arange(8, dtype=np.int32) * 16  # base offset of each word


def _block_counts(words: jax.Array, m: jax.Array, it) -> jax.Array:
    """Counts of each base among the first `m` bases of a 128-base block.

    words: uint32 [..., 8]; m: int [...] in [0, 128].  Returns it [..., 4].
    """
    cnt = jnp.clip(m[..., None] - _WORD_OFFS, 0, 16)          # bases per word
    shift = jnp.clip((16 - cnt) * 2, 0, 31).astype(jnp.uint32)
    mask = jnp.where(cnt == 0, jnp.uint32(0),
                     jnp.uint32(0xFFFFFFFF) << shift)
    w = words & mask
    outs = []
    for c in range(4):
        y1 = w if c & 2 else ~w
        y0 = w if c & 1 else ~w
        match = (y1 >> 1) & y0 & jnp.uint32(0x55555555)
        outs.append(jax.lax.population_count(match).sum(-1, dtype=it))
    outs[0] = outs[0] - (128 - m).astype(it)  # masked-out zero bits read as A
    return jnp.stack(outs, axis=-1)


def _row(fm: FM, blk: jax.Array):
    """ONE combined-row gather → (occ_base it [...,4], bwt words [...,8])."""
    it = fm.L2.dtype
    row = fm.cmb[blk]
    if fm.i64:
        base = (row[..., 12:16].astype(jnp.int64) << 32) | \
            row[..., :4].astype(jnp.int64)
        base = base.astype(it)
    else:
        base = row[..., :4].astype(it)
    return base, row[..., 4:12]


def _select4(vals4: jax.Array, c: jax.Array) -> jax.Array:
    """vals4[..., c] without a gather (masked reduce over 4 lanes)."""
    sel = jnp.arange(4, dtype=jnp.int32) == c[..., None]
    return jnp.where(sel, vals4, 0).sum(-1, dtype=vals4.dtype)


def _select8(vals8: jax.Array, c: jax.Array) -> jax.Array:
    sel = jnp.arange(8, dtype=jnp.int32) == c[..., None]
    return jnp.where(sel, vals8, 0).sum(-1, dtype=vals8.dtype)


def occ4(fm: FM, k: jax.Array) -> jax.Array:
    """Counts of each base in B[0..k] inclusive; k == -1 → 0.  [..., 4]."""
    it = fm.L2.dtype
    valid = k >= 0
    kk = k - (k >= fm.primary).astype(k.dtype)
    kk = jnp.clip(kk, 0, fm.seq_len - 1)
    blk = (kk >> OCC_INTV_SHIFT).astype(jnp.int32)
    base, words = _row(fm, blk)
    m = (kk & (OCC_INTERVAL - 1)).astype(jnp.int32) + 1
    out = base + _block_counts(words, m, it)
    return jnp.where(valid[..., None], out, jnp.zeros_like(out))


def extend(fm: FM, x0, x1, x2, is_back: bool):
    """Bidirectional interval extension for all 4 symbols at once
    (bwt_extend, bwt.c:262-275).

    Returns (n0, n1, ns) each [..., 4] indexed by symbol c; the caller picks
    c = base for backward extension or c = 3 - base for forward extension.
    """
    it = fm.L2.dtype
    p = x0 if is_back else x1
    other = x1 if is_back else x0
    # ONE stacked gather for both occ4 queries: on the target backend the
    # per-gather-op cost (~74us at 8K lanes) dwarfs the extra row's data,
    # so halving the op count nearly halves the extend step
    tkl = occ4(fm, jnp.stack([p - 1, p - 1 + x2]))
    tk, tl = tkl[0], tkl[1]
    ns = tl - tk
    crosses = ((p <= fm.primary) & (p + x2 - 1 >= fm.primary)).astype(it)
    o3 = other + crosses
    o2 = o3 + ns[..., 3]
    o1 = o2 + ns[..., 2]
    o0 = o1 + ns[..., 1]
    new_p = fm.L2[:4] + 1 + tk
    new_other = jnp.stack([o0, o1, o2, o3], axis=-1)
    if is_back:
        return new_p, new_other, ns
    return new_other, new_p, ns


def set_intv(fm: FM, c: jax.Array):
    """Initial single-base interval (bwt_set_intv, bwt.h:82).  c in [0,3].
    L2 lookups as masked reduces (no gather for a 5-entry table)."""
    it = fm.L2.dtype
    ci = c.astype(jnp.int32)
    lane = jnp.arange(5, dtype=jnp.int32)
    L2 = fm.L2

    def at(idx):
        return jnp.where(lane == idx[..., None], L2, 0).sum(-1,
                                                            dtype=L2.dtype)

    l2c = at(ci)
    x0 = l2c + 1
    x2 = at(ci + 1) - l2c
    x1 = at(3 - ci) + 1
    return x0.astype(it), x1.astype(it), x2.astype(it)


def bwt_b0(fm: FM, x: jax.Array) -> jax.Array:
    """Character of the $-removed BWT at position x (bwt_B0, bwt.h:80)."""
    blk = (x >> OCC_INTV_SHIFT).astype(jnp.int32)
    _, words = _row(fm, blk)
    wi = ((x >> 4) & 7).astype(jnp.int32)
    word = _select8(words, wi)
    sh = (((~x) & 15) << 1).astype(jnp.uint32)
    return ((word >> sh) & 3).astype(jnp.int32)


def inv_psi(fm: FM, k: jax.Array) -> jax.Array:
    """Inverse-Psi step (bwt_invPsi, bwt.c:53-59): ONE combined-row gather
    serves both the BWT character and its occ count.

    Unlike occ4, only ONE symbol's count is needed here — the BWT character
    c at kk.  Counting a per-lane symbol is done by XORing the packed words
    with c replicated into every 2-bit lane (c * 0x5555...): positions equal
    to c become 00, and 00-pairs are counted with the usual (~t>>1)&~t mask.
    This quarters the popcount work of the SA-walk loop, the hottest seeding
    op at scale (sa_lookup runs this body up to sa_intv-1 times)."""
    it = fm.L2.dtype
    kk = k - (k >= fm.primary).astype(k.dtype)
    kk = jnp.clip(kk, 0, fm.seq_len - 1)
    blk = (kk >> OCC_INTV_SHIFT).astype(jnp.int32)
    base, words = _row(fm, blk)
    wi = ((kk >> 4) & 7).astype(jnp.int32)
    word = _select8(words, wi)
    sh = (((~kk) & 15) << 1).astype(jnp.uint32)
    c = ((word >> sh) & 3).astype(jnp.int32)
    m = (kk & (OCC_INTERVAL - 1)).astype(jnp.int32) + 1
    # masked block words: only the first m bases participate
    cnt = jnp.clip(m[..., None] - _WORD_OFFS, 0, 16)
    shift = jnp.clip((16 - cnt) * 2, 0, 31).astype(jnp.uint32)
    mask = jnp.where(cnt == 0, jnp.uint32(0), jnp.uint32(0xFFFFFFFF) << shift)
    w = words & mask
    pat = (c.astype(jnp.uint32) * jnp.uint32(0x55555555))[..., None]
    t = ~(w ^ pat)                       # 2-bit lanes equal to c become 11
    m00 = (t >> 1) & t & jnp.uint32(0x55555555)
    occ_c = jax.lax.population_count(m00).sum(-1, dtype=it)
    # masked-out (zeroed) positions read as symbol 0 and were counted
    occ_c = occ_c - jnp.where(c == 0, (128 - m).astype(it), jnp.zeros((), it))
    o = _select4(base, c) + occ_c
    lane = jnp.arange(4, dtype=jnp.int32)
    l2c = jnp.where(lane == c[..., None], fm.L2[:4], 0).sum(
        -1, dtype=fm.L2.dtype)
    res = l2c + o
    return jnp.where(k == fm.primary, jnp.zeros_like(res), res).astype(k.dtype)


def sa_lookup(fm: FM, k: jax.Array) -> jax.Array:
    """Batched suffix-array lookup: masked inverse-Psi walk to the nearest
    sampled rank (bwt_sa, bwt.c:86-96).  At most sa_intv-1 steps; all lanes
    advance in lockstep with per-lane done masks."""
    mask = fm.sa_intv - 1
    log2_intv = int(np.log2(fm.sa_intv))

    def cond(state):
        kk, _ = state
        return jnp.any((kk & mask) != 0)

    def body(state):
        kk, t = state
        act = (kk & mask) != 0
        kn = inv_psi(fm, kk)
        return jnp.where(act, kn, kk), t + act.astype(kk.dtype)

    kk, t = jax.lax.while_loop(cond, body, (k, jnp.zeros_like(k)))
    samp = fm.sa[(kk >> log2_intv).astype(jnp.int32)]
    return (t + samp) % (fm.seq_len + 1)


# ---------- reference sequence access (bntseq_CUDA.cu equivalents) ----------

def pac_base(fm: FM, pos: jax.Array) -> jax.Array:
    """Forward-strand base at pos from the packed 2-bit reference
    (_get_pac, bntseq.c:230; word-level for vectorized gathers).

    pac bytes were reinterpreted as little-endian uint32, so byte b of word w
    is at bits 8*(b&3); within a byte, base (pos&3) sits at bits
    (3-(pos&3))*2.
    """
    word = fm.pac[(pos >> 4).astype(jnp.int32)]
    byte = (word >> (((pos & 15) >> 2) << 3).astype(jnp.uint32)) & 0xFF
    sh = ((3 - (pos & 3)) << 1).astype(jnp.uint32)
    return ((byte >> sh) & 3).astype(jnp.int32)


def ref_base(fm: FM, pos: jax.Array) -> jax.Array:
    """Base at a both-strands coordinate in [0, 2*l_pac): forward strand for
    pos < l_pac, reverse-complement otherwise (bns_get_seq, bntseq.c:403)."""
    is_rev = pos >= fm.l_pac
    fpos = jnp.where(is_rev, 2 * fm.l_pac - 1 - pos, pos)
    b = pac_base(fm, fpos)
    return jnp.where(is_rev, 3 - b, b)


def pos2rid(ctg_offsets: jax.Array, pos_f: jax.Array) -> jax.Array:
    """Forward-strand position → contig id (bns_pos2rid, bntseq.c:354-368)."""
    return (jnp.searchsorted(ctg_offsets, pos_f, side="right") - 1).astype(jnp.int32)


def depos(l_pac, pos: jax.Array):
    """Both-strands coordinate → (forward position, is_rev)
    (bns_depos, bntseq.h:87)."""
    is_rev = pos >= l_pac
    return jnp.where(is_rev, 2 * l_pac - 1 - pos, pos), is_rev


def intv2rid(fm: FM, ctg_offsets: jax.Array, rb: jax.Array,
             re: jax.Array) -> jax.Array:
    """Interval → contig id; -2 if it bridges the forward/reverse boundary,
    -1 if it spans two contigs (bns_intv2rid, bntseq.c:370-378)."""
    pb, _ = depos(fm.l_pac, rb)
    pe, _ = depos(fm.l_pac, re - 1)
    rid_b = pos2rid(ctg_offsets, pb)
    rid_e = jnp.where(rb < re, pos2rid(ctg_offsets, pe), rid_b)
    rid = jnp.where(rid_b == rid_e, rid_b, -1)
    return jnp.where((rb < fm.l_pac) & (re > fm.l_pac), -2, rid)
