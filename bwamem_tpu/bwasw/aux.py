"""BWA-SW driver: per-read alignment, hit extension, CIGAR/SAM generation
(bwtsw2_aux.c) with the dense SW work batched onto the device kernels."""
from __future__ import annotations

import math
import sys

import numpy as np

from bwamem_tpu.bwasw import chain as bchain
from bwamem_tpu.bwasw import core
from bwamem_tpu.bwasw.bwtl import BwtLite
from bwamem_tpu.bwasw.hostfm import HostFM
from bwamem_tpu.bwasw.ksort import ks_introsort
from bwamem_tpu.legacy.rng import Drand48

BSW2_FLAG_MATESW = 0x100
BSW2_FLAG_TANDEM = 0x200
BSW2_FLAG_MOVED = 0x400
BSW2_FLAG_RESCUED = 0x800

# nt_comp_table (bwtsw2_aux.c:32-49), transcribed row by row
_COMP = bytearray(b"N" * 256)
_COMP[64:80] = b"NTVGHNNCDNNMNKNN"
_COMP[80:96] = b"NNYSANBWXRNNNNNN"
_COMP[96:112] = b"ntvghnncdnnmnknn"
_COMP[112:123] = b"nnysanbwxyr"[:11]
_COMP = bytes(_COMP)
NT_COMP = {i: _COMP[i:i + 1].decode() for i in range(256)}


class Bsw2Options:
    """bsw2opt_t (bwtsw2.h:14-20) with bsw2_init_opt defaults."""

    def __init__(self):
        self.skip_sw = 0
        self.cpy_cmt = 0
        self.hard_clip = 0
        self.a = 1
        self.b = 3
        self.q = 5
        self.r = 2
        self.t = 30
        self.bw = 50
        self.max_ins = 20000
        self.max_chain_gap = 10000
        self.z = 1
        self.is_ = 3
        self.t_seeds = 5
        self.multi_2nd = 0
        self.mask_level = 0.50
        self.coef = 5.5
        self.n_threads = 1
        self.chunk_size = 10000000
        self.qr = self.q + self.r

    def copy(self) -> "Bsw2Options":
        o = Bsw2Options.__new__(Bsw2Options)
        o.__dict__.update(self.__dict__)
        return o


def update_opt(src: Bsw2Options, qlen: int) -> Bsw2Options:
    """Per-read threshold / band adaptation (bwtsw2_aux.c:545-557)."""
    dst = src.copy()
    ll = math.log(qlen)
    if dst.t < ll * dst.coef:
        dst.t = int(ll * dst.coef + .499)
    k = int((qlen * dst.a - 2 * dst.q) / (2 * dst.r + dst.a))
    i = int((qlen * dst.a - dst.a - dst.t) / dst.r)
    if k > i:
        k = i
    if k < 1:
        k = 1
    dst.bw = src.bw if src.bw < k else k
    return dst


def fill_scmat(a: int, b: int) -> np.ndarray:
    """bwa_fill_scmat (bwa.c:61-71)."""
    mat = np.full((5, 5), -1, np.int8)
    for i in range(4):
        for j in range(4):
            mat[i, j] = a if i == j else -b
    mat[4, :] = -1
    mat[:, 4] = -1
    return mat


# ----------------------------------------------------- device SW adapters

def _bucket(x: int, lo: int = 8) -> int:
    n = lo
    while n < x:
        n <<= 1
    return n


def ksw_extend_jobs(jobs, mat, q, r, bw):
    """Batch of ksw_extend calls: jobs = [(query nt4[], target nt4[], h0)];
    returns [(score, qle, tle)].  zdrop is disabled and end_bonus 0, as in
    the bwasw call sites (bwtsw2_aux.c:133,161)."""
    import jax
    import jax.numpy as jnp
    from bwamem_tpu.ops import extend as extops
    if not jobs:
        return []
    live = [(i, j) for i, j in enumerate(jobs) if len(j[0]) and len(j[1])]
    out = [(0, 0, 0)] * len(jobs)
    if not live:
        return out
    B = _bucket(len(live))
    LQ = _bucket(max(len(j[0]) for _, j in live), lo=16)
    T = _bucket(max(len(j[1]) for _, j in live), lo=16)
    query = np.full((B, LQ), 4, np.uint8)
    tgt = np.full((B, T), 4, np.uint8)
    qlen = np.zeros(B, np.int32)
    tlen = np.zeros(B, np.int32)
    h0 = np.ones(B, np.int32)
    for b_, (_, (qs, ts, h)) in enumerate(live):
        query[b_, :len(qs)] = qs
        tgt[b_, :len(ts)] = ts
        qlen[b_], tlen[b_], h0[b_] = len(qs), len(ts), h
    tgt_j = jnp.asarray(tgt)

    def target_at(i):
        return tgt_j[:, jnp.minimum(i, T - 1)].astype(jnp.int32)

    res = extops.extend_batch(
        jnp.asarray(query), jnp.asarray(qlen), target_at, jnp.asarray(tlen),
        jnp.asarray(h0), jnp.full(B, bw, np.int32),
        jnp.zeros(B, np.int32), jnp.asarray(mat),
        o_del=q, e_del=r, o_ins=q, e_ins=r, zdrop=-1, t_max=T)
    score = np.asarray(res.score)
    qle = np.asarray(res.qle)
    tle = np.asarray(res.tle)
    for b_, (i, _) in enumerate(live):
        out[i] = (int(score[b_]), int(qle[b_]), int(tle[b_]))
    return out


def ksw_global_jobs(jobs, mat, q, r):
    """Batch of ksw_global2 calls: jobs = [(query, target, w)];
    returns [cigar list of (op, len)] (op 0 M, 1 I, 2 D)."""
    import jax.numpy as jnp
    from bwamem_tpu.ops import global_sw as gsw
    if not jobs:
        return []
    B = _bucket(len(jobs))
    LQ = _bucket(max(len(j[0]) for j in jobs), lo=16)
    T = _bucket(max(len(j[1]) for j in jobs), lo=16)
    w_max = max(j[2] for j in jobs)
    query = np.full((B, LQ), 4, np.uint8)
    tgt = np.full((B, T), 4, np.uint8)
    qlen = np.ones(B, np.int32)
    tlen = np.ones(B, np.int32)
    w = np.ones(B, np.int32)
    for b_, (qs, ts, ww) in enumerate(jobs):
        query[b_, :len(qs)] = qs
        tgt[b_, :len(ts)] = ts
        qlen[b_], tlen[b_], w[b_] = len(qs), len(ts), ww
    mc = max(64, _bucket(LQ // 4, lo=64))
    while True:
        res = gsw.global_align_batch(
            jnp.asarray(query), jnp.asarray(qlen), jnp.asarray(tgt),
            jnp.asarray(tlen), jnp.asarray(w), jnp.asarray(mat),
            o_del=q, e_del=r, o_ins=q, e_ins=r, w_max=w_max, max_cigar=mc)
        if not bool(np.asarray(res.overflow)[:len(jobs)].any()):
            break
        mc <<= 1
    ops = np.asarray(res.ops)
    lens = np.asarray(res.lens)
    ncig = np.asarray(res.n_cigar)
    return [[(int(ops[b_, k]), int(lens[b_, k])) for k in range(ncig[b_])]
            for b_ in range(len(jobs))]


# --------------------------------------------------------- hit extensions

def extend_left(opt, hits, seq, lq, hfm):
    """bsw2_extend_left (bwtsw2_aux.c:100-142).  Sequential per hit: the
    containment skip consults previously EXTENDED hits."""
    mat = fill_scmat(opt.a, opt.b)
    ks_introsort(hits, lambda x, y: x.end > y.end)
    query_rev = np.ascontiguousarray(seq[::-1])
    for i, p in enumerate(hits):
        p.n_seeds = 1
        if p.l or p.k == 0:
            continue
        lt = ((p.beg + 1) // 2 * opt.a + opt.r) // opt.r + lq
        score = 0
        for j in range(i):
            qh = hits[j]
            if qh.beg <= p.beg and qh.k <= p.k and \
                    qh.k + qh.len >= p.k + p.len:
                if qh.n_seeds < (1 << 13) - 2:
                    qh.n_seeds += 1
                score += 1
        if score:
            continue
        if lt > p.k:
            lt = p.k
        # bases p.k-1 down to max(p.k-lt, 1): k==0 never read (FIXME in C)
        lo = max(p.k - lt, 1)
        target = hfm.get_seq(lo, p.k)[::-1]
        (s, qle, tle), = ksw_extend_jobs(
            [(query_rev[lq - p.beg:], target, p.G)], mat, opt.q, opt.r,
            opt.bw)
        if s > p.G:
            p.G = s
            p.k -= tle
            p.len += tle
            p.beg -= qle


def extend_rght(opt, hits, seq, lq, hfm):
    """bsw2_extend_rght (bwtsw2_aux.c:144-170), batched (no inter-hit
    dependency)."""
    mat = fill_scmat(opt.a, opt.b)
    jobs = []
    idx = []
    for i, p in enumerate(hits):
        if p.l:
            continue
        lt = ((lq - p.beg + 1) // 2 * opt.a + opt.r) // opt.r + lq
        hi = min(p.k + lt, hfm.l_pac)
        jobs.append((seq[p.beg:], hfm.get_seq(p.k, hi), 1))
        idx.append(i)
    for (s, qle, tle), i in zip(
            ksw_extend_jobs(jobs, mat, opt.q, opt.r, opt.bw), idx):
        p = hits[i]
        score = s - 1
        if score >= p.G:
            p.G = score
            p.len = tle
            p.end = p.beg + qle


def merge_hits(dst, src, length, is_reverse):
    """bwtsw2_aux.c:226-246."""
    for p in src:
        if is_reverse:
            p.beg, p.end = length - p.end, length - p.beg
            p.flag |= 0x10
        dst.append(p)
    return dst


# ------------------------------------------------------------ CIGAR + aux

class Aux:
    """bsw2aux_t."""
    __slots__ = ("flag", "nn", "chr", "pos", "qual", "mchr", "mpos",
                 "pqual", "isize", "nm", "cigar")

    def __init__(self):
        self.flag = 0
        self.nn = 0
        self.chr = -1
        self.pos = -1
        self.qual = 0
        self.mchr = -1
        self.mpos = -1
        self.pqual = 0
        self.isize = 0
        self.nm = -1
        self.cigar = None  # list of (op, len); None = no alignment


def gen_cigar(opt, lq, seq01, hfm, hits, auxs):
    """bwtsw2_aux.c:173-212 via the batched global-SW kernel.  Computes NM
    over the aligned segment exactly like bwa_gen_cigar2 (deletion runs at
    either CIGAR end excluded)."""
    mat = fill_scmat(opt.a, opt.b)
    jobs = []
    meta = []
    for i, p in enumerate(hits):
        if p.l:
            continue
        beg = lq - p.end if p.flag & 0x10 else p.beg
        end = lq - p.beg if p.flag & 0x10 else p.end
        qseg = seq01[1 if p.flag & 0x10 else 0][beg:end]
        rb, re = p.k, p.k + p.len
        if end - beg <= 0 or rb >= re or rb < 0 or re > hfm.l_pac:
            continue  # no cigar (bwa.c:362); aux stays cigar=None
        rseq = hfm.get_seq(rb, re)
        lquery, rlen = end - beg, re - rb
        # band (bwa.c:292-300)
        max_ins = int((((lquery + 1) >> 1) * opt.a - opt.q) / opt.r + 1.)
        max_del = max_ins
        max_gap = max(max(max_ins, max_del), 1)
        w = (max_gap + abs(rlen - lquery) + 1) >> 1
        w = min(w, opt.bw)
        w = max(w, abs(rlen - lquery) + 3)
        jobs.append((qseg, rseq, w))
        meta.append((i, beg, end, qseg, rseq))
    cigars = ksw_global_jobs(jobs, mat, opt.q, opt.r)
    for cig, (i, beg, end, qseg, rseq) in zip(cigars, meta):
        q = auxs[i]
        # NM (bwa.c:311-341)
        n_mm = n_gap = 0
        x = y = 0
        for k, (op, ln) in enumerate(cig):
            if op == 0:
                n_mm += int((qseg[x:x + ln] != rseq[y:y + ln]).sum())
                x += ln
                y += ln
            elif op == 2:
                if 0 < k < len(cig) - 1:
                    n_gap += ln
                y += ln
            elif op == 1:
                x += ln
                n_gap += ln
        q.nm = n_mm + n_gap
        cig = list(cig)
        if cig and (beg != 0 or end < lq):  # soft clips (bwa_aux:199-210)
            if beg != 0:
                cig.insert(0, (4, beg))
            if end < lq:
                cig.append((4, lq - end))
        q.cigar = cig


def fix_cigar(hfm, p, cigar):
    """Split an alignment crossing a contig boundary (bwtsw2_aux.c:326-397);
    returns the fixed cigar list, mutating p.k/p.len."""
    _, seqid = hfm.cnt_ambi(p.k, p.len)
    coor = p.k - int(hfm.ctg_off[seqid])
    refl = int(hfm.ctg_len[seqid])
    x, y = coor, 0
    for op, ln in cigar:
        if op in (1, 4, 5):
            y += ln
        elif op == 2:
            x += ln
        else:
            x += ln
            y += ln
    lq = y
    if x <= refl:
        return cigar
    # crosses the boundary: split into two candidate alignments
    nc = 0
    mq = [0, 0]
    nlen = [0, 0]
    cn = []
    kk = 0
    x, y = coor, 0
    for op, ln in cigar:
        if op in (1, 4, 5):
            y += ln
            cn.append((op, ln))
        elif op == 2:
            if x + ln >= refl and nc == 0:
                cn.append((4, lq - y))
                nc = len(cn)
                cn.append((4, y))
                kk = p.k + (x + ln - refl)
                nlen[0] = x - coor
                nlen[1] = p.len - nlen[0] - ln
            else:
                cn.append((op, ln))
            x += ln
        elif op == 0:
            if x + ln >= refl and nc == 0:
                cn.append((0, refl - x))
                cn.append((4, lq - y - (refl - x)))
                nc = len(cn)
                mq[0] += refl - x
                cn.append((4, y + (refl - x)))
                if x + ln - refl:
                    cn.append((0, x + ln - refl))
                mq[1] += x + ln - refl
                kk = int(hfm.ctg_off[seqid]) + refl
                nlen[0] = refl - coor
                nlen[1] = p.len - nlen[0]
            else:
                cn.append((op, ln))
                mq[1 if nc else 0] += ln
            x += ln
            y += ln
    if mq[0] > mq[1]:
        p.len = nlen[0]
        return cn[:nc]
    p.k = kk
    p.len = nlen[1]
    return cn[nc:]


def write_aux(opt, hfm, qlen, seq01, b_hits):
    """CIGAR + mapQ + chromosomal position (bwtsw2_aux.c:399-436)."""
    auxs = [Aux() for _ in b_hits]
    gen_cigar(opt, qlen, seq01, hfm, b_hits, auxs)
    for p, q in zip(b_hits, auxs):
        q.flag = p.flag & 0xFE
        q.isize = 0
        if p.l == 0:
            # the reference runs fix_cigar even with a NULL cigar, which
            # can zero p.k/p.len for out-of-range hits (bwtsw2_aux.c:421)
            fixed = fix_cigar(hfm, p, q.cigar if q.cigar else [])
            if q.cigar is not None:
                q.cigar = fixed
            c = 1.0
            subo = p.G2 if p.G2 > opt.t else opt.t
            if p.flag >> 16 in (1, 2):
                c *= .5
            if p.n_seeds < 2:
                c *= .2
            qual = int(c * (p.G - subo) * (250.0 / p.G + 0.03 / opt.a)
                       + .499)
            q.qual = max(0, min(qual, 250))
            if p.flag & 1:
                q.qual = 0  # random repetitive hit
            q.pqual = q.qual
            q.nn, q.chr = hfm.cnt_ambi(p.k, p.len)
            q.pos = p.k - int(hfm.ctg_off[q.chr])
        else:
            q.qual = 0
            q.chr = q.pos = -1
            q.nn = 0
            q.cigar = None
    return auxs


def update_mate_aux(b, m):
    """Mate flags / coordinates / pqual coupling (bwtsw2_aux.c:438-473).
    b/m = (hits, auxs) tuples."""
    if m is None:
        return
    bh, ba = b
    mh, ma = m
    for q in ba:
        q.flag |= 1
        if len(mh) == 0:
            q.flag |= 8
        if len(mh) == 1:
            q.mchr = ma[0].chr
            q.mpos = ma[0].pos
            if ma[0].flag & 0x10:
                q.flag |= 0x20
            if q.chr == q.mchr:
                if q.mpos + mh[0].len > q.pos:
                    q.isize = q.mpos + mh[0].len - q.pos
                else:
                    q.isize = q.mpos - q.pos - bh[0].len
            else:
                q.isize = 0
        else:
            q.mchr = q.mpos = -1
    if len(bh) == 1 and len(mh) == 1:
        p = bh[0]
        if p.flag & BSW2_FLAG_MATESW:
            if not (p.flag & BSW2_FLAG_TANDEM) and ba[0].pqual < 20:
                ba[0].pqual = 20
            if ba[0].pqual >= ma[0].qual:
                ba[0].pqual = ma[0].qual
        elif (p.flag & 2) and not (mh[0].flag & BSW2_FLAG_MATESW):
            if not (p.flag & BSW2_FLAG_TANDEM):
                ba[0].pqual += 20
                if ba[0].pqual > ma[0].qual:
                    ba[0].pqual = ma[0].qual
                if ba[0].pqual < ba[0].qual:
                    ba[0].pqual = ba[0].qual


# ------------------------------------------------------------- SAM output

def print_hits(hfm, opt, read, hits, auxs, is_pe, out):
    """bwtsw2_aux.c:477-543."""
    names = [c.name for c in hfm.idx.contigs]
    raw = read.raw if read.raw is not None else \
        "".join("ACGTN"[c] for c in read.seq)
    l = len(raw)
    if not hits:
        out.write(f"{read.name}\t4\t*\t0\t0\t*\t*\t0\t0\t{raw}\t"
                  f"{read.qual if read.qual else '*'}\n")
    for i, (p, q) in enumerate(zip(hits, auxs)):
        if q.cigar is None:
            q.flag |= 0x4
        flag = q.flag | (0x100 if opt.multi_2nd and i else 0)
        o = [f"{read.name}\t{flag}",
             f"\t{names[q.chr] if q.chr >= 0 else '*'}\t{q.pos + 1}"]
        if p.l == 0 and q.cigar is not None:
            o.append(f"\t{q.pqual}\t")
            letters = "MIDNHHP" if opt.hard_clip else "MIDNSHP"
            o.extend(f"{ln}{letters[op]}" for op, ln in q.cigar)
        else:
            o.append("\t0\t*")
        if not is_pe:
            o.append("\t*\t0\t0\t")
        else:
            mref = "=" if q.mchr == q.chr else (
                "*" if q.mchr < 0 else names[q.mchr])
            o.append(f"\t{mref}\t{q.mpos + 1}\t{q.isize}\t")
        beg, end = 0, l
        if opt.hard_clip and q.cigar:
            if q.cigar[0][0] == 4:
                beg += q.cigar[0][1]
            if q.cigar[-1][0] == 4:
                end -= q.cigar[-1][1]
        if p.flag & 0x10:
            o.append("".join(NT_COMP[ord(raw[l - 1 - j])]
                             for j in range(beg, end)))
        else:
            o.append(raw[beg:end])
        if read.qual:
            if p.flag & 0x10:
                o.append("\t" + "".join(read.qual[l - 1 - j]
                                        for j in range(beg, end)))
            else:
                o.append("\t" + read.qual[beg:end])
        else:
            o.append("\t*")
        o.append(f"\tAS:i:{p.G}\tXS:i:{p.G2}\tXF:i:{p.flag >> 16}"
                 f"\tXE:i:{p.n_seeds}\tNM:i:{q.nm}")
        if q.nn:
            o.append(f"\tXN:i:{q.nn}")
        if p.l:
            o.append(f"\tXI:i:{p.l - p.k + 1}")
        xt = (1 if p.flag & BSW2_FLAG_MATESW else 0) | \
             (2 if p.flag & BSW2_FLAG_TANDEM else 0)
        if xt:
            o.append(f"\tXT:i:{xt}")
        if opt.cpy_cmt and read.comment:
            cmt = read.comment
            if len(cmt) >= 6 and cmt[2] == ":" and cmt[4] == ":":
                o.append("\t" + cmt)
        out.write("".join(o) + "\n")


# ------------------------------------------------------------ read driver

def flag_fr(b0, b1):
    """bwtsw2_aux.c:298-319."""
    for p in b0:
        p.flag |= 0x10000
    for p in b1:
        p.flag |= 0x20000
    for p in b0:
        for q in b1:
            if q.beg == p.beg and q.end == p.end and q.k == p.k and \
                    q.len == p.len and q.G == p.G:
                q.flag |= 0x30000
                p.flag |= 0x30000
                break


def aln1_core(opt, hfm, sa_lookup, l, seq01, rng):
    """bsw2_aln1_core (bwtsw2_aux.c:248-295)."""
    bwtl = BwtLite(seq01[0])
    b_all, b_narrow = core.bsw2_core(hfm, sa_lookup, opt, bwtl)
    bb = [[[], []], [[], []]]
    for k, lst in enumerate((b_all, b_narrow)):
        for h in lst:
            if h.is_rev:
                h.beg, h.end = l - h.end, l - h.beg
            bb[h.is_rev][k].append(h)
    bb[0][1], bb[1][1] = bchain.chain_filter(opt, l, bb[0][1], bb[1][1])
    b = [None, None]
    for k in range(2):
        extend_left(opt, bb[k][1], seq01[k], l, hfm)
        bb[k][0] = merge_hits(bb[k][0], bb[k][1], l, 0)
        bb[k][0] = core.resolve_duphits(None, None, bb[k][0], 0)
        extend_rght(opt, bb[k][0], seq01[k], l, hfm)
        bb[k][0] = core.resolve_duphits(None, None, bb[k][0], 0)
        b[k] = bb[k][0]
    b0 = merge_hits(b[0], b[1], l, 1)
    return core.resolve_query_overlaps(b0, opt.mask_level, rng)


def seqs_nt4(read, l, rng):
    """2-bit conversion with drand48 N randomization
    (bwtsw2_aux.c:585-592); returns (seq[2], n_ambiguous)."""
    fwd = np.empty(l, np.uint8)
    n_amb = 0
    for i, c in enumerate(read.seq):
        if c >= 4:
            c = int(rng.drand() * 4)
            n_amb += 1
        fwd[i] = c
    rc = (3 - fwd)[::-1].copy()
    return [fwd, rc], n_amb


def aln_core(opt0, hfm, sa_lookup, reads, is_pe, rng, out, err):
    """bsw2_aln_core (bwtsw2_aux.c:561-644) for one chunk, single thread."""
    from bwamem_tpu.bwasw import pair as bpair
    buf = []
    opt = opt0
    for read in reads:
        l = read.l_seq
        opt = update_opt(opt0, l)
        seq01, n_amb = seqs_nt4(read, l, rng)
        if l - n_amb < opt.t:
            buf.append([])
            continue
        b0 = aln1_core(opt, hfm, sa_lookup, l, seq01, rng)
        if any(h.n_seeds < opt.t_seeds for h in b0):
            rseq01 = [seq01[1], seq01[0]]
            b1 = aln1_core(opt, hfm, sa_lookup, l, rseq01, rng)
            for p in b1:
                p.flag ^= 0x10
                p.is_rev ^= 1
                p.beg, p.end = l - p.end, l - p.beg
            flag_fr(b0, b1)
            b0 = merge_hits(b0, b1, l, 0)
            b0 = core.resolve_duphits(None, None, b0, 0)
            b0 = core.resolve_query_overlaps(b0, opt.mask_level, rng)
        buf.append([h.copy() for h in b0])
    if is_pe:
        bpair.bsw2_pair(opt, hfm, reads, buf, err)
    auxs = []
    for read, hits in zip(reads, buf):
        opt = update_opt(opt0, read.l_seq)
        seq01, _ = seqs_nt4(read, read.l_seq, rng)
        auxs.append(write_aux(opt, hfm, read.l_seq, seq01, hits))
    for x, read in enumerate(reads):
        if is_pe:
            update_mate_aux((buf[x], auxs[x]), (buf[x ^ 1], auxs[x ^ 1]))
        print_hits(hfm, opt, read, buf[x], auxs[x], is_pe, out)


def bsw2_aln(opt, idx, fn1, fn2=None, out=sys.stdout, err=sys.stderr):
    """bsw2_aln (bwtsw2_aux.c:727-776): stream chunks, align, emit SAM."""
    import jax.numpy as jnp
    from bwamem_tpu.io.fastq import read_fastx, interleave
    from bwamem_tpu.ops import fm as fmops
    from bwamem_tpu.pipeline.seeding_host import _sa_lookup_jit

    hfm = HostFM(idx)
    fm_dev = fmops.to_device(fmops.fm_from_index(idx))
    it = np.dtype(fm_dev.L2.dtype)

    def sa_lookup(ranks: np.ndarray) -> np.ndarray:
        n = len(ranks)
        npad = _bucket(max(n, 1), lo=64)
        rk = np.zeros(npad, it)
        rk[:n] = ranks
        return np.asarray(_sa_lookup_jit(fm_dev, jnp.asarray(rk)))[:n]

    for c in idx.contigs:
        out.write(f"@SQ\tSN:{c.name}\tLN:{c.len}\n")
    rng = Drand48(11)  # srand48(11), bwtsw2_main.c:18

    def reader():
        it1 = read_fastx(fn1, keep_raw=True)
        if fn2:
            src = interleave(it1, read_fastx(fn2, keep_raw=True))
        else:
            src = it1

            def trim(r):
                if len(r.name) > 2 and r.name[-2] == "/" and \
                        r.name[-1].isdigit():
                    r.name = r.name[:-2]
                return r
            src = (trim(r) for r in src)
        return src

    src = reader()
    is_pe = fn2 is not None
    step = 2 if is_pe else 1
    chunk_cap = opt.chunk_size * opt.n_threads
    chunk = []
    size = 0

    def flush():
        nonlocal chunk, size
        if not chunk:
            return
        err.write(f"[bsw2_aln] read {len(chunk)} sequences/pairs "
                  f"({size} bp) ...\n")
        aln_core(opt, hfm, sa_lookup, chunk, is_pe, rng, out, err)
        chunk = []
        size = 0

    pending = []
    for r in src:
        pending.append(r)
        if len(pending) == step:
            chunk.extend(pending)
            size += sum(p.l_seq for p in pending)
            pending = []
            if size >= chunk_cap:
                flush()
    if pending:
        chunk.extend(pending)
        size += sum(p.l_seq for p in pending)
    flush()
