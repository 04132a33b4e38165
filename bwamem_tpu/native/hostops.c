/* Host-side finalization kernels.
 *
 * The per-record banded global alignment (ksw_global2 semantics — the spec
 * is the batched XLA op in ops/global_sw.py, itself derived from reference
 * ksw.c:504-606) is a ~100x~30-cell DP with a data-dependent traceback:
 * tiny, branchy, and traceback-hostile to lockstep SIMD.  At ~2k jobs per
 * 8k-read batch it costs ~300 ms on the accelerator (the traceback's
 * per-lane walk dominates) and ~30 ms here.  The bulk SW extension over
 * all seeds stays on the device; only this last-mile CIGAR DP runs on
 * host, mirroring how the CPU reference finishes reads.
 *
 * nm_md_batch generates the NM count and MD:Z string per record
 * (bwa_gen_cigar2 semantics, reference bwa.c:311-341; spec:
 * finalize._nm_md).
 */
#include <math.h>
#include <stdint.h>
#include <stdlib.h>
#include <string.h>
#include <stdio.h>

#ifndef M_SQRT1_2
#define M_SQRT1_2 0.70710678118654752440
#endif

#define NEG (-0x40000000)

static inline int32_t maxi(int32_t a, int32_t b) { return a > b ? a : b; }
static inline int32_t mini(int32_t a, int32_t b) { return a < b ? a : b; }

/* One banded global alignment with traceback.
 * query/target: nt4 codes.  cig_out: (len<<4|op) runs, cap cig_cap.
 * Returns the number of cigar runs, or -1 if cig_cap is too small.
 * score_out receives H(tlen-1, qlen-1). */
static int ksw_global_one(int qlen, const uint8_t *query,
                          int tlen, const uint8_t *target,
                          const int8_t *mat /*5x5*/, int o_del, int e_del,
                          int o_ins, int e_ins, int w,
                          int32_t *score_out, uint32_t *cig_out,
                          int cig_cap, int32_t *ehh, int32_t *ehe,
                          uint8_t *z /* tlen*ncol scratch */)
{
    int i, j;
    const int oe_del = o_del + e_del, oe_ins = o_ins + e_ins;
    int ncol = mini(qlen, 2 * w + 1);
    if (ncol < 1) ncol = 1;
    /* cells the row loop never writes must read as 0, like the batched
     * op's zero-initialized z (a traceback D step can look one column
     * past the previous row's window) */
    memset(z, 0, (size_t)(tlen > 0 ? tlen : 1) * ncol);

    ehh[0] = 0;
    ehe[0] = NEG;
    for (j = 1; j <= qlen; j++) {
        ehh[j] = (j <= w) ? -(o_ins + e_ins * j) : NEG;
        ehe[j] = NEG;
    }
    for (i = 0; i < tlen; i++) {
        int beg = maxi(i - w, 0);
        int end = mini(i + w + 1, qlen);
        const int8_t *qp = mat + (int)target[i] * 5;
        int32_t F = NEG;
        int32_t h1 = (beg == 0) ? -(o_del + e_del * (i + 1)) : NEG;
        uint8_t *zr = z + (size_t)i * ncol;
        for (j = beg; j < end; j++) {
            int32_t m = ehh[j] + qp[query[j]];
            int32_t e = ehe[j];
            uint8_t d = (m >= e) ? 0 : 1;
            int32_t h = m > e ? m : e;
            if (F > h) { d = 2; h = F; }
            int32_t t_del = m - oe_del;
            int32_t e2 = e - e_del;
            if (e2 > t_del) d |= 1 << 2;
            int32_t enew = e2 > t_del ? e2 : t_del;
            int32_t f2 = F - e_ins, m2 = m - oe_ins;
            if (f2 > m2) d |= 1 << 5;
            zr[j - beg] = d;
            ehh[j] = h1;
            h1 = h;
            ehe[j] = enew;
            F = m2 > f2 ? m2 : f2;
        }
        ehh[end] = h1;
        ehe[end] = NEG;
    }
    *score_out = ehh[qlen];

    /* traceback + push_cigar run merging (back-to-front, then reverse) */
    int n = 0;
    int cur_op = -1;
    int32_t cur_len = 0;
    i = tlen - 1;
    int k = mini(tlen - 1 + w + 1, qlen) - 1;
    int which = 0;
#define PUSH(op_, ln_) do {                                            \
        if ((op_) == cur_op) cur_len += (ln_);                         \
        else {                                                         \
            if (cur_op >= 0) {                                         \
                if (n >= cig_cap) return -1;                           \
                cig_out[n++] = ((uint32_t)cur_len << 4) | cur_op;      \
            }                                                          \
            cur_op = (op_); cur_len = (ln_);                           \
        }                                                              \
    } while (0)
    while (i >= 0 && k >= 0) {
        int beg = maxi(i - w, 0);
        int kc = k - beg;
        if (kc < 0) kc = 0;
        if (kc >= ncol) kc = ncol - 1;
        uint8_t zi = z[(size_t)i * ncol + kc];
        which = (zi >> (which << 1)) & 3;
        int op = which == 0 ? 0 : which == 1 ? 2 : 1;
        PUSH(op, 1);
        if (which != 2) --i;
        if (which != 1) --k;
    }
    if (i >= 0) PUSH(2, i + 1);
    if (k >= 0) PUSH(1, k + 1);
    if (cur_op >= 0) {
        if (n >= cig_cap) return -1;
        cig_out[n++] = ((uint32_t)cur_len << 4) | cur_op;
    }
#undef PUSH
    for (j = 0; j < n / 2; j++) {      /* reverse to front-to-back */
        uint32_t tmp = cig_out[j];
        cig_out[j] = cig_out[n - 1 - j];
        cig_out[n - 1 - j] = tmp;
    }
    return n;
}

/* Batch driver.  cig_out is [n_jobs, cig_cap]; n_cig_out[j] = runs.
 * Returns 0, or -1 if any job overflowed cig_cap (caller grows). */
int ksw_global_batch(int64_t n_jobs,
                     const uint8_t *q, const int64_t *q_off,
                     const uint8_t *t, const int64_t *t_off,
                     const int32_t *wband, const int8_t *mat,
                     int32_t o_del, int32_t e_del, int32_t o_ins,
                     int32_t e_ins,
                     int32_t *score_out, int32_t *n_cig_out,
                     uint32_t *cig_out, int64_t cig_cap)
{
    int64_t jmax = 0, tmax = 0, nmax = 0;
    for (int64_t b = 0; b < n_jobs; b++) {
        int64_t ql = q_off[b + 1] - q_off[b];
        int64_t tl = t_off[b + 1] - t_off[b];
        if (ql > jmax) jmax = ql;
        if (tl > tmax) tmax = tl;
        int64_t nc = ql < 2 * (int64_t)wband[b] + 1 ? ql
                                                    : 2 * (int64_t)wband[b] + 1;
        if (nc < 1) nc = 1;
        if (tl * nc > nmax) nmax = tl * nc;
    }
    int32_t *ehh = malloc((jmax + 2) * sizeof(int32_t));
    int32_t *ehe = malloc((jmax + 2) * sizeof(int32_t));
    uint8_t *z = malloc(nmax ? nmax : 1);
    if (!ehh || !ehe || !z) { free(ehh); free(ehe); free(z); return -2; }
    int rc = 0;
    for (int64_t b = 0; b < n_jobs; b++) {
        int ql = (int)(q_off[b + 1] - q_off[b]);
        int tl = (int)(t_off[b + 1] - t_off[b]);
        int n = ksw_global_one(ql, q + q_off[b], tl, t + t_off[b], mat,
                               o_del, e_del, o_ins, e_ins, wband[b],
                               score_out + b, cig_out + b * cig_cap,
                               (int)cig_cap, ehh, ehe, z);
        if (n < 0) { rc = -1; n = 0; }
        n_cig_out[b] = n;
    }
    free(ehh); free(ehe); free(z);
    return rc;
}

/* NM + MD:Z generation over the aligned frames (spec: finalize._nm_md;
 * reference bwa_gen_cigar2, bwa.c:311-341).  Leading/trailing deletions
 * excluded.  qseg/rseq already strand-oriented; is_rev picks the base
 * alphabet for MD letters.  md_buf: concatenated MD strings, md_off[b]..
 * md_off[b+1].  Returns 0, or the needed md_buf size (>0) on overflow. */
int64_t nm_md_batch(int64_t n_jobs,
                    const uint32_t *cig, const int64_t *cig_off,
                    const uint8_t *qseg, const int64_t *q_off,
                    const uint8_t *rseq, const int64_t *r_off,
                    const uint8_t *is_rev,
                    int32_t *nm_out, char *md_buf, int64_t md_cap,
                    int64_t *md_off)
{
    static const char FWD[5] = {'A', 'C', 'G', 'T', 'N'};
    static const char REV[5] = {'T', 'G', 'C', 'A', 'N'};
    int64_t pos = 0;
    for (int64_t b = 0; b < n_jobs; b++) {
        const char *alpha = is_rev[b] ? REV : FWD;
        const uint8_t *qs = qseg + q_off[b];
        const uint8_t *rs = rseq + r_off[b];
        int64_t nc = cig_off[b + 1] - cig_off[b];
        const uint32_t *cg = cig + cig_off[b];
        md_off[b] = pos;
        int64_t x = 0, y = 0;
        int32_t u = 0, nm = 0;
        for (int64_t k = 0; k < nc; k++) {
            int op = cg[k] & 0xF;
            int64_t ln = cg[k] >> 4;
            if (op == 0) {
                for (int64_t i = 0; i < ln; i++) {
                    if (qs[x + i] != rs[y + i]) {
                        nm++;
                        if (pos + 16 > md_cap) goto need;
                        pos += sprintf(md_buf + pos, "%d", u);
                        md_buf[pos++] = alpha[rs[y + i]];
                        u = 0;
                    } else {
                        u++;
                    }
                }
                x += ln;
                y += ln;
            } else if (op == 2) {
                if (k > 0 && k < nc - 1) {
                    if (pos + 18 + ln > md_cap) goto need;
                    pos += sprintf(md_buf + pos, "%d", u);
                    md_buf[pos++] = '^';
                    for (int64_t i = 0; i < ln; i++)
                        md_buf[pos++] = alpha[rs[y + i]];
                    u = 0;
                    nm += (int32_t)ln;
                }
                y += ln;
            } else if (op == 1) {
                x += ln;
                nm += (int32_t)ln;
            }
        }
        if (pos + 16 > md_cap) goto need;
        pos += sprintf(md_buf + pos, "%d", u);
        nm_out[b] = nm;
    }
    md_off[n_jobs] = pos;
    return 0;
need:
    /* conservative upper bound for a retry */
    {
        int64_t need = pos;
        for (int64_t b2 = 0; b2 < n_jobs; b2++)
            need += 16 + 2 * (r_off[b2 + 1] - r_off[b2]);
        return need + 64;
    }
}

/* ------------------------------------------------------------------------
 * mark_primary_batch — mem_mark_primary_se over a batch of reg lists
 * (reference bwamem.c:503-565; spec: finalize.mark_primary_se).  Reads
 * with <2 regs are handled by the Python fast path and never reach here.
 *
 * Inputs are read-major flat arrays in the PRE-SORT order; outputs include
 * the final sorted order as a read-local permutation (perm[k] = original
 * index of the reg at sorted position k) plus the per-reg fields the two
 * core rounds assign.  Tie stability is irrelevant: the sort keys embed
 * the 64-bit hash of the batch-global record id (distinct per reg).
 * ---------------------------------------------------------------------- */

static inline uint64_t hash64(uint64_t key)
{
    key += ~(key << 32); key ^= (key >> 22);
    key += ~(key << 13); key ^= (key >> 8);
    key += (key << 3);   key ^= (key >> 15);
    key += ~(key << 27); key ^= (key >> 31);
    return key;
}

typedef struct {
    int32_t score, qb, qe;
    uint8_t is_alt;
    uint64_t hash;
    int32_t orig;                       /* original read-local index */
    int32_t secondary, secondary_all, sub, sub_n, alt_sc;
} mpreg_t;

static int cmp_hash(const void *a_, const void *b_)
{   /* mem_ars_hash: score desc, is_alt asc, hash asc (bwamem.c:533) */
    const mpreg_t *a = a_, *b = b_;
    if (a->score != b->score) return a->score > b->score ? -1 : 1;
    if (a->is_alt != b->is_alt) return a->is_alt < b->is_alt ? -1 : 1;
    return a->hash < b->hash ? -1 : a->hash > b->hash ? 1 : 0;
}

static int cmp_hash2(const void *a_, const void *b_)
{   /* mem_ars_hash2: is_alt asc, score desc, hash asc (bwamem.c:537) */
    const mpreg_t *a = a_, *b = b_;
    if (a->is_alt != b->is_alt) return a->is_alt < b->is_alt ? -1 : 1;
    if (a->score != b->score) return a->score > b->score ? -1 : 1;
    return a->hash < b->hash ? -1 : a->hash > b->hash ? 1 : 0;
}

static void mark_core(mpreg_t *a, int n, int tmp, float mask_level,
                      int *z /* scratch >= n */)
{   /* mem_mark_primary_se_core (bwamem.c:503-527) */
    int nz = 0, i, k;
    z[nz++] = 0;
    for (i = 1; i < n; i++) {
        int placed = 0;
        for (k = 0; k < nz; k++) {
            int j = z[k];
            int b_max = a[j].qb > a[i].qb ? a[j].qb : a[i].qb;
            int e_min = a[j].qe < a[i].qe ? a[j].qe : a[i].qe;
            if (e_min > b_max) {
                int li = a[i].qe - a[i].qb, lj = a[j].qe - a[j].qb;
                int min_l = li < lj ? li : lj;
                if (e_min - b_max >= min_l * mask_level) {
                    if (a[j].sub == 0) a[j].sub = a[i].score;
                    if (a[j].score - a[i].score <= tmp &&
                        (a[j].is_alt || !a[i].is_alt))
                        a[j].sub_n++;
                    a[i].secondary = j;
                    placed = 1;
                    break;
                }
            }
        }
        if (!placed) z[nz++] = i;
    }
}

#define MP_INT_MAX 0x7FFFFFFF

int mark_primary_batch(int64_t n_reads, const int64_t *off,
                       const int64_t *ids,
                       const int32_t *score, const int32_t *qb,
                       const int32_t *qe, const uint8_t *is_alt,
                       int32_t tmp /* max(a+b, o_del+e_del, o_ins+e_ins) */,
                       float mask_level,
                       int32_t *perm, int32_t *secondary,
                       int32_t *secondary_all, int32_t *sub,
                       int32_t *sub_n, int32_t *alt_sc, int32_t *n_pri_out)
{
    int64_t nmax = 0;
    for (int64_t r = 0; r < n_reads; r++)
        if (off[r + 1] - off[r] > nmax) nmax = off[r + 1] - off[r];
    mpreg_t *a = malloc((nmax ? nmax : 1) * sizeof(mpreg_t));
    int *z = malloc((nmax ? nmax : 1) * sizeof(int));
    int *zmap = malloc((nmax ? nmax : 1) * sizeof(int));
    if (!a || !z || !zmap) { free(a); free(z); free(zmap); return -2; }
    for (int64_t r = 0; r < n_reads; r++) {
        int64_t b0 = off[r];
        int n = (int)(off[r + 1] - b0);
        int n_pri = 0, i;
        for (i = 0; i < n; i++) {
            a[i].score = score[b0 + i];
            a[i].qb = qb[b0 + i];
            a[i].qe = qe[b0 + i];
            a[i].is_alt = is_alt[b0 + i];
            a[i].hash = hash64((uint64_t)(ids[r] + i));
            a[i].orig = i;
            a[i].secondary = a[i].secondary_all = -1;
            a[i].sub = a[i].sub_n = a[i].alt_sc = 0;
            if (!a[i].is_alt) n_pri++;
        }
        qsort(a, n, sizeof(mpreg_t), cmp_hash);
        mark_core(a, n, tmp, mask_level, z);
        for (i = 0; i < n; i++) {
            a[i].secondary_all = i;
            if (!a[i].is_alt && a[i].secondary >= 0 &&
                a[a[i].secondary].is_alt)
                a[i].alt_sc = a[a[i].secondary].score;
        }
        if (n_pri < n) {
            if (n_pri > 0) qsort(a, n, sizeof(mpreg_t), cmp_hash2);
            for (i = 0; i < n; i++) zmap[a[i].secondary_all] = i;
            for (i = 0; i < n; i++) {
                if (a[i].secondary >= 0) {
                    a[i].secondary_all = zmap[a[i].secondary];
                    if (a[i].is_alt) a[i].secondary = MP_INT_MAX;
                } else {
                    a[i].secondary_all = -1;
                }
            }
            if (n_pri > 0) {
                for (i = 0; i < n_pri; i++) {
                    a[i].sub = 0;
                    a[i].secondary = -1;
                }
                mark_core(a, n_pri, tmp, mask_level, z);
            }
        } else {
            for (i = 0; i < n; i++) a[i].secondary_all = a[i].secondary;
        }
        for (i = 0; i < n; i++) {
            perm[b0 + i] = a[i].orig;
            secondary[b0 + i] = a[i].secondary;
            secondary_all[b0 + i] = a[i].secondary_all;
            sub[b0 + i] = a[i].sub;
            sub_n[b0 + i] = a[i].sub_n;
            alt_sc[b0 + i] = a[i].alt_sc;
        }
        n_pri_out[r] = n_pri;
    }
    free(a); free(z); free(zmap);
    return 0;
}

/* ------------------------------------------------------------------------
 * sam_batch — render SAM lines from numeric records (mem_aln2sam,
 * reference bwamem.c:832-956; spec: io/sam.aln2sam).  The caller
 * (io/sam.SamBatch) does the branchy mate fixups in Python and passes
 * FINAL per-line fields; this renders columns + tags.
 *
 * fields per line (int32, F32 columns):
 *   0 flag(raw) 1 rid 2 pos 3 mapq 4 which 5 is_alt 6 is_rev 7 l_seq
 *   8 NM 9 AS 10 XS 11 alt_sc 12 has_mate 13 m_rid 14 m_pos 15 m_is_rev
 *   16 m_rlen 17 m_has_cigar 18 qb_hint(unused) 19 softclip_all
 * blobs (each with [n+1] offsets): name, cigar(u32 runs), seq(nt4 full),
 * qual(bytes; empty=*), md, mc, sa, xa, tail(comment/XR pre-rendered with
 * leading tab).  ctg: contig-name blob indexed by rid via coff.
 * Output: out buffer + line offsets; returns 0 or needed size.
 * ---------------------------------------------------------------------- */

#define F32 20

static inline char *put_u(char *p, uint32_t v)
{
    char tmp[12]; int k = 0;
    if (!v) { *p++ = '0'; return p; }
    while (v) { tmp[k++] = '0' + v % 10; v /= 10; }
    while (k) *p++ = tmp[--k];
    return p;
}

static inline char *put_i(char *p, int64_t v)
{
    if (v < 0) { *p++ = '-'; v = -v; }
    return put_u(p, (uint32_t)v);
}

int64_t sam_batch(int64_t n_lines, const int32_t *fields,
                  const char *name, const int64_t *name_off,
                  const uint32_t *cig, const int64_t *cig_off,
                  const uint8_t *seq, const int64_t *seq_off,
                  const char *qual, const int64_t *qual_off,
                  const char *md, const int64_t *md_off,
                  const char *mc, const int64_t *mc_off,
                  const char *sa, const int64_t *sa_off,
                  const char *xa, const int64_t *xa_off,
                  const char *tail, const int64_t *tail_off,
                  const char *ctg, const int64_t *coff,
                  const char *rg, int64_t rg_len, int32_t xb_flag,
                  char *out, int64_t cap, int64_t *line_off)
{
    static const char CIG[6] = "MIDSHN";
    static const char FWDB[5] = "ACGTN";
    static const char REVB[5] = "TGCAN";
    int64_t pos = 0;
    for (int64_t b = 0; b < n_lines; b++) {
        const int32_t *f = fields + b * F32;
        int32_t flag = f[0], rid = f[1], p_pos = f[2], mapq = f[3];
        int32_t which = f[4], is_alt = f[5], is_rev = f[6], l_seq = f[7];
        int64_t nlen = name_off[b + 1] - name_off[b];
        int64_t ncg = cig_off[b + 1] - cig_off[b];
        const uint32_t *cg = cig + cig_off[b];
        int soft = f[19] || is_alt;     /* S stays S (MEM_F_SOFTCLIP/alt) */
        /* worst-case line size */
        int64_t need = nlen + 64 + ncg * 12 + 2 * (int64_t)l_seq
            + (md_off[b + 1] - md_off[b]) + (mc_off[b + 1] - mc_off[b])
            + (sa_off[b + 1] - sa_off[b]) + (xa_off[b + 1] - xa_off[b])
            + (tail_off[b + 1] - tail_off[b]) + rg_len + 160;
        if (rid >= 0) need += coff[rid + 1] - coff[rid];
        if (f[13] >= 0) need += coff[f[13] + 1] - coff[f[13]];
        if (pos + need > cap) {
            int64_t total = pos + need + 64;
            for (int64_t b2 = b + 1; b2 < n_lines; b2++) {
                const int32_t *f2 = fields + b2 * F32;
                total += (name_off[b2+1]-name_off[b2]) + 64
                    + (cig_off[b2+1]-cig_off[b2]) * 12 + 2 * (int64_t)f2[7]
                    + (md_off[b2+1]-md_off[b2]) + (mc_off[b2+1]-mc_off[b2])
                    + (sa_off[b2+1]-sa_off[b2]) + (xa_off[b2+1]-xa_off[b2])
                    + (tail_off[b2+1]-tail_off[b2]) + rg_len + 320;
            }
            return total;
        }
        char *o = out + pos;
        line_off[b] = pos;
        memcpy(o, name + name_off[b], nlen); o += nlen;
        *o++ = '\t';
        uint32_t flag16 = (flag & 0xFFFF) | ((flag & 0x10000) ? 0x100 : 0);
        o = put_u(o, flag16); *o++ = '\t';
        if (rid >= 0) {
            int64_t cl = coff[rid + 1] - coff[rid];
            memcpy(o, ctg + coff[rid], cl); o += cl;
            *o++ = '\t';
            o = put_u(o, (uint32_t)(p_pos + 1)); *o++ = '\t';
            o = put_u(o, (uint32_t)mapq); *o++ = '\t';
            if (!ncg) { *o++ = '*'; }
            for (int64_t k = 0; k < ncg; k++) {
                int op = cg[k] & 0xF;
                if (!soft && (op == 3 || op == 4)) op = which ? 4 : 3;
                o = put_u(o, cg[k] >> 4);
                *o++ = CIG[op];
            }
        } else {
            memcpy(o, "*\t0\t0\t*", 7); o += 7;
        }
        *o++ = '\t';
        int32_t m_rid = f[13];
        if (f[12] && m_rid >= 0) {
            if (rid == m_rid) *o++ = '=';
            else {
                int64_t cl = coff[m_rid + 1] - coff[m_rid];
                memcpy(o, ctg + coff[m_rid], cl); o += cl;
            }
            *o++ = '\t';
            o = put_u(o, (uint32_t)(f[14] + 1)); *o++ = '\t';
            if (rid == m_rid && ncg && f[17]) {
                int64_t rl = 0;
                for (int64_t k = 0; k < ncg; k++) {
                    int op = cg[k] & 0xF;
                    if (op == 0 || op == 2) rl += cg[k] >> 4;
                }
                int64_t p0 = p_pos + (is_rev ? rl - 1 : 0);
                int64_t p1 = f[14] + (f[15] ? (int64_t)f[16] - 1 : 0);
                int64_t sg = p0 > p1 ? 1 : p0 < p1 ? -1 : 0;
                o = put_i(o, -(p0 - p1 + sg));
            } else {
                *o++ = '0';
            }
        } else {
            memcpy(o, "*\t0\t0", 5); o += 5;
        }
        *o++ = '\t';
        if (flag & 0x100) {
            *o++ = '*'; *o++ = '\t'; *o++ = '*';
        } else {
            int32_t qb = 0, qe = l_seq;
            if (ncg && which && !soft) {
                int c0 = cg[0] & 0xF, cl0 = cg[0] >> 4;
                int cn = cg[ncg - 1] & 0xF, cln = cg[ncg - 1] >> 4;
                if (!is_rev) {
                    if (c0 == 3 || c0 == 4) qb += cl0;
                    if (cn == 3 || cn == 4) qe -= cln;
                } else {
                    if (c0 == 3 || c0 == 4) qe -= cl0;
                    if (cn == 3 || cn == 4) qb += cln;
                }
            }
            const uint8_t *sq = seq + seq_off[b];
            if (!is_rev)
                for (int32_t i = qb; i < qe; i++) *o++ = FWDB[sq[i]];
            else
                for (int32_t i = qe - 1; i >= qb; i--) *o++ = REVB[sq[i]];
            *o++ = '\t';
            int64_t qln = qual_off[b + 1] - qual_off[b];
            if (!qln) *o++ = '*';
            else if (!is_rev) {
                memcpy(o, qual + qual_off[b] + qb, qe - qb); o += qe - qb;
            } else {
                const char *qs = qual + qual_off[b];
                for (int32_t i = qe - 1; i >= qb; i--) *o++ = qs[i];
            }
        }
        if (ncg) {
            memcpy(o, "\tNM:i:", 6); o += 6;
            o = put_i(o, f[8]);
            memcpy(o, "\tMD:Z:", 6); o += 6;
            int64_t ml = md_off[b + 1] - md_off[b];
            memcpy(o, md + md_off[b], ml); o += ml;
        }
        int64_t mcl = mc_off[b + 1] - mc_off[b];
        if (mcl) {
            memcpy(o, "\tMC:Z:", 6); o += 6;
            memcpy(o, mc + mc_off[b], mcl); o += mcl;
        }
        if (f[9] >= 0) {
            memcpy(o, "\tAS:i:", 6); o += 6;
            o = put_i(o, f[9]);
        }
        if (f[10] >= 0) {
            memcpy(o, "\tXS:i:", 6); o += 6;
            o = put_i(o, f[10]);
        }
        if (rg_len) {
            memcpy(o, "\tRG:Z:", 6); o += 6;
            memcpy(o, rg, rg_len); o += rg_len;
        }
        if (!(flag & 0x100)) {
            int64_t sl = sa_off[b + 1] - sa_off[b];
            if (sl) {
                memcpy(o, "\tSA:Z:", 6); o += 6;
                memcpy(o, sa + sa_off[b], sl); o += sl;
            }
            if (f[11] > 0) {        /* pa:f: score/alt_sc */
                o += sprintf(o, "\tpa:f:%.3f", (double)f[9] / f[11]);
            }
        }
        int64_t xl = xa_off[b + 1] - xa_off[b];
        if (xl) {
            memcpy(o, xb_flag ? "\tXB:Z:" : "\tXA:Z:", 6); o += 6;
            memcpy(o, xa + xa_off[b], xl); o += xl;
        }
        int64_t tl = tail_off[b + 1] - tail_off[b];
        if (tl) { memcpy(o, tail + tail_off[b], tl); o += tl; }
        *o++ = '\n';
        pos = o - out;
    }
    line_off[n_lines] = pos;
    return 0;
}

/* ------------------------------------------------------------------------
 * replay_batch — exact mem_chain_flt + mem_chain2aln skip/accept replay
 * over the fetched device arenas (spec: pipeline/device_front._replay +
 * pipeline/chainflt_host.chain_flt_exact; reference behavior
 * bwamem.c:331-392 chain filtering incl. ks_introsort(mem_flt) tie order,
 * bwamem.c:628-637 cal_max_gap, bwamem.c:660-793 the seed accept walk).
 *
 * Inputs are read-major flat arenas with [n+1] base offsets:
 *   chains: ch_base; per chain c_w/c_beg/c_end (int32), c_alt (u8),
 *           c_pos (int64, B-tree traversal key), c_rid (int32)
 *   items:  it_base; per item i_chain (read-local chain id, int32),
 *           i_qbeg/i_len (int32), i_rbeg (int64) — the SEED;
 *           n_qb/n_qe/score/truesc/n_w/seedcov (int32), n_rb/n_re (int64)
 *           — the extension result used for emitted-reg overlap tests.
 * skip: per-read u8, 1 = leave read untouched (host-fallback row).
 * has_res: per-item u8 (NULL = every item has an extension result).  The
 * two-round extension driver (device_front round-5 plan) calls this twice:
 * a PREPASS with only the srt-first item of each chain extended — items the
 * walk would emit but that lack a result are appended to out_need instead
 * of emitted (their region never enters the containment tests, which only
 * ever removes skips: fewer regions -> fewer skips -> out_need is a
 * superset of what the exact walk extends) — and a FINAL pass with the
 * round-2 results merged in, where a still-unresolved item demotes its
 * read to the host-front fallback (out_need again; caller discards the
 * read's emission).
 * Outputs: out_base[n+1]; per accepted item out_m (global item index,
 * int64) and out_rid (int32), in emission order; out_need/out_nn (may be
 * NULL) collect result-less would-emit items.  Caller materializes
 * AlnReg objects.  Returns 0, -2 on alloc failure.
 * ---------------------------------------------------------------------- */

typedef struct { int32_t w; int32_t idx; } wi_t;

static inline int wi_lt(wi_t a, wi_t b) { return a.w > b.w; }

static void wi_insertsort(wi_t *a, int s, int t)
{
    for (int i = s + 1; i < t; i++) {
        int j = i;
        while (j > s && wi_lt(a[j], a[j - 1])) {
            wi_t tmp = a[j]; a[j] = a[j - 1]; a[j - 1] = tmp;
            j--;
        }
    }
}

static void wi_combsort(wi_t *a, int off, int cnt)
{
    const double shrink = 1.2473309501039786540366528676643;
    int gap = cnt;
    for (;;) {
        if (gap > 2) {
            gap = (int)(gap / shrink);
            if (gap == 9 || gap == 10) gap = 11;
        }
        int do_swap = 0;
        for (int i = off; i < off + cnt - gap; i++) {
            int j = i + gap;
            if (wi_lt(a[j], a[i])) {
                wi_t tmp = a[i]; a[i] = a[j]; a[j] = tmp;
                do_swap = 1;
            }
        }
        if (!(do_swap || gap > 2)) break;
    }
    if (gap != 1) wi_insertsort(a, off, off + cnt);
}

/* ks_introsort(mem_flt) permutation: sorts (w, input-index) pairs with
 * comparator w-desc using klib's introsort control flow (the EQUAL-weight
 * permutation is load-bearing for mem_chain_flt's kept set). */
static void wi_introsort(wi_t *a, int n)
{
    typedef struct { int s, t, d; } frame_t;
    frame_t stack[128];
    int nstk = 0;
    if (n < 2) return;
    if (n == 2) {
        if (wi_lt(a[1], a[0])) { wi_t t = a[0]; a[0] = a[1]; a[1] = t; }
        return;
    }
    int d = 2;
    while ((1 << d) < n) d++;
    int s = 0, t = n - 1;
    d <<= 1;
    for (;;) {
        if (s < t) {
            d--;
            if (d == 0) { wi_combsort(a, s, t - s + 1); t = s; continue; }
            int i = s, j = t;
            int k = i + ((j - i) >> 1) + 1;
            if (wi_lt(a[k], a[i])) {
                if (wi_lt(a[k], a[j])) k = j;
            } else {
                k = wi_lt(a[j], a[i]) ? i : j;
            }
            wi_t rp = a[k];
            if (k != t) { wi_t tmp = a[k]; a[k] = a[t]; a[t] = tmp; }
            for (;;) {
                i++;
                while (wi_lt(a[i], rp)) i++;
                j--;
                while (i <= j && wi_lt(rp, a[j])) j--;
                if (j <= i) break;
                wi_t tmp = a[i]; a[i] = a[j]; a[j] = tmp;
            }
            { wi_t tmp = a[i]; a[i] = a[t]; a[t] = tmp; }
            if (i - s > t - i) {
                if (i - s > 16) {
                    stack[nstk].s = s; stack[nstk].t = i - 1;
                    stack[nstk].d = d; nstk++;
                }
                s = (t - i > 16) ? i + 1 : t;
            } else {
                if (t - i > 16) {
                    stack[nstk].s = i + 1; stack[nstk].t = t;
                    stack[nstk].d = d; nstk++;
                }
                t = (i - s > 16) ? i - 1 : s;
            }
        } else {
            if (nstk == 0) { wi_insertsort(a, 0, n); return; }
            nstk--;
            s = stack[nstk].s; t = stack[nstk].t; d = stack[nstk].d;
        }
    }
}

typedef struct { int64_t pos; int32_t idx; } trav_t;

static int cmp_trav(const void *a_, const void *b_)
{
    const trav_t *a = a_, *b = b_;
    if (a->pos != b->pos) return a->pos < b->pos ? -1 : 1;
    return a->idx < b->idx ? -1 : 1;
}

static inline int cal_max_gap_c(int qlen, int a, int o_del, int e_del,
                                int o_ins, int e_ins, int w)
{   /* cal_max_gap (bwamem.c:628-637): C float truncation semantics */
    int l_del = (int)((double)(qlen * a - o_del) / e_del + 1.);
    int l_ins = (int)((double)(qlen * a - o_ins) / e_ins + 1.);
    int l = l_del > l_ins ? l_del : l_ins;
    if (l < 1) l = 1;
    int ww = w << 1;
    return l < ww ? l : ww;
}

int replay_batch(int64_t n_reads,
                 const int64_t *ch_base,
                 const int32_t *c_w, const int32_t *c_beg,
                 const int32_t *c_end, const uint8_t *c_alt,
                 const int64_t *c_pos, const int32_t *c_rid,
                 const int64_t *it_base,
                 const int32_t *i_chain, const int32_t *i_qbeg,
                 const int32_t *i_len, const int64_t *i_rbeg,
                 const int32_t *n_qb, const int32_t *n_qe,
                 const int64_t *n_rb, const int64_t *n_re,
                 const int32_t *n_w,
                 const uint8_t *skip, const int32_t *l_seq,
                 float mask_level, float drop_ratio,
                 int32_t min_seed_len, int32_t max_chain_gap,
                 int32_t min_chain_weight, int32_t max_chain_extend,
                 int32_t a_sc, int32_t o_del, int32_t e_del,
                 int32_t o_ins, int32_t e_ins, int32_t w_opt,
                 const uint8_t *has_res, int64_t *out_need, int64_t *out_nn,
                 int64_t *out_base, int64_t *out_m, int32_t *out_rid)
{
    int64_t nn = 0;
    int64_t cmax = 0, imax = 0;
    for (int64_t r = 0; r < n_reads; r++) {
        int64_t nc = ch_base[r + 1] - ch_base[r];
        int64_t ni = it_base[r + 1] - it_base[r];
        if (nc > cmax) cmax = nc;
        if (ni > imax) imax = ni;
    }
    if (cmax < 1) cmax = 1;
    if (imax < 1) imax = 1;
    trav_t *trav = malloc(cmax * sizeof(trav_t));
    wi_t *wi = malloc(cmax * sizeof(wi_t));
    int32_t *srt = malloc(cmax * sizeof(int32_t));
    uint8_t *kept = malloc(cmax);
    int32_t *first = malloc(cmax * sizeof(int32_t));
    int32_t *keep_list = malloc(cmax * sizeof(int32_t));
    int32_t *kept_ids = malloc(cmax * sizeof(int32_t));
    /* by-chain counting sort over items */
    int32_t *cnt = malloc((cmax + 1) * sizeof(int32_t));
    int32_t *coff = malloc((cmax + 1) * sizeof(int32_t));
    int32_t *by_chain = malloc(imax * sizeof(int32_t)); /* local item idx */
    wi_t *ord = malloc(imax * sizeof(wi_t));
    int32_t *work = malloc(imax * sizeof(int32_t));     /* local item idx */
    int32_t *wchain = malloc(imax * sizeof(int32_t));
    int32_t *chpos = malloc(imax * sizeof(int32_t)); /* k of work in chain */
    uint8_t *marks = malloc(imax);
    if (!trav || !wi || !srt || !kept || !first || !keep_list || !kept_ids
        || !cnt || !coff || !by_chain || !ord || !work || !wchain
        || !chpos || !marks) {
        free(trav); free(wi); free(srt); free(kept); free(first);
        free(keep_list); free(kept_ids); free(cnt); free(coff);
        free(by_chain); free(ord); free(work); free(wchain); free(chpos);
        free(marks);
        return -2;
    }

    int64_t emit = 0;
    for (int64_t r = 0; r < n_reads; r++) {
        out_base[r] = emit;
        if (skip[r]) continue;
        int64_t cb = ch_base[r], ce = ch_base[r + 1];
        int nch = (int)(ce - cb);
        if (nch == 0) continue;
        int64_t ib = it_base[r], ie = it_base[r + 1];
        int nit = (int)(ie - ib);

        /* traversal order (pos asc, creation idx asc) then weight gate */
        for (int c = 0; c < nch; c++) {
            trav[c].pos = c_pos[cb + c];
            trav[c].idx = c;
        }
        qsort(trav, nch, sizeof(trav_t), cmp_trav);
        int nh = 0;
        for (int c = 0; c < nch; c++) {
            int id = trav[c].idx;
            if (c_w[cb + id] >= min_chain_weight) {
                wi[nh].w = c_w[cb + id];
                wi[nh].idx = nh;
                srt[nh] = id;      /* pre-sort: ids in trav order */
                nh++;
            }
        }
        if (nh == 0) continue;
        wi_introsort(wi, nh);
        /* srt[i] = chain id at sorted index i */
        for (int i = 0; i < nh; i++) kept_ids[i] = srt[wi[i].idx];
        memcpy(srt, kept_ids, nh * sizeof(int32_t));

        /* mem_chain_flt kept walk (bwamem.c:344-379) */
        int nkeep = 0;
        memset(kept, 0, nh);
        for (int i = 0; i < nh; i++) first[i] = -1;
        keep_list[nkeep++] = 0;
        kept[0] = 3;
        for (int i = 1; i < nh; i++) {
            int ci = srt[i];
            int large_ovlp = 0, dropped = 0;
            for (int kk = 0; kk < nkeep; kk++) {
                int j = keep_list[kk];
                int cj = srt[j];
                int b_max = c_beg[cb + cj] > c_beg[cb + ci]
                          ? c_beg[cb + cj] : c_beg[cb + ci];
                int e_min = c_end[cb + cj] < c_end[cb + ci]
                          ? c_end[cb + cj] : c_end[cb + ci];
                if (e_min > b_max && (!c_alt[cb + cj] || c_alt[cb + ci])) {
                    int li = c_end[cb + ci] - c_beg[cb + ci];
                    int lj = c_end[cb + cj] - c_beg[cb + cj];
                    int min_l = li < lj ? li : lj;
                    if (e_min - b_max >= min_l * mask_level
                        && min_l < max_chain_gap) {
                        large_ovlp = 1;
                        if (first[j] < 0) first[j] = i;
                        if (c_w[cb + ci] < c_w[cb + cj] * drop_ratio
                            && c_w[cb + cj] - c_w[cb + ci]
                               >= min_seed_len << 1) {
                            dropped = 1;
                            break;
                        }
                    }
                }
            }
            if (!dropped) {
                keep_list[nkeep++] = i;
                kept[i] = large_ovlp ? 2 : 3;
            }
        }
        for (int kk = 0; kk < nkeep; kk++) {
            int j = keep_list[kk];
            if (first[j] >= 0) kept[first[j]] = 1;
        }
        /* max_chain_extend cap (bwamem.c:380-386) */
        {
            int k = 0, i = 0;
            while (i < nh) {
                if (kept[i] == 1 || kept[i] == 2) {
                    k++;
                    if (k >= max_chain_extend) break;
                }
                i++;
            }
            while (i < nh) {
                if (kept[i] < 3) kept[i] = 0;
                i++;
            }
        }
        int nkept = 0;
        for (int i = 0; i < nh; i++)
            if (kept[i] > 0) kept_ids[nkept++] = srt[i];
        if (nkept == 0) continue;

        /* group items by read-local chain id (insertion = m asc) */
        memset(cnt, 0, (nch + 1) * sizeof(int32_t));
        for (int m = 0; m < nit; m++) {
            int ch = i_chain[ib + m];
            if (ch >= 0 && ch < nch) cnt[ch]++;
        }
        coff[0] = 0;
        for (int c = 0; c < nch; c++) coff[c + 1] = coff[c] + cnt[c];
        memset(cnt, 0, nch * sizeof(int32_t));
        for (int m = 0; m < nit; m++) {
            int ch = i_chain[ib + m];
            if (ch >= 0 && ch < nch) by_chain[coff[ch] + cnt[ch]++] = m;
        }

        /* work order: kept chains in sorted order; within a chain by
         * (len desc, insertion idx desc) — the DESC srt walk
         * (bwamem.c:669-676) */
        int cnum = 0;
        for (int kk = 0; kk < nkept; kk++) {
            int c = kept_ids[kk];
            int nm = coff[c + 1] - coff[c];
            for (int k = 0; k < nm; k++) {
                ord[k].w = i_len[ib + by_chain[coff[c] + k]];
                ord[k].idx = k;
            }
            /* (len desc, idx desc): qsort comparator is fine — all keys
             * distinct because idx is unique */
            for (int x = 1; x < nm; x++) {    /* insertion sort: nm small */
                wi_t v = ord[x];
                int y = x - 1;
                while (y >= 0 && (ord[y].w < v.w
                                  || (ord[y].w == v.w && ord[y].idx < v.idx))) {
                    ord[y + 1] = ord[y];
                    y--;
                }
                ord[y + 1] = v;
            }
            for (int k = 0; k < nm; k++) {
                int ki = cnum + k;
                work[ki] = by_chain[coff[c] + ord[k].idx];
                wchain[ki] = c;
                chpos[ki] = k;    /* position within this chain's run */
            }
            cnum += nm;
        }

        /* accept/skip walk (bwamem.c:674-793 srt-walk semantics) */
        int lq = l_seq[r];
        int64_t first_emit = emit;
        memset(marks, 1, cnum);
        for (int k = 0; k < cnum; k++) {
            int m = work[k];
            int64_t gm = ib + m;
            int64_t srb = i_rbeg[gm];
            int sqb = i_qbeg[gm], slen = i_len[gm];
            int hit = -1;
            for (int64_t e = first_emit; e < emit; e++) {
                int64_t pm = out_m[e];
                int64_t prb = n_rb[pm], pre = n_re[pm];
                int pqb = n_qb[pm], pqe = n_qe[pm];
                if (srb < prb || srb + slen > pre || sqb < pqb
                    || sqb + slen > pqe)
                    continue;
                if ((double)(slen - i_len[pm]) > .1 * lq) continue;
                int qd = sqb - pqb;
                int64_t rd64 = srb - prb;
                int rd = rd64 > MP_INT_MAX ? MP_INT_MAX : (int)rd64;
                int mn = qd < rd ? qd : rd;
                int w = cal_max_gap_c(mn, a_sc, o_del, e_del, o_ins,
                                      e_ins, w_opt);
                if (w > n_w[pm]) w = n_w[pm];
                if (qd - rd < w && rd - qd < w) { hit = 1; break; }
                qd = pqe - (sqb + slen);
                rd64 = pre - (srb + slen);
                rd = rd64 > MP_INT_MAX ? MP_INT_MAX : (int)rd64;
                mn = qd < rd ? qd : rd;
                w = cal_max_gap_c(mn, a_sc, o_del, e_del, o_ins,
                                  e_ins, w_opt);
                if (w > n_w[pm]) w = n_w[pm];
                if (qd - rd < w && rd - qd < w) { hit = 1; break; }
            }
            if (hit >= 0) {
                /* overlapping-seed exception (bwamem.c:699-711): walk
                 * earlier STILL-MARKED seeds of the same chain */
                int differs = 0;
                for (int k2 = k - 1; k2 >= k - chpos[k]; k2--) {
                    if (!marks[k2]) continue;
                    int64_t gm2 = ib + work[k2];
                    int tq = i_qbeg[gm2];
                    int64_t tr = i_rbeg[gm2];
                    int tl = i_len[gm2];
                    if ((double)tl < slen * .95) continue;
                    if (sqb <= tq && sqb + slen - tq >= slen >> 2
                        && tq - sqb != tr - srb) { differs = 1; break; }
                    if (tq <= sqb && tq + tl - sqb >= slen >> 2
                        && sqb - tq != srb - tr) { differs = 1; break; }
                }
                if (!differs) { marks[k] = 0; continue; }
            }
            if (has_res && !has_res[gm]) {
                /* would emit, but no extension result yet */
                if (out_need) out_need[nn] = gm;
                nn++;
                continue;
            }
            out_m[emit] = gm;
            out_rid[emit] = c_rid[cb + wchain[k]];
            emit++;
        }
    }
    out_base[n_reads] = emit;
    if (out_nn) *out_nn = nn;

    free(trav); free(wi); free(srt); free(kept); free(first);
    free(keep_list); free(kept_ids); free(cnt); free(coff);
    free(by_chain); free(ord); free(work); free(wchain); free(chpos);
    free(marks);
    return 0;
}

/* ------------------------------------------------------------------ */
/* mem_pair batched over all eligible pairs of a batch (bwamem_pair.c:
 * 208-269; spec: pair.mem_pair).  Inputs are flat per-end reg arrays of
 * the first n_pri regs of each read: off0/off1 [n_pairs+1] index into
 * (rb*, rid*, sc*).  Writes per-pair (o, sub, n_sub, z0, z1).
 *
 * One deliberate divergence from the Python spec: when the erfc insert-
 * size prior underflows to 0, log() yields -inf and the C reference's
 * (int) conversion + q>0 clamp produce 0 (bwamem_pair.c:246-248) — the
 * Python int(-inf) would raise instead; we follow the C reference. */

typedef struct { uint64_t x, y; } pv_t;
typedef struct { uint64_t key, yk; } pu_t;

static int cmp_pv(const void *a_, const void *b_)
{
    const pv_t *a = a_, *b = b_;
    if (a->x != b->x) return a->x < b->x ? -1 : 1;
    return a->y < b->y ? -1 : a->y > b->y ? 1 : 0;
}

static int cmp_pu(const void *a_, const void *b_)
{
    const pu_t *a = a_, *b = b_;
    if (a->key != b->key) return a->key < b->key ? -1 : 1;
    return a->yk < b->yk ? -1 : a->yk > b->yk ? 1 : 0;
}

int pair_batch(int64_t n_pairs,
               const int64_t *off0, const int64_t *off1,
               const int64_t *rb0, const int32_t *rid0, const int32_t *sc0,
               const int64_t *rb1, const int32_t *rid1, const int32_t *sc1,
               const int64_t *ids,
               const int64_t *ctg_off, int64_t l_pac,
               const int32_t *pes_failed, const int32_t *pes_low,
               const int32_t *pes_high, const double *pes_avg,
               const double *pes_std,
               int32_t a_sc, int32_t tmp,
               int32_t *o_out, int32_t *sub_out, int32_t *nsub_out,
               int32_t *z0_out, int32_t *z1_out)
{
    int64_t p;
    int64_t max_nv = 0;
    for (p = 0; p < n_pairs; p++) {
        int64_t nv = (off0[p + 1] - off0[p]) + (off1[p + 1] - off1[p]);
        if (nv > max_nv) max_nv = nv;
    }
    if (max_nv < 1) max_nv = 1;
    pv_t *v = malloc(sizeof(pv_t) * (size_t)max_nv);
    pu_t *u = malloc(sizeof(pu_t) * (size_t)(max_nv * max_nv + 1));
    if (!v || !u) { free(v); free(u); return -1; }

    for (p = 0; p < n_pairs; p++) {
        int nv = 0, i, rr;
        int n0 = (int)(off0[p + 1] - off0[p]);
        int n1 = (int)(off1[p + 1] - off1[p]);
        const int64_t *rb[2] = { rb0 + off0[p], rb1 + off1[p] };
        const int32_t *rid[2] = { rid0 + off0[p], rid1 + off1[p] };
        const int32_t *sc[2] = { sc0 + off0[p], sc1 + off1[p] };
        int nn[2]; nn[0] = n0; nn[1] = n1;
        for (rr = 0; rr < 2; rr++) {
            for (i = 0; i < nn[rr]; i++) {
                int64_t b = rb[rr][i];
                int64_t fpos = b < l_pac ? b : (l_pac << 1) - 1 - b;
                int32_t rd = rid[rr][i];
                v[nv].x = ((uint64_t)(uint32_t)rd << 32)
                          | (uint64_t)(fpos - ctg_off[rd]);
                v[nv].y = ((uint64_t)(uint32_t)sc[rr][i] << 32)
                          | ((uint64_t)i << 2)
                          | ((uint64_t)(b >= l_pac) << 1) | (uint64_t)rr;
                nv++;
            }
        }
        qsort(v, nv, sizeof(pv_t), cmp_pv);
        int64_t y4[4] = { -1, -1, -1, -1 };
        int64_t nu = 0;
        for (i = 0; i < nv; i++) {
            for (rr = 0; rr < 2; rr++) {
                int dir = (rr << 1) | ((int)(v[i].y >> 1) & 1);
                int which;
                int64_t k;
                if (pes_failed[dir]) continue;
                which = (rr << 1) | (((int)v[i].y & 1) ^ 1);
                if (y4[which] < 0) continue;
                for (k = y4[which]; k >= 0; k--) {
                    uint64_t dist;
                    int q;
                    if (((int)v[k].y & 3) != which) continue;
                    dist = v[i].x - v[k].x;
                    if (dist > (uint64_t)(int64_t)pes_high[dir]) break;
                    if (dist < (uint64_t)(int64_t)pes_low[dir]) continue;
                    if (pes_std[dir] > 0) {
                        double ns = ((double)dist - pes_avg[dir])
                                    / pes_std[dir];
                        double val = (double)(int64_t)(v[i].y >> 32)
                            + (double)(int64_t)(v[k].y >> 32)
                            + .721 * log(2. * erfc(fabs(ns) * M_SQRT1_2))
                              * a_sc + .499;
                        q = (!(val > 0.)) ? 0
                            : val >= 2147483647. ? 2147483647 : (int)val;
                    } else {
                        /* std == 0: the C reference's 0/0 -> NaN path
                         * lands on 0 after the clamp */
                        q = 0;
                    }
                    {
                        uint64_t yk = ((uint64_t)k << 32) | (uint64_t)i;
                        u[nu].key = ((uint64_t)(uint32_t)q << 32)
                            | (uint32_t)hash64(yk
                                               ^ ((uint64_t)ids[p] << 8));
                        u[nu].yk = yk;
                        nu++;
                    }
                }
            }
            y4[v[i].y & 3] = i;
        }
        if (nu == 0) {
            o_out[p] = 0; sub_out[p] = 0; nsub_out[p] = 0;
            z0_out[p] = -1; z1_out[p] = -1;
            continue;
        }
        qsort(u, nu, sizeof(pu_t), cmp_pu);
        {
            int64_t i_ = (int64_t)(u[nu - 1].yk >> 32);
            int64_t k_ = (int64_t)(u[nu - 1].yk & 0xFFFFFFFFu);
            int32_t z[2] = { -1, -1 };
            int32_t sub = nu > 1 ? (int32_t)(u[nu - 2].key >> 32) : 0;
            int32_t nsub = 0;
            int64_t j;
            z[v[i_].y & 1] = (int32_t)((v[i_].y & 0xFFFFFFFFu) >> 2);
            z[v[k_].y & 1] = (int32_t)((v[k_].y & 0xFFFFFFFFu) >> 2);
            for (j = nu - 2; j >= 0; j--)
                if (sub - (int32_t)(u[j].key >> 32) <= tmp) nsub++;
            o_out[p] = (int32_t)(u[nu - 1].key >> 32);
            sub_out[p] = sub;
            nsub_out[p] = nsub;
            z0_out[p] = z[0];
            z1_out[p] = z[1];
        }
    }
    free(v); free(u);
    return 0;
}

/* ------------------------------------------------------------------ */
/* Unbanded local SW with ksw_align2 semantics — host port of the
 * batched device op ops/local_sw.py (itself the spec of the reference's
 * striped ksw_u8/ksw_i16 + ksw_align2, ksw.c:112-369), used by mate
 * rescue.  On the tunneled backend the lockstep device kernel pays
 * ~0.3 ms per vector op over up-to-1024 target rows; these are tiny
 * branchy DPs (150 x ~700 cells) that a scalar loop does in ~0.1 ms.
 *
 * Parity notes (all mirrored from ops/local_sw.py):
 *   - phantom columns: the query acts as padded to a multiple of the
 *     SIMD stripe p with 0-scoring bases; they carry ghost values that
 *     can change score2/te2;
 *   - F recurrence opens from ME=max(M,E) (striped layout), not H;
 *   - qe = minimum column attaining the best row's max;
 *   - score2 = b-array run merging with te +/- ceil(score/max_mat)
 *     exclusion;
 *   - tb/qb from a second pass over reversed prefixes with early stop
 *     at score; -1 when the passes disagree. */

static void ksw_pass_host(int qlen, int qpad, const uint8_t *query,
                          int tlen, const uint8_t *target,
                          int32_t endsc, const int8_t *mat,
                          int32_t oe_del, int32_t e_del,
                          int32_t oe_ins, int32_t e_ins,
                          int32_t *Hp, int32_t *E, int32_t *Hmax,
                          int32_t *rowmax,
                          int32_t *gmax_out, int32_t *te_out)
{
    int i, j;
    int32_t gmax = 0, te = -1;
    memset(Hp, 0, sizeof(int32_t) * (size_t)qpad);
    memset(E, 0, sizeof(int32_t) * (size_t)qpad);
    memset(Hmax, 0, sizeof(int32_t) * (size_t)qpad);
    for (i = 0; i < tlen; i++) {
        int tb_ = target[i] > 4 ? 4 : target[i];
        const int8_t *prow = mat + tb_ * 5;
        int32_t hprev = 0, imax = 0;
        int64_t facc = INT64_MIN / 4;
        for (j = 0; j < qpad; j++) {
            int32_t S = j < qlen ? prow[query[j]] : 0;
            int32_t M = hprev + S;
            int32_t ME, F, H, e2, h2, En;
            int64_t cand;
            if (M < 0) M = 0;
            ME = M > E[j] ? M : E[j];
            F = facc > 0 ? (int32_t)facc : 0;
            H = ME > F ? ME : F;
            cand = (int64_t)ME - oe_ins;
            facc -= e_ins;
            if (cand > facc) facc = cand;
            e2 = E[j] - e_del;
            h2 = H - oe_del;
            En = e2 > h2 ? e2 : h2;
            if (En < 0) En = 0;
            hprev = Hp[j];
            Hp[j] = H;
            E[j] = En;
            if (H > imax) imax = H;
        }
        rowmax[i] = imax;
        if (imax > gmax) {
            gmax = imax;
            te = i;
            memcpy(Hmax, Hp, sizeof(int32_t) * (size_t)qpad);
            if (gmax >= endsc) {
                for (j = i + 1; j < tlen; j++) rowmax[j] = 0;
                break;
            }
        }
    }
    *gmax_out = gmax;
    *te_out = te;
}

static int32_t ksw_qe_host(const int32_t *Hmax, int qpad)
{   /* minimum column attaining max(Hmax); 0 when all zero */
    int32_t m = 0;
    int j;
    for (j = 0; j < qpad; j++)
        if (Hmax[j] > m) m = Hmax[j];
    for (j = 0; j < qpad; j++)
        if (Hmax[j] == m) return j;
    return 0;
}

static void ksw_score2_host(const int32_t *rowmax, int tlen, int32_t te,
                            int32_t score, int32_t minsc, int32_t max_mat,
                            int32_t *s2_out, int32_t *te2_out)
{
    int32_t d = (score + max_mat - 1) / max_mat;
    int32_t lo = te - d, hi = te + d;
    int32_t entry_max = 0, entry_row = -2, best2 = -1, best2_row = -1;
    int have = 0, i;
    for (i = 0; i < tlen; i++) {
        int32_t v = rowmax[i];
        int ok = v >= minsc;
        int adjacent = have && entry_row + 1 == i;
        int improve = ok && adjacent && v > entry_max;
        int newent = ok && !adjacent;
        if (newent && have && (entry_row < lo || entry_row > hi)
            && entry_max > best2) {
            best2 = entry_max;
            best2_row = entry_row;
        }
        if (improve || newent) { entry_max = v; entry_row = i; }
        have = have || ok;
    }
    if (have && (entry_row < lo || entry_row > hi) && entry_max > best2) {
        best2 = entry_max;
        best2_row = entry_row;
    }
    *s2_out = best2;
    *te2_out = best2_row;
}

int ksw_align_host_batch(int64_t n,
                         const uint8_t *q, const int64_t *qoff,
                         const uint8_t *t, const int64_t *toff,
                         const int32_t *minsc, const int8_t *mat,
                         int32_t o_del, int32_t e_del, int32_t o_ins,
                         int32_t e_ins, int32_t max_mat, int32_t p,
                         int32_t *score, int32_t *te, int32_t *qe,
                         int32_t *score2, int32_t *te2, int32_t *tb,
                         int32_t *qb)
{
    int64_t b;
    int qpad_max = 1, t_max = 1;
    int32_t *Hp, *E, *Hmax, *rowmax;
    uint8_t *q2, *t2;
    for (b = 0; b < n; b++) {
        int ql = (int)(qoff[b + 1] - qoff[b]);
        int tl = (int)(toff[b + 1] - toff[b]);
        int qp = (ql + p - 1) / p * p;
        if (qp > qpad_max) qpad_max = qp;
        if (tl > t_max) t_max = tl;
    }
    Hp = malloc(sizeof(int32_t) * (size_t)qpad_max);
    E = malloc(sizeof(int32_t) * (size_t)qpad_max);
    Hmax = malloc(sizeof(int32_t) * (size_t)qpad_max);
    rowmax = malloc(sizeof(int32_t) * (size_t)(t_max > 0 ? t_max : 1));
    q2 = malloc((size_t)(qpad_max > 0 ? qpad_max : 1));
    t2 = malloc((size_t)(t_max > 0 ? t_max : 1));
    if (!Hp || !E || !Hmax || !rowmax || !q2 || !t2) {
        free(Hp); free(E); free(Hmax); free(rowmax); free(q2); free(t2);
        return -1;
    }
    for (b = 0; b < n; b++) {
        const uint8_t *qb_ = q + qoff[b];
        const uint8_t *tb_ = t + toff[b];
        int ql = (int)(qoff[b + 1] - qoff[b]);
        int tl = (int)(toff[b + 1] - toff[b]);
        int qp = (ql + p - 1) / p * p;
        int32_t gmax, te1, qe1, s2, te2_, g2, te_r, qe_r;
        int k;
        ksw_pass_host(ql, qp, qb_, tl, tb_, 0x10000, mat,
                      o_del + e_del, e_del, o_ins + e_ins, e_ins,
                      Hp, E, Hmax, rowmax, &gmax, &te1);
        qe1 = ksw_qe_host(Hmax, qp);
        ksw_score2_host(rowmax, tl, te1, gmax, minsc[b], max_mat,
                        &s2, &te2_);
        score[b] = gmax;
        te[b] = te1;
        qe[b] = qe1;
        score2[b] = s2;
        te2[b] = te2_;
        if (gmax >= minsc[b]) {
            int q2len = qe1 + 1, t2len = te1 + 1;
            int q2pad = (q2len + p - 1) / p * p;
            for (k = 0; k < q2len; k++) q2[k] = qb_[qe1 - k];
            for (k = 0; k < t2len; k++) t2[k] = tb_[te1 - k];
            ksw_pass_host(q2len, q2pad, q2, t2len, t2, gmax, mat,
                          o_del + e_del, e_del, o_ins + e_ins, e_ins,
                          Hp, E, Hmax, rowmax, &g2, &te_r);
            qe_r = ksw_qe_host(Hmax, q2pad);
            if (g2 == gmax) {
                tb[b] = te1 - te_r;
                qb[b] = qe1 - qe_r;
            } else {
                tb[b] = -1;
                qb[b] = -1;
            }
        } else {
            tb[b] = -1;
            qb[b] = -1;
        }
    }
    free(Hp); free(E); free(Hmax); free(rowmax); free(q2); free(t2);
    return 0;
}
