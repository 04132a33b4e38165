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
#include <stdint.h>
#include <stdlib.h>
#include <string.h>
#include <stdio.h>

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
