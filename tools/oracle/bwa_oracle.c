/* bwa_oracle — golden-output test oracle for the TPU-native aligner.
 *
 * This driver is ORIGINAL code for this repository.  It links against the
 * UNMODIFIED upstream lh3/bwa 0.7.17 CPU sources that ship inside the
 * reference checkout (read-only at REF_DIR, compiled out-of-tree; nothing is
 * copied into this repo).  The resulting binary is used ONLY by the test
 * suite to produce golden outputs (index files, SMEM dumps, alignment
 * regions, SAM records) that the JAX/Pallas implementation must reproduce.
 *
 * Reference APIs exercised (behavior spec per SURVEY.md §2.6/§2.7):
 *   bwa_idx_build        (bwtindex.c:255)
 *   bwt_smem1a / bwt_seed_strategy1 (bwt.c:289,358)
 *   mem_chain / mem_chain_flt / mem_chain2aln / mem_sort_dedup_patch /
 *   mem_mark_primary_se  (bwamem.c)
 *   mem_process_seqs     (bwamem.c:1215)
 *
 * Subcommands:
 *   index <in.fa> <prefix>            build .pac/.ann/.amb/.bwt/.sa
 *   mem [-pa] [-t N] [-K SZ] [-T N] [-k N] <prefix> <r1.fq> [r2.fq]  SAM to stdout
 *   smem [-i MIN_INTV] <prefix> <fq>  3-pass seeding dump (one line per intv)
 *   regs <prefix> <fq>                per-read alignment regions after
 *                                     dedup+mark_primary (pre-SAM numeric dump)
 *   chains <prefix> <fq>              per-read chains after mem_chain_flt
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <unistd.h>
#include <zlib.h>
#include <limits.h>
#include "bwa.h"
#include "bwamem.h"
#include "bwt.h"
#include "bntseq.h"
#include "kseq.h"
KSEQ_DECLARE(gzFile)

extern unsigned char nst_nt4_table[256];

/* non-static internals of bwamem.c we use as stage oracles */
extern mem_chain_v mem_chain(const mem_opt_t *opt, const bwt_t *bwt, const bntseq_t *bns, int len, const uint8_t *seq, void *buf);
extern int mem_chain_flt(const mem_opt_t *opt, int n_chn, mem_chain_t *a);
extern void mem_flt_chained_seeds(const mem_opt_t *opt, const bntseq_t *bns, const uint8_t *pac, int l_query, const uint8_t *query, int n_chn, mem_chain_t *a);
extern void mem_chain2aln(const mem_opt_t *opt, const bntseq_t *bns, const uint8_t *pac, int l_query, const uint8_t *query, const mem_chain_t *c, mem_alnreg_v *av);
extern int mem_sort_dedup_patch(const mem_opt_t *opt, const bntseq_t *bns, const uint8_t *pac, uint8_t *query, int n, mem_alnreg_t *a);
extern int mem_mark_primary_se(const mem_opt_t *opt, int n, mem_alnreg_t *a, int64_t id);
extern int mem_chain_weight(const mem_chain_t *c);
extern mem_alnreg_v mem_align1_core(const mem_opt_t *opt, const bwt_t *bwt, const bntseq_t *bns, const uint8_t *pac, int l_seq, char *seq, void *buf);

static int usage(void)
{
    fprintf(stderr, "Usage: bwa_oracle <index|mem|smem|regs|chains> ...\n");
    return 1;
}

static int cmd_index(int argc, char *argv[])
{
    if (argc < 3) { fprintf(stderr, "Usage: bwa_oracle index <in.fa> <prefix>\n"); return 1; }
    bwa_idx_build(argv[1], argv[2], BWTALGO_AUTO, 10000000);
    return 0;
}

/* --- smem: dump the exact 3-pass interval collection of mem_collect_intv
 * (bwamem.c:137-185), reimplemented here on top of the exported bwt_smem1a /
 * bwt_seed_strategy1 so each pass can be inspected separately. */
static void collect_and_dump(const mem_opt_t *opt, const bwt_t *bwt, const char *name,
                             int len, uint8_t *seq)
{
    bwtintv_v mem1 = {0,0,0}, all = {0,0,0};
    int i, k, x, old_n;
    int split_len = (int)(opt->min_seed_len * opt->split_factor + .499);
    /* pass 1 */
    x = 0;
    while (x < len) {
        if (seq[x] < 4) {
            x = bwt_smem1(bwt, len, seq, x, 1, &mem1, 0);
            for (i = 0; i < mem1.n; ++i) {
                bwtintv_t *p = &mem1.a[i];
                int slen = (uint32_t)p->info - (p->info>>32);
                if (slen >= opt->min_seed_len) {
                    if (all.n == all.m) { all.m = all.m? all.m<<1 : 16; all.a = realloc(all.a, all.m*sizeof(bwtintv_t)); }
                    all.a[all.n++] = *p;
                }
            }
        } else ++x;
    }
    /* pass 2 */
    old_n = all.n;
    for (k = 0; k < old_n; ++k) {
        bwtintv_t *p = &all.a[k];
        int start = p->info>>32, end = (int32_t)p->info;
        if (end - start < split_len || p->x[2] > opt->split_width) continue;
        bwt_smem1(bwt, len, seq, (start + end)>>1, p->x[2]+1, &mem1, 0);
        for (i = 0; i < mem1.n; ++i)
            if ((uint32_t)mem1.a[i].info - (mem1.a[i].info>>32) >= opt->min_seed_len) {
                if (all.n == all.m) { all.m = all.m? all.m<<1 : 16; all.a = realloc(all.a, all.m*sizeof(bwtintv_t)); }
                all.a[all.n++] = mem1.a[i];
            }
    }
    /* pass 3 */
    if (opt->max_mem_intv > 0) {
        x = 0;
        while (x < len) {
            if (seq[x] < 4) {
                bwtintv_t m;
                x = bwt_seed_strategy1(bwt, len, seq, x, opt->min_seed_len, opt->max_mem_intv, &m);
                if (m.x[2] > 0) {
                    if (all.n == all.m) { all.m = all.m? all.m<<1 : 16; all.a = realloc(all.a, all.m*sizeof(bwtintv_t)); }
                    all.a[all.n++] = m;
                }
            } else ++x;
        }
    }
    /* sort by info, like ks_introsort(mem_intv, ...) */
    for (i = 1; i < all.n; ++i) { /* insertion sort: stable, small n */
        bwtintv_t t = all.a[i];
        for (k = i - 1; k >= 0 && all.a[k].info > t.info; --k) all.a[k+1] = all.a[k];
        all.a[k+1] = t;
    }
    for (i = 0; i < all.n; ++i) {
        bwtintv_t *p = &all.a[i];
        printf("%s\t%d\t%d\t%lu\t%lu\t%lu\n", name,
               (int)(p->info>>32), (int)((uint32_t)p->info),
               (unsigned long)p->x[0], (unsigned long)p->x[1], (unsigned long)p->x[2]);
    }
    free(mem1.a); free(all.a);
}

static int cmd_smem(int argc, char *argv[])
{
    mem_opt_t *opt = mem_opt_init();
    gzFile fp; kseq_t *ks; bwaidx_t *idx; int c, i;
    while ((c = getopt(argc, argv, "i:")) >= 0) {
        if (c == 'i') opt->min_seed_len = atoi(optarg);
        else return 1;
    }
    if (optind + 2 > argc) { fprintf(stderr, "Usage: bwa_oracle smem <prefix> <fq>\n"); return 1; }
    if ((idx = bwa_idx_load(argv[optind], BWA_IDX_BWT)) == 0) return 1;
    fp = gzopen(argv[optind+1], "r");
    ks = kseq_init(fp);
    while (kseq_read(ks) >= 0) {
        for (i = 0; i < ks->seq.l; ++i)
            ks->seq.s[i] = nst_nt4_table[(int)ks->seq.s[i]];
        collect_and_dump(opt, idx->bwt, ks->name.s, ks->seq.l, (uint8_t*)ks->seq.s);
    }
    kseq_destroy(ks); gzclose(fp); bwa_idx_destroy(idx); free(opt);
    return 0;
}

static int cmd_chains(int argc, char *argv[])
{
    mem_opt_t *opt = mem_opt_init();
    gzFile fp; kseq_t *ks; bwaidx_t *idx; int i, j;
    if (argc < 3) { fprintf(stderr, "Usage: bwa_oracle chains <prefix> <fq>\n"); return 1; }
    if ((idx = bwa_idx_load(argv[1], BWA_IDX_ALL)) == 0) return 1;
    fp = gzopen(argv[2], "r");
    ks = kseq_init(fp);
    while (kseq_read(ks) >= 0) {
        mem_chain_v chn;
        for (i = 0; i < ks->seq.l; ++i)
            ks->seq.s[i] = nst_nt4_table[(int)ks->seq.s[i]];
        chn = mem_chain(opt, idx->bwt, idx->bns, ks->seq.l, (uint8_t*)ks->seq.s, 0);
        chn.n = mem_chain_flt(opt, chn.n, chn.a);
        mem_flt_chained_seeds(opt, idx->bns, idx->pac, ks->seq.l, (uint8_t*)ks->seq.s, chn.n, chn.a);
        for (i = 0; i < chn.n; ++i) {
            mem_chain_t *p = &chn.a[i];
            printf("%s\t%d\t%d\t%d\t%d\t%.6f", ks->name.s, i, p->rid, mem_chain_weight(p), p->n, p->frac_rep);
            for (j = 0; j < p->n; ++j)
                printf("\t%ld,%d,%d", (long)p->seeds[j].rbeg, p->seeds[j].qbeg, p->seeds[j].len);
            putchar('\n');
            free(p->seeds);
        }
        free(chn.a);
    }
    kseq_destroy(ks); gzclose(fp); bwa_idx_destroy(idx); free(opt);
    return 0;
}

/* raw mem_chain output BEFORE mem_chain_flt, with kept labels afterwards —
 * exposes the pre-sort traversal order and the flt tie-breaks */
static int cmd_chains0(int argc, char *argv[])
{
    mem_opt_t *opt = mem_opt_init();
    gzFile fp; kseq_t *ks; bwaidx_t *idx; int i, j;
    if (argc < 3) { fprintf(stderr, "Usage: bwa_oracle chains0 <prefix> <fq>\n"); return 1; }
    if ((idx = bwa_idx_load(argv[1], BWA_IDX_ALL)) == 0) return 1;
    fp = gzopen(argv[2], "r");
    ks = kseq_init(fp);
    while (kseq_read(ks) >= 0) {
        mem_chain_v chn;
        for (i = 0; i < ks->seq.l; ++i)
            ks->seq.s[i] = nst_nt4_table[(int)ks->seq.s[i]];
        chn = mem_chain(opt, idx->bwt, idx->bns, ks->seq.l, (uint8_t*)ks->seq.s, 0);
        for (i = 0; i < chn.n; ++i) {
            mem_chain_t *p = &chn.a[i];
            printf("%s\tpre\t%d\tpos=%ld\tw=%d\tn=%d", ks->name.s, i,
                   (long)p->pos, mem_chain_weight(p), p->n);
            for (j = 0; j < p->n; ++j)
                printf("\t%ld,%d,%d", (long)p->seeds[j].rbeg, p->seeds[j].qbeg, p->seeds[j].len);
            putchar('\n');
        }
        chn.n = mem_chain_flt(opt, chn.n, chn.a);
        for (i = 0; i < chn.n; ++i) {
            mem_chain_t *p = &chn.a[i];
            printf("%s\tpost\t%d\tpos=%ld\tw=%d\tkept=%d\tfirst=%d\n",
                   ks->name.s, i, (long)p->pos, (int)p->w, (int)p->kept, (int)p->first);
            free(p->seeds);
        }
        free(chn.a);
    }
    kseq_destroy(ks); gzclose(fp); bwa_idx_destroy(idx); free(opt);
    return 0;
}

/* raw mem_chain2aln output, BEFORE dedup/patch — oracle for the extension
 * stage in isolation */
static int cmd_extregs(int argc, char *argv[])
{
    mem_opt_t *opt = mem_opt_init();
    gzFile fp; kseq_t *ks; bwaidx_t *idx; int i;
    if (argc < 3) { fprintf(stderr, "Usage: bwa_oracle extregs <prefix> <fq>\n"); return 1; }
    if ((idx = bwa_idx_load(argv[1], BWA_IDX_ALL)) == 0) return 1;
    fp = gzopen(argv[2], "r");
    ks = kseq_init(fp);
    while (kseq_read(ks) >= 0) {
        mem_chain_v chn;
        mem_alnreg_v regs = {0,0,0};
        for (i = 0; i < ks->seq.l; ++i)
            ks->seq.s[i] = nst_nt4_table[(int)ks->seq.s[i]];
        chn = mem_chain(opt, idx->bwt, idx->bns, ks->seq.l, (uint8_t*)ks->seq.s, 0);
        chn.n = mem_chain_flt(opt, chn.n, chn.a);
        mem_flt_chained_seeds(opt, idx->bns, idx->pac, ks->seq.l, (uint8_t*)ks->seq.s, chn.n, chn.a);
        for (i = 0; i < chn.n; ++i) {
            mem_chain2aln(opt, idx->bns, idx->pac, ks->seq.l, (uint8_t*)ks->seq.s, &chn.a[i], &regs);
            free(chn.a[i].seeds);
        }
        free(chn.a);
        for (i = 0; i < regs.n; ++i) {
            mem_alnreg_t *p = &regs.a[i];
            printf("%s\t%ld\t%ld\t%d\t%d\t%d\t%d\t%d\t%d\t%d\t%d\n",
                   ks->name.s, (long)p->rb, (long)p->re, p->qb, p->qe,
                   p->rid, p->score, p->truesc, p->w, p->seedcov, p->seedlen0);
        }
        free(regs.a);
    }
    kseq_destroy(ks); gzclose(fp); bwa_idx_destroy(idx); free(opt);
    return 0;
}

static int cmd_regs(int argc, char *argv[])
{
    mem_opt_t *opt = mem_opt_init();
    gzFile fp; kseq_t *ks; bwaidx_t *idx; int i;
    int64_t id = 0;
    if (argc < 3) { fprintf(stderr, "Usage: bwa_oracle regs <prefix> <fq>\n"); return 1; }
    if ((idx = bwa_idx_load(argv[1], BWA_IDX_ALL)) == 0) return 1;
    fp = gzopen(argv[2], "r");
    ks = kseq_init(fp);
    while (kseq_read(ks) >= 0) {
        mem_alnreg_v regs;
        for (i = 0; i < ks->seq.l; ++i)
            ks->seq.s[i] = nst_nt4_table[(int)ks->seq.s[i]];
        regs = mem_align1_core(opt, idx->bwt, idx->bns, idx->pac, ks->seq.l, ks->seq.s, 0);
        mem_mark_primary_se(opt, regs.n, regs.a, id++);
        for (i = 0; i < regs.n; ++i) {
            mem_alnreg_t *p = &regs.a[i];
            printf("%s\t%ld\t%ld\t%d\t%d\t%d\t%d\t%d\t%d\t%d\t%d\t%d\t%d\n",
                   ks->name.s, (long)p->rb, (long)p->re, p->qb, p->qe, p->rid,
                   p->score, p->truesc, p->sub, p->csub, p->sub_n, p->w, p->secondary);
        }
        free(regs.a);
    }
    kseq_destroy(ks); gzclose(fp); bwa_idx_destroy(idx); free(opt);
    return 0;
}

static int cmd_mem(int argc, char *argv[])
{
    mem_opt_t *opt = mem_opt_init();
    gzFile fp = 0, fp2 = 0; kseq_t *ks = 0, *ks2 = 0; bwaidx_t *idx;
    int c, n, fixed_chunk = 0;
    int64_t n_processed = 0;
    bseq1_t *seqs;
    while ((c = getopt(argc, argv, "pat:K:T:k:v:")) >= 0) {
        switch (c) {
        case 't': opt->n_threads = atoi(optarg); break;
        case 'K': fixed_chunk = atoi(optarg); break;
        case 'T': opt->T = atoi(optarg); break;
        case 'k': opt->min_seed_len = atoi(optarg); break;
        case 'a': opt->flag |= MEM_F_ALL; break;
        case 'p': opt->flag |= MEM_F_PE; break;
        case 'v': bwa_verbose = atoi(optarg); break;
        default: return 1;
        }
    }
    if (optind + 2 > argc) { fprintf(stderr, "Usage: bwa_oracle mem [opts] <prefix> <r1.fq> [r2.fq]\n"); return 1; }
    if ((idx = bwa_idx_load(argv[optind], BWA_IDX_ALL)) == 0) return 1;
    fp = gzopen(argv[optind+1], "r");
    ks = kseq_init(fp);
    if (optind + 2 < argc) {
        fp2 = gzopen(argv[optind+2], "r");
        ks2 = kseq_init(fp2);
        opt->flag |= MEM_F_PE;
    }
    bwa_print_sam_hdr(idx->bns, 0);
    {
        int actual_chunk = fixed_chunk > 0 ? fixed_chunk : opt->chunk_size * opt->n_threads;
        while ((seqs = bseq_read(actual_chunk, &n, ks, ks2)) != 0) {
            int i;
            mem_process_seqs(opt, idx->bwt, idx->bns, idx->pac, n_processed, n, seqs, 0);
            n_processed += n;
            for (i = 0; i < n; ++i) {
                if (seqs[i].sam) fputs(seqs[i].sam, stdout);
                free(seqs[i].name); free(seqs[i].comment);
                free(seqs[i].seq); free(seqs[i].qual); free(seqs[i].sam);
            }
            free(seqs);
        }
    }
    kseq_destroy(ks); gzclose(fp);
    if (ks2) { kseq_destroy(ks2); gzclose(fp2); }
    bwa_idx_destroy(idx); free(opt);
    return 0;
}

/* --- ksw: stdin lines "E <h0> <w> <end_bonus> <query> <target>" run
 * ksw_extend2 with mem defaults and print "score qle tle gtle gscore
 * max_off"; lines "G <w> <query> <target>" run ksw_global2 and print
 * "score <cigar>"; lines "A <minsc> <byte01> <query> <target>" run
 * ksw_align2 with xtra = XSUBO|XSTART|minsc (|XBYTE if byte01) as
 * mem_matesw does (bwamem_pair.c:176) and print "score te qe score2 te2
 * tb qb".  Sequences are ACGTN. */
#include "ksw.h"
static void seq2nt4(const char *s, uint8_t *out, int *len)
{
    int i;
    for (i = 0; s[i]; ++i) out[i] = nst_nt4_table[(int)s[i]];
    *len = i;
}

static int cmd_ksw(int argc, char *argv[])
{
    mem_opt_t *opt = mem_opt_init();
    char kind[4], q[4096], t[4096];
    static uint8_t qs[4096], ts[4096];
    (void)argc; (void)argv;
    while (scanf("%3s", kind) == 1) {
        if (kind[0] == 'E') {
            int h0, w, eb, qlen, tlen;
            int qle, tle, gtle, gscore, max_off, score;
            if (scanf("%d %d %d %4095s %4095s", &h0, &w, &eb, q, t) != 5) break;
            seq2nt4(q, qs, &qlen);
            seq2nt4(t, ts, &tlen);
            score = ksw_extend2(qlen, qs, tlen, ts, 5, opt->mat,
                                opt->o_del, opt->e_del, opt->o_ins, opt->e_ins,
                                w, eb, opt->zdrop, h0,
                                &qle, &tle, &gtle, &gscore, &max_off);
            printf("%d %d %d %d %d %d\n", score, qle, tle, gtle, gscore, max_off);
        } else if (kind[0] == 'A') {
            int minsc, usebyte, qlen, tlen, xtra;
            kswr_t x;
            if (scanf("%d %d %4095s %4095s", &minsc, &usebyte, q, t) != 4) break;
            seq2nt4(q, qs, &qlen);
            seq2nt4(t, ts, &tlen);
            xtra = KSW_XSUBO | KSW_XSTART | (usebyte? KSW_XBYTE : 0) | minsc;
            x = ksw_align2(qlen, qs, tlen, ts, 5, opt->mat,
                           opt->o_del, opt->e_del, opt->o_ins, opt->e_ins,
                           xtra, 0);
            printf("%d %d %d %d %d %d %d\n", x.score, x.te, x.qe,
                   x.score2, x.te2, x.tb, x.qb);
        } else if (kind[0] == 'G') {
            int w, qlen, tlen, score, n_cigar = 0, k;
            uint32_t *cigar = 0;
            if (scanf("%d %4095s %4095s", &w, q, t) != 3) break;
            seq2nt4(q, qs, &qlen);
            seq2nt4(t, ts, &tlen);
            score = ksw_global2(qlen, qs, tlen, ts, 5, opt->mat,
                                opt->o_del, opt->e_del, opt->o_ins, opt->e_ins,
                                w, &n_cigar, &cigar);
            printf("%d ", score);
            for (k = 0; k < n_cigar; ++k)
                printf("%d%c", cigar[k] >> 4, "MIDSH"[cigar[k] & 0xf]);
            printf("\n");
            free(cigar);
        } else break;
    }
    free(opt);
    return 0;
}

/* fastmap: SMEM iterator dump, same format as `bwa fastmap`
 * (reference fastmap.c:324-399) */
static int cmd_fastmap(int argc, char *argv[])
{
    int c, i, min_iwidth = 20, min_len = 17, min_intv = 1;
    kseq_t *ks; gzFile fp; bwaidx_t *idx; smem_i *itr;
    const bwtintv_v *a;
    bwtint_t k;
    while ((c = getopt(argc, argv, "w:l:i:")) >= 0) {
        if (c == 'w') min_iwidth = atoi(optarg);
        else if (c == 'l') min_len = atoi(optarg);
        else if (c == 'i') min_intv = atoi(optarg);
        else return 1;
    }
    if (optind + 2 > argc) { fprintf(stderr, "Usage: bwa_oracle fastmap [-w W -l L -i I] <prefix> <fq>\n"); return 1; }
    if ((idx = bwa_idx_load(argv[optind], BWA_IDX_BWT|BWA_IDX_BNS)) == 0) return 1;
    fp = gzopen(argv[optind+1], "r");
    ks = kseq_init(fp);
    itr = smem_itr_init(idx->bwt);
    smem_config(itr, min_intv, INT_MAX, 0);
    while (kseq_read(ks) >= 0) {
        printf("SQ\t%s\t%ld\n", ks->name.s, (long)ks->seq.l);
        for (i = 0; i < ks->seq.l; ++i)
            ks->seq.s[i] = nst_nt4_table[(int)ks->seq.s[i]];
        smem_set_query(itr, ks->seq.l, (uint8_t*)ks->seq.s);
        while ((a = smem_next(itr)) != 0) {
            for (i = 0; i < a->n; ++i) {
                bwtintv_t *p = &a->a[i];
                if ((uint32_t)p->info - (p->info>>32) < min_len) continue;
                printf("EM\t%d\t%d\t%ld", (uint32_t)(p->info>>32), (uint32_t)p->info, (long)p->x[2]);
                if (p->x[2] <= min_iwidth) {
                    for (k = 0; k < p->x[2]; ++k) {
                        bwtint_t pos;
                        int len, is_rev, ref_id;
                        len = (uint32_t)p->info - (p->info>>32);
                        pos = bns_depos(idx->bns, bwt_sa(idx->bwt, p->x[0] + k), &is_rev);
                        if (is_rev) pos -= len - 1;
                        bns_cnt_ambi(idx->bns, pos, len, &ref_id);
                        printf("\t%s:%c%ld", idx->bns->anns[ref_id].name, "+-"[is_rev], (long)(pos - idx->bns->anns[ref_id].offset) + 1);
                    }
                } else fputs("\t*", stdout);
                putchar('\n');
            }
        }
        puts("//");
    }
    smem_itr_destroy(itr);
    bwa_idx_destroy(idx); kseq_destroy(ks); gzclose(fp);
    return 0;
}

int main_pemerge(int argc, char *argv[]);  /* pemerge.c:217 */
int main_maxk(int argc, char *argv[]);     /* maxk.c:12 */
int bwa_bwtsw2(int argc, char *argv[]);    /* bwtsw2_main.c:11 */
int bwa_aln(int argc, char *argv[]);       /* bwtaln.c:230 */
int bwa_sai2sam_se(int argc, char *argv[]); /* bwase.c:585 */
int bwa_sai2sam_pe(int argc, char *argv[]); /* bwape.c:717 */

int main(int argc, char *argv[])
{
    if (argc >= 2 && strcmp(argv[1], "fastmap") == 0) return cmd_fastmap(argc-1, argv+1);
    if (argc >= 2 && strcmp(argv[1], "ksw") == 0) return cmd_ksw(argc-1, argv+1);
    if (argc < 2) return usage();
    if (strcmp(argv[1], "index") == 0) return cmd_index(argc-1, argv+1);
    if (strcmp(argv[1], "mem") == 0) return cmd_mem(argc-1, argv+1);
    if (strcmp(argv[1], "smem") == 0) return cmd_smem(argc-1, argv+1);
    if (strcmp(argv[1], "regs") == 0) return cmd_regs(argc-1, argv+1);
    if (strcmp(argv[1], "extregs") == 0) return cmd_extregs(argc-1, argv+1);
    if (strcmp(argv[1], "chains") == 0) return cmd_chains(argc-1, argv+1);
    if (strcmp(argv[1], "chains0") == 0) return cmd_chains0(argc-1, argv+1);
    if (strcmp(argv[1], "pemerge") == 0) return main_pemerge(argc-1, argv+1);
    if (strcmp(argv[1], "maxk") == 0) return main_maxk(argc-1, argv+1);
    if (strcmp(argv[1], "bwasw") == 0) return bwa_bwtsw2(argc-1, argv+1);
    if (strcmp(argv[1], "aln") == 0) return bwa_aln(argc-1, argv+1);
    if (strcmp(argv[1], "samse") == 0) return bwa_sai2sam_se(argc-1, argv+1);
    if (strcmp(argv[1], "sampe") == 0) return bwa_sai2sam_pe(argc-1, argv+1);
    return usage();
}
