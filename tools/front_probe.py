#!/usr/bin/env python
"""Per-stage device-time probe of the device-resident front half.

Times each of the 6 chained programs of pipeline.device_front with
block_until_ready between them (so the numbers are real device execution,
not enqueue), over a few reps on one bench batch.

Usage: python tools/front_probe.py [n_reads] [reps]
"""
from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".jaxcache"))
if os.environ.get("JAX_PLATFORMS"):
    import jax
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax
import jax.numpy as jnp
import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    from bwamem_tpu.index import BwaIndex
    from bwamem_tpu.io.fastq import read_fastx, pack_batch
    from bwamem_tpu.pipeline.align import Aligner
    from bwamem_tpu.pipeline import device_front as df
    from bwamem_tpu.ops import smem as smemops

    prefix = str(REPO / ".benchdata" / "g5000000")
    idx = BwaIndex.load(prefix + ".ours")
    reads = []
    for i, r in enumerate(read_fastx(prefix + ".fq")):
        if i >= n:
            break
        reads.append(r)
    al = Aligner(idx)

    def bucket(x, lo=8):
        m = lo
        while m < x:
            m <<= 1
        return m

    N = bucket(n, lo=8)
    Lr = bucket(max(r.l_seq for r in reads), lo=32)
    seq, l_seq = pack_batch(reads, N, Lr)

    # first-batch default sizes (no front_ext warmup: isolate each program)
    hist, sizes = df._sizes_for(al, N, Lr)
    opt = al.opt
    h_ts = hist.get(("hwm", "t_span", N))
    gmax = min(max((Lr * opt.a - min(opt.o_del, opt.o_ins))
                   // min(opt.e_del, opt.e_ins) + 1, 1), 2 * opt.w)
    bound = Lr + opt.w + 2 * gmax + 8
    sizes["t_span"] = df._bucket(min(int(h_ts + (h_ts >> 3) + 1), bound),
                                 lo=128) if h_ts is not None \
        else df._bucket(bound, lo=128)
    print("sizes:", sizes, file=sys.stderr, flush=True)

    use_kmer = al.fm.kmer is not None and opt.min_seed_len >= smemops.KMER_K
    seq_dev = jnp.asarray(seq)
    l_dev = jnp.asarray(l_seq)

    s1 = dict(cap=sizes["cap"], kmax=sizes["kmax"], emax=sizes["emax"],
              min_seed_len=opt.min_seed_len, use_kmer=use_kmer,
              b1s=min(sizes["b1s"], sizes["kmax"]), t1s=sizes["t1s"])
    s2 = dict(pmax=sizes["pmax"], cand2=sizes["cand2"],
              k2max=sizes["k2max"], e2max=sizes["e2max"],
              min_seed_len=opt.min_seed_len, split_len=opt.split_len,
              split_width=opt.split_width,
              b2s=min(sizes["b2s"], sizes["k2max"]), t2s=sizes["t2s"])
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
    from bwamem_tpu.pipeline import _shapes
    s6 = dict(lq_max=Lr, t_max=sizes["t_span"],
              mat_bytes=np.asarray(opt.mat, np.int8).tobytes(),
              o_del=opt.o_del, e_del=opt.e_del, o_ins=opt.o_ins,
              e_ins=opt.e_ins, zdrop=opt.zdrop, w_opt=opt.w, a=opt.a,
              pen_clip5=opt.pen_clip5, pen_clip3=opt.pen_clip3,
              use_pl=not _shapes._is_cpu())

    for rep in range(reps):
        times = {}

        def tick(name, fn):
            t0 = time.perf_counter()
            out = fn()
            jax.block_until_ready(out)
            times[name] = time.perf_counter() - t0
            print(f"  rep {rep} {name}: {times[name] * 1e3:.1f}ms",
                  file=sys.stderr, flush=True)
            return out

        sec1, m1 = tick("p1", lambda: df._p1_jit(al.fm, seq_dev, l_dev,
                                                 **s1))
        sec2, m2 = tick("p2", lambda: df._p2_jit(al.fm, seq_dev, l_dev,
                                                 sec1, m1[0], **s2))
        sec3, m3 = tick("p3", lambda: df._p3_jit(al.fm, seq_dev, l_dev,
                                                 **s3))
        seeds, seed_cnt, l_rep, m4 = tick("expand", lambda: df._expand_jit(
            al.fm, al.ctg_offsets, sec1, m1[0], sec2, m2[0], sec3, m3[0],
            **s4))
        seed_chain, items32, items_it, chain32, c_pos, m5 = tick(
            "chain", lambda: df._chain_jit(
                al.fm, al.ctg_offsets, al.ctg_is_alt, seeds, l_dev, **s5))
        out32, out_it, m6 = tick("ext", lambda: df._ext_jit(
            al.fm, seq_dev, l_dev, seed_chain, seeds.valid, seeds.qbeg,
            seeds.len, seeds.rbeg, items32, items_it, m5[4], **s6))

        tot = sum(times.values())
        print(f"rep {rep}: " + "  ".join(
            f"{k}={v * 1e3:8.1f}ms" for k, v in times.items())
            + f"  TOTAL={tot * 1e3:.1f}ms", flush=True)


if __name__ == "__main__":
    main()
