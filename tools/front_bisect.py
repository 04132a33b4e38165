#!/usr/bin/env python
"""Bisect which device-front program wedges at a given (N, L) shape:
dispatch P1..EXT one at a time, fetching each stage's meta (guarded)
before dispatching the next.  Usage: front_bisect.py [n_reads] [read_len]
"""
import faulthandler
import os
import signal
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".jaxcache"))
faulthandler.register(signal.SIGUSR1, all_threads=True)
faulthandler.dump_traceback_later(600, repeat=True)

import numpy as np
import jax.numpy as jnp
import bench

n = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
rl = int(sys.argv[2]) if len(sys.argv) > 2 else 150

prefix, fa, fq = bench.ensure_data()
from bwamem_tpu.index import BwaIndex
from bwamem_tpu.io.fastq import read_fastx, interleave, pack_batch
from bwamem_tpu.pipeline.align import Aligner, _lbucket
from bwamem_tpu.pipeline import device_front as df
from bwamem_tpu.utils import fetchguard

idx = BwaIndex.load(prefix + ".ours")
reads = list(interleave(read_fastx(prefix + ".pe_1.fq"),
                        read_fastx(prefix + ".pe_2.fq")))[:n]
al = Aligner(idx)
N = n
Lr = _lbucket(max(r.l_seq for r in reads))
seq, l_seq = pack_batch(reads, N, Lr)
hist, sizes = df._sizes_for(al, N, Lr)
gmax = min(max((Lr * al.opt.a - min(al.opt.o_del, al.opt.o_ins))
               // min(al.opt.e_del, al.opt.e_ins) + 1, 1), 2 * al.opt.w)
sizes["t_span"] = df._bucket(Lr + al.opt.w + 2 * gmax + 8, lo=128)
print(f"[bisect] N={N} Lr={Lr} sizes={sizes}", flush=True)

opt = al.opt
seq_dev = jnp.asarray(seq)
l_dev = jnp.asarray(l_seq)
use_kmer = al.fm.kmer is not None and opt.min_seed_len >= 12

s1 = dict(cap=sizes["cap"], kmax=sizes["kmax"], emax=sizes["emax"],
          min_seed_len=opt.min_seed_len, use_kmer=use_kmer,
          b1s=sizes["b1s"], t1s=sizes["t1s"])
s2 = dict(pmax=sizes["pmax"], cand2=sizes["cand2"], k2max=sizes["k2max"],
          e2max=sizes["e2max"], min_seed_len=opt.min_seed_len,
          split_len=opt.split_len, split_width=opt.split_width,
          b2s=sizes["b2s"], t2s=sizes["t2s"])
s3 = dict(p3cap=sizes["p3cap"], e3max=sizes["e3max"],
          min_seed_len=opt.min_seed_len, max_mem_intv=opt.max_mem_intv,
          use_kmer=use_kmer, t3s=sizes["t3s"])
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
          use_pl=not df._shapes._is_cpu())


def stage(name, fn):
    t0 = time.perf_counter()
    out = fn()
    tC = time.perf_counter()
    metas = [a for a in out if a is not None]
    fetchguard.fetch(metas[-1:], what=name, timeout=300)
    print(f"[bisect] {name}: compile+dispatch {tC - t0:.1f}s, "
          f"exec+fetch {time.perf_counter() - tC:.1f}s", flush=True)
    return out


o1 = stage("p1", lambda: df._p1_jit(al.fm, seq_dev, l_dev, **s1))
sec1, m1 = o1
o2 = stage("p2", lambda: df._p2_jit(al.fm, seq_dev, l_dev, sec1, m1[0],
                                    **s2))
sec2, m2 = o2
o3 = stage("p3", lambda: df._p3_jit(al.fm, seq_dev, l_dev, **s3))
sec3, m3 = o3
o4 = stage("expand", lambda: df._expand_jit(
    al.fm, al.ctg_offsets, sec1, m1[0], sec2, m2[0], sec3, m3[0], **s4))
seeds, seed_cnt, l_rep, m4 = o4
o5 = stage("chain", lambda: df._chain_jit(
    al.fm, al.ctg_offsets, al.ctg_is_alt, seeds, l_dev, **s5))
seed_chain, items32, items_it, chain32, c_pos, m5 = o5
o6 = stage("ext", lambda: df._ext_jit(
    al.fm, seq_dev, l_dev, seed_chain, seeds.valid, seeds.qbeg, seeds.len,
    seeds.rbeg, items32, items_it, m5[4], **s6))
print("[bisect] ALL STAGES OK; meta flags:",
      [int(x) for x in np.asarray(m1)[:2]],
      [int(x) for x in np.asarray(m2)[:2]],
      [int(x) for x in np.asarray(m5)[:3]], flush=True)

# ---- steady-state per-stage timing: everything compiled; rerun each
# stage serially, blocking on its meta before the next (rep 2+ is the
# number that matters) ----
for rep in range(int(os.environ.get("BISECT_REPS", "3"))):
    row = []
    for name, fn in (
        ("p1", lambda: df._p1_jit(al.fm, seq_dev, l_dev, **s1)),
        ("p2", lambda: df._p2_jit(al.fm, seq_dev, l_dev, sec1, m1[0],
                                  **s2)),
        ("p3", lambda: df._p3_jit(al.fm, seq_dev, l_dev, **s3)),
        ("expand", lambda: df._expand_jit(al.fm, al.ctg_offsets, sec1,
                                          m1[0], sec2, m2[0], sec3, m3[0],
                                          **s4)),
        ("chain", lambda: df._chain_jit(al.fm, al.ctg_offsets,
                                        al.ctg_is_alt, seeds, l_dev,
                                        **s5)),
        ("ext", lambda: df._ext_jit(al.fm, seq_dev, l_dev, seed_chain,
                                    seeds.valid, seeds.qbeg, seeds.len,
                                    seeds.rbeg, items32, items_it, m5[4], **s6)),
    ):
        t0 = time.perf_counter()
        out = fn()
        metas = [a for a in out if a is not None]
        fetchguard.fetch(metas[-1:], what=name, timeout=600)
        row.append(f"{name}={1e3 * (time.perf_counter() - t0):.0f}ms")
    print(f"[bisect] steady rep {rep}: " + " ".join(row), flush=True)
