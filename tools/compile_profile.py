"""Per-program compile-time profile on the current backend.

Usage: python tools/compile_profile.py [n_reads]
Lowers+compiles each device program of the batch pipeline at the shapes an
n-read batch uses and prints seconds per program — the axon backend has no
persistent executable cache, so process startup pays all of these.
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    import jax
    import jax.numpy as jnp
    import numpy as np
    from bwamem_tpu.index import BwaIndex
    from bwamem_tpu.pipeline.align import Aligner, _bucket
    from bwamem_tpu.pipeline import seeding_host, extend_host, _shapes
    from bwamem_tpu.ops import chain as chainops

    prefix = str(REPO / ".benchdata" / "g5000000")
    idx = BwaIndex.load(prefix + ".ours")
    al = Aligner(idx)
    opt = al.opt
    it = np.asarray(al.fm.L2).dtype
    L = 128
    N = _bucket(n, lo=8)

    def clock(name, fn):
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        print(f"{name:44s} {dt:8.1f}s")
        return out

    # pass-1 fused seeding
    seq = jnp.zeros((N, L), jnp.uint8)
    l_seq = jnp.full((N,), L, jnp.int32)
    kmax = _bucket(N * 64, lo=1024)
    emax = _bucket(N * 32, lo=1024)
    clock(f"pass1_fused N={N} kmax={kmax}", lambda: (
        seeding_host._pass1_fused_jit.lower(
            al.fm, seq, l_seq, cap=2 * L, kmax=kmax, emax=emax,
            min_seed_len=opt.min_seed_len, max_mem_intv=opt.max_mem_intv,
            p3cap=32).compile()))

    # pass-2 rescan
    Mp = _shapes.lanes(256, fine_lo=64, coarse_lo=64)
    clock(f"fwd_scan(pass2) M={Mp}", lambda: (
        seeding_host._fwd_scan_jit.lower(
            al.fm, jnp.zeros((Mp, L), jnp.uint8), jnp.zeros((Mp,), jnp.int32),
            jnp.zeros((Mp,), jnp.int32), jnp.ones((Mp,), it),
            cap=48, multi_pivot=False).compile()))

    # SA walk
    Mp = _shapes.lanes(n * 8, fine_lo=256, coarse_lo=1024)
    clock(f"sa_lookup M={Mp}", lambda: (
        seeding_host._sa_lookup_jit.lower(
            al.fm, jnp.zeros((Mp,), it)).compile()))

    # chain worklist per group shape
    for cap in (16, 64, 256):
        G = _shapes.lanes(max(n // 2, 1), fine_lo=8, coarse_lo=64)
        seeds = chainops.Seeds(
            rbeg=jnp.zeros((G, cap), it), qbeg=jnp.zeros((G, cap), jnp.int32),
            len=jnp.zeros((G, cap), jnp.int32),
            rid=jnp.zeros((G, cap), jnp.int32),
            valid=jnp.zeros((G, cap), bool), frac_rep=jnp.zeros((G,)),
            overflow=jnp.zeros((G,), bool))
        clock(f"chain_worklist G={G} cap={cap}", lambda: (
            seeding_host._chain_worklist_jit.lower(
                al.fm, al.ctg_offsets, al.ctg_is_alt, seeds,
                jnp.full((G,), L, jnp.int32), w=opt.w,
                max_chain_gap=opt.max_chain_gap, mask_level=opt.mask_level,
                drop_ratio=opt.drop_ratio,
                min_chain_weight=opt.min_chain_weight,
                max_chain_extend=opt.max_chain_extend,
                min_seed_len=opt.min_seed_len, a=opt.a, o_del=opt.o_del,
                e_del=opt.e_del, o_ins=opt.o_ins, e_ins=opt.e_ins).compile()))

    # extension classes
    fn = extend_host._extend_flat_fn(
        np.asarray(opt.mat, np.int8).tobytes(), opt.o_del, opt.e_del,
        opt.o_ins, opt.e_ins, opt.zdrop)
    B = _shapes.lanes(n, fine_lo=8, coarse_lo=512)
    for tcap in (64, 256, 1024):
        lq = 128
        clock(f"extend B={B} LQ={lq} LT={tcap}", lambda: (
            fn.lower(al.fm.pac, al.l_pac, seq, jnp.zeros((B,), jnp.int32),
                     jnp.zeros((B,), jnp.int64), jnp.ones((B,), jnp.int64),
                     jnp.zeros((B,), jnp.int32), jnp.zeros((B,), jnp.int64),
                     jnp.ones((B,), jnp.int64), jnp.zeros((B,), jnp.int32),
                     jnp.ones((B,), jnp.int32), jnp.full((B,), opt.w,
                                                         jnp.int32),
                     jnp.zeros((B,), jnp.int32), lq_max=lq,
                     t_max=tcap).compile()))


if __name__ == "__main__":
    main()
