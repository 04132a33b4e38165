#!/usr/bin/env python
"""Microbenchmarks that decide the seeding-front strategy.

1. chained occ4-extend steps in XLA (the while_loop body of ops/smem) —
   per-step cost on the live backend.
2. chained bare combined-row gathers — isolates gather cost from the
   popcount/select vector ops.
3. a Pallas kernel running the same chained gather with the cmb table
   VMEM-resident — tests whether Mosaic lowers a per-lane dynamic gather
   (the make-or-break for an in-kernel FM scan).

Usage: python tools/fm_step_probe.py [n_lanes] [steps]
"""
from __future__ import annotations

import functools
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".jaxcache"))

import jax
import jax.numpy as jnp
import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 64


def timeit(name, fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    best = min(ts)
    print(f"{name:34s} {best*1e3:9.2f} ms  ({best/STEPS*1e6:8.1f} us/step)")
    return out


def main():
    from bwamem_tpu.index import BwaIndex
    from bwamem_tpu.ops import fm as fmops

    idx = BwaIndex.load(str(REPO / ".benchdata" / "g5000000.ours"))
    fm = fmops.to_device(fmops.fm_from_index(idx))
    jax.block_until_ready(fm.cmb)
    nb = fm.cmb.shape[0]
    print(f"cmb table: {fm.cmb.shape} = {fm.cmb.nbytes/1e6:.1f} MB, "
          f"lanes={N}, steps={STEPS}")
    seq_len = int(fm.seq_len)

    key = jax.random.PRNGKey(0)
    k0 = jax.random.randint(key, (N,), 0, seq_len, dtype=jnp.int32)

    # 1. chained extend (the real smem-scan body)
    @jax.jit
    def chain_extend(k):
        x0 = k.astype(fm.L2.dtype)
        x1 = x0
        x2 = jnp.full_like(x0, 7)

        def body(i, st):
            x0, x1, x2 = st
            n0, n1, ns = fmops.extend(fm, x0, x1, x2, is_back=False)
            c = (x0 + i) & 3
            e0 = fmops._select4(n0, c)
            e1 = fmops._select4(n1, c)
            e2 = fmops._select4(ns, c)
            # keep values in range
            dt = x0.dtype
            return ((e0 % seq_len).astype(dt), (e1 % seq_len).astype(dt),
                    jnp.maximum(e2 % 64, 1).astype(dt))

        return jax.lax.fori_loop(0, STEPS, body, (x0, x1, x2))

    timeit("xla chained extend", chain_extend, k0)

    # 2. chained bare gather (one cmb row per lane per step)
    @jax.jit
    def chain_gather(k):
        def body(i, kk):
            row = fm.cmb[(kk >> 7).astype(jnp.int32)]
            s = row.astype(jnp.int32).sum(-1)
            return ((kk + s) % seq_len).astype(jnp.int32)

        return jax.lax.fori_loop(0, STEPS, body, k0)

    timeit("xla chained gather(12w)+sum", chain_gather, k0)

    # 2b. two gathers per step (the occ4 x2 pattern)
    @jax.jit
    def chain_gather2(k):
        def body(i, kk):
            blk = (kk >> 7).astype(jnp.int32)
            row = fm.cmb[blk]
            row2 = fm.cmb[jnp.minimum(blk + 1, nb - 1)]
            s = (row.astype(jnp.int32) + row2.astype(jnp.int32)).sum(-1)
            return ((kk + s) % seq_len).astype(jnp.int32)

        return jax.lax.fori_loop(0, STEPS, body, k0)

    timeit("xla chained 2xgather+sum", chain_gather2, k0)

    # 3. Pallas: same chained gather, cmb in VMEM
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    W = fm.cmb.shape[1]
    LANES = 128
    rows_n = N // LANES

    def kernel(cmb_ref, k_ref, o_ref):
        kk = k_ref[:].astype(jnp.int32)

        def body(i, kk):
            blk = (kk >> 7)
            acc = jnp.zeros_like(kk)
            for w in range(W):
                col = jnp.take(cmb_ref[:, w], blk.reshape(-1),
                               axis=0).reshape(kk.shape)
                acc = acc + col.astype(jnp.int32)
            return ((kk + acc) % seq_len).astype(jnp.int32)

        o_ref[:] = jax.lax.fori_loop(0, STEPS, body, kk)

    @jax.jit
    def pl_gather(k):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((rows_n, LANES), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(fm.cmb, k.reshape(rows_n, LANES))

    try:
        timeit("pallas vmem take per word", pl_gather, k0)
    except Exception as e:
        print(f"pallas take FAILED: {type(e).__name__}: {str(e)[:500]}")

    # 3b. Pallas: gather whole rows at once via take along axis 0 of 2D
    def kernel_rows(cmb_ref, k_ref, o_ref):
        kk = k_ref[:].astype(jnp.int32)

        def body(i, kk):
            blk = (kk >> 7)
            rows = jnp.take(cmb_ref[:], blk.reshape(-1), axis=0)
            acc = rows.astype(jnp.int32).sum(-1).reshape(kk.shape)
            return ((kk + acc) % seq_len).astype(jnp.int32)

        o_ref[:] = jax.lax.fori_loop(0, STEPS, body, kk)

    @jax.jit
    def pl_gather_rows(k):
        return pl.pallas_call(
            kernel_rows,
            out_shape=jax.ShapeDtypeStruct((rows_n, LANES), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(fm.cmb, k.reshape(rows_n, LANES))

    try:
        timeit("pallas vmem take rows", pl_gather_rows, k0)
    except Exception as e:
        print(f"pallas take-rows FAILED: {type(e).__name__}: {str(e)[:500]}")


if __name__ == "__main__":
    main()
