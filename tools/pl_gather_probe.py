#!/usr/bin/env python
"""Pallas gather-strategy probes for the in-kernel FM scan.

The XLA front pays ~300us FIXED per gather op (fm_step_probe).  An
in-kernel FM scan needs per-lane dynamic table lookups from a
VMEM-resident cmb table.  Mosaic's vector gather (tpu.dynamic_gather)
only does take_along_axis shapes, so this probes the two remaining
strategies:

  A. scalar-loop gather: read each lane's index from the VMEM vector as a
     scalar, scalar-load the table row, scalar-store the result.
  B. one-hot matmul gather (MXU): exact for values < 2^8 per bf16 plane.

Usage: python tools/pl_gather_probe.py [n_lanes] [steps]
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 16
R = 78208            # table rows (5Mbp cmb), padded to /128
W = 8                # words gathered per lane per step


def timeit(name, fn, *args, reps=5):
    try:
        out = fn(*args)
        jax.block_until_ready(out)
    except Exception as e:
        print(f"{name:30s} FAILED: {type(e).__name__}: {str(e)[:300]}")
        return None
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    best = min(ts)
    print(f"{name:30s} {best*1e3:9.2f} ms  ({best/STEPS*1e6:8.1f} us/step)")
    return out


def main():
    key = jax.random.PRNGKey(0)
    tab = jax.random.randint(key, (R, 128), 0, 1 << 20, dtype=jnp.int32)
    k0 = jax.random.randint(key, (N,), 0, R, dtype=jnp.int32)
    S = N // 128

    # ---- A. scalar-loop gather, chained ----
    def kernel_scalar(tab_ref, k_ref, o_ref):
        def step(t, _):
            def lane(q, _):
                i, j = q // 128, q % 128
                r = k_ref[i, j]
                v = tab_ref[r, j]          # scalar load, dynamic row
                o_ref[i, j] = v
                return 0
            jax.lax.fori_loop(0, N, lane, 0)
            return 0
        jax.lax.fori_loop(0, STEPS, step, 0)

    @jax.jit
    def run_scalar(k):
        return pl.pallas_call(
            kernel_scalar,
            out_shape=jax.ShapeDtypeStruct((S, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            input_output_aliases={},
        )(tab, k.reshape(S, 128))

    timeit(f"pallas scalar gather x{STEPS}", run_scalar, k0)

    # ---- A2. scalar-loop, row slice of W words ----
    tabw = jax.random.randint(key, (R, W), 0, 1 << 20, dtype=jnp.int32)

    def kernel_scalarw(tab_ref, k_ref, o_ref):
        def step(t, _):
            def lane(q, _):
                i, j = q // 128, q % 128
                r = k_ref[i, j]
                o_ref[i, j] = tab_ref[r, 0] + tab_ref[r, 1]
                return 0
            jax.lax.fori_loop(0, N, lane, 0)
            return 0
        jax.lax.fori_loop(0, STEPS, step, 0)

    @jax.jit
    def run_scalarw(k):
        return pl.pallas_call(
            kernel_scalarw,
            out_shape=jax.ShapeDtypeStruct((S, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tabw, k.reshape(S, 128))

    timeit(f"pallas scalar 2-word x{STEPS}", run_scalarw, k0)

    # ---- B. one-hot matmul gather (bf16, one 8-bit plane) ----
    A = R // 128          # 611 hi blocks
    tab3 = jax.random.randint(key, (A, 128), 0, 255, dtype=jnp.int32)

    def kernel_mm(tab_ref, k_ref, o_ref):
        # one f32 plane: gather tab[r] for each of N queries
        kk = k_ref[:]                       # [S, 128]
        hi = (kk >> 7).reshape(N, 1)        # [N, 1]
        lo = kk & 127                       # [S, 128]
        oh = (hi == jax.lax.broadcasted_iota(jnp.int32, (N, A), 1))
        m1 = jax.lax.dot_general(
            oh.astype(jnp.bfloat16), tab_ref[:].astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)   # [N, 128]
        m1 = m1.reshape(S, 128, 128)
        # pick lane lo within each row: one-hot reduce over last dim
        sel = (lo[:, :, None] ==
               jax.lax.broadcasted_iota(jnp.int32, (S, 128, 128), 2))
        o_ref[:] = jnp.where(sel, m1, 0).sum(2).astype(jnp.int32)

    @jax.jit
    def run_mm(k):
        return pl.pallas_call(
            kernel_mm,
            out_shape=jax.ShapeDtypeStruct((S, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tab3, k.reshape(S, 128))

    timeit("pallas onehot-mm 1 plane x1", run_mm, k0, reps=3)

    # ---- C. dynamic_gather along sublanes (axis 0), table-shaped ----
    # confirms the take_along_axis form lowers + its speed; indices padded
    # to table shape (wasteful but measures the primitive)
    def kernel_dg(tab_ref, k_ref, o_ref):
        def step(t, kk):
            g = jnp.take_along_axis(tab_ref[:], kk[:, None].reshape(
                R, 128) if False else kk, axis=0)
            return (kk + g) % R
        kk = k_ref[:]
        o_ref[:] = jax.lax.fori_loop(0, STEPS, step, kk)

    @jax.jit
    def run_dg(k):
        # indices must be table-shaped: [R, 128]
        kfull = jnp.zeros((R, 128), jnp.int32).at[:S].set(k.reshape(S, 128))
        return pl.pallas_call(
            kernel_dg,
            out_shape=jax.ShapeDtypeStruct((R, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tab, kfull)

    timeit(f"pallas dyn_gather ax0 x{STEPS}", run_dg, k0, reps=3)


if __name__ == "__main__":
    main()
