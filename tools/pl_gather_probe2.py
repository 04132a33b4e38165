#!/usr/bin/env python
"""Round 2 of Mosaic gather-primitive probes (see pl_gather_probe.py).

Tests, each in isolation with full error text:
  A. XLA take_along_axis, table-shaped (does XLA emit fast dynamic-gather?)
  B. pallas dynamic_gather axis=0, small operand [512, 128]
  C. pallas dynamic_gather axis=1, [128, 128] and [8, 128]
  D. pallas scalar loads from VMEM -> SMEM scratch output
  E. pallas one-hot matmul, Q=1024 block, final pick via ax1 dyn_gather
"""
from __future__ import annotations

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

STEPS = 32


def timeit(name, fn, *args, reps=3, steps=STEPS):
    try:
        out = fn(*args)
        jax.block_until_ready(out)
    except Exception as e:
        msg = str(e).replace("\n", " | ")[:400]
        print(f"{name:34s} FAILED: {type(e).__name__}: {msg}")
        return None
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    best = min(ts)
    print(f"{name:34s} {best*1e3:9.2f} ms  ({best/steps*1e6:8.1f} us/step)")
    return out


key = jax.random.PRNGKey(0)

# ---------------- A. XLA take_along_axis table-shaped ----------------
RA = 611 * 128


def probe_a():
    tab = jax.random.randint(key, (611, 128), 0, 1 << 20, jnp.int32)
    idx = jax.random.randint(key, (611, 128), 0, 611, jnp.int32)

    @jax.jit
    def run(idx):
        def body(i, kk):
            g = jnp.take_along_axis(tab, kk, axis=0)
            return (kk + g) % 611
        return jax.lax.fori_loop(0, STEPS, body, idx)

    timeit("A xla take_along_axis [611,128]", run, idx)


# ---------------- B. pallas dyn_gather ax0 small ----------------
def probe_b():
    tab = jax.random.randint(key, (512, 128), 0, 1 << 20, jnp.int32)
    idx = jax.random.randint(key, (512, 128), 0, 512, jnp.int32)

    def kernel(tab_ref, k_ref, o_ref):
        def body(i, kk):
            g = jnp.take_along_axis(tab_ref[:], kk, axis=0)
            return (kk + g) % 512
        o_ref[:] = jax.lax.fori_loop(0, STEPS, body, k_ref[:])

    @jax.jit
    def run(idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((512, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tab, idx)

    timeit("B pl dyn_gather ax0 [512,128]", run, idx)


# ---------------- C. pallas dyn_gather ax1 ----------------
def probe_c(S):
    tab = jax.random.randint(key, (S, 128), 0, 1 << 20, jnp.int32)
    idx = jax.random.randint(key, (S, 128), 0, 128, jnp.int32)

    def kernel(tab_ref, k_ref, o_ref):
        def body(i, kk):
            g = jnp.take_along_axis(tab_ref[:], kk, axis=1)
            return (kk + g) % 128
        o_ref[:] = jax.lax.fori_loop(0, STEPS, body, k_ref[:])

    @jax.jit
    def run(idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((S, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tab, idx)

    timeit(f"C pl dyn_gather ax1 [{S},128]", run, idx)


# ---------------- D. pallas scalar loads -> SMEM out ----------------
def probe_d():
    N = 1024
    tab = jax.random.randint(key, (78208, 8), 0, 1 << 20, jnp.int32)
    idx = jax.random.randint(key, (N,), 0, 78208, jnp.int32)

    def kernel(tab_ref, k_ref, o_ref):
        # k_ref, o_ref in SMEM
        def lane(q, _):
            r = k_ref[q]
            o_ref[q] = tab_ref[r, 0]
            return 0
        jax.lax.fori_loop(0, N, lane, 0)

    @jax.jit
    def run(idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((N,), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        )(tab, idx)

    timeit("D pl scalar VMEM load x1024", run, idx, steps=1)


# ---------------- E. onehot matmul Q=1024 + ax1 pick ----------------
def probe_e():
    Q = 1024
    A = 640
    tab = jax.random.randint(key, (A, 128), 0, 1 << 20, jnp.int32)
    idx = jax.random.randint(key, (Q,), 0, A * 128, jnp.int32)

    def kernel(tab_ref, k_ref, o_ref):
        kk = k_ref[:]                      # [8, 128]
        hi = (kk >> 7).reshape(Q, 1)
        oh = (hi == jax.lax.broadcasted_iota(jnp.int32, (Q, A), 1))
        m1 = jax.lax.dot_general(
            oh.astype(jnp.float32), tab_ref[:].astype(jnp.float32),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)      # [Q, 128]
        lo = (kk & 127).reshape(Q, 1)
        pick = jnp.take_along_axis(
            m1, jnp.broadcast_to(lo, (Q, 128)).astype(jnp.int32), axis=1)
        o_ref[:] = pick[:, :1].reshape(8, 128).astype(jnp.int32)

    @jax.jit
    def run(idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tab, idx.reshape(8, 128))

    timeit("E pl onehot-mm Q1024 1 word", run, idx, steps=1)


if __name__ == "__main__":
    for fn in (probe_a, probe_b, lambda: probe_c(128), lambda: probe_c(8),
               probe_d, probe_e):
        fn()
