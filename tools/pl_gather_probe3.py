#!/usr/bin/env python
"""Round 3: map the exact dynamic_gather envelope on this backend.

  B8:   ax0 dyn_gather [8, 128]      (single-vreg sublane gather)
  B32:  ax0 dyn_gather [32, 128]
  C512: ax1 dyn_gather [128, 512]    (lane gather wider than one vreg)
  CT:   transpose [128,128] + ax1    (the routing building block)
  D2:   scalar LOAD from VMEM, unrolled x8, SMEM out
  E2:   f32 matmul MXU throughput in-kernel (onehot feasibility)
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

STEPS = 512
key = jax.random.PRNGKey(0)


def timeit(name, fn, *args, reps=3, steps=STEPS):
    try:
        out = fn(*args)
        jax.block_until_ready(out)
    except Exception as e:
        msg = str(e).replace("\n", " | ")[:200]
        print(f"{name:30s} FAILED: {type(e).__name__}: {msg}")
        return None
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    best = min(ts)
    print(f"{name:30s} {best*1e3:9.2f} ms  ({(best)/steps*1e6:8.1f} us/step)")
    return out


def dg_probe(name, S, L, axis):
    tab = jax.random.randint(key, (S, L), 0, 1 << 20, jnp.int32)
    hi = S if axis == 0 else L
    idx = jax.random.randint(key, (S, L), 0, hi, jnp.int32)

    def kernel(tab_ref, k_ref, o_ref):
        def body(i, kk):
            g = jnp.take_along_axis(tab_ref[:], kk, axis=axis)
            return jnp.clip(kk + g, 0, hi - 1)
        o_ref[:] = jax.lax.fori_loop(0, STEPS, body, k_ref[:])

    @jax.jit
    def run(idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((S, L), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tab, idx)

    timeit(name, run, idx)


def probe_ct():
    # transpose+ax1 pair: the two-phase tile gather building block
    tab = jax.random.randint(key, (128, 128), 0, 1 << 20, jnp.int32)
    idx = jax.random.randint(key, (128, 128), 0, 128, jnp.int32)

    def kernel(tab_ref, k_ref, o_ref):
        def body(i, kk):
            g = jnp.take_along_axis(tab_ref[:], kk, axis=1)
            gt = g.T
            g2 = jnp.take_along_axis(gt, kk, axis=1)
            return jnp.clip(kk + g2, 0, 127)
        o_ref[:] = jax.lax.fori_loop(0, STEPS, body, k_ref[:])

    @jax.jit
    def run(idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((128, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tab, idx)

    timeit("CT transp+2xax1 [128,128]", run, idx)


def probe_d2():
    tab = jax.random.randint(key, (78208, 8), 0, 1 << 20, jnp.int32)
    idx = jax.random.randint(key, (8,), 0, 78208, jnp.int32)

    def kernel(tab_ref, k_ref, o_ref):
        for q in range(8):
            r = k_ref[q]
            o_ref[q] = tab_ref[r, 0]

    @jax.jit
    def run(idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8,), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        )(tab, idx)

    timeit("D2 scalar VMEM load x8", run, idx, steps=1)


def probe_e2():
    a = jax.random.normal(key, (1024, 640), jnp.float32)
    b = jax.random.normal(key, (640, 128), jnp.float32)

    def kernel(a_ref, b_ref, o_ref):
        def body(i, acc):
            m = jax.lax.dot_general(a_ref[:], b_ref[:],
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            return acc + m[:8]
        o_ref[:] = jax.lax.fori_loop(0, 64, body,
                                     jnp.zeros((8, 128), jnp.float32))

    @jax.jit
    def run():
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(a, b)

    timeit("E2 f32 mm 1024x640x128 x64", run, steps=64)


if __name__ == "__main__":
    dg_probe("B8  ax0 [8,128]", 8, 128, 0)
    dg_probe("B32 ax0 [32,128]", 32, 128, 0)
    dg_probe("C512 ax1 [128,512]", 128, 512, 1)
    probe_ct()
    probe_d2()
    probe_e2()
