"""Characterize the axon backend's dispatch/transfer overheads.

Questions:
  1. Does per-call cost scale with kernel rows (device compute) or is it
     flat (dispatch/RTT bound)?
  2. Do N enqueued dispatches pipeline (enqueue all, fetch once) or
     serialize?
  3. What does D2H cost vs output size?
  4. Is block_until_ready a no-op (async enqueue returns immediately)?
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TB = 128


def make_kernel(L1p, ROWS, B):
    i32 = jnp.int32

    def kernel(qT, tT, o_h):
        Z = jnp.int32(0)
        row = jax.lax.broadcasted_iota(i32, (L1p, TB), 0)
        q = qT[:]

        def body(carry):
            i, eh = carry
            tb = tT[pl.ds(jnp.minimum(i, jnp.int32(ROWS - 1)), 1), :]
            qrow = jnp.where(q == tb, jnp.int32(1), jnp.int32(-4))
            eh = jnp.maximum(eh + qrow, Z)
            return (i + 1, eh)

        def cond(c):
            return c[0] < jnp.int32(ROWS)

        out = jax.lax.while_loop(cond, body,
                                 (jnp.int32(0), (row * 3 % 17).astype(i32)))
        o_h[:] = out[1]

    @jax.jit
    def run(qT, tT):
        return pl.pallas_call(
            kernel,
            grid=(B // TB,),
            in_specs=[
                pl.BlockSpec((L1p, TB), lambda g: (jnp.int32(0), g),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((ROWS, TB), lambda g: (jnp.int32(0), g),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((L1p, TB), lambda g: (jnp.int32(0), g),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((L1p, B), jnp.int32),
        )(qT, tT)

    return run


def t_enqueue_fetch(fn, args, n):
    """Enqueue n calls, then fetch all results."""
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(n)]
    t_enq = time.perf_counter() - t0
    t0 = time.perf_counter()
    for o in outs:
        np.asarray(o)
    t_fetch = time.perf_counter() - t0
    return t_enq, t_fetch


def main():
    rng = np.random.default_rng(0)
    B = 2048
    L1p = 136

    print("=== cost vs ROWS (B=2048, fetch each) ===")
    for ROWS in (8, 128, 512, 2048):
        fn = make_kernel(L1p, ROWS, B)
        qT = jnp.asarray(rng.integers(0, 4, (L1p, B)).astype(np.int32))
        tT = jnp.asarray(rng.integers(0, 4, (ROWS, B)).astype(np.int32))
        np.asarray(fn(qT, tT))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(fn(qT, tT))
            ts.append(time.perf_counter() - t0)
        print(f"ROWS={ROWS:5d}: {min(ts)*1e3:8.1f} ms/call")

    print("=== pipelining: enqueue N then fetch all (ROWS=128) ===")
    ROWS = 128
    fn = make_kernel(L1p, ROWS, B)
    qT = jnp.asarray(rng.integers(0, 4, (L1p, B)).astype(np.int32))
    tT = jnp.asarray(rng.integers(0, 4, (ROWS, B)).astype(np.int32))
    np.asarray(fn(qT, tT))
    for n in (1, 4, 16):
        te, tf = t_enqueue_fetch(fn, (qT, tT), n)
        print(f"n={n:3d}: enqueue {te*1e3:8.1f} ms  fetch {tf*1e3:8.1f} ms "
              f" total/call {(te+tf)/n*1e3:8.1f} ms")

    print("=== D2H cost vs size ===")
    for shape in ((1, 256), (136, 2048), (1024, 8192)):
        x = jnp.zeros(shape, jnp.int32) + 1
        np.asarray(x)
        y = jnp.ones(shape, jnp.int32)

        @jax.jit
        def f(a):
            return a * 2

        np.asarray(f(y))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(f(y))
            ts.append(time.perf_counter() - t0)
        nb = shape[0] * shape[1] * 4
        print(f"{shape}: {min(ts)*1e3:8.2f} ms  ({nb/1e6:.2f} MB)")

    print("=== H2D cost (device_put) vs size ===")
    for shape in ((1, 256), (136, 2048), (1024, 8192)):
        h = np.zeros(shape, np.int32)
        jax.device_put(h)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            d = jax.device_put(h)
            # H2D may be lazy; force by using it
            ts.append(time.perf_counter() - t0)
        print(f"{shape}: put {min(ts)*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
