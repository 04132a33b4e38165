"""Ablation probe of the Pallas extension kernel's per-row cost.

Times simplified variants of the ops/pallas_ext._kernel row body to find
what dominates: prefix-max shift chain, packed reductions, eh updates,
while_loop carry overhead.

Usage: python tools/pl_probe.py [B] [LQ] [ROWS]
"""
from __future__ import annotations

import functools
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

B = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
LQ = int(sys.argv[2]) if len(sys.argv) > 2 else 128
ROWS = int(sys.argv[3]) if len(sys.argv) > 3 else 128
L1p = (LQ + 1 + 7) // 8 * 8


def make(variant: str):
    i32 = jnp.int32

    def kernel(qT, tT, o_h):
        Z = jnp.int32(0)
        NEGc = jnp.int32(-0x40000000)
        row = jax.lax.broadcasted_iota(i32, (L1p, TB), 0)
        q = qT[:]
        eh_h = (row * 3 % 17).astype(i32)
        eh_e = jnp.zeros((L1p, TB), i32)

        def shdown(x, k, fill):
            return jnp.concatenate(
                [jnp.full((k, TB), fill, i32), x[:-k]], axis=0)

        def body(carry):
            i, eh_h, eh_e = carry
            tb = tT[pl.ds(jnp.minimum(i, jnp.int32(ROWS - 1)), 1), :]
            qrow = jnp.where(q == tb, jnp.int32(1), jnp.int32(-4))
            M = eh_h
            Mq = jnp.where(M != Z, M + qrow, Z)
            if variant == "eh_only":
                return (i + 1, Mq, eh_e)
            t_ins = jnp.maximum(Mq - jnp.int32(7), Z)
            A = t_ins + row
            if variant in ("full", "noreduce"):
                G = A
                sh = 1
                while sh < L1p:
                    G = jnp.maximum(G, shdown(G, sh, NEGc))
                    sh <<= 1
                F = jnp.maximum(shdown(G, 1, NEGc) - row, Z)
            elif variant == "roll":
                G = A
                sh = 1
                while sh < L1p:
                    Gs = pltpu.roll(G, sh, 0)
                    Gs = jnp.where(row >= sh, Gs, NEGc)
                    G = jnp.maximum(G, Gs)
                    sh <<= 1
                F = jnp.maximum(shdown(G, 1, NEGc) - row, Z)
            else:  # "noscan"
                F = A
            h = jnp.maximum(Mq, F)
            e_new = jnp.maximum(eh_e - 1, jnp.maximum(Mq - 8, Z))
            if variant in ("full", "roll"):
                mj_enc = jnp.max((h << 12) | row, axis=0, keepdims=True)
                h1_enc = jnp.max(jnp.where(row == jnp.int32(LQ - 1), h,
                                           NEGc), axis=0, keepdims=True)
                nz = (h != 0) | (e_new != 0)
                lst = jnp.max(jnp.where(nz, row, jnp.int32(-1)), axis=0,
                              keepdims=True)
                h = h + Z * (mj_enc + h1_enc + lst)
            return (i + 1, jnp.where(row > Z, shdown(h, 1, Z), h), e_new)

        def cond(c):
            return c[0] < jnp.int32(ROWS)

        out = jax.lax.while_loop(cond, body, (jnp.int32(0), eh_h, eh_e))
        o_h[:] = out[1]

    @jax.jit
    def run(qT, tT):
        grid = B // TB
        return pl.pallas_call(
            kernel,
            grid=(grid,),
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


def main():
    rng = np.random.default_rng(0)
    qT = jnp.asarray(rng.integers(0, 4, (L1p, B)).astype(np.int32))
    tT = jnp.asarray(rng.integers(0, 4, (ROWS, B)).astype(np.int32))
    print(f"B={B} LQ={LQ} L1p={L1p} ROWS={ROWS} grid={B//TB}")
    for variant in ("eh_only", "noscan", "noreduce", "full", "roll"):
        try:
            fn = make(variant)
            r = jax.block_until_ready(fn(qT, tT))
        except Exception as e:
            print(f"{variant:10s} FAILED: {type(e).__name__} {str(e)[:200]}")
            continue
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(fn(qT, tT))   # force D2H: block_until_ready may be
            ts.append(time.perf_counter() - t0)   # a no-op on this backend
        dt = min(ts)
        tot_rows = (B // TB) * ROWS
        print(f"{variant:10s} {dt*1e3:8.1f} ms  "
              f"{dt/tot_rows*1e6:7.2f} us/row-tile  "
              f"{dt/B*1e6:6.2f} us/lane")


if __name__ == "__main__":
    main()
