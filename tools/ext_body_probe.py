"""Isolate the per-row cost of the extension loop body on this backend.

Runs a fixed-iteration fori_loop over [B, L1] state with progressively
more of the extend_batch body enabled, and prints ms/row for each variant.
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

B, LQ, ROWS = 2048, 128, 128
L1 = LQ + 1
NEG = -0x40000000


def run(name, body):
    i32 = jnp.int32

    @jax.jit
    def prog(eh_h, eh_e, tT):
        def wrapped(i, st):
            return body(i, st, tT)
        return jax.lax.fori_loop(0, ROWS, wrapped, (eh_h, eh_e))

    rng = np.random.default_rng(0)
    eh_h = jnp.asarray(rng.integers(0, 100, (B, L1)).astype(np.int32))
    eh_e = jnp.zeros((B, L1), jnp.int32)
    tT = jnp.asarray(rng.integers(0, 4, (ROWS, B)).astype(np.int32))
    out = prog(eh_h, eh_e, tT)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    REP = 5
    for _ in range(REP):
        out = prog(eh_h, eh_e, tT)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / REP
    print(f"{name:28s} {dt*1e3:8.1f} ms  ({dt/ROWS*1e3:6.3f} ms/row)")


def main():
    i32 = jnp.int32
    jj = jnp.arange(L1, dtype=i32)[None, :]
    col = jj[:, :LQ]
    ramp = (col * 1).astype(i32)
    matf = jnp.asarray(np.array([1, -4, -4, -4, -1] * 5, np.int32)[:25])
    qpad = jnp.asarray(np.random.default_rng(1).integers(
        0, 4, (B, LQ)).astype(np.int32))
    prof = jnp.stack([matf[c * 5 + qpad] for c in range(5)], axis=1)

    def v_elem(i, st, tT):
        eh_h, eh_e = st
        M = eh_h[:, :LQ]
        E = eh_e[:, :LQ]
        Mq = jnp.where(M != 0, M + 1, 0)
        h = jnp.maximum(Mq, E)
        h_sh = jnp.concatenate([jnp.zeros((B, 1), i32), h], axis=1)
        e_new = jnp.maximum(E - 1, Mq - 7)
        e_pad = jnp.concatenate([e_new, jnp.zeros((B, 1), i32)], axis=1)
        return jnp.maximum(eh_h, h_sh), jnp.maximum(eh_e, e_pad)

    def v_slice(i, st, tT):
        eh_h, eh_e = st
        tb = jax.lax.dynamic_index_in_dim(tT, i, axis=0, keepdims=False)
        q = sum(jnp.where(tb[:, None] == c, prof[:, c], 0) for c in range(4))
        M = eh_h[:, :LQ]
        E = eh_e[:, :LQ]
        Mq = jnp.where(M != 0, M + q, 0)
        h = jnp.maximum(Mq, E)
        h_sh = jnp.concatenate([jnp.zeros((B, 1), i32), h], axis=1)
        e_pad = jnp.concatenate([jnp.maximum(E - 1, Mq - 7),
                                 jnp.zeros((B, 1), i32)], axis=1)
        return jnp.maximum(eh_h, h_sh), jnp.maximum(eh_e, e_pad)

    def v_scan(i, st, tT):
        eh_h, eh_e = st
        M = eh_h[:, :LQ]
        A = jnp.maximum(M - 7, 0) + ramp
        G = jax.lax.associative_scan(jnp.maximum, A, axis=1)
        h = jnp.maximum(M, G - ramp)
        h_sh = jnp.concatenate([jnp.zeros((B, 1), i32), h], axis=1)
        return jnp.maximum(eh_h, h_sh), eh_e

    def v_reduce(i, st, tT):
        eh_h, eh_e = st
        M = eh_h[:, :LQ]
        m = M.max(axis=1)
        mj = jnp.where(M == m[:, None], col, -1).max(axis=1)
        h = M + jnp.where((mj > 0)[:, None], 1, 0)
        h_sh = jnp.concatenate([jnp.zeros((B, 1), i32), h], axis=1)
        return jnp.maximum(eh_h, h_sh), eh_e

    def v_full(i, st, tT):
        a, b = v_slice(i, st, tT)
        c, d = v_scan(i, (a, b), tT)
        e, f = v_reduce(i, (c, d), tT)
        return e, f

    def v_argmax(i, st, tT):
        eh_h, eh_e = st
        M = eh_h[:, :LQ]
        m = M.max(axis=1)
        mj = jnp.where(M == m[:, None], col, -1).max(axis=1)
        h = M + jnp.where((mj > 0)[:, None], 1, 0)
        h_sh = jnp.concatenate([jnp.zeros((B, 1), i32), h], axis=1)
        return jnp.maximum(eh_h, h_sh), eh_e

    def v_packedreduce(i, st, tT):
        eh_h, eh_e = st
        M = eh_h[:, :LQ]
        enc = (M << 12) | col
        enc2 = jnp.where(col == 5, M, -99)
        red = jnp.stack([enc, enc2], axis=1).max(axis=2)
        h = M + jnp.where((red[:, 0] > 0)[:, None], 1, 0)
        h_sh = jnp.concatenate([jnp.zeros((B, 1), i32), h], axis=1)
        return jnp.maximum(eh_h, h_sh), eh_e

    def v_profsel(i, st, tT):
        eh_h, eh_e = st
        tb = jax.lax.dynamic_index_in_dim(tT, i, axis=0, keepdims=False)
        q = sum(jnp.where(tb[:, None] == c, prof[:, c], 0) for c in range(4))
        q = q + jnp.where(tb[:, None] >= 4, prof[:, 4], 0)
        M = eh_h[:, :LQ]
        h = M + q
        h_sh = jnp.concatenate([jnp.zeros((B, 1), i32), h], axis=1)
        return jnp.maximum(eh_h, h_sh), eh_e

    def v_maskwrite(i, st, tT):
        eh_h, eh_e = st
        beg = eh_h[:, 0] % 7
        end = 100 + (eh_h[:, 1] % 9)
        M = eh_h[:, :LQ]
        h_sh = jnp.concatenate([jnp.zeros((B, 1), i32), M], axis=1)
        wh = (jj >= beg[:, None]) & (jj <= end[:, None])
        new_h = jnp.where(jj == beg[:, None], 3, h_sh)
        eh_h2 = jnp.where(wh, new_h, eh_h)
        we = (jj >= beg[:, None]) & (jj < end[:, None])
        eh_e2 = jnp.where(we, h_sh, eh_e)
        return eh_h2, eh_e2

    run("argmax-via-where", v_argmax)
    run("packed stack reduce", v_packedreduce)
    run("profile select", v_profsel)
    run("masked window writes", v_maskwrite)


def main_while():
    """Same combined body under lax.while_loop with a reduction cond —
    isolates the while-vs-fori overhead on this backend."""
    i32 = jnp.int32
    rng = np.random.default_rng(0)
    eh_h0 = jnp.asarray(rng.integers(0, 100, (B, L1)).astype(np.int32))
    eh_e0 = jnp.zeros((B, L1), jnp.int32)
    tT = jnp.asarray(rng.integers(0, 4, (ROWS, B)).astype(np.int32))

    @jax.jit
    def prog(eh_h, eh_e, tT):
        def cond(c):
            i, h, e = c
            return (i < ROWS) & jnp.any(h[:, 0] >= 0)
        def body(c):
            i, h, e = c
            tb = jax.lax.dynamic_index_in_dim(tT, i, axis=0, keepdims=False)
            M = h[:, :LQ]
            A = jnp.maximum(M - 7, 0)
            G = jax.lax.associative_scan(jnp.maximum, A, axis=1)
            hh = jnp.maximum(M + tb[:, None], G)
            m = hh.max(axis=1)
            h_sh = jnp.concatenate([m[:, None], hh], axis=1)
            return i + 1, jnp.maximum(h, h_sh), e
        return jax.lax.while_loop(cond, body, (jnp.asarray(0, i32), eh_h,
                                               eh_e))

    out = prog(eh_h0, eh_e0, tT)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    REP = 5
    for _ in range(REP):
        out = prog(eh_h0, eh_e0, tT)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / REP
    print(f"while_loop combined          {dt*1e3:8.1f} ms  "
          f"({dt/ROWS*1e3:6.3f} ms/row)")


if __name__ == "__main__":
    main()
