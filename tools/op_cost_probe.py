#!/usr/bin/env python
"""Per-op cost census on the live backend, inside a compiled fori_loop.

The gather probes showed ~0.65-1.3 ms per gather op regardless of shape.
This measures every op class the front-half scan bodies use, to redesign
the programs around the expensive ones.
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

STEPS = 256
N = 8192
R = 78208
key = jax.random.PRNGKey(0)
tab = jax.random.randint(key, (R, 12), 0, 1 << 20, jnp.int32)
tab1 = jax.random.randint(key, (R,), 0, 1 << 20, jnp.int32)
seq = jax.random.randint(key, (N, 160), 0, 4, jnp.int32)
k0 = jax.random.randint(key, (N,), 0, R, jnp.int32)
cap = 32
buf0 = jnp.zeros((N, cap), jnp.int32)


def timeit(name, fn, *args, reps=3):
    out = jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    best = min(ts)
    print(f"{name:40s} {best*1e3:9.2f} ms total "
          f"({best/STEPS*1e6:8.1f} us/step)")


def loop(body):
    @jax.jit
    def run(k):
        return jax.lax.fori_loop(0, STEPS, body, (k, buf0))
    return run


# baseline: pure vector ops
def b_vec(i, st):
    k, buf = st
    k = (k * 5 + 1) & (R - 1)
    return jnp.clip(k, 0, R - 1), buf


# 1 gather from [R,12]
def b_gather(i, st):
    k, buf = st
    row = tab[k]
    return (k + row.sum(-1)) % R, buf


# 1 gather from [R] (1-wide)
def b_gather1(i, st):
    k, buf = st
    v = tab1[k]
    return (k + v) % R, buf


# dynamic_slice with loop index (seq column fetch, lockstep)
def b_dslice(i, st):
    k, buf = st
    col = jax.lax.dynamic_slice(seq, (0, jnp.minimum(i, 159)), (N, 1))[:, 0]
    return (k + col) % R, buf


# take_along_axis per-lane seq fetch (current style)
def b_taa(i, st):
    k, buf = st
    x = (k % 160)[:, None]
    col = jnp.take_along_axis(seq, x, axis=1)[:, 0]
    return (k + col) % R, buf


# scatter: buf.at[lane, slot].set — packed candidate record
def b_scatter(i, st):
    k, buf = st
    slot = k % cap
    buf = buf.at[jnp.arange(N), slot].set(k)
    return (k * 3 + 1) % R, buf


# dynamic_update_slice at loop index (fixed-slot record)
def b_dus(i, st):
    k, buf = st
    buf = jax.lax.dynamic_update_slice(
        buf, k[:, None], (0, jnp.minimum(i % cap, cap - 1)))
    return (k * 3 + 1) % R, buf


# where/select + cummax-style shift (free-expected)
def b_cummax(i, st):
    k, buf = st
    m = jnp.maximum(k, jnp.roll(k, 1))
    return (m + 1) % R, buf


# sort (used by compaction)
def b_sort(i, st):
    k, buf = st
    return jnp.sort(k) % R, buf


# cumsum over lanes (compaction prefix)
def b_cumsum(i, st):
    k, buf = st
    c = jnp.cumsum(jnp.ones_like(k))
    return (k + c) % R, buf


for name, body in [
    ("vector ops only", b_vec),
    ("gather [R,12]", b_gather),
    ("gather [R] width1", b_gather1),
    ("dynamic_slice loop-idx col", b_dslice),
    ("take_along_axis seq col", b_taa),
    ("scatter at[lane,slot].set", b_scatter),
    ("dus at loop idx", b_dus),
    ("roll+max", b_cummax),
    ("sort 8192", b_sort),
    ("cumsum 8192", b_cumsum),
]:
    timeit(name, loop(body), k0)
