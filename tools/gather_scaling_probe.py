#!/usr/bin/env python
"""XLA gather cost scaling on the live backend: lanes x row-width.

Decides whether the seeding-front lever is fewer gather OPS (fixed-cost
dominated) or fewer gathered ELEMENTS (per-element dominated).
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

STEPS = 32
R = 78208


def bench(n_lanes, width, dtype=jnp.int32):
    key = jax.random.PRNGKey(0)
    tab = jax.random.randint(key, (R, width), 0, 1 << 20, dtype=dtype)
    k0 = jax.random.randint(key, (n_lanes,), 0, R, dtype=jnp.int32)

    @jax.jit
    def chain(k):
        def body(i, kk):
            row = tab[kk]
            s = row.astype(jnp.int32).sum(-1) if width > 1 \
                else row[:, 0].astype(jnp.int32)
            return (kk + s) % R
        return jax.lax.fori_loop(0, STEPS, body, k0)

    out = chain(k0)
    jax.block_until_ready(out)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(chain(k0))
        ts.append(time.perf_counter() - t0)
    us = min(ts) / STEPS * 1e6
    per_el = us * 1000 / (n_lanes * width)
    print(f"lanes={n_lanes:7d} width={width:3d}  {us:9.1f} us/step  "
          f"({per_el:7.2f} ns/elem)")


def main():
    for lanes in (1024, 8192, 65536):
        for width in (1, 4, 12):
            bench(lanes, width)


if __name__ == "__main__":
    main()
