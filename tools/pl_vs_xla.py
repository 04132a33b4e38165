"""Microbench: Pallas extension kernel vs XLA extend_batch on random cases.

Usage: python tools/pl_vs_xla.py [B] [LQ] [LT]
Prints parity check + per-call timing for both implementations.
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    LQ = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    LT = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    import jax
    import jax.numpy as jnp
    from bwamem_tpu.ops import extend as extops
    from bwamem_tpu.ops import pallas_ext
    from bwamem_tpu.config import MemOptions

    print("backend:", jax.default_backend())
    opt = MemOptions()
    mat = np.asarray(opt.mat, np.int8)
    rng = np.random.default_rng(0)

    # realistic extension cases: target = query + noise
    q = rng.integers(0, 4, (B, LQ), dtype=np.uint8)
    t = np.full((B, LT), 4, np.uint8)
    qlen = rng.integers(5, LQ + 1, B).astype(np.int32)
    tlen = np.minimum(qlen + rng.integers(0, 50, B), LT).astype(np.int32)
    for b in range(B):
        tl = int(tlen[b])
        cp = min(tl, LQ)
        t[b, :cp] = q[b, :cp]
        if tl > cp:
            t[b, cp:tl] = rng.integers(0, 4, tl - cp)
        nmut = rng.integers(0, max(tl // 10, 1))
        pos = rng.integers(0, tl, nmut)
        t[b, pos] = rng.integers(0, 4, nmut)
    h0 = rng.integers(10, 120, B).astype(np.int32)
    w = np.full(B, opt.w, np.int32)
    eb = np.full(B, opt.pen_clip5, np.int32)

    qj = jnp.asarray(q)
    tj = jnp.asarray(t)

    def xla_run():
        tdev = jnp.asarray(t.astype(np.int32))

        def target_at(i):
            return jax.lax.dynamic_index_in_dim(
                tdev.T, jnp.minimum(i, LT - 1), axis=0, keepdims=False)

        return extops.extend_batch(
            qj, jnp.asarray(qlen), target_at, jnp.asarray(tlen),
            jnp.asarray(h0), jnp.asarray(w), jnp.asarray(eb), mat,
            o_del=opt.o_del, e_del=opt.e_del, o_ins=opt.o_ins,
            e_ins=opt.e_ins, zdrop=opt.zdrop, t_max=LT)

    xla_jit = jax.jit(xla_run)

    def pl_run():
        return pallas_ext.extend_batch_pl(
            jnp.asarray(q.T), jnp.asarray(qlen), jnp.asarray(t.T.astype(
                np.int32)), jnp.asarray(tlen), jnp.asarray(h0),
            jnp.asarray(w), jnp.asarray(eb),
            lq_max=LQ, t_max=LT, mat_bytes=mat.tobytes(),
            o_del=opt.o_del, e_del=opt.e_del, o_ins=opt.o_ins,
            e_ins=opt.e_ins, zdrop=opt.zdrop)

    t0 = time.perf_counter()
    rx = jax.block_until_ready(xla_jit())
    print(f"XLA compile+run: {time.perf_counter()-t0:.2f}s")
    t0 = time.perf_counter()
    try:
        rp = jax.block_until_ready(pl_run())
    except Exception as e:
        print("PALLAS FAILED:", type(e).__name__, str(e)[:2000])
        return
    print(f"Pallas compile+run: {time.perf_counter()-t0:.2f}s")

    ok = all(np.array_equal(np.asarray(a), np.asarray(b))
             for a, b in zip(rx, rp))
    print("parity:", "OK" if ok else "MISMATCH")
    if not ok:
        for name, a, b in zip(rx._fields, rx, rp):
            d = np.nonzero(np.asarray(a) != np.asarray(b))[0]
            if d.size:
                print(f"  {name}: {d.size} diffs, first {d[:5]}",
                      np.asarray(a)[d[:5]], np.asarray(b)[d[:5]])

    for name, fn in (("XLA", xla_jit), ("Pallas", pl_run)):
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            jax.block_until_ready(fn())
            ts.append(time.perf_counter() - t0)
        print(f"{name}: min {min(ts)*1e3:.1f} ms  "
              f"({min(ts)/B*1e6:.1f} us/lane)")


if __name__ == "__main__":
    main()
