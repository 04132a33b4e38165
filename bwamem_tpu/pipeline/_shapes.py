"""Lane-count shape policy.

TPU (axon) backend: XLA executables are not cached across processes and
every compile is expensive, while padded vector lanes are nearly free — so
lane counts snap to a COARSE power-of-4 vocabulary (few distinct shapes).
CPU backend (tests, verification): compiles are cheap and padded lanes are
real compute — snap to snug power-of-2 buckets instead.
"""
from __future__ import annotations

import functools


def pow2_bucket(x: int, lo: int) -> int:
    n = lo
    while n < x:
        n <<= 1
    return n


def pow4_bucket(x: int, lo: int) -> int:
    n = lo
    while n < x:
        n <<= 2
    return n


@functools.lru_cache(maxsize=1)
def _is_cpu() -> bool:
    import jax
    return jax.default_backend() == "cpu"


def lanes(x: int, *, fine_lo: int, coarse_lo: int) -> int:
    """Batch-lane bucket: snug power-of-2 on CPU, coarse power-of-4 on TPU."""
    if _is_cpu():
        return pow2_bucket(x, fine_lo)
    return pow4_bucket(x, coarse_lo)


# XLA compile time for the while/fori-loop programs scales with the loop
# STATE size (lanes × columns), and this backend has no persistent
# executable cache — so giant-lane programs cost minutes of compile per
# process.  Device dispatches are tiled to a fixed lane budget instead:
# compile cost is bounded by the tile, extra dispatches are ~tens of ms.
LANE_TILE = 2048

# The Pallas extension kernel compiles in ~1 s per shape (vs minutes for
# the XLA while-loop program), and on the tunneled backend every dispatch
# pays a ~25 ms D2H round-trip — so Pallas dispatches use much larger lane
# tiles to amortize the per-fetch floor.
PL_LANE_TILE = 8192


def chunks(n: int, tile: int = LANE_TILE):
    """Yield (start, size) covering range(n) in tiles of at most `tile`."""
    s = 0
    while s < n:
        c = min(tile, n - s)
        yield s, c
        s += c
