"""Opt-in wall-clock section timers for pipeline attribution.

The reference prints per-kernel rdtsc times into perf_profile.txt
(cuda/superbatch_process.cpp:11,135); this is the host-side equivalent at
our stage granularity, plus D2H/H2D byte accounting — on the tunneled PJRT
backend the transport (≈27 ms/round-trip, ≈40 MB/s D2H) can dominate, so
bytes moved are as load-bearing as seconds spent.

Zero overhead when disabled (the default): `section()` returns a no-op
context manager.  Enable with BWAMEM_TPU_TIMERS=1 or timers.enable().
"""
from __future__ import annotations

import os
import time
from collections import defaultdict
from contextlib import contextmanager

_enabled = bool(int(os.environ.get("BWAMEM_TPU_TIMERS", "0") or 0))
_acc: dict[str, list] = defaultdict(lambda: [0, 0.0])   # name -> [n, secs]
_bytes: dict[str, list] = defaultdict(lambda: [0, 0])   # name -> [n, bytes]
_counts: dict[str, int] = defaultdict(int)              # name -> count


def enable(on: bool = True) -> None:
    global _enabled
    _enabled = on


def enabled() -> bool:
    return _enabled


def reset() -> None:
    _acc.clear()
    _bytes.clear()
    _counts.clear()


@contextmanager
def _noop():
    yield


def section(name: str):
    if not _enabled:
        return _noop()

    @contextmanager
    def run():
        t0 = time.perf_counter()
        try:
            yield
        finally:
            a = _acc[name]
            a[0] += 1
            a[1] += time.perf_counter() - t0
    return run()


def start(name: str) -> float | None:
    """Paired with stop() for sections that cannot be a `with` block.
    Returns None when disabled so a mid-section enable() cannot record a
    bogus duration (stop() skips on None)."""
    return time.perf_counter() if _enabled else None


def stop(name: str, t0: float | None) -> None:
    if _enabled and t0 is not None:
        a = _acc[name]
        a[0] += 1
        a[1] += time.perf_counter() - t0


def add_bytes(name: str, nbytes: int) -> None:
    if _enabled:
        b = _bytes[name]
        b[0] += 1
        b[1] += int(nbytes)


def count(name: str, k: int = 1) -> None:
    """Event counter — used to track device-program dispatches per batch
    (the reference prints per-kernel launch timings; on this backend the
    launch+fetch round-trip is the scarce resource, so the COUNT is the
    headline number)."""
    if _enabled:
        _counts[name] += int(k)


def report() -> str:
    rows = []
    for name in sorted(_acc):
        n, s = _acc[name]
        rows.append(f"{name:<32} n={n:<6} total={s * 1e3:9.1f} ms  "
                    f"avg={s / max(n, 1) * 1e3:8.2f} ms")
    for name in sorted(_bytes):
        n, b = _bytes[name]
        rows.append(f"{name:<32} n={n:<6} total={b / 1e6:9.2f} MB   "
                    f"avg={b / max(n, 1) / 1e3:8.1f} KB")
    for name in sorted(_counts):
        rows.append(f"{name:<32} count={_counts[name]}")
    return "\n".join(rows)


def snapshot() -> dict:
    out = {k: tuple(v) for k, v in _acc.items()}
    out.update({k + ".bytes": tuple(v) for k, v in _bytes.items()})
    out.update({k + ".count": _counts[k] for k in _counts})
    return out
