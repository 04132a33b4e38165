"""Per-phase wall-clock profile of one alignment batch.

Usage: python tools/profile_batch.py [n_reads] [--pe]
Uses the bench dataset (.benchdata, built by bench.py).  Prints a phase
breakdown so optimization goes where the time is (SURVEY.md §5.1: the
reference prints per-kernel rdtsc times; this is our equivalent).
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

import numpy as np  # noqa: E402


def profile_phases(al, reads, reps: int = 2, warmup: bool = True) -> dict:
    """Per-phase wall seconds over `reps` repetitions of one batch through
    the PRODUCTION pipeline (align_batch_se), attributed via utils.timers
    sections.  Keys mirror the reference's perf_profile.txt stages
    (SMEM_CHN / BSW / SAM, cuda/superbatch_process.cpp:11) at our stage
    granularity; *.count keys record device-program dispatches."""
    from bwamem_tpu.utils import timers

    if warmup:
        t0 = time.perf_counter()
        al.align_batch_se(reads, 0)
        print(f"warmup+compile: {time.perf_counter() - t0:.2f}s",
              file=sys.stderr)
    was = timers.enabled()
    timers.enable()
    timers.reset()
    t0 = time.perf_counter()
    for _ in range(reps):
        al.align_batch_se(reads, 0)
    total = time.perf_counter() - t0
    snap = timers.snapshot()
    timers.enable(was)
    t = {}
    for k, v in snap.items():
        if k.endswith(".bytes"):
            t[k.replace(".bytes", ".MB")] = (v[1] / 1e6) / reps
        elif k.endswith(".count"):
            t[k] = v / reps
        else:
            t[k] = v[1] / reps
    t["total"] = total / reps
    return t


def main():
    import os
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          str(REPO / ".jaxcache"))
    if os.environ.get("JAX_PLATFORMS"):
        # the axon PJRT plugin ignores the env var; force via config API
        import jax
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    from bwamem_tpu.index import BwaIndex
    from bwamem_tpu.io.fastq import read_fastx
    from bwamem_tpu.pipeline.align import Aligner

    prefix = str(REPO / ".benchdata" / "g5000000")
    idx = BwaIndex.load(prefix + ".ours")
    reads = []
    for i, r in enumerate(read_fastx(prefix + ".fq")):
        if i >= n:
            break
        reads.append(r)
    al = Aligner(idx)

    t = profile_phases(al, reads, reps=2)
    wall = t.pop("total")
    secs = {k: v for k, v in t.items()
            if not k.endswith(".MB") and not k.endswith(".count")}
    print(f"\n=== {n} reads × 2 reps ===")
    for k in sorted(t):
        unit = ("MB" if k.endswith(".MB")
                else "x" if k.endswith(".count") else "s")
        pct = f"{100 * t[k] / wall:5.1f}%" if unit == "s" else ""
        print(f"{k:22s} {t[k]:8.3f}{unit}  {pct}")
    print(f"{'(sections)':22s} {sum(secs.values()):8.3f}s")
    print(f"{'TOTAL wall':22s} {wall:8.3f}s  → {n / wall:,.0f} reads/s")


if __name__ == "__main__":
    main()
