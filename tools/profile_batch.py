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
    """Per-phase wall seconds over `reps` repetitions of one batch.  Keys
    mirror the reference's perf_profile.txt stages (SMEM_CHN / BSW / SAM,
    cuda/superbatch_process.cpp:11) at our stage granularity."""
    from bwamem_tpu.io.fastq import pack_batch
    from bwamem_tpu.pipeline.align import _bucket
    from bwamem_tpu.pipeline import extend_host, seeding_host
    from bwamem_tpu import finalize as fin
    import jax

    n = len(reads)
    t = {}

    def clock(name, fn, *a, **kw):
        t0 = time.perf_counter()
        out = fn(*a, **kw)
        jax.block_until_ready(out) if hasattr(out, "block_until_ready") \
            else None
        t[name] = t.get(name, 0) + time.perf_counter() - t0
        return out

    if warmup:
        t0 = time.perf_counter()
        al.align_batch_se(reads[:n], 0)
        print(f"warmup+compile: {time.perf_counter() - t0:.2f}s",
              file=sys.stderr)

    for rep in range(reps):
        N = _bucket(n, lo=8)
        L = _bucket(max(r.l_seq for r in reads), lo=32)
        seq, l_seq = pack_batch(reads, N, L)
        groups = clock("1.seed+chain", seeding_host.front_half,
                       al, reads, seq, l_seq)

        def ext():
            out = [[] for _ in range(n)]
            for ridx, wr in groups:
                g_reads = [reads[i] for i in ridx]
                g = extend_host.extend_regions(al, g_reads, seq[ridx], wr)
                for gi, i in enumerate(ridx):
                    out[i] = g[gi]
            return out

        regs = clock("2.flat_extension", ext)

        def dedup():
            out = []
            for i in range(n):
                ri = fin.sort_dedup_patch(al.opt, al.pac, al.l_pac,
                                          reads[i].seq, list(regs[i]))
                for r in ri:
                    if r.rid >= 0 and al.ctg_is_alt_np[r.rid]:
                        r.is_alt = 1
                out.append(ri)
            return out

        all_regs = clock("3.dedup_host", dedup)

        def mark_and_select():
            jobs = []
            sel, xa = [], []
            for i, ri in enumerate(all_regs):
                fin.mark_primary_se(al.opt, ri, i)
                xa.append(al._phaseA_gen_alt(ri, reads[i], jobs))
                sel.append(al._phaseA_reg2sam(ri, reads[i], jobs))
            return jobs, sel, xa

        jobs, sel, xa = clock("4.mark+select_host", mark_and_select)
        clock("5.global_sw_jobs", fin.run_cigar_jobs, al.opt, al.pac,
              al.l_pac, jobs, al._device_global)

        def render():
            out = []
            for i, ri in enumerate(all_regs):
                x = al._xa_strings(xa[i], jobs)
                out.append(al._phaseC_reg2sam(reads[i], ri, sel[i], x,
                                              jobs, 0, None, None))
            return out

        clock("6.render_sam", render)

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
    total = sum(t.values())
    print(f"\n=== {n} reads × 2 reps ===")
    for k in sorted(t):
        print(f"{k:22s} {t[k]:8.3f}s  {100 * t[k] / total:5.1f}%")
    print(f"{'TOTAL':22s} {total:8.3f}s  → {2 * n / total:,.0f} reads/s")


if __name__ == "__main__":
    main()
