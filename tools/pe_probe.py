#!/usr/bin/env python
"""Serial PE batch probe on the live chip — the round-4 wedge repro.

Runs ONE (or a few) serial align_batch_pe calls at the judge's shape
(16384 interleaved 150bp reads by default) with stage timers, printing
progress as it goes.  Round 4's driver bench wedged forever here; with the
fetchguard + drain-before-redispatch fix it must either complete or fall
back to the host front within the watchdog budget.

Usage: python tools/pe_probe.py [n_reads] [reps]
"""
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".jaxcache"))
os.environ.setdefault("BWAMEM_TPU_TIMERS", "1")

import faulthandler
import signal
faulthandler.register(signal.SIGUSR1, all_threads=True)  # kill -USR1 <pid>
faulthandler.dump_traceback_later(600, repeat=True)      # heartbeat stacks

import bench

n = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2

print(f"[pe_probe] ensuring data...", flush=True)
prefix, fa, fq = bench.ensure_data()

from bwamem_tpu.index import BwaIndex
from bwamem_tpu.io.fastq import read_fastx, interleave
from bwamem_tpu.pipeline.align import Aligner
from bwamem_tpu.utils import timers

idx = BwaIndex.load(prefix + ".ours")
pe_reads = list(interleave(read_fastx(prefix + ".pe_1.fq"),
                           read_fastx(prefix + ".pe_2.fq")))
batch = pe_reads[:n]
print(f"[pe_probe] {len(batch)} reads; creating aligner...", flush=True)
al = Aligner(idx)

for r in range(reps):
    timers.reset()
    t0 = time.perf_counter()
    sams = al.align_batch_pe(batch, 0)
    dt = time.perf_counter() - t0
    print(f"[pe_probe] rep {r}: {len(batch)} reads in {dt:.1f}s "
          f"= {len(batch) / dt:.0f} reads/s", flush=True)
    print(timers.report(), flush=True)
print("[pe_probe] DONE", flush=True)
