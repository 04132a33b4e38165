#!/usr/bin/env python
"""Serial SE batch probe: reads/s at a given batch size on the live chip.
The backend charges fixed per-op costs (~0.3 ms/gather) regardless of
rows, so larger batches amortize the front chain — this measures how far.
Usage: se_probe.py [batch_rows] [reps]
"""
import faulthandler
import os
import signal
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".jaxcache"))
os.environ.setdefault("BWAMEM_TPU_TIMERS", "1")
faulthandler.register(signal.SIGUSR1, all_threads=True)
faulthandler.dump_traceback_later(900, repeat=True)

import bench

n = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

prefix, fa, fq = bench.ensure_data()
from bwamem_tpu.index import BwaIndex
from bwamem_tpu.io.fastq import read_fastx
from bwamem_tpu.pipeline.align import Aligner
from bwamem_tpu.utils import timers

idx = BwaIndex.load(prefix + ".ours")
reads = list(read_fastx(fq))[:n]
print(f"[se_probe] {len(reads)} reads/batch", flush=True)
al = Aligner(idx)
for r in range(reps):
    timers.reset()
    t0 = time.perf_counter()
    al.align_batch_se(reads, 0)
    dt = time.perf_counter() - t0
    print(f"[se_probe] rep {r}: {len(reads)} reads in {dt:.1f}s "
          f"= {len(reads) / dt:.0f} reads/s", flush=True)
    if r == reps - 1:
        print(timers.report(), flush=True)
print("[se_probe] DONE", flush=True)
