"""Microbenchmark of the extension kernel on REAL work items.

Captures the actual _ExtBatcher.run calls of one bench batch (by
monkeypatching), then replays each captured device call with proper
blocking to measure per-dispatch and per-row cost.

Usage: python tools/ext_micro.py [n_reads]
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    import jax
    import numpy as np
    from bwamem_tpu.index import BwaIndex
    from bwamem_tpu.io.fastq import read_fastx
    from bwamem_tpu.pipeline.align import Aligner
    from bwamem_tpu.pipeline import extend_host

    idx = BwaIndex.load(str(REPO / ".benchdata" / "g5000000.ours"))
    al = Aligner(idx)
    reads = []
    for i, r in enumerate(read_fastx(str(REPO / ".benchdata"
                                         / "g5000000.fq"))):
        if i >= n:
            break
        reads.append(r)

    cache = REPO / ".benchdata" / f"extcalls_{n}.npz"
    calls = []
    orig = extend_host._ExtBatcher.run
    if cache.exists():
        z = np.load(cache, allow_pickle=True)
        n_calls = int(z["n_calls"])
        for k in range(n_calls):
            a = tuple(z[f"c{k}_{j}"] for j in range(9))
            eb = int(z[f"c{k}_eb"])
            b = extend_host._ExtBatcher(al.opt, al.opt.mat, eb, al.fm.pac,
                                        al.l_pac, None)
            import jax.numpy as jnp
            b.seq_dev = jnp.asarray(z[f"c{k}_seq"])
            calls.append((b, a))
        print(f"loaded {n_calls} captured calls")
    else:
        def capture(self, *a):
            calls.append((self, a))
            return orig(self, *a)

        extend_host._ExtBatcher.run = capture
        t0 = time.perf_counter()
        al.align_batch_se(reads, 0)
        print(f"batch total {time.perf_counter()-t0:.1f}s, "
              f"{len(calls)} batcher.run calls")
        extend_host._ExtBatcher.run = orig
        save = {"n_calls": len(calls)}
        for k, (self_, a) in enumerate(calls):
            for j, arr in enumerate(a):
                save[f"c{k}_{j}"] = np.asarray(arr)
            save[f"c{k}_eb"] = self_.end_bonus
            save[f"c{k}_seq"] = np.asarray(self_.seq_dev)
        np.savez(cache, **save)

    # replay: time each run with blocking
    tot = 0.0
    for k, (self, a) in enumerate(calls):
        M = len(a[3])
        orig(self, *a)          # warm (compiled already)
        t0 = time.perf_counter()
        out = orig(self, *a)
        dt = time.perf_counter() - t0
        tot += dt
        tl = a[6]
        print(f"call {k}: M={M:6d} tlen_max={int(np.max(tl)) if M else 0:5d} "
              f"{dt*1e3:8.1f} ms")
    print(f"extension device total ~{tot:.2f}s for {n} reads")


if __name__ == "__main__":
    main()
