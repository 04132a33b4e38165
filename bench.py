#!/usr/bin/env python
"""End-to-end alignment benchmark — one JSON line to stdout.

Metric: reads/sec aligning synthetic 101bp single-end Illumina-like reads
against a synthetic 5Mbp genome (the E. coli-scale config of BASELINE.md's
acceptance ladder), end-to-end (device seeding/chaining/extension + host
finalization + SAM text), steady-state after one warmup batch.

vs_baseline: ratio against the CPU reference implementation (upstream
bwa-mem 0.7.17 compiled from the read-only reference checkout as
tools/oracle/bwa_oracle, single thread) on the same input — the practical
speed anchor per BASELINE.md (the reference GPU snapshot cannot produce an
end-to-end number).
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      str(REPO / ".jaxcache"))

GENOME = 5_000_000
N_READS = 20_000
READ_LEN = 101
BATCH = 8192


def ensure_data():
    import simdata
    d = REPO / ".benchdata"
    d.mkdir(exist_ok=True)
    prefix = d / f"g{GENOME}"
    fa, fq = str(prefix) + ".fa", str(prefix) + ".fq"
    import numpy as np
    rebuild = True
    if os.path.exists(str(prefix) + ".ours.bt.npz"):
        import json
        with np.load(str(prefix) + ".ours.bt.npz") as z:
            meta = json.loads(bytes(z["meta"]).decode())
            # rebuilt when the k-mer table or the dense runtime SA samples
            # (build.runtime_sa_interval) are missing
            rebuild = "kmer_x0" not in z or meta.get("sa_intv", 32) > 4     # rebuilt once to add the table
    if rebuild:
        if not os.path.exists(fa):
            contigs = simdata.make_genome(GENOME, seed=42, n_contigs=1)
            simdata.write_fasta(contigs, fa)
            reads = simdata.sim_reads(contigs, N_READS, read_len=READ_LEN,
                                      seed=43)
            simdata.write_fastq(reads, fq)
        from bwamem_tpu.index import build_index
        idx = build_index(fa, with_kmer_table=True)
        idx.save(str(prefix) + ".ours")
    return str(prefix), fa, fq


def cpu_baseline(prefix: str, fa: str, fq: str, threads: int = 1) -> float:
    """reads/s of CPU bwa mem -t `threads` on the same input (cached).
    -t 1 is the correctness-era anchor; -t nproc is the practical speed
    anchor per BASELINE.md (the reference GPU has no end-to-end number)."""
    cache = Path(prefix + (".cpu_baseline.json" if threads == 1 else
                           f".cpu_baseline_t{threads}.json"))
    if cache.exists():
        return json.loads(cache.read_text())["reads_per_sec"]
    oracle = REPO / "tools" / "oracle" / "bwa_oracle"
    if not oracle.exists():
        subprocess.run(["make", "-C", str(oracle.parent)], check=True,
                       capture_output=True)
    if not os.path.exists(prefix + ".sa"):
        subprocess.run([str(oracle), "index", fa, prefix], check=True,
                       capture_output=True)
    t0 = time.perf_counter()
    subprocess.run([str(oracle), "mem", "-t", str(threads), prefix, fq],
                   check=True, stdout=subprocess.DEVNULL,
                   stderr=subprocess.DEVNULL)
    dt = time.perf_counter() - t0
    rps = N_READS / dt
    cache.write_text(json.dumps({"reads_per_sec": rps, "seconds": dt,
                                 "threads": threads}))
    return rps


def main():
    prefix, fa, fq = ensure_data()
    base_rps = cpu_baseline(prefix, fa, fq)

    from bwamem_tpu.index import BwaIndex
    from bwamem_tpu.io.fastq import read_fastx, batches
    from bwamem_tpu.pipeline.align import Aligner, align_stream

    idx = BwaIndex.load(prefix + ".ours")
    reads = list(read_fastx(fq))
    # uniform batches: a ragged tail batch would compile a whole second
    # shape family inside the timed region (no persistent executable cache
    # on this PJRT backend)
    reads = reads[: (len(reads) // BATCH) * BATCH]
    al = Aligner(idx)

    # warmup / compile over the full set once: shape buckets are coarse but
    # data-dependent, and this backend cannot cache executables across
    # processes, so the warmup must visit every shape the timed pass sees
    done = 0
    for b in batches(iter(reads), BATCH):
        al.align_batch_se(b, done)
        done += len(b)

    from bwamem_tpu.utils import timers
    timers.reset()
    t0 = time.perf_counter()
    done = 0
    n_sam = 0
    for n, out in align_stream(al, batches(iter(reads), BATCH)):
        n_sam += sum(len(s) for s in out)
        done += n
    dt = time.perf_counter() - t0
    rps = done / dt
    if timers.enabled():
        print("=== timers (steady-state stream) ===\n" + timers.report(),
              file=sys.stderr)

    # per-stage breakdown of one steady-state batch → CSV beside the data
    # (the reference's perf_profile.txt, cuda/superbatch_process.cpp:11)
    sys.path.insert(0, str(REPO / "tools"))
    from profile_batch import profile_phases
    ph = profile_phases(al, reads[:BATCH], reps=1, warmup=False)
    csv = Path(prefix + ".perf_profile.csv")
    cols = sorted(ph)
    csv.write_text("batch," + ",".join(c + "(ms)" for c in cols) + "\n" +
                   f"{BATCH}," + ",".join(f"{1e3 * ph[c]:.1f}"
                                          for c in cols) + "\n")

    nthreads = os.cpu_count() or 1
    base_tn = (cpu_baseline(prefix, fa, fq, nthreads) if nthreads > 1
               else base_rps)
    print(json.dumps({
        "metric": "reads_per_sec_se_101bp_5Mbp",
        "value": round(rps, 2),
        "unit": "reads/s",
        "vs_baseline": round(rps / base_rps, 3),
        "vs_cpu_tN": round(rps / base_tn, 3),
        "cpu_threads_N": nthreads,
        "stage_ms": {c: round(1e3 * ph[c], 1) for c in cols},
    }))


if __name__ == "__main__":
    main()
