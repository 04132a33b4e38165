#!/usr/bin/env python
"""Large-genome scale proof (BASELINE.md acceptance configs 2-4 scaled to
what this box can synthesize offline): build a >=100 Mbp index, align a
read panel end-to-end, byte-diff a subsample against the CPU oracle, and
record build time + artifact/HBM footprints against the reference's
budget table (SURVEY.md §6: GRCh38 index ~3.2 GB + 402 MB k-mer table in
12 GB VRAM, cuda/streams.cu:16-104).

Usage: python tools/big_bench.py [--mbp 100] [--reads 20000] [--no-tpu]
Writes one JSON line to stdout; artifacts cached under .benchdata/.
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

# persistent executable cache + arena-hwm history (same location bench.py
# uses) — without it every attempt at a giga-scale shape recompiles and
# re-walks the arena growth from cold defaults
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".jaxcache"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mbp", type=int, default=100)
    ap.add_argument("--reads", type=int, default=20_000)
    ap.add_argument("--read-len", type=int, default=101)
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--diff-reads", type=int, default=2000,
                    help="oracle byte-diff subsample size")
    ap.add_argument("--build-only", action="store_true",
                    help="stop after the CPU-side artifacts (index build, "
                    "oracle index + baseline) so the chip phases can run "
                    "later without re-paying the build")
    args = ap.parse_args()

    import simdata
    G = args.mbp * 1_000_000
    d = REPO / ".benchdata"
    d.mkdir(exist_ok=True)
    prefix = str(d / f"big{args.mbp}M")
    fa, fq = prefix + ".fa", prefix + ".fq"
    out = {"genome_bp": G}

    if not os.path.exists(fq):
        t0 = time.perf_counter()
        contigs = simdata.make_genome(G, seed=101, n_contigs=4)
        simdata.write_fasta(contigs, fa)
        reads = simdata.sim_reads(contigs, args.reads,
                                  read_len=args.read_len, seed=102)
        simdata.write_fastq(reads, fq)
        out["gen_secs"] = round(time.perf_counter() - t0, 1)

    from bwamem_tpu.index import BwaIndex, build_index
    if not os.path.exists(prefix + ".ours.bt.npz"):
        t0 = time.perf_counter()
        idx = build_index(fa, with_kmer_table=True)
        out["index_build_secs"] = round(time.perf_counter() - t0, 1)
        idx.save(prefix + ".ours")
    idx = BwaIndex.load(prefix + ".ours")
    out["itype"] = str(idx.itype.__name__) if hasattr(idx.itype, "__name__") \
        else str(idx.itype)

    # footprints: host artifact bytes and the device-resident FM pytree
    from bwamem_tpu.ops import fm as fmops
    fmh = fmops.fm_from_index(idx)
    import numpy as np
    dev_bytes = sum(a.nbytes for a in [fmh.cmb, fmh.sa, fmh.pac] +
                    ([fmh.kmer] if fmh.kmer is not None else []))
    out["fm_hbm_bytes"] = int(dev_bytes)
    out["fm_hbm_gb"] = round(dev_bytes / 2**30, 3)

    # oracle single-thread baseline on the same panel
    oracle = REPO / "tools" / "oracle" / "bwa_oracle"
    if not oracle.exists():
        subprocess.run(["make", "-C", str(oracle.parent)], check=True,
                       capture_output=True)
    if not os.path.exists(prefix + ".sa"):
        t0 = time.perf_counter()
        subprocess.run([str(oracle), "index", fa, prefix], check=True,
                       capture_output=True)
        out["oracle_index_secs"] = round(time.perf_counter() - t0, 1)
    bl = Path(prefix + ".cpu_baseline.json")
    if bl.exists():
        base = json.loads(bl.read_text())["reads_per_sec"]
    else:
        t0 = time.perf_counter()
        subprocess.run([str(oracle), "mem", "-t", "1", prefix, fq],
                       check=True, stdout=subprocess.DEVNULL,
                       stderr=subprocess.DEVNULL)
        dt = time.perf_counter() - t0
        base = args.reads / dt
        bl.write_text(json.dumps({"reads_per_sec": base, "seconds": dt}))
    out["cpu_t1_reads_per_sec"] = round(base, 1)
    if args.build_only:
        print(json.dumps(out))
        return

    # exactness subsample: our SAM vs oracle, byte-identical requirement
    from bwamem_tpu.io.fastq import read_fastx, batches
    from bwamem_tpu.pipeline.align import Aligner, align_stream
    reads = list(read_fastx(fq))
    al = Aligner(idx)
    nd = min(args.diff_reads, len(reads))
    got = []
    done = 0
    for i in range(0, nd, args.batch):
        b = reads[i: i + args.batch]
        got.extend(al.align_batch_se(b, done))
        done += len(b)
    o = subprocess.run([str(oracle), "mem", "-t", "1", prefix, fq],
                       capture_output=True, text=True, check=True)
    want_by = {}
    for l in o.stdout.splitlines():
        if not l.startswith("@"):
            want_by.setdefault(l.split("\t", 1)[0], []).append(l)
    n_bad = 0
    for r, s in zip(reads[:nd], got):
        have = [l for l in s.rstrip("\n").split("\n") if l]
        if want_by.get(r.name, []) != have:
            n_bad += 1
    out["diff_reads"] = nd
    out["diff_mismatches"] = n_bad

    # throughput: steady-state stream over the full panel
    reads = reads[: (len(reads) // args.batch) * args.batch]
    done = 0
    for b in batches(iter(reads), args.batch):   # warmup compile pass
        al.align_batch_se(b, done)
        done += len(b)
    t0 = time.perf_counter()
    done = 0
    for n, _s in align_stream(al, batches(iter(reads), args.batch)):
        done += n
    dt = time.perf_counter() - t0
    out["reads_per_sec"] = round(done / dt, 1)
    out["vs_baseline"] = round(out["reads_per_sec"] / base, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
