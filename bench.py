#!/usr/bin/env python
"""End-to-end alignment benchmark — incremental JSON lines to stdout.

Metric: reads/sec aligning synthetic 101bp single-end Illumina-like reads
against a synthetic 5Mbp genome (the E. coli-scale config of BASELINE.md's
acceptance ladder), end-to-end (device seeding/chaining/extension + host
finalization + SAM text), steady-state after one warmup pass.

vs_baseline: ratio against the CPU reference implementation (upstream
bwa-mem 0.7.17 compiled from the read-only reference checkout as
tools/oracle/bwa_oracle, single thread) on the same input — the practical
speed anchor per BASELINE.md (the reference GPU snapshot cannot produce an
end-to-end number).

Hang-proofing (round-4 lesson: one wedged device fetch nulled every
number): the CUMULATIVE result dict is re-printed as one JSON line after
EVERY phase, so whatever line is last when the driver's timeout fires is
the most complete measurement; each device phase runs on a watchdogged
worker thread (the blocking PJRT calls release the GIL) and a phase that
times out or raises is skipped — later numbers stay null, earlier ones
survive.  The reference's analog is per-kernel timing printed to stderr
as it happens (cuda/bwamem_GPU.cu:3503-3510).
"""
from __future__ import annotations

import faulthandler
import json
import os
import signal
import subprocess
import sys
import threading
import time
from pathlib import Path

faulthandler.register(signal.SIGUSR1, all_threads=True)  # live stack dump

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      str(REPO / ".jaxcache"))

GENOME = 5_000_000
N_READS = 20_000
READ_LEN = 101
BATCH = 8192
PE_PAIRS = 8192          # 150bp PE panel (the BASELINE.json metric shape)
PE_LEN = 150

RESULT: dict = {
    "metric": "reads_per_sec_se_101bp_5Mbp",
    "value": None,
    "unit": "reads/s",
    "vs_baseline": None,
}
_dead_device = False     # a device phase timed out: skip later device work


def emit():
    """Print the cumulative result as ONE JSON line (and mirror it to a
    partial-results file) — called after every phase."""
    line = json.dumps(RESULT)
    print(line, flush=True)
    try:
        (REPO / "BENCH_partial.json").write_text(line + "\n")
    except Exception:
        pass


def phase(name: str, fn, timeout: float):
    """Run fn() on a watchdogged worker thread.  Returns (value, ok).
    On timeout the worker is abandoned (daemon) and every later device
    phase is skipped — the device stream is no longer trustworthy."""
    global _dead_device
    if _dead_device:
        print(f"[bench] SKIP {name}: device suspect", file=sys.stderr,
              flush=True)
        return None, False
    box: dict = {}

    def work():
        try:
            box["v"] = fn()
        except BaseException as e:
            box["e"] = e

    t0 = time.perf_counter()
    t = threading.Thread(target=work, daemon=True, name=f"bench:{name}")
    t.start()
    t.join(timeout)
    if t.is_alive():
        _dead_device = True
        print(f"[bench] TIMEOUT in {name} after {timeout:.0f}s — "
              f"abandoning phase; later device phases skipped",
              file=sys.stderr, flush=True)
        return None, False
    if "e" in box:
        print(f"[bench] ERROR in {name}: {type(box['e']).__name__}: "
              f"{box['e']}", file=sys.stderr, flush=True)
        return None, False
    print(f"[bench] {name} done ({time.perf_counter() - t0:.0f}s)",
          file=sys.stderr, flush=True)
    return box.get("v"), True


def ensure_data():
    import simdata
    d = REPO / ".benchdata"
    d.mkdir(exist_ok=True)
    prefix = d / f"g{GENOME}"
    fa, fq = str(prefix) + ".fa", str(prefix) + ".fq"
    import numpy as np
    rebuild = True
    if os.path.exists(str(prefix) + ".ours.bt.npz"):
        with np.load(str(prefix) + ".ours.bt.npz") as z:
            meta = json.loads(bytes(z["meta"]).decode())
            # rebuilt when the k-mer table or the dense runtime SA samples
            # (build.runtime_sa_interval) are missing
            rebuild = "kmer_x0" not in z or meta.get("sa_intv", 32) > 4
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
    fq1, fq2 = str(prefix) + ".pe_1.fq", str(prefix) + ".pe_2.fq"
    if not os.path.exists(fq2):
        contigs = simdata.make_genome(GENOME, seed=42, n_contigs=1)
        pr = simdata.sim_reads(contigs, 2 * PE_PAIRS, read_len=PE_LEN,
                               seed=44, paired=True)
        simdata.write_fastq(pr[0::2], fq1)
        simdata.write_fastq(pr[1::2], fq2)
    return str(prefix), fa, fq


def cpu_baseline(prefix: str, fa: str, fq: str, threads: int = 1,
                 fq2: str | None = None, n_reads: int = N_READS,
                 tag: str = "") -> float:
    """reads/s of CPU bwa mem -t `threads` on the same input (cached).
    -t 1 is the correctness-era anchor; -t nproc is the practical speed
    anchor per BASELINE.md (the reference GPU has no end-to-end number)."""
    cache = Path(prefix + (f".cpu_baseline{tag}.json" if threads == 1 else
                           f".cpu_baseline{tag}_t{threads}.json"))
    if cache.exists():
        return json.loads(cache.read_text())["reads_per_sec"]
    oracle = REPO / "tools" / "oracle" / "bwa_oracle"
    if not oracle.exists():
        subprocess.run(["make", "-C", str(oracle.parent)], check=True,
                       capture_output=True)
    if not os.path.exists(prefix + ".sa"):
        subprocess.run([str(oracle), "index", fa, prefix], check=True,
                       capture_output=True)
    cmd = [str(oracle), "mem", "-t", str(threads), prefix, fq]
    if fq2:
        cmd.append(fq2)
    t0 = time.perf_counter()
    subprocess.run(cmd, check=True, stdout=subprocess.DEVNULL,
                   stderr=subprocess.DEVNULL)
    dt = time.perf_counter() - t0
    rps = n_reads / dt
    cache.write_text(json.dumps({"reads_per_sec": rps, "seconds": dt,
                                 "threads": threads}))
    return rps


def main():
    prefix, fa, fq = ensure_data()
    base_rps = cpu_baseline(prefix, fa, fq)

    from bwamem_tpu.index import BwaIndex
    from bwamem_tpu.io.fastq import read_fastx, batches, interleave
    from bwamem_tpu.pipeline.align import Aligner, align_stream
    from bwamem_tpu.utils import timers

    idx = BwaIndex.load(prefix + ".ours")
    reads = list(read_fastx(fq))
    # uniform batches: a ragged tail batch would compile a whole second
    # shape family inside the timed region (no persistent executable cache
    # on this PJRT backend)
    reads = reads[: (len(reads) // BATCH) * BATCH]
    al = Aligner(idx)

    # ---- SE warmup (compiles; must visit every shape the timed pass sees)
    def se_warmup():
        done = 0
        t_w = time.perf_counter()
        for b in batches(iter(reads), BATCH):
            al.align_batch_se(b, done)
            done += len(b)
            print(f"[bench] SE warmup {done}/{len(reads)} "
                  f"({time.perf_counter() - t_w:.0f}s)", file=sys.stderr,
                  flush=True)
    phase("se.warmup", se_warmup, 2400)

    # ---- SE steady-state stream (the headline number) ----
    def se_stream():
        timers.reset()
        t0 = time.perf_counter()
        done = 0
        for n, out in align_stream(al, batches(iter(reads), BATCH)):
            done += n
        return done / (time.perf_counter() - t0)
    rps, ok = phase("se.stream", se_stream, 1200)
    if ok:
        nthreads = os.cpu_count() or 1
        base_tn = (cpu_baseline(prefix, fa, fq, nthreads) if nthreads > 1
                   else base_rps)
        RESULT["value"] = round(rps, 2)
        RESULT["vs_baseline"] = round(rps / base_rps, 3)
        RESULT["vs_cpu_tN"] = round(rps / base_tn, 3)
        RESULT["cpu_threads_N"] = nthreads
    emit()                       # SE number survives anything after this

    # ---- SE per-stage breakdown of one steady-state batch → CSV ----
    def se_profile():
        from profile_batch import profile_phases
        ph = profile_phases(al, reads[:BATCH], reps=1, warmup=False)
        csv = Path(prefix + ".perf_profile.csv")
        tcols = sorted(k for k in ph if not k.endswith((".count", ".MB")))
        csv.write_text(
            "batch," + ",".join(c + "(ms)" for c in tcols) + "\n"
            + f"{BATCH}," + ",".join(f"{1e3 * ph[c]:.1f}"
                                     for c in tcols) + "\n")
        return ph
    ph, ok = phase("se.profile", se_profile, 600)
    if ok:
        tcols = sorted(k for k in ph if not k.endswith((".count", ".MB")))
        counts = {k: ph[k] for k in ph if k.endswith(".count")}
        RESULT["stage_ms"] = {c: round(1e3 * ph[c], 1) for c in tcols}
        RESULT["dispatches_per_batch"] = counts
        RESULT["d2h_mb_per_batch"] = {k: round(ph[k], 2) for k in ph
                                      if k.endswith(".MB")}
        # speculative-extension waste: device lanes extended vs items
        # surviving the exact chain filter + skip/accept replay
        ei = counts.get("ext.items.count")
        ea = counts.get("ext.accepted.count")
        RESULT["spec_ext_waste"] = (round(ei / ea, 2) if ei and ea
                                    else None)
    emit()

    # ---- chip-gated Mosaic parity: the extension-kernel oracle corpus
    # through the real Mosaic lowering on this device vs the XLA path ----
    def pallas_parity():
        import jax
        if jax.default_backend() == "cpu":
            return None
        sys.path.insert(0, str(REPO / "tests"))
        from test_extend import gen_cases, run_batch
        from test_pallas_ext import run_batch_pl
        cases = gen_cases(0, 200)
        return run_batch(cases) == run_batch_pl(cases, interpret=False)
    pallas_ok, ok = phase("pallas.parity", pallas_parity, 600)
    RESULT["pallas_on_chip"] = (pallas_ok if ok else
                                "error-or-timeout: see stderr")
    emit()

    # ---- PE benchmark (the BASELINE.json metric shape: 150bp PE) ----
    fq1, fq2 = prefix + ".pe_1.fq", prefix + ".pe_2.fq"
    pe_base = cpu_baseline(prefix, fa, fq1, fq2=fq2,
                           n_reads=2 * PE_PAIRS, tag="_pe150")
    pe_reads = list(interleave(read_fastx(fq1), read_fastx(fq2)))
    pe_reads = pe_reads[: (len(pe_reads) // BATCH) * BATCH]

    def pe_warmup():
        done = 0
        t_w = time.perf_counter()
        for b in batches(iter(pe_reads), BATCH):
            al.align_batch_pe(b, done)
            done += len(b)
            print(f"[bench] PE warmup {done}/{len(pe_reads)} "
                  f"({time.perf_counter() - t_w:.0f}s)", file=sys.stderr,
                  flush=True)
    phase("pe.warmup", pe_warmup, 2400)

    def pe_stream():
        t0 = time.perf_counter()
        done = 0
        for n, out in align_stream(al, batches(iter(pe_reads), BATCH),
                                   pe=True):
            done += n
        return done / (time.perf_counter() - t0)
    pe_rps, ok = phase("pe.stream", pe_stream, 1200)
    if ok:
        RESULT["pe"] = {
            "metric": "reads_per_sec_pe_150bp_5Mbp",
            "value": round(pe_rps, 2),
            "vs_baseline": round(pe_rps / pe_base, 3),
        }
    emit()

    # ---- PE per-stage breakdown of one steady-state batch ----
    def pe_profile():
        timers.enable()
        timers.reset()
        t0 = time.perf_counter()
        al.align_batch_pe(pe_reads[:BATCH], 0)
        total = time.perf_counter() - t0
        snap = timers.snapshot()
        timers.enable(False)
        stage = {k: round(1e3 * v[1], 1) for k, v in snap.items()
                 if not k.endswith((".bytes", ".count")) and k != "counts"}
        stage["total"] = round(1e3 * total, 1)
        return stage, {k: snap[k] for k in snap if k.endswith(".count")}
    prof, ok = phase("pe.profile", pe_profile, 600)
    if ok and isinstance(RESULT.get("pe"), dict):
        RESULT["pe"]["stage_ms"], RESULT["pe"]["counts"] = prof
    emit()


if __name__ == "__main__":
    main()
