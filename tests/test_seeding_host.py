"""Host-compacted interval collection (seeding_host.collect_intervals_host)
vs the oracle's 3-pass dump — at a scale that overflows the fused program's
initial compaction arenas, forcing the grow-and-retry path.

Regression for a silent-corruption bug: the device compaction CLAMPED
past-capacity lanes into the last slot instead of dropping them, and the
overflow flag was ignored, so large 250bp batches emitted garbage intervals
(spurious XS tags downstream)."""
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from bwamem_tpu.io.fastq import read_fastx

N_READS = 80


@pytest.fixture(scope="module")
def many250_fq(tmp_path_factory):
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    import simdata
    contigs = simdata.make_genome(200_000, seed=7, n_contigs=2)
    reads = simdata.sim_reads(contigs, N_READS, read_len=250, seed=44,
                              sub_rate=0.02, indel_rate=0.002)
    fq = str(tmp_path_factory.mktemp("ov250") / "ov250.fq")
    simdata.write_fastq(reads, fq)
    return fq


def test_interval_collection_overflow_retry(oracle, tiny_dataset,
                                            built_index, many250_fq):
    out = subprocess.run(
        [str(oracle), "smem", tiny_dataset["prefix"], many250_fq],
        capture_output=True, text=True, check=True)
    golden = {}
    for line in out.stdout.splitlines():
        f = line.split("\t")
        golden.setdefault(f[0], []).append(
            (int(f[1]), int(f[2]), int(f[3]), int(f[5])))

    from bwamem_tpu.io.fastq import pack_batch
    from bwamem_tpu.pipeline.align import Aligner, _bucket
    from bwamem_tpu.pipeline import seeding_host

    reads = list(read_fastx(many250_fq))
    al = Aligner(built_index)
    n = len(reads)
    N = _bucket(n, lo=8)
    L = _bucket(max(r.l_seq for r in reads), lo=32)
    seq, l_seq = pack_batch(reads, N, L)
    # tiny initial arenas: the first fused dispatch MUST overflow and the
    # grow-and-retry loop must converge to the exact interval set
    read_iv, s, e, x0, x2, over = seeding_host.collect_intervals_host(
        al, seq, l_seq, n, kmax0=1024, emax0=1024)
    assert not over.any()

    bad = []
    for i, r in enumerate(reads):
        sel = read_iv == i
        ours = sorted(zip(s[sel], e[sel], x0[sel], x2[sel]))
        want = sorted(golden.get(r.name, []))
        if [tuple(int(v) for v in t) for t in ours] != want:
            bad.append((r.name, ours, want))
    assert not bad, f"{len(bad)} reads differ; first: {bad[0]!r}"


def test_kmer_fast_start_exact(oracle, tiny_dataset, built_index,
                               many250_fq):
    """The k-mer-12 fast-start (index table consulted at pass-1 pivot 0 and
    every pass-3 restart) must leave the collected interval set EXACTLY
    unchanged vs the plain scans (reference table semantics:
    kmers_index/hashKMer.hpp:58-81, cuda/bwt_CUDA.cu:253-258)."""
    import dataclasses

    from bwamem_tpu.io.fastq import pack_batch, read_fastx
    from bwamem_tpu.pipeline.align import Aligner, _bucket
    from bwamem_tpu.pipeline import seeding_host

    assert built_index.kmer_table is not None
    reads = list(read_fastx(many250_fq))[:32]
    al = Aligner(built_index)
    assert al.fm.kmer is not None
    n = len(reads)
    N = _bucket(n, lo=8)
    L = _bucket(max(r.l_seq for r in reads), lo=32)
    seq, l_seq = pack_batch(reads, N, L)
    with_k = seeding_host.collect_intervals_host(al, seq, l_seq, n)
    al.opt = dataclasses.replace(al.opt, use_kmer_table=False)
    al._seed_arena_hist = {}
    without = seeding_host.collect_intervals_host(al, seq, l_seq, n)
    for a, b in zip(with_k, without):
        np.testing.assert_array_equal(a, b)
