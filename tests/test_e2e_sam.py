"""End-to-end SAM parity: the TPU pipeline's SAM records must be
bit-identical to CPU bwa mem (upstream 0.7.17 via the oracle) on the tiny
synthetic dataset — BASELINE.md acceptance config 1 scaled down."""
import itertools
import subprocess

import pytest

from bwamem_tpu.io.fastq import read_fastx

N_READS = 64


@pytest.fixture(scope="module")
def oracle_sam(oracle, tiny_dataset, tmp_path_factory):
    fq = tmp_path_factory.mktemp("e2e") / "sub.fq"
    reads = []
    with open(tiny_dataset["fq"]) as f:
        lines = f.readlines()
    with open(fq, "w") as f:
        f.writelines(lines[: 4 * N_READS])
    out = subprocess.run(
        [str(oracle), "mem", "-t", "1", tiny_dataset["prefix"], str(fq)],
        capture_output=True, text=True, check=True)
    recs = [l for l in out.stdout.splitlines() if not l.startswith("@")]
    by_read: dict[str, list[str]] = {}
    for l in recs:
        by_read.setdefault(l.split("\t", 1)[0], []).append(l)
    return by_read


def test_sam_matches_cpu_bwa(oracle_sam, tiny_dataset, built_index):
    from bwamem_tpu.pipeline.align import Aligner
    reads = list(itertools.islice(read_fastx(tiny_dataset["fq"]), N_READS))
    al = Aligner(built_index)
    got = al.align_batch_se(reads, 0)
    n_bad = 0
    first = None
    for r, sam in zip(reads, got):
        want = oracle_sam.get(r.name, [])
        have = [l for l in sam.rstrip("\n").split("\n") if l]
        if want != have:
            n_bad += 1
            if first is None:
                first = (r.name, want, have)
    assert n_bad == 0, (
        f"{n_bad}/{len(reads)} reads differ; first: {first!r}")


def test_align_stream_matches_batched(tiny_dataset, built_index):
    """The dispatch-ahead stream driver must equal serial align_batch_se
    calls batch-for-batch, including the n_processed hash-tiebreak offsets
    (the -K determinism contract, fastmap.c:111,304)."""
    from bwamem_tpu.pipeline.align import Aligner, align_stream
    reads = list(itertools.islice(read_fastx(tiny_dataset["fq"]), 48))
    al = Aligner(built_index)
    B = 16
    batches = [reads[i: i + B] for i in range(0, len(reads), B)]
    want = []
    off = 0
    for b in batches:
        want.extend(al.align_batch_se(b, off))
        off += len(b)
    got = []
    for n, sams in align_stream(al, iter(batches)):
        assert n == B
        got.extend(sams)
    assert got == want
