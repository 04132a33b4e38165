"""Multi-host distribution tests (SURVEY §5.8 / §7 step 9).

The design (parallel/multihost.py) shards work by -K chunk, round-robin
over hosts, replaying the single-host n_processed offsets — PE insert
stats are chunk-local in the reference (bwamem.c:1236-1239), so the merged
multi-host output must be BYTE-identical to the single-host run.

Two layers:
  * in-process "2 hosts" simulation (SE and PE): exercises shard_chunks /
    ShardWriter / merge_shards and the offset replay with zero subprocess
    cost;
  * a real 2-process jax.distributed run on CPU: exercises
    init_from_env → jax.distributed.initialize coordination, one process
    per rank, then the ordered merge.
"""
import io
import os
import socket
import subprocess
import sys
import textwrap
from pathlib import Path

import pytest

from bwamem_tpu.io.fastq import read_fastx, interleave
from bwamem_tpu.parallel import multihost

REPO = Path(__file__).resolve().parent.parent


def _single_host(al, reads, chunk, pe):
    out = []
    n_proc = 0
    for i in range(0, len(reads), chunk):
        b = reads[i: i + chunk]
        out.append("".join(al.align_batch_pe(b, n_proc) if pe
                           else al.align_batch_se(b, n_proc)))
        n_proc += len(b)
    return "".join(out)


def _batches(reads, chunk):
    for i in range(0, len(reads), chunk):
        yield reads[i: i + chunk]


@pytest.fixture(scope="module")
def mh_pe_reads(tiny_dataset, tmp_path_factory):
    sys.path.insert(0, str(REPO / "tools"))
    import simdata
    contigs = simdata.make_genome(200_000, seed=7, n_contigs=2)
    reads = simdata.sim_reads(contigs, 64, read_len=101, seed=33,
                              paired=True)
    d = tmp_path_factory.mktemp("mh_pe")
    fq1, fq2 = str(d / "r1.fq"), str(d / "r2.fq")
    simdata.write_fastq(reads[0::2], fq1)
    simdata.write_fastq(reads[1::2], fq2)
    return list(interleave(read_fastx(fq1), read_fastx(fq2)))


@pytest.mark.parametrize("pe", [False, True])
def test_multihost_inprocess_identical(tiny_dataset, built_index, tmp_path,
                                       mh_pe_reads, pe):
    from bwamem_tpu.pipeline.align import Aligner
    al = Aligner(built_index)
    if pe:
        reads = mh_pe_reads
        chunk = 16
    else:
        reads = list(read_fastx(tiny_dataset["fq"]))[:96]
        chunk = 24
    want = _single_host(al, reads, chunk, pe)

    paths = []
    for rank in range(2):
        p = str(tmp_path / f"shard{rank}.{'pe' if pe else 'se'}")
        multihost.align_shard(al, _batches(reads, chunk), process_id=rank,
                              num_processes=2, shard_path=p, pe=pe)
        paths.append(p)
    buf = io.BytesIO()
    n = multihost.merge_shards(paths, buf)
    assert n == (len(reads) + chunk - 1) // chunk
    assert buf.getvalue().decode() == want


def test_shard_roundrobin_offsets():
    batches = [[0] * 5, [1] * 3, [2] * 4, [3] * 2]
    got0 = [(c, n, len(b)) for c, n, b in
            multihost.shard_chunks(iter(batches), 0, 2)]
    got1 = [(c, n, len(b)) for c, n, b in
            multihost.shard_chunks(iter(batches), 1, 2)]
    assert got0 == [(0, 0, 5), (2, 8, 4)]
    assert got1 == [(1, 5, 3), (3, 12, 2)]


WORKER = textwrap.dedent("""
    import os, sys
    sys.path.insert(0, {repo!r})
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["BWAMEM_TPU_JAX_CACHE"] = "0"
    import jax
    jax.config.update("jax_platforms", "cpu")
    from bwamem_tpu.parallel import multihost
    pid, nproc = multihost.init_from_env()
    assert nproc == 2, nproc
    assert jax.process_count() == 2
    from bwamem_tpu.index import BwaIndex
    from bwamem_tpu.io.fastq import read_fastx
    from bwamem_tpu.pipeline.align import Aligner
    idx = BwaIndex.load({prefix!r})
    al = Aligner(idx)
    reads = list(read_fastx({fq!r}))[:48]
    def batches():
        for i in range(0, len(reads), 16):
            yield reads[i : i + 16]
    multihost.align_shard(al, batches(), process_id=pid,
                          num_processes=nproc,
                          shard_path={out!r} + str(pid))
""")


@pytest.mark.skipif(
    os.environ.get("BWAMEM_TPU_SKIP_SPAWN") == "1",
    reason="2-process jax.distributed spawn skipped by request "
           "(BWAMEM_TPU_SKIP_SPAWN=1): ~4 min of the suite; the in-process "
           "multihost tests above cover the sharded-merge semantics")
def test_multihost_two_process_cpu(tiny_dataset, built_index, tmp_path):
    """Real jax.distributed over 2 CPU processes: both ranks initialize
    against a local coordinator, align their chunks, and the merged shards
    equal the single-host output byte-for-byte."""
    from bwamem_tpu.pipeline.align import Aligner
    reads = list(read_fastx(tiny_dataset["fq"]))[:48]
    al = Aligner(built_index)
    want = _single_host(al, reads, 16, pe=False)

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    out = str(tmp_path / "shard")
    script = WORKER.format(repo=str(REPO),
                           prefix=tiny_dataset["prefix"] + ".ours",
                           fq=tiny_dataset["fq"], out=out)
    procs = []
    for rank in range(2):
        env = dict(os.environ,
                   BWAMEM_COORDINATOR=f"localhost:{port}",
                   BWAMEM_NUM_PROCESSES="2",
                   BWAMEM_PROCESS_ID=str(rank))
        procs.append(subprocess.Popen([sys.executable, "-c", script],
                                      env=env, stdout=subprocess.PIPE,
                                      stderr=subprocess.PIPE))
    errs = []
    for rank, p in enumerate(procs):
        try:
            _, err = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        if p.returncode != 0:
            errs.append(f"rank {rank} rc={p.returncode}:\n"
                        + err.decode()[-3000:])
    assert not errs, "\n".join(errs)
    buf = io.BytesIO()
    n = multihost.merge_shards([out + "0", out + "1"], buf)
    assert n == 3
    assert buf.getvalue().decode() == want
