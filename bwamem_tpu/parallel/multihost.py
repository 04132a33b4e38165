"""Multi-host distribution: chunk-sharded alignment over jax.distributed.

SURVEY §5.8/§7-step-9 green-field design (the reference is single-host,
single-GPU; its only cross-read sync points are per-chunk PE statistics,
bwamem.c:1236-1239, and ordered SAM output, cuda/minibatch_process.cpp:
160-162).

Work unit: the ``-K`` chunk — the read batch one ``mem_process_seqs`` call
handles.  Chunks are dealt round-robin to hosts (chunk c → host c mod P)
and every host replays the SAME ``n_processed`` offsets the single-host
run would use, so hash_64 tiebreaks (bwamem.c:534-537) are unchanged.
Because the reference computes PE insert statistics PER CHUNK, chunk-
aligned sharding is communication-free: no pestat collective is needed for
bit-identical output — each host's chunks carry exactly the stats the
single-host run would compute for them.  The one remaining global step is
the ordered merge of per-host SAM shards, done by rank 0 (or any reader)
from the per-chunk shard index.

jax.distributed wires the hosts together so each sees its local chips
inside the global device set; per-host meshes (parallel/mesh.py) then
shard each chunk over local chips exactly as in the single-host path.
DCN never carries alignment data — only the coordination-service handshake
(and, if a future global-stats mode wants it, a pestat all-gather).
"""
from __future__ import annotations

import os
import struct
from dataclasses import dataclass
from typing import Iterator

MAGIC = b"BWSH1\n"


def init_from_env(coordinator: str | None = None,
                  num_processes: int | None = None,
                  process_id: int | None = None) -> tuple[int, int]:
    """jax.distributed.initialize from args or the standard env vars
    (BWAMEM_COORDINATOR / BWAMEM_NUM_PROCESSES / BWAMEM_PROCESS_ID, falling
    back to JAX's own).  Returns (process_id, num_processes); (0, 1) and no
    init when unconfigured (single-host)."""
    coordinator = coordinator or os.environ.get("BWAMEM_COORDINATOR")
    num_processes = num_processes if num_processes is not None else \
        int(os.environ.get("BWAMEM_NUM_PROCESSES", "0") or 0)
    process_id = process_id if process_id is not None else \
        int(os.environ.get("BWAMEM_PROCESS_ID", "-1") or -1)
    if not coordinator or num_processes <= 1:
        return 0, 1
    import jax
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    return process_id, num_processes


def shard_chunks(batch_iter, process_id: int, num_processes: int,
                 pe: bool = False) -> Iterator[tuple[int, int, list]]:
    """Deal chunks round-robin; yields (chunk_idx, n_processed, batch) for
    this host's chunks only.  n_processed counts ALL reads in preceding
    chunks (including other hosts') — the determinism offset the reference
    threads through mem_process_seqs (fastmap.c:304, n_processed)."""
    n_processed = 0
    for c, batch in enumerate(batch_iter):
        if c % num_processes == process_id:
            yield c, n_processed, batch
        n_processed += len(batch)


@dataclass
class ShardWriter:
    """Per-host SAM shard: length-prefixed (chunk_idx, sam-bytes) records.
    Self-describing, so the merge needs no sidecar index."""
    path: str

    def __post_init__(self):
        self._f = open(self.path, "wb")
        self._f.write(MAGIC)

    def add_chunk(self, chunk_idx: int, sam_text: str) -> None:
        data = sam_text.encode()
        self._f.write(struct.pack("<qq", chunk_idx, len(data)))
        self._f.write(data)

    def close(self) -> None:
        self._f.close()


def read_shard(path: str) -> Iterator[tuple[int, bytes]]:
    with open(path, "rb") as f:
        if f.read(len(MAGIC)) != MAGIC:
            raise ValueError(f"{path}: not a bwamem shard file")
        while True:
            hdr = f.read(16)
            if not hdr:
                return
            c, n = struct.unpack("<qq", hdr)
            yield c, f.read(n)


def merge_shards(shard_paths: list[str], out) -> int:
    """Ordered merge: interleave per-chunk records by chunk index (the
    reference's ordered minibatch writer).  Returns chunks written."""
    heads = []
    iters = []
    for p in shard_paths:
        it = read_shard(p)
        iters.append(it)
        heads.append(next(it, None))
    written = 0
    expect = 0
    while any(h is not None for h in heads):
        for i, h in enumerate(heads):
            if h is not None and h[0] == expect:
                out.write(h[1])
                heads[i] = next(iters[i], None)
                written += 1
                expect += 1
                break
        else:
            missing = expect
            raise ValueError(f"shard merge: chunk {missing} missing "
                             f"(heads: {[h and h[0] for h in heads]})")
    return written


def align_shard(al, batch_iter, *, process_id: int, num_processes: int,
                shard_path: str, pe: bool = False,
                rg_id: str | None = None) -> int:
    """Drive this host's chunks through the local Aligner and write the
    SAM shard.  Returns reads aligned on this host."""
    from bwamem_tpu.pipeline.align import align_stream

    chunks = list(shard_chunks(batch_iter, process_id, num_processes,
                               pe=pe))
    w = ShardWriter(shard_path)
    done = 0
    try:
        # align_stream pipelines within this host; chunk offsets are
        # replayed explicitly per chunk (they are not contiguous here)
        for (cidx, n_proc, batch) in chunks:
            if pe:
                sams = al.align_batch_pe(batch, n_proc, rg_id=rg_id)
            else:
                sams = al.align_batch_se(batch, n_proc, rg_id=rg_id)
            w.add_chunk(cidx, "".join(sams))
            done += len(batch)
    finally:
        w.close()
    return done
