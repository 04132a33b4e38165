"""Shared-memory index staging (bwashm.c analog) + idx2mem blob format."""
import numpy as np
import pytest


@pytest.fixture()
def shm_dir(tmp_path, monkeypatch):
    d = tmp_path / "shm"
    monkeypatch.setattr("bwamem_tpu.index.shm.SHM_DIR", str(d))
    return d


def _assert_same(a, b):
    assert a.l_pac == b.l_pac and a.seq_len == b.seq_len
    assert a.primary == b.primary and a.sa_intv == b.sa_intv
    np.testing.assert_array_equal(a.L2, b.L2)
    np.testing.assert_array_equal(a.bwt_words, b.bwt_words)
    np.testing.assert_array_equal(a.occ, b.occ)
    np.testing.assert_array_equal(a.sa_samples, b.sa_samples)
    np.testing.assert_array_equal(a.pac, b.pac)
    assert [c.name for c in a.contigs] == [c.name for c in b.contigs]
    assert [c.offset for c in a.contigs] == [c.offset for c in b.contigs]
    assert len(a.ambs) == len(b.ambs)
    assert (a.kmer_table is None) == (b.kmer_table is None)
    if a.kmer_table is not None:
        for x, y in zip(a.kmer_table, b.kmer_table):
            np.testing.assert_array_equal(x, y)


def test_pack_unpack_roundtrip(built_index):
    """idx2mem/mem2idx analog: blob round-trip preserves everything."""
    from bwamem_tpu.index import shm
    blob = shm.pack_bytes(built_index)
    idx2 = shm.unpack(blob)
    _assert_same(built_index, idx2)


def test_stage_load_destroy(tiny_dataset, built_index, shm_dir):
    from bwamem_tpu.index import shm, load_index
    prefix = tiny_dataset["prefix"] + ".ours"
    assert not shm.test(prefix)
    assert shm.load_staged(prefix) is None
    shm.stage(prefix)
    assert shm.test(prefix)
    idx2 = shm.load_staged(prefix)
    _assert_same(built_index, idx2)
    # memory-mapped arrays must be usable read-only views
    assert idx2.bwt_words.base is not None
    # load_index prefers the staged copy
    idx3 = load_index(prefix)
    _assert_same(built_index, idx3)
    assert shm.list_staged() == [prefix.replace("%", "/")]
    assert shm.destroy(prefix) == 1
    assert not shm.test(prefix)


def test_staged_index_aligns(tiny_dataset, built_index, shm_dir):
    """A batch aligned from the shm-staged index is identical to one from
    the disk index (the arrays feed jnp.asarray; mmap views must work)."""
    from bwamem_tpu.config import MemOptions
    from bwamem_tpu.index import shm, load_index
    from bwamem_tpu.io.fastq import read_fastx
    from bwamem_tpu.pipeline.align import Aligner

    prefix = tiny_dataset["prefix"] + ".ours"
    shm.stage(prefix)
    idx2 = load_index(prefix)
    reads = []
    for r in read_fastx(tiny_dataset["fq"]):
        reads.append(r)
        if len(reads) >= 16:
            break
    a = Aligner(built_index, MemOptions()).align_batch_se(reads, 0)
    b = Aligner(idx2, MemOptions()).align_batch_se(reads, 0)
    assert a == b
