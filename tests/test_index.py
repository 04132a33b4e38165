"""Index construction golden tests: our NumPy builder must reproduce the
reference `bwa index` output files bit-for-bit (same FASTA → same
.pac/.ann/.amb/.bwt/.sa), per SURVEY.md §7 build step 1."""
import filecmp

import numpy as np
import pytest

from bwamem_tpu.index import build_index, BwaIndex


@pytest.fixture(scope="module")
def built(tiny_dataset, tmp_path_factory):
    idx = build_index(tiny_dataset["fa"], with_kmer_table=True)
    out = tmp_path_factory.mktemp("idx") / "ours"
    idx.save_reference_format(str(out))
    return idx, str(out), tiny_dataset["prefix"]


@pytest.mark.parametrize("ext", [".pac", ".ann", ".amb", ".bwt", ".sa"])
def test_reference_files_bit_identical(built, ext):
    _, ours, theirs = built
    assert filecmp.cmp(ours + ext, theirs + ext, shallow=False), \
        f"{ext} differs from reference bwa index output"


def test_load_reference_format_roundtrip(built):
    idx, ours, theirs = built
    loaded = BwaIndex.load_reference_format(theirs)
    assert loaded.primary == idx.primary
    assert loaded.seq_len == idx.seq_len
    assert loaded.l_pac == idx.l_pac
    np.testing.assert_array_equal(loaded.L2, idx.L2)
    np.testing.assert_array_equal(loaded.bwt_words, idx.bwt_words)
    np.testing.assert_array_equal(loaded.occ, idx.occ)
    # the FILE is always stride-32 (reference parity); our runtime samples
    # may be denser (build.runtime_sa_interval)
    assert loaded.sa_intv == 32
    np.testing.assert_array_equal(
        loaded.sa_samples, idx.sa_samples[:: 32 // idx.sa_intv])
    np.testing.assert_array_equal(loaded.pac, idx.pac)
    assert [c.name for c in loaded.contigs] == [c.name for c in idx.contigs]


def test_npz_roundtrip(built, tmp_path):
    idx, _, _ = built
    idx.save(str(tmp_path / "x"))
    l2 = BwaIndex.load(str(tmp_path / "x"))
    np.testing.assert_array_equal(l2.bwt_words, idx.bwt_words)
    np.testing.assert_array_equal(l2.sa_samples, idx.sa_samples)
    assert l2.kmer_table is not None
    np.testing.assert_array_equal(l2.kmer_table[2], idx.kmer_table[2])


def test_suffix_array_brute_force():
    from bwamem_tpu.index.build import suffix_array
    rng = np.random.default_rng(0)
    t = rng.integers(0, 4, size=200).astype(np.uint8)
    sa = suffix_array(t)
    suf = [bytes(t[i:]) for i in range(len(t))]
    expected = sorted(range(len(t)), key=lambda i: suf[i])
    np.testing.assert_array_equal(sa, expected)


def test_kmer_table_counts(built):
    idx, _, _ = built
    x0, x1, size = idx.kmer_table
    # total k-mer occurrences = seq_len - (K-1)*... both strands minus edges
    assert size.sum() == idx.seq_len - 12 + 1
    # size symmetric under reverse complement
    k = 12
    digits = np.arange(4 ** k, dtype=np.int64)
    rc = np.zeros(4 ** k, dtype=np.int64)
    d = digits.copy()
    for _ in range(k):
        rc = rc * 4 + (3 - d % 4)
        d //= 4
    np.testing.assert_array_equal(size, size[rc])


def test_sais_matches_prefix_doubling():
    """Native SA-IS must agree with the NumPy prefix-doubling builder
    (both under the implicit smallest-sentinel contract)."""
    import numpy as np
    from bwamem_tpu.index import native
    from bwamem_tpu.index import build as bld
    if not native.available():
        import pytest
        pytest.skip("no C compiler")
    rng = np.random.default_rng(11)
    for n in (1, 2, 7, 200, 1000):
        t = rng.integers(0, 4, n).astype(np.uint8)
        want = sorted(range(n), key=lambda i: list(map(int, t[i:])) + [-1])
        assert list(native.suffix_array_sais(t)) == want
    # repetitive text (hard case for naive sorts)
    t = np.tile(np.array([0, 1, 0, 1, 2], np.uint8), 8000)
    a = native.suffix_array_sais(t)
    # verify suffix order pairwise on a sample
    idx = rng.integers(0, len(t) - 1, 200)
    for k in idx:
        i, j = int(a[k]), int(a[k + 1])
        ti = list(map(int, t[i:])) + [-1]
        tj = list(map(int, t[j:])) + [-1]
        assert ti < tj


def test_index_micro_commands(tiny_dataset, tmp_path):
    """fa2pac → pac2bwt → bwtupdate → fa2pac -f → bwt2sa composes to the
    exact `bwa index` file family (bwa_idx_build, bwtindex.c:255-323) —
    validating each micro-command (main.c:105-109) byte-for-byte."""
    from bwamem_tpu.cli import main as cli_main
    p = str(tmp_path / "mc")
    fa = tiny_dataset["fa"]
    assert cli_main(["fa2pac", fa, p]) == 0
    assert cli_main(["pac2bwt", p + ".pac", p + ".bwt"]) == 0
    assert cli_main(["bwtupdate", p + ".bwt"]) == 0
    assert cli_main(["fa2pac", "-f", fa, p]) == 0
    assert cli_main(["bwt2sa", "-i", "32", p + ".bwt", p + ".sa"]) == 0
    for ext in (".pac", ".ann", ".amb", ".bwt", ".sa"):
        assert filecmp.cmp(p + ext, tiny_dataset["prefix"] + ext,
                           shallow=False), ext
