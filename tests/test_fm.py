"""FM-index primitive tests: occ4 / extend / sa_lookup / ref access,
validated against brute-force string search and the raw suffix array."""
import numpy as np
import pytest

import bwamem_tpu  # noqa: F401  (enables x64)
import jax.numpy as jnp

from bwamem_tpu.index import build_index
from bwamem_tpu.index.build import suffix_array, pack_fasta
from bwamem_tpu.ops import fm as fmops


@pytest.fixture(scope="module")
def small(tmp_path_factory):
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).parent.parent / "tools"))
    import simdata
    d = tmp_path_factory.mktemp("fm")
    contigs = simdata.make_genome(30_000, seed=3, n_contigs=2)
    fa = str(d / "g.fa")
    simdata.write_fasta(contigs, fa)
    idx = build_index(fa)
    fwd, _, _ = pack_fasta(fa)
    both = np.concatenate([fwd, 3 - fwd[::-1]])
    sa = suffix_array(both)
    sa_full = np.empty(len(both) + 1, dtype=np.int64)
    sa_full[0] = len(both)
    sa_full[1:] = sa
    fm = fmops.to_device(fmops.fm_from_index(idx))
    return idx, fm, both, sa_full


def unpack_bwt(idx) -> np.ndarray:
    w = idx.bwt_words
    out = np.empty(len(w) * 16, dtype=np.uint8)
    for i in range(16):
        out[i::16] = (w >> ((15 - i) * 2)) & 3
    return out[: idx.seq_len]


def test_occ4_brute(small):
    idx, fm, both, sa_full = small
    B = unpack_bwt(idx)
    cum = np.zeros((len(B) + 1, 4), dtype=np.int64)
    for c in range(4):
        np.cumsum(B == c, out=cum[1:, c])
    rng = np.random.default_rng(0)
    ks = np.concatenate([rng.integers(0, idx.seq_len + 1, 300),
                         [-1, 0, idx.seq_len, idx.primary,
                          idx.primary - 1, idx.primary + 1]])
    got = np.asarray(fmops.occ4(fm, jnp.asarray(ks, dtype=fm.L2.dtype)))
    for k, row in zip(ks, got):
        if k == -1:
            assert (row == 0).all()
            continue
        kk = k - (k >= idx.primary)
        np.testing.assert_array_equal(row, cum[kk + 1], err_msg=f"k={k}")


def occurrences(both: np.ndarray, pat: np.ndarray) -> int:
    if len(pat) > len(both):
        return 0
    win = np.lib.stride_tricks.sliding_window_view(both, len(pat))
    return int((win == pat).all(axis=1).sum())


def test_backward_search_matches_brute(small):
    idx, fm, both, sa_full = small
    it = fm.L2.dtype
    rng = np.random.default_rng(1)
    for trial in range(20):
        plen = int(rng.integers(1, 18))
        if trial < 15:  # sample a real substring so matches exist
            p0 = int(rng.integers(0, len(both) - plen))
            pat = both[p0: p0 + plen].copy()
        else:
            pat = rng.integers(0, 4, plen).astype(np.uint8)
        x0, x1, x2 = fmops.set_intv(fm, jnp.asarray(pat[-1], dtype=jnp.int32))
        for c in pat[-2::-1]:
            n0, n1, ns = fmops.extend(fm, x0, x1, x2, is_back=True)
            x0, x1, x2 = n0[..., c], n1[..., c], ns[..., c]
            if int(x2) <= 0:
                break
        cnt = occurrences(both, pat)
        assert max(int(x2), 0) == cnt, f"pattern {pat}"
        if cnt:
            # every rank in [x0, x0+cnt) must start with pat
            for r in range(int(x0), int(x0) + cnt):
                s = sa_full[r]
                np.testing.assert_array_equal(both[s: s + plen], pat)


def test_forward_search_matches_brute(small):
    idx, fm, both, sa_full = small
    rng = np.random.default_rng(2)
    for _ in range(15):
        plen = int(rng.integers(2, 16))
        p0 = int(rng.integers(0, len(both) - plen))
        pat = both[p0: p0 + plen].copy()
        x0, x1, x2 = fmops.set_intv(fm, jnp.asarray(pat[0], dtype=jnp.int32))
        for c in pat[1:]:
            n0, n1, ns = fmops.extend(fm, x0, x1, x2, is_back=False)
            cc = 3 - int(c)
            x0, x1, x2 = n0[..., cc], n1[..., cc], ns[..., cc]
        cnt = occurrences(both, pat)
        assert int(x2) == cnt
        if cnt:
            for r in range(int(x0), int(x0) + cnt):
                s = sa_full[r]
                np.testing.assert_array_equal(both[s: s + plen], pat)
            # x1 is the rank interval of the reverse complement
            rc = (3 - pat)[::-1]
            for r in range(int(x1), int(x1) + cnt):
                s = sa_full[r]
                np.testing.assert_array_equal(both[s: s + plen], rc)


def test_sa_lookup(small):
    idx, fm, both, sa_full = small
    rng = np.random.default_rng(3)
    ks = rng.integers(0, idx.seq_len + 1, 500)
    got = np.asarray(fmops.sa_lookup(fm, jnp.asarray(ks, dtype=fm.L2.dtype)))
    np.testing.assert_array_equal(got, sa_full[ks])


def test_ref_base(small):
    idx, fm, both, sa_full = small
    rng = np.random.default_rng(4)
    pos = rng.integers(0, idx.seq_len, 300)
    got = np.asarray(fmops.ref_base(fm, jnp.asarray(pos, dtype=fm.L2.dtype)))
    np.testing.assert_array_equal(got, both[pos])


def test_pos2rid(small):
    idx, fm, both, sa_full = small
    offs = jnp.asarray(idx.contig_offsets())
    rng = np.random.default_rng(5)
    pos = rng.integers(0, idx.l_pac, 200)
    got = np.asarray(fmops.pos2rid(offs, jnp.asarray(pos)))
    expected = np.searchsorted(idx.contig_offsets(), pos, side="right") - 1
    np.testing.assert_array_equal(got, expected)
