"""Chaining parity: expand_seeds + chain_seeds + chain_weights +
filter_chains must reproduce the oracle's post-filter chain dump
(mem_chain → mem_chain_flt) exactly: same chains, same weights, same seed
lists, same frac_rep."""
import subprocess

import numpy as np
import pytest

import bwamem_tpu  # noqa: F401
import jax.numpy as jnp

from bwamem_tpu.ops import fm as fmops
from bwamem_tpu.ops import smem as smemops
from bwamem_tpu.ops import chain as chainops
from tests.test_smem import encode_reads


@pytest.fixture(scope="module")
def setup(tiny_dataset, oracle, built_index):
    prefix, fq = tiny_dataset["prefix"], tiny_dataset["fq"]
    idx = built_index
    fm = fmops.to_device(fmops.fm_from_index(idx))
    names, seqs = [], []
    with open(fq) as f:
        lines = f.read().splitlines()
    for i in range(0, len(lines), 4):
        names.append(lines[i][1:].split()[0])
        seqs.append(lines[i + 1])
    out = subprocess.run([str(oracle), "chains", prefix, fq],
                         capture_output=True, text=True, check=True)
    golden = {}
    for line in out.stdout.splitlines():
        f_ = line.split("\t")
        name, ci, rid, w, n, frac = f_[0], int(f_[1]), int(f_[2]), int(f_[3]), int(f_[4]), float(f_[5])
        seeds = [tuple(int(v) for v in s.split(",")) for s in f_[6:]]
        golden.setdefault(name, []).append((rid, w, n, frac, seeds))
    return idx, fm, names, seqs, golden


def run_chains(idx, fm, seqs, pad_to=101):
    from bwamem_tpu.pipeline.seedchain import seed_and_chain_opts
    from bwamem_tpu.config import MemOptions
    seq, l_seq = encode_reads(seqs, pad_to)
    offs = jnp.asarray(idx.contig_offsets(), dtype=fm.L2.dtype)
    res = seed_and_chain_opts(fm, offs, jnp.asarray(idx.is_alt_flags()),
                              jnp.asarray(seq), jnp.asarray(l_seq),
                              MemOptions())
    return res.seeds, res.chains, res.weights, res.filtered, np.asarray(l_seq)


def extract_read(sd, ch, wt, fl, r, l_seq):
    """Final chain list for read r in the oracle's output format."""
    out = []
    order = np.asarray(fl.order[r])
    kept = np.asarray(fl.kept[r])
    w = np.asarray(fl.w[r])
    n_f = int(fl.n[r])
    seed_chain = np.asarray(ch.seed_chain[r])
    frac = float(sd.frac_rep[r]) / l_seq
    for p in range(n_f):
        if kept[p] == 0:
            continue
        c = order[p]
        slots = np.flatnonzero(seed_chain == c)
        seeds = [(int(sd.rbeg[r, s]), int(sd.qbeg[r, s]), int(sd.len[r, s]))
                 for s in slots]
        out.append((int(ch.rid[r, c]), int(w[p]), len(seeds),
                    round(frac, 6), seeds))
    return out


def test_chains_match_oracle(setup):
    idx, fm, names, seqs, golden = setup
    n = 100
    sd, ch, wt, fl, l_seq = run_chains(idx, fm, seqs[:n])
    assert not np.asarray(sd.overflow[:n]).any()
    assert not np.asarray(ch.overflow[:n]).any()
    mism = []
    for r in range(n):
        got = extract_read(sd, ch, wt, fl, r, int(l_seq[r]))
        want = [(rid, w, nn, round(frac, 6), seeds)
                for rid, w, nn, frac, seeds in golden.get(names[r], [])]
        if got != want:
            mism.append((names[r], want, got))
    assert not mism, f"{len(mism)} reads mismatch; first: {mism[0]}"


def test_chains_repetitive_reads(setup, oracle, tiny_dataset, tmp_path):
    """Reads from the planted-repeat regions stress occurrence sampling and
    multi-chain filtering."""
    idx, fm, names, seqs, golden = setup
    # build reads straight from repeated genome segments
    from bwamem_tpu.index.build import parse_fasta
    contigs = {n: s.decode() for n, _, s in
               ((na, co, sq) for na, co, sq in parse_fasta(tiny_dataset["fa"]))}
    chr1 = contigs["chr1"]
    cases = []
    for off in range(0, 3000, 157):
        cases.append(chr1[off:off + 101])
    fq = tmp_path / "rep.fq"
    with open(fq, "w") as f:
        for i, s in enumerate(cases):
            f.write(f"@rep{i}\n{s}\n+\n{'I' * len(s)}\n")
    out = subprocess.run([str(oracle), "chains", tiny_dataset["prefix"], str(fq)],
                         capture_output=True, text=True, check=True)
    want = {}
    for line in out.stdout.splitlines():
        f_ = line.split("\t")
        seeds = [tuple(int(v) for v in s.split(",")) for s in f_[6:]]
        want.setdefault(f_[0], []).append(
            (int(f_[2]), int(f_[3]), int(f_[4]), round(float(f_[5]), 6), seeds))
    sd, ch, wt, fl, l_seq = run_chains(idx, fm, cases)
    for r in range(len(cases)):
        got = extract_read(sd, ch, wt, fl, r, int(l_seq[r]))
        assert got == want.get(f"rep{r}", []), f"read rep{r}"
