"""Legacy aln/samse/sampe parity: byte-identical .sai and SAM vs the
reference driver (bwtaln.c / bwase.c / bwape.c) run through the CPU oracle.

The PE dataset deliberately includes indel reads (gapped hits exercise
bwa_refine_gapped) and heavily-mutated mates that `aln` cannot place but
the mate-rescue SW can (bwa_paired_sw MATESW path)."""
import subprocess

import numpy as np
import pytest

from conftest import ORACLE

import sys
sys.path.insert(0, str(ORACLE.parent.parent))
import simdata


@pytest.fixture(scope="module")
def legacy_data(tmp_path_factory, tiny_dataset, built_index):
    d = tmp_path_factory.mktemp("legacy")
    contigs = simdata.make_genome(200_000, seed=7, n_contigs=2)  # same as
    # tiny_dataset (seeded), so the oracle/our indexes can be reused
    rng = np.random.default_rng(99)
    reads = simdata.sim_reads(contigs, 240, read_len=101, seed=21,
                              sub_rate=0.01, indel_rate=0.002, paired=True,
                              insert_mean=300, insert_std=30)
    # mate-rescue bait: read2 mutated beyond aln's max_diff but SW-alignable
    bait = simdata.sim_reads(contigs, 40, read_len=101, seed=22,
                             sub_rate=0.0, indel_rate=0.0, paired=True,
                             insert_mean=300, insert_std=30)
    for i in range(1, len(bait), 2):
        n, s, q = bait[i]
        arr = bytearray(s.encode())
        for p in rng.choice(len(arr), 10, replace=False):
            arr[p] = ord("ACGT"[rng.integers(0, 4)])
        bait[i] = (n, arr.decode(), q)
    reads += bait
    r1 = d / "l1.fq"
    r2 = d / "l2.fq"
    with open(r1, "w") as f1, open(r2, "w") as f2:
        for i in range(0, len(reads), 2):
            n, s, q = reads[i]
            f1.write(f"@{n}/1\n{s}\n+\n{q}\n")
            n, s, q = reads[i + 1]
            f2.write(f"@{n}/2\n{s}\n+\n{q}\n")
    return dict(r1=str(r1), r2=str(r2), d=d,
                oracle_prefix=tiny_dataset["prefix"],
                our_prefix=tiny_dataset["prefix"] + ".ours")


def _our_cli(args):
    import bwamem_tpu.cli as cli
    rc = cli.main(args)
    assert rc == 0


def test_aln_sai_identical(legacy_data):
    ld = legacy_data
    for fq, tag in ((ld["r1"], "1"), (ld["r2"], "2")):
        ref_sai = str(ld["d"] / f"ref{tag}.sai")
        our_sai = str(ld["d"] / f"our{tag}.sai")
        with open(ref_sai, "wb") as f:
            subprocess.run([str(ORACLE), "aln", ld["oracle_prefix"], fq],
                           stdout=f, stderr=subprocess.DEVNULL, check=True)
        _our_cli(["aln", "-f", our_sai, ld["our_prefix"], fq])
        assert open(ref_sai, "rb").read() == open(our_sai, "rb").read(), \
            f"sai {tag} differs"


def test_samse_identical(legacy_data):
    ld = legacy_data
    sai = str(ld["d"] / "our1.sai")
    ref = subprocess.run(
        [str(ORACLE), "samse", ld["oracle_prefix"], sai, ld["r1"]],
        capture_output=True, text=True, check=True)
    our_sam = str(ld["d"] / "our_se.sam")
    _our_cli(["samse", "-f", our_sam, ld["our_prefix"], sai, ld["r1"]])
    assert open(our_sam).read() == ref.stdout


def test_samse_multi_hits(legacy_data):
    """-n 10: XA multi-hit listing paths."""
    ld = legacy_data
    sai = str(ld["d"] / "our2.sai")
    ref = subprocess.run(
        [str(ORACLE), "samse", "-n", "10", ld["oracle_prefix"], sai,
         ld["r2"]], capture_output=True, text=True, check=True)
    our_sam = str(ld["d"] / "our_se_n10.sam")
    _our_cli(["samse", "-f", our_sam, "-n", "10", ld["our_prefix"], sai,
              ld["r2"]])
    assert open(our_sam).read() == ref.stdout


def test_sampe_identical(legacy_data):
    ld = legacy_data
    sai1 = str(ld["d"] / "our1.sai")
    sai2 = str(ld["d"] / "our2.sai")
    ref = subprocess.run(
        [str(ORACLE), "sampe", ld["oracle_prefix"], sai1, sai2, ld["r1"],
         ld["r2"]], capture_output=True, text=True, check=True)
    our_sam = str(ld["d"] / "our_pe.sam")
    _our_cli(["sampe", "-f", our_sam, ld["our_prefix"], sai1, sai2,
              ld["r1"], ld["r2"]])
    ours = open(our_sam).read()
    assert ours == ref.stdout
    # the bait mates must actually exercise the rescue path
    assert any("\tXT:A:M" in line for line in ours.splitlines()), \
        "no MATESW records; rescue path untested"
