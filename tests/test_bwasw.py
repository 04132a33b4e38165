"""BWA-SW long-read aligner parity: byte-identical SAM vs the reference
driver (bwtsw2_main.c:11 bwa_bwtsw2) run through the CPU oracle.

Covers the SE path (prefix-DAG × prefix-trie DP, chain filter, dedup,
multi-hit flagging, CIGAR/MD-free SAM emit of bwtsw2_aux.c) and the PE path
(pair inference + SW rescue of bwtsw2_pair.c), plus hard-clip and
multi-secondary flag variants."""
import subprocess

import pytest

from conftest import ORACLE

import sys
sys.path.insert(0, str(ORACLE.parent.parent))
import simdata


@pytest.fixture(scope="module")
def bwasw_data(tmp_path_factory, tiny_dataset, built_index):
    d = tmp_path_factory.mktemp("bwasw")
    contigs = simdata.make_genome(200_000, seed=7, n_contigs=2)  # same as
    # tiny_dataset (seeded), so the oracle/our indexes can be reused
    long_se = simdata.sim_reads(contigs, 24, read_len=500, seed=31,
                                sub_rate=0.02, indel_rate=0.002)
    fq = d / "lr.fq"
    simdata.write_fastq(long_se, str(fq))
    pairs = simdata.sim_reads(contigs, 32, read_len=300, seed=32,
                              sub_rate=0.02, indel_rate=0.001, paired=True,
                              insert_mean=700, insert_std=60)
    p1, p2 = d / "lr1.fq", d / "lr2.fq"
    simdata.write_fastq(pairs[0::2], str(p1))
    simdata.write_fastq(pairs[1::2], str(p2))
    return dict(fq=str(fq), p1=str(p1), p2=str(p2), d=d,
                oracle_prefix=tiny_dataset["prefix"],
                our_prefix=tiny_dataset["prefix"] + ".ours")


def _run_both(data, args, tag):
    ref = subprocess.run(
        [str(ORACLE), "bwasw", "-t1", *args, data["oracle_prefix"],
         data["fq"]], capture_output=True, text=True, check=True)
    import bwamem_tpu.cli as cli
    out = str(data["d"] / f"our_{tag}.sam")
    rc = cli.main(["bwasw", "-f", out, "-t1", *args, data["our_prefix"],
                   data["fq"]])
    assert rc == 0
    assert open(out).read() == ref.stdout


def test_bwasw_se_identical(bwasw_data):
    _run_both(bwasw_data, [], "se")


def test_bwasw_hardclip_multi(bwasw_data):
    _run_both(bwasw_data, ["-H", "-M"], "hm")


def test_bwasw_pe_identical(bwasw_data):
    data = bwasw_data
    ref = subprocess.run(
        [str(ORACLE), "bwasw", "-t1", data["oracle_prefix"], data["p1"],
         data["p2"]], capture_output=True, text=True, check=True)
    import bwamem_tpu.cli as cli
    out = str(data["d"] / "our_pe.sam")
    rc = cli.main(["bwasw", "-f", out, "-t1", data["our_prefix"],
                   data["p1"], data["p2"]])
    assert rc == 0
    ours = open(out).read()
    assert ours == ref.stdout
    # pairing must actually engage (flag 0x2 proper pairs present)
    assert any(int(l.split("\t")[1]) & 0x2
               for l in ours.splitlines() if not l.startswith("@")), \
        "no proper pairs; PE path untested"
