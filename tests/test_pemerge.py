"""pemerge parity: byte-identical merged/unmerged FASTQ + counters vs the
reference main_pemerge (pemerge.c:217-291) run through the CPU oracle."""
import io
import subprocess

import numpy as np
import pytest

from conftest import ORACLE, _ensure_oracle as ensure_oracle

import sys
sys.path.insert(0, str(ORACLE.parent.parent))
import simdata


@pytest.fixture(scope="module")
def pem_data(tmp_path_factory):
    d = tmp_path_factory.mktemp("pemerge")
    contigs = simdata.make_genome(200_000, seed=7, n_contigs=2)
    # short inserts => real overlaps; mix in long inserts => unmergeable
    reads = simdata.sim_reads(contigs, 600, read_len=100, seed=8,
                              sub_rate=0.01, indel_rate=0.0, paired=True,
                              insert_mean=150, insert_std=15)
    reads += simdata.sim_reads(contigs, 200, read_len=100, seed=9,
                               sub_rate=0.01, indel_rate=0.0, paired=True,
                               insert_mean=420, insert_std=30)
    # varied quals so the consensus max/abs-diff/sum-of-errors paths run
    rng = np.random.default_rng(11)
    reads = [(n, s, "".join(chr(33 + q) for q in
                            rng.integers(2, 41, len(s))))
             for n, s, q in reads]
    r1 = d / "r1.fq"
    r2 = d / "r2.fq"
    with open(r1, "w") as f1, open(r2, "w") as f2:
        for i in range(0, len(reads), 2):
            n, s, q = reads[i]
            f1.write(f"@{n}/1\n{s}\n+\n{q}\n")
            n, s, q = reads[i + 1]
            f2.write(f"@{n}/2\n{s}\n+\n{q}\n")
    return str(r1), str(r2)


def _run_ours(args):
    import bwamem_tpu.cli as cli
    import sys
    out, err = io.StringIO(), io.StringIO()
    so, se = sys.stdout, sys.stderr
    sys.stdout, sys.stderr = out, err
    try:
        rc = cli.main(["pemerge"] + args)
    finally:
        sys.stdout, sys.stderr = so, se
    assert rc == 0
    return out.getvalue(), err.getvalue()


def test_pemerge_identical(pem_data):
    ensure_oracle()
    r1, r2 = pem_data
    ref = subprocess.run([str(ORACLE), "pemerge", r1, r2],
                         capture_output=True, text=True, check=True)
    got_out, got_err = _run_ours([r1, r2])
    assert got_out == ref.stdout
    assert got_err == ref.stderr
    assert "successful merges" in got_err
    # the dataset must actually exercise both paths
    n_merged = int(got_err.splitlines()[0].split()[0])
    assert n_merged > 100


def test_pemerge_merged_only_flag(pem_data):
    ensure_oracle()
    r1, r2 = pem_data
    ref = subprocess.run([str(ORACLE), "pemerge", "-m", "-T", "20", r1, r2],
                         capture_output=True, text=True, check=True)
    got_out, got_err = _run_ours(["-m", "-T", "20", r1, r2])
    assert got_out == ref.stdout
    assert got_err == ref.stderr
