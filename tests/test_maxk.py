"""`maxk` parity: the max-exact-match-length histogram must be byte-identical
to the reference main_maxk (maxk.c:12-67) run through the CPU oracle."""
import io
import subprocess
import sys

from conftest import ORACLE


def _run_ours(args):
    import bwamem_tpu.cli as cli
    buf = io.StringIO()
    old = sys.stdout
    sys.stdout = buf
    try:
        rc = cli.main(["maxk"] + args)
    finally:
        sys.stdout = old
    assert rc == 0
    return buf.getvalue()


def test_maxk_reads(tiny_dataset, built_index):
    # main_maxk takes the .bwt file path (bwt_restore_bwt, maxk.c:31)
    ref = subprocess.run(
        [str(ORACLE), "maxk", tiny_dataset["prefix"] + ".bwt",
         tiny_dataset["fq"]],
        capture_output=True, text=True, check=True)
    ours = _run_ours([tiny_dataset["prefix"] + ".ours", tiny_dataset["fq"]])
    assert ours == ref.stdout


def test_maxk_self(tiny_dataset, built_index, tmp_path):
    # -s: min_intv=2 self-comparison mode on a FASTA slice of the genome
    with open(tiny_dataset["fa"]) as f:
        f.readline()
        seq = "".join(f.readline().strip() for _ in range(40))
    fa = tmp_path / "slice.fa"
    fa.write_text(f">slice\n{seq[:2400]}\n")
    ref = subprocess.run(
        [str(ORACLE), "maxk", "-s", tiny_dataset["prefix"] + ".bwt",
         str(fa)],
        capture_output=True, text=True, check=True)
    ours = _run_ours(["-s", tiny_dataset["prefix"] + ".ours", str(fa)])
    assert ours == ref.stdout
