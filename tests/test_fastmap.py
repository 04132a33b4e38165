"""`fastmap` SMEM-dump parity: byte-identical output vs the reference
main_fastmap (fastmap.c:324-399) run through the CPU oracle.  (Round-1
verified this only manually; the fused-seeding rewrite later broke the
underlying scan wrappers without any test noticing — hence this file.)"""
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
        rc = cli.main(["fastmap"] + args)
    finally:
        sys.stdout = old
    assert rc == 0
    return buf.getvalue()


def test_fastmap_default(tiny_dataset, built_index):
    ref = subprocess.run(
        [str(ORACLE), "fastmap", tiny_dataset["prefix"],
         tiny_dataset["fq"]], capture_output=True, text=True, check=True)
    ours = _run_ours([tiny_dataset["prefix"] + ".ours", tiny_dataset["fq"]])
    assert ours == ref.stdout


def test_fastmap_flags(tiny_dataset, built_index):
    # -w widens the interval-width cutoff for printing positions, -l lowers
    # the min SMEM length, -i raises min interval size
    ref = subprocess.run(
        [str(ORACLE), "fastmap", "-w", "40", "-l", "10", "-i", "2",
         tiny_dataset["prefix"], tiny_dataset["fq"]],
        capture_output=True, text=True, check=True)
    ours = _run_ours(["-w", "40", "-l", "10", "-i", "2",
                      tiny_dataset["prefix"] + ".ours", tiny_dataset["fq"]])
    assert ours == ref.stdout
