"""Two-round extension debug on the ladder repeat genome."""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("BWAMEM_TPU_JAX_CACHE", "0")
import jax

jax.config.update("jax_platforms", "cpu")

from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))
sys.path.insert(0, str(REPO / "tests"))

import simdata
from test_ladder import make_repeat_genome
from bwamem_tpu.index import build_index
from bwamem_tpu.io.fastq import read_fastx
from bwamem_tpu.pipeline.align import Aligner
from bwamem_tpu.pipeline import device_front

d = REPO / ".testdata" / "ext2dbg"
d.mkdir(parents=True, exist_ok=True)
fa = str(d / "g.fa")
fq = str(d / "se.fq")
if not os.path.exists(fq):
    contigs = make_repeat_genome(1_000_000, seed=11)
    simdata.write_fasta(contigs, fa)
    se = simdata.sim_reads(contigs, 300, read_len=101, seed=12)
    simdata.write_fastq(se, fq)
idx = build_index(fa, with_kmer_table=True)
reads = list(read_fastx(fq))


def regs_for(ext2: str):
    os.environ["BWAMEM_TPU_EXT2"] = ext2
    al = Aligner(idx)
    from bwamem_tpu.pipeline.align import _bucket, _lbucket, pack_batch
    n = len(reads)
    N = _bucket(n, lo=8)
    L = _lbucket(max(r.l_seq for r in reads))
    seq, l_seq = pack_batch(reads, N, L)
    out, fb = device_front.front_ext(al, reads, seq, l_seq)
    return out, fb


r1, f1 = regs_for("0")
r2, f2 = regs_for("1")
print("fallback sets:", sorted(f1), "vs", sorted(f2))
nbad = 0
for i in range(len(reads)):
    if i in f1 or i in f2:
        continue
    a, b = r1[i], r2[i]
    key = lambda rr: [(x.rb, x.re, x.qb, x.qe, x.score, x.truesc, x.w,
                       x.seedcov, x.rid) for x in rr]
    if key(a) != key(b):
        nbad += 1
        if nbad <= 3:
            print(f"read {i}: single-round {key(a)}")
            print(f"          two-round   {key(b)}")
print("diff reads:", nbad, "/", len(reads))
