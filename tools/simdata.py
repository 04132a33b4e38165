"""Synthetic genome + read simulator for tests and benchmarks.

No network access is available in the build environment, so all test data is
simulated: a random (or repeat-seeded) genome FASTA and Illumina-like reads
sampled from it with substitution/indel errors.  Mirrors the role of the
reference's test datasets (E. coli + SRR fastq slices, reference
Makefile:129-136) without shipping real data.
"""
from __future__ import annotations

import argparse
import numpy as np

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)
COMP = {ord("A"): "T", ord("C"): "G", ord("G"): "C", ord("T"): "A", ord("N"): "N"}
for _b, _c in list(COMP.items()):
    COMP[ord(chr(_b).lower())] = _c  # tolerate lowercase reference bases


def make_genome(length: int, seed: int = 0, n_contigs: int = 2,
                repeat_frac: float = 0.1, n_frac: float = 0.001) -> dict[str, str]:
    """Random genome with some internal repeats and N runs (exercises the
    ambiguous-base and repetitive-seed paths)."""
    rng = np.random.default_rng(seed)
    contigs = {}
    sizes = rng.multinomial(length, np.ones(n_contigs) / n_contigs)
    for ci, sz in enumerate(sizes):
        arr = BASES[rng.integers(0, 4, size=sz)]
        # plant repeats: copy random segments elsewhere
        n_rep = int(sz * repeat_frac) // 500
        for _ in range(n_rep):
            if sz < 2000:
                break
            src = rng.integers(0, sz - 500)
            dst = rng.integers(0, sz - 500)
            arr[dst:dst + 500] = arr[src:src + 500]
        # plant N runs
        n_runs = max(0, int(sz * n_frac) // 20)
        for _ in range(n_runs):
            if sz < 100:
                break
            p = rng.integers(0, sz - 20)
            arr[p:p + 20] = ord("N")
        contigs[f"chr{ci + 1}"] = arr.tobytes().decode()
    return contigs


def revcomp(s: str) -> str:
    return "".join(COMP[ord(c)] for c in reversed(s))


def sim_reads(contigs: dict[str, str], n_reads: int, read_len: int = 100,
              seed: int = 1, sub_rate: float = 0.01, indel_rate: float = 0.0005,
              paired: bool = False, insert_mean: int = 400, insert_std: int = 40):
    """Sample reads uniformly; returns list of (name, seq, qual) tuples
    (or interleaved pairs when paired)."""
    rng = np.random.default_rng(seed)
    names = list(contigs)
    lens = np.array([len(contigs[n]) for n in names], dtype=np.float64)
    probs = lens / lens.sum()
    out = []

    def mutate(s: str) -> str:
        arr = bytearray(s.encode())
        i = 0
        res = bytearray()
        while i < len(arr):
            r = rng.random()
            if r < indel_rate:  # deletion
                i += 1
                continue
            if r < 2 * indel_rate:  # insertion
                res.append(BASES[rng.integers(0, 4)])
            b = arr[i]
            if rng.random() < sub_rate and b != ord("N"):
                b = BASES[rng.integers(0, 4)]
            res.append(b)
            i += 1
        s2 = res.decode()
        if len(s2) < len(s):
            s2 = s2 + "".join(chr(BASES[rng.integers(0, 4)]) for _ in range(len(s) - len(s2)))
        return s2[:len(s)]

    for ri in range(n_reads if not paired else n_reads // 2):
        ci = rng.choice(len(names), p=probs)
        ref = contigs[names[ci]]
        if paired:
            ins = max(read_len + 10, int(rng.normal(insert_mean, insert_std)))
            if len(ref) <= ins + 2:
                ins = len(ref) - 2
            pos = int(rng.integers(0, max(1, len(ref) - ins)))
            frag = ref[pos:pos + ins]
            r1, r2 = frag[:read_len], revcomp(frag[-read_len:])
            if rng.random() < 0.5:
                r1, r2 = revcomp(frag[-read_len:]), frag[:read_len]
                r1, r2 = r2, r1  # keep FR orientation, random which end is first
            q = "I" * read_len
            out.append((f"rd{ri}", mutate(r1), q))
            out.append((f"rd{ri}", mutate(r2), q))
        else:
            pos = int(rng.integers(0, max(1, len(ref) - read_len)))
            s = ref[pos:pos + read_len]
            if rng.random() < 0.5:
                s = revcomp(s)
            out.append((f"rd{ri}_{names[ci]}_{pos}", mutate(s), "I" * len(s)))
    return out


def write_fasta(contigs: dict[str, str], path: str, width: int = 70) -> None:
    with open(path, "w") as f:
        for name, seq in contigs.items():
            f.write(f">{name}\n")
            for i in range(0, len(seq), width):
                f.write(seq[i:i + width] + "\n")


def write_fastq(reads, path: str) -> None:
    with open(path, "w") as f:
        for name, seq, qual in reads:
            f.write(f"@{name}\n{seq}\n+\n{qual}\n")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--genome-len", type=int, default=1_000_000)
    ap.add_argument("--n-reads", type=int, default=10_000)
    ap.add_argument("--read-len", type=int, default=100)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--paired", action="store_true")
    ap.add_argument("--prefix", default="sim")
    args = ap.parse_args()
    contigs = make_genome(args.genome_len, seed=args.seed)
    write_fasta(contigs, args.prefix + ".fa")
    reads = sim_reads(contigs, args.n_reads, read_len=args.read_len,
                      seed=args.seed + 1, paired=args.paired)
    if args.paired:
        write_fastq(reads[0::2], args.prefix + "_1.fq")
        write_fastq(reads[1::2], args.prefix + "_2.fq")
    else:
        write_fastq(reads, args.prefix + ".fq")


if __name__ == "__main__":
    main()
