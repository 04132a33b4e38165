"""Exact klib ks_introsort(mem_flt) permutation replica (chainflt_host).

Golden vectors were produced by compiling the reference's ksort.h with the
mem_flt comparator (flt_lt(a,b) = a.w > b.w, bwamem.c:331) and recording the
output permutation.  mem_chain_flt's `first`-shadow resurrection makes the
kept chain SET depend on this tie order (bwamem.c:364,375-377), so the
permutation must be bug-for-bug identical — a stable sort is NOT equivalent.
"""
from bwamem_tpu.pipeline.chainflt_host import ks_introsort_mem_flt_perm

# (weights-in-traversal-order, klib output permutation)
GOLDEN = [
    ([0], [0]),
    ([0, 2], [1, 0]),
    ([1, 1, 1], [0, 2, 1]),
    ([0, 0, 3, 0], [2, 0, 3, 1]),
    ([0, 0, 1, 1, 0], [3, 2, 0, 4, 1]),
    ([1, 3, 1, 3, 2, 0, 1], [1, 3, 4, 0, 6, 2, 5]),
    ([3, 2, 2, 1, 1, 2, 0, 0, 3, 0, 2, 2, 2, 0, 3, 0],
     [0, 14, 8, 1, 2, 5, 12, 10, 11, 3, 4, 13, 15, 7, 6, 9]),
    ([3, 0, 2, 2, 1, 0, 0, 1, 2, 0, 1, 0, 3, 2, 3, 2, 1],
     [0, 14, 12, 15, 2, 3, 13, 8, 10, 16, 7, 4, 11, 6, 5, 1, 9]),
    ([2, 2, 1, 2, 0, 1, 1, 1, 3, 3, 2, 1, 2, 0, 1, 0, 2, 3],
     [17, 8, 9, 0, 1, 10, 12, 16, 3, 5, 6, 7, 2, 11, 14, 4, 13, 15]),
    ([2, 0, 1, 2, 1, 3, 3, 3, 1, 2, 1, 1, 2, 3, 3, 2, 1, 1, 3, 0, 0, 0, 1,
      1, 3, 0, 3, 3, 3, 2, 0],
     [26, 27, 28, 18, 14, 24, 13, 7, 6, 5, 0, 9, 12, 15, 29, 3, 23, 22, 2,
      8, 17, 16, 11, 10, 4, 30, 21, 20, 19, 1, 25]),
    ([0, 2, 2, 0, 2, 3, 1, 3, 0, 2, 1, 0, 2, 1, 1, 2, 1, 0, 2, 3, 0, 0, 2,
      2, 1, 0, 1, 0, 0, 3, 0, 1, 1, 3, 1, 2, 3, 1, 1, 2, 3, 2, 3, 3, 0, 1,
      1, 0, 2, 0, 1, 1, 0, 0, 0, 1, 0, 0, 2, 0, 1, 2, 3, 1],
     [40, 62, 42, 5, 7, 43, 19, 36, 33, 29, 41, 23, 22, 18, 48, 39, 12, 58,
      9, 35, 61, 4, 2, 1, 15, 37, 38, 46, 50, 51, 55, 60, 45, 32, 63, 6, 10,
      13, 14, 16, 24, 34, 31, 26, 0, 21, 3, 8, 59, 30, 57, 56, 11, 54, 25,
      52, 28, 27, 49, 47, 17, 20, 44, 53]),
    # the rd14_chr2_7660 case: two weight-80 chains behind a weight-250
    # primary; klib puts the LAST tied chain first → it gets resurrected
    ([80, 76, 80, 250], [3, 2, 0, 1]),
    ([250, 80, 80], [0, 2, 1]),
]


def test_introsort_matches_klib():
    for w, want in GOLDEN:
        assert ks_introsort_mem_flt_perm(list(w)) == want, w


def test_introsort_is_a_weight_desc_permutation():
    import random
    rng = random.Random(5)
    for _ in range(200):
        n = rng.randint(1, 120)
        w = [rng.randrange(6) for _ in range(n)]
        p = ks_introsort_mem_flt_perm(w)
        assert sorted(p) == list(range(n))
        s = [w[i] for i in p]
        assert s == sorted(w, reverse=True)
