"""BWA-SW long-read aligner (the reference's `bwasw` command).

Reimplements the prefix-DAG × prefix-trie dynamic programming of
bwtsw2_core.c plus the surrounding driver (bwtsw2_aux.c), chain filter
(bwtsw2_chain.c) and read pairing (bwtsw2_pair.c).  The irregular beam
traversal is host code (it is inherently sequential pointer-chasing, single
CPU thread per read in the reference too); the dense compute — SW
extensions, global-alignment CIGARs and pair-rescue local SW — runs on the
batched device kernels shared with the mem pipeline (ops.extend,
ops.global_sw, ops.local_sw)."""
from bwamem_tpu.bwasw.aux import Bsw2Options, bsw2_aln

__all__ = ["Bsw2Options", "bsw2_aln"]
