from bwamem_tpu.index.build import build_index
from bwamem_tpu.index.fmindex import BwaIndex


def load_index(prefix: str) -> BwaIndex:
    """bwa_idx_load (bwa.c:488-509): shared-memory fast path when the
    prefix was staged with `bwamem_tpu shm`, else disk."""
    from bwamem_tpu.index import shm
    idx = shm.load_staged(prefix)
    if idx is not None:
        return idx
    return BwaIndex.load(prefix)


__all__ = ["build_index", "BwaIndex", "load_index"]
