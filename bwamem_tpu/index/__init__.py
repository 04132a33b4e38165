from bwamem_tpu.index.build import build_index
from bwamem_tpu.index.fmindex import BwaIndex

__all__ = ["build_index", "BwaIndex"]
