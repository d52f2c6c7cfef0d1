from .eigh3 import eigh3x3
from .segments import segment_sum, run_lengths

__all__ = ["eigh3x3", "segment_sum", "run_lengths"]
