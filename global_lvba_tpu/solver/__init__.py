from .lm import lm_damping_iter, LMResult

__all__ = ["lm_damping_iter", "LMResult"]
