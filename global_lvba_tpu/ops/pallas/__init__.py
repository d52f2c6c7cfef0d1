from .matcher import top2_similarity

__all__ = ["top2_similarity"]
