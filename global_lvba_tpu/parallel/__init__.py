from .mesh import make_mesh
from .shard import shard_buckets, sharded_cost_grad_hess, lm_damping_iter_sharded

__all__ = [
    "make_mesh",
    "shard_buckets",
    "sharded_cost_grad_hess",
    "lm_damping_iter_sharded",
]
