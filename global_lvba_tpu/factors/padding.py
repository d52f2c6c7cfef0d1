"""Shape bucketing helpers so repeated LM solves reuse compiled kernels.

Every window of the windowed LiDAR BA produces a different number of planar
voxels; without padding each window would trigger a fresh XLA compilation.
Padding voxel rows up to the next power of two gives a tiny, fixed set of
kernel shapes.  Padded rows have n == 0 and contribute exactly zero to cost,
gradient and Hessian (verified in tests), and the AVG_THR residual scaling
is uniform so the LM trajectory is unchanged.
"""

from __future__ import annotations

from typing import List, Sequence

import jax.numpy as jnp
import numpy as np

from ..map.voxelize import PlaneFactorBucket, VoxelMap
from .plane_eigen import PlaneFactorArrays, bucket_to_device


def _next_pow2(n: int) -> int:
    return 1 << max(0, (n - 1).bit_length())


def pad_bucket(b: PlaneFactorBucket, v_pad: int) -> PlaneFactorBucket:
    V = b.n.shape[0]
    if v_pad <= V:
        return b
    extra = v_pad - V

    def z(x):
        return np.concatenate([x, np.zeros((extra,) + x.shape[1:], dtype=x.dtype)])

    return PlaneFactorBucket(n=z(b.n), mu=z(b.mu), Pc=z(b.Pc), frame=z(b.frame))


def buckets_to_device(
    vm: VoxelMap, dtype=jnp.float32, pad: bool = True
) -> List[PlaneFactorArrays]:
    out = []
    for b in vm.buckets:
        if pad:
            b = pad_bucket(b, _next_pow2(b.n.shape[0]))
        out.append(bucket_to_device(b, dtype=dtype))
    return out
