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
    vm: VoxelMap, dtype=jnp.float32, pad: bool = True, merge: str = "auto"
) -> List[PlaneFactorArrays]:
    """Device factor arrays from a voxel map.

    merge: 'always' fuses all occupancy tiers into ONE (V, K_max) bucket.
    Measured slower on TPU v5e (the K-padding's extra elementwise work
    outweighs the saved dispatches), so 'auto' currently keeps the tiers.
    """
    bs = vm.buckets
    if len(bs) > 1 and merge == "always":
        kmax = max(b.n.shape[1] for b in bs)
        merged = PlaneFactorBucket(
            n=np.concatenate([_pad_k(b.n, kmax) for b in bs]),
            mu=np.concatenate([_pad_k(b.mu, kmax) for b in bs]),
            Pc=np.concatenate([_pad_k(b.Pc, kmax) for b in bs]),
            frame=np.concatenate([_pad_k(b.frame, kmax) for b in bs]),
        )
        bs = [merged]
    out = []
    for b in bs:
        if pad:
            b = pad_bucket(b, _next_pow2(b.n.shape[0]))
        out.append(bucket_to_device(b, dtype=dtype))
    return out


def _pad_k(x: np.ndarray, kmax: int) -> np.ndarray:
    K = x.shape[1]
    if K == kmax:
        return x
    cfg = [(0, 0), (0, kmax - K)] + [(0, 0)] * (x.ndim - 2)
    return np.pad(x, cfg)
