"""Shape bucketing helpers so repeated LM solves reuse compiled kernels.

Every window of the windowed LiDAR BA produces a different number of planar
voxels; without padding each window would trigger a fresh XLA compilation.
Padding voxel rows up to the next power of two gives a tiny, fixed set of
kernel shapes.  Padded rows have n == 0 and contribute exactly zero to cost,
gradient and Hessian (verified in tests), and the AVG_THR residual scaling
is uniform so the LM trajectory is unchanged.
"""

from __future__ import annotations

import os
from typing import List, Sequence

import jax.numpy as jnp
import numpy as np

from ..map.voxelize import PlaneFactorBucket, VoxelMap
from .plane_eigen import (
    AlignedPlaneFactorArrays,
    PlaneFactorArrays,
    bucket_to_device,
)


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
    vm: VoxelMap, dtype=jnp.float32, pad: bool = True, merge: str = "auto",
    W: int = None, layout: str = "auto",
) -> List[PlaneFactorArrays]:
    """Device factor arrays from a voxel map.

    merge: 'always' fuses all occupancy tiers into ONE (V, K_max) bucket.
    Measured slower on TPU v5e (the K-padding's extra elementwise work
    outweighs the saved dispatches), so 'auto' currently keeps the tiers.

    W + layout: with the solve width known, layout='auto' switches to the
    frame-ALIGNED dense layout (one (V, W) bucket, slot k == frame k; see
    AlignedPlaneFactorArrays) when the dense cell count V·W is within
    LVBA_ALIGNED_RATIO (default 2.5) of the bucketed entry count AND
    W >= LVBA_ALIGNED_MIN_W (default 64) — it removes every
    frame-selection contraction from the evaluation, the measured bulk of
    the dense-occupancy eval cost at representative widths (W=512 LM
    21.9 -> 15.9 ms/iter), but for many-small-window pipelines the
    per-window host scatter outweighs the tiny-solve win (ladder-3
    lidar stage measured 4.6 -> 8.5 s with windows aligned).
    layout='aligned' forces it, layout='bucketed' disables it.
    """
    bs = vm.buckets
    if W is not None and layout in ("auto", "aligned") and bs:
        dense_cells = sum(b.n.shape[0] for b in bs) * W
        entry_cells = sum(int(np.prod(b.n.shape)) for b in bs)
        ratio = float(os.environ.get("LVBA_ALIGNED_RATIO", "2.5"))
        min_w = int(os.environ.get("LVBA_ALIGNED_MIN_W", "64"))
        if layout == "aligned" or (
            W >= min_w and dense_cells <= ratio * entry_cells
        ):
            return [aligned_to_device(bs, W, dtype=dtype, pad=pad)]
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


def aligned_to_device(
    bs: Sequence[PlaneFactorBucket], W: int, dtype=jnp.float32,
    pad: bool = True,
) -> AlignedPlaneFactorArrays:
    """Scatter bucketed (V, K) entries into the frame-aligned dense
    (V_total, W) grid: cell (v, f) holds the moments voxel v observed in
    frame f (each voxel observes a frame at most once), all other cells
    zero.  V padded to the next power of two for executable reuse."""
    Vt = sum(b.n.shape[0] for b in bs)
    Vp = _next_pow2(Vt) if pad else Vt
    # build in the TARGET dtype: an f64 intermediate doubles the host
    # memory and conversion cost of the scatter for f32 solves
    np_dt = np.dtype(jnp.dtype(dtype).name)
    n = np.zeros((Vp, W), dtype=np_dt)
    mu = np.zeros((Vp, W, 3), dtype=np_dt)
    Pc = np.zeros((Vp, W, 3, 3), dtype=np_dt)
    off = 0
    for b in bs:
        V = b.n.shape[0]
        vi, ki = np.nonzero(b.n > 0)
        f = b.frame[vi, ki].astype(np.int64)
        if f.size and (f.min() < 0 or f.max() >= W):
            raise ValueError(
                f"bucket frame ids span [{f.min()}, {f.max()}] outside the "
                f"aligned width W={W}"
            )
        n[off + vi, f] = b.n[vi, ki]
        mu[off + vi, f] = b.mu[vi, ki]
        Pc[off + vi, f] = b.Pc[vi, ki]
        off += V
    return AlignedPlaneFactorArrays(
        n=jnp.asarray(n, dtype=dtype),
        mu=jnp.asarray(mu, dtype=dtype),
        Pc=jnp.asarray(Pc, dtype=dtype),
    )


def _pad_k(x: np.ndarray, kmax: int) -> np.ndarray:
    K = x.shape[1]
    if K == kmax:
        return x
    cfg = [(0, 0), (0, kmax - K)] + [(0, 0)] * (x.ndim - 2)
    return np.pad(x, cfg)
