"""SE(3) pose utilities over (R, p) pairs, batched.

Poses are stored as explicit rotation matrices plus translations — the same
state layout as the reference's IMUST (t, R, p) struct
(/root/reference/include/BALM/tools.hpp:147-207) minus the unused IMU fields.
A batch of poses is a pair of arrays R:(..., 3, 3), p:(..., 3).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from .so3 import exp_so3

Pose = Tuple[jnp.ndarray, jnp.ndarray]


def compose(Ra, pa, Rb, pb):
    """(Ra,pa) ∘ (Rb,pb): x -> Ra (Rb x + pb) + pa."""
    return Ra @ Rb, (Ra @ pb[..., None])[..., 0] + pa


def inverse(R, p):
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt, -(Rt @ p[..., None])[..., 0]


def relative(Ra, pa, Rb, pb):
    """T_a^{-1} ∘ T_b — pose of b expressed in a's frame.

    Matches the anchor-relative bookkeeping of the reference window BA
    (/root/reference/src/lvba_system.cpp:286-288).
    """
    Rat = jnp.swapaxes(Ra, -1, -2)
    return Rat @ Rb, (Rat @ (pb - pa)[..., None])[..., 0]


def apply(R, p, x):
    """Transform points x (..., 3) by pose (R, p)."""
    return (R @ x[..., None])[..., 0] + p


def boxplus_pose(R, p, dx):
    """Right-multiplicative pose update used by the LM solvers.

    R <- R @ Exp(dx[0:3]);  p <- p + dx[3:6]
    — the same update as BALM2::damping_iter (/root/reference/include/BALM/
    bavoxel.hpp:723-727).  The composition runs at HIGHEST precision: the
    TPU bf16 matmul default would inject ~1e-3 rad of error per update.
    """
    import jax

    dR = exp_so3(dx[..., 0:3])
    R2 = jnp.matmul(R, dR, precision=jax.lax.Precision.HIGHEST)
    return R2, p + dx[..., 3:6]
