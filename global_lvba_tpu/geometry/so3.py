"""SO(3) operations, batched and jit-friendly.

Semantics follow the reference rotation utilities (Rodrigues exponential,
trace-based logarithm, right Jacobian) at /root/reference/include/BALM/
tools.hpp:62-145, re-expressed as branch-free batched JAX ops with Taylor
guards instead of scalar `if` tests so they trace cleanly under `jit`/`vmap`.
All functions accept arbitrary leading batch dimensions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-10


def hat(v: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrix of v: hat(v) @ x == cross(v, x).  (..., 3) -> (..., 3, 3)."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    rows = [
        jnp.stack([zero, -z, y], axis=-1),
        jnp.stack([z, zero, -x], axis=-1),
        jnp.stack([-y, x, zero], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def exp_so3(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues exponential map. (..., 3) -> (..., 3, 3).

    R = I + sinc(|w|) * hat(w) + cosc(|w|) * hat(w)^2

    Written so forward/reverse autodiff is NaN-free at w == 0 (the sqrt in
    |w| is fed a safe value on the Taylor branch; the series depends only on
    |w|² which is smooth) — the visual-BA Jacobians differentiate through
    this at exactly zero increment.
    """
    t2 = jnp.sum(w * w, axis=-1)
    small = t2 < 1e-8
    t2_safe = jnp.where(small, 1.0, t2)
    theta = jnp.sqrt(t2_safe)
    a = jnp.where(small, 1.0 - t2 / 6.0 + t2 * t2 / 120.0, jnp.sin(theta) / theta)
    b = jnp.where(
        small, 0.5 - t2 / 24.0 + t2 * t2 / 720.0, (1.0 - jnp.cos(theta)) / t2_safe
    )
    K = hat(w)
    K2 = jnp.matmul(K, K, precision=jax.lax.Precision.HIGHEST)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), K.shape)
    return eye + a[..., None, None] * K + b[..., None, None] * K2


def log_so3(R: jnp.ndarray) -> jnp.ndarray:
    """Inverse of exp_so3. (..., 3, 3) -> (..., 3).

    Uses the antisymmetric part for the axis and acos(trace) for the angle,
    matching tools.hpp:98-103; a Taylor guard replaces the |theta|<1e-3
    branch. Angles near pi are handled with the symmetric-part fallback.
    """
    tr = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip(0.5 * (tr - 1.0), -1.0, 1.0)
    theta = jnp.arccos(cos_theta)
    # K = vee(R - R^T)  (= 2 sin(theta) * axis)
    K = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    # generic: 0.5 * theta / sin(theta) * K, guarded near 0
    sin_theta = jnp.sin(theta)
    near_zero = jnp.abs(theta) < 1e-4
    near_pi = theta > jnp.pi - 1e-3
    scale = jnp.where(
        near_zero,
        0.5 + theta * theta / 12.0,
        0.5 * theta / jnp.where(jnp.abs(sin_theta) < _EPS, 1.0, sin_theta),
    )
    w_generic = scale[..., None] * K

    # near pi: axis from the diagonal of R = I*cos + (1-cos) aa^T + sin*hat(a)
    # a_i^2 = (R_ii - cos) / (1 - cos); sign fixed from K (which may be tiny).
    one_minus_cos = jnp.where(near_pi, 1.0 - cos_theta, 1.0)
    diag = jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], axis=-1)
    a2 = jnp.clip((diag - cos_theta[..., None]) / one_minus_cos[..., None], 0.0, 1.0)
    a_abs = jnp.sqrt(a2)
    # pick dominant component, take signs from the off-diagonal sums
    # (R + R^T)/2 off-diagonals: s_ij = (1-cos) a_i a_j
    s01 = 0.5 * (R[..., 0, 1] + R[..., 1, 0])
    s02 = 0.5 * (R[..., 0, 2] + R[..., 2, 0])
    s12 = 0.5 * (R[..., 1, 2] + R[..., 2, 1])
    # choose sign of largest axis component = +, derive others
    idx = jnp.argmax(a_abs, axis=-1)
    sx = jnp.where(idx == 0, 1.0, jnp.where(idx == 1, jnp.sign(s01), jnp.sign(s02)))
    sy = jnp.where(idx == 0, jnp.sign(s01), jnp.where(idx == 1, 1.0, jnp.sign(s12)))
    sz = jnp.where(idx == 0, jnp.sign(s02), jnp.where(idx == 1, jnp.sign(s12), 1.0))
    sx = jnp.where(sx == 0, 1.0, sx)
    sy = jnp.where(sy == 0, 1.0, sy)
    sz = jnp.where(sz == 0, 1.0, sz)
    axis = a_abs * jnp.stack([sx, sy, sz], axis=-1)
    # overall sign: K = 2 sin(theta) * axis still carries the true sign for
    # theta slightly below pi; at exactly pi (K == 0) either sign is correct.
    flip = jnp.sum(axis * K, axis=-1) < 0
    axis = jnp.where(flip[..., None], -axis, axis)
    w_pi = axis * theta[..., None]

    return jnp.where(near_pi[..., None], w_pi, w_generic)


def jr(w: jnp.ndarray) -> jnp.ndarray:
    """Right Jacobian of SO(3) (tools.hpp:114-128). (..., 3) -> (..., 3, 3)."""
    theta = jnp.linalg.norm(w, axis=-1)
    small = theta < 1e-6
    safe = jnp.where(small, 1.0, theta)
    a = jnp.where(small, 1.0 - theta**2 / 6.0, jnp.sin(safe) / safe)
    axis = w / safe[..., None]
    b = 1.0 - a
    c = jnp.where(small, theta / 2.0 - theta**3 / 24.0, (1.0 - jnp.cos(safe)) / safe)
    eye = jnp.eye(3, dtype=w.dtype)
    aaT = axis[..., :, None] * axis[..., None, :]
    return (
        a[..., None, None] * eye
        + b[..., None, None] * aaT
        - c[..., None, None] * hat(axis)
    )


def jr_inv(w: jnp.ndarray) -> jnp.ndarray:
    """Inverse right Jacobian (tools.hpp:130-145), taking the rotation VECTOR."""
    theta = jnp.linalg.norm(w, axis=-1)
    small = theta < 1e-6
    safe = jnp.where(small, 1.0, theta)
    half = safe / 2.0
    ctt = jnp.where(small, 1.0 - theta**2 / 12.0, half / jnp.tan(half))
    axis = w / safe[..., None]
    eye = jnp.eye(3, dtype=w.dtype)
    aaT = axis[..., :, None] * axis[..., None, :]
    return (
        ctt[..., None, None] * eye
        + (1.0 - ctt)[..., None, None] * aaT
        + (theta / 2.0)[..., None, None] * hat(axis)
    )


def euler_to_rot(roll, pitch, yaw):
    """Z-Y-X euler angles -> rotation matrix (EulerToRot, utils.hpp:448-458:
    R = Rz(yaw) Ry(pitch) Rx(roll)), batched."""
    cr, sr = jnp.cos(roll), jnp.sin(roll)
    cp, sp = jnp.cos(pitch), jnp.sin(pitch)
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    row0 = jnp.stack([cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr], axis=-1)
    row1 = jnp.stack([sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr], axis=-1)
    row2 = jnp.stack([-sp, cp * sr, cp * cr], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)
