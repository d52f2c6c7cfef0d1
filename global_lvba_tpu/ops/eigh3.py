"""Closed-form symmetric 3x3 eigendecomposition, batched, branch-free.

The BALM planar factor needs one 3x3 self-adjoint eigendecomposition per
voxel per evaluation (reference: Eigen::SelfAdjointEigenSolver at
/root/reference/include/BALM/bavoxel.hpp:98).  On TPU a LAPACK-style
iterative eigensolver serializes badly; this module instead uses the
analytic trigonometric eigenvalue formula plus Cayley-Hamilton eigenvectors,
which is pure VPU element-wise math and vectorizes perfectly over any batch.

Returns eigenvalues ascending (matching Eigen's convention) and the
corresponding eigenvectors as COLUMNS of U — so U[..., :, k] is the k-th
eigenvector, like Eigen's .eigenvectors().
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def _eigenvalues3(A: jnp.ndarray) -> jnp.ndarray:
    """Analytic eigenvalues of symmetric (..., 3, 3), ascending."""
    a00, a11, a22 = A[..., 0, 0], A[..., 1, 1], A[..., 2, 2]
    a01, a02, a12 = A[..., 0, 1], A[..., 0, 2], A[..., 1, 2]

    p1 = a01 * a01 + a02 * a02 + a12 * a12
    q = (a00 + a11 + a22) / 3.0
    d0, d1, d2 = a00 - q, a11 - q, a22 - q
    p2 = d0 * d0 + d1 * d1 + d2 * d2 + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2, 0.0) / 6.0)
    near_scalar = p < 1e-30
    p_safe = jnp.where(near_scalar, 1.0, p)

    # B = (A - q I) / p ; r = det(B) / 2
    b00, b11, b22 = d0 / p_safe, d1 / p_safe, d2 / p_safe
    b01, b02, b12 = a01 / p_safe, a02 / p_safe, a12 / p_safe
    detB = (
        b00 * (b11 * b22 - b12 * b12)
        - b01 * (b01 * b22 - b12 * b02)
        + b02 * (b01 * b12 - b11 * b02)
    )
    r = jnp.clip(detB / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0

    lam2 = q + 2.0 * p * jnp.cos(phi)                      # largest
    lam0 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)  # smallest
    lam1 = 3.0 * q - lam2 - lam0
    lams = jnp.stack([lam0, lam1, lam2], axis=-1)
    return jnp.where(near_scalar[..., None], jnp.stack([q, q, q], axis=-1), lams)


def _maxnorm_column(M: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Column of (..., 3, 3) with largest norm, plus that norm."""
    norms = jnp.linalg.norm(M, axis=-2)  # (..., 3)
    idx = jnp.argmax(norms, axis=-1)
    col = jnp.take_along_axis(M, idx[..., None, None], axis=-1)[..., 0]
    n = jnp.take_along_axis(norms, idx[..., None], axis=-1)[..., 0]
    return col, n


def _any_orthonormal(v: jnp.ndarray) -> jnp.ndarray:
    """A unit vector orthogonal to unit v, branch-free."""
    # pick the basis vector least aligned with v
    av = jnp.abs(v)
    idx = jnp.argmin(av, axis=-1)
    basis = jnp.eye(3, dtype=v.dtype)
    e = basis[idx]
    u = e - (jnp.sum(e * v, axis=-1, keepdims=True)) * v
    n = jnp.linalg.norm(u, axis=-1, keepdims=True)
    return u / jnp.where(n < 1e-30, 1.0, n)


def eigh3x3(A: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched closed-form eigh for symmetric 3x3 matrices.

    Args:
      A: (..., 3, 3) symmetric.
    Returns:
      (lams, U): lams (..., 3) ascending; U (..., 3, 3) with eigenvectors as
      columns (orthonormal, right-handed).
    """
    dtype = A.dtype
    # scale for conditioning
    scale = jnp.maximum(jnp.max(jnp.abs(A), axis=(-2, -1)), 1e-30)
    As = A / scale[..., None, None]
    As = 0.5 * (As + jnp.swapaxes(As, -1, -2))

    lams = _eigenvalues3(As)
    lam0, lam1, lam2 = lams[..., 0], lams[..., 1], lams[..., 2]
    eye = jnp.eye(3, dtype=dtype)

    spread = jnp.maximum(lam2 - lam0, 1e-30)

    # v2 (largest eigenvalue): columns of (A - lam0 I)(A - lam1 I)
    M2 = (As - lam0[..., None, None] * eye) @ (As - lam1[..., None, None] * eye)
    v2, n2 = _maxnorm_column(M2)
    degenerate_all = (spread < 1e-7) | (n2 < 1e-12)
    v2 = jnp.where(degenerate_all[..., None], jnp.broadcast_to(eye[:, 2], v2.shape), v2)
    v2 = v2 / jnp.linalg.norm(v2, axis=-1, keepdims=True)

    # v0 (smallest): columns of (A - lam1 I)(A - lam2 I); degenerate lam0≈lam1
    # collapses this product to ~0 — fall back to any vector orthogonal to v2.
    M0 = (As - lam1[..., None, None] * eye) @ (As - lam2[..., None, None] * eye)
    v0, n0 = _maxnorm_column(M0)
    bad0 = n0 < 1e-12 * jnp.maximum(spread, 1.0)
    v0 = jnp.where(bad0[..., None], _any_orthonormal(v2), v0)
    # orthogonalize against v2 and normalize
    v0 = v0 - jnp.sum(v0 * v2, axis=-1, keepdims=True) * v2
    n0b = jnp.linalg.norm(v0, axis=-1, keepdims=True)
    v0 = jnp.where(n0b < 1e-20, _any_orthonormal(v2), v0 / jnp.where(n0b < 1e-20, 1.0, n0b))

    v1 = jnp.cross(v2, v0)

    U = jnp.stack([v0, v1, v2], axis=-1)  # columns
    return lams * scale[..., None], U


def eigh3x3_reference(A: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """jnp.linalg.eigh wrapper with identical output convention (for testing)."""
    lams, U = jnp.linalg.eigh(A)
    return lams, U
