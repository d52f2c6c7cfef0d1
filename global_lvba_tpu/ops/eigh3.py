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

import jax
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
    # HIGHEST: TPU's default bf16 matmul passes corrupt the eigenvectors
    # (and through them every factor gradient) at the 1e-2 level
    hi = jax.lax.Precision.HIGHEST
    M2 = jnp.matmul(
        As - lam0[..., None, None] * eye, As - lam1[..., None, None] * eye,
        precision=hi,
    )
    v2, n2 = _maxnorm_column(M2)
    degenerate_all = (spread < 1e-7) | (n2 < 1e-12)
    v2 = jnp.where(degenerate_all[..., None], jnp.broadcast_to(eye[:, 2], v2.shape), v2)
    v2 = v2 / jnp.linalg.norm(v2, axis=-1, keepdims=True)

    # v0 (smallest): columns of (A - lam1 I)(A - lam2 I); degenerate lam0≈lam1
    # collapses this product to ~0 — fall back to any vector orthogonal to v2.
    M0 = jnp.matmul(
        As - lam1[..., None, None] * eye, As - lam2[..., None, None] * eye,
        precision=hi,
    )
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


# ---------------------------------------------------------------------------
# Structure-of-arrays variant
# ---------------------------------------------------------------------------

def eigvals3_soa(a00, a01, a02, a11, a12, a22):
    """Analytic eigenvalues from the 6 unique components (batched planes).

    Pure elementwise math — no matmuls, so TPU precision is true f32 and
    the layout stays perfectly tiled. Returns (lam0, lam1, lam2) ascending.
    """
    p1 = a01 * a01 + a02 * a02 + a12 * a12
    q = (a00 + a11 + a22) / 3.0
    d0, d1, d2 = a00 - q, a11 - q, a22 - q
    p2 = d0 * d0 + d1 * d1 + d2 * d2 + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2, 0.0) / 6.0)
    near_scalar = p < 1e-30
    p_safe = jnp.where(near_scalar, 1.0, p)
    b00, b11, b22 = d0 / p_safe, d1 / p_safe, d2 / p_safe
    b01, b02, b12 = a01 / p_safe, a02 / p_safe, a12 / p_safe
    detB = (
        b00 * (b11 * b22 - b12 * b12)
        - b01 * (b01 * b22 - b12 * b02)
        + b02 * (b01 * b12 - b11 * b02)
    )
    r = jnp.clip(detB / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    lam2 = q + 2.0 * p * jnp.cos(phi)
    lam0 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    lam1 = 3.0 * q - lam2 - lam0
    lam0 = jnp.where(near_scalar, q, lam0)
    lam1 = jnp.where(near_scalar, q, lam1)
    lam2 = jnp.where(near_scalar, q, lam2)
    return lam0, lam1, lam2


def _sym_prod_cols(a00, a01, a02, a11, a12, a22,
                   b00, b01, b02, b11, b12, b22):
    """Columns of A·B for symmetric A, B (componentwise, batched).

    Returns the 9 entries of C = A @ B (C is NOT symmetric in general)."""
    c00 = a00 * b00 + a01 * b01 + a02 * b02
    c01 = a00 * b01 + a01 * b11 + a02 * b12
    c02 = a00 * b02 + a01 * b12 + a02 * b22
    c10 = a01 * b00 + a11 * b01 + a12 * b02
    c11 = a01 * b01 + a11 * b11 + a12 * b12
    c12 = a01 * b02 + a11 * b12 + a12 * b22
    c20 = a02 * b00 + a12 * b01 + a22 * b02
    c21 = a02 * b01 + a12 * b11 + a22 * b12
    c22 = a02 * b02 + a12 * b12 + a22 * b22
    return c00, c01, c02, c10, c11, c12, c20, c21, c22


def _pick_max_col(c00, c01, c02, c10, c11, c12, c20, c21, c22):
    """Column of largest norm -> (x, y, z, norm)."""
    n0 = c00 * c00 + c10 * c10 + c20 * c20
    n1 = c01 * c01 + c11 * c11 + c21 * c21
    n2 = c02 * c02 + c12 * c12 + c22 * c22
    use1 = (n1 >= n0) & (n1 >= n2)
    use2 = (n2 > n0) & (n2 > n1) & ~use1
    x = jnp.where(use1, c01, jnp.where(use2, c02, c00))
    y = jnp.where(use1, c11, jnp.where(use2, c12, c10))
    z = jnp.where(use1, c21, jnp.where(use2, c22, c20))
    n = jnp.sqrt(jnp.where(use1, n1, jnp.where(use2, n2, n0)))
    return x, y, z, n


def eigh3_soa(a00, a01, a02, a11, a12, a22):
    """Full SoA eigendecomposition of batched symmetric 3x3 matrices.

    Returns (lam0, lam1, lam2, v0, v1, v2) with each v a tuple (x, y, z) of
    unit eigenvector components (ascending eigenvalue order).  Componentwise
    Cayley-Hamilton — no matmuls, true-f32 on TPU, perfectly tiled.
    """
    # scale for conditioning
    scale = jnp.maximum(
        jnp.maximum(jnp.maximum(jnp.abs(a00), jnp.abs(a11)), jnp.abs(a22)),
        jnp.maximum(jnp.maximum(jnp.abs(a01), jnp.abs(a02)), jnp.abs(a12)),
    )
    scale = jnp.maximum(scale, 1e-30)
    s00, s01, s02 = a00 / scale, a01 / scale, a02 / scale
    s11, s12, s22 = a11 / scale, a12 / scale, a22 / scale

    lam0, lam1, lam2 = eigvals3_soa(s00, s01, s02, s11, s12, s22)
    spread = jnp.maximum(lam2 - lam0, 1e-30)

    def shifted(lam):
        return s00 - lam, s01, s02, s11 - lam, s12, s22 - lam

    # v2: max-norm column of (A - lam0 I)(A - lam1 I)
    C = _sym_prod_cols(*shifted(lam0), *shifted(lam1))
    v2x, v2y, v2z, n2 = _pick_max_col(*C)
    degen = (spread < 1e-7) | (n2 < 1e-12)
    v2x = jnp.where(degen, 0.0, v2x)
    v2y = jnp.where(degen, 0.0, v2y)
    v2z = jnp.where(degen, 1.0, v2z)
    inv = 1.0 / jnp.sqrt(v2x * v2x + v2y * v2y + v2z * v2z)
    v2x, v2y, v2z = v2x * inv, v2y * inv, v2z * inv

    # v0: max-norm column of (A - lam1 I)(A - lam2 I); fallback orthogonal
    C = _sym_prod_cols(*shifted(lam1), *shifted(lam2))
    v0x, v0y, v0z, n0 = _pick_max_col(*C)
    bad0 = n0 < 1e-12 * jnp.maximum(spread, 1.0)
    # fallback: basis vector least aligned with v2, orthogonalized below
    ax, ay, az = jnp.abs(v2x), jnp.abs(v2y), jnp.abs(v2z)
    usey = (ay <= ax) & (ay <= az)
    usez = (az < ax) & (az < ay) & ~usey
    fx = jnp.where(usey, 0.0, jnp.where(usez, 0.0, 1.0))
    fy = jnp.where(usey, 1.0, 0.0)
    fz = jnp.where(usez, 1.0, 0.0)
    v0x = jnp.where(bad0, fx, v0x)
    v0y = jnp.where(bad0, fy, v0y)
    v0z = jnp.where(bad0, fz, v0z)
    # orthogonalize against v2, normalize
    d = v0x * v2x + v0y * v2y + v0z * v2z
    v0x, v0y, v0z = v0x - d * v2x, v0y - d * v2y, v0z - d * v2z
    nn = jnp.sqrt(v0x * v0x + v0y * v0y + v0z * v0z)
    tiny = nn < 1e-20
    v0x = jnp.where(tiny, fx, v0x / jnp.where(tiny, 1.0, nn))
    v0y = jnp.where(tiny, fy, v0y / jnp.where(tiny, 1.0, nn))
    v0z = jnp.where(tiny, fz, v0z / jnp.where(tiny, 1.0, nn))

    # v1 = v2 x v0
    v1x = v2y * v0z - v2z * v0y
    v1y = v2z * v0x - v2x * v0z
    v1z = v2x * v0y - v2y * v0x

    return (
        lam0 * scale, lam1 * scale, lam2 * scale,
        (v0x, v0y, v0z), (v1x, v1y, v1z), (v2x, v2y, v2z),
    )
