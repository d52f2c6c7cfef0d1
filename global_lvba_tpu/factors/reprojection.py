"""Whitened distorted reprojection and point-to-plane residuals.

Residual semantics follow the reference Ceres functors exactly
(/root/reference/include/utils.hpp:51-147):

  * reprojection: world -> camera by (Rcw, tcw); if Z <= 1e-8 the residual
    is identically zero (utils.hpp:78); otherwise Brown-Conrady projection,
    whitened by sigma_px per axis;
  * point-to-plane: r = sqrt((nᵀX + d)² + 1e-12) / sigma (utils.hpp:134-139).

Jacobians come from forward-mode autodiff (the TPU analogue of Ceres
autodiff), vmapped over observations; the pose tangent is the right-
multiplicative SO(3) increment R <- R·Exp(δθ) used by all solvers here.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..geometry.camera import CameraModel, distort_normalized
from ..geometry.so3 import exp_so3


def reproj_residual(
    cam: CameraModel,
    R: jnp.ndarray,     # (3, 3) world->cam
    t: jnp.ndarray,     # (3,)
    X: jnp.ndarray,     # (3,)
    uv: jnp.ndarray,    # (2,)
    sigma: float,
) -> jnp.ndarray:
    """Single-observation whitened residual (2,)."""
    Xc = R @ X + t
    Z = Xc[2]
    ok = Z > 1e-8
    z_safe = jnp.where(ok, Z, 1.0)
    xy = Xc[0:2] / z_safe
    xyd = distort_normalized(cam, xy)
    u = cam.fx * xyd[0] + cam.cx
    v = cam.fy * xyd[1] + cam.cy
    r = jnp.stack([(u - uv[0]) / sigma, (v - uv[1]) / sigma])
    return jnp.where(ok, r, jnp.zeros_like(r))


def _reproj_local(cam, R, t, X, uv, sigma, dtheta, dt, dX):
    R2 = R @ exp_so3(dtheta)
    return reproj_residual(cam, R2, t + dt, X + dX, uv, sigma)


def reproj_residuals_batch(cam, R_all, t_all, X_all, obs_cam, obs_pt, obs_uv, sigma):
    """Batched residuals (O, 2) for all observations."""
    R = R_all[obs_cam]
    t = t_all[obs_cam]
    X = X_all[obs_pt]

    def one(R, t, X, uv):
        return reproj_residual(cam, R, t, X, uv, sigma)

    return jax.vmap(one)(R, t, X, obs_uv)


def _reproj_jacobians_jacfwd(cam, R, t, X, uv, sigma):
    """Autodiff reference implementation (vmapped jacfwd, 9 tangent
    propagations per observation) — kept as the oracle the analytic form
    is tested against (tests/test_visual_ba.py)."""
    zero3 = jnp.zeros(3, dtype=R.dtype)

    def one(R_, t_, X_, uv_):
        f = lambda dth, dt_, dX: _reproj_local(
            cam, R_, t_, X_, uv_, sigma, dth, dt_, dX)
        r = f(zero3, zero3, zero3)
        Jth, Jt, Jx = jax.jacfwd(f, argnums=(0, 1, 2))(zero3, zero3, zero3)
        Jc = jnp.concatenate([Jth, Jt], axis=-1)
        return r, Jc, Jx

    return jax.vmap(one)(R, t, X, uv)


def reproj_jacobians_expanded(cam, R, t, X, uv, sigma):
    """Residuals + CLOSED-FORM Jacobians on ALREADY-EXPANDED
    per-observation inputs (R (N,3,3), t (N,3), X (N,3), uv (N,2)).
    Returns (r (N,2), Jc (N,2,6), Jp (N,2,3)).

    The chain rule is written out as batched elementwise math + two
    einsums instead of vmapped jacfwd: forward-mode AD propagates 9
    tangents through the whole projection per observation — ~a dozen
    passes of work the closed form does once.  Derivation (right-
    multiplicative increment R <- R exp(dth), utils.hpp:51-106):

      Xc   = R X + t,      d Xc = [R(-[X]x) | I | R] (dth, dt, dX)
      xy   = Xc_{0:2}/Z,   dxy/dXc = 1/Z [[1,0,-x],[0,1,-y]]
      dist = Brown-Conrady, J_d (2,2) symmetric (dxd/dy == dyd/dx)
      pix  = f * dist + c, whitened by sigma

    so with G = diag(f)/sigma * J_d * dxy/dXc (2,3) and GR = G R:
      Jt = G,  Jp = GR,  Jth row a = X x GR_a
    (row_a of M [X]x is -(X x M_a), and the theta block carries R(-[X]x)).
    The Z <= 1e-8 gate zeroes r AND all Jacobian rows, matching the
    autodiff-of-where reference (verified to fp rounding in f64,
    tests/test_visual_ba.py::test_analytic_jacobians_match_jacfwd)."""
    dt_ = R.dtype
    Xc = jnp.einsum("nij,nj->ni", R, X) + t
    Z = Xc[..., 2]
    ok = Z > 1e-8
    zs = jnp.where(ok, Z, jnp.ones_like(Z))
    x = Xc[..., 0] / zs
    y = Xc[..., 1] / zs
    r2 = x * x + y * y
    radial = 1.0 + cam.k1 * r2 + cam.k2 * r2 * r2
    xd = x * radial + 2.0 * cam.p1 * x * y + cam.p2 * (r2 + 2.0 * x * x)
    yd = y * radial + cam.p1 * (r2 + 2.0 * y * y) + 2.0 * cam.p2 * x * y
    u = cam.fx * xd + cam.cx
    v = cam.fy * yd + cam.cy
    okf = ok.astype(dt_)
    r = jnp.stack([(u - uv[..., 0]) / sigma,
                   (v - uv[..., 1]) / sigma], axis=-1) * okf[..., None]

    # distortion Jacobian (symmetric)
    a = 2.0 * (cam.k1 + 2.0 * cam.k2 * r2)
    dxdx = radial + x * x * a + 2.0 * cam.p1 * y + 6.0 * cam.p2 * x
    dxdy = x * y * a + 2.0 * cam.p1 * x + 2.0 * cam.p2 * y
    dydy = radial + y * y * a + 6.0 * cam.p1 * y + 2.0 * cam.p2 * x
    c0 = okf * cam.fx / (sigma * zs)
    c1 = okf * cam.fy / (sigma * zs)
    # G = diag(f)/sigma * J_d * (1/Z)[[1,0,-x],[0,1,-y]]  ->  (N, 2, 3)
    G = jnp.stack([
        jnp.stack([c0 * dxdx, c0 * dxdy, -c0 * (dxdx * x + dxdy * y)], -1),
        jnp.stack([c1 * dxdy, c1 * dydy, -c1 * (dxdy * x + dydy * y)], -1),
    ], axis=-2)
    GR = jnp.einsum("nab,nbc->nac", G, R)            # (N, 2, 3) = Jp
    Jth = jnp.cross(X[:, None, :], GR)               # X x GR_a per row
    Jc = jnp.concatenate([Jth, G], axis=-1)          # (N, 2, 6)
    return r, Jc, GR


def reproj_jacobians_batch(cam, R_all, t_all, X_all, obs_cam, obs_pt, obs_uv, sigma):
    """Residuals + Jacobians wrt (pose tangent 6, point 3).

    Returns (r (O,2), Jc (O,2,6), Jp (O,2,3)).
    """
    R = R_all[obs_cam]
    t = t_all[obs_cam]
    X = X_all[obs_pt]
    return reproj_jacobians_expanded(cam, R, t, X, obs_uv, sigma)


def plane_point_residual(n, d, X, sigma):
    """r = sqrt((nᵀX + d)² + 1e-12)/σ (utils.hpp:134-139)."""
    e = -(n @ X + d)
    return jnp.sqrt(e * e + 1e-12) / sigma


def plane_point_batch(n_all, d_all, X_all, sigma):
    """Batched residual (P,) + Jacobian (P, 3) wrt X."""

    def one(n, d, X):
        f = lambda dX: plane_point_residual(n, d, X + dX, sigma)
        zero3 = jnp.zeros(3, dtype=X_all.dtype)
        return f(zero3), jax.jacfwd(f)(zero3)

    return jax.vmap(one)(n_all, d_all, X_all)
