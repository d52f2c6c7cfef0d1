"""Point-cluster moment algebra (batched).

The key BALM trick (reference PointCluster, /root/reference/include/BALM/
tools.hpp:407-466): a point set is summarized by (N, v=Σx, P=Σxxᵀ) and a
rigid transform acts on the moments in closed form, making the planar-factor
cost O(#poses) instead of O(#points).  Everything here broadcasts over
arbitrary leading batch dimensions.
"""

from __future__ import annotations

import jax.numpy as jnp


def transform_moments(P, v, n, R, p):
    """Rigid transform of raw moments (tools.hpp:450-456).

    v' = R v + n p
    P' = R P Rᵀ + (R v) pᵀ + p (R v)ᵀ + n p pᵀ
    Shapes: P (..., 3, 3), v (..., 3), n (...,), R (..., 3, 3), p (..., 3).
    """
    Rv = (R @ v[..., None])[..., 0]
    v_out = Rv + n[..., None] * p
    rp = Rv[..., :, None] * p[..., None, :]
    P_out = (
        R @ P @ jnp.swapaxes(R, -1, -2)
        + rp
        + jnp.swapaxes(rp, -1, -2)
        + n[..., None, None] * (p[..., :, None] * p[..., None, :])
    )
    return P_out, v_out


def cov_from_moments(P, v, n):
    """Covariance P/N - v̄v̄ᵀ (tools.hpp:435-439). Guards n == 0."""
    n_safe = jnp.where(n > 0, n, 1.0)
    vbar = v / n_safe[..., None]
    return P / n_safe[..., None, None] - vbar[..., :, None] * vbar[..., None, :]


def merge_moments(Pc, mu, n):
    """Merge centered per-group stats into total (N, mean, scatter).

    Given K groups — counts n (..., K), means mu (..., K, 3) and centered
    second moments Pc (..., K, 3, 3) with Pc_i = Σ(x-μ_i)(x-μ_i)ᵀ — the
    parallel-axis theorem yields the total scatter about the grand mean.
    This is the numerically stable f32 path for aggregating world-frame
    voxel statistics (it avoids the P/N - v̄v̄ᵀ cancellation the reference's
    raw-moment form suffers for voxels far from the origin).

    Returns (N_tot (...,), mu_tot (..., 3), S_tot (..., 3, 3)) with
    S_tot = Σ_x (x - mu_tot)(x - mu_tot)ᵀ;  cov = S_tot / N_tot.
    """
    N = jnp.sum(n, axis=-1)
    N_safe = jnp.where(N > 0, N, 1.0)
    mu_tot = jnp.sum(n[..., None] * mu, axis=-2) / N_safe[..., None]
    d = mu - mu_tot[..., None, :]
    outer = d[..., :, None] * d[..., None, :]
    S = jnp.sum(Pc + n[..., None, None] * outer, axis=-3)
    return N, mu_tot, S
