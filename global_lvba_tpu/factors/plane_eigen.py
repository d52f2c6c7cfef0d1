"""Batched BALM planar eigenvalue factor: cost, gradient, Gauss-Newton Hessian.

This is the TPU-native re-design of VOX_HESS::acc_evaluate2 /
evaluate_only_residual (/root/reference/include/BALM/bavoxel.hpp:68-203).
The reference iterates voxels on 16 CPU threads, doing per-voxel 3x3
eigendecomposition and per-pose-pair 6x6 analytic Hessian blocks.  Here the
same math is one fused batched computation over all voxels at once:

  * per-(voxel, frame) body-frame moment stats arrive as dense (V, K)
    arrays (K = max observing frames in the occupancy bucket, zero-padded);
  * moment transforms are einsums, the eigendecomposition is the closed-form
    `ops.eigh3x3`, and the W x W block-Hessian is assembled with one
    segment-sum scatter over (voxel, frame-pair) contributions;
  * the per-pair algebra is refactored so every (k, l) pair — including the
    diagonal — shares one formula set (the reference's upper-triangle +
    mirror loop at bavoxel.hpp:151-173 falls out automatically by symmetry).

Cost convention matches the reference exactly: per-voxel cost is λ_min of
the aggregated world covariance, total residual is the sum over voxels
(averaged by the LM driver under AVG_THR, bavoxel.hpp:634-635).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..map.voxelize import PlaneFactorBucket
from ..ops.eigh3 import eigh3x3
from ..geometry.so3 import hat


class PlaneFactorArrays(NamedTuple):
    """Device-side mirror of PlaneFactorBucket."""

    n: jnp.ndarray      # (V, K) f32
    mu: jnp.ndarray     # (V, K, 3) f32
    Pc: jnp.ndarray     # (V, K, 3, 3) f32
    frame: jnp.ndarray  # (V, K) i32


def bucket_to_device(b: PlaneFactorBucket, dtype=jnp.float32) -> PlaneFactorArrays:
    return PlaneFactorArrays(
        n=jnp.asarray(b.n, dtype=dtype),
        mu=jnp.asarray(b.mu, dtype=dtype),
        Pc=jnp.asarray(b.Pc, dtype=dtype),
        frame=jnp.asarray(b.frame, dtype=jnp.int32),
    )


def _aggregate(fa: PlaneFactorArrays, R: jnp.ndarray, p: jnp.ndarray):
    """World-frame covariance per voxel from body moments + poses.

    Uses the parallel-axis form (centered per-frame scatter) instead of the
    reference's raw Σxxᵀ aggregation (bavoxel.hpp:90-98) — algebraically
    identical, numerically stable in f32.
    Returns (mask, N, vbar, cov, Rk, pk, m).
    """
    mask = fa.n > 0
    Rk = R[fa.frame]                       # (V, K, 3, 3)
    pk = p[fa.frame]                       # (V, K, 3)
    m = jnp.einsum("vkij,vkj->vki", Rk, fa.mu) + pk
    S = jnp.einsum("vkia,vkab,vkjb->vkij", Rk, fa.Pc, Rk)
    N = jnp.sum(fa.n, axis=-1)             # (V,)
    N_safe = jnp.where(N > 0, N, 1.0)
    vbar = jnp.sum(fa.n[..., None] * m, axis=-2) / N_safe[..., None]
    d = m - vbar[:, None, :]
    S_tot = jnp.sum(
        S + fa.n[..., None, None] * (d[..., :, None] * d[..., None, :]), axis=1
    )
    cov = S_tot / N_safe[..., None, None]
    return mask, N, N_safe, vbar, cov, Rk, pk, m


def plane_cost(fa: PlaneFactorArrays, R: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Sum over voxels of λ_min (evaluate_only_residual, bavoxel.hpp:176-203)."""
    mask, N, _, _, cov, _, _, _ = _aggregate(fa, R, p)
    lams, _ = eigh3x3(cov)
    voxel_valid = N > 0
    return jnp.sum(jnp.where(voxel_valid, lams[..., 0], 0.0))


def _per_voxel_hess(fa: PlaneFactorArrays, R: jnp.ndarray, p: jnp.ndarray, W: int):
    """Core: (residual_sum, grad_scatter, diag_scatter, pair_scatter) pieces.

    Returns flattened scatter contributions; caller segment-sums them.
    """
    V, K = fa.n.shape
    mask, N, N_safe, vbar, cov, Rk, pk, m = _aggregate(fa, R, p)
    lams, U = eigh3x3(cov)
    lam0 = lams[..., 0]
    uk = U[..., :, 0]                                  # (V, 3)
    resid = jnp.sum(jnp.where(N > 0, lam0, 0.0))

    # umumT = Σ_{i≠0} 2/(λ0-λi) u_i u_iᵀ  (bavoxel.hpp:107-110), guarded.
    # floor keeps 2/den finite in f32 even for all-padding voxels (cov == 0)
    scale = jnp.maximum(jnp.abs(lams[..., 2]), 1e-20)
    H_umum = jnp.zeros((V, 3, 3), dtype=cov.dtype)
    for i in (1, 2):
        ui = U[..., :, i]
        den = lam0 - lams[..., i]
        den = jnp.where(jnp.abs(den) < 1e-9 * scale, -1e-9 * scale, den)
        H_umum = H_umum + (2.0 / den)[..., None, None] * (
            ui[..., :, None] * ui[..., None, :]
        )

    nmask = fa.n * mask                                 # (V, K)
    invN = 1.0 / N_safe
    # per-entry quantities
    RiTuk = jnp.einsum("vkji,vj->vki", Rk, uk)          # Rᵀ u  (V,K,3)
    vi = nmask[..., None] * fa.mu                       # (V,K,3)
    w = jnp.cross(vi, RiTuk)                            # viRiTuk (V,K,3)
    ti_v = pk - vbar[:, None, :]                        # (V,K,3)
    a = jnp.einsum("vj,vkj->vk", uk, ti_v)              # ukᵀ ti_v
    mu_dot = jnp.einsum("vkj,vkj->vk", fa.mu, RiTuk)
    PiRiTuk = (
        jnp.einsum("vkab,vkb->vka", fa.Pc, RiTuk)
        + nmask[..., None] * fa.mu * mu_dot[..., None]
    )
    combo1 = hat(PiRiTuk) + hat(vi) * a[..., None, None]
    combo2 = jnp.einsum("vkij,vkj->vki", Rk, vi) + nmask[..., None] * ti_v
    RiTukhat = hat(RiTuk)
    # R Pi = R Pc + n (R μ) μᵀ
    Rmu = jnp.einsum("vkij,vkj->vki", Rk, fa.mu)
    RPi = jnp.einsum("vkia,vkab->vkib", Rk, fa.Pc) + nmask[..., None, None] * (
        Rmu[..., :, None] * fa.mu[..., None, :]
    )
    tivT = ti_v[..., :, None] * vi[..., None, :]
    Auk_rot = jnp.einsum(
        "vkab,vkbc->vkac", RPi + tivT, RiTukhat
    ) - jnp.einsum("vkab,vkbc->vkac", Rk, combo1)
    c2u = jnp.einsum("vkj,vj->vk", combo2, uk)
    eye3 = jnp.eye(3, dtype=cov.dtype)
    Auk_tr = combo2[..., :, None] * uk[:, None, None, :] + c2u[..., None, None] * eye3
    Auk = jnp.concatenate([Auk_rot, Auk_tr], axis=-1) * invN[:, None, None, None]
    Auk = Auk * mask[..., None, None]

    jjt = jnp.einsum("vkab,va->vkb", Auk, uk)           # (V,K,6)

    # ---- diagonal extras (bavoxel.hpp:140-148 minus the shared -2/N² wwᵀ) ----
    Pi_RiTuk_hat = jnp.einsum("vkab,vkbc->vkac", RiTukhat,
                              fa.Pc + nmask[..., None, None] *
                              (fa.mu[..., :, None] * fa.mu[..., None, :]))
    D_rr = (2.0 * invN)[:, None, None, None] * jnp.einsum(
        "vkab,vkbc->vkac", combo1 - Pi_RiTuk_hat, RiTukhat
    ) - 0.5 * hat(jjt[..., 0:3])
    ukukT = uk[..., :, None] * uk[..., None, :]
    D_rt = (2.0 * invN)[:, None, None, None] * (w[..., :, None] * uk[:, None, None, :])
    D_tt = (2.0 * invN)[:, None, None, None] * nmask[..., None, None] * ukukT[:, None]
    D = jnp.concatenate(
        [
            jnp.concatenate([D_rr, D_rt], axis=-1),
            jnp.concatenate([jnp.swapaxes(D_rt, -1, -2), D_tt], axis=-1),
        ],
        axis=-2,
    )
    D = D * mask[..., None, None]

    # ---- all-pairs blocks (k, l) — shared formulas, symmetric by design ----
    # base: Auk_kᵀ umumT Auk_l  (bavoxel.hpp:141,159)
    G = jnp.einsum("vab,vkbm->vkam", H_umum, Auk)       # (V,K,3,6)
    P_base = jnp.einsum("vkam,vlan->vklmn", Auk, G)      # (V,K,K,6,6)
    invN2 = invN * invN
    w_uk = w[..., :, None] * uk[:, None, None, :]        # outer(w_k, uk)
    # rr: -2/N² w_k w_lᵀ ; rt: -2 n_l/N² (w_k ukᵀ) ; tr = rtᵀ-swap; tt: -2 n_k n_l/N² ukukᵀ
    P_rr = (-2.0 * invN2)[:, None, None, None, None] * (
        w[:, :, None, :, None] * w[:, None, :, None, :]
    )
    P_rt = (-2.0 * invN2)[:, None, None, None, None] * (
        w_uk[:, :, None] * nmask[:, None, :, None, None]
    )
    P_tr = (-2.0 * invN2)[:, None, None, None, None] * (
        jnp.swapaxes(w_uk, -1, -2)[:, None, :] * nmask[:, :, None, None, None]
    )
    P_tt = (-2.0 * invN2)[:, None, None, None, None] * (
        ukukT[:, None, None] * (nmask[:, :, None] * nmask[:, None, :])[..., None, None]
    )
    P_corr_top = jnp.concatenate([P_rr, P_rt], axis=-1)
    P_corr_bot = jnp.concatenate([P_tr, P_tt], axis=-1)
    P_full = P_base + jnp.concatenate([P_corr_top, P_corr_bot], axis=-2)
    pair_mask = (mask[:, :, None] & mask[:, None, :])
    P_full = P_full * pair_mask[..., None, None]

    # flatten scatter targets
    fid = fa.frame
    grad_flat = jjt.reshape(V * K, 6)
    grad_ids = fid.reshape(V * K)
    diag_flat = D.reshape(V * K, 6, 6)
    pair_ids = (fid[:, :, None] * W + fid[:, None, :]).reshape(V * K * K)
    pair_flat = P_full.reshape(V * K * K, 6, 6)
    return resid, grad_flat, grad_ids, diag_flat, pair_ids, pair_flat


def plane_cost_grad_hess(
    fa: PlaneFactorArrays,
    R: jnp.ndarray,
    p: jnp.ndarray,
    num_frames: int,
    chunk_bytes: int = 128 * 1024 * 1024,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Total (residual, gradient (W,6), Hessian (W,6,W,6)) over a bucket.

    Chunked over voxels with lax.map so peak memory stays bounded by
    `chunk_bytes` for the (chunk, K, K, 6, 6) pair tensor.
    """
    V, K = fa.n.shape
    W = num_frames
    per_vox_bytes = K * K * 36 * 4
    chunk = max(1, min(V, chunk_bytes // max(per_vox_bytes, 1)))
    n_chunks = -(-V // chunk)
    Vpad = n_chunks * chunk

    def pad(x):
        cfg = [(0, Vpad - V)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, cfg).reshape((n_chunks, chunk) + x.shape[1:])

    fa_p = PlaneFactorArrays(pad(fa.n), pad(fa.mu), pad(fa.Pc), pad(fa.frame))

    def one_chunk(fa_c: PlaneFactorArrays):
        resid, g_flat, g_ids, d_flat, p_ids, p_flat = _per_voxel_hess(fa_c, R, p, W)
        g = jax.ops.segment_sum(g_flat, g_ids, num_segments=W)
        Hd = jax.ops.segment_sum(d_flat, g_ids, num_segments=W)
        Hp = jax.ops.segment_sum(p_flat, p_ids, num_segments=W * W)
        return resid, g, Hd, Hp

    resids, gs, Hds, Hps = jax.lax.map(one_chunk, fa_p)
    resid = jnp.sum(resids)
    g = jnp.sum(gs, axis=0)                              # (W, 6)
    Hd = jnp.sum(Hds, axis=0)                            # (W, 6, 6)
    Hp = jnp.sum(Hps, axis=0).reshape(W, W, 6, 6)
    H = Hp.at[jnp.arange(W), jnp.arange(W)].add(Hd)
    H = jnp.transpose(H, (0, 2, 1, 3))                   # (W, 6, W, 6)
    return resid, g, H
