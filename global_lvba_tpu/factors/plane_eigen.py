"""Batched BALM planar eigenvalue factor: cost, gradient, Gauss-Newton Hessian.

This is the TPU-native re-design of VOX_HESS::acc_evaluate2 /
evaluate_only_residual (/root/reference/include/BALM/bavoxel.hpp:68-203).
The reference iterates voxels on 16 CPU threads, doing per-voxel 3x3
eigendecomposition and per-pose-pair 6x6 analytic Hessian blocks.  Here the
same math is one fused batched computation over all voxels at once:

  * per-(voxel, frame) body-frame moment stats arrive as dense (V, K)
    arrays (K = max observing frames in the occupancy bucket, zero-padded);
  * the production path is structure-of-arrays: every vector/matrix
    component is its own (V, K) plane (perfect TPU tiling), the
    eigendecomposition is componentwise closed-form (ops.eigh3_soa), and
    the full cross-pose block Hessian is ONE negative Gram matmul -MᵀM
    over three factor rows per voxel (the eigen-perturbation rows B·A_k
    plus a rank-1 correction row √2/N·[w; n·u]);
  * the per-pair algebra is refactored so every (k, l) pair — including the
    diagonal — shares one formula set (the reference's upper-triangle +
    mirror loop at bavoxel.hpp:151-173 falls out automatically by symmetry);
  * an array-of-structs formulation (_per_voxel_core/_chunk_eval) is kept
    as a readable oracle, cross-checked in tests.

Cost convention matches the reference exactly: per-voxel cost is λ_min of
the aggregated world covariance, total residual is the sum over voxels
(averaged by the LM driver under AVG_THR, bavoxel.hpp:634-635).
"""

from __future__ import annotations

import os
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..map.voxelize import PlaneFactorBucket
from ..ops.eigh3 import eigh3x3, eigh3_soa, eigvals3_soa
from ..geometry.so3 import hat


def _gram_precision():
    """Matmul precision of the -MᵀM Gram only (selection matmuls use the
    exact bf16-split scheme below — they must not round the factor rows).
    f32 HIGHEST is six bf16 passes; HIGH three; DEFAULT one (~2^-8
    relative per product, f32 accumulation).

    Default DEFAULT by measurement (TPU v5e, round-5 gate sweep):
    converged ATE is bit-identical on the w512 (0.000673) and w50
    (0.002227, residual to 8 decimals) fixtures and within 0.2% of the
    noise floor on the corridor banded path, while W=512 eval drops
    11.1 -> 8.9 ms and the full LM iteration 19.7 -> 16.8.  Safe because
    the Gram feeds only H (curvature): the LM residual/acceptance path
    never sees it, so Gram rounding perturbs step QUALITY at worst and
    the Nielsen test rejects any step it degrades.  LVBA_GRAM_PRECISION
    restores high/highest."""
    name = os.environ.get("LVBA_GRAM_PRECISION", "default").lower()
    return {
        "default": jax.lax.Precision.DEFAULT,
        "high": jax.lax.Precision.HIGH,
        "highest": jax.lax.Precision.HIGHEST,
    }[name]


def _use_exact_bf16_dots(dt) -> bool:
    """The exact-selection dot scheme applies on TPU f32: MXU passes take
    bf16 operands natively, so a 0/1 one-hot in bf16 times a 3-way
    bf16-split of the values reproduces the f32 selection EXACTLY in 3
    single-pass dots (vs 6 passes for HIGHEST, which is what selection
    previously ran at).  f64 (CPU parity/oracle runs) keeps real dots.
    LVBA_EXACT_DOTS: "0" disables (A/B measurement), "force" enables on
    any backend (CPU equality tests of this exact path)."""
    flag = os.environ.get("LVBA_EXACT_DOTS", "1")
    if flag == "force":
        return dt == jnp.float32
    return (flag == "1" and dt == jnp.float32
            and jax.default_backend() == "tpu")


def _sel_kernel_enabled(dt) -> bool:
    """Pallas selection kernels (ops/pallas/selection.py): the one-hot
    operand is generated per-tile in VMEM instead of materializing
    (VK, W) in HBM (~810 MB at the W=512 scene).  Same exact bf16-split
    scheme.  Default OFF by measurement (TPU v5e, W=512): the kernels
    LOST to the XLA materialized-one-hot dots — 16.4 vs 12.9 ms/eval at
    t=4096 tiles (17.2 at t=512); XLA evidently overlaps the one-hot
    traffic better than the sequential-grid kernels.  LVBA_SEL_KERNEL:
    "1" enables on TPU, "force" enables off-TPU (interpret mode, for the
    CPU equality tests)."""
    flag = os.environ.get("LVBA_SEL_KERNEL", "0")
    if flag == "force":
        return dt == jnp.float32
    return (flag == "1" and dt == jnp.float32
            and jax.default_backend() == "tpu")


def _split3_bf16(x):
    """x == x0 + x1 + x2 with every term exactly bf16-representable: three
    8-bit mantissa slices cover f32's 24 bits (values here are O(1) pose /
    moment entries, far from the bf16 subnormal range).

    The rounding MUST go through lax.reduce_precision, not astype: under
    --xla_allow_excess_precision (set by this TPU runtime) XLA elides
    bf16->f32->bf16 cast chains and then collapses the three split dots
    into ONE default-precision pass — measured: outputs came back
    bf16-quantized and the W=512 ATE regressed 0.000673 -> 0.0039.
    reduce_precision is semantically a hard rounding and blocks the
    rewrite."""
    rp = lambda v: jax.lax.reduce_precision(v, 8, 7)
    x0 = rp(x)
    r = x - x0
    x1 = rp(r)
    x2 = rp(r - x1)
    bf = jnp.bfloat16
    return x0.astype(bf), x1.astype(bf), x2.astype(bf)


def _exact_sel_dot(values, onehot_bf, dn, values_left: bool,
                   pack_axis: int, out_axis: int):
    """dot_general between f32 `values` and a bf16 0/1 `onehot_bf` with
    EXACT f32 selection semantics: each split term's products are exact
    (bf16 x {0,1} -> f32 accumulate), and the three partials sum back to
    the full mantissa.  Exactness is load-bearing — the selected factor
    rows feed the Gram Hessian and a HIGH-precision selection measurably
    perturbs the LM trajectory.

    The three splits are PACKED along the values' free axis (`pack_axis`,
    widening it 3x; `out_axis` is where it lands in the output) so the
    whole selection is ONE single-pass bf16 dot — 3x fewer MXU passes
    than summing three dots, and the big one-hot operand streams from
    HBM once instead of three times."""
    dt = values.dtype
    t = jnp.concatenate(_split3_bf16(values), axis=pack_axis)
    lhs, rhs = (t, onehot_bf) if values_left else (onehot_bf, t)
    d = jax.lax.dot_general(
        lhs, rhs, dimension_numbers=dn, preferred_element_type=dt
    )
    C = values.shape[pack_axis]
    sl = lambda i: jax.lax.slice_in_dim(d, i * C, (i + 1) * C, axis=out_axis)
    return sl(0) + sl(1) + sl(2)


class PlaneFactorArrays(NamedTuple):
    """Device-side mirror of PlaneFactorBucket."""

    n: jnp.ndarray      # (V, K) f32
    mu: jnp.ndarray     # (V, K, 3) f32
    Pc: jnp.ndarray     # (V, K, 3, 3) f32
    frame: jnp.ndarray  # (V, K) i32


class AlignedPlaneFactorArrays(NamedTuple):
    """Frame-ALIGNED dense factor layout: slot k IS frame k.

    Every voxel row spans the full frame axis (V, W); cells the voxel does
    not observe carry n == 0 and contribute exactly zero through the same
    masking the padded buckets rely on.  The payoff is structural: all
    three frame-selection contractions of the bucketed evaluation
    disappear —

      * pose expansion   -> a (1, W) broadcast of the pose channels,
      * g / Hd assembly  -> a plain sum over the voxel axis,
      * the M factor-row expansion -> the identity (rows ARE (V, W, 18)).

    The (VK, W) one-hot those contractions share is the measured bulk of
    the W=512 evaluation (~5-9 ms of 11.2: its VPU compare-generation
    cost, scripts/probe_selection_sites.py), so on dense (voxel, frame)
    occupancy this layout removes the dominant non-Gram cost outright.
    Chosen host-side by a density gate (factors/padding.py): dense cells
    V·W must be within LVBA_ALIGNED_RATIO (default 2.5x) of the bucketed
    entry count — window BA (every voxel sees most frames) and the W=512
    bench scene qualify; sparse corridors at large W keep the bucketed /
    banded layouts.

    Replaces the same reference math as PlaneFactorArrays
    (acc_evaluate2, /root/reference/include/BALM/bavoxel.hpp:68-174)."""

    n: jnp.ndarray      # (V, W) f32
    mu: jnp.ndarray     # (V, W, 3) f32
    Pc: jnp.ndarray     # (V, W, 3, 3) f32

    @property
    def frame(self) -> jnp.ndarray:
        """Slot index == frame id (compatibility with frame-consuming
        helpers; the fast paths never materialize this)."""
        V, Wd = self.n.shape
        return jnp.broadcast_to(
            jnp.arange(Wd, dtype=jnp.int32)[None, :], (V, Wd)
        )


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
    return plane_cost_soa(fa, R, p)


def plane_cost_aos(fa: PlaneFactorArrays, R: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Array-of-structs formulation (reference/oracle path for tests)."""
    mask, N, _, _, cov, _, _, _ = _aggregate(fa, R, p)
    lams, _ = eigh3x3(cov)
    voxel_valid = N > 0
    return jnp.sum(jnp.where(voxel_valid, lams[..., 0], 0.0))


def _per_voxel_core(fa: PlaneFactorArrays, R: jnp.ndarray, p: jnp.ndarray, W: int):
    """Shared per-entry quantities for both Hessian formulations.

    Returns (resid, mask, nmask, N_safe, uk, Auk (V,K,3,6), w (V,K,3),
    jjt (V,K,6), D (V,K,6,6) diagonal extras, B (V,2,3) with
    umumT == -BᵀB).
    """
    V, K = fa.n.shape
    mask, N, N_safe, vbar, cov, Rk, pk, m = _aggregate(fa, R, p)
    lams, U = eigh3x3(cov)
    lam0 = lams[..., 0]
    uk = U[..., :, 0]                                  # (V, 3)
    resid = jnp.sum(jnp.where(N > 0, lam0, 0.0))

    # umumT = Σ_{i≠0} 2/(λ0-λi) u_i u_iᵀ  (bavoxel.hpp:107-110).  With
    # ascending eigenvalues λi - λ0 >= 0, so umumT is negative semidefinite
    # and factors as -BᵀB with B rows sqrt(2/(λi-λ0)) u_iᵀ — the key to the
    # Gram-matrix Hessian assembly below.  The floor keeps the factor finite
    # in f32 for degenerate/padding voxels (cov == 0).
    scale = jnp.maximum(jnp.abs(lams[..., 2]), 1e-20)
    B_rows = []
    for i in (1, 2):
        ui = U[..., :, i]
        den = jnp.maximum(lams[..., i] - lam0, 1e-9 * scale)
        B_rows.append(jnp.sqrt(2.0 / den)[..., None] * ui)
    B = jnp.stack(B_rows, axis=-2)                      # (V, 2, 3)

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

    return resid, mask, nmask, N_safe, uk, Auk, w, jjt, D, B


def _chunk_eval(fa_c: PlaneFactorArrays, R, p, W: int):
    """One voxel chunk -> (resid, grad (W,6), diag (W,6,6), M (V, W, 3, 6)).

    The full cross-pose Hessian contribution of the chunk is the negative
    Gram matrix -MᵀM.  Per voxel, three factor rows span all pair blocks:

      rows 0-1:  B · Auk_k placed at frame f_k   (Auk_kᵀ umumT Auk_l
                 = -(B Auk_k)ᵀ (B Auk_l), bavoxel.hpp:141,159)
      row 2:     sqrt(2)/N · [w_k ; n_k u_k]     (all four rank-1
                 correction blocks -2/N² [w;nu]_k [w;nu]_lᵀ,
                 bavoxel.hpp:142-146,160-163 unified over k == l and k != l)

    This replaces the reference's per-pair 6x6 block loops with one MXU
    matmul over the stacked factor matrix — the key speed-of-light
    restructuring of acc_evaluate2.
    """
    V, K = fa_c.n.shape
    resid, mask, nmask, N_safe, uk, Auk, w, jjt, D, B = _per_voxel_core(
        fa_c, R, p, W
    )
    fid = fa_c.frame
    # scatter-free accumulation: TPU scatters serialize, so every
    # frame-indexed reduction is a one-hot contraction on the MXU instead
    onehot = (fid[..., None] == jnp.arange(W, dtype=fid.dtype)).astype(Auk.dtype)
    g = jnp.einsum("vkw,vkb->wb", onehot, jjt)
    Hd = jnp.einsum("vkw,vkab->wab", onehot, D)

    BA = jnp.einsum("vab,vkbm->vkam", B, Auk)            # (V, K, 2, 6)
    c = jnp.concatenate(
        [w, nmask[..., None] * uk[:, None, :]], axis=-1
    )                                                     # (V, K, 6)
    c = (jnp.sqrt(2.0) / N_safe)[:, None, None] * c
    rows = jnp.concatenate([BA, c[:, :, None, :]], axis=2)  # (V, K, 3, 6)
    rows = rows * mask[..., None, None]
    M = jnp.einsum("vkw,vkrc->vwrc", onehot, rows)        # (V, W, 3, 6)
    return resid, g, Hd, M


def plane_cost_grad_hess(
    fa: PlaneFactorArrays,
    R: jnp.ndarray,
    p: jnp.ndarray,
    num_frames: int,
    chunk_bytes: int = 256 * 1024 * 1024,
    inv: jnp.ndarray = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Total (residual, gradient (W,6), Hessian (W,6,W,6)) over a bucket.

    Gram-matrix assembly: H = scatter(diag extras) - Σ_chunks M_cᵀ M_c,
    chunked over voxels so the (V, W, 3, 6) factor matrix stays within
    `chunk_bytes`.  inv: optional frame_slot_table(fa, W) — switches the
    frame expansion from one-hot matmuls to the gather path — or a
    GatherPlan, which additionally reduces g/Hd frame-major and emits the
    Gram operand in (3V, 6W) layout (_cgh_gather)."""
    if isinstance(inv, GatherPlan):
        return _cgh_gather(fa, R, p, num_frames, inv, chunk_bytes)
    V, K = fa.n.shape
    W = num_frames
    aligned = isinstance(fa, AlignedPlaneFactorArrays)
    if aligned and K != W:
        raise ValueError(
            f"aligned bucket width {K} != solve width {W}; build it with "
            f"buckets_to_device(vm, W={W})"
        )
    # per-voxel live bytes: the (W, 18) factor-row block, its transpose
    # copy, and the (K, W) one-hot matrix (aligned: the 60 output
    # channels instead — there is no one-hot)
    per_vox_bytes = (
        (W * 18 * 2 + W * 60) * 4 if aligned
        else (W * 18 * 2 + K * W) * 4
    )
    chunk = max(1, min(V, chunk_bytes // max(per_vox_bytes, 1)))
    n_chunks = -(-V // chunk)
    Vpad = n_chunks * chunk

    def pad(x):
        cfg = [(0, Vpad - V)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, cfg).reshape((n_chunks, chunk) + x.shape[1:])

    if aligned:
        fa_p = AlignedPlaneFactorArrays(pad(fa.n), pad(fa.mu), pad(fa.Pc))
    else:
        fa_p = PlaneFactorArrays(
            pad(fa.n), pad(fa.mu), pad(fa.Pc), pad(fa.frame)
        )
    # padded voxels have all-zero factor data, so any slot their inv rows
    # point at gathers zeros — the pad fill value is irrelevant
    inv_p = pad(inv) if inv is not None else None

    def body(carry, fa_c, inv_c=None):
        resid_a, g_a, Hd_a, H_a = carry
        resid, g, Hd, M = _chunk_eval_soa(fa_c, R, p, W, inv_c)
        # H[w1,c1,w2,c2] -= sum_{v,r} M[v,w1,r,c1] M[v,w2,r,c2]: a multi-dim
        # dot_general straight off the one-hot dot's native (V, W, 3, 6)
        # layout — relayouting M to (3V, 6W) for a 2-D jnp.dot measured 32%
        # slower at W = 512 (the transpose dominated the matmul)
        H_a = H_a - jax.lax.dot_general(
            M, M, dimension_numbers=(((0, 2), (0, 2)), ((), ())),
            preferred_element_type=M.dtype,
            precision=_gram_precision(),
        )
        return (resid_a + resid, g_a + g, Hd_a + Hd, H_a), None

    # derive the zero carry from the (possibly shard_map-varying) factor
    # data so the scan carry has consistent varying-axis types under
    # shard_map manual partitioning
    zvar = (fa.n.ravel()[0] * 0).astype(R.dtype)
    init = (
        zvar,
        jnp.zeros((W, 6), R.dtype) + zvar,
        jnp.zeros((W, 6, 6), R.dtype) + zvar,
        jnp.zeros((W, 6, W, 6), R.dtype) + zvar,
    )
    if n_chunks <= 16 or inv_p is not None:
        # unroll at trace time: a lax.scan lowers to a while loop whose
        # body XLA schedules in isolation — measured 25% slower than the
        # same chunks unrolled (W=512, TPU v5e); memory stays bounded by
        # chunk_bytes either way
        carry = init
        for c in range(n_chunks):
            fa_c = (
                AlignedPlaneFactorArrays(fa_p.n[c], fa_p.mu[c], fa_p.Pc[c])
                if aligned else PlaneFactorArrays(
                    fa_p.n[c], fa_p.mu[c], fa_p.Pc[c], fa_p.frame[c]
                )
            )
            carry, _ = body(
                carry, fa_c, inv_p[c] if inv_p is not None else None
            )
        resid, g, Hd, Hq = carry
    else:
        (resid, g, Hd, Hq), _ = jax.lax.scan(body, init, fa_p)
    H = add_block_diag(Hq, Hd, W)
    return resid, g, H



def add_block_diag(H, Hd, W: int):
    """H (W,6,W,6) += diag blocks Hd (W,6,6) as a broadcast masked add.
    An .at[arange, :, arange, :].add scatter serializes on TPU — measured
    3.1 ms of the 16 ms W=512 evaluation; the dense masked add is one
    fused elementwise pass over H (~0.15 ms)."""
    eye = (jnp.arange(W)[:, None] == jnp.arange(W)[None, :]).astype(H.dtype)
    return H + eye[:, None, :, None] * Hd[:, :, None, :]


class GatherPlan(NamedTuple):
    """Host-built gather tables for the one-hot-free factor evaluation:
    `inv` (V, W) frame->slot selection (frame_slot_table) expands the
    factor rows to the Gram layout; `tbl` (W, Kf) frame-major entry table
    (frame_gather_table) reduces g/Hd at O(V·K) without expanding the
    42 jjt/D channels to width W at all."""

    inv: jnp.ndarray   # (V, W) int32
    tbl: jnp.ndarray   # (W, Kf) int32


def build_gather_plan(fa: PlaneFactorArrays, W: int) -> GatherPlan:
    return GatherPlan(frame_slot_table(fa, W), frame_gather_table(fa, W))


def _cgh_gather(
    fa: PlaneFactorArrays, R, p, W: int, plan: GatherPlan, chunk_bytes: int
):
    """Gather-plan factor evaluation -> (resid, g (W,6), H (W,6,W,6)).

    Differences from the (V, W, 60)-expansion gather path (`inv` array):

      * g/Hd reduce through the frame-major table (segsum_table) straight
        off the compact (V, K) per-entry outputs — the 42 jjt/D channels
        never expand to width W (225 MB/eval saved at the representative
        W = 512 scene);
      * the factor matrix is emitted DIRECTLY in (3V, 6W) layout by
        gathering the (V, 3, K, 6)-transposed rows with a row-tripled
        slot table, so the Gram is a single 2-D AᵀA dot_general with no
        relayout between the gather and the matmul (the (V, W, 3, 6)
        multi-dim Gram needed XLA to transpose internally);
      * `LVBA_GRAM_KERNEL=pallas` swaps the XLA full Gram for the
        lower-triangle Pallas SYRK (ops/pallas/gram.py) — half the
        matmul flops, measured choice.
    """
    V, K = fa.n.shape
    dt = R.dtype
    resid, jjt6, D36, rows18 = _soa_core(fa, R, p, W)
    g = segsum_table(jjt6.reshape(V * K, 6), plan.tbl)
    Hd = segsum_table(D36.reshape(V * K, 36), plan.tbl).reshape(W, 6, 6)

    use_pallas = os.environ.get("LVBA_GRAM_KERNEL", "xla") == "pallas"
    r36 = jnp.swapaxes(rows18.reshape(V, K, 3, 6), 1, 2)   # (V, 3, K, 6)
    chunk = max(1, min(V, chunk_bytes // (W * 18 * 4 * 2)))
    gram = jnp.zeros((6 * W, 6 * W), dt) + (fa.n.ravel()[0] * 0).astype(dt)
    for lo in range(0, V, chunk):
        hi = min(V, lo + chunk)
        Vc = hi - lo
        rc = r36[lo:hi].reshape(Vc * 3, K, 6)
        rcp = jnp.concatenate([rc, jnp.zeros((Vc * 3, 1, 6), dt)], axis=1)
        inv3 = jnp.repeat(plan.inv[lo:hi], 3, axis=0)      # (3Vc, W)
        A = jnp.take_along_axis(
            rcp, inv3[:, :, None], axis=1
        ).reshape(Vc * 3, 6 * W)
        if use_pallas:
            from ..ops.pallas.gram import syrk

            gram = gram + syrk(
                A,
                precision=os.environ.get(
                    "LVBA_GRAM_PRECISION", "highest"
                ).lower(),
                interpret=jax.default_backend() == "cpu",
            )
        else:
            gram = gram + jax.lax.dot_general(
                A, A, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=dt, precision=_gram_precision(),
            )
    H = add_block_diag((-gram).reshape(W, 6, W, 6), Hd, W)
    return resid, g, H


def frame_slot_table(fa: PlaneFactorArrays, W: int) -> jnp.ndarray:
    """Host-built (V, W) int32 inverse table: entry (v, w) is the k-slot of
    the observation of frame w in voxel v, or K (the zero pad row) when v
    is not observed by w.  Each voxel observes a frame at most once, so
    the table is exact — it lets the frame expansion of per-entry values
    be a contiguous-row GATHER instead of a (V·K, W) one-hot matmul whose
    one-hot operand alone is O(V·K·W) HBM traffic per evaluation (~1 GB
    per eval at W = 512 on the representative scene)."""
    frame = np.asarray(fa.frame)
    nn = np.asarray(fa.n)
    V, K = frame.shape
    inv = np.full((V, W), K, np.int32)
    v_idx, k_idx = np.nonzero(nn > 0)
    inv[v_idx, frame[v_idx, k_idx]] = k_idx.astype(np.int32)
    return jnp.asarray(inv)


# ---------------------------------------------------------------------------
# Block-banded Gram assembly (large-W scaling)
# ---------------------------------------------------------------------------
# A voxel's observers are temporally CONTIGUOUS frames (the sensor passes
# through its region once), so each voxel's factor rows touch only a narrow
# column window of the (6W)² Hessian.  Grouping voxels by the frame BLOCK
# their span starts in and Gramming each group at local width 2B cuts the
# Gram flops by ~(2B/W)² versus the dense assembly — the designed scaling
# axis for W >= 2048 global anchor BA (the reference never solves above a
# few hundred poses; bavoxel.hpp:662-767 is dense).


class BandedGroups(NamedTuple):
    """Stacked banded groups of one bucket: G groups of equal padded shape
    (one jit signature per bucket tier regardless of W)."""

    fa: PlaneFactorArrays      # each leaf (G, Vp, K[, ...])
    inv: jnp.ndarray           # (G, Vp, 2B) int32 local frame-slot table
    offset: jnp.ndarray        # (G,) int32 frame offset of each window
    wide_fa: PlaneFactorArrays  # straggler voxels, full-width (may be empty)
    wide_inv: jnp.ndarray      # (Vw, W) int32


class AlignedBandedGroups(NamedTuple):
    """Banded groups in the frame-ALIGNED local layout: slot k of a group
    IS local frame offset+k, so the group evaluation needs NO selection at
    all — local poses arrive by one dynamic_slice of (R, p) at the group
    offset and broadcast, g/Hd are voxel-axis sums, and the Gram operand
    is the rows themselves (the within-window analogue of
    AlignedPlaneFactorArrays; removes the full-width pose one-hot the
    gather-layout group evaluation pays per entry).  Stragglers keep the
    gather layout (full-width, <1% of voxels)."""

    fa: AlignedPlaneFactorArrays  # each leaf (G, Vp, 2B[, ...])
    offset: jnp.ndarray           # (G,) int32 frame offset of each window
    wide_fa: PlaneFactorArrays    # straggler voxels, full-width (may be empty)
    wide_inv: jnp.ndarray         # (Vw, W) int32


def build_banded_groups(
    fa: PlaneFactorArrays, W: int, block: int = None,
    aligned: bool = False,
) -> BandedGroups:
    """Host-build stacked banded voxel groups for one bucket.

    Every non-straggler group gets the SAME local width 2B with a
    host-chosen frame offset (the last window is shifted left so it stays
    in range) and the same padded voxel count, so the whole band evaluates
    as one lax.scan.  Voxels whose observer span exceeds two blocks go to
    a full-width straggler group.  aligned=True scatters each group's
    entries into the dense (Vp, 2B) local grid instead of carrying a
    frame-slot table (AlignedBandedGroups)."""
    frame = np.asarray(fa.frame)
    nn = np.asarray(fa.n)
    mu = np.asarray(fa.mu)
    Pc = np.asarray(fa.Pc)
    V, K = frame.shape
    valid = nn > 0
    any_valid = valid.any(axis=1)
    fbig = np.where(valid, frame, W)
    fsml = np.where(valid, frame, -1)
    fmin = np.where(any_valid, fbig.min(axis=1), 0)
    fmax = np.where(any_valid, fsml.max(axis=1), 0)
    span = fmax - fmin + 1
    if block is None:
        # smallest power of two covering the 99th-percentile span: nearly
        # every voxel fits a 2-block window, stragglers go full-width
        p99 = float(np.percentile(span[any_valid], 99)) if any_valid.any() else 1.0
        block = 1 << max(int(np.ceil(np.log2(max(p99, 1.0)))), 3)
    block = min(block, max(W // 2, 1))
    width = min(2 * block, W)
    n_blk = (W + block - 1) // block
    start_blk = fmin // block
    wide = (fmax // block - start_blk) > 1

    def pack(idx, Vp, f_off, w_loc):
        pad = Vp - idx.size
        sub_fa = PlaneFactorArrays(
            n=np.pad(nn[idx], ((0, pad), (0, 0))),
            mu=np.pad(mu[idx], ((0, pad), (0, 0), (0, 0))),
            Pc=np.pad(Pc[idx], ((0, pad), (0, 0), (0, 0), (0, 0))),
            frame=np.pad(frame[idx], ((0, pad), (0, 0))),
        )
        inv = np.full((Vp, w_loc), K, np.int32)
        v_i, k_i = np.nonzero(nn[idx] > 0)
        inv[v_i, frame[idx][v_i, k_i] - f_off] = k_i.astype(np.int32)
        return sub_fa, inv

    def pack_aligned(idx, Vp, f_off):
        na = np.zeros((Vp, width), nn.dtype)
        mua = np.zeros((Vp, width, 3), mu.dtype)
        Pca = np.zeros((Vp, width, 3, 3), Pc.dtype)
        v_i, k_i = np.nonzero(nn[idx] > 0)
        loc = frame[idx][v_i, k_i] - f_off
        na[v_i, loc] = nn[idx][v_i, k_i]
        mua[v_i, loc] = mu[idx][v_i, k_i]
        Pca[v_i, loc] = Pc[idx][v_i, k_i]
        return na, mua, Pca

    idxs, offs = [], []
    for s in range(n_blk):
        idx = np.flatnonzero(any_valid & ~wide & (start_blk == s))
        if idx.size == 0:
            continue
        idxs.append(idx)
        offs.append(min(s * block, W - width))
    Vp = max(8, 1 << int(np.ceil(np.log2(max(
        [i.size for i in idxs], default=1)))))
    if not idxs:
        idxs = [np.zeros(0, np.int64)]
        offs = [0]
    offset = jnp.asarray(np.asarray(offs, np.int32))

    wid = np.flatnonzero(any_valid & wide)
    # Vw = 0 when there are no stragglers: a padded non-empty straggler
    # group would cost a full (6W)² Gram of zeros per evaluation
    Vw = 0 if wid.size == 0 else max(8, 1 << int(np.ceil(np.log2(wid.size))))
    wfa, winv = pack(wid, Vw, 0, W)
    wide_fa = PlaneFactorArrays(
        n=jnp.asarray(wfa.n), mu=jnp.asarray(wfa.mu),
        Pc=jnp.asarray(wfa.Pc), frame=jnp.asarray(wfa.frame),
    )
    if aligned:
        packs = [pack_aligned(i, Vp, o) for i, o in zip(idxs, offs)]
        stacked_a = AlignedPlaneFactorArrays(
            n=jnp.asarray(np.stack([pk[0] for pk in packs])),
            mu=jnp.asarray(np.stack([pk[1] for pk in packs])),
            Pc=jnp.asarray(np.stack([pk[2] for pk in packs])),
        )
        return AlignedBandedGroups(
            fa=stacked_a, offset=offset,
            wide_fa=wide_fa, wide_inv=jnp.asarray(winv),
        )
    fas, invs = zip(*[pack(i, Vp, o, width) for i, o in zip(idxs, offs)])
    stacked = PlaneFactorArrays(
        n=jnp.asarray(np.stack([f.n for f in fas])),
        mu=jnp.asarray(np.stack([f.mu for f in fas])),
        Pc=jnp.asarray(np.stack([f.Pc for f in fas])),
        frame=jnp.asarray(np.stack([f.frame for f in fas])),
    )
    inv = jnp.asarray(np.stack(invs))
    return BandedGroups(
        fa=stacked, inv=inv, offset=offset,
        wide_fa=wide_fa, wide_inv=jnp.asarray(winv),
    )


def _banded_group_eval(fa_g, inv_g, off, R, p, width: int):
    """One banded group's (resid, g_local, Hd_local, M (V, width, 3, 6)).

    Aligned groups (slot k == local frame offset+k) take the selection-free
    evaluation with poses dynamic-sliced at the group offset; gather-layout
    groups keep the full-width poses + frame-slot-table path."""
    if isinstance(fa_g, AlignedPlaneFactorArrays):
        z = jnp.zeros((), off.dtype)
        R_loc = jax.lax.dynamic_slice(R, (off, z, z), (width, 3, 3))
        p_loc = jax.lax.dynamic_slice(p, (off, z), (width, 3))
        return _chunk_eval_soa(fa_g, R_loc, p_loc, width)
    return _chunk_eval_soa(fa_g, R, p, width, inv_g)


def banded_scan(fa_s: PlaneFactorArrays, inv_s, offset_s, R, p, W: int):
    """Scan a STACK of equal-shape banded groups -> partial
    (resid, g (W,6), Hd (W,6,6), H (6W,6W) CROSS part): each step
    evaluates its voxels at local width 2B, Grams (12B)², and
    read-modify-writes the H window at its (traced) frame offset via
    dynamic slices.  Factored out of banded_cgh so a mesh can shard the
    group stack (parallel.shard.banded_cgh_sharded) — the partials sum.
    inv_s is None for aligned-layout stacks (AlignedBandedGroups)."""
    dt = R.dtype
    aligned = inv_s is None
    width = fa_s.n.shape[-1] if aligned else inv_s.shape[-1]

    def body(carry, inp):
        resid_a, g_a, Hd_a, H_a = carry
        if aligned:
            fa_g, off = inp
            inv_g = None
        else:
            fa_g, inv_g, off = inp
        r_, g_l, Hd_l, M = _banded_group_eval(fa_g, inv_g, off, R, p, width)
        gram = jax.lax.dot_general(
            M, M, dimension_numbers=(((0, 2), (0, 2)), ((), ())),
            preferred_element_type=dt,
            precision=_gram_precision(),
        ).reshape(6 * width, 6 * width)
        z = jnp.zeros((), off.dtype)
        o6 = 6 * off
        win = jax.lax.dynamic_slice(H_a, (o6, o6), (6 * width, 6 * width))
        H_a = jax.lax.dynamic_update_slice(H_a, win - gram, (o6, o6))
        gw = jax.lax.dynamic_slice(g_a, (off, z), (width, 6))
        g_a = jax.lax.dynamic_update_slice(g_a, gw + g_l, (off, z))
        hw = jax.lax.dynamic_slice(Hd_a, (off, z, z), (width, 6, 6))
        Hd_a = jax.lax.dynamic_update_slice(Hd_a, hw + Hd_l, (off, z, z))
        return (resid_a + r_, g_a, Hd_a, H_a), None

    zvar = (fa_s.n.ravel()[0] * 0).astype(dt)
    init = (
        zvar,
        jnp.zeros((W, 6), dt) + zvar,
        jnp.zeros((W, 6, 6), dt) + zvar,
        jnp.zeros((6 * W, 6 * W), dt) + zvar,
    )
    xs = (fa_s, offset_s) if aligned else (fa_s, inv_s, offset_s)
    (resid, g, Hd, H), _ = jax.lax.scan(body, init, xs)
    return resid, g, Hd, H


def banded_scan_grams(fa_s: PlaneFactorArrays, inv_s, offset_s, R, p, W: int):
    """Like banded_scan but WITHOUT materializing the dense (6W)² cross
    Hessian: returns (resid, g (W,6), Hd (W,6,6), grams (G, 6w, 6w)).

    The dense H at W = 4096 is a 2.4 GB buffer whose compile the tunnel's
    service rejects (measured: the banded eval executable is the one that
    500s, scripts/probe_w4096.py); the group Grams total
    G·(6w)² ≈ (2B/W)·(6W)² — a 4096-pose corridor fits in ~600 MB and the
    CG consumes them directly (dist_solve.solve_damped_cg_banded).
    inv_s is None for aligned-layout stacks (AlignedBandedGroups)."""
    dt = R.dtype
    aligned = inv_s is None
    width = fa_s.n.shape[-1] if aligned else inv_s.shape[-1]

    def body(carry, inp):
        resid_a, g_a, Hd_a = carry
        if aligned:
            fa_g, off = inp
            inv_g = None
        else:
            fa_g, inv_g, off = inp
        r_, g_l, Hd_l, M = _banded_group_eval(fa_g, inv_g, off, R, p, width)
        gram = jax.lax.dot_general(
            M, M, dimension_numbers=(((0, 2), (0, 2)), ((), ())),
            preferred_element_type=dt,
            precision=_gram_precision(),
        ).reshape(6 * width, 6 * width)
        z = jnp.zeros((), off.dtype)
        gw = jax.lax.dynamic_slice(g_a, (off, z), (width, 6))
        g_a = jax.lax.dynamic_update_slice(g_a, gw + g_l, (off, z))
        hw = jax.lax.dynamic_slice(Hd_a, (off, z, z), (width, 6, 6))
        Hd_a = jax.lax.dynamic_update_slice(Hd_a, hw + Hd_l, (off, z, z))
        return (resid_a + r_, g_a, Hd_a), gram

    zvar = (fa_s.n.ravel()[0] * 0).astype(dt)
    init = (
        zvar,
        jnp.zeros((W, 6), dt) + zvar,
        jnp.zeros((W, 6, 6), dt) + zvar,
    )
    xs = (fa_s, offset_s) if aligned else (fa_s, inv_s, offset_s)
    (resid, g, Hd), grams = jax.lax.scan(body, init, xs)
    return resid, g, Hd, grams


def banded_straggler_rows(bg: BandedGroups, R, p, W: int):
    """Straggler contribution in COMPACT form: (resid, g (W,6),
    Hd (W,6,6), M (Vw, W, 3, 6)) — the caller's matvec applies -MᵀM
    directly (Vw is small by construction, <1% of voxels)."""
    if bg.wide_fa.n.shape[0] == 0:
        dt = R.dtype
        zvar = (bg.fa.n.ravel()[0] * 0).astype(dt)
        return (
            zvar, jnp.zeros((W, 6), dt) + zvar,
            jnp.zeros((W, 6, 6), dt) + zvar,
            jnp.zeros((0, W, 3, 6), dt),
        )
    r, g, Hd, M = _chunk_eval_soa(bg.wide_fa, R, p, W, bg.wide_inv)
    return r, g, Hd, M


def banded_cgh_compact(bg: BandedGroups, R, p, W: int):
    """Full compact banded evaluation of one bucket -> (resid, g, Hd,
    grams (G, 6w, 6w), wide_M (Vw, W, 3, 6)).  Same math as banded_cgh:
    grams hold +MᵀM per group, so
    H = diag-blocks(Hd) - scatter(grams by bg.offset) - wide_Mᵀ wide_M
    (the consumer, dist_solve.solve_damped_cg_banded, SUBTRACTS both)."""
    r0, g0, Hd0, grams = banded_scan_grams(
        bg.fa, getattr(bg, "inv", None), bg.offset, R, p, W
    )
    r1, g1, Hd1, wM = banded_straggler_rows(bg, R, p, W)
    return r0 + r1, g0 + g1, Hd0 + Hd1, grams, wM


def banded_straggler_cgh(bg: BandedGroups, R, p, W: int):
    """Full-width gather evaluation of the straggler group (voxels whose
    observer span exceeds two blocks); zero-shaped when there are none."""
    dt = R.dtype
    r_, g_l, Hd_l, M = _chunk_eval_soa(bg.wide_fa, R, p, W, bg.wide_inv)
    gram = jax.lax.dot_general(
        M, M, dimension_numbers=(((0, 2), (0, 2)), ((), ())),
        preferred_element_type=dt,
        precision=_gram_precision(),
    ).reshape(6 * W, 6 * W)
    return r_, g_l, Hd_l, -gram


def banded_cgh(bg: BandedGroups, R, p, W: int):
    """(resid, g (W,6), Hd (W,6,6), H (6W,6W) CROSS part) of one bucket's
    banded groups + stragglers (see banded_scan)."""
    resid, g, Hd, H = banded_scan(
        bg.fa, getattr(bg, "inv", None), bg.offset, R, p, W
    )

    # stragglers: one full-width gather evaluation
    if int(bg.wide_fa.n.shape[0]) > 0:
        r_, g_l, Hd_l, Hc = banded_straggler_cgh(bg, R, p, W)
        resid = resid + r_
        g = g + g_l
        Hd = Hd + Hd_l
        H = H + Hc
    return resid, g, Hd, H


def _frame_table_np(frame: "np.ndarray", n: "np.ndarray", W: int) -> "np.ndarray":
    """(W, Kf) frame-major index table over the FLAT (v, k) entries: row w
    lists every valid entry observing frame w, padded with the sentinel
    index V*K (which gathers an all-zero row).  Kf = max entries per
    frame, rounded up to 8 for tiling."""
    flat_f = frame.reshape(-1).astype(np.int64)
    valid = n.reshape(-1) > 0
    sel = np.flatnonzero(valid)
    fsel = flat_f[sel]
    order = np.argsort(fsel, kind="stable")
    sel = sel[order]
    fsel = fsel[order]
    counts = np.bincount(fsel, minlength=W)
    Kf = max(int(counts.max()), 1)
    Kf = (Kf + 7) // 8 * 8
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    idx = np.full((W, Kf), flat_f.size, np.int32)
    if fsel.size:
        pos = np.arange(fsel.size) - starts[fsel]
        idx[fsel, pos] = sel.astype(np.int32)
    return idx


def frame_gather_table(fa: PlaneFactorArrays, W: int) -> jnp.ndarray:
    """Device (W, Kf) frame-major gather table for a bucket (host-built
    from the bucket's frame ids/masks — one small fetch per solve).  The
    reusable operand of every frame-indexed reduction in the matrix-free
    path: TPU scatters serialize, and the (V*K, W) one-hot matmul this
    replaces costs O(V K W) traffic PER CALL (≈1 GB per CG matvec at
    W = 512 on dense scenes), while the gather+reduce is O(V K)."""
    return jnp.asarray(
        _frame_table_np(np.asarray(fa.frame), np.asarray(fa.n), W)
    )


def segsum_table(z: jnp.ndarray, tbl: jnp.ndarray) -> jnp.ndarray:
    """Frame-indexed segment sum of flat per-entry values z (VK, C...) via
    the gather table: (W, Kf, C...) row gather + exact dense tree-reduce."""
    zpad = jnp.concatenate([z, jnp.zeros((1,) + z.shape[1:], z.dtype)])
    return jnp.sum(zpad[tbl], axis=1)


def plane_cost_grad_rows(
    fa: PlaneFactorArrays, R, p, W: int, tbl: jnp.ndarray
):
    """Compact linearization for the MATRIX-FREE damped solve.

    Returns (resid, g (W, 6), Hd (W, 6, 6), rows (V, K, 18)) such that the
    full Hessian is H = scatter_diag(Hd) - MᵀM with M the one-hot
    frame-expansion of `rows` — but M is never materialized and no (6W)²
    Gram is formed; the CG solver applies H directly from the compact
    rows (solver/dist_solve.py:solve_damped_cg_rows).  Same per-voxel
    math as acc_evaluate2 (/root/reference/include/BALM/bavoxel.hpp:68-174)
    restated as factor rows.  tbl: frame_gather_table(fa, W).
    """
    V, K = fa.n.shape
    resid, jjt6, D36, rows18 = _soa_core(fa, R, p, W)
    g = segsum_table(jjt6.reshape(V * K, 6), tbl)        # (W, 6)
    Hd = segsum_table(D36.reshape(V * K, 36), tbl).reshape(W, 6, 6)
    return resid, g, Hd, rows18


def plane_rows_cross_diag(rows18: jnp.ndarray, tbl: jnp.ndarray, W: int):
    """Per-frame 6x6 diagonal blocks of MᵀM from compact rows: each voxel
    observes a frame at most once, so block_w = Σ_{(v,k): f=w} Σ_r
    rows_{vkr}ᵀ rows_{vkr}."""
    V, K = rows18.shape[:2]
    r3 = rows18.reshape(V, K, 3, 6)
    P36 = jnp.einsum("vkrc,vkrd->vkcd", r3, r3).reshape(V * K, 36)
    return segsum_table(P36, tbl).reshape(W, 6, 6)


def plane_rows_matvec(
    rows18: jnp.ndarray, frame: jnp.ndarray, tbl: jnp.ndarray, x: jnp.ndarray
) -> jnp.ndarray:
    """Cross-term matvec (MᵀM) @ x from compact factor rows.

    x: (W, 6).  Per voxel: s_r = Σ_{k,c} rows_{vkrc} x[f_vk, c] (the
    gather rides the same row-gather XLA path as R[fa.frame] in the
    factor core), then z_{vkc} = Σ_r rows_{vkrc} s_r sums back by frame
    through the gather table.  O(V K) work per matvec — never the (6W)²
    Gram, never a (VK, W) one-hot."""
    V, K = rows18.shape[:2]
    r3 = rows18.reshape(V, K, 3, 6)
    xg = x[frame]                                        # (V, K, 6)
    s = jnp.einsum("vkrc,vkc->vr", r3, xg)               # (V, 3)
    z = jnp.einsum("vkrc,vr->vkc", r3, s)                # (V, K, 6)
    return segsum_table(z.reshape(V * K, 6), tbl)        # (W, 6)


# ---------------------------------------------------------------------------
# Structure-of-arrays fast path
# ---------------------------------------------------------------------------
# TPU vector tiles are (8, 128); the AoS formulation above keeps 3-vectors /
# 3x3 matrices in trailing dims where the 3s pad to 128 lanes and waste ~40x
# of the VPU.  The SoA path below carries every vector/matrix COMPONENT as
# its own (V, K) plane, so all per-entry algebra is perfectly-tiled
# elementwise math (the hat/matrix products are expanded by components).
# Same math, same outputs — validated against the AoS path and the numpy
# oracle in tests.


def _moment_channels(fa: PlaneFactorArrays):
    """Component planes of the bucket's moments (mu3 3-tuple, P6 6-tuple
    of (V, K) arrays) — the single place the PlaneFactorArrays component
    layout is unpacked for the SoA paths."""
    mu3 = (fa.mu[..., 0], fa.mu[..., 1], fa.mu[..., 2])
    P6 = (fa.Pc[..., 0, 0], fa.Pc[..., 0, 1], fa.Pc[..., 0, 2],
          fa.Pc[..., 1, 1], fa.Pc[..., 1, 2], fa.Pc[..., 2, 2])
    return mu3, P6


def _soa_split(fa: PlaneFactorArrays, Rg, pg):
    """Component planes of a bucket + pre-gathered poses (shared by the
    XLA path and the Pallas wrappers)."""
    (m1, m2, m3), P6 = _moment_channels(fa)
    R9 = (Rg[..., 0, 0], Rg[..., 0, 1], Rg[..., 0, 2],
          Rg[..., 1, 0], Rg[..., 1, 1], Rg[..., 1, 2],
          Rg[..., 2, 0], Rg[..., 2, 1], Rg[..., 2, 2])
    p3 = (pg[..., 0], pg[..., 1], pg[..., 2])
    return (m1, m2, m3), P6, R9, p3


def _pose_channels(fa: PlaneFactorArrays, R, p):
    """Per-entry pose component planes R9 (9 x (V, K)), p3 (3 x (V, K))
    WITHOUT a per-entry row gather.  The selection table width is the POSE
    COUNT R.shape[0] — NOT the Hessian width (the banded path evaluates
    groups at local width with full-width poses and global frame ids).

    R[fa.frame] row-gathers serialize on TPU: at the representative W=512
    scene (790k entries) the two pose gathers alone measured 14.0 ms of
    the 29.2 ms evaluation — the single largest cost in the engine
    (scripts/probe_pose_layout.py).  The equivalent one-hot selection
    rides the MXU in ~2.6 ms and lands the channels in channel-major
    layout directly (the (V,K,9)->(9,V,K) relayout XLA also does badly).
    Exact selection via the bf16-split scheme; non-TPU/f64 keeps the
    gather (CPU gathers are fine, and f64 parity runs stay bit-faithful
    to the oracle path)."""
    if isinstance(fa, AlignedPlaneFactorArrays):
        # slot k == frame k: the "expansion" is a (1, W) broadcast that
        # fuses into every elementwise consumer — no gather, no one-hot
        R9 = tuple(R[:, i, j][None, :] for i in range(3) for j in range(3))
        p3 = tuple(p[:, i][None, :] for i in range(3))
        return R9, p3
    if not _use_exact_bf16_dots(R.dtype):
        Rg = R[fa.frame]
        pg = p[fa.frame]
        _, _, R9, p3 = _soa_split(fa, Rg, pg)
        return R9, p3
    V, K = fa.n.shape
    Wp = R.shape[0]
    tbl = jnp.concatenate([R.reshape(Wp, 9), p], axis=1)         # (Wp, 12)
    if _sel_kernel_enabled(R.dtype):
        from ..ops.pallas.selection import table_select

        tbl3 = jnp.concatenate(_split3_bf16(tbl), axis=1)        # (Wp, 36)
        g = table_select(
            fa.frame.reshape(-1), tbl3, Wp,
            interpret=jax.default_backend() != "tpu",
        )
        g12 = (g[:12] + g[12:24] + g[24:36]).reshape(12, V, K)
        return tuple(g12[i] for i in range(9)), (g12[9], g12[10], g12[11])
    oh_bf = (
        fa.frame[..., None] == jnp.arange(Wp, dtype=fa.frame.dtype)
    ).astype(jnp.bfloat16).reshape(V * K, Wp)
    g12 = _exact_sel_dot(
        tbl, oh_bf, (((0,), (1,)), ((), ())), values_left=True,
        pack_axis=1, out_axis=0,
    ).reshape(12, V, K)
    return tuple(g12[i] for i in range(9)), (g12[9], g12[10], g12[11])


def _soa_agg(n_raw, mu3, P6, R9, p3):
    """Componentwise aggregation: world covariance + per-voxel stats.

    Pure elementwise math + reductions over the trailing (K) axis — runs
    identically as XLA ops on (V, K) planes and inside a Pallas kernel on
    (Vt, K) blocks.  Returns everything both the residual path and the
    linearization chain consume."""
    dt = n_raw.dtype
    mask = (n_raw > 0).astype(dt)
    n = n_raw * mask
    m1, m2, m3 = mu3
    P11, P12, P13, P22, P23, P33 = P6
    R11, R12, R13, R21, R22, R23, R31, R32, R33 = R9
    p1, p2, p3_ = p3

    # R·mu and world mean m = R mu + p
    Rm1 = R11 * m1 + R12 * m2 + R13 * m3
    Rm2 = R21 * m1 + R22 * m2 + R23 * m3
    Rm3 = R31 * m1 + R32 * m2 + R33 * m3
    wm1 = Rm1 + p1
    wm2 = Rm2 + p2
    wm3 = Rm3 + p3_

    # ---- aggregate: N, vbar, world scatter S (6 comps) ----
    N = jnp.sum(n, axis=-1)
    N_safe = jnp.where(N > 0, N, 1.0)
    invN = 1.0 / N_safe
    vb1 = jnp.sum(n * wm1, axis=-1) * invN
    vb2 = jnp.sum(n * wm2, axis=-1) * invN
    vb3 = jnp.sum(n * wm3, axis=-1) * invN
    # R Pc Rᵀ components: RP = R·Pc (rows), then (RP)·Rᵀ
    RP11 = R11 * P11 + R12 * P12 + R13 * P13
    RP12 = R11 * P12 + R12 * P22 + R13 * P23
    RP13 = R11 * P13 + R12 * P23 + R13 * P33
    RP21 = R21 * P11 + R22 * P12 + R23 * P13
    RP22 = R21 * P12 + R22 * P22 + R23 * P23
    RP23 = R21 * P13 + R22 * P23 + R23 * P33
    RP31 = R31 * P11 + R32 * P12 + R33 * P13
    RP32 = R31 * P12 + R32 * P22 + R33 * P23
    RP33 = R31 * P13 + R32 * P23 + R33 * P33
    S11e = RP11 * R11 + RP12 * R12 + RP13 * R13
    S12e = RP11 * R21 + RP12 * R22 + RP13 * R23
    S13e = RP11 * R31 + RP12 * R32 + RP13 * R33
    S22e = RP21 * R21 + RP22 * R22 + RP23 * R23
    S23e = RP21 * R31 + RP22 * R32 + RP23 * R33
    S33e = RP31 * R31 + RP32 * R32 + RP33 * R33
    d1 = wm1 - vb1[:, None]
    d2 = wm2 - vb2[:, None]
    d3 = wm3 - vb3[:, None]
    S11 = jnp.sum(mask * S11e + n * d1 * d1, axis=-1)
    S12 = jnp.sum(mask * S12e + n * d1 * d2, axis=-1)
    S13 = jnp.sum(mask * S13e + n * d1 * d3, axis=-1)
    S22 = jnp.sum(mask * S22e + n * d2 * d2, axis=-1)
    S23 = jnp.sum(mask * S23e + n * d2 * d3, axis=-1)
    S33 = jnp.sum(mask * S33e + n * d3 * d3, axis=-1)
    cov6 = (S11 * invN, S12 * invN, S13 * invN,
            S22 * invN, S23 * invN, S33 * invN)
    return mask, n, N, invN, (vb1, vb2, vb3), (Rm1, Rm2, Rm3), (
        RP11, RP12, RP13, RP21, RP22, RP23, RP31, RP32, RP33), cov6


def _soa_eig(cov6, N):
    """Eigendecomposition + factor-row scalings per voxel.

    Returns (residv (V,), u (3,), B1 (3,), B2 (3,)) where residv is the
    masked λ_min contribution and B rows are sqrt(2/(λi−λ0))·u_iᵀ."""
    lam0, lam1, lam2, ev0, ev1, ev2 = eigh3_soa(*cov6)
    residv = jnp.where(N > 0, lam0, 0.0)
    scale = jnp.maximum(jnp.abs(lam2), 1e-20)
    s1 = jnp.sqrt(2.0 / jnp.maximum(lam1 - lam0, 1e-9 * scale))
    s2 = jnp.sqrt(2.0 / jnp.maximum(lam2 - lam0, 1e-9 * scale))
    B1 = (s1 * ev1[0], s1 * ev1[1], s1 * ev1[2])
    B2 = (s2 * ev2[0], s2 * ev2[1], s2 * ev2[2])
    return residv, ev0, B1, B2


def _soa_chain(mask, n, invN, vb, Rm, RP, mu3, P6, R9, p3, u, B1, B2):
    """Per-entry linearization chain: factor rows + gradient/diagonal
    pieces, all (V, K) componentwise (identical inside a Pallas block).

    Returns (rows_ch (18,), jjt_ch (6,), d36_ch (36,)) channel tuples in
    the stacking order of the (V, K, C) arrays the consumers use."""
    m1, m2, m3 = mu3
    P11, P12, P13, P22, P23, P33 = P6
    R11, R12, R13, R21, R22, R23, R31, R32, R33 = R9
    p1, p2, p3_ = p3
    vb1, vb2, vb3 = vb
    Rm1, Rm2, Rm3 = Rm
    (RP11, RP12, RP13, RP21, RP22, RP23, RP31, RP32, RP33) = RP
    u1, u2, u3 = u
    B11, B12, B13 = B1
    B21, B22, B23 = B2
    dt = n.dtype

    # broadcast per-voxel scalars over K
    bc = lambda x: x[:, None]
    u1b, u2b, u3b = bc(u1), bc(u2), bc(u3)
    invNb = bc(invN)

    # ---- per-entry chain, all (V, K) elementwise ----
    r1 = R11 * u1b + R21 * u2b + R31 * u3b      # Rᵀu
    r2 = R12 * u1b + R22 * u2b + R32 * u3b
    r3 = R13 * u1b + R23 * u2b + R33 * u3b
    vi1, vi2, vi3 = n * m1, n * m2, n * m3
    w1 = vi2 * r3 - vi3 * r2
    w2 = vi3 * r1 - vi1 * r3
    w3 = vi1 * r2 - vi2 * r1
    t1 = p1 - bc(vb1)
    t2 = p2 - bc(vb2)
    t3 = p3_ - bc(vb3)
    adot = u1b * t1 + u2b * t2 + u3b * t3
    md = m1 * r1 + m2 * r2 + m3 * r3
    Pr1 = P11 * r1 + P12 * r2 + P13 * r3
    Pr2 = P12 * r1 + P22 * r2 + P23 * r3
    Pr3 = P13 * r1 + P23 * r2 + P33 * r3
    # c1v = PiRiTuk + a·vi = Pc r + n m md + a vi
    c11 = Pr1 + n * m1 * md + adot * vi1
    c12 = Pr2 + n * m2 * md + adot * vi2
    c13 = Pr3 + n * m3 * md + adot * vi3
    cb1 = n * Rm1 + n * t1    # combo2
    cb2 = n * Rm2 + n * t2
    cb3 = n * Rm3 + n * t3

    # T1 = R Pc + n (Rm) mᵀ + t viᵀ  (9 comps)
    T11 = RP11 + n * Rm1 * m1 + t1 * vi1
    T12 = RP12 + n * Rm1 * m2 + t1 * vi2
    T13 = RP13 + n * Rm1 * m3 + t1 * vi3
    T21 = RP21 + n * Rm2 * m1 + t2 * vi1
    T22 = RP22 + n * Rm2 * m2 + t2 * vi2
    T23 = RP23 + n * Rm2 * m3 + t2 * vi3
    T31 = RP31 + n * Rm3 * m1 + t3 * vi1
    T32 = RP32 + n * Rm3 * m2 + t3 * vi2
    T33 = RP33 + n * Rm3 * m3 + t3 * vi3
    # H1 = T1·hat(r):  col1 = T_col2 r3 − T_col3 r2, etc.
    H1_11 = T12 * r3 - T13 * r2
    H1_12 = T13 * r1 - T11 * r3
    H1_13 = T11 * r2 - T12 * r1
    H1_21 = T22 * r3 - T23 * r2
    H1_22 = T23 * r1 - T21 * r3
    H1_23 = T21 * r2 - T22 * r1
    H1_31 = T32 * r3 - T33 * r2
    H1_32 = T33 * r1 - T31 * r3
    H1_33 = T31 * r2 - T32 * r1
    # Rhc = R·hat(c1v): col1 = R_col2 c3 − R_col3 c2, etc.
    Rh_11 = R12 * c13 - R13 * c12
    Rh_12 = R13 * c11 - R11 * c13
    Rh_13 = R11 * c12 - R12 * c11
    Rh_21 = R22 * c13 - R23 * c12
    Rh_22 = R23 * c11 - R21 * c13
    Rh_23 = R21 * c12 - R22 * c11
    Rh_31 = R32 * c13 - R33 * c12
    Rh_32 = R33 * c11 - R31 * c13
    Rh_33 = R31 * c12 - R32 * c11
    # Auk rotation block (/N, masked)
    sN = invNb * mask
    A11 = (H1_11 - Rh_11) * sN
    A12 = (H1_12 - Rh_12) * sN
    A13 = (H1_13 - Rh_13) * sN
    A21 = (H1_21 - Rh_21) * sN
    A22 = (H1_22 - Rh_22) * sN
    A23 = (H1_23 - Rh_23) * sN
    A31 = (H1_31 - Rh_31) * sN
    A32 = (H1_32 - Rh_32) * sN
    A33 = (H1_33 - Rh_33) * sN
    # translation block: combo2 uᵀ + (combo2·u) I, /N, masked
    c2u = cb1 * u1b + cb2 * u2b + cb3 * u3b
    A14 = (cb1 * u1b + c2u) * sN
    A15 = (cb1 * u2b) * sN
    A16 = (cb1 * u3b) * sN
    A24 = (cb2 * u1b) * sN
    A25 = (cb2 * u2b + c2u) * sN
    A26 = (cb2 * u3b) * sN
    A34 = (cb3 * u1b) * sN
    A35 = (cb3 * u2b) * sN
    A36 = (cb3 * u3b + c2u) * sN

    # jjt = Aᵀ u (6 comps)
    j1 = A11 * u1b + A21 * u2b + A31 * u3b
    j2 = A12 * u1b + A22 * u2b + A32 * u3b
    j3 = A13 * u1b + A23 * u2b + A33 * u3b
    j4 = A14 * u1b + A24 * u2b + A34 * u3b
    j5 = A15 * u1b + A25 * u2b + A35 * u3b
    j6 = A16 * u1b + A26 * u2b + A36 * u3b

    # ---- diagonal extras D (36 comps) ----
    # F = hat(c1v) − hat(r)·Pi ; Pi = Pc + n m mᵀ
    Pi11 = P11 + n * m1 * m1
    Pi12 = P12 + n * m1 * m2
    Pi13 = P13 + n * m1 * m3
    Pi22 = P22 + n * m2 * m2
    Pi23 = P23 + n * m2 * m3
    Pi33 = P33 + n * m3 * m3
    # hat(r)·Pi rows: row1 = −r3·P_row2 + r2·P_row3; row2 = r3·P_row1 − r1·P_row3;
    # row3 = −r2·P_row1 + r1·P_row2   (P symmetric)
    hp11 = -r3 * Pi12 + r2 * Pi13
    hp12 = -r3 * Pi22 + r2 * Pi23
    hp13 = -r3 * Pi23 + r2 * Pi33
    hp21 = r3 * Pi11 - r1 * Pi13
    hp22 = r3 * Pi12 - r1 * Pi23
    hp23 = r3 * Pi13 - r1 * Pi33
    hp31 = -r2 * Pi11 + r1 * Pi12
    hp32 = -r2 * Pi12 + r1 * Pi22
    hp33 = -r2 * Pi13 + r1 * Pi23
    F11 = -hp11
    F12 = -c13 - hp12
    F13 = c12 - hp13
    F21 = c13 - hp21
    F22 = -hp22
    F23 = -c11 - hp23
    F31 = -c12 - hp31
    F32 = c11 - hp32
    F33 = -hp33
    # D_rr = 2/N F·hat(r) − 0.5 hat(jjt_rot)
    two_sN = 2.0 * invNb * mask
    Dr11 = two_sN * (F12 * r3 - F13 * r2)
    Dr12 = two_sN * (F13 * r1 - F11 * r3) + 0.5 * j3
    Dr13 = two_sN * (F11 * r2 - F12 * r1) - 0.5 * j2
    Dr21 = two_sN * (F22 * r3 - F23 * r2) - 0.5 * j3
    Dr22 = two_sN * (F23 * r1 - F21 * r3)
    Dr23 = two_sN * (F21 * r2 - F22 * r1) + 0.5 * j1
    Dr31 = two_sN * (F32 * r3 - F33 * r2) + 0.5 * j2
    Dr32 = two_sN * (F33 * r1 - F31 * r3) - 0.5 * j1
    Dr33 = two_sN * (F31 * r2 - F32 * r1)
    # D_rt = 2/N w uᵀ ; D_tt = 2n/N u uᵀ
    Drt11 = two_sN * w1 * u1b; Drt12 = two_sN * w1 * u2b; Drt13 = two_sN * w1 * u3b
    Drt21 = two_sN * w2 * u1b; Drt22 = two_sN * w2 * u2b; Drt23 = two_sN * w2 * u3b
    Drt31 = two_sN * w3 * u1b; Drt32 = two_sN * w3 * u2b; Drt33 = two_sN * w3 * u3b
    tn = two_sN * n
    Dt11 = tn * u1b * u1b; Dt12 = tn * u1b * u2b; Dt13 = tn * u1b * u3b
    Dt22 = tn * u2b * u2b; Dt23 = tn * u2b * u3b; Dt33 = tn * u3b * u3b

    d36_ch = (
        Dr11, Dr12, Dr13, Drt11, Drt12, Drt13,
        Dr21, Dr22, Dr23, Drt21, Drt22, Drt23,
        Dr31, Dr32, Dr33, Drt31, Drt32, Drt33,
        Drt11, Drt21, Drt31, Dt11, Dt12, Dt13,
        Drt12, Drt22, Drt32, Dt12, Dt22, Dt23,
        Drt13, Drt23, Drt33, Dt13, Dt23, Dt33,
    )

    # ---- factor rows: BA (2x6) + √2/N [w; n u] ----
    B11b, B12b, B13b = bc(B11), bc(B12), bc(B13)
    B21b, B22b, B23b = bc(B21), bc(B22), bc(B23)
    BA11 = B11b * A11 + B12b * A21 + B13b * A31
    BA12 = B11b * A12 + B12b * A22 + B13b * A32
    BA13 = B11b * A13 + B12b * A23 + B13b * A33
    BA14 = B11b * A14 + B12b * A24 + B13b * A34
    BA15 = B11b * A15 + B12b * A25 + B13b * A35
    BA16 = B11b * A16 + B12b * A26 + B13b * A36
    BA21 = B21b * A11 + B22b * A21 + B23b * A31
    BA22 = B21b * A12 + B22b * A22 + B23b * A32
    BA23 = B21b * A13 + B22b * A23 + B23b * A33
    BA24 = B21b * A14 + B22b * A24 + B23b * A34
    BA25 = B21b * A15 + B22b * A25 + B23b * A35
    BA26 = B21b * A16 + B22b * A26 + B23b * A36
    sq = jnp.sqrt(jnp.asarray(2.0, dt)) * invNb * mask
    rows_ch = (
        BA11, BA12, BA13, BA14, BA15, BA16,
        BA21, BA22, BA23, BA24, BA25, BA26,
        sq * w1, sq * w2, sq * w3, sq * n * u1b, sq * n * u2b, sq * n * u3b,
    )
    jjt_ch = (j1, j2, j3, j4, j5, j6)
    return rows_ch, jjt_ch, d36_ch


# The 36 diagonal-extras channels (the _soa_chain d36_ch tuple, laid out
# as the row-major 6x6 block [D_rr, D_rt; D_rtᵀ, D_tt]) repeat 12 entries:
# D_rt appears transposed in the lower-left and D_tt is symmetric.
# _D_UNIQUE lists the 24 distinct channel positions; _D24_TO_36 rebuilds
# the full row-major 36 from the reduced (W, 24) — exact, since the
# frame reduction is linear per channel.
_D_UNIQUE = tuple(range(18)) + (21, 22, 23, 28, 29, 35)
_D24_TO_36 = np.array(
    list(range(18))
    + [3, 9, 15, 18, 19, 20]
    + [4, 10, 16, 19, 21, 22]
    + [5, 11, 17, 20, 22, 23],
    dtype=np.int32,
)


def _soa_kernel_enabled() -> bool:
    """Trace-time switch for the fused Pallas SoA kernel.  The XLA lowering
    of the componentwise evaluation fragments into ~185 fusion launches +
    ~190 async copies per eval (measured, W=512 scene) — latency-bound at
    ~15 ms for ~0.15 GFLOP of work; the fused kernel runs the whole
    per-voxel pipeline (aggregation, eigh3, linearization chain) in VMEM
    in one launch per V-tile."""
    return os.environ.get("LVBA_SOA_KERNEL", "xla") == "pallas"


def _soa_core(fa: PlaneFactorArrays, R: jnp.ndarray, p: jnp.ndarray, W: int):
    """SoA evaluation. Returns (resid, jjt6 (V,K,6), D36 (V,K,36),
    rows18 (V,K,18)) with rows = [B1·A; B2·A; √2/N·[w; n·u]]."""
    mu3, P6 = _moment_channels(fa)
    R9, p3 = _pose_channels(fa, R, p)
    mask, n, N, invN, vb, Rm, RP, cov6 = _soa_agg(fa.n, mu3, P6, R9, p3)
    residv, u, B1, B2 = _soa_eig(cov6, N)
    rows_ch, jjt_ch, d36_ch = _soa_chain(
        mask, n, invN, vb, Rm, RP, mu3, P6, R9, p3, u, B1, B2
    )
    return (
        jnp.sum(residv),
        jnp.stack(jjt_ch, axis=-1),
        jnp.stack(d36_ch, axis=-1),
        jnp.stack(rows_ch, axis=-1),
    )


def _chunk_eval_soa(fa_c: PlaneFactorArrays, R, p, W: int, inv_c=None):
    """SoA chunk evaluation -> (resid, g (W,6), Hd (W,6,6), M (V, W, 3, 6)).

    With inv_c (a frame_slot_table chunk, (V, W) int32) the frame
    expansion is ONE contiguous-row gather of the concatenated per-entry
    outputs [rows18 | jjt6 | D36] — selection only, no summation (each
    voxel observes a frame at most once), so it is exact and carries no
    one-hot traffic.  Without it, frame-indexed reductions are explicit
    one-hot dot_generals so they lower to the MXU (einsum's
    broadcast-reduce form lowered to the VPU and was ~100x slower at
    W = 200)."""
    V, K = fa_c.n.shape
    if isinstance(fa_c, AlignedPlaneFactorArrays):
        # frame-aligned: no selection at all — g/Hd are plain voxel-axis
        # sums and the factor rows already sit in the (V, W, 18) Gram
        # layout (slot k == frame k).  The jjt/D channels are summed
        # CHANNEL-WISE before stacking: the reductions fuse into the
        # chain, so the (V, W, 42) stacked arrays (~350 MB of HBM traffic
        # per eval at W=512) are never written; only the 18 Gram-operand
        # row channels materialize
        mu3, P6 = _moment_channels(fa_c)
        R9, p3 = _pose_channels(fa_c, R, p)
        mask, n, N, invN, vb, Rm, RP, cov6 = _soa_agg(
            fa_c.n, mu3, P6, R9, p3)
        residv, u, B1, B2 = _soa_eig(cov6, N)
        rows_ch, jjt_ch, d36_ch = _soa_chain(
            mask, n, invN, vb, Rm, RP, mu3, P6, R9, p3, u, B1, B2)
        g = jnp.stack([jnp.sum(c, axis=0) for c in jjt_ch], axis=-1)
        Hd = jnp.stack(
            [jnp.sum(c, axis=0) for c in d36_ch], axis=-1
        ).reshape(W, 6, 6)
        rows18 = jnp.stack(rows_ch, axis=-1)                  # (V, W, 18)
        return jnp.sum(residv), g, Hd, rows18.reshape(V, W, 3, 6)
    if _soa_kernel_enabled() and inv_c is None:
        # fused Pallas evaluation: channel-major outputs; the one-hot
        # expansion matmuls are re-expressed against that layout (same
        # operands, same HIGHEST precision, same results)
        from ..ops.pallas.soa_fused import soa_fused_channels

        residv, rowsC, jjtC, d36C = soa_fused_channels(
            fa_c, R[fa_c.frame], p[fa_c.frame]
        )
        hi = jax.lax.Precision.HIGHEST
        onehot = (
            fa_c.frame[..., None] == jnp.arange(W, dtype=fa_c.frame.dtype)
        ).astype(fa_c.n.dtype)
        oh_flat = onehot.reshape(V * K, W)
        g = jax.lax.dot_general(
            jjtC.reshape(6, V * K), oh_flat,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=fa_c.n.dtype, precision=hi,
        ).T                                              # (W, 6)
        Hd = jax.lax.dot_general(
            d36C.reshape(36, V * K), oh_flat,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=fa_c.n.dtype, precision=hi,
        ).T.reshape(W, 6, 6)
        M = jax.lax.dot_general(
            onehot, rowsC,
            dimension_numbers=(((1,), (2,)), ((0,), (1,))),
            preferred_element_type=fa_c.n.dtype, precision=hi,
        )                                                # (V, W, 18)
        return jnp.sum(residv), g, Hd, M.reshape(V, W, 3, 6)
    if inv_c is not None:
        resid, jjt6, D36, rows18 = _soa_core(fa_c, R, p, W)
        dt = fa_c.n.dtype
        cat = jnp.concatenate([rows18, jjt6, D36], axis=-1)      # (V, K, 60)
        catp = jnp.concatenate([cat, jnp.zeros((V, 1, 60), dt)], axis=1)
        G = jnp.take_along_axis(catp, inv_c[:, :, None], axis=1)  # (V, W, 60)
        g = jnp.sum(G[..., 18:24], axis=0)                        # (W, 6)
        Hd = jnp.sum(G[..., 24:60], axis=0).reshape(W, 6, 6)
        return resid, g, Hd, G[..., :18].reshape(V, W, 3, 6)
    if _use_exact_bf16_dots(fa_c.n.dtype):
        # exact-selection scheme: single-pass bf16 dots over the 3-way
        # split packing, same f32 results (see _exact_sel_dot); g and Hd
        # share one stacked operand so the one-hot streams once.  Only the
        # 24 UNIQUE diagonal-extras channels are stacked/reduced (D is
        # symmetric 3x3 blocks — 12 of its 36 channels repeat); the (W, 36)
        # layout reassembles from the (W, 24) reduction by a tiny W-sized
        # gather, exact because the reduction is linear per channel
        mu3, P6 = _moment_channels(fa_c)
        R9, p3 = _pose_channels(fa_c, R, p)
        mask, n, N, invN, vb, Rm, RP, cov6 = _soa_agg(
            fa_c.n, mu3, P6, R9, p3)
        residv, u, B1, B2 = _soa_eig(cov6, N)
        rows_ch, jjt_ch, d36_ch = _soa_chain(
            mask, n, invN, vb, Rm, RP, mu3, P6, R9, p3, u, B1, B2)
        resid = jnp.sum(residv)
        rows18 = jnp.stack(rows_ch, axis=-1)                 # (V, K, 18)
        uniq = jjt_ch + tuple(d36_ch[i] for i in _D_UNIQUE)
        cat30 = jnp.stack(uniq, axis=-1).reshape(V * K, 30)
        if _sel_kernel_enabled(fa_c.n.dtype):
            from ..ops.pallas.selection import entry_reduce

            vals3 = jnp.concatenate(_split3_bf16(cat30), axis=1)  # (VK,90)
            gHd3 = entry_reduce(
                fa_c.frame.reshape(-1), vals3, W,
                interpret=jax.default_backend() != "tpu",
            )                                               # (W, 90)
            gHd = gHd3[:, :30] + gHd3[:, 30:60] + gHd3[:, 60:90]
        else:
            oh_flat = (
                fa_c.frame.reshape(-1)[:, None]
                == jnp.arange(W, dtype=fa_c.frame.dtype)
            ).astype(jnp.bfloat16)
            gHd = _exact_sel_dot(
                cat30, oh_flat, (((0,), (0,)), ((), ())),
                values_left=False, pack_axis=1, out_axis=1,
            )                                               # (W, 30)
        oh_bf = (
            fa_c.frame[..., None] == jnp.arange(W, dtype=fa_c.frame.dtype)
        ).astype(jnp.bfloat16)
        M = _exact_sel_dot(
            rows18, oh_bf, (((1,), (1,)), ((0,), (0,))), values_left=False,
            pack_axis=2, out_axis=2,
        )                                                   # (V, W, 18)
        return (resid, gHd[:, :6], gHd[:, 6:][:, _D24_TO_36].reshape(W, 6, 6),
                M.reshape(V, W, 3, 6))
    resid, jjt6, D36, rows18 = _soa_core(fa_c, R, p, W)
    onehot = (fa_c.frame[..., None] == jnp.arange(W, dtype=fa_c.frame.dtype)).astype(
        fa_c.n.dtype
    )
    # HIGHEST precision: TPU matmuls default to bf16 passes, which is far
    # too coarse for Hessian assembly (measured: ATE diverges at W = 200)
    hi = jax.lax.Precision.HIGHEST
    oh_flat = onehot.reshape(V * K, W)
    g = jax.lax.dot_general(
        oh_flat, jjt6.reshape(V * K, 6),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=fa_c.n.dtype, precision=hi,
    )                                                   # (W, 6)
    Hd = jax.lax.dot_general(
        oh_flat, D36.reshape(V * K, 36),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=fa_c.n.dtype, precision=hi,
    ).reshape(W, 6, 6)
    M = jax.lax.dot_general(
        onehot, rows18,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=fa_c.n.dtype, precision=hi,
    )                                                   # (V, W, 18)
    return resid, g, Hd, M.reshape(V, W, 3, 6)


def plane_cost_soa(fa: PlaneFactorArrays, R: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Residual-only evaluation in SoA layout (trial steps of the LM)."""
    if _soa_kernel_enabled() and not isinstance(fa, AlignedPlaneFactorArrays):
        from ..ops.pallas.soa_fused import soa_resid_fused

        return jnp.sum(soa_resid_fused(fa, R[fa.frame], p[fa.frame]))
    mu3, P6 = _moment_channels(fa)
    R9, p3 = _pose_channels(fa, R, p)
    _, _, N, invN, _, _, _, cov6 = _soa_agg(fa.n, mu3, P6, R9, p3)
    lam0, _, _ = eigvals3_soa(*cov6)
    return jnp.sum(jnp.where(N > 0, lam0, 0.0))
