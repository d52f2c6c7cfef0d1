"""Built-in SIFT feature extraction on device (the SiftGPU replacement).

The reference shells out to the external SiftGPU library with params
`-fo -1 -t 0.01 -e 12` (/root/reference/src/lvba_system.cpp:703-706); this
module implements the same pipeline TPU-natively:

  * Gaussian scale-space pyramid (first octave -1 = 2x upsample), 3
    intervals/octave, sigma0 = 1.6 — computed as banded-Toeplitz MATMULS
    on the MXU: every level blurs directly from the octave base via
    `T_v(sigma) @ img @ T_h(sigma)` batched over levels, one einsum pair
    per octave instead of ten tiny one-channel convolutions (the conv
    formulation leaves the 128x128 systolic array ~1% utilized; the
    matmul formulation is ~30 GFLOP/image and measured >20x faster);
  * DoG extrema via 3x3x3 reduce-window max/min, contrast threshold
    (default 0.01, SiftGPU -t) and edge rejection (r = 12, SiftGPU -e);
    per-octave candidate selection by `lax.approx_max_k` (TPU-native
    partial top-k; recall >= 0.95 of the exact set — exact `top_k` over
    the multi-megapixel score map was the single hottest op);
  * quadratic subpixel refinement (one Newton step over (x, y, s));
  * gradient orientation from a 36-bin weighted histogram accumulated
    per patch pixel (Lowe's formulation — no resampling); keypoints are
    DUPLICATED at secondary histogram peaks >= 0.8 * max (Lowe's rule, as
    SiftGPU does) up to `n_orientations` per keypoint;
  * 4x4x8 = 128-d descriptors: every pixel of the keypoint's gradient
    patch is rotated into the keypoint frame and trilinearly binned
    (separable hat weights contracted on the MXU), normalize -> clip
    0.2 -> renormalize.

Everything is padded/masked: each image yields exactly `max_kp` slots
ranked by |DoG| response with a validity mask.  Irregular per-image
keypoint counts exist only at the host boundary.

Remaining simplification vs Lowe 2004: one refinement iteration.
"""

from __future__ import annotations

import math
import os
from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class SiftParams(NamedTuple):
    n_octaves: int = 5
    n_scales: int = 3            # intervals per octave
    sigma0: float = 1.6
    first_octave: int = -1       # -1: upsample x2 (SiftGPU -fo -1)
    contrast_thr: float = 0.01   # SiftGPU -t
    edge_thr: float = 12.0       # SiftGPU -e
    max_kp: int = 2048
    ori_bins: int = 36
    patch: int = 16              # descriptor sample grid
    n_orientations: int = 2      # keypoint copies at 0.8-peak orientations


class SiftFeatures(NamedTuple):
    xy: jnp.ndarray        # (K, 2) pixel coords in the ORIGINAL image frame
    sigma: jnp.ndarray     # (K,)
    response: jnp.ndarray  # (K,) |DoG| value
    orientation: jnp.ndarray  # (K,) radians
    desc: jnp.ndarray      # (K, 128) L2-normalized uint-free float
    valid: jnp.ndarray     # (K,) bool


def _gauss_kernel1d(sigma: float, radius: int) -> np.ndarray:
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def _toeplitz_gauss_np(n: int, sigma: float) -> np.ndarray:
    """(n, n) banded Toeplitz matrix of a truncated, globally-normalized 1-D
    Gaussian — zero-padding 'SAME' convolution as a dense matmul operand.

    Built in numpy so it traces as a jit-time CONSTANT: constructing it on
    device (iota + exp over n^2 elements per level) measured ~50 ms/image,
    dwarfing the matmuls it feeds."""
    radius = max(1, int(math.ceil(3.0 * sigma)))
    d = np.arange(n)[:, None] - np.arange(n)[None, :]
    k = np.exp(-0.5 * (d.astype(np.float64) / sigma) ** 2)
    k[np.abs(d) > radius] = 0.0
    t = np.arange(-radius, radius + 1, dtype=np.float64)
    k /= np.exp(-0.5 * (t / sigma) ** 2).sum()
    return k.astype(np.float32)


def _upsample2_matrix_np(n: int) -> np.ndarray:
    """(2n, n) centered bilinear 2x-upsample operator (matches
    jax.image.resize method='linear', half-pixel centers, edge clamp)."""
    i = np.arange(2 * n)
    src = (i + 0.5) / 2.0 - 0.5
    i0 = np.floor(src).astype(np.int64)
    w1 = src - i0
    U = np.zeros((2 * n, n), dtype=np.float32)
    c0 = np.clip(i0, 0, n - 1)
    c1 = np.clip(i0 + 1, 0, n - 1)
    U[i, c0] += (1.0 - w1).astype(np.float32)
    U[i, c1] += w1.astype(np.float32)
    return U


def _blur_precision():
    """Matmul precision of the Gaussian-pyramid Toeplitz blurs.  Kept at
    HIGHEST by round-5 chip A/B (scripts/probe_sift_precision.py): HIGH
    finds the identical keypoint set at identical positions but is NOT
    faster (53.9 vs 55.4 ms/img with fetch — the pyramid stage is
    HBM-bandwidth-bound on its (L, 2H, 2W) level tensors, not
    MXU-pass-bound), while descriptor values drift (L2 mean 0.26 on
    unit-norm descriptors, driven by orientation sensitivity) — pure risk
    for zero win.  LVBA_SIFT_BLUR_PRECISION overrides for experiments."""
    name = os.environ.get("LVBA_SIFT_BLUR_PRECISION", "highest").lower()
    return {
        "default": jax.lax.Precision.DEFAULT,
        "high": jax.lax.Precision.HIGH,
        "highest": jax.lax.Precision.HIGHEST,
    }[name]


def _gauss_levels_matmul(base: jnp.ndarray, sigmas, upsample2: bool = False) -> jnp.ndarray:
    """Blur `base` (H, W) by each sigma at once: (L, H, W) (or (L, 2H, 2W)
    with upsample2) via two batched MXU matmuls (precision: see
    _blur_precision).

    upsample2 folds the first-octave 2x bilinear upsample INTO the blur
    operands (T @ U as one jit-time constant): the upsampled image is
    never materialized and the contraction length halves."""
    H, W = base.shape
    if upsample2:
        Uv = _upsample2_matrix_np(H)
        Uh = _upsample2_matrix_np(W)
        Tv = jnp.asarray(np.stack(
            [_toeplitz_gauss_np(2 * H, s) @ Uv for s in sigmas]
        ))
        Th = jnp.asarray(np.stack(
            [(_toeplitz_gauss_np(2 * W, s) @ Uh).T for s in sigmas]
        ))
    else:
        Tv = jnp.asarray(np.stack([_toeplitz_gauss_np(H, s) for s in sigmas]))
        Th = jnp.asarray(np.stack([_toeplitz_gauss_np(W, s) for s in sigmas]))
    prec = _blur_precision()
    t = jnp.einsum("lyk,kx->lyx", Tv, base, precision=prec)
    return jnp.einsum("lyx,lxw->lyw", t, Th, precision=prec)


def _resize_half(img: jnp.ndarray) -> jnp.ndarray:
    return img[::2, ::2]


def _local_extrema(dog: jnp.ndarray) -> jnp.ndarray:
    """(S, H, W) -> bool mask of 26-neighborhood extrema on interior scales."""
    mx = jax.lax.reduce_window(
        dog, -jnp.inf, jax.lax.max, (3, 3, 3), (1, 1, 1), "SAME"
    )
    mn = jax.lax.reduce_window(
        dog, jnp.inf, jax.lax.min, (3, 3, 3), (1, 1, 1), "SAME"
    )
    is_max = dog >= mx
    is_min = dog <= mn
    return is_max | is_min


def _extract_octave(
    gauss: jnp.ndarray,   # (S+3, H, W) gaussian images of this octave
    params: SiftParams,
    kp_per_octave: int,
):
    """Detect + refine keypoints in one octave.

    Returns (xy (N,2) octave coords, scale_idx (N,), sigma_octave (N,),
    response (N,), valid (N,)) padded to kp_per_octave.
    """
    S = params.n_scales
    dog = gauss[1:] - gauss[:-1]                 # (S+2, H, W)
    Hh, Ww = dog.shape[1], dog.shape[2]
    ext = _local_extrema(dog)
    # interior scales only: s in [1, S]
    cand = ext & (jnp.abs(dog) > 0.8 * params.contrast_thr)
    smask = jnp.zeros(dog.shape[0], dtype=bool).at[1 : S + 1].set(True)
    cand = cand & smask[:, None, None]
    # exclude border
    border = 5
    bm = jnp.zeros((Hh, Ww), dtype=bool).at[border:-border, border:-border].set(True)
    cand = cand & bm[None]

    score = jnp.where(cand, jnp.abs(dog), 0.0)
    k = kp_per_octave
    # reduce over the scale axis first (a pixel rarely hosts extrema at two
    # scales; keeping only the strongest matches SiftGPU's per-pixel output)
    # so the top-k scans H*W elements instead of (S+2)*H*W
    px_max = jnp.max(score, axis=0)              # (H, W)
    px_arg = jnp.argmax(score, axis=0)           # (H, W)
    # TPU-native partial top-k (recall >= 0.95): candidates are a sparse set
    # and the exact top_k over the full score map was the hottest single op
    top_val, top_idx = jax.lax.approx_max_k(px_max.reshape(-1), k)
    yy = top_idx // Ww
    xx = top_idx % Ww
    s_idx = px_arg[yy, xx]
    valid = top_val > 0

    # quadratic refinement: one Newton step over (x, y, s)
    def refine(s, y, x):
        d = lambda ds, dy, dx: dog[s + ds, y + dy, x + dx]
        g = jnp.stack(
            [
                0.5 * (d(0, 0, 1) - d(0, 0, -1)),
                0.5 * (d(0, 1, 0) - d(0, -1, 0)),
                0.5 * (d(1, 0, 0) - d(-1, 0, 0)),
            ]
        )
        dxx = d(0, 0, 1) + d(0, 0, -1) - 2 * d(0, 0, 0)
        dyy = d(0, 1, 0) + d(0, -1, 0) - 2 * d(0, 0, 0)
        dss = d(1, 0, 0) + d(-1, 0, 0) - 2 * d(0, 0, 0)
        dxy = 0.25 * (d(0, 1, 1) - d(0, 1, -1) - d(0, -1, 1) + d(0, -1, -1))
        dxs = 0.25 * (d(1, 0, 1) - d(1, 0, -1) - d(-1, 0, 1) + d(-1, 0, -1))
        dys = 0.25 * (d(1, 1, 0) - d(1, -1, 0) - d(-1, 1, 0) + d(-1, -1, 0))
        # Cramer's-rule 3x3 solve (batched jnp.linalg.solve lowers poorly
        # for tiny systems on TPU)
        a11, a12, a13 = dxx + 1e-9, dxy, dxs
        a22, a23, a33 = dyy + 1e-9, dys, dss + 1e-9
        c11 = a22 * a33 - a23 * a23
        c12 = a13 * a23 - a12 * a33
        c13 = a12 * a23 - a13 * a22
        det = a11 * c11 + a12 * c12 + a13 * c13
        det = jnp.where(jnp.abs(det) < 1e-30, 1e-30, det)
        c22 = a11 * a33 - a13 * a13
        c23 = a12 * a13 - a11 * a23
        c33 = a11 * a22 - a12 * a12
        off = -jnp.stack([
            c11 * g[0] + c12 * g[1] + c13 * g[2],
            c12 * g[0] + c22 * g[1] + c23 * g[2],
            c13 * g[0] + c23 * g[1] + c33 * g[2],
        ]) / det
        off = jnp.clip(off, -0.5, 0.5)
        val = d(0, 0, 0) + 0.5 * jnp.dot(g, off)
        # edge rejection on the 2x2 spatial Hessian
        tr = dxx + dyy
        det = dxx * dyy - dxy * dxy
        r = params.edge_thr
        edge_ok = (det > 0) & (tr * tr * r < (r + 1) ** 2 * det)
        return off, val, edge_ok

    offs, vals, edge_ok = jax.vmap(refine)(s_idx, yy, xx)
    valid = valid & edge_ok & (jnp.abs(vals) > params.contrast_thr)
    x_ref = xx.astype(jnp.float32) + offs[:, 0]
    y_ref = yy.astype(jnp.float32) + offs[:, 1]
    s_ref = s_idx.astype(jnp.float32) + offs[:, 2]
    sigma_o = params.sigma0 * (2.0 ** (s_ref / S))
    return (
        jnp.stack([x_ref, y_ref], axis=-1),
        s_idx,
        sigma_o,
        vals,
        valid,
    )


_PSZ = 64  # gradient patch size per keypoint; covers the descriptor span
           # (±2 bins x 3*sigma x sqrt2 ≈ ±27 px at sigma_max = 3.2)


def _extract_patches(gauss_int: jnp.ndarray, xy: jnp.ndarray,
                     scale_idx: jnp.ndarray):
    """Per-keypoint (PSZ, PSZ) central-difference gradient patches.

    One vmapped dynamic_slice per keypoint replaces the scattered
    whole-image element gathers of the old formulation (the gathers were
    ~60% of total extraction time on the chip: TPU gathers are serialized
    scalar loads, while block slices move whole vector rows).

    Returns (dx (K, PSZ, PSZ), dy, origin (K, 2) patch->octave offset)."""
    S, H, W = gauss_int.shape
    P2 = _PSZ + 2
    if H < P2 or W < P2:
        # tiny octaves: edge-pad so the fixed-size slice always fits
        gauss_int = jnp.pad(
            gauss_int,
            ((0, 0), (0, max(0, P2 - H)), (0, max(0, P2 - W))),
            mode="edge",
        )
        H, W = max(H, P2), max(W, P2)

    def one(xyk, sk_idx):
        x0 = jnp.clip(xyk[0].astype(jnp.int32) - _PSZ // 2 - 1, 0, max(W - P2, 0))
        y0 = jnp.clip(xyk[1].astype(jnp.int32) - _PSZ // 2 - 1, 0, max(H - P2, 0))
        patch = jax.lax.dynamic_slice(
            gauss_int, (sk_idx.astype(y0.dtype), y0, x0), (1, P2, P2)
        )[0]
        dx = 0.5 * (patch[1:-1, 2:] - patch[1:-1, :-2])
        dy = 0.5 * (patch[2:, 1:-1] - patch[:-2, 1:-1])
        return dx, dy, jnp.stack([x0 + 1, y0 + 1])

    return jax.vmap(one)(xy, scale_idx)


_OSZ = 24  # orientation window: covers the ±3*sigma support (max ±9.6 px
           # at sigma_max = 3.2) with margin; the full descriptor patch is
           # 64² so cropping cuts the histogram work ~7x


def _crop_ori_window(mpx, apx, xy_loc):
    """Per-keypoint (OSZ, OSZ) crop of the gradient patches centered on
    the keypoint (clamped at patch borders), for the orientation
    histogram.  Returns (m, a, xy_loc_local)."""
    P = mpx.shape[1]

    def one(mk, ak, xyk):
        x0 = jnp.clip(xyk[0].astype(jnp.int32) - _OSZ // 2, 0, P - _OSZ)
        y0 = jnp.clip(xyk[1].astype(jnp.int32) - _OSZ // 2, 0, P - _OSZ)
        return (
            jax.lax.dynamic_slice(mk, (y0, x0), (_OSZ, _OSZ)),
            jax.lax.dynamic_slice(ak, (y0, x0), (_OSZ, _OSZ)),
            jnp.stack([x0, y0]),
        )

    mo, ao, org = jax.vmap(one)(mpx, apx, xy_loc)
    return mo, ao, xy_loc - org.astype(xy_loc.dtype)


def _orientations(
    mpx: jnp.ndarray, apx: jnp.ndarray, xy_loc: jnp.ndarray,
    sigma: jnp.ndarray, params: SiftParams,
):
    """Dominant + secondary gradient orientations per keypoint from its
    gradient patch, accumulated PER PIXEL (Lowe's formulation): every
    pixel of the keypoint's own patch votes into the 36-bin histogram
    with Gaussian weight exp(-r^2 / 2(1.5s)^2), truncated at |r| <= 3s.
    No resampling — the grid-resample + one-hot-matmul sampling this
    replaces was ~half the extraction time for the same histogram.

    mpx/apx: (K, PSZ, PSZ) gradient magnitude/angle patches.
    Returns (theta1 (K,), theta2 (K,), has2 (K,)): theta2 is the largest
    strict-local-maximum histogram peak >= 0.8 * max outside the dominant
    bin (Lowe's multi-orientation rule; SiftGPU emits these as duplicated
    keypoints)."""
    NB = params.ori_bins
    K, P, _ = mpx.shape
    ar = jnp.arange(P, dtype=mpx.dtype)
    rx = ar[None, None, :] - xy_loc[:, 0, None, None]    # (K, 1, P)
    ry = ar[None, :, None] - xy_loc[:, 1, None, None]    # (K, P, 1)
    sw = jnp.maximum(1.5 * sigma, 1e-3)[:, None, None]
    span = jnp.maximum(3.0 * sigma, 1e-3)[:, None, None]
    w = jnp.exp(-(rx * rx + ry * ry) / (2.0 * sw * sw))
    w = jnp.where((jnp.abs(rx) <= span) & (jnp.abs(ry) <= span), w, 0.0)
    bins = jnp.floor((apx + jnp.pi) / (2 * jnp.pi) * NB).astype(jnp.int32) % NB
    mw = (mpx * w).reshape(K, -1)
    binsf = bins.reshape(K, -1)
    # scatter-free histogram: NB sibling masked reductions over the shared
    # (K, P*P) operands — XLA fuses these into one pass (TPU scatters
    # serialize; a (K, P*P, NB) one-hot would be GBs)
    hist = jnp.stack(
        [jnp.sum(jnp.where(binsf == b, mw, 0.0), axis=-1) for b in range(NB)],
        axis=-1,
    )                                                    # (K, NB)
    # circular smooth x2
    for _ in range(2):
        hist = (jnp.roll(hist, 1, -1) + hist + jnp.roll(hist, -1, -1)) / 3.0

    def at(ob):
        return jnp.take_along_axis(hist, ob[:, None], axis=1)[:, 0]

    def peak_theta(ob):
        l = at((ob - 1) % NB)
        c = at(ob)
        r = at((ob + 1) % NB)
        denom = l - 2 * c + r
        delta = jnp.where(jnp.abs(denom) > 1e-12, 0.5 * (l - r) / denom, 0.0)
        return (ob + delta + 0.5) / NB * 2 * jnp.pi - jnp.pi

    ob = jnp.argmax(hist, axis=-1)
    theta1 = peak_theta(ob)
    # secondary peak: strict local max, >= 0.8 * max, not the main bin
    left = jnp.roll(hist, 1, -1)
    right = jnp.roll(hist, -1, -1)
    is_peak = (hist > left) & (hist >= right)
    idxs = jnp.arange(NB)[None, :]
    cand = is_peak & (idxs != ob[:, None]) & (hist >= 0.8 * at(ob)[:, None])
    v2 = jnp.where(cand, hist, -1.0)
    ob2 = jnp.argmax(v2, axis=-1)
    has2 = jnp.take_along_axis(v2, ob2[:, None], axis=1)[:, 0] > 0
    theta2 = peak_theta(ob2)
    return theta1, theta2, has2


def _descriptors(
    mpx: jnp.ndarray, apx: jnp.ndarray, xy_loc: jnp.ndarray,
    sigma: jnp.ndarray, theta: jnp.ndarray, params: SiftParams,
    chunk: int = 256,
):
    """128-d descriptor per keypoint, accumulated PER PIXEL of the
    keypoint's gradient patch: each pixel is rotated into the keypoint
    frame, assigned trilinear hat weights over the (4, 4, 8) bin grid
    (bin width 3*sigma), and the bins contract as one batched MXU matmul
    per chunk.  Replaces the rotated-grid resample whose one-hot sampling
    matmuls dominated descriptor time.

    mpx/apx: (K, PSZ, PSZ) gradient magnitude/angle patches."""
    K, P, _ = mpx.shape
    S = P * P
    ar = jnp.arange(P, dtype=mpx.dtype)
    c4 = jnp.arange(4, dtype=mpx.dtype)
    c8 = jnp.arange(8, dtype=mpx.dtype)

    def desc_chunk(args):
        mc, ac, xyc, sgc, thc = args
        C = mc.shape[0]
        rx = ar[None, None, :] - xyc[:, 0, None, None]   # (C, 1, P)
        ry = ar[None, :, None] - xyc[:, 1, None, None]   # (C, P, 1)
        hw = jnp.maximum(3.0 * sgc, 1e-3)[:, None, None]  # bin width, px
        ct = jnp.cos(thc)[:, None, None]
        st = jnp.sin(thc)[:, None, None]
        # inverse-rotate pixel offsets into bin coords (forward map:
        # offset = hw * R(theta) @ [gv, gu])
        gv = (rx * ct + ry * st) / hw
        gu = (-rx * st + ry * ct) / hw
        wgt = jnp.exp(-(gu * gu + gv * gv) / (2.0 * 2.0 ** 2))
        contrib = (mc * wgt).reshape(C, S)
        bu = (gu + 2.0 - 0.5).reshape(C, S)
        bv = (gv + 2.0 - 0.5).reshape(C, S)
        ob8 = (jnp.mod(ac - thc[:, None, None], 2 * jnp.pi)
               / (2 * jnp.pi) * 8.0).reshape(C, S)
        Au = jnp.maximum(0.0, 1.0 - jnp.abs(bu[..., None] - c4))  # (C, S, 4)
        Av = jnp.maximum(0.0, 1.0 - jnp.abs(bv[..., None] - c4))  # (C, S, 4)
        do_ = jnp.abs(ob8[..., None] - c8)
        do_ = jnp.minimum(do_, 8.0 - do_)                         # circular
        Ao = jnp.maximum(0.0, 1.0 - do_)                          # (C, S, 8)
        T = (contrib[..., None] * Au)[..., :, None] * Av[..., None, :]
        d = jnp.einsum("ksuv,kso->kuvo", T, Ao).reshape(C, 128)
        n = jnp.linalg.norm(d, axis=-1, keepdims=True) + 1e-12
        d = jnp.minimum(d / n, 0.2)
        return d / (jnp.linalg.norm(d, axis=-1, keepdims=True) + 1e-12)

    if K <= chunk:
        return desc_chunk((mpx, apx, xy_loc, sigma, theta))
    # chunk the keypoint axis: the (C, P*P, 16) trilinear tensor is the
    # peak intermediate; unchunked at K=1024 x batch it would be GBs
    nch = -(-K // chunk)
    pad = nch * chunk - K
    if pad:
        mpx = jnp.pad(mpx, ((0, pad), (0, 0), (0, 0)))
        apx = jnp.pad(apx, ((0, pad), (0, 0), (0, 0)))
        xy_loc = jnp.pad(xy_loc, ((0, pad), (0, 0)))
        sigma = jnp.pad(sigma, (0, pad), constant_values=1.0)
        theta = jnp.pad(theta, (0, pad))
    args = jax.tree_util.tree_map(
        lambda x: x.reshape((nch, chunk) + x.shape[1:]),
        (mpx, apx, xy_loc, sigma, theta),
    )
    out = jax.lax.map(desc_chunk, args)
    return out.reshape(nch * chunk, 128)[:K]


@partial(jax.jit, static_argnums=(1,))
def extract_sift(image: jnp.ndarray, params: SiftParams = SiftParams()) -> SiftFeatures:
    """Extract SIFT features from a grayscale image (H, W) float32 [0, 1]."""
    S = params.n_scales
    base = image
    first_scale = 1.0
    upsample_first = params.first_octave == -1
    if upsample_first:
        # the 2x upsample folds into the first octave's blur operands —
        # no resized image is materialized
        first_scale = 0.5
    # assumed camera sigma 0.5 (x2 if upsampled)
    sigma_init = 0.5 / first_scale

    all_xy = []
    all_sigma = []
    all_resp = []
    all_theta = []
    all_desc = []
    all_valid = []

    octave_img = base
    base_sigma = sigma_init   # absolute blur of octave_img at its own scale
    for o in range(params.n_octaves):
        # higher octaves are smaller — scale the keypoint budget with area
        kp_per_octave = max(64, params.max_kp // 2 >> o)
        if octave_img.shape[0] < 16 or octave_img.shape[1] < 16:
            break
        scale = first_scale * (2 ** o)
        # every level blurs directly from the octave base (Gaussian
        # semigroup), batched into one MXU matmul pair
        incs = []
        lvl0_from_base = base_sigma < params.sigma0 - 1e-6
        s_start = 0 if lvl0_from_base else 1
        for s in range(s_start, S + 3):
            sig_abs = params.sigma0 * 2 ** (s / S)
            incs.append(math.sqrt(max(sig_abs ** 2 - base_sigma ** 2, 0.01)))
        levels = _gauss_levels_matmul(
            octave_img, incs, upsample2=(o == 0 and upsample_first)
        )
        if lvl0_from_base:
            gauss = levels
        else:
            gauss = jnp.concatenate([octave_img[None], levels])
        xy, s_idx, sigma_o, resp, valid = _extract_octave(gauss, params, kp_per_octave)

        # orientation + descriptor: per-keypoint gradient patches sliced
        # from the keypoint's own scale; magnitude/angle computed once and
        # shared by the histogram and both descriptor orientations
        sclamp = jnp.clip(s_idx - 1, 0, S - 1)
        dxp, dyp, origin = _extract_patches(gauss[1 : S + 1], xy, sclamp)
        xy_loc = xy - origin.astype(xy.dtype)
        mpx = jnp.sqrt(dxp * dxp + dyp * dyp)
        apx = jnp.arctan2(dyp, dxp)
        mo, ao, xy_o = _crop_ori_window(mpx, apx, xy_loc)
        theta1, theta2, has2 = _orientations(mo, ao, xy_o, sigma_o, params)
        if params.n_orientations >= 2:
            # duplicate keypoints at secondary orientation peaks (0.8 rule)
            xy_d = jnp.concatenate([xy, xy])
            sig_d = jnp.concatenate([sigma_o, sigma_o])
            th_d = jnp.concatenate([theta1, theta2])
            desc_d = jnp.concatenate([
                _descriptors(mpx, apx, xy_loc, sigma_o, theta1, params),
                _descriptors(mpx, apx, xy_loc, sigma_o, theta2, params),
            ])
            valid_d = jnp.concatenate([valid, valid & has2])
            resp_d = jnp.concatenate([resp, resp])
        else:
            th_d = theta1
            desc_d = _descriptors(mpx, apx, xy_loc, sigma_o, theta1, params)
            xy_d, sig_d, valid_d, resp_d = xy, sigma_o, valid, resp

        all_xy.append((xy_d + 0.5) * scale - 0.5)
        all_sigma.append(sig_d * scale)
        all_resp.append(jnp.abs(resp_d))
        all_theta.append(th_d)
        all_desc.append(desc_d)
        all_valid.append(valid_d)
        octave_img = _resize_half(gauss[S])
        base_sigma = params.sigma0

    xy = jnp.concatenate(all_xy)
    sigma = jnp.concatenate(all_sigma)
    resp = jnp.concatenate(all_resp)
    theta = jnp.concatenate(all_theta)
    desc = jnp.concatenate(all_desc)
    valid = jnp.concatenate(all_valid)

    # global top max_kp by response
    score = jnp.where(valid, resp, -1.0)
    k = min(params.max_kp, score.shape[0])
    top_val, top_idx = jax.lax.top_k(score, k)
    return SiftFeatures(
        xy=xy[top_idx],
        sigma=sigma[top_idx],
        response=resp[top_idx],
        orientation=theta[top_idx],
        desc=desc[top_idx],
        valid=top_val > 0,
    )
