"""Joint visual BA solver: LM with Schur complement over landmark blocks.

The TPU-native replacement for the reference's Ceres DENSE_SCHUR problem
(/root/reference/src/lvba_system.cpp:1571-1643):

  * parameter blocks: M camera poses (6-dof right-multiplicative tangent;
    camera 0 held fixed, :1582-1583) and P track points (3-dof) — a point
    enters only with a valid LiDAR plane prior (:1593-1609);
  * residuals: whitened distorted reprojection (sigma_px = 0.5 px) and
    whitened point-to-plane (sigma_plane = 0.01 m), both without robust
    loss (the reference passes nullptr, :1630-1639);
  * each LM iteration: batched residual/Jacobian evaluation, block-diagonal
    Hpp inversion, Schur reduction S = Hcc - W Hpp⁻¹ Wᵀ assembled by one
    scatter over co-observing observation pairs, dense solve of the reduced
    (6M, 6M) camera system, landmark back-substitution;
  * Nielsen damping, same schedule as the LiDAR LM.

The observation-pair index (which camera pairs couple through which point)
is static per problem and precomputed on the host; everything per-iteration
is jitted JAX.
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.camera import CameraModel
from ..geometry.so3 import exp_so3
from ..factors.reprojection import (
    plane_point_batch,
    reproj_jacobians_batch,
    reproj_jacobians_expanded,
)


@dataclasses.dataclass
class VisualBAProblem:
    cam: CameraModel
    obs_cam: np.ndarray    # (O,) int32
    obs_pt: np.ndarray     # (O,) int32
    obs_uv: np.ndarray     # (O, 2)
    plane_n: np.ndarray    # (P, 3)
    plane_d: np.ndarray    # (P,)
    num_cams: int
    num_pts: int
    sigma_px: float = 0.5
    sigma_plane: float = 0.01
    use_plane: bool = True
    fix_first: bool = True
    # "lu": replicated direct solve of the reduced camera system; "cg":
    # block-Jacobi preconditioned CG whose matvec row-shards over the mesh
    # (solver/dist_solve.py); "cg_mf": MATRIX-FREE CG applying S per
    # observation — the O(Σ track_len²) pair list is never built (the
    # long-track scaling path); "auto" picks by size and pair count
    # (_auto_solver)
    reduced_solver: str = "auto"
    # when the observation-pair list exceeds this, the Schur scatter runs
    # as a lax.scan over fixed-size chunks so peak memory is bounded at
    # pair_chunk x 36 floats instead of O(sum of track-length^2)
    pair_chunk: int = 1 << 18


class VisualBAResult(NamedTuple):
    R: jnp.ndarray
    t: jnp.ndarray
    X: jnp.ndarray
    iters: int
    cost0: float
    cost: float


def _tier_tables(obs_cam: np.ndarray, obs_pt: np.ndarray, num_cams: int):
    """Shared host tiering: points grouped by pow2 track-length class,
    each class a padded (Pv, K) table.  Returns a list of
    (pt (Pv,), idx (Pv, K), cam (Pv, K), mask (Pv, K)) numpy tuples where
    idx indexes the FLAT observation arrays (pad -> O) and cam pads to
    num_cams (whose one-hot column is all-zero).  Static per problem."""
    O = obs_pt.shape[0]
    order = np.argsort(obs_pt, kind="stable")
    spt = obs_pt[order]
    starts = np.flatnonzero(np.concatenate([[True], spt[1:] != spt[:-1]]))
    counts = np.diff(np.append(starts, O))
    out = []
    # classes {4, 8, 12, 16, 24, 32, 48, ...} = pow2 and 1.5*pow2: caps
    # the pad amplification of every per-observation op at 1.33x (pure
    # pow2 classes pad up to 2x — e.g. 10-long tracks padded to 16 cost
    # the tier-native Jacobian evaluation its whole advantage)
    c = np.maximum(counts, 1)
    p2 = 1 << np.ceil(np.log2(c)).astype(np.int64)
    k34 = 3 * p2 // 4
    kclass = np.maximum(4, np.where((k34 >= c) & (p2 >= 16), k34, p2))
    for K in np.unique(kclass):
        sel = np.flatnonzero(kclass == K)
        K = int(K)
        # vectorized tier fill (a per-point python loop stalled ~tens of
        # seconds at P ~ 1M): positions past each point's count mask to
        # the pad row O / pad camera id num_cams
        pos = starts[sel][:, None] + np.arange(K)[None, :]
        mask = np.arange(K)[None, :] < counts[sel][:, None]
        rows = order[np.minimum(pos, O - 1)]
        idx = np.where(mask, rows, O).astype(np.int32)
        cam = np.where(mask, obs_cam[rows], num_cams).astype(np.int32)
        out.append((spt[starts[sel]].astype(np.int32), idx, cam, mask))
    return out


def _point_major_tiers(obs_cam: np.ndarray, obs_pt: np.ndarray,
                       num_pts: int, num_cams: int):
    """Host-built point-major tiers for the cg_pm matvec
    (dist_solve.solve_schur_cg_pm): padded (Pv, K) tables of flat
    observation indices (pad -> O) and camera ids (pad -> M)."""
    from .dist_solve import PMTier

    return tuple(
        PMTier(idx=jnp.asarray(idx), cam=jnp.asarray(cam))
        for _, idx, cam, _ in _tier_tables(obs_cam, obs_pt, num_cams)
    )


def _build_pairs(obs_pt: np.ndarray, num_pts: int):
    """All ordered observation pairs sharing a point (host, static)."""
    order = np.argsort(obs_pt, kind="stable")
    spt = obs_pt[order]
    starts = np.flatnonzero(np.concatenate([[True], spt[1:] != spt[:-1]]))
    counts = np.diff(np.append(starts, spt.shape[0]))
    pair_a = []
    pair_b = []
    for k in np.unique(counts):
        sel = counts == k
        s = starts[sel]
        grid = np.arange(k)
        a = (s[:, None, None] + grid[None, :, None]) + np.zeros((1, 1, k), dtype=np.int64)
        b = (s[:, None, None] + grid[None, None, :]) + np.zeros((1, k, 1), dtype=np.int64)
        pair_a.append(a.reshape(-1))
        pair_b.append(b.reshape(-1))
    pair_a = order[np.concatenate(pair_a)] if pair_a else np.zeros(0, np.int64)
    pair_b = order[np.concatenate(pair_b)] if pair_b else np.zeros(0, np.int64)
    return pair_a.astype(np.int32), pair_b.astype(np.int32)


class _ProbStatic(NamedTuple):
    """Hashable static view of VisualBAProblem for the module-level jit:
    only the scalar/flag fields the traced code reads (arrays travel as
    jit ARGUMENTS so repeat solves with equal shapes reuse the compiled
    executable instead of retracing — a fresh per-call jax.jit closure
    was costing ~2 s of tracing per solve)."""

    num_cams: int
    num_pts: int
    sigma_px: float
    sigma_plane: float
    use_plane: bool
    fix_first: bool
    reduced_solver: str
    pair_chunk: int


def _pstat(prob) -> "_ProbStatic":
    return _ProbStatic(
        int(prob.num_cams), int(prob.num_pts), float(prob.sigma_px),
        float(prob.sigma_plane), bool(prob.use_plane), bool(prob.fix_first),
        str(prob.reduced_solver), int(prob.pair_chunk),
    )


class _LinCache(NamedTuple):
    """u-independent linearization at one state, carried across rejected
    LM steps (the Ceres analogue: the Jacobian is re-evaluated only after
    an accepted step; rejected steps re-solve with new damping from the
    cached linearization — lvba_system.cpp:1571-1643 via Ceres'
    Evaluator caching)."""

    g_c: jnp.ndarray   # (M, 6)
    g_p: jnp.ndarray   # (P, 3)
    Hcc: jnp.ndarray   # (M, 6, 6) undamped
    Hpp: jnp.ndarray   # (P, 3, 3) undamped (incl. plane terms)
    Wb: jnp.ndarray    # (O, 6, 3) camera-point coupling blocks
    cost: jnp.ndarray  # scalar 0.5*||r||^2 at the linearization point


class _TierConst(NamedTuple):
    """Per-tier observation constants for the TIER-NATIVE visual path:
    observations live permanently in point-major (Pv, K) layout, so the
    LM iteration contains NO O-length gather/scatter at all — camera
    expansion/reduction are exact one-hot selection matmuls and point
    reductions are plain K-axis sums.  Pad slots carry cam id M -> a
    zero one-hot row -> R = 0, Z = 0, and the reprojection's Z-gate
    (reproj_residual, utils.hpp:78 semantics) zeroes their residual AND
    Jacobians exactly — no weights needed.

    The (Pv*K, M) one-hots are deliberately NOT stored: generated
    inline from `cam` at every use so XLA fuses the compare-broadcast
    into the dot's operand read.  A precomputed one-hot is a real HBM
    array the MXU must stream (~0.6 GB at M=1000/O=200k, measured
    +~40 ms/iter); the fused generation reads only the (Pv, K) int32
    ids."""

    uv: jnp.ndarray    # (Pv, K, 2) pixel measurements (pad rows unused)
    cam: jnp.ndarray   # (Pv, K) int32 camera ids (pad -> M)
    n: jnp.ndarray     # (Pv, 3) plane normals in tier point order
    d: jnp.ndarray     # (Pv,) plane offsets


class _LinCacheT(NamedTuple):
    """Tier-layout analogue of _LinCache: camera blocks are global,
    point blocks and coupling blocks are per-tier tuples."""

    g_c: jnp.ndarray   # (M, 6)
    Hcc: jnp.ndarray   # (M, 6, 6) undamped
    g_p: tuple         # per tier (Pv, 3)
    Hpp: tuple         # per tier (Pv, 3, 3) undamped (incl. plane terms)
    Wb: tuple          # per tier (Pv, K, 6, 3)
    cost: jnp.ndarray


def _expand_cam_poses(cam_ids: jnp.ndarray, M: int,
                      R: jnp.ndarray, t: jnp.ndarray):
    """Per-observation (R, t) WITHOUT a per-observation row gather: one
    exact bf16-split selection matmul against the camera one-hot,
    generated INLINE from cam_ids so XLA fuses it into the dot (the
    visual analogue of plane_eigen._pose_channels — R[obs_cam] row
    gathers serialize on TPU).  Pad ids (M) give a zero one-hot row ->
    R = 0, t = 0."""
    from .dist_solve import _sel_pack3, _sel_unpack3, pm_onehot

    dt = R.dtype
    oh = pm_onehot(cam_ids, M, dt)
    tbl = jnp.concatenate([R.reshape(M, 9), t], axis=1)          # (M, 12)
    e = _sel_unpack3(
        jax.lax.dot_general(
            oh, _sel_pack3(tbl), (((1,), (0,)), ((), ())),
            preferred_element_type=dt,
        ), 12,
    )
    return e[:, :9].reshape(-1, 3, 3), e[:, 9:12]


def _reduce_to_cams(cam_ids: jnp.ndarray, M: int, vals: jnp.ndarray):
    """segment_sum-by-camera as an exact selection matmul: vals (N, C)
    f32/f64 -> (M, C).  The transpose contraction of _expand_cam_poses;
    one-hot generated inline (fused) for the same HBM reason."""
    from .dist_solve import _sel_pack3, _sel_unpack3, pm_onehot

    C = vals.shape[-1]
    oh = pm_onehot(cam_ids, M, vals.dtype)
    d = jax.lax.dot_general(
        oh, _sel_pack3(vals), (((0,), (0,)), ((), ())),
        preferred_element_type=vals.dtype,
    )
    return _sel_unpack3(d, C)


def _linearize_tiers(pstat: "_ProbStatic", cam, tcs, R, t, Xts) -> _LinCacheT:
    """Tier-native residual/Jacobian evaluation + u-independent
    reductions: the tier-layout replacement for _linearize (which costs
    ~13 ms of the M=1000 iteration in per-observation pose/point gathers
    and 4 O-length segment_sums — STATUS.md round-4 roadmap items 1-2)."""
    with jax.default_matmul_precision("highest"):
        M = pstat.num_cams
        dt = R.dtype
        g_c = jnp.zeros((M, 6), dt)
        Hcc = jnp.zeros((M, 6, 6), dt)
        cost = jnp.zeros((), dt)
        g_p_l, Hpp_l, Wb_l = [], [], []
        for tc, Xt in zip(tcs, Xts):
            Pv, K = tc.uv.shape[:2]
            Re, te = _expand_cam_poses(tc.cam, M, R, t)
            Xe = jnp.broadcast_to(Xt[:, None, :], (Pv, K, 3)).reshape(-1, 3)
            r, Jc, Jp = reproj_jacobians_expanded(
                cam, Re, te, Xe, tc.uv.reshape(-1, 2), pstat.sigma_px
            )                               # (PvK, 2), (PvK, 2, 6), (PvK, 2, 3)
            cost = cost + 0.5 * jnp.sum(r * r)
            g_c = g_c + _reduce_to_cams(
                tc.cam, M, jnp.einsum("oab,oa->ob", Jc, r)
            )
            Hcc = Hcc + _reduce_to_cams(
                tc.cam, M, jnp.einsum("oam,oan->omn", Jc, Jc).reshape(-1, 36)
            ).reshape(M, 6, 6)
            g_p = jnp.einsum("oab,oa->ob", Jp, r).reshape(Pv, K, 3).sum(1)
            Hpp = jnp.einsum(
                "oam,oan->omn", Jp, Jp
            ).reshape(Pv, K, 9).sum(1).reshape(Pv, 3, 3)
            if pstat.use_plane:
                rp, Jx = plane_point_batch(tc.n, tc.d, Xt, pstat.sigma_plane)
                cost = cost + 0.5 * jnp.sum(rp * rp)
                g_p = g_p + rp[:, None] * Jx
                Hpp = Hpp + Jx[:, :, None] * Jx[:, None, :]
            g_p_l.append(g_p)
            Hpp_l.append(Hpp)
            Wb_l.append(
                jnp.einsum("oam,oan->omn", Jc, Jp).reshape(Pv, K, 6, 3)
            )
        return _LinCacheT(g_c=g_c, Hcc=Hcc, g_p=tuple(g_p_l),
                          Hpp=tuple(Hpp_l), Wb=tuple(Wb_l), cost=cost)


def _solve_cached_tiers(pstat: "_ProbStatic", tcs, cache: _LinCacheT, u):
    """Damped assemble + point-major Schur CG + back-substitution, all in
    tier layout: the one-hots are problem constants (hoisted out of the
    whole LM loop) and no per-call Wt/Yt row gathers or one-hot builds
    remain (~22 ms/call of per-call assembly at M=1000, STATUS.md
    roadmap 2).  Returns (dc (M, 6), dX per-tier tuple, q1)."""
    from .dist_solve import _inv3_batched, solve_schur_cg_pm_tiers

    with jax.default_matmul_precision("highest"):
        M = pstat.num_cams
        g_c, Hcc = cache.g_c, cache.Hcc
        dt = g_c.dtype
        eye6 = jnp.eye(6, dtype=dt)
        eye3 = jnp.eye(3, dtype=dt)
        # identical damping/pinning semantics to _solve_cached_inner
        dHcc = Hcc + u * eye6 * jnp.diagonal(
            Hcc, axis1=-2, axis2=-1)[..., None, :]
        dcc = jnp.diagonal(dHcc, axis1=-2, axis2=-1)
        dHcc = dHcc + eye6 * (1e-12 * (1.0 + jnp.max(dcc)))

        b = -g_c
        tdat = []
        Hpi_l = []
        for tc, g_p, Hpp, Wb in zip(tcs, cache.g_p, cache.Hpp, cache.Wb):
            dHpp = Hpp + u * eye3 * jnp.diagonal(
                Hpp, axis1=-2, axis2=-1)[..., None, :] + 1e-12 * eye3
            Hpi = _inv3_batched(dHpp)
            Y = jnp.einsum("pkmn,pnl->pkml", Wb, Hpi)     # (Pv, K, 6, 3)
            yg = jnp.einsum("pkml,pl->pkm", Y, g_p)       # (Pv, K, 6)
            b = b + _reduce_to_cams(tc.cam, M, yg.reshape(-1, 6))
            tdat.append((Wb, Y, tc.cam))
            Hpi_l.append(Hpi)

        bb = b.at[0].set(0.0) if pstat.fix_first else b
        dc = solve_schur_cg_pm_tiers(
            dHcc, tuple(tdat), bb, fix_first=pstat.fix_first
        )

        # back-substitution + predicted decrease, tier-native
        d_cc = jnp.diagonal(Hcc, axis1=-2, axis2=-1)
        q1 = 0.5 * jnp.sum(dc * (u * d_cc * dc - g_c))
        from .dist_solve import _sel_pack3, _sel_unpack3

        dcs3 = _sel_pack3(dc)
        dX_l = []
        for tc, g_p, Hpp, (Wb, Y, _), Hpi in zip(
                tcs, cache.g_p, cache.Hpp, tdat, Hpi_l):
            from .dist_solve import pm_onehot

            Pv, K = Wb.shape[:2]
            dce = _sel_unpack3(
                jax.lax.dot_general(
                    pm_onehot(tc.cam, M, dt), dcs3, (((1,), (0,)), ((), ())),
                    preferred_element_type=dt,
                ), 6,
            ).reshape(Pv, K, 6)
            wtdc = jnp.einsum("pkml,pkm->pl", Wb, dce)    # (Pv, 3)
            dX = jnp.einsum("pab,pb->pa", Hpi, -g_p - wtdc)
            d_pp = jnp.diagonal(Hpp, axis1=-2, axis2=-1)
            q1 = q1 + 0.5 * jnp.sum(dX * (u * d_pp * dX - g_p))
            dX_l.append(dX)
        return dc, tuple(dX_l), q1


def _linearize(prob: VisualBAProblem, consts, R, t, X) -> _LinCache:
    """Residual/Jacobian evaluation + all u-independent reductions.

    Traced under HIGHEST matmul precision — the TPU bf16 default corrupts
    the Schur assembly and the reduced LU solve (see solver/lm.py note)."""
    with jax.default_matmul_precision("highest"):
        return _linearize_inner(prob, consts, R, t, X)


def _linearize_inner(prob: VisualBAProblem, consts, R, t, X) -> _LinCache:
    cam, obs_cam, obs_pt, obs_uv, obs_w, n_all, d_all = consts
    M, P = prob.num_cams, prob.num_pts

    r, Jc, Jp = reproj_jacobians_batch(
        cam, R, t, X, obs_cam, obs_pt, obs_uv, prob.sigma_px
    )
    # padded observations (obs_w == 0) contribute exactly nothing
    r = r * obs_w[:, None]
    Jc = Jc * obs_w[:, None, None]
    Jp = Jp * obs_w[:, None, None]
    cost = 0.5 * jnp.sum(r * r)
    # gradients
    g_c = jax.ops.segment_sum(
        jnp.einsum("oab,oa->ob", Jc, r), obs_cam, num_segments=M
    )  # (M, 6)
    g_p = jax.ops.segment_sum(
        jnp.einsum("oab,oa->ob", Jp, r), obs_pt, num_segments=P
    )  # (P, 3)
    # block Hessians
    Hcc = jax.ops.segment_sum(
        jnp.einsum("oam,oan->omn", Jc, Jc), obs_cam, num_segments=M
    )  # (M, 6, 6)
    Hpp = jax.ops.segment_sum(
        jnp.einsum("oam,oan->omn", Jp, Jp), obs_pt, num_segments=P
    )  # (P, 3, 3)
    if prob.use_plane:
        rp, Jx = plane_point_batch(n_all, d_all, X, prob.sigma_plane)
        cost = cost + 0.5 * jnp.sum(rp * rp)
        g_p = g_p + rp[:, None] * Jx
        Hpp = Hpp + Jx[:, :, None] * Jx[:, None, :]
    Wb = jnp.einsum("oam,oan->omn", Jc, Jp)  # (O, 6, 3)
    return _LinCache(g_c=g_c, g_p=g_p, Hcc=Hcc, Hpp=Hpp, Wb=Wb, cost=cost)


def _normal_eq(prob: VisualBAProblem, consts, pair_a, pair_b, R, t, X, u,
               s_sharding=None, pairs_sharded=False, tiers=()):
    """One damped normal-equation build + solve. Returns (dc, dX, q1)."""
    cache = _linearize(prob, consts, R, t, X)
    return _solve_cached(prob, consts, pair_a, pair_b, cache, u,
                         s_sharding, pairs_sharded, tiers)


def _solve_cached(prob: VisualBAProblem, consts, pair_a, pair_b,
                  cache: _LinCache, u, s_sharding=None, pairs_sharded=False,
                  tiers=()):
    """Damped assemble + Schur solve from a cached linearization.

    Everything here depends on the damping u, so it re-runs on rejected
    steps — but the Jacobian evaluation (in _linearize) does not."""
    with jax.default_matmul_precision("highest"):
        return _solve_cached_inner(prob, consts, pair_a, pair_b, cache, u,
                                   s_sharding, pairs_sharded, tiers)


def _solve_cached_inner(prob: VisualBAProblem, consts, pair_a, pair_b,
                        cache: _LinCache, u, s_sharding, pairs_sharded,
                        tiers=()):
    cam, obs_cam, obs_pt, obs_uv, obs_w, n_all, d_all = consts
    M, P = prob.num_cams, prob.num_pts
    g_c, g_p, Hcc, Hpp, Wb, _ = cache
    R = g_c  # dtype/shape anchor for eye constructions below

    # damping (multiplicative on diagonals, like H + u*diag(H))
    eye6 = jnp.eye(6, dtype=R.dtype)
    eye3 = jnp.eye(3, dtype=R.dtype)
    dHcc = Hcc + u * eye6 * jnp.diagonal(Hcc, axis1=-2, axis2=-1)[..., None, :]
    # cameras OUTSIDE every kept track have exactly-zero blocks — the
    # multiplicative damping is then zero too and the reduced system is
    # singular (NaN steps).  Ceres leaves residual-less parameter blocks
    # constant (/root/reference/src/lvba_system.cpp:1578-1643 adds
    # reprojection residuals only for kept tracks); the epsilon pins such
    # cameras exactly (their reduced rhs is exactly zero -> dc = 0) and
    # perturbs observed ones by ~1e-8 relative
    dcc = jnp.diagonal(dHcc, axis1=-2, axis2=-1)
    dHcc = dHcc + eye6 * (1e-12 * (1.0 + jnp.max(dcc)))
    dHpp = Hpp + u * eye3 * jnp.diagonal(Hpp, axis1=-2, axis2=-1)[..., None, :]
    # guard singular landmark blocks
    dHpp = dHpp + 1e-12 * eye3
    # closed-form batched 3x3 inverse: jnp.linalg.inv on (P, 3, 3)
    # serializes on TPU (see dist_solve._inv3_batched)
    from .dist_solve import _inv3_batched

    Hpp_inv = _inv3_batched(dHpp)

    W = Wb                                           # (O, 6, 3)
    Y = jnp.einsum("omn,onk->omk", W, Hpp_inv[obs_pt])  # (O, 6, 3)

    # reduced rhs: b = -g_c + Σ Y_o g_p[pt_o]
    b = -g_c + jax.ops.segment_sum(
        jnp.einsum("omk,ok->om", Y, g_p[obs_pt]), obs_cam, num_segments=M
    )

    solver = prob.reduced_solver
    if solver == "auto":
        solver = _auto_solver(M, pairs_sharded, int(pair_a.shape[0]))
    if solver == "cg_mf":
        # matrix-free reduced camera system (Ceres ITERATIVE_SCHUR
        # analogue): S x applies per OBSERVATION — the O(Σ track_len²)
        # pair list is never built and no (6M)² matrix is formed
        from .dist_solve import solve_schur_cg_mf, solve_schur_cg_pm

        bb = b.at[0].set(0.0) if prob.fix_first else b
        if tiers:
            # point-major matvec: no per-observation gathers/scatters
            # inside the CG loop (they serialize on TPU — the M=1000
            # bench sat at ~1.1 s/iter on them; see solve_schur_cg_pm)
            dc = solve_schur_cg_pm(
                dHcc, W, Y, tiers, bb, fix_first=prob.fix_first
            )
        else:
            dc = solve_schur_cg_mf(
                dHcc, W, Y, obs_cam, obs_pt, bb, P, fix_first=prob.fix_first
            )
        return _backsub(prob, cache, consts, Hpp_inv, W, dc, u)

    # Schur matrix: diag Hcc − Σ_pairs Y_a W_bᵀ
    Q = pair_a.shape[0]
    if Q > prob.pair_chunk and not pairs_sharded:
        # bounded-memory path: scan fixed-size pair chunks.  Pairs pad with
        # index O -> a virtual all-zero observation row, so padding adds an
        # exactly-zero block.
        chunk = prob.pair_chunk
        nc = -(-Q // chunk)
        pad = nc * chunk - Q
        Ye = jnp.concatenate([Y, jnp.zeros((1,) + Y.shape[1:], Y.dtype)])
        We = jnp.concatenate([W, jnp.zeros((1,) + W.shape[1:], W.dtype)])
        oce = jnp.concatenate([obs_cam, jnp.zeros((1,), obs_cam.dtype)])
        O_pad = jnp.asarray(Y.shape[0], pair_a.dtype)
        pa2 = jnp.concatenate([pair_a, jnp.full((pad,), O_pad, pair_a.dtype)])
        pb2 = jnp.concatenate([pair_b, jnp.full((pad,), O_pad, pair_b.dtype)])
        pa2 = pa2.reshape(nc, chunk)
        pb2 = pb2.reshape(nc, chunk)

        def body(S_acc, ab):
            a, b = ab
            blk = -jnp.einsum("qmk,qnk->qmn", Ye[a], We[b])
            pidx = oce[a].astype(jnp.int32) * M + oce[b].astype(jnp.int32)
            return S_acc + jax.ops.segment_sum(blk, pidx, num_segments=M * M), None

        S, _ = jax.lax.scan(
            body, jnp.zeros((M * M, 6, 6), Y.dtype), (pa2, pb2)
        )
    else:
        pair_blocks = -jnp.einsum("qmk,qnk->qmn", Y[pair_a], W[pair_b])
        pair_idx = obs_cam[pair_a].astype(jnp.int32) * M + obs_cam[pair_b].astype(jnp.int32)
        S = jax.ops.segment_sum(pair_blocks, pair_idx, num_segments=M * M)
    S = S.reshape(M, M, 6, 6)
    S = S.at[jnp.arange(M), jnp.arange(M)].add(dHcc)

    if prob.fix_first:
        S = S.at[0, :].set(0.0).at[:, 0].set(0.0)
        S = S.at[0, 0].set(jnp.eye(6, dtype=R.dtype))
        b = b.at[0].set(0.0)

    A = jnp.transpose(S, (0, 2, 1, 3)).reshape(M * 6, M * 6)
    rhs = b.reshape(M * 6)
    if solver == "cg":
        # distributed path: A is already damped (dHcc) and made nonsingular
        # by fix_first; CG solves A dc = rhs with zero extra damping
        from .dist_solve import solve_damped_cg

        dc = solve_damped_cg(
            A, -rhs, jnp.zeros((), A.dtype), h_sharding=s_sharding
        )
    else:
        lu, piv = jax.scipy.linalg.lu_factor(A)
        dc = jax.scipy.linalg.lu_solve((lu, piv), rhs)
        resd = rhs - A @ dc
        dc = dc + jax.scipy.linalg.lu_solve((lu, piv), resd)
    dc = dc.reshape(M, 6)
    return _backsub(prob, cache, consts, Hpp_inv, W, dc, u)


def _auto_solver(M: int, pairs_sharded: bool, Q: int = 0) -> str:
    """auto policy (re-measured round 4, TPU v5e, after the point-major
    matvec landed).  Single-device "cg_mf" now routes through
    solve_schur_cg_pm — no per-observation gathers/scatters in the CG
    loop — and wins broadly:

      M=200 / 20k obs / Q=200k: pm 24.8 vs cg 49.2 vs lu 52.2 ms/iter
      M=1000 / 200k obs / Q=2M: pm 175.7 vs old mf 1148.8 ms/iter

    (identical converged costs).  The earlier round-2 crossover numbers
    (pair path 2.7x at Q=200k) were against the OLD per-observation
    matvec.  LU stays for small problems (6M < 1024) where a direct
    solve's exactness is free; the mesh path keeps the pair-scatter /
    assembled-CG formulations (the pm one-hots are replicated arrays)."""
    if not pairs_sharded and (Q > (1 << 20) or M * 6 >= 1024):
        return "cg_mf"
    if M * 6 >= 1024:
        return "cg"
    return "lu"


def _backsub(prob, cache: _LinCache, consts, Hpp_inv, W, dc, u):
    """Landmark back-substitution + predicted model decrease."""
    _, obs_cam, obs_pt, _, _, _, _ = consts
    P = prob.num_pts
    g_c, g_p, Hcc, Hpp = cache.g_c, cache.g_p, cache.Hcc, cache.Hpp
    # dX = Hpp⁻¹(−g_p − Σ W_oᵀ dc_{cam_o})
    wtdc = jax.ops.segment_sum(
        jnp.einsum("omk,om->ok", W, dc[obs_cam]), obs_pt, num_segments=P
    )
    dX = jnp.einsum("pmn,pn->pm", Hpp_inv, -g_p - wtdc)

    # q1 = 0.5 dxᵀ(u D dx − g) over the full (camera+point) system
    d_cc = jnp.diagonal(Hcc, axis1=-2, axis2=-1)
    d_pp = jnp.diagonal(Hpp, axis1=-2, axis2=-1)
    q1 = 0.5 * (
        jnp.sum(dc * (u * d_cc * dc - g_c))
        + jnp.sum(dX * (u * d_pp * dX - g_p))
    )
    return dc, dX, q1


def _nielsen_visual(c_prev, c_new, q1, u, v, rel_tol, dtype):
    """Visual-LM Nielsen trust-region bookkeeping (clipped gain ratio +
    damping-stall guard), shared by the flat and tier device loops so the
    damping schedule cannot diverge between them (the lidar loops share
    solver/lm.py:_nielsen_update the same way).  Returns (accept, u_new,
    v_new, converged, stalled)."""
    q = c_prev - c_new
    accept = q > 0
    qr = jnp.clip(q / jnp.maximum(q1, 1e-30), -1e3, 1e3)
    u_acc = u * jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * qr - 1.0) ** 3)
    u_new = jnp.where(accept, u_acc, u * v)
    v_new = jnp.where(accept, jnp.asarray(2.0, dtype), 2.0 * v)
    conv = accept & (jnp.abs(q) / jnp.maximum(c_prev, 1e-30) < rel_tol)
    stall = (~accept) & (u_new > 1e12)
    return accept, u_new, v_new, conv, stall

@partial(jax.jit, static_argnums=(0, 8, 9, 10, 11, 12))
def _lm_device_loop(pstat, consts, pa, pb, tiers, R0_, t0_, X0_,
                    max_iters, u_init, rel_tol, s_sharding, pairs_sharded):
    """The whole LM as one fixed-trip jitted loop with done-masking.

    Module-level jit: repeat solves with equal shapes/statics reuse the
    compiled executable (per-call jit closures retraced the full graph
    every solve, ~2 s/call at M = 200)."""
    dtype = R0_.dtype
    cache0 = _linearize(pstat, consts, R0_, t0_, X0_)
    state = (
        R0_, t0_, X0_, cache0,
        jnp.asarray(u_init, dtype), jnp.asarray(2.0, dtype),
        jnp.zeros((), jnp.int32), jnp.zeros((), jnp.bool_),
    )

    def body(_i, s):
        R_, t_, X_, cache_, u_, v_, it_, done_ = s
        dc, dX, q1 = _solve_cached(pstat, consts, pa, pb, cache_, u_,
                                   s_sharding=s_sharding,
                                   pairs_sharded=pairs_sharded, tiers=tiers)
        R_t = jnp.matmul(
            R_, exp_so3(dc[:, 0:3]), precision=jax.lax.Precision.HIGHEST
        )
        t_t = t_ + dc[:, 3:6]
        X_t = X_ + dX
        # one Jacobian evaluation per iteration, at the TRIAL point:
        # its cost is the acceptance test, and on acceptance it IS
        # the next iteration's linearization; a rejected step keeps
        # the cached one (Ceres Evaluator-caching semantics) — no
        # separate residual-only pass, no post-accept re-evaluation
        cache_t = _linearize(pstat, consts, R_t, t_t, X_t)
        accept, u_new, v_new, conv, stall = _nielsen_visual(
            cache_.cost, cache_t.cost, q1, u_, v_, rel_tol, dtype
        )
        frz = lambda new, old: jnp.where(done_, old, new)
        # one fused where pass over the O-scale cache, not two
        sel = lambda new, old: jnp.where(accept & ~done_, new, old)
        return (
            sel(R_t, R_),
            sel(t_t, t_),
            sel(X_t, X_),
            jax.tree.map(sel, cache_t, cache_),
            frz(u_new, u_),
            frz(v_new, v_),
            jnp.where(done_, it_, it_ + 1),
            done_ | conv | stall,
        )

    R_, t_, X_, cache_, u_, v_, it_, done_ = jax.lax.fori_loop(
        0, max_iters, body, state
    )
    return R_, t_, X_, cache0.cost, cache_.cost, it_


@partial(jax.jit, static_argnums=(0, 6, 7, 8))
def _lm_device_loop_tiers(pstat, cam, tcs, R0_, t0_, X0ts,
                          max_iters, u_init, rel_tol):
    """Tier-native LM: the whole loop touches observations ONLY in
    point-major (Pv, K) tier layout — pose expansion and camera
    reductions are exact selection matmuls against one-hots hoisted out
    of the entire solve; point reductions are K-axis sums.  Same
    Nielsen/acceptance/caching semantics as _lm_device_loop."""
    dtype = R0_.dtype
    cache0 = _linearize_tiers(pstat, cam, tcs, R0_, t0_, X0ts)
    state = (
        R0_, t0_, X0ts, cache0,
        jnp.asarray(u_init, dtype), jnp.asarray(2.0, dtype),
        jnp.zeros((), jnp.int32), jnp.zeros((), jnp.bool_),
    )

    def body(_i, s):
        R_, t_, Xts_, cache_, u_, v_, it_, done_ = s
        dc, dXts, q1 = _solve_cached_tiers(pstat, tcs, cache_, u_)
        R_t = jnp.matmul(
            R_, exp_so3(dc[:, 0:3]), precision=jax.lax.Precision.HIGHEST
        )
        t_t = t_ + dc[:, 3:6]
        Xts_t = tuple(X + dX for X, dX in zip(Xts_, dXts))
        cache_t = _linearize_tiers(pstat, cam, tcs, R_t, t_t, Xts_t)
        accept, u_new, v_new, conv, stall = _nielsen_visual(
            cache_.cost, cache_t.cost, q1, u_, v_, rel_tol, dtype
        )
        frz = lambda new, old: jnp.where(done_, old, new)
        # one fused where pass over the O-scale cache, not two
        sel = lambda new, old: jnp.where(accept & ~done_, new, old)
        return (
            sel(R_t, R_),
            sel(t_t, t_),
            jax.tree.map(sel, Xts_t, Xts_),
            jax.tree.map(sel, cache_t, cache_),
            frz(u_new, u_),
            frz(v_new, v_),
            jnp.where(done_, it_, it_ + 1),
            done_ | conv | stall,
        )

    R_, t_, Xts_, cache_, u_, v_, it_, done_ = jax.lax.fori_loop(
        0, max_iters, body, state
    )
    return R_, t_, Xts_, cache0.cost, cache_.cost, it_


def solve_visual_ba(
    prob: VisualBAProblem,
    R0: np.ndarray,
    t0: np.ndarray,
    X0: np.ndarray,
    max_iters: int = 50,
    u_init: float = 1e-3,
    rel_tol: float = 1e-8,
    dtype=None,
    verbose: bool = False,
    mesh=None,
    shard_axis: str = "factors",
    device_loop: bool = True,
) -> VisualBAResult:
    """LM with Schur steps (Ceres-equivalent semantics).

    device_loop=True (default) runs the whole LM as one jitted fixed-trip
    loop with done-masking — a single device program, no per-iteration host
    round trips.  device_loop=False keeps the host-driven loop (useful for
    verbose debugging and true early exit).

    With `mesh`, observation and pair arrays are sharded over `shard_axis`
    (GSPMD): XLA partitions the residual/Jacobian work and Schur scatter
    across devices and inserts the all-reduces; the reduced (6M, 6M) camera
    solve stays replicated.  Padded observations carry zero weight.
    """
    if dtype is None:
        dtype = jnp.float64 if jax.config.read("jax_enable_x64") else jnp.float32
    resolved = prob.reduced_solver
    if resolved == "auto":
        counts = np.bincount(
            np.asarray(prob.obs_pt), minlength=prob.num_pts
        ).astype(np.int64)
        Q = int((counts ** 2).sum())
        resolved = _auto_solver(
            prob.num_cams, pairs_sharded=mesh is not None, Q=Q,
        )
        prob = dataclasses.replace(prob, reduced_solver=resolved)
        import logging

        logging.getLogger("global_lvba_tpu.solver").info(
            "[visualBA] auto solver=%s M=%d P=%d O=%d Q=%d maxlen=%d",
            resolved, prob.num_cams, prob.num_pts,
            int(np.asarray(prob.obs_pt).shape[0]), Q,
            int(counts.max()) if counts.size else 0,
        )
    if (resolved == "cg_mf" and mesh is None and device_loop and not verbose
            and os.environ.get("LVBA_VISUAL_TIER", "1") == "1"):
        # TIER-NATIVE route: observations live in point-major tier layout
        # for the WHOLE solve.  Requires every point to carry at least one
        # observation (tier rows are exactly the observed points; the
        # track builder guarantees >= 2 obs per point) — otherwise fall
        # through to the flat path whose plane-only points still move.
        tt = _tier_tables(
            np.asarray(prob.obs_cam, np.int32),
            np.asarray(prob.obs_pt, np.int32), prob.num_cams,
        )
        covered = sum(int(pt.shape[0]) for pt, _, _, _ in tt)
        # the tier-resident W/Y coupling blocks (2 copies held across the
        # solve) are the only O(Pv*K) float footprint — one-hots are
        # generated inline from the int32 ids, never materialized
        itemsize = jnp.dtype(dtype).itemsize
        tier_bytes = sum(
            idx.shape[0] * idx.shape[1] * 2 * 18 * itemsize
            for _, idx, _, _ in tt
        )
        if covered == prob.num_pts and tier_bytes <= int(os.environ.get(
                "LVBA_PM_ONEHOT_BUDGET", str(4 << 30))):
            uvp = np.concatenate(
                [np.asarray(prob.obs_uv, np.float64),
                 np.zeros((1, 2), np.float64)]
            ).astype(dtype)
            zeros_nd = not prob.use_plane
            tcs = tuple(
                _TierConst(
                    uv=jnp.asarray(uvp[idx]),
                    cam=jnp.asarray(cam_t),
                    n=jnp.zeros((pt.shape[0], 3), dtype) if zeros_nd
                    else jnp.asarray(
                        np.asarray(prob.plane_n)[pt].astype(dtype)),
                    d=jnp.zeros((pt.shape[0],), dtype) if zeros_nd
                    else jnp.asarray(
                        np.asarray(prob.plane_d)[pt].astype(dtype)),
                )
                for pt, idx, cam_t, _ in tt
            )
            X0a = np.asarray(X0)
            X0ts = tuple(
                jnp.asarray(X0a[pt].astype(dtype)) for pt, _, _, _ in tt
            )
            R_f, t_f, Xts_f, c0_j, c_f, it_j = _lm_device_loop_tiers(
                _pstat(prob), prob.cam, tcs,
                jnp.asarray(np.asarray(R0).astype(dtype)),
                jnp.asarray(np.asarray(t0).astype(dtype)),
                X0ts, int(max_iters), float(u_init), float(rel_tol),
            )
            X_f = jnp.asarray(X0a.astype(dtype))
            for (pt, _, _, _), Xt in zip(tt, Xts_f):
                X_f = X_f.at[jnp.asarray(pt)].set(Xt)
            return VisualBAResult(
                R=R_f, t=t_f, X=X_f,
                iters=int(it_j), cost0=float(c0_j), cost=float(c_f),
            )

    tiers = ()
    if resolved == "cg_mf":
        # matrix-free reduced solve: the O(Σ track_len²) pair list is
        # never needed (host memory included)
        pair_a = pair_b = np.zeros(0, np.int32)
        if mesh is None:
            tiers = _point_major_tiers(
                np.asarray(prob.obs_cam, np.int32),
                np.asarray(prob.obs_pt, np.int32),
                prob.num_pts, prob.num_cams,
            )
            # the pm matvec's (Pv*K, M) one-hots live in HBM for the
            # whole solve — guard their footprint (the per-observation
            # matvec it replaces is O(O) memory); fall back to the
            # gather-based matvec when they would not fit comfortably.
            # One-hots are bf16 (2 B) in f32 runs but FULL dtype width in
            # f64 parity runs, and each tier also holds gathered Wt/Yt
            # copies (2 x Pv*K*18 floats) for the whole solve — both
            # sized from the actual dtype
            itemsize = jnp.dtype(dtype).itemsize
            oh_itemsize = 2 if dtype == jnp.float32 else itemsize
            oh_bytes = sum(
                t.idx.shape[0] * t.idx.shape[1]
                * (oh_itemsize * prob.num_cams + 2 * 18 * itemsize)
                for t in tiers
            )
            if oh_bytes > int(os.environ.get(
                    "LVBA_PM_ONEHOT_BUDGET", str(4 << 30))):
                import logging

                logging.getLogger("global_lvba_tpu.solver").info(
                    "[visualBA] pm one-hots ~%.1f GB exceed budget; using"
                    " the per-observation matvec", oh_bytes / 2**30,
                )
                tiers = ()
    else:
        pair_a, pair_b = _build_pairs(prob.obs_pt, prob.num_pts)
    obs_cam = np.asarray(prob.obs_cam, np.int32)
    obs_pt = np.asarray(prob.obs_pt, np.int32)
    obs_uv = np.asarray(prob.obs_uv)
    O = obs_cam.shape[0]
    obs_w = np.ones(O, dtype=np.float64)

    put = lambda x, sharded: jnp.asarray(x)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P_

        n_dev = mesh.shape[shard_axis]
        Opad = ((O + n_dev - 1) // n_dev) * n_dev
        Q = pair_a.shape[0]
        Qpad = ((Q + n_dev - 1) // n_dev) * n_dev
        if Qpad > Q and Opad == O:
            # padded pairs must point at a zero-weight observation; if the
            # observation array needs no padding of its own, add one full
            # shard row of zero-weight slots so pad_obs is never a real obs
            Opad += n_dev
        obs_cam = np.pad(obs_cam, (0, Opad - O))
        obs_pt = np.pad(obs_pt, (0, Opad - O))
        obs_uv = np.pad(obs_uv, ((0, Opad - O), (0, 0)))
        obs_w = np.pad(obs_w, (0, Opad - O))
        # padded pairs point at a zero-weight padded observation
        pad_obs = np.int32(Opad - 1) if Opad > O else np.int32(0)
        pair_a = np.pad(pair_a, (0, Qpad - Q), constant_values=pad_obs)
        pair_b = np.pad(pair_b, (0, Qpad - Q), constant_values=pad_obs)
        shard = NamedSharding(mesh, P_(shard_axis))
        rep = NamedSharding(mesh, P_())

        def put(x, sharded):
            return jax.device_put(jnp.asarray(x), shard if sharded else rep)

    consts = (
        prob.cam,
        put(obs_cam, True),
        put(obs_pt, True),
        put(np.asarray(obs_uv, np.float64).astype(dtype), True),
        put(np.asarray(obs_w).astype(dtype), True),
        put(np.asarray(prob.plane_n).astype(dtype), False),
        put(np.asarray(prob.plane_d).astype(dtype), False),
    )
    pa = put(pair_a, True)
    pb = put(pair_b, True)
    s_sharding = None
    if mesh is not None and prob.reduced_solver == "cg":
        from jax.sharding import NamedSharding, PartitionSpec as P_

        # row-shard the reduced (6M, 6M) camera system for the CG matvec
        s_sharding = NamedSharding(mesh, P_(shard_axis, None))

    R = put(np.asarray(R0).astype(dtype), False)
    t = put(np.asarray(t0).astype(dtype), False)
    X = put(np.asarray(X0).astype(dtype), False)

    if device_loop and not verbose:
        R_f, t_f, X_f, c0_j, c_f, it_j = _lm_device_loop(
            _pstat(prob), consts, pa, pb, tiers, R, t, X,
            int(max_iters), float(u_init), float(rel_tol),
            s_sharding, mesh is not None,
        )
        return VisualBAResult(
            R=R_f, t=t_f, X=X_f,
            iters=int(it_j), cost0=float(c0_j), cost=float(c_f),
        )

    lin = jax.jit(partial(_linearize, prob, consts))
    step = jax.jit(partial(_solve_cached, prob, consts, pa, pb,
                           s_sharding=s_sharding,
                           pairs_sharded=mesh is not None, tiers=tiers))
    cache = lin(R, t, X)
    c_prev = float(cache.cost)
    c0 = c_prev
    u, v = u_init, 2.0
    it_done = 0
    for it in range(max_iters):
        dc, dX, q1 = step(cache, u)
        dth = dc[:, 0:3]
        dt = dc[:, 3:6]
        R_t = R @ exp_so3(dth)
        t_t = t + dt
        X_t = X + dX
        cache_t = lin(R_t, t_t, X_t)
        c_new = float(cache_t.cost)
        q = c_prev - c_new
        it_done = it + 1
        if q > 0:
            R, t, X, cache = R_t, t_t, X_t, cache_t
            qr = min(q / max(float(q1), 1e-300), 1e3)
            u = u * max(1.0 / 3.0, 1.0 - (2.0 * qr - 1.0) ** 3)
            v = 2.0
            if verbose:
                print(f"[visual LM] it={it} cost {c_prev:.6g} -> {c_new:.6g} u={u:.2e}")
            if abs(q) / max(c_prev, 1e-300) < rel_tol:
                c_prev = c_new
                break
            c_prev = c_new
        else:
            if verbose:
                print(
                    f"[visual LM] it={it} REJECT cost {c_prev:.6g} -> "
                    f"{c_new:.6g} q1={float(q1):.3g} u={u:.2e}"
                )
            u *= v
            v *= 2.0
            if u > 1e12:
                break
    return VisualBAResult(R=R, t=t, X=X, iters=it_done, cost0=c0, cost=c_prev)
