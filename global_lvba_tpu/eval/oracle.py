"""Reference-faithful CPU f64 golden oracle of the full solve pipeline.

The LVBA-Dataset is unreachable in this environment, so parity against the
reference engine is established the only defensible way available: an
independent, float64, host-side implementation of the *same* optimization
the reference runs —

  * BALM damped LM with exact damping_iter semantics including the
    `is_calc_hess` skip after rejected steps, the AVG_THR residual
    averaging and the 1e-6 relative-drop break
    (/root/reference/include/BALM/bavoxel.hpp:662-767);
  * the windowed -> anchor -> two-stage-global LiDAR BA flow
    (/root/reference/src/lvba_system.cpp:204-410);
  * the joint visual BA over camera poses + track points with whitened
    distorted reprojection and point-to-plane residuals, first camera
    fixed (/root/reference/src/lvba_system.cpp:1571-1665) — Jacobians by
    central finite differences of the residuals (derivative-free, so the
    oracle shares no Jacobian code with the engine under test).

The per-voxel factor math is vectorized numpy (f64) implementing the
formulas of VOX_HESS::acc_evaluate2 (bavoxel.hpp:68-174) directly; it is
cross-checked in tests against the intentionally naive loop restatement in
`baseline_cpu.numpy_plane_cost_grad_hess` and against finite differences.

tests/test_parity_oracle.py gates the TPU engine against this oracle.
"""

from __future__ import annotations

from typing import List, NamedTuple, Sequence, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# Vectorized f64 plane eigen-factor evaluation (bavoxel.hpp:68-203)
# ---------------------------------------------------------------------------


def _hat_batch(v: np.ndarray) -> np.ndarray:
    """(..., 3) -> (..., 3, 3) skew."""
    out = np.zeros(v.shape[:-1] + (3, 3), dtype=v.dtype)
    out[..., 0, 1] = -v[..., 2]
    out[..., 0, 2] = v[..., 1]
    out[..., 1, 0] = v[..., 2]
    out[..., 1, 2] = -v[..., 0]
    out[..., 2, 0] = -v[..., 1]
    out[..., 2, 1] = v[..., 0]
    return out


def bucket_residual(bucket, R: np.ndarray, p: np.ndarray) -> float:
    """Sum of per-voxel minimum covariance eigenvalues for one bucket
    (evaluate_only_residual, bavoxel.hpp:176-203)."""
    n = np.asarray(bucket.n, np.float64)            # (V, K)
    mu = np.asarray(bucket.mu, np.float64)          # (V, K, 3)
    Pc = np.asarray(bucket.Pc, np.float64)          # (V, K, 3, 3)
    frame = np.asarray(bucket.frame, np.int64)      # (V, K)
    Rf = R[frame]                                   # (V, K, 3, 3)
    pf = p[frame]                                   # (V, K, 3)

    Praw = Pc + n[..., None, None] * (mu[..., :, None] * mu[..., None, :])
    vi = n[..., None] * mu                          # (V, K, 3) body Σx
    Rv = np.einsum("vkij,vkj->vki", Rf, vi)
    v_tot = (Rv + n[..., None] * pf).sum(axis=1)    # (V, 3)
    RPRt = np.einsum("vkij,vkjl,vkml->vkim", Rf, Praw, Rf)
    rp = Rv[..., :, None] * pf[..., None, :]
    P_tot = (
        RPRt + rp + np.swapaxes(rp, -1, -2)
        + n[..., None, None] * (pf[..., :, None] * pf[..., None, :])
    ).sum(axis=1)                                   # (V, 3, 3)
    N = np.maximum(n.sum(axis=1), 1.0)              # (V,)
    vbar = v_tot / N[:, None]
    cov = P_tot / N[:, None, None] - vbar[:, :, None] * vbar[:, None, :]
    lams = np.linalg.eigvalsh(cov)
    return float(lams[:, 0].sum())


def total_residual(buckets: Sequence, R: np.ndarray, p: np.ndarray) -> float:
    return sum(bucket_residual(b, R, p) for b in buckets)


def bucket_cost_grad_hess(bucket, R: np.ndarray, p: np.ndarray, W: int):
    """Vectorized f64 (residual, gradient, Hessian) of one bucket,
    implementing acc_evaluate2 (bavoxel.hpp:68-174) term by term."""
    n = np.asarray(bucket.n, np.float64)
    mu = np.asarray(bucket.mu, np.float64)
    Pc = np.asarray(bucket.Pc, np.float64)
    frame = np.asarray(bucket.frame, np.int64)
    V, K = n.shape
    mask = n > 0                                    # (V, K)

    Rf = R[frame]
    pf = p[frame]
    Praw = Pc + n[..., None, None] * (mu[..., :, None] * mu[..., None, :])
    vi = n[..., None] * mu
    Rv = np.einsum("vkij,vkj->vki", Rf, vi)
    v_tot = (Rv + n[..., None] * pf).sum(axis=1)
    RPRt = np.einsum("vkij,vkjl,vkml->vkim", Rf, Praw, Rf)
    rp = Rv[..., :, None] * pf[..., None, :]
    P_tot = (
        RPRt + rp + np.swapaxes(rp, -1, -2)
        + n[..., None, None] * (pf[..., :, None] * pf[..., None, :])
    ).sum(axis=1)
    N = np.maximum(n.sum(axis=1), 1.0)
    vbar = v_tot / N[:, None]
    cov = P_tot / N[:, None, None] - vbar[:, :, None] * vbar[:, None, :]
    lams, U = np.linalg.eigh(cov)                   # ascending
    uk = U[:, :, 0]                                 # (V, 3) min eigvec
    resid = float(lams[:, 0].sum())

    # umumT = Σ_{i>0} 2/(λ0-λi) u_i u_iᵀ  (bavoxel.hpp:107-110)
    umumT = np.zeros((V, 3, 3))
    for i in (1, 2):
        ui = U[:, :, i]
        denom = lams[:, 0] - lams[:, i]
        denom = np.where(np.abs(denom) < 1e-300, -1e-300, denom)
        umumT += (2.0 / denom)[:, None, None] * (ui[:, :, None] * ui[:, None, :])

    # per-slot quantities (bavoxel.hpp:113-149)
    RiTuk = np.einsum("vkji,vj->vki", Rf, uk)            # Rᵢᵀ u_k
    w = np.cross(vi, RiTuk)                              # (V, K, 3)
    ti_v = pf - vbar[:, None, :]                         # (V, K, 3)
    a = np.einsum("vj,vkj->vk", uk, ti_v)                # u·(p - v̄)
    PiRiTuk = np.einsum("vkij,vkj->vki", Praw, RiTuk)
    combo1 = _hat_batch(PiRiTuk) + _hat_batch(vi) * a[..., None, None]
    combo2 = np.einsum("vkij,vkj->vki", Rf, vi) + n[..., None] * ti_v
    hatR = _hat_batch(RiTuk)
    A = np.zeros((V, K, 3, 6))
    A[..., 0:3] = (
        np.einsum(
            "vkij,vkjl->vkil",
            np.einsum("vkij,vkjl->vkil", Rf, Praw)
            + ti_v[..., :, None] * vi[..., None, :],
            hatR,
        )
        - np.einsum("vkij,vkjl->vkil", Rf, combo1)
    )
    A[..., 3:6] = combo2[..., :, None] * uk[:, None, None, :] + np.einsum(
        "vki,vi->vk", combo2, uk
    )[..., None, None] * np.eye(3)
    A /= N[:, None, None, None]
    A *= mask[..., None, None]

    # gradient rows jᵀ = Aᵀ u (bavoxel.hpp:137)
    jj = np.einsum("vkia,vi->vka", A, uk)                # (V, K, 6)
    jj *= mask[..., None]
    g = np.zeros((W, 6))
    np.add.at(g, frame[mask], jj[mask])

    # diagonal blocks D (bavoxel.hpp:139-149)
    D = np.zeros((V, K, 6, 6))
    D[..., 0:3, 0:3] = (2.0 / N[:, None, None, None]) * np.einsum(
        "vkij,vkjl->vkil",
        combo1 - np.einsum("vkij,vkjl->vkil", hatR, Praw),
        hatR,
    ) - 0.5 * _hat_batch(jj[..., 0:3])
    wu = w[..., :, None] * uk[:, None, None, :]
    D[..., 0:3, 3:6] = (2.0 / N[:, None, None, None]) * wu
    D[..., 3:6, 0:3] = np.swapaxes(D[..., 0:3, 3:6], -1, -2)
    D[..., 3:6, 3:6] = (2.0 * n[..., None, None] / N[:, None, None, None]) * (
        uk[:, None, :, None] * uk[:, None, None, :]
    )
    D *= mask[..., None, None]

    H = np.zeros((W, 6, W, 6))
    # per-slot diagonal blocks (bavoxel.hpp:139-149)
    fm = frame[mask]
    np.add.at(H, (fm, slice(None), fm, slice(None)), D[mask])

    # cross blocks B_kl (bavoxel.hpp:151-167): chunk over voxels to bound
    # the (V, K, K, 6, 6) intermediate
    chunk = max(1, int(2e7 / (K * K * 36)))
    for s in range(0, V, chunk):
        e = min(s + chunk, V)
        Ac, wc, nc = A[s:e], w[s:e], n[s:e]
        ukc, Nc, mc = uk[s:e], N[s:e], mask[s:e]
        umc = umumT[s:e]
        T = np.einsum("vkia,vij->vkaj", Ac, umc)         # (c, K, 6, 3)
        B = np.einsum("vkaj,vljb->vklab", T, Ac)         # (c, K, K, 6, 6)
        inv2 = (2.0 / (Nc * Nc))[:, None, None]
        B[..., 0:3, 0:3] -= inv2[..., None, None] * (
            wc[:, :, None, :, None] * wc[:, None, :, None, :]
        )
        B[..., 0:3, 3:6] -= (inv2 * nc[:, None, :])[..., None, None] * (
            wc[:, :, None, :, None] * ukc[:, None, None, None, :]
        )
        B[..., 3:6, 0:3] -= (inv2 * nc[:, :, None])[..., None, None] * (
            ukc[:, None, None, :, None] * wc[:, None, :, None, :]
        )
        B[..., 3:6, 3:6] -= (inv2 * nc[:, :, None] * nc[:, None, :])[
            ..., None, None
        ] * (ukc[:, None, None, :, None] * ukc[:, None, None, None, :])
        pm = mc[:, :, None] & mc[:, None, :]
        fi = np.broadcast_to(frame[s:e, :, None], pm.shape)[pm]
        fj = np.broadcast_to(frame[s:e, None, :], pm.shape)[pm]
        np.add.at(H, (fi, slice(None), fj, slice(None)), B[pm])
    return resid, g.reshape(W * 6), H.reshape(W * 6, W * 6)


def total_cost_grad_hess(buckets: Sequence, R: np.ndarray, p: np.ndarray, W: int):
    resid = 0.0
    g = np.zeros(W * 6)
    H = np.zeros((W * 6, W * 6))
    for b in buckets:
        r_, g_, H_ = bucket_cost_grad_hess(b, R, p, W)
        resid += r_
        g += g_
        H += H_
    return resid, g, H


# ---------------------------------------------------------------------------
# damping_iter oracle (bavoxel.hpp:662-767), AVG_THR semantics
# ---------------------------------------------------------------------------


def _exp_so3(w: np.ndarray) -> np.ndarray:
    th = np.linalg.norm(w)
    if th < 1e-12:
        K = _hat_batch(w[None])[0]
        return np.eye(3) + K
    k = w / th
    K = _hat_batch(k[None])[0]
    return np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * (K @ K)


class OracleLMResult(NamedTuple):
    R: np.ndarray
    p: np.ndarray
    iters: int
    residual: float


def oracle_damping_iter(
    buckets: Sequence,
    R0: np.ndarray,
    p0: np.ndarray,
    max_iters: int = 10,
    u_init: float = 0.01,
    v_init: float = 2.0,
    rel_tol: float = 1e-6,
) -> OracleLMResult:
    """Faithful damping_iter: Nielsen schedule, is_calc_hess skip after a
    rejected step, AVG_THR averaging of residual and q1, break on relative
    residual drop < 1e-6 evaluated every iteration."""
    R = np.asarray(R0, np.float64).copy()
    p = np.asarray(p0, np.float64).copy()
    W = R.shape[0]
    g_size = sum(int(b.n.shape[0]) for b in buckets)
    g_size = max(g_size, 1)
    u, v = u_init, v_init
    is_calc_hess = True
    residual1 = np.inf
    g = np.zeros(W * 6)
    H = np.zeros((W * 6, W * 6))
    it = 0
    for i in range(max_iters):
        it = i + 1
        if is_calc_hess:
            residual1, g, H = total_cost_grad_hess(buckets, R, p, W)
            residual1 /= g_size                      # AVG_THR (bavoxel.hpp:634)
        D = np.diag(np.diag(H))
        dx = np.linalg.solve(H + u * D, -g)
        R_t = R.copy()
        p_t = p.copy()
        for j in range(W):
            R_t[j] = R[j] @ _exp_so3(dx[6 * j : 6 * j + 3])
            p_t[j] = p[j] + dx[6 * j + 3 : 6 * j + 6]
        q1 = 0.5 * dx.dot(u * np.diag(H) * dx - g) / g_size
        residual2 = total_residual(buckets, R_t, p_t) / g_size
        q = residual1 - residual2
        if q > 0:
            R, p = R_t, p_t
            qr = q / q1 if q1 != 0 else 1.0
            v = 2.0
            qq = 1 - (2 * qr - 1) ** 3
            u *= max(1.0 / 3.0, qq)
            is_calc_hess = True
        else:
            u *= v
            v *= 2.0
            is_calc_hess = False
        if abs(residual1 - residual2) / max(abs(residual1), 1e-300) < rel_tol:
            break
    return OracleLMResult(R=R, p=p, iters=it, residual=residual1)


# ---------------------------------------------------------------------------
# Full LiDAR BA pipeline oracle (lvba_system.cpp:204-410)
# ---------------------------------------------------------------------------


def oracle_lidar_pipeline(
    clouds: Sequence[np.ndarray],
    R_full: np.ndarray,
    p_full: np.ndarray,
    cfg,
):
    """Window BA -> anchor merge -> two-stage global BA -> composition,
    solved entirely by the f64 oracle LM.  Voxelization uses the shared
    (host, f64) map builder — the factor *sets* must match for the solves
    to be comparable; what this oracle independently re-derives is every
    per-iteration quantity of the optimization itself."""
    from ..map.voxelize import build_voxel_map
    from ..pipeline.downsample import downsample_nearest_center

    F = len(clouds)
    window = cfg.window_ba.size
    anchor_R: List[np.ndarray] = []
    anchor_p: List[np.ndarray] = []
    anchor_clouds: List[np.ndarray] = []
    anchor_index = np.full(F, -1, dtype=np.int64)
    rel_R = np.tile(np.eye(3), (F, 1, 1))
    rel_p = np.zeros((F, 3))

    def solve(pts, fids, R, p, size, ratios, min_voxels=0):
        vm = build_voxel_map(
            pts, fids, R, p, size, eigen_ratios=ratios,
            min_ps=cfg.solver.min_ps, layer_limit=cfg.solver.layer_limit,
        )
        if vm.num_planes < min_voxels or vm.num_planes == 0:
            return None, None
        res = oracle_damping_iter(
            vm.buckets, R, p, max_iters=cfg.solver.lidar_max_iters
        )
        return res.R, res.p

    for start in range(0, F, window):
        end = min(start + window, F)
        win = end - start
        pts = np.concatenate([clouds[j] for j in range(start, end)])
        fids = np.concatenate(
            [np.full(clouds[j].shape[0], j - start, dtype=np.int32)
             for j in range(start, end)]
        )
        R_odom = R_full[start:end].copy()
        p_odom = p_full[start:end].copy()
        R_sol, p_sol = solve(
            pts, fids, R_odom, p_odom,
            cfg.BALM_stage1.root_voxel_size, cfg.window_ba.eigen_ratio_array,
            min_voxels=cfg.solver.min_window_factor_ratio * win,
        )
        if R_sol is None:
            continue
        if cfg.window_ba.use_window_ba_rel:
            R_align = R_odom[0] @ R_sol[0].T
            p_align = p_odom[0] - R_align @ p_sol[0]
            R_aligned = np.einsum("ij,fjk->fik", R_align, R_sol)
            p_aligned = np.einsum("ij,fj->fi", R_align, p_sol) + p_align
        else:
            R_aligned, p_aligned = R_odom, p_odom
        aRw, apw = R_odom[0], p_odom[0]
        aidx = len(anchor_R)
        merged = []
        for j in range(win):
            Rr = aRw.T @ R_aligned[j]
            pr = aRw.T @ (p_aligned[j] - apw)
            merged.append((Rr @ clouds[start + j].T).T + pr)
            rel_R[start + j] = Rr
            rel_p[start + j] = pr
            anchor_index[start + j] = aidx
        merged = np.concatenate(merged).astype(np.float32)
        merged = downsample_nearest_center(merged, cfg.window_ba.anchor_leaf_size)
        anchor_R.append(aRw)
        anchor_p.append(apw)
        anchor_clouds.append(merged)

    aR = np.stack(anchor_R) if anchor_R else np.zeros((0, 3, 3))
    ap = np.stack(anchor_p) if anchor_p else np.zeros((0, 3))
    A = aR.shape[0]
    if A >= 2:
        stages = []
        if cfg.BALM_stage1.enable:
            stages.append(cfg.BALM_stage1)
        stages.append(cfg.BALM_stage2)
        pts = np.concatenate(anchor_clouds)
        fids = np.concatenate(
            [np.full(c.shape[0], j, dtype=np.int32)
             for j, c in enumerate(anchor_clouds)]
        )
        for st in stages:
            R_sol, p_sol = solve(
                pts, fids, aR, ap, st.root_voxel_size, st.eigen_ratio_array
            )
            if R_sol is not None:
                aR, ap = R_sol, p_sol

    R_opt = R_full.copy()
    p_opt = p_full.copy()
    for i in range(F):
        aidx = anchor_index[i]
        if aidx < 0 or aidx >= A:
            continue
        R_opt[i] = aR[aidx] @ rel_R[i]
        p_opt[i] = aR[aidx] @ rel_p[i] + ap[aidx]
    return R_opt, p_opt


# ---------------------------------------------------------------------------
# Joint visual BA oracle (lvba_system.cpp:1571-1665)
# ---------------------------------------------------------------------------


def _np_project(cam, Rcw, tcw, X):
    """numpy Brown-Conrady projection (utils.hpp:61-111 math)."""
    Xc = np.einsum("oij,oj->oi", Rcw, X) + tcw
    Z = Xc[:, 2]
    ok = Z > 1e-8
    z = np.where(ok, Z, 1.0)
    x = Xc[:, 0] / z
    y = Xc[:, 1] / z
    r2 = x * x + y * y
    radial = 1.0 + cam.k1 * r2 + cam.k2 * r2 * r2
    xd = x * radial + 2 * cam.p1 * x * y + cam.p2 * (r2 + 2 * x * x)
    yd = y * radial + cam.p1 * (r2 + 2 * y * y) + 2 * cam.p2 * x * y
    u = cam.fx * xd + cam.cx
    v = cam.fy * yd + cam.cy
    return np.stack([u, v], axis=-1), ok


def _visual_residuals(cam, Rcw, tcw, X, obs_cam, obs_pt, obs_uv,
                      plane_n, plane_d, sigma_px, sigma_plane):
    uv, ok = _np_project(cam, Rcw[obs_cam], tcw[obs_cam], X[obs_pt])
    r = (uv - obs_uv) / sigma_px
    r = np.where(ok[:, None], r, 0.0)
    rp = (np.einsum("pi,pi->p", plane_n, X) + plane_d) / sigma_plane
    return np.concatenate([r.reshape(-1), rp])


def oracle_visual_ba(
    cam,
    obs_cam: np.ndarray,
    obs_pt: np.ndarray,
    obs_uv: np.ndarray,
    plane_n: np.ndarray,
    plane_d: np.ndarray,
    Rcw0: np.ndarray,
    tcw0: np.ndarray,
    X0: np.ndarray,
    sigma_px: float = 0.5,
    sigma_plane: float = 0.01,
    max_iters: int = 50,
    fix_first: bool = True,
):
    """Dense f64 LM over (camera poses, points) with finite-difference
    Jacobians.  Parameterization matches the engine (right-multiplicative
    so3 tangent for rotations); the Jacobian is built column-by-column by
    central differences over the sparse per-observation structure."""
    M = Rcw0.shape[0]
    P = X0.shape[0]
    Rcw = np.asarray(Rcw0, np.float64).copy()
    tcw = np.asarray(tcw0, np.float64).copy()
    X = np.asarray(X0, np.float64).copy()
    O = obs_cam.shape[0]

    def resid(Rc, tc, Xp):
        return _visual_residuals(
            cam, Rc, tc, Xp, obs_cam, obs_pt, obs_uv,
            plane_n, plane_d, sigma_px, sigma_plane,
        )

    def cost(Rc, tc, Xp):
        r = resid(Rc, tc, Xp)
        return 0.5 * float(r @ r)

    nvar = 6 * M + 3 * P
    eps = 1e-6
    lam = 1e-3
    c_prev = cost(Rcw, tcw, X)
    for it in range(max_iters):
        # finite-difference Jacobian (dense; oracle-scale problems only)
        J = np.zeros((2 * O + P, nvar))
        r0 = resid(Rcw, tcw, X)
        for m in range(M):
            for a in range(3):
                d = np.zeros(3)
                d[a] = eps
                Rp = Rcw.copy(); Rp[m] = Rcw[m] @ _exp_so3(d)
                Rm = Rcw.copy(); Rm[m] = Rcw[m] @ _exp_so3(-d)
                J[:, 6 * m + a] = (resid(Rp, tcw, X) - resid(Rm, tcw, X)) / (2 * eps)
            for a in range(3):
                tp = tcw.copy(); tp[m, a] += eps
                tm = tcw.copy(); tm[m, a] -= eps
                J[:, 6 * m + 3 + a] = (resid(Rcw, tp, X) - resid(Rcw, tm, X)) / (2 * eps)
        for q in range(P):
            for a in range(3):
                Xp = X.copy(); Xp[q, a] += eps
                Xm = X.copy(); Xm[q, a] -= eps
                J[:, 6 * M + 3 * q + a] = (resid(Rcw, tcw, Xp) - resid(Rcw, tcw, Xm)) / (2 * eps)
        if fix_first:
            J[:, 0:6] = 0.0
        H = J.T @ J
        g = J.T @ r0
        if fix_first:
            g[0:6] = 0.0
        accepted = False
        c_new = c_prev
        for _try in range(8):
            A = H + lam * np.diag(np.maximum(np.diag(H), 1e-12))
            if fix_first:
                A[0:6, :] = 0.0
                A[:, 0:6] = 0.0
                A[0:6, 0:6] = np.eye(6)
            dx = np.linalg.solve(A, -g)
            Rt = Rcw.copy()
            tt = tcw.copy()
            for m in range(M):
                Rt[m] = Rcw[m] @ _exp_so3(dx[6 * m : 6 * m + 3])
                tt[m] = tcw[m] + dx[6 * m + 3 : 6 * m + 6]
            Xt = X + dx[6 * M :].reshape(P, 3)
            c_new = cost(Rt, tt, Xt)
            if c_new < c_prev:
                Rcw, tcw, X = Rt, tt, Xt
                lam = max(lam / 3.0, 1e-12)
                accepted = True
                break
            lam *= 10.0
        if not accepted:
            break
        rel_drop = abs(c_prev - c_new) / max(c_prev, 1e-300)
        c_prev = c_new
        if rel_drop < 1e-10 and it > 2:
            break
    return Rcw, tcw, X, c_prev
