import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from global_lvba_tpu.geometry.camera import CameraModel
from global_lvba_tpu.factors.reprojection import (
    reproj_residuals_batch,
    reproj_jacobians_batch,
    plane_point_batch,
)
from global_lvba_tpu.solver.schur import VisualBAProblem, solve_visual_ba

CAM = CameraModel(
    fx=650.0, fy=648.0, cx=320.0, cy=256.0,
    k1=-0.07, k2=0.12, p1=-0.001, p2=0.0003, width=640, height=512,
)


def make_visual_scene(M=8, P=120, seed=0, planes=True):
    """Cameras on an arc looking at points scattered on a few planes."""
    rng = np.random.default_rng(seed)
    # points on 6 planes with varied normals/offsets so the BA problem is
    # fully constrained once one camera is fixed (3 planes would leave a
    # near-gauge scaling about their common intersection point)
    normals = [
        np.array([0, 0, 1.0]),
        np.array([1.0, 0, 0.2]),
        np.array([0, 1.0, 0.3]),
        np.array([0.5, -0.5, 1.0]),
        np.array([-0.4, 0.8, 0.6]),
        np.array([0.9, 0.4, 0.4]),
    ]
    normals = [n / np.linalg.norm(n) for n in normals]
    offsets = [-5.0, -4.0, -4.5, -5.5, -3.8, -6.0]
    X = []
    pn = []
    pd = []
    for i in range(P):
        k = i % len(normals)
        n, d = normals[k], offsets[k]
        a = np.array([1.0, 0, 0]) if abs(n[0]) < 0.9 else np.array([0, 1.0, 0])
        t1 = np.cross(n, a); t1 /= np.linalg.norm(t1)
        t2 = np.cross(n, t1)
        uv = rng.uniform(-1.2, 1.2, 2)
        X.append(-d * n + uv[0] * t1 + uv[1] * t2)
        pn.append(n)
        pd.append(d)
    X = np.stack(X)
    pn = np.stack(pn)
    pd = np.array(pd)

    # cameras looking roughly at the centroid from z≈0
    R_all, t_all = [], []
    target = X.mean(0)
    for m in range(M):
        C = np.array([2.0 * np.cos(0.3 * m), 2.0 * np.sin(0.3 * m), 0.3 * m - 1.0])
        z = target - C
        z /= np.linalg.norm(z)
        xaxis = np.cross(np.array([0, 0, 1.0]), z)
        if np.linalg.norm(xaxis) < 1e-6:
            xaxis = np.array([1.0, 0, 0])
        xaxis /= np.linalg.norm(xaxis)
        yaxis = np.cross(z, xaxis)
        Rwc = np.stack([xaxis, yaxis, z], axis=1)  # cam axes in world
        Rcw = Rwc.T
        tcw = -Rcw @ C
        R_all.append(Rcw)
        t_all.append(tcw)
    R_all = np.stack(R_all)
    t_all = np.stack(t_all)

    # observations: every camera sees every point (synthetic, all in front)
    obs_cam, obs_pt, obs_uv = [], [], []
    for m in range(M):
        Xc = (R_all[m] @ X.T).T + t_all[m]
        from global_lvba_tpu.geometry.camera import project_cam_to_pixel
        uv, Z, valid = project_cam_to_pixel(CAM, jnp.asarray(Xc))
        uv = np.asarray(uv)
        valid = np.asarray(valid)
        for pi in range(P):
            if valid[pi] and 0 <= uv[pi, 0] < CAM.width and 0 <= uv[pi, 1] < CAM.height:
                obs_cam.append(m)
                obs_pt.append(pi)
                obs_uv.append(uv[pi])
    obs_cam = np.array(obs_cam, np.int32)
    obs_pt = np.array(obs_pt, np.int32)
    obs_uv = np.stack(obs_uv)
    # keep only points observed >= 3 times (the pipeline's obser_thr) so
    # every landmark is fully constrained; remap point indices
    cnt = np.bincount(obs_pt, minlength=P)
    keep = cnt >= 3
    remap = np.full(P, -1, np.int32)
    remap[keep] = np.arange(keep.sum(), dtype=np.int32)
    sel = keep[obs_pt]
    return (
        R_all, t_all, X[keep], pn[keep], pd[keep],
        obs_cam[sel], remap[obs_pt[sel]], obs_uv[sel],
    )


class TestReprojFactor:
    def test_zero_at_ground_truth(self):
        R, t, X, pn, pd, oc, op, uv = make_visual_scene()
        r = reproj_residuals_batch(
            CAM, jnp.asarray(R), jnp.asarray(t), jnp.asarray(X),
            jnp.asarray(oc), jnp.asarray(op), jnp.asarray(uv), 0.5
        )
        assert float(jnp.abs(r).max()) < 1e-6

    def test_jacobian_matches_fd(self):
        R, t, X, pn, pd, oc, op, uv = make_visual_scene(M=3, P=20)
        Rj, tj, Xj = jnp.asarray(R), jnp.asarray(t), jnp.asarray(X)
        ocj, opj, uvj = jnp.asarray(oc), jnp.asarray(op), jnp.asarray(uv)
        r0, Jc, Jp = reproj_jacobians_batch(CAM, Rj, tj, Xj, ocj, opj, uvj, 0.5)
        # perturb the point coordinates: dr ≈ Jp dX
        rng = np.random.default_rng(0)
        dX = rng.normal(scale=1e-6, size=X.shape)
        r1 = reproj_residuals_batch(CAM, Rj, tj, jnp.asarray(X + dX), ocj, opj, uvj, 0.5)
        pred = np.einsum("oab,ob->oa", np.asarray(Jp), dX[op])
        np.testing.assert_allclose(np.asarray(r1 - r0), pred, atol=1e-10)

    def test_behind_camera_zero(self):
        R = jnp.asarray(np.eye(3)[None])
        t = jnp.asarray(np.array([[0.0, 0.0, 0.0]]))
        X = jnp.asarray(np.array([[0.0, 0.0, -5.0]]))
        r, Jc, Jp = reproj_jacobians_batch(
            CAM, R, t, X, jnp.asarray([0]), jnp.asarray([0]),
            jnp.asarray([[100.0, 100.0]]), 0.5
        )
        assert float(jnp.abs(r).max()) == 0.0
        assert float(jnp.abs(Jc).max()) == 0.0

    def test_plane_residual(self):
        n = jnp.asarray([[0.0, 0.0, 1.0]])
        d = jnp.asarray([-5.0])
        X = jnp.asarray([[1.0, 2.0, 5.02]])
        r, J = plane_point_batch(n, d, X, 0.01)
        np.testing.assert_allclose(float(r[0]), 2.0, rtol=1e-6)


class TestVisualBASolver:
    def test_recovers_poses_and_points(self):
        R, t, X, pn, pd, oc, op, uv = make_visual_scene(M=8, P=120, seed=1)
        rng = np.random.default_rng(2)
        # perturb cameras (except the fixed first) and points
        R_init = R.copy()
        t_init = t + rng.normal(scale=0.03, size=t.shape)
        t_init[0] = t[0]
        for m in range(1, R.shape[0]):
            w = rng.normal(scale=0.01, size=3)
            R_init[m] = R[m] @ Rotation.from_rotvec(w).as_matrix()
        X_init = X + rng.normal(scale=0.05, size=X.shape)

        prob = VisualBAProblem(
            cam=CAM, obs_cam=oc, obs_pt=op, obs_uv=uv,
            plane_n=pn, plane_d=pd, num_cams=R.shape[0], num_pts=X.shape[0],
        )
        res = solve_visual_ba(prob, R_init, t_init, X_init, max_iters=50)
        assert res.cost < 1e-6 * res.cost0
        t_err = np.linalg.norm(np.asarray(res.t) - t, axis=1).max()
        X_err = np.linalg.norm(np.asarray(res.X) - X, axis=1).max()
        assert t_err < 1e-4
        assert X_err < 1e-4

    def test_noisy_observations_converge(self):
        R, t, X, pn, pd, oc, op, uv = make_visual_scene(M=6, P=90, seed=3)
        rng = np.random.default_rng(4)
        uv_noisy = uv + rng.normal(scale=0.3, size=uv.shape)
        t_init = t + rng.normal(scale=0.02, size=t.shape)
        t_init[0] = t[0]
        X_init = X + rng.normal(scale=0.03, size=X.shape)
        prob = VisualBAProblem(
            cam=CAM, obs_cam=oc, obs_pt=op, obs_uv=uv_noisy,
            plane_n=pn, plane_d=pd, num_cams=R.shape[0], num_pts=X.shape[0],
        )
        res = solve_visual_ba(prob, R, t_init, X_init, max_iters=50)
        # mean reprojection error should be at the noise level (~0.3 px)
        from global_lvba_tpu.factors.reprojection import reproj_residuals_batch
        r = reproj_residuals_batch(
            CAM, res.R, res.t, res.X,
            jnp.asarray(oc), jnp.asarray(op), jnp.asarray(uv_noisy), 1.0
        )
        errs = np.linalg.norm(np.asarray(r), axis=1)
        assert errs.mean() < 0.6

    def test_fixed_first_camera(self):
        R, t, X, pn, pd, oc, op, uv = make_visual_scene(M=5, P=60, seed=5)
        rng = np.random.default_rng(6)
        t_init = t + rng.normal(scale=0.02, size=t.shape)
        prob = VisualBAProblem(
            cam=CAM, obs_cam=oc, obs_pt=op, obs_uv=uv,
            plane_n=pn, plane_d=pd, num_cams=R.shape[0], num_pts=X.shape[0],
        )
        res = solve_visual_ba(prob, R, t_init, X, max_iters=20)
        np.testing.assert_allclose(np.asarray(res.R)[0], R[0], atol=1e-12)
        np.testing.assert_allclose(np.asarray(res.t)[0], t_init[0], atol=1e-12)


class TestDepthFreeBA:
    def test_reprojection_only_mode(self):
        # BASELINE config (1): depth-free visual BA, reprojection factors only
        R, t, X, pn, pd, oc, op, uv = make_visual_scene(M=6, P=90, seed=21)
        rng = np.random.default_rng(22)
        t_init = t + rng.normal(scale=0.02, size=t.shape)
        t_init[0] = t[0]
        X_init = X + rng.normal(scale=0.03, size=X.shape)
        prob = VisualBAProblem(
            cam=CAM, obs_cam=oc, obs_pt=op, obs_uv=uv,
            plane_n=pn, plane_d=pd, num_cams=R.shape[0], num_pts=X.shape[0],
            use_plane=False,
        )
        res = solve_visual_ba(prob, R, t_init, X_init, max_iters=30)
        assert res.cost < 1e-5 * res.cost0


class TestUnobservedCameras:
    def test_unobserved_camera_stays_fixed_and_solve_progresses(self):
        """Cameras outside every track (zero observations) made the
        reduced system exactly singular -> NaN steps -> the whole solve
        silently no-opped.  They must be pinned (Ceres leaves
        residual-less blocks constant) while the rest optimizes."""
        import dataclasses

        from global_lvba_tpu.solver.schur import VisualBAProblem, solve_visual_ba

        R_all, t_all, X, pn, pd, oc, op, uv = make_visual_scene(M=8, P=120, seed=4)
        M = len(R_all) + 2  # two extra cameras with NO observations
        R0 = np.concatenate([np.stack(R_all), np.stack(R_all)[:2]])
        t0 = np.concatenate([np.stack(t_all), np.stack(t_all)[:2] + 5.0])
        rng = np.random.default_rng(7)
        t_init = t0.copy()
        t_init[1:] += rng.normal(scale=0.02, size=(M - 1, 3))
        X_init = X + rng.normal(scale=0.03, size=X.shape)
        prob = VisualBAProblem(
            cam=CAM, obs_cam=oc, obs_pt=op, obs_uv=uv,
            plane_n=pn, plane_d=pd, num_cams=M, num_pts=X.shape[0],
        )
        for solver in ("lu", "cg", "cg_mf"):
            pr = dataclasses.replace(prob, reduced_solver=solver)
            res = solve_visual_ba(pr, R0, t_init, X_init, max_iters=15)
            assert np.isfinite(res.cost), solver
            assert res.cost < 0.1 * res.cost0, (solver, res.cost0, res.cost)
            # the unobserved cameras must not move
            np.testing.assert_allclose(
                np.asarray(res.t)[-2:], t_init[-2:], rtol=0, atol=1e-8,
                err_msg=solver,
            )
            np.testing.assert_allclose(
                np.asarray(res.R)[-2:], R0[-2:], rtol=0, atol=1e-8,
                err_msg=solver,
            )


def test_point_major_matvec_matches_mf():
    """solve_schur_cg_pm (point-major tiers, selection-dot matvec) must
    solve the same reduced system as solve_schur_cg_mf (per-observation
    gathers) — same dc to solver round-off."""
    import jax.numpy as jnp

    from global_lvba_tpu.solver.dist_solve import (
        solve_schur_cg_mf, solve_schur_cg_pm,
    )
    from global_lvba_tpu.solver.schur import _point_major_tiers

    rng = np.random.default_rng(3)
    M, P, O = 12, 40, 200
    obs_cam = rng.integers(0, M, size=O).astype(np.int32)
    obs_pt = rng.integers(0, P, size=O).astype(np.int32)
    dHcc = rng.normal(size=(M, 6, 6))
    dHcc = dHcc @ np.swapaxes(dHcc, -1, -2) + 8.0 * np.eye(6)
    # Y = W makes S = dHcc - sum couplings symmetric positive definite
    # (CG requires it; random independent Y/W would not be a valid system)
    W = rng.normal(size=(O, 6, 3)) * 0.2
    Y = W.copy()
    b = rng.normal(size=(M, 6))
    b[0] = 0.0
    tiers = _point_major_tiers(obs_cam, obs_pt, P, M)
    args = (jnp.asarray(dHcc), jnp.asarray(W), jnp.asarray(Y))
    dc_mf = np.asarray(solve_schur_cg_mf(
        *args, jnp.asarray(obs_cam), jnp.asarray(obs_pt), jnp.asarray(b), P,
    ))
    dc_pm = np.asarray(solve_schur_cg_pm(*args, tiers, jnp.asarray(b)))
    np.testing.assert_allclose(dc_pm, dc_mf, rtol=1e-6, atol=1e-9)


class TestTierNativeVisual:
    """The tier-native LM loop (schur._lm_device_loop_tiers) must solve
    the same problem as the flat cg_mf path: identical initial cost
    (same linearization point), converged states within float rounding,
    for both plane and no-plane problems."""

    def _scene(self):
        R, t, X, pn, pd, oc, op, uv = make_visual_scene(M=10, P=150, seed=5)
        rng = np.random.default_rng(9)
        t_init = t + rng.normal(scale=0.02, size=t.shape)
        t_init[0] = t[0]
        X_init = X + rng.normal(scale=0.03, size=X.shape)
        prob = VisualBAProblem(
            cam=CAM, obs_cam=oc, obs_pt=op, obs_uv=uv,
            plane_n=pn, plane_d=pd, num_cams=R.shape[0], num_pts=X.shape[0],
            reduced_solver="cg_mf",
        )
        return prob, R, t_init, X_init

    def _run_both(self, prob, R, t_init, X_init, monkeypatch):
        import dataclasses as dc

        monkeypatch.setenv("LVBA_VISUAL_TIER", "0")
        r0 = solve_visual_ba(prob, R, t_init, X_init, max_iters=30)
        monkeypatch.setenv("LVBA_VISUAL_TIER", "1")
        r1 = solve_visual_ba(prob, R, t_init, X_init, max_iters=30)
        return r0, r1

    def test_matches_flat_path(self, monkeypatch):
        prob, R, t_init, X_init = self._scene()
        r0, r1 = self._run_both(prob, R, t_init, X_init, monkeypatch)
        # same cost at the same state (summation order differs per tier)
        np.testing.assert_allclose(r1.cost0, r0.cost0, rtol=1e-12)
        assert r1.cost < 1e-9 * r1.cost0     # converged
        np.testing.assert_allclose(np.asarray(r1.R), np.asarray(r0.R),
                                   atol=5e-5)
        np.testing.assert_allclose(np.asarray(r1.t), np.asarray(r0.t),
                                   atol=5e-4)
        np.testing.assert_allclose(np.asarray(r1.X), np.asarray(r0.X),
                                   atol=5e-4)

    def test_matches_flat_path_no_plane(self, monkeypatch):
        import dataclasses as dc

        prob, R, t_init, X_init = self._scene()
        prob = dc.replace(prob, use_plane=False)
        r0, r1 = self._run_both(prob, R, t_init, X_init, monkeypatch)
        np.testing.assert_allclose(r1.cost0, r0.cost0, rtol=1e-12)
        assert r1.cost < 1e-9 * r1.cost0

    def test_unobserved_camera_pinned_tier(self, monkeypatch):
        """Zero-observation cameras must stay exactly fixed in the
        tier-native route (epsilon pinning, Ceres constant-block
        semantics)."""
        prob, R, t_init, X_init = self._scene()
        M = prob.num_cams + 2
        R2 = np.concatenate([R, R[:2]])
        t2 = np.concatenate([t_init, t_init[:2] + 5.0])
        import dataclasses as dc

        prob2 = dc.replace(prob, num_cams=M)
        monkeypatch.setenv("LVBA_VISUAL_TIER", "1")
        res = solve_visual_ba(prob2, R2, t2, X_init, max_iters=20)
        assert res.cost < 1e-6 * res.cost0
        np.testing.assert_allclose(np.asarray(res.R)[-2:], R2[-2:],
                                   atol=1e-12)
        np.testing.assert_allclose(np.asarray(res.t)[-2:], t2[-2:],
                                   atol=1e-12)


def test_analytic_jacobians_match_jacfwd():
    """The closed-form reprojection Jacobians must equal the forward-mode
    autodiff oracle to f64 rounding, including behind-camera (Z-gated)
    observations whose residual AND Jacobian rows are exactly zero."""
    from scipy.spatial.transform import Rotation

    from global_lvba_tpu.factors.reprojection import (
        _reproj_jacobians_jacfwd, reproj_jacobians_expanded,
    )

    rng = np.random.default_rng(0)
    N = 500
    R = jnp.asarray(Rotation.random(N, random_state=1).as_matrix())
    t = jnp.asarray(rng.normal(size=(N, 3)))
    X = jnp.asarray(rng.normal(scale=3.0, size=(N, 3)))
    uv = jnp.asarray(rng.uniform(0, 500, size=(N, 2)))
    r1, Jc1, Jp1 = reproj_jacobians_expanded(CAM, R, t, X, uv, 0.5)
    r0, Jc0, Jp0 = _reproj_jacobians_jacfwd(CAM, R, t, X, uv, 0.5)
    Z = (jnp.einsum("nij,nj->ni", R, X) + t)[:, 2]
    assert int(jnp.sum(Z <= 1e-8)) > 50  # the gate is actually exercised
    for a, b in ((r0, r1), (Jc0, Jc1), (Jp0, Jp1)):
        d = float(jnp.max(jnp.abs(a - b)))
        scale = float(jnp.max(jnp.abs(a)))
        assert d / scale < 1e-12
