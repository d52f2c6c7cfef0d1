"""Parity gate: the TPU engine vs the reference-faithful CPU f64 oracle.

The north-star accuracy target is "within the Ceres/BALM reference's ATE
bound" (BASELINE.md); with the LVBA-Dataset unreachable, the oracle in
eval/oracle.py (faithful damping_iter semantics incl. is_calc_hess,
finite-difference visual Jacobians) is the stand-in golden reference.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from global_lvba_tpu.eval import oracle as oc
from global_lvba_tpu.eval.baseline_cpu import numpy_plane_cost_grad_hess
from global_lvba_tpu.map.voxelize import build_voxel_map
from global_lvba_tpu.models.synthetic import (
    ate_rmse,
    make_joint_scene,
    make_plane_scene,
    perturb_poses,
)


def _small_problem(W=6, ppf=1500, seed=0):
    scene = make_plane_scene(num_frames=W, points_per_frame=ppf, seed=seed)
    vm = build_voxel_map(
        scene.points_body, scene.frame_ids, scene.R_true, scene.p_true,
        voxel_size=1.0, eigen_ratios=(0.2, 0.2, 0.2, 0.2),
    )
    return scene, vm


def test_vectorized_oracle_matches_loop_restatement():
    """The vectorized f64 factor evaluation must agree with the naive
    per-voxel loop (two independent codings of bavoxel.hpp:68-174)."""
    scene, vm = _small_problem()
    W = scene.R_true.shape[0]
    Rp, pp = perturb_poses(scene.R_true, scene.p_true, 0.01, 0.03, seed=3)
    r_vec = 0.0
    g_vec = np.zeros(W * 6)
    H_vec = np.zeros((W * 6, W * 6))
    r_loop = 0.0
    g_loop = np.zeros(W * 6)
    H_loop = np.zeros((W * 6, W * 6))
    for b in vm.buckets:
        rv, gv, Hv = oc.bucket_cost_grad_hess(b, Rp, pp, W)
        r_vec += rv; g_vec += gv; H_vec += Hv
        rl, gl, Hl = numpy_plane_cost_grad_hess(
            b.n, b.mu, b.Pc, b.frame, Rp, pp, W
        )
        r_loop += rl; g_loop += gl; H_loop += Hl
    assert abs(r_vec - r_loop) < 1e-9 * max(1.0, abs(r_loop))
    np.testing.assert_allclose(g_vec, g_loop, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(H_vec, H_loop, rtol=1e-9, atol=1e-10)


def test_oracle_gradient_matches_finite_differences():
    scene, vm = _small_problem(W=4, ppf=800)
    W = scene.R_true.shape[0]
    Rp, pp = perturb_poses(scene.R_true, scene.p_true, 0.01, 0.02, seed=5)
    _, g, _ = oc.total_cost_grad_hess(vm.buckets, Rp, pp, W)
    eps = 1e-6
    rng = np.random.default_rng(0)
    for _ in range(6):
        f = int(rng.integers(W))
        a = int(rng.integers(6))
        d = np.zeros(6)
        d[a] = eps
        Rp1, pp1 = Rp.copy(), pp.copy()
        Rp2, pp2 = Rp.copy(), pp.copy()
        Rp1[f] = Rp[f] @ oc._exp_so3(d[:3])
        pp1[f] = pp[f] + d[3:]
        Rp2[f] = Rp[f] @ oc._exp_so3(-d[:3])
        pp2[f] = pp[f] - d[3:]
        fd = (
            oc.total_residual(vm.buckets, Rp1, pp1)
            - oc.total_residual(vm.buckets, Rp2, pp2)
        ) / (2 * eps)
        assert abs(g[6 * f + a] - fd) < 1e-4 * max(1.0, abs(fd))


def test_lidar_lm_parity_engine_vs_oracle():
    """Device LM vs faithful oracle damping_iter on the same factors: both
    must recover the ground-truth trajectory to the same accuracy."""
    from global_lvba_tpu.factors.padding import buckets_to_device
    from global_lvba_tpu.solver.lm import lm_damping_iter

    scene, vm = _small_problem(W=8, ppf=2000)
    Rp, pp = perturb_poses(scene.R_true, scene.p_true, 0.01, 0.03, seed=2)

    res_o = oc.oracle_damping_iter(vm.buckets, Rp, pp, max_iters=10)
    buckets = buckets_to_device(vm, dtype=jnp.float64)
    res_d = lm_damping_iter(
        buckets, jnp.asarray(Rp), jnp.asarray(pp), max_iters=10
    )

    ate_init = ate_rmse(pp, scene.p_true)
    ate_o = ate_rmse(res_o.p, scene.p_true)
    ate_d = ate_rmse(np.asarray(res_d.p), scene.p_true)
    # both engines must improve strongly and agree with each other
    assert ate_o < 0.2 * ate_init
    assert ate_d < 0.2 * ate_init
    assert abs(ate_d - ate_o) < 0.05 * ate_init + 1e-6
    # pose-wise agreement of the two optimizers (free gauge: compare ATE of
    # engine trajectory against the oracle trajectory directly)
    assert ate_rmse(np.asarray(res_d.p), res_o.p) < 0.02 * ate_init + 1e-6


def test_full_lidar_pipeline_parity():
    """Window -> anchor -> global pipeline: engine vs oracle end to end."""
    from global_lvba_tpu.config import LvbaConfig
    from global_lvba_tpu.pipeline.lidar_ba import run_lidar_ba

    scene = make_plane_scene(num_frames=24, points_per_frame=3000, seed=7)
    Rp, pp = perturb_poses(scene.R_true, scene.p_true, 0.004, 0.015, seed=8)
    clouds = [
        scene.points_body[scene.frame_ids == i] for i in range(24)
    ]
    cfg = LvbaConfig()
    cfg.window_ba.size = 6
    cfg.window_ba.enable = True
    cfg.window_ba.use_window_ba_rel = True
    cfg.window_ba.anchor_leaf_size = 0.05
    cfg.BALM_stage1.root_voxel_size = 1.0
    cfg.BALM_stage2.root_voxel_size = 1.0
    cfg.solver.dtype = "float64"

    res = run_lidar_ba(clouds, Rp, pp, cfg)
    R_o, p_o = oc.oracle_lidar_pipeline(clouds, Rp, pp, cfg)

    ate_init = ate_rmse(pp, scene.p_true)
    ate_eng = ate_rmse(res.p_opt, scene.p_true)
    ate_orc = ate_rmse(p_o, scene.p_true)
    assert ate_eng < 0.5 * ate_init
    assert ate_orc < 0.5 * ate_init
    # engine (f64) vs oracle trajectory agreement: identical semantics,
    # measured 2e-15 — keep a wide margin for BLAS variation
    assert ate_rmse(res.p_opt, p_o) < 1e-3 * ate_init

    # production precision: f32 engine must stay within the f64 oracle's
    # ATE bound (the north-star accuracy criterion)
    cfg.solver.dtype = "float32"
    res32 = run_lidar_ba(clouds, Rp, pp, cfg)
    ate_32 = ate_rmse(res32.p_opt, scene.p_true)
    assert ate_32 < 1.1 * ate_orc + 1e-4


def test_visual_ba_parity_engine_vs_oracle():
    """Joint visual Schur solve vs dense FD-Jacobian oracle LM."""
    from global_lvba_tpu.pipeline.depth import camera_world_to_cam
    from global_lvba_tpu.solver.schur import VisualBAProblem, solve_visual_ba
    from global_lvba_tpu.eval.metrics import mean_reprojection_error

    js = make_joint_scene(num_frames=6, points_per_frame=1500, seed=0,
                          num_landmarks=120, pair_window=5)
    sc = js.lidar
    # observations from ground truth correspondences
    obs_cam, obs_pt, obs_uv = [], [], []
    lm_ids = sorted({int(l) for lm in js.kp_landmark for l in lm})
    remap = {l: i for i, l in enumerate(lm_ids)}
    for m in range(len(js.keypoints)):
        for k in range(js.keypoints[m].shape[0]):
            obs_cam.append(m)
            obs_pt.append(remap[int(js.kp_landmark[m][k])])
            obs_uv.append(js.keypoints[m][k])
    obs_cam = np.asarray(obs_cam, np.int32)
    obs_pt = np.asarray(obs_pt, np.int32)
    obs_uv = np.stack(obs_uv).astype(np.float64)
    X0 = js.landmarks[lm_ids] + np.random.default_rng(1).normal(
        scale=0.02, size=(len(lm_ids), 3)
    )
    pn = np.zeros((X0.shape[0], 3))
    pd = np.zeros(X0.shape[0])
    for i, l in enumerate(lm_ids):
        k = l % sc.planes_n.shape[0]
        pn[i] = sc.planes_n[k]
        pd[i] = sc.planes_d[k]
    Rcw0, tcw0 = camera_world_to_cam(
        js.Rci, js.tci, sc.R_true[js.image_frame], sc.p_true[js.image_frame]
    )
    # perturb camera poses
    Rcw_p, tcw_p = perturb_poses(Rcw0, tcw0, 0.003, 0.01, seed=4)

    prob = VisualBAProblem(
        cam=js.cam, obs_cam=obs_cam, obs_pt=obs_pt, obs_uv=obs_uv,
        plane_n=pn, plane_d=pd,
        num_cams=Rcw0.shape[0], num_pts=X0.shape[0],
    )
    res = solve_visual_ba(prob, Rcw_p, tcw_p, X0, max_iters=30)
    Ro, to, Xo, _ = oc.oracle_visual_ba(
        js.cam, obs_cam, obs_pt, obs_uv, pn, pd,
        Rcw_p, tcw_p, X0, max_iters=30,
    )

    pre = mean_reprojection_error(
        js.cam, Rcw_p, tcw_p, X0, obs_cam, obs_pt, obs_uv
    )
    post_eng = mean_reprojection_error(
        js.cam, np.asarray(res.R), np.asarray(res.t), np.asarray(res.X),
        obs_cam, obs_pt, obs_uv,
    )
    post_orc = mean_reprojection_error(
        js.cam, Ro, to, Xo, obs_cam, obs_pt, obs_uv
    )
    assert post_eng < 0.6 * pre
    assert post_orc < 0.6 * pre
    # the two optimizers must land on the same optimum (pixel-level parity)
    assert abs(post_eng - post_orc) < 0.05 * pre + 1e-4


def test_corridor_lm_parity_engine_vs_oracle():
    """Same parity gate on the corridor scene (sensor-range-limited
    visibility, sparse factor coupling) — a different observation
    topology from the box room the other gates use."""
    from global_lvba_tpu.factors.padding import buckets_to_device
    from global_lvba_tpu.map.voxelize import build_voxel_map
    from global_lvba_tpu.models.synthetic import make_corridor_scene
    from global_lvba_tpu.solver.lm import lm_damping_iter

    scene = make_corridor_scene(num_frames=24, points_per_frame=1500, seed=7)
    vm = build_voxel_map(
        scene.points_body, scene.frame_ids, scene.R_true, scene.p_true,
        voxel_size=1.0, eigen_ratios=(0.2, 0.2, 0.2, 0.2),
    )
    Rp, pp = perturb_poses(scene.R_true, scene.p_true, 0.006, 0.015, seed=2)

    res_o = oc.oracle_damping_iter(vm.buckets, Rp, pp, max_iters=10)
    buckets = buckets_to_device(vm, dtype=jnp.float64)
    res_d = lm_damping_iter(
        buckets, jnp.asarray(Rp), jnp.asarray(pp), max_iters=10
    )

    ate_init = ate_rmse(pp, scene.p_true)
    ate_o = ate_rmse(res_o.p, scene.p_true)
    ate_d = ate_rmse(np.asarray(res_d.p), scene.p_true)
    assert ate_o < 0.6 * ate_init
    assert ate_d < 0.6 * ate_init
    assert ate_rmse(np.asarray(res_d.p), res_o.p) < 0.02 * ate_init + 1e-6
