import numpy as np
import jax
import jax.numpy as jnp

from global_lvba_tpu.factors.plane_eigen import bucket_to_device, plane_cost_grad_hess
from global_lvba_tpu.map.voxelize import build_voxel_map
from global_lvba_tpu.models.synthetic import make_plane_scene, perturb_poses, ate_rmse
from global_lvba_tpu.parallel.mesh import make_mesh
from global_lvba_tpu.parallel.shard import (
    shard_buckets,
    sharded_cost_grad_hess,
    lm_damping_iter_sharded,
)
from global_lvba_tpu.solver.lm import lm_damping_iter


def build(num_frames=6, ppf=2000, seed=0):
    scene = make_plane_scene(num_frames=num_frames, points_per_frame=ppf, noise=0.003, seed=seed)
    vm = build_voxel_map(
        scene.points_body, scene.frame_ids, scene.R_true, scene.p_true,
        voxel_size=1.0, eigen_ratios=(0.2, 0.2, 0.2, 0.2),
    )
    buckets = [bucket_to_device(b, dtype=jnp.float64) for b in vm.buckets]
    return scene, buckets


class TestSharding:
    def test_eight_virtual_devices(self):
        assert len(jax.devices()) >= 8

    def test_shard_map_matches_single_device(self):
        scene, buckets = build()
        W = scene.R_true.shape[0]
        R = jnp.asarray(scene.R_true)
        p = jnp.asarray(scene.p_true)
        mesh = make_mesh(8, ("factors",))
        fa = buckets[0]
        r1, g1, H1 = plane_cost_grad_hess(fa, R, p, W)
        r2, g2, H2 = sharded_cost_grad_hess(fa, R, p, W, mesh)
        np.testing.assert_allclose(float(r1), float(r2), rtol=1e-9)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-10, atol=1e-12)
        np.testing.assert_allclose(np.asarray(H1), np.asarray(H2), rtol=1e-10, atol=1e-12)

    def test_gspmd_lm_matches_local(self):
        scene, buckets = build(seed=1)
        Rp, pp = perturb_poses(scene.R_true, scene.p_true, 0.01, 0.03, seed=3)
        R0 = jnp.asarray(Rp)
        p0 = jnp.asarray(pp)
        mesh = make_mesh(8, ("factors",))
        res_local = lm_damping_iter(buckets, R0, p0, max_iters=6)
        res_shard = lm_damping_iter_sharded(buckets, R0, p0, mesh, max_iters=6)
        # same optimization outcome (padding rows don't change the math)
        err = ate_rmse(np.asarray(res_shard.p), np.asarray(res_local.p))
        assert err < 1e-6


class TestVisualBASharded:
    def test_sharded_matches_local(self):
        import sys
        sys.path.insert(0, "tests")
        from test_visual_ba import make_visual_scene, CAM
        from global_lvba_tpu.solver.schur import VisualBAProblem, solve_visual_ba

        R, t, X, pn, pd, oc, op, uv = make_visual_scene(M=6, P=90, seed=11)
        rng = np.random.default_rng(12)
        t_init = t + rng.normal(scale=0.02, size=t.shape)
        t_init[0] = t[0]
        X_init = X + rng.normal(scale=0.03, size=X.shape)
        prob = VisualBAProblem(
            cam=CAM, obs_cam=oc, obs_pt=op, obs_uv=uv,
            plane_n=pn, plane_d=pd, num_cams=R.shape[0], num_pts=X.shape[0],
        )
        mesh = make_mesh(8, ("factors",))
        res_l = solve_visual_ba(prob, R, t_init, X_init, max_iters=15)
        res_s = solve_visual_ba(prob, R, t_init, X_init, max_iters=15, mesh=mesh)
        np.testing.assert_allclose(
            np.asarray(res_s.t), np.asarray(res_l.t), atol=1e-8
        )
        np.testing.assert_allclose(
            np.asarray(res_s.X), np.asarray(res_l.X), atol=1e-7
        )
        # matrix-free reduced solve under GSPMD observation sharding:
        # its segment-sums/gathers must psum to the same solution
        import dataclasses

        prob_mf = dataclasses.replace(prob, reduced_solver="cg_mf")
        res_m = solve_visual_ba(prob_mf, R, t_init, X_init, max_iters=15,
                                mesh=mesh)
        np.testing.assert_allclose(
            np.asarray(res_m.t), np.asarray(res_l.t), atol=1e-8
        )
        np.testing.assert_allclose(
            np.asarray(res_m.X), np.asarray(res_l.X), atol=1e-7
        )


class Test2DMesh:
    def test_factors_frames_mesh(self):
        scene, buckets = build(seed=5)
        Rp, pp = perturb_poses(scene.R_true, scene.p_true, 0.01, 0.03, seed=6)
        R0 = jnp.asarray(Rp)
        p0 = jnp.asarray(pp)
        mesh2 = make_mesh(8, ("factors", "frames"), shape=(4, 2))
        res2 = lm_damping_iter_sharded(buckets, R0, p0, mesh2, max_iters=6)
        res1 = lm_damping_iter(buckets, R0, p0, max_iters=6)
        err = ate_rmse(np.asarray(res2.p), np.asarray(res1.p))
        assert err < 1e-6
