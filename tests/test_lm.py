import numpy as np
import jax
import jax.numpy as jnp

from global_lvba_tpu.factors.plane_eigen import bucket_to_device, plane_cost
from global_lvba_tpu.map.voxelize import build_voxel_map
from global_lvba_tpu.models.synthetic import make_plane_scene, perturb_poses, ate_rmse
from global_lvba_tpu.solver.lm import lm_damping_iter


def build(num_frames=8, ppf=2400, seed=0, dtype=jnp.float64):
    scene = make_plane_scene(num_frames=num_frames, points_per_frame=ppf, noise=0.003, seed=seed)
    vm = build_voxel_map(
        scene.points_body, scene.frame_ids, scene.R_true, scene.p_true,
        voxel_size=1.0, eigen_ratios=(0.2, 0.2, 0.2, 0.2),
    )
    buckets = [bucket_to_device(b, dtype=dtype) for b in vm.buckets]
    return scene, buckets


class TestLM:
    def test_recovers_perturbed_poses(self):
        scene, buckets = build()
        Rp, pp = perturb_poses(scene.R_true, scene.p_true, 0.01, 0.03, seed=7)
        res = lm_damping_iter(buckets, jnp.asarray(Rp), jnp.asarray(pp), max_iters=10)
        R_opt = np.asarray(res.R)
        p_opt = np.asarray(res.p)
        # gauge is free: compare after trajectory alignment
        err_before = ate_rmse(pp, scene.p_true)
        err_after = ate_rmse(p_opt, scene.p_true)
        assert err_after < 0.2 * err_before
        assert err_after < 0.01

    def test_cost_decreases(self):
        scene, buckets = build(seed=1)
        Rp, pp = perturb_poses(scene.R_true, scene.p_true, 0.01, 0.03, seed=8)
        c0 = sum(float(plane_cost(fa, jnp.asarray(Rp), jnp.asarray(pp))) for fa in buckets)
        res = lm_damping_iter(buckets, jnp.asarray(Rp), jnp.asarray(pp), max_iters=10)
        c1 = sum(float(plane_cost(fa, res.R, res.p)) for fa in buckets)
        # converged cost must approach the sensor-noise floor (cost at truth)
        c_gt = sum(
            float(plane_cost(fa, jnp.asarray(scene.R_true), jnp.asarray(scene.p_true)))
            for fa in buckets
        )
        assert c1 < c0
        assert c1 < 1.05 * c_gt

    def test_converged_on_ground_truth(self):
        # starting at ground truth: LM must not wander away
        scene, buckets = build(seed=2)
        R0, p0 = jnp.asarray(scene.R_true), jnp.asarray(scene.p_true)
        res = lm_damping_iter(buckets, R0, p0, max_iters=5)
        # gauge is free, so allow small aligned drift at the noise floor
        assert ate_rmse(np.asarray(res.p), scene.p_true) < 8e-3

    def test_jittable(self):
        scene, buckets = build(num_frames=4, ppf=1200, seed=3)
        Rp, pp = perturb_poses(scene.R_true, scene.p_true, 0.005, 0.01, seed=9)

        fn = jax.jit(lambda R, p: lm_damping_iter(buckets, R, p, max_iters=3))
        res = fn(jnp.asarray(Rp), jnp.asarray(pp))
        assert np.all(np.isfinite(np.asarray(res.R)))
        assert int(res.iters) >= 1

    def test_float32(self):
        scene = make_plane_scene(num_frames=6, points_per_frame=2000, noise=0.003, seed=4)
        vm = build_voxel_map(
            scene.points_body, scene.frame_ids, scene.R_true, scene.p_true,
            voxel_size=1.0, eigen_ratios=(0.2, 0.2, 0.2, 0.2),
        )
        buckets32 = [bucket_to_device(b, dtype=jnp.float32) for b in vm.buckets]
        Rp, pp = perturb_poses(scene.R_true, scene.p_true, 0.01, 0.03, seed=10)
        res = lm_damping_iter(
            buckets32, jnp.asarray(Rp, jnp.float32), jnp.asarray(pp, jnp.float32), max_iters=10
        )
        err_after = ate_rmse(np.asarray(res.p, dtype=np.float64), scene.p_true)
        assert err_after < 0.02


class TestCorridor:
    def test_corridor_sparse_coupling_matrix_free(self):
        """Corridor scene (K << W sparse factor coupling): matrix-free LM
        == LU, and BA improves the trajectory."""
        from global_lvba_tpu.models.synthetic import make_corridor_scene

        W = 48
        scene = make_corridor_scene(num_frames=W, points_per_frame=1200,
                                    seed=3)
        vm = build_voxel_map(
            scene.points_body, scene.frame_ids, scene.R_true, scene.p_true,
            voxel_size=1.0, eigen_ratios=(0.2, 0.2, 0.2, 0.2),
        )
        buckets = [
            bucket_to_device(b, dtype=jnp.float64) for b in vm.buckets
        ]
        Rp, pp = perturb_poses(scene.R_true, scene.p_true, 0.004, 0.012,
                               seed=1)
        r_lu = lm_damping_iter(buckets, jnp.asarray(Rp), jnp.asarray(pp),
                               max_iters=10, reduced_solver="lu")
        r_mf = lm_damping_iter(buckets, jnp.asarray(Rp), jnp.asarray(pp),
                               max_iters=10, reduced_solver="cg_mf")
        ate0 = ate_rmse(pp, scene.p_true)
        ate_lu = ate_rmse(np.asarray(r_lu.p), scene.p_true)
        assert ate_lu < 0.6 * ate0, (ate0, ate_lu)
        assert float(jnp.abs(r_lu.p - r_mf.p).max()) < 1e-10

    def test_unconstrained_frame_stays_fixed(self):
        """A frame with NO factor observations (all its points in
        non-planar voxels) must not NaN-poison the damped solve: it has
        exactly-zero Hessian/gradient rows and must simply stay put."""
        scene = make_plane_scene(num_frames=10, points_per_frame=1500, seed=2)
        vm = build_voxel_map(
            scene.points_body, scene.frame_ids, scene.R_true, scene.p_true,
            voxel_size=1.0, eigen_ratios=(0.2, 0.2, 0.2, 0.2),
        )
        # append an extra frame that observes nothing
        W = 11
        R0 = np.concatenate([scene.R_true, np.eye(3)[None]])
        p0 = np.concatenate([scene.p_true, np.array([[50.0, 50.0, 50.0]])])
        Rp, pp = perturb_poses(R0, p0, 0.01, 0.03, seed=3)
        buckets = [bucket_to_device(b, dtype=jnp.float64) for b in vm.buckets]
        for solver in ("lu", "cg", "cg_mf"):
            res = lm_damping_iter(
                buckets, jnp.asarray(Rp), jnp.asarray(pp), max_iters=8,
                reduced_solver=solver,
            )
            assert np.isfinite(np.asarray(res.p)).all(), solver
            ate0 = ate_rmse(pp[:10], scene.p_true)
            ate1 = ate_rmse(np.asarray(res.p)[:10], scene.p_true)
            assert ate1 < 0.5 * ate0, (solver, ate0, ate1)
            # the unconstrained frame must not move
            np.testing.assert_allclose(
                np.asarray(res.p)[10], pp[10], rtol=0, atol=1e-9,
                err_msg=solver,
            )
