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
import pytest

# slow tier: full-suite runs only (see pyproject [tool.pytest.ini_options])
pytestmark = pytest.mark.slow


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


class TestBandedSharded:
    def test_banded_groups_shard_over_mesh(self):
        # the packed banded group stack shards over the factor axis; the
        # psum'd partials must equal the local banded evaluation exactly
        # (f64), including the replicated straggler contribution
        from global_lvba_tpu.factors.plane_eigen import (
            banded_cgh, build_banded_groups,
        )
        from global_lvba_tpu.models.synthetic import make_corridor_scene
        from global_lvba_tpu.parallel.shard import banded_cgh_sharded

        W = 64
        scene = make_corridor_scene(num_frames=W, points_per_frame=1000,
                                    seed=4)
        vm = build_voxel_map(
            scene.points_body, scene.frame_ids, scene.R_true, scene.p_true,
            voxel_size=1.0, eigen_ratios=(0.2, 0.2, 0.2, 0.2),
        )
        buckets = [bucket_to_device(b, dtype=jnp.float64) for b in vm.buckets]
        Rp, pp = perturb_poses(scene.R_true, scene.p_true, 0.01, 0.02)
        R = jnp.asarray(Rp)
        p = jnp.asarray(pp)
        mesh = make_mesh(8, ("factors",))
        checked = 0
        for fa in buckets:
            for block in (None, 8):   # block=8 forces stragglers
                bg = build_banded_groups(fa, W, block=block)
                if bg.fa.n.shape[0] < 2:
                    continue
                r0, g0, Hd0, H0 = banded_cgh(bg, R, p, W)
                r1, g1, Hd1, H1 = banded_cgh_sharded(bg, R, p, W, mesh)
                np.testing.assert_allclose(float(r0), float(r1), rtol=1e-12)
                np.testing.assert_allclose(np.asarray(g0), np.asarray(g1),
                                           atol=1e-10)
                np.testing.assert_allclose(np.asarray(Hd0), np.asarray(Hd1),
                                           atol=1e-10)
                np.testing.assert_allclose(np.asarray(H0), np.asarray(H1),
                                           atol=1e-10)
                checked += 1
        assert checked, "fixture produced no multi-group banded buckets"

    def test_banded_lm_sharded_matches_local(self):
        # full banded LM with mesh-sharded group stacks == local banded LM
        from global_lvba_tpu.models.synthetic import make_corridor_scene
        from global_lvba_tpu.parallel.shard import (
            lm_damping_iter_banded_sharded,
        )

        W = 64
        scene = make_corridor_scene(num_frames=W, points_per_frame=1000,
                                    seed=4)
        vm = build_voxel_map(
            scene.points_body, scene.frame_ids, scene.R_true, scene.p_true,
            voxel_size=1.0, eigen_ratios=(0.2, 0.2, 0.2, 0.2),
        )
        buckets = [bucket_to_device(b, dtype=jnp.float64) for b in vm.buckets]
        Rp, pp = perturb_poses(scene.R_true, scene.p_true, 0.01, 0.02, seed=2)
        R0 = jnp.asarray(Rp)
        p0 = jnp.asarray(pp)
        mesh = make_mesh(8, ("factors",))
        res_l = lm_damping_iter(buckets, R0, p0, max_iters=6,
                                hessian="banded")
        res_s = lm_damping_iter_banded_sharded(buckets, R0, p0, mesh,
                                               max_iters=6)
        dR = np.abs(np.asarray(res_s.R) - np.asarray(res_l.R)).max()
        dp = np.abs(np.asarray(res_s.p) - np.asarray(res_l.p)).max()
        assert dR < 1e-8 and dp < 1e-8


def _corridor_banded_fixture(W=64, seed=4):
    from global_lvba_tpu.models.synthetic import make_corridor_scene

    scene = make_corridor_scene(num_frames=W, points_per_frame=1000,
                                seed=seed)
    vm = build_voxel_map(
        scene.points_body, scene.frame_ids, scene.R_true, scene.p_true,
        voxel_size=1.0, eigen_ratios=(0.2, 0.2, 0.2, 0.2),
    )
    buckets = [bucket_to_device(b, dtype=jnp.float64) for b in vm.buckets]
    Rp, pp = perturb_poses(scene.R_true, scene.p_true, 0.01, 0.02, seed=2)
    return buckets, jnp.asarray(Rp), jnp.asarray(pp)


class TestBandedCompactSharded:
    def test_pair_vec_solve_matches_unrolled(self):
        # the pair-window vectorized banded CG must equal the unrolled
        # static-slice path on the FULL multi-bucket damped system (what
        # production solves; a single bucket's Hessian is near-singular
        # and its unconverged CG iterates amplify summation-order ulps)
        from global_lvba_tpu.factors.plane_eigen import (
            banded_cgh_compact, build_banded_groups,
        )
        from global_lvba_tpu.solver.dist_solve import (
            _pair_aligned, solve_damped_cg_banded, solve_damped_cg_banded_vec,
        )

        W = 64
        buckets, R, p = _corridor_banded_fixture(W)
        u = jnp.asarray(0.01, jnp.float64)
        Hd = jnp.zeros((W, 6, 6), jnp.float64)
        g = jnp.zeros((W, 6), jnp.float64)
        grams_l, wide_l, offs_l = [], [], []
        for fa in buckets:
            bg = build_banded_groups(fa, W, block=8)
            _, g_, Hd_, grams, wM = banded_cgh_compact(bg, R, p, W)
            Hd, g = Hd + Hd_, g + g_
            offs = tuple(int(o) for o in np.asarray(bg.offset))
            assert _pair_aligned(offs, grams.shape[1] // 6, W)
            grams_l.append(grams)
            wide_l.append(wM)
            offs_l.append(offs)
        dx_v, d_v = solve_damped_cg_banded_vec(
            tuple(grams_l), tuple(wide_l), tuple(offs_l), Hd, g, u)
        # force the unrolled path by handing offsets as lists (the
        # tuple-typed routing in solve_damped_cg_banded picks vec)
        dx_u, d_u = solve_damped_cg_banded(
            tuple(grams_l), tuple(wide_l),
            tuple([int(o) for o in offs] for offs in offs_l), Hd, g, u)
        np.testing.assert_allclose(np.asarray(d_v), np.asarray(d_u),
                                   rtol=1e-12, atol=1e-12)
        np.testing.assert_allclose(np.asarray(dx_v), np.asarray(dx_u),
                                   rtol=1e-6, atol=1e-8)

    def test_compact_lm_fused_matches_banded(self):
        # single-device fused compact LM == dense-H banded LM (identical
        # damped system, CG-vs-CG; both 96-trip block-Jacobi PCG)
        from global_lvba_tpu.factors.plane_eigen import build_banded_groups
        from global_lvba_tpu.solver.lm import _lm_banded_compact_jitted

        W = 64
        buckets, R0, p0 = _corridor_banded_fixture(W)
        groups = tuple(build_banded_groups(fa, W, block=8) for fa in buckets)
        g_size = sum(int(fa.n.shape[0]) for fa in buckets)
        res_c = _lm_banded_compact_jitted(
            groups, R0, p0, 6, 0.01, 2.0, 1e-6, g_size)
        res_l = lm_damping_iter(buckets, R0, p0, max_iters=6,
                                hessian="banded", reduced_solver="cg")
        dR = np.abs(np.asarray(res_c.R) - np.asarray(res_l.R)).max()
        dp = np.abs(np.asarray(res_c.p) - np.asarray(res_l.p)).max()
        assert dR < 1e-8 and dp < 1e-8

    def test_compact_lm_sharded_matches_local(self):
        # THE distributed large-W path: group stacks sharded, Grams kept
        # device-local through the solve, no (6W)² buffer on any device —
        # must equal the local banded-CG LM at f64
        from global_lvba_tpu.parallel.shard import (
            lm_damping_iter_banded_compact_sharded,
        )

        W = 64
        buckets, R0, p0 = _corridor_banded_fixture(W)
        mesh = make_mesh(8, ("factors",))
        res_l = lm_damping_iter(buckets, R0, p0, max_iters=6,
                                hessian="banded", reduced_solver="cg")
        res_s = lm_damping_iter_banded_compact_sharded(
            buckets, R0, p0, mesh, max_iters=6, block=8)
        dR = np.abs(np.asarray(res_s.R) - np.asarray(res_l.R)).max()
        dp = np.abs(np.asarray(res_s.p) - np.asarray(res_l.p)).max()
        assert dR < 1e-8 and dp < 1e-8
