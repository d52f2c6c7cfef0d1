"""Frame-aligned dense factor layout (AlignedPlaneFactorArrays): the
selection-free evaluation must match the bucketed one-hot path exactly
(same math, different layout — the reference semantics are acc_evaluate2,
/root/reference/include/BALM/bavoxel.hpp:68-174)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from global_lvba_tpu.factors.padding import aligned_to_device, buckets_to_device
from global_lvba_tpu.factors.plane_eigen import (
    AlignedPlaneFactorArrays,
    bucket_to_device,
    plane_cost,
    plane_cost_grad_hess,
)
from global_lvba_tpu.map.voxelize import build_voxel_map
from global_lvba_tpu.models.synthetic import ate_rmse, make_plane_scene, perturb_poses
from global_lvba_tpu.solver.lm import lm_damping_iter


def setup(num_frames=8, ppf=1500, dtype=jnp.float64):
    scene = make_plane_scene(num_frames=num_frames, points_per_frame=ppf,
                             seed=0)
    vm = build_voxel_map(
        scene.points_body, scene.frame_ids, scene.R_true, scene.p_true,
        voxel_size=1.0, eigen_ratios=(0.2, 0.2, 0.2, 0.2),
    )
    W = num_frames
    bucketed = [bucket_to_device(b, dtype=dtype) for b in vm.buckets]
    aligned = aligned_to_device(vm.buckets, W, dtype=dtype)
    Rp, pp = perturb_poses(scene.R_true, scene.p_true, 0.004, 0.01, seed=1)
    R = jnp.asarray(Rp, dtype)
    p = jnp.asarray(pp, dtype)
    return scene, vm, bucketed, aligned, R, p, W


class TestAlignedEval:
    def test_cost_matches_bucketed(self):
        _, _, bucketed, aligned, R, p, W = setup()
        c_b = sum(float(plane_cost(fa, R, p)) for fa in bucketed)
        c_a = float(plane_cost(aligned, R, p))
        assert np.isclose(c_a, c_b, rtol=1e-12)

    def test_cgh_matches_bucketed(self):
        _, _, bucketed, aligned, R, p, W = setup()
        r_b = g_b = H_b = 0.0
        for fa in bucketed:
            r_, g_, H_ = plane_cost_grad_hess(fa, R, p, W)
            r_b, g_b, H_b = r_b + r_, g_b + g_, H_b + H_
        r_a, g_a, H_a = plane_cost_grad_hess(aligned, R, p, W)
        assert np.isclose(float(r_a), float(r_b), rtol=1e-12)
        np.testing.assert_allclose(np.asarray(g_a), np.asarray(g_b),
                                   rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(np.asarray(H_a), np.asarray(H_b),
                                   rtol=1e-9, atol=1e-10)

    def test_f32_cgh_close(self):
        _, _, bucketed, aligned, R, p, W = setup(dtype=jnp.float32)
        r_b = g_b = H_b = 0.0
        for fa in bucketed:
            r_, g_, H_ = plane_cost_grad_hess(fa, R, p, W)
            r_b, g_b, H_b = r_b + r_, g_b + g_, H_b + H_
        r_a, g_a, H_a = plane_cost_grad_hess(aligned, R, p, W)
        assert np.isclose(float(r_a), float(r_b), rtol=1e-4)
        sg = np.max(np.abs(np.asarray(g_b))) + 1e-30
        sh = np.max(np.abs(np.asarray(H_b))) + 1e-30
        assert np.max(np.abs(np.asarray(g_a) - np.asarray(g_b))) / sg < 1e-4
        assert np.max(np.abs(np.asarray(H_a) - np.asarray(H_b))) / sh < 1e-4

    def test_width_mismatch_raises(self):
        _, _, _, aligned, R, p, W = setup()
        with pytest.raises(ValueError, match="aligned bucket width"):
            plane_cost_grad_hess(aligned, R, p, W + 1)


class TestAlignedLM:
    def test_lm_converges_to_same_poses(self):
        scene, _, bucketed, aligned, R, p, W = setup()
        res_b = lm_damping_iter(bucketed, R, p, max_iters=8)
        res_a = lm_damping_iter([aligned], R, p, max_iters=8)
        ate_b = ate_rmse(np.asarray(res_b.p, np.float64), scene.p_true)
        ate_a = ate_rmse(np.asarray(res_a.p, np.float64), scene.p_true)
        assert abs(ate_a - ate_b) < 1e-9
        np.testing.assert_allclose(np.asarray(res_a.p), np.asarray(res_b.p),
                                   rtol=0, atol=1e-8)

    def test_cg_mf_rejected(self):
        _, _, _, aligned, R, p, W = setup()
        with pytest.raises(ValueError, match="cg_mf"):
            lm_damping_iter([aligned], R, p, reduced_solver="cg_mf")


class TestDensityGate:
    def test_auto_picks_aligned_when_dense(self, monkeypatch):
        scene = make_plane_scene(num_frames=8, points_per_frame=1500, seed=0)
        vm = build_voxel_map(
            scene.points_body, scene.frame_ids, scene.R_true, scene.p_true,
            voxel_size=1.0, eigen_ratios=(0.2, 0.2, 0.2, 0.2),
        )
        monkeypatch.setenv("LVBA_ALIGNED_MIN_W", "8")
        got = buckets_to_device(vm, dtype=jnp.float64, W=8)
        assert len(got) == 1
        assert isinstance(got[0], AlignedPlaneFactorArrays)
        # no W -> bucketed as before
        got2 = buckets_to_device(vm, dtype=jnp.float64)
        assert all(not isinstance(fa, AlignedPlaneFactorArrays)
                   for fa in got2)
        # explicit opt-out
        got3 = buckets_to_device(vm, dtype=jnp.float64, W=8,
                                 layout="bucketed")
        assert all(not isinstance(fa, AlignedPlaneFactorArrays)
                   for fa in got3)
        # below the min-W gate small windows stay bucketed (the ladder-3
        # regression: per-window host scatters outweigh tiny-solve wins)
        monkeypatch.setenv("LVBA_ALIGNED_MIN_W", "64")
        got4 = buckets_to_device(vm, dtype=jnp.float64, W=8)
        assert all(not isinstance(fa, AlignedPlaneFactorArrays)
                   for fa in got4)

    def test_auto_keeps_bucketed_when_sparse(self, monkeypatch):
        # W far wider than any voxel's observer span: dense cells blow past
        # the ratio gate
        scene = make_plane_scene(num_frames=8, points_per_frame=1500, seed=0)
        vm = build_voxel_map(
            scene.points_body, scene.frame_ids, scene.R_true, scene.p_true,
            voxel_size=1.0, eigen_ratios=(0.2, 0.2, 0.2, 0.2),
        )
        monkeypatch.setenv("LVBA_ALIGNED_RATIO", "0.1")
        got = buckets_to_device(vm, dtype=jnp.float64, W=8)
        assert all(not isinstance(fa, AlignedPlaneFactorArrays)
                   for fa in got)

    def test_frame_property_is_iota(self):
        _, _, _, aligned, _, _, W = setup()
        fr = np.asarray(aligned.frame)
        V = aligned.n.shape[0]
        assert fr.shape == (V, W)
        np.testing.assert_array_equal(fr[0], np.arange(W))
        np.testing.assert_array_equal(fr[-1], np.arange(W))
