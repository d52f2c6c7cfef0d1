"""Aligned banded groups (slot k == local frame k): the selection-free
group evaluation must match the gather-layout banded path and the dense
assembly exactly."""

import numpy as np
import jax.numpy as jnp
import pytest

from global_lvba_tpu.factors.plane_eigen import (
    AlignedBandedGroups,
    banded_cgh,
    banded_cgh_compact,
    bucket_to_device,
    build_banded_groups,
    plane_cost_grad_hess,
)
from global_lvba_tpu.map.voxelize import build_voxel_map
from global_lvba_tpu.models.synthetic import (
    ate_rmse, make_corridor_scene, perturb_poses,
)
from global_lvba_tpu.solver.lm import lm_damping_iter


def setup(W=48, ppf=800, dtype=jnp.float64):
    scene = make_corridor_scene(num_frames=W, points_per_frame=ppf, seed=4)
    vm = build_voxel_map(
        scene.points_body, scene.frame_ids, scene.R_true, scene.p_true,
        voxel_size=1.0, eigen_ratios=(0.2, 0.2, 0.2, 0.2),
    )
    buckets = [bucket_to_device(b, dtype=dtype) for b in vm.buckets]
    Rp, pp = perturb_poses(scene.R_true, scene.p_true, 0.004, 0.01, seed=1)
    return scene, buckets, jnp.asarray(Rp, dtype), jnp.asarray(pp, dtype), W


class TestAlignedBandedEval:
    def test_banded_cgh_matches_gather_layout(self):
        _, buckets, R, p, W = setup()
        for fa in buckets:
            bg_g = build_banded_groups(fa, W, block=8)
            bg_a = build_banded_groups(fa, W, block=8, aligned=True)
            assert isinstance(bg_a, AlignedBandedGroups)
            r0, g0, Hd0, H0 = banded_cgh(bg_g, R, p, W)
            r1, g1, Hd1, H1 = banded_cgh(bg_a, R, p, W)
            assert np.isclose(float(r0), float(r1), rtol=1e-12)
            np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                                       rtol=1e-9, atol=1e-12)
            np.testing.assert_allclose(np.asarray(Hd1), np.asarray(Hd0),
                                       rtol=1e-9, atol=1e-12)
            np.testing.assert_allclose(np.asarray(H1), np.asarray(H0),
                                       rtol=1e-9, atol=1e-10)

    def test_banded_compact_matches_dense(self):
        _, buckets, R, p, W = setup()
        for fa in buckets:
            bg_a = build_banded_groups(fa, W, block=8, aligned=True)
            r_d, g_d, H_d = plane_cost_grad_hess(fa, R, p, W)
            r_c, g_c, Hd_c, grams, wM = banded_cgh_compact(bg_a, R, p, W)
            assert np.isclose(float(r_c), float(r_d), rtol=1e-12)
            np.testing.assert_allclose(np.asarray(g_c), np.asarray(g_d),
                                       rtol=1e-9, atol=1e-12)
            # reassemble the full H from the compact parts
            H = np.zeros((6 * W, 6 * W))
            offs = np.asarray(bg_a.offset)
            width = bg_a.fa.n.shape[-1]
            for gi, off in enumerate(offs):
                o6 = 6 * int(off)
                H[o6:o6 + 6 * width, o6:o6 + 6 * width] -= np.asarray(
                    grams[gi])
            if wM.shape[0]:
                M2 = np.asarray(wM).transpose(0, 2, 1, 3).reshape(-1, 6 * W)
                H -= M2.T @ M2
            Hd = np.asarray(Hd_c)
            for w in range(W):
                H[6 * w:6 * w + 6, 6 * w:6 * w + 6] += Hd[w]
            np.testing.assert_allclose(
                H, np.asarray(H_d).reshape(6 * W, 6 * W),
                rtol=1e-9, atol=1e-10)


class TestAlignedBandedLM:
    def test_lm_banded_aligned_matches_gather(self, monkeypatch):
        scene, buckets, R, p, W = setup()
        monkeypatch.setenv("LVBA_BANDED_ALIGNED", "0")
        res_g = lm_damping_iter(buckets, R, p, max_iters=6, hessian="banded")
        monkeypatch.setenv("LVBA_BANDED_ALIGNED", "1")
        from global_lvba_tpu.solver.lm import _lm_banded_jitted
        _lm_banded_jitted.clear_cache()
        res_a = lm_damping_iter(buckets, R, p, max_iters=6, hessian="banded")
        np.testing.assert_allclose(np.asarray(res_a.p), np.asarray(res_g.p),
                                   rtol=0, atol=1e-8)
        np.testing.assert_allclose(np.asarray(res_a.R), np.asarray(res_g.R),
                                   rtol=0, atol=1e-8)
        ate_g = ate_rmse(np.asarray(res_g.p, np.float64), scene.p_true)
        ate_a = ate_rmse(np.asarray(res_a.p, np.float64), scene.p_true)
        assert abs(ate_a - ate_g) < 1e-10

    def test_split_lm_banded_aligned(self, monkeypatch):
        from global_lvba_tpu.solver.lm import lm_damping_iter_split

        scene, buckets, R, p, W = setup()
        monkeypatch.setenv("LVBA_BANDED_ALIGNED", "1")
        res = lm_damping_iter_split(buckets, R, p, max_iters=6,
                                    hessian="banded")
        monkeypatch.setenv("LVBA_BANDED_ALIGNED", "0")
        ref = lm_damping_iter_split(buckets, R, p, max_iters=6,
                                    hessian="banded")
        np.testing.assert_allclose(np.asarray(res.p), np.asarray(ref.p),
                                   rtol=0, atol=1e-8)
