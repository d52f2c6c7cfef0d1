"""Parity gates for the fused Pallas SoA evaluation kernel.

The kernel runs the SAME shared math as the XLA path (_soa_agg/_soa_eig/
_soa_chain), so outputs must agree to float round-off exactly; the full
LM under LVBA_SOA_KERNEL=pallas must reproduce the default solve.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from global_lvba_tpu.factors.padding import buckets_to_device
from global_lvba_tpu.factors import plane_eigen as pe
from global_lvba_tpu.map.voxelize import build_voxel_map
from global_lvba_tpu.models.synthetic import make_plane_scene, perturb_poses
from global_lvba_tpu.ops.pallas.soa_fused import (
    soa_fused_channels,
    soa_resid_fused,
)


@pytest.fixture(scope="module")
def scene_buckets():
    W = 24
    scene = make_plane_scene(num_frames=W, points_per_frame=600, seed=3)
    vm = build_voxel_map(
        scene.points_body, scene.frame_ids, scene.R_true, scene.p_true,
        voxel_size=1.0, eigen_ratios=(0.2, 0.2, 0.2, 0.2),
    )
    buckets = buckets_to_device(vm, dtype=jnp.float64)
    Rp, pp = perturb_poses(scene.R_true, scene.p_true, 0.004, 0.015, seed=1)
    return W, buckets, jnp.asarray(Rp), jnp.asarray(pp)


def test_fused_channels_match_soa_core(scene_buckets):
    W, buckets, R, p = scene_buckets
    for fa in buckets:
        resid, jjt6, D36, rows18 = pe._soa_core(fa, R, p, W)
        residv, rowsC, jjtC, d36C = soa_fused_channels(
            fa, R[fa.frame], p[fa.frame], interpret=True
        )
        np.testing.assert_allclose(
            float(jnp.sum(residv)), float(resid), rtol=1e-12
        )
        np.testing.assert_allclose(
            np.moveaxis(np.asarray(rowsC), 0, -1), np.asarray(rows18),
            rtol=1e-8, atol=1e-12,
        )
        np.testing.assert_allclose(
            np.moveaxis(np.asarray(jjtC), 0, -1), np.asarray(jjt6),
            rtol=1e-8, atol=1e-12,
        )
        np.testing.assert_allclose(
            np.moveaxis(np.asarray(d36C), 0, -1), np.asarray(D36),
            rtol=1e-8, atol=1e-12,
        )


def test_fused_resid_matches_plane_cost(scene_buckets):
    W, buckets, R, p = scene_buckets
    for fa in buckets:
        want = float(pe.plane_cost_soa(fa, R, p))
        got = float(jnp.sum(soa_resid_fused(
            fa, R[fa.frame], p[fa.frame], interpret=True
        )))
        np.testing.assert_allclose(got, want, rtol=1e-12)


def test_full_eval_kernel_flag(scene_buckets, monkeypatch):
    """plane_cost_grad_hess under LVBA_SOA_KERNEL=pallas == default path."""
    W, buckets, R, p = scene_buckets
    fa = buckets[0]
    r0, g0, H0 = pe.plane_cost_grad_hess(fa, R, p, W)
    monkeypatch.setenv("LVBA_SOA_KERNEL", "pallas")
    r1, g1, H1 = pe.plane_cost_grad_hess(fa, R, p, W)
    np.testing.assert_allclose(float(r1), float(r0), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                               rtol=1e-10, atol=1e-13)
    np.testing.assert_allclose(np.asarray(H1), np.asarray(H0),
                               rtol=1e-10, atol=1e-12)


def test_full_lm_kernel_flag(scene_buckets, monkeypatch):
    """lm_damping_iter under the kernel flag reproduces the default solve."""
    from global_lvba_tpu.solver import lm as lm_mod

    W, buckets, R, p = scene_buckets
    res0 = lm_mod.lm_damping_iter(buckets, R, p, max_iters=4)
    base_R, base_p = np.asarray(res0.R), np.asarray(res0.p)
    monkeypatch.setenv("LVBA_SOA_KERNEL", "pallas")
    lm_mod._lm_jitted.clear_cache()
    try:
        res1 = lm_mod.lm_damping_iter(buckets, R, p, max_iters=4)
        np.testing.assert_allclose(np.asarray(res1.R), base_R,
                                   rtol=1e-9, atol=1e-11)
        np.testing.assert_allclose(np.asarray(res1.p), base_p,
                                   rtol=1e-9, atol=1e-11)
    finally:
        lm_mod._lm_jitted.clear_cache()
