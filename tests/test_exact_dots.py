"""Exactness gates for the bf16-split selection scheme (round 4).

On TPU, selection matmuls (pose expansion, g/Hd reduction, M expansion)
run as 3 single-pass bf16 dots over a 3-way mantissa split of the values
(plane_eigen._exact_sel_dot).  The scheme must reproduce the f32 values
EXACTLY — these gates force it on (LVBA_EXACT_DOTS=force) on the CPU
backend and compare against the gather/HIGHEST formulation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from global_lvba_tpu.factors import plane_eigen as pe
from global_lvba_tpu.factors.padding import buckets_to_device
from global_lvba_tpu.map.voxelize import build_voxel_map
from global_lvba_tpu.models.synthetic import make_plane_scene, perturb_poses


@pytest.fixture(scope="module")
def scene_buckets():
    W = 24
    scene = make_plane_scene(num_frames=W, points_per_frame=600, seed=3)
    vm = build_voxel_map(
        scene.points_body, scene.frame_ids, scene.R_true, scene.p_true,
        voxel_size=1.0, eigen_ratios=(0.2, 0.2, 0.2, 0.2),
    )
    buckets = buckets_to_device(vm, dtype=jnp.float32)
    Rp, pp = perturb_poses(scene.R_true, scene.p_true, 0.004, 0.015, seed=1)
    return W, buckets, jnp.asarray(Rp, jnp.float32), jnp.asarray(pp, jnp.float32)


def test_split3_reconstructs_exactly():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=4096).astype(np.float32) * 3.0)
    x0, x1, x2 = pe._split3_bf16(x)
    back = (x0.astype(jnp.float32) + x1.astype(jnp.float32)
            + x2.astype(jnp.float32))
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_pose_channels_exact_selection(scene_buckets, monkeypatch):
    """One-hot MXU pose expansion == the row gather, bit-exact."""
    W, buckets, R, p = scene_buckets
    for fa in buckets:
        monkeypatch.setenv("LVBA_EXACT_DOTS", "force")
        R9f, p3f = pe._pose_channels(fa, R, p)
        monkeypatch.setenv("LVBA_EXACT_DOTS", "0")
        R9g, p3g = pe._pose_channels(fa, R, p)
        for a, b in zip(R9f + p3f, R9g + p3g):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_chunk_eval_exact_vs_highest(scene_buckets, monkeypatch):
    """Full per-chunk eval: exact-split path == HIGHEST one-hot path.

    g/Hd accumulate many entries whose addition order differs between the
    two formulations — allow f32 round-off there; M is pure selection and
    must be exact."""
    W, buckets, R, p = scene_buckets
    for fa in buckets:
        monkeypatch.setenv("LVBA_EXACT_DOTS", "force")
        r1, g1, Hd1, M1 = pe._chunk_eval_soa(fa, R, p, W)
        monkeypatch.setenv("LVBA_EXACT_DOTS", "0")
        r0, g0, Hd0, M0 = pe._chunk_eval_soa(fa, R, p, W)
        np.testing.assert_allclose(float(r1), float(r0), rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(M1), np.asarray(M0))
        sg = max(float(jnp.max(jnp.abs(g0))), 1e-30)
        sh = max(float(jnp.max(jnp.abs(Hd0))), 1e-30)
        np.testing.assert_allclose(np.asarray(g1) / sg, np.asarray(g0) / sg,
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(Hd1) / sh, np.asarray(Hd0) / sh,
                                   atol=1e-6)


def test_lm_solve_exact_dots(scene_buckets, monkeypatch):
    """End-to-end LM under the exact-dot scheme converges identically."""
    from global_lvba_tpu.solver import lm as lm_mod

    W, buckets, R, p = scene_buckets
    monkeypatch.setenv("LVBA_EXACT_DOTS", "0")
    lm_mod._lm_jitted.clear_cache()
    res0 = lm_mod.lm_damping_iter(buckets, R, p, max_iters=4)
    base_R, base_p = np.asarray(res0.R), np.asarray(res0.p)
    monkeypatch.setenv("LVBA_EXACT_DOTS", "force")
    lm_mod._lm_jitted.clear_cache()
    try:
        res1 = lm_mod.lm_damping_iter(buckets, R, p, max_iters=4)
        step = max(float(np.abs(base_p - np.asarray(p)).max()), 1e-30)
        # g/Hd accumulation order differs (packed single dot vs HIGHEST),
        # and 4 damped iterations amplify the f32 round-off ~10x
        assert np.abs(np.asarray(res1.R) - base_R).max() < 5e-4
        assert np.abs(np.asarray(res1.p) - base_p).max() / step < 5e-3
    finally:
        lm_mod._lm_jitted.clear_cache()


def test_selection_kernels_match_xla(scene_buckets, monkeypatch):
    """Pallas selection kernels (interpret mode on CPU) == the XLA
    exact-split dots: pose expansion bit-exact, g/Hd to f32 accumulation
    order."""
    W, buckets, R, p = scene_buckets
    monkeypatch.setenv("LVBA_EXACT_DOTS", "force")
    for fa in buckets:
        monkeypatch.setenv("LVBA_SEL_KERNEL", "force")
        R9k, p3k = pe._pose_channels(fa, R, p)
        rk, gk, Hdk, Mk = pe._chunk_eval_soa(fa, R, p, W)
        monkeypatch.setenv("LVBA_SEL_KERNEL", "0")
        R9x, p3x = pe._pose_channels(fa, R, p)
        rx, gx, Hdx, Mx = pe._chunk_eval_soa(fa, R, p, W)
        for a, b in zip(R9k + p3k, R9x + p3x):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        np.testing.assert_allclose(float(rk), float(rx), rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(Mk), np.asarray(Mx))
        sg = max(float(jnp.max(jnp.abs(gx))), 1e-30)
        np.testing.assert_allclose(np.asarray(gk) / sg, np.asarray(gx) / sg,
                                   atol=1e-6)
        sh = max(float(jnp.max(jnp.abs(Hdx))), 1e-30)
        np.testing.assert_allclose(np.asarray(Hdk) / sh,
                                   np.asarray(Hdx) / sh, atol=1e-6)
