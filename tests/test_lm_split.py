"""Equality gate: the host-driven split-executable LM == the fused loop.

lm_damping_iter_split exists so W >= 2048 solves compile as three bounded
programs instead of one whole-loop executable the tunnel's remote-compile
service rejects (solver/lm.py).  It must perform the IDENTICAL update
sequence: in f64 the Nielsen scalars round-trip host exactly, so poses
must match to solver round-off.
"""

import jax.numpy as jnp
import numpy as np

from global_lvba_tpu.factors.padding import buckets_to_device
from global_lvba_tpu.map.voxelize import build_voxel_map
from global_lvba_tpu.models.synthetic import (
    make_corridor_scene, make_plane_scene, perturb_poses,
)
from global_lvba_tpu.solver.lm import lm_damping_iter, lm_damping_iter_split


def _setup(scene):
    vm = build_voxel_map(
        scene.points_body, scene.frame_ids, scene.R_true, scene.p_true,
        voxel_size=1.0, eigen_ratios=(0.2, 0.2, 0.2, 0.2),
    )
    buckets = buckets_to_device(vm, dtype=jnp.float64)
    Rp, pp = perturb_poses(scene.R_true, scene.p_true, 0.004, 0.015, seed=1)
    return buckets, jnp.asarray(Rp), jnp.asarray(pp)


def test_split_matches_fused_dense():
    W = 24
    buckets, R, p = _setup(make_plane_scene(num_frames=W,
                                            points_per_frame=600, seed=3))
    res_f = lm_damping_iter(buckets, R, p, max_iters=6)
    res_s = lm_damping_iter_split(buckets, R, p, max_iters=6)
    np.testing.assert_allclose(np.asarray(res_s.R), np.asarray(res_f.R),
                               rtol=1e-8, atol=1e-12)
    np.testing.assert_allclose(np.asarray(res_s.p), np.asarray(res_f.p),
                               rtol=1e-8, atol=1e-12)
    np.testing.assert_allclose(float(res_s.residual), float(res_f.residual),
                               rtol=1e-9)


def test_split_matches_fused_banded_cg():
    """Corridor scene, forced banded Hessian + CG reduced solve — the exact
    configuration of the W >= 2048 bench line, at test scale."""
    W = 96
    buckets, R, p = _setup(make_corridor_scene(num_frames=W,
                                               points_per_frame=400, seed=0))
    res_f = lm_damping_iter(buckets, R, p, max_iters=5, hessian="banded",
                            reduced_solver="cg")
    res_s = lm_damping_iter_split(buckets, R, p, max_iters=5,
                                  hessian="banded", reduced_solver="cg")
    np.testing.assert_allclose(np.asarray(res_s.R), np.asarray(res_f.R),
                               rtol=1e-8, atol=1e-11)
    np.testing.assert_allclose(np.asarray(res_s.p), np.asarray(res_f.p),
                               rtol=1e-8, atol=1e-11)


def test_large_w_auto_routes_to_split(monkeypatch):
    """lm_damping_iter at W >= LVBA_SPLIT_W must route to the split path
    (the fused whole-loop program is rejected by remote-compile services
    at large W) and produce the split result."""
    W = 24
    buckets, R, p = _setup(make_plane_scene(num_frames=W,
                                            points_per_frame=600, seed=3))
    res_direct = lm_damping_iter_split(buckets, R, p, max_iters=4)
    monkeypatch.setenv("LVBA_SPLIT_W", "16")
    res_routed = lm_damping_iter(buckets, R, p, max_iters=4)
    np.testing.assert_allclose(np.asarray(res_routed.p),
                               np.asarray(res_direct.p),
                               rtol=1e-10, atol=1e-13)
