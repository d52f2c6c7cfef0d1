"""Deterministic-reduction tests — the functional analogue of race
detection (SURVEY.md §5): repeated evaluations must be bit-identical, and
the CLI surface must stay parseable."""

import json
import subprocess
import sys

import numpy as np
import jax.numpy as jnp

from global_lvba_tpu.factors.plane_eigen import bucket_to_device, plane_cost_grad_hess
from global_lvba_tpu.map.voxelize import build_voxel_map
from global_lvba_tpu.models.synthetic import make_plane_scene, perturb_poses


class TestDeterminism:
    def test_hessian_bitwise_repeatable(self):
        scene = make_plane_scene(num_frames=5, points_per_frame=1500, seed=0)
        vm = build_voxel_map(
            scene.points_body, scene.frame_ids, scene.R_true, scene.p_true,
            1.0, (0.2,) * 4,
        )
        fa = bucket_to_device(vm.buckets[0], dtype=jnp.float32)
        Rp, pp = perturb_poses(scene.R_true, scene.p_true, 0.01, 0.02)
        R = jnp.asarray(Rp, jnp.float32)
        p = jnp.asarray(pp, jnp.float32)
        r1, g1, H1 = plane_cost_grad_hess(fa, R, p, 5)
        r2, g2, H2 = plane_cost_grad_hess(fa, R, p, 5)
        assert float(r1) == float(r2)
        np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))
        np.testing.assert_array_equal(np.asarray(H1), np.asarray(H2))

    def test_voxel_map_repeatable(self):
        scene = make_plane_scene(num_frames=4, points_per_frame=1500, seed=1)
        vm1 = build_voxel_map(
            scene.points_body, scene.frame_ids, scene.R_true, scene.p_true,
            1.0, (0.2,) * 4,
        )
        vm2 = build_voxel_map(
            scene.points_body, scene.frame_ids, scene.R_true, scene.p_true,
            1.0, (0.2,) * 4,
        )
        assert vm1.num_planes == vm2.num_planes
        for b1, b2 in zip(vm1.buckets, vm2.buckets):
            np.testing.assert_array_equal(b1.n, b2.n)
            np.testing.assert_array_equal(b1.frame, b2.frame)


class TestCLI:
    def test_info_parses_reference_config(self):
        out = subprocess.run(
            [sys.executable, "-m", "global_lvba_tpu", "info",
             "--config", "configs/example.yaml"],
            capture_output=True, text=True, timeout=120,
            env={**__import__("os").environ, "JAX_PLATFORMS": "cpu"},
        )
        assert out.returncode == 0
        cfg = json.loads(out.stdout)
        assert cfg["window_ba"]["size"] == 20
        assert cfg["BALM_stage2"]["root_voxel_size"] == 0.5
