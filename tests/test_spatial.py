"""Morton-range spatial map parallelism + halo exchange (SURVEY §2.3 item 3)."""

import numpy as np
import jax.numpy as jnp
import pytest

from global_lvba_tpu.parallel.mesh import make_mesh
from global_lvba_tpu.parallel.spatial import (
    distributed_voxel_moments,
    host_voxel_moments,
    morton3,
    morton3_device,
    partition_buckets_morton,
    spatial_partition,
)

# slow tier: full-suite runs only (see pyproject [tool.pytest.ini_options])
pytestmark = pytest.mark.slow


class TestMorton:
    def test_roundtrip_locality(self):
        rng = np.random.default_rng(0)
        coords = rng.integers(-500, 500, size=(1000, 3))
        codes = morton3(coords)
        # distinct coords -> distinct codes
        _, counts = np.unique(codes, return_counts=True)
        uniq_coords = np.unique(coords, axis=0).shape[0]
        assert np.unique(codes).shape[0] == uniq_coords
        # device variant agrees
        dev = np.asarray(morton3_device(jnp.asarray(coords, jnp.int32)))
        np.testing.assert_array_equal(dev.astype(np.uint32), codes)

    def test_spatial_partition_contiguity(self):
        rng = np.random.default_rng(1)
        centers = rng.uniform(-50, 50, size=(4096, 3))
        order, shard = spatial_partition(centers, 1.0, 8)
        # each shard's voxels form one contiguous Morton range
        codes = morton3(np.floor(centers).astype(np.int64))
        for s in range(8):
            sel = shard == s
            if not np.any(sel):
                continue
            lo, hi = codes[sel].min(), codes[sel].max()
            others = codes[~sel]
            inside = (others.astype(np.int64) >= lo) & (others.astype(np.int64) <= hi)
            assert not np.any(inside), f"shard {s} range not contiguous"
        # balanced within one voxel
        counts = np.bincount(shard, minlength=8)
        assert counts.max() - counts.min() <= 1


class TestHaloExchange:
    def test_distributed_moments_match_host(self):
        """Points sharded by arrival; per-voxel moments accumulated via the
        ppermute ring must equal the single-process binning exactly."""
        rng = np.random.default_rng(2)
        pts = rng.uniform(-20, 20, size=(20000, 3)).astype(np.float32)
        mesh = make_mesh(8, ("factors",))
        kk, cc, ss, mm = distributed_voxel_moments(
            pts, 1.0, mesh, capacity=4096
        )
        hk, hc, hs, hm = host_voxel_moments(pts.astype(np.float64), 1.0)
        np.testing.assert_array_equal(kk, hk)
        np.testing.assert_array_equal(cc, hc)
        np.testing.assert_allclose(ss, hs, rtol=1e-5, atol=1e-4)
        np.testing.assert_allclose(mm, hm, rtol=1e-4, atol=1e-2)

    def test_capacity_overflow_raises(self):
        """A shard with more unique voxels than `capacity` must raise, not
        silently drop moments (segment_sum discards out-of-range ids)."""
        import pytest

        rng = np.random.default_rng(3)
        pts = rng.uniform(-200, 200, size=(20000, 3)).astype(np.float32)
        mesh = make_mesh(8, ("factors",))
        with pytest.raises(ValueError, match="capacity overflow"):
            distributed_voxel_moments(pts, 1.0, mesh, capacity=64)

    def test_boundary_voxels_merge(self):
        """Construct points of ONE voxel scattered across every device —
        the pure-halo case — and check the owner receives all partials."""
        rng = np.random.default_rng(3)
        # 64 points in a single voxel at the origin + filler elsewhere
        target = rng.uniform(0.1, 0.9, size=(64, 3)).astype(np.float32)
        filler = (rng.uniform(5, 15, size=(960, 3))).astype(np.float32)
        pts = np.concatenate([target, filler])
        # interleave so every device's chunk holds some target points
        perm = rng.permutation(pts.shape[0])
        pts = pts[perm]
        mesh = make_mesh(8, ("factors",))
        kk, cc, ss, mm = distributed_voxel_moments(pts, 1.0, mesh, capacity=1024)
        key0 = morton3(np.zeros((1, 3), np.int64))[0]
        row = np.searchsorted(kk, key0)
        assert kk[row] == key0
        assert cc[row] == 64
        np.testing.assert_allclose(ss[row], target.astype(np.float64).sum(0), rtol=1e-5)


class TestBucketPartition:
    def test_lm_on_morton_partitioned_buckets(self):
        """Morton-reordered factor buckets give the same LM result (the
        factor sum is permutation-invariant; partitioning only changes
        which shard owns which region)."""
        from global_lvba_tpu.factors.padding import buckets_to_device
        from global_lvba_tpu.map.voxelize import build_voxel_map
        from global_lvba_tpu.models.synthetic import make_plane_scene, perturb_poses
        from global_lvba_tpu.solver.lm import lm_damping_iter

        scene = make_plane_scene(num_frames=6, points_per_frame=1500, seed=0)
        vm = build_voxel_map(
            scene.points_body, scene.frame_ids, scene.R_true, scene.p_true,
            voxel_size=1.0, eigen_ratios=(0.2, 0.2, 0.2, 0.2),
        )
        Rp, pp = perturb_poses(scene.R_true, scene.p_true, 0.01, 0.02, seed=1)
        base = lm_damping_iter(
            buckets_to_device(vm, dtype=jnp.float64),
            jnp.asarray(Rp), jnp.asarray(pp), max_iters=5,
        )
        part = partition_buckets_morton(vm, 8)
        from global_lvba_tpu.factors.plane_eigen import bucket_to_device

        dev = [bucket_to_device(b, dtype=jnp.float64) for b in part]
        res = lm_damping_iter(dev, jnp.asarray(Rp), jnp.asarray(pp), max_iters=5)
        np.testing.assert_allclose(
            np.asarray(res.p), np.asarray(base.p), rtol=0, atol=1e-10
        )
