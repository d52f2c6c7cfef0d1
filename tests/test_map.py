import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from global_lvba_tpu.map.moments import transform_moments, cov_from_moments, merge_moments
from global_lvba_tpu.map.voxelize import build_voxel_map, pack_voxel_keys, voxel_coords
from global_lvba_tpu.models.synthetic import make_plane_scene


def naive_moments(pts):
    n = pts.shape[0]
    v = pts.sum(0)
    P = pts.T @ pts
    return P, v, n


class TestMoments:
    def test_transform_matches_pointwise(self):
        # moment transform == transforming raw points (tools.hpp:450-456)
        rng = np.random.default_rng(0)
        pts = rng.normal(size=(50, 3))
        P, v, n = naive_moments(pts)
        R = Rotation.random(1, random_state=1).as_matrix()[0]
        p = rng.normal(size=3)
        Pt, vt = transform_moments(
            jnp.asarray(P), jnp.asarray(v), jnp.asarray(float(n)), jnp.asarray(R), jnp.asarray(p)
        )
        pts_t = (R @ pts.T).T + p
        P_ref, v_ref, _ = naive_moments(pts_t)
        np.testing.assert_allclose(np.asarray(Pt), P_ref, atol=1e-9)
        np.testing.assert_allclose(np.asarray(vt), v_ref, atol=1e-9)

    def test_cov(self):
        rng = np.random.default_rng(1)
        pts = rng.normal(size=(100, 3))
        P, v, n = naive_moments(pts)
        cov = cov_from_moments(jnp.asarray(P), jnp.asarray(v), jnp.asarray(float(n)))
        np.testing.assert_allclose(np.asarray(cov), np.cov(pts.T, bias=True), atol=1e-10)

    def test_merge_centered(self):
        rng = np.random.default_rng(2)
        groups = [rng.normal(loc=rng.normal(size=3), size=(k, 3)) for k in (10, 20, 5)]
        K = len(groups)
        n = np.array([g.shape[0] for g in groups], dtype=np.float64)
        mu = np.stack([g.mean(0) for g in groups])
        Pc = np.stack([((g - g.mean(0)).T @ (g - g.mean(0))) for g in groups])
        N, m, S = merge_moments(jnp.asarray(Pc)[None], jnp.asarray(mu)[None], jnp.asarray(n)[None])
        allpts = np.concatenate(groups)
        np.testing.assert_allclose(float(N[0]), allpts.shape[0])
        np.testing.assert_allclose(np.asarray(m)[0], allpts.mean(0), atol=1e-10)
        S_ref = (allpts - allpts.mean(0)).T @ (allpts - allpts.mean(0))
        np.testing.assert_allclose(np.asarray(S)[0], S_ref, atol=1e-9)


class TestVoxelize:
    def test_pack_unique(self):
        rng = np.random.default_rng(0)
        c = rng.integers(-1000, 1000, size=(1000, 3))
        keys = pack_voxel_keys(c)
        uniq_c = np.unique(c, axis=0).shape[0]
        assert np.unique(keys).shape[0] == uniq_c

    def test_plane_scene_builds_planes(self):
        scene = make_plane_scene(num_frames=6, points_per_frame=3000, seed=0)
        vm = build_voxel_map(
            scene.points_body,
            scene.frame_ids,
            scene.R_true,
            scene.p_true,
            voxel_size=1.0,
            eigen_ratios=(0.2, 0.2, 0.2, 0.2),
        )
        assert vm.num_planes > 20
        assert len(vm.buckets) >= 1
        # every bucket entry's frame counts are consistent
        total_pts = 0
        for b in vm.buckets:
            assert np.all(b.n >= 0)
            occ = (b.n > 0).sum(axis=1)
            assert np.all(occ >= 2)  # push_voxel needs >= 2 observing frames
            total_pts += b.n.sum()
        assert total_pts > 0.5 * scene.points_body.shape[0]

    def test_normals_match_scene_planes(self):
        scene = make_plane_scene(num_frames=6, points_per_frame=3000, noise=0.002, seed=1)
        vm = build_voxel_map(
            scene.points_body, scene.frame_ids, scene.R_true, scene.p_true,
            voxel_size=1.0, eigen_ratios=(0.1, 0.1, 0.1, 0.1),
        )
        # each emitted plane normal should align with one of the scene planes
        normals = vm.lookup.normals
        assert normals.shape[0] == vm.lookup.centers.shape[0]
        dots = np.abs(normals @ scene.planes_n.T).max(axis=1)
        assert np.quantile(dots, 0.2) > 0.99

    def test_lookup_query(self):
        scene = make_plane_scene(num_frames=6, points_per_frame=3000, seed=2)
        vm = build_voxel_map(
            scene.points_body, scene.frame_ids, scene.R_true, scene.p_true,
            voxel_size=1.0, eigen_ratios=(0.2, 0.2, 0.2, 0.2),
        )
        # querying the emitted plane centroids must return a plane
        idx = vm.lookup.query(vm.lookup.centers)
        hit = idx >= 0
        assert hit.mean() > 0.9
        # returned plane should be near the query point
        d = np.linalg.norm(vm.lookup.centers[hit] - vm.lookup.centers[idx[hit]], axis=1)
        assert np.median(d) < 1.0
        # far-away points must miss
        far = vm.lookup.query(np.array([[500.0, 500.0, 500.0]]))
        assert far[0] == -1

    def test_min_ps_prunes(self):
        # a voxel with < 15 points must not be emitted
        rng = np.random.default_rng(3)
        pts = rng.uniform(0, 0.1, size=(10, 3)).astype(np.float32)  # 10 pts, 1 voxel
        fid = np.array([0] * 5 + [1] * 5, dtype=np.int32)
        R = np.tile(np.eye(3), (2, 1, 1))
        p = np.zeros((2, 3))
        vm = build_voxel_map(pts, fid, R, p, voxel_size=1.0)
        assert vm.num_planes == 0
