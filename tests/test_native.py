import numpy as np
import pytest

from global_lvba_tpu.native import runtime as nat


needs_native = pytest.mark.skipif(
    nat.get_lib() is None, reason="native toolchain unavailable"
)


@needs_native
class TestNative:
    def test_lzf_roundtrip_via_pcd(self, tmp_path):
        # LZF: compress with a tiny reference compressor in python, decompress native
        # Instead: decompress a hand-built literal-only stream
        payload = bytes(range(256)) * 4
        # literal-only LZF encoding: runs of <=32 bytes prefixed by len-1
        enc = bytearray()
        i = 0
        while i < len(payload):
            chunk = payload[i : i + 32]
            enc.append(len(chunk) - 1)
            enc += chunk
            i += len(chunk)
        out = nat.lzf_decompress(bytes(enc), len(payload))
        assert out == payload

    def test_voxel_keys_match_python(self):
        from global_lvba_tpu.map.voxelize import pack_voxel_keys, voxel_coords

        rng = np.random.default_rng(0)
        pts = rng.uniform(-50, 50, size=(10000, 3)).astype(np.float32)
        k_nat = nat.voxel_keys(pts, 0.5)
        k_py = pack_voxel_keys(voxel_coords(pts.astype(np.float64), 0.5))
        np.testing.assert_array_equal(k_nat, k_py)

    def test_voxel_keys64_match_python(self):
        from global_lvba_tpu.map.voxelize import pack_voxel_keys, voxel_coords

        rng = np.random.default_rng(5)
        pts = rng.uniform(-300, 300, size=(50000, 3))
        k_nat = nat.voxel_keys64(pts, 0.7)
        k_py = pack_voxel_keys(voxel_coords(pts, 0.7))
        np.testing.assert_array_equal(k_nat, k_py)
        # out-of-range coordinates report failure (caller falls back to
        # the raising numpy path)
        assert nat.voxel_keys64(np.array([[1e9, 0.0, 0.0]]), 1.0) is None

    def test_transform_points_match_einsum(self):
        from scipy.spatial.transform import Rotation

        rng = np.random.default_rng(6)
        pts = rng.normal(size=(30000, 3))
        fid = rng.integers(0, 40, 30000).astype(np.int32)
        R = Rotation.random(40, random_state=1).as_matrix()
        p = rng.normal(size=(40, 3))
        w_nat = nat.transform_points(pts, fid, R, p)
        w_np = np.einsum("nij,nj->ni", R[fid], pts) + p[fid]
        np.testing.assert_allclose(w_nat, w_np, atol=1e-13)

    def test_bin_moments_match_reduceat(self):
        rng = np.random.default_rng(7)
        N = 200000
        pts = rng.normal(size=(N, 3))
        keys = rng.integers(0, 5000, N)
        order = np.argsort(keys, kind="stable")
        sk = keys[order]
        starts = np.flatnonzero(np.r_[True, sk[1:] != sk[:-1]])
        s_nat, m_nat = nat.bin_moments(pts, order, starts)
        p = pts[order]
        s_np = np.add.reduceat(p, starts, axis=0)
        xx = np.stack([p[:, 0] * p[:, 0], p[:, 0] * p[:, 1], p[:, 0] * p[:, 2],
                       p[:, 1] * p[:, 1], p[:, 1] * p[:, 2], p[:, 2] * p[:, 2]],
                      axis=1)
        m_np = np.add.reduceat(xx, starts, axis=0)
        np.testing.assert_allclose(s_nat, s_np, atol=1e-10)
        np.testing.assert_allclose(m_nat, m_np, atol=1e-10)

    def test_radix_argsort(self):
        rng = np.random.default_rng(1)
        keys = rng.integers(-(2**62), 2**62, size=100000)
        perm = nat.radix_argsort(keys)
        sorted_nat = keys[perm]
        assert np.all(np.diff(sorted_nat) >= 0)

    def test_union_find_components(self):
        # two components: {0,1,2}, {3,4}; 5 isolated
        edges = np.array([[0, 1], [1, 2], [3, 4]], dtype=np.int64)
        labels = nat.union_find(6, edges)
        assert labels[0] == labels[1] == labels[2]
        assert labels[3] == labels[4]
        assert labels[0] != labels[3]
        assert labels[5] not in (labels[0], labels[3])

    def test_plane_cgh_matches_oracle(self):
        # lvba_plane_cgh is the vs_baseline denominator in bench.py: a
        # regression here would silently corrupt the published ratio
        from global_lvba_tpu.eval.oracle import bucket_cost_grad_hess
        from global_lvba_tpu.map.voxelize import build_voxel_map
        from global_lvba_tpu.models.synthetic import (
            make_plane_scene, perturb_poses,
        )

        W = 8
        scene = make_plane_scene(num_frames=W, points_per_frame=800, seed=3)
        vm = build_voxel_map(
            scene.points_body, scene.frame_ids, scene.R_true, scene.p_true,
            voxel_size=1.0, eigen_ratios=(0.2, 0.2, 0.2, 0.2),
        )
        Rp, pp = perturb_poses(scene.R_true, scene.p_true, 0.01, 0.03, seed=4)
        assert vm.buckets, "fixture produced no factor buckets"
        for b in vm.buckets:
            out = nat.plane_cgh(b, Rp, pp, W)
            assert out is not None
            c_nat, g_nat, H_nat = out
            c_ref, g_ref, H_ref = bucket_cost_grad_hess(b, Rp, pp, W)
            assert c_nat == pytest.approx(c_ref, rel=1e-10)
            np.testing.assert_allclose(g_nat, g_ref, rtol=1e-8, atol=1e-12)
            np.testing.assert_allclose(H_nat, H_ref, rtol=1e-8, atol=1e-12)

    def test_zbuffer_matches_host_rasterizer(self):
        from scipy.spatial.transform import Rotation

        from global_lvba_tpu.geometry.camera import CameraModel
        from global_lvba_tpu.pipeline.depth import _zbuffer_host

        cam = CameraModel(fx=400.0, fy=410.0, cx=320.0, cy=240.0,
                          k1=-0.05, k2=0.08, p1=-0.001, p2=0.0005,
                          width=640, height=480)
        rng = np.random.default_rng(7)
        N = 300_000
        pts = rng.uniform(-8, 8, size=(N, 3)).astype(np.float32)
        pts[:, 2] = rng.uniform(-2, 20, size=N)
        Rcw = Rotation.from_rotvec([0.05, -0.1, 0.02]).as_matrix()
        tcw = np.array([0.1, -0.2, 0.5])
        d_py = _zbuffer_host(cam, Rcw, tcw, pts)
        d_nat = nat.zbuffer(pts, Rcw, tcw, cam)
        assert d_nat is not None
        # f32 rounding differences (numpy's BLAS projection vs the scalar
        # FMA chain) may flip a handful of occlusion-boundary pixels; the
        # rasterization must agree everywhere else
        frac = np.mean(np.abs(d_py - d_nat) > 1e-6)
        assert frac < 1e-3, f"{frac:.2e} of pixels differ"

    def test_zbuffer_ranges_matches_gathered(self):
        # CSR-direct rasterization must equal gather-then-rasterize EXACTLY
        # (same code path over the same floats, only the iteration differs)
        from scipy.spatial.transform import Rotation

        from global_lvba_tpu.geometry.camera import CameraModel

        cam = CameraModel(fx=400.0, fy=410.0, cx=320.0, cy=240.0,
                          k1=-0.05, k2=0.08, p1=-0.001, p2=0.0005,
                          width=640, height=480)
        rng = np.random.default_rng(11)
        N = 200_000
        pts = rng.uniform(-8, 8, size=(N, 3)).astype(np.float32)
        pts[:, 2] = rng.uniform(-2, 20, size=N)
        # ragged ranges covering a scattered subset, incl. empty ranges
        starts = np.sort(rng.integers(0, N - 512, size=64)).astype(np.int64)
        counts = rng.integers(0, 512, size=64).astype(np.int64)
        idx = np.concatenate(
            [np.arange(s, s + c) for s, c in zip(starts, counts)]
        )
        Rcw = Rotation.from_rotvec([0.05, -0.1, 0.02]).as_matrix()
        tcw = np.array([0.1, -0.2, 0.5])
        d_r = nat.zbuffer_ranges(pts, starts, counts, Rcw, tcw, cam)
        d_g = nat.zbuffer(np.ascontiguousarray(pts[idx]), Rcw, tcw, cam)
        assert d_r is not None and d_g is not None
        np.testing.assert_array_equal(d_r, d_g)

    def test_lm_solve_matches_oracle(self):
        # the full native damped-LM loop (bench's at-scale CPU baseline)
        # must track the reference-faithful oracle exactly
        from global_lvba_tpu.eval.oracle import oracle_damping_iter
        from global_lvba_tpu.map.voxelize import build_voxel_map
        from global_lvba_tpu.models.synthetic import (
            ate_rmse, make_plane_scene, perturb_poses,
        )

        W = 12
        scene = make_plane_scene(num_frames=W, points_per_frame=1000, seed=5)
        vm = build_voxel_map(
            scene.points_body, scene.frame_ids, scene.R_true, scene.p_true,
            voxel_size=1.0, eigen_ratios=(0.2, 0.2, 0.2, 0.2),
        )
        Rp, pp = perturb_poses(scene.R_true, scene.p_true, 0.01, 0.03, seed=6)
        out = nat.lm_solve(vm.buckets, Rp, pp, W, max_iters=8)
        assert out is not None
        Rn, pn, resid, iters = out
        o = oracle_damping_iter(vm.buckets, Rp, pp, max_iters=8)
        # same trust-region trajectory -> near-identical poses
        np.testing.assert_allclose(pn, o.p, atol=1e-8)
        np.testing.assert_allclose(Rn, o.R, atol=1e-8)
        assert ate_rmse(pn, scene.p_true) < 0.3 * ate_rmse(pp, scene.p_true)

    def test_union_find_matches_python_on_random_graph(self):
        rng = np.random.default_rng(2)
        n = 5000
        edges = rng.integers(0, n, size=(20000, 2)).astype(np.int64)
        labels = nat.union_find(n, edges)
        # python reference
        parent = np.arange(n)

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[rb] = ra
        ref = np.array([find(i) for i in range(n)])
        # same partition (compare canonical labels)
        import itertools

        def canon(lbl):
            _, inv = np.unique(lbl, return_inverse=True)
            return inv

        np.testing.assert_array_equal(canon(labels), canon(ref))
