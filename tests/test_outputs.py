import numpy as np
import pytest

from global_lvba_tpu.geometry.camera import CameraModel
from global_lvba_tpu.pipeline.outputs import (
    save_depth_png,
    load_depth_png,
    write_colmap_sparse,
    colorize_clouds,
    write_colored_pcd,
    save_reprojection_overlays,
    save_track_feature_images,
)
from global_lvba_tpu.io.pcd import read_pcd
from global_lvba_tpu.utils.checkpoint import StageCheckpoint

CAM = CameraModel(fx=100.0, fy=100.0, cx=64.0, cy=48.0, width=128, height=96)


class TestDepthPng:
    def test_roundtrip(self, tmp_path):
        depth = np.random.default_rng(0).uniform(0, 20, (96, 128)).astype(np.float32)
        p = tmp_path / "d.png"
        save_depth_png(p, depth)
        back = load_depth_png(p)
        # 16-bit at x2000 quantization -> 0.5 mm resolution
        assert np.abs(back - depth).max() < 1e-3


class TestColmapExport:
    def test_images_and_points(self, tmp_path):
        rng = np.random.default_rng(1)
        from scipy.spatial.transform import Rotation

        Rcw = Rotation.random(3, random_state=0).as_matrix()
        tcw = rng.normal(size=(3, 3))
        pts = rng.normal(size=(10, 3))
        write_colmap_sparse(tmp_path, Rcw, tcw, pts)
        img_lines = (tmp_path / "sparse" / "images.txt").read_text().splitlines()
        assert len(img_lines) == 6  # 2 lines per image
        pt_lines = (tmp_path / "sparse" / "points3D.txt").read_text().splitlines()
        assert len(pt_lines) == 10
        # quaternion round-trips to the rotation
        parts = img_lines[0].split()
        q = np.array(list(map(float, parts[1:5])))
        Rrt = Rotation.from_quat([q[1], q[2], q[3], q[0]]).as_matrix()
        np.testing.assert_allclose(Rrt, Rcw[0], atol=1e-5)


class TestColorize:
    def test_colored_cloud(self, tmp_path):
        # single frame: points ahead of an identity camera; constant image color
        clouds = [np.array([[0.0, 0.0, 5.0], [0.1, 0.0, 4.0]], dtype=np.float32)]
        img = np.zeros((96, 128, 3), dtype=np.uint8)
        img[:, :] = (255, 128, 64)  # BGR
        out = colorize_clouds(
            CAM, clouds, np.array([0.0]),
            np.eye(3)[None], np.zeros((1, 3)),
            np.array([0.0]), [img],
            np.eye(3)[None], np.zeros((1, 3)),
        )
        assert out.shape[0] == 2
        # rgb stored as (r, g, b)
        np.testing.assert_array_equal(out[0, 3:6], [64, 128, 255])
        p = tmp_path / "c.pcd"
        write_colored_pcd(p, out)
        back = read_pcd(p, fields=("x", "y", "z"))
        np.testing.assert_allclose(back, out[:, :3], atol=1e-6)


class TestOverlays:
    def test_reprojection_overlays(self, tmp_path):
        rng = np.random.default_rng(2)
        M, P = 2, 5
        X = np.stack([rng.uniform(-1, 1, P), rng.uniform(-1, 1, P), rng.uniform(4, 6, P)], -1)
        Rcw = np.tile(np.eye(3), (M, 1, 1))
        tcw = np.zeros((M, 3))
        obs_cam = np.repeat(np.arange(M), P).astype(np.int32)
        obs_pt = np.tile(np.arange(P), M).astype(np.int32)
        uv = (X[obs_pt, :2] / X[obs_pt, 2:3]) * 100 + [64, 48]
        pre, post = save_reprojection_overlays(
            tmp_path, CAM, [None, None], obs_cam, obs_pt, uv,
            X + 0.05, X, Rcw, tcw, Rcw, tcw,
        )
        assert post < pre
        assert post < 0.2  # exact geometry -> ~0 post error
        assert len(list(tmp_path.iterdir())) == M

    def test_track_features(self, tmp_path):
        kps = [np.array([[10.0, 10.0], [50.0, 30.0]], dtype=np.float32)]
        used = [np.array([True, False])]
        save_track_feature_images(tmp_path, CAM, [None], kps, used)
        assert len(list(tmp_path.iterdir())) == 1


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        ck = StageCheckpoint(tmp_path)
        R = np.random.default_rng(0).normal(size=(4, 3, 3))
        clouds = [np.random.default_rng(i).normal(size=(10 + i, 3)) for i in range(3)]
        ck.save("stage1", R_opt=R, note="hello", count=3, clouds=clouds)
        assert ck.has("stage1")
        out = ck.load("stage1")
        np.testing.assert_array_equal(out["R_opt"], R)
        assert out["note"] == "hello"
        assert out["count"] == 3
        assert len(out["clouds"]) == 3
        np.testing.assert_array_equal(out["clouds"][2], clouds[2])

    def test_missing(self, tmp_path):
        ck = StageCheckpoint(tmp_path)
        assert not ck.has("nope")


class TestVizExports:
    def test_trajectory_cloud(self, tmp_path):
        from global_lvba_tpu.pipeline.viz import export_trajectory_cloud, export_track_compare
        from global_lvba_tpu.io.pcd import read_pcd

        rng = np.random.default_rng(0)
        clouds = [rng.uniform(-2, 2, (500, 3)).astype(np.float32) for _ in range(3)]
        R = np.tile(np.eye(3), (3, 1, 1))
        p = np.array([[0.0, 0, 0], [1.0, 0, 0], [2.0, 0, 0]])
        n = export_trajectory_cloud(tmp_path, clouds, R, p)
        assert n > 0
        cloud = read_pcd(tmp_path / "map_cloud.pcd", fields=("x", "y", "z"))
        assert cloud.shape[0] == n
        path = read_pcd(tmp_path / "map_path.pcd", fields=("x", "y", "z"))
        assert path.shape[0] == 3
        # data_show re-expresses relative to frame 0
        np.testing.assert_allclose(path[0], 0, atol=1e-6)

        export_track_compare(tmp_path, np.zeros((5, 3)), np.ones((5, 3)))
        assert (tmp_path / "tracks_before.pcd").exists()


class TestViewerHook:
    """launch_viewer degrades gracefully without open3d/display and the
    CLI `view` subcommand reports the outcome in its exit code."""

    def test_no_pcds_returns_false(self, tmp_path):
        from global_lvba_tpu.pipeline.viz import launch_viewer

        assert launch_viewer(tmp_path) is False

    def test_without_open3d_hints_and_returns_false(self, tmp_path):
        import numpy as np

        from global_lvba_tpu.io.pcd import write_pcd
        from global_lvba_tpu.pipeline.viz import launch_viewer

        write_pcd(tmp_path / "cloud.pcd", np.zeros((4, 3), np.float32))
        try:
            import open3d  # noqa: F401
            has_o3d = True
        except ImportError:
            has_o3d = False
        if has_o3d:
            import pytest
            pytest.skip("open3d installed; interactive path needs a display")
        assert launch_viewer(tmp_path, block=False) is False

    def test_cli_view_exit_code(self, tmp_path):
        from global_lvba_tpu.__main__ import main

        assert main(["view", "--out", str(tmp_path)]) == 1
