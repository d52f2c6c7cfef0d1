import numpy as np
import jax.numpy as jnp

from global_lvba_tpu.geometry.camera import CameraModel
from global_lvba_tpu.pipeline.depth import (
    build_grid_map,
    covisible_voxels,
    gather_voxel_points,
    render_depth_maps,
    update_camera_poses_from_lidar,
    camera_world_to_cam,
)

CAM = CameraModel(fx=100.0, fy=100.0, cx=64.0, cy=48.0, width=128, height=96)


class TestGridMap:
    def test_build_and_gather(self):
        rng = np.random.default_rng(0)
        clouds = [rng.uniform(-3, 3, size=(500, 3)).astype(np.float32) for _ in range(4)]
        R = np.tile(np.eye(3), (4, 1, 1))
        p = np.zeros((4, 3))
        gm = build_grid_map(clouds, R, p)
        total = sum(c.shape[0] for c in clouds)
        assert gm.points.shape[0] == total
        # gathering all voxels returns all points
        pts = gather_voxel_points(gm, gm.keys)
        assert pts.shape[0] == total

    def test_covisibility_window(self):
        clouds = [np.full((10, 3), float(i), dtype=np.float32) for i in range(5)]
        R = np.tile(np.eye(3), (5, 1, 1))
        p = np.zeros((5, 3))
        gm = build_grid_map(clouds, R, p)
        times = np.array([0.0, 1.0, 2.0, 3.0, 4.0])
        # image at t=2.0 with ±0.5 s only covers frame 2
        vox = covisible_voxels(gm, times, 2.0, half_w=0.5)
        pts = gather_voxel_points(gm, vox)
        assert np.allclose(pts, 2.0)
        # wider window covers frames 1..3
        vox = covisible_voxels(gm, times, 2.0, half_w=1.1)
        pts = gather_voxel_points(gm, vox)
        assert set(np.unique(pts)) == {1.0, 2.0, 3.0}


class TestDepthRender:
    def test_single_point_depth(self):
        # one cloud with a point straight ahead of an identity camera
        clouds = [np.array([[0.0, 0.0, 5.0], [0.1, 0.1, 2.0]], dtype=np.float32)]
        R = np.eye(3)[None]
        p = np.zeros((1, 3))
        gm = build_grid_map(clouds, R, p)
        depth = render_depth_maps(
            CAM, gm, np.array([0.0]), np.array([0.0]),
            np.eye(3)[None], np.zeros((1, 3)),
        )
        assert depth.shape == (1, 96, 128)
        # center pixel sees the z=5 point
        assert abs(depth[0, 48, 64] - 5.0) < 1e-5
        # the closer off-center point lands at its projected pixel
        u, v = int(100 * 0.05 + 64), int(100 * 0.05 + 48)
        assert abs(depth[0, v, u] - 2.0) < 1e-5

    def test_zbuffer_keeps_nearest(self):
        clouds = [np.array([[0.0, 0.0, 5.0], [0.0, 0.0, 3.0]], dtype=np.float32)]
        gm = build_grid_map(clouds, np.eye(3)[None], np.zeros((1, 3)))
        depth = render_depth_maps(
            CAM, gm, np.array([0.0]), np.array([0.0]),
            np.eye(3)[None], np.zeros((1, 3)),
        )
        assert abs(depth[0, 48, 64] - 3.0) < 1e-5

    def test_behind_camera_ignored(self):
        clouds = [np.array([[0.0, 0.0, -5.0]], dtype=np.float32)]
        gm = build_grid_map(clouds, np.eye(3)[None], np.zeros((1, 3)))
        depth = render_depth_maps(
            CAM, gm, np.array([0.0]), np.array([0.0]),
            np.eye(3)[None], np.zeros((1, 3)),
        )
        assert depth.max() == 0.0


class TestPoseUpdate:
    def test_delta_propagation(self):
        # lidar frame moved by a known delta; nearest camera follows
        from scipy.spatial.transform import Rotation

        R_orig = np.tile(np.eye(3), (3, 1, 1))
        p_orig = np.array([[0.0, 0, 0], [1.0, 0, 0], [2.0, 0, 0]])
        dR = Rotation.from_rotvec([0, 0, 0.1]).as_matrix()
        R_opt = np.einsum("ij,fjk->fik", dR, R_orig)
        p_opt = p_orig + np.array([0.0, 0.5, 0.0])
        # make the delta frame-dependent for frame 1 only
        times = np.array([0.0, 1.0, 2.0])
        cam_R = np.tile(np.eye(3), (1, 1, 1))
        cam_p = np.array([[1.0, 0.2, 0.0]])
        R_new, p_new = update_camera_poses_from_lidar(
            times, R_opt, p_opt, R_orig, p_orig, np.array([1.05]), cam_R, cam_p
        )
        # delta of frame 1: T_opt T_orig^-1
        dp = p_opt[1] - dR @ p_orig[1]
        np.testing.assert_allclose(R_new[0], dR @ cam_R[0], atol=1e-12)
        np.testing.assert_allclose(p_new[0], dR @ cam_p[0] + dp, atol=1e-12)

    def test_world_to_cam(self):
        from scipy.spatial.transform import Rotation

        Rci = Rotation.random(1, random_state=0).as_matrix()[0]
        tci = np.array([0.1, -0.2, 0.05])
        Rwi = Rotation.random(2, random_state=1).as_matrix()
        pwi = np.random.default_rng(0).normal(size=(2, 3))
        Rcw, tcw = camera_world_to_cam(Rci, tci, Rwi, pwi)
        # a point at the body origin must land at tci in the camera frame
        for m in range(2):
            Xc = Rcw[m] @ pwi[m] + tcw[m]
            np.testing.assert_allclose(Xc, tci, atol=1e-12)
