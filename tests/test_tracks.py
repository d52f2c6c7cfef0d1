import numpy as np
import jax.numpy as jnp

from global_lvba_tpu.tracks.build import build_components
from global_lvba_tpu.tracks.fuse import fuse_tracks
from global_lvba_tpu.models.synthetic import make_joint_scene
from global_lvba_tpu.pipeline.depth import (
    build_grid_map,
    render_depth_maps,
    camera_world_to_cam,
)


class TestBuildComponents:
    def test_simple_chain(self):
        # 3 images, one landmark seen in all three
        kps = [np.array([[10.0, 10.0]]), np.array([[20.0, 20.0]]), np.array([[30.0, 30.0]])]
        matches = {(0, 1): np.array([[0, 0]]), (1, 2): np.array([[0, 0]])}
        ts = build_components(kps, matches, obser_thr=3)
        assert ts.obs_img.shape[0] == 1
        assert ts.num_obs[0] == 3
        np.testing.assert_array_equal(ts.obs_img[0, :3], [0, 1, 2])

    def test_below_threshold_dropped(self):
        kps = [np.array([[1.0, 1.0]]), np.array([[2.0, 2.0]])]
        matches = {(0, 1): np.array([[0, 0]])}
        ts = build_components(kps, matches, obser_thr=3)
        assert ts.obs_img.shape[0] == 0

    def test_distinct_images_required(self):
        # 3 obs but only 2 distinct images -> dropped
        kps = [np.array([[1.0, 1.0], [1.5, 1.5]]), np.array([[2.0, 2.0]])]
        matches = {(0, 1): np.array([[0, 0], [1, 0]])}
        ts = build_components(kps, matches, obser_thr=3)
        assert ts.obs_img.shape[0] == 0

    def test_joint_scene_components(self):
        js = make_joint_scene(num_frames=10, points_per_frame=4000, seed=0)
        ts = build_components(js.keypoints, js.matches, obser_thr=3)
        assert ts.obs_img.shape[0] > 150
        # components correspond to landmarks: all obs of a track should be
        # the same ground-truth landmark
        good = 0
        for t in range(ts.obs_img.shape[0]):
            k = ts.num_obs[t]
            lms = [js.kp_landmark[ts.obs_img[t, o]][ts.obs_kp[t, o]] for o in range(k)]
            if len(set(lms)) == 1:
                good += 1
        assert good / ts.obs_img.shape[0] > 0.99


class TestFuseTracks:
    def test_fuse_recovers_landmarks(self):
        js = make_joint_scene(
            num_frames=12, points_per_frame=20000, seed=1
        )
        sc = js.lidar
        ts = build_components(js.keypoints, js.matches, obser_thr=3)
        gm = build_grid_map(
            [sc.points_body[sc.frame_ids == i] for i in range(12)],
            sc.R_true, sc.p_true,
        )
        Rcw, tcw = camera_world_to_cam(
            js.Rci, js.tci, sc.R_true[js.image_frame], sc.p_true[js.image_frame]
        )
        depth = render_depth_maps(
            js.cam, gm, sc.times, js.image_times, Rcw, tcw
        )
        fr = fuse_tracks(js.cam, ts, depth, Rcw, tcw, dtype=jnp.float64)
        ok = np.asarray(fr.ok)
        assert ok.mean() > 0.6
        # fused points should match the true landmarks
        Xw = np.asarray(fr.Xw)
        errs = []
        for t in np.flatnonzero(ok):
            lm = js.kp_landmark[ts.obs_img[t, 0]][ts.obs_kp[t, 0]]
            errs.append(np.linalg.norm(Xw[t] - js.landmarks[lm]))
        errs = np.array(errs)
        assert np.median(errs) < 0.05
        assert np.quantile(errs, 0.9) < 0.2
