import numpy as np

from global_lvba_tpu.config import LvbaConfig
from global_lvba_tpu.models.synthetic import make_joint_scene, perturb_poses
from global_lvba_tpu.pipeline.visual_ba import run_visual_ba


class TestVisualPipeline:
    def test_end_to_end_improves_reprojection(self):
        js = make_joint_scene(
            num_frames=12, points_per_frame=20000, seed=3,
            px_noise=0.3,
        )
        sc = js.lidar
        clouds = [sc.points_body[sc.frame_ids == i] for i in range(12)]

        # odometry poses = perturbed truth; "LiDAR BA result" = truth
        R_odom, p_odom = perturb_poses(sc.R_true, sc.p_true, 0.004, 0.01, seed=9)

        cfg = LvbaConfig()
        cfg.window_ba.size = 6
        cfg.window_ba.anchor_leaf_size = 0.02
        cfg.BALM_stage2.root_voxel_size = 0.5
        cfg.BALM_stage2.eigen_ratio_array = [0.08] * 4
        cfg.track_fusion.obser_thr = 3

        res = run_visual_ba(
            cam=js.cam,
            clouds=clouds,
            lidar_times=sc.times,
            R_opt=sc.R_true, p_opt=sc.p_true,
            R_orig=R_odom, p_orig=p_odom,
            image_times=js.image_times,
            cam_R=R_odom[js.image_frame], cam_p=p_odom[js.image_frame],
            Rci=js.Rci, tci=js.tci,
            keypoints=js.keypoints,
            matches=js.matches,
            cfg=cfg,
        )

        assert res.stats["tracks_fused"] > 50
        assert res.stats["tracks_with_plane"] > 30
        # post-BA reprojection must be at the pixel-noise level and better
        # than the original (odometry-pose) reprojection
        assert res.mean_reproj_post < 1.0
        assert res.mean_reproj_post < res.mean_reproj_pre
        assert res.stats["cost"] < res.stats["cost0"]
