import numpy as np
import pytest

from global_lvba_tpu.config import LvbaConfig
from global_lvba_tpu.frontend.colmap_db import write_colmap_db, load_colmap_db
from global_lvba_tpu.io.pcd import write_pcd
from global_lvba_tpu.io.tum import write_tum_poses
from global_lvba_tpu.models.synthetic import make_joint_scene, perturb_poses
from global_lvba_tpu.pipeline.system import LvbaSystem
from global_lvba_tpu.io.dataset import load_dataset


@pytest.fixture(scope="module")
def synthetic_dataset(tmp_path_factory):
    """Write a reference-layout dataset from a joint synthetic scene."""
    root = tmp_path_factory.mktemp("dataset")
    js = make_joint_scene(num_frames=12, points_per_frame=15000, seed=13, px_noise=0.3)
    sc = js.lidar
    R_odom, p_odom = perturb_poses(sc.R_true, sc.p_true, 0.003, 0.008, seed=21)

    img_dir = root / "all_image"
    pcd_dir = root / "all_pcd_body"
    img_dir.mkdir()
    pcd_dir.mkdir()

    import cv2

    names = []
    for i, t in enumerate(js.image_times):
        name = f"{t:.6f}.png"
        names.append(name)
        cv2.imwrite(str(img_dir / name), np.zeros((4, 4, 3), dtype=np.uint8))
    write_tum_poses(
        img_dir / "image_poses.txt", js.image_times,
        R_odom[js.image_frame], p_odom[js.image_frame],
    )
    for i, t in enumerate(sc.times):
        write_pcd(pcd_dir / f"{t:.6f}.pcd", sc.points_body[sc.frame_ids == i])
    write_tum_poses(pcd_dir / "lidar_poses.txt", sc.times, R_odom, p_odom)

    # COLMAP db with the synthetic keypoints/matches
    kps4 = [
        np.concatenate([k, np.ones((k.shape[0], 2), np.float32)], axis=1)
        for k in js.keypoints
    ]
    write_colmap_db(root / "match.db", names, kps4, js.matches)

    cfg = LvbaConfig()
    cfg.data_config.data_path = str(root)
    cfg.data_config.colmap_db_path = "match.db"
    cfg.data_config.image_sample_step = 1
    cfg.cam_model.cam_width = js.cam.width
    cfg.cam_model.cam_height = js.cam.height
    cfg.cam_model.scale = 1.0
    cfg.cam_model.cam_fx = js.cam.fx
    cfg.cam_model.cam_fy = js.cam.fy
    cfg.cam_model.cam_cx = js.cam.cx
    cfg.cam_model.cam_cy = js.cam.cy
    cfg.cam_model.cam_d0 = js.cam.k1
    cfg.cam_model.cam_d1 = js.cam.k2
    cfg.cam_model.cam_d2 = js.cam.p1
    cfg.cam_model.cam_d3 = js.cam.p2
    cfg.extrin_calib.Rcl = list(js.Rci.reshape(-1))
    cfg.extrin_calib.Pcl = list(js.tci)
    cfg.window_ba.size = 6
    cfg.window_ba.anchor_leaf_size = 0.02
    cfg.window_ba.use_window_ba_rel = True
    cfg.BALM_stage1.root_voxel_size = 1.0
    cfg.BALM_stage1.eigen_ratio_array = [0.2] * 4
    cfg.BALM_stage2.root_voxel_size = 0.5
    cfg.BALM_stage2.eigen_ratio_array = [0.08] * 4
    return root, cfg, js, sc, (R_odom, p_odom)


class TestDatasetIO:
    def test_load(self, synthetic_dataset):
        root, cfg, js, sc, _ = synthetic_dataset
        ds = load_dataset(cfg)
        assert len(ds.image_paths) == len(js.image_times)
        assert len(ds.clouds) == len(sc.times)
        np.testing.assert_allclose(ds.lidar_times, sc.times, atol=1e-6)
        np.testing.assert_allclose(ds.Rci, js.Rci, atol=1e-9)

    def test_colmap_roundtrip(self, synthetic_dataset):
        root, cfg, js, sc, _ = synthetic_dataset
        names = [f"{t:.6f}.png" for t in js.image_times]
        out = load_colmap_db(root / "match.db", names)
        assert out is not None
        kps, matches = out
        assert len(kps) == len(names)
        np.testing.assert_allclose(kps[0][:, :2], js.keypoints[0], atol=1e-5)
        for key in js.matches:
            np.testing.assert_array_equal(matches[key], js.matches[key])

    def test_count_mismatch_returns_none(self, synthetic_dataset):
        root, cfg, js, sc, _ = synthetic_dataset
        names = [f"{t:.6f}.png" for t in js.image_times][:-1]
        assert load_colmap_db(root / "match.db", names) is None


class TestFullPipeline:
    def test_run_and_resume(self, synthetic_dataset, tmp_path):
        root, cfg, js, sc, (R_odom, p_odom) = synthetic_dataset
        sys1 = LvbaSystem(cfg, out_dir=tmp_path / "out", resume=True)
        result = sys1.run_full_pipeline()
        assert result["mean_reproj_post"] < result["mean_reproj_pre"]
        assert result["mean_reproj_post"] < 1.5

        # lidar BA should have moved poses toward the truth
        from global_lvba_tpu.models.synthetic import ate_rmse

        ate_before = ate_rmse(p_odom, sc.p_true)
        ate_after = ate_rmse(sys1.p_opt, sc.p_true)
        assert ate_after < ate_before

        # resume path: second run loads checkpoints (fast, same results)
        sys2 = LvbaSystem(cfg, out_dir=tmp_path / "out", resume=True)
        result2 = sys2.run_full_pipeline()
        np.testing.assert_allclose(sys2.p_opt, sys1.p_opt, atol=1e-12)
        assert result2["mean_reproj_post"] == pytest.approx(
            result["mean_reproj_post"], abs=1e-9
        )
