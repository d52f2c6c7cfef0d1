"""Measurement-ladder (3): Retail_Street-scale single-chip e2e.

200 frames / ~2M LiDAR points / 200 images / COLMAP-db correspondences,
the full LvbaSystem pipeline (window BA -> anchors -> 2-stage global BA ->
depth maps -> tracks/fusion -> joint visual BA).  Round-2 record:
60.3 s steady-state, reproj 0.899 -> 0.300 px (BASELINE.md); the round-3
target is <= ~35 s via the native z-buffer rasterizer, host bilinear fuse
fetch, and the widened window-build pool.

Prints one JSON line.  Runs twice by default (cold incl. compiles, then
steady-state with a fresh out_dir but warm in-process jit cache).
Usage:  python scripts/ladder3_e2e.py     (TPU via the default backend)
"""

import json
import os
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    import cv2

    from global_lvba_tpu.config import LvbaConfig
    from global_lvba_tpu.frontend.colmap_db import write_colmap_db
    from global_lvba_tpu.io.pcd import write_pcd
    from global_lvba_tpu.io.tum import write_tum_poses
    from global_lvba_tpu.models.synthetic import (
        ate_rmse, make_joint_scene, perturb_poses,
    )
    from global_lvba_tpu.pipeline.system import LvbaSystem

    num_frames = int(os.environ.get("LADDER3_FRAMES", "200"))
    ppf = int(os.environ.get("LADDER3_PPF", "10000"))
    js = make_joint_scene(
        num_frames=num_frames, points_per_frame=ppf, num_landmarks=8000,
        seed=13, px_noise=0.3,
    )
    sc = js.lidar
    if os.environ.get("LADDER3_DRIFT", "0") == "1":
        # odometry-style accumulated drift (the realistic LIVO error
        # model); pair with LADDER3_REFINE=1 to engage the direct
        # all-frame global_refine stage
        from global_lvba_tpu.models.synthetic import perturb_poses_drift

        R_odom, p_odom = perturb_poses_drift(
            sc.R_true, sc.p_true, 0.0008, 0.002, seed=21
        )
    else:
        R_odom, p_odom = perturb_poses(sc.R_true, sc.p_true, 0.003, 0.008,
                                       seed=21)

    root = Path(tempfile.mkdtemp(prefix="ladder3_"))
    img_dir = root / "all_image"
    pcd_dir = root / "all_pcd_body"
    img_dir.mkdir()
    pcd_dir.mkdir()
    names = []
    blank = np.zeros((js.cam.height, js.cam.width, 3), np.uint8)
    for i, t in enumerate(js.image_times):
        name = f"{t:.6f}.png"
        names.append(name)
        cv2.imwrite(str(img_dir / name), blank)
    write_tum_poses(
        img_dir / "image_poses.txt", js.image_times,
        R_odom[js.image_frame], p_odom[js.image_frame],
    )
    for i, t in enumerate(sc.times):
        write_pcd(pcd_dir / f"{t:.6f}.pcd", sc.points_body[sc.frame_ids == i])
    write_tum_poses(pcd_dir / "lidar_poses.txt", sc.times, R_odom, p_odom)
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
    cfg.window_ba.size = 10
    cfg.window_ba.anchor_leaf_size = 0.02
    cfg.window_ba.use_window_ba_rel = True
    cfg.BALM_stage1.root_voxel_size = 1.0
    cfg.BALM_stage1.eigen_ratio_array = [0.2] * 4
    cfg.BALM_stage2.root_voxel_size = 0.5
    cfg.BALM_stage2.eigen_ratio_array = [0.08] * 4
    if os.environ.get("LADDER3_REFINE", "0") == "1":
        cfg.global_refine.enable = True

    def run_once(tag):
        t0 = time.time()
        sysm = LvbaSystem(cfg, out_dir=root / f"out_{tag}", resume=False)
        sysm.run_lidar_ba()
        res = sysm.run_visual_ba()
        total = time.time() - t0
        obs_cam, obs_pt, _ = res.track_obs
        return {
            f"{tag}_s": round(total, 1),
            f"{tag}_reproj_px": [round(float(res.mean_reproj_pre), 3),
                                 round(float(res.mean_reproj_post), 3)],
            f"{tag}_ate_m": [round(ate_rmse(p_odom, sc.p_true), 5),
                             round(ate_rmse(sysm.p_opt, sc.p_true), 5)],
            f"{tag}_tracks": int(np.max(obs_pt) + 1) if obs_pt.size else 0,
            f"{tag}_obs": int(obs_cam.shape[0]),
            f"{tag}_stage_s": {
                k: round(float(v), 1)
                for k, v in sysm.metrics.values.items()
                if k.startswith("time/")
            },
            f"{tag}_visual_sub_s": {
                k: round(float(res.stats[k]), 2)
                for k in ("depth_s", "fuse_s", "planes_s", "solve_s")
                if k in res.stats
            },
        }

    out = {"metric": "ladder3_e2e", "frames": num_frames,
           "points": int(sc.points_body.shape[0]),
           "images": len(js.image_times)}
    out.update(run_once("cold"))
    if os.environ.get("LADDER3_STEADY", "1") == "1":
        out.update(run_once("steady"))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
