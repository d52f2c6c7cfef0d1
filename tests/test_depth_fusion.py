"""Depth-fused track candidate path — outcome-verified (VERDICT r1 item 7).

The reference prefers LiDAR-depth-fused 3D candidates over DLT
triangulation whenever they reproject better
(/root/reference/src/lvba_system.cpp:1020-1106,1163-1205); round 1 never
exercised a scene where depth fusion actually wins.  This fixture renders
DENSE analytic depth maps of a plane so the bilinear fetch succeeds at
every observation, builds tracks with < 4 distinct views (DLT requires
>= 4, lvba_system.cpp:1108) and verifies the depth candidates are
selected AND land on the ground-truth landmarks.
"""

import dataclasses

import numpy as np
import jax.numpy as jnp

from global_lvba_tpu.geometry.camera import CameraModel
from global_lvba_tpu.tracks.build import TrackSet
from global_lvba_tpu.tracks.fuse import fuse_tracks
from global_lvba_tpu.eval.oracle import _exp_so3, _np_project


def _make_fixture(n_obs_per_track=3, n_tracks=40, seed=0):
    """Cameras on a wide baseline viewing the world plane z = 10."""
    rng = np.random.default_rng(seed)
    cam = CameraModel(fx=300.0, fy=300.0, cx=160.0, cy=120.0,
                      k1=-0.03, k2=0.01, p1=-0.0005, p2=0.0003,
                      width=320, height=240)
    M = 5
    ZP = 10.0
    Rcw = np.zeros((M, 3, 3))
    tcw = np.zeros((M, 3))
    for m in range(M):
        # wide baseline (>8 deg view-angle separation at 10 m), each camera
        # rotated about +y toward the scene center
        Rcw[m] = _exp_so3(np.array([0.0, 0.12 * (m - 2), 0.0]))
        C = np.array([2.5 * (m - 2), 0.0, 0.0])     # camera center in world
        tcw[m] = -Rcw[m] @ C

    # dense depth maps: per-pixel ray-plane intersection (z-depth)
    H, W = cam.height, cam.width
    u, v = np.meshgrid(np.arange(W, dtype=np.float64),
                       np.arange(H, dtype=np.float64))
    from global_lvba_tpu.geometry.camera import undistort_pixel_to_normalized

    uv = np.stack([u, v], axis=-1).reshape(-1, 2)
    xy_n, _ = undistort_pixel_to_normalized(cam, jnp.asarray(uv))
    xy_n = np.asarray(xy_n)
    depth_maps = np.zeros((M, H, W), np.float32)
    for m in range(M):
        Rwc = Rcw[m].T
        C = -Rwc @ tcw[m]
        ray_w = (Rwc @ np.concatenate([xy_n, np.ones((xy_n.shape[0], 1))], 1).T).T
        t = (ZP - C[2]) / ray_w[:, 2]
        depth_maps[m] = t.reshape(H, W)             # z-depth = t * 1 (Xc z = t)

    # landmarks on the plane near the covisible center of their camera
    # triple, observed by n_obs_per_track consecutive cams
    lm = np.zeros((n_tracks, 3))
    bases = rng.integers(0, M - n_obs_per_track + 1, n_tracks)
    center_cam = bases + (n_obs_per_track - 1) / 2.0
    lm[:, 0] = 2.5 * (center_cam - 2) + rng.uniform(-1.0, 1.0, n_tracks)
    lm[:, 1] = rng.uniform(-1.5, 1.5, n_tracks)
    lm[:, 2] = ZP
    Omax = 8
    obs_img = np.zeros((n_tracks, Omax), np.int32)
    obs_uv = np.zeros((n_tracks, Omax, 2), np.float32)
    obs_valid = np.zeros((n_tracks, Omax), bool)
    keep = np.ones(n_tracks, bool)
    for t_i in range(n_tracks):
        base = bases[t_i]
        cams = np.arange(base, base + n_obs_per_track)
        uv_t, ok = _np_project(cam, Rcw[cams], tcw[cams], np.tile(lm[t_i], (len(cams), 1)))
        inb = (
            (uv_t[:, 0] > 1) & (uv_t[:, 0] < W - 2)
            & (uv_t[:, 1] > 1) & (uv_t[:, 1] < H - 2) & ok
        )
        if not np.all(inb):
            keep[t_i] = False
            continue
        obs_img[t_i, : len(cams)] = cams
        obs_uv[t_i, : len(cams)] = uv_t + rng.normal(scale=0.2, size=uv_t.shape)
        obs_valid[t_i, : len(cams)] = True
    ts = TrackSet(
        obs_img=obs_img[keep], obs_kp=np.zeros_like(obs_img[keep]),
        obs_uv=obs_uv[keep], obs_valid=obs_valid[keep],
        num_obs=obs_valid[keep].sum(1), stats={},
    )
    return cam, ts, depth_maps, Rcw, tcw, lm[keep]


class TestDepthFusedPath:
    def test_depth_candidate_selected_and_accurate(self):
        """3 views/track: DLT needs >= 4 distinct images, so the depth
        candidate is the only one — it must be selected and verified."""
        cam, ts, depth_maps, Rcw, tcw, lm = _make_fixture(n_obs_per_track=3)
        fr = fuse_tracks(cam, ts, depth_maps, Rcw, tcw)
        ok = np.asarray(fr.ok)
        from_tri = np.asarray(fr.from_tri)
        depth_selected = int(ok.sum() - from_tri.sum())
        assert ok.sum() >= 0.8 * lm.shape[0]
        assert depth_selected == int(ok.sum())          # all from depth
        assert depth_selected > 10
        Xw = np.asarray(fr.Xw)[ok]
        err = np.linalg.norm(Xw - lm[ok], axis=1)
        assert err.max() < 0.05                          # on the 10 m plane
        assert err.mean() < 0.02

    def test_depth_wins_on_error_when_both_valid(self):
        """6 views/track: both candidates valid; with exact LiDAR depth and
        noisy keypoints the depth candidate frequently reprojects better —
        the selection rule (:1163-1205) must pick SOME depth candidates and
        every selected point must still be accurate."""
        cam, ts, depth_maps, Rcw, tcw, lm = _make_fixture(
            n_obs_per_track=5, n_tracks=60, seed=1
        )
        fr = fuse_tracks(cam, ts, depth_maps, Rcw, tcw)
        ok = np.asarray(fr.ok)
        assert ok.sum() >= 0.8 * lm.shape[0]
        Xw = np.asarray(fr.Xw)[ok]
        err = np.linalg.norm(Xw - lm[ok], axis=1)
        assert err.mean() < 0.05
        # both branches exercised across the track population
        n_tri = int(np.asarray(fr.from_tri).sum())
        n_depth = int(ok.sum()) - n_tri
        assert n_depth > 0, "depth-fused candidate never selected"

    def test_bilinear_validity_matches_camera_module(self):
        """tracks.fuse._bilinear_depth_host must agree with the
        reference-parity fetch_depth_bilinear (utils.hpp:246-274) on
        validity and value."""
        from global_lvba_tpu.geometry.camera import fetch_depth_bilinear
        from global_lvba_tpu.tracks.fuse import _bilinear_depth_host

        rng = np.random.default_rng(2)
        H, W = 40, 50
        depth = rng.uniform(0.5, 5.0, size=(1, H, W)).astype(np.float32)
        # punch holes so the all-four-corners-positive rule matters
        depth[0, 10:12, 10:12] = 0.0
        uv = rng.uniform(-2, max(H, W) + 2, size=(200, 2)).astype(np.float32)
        img = np.zeros(200, np.int32)
        d1, v1 = _bilinear_depth_host(
            depth, img, uv, np.ones(200, bool),
        )
        d2, v2 = fetch_depth_bilinear(jnp.asarray(depth[0]), jnp.asarray(uv))
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
        sel = np.asarray(v1)
        np.testing.assert_allclose(
            np.asarray(d1)[sel], np.asarray(d2)[sel], rtol=1e-6
        )
