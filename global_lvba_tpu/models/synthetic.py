"""Synthetic LiDAR-visual scenes for tests and benchmarks.

The reference repo ships no tests and no benchmark data (SURVEY.md §4/§6);
ground-truth validation therefore runs on generated scenes: a room of
planes observed from a smooth trajectory, with known poses, so BA accuracy
(pose recovery / ATE) is checkable exactly.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import numpy as np


@dataclasses.dataclass
class PlaneScene:
    points_body: np.ndarray   # (N, 3) f32 — per-point body-frame coords
    frame_ids: np.ndarray     # (N,) i32
    R_true: np.ndarray        # (W, 3, 3) f64
    p_true: np.ndarray        # (W, 3) f64
    planes_n: np.ndarray      # (P, 3) plane unit normals
    planes_d: np.ndarray      # (P,) plane offsets (n·x + d = 0)
    times: np.ndarray         # (W,) f64 frame timestamps


def _rot_z(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], dtype=np.float64)


def _small_rotation(rng, scale):
    w = rng.normal(scale=scale, size=3)
    theta = np.linalg.norm(w)
    if theta < 1e-12:
        return np.eye(3)
    k = w / theta
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return np.eye(3) + np.sin(theta) * K + (1 - np.cos(theta)) * (K @ K)


def make_plane_scene(
    num_frames: int = 10,
    points_per_frame: int = 2000,
    num_planes: int = 6,
    extent: float = 8.0,
    noise: float = 0.005,
    traj_radius: float = 2.0,
    seed: int = 0,
    dt: float = 0.1,
) -> PlaneScene:
    """A box-room of planes scanned from a circular arc trajectory."""
    rng = np.random.default_rng(seed)
    e = extent / 2.0
    # 6 axis-aligned walls of a box, plus extra tilted planes if requested
    normals = [
        np.array([1.0, 0, 0]), np.array([-1.0, 0, 0]),
        np.array([0, 1.0, 0]), np.array([0, -1.0, 0]),
        np.array([0, 0, 1.0]), np.array([0, 0, -1.0]),
    ]
    offsets = [e, e, e, e, e, e]
    for _ in range(max(0, num_planes - 6)):
        n = rng.normal(size=3)
        n /= np.linalg.norm(n)
        normals.append(n)
        offsets.append(rng.uniform(1.0, e))
    normals = np.stack(normals[:num_planes])
    offsets = np.array(offsets[:num_planes])

    R_true = np.zeros((num_frames, 3, 3))
    p_true = np.zeros((num_frames, 3))
    for i in range(num_frames):
        ang = 0.15 * i
        R_true[i] = _rot_z(ang) @ _small_rotation(rng, 0.02)
        p_true[i] = np.array(
            [traj_radius * np.cos(ang) - traj_radius, traj_radius * np.sin(ang), 0.05 * np.sin(0.5 * i)]
        )

    pts_body = []
    fids = []
    per_plane = points_per_frame // num_planes
    for i in range(num_frames):
        pw_all = []
        for pi in range(num_planes):
            n = normals[pi]
            d = offsets[pi]
            # orthonormal basis of the plane
            a = np.array([1.0, 0, 0]) if abs(n[0]) < 0.9 else np.array([0, 1.0, 0])
            t1 = np.cross(n, a); t1 /= np.linalg.norm(t1)
            t2 = np.cross(n, t1)
            uv = rng.uniform(-e, e, size=(per_plane, 2))
            X = (-d) * n[None, :] + uv[:, 0:1] * t1[None, :] + uv[:, 1:2] * t2[None, :]
            pw_all.append(X)
        pw = np.concatenate(pw_all)
        pb = (R_true[i].T @ (pw - p_true[i]).T).T
        pb += rng.normal(scale=noise, size=pb.shape)
        pts_body.append(pb.astype(np.float32))
        fids.append(np.full(pb.shape[0], i, dtype=np.int32))

    return PlaneScene(
        points_body=np.concatenate(pts_body),
        frame_ids=np.concatenate(fids),
        R_true=R_true,
        p_true=p_true,
        planes_n=normals,
        planes_d=offsets,
        times=np.arange(num_frames, dtype=np.float64) * dt,
    )


def make_corridor_scene(
    num_frames: int = 512,
    points_per_frame: int = 2000,
    speed: float = 0.12,
    sensor_range: float = 3.0,
    width: float = 3.0,
    height: float = 2.5,
    noise: float = 0.005,
    seed: int = 0,
    dt: float = 0.1,
) -> PlaneScene:
    """A long corridor scanned by a forward-moving trajectory.

    Each frame only sees the corridor walls/floor/ceiling within
    `sensor_range` of its position, so a voxel is observed by just the
    ~2*sensor_range/speed nearby frames: SPARSE factor coupling
    (K ≪ W), the opposite regime from make_plane_scene's box room where
    every frame couples with every other.  This is the regime of real
    long trajectories and the one the matrix-free LM path targets.

    Transverse "bulkhead" planes (door frames / pillars) every
    `bulkhead_every` meters constrain the along-corridor direction —
    without them x-translation is a per-frame gauge freedom and BA
    diverges."""
    rng = np.random.default_rng(seed)
    bulkhead_every = 2.0
    # 4 corridor planes: walls y = ±width/2, floor z = 0, ceiling z = height
    normals = np.array([
        [0.0, 1.0, 0.0], [0.0, -1.0, 0.0],
        [0.0, 0.0, 1.0], [0.0, 0.0, -1.0],
    ])
    offsets = np.array([-width / 2.0, -width / 2.0, 0.0, height])

    R_true = np.zeros((num_frames, 3, 3))
    p_true = np.zeros((num_frames, 3))
    for i in range(num_frames):
        R_true[i] = _rot_z(0.02 * np.sin(0.11 * i)) @ _small_rotation(rng, 0.01)
        p_true[i] = np.array([
            speed * i, 0.25 * np.sin(0.05 * i), 1.2 + 0.05 * np.sin(0.3 * i)
        ])

    pts_body = []
    fids = []
    per_plane = points_per_frame // 5
    for i in range(num_frames):
        x0 = p_true[i][0]
        xs = rng.uniform(x0 - sensor_range, x0 + sensor_range,
                         size=(4, per_plane))
        pw_all = [
            np.stack([xs[0], np.full(per_plane, width / 2.0),
                      rng.uniform(0, height, per_plane)], axis=1),
            np.stack([xs[1], np.full(per_plane, -width / 2.0),
                      rng.uniform(0, height, per_plane)], axis=1),
            np.stack([xs[2], rng.uniform(-width / 2, width / 2, per_plane),
                      np.zeros(per_plane)], axis=1),
            np.stack([xs[3], rng.uniform(-width / 2, width / 2, per_plane),
                      np.full(per_plane, height)], axis=1),
        ]
        # bulkheads within range: transverse planes spanning the full
        # cross-section (partition walls with doorways, shelving faces)
        b_lo = int(np.ceil((x0 - sensor_range) / bulkhead_every))
        b_hi = int(np.floor((x0 + sensor_range) / bulkhead_every))
        bxs = [b * bulkhead_every for b in range(b_lo, b_hi + 1)]
        if bxs:
            nb = max(1, per_plane // len(bxs))
            for bx in bxs:
                yy = rng.uniform(-width / 2, width / 2, nb)
                zz = rng.uniform(0, height, nb)
                pw_all.append(np.stack([np.full(nb, bx), yy, zz], axis=1))
        pw = np.concatenate(pw_all)
        pb = (R_true[i].T @ (pw - p_true[i]).T).T
        pb += rng.normal(scale=noise, size=pb.shape)
        pts_body.append(pb.astype(np.float32))
        fids.append(np.full(pb.shape[0], i, dtype=np.int32))

    return PlaneScene(
        points_body=np.concatenate(pts_body),
        frame_ids=np.concatenate(fids),
        R_true=R_true,
        p_true=p_true,
        planes_n=normals,
        planes_d=offsets,
        times=np.arange(num_frames, dtype=np.float64) * dt,
    )


def perturb_poses(
    R: np.ndarray, p: np.ndarray, rot_scale: float, trans_scale: float, seed: int = 1
) -> Tuple[np.ndarray, np.ndarray]:
    """Apply random right-multiplicative rotation + translation noise."""
    rng = np.random.default_rng(seed)
    W = R.shape[0]
    R_out = np.array(R, copy=True)
    p_out = np.array(p, copy=True)
    for i in range(W):
        R_out[i] = R[i] @ _small_rotation(rng, rot_scale)
        p_out[i] = p[i] + rng.normal(scale=trans_scale, size=3)
    return R_out, p_out


def perturb_poses_drift(
    R: np.ndarray, p: np.ndarray, rot_rate: float, trans_rate: float,
    seed: int = 1,
) -> Tuple[np.ndarray, np.ndarray]:
    """Odometry-style ACCUMULATED drift: each step's relative pose gets a
    small random error that integrates along the trajectory (frame-i error
    grows ~ sqrt(i)) — the error model of real LIVO odometry input
    (the reference consumes FAST-LIVO2 trajectories, README.md:1-8), where
    global BA must remove low-frequency drift via loop closure rather than
    i.i.d. jitter (perturb_poses)."""
    rng = np.random.default_rng(seed)
    W = R.shape[0]
    R_out = np.array(R, copy=True)
    p_out = np.array(p, copy=True)
    for i in range(1, W):
        R_rel = R[i - 1].T @ R[i]
        p_rel = R[i - 1].T @ (p[i] - p[i - 1])
        R_rel = R_rel @ _small_rotation(rng, rot_rate)
        p_rel = p_rel + rng.normal(scale=trans_rate, size=3)
        R_out[i] = R_out[i - 1] @ R_rel
        p_out[i] = p_out[i - 1] + R_out[i - 1] @ p_rel
    return R_out, p_out


def ate_rmse(p_est: np.ndarray, p_ref: np.ndarray, align: bool = True) -> float:
    """Absolute trajectory error RMSE after optional SE(3) (Umeyama) alignment."""
    a = np.asarray(p_est, dtype=np.float64)
    b = np.asarray(p_ref, dtype=np.float64)
    if align:
        ca, cb = a.mean(0), b.mean(0)
        A, B = a - ca, b - cb
        U, _, Vt = np.linalg.svd(A.T @ B)
        S = np.eye(3)
        if np.linalg.det(U @ Vt) < 0:
            S[2, 2] = -1
        Rali = (U @ S @ Vt).T
        a = (Rali @ A.T).T + cb
        b = B + cb
    return float(np.sqrt(np.mean(np.sum((a - b) ** 2, axis=1))))


# ---------------------------------------------------------------------------
# Joint LiDAR-visual scene
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class JointScene:
    lidar: PlaneScene
    cam: "object"                 # CameraModel
    image_times: np.ndarray       # (M,)
    image_frame: np.ndarray       # (M,) lidar frame index per image
    keypoints: list               # per image (K_i, 2) float32 pixel coords
    matches: dict                 # {(i, j): (m, 2) int32}
    kp_landmark: list             # per image (K_i,) landmark id (ground truth)
    landmarks: np.ndarray         # (L, 3) world feature points
    Rci: np.ndarray               # camera <- body rotation
    tci: np.ndarray


def make_joint_scene(
    num_frames: int = 30,
    points_per_frame: int = 12000,
    num_landmarks: int = 1500,
    image_stride: int = 1,
    px_noise: float = 0.3,
    cam=None,
    seed: int = 0,
    pair_window: int = 10,
    lidar_noise: float = 0.004,
) -> JointScene:
    """LiDAR plane scene + camera observations of plane-borne landmarks.

    Cameras sit on the body with a forward-looking extrinsic
    (z_cam = x_body); landmarks are sampled on the scene planes, projected
    into every image, perturbed by px_noise, and matched between image
    pairs within `pair_window` — emulating the reference's input
    (COLMAP-verified matches + per-frame LiDAR clouds)."""
    from ..geometry.camera import CameraModel, project_cam_to_pixel
    import jax.numpy as jnp

    rng = np.random.default_rng(seed + 100)
    scene = make_plane_scene(
        num_frames=num_frames, points_per_frame=points_per_frame,
        noise=lidar_noise, seed=seed,
    )
    if cam is None:
        # wide FOV (~±47°) so wall-borne landmarks stay visible across frames
        cam = CameraModel(
            fx=110.0, fy=110.0, cx=120.0, cy=96.0,
            k1=-0.05, k2=0.08, p1=-0.001, p2=0.0005, width=240, height=192,
        )
    Rci = np.array([[0.0, -1.0, 0.0], [0.0, 0.0, -1.0], [1.0, 0.0, 0.0]])
    tci = np.array([0.02, 0.01, -0.01])

    # landmarks on the scene planes
    e = 4.0
    L = num_landmarks
    lms = []
    P = scene.planes_n.shape[0]
    for i in range(L):
        k = i % P
        n, d = scene.planes_n[k], scene.planes_d[k]
        a = np.array([1.0, 0, 0]) if abs(n[0]) < 0.9 else np.array([0, 1.0, 0])
        t1 = np.cross(n, a); t1 /= np.linalg.norm(t1)
        t2 = np.cross(n, t1)
        uv = rng.uniform(-e, e, 2)
        lms.append(-d * n + uv[0] * t1 + uv[1] * t2)
    landmarks = np.stack(lms)

    image_frame = np.arange(0, num_frames, image_stride)
    image_times = scene.times[image_frame]
    keypoints = []
    kp_landmark = []
    for fi in image_frame:
        Rcw = Rci @ scene.R_true[fi].T
        tcw = -Rcw @ scene.p_true[fi] + tci
        Xc = (Rcw @ landmarks.T).T + tcw
        uv, Z, valid = project_cam_to_pixel(cam, jnp.asarray(Xc))
        uv = np.array(uv)
        valid = np.array(valid) & (np.array(Z) > 0.5) & (np.array(Z) < 40.0)
        inb = (
            (uv[:, 0] >= 2) & (uv[:, 0] < cam.width - 2)
            & (uv[:, 1] >= 2) & (uv[:, 1] < cam.height - 2)
        )
        vis = np.flatnonzero(valid & inb)
        perm = rng.permutation(vis.shape[0])
        vis = vis[perm]
        kps = uv[vis] + rng.normal(scale=px_noise, size=(vis.shape[0], 2))
        keypoints.append(kps.astype(np.float32))
        kp_landmark.append(vis.astype(np.int64))

    matches = {}
    M = len(image_frame)
    for i in range(M):
        for j in range(i + 1, min(i + 1 + pair_window, M)):
            li = kp_landmark[i]
            lj = kp_landmark[j]
            common, ia, ja = np.intersect1d(li, lj, return_indices=True)
            if common.shape[0]:
                matches[(i, j)] = np.stack([ia, ja], axis=-1).astype(np.int32)

    return JointScene(
        lidar=scene,
        cam=cam,
        image_times=image_times,
        image_frame=image_frame,
        keypoints=keypoints,
        matches=matches,
        kp_landmark=kp_landmark,
        landmarks=landmarks,
        Rci=Rci,
        tci=tci,
    )


# ---------------------------------------------------------------------------
# Textured ray-cast rendering (SIFT-frontend fixture)
# ---------------------------------------------------------------------------
# High-entropy procedural imagery of the synthetic plane scenes: each pixel
# ray-casts the scene's planes through the full distorted camera model and
# samples a multi-octave value-noise texture at the world hit point.  This
# replaces the 15 cm hashed-cell LiDAR-splat texture of the round-2 ladder
# fixture, whose flat cells starved keypoint detection (20 tracks from 40
# images) — the reference's SiftGPU frontend is exercised on real imagery
# (/root/reference/src/lvba_system.cpp:687-833); this is the closest
# geometry-faithful stand-in available without real data.


def _hash01(ix, iy, iz, seed):
    """Deterministic lattice hash -> [0, 1) (uint32 wrap-around math)."""
    n = (
        ix * np.uint32(374761393)
        + iy * np.uint32(668265263)
        + iz * np.uint32(2246822519)
        + np.uint32(seed) * np.uint32(974711)
    )
    n = (n ^ (n >> np.uint32(13))) * np.uint32(1274126177)
    return ((n ^ (n >> np.uint32(16))) & np.uint32(0xFFFFFF)).astype(
        np.float32
    ) / np.float32(1 << 24)


def _value_noise(X, scale, seed):
    """Smooth trilinear value noise over an integer lattice at `scale`."""
    Xs = X * scale
    i0 = np.floor(Xs)
    f = (Xs - i0).astype(np.float32)
    f = f * f * (3.0 - 2.0 * f)                       # smoothstep
    iu = (i0.astype(np.int64) & 0xFFFFFFFF).astype(np.uint32)
    ix, iy, iz = iu[..., 0], iu[..., 1], iu[..., 2]
    one = np.uint32(1)
    acc = np.zeros(X.shape[:-1], np.float32)
    for dx in (0, 1):
        wx = f[..., 0] if dx else 1.0 - f[..., 0]
        for dy in (0, 1):
            wy = f[..., 1] if dy else 1.0 - f[..., 1]
            for dz in (0, 1):
                wz = f[..., 2] if dz else 1.0 - f[..., 2]
                h = _hash01(ix + (one if dx else 0), iy + (one if dy else 0),
                            iz + (one if dz else 0), seed)
                acc += wx * wy * wz * h
    return acc


def _multi_octave_noise(X, octaves, base_scale, seed):
    acc = np.zeros(X.shape[:-1], np.float32)
    wsum = 0.0
    for o in range(octaves):
        w = 0.5 ** o
        acc += w * _value_noise(X, base_scale * (2.0 ** o), seed + o)
        wsum += w
    return acc / wsum


def render_textured_views(
    scene: PlaneScene,
    cam,
    Rcw: np.ndarray,
    tcw: np.ndarray,
    octaves: int = 5,
    base_scale: float = 4.0,
    seed: int = 0,
    return_depth: bool = False,
):
    """Ray-cast grayscale renders (M, H, W) float32 in [0, 1] of the
    scene's planes through the distorted camera model `cam`.

    Per-pixel rays come from undistort_pixel_to_normalized (the same
    8-iteration fixed point as the engine), so rendered keypoints are
    consistent with the projection model the BA optimizes.  With
    return_depth, also returns the (M, H, W) z-depth of each hit —
    ground truth for depth-fusion and match-verification tests."""
    from ..geometry.camera import undistort_pixel_to_normalized

    import jax.numpy as jnp

    H, W = cam.height, cam.width
    uu, vv = np.meshgrid(
        np.arange(W, dtype=np.float64) + 0.5,
        np.arange(H, dtype=np.float64) + 0.5,
    )
    uv = np.stack([uu.ravel(), vv.ravel()], axis=-1)
    xy, ok = undistort_pixel_to_normalized(cam, jnp.asarray(uv))
    xy = np.asarray(xy, np.float64)
    ok = np.asarray(ok)
    d_c = np.concatenate([xy, np.ones((xy.shape[0], 1))], axis=-1)
    n = np.asarray(scene.planes_n, np.float64)
    d0 = np.asarray(scene.planes_d, np.float64)
    M = len(Rcw)
    imgs = np.zeros((M, H, W), np.float32)
    depths = np.zeros((M, H, W), np.float32) if return_depth else None
    for m in range(M):
        C = -np.asarray(Rcw[m]).T @ np.asarray(tcw[m])
        dw = d_c @ np.asarray(Rcw[m])                  # Rcwᵀ · d_c per pixel
        denom = dw @ n.T                               # (N, P)
        tnum = -(C @ n.T + d0)                         # (P,)
        with np.errstate(divide="ignore", invalid="ignore"):
            t = tnum[None, :] / denom
        t = np.where(t > 1e-6, t, np.inf)
        pi = np.argmin(t, axis=1)
        tmin = t[np.arange(t.shape[0]), pi]
        hit = np.isfinite(tmin) & ok
        X = C[None, :] + dw * np.where(hit, tmin, 0.0)[:, None]
        val = _multi_octave_noise(X, octaves, base_scale, seed)
        # mild per-plane albedo so plane borders carry edges too
        shade = 0.75 + 0.25 * (((pi.astype(np.uint32) * np.uint32(2654435761))
                                % np.uint32(97)).astype(np.float32) / 97.0)
        img = np.where(hit, (0.25 + 0.6 * val) * shade, 0.05)
        imgs[m] = img.reshape(H, W).astype(np.float32)
        if return_depth:
            z = np.where(hit, tmin, 0.0)  # d_c has unit z -> ray t IS z-depth
            depths[m] = z.reshape(H, W).astype(np.float32)
    if return_depth:
        return imgs, depths
    return imgs
