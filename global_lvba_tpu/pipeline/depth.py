"""World grid map, per-image covisible voxel sets, and LiDAR depth rendering.

Replicates buildGridMapFromOptimized + generateDepthWithVoxel
(/root/reference/src/lvba_system.cpp:835-919, 1266-1338):

  * a 0.5 m world voxel grid over all optimized-pose-transformed LiDAR
    points (voxel -> point list, here a sorted CSR over packed keys);
  * per image, the union of voxel sets of LiDAR frames within ±0.5 s of the
    image timestamp selects the covisible points;
  * those points are projected through the distorted pinhole model and
    z-buffered to a min-depth map per integer pixel (Z >= 1e-3 gate).

The z-buffer rasterizes on the HOST (np.minimum.at per pixel): the points
already live host-side in the grid map and the maps feed host PNG export
and bilinear depth fetch; a device scatter-min cost ~335 ms/image through
the remote-TPU link (uploads + serialized scatter).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.camera import CameraModel
from ..map.voxelize import pack_voxel_keys

GRID_VOX = 0.5   # lvba_system.cpp:1277
HALF_W = 0.5     # ±0.5 s covisibility window (:1300)


@dataclasses.dataclass
class GridMap:
    """Sorted-CSR world grid: keys (Nv,) ascending; points grouped by voxel."""

    keys: np.ndarray           # (Nv,) int64 sorted unique voxel keys
    starts: np.ndarray         # (Nv,) int64 offsets into points
    counts: np.ndarray         # (Nv,) int64
    points: np.ndarray         # (N, 3) float32 world points, voxel-grouped
    frame_voxel_keys: List[np.ndarray]  # per frame, sorted unique keys


def build_grid_map(
    clouds: Sequence[np.ndarray],
    R: np.ndarray,
    p: np.ndarray,
    voxel: float = GRID_VOX,
) -> GridMap:
    from ..map.voxelize import _argsort_keys

    try:
        from ..native import runtime as _nat
    except Exception:
        _nat = None

    world_all = []
    fkeys = []
    for i, c in enumerate(clouds):
        w = (R[i] @ c.T).T + p[i]
        world_all.append(w.astype(np.float32))
        k = None
        if _nat is not None:
            k = _nat.voxel_keys64(w, voxel)
        if k is None:
            k = pack_voxel_keys(np.floor(w / voxel).astype(np.int64))
        fkeys.append(np.unique(k))
    world = np.concatenate(world_all)
    w64 = world.astype(np.float64)
    keys = _nat.voxel_keys64(w64, voxel) if _nat is not None else None
    if keys is None:
        keys = pack_voxel_keys(np.floor(w64 / voxel).astype(np.int64))
    order = _argsort_keys(keys)
    sk = keys[order]
    firsts = np.concatenate([[True], sk[1:] != sk[:-1]])
    starts = np.flatnonzero(firsts)
    counts = np.diff(np.append(starts, sk.shape[0]))
    return GridMap(
        keys=sk[starts],
        starts=starts.astype(np.int64),
        counts=counts.astype(np.int64),
        points=world[order],
        frame_voxel_keys=fkeys,
    )


def covisible_voxels(
    gm: GridMap, lidar_times: np.ndarray, image_time: float, half_w: float = HALF_W
) -> np.ndarray:
    """Union of voxel-key sets of LiDAR frames within ±half_w of the image."""
    lo = np.searchsorted(lidar_times, image_time - half_w, side="left")
    hi = np.searchsorted(lidar_times, image_time + half_w, side="right")
    if hi <= lo:
        return np.zeros(0, dtype=np.int64)
    return np.unique(np.concatenate(gm.frame_voxel_keys[lo:hi]))


def gather_voxel_ranges(
    gm: GridMap, voxel_keys: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """CSR (starts, counts) of the grid-map rows matching the given keys —
    the zero-copy form of gather_voxel_points for consumers that can read
    the voxel-grouped point array in place (native zbuffer_ranges)."""
    pos = np.searchsorted(gm.keys, voxel_keys)
    ok = pos < gm.keys.shape[0]
    pos = pos[ok]
    hit = gm.keys[pos] == voxel_keys[ok]
    pos = pos[hit]
    return gm.starts[pos], gm.counts[pos]


def gather_voxel_points(gm: GridMap, voxel_keys: np.ndarray) -> np.ndarray:
    """All world points belonging to the given voxel keys."""
    pos = np.searchsorted(gm.keys, voxel_keys)
    ok = (pos < gm.keys.shape[0])
    pos = pos[ok]
    sel_keys = voxel_keys[ok]
    hit = gm.keys[pos] == sel_keys
    pos = pos[hit]
    if pos.size == 0:
        return np.zeros((0, 3), dtype=np.float32)
    # vectorized ragged-range expansion: a per-voxel np.arange list costs
    # thousands of small allocations per image and dominated the depth
    # stage at 200 images (~0.5 s/image)
    starts = gm.starts[pos]
    counts = gm.counts[pos]
    total = int(counts.sum())
    ends = np.cumsum(counts)
    within = np.arange(total, dtype=np.int64) - np.repeat(ends - counts, counts)
    idx = np.repeat(starts, counts) + within
    return gm.points[idx]


def _zbuffer_host(cam: CameraModel, Rcw, tcw, pts: np.ndarray) -> np.ndarray:
    """Min-depth z-buffer (H, W) from world points — HOST rasterization.

    Same distorted-pinhole projection as the reference
    (/root/reference/src/lvba_system.cpp:885-901).  This runs on the host
    because the points already live there (grid map), the output feeds
    host PNG/bilinear fetch, and np.minimum.at costs ~3 ms per 900k
    points — the previous device scatter-min spent ~335 ms/image through
    the tunnel on per-image uploads + the serialized TPU scatter (13.4 s
    of a 40-image pipeline)."""
    H, W = cam.height, cam.width
    # f32 throughout: the output is a min depth per INTEGER pixel, and
    # f32 projection at ~10 m range errs by ~1 um
    Xc = pts.astype(np.float32) @ np.asarray(Rcw, np.float32).T + np.asarray(
        tcw, np.float32
    )
    Z = Xc[:, 2]
    sel = Z >= 1e-3
    Xs = Xc[sel]
    Zs = Z[sel]
    x = Xs[:, 0] / Zs
    y = Xs[:, 1] / Zs
    r2 = x * x + y * y
    radial = 1.0 + cam.k1 * r2 + cam.k2 * r2 * r2
    xd = x * radial + 2.0 * cam.p1 * x * y + cam.p2 * (r2 + 2.0 * x * x)
    yd = y * radial + cam.p1 * (r2 + 2.0 * y * y) + 2.0 * cam.p2 * x * y
    with np.errstate(invalid="ignore"):
        uu = np.clip(cam.fx * xd + cam.cx, -2**30, 2**30).astype(np.int32)
        vv = np.clip(cam.fy * yd + cam.cy, -2**30, 2**30).astype(np.int32)
    inb = (uu >= 0) & (uu < W) & (vv >= 0) & (vv < H)
    lin = (vv[inb].astype(np.int64) * W + uu[inb])
    z_in = Zs[inb].astype(np.float32)
    depth = np.full(H * W, np.inf, np.float32)
    np.minimum.at(depth, lin, z_in)         # min depth per pixel
    np.place(depth, ~np.isfinite(depth), 0.0)
    return depth.reshape(H, W)


def render_depth_maps(
    cam: CameraModel,
    gm: GridMap,
    lidar_times: np.ndarray,
    image_times: np.ndarray,
    Rcw_all: np.ndarray,
    tcw_all: np.ndarray,
    half_w: float = HALF_W,
    workers: int = 4,
) -> np.ndarray:
    """Depth maps (M, H, W) float32 for all images.

    Images are independent; a small thread pool overlaps the numpy work
    (sorts/ufuncs release the GIL) — ~2.5x at 200 images on 4 cores."""
    from concurrent.futures import ThreadPoolExecutor

    M = len(image_times)
    out = np.zeros((M, cam.height, cam.width), dtype=np.float32)

    from ..native import runtime as nat

    lib = nat.get_lib()
    use_ranges = lib is not None and hasattr(lib, "lvba_zbuffer_ranges")
    use_native = lib is not None and hasattr(lib, "lvba_zbuffer")
    # voxel-grouped points contiguous once, shared by every image
    pts_f32 = (
        np.ascontiguousarray(gm.points, np.float32) if use_ranges else None
    )

    def one(i):
        vox = covisible_voxels(gm, lidar_times, float(image_times[i]), half_w)
        if use_ranges:
            # rasterize straight from the grid map's CSR rows: the ragged
            # per-image point GATHER (~60 ms at 2M covisible points) was
            # 5x the rasterization itself
            starts, counts = gather_voxel_ranges(gm, vox)
            if counts.size and counts.sum():
                nat.zbuffer_ranges(
                    pts_f32, starts, counts, Rcw_all[i], tcw_all[i], cam,
                    out=out[i],
                )
            return
        pts = gather_voxel_points(gm, vox)
        if pts.shape[0]:
            if use_native:
                # C++ rasterizer (float-exact mirror of _zbuffer_host):
                # the numpy projection chain allocates ~15 temporaries per
                # image and was the bulk of the 200-image depth stage
                nat.zbuffer(pts, Rcw_all[i], tcw_all[i], cam, out=out[i])
            else:
                out[i] = _zbuffer_host(cam, Rcw_all[i], tcw_all[i], pts)

    with ThreadPoolExecutor(max_workers=workers) as ex:
        list(ex.map(one, range(M)))
    return out


def update_camera_poses_from_lidar(
    lidar_times: np.ndarray,
    R_opt: np.ndarray, p_opt: np.ndarray,
    R_orig: np.ndarray, p_orig: np.ndarray,
    image_times: np.ndarray,
    R_cam: np.ndarray, p_cam: np.ndarray,
):
    """Propagate per-frame LiDAR pose deltas to nearest-timestamp camera poses
    (updateCameraPosesFromLidar, lvba_system.cpp:412-446).

    T_cam_new = (T_opt ∘ T_orig⁻¹) ∘ T_cam, nearest LiDAR frame by timestamp.
    """
    M = image_times.shape[0]
    R_out = R_cam.copy()
    p_out = p_cam.copy()
    for i in range(M):
        t = image_times[i]
        idx = np.searchsorted(lidar_times, t)
        if idx >= lidar_times.shape[0]:
            idx = lidar_times.shape[0] - 1
        elif idx > 0:
            if abs(lidar_times[idx - 1] - t) < abs(lidar_times[idx] - t):
                idx = idx - 1
        dR = R_opt[idx] @ R_orig[idx].T
        dp = p_opt[idx] - dR @ p_orig[idx]
        R_out[i] = dR @ R_cam[i]
        p_out[i] = dR @ p_cam[i] + dp
    return R_out, p_out


def camera_world_to_cam(
    Rci: np.ndarray, tci: np.ndarray, R_wi: np.ndarray, p_wi: np.ndarray
):
    """Body(IMU)-world poses -> world->camera extrinsic per image
    (lvba_system.cpp:856-871): Rcw = Rci Rwiᵀ, tcw = -Rcw p_wi + tci."""
    Rcw = np.einsum("ab,mcb->mac", Rci, R_wi)
    tcw = -np.einsum("mab,mb->ma", Rcw, p_wi) + tci
    return Rcw, tcw
