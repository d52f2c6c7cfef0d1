"""Brown-Conrady pinhole camera model (k1, k2, p1, p2), batched.

Re-implements the camera math of /root/reference/include/utils.hpp:169-283
as mask-returning batched JAX ops: where the reference returns `bool` per
point, these return (value, valid_mask) so they vectorize under jit/vmap.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp


class CameraModel(NamedTuple):
    """Intrinsics + distortion. Mirrors lvba::CameraIntrinsics (utils.hpp:158-167)."""

    fx: float
    fy: float
    cx: float
    cy: float
    k1: float = 0.0
    k2: float = 0.0
    p1: float = 0.0
    p2: float = 0.0
    width: int = 0
    height: int = 0

    def scaled(self, s: float) -> "CameraModel":
        """Intrinsics scaled by a resize factor (dataset_io.cpp:59-62)."""
        return self._replace(
            fx=self.fx * s,
            fy=self.fy * s,
            cx=self.cx * s,
            cy=self.cy * s,
            width=int(round(self.width * s)),
            height=int(round(self.height * s)),
        )


def distort_normalized(cam: CameraModel, xy: jnp.ndarray) -> jnp.ndarray:
    """Apply Brown-Conrady distortion to normalized coords (..., 2) -> (..., 2).

    utils.hpp:169-181.
    """
    x, y = xy[..., 0], xy[..., 1]
    r2 = x * x + y * y
    r4 = r2 * r2
    radial = 1.0 + cam.k1 * r2 + cam.k2 * r4
    x_tan = 2.0 * cam.p1 * x * y + cam.p2 * (r2 + 2.0 * x * x)
    y_tan = cam.p1 * (r2 + 2.0 * y * y) + 2.0 * cam.p2 * x * y
    return jnp.stack([x * radial + x_tan, y * radial + y_tan], axis=-1)


def project_cam_to_pixel(
    cam: CameraModel, Xc: jnp.ndarray, z_min: float = 1e-12
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Project camera-frame points (..., 3) -> pixel (..., 2), depth, valid.

    utils.hpp:183-197: invalid when Z <= 1e-12.
    """
    Z = Xc[..., 2]
    valid = Z > z_min
    z_safe = jnp.where(valid, Z, 1.0)
    xy = Xc[..., 0:2] / z_safe[..., None]
    xyd = distort_normalized(cam, xy)
    u = cam.fx * xyd[..., 0] + cam.cx
    v = cam.fy * xyd[..., 1] + cam.cy
    uv = jnp.stack([u, v], axis=-1)
    valid = valid & jnp.all(jnp.isfinite(uv), axis=-1)
    return uv, Z, valid


def project_world_to_pixel(cam, Rcw, tcw, Xw, z_min: float = 1e-12):
    """World points through (Rcw, tcw) then the pinhole model (utils.hpp:199-205)."""
    Xc = (Rcw @ Xw[..., None])[..., 0] + tcw
    return project_cam_to_pixel(cam, Xc, z_min)


def undistort_pixel_to_normalized(
    cam: CameraModel, uv: jnp.ndarray, iters: int = 8
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Invert distortion by fixed-point iteration (8 iters, utils.hpp:207-233)."""
    xd = (uv[..., 0] - cam.cx) / cam.fx
    yd = (uv[..., 1] - cam.cy) / cam.fy
    xu, yu = xd, yd
    for _ in range(iters):
        r2 = xu * xu + yu * yu
        r4 = r2 * r2
        radial = 1.0 + cam.k1 * r2 + cam.k2 * r4
        radial = jnp.where(jnp.abs(radial) < 1e-12, 1e-12, radial)
        x_tan = 2.0 * cam.p1 * xu * yu + cam.p2 * (r2 + 2.0 * xu * xu)
        y_tan = cam.p1 * (r2 + 2.0 * yu * yu) + 2.0 * cam.p2 * xu * yu
        xu = (xd - x_tan) / radial
        yu = (yd - y_tan) / radial
    out = jnp.stack([xu, yu], axis=-1)
    valid = jnp.all(jnp.isfinite(out), axis=-1)
    return out, valid


def back_project_pixel_depth(
    cam: CameraModel, uv: jnp.ndarray, depth: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pixel + metric depth -> camera-frame 3D point (utils.hpp:235-243)."""
    xy, valid = undistort_pixel_to_normalized(cam, uv)
    Xc = jnp.concatenate([xy * depth[..., None], depth[..., None]], axis=-1)
    valid = valid & (depth > 0) & jnp.all(jnp.isfinite(Xc), axis=-1)
    return Xc, valid


def cam_to_world(Xc, Rcw, tcw):
    """Camera-frame -> world given world->camera pose (utils.hpp:277-283)."""
    Rwc = jnp.swapaxes(Rcw, -1, -2)
    return (Rwc @ (Xc - tcw)[..., None])[..., 0]


def fetch_depth_bilinear(
    depth_img: jnp.ndarray, uv: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Bilinear depth lookup; invalid when out of bounds or any corner <= 0.

    Mirrors fetchDepthBilinear (utils.hpp:246-274): all four neighboring
    texels must carry positive depth for the sample to be valid.
    depth_img: (H, W) float; uv: (..., 2) pixel coords. Returns (d, valid).
    """
    H, W = depth_img.shape
    u, v = uv[..., 0], uv[..., 1]
    inb = (u >= 0) & (v >= 0) & (u < W - 1) & (v < H - 1)
    x = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, W - 2)
    y = jnp.clip(jnp.floor(v).astype(jnp.int32), 0, H - 2)
    du = u - x
    dv = v - y
    d00 = depth_img[y, x]
    d10 = depth_img[y, x + 1]
    d01 = depth_img[y + 1, x]
    d11 = depth_img[y + 1, x + 1]
    pos = (d00 > 0) & (d10 > 0) & (d01 > 0) & (d11 > 0)
    d = (1 - du) * (1 - dv) * d00 + du * (1 - dv) * d10 + (1 - du) * dv * d01 + du * dv * d11
    valid = inb & pos & (d > 0)
    return d, valid
