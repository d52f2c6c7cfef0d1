import numpy as np
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation

from global_lvba_tpu.geometry import exp_so3, log_so3, hat, jr, jr_inv
from global_lvba_tpu.geometry.se3 import compose, inverse, relative, apply, boxplus_pose
from global_lvba_tpu.geometry.camera import (
    CameraModel,
    distort_normalized,
    project_cam_to_pixel,
    undistort_pixel_to_normalized,
    back_project_pixel_depth,
    cam_to_world,
    fetch_depth_bilinear,
)


def rand_rotvecs(n, scale=2.0, seed=0):
    rng = np.random.default_rng(seed)
    return rng.normal(scale=scale, size=(n, 3))


class TestSO3:
    def test_exp_matches_scipy(self):
        w = rand_rotvecs(100)
        R = np.asarray(exp_so3(jnp.asarray(w)))
        R_ref = Rotation.from_rotvec(w).as_matrix()
        np.testing.assert_allclose(R, R_ref, atol=1e-12)

    def test_exp_small_angles(self):
        w = rand_rotvecs(50, scale=1e-8)
        R = np.asarray(exp_so3(jnp.asarray(w)))
        R_ref = Rotation.from_rotvec(w).as_matrix()
        np.testing.assert_allclose(R, R_ref, atol=1e-14)

    def test_log_roundtrip(self):
        # restrict to |w| < pi where log is the unique inverse of exp
        w = rand_rotvecs(200, scale=1.0)
        norms = np.linalg.norm(w, axis=1, keepdims=True)
        w = w / norms * (np.pi * 0.95) * np.tanh(norms)
        w_rt = np.asarray(log_so3(exp_so3(jnp.asarray(w))))
        np.testing.assert_allclose(w_rt, w, atol=1e-9)

    def test_log_near_pi(self):
        rng = np.random.default_rng(3)
        axes = rng.normal(size=(50, 3))
        axes /= np.linalg.norm(axes, axis=1, keepdims=True)
        w = axes * (np.pi - 1e-5)
        R = Rotation.from_rotvec(w).as_matrix()
        w_rt = np.array(log_so3(jnp.asarray(R)))
        R_rt = Rotation.from_rotvec(w_rt).as_matrix()
        np.testing.assert_allclose(R_rt, R, atol=1e-6)

    def test_hat(self):
        v = np.array([1.0, 2.0, 3.0])
        x = np.array([0.5, -1.0, 2.0])
        np.testing.assert_allclose(
            np.asarray(hat(jnp.asarray(v))) @ x, np.cross(v, x), atol=1e-15
        )

    def test_jr_consistency(self):
        # Exp(w + dw) ≈ Exp(w) Exp(Jr(w) dw)
        w = np.array([0.3, -0.5, 0.7])
        dw = np.array([1e-5, -2e-5, 1.5e-5])
        lhs = Rotation.from_rotvec(w + dw).as_matrix()
        Jr = np.asarray(jr(jnp.asarray(w)))
        rhs = (
            Rotation.from_rotvec(w).as_matrix()
            @ Rotation.from_rotvec(Jr @ dw).as_matrix()
        )
        np.testing.assert_allclose(lhs, rhs, atol=1e-12)

    def test_jr_inv(self):
        w = jnp.asarray(np.array([0.4, 0.1, -0.9]))
        np.testing.assert_allclose(
            np.asarray(jr(w) @ jr_inv(w)), np.eye(3), atol=1e-12
        )


class TestSE3:
    def test_compose_inverse(self):
        rng = np.random.default_rng(0)
        Ra = Rotation.random(5, random_state=1).as_matrix()
        pa = rng.normal(size=(5, 3))
        Ri, pi = inverse(jnp.asarray(Ra), jnp.asarray(pa))
        Rc, pc = compose(jnp.asarray(Ra), jnp.asarray(pa), Ri, pi)
        np.testing.assert_allclose(np.asarray(Rc), np.tile(np.eye(3), (5, 1, 1)), atol=1e-12)
        np.testing.assert_allclose(np.asarray(pc), 0, atol=1e-12)

    def test_relative(self):
        rng = np.random.default_rng(0)
        Ra = Rotation.random(4, random_state=2).as_matrix()
        pa = rng.normal(size=(4, 3))
        Rb = Rotation.random(4, random_state=3).as_matrix()
        pb = rng.normal(size=(4, 3))
        Rr, pr = relative(jnp.asarray(Ra), jnp.asarray(pa), jnp.asarray(Rb), jnp.asarray(pb))
        # a ∘ rel == b
        Rc, pc = compose(jnp.asarray(Ra), jnp.asarray(pa), Rr, pr)
        np.testing.assert_allclose(np.asarray(Rc), Rb, atol=1e-12)
        np.testing.assert_allclose(np.asarray(pc), pb, atol=1e-12)

    def test_boxplus_zero(self):
        R = Rotation.random(3, random_state=4).as_matrix()
        p = np.zeros((3, 3))
        R2, p2 = boxplus_pose(jnp.asarray(R), jnp.asarray(p), jnp.zeros((3, 6)))
        np.testing.assert_allclose(np.asarray(R2), R, atol=1e-15)


CAM = CameraModel(
    fx=1293.56944 * 0.5, fy=1293.3155 * 0.5, cx=626.91359 * 0.5, cy=522.799224 * 0.5,
    k1=-0.076160, k2=0.123001, p1=-0.00113, p2=0.000251, width=640, height=512,
)


class TestCamera:
    def test_undistort_roundtrip(self):
        # distort ∘ undistort ≈ id (reference fixed-point, utils.hpp:207-233)
        rng = np.random.default_rng(0)
        uv = np.stack(
            [rng.uniform(50, 590, size=200), rng.uniform(50, 460, size=200)], axis=-1
        )
        xy, valid = undistort_pixel_to_normalized(CAM, jnp.asarray(uv))
        assert bool(jnp.all(valid))
        xyd = distort_normalized(CAM, xy)
        uv_rt = np.stack(
            [CAM.fx * np.asarray(xyd)[:, 0] + CAM.cx, CAM.fy * np.asarray(xyd)[:, 1] + CAM.cy],
            axis=-1,
        )
        np.testing.assert_allclose(uv_rt, uv, atol=1e-6)

    def test_project_backproject(self):
        rng = np.random.default_rng(1)
        # keep normalized coords within the distortion model's valid region
        z = rng.uniform(2, 10, 100)
        Xc = np.stack(
            [rng.uniform(-0.4, 0.4, 100) * z, rng.uniform(-0.35, 0.35, 100) * z, z],
            axis=-1,
        )
        uv, Z, valid = project_cam_to_pixel(CAM, jnp.asarray(Xc))
        assert bool(jnp.all(valid))
        Xc_rt, v2 = back_project_pixel_depth(CAM, uv, Z)
        np.testing.assert_allclose(np.asarray(Xc_rt), Xc, atol=1e-6)

    def test_negative_depth_invalid(self):
        Xc = jnp.asarray([[0.0, 0.0, -1.0], [0.0, 0.0, 0.0]])
        _, _, valid = project_cam_to_pixel(CAM, Xc)
        assert not bool(valid[0]) and not bool(valid[1])

    def test_cam_to_world_roundtrip(self):
        rng = np.random.default_rng(2)
        Rcw = Rotation.random(1, random_state=5).as_matrix()[0]
        tcw = rng.normal(size=3)
        Xw = rng.normal(size=(10, 3))
        Xc = (Rcw @ Xw.T).T + tcw
        Xw_rt = cam_to_world(jnp.asarray(Xc), jnp.asarray(Rcw), jnp.asarray(tcw))
        np.testing.assert_allclose(np.asarray(Xw_rt), Xw, atol=1e-12)

    def test_fetch_depth_bilinear(self):
        depth = np.ones((8, 8), dtype=np.float64) * 2.0
        depth[3, 3] = 4.0
        d, valid = fetch_depth_bilinear(
            jnp.asarray(depth), jnp.asarray([[3.5, 3.0], [0.5, 0.5], [7.5, 7.5]])
        )
        assert bool(valid[0]) and bool(valid[1])
        assert not bool(valid[2])  # out of bounds (u >= W-1)
        np.testing.assert_allclose(float(d[0]), 3.0)
        # zero-depth corner invalidates the sample
        depth[0, 0] = 0.0
        d2, v2 = fetch_depth_bilinear(jnp.asarray(depth), jnp.asarray([[0.5, 0.5]]))
        assert not bool(v2[0])
