"""Geometry kernel tests vs reference semantics (vslam_math_util.h,
ellipsoid_utils.h) using scipy as the Eigen stand-in oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from obvi_slam_tpu import geometry as geo

RNG = np.random.default_rng(42)


def rand_rotvec(n=8, scale=2.0):
    return RNG.normal(size=(n, 3)) * scale


class TestSO3:
    def test_exp_matches_scipy(self):
        w = rand_rotvec()
        r = np.asarray(geo.exp_so3(jnp.asarray(w)))
        r_ref = Rotation.from_rotvec(w).as_matrix()
        np.testing.assert_allclose(r, r_ref, atol=1e-12)

    def test_exp_small_angle(self):
        w = np.array([[1e-12, -2e-13, 5e-13], [0.0, 0.0, 0.0]])
        r = np.asarray(geo.exp_so3(jnp.asarray(w)))
        np.testing.assert_allclose(r, Rotation.from_rotvec(w).as_matrix(), atol=1e-15)

    def test_log_roundtrip(self):
        w = rand_rotvec()
        w_rt = np.asarray(geo.log_so3(geo.exp_so3(jnp.asarray(w))))
        # log is unique up to 2*pi wraps; inputs kept below pi.
        w_small = np.array([v if np.linalg.norm(v) < np.pi else v * 0.1 for v in w])
        w_rt = np.asarray(geo.log_so3(geo.exp_so3(jnp.asarray(w_small))))
        np.testing.assert_allclose(w_rt, w_small, atol=1e-10)

    def test_log_matches_scipy(self):
        r = Rotation.from_rotvec(rand_rotvec(scale=1.0)).as_matrix()
        w = np.asarray(geo.log_so3(jnp.asarray(r)))
        np.testing.assert_allclose(w, Rotation.from_matrix(r).as_rotvec(), atol=1e-10)

    def test_log_near_identity_grad_safe(self):
        def f(eps):
            return jnp.sum(geo.log_so3(geo.exp_so3(eps)))

        g = jax.grad(f)(jnp.zeros(3))
        assert np.all(np.isfinite(np.asarray(g)))

    def test_exp_grad_safe_at_zero(self):
        g = jax.jacfwd(geo.exp_so3)(jnp.zeros(3))
        assert np.all(np.isfinite(np.asarray(g)))
        # d/dw Exp(w) at 0 is the generator basis (skew).
        np.testing.assert_allclose(
            np.asarray(g)[:, :, 0], geo.skew(jnp.array([1.0, 0, 0])), atol=1e-12
        )

    def test_quat_from_matrix_all_pivots(self):
        # Rotations near pi around each axis exercise all 4 Shepperd branches.
        for axis in np.eye(3):
            r = Rotation.from_rotvec(axis * (np.pi - 1e-3)).as_matrix()
            q = np.asarray(geo.quat_from_matrix(jnp.asarray(r)))
            q_ref = Rotation.from_matrix(r).as_quat()  # [x,y,z,w]
            q_ref = np.concatenate([[q_ref[3]], q_ref[:3]])
            if q_ref[0] < 0:
                q_ref = -q_ref
            np.testing.assert_allclose(q, q_ref, atol=1e-10)


class TestSE3:
    def test_pose_inverse(self):
        pose = jnp.asarray(RNG.normal(size=(5, 6)))
        r, t = geo.pose_to_rt(pose)
        ri, ti = geo.pose_inverse_rt(pose)
        rc, tc = geo.compose_rt(r, t, ri, ti)
        np.testing.assert_allclose(
            np.asarray(rc), np.broadcast_to(np.eye(3), (5, 3, 3)), atol=1e-12
        )
        np.testing.assert_allclose(np.asarray(tc), np.zeros((5, 3)), atol=1e-12)

    def test_pose_between_compose_roundtrip(self):
        p1 = jnp.asarray(RNG.normal(size=(4, 6)))
        p2 = jnp.asarray(RNG.normal(size=(4, 6)))
        rel = geo.pose_between(p1, p2)
        p2_rt = geo.pose_compose(p1, rel)
        r2, t2 = geo.pose_to_rt(p2)
        r2b, t2b = geo.pose_to_rt(p2_rt)
        np.testing.assert_allclose(np.asarray(r2b), np.asarray(r2), atol=1e-10)
        np.testing.assert_allclose(np.asarray(t2b), np.asarray(t2), atol=1e-10)


class TestProjection:
    def test_project_point_rectified(self):
        # Hand-built scene: robot at origin identity, camera = robot frame.
        pose = jnp.zeros(6)
        point = jnp.array([0.5, -0.25, 2.0])
        proj, depth = geo.project_point_rectified(
            pose, point, jnp.eye(3), jnp.zeros(3)
        )
        np.testing.assert_allclose(np.asarray(proj), [0.25, -0.125], atol=1e-14)
        assert float(depth) == pytest.approx(2.0)

    def test_project_with_robot_motion(self):
        # Robot translated +1 in x: point at world x=1 is at camera x=0.
        pose = jnp.array([1.0, 0, 0, 0, 0, 0])
        point = jnp.array([1.0, 0.0, 4.0])
        proj, _ = geo.project_point_rectified(pose, point, jnp.eye(3), jnp.zeros(3))
        np.testing.assert_allclose(np.asarray(proj), [0.0, 0.0], atol=1e-14)

    def test_project_matches_manual_extrinsics(self):
        # Random pose/extrinsics vs a straightforward numpy computation.
        pose = RNG.normal(size=6)
        point = RNG.normal(size=3) + np.array([0, 0, 5.0])
        ext_r = Rotation.from_rotvec(RNG.normal(size=3) * 0.1).as_matrix()
        ext_t = RNG.normal(size=3) * 0.1
        # numpy oracle: p_cam = ext^-1 * pose^-1 * p_world
        rw = Rotation.from_rotvec(pose[3:]).as_matrix()
        p_robot = rw.T @ (point - pose[:3])
        p_cam = ext_r.T @ (p_robot - ext_t)
        expected = p_cam[:2] / p_cam[2]

        cam_r = jnp.asarray(ext_r.T)
        cam_t = jnp.asarray(-ext_r.T @ ext_t)
        proj, _ = geo.project_point_rectified(
            jnp.asarray(pose), jnp.asarray(point), cam_r, cam_t
        )
        np.testing.assert_allclose(np.asarray(proj), expected, atol=1e-12)


class TestEllipsoid:
    def test_sphere_centered_corners(self):
        # Unit-diameter sphere 4m ahead (+z cam), centered: symmetric corners.
        ell = jnp.array([0.0, 0.0, 4.0, 0.0, 1.0, 1.0, 1.0])
        pose = jnp.zeros(6)
        corners, valid = geo.ellipsoid_corners_rectified(
            ell, pose, jnp.eye(3), jnp.zeros(3)
        )
        assert bool(valid)
        c = np.asarray(corners)
        # q33 < 0 for a camera outside the ellipsoid, so (q13+s)/q33 is the
        # MINIMUM — matching the BbCorners order [x_min, x_max, y_min, y_max].
        assert c[0] < 0 < c[1]
        np.testing.assert_allclose(c[0], -c[1], atol=1e-12)
        np.testing.assert_allclose(c[2], -c[3], atol=1e-12)
        # Radius ~ tangent half-angle: r/sqrt(d^2-r^2) with r=0.5(+reg), d=4.
        r2 = 0.25 + geo.DIM_REGULARIZATION
        expected = np.sqrt(r2 / (16.0 - r2))
        np.testing.assert_allclose(c[1], expected, rtol=1e-9)

    def test_dual_quadric_matches_reference_formula(self):
        """Cross-check corners against a direct numpy port of
        ellipsoid_utils.h:160-273 with independent matrix ops."""
        ell = np.array([1.0, -0.5, 6.0, 0.7, 2.0, 1.0, 1.5])
        pose = np.array([0.2, 0.1, -0.3, 0.05, -0.02, 0.1])
        ext_r = Rotation.from_rotvec([0.0, 0.3, 0.0]).as_matrix()
        ext_t = np.array([0.1, 0.0, 0.05])

        # numpy oracle
        rw = Rotation.from_rotvec(pose[3:]).as_matrix()
        world_to_robot = np.eye(4)
        world_to_robot[:3, :3] = rw.T
        world_to_robot[:3, 3] = -rw.T @ pose[:3]
        robot_to_cam = np.eye(4)
        robot_to_cam[:3, :3] = ext_r.T
        robot_to_cam[:3, 3] = -ext_r.T @ ext_t
        world_to_cam = robot_to_cam @ world_to_robot
        ell_pose = np.eye(4)
        ell_pose[:3, :3] = Rotation.from_euler("z", ell[3]).as_matrix()
        ell_pose[:3, 3] = ell[:3]
        combined = (world_to_cam @ ell_pose)[:3, :]  # 3x4 compact
        d = np.diag(
            list((ell[4:7] / 2.0) ** 2 + geo.DIM_REGULARIZATION) + [-1.0]
        )
        q = combined @ d @ combined.T
        sx = np.sqrt(q[0, 2] ** 2 - q[0, 0] * q[2, 2])
        sy = np.sqrt(q[1, 2] ** 2 - q[1, 1] * q[2, 2])
        expected = (
            np.array([q[0, 2] + sx, q[0, 2] - sx, q[1, 2] + sy, q[1, 2] - sy])
            / q[2, 2]
        )

        cam_r = jnp.asarray(ext_r.T)
        cam_t = jnp.asarray(-ext_r.T @ ext_t)
        corners, valid = geo.ellipsoid_corners_rectified(
            jnp.asarray(ell), jnp.asarray(pose), cam_r, cam_t
        )
        assert bool(valid)
        np.testing.assert_allclose(np.asarray(corners), expected, rtol=1e-10)

    def test_invalid_behind_camera(self):
        # Ellipsoid behind the camera -> degenerate projection flagged invalid.
        ell = jnp.array([0.0, 0.0, -5.0, 0.0, 1.0, 1.0, 1.0])
        _, valid = geo.ellipsoid_corners_rectified(
            ell, jnp.zeros(6), jnp.eye(3), jnp.zeros(3)
        )
        # Behind-camera gives a projection but the ellipse may still be "valid"
        # mathematically; the genuinely degenerate case is camera inside the
        # ellipsoid:
        ell_inside = jnp.array([0.0, 0.0, 0.0, 0.0, 10.0, 10.0, 10.0])
        _, valid_inside = geo.ellipsoid_corners_rectified(
            ell_inside, jnp.zeros(6), jnp.eye(3), jnp.zeros(3)
        )
        assert not bool(valid_inside)

    def test_corner_grads_finite_even_when_invalid(self):
        ell = jnp.array([0.0, 0.0, 0.0, 0.0, 10.0, 10.0, 10.0])

        def f(e):
            c, _ = geo.ellipsoid_corners_rectified(
                e, jnp.zeros(6), jnp.eye(3), jnp.zeros(3)
            )
            return jnp.sum(c)

        g = jax.grad(f)(ell)
        assert np.all(np.isfinite(np.asarray(g)))
