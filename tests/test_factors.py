"""Factor kernel tests: residual values vs independent numpy oracles and
Jacobians vs central finite differences (the reference relies on Ceres
dual-number autodiff, so FD-validated jacfwd is the parity check)."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation

import obvi_slam_tpu.factors as fac
from obvi_slam_tpu import geometry as geo
from obvi_slam_tpu import types as T

RNG = np.random.default_rng(7)


def make_scene(n_poses=4, n_points=6, n_objs=2):
    poses = RNG.normal(size=(n_poses, 6)) * 0.3
    poses[:, 2] = 0.0
    points = RNG.normal(size=(n_points, 3))
    points[:, 2] += 8.0  # in front of cameras
    objects = np.concatenate(
        [
            RNG.normal(size=(n_objs, 2)),
            np.full((n_objs, 1), 10.0) + RNG.normal(size=(n_objs, 1)),
            RNG.normal(size=(n_objs, 1)) * 0.5,
            1.0 + 0.3 * np.abs(RNG.normal(size=(n_objs, 3))),
        ],
        axis=1,
    )
    # Use z-forward camera: extrinsics identity keeps fixtures readable.
    ext_r = np.tile(np.eye(3), (2, 1, 1))
    ext_r[1] = Rotation.from_euler("y", 0.1).as_matrix()
    ext_t = np.array([[0.0, 0.0, 0.0], [0.2, 0.0, 0.0]])
    cams = T.make_camera_bundle(ext_r, ext_t, [500.0, 510.0], [505.0, 515.0], [320.0, 322.0], [240.0, 238.0])
    state = T.BAState(jnp.asarray(poses), jnp.asarray(points), jnp.asarray(objects))
    return state, cams


def fd_jacobian(f, x, eps=1e-7):
    x = np.asarray(x, dtype=np.float64)
    y0 = np.asarray(f(x))
    jac = np.zeros(y0.shape + x.shape)
    for idx in np.ndindex(x.shape):
        xp = x.copy()
        xp[idx] += eps
        xm = x.copy()
        xm[idx] -= eps
        jac[(Ellipsis,) + idx] = (np.asarray(f(xp)) - np.asarray(f(xm))) / (2 * eps)
    return jac


class TestReprojection:
    def test_residual_value(self):
        state, cams = make_scene()
        # Single factor: pose 1 observes point 2 in cam 0.
        sigma = 2.0
        fx, fy = 500.0, 505.0
        cx, cy = 320.0, 240.0
        obs_px = np.array([300.0, 260.0])
        rect_obs = [(obs_px[0] - cx) / fx, (obs_px[1] - cy) / fy]
        mult = [fx / sigma, fy / sigma]
        f = T.make_reprojection_factors([1], [2], [0], [rect_obs], [mult], capacity=4)
        r = np.asarray(fac.reproj_residuals(state, cams, f))
        # Oracle
        pose = np.array(state.poses[1])
        point = np.array(state.points[2])
        rw = Rotation.from_rotvec(pose[3:]).as_matrix()
        p_cam = rw.T @ (point - pose[:3])
        proj = p_cam[:2] / p_cam[2]
        expected = np.array(mult) * (proj - rect_obs)
        np.testing.assert_allclose(r[0], expected, rtol=1e-12)
        # Padding rows exactly zero.
        np.testing.assert_array_equal(r[1:], 0.0)

    def test_jacobian_vs_fd(self):
        state, cams = make_scene()
        f = T.make_reprojection_factors(
            [0, 1, 3],
            [0, 2, 5],
            [0, 1, 0],
            RNG.normal(size=(3, 2)) * 0.1,
            np.full((3, 2), 250.0),
            capacity=5,
        )
        r, j_pose, j_point = fac.reproj_residuals_and_jac(state, cams, f)
        for k in range(3):
            pi, li = int(f.pose_idx[k]), int(f.point_idx[k])

            def f_pose(p, k=k, li=li):
                st = state._replace(poses=state.poses.at[int(f.pose_idx[k])].set(jnp.asarray(p)))
                return fac.reproj_residuals(st, cams, f)[k]

            def f_point(x, k=k):
                st = state._replace(points=state.points.at[int(f.point_idx[k])].set(jnp.asarray(x)))
                return fac.reproj_residuals(st, cams, f)[k]

            np.testing.assert_allclose(
                np.asarray(j_pose[k]), fd_jacobian(f_pose, state.poses[pi]), atol=1e-4, rtol=1e-4
            )
            np.testing.assert_allclose(
                np.asarray(j_point[k]), fd_jacobian(f_point, state.points[li]), atol=1e-4, rtol=1e-4
            )


class TestBoundingBox:
    def make_factors(self, state):
        cov = np.diag([30.0**2] * 4)
        sqrt_inf = np.linalg.inv(
            np.linalg.cholesky(cov).T
        )  # upper sqrt of inverse
        fx, fy = 500.0, 505.0
        scale = np.diag([fx, fx, fy, fy])
        si = sqrt_inf @ scale
        return T.make_bounding_box_factors(
            [0, 1],
            [0, 2],
            [0, 0],
            RNG.normal(size=(2, 4)) * 0.05,
            [si, si],
            capacity=4,
        )

    def test_jacobian_vs_fd(self):
        state, cams = make_scene()
        f = self.make_factors(state)
        r, j_obj, j_pose = fac.bbox_residuals_and_jac(state, cams, f)
        assert np.all(np.abs(np.asarray(r)[:2]) < 1e5), "fixture should be valid projection"
        for k in range(2):
            oi, pi = int(f.obj_idx[k]), int(f.pose_idx[k])

            def f_obj(o, k=k):
                st = state._replace(objects=state.objects.at[int(f.obj_idx[k])].set(jnp.asarray(o)))
                return fac.bbox_residuals(st, cams, f)[k]

            def f_pose(p, k=k):
                st = state._replace(poses=state.poses.at[int(f.pose_idx[k])].set(jnp.asarray(p)))
                return fac.bbox_residuals(st, cams, f)[k]

            np.testing.assert_allclose(
                np.asarray(j_obj[k]), fd_jacobian(f_obj, state.objects[oi]), atol=1e-4, rtol=1e-4
            )
            np.testing.assert_allclose(
                np.asarray(j_pose[k]), fd_jacobian(f_pose, state.poses[pi]), atol=1e-4, rtol=1e-4
            )

    def test_invalid_saturates(self):
        state, cams = make_scene()
        # Camera inside the ellipsoid: invalid -> all residuals = 1e6, J = 0.
        objects = np.asarray(state.objects).copy()
        objects[0] = [0, 0, 0, 0, 50.0, 50.0, 50.0]
        state = state._replace(objects=jnp.asarray(objects))
        poses = np.asarray(state.poses).copy()
        poses[0] = 0
        state = state._replace(poses=jnp.asarray(poses))
        f = self.make_factors(state)
        r, j_obj, j_pose = fac.bbox_residuals_and_jac(state, cams, f)
        np.testing.assert_array_equal(np.asarray(r)[0], 1e6)
        np.testing.assert_array_equal(np.asarray(j_obj)[0], 0.0)
        np.testing.assert_array_equal(np.asarray(j_pose)[0], 0.0)


class TestRelativePose:
    def test_residual_zero_at_measurement(self):
        state, _ = make_scene()
        rel = geo.pose_between(state.poses[0], state.poses[1])
        meas_r = geo.exp_so3(rel[3:6])
        f = T.make_relative_pose_factors(
            [0], [1], [np.asarray(rel[:3])], [np.asarray(meas_r)], [np.eye(6)], capacity=2
        )
        r = np.asarray(fac.relpose_residuals(state, f))
        np.testing.assert_allclose(r, 0.0, atol=1e-12)

    def test_residual_value_and_jacobian(self):
        state, _ = make_scene()
        meas_t = RNG.normal(size=3) * 0.1
        meas_r = Rotation.from_rotvec(RNG.normal(size=3) * 0.2).as_matrix()
        sqrt_inf = np.linalg.cholesky(np.linalg.inv(np.diag([0.1] * 3 + [0.05] * 3))).T
        f = T.make_relative_pose_factors([1], [2], [meas_t], [meas_r], [sqrt_inf], capacity=2)
        r = np.asarray(fac.relpose_residuals(state, f))[0]
        # Oracle per relative_pose_factor.h:32-61
        tb = np.array(state.poses[1])
        ta = np.array(state.poses[2])
        rb = Rotation.from_rotvec(tb[3:]).as_matrix()
        ra = Rotation.from_rotvec(ta[3:]).as_matrix()
        rel_r = rb.T @ ra
        rel_t = rb.T @ (ta[:3] - tb[:3])
        rot_err = rel_r @ meas_r.T
        w = Rotation.from_matrix(rot_err).as_rotvec()
        expected = sqrt_inf @ np.concatenate([rel_t - meas_t, w])
        np.testing.assert_allclose(r, expected, rtol=1e-9, atol=1e-12)

        _, j_before, j_after = fac.relpose_residuals_and_jac(state, f)

        def f_b(p):
            st = state._replace(poses=state.poses.at[1].set(jnp.asarray(p)))
            return fac.relpose_residuals(st, f)[0]

        def f_a(p):
            st = state._replace(poses=state.poses.at[2].set(jnp.asarray(p)))
            return fac.relpose_residuals(st, f)[0]

        np.testing.assert_allclose(
            np.asarray(j_before[0]), fd_jacobian(f_b, tb), atol=1e-5, rtol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(j_after[0]), fd_jacobian(f_a, ta), atol=1e-5, rtol=1e-4
        )


class TestPriors:
    def test_shape_prior(self):
        state, _ = make_scene()
        mean = np.array([1.0, 1.0, 2.0])
        si = np.diag([2.0, 3.0, 4.0])
        f = T.make_shape_prior_factors([1], [mean], [si], capacity=3)
        r = np.asarray(fac.shape_residuals(state, f))[0]
        expected = si @ (np.asarray(state.objects[1])[4:7] - mean)
        np.testing.assert_allclose(r, expected, rtol=1e-12)
        _, j = fac.shape_residuals_and_jac(state, f)
        np.testing.assert_allclose(np.asarray(j[0])[:, 4:7], si)
        np.testing.assert_array_equal(np.asarray(j[0])[:, :4], 0.0)

    def test_ltm_prior(self):
        state, _ = make_scene()
        mean = RNG.normal(size=7)
        si = np.linalg.cholesky(np.linalg.inv(np.diag(np.full(7, 0.2)))).T
        f = T.make_ltm_prior_factors([0], [mean], [si], capacity=2)
        r = np.asarray(fac.ltm_residuals(state, f))[0]
        expected = si @ (np.asarray(state.objects[0]) - mean)
        np.testing.assert_allclose(r, expected, rtol=1e-10)

    def test_param_prior(self):
        state, _ = make_scene()
        f = T.make_param_prior_factors([0, 2], [1, 0], [4, 2], [0.5, 1.0], [10.0, 2.0], capacity=4)
        r = np.asarray(fac.param_prior_residuals(state, f))
        np.testing.assert_allclose(
            r[0], 10.0 * (float(state.poses[1, 4]) - 0.5), rtol=1e-12
        )
        np.testing.assert_allclose(
            r[1], 2.0 * (float(state.objects[0, 2]) - 1.0), rtol=1e-12
        )


class TestHuberAndCost:
    def test_huber_matches_ceres(self):
        delta = 1.3
        for s in [0.1, delta**2, 4.0, 100.0]:
            rho = float(fac.huber_rho(jnp.float64(s), delta))
            expected = s if s <= delta**2 else 2 * delta * np.sqrt(s) - delta**2
            np.testing.assert_allclose(rho, expected, rtol=1e-12)

    def test_total_cost_runs_and_matches_manual(self):
        state, cams = make_scene()
        tables = T.empty_factor_tables()._replace(
            reproj=T.make_reprojection_factors(
                [0, 1], [0, 1], [0, 0], RNG.normal(size=(2, 2)) * 0.1, np.full((2, 2), 100.0), capacity=4
            )
        )
        cost = float(fac.total_cost(state, cams, tables))
        r = np.asarray(fac.reproj_residuals(state, cams, tables.reproj))
        s = np.sum(r * r, axis=1)[:2]
        expected = 0.5 * sum(
            si if si <= 1.0 else 2 * np.sqrt(si) - 1.0 for si in s
        )
        np.testing.assert_allclose(cost, expected, rtol=1e-10)
