"""Jacobian debug extraction + epipolar factor tests."""

import numpy as np

from obvi_slam_tpu.solver import jacobian_debug as jd
from obvi_slam_tpu.synthetic import synthetic_problem


class TestJacobianDebug:
    def test_extract_matches_dense_assembly(self):
        state, _, cams, tables, plan, free, weights, huber = synthetic_problem(
            n_poses=6, n_points=20, n_objects=2, obs_per_point=3, obs_per_object=4
        )
        info = jd.extract_jacobian(state, cams, tables, huber)
        assert info.n_rows > 0
        # Hessian diagonal from triplets equals diag of dense J^T J.
        dense = np.zeros((info.n_rows, info.n_cols))
        dense[info.rows, info.cols] += info.vals
        np.testing.assert_allclose(
            jd.hessian_diagonal(info), np.diag(dense.T @ dense), rtol=1e-10
        )
        # Free pose 0 is fixed by free-mask logic, but columns for observed
        # params must be nonzero.
        norms = jd.column_norms(info)
        n_pose = state.poses.shape[0]
        assert np.all(norms[: n_pose * 6] > 0)

    def test_zero_column_detection(self):
        state, _, cams, tables, plan, free, weights, huber = synthetic_problem(
            n_poses=6, n_points=20, n_objects=2, obs_per_point=3, obs_per_object=4
        )
        # Drop all bbox+shape factors touching object 1 -> its columns zero.
        import jax.numpy as jnp

        bb_mask = np.asarray(tables.bbox.mask) & (np.asarray(tables.bbox.obj_idx) != 1)
        sh_mask = np.asarray(tables.shape.mask) & (np.asarray(tables.shape.obj_idx) != 1)
        tables = tables._replace(
            bbox=tables.bbox._replace(mask=jnp.asarray(bb_mask)),
            shape=tables.shape._replace(mask=jnp.asarray(sh_mask)),
        )
        info = jd.extract_jacobian(state, cams, tables, huber)
        problems = jd.validate_zero_columns(info)
        zero_objs = {(k, r) for k, r, p, n in problems if k == "object"}
        assert ("object", 1) in zero_objs
        assert ("object", 0) not in zero_objs


class TestEpipolarFactor:
    def test_zero_on_epipolar_plane_and_jacobian(self):
        from obvi_slam_tpu.factors.epipolar import (
            epipolar_residuals,
            epipolar_residuals_and_jac,
            make_epipolar_factors,
        )
        from obvi_slam_tpu import types as T
        import jax.numpy as jnp
        from scipy.spatial.transform import Rotation

        # Two poses observing one world point: pixels satisfy the epipolar
        # constraint exactly -> residual 0.
        k = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])
        p1 = np.zeros(6)
        p2 = np.array([0.5, 0.05, 0.0, 0.0, 0.02, 0.0])
        point = np.array([0.4, -0.2, 6.0])

        def project(pose):
            r = Rotation.from_rotvec(pose[3:]).as_matrix()
            pc = r.T @ (point - pose[:3])
            return np.array(
                [500 * pc[0] / pc[2] + 320, 500 * pc[1] / pc[2] + 240]
            )

        px1, px2 = project(p1), project(p2)
        f = make_epipolar_factors(
            [0], [1], [px1], [px2], [k], [k],
            [np.eye(3)], [np.zeros(3)], [np.eye(3)], [np.zeros(3)], sigma=2.0,
        )
        state = T.BAState(
            jnp.asarray(np.stack([p1, p2])), jnp.zeros((1, 3)), jnp.zeros((1, 7))
        )
        r = np.asarray(epipolar_residuals(state, f))
        np.testing.assert_allclose(r[0], 0.0, atol=1e-10)

        # Perturbed pose -> nonzero residual; FD-check the Jacobian.
        p2b = p2 + np.array([0, 0.1, 0, 0, 0, 0.01])
        state_b = T.BAState(
            jnp.asarray(np.stack([p1, p2b])), jnp.zeros((1, 3)), jnp.zeros((1, 7))
        )
        r_b, j1, j2 = epipolar_residuals_and_jac(state_b, f)
        assert abs(float(r_b[0])) > 1e-4
        eps = 1e-7
        for d in range(6):
            pp = np.stack([p1, p2b])
            pp[1, d] += eps
            sp = T.BAState(jnp.asarray(pp), jnp.zeros((1, 3)), jnp.zeros((1, 7)))
            rp = float(epipolar_residuals(sp, f)[0])
            pm = np.stack([p1, p2b])
            pm[1, d] -= eps
            sm = T.BAState(jnp.asarray(pm), jnp.zeros((1, 3)), jnp.zeros((1, 7)))
            rm = float(epipolar_residuals(sm, f)[0])
            fd = (rp - rm) / (2 * eps)
            np.testing.assert_allclose(float(j2[0, d]), fd, atol=1e-5, rtol=1e-4)
