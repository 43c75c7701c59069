"""Fast analytic-chain reprojection kernel must match the autodiff path."""

import numpy as np

import obvi_slam_tpu.factors as fac
from obvi_slam_tpu.factors.reproj_fast import reproj_residuals_and_jac_fast
from obvi_slam_tpu.synthetic import synthetic_problem


def test_matches_jacfwd_path():
    state, _, cams, tables, plan, free, weights, huber = synthetic_problem(
        n_poses=12, n_points=48, n_objects=2, seed=4
    )
    r_ref, jp_ref, jx_ref = fac.reproj_residuals_and_jac(state, cams, tables.reproj)
    r_fast, jp_fast, jx_fast = reproj_residuals_and_jac_fast(state, cams, tables.reproj)
    np.testing.assert_allclose(np.asarray(r_fast), np.asarray(r_ref), rtol=1e-12, atol=1e-14)
    np.testing.assert_allclose(np.asarray(jp_fast), np.asarray(jp_ref), rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(np.asarray(jx_fast), np.asarray(jx_ref), rtol=1e-10, atol=1e-12)
