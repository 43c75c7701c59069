"""Pallas fused reprojection kernel equals the XLA analytic path (interpret
mode on CPU; the same kernel compiles natively on TPU)."""

import numpy as np

from obvi_slam_tpu.factors.reproj_fast import reproj_residuals_and_jac_fast
from obvi_slam_tpu.ops.reproj_pallas import reproj_residuals_and_jac_pallas
from obvi_slam_tpu.synthetic import synthetic_problem


def test_matches_fast_path():
    state, _, cams, tables, plan, free, weights, huber = synthetic_problem(
        n_poses=12, n_points=48, n_objects=2, seed=4
    )
    f = tables.reproj
    r_ref, jp_ref, jx_ref = reproj_residuals_and_jac_fast(state, cams, f)
    r_pal, jp_pal, jx_pal = reproj_residuals_and_jac_pallas(
        state, cams, f, interpret=True
    )
    np.testing.assert_allclose(np.asarray(r_pal), np.asarray(r_ref), rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(jp_pal), np.asarray(jp_ref), rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(np.asarray(jx_pal), np.asarray(jx_ref), rtol=1e-9, atol=1e-11)


def test_nonmultiple_block_size():
    # Capacity not a multiple of BLOCK_F exercises the padded path.
    state, _, cams, tables, plan, free, weights, huber = synthetic_problem(
        n_poses=8, n_points=30, n_objects=2, obs_per_point=3, seed=9
    )
    f = tables.reproj
    r_ref, jp_ref, jx_ref = reproj_residuals_and_jac_fast(state, cams, f)
    r_pal, jp_pal, jx_pal = reproj_residuals_and_jac_pallas(
        state, cams, f, interpret=True
    )
    np.testing.assert_allclose(np.asarray(r_pal), np.asarray(r_ref), rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(np.asarray(jp_pal), np.asarray(jp_ref), rtol=1e-9, atol=1e-11)
