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


def test_bbox_matches_xla_jacfwd_path():
    """The analytic bbox kernel must equal the XLA jacfwd path (same guarded
    branches) on valid AND invalid (degenerate-projection) factors."""
    from obvi_slam_tpu.factors.residuals import bbox_residuals_and_jac
    from obvi_slam_tpu.ops.bbox_pallas import bbox_residuals_and_jac_pallas

    state, _, cams, tables, plan, free, weights, huber = synthetic_problem(
        n_poses=12, n_points=48, n_objects=4, obs_per_object=10, seed=4
    )
    f = tables.bbox
    r_ref, jo_ref, jp_ref = bbox_residuals_and_jac(state, cams, f)
    r_pal, jo_pal, jp_pal = bbox_residuals_and_jac_pallas(
        state, cams, f, interpret=True
    )
    np.testing.assert_allclose(np.asarray(r_pal), np.asarray(r_ref), rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(np.asarray(jo_pal), np.asarray(jo_ref), rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(jp_pal), np.asarray(jp_ref), rtol=1e-8, atol=1e-10)


def test_bbox_invalid_projection_saturates():
    """Camera inside the ellipsoid -> invalid projection: residual pinned at
    invalid_error, Jacobians exactly zero (bounding_box_factor.h:81-96)."""
    import numpy as np_

    from obvi_slam_tpu.factors.residuals import bbox_residuals_and_jac
    from obvi_slam_tpu.ops.bbox_pallas import bbox_residuals_and_jac_pallas

    state, _, cams, tables, plan, free, weights, huber = synthetic_problem(
        n_poses=4, n_points=16, n_objects=1, obs_per_object=4, seed=7
    )
    # Move the object onto the first pose (camera inside the quadric).
    objects = np_.asarray(state.objects).copy()
    objects[0, :3] = np_.asarray(state.poses)[0, :3]
    objects[0, 4:7] = 50.0
    import jax.numpy as jnp

    from obvi_slam_tpu.types import BAState

    state = BAState(
        poses=state.poses, points=state.points, objects=jnp.asarray(objects)
    )
    r_ref, jo_ref, jp_ref = bbox_residuals_and_jac(state, cams, tables.bbox)
    r_pal, jo_pal, jp_pal = bbox_residuals_and_jac_pallas(
        state, cams, tables.bbox, interpret=True
    )
    live = np_.asarray(tables.bbox.mask)
    invalid_rows = live & np_.all(np_.asarray(r_ref) == 1e6, axis=1)
    assert invalid_rows.any(), "expected at least one invalid projection"
    np.testing.assert_allclose(np.asarray(r_pal), np.asarray(r_ref), rtol=1e-9, atol=1e-11)
    np.testing.assert_array_equal(
        np.asarray(jo_pal)[invalid_rows], np.zeros_like(np.asarray(jo_ref)[invalid_rows])
    )
    np.testing.assert_allclose(np.asarray(jo_pal), np.asarray(jo_ref), rtol=1e-8, atol=1e-10)


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
