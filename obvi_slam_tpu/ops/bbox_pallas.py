"""Pallas TPU kernel: fused bounding-box (dual-quadric) residual + Jacobian.

Implements the object-SLAM core factor — predicted rectified bbox corners of
an ellipsoid via the dual-quadric projection (``getCornerLocationsVector
Rectified``, ellipsoid_utils.h:160-273; residual semantics
``bounding_box_factor.h:68-136``) — with a hand-derived analytic Jacobian,
laid out component-major like ops/reproj_pallas.py: every input/output
component is a full (BLOCK_B,) lane vector, all arithmetic at full 8x128 VPU
occupancy.

Math (per factor):
    Rwc = C_r R^T                 (world->camera rotation)
    A   = Rwc Re(yaw)             (ellipsoid frame -> camera)
    b   = C_r R^T (t_e - t) + C_t (ellipsoid center in camera)
    d_k = (dims_k/2)^2 + 1e-3
    q_ij = sum_k A_ik d_k A_jk - b_i b_j          (dual conic entries)
    sx = sqrt(q13^2 - q11 q33), sy = sqrt(q23^2 - q22 q33)
    corners = [q13+sx, q13-sx, q23+sy, q23-sy] / q33
    r = sqrt_inf (corners - obs);  invalid (inner <= 0) -> invalid_error

Jacobian chain (13 params: ellipsoid 7 = [t_e(3), yaw, dims(3)], pose 6 =
[t(3), w(3)]); the rotation derivative enters via the right-Jacobian identity
d(R^T v)/dw = [R^T v]_x Jr(w) exactly as in factors/reproj_fast.py:

    d t_e_m : db = Rwc[:, m]
    d yaw   : dA[:,0] = A[:,1], dA[:,1] = -A[:,0]
    d dim_m : dd_m = dims_m / 2
    d t_m   : db = -Rwc[:, m]           (negated t_e column)
    d w_m   : dA[:,j] = C_r (U[:,j] x jr[:,m]),  U = R^T Re
              db     = C_r (pr x jr[:,m]),       pr = R^T (t_e - t)

Numerically identical to the XLA jacfwd path (same guarded sqrt/q33 branches,
so gradients match through the clamps); validated against it in
tests/test_pallas_kernel.py and on hardware by bench.py's kernel check.

CPU tests run with interpret=True (Pallas TPU lowering needs a TPU backend).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from obvi_slam_tpu.ops.reproj_pallas import _HAS_PLTPU, pallas_supported

if _HAS_PLTPU:
    from jax.experimental.pallas import tpu as pltpu
else:  # pragma: no cover
    pltpu = None

BLOCK_B = 256
N_IN = 61
N_OUT = 56


def _kernel(in_ref, out_ref):
    def c(i):
        return in_ref[i, :]

    # --- unpack ----------------------------------------------------------
    ex, ey, ez, yaw = c(0), c(1), c(2), c(3)
    dims = [c(4), c(5), c(6)]
    tx, ty, tz = c(7), c(8), c(9)
    rt = [[c(10 + 3 * i + j) for j in range(3)] for i in range(3)]  # R^T
    jr = [[c(19 + 3 * i + j) for j in range(3)] for i in range(3)]  # Jr
    cr = [[c(28 + 3 * i + j) for j in range(3)] for i in range(3)]  # C_r
    ct = [c(37), c(38), c(39)]
    obs = [c(40 + k) for k in range(4)]
    s_inf = [[c(44 + 4 * i + j) for j in range(4)] for i in range(4)]
    invalid_error = c(60)

    def mat3(m, v):
        return [sum(m[i][k] * v[k] for k in range(3)) for i in range(3)]

    def matmul3(a, b):
        return [
            [sum(a[i][k] * b[k][j] for k in range(3)) for j in range(3)]
            for i in range(3)
        ]

    def cross(a, b):
        return [
            a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0],
        ]

    # --- forward chain ---------------------------------------------------
    rwc = matmul3(cr, rt)  # C_r R^T
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    # A columns: A[:,0] = cy Rwc[:,0] + sy Rwc[:,1]; A[:,1] = -sy .. + cy ..
    a_col = [
        [cy * rwc[i][0] + sy * rwc[i][1] for i in range(3)],
        [-sy * rwc[i][0] + cy * rwc[i][1] for i in range(3)],
        [rwc[i][2] for i in range(3)],
    ]  # a_col[j][i] = A[i][j]
    tmt = [ex - tx, ey - ty, ez - tz]
    pr = mat3(rt, tmt)  # R^T (t_e - t)
    b = [mat3(cr, pr)[i] + ct[i] for i in range(3)]
    d = [(dims[k] * 0.5) ** 2 + 1e-3 for k in range(3)]

    def q_entry(i, j):
        return sum(a_col[k][i] * d[k] * a_col[k][j] for k in range(3)) - b[i] * b[j]

    q11, q13 = q_entry(0, 0), q_entry(0, 2)
    q22, q23 = q_entry(1, 1), q_entry(1, 2)
    q33 = q_entry(2, 2)

    x_inner = q13 * q13 - q11 * q33
    y_inner = q23 * q23 - q22 * q33
    valid = (x_inner > 0) & (y_inner > 0)
    sx = jnp.sqrt(jnp.maximum(x_inner, 1e-12))
    sy_ = jnp.sqrt(jnp.maximum(y_inner, 1e-12))
    q33s = jnp.where(jnp.abs(q33) < 1e-12, 1e-12, q33)
    i33 = 1.0 / q33s
    corners = [
        (q13 + sx) * i33,
        (q13 - sx) * i33,
        (q23 + sy_) * i33,
        (q23 - sy_) * i33,
    ]

    # residuals (whitened; invalid -> constant, bounding_box_factor.h:81-96)
    for i in range(4):
        ri = sum(s_inf[i][j] * (corners[j] - obs[j]) for j in range(4))
        out_ref[i, :] = jnp.where(valid, ri, invalid_error)

    # --- jacobian chain --------------------------------------------------
    # Guarded-branch gradients matching the XLA path's maximum/where clamps.
    gx = jnp.where(x_inner >= 1e-12, 1.0, 0.0)
    gy = jnp.where(y_inner >= 1e-12, 1.0, 0.0)
    g33 = jnp.where(jnp.abs(q33) >= 1e-12, 1.0, 0.0)
    inv_sx = gx / sx
    inv_sy = gy / sy_
    zero = jnp.zeros_like(q33)

    def dcorners(dq11, dq13, dq22, dq23, dq33):
        dsx = (q13 * dq13 - 0.5 * (dq11 * q33 + q11 * dq33)) * inv_sx
        dsy = (q23 * dq23 - 0.5 * (dq22 * q33 + q22 * dq33)) * inv_sy
        di33 = -(i33 * i33) * g33 * dq33
        return [
            (dq13 + dsx) * i33 + (q13 + sx) * di33,
            (dq13 - dsx) * i33 + (q13 - sx) * di33,
            (dq23 + dsy) * i33 + (q23 + sy_) * di33,
            (dq23 - dsy) * i33 + (q23 - sy_) * di33,
        ]

    def dq_from(dA_col=None, db=None, dd=None):
        """dq entries from sparse dA (list of 3 columns or None), db, dd."""

        def term(i, j):
            out = zero
            if dA_col is not None:
                out = out + sum(
                    (dA_col[k][i] * a_col[k][j] + a_col[k][i] * dA_col[k][j])
                    * d[k]
                    for k in range(3)
                    if dA_col[k] is not None
                )
            if dd is not None:
                out = out + sum(
                    a_col[k][i] * a_col[k][j] * dd[k]
                    for k in range(3)
                    if dd[k] is not None
                )
            if db is not None:
                out = out - (db[i] * b[j] + b[i] * db[j])
            return out

        return term(0, 0), term(0, 2), term(1, 1), term(1, 2), term(2, 2)

    def whiten_and_store(base_row, col, dc):
        for i in range(4):
            ji = sum(s_inf[i][j] * dc[j] for j in range(4))
            out_ref[base_row + i * (7 if base_row == 4 else 6) + col, :] = (
                jnp.where(valid, ji, 0.0)
            )

    # Object params: t_e (cols 0-2), yaw (3), dims (4-6) -> rows 4..31.
    for m in range(3):
        db = [rwc[i][m] for i in range(3)]
        dc = dcorners(*dq_from(db=db))
        whiten_and_store(4, m, dc)
        # Pose translation t_m is the negated t_e column: store rows 32..55.
        dcn = [-x for x in dc]
        whiten_and_store(32, m, dcn)
    # yaw
    dA_col = [
        [a_col[1][i] for i in range(3)],
        [-a_col[0][i] for i in range(3)],
        None,
    ]
    dc = dcorners(*dq_from(dA_col=dA_col))
    whiten_and_store(4, 3, dc)
    # dims
    for m in range(3):
        dd = [None, None, None]
        dd[m] = dims[m] * 0.5
        dc = dcorners(*dq_from(dd=dd))
        whiten_and_store(4, 4 + m, dc)
    # Pose rotation w_m: dA[:,j] = C_r (U[:,j] x g_m), db = C_r (pr x g_m),
    # with U = R^T Re (columns u_j) and g_m = Jr[:, m].
    u_col = [
        [cy * rt[i][0] + sy * rt[i][1] for i in range(3)],
        [-sy * rt[i][0] + cy * rt[i][1] for i in range(3)],
        [rt[i][2] for i in range(3)],
    ]
    for m in range(3):
        g_m = [jr[i][m] for i in range(3)]
        dA_col = [mat3(cr, cross(u_col[j], g_m)) for j in range(3)]
        db = mat3(cr, cross(pr, g_m))
        dc = dcorners(*dq_from(dA_col=dA_col, db=db))
        whiten_and_store(32, 3 + m, dc)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _run_kernel(packed, interpret=False):
    n = packed.shape[1]
    grid = (pl.cdiv(n, BLOCK_B),)
    if _HAS_PLTPU and not interpret:
        mem = pltpu.VMEM
        in_spec = pl.BlockSpec((N_IN, BLOCK_B), lambda i: (0, i), memory_space=mem)
        out_spec = pl.BlockSpec((N_OUT, BLOCK_B), lambda i: (0, i), memory_space=mem)
    else:
        in_spec = pl.BlockSpec((N_IN, BLOCK_B), lambda i: (0, i))
        out_spec = pl.BlockSpec((N_OUT, BLOCK_B), lambda i: (0, i))
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((N_OUT, n), packed.dtype),
        grid=grid,
        in_specs=[in_spec],
        out_specs=out_spec,
        interpret=interpret,
    )(packed)


def bbox_residuals_and_jac_pallas(state, cams, f, invalid_error=1e6, interpret=None):
    """Drop-in replacement for factors.bbox_residuals_and_jac via the Pallas
    kernel. Gathers + packing happen in XLA; the kernel is pure lane math."""
    from obvi_slam_tpu.factors.reproj_fast import pose_rotation_tables

    if interpret is None:
        interpret = not pallas_supported()
    rt, jr = pose_rotation_tables(state.poses)
    B = f.obj_idx.shape[0]
    pad = (-B) % BLOCK_B
    n_pose = state.poses.shape[0]
    n_cam = cams.cam_from_robot_t.shape[0]
    pose_tab = jnp.concatenate(
        [state.poses[:, 0:3], rt.reshape(n_pose, 9), jr.reshape(n_pose, 9)],
        axis=1,
    )
    cam_tab = jnp.concatenate(
        [cams.cam_from_robot_r.reshape(n_cam, 9), cams.cam_from_robot_t],
        axis=1,
    )
    comp = jnp.concatenate(
        [
            state.objects[f.obj_idx],  # 7
            pose_tab[f.pose_idx],  # 21
            cam_tab[f.cam_idx],  # 12
            f.rect_corners,  # 4
            f.sqrt_inf.reshape(B, 16),  # 16
            jnp.full((B, 1), invalid_error, state.poses.dtype),  # 1
        ],
        axis=1,
    ).T  # (61, B)
    if pad:
        comp = jnp.pad(comp, ((0, 0), (0, pad)))
    out = _run_kernel(comp, interpret=interpret)[:, :B]

    m = f.mask
    r = jnp.where(m[None, :], out[0:4], 0.0).T
    j_obj = jnp.where(m[None, :], out[4:32], 0.0).T.reshape(B, 4, 7)
    j_pose = jnp.where(m[None, :], out[32:56], 0.0).T.reshape(B, 4, 6)
    return r, j_obj, j_pose
