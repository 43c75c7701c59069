"""Pallas TPU kernel: fused reprojection residual + Jacobian.

The hottest per-iteration compute after the Schur matmuls is the reprojection
residual/Jacobian evaluation over tens of thousands of factors. The XLA path
(`factors/reproj_fast.py`) expresses it as (F, 3x3)-shaped einsums whose tiny
trailing dims waste VPU lanes; this kernel lays the data out component-major
— every input/output component is a full (BLOCK_F,) lane vector — so all
arithmetic runs at full 8x128 VPU occupancy with zero layout padding.

Layout:
  inputs  packed (40, F): pose_t(3) | rt(9) | jr(9) | x(3) | c_r(9) | c_t(3)
                          | obs(2) | mult(2)   [rows are components]
  outputs packed (20, F): r(2) | j_pose(12) | j_point(6)

The math is the identical analytic chain as reproj_fast (Jr identity for the
rotation derivative), unrolled to scalar formulas over lane vectors. Gathers
stay outside the kernel (XLA), so the kernel is pure compute.

CPU tests run with interpret=True (Pallas TPU lowering needs a TPU backend).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # TPU-specific memory spaces; absent on pure-CPU installs.
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

BLOCK_F = 512
N_IN = 40
N_OUT = 20


def pallas_supported() -> bool:
    if not _HAS_PLTPU:
        return False
    # Respect an explicit default-device override (e.g. the CPU baseline run
    # in bench.py uses jax.default_device(cpu) while a TPU is present).
    dd = getattr(jax.config, "jax_default_device", None)
    if dd is not None and getattr(dd, "platform", None) == "cpu":
        return False
    return jax.default_backend() not in ("cpu",)


def _kernel(in_ref, out_ref):
    def c(i):
        return in_ref[i, :]

    # Unpack components.
    tx, ty, tz = c(0), c(1), c(2)
    r00, r01, r02, r10, r11, r12, r20, r21, r22 = (c(3 + k) for k in range(9))
    g00, g01, g02, g10, g11, g12, g20, g21, g22 = (c(12 + k) for k in range(9))
    x0, x1, x2 = c(21), c(22), c(23)
    a00, a01, a02, a10, a11, a12, a20, a21, a22 = (c(24 + k) for k in range(9))
    ct0, ct1, ct2 = c(33), c(34), c(35)
    ox, oy = c(36), c(37)
    mx, my = c(38), c(39)

    # diff = x - t;  p_r = R^T diff  (rt rows are R^T already)
    d0, d1, d2 = x0 - tx, x1 - ty, x2 - tz
    pr0 = r00 * d0 + r01 * d1 + r02 * d2
    pr1 = r10 * d0 + r11 * d1 + r12 * d2
    pr2 = r20 * d0 + r21 * d1 + r22 * d2
    # p_c = C p_r + ct
    pc0 = a00 * pr0 + a01 * pr1 + a02 * pr2 + ct0
    pc1 = a10 * pr0 + a11 * pr1 + a12 * pr2 + ct1
    pc2 = a20 * pr0 + a21 * pr1 + a22 * pr2 + ct2
    iz = 1.0 / pc2
    # residual
    out_ref[0, :] = mx * (pc0 * iz - ox)
    out_ref[1, :] = my * (pc1 * iz - oy)

    # dproj rows scaled by multiplier: dp[r][k]
    dp00 = mx * iz
    dp02 = -mx * pc0 * iz * iz
    dp11 = my * iz
    dp12 = -my * pc1 * iz * iz

    # CR = C @ R^T
    cr00 = a00 * r00 + a01 * r10 + a02 * r20
    cr01 = a00 * r01 + a01 * r11 + a02 * r21
    cr02 = a00 * r02 + a01 * r12 + a02 * r22
    cr10 = a10 * r00 + a11 * r10 + a12 * r20
    cr11 = a10 * r01 + a11 * r11 + a12 * r21
    cr12 = a10 * r02 + a11 * r12 + a12 * r22
    cr20 = a20 * r00 + a21 * r10 + a22 * r20
    cr21 = a20 * r01 + a21 * r11 + a22 * r21
    cr22 = a20 * r02 + a21 * r12 + a22 * r22

    # j_point row r col b = dp[r][0]*CR[0][b] + dp[r][2]*CR[2][b]  (dp01=0)
    jp00 = dp00 * cr00 + dp02 * cr20
    jp01 = dp00 * cr01 + dp02 * cr21
    jp02 = dp00 * cr02 + dp02 * cr22
    jp10 = dp11 * cr10 + dp12 * cr20
    jp11 = dp11 * cr11 + dp12 * cr21
    jp12 = dp11 * cr12 + dp12 * cr22

    # M = C [p_r]_x ; [p_r]_x = [[0,-pr2,pr1],[pr2,0,-pr0],[-pr1,pr0,0]]
    m00 = a01 * pr2 - a02 * pr1
    m01 = a02 * pr0 - a00 * pr2
    m02 = a00 * pr1 - a01 * pr0
    m10 = a11 * pr2 - a12 * pr1
    m11 = a12 * pr0 - a10 * pr2
    m12 = a10 * pr1 - a11 * pr0
    m20 = a21 * pr2 - a22 * pr1
    m21 = a22 * pr0 - a20 * pr2
    m22 = a20 * pr1 - a21 * pr0
    # dpc_dw = M @ Jr (g rows)
    w00 = m00 * g00 + m01 * g10 + m02 * g20
    w01 = m00 * g01 + m01 * g11 + m02 * g21
    w02 = m00 * g02 + m01 * g12 + m02 * g22
    w10 = m10 * g00 + m11 * g10 + m12 * g20
    w11 = m10 * g01 + m11 * g11 + m12 * g21
    w12 = m10 * g02 + m11 * g12 + m12 * g22
    w20 = m20 * g00 + m21 * g10 + m22 * g20
    w21 = m20 * g01 + m21 * g11 + m22 * g21
    w22 = m20 * g02 + m21 * g12 + m22 * g22

    # j_w row r col i = dp[r][0]*w0i + dp[r][2]*w2i (row0); dp[1][1]*w1i + dp[1][2]*w2i (row1)
    jw00 = dp00 * w00 + dp02 * w20
    jw01 = dp00 * w01 + dp02 * w21
    jw02 = dp00 * w02 + dp02 * w22
    jw10 = dp11 * w10 + dp12 * w20
    jw11 = dp11 * w11 + dp12 * w21
    jw12 = dp11 * w12 + dp12 * w22

    # j_pose = [-j_point | j_w]  rows-major packing: row0 cols 0..5, row1 cols 0..5
    out_ref[2, :] = -jp00
    out_ref[3, :] = -jp01
    out_ref[4, :] = -jp02
    out_ref[5, :] = jw00
    out_ref[6, :] = jw01
    out_ref[7, :] = jw02
    out_ref[8, :] = -jp10
    out_ref[9, :] = -jp11
    out_ref[10, :] = -jp12
    out_ref[11, :] = jw10
    out_ref[12, :] = jw11
    out_ref[13, :] = jw12
    # j_point rows
    out_ref[14, :] = jp00
    out_ref[15, :] = jp01
    out_ref[16, :] = jp02
    out_ref[17, :] = jp10
    out_ref[18, :] = jp11
    out_ref[19, :] = jp12


@functools.partial(jax.jit, static_argnames=("interpret",))
def _run_kernel(packed, interpret=False):
    n = packed.shape[1]
    grid = (pl.cdiv(n, BLOCK_F),)
    if _HAS_PLTPU and not interpret:
        mem = pltpu.VMEM
        in_spec = pl.BlockSpec((N_IN, BLOCK_F), lambda i: (0, i), memory_space=mem)
        out_spec = pl.BlockSpec((N_OUT, BLOCK_F), lambda i: (0, i), memory_space=mem)
    else:
        in_spec = pl.BlockSpec((N_IN, BLOCK_F), lambda i: (0, i))
        out_spec = pl.BlockSpec((N_OUT, BLOCK_F), lambda i: (0, i))
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((N_OUT, n), packed.dtype),
        grid=grid,
        in_specs=[in_spec],
        out_specs=out_spec,
        interpret=interpret,
    )(packed)


def reproj_residuals_and_jac_pallas(state, cams, f, interpret=None):
    """Drop-in replacement for reproj_residuals_and_jac_fast via the Pallas
    kernel. Gathers + packing happen in XLA; the kernel is pure lane math."""
    from obvi_slam_tpu.factors.reproj_fast import pose_rotation_tables

    if interpret is None:
        interpret = not pallas_supported()
    rt, jr = pose_rotation_tables(state.poses)
    F = f.pose_idx.shape[0]
    pad = (-F) % BLOCK_F
    n_pose = state.poses.shape[0]
    n_cam = cams.cam_from_robot_t.shape[0]
    # One gather per table: pose components (P, 21), camera components
    # (C, 12) — instead of ~8 separate gathers over the factor axis.
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
            pose_tab[f.pose_idx],  # 21: pose_t(3) | rt(9) | jr(9)
            state.points[f.point_idx],  # 3
            cam_tab[f.cam_idx],  # 12: c_r(9) | c_t(3)
            f.rect_obs,  # 2
            f.multiplier,  # 2
        ],
        axis=1,
    ).T  # (40, F)
    if pad:
        comp = jnp.pad(comp, ((0, 0), (0, pad)))
        # Guard the padded lanes against 1/0: give them unit depth.
        comp = comp.at[35, F:].set(1.0)  # c_t z
    out = _run_kernel(comp, interpret=interpret)[:, :F]

    m = f.mask
    r = jnp.where(m[None, :], out[0:2], 0.0).T
    j_pose = jnp.where(m[None, :], out[2:14], 0.0).T.reshape(F, 2, 6)
    j_point = jnp.where(m[None, :], out[14:20], 0.0).T.reshape(F, 2, 3)
    return r, j_pose, j_point
