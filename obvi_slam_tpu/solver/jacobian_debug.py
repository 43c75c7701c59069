"""Jacobian debug extraction — the debug-oracle subsystem
(``jacobian_extraction.cpp``: sparse Jacobian dumps with per-column factor
attribution, zero-column validation, Hessian-diagonal inspection).

The reference dumps the Ceres CRS Jacobian to CSV and cross-references small
columns against factor metadata; here the block Jacobians come straight from
the factor kernels, are assembled to sparse COO triplets with a column->block
attribution map, and the same validations run on top.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Tuple

import numpy as np

import obvi_slam_tpu.factors as fac
from obvi_slam_tpu.factors.reproj_fast import reproj_residuals_and_jac_fast


@dataclass
class JacobianInfo:
    """Sparse Jacobian (COO) + attribution."""

    rows: np.ndarray
    cols: np.ndarray
    vals: np.ndarray
    n_rows: int
    n_cols: int
    # column -> (block_kind, block_row, param_idx); kinds: pose/point/object
    col_owner: List[Tuple[str, int, int]] = field(default_factory=list)
    # row -> (factor_family, factor_row)
    row_owner: List[Tuple[str, int]] = field(default_factory=list)


def extract_jacobian(state, cams, tables, huber=None) -> JacobianInfo:
    """Assemble the full (unweighted-by-loss) Jacobian in COO form."""
    n_pose = state.poses.shape[0]
    n_point = state.points.shape[0]
    n_obj = state.objects.shape[0]
    pose_off = 0
    point_off = n_pose * 6
    obj_off = point_off + n_point * 3
    n_cols = obj_off + n_obj * 7

    col_owner = (
        [("pose", i, k) for i in range(n_pose) for k in range(6)]
        + [("point", i, k) for i in range(n_point) for k in range(3)]
        + [("object", i, k) for i in range(n_obj) for k in range(7)]
    )

    rows, cols, vals = [], [], []
    row_owner: List[Tuple[str, int]] = []
    row = 0

    def add_block(j, row0, col0):
        r_dim, c_dim = j.shape
        rr, cc = np.meshgrid(np.arange(r_dim), np.arange(c_dim), indexing="ij")
        rows.append((rr + row0).ravel())
        cols.append((cc + col0).ravel())
        vals.append(np.asarray(j).ravel())

    invalid = 1e6 if huber is None else huber.invalid_ellipse_error

    r_rp, j_rp_pose, j_rp_point = reproj_residuals_and_jac_fast(
        state, cams, tables.reproj
    )
    rp_pose = np.asarray(tables.reproj.pose_idx)
    rp_point = np.asarray(tables.reproj.point_idx)
    rp_mask = np.asarray(tables.reproj.mask)
    j_rp_pose = np.asarray(j_rp_pose)
    j_rp_point = np.asarray(j_rp_point)
    for k in range(len(rp_pose)):
        if not rp_mask[k]:
            continue
        add_block(j_rp_pose[k], row, pose_off + 6 * rp_pose[k])
        add_block(j_rp_point[k], row, point_off + 3 * rp_point[k])
        row_owner.append(("reprojection", k))
        row += 2

    r_bb, j_bb_obj, j_bb_pose = fac.bbox_residuals_and_jac(
        state, cams, tables.bbox, invalid
    )
    bb_obj = np.asarray(tables.bbox.obj_idx)
    bb_pose = np.asarray(tables.bbox.pose_idx)
    bb_mask = np.asarray(tables.bbox.mask)
    j_bb_obj = np.asarray(j_bb_obj)
    j_bb_pose = np.asarray(j_bb_pose)
    for k in range(len(bb_obj)):
        if not bb_mask[k]:
            continue
        add_block(j_bb_obj[k], row, obj_off + 7 * bb_obj[k])
        add_block(j_bb_pose[k], row, pose_off + 6 * bb_pose[k])
        row_owner.append(("bounding_box", k))
        row += 4

    r_sh, j_sh = fac.shape_residuals_and_jac(state, tables.shape)
    sh_obj = np.asarray(tables.shape.obj_idx)
    sh_mask = np.asarray(tables.shape.mask)
    j_sh = np.asarray(j_sh)
    for k in range(len(sh_obj)):
        if not sh_mask[k]:
            continue
        add_block(j_sh[k], row, obj_off + 7 * sh_obj[k])
        row_owner.append(("shape_prior", k))
        row += 3

    r_rl, j_rl_b, j_rl_a = fac.relpose_residuals_and_jac(state, tables.relpose)
    rl_b = np.asarray(tables.relpose.before_idx)
    rl_a = np.asarray(tables.relpose.after_idx)
    rl_mask = np.asarray(tables.relpose.mask)
    j_rl_b = np.asarray(j_rl_b)
    j_rl_a = np.asarray(j_rl_a)
    for k in range(len(rl_b)):
        if not rl_mask[k]:
            continue
        add_block(j_rl_b[k], row, pose_off + 6 * rl_b[k])
        add_block(j_rl_a[k], row, pose_off + 6 * rl_a[k])
        row_owner.append(("relative_pose", k))
        row += 6

    r_lt, j_lt = fac.ltm_residuals_and_jac(state, tables.ltm)
    lt_obj = np.asarray(tables.ltm.obj_idx)
    lt_mask = np.asarray(tables.ltm.mask)
    j_lt = np.asarray(j_lt)
    for k in range(len(lt_obj)):
        if not lt_mask[k]:
            continue
        add_block(j_lt[k], row, obj_off + 7 * lt_obj[k])
        row_owner.append(("ltm_prior", k))
        row += 7

    return JacobianInfo(
        rows=np.concatenate(rows) if rows else np.zeros(0, np.int64),
        cols=np.concatenate(cols) if cols else np.zeros(0, np.int64),
        vals=np.concatenate(vals) if vals else np.zeros(0),
        n_rows=row,
        n_cols=n_cols,
        col_owner=col_owner,
        row_owner=row_owner,
    )


def column_norms(info: JacobianInfo) -> np.ndarray:
    norms_sq = np.zeros(info.n_cols)
    np.add.at(norms_sq, info.cols, info.vals**2)
    return np.sqrt(norms_sq)


def validate_zero_columns(info: JacobianInfo, free_cols=None, tol=1e-12):
    """validateZeroColumnEntries (jacobian_extraction.cpp:419): columns of
    FREE parameters with (near-)zero norm indicate unconstrained parameters.
    Returns list of (block_kind, block_row, param_idx, norm)."""
    norms = column_norms(info)
    problems = []
    for c in range(info.n_cols):
        if free_cols is not None and not free_cols[c]:
            continue
        if norms[c] < tol:
            kind, row, param = info.col_owner[c]
            problems.append((kind, row, param, float(norms[c])))
    return problems


def hessian_diagonal(info: JacobianInfo) -> np.ndarray:
    """Diagonal of J^T J (debug_jacobian_hessian_diagonal equivalent)."""
    return column_norms(info) ** 2


def write_jacobian_csv(info: JacobianInfo, path: str):
    """Sparse triplets + per-column attribution (writeJacobianToFile analog)."""
    import os

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as f:
        f.write("row,col,value\n")
        for r, c, v in zip(info.rows, info.cols, info.vals):
            f.write(f"{r},{c},{v}\n")
    attr_path = path.replace(".csv", "_columns.csv")
    with open(attr_path, "w") as f:
        f.write("col,block_kind,block_row,param_idx,col_norm\n")
        norms = column_norms(info)
        for c, (kind, row, param) in enumerate(info.col_owner):
            f.write(f"{c},{kind},{row},{param},{norms[c]}\n")
