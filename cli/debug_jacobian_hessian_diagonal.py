#!/usr/bin/env python
"""Hessian-diagonal / Jacobian debugging — ``debug_jacobian_hessian_diagonal``
and ``visualize_jacobian_problem_feats`` equivalent: loads a pose-graph
checkpoint, extracts the full sparse Jacobian at the current state, reports
zero/small columns (unconstrained parameters) and Hessian-diagonal stats, and
optionally dumps the sparse triplets + column attribution CSVs."""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--input_checkpoint_file", required=True)
    parser.add_argument("--params_config_file", required=True)
    parser.add_argument("--intrinsics_file", required=True)
    parser.add_argument("--extrinsics_file", required=True)
    parser.add_argument("--jacobian_output_file", default="")
    parser.add_argument("--min_col_norm", type=float, default=5e-4)
    parser.add_argument("--platform", default="")
    args = parser.parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import numpy as np

    from obvi_slam_tpu import config as cfg
    from obvi_slam_tpu import io as oio
    from obvi_slam_tpu.config import shape_prior_map
    from obvi_slam_tpu.io.readers import make_cameras
    from obvi_slam_tpu.pose_graph import PoseGraph
    from obvi_slam_tpu.solver import jacobian_debug as jd
    from obvi_slam_tpu.solver.problem import Scope, build_problem

    config = cfg.read_config(args.params_config_file)
    intrinsics = oio.read_camera_intrinsics(args.intrinsics_file)
    extrinsics = oio.read_camera_extrinsics(args.extrinsics_file)
    cameras, _ = make_cameras(intrinsics, extrinsics)
    with open(args.input_checkpoint_file) as f:
        pg = PoseGraph.from_state(json.load(f), cameras, shape_prior_map(config))

    en = config.optimization_factors_enabled_params
    scope = Scope(
        min_frame_id=0,
        max_frame_id=pg.max_frame_id(),
        min_object_observations=en.min_object_observations,
        min_low_level_feature_observations=en.min_low_level_feature_observations,
        min_low_level_feature_observations_per_frame=en.min_low_level_feature_observations_per_frame,
    )
    problem = build_problem(
        pg, scope, config.object_visual_pose_graph_residual_params
    )
    info = jd.extract_jacobian(
        problem.state, problem.cams, problem.tables, problem.huber
    )
    hdiag = jd.hessian_diagonal(info)
    free_cols = np.concatenate(
        [
            np.repeat(np.asarray(problem.free.poses), 6),
            np.repeat(np.asarray(problem.free.points), 3),
            np.repeat(np.asarray(problem.free.objects), 7),
        ]
    )
    zeros = jd.validate_zero_columns(info, free_cols)
    small = np.nonzero(
        (np.sqrt(np.maximum(hdiag, 0)) < args.min_col_norm) & free_cols
    )[0]
    print(
        f"Jacobian: {info.n_rows} rows x {info.n_cols} cols, "
        f"{len(info.vals)} nonzeros"
    )
    print(
        f"Hessian diag: min={hdiag.min():.3e} max={hdiag.max():.3e} "
        f"median={np.median(hdiag):.3e}"
    )
    print(f"zero columns (free params): {len(zeros)}")
    for kind, row, param, norm in zeros[:20]:
        print(f"  ZERO {kind}[{row}].{param} norm={norm:.2e}")
    print(f"columns below min_col_norm({args.min_col_norm}): {len(small)}")
    if args.jacobian_output_file:
        jd.write_jacobian_csv(info, args.jacobian_output_file)
        print(f"wrote {args.jacobian_output_file}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
