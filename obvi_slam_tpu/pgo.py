"""Pose-graph + objects optimization for global-BA frames.

Port of ``runPgoPlusEllipsoids`` (``pose_graph_plus_objects_optimizer.h:24-353``)
and the pre-PGO tracking solve (``offline_problem_runner.h:440-497``):

  1. tracking: short local BA over the last few poses (scope min =
     frame - poses_prior_to_window_to_keep_constant)
  2. PGO: synthesize a relative-pose factor between EVERY consecutive pose
     pair from the current estimates, covariance from the PGO odom model;
     optimize poses + objects with visual factors off
  3. analytically re-anchor every feature to its first-observation frame
     (enable_visual_non_opt_feature_adjustment_post_pgo)
  4. feature-only BA with poses and objects fixed
     (enable_visual_feats_only_opt_post_pgo)
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import numpy as np

from obvi_slam_tpu.solver.problem import (
    Scope,
    build_problem,
    update_caps_pool,
    write_back,
)
from obvi_slam_tpu.timing import timer


def _pose_to_rt(pose):
    from scipy.spatial.transform import Rotation

    return Rotation.from_rotvec(pose[3:6]).as_matrix(), pose[:3]


def run_tracking_solve(runner, data, pg, next_frame_id):
    """Pre-PGO tracking solve (offline_problem_runner.h:440-497)."""
    from obvi_slam_tpu.runner import lm_params_from_config

    en = runner.config.optimization_factors_enabled_params
    min_frame = max(0, next_frame_id - en.poses_prior_to_window_to_keep_constant)
    scope = runner._scope(min_frame, next_frame_id)
    with timer("obj_only_pgo_local_track_build"):
        problem = runner.build_problem_synced(pg, scope, "pgo_tracking")
    with timer("obj_only_pgo_local_track_solve"):
        state, summary = runner.solve(
            problem,
            lm_params_from_config(
                runner.config.pgo_solver_params.pre_pgo_tracking_solver_params
            ),
        )
    runner.write_back_synced("pgo_tracking", pg, problem, state)
    from obvi_slam_tpu import optlog

    optlog.IterationLoggerFactory.instance().log_iterations(
        optlog.PRE_PGO_TRACK_TYPE,
        str(next_frame_id),
        summary,
        runner._num_free_params(problem),
    )
    return summary


def run_pgo_plus_ellipsoids(runner, data, pg, max_frame_id, final_run, attempt_num=0):
    from obvi_slam_tpu.runner import generate_odom_cov, lm_params_from_config
    from scipy.spatial.transform import Rotation

    pgo_params = runner.config.pgo_solver_params

    # 1. Synthesize consecutive relative-pose factors from current estimates.
    with timer("obj_only_pgo_build_pgo"):
        synthesized: List[Tuple[int, int, np.ndarray, np.ndarray]] = []
        for frame in range(1, max_frame_id + 1):
            before = pg.get_robot_pose(frame - 1)
            after = pg.get_robot_pose(frame)
            if before is None or after is None:
                return False
            rb, tb = _pose_to_rt(before)
            ra, ta = _pose_to_rt(after)
            rel = np.concatenate(
                [rb.T @ (ta - tb), Rotation.from_matrix(rb.T @ ra).as_rotvec()]
            )
            cov = generate_odom_cov(rel, pgo_params.relative_pose_cov_params)
            synthesized.append((frame - 1, frame, rel, cov))

        # Record feature positions relative to their first-observation frame.
        rel_positions_from_first = {}
        if pgo_params.enable_visual_non_opt_feature_adjustment_post_pgo:
            for feat_id, pos in pg.features.items():
                first = pg.first_frame_for_feature.get(feat_id)
                if first is None:
                    continue
                pose = pg.get_robot_pose(first)
                if pose is None:
                    continue
                r, t = _pose_to_rt(pose)
                rel_positions_from_first[feat_id] = (first, r.T @ (pos - t))

        scope = dataclasses.replace(
            runner._scope(0, max_frame_id),
            include_visual_factors=False,
            poses_prior_to_window_to_keep_constant=1,
        )
        problem = runner.build_problem_synced(
            pg,
            scope,
            "pgo",
            synthesized_relpose=synthesized,
            relpose_huber_override=pgo_params.relative_pose_factor_huber_loss,
        )
        # PGO runs only on global-BA frames: shard on the runner's mesh.
        if not runner._sync_enabled():
            problem = runner._maybe_shard(problem, True)

    with timer("obj_only_pgo_solve_pgo"):
        solver_params = (
            pgo_params.final_pgo_optimization_solver_params
            if final_run
            else pgo_params.pgo_optimization_solver_params
        )
        state, summary = runner.solve(
            problem, lm_params_from_config(solver_params)
        )
    runner.write_back_synced("pgo", pg, problem, state)
    from obvi_slam_tpu import optlog

    optlog.IterationLoggerFactory.instance().log_iterations(
        optlog.PGO_TYPE, str(max_frame_id), summary, runner._num_free_params(problem)
    )
    runner._log_solve(problem, summary, max_frame_id, True, 0, attempt_num)

    # 3. Analytic feature re-anchoring (:238-283).
    if pgo_params.enable_visual_non_opt_feature_adjustment_post_pgo:
        with timer("obj_only_pgo_manual_feat_adjust"):
            for feat_id, (first, rel) in rel_positions_from_first.items():
                pose = pg.get_robot_pose(first)
                if pose is None:
                    continue
                r, t = _pose_to_rt(pose)
                pg.features[feat_id] = r @ rel + t

    # 4. Feature-only BA with poses and objects fixed (:284-350).
    if pgo_params.enable_visual_feats_only_opt_post_pgo:
        vf_scope = dataclasses.replace(
            runner._scope(0, max_frame_id),
            fix_poses=True,
            fix_objects=True,
            include_object_factors=False,
        )
        with timer("obj_only_pgo_opt_feat_adjust_build"):
            vf_problem = runner.build_problem_synced(
                pg, vf_scope, "pgo_vf", use_registry=True
            )
            if not runner._sync_enabled():
                vf_problem = runner._maybe_shard(vf_problem, True)
        with timer("obj_only_pgo_opt_feat_adjust_solve"):
            vf_params = (
                pgo_params.final_post_pgo_vf_adjustment_solver_params
                if final_run
                else pgo_params.post_pgo_vf_adjustment_solver_params
            )
            vf_state, vf_summary = runner.solve(
                vf_problem, lm_params_from_config(vf_params)
            )
            optlog.IterationLoggerFactory.instance().log_iterations(
                optlog.VF_ADJUST_TYPE,
                str(max_frame_id),
                vf_summary,
                runner._num_free_params(vf_problem),
            )
        runner.write_back_synced("pgo_vf", pg, vf_problem, vf_state)
    return True
