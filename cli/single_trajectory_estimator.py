#!/usr/bin/env python
"""One-session estimator with preprocessing — ``single_trajectory_estimator.py``
equivalent (src/evaluation/single_trajectory_estimator.py): optionally runs
the ORB post-processing chain (unprojection + sparsification) and then the
main pipeline."""

import argparse
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).parent.parent


def run(cmd):
    print("[estimator]", " ".join(str(c) for c in cmd), flush=True)
    r = subprocess.run([sys.executable] + [str(c) for c in cmd])
    if r.returncode != 0:
        sys.exit(r.returncode)


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--params_config_file", required=True)
    parser.add_argument("--intrinsics_file", required=True)
    parser.add_argument("--extrinsics_file", required=True)
    parser.add_argument("--orb_out_dir", required=True, help="reformatted ORB output")
    parser.add_argument(
        "--raw_orb_matches_dir",
        default="",
        help="raw stereo-ORB match files; when given, reformatted into "
        "--orb_out_dir first (reference runOrbPostProcess step 1, "
        "single_trajectory_estimator.py:119-176)",
    )
    parser.add_argument("--raw_data_path", default="", help="velocities/depths for unprojection")
    parser.add_argument("--calibration_path", default="")
    parser.add_argument("--bounding_boxes_by_node_id_file", default="")
    parser.add_argument("--long_term_map_input", default="")
    parser.add_argument("--output_dir", required=True)
    parser.add_argument("--sparsify", action="store_true")
    parser.add_argument("--max_pose_inc_threshold_transl", type=float, default=0.2)
    parser.add_argument("--max_pose_inc_threshold_rot", type=float, default=0.1)
    parser.add_argument("--platform", default="")
    args = parser.parse_args(argv)

    os.makedirs(args.output_dir, exist_ok=True)
    if args.raw_orb_matches_dir:
        run(
            [
                REPO / "cli" / "orb_stereo_reformat_data.py",
                "-i", args.raw_orb_matches_dir,
                "-o", args.orb_out_dir,
            ]
        )
    feats_dir = args.orb_out_dir
    poses_file = os.path.join(feats_dir, "poses", "initial_robot_poses_by_node.txt")

    # Preprocessing: unproject (if raw data given), then sparsify.
    if args.raw_data_path:
        run(
            [
                REPO / "cli" / "initialize_traj_and_feats_from_orb_out.py",
                "--raw_data_path", args.raw_data_path,
                "--calibration_path", args.calibration_path,
                "--processed_data_path", args.orb_out_dir,
                "--poses_out_file", poses_file,
            ]
        )
    if args.sparsify:
        sparse_dir = os.path.join(args.output_dir, "sparsified_orb_out")
        sparse_poses = os.path.join(args.output_dir, "sparsified_poses.csv")
        run(
            [
                REPO / "cli" / "orb_trajectory_sparsifier.py",
                "--input_poses_file", poses_file,
                "--input_feature_obs_dir", feats_dir,
                "--output_poses_file", sparse_poses,
                "--output_feature_obs_dir", sparse_dir,
                "--max_pose_inc_threshold_transl", args.max_pose_inc_threshold_transl,
                "--max_pose_inc_threshold_rot", args.max_pose_inc_threshold_rot,
            ]
        )
        feats_dir = sparse_dir
        poses_file = sparse_poses

    cmd = [
        REPO / "cli" / "offline_object_visual_slam_main.py",
        "--params_config_file", args.params_config_file,
        "--intrinsics_file", args.intrinsics_file,
        "--extrinsics_file", args.extrinsics_file,
        "--poses_by_node_id_file", poses_file,
        "--low_level_feats_dir", feats_dir,
        "--long_term_map_output", os.path.join(args.output_dir, "long_term_map.json"),
        "--robot_poses_results_file", os.path.join(args.output_dir, "robot_poses.csv"),
        "--ellipsoids_results_file", os.path.join(args.output_dir, "ellipsoids.csv"),
        "--visual_feature_results_file", os.path.join(args.output_dir, "features.csv"),
        "--checkpoint_output_dir", os.path.join(args.output_dir, "checkpoints"),
        "--timing_report_file", os.path.join(args.output_dir, "timing.json"),
        "--opt_log_file", os.path.join(args.output_dir, "ceres_opt_summary.csv"),
    ]
    if args.bounding_boxes_by_node_id_file:
        cmd += ["--bounding_boxes_by_node_id_file", args.bounding_boxes_by_node_id_file]
    if args.long_term_map_input:
        cmd += ["--long_term_map_input", args.long_term_map_input]
    if args.platform:
        cmd += ["--platform", args.platform]
    run(cmd)
    return 0


if __name__ == "__main__":
    sys.exit(main())
