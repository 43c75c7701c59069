#!/usr/bin/env python
"""Multi-session sequence driver — the ``ltm_trajectory_sequence_executor.py``
equivalent (src/evaluation/ltm_trajectory_sequence_executor.py:44-85): runs
each session in a sequence, passing the previous session's long-term map as
the next session's input.

Sequence file: JSON list of session dicts, each with the per-session input
paths (same flags as offline_object_visual_slam_main minus the LTM chaining,
which this driver manages).
"""

import argparse
import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).parent.parent


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--sequence_file", required=True)
    parser.add_argument("--output_dir", required=True)
    parser.add_argument("--params_config_file", required=True)
    parser.add_argument("--platform", default="")
    args = parser.parse_args(argv)

    with open(args.sequence_file) as f:
        sessions = json.load(f)

    prev_ltm = None
    for i, session in enumerate(sessions):
        name = session.get("name", f"session_{i}")
        out = os.path.join(args.output_dir, name)
        os.makedirs(out, exist_ok=True)
        cmd = [
            sys.executable,
            str(REPO / "cli" / "offline_object_visual_slam_main.py"),
            "--params_config_file", args.params_config_file,
            "--intrinsics_file", session["intrinsics_file"],
            "--extrinsics_file", session["extrinsics_file"],
            "--poses_by_node_id_file", session["poses_by_node_id_file"],
            "--low_level_feats_dir", session["low_level_feats_dir"],
            "--long_term_map_output", os.path.join(out, "long_term_map.json"),
            "--robot_poses_results_file", os.path.join(out, "robot_poses.csv"),
            "--ellipsoids_results_file", os.path.join(out, "ellipsoids.csv"),
            "--visual_feature_results_file", os.path.join(out, "features.csv"),
            "--timing_report_file", os.path.join(out, "timing.json"),
            "--opt_log_file", os.path.join(out, "ceres_opt_summary.csv"),
        ]
        if session.get("bounding_boxes_by_node_id_file"):
            cmd += [
                "--bounding_boxes_by_node_id_file",
                session["bounding_boxes_by_node_id_file"],
            ]
        if prev_ltm:
            cmd += ["--long_term_map_input", prev_ltm]
        if args.platform:
            cmd += ["--platform", args.platform]
        print(f"[sequence] running {name} ...", flush=True)
        result = subprocess.run(cmd)
        if result.returncode != 0:
            print(f"[sequence] session {name} FAILED", file=sys.stderr)
            return result.returncode
        prev_ltm = os.path.join(out, "long_term_map.json")
    print("[sequence] all sessions complete")
    return 0


if __name__ == "__main__":
    sys.exit(main())
