#!/usr/bin/env python
"""Re-key estimated poses from frame/node id to timestamp —
``utvslam_out_to_poses_by_timestamp`` equivalent
(reference: src/evaluation/trajectory_formatting/utvslam_out_to_poses_by_timestamp.cpp).

Inputs: the robot-pose results CSV written by the main pipeline
(node_id keyed) and a node-id→timestamp map; output is the
optional-pose-by-timestamp CSV consumed by the metrics tooling. Nodes
missing from the results are reported and skipped (the reference does the
same — utvslam_out_to_poses_by_timestamp.cpp:60-71)."""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from obvi_slam_tpu.io import timestamped as tio


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--poses_by_frame_file", required=True,
                        help="robot pose results CSV (node_id,tx,..,qw)")
    parser.add_argument("--frames_for_timestamps_file", required=True,
                        help="CSV: node_id,seconds,nanoseconds (header)")
    parser.add_argument("--poses_by_timestamp_out_file", required=True)
    args = parser.parse_args(argv)

    poses = tio.read_robot_pose_results(args.poses_by_frame_file)
    nodes_ts = tio.read_node_ids_and_timestamps(args.frames_for_timestamps_file)

    entries = []
    for node_id, ts in nodes_ts:
        if node_id not in poses:
            print(
                f"ERROR: no pose for node {node_id} "
                f"(timestamp {ts[0]}, {ts[1]}); skipping",
                file=sys.stderr,
            )
            continue
        entries.append((ts, poses[node_id]))

    tio.write_optional_poses_with_timestamps(
        args.poses_by_timestamp_out_file, entries
    )


if __name__ == "__main__":
    main()
