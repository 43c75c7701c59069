#!/usr/bin/env python
"""Re-run LTM extraction from a pose-graph checkpoint —
``ltm_extraction_only`` equivalent."""

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
    parser.add_argument("--long_term_map_output", required=True)
    parser.add_argument("--previous_long_term_map", default="")
    parser.add_argument("--platform", default="")
    args = parser.parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from obvi_slam_tpu import config as cfg
    from obvi_slam_tpu import io as oio
    from obvi_slam_tpu.config import shape_prior_map
    from obvi_slam_tpu.io.readers import make_cameras
    from obvi_slam_tpu.ltm import LongTermObjectMap, extract_long_term_object_map
    from obvi_slam_tpu.pose_graph import PoseGraph

    config = cfg.read_config(args.params_config_file)
    intrinsics = oio.read_camera_intrinsics(args.intrinsics_file)
    extrinsics = oio.read_camera_extrinsics(args.extrinsics_file)
    cameras, _ = make_cameras(intrinsics, extrinsics)
    with open(args.input_checkpoint_file) as f:
        pg = PoseGraph.from_state(json.load(f), cameras, shape_prior_map(config))
    prev = (
        LongTermObjectMap.load(args.previous_long_term_map)
        if args.previous_long_term_map
        else None
    )
    ltm = extract_long_term_object_map(pg, config, {}, prev_ltm=prev)
    if ltm is None:
        print("LTM extraction failed", file=sys.stderr)
        return 1
    ltm.save(args.long_term_map_output)
    print(f"extracted LTM with {len(ltm.ellipsoids)} objects")
    return 0


if __name__ == "__main__":
    sys.exit(main())
