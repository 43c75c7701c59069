#!/usr/bin/env python
"""Resume optimization from a serialized pose-graph checkpoint —
``run_opt_from_pg_state`` equivalent (src/refactoring/run_opt_from_pg_state.cpp):
loads the checkpointed pose graph, restarts the per-frame loop at
``--start_at_frame`` (frames before it are already in the graph), and
re-extracts results."""

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
    parser.add_argument("--poses_by_node_id_file", required=True)
    parser.add_argument("--bounding_boxes_by_node_id_file", default="")
    parser.add_argument("--low_level_feats_dir", required=True)
    parser.add_argument("--start_at_frame", type=int, required=True)
    parser.add_argument("--run_data_adder_for_first_frame", action="store_true")
    parser.add_argument("--robot_poses_results_file", default="")
    parser.add_argument("--ellipsoids_results_file", default="")
    parser.add_argument("--long_term_map_output", default="")
    parser.add_argument("--platform", default="")
    args = parser.parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from obvi_slam_tpu import config as cfg
    from obvi_slam_tpu import io as oio
    from obvi_slam_tpu.config import shape_prior_map
    from obvi_slam_tpu.frontend import (
        FeatureBasedBoundingBoxFrontEnd,
        VisualFeatureFrontend,
        apply_merges,
        make_bb_frontend_hook,
        merge_objects_by_center_proximity,
    )
    from obvi_slam_tpu.io.readers import make_cameras
    from obvi_slam_tpu.ltm import extract_long_term_object_map
    from obvi_slam_tpu.offline_data import OfflineProblemData
    from obvi_slam_tpu.pose_graph import PoseGraph
    from obvi_slam_tpu.runner import OfflineProblemRunner, RunnerHooks

    config = cfg.read_config(args.params_config_file)
    intrinsics = oio.read_camera_intrinsics(args.intrinsics_file)
    extrinsics = oio.read_camera_extrinsics(args.extrinsics_file)
    cameras, img_hw = make_cameras(intrinsics, extrinsics)
    initial_poses = oio.read_poses_by_node_id(args.poses_by_node_id_file)
    bounding_boxes = (
        oio.read_bounding_boxes_by_node_id(args.bounding_boxes_by_node_id_file)
        if args.bounding_boxes_by_node_id_file
        else {}
    )
    tracks, init_positions = oio.read_orb_output_directory(args.low_level_feats_dir)
    data = OfflineProblemData(
        cameras=cameras,
        feature_tracks=tracks,
        feature_init_positions=init_positions,
        initial_poses=initial_poses,
        bounding_boxes=bounding_boxes,
    )

    with open(args.input_checkpoint_file) as f:
        state = json.load(f)
    pg = PoseGraph.from_state(state, cameras, shape_prior_map(config))
    print(
        f"resumed checkpoint: {len(pg.robot_poses)} frames, "
        f"{len(pg.features)} features, {len(pg.objects)} objects"
    )

    bb_frontend = FeatureBasedBoundingBoxFrontEnd(
        pg,
        config.feature_based_bb_association_params,
        config.bounding_box_covariance_generator_params,
        config.geometric_similarity_scorer_params,
        img_heights_and_widths=img_hw,
    )
    hooks = RunnerHooks(
        bb_frontend=make_bb_frontend_hook(bb_frontend) if bounding_boxes else None
    )
    hooks.object_merger = lambda p: apply_merges(
        p,
        merge_objects_by_center_proximity(
            p,
            config.post_session_object_merge_params.max_merge_distance,
            config.post_session_object_merge_params.x_y_only_merge,
        ),
        bb_frontend,
    )
    runner = OfflineProblemRunner(config, hooks)
    max_frame = max(initial_poses)
    # Visual frontend state: features already in the graph are marked added so
    # their new observations go through the epipolar gate.
    vf = VisualFeatureFrontend(
        gba_checker=lambda fr: runner._gba_checker(fr, max_frame),
        reprojection_error_provider=lambda *a: config.visual_feature_params.reprojection_error_std_dev,
    )
    vf.added_feature_ids = set(pg.features)

    ok = runner.run_optimization(
        data,
        pg,
        visual_frontend=vf,
        start_at_frame=args.start_at_frame,
        add_data_for_starting_frame=args.run_data_adder_for_first_frame,
    )
    if not ok:
        return 1
    if args.robot_poses_results_file:
        oio.write_robot_pose_results(args.robot_poses_results_file, pg)
    if args.ellipsoids_results_file:
        oio.write_ellipsoid_results(args.ellipsoids_results_file, pg)
    if args.long_term_map_output:
        ltm = extract_long_term_object_map(
            pg, config, bb_frontend.get_front_end_obj_map_data()
        )
        if ltm is not None:
            ltm.save(args.long_term_map_output)
    print(f"resume complete: {len(pg.robot_poses)} frames, {len(pg.objects)} objects")
    return 0


if __name__ == "__main__":
    sys.exit(main())
