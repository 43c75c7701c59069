"""Object pipeline tests: bounding-box data association, pending-object
mini-BA initialization, merges, and the full joint object-visual run."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from obvi_slam_tpu import config as cfg
from obvi_slam_tpu import geometry as geo
from obvi_slam_tpu.frontend import (
    FeatureBasedBoundingBoxFrontEnd,
    VisualFeatureFrontend,
    apply_merges,
    make_bb_frontend_hook,
    merge_objects_by_center_proximity,
)
from obvi_slam_tpu.offline_data import OfflineProblemData, RawBoundingBox
from obvi_slam_tpu.pose_graph import CameraInfo, PoseGraph
from obvi_slam_tpu.runner import OfflineProblemRunner

import jax.numpy as jnp

REF_CONFIG = "/root/reference/config/base7a_1_fallback_a_2.json"


def project_px(pose, point, cam: CameraInfo):
    rw = Rotation.from_rotvec(pose[3:]).as_matrix()
    p_robot = rw.T @ (point - pose[:3])
    p_cam = cam.extrinsics_r.T @ (p_robot - cam.extrinsics_t)
    if p_cam[2] <= 0.3:
        return None
    K = cam.intrinsics
    return np.array(
        [K[0, 0] * p_cam[0] / p_cam[2] + K[0, 2], K[1, 1] * p_cam[1] / p_cam[2] + K[1, 2]]
    )


def make_object_session(n_frames=14, seed=21):
    """Scene with 2 'chair' objects + surface features ON the objects (so the
    feature-overlap association signal works) + background features."""
    rng = np.random.default_rng(seed)
    K = np.array([[500.0, 0, 320.0], [0, 500.0, 240.0], [0, 0, 1.0]])
    cameras = {1: CameraInfo(K, np.eye(3), np.zeros(3))}

    gt_poses = np.zeros((n_frames, 6))
    gt_poses[:, 0] = np.arange(n_frames) * 0.2

    # chairs (class prior: mean [0.62, 0.62, 0.975])
    gt_objects = np.array(
        [
            [1.0, 0.5, 7.0, 0.0, 0.62, 0.62, 0.975],
            [-1.8, 0.4, 10.0, 0.0, 0.62, 0.62, 0.975],
        ]
    )

    # Features: 10 on each object surface + 20 background.
    feat_positions = {}
    fid = 0
    for k in range(2):
        for _ in range(10):
            offset = rng.uniform(-0.5, 0.5, 3) * gt_objects[k, 4:7]
            feat_positions[fid] = gt_objects[k, :3] + offset
            fid += 1
    for _ in range(20):
        feat_positions[fid] = np.array(
            [rng.uniform(-5, 5), rng.uniform(-2, 2), rng.uniform(4, 15)]
        )
        fid += 1

    feature_tracks = {}
    for j, pos in feat_positions.items():
        track = {}
        for i in range(n_frames):
            px = project_px(gt_poses[i], pos, cameras[1])
            if px is not None and 0 <= px[0] <= 640 and 0 <= px[1] <= 480:
                track[i] = {1: px + rng.normal(size=2) * 0.3}
        if len(track) >= 2:
            feature_tracks[j] = track

    # Bounding boxes: projected GT ellipsoid corners + noise.
    bounding_boxes = {}
    for i in range(n_frames):
        bbs = []
        for k in range(2):
            c, valid = geo.ellipsoid_corners_rectified(
                jnp.asarray(gt_objects[k]), jnp.asarray(gt_poses[i]), jnp.eye(3), jnp.zeros(3)
            )
            if not bool(valid):
                continue
            c = np.asarray(c)
            px = np.array(
                [
                    500.0 * c[0] + 320.0,
                    500.0 * c[1] + 320.0,
                    500.0 * c[2] + 240.0,
                    500.0 * c[3] + 240.0,
                ]
            ) + rng.normal(size=4) * 1.0
            if px[1] < 10 or px[0] > 630 or px[3] < 10 or px[2] > 470:
                continue
            bbs.append(RawBoundingBox(px, "chair", 0.9))
        if bbs:
            bounding_boxes[i] = {1: bbs}

    init_poses = {
        i: gt_poses[i] + np.concatenate([rng.normal(size=3) * 0.01, rng.normal(size=3) * 0.004])
        for i in range(n_frames)
    }
    init_poses[0] = gt_poses[0].copy()
    feature_init = {j: feat_positions[j] + rng.normal(size=3) * 0.05 for j in feature_tracks}

    data = OfflineProblemData(
        cameras=cameras,
        feature_tracks=feature_tracks,
        feature_init_positions=feature_init,
        initial_poses=init_poses,
        bounding_boxes=bounding_boxes,
    )
    return data, gt_poses, gt_objects


def make_frontend(pg, config):
    return FeatureBasedBoundingBoxFrontEnd(
        pg,
        config.feature_based_bb_association_params,
        config.bounding_box_covariance_generator_params,
        config.geometric_similarity_scorer_params,
        img_heights_and_widths={1: (480.0, 640.0)},
    )


def object_config():
    c = cfg.read_config(REF_CONFIG)
    c.sliding_window_params.local_ba_window_size = 6
    c.sliding_window_params.global_ba_frequency = 5
    en = c.optimization_factors_enabled_params
    en.use_pose_graph_on_global_ba = False
    en.use_pose_graph_on_final_global_ba = False
    en.use_visual_features_on_global_ba = True
    en.use_visual_features_on_final_global_ba = True
    en.min_low_level_feature_observations_per_frame = 10
    en.min_low_level_feature_observations = 3
    en.min_object_observations = 3
    fe = c.feature_based_bb_association_params
    fe.min_observations = 5
    fe.min_observations_for_local_est = 3
    fe.min_overlapping_features_for_match = 3.0
    for p in (c.local_ba_iteration_params, c.global_ba_iteration_params, c.final_ba_iteration_params):
        p.phase_one_opt_params.max_num_iterations = 15
        p.phase_two_opt_params.max_num_iterations = 20
    fe.pending_obj_estimator_params.solver_params.max_num_iterations = 30
    return c


class TestAssociation:
    def test_objects_created_and_consistently_associated(self):
        data, gt_poses, gt_objects = make_object_session()
        config = object_config()
        from obvi_slam_tpu.config import shape_prior_map

        pg = PoseGraph(data.cameras, shape_prior_map(config))
        # Ground-truth poses in the graph: isolates association from estimation.
        for i in range(len(gt_poses)):
            pg.add_frame(i, gt_poses[i])
        fe = make_frontend(pg, config)
        hook = make_bb_frontend_hook(fe)
        for i in range(len(gt_poses)):
            hook(data, pg, i)

        # Exactly 2 objects should exist (one per GT chair), near GT centers.
        assert len(pg.objects) == 2, (len(pg.objects), [o.ellipsoid[:3] for o in pg.objects.values()])
        ests = np.stack([pg.objects[o].ellipsoid[:3] for o in sorted(pg.objects)])
        # Match greedily to GT.
        d0 = min(np.linalg.norm(ests[0] - gt_objects[0][:3]), np.linalg.norm(ests[0] - gt_objects[1][:3]))
        d1 = min(np.linalg.norm(ests[1] - gt_objects[0][:3]), np.linalg.norm(ests[1] - gt_objects[1][:3]))
        assert d0 < 1.0 and d1 < 1.0, (ests, gt_objects)
        # All observations landed on the two objects.
        n_obs = sum(len(v) for v in pg.obj_obs_by_object.values())
        assert n_obs >= 16, n_obs

    def test_low_confidence_filtered(self):
        data, gt_poses, _ = make_object_session()
        config = object_config()
        pg = PoseGraph(data.cameras, {})
        pg.add_frame(0, gt_poses[0])
        fe = make_frontend(pg, config)
        bbs = [RawBoundingBox(np.array([100.0, 200, 100, 200]), "chair", 0.05)]
        fe.add_bounding_box_observations(0, 1, bbs, {})
        assert len(fe.pending) == 0 and len(pg.objects) == 0


class TestMerging:
    def test_center_proximity_merge(self):
        pg = PoseGraph({}, {})
        a = pg.add_new_ellipsoid([0, 0, 5, 0, 1, 1, 1], "chair")
        b = pg.add_new_ellipsoid([0.5, 0.1, 5.2, 0, 1, 1, 1], "chair")
        c = pg.add_new_ellipsoid([10, 0, 5, 0, 1, 1, 1], "chair")
        d = pg.add_new_ellipsoid([0.2, 0, 5.1, 0, 1, 1, 1], "bench")  # other class
        pg.add_object_observation(a, 0, 1, np.zeros(4), np.eye(4))
        pg.add_object_observation(b, 1, 1, np.zeros(4), np.eye(4))
        merges = merge_objects_by_center_proximity(pg, 2.0, x_y_only=True)
        assert merges == {b: {a}} or merges == {a: {b}}, merges
        assert apply_merges(pg, merges)
        assert len(pg.objects) == 3
        # Observations re-pointed to the survivor.
        survivor = list(merges.keys())[0]
        assert len(pg.obj_obs_by_object[survivor]) == 2

    def test_ltm_object_survives_merge(self):
        pg = PoseGraph({}, {})
        pg.add_ltm_object(7, [0, 0, 5, 0, 1, 1, 1], "chair")
        b = pg.add_new_ellipsoid([0.3, 0, 5, 0, 1, 1, 1], "chair")
        merges = merge_objects_by_center_proximity(pg, 2.0, x_y_only=True)
        assert merges == {7: {b}}
        apply_merges(pg, merges)
        assert 7 in pg.objects and b not in pg.objects


class TestJointEndToEnd:
    def test_full_object_visual_run(self):
        data, gt_poses, gt_objects = make_object_session()
        config = object_config()
        from obvi_slam_tpu.config import shape_prior_map
        from obvi_slam_tpu.runner import RunnerHooks

        pg = PoseGraph(data.cameras, shape_prior_map(config))
        fe = make_frontend(pg, config)
        hooks = RunnerHooks(bb_frontend=lambda d, p, f: make_bb_frontend_hook(fe)(d, p, f))

        def merger(pose_graph):
            merges = merge_objects_by_center_proximity(
                pose_graph,
                config.post_session_object_merge_params.max_merge_distance,
                config.post_session_object_merge_params.x_y_only_merge,
            )
            return apply_merges(pose_graph, merges, fe)

        hooks.object_merger = merger
        runner = OfflineProblemRunner(config, hooks)
        vf = VisualFeatureFrontend(
            gba_checker=lambda f: runner._gba_checker(f, data.max_frame_id()),
            reprojection_error_provider=lambda *a: 1.0,
        )
        ok = runner.run_optimization(data, pg, visual_frontend=vf)
        assert ok
        assert len(pg.objects) == 2, len(pg.objects)
        for obj_id, node in pg.objects.items():
            d = min(
                np.linalg.norm(node.ellipsoid[:3] - gt_objects[0][:3]),
                np.linalg.norm(node.ellipsoid[:3] - gt_objects[1][:3]),
            )
            assert d < 0.5, (obj_id, node.ellipsoid, d)
        # Trajectory still good.
        errs = [
            np.sum((pg.get_robot_pose(i)[:3] - gt_poses[i, :3]) ** 2)
            for i in range(len(gt_poses))
        ]
        assert np.sqrt(np.mean(errs)) < 0.05
