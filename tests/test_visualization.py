"""Visualization artifact dumps render without error and produce files."""

import numpy as np

from obvi_slam_tpu import visualization as viz
from obvi_slam_tpu.runner import OptLogRecord


def test_topdown_plot(tmp_path):
    traj = np.zeros((20, 6))
    traj[:, 0] = np.arange(20) * 0.3
    traj[5] = np.nan
    objects = {0: ("chair", np.array([1.0, 0.5, 7, 0.3, 0.6, 0.6, 1.0]))}
    gt = {0: ("chair", np.array([1.1, 0.5, 7, 0.3, 0.6, 0.6, 1.0]))}
    p = tmp_path / "topdown.png"
    viz.plot_topdown_trajectory(str(p), {"est": traj}, objects, gt)
    assert p.exists() and p.stat().st_size > 1000


def test_iteration_costs(tmp_path):
    log = [
        OptLogRecord(i, False, 1, 0, 10, 100, 2, 100.0 / (i + 1), 10.0 / (i + 1), 5, "FUNCTION_TOLERANCE")
        for i in range(10)
    ]
    p = tmp_path / "costs.png"
    viz.plot_iteration_costs(str(p), log)
    assert p.exists()


def test_waypoint_cdfs(tmp_path):
    p = tmp_path / "cdf.png"
    viz.plot_waypoint_cdfs(
        str(p),
        {"ours": [0.1, 0.2, 0.05], "ref": [0.3, 0.4]},
        {"ours": [0.01, 0.02], "ref": [0.05]},
    )
    assert p.exists()


def test_feature_cloud(tmp_path):
    rng = np.random.default_rng(0)
    p = tmp_path / "cloud.png"
    viz.plot_feature_cloud(str(p), rng.normal(size=(100, 3)), np.zeros((5, 6)))
    assert p.exists()


def test_save_to_file_visualizer(tmp_path):
    """SaveToFileVisualizer (save_to_file_visualizer.h equivalent): dumps a
    per-camera debug image with associated/pending/predicted boxes and
    feature (re)projections drawn on it."""
    from obvi_slam_tpu.pose_graph import CameraInfo, PoseGraph

    K = np.array([[500.0, 0, 320.0], [0, 500.0, 240.0], [0, 0, 1.0]])
    pg = PoseGraph({1: CameraInfo(K, np.eye(3), np.zeros(3))})
    pg.shape_mean_and_cov_by_class = {
        "chair": (np.array([0.6, 0.6, 1.0]), np.eye(3) * 0.1)
    }
    pg.add_frame(0, np.zeros(6))
    pg.add_feature(7, np.array([0.5, 0.2, 8.0]))
    pg.add_visual_factor(0, 1, 7, np.array([352.0, 252.0]), 1.3)
    obj_id = pg.add_new_ellipsoid(
        np.array([1.0, 0.3, 7.0, 0.0, 0.6, 0.6, 1.0]), "chair"
    )
    pg.add_object_observation(
        obj_id, 0, 1, np.array([330.0, 420.0, 220.0, 330.0]), np.eye(4) * 900.0
    )

    class FakePending:
        class Obs:
            frame_id, camera_id = 0, 1
            corners = np.array([100.0, 160.0, 100.0, 180.0])

        observations = [Obs()]

    class FakeFrontend:
        pending = [FakePending()]

    v = viz.SaveToFileVisualizer(
        str(tmp_path),
        viz.SaveToFileVisualizerConfig(bounding_box_inflation_size=10.0),
        img_heights_and_widths={1: (480, 640)},
    )
    paths = v.bounding_box_front_end_visualization(pg, FakeFrontend(), 0)
    assert len(paths) == 1
    from PIL import Image

    img = np.asarray(Image.open(paths[0]))
    assert img.shape == (480, 640, 3)
    # Something got drawn in every color family: red associated box, purple
    # pending box, green predicted box, yellow feature dot.
    flat = img.reshape(-1, 3)
    for color in ((255, 0, 0), (186, 0, 247), (0, 200, 0), (255, 255, 0)):
        assert (flat == np.array(color)).all(axis=1).any(), color
    # Inflated associated box uses the FULL inflation per side (matching
    # inflateBoundingBox, ellipsoid_utils.h:354-361): brightened-red pixels
    # at exactly x_min - inflation.
    bright_red = np.array([255, 76, 76])
    xs = np.where((img == bright_red).all(axis=2))[1]
    assert xs.size and xs.min() in (319, 320, 321), xs.min()  # 330 - 10


def test_save_to_file_visualizer_behind_camera(tmp_path):
    """An ellipsoid behind the camera must NOT render a mirrored predicted
    box (the dual-quadric corner math is sign-symmetric; the visualizer
    gates on center depth)."""
    from obvi_slam_tpu.pose_graph import CameraInfo, PoseGraph

    K = np.array([[500.0, 0, 320.0], [0, 500.0, 240.0], [0, 0, 1.0]])
    pg = PoseGraph({1: CameraInfo(K, np.eye(3), np.zeros(3))})
    pg.shape_mean_and_cov_by_class = {
        "chair": (np.array([0.6, 0.6, 1.0]), np.eye(3) * 0.1)
    }
    pg.add_frame(0, np.zeros(6))
    pg.add_feature(3, np.array([0.0, 0.0, 8.0]))
    pg.add_visual_factor(0, 1, 3, np.array([320.0, 240.0]), 1.3)
    pg.add_new_ellipsoid(np.array([0.0, 0.0, -7.0, 0.0, 0.6, 0.6, 1.0]), "chair")

    v = viz.SaveToFileVisualizer(str(tmp_path), img_heights_and_widths={1: (480, 640)})
    paths = v.bounding_box_front_end_visualization(pg, None, 0)
    from PIL import Image

    img = np.asarray(Image.open(paths[0]))
    assert not (img.reshape(-1, 3) == np.array([0, 200, 0])).all(axis=1).any()


def test_save_to_file_visualizer_feature_validity_window(tmp_path):
    """Features observed within the validity window (past frames) are drawn;
    those outside it are not."""
    from obvi_slam_tpu.pose_graph import CameraInfo, PoseGraph

    K = np.array([[500.0, 0, 320.0], [0, 500.0, 240.0], [0, 0, 1.0]])
    pg = PoseGraph({1: CameraInfo(K, np.eye(3), np.zeros(3))})
    for i in range(6):
        pg.add_frame(i, np.zeros(6))
    pg.add_feature(1, np.array([0.0, 0.0, 8.0]))
    pg.add_visual_factor(0, 1, 1, np.array([100.0, 100.0]), 1.3)  # old
    pg.add_visual_factor(4, 1, 1, np.array([200.0, 200.0]), 1.3)  # in window

    v = viz.SaveToFileVisualizer(
        str(tmp_path),
        viz.SaveToFileVisualizerConfig(feature_validity_window=2),
        img_heights_and_widths={1: (480, 640)},
    )
    paths = v.bounding_box_front_end_visualization(
        pg, None, 5, draw_feature_reprojections=False
    )
    from PIL import Image

    img = np.asarray(Image.open(paths[0]))
    yellow = (img.reshape(-1, 3) == np.array([255, 255, 0])).all(axis=1)
    ys, xs = np.where((img == np.array([255, 255, 0])).all(axis=2))
    assert xs.size
    assert (np.abs(xs - 200) <= 3).all(), (xs.min(), xs.max())  # only the in-window dot
