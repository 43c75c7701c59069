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
