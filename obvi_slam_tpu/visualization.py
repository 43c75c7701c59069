"""Visualization artifact dumps — the RViz-free equivalent of the reference's
side-car visualization (``ros_visualization.h`` 20+ topics,
``save_to_file_visualizer.h`` debug image dumps).

Instead of live ROS topics, every stage can dump matplotlib artifacts:
top-down trajectory + object-map plots (``trajectory_sequence_topdown_plotter``
analog), per-solve cost curves (``iteration_plotter`` analog), and waypoint
CDFs (``waypoint_consistency_cdf_plotter`` analog). Headless (Agg backend).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
from matplotlib.patches import Ellipse


def _ensure(path):
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)


def plot_topdown_trajectory(
    path: str,
    trajectories: Dict[str, np.ndarray],
    objects: Optional[Dict[int, tuple]] = None,
    gt_objects: Optional[Dict[int, tuple]] = None,
    title: str = "top-down trajectory",
):
    """Top-down (x-y) plot of one or more trajectories + ellipsoid footprints.

    ``trajectories``: label -> (N, 6) raw poses (NaN rows = lost).
    ``objects`` / ``gt_objects``: obj_id -> (class, 7-vec ellipsoid).
    """
    _ensure(path)
    fig, ax = plt.subplots(figsize=(9, 9))
    for label, traj in trajectories.items():
        ax.plot(traj[:, 0], traj[:, 1], label=label, linewidth=1.2)
        ok = ~np.any(np.isnan(traj), axis=1)
        if ok.any():
            ax.plot(traj[ok, 0][0], traj[ok, 1][0], "o", markersize=6)

    def draw_objects(objs, color, label):
        first = True
        for obj_id, (cls, e) in objs.items():
            ell = Ellipse(
                (e[0], e[1]),
                width=e[4],
                height=e[5],
                angle=np.degrees(e[3]),
                fill=False,
                edgecolor=color,
                linewidth=1.5,
                label=label if first else None,
            )
            ax.add_patch(ell)
            ax.annotate(f"{obj_id}", (e[0], e[1]), fontsize=7, color=color)
            first = False

    if objects:
        draw_objects(objects, "tab:red", "objects (est)")
    if gt_objects:
        draw_objects(gt_objects, "tab:green", "objects (gt)")
    ax.set_aspect("equal")
    ax.set_xlabel("x [m]")
    ax.set_ylabel("y [m]")
    ax.legend(loc="best", fontsize=8)
    ax.set_title(title)
    ax.grid(alpha=0.3)
    fig.savefig(path, dpi=130, bbox_inches="tight")
    plt.close(fig)


def plot_iteration_costs(path: str, opt_log, title: str = "per-solve costs"):
    """Per-solve initial/final costs over frames (iteration_plotter analog).
    ``opt_log``: list of runner.OptLogRecord."""
    _ensure(path)
    fig, ax = plt.subplots(figsize=(10, 5))
    frames = [r.frame_id for r in opt_log]
    ax.semilogy(frames, [max(r.initial_cost, 1e-12) for r in opt_log], ".", label="initial", alpha=0.6)
    ax.semilogy(frames, [max(r.final_cost, 1e-12) for r in opt_log], ".", label="final", alpha=0.6)
    ax.set_xlabel("frame")
    ax.set_ylabel("cost")
    ax.legend()
    ax.set_title(title)
    ax.grid(alpha=0.3)
    fig.savefig(path, dpi=130, bbox_inches="tight")
    plt.close(fig)


def plot_waypoint_cdfs(
    path: str,
    transl_devs_by_approach: Dict[str, List[float]],
    rot_devs_by_approach: Optional[Dict[str, List[float]]] = None,
):
    """Waypoint-consistency CDFs (waypoint_consistency_cdf_plotter analog)."""
    _ensure(path)
    n_plots = 2 if rot_devs_by_approach else 1
    fig, axes = plt.subplots(1, n_plots, figsize=(6 * n_plots, 5), squeeze=False)
    ax = axes[0, 0]
    for label, devs in transl_devs_by_approach.items():
        if not devs:
            continue
        x = np.sort(devs)
        y = np.arange(1, len(x) + 1) / len(x)
        ax.plot(x, y, label=label)
    ax.set_xlabel("translation deviation [m]")
    ax.set_ylabel("proportion")
    ax.legend()
    ax.grid(alpha=0.3)
    if rot_devs_by_approach:
        ax2 = axes[0, 1]
        for label, devs in rot_devs_by_approach.items():
            if not devs:
                continue
            x = np.degrees(np.sort(devs))
            y = np.arange(1, len(x) + 1) / len(x)
            ax2.plot(x, y, label=label)
        ax2.set_xlabel("orientation deviation [deg]")
        ax2.set_ylabel("proportion")
        ax2.legend()
        ax2.grid(alpha=0.3)
    fig.savefig(path, dpi=130, bbox_inches="tight")
    plt.close(fig)


def plot_feature_cloud(path: str, points: np.ndarray, trajectory=None, title="features"):
    """3-D feature cloud + trajectory (RViz feature-cloud topic analog)."""
    _ensure(path)
    fig = plt.figure(figsize=(9, 7))
    ax = fig.add_subplot(projection="3d")
    ax.scatter(points[:, 0], points[:, 1], points[:, 2], s=2, alpha=0.5)
    if trajectory is not None:
        ax.plot(trajectory[:, 0], trajectory[:, 1], trajectory[:, 2], "r-", linewidth=2)
    ax.set_title(title)
    fig.savefig(path, dpi=130, bbox_inches="tight")
    plt.close(fig)
