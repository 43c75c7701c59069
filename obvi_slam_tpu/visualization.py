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


# ---------------------------------------------------------------------------
# Per-frame debug image dumps — SaveToFileVisualizer equivalent
# (save_to_file_visualizer.h:26-116 + debugging_image_utils.h), headless:
# PIL canvases (real camera images when an image provider is given, neutral
# background otherwise) instead of sensor_msgs::Image mosaics on ROS topics.


def _bb_color_table():
    """Reference colors (save_to_file_visualizer.h:36-45): associated = red,
    pending = light blue/magenta-ish (186/255, 0, 247/255); inflated variants
    are the same colors brightened by 0.3."""

    def brighten(c, amount=0.3):
        return tuple(int(v + (255 - v) * amount) for v in c)

    assoc = (255, 0, 0)
    pending = (186, 0, 247)
    return {
        "associated": assoc,
        "associated_inflated": brighten(assoc),
        "pending": pending,
        "pending_inflated": brighten(pending),
        "predicted": (0, 200, 0),
        "feature": (255, 255, 0),
        "feature_reproj": (0, 255, 255),
    }


class SaveToFileVisualizerConfig:
    """SaveToFileBbFrontEndVisualizerConfig (save_to_file_visualizer.h:17-24)."""

    def __init__(
        self, feature_validity_window: int = 2**31 - 1,
        bounding_box_inflation_size: float = 0.0,
    ):
        self.feature_validity_window = feature_validity_window
        self.bounding_box_inflation_size = bounding_box_inflation_size


class SaveToFileVisualizer:
    """Dump per-(frame, camera) bounding-box-association debug images.

    Drawn per image (matching boundingBoxFrontEndVisualization's content,
    save_to_file_visualizer.h:48-116):
      - associated bbs (red) = object-observation factors in the pose graph,
        labeled with their object id, plus the inflated box when
        ``bounding_box_inflation_size`` > 0 (brightened color);
      - pending bbs (light purple) = observations of not-yet-initialized
        objects from the bb frontend;
      - predicted bbs (green) = current ellipsoid estimates projected through
        the dual-quadric corner math (the visual BA residual, so the gap
        observed-vs-predicted IS the current bbox residual);
      - visual features observed within ``feature_validity_window`` frames
        (yellow dots) and, optionally, their reprojections through the
        current pose/point estimates (cyan dots) — the feature-residual
        overlay from RosVisualization's publishLatestImageWithReprojection.

    ``image_provider(frame_id, cam_id) -> np.ndarray | PIL.Image | None``
    supplies real camera images when available; otherwise a neutral canvas of
    ``img_heights_and_widths`` is used.
    """

    def __init__(
        self,
        output_directory: str,
        config: SaveToFileVisualizerConfig = None,
        image_provider=None,
        img_heights_and_widths: Optional[Dict[int, tuple]] = None,
    ):
        self.out_dir = output_directory
        self.config = config or SaveToFileVisualizerConfig()
        self.image_provider = image_provider
        self.img_hw = img_heights_and_widths or {}
        self.colors = _bb_color_table()
        if output_directory:
            os.makedirs(output_directory, exist_ok=True)

    # -- drawing helpers ----------------------------------------------------
    def _canvas(self, frame_id, cam_id):
        from PIL import Image

        img = None
        if self.image_provider is not None:
            img = self.image_provider(frame_id, cam_id)
        if img is not None:
            arr = np.asarray(img)
            if arr.ndim == 2:
                arr = np.stack([arr] * 3, axis=-1)
            return Image.fromarray(arr.astype(np.uint8), "RGB")
        h, w = self.img_hw.get(cam_id, (480, 640))
        return Image.new("RGB", (int(w), int(h)), (40, 40, 40))

    @staticmethod
    def _draw_box(draw, corners, color, label=None, width=2):
        x_min, x_max, y_min, y_max = [float(c) for c in corners]
        if x_max < x_min or y_max < y_min:
            return
        draw.rectangle([x_min, y_min, x_max, y_max], outline=color, width=width)
        if label is not None:
            draw.text((x_min + 2, y_min + 2), str(label), fill=color)

    def _inflate(self, corners):
        # Full inflation_size per side, matching inflateBoundingBox
        # (ellipsoid_utils.h:354-361) and the frontend's association region.
        d = self.config.bounding_box_inflation_size
        return [corners[0] - d, corners[1] + d, corners[2] - d, corners[3] + d]

    # -- main hook ------------------------------------------------------
    def bounding_box_front_end_visualization(
        self, pg, bb_frontend, frame_id, draw_feature_reprojections: bool = True
    ):
        """Render and save one debug image per camera seen at ``frame_id``."""
        if not self.out_dir:
            return []
        from PIL import ImageDraw

        from obvi_slam_tpu import geometry as geo

        cam_ids = set()
        assoc = []  # (cam, corners, obj_id)
        for f in pg.object_observations:
            if f.frame_id == frame_id:
                cam_ids.add(f.camera_id)
                assoc.append((f.camera_id, f.corners, f.object_id))
        pending = []  # (cam, corners)
        if bb_frontend is not None:
            for pend in getattr(bb_frontend, "pending", []):
                for obs in pend.observations:
                    if obs.frame_id == frame_id:
                        cam_ids.add(obs.camera_id)
                        pending.append((obs.camera_id, obs.corners))
        feats = []  # (cam, pixel, feature_id)
        lo = max(0, frame_id - self.config.feature_validity_window)
        for past_frame in range(lo, frame_id + 1):
            for fac_idx in pg.visual_factors_by_frame.get(past_frame, []):
                f = pg.visual_factors[fac_idx]
                cam_ids.add(f.camera_id)
                feats.append((f.camera_id, f.pixel, f.feature_id))
        if not cam_ids:
            return []

        pose = pg.get_robot_pose(frame_id)
        pose_arr = None if pose is None else np.asarray(pose)
        paths = []
        for cam_id in sorted(cam_ids):
            img = self._canvas(frame_id, cam_id)
            draw = ImageDraw.Draw(img)
            cam_info = pg.cameras[cam_id]
            k = cam_info.intrinsics
            cam_from_robot_r = cam_info.extrinsics_r.T
            cam_from_robot_t = -cam_info.extrinsics_r.T @ cam_info.extrinsics_t
            # Predicted bbs from current ellipsoid estimates.
            if pose_arr is not None:
                for obj_id, node in pg.objects.items():
                    # Cheirality: the corner math is sign-symmetric, so an
                    # ellipsoid BEHIND the camera yields a finite mirrored
                    # box — gate on the center's camera-frame depth.
                    _, center_depth = geo.project_point_rectified(
                        pose_arr, np.asarray(node.ellipsoid[:3]),
                        cam_from_robot_r, cam_from_robot_t,
                    )
                    if float(center_depth) <= 0:
                        continue
                    corners_rect, valid = geo.ellipsoid_corners_rectified(
                        node.ellipsoid, pose_arr,
                        cam_from_robot_r, cam_from_robot_t,
                    )
                    if not bool(valid):
                        continue
                    cr = np.asarray(corners_rect)
                    px = [
                        k[0, 0] * cr[0] + k[0, 2], k[0, 0] * cr[1] + k[0, 2],
                        k[1, 1] * cr[2] + k[1, 2], k[1, 1] * cr[3] + k[1, 2],
                    ]
                    if px[1] < 0 or px[0] > img.width or px[3] < 0 or px[2] > img.height:
                        continue
                    self._draw_box(
                        draw, px, self.colors["predicted"], label=f"p{obj_id}", width=1
                    )
            for bb_cam_id, corners, obj_id in assoc:
                if bb_cam_id != cam_id:
                    continue
                self._draw_box(draw, corners, self.colors["associated"], label=obj_id)
                if self.config.bounding_box_inflation_size > 0:
                    self._draw_box(
                        draw, self._inflate(corners),
                        self.colors["associated_inflated"], width=1,
                    )
            for bb_cam_id, corners in pending:
                if bb_cam_id != cam_id:
                    continue
                self._draw_box(draw, corners, self.colors["pending"])
                if self.config.bounding_box_inflation_size > 0:
                    self._draw_box(
                        draw, self._inflate(corners),
                        self.colors["pending_inflated"], width=1,
                    )
            for feat_cam_id, pixel, feat_id in feats:
                if feat_cam_id != cam_id:
                    continue
                x, y = float(pixel[0]), float(pixel[1])
                draw.ellipse([x - 2, y - 2, x + 2, y + 2], fill=self.colors["feature"])
                if draw_feature_reprojections and pose_arr is not None:
                    pt = pg.features.get(feat_id)
                    if pt is None:
                        continue
                    xy, depth = geo.project_point_rectified(
                        pose_arr, np.asarray(pt),
                        cam_from_robot_r, cam_from_robot_t,
                    )
                    if float(depth) <= 0:
                        continue
                    rx = float(k[0, 0] * xy[0] + k[0, 2])
                    ry = float(k[1, 1] * xy[1] + k[1, 2])
                    draw.ellipse(
                        [rx - 2, ry - 2, rx + 2, ry + 2],
                        outline=self.colors["feature_reproj"],
                    )
                    draw.line([x, y, rx, ry], fill=self.colors["feature_reproj"])
            path = os.path.join(
                self.out_dir, f"bb_assoc_frame_{frame_id:06d}_cam_{cam_id}.png"
            )
            img.save(path)
            paths.append(path)
        return paths
