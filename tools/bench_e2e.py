"""End-to-end throughput bench: the TUM fr2_pioneer_360 minimum slice
(BASELINE.md workload) through the full runner — frontend, sliding-window +
global BA with two-phase outlier rejection — reporting frames/s and the
per-phase breakdown with the reference's timer names.

Runs on whatever backend jax resolves (TPU via the tunnel when up; pass
--platform cpu to force CPU). Complements bench.py (pure solver LM iters/s):
this measures the whole pipeline including host-side build and frontend.

Usage: python tools/bench_e2e.py [--frames 40] [--platform cpu] [--f64]
"""

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).parent.parent / "tests"))


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--frames", type=int, default=40)
    parser.add_argument(
        "--repeat", type=int, default=1,
        help="run the session N times IN-PROCESS (fresh pose graph/runner "
        "each time, warm jit caches after run 1) — run 1 is the "
        "cold-process number, later runs are the warm-server number a "
        "long-lived deployment sees",
    )
    parser.add_argument("--platform", default="")
    parser.add_argument("--f64", action="store_true")
    parser.add_argument("--fused_solver", choices=("auto", "on", "off"), default="auto")
    parser.add_argument(
        "--no_sync", action="store_true",
        help="disable the device-resident session tables (A/B isolation)",
    )
    parser.add_argument(
        "--json_out", default="", help="also write results as JSON to this path"
    )
    args = parser.parse_args(argv)

    import jax

    # Same persistent compile cache as bench.py: a cold e2e run is compile-
    # dominated (40 TUM frames: 921 s cold vs the warm device time), and the
    # driver runs this tier under a budget.
    jax.config.update(
        "jax_compilation_cache_dir",
        str(pathlib.Path(__file__).parent.parent / ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.f64:
        jax.config.update("jax_enable_x64", True)

    import numpy as np
    from scipy.spatial.transform import Rotation

    import test_tum_fixture as T
    from obvi_slam_tpu import timing
    from obvi_slam_tpu.frontend import VisualFeatureFrontend
    from obvi_slam_tpu.io.readers import read_tum_consecutive_matching
    from obvi_slam_tpu.offline_data import OfflineProblemData
    from obvi_slam_tpu.pose_graph import CameraInfo, PoseGraph
    from obvi_slam_tpu.runner import OfflineProblemRunner

    gt_poses, tracks, _ = read_tum_consecutive_matching(
        T.TUM_DIR, max_frames=args.frames
    )
    cameras = {1: CameraInfo(T.K, np.eye(3), np.zeros(3))}
    k_inv = np.linalg.inv(T.K)
    rng = np.random.default_rng(17)
    init_poses = {0: gt_poses[0].copy()}
    for i in range(1, len(gt_poses)):
        rp = Rotation.from_rotvec(gt_poses[i - 1][3:]).as_matrix()
        rc = Rotation.from_rotvec(gt_poses[i][3:]).as_matrix()
        rel_t = rp.T @ (gt_poses[i][:3] - gt_poses[i - 1][:3]) + rng.normal(size=3) * 0.02
        rel_w = Rotation.from_matrix(rp.T @ rc).as_rotvec() + rng.normal(size=3) * 0.006
        rpi = Rotation.from_rotvec(init_poses[i - 1][3:]).as_matrix()
        init_poses[i] = np.concatenate(
            [
                rpi @ rel_t + init_poses[i - 1][:3],
                Rotation.from_matrix(
                    rpi @ Rotation.from_rotvec(rel_w).as_matrix()
                ).as_rotvec(),
            ]
        )
    feature_init, usable = {}, {}
    for f, t in tracks.items():
        if len(t) < 3:
            continue
        x = T.triangulate(t, gt_poses, k_inv)
        fr0 = min(t)
        rw = Rotation.from_rotvec(gt_poses[fr0][3:]).as_matrix()
        pc = rw.T @ (x - gt_poses[fr0][:3])
        if 0.3 < pc[2] < 30 and np.linalg.norm(x) < 50:
            feature_init[f] = x
            usable[f] = t

    data = OfflineProblemData(
        cameras=cameras,
        feature_tracks=usable,
        feature_init_positions=feature_init,
        initial_poses=init_poses,
        bounding_boxes={},
    )
    config = T.tum_config()
    dtype = np.float64 if args.f64 else np.float32
    n = len(init_poses)
    repeats = []
    for rep in range(max(args.repeat, 1)):
        runner = OfflineProblemRunner(
            config,
            dtype=dtype,
            use_fused_solver={"auto": None, "on": True, "off": False}[args.fused_solver],
            use_device_sync=False if args.no_sync else None,
        )
        pg = PoseGraph(data.cameras)
        vf = VisualFeatureFrontend(
            gba_checker=lambda f: runner._gba_checker(f, data.max_frame_id()),
            reprojection_error_provider=lambda *a: config.visual_feature_params.reprojection_error_std_dev,
            inlier_epipolar_err_thresh=config.visual_feature_params.inlier_epipolar_err_thresh,
            check_past_n_frames=config.visual_feature_params.check_past_n_frames_for_epipolar_err,
        )
        t0 = time.perf_counter()
        ok = runner.run_optimization(data, pg, visual_frontend=vf)
        wall = time.perf_counter() - t0
        assert ok
        repeats.append({"wall_s": wall, "fps": n / wall})
        print(f"repeat {rep}: {n / wall:.2f} frames/s ({wall:.1f}s)", flush=True)

    import obvi_slam_tpu.metrics as M

    gt = np.stack([gt_poses[i] for i in range(n)])
    est = np.stack([pg.get_robot_pose(i) for i in range(n)])
    ate = M.ate_for_synced_aligned(M.align_with_ground_truth(gt, est), gt)

    print(timing.TimerRegistry.instance().report())
    sync_rep = runner.sync_report()
    print(
        f"\nbackend={jax.devices()[0].platform} dtype={np.dtype(dtype).name} "
        f"fused={args.fused_solver}"
    )
    print(
        f"e2e: {n} frames in {wall:.1f}s = {n / wall:.2f} frames/s | "
        f"ATE transl RMSE {ate.rmse_transl_err:.4f} m"
    )
    for k, v in sync_rep.items():
        print(
            f"upload[{k}]: {v['total_bytes'] / 1e6:.2f} MB over "
            f"{v['n_syncs']} solves = {v['bytes_per_sync'] / 1e3:.1f} KB/solve"
        )
    if args.json_out:
        import json

        summary = timing.TimerRegistry.instance().summary()
        with open(args.json_out, "w") as f:
            json.dump(
                {
                    "frames": n,
                    "wall_s": wall,
                    "frames_per_s": n / wall,
                    # In-process session repeats: [0] is the cold-process
                    # run, later entries see warm jit caches — the number a
                    # long-lived deployment (the reference's operating mode)
                    # sees per session.
                    "repeats": repeats,
                    "ate_rmse_transl_m": float(ate.rmse_transl_err),
                    "backend": jax.devices()[0].platform,
                    "dtype": np.dtype(dtype).name,
                    # Host->device traffic through the session DeviceSyncs
                    # (the number the device-resident tables shrink).
                    "upload": sync_rep,
                    # Per-phase wall-clock keyed by the reference's cumulative
                    # timer names (cumulative_timer_constants.h:11-107).
                    "phases": summary,
                },
                f,
            )


if __name__ == "__main__":
    main()
