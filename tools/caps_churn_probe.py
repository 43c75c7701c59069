"""Diagnostic: log every caps-pool change (= potential fresh jit signature)
during a TUM e2e run. CPU-only, fast. Usage:
  JAX_PLATFORMS=cpu python tools/caps_churn_probe.py --frames 40
"""

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).parent.parent / "tests"))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--frames", type=int, default=40)
    args = parser.parse_args(argv)

    import numpy as np

    import test_tum_fixture as T
    from obvi_slam_tpu.frontend import VisualFeatureFrontend
    from obvi_slam_tpu.pose_graph import PoseGraph
    from obvi_slam_tpu import runner as runner_mod
    from obvi_slam_tpu.runner import OfflineProblemRunner

    data, gt_poses = T.load_tum_session(max_frames=args.frames)
    config = T.tum_config()
    runner = OfflineProblemRunner(config, dtype=np.float32)

    changes = []
    orig = OfflineProblemRunner.build_problem_synced

    def patched(self, pg, scope, key, *a, **kw):
        before = dict(self.caps_pool(key))
        problem = orig(self, pg, scope, key, *a, **kw)
        after = dict(self.caps_pool(key))
        diff = {k: (before.get(k), after[k]) for k in after if before.get(k) != after[k]}
        if diff:
            changes.append((key, scope.max_frame_id, diff))
            print(f"[caps-change] key={key} frame={scope.max_frame_id} diff={diff}")
        return problem

    OfflineProblemRunner.build_problem_synced = patched
    try:
        pg = PoseGraph(data.cameras)
        vf = VisualFeatureFrontend(
            gba_checker=lambda f: runner._gba_checker(f, data.max_frame_id()),
            reprojection_error_provider=lambda *a: config.visual_feature_params.reprojection_error_std_dev,
            inlier_epipolar_err_thresh=config.visual_feature_params.inlier_epipolar_err_thresh,
            check_past_n_frames=config.visual_feature_params.check_past_n_frames_for_epipolar_err,
        )
        ok = runner.run_optimization(data, pg, visual_frontend=vf)
        print("ok:", ok)
    finally:
        OfflineProblemRunner.build_problem_synced = orig
    print(f"\ntotal signature-changing builds: {len(changes)}")
    by_key = {}
    for key, fr, diff in changes:
        by_key.setdefault(key, []).append((fr, diff))
    for key, lst in by_key.items():
        print(f"  {key}: {len(lst)} changes at frames {[f for f, _ in lst]}")


if __name__ == "__main__":
    main()
