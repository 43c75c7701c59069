"""Metrics tests: alignment/ATE/RPE vs hand-computed values, waypoint
consistency, object association + IoU, and multi-chip sharding equivalence."""

import numpy as np
from scipy.spatial.transform import Rotation

import obvi_slam_tpu.metrics as M

RNG = np.random.default_rng(3)


def make_traj(n=20):
    t = np.zeros((n, 6))
    t[:, 0] = np.arange(n) * 0.5
    t[:, 1] = np.sin(np.arange(n) * 0.3)
    t[:, 4] = 0.1 * np.cos(np.arange(n) * 0.2)
    return t


class TestAlignment:
    def test_recovers_rigid_transform(self):
        gt = make_traj()
        rot = Rotation.from_euler("z", 0.7).as_matrix()
        transl = np.array([2.0, -1.0, 0.5])
        est = gt.copy()
        for i in range(len(gt)):
            r, t = Rotation.from_rotvec(gt[i, 3:]).as_matrix(), gt[i, :3]
            # est = T_inv * gt (so aligning est back to gt recovers T)
            est[i, :3] = rot.T @ (t - transl)
            est[i, 3:] = Rotation.from_matrix(rot.T @ r).as_rotvec()
        aligned = M.align_with_ground_truth(gt, est)
        ate = M.ate_for_synced_aligned(aligned, gt)
        assert ate.rmse_transl_err < 1e-10
        assert ate.rmse_rot_err < 1e-10

    def test_ate_known_offset(self):
        gt = make_traj()
        est = gt.copy()
        est[:, 2] += 0.3  # uniform z offset: alignment removes it
        aligned = M.align_with_ground_truth(gt, est)
        assert M.ate_for_synced_aligned(aligned, gt).rmse_transl_err < 1e-10
        # Without alignment the raw ATE is exactly 0.3.
        assert abs(M.ate_for_synced_aligned(est, gt).rmse_transl_err - 0.3) < 1e-12

    def test_lost_poses(self):
        gt = make_traj()
        est = gt.copy()
        est[5] = np.nan
        res = M.ate_for_synced_aligned(est, gt)
        assert res.valid_poses_used_in_score == len(gt) - 1
        assert res.lost_poses == 1

    def test_rpe_zero_for_identical(self):
        gt = make_traj()
        res = M.rpe_for_synced_aligned(gt.copy(), gt)
        assert res.rmse_transl_err < 1e-12

    def test_combine(self):
        gt = make_traj()
        est = gt.copy()
        est[:, 1] += 0.1
        r1 = M.ate_for_synced_aligned(est, gt)
        comb = M.combine_ate_results([r1, r1])
        np.testing.assert_allclose(comb.rmse_transl_err, r1.rmse_transl_err)
        assert comb.valid_poses_used_in_score == 2 * r1.valid_poses_used_in_score


class TestWaypointConsistency:
    def test_deviation_from_mean(self):
        p1 = np.array([1.0, 0, 0, 0, 0, 0])
        p2 = np.array([1.2, 0, 0, 0, 0, 0])
        per_wp, all_t, all_r = M.waypoint_consistency({7: [[p1], [p2]]})
        np.testing.assert_allclose(sorted(per_wp[7][0]), [0.1, 0.1], atol=1e-12)
        assert all(r < 1e-12 for r in per_wp[7][1])


class TestObjectMetrics:
    def test_perfect_match(self):
        gt = {0: ("chair", np.array([0, 0, 5, 0, 1, 1, 1.0]))}
        est = {3: ("chair", np.array([0, 0, 5, 0, 1, 1, 1.0]))}
        m = M.object_metrics(est, gt)
        assert m.recall == 1.0
        assert m.missed_gt_objs == 0
        assert m.iou_for_gt_obj[0] > 0.9
        assert m.average_pos_deviation < 1e-12

    def test_miss_and_class_mismatch(self):
        gt = {
            0: ("chair", np.array([0, 0, 5, 0, 1, 1, 1.0])),
            1: ("bench", np.array([10, 0, 5, 0, 1, 2, 1.0])),
        }
        est = {3: ("chair", np.array([0.2, 0, 5, 0, 1, 1, 1.0]))}
        m = M.object_metrics(est, gt)
        assert m.recall == 0.5
        assert m.missed_gt_objs == 1
        assert m.iou_for_gt_obj[1] == 0.0
        assert 0 < m.iou_for_gt_obj[0] < 1

    def test_iou_disjoint(self):
        a = np.array([0, 0, 0, 0, 1, 1, 1.0])
        b = np.array([10, 0, 0, 0, 1, 1, 1.0])
        assert M.iou_for_object_set(a, [b]) == 0.0

    def test_iou_half_shift(self):
        a = np.array([0, 0, 0, 0, 2, 2, 2.0])
        b = np.array([1.0, 0, 0, 0, 2, 2, 2.0])
        iou = M.iou_for_object_set(a, [b], samples_per_dim=40)
        # Analytic sphere-overlap IoU for r=1 spheres at distance 1:
        # lens volume = 2*pi*(r - d/2)^2*(2r + d/2)/3... compute numerically:
        r, d = 1.0, 1.0
        lens = 2 * np.pi * (r - d / 2) ** 2 * (2 * r + d / 2) / 3 / (4 / 3 * np.pi * r**3)
        expected = lens / (2 - lens)
        assert abs(iou - expected) < 0.05, (iou, expected)

    def test_aabb_rotated(self):
        e = np.array([0, 0, 0, np.pi / 4, 2.0, 1.0, 1.0])
        lo, hi = M.ellipsoid_aabb(e)
        expected_half_x = np.sqrt((np.cos(np.pi / 4) * 1.0) ** 2 + (np.sin(np.pi / 4) * 0.5) ** 2)
        np.testing.assert_allclose(hi[0], expected_half_x, rtol=1e-10)
        np.testing.assert_allclose(hi[2], 0.5, rtol=1e-10)


class TestShardingEquivalence:
    def test_multichip_step_matches_single_chip(self):
        import jax

        from obvi_slam_tpu import parallel as par
        from obvi_slam_tpu.solver import schur as schur_mod
        from obvi_slam_tpu.synthetic import synthetic_problem

        state0, _, cams, tables, plan, free, weights, huber = synthetic_problem(
            n_poses=16, n_points=64, n_objects=4, obs_per_point=4, obs_per_object=6
        )
        radius = 1e4
        delta1, mc1, g1 = schur_mod.compute_step(
            state0, cams, tables, plan, free, weights, radius, huber
        )

        mesh = par.make_mesh(jax.devices()[:8])
        t2 = par.shard_tables(tables, mesh)
        p2 = par.shard_plan(plan, mesh)
        w2 = par.shard_weights(weights, mesh)
        step = par.sharded_compute_step(mesh)
        with mesh:
            delta2, mc2, g2 = step(state0, cams, t2, p2, free, w2, radius, huber)
        np.testing.assert_allclose(
            np.asarray(delta1.poses), np.asarray(delta2.poses), rtol=1e-8, atol=1e-10
        )
        np.testing.assert_allclose(
            np.asarray(delta1.points), np.asarray(delta2.points), rtol=1e-8, atol=1e-10
        )
        np.testing.assert_allclose(float(mc1), float(mc2), rtol=1e-8)


class TestDistributedHelpers:
    def test_shard_sessions_round_robin(self):
        from obvi_slam_tpu.parallel.distributed import shard_sessions

        sessions = [{"name": f"s{i}", "chain": i % 3} for i in range(9)]
        parts = [shard_sessions(sessions, p, 3) for p in range(3)]
        # Every session assigned exactly once; chains kept together.
        all_names = sorted(s["name"] for part in parts for s in part)
        assert all_names == sorted(s["name"] for s in sessions)
        for part in parts:
            chains = {s["chain"] for s in part}
            assert len(chains) == 1

    def test_initialize_noop_without_coordinator(self):
        from obvi_slam_tpu.parallel.distributed import initialize

        assert initialize() is False
