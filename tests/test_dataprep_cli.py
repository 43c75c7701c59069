"""Tests for the data-prep / trajectory-formatting one-off CLIs
(utvslam_out_to_poses_by_timestamp, sequence_file_writer,
convert_object_detections_from_yaml, waypoint_timestamp_extractor,
gt_transformer, traj_length_evaluator, oa_slam_data_generator)."""

import json
import subprocess
import sys
from pathlib import Path

import numpy as np
from scipy.spatial.transform import Rotation

REPO = Path(__file__).parent.parent
sys.path.insert(0, str(REPO))

from obvi_slam_tpu.io import timestamped as tio


def run_cli(name, args):
    res = subprocess.run(
        [sys.executable, str(REPO / "cli" / name)] + args,
        capture_output=True,
        text=True,
    )
    assert res.returncode == 0, res.stderr + res.stdout
    return res


def test_timestamped_pose_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    entries = [
        ((100 + i, i * 7), rng.normal(size=6) * 0.3) for i in range(5)
    ]
    p = tmp_path / "traj.csv"
    tio.write_poses_with_timestamps(p, entries)
    back = tio.read_poses_with_timestamps(p)
    for (ts_a, pose_a), (ts_b, pose_b) in zip(entries, back):
        assert ts_a == ts_b
        np.testing.assert_allclose(pose_a, pose_b, atol=1e-12)


def test_utvslam_out_to_poses_by_timestamp(tmp_path):
    poses_file = tmp_path / "robot_poses.csv"
    with open(poses_file, "w") as f:
        f.write("node_id,transl_x,transl_y,transl_z,quat_x,quat_y,quat_z,quat_w\n")
        for i in range(4):
            f.write(f"{i},{i * 1.0},0,0,0,0,0,1\n")
    nodes_file = tmp_path / "nodes.csv"
    # node 9 has no pose -> skipped with an error message, not a crash
    tio.write_node_ids_and_timestamps(
        nodes_file, [(0, (10, 0)), (2, (12, 5)), (9, (99, 0))]
    )
    out = tmp_path / "by_ts.csv"
    run_cli(
        "utvslam_out_to_poses_by_timestamp.py",
        [
            "--poses_by_frame_file", str(poses_file),
            "--frames_for_timestamps_file", str(nodes_file),
            "--poses_by_timestamp_out_file", str(out),
        ],
    )
    back = tio.read_optional_poses_with_timestamps(out)
    assert len(back) == 2
    assert back[0][0] == (10, 0) and back[1][0] == (12, 5)
    np.testing.assert_allclose(back[1][1][:3], [2.0, 0, 0], atol=1e-12)


def test_sequence_file_writer(tmp_path):
    run_cli(
        "sequence_file_writer.py",
        [
            "--sequence_file_directory", str(tmp_path),
            "--sequence_id", "seq_v1",
            "--bags", "bagA:waypoints_A,bagB",
        ],
    )
    with open(tmp_path / "seq_v1.json") as f:
        data = json.load(f)
    info = data["sequence_info"]
    assert info["seq_id"] == "seq_v1"
    assert info["sequence"][0] == {
        "bag_base_name": "bagA",
        "waypoint_file_base_name": {"has_v": 1, "v": "waypoints_A"},
    }
    assert info["sequence"][1]["waypoint_file_base_name"]["has_v"] == 0


def test_convert_object_detections_from_yaml(tmp_path):
    yaml_file = tmp_path / "objs.yaml"
    yaml_file.write_text(
        """
tracks:
  - track:
      - label: chair
        translation: {x: 1.0, y: 2.0, z: 0.5}
        rotation: {w: 1.0, x: 0.0, y: 0.0, z: 0.0}
        box: {length: 0.6, width: 0.5, height: 0.9}
      - label: bench
        translation: {x: -3.0, y: 0.0, z: 0.2}
        rotation: {w: 0.707, x: 0.0, y: 0.0, z: 0.707}
        box: {length: 1.8, width: 0.6, height: 0.8}
"""
    )
    out = tmp_path / "objs.csv"
    run_cli(
        "convert_object_detections_from_yaml.py",
        [
            "--convert_object_detections_from_yaml", str(yaml_file),
            "--obj_output_file_name", str(out),
        ],
    )
    lines = out.read_text().strip().splitlines()
    assert lines[0].startswith("semantic_class,transl_x")
    assert len(lines) == 3
    row = lines[1].split(",")
    assert row[0] == "chair"
    # length->d_x, width->d_y, height->d_z
    assert [float(v) for v in row[8:11]] == [0.6, 0.5, 0.9]


def test_waypoint_timestamp_extractor(tmp_path):
    trig = tmp_path / "triggers.csv"
    imgs = tmp_path / "images.csv"
    # second trigger is within 2s of the first -> merged
    tio.write_timestamps(trig, [(100, 0), (101, 0), (110, 500_000_000)])
    tio.write_timestamps(
        imgs, [(t, 250_000_000) for t in range(95, 125)]
    )
    out = tmp_path / "waypoints.csv"
    run_cli(
        "waypoint_timestamp_extractor.py",
        [
            "--waypoint_trigger_timestamps_file", str(trig),
            "--image_timestamps_file", str(imgs),
            "--timestamps_for_waypoints_out_file", str(out),
            "--labels", "3,4:r",
        ],
    )
    entries = tio.read_timestamps_and_waypoints(out)
    assert len(entries) == 2
    # trigger (100,0) snaps to nearest image (99,.25) or (100,.25): 250ms each;
    # either is acceptable nearest — check within 0.3s.
    t0 = entries[0][0][0] + entries[0][0][1] * 1e-9
    assert abs(t0 - 100.0) <= 0.3
    assert entries[0][1] == 3 and entries[0][2] is False
    t1 = entries[1][0][0] + entries[1][0][1] * 1e-9
    assert abs(t1 - 110.5) <= 0.3
    assert entries[1][1] == 4 and entries[1][2] is True


def test_gt_transformer(tmp_path):
    rng = np.random.default_rng(1)
    # Sensor-frame trajectory and a non-trivial extrinsic.
    extr = np.concatenate([[0.1, -0.2, 0.3], Rotation.from_euler(
        "xyz", [0.1, 0.2, 0.3]).as_rotvec()])
    traj = [((50 + i, 0), rng.normal(size=6) * 0.4) for i in range(6)]
    traj_file = tmp_path / "interp.csv"
    tio.write_poses_with_timestamps(traj_file, traj)
    extr_file = tmp_path / "extr.csv"
    q = Rotation.from_rotvec(extr[3:6]).as_quat()
    extr_file.write_text(
        "transl_x,transl_y,transl_z,quat_x,quat_y,quat_z,quat_w\n"
        f"{extr[0]},{extr[1]},{extr[2]},{q[0]},{q[1]},{q[2]},{q[3]}\n"
    )
    out = tmp_path / "out.csv"
    run_cli(
        "gt_transformer.py",
        [
            "--interpolated_traj", str(traj_file),
            "--lego_loam_frame_to_bl_extrinsics", str(extr_file),
            "--interp_out_file", str(out),
        ],
    )
    back = tio.read_poses_with_timestamps(out)
    # First pose is the origin after adjustment.
    np.testing.assert_allclose(back[0][1], np.zeros(6), atol=1e-10)
    # Relative poses are preserved under the rigid re-anchoring: check
    # pose_0^-1 * pose_i matches for the calibrated trajectory.
    def rt(p):
        return Rotation.from_rotvec(p[3:6]).as_matrix(), p[:3]

    def compose(a, b):
        Ra, ta = rt(a)
        Rb, tb = rt(b)
        return Ra @ Rb, Ra @ tb + ta

    def calib(p):
        Rp, tp = rt(p)
        Re, te = rt(extr)
        # combinePoses(p, inverse(extr))
        Rinv, tinv = Re.T, -Re.T @ te
        return Rp @ Rinv, Rp @ tinv + tp

    R0, t0 = calib(traj[0][1])
    for (ts, p_in), (ts_out, p_out) in zip(traj, back):
        assert ts == ts_out
        Ri, ti = calib(p_in)
        rel_R = R0.T @ Ri
        rel_t = R0.T @ (ti - t0)
        Ro, to = rt(p_out)
        np.testing.assert_allclose(Ro, rel_R, atol=1e-9)
        np.testing.assert_allclose(to, rel_t, atol=1e-9)


def test_traj_length_evaluator(tmp_path):
    traj = [((i, 0), np.array([i * 2.0, 0, 0, 0, 0, 0])) for i in range(5)]
    f1 = tmp_path / "a.csv"
    tio.write_poses_with_timestamps(f1, traj)
    out = tmp_path / "lengths.json"
    res = run_cli(
        "traj_length_evaluator.py",
        ["--trajectory_files", str(f1), "--output_file", str(out)],
    )
    assert "total: 8.000 m" in res.stdout
    with open(out) as f:
        data = json.load(f)
    assert abs(data["total"] - 8.0) < 1e-9


def test_oa_slam_data_generator(tmp_path):
    root = tmp_path / "images"
    (root / "1").mkdir(parents=True)
    for frame in [0, 1]:
        (root / "1" / f"{frame}.png").write_bytes(b"\x89PNGfake")
    bb_file = tmp_path / "bbs.csv"
    with open(bb_file, "w") as f:
        f.write(
            "min_pixel_x,min_pixel_y,max_pixel_x,max_pixel_y,semantic_class,"
            "node_id,camera_id,detection_confidence\n"
        )
        f.write("10,20,110,220,chair,0,1,0.9\n")
    nodes_file = tmp_path / "nodes.csv"
    tio.write_node_ids_and_timestamps(nodes_file, [(0, (5, 0)), (1, (6, 0))])
    classes = tmp_path / "classes.csv"
    classes.write_text("class_name,class_id\nchair,56\n")
    out = tmp_path / "oa_out"
    run_cli(
        "oa_slam_data_generator.py",
        [
            "--images_root_directory", str(root),
            "--bounding_boxes_by_node_id_file", str(bb_file),
            "--nodes_by_timestamp_file", str(nodes_file),
            "--class_ids_file", str(classes),
            "--oa_slam_data_output_directory", str(out),
        ],
    )
    assert (out / "1" / "0.png").exists()
    img_list = (out / "1" / "cam_1_images.txt").read_text().splitlines()
    assert img_list == ["1/0.png", "1/1.png"]
    det = (out / "1" / "detections" / "detections.txt").read_text()
    assert "file_name\n1/0.png\ndetections\ncategory_id\n56\n" in det
    assert "10.0,20.0,110.0,220.0" in det


def test_orb_stereo_reformat_data(tmp_path):
    """Raw stereo-ORB match files -> per-frame feature + depth files
    (orb_stereo_reformat_data.py parity: negative depths dropped, multiple
    match files per frame merged)."""
    raw = tmp_path / "raw"
    raw.mkdir()
    pose = "1.0 2.0 3.0 0.0 0.0 0.0 1.0"
    # frame 5 @ ts 100.5, matched against 4 and 6 (two files, merged).
    (raw / "5_x_100.5_vs_4.txt").write_text(
        f"5\n{pose}\n"
        "11 10.0 20.0 2.5 8.0 20.0\n"
        "12 30.0 40.0 -1.0 28.0 40.0\n"  # negative depth: dropped
    )
    (raw / "5_x_100.5_vs_6.txt").write_text(
        f"5\n{pose}\n13 50.0 60.0 4.0 47.0 60.0\n"
    )
    # A file whose compared frame is not frame±1 is skipped with a warning.
    (raw / "5_x_100.5_vs_9.txt").write_text(f"5\n{pose}\n14 1.0 2.0 3.0 0.5 2.0\n")
    out = tmp_path / "out"
    run_cli("orb_stereo_reformat_data.py", ["-i", str(raw), "-o", str(out)])

    lines = (out / "5.txt").read_text().strip().splitlines()
    assert lines[0] == "5"
    assert lines[1] == pose
    feats = {int(l.split()[0]): l.split() for l in lines[2:]}
    assert set(feats) == {11, 13}  # 12 dropped (neg depth), 14 skipped file
    assert feats[11][1:] == ["1", "10.0", "20.0", "2", "8.0", "20.0"]

    dlines = (out / "depths" / "5.txt").read_text().strip().splitlines()
    depths = {int(l.split()[0]): float(l.split()[1]) for l in dlines[2:]}
    assert depths == {11: 2.5, 13: 4.0}


def test_reference_metric_schema_roundtrip(tmp_path):
    """Metric-file interop with the reference's evaluation stack: our CLIs
    emit the MetricsFileConstants schema (approach_metrics.py:574-615, with
    the cv::FileStorage [{"value": v}] vector convention), and our reader —
    a faithful replica of readMetricsFile/readObjectsMetricsFile — round
    trips it."""
    import numpy as np

    from obvi_slam_tpu.metrics import schema as S
    from obvi_slam_tpu.metrics.trajectory import ATEResults, distribution_stats

    # Trajectory metrics file.
    terr = [0.01, 0.02, 0.015]
    rerr = [0.001, 0.003, 0.002]
    ate = ATEResults(
        rmse_transl_err=float(np.sqrt(np.mean(np.square(terr)))),
        rmse_rot_err=float(np.sqrt(np.mean(np.square(rerr)))),
        transl_stats=distribution_stats(terr),
        rot_stats=distribution_stats(rerr),
        valid_poses_used_in_score=3,
        lost_poses=0,
    )
    traj = S.trajectory_metrics_to_ref_json(
        ate, rpe=ate,
        all_translation_deviations=[0.1, 0.2],
        all_rotation_deviations=[0.01, 0.02],
    )
    path = tmp_path / "metrics.json"
    S.write_metrics_file(str(path), traj, [traj, traj])
    seq, indiv = S.read_metrics_file(str(path))
    assert len(indiv) == 2
    assert seq["ate"].rmse_transl_err == ate.rmse_transl_err
    assert seq["ate"].transl_stats.errors == [float(v) for v in terr]
    assert seq["ate"].transl_stats.squared_err_std_dev == ate.transl_stats.squared_err_std_dev
    assert seq["all_translation_deviations"] == [0.1, 0.2]
    assert seq["rpe"].rmse_rot_err == ate.rmse_rot_err
    # Vector convention: every list element is {"value": ...}.
    import json as _json

    raw = _json.loads(path.read_text())
    errs = raw["metrics"]["sequence_metrics"]["trajectory_sequence_ate_results"][
        "transl_stats"]["errors"]
    assert all(set(e) == {"value"} for e in errs)

    # Object metrics file through the CLI.
    est_csv = tmp_path / "est.csv"
    gt_csv = tmp_path / "gt.csv"
    header = ("semantic_class,transl_x,transl_y,transl_z,quat_x,quat_y,"
              "quat_z,quat_w,d_x,d_y,d_z,obj_id\n")
    for p, off in ((est_csv, 0.05), (gt_csv, 0.0)):
        with open(p, "w") as f:
            f.write(header)
            f.write(f"chair,{1+off},2.0,0.5,0,0,0,1,0.6,0.6,1.0,0\n")
    out = tmp_path / "obj_metrics.json"
    ref_out = tmp_path / "obj_metrics_ref.json"
    run_cli(
        "object_metrics_generator.py",
        ["--est_objects_file", str(est_csv),
         "--gt_objects_file", str(gt_csv),
         "--metrics_out_file", str(out),
         "--ref_schema_out_file", str(ref_out)],
    )
    parsed = S.read_object_metrics_file(str(ref_out))
    assert len(parsed) == 1
    assert parsed[0]["recall"] == 1.0
    assert parsed[0]["num_gt_objs"] == 1
    assert abs(parsed[0]["average_pos_deviation"] - 0.05) < 1e-6
    assert parsed[0]["pos_dev_stats"].num_vals == 1
