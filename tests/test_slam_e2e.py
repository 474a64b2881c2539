"""End-to-end SLAM integration test on a synthetic sequence with known
ground truth (the reference was only ever validated by dataset runs;
SURVEY.md §4)."""

import numpy as np
import pytest

from ceres_mono_orb_slam2_tpu.models.system import MonoSLAM
from ceres_mono_orb_slam2_tpu.utils.config import CameraConfig, ORBConfig, SlamConfig, StaticShapes
from ceres_mono_orb_slam2_tpu.utils.synthetic import ate_rmse, make_sequence


def small_config():
    return SlamConfig(
        camera=CameraConfig(fx=500.0, fy=500.0, cx=320.0, cy=240.0, fps=30.0),
        orb=ORBConfig(n_features=1500),
        shapes=StaticShapes(
            max_local_points=2048,
            max_local_keyframes=12,
            max_ba_points=1024,
            max_ba_obs=4096,
        ),
    )


@pytest.fixture(scope="module")
def slam_run():
    # 40 frames of sustained strafe: crosses the old frame-~14 divergence
    # (root cause: f32 rotation determinant drift compounding through the
    # constant-velocity model; fixed by SO(3) projection — lie.so3_project)
    seq = make_sequence(n_frames=40, seed=11, motion="strafe", step=0.12)
    slam = MonoSLAM(small_config())
    poses = []
    for k in range(seq.n_frames):
        Tcw = slam.track_monocular(seq.images[k], seq.timestamps[k])
        poses.append(Tcw)
    return seq, slam, poses


def test_initializes_and_tracks(slam_run):
    seq, slam, poses = slam_run
    tracked = [p is not None for p in poses]
    assert slam.get_tracking_state() == "OK"
    # must initialize within the first ~10 frames and never lose track after
    first = tracked.index(True)
    assert first < 10
    assert all(tracked[first:])


def test_map_grows(slam_run):
    seq, slam, poses = slam_run
    assert slam.map.n_keyframes() >= 3
    assert slam.map.n_map_points() > 150
    assert slam.local_mapper.n_local_ba >= 1


def test_trajectory_accuracy(slam_run):
    seq, slam, poses = slam_run
    est, gt = [], []
    for k, T in enumerate(poses):
        if T is None:
            continue
        Rcw, tcw = T[:3, :3], T[:3, 3]
        est.append(-Rcw.T @ tcw)
        Rg, tg = seq.poses_Rcw[k], seq.poses_tcw[k]
        gt.append(-Rg.T @ tg)
    est, gt = np.stack(est), np.stack(gt)
    rmse = ate_rmse(est, gt)
    traj_len = np.linalg.norm(np.diff(gt, axis=0), axis=1).sum()
    # long-run bar (VERDICT r1 next-step #1): ATE < 1% of trajectory length
    assert rmse < 0.01 * traj_len, (rmse, traj_len)


def test_covisibility_graph_consistency(slam_run):
    seq, slam, poses = slam_run
    m = slam.map
    for kf in m.all_keyframes():
        # every covisibility edge is mutual
        for nb, w in kf.covisible.items():
            nkf = m.keyframes.get(nb)
            if nkf is not None and not nkf.bad:
                assert kf.id in nkf.covisible
        # spanning tree parent exists
        if kf.id != 0 and kf.parent is not None:
            assert kf.parent in m.keyframes
    # observations are bidirectional
    for mp in m.all_map_points():
        for kf_id, idx in mp.observations.items():
            kf = m.keyframes.get(kf_id)
            if kf is not None and not kf.bad:
                assert kf.mp_ids[idx] == mp.id


def test_save_trajectory(tmp_path, slam_run):
    seq, slam, poses = slam_run
    p = tmp_path / "kf_traj.txt"
    slam.save_keyframe_trajectory_tum(str(p))
    lines = p.read_text().strip().split("\n")
    assert len(lines) == slam.map.n_keyframes()
    row = np.array(lines[0].split(), np.float64)
    assert len(row) == 8
    q = row[4:]
    assert abs(np.linalg.norm(q) - 1) < 1e-5
    p2 = tmp_path / "frame_traj.txt"
    slam.save_frame_trajectory_tum(str(p2))
    assert len(p2.read_text().strip().split("\n")) >= 9
    p3 = tmp_path / "map.npz"
    slam.save_map(str(p3))
    data = np.load(p3)
    assert data["mp_pos"].shape[0] == slam.map.n_map_points()


def test_save_map_yaml_reference_format(tmp_path, slam_run):
    """save_map_yaml writes the reference's OpenCV-YAML map dump
    (MonoORBSlam.cc:194-247): MapPoints {id,pos,descriptor}, KeyFrames
    {id,timestamp,R,t,map_point_indices} with !!opencv-matrix encoding."""
    import yaml

    seq, slam, poses = slam_run
    p = tmp_path / "map.yaml"
    slam.save_map_yaml(str(p))
    text = p.read_text()
    assert text.startswith("%YAML:1.0\n---\n")

    class _L(yaml.SafeLoader):
        pass

    def _mat(loader, node):
        d = loader.construct_mapping(node, deep=True)
        return np.array(d["data"]).reshape(d["rows"], d["cols"])

    _L.add_constructor("tag:yaml.org,2002:opencv-matrix", _mat)
    doc = yaml.load(text.split("---\n", 1)[1], Loader=_L)
    assert len(doc["MapPoints"]) == slam.map.n_map_points()
    assert len(doc["KeyFrames"]) == slam.map.n_keyframes()
    mp0 = doc["MapPoints"][0]
    assert mp0["pos"].shape == (3, 1) and mp0["descriptor"].shape == (1, 32)
    kf0 = doc["KeyFrames"][0]
    # R is world-from-camera (GetRotation().transpose()), t the camera center
    kf = sorted(slam.map.all_keyframes(), key=lambda k: k.id)[0]
    np.testing.assert_allclose(kf0["R"], kf.Rcw.T, atol=1e-6)
    np.testing.assert_allclose(kf0["t"][:, 0], -kf.Rcw.T @ kf.tcw, atol=1e-5)
    ids = set(kf0["map_point_indices"][0].astype(int))
    assert ids <= {mp.id for mp in slam.map.all_map_points()}


def test_facade_tracked_getters(slam_run):
    """GetTrackedMapPoints / GetTrackedKeyPointsUn parity
    (MonoORBSlam.cc:280-293)."""
    seq, slam, poses = slam_run
    mps = slam.get_tracked_map_points()
    assert len(mps) == slam.tracker.current.n_kp
    n_assoc = sum(m is not None for m in mps)
    assert n_assoc >= 30  # a tracking frame holds many live associations
    kps = slam.get_tracked_keypoints_un()
    # parallel arrays, per-slot aligned like the reference's vectors
    assert kps.shape == (len(mps), 2)
    for i, m in enumerate(mps):
        if m is not None:
            assert np.isfinite(kps[i]).all()
