"""Fused production tracking path (models/fused_track + models/device_map).

The fused step collapses the reference's per-frame pipeline
(TrackWithMotionModel + TrackLocalMap, Tracking.cc:617-715) into one device
call against a device-resident map pool. These tests pin:
- trajectory equivalence with the legacy multi-dispatch path,
- that the fused step actually carries the run (not silently falling back),
- DeviceMapPool incremental sync == its host mirrors under churn.
"""

import numpy as np

from ceres_mono_orb_slam2_tpu.models.device_map import DeviceMapPool
from ceres_mono_orb_slam2_tpu.models.map import Map
from ceres_mono_orb_slam2_tpu.models.system import MonoSLAM
from ceres_mono_orb_slam2_tpu.utils.config import CameraConfig, ORBConfig, SlamConfig, StaticShapes
from ceres_mono_orb_slam2_tpu.utils.geosim import (
    GeoExtractor, GeoWorld, frame_image, make_geo_trajectory)
from ceres_mono_orb_slam2_tpu.utils.synthetic import ate_rmse


def _run(fused: bool, n_frames: int = 45, seed: int = 0):
    rng = np.random.default_rng(seed)
    h, w = 480, 640
    cfg = SlamConfig(
        camera=CameraConfig(fx=500.0, fy=500.0, cx=320.0, cy=240.0, fps=30.0),
        orb=ORBConfig(n_features=600),
        shapes=StaticShapes(max_local_points=2048, max_local_keyframes=12,
                            max_ba_points=1024, max_ba_obs=4096),
        fused_tracking=fused,
    )
    Rcw, tcw = make_geo_trajectory(n_frames, "strafe")
    world = GeoWorld(rng, 2500)
    slam = MonoSLAM(cfg)
    slam.tracker.extractor = GeoExtractor(
        world, cfg.camera.K, Rcw, tcw, 600, h, w, px_noise=0.3, bit_noise=2, seed=3)
    gt_c = np.einsum("tij,tj->ti", Rcw.transpose(0, 2, 1), -tcw)
    est, gt = [], []
    for k in range(n_frames):
        T = slam.track_monocular(frame_image(k, h, w), k / 30.0)
        if T is not None:
            est.append(-T[:3, :3].T @ T[:3, 3])
            gt.append(gt_c[k])
    rmse = ate_rmse(np.stack(est), np.stack(gt))
    traj = np.linalg.norm(np.diff(np.stack(gt), axis=0), axis=1).sum()
    return slam, len(est), rmse / traj


def test_fused_equals_legacy_trajectory():
    slam_f, n_f, ate_f = _run(True)
    slam_l, n_l, ate_l = _run(False)
    # the fused step must carry the run, not silently fall back
    assert slam_f.tracker.n_fused_frames >= n_f - 8, slam_f.tracker.n_fused_frames
    assert slam_l.tracker.n_fused_frames == 0
    assert n_f >= 40 and n_l >= 40
    assert ate_f < 0.01, ate_f
    assert ate_l < 0.01, ate_l
    # same math, same gates -> the two paths agree closely
    assert abs(ate_f - ate_l) < 0.005


def test_device_pool_incremental_sync():
    rng = np.random.default_rng(1)
    m = Map()
    mps = []
    for i in range(40):
        mp = m.new_map_point(rng.standard_normal(3).astype(np.float32),
                             rng.integers(0, 256, 32, dtype=np.uint8), ref_kf_id=0)
        mp.normal = rng.standard_normal(3).astype(np.float32)
        mp.min_dist, mp.max_dist = 1.0, 4.0
        mps.append(mp)
    pool = DeviceMapPool(m, cap=16)  # force growth
    pool.sync()

    def check():
        pos, normal, mind, maxd, desc, valid = [np.asarray(a) for a in pool.dev]
        live = {mp.id: mp for mp in m.all_map_points()}
        n_valid = 0
        for s in range(pool.cap):
            mid = int(pool.id_of[s])
            if valid[s]:
                n_valid += 1
                mp = live[mid]
                np.testing.assert_allclose(pos[s], mp.pos, rtol=1e-6)
                np.testing.assert_array_equal(desc[s], mp.descriptor)
                np.testing.assert_allclose(normal[s], mp.normal, rtol=1e-6)
        assert n_valid == len(live)
        assert not valid[pool.cap]  # scratch row never valid

    check()
    # churn: move some, kill some, add some
    for mp in mps[:10]:
        mp.pos = mp.pos + 1.0
        m.note_mp_dirty(mp.id)
    for mp in mps[10:15]:
        m.set_bad_map_point(mp)
    for i in range(20):
        m.new_map_point(rng.standard_normal(3).astype(np.float32),
                        rng.integers(0, 256, 32, dtype=np.uint8), ref_kf_id=0)
    pool.sync()
    check()
    # epoch bump (reset) drops everything and remirrors
    m.clear()
    for i in range(5):
        m.new_map_point(rng.standard_normal(3).astype(np.float32),
                        rng.integers(0, 256, 32, dtype=np.uint8), ref_kf_id=0)
    pool.sync()
    check()
