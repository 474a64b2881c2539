"""Coherence tests for the Map's SoA mirror tables (mp_pos/mp_alive/mp_nobs).

The hot host readers (_median_depth, tracked_map_points, keyframe-culling
redundancy counts) gather from these tables instead of walking MapPoint
dicts; every mutation path (creation, pos writes, observation add/erase,
bad-flag, Replace forwarding, keyframe erase, clear) must keep them exactly
in sync with the object graph. Reference semantics:
KeyFrame::TrackedMapPoints (KeyFrame.cc:265-290), ComputeSceneMedianDepth
(KeyFrame.cc:555-581)."""

import numpy as np

from ceres_mono_orb_slam2_tpu.models.map import Map
from ceres_mono_orb_slam2_tpu.models.system import MonoSLAM
from ceres_mono_orb_slam2_tpu.utils.config import (
    CameraConfig, ORBConfig, SlamConfig, StaticShapes)
from ceres_mono_orb_slam2_tpu.utils.geosim import (
    GeoExtractor, GeoWorld, frame_image, make_geo_trajectory)


def assert_soa_coherent(m: Map):
    for mid, mp in m.map_points.items():
        assert m.mp_alive[mid] == (not mp.bad), mid
        assert m.mp_nobs[mid] == len(mp.observations), mid
        if not mp.bad:
            np.testing.assert_array_equal(m.mp_pos[mid], mp.pos)
            # phase-2 tables are PRIMARY for these fields; the property must
            # read the same row the table holds, and ref mirrors the object
            np.testing.assert_array_equal(m.mp_desc[mid], mp.descriptor)
            np.testing.assert_array_equal(m.mp_normal[mid], mp.normal)
            assert float(m.mp_mind[mid]) == mp.min_dist, mid
            assert float(m.mp_maxd[mid]) == mp.max_dist, mid
            assert int(m.mp_ref[mid]) == mp.ref_kf_id, mid


def naive_tracked(kf, m, min_obs):
    c = 0
    for mid in kf.mp_ids:
        if mid >= 0:
            mp = m.map_points.get(int(mid))
            if mp is not None and not mp.bad and mp.n_obs >= min_obs:
                c += 1
    return c


def naive_median_depth(kf, m):
    pos = [mp.pos for mp in (m.map_points.get(int(mid))
                             for mid in kf.mp_ids[kf.mp_ids >= 0])
           if mp is not None and not mp.bad]
    if not pos:
        return -1.0
    return float(np.median(np.stack(pos) @ kf.Rcw[2] + kf.tcw[2]))


def test_unit_mutation_paths():
    m = Map()

    class _F:  # minimal duck-typed frame
        id = 0
        timestamp = 0.0
        Rcw = np.eye(3, dtype=np.float32)
        tcw = np.zeros(3, np.float32)
        kp_xy = np.zeros((8, 2), np.float32)
        kp_und = np.zeros((8, 2), np.float32)
        kp_octave = np.zeros(8, np.int32)
        kp_angle = np.zeros(8, np.float32)
        kp_response = np.zeros(8, np.float32)
        desc = np.zeros((8, 32), np.uint8)
        kp_valid = np.ones(8, bool)
        mp_ids = np.full(8, -1, np.int64)

    kfs = []
    for i in range(4):
        f = _F()
        f.id = i
        kfs.append(m.new_keyframe(f))
    rng = np.random.default_rng(0)
    mps = [m.new_map_point(rng.normal(size=3).astype(np.float32),
                           rng.integers(0, 256, 32).astype(np.uint8), 0)
           for _ in range(6)]
    for j, mp in enumerate(mps):
        for i, kf in enumerate(kfs[: 2 + j % 3]):
            m.add_observation(mp, kf, (j + i) % 8)
    assert_soa_coherent(m)

    mps[0].pos = np.array([9.0, 9.0, 9.0])  # property write-through
    assert m.mp_pos[mps[0].id][0] == 9.0
    m.erase_observation(mps[1], kfs[0].id)
    m.set_bad_map_point(mps[2])
    m.replace_map_point(mps[3], mps[4])
    m.replace_map_point(mps[0], mps[5], refresh=False)
    assert_soa_coherent(m)

    m.erase_keyframe(kfs[2])
    assert_soa_coherent(m)

    for kf in kfs:
        if not kf.bad:
            assert kf.tracked_map_points(1, m) == naive_tracked(kf, m, 1)
            assert kf.tracked_map_points(3, m) == naive_tracked(kf, m, 3)

    m.clear()
    mps[0].pos = np.ones(3)  # stale object after clear: must not raise
    assert len(m.mp_alive) == 0


def naive_refresh(m, mp, scale_factors):
    """Per-point reference semantics: ComputeDistinctiveDescriptors
    (MapPoint.cc:256-315) + UpdateNormalAndDepth (MapPoint.cc:335-388),
    returning (min median Hamming, normal, min_dist, max_dist)."""
    from ceres_mono_orb_slam2_tpu.models.map import hamming_np
    descs, ctrs = [], []
    for kf_id, idx in mp.observations.items():
        kf = m.keyframes.get(kf_id)
        if kf is not None and not kf.bad:
            descs.append(kf.desc[idx])
            ctrs.append(kf.camera_center())
    if not descs:
        return None
    D = np.stack(descs)
    med = np.median(hamming_np(D[:, None, :], D[None, :, :]), axis=1)
    v = mp.pos[None, :] - np.stack(ctrs)
    nv = np.linalg.norm(v, axis=1)
    ok = nv > 1e-9
    normal = (v[ok] / nv[ok, None]).sum(0) / max(ok.sum(), 1)
    ref = m.keyframes.get(mp.ref_kf_id)
    dist = float(np.linalg.norm(mp.pos - ref.camera_center()))
    idx = mp.observations.get(ref.id)
    level = int(ref.kp_octave[idx]) if idx is not None else 0
    max_d = dist * float(scale_factors[level])
    return (float(med.min()), normal.astype(np.float32),
            max_d / float(scale_factors[-1]), max_d)


def test_refresh_points_matches_naive(rng):
    """refresh_points (both the small dict-walk path and the large
    per-keyframe membership path) must reproduce the per-point reference
    math. The distinctive descriptor is only pinned up to median ties (the
    reference's std::map iteration order is pointer-arbitrary), so the
    chosen descriptor's median distance is asserted instead of its bits."""
    from ceres_mono_orb_slam2_tpu.models.map import hamming_np
    n_frames = 30
    h, w = 480, 640
    cfg = SlamConfig(
        camera=CameraConfig(fx=500.0, fy=500.0, cx=320.0, cy=240.0, fps=30.0),
        orb=ORBConfig(n_features=500),
        shapes=StaticShapes(max_local_points=2048, max_local_keyframes=12,
                            max_ba_points=1024, max_ba_obs=4096),
    )
    Rcw, tcw = make_geo_trajectory(n_frames, "strafe", 0.06)
    world = GeoWorld(rng, 2000)
    slam = MonoSLAM(cfg)
    slam.tracker.extractor = GeoExtractor(
        world, cfg.camera.K, Rcw, tcw, 500, h, w, px_noise=0.3, bit_noise=2,
        seed=3)
    for k in range(n_frames):
        slam.track_monocular(frame_image(k, h, w), k / 30.0)
    m = slam.map
    sf = cfg.orb.scale_factors
    all_ids = [mp.id for mp in m.all_map_points()]
    assert len(all_ids) > 96

    for ids in (all_ids, all_ids[: 40]):  # large path, then small path
        m.refresh_points(ids, sf)
        for mid in ids:
            mp = m.get_mp(mid)
            if mp is None or not mp.observations:
                continue
            want = naive_refresh(m, mp, sf)
            if want is None:
                continue
            med_min, normal, min_d, max_d = want
            # chosen descriptor must be one of the observation descriptors
            # achieving the minimal median distance
            descs = [m.keyframes[k2].desc[i2]
                     for k2, i2 in mp.observations.items()
                     if k2 in m.keyframes and not m.keyframes[k2].bad]
            D = np.stack(descs)
            got_med = float(np.median(hamming_np(D, mp.descriptor[None, :])))
            assert got_med == med_min, mid
            np.testing.assert_allclose(mp.normal, normal, atol=1e-5)
            assert abs(mp.max_dist - max_d) < 1e-4 * max(1.0, max_d)
            assert abs(mp.min_dist - min_d) < 1e-4 * max(1.0, min_d)


def test_soa_coherent_after_slam_run(rng):
    """Drive a real (geo-frontend) SLAM sequence — creation, triangulation,
    fuse/replace, culling, BA pos rewrites all flow through the tables."""
    n_frames = 36
    h, w = 480, 640
    cfg = SlamConfig(
        camera=CameraConfig(fx=500.0, fy=500.0, cx=320.0, cy=240.0, fps=30.0),
        orb=ORBConfig(n_features=500),
        shapes=StaticShapes(max_local_points=2048, max_local_keyframes=12,
                            max_ba_points=1024, max_ba_obs=4096),
    )
    Rcw, tcw = make_geo_trajectory(n_frames, "strafe", 0.06)
    world = GeoWorld(rng, 2000)
    slam = MonoSLAM(cfg)
    slam.tracker.extractor = GeoExtractor(
        world, cfg.camera.K, Rcw, tcw, 500, h, w, px_noise=0.3, bit_noise=2,
        seed=3)
    for k in range(n_frames):
        slam.track_monocular(frame_image(k, h, w), k / 30.0)
    assert slam.get_tracking_state() == "OK"

    m = slam.map
    assert m.n_map_points() > 200
    assert_soa_coherent(m)
    lm = slam.local_mapper
    table = m._obs_arrays()
    for kf in m.all_keyframes():
        assert kf.tracked_map_points(2, m) == naive_tracked(kf, m, 2)
        got, want = lm._median_depth(kf), naive_median_depth(kf, m)
        assert abs(got - want) < 1e-4 * max(1.0, abs(want)), (got, want)
        # culling redundancy counts vs the naive triple loop
        # (reference LocalMapping.cc:576-637 semantics)
        n_mps = n_red = 0
        for i in np.nonzero(kf.mp_ids >= 0)[0]:
            mp = m.get_mp(int(kf.mp_ids[i]))
            if mp is None:
                continue
            n_mps += 1
            if mp.n_obs <= 3:
                continue
            level = int(kf.kp_octave[i])
            n_better = 0
            for ok2, kidx2 in mp.observations.items():
                if ok2 == kf.id:
                    continue
                kf2 = m.keyframes.get(ok2)
                if kf2 is not None and not kf2.bad and \
                        int(kf2.kp_octave[kidx2]) <= level + 1:
                    n_better += 1
            n_red += n_better >= 3
        assert lm._redundancy(kf, table) == (n_mps, n_red), kf.id
        # covisibility weights vs the naive per-point dict walk
        counter = {}
        for mid in kf.mp_ids:
            mp = m.get_mp(int(mid)) if mid >= 0 else None
            if mp is None:
                continue
            for okf_id in mp.observations:
                if okf_id != kf.id:
                    counter[okf_id] = counter.get(okf_id, 0) + 1
        m.update_connections(kf)
        want_cov = {k: w for k, w in counter.items() if w >= 15}
        if not want_cov and counter:
            b = max(counter, key=counter.get)
            want_cov = {b: counter[b]}
        assert kf.covisible == want_cov, kf.id
