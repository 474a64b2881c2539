"""Relocalization (kidnap) test: build a map with a BoW vocabulary, force
tracking LOST, re-feed a previously-seen view, and verify the BoW database +
PnP RANSAC + pose-opt pipeline recovers the pose (the reference's
fr2_360_kidnap stress scenario)."""

import numpy as np
import pytest

from ceres_mono_orb_slam2_tpu.models.system import MonoSLAM
from ceres_mono_orb_slam2_tpu.models.tracking import State
from ceres_mono_orb_slam2_tpu.ops import bow
from ceres_mono_orb_slam2_tpu.utils.config import CameraConfig, ORBConfig, SlamConfig, StaticShapes
from ceres_mono_orb_slam2_tpu.utils.synthetic import make_sequence


def test_kidnap_relocalization(rng):
    # 40-frame render (cached; same world/trajectory prefix as the 11-frame
    # variant — the world is seeded independently of n_frames): frames 0-10
    # build the map, the tail exercises full-SLAM resume after load
    seq = make_sequence(n_frames=40, seed=11, motion="strafe", step=0.12)
    cfg = SlamConfig(
        camera=CameraConfig(fx=500.0, fy=500.0, cx=320.0, cy=240.0, fps=30.0),
        orb=ORBConfig(n_features=1500),
        shapes=StaticShapes(max_local_points=4096, max_local_keyframes=12,
                            max_ba_points=2048, max_ba_obs=8192),
    )
    # vocabulary trained on descriptors of the first frame
    from ceres_mono_orb_slam2_tpu.ops.orb import ORBExtractor

    feats = ORBExtractor(cfg.orb).extract(seq.images[0])
    voc = bow.train_vocabulary(np.asarray(feats.desc)[0], k=8, levels=3, seed=0)

    slam = MonoSLAM(cfg, vocabulary=voc)
    poses = {}
    for k in range(11):
        T = slam.track_monocular(seq.images[k], seq.timestamps[k])
        if T is not None:
            poses[k] = T
    assert slam.get_tracking_state() == "OK"
    assert slam.keyframe_db is not None and slam.keyframe_db.inverted, "BoW index empty"

    # kidnap: blind the tracker, then show it frame 5's view again
    slam.tracker.state = State.LOST
    slam.tracker.velocity = None
    T = slam.track_monocular(seq.images[5], seq.timestamps[-1] + 1.0)
    assert T is not None, "relocalization failed"
    assert slam.get_tracking_state() == "OK"
    c_reloc = -T[:3, :3].T @ T[:3, 3]
    c_orig = -poses[5][:3, :3].T @ poses[5][:3, 3]
    assert np.linalg.norm(c_reloc - c_orig) < 0.02, (c_reloc, c_orig)

    # save -> load into a FRESH system -> relocalize in localization-only
    # mode (the map-reuse capability the reference left as TODO,
    # MonoORBSlam.h:78-81)
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "map.npz")
        slam.save_map(path)

        slam2 = MonoSLAM(cfg, vocabulary=voc)
        slam2.load_map(path)
        assert slam2.map.n_keyframes() == slam.map.n_keyframes()
        assert slam2.map.n_map_points() == slam.map.n_map_points()
        assert slam2.keyframe_db.inverted, "BoW index not rebuilt on load"
        # loaded keyframes carry full payloads (descriptors, keypoints)
        any_kf = next(iter(slam2.map.keyframes.values()))
        assert any_kf.desc.shape[-1] == 32 and any_kf.kp_und.shape[-1] == 2
        assert any_kf.mp_ids.max() >= 0, "observations not restored"

        slam2.activate_localization_mode()
        slam2.tracker.state = State.LOST
        T2 = slam2.track_monocular(seq.images[5], 99.0)
        assert T2 is not None, "relocalization from loaded map failed"
        c2 = -T2[:3, :3].T @ T2[:3, 3]
        assert np.linalg.norm(c2 - c_orig) < 0.02, (c2, c_orig)
        # keep tracking in localization mode (TrackingWithKnownMap motion
        # path, reference Tracking.cc:185-236); the map must stay frozen
        n_kfs = slam2.map.n_keyframes()
        for k in (6, 7, 8):
            Tk = slam2.track_monocular(seq.images[k], 99.0 + k)
            assert Tk is not None, f"localization-only tracking lost at {k}"
        assert slam2.map.n_keyframes() == n_kfs, "localization mode must not map"

        # full-SLAM RESUME into the loaded map (the reference's "map reusing"
        # TODO, README.md:46): leave localization mode and extend into
        # territory the saved map never saw — new keyframes must join the
        # loaded graph and the resumed trajectory must stay accurate
        slam2.deactivate_localization_mode()
        est, gt = [], []
        for k in range(9, 22):
            Tk = slam2.track_monocular(seq.images[k], 99.0 + k)
            assert Tk is not None, f"resume tracking lost at frame {k}"
            est.append(-Tk[:3, :3].T @ Tk[:3, 3])
            gt.append(-seq.poses_Rcw[k].T @ seq.poses_tcw[k])
        assert slam2.map.n_keyframes() > n_kfs, "map did not grow on resume"
        from ceres_mono_orb_slam2_tpu.utils.synthetic import ate_rmse

        est, gt = np.stack(est), np.stack(gt)
        traj_len = np.linalg.norm(np.diff(gt, axis=0), axis=1).sum()
        assert ate_rmse(est, gt) < 0.02 * traj_len
        slam2.shutdown()


def test_relocalization_from_coarse_pnp(rng, monkeypatch):
    """VERDICT r1 #7 done-criterion: relocalization must succeed from a
    deliberately coarse first PnP — the wide (th=10/dist=100) and narrow
    (th=3/dist=64) projection passes plus re-optimization have to pull a
    perturbed RANSAC pose back (reference Tracking.cc:1039-1128)."""
    seq = make_sequence(n_frames=11, seed=11, motion="strafe", step=0.12)
    cfg = SlamConfig(
        camera=CameraConfig(fx=500.0, fy=500.0, cx=320.0, cy=240.0, fps=30.0),
        orb=ORBConfig(n_features=1500),
        shapes=StaticShapes(max_local_points=4096, max_local_keyframes=12,
                            max_ba_points=2048, max_ba_obs=8192),
    )
    from ceres_mono_orb_slam2_tpu.ops.orb import ORBExtractor

    feats = ORBExtractor(cfg.orb).extract(seq.images[0])
    voc = bow.train_vocabulary(np.asarray(feats.desc)[0], k=8, levels=3, seed=0)
    slam = MonoSLAM(cfg, vocabulary=voc)
    poses = {}
    for k in range(seq.n_frames):
        T = slam.track_monocular(seq.images[k], seq.timestamps[k])
        if T is not None:
            poses[k] = T
    assert slam.get_tracking_state() == "OK"

    # degrade the PnP: perturb its pose and report few inliers, so the
    # projection-widening passes must do the real work
    from ceres_mono_orb_slam2_tpu.ops import lie, pnp as pnp_mod
    import jax.numpy as jnp_

    orig = pnp_mod.ransac_pnp

    def coarse(*args, **kwargs):
        res = orig(*args, **kwargs)
        dR, dt = lie.se3_exp(jnp_.asarray(
            np.array([0.02, -0.015, 0.02, 0.008, -0.006, 0.008], np.float32)))
        Rp = dR @ res.R
        tp = (dR @ res.t[..., None])[..., 0] + dt
        return res._replace(R=Rp, t=tp)

    import ceres_mono_orb_slam2_tpu.models.tracking as tracking_mod

    monkeypatch.setattr(tracking_mod.pnp, "ransac_pnp", coarse)

    slam.tracker.state = State.LOST
    slam.tracker.velocity = None
    T = slam.track_monocular(seq.images[5], seq.timestamps[-1] + 1.0)
    assert T is not None, "relocalization from coarse PnP failed"
    assert slam.get_tracking_state() == "OK"
    c_reloc = -T[:3, :3].T @ T[:3, 3]
    c_orig = -poses[5][:3, :3].T @ poses[5][:3, 3]
    assert np.linalg.norm(c_reloc - c_orig) < 0.02, (c_reloc, c_orig)
