"""Mid-sequence failure recovery: total occlusion for several frames drives
tracking to LOST; BoW relocalization must recover it in-stream and tracking
must continue (the reference's LOST -> Relocalization state path,
Tracking.cc:306/979 — its fr2_360_kidnap scenario, but with the blackout in
the middle of a live run rather than a synthetic teleport)."""

import numpy as np

from ceres_mono_orb_slam2_tpu.models.system import MonoSLAM
from ceres_mono_orb_slam2_tpu.ops import bow
from ceres_mono_orb_slam2_tpu.utils.config import CameraConfig, ORBConfig, SlamConfig, StaticShapes
from ceres_mono_orb_slam2_tpu.utils.geosim import (
    GeoExtractor, GeoWorld, frame_image, make_geo_trajectory)


def test_blackout_relocalization(rng):
    n_frames = 44
    h, w = 480, 640
    cfg = SlamConfig(
        camera=CameraConfig(fx=500.0, fy=500.0, cx=320.0, cy=240.0, fps=30.0),
        orb=ORBConfig(n_features=600),
        shapes=StaticShapes(max_local_points=2048, max_local_keyframes=12,
                            max_ba_points=1024, max_ba_obs=4096),
    )
    # pause at the blackout (camera holds still: reloc must re-find the SAME
    # place, like an occlusion passing in front of the lens)
    Rcw, tcw = make_geo_trajectory(n_frames, "strafe", 0.12)
    hold = 28
    Rcw[hold:], tcw[hold:] = Rcw[hold - 4], tcw[hold - 4]
    world = GeoWorld(rng, 2500, extent=10.0)
    voc = bow.train_vocabulary(world.desc[:1500], k=8, levels=3, seed=0)

    slam = MonoSLAM(cfg, vocabulary=voc)
    slam.tracker.extractor = GeoExtractor(
        world, cfg.camera.K, Rcw, tcw, 600, h, w,
        px_noise=0.3, bit_noise=2, seed=7, blackout=range(24, 28))

    states = []
    for k in range(n_frames):
        slam.track_monocular(frame_image(k, h, w), k / 30.0)
        states.append(slam.get_tracking_state())

    assert "LOST" in states[24:28], states  # blackout must lose tracking
    assert states[-1] == "OK", states  # and relocalization must recover
    # recovery happened via reloc, not a reset (map survived)
    assert slam.tracker.n_resets == 0
    assert slam.map.n_keyframes() >= 3
