"""Loop-closure end-to-end test through the FULL System (VERDICT r1 item #3):
a closed-circle trajectory with a real revisit drives detect -> sim3 ->
correct -> essential graph -> global BA through MonoSLAM, not a hand-built
map. Uses the geometric frontend (utils/geosim.py) so a full revolution runs
in test time; the reference validated loop closing only via dataset runs
(/root/reference/README.md:7)."""

import numpy as np

from ceres_mono_orb_slam2_tpu.models.system import MonoSLAM
from ceres_mono_orb_slam2_tpu.ops import bow
from ceres_mono_orb_slam2_tpu.utils.config import CameraConfig, ORBConfig, SlamConfig, StaticShapes
from ceres_mono_orb_slam2_tpu.utils.geosim import (
    GeoExtractor, GeoWorld, frame_image, make_geo_trajectory)
from ceres_mono_orb_slam2_tpu.utils.synthetic import ate_rmse


def test_circle_loop_closes_through_full_system(rng):
    n_frames = 72
    step = 0.1  # rad/frame -> revisit after ~63 frames
    h, w = 480, 640
    cfg = SlamConfig(
        camera=CameraConfig(fx=500.0, fy=500.0, cx=320.0, cy=240.0, fps=30.0),
        orb=ORBConfig(n_features=600),
        shapes=StaticShapes(max_local_points=2048, max_local_keyframes=12,
                            max_ba_points=1024, max_ba_obs=4096),
    )
    Rcw, tcw = make_geo_trajectory(n_frames, "circle", step)
    world = GeoWorld(rng, 2500, shape="ring")
    voc = bow.train_vocabulary(world.desc[:1500], k=8, levels=3, seed=0)

    slam = MonoSLAM(cfg, vocabulary=voc)
    slam.tracker.extractor = GeoExtractor(
        world, cfg.camera.K, Rcw, tcw, 600, h, w, px_noise=0.3, bit_noise=2, seed=3)

    gt_c = np.einsum("tij,tj->ti", Rcw.transpose(0, 2, 1), -tcw)
    est, gt = [], []
    for k in range(n_frames):
        T = slam.track_monocular(frame_image(k, h, w), k / 30.0)
        if T is not None:
            est.append(-T[:3, :3].T @ T[:3, 3])
            gt.append(gt_c[k])

    assert slam.get_tracking_state() == "OK"
    assert len(est) >= n_frames - 5, "tracking must survive the full circle"
    # the revisit must be detected and corrected through the live pipeline
    assert slam.loop_closer.n_loops_closed >= 1, "loop closure never fired"
    rmse = ate_rmse(np.stack(est), np.stack(gt))
    traj = np.linalg.norm(np.diff(np.stack(gt), axis=0), axis=1).sum()
    assert rmse < 0.02 * traj, (rmse, traj)
