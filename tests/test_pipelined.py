"""Pipelined tracking mode (models/tracking._grab_pipelined).

The pipelined tracker dispatches frame k's fused device step BEFORE fetching
frame k-1's results, chaining pose/velocity/point bindings frame-to-frame on
device (FusedOut.pos_kp/ok_next/next_local_row) so successive device->host
round-trips overlap device compute — the latency-hiding design for a
remote-TPU host where the transfer RTT (~29 ms through the axon tunnel)
otherwise dominates the 7 ms device step. The reference has no equivalent
(its tracker is synchronous, Tracking.cc:154-383); behavioral parity is with
OUR serial fused path: same math, same gates, one frame of pose latency.

These tests pin:
- the chain actually carries the run (not silently draining every frame),
- accuracy equals the serial path's bar on the same rendered sequence,
- the pipeline drains completely (trajectory/map current after shutdown),
- non-jittable frontends (GeoExtractor) degrade gracefully to serial.
"""

import numpy as np

from ceres_mono_orb_slam2_tpu.models.system import MonoSLAM
from ceres_mono_orb_slam2_tpu.utils.config import (
    CameraConfig, ORBConfig, SlamConfig, StaticShapes)
from ceres_mono_orb_slam2_tpu.utils.synthetic import (
    ate_rmse, make_sequence, trajectory_positions)


def _config():
    # identical to tests/test_slam_e2e.small_config so the rendered sequence
    # cache and the XLA compile cache are shared across the two modules
    return SlamConfig(
        camera=CameraConfig(fx=500.0, fy=500.0, cx=320.0, cy=240.0, fps=30.0),
        orb=ORBConfig(n_features=1500),
        shapes=StaticShapes(max_local_points=2048, max_local_keyframes=12,
                            max_ba_points=1024, max_ba_obs=4096),
    )


def test_pipelined_tracks_and_drains():
    # same sequence key as test_slam_e2e (render cached on disk)
    seq = make_sequence(n_frames=40, seed=11, motion="strafe", step=0.12)
    slam = MonoSLAM(_config(), pipelined=True)
    tracked = 0
    for k in range(seq.n_frames):
        T = slam.track_monocular(seq.images[k], seq.timestamps[k])
        if T is not None:
            tracked += 1
    tr = slam.tracker
    # with a frame in flight the consumed count lags the fed count by one
    assert tr._pending is not None or tr.n_chained_frames > 0
    slam.shutdown()
    assert tr._pending is None  # shutdown drained the pipeline
    assert slam.get_tracking_state() == "OK"

    # every post-initialization frame was consumed exactly once (frames
    # consumed by the two-view initializer don't log stats, like the serial
    # path)
    assert len(tr.frame_stats) >= seq.n_frames - 6
    # This aggressive little world inserts a keyframe nearly every frame
    # (instrumented: ~17 KFs over 40 frames), and every KF insert runs local
    # mapping + local BA, marking the map dirty — which breaks the chain at
    # the next grab by design (measured: the bench's gentler 150-frame
    # sequence chains ~32% of frames at a KF every ~5). Broken frames still
    # dispatch IN FLIGHT (_start_pipeline) and their async output copies had
    # a full frame to land, so the fetch-RTT overlap — the main win — applies
    # to ~every pipelined frame; chaining additionally skips host prep.
    assert tr.n_chained_frames >= 5, tr.n_chained_frames
    assert tr.n_discarded_chained == 0

    # accuracy: same <1% ATE bar as the serial run in test_slam_e2e, from
    # the drained trajectory log (poses return one frame late, so evaluate
    # the log rather than the per-call returns)
    est, gt, _ = trajectory_positions(
        tr.trajectory, slam.map, seq.timestamps, seq.poses_Rcw, seq.poses_tcw)
    rmse = ate_rmse(est, gt)
    traj_len = np.linalg.norm(np.diff(gt, axis=0), axis=1).sum()
    assert rmse < 0.01 * traj_len, (rmse, traj_len)
    assert slam.map.n_keyframes() >= 3
    assert slam.local_mapper.n_local_ba >= 1


def test_pipelined_threaded():
    """pipelined + threaded (the bench configuration): the mapping/loop
    worker mutates the map under map.update_lock while frames chain; the
    dirty-map chain break must keep the two consistent. Same accuracy bar."""
    seq = make_sequence(n_frames=40, seed=11, motion="strafe", step=0.12)
    slam = MonoSLAM(_config(), threaded=True, pipelined=True)
    for k in range(seq.n_frames):
        slam.track_monocular(seq.images[k], seq.timestamps[k])
    tr = slam.tracker
    slam.shutdown()
    assert tr._pending is None
    assert slam.get_tracking_state() == "OK"
    assert tr.n_discarded_chained == 0
    assert len(tr.frame_stats) >= seq.n_frames - 6

    est, gt, _ = trajectory_positions(
        tr.trajectory, slam.map, seq.timestamps, seq.poses_Rcw, seq.poses_tcw)
    rmse = ate_rmse(est, gt)
    traj_len = np.linalg.norm(np.diff(gt, axis=0), axis=1).sum()
    assert rmse < 0.01 * traj_len, (rmse, traj_len)


def test_pipelined_geo_frontend_falls_back_serial():
    """GeoExtractor has no jittable frontend: the pipelined tracker must
    degrade to the synchronous paths and still track."""
    from ceres_mono_orb_slam2_tpu.utils.geosim import (
        GeoExtractor, GeoWorld, frame_image, make_geo_trajectory)

    rng = np.random.default_rng(0)
    h, w = 480, 640
    cfg = SlamConfig(
        camera=CameraConfig(fx=500.0, fy=500.0, cx=320.0, cy=240.0, fps=30.0),
        orb=ORBConfig(n_features=600),
        shapes=StaticShapes(max_local_points=2048, max_local_keyframes=12,
                            max_ba_points=1024, max_ba_obs=4096),
    )
    n_frames = 25
    Rcw, tcw = make_geo_trajectory(n_frames, "strafe")
    world = GeoWorld(rng, 2500)
    slam = MonoSLAM(cfg, pipelined=True)
    slam.tracker.extractor = GeoExtractor(
        world, cfg.camera.K, Rcw, tcw, 600, h, w, px_noise=0.3, bit_noise=2, seed=3)
    tracked = 0
    for k in range(n_frames):
        if slam.track_monocular(frame_image(k, h, w), k / 30.0) is not None:
            tracked += 1
    slam.shutdown()
    assert slam.tracker.n_chained_frames == 0  # nothing to chain
    assert slam.tracker._pending is None
    assert slam.get_tracking_state() == "OK"
    assert tracked >= n_frames - 5
