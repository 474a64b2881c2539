"""Headless viewer: FrameDrawer with real image content (reference
FrameDrawer.cc:35-181) and map snapshot."""

import os

import numpy as np

from ceres_mono_orb_slam2_tpu.models.system import MonoSLAM
from ceres_mono_orb_slam2_tpu.utils.config import (
    CameraConfig, ORBConfig, SlamConfig, StaticShapes)
from ceres_mono_orb_slam2_tpu.utils.synthetic import make_sequence


def test_frame_drawer_renders_image(tmp_path):
    cfg = SlamConfig(
        camera=CameraConfig(fx=500.0, fy=500.0, cx=320.0, cy=240.0, fps=30.0),
        orb=ORBConfig(n_features=1500),
        shapes=StaticShapes(max_local_points=2048, max_local_keyframes=12,
                            max_ba_points=1024, max_ba_obs=4096),
    )
    seq = make_sequence(n_frames=6, motion="strafe", step=0.12, seed=11)
    slam = MonoSLAM(cfg, use_viewer=True)
    for k in range(6):
        slam.track_monocular(seq.images[k], seq.timestamps[k])
    # the tracker retains the current image for the drawer, quantized to
    # uint8 at entry (reference tracks CV_8U grayscale, Tracking.cc:154-177)
    expected = np.clip(seq.images[5] + 0.5, 0.0, 255.0).astype(np.uint8)
    assert np.array_equal(slam.tracker.current_image, expected)
    p_frame = slam.viewer.draw_frame(str(tmp_path / "frame.png"))
    p_map = slam.viewer.snapshot(str(tmp_path / "map.png"))
    slam.shutdown()
    # an image-backed frame plot is an order of magnitude larger than the
    # old keypoint-scatter-only one (~30 KB)
    assert p_frame is not None and os.path.getsize(p_frame) > 100_000
    assert p_map is not None and os.path.getsize(p_map) > 10_000
