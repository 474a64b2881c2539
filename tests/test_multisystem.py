"""Integrated multi-stream System (VERDICT round-2 #2c): S complete SLAM
systems with batched per-frame device stages must produce the same
trajectories as S sequential single-stream runs.
"""

import numpy as np
import pytest

from ceres_mono_orb_slam2_tpu.models.system import MonoSLAM
from ceres_mono_orb_slam2_tpu.parallel.multisystem import MultiStreamSLAM
from ceres_mono_orb_slam2_tpu.utils.config import (
    CameraConfig, ORBConfig, SlamConfig, StaticShapes)
from ceres_mono_orb_slam2_tpu.utils.synthetic import make_sequence


N_FRAMES = 13
SEEDS = (11, 12, 13)


def _config():
    return SlamConfig(
        camera=CameraConfig(fx=500.0, fy=500.0, cx=320.0, cy=240.0, fps=30.0),
        orb=ORBConfig(n_features=1500),
        shapes=StaticShapes(max_local_points=2048, max_local_keyframes=12,
                            max_ba_points=1024, max_ba_obs=4096),
    )


@pytest.fixture(scope="module")
def sequences():
    return [make_sequence(n_frames=N_FRAMES, motion="strafe", step=0.12, seed=s) for s in SEEDS]


def _centers(poses):
    out = []
    for T in poses:
        out.append(None if T is None else -T[:3, :3].T @ T[:3, 3])
    return out


def test_multistream_matches_sequential(sequences):
    S = len(SEEDS)
    # sequential reference runs: one MonoSLAM per stream, frames in order
    seq_poses = []
    for seq in sequences:
        slam = MonoSLAM(_config())
        ps = [slam.track_monocular(seq.images[k], seq.timestamps[k])
              for k in range(N_FRAMES)]
        slam.shutdown()
        seq_poses.append(ps)

    ms = MultiStreamSLAM(_config(), n_streams=S)
    batch_poses = [[] for _ in range(S)]
    for k in range(N_FRAMES):
        res = ms.track_batch([sequences[s].images[k] for s in range(S)],
                             [sequences[s].timestamps[k] for s in range(S)])
        for s in range(S):
            batch_poses[s].append(res[s])

    # the batched device path must have actually run (not all-single fallback)
    assert ms.n_batched_frames >= 5, ms.n_batched_frames

    for s in range(S):
        cs_seq = _centers(seq_poses[s])
        cs_bat = _centers(batch_poses[s])
        n_seq = sum(c is not None for c in cs_seq)
        n_bat = sum(c is not None for c in cs_bat)
        # identical tracking decisions frame-by-frame
        assert n_bat == n_seq, (s, n_bat, n_seq)
        errs = []
        for a, b in zip(cs_seq, cs_bat):
            assert (a is None) == (b is None), s
            if a is not None:
                errs.append(np.linalg.norm(a - b))
        # same math modulo batched-reduction float noise: the per-frame
        # camera centers agree far tighter than any tracking tolerance
        assert max(errs) < 1e-3, (s, max(errs))
        # per-stream maps grew independently
        assert ms.streams[s].map.n_keyframes() >= 2

    ms.shutdown()


def test_multistream_threaded_smoke(sequences):
    """threaded=True: per-stream mapping/loop workers (the reference's
    thread-pipeline, MonoORBSlam.cc:78-89) behind the batched frontend.
    Tracking decisions must survive the worker interleavings."""
    S = len(SEEDS)
    ms = MultiStreamSLAM(_config(), n_streams=S, threaded=True)
    n_ok = [0] * S
    for k in range(N_FRAMES):
        res = ms.track_batch([sequences[s].images[k] for s in range(S)],
                             [sequences[s].timestamps[k] for s in range(S)])
        for s in range(S):
            n_ok[s] += res[s] is not None
    assert ms.n_batched_frames >= 5, ms.n_batched_frames
    ms.shutdown()
    for s in range(S):
        # tracked most frames and the worker actually built each map
        assert n_ok[s] >= N_FRAMES - 4, (s, n_ok)
        assert ms.streams[s].map.n_keyframes() >= 2
        assert ms.streams[s].map.n_map_points() > 50
