"""Per-frame container (reference src/Frame.cc).

Holds the SoA keypoint/descriptor tensors for one image: extraction happens
in the batched device extractor, undistortion in one jit call (reference
UndistortKeyPoints, Frame.cc:329-355). The reference's 64x48 acceleration
grid (AssignFeaturesToGrid) is intentionally absent: every windowed search is
a dense masked distance matrix on the MXU, which subsumes GetFeaturesInArea.
"""

from __future__ import annotations

import itertools

import numpy as np
import jax.numpy as jnp

from ceres_mono_orb_slam2_tpu.ops import camera, matcher

_frame_counter = itertools.count()


def compute_image_bounds(cam, h: int, w: int) -> np.ndarray:
    """Undistorted image bounds from the 4 corners (reference
    Frame::ComputeImageBounds, Frame.cc:357-385)."""
    if not cam.has_distortion:
        return np.array([0.0, w, 0.0, h], np.float32)
    corners = jnp.asarray([[0.0, 0.0], [w, 0.0], [0.0, h], [w, h]], jnp.float32)
    und = np.asarray(camera.undistort_points(corners, jnp.asarray(cam.K), jnp.asarray(cam.dist_coeffs)))
    return np.array(
        [min(und[0, 0], und[2, 0]), max(und[1, 0], und[3, 0]),
         min(und[0, 1], und[1, 1]), max(und[2, 1], und[3, 1])],
        np.float32,
    )


class Frame:
    def __init__(self, feats, cam, timestamp: float, frame_id=None,
                 host=None, j_und=None):
        """feats: FrameFeatures for ONE frame (leading batch dim stripped).

        `host`, when given, is the pre-transferred tuple
        (kp_xy, kp_octave, kp_angle, kp_response, desc, kp_valid, kp_und) —
        the fused tracking path batches these into its single device_get, so
        the constructor must not issue another transfer. `j_und` likewise
        passes the device-side undistorted coordinates computed in the fused
        step. Derived device arrays (`j_und` without distortion work, `j_bits`)
        are lazy: each is one device dispatch, only paid by the code paths
        that actually use them (fallback matchers)."""
        import jax

        self.id = next(_frame_counter) if frame_id is None else frame_id
        self.timestamp = timestamp
        self._cam = cam

        self.j_xy = feats.xy
        self.j_octave = feats.octave
        self.j_angle = feats.angle
        self.j_valid = feats.valid
        self.j_desc = feats.desc
        self._j_und = j_und
        self._j_bits = None

        if host is not None:
            (self.kp_xy, self.kp_octave, self.kp_angle, self.kp_response,
             self.desc, self.kp_valid, self.kp_und) = host
        else:
            # ONE batched transfer — per-field np.asarray calls are separate
            # device->host round-trips, which dominate per-frame wall time on
            # a remote-TPU tunnel
            (self.kp_xy, self.kp_octave, self.kp_angle, self.kp_response,
             self.desc, self.kp_valid, self.kp_und) = jax.device_get(
                (feats.xy, feats.octave, feats.angle, feats.response,
                 feats.desc, feats.valid, self.j_und))

        n = len(self.kp_xy)
        self.mp_ids = np.full(n, -1, np.int64)
        self.outlier = np.zeros(n, bool)
        self.Rcw = np.eye(3, dtype=np.float32)
        self.tcw = np.zeros(3, np.float32)
        self.pose_set = False

    @property
    def j_und(self):
        if self._j_und is None:
            cam = self._cam
            if cam.has_distortion:
                self._j_und = camera.undistort_points(
                    self.j_xy, jnp.asarray(cam.K), jnp.asarray(cam.dist_coeffs))
            else:
                self._j_und = self.j_xy
        return self._j_und

    @property
    def j_bits(self):
        if self._j_bits is None:
            self._j_bits = matcher.unpack_bits_pm1(self.j_desc)
        return self._j_bits

    @property
    def n_kp(self):
        return len(self.kp_xy)

    def set_pose(self, Rcw, tcw):
        R = np.asarray(Rcw, np.float64).reshape(3, 3)
        # project to SO(3): determinant drift in composed f32 rotations acts
        # as a hidden scale factor and compounds exponentially through the
        # constant-velocity model (the round-1 frame-14 divergence; the
        # reference renormalizes its quaternion, CeresOptimizer.cc:335)
        for _ in range(2):
            R = R @ (1.5 * np.eye(3) - 0.5 * (R.T @ R))
        self.Rcw = R.astype(np.float32)
        self.tcw = np.asarray(tcw, np.float32).reshape(3)
        self.pose_set = True

    def camera_center(self) -> np.ndarray:
        return (-self.Rcw.T @ self.tcw).astype(np.float32)
