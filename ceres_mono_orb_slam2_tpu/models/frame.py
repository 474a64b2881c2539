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
    # host-side keypoint arrays, materialized together in ONE device_get on
    # first access (a lazy frame that is never promoted to a keyframe and
    # never hits a fallback path pays zero host transfer for these)
    _HOST_FIELDS = ("kp_xy", "kp_octave", "kp_angle", "kp_response",
                    "desc", "kp_valid", "kp_und")

    def __init__(self, feats, cam, timestamp: float, frame_id=None,
                 host=None, j_und=None, lazy=False):
        """feats: FrameFeatures for ONE frame (leading batch dim stripped).

        `host`, when given, is the pre-transferred tuple
        (kp_xy, kp_octave, kp_angle, kp_response, desc, kp_valid, kp_und) —
        callers that already hold the host copies pass them so the
        constructor must not issue another transfer. With `lazy=True` the
        host copies are NOT fetched up front: the first access to any host
        field triggers one batched device_get. The fused tracking path uses
        this so ordinary frames transfer only the small control outputs
        (~60 KB) — the full keypoint payload (~140 KB, ~30 ms of tunnel RTT
        + bandwidth) is paid only when the frame becomes a keyframe or a
        fallback path needs it. Derived device arrays (`j_und` without
        distortion work, `j_bits`) are lazy likewise."""
        import jax

        self.id = next(_frame_counter) if frame_id is None else frame_id
        self.timestamp = timestamp
        self._cam = cam

        self.j_xy = feats.xy
        self.j_octave = feats.octave
        self.j_angle = feats.angle
        self.j_valid = feats.valid
        self.j_desc = feats.desc
        self._j_response = feats.response
        self._j_und = j_und
        self._j_bits = None
        self._host_pending = False

        if host is not None:
            (self._kp_xy, self._kp_octave, self._kp_angle, self._kp_response,
             self._desc, self._kp_valid, self._kp_und) = host
        elif lazy:
            self._host_pending = True
            import threading

            self._host_lock = threading.Lock()
        else:
            # ONE batched transfer — per-field np.asarray calls are separate
            # device->host round-trips, which dominate per-frame wall time on
            # a remote-TPU tunnel
            (self._kp_xy, self._kp_octave, self._kp_angle, self._kp_response,
             self._desc, self._kp_valid, self._kp_und) = jax.device_get(
                (feats.xy, feats.octave, feats.angle, feats.response,
                 feats.desc, feats.valid, self.j_und))

        n = int(feats.xy.shape[0])
        self.mp_ids = np.full(n, -1, np.int64)
        self.outlier = np.zeros(n, bool)
        self.Rcw = np.eye(3, dtype=np.float32)
        self.tcw = np.zeros(3, np.float32)
        self.pose_set = False

    def start_host_copy_async(self):
        """Kick the device->host DMA for the full keypoint payload WITHOUT
        blocking. Used at keyframe promotion: the tracking thread starts the
        copy and returns immediately; the mapper thread's first host-field
        access then finds the data already (or nearly) on host instead of
        paying the full tunnel RTT + transfer. No-op once materialized."""
        if not self._host_pending:
            return
        for a in (self.j_xy, self.j_octave, self.j_angle, self._j_response,
                  self.j_desc, self.j_valid, self.j_und):
            f = getattr(a, "copy_to_host_async", None)
            if f is not None:
                f()

    def _materialize_host(self):
        import jax

        # two threads may race here (tracking fallback vs mapper promotion):
        # both would fetch the same immutable device arrays and write
        # identical results, so the race is benign — but serialize anyway so
        # the transfer happens once
        with self._host_lock:
            if not self._host_pending:
                return
            (self._kp_xy, self._kp_octave, self._kp_angle, self._kp_response,
             self._desc, self._kp_valid, self._kp_und) = jax.device_get(
                (self.j_xy, self.j_octave, self.j_angle, self._j_response,
                 self.j_desc, self.j_valid, self.j_und))
            self._host_pending = False

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
            self._j_bits = matcher.unpack_u8(self.j_desc)
        return self._j_bits

    @property
    def n_kp(self):
        return len(self.mp_ids)

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


def _host_field_property(name: str) -> property:
    priv = "_" + name

    def get(self):
        if self._host_pending:
            self._materialize_host()
        return getattr(self, priv)

    def set_(self, value):  # map-load path overwrites fields directly
        # If the frame is still lazy, pull the other six fields from device
        # FIRST — otherwise a later read would re-fetch everything and
        # silently clobber this explicit write.
        if self._host_pending:
            self._materialize_host()
        setattr(self, priv, value)

    return property(get, set_)


for _name in Frame._HOST_FIELDS:
    setattr(Frame, _name, _host_field_property(_name))
