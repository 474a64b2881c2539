"""System facade (reference src/MonoORBSlam.cc): wires tracking, local
mapping, loop closing; exposes TrackMonocular, mode switches, reset,
trajectory/map savers with the reference's file formats.

The reference runs LocalMapping/LoopClosing on std::threads with
mutex-guarded queues (MonoORBSlam.cc:78-89). Correctness does not depend on
that concurrency, so the default here is a deterministic sequential pipeline
(track -> drain mapping queue -> drain loop queue); `threaded=True` moves
the mapping+loop stages onto a host worker thread overlapping the device
tracking work, mirroring the reference's architecture.
"""

from __future__ import annotations

import logging
import queue
import threading
from typing import Optional

import numpy as np

from ceres_mono_orb_slam2_tpu.models.frame import Frame
from ceres_mono_orb_slam2_tpu.models.localmapping import LocalMapping
from ceres_mono_orb_slam2_tpu.models.map import Map
from ceres_mono_orb_slam2_tpu.models.tracking import State, Tracking
from ceres_mono_orb_slam2_tpu.ops import lie
from ceres_mono_orb_slam2_tpu.ops.orb import ORBExtractor

import jax.numpy as jnp

log = logging.getLogger(__name__)


class MonoSLAM:
    """Python equivalent of the reference MonoORBSlam facade."""

    def __init__(self, config, vocabulary=None, use_viewer: bool = False, threaded: bool = False):
        self.config = config
        self.map = Map()
        self.extractor = ORBExtractor(config.orb)
        self.loop_closer = None
        self.keyframe_db = None
        if vocabulary is not None:
            from ceres_mono_orb_slam2_tpu.models.keyframe_database import KeyFrameDatabase
            from ceres_mono_orb_slam2_tpu.models.loopclosing import LoopClosing

            self.keyframe_db = KeyFrameDatabase(vocabulary, self.map)
            self.map.keyframe_db = self.keyframe_db
            self.loop_closer = LoopClosing(config, self.map, self.keyframe_db)
        self.local_mapper = LocalMapping(config, self.map, loop_closer=self.loop_closer)
        self.tracker = Tracking(
            config, self.map, self.extractor,
            local_mapper=self.local_mapper, relocalizer=self.keyframe_db,
        )
        if self.loop_closer is not None:
            self.loop_closer.local_mapper = self.local_mapper
        self.threaded = threaded
        self._worker: Optional[threading.Thread] = None
        self._work_q: "queue.Queue[int]" = queue.Queue()
        self._shutdown = False
        if threaded:
            self._worker = threading.Thread(target=self._mapping_worker, daemon=True)
            self._worker.start()
        self.use_viewer = use_viewer
        self.viewer = None
        if use_viewer:
            from ceres_mono_orb_slam2_tpu.viewer import Viewer

            self.viewer = Viewer(config, self.map, self.tracker)

    # --------------------------------------------------------------- pipeline

    def _mapping_worker(self):
        while not self._shutdown:
            try:
                self._work_q.get(timeout=0.05)
            except queue.Empty:
                continue
            with self.map.update_lock:
                self.local_mapper.process_queue()
                if self.loop_closer is not None:
                    self.loop_closer.process_queue()

    def track_monocular(self, image: np.ndarray, timestamp: float):
        """Reference TrackMonocular (MonoORBSlam.cc:103-141). Returns Tcw
        (4,4) numpy or None."""
        Tcw = self.tracker.grab_image(image, timestamp)
        if self.threaded:
            if self.local_mapper.queue:
                self._work_q.put(1)
        else:
            self.local_mapper.process_queue()
            if self.loop_closer is not None:
                self.loop_closer.process_queue()
        if self.viewer is not None:
            self.viewer.update()
        return Tcw

    def activate_localization_mode(self):
        self.tracker.localization_only = True

    def deactivate_localization_mode(self):
        self.tracker.localization_only = False

    def reset(self):
        with self.map.update_lock:
            self.tracker.reset()

    def shutdown(self):
        self._shutdown = True
        if self._worker is not None:
            self._worker.join(timeout=2.0)
        if not self.threaded:
            self.local_mapper.process_queue()

    def get_tracking_state(self) -> str:
        return self.tracker.state.name

    def n_tracked_points(self) -> int:
        return self.tracker.matches_inliers

    # ----------------------------------------------------------------- savers

    def save_keyframe_trajectory_tum(self, path: str):
        """Reference SaveKeyFrameTrajectoryTUM (MonoORBSlam.cc:249-278):
        'timestamp tx ty tz qx qy qz qw' per keyframe, camera-to-world."""
        kfs = sorted(self.map.all_keyframes(), key=lambda k: k.id)
        with open(path, "w") as f:
            for kf in kfs:
                Rwc = kf.Rcw.T
                twc = -Rwc @ kf.tcw
                q = np.asarray(lie.rot_to_quat(jnp.asarray(Rwc)))
                f.write(
                    "%f %.7f %.7f %.7f %.7f %.7f %.7f %.7f\n"
                    % (kf.timestamp, twc[0], twc[1], twc[2], q[0], q[1], q[2], q[3])
                )
        log.info("trajectory saved to %s", path)

    def save_frame_trajectory_tum(self, path: str):
        """Per-frame trajectory from the relative-to-keyframe log (the
        reference records the same relative transforms, Tracking.cc:367-382)."""
        with open(path, "w") as f:
            for kf_id, R_rel, t_rel, ts, lost in self.tracker.trajectory:
                kf = self.map.keyframes.get(kf_id)
                if kf is None:
                    continue
                Rcw = R_rel @ kf.Rcw
                tcw = R_rel @ kf.tcw + t_rel
                Rwc = Rcw.T
                twc = -Rwc @ tcw
                q = np.asarray(lie.rot_to_quat(jnp.asarray(Rwc)))
                f.write(
                    "%f %.7f %.7f %.7f %.7f %.7f %.7f %.7f\n"
                    % (ts, twc[0], twc[1], twc[2], q[0], q[1], q[2], q[3])
                )

    def save_map(self, path: str):
        """Map snapshot (reference SaveMap writes OpenCV-YAML,
        MonoORBSlam.cc:194-247; we write npz with the same content: map point
        id/pos/descriptor, keyframe id/timestamp/pose/point-indices)."""
        mps = self.map.all_map_points()
        kfs = sorted(self.map.all_keyframes(), key=lambda k: k.id)
        np.savez_compressed(
            path,
            mp_ids=np.array([mp.id for mp in mps], np.int64),
            mp_pos=np.stack([mp.pos for mp in mps]) if mps else np.zeros((0, 3), np.float32),
            mp_desc=np.stack([mp.descriptor for mp in mps]) if mps else np.zeros((0, 32), np.uint8),
            mp_min_dist=np.array([mp.min_dist for mp in mps], np.float32),
            mp_max_dist=np.array([mp.max_dist for mp in mps], np.float32),
            mp_normal=np.stack([mp.normal for mp in mps]) if mps else np.zeros((0, 3), np.float32),
            kf_ids=np.array([kf.id for kf in kfs], np.int64),
            kf_timestamps=np.array([kf.timestamp for kf in kfs], np.float64),
            kf_Rcw=np.stack([kf.Rcw for kf in kfs]) if kfs else np.zeros((0, 3, 3), np.float32),
            kf_tcw=np.stack([kf.tcw for kf in kfs]) if kfs else np.zeros((0, 3), np.float32),
            kf_mp_ids=np.stack([kf.mp_ids for kf in kfs]) if kfs else np.zeros((0, 0), np.int64),
        )
        log.info("map saved to %s (%d points, %d keyframes)", path, len(mps), len(kfs))

    def load_map(self, path: str):
        """Map re-load (the reference lists LoadMap as an unchecked TODO,
        MonoORBSlam.h:78-81; implemented here for localization/reloc reuse)."""
        data = np.load(path)
        m = self.map
        m.clear()
        id_map = {}
        for i, mid in enumerate(data["mp_ids"]):
            mp = m.new_map_point(data["mp_pos"][i], data["mp_desc"][i], ref_kf_id=-1)
            mp.min_dist = float(data["mp_min_dist"][i])
            mp.max_dist = float(data["mp_max_dist"][i])
            mp.normal = data["mp_normal"][i]
            id_map[int(mid)] = mp.id
        # keyframes need keypoint payloads which the snapshot doesn't carry;
        # loaded maps are intended for localization-only relocalization where
        # map points suffice. Keyframe poses are restored as lightweight stubs.
        self._loaded_kf_poses = {
            int(k): (data["kf_Rcw"][i], data["kf_tcw"][i]) for i, k in enumerate(data["kf_ids"])
        }
        return id_map
