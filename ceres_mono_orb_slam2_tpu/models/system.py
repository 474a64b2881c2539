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

    def __init__(self, config, vocabulary=None, use_viewer: bool = False, threaded: bool = False,
                 live_viewer_port: Optional[int] = None, pipelined: bool = False):
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
            self.loop_closer = LoopClosing(config, self.map, self.keyframe_db,
                                           threaded_gba=threaded)
        self.local_mapper = LocalMapping(config, self.map, loop_closer=self.loop_closer)
        self.tracker = Tracking(
            config, self.map, self.extractor,
            local_mapper=self.local_mapper, relocalizer=self.keyframe_db,
            pipelined=pipelined,
        )
        if self.loop_closer is not None:
            self.loop_closer.local_mapper = self.local_mapper
        self.threaded = threaded
        self._last_big_change = 0
        self._worker: Optional[threading.Thread] = None
        self._work_q: "queue.Queue[int]" = queue.Queue()
        self._worker_busy = False
        self._shutdown = False
        if threaded:
            self._worker = threading.Thread(target=self._mapping_worker,
                                            name="mapper", daemon=True)
            self._worker.start()
        self.use_viewer = use_viewer
        self.viewer = None
        if use_viewer:
            from ceres_mono_orb_slam2_tpu.viewer import Viewer

            self.viewer = Viewer(config, self.map, self.tracker)
        # interactive HTTP viewer with the Pangolin menu semantics
        # (reference Viewer.cc:70-190); port 0 = ephemeral
        self.live_viewer = None
        if live_viewer_port is not None:
            from ceres_mono_orb_slam2_tpu.live_viewer import LiveViewer

            self.live_viewer = LiveViewer(self, port=live_viewer_port).start()
            log.info("live viewer at http://127.0.0.1:%d/", self.live_viewer.port)

    # --------------------------------------------------------------- pipeline

    def _mapping_worker(self):
        while not self._shutdown:
            try:
                self._work_q.get(timeout=0.05)
            except queue.Empty:
                continue
            self._worker_busy = True
            try:
                # LocalMapping takes map.update_lock per STAGE internally (see
                # LocalMapping._process) so the tracker interleaves between
                # stages instead of stalling for the whole mapping pass
                self.local_mapper.process_queue()
                # The loop stage takes map.update_lock itself only around the
                # map-mutating correction (LoopClosing._correct_loop), like the
                # reference's fine-grained mutexes. Holding the lock across the
                # whole stage would deadlock threaded GBA: _correct_loop joins
                # the GBA thread, which needs the lock for its snapshot/apply.
                if self.loop_closer is not None:
                    self.loop_closer.process_queue()
            finally:
                self._worker_busy = False

    def wait_mapper_idle(self, timeout: float = 30.0) -> bool:
        """Block until the mapping/loop worker has drained (queues empty, no
        pass in flight). The reference's drivers pace frames at camera fps
        (main.cc:97-106), which implicitly yields host time to the mapping
        thread; max-rate harnesses and tests call this for the same effect.
        Returns False on timeout. No-op (True) in non-threaded mode."""
        import time as _time

        if not self.threaded:
            return True
        t0 = _time.monotonic()
        while _time.monotonic() - t0 < timeout:
            if (not self.local_mapper.queue and not self._worker_busy
                    and (self.loop_closer is None
                         or not self.loop_closer.queue)):
                return True
            _time.sleep(0.002)
        return False

    def prewarm(self, h: int, w: int) -> dict:
        """Compile every steady-state jit shape bucket before frame 0 (the
        reference compiles once at build time, main.cc has no warmup; see
        models/prewarm.py). Returns phase timings. First-ever run pays XLA
        once; afterwards the persistent compile cache makes this seconds."""
        from ceres_mono_orb_slam2_tpu.models.prewarm import prewarm

        return prewarm(self, h, w)

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
        self.tracker.flush_pipeline()
        self.tracker.localization_only = True

    def deactivate_localization_mode(self):
        self.tracker.flush_pipeline()
        self.tracker.localization_only = False

    def reset(self):
        with self.map.update_lock:
            self.tracker.reset()

    def shutdown(self):
        # drain any in-flight pipelined frame so the trajectory log and map
        # are complete before the workers stop
        self.tracker.flush_pipeline()
        self._shutdown = True
        if self.live_viewer is not None:
            self.live_viewer.shutdown()
        if self._worker is not None:
            # a worker mid-XLA-compile can take tens of seconds to notice
            # _shutdown; abandoning it as a daemon thread makes interpreter
            # teardown abort inside the XLA runtime ("pure virtual method
            # called") — join generously instead
            self._worker.join(timeout=120.0)
            if self._worker.is_alive():
                log.warning("mapping worker still busy at shutdown; "
                            "abandoning it (teardown may be unclean)")
        # a keyframe enqueued by the pipeline flush above may never have been
        # handed to the worker (it only wakes on track_monocular's signal):
        # drain the mapper so the saved map includes its triangulation pass
        with self.map.update_lock:
            self.local_mapper.process_queue()
        # ...and the loop closer (outside the map lock — it takes the lock
        # itself): a loop detectable on that final keyframe must correct the
        # map BEFORE the savers persist it
        if self.loop_closer is not None:
            self.loop_closer.process_queue()
            if self.loop_closer.gba_thread is not None:
                self.loop_closer.gba_thread.join(timeout=30.0)

    def map_changed(self) -> bool:
        """Reference MonoORBSlam::MapChanged (MonoORBSlam.cc:143-151): true
        once after each big map change (loop correction, global BA apply),
        tracked against the map's big-change counter (Map.cc:63-71)."""
        cur = self.map.big_change_idx
        if self._last_big_change < cur:
            self._last_big_change = cur
            return True
        return False

    def get_tracking_state(self) -> str:
        return self.tracker.state.name

    def n_tracked_points(self) -> int:
        return self.tracker.matches_inliers

    def get_tracked_map_points(self):
        """Reference GetTrackedMapPoints (MonoORBSlam.cc:280-283): the map
        points associated to the current frame's keypoints (None for
        unmatched slots)."""
        f = self.tracker.current
        if f is None:
            return []
        out = []
        for m in f.mp_ids:
            mp = None
            if m >= 0:
                # follow Replace() forwarding (the reference resolves
                # replaced pointers via CheckReplacedInLastFrame,
                # Tracking.cc:553-564) and drop dead tombstones
                rid = self.map.resolve(int(m))
                if rid >= 0:
                    mp = self.map.map_points.get(rid)
                    if mp is not None and mp.bad:
                        mp = None
            out.append(mp)
        return out

    def get_tracked_keypoints_un(self) -> np.ndarray:
        """Reference GetTrackedKeyPointsUn (MonoORBSlam.cc:285-288): the
        current frame's undistorted keypoints, (N, 2) float32 — a PARALLEL
        array to get_tracked_map_points() (same per-slot indexing as the
        reference's keypoint/map-point vectors; padded slots carry NaN)."""
        f = self.tracker.current
        if f is None:
            return np.zeros((0, 2), np.float32)
        kp = np.array(f.kp_und, np.float32)
        kp[~np.asarray(f.kp_valid)] = np.nan
        return kp

    # ----------------------------------------------------------------- savers

    def save_keyframe_trajectory_tum(self, path: str):
        """Reference SaveKeyFrameTrajectoryTUM (MonoORBSlam.cc:249-278):
        'timestamp tx ty tz qx qy qz qw' per keyframe, camera-to-world."""
        self.tracker.flush_pipeline()
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

    def get_frame_trajectory(self):
        """Resolved per-frame trajectory as (timestamps, Twc positions) —
        the in-memory equivalent of save_frame_trajectory_tum. Every frame's
        pose is re-based on its reference keyframe's CURRENT (loop-corrected,
        GBA-refined) pose, exactly like the reference saver
        (MonoORBSlam.cc:286-300): evaluating ATE on these, not on the poses
        captured live at track time, is the reference's own protocol
        (main.cc saves first, evaluation reads the file)."""
        self.tracker.flush_pipeline()
        ts_l, pos_l = [], []
        with self.map.update_lock:
            for kf_id, R_rel, t_rel, ts, lost in self.tracker.trajectory:
                if lost:
                    continue
                pose = self.map.resolve_kf_pose(kf_id, R_rel, t_rel)
                if pose is None:
                    continue
                Rcw, tcw = pose
                ts_l.append(ts)
                pos_l.append(-Rcw.T @ tcw)
        return np.asarray(ts_l), np.asarray(pos_l)

    def save_frame_trajectory_tum(self, path: str):
        """Per-frame trajectory from the relative-to-keyframe log (the
        reference records the same relative transforms, Tracking.cc:367-382)."""
        self.tracker.flush_pipeline()
        with open(path, "w") as f:
            for kf_id, R_rel, t_rel, ts, lost in self.tracker.trajectory:
                # resolve_kf_pose walks the culled-keyframe parent chain like
                # the reference saver (pKF->mTcp composition)
                pose = self.map.resolve_kf_pose(kf_id, R_rel, t_rel)
                if pose is None:
                    continue
                Rcw, tcw = pose
                Rwc = Rcw.T
                twc = -Rwc @ tcw
                q = np.asarray(lie.rot_to_quat(jnp.asarray(Rwc)))
                f.write(
                    "%f %.7f %.7f %.7f %.7f %.7f %.7f %.7f\n"
                    % (ts, twc[0], twc[1], twc[2], q[0], q[1], q[2], q[3])
                )

    def save_map(self, path: str):
        """Map snapshot (reference SaveMap writes OpenCV-YAML,
        MonoORBSlam.cc:194-247 — map point id/pos/descriptor + keyframe
        id/timestamp/pose/point-indices; we additionally persist the full
        keyframe keypoint payloads so the map is reloadable for
        relocalization, a capability the reference left as TODO)."""
        self.tracker.flush_pipeline()
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
            mp_ref_kf=np.array([mp.ref_kf_id for mp in mps], np.int64),
            kf_ids=np.array([kf.id for kf in kfs], np.int64),
            kf_frame_ids=np.array([kf.frame_id for kf in kfs], np.int64),
            kf_timestamps=np.array([kf.timestamp for kf in kfs], np.float64),
            kf_Rcw=np.stack([kf.Rcw for kf in kfs]) if kfs else np.zeros((0, 3, 3), np.float32),
            kf_tcw=np.stack([kf.tcw for kf in kfs]) if kfs else np.zeros((0, 3), np.float32),
            kf_mp_ids=np.stack([kf.mp_ids for kf in kfs]) if kfs else np.zeros((0, 0), np.int64),
            kf_kp_xy=np.stack([kf.kp_xy for kf in kfs]) if kfs else np.zeros((0, 0, 2), np.float32),
            kf_kp_und=np.stack([kf.kp_und for kf in kfs]) if kfs else np.zeros((0, 0, 2), np.float32),
            kf_kp_octave=np.stack([kf.kp_octave for kf in kfs]) if kfs else np.zeros((0, 0), np.int32),
            kf_kp_angle=np.stack([kf.kp_angle for kf in kfs]) if kfs else np.zeros((0, 0), np.float32),
            kf_kp_response=np.stack([kf.kp_response for kf in kfs]) if kfs else np.zeros((0, 0), np.float32),
            kf_desc=np.stack([kf.desc for kf in kfs]) if kfs else np.zeros((0, 0, 32), np.uint8),
            kf_kp_valid=np.stack([kf.kp_valid for kf in kfs]) if kfs else np.zeros((0, 0), bool),
            kf_parent=np.array([kf.parent if kf.parent is not None else -1 for kf in kfs], np.int64),
        )
        log.info("map saved to %s (%d points, %d keyframes)", path, len(mps), len(kfs))

    def save_map_yaml(self, path: str):
        """Reference-format map dump (MonoORBSlam.cc:194-247 SaveMap writes
        OpenCV-YAML): MapPoints as {id, pos (3x1 d), descriptor (1x32 u)} and
        KeyFrames as {id, timestamp, R (3x3, world-from-camera rotation =
        GetRotation().transpose()), t (camera center), map_point_indices}.
        The reference's literal key is "map_point indices"; OpenCV
        FileStorage rejects keys containing spaces, so the underscore form
        is used here. Matrices use the !!opencv-matrix encoding so OpenCV's
        cv::FileStorage reads this file back."""

        # note: spaces after the colons — OpenCV's own writer omits them,
        # which standard YAML parsers reject; cv::FileStorage reads both
        def mat(rows, cols, dt, values):
            data = ", ".join(("%d" % v) if dt == "u" else repr(float(v))
                             for v in values)
            return ("!!opencv-matrix { rows: %d, cols: %d, dt: %s, data: [ %s ] }"
                    % (rows, cols, dt, data))

        mps = sorted((mp for mp in self.map.all_map_points()),
                     key=lambda m: m.id)
        kfs = sorted(self.map.all_keyframes(), key=lambda k: k.id)
        with open(path, "w") as f:
            f.write("%YAML:1.0\n---\n")
            f.write("MapPoints:\n")
            for mp in mps:
                f.write('   - { id: "%d", pos: %s,\n       descriptor: %s }\n'
                        % (mp.id, mat(3, 1, "d", mp.pos),
                           mat(1, 32, "u", mp.descriptor)))
            f.write("KeyFrames:\n")
            for kf in kfs:
                Rwc = kf.Rcw.T
                center = -Rwc @ kf.tcw
                ids = sorted(int(m) for m in kf.mp_ids if m >= 0)
                f.write('   - { id: "%d", timestamp: %r, R: %s,\n'
                        '       t: %s,\n       map_point_indices: %s }\n'
                        % (kf.id, float(kf.timestamp),
                           mat(3, 3, "d", Rwc.reshape(-1)),
                           mat(3, 1, "d", center),
                           mat(1, max(len(ids), 1), "f",
                               ids if ids else [-1])))
        log.info("YAML map saved to %s (%d points, %d keyframes)",
                 path, len(mps), len(kfs))

    def load_map(self, path: str):
        """Full map re-load: restores map points AND keyframes (poses,
        keypoint payloads, observations), rebuilds the covisibility graph and
        the BoW relocalization database. The reference lists LoadMap as an
        unchecked TODO (MonoORBSlam.h:78-81, README.md:46); here
        save->load->relocalize works end to end (tests/test_relocalization.py).
        Returns {old_mp_id: new_mp_id}."""
        data = np.load(path)
        m = self.map
        with m.update_lock:
            m.clear()
            if self.keyframe_db is not None:
                self.keyframe_db.clear()
            id_map = {}
            for i, mid in enumerate(data["mp_ids"]):
                mp = m.new_map_point(data["mp_pos"][i], data["mp_desc"][i],
                                     ref_kf_id=int(data["mp_ref_kf"][i]))
                mp.min_dist = float(data["mp_min_dist"][i])
                mp.max_dist = float(data["mp_max_dist"][i])
                mp.normal = data["mp_normal"][i]
                id_map[int(mid)] = mp.id

            class _FrameShim:  # duck-typed Frame for the KeyFrame constructor
                pass

            kf_ids = data["kf_ids"]
            for i, kid in enumerate(kf_ids):
                f = _FrameShim()
                f.id = int(data["kf_frame_ids"][i])
                f.timestamp = float(data["kf_timestamps"][i])
                f.Rcw = data["kf_Rcw"][i]
                f.tcw = data["kf_tcw"][i]
                f.kp_xy = data["kf_kp_xy"][i]
                f.kp_und = data["kf_kp_und"][i]
                f.kp_octave = data["kf_kp_octave"][i]
                f.kp_angle = data["kf_kp_angle"][i]
                f.kp_response = data["kf_kp_response"][i]
                f.desc = data["kf_desc"][i]
                f.kp_valid = data["kf_kp_valid"][i]
                f.mp_ids = np.array(
                    [id_map.get(int(old), -1) for old in data["kf_mp_ids"][i]], np.int64)
                kf = m.new_keyframe(f)
                if kf.id != int(kid):  # preserve original ids
                    del m.keyframes[kf.id]
                    kf.id = int(kid)
                    m.keyframes[kf.id] = kf
                for q in np.nonzero(kf.mp_ids >= 0)[0]:
                    mp = m.map_points.get(int(kf.mp_ids[q]))
                    if mp is not None:
                        m.add_observation(mp, kf, int(q))
            m.next_kf_id = int(kf_ids.max()) + 1 if len(kf_ids) else 0
            if len(kf_ids):
                # GBA's spanning-tree propagation walks from the origins
                m.keyframe_origins.append(int(kf_ids.min()))
            for i, kid in enumerate(kf_ids):
                kf = m.keyframes[int(kid)]
                par = int(data["kf_parent"][i])
                if par >= 0 and par in m.keyframes:
                    kf.parent = par
                    m.keyframes[par].children.add(kf.id)
                m.update_connections(kf)
                if self.keyframe_db is not None:
                    self.keyframe_db.add(kf)
            # remap stale ref_kf ids and refresh per-point stats
            for mp in m.all_map_points():
                if mp.ref_kf_id not in m.keyframes and mp.observations:
                    mp.ref_kf_id = next(iter(mp.observations))
                m.update_normal_and_depth(mp, self.config.orb.scale_factors)
        log.info("map loaded from %s (%d points, %d keyframes)", path,
                 m.n_map_points(), m.n_keyframes())
        return id_map
