"""LocalMapping: map building around new keyframes (reference
src/LocalMapping.cc).

Runs as a pipeline stage (sequential by default, optionally on a host thread
via the System facade): process new keyframe -> cull recent map points ->
triangulate new points against covisible keyframes -> fuse duplicates ->
local bundle adjustment -> cull redundant keyframes. The geometry-heavy
steps (epipolar search, triangulation checks, local BA) run on device; graph
bookkeeping stays host-side.
"""

from __future__ import annotations

import logging
from typing import List, Optional

import jax
import numpy as np
import jax.numpy as jnp

from ceres_mono_orb_slam2_tpu.models.map import Map, KeyFrame
from ceres_mono_orb_slam2_tpu.ops import matcher, optim
from ceres_mono_orb_slam2_tpu.utils.padding import bucket, pad_rows

log = logging.getLogger(__name__)


from functools import partial


@partial(jax.jit, static_argnames=("n_levels", "th"))
def _fuse_into_device(Rcw, tcw, K, bounds, pos, normal, mind, maxd, desc_u8,
                      mvalid, kp_und, kp_octave, kf_desc_u8, kp_valid,
                      log_scale, scale_factors, inv_sigma2, n_levels, th):
    """Reverse-fuse device phase as ONE dispatch: frustum + scale prediction
    + projection search (reference ORBmatcher::Fuse, ORBmatcher.cc:724-842).
    Composing frustum_and_scale / unpack / search_fuse eagerly cost 3
    dispatches + 6 eager-op compiles per descriptor-block shape."""
    from ceres_mono_orb_slam2_tpu.ops import frustum as frustum_ops

    uv, level, viewcos, visible = frustum_ops.frustum_and_scale(
        Rcw, tcw, K, bounds, pos, normal, mind, maxd, mvalid,
        log_scale, n_levels)
    return matcher.search_fuse(
        kp_und, kp_octave, matcher.unpack_bits_pm1(kf_desc_u8), kp_valid,
        uv, level, matcher.unpack_bits_pm1(desc_u8), visible,
        scale_factors, th=th, inv_level_sigma2=inv_sigma2)


class LocalMapping:
    def __init__(self, config, map_: Map, loop_closer=None):
        self.config = config
        self.map = map_
        self.loop_closer = loop_closer
        self.K = config.camera.K.astype(np.float64)
        self.jK = jnp.asarray(config.camera.K)
        self.scale_factors = config.orb.scale_factors
        self.level_sigma2 = config.orb.level_sigma2
        self.inv_sigma2 = config.orb.inv_level_sigma2
        self.n_levels = config.orb.n_levels
        # device-cached constants for the packed mapper stages: passing
        # numpy here would re-upload per call (each its own tunnel RPC)
        self._j_invK = jnp.asarray(np.linalg.inv(self.K).astype(np.float32))
        self._j_ls2 = jnp.asarray(self.level_sigma2.astype(np.float32))
        self._j_sfs = jnp.asarray(self.scale_factors.astype(np.float32))
        self._j_ratio = jnp.float32(1.5 * float(config.orb.scale_factor))
        self._j_is2 = jnp.asarray(self.inv_sigma2.astype(np.float32))
        self._j_log_scale = jnp.float32(np.log(config.orb.scale_factor))
        self._j_bounds = None  # set lazily from map.image_bounds (frame 1)
        self.queue: List[int] = []
        self.recent_points: List[int] = []
        self.abort_ba = False
        self._accepting = True
        self.n_local_ba = 0
        self.n_ba_aborted = 0
        self.pass_ms: List[dict] = []  # per-pass stage wall times (profiling)

    # ------------------------------------------------------------- interface

    def insert_keyframe(self, kf_id: int):
        self.queue.append(kf_id)
        self.abort_ba = True

    def accepting(self) -> bool:
        return self._accepting

    def interrupt_ba(self):
        self.abort_ba = True

    def reset(self):
        self.queue.clear()
        self.recent_points.clear()

    def process_queue(self):
        # AcceptKeyFrames(false) while a mapping pass runs (reference
        # LocalMapping::Run, LocalMapping.cc:37-60): NeedNewKeyFrame's c1b
        # then refuses inserts until the pass finishes (it still fires
        # InterruptBA so a WANTED keyframe shortens the pass). Without this
        # gate the round-5 threaded runs keyframe-spammed while the mapper
        # was busy — one KF per frame with one-frame baselines, whose
        # triangulations all fail the baseline/median-depth gate; the local
        # map stopped maturing and tracking collapsed within ~25 frames
        # (serial runs, where the mapper drains between frames, were clean).
        self._accepting = False
        try:
            while self.queue:
                kf_id = self.queue.pop(0)
                kf = self.map.keyframes.get(kf_id)
                if kf is None or kf.bad:
                    continue
                self._process(kf)
        finally:
            self._accepting = True

    # ------------------------------------------------------------- pipeline

    def _process(self, kf: KeyFrame):
        # Per-STAGE map locking: the reference interleaves Tracking with
        # LocalMapping at per-object mutex granularity (KeyFrame.h:223-225,
        # Map.h:59); holding map.update_lock across the whole ~0.5 s mapping
        # pass blocked the tracker for exactly that long on every keyframe
        # frame (the measured keyframe-frame stall). Each stage sees a
        # consistent map; between stages the tracker may track frames and
        # even insert a keyframe — the `self.queue` checks below then skip
        # the tail stages exactly like the reference's CheckNewKeyFrames
        # mid-loop exits (LocalMapping.cc:84-88).
        # The heavy stages additionally RELEASE the lock around their device
        # solve (prep under lock -> dispatch+fetch unlocked -> apply under
        # lock with staleness guards), so a tracked frame never waits behind
        # a mapper device round-trip. Tracking never mutates keyframe poses,
        # map-point positions, or existing keyframes' bindings — the only
        # tracker-side mutations (per-point stats, NEW keyframes) are exactly
        # what the apply-phase guards already re-check.
        import os
        import time as _time

        _skip = set(os.environ.get("CERES_LM_SKIP", "").split(","))
        _tm = {"kf": kf.id}
        _t0 = _time.perf_counter()

        def _mark(name):
            nonlocal _t0
            t = _time.perf_counter()
            _tm[name] = round((t - _t0) * 1e3, 1)
            _t0 = t

        L = self.map.update_lock
        with L:
            epoch = self.map.map_epoch
            self._process_new_keyframe(kf)
            _mark("process_new")
            if "cullmp" not in _skip:
                self._map_point_culling(kf)
            _mark("cull_mp")
        if self._pass_stale(kf, epoch):
            return
        if "triangulate" not in _skip:
            self._create_new_map_points(kf)
        _mark("triangulate")
        if self._pass_stale(kf, epoch):
            return
        if not self.queue and "fuse" not in _skip:
            self._search_in_neighbors(kf, epoch)
        _mark("fuse")
        self.abort_ba = False
        if self._pass_stale(kf, epoch):
            return
        if not self.queue and self.map.n_keyframes() > 2:
            if "lba" not in _skip:
                self._local_bundle_adjustment(kf)
            _mark("lba")
            if self._pass_stale(kf, epoch):
                return
            with L:
                if not self._pass_stale_locked(kf, epoch) and "cullkf" not in _skip:
                    self._keyframe_culling(kf)
            _mark("cull_kf")
        self.pass_ms.append(_tm)
        if self.loop_closer is not None:
            self.loop_closer.insert_keyframe(kf.id)

    def _pass_stale_locked(self, kf: KeyFrame, epoch: int) -> bool:
        """True if a reset (map_epoch bump) or a cull invalidated this mapping
        pass between stages. Caller holds map.update_lock. The reference's
        analogue is per-stage CheckNewKeyFrames/ResetIfRequested exits
        (LocalMapping.cc:84-105, 760-775); with per-stage locking a Reset can
        land BETWEEN stages, after which `kf` references freed SoA rows."""
        return self.map.map_epoch != epoch or kf.bad \
            or kf.id not in self.map.keyframes

    def _pass_stale(self, kf: KeyFrame, epoch: int) -> bool:
        with self.map.update_lock:
            return self._pass_stale_locked(kf, epoch)

    def _process_new_keyframe(self, kf: KeyFrame):
        """Reference ProcessNewKeyFrame (LocalMapping.cc:129-165)."""
        m = self.map
        touched = []
        for i in np.nonzero(kf.mp_ids >= 0)[0]:
            mp = m.get_mp(int(kf.mp_ids[i]))
            if mp is None:
                kf.mp_ids[i] = -1
                continue
            if kf.id not in mp.observations:
                m.add_observation(mp, kf, int(i))
                touched.append(mp.id)
        m.refresh_points(touched, self.scale_factors)
        m.update_connections(kf)

    def _map_point_culling(self, kf: KeyFrame):
        """Reference MapPointCulling (LocalMapping.cc:167-194)."""
        m = self.map
        cur_kf_id = kf.id
        survivors = []
        for mid in self.recent_points:
            mp = m.map_points.get(mid)
            if mp is None or mp.bad:
                continue
            if mp.found_ratio() < 0.25:
                m.set_bad_map_point(mp)
            elif cur_kf_id - mp.first_kf_id >= 2 and mp.n_obs <= 2:
                m.set_bad_map_point(mp)
            elif cur_kf_id - mp.first_kf_id >= 3:
                pass  # graduated
            else:
                survivors.append(mid)
        self.recent_points = survivors

    def _median_depth(self, kf: KeyFrame) -> float:
        """Reference ComputeSceneMedianDepth (KeyFrame.cc:555-581). One SoA
        gather from the map's position table — this runs once per covisible
        neighbor in CreateNewMapPoints (profiled at ~35 ms/KF as dict walks)."""
        m = self.map
        ids = kf.mp_ids[kf.mp_ids >= 0]
        ids = ids[m.mp_alive[ids]]
        if len(ids) == 0:
            return -1.0
        z = m.mp_pos[ids] @ kf.Rcw[2] + kf.tcw[2]
        return float(np.median(z))

    # fixed neighbor-batch size: the reference caps the covisible window at
    # 20 (LocalMapping.cc:202); one constant shape = one compile per session
    TRI_BATCH = 20

    def _create_new_map_points(self, kf: KeyFrame):
        """Reference CreateNewMapPoints (LocalMapping.cc:196-396): epipolar
        search + triangulation against the top-20 covisible keyframes — all
        neighbors in ONE batched device call (ops/mapping_batch) instead of
        the reference's per-neighbor loop: on a remote TPU each dispatch+sync
        is a ~15-30 ms round trip and the loop cost ~1.4 s/keyframe."""
        from ceres_mono_orb_slam2_tpu.ops import mapping_batch

        m = self.map
        # ---- prep (under map lock): neighbor gates + input blocks ----------
        with m.update_lock:
            epoch = m.map_epoch
            O1 = kf.camera_center()
            # host gates per neighbor (reference :222-234): real baseline vs
            # median scene depth
            nb_kfs = []
            for nb_id in kf.best_covisible(20):
                kf2 = m.keyframes.get(nb_id)
                if kf2 is None or kf2.bad:
                    continue
                baseline = float(np.linalg.norm(kf2.camera_center() - O1))
                med_depth = self._median_depth(kf2)
                if med_depth <= 0 or baseline / med_depth < 0.01:
                    continue
                nb_kfs.append(kf2)
            if not nb_kfs:
                return
            nb_kfs = nb_kfs[: self.TRI_BATCH]
            B, N = self.TRI_BATCH, len(kf.mp_ids)
            # DEVICE-RESIDENT payloads: the keypoint blocks of the current
            # keyframe and every neighbor are already on device
            # (KeyFrame.dev, shared with the source frame's arrays). Only the
            # poses, gates and the mutable free-keypoint masks go up, in ONE
            # packed int32 buffer — the old path re-uploaded ~1.5 MB across
            # 17 RPCs per pass (the bulk of the 207 ms/pass profile).
            cur = kf.dev_payload()
            R2 = np.tile(np.eye(3, dtype=np.float32), (B, 1, 1))
            t2 = np.zeros((B, 3), np.float32)
            free2 = np.zeros((B, N), bool)
            nb_valid = np.zeros(B, bool)
            nb_dev = []
            for b in range(B):
                kf2 = nb_kfs[b] if b < len(nb_kfs) else kf
                R2[b], t2[b] = kf2.Rcw, kf2.tcw
                nb_dev.append(kf2.dev_payload())
                if b < len(nb_kfs):
                    free2[b] = (kf2.mp_ids < 0) & kf2.kp_valid
                    nb_valid[b] = True
            packed = mapping_batch.pack_tri_host(
                kf.Rcw, kf.tcw, (kf.mp_ids < 0) & kf.kp_valid,
                R2, t2, free2, nb_valid)
            args = (
                self.jK, self._j_invK, jnp.asarray(packed),
                cur[0], cur[1], cur[2], cur[3],
                tuple(d[0] for d in nb_dev), tuple(d[1] for d in nb_dev),
                tuple(d[2] for d in nb_dev), tuple(d[3] for d in nb_dev),
                self._j_ls2, self._j_sfs, self._j_ratio)

        # ---- device solve: LOCK RELEASED so tracking never waits behind it
        idx, good, X = jax.device_get(
            mapping_batch.triangulate_with_neighbors_packed(*args, B=B, N=N))

        # ---- apply (under map lock): host creation in neighbor order; first
        # neighbor to triangulate a keypoint slot wins (the reference's
        # sequential loop has the same first-wins semantics through the
        # mp_ids guards, which also re-check anything that changed while the
        # lock was released)
        with m.update_lock:
            if m.map_epoch != epoch:  # reset landed mid-solve
                return
            created = []
            for b, kf2 in enumerate(nb_kfs):
                if kf2.bad or kf.bad:
                    continue
                for k in np.nonzero(good[b])[0]:
                    ia, ib = int(k), int(idx[b, k])
                    if kf.mp_ids[ia] >= 0 or kf2.mp_ids[ib] >= 0:
                        continue
                    mp = m.new_map_point(X[b, k].astype(np.float32), kf.desc[ia], kf.id)
                    mp.first_kf_id = kf.id
                    m.add_observation(mp, kf, ia)
                    m.add_observation(mp, kf2, ib)
                    created.append(mp.id)
                    self.recent_points.append(mp.id)
            m.refresh_points(created, self.scale_factors)

    # fixed target-batch bucket for the forward fuse (20 first-order + up to
    # 12 second-order in practice); one constant shape = one compile
    FUSE_BATCH = 32

    def _search_in_neighbors(self, kf: KeyFrame, epoch: int | None = None):
        """Reference SearchInNeighbors (LocalMapping.cc:398-488): fuse the
        current keyframe's points into 1st+2nd-order neighbors and back.
        The forward direction runs as ONE batched device call over all
        targets (ops/mapping_batch.fuse_into_targets) — the reference's
        per-target loop cost ~2.1 s/keyframe in dispatch round trips on the
        remote TPU. All targets match against the same map snapshot (the
        reference's sequential loop lets earlier replacements influence later
        targets; with per-object locks its order is scheduler-dependent
        anyway, so snapshot semantics are within its nondeterminism)."""
        m = self.map
        if epoch is None:
            epoch = m.map_epoch
        with m.update_lock:
            if self._pass_stale_locked(kf, epoch):
                return
            targets = []
            seen = {kf.id}
            for nb in kf.best_covisible(20):
                if nb not in seen:
                    seen.add(nb)
                    nkf = m.keyframes.get(nb)
                    if nkf is None or nkf.bad:
                        continue
                    targets.append(nkf)
                    for nb2 in nkf.best_covisible(5):
                        if nb2 not in seen:
                            seen.add(nb2)
                            nkf2 = m.keyframes.get(nb2)
                            if nkf2 is not None and not nkf2.bad:
                                targets.append(nkf2)
            cur_mps = [m.resolve(int(mid)) for mid in kf.mp_ids if mid >= 0]
            cur_mps = sorted({mid for mid in cur_mps if mid >= 0})
        if targets and cur_mps:
            # chunk over the FUSE_BATCH-sized compile bucket so every
            # neighbor gets fused (the reference visits all ~20+5*20 of
            # them); padding fills the last chunk
            for c0 in range(0, len(targets), self.FUSE_BATCH):
                self._fuse_forward_batch(
                    targets[c0:c0 + self.FUSE_BATCH], cur_mps)
        # reverse fuse: all target map points into the current keyframe
        with m.update_lock:
            if self._pass_stale_locked(kf, epoch):
                return
            fuse_ids = []
            fs = set()
            for tkf in targets:
                for mid in tkf.mp_ids:
                    if mid >= 0 and mid not in fs:
                        fuse_ids.append(int(mid))
                        fs.add(mid)
        self._fuse_into(kf, fuse_ids)

        with m.update_lock:
            if self._pass_stale_locked(kf, epoch):
                return
            m.refresh_points([int(mid) for mid in kf.mp_ids[kf.mp_ids >= 0]],
                             self.scale_factors)
            m.update_connections(kf)

    def _fuse_forward_batch(self, targets: List[KeyFrame], mp_ids: List[int],
                            th: float = 3.0):
        """Forward half of SearchInNeighbors: one shared map-point block
        projected into every target keyframe in one vmapped call; the
        replace-vs-add merge stays host-side per target (reference
        ORBmatcher::Fuse tail, ORBmatcher.cc:806-840)."""
        from ceres_mono_orb_slam2_tpu.ops import mapping_batch

        m = self.map
        with m.update_lock:
            epoch = m.map_epoch
            B, N = self.FUSE_BATCH, len(targets[0].kp_und)
            M = len(mp_ids)
            # cur_mps <= the keypoint budget, so padding to the feature
            # bucket gives ONE forward-fuse shape per session (prewarmable)
            Mb = max(bucket(M), bucket(N, 256))
            garr = np.asarray(mp_ids, np.int64)  # one table gather per field
            pos = pad_rows(m.mp_pos[garr], Mb)
            desc = pad_rows(m.mp_desc[garr], Mb)
            mind = pad_rows(m.mp_mind[garr], Mb)
            maxd = pad_rows(m.mp_maxd[garr], Mb)
            normal = pad_rows(m.mp_normal[garr], Mb)

            R = np.tile(np.eye(3, dtype=np.float32), (B, 1, 1))
            t = np.zeros((B, 3), np.float32)
            mvalid = np.zeros((B, Mb), bool)
            mp_arr = np.asarray(mp_ids, np.int64)
            # target keypoint payloads stay DEVICE-RESIDENT (KeyFrame.dev);
            # only poses + the mutable gates + the map-point block upload,
            # in ONE packed buffer (was ~13 RPCs / ~1.3 MB per chunk)
            tgt_dev = []
            for b in range(B):
                tkf = targets[b] if b < len(targets) else targets[0]
                tgt_dev.append(tkf.dev_payload())
                if b >= len(targets):
                    continue
                R[b], t[b] = tkf.Rcw, tkf.tcw
                # a point the target already observes is excluded from its fuse
                # (reference ORBmatcher.cc:738 IsInKeyFrame check); kf.mp_ids is
                # the exact inverse of mp.observations (Map.add_observation), so
                # one vectorized isin replaces an M-long membership loop
                mvalid[b, :M] = ~np.isin(mp_arr, tkf.mp_ids[tkf.mp_ids >= 0])
            packed = mapping_batch.pack_fuse_host(
                R, t, mvalid, pos, normal, mind, maxd, desc)

        # device solve with the map lock released (tracking proceeds)
        if self._j_bounds is None and m.image_bounds is not None:
            self._j_bounds = jnp.asarray(m.image_bounds)
        idx, valid = jax.device_get(mapping_batch.fuse_into_targets_packed(
            self.jK, jnp.asarray(packed),
            tuple(d[0] for d in tgt_dev), tuple(d[1] for d in tgt_dev),
            tuple(d[3] for d in tgt_dev), tuple(d[4] for d in tgt_dev),
            self._j_log_scale, self._j_sfs, self._j_is2,
            (self._j_bounds if self._j_bounds is not None
             else jnp.asarray(np.array([-1e6, 1e6, -1e6, 1e6], np.float32))),
            B=B, M=Mb, n_levels=self.n_levels, th=th,
        ))
        # replacements defer the target's distinctive-descriptor recompute
        # (reference MapPoint::Replace runs it inline, ~0.2 ms each — ~6k
        # calls/run profiled); one batched refresh covers all touched targets.
        # The merge loop re-resolves / re-checks every id, so results computed
        # against the pre-release snapshot stay safe to apply.
        with m.update_lock:
            if m.map_epoch != epoch:  # reset landed mid-solve
                return
            touched = []
            for b, tkf in enumerate(targets):
                if tkf.bad:
                    continue
                for q in np.nonzero(valid[b, :M])[0]:
                    mid = m.resolve(mp_ids[q])
                    mp = m.map_points.get(mid) if mid >= 0 else None
                    if mp is None or mp.bad or tkf.id in mp.observations:
                        continue
                    kp = int(idx[b, q])
                    existing_id = m.resolve(int(tkf.mp_ids[kp]))
                    if existing_id >= 0:
                        existing = m.map_points[existing_id]
                        if existing.id == mp.id:
                            continue
                        if existing.n_obs > mp.n_obs:
                            m.replace_map_point(mp, existing, refresh=False)
                            touched.append(existing.id)
                        else:
                            m.replace_map_point(existing, mp, refresh=False)
                            touched.append(mp.id)
                    else:
                        m.add_observation(mp, tkf, kp)
            if touched:
                m.refresh_points(touched, self.scale_factors)

    def _fuse_into(self, kf: KeyFrame, mp_ids: List[int], th: float = 3.0):
        """Reference ORBmatcher::Fuse (ORBmatcher.cc:724-842) host merge."""
        m = self.map
        with m.update_lock:
            epoch = m.map_epoch
            mp_ids = [m.resolve(mid) for mid in mp_ids]
            mp_ids = [mid for mid in mp_ids if mid >= 0 and kf.id not in m.map_points[mid].observations]
            if not mp_ids:
                return
            M = len(mp_ids)
            Mb = bucket(M)  # shape bucket: avoid per-call recompiles
            garr = np.asarray(mp_ids, np.int64)  # one table gather per field
            pos = pad_rows(m.mp_pos[garr], Mb)
            desc = pad_rows(m.mp_desc[garr], Mb)
            mind = pad_rows(m.mp_mind[garr], Mb)
            maxd = pad_rows(m.mp_maxd[garr], Mb)
            normal = pad_rows(m.mp_normal[garr], Mb)
            mvalid = np.zeros(Mb, bool)
            mvalid[:M] = True
            kf_args = (jnp.asarray(kf.Rcw), jnp.asarray(kf.tcw),
                       jnp.asarray(kf.kp_und), jnp.asarray(kf.kp_octave),
                       jnp.asarray(kf.desc), jnp.asarray(kf.kp_valid))

        # device solve with the map lock released (tracking proceeds)
        # bounds are effectively unconstrained here: search_fuse's spatial
        # window implies the projection lands near a real keypoint anyway
        idx, dist, valid = _fuse_into_device(
            kf_args[0], kf_args[1], self.jK,
            jnp.asarray(np.array([-1e6, 1e6, -1e6, 1e6], np.float32)),
            jnp.asarray(pos), jnp.asarray(normal), jnp.asarray(mind),
            jnp.asarray(maxd), jnp.asarray(desc), jnp.asarray(mvalid),
            kf_args[2], kf_args[3], kf_args[4], kf_args[5],
            jnp.float32(np.log(self.config.orb.scale_factor)),
            jnp.asarray(self.scale_factors),
            jnp.asarray(self.inv_sigma2.astype(np.float32)),
            n_levels=self.n_levels, th=th,
        )
        ii, vi = jax.device_get((idx, valid))
        with m.update_lock:
            if m.map_epoch != epoch or kf.bad:  # reset/cull landed mid-solve
                return
            touched = []
            for q in np.nonzero(vi)[0]:
                mp = m.get_mp(m.resolve(mp_ids[q]))
                if mp is None or kf.id in mp.observations:
                    continue
                kp = int(ii[q])
                existing_id = m.resolve(int(kf.mp_ids[kp]))
                if existing_id >= 0:
                    existing = m.map_points[existing_id]
                    if existing.id == mp.id:
                        continue
                    # replace the one with fewer observations; descriptor refresh
                    # batched below instead of per replace
                    if existing.n_obs > mp.n_obs:
                        m.replace_map_point(mp, existing, refresh=False)
                        touched.append(existing.id)
                    else:
                        m.replace_map_point(existing, mp, refresh=False)
                        touched.append(mp.id)
                else:
                    m.add_observation(mp, kf, kp)
            if touched:
                m.refresh_points(touched, self.scale_factors)

    # -------------------------------------------------------------- local BA

    def _local_bundle_adjustment(self, kf: KeyFrame):
        """Reference LocalBundleAdjustment (CeresOptimizer.cc:344-599): the
        current KF + its covisibles are free, keyframes seeing local points
        but not covisible are fixed; two-pass robust -> trimmed solve; outlier
        observations erased from the map afterwards."""
        m = self.map
        with m.update_lock:
            epoch = m.map_epoch
            prep = self._lba_build(kf)
        if prep is None:
            return
        (kf_ids, kf_slot, mp_ids, oj_all, op_all, n_obs, fixed,
         R, t, pts, pvalid, op, oj, ouv, ow, ovalid, P, MM) = prep

        # chunked solve with cooperative cancellation: the reference aborts
        # Ceres between iterations via InterruptBA (LocalMapping.cc:118-122,
        # CeresOptimizer.h:332-349). A jitted lax.scan can't observe host
        # state mid-run, so the TPU-native equivalent is chunking — run the
        # Huber pass + half the trimmed pass, check the abort flag on the
        # host, and only then run the remaining trimmed iterations.
        # The map lock is NOT held during the device solve: tracking proceeds
        # while the two-pass LM runs (the reference's LocalMapping thread
        # holds no map mutex during the Ceres solve either,
        # CeresOptimizer.cc:416-571); the apply below re-takes it and
        # re-validates everything it writes.
        jop, joj = jnp.asarray(op), jnp.asarray(oj)
        jouv, jow = jnp.asarray(ouv), jnp.asarray(ow)
        jovalid, jfixed, jpvalid = jnp.asarray(ovalid), jnp.asarray(fixed), jnp.asarray(pvalid)
        # past ~2M pose-point block pairs the dense Schur cross tensor
        # (M, P, 6, 3) stops fitting; switch to the matrix-free CG solver
        # (same guard as run_global_ba) so an uncapped local window in a
        # densely-covisible revisited area cannot OOM the device
        use_cg = P * MM > (1 << 21)
        if use_cg:
            res = optim.bundle_adjustment_cg(
                self.jK, jnp.asarray(R), jnp.asarray(t), jnp.asarray(pts),
                jop, joj, jouv, jow, jovalid, jfixed, jpvalid,
                iters=8, cg_iters=50, robust=True,
            )
            if not self.abort_ba:
                res = optim.bundle_adjustment_cg(
                    self.jK, res.R, res.t, res.points,
                    jop, joj, jouv, jow, jovalid, jfixed, jpvalid,
                    iters=7, cg_iters=50, robust=True,
                )
            else:
                self.n_ba_aborted += 1
        else:
            res = optim.bundle_adjustment(
                self.jK, jnp.asarray(R), jnp.asarray(t), jnp.asarray(pts),
                jop, joj, jouv, jow, jovalid, jfixed, jpvalid,
                iters_huber=5, iters_trimmed=5,
            )
            if not self.abort_ba:
                res = optim.bundle_adjustment(
                    self.jK, res.R, res.t, res.points,
                    jop, joj, jouv, jow, jovalid, jfixed, jpvalid,
                    iters_huber=0, iters_trimmed=5,
                )
            else:
                self.n_ba_aborted += 1
        self.n_local_ba += 1
        # ONE batched transfer: each separate np.asarray is a full tunnel
        # round trip (~29 ms measured RTT on the remote-TPU link)
        Rn, tn, ptsn, inl = jax.device_get((res.R, res.t, res.points, res.inlier_obs))
        with m.update_lock:
            if m.map_epoch != epoch:  # reset landed mid-solve
                return
            for k, i in kf_slot.items():
                okf = m.keyframes.get(k)
                if okf is not None and not okf.bad and not fixed[i]:
                    okf.Rcw = Rn[i]
                    okf.tcw = tn[i]
            live_ids = []
            for i, mid in enumerate(mp_ids):
                mp = m.map_points.get(mid)
                if mp is not None and not mp.bad:
                    mp.pos = ptsn[i]
                    live_ids.append(mid)
            # batched normal/depth refresh (positions moved; descriptors didn't)
            m.refresh_points(live_ids, self.scale_factors, descriptors=False)
            # erase outlier observations (reference CeresOptimizer.cc:573-581)
            for q in np.nonzero(~inl[:n_obs])[0]:
                mid = mp_ids[oj_all[q]]
                mp = m.map_points.get(mid)
                if mp is not None and not mp.bad:
                    m.erase_observation(mp, kf_ids[op_all[q]])

    def _lba_build(self, kf: KeyFrame):
        """Local-BA problem construction (call under map.update_lock):
        window selection + padded observation arrays. Returns None when the
        window is degenerate."""
        m = self.map
        # free window: current KF + covisibles, capped at
        # StaticShapes.max_local_keyframes (the reference takes ALL covisibles,
        # CeresOptimizer.cc:351-360, but caps the tracking local map at 80,
        # Tracking.cc:922-925; the cap here bounds the BA pose-bucket family
        # so prewarm can cover it — the dropped KFs are the weakest-covisible)
        n_free = max(1, self.config.shapes.max_local_keyframes - 1)
        local_ids = [kf.id] + kf.best_covisible(
            min(len(kf.ordered_neighbors), n_free))
        local_ids = [k for k in local_ids if k in m.keyframes and not m.keyframes[k].bad]
        local_set = set(local_ids)

        # point set = union of the local keyframes' bound ids; kf.mp_ids is
        # the exact inverse of mp.observations (Map.add_observation invariant),
        # so the whole window + observation arrays build with vectorized
        # searchsorted lookups instead of per-observation Python loops
        cat = np.concatenate([m.keyframes[k].mp_ids for k in local_ids])
        uniq = np.unique(cat[cat >= 0])
        mp_ids = [int(mid) for mid in uniq if m.get_mp(int(mid)) is not None]
        if not mp_ids:
            return None
        mp_arr = np.asarray(mp_ids, np.int64)  # ascending (np.unique order)

        fixed_ids = []
        fixed_set = set()
        for mid in mp_ids:
            for ok_id in m.map_points[mid].observations:
                if ok_id not in local_set and ok_id not in fixed_set:
                    okf = m.keyframes.get(ok_id)
                    if okf is not None and not okf.bad:
                        fixed_ids.append(ok_id)
                        fixed_set.add(ok_id)

        # cap the FIXED set at the session pose envelope (the free window is
        # already capped above): keep the fixed keyframes with the most
        # window-point observations — dropping a weakly-connected fixed
        # observer only removes its few constraint rows (the reference keeps
        # all observers, CeresOptimizer.cc:380-394; the cap is what bounds
        # the BA pose-shape family to ONE prewarmed program)
        max_fixed = 4 * self.config.shapes.max_local_keyframes - len(local_ids)
        if len(fixed_ids) > max_fixed > 0:
            counts = [
                int(np.isin(m.keyframes[k].mp_ids, mp_arr,
                            assume_unique=False).sum()) for k in fixed_ids]
            order = np.argsort(counts)[::-1][:max_fixed]
            fixed_ids = [fixed_ids[i] for i in sorted(order)]

        kf_ids = local_ids + fixed_ids
        kf_slot = {k: i for i, k in enumerate(kf_ids)}

        op_l, oj_l, uv_l, ow_l, kidx_l = [], [], [], [], []
        for i_k, k in enumerate(kf_ids):
            okf = m.keyframes[k]
            kidx = np.nonzero(okf.mp_ids >= 0)[0]
            ids = okf.mp_ids[kidx]
            pos = np.minimum(np.searchsorted(mp_arr, ids), len(mp_arr) - 1)
            hit = mp_arr[pos] == ids  # fixed KFs keep only window points
            kidx = kidx[hit]
            op_l.append(np.full(len(kidx), i_k, np.int32))
            oj_l.append(pos[hit].astype(np.int32))
            uv_l.append(okf.kp_und[kidx])
            ow_l.append(self.inv_sigma2[okf.kp_octave[kidx]].astype(np.float32))
            kidx_l.append(kidx)
        op_all = np.concatenate(op_l)
        oj_all = np.concatenate(oj_l)
        n_obs = len(op_all)
        if n_obs < 10:
            return None

        # ONE dense-solve shape per session: pad every window to the
        # config-derived maximum (free cap + typical fixed count, BA budgets)
        # so steady state runs exactly TWO bundle_adjustment programs (the
        # 5+5 and 0+5 iteration plans) — prewarm compiles both before frame 0
        # and the live loop never compiles again. Padded poses are fixed,
        # padded points/obs masked; the dense-Schur cost is linear-ish in the
        # padding and the solve runs on the mapping worker, off the tracking
        # critical path. Windows that overflow the session shape (or configs
        # whose maximum would cross the CG guard) fall back to per-call pow2
        # buckets — a rare one-time compile, amortized by the persistent
        # compilation cache.
        sh = self.config.shapes
        P0 = bucket(4 * sh.max_local_keyframes, 8)
        MM0 = bucket(sh.max_ba_points, 256)
        OO0 = bucket(sh.max_ba_obs, 1024)
        P = max(bucket(len(kf_ids), 8), P0)
        MM = max(bucket(len(mp_ids), 256), MM0)
        OO = max(bucket(n_obs, 1024), OO0)
        if P > P0 or MM > MM0 or OO > OO0:
            # window overflowed the session envelope: a one-time pow2-bucket
            # compile (amortized by the persistent cache). Loud, because it
            # is the only event that can break --assert-zero-recompiles.
            log.warning(
                "local BA window overflows the prewarmed session shape "
                "(P %d>%d, M %d>%d, O %d>%d): one-time bucket compile",
                P, P0, MM, MM0, OO, OO0)
        R = np.tile(np.eye(3, dtype=np.float32), (P, 1, 1))
        t = np.zeros((P, 3), np.float32)
        fixed = np.ones(P, bool)
        for k, i in kf_slot.items():
            R[i] = m.keyframes[k].Rcw
            t[i] = m.keyframes[k].tcw
            fixed[i] = k in fixed_set or k == 0
        pts = np.zeros((MM, 3), np.float32)
        pvalid = np.zeros(MM, bool)
        pts[: len(mp_ids)] = m.mp_pos[np.asarray(mp_ids, np.int64)]
        pvalid[: len(mp_ids)] = True
        op = np.zeros(OO, np.int32)
        oj = np.zeros(OO, np.int32)
        ouv = np.zeros((OO, 2), np.float32)
        ow = np.ones(OO, np.float32)
        ovalid = np.zeros(OO, bool)
        op[:n_obs] = op_all
        oj[:n_obs] = oj_all
        ouv[:n_obs] = np.concatenate(uv_l)
        ow[:n_obs] = np.concatenate(ow_l)
        ovalid[:n_obs] = True
        return (kf_ids, kf_slot, mp_ids, oj_all, op_all, n_obs, fixed,
                R, t, pts, pvalid, op, oj, ouv, ow, ovalid, P, MM)

    # -------------------------------------------------------------- KF culling

    def _keyframe_culling(self, kf: KeyFrame):
        """Reference KeyFrameCulling (LocalMapping.cc:576-637): a local KF is
        redundant if >=90% of its map points are seen by >=3 other keyframes
        at the same or finer scale. The triple-nested observation walk
        (profiled ~24 ms/KF of host Python) runs as ragged numpy passes over
        the map's global observation table; the table rebuilds lazily after
        an erase (erases mutate subsequent candidates' counts)."""
        m = self.map
        mid_s = kfid_s = oct_s = None
        for k_id in kf.best_covisible(len(kf.ordered_neighbors)):
            okf = m.keyframes.get(k_id)
            if okf is None or okf.bad or okf.id == 0:
                continue
            if mid_s is None:
                mid_s, kfid_s, oct_s = m._obs_arrays()
            n_mps, n_redundant = self._redundancy(okf, (mid_s, kfid_s, oct_s))
            if n_mps > 0 and n_redundant > 0.9 * n_mps:
                m.erase_keyframe(okf)
                mid_s = None

    def _redundancy(self, okf: KeyFrame, table) -> tuple:
        """(bound live points, points seen by >=3 other KFs at octave <=
        level+1) for one cull candidate, over the global observation table."""
        m = self.map
        mid_s, kfid_s, oct_s = table
        rows = np.nonzero(okf.mp_ids >= 0)[0]
        ids = okf.mp_ids[rows]
        alive = m.mp_alive[ids]
        rows, ids = rows[alive], ids[alive]
        n_mps = len(ids)
        eligible = np.nonzero(m.mp_nobs[ids] > 3)[0]
        if n_mps == 0 or len(eligible) == 0:
            return n_mps, 0
        eids = ids[eligible]
        levels = okf.kp_octave[rows[eligible]].astype(np.int32)
        lo = np.searchsorted(mid_s, eids, "left")
        cnt = np.searchsorted(mid_s, eids, "right") - lo
        total = int(cnt.sum())
        # ragged range expansion: table rows of each point's observations
        tix = np.repeat(lo, cnt) + (np.arange(total)
                                    - np.repeat(np.cumsum(cnt) - cnt, cnt))
        prow = np.repeat(np.arange(len(eids)), cnt)
        good = (kfid_s[tix] != okf.id) & (oct_s[tix]
                                          <= np.repeat(levels, cnt) + 1)
        n_better = np.bincount(prow[good], minlength=len(eids))
        return n_mps, int((n_better >= 3).sum())
