"""LoopClosing: place recognition, Sim3 verification, loop correction.

Equivalent of the reference LoopClosing (src/LoopClosing.cc):
- DetectLoop (:106-228): BoW candidates gated by the minimum covisible score,
  then consistency groups over >=3 consecutive detections,
- ComputeSim3 (:230-399): descriptor matching -> Horn sim3 RANSAC ->
  optimize_sim3 -> guided projection search, accept at >=40 total matches,
- CorrectLoop (:401-597): propagate the corrective Sim3 to the current
  keyframe's covisible group and their map points, fuse loop duplicates,
  sim3 essential-graph optimization (device PCG), then full-map BA.

The reference runs this on its own thread and spawns a further GBA thread;
here it is a pipeline stage driven by the System facade (sequential by
default), with the same observable state transitions.
"""

from __future__ import annotations

import logging
from typing import Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ceres_mono_orb_slam2_tpu.models.map import Map, KeyFrame
from ceres_mono_orb_slam2_tpu.models.optimization import global_bundle_adjustment
from ceres_mono_orb_slam2_tpu.ops import bow, lie, matcher, sim3opt, sim3solver

log = logging.getLogger(__name__)

COVIS_CONSISTENCY_TH = 3  # reference mnCovisibilityConsistencyTh
MIN_EDGE_WEIGHT = 100  # essential-graph covisibility edge gate (CeresOptimizer.cc:753)


class LoopClosing:
    def __init__(self, config, map_: Map, keyframe_db, local_mapper=None, fix_scale: bool = False):
        self.config = config
        self.map = map_
        self.db = keyframe_db
        self.local_mapper = local_mapper
        self.fix_scale = fix_scale  # mono: scale is free (reference bFixScale=false)
        self.queue: List[int] = []
        self.last_loop_kf_id = 0
        self.consistent_groups: List[tuple] = []  # (set_of_kf_ids, consistency)
        self.n_loops_closed = 0
        self._key = jax.random.PRNGKey(42)
        self.jK = jnp.asarray(config.camera.K)
        self.inv_sigma2 = config.orb.inv_level_sigma2

    def _next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    # -------------------------------------------------------------- interface

    def insert_keyframe(self, kf_id: int):
        self.queue.append(kf_id)

    def process_queue(self):
        while self.queue:
            kf_id = self.queue.pop(0)
            kf = self.map.keyframes.get(kf_id)
            if kf is None or kf.bad:
                continue
            candidates = self._detect_loop(kf)
            if not candidates:
                continue
            ok, match_kf_id, Scw, loop_points = self._compute_sim3(kf, candidates)
            if ok:
                log.info("Loop detected! kf %d <-> kf %d", kf.id, match_kf_id)
                self._correct_loop(kf, match_kf_id, Scw, loop_points)

    def reset(self):
        self.queue.clear()
        self.consistent_groups.clear()
        self.last_loop_kf_id = 0

    # ----------------------------------------------------------- detect loop

    def _detect_loop(self, kf: KeyFrame) -> List[int]:
        """Reference DetectLoop (LoopClosing.cc:106-228)."""
        m = self.map
        if kf.id < self.last_loop_kf_id + 10 or m.n_keyframes() < 10:
            self.db.add(kf)
            return []
        # min score among covisible keyframes (:124-139)
        v = self.db.kf_bow(kf)
        min_score = 1.0
        for nb in kf.covisible:
            okf = m.keyframes.get(nb)
            if okf is not None and not okf.bad:
                min_score = min(min_score, bow.l1_score(v, self.db.kf_bow(okf)))
        candidates = self.db.detect_loop_candidates(kf, min_score)
        if not candidates:
            self.db.add(kf)
            self.consistent_groups.clear()
            return []
        # consistency groups (:154-214)
        enough = []
        new_groups = []
        consumed = [False] * len(self.consistent_groups)
        for cand in candidates:
            ckf = m.keyframes.get(cand)
            if ckf is None or ckf.bad:
                continue
            group = set(ckf.covisible) | {cand}
            consistency = 0
            consistent_with_some = False
            for gi, (prev_group, prev_cons) in enumerate(self.consistent_groups):
                if group & prev_group:
                    consistency = max(consistency, prev_cons + 1)
                    consistent_with_some = True
                    consumed[gi] = True
            new_groups.append((group, consistency))
            if consistency >= COVIS_CONSISTENCY_TH:
                enough.append(cand)
            if not consistent_with_some:
                pass  # starts a fresh group with consistency 0
        self.consistent_groups = new_groups
        self.db.add(kf)
        return enough

    # ----------------------------------------------------------- compute sim3

    def _matched_map_points(self, kf1: KeyFrame, kf2: KeyFrame):
        """Descriptor association between two keyframes' map points
        (reference SearchByBoW KF-KF, used by ComputeSim3)."""
        m = self.map
        has1 = (kf1.mp_ids >= 0) & kf1.kp_valid
        has2 = (kf2.mp_ids >= 0) & kf2.kp_valid
        idx, dist, valid = matcher.search_by_descriptor(
            jnp.asarray(kf1.kp_angle), matcher.unpack_bits_pm1(jnp.asarray(kf1.desc)), jnp.asarray(has1),
            jnp.asarray(kf2.kp_angle), matcher.unpack_bits_pm1(jnp.asarray(kf2.desc)), jnp.asarray(has2),
            ratio=0.75,
        )
        vi = np.asarray(valid)
        ii = np.asarray(idx)
        pairs = []
        for i in np.nonzero(vi)[0]:
            mp1 = m.get_mp(int(kf1.mp_ids[i]))
            mp2 = m.get_mp(int(kf2.mp_ids[ii[i]]))
            if mp1 is not None and mp2 is not None:
                pairs.append((i, int(ii[i]), mp1, mp2))
        return pairs

    def _compute_sim3(self, kf: KeyFrame, candidates: List[int]):
        """Reference ComputeSim3 (LoopClosing.cc:230-399)."""
        m = self.map
        for cand in candidates:
            ckf = m.keyframes.get(cand)
            if ckf is None or ckf.bad:
                continue
            pairs = self._matched_map_points(kf, ckf)
            if len(pairs) < 20:
                continue
            N = len(pairs)
            X1 = np.stack([kf.Rcw @ p[2].pos + kf.tcw for p in pairs]).astype(np.float32)
            X2 = np.stack([ckf.Rcw @ p[3].pos + ckf.tcw for p in pairs]).astype(np.float32)
            uv1 = kf.kp_und[[p[0] for p in pairs]].astype(np.float32)
            uv2 = ckf.kp_und[[p[1] for p in pairs]].astype(np.float32)
            w1 = self.inv_sigma2[kf.kp_octave[[p[0] for p in pairs]]].astype(np.float32)
            w2 = self.inv_sigma2[ckf.kp_octave[[p[1] for p in pairs]]].astype(np.float32)
            res = sim3solver.ransac_sim3(
                self._next_key(), self.jK, self.jK,
                jnp.asarray(X1), jnp.asarray(X2), jnp.asarray(uv1), jnp.asarray(uv2),
                jnp.asarray(w1), jnp.asarray(w2), jnp.ones(N, bool),
                fix_scale=self.fix_scale,
            )
            if not bool(res.success):
                continue
            opt = sim3opt.optimize_sim3(
                self.jK, self.jK, jnp.asarray(X1), jnp.asarray(X2),
                jnp.asarray(uv1), jnp.asarray(uv2), jnp.asarray(w1), jnp.asarray(w2),
                res.inliers, res.R, res.t, res.s,
            )
            if int(opt.n_inliers) < 20:
                continue
            # S_cw: current camera from world via the loop keyframe:
            # S12 maps cand-camera -> current-camera; Scw = S12 * T2w
            R12, t12, s12 = np.asarray(opt.R), np.asarray(opt.t), float(opt.s)
            Rcw_s = R12 @ ckf.Rcw
            tcw_s = s12 * (R12 @ ckf.tcw) + t12
            # guided projection search over the loop keyframe's neighborhood
            # map points (reference SearchByProjection(Scw), :374-385)
            loop_points = {}
            seen = set()
            for nb in [cand] + ckf.best_covisible(10):
                nkf = m.keyframes.get(nb)
                if nkf is None or nkf.bad:
                    continue
                for mid in nkf.mp_ids:
                    rid = m.resolve(int(mid)) if mid >= 0 else -1
                    if rid >= 0 and rid not in seen:
                        seen.add(rid)
            loop_mp_ids = list(seen)
            if not loop_mp_ids:
                continue
            pos = np.stack([m.map_points[i].pos for i in loop_mp_ids]).astype(np.float32)
            desc = np.stack([m.map_points[i].descriptor for i in loop_mp_ids])
            Xs = (s12 * (pos @ (Rcw_s).T)) + tcw_s  # sim3 applied: s R x + t
            zok = Xs[:, 2] > 1e-6
            fx, fy = self.config.camera.fx, self.config.camera.fy
            cx, cy = self.config.camera.cx, self.config.camera.cy
            uvp = np.stack([fx * Xs[:, 0] / np.maximum(Xs[:, 2], 1e-6) + cx,
                            fy * Xs[:, 1] / np.maximum(Xs[:, 2], 1e-6) + cy], -1).astype(np.float32)
            idx, dist, valid = matcher.search_by_projection_frame(
                jnp.asarray(kf.kp_und), jnp.asarray(kf.kp_octave), jnp.asarray(kf.kp_angle),
                matcher.unpack_bits_pm1(jnp.asarray(kf.desc)), jnp.asarray(kf.kp_valid),
                jnp.asarray(uvp), jnp.zeros(len(pos), jnp.int32), jnp.zeros(len(pos), jnp.float32),
                matcher.unpack_bits_pm1(jnp.asarray(desc)), jnp.asarray(zok),
                jnp.asarray(self.config.orb.scale_factors), th=10.0,
                check_rotation=False, dist_th=matcher.TH_LOW,
            )
            vi = np.asarray(valid)
            ii = np.asarray(idx)
            total = {}
            for q in np.nonzero(vi)[0]:
                total[int(ii[q])] = loop_mp_ids[q]
            # include the verified sim3 inlier pairs
            inl = np.asarray(opt.inliers)
            for j, (i1, i2, mp1, mp2) in enumerate(pairs):
                if inl[j]:
                    total[i1] = mp2.id
            if len(total) >= 40:
                return True, cand, (Rcw_s.astype(np.float32), tcw_s.astype(np.float32), s12), total
        return False, -1, None, None

    # ----------------------------------------------------------- correct loop

    def _correct_loop(self, kf: KeyFrame, match_kf_id: int, Scw, loop_points: Dict[int, int]):
        """Reference CorrectLoop (LoopClosing.cc:401-597)."""
        m = self.map
        if self.local_mapper is not None:
            self.local_mapper.process_queue()  # drain, like RequestStop+spin
        Rcor, tcor, scor = Scw

        with m.update_lock:
            # corrected sim3 for current KF + covisibles via relative SE3
            connected = [kf.id] + list(kf.covisible)
            corrected: Dict[int, tuple] = {}
            noncorrected: Dict[int, tuple] = {}
            for kfi_id in connected:
                kfi = m.keyframes.get(kfi_id)
                if kfi is None or kfi.bad:
                    continue
                noncorrected[kfi_id] = (kfi.Rcw.copy(), kfi.tcw.copy(), 1.0)
                if kfi_id == kf.id:
                    corrected[kfi_id] = (Rcor, tcor, scor)
                else:
                    # T_i_cur = T_iw * T_wc ; S_i = S_ic * S_cur with S_ic of
                    # scale 1 (reference LoopClosing.cc:454-459). Sim3
                    # composition (R1,t1,s1)*(R2,t2,s2) = (R1R2, s1 R1 t2 + t1,
                    # s1 s2); the LEFT element has scale 1, so the composed
                    # translation is Ric@tcor + tic and only the composed
                    # scale carries scor.
                    Ric = kfi.Rcw @ kf.Rcw.T
                    tic = kfi.tcw - Ric @ kf.tcw
                    Rn = Ric @ Rcor
                    tn = Ric @ tcor + tic
                    corrected[kfi_id] = (Rn.astype(np.float32), tn.astype(np.float32), scor)

            # correct map points observed by the connected group (:446-523)
            done_points = set()
            for kfi_id, (Rn, tn, sn) in corrected.items():
                kfi = m.keyframes[kfi_id]
                Ro, to, _ = noncorrected[kfi_id]
                # p_w' = S_corrected^-1 * (T_old * p_w)
                Rn_inv = Rn.T
                for mid in kfi.mp_ids:
                    rid = m.resolve(int(mid)) if mid >= 0 else -1
                    if rid < 0 or rid in done_points:
                        continue
                    done_points.add(rid)
                    mp = m.map_points[rid]
                    pc = Ro @ mp.pos + to  # old camera coords
                    pw = (Rn_inv @ ((pc - tn) / sn)).astype(np.float32)
                    mp.pos = pw
                    m.update_normal_and_depth(mp, self.config.orb.scale_factors)
                # corrected pose: SE3 with t/s (reference :516-522)
                kfi.Rcw = Rn
                kfi.tcw = (tn / sn).astype(np.float32)
                m.update_connections(kfi)

            # fuse loop points into the current keyframe (:527-539)
            for kp_idx, loop_mid in loop_points.items():
                loop_mp = m.get_mp(loop_mid)
                if loop_mp is None:
                    continue
                cur_mid = m.resolve(int(kf.mp_ids[kp_idx]))
                if cur_mid >= 0 and cur_mid != loop_mp.id:
                    m.replace_map_point(m.map_points[cur_mid], loop_mp)
                else:
                    m.add_observation(loop_mp, kf, int(kp_idx))
                    m.compute_distinctive_descriptor(loop_mp)

            # loop edges
            mkf = m.keyframes.get(match_kf_id)
            if mkf is not None:
                kf.loop_edges.add(match_kf_id)
                mkf.loop_edges.add(kf.id)

            self._optimize_essential_graph(kf, match_kf_id, corrected)

        # full-map BA (reference RunGlobalBundleAdjustment, 50 iters,
        # LoopClosing.cc:655-656)
        log.info("Starting Global Bundle Adjustment")
        global_bundle_adjustment(m, self.config, n_iters=50)
        log.info("Global Bundle Adjustment finished")
        self.last_loop_kf_id = kf.id
        self.n_loops_closed += 1

    def _optimize_essential_graph(self, kf: KeyFrame, match_kf_id: int, corrected):
        """Assemble + run the sim3 pose graph (reference OptimizeEssentialGraph
        via CeresOptimizer.cc:737-957): edges from spanning tree, loop edges,
        and strong covisibility (weight >= 100); the loop-match KF is fixed."""
        m = self.map
        kfs = sorted(m.all_keyframes(), key=lambda x: x.id)
        slot = {k.id: i for i, k in enumerate(kfs)}
        P = len(kfs)
        R = np.stack([k.Rcw for k in kfs]).astype(np.float32)
        t = np.stack([k.tcw for k in kfs]).astype(np.float32)
        s = np.ones(P, np.float32)

        edges = set()
        ei, ej = [], []
        Rm_l, tm_l, sm_l = [], [], []

        def add_edge(a, b):
            if a == b or (min(a, b), max(a, b)) in edges:
                return
            if a not in slot or b not in slot:
                return
            edges.add((min(a, b), max(a, b)))
            ka, kb = m.keyframes[a], m.keyframes[b]
            # measurement S_ba = S_b * S_a^-1 from CURRENT (corrected) poses
            Rb, tb = kb.Rcw.astype(np.float64), kb.tcw.astype(np.float64)
            Ra, ta = ka.Rcw.astype(np.float64), ka.tcw.astype(np.float64)
            Rba = Rb @ Ra.T
            tba = tb - Rba @ ta
            ei.append(slot[a])
            ej.append(slot[b])
            Rm_l.append(Rba.astype(np.float32))
            tm_l.append(tba.astype(np.float32))
            sm_l.append(1.0)

        for k in kfs:
            if k.parent is not None:
                add_edge(k.parent, k.id)
            for le in k.loop_edges:
                add_edge(k.id, le)
            for nb, w in k.covisible.items():
                if w >= MIN_EDGE_WEIGHT:
                    add_edge(k.id, nb)
        if not ei:
            return
        fixed = np.zeros(P, bool)
        if match_kf_id in slot:
            fixed[slot[match_kf_id]] = True
        else:
            fixed[0] = True
        res = sim3opt.optimize_essential_graph(
            jnp.asarray(R), jnp.asarray(t), jnp.asarray(s),
            jnp.asarray(np.array(ei, np.int32)), jnp.asarray(np.array(ej, np.int32)),
            jnp.asarray(np.stack(Rm_l)), jnp.asarray(np.stack(tm_l)),
            jnp.asarray(np.array(sm_l, np.float32)),
            jnp.ones(len(ei), bool), jnp.asarray(fixed),
        )
        Rn = np.asarray(res.R)
        tn = np.asarray(res.t)
        sn = np.asarray(res.s)
        # recover SE3 (t/s) + remap map points via their reference keyframes
        old = {k.id: (k.Rcw.copy(), k.tcw.copy()) for k in kfs}
        for k in kfs:
            i = slot[k.id]
            k.Rcw = Rn[i]
            k.tcw = (tn[i] / max(sn[i], 1e-9)).astype(np.float32)
        for mp in m.all_map_points():
            ref = m.keyframes.get(mp.ref_kf_id)
            if ref is None or ref.bad or mp.ref_kf_id not in old:
                continue
            Ro, to = old[mp.ref_kf_id]
            i = slot[mp.ref_kf_id]
            pc = Ro @ mp.pos + to
            # invert corrected sim3: p = R^T (s^-1 (pc - t_sim)) with t_sim = s*t_se3
            mp.pos = (Rn[i].T @ ((pc - tn[i]) / max(sn[i], 1e-9))).astype(np.float32)
            m.update_normal_and_depth(mp, self.config.orb.scale_factors)
