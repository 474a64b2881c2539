"""Fused per-frame tracking step: the production hot loop in ONE device call.

The reference's per-frame path (Tracking.cc:265-383) is: motion-model
projection search (SearchByProjection, ORBmatcher.cc:1161-1271, with the
15->30 window retry at :662-668), a motion-only pose solve
(CeresOptimizer::PoseOptimization), then local-map tracking: frustum + scale
prediction for every local point (Frame::isInFrustum, Frame.cc:191-241),
SearchByProjection overload #1 (ORBmatcher.cc:42-119), and a second pose
solve. Round 2 shipped each of those as separate device calls with
host round-trips between them — correct, but ~0.48 s/frame of RPC latency
through a remote-TPU tunnel while the same math ran in 7 ms inside the
benchmark-only fused step.

This module IS that fused step, wired for the live Tracking state machine:

  one jit:  [ motion-model match (both window widths, traced select)
              -> trimmed-LM pose solve #1
              -> frustum + scale prediction over the local-map block
              -> local projection match
              -> trimmed-LM pose solve #2 ]

Inputs arrive as: the current frame's extractor features (device-resident,
straight from the extractor jit), the previous frame's features (device
handles carried between steps), two small host uploads (last-frame point
positions + the local-map block gathered from models/device_map.DeviceMapPool)
and the predicted pose. Everything the host needs back — final pose, all
match indices, inlier masks, gate counters, the frame's host-side feature
copies — returns in ONE batched device_get.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ceres_mono_orb_slam2_tpu.ops import camera, frustum, lie, matcher, optim


class FusedOut(NamedTuple):
    R: jnp.ndarray  # (3,3) final pose
    t: jnp.ndarray  # (3,)
    und: jnp.ndarray  # (N,2) undistorted current keypoints
    m1_idx: jnp.ndarray  # (N,) per-LAST-slot matched current kp
    m1_valid: jnp.ndarray  # (N,)
    inl1: jnp.ndarray  # (N,) per-kp stage-1 inliers
    n1_matches: jnp.ndarray  # () int32 motion-model match count
    n1_inliers: jnp.ndarray  # ()
    m2_idx: jnp.ndarray  # (L,) per-local-row matched current kp
    m2_valid: jnp.ndarray  # (L,)
    visible: jnp.ndarray  # (L,) frustum-visible local rows
    assoc: jnp.ndarray  # (N,) bool: kp slot bound after both stages
    inl2: jnp.ndarray  # (N,) final inlier mask
    n2_inliers: jnp.ndarray  # ()
    # --- chained next-frame state (stays on device; the pipelined tracker
    # feeds these straight back as the NEXT frame's last-frame inputs so a
    # frame can be dispatched before the previous frame's results are fetched)
    pos_kp: jnp.ndarray  # (N,3) bound 3D point per kp slot
    ok_next: jnp.ndarray  # (N,) bool: inlier-bound slots = next last_ok
    next_local_row: jnp.ndarray  # (N,) int32 local-block row of the bound point (-1 none)


def pack_control(out: FusedOut, feats_valid: jnp.ndarray) -> jnp.ndarray:
    """Pack every host-bound control output into ONE int32 vector.

    The control fetch was 14 separate arrays; through the remote-TPU tunnel
    each fetched buffer pays its own per-RPC overhead (measured ~67 ms for
    the 14-array get vs ~26 ms flat for a single sync), so the fetch is the
    per-frame critical path. Layout (int32):
      [0:12]        R (9) + t (3), f32 bitcast
      [12:15]       n1_matches, n1_inliers, n2_inliers
      [15:15+N]     per-keypoint: m1_idx | m1_valid<<16 | inl1<<17
                    | assoc<<18 | inl2<<19 | feats_valid<<20
      [15+N:15+N+L] per-local-row: m2_idx | m2_valid<<16 | visible<<17
    Index fields are < N <= 65535 so 16 bits hold them. Traceable: callers
    fold it into their own jit (the unified frontend) or use the module
    jit `pack_control_jit`."""
    kp = (out.m1_idx.astype(jnp.int32)
          | (out.m1_valid.astype(jnp.int32) << 16)
          | (out.inl1.astype(jnp.int32) << 17)
          | (out.assoc.astype(jnp.int32) << 18)
          | (out.inl2.astype(jnp.int32) << 19)
          | (feats_valid.astype(jnp.int32) << 20))
    loc = (out.m2_idx.astype(jnp.int32)
           | (out.m2_valid.astype(jnp.int32) << 16)
           | (out.visible.astype(jnp.int32) << 17))
    hdr = jax.lax.bitcast_convert_type(
        jnp.concatenate([out.R.reshape(-1), out.t]).astype(jnp.float32),
        jnp.int32)
    cnt = jnp.stack([out.n1_matches, out.n1_inliers,
                     out.n2_inliers]).astype(jnp.int32)
    return jnp.concatenate([hdr, cnt, kp, loc])


pack_control_jit = jax.jit(pack_control)

CTL_HEADER = 15  # R+t (12) + 3 counters


def unpack_control(packed: np.ndarray, L: int):
    """Host-side inverse of pack_control. `packed` is the fetched (15+N+L,)
    int32 numpy vector; returns the same tuple order as the old 14-array
    control fetch: (R, t, m1_idx, m1_valid, inl1, n1, ninl1, m2_idx,
    m2_valid, visible, assoc, inl2, ninl2, feats_valid)."""
    hdr = packed[:12].view(np.float32)
    R = hdr[:9].reshape(3, 3).copy()
    t = hdr[9:12].copy()
    n1, ninl1, ninl2 = (int(packed[12]), int(packed[13]), int(packed[14]))
    kp = packed[CTL_HEADER:-L]
    loc = packed[len(packed) - L:]
    m1_idx = (kp & 0xFFFF).astype(np.int32)
    m1_valid = (kp >> 16 & 1).astype(bool)
    inl1 = (kp >> 17 & 1).astype(bool)
    assoc = (kp >> 18 & 1).astype(bool)
    inl2 = (kp >> 19 & 1).astype(bool)
    feats_valid = (kp >> 20 & 1).astype(bool)
    m2_idx = (loc & 0xFFFF).astype(np.int32)
    m2_valid = (loc >> 16 & 1).astype(bool)
    visible = (loc >> 17 & 1).astype(bool)
    return (R, t, m1_idx, m1_valid, inl1, n1, ninl1,
            m2_idx, m2_valid, visible, assoc, inl2, ninl2, feats_valid)


HOST_IN_HEADER = 14  # use_packed flag (1) + R_pred (9) + t_pred (3) + th (1)


def pack_host_inputs(R_pred, t_pred, th_local, last_pos, last_ok,
                     last_local_row, slots_padded) -> np.ndarray:
    """Pack the serial path's per-frame host->device inputs into ONE int32
    upload (numpy, host side). Before packing a serial frame issued ~13
    separate transfers (each its own RPC through the remote-TPU tunnel,
    ~2 ms apiece): prediction R/t, last-frame point block, binding masks,
    local-block slots, search radius, plus numpy constants re-uploaded every
    call. Layout (int32):
      [0]             1 (use_packed flag; the chained path passes a cached
                      zero buffer whose flag 0 selects the device tensors)
      [1:14]          R_pred (9) + t_pred (3) + th_local (1), f32 bitcast
      [14:14+3N]      last_pos, f32 bitcast
      [14+3N:14+4N]   (last_local_row+1) & 0xFFFF | last_ok << 16
      [14+4N:14+4N+L] slots_padded
    Rows are < L <= 65535 so 16 bits hold row+1."""
    N = len(last_ok)
    L = len(slots_padded)
    buf = np.empty(HOST_IN_HEADER + 4 * N + L, np.int32)
    hdr = np.empty(13, np.float32)
    hdr[:9] = np.asarray(R_pred, np.float32).ravel()
    hdr[9:12] = np.asarray(t_pred, np.float32)
    hdr[12] = th_local
    buf[0] = 1
    buf[1:14] = hdr.view(np.int32)
    buf[14:14 + 3 * N] = np.ascontiguousarray(
        last_pos, np.float32).ravel().view(np.int32)
    buf[14 + 3 * N:14 + 4 * N] = (
        ((last_local_row.astype(np.int32) + 1) & 0xFFFF)
        | (last_ok.astype(np.int32) << 16))
    buf[14 + 4 * N:] = slots_padded
    return buf


def unpack_host_inputs(packed: jnp.ndarray, N: int, L: int):
    """Traced inverse of pack_host_inputs. Returns (use_packed, R_pred,
    t_pred, th, last_pos, last_ok, last_local_row, slots)."""
    use_packed = packed[0] > 0
    hdr = jax.lax.bitcast_convert_type(packed[1:14], jnp.float32)
    R = hdr[:9].reshape(3, 3)
    t = hdr[9:12]
    th = hdr[12]
    pos = jax.lax.bitcast_convert_type(
        packed[14:14 + 3 * N], jnp.float32).reshape(N, 3)
    okrow = packed[14 + 3 * N:14 + 4 * N]
    ok = (okrow >> 16 & 1).astype(bool)
    row = (okrow & 0xFFFF).astype(jnp.int32) - 1
    slots = packed[14 + 4 * N:]
    return use_packed, R, t, th, pos, ok, row, slots


def build_fused_step(config):
    """Build the fused step closure for one camera/ORB configuration.
    Compiles per (N, L) shape pair (keypoint budget x local-block bucket)."""
    cam = config.camera
    # Closure constants stay NUMPY: device-array constants are fetched
    # device->host at every jit lowering (per process start), and that fetch
    # through the axon tunnel can cost seconds each (see ops/orb/extractor.py
    # _bin_tap_table note). Host arrays embed in the MLIR for free.
    K = np.asarray(cam.K, np.float32)
    dist = np.asarray(cam.dist_coeffs, np.float32) if cam.has_distortion else None
    scales = np.asarray(config.orb.scale_factors, np.float32)
    inv_sigma2 = config.orb.inv_level_sigma2.astype(np.float32)
    log_scale = float(np.log(config.orb.scale_factor))
    n_levels = config.orb.n_levels

    def _match_motion(d, und, cur_oct, cur_angle, cur_valid,
                      last_oct, last_angle, pr_uv, pr_ok, th):
        """SearchByProjection vs last frame (ORBmatcher.cc:1161-1271) for one
        static window width; `d` is the shared (N, N) Hamming matrix (computed
        once for both widths — the matmul is the expensive part)."""
        r = th * jnp.asarray(scales)[last_oct]
        du = jnp.abs(pr_uv[:, 0:1] - und[None, :, 0])
        dv = jnp.abs(pr_uv[:, 1:2] - und[None, :, 1])
        in_w = (du <= r[:, None]) & (dv <= r[:, None])
        lvl = (cur_oct[None, :] >= last_oct[:, None] - 1) & (
            cur_oct[None, :] <= last_oct[:, None] + 1)
        mask = in_w & lvl & cur_valid[None, :] & pr_ok[:, None]
        best_val, best_idx, _, _ = matcher.masked_top2(d, mask)
        valid = pr_ok & (best_val <= matcher.TH_HIGH)
        valid = matcher.rotation_consistency_mask(last_angle, cur_angle[best_idx], valid)
        valid = matcher.resolve_duplicate_targets(best_idx, best_val, valid, und.shape[0])
        return best_idx, valid

    def _match_local(und, cur_oct, cur_bits, cur_valid, kp_free,
                     uv, level, viewcos, l_bits, cand_ok, th):
        """SearchByProjection overload #1 (ORBmatcher.cc:42-119) with a
        TRACED radius multiplier (the reference widens th to 5 right after a
        relocalization, Tracking.cc:808-812)."""
        r = matcher.radius_by_viewing_cos(viewcos) * th * jnp.asarray(scales)[level]
        du = jnp.abs(uv[:, 0:1] - und[None, :, 0])
        dv = jnp.abs(uv[:, 1:2] - und[None, :, 1])
        in_w = (du <= r[:, None]) & (dv <= r[:, None])
        lvl = (cur_oct[None, :] >= level[:, None] - 1) & (cur_oct[None, :] <= level[:, None])
        mask = in_w & lvl & cur_valid[None, :] & kp_free[None, :] & cand_ok[:, None]
        d = matcher.hamming_matrix(l_bits, cur_bits)
        best_val, best_idx, second_val, second_idx = matcher.masked_top2(d, mask)
        blvl = cur_oct[best_idx]
        slvl = cur_oct[second_idx]
        ratio_ok = (blvl != slvl) | (
            best_val.astype(jnp.float32) <= 0.8 * second_val.astype(jnp.float32))
        valid = cand_ok & (best_val <= matcher.TH_HIGH) & ratio_ok
        valid = matcher.resolve_duplicate_targets(best_idx, best_val, valid, und.shape[0])
        return best_idx, valid

    @jax.jit
    def step(
        cur_xy, cur_oct, cur_angle, cur_desc, cur_valid,  # current frame (N,...)
        last_oct, last_angle, last_desc,  # previous frame (N,...)
        last_pos, last_ok, last_local_row,  # (N,3),(N,),(N,) host uploads
        R_pred, t_pred,  # motion-model prediction
        l_pos, l_normal, l_mind, l_maxd, l_desc, l_valid,  # local block (L,...)
        bounds,  # (4,)
        th_local,  # () traced radius multiplier
    ) -> FusedOut:
        N = cur_xy.shape[0]
        L = l_pos.shape[0]
        und = camera.undistort_points(cur_xy, K, dist) if dist is not None else cur_xy
        cur_bits = matcher.unpack_bits_pm1(cur_desc)
        last_bits = matcher.unpack_bits_pm1(last_desc)
        w = jnp.asarray(inv_sigma2)[cur_oct]

        # ---- stage 1: motion-model projection match + pose solve ----------
        Xc = last_pos @ R_pred.T + t_pred
        z = jnp.maximum(Xc[:, 2], 1e-6)
        pr_uv = jnp.stack([K[0, 0] * Xc[:, 0] / z + K[0, 2],
                           K[1, 1] * Xc[:, 1] / z + K[1, 2]], axis=-1)
        pr_ok = last_ok & (Xc[:, 2] > 0)

        d1 = matcher.hamming_matrix(last_bits, cur_bits)
        i15, v15 = _match_motion(d1, und, cur_oct, cur_angle, cur_valid,
                                 last_oct, last_angle, pr_uv, pr_ok, 15.0)
        i30, v30 = _match_motion(d1, und, cur_oct, cur_angle, cur_valid,
                                 last_oct, last_angle, pr_uv, pr_ok, 30.0)
        n15 = jnp.sum(v15.astype(jnp.int32))
        use15 = n15 >= 20  # reference retry-wider gate (Tracking.cc:662-668)
        m1_idx = jnp.where(use15, i15, i30)
        m1_valid = jnp.where(use15, v15, v30)
        n1 = jnp.where(use15, n15, jnp.sum(v30.astype(jnp.int32)))

        safe1 = jnp.where(m1_valid, m1_idx, N)
        pos1 = jnp.zeros((N + 1, 3), jnp.float32).at[safe1].set(last_pos)[:-1]
        ok1 = jnp.zeros((N + 1,), bool).at[safe1].set(m1_valid)[:-1]
        res1 = optim.pose_optimization(K, R_pred, t_pred, pos1, und, w, ok1)
        inl1 = res1.inliers
        bound1 = ok1 & inl1

        # ---- stage 2: local-map frustum + match + pose solve --------------
        uv2, level2, viewcos2, visible = frustum.frustum_and_scale(
            res1.R, res1.t, K, bounds, l_pos, l_normal, l_mind, l_maxd,
            l_valid, log_scale, n_levels)
        # exclude local rows whose point is already bound through stage 1
        # (reference skips candidates with last_frame_seen == current id,
        # Tracking.cc:797-804)
        bound_last = m1_valid & inl1[m1_idx]
        rr = jnp.where(bound_last & (last_local_row >= 0), last_local_row, L)
        excl = jnp.zeros((L + 1,), bool).at[rr].set(True)[:L]
        cand_ok = visible & ~excl
        kp_free = cur_valid & ~bound1
        l_bits = matcher.unpack_bits_pm1(l_desc)
        m2_idx, m2_valid = _match_local(und, cur_oct, cur_bits, cur_valid, kp_free,
                                        uv2, level2, viewcos2, l_bits, cand_ok, th_local)

        safe2 = jnp.where(m2_valid, m2_idx, N)
        pos2 = jnp.zeros((N + 1, 3), jnp.float32).at[safe2].set(l_pos)[:-1]
        ok_new = jnp.zeros((N + 1,), bool).at[safe2].set(m2_valid)[:-1]
        pos_kp = jnp.where(bound1[:, None], pos1, pos2)
        assoc = bound1 | ok_new
        res2 = optim.pose_optimization(K, res1.R, res1.t, pos_kp, und, w, assoc)

        # chained next-frame state: exactly what the host would rebuild for
        # the next frame's stage-1 inputs from this frame's bindings
        # (tracking._gather_frame_points + the last_local_row mapping), minus
        # the post-solve outlier slots (the host clears them too,
        # Tracking.cc:345-350 / tracking._finish_track)
        ok_next = assoc & res2.inliers
        row1 = jnp.full((N + 1,), -1, jnp.int32).at[safe1].set(last_local_row)[:-1]
        row2 = jnp.full((N + 1,), -1, jnp.int32).at[safe2].set(
            jnp.arange(L, dtype=jnp.int32))[:-1]
        next_row = jnp.where(ok_new, row2, jnp.where(bound1, row1, -1))
        next_row = jnp.where(ok_next, next_row, -1)

        return FusedOut(
            R=res2.R, t=res2.t, und=und,
            m1_idx=m1_idx, m1_valid=m1_valid, inl1=inl1,
            n1_matches=n1, n1_inliers=res1.n_inliers,
            m2_idx=m2_idx, m2_valid=m2_valid, visible=visible,
            assoc=assoc, inl2=res2.inliers, n2_inliers=res2.n_inliers,
            pos_kp=pos_kp, ok_next=ok_next, next_local_row=next_row,
        )

    return step
