"""Integrated multi-stream SLAM: S complete systems, batched device stages.

The reference is a single-stream CPU system; the TPU deployment shape for
throughput is S concurrent SLAM streams on one chip (BASELINE.json batched
mode). Each stream here is a COMPLETE MonoSLAM — its own map, local mapping,
loop closing, relocalization — with per-stream host state, while the
per-frame device work batches across streams:

- ONE jitted frontend call runs extraction for all S images as a batch,
  per-stream local-map gathers, and the vmapped fused match/solve step
  (models/fused_track). The pose LM loop is a lax.while_loop, so the batch
  early-exits at the slowest stream's convergence (ops/optim.py).
- ONE stacked host->device transfer carries all streams' small per-frame
  inputs, and ONE device_get fetches all streams' control outputs — on a
  remote-TPU tunnel where each RPC costs ~ms, this is the difference between
  2 round trips per BATCH and 2 per STREAM.
- Per-stream outputs come out of the same compiled program as separate
  buffers (sliced inside jit), so lazy Frames never pay extra dispatches.

Streams that cannot batch on a given frame (initialization, LOST, fallback
states) run their normal single-stream path that frame; the batched call is
padded with a live stream's inputs so the trace never changes shape.
"""

from __future__ import annotations

import time
from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ceres_mono_orb_slam2_tpu.models import fused_track
from ceres_mono_orb_slam2_tpu.models.device_map import _pool_gather
from ceres_mono_orb_slam2_tpu.models.fused_track import build_fused_step
from ceres_mono_orb_slam2_tpu.models.system import MonoSLAM


class MultiStreamSLAM:
    """S independent SLAM systems whose per-frame device work batches into
    single device calls. Host orchestration (covisibility graph, keyframe
    decisions, mapping, loop closure) stays per-stream."""

    def __init__(self, config, n_streams: int, vocabulary=None,
                 vocabularies: Optional[list] = None, threaded: bool = False):
        self.config = config
        self.n_streams = n_streams
        vocs = vocabularies if vocabularies is not None else [vocabulary] * n_streams
        # threaded: per-stream mapping/loop workers, the reference's
        # thread-pipeline architecture (MonoORBSlam.cc:78-89) times S
        self.streams: List[MonoSLAM] = [
            MonoSLAM(config, vocabulary=vocs[s], threaded=threaded)
            for s in range(n_streams)
        ]
        # all streams share ONE fused step + ONE extractor jit cache: same
        # config -> same trace; separate instances would each pay the
        # multi-minute XLA compile through the tunnel
        shared_step = build_fused_step(config)
        ext0 = self.streams[0].extractor
        for s in self.streams:
            # single-stream pipelining (tracking._grab_pipelined) is
            # incompatible with track_batch's direct prepare/consume calls
            # (a pending in-flight frame would never be consumed in order);
            # the batch itself already amortizes the device round-trips
            s.tracker.pipelined = False
            s.tracker._fused_step = shared_step
            s.extractor = ext0
            s.tracker.extractor = ext0
        self._batched_frontend = None
        self.n_batched_frames = 0
        self.n_single_frames = 0
        # cumulative wall-time split of track_batch (seconds): host prepare
        # (serial per stream), batched device dispatch, blocking control
        # fetch, host consume (serial per stream) — the 8-stream scaling
        # diagnosis (VERDICT r4 item #6)
        self.phase_s = {"prepare": 0.0, "dispatch": 0.0, "fetch": 0.0,
                        "consume": 0.0, "frames": 0}

    # ------------------------------------------------------------- frontend

    def _ensure_batched_frontend(self, h: int, w: int):
        if self._batched_frontend is None:
            extract_jit = self.streams[0].extractor._extract_jit(h, w)
            step = self.streams[0].tracker._fused_step
            S = self.n_streams

            @jax.jit
            def frontend(images, l_oct, l_angle, l_desc, packed_hosts,
                         pools, bounds):
                feats = extract_jit(images)  # (S, ...) batched extraction
                N = l_oct[0].shape[0]
                # per-stream unpack of the packed host-input buffers (ONE
                # stacked (S, P) upload instead of 7 arrays x S streams);
                # L from the layout: P = HOST_IN_HEADER + 4N + L
                L = (packed_hosts.shape[1]
                     - fused_track.HOST_IN_HEADER - 4 * N)
                ins = jax.vmap(
                    lambda p: fused_track.unpack_host_inputs(p, N, L)
                )(packed_hosts)
                (_flag, R_pred, t_pred, th, l_pos, l_ok, l_row, slots) = ins
                # per-stream local-map gathers (pool caps may differ); the
                # gathered L-blocks share shapes and stack for the vmap
                lblocks = [_pool_gather(*pools[s], slots[s]) for s in range(S)]
                lblock = tuple(jnp.stack([lb[i] for lb in lblocks])
                               for i in range(6))
                l_oct_b = jnp.stack(l_oct)
                l_angle_b = jnp.stack(l_angle)
                l_desc_b = jnp.stack(l_desc)
                out = jax.vmap(
                    step, in_axes=(0,) * 13 + (0,) * 6 + (None, 0)
                )(feats.xy, feats.octave, feats.angle, feats.desc, feats.valid,
                  l_oct_b, l_angle_b, l_desc_b,
                  l_pos, l_ok, l_row, R_pred, t_pred,
                  *lblock, bounds, th)
                # slice per-stream outputs INSIDE the compiled program: the
                # host sees S separate buffer sets with zero extra dispatches
                packs = jax.vmap(fused_track.pack_control)(out, feats.valid)
                outs = tuple(jax.tree_util.tree_map(lambda a: a[s], out)
                             for s in range(S))
                fouts = tuple(jax.tree_util.tree_map(lambda a: a[s], feats)
                              for s in range(S))
                return outs, fouts, tuple(packs[s] for s in range(S))

            self._batched_frontend = frontend
        return self._batched_frontend

    # ----------------------------------------------------------------- track

    def track_batch(self, images, timestamps) -> list:
        """Track one frame on every stream. `images`: (S, H, W) array or
        list of S images; `timestamps`: list of S. Returns S entries of
        Tcw (4,4) or None, exactly like S track_monocular calls."""
        S = self.n_streams
        assert len(images) == S and len(timestamps) == S
        # 8-bit entry like Tracking.grab_image (4x less upload per stream)
        images = [img if img.dtype == np.uint8
                  else np.clip(img + 0.5, 0.0, 255.0).astype(np.uint8)
                  for img in images]
        results = [None] * S

        t_p0 = time.perf_counter()
        preps = [None] * S
        for i, sysm in enumerate(self.streams):
            tr = sysm.tracker
            if (tr.fused_enabled and tr._can_fuse()
                    and hasattr(tr.extractor, "_extract_jit")):
                with sysm.map.update_lock:
                    preps[i] = tr._fused_prepare(images[i], timestamps[i])

        batch_idx = [i for i, p in enumerate(preps) if p is not None]
        if len(batch_idx) >= 2:
            self.n_batched_frames += 1
            h, w = images[batch_idx[0]].shape[-2:]
            frontend = self._ensure_batched_frontend(h, w)
            # pad non-batchable lanes with a live stream's inputs so the
            # trace keeps a constant shape; padded outputs are discarded
            fill = preps[batch_idx[0]][0]
            lane = [preps[i][0] if preps[i] is not None else fill
                    for i in range(S)]
            t_d0 = time.perf_counter()
            # host leaves (image, packed inputs) stack into ONE transfer
            # each; device leaves (last-frame tensors, pools, bounds) pass
            # through as lists
            outs, fouts, packs = frontend(
                jnp.asarray(np.stack([a[0] for a in lane])),
                [a[1] for a in lane], [a[2] for a in lane],
                [a[3] for a in lane],
                jnp.asarray(np.stack([a[4] for a in lane])),
                [a[5] for a in lane],
                lane[0][6],
            )
            t_f0 = time.perf_counter()
            # ONE device_get for every batched stream's packed control buffer
            ctl = jax.device_get(tuple(packs[i] for i in batch_idx))
            t_c0 = time.perf_counter()
            for k, i in enumerate(batch_idx):
                sysm = self.streams[i]
                with sysm.map.update_lock:
                    sysm.tracker._fused_consume(
                        preps[i][1], outs[i], fouts[i], ctl[k])
                results[i] = self._finish_stream(i)
            t_c1 = time.perf_counter()
            ph = self.phase_s
            ph["prepare"] += t_d0 - t_p0
            ph["dispatch"] += t_f0 - t_d0
            ph["fetch"] += t_c0 - t_f0
            ph["consume"] += t_c1 - t_c0
            ph["frames"] += 1
        elif batch_idx:
            # lone fused stream: its normal single-stream path
            i = batch_idx[0]
            sysm = self.streams[i]
            self.n_single_frames += 1
            with sysm.map.update_lock:
                sysm.tracker._fused_finish(preps[i][0], preps[i][1])
            results[i] = self._finish_stream(i)

        for i, sysm in enumerate(self.streams):
            if preps[i] is None:  # init / LOST / non-fusable: normal path
                self.n_single_frames += 1
                results[i] = sysm.track_monocular(images[i], timestamps[i])
        return results

    def _finish_stream(self, i: int):
        """Post-track work + return value of MonoSLAM.track_monocular."""
        sysm = self.streams[i]
        if sysm.threaded:  # hand mapping/loop work to the stream's worker
            if sysm.local_mapper.queue:
                sysm._work_q.put(1)
        else:
            sysm.local_mapper.process_queue()
            if sysm.loop_closer is not None:
                sysm.loop_closer.process_queue()
        f = sysm.tracker.current
        sysm.tracker.last_frame = f
        if f.pose_set:
            T = np.eye(4, dtype=np.float32)
            T[:3, :3] = f.Rcw
            T[:3, 3] = f.tcw
            return T
        return None

    def shutdown(self):
        for s in self.streams:
            s.shutdown()
