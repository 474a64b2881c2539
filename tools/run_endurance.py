"""Endurance run (VERDICT round-2 #9): 500+ rendered frames through the live
System combining multiple loop closures (circle world, several revolutions),
a mid-run blackout/kidnap with BoW relocalization, sustained map growth with
culling, live global BA after loop closure, and a zero-recompiles-after-warmup
assertion. Reference analogue: the fr2_360_kidnap + KITTI-00 validation story
(README.md:7).

Usage: python tools/run_endurance.py [--frames 520] [--blackout 300]
       [--features 2000] [--threaded]
Writes a JSON report to --out (default /tmp/endurance_report.json).
"""

import argparse
import faulthandler
import json
import logging
import signal
import sys
import time

faulthandler.register(signal.SIGUSR2, all_threads=True)
# SIGUSR2 gives an on-demand stack; no timed dump (it would reset
# watchdog_run.sh's mtime stall clock — KNOWN_ISSUES round 5)

sys.path.insert(0, "/root/repo")

import numpy as np

from ceres_mono_orb_slam2_tpu.models.system import MonoSLAM
from ceres_mono_orb_slam2_tpu.ops import bow
from ceres_mono_orb_slam2_tpu.ops.orb import ORBExtractor
from ceres_mono_orb_slam2_tpu.utils.config import (
    CameraConfig, ORBConfig, SlamConfig, StaticShapes)
from ceres_mono_orb_slam2_tpu.utils.synthetic import ate_rmse, make_sequence


class CompileCounter(logging.Handler):
    """Counts XLA compilations via jax_log_compiles records.

    Compiles are split into STEADY-STATE (the per-frame tracking + per-
    keyframe mapping loop — the zero-after-warmup contract, since a compile
    there stalls the live loop) and LOOP-EVENT (sim3 / essential-graph /
    global-BA programs, which run on the asynchronous mapper/GBA threads
    exactly like the reference's background GBA thread and whose pow2 shape
    buckets grow O(log N) with map scale — each bucket compiles ONCE per
    session and is reported, never hidden)."""

    EVENT_SIGS = ("sim3", "essential", "bundle_adjustment_cg", "horn")

    def __init__(self):
        super().__init__()
        self.n = 0
        self.n_event = 0
        self.last = None
        self.messages = []  # every "Compiling ..." signature, in order
        self._seen = set()

    def emit(self, record):
        # the handler hangs on both child loggers and the "jax" parent, and
        # records PROPAGATE up — dedupe or every compile is counted twice
        # (round-3 endurance reports were 2x inflated). Key on the record's
        # creation timestamp + message, NOT id(record): a freed record's
        # address gets reused by later allocations, which silently DROPPED
        # later distinct compile events (caught by verification this round).
        key = (record.created, record.getMessage()[:200])
        if key in self._seen:
            return
        self._seen.add(key)
        msg = record.getMessage()
        if "ompil" in msg:  # "Compiling ..." / "Finished XLA compilation"
            if msg.startswith("Compiling"):
                import threading as _th

                self.n += 1
                self.last = msg[:140]
                tag = "event" if any(s in msg for s in self.EVENT_SIGS) else "steady"
                if tag == "event":
                    self.n_event += 1
                self.messages.append(
                    f"[{tag}@{_th.current_thread().name}] {msg[:200]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=520)
    ap.add_argument("--motion", default="circle", choices=["circle", "spiral"],
                    help="circle: revisit the same ring band every lap (live "
                         "KFs saturate under redundancy culling); spiral: "
                         "circle + slow vertical rise so live keyframes "
                         "accumulate lap over lap (the KITTI-style "
                         "sustained-growth trajectory, VERDICT r4 item #1's "
                         "200+ live-KF ask) while loop closure still fires "
                         "every revolution")
    ap.add_argument("--step", type=float, default=0.06)
    ap.add_argument("--seed", type=int, default=11)
    ap.add_argument("--features", type=int, default=2000)
    ap.add_argument("--h", type=int, default=480)
    ap.add_argument("--w", type=int, default=640)
    ap.add_argument("--fx", type=float, default=500.0)
    ap.add_argument("--fy", type=float, default=500.0)
    ap.add_argument("--device-render", action="store_true",
                    help="render the sequence with the jit ray tracer "
                         "(ms/frame on the TPU vs ~6 s/frame in numpy) — "
                         "required for KITTI-scale runs (2000+ frames at "
                         "1241x376, VERDICT r4 item #3)")
    ap.add_argument("--prewarm", action="store_true",
                    help="compile every steady-state shape bucket before "
                         "frame 0 (models/prewarm.py); the recompile "
                         "assertion window then starts at frame 0 intent")
    ap.add_argument("--max-local-points", type=int, default=4096)
    ap.add_argument("--ba-points", type=int, default=2048,
                    help="local-BA point budget (the session dense-solve "
                         "shape); the KITTI config needs 4096 — measured "
                         "live windows there want ~4k points / ~16k obs")
    ap.add_argument("--ba-obs", type=int, default=8192)
    ap.add_argument("--local-kfs", type=int, default=12,
                    help="max_local_keyframes: the local-BA free-window cap "
                         "(the reference optimizes ALL covisibles, "
                         "CeresOptimizer.cc:351-360; the cap bounds the BA "
                         "pose-shape family to ONE prewarmed program). Raise "
                         "it to measure the cap's ATE cost (VERDICT r4 "
                         "item #8)")
    ap.add_argument("--synth-vocab-levels", type=int, default=0,
                    help="use a structure-generated ORBvoc-scale vocabulary "
                         "with k=10 and this many levels (6 -> 1M words, the "
                         "reference's ORBvoc.txt shape) instead of training "
                         "a small one from the sequence — exercises the "
                         "KeyFrameDatabase share-word/minScore gates at real "
                         "ORBvoc statistics (VERDICT r4 item #5)")
    ap.add_argument("--pool-cap", type=int, default=0,
                    help="device map pool rows (0 = auto); size to the "
                         "expected live-map peak to avoid one mid-run "
                         "frontend recompile on pool growth")
    ap.add_argument("--blackout", type=int, default=300,
                    help="first frame of a 6-frame blackout (kidnap); 0 disables")
    ap.add_argument("--warmup", type=int, default=60,
                    help="frames before the zero-recompile assertion window")
    ap.add_argument("--assert-zero-recompiles", action="store_true",
                    help="FAIL the run if any XLA compile lands after the "
                         "warmup window (the steady-state contract: prewarm "
                         "covers every reachable shape bucket)")
    ap.add_argument("--threaded", action="store_true")
    ap.add_argument("--pace-fps", type=float, default=0.0,
                    help="pace frames at this camera rate, sleeping out the "
                         "remainder of each 1/fps period like the reference "
                         "driver (main.cc:97-106 usleep(T-ttrack); KITTI is "
                         "10 Hz). The sleep is when the mapping worker is "
                         "GUARANTEED host time — max-rate driving on a "
                         "1-core host starves it and the local map lags the "
                         "camera. fps stats still use the per-call track "
                         "times, exactly like the reference's ttrack")
    ap.add_argument("--pipelined", action="store_true",
                    help="pipelined tracking (one frame of pose latency); "
                         "ATE/tracked-rate evaluate from the drained "
                         "trajectory log instead of per-call returns")
    ap.add_argument("--out", default="/tmp/endurance_report.json")
    args = ap.parse_args()

    import jax

    from ceres_mono_orb_slam2_tpu.utils.synthetic import tunnel_canary

    tunnel_canary()
    import os

    if os.environ.get("CERES_DEBUG_LOOP"):
        # gate-level diagnostics for loop detection (smoke triage)
        hdl = logging.StreamHandler(sys.stdout)
        hdl.setFormatter(logging.Formatter("%(name)s %(message)s"))
        for nm in ("ceres_mono_orb_slam2_tpu.models.loopclosing",
                   "ceres_mono_orb_slam2_tpu.models.keyframe_database"):
            lg = logging.getLogger(nm)
            lg.addHandler(hdl)
            lg.setLevel(logging.DEBUG)
    jax.config.update("jax_log_compiles", True)
    counter = CompileCounter()
    for name in ("jax._src.dispatch", "jax._src.interpreters.pxla", "jax"):
        logging.getLogger(name).addHandler(counter)
        logging.getLogger(name).setLevel(logging.WARNING)

    t_render = time.perf_counter()
    if args.device_render:
        from ceres_mono_orb_slam2_tpu.utils.synthetic import (
            make_rendered_sequence_device)

        seq = make_rendered_sequence_device(
            n_frames=args.frames, h=args.h, w=args.w, fx=args.fx, fy=args.fy,
            seed=args.seed, motion=args.motion, step=args.step,
            cache_dir="/tmp/render_cache")
    else:
        seq = make_sequence(n_frames=args.frames, h=args.h, w=args.w,
                            fx=args.fx, fy=args.fy, seed=args.seed,
                            motion=args.motion, step=args.step)
    print(f"sequence ready ({time.perf_counter() - t_render:.0f}s)", flush=True)

    cfg = SlamConfig(
        camera=CameraConfig(fx=args.fx, fy=args.fy, cx=args.w / 2.0,
                            cy=args.h / 2.0, fps=30.0),
        orb=ORBConfig(n_features=args.features),
        shapes=StaticShapes(max_local_points=args.max_local_points,
                            device_pool_cap=args.pool_cap,
                            max_local_keyframes=args.local_kfs,
                            max_ba_points=args.ba_points,
                            max_ba_obs=args.ba_obs),
    )
    if args.synth_vocab_levels:
        # ORBvoc-scale tree SEEDED with real descriptors from a DIFFERENT
        # sequence (seed+13), like the reference's ORBvoc trained on
        # unrelated imagery: a purely structure-generated tree quantizes
        # real descriptors into near-random words and loop closure never
        # fires (tools/diag_vocab.py). Cached: the build is a one-time ~2-4
        # minute host k-medians pass.
        import os
        import pickle

        t0 = time.perf_counter()
        cache = (f"/tmp/seeded_voc_k10_L{args.synth_vocab_levels}"
                 f"_s{args.seed + 13}_{args.w}x{args.h}.pkl")
        if os.path.exists(cache):
            with open(cache, "rb") as f:
                voc = pickle.load(f)
        else:
            from ceres_mono_orb_slam2_tpu.utils.synthetic import (
                make_rendered_sequence_device)

            cs = make_rendered_sequence_device(
                n_frames=120, h=args.h, w=args.w, fx=args.fx, fy=args.fy,
                seed=args.seed + 13, motion="circle", step=args.step,
                cache_dir="/tmp/render_cache")
            ex = ORBExtractor(ORBConfig(n_features=args.features))
            docs = []
            for i in range(0, cs.n_frames, 2):
                fe = ex.extract(cs.images[i])
                docs.append(np.asarray(fe.desc)[0][np.asarray(fe.valid)[0]])
                if i % 20 == 0:
                    print(f"vocab corpus {i}/{cs.n_frames}", flush=True)
            print("vocab k-medians build...", flush=True)
            voc = bow.seeded_vocabulary(
                np.concatenate(docs), k=10, levels=args.synth_vocab_levels,
                seed=0, docs=docs)
            with open(cache, "wb") as f:
                pickle.dump(voc, f)
        print(f"vocabulary: {voc.n_words:,} words (ORBvoc-scale, "
              f"corpus-seeded, {time.perf_counter()-t0:.0f}s)", flush=True)
    else:
        ex = ORBExtractor(cfg.orb)
        corpus = []
        for i in range(0, min(args.frames, 40), 4):
            fe = ex.extract(seq.images[i])
            corpus.append(np.asarray(fe.desc)[0][np.asarray(fe.valid)[0]])
        voc = bow.train_vocabulary(np.concatenate(corpus), k=10, levels=4,
                                   seed=0, docs=corpus)
        print(f"vocabulary: {voc.n_words} words", flush=True)
    slam = MonoSLAM(cfg, vocabulary=voc, threaded=args.threaded,
                    pipelined=args.pipelined)
    if args.prewarm:
        t0 = time.perf_counter()
        timings = slam.prewarm(args.h, args.w)
        print(f"prewarm: {timings} (compiles so far: {counter.n})", flush=True)

    blackout = set(range(args.blackout, args.blackout + 6)) if args.blackout else set()
    est, gt, times = [], [], []
    frame_ok = []
    compiles_at_warmup = None
    peak_points = 0
    peak_kfs = 0
    for k in range(seq.n_frames):
        img = np.zeros_like(seq.images[k]) if k in blackout else seq.images[k]
        if k == args.warmup:
            compiles_at_warmup = (counter.n, counter.n_event)
        t0 = time.perf_counter()
        T = slam.track_monocular(img, seq.timestamps[k])
        times.append(time.perf_counter() - t0)
        if args.pace_fps > 0:
            rem = 1.0 / args.pace_fps - times[-1]
            if rem > 0:
                time.sleep(rem)
        ok = T is not None
        frame_ok.append(ok)
        peak_points = max(peak_points, slam.map.n_map_points())
        peak_kfs = max(peak_kfs, slam.map.n_keyframes())
        if ok and k not in blackout:
            est.append(-T[:3, :3].T @ T[:3, 3])
            gt.append(-seq.poses_Rcw[k].T @ seq.poses_tcw[k])
        if k % 40 == 0:
            print(f"f{k:03d}: state={slam.get_tracking_state()} "
                  f"kfs={slam.map.n_keyframes()} mps={slam.map.n_map_points()} "
                  f"loops={slam.loop_closer.n_loops_closed} "
                  f"gba={slam.loop_closer.n_gba_runs} "
                  f"compiles={counter.n} t={times[-1]:.2f}s", flush=True)
    slam.shutdown()

    # ATE on the RESOLVED trajectory log (each frame re-based on its
    # reference keyframe's loop-corrected pose) — the reference's protocol:
    # main.cc saves after the run, evaluation reads the file, so pre-loop
    # frames carry the closure correction. (Also the only correct option in
    # pipelined mode, where per-call returns lag one frame.) The live
    # at-track-time poses are reported as ate_live_pct for drift visibility.
    from ceres_mono_orb_slam2_tpu.utils.synthetic import trajectory_positions

    est_r, gt_r, tracked = trajectory_positions(
        slam.tracker.trajectory, slam.map, seq.timestamps,
        seq.poses_Rcw, seq.poses_tcw, exclude=blackout)
    if args.pipelined:
        frame_ok = [False] * seq.n_frames
        for k in tracked:
            frame_ok[k] = True

    live_rmse = None
    if est and not args.pipelined:
        el, gl = np.stack(est), np.stack(gt)
        live_rmse = 100.0 * ate_rmse(el, gl) / max(
            float(np.linalg.norm(np.diff(gl, axis=0), axis=1).sum()), 1e-9)
    est_a, gt_a = est_r, gt_r
    rmse = ate_rmse(est_a, gt_a)
    traj = np.linalg.norm(np.diff(gt_a, axis=0), axis=1).sum()
    # tracked-rate over post-init, non-blackout frames; blackout frames and
    # the reloc frame right after are excluded (they are SUPPOSED to fail)
    first = frame_ok.index(True)
    graceperiod = set(range(args.blackout, args.blackout + 9)) if args.blackout else set()
    eligible = [i for i in range(first, seq.n_frames) if i not in graceperiod]
    n_ok = sum(frame_ok[i] for i in eligible)
    cw_total, cw_event = compiles_at_warmup or (0, 0)
    recompiles_total = counter.n - cw_total
    event_recompiles = counter.n_event - cw_event
    # steady-state contract: zero per-frame/per-keyframe loop compiles after
    # warmup. Loop-EVENT solves (sim3/EG/GBA) compile once per pow2 map-scale
    # bucket on the async mapper/GBA threads (the reference's background-GBA
    # analogue) and are reported separately, never hidden.
    recompiles = recompiles_total - event_recompiles
    steady = np.array(times[args.warmup:])
    report = {
        "frames": seq.n_frames,
        "resolution": f"{args.w}x{args.h}",
        "features": args.features,
        "motion": args.motion,
        "threaded": bool(args.threaded),
        "pace_fps": args.pace_fps,
        "local_kfs_cap": args.local_kfs,
        "vocab_words": int(voc.n_words),
        "median_fps": round(1.0 / float(np.median(steady)), 2),
        "mean_fps": round(1.0 / float(steady.mean()), 2),
        "first_tracked": first,
        "tracked_pct_post_init": round(100.0 * n_ok / len(eligible), 2),
        "blackout_recovered": bool(args.blackout == 0 or any(
            frame_ok[i] for i in range(args.blackout + 6, min(args.blackout + 12, seq.n_frames)))),
        "keyframes": slam.map.n_keyframes(),
        "map_points": slam.map.n_map_points(),
        "peak_map_points": peak_points,
        "peak_keyframes": peak_kfs,
        "pool_grows": slam.tracker._pool.n_grows if slam.tracker._pool else 0,
        "loops_closed": slam.loop_closer.n_loops_closed,
        "gba_runs": slam.loop_closer.n_gba_runs,
        "loop_detects": slam.loop_closer.n_detects,
        "loop_candidate_events": slam.loop_closer.n_candidate_events,
        # revisits can close through the COVISIBILITY graph instead of the
        # BoW loop path: with a wide HFOV the frontier view bridges the seam
        # and fuse re-binds old points, so the old keyframes become directly
        # connected — the reference then (correctly) refuses them as loop
        # candidates (KeyFrameDatabase.cc:80, spConnectedKeyFrames). A
        # long-range covisibility edge (id gap >= 30 keyframes) is the
        # measurable signature that the seam closed that way.
        "long_range_covis_edges": sum(
            1 for kf in slam.map.keyframes.values() if not kf.bad
            for nb in kf.covisible if kf.id - nb >= 30),
        "ate_rmse": round(float(rmse), 4),
        "traj_len": round(float(traj), 2),
        "ate_pct": round(100.0 * rmse / traj, 3),
        "ate_live_pct": round(float(live_rmse), 3) if live_rmse is not None else None,
        "median_track_s": round(float(np.median(times[args.warmup:])), 3),
        "p95_track_s": round(float(np.percentile(times[args.warmup:], 95)), 3),
        "compiles_warmup": cw_total,
        "recompiles_after_warmup": recompiles,
        "loop_event_compiles_after_warmup": event_recompiles,
        "last_compile": counter.last,
    }
    if recompiles_total > 0:
        # dump the post-warmup compile signatures (deduped, with counts) so
        # a broken zero-recompile contract is diagnosable from the artifact
        from collections import Counter as _Counter

        post = counter.messages[cw_total:]
        sig = _Counter(m[:120] for m in post)
        report["recompile_signatures"] = [
            {"n": c, "sig": s} for s, c in sig.most_common(20)]
    print(json.dumps(report, indent=1, default=float), flush=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1, default=float)

    ok = (report["tracked_pct_post_init"] >= 98.0
          and report["ate_pct"] < 1.0
          and report["blackout_recovered"]
          # the revisit must close SOMEHOW: either the BoW loop pipeline
          # fired, or the seam stitched through covisibility (long-range
          # edges) — see the long_range_covis_edges comment above
          and (report["loops_closed"] >= 1
               or report["long_range_covis_edges"] >= 1))
    if args.assert_zero_recompiles and recompiles > 0:
        print(f"ASSERTION FAILED: {recompiles} XLA compiles after the "
              f"warmup window (last: {counter.last})")
        ok = False
    print("ENDURANCE", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
