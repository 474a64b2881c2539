"""Diagnose spontaneous LOST transitions at the KITTI frame shape
(1241x376, 2000 features) seen in the round-5 endurance runs. Runs the
serial tracker over the same device-rendered circle sequence and dumps
per-frame stats (method, match counts, inlier counts) around every loss."""
import argparse
import faulthandler
import signal
import sys
import time

faulthandler.register(signal.SIGUSR2, all_threads=True)
# (a timed faulthandler dump was here during round-5 diagnosis; removed —
# the dump write resets watchdog_run.sh's mtime stall clock and every hang
# shows the same stack: the process's first device fetch, KNOWN_ISSUES)

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=160)
    ap.add_argument("--w", type=int, default=1241)
    ap.add_argument("--h", type=int, default=376)
    ap.add_argument("--features", type=int, default=2000)
    ap.add_argument("--step", type=float, default=0.06)
    ap.add_argument("--seed", type=int, default=11)
    ap.add_argument("--threaded", action="store_true")
    ap.add_argument("--prewarm", action="store_true")
    ap.add_argument("--pace-fps", type=float, default=0.0,
                    help="reference-style frame pacing (main.cc:97-106)")
    ap.add_argument("--ba-points", type=int, default=2048)
    ap.add_argument("--ba-obs", type=int, default=8192)
    ap.add_argument("--local-points", type=int, default=4096)
    args = ap.parse_args()

    from ceres_mono_orb_slam2_tpu.models.system import MonoSLAM
    from ceres_mono_orb_slam2_tpu.utils.config import (
        CameraConfig, ORBConfig, SlamConfig, StaticShapes)
    from ceres_mono_orb_slam2_tpu.utils.synthetic import (
        make_rendered_sequence_device, tunnel_canary)

    tunnel_canary()

    t0 = time.perf_counter()
    seq = make_rendered_sequence_device(
        n_frames=args.frames, h=args.h, w=args.w, fx=500.0, fy=500.0,
        seed=args.seed, motion="circle", step=args.step,
        cache_dir="/tmp/render_cache")
    print(f"sequence ready ({time.perf_counter()-t0:.0f}s)", flush=True)

    cfg = SlamConfig(
        camera=CameraConfig(fx=500.0, fy=500.0, cx=args.w / 2.0,
                            cy=args.h / 2.0, fps=30.0),
        orb=ORBConfig(n_features=args.features),
        shapes=StaticShapes(max_local_points=args.local_points,
                            max_local_keyframes=12,
                            max_ba_points=args.ba_points,
                            max_ba_obs=args.ba_obs),
    )
    slam = MonoSLAM(cfg, threaded=args.threaded)
    if args.prewarm:
        t0 = time.perf_counter()
        timings = slam.prewarm(args.h, args.w)
        print(f"prewarm: {timings}", flush=True)
    states = []
    for k in range(seq.n_frames):
        t0 = time.perf_counter()
        T = slam.track_monocular(seq.images[k], seq.timestamps[k])
        if args.pace_fps > 0:
            rem = 1.0 / args.pace_fps - (time.perf_counter() - t0)
            if rem > 0:
                time.sleep(rem)
        states.append(slam.get_tracking_state())
        if k % 20 == 0:
            print(f"f{k:03d}: {states[-1]} kfs={slam.map.n_keyframes()} "
                  f"mps={slam.map.n_map_points()}", flush=True)
    slam.shutdown()

    pm = slam.local_mapper.pass_ms
    if pm:
        print(f"\nmapper pass stage ms (median/p95 over {len(pm)} passes):")
        for k2 in ("process_new", "cull_mp", "triangulate", "fuse", "lba",
                   "cull_kf"):
            vals = [p[k2] for p in pm if k2 in p]
            if vals:
                print(f"  {k2}: {np.median(vals):.1f} / "
                      f"{np.percentile(vals, 95):.1f}")
        tot = [sum(v for kk, v in p.items() if kk != "kf") for p in pm]
        print(f"  TOTAL: {np.median(tot):.1f} / {np.percentile(tot, 95):.1f}")

    stats = slam.tracker.frame_stats
    fused = [s for s in stats if s.get("method") == "fused"
             and "fetch_ms" in s and s.get("track_ms")]
    if fused:
        med = lambda k2: float(np.median([s[k2] for s in fused]))  # noqa: E731
        cons = [s["track_ms"] - s.get("prepare_ms", 0)
                - s.get("dispatch_ms", 0) - s.get("fetch_ms", 0)
                for s in fused]
        print(f"\nfused-frame phase ms over {len(fused)} frames: "
              f"track={med('track_ms'):.1f} prepare={med('prepare_ms'):.1f} "
              f"dispatch={med('dispatch_ms'):.1f} fetch={med('fetch_ms'):.1f} "
              f"consume={float(np.median(cons)):.1f} "
              f"(p95 track={float(np.percentile([s['track_ms'] for s in fused], 95)):.1f})")

    # find loss events and print context
    lost_idx = [i for i, s in enumerate(stats) if not s.get("ok", True)]
    print(f"\n{len(lost_idx)} not-ok frames of {len(stats)}")
    shown = set()
    for li in lost_idx[:30]:
        for i in range(max(0, li - 3), min(len(stats), li + 2)):
            if i in shown:
                continue
            shown.add(i)
            s = stats[i]
            print(f"  f{s.get('frame_id')}: ok={s.get('ok')} "
                  f"method={s.get('method')} nkp={s.get('n_kp')} "
                  f"inl_frame={s.get('inliers_frame')} "
                  f"inl_local={s.get('inliers_local')} "
                  f"kfs={s.get('n_kfs')} mps={s.get('n_mps')} "
                  f"extras={ {k2: v for k2, v in s.items() if k2 not in ('frame_id','ok','method','n_kp','inliers_frame','inliers_local','n_kfs','n_mps','timestamp','track_ms','phase_ms')} }",
                  flush=True)
        print("  --")


if __name__ == "__main__":
    main()
