"""Instrumented full-system run: where does the wall time actually go?

Drives the exact bench_full_system configuration (150-frame rendered
sequence, threaded MonoSLAM) with:
  - per-frame wall times (and which frames are keyframe frames),
  - per-mapper-stage timers (process/cull/triangulate/fuse/LBA/kf-cull),
  - XLA compile events with timestamps + durations (jax_log_compiles),
  - tracker phase timers (prepare/dispatch/fetch/consume).

Usage: python tools/prof_full_system.py [--frames 150] [--pipelined]
Writes a JSON report to /tmp/prof_full_system.json and prints a summary.
"""

import argparse
import json
import logging
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=150)
    ap.add_argument("--pipelined", action="store_true")
    ap.add_argument("--threaded", action="store_true", default=True)
    ap.add_argument("--no-threaded", dest="threaded", action="store_false")
    ap.add_argument("--out", default="/tmp/prof_full_system.json")
    args = ap.parse_args()

    import jax

    compile_events = []
    # count REAL compiles (persistent-cache misses) vs cache-hit loads via
    # the compiler module's DEBUG records only — enabling DEBUG on the whole
    # jax logger tree floods a 1-core host with per-dispatch records and
    # poisons every timing
    class CompileHandler(logging.Handler):
        def emit(self, record):
            msg = record.getMessage()
            if "PERSISTENT COMPILATION CACHE" in msg:
                compile_events.append((time.perf_counter(), msg))

    h = CompileHandler()
    lg = logging.getLogger("jax._src.compiler")
    lg.addHandler(h)
    lg.setLevel(logging.DEBUG)
    lg.propagate = False

    from ceres_mono_orb_slam2_tpu.models.system import MonoSLAM
    from ceres_mono_orb_slam2_tpu.models import localmapping, tracking
    from ceres_mono_orb_slam2_tpu.utils.config import (
        CameraConfig, ORBConfig, SlamConfig, StaticShapes)
    from ceres_mono_orb_slam2_tpu.utils.synthetic import make_sequence

    # ---- stage timers via wrapping -------------------------------------
    stage_times = {}  # name -> list of (t_start_rel, dur)
    t_origin = time.perf_counter()

    def wrap(cls, name):
        orig = getattr(cls, name)

        def timed(self, *a, **kw):
            t0 = time.perf_counter()
            r = orig(self, *a, **kw)
            stage_times.setdefault(name, []).append(
                (t0 - t_origin, time.perf_counter() - t0))
            return r
        setattr(cls, name, timed)

    for nm in ("_process_new_keyframe", "_map_point_culling",
               "_create_new_map_points", "_search_in_neighbors",
               "_local_bundle_adjustment", "_keyframe_culling"):
        wrap(localmapping.LocalMapping, nm)
    for nm in ("_fused_prepare", "_fused_consume", "_local_block",
               "_track_local_map", "_track_reference_keyframe",
               "build_frame", "_create_new_keyframe"):
        wrap(tracking.Tracking, nm)

    # time the device dispatch+fetch inside _fused_finish separately
    orig_finish = tracking.Tracking._fused_finish

    def timed_finish(self, args, aux):
        t0 = time.perf_counter()
        r = orig_finish(self, args, aux)
        stage_times.setdefault("_fused_finish_total", []).append(
            (t0 - t_origin, time.perf_counter() - t0))
        return r
    tracking.Tracking._fused_finish = timed_finish

    # attribute every device_get sync to its caller (the sync is the ~26 ms
    # unit cost on the tunnel; count them per call site)
    orig_get = jax.device_get

    def timed_get(x):
        t0 = time.perf_counter()
        r = orig_get(x)
        caller = sys._getframe(1).f_code.co_name
        stage_times.setdefault(f"get:{caller}", []).append(
            (t0 - t_origin, time.perf_counter() - t0))
        return r
    jax.device_get = timed_get

    # time the frontend jit-call (dispatch) separately from the fetch
    orig_ensure = tracking.Tracking._ensure_frontend

    def timed_ensure(self, h, w):
        fe = orig_ensure(self, h, w)
        if fe is None or getattr(self, "_fe_wrapped", False):
            return fe

        def wrapped(*a, **kw):
            t0 = time.perf_counter()
            r = fe(*a, **kw)
            stage_times.setdefault("frontend_dispatch", []).append(
                (t0 - t_origin, time.perf_counter() - t0))
            return r
        self._frontend = wrapped
        self._fe_wrapped = True
        return wrapped
    tracking.Tracking._ensure_frontend = timed_ensure

    seq = make_sequence(n_frames=args.frames, motion="strafe", step=0.06, seed=11)
    config = SlamConfig(
        camera=CameraConfig(fx=500.0, fy=500.0, cx=320.0, cy=240.0, fps=30.0),
        orb=ORBConfig(n_features=1500),
        shapes=StaticShapes(max_local_points=4096, max_local_keyframes=12,
                            max_ba_points=1024, max_ba_obs=4096),
    )
    slam = MonoSLAM(config, threaded=args.threaded, pipelined=args.pipelined)
    frame_rows = []
    for k in range(seq.n_frames):
        nkf0 = slam.map.n_keyframes()
        t0 = time.perf_counter()
        slam.track_monocular(seq.images[k], seq.timestamps[k])
        dt = time.perf_counter() - t0
        frame_rows.append({"k": k, "t_rel": t0 - t_origin, "dt": dt,
                           "kf": slam.map.n_keyframes() != nkf0,
                           "n_kf": slam.map.n_keyframes()})
    n_kf = slam.map.n_keyframes()
    slam.shutdown()

    report = {
        "frames": frame_rows,
        "stages": {k: v for k, v in stage_times.items()},
        "compiles": [(t - t_origin, m[:200]) for t, m in compile_events],
        "n_kf": n_kf,
        "pipelined": args.pipelined,
    }
    with open(args.out, "w") as f:
        json.dump(report, f)

    # ---- summary --------------------------------------------------------
    dts = np.array([r["dt"] for r in frame_rows[10:]])
    print(f"\n=== {len(frame_rows)} frames, {n_kf} keyframes ===")
    print(f"median {np.median(dts)*1e3:.1f} ms  mean {dts.mean()*1e3:.1f} ms  "
          f"p95 {np.percentile(dts, 95)*1e3:.1f} ms  max {dts.max()*1e3:.1f} ms")
    print(f"median fps {1/np.median(dts):.2f}  aggregate fps {len(dts)/dts.sum():.2f}")
    kf_dts = np.array([r["dt"] for r in frame_rows[10:] if r["kf"]])
    nk_dts = np.array([r["dt"] for r in frame_rows[10:] if not r["kf"]])
    if len(kf_dts):
        print(f"keyframe frames: n={len(kf_dts)} median {np.median(kf_dts)*1e3:.1f} ms "
              f"sum {kf_dts.sum():.2f} s")
    if len(nk_dts):
        print(f"normal frames:   n={len(nk_dts)} median {np.median(nk_dts)*1e3:.1f} ms "
              f"sum {nk_dts.sum():.2f} s")
    miss = [e for e in report["compiles"] if "MISS" in e[1]]
    hit = [e for e in report["compiles"] if "MISS" not in e[1]]
    print(f"\ncompile events: {len(miss)} cache misses, {len(hit)} cache hits")
    if len(frame_rows) > 10:
        t10 = frame_rows[10]["t_rel"]
        late = [(t, m) for t, m in miss if t > t10]
        print(f"cache MISSES after warmup (frame 10): {len(late)}")
        for t, m in late[:40]:
            print(f"  t={t:8.1f}s  {m[:140]}")
    print("\nstage totals (seconds):")
    for k in sorted(stage_times, key=lambda k: -sum(d for _, d in stage_times[k])):
        v = stage_times[k]
        tot = sum(d for _, d in v)
        print(f"  {k:28s} n={len(v):4d} total={tot:7.2f}s mean={tot/len(v)*1e3:7.1f}ms "
              f"max={max(d for _, d in v)*1e3:7.1f}ms")


if __name__ == "__main__":
    main()
