"""Per-frame phase breakdown of the full-system bench (VERDICT r4 item #1).

Runs the exact bench_full_system config (150 cached frames, 1500 features,
threaded) and prints where each frame's wall time goes: prepare (host arg
marshalling), dispatch (jit call = upload + launch), fetch (blocking control
device_get: device compute + tunnel RTT), consume (host bookkeeping +
keyframe work), and flags compile events + keyframe frames.

Usage: python tools/prof_system.py [--frames 150] [--pipelined]
"""

import argparse
import json
import logging
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


class CompileCounter(logging.Handler):
    def __init__(self):
        super().__init__()
        self.n = 0
        self.events = []

    def emit(self, record):
        msg = record.getMessage()
        if msg.startswith("Compiling"):
            self.n += 1
            self.events.append(msg[:110])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=150)
    ap.add_argument("--pipelined", action="store_true")
    ap.add_argument("--skip", type=int, default=10)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_log_compiles", True)
    counter = CompileCounter()
    for name in ("jax._src.dispatch", "jax._src.interpreters.pxla", "jax"):
        logging.getLogger(name).addHandler(counter)
        logging.getLogger(name).setLevel(logging.WARNING)

    from ceres_mono_orb_slam2_tpu.models.system import MonoSLAM
    from ceres_mono_orb_slam2_tpu.utils.config import (
        CameraConfig, ORBConfig, SlamConfig, StaticShapes)
    from ceres_mono_orb_slam2_tpu.utils.synthetic import make_sequence

    seq = make_sequence(n_frames=args.frames, motion="strafe", step=0.06,
                        seed=11)
    config = SlamConfig(
        camera=CameraConfig(fx=500.0, fy=500.0, cx=320.0, cy=240.0, fps=30.0),
        orb=ORBConfig(n_features=1500),
        shapes=StaticShapes(max_local_points=4096, max_local_keyframes=12,
                            max_ba_points=1024, max_ba_obs=4096))
    slam = MonoSLAM(config, threaded=True, pipelined=args.pipelined)

    rows = []
    for k in range(seq.n_frames):
        nc0 = counter.n
        nkf0 = slam.map.n_keyframes()
        t0 = time.perf_counter()
        slam.track_monocular(seq.images[k], seq.timestamps[k])
        wall = (time.perf_counter() - t0) * 1e3
        st = slam.tracker.frame_stats[-1] if slam.tracker.frame_stats else {}
        rows.append(dict(
            k=k, wall=wall, compiles=counter.n - nc0,
            kf=slam.map.n_keyframes() - nkf0,
            method=st.get("method"),
            prepare=st.get("prepare_ms"), dispatch=st.get("dispatch_ms"),
            fetch=st.get("fetch_ms"), track=st.get("track_ms")))
    slam.shutdown()

    body = [r for r in rows if r["k"] >= args.skip]

    def q(xs, p):
        xs = sorted(x for x in xs if x is not None)
        return xs[min(len(xs) - 1, int(p * len(xs)))] if xs else None

    def line(tag, sel):
        xs = [r for r in body if sel(r)]
        if not xs:
            print(f"{tag:28s} (none)")
            return
        w = [r["wall"] for r in xs]
        print(f"{tag:28s} n={len(xs):3d} wall p50={q(w,.5):7.1f} "
              f"mean={np.mean(w):7.1f} p95={q(w,.95):7.1f} ms | "
              f"prep={q([r['prepare'] for r in xs],.5) or 0:5.1f} "
              f"disp={q([r['dispatch'] for r in xs],.5) or 0:5.1f} "
              f"fetch={q([r['fetch'] for r in xs],.5) or 0:6.1f}")

    line("all frames", lambda r: True)
    line("normal (no kf, no compile)",
         lambda r: r["kf"] == 0 and r["compiles"] == 0)
    line("keyframe frames", lambda r: r["kf"] > 0)
    line("compile frames", lambda r: r["compiles"] > 0)

    walls = sorted(r["wall"] for r in body)
    total = sum(r["wall"] for r in body) / 1e3
    print(f"median_fps={1e3/walls[len(walls)//2]:.2f} "
          f"aggregate_fps={len(body)/total:.2f} "
          f"compiles_total={counter.n} "
          f"compiles_after_skip={sum(r['compiles'] for r in body)} "
          f"kfs={sum(r['kf'] for r in body)}")
    slow = sorted(body, key=lambda r: -r["wall"])[:12]
    for r in slow:
        print("slow:", json.dumps({k: (round(v, 1) if isinstance(v, float)
                                       else v) for k, v in r.items()}))
    for e in counter.events[-15:]:
        print("compile:", e)


if __name__ == "__main__":
    main()
