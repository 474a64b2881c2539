"""mono_slam CLI (reference src/main.cc).

Usage:
    python -m ceres_mono_orb_slam2_tpu.cli --config configs/TUM2.yaml \
        --images /data/rgbd_dataset_freiburg2_desk [--voc ORBvoc.txt] \
        [--output-dir out] [--realtime] [--synthetic N]

Mirrors the reference driver: loads the image list, optionally paces playback
to the timestamps (main.cc:97-106), feeds frames to the system, prints the
median/mean tracking time at exit (main.cc:111-118), and saves the TUM-format
keyframe trajectory + map snapshot.
"""

from __future__ import annotations

import argparse
import logging
import os
import time

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description="TPU-native monocular ORB-SLAM")
    ap.add_argument("--config", required=True, help="camera/ORB YAML (reference configs/*.yaml format)")
    ap.add_argument("--images", help="dataset directory (TUM/KITTI/EuRoC auto-detected)")
    ap.add_argument("--voc", help="ORBvoc.txt vocabulary (enables loop closing + relocalization)")
    ap.add_argument("--train-voc-frames", type=int, default=0,
                    help="train a vocabulary from the first N frames instead of --voc")
    ap.add_argument("--output-dir", default=".")
    ap.add_argument("--realtime", action="store_true", help="pace playback to timestamps")
    ap.add_argument("--max-frames", type=int, default=0)
    ap.add_argument("--synthetic", type=int, default=0, help="run on N synthetic frames instead of --images")
    ap.add_argument("--localization", action="store_true", help="localization-only mode")
    ap.add_argument("--load-map", help="load a previously saved map.npz before "
                    "tracking (pairs with --localization to relocalize against "
                    "a prebuilt map; the reference lists LoadMap as a TODO, "
                    "MonoORBSlam.h:78-81)")
    ap.add_argument("--viewer", action="store_true", help="save periodic map snapshots")
    ap.add_argument("--live-viewer", type=int, default=None, metavar="PORT",
                    help="serve the interactive map/frame viewer with the "
                         "Pangolin-menu controls on this HTTP port (0 = ephemeral)")
    ap.add_argument("--threaded", action="store_true",
                    help="run mapping/loop-closing on a worker thread (reference architecture)")
    ap.add_argument("--pipelined", action="store_true",
                    help="pipelined tracking: dispatch each frame before fetching the "
                         "previous frame's results (hides device round-trip latency; "
                         "poses report with one frame of latency)")
    ap.add_argument("--stats-out", help="write per-frame structured stats as JSONL")
    ap.add_argument("--profile-dir", help="capture a jax profiler trace of the run")
    args = ap.parse_args(argv)

    logging.basicConfig(level=logging.INFO, format="%(levelname)s %(name)s: %(message)s")
    from ceres_mono_orb_slam2_tpu.models.system import MonoSLAM
    from ceres_mono_orb_slam2_tpu.utils.config import load_config

    config = load_config(args.config)

    if args.synthetic:
        from ceres_mono_orb_slam2_tpu.utils.synthetic import make_sequence

        # the synthetic renderer is an ideal pinhole with the principal point
        # at the image center: align the config's camera to what is rendered
        for k in ("k1", "k2", "p1", "p2", "k3"):
            setattr(config.camera, k, 0.0)
        config.camera.cx, config.camera.cy = 320.0, 240.0
        # the synthetic world's level-0 corner density needs ~1500 features to
        # clear the reference's 100-match initialization gate (real datasets
        # with the configured budget are unaffected)
        import dataclasses as _dc

        from ceres_mono_orb_slam2_tpu.utils.config import SlamConfig as _SC, StaticShapes as _SS

        n_feat = max(config.orb.n_features, 1500)
        # demo-sized BA/matching buffers: the production defaults (96-KF
        # windows, 32k observations) take minutes of XLA compile time that a
        # short demo never amortizes
        config = _SC(
            camera=config.camera,
            orb=_dc.replace(config.orb, n_features=n_feat),
            viewer=config.viewer,
            shapes=_SS(max_local_points=4096, max_local_keyframes=12,
                       max_ba_points=2048, max_ba_obs=8192),
        )
        seq = make_sequence(
            n_frames=args.synthetic, fx=config.camera.fx, fy=config.camera.fy, step=0.12
        )
        frames = [(seq.images[i], seq.timestamps[i]) for i in range(seq.n_frames)]
    else:
        from ceres_mono_orb_slam2_tpu.utils.datasets import load_auto

        ds = load_auto(args.images)
        n = len(ds) if not args.max_frames else min(len(ds), args.max_frames)
        # native C++ prefetch loader: decodes ahead of the tracker
        frames = ds.iter_prefetch(n)

    vocabulary = None
    if args.voc:
        from ceres_mono_orb_slam2_tpu.ops.bow import parse_orbvoc_text

        vocabulary = parse_orbvoc_text(args.voc)

    slam = MonoSLAM(config, vocabulary=vocabulary, use_viewer=args.viewer,
                    threaded=args.threaded, live_viewer_port=args.live_viewer,
                    pipelined=args.pipelined)
    if args.load_map:
        slam.load_map(args.load_map)
    if args.localization:
        slam.activate_localization_mode()

    profiler_ctx = None
    if args.profile_dir:
        import jax

        profiler_ctx = jax.profiler.trace(args.profile_dir)
        profiler_ctx.__enter__()

    track_times = []
    last_ts = None
    n_frames = 0
    for img, ts in frames:
        t0 = time.perf_counter()
        slam.track_monocular(img, ts)
        dt = time.perf_counter() - t0
        track_times.append(dt)
        n_frames += 1
        if args.realtime and last_ts is not None:
            gap = ts - last_ts
            if dt < gap:
                time.sleep(gap - dt)
        last_ts = ts

    slam.shutdown()
    if profiler_ctx is not None:
        profiler_ctx.__exit__(None, None, None)
        print("profiler trace written to", args.profile_dir)
    tt = np.sort(np.array(track_times))
    # reference prints median and mean tracking time at exit (main.cc:111-118)
    print("-------")
    print("median tracking time: %.6f" % float(np.median(tt)))
    print("mean tracking time: %.6f" % float(np.mean(tt)))
    print("tracked %d frames, state %s, %d keyframes, %d map points"
          % (n_frames, slam.get_tracking_state(), slam.map.n_keyframes(), slam.map.n_map_points()))

    os.makedirs(args.output_dir, exist_ok=True)
    slam.save_keyframe_trajectory_tum(os.path.join(args.output_dir, "KeyFrameTrajectory.txt"))
    slam.save_frame_trajectory_tum(os.path.join(args.output_dir, "FrameTrajectory.txt"))
    slam.save_map(os.path.join(args.output_dir, "map.npz"))
    # reference-format OpenCV-YAML dump as well (main.cc:121 SaveMap("map.yaml"))
    slam.save_map_yaml(os.path.join(args.output_dir, "map.yaml"))
    if args.stats_out:
        import json

        with open(args.stats_out, "w") as f:
            for rec in slam.tracker.frame_stats:
                f.write(json.dumps(rec) + "\n")
        print("per-frame stats written to", args.stats_out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
