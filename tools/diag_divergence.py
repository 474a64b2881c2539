"""Divergence diagnostic: run a synthetic sequence, log per-frame pose vs GT.

KNOWN_ISSUES #1: tracking diverges geometrically at frame ~13-16. This tool
replays the scenario with per-frame instrumentation and supports
single-ingredient substitutions via flags:
  --no-velocity      : disable constant-velocity prediction (always track refKF)
  --frames N         : sequence length
  --motion strafe|forward|orbit
  --step S, --seed K
Run on TPU (default platform) for speed; CPU with JAX_PLATFORMS=cpu.
"""

import argparse
import sys

sys.path.insert(0, "/root/repo")

import numpy as np

from ceres_mono_orb_slam2_tpu.models.system import MonoSLAM
from ceres_mono_orb_slam2_tpu.utils.config import CameraConfig, ORBConfig, SlamConfig, StaticShapes
from ceres_mono_orb_slam2_tpu.utils.synthetic import ate_rmse, make_sequence


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--motion", default="strafe")
    ap.add_argument("--step", type=float, default=0.12)
    ap.add_argument("--seed", type=int, default=11)
    ap.add_argument("--no-velocity", action="store_true")
    ap.add_argument("--no-new-points", action="store_true",
                    help="disable CreateNewMapPoints (track init map only)")
    ap.add_argument("--no-lba", action="store_true",
                    help="disable local bundle adjustment")
    ap.add_argument("--no-fuse", action="store_true",
                    help="disable SearchInNeighbors fusion")
    ap.add_argument("--features", type=int, default=1500)
    args = ap.parse_args()

    cfg = SlamConfig(
        camera=CameraConfig(fx=500.0, fy=500.0, cx=320.0, cy=240.0, fps=30.0),
        orb=ORBConfig(n_features=args.features),
        shapes=StaticShapes(
            max_local_points=2048, max_local_keyframes=12,
            max_ba_points=1024, max_ba_obs=4096,
        ),
    )
    seq = make_sequence(n_frames=args.frames, seed=args.seed, motion=args.motion, step=args.step)
    slam = MonoSLAM(cfg)
    tr = slam.tracker

    if args.no_velocity:
        # single-ingredient substitution: never use the motion model
        orig = tr._track_with_motion_model
        tr._track_with_motion_model = lambda: False
    if args.no_new_points:
        slam.local_mapper._create_new_map_points = lambda kf: None
    if args.no_lba:
        slam.local_mapper._local_bundle_adjustment = lambda kf: None
    if args.no_fuse:
        slam.local_mapper._search_in_neighbors = lambda kf: None

    gt_c = seq.gt_centers()
    est_cs, gt_cs = [], []
    scale = None
    prev_c = None
    for k in range(seq.n_frames):
        n_kfs_before = slam.map.n_keyframes()
        Tcw = slam.track_monocular(seq.images[k], seq.timestamps[k])
        ev = []
        if slam.map.n_keyframes() > n_kfs_before and n_kfs_before > 0:
            ev.append("KF+")
        if Tcw is None:
            print(f"f{k:03d} state={tr.state.name} [no pose] {' '.join(ev)}")
            continue
        Rcw, tcw = Tcw[:3, :3], Tcw[:3, 3]
        c = -Rcw.T @ tcw
        est_cs.append(c)
        gt_cs.append(gt_c[k])
        if scale is None and len(est_cs) >= 2:
            d_est = np.linalg.norm(est_cs[-1] - est_cs[0])
            d_gt = np.linalg.norm(gt_cs[-1] - gt_cs[0])
            if d_est > 1e-9:
                scale = d_gt / d_est
        step_est = np.linalg.norm(c - prev_c) * (scale or 1.0) if prev_c is not None else 0.0
        step_gt = np.linalg.norm(gt_c[k] - gt_c[k - 1]) if k > 0 else 0.0
        prev_c = c
        vel = tr.velocity
        vnorm = np.linalg.norm(vel[1]) * (scale or 1.0) if vel is not None else -1
        err = 0.0
        if scale is not None and len(est_cs) >= 3:
            e = np.stack(est_cs)
            g = np.stack(gt_cs)
            err = ate_rmse(e, g)
        print(
            f"f{k:03d} state={tr.state.name} inl={tr.matches_inliers:4d} "
            f"step_est={step_est:.4f} step_gt={step_gt:.4f} "
            f"ratio={step_est / max(step_gt, 1e-9):6.2f} |v|={vnorm:.4f} "
            f"kfs={slam.map.n_keyframes()} mps={slam.map.n_map_points()} "
            f"ate={err:.4f} {' '.join(ev)}"
        )

    if len(est_cs) >= 3:
        print("\nfinal ATE (sim3-aligned):", ate_rmse(np.stack(est_cs), np.stack(gt_cs)))
        traj = np.linalg.norm(np.diff(np.stack(gt_cs), axis=0), axis=1).sum()
        print("trajectory length:", traj)


if __name__ == "__main__":
    main()
