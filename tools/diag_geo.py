"""Frontend-bypass divergence diagnostic.

Runs the FULL tracking/mapping pipeline on synthetic landmark observations:
3D points projected with ground-truth poses, each landmark carrying a fixed
random 256-bit descriptor (near-perfect matching). No images, no ORB
extractor — isolates the estimation loop (motion model, windowed matching,
pose opt, triangulation, LBA, culling, KF cadence) from the image frontend.

If the frame-~14 divergence (KNOWN_ISSUES #1) reproduces here, the bug is in
core estimation; if not, it's in the image frontend path.

Flags mirror tools/diag_divergence.py plus:
  --px-noise S  : keypoint measurement noise sigma in pixels (default 0.3)
  --bit-noise B : descriptor bits flipped per observation (default 2)
"""

import argparse
import os
import sys

sys.path.insert(0, "/root/repo")

if os.environ.get("CERES_TPU_POSE_F64"):
    import jax

    jax.config.update("jax_enable_x64", True)

import numpy as np

from ceres_mono_orb_slam2_tpu.models.system import MonoSLAM
from ceres_mono_orb_slam2_tpu.utils.config import CameraConfig, ORBConfig, SlamConfig, StaticShapes
from ceres_mono_orb_slam2_tpu.utils.synthetic import ate_rmse

import jax.numpy as jnp


from ceres_mono_orb_slam2_tpu.utils.geosim import (  # noqa: E402
    GeoExtractor, GeoWorld, frame_image, make_geo_trajectory)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--motion", default="strafe")
    ap.add_argument("--step", type=float, default=0.12)
    ap.add_argument("--seed", type=int, default=11)
    ap.add_argument("--features", type=int, default=1000)
    ap.add_argument("--landmarks", type=int, default=4000)
    ap.add_argument("--px-noise", type=float, default=0.3)
    ap.add_argument("--bit-noise", type=int, default=2)
    ap.add_argument("--no-velocity", action="store_true")
    ap.add_argument("--no-new-points", action="store_true")
    ap.add_argument("--no-lba", action="store_true")
    ap.add_argument("--no-fuse", action="store_true")
    ap.add_argument("--no-culling", action="store_true")
    ap.add_argument("--max-local-kfs", type=int, default=12)
    ap.add_argument("--max-local-points", type=int, default=4096)
    ap.add_argument("--max-ba-points", type=int, default=1024)
    ap.add_argument("--max-ba-obs", type=int, default=4096)
    ap.add_argument("--pose-rounds", type=int, default=None,
                    help="override pose-opt trimming rounds")
    ap.add_argument("--vocab", action="store_true",
                    help="train a BoW vocabulary (enables loop closing)")
    ap.add_argument("--dump-solves", default=None,
                    help="directory to dump per-call pose-solve inputs")
    args = ap.parse_args()

    h, w = 480, 640
    cfg = SlamConfig(
        camera=CameraConfig(fx=500.0, fy=500.0, cx=320.0, cy=240.0, fps=30.0),
        orb=ORBConfig(n_features=args.features),
        shapes=StaticShapes(
            max_local_points=args.max_local_points, max_local_keyframes=args.max_local_kfs,
            max_ba_points=args.max_ba_points, max_ba_obs=args.max_ba_obs,
        ),
    )
    rng = np.random.default_rng(args.seed)
    Rcw, tcw = make_geo_trajectory(args.frames, args.motion, args.step)
    extent = max(args.frames * args.step * 1.5, 10.0)
    world = GeoWorld(rng, args.landmarks, extent,
                     shape="ring" if args.motion == "circle" else "box")

    voc = None
    if args.vocab:
        from ceres_mono_orb_slam2_tpu.ops import bow

        voc = bow.train_vocabulary(world.desc[:2000], k=8, levels=3, seed=0)
    slam = MonoSLAM(cfg, vocabulary=voc)
    slam.tracker.extractor = GeoExtractor(
        world, cfg.camera.K, Rcw, tcw, args.features, h, w,
        px_noise=args.px_noise, bit_noise=args.bit_noise, seed=args.seed,
    )
    tr = slam.tracker
    if args.pose_rounds is not None:
        import functools
        from ceres_mono_orb_slam2_tpu.ops import optim as _optim

        orig_po = _optim.pose_optimization
        _optim.pose_optimization = functools.partial(orig_po, rounds=args.pose_rounds)
    if args.no_velocity:
        tr._track_with_motion_model = lambda: False
    if args.no_new_points:
        slam.local_mapper._create_new_map_points = lambda kf: None
    if args.no_lba:
        slam.local_mapper._local_bundle_adjustment = lambda kf: None
    if args.no_fuse:
        slam.local_mapper._search_in_neighbors = lambda kf: None
    if args.no_culling:
        slam.local_mapper._map_point_culling = lambda kf: None
        slam.local_mapper._keyframe_culling = lambda kf: None
    if args.dump_solves:
        os.makedirs(args.dump_solves, exist_ok=True)
        orig_opt = tr._pose_optimize
        counter = [0, -1]

        def dumping_opt(frame):
            pos, ok = tr._gather_frame_points(frame)
            k = tr.extractor.last_frame_idx
            if counter[1] != k:
                counter[0] = 0
                counter[1] = k
            np.savez(
                os.path.join(args.dump_solves, f"f{k:03d}_c{counter[0]}.npz"),
                pos=pos, ok=ok, uv=frame.kp_und, octave=frame.kp_octave,
                Rinit=frame.Rcw, tinit=frame.tcw,
                Rgt=Rcw[k], tgt=tcw[k], mp_ids=frame.mp_ids,
            )
            counter[0] += 1
            return orig_opt(frame)

        tr._pose_optimize = dumping_opt

    gt_c = np.einsum("tij,tj->ti", Rcw.transpose(0, 2, 1), -tcw)
    est_cs, gt_cs = [], []
    scale = None
    prev_c = None
    mp_lm = {}  # map-point id -> landmark id (first association)

    def umeyama_scale(est, gt):
        """similarity scale + post-alignment RMS between paired point sets"""
        ce, cg = est.mean(0), gt.mean(0)
        e0, g0 = est - ce, gt - cg
        s = np.sqrt((g0 ** 2).sum() / max((e0 ** 2).sum(), 1e-12))
        U, _, Vt = np.linalg.svd(g0.T @ e0)
        D = np.diag([1, 1, np.sign(np.linalg.det(U @ Vt))])
        Rr = U @ D @ Vt
        rms = np.sqrt(np.mean(np.sum(((s * (Rr @ e0.T)).T - g0) ** 2, -1)))
        return s, rms

    def map_diag(frame, k):
        """associate map points to GT landmarks through this frame's slots;
        returns (conflicts, s_all, rms_all, s_recent, n_recent)"""
        ex = slam.tracker.extractor
        slot_lm = ex.slot_lm_by_frame.get(k)
        conflicts = 0
        if slot_lm is not None:
            for i in np.nonzero(frame.mp_ids >= 0)[0]:
                lm = int(slot_lm[i])
                if lm < 0:
                    continue
                mid = int(frame.mp_ids[i])
                if mid in mp_lm and mp_lm[mid] != lm:
                    conflicts += 1
                else:
                    mp_lm[mid] = lm
        est, gt, recent_mask = [], [], []
        latest_kf = max(slam.map.keyframes) if slam.map.keyframes else 0
        for mid, lm in mp_lm.items():
            mp = slam.map.get_mp(mid)
            if mp is None:
                continue
            est.append(mp.pos)
            gt.append(world.pos[lm])
            recent_mask.append(mp.first_kf_id >= latest_kf - 1)
        if len(est) < 8:
            return conflicts, 0.0, 0.0, 0.0, 0
        est = np.stack(est)
        gt = np.stack(gt)
        recent_mask = np.array(recent_mask)
        s_all, rms_all = umeyama_scale(est, gt)
        s_recent, n_recent = 0.0, int(recent_mask.sum())
        if n_recent >= 8:
            s_recent, _ = umeyama_scale(est[recent_mask], gt[recent_mask])
        return conflicts, s_all, rms_all, s_recent, n_recent

    for k in range(args.frames):
        img = np.zeros((h, w), np.float32)
        img[0, 0] = k
        Tcw = slam.track_monocular(img, k / 30.0)
        if Tcw is None:
            print(f"f{k:03d} state={tr.state.name} [no pose]")
            continue
        c = -Tcw[:3, :3].T @ Tcw[:3, 3]
        est_cs.append(c)
        gt_cs.append(gt_c[k])
        if scale is None and len(est_cs) >= 2:
            d_est = np.linalg.norm(est_cs[-1] - est_cs[0])
            if d_est > 1e-9:
                scale = np.linalg.norm(gt_cs[-1] - gt_cs[0]) / d_est
        step_est = np.linalg.norm(c - prev_c) * (scale or 1.0) if prev_c is not None else 0.0
        step_gt = np.linalg.norm(gt_c[k] - gt_c[k - 1]) if k > 0 else 0.0
        prev_c = c
        err = ate_rmse(np.stack(est_cs), np.stack(gt_cs)) if scale is not None and len(est_cs) >= 3 else 0.0
        confl, s_all, rms_all, s_recent, n_recent = map_diag(tr.current, k)
        print(
            f"f{k:03d} state={tr.state.name} inl={tr.matches_inliers:4d} "
            f"step_est={step_est:.4f} step_gt={step_gt:.4f} "
            f"ratio={step_est / max(step_gt, 1e-9):6.2f} "
            f"kfs={slam.map.n_keyframes()} mps={slam.map.n_map_points()} ate={err:.4f} "
            f"confl={confl} s_map={s_all:.4f} rms={rms_all:.4f} "
            f"s_new={s_recent:.4f}/{n_recent}"
        )

    if len(est_cs) >= 3:
        traj = np.linalg.norm(np.diff(np.stack(gt_cs), axis=0), axis=1).sum()
        print("\nfinal ATE (sim3-aligned):", ate_rmse(np.stack(est_cs), np.stack(gt_cs)))
        print("trajectory length:", traj)
    if slam.loop_closer is not None:
        print("loops closed:", slam.loop_closer.n_loops_closed)


if __name__ == "__main__":
    main()
