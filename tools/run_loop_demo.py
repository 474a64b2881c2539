"""Full-system loop-closure demo on RENDERED images: a camera circles inside
a textured ring world and revisits its start; the live pipeline must detect
the loop (BoW), verify it (Horn RANSAC + sim3 LM), correct the map (Sim3
propagation + SearchAndFuse), and distribute the error (essential graph +
global BA). Prints per-frame tracking and a final report.

Usage:  python tools/run_loop_demo.py [--frames 110] [--step 0.06]
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from ceres_mono_orb_slam2_tpu.models.system import MonoSLAM
from ceres_mono_orb_slam2_tpu.ops import bow
from ceres_mono_orb_slam2_tpu.ops.orb import ORBExtractor
from ceres_mono_orb_slam2_tpu.utils.config import CameraConfig, ORBConfig, SlamConfig, StaticShapes
from ceres_mono_orb_slam2_tpu.utils.synthetic import ate_rmse, make_sequence


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=110)
    ap.add_argument("--step", type=float, default=0.06)
    ap.add_argument("--seed", type=int, default=11)
    ap.add_argument("--features", type=int, default=1500)
    ap.add_argument("--debug-loop", action="store_true")
    ap.add_argument("--synth-voc-levels", type=int, default=0,
                    help="use a structure-generated k=10 ORBvoc-scale vocabulary "
                         "of this depth instead of the corpus-trained one "
                         "(6 = the reference's 1M-word ORBvoc shape)")
    args = ap.parse_args()

    seq = make_sequence(n_frames=args.frames, seed=args.seed, motion="circle", step=args.step)
    cfg = SlamConfig(
        camera=CameraConfig(fx=500.0, fy=500.0, cx=320.0, cy=240.0, fps=30.0),
        orb=ORBConfig(n_features=args.features),
        shapes=StaticShapes(max_local_points=4096, max_local_keyframes=12,
                            max_ba_points=2048, max_ba_obs=8192),
    )
    # vocabulary from a multi-frame corpus (the reference's ORBvoc is trained
    # on a large image corpus; a single-frame 512-word vocab is too weak for
    # place recognition and floods detection with false candidates)
    if args.synth_voc_levels:
        voc = bow.synth_vocabulary(k=10, levels=args.synth_voc_levels, seed=0)
    else:
        ex = ORBExtractor(cfg.orb)
        corpus = []
        for i in range(0, min(args.frames, 40), 4):
            fe = ex.extract(seq.images[i])
            corpus.append(np.asarray(fe.desc)[0][np.asarray(fe.valid)[0]])
        # per-frame docs -> TF-IDF leaf weights (TemplatedVocabulary.h:943-990)
        voc = bow.train_vocabulary(np.concatenate(corpus), k=10, levels=4, seed=0,
                                   docs=corpus)
    print(f"vocabulary: {voc.n_words} words", flush=True)
    slam = MonoSLAM(cfg, vocabulary=voc)

    if args.debug_loop:
        lc = slam.loop_closer
        orig_detect = lc._detect_loop
        orig_sim3 = lc._compute_sim3

        def detect(kf):
            v = lc.db.kf_bow(kf)
            min_score = 1.0
            for nb in kf.covisible:
                okf = lc.map.keyframes.get(nb)
                if okf is not None and not okf.bad:
                    min_score = min(min_score, bow.l1_score(v, lc.db.kf_bow(okf)))
            raw = lc.db.detect_loop_candidates(kf, min_score)
            out = orig_detect(kf)
            print(f"  [loop] kf={kf.id} min_score={min_score:.3f} "
                  f"raw_cands={raw} consistent={out}", flush=True)
            return out

        def sim3(kf, cands):
            for c in cands:
                ckf = lc.map.keyframes.get(c)
                if ckf is not None:
                    pairs = lc._matched_map_points(kf, ckf)
                    print(f"  [sim3-pairs] kf={kf.id}<->{c}: {len(pairs)}", flush=True)
            r = orig_sim3(kf, cands)
            print(f"  [sim3] kf={kf.id} cands={cands} ok={r[0]}", flush=True)
            return r

        lc._detect_loop = detect
        lc._compute_sim3 = sim3

    est, gt, times = [], [], []
    for k in range(seq.n_frames):
        t0 = time.perf_counter()
        T = slam.track_monocular(seq.images[k], seq.timestamps[k])
        times.append(time.perf_counter() - t0)
        if T is not None:
            est.append(-T[:3, :3].T @ T[:3, 3])
            gt.append(-seq.poses_Rcw[k].T @ seq.poses_tcw[k])
        if k % 20 == 0:
            print(f"f{k:03d}: state={slam.get_tracking_state()} "
                  f"kfs={slam.map.n_keyframes()} mps={slam.map.n_map_points()} "
                  f"loops={slam.loop_closer.n_loops_closed}", flush=True)
    slam.shutdown()
    est, gt = np.stack(est), np.stack(gt)
    rmse = ate_rmse(est, gt)
    traj = np.linalg.norm(np.diff(gt, axis=0), axis=1).sum()
    print(f"\ntracked {len(est)}/{seq.n_frames} frames, "
          f"state {slam.get_tracking_state()}, "
          f"{slam.map.n_keyframes()} keyframes, {slam.map.n_map_points()} points")
    print(f"loops closed: {slam.loop_closer.n_loops_closed}")
    print(f"ATE (sim3-aligned): {rmse:.4f} over {traj:.2f} trajectory "
          f"({100 * rmse / traj:.3f} %)")
    print(f"median track time: {np.median(np.sort(times[15:])):.3f} s")
    # did the revisit self-connect through covisibility (no loop needed) or
    # was the loop missed?
    kf_ids = sorted(slam.map.keyframes)
    early = set(kf_ids[:6])
    for kid in kf_ids[-5:]:
        kf = slam.map.keyframes[kid]
        bridge = sorted(set(kf.covisible) & early)
        print(f"KF {kid}: covisible with early KFs {bridge}")


if __name__ == "__main__":
    main()
