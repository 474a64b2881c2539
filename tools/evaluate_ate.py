"""Absolute trajectory error between two TUM-format trajectory files.

Drop-in equivalent of the TUM benchmark's evaluate_ate.py — the tool the
reference ecosystem uses to score KeyFrameTrajectory.txt against
groundtruth.txt (reference README.md's validation workflow). Timestamp
association with a configurable max difference, then sim(3) (default) or
SE(3) alignment, RMSE report.

Usage: python tools/evaluate_ate.py groundtruth.txt KeyFrameTrajectory.txt
           [--max-difference 0.02] [--no-scale]
"""

import argparse
import sys

import numpy as np


def read_tum(path):
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            v = line.replace(",", " ").split()
            if len(v) < 8:
                continue
            rows.append([float(x) for x in v[:8]])
    arr = np.array(rows, np.float64)
    return arr[:, 0], arr[:, 1:4]


def associate(t1, t2, max_diff):
    """Best-first timestamp association (TUM associate.py semantics): all
    candidate pairs within max_diff sorted by |dt|, matched greedily with
    each timestamp used at most once."""
    cands = []
    for i, ta in enumerate(t1):
        d = np.abs(t2 - ta)
        for k in np.nonzero(d <= max_diff)[0]:
            cands.append((d[k], i, int(k)))
    cands.sort()
    used1, used2 = set(), set()
    pairs = []
    for _, i, k in cands:
        if i not in used1 and k not in used2:
            pairs.append((i, k))
            used1.add(i)
            used2.add(k)
    pairs.sort()
    return pairs


def align(gt, est, with_scale=True):
    cg, ce = gt.mean(0), est.mean(0)
    g0, e0 = gt - cg, est - ce
    U, S, Vt = np.linalg.svd(g0.T @ e0)
    D = np.diag([1, 1, np.sign(np.linalg.det(U @ Vt))])
    R = U @ D @ Vt
    s = (np.trace(np.diag(S) @ D) / (e0 ** 2).sum()) if with_scale else 1.0
    aligned = (s * (R @ e0.T)).T + cg
    return aligned


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("groundtruth")
    ap.add_argument("estimate")
    ap.add_argument("--max-difference", type=float, default=0.02)
    ap.add_argument("--no-scale", action="store_true",
                    help="SE(3) alignment instead of sim(3) (mono needs scale)")
    args = ap.parse_args()

    tg, pg = read_tum(args.groundtruth)
    te, pe = read_tum(args.estimate)
    pairs = associate(tg, te, args.max_difference)
    if len(pairs) < 3:
        print(f"only {len(pairs)} associated pairs — check timestamps", file=sys.stderr)
        return 1
    gi = np.array([p[0] for p in pairs])
    ei = np.array([p[1] for p in pairs])
    aligned = align(pg[gi], pe[ei], with_scale=not args.no_scale)
    err = np.linalg.norm(aligned - pg[gi], axis=1)
    print(f"compared_pose_pairs {len(pairs)} pairs")
    print(f"absolute_translational_error.rmse {np.sqrt(np.mean(err ** 2)):.6f} m")
    print(f"absolute_translational_error.mean {err.mean():.6f} m")
    print(f"absolute_translational_error.median {np.median(err):.6f} m")
    print(f"absolute_translational_error.std {err.std():.6f} m")
    print(f"absolute_translational_error.min {err.min():.6f} m")
    print(f"absolute_translational_error.max {err.max():.6f} m")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
