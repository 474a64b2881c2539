"""The complete reference validation workflow, end to end on disk:

1. render a synthetic sequence and write it as a TUM-format dataset
   (rgb.txt + PNGs + groundtruth.txt),
2. run the mono_slam CLI on it (--images path, reference YAML config),
3. score KeyFrameTrajectory.txt against groundtruth.txt with
   tools/evaluate_ate.py.

This is exactly how the reference was validated on fr2_desk/KITTI
(reference README.md:7 + the TUM benchmark tooling).

Usage: python tools/run_dataset_demo.py [--frames 40] [--dir /tmp/tum_demo]
"""

import argparse
import os
import subprocess
import sys

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--dir", default="/tmp/tum_demo")
    ap.add_argument("--config", default=None,
                    help="camera YAML; default writes one matching the renderer")
    args = ap.parse_args()

    from PIL import Image

    from ceres_mono_orb_slam2_tpu.ops import lie
    from ceres_mono_orb_slam2_tpu.utils.synthetic import make_sequence

    import jax.numpy as jnp

    seq = make_sequence(n_frames=args.frames, seed=11, motion="strafe", step=0.12)
    d = args.dir
    os.makedirs(os.path.join(d, "rgb"), exist_ok=True)
    with open(os.path.join(d, "rgb.txt"), "w") as f:
        f.write("# synthetic TUM-format sequence\n# timestamp filename\n")
        for i in range(seq.n_frames):
            name = f"rgb/{seq.timestamps[i]:.6f}.png"
            Image.fromarray(np.clip(seq.images[i], 0, 255).astype(np.uint8), mode="L").save(
                os.path.join(d, name))
            f.write(f"{seq.timestamps[i]:.6f} {name}\n")
    with open(os.path.join(d, "groundtruth.txt"), "w") as f:
        f.write("# timestamp tx ty tz qx qy qz qw\n")
        for i in range(seq.n_frames):
            Rwc = seq.poses_Rcw[i].T
            twc = -Rwc @ seq.poses_tcw[i]
            q = np.asarray(lie.rot_to_quat(jnp.asarray(Rwc)))
            f.write("%.6f %.7f %.7f %.7f %.7f %.7f %.7f %.7f\n"
                    % (seq.timestamps[i], twc[0], twc[1], twc[2], q[0], q[1], q[2], q[3]))
    print(f"dataset written to {d} ({seq.n_frames} frames)")

    config = args.config
    if config is None:
        # camera YAML matching the renderer's ideal pinhole, in the
        # reference's OpenCV-FileStorage format (utils/config.py parses it)
        config = os.path.join(d, "camera.yaml")
        with open(config, "w") as f:
            f.write("""%YAML:1.0
Camera.fx: 500.0
Camera.fy: 500.0
Camera.cx: 320.0
Camera.cy: 240.0
Camera.k1: 0.0
Camera.k2: 0.0
Camera.p1: 0.0
Camera.p2: 0.0
Camera.fps: 30.0
Camera.RGB: 0
ORBextractor.nFeatures: 1500
ORBextractor.scaleFactor: 1.2
ORBextractor.nLevels: 8
ORBextractor.iniThFAST: 20
ORBextractor.minThFAST: 7
""")

    out = os.path.join(d, "out")
    env = dict(os.environ, PYTHONPATH="/root/repo")
    cli = [sys.executable, "-m", "ceres_mono_orb_slam2_tpu.cli",
           "--config", config, "--images", d, "--output-dir", out,
           "--stats-out", os.path.join(out, "stats.jsonl")]
    print("running:", " ".join(cli), flush=True)
    subprocess.run(cli, check=True, env=env)

    print("\n--- evaluate_ate (keyframe trajectory vs ground truth) ---", flush=True)
    subprocess.run([sys.executable, "tools/evaluate_ate.py",
                    os.path.join(d, "groundtruth.txt"),
                    os.path.join(out, "KeyFrameTrajectory.txt")], check=True, env=env)
    print("\n--- evaluate_ate (per-frame trajectory vs ground truth) ---", flush=True)
    subprocess.run([sys.executable, "tools/evaluate_ate.py",
                    os.path.join(d, "groundtruth.txt"),
                    os.path.join(out, "FrameTrajectory.txt")], check=True, env=env)


if __name__ == "__main__":
    main()
