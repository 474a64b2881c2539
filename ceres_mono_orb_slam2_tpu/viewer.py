"""Headless map viewer (reference src/Viewer.cc + MapDrawer.cc + FrameDrawer.cc).

The reference opens a Pangolin GL window with the point cloud, keyframe
frusta, covisibility graph / spanning tree / loop edges, plus an OpenCV
window of the current frame (FrameDrawer). This environment has no display,
so the equivalent renders the same content to PNG snapshots with matplotlib
(Agg backend) on demand or every N frames.
"""

from __future__ import annotations

import os

import numpy as np


class Viewer:
    def __init__(self, config, map_, tracker, out_dir: str = "viewer_out", every: int = 10):
        self.config = config
        self.map = map_
        self.tracker = tracker
        self.out_dir = out_dir
        self.every = every
        self._count = 0
        os.makedirs(out_dir, exist_ok=True)

    def update(self):
        self._count += 1
        if self._count % self.every == 0:
            self.snapshot(os.path.join(self.out_dir, "map_%05d.png" % self._count))

    def snapshot(self, path: str):
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        m = self.map
        fig = plt.figure(figsize=(10, 7))
        ax = fig.add_subplot(111)
        pts = [mp.pos for mp in m.all_map_points()]
        if pts:
            P = np.stack(pts)
            ax.scatter(P[:, 0], P[:, 2], s=1, c="black", alpha=0.4, label="map points")
        kfs = sorted(m.all_keyframes(), key=lambda k: k.id)
        if kfs:
            C = np.stack([kf.camera_center() for kf in kfs])
            ax.plot(C[:, 0], C[:, 2], "b-", lw=1)
            ax.scatter(C[:, 0], C[:, 2], s=12, c="blue", marker="s", label="keyframes")
            # covisibility graph (light) + spanning tree (green) + loop edges (red)
            centers = {kf.id: kf.camera_center() for kf in kfs}
            for kf in kfs:
                for nb, wgt in kf.covisible.items():
                    if nb in centers and nb > kf.id and wgt >= 100:
                        a, b = centers[kf.id], centers[nb]
                        ax.plot([a[0], b[0]], [a[2], b[2]], "c-", lw=0.3, alpha=0.5)
                if kf.parent is not None and kf.parent in centers:
                    a, b = centers[kf.id], centers[kf.parent]
                    ax.plot([a[0], b[0]], [a[2], b[2]], "g-", lw=0.6)
                for le in kf.loop_edges:
                    if le in centers:
                        a, b = centers[kf.id], centers[le]
                        ax.plot([a[0], b[0]], [a[2], b[2]], "r-", lw=1.2)
        f = self.tracker.current
        if f is not None and f.pose_set:
            c = f.camera_center()
            ax.scatter([c[0]], [c[2]], s=60, c="red", marker="^", label="camera")
        ax.set_xlabel("x [m]")
        ax.set_ylabel("z [m]")
        ax.set_title(
            "map: %d points, %d keyframes | state %s | inliers %d"
            % (m.n_map_points(), m.n_keyframes(), self.tracker.state.name, self.tracker.matches_inliers)
        )
        ax.axis("equal")
        ax.legend(loc="upper right", fontsize=8)
        fig.tight_layout()
        fig.savefig(path, dpi=110)
        plt.close(fig)
        return path

    def draw_frame(self, path: str):
        """FrameDrawer equivalent: current image with tracked keypoints."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        f = self.tracker.current
        if f is None:
            return None
        fig, ax = plt.subplots(figsize=(10, 6))
        # the tracker does not retain the image; draw keypoint layout only
        tracked = f.mp_ids >= 0
        ax.scatter(f.kp_xy[f.kp_valid & ~tracked][:, 0], f.kp_xy[f.kp_valid & ~tracked][:, 1],
                   s=4, c="gray", label="keypoints")
        ax.scatter(f.kp_xy[tracked][:, 0], f.kp_xy[tracked][:, 1], s=6, c="lime", label="tracked")
        ax.invert_yaxis()
        ax.set_title("frame %d | %s | matches %d" % (f.id, self.tracker.state.name, int(tracked.sum())))
        ax.legend(fontsize=8)
        fig.savefig(path, dpi=110)
        plt.close(fig)
        return path
