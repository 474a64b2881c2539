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
        """FrameDrawer equivalent (reference FrameDrawer.cc:35-181): the
        current image with tracked keypoints as green boxes, untracked FAST
        keypoints as gray dots, and the reference's status text bar."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        from matplotlib.patches import Rectangle

        f = self.tracker.current
        if f is None:
            return None
        img = self.tracker.current_image
        fig, ax = plt.subplots(figsize=(10, 6.6))
        if img is not None:
            ax.imshow(np.asarray(img), cmap="gray", vmin=0, vmax=255)
        tracked = (f.mp_ids >= 0) & f.kp_valid
        untracked = f.kp_valid & ~tracked
        ax.scatter(f.kp_xy[untracked][:, 0], f.kp_xy[untracked][:, 1],
                   s=3, c="gray", label="keypoints")
        # the reference draws a 10px square + center dot per tracked point
        # (FrameDrawer.cc:124-142)
        r = 5.0
        for x, y in f.kp_xy[tracked]:
            ax.add_patch(Rectangle((x - r, y - r), 2 * r, 2 * r,
                                   fill=False, edgecolor="lime", linewidth=0.7))
        ax.scatter(f.kp_xy[tracked][:, 0], f.kp_xy[tracked][:, 1],
                   s=3, c="lime")
        if img is None:
            ax.invert_yaxis()
        # status bar (reference DrawTextInfo, FrameDrawer.cc:144-181)
        state = self.tracker.state.name
        mode = "LOCALIZATION | " if self.tracker.localization_only else ""
        if state == "OK":
            bar = ("%sSLAM MODE |  KFs: %d, MPs: %d, Matches: %d"
                   % (mode, self.map.n_keyframes(), self.map.n_map_points(),
                      int(tracked.sum())))
        elif state == "LOST":
            bar = "TRACK LOST. TRYING TO RELOCALIZE "
        elif state == "NOT_INITIALIZED":
            bar = "TRYING TO INITIALIZE "
        else:
            bar = "WAITING FOR IMAGES"
        ax.set_title("frame %d | %s" % (f.id, bar), fontsize=10)
        ax.set_xticks([])
        ax.set_yticks([])
        fig.savefig(path, dpi=110)
        plt.close(fig)
        return path
