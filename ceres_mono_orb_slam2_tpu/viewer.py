"""Headless map viewer (reference src/Viewer.cc + MapDrawer.cc + FrameDrawer.cc).

The reference opens a Pangolin GL window with the point cloud, keyframe
frusta, covisibility graph / spanning tree / loop edges, plus an OpenCV
window of the current frame (FrameDrawer). This environment has no display,
so the equivalent renders the same content to PNG snapshots with matplotlib
(Agg backend) on demand or every N frames; `live_viewer.LiveViewer` serves
the same renders interactively over HTTP with the Pangolin menu semantics.

Extraction (reading map/tracker state) is split from rendering so a live
viewer thread can hold the map lock only for the cheap numpy copy — the
same Update()/DrawFrame() split the reference FrameDrawer uses
(FrameDrawer.cc:185-219 copies under mutex_, :35-181 draws the copy).
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

    # ------------------------------------------------------------ extraction

    def map_geometry(self) -> dict:
        """Copy everything the map render needs into plain numpy (cheap; safe
        to call under map.update_lock)."""
        m = self.map
        pts = [mp.pos for mp in m.all_map_points()]
        kfs = sorted(m.all_keyframes(), key=lambda k: k.id)
        centers = {kf.id: kf.camera_center() for kf in kfs}
        covis, tree, loops = [], [], []
        for kf in kfs:
            for nb, wgt in kf.covisible.items():
                if nb in centers and nb > kf.id and wgt >= 100:
                    covis.append((centers[kf.id], centers[nb]))
            if kf.parent is not None and kf.parent in centers:
                tree.append((centers[kf.id], centers[kf.parent]))
            for le in kf.loop_edges:
                if le in centers:
                    loops.append((centers[kf.id], centers[le]))
        f = self.tracker.current
        cam = f.camera_center() if (f is not None and f.pose_set) else None
        return {
            "points": np.stack(pts) if pts else None,
            "kf_centers": np.stack([centers[kf.id] for kf in kfs]) if kfs else None,
            "covis": covis, "tree": tree, "loops": loops, "camera": cam,
            "n_points": m.n_map_points(), "n_keyframes": m.n_keyframes(),
            "state": self.tracker.state.name,
            "inliers": self.tracker.matches_inliers,
        }

    def frame_geometry(self) -> dict:
        """Copy the current frame's draw state (reference FrameDrawer::Update,
        FrameDrawer.cc:185-219); safe to call under map.update_lock."""
        f = self.tracker.current
        if f is None:
            return {"frame": None}
        tracked = (f.mp_ids >= 0) & f.kp_valid
        img = self.tracker.current_image
        return {
            "frame": f.id,
            "image": None if img is None else np.asarray(img),
            "kp_xy": np.asarray(f.kp_xy),
            "tracked": np.asarray(tracked),
            "untracked": np.asarray(f.kp_valid & ~tracked),
            "state": self.tracker.state.name,
            "localization": self.tracker.localization_only,
            "n_keyframes": self.map.n_keyframes(),
            "n_points": self.map.n_map_points(),
        }

    # ------------------------------------------------------------- rendering

    def snapshot(self, path, geom: dict | None = None, show_points: bool = True,
                 show_keyframes: bool = True, show_graph: bool = True,
                 follow: bool = False):
        """Render the map view. `path` may be a filename or a file-like
        object. Menu toggles mirror the Pangolin panel (Viewer.cc:85-91);
        `follow` centers the viewport on the current camera
        (s_cam.Follow(Twc), Viewer.cc:119-125)."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        g = geom if geom is not None else self.map_geometry()
        fig = plt.figure(figsize=(10, 7))
        ax = fig.add_subplot(111)
        if show_points and g["points"] is not None:
            P = g["points"]
            ax.scatter(P[:, 0], P[:, 2], s=1, c="black", alpha=0.4, label="map points")
        if show_keyframes and g["kf_centers"] is not None:
            C = g["kf_centers"]
            ax.plot(C[:, 0], C[:, 2], "b-", lw=1)
            ax.scatter(C[:, 0], C[:, 2], s=12, c="blue", marker="s", label="keyframes")
        if show_graph:
            # covisibility graph (light) + spanning tree (green) + loop edges (red)
            for a, b in g["covis"]:
                ax.plot([a[0], b[0]], [a[2], b[2]], "c-", lw=0.3, alpha=0.5)
            for a, b in g["tree"]:
                ax.plot([a[0], b[0]], [a[2], b[2]], "g-", lw=0.6)
            for a, b in g["loops"]:
                ax.plot([a[0], b[0]], [a[2], b[2]], "r-", lw=1.2)
        if g["camera"] is not None:
            c = g["camera"]
            ax.scatter([c[0]], [c[2]], s=60, c="red", marker="^", label="camera")
        ax.set_xlabel("x [m]")
        ax.set_ylabel("z [m]")
        ax.set_title(
            "map: %d points, %d keyframes | state %s | inliers %d"
            % (g["n_points"], g["n_keyframes"], g["state"], g["inliers"])
        )
        if follow and g["camera"] is not None:
            # follow-cam: fixed-size window tracking the camera center
            c = g["camera"]
            half = 8.0
            ax.set_xlim(c[0] - half, c[0] + half)
            ax.set_ylim(c[2] - half, c[2] + half)
            ax.set_aspect("equal")
        else:
            ax.axis("equal")
        if ax.get_legend_handles_labels()[0]:
            ax.legend(loc="upper right", fontsize=8)
        fig.tight_layout()
        fig.savefig(path, dpi=110, format="png")
        plt.close(fig)
        return path

    def draw_frame(self, path, geom: dict | None = None):
        """FrameDrawer equivalent (reference FrameDrawer.cc:35-181): the
        current image with tracked keypoints as green boxes, untracked FAST
        keypoints as gray dots, and the reference's status text bar. `path`
        may be a filename or a file-like object."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        from matplotlib.patches import Rectangle

        g = geom if geom is not None else self.frame_geometry()
        if g["frame"] is None:
            return None
        img = g["image"]
        fig, ax = plt.subplots(figsize=(10, 6.6))
        if img is not None:
            ax.imshow(img, cmap="gray", vmin=0, vmax=255)
        kp_xy, tracked, untracked = g["kp_xy"], g["tracked"], g["untracked"]
        ax.scatter(kp_xy[untracked][:, 0], kp_xy[untracked][:, 1],
                   s=3, c="gray", label="keypoints")
        # the reference draws a 10px square + center dot per tracked point
        # (FrameDrawer.cc:124-142)
        r = 5.0
        for x, y in kp_xy[tracked]:
            ax.add_patch(Rectangle((x - r, y - r), 2 * r, 2 * r,
                                   fill=False, edgecolor="lime", linewidth=0.7))
        ax.scatter(kp_xy[tracked][:, 0], kp_xy[tracked][:, 1], s=3, c="lime")
        if img is None:
            ax.invert_yaxis()
        # status bar (reference DrawTextInfo, FrameDrawer.cc:144-181)
        state = g["state"]
        mode = "LOCALIZATION | " if g["localization"] else ""
        if state == "OK":
            bar = ("%sSLAM MODE |  KFs: %d, MPs: %d, Matches: %d"
                   % (mode, g["n_keyframes"], g["n_points"], int(tracked.sum())))
        elif state == "LOST":
            bar = "TRACK LOST. TRYING TO RELOCALIZE "
        elif state == "NOT_INITIALIZED":
            bar = "TRYING TO INITIALIZE "
        else:
            bar = "WAITING FOR IMAGES"
        ax.set_title("frame %d | %s" % (g["frame"], bar), fontsize=10)
        ax.set_xticks([])
        ax.set_yticks([])
        fig.savefig(path, dpi=110, format="png")
        plt.close(fig)
        return path
