"""Interactive live viewer: the HTTP equivalent of the Pangolin menu panel
(reference Viewer.cc:70-190) — page, images, state endpoint, and the menu
actions wired to the live System (localization toggle, reset)."""

import json
import time
import urllib.request

import numpy as np

from ceres_mono_orb_slam2_tpu.models.system import MonoSLAM
from ceres_mono_orb_slam2_tpu.utils.config import (
    CameraConfig, ORBConfig, SlamConfig, StaticShapes)
from ceres_mono_orb_slam2_tpu.utils.synthetic import make_sequence


def _get(port, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}", timeout=10) as r:
        return r.status, r.headers.get("Content-Type", ""), r.read()


def _post_menu(port, data: bytes):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/menu", data=data, method="POST",
        headers={"Content-Type": "application/x-www-form-urlencoded"})
    with urllib.request.urlopen(req, timeout=10) as r:
        return r.status


def test_live_viewer_menu_and_renders():
    cfg = SlamConfig(
        camera=CameraConfig(fx=500.0, fy=500.0, cx=320.0, cy=240.0, fps=30.0),
        orb=ORBConfig(n_features=1500),
        shapes=StaticShapes(max_local_points=2048, max_local_keyframes=12,
                            max_ba_points=1024, max_ba_obs=4096),
    )
    seq = make_sequence(n_frames=6, motion="strafe", step=0.12, seed=11)
    slam = MonoSLAM(cfg, live_viewer_port=0)
    try:
        port = slam.live_viewer.port
        for k in range(6):
            slam.track_monocular(seq.images[k], seq.timestamps[k])

        # menu page with all Pangolin panel entries (Viewer.cc:85-91)
        status, ctype, body = _get(port, "/")
        assert status == 200 and "text/html" in ctype
        for item in ("Follow Camera", "Show Points", "Show KeyFrames",
                     "Show Graph", "Localization Mode", "Reset"):
            assert item in body.decode()

        # wait for the render thread to produce a real frame image
        deadline = time.time() + 30
        while time.time() < deadline:
            _, _, png = _get(port, "/frame.png")
            if len(png) > 10_000:  # image-backed render, not the placeholder
                break
            time.sleep(0.2)
        assert len(png) > 10_000 and png[:8] == b"\x89PNG\r\n\x1a\n"
        _, _, mpng = _get(port, "/map.png")
        assert mpng[:8] == b"\x89PNG\r\n\x1a\n"

        status, _, body = _get(port, "/state.json")
        st = json.loads(body)
        assert st["state"] == "OK" and st["n_keyframes"] >= 2

        # localization toggle drives ActivateLocalizationMode (Viewer.cc:132)
        assert _post_menu(port, b"localization=on&points=on&keyframes=on&graph=on") == 200  # urllib follows the 303 redirect to /
        assert slam.tracker.localization_only is True
        # un-checking drives DeactivateLocalizationMode (Viewer.cc:136)
        assert _post_menu(port, b"points=on&keyframes=on&graph=on") == 200  # urllib follows the 303 redirect to /
        assert slam.tracker.localization_only is False

        # reset restores menu defaults + System::Reset (Viewer.cc:153-164)
        assert _post_menu(port, b"reset=1") == 200  # urllib follows the 303 redirect to /
        assert slam.map.n_keyframes() == 0
        st = json.loads(_get(port, "/state.json")[2])
        assert st["menu"] == {"follow": True, "points": True, "keyframes": True,
                              "graph": True, "localization": False}

        # system keeps tracking after a menu-driven reset (re-initializes)
        for k in range(6):
            slam.track_monocular(seq.images[k], seq.timestamps[k])
        assert slam.map.n_keyframes() >= 2
    finally:
        slam.shutdown()
    # shutdown stops the server
    try:
        _get(port, "/state.json")
        served_after = True
    except Exception:
        served_after = False
    assert not served_after
