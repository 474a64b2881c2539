"""Dataset loaders: TUM, KITTI, EuRoC image sequences (+ synthetic).

Mirrors the reference's loaders: the mono_slam CLI reads TUM-style
`rgb.txt` lists (main.cc:22-47 LoadImages); KITTI and EuRoC formats follow
README.md:186-210. Images load lazily as float32 grayscale.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import List, Optional

import numpy as np


def _imread_gray_pil(path: str) -> np.ndarray:
    from PIL import Image

    img = Image.open(path)
    if img.mode in ("I", "I;16", "I;16B", "I;16L"):
        # 16-bit grayscale: take the high byte (the reference's cv::imread
        # 16->8 conversion and the native decoder do the same; PIL's
        # convert("L") would saturate everything >255 instead)
        a = np.asarray(img, dtype=np.uint32)
        return (a >> 8).astype(np.float32)
    if img.mode != "L":
        img = img.convert("L")
    return np.asarray(img, dtype=np.float32)


def _imread_gray(path: str, rgb_order: int = 1) -> np.ndarray:
    # Native C++ decoder first (bit-identical luma conversion; see
    # native/dataloader.cc); PIL handles anything it declines.
    from ceres_mono_orb_slam2_tpu.utils import native

    img = native.imread_gray(path)
    if img is not None:
        return img
    return _imread_gray_pil(path)


@dataclass
class ImageSequence:
    paths: List[str]
    timestamps: np.ndarray

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, i):
        return _imread_gray(self.paths[i]), float(self.timestamps[i])

    def iter_prefetch(self, n: Optional[int] = None, capacity: int = 4):
        """Yield (image, timestamp) with the native C++ loader decoding
        ahead of the consumer (native/dataloader.cc) — the decode of frame
        k+1..k+capacity overlaps the tracker's device round-trips on frame
        k. Falls back to synchronous decode when native is unavailable."""
        from ceres_mono_orb_slam2_tpu.utils import native

        n = len(self.paths) if n is None else min(n, len(self.paths))
        if native.available():
            loader = native.PrefetchLoader(self.paths[:n], capacity=capacity)
            try:
                for i, img in enumerate(loader):
                    yield img, float(self.timestamps[i])
            finally:
                loader.close()
        else:
            for i in range(n):
                yield self[i]


def load_tum(directory: str, list_file: str = "rgb.txt") -> ImageSequence:
    """TUM RGB-D format: `rgb.txt` lines 'timestamp path' with # comments
    (reference LoadImages, main.cc:22-47)."""
    paths, stamps = [], []
    with open(os.path.join(directory, list_file)) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            stamps.append(float(parts[0]))
            paths.append(os.path.join(directory, parts[1]))
    return ImageSequence(paths, np.array(stamps, np.float64))


def load_kitti(directory: str) -> ImageSequence:
    """KITTI odometry: image_0/%06d.png + times.txt."""
    times = np.loadtxt(os.path.join(directory, "times.txt"), dtype=np.float64)
    img_dir = os.path.join(directory, "image_0")
    paths = [os.path.join(img_dir, "%06d.png" % i) for i in range(len(times))]
    return ImageSequence(paths, times)


def load_euroc(directory: str, timestamp_file: Optional[str] = None) -> ImageSequence:
    """EuRoC MAV: mav0/cam0/data/<ns>.png, timestamps from the config list
    (configs/EuRoC_TimeStamps) or the data.csv."""
    data_dir = os.path.join(directory, "mav0", "cam0", "data")
    if timestamp_file:
        stamps_ns = [int(line.strip()) for line in open(timestamp_file) if line.strip()]
    else:
        csv = os.path.join(directory, "mav0", "cam0", "data.csv")
        stamps_ns = []
        with open(csv) as f:
            for line in f:
                if line.startswith("#"):
                    continue
                stamps_ns.append(int(line.split(",")[0]))
    paths = [os.path.join(data_dir, "%d.png" % t) for t in stamps_ns]
    return ImageSequence(paths, np.array(stamps_ns, np.float64) * 1e-9)


def load_auto(path: str) -> ImageSequence:
    if os.path.exists(os.path.join(path, "rgb.txt")):
        return load_tum(path)
    if os.path.exists(os.path.join(path, "times.txt")):
        return load_kitti(path)
    if os.path.exists(os.path.join(path, "mav0")):
        return load_euroc(path)
    raise ValueError(f"unrecognized dataset layout at {path}")
