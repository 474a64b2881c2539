"""ORB feature extraction: batched, jit-compiled, static shapes.

TPU-native equivalent of the reference ORBextractor (src/ORBextractor.cc:
1043-1105 `operator()`): 8-level pyramid (ComputePyramid, :1107-1132),
FAST with two-threshold per-cell logic (ComputeKeyPointsOctTree, :765-853),
octree spatial culling (DistributeOctTree, :539-763) re-designed as per-cell
top-k + rank-major global top-N, IC-angle orientation (IC_Angle, :77-104),
7x7 Gaussian blur and rotated BRIEF descriptors (computeOrbDescriptor,
:108-147) using the canonical bit_pattern_31 sampling table.

Everything runs as one jit function over a batch of frames; keypoint counts
are static per level (the reference's per-level geometric budget,
ORBextractor.cc:435-446) with validity masks for unfilled slots.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ceres_mono_orb_slam2_tpu.ops.orb import kernels
from ceres_mono_orb_slam2_tpu.ops.orb.kernels import DESC_R, EDGE, HALF_PATCH
from ceres_mono_orb_slam2_tpu.ops.orb.pattern import BIT_PATTERN_31
from ceres_mono_orb_slam2_tpu.utils.config import ORBConfig

CELL = 32  # spatial-uniformity cell size (reference uses ~30px windows)
TOP_PER_CELL = 8  # candidates kept per cell before global rank-major top-N


class FrameFeatures(NamedTuple):
    """SoA keypoint/descriptor tensors for a batch of frames.

    All arrays lead with the batch dim B and a static feature dim N
    (= config n_features, padded slots masked by `valid`).
    """

    xy: jnp.ndarray  # (B, N, 2) float32, level-0 pixel coords (distorted)
    response: jnp.ndarray  # (B, N) float32 FAST score
    angle: jnp.ndarray  # (B, N) float32 radians
    octave: jnp.ndarray  # (B, N) int32 pyramid level
    desc: jnp.ndarray  # (B, N, 32) uint8 packed rBRIEF
    valid: jnp.ndarray  # (B, N) bool

    @property
    def n(self):
        return self.xy.shape[-2]


def _level_sizes(h: int, w: int, n_levels: int, scale: float):
    sizes = []
    for lv in range(n_levels):
        s = scale**lv
        sizes.append((int(round(h / s)), int(round(w / s))))
    return sizes


def _select_level_keypoints(score, n_keep: int, ini_th: float, min_th: float):
    """Two-threshold per-cell candidate selection + rank-major global top-N.

    score: (B, H, W) NMS'd FAST score map (margins already zeroed).
    Returns (ys, xs, resp, valid): each (B, n_keep).
    """
    B, H, W = score.shape
    hp = -H % CELL
    wp = -W % CELL
    sp = jnp.pad(score, ((0, 0), (0, hp), (0, wp)))
    Hp, Wp = H + hp, W + wp
    ncy, ncx = Hp // CELL, Wp // CELL
    cells = sp.reshape(B, ncy, CELL, ncx, CELL).transpose(0, 1, 3, 2, 4).reshape(B, ncy * ncx, CELL * CELL)

    # Per-cell two-threshold rule (reference ORBextractor.cc:791-811): try the
    # high threshold; if the cell has no high-threshold corner, fall back to
    # the low threshold.
    cell_max = jnp.max(cells, axis=-1, keepdims=True)
    keep = (cells > ini_th) | ((cell_max <= ini_th) & (cells > min_th))
    cells = jnp.where(keep, cells, 0.0)

    vals, idx = jax.lax.top_k(cells, TOP_PER_CELL)  # (B, nc, m) sorted desc
    cell_ids = jnp.arange(ncy * ncx, dtype=jnp.int32)
    cy = (cell_ids // ncx)[None, :, None]
    cx = (cell_ids % ncx)[None, :, None]
    ys = cy * CELL + idx // CELL  # (B, nc, m)
    xs = cx * CELL + idx % CELL
    rank = jnp.arange(TOP_PER_CELL, dtype=jnp.float32)[None, None, :]

    # Rank-major key: all cells' best first (octree-uniformity property),
    # ties broken by response.
    valid = vals > 0.0
    key = jnp.where(valid, rank * 1e4 + (512.0 - jnp.minimum(vals, 500.0)), 1e9)
    key = key.reshape(B, -1)
    neg_top, flat_sel = jax.lax.top_k(-key, n_keep)  # smallest keys
    sel_valid = -neg_top < 1e8

    ys = jnp.take_along_axis(ys.reshape(B, -1), flat_sel, axis=1)
    xs = jnp.take_along_axis(xs.reshape(B, -1), flat_sel, axis=1)
    resp = jnp.take_along_axis(vals.reshape(B, -1), flat_sel, axis=1)
    return ys, xs, resp, sel_valid


class ORBExtractor:
    """Batched ORB extractor; call .extract(images) with (B, H, W) float32."""

    def __init__(self, config: ORBConfig):
        self.config = config
        self.features_per_level = config.features_per_level
        self.scale_factors = config.scale_factors
        mx, my = kernels.ic_angle_mask()
        self._mask_x = jnp.asarray(mx)
        self._mask_y = jnp.asarray(my)
        # Pattern as (512, 2) sample points (x, y).
        pts = BIT_PATTERN_31.reshape(256, 2, 2).reshape(512, 2)
        self._pattern = jnp.asarray(pts, jnp.float32)  # (512, 2) = (x, y)
        self._extract_jit = functools.lru_cache(maxsize=8)(self._build)

    def _build(self, h: int, w: int):
        cfg = self.config
        sizes = _level_sizes(h, w, cfg.n_levels, cfg.scale_factor)
        mask_x, mask_y, pattern = self._mask_x, self._mask_y, self._pattern
        per_level = [int(n) for n in self.features_per_level]
        scales = [float(s) for s in self.scale_factors]

        byte_weights = jnp.asarray(1 << np.arange(8, dtype=np.uint32), jnp.uint32)

        def level_features(img_l, n_keep, lv):
            B, Hl, Wl = img_l.shape
            score = kernels.nms3(kernels.fast_score_map(img_l))
            # Zero out the EDGE margin so every kept keypoint admits full
            # IC-angle and descriptor patch gathers.
            m = EDGE
            border = jnp.zeros((Hl, Wl), jnp.float32).at[m : Hl - m, m : Wl - m].set(1.0)
            score = score * border[None]
            ys, xs, resp, valid = _select_level_keypoints(score, n_keep, cfg.ini_th_fast, cfg.min_th_fast)

            safe_y = jnp.where(valid, ys, m).astype(jnp.int32)
            safe_x = jnp.where(valid, xs, m).astype(jnp.int32)

            # IC-angle on the raw level image (reference computes orientation
            # pre-blur, ORBextractor.cc:1068-1070 OctTree path).
            p31 = jax.vmap(lambda im, yy, xx: kernels.gather_patches(im, yy, xx, HALF_PATCH))(
                img_l, safe_y, safe_x
            )  # (B, n, 31, 31)
            m10 = jnp.sum(p31 * mask_x, axis=(-2, -1))
            m01 = jnp.sum(p31 * mask_y, axis=(-2, -1))
            angle = jnp.arctan2(m01, m10)

            # Descriptors from the blurred level image.
            blurred = kernels.gaussian_blur7(img_l)
            p39 = jax.vmap(lambda im, yy, xx: kernels.gather_patches(im, yy, xx, DESC_R))(
                blurred, safe_y, safe_x
            )  # (B, n, 39, 39)
            pf = p39.reshape(B, -1, (2 * DESC_R + 1) ** 2)

            ca, sa = jnp.cos(angle), jnp.sin(angle)  # (B, n)
            px, py = pattern[:, 0], pattern[:, 1]  # (512,)
            # Rotated integer sample offsets (reference computeOrbDescriptor
            # GET_VALUE: col = round(px*a - py*b), row = round(px*b + py*a)).
            rx = jnp.round(px[None, None, :] * ca[..., None] - py[None, None, :] * sa[..., None])
            ry = jnp.round(px[None, None, :] * sa[..., None] + py[None, None, :] * ca[..., None])
            sidx = ((ry + DESC_R) * (2 * DESC_R + 1) + (rx + DESC_R)).astype(jnp.int32)  # (B, n, 512)
            samples = jnp.take_along_axis(pf, sidx, axis=-1)  # (B, n, 512)
            t0 = samples[..., 0::2]
            t1 = samples[..., 1::2]
            bits = (t0 < t1).astype(jnp.uint32)  # (B, n, 256)
            desc = jnp.sum(bits.reshape(B, -1, 32, 8) * byte_weights, axis=-1).astype(jnp.uint8)

            xy0 = jnp.stack([xs, ys], axis=-1).astype(jnp.float32) * scales[lv]
            octave = jnp.full(ys.shape, lv, jnp.int32)
            return xy0, resp, angle, octave, desc, valid

        def extract(images):
            images = images.astype(jnp.float32)
            outs = []
            img_l = images
            for lv in range(cfg.n_levels):
                if lv > 0:
                    img_l = kernels.resize_bilinear(img_l, sizes[lv][0], sizes[lv][1])
                outs.append(level_features(img_l, per_level[lv], lv))
            xy = jnp.concatenate([o[0] for o in outs], axis=1)
            resp = jnp.concatenate([o[1] for o in outs], axis=1)
            angle = jnp.concatenate([o[2] for o in outs], axis=1)
            octave = jnp.concatenate([o[3] for o in outs], axis=1)
            desc = jnp.concatenate([o[4] for o in outs], axis=1)
            valid = jnp.concatenate([o[5] for o in outs], axis=1)
            return FrameFeatures(xy=xy, response=resp, angle=angle, octave=octave, desc=desc, valid=valid)

        return jax.jit(extract)

    def extract(self, images) -> FrameFeatures:
        """images: (B, H, W) uint8/float32 grayscale in [0, 255]."""
        if images.ndim == 2:
            images = images[None]
        return self._extract_jit(images.shape[-2], images.shape[-1])(jnp.asarray(images))
