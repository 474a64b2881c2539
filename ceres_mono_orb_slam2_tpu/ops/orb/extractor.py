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
N_ANGLE_BINS = 30  # rBRIEF rotation quantization (12 deg, the ORB-paper scheme)


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

    # Top-m per cell by m rounds of (argmax, mask): lax.top_k lowers to a
    # full variadic sort of the 1024-wide cell axis (~7-11 ms of the batched
    # extractor at B=8); 8 masked argmax passes are pure VPU and order ties
    # by first index exactly like the stable sort.
    vals_l, idx_l = [], []
    work = cells
    lane = jax.lax.broadcasted_iota(jnp.int32, cells.shape, cells.ndim - 1)
    for _ in range(TOP_PER_CELL):
        i = jnp.argmax(work, axis=-1)  # (B, nc), first max wins ties
        vals_l.append(jnp.max(work, axis=-1))
        idx_l.append(i.astype(jnp.int32))
        work = jnp.where(lane == i[..., None], -1.0, work)
    vals = jnp.stack(vals_l, axis=-1)  # (B, nc, m) descending
    idx = jnp.stack(idx_l, axis=-1)
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
        # Precomputed rotated-pattern flat indices per angle bin: for bin b the
        # 512 sample taps land at fixed offsets within the 39x39 patch, so the
        # per-keypoint scattered gather becomes a per-bin SHARED-index row
        # gather (coalesced on TPU) + a per-keypoint contiguous row select.
        pts = BIT_PATTERN_31.reshape(256, 2, 2).reshape(512, 2).astype(np.float64)
        side = 2 * DESC_R + 1
        tables = []
        for b in range(N_ANGLE_BINS):
            th = 2.0 * np.pi * b / N_ANGLE_BINS
            ca, sa = np.cos(th), np.sin(th)
            rx = np.round(pts[:, 0] * ca - pts[:, 1] * sa).astype(np.int32)
            ry = np.round(pts[:, 0] * sa + pts[:, 1] * ca).astype(np.int32)
            tables.append((ry + DESC_R) * side + (rx + DESC_R))
        tab = np.stack(tables)  # (A, 512)
        # KEEP AS NUMPY: constants closed over by a traced function must live
        # on the host. A jax.Array closure constant is fetched device->host at
        # every lowering (per process), and under the axon tunnel that fetch
        # costs seconds (measured 46 s for this 61 KB table); a numpy constant
        # embeds in the MLIR for free.
        self._bin_tap_table = tab
        self._extract_jit = functools.lru_cache(maxsize=8)(self._build)

    def _build(self, h: int, w: int):
        cfg = self.config
        sizes = _level_sizes(h, w, cfg.n_levels, cfg.scale_factor)
        per_level = [int(n) for n in self.features_per_level]
        scales = [float(s) for s in self.scale_factors]
        tap_table = self._bin_tap_table  # (A, 512) compile-time-constant indices

        # All closure constants stay numpy (see _bin_tap_table note above):
        # lowering embeds host arrays directly; device arrays would be fetched
        # through the tunnel at every process start.
        byte_weights = (1 << np.arange(8, dtype=np.uint32)).astype(np.uint32)
        side2 = (2 * DESC_R + 1) ** 2
        mx, my = kernels.ic_angle_mask()
        moment_masks = np.stack(
            [mx.reshape(-1), my.reshape(-1)], axis=1
        ).astype(np.float32)  # (961, 2)

        def level_keypoints_and_patches(img_l, n_keep, lv):
            """Per-level detection + patch gathers; angle/descriptor math runs
            ONCE over all levels' concatenated patches (per-level matmul
            launches do not amortize their padding/fusion overheads)."""
            B, Hl, Wl = img_l.shape
            # Fused Pallas FAST+NMS on TPU (the composed XLA version's
            # (16/24, B, H, W) HBM intermediates were the largest cost of the
            # batched extractor); identical scores on interior pixels, and the
            # EDGE mask below discards the border where they differ.
            if jax.default_backend() == "tpu":
                score = kernels.fast_nms_pallas(img_l)
            else:
                score = kernels.nms3(kernels.fast_score_map(img_l))
            # Zero out the EDGE margin so every kept keypoint admits full
            # IC-angle and descriptor patch gathers.
            m = EDGE
            border = jnp.zeros((Hl, Wl), jnp.float32).at[m : Hl - m, m : Wl - m].set(1.0)
            score = score * border[None]
            ys, xs, resp, valid = _select_level_keypoints(score, n_keep, cfg.ini_th_fast, cfg.min_th_fast)

            safe_y = jnp.where(valid, ys, m).astype(jnp.int32)
            safe_x = jnp.where(valid, xs, m).astype(jnp.int32)

            # raw patches for IC-angle (reference computes orientation
            # pre-blur, ORBextractor.cc:1068-1070), blurred for rBRIEF.
            # Patch "gathers" are contiguous row gathers + one-hot column
            # matmuls (kernels.gather_patches): per-element 2D gathers
            # serialize on TPU (~0.3% of HBM bandwidth).
            # The barrier stops XLA from fusing the blur convolution and the
            # NMS/select producers INTO the gather's one-hot contraction —
            # that "convolution_select_fusion" re-evaluated the upstream per
            # output tile and cost ~28 ms/frame (the KNOWN_ISSUES #2
            # composition overhead; the same contraction runs in 0.02 ms
            # against materialized inputs).
            # quantize the blurred image to the u8 grid BEFORE the patch
            # gather: the reference blurs into an 8-bit Mat
            # (ORBextractor.cc:1034) and compares integer values; it also
            # keeps the bf16 row-gather exact (bf16 is exact for 8-bit
            # integers but rounds fractional blur output by up to 1 ulp,
            # which flips near-tie rBRIEF comparisons)
            blurred = jnp.clip(jnp.floor(kernels.gaussian_blur7(img_l) + 0.5), 0.0, 255.0)
            img_lb, blurred, safe_y, safe_x = jax.lax.optimization_barrier(
                (img_l, blurred, safe_y, safe_x))
            if jax.default_backend() == "tpu":
                # column-windowed Pallas gather: ~W/256 less HBM traffic than
                # the row-gather einsum; bit-identical output
                p31 = kernels.gather_patches_pallas(img_lb, safe_y, safe_x, HALF_PATCH)
                p39 = kernels.gather_patches_pallas(blurred, safe_y, safe_x, DESC_R)
            else:
                p31 = jax.vmap(lambda im, yy, xx: kernels.gather_patches(im, yy, xx, HALF_PATCH))(
                    img_lb, safe_y, safe_x
                )  # (B, n, 31, 31)
                p39 = jax.vmap(lambda im, yy, xx: kernels.gather_patches(im, yy, xx, DESC_R))(
                    blurred, safe_y, safe_x
                )  # (B, n, 39, 39)

            xy0 = jnp.stack([xs, ys], axis=-1).astype(jnp.float32) * scales[lv]
            octave = jnp.full(ys.shape, lv, jnp.int32)
            return xy0, resp, octave, valid, p31, p39

        def extract(images):
            images = images.astype(jnp.float32)
            outs = []
            img_l = images
            for lv in range(cfg.n_levels):
                if lv > 0:
                    img_l = kernels.resize_bilinear(img_l, sizes[lv][0], sizes[lv][1])
                outs.append(level_keypoints_and_patches(img_l, per_level[lv], lv))
            B = images.shape[0]
            xy = jnp.concatenate([o[0] for o in outs], axis=1)
            resp = jnp.concatenate([o[1] for o in outs], axis=1)
            octave = jnp.concatenate([o[2] for o in outs], axis=1)
            valid = jnp.concatenate([o[3] for o in outs], axis=1)
            p31 = jnp.concatenate([o[4] for o in outs], axis=1)  # (B, N, 31, 31)
            p39 = jnp.concatenate([o[5] for o in outs], axis=1)  # (B, N, 39, 39)
            # Materialize the patch blocks before the descriptor matmuls:
            # without the barrier XLA fuses the per-level patch gathers into
            # the (A*512, 1521) tap contraction's operand and re-executes
            # them per MXU tile — the composed jit cost 36 ms while every
            # stage measured <5 ms standalone (KNOWN_ISSUES #2).
            p31, p39 = jax.lax.optimization_barrier((p31, p39))
            N = p31.shape[1]

            # IC-angle: one moment matmul for the whole frame. (A dense moment
            # conv + per-keypoint taps looks cheaper on paper but the
            # conv->gather pair lowers to a serialized per-element path on
            # this backend: 780ms vs <1ms.)
            m_both = jax.lax.dot(
                p31.reshape(B * N, 31 * 31), moment_masks,
                precision=jax.lax.Precision.DEFAULT, preferred_element_type=jnp.float32,
            )  # (B*N, 2)
            angle = jnp.arctan2(m_both[:, 1], m_both[:, 0])

            # rBRIEF, rotation quantized to N_ANGLE_BINS (12 deg, the
            # ORB-paper lookup scheme). The per-bin tap tables are
            # compile-time CONSTANT index sets, so selecting every bin's 512
            # samples is a static permutation copy (jnp.take) that streams at
            # HBM bandwidth — unlike dynamic per-keypoint gathers (serialize)
            # or a (A*512, 1521) one-hot matmul (93 GFLOP of 97% waste, the
            # previous design: ~3 ms single / ~17 ms at 8 streams). Patches
            # quantize to uint8 first: 4x less traffic, and the reference
            # compares *integer* blurred-image values anyway
            # (computeOrbDescriptor on the u8 blurred mat, ORBextractor.cc:108).
            pf8 = jnp.clip(p39.reshape(B * N, side2) + 0.5, 0.0, 255.0).astype(jnp.uint8)
            sel = jnp.take(pf8, tap_table.reshape(-1), axis=1).reshape(
                B * N, N_ANGLE_BINS, 512)
            bits = (sel[:, :, 0::2] < sel[:, :, 1::2]).astype(jnp.uint32)  # (BN, A, 256)
            packed = jnp.sum(
                bits.reshape(B * N, N_ANGLE_BINS, 32, 8) * byte_weights[None, None, None, :],
                axis=3,
            )  # (BN, A, 32)
            two_pi = 2.0 * np.pi
            bin_idx = jnp.round(jnp.mod(angle, two_pi) / (two_pi / N_ANGLE_BINS)).astype(jnp.int32)
            bin_idx = jnp.mod(bin_idx, N_ANGLE_BINS)
            desc = jnp.take_along_axis(packed, bin_idx[:, None, None], axis=1)[:, 0]
            desc = desc.astype(jnp.uint8).reshape(B, N, 32)

            return FrameFeatures(
                xy=xy, response=resp, angle=angle.reshape(B, N), octave=octave,
                desc=desc, valid=valid,
            )

        return jax.jit(extract)

    def extract(self, images) -> FrameFeatures:
        """images: (B, H, W) uint8/float32 grayscale in [0, 255].

        Float input is quantized to the 8-bit lattice at entry, with the
        SAME rounding Tracking.grab_image uses for its uint8 device upload:
        the whole pipeline — like the reference, which tracks 8-bit
        grayscale end to end (cv::imread grayscale, main.cc:85-96) — sees
        one pixel representation no matter which door an image came in
        through. (Trained-vocabulary descriptors must match tracked-frame
        descriptors bit-for-bit; a float/uint8 split between the corpus
        and the live frames measurably degrades BoW place recognition.)"""
        if images.ndim == 2:
            images = images[None]
        if images.dtype != np.uint8:  # uint8 input passes through untouched
            images = np.clip(np.asarray(images) + 0.5, 0.0, 255.0).astype(np.uint8)
        return self._extract_jit(images.shape[-2], images.shape[-1])(jnp.asarray(images))
