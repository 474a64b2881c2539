"""Stage-bisection profiler for the ORB extractor on TPU.

KNOWN_ISSUES #2: every stage measures <3 ms standalone but the composed jit
costs ~36 ms at the KITTI shape. This tool compiles PREFIXES of the pipeline
(pyramid only; +FAST/NMS; +selection; +patch gathers; full) and times each
compiled whole — consecutive differences attribute cost including XLA's
scheduling of the composition, which per-stage microbenchmarks miss.
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from ceres_mono_orb_slam2_tpu.ops.orb import kernels
from ceres_mono_orb_slam2_tpu.ops.orb.extractor import (
    CELL, ORBExtractor, _level_sizes, _select_level_keypoints)
from ceres_mono_orb_slam2_tpu.ops.orb.kernels import DESC_R, EDGE, HALF_PATCH
from ceres_mono_orb_slam2_tpu.utils.config import ORBConfig


def timeit(fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--h", type=int, default=376)
    ap.add_argument("--w", type=int, default=1241)
    ap.add_argument("--features", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=1)
    args = ap.parse_args()

    cfg = ORBConfig(n_features=args.features)
    ex = ORBExtractor(cfg)
    sizes = _level_sizes(args.h, args.w, cfg.n_levels, cfg.scale_factor)
    per_level = [int(n) for n in cfg.features_per_level]
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 255, (args.batch, args.h, args.w)).astype(np.float32))

    def stage_pyramid(images):
        outs = []
        img_l = images
        for lv in range(cfg.n_levels):
            if lv > 0:
                img_l = kernels.resize_bilinear(img_l, sizes[lv][0], sizes[lv][1])
            outs.append(img_l.sum())
        return jnp.stack(outs)

    def stage_fast(images):
        outs = []
        img_l = images
        for lv in range(cfg.n_levels):
            if lv > 0:
                img_l = kernels.resize_bilinear(img_l, sizes[lv][0], sizes[lv][1])
            outs.append(kernels.nms3(kernels.fast_score_map(img_l)).sum())
        return jnp.stack(outs)

    def stage_select(images):
        outs = []
        img_l = images
        for lv in range(cfg.n_levels):
            if lv > 0:
                img_l = kernels.resize_bilinear(img_l, sizes[lv][0], sizes[lv][1])
            score = kernels.nms3(kernels.fast_score_map(img_l))
            m = EDGE
            Hl, Wl = score.shape[-2:]
            border = jnp.zeros((Hl, Wl), jnp.float32).at[m:Hl - m, m:Wl - m].set(1.0)
            ys, xs, resp, valid = _select_level_keypoints(
                score * border[None], per_level[lv], cfg.ini_th_fast, cfg.min_th_fast)
            outs.append(ys.sum() + xs.sum())
        return jnp.stack(outs)

    def stage_blur(images):
        outs = []
        img_l = images
        for lv in range(cfg.n_levels):
            if lv > 0:
                img_l = kernels.resize_bilinear(img_l, sizes[lv][0], sizes[lv][1])
            score = kernels.nms3(kernels.fast_score_map(img_l))
            m = EDGE
            Hl, Wl = score.shape[-2:]
            border = jnp.zeros((Hl, Wl), jnp.float32).at[m:Hl - m, m:Wl - m].set(1.0)
            ys, xs, resp, valid = _select_level_keypoints(
                score * border[None], per_level[lv], cfg.ini_th_fast, cfg.min_th_fast)
            outs.append(kernels.gaussian_blur7(img_l).sum() + ys.sum())
        return jnp.stack(outs)

    def stage_patches(images):
        outs = []
        img_l = images
        for lv in range(cfg.n_levels):
            if lv > 0:
                img_l = kernels.resize_bilinear(img_l, sizes[lv][0], sizes[lv][1])
            score = kernels.nms3(kernels.fast_score_map(img_l))
            m = EDGE
            Hl, Wl = score.shape[-2:]
            border = jnp.zeros((Hl, Wl), jnp.float32).at[m:Hl - m, m:Wl - m].set(1.0)
            ys, xs, resp, valid = _select_level_keypoints(
                score * border[None], per_level[lv], cfg.ini_th_fast, cfg.min_th_fast)
            safe_y = jnp.where(valid, ys, m).astype(jnp.int32)
            safe_x = jnp.where(valid, xs, m).astype(jnp.int32)
            p31 = jax.vmap(lambda im, yy, xx: kernels.gather_patches(im, yy, xx, HALF_PATCH))(
                img_l, safe_y, safe_x)
            blurred = kernels.gaussian_blur7(img_l)
            p39 = jax.vmap(lambda im, yy, xx: kernels.gather_patches(im, yy, xx, DESC_R))(
                blurred, safe_y, safe_x)
            outs.append(p31.sum() + p39.sum())
        return jnp.stack(outs)

    full = ex._extract_jit(args.h, args.w)

    stages = [
        ("pyramid", stage_pyramid),
        ("+fast/nms", stage_fast),
        ("+select", stage_select),
        ("+blur", stage_blur),
        ("+patches", stage_patches),
    ]
    prev = 0.0
    for name, fn in stages:
        jf = jax.jit(fn)
        ms = timeit(jf, img)
        print(f"{name:10s} total={ms:7.2f} ms   delta={ms - prev:7.2f} ms")
        prev = ms
    ms = timeit(lambda im: full(im), img)
    print(f"{'FULL':10s} total={ms:7.2f} ms   delta={ms - prev:7.2f} ms (descriptors+angles)")


if __name__ == "__main__":
    main()
