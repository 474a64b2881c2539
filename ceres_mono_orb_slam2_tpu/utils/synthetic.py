"""Synthetic sequence generator for integration tests and benchmarks.

The reference was validated only by running TUM/KITTI datasets end-to-end
(SURVEY.md §4 — it ships no tests). Those datasets aren't available in this
environment, so this module ray-traces a deterministic moving-camera sequence
through a world of textured planes, with exact ground-truth trajectory —
enabling ATE assertions the reference never had.

Planes (not sparse dots) matter: rBRIEF samples a 39px window, so the world
must be textured *everywhere* a keypoint can fire or descriptor bits reduce
to sensor-noise coin flips. Every rendered pixel is geometrically consistent
(true plane intersection, bilinear texture sampling), so multi-view geometry
on these images is exact up to rendering quantization.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List

import numpy as np

import jax.numpy as jnp

from ceres_mono_orb_slam2_tpu.ops import lie


@dataclass
class Plane:
    origin: np.ndarray  # (3,) world point of texture (0, 0)
    ex: np.ndarray  # (3,) unit in-plane x axis, texture u direction
    ey: np.ndarray  # (3,) unit in-plane y axis
    size: tuple  # (su, sv) extent in meters
    texture: np.ndarray  # (Ht, Wt) float32


@dataclass
class SyntheticSequence:
    images: np.ndarray  # (T, H, W) float32
    poses_Rcw: np.ndarray  # (T, 3, 3) ground-truth world->camera
    poses_tcw: np.ndarray  # (T, 3)
    timestamps: np.ndarray  # (T,)
    K: np.ndarray  # (3, 3)

    @property
    def n_frames(self):
        return len(self.images)

    def gt_centers(self) -> np.ndarray:
        """Camera centers in world frame, (T, 3)."""
        return np.einsum("tij,tj->ti", self.poses_Rcw.transpose(0, 2, 1), -self.poses_tcw)


def _make_texture(rng, size_uv, texel: float = 0.07):
    """Corner-rich, band-limited texture for a plane of physical size
    (su, sv) meters. `texel` sets physical resolution; at f=500, z~10 m a
    0.07 m texel projects to ~3.5 px so bilinear rendering stays below
    Nyquist and descriptors are stable across subpixel motion (finer texture
    aliases and turns rBRIEF bits into coin flips)."""
    su, sv = size_uv
    wt = max(int(su / texel), 32)
    ht = max(int(sv / texel), 32)
    tex = rng.uniform(50, 110, (ht, wt)).astype(np.float32)
    # smooth the noise floor
    for _ in range(2):
        tex = (tex + np.roll(tex, 1, 0) + np.roll(tex, 1, 1) + np.roll(tex, (1, 1), (0, 1))) / 4
    n_blobs = (ht * wt) // 64
    for _ in range(n_blobs):
        y = rng.integers(0, ht - 10)
        x = rng.integers(0, wt - 10)
        hh = rng.integers(3, 10)
        ww = rng.integers(3, 10)
        tex[y : y + hh, x : x + ww] = rng.uniform(120, 245)
    return tex


def _bilinear(tex, x, y):
    ht, wt = tex.shape
    x0 = np.clip(np.floor(x).astype(np.int64), 0, wt - 2)
    y0 = np.clip(np.floor(y).astype(np.int64), 0, ht - 2)
    fx = np.clip(x - x0, 0, 1)
    fy = np.clip(y - y0, 0, 1)
    v00 = tex[y0, x0]
    v01 = tex[y0, x0 + 1]
    v10 = tex[y0 + 1, x0]
    v11 = tex[y0 + 1, x0 + 1]
    return (1 - fy) * ((1 - fx) * v00 + fx * v01) + fy * ((1 - fx) * v10 + fx * v11)


def _render(planes: List[Plane], K, Rcw, tcw, h, w, background=25.0):
    Rwc = Rcw.T
    c = -Rwc @ tcw  # camera center in world
    us, vs = np.meshgrid(np.arange(w, dtype=np.float64), np.arange(h, dtype=np.float64))
    d_cam = np.stack(
        [(us - K[0, 2]) / K[0, 0], (vs - K[1, 2]) / K[1, 1], np.ones_like(us)], axis=-1
    )
    d_world = d_cam @ Rwc.T  # (h, w, 3)

    img = np.full((h, w), background, np.float32)
    best_s = np.full((h, w), np.inf)
    for pl in planes:
        n = np.cross(pl.ex, pl.ey)
        denom = d_world @ n
        denom = np.where(np.abs(denom) < 1e-12, 1e-12, denom)
        s = ((pl.origin - c) @ n) / denom  # ray parameter
        X = c + s[..., None] * d_world
        rel = X - pl.origin
        tu = rel @ pl.ex
        tv = rel @ pl.ey
        ht, wt = pl.texture.shape
        su, sv = pl.size
        inside = (s > 0.1) & (tu >= 0) & (tu < su) & (tv >= 0) & (tv < sv) & (s < best_s)
        tx = tu / su * (wt - 1)
        ty = tv / sv * (ht - 1)
        vals = _bilinear(pl.texture, tx, ty)
        img = np.where(inside, vals.astype(np.float32), img)
        best_s = np.where(inside, s, best_s)
    return img


def default_world(rng, extent: float = 20.0) -> List[Plane]:
    """A corridor-like world: back wall + angled side wall + floor."""
    planes = []
    planes.append(
        Plane(
            origin=np.array([-5.0, -4.0, 10.0]),
            ex=np.array([1.0, 0.0, 0.05]) / np.linalg.norm([1.0, 0.0, 0.05]),
            ey=np.array([0.0, 1.0, 0.0]),
            size=(extent + 10, 8.0),
            texture=_make_texture(rng, (extent + 10, 8.0), texel=0.07),
        )
    )
    planes.append(
        Plane(
            origin=np.array([-5.0, -4.0, 6.0]),
            ex=np.array([0.9, 0.0, 0.45]) / np.linalg.norm([0.9, 0.0, 0.45]),
            ey=np.array([0.0, 1.0, 0.0]),
            size=(6.0, 8.0),
            texture=_make_texture(rng, (6.0, 8.0), texel=0.045),
        )
    )
    planes.append(
        Plane(
            origin=np.array([-5.0, 2.5, 2.0]),
            ex=np.array([1.0, 0.0, 0.0]),
            ey=np.array([0.0, 0.35, 0.94]) / np.linalg.norm([0.0, 0.35, 0.94]),
            size=(extent + 10, 10.0),
            texture=_make_texture(rng, (extent + 10, 10.0), texel=0.06),
        )
    )
    return planes


def make_sequence(
    n_frames: int = 40,
    h: int = 480,
    w: int = 640,
    fx: float = 500.0,
    fy: float = 500.0,
    motion: str = "strafe",  # "strafe" | "forward" | "orbit"
    step: float = 0.06,
    seed: int = 0,
    noise: float = 1.0,
    fps: float = 30.0,
) -> SyntheticSequence:
    rng = np.random.default_rng(seed)
    cx, cy = w / 2.0, h / 2.0
    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float32)
    planes = default_world(rng, extent=max(n_frames * step * 1.5, 10.0))

    Rs, ts, images, stamps = [], [], [], []
    for k in range(n_frames):
        if motion == "strafe":
            c = np.array([k * step, 0.1 * np.sin(k * 0.3), 0.04 * np.sin(k * 0.2)], np.float64)
            w_rot = np.array([0.003 * np.sin(k * 0.5), 0.004 * k, 0.001 * k], np.float64)
        elif motion == "forward":
            c = np.array([0.3 * k * step, 0.0, 0.6 * k * step], np.float64)
            w_rot = np.array([0.0, 0.002 * k, 0.0], np.float64)
        else:  # orbit
            ang = 0.015 * k
            c = np.array([4.0 * np.sin(ang), 0.0, 4.0 * (1 - np.cos(ang))], np.float64)
            w_rot = np.array([0.0, ang, 0.0], np.float64)
        Rwc = np.asarray(lie.so3_exp(jnp.asarray(w_rot)), np.float64)
        Rcw = Rwc.T
        tcw = -Rcw @ c

        img = _render(planes, K.astype(np.float64), Rcw, tcw, h, w)
        if noise > 0:
            img = img + rng.standard_normal(img.shape).astype(np.float32) * noise
        images.append(np.clip(img, 0, 255).astype(np.float32))
        Rs.append(Rcw.astype(np.float32))
        ts.append(tcw.astype(np.float32))
        stamps.append(k / fps)

    return SyntheticSequence(
        images=np.stack(images),
        poses_Rcw=np.stack(Rs),
        poses_tcw=np.stack(ts),
        timestamps=np.array(stamps, np.float64),
        K=K,
    )


def ate_rmse(est_t: np.ndarray, gt_t: np.ndarray, align: bool = True) -> float:
    """Absolute trajectory error (camera centers) after sim3 alignment (the
    standard mono evaluation; mono scale is free so alignment includes it)."""
    est = est_t.astype(np.float64)
    gt = gt_t.astype(np.float64)
    if align:
        ce, cg = est.mean(0), gt.mean(0)
        e0, g0 = est - ce, gt - cg
        s = np.sqrt((g0**2).sum() / max((e0**2).sum(), 1e-12))
        U, _, Vt = np.linalg.svd(g0.T @ e0)
        D = np.diag([1, 1, np.sign(np.linalg.det(U @ Vt))])
        R = U @ D @ Vt
        est = (s * (R @ e0.T)).T + cg
        gt = g0 + cg
    return float(np.sqrt(np.mean(np.sum((est - gt) ** 2, axis=-1))))
