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
    # Multi-scale rectangles with continuous intensities. CAUTION: flat
    # axis-aligned blobs alone form a quasi-lattice of near-identical corners
    # on a plane; association sliding by one blob is homography-consistent and
    # lets the tracked pose drift freely at subpixel residuals (found the hard
    # way). The multi-octave continuous noise added below makes every
    # descriptor-sized window globally unique, like real-world texture.
    n_blobs = (ht * wt) // 56
    sizes = np.exp(rng.uniform(np.log(3), np.log(26), (n_blobs, 2))).astype(np.int64)
    for (hh, ww) in sizes:
        y = rng.integers(0, max(ht - hh, 1))
        x = rng.integers(0, max(wt - ww, 1))
        # each rectangle gets a unique intensity ramp: flat equal-intensity
        # blobs produce near-identical descriptors that alias under windowed
        # matching (wrong-blob lock-in)
        base = rng.uniform(70, 220)
        gy, gx = rng.uniform(-8, 8, 2)
        yy = np.arange(hh)[:, None]
        xx = np.arange(ww)[None, :]
        tex[y : y + hh, x : x + ww] = base + gy * yy + gx * xx

    def octave(res_div, amp):
        small = rng.uniform(-1.0, 1.0, (max(ht // res_div, 2), max(wt // res_div, 2)))
        ys = np.linspace(0, small.shape[0] - 1, ht)
        xs = np.linspace(0, small.shape[1] - 1, wt)
        y0 = np.clip(ys.astype(np.int64), 0, small.shape[0] - 2)
        x0 = np.clip(xs.astype(np.int64), 0, small.shape[1] - 2)
        fy = (ys - y0)[:, None]
        fx = (xs - x0)[None, :]
        v = (
            (1 - fy) * (1 - fx) * small[y0][:, x0]
            + (1 - fy) * fx * small[y0][:, x0 + 1]
            + fy * (1 - fx) * small[y0 + 1][:, x0]
            + fy * fx * small[y0 + 1][:, x0 + 1]
        )
        return amp * v

    tex = tex + octave(32, 45.0) + octave(12, 32.0) + octave(5, 22.0)
    return np.clip(tex, 5, 250).astype(np.float32)


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
    """A 'wall with posters' world: two near-fronto-parallel walls at
    different depths plus floating, mostly camera-facing quads.

    Design constraints learned the hard way:
    - NO grazing-incidence surfaces along the trajectory (an angled side wall
      / oblique floor compresses into aliased self-similar stripes at some x
      and systematically corrupts matching right there);
    - depth variation everywhere (quads + two wall depths) so uniformly
      shifted association sets are geometrically inconsistent;
    - quads tilted at most ~25 degrees so their texture stays well-sampled.
    """
    planes = []
    planes.append(
        Plane(
            origin=np.array([-6.0, -4.0, 10.0]),
            ex=np.array([1.0, 0.0, 0.04]) / np.linalg.norm([1.0, 0.0, 0.04]),
            ey=np.array([0.0, 1.0, 0.0]),
            size=(extent + 14, 8.0),
            texture=_make_texture(rng, (extent + 14, 8.0), texel=0.07),
        )
    )
    # mid-depth wall band strips (like furniture fronts), alternating segments
    seg = 3.0
    x0 = -4.0
    while x0 < extent + 4.0:
        if rng.random() < 0.5:
            zc = rng.uniform(6.0, 7.5)
            yc = rng.uniform(-3.0, 0.5)
            planes.append(
                Plane(
                    origin=np.array([x0, yc, zc]),
                    ex=np.array([1.0, 0.0, rng.uniform(-0.08, 0.08)]),
                    ey=np.array([0.0, 1.0, 0.0]),
                    size=(seg * rng.uniform(0.6, 1.0), rng.uniform(1.5, 3.0)),
                    texture=_make_texture(rng, (seg, 2.5), texel=0.05),
                )
            )
        x0 += seg
    # floating quads, near fronto-parallel
    n_quads = max(int((extent + 10) * 1.2), 12)
    for _ in range(n_quads):
        cx_ = rng.uniform(-3.0, extent + 3.0)
        cy_ = rng.uniform(-2.2, 2.2)
        cz_ = rng.uniform(3.5, 8.0)
        tilt = rng.uniform(-0.4, 0.4, 2)  # <= ~22 deg from fronto-parallel
        ex = np.array([1.0, 0.0, tilt[0]])
        ex /= np.linalg.norm(ex)
        ey = np.array([0.0, 1.0, tilt[1]])
        ey -= ex * (ey @ ex)
        ey /= np.linalg.norm(ey)
        size = (rng.uniform(0.6, 1.4), rng.uniform(0.6, 1.4))
        planes.append(
            Plane(
                origin=np.array([cx_, cy_, cz_]) - ex * size[0] / 2 - ey * size[1] / 2,
                ex=ex,
                ey=ey,
                size=size,
                texture=_make_texture(rng, size, texel=0.035),
            )
        )
    return planes


def ring_world(rng, radius: float = 8.0) -> List[Plane]:
    """Textured wall segments arranged in a ring facing inward plus floating
    quads — the loop-closure world: a camera orbiting inside and looking
    outward revisits the same walls after a full revolution."""
    planes = []
    n_seg = 26
    for i in range(n_seg):
        a0 = 2 * np.pi * i / n_seg
        a1 = 2 * np.pi * (i + 1) / n_seg
        p0 = np.array([radius * np.sin(a0), -3.0, radius * np.cos(a0)])
        p1 = np.array([radius * np.sin(a1), -3.0, radius * np.cos(a1)])
        ex = p1 - p0
        seg_len = np.linalg.norm(ex)
        ex = ex / seg_len
        ey = np.array([0.0, 1.0, 0.0])
        planes.append(Plane(
            origin=p0, ex=ex, ey=ey, size=(seg_len, 6.0),
            texture=_make_texture(rng, (seg_len, 6.0), texel=0.06),
        ))
    # floating quads at mid-radius facing roughly inward
    for _ in range(28):
        ang = rng.uniform(0, 2 * np.pi)
        rad = rng.uniform(5.0, 7.0)
        c = np.array([rad * np.sin(ang), rng.uniform(-1.5, 1.5), rad * np.cos(ang)])
        tangent = np.array([np.cos(ang), 0.0, -np.sin(ang)])
        ex = tangent + rng.uniform(-0.3, 0.3) * np.array([0, 0, 1])
        ex /= np.linalg.norm(ex)
        ey = np.array([0.0, 1.0, 0.0])
        ey = ey - ex * (ey @ ex)
        ey /= np.linalg.norm(ey)
        size = (rng.uniform(0.7, 1.4), rng.uniform(0.7, 1.4))
        planes.append(Plane(
            origin=c - ex * size[0] / 2 - ey * size[1] / 2, ex=ex, ey=ey,
            size=size, texture=_make_texture(rng, size, texel=0.035),
        ))
    return planes


def make_sequence(
    n_frames: int = 40,
    h: int = 480,
    w: int = 640,
    fx: float = 500.0,
    fy: float = 500.0,
    motion: str = "strafe",  # "strafe" | "forward" | "orbit" | "circle" | "spiral"
    step: float = 0.06,
    seed: int = 0,
    noise: float = 1.0,
    fps: float = 30.0,
    cache: bool = True,
) -> SyntheticSequence:
    """Ray-traced synthetic sequence. Rendering costs ~6 s/frame so results
    are cached on disk keyed by all generation parameters."""
    if cache:
        import os

        key = f"v1_{n_frames}_{h}_{w}_{fx}_{fy}_{motion}_{step}_{seed}_{noise}_{fps}"
        cache_dir = os.environ.get("SEQ_CACHE_DIR", "/tmp/seq_cache")
        path = os.path.join(cache_dir, key + ".npz")
        if os.path.exists(path):
            d = np.load(path)
            return SyntheticSequence(
                images=d["images"], poses_Rcw=d["poses_Rcw"], poses_tcw=d["poses_tcw"],
                timestamps=d["timestamps"], K=d["K"],
            )
        seq = make_sequence(n_frames, h, w, fx, fy, motion, step, seed, noise, fps, cache=False)
        os.makedirs(cache_dir, exist_ok=True)
        tmp = path + ".tmp.npz"  # savez appends .npz unless already suffixed
        np.savez_compressed(
            tmp, images=seq.images, poses_Rcw=seq.poses_Rcw, poses_tcw=seq.poses_tcw,
            timestamps=seq.timestamps, K=seq.K,
        )
        os.replace(tmp, path)
        return seq

    rng = np.random.default_rng(seed)
    cx, cy = w / 2.0, h / 2.0
    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float32)
    if motion in ("circle", "spiral"):
        planes = ring_world(rng)
    else:
        planes = default_world(rng, extent=max(n_frames * step * 1.5, 10.0))

    Rs, ts, images, stamps = [], [], [], []
    for k in range(n_frames):
        if motion == "strafe":
            c = np.array([k * step, 0.1 * np.sin(k * 0.3), 0.04 * np.sin(k * 0.2)], np.float64)
            w_rot = np.array([0.003 * np.sin(k * 0.5), 0.004 * k, 0.001 * k], np.float64)
        elif motion == "forward":
            c = np.array([0.3 * k * step, 0.0, 0.6 * k * step], np.float64)
            w_rot = np.array([0.0, 0.002 * k, 0.0], np.float64)
        elif motion == "circle":
            # camera on a radius-3 circle about the origin, looking radially
            # outward; revisits the start after 2*pi/step frames
            a = step * k
            c = np.array([3.0 * np.sin(a), 0.02 * np.sin(3 * a), 3.0 * np.cos(a)], np.float64)
            w_rot = np.array([0.0, a, 0.0], np.float64)
        elif motion == "spiral":
            # circle + a slow vertical rise spanning the ring walls' height:
            # each revolution re-observes the same walls (loop closure fires
            # every lap) from a slightly higher band, so live keyframes
            # ACCUMULATE across revolutions under the reference's 90 %
            # redundancy culling rule instead of saturating at one band's
            # worth — the KITTI-style sustained-map-growth trajectory.
            # ABSOLUTE rise rate (not normalized by n_frames) so any prefix
            # of a longer render is the same trajectory: render blocks are
            # shared between runs of different lengths
            a = step * k
            y = -1.3 + 0.0013 * k
            c = np.array([3.0 * np.sin(a), y + 0.02 * np.sin(3 * a),
                          3.0 * np.cos(a)], np.float64)
            w_rot = np.array([0.0, a, 0.0], np.float64)
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


def _resample_texture(tex: np.ndarray, th: int, tw: int) -> np.ndarray:
    ys = np.linspace(0, tex.shape[0] - 1, th)
    xs = np.linspace(0, tex.shape[1] - 1, tw)
    return _bilinear(tex, xs[None, :].repeat(th, 0), ys[:, None].repeat(tw, 1)).astype(np.float32)


def render_frames_device(planes: List[Plane], K, Rcw, tcw, h: int, w: int,
                         background: float = 25.0, chunk: int = 8,
                         tex_h: int = 160, tex_w: int = 512,
                         dist: np.ndarray = None) -> np.ndarray:
    """Device (jit) port of `_render`: the per-pixel plane-intersection ray
    tracer, vmapped over planes and batched over frames. The numpy renderer
    costs ~6 s/frame; this runs in milliseconds on an accelerator, which is
    what makes a full-length rendered benchmark sequence feasible at bench
    time (bench.py full-system metric) without a pre-populated disk cache.
    Textures are resampled to a common (tex_h, tex_w) so all planes pack into
    one (P, th, tw) tensor; sampling is bilinear in normalized coordinates
    either way, so the scene content is equivalent."""
    import jax
    from functools import partial

    P = len(planes)
    origin = np.stack([p.origin for p in planes]).astype(np.float32)
    ex = np.stack([p.ex for p in planes]).astype(np.float32)
    ey = np.stack([p.ey for p in planes]).astype(np.float32)
    size = np.array([p.size for p in planes], np.float32)
    tex = np.stack([_resample_texture(p.texture, tex_h, tex_w) for p in planes])

    @partial(jax.jit, static_argnames=("hh", "ww"))
    def render_batch(jorigin, jex, jey, jsize, jtex, jK, jRcw, jtcw, hh: int, ww: int):
        us, vs = jnp.meshgrid(jnp.arange(ww, dtype=jnp.float32),
                              jnp.arange(hh, dtype=jnp.float32))
        if dist is not None:
            # distorted-lens rendering: the ray through output pixel (u, v)
            # is the one whose DISTORTED projection lands there — undistort
            # the pixel grid through the OpenCV k1 k2 p1 p2 [k3] model
            # (same model Frame undistorts keypoints with, Frame.cc:329-355)
            from ceres_mono_orb_slam2_tpu.ops import camera as cam_ops

            grid = jnp.stack([us.reshape(-1), vs.reshape(-1)], axis=-1)
            und = cam_ops.undistort_points(grid, jK, jnp.asarray(dist.astype(np.float32)))
            d_cam = jnp.stack([(und[:, 0] - jK[0, 2]) / jK[0, 0],
                               (und[:, 1] - jK[1, 2]) / jK[1, 1],
                               jnp.ones_like(und[:, 0])], axis=-1).reshape(hh, ww, 3)
        else:
            d_cam = jnp.stack([(us - jK[0, 2]) / jK[0, 0],
                               (vs - jK[1, 2]) / jK[1, 1],
                               jnp.ones_like(us)], axis=-1)  # (h, w, 3)

        def one_frame(Rcw_f, tcw_f):
            Rwc = Rcw_f.T
            c = -Rwc @ tcw_f
            d_world = d_cam @ Rwc.T  # (h, w, 3)

            def one_plane(o, e1, e2, sz, tx_img):
                n = jnp.cross(e1, e2)
                denom = d_world @ n
                denom = jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
                s = ((o - c) @ n) / denom
                X = c + s[..., None] * d_world
                rel = X - o
                tu = rel @ e1
                tv = rel @ e2
                inside = (s > 0.1) & (tu >= 0) & (tu < sz[0]) & (tv >= 0) & (tv < sz[1])
                tx = jnp.clip(tu / sz[0] * (tex_w - 1), 0.0, tex_w - 1.0)
                ty = jnp.clip(tv / sz[1] * (tex_h - 1), 0.0, tex_h - 1.0)
                x0 = jnp.clip(jnp.floor(tx).astype(jnp.int32), 0, tex_w - 2)
                y0 = jnp.clip(jnp.floor(ty).astype(jnp.int32), 0, tex_h - 2)
                fx = tx - x0
                fy = ty - y0
                v00 = tx_img[y0, x0]
                v01 = tx_img[y0, x0 + 1]
                v10 = tx_img[y0 + 1, x0]
                v11 = tx_img[y0 + 1, x0 + 1]
                val = (1 - fy) * ((1 - fx) * v00 + fx * v01) + fy * ((1 - fx) * v10 + fx * v11)
                return jnp.where(inside, s, jnp.inf), val

            s_all, v_all = jax.vmap(one_plane)(jorigin, jex, jey, jsize, jtex)  # (P,h,w)
            best = jnp.argmin(s_all, axis=0)
            hit = jnp.isfinite(jnp.min(s_all, axis=0))
            img = jnp.take_along_axis(v_all, best[None], axis=0)[0]
            return jnp.where(hit, img, background)

        return jax.vmap(one_frame)(jRcw, jtcw)

    out = []
    jargs = (jnp.asarray(origin), jnp.asarray(ex), jnp.asarray(ey),
             jnp.asarray(size), jnp.asarray(tex), jnp.asarray(K.astype(np.float32)))
    n = len(Rcw)
    for i in range(0, n, chunk):
        j = min(i + chunk, n)
        # pad the last chunk to the bucket so only ONE shape compiles
        Rc = np.concatenate([Rcw[i:j]] + [Rcw[j - 1:j]] * (chunk - (j - i)))
        tc = np.concatenate([tcw[i:j]] + [tcw[j - 1:j]] * (chunk - (j - i)))
        imgs = render_batch(*jargs, jnp.asarray(Rc.astype(np.float32)),
                            jnp.asarray(tc.astype(np.float32)), h, w)
        out.append(np.asarray(imgs)[: j - i])
        # progress heartbeat: long silent renders look like a hung tunnel to
        # log-mtime watchdogs (tools/watchdog_run.sh)
        print(f"render {j}/{n}", flush=True)
    return np.concatenate(out)


def tunnel_canary():
    """Exercise the first LARGE device->host fetch of the process up front.

    The axon tunnel intermittently hangs a process's first big device_get
    forever (KNOWN_ISSUES round 5); when it does, better to hang HERE —
    one minute into the run, before the render/prewarm investment — where a
    log-watchdog (tools/watchdog_run.sh) can kill and retry cheaply. A
    process whose canary completes has not been observed to hang later.
    Staircase of sizes, with progress prints for the watchdog's mtime.

    If a fetch does not complete within `abort_s`, the process hard-exits
    with code 42: the hang is unrecoverable in-process (retry needs a fresh
    process), and exiting immediately lets watchdog_run.sh restart in ~1
    minute instead of waiting out its multi-minute log-stall window."""
    import os as _os
    import threading as _th
    import time as _time

    import jax.numpy as _jnp

    # CERES_CANARY_ABORT_S=0 disables the abort: when the device grant
    # queue is draining dead claim-waiters (each kill ADDS one), fast
    # kill/retry loops make the clog worse — a patient single client that
    # waits out the queue is then the right strategy.
    abort_s = float(_os.environ.get("CERES_CANARY_ABORT_S", "60") or 0)
    done = _th.Event()
    if abort_s <= 0:
        print("canary: abort disabled, waiting patiently", flush=True)

    def _abort():
        if abort_s <= 0:
            return
        if not done.wait(abort_s):
            print(f"canary: fetch hung >{abort_s:.0f}s, exiting 42 for "
                  "watchdog restart", flush=True)
            _os._exit(42)

    _th.Thread(target=_abort, daemon=True).start()
    for kb in (4, 64, 256, 1024):
        t0 = _time.perf_counter()
        x = _jnp.arange(kb * 256, dtype=_jnp.float32)  # kb KiB
        np.asarray(x + 1.0)
        print(f"canary {kb}KiB ok ({_time.perf_counter() - t0:.2f}s)",
              flush=True)
    done.set()


def make_rendered_sequence_device(n_frames: int, h: int, w: int, fx: float, fy: float,
                                  motion: str = "strafe", step: float = 0.06,
                                  seed: int = 0, noise: float = 1.0,
                                  fps: float = 30.0,
                                  dist: np.ndarray = None,
                                  cache_dir: str = None) -> SyntheticSequence:
    """Same worlds/trajectories as `make_sequence`, rendered on device.
    `dist`: optional (4,) or (5,) OpenCV distortion coefficients — the
    rendered images then come from a DISTORTED lens.
    `cache_dir`: if set, the rendered frames are stored/loaded as uint8 .npz
    keyed by every render parameter (the ray tracer costs ~1.7 s/frame at
    KITTI resolution through the device tunnel; endurance runs re-use the
    sequence). uint8 storage is lossless for the pipeline: the tracker
    quantizes image entries to uint8 at grab_image anyway."""
    cache = None
    if cache_dir is not None:
        import hashlib
        import os

        key = repr((n_frames, h, w, fx, fy, motion, step, seed, noise, fps,
                    None if dist is None else np.asarray(dist).tolist()))
        cache = os.path.join(
            cache_dir, "seq_" + hashlib.sha1(key.encode()).hexdigest()[:16] + ".npz")
        if os.path.exists(cache):
            z = np.load(cache)
            return SyntheticSequence(
                images=z["images"].astype(np.float32),
                poses_Rcw=z["poses_Rcw"], poses_tcw=z["poses_tcw"],
                timestamps=z["timestamps"], K=z["K"])
        os.makedirs(cache_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    cx, cy = w / 2.0, h / 2.0
    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float32)
    if motion in ("circle", "spiral"):
        planes = ring_world(rng)
    else:
        planes = default_world(rng, extent=max(n_frames * step * 1.5, 10.0))
    Rs, ts, stamps = [], [], []
    for k in range(n_frames):
        if motion == "strafe":
            c = np.array([k * step, 0.1 * np.sin(k * 0.3), 0.04 * np.sin(k * 0.2)], np.float64)
            w_rot = np.array([0.003 * np.sin(k * 0.5), 0.004 * k, 0.001 * k], np.float64)
        elif motion == "forward":
            c = np.array([0.3 * k * step, 0.0, 0.6 * k * step], np.float64)
            w_rot = np.array([0.0, 0.002 * k, 0.0], np.float64)
        elif motion == "circle":
            a = step * k
            c = np.array([3.0 * np.sin(a), 0.02 * np.sin(3 * a), 3.0 * np.cos(a)], np.float64)
            w_rot = np.array([0.0, a, 0.0], np.float64)
        elif motion == "spiral":
            # see make_sequence: per-lap vertical rise for live-KF growth;
            # absolute rate — prefixes of longer renders are identical
            a = step * k
            y = -1.3 + 0.0013 * k
            c = np.array([3.0 * np.sin(a), y + 0.02 * np.sin(3 * a),
                          3.0 * np.cos(a)], np.float64)
            w_rot = np.array([0.0, a, 0.0], np.float64)
        else:
            ang = 0.015 * k
            c = np.array([4.0 * np.sin(ang), 0.0, 4.0 * (1 - np.cos(ang))], np.float64)
            w_rot = np.array([0.0, ang, 0.0], np.float64)
        Rwc = np.asarray(lie.so3_exp(jnp.asarray(w_rot)), np.float64)
        Rcw_k = Rwc.T
        Rs.append(Rcw_k.astype(np.float32))
        ts.append((-Rcw_k @ c).astype(np.float32))
        stamps.append(k / fps)
    Rcw = np.stack(Rs)
    tcw = np.stack(ts)
    # noise must be generated over the FULL sequence in one pass for
    # block-resume determinism: draw it per-block from a per-block seeded rng
    if cache is not None and n_frames > 200:
        # BLOCK-cached render: long renders (the 2000-frame KITTI-scale
        # endurance sequence is ~60 min of device time) survive process
        # restarts — the tunnel-hang watchdog (KNOWN_ISSUES round 5) may
        # kill and retry the whole run, and without block resume every retry
        # re-rendered from frame 0
        blocks = []
        B = 200
        # block key EXCLUDES n_frames: trajectories are prefix-stable (see
        # the spiral's absolute rise rate), so a 1000-frame run reuses the
        # blocks of a 2000-frame render and vice versa
        import hashlib as _hl

        bkey = repr((h, w, fx, fy, motion, step, seed, noise, fps,
                     None if dist is None else np.asarray(dist).tolist(), B))
        bh = _hl.sha1(bkey.encode()).hexdigest()[:16]
        for bi, lo in enumerate(range(0, n_frames, B)):
            hi_f = min(lo + B, n_frames)
            need = hi_f - lo
            bpath = os.path.join(cache_dir, f"blk_{bh}_b{bi}.npz")
            if os.path.exists(bpath):
                # full cached block; shorter runs slice its prefix
                blocks.append(np.load(bpath)["images"][:need])
                continue
            imgs = render_frames_device(planes, K, Rcw[lo:hi_f], tcw[lo:hi_f],
                                        h, w, dist=dist)
            if noise > 0:
                # draw at FULL block size and slice: a partial block's noise
                # must equal the prefix of the full block's
                brng = np.random.default_rng((seed, 7919, bi))
                nz = brng.standard_normal((B,) + imgs.shape[1:]).astype(np.float32)
                imgs = imgs + nz[:need] * noise
            u8b = np.round(np.clip(imgs, 0, 255)).astype(np.uint8)
            if need == B:  # only cache full blocks (key excludes n_frames)
                np.savez(bpath + ".tmp.npz", images=u8b)
                os.replace(bpath + ".tmp.npz", bpath)
                print(f"render block {bi} [{lo}:{hi_f}] cached", flush=True)
            blocks.append(u8b)
        u8 = np.concatenate(blocks)
        images = u8.astype(np.float32)
    else:
        images = render_frames_device(planes, K, Rcw, tcw, h, w, dist=dist)
        if noise > 0:
            images = images + rng.standard_normal(images.shape).astype(np.float32) * noise
        images = np.clip(images, 0, 255).astype(np.float32)
        if cache is not None:
            # quantize the RETURNED frames too so a fresh render and a cache
            # hit are bit-identical end to end
            u8 = np.round(images).astype(np.uint8)
            images = u8.astype(np.float32)
    seq = SyntheticSequence(images=images, poses_Rcw=Rcw, poses_tcw=tcw,
                            timestamps=np.array(stamps, np.float64), K=K)
    if cache is not None:
        np.savez(cache, images=u8, poses_Rcw=Rcw, poses_tcw=tcw,
                 timestamps=seq.timestamps, K=K)
    return seq


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


def trajectory_positions(trajectory, map_, timestamps, poses_Rcw, poses_tcw,
                         exclude=frozenset()):
    """Resolve a Tracking.trajectory log (kf-relative poses, the reference's
    Tracking.cc:367-382 record) into estimated/ground-truth camera centers
    for ATE evaluation, following culled-keyframe parent chains via
    Map.resolve_kf_pose. Returns (est (K,3), gt (K,3), tracked_frames) where
    tracked_frames lists the sequence indices of every non-lost entry
    (regardless of keyframe resolvability — the frame WAS tracked).
    `exclude` frames are dropped from est/gt only (e.g. blackout frames)."""
    ts_arr = np.asarray(timestamps)
    est, gt, tracked = [], [], []
    for kf_id, R_rel, t_rel, ts, lost in trajectory:
        if lost:
            continue
        k = int(np.argmin(np.abs(ts_arr - ts)))
        tracked.append(k)
        if k in exclude:
            continue
        pose = map_.resolve_kf_pose(kf_id, R_rel, t_rel)
        if pose is None:
            continue
        Rcw, tcw = pose
        est.append(-Rcw.T @ tcw)
        gt.append(-poses_Rcw[k].T @ poses_tcw[k])
    return np.asarray(est), np.asarray(gt), tracked
