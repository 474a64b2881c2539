"""Batched (whole-neighborhood) device kernels for LocalMapping.

The reference's CreateNewMapPoints / SearchInNeighbors (LocalMapping.cc:
196-396, 398-488) loop over ~20 covisible keyframes, issuing one epipolar
search / fuse per neighbor — cheap on a CPU, but on a remote TPU every
dispatch+sync is a ~15-30 ms round trip, so a keyframe cost seconds
(profiled: 1.4 s triangulation + 2.1 s fuse per keyframe, >80 round trips).

TPU-first shape: stack the neighborhood into one batch axis and vmap the
existing single-pair kernels — ONE dispatch + ONE device_get per stage.
The per-neighbor Hamming matmuls batch on the MXU where extra rows are
nearly free. B is a fixed compile-time bucket so the session compiles each
kernel once.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ceres_mono_orb_slam2_tpu.ops import matcher, twoview
from ceres_mono_orb_slam2_tpu.ops.frustum import frustum_and_scale


def pack_bits_host(mask: np.ndarray) -> np.ndarray:
    """(..., N) bool -> (..., ceil(N/32)) int32 little-bit-endian words."""
    N = mask.shape[-1]
    W = (N + 31) // 32
    m = np.zeros(mask.shape[:-1] + (W * 32,), np.uint32)
    m[..., :N] = mask
    m = m.reshape(mask.shape[:-1] + (W, 32))
    weights = np.uint32(1) << np.arange(32, dtype=np.uint32)
    return (m * weights).sum(-1, dtype=np.uint32).view(np.int32)


def unpack_bits_dev(words: jnp.ndarray, N: int) -> jnp.ndarray:
    """Traced inverse of pack_bits_host: (..., W) int32 -> (..., N) bool."""
    w = words.astype(jnp.uint32)
    bits = (w[..., None] >> jnp.arange(32, dtype=jnp.uint32)) & 1
    return bits.reshape(w.shape[:-1] + (-1,))[..., :N].astype(bool)


TRI_HDR = 12  # R1 (9) + t1 (3), f32 bitcast


def pack_tri_host(R1, t1, free1, R2, t2, free2, nb_valid) -> np.ndarray:
    """ONE int32 upload carrying every triangulation input that is not
    already device-resident: the poses, the neighbor gate, and the mutable
    free-keypoint masks (mp_ids bindings change every frame; the keypoint
    payloads themselves live on device via KeyFrame.dev). Layout:
      [0:12]              R1 + t1, f32 bitcast
      [12:12+12B]         per-neighbor R2 + t2, f32 bitcast
      [12+12B:12+13B]     nb_valid
      [.. : .. + W]       free1 bit-packed (W = ceil(N/32))
      [.. : .. + B*W]     free2 bit-packed"""
    B, N = free2.shape
    W = (N + 31) // 32
    buf = np.empty(12 + 13 * B + W + B * W, np.int32)
    hdr = np.empty(12, np.float32)
    hdr[:9] = np.asarray(R1, np.float32).ravel()
    hdr[9:] = np.asarray(t1, np.float32)
    buf[:12] = hdr.view(np.int32)
    nb = np.concatenate([np.asarray(R2, np.float32).reshape(B, 9),
                         np.asarray(t2, np.float32).reshape(B, 3)], axis=1)
    buf[12:12 + 12 * B] = nb.ravel().view(np.int32)
    buf[12 + 12 * B:12 + 13 * B] = np.asarray(nb_valid, np.int32)
    buf[12 + 13 * B:12 + 13 * B + W] = pack_bits_host(free1)
    buf[12 + 13 * B + W:] = pack_bits_host(free2).ravel()
    return buf


@partial(jax.jit, static_argnames=("B", "N"))
def triangulate_with_neighbors_packed(
    K, invK, packed,
    cur_und, cur_oct, cur_ang, cur_desc,
    nb_und, nb_oct, nb_ang, nb_desc,  # tuples of B device (N, ...) arrays
    level_sigma2, scale_factors, ratio_factor, B: int, N: int,
):
    """triangulate_with_neighbors fed from DEVICE-RESIDENT keyframe payloads
    (KeyFrame.dev) + ONE packed int32 upload. The unpacked path re-uploaded
    ~17 host arrays per pass (~1.5 MB, each its own RPC through the axon
    tunnel) — the measured bulk of the 207 ms/pass triangulation stage."""
    W = (N + 31) // 32
    hdr = jax.lax.bitcast_convert_type(packed[:12], jnp.float32)
    R1 = hdr[:9].reshape(3, 3)
    t1 = hdr[9:12]
    nb = jax.lax.bitcast_convert_type(
        packed[12:12 + 12 * B], jnp.float32).reshape(B, 12)
    R2 = nb[:, :9].reshape(B, 3, 3)
    t2 = nb[:, 9:12]
    nb_valid = packed[12 + 12 * B:12 + 13 * B] > 0
    free1 = unpack_bits_dev(packed[12 + 13 * B:12 + 13 * B + W], N)
    free2 = unpack_bits_dev(
        packed[12 + 13 * B + W:].reshape(B, W), N)
    xy2 = jnp.stack(nb_und)
    oct2 = jnp.stack(nb_oct)
    ang2 = jnp.stack(nb_ang)
    desc2 = jnp.stack(nb_desc)
    return triangulate_with_neighbors(
        K, invK, R1, t1, cur_und, cur_oct, cur_ang, cur_desc, free1,
        R2, t2, xy2, oct2, ang2, desc2, free2, nb_valid,
        level_sigma2, scale_factors, ratio_factor)


def _skew(v):
    z = jnp.zeros_like(v[0])
    return jnp.array([[z, -v[2], v[1]], [v[2], z, -v[0]], [-v[1], v[0], z]])


@jax.jit
def triangulate_with_neighbors(
    K, invK,
    R1, t1,                      # current keyframe pose (3,3), (3,)
    xy1, oct1, ang1, desc1, free1,   # current KF keypoints (N,...), free = unassociated & valid
    R2, t2,                      # (B,3,3), (B,3) neighbor poses
    xy2, oct2, ang2, desc2, free2,   # (B,N,...) neighbor keypoints
    nb_valid,                    # (B,) neighbor passes the baseline/median-depth gate
    level_sigma2, scale_factors, # (L,)
    ratio_factor,                # () 1.5*scale_factor
):
    """Epipolar search + triangulation + acceptance gates against ALL
    neighbors in one call (reference CreateNewMapPoints inner loop,
    LocalMapping.cc:196-396). Returns per-neighbor (idx (B,N), good (B,N),
    X (B,N,3) world points)."""
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    bits1 = matcher.unpack_bits_pm1(desc1)
    O1 = -R1.T @ t1
    P1 = jnp.concatenate([R1, t1[:, None]], axis=1)  # (3,4)
    xn1 = jnp.stack([(xy1[:, 0] - cx) / fx, (xy1[:, 1] - cy) / fy], axis=-1)
    sigma2_1 = level_sigma2[oct1]
    sf1 = scale_factors[oct1]

    def per_neighbor(R2b, t2b, xy2b, oct2b, ang2b, desc2b, free2b, okb):
        # F12 = K^-T [t12]x R12 K^-1 (reference ComputeF12, LocalMapping.cc:490-505)
        R12 = R1 @ R2b.T
        t12 = -R12 @ t2b + t1
        F12 = invK.T @ _skew(t12) @ R12 @ invK
        # epipole of camera 1 in image 2
        C2 = R2b @ O1 + t2b
        zc = jnp.where(jnp.abs(C2[2]) < 1e-9, 1e-9, C2[2])
        ep2 = jnp.stack([fx * C2[0] / zc + cx, fy * C2[1] / zc + cy])

        idx, dist, valid = matcher.search_for_triangulation(
            xy1, oct1, ang1, bits1, free1,
            xy2b, oct2b, ang2b, matcher.unpack_bits_pm1(desc2b), free2b & okb,
            F12, ep2, level_sigma2, scale_factors,
        )

        # triangulate every slot against its matched partner (normalized
        # coordinates: pixel-scale DLT is too ill-conditioned for f32)
        uv2 = xy2b[idx]
        xn2 = jnp.stack([(uv2[:, 0] - cx) / fx, (uv2[:, 1] - cy) / fy], axis=-1)
        P2 = jnp.concatenate([R2b, t2b[:, None]], axis=1)
        N = xy1.shape[0]
        X = twoview.triangulate_dlt(
            jnp.broadcast_to(P1, (N, 3, 4)), jnp.broadcast_to(P2, (N, 3, 4)),
            xn1, xn2)

        # acceptance gates (reference LocalMapping.cc:264-396)
        ray1 = jnp.concatenate([xn1, jnp.ones_like(xn1[:, :1])], -1) @ R1
        ray2 = jnp.concatenate([xn2, jnp.ones_like(xn2[:, :1])], -1) @ R2b
        cos_par = jnp.sum(ray1 * ray2, -1) / jnp.maximum(
            jnp.linalg.norm(ray1, axis=-1) * jnp.linalg.norm(ray2, axis=-1), 1e-12)
        good = valid & (cos_par > 0) & (cos_par < 0.9998)
        z1 = (X @ R1.T + t1)[:, 2]
        z2 = (X @ R2b.T + t2b)[:, 2]
        good &= (z1 > 0) & (z2 > 0)

        def chi2(R, t, uv, sigma2):
            Xc = X @ R.T + t
            zs = jnp.maximum(Xc[:, 2], 1e-9)
            u = fx * Xc[:, 0] / zs + cx
            v = fy * Xc[:, 1] / zs + cy
            return ((u - uv[:, 0]) ** 2 + (v - uv[:, 1]) ** 2) / sigma2

        good &= chi2(R1, t1, xy1, sigma2_1) <= 5.991
        good &= chi2(R2b, t2b, uv2, level_sigma2[oct2b[idx]]) <= 5.991
        # scale consistency (reference :356-375)
        O2b = -R2b.T @ t2b
        d1 = jnp.linalg.norm(X - O1, axis=-1)
        d2 = jnp.linalg.norm(X - O2b, axis=-1)
        rd = d2 / jnp.maximum(d1, 1e-12)
        ro = sf1 / scale_factors[oct2b[idx]]
        good &= (rd * ratio_factor > ro) & (rd < ro * ratio_factor)
        good &= (d1 > 1e-9) & (d2 > 1e-9) & okb
        return idx, good, X

    return jax.vmap(per_neighbor)(R2, t2, xy2, oct2, ang2, desc2, free2, nb_valid)


def pack_fuse_host(R, t, mvalid, pos, normal, mind, maxd, desc) -> np.ndarray:
    """ONE int32 upload for the forward-fuse batch: target poses, the
    per-target point-validity mask (bit-packed), and the shared map-point
    block (positions/normals/depth-range f32-bitcast + descriptors). The
    target keypoint payloads stay device-resident (KeyFrame.dev). Layout:
      [0:12B]                 per-target R + t, f32 bitcast
      [12B:12B+B*Wm]          mvalid bits (Wm = ceil(M/32))
      [..:..+8M]              pos(3M) + normal(3M) + mind(M) + maxd(M), f32
      [..:..+8M]              desc (M,32)u8 viewed as (M,8)i32"""
    B = R.shape[0]
    M = pos.shape[0]
    Wm = (M + 31) // 32
    buf = np.empty(12 * B + B * Wm + 8 * M + 8 * M, np.int32)
    nb = np.concatenate([np.asarray(R, np.float32).reshape(B, 9),
                         np.asarray(t, np.float32).reshape(B, 3)], axis=1)
    buf[:12 * B] = nb.ravel().view(np.int32)
    buf[12 * B:12 * B + B * Wm] = pack_bits_host(mvalid).ravel()
    o = 12 * B + B * Wm
    fblock = np.concatenate([
        np.asarray(pos, np.float32).ravel(),
        np.asarray(normal, np.float32).ravel(),
        np.asarray(mind, np.float32), np.asarray(maxd, np.float32)])
    buf[o:o + 8 * M] = fblock.view(np.int32)
    buf[o + 8 * M:] = np.ascontiguousarray(
        np.asarray(desc, np.uint8)).view(np.int32).ravel()
    return buf


@partial(jax.jit, static_argnames=("B", "M", "n_levels", "th"))
def fuse_into_targets_packed(
    K, packed,
    kp_und, kp_oct, kp_desc, kp_valid,  # tuples of B device (N,...) arrays
    log_scale, scale_factors, inv_level_sigma2, bounds,
    B: int, M: int, n_levels: int = 8, th: float = 3.0,
):
    """fuse_into_targets fed from DEVICE-RESIDENT target keyframe payloads
    + ONE packed upload (see pack_fuse_host)."""
    Wm = (M + 31) // 32
    nb = jax.lax.bitcast_convert_type(
        packed[:12 * B], jnp.float32).reshape(B, 12)
    R = nb[:, :9].reshape(B, 3, 3)
    t = nb[:, 9:12]
    mvalid = unpack_bits_dev(
        packed[12 * B:12 * B + B * Wm].reshape(B, Wm), M)
    o = 12 * B + B * Wm
    fblock = jax.lax.bitcast_convert_type(packed[o:o + 8 * M], jnp.float32)
    pos = fblock[:3 * M].reshape(M, 3)
    normal = fblock[3 * M:6 * M].reshape(M, 3)
    mind = fblock[6 * M:7 * M]
    maxd = fblock[7 * M:8 * M]
    desc = jax.lax.bitcast_convert_type(
        packed[o + 8 * M:].reshape(M, 8), jnp.uint8).reshape(M, 32)
    return fuse_into_targets(
        K, R, t, jnp.stack(kp_und), jnp.stack(kp_oct), jnp.stack(kp_desc),
        jnp.stack(kp_valid), pos, normal, mind, maxd, desc, mvalid,
        log_scale, n_levels, scale_factors, inv_level_sigma2,
        bounds=bounds, th=th)


@partial(jax.jit, static_argnames=("n_levels", "th"))
def fuse_into_targets(
    K, R, t,                        # (B,3,3), (B,3) target keyframe poses
    kp_xy, kp_oct, kp_desc, kp_valid,  # (B,N,...) target keypoints
    pos, normal, mind, maxd, desc,  # (M,...) shared map-point block
    mvalid,                         # (B,M) per-target point validity (point
                                    # exists AND target doesn't observe it yet)
    log_scale, n_levels, scale_factors, inv_level_sigma2,
    bounds=None,
    th: float = 3.0,
):
    """Project one map-point block into ALL target keyframes and run the
    fuse search (reference ORBmatcher::Fuse, ORBmatcher.cc:724-842) as one
    batched call. `bounds` = undistorted image bounds [min_x, max_x, min_y,
    max_y] — the reference's pKF->IsInImage(u,v) gate (ORBmatcher.cc:745);
    None disables the gate. Returns (idx (B,M), valid (B,M))."""
    if bounds is None:
        bounds = jnp.array([-1e6, 1e6, -1e6, 1e6], jnp.float32)
    pr_bits = matcher.unpack_bits_pm1(desc)

    def per_target(Rb, tb, xyb, octb, descb, kvb, mvb):
        uv, level, viewcos, visible = frustum_and_scale(
            Rb, tb, K, bounds, pos, normal, mind, maxd, mvb,
            log_scale, n_levels)
        idx, dist, valid = matcher.search_fuse(
            xyb, octb, matcher.unpack_bits_pm1(descb), kvb,
            uv, level, pr_bits, visible, scale_factors, th=th,
            inv_level_sigma2=inv_level_sigma2)
        return idx, valid

    idx, valid = jax.vmap(per_target)(R, t, kp_xy, kp_oct, kp_desc, kp_valid,
                                      mvalid)
    return idx, valid
