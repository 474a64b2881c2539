"""ORB descriptor matching on the MXU.

TPU-native replacement for the reference ORBmatcher (src/ORBmatcher.cc):
instead of per-keypoint grid walks + scalar popcount loops, every search is a
dense masked Hamming-distance matrix. Descriptors unpack to {-1,+1} bit
vectors; Hamming distance lowers to one bf16 matmul on the MXU
(h = (256 - a.b)/2, exact because +-1 products are exact and accumulation is
f32). Spatial windows (the reference's GetFeaturesInArea grid), pyramid-level
windows, epipolar gates and viewing-angle radii all become boolean masks over
the distance matrix.

Reference constants kept verbatim: TH_LOW=50, TH_HIGH=100, HISTO_LENGTH=30
rotation-consistency bins (ORBmatcher.cc:35-37), ratio tests per entry point,
chi2 epipolar gate 3.84*sigma2 (CheckDistEpipolarLine, ORBmatcher.cc:128-149),
viewing-cos radius 2.5/4.0 (RadiusByViewingCos, :121-126).
"""

from __future__ import annotations

import jax
from functools import partial
import jax.numpy as jnp
import numpy as np

TH_LOW = 50
TH_HIGH = 100
HISTO_LENGTH = 30
# np (host) scalar, not jnp: a device-array constant closed over by traced
# code is fetched device->host at every lowering, which is slow over the
# axon tunnel (see ops/orb/extractor.py _bin_tap_table note).
BIG = np.int32(1 << 20)


def unpack_bits_pm1(desc_u8: jnp.ndarray, dtype=jnp.bfloat16) -> jnp.ndarray:
    """(..., 32) uint8 -> (..., 256) {-1,+1} for MXU popcount-by-matmul."""
    shifts = jnp.arange(8, dtype=jnp.uint8)
    bits = (desc_u8[..., :, None] >> shifts) & 1  # (..., 32, 8)
    bits = bits.reshape(desc_u8.shape[:-1] + (256,))
    return (bits.astype(dtype) * 2 - 1).astype(dtype)


_unpack_jit = jax.jit(unpack_bits_pm1)


def unpack_u8(desc) -> jnp.ndarray:
    """Host-side descriptor unpack: (..., 32) uint8 (numpy or device) ->
    (..., 256) bf16 {-1,+1} as ONE jitted dispatch. Eagerly composing
    unpack_bits_pm1 outside jit costs 6 separate eager-op compiles per new
    shape (broadcast/shift/and/reshape/convert/mul — measured in the
    full-system profile) and as many dispatch round-trips; the jitted form is
    one compile (persistently cached) and one dispatch."""
    return _unpack_jit(jnp.asarray(desc))


def hamming_matrix(bits_a: jnp.ndarray, bits_b: jnp.ndarray) -> jnp.ndarray:
    """(..., Na, 256) x (..., Nb, 256) {-1,+1} -> (..., Na, Nb) int32 Hamming.

    One MXU matmul; +-1 values are exact in bf16 and the f32 accumulation of
    256 terms is exact, so this equals the reference's XOR+popcount
    (DescriptorDistance, ORBmatcher.cc:1422-1438) bit-for-bit.
    """
    dot = jax.lax.dot_general(
        bits_a.astype(jnp.bfloat16),
        bits_b.astype(jnp.bfloat16),
        dimension_numbers=(((bits_a.ndim - 1,), (bits_b.ndim - 1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )
    return ((256.0 - dot) * 0.5).astype(jnp.int32)


def hamming_pairwise(desc_a_u8: jnp.ndarray, desc_b_u8: jnp.ndarray) -> jnp.ndarray:
    """Elementwise Hamming distance between aligned descriptor arrays
    (..., 32)u8 -> (...,) int32. Uses the VPU popcount path."""
    x = jnp.bitwise_xor(desc_a_u8, desc_b_u8)
    return jnp.sum(jax.lax.population_count(x).astype(jnp.int32), axis=-1)


def masked_top2(dist: jnp.ndarray, mask: jnp.ndarray):
    """Per-row best and second-best over the target axis.

    dist: (Q, T) int32; mask: (Q, T) bool.
    Returns best_val, best_idx, second_val, second_idx (each (Q,)).
    """
    d = jnp.where(mask, dist, BIG)
    best_idx = jnp.argmin(d, axis=-1)
    best_val = jnp.take_along_axis(d, best_idx[:, None], axis=-1)[:, 0]
    d2 = d.at[jnp.arange(d.shape[0]), best_idx].set(BIG)
    second_idx = jnp.argmin(d2, axis=-1)
    second_val = jnp.take_along_axis(d2, second_idx[:, None], axis=-1)[:, 0]
    return best_val, best_idx, second_val, second_idx


def resolve_duplicate_targets(best_idx, best_val, valid, n_targets: int):
    """Keep, for every target claimed by multiple queries, only the query
    with the smallest distance (the reference's 'already matched -> compare
    and erase' logic, e.g. ORBmatcher.cc:420-440).

    Returns the filtered `valid` mask.
    """
    key = jnp.where(valid, best_val, BIG)
    # min distance per target
    per_target = jnp.full((n_targets,), BIG, key.dtype).at[best_idx].min(key)
    # a query survives iff it attains the min for its target AND is the
    # lowest-index query attaining it (deterministic tie-break)
    attains = valid & (key == per_target[best_idx])
    qidx = jnp.arange(best_idx.shape[0])
    first_q = jnp.full((n_targets,), 1 << 30).at[best_idx].min(jnp.where(attains, qidx, 1 << 30))
    return attains & (first_q[best_idx] == qidx)


def rotation_consistency_mask(angle_q, angle_t_matched, valid):
    """Keep only matches whose rotation offset falls in the 3 most popular
    of 30 bins (reference ComputeThreeMaxima + HISTO_LENGTH filter,
    ORBmatcher.cc:1386-1420). Angles in radians.

    angle_q: (Q,) query angles; angle_t_matched: (Q,) matched target angles.
    """
    rot = (angle_q - angle_t_matched) * (180.0 / np.pi)
    rot = jnp.where(rot < 0, rot + 360.0, rot)
    factor = HISTO_LENGTH / 360.0
    bins = jnp.round(rot * factor).astype(jnp.int32)
    bins = jnp.where(bins == HISTO_LENGTH, 0, bins)
    bins = jnp.clip(bins, 0, HISTO_LENGTH - 1)
    counts = jnp.zeros((HISTO_LENGTH,), jnp.int32).at[bins].add(valid.astype(jnp.int32))
    top3 = jax.lax.top_k(counts, 3)[0]
    # Reference ComputeThreeMaxima: drop the 2nd/3rd bins when they hold
    # fewer than 0.1x the best bin's votes (ORBmatcher.cc:1386-1420).
    max1 = top3[0].astype(jnp.float32)
    keep1 = top3[0]
    keep2 = jnp.where(top3[1].astype(jnp.float32) > 0.1 * max1, top3[1], -1)
    keep3 = jnp.where(top3[2].astype(jnp.float32) > 0.1 * max1, top3[2], -1)
    c = counts[bins]
    bin_ok = (c == keep1) | (c == keep2) | (c == keep3)
    # count-equality can alias equally-popular bins; that only admits bins
    # tied with a kept one, which matches the intent (top-3 by count).
    return valid & bin_ok & (c > 0)


def radius_by_viewing_cos(view_cos):
    """Reference RadiusByViewingCos (ORBmatcher.cc:121-126)."""
    return jnp.where(view_cos > 0.998, 2.5, 4.0)


# --------------------------------------------------------------------------
# Search entry points. All take SoA arrays + validity masks and return
# (match_idx, match_dist, match_valid) per query row.
# --------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("th", "ratio"))
def search_by_projection_points(
    kp_xy,  # (N, 2) frame keypoints (undistorted)
    kp_octave,  # (N,) int32
    kp_bits,  # (N, 256) +-1
    kp_valid,  # (N,)
    kp_free,  # (N,) bool — keypoint not already bound to a map point
    pr_uv,  # (M, 2) predicted projections of map points
    pr_level,  # (M,) predicted octave
    pr_viewcos,  # (M,)
    pr_bits,  # (M, 256)
    pr_valid,  # (M,)
    scale_factors,  # (L,)
    th: float = 1.0,
    ratio: float = 0.8,
):
    """TrackLocalMap search (reference SearchByProjection overload #1,
    ORBmatcher.cc:42-119): match each candidate local map point to the best
    frame keypoint inside a viewing-cos radius and level window.
    Returns per-map-point (best_kp, dist, valid)."""
    r = radius_by_viewing_cos(pr_viewcos) * th * scale_factors[pr_level]  # (M,)
    du = jnp.abs(pr_uv[:, 0:1] - kp_xy[None, :, 0])
    dv = jnp.abs(pr_uv[:, 1:2] - kp_xy[None, :, 1])
    in_window = (du <= r[:, None]) & (dv <= r[:, None])
    lvl_ok = (kp_octave[None, :] >= pr_level[:, None] - 1) & (kp_octave[None, :] <= pr_level[:, None])
    mask = in_window & lvl_ok & kp_valid[None, :] & kp_free[None, :] & pr_valid[:, None]

    dist = hamming_matrix(pr_bits, kp_bits)
    best_val, best_idx, second_val, second_idx = masked_top2(dist, mask)
    best_lvl = kp_octave[best_idx]
    second_lvl = kp_octave[second_idx]
    # ratio test applies only when best and second are on the same level
    # (reference ORBmatcher.cc:105-107)
    ratio_ok = (best_lvl != second_lvl) | (best_val.astype(jnp.float32) <= ratio * second_val.astype(jnp.float32))
    valid = pr_valid & (best_val <= TH_HIGH) & ratio_ok
    valid = resolve_duplicate_targets(best_idx, best_val, valid, kp_xy.shape[0])
    return best_idx, best_val, valid


@partial(jax.jit, static_argnames=("th", "check_rotation", "dist_th"))
def search_by_projection_frame(
    kp_xy, kp_octave, kp_angle, kp_bits, kp_valid,
    pr_uv, pr_octave, pr_angle, pr_bits, pr_valid,
    scale_factors,
    th: float,
    check_rotation: bool = True,
    dist_th: int = TH_HIGH,
):
    """Motion-model / relocalization projection search (reference overloads
    ORBmatcher.cc:1161-1271 and :1273-1385): project the previous frame's
    (or a keyframe's) map points, search a th*scale window around each with a
    level window [l-1, l+1], then rotation-consistency filter.
    Queries = projected points; targets = current-frame keypoints."""
    r = th * scale_factors[pr_octave]
    du = jnp.abs(pr_uv[:, 0:1] - kp_xy[None, :, 0])
    dv = jnp.abs(pr_uv[:, 1:2] - kp_xy[None, :, 1])
    in_window = (du <= r[:, None]) & (dv <= r[:, None])
    lvl_ok = (kp_octave[None, :] >= pr_octave[:, None] - 1) & (kp_octave[None, :] <= pr_octave[:, None] + 1)
    mask = in_window & lvl_ok & kp_valid[None, :] & pr_valid[:, None]

    dist = hamming_matrix(pr_bits, kp_bits)
    best_val, best_idx, _, _ = masked_top2(dist, mask)
    valid = pr_valid & (best_val <= dist_th)
    if check_rotation:
        valid = rotation_consistency_mask(pr_angle, kp_angle[best_idx], valid)
    valid = resolve_duplicate_targets(best_idx, best_val, valid, kp_xy.shape[0])
    return best_idx, best_val, valid


@partial(jax.jit, static_argnames=("window", "ratio", "check_rotation"))
def search_for_initialization(
    xy1, angle1, bits1, valid1, octave1,
    xy2, angle2, bits2, valid2, octave2,
    window: float = 100.0,
    ratio: float = 0.9,
    check_rotation: bool = True,
):
    """Two-view bootstrap matching (reference SearchForInitialization,
    ORBmatcher.cc:363-468): level-0 keypoints only, +-window search box
    around the same location, TH_LOW + 0.9 ratio + rotation filter."""
    du = jnp.abs(xy1[:, 0:1] - xy2[None, :, 0])
    dv = jnp.abs(xy1[:, 1:2] - xy2[None, :, 1])
    mask = (
        (du <= window)
        & (dv <= window)
        & (octave1[:, None] == 0)
        & (octave2[None, :] == 0)
        & valid1[:, None]
        & valid2[None, :]
    )
    dist = hamming_matrix(bits1, bits2)
    best_val, best_idx, second_val, _ = masked_top2(dist, mask)
    valid = (
        valid1
        & (octave1 == 0)
        & (best_val <= TH_LOW)
        & (best_val.astype(jnp.float32) < ratio * second_val.astype(jnp.float32))
    )
    if check_rotation:
        valid = rotation_consistency_mask(angle1, angle2[best_idx], valid)
    valid = resolve_duplicate_targets(best_idx, best_val, valid, xy2.shape[0])
    return best_idx, best_val, valid


@partial(jax.jit, static_argnames=("ratio", "check_rotation", "dist_th"))
def search_by_descriptor(
    angle_q, bits_q, valid_q,
    angle_t, bits_t, valid_t,
    ratio: float = 0.7,
    check_rotation: bool = True,
    dist_th: int = TH_LOW,
):
    """BoW-style association (reference SearchByBoW, ORBmatcher.cc:151-256
    and :470-580) re-designed for TPU: the vocabulary-node gating there is a
    CPU pruning trick; on the MXU the full Q x T Hamming matrix is one matmul,
    so we brute-force with the same TH_LOW + 0.7 ratio + rotation filters."""
    mask = valid_q[:, None] & valid_t[None, :]
    dist = hamming_matrix(bits_q, bits_t)
    best_val, best_idx, second_val, _ = masked_top2(dist, mask)
    valid = (
        valid_q
        & (best_val <= dist_th)
        & (best_val.astype(jnp.float32) < ratio * second_val.astype(jnp.float32))
    )
    if check_rotation:
        valid = rotation_consistency_mask(angle_q, angle_t[best_idx], valid)
    valid = resolve_duplicate_targets(best_idx, best_val, valid, bits_t.shape[0])
    return best_idx, best_val, valid


@partial(jax.jit, static_argnames=("check_rotation",))
def search_for_triangulation(
    xy1, octave1, angle1, bits1, valid1,  # keyframe 1 keypoints (undistorted)
    xy2, octave2, angle2, bits2, valid2,  # keyframe 2 keypoints
    F12,  # (3,3) fundamental matrix from KF1 to KF2
    epipole2,  # (2,) epipole of camera 1 in image 2
    level_sigma2,  # (L,)
    scale_factors,  # (L,)
    check_rotation: bool = True,
):
    """Epipolar search for new map points (reference SearchForTriangulation,
    ORBmatcher.cc:582-722): match unassociated keypoints across two keyframes
    subject to the epipolar gate dist^2 < 3.84*sigma2(octave2) and an
    epipole-proximity rejection."""
    mask = valid1[:, None] & valid2[None, :]
    # epipolar line in image 2 of each kp1: l = F12^T? (reference computes
    # a = kp1.x*F[0,0]+kp1.y*F[1,0]+F[2,0] i.e. l2 = F12^T x1)
    ones = jnp.ones_like(xy1[:, :1])
    x1h = jnp.concatenate([xy1, ones], axis=-1)  # (N1, 3)
    l2 = x1h @ F12  # (N1, 3): [a, b, c]
    num = l2[:, 0:1] * xy2[None, :, 0] + l2[:, 1:2] * xy2[None, :, 1] + l2[:, 2:3]
    den = l2[:, 0:1] ** 2 + l2[:, 1:2] ** 2
    dsqr = num * num / jnp.maximum(den, 1e-12)
    epi_ok = dsqr < 3.84 * level_sigma2[octave2][None, :]
    # reject kp2 too close to the epipole (reference: 100*scale^2 pixels^2)
    de = jnp.sum((xy2 - epipole2[None, :]) ** 2, axis=-1)
    far_from_epipole = de >= 100.0 * scale_factors[octave2] ** 2
    mask = mask & epi_ok & far_from_epipole[None, :]

    dist = hamming_matrix(bits1, bits2)
    best_val, best_idx, _, _ = masked_top2(dist, mask)
    # Mutual cross-check: the reference prunes candidates to a shared BoW
    # vocabulary node (ORBmatcher.cc:601-630), which our dense search lacks —
    # without it, a corner matches its best partner along the whole epipolar
    # band and aliased wrong matches (arbitrary triangulated depth!) pass
    # every two-view gate by construction. Requiring 1<->2 mutual best
    # restores equivalent selectivity.
    d2 = jnp.where(mask, dist, BIG)
    col_best = jnp.argmin(d2, axis=0)  # best row for each column
    mutual = col_best[best_idx] == jnp.arange(best_idx.shape[0])
    valid = valid1 & (best_val <= TH_LOW) & mutual
    if check_rotation:
        valid = rotation_consistency_mask(angle1, angle2[best_idx], valid)
    valid = resolve_duplicate_targets(best_idx, best_val, valid, xy2.shape[0])
    return best_idx, best_val, valid


@partial(jax.jit, static_argnames=("th", "dist_th"))
def search_fuse(
    kp_xy, kp_octave, kp_bits, kp_valid,
    pr_uv, pr_level, pr_bits, pr_valid,
    scale_factors,
    th: float = 3.0,
    dist_th: int = TH_LOW,
    inv_level_sigma2=None,  # (L,) enables the 5.99 chi2 gate of Fuse overload 1
):
    """Fuse / sim3-guided projection search (reference Fuse overloads,
    ORBmatcher.cc:724-954, and each direction of SearchBySim3, :956-1159):
    project map points into a keyframe, radius th*scale(predicted level),
    level window [l-1, l] (reference kpLevel gate, :805/:897/:1060), best
    descriptor under dist_th. Host logic decides replace-vs-add (Fuse) or
    mutual agreement (SearchBySim3) from the result."""
    r = th * scale_factors[pr_level]
    du = jnp.abs(pr_uv[:, 0:1] - kp_xy[None, :, 0])
    dv = jnp.abs(pr_uv[:, 1:2] - kp_xy[None, :, 1])
    in_window = (du <= r[:, None]) & (dv <= r[:, None])
    lvl_ok = (kp_octave[None, :] >= pr_level[:, None] - 1) & (kp_octave[None, :] <= pr_level[:, None])
    mask = in_window & lvl_ok & kp_valid[None, :] & pr_valid[:, None]
    if inv_level_sigma2 is not None:
        # first Fuse overload's chi2 gate e2/sigma2 <= 5.99 (ORBmatcher.cc:810)
        e2 = du * du + dv * dv
        mask = mask & (e2 * inv_level_sigma2[kp_octave][None, :] <= 5.99)
    dist = hamming_matrix(pr_bits, kp_bits)
    best_val, best_idx, _, _ = masked_top2(dist, mask)
    valid = pr_valid & (best_val <= dist_th)
    return best_idx, best_val, valid
