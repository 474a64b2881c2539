"""Matcher tests: Hamming-by-matmul exactness, top-2 masking, rotation
filter, duplicate resolution, and end-to-end matching of extracted features
across a shifted image."""

import numpy as np
import jax.numpy as jnp

from ceres_mono_orb_slam2_tpu.ops import matcher
from ceres_mono_orb_slam2_tpu.ops.orb.extractor import ORBExtractor
from ceres_mono_orb_slam2_tpu.utils.config import ORBConfig


def rand_desc(rng, n):
    return rng.integers(0, 256, (n, 32), dtype=np.uint8)


def test_hamming_matmul_exact(rng):
    a = rand_desc(rng, 64)
    b = rand_desc(rng, 96)
    bits_a = matcher.unpack_bits_pm1(jnp.asarray(a))
    bits_b = matcher.unpack_bits_pm1(jnp.asarray(b))
    got = np.asarray(matcher.hamming_matrix(bits_a, bits_b))
    # ground truth via numpy popcount
    au = np.unpackbits(a, axis=-1)
    bu = np.unpackbits(b, axis=-1)
    want = (au[:, None, :] != bu[None, :, :]).sum(-1)
    np.testing.assert_array_equal(got, want)


def test_hamming_pairwise(rng):
    a = rand_desc(rng, 50)
    b = rand_desc(rng, 50)
    got = np.asarray(matcher.hamming_pairwise(jnp.asarray(a), jnp.asarray(b)))
    want = (np.unpackbits(a, axis=-1) != np.unpackbits(b, axis=-1)).sum(-1)
    np.testing.assert_array_equal(got, want)


def test_unpack_bit_order(rng):
    # bit i of byte k must correspond to pattern pair index k*8+i
    d = np.zeros((1, 32), np.uint8)
    d[0, 0] = 0b00000001  # pair 0 set
    d[0, 1] = 0b10000000  # pair 15 set
    bits = np.asarray(matcher.unpack_bits_pm1(jnp.asarray(d)))[0]
    assert bits[0] == 1 and bits[15] == 1
    assert bits[1] == -1 and bits[8] == -1


def test_masked_top2(rng):
    dist = jnp.asarray([[5, 3, 9], [1, 2, 3]], jnp.int32)
    mask = jnp.asarray([[True, True, True], [False, True, True]])
    bv, bi, sv, si = matcher.masked_top2(dist, mask)
    assert list(np.asarray(bi)) == [1, 1]
    assert list(np.asarray(bv)) == [3, 2]
    assert list(np.asarray(sv)) == [5, 3]


def test_resolve_duplicates():
    best_idx = jnp.asarray([4, 4, 2, 4])
    best_val = jnp.asarray([10, 5, 1, 5])
    valid = jnp.asarray([True, True, True, True])
    out = np.asarray(matcher.resolve_duplicate_targets(best_idx, best_val, valid, 8))
    # queries 1 and 3 tie at distance 5 for target 4 -> lowest index wins
    assert list(out) == [False, True, True, False]


def test_rotation_consistency(rng):
    n = 200
    angle_q = jnp.asarray(rng.uniform(-np.pi, np.pi, n), jnp.float32)
    # 80% of matches share a common rotation offset, 20% are random
    offset = 0.5
    angle_t = np.asarray(angle_q) - offset
    outliers = rng.random(n) < 0.2
    angle_t[outliers] = rng.uniform(-np.pi, np.pi, outliers.sum())
    valid = jnp.ones(n, bool)
    keep = np.asarray(matcher.rotation_consistency_mask(angle_q, jnp.asarray(angle_t, jnp.float32), valid))
    # inliers survive, most outliers die
    assert keep[~outliers].mean() > 0.95
    assert keep[outliers].mean() < 0.3


def test_end_to_end_shift_matching(rng):
    """Extract ORB on an image and a shifted copy, match with
    search_for_initialization, verify matches recover the shift."""
    img = np.full((256, 320), 30, np.float32)
    pts = np.stack([rng.integers(40, 216, 90), rng.integers(40, 280, 90)], axis=-1)
    for y, x in pts:
        img[y - 3 : y + 4, x - 3 : x + 4] = rng.uniform(120, 250)
    shift = 6
    img2 = np.roll(img, (shift, shift), axis=(0, 1))
    orb = ORBExtractor(ORBConfig(n_features=400))
    f1 = orb.extract(img)
    f2 = orb.extract(img2)
    bits1 = matcher.unpack_bits_pm1(f1.desc[0])
    bits2 = matcher.unpack_bits_pm1(f2.desc[0])
    idx, dist, valid = matcher.search_for_initialization(
        f1.xy[0], f1.angle[0], bits1, f1.valid[0], f1.octave[0],
        f2.xy[0], f2.angle[0], bits2, f2.valid[0], f2.octave[0],
        window=50.0,
    )
    idx, valid = np.asarray(idx), np.asarray(valid)
    xy1 = np.asarray(f1.xy)[0]
    xy2 = np.asarray(f2.xy)[0]
    assert valid.sum() > 40
    deltas = xy2[idx[valid]] - xy1[valid]
    err = np.linalg.norm(deltas - shift, axis=-1)
    assert np.mean(err < 1.5) > 0.9  # matches recover the true shift


def test_search_by_projection_points_window(rng):
    """Map points only match keypoints inside their predicted window/levels."""
    n_kp, n_mp = 128, 32
    kp_xy = jnp.asarray(rng.uniform(0, 320, (n_kp, 2)), jnp.float32)
    kp_oct = jnp.zeros(n_kp, jnp.int32)
    desc = rand_desc(rng, n_kp)
    kp_bits = matcher.unpack_bits_pm1(jnp.asarray(desc))
    kp_valid = jnp.ones(n_kp, bool)
    kp_free = jnp.ones(n_kp, bool)
    # map points predicted exactly at keypoints 0..31 with identical desc
    pr_uv = kp_xy[:n_mp]
    pr_level = jnp.zeros(n_mp, jnp.int32)
    pr_viewcos = jnp.ones(n_mp, jnp.float32)
    pr_bits = kp_bits[:n_mp]
    pr_valid = jnp.ones(n_mp, bool)
    scales = jnp.asarray(1.2 ** np.arange(8), jnp.float32)
    idx, dist, valid = matcher.search_by_projection_points(
        kp_xy, kp_oct, kp_bits, kp_valid, kp_free,
        pr_uv, pr_level, pr_viewcos, pr_bits, pr_valid, scales,
    )
    assert np.asarray(valid).sum() >= n_mp - 2  # random desc collisions possible
    good = np.asarray(valid)
    np.testing.assert_array_equal(np.asarray(idx)[good], np.arange(n_mp)[good])
    np.testing.assert_array_equal(np.asarray(dist)[good], 0)
