"""ORB extractor tests: FAST detection on synthetic patterns, descriptor
determinism/shift-invariance, spatial distribution, camera undistortion."""

import jax
import numpy as np
import jax.numpy as jnp

from ceres_mono_orb_slam2_tpu.ops import camera
from ceres_mono_orb_slam2_tpu.ops.orb import kernels
from ceres_mono_orb_slam2_tpu.ops.orb.extractor import ORBExtractor
from ceres_mono_orb_slam2_tpu.utils.config import ORBConfig


def checkerboard(h, w, sq=24, lo=40.0, hi=200.0):
    ys, xs = np.mgrid[0:h, 0:w]
    board = (((ys // sq) + (xs // sq)) % 2).astype(np.float32)
    return lo + (hi - lo) * board


def dots_image(h, w, rng, n=60, lo=30.0, hi=220.0):
    img = np.full((h, w), lo, np.float32)
    pts = np.stack(
        [rng.integers(30, h - 30, n), rng.integers(30, w - 30, n)], axis=-1
    )
    for y, x in pts:
        img[y - 2 : y + 3, x - 2 : x + 3] = hi
    return img, pts


def test_fast_score_map_detects_dots(rng):
    img, pts = dots_image(128, 160, rng, n=20)
    score = np.asarray(kernels.fast_score_map(jnp.asarray(img)[None]))[0]
    # Strong response near every dot...
    for y, x in pts:
        assert score[y - 4 : y + 5, x - 4 : x + 5].max() > 50, (y, x)
    # ...and zero in flat interior regions away from dots.
    mask = np.ones((128, 160), bool)
    for y, x in pts:
        mask[max(y - 8, 0) : y + 9, max(x - 8, 0) : x + 9] = False
    mask[:8, :] = mask[-8:, :] = mask[:, :8] = mask[:, -8:] = False
    assert score[mask].max() == 0.0


def squares_image(h, w, sq=14, pitch=40, lo=40.0, hi=200.0):
    """Grid of isolated bright squares: each square contributes 4 strong
    L-corners at known positions (FAST responds to L-corners/blobs, not to
    checkerboard X-junctions)."""
    img = np.full((h, w), lo, np.float32)
    corners = []
    for cy in range(pitch, h - pitch, pitch):
        for cx in range(pitch, w - pitch, pitch):
            img[cy : cy + sq, cx : cx + sq] = hi
            corners += [(cy, cx), (cy, cx + sq - 1), (cy + sq - 1, cx), (cy + sq - 1, cx + sq - 1)]
    return img, np.array(corners, np.float32)


def test_extractor_square_corners(rng):
    img, corners = squares_image(240, 320)
    img += rng.standard_normal(img.shape).astype(np.float32) * 2.0
    orb = ORBExtractor(ORBConfig(n_features=500))
    feats = orb.extract(img)
    valid = np.asarray(feats.valid)[0]
    assert valid.sum() > 100
    lv0 = valid & (np.asarray(feats.octave)[0] == 0)
    resp = np.asarray(feats.response)[0]
    strong = lv0 & (resp > 50)  # true contrast corners, not noise corners
    pts = np.asarray(feats.xy)[0][strong]
    assert len(pts) > 50
    # every strong level-0 keypoint is within 3px of a true square corner
    d = np.linalg.norm(pts[:, None, :] - corners[None, :, ::-1], axis=-1).min(axis=1)
    assert np.mean(d < 3.0) > 0.9


def test_extractor_deterministic(rng):
    img, _ = dots_image(240, 320, rng, n=120)
    orb = ORBExtractor(ORBConfig(n_features=300))
    f1 = orb.extract(img)
    f2 = orb.extract(img)
    assert np.array_equal(np.asarray(f1.desc), np.asarray(f2.desc))
    assert np.array_equal(np.asarray(f1.xy), np.asarray(f2.xy))


def test_descriptor_shift_invariance(rng):
    """Descriptors of the same physical corner must match under translation."""
    img, _ = dots_image(256, 320, rng, n=80)
    shift = 8
    img2 = np.roll(img, (shift, shift), axis=(0, 1))
    orb = ORBExtractor(ORBConfig(n_features=300))
    f1 = orb.extract(img)
    f2 = orb.extract(img2)
    v1, v2 = np.asarray(f1.valid)[0], np.asarray(f2.valid)[0]
    xy1 = np.asarray(f1.xy)[0]
    xy2 = np.asarray(f2.xy)[0]
    d1 = np.unpackbits(np.asarray(f1.desc)[0], axis=-1)
    d2 = np.unpackbits(np.asarray(f2.desc)[0], axis=-1)
    oc1 = np.asarray(f1.octave)[0]
    oc2 = np.asarray(f2.octave)[0]
    matched = 0
    dists = []
    for i in np.nonzero(v1 & (oc1 == 0))[0]:
        target = xy1[i] + shift
        js = np.nonzero(v2 & (oc2 == 0))[0]
        dd = np.linalg.norm(xy2[js] - target, axis=-1)
        j = js[np.argmin(dd)]
        if dd.min() < 1.0:
            matched += 1
            dists.append(np.sum(d1[i] != d2[j]))
    assert matched > 30
    assert np.mean(dists) < 20  # identical corners -> near-identical descriptors


def test_spatial_uniformity(rng):
    """Rank-major selection must spread keypoints across the image (the
    property DistributeOctTree enforces in the reference)."""
    img, _ = squares_image(384, 512, sq=10, pitch=28)
    img += rng.standard_normal(img.shape).astype(np.float32) * 2.0
    orb = ORBExtractor(ORBConfig(n_features=600))
    feats = orb.extract(img)
    valid = np.asarray(feats.valid)[0]
    xy = np.asarray(feats.xy)[0][valid]
    # Quadrant occupancy: every quadrant gets a reasonable share.
    qx = (xy[:, 0] > 256).astype(int)
    qy = (xy[:, 1] > 192).astype(int)
    counts = np.bincount(qy * 2 + qx, minlength=4)
    assert counts.min() > 0.1 * counts.sum() / 4 * 4 / 4 * 1  # no empty quadrant
    assert counts.min() > counts.max() * 0.3


def test_per_level_budget():
    cfg = ORBConfig(n_features=1000, n_levels=8, scale_factor=1.2)
    per = cfg.features_per_level
    assert per.sum() == 1000
    assert per[0] > per[-1] > 0


def test_undistort_roundtrip(rng):
    K = jnp.asarray([[520.9, 0, 325.1], [0, 521.0, 249.7], [0, 0, 1]], jnp.float32)
    dist = jnp.asarray([0.231222, -0.784899, -0.003257, -0.000105, 0.917205], jnp.float32)
    # normalized points within the image FOV
    xy = jnp.asarray(rng.uniform(-0.4, 0.4, (200, 2)), jnp.float32)
    distorted = camera.distort_normalized(xy, dist)
    uv_dist = distorted * jnp.array([520.9, 521.0]) + jnp.array([325.1, 249.7])
    uv_undist = camera.undistort_points(uv_dist, K, dist)
    expected = xy * jnp.array([520.9, 521.0]) + jnp.array([325.1, 249.7])
    np.testing.assert_allclose(np.asarray(uv_undist), np.asarray(expected), atol=0.1)


def test_fast_nms_pallas_parity(rng):
    """The fused Pallas FAST+NMS kernel (TPU production path) matches the
    composed fast_score_map+nms3 on interior pixels, run via the Pallas
    interpreter on CPU."""
    img, _ = dots_image(96, 200, rng, n=25)
    img = np.stack([img, img[::-1]])  # batch of 2
    composed = np.asarray(kernels.nms3(kernels.fast_score_map(jnp.asarray(img))))
    fused = np.asarray(kernels.fast_nms_pallas(jnp.asarray(img), interpret=True))
    inner = (slice(None), slice(8, -8), slice(8, -8))
    np.testing.assert_array_equal(composed[inner], fused[inner])
    assert (composed[inner] > 0).sum() > 20


def test_gather_patches_pallas_parity(rng):
    """The column-windowed Pallas patch gather (TPU production path) matches
    vmapped gather_patches bit-for-bit, run via the Pallas interpreter."""
    B, H, W, n, r = 2, 100, 280, 24, 15
    img = rng.uniform(0, 255, (B, H, W)).astype(np.float32)
    ys = rng.integers(r, H - r, (B, n)).astype(np.int32)
    xs = rng.integers(r, W - r, (B, n)).astype(np.int32)
    ref = jax.vmap(lambda im, yy, xx: kernels.gather_patches(im, yy, xx, r))(
        jnp.asarray(img), jnp.asarray(ys), jnp.asarray(xs))
    new = kernels.gather_patches_pallas(
        jnp.asarray(img), jnp.asarray(ys), jnp.asarray(xs), r, kpb=8,
        interpret=True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(new))
