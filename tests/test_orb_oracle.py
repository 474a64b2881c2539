"""Golden-parity oracle for the ORB extractor (VERDICT r2 item #5b).

`test_orb.py` checks self-consistency (determinism, shift-invariance); this
file pins the extractor to the REFERENCE ALGORITHM's definition by
re-implementing IC_Angle and computeOrbDescriptor (ORBextractor.cc:77-147)
as straightforward numpy loops and asserting the TPU extractor produces the
same orientation and the same descriptor bits on real detected keypoints.
The oracle follows the reference's published algorithm — circular-patch
intensity-centroid moments with the u_max quarter-circle table, and the
rotated 256-pair rBRIEF comparisons — not its code.
"""

import numpy as np
import jax.numpy as jnp

from ceres_mono_orb_slam2_tpu.ops.orb import kernels
from ceres_mono_orb_slam2_tpu.ops.orb.extractor import N_ANGLE_BINS, ORBExtractor
from ceres_mono_orb_slam2_tpu.ops.orb.kernels import HALF_PATCH
from ceres_mono_orb_slam2_tpu.ops.orb.pattern import BIT_PATTERN_31
from ceres_mono_orb_slam2_tpu.utils.config import ORBConfig


def _umax_table():
    """The reference's circular-patch half-width table (ORBextractor.cc:
    448-467): rounded circle with the symmetry fix-up."""
    hp = HALF_PATCH
    umax = np.zeros(hp + 2, dtype=np.int64)
    vmax = int(np.floor(hp * np.sqrt(2.0) / 2 + 1))
    vmin = int(np.ceil(hp * np.sqrt(2.0) / 2))
    for v in range(vmax + 1):
        umax[v] = int(round(np.sqrt(hp * hp - v * v)))
    v0 = 0
    for v in range(hp, vmin - 1, -1):
        while umax[v0] == umax[v0 + 1]:
            v0 += 1
        umax[v] = v0
        v0 += 1
    return umax


def oracle_ic_angle(img: np.ndarray, x: int, y: int) -> float:
    """IC_Angle (ORBextractor.cc:77-104): intensity-centroid moments over the
    circular 31x31 patch; returns radians in [0, 2pi)."""
    umax = _umax_table()
    img = img.astype(np.int64)
    m01 = 0
    m10 = 0
    for u in range(-HALF_PATCH, HALF_PATCH + 1):
        m10 += u * img[y, x + u]
    for v in range(1, HALF_PATCH + 1):
        d = umax[v]
        v_sum = 0
        for u in range(-d, d + 1):
            vp = img[y + v, x + u]
            vm = img[y - v, x + u]
            v_sum += vp - vm
            m10 += u * (vp + vm)
        m01 += v * v_sum
    return float(np.arctan2(m01, m10)) % (2 * np.pi)


def oracle_descriptor(blurred_u8: np.ndarray, x: int, y: int, angle_rad: float) -> np.ndarray:
    """computeOrbDescriptor (ORBextractor.cc:108-147): 256 comparisons of the
    blurred image at the angle-rotated bit_pattern_31 sample pairs, packed
    LSB-first per byte. Rotation: col = round(px cos - py sin),
    row = round(px sin + py cos)."""
    pts = BIT_PATTERN_31.reshape(256, 2, 2).reshape(512, 2).astype(np.float64)
    a, b = np.cos(angle_rad), np.sin(angle_rad)
    cols = np.round(pts[:, 0] * a - pts[:, 1] * b).astype(np.int64)
    rows = np.round(pts[:, 0] * b + pts[:, 1] * a).astype(np.int64)
    vals = blurred_u8[y + rows, x + cols].astype(np.int64)
    bits = (vals[0::2] < vals[1::2]).astype(np.uint8)  # (256,)
    desc = np.zeros(32, np.uint8)
    for i in range(32):
        for j in range(8):
            desc[i] |= bits[8 * i + j] << j
    return desc


def _texture_image(rng, h=240, w=320):
    img = rng.uniform(30, 90, (h, w))
    for _ in range(160):
        y = rng.integers(5, h - 14)
        x = rng.integers(5, w - 14)
        img[y:y + rng.integers(4, 12), x:x + rng.integers(4, 12)] = rng.uniform(100, 250)
    img += rng.standard_normal((h, w)) * 2
    # integer-valued like a real 8-bit camera image (also keeps the
    # extractor's bf16 patch gathers exact)
    return np.round(np.clip(img, 0, 255)).astype(np.float32)


def test_extractor_matches_reference_oracle(rng):
    img = _texture_image(rng)
    ex = ORBExtractor(ORBConfig(n_features=300, n_levels=1))
    feats = ex.extract(img)
    xy = np.asarray(feats.xy)[0]
    angle = np.asarray(feats.angle)[0]
    desc = np.asarray(feats.desc)[0]
    valid = np.asarray(feats.valid)[0]

    blurred = np.asarray(kernels.gaussian_blur7(jnp.asarray(img[None])))[0]
    blurred_u8 = np.clip(blurred + 0.5, 0, 255).astype(np.uint8)

    h, w = img.shape
    margin = kernels.EDGE + 1
    checked = 0
    angle_errs = []
    for i in np.nonzero(valid)[0]:
        x, y = int(round(xy[i, 0])), int(round(xy[i, 1]))
        if not (margin <= x < w - margin and margin <= y < h - margin):
            continue
        # --- orientation: same circular-moment definition ---
        a_ref = oracle_ic_angle(img, x, y)
        da = abs((angle[i] % (2 * np.pi)) - a_ref)
        da = min(da, 2 * np.pi - da)
        angle_errs.append(da)
        # --- descriptor: EXACT bits at the extractor's quantized angle bin ---
        two_pi = 2 * np.pi
        bin_idx = int(np.round((angle[i] % two_pi) / (two_pi / N_ANGLE_BINS))) % N_ANGLE_BINS
        a_bin = two_pi * bin_idx / N_ANGLE_BINS
        d_ref = oracle_descriptor(blurred_u8, x, y, a_bin)
        hamming = int(np.unpackbits(np.bitwise_xor(d_ref, desc[i])).sum())
        # <=2 bits of slack absorbs exact-.5 rounding ties between the f32
        # blur quantization and the oracle's; the tap geometry and packing
        # must agree on all other bits
        assert hamming <= 2, (i, hamming)
        checked += 1
        if checked >= 40:
            break
    assert checked >= 25, f"only {checked} in-bounds keypoints"
    # arctan2 vs the reference's fastAtan2 differ by <0.3 deg; anything more
    # means the moment masks diverged
    assert np.max(angle_errs) < np.deg2rad(0.5), np.rad2deg(np.max(angle_errs))


def test_descriptor_bit_packing_order(rng):
    """Bit i of byte k must encode comparison pair 8k+i (LSB-first), the
    reference's `val |= (t0 < t1) << bit` packing — descriptor files and
    vocabularies are interchangeable only if the bit order matches."""
    img = _texture_image(rng)
    blurred_u8 = np.clip(
        np.asarray(kernels.gaussian_blur7(jnp.asarray(img[None])))[0] + 0.5,
        0, 255).astype(np.uint8)
    d0 = oracle_descriptor(blurred_u8, 100, 100, 0.0)
    pts = BIT_PATTERN_31.reshape(256, 2, 2).reshape(512, 2)
    v = blurred_u8[100 + pts[:, 1], 100 + pts[:, 0]]
    bits = (v[0::2] < v[1::2])
    for i in (0, 7, 100, 255):
        assert bool((d0[i // 8] >> (i % 8)) & 1) == bool(bits[i])
