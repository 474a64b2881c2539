"""ORB front-end device kernels: pyramid, FAST-9/16 score map, blur, moments.

TPU-native re-design of the reference extractor (src/ORBextractor.cc):
instead of per-cell scalar FAST with retry thresholds and sequential octree
list surgery, we compute a dense corner *score map* once per pyramid level
(vectorized over the whole image on the VPU), 3x3 NMS, then per-cell top-k
with a rank-major global top-N selection which preserves the property that
matters about DistributeOctTree (spatial uniformity: every cell's best corner
is taken before any cell's second-best).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# Bresenham circle of radius 3 used by FAST-9/16, in (dy, dx), clockwise
# starting straight up (same circle the reference's OpenCV FAST uses).
FAST_CIRCLE = np.array(
    [
        (-3, 0), (-3, 1), (-2, 2), (-1, 3), (0, 3), (1, 3), (2, 2), (3, 1),
        (3, 0), (3, -1), (2, -2), (1, -3), (0, -3), (-1, -3), (-2, -2), (-3, -1),
    ],
    dtype=np.int32,
)

HALF_PATCH = 15  # IC-angle circular patch radius (reference ORBextractor.cc:72)
EDGE = 19  # keypoint border margin (reference EDGE_THRESHOLD, ORBextractor.cc:74)
DESC_R = 19  # descriptor sample max radius after rotation (ceil(13*sqrt(2)))


def fast_score_map(img: jnp.ndarray) -> jnp.ndarray:
    """Dense FAST-9/16 corner score for every pixel.

    img: (..., H, W) float32 in [0, 255].
    Returns (..., H, W) float32 score: the largest t such that the pixel is a
    FAST corner at threshold t (0 if not a corner at t=0+). This is the same
    "max-threshold" score OpenCV computes, so thresholding the map at
    iniThFAST/minThFAST reproduces the reference's two-threshold scheme.
    """
    H, W = img.shape[-2], img.shape[-1]
    # 16 circle-shifted copies via padding + slicing (cheap VPU ops).
    pad = 3
    padded = jnp.pad(img, [(0, 0)] * (img.ndim - 2) + [(pad, pad), (pad, pad)], mode="edge")
    shifted = []
    for dy, dx in FAST_CIRCLE:
        shifted.append(
            jax.lax.dynamic_slice_in_dim(
                jax.lax.dynamic_slice_in_dim(padded, pad + dy, H, axis=-2), pad + dx, W, axis=-1
            )
        )
    circ = jnp.stack(shifted, axis=0)  # (16, ..., H, W)
    d = circ - img[None]  # (16, ..., H, W)

    # For each arc start k, the bright arc strength is min_{i=k..k+8} d_i and
    # the dark arc strength is min (-d_i). Corner score = max over the 32 arcs.
    d2 = jnp.concatenate([d, d[:8]], axis=0)  # wraparound (24, ...)
    bright = d2
    dark = -d2

    def arc_min(x):
        # min over window of 9 along axis 0 for the 16 start positions
        m = x[0:16]
        for i in range(1, 9):
            m = jnp.minimum(m, x[i : i + 16])
        return m  # (16, ..., H, W)

    score = jnp.maximum(jnp.max(arc_min(bright), axis=0), jnp.max(arc_min(dark), axis=0))
    return jnp.maximum(score, 0.0)


def fast_nms_pallas(img: jnp.ndarray, chunk: int = 32,
                    interpret: bool = False) -> jnp.ndarray:
    """Fused FAST-9/16 max-threshold score + 3x3 NMS as one Pallas kernel.

    Numerically identical (interior pixels) to `nms3(fast_score_map(img))`,
    but the 16 circle-shifted difference planes and the 32 arc min/max
    reductions live entirely in VMEM: the composed XLA version materializes
    (16, B, H, W) and (24, B, H, W) f32 intermediates in HBM per pyramid
    level, which profiled as the single largest cost of the batched extractor
    (~16 ms of a 58 ms device step at B=8, KITTI shape). Each grid step DMAs
    one (chunk+8, W) row band (4-px halo: radius-3 circle + 1-px NMS ring)
    and writes the suppressed (chunk, W) score block.

    Border rows/cols differ from the composed version (edge-clamped instead
    of zero-padded NMS neighbors) — irrelevant because the extractor zeroes
    the EDGE=19 margin before selection.

    img: (B, H, W) float32. Returns (B, H, W) float32.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, W = img.shape
    CH = chunk
    n_chunks = -(-H // CH)
    Hp = n_chunks * CH + 8
    Wp = -(-(W + 8) // 128) * 128
    pimg = jnp.pad(img, ((0, 0), (4, Hp - H - 4), (4, Wp - W - 4)), mode="edge")
    R = CH + 2  # score rows needed per block: chunk + 1-px NMS ring
    Wc = W + 2

    def kernel(img_ref, out_ref, vbuf, sem):
        b = pl.program_id(0)
        c = pl.program_id(1)
        dma = pltpu.make_async_copy(
            img_ref.at[b, pl.ds(c * CH, CH + 8), :], vbuf, sem)
        dma.start()
        dma.wait()
        v = vbuf[:]
        center = jax.lax.slice(v, (3, 3), (3 + R, 3 + Wc))
        d = [
            jax.lax.slice(v, (3 + int(dy), 3 + int(dx)),
                          (3 + int(dy) + R, 3 + int(dx) + Wc)) - center
            for dy, dx in FAST_CIRCLE
        ]
        # Sliding min/max over the 9-long circular arc windows. The rolling
        # form keeps only the 16 difference planes + 3 accumulators live
        # (a doubling ladder is 3x fewer VPU ops but its ~46 live temporaries
        # overflow the 16 MB VMEM stack at useful chunk sizes).
        best = None
        for k in range(16):
            mn9 = d[k]
            mx9 = d[k]
            for i in range(1, 9):
                dd = d[(k + i) % 16]
                mn9 = jnp.minimum(mn9, dd)
                mx9 = jnp.maximum(mx9, dd)
            cand = jnp.maximum(mn9, -mx9)  # bright-arc min vs dark-arc min
            best = cand if best is None else jnp.maximum(best, cand)
        sc = jnp.maximum(best, 0.0)  # (R, Wc) scores incl. the NMS ring
        # 3x3 NMS with plateau tie-break (same comparisons as nms3)
        cen = jax.lax.slice(sc, (1, 1), (1 + CH, 1 + W))
        mb = jnp.maximum(
            jnp.maximum(jax.lax.slice(sc, (0, 0), (CH, W)),
                        jax.lax.slice(sc, (0, 1), (CH, 1 + W))),
            jnp.maximum(jax.lax.slice(sc, (0, 2), (CH, 2 + W)),
                        jax.lax.slice(sc, (1, 0), (1 + CH, W))))
        ma = jnp.maximum(
            jnp.maximum(jax.lax.slice(sc, (1, 2), (1 + CH, 2 + W)),
                        jax.lax.slice(sc, (2, 0), (2 + CH, W))),
            jnp.maximum(jax.lax.slice(sc, (2, 1), (2 + CH, 1 + W)),
                        jax.lax.slice(sc, (2, 2), (2 + CH, 2 + W))))
        keep = (cen > mb) & (cen >= ma)
        out_ref[:] = jnp.where(keep, cen, 0.0)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, n_chunks * CH, W), jnp.float32),
        grid=(B, n_chunks),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((None, CH, W), lambda b, c: (b, c, 0)),
        scratch_shapes=[
            pltpu.VMEM((CH + 8, Wp), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(pimg)
    return out[:, :H, :]


def nms3(score: jnp.ndarray) -> jnp.ndarray:
    """3x3 non-max suppression with plateau tie-breaking.

    A pixel survives if it is strictly greater than its raster-preceding
    neighbors and >= its following neighbors — exactly one survivor per
    constant plateau (uniform blobs produce score plateaus where a strict
    local-max test would suppress everything).
    """
    H, W = score.shape[-2], score.shape[-1]
    padded = jnp.pad(score, [(0, 0)] * (score.ndim - 2) + [(1, 1), (1, 1)], mode="constant")

    def shift(dy, dx):
        return jax.lax.dynamic_slice_in_dim(
            jax.lax.dynamic_slice_in_dim(padded, 1 + dy, H, axis=-2), 1 + dx, W, axis=-1
        )

    before = [(-1, -1), (-1, 0), (-1, 1), (0, -1)]
    after = [(0, 1), (1, -1), (1, 0), (1, 1)]
    max_before = functools.reduce(jnp.maximum, [shift(dy, dx) for dy, dx in before])
    max_after = functools.reduce(jnp.maximum, [shift(dy, dx) for dy, dx in after])
    keep = (score > max_before) & (score >= max_after)
    return jnp.where(keep, score, 0.0)


def gaussian_blur7(img: jnp.ndarray, sigma: float = 2.0) -> jnp.ndarray:
    """Separable 7x7 Gaussian blur (reference blurs with GaussianBlur(7,7,2,2)
    before computing descriptors, ORBextractor.cc:1034).

    Implemented as shift-and-add on the VPU: a single-channel
    conv_general_dilated is catastrophic on TPU (the MXU path needs channel
    depth; the two 1-channel convs per pyramid level were ~28 of the
    extractor's 36 ms/frame — the KNOWN_ISSUES #2 'composition overhead').
    """
    r = 3
    x = np.arange(-r, r + 1, dtype=np.float64)
    k = np.exp(-(x**2) / (2 * sigma**2))
    k /= k.sum()
    H, W = img.shape[-2], img.shape[-1]
    pad = [(0, 0)] * (img.ndim - 2) + [(r, r), (r, r)]
    p = jnp.pad(img, pad, mode="edge")

    def pass_axis(a, axis):
        out = None
        for i in range(2 * r + 1):
            sl = jax.lax.dynamic_slice_in_dim(a, i, a.shape[axis] - 2 * r, axis=axis)
            term = sl * jnp.asarray(k[i], img.dtype)
            out = term if out is None else out + term
        return out

    v = pass_axis(p, img.ndim - 2)  # (..., H, W+2r)
    return pass_axis(v, img.ndim - 1)  # (..., H, W)


def resize_bilinear(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Bilinear resize to (out_h, out_w) (pyramid construction,
    reference ORBextractor.cc:1107-1132)."""
    out_shape = img.shape[:-2] + (out_h, out_w)
    return jax.image.resize(img, out_shape, method="linear")


def ic_angle_mask() -> tuple[np.ndarray, np.ndarray]:
    """(31,31) x/y moment masks over the circular IC-angle patch.

    Replicates the reference's u_max table construction (ORBextractor.cc:
    448-467): rounded circle with an exactness fix-up that makes the patch
    symmetric, so our orientation matches the reference bit-for-bit in the
    included-pixel set.
    """
    hp = HALF_PATCH
    umax = np.zeros(hp + 2, dtype=np.int32)
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

    ys, xs = np.mgrid[-hp : hp + 1, -hp : hp + 1]
    inc = np.abs(xs) <= umax[np.abs(ys)]
    mask_x = (xs * inc).astype(np.float32)
    mask_y = (ys * inc).astype(np.float32)
    return mask_x, mask_y


def ic_angle_moment_maps(img: jnp.ndarray) -> jnp.ndarray:
    """Dense IC-angle patch moments via one 2-channel 31x31 convolution.

    TPU redesign of the per-keypoint moment sums (reference IC_Angle,
    ORBextractor.cc:77-104): per-keypoint 31x31 gathers are scattered loads
    the TPU serializes; a dense conv is an implicit GEMM on the MXU and the
    per-keypoint angle becomes two single-pixel taps.

    img: (B, H, W) -> (B, 2, H, W) with channels (m10, m01).
    """
    mx, my = ic_angle_mask()
    w = np.stack([mx, my])[:, None, :, :].astype(np.float32)  # (2,1,31,31)
    x4 = img[:, None, :, :]
    out = jax.lax.conv_general_dilated(x4, jnp.asarray(w), (1, 1), "SAME")
    return out


def gather_patches_pallas(img: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray,
                          radius: int, kpb: int = 32,
                          interpret: bool = False) -> jnp.ndarray:
    """Batched patch gather as a Pallas kernel with column-windowed HBM reads.

    Equivalent to vmap(gather_patches) over the leading batch axis, but each
    keypoint DMAs only an (SD, 256) lane-aligned band around its column —
    SD = 48 rows for side 31/39, the 8/16-aligned row count Mosaic's DMA
    tiling requires — instead of materializing full (n*side, W) row blocks:
    ~S·W/(SD·256) (≈3-4x at KITTI width) less HBM traffic, which profiled as
    ~25% of the batched extractor's device time. Each grid step issues `kpb`
    async window copies
    (latency overlaps across the batch), then extracts the (side, side)
    patches with one batched one-hot MXU contraction in VMEM.

    img: (B, H, W) float32/bfloat16 (8-bit content; gathered as bf16 — same
    values the row-gather einsum consumed). ys/xs: (B, n) int32 with
    radius <= y < H-radius, radius <= x < W-radius (the EDGE margin).
    Returns (B, n, side, side) float32.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, W = img.shape
    S = 2 * radius + 1
    WIN = 256
    # DMA window rows: Mosaic requires HBM slice shapes (and in practice
    # bases) on the second-minor dim aligned to the 8-sublane tile, and the
    # bf16 VMEM scratch wants 16-row tiles — so align the row base DOWN to 8
    # and copy a 16-aligned band that covers base-offset (<8) + S rows.
    SD = -(-(S + 8) // 16) * 16
    n = ys.shape[1]
    n_pad = -(-n // kpb) * kpb
    Wp = (-(-W // 128) + 2) * 128  # floor128(x-r)+256 stays in bounds
    imgp = jnp.pad(img.astype(jnp.bfloat16), ((0, 0), (0, SD), (0, Wp - W)))
    ysp = jnp.pad(ys.astype(jnp.int32), ((0, 0), (0, n_pad - n)),
                  constant_values=radius)
    xsp = jnp.pad(xs.astype(jnp.int32), ((0, 0), (0, n_pad - n)),
                  constant_values=radius)

    def kernel(ys_ref, xs_ref, img_ref, out_ref, buf, sems):
        b = pl.program_id(0)
        t = pl.program_id(1)
        offs = []
        roffs = []
        dmas = []
        for j in range(kpb):
            k = t * kpb + j
            y = ys_ref[b, k]
            x = xs_ref[b, k]
            ya = ((y - radius) // 8) * 8
            xa = ((x - radius) // 128) * 128
            roffs.append(y - radius - ya)
            offs.append(x - radius - xa)
            dma = pltpu.make_async_copy(
                img_ref.at[b, pl.ds(ya, SD), pl.ds(xa, WIN)],
                buf.at[j], sems.at[j])
            dma.start()
            dmas.append(dma)
        # Per-keypoint 2D one-hots + two 2D dots (row select, then column
        # select): Mosaic cannot relayout a (kpb,) lane vector into a
        # (kpb,1,1) sublane broadcast ("unsupported shape cast" on real TPU
        # hardware — interpret mode accepted it), and a batch-dim dot_general
        # iterates the MXU per batch element anyway, so the unrolled
        # scalar-broadcast form costs the same and compiles.
        rs = jax.lax.broadcasted_iota(jnp.int32, (S, SD), 0)
        rd = jax.lax.broadcasted_iota(jnp.int32, (S, SD), 1)
        c2 = jax.lax.broadcasted_iota(jnp.int32, (WIN, S), 0)
        s2 = jax.lax.broadcasted_iota(jnp.int32, (WIN, S), 1)
        for j in range(kpb):
            # all-f32 matmuls: this Mosaic rejects bf16 operands with an f32
            # accumulator ("Bad lhs type"); the DMA stays bf16 (the HBM
            # traffic is the point), converted on the VPU after the wait
            rowsel = (rd == roffs[j] + rs).astype(jnp.float32)  # (S, SD)
            colsel = (c2 == offs[j] + s2).astype(jnp.float32)  # (WIN, S)
            dmas[j].wait()
            band = buf[j].astype(jnp.float32)  # (SD, WIN)
            rows = jax.lax.dot_general(
                rowsel, band, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # (S, WIN)
            out_ref[j] = jax.lax.dot_general(
                rows, colsel, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # (S, S)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, n_pad // kpb),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((None, kpb, S, S), lambda b, t, *_: (b, t, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((kpb, SD, WIN), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((kpb,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, n_pad, S, S), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(ysp, xsp, imgp)
    return out[:, :n]


def gather_patches(img: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Gather (2r+1)x(2r+1) patches around integer centers.

    img: (H, W); ys/xs: (N,) int32 with radius <= y < H - radius guaranteed by
    the EDGE margin. Returns (N, 2r+1, 2r+1).

    TPU lowering note: a naive 2D advanced-index gather lowers to per-ELEMENT
    loads (~0.3% of HBM bandwidth). This version does a row gather (contiguous
    W-length blocks, full bandwidth) followed by column selection as a batched
    one-hot matmul on the MXU — measured ~1000x faster at N=2000, r=19.
    bf16 is exact for 8-bit image content.
    """
    n = ys.shape[0]
    side = 2 * radius + 1
    W = img.shape[1]
    dy = jnp.arange(-radius, radius + 1, dtype=ys.dtype)
    ridx = (ys[:, None] + dy[None, :]).reshape(-1)  # (n*side,)
    # cast BEFORE the gather: the einsum consumed bf16 rows anyway (bf16 is
    # exact for 8-bit image content), and gathering bf16 halves the HBM
    # traffic of the materialized (n*side, W) row block — the row gathers
    # were ~25% of the batched extractor's device time.
    rows = img.astype(jnp.bfloat16)[ridx].reshape(n, side, W)
    w_iota = jax.lax.broadcasted_iota(jnp.int32, (n, W, side), 1)
    j_iota = jax.lax.broadcasted_iota(jnp.int32, (n, W, side), 2)
    onehot = (w_iota == xs[:, None, None] + j_iota - radius).astype(jnp.bfloat16)
    patches = jnp.einsum(
        "nrw,nwj->nrj", rows, onehot,
        preferred_element_type=jnp.float32,
    )
    return patches
