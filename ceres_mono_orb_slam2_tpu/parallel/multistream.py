"""Batched multi-stream tracking step + multi-chip sharding.

The BASELINE.json batched mode: N concurrent SLAM streams on one (or more)
chips, with a leading stream axis through the whole per-frame device pipeline
(extract -> frustum -> projection match -> pose LM). The reference has no
analogue — it is a single-stream CPU system; this is the throughput-oriented
TPU deployment shape (SURVEY.md §2 parallelism checklist).

Sharding story (multi-chip): streams shard over the `dp` mesh axis (each
stream's map is independent), and the local-map point axis shards over `mp` —
the matcher's (keypoints x map-points) Hamming matmul then computes
column-block-parallel with an argmin combine, which XLA lowers to ICI
collectives. TP/PP/EP in the transformer sense do not exist in a SLAM
workload (SURVEY.md §2); dp x mp is the faithful equivalent
(data x model-state).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ceres_mono_orb_slam2_tpu.ops import frustum, matcher, optim
from ceres_mono_orb_slam2_tpu.ops.orb.extractor import ORBExtractor


class StreamState(NamedTuple):
    """Per-stream tracking state (leading axis = streams)."""

    Rcw: jnp.ndarray  # (S, 3, 3)
    tcw: jnp.ndarray  # (S, 3)
    map_pos: jnp.ndarray  # (S, M, 3)
    map_normal: jnp.ndarray  # (S, M, 3)
    map_min_dist: jnp.ndarray  # (S, M)
    map_max_dist: jnp.ndarray  # (S, M)
    map_bits: jnp.ndarray  # (S, M, 256) +-1 descriptor bits
    map_valid: jnp.ndarray  # (S, M)


class StepResult(NamedTuple):
    Rcw: jnp.ndarray
    tcw: jnp.ndarray
    n_inliers: jnp.ndarray  # (S,)
    n_matches: jnp.ndarray  # (S,)


def make_multistream_step(config, h: int, w: int):
    """Build the fused per-frame device step for a batch of streams:
    ORB extraction, frustum + scale prediction, local-map projection search,
    and the 4-round trimmed LM pose solve — one jit, leading stream axis."""
    extractor = ORBExtractor(config.orb)
    extract = extractor._extract_jit(h, w)
    # closure constants stay NUMPY (device-array closures are fetched
    # device->host at every lowering; slow over the tunnel — see
    # ops/orb/extractor.py _bin_tap_table)
    K = np.asarray(config.camera.K, np.float32)
    scales = np.asarray(config.orb.scale_factors, np.float32)
    inv_sigma2 = np.asarray(config.orb.inv_level_sigma2, np.float32)
    bounds = np.array([0, w, 0, h], np.float32)
    log_scale = float(np.log(config.orb.scale_factor))
    n_levels = config.orb.n_levels

    def one_stream(image_feats, Rcw, tcw, map_pos, map_normal, map_mind, map_maxd, map_bits, map_valid):
        xy, octv, angle, desc, valid = image_feats
        kp_bits = matcher.unpack_bits_pm1(desc)
        uv, level, viewcos, visible = frustum.frustum_and_scale(
            Rcw, tcw, K, bounds, map_pos, map_normal, map_mind, map_maxd,
            map_valid, log_scale, n_levels,
        )
        idx, dist, mvalid = matcher.search_by_projection_points(
            xy, octv, kp_bits, valid, jnp.ones_like(valid),
            uv, level, viewcos, map_bits, visible, jnp.asarray(scales), th=3.0,
        )
        n_kp = xy.shape[0]
        # scatter matched map-point positions into keypoint slots; invalid
        # matches route to a dummy slot so they cannot clobber valid ones
        safe_idx = jnp.where(mvalid, idx, n_kp)
        pos_kp = jnp.zeros((n_kp + 1, 3), jnp.float32).at[safe_idx].set(map_pos)[:-1]
        ok = jnp.zeros((n_kp + 1,), bool).at[safe_idx].set(mvalid)[:-1]
        # the LIVE tracker's solver configuration (25 iters x 4 trimming
        # rounds with convergence early-exit) — the benchmark measures what
        # the production path actually runs
        res = optim.pose_optimization(
            K, Rcw, tcw, pos_kp, xy, jnp.asarray(inv_sigma2)[octv], ok)
        return res.R, res.t, res.n_inliers, jnp.sum(mvalid.astype(jnp.int32))

    def step(images, state: StreamState) -> StepResult:
        feats = extract(images)  # batched over streams already
        packed = (feats.xy, feats.octave, feats.angle, feats.desc, feats.valid)
        if images.shape[0] == 1:
            # single stream: skip the (trivial) vmap wrapper. The pose
            # solver's LM loop is a lax.while_loop, so batched streams ALSO
            # early-exit (at the slowest stream's convergence); this branch
            # just keeps the single-stream trace free of batching machinery
            args = jax.tree_util.tree_map(
                lambda a: a[0],
                (packed, state.Rcw, state.tcw, state.map_pos, state.map_normal,
                 state.map_min_dist, state.map_max_dist, state.map_bits, state.map_valid))
            R, t, ninl, nm = one_stream(*args)
            return StepResult(Rcw=R[None], tcw=t[None],
                              n_inliers=ninl[None], n_matches=nm[None])
        R, t, ninl, nm = jax.vmap(one_stream)(
            packed, state.Rcw, state.tcw, state.map_pos, state.map_normal,
            state.map_min_dist, state.map_max_dist, state.map_bits, state.map_valid,
        )
        return StepResult(Rcw=R, tcw=t, n_inliers=ninl, n_matches=nm)

    return jax.jit(step)


def synthetic_stream_state(config, n_streams: int, n_map_points: int, seed: int = 0,
                           h: int = 480, w: int = 640) -> tuple:
    """Geometrically-consistent stream states + images for benchmarking:
    each stream's map is built by back-projecting the extractor's own
    keypoints on that stream's image to plausible depths, so the projection
    search genuinely matches and the LM solve does real work."""
    rng = np.random.default_rng(seed)
    fx, fy = config.camera.fx, config.camera.fy
    cx, cy = config.camera.cx, config.camera.cy
    # blobby images so FAST actually fires
    images = np.full((n_streams, h, w), 40.0, np.float32)
    for s in range(n_streams):
        for _ in range((h * w) // 900):
            y = rng.integers(0, h - 10)
            x = rng.integers(0, w - 10)
            images[s, y : y + rng.integers(3, 10), x : x + rng.integers(3, 10)] = rng.uniform(90, 250)
        images[s] += rng.standard_normal((h, w)).astype(np.float32) * 2

    extractor = ORBExtractor(config.orb)
    feats = extractor.extract(images)
    kxy = np.asarray(feats.xy)
    kdesc = np.asarray(feats.desc)
    kvalid = np.asarray(feats.valid)

    M = n_map_points
    pos = np.zeros((n_streams, M, 3), np.float32)
    desc = np.zeros((n_streams, M, 32), np.uint8)
    valid = np.zeros((n_streams, M), bool)
    for s in range(n_streams):
        vi = np.nonzero(kvalid[s])[0]
        take = vi[: min(len(vi), M)]
        z = rng.uniform(4.0, 9.0, len(take)).astype(np.float32)
        pos[s, : len(take), 0] = (kxy[s, take, 0] - cx) / fx * z
        pos[s, : len(take), 1] = (kxy[s, take, 1] - cy) / fy * z
        pos[s, : len(take), 2] = z
        desc[s, : len(take)] = kdesc[s, take]
        valid[s, : len(take)] = True
    # viewing normal = direction camera->point (reference UpdateNormalAndDepth)
    normal = pos / np.maximum(np.linalg.norm(pos, axis=-1, keepdims=True), 1e-6)
    dists = np.maximum(np.linalg.norm(pos, axis=-1), 1.0)
    bits = np.asarray(matcher.unpack_u8(desc))
    state = StreamState(
        Rcw=jnp.asarray(np.tile(np.eye(3, dtype=np.float32), (n_streams, 1, 1))),
        tcw=jnp.zeros((n_streams, 3), jnp.float32),
        map_pos=jnp.asarray(pos),
        map_normal=jnp.asarray(normal),
        map_min_dist=jnp.asarray((dists * 0.5).astype(np.float32)),
        map_max_dist=jnp.asarray((dists * 2.0).astype(np.float32)),
        map_bits=jnp.asarray(bits),
        map_valid=jnp.asarray(valid),
    )
    return jnp.asarray(images), state


def make_multistream_local_ba(iters_huber: int = 5, iters_trimmed: int = 10):
    """Batched local bundle adjustment: one jit solving S independent
    streams' local BA problems simultaneously (the BASELINE.json batched
    mode is 'batched ORB + BA'). All streams share static problem shapes
    (P poses, M points, O observations, mask-padded); the LM iterations
    vmap over the stream axis.

    Returns fn(K, R (S,P,3,3), t, points (S,M,3), obs_pose (S,O), obs_point,
    obs_uv, obs_w, obs_valid, fixed (S,P), point_valid (S,M)) -> BAResult
    with a leading stream axis on every field."""
    solve = partial(optim.bundle_adjustment,
                    iters_huber=iters_huber, iters_trimmed=iters_trimmed)

    @jax.jit
    def batched(K, R, t, points, obs_pose, obs_point, obs_uv, obs_w,
                obs_valid, fixed, point_valid):
        return jax.vmap(solve, in_axes=(None, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0))(
            K, R, t, points, obs_pose, obs_point, obs_uv, obs_w,
            obs_valid, fixed, point_valid)

    return batched


def shard_step_over_mesh(config, h: int, w: int, mesh):
    """Multi-chip variant: jit the multistream step with stream-axis (dp) and
    map-point-axis (mp) shardings over the given jax.sharding.Mesh."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    step = make_multistream_step(config, h, w)
    img_s = NamedSharding(mesh, P("dp", None, None))
    state_s = StreamState(
        Rcw=NamedSharding(mesh, P("dp", None, None)),
        tcw=NamedSharding(mesh, P("dp", None)),
        map_pos=NamedSharding(mesh, P("dp", "mp", None)),
        map_normal=NamedSharding(mesh, P("dp", "mp", None)),
        map_min_dist=NamedSharding(mesh, P("dp", "mp")),
        map_max_dist=NamedSharding(mesh, P("dp", "mp")),
        map_bits=NamedSharding(mesh, P("dp", "mp", None)),
        map_valid=NamedSharding(mesh, P("dp", "mp")),
    )
    out_s = StepResult(
        Rcw=NamedSharding(mesh, P("dp", None, None)),
        tcw=NamedSharding(mesh, P("dp", None)),
        n_inliers=NamedSharding(mesh, P("dp")),
        n_matches=NamedSharding(mesh, P("dp")),
    )
    return jax.jit(step, in_shardings=(img_s, state_s), out_shardings=out_s), img_s, state_s
