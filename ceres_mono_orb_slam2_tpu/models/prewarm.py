"""Startup pre-warm of every steady-state jit shape bucket.

The reference compiles once at build time; an XLA system compiles per
(program, shape) pair at first call. Left to first use, shape-bucket growth
(device-pool dirty sets, fuse candidate blocks, local-BA windows) injects
compile/cache-load stalls into the live loop — round 3 measured 28-122
post-warmup compiles, each a 30 ms..3 s frame stall. `prewarm()` executes a
dummy call for every bucket the steady-state tracking+mapping loop can
reach, so the in-process jit caches are fully populated before frame 0
(first-ever run pays XLA once; later runs load from the persistent
compilation cache configured in __init__.py).

Covers the per-frame tracking path (unified frontend), the per-keyframe
mapping path (pool scatter deltas, reverse/forward fuse, triangulation,
local BA) and the tracking fallbacks. Loop-closure solves (sim3, essential
graph, GBA) are event-scale programs warmed separately by the endurance
harness when a vocabulary is configured.
"""

from __future__ import annotations

import logging
import time

import numpy as np
import jax
import jax.numpy as jnp

log = logging.getLogger(__name__)


def _pow2_lattice(lo: int, hi: int):
    out = []
    b = lo
    while b <= hi:
        out.append(b)
        b *= 2
    return out


def prewarm(slam, h: int, w: int) -> dict:
    """Execute one dummy call per reachable (program, shape-bucket) pair.
    Returns a dict of timings. Safe to call on a fresh MonoSLAM only (it
    touches the tracker's pool); call BEFORE the first frame."""
    from ceres_mono_orb_slam2_tpu.models import fused_track
    from ceres_mono_orb_slam2_tpu.models.device_map import (
        _pool_gather, _pool_scatter)
    from ceres_mono_orb_slam2_tpu.models.localmapping import _fuse_into_device
    from ceres_mono_orb_slam2_tpu.ops import mapping_batch, optim

    t_start = time.perf_counter()
    tr = slam.tracker
    cfg = slam.config
    sh = cfg.shapes
    done = {}

    def mark(name):
        done[name] = round(time.perf_counter() - t_start, 2)
        # stdout heartbeat: prewarm phases are minutes-long and otherwise
        # silent — watchdog wrappers (tools/watchdog_run.sh) use log growth
        # as the liveness signal (KNOWN_ISSUES round 5, tunnel hangs)
        print(f"prewarm[{name}] t+{done[name]}s", flush=True)

    # image bounds are normally derived from the first frame (build_frame)
    if tr.bounds is None:
        from ceres_mono_orb_slam2_tpu.models.frame import compute_image_bounds

        tr.bounds = compute_image_bounds(tr.cam, h, w)
        tr.j_bounds = jnp.asarray(tr.bounds)
        tr.map.image_bounds = tr.bounds

    # ---- frontend: extract + fused step + control pack, ONE program -------
    pool = tr._ensure_pool()
    pool.sync()
    frontend = tr._ensure_frontend(h, w)
    feats = tr.extractor.extract(np.zeros((h, w), np.uint8))
    jax.block_until_ready(feats.xy)
    N = int(feats.valid.shape[-1])
    L = sh.max_local_points
    cap = pool.cap
    zoct = jnp.zeros((N,), jnp.int32)
    zang = jnp.zeros((N,), jnp.float32)
    zdesc = jnp.zeros((N, 32), jnp.uint8)
    if frontend is not None:
        d = tr._frontend_dummies(N, L)
        packed = fused_track.pack_host_inputs(
            np.eye(3, dtype=np.float32), np.zeros(3, np.float32), 1.0,
            np.zeros((N, 3), np.float32), np.zeros(N, bool),
            np.full(N, -1, np.int32), np.full(L, cap, np.int32))
        out = frontend(
            jnp.zeros((h, w), jnp.uint8), zoct, zang, zdesc,
            d["pos0"], d["ok0"], d["row0"],
            d["eye"], d["zero"], d["eye"], d["zero"],
            jnp.asarray(packed), pool.dev, d["slots0"], tr.j_bounds, d["th1"])
        jax.block_until_ready(out)
    mark("frontend")

    # ---- device pool: delta scatter at every dirty-set bucket -------------
    # dummy pool mirrors of the live capacity (the real pool.dev is donated
    # by _pool_scatter, so warm with throwaway copies)
    for D in _pow2_lattice(64, cap):
        dev = (jnp.zeros((cap + 1, 3), jnp.float32),
               jnp.zeros((cap + 1, 3), jnp.float32),
               jnp.zeros((cap + 1,), jnp.float32),
               jnp.zeros((cap + 1,), jnp.float32),
               jnp.zeros((cap + 1, 32), jnp.uint8),
               jnp.zeros((cap + 1,), bool))
        r = _pool_scatter(
            *dev, jnp.full((D,), cap, jnp.int32),
            jnp.zeros((D, 3), jnp.float32), jnp.zeros((D, 3), jnp.float32),
            jnp.zeros((D,), jnp.float32), jnp.zeros((D,), jnp.float32),
            jnp.zeros((D, 32), jnp.uint8), jnp.zeros((D,), bool))
        jax.block_until_ready(r)
        del r, dev
    jax.block_until_ready(_pool_gather(
        *pool.dev, jnp.full((L,), cap, jnp.int32)))
    mark("pool_scatter")

    # ---- mapper: reverse fuse (_fuse_into) at every candidate bucket ------
    jK = jnp.asarray(cfg.camera.K.astype(np.float32))
    log_scale = jnp.float32(np.log(cfg.orb.scale_factor))
    sfs = jnp.asarray(cfg.orb.scale_factors)
    is2 = jnp.asarray(cfg.orb.inv_level_sigma2.astype(np.float32))
    ls2 = jnp.asarray(cfg.orb.level_sigma2.astype(np.float32))
    nlv = cfg.orb.n_levels
    eye = jnp.eye(3, dtype=jnp.float32)
    zero3 = jnp.zeros((3,), jnp.float32)
    wide = jnp.asarray(np.array([-1e6, 1e6, -1e6, 1e6], np.float32))
    kp_und = jnp.zeros((N, 2), jnp.float32)
    kp_oct = jnp.zeros((N,), jnp.int32)
    kp_desc = jnp.zeros((N, 32), jnp.uint8)
    kp_ok = jnp.zeros((N,), bool)
    # candidate sets reach the local-block scale (union of the fuse targets'
    # bound points), so the lattice tops out at the local-points cap
    for Mb in _pow2_lattice(64, max(4096, L)):
        r = _fuse_into_device(
            eye, zero3, jK, wide,
            jnp.zeros((Mb, 3), jnp.float32), jnp.zeros((Mb, 3), jnp.float32),
            jnp.zeros((Mb,), jnp.float32), jnp.zeros((Mb,), jnp.float32),
            jnp.zeros((Mb, 32), jnp.uint8), jnp.zeros((Mb,), bool),
            kp_und, kp_oct, kp_desc, kp_ok,
            log_scale, sfs, is2, n_levels=nlv, th=3.0)
        jax.block_until_ready(r)
    mark("fuse_into")

    # ---- mapper: forward fuse — ONE session shape (localmapping snaps the
    # shared block to the feature bucket) -----------------------------------
    from ceres_mono_orb_slam2_tpu.utils.padding import bucket as _bucket

    lm = slam.local_mapper
    B = lm.FUSE_BATCH
    Mb = _bucket(N, 256)
    kp_und = jnp.zeros((N, 2), jnp.float32)
    kp_oct = jnp.zeros((N,), jnp.int32)
    kp_desc = jnp.zeros((N, 32), jnp.uint8)
    kp_ok = jnp.zeros((N,), bool)
    packed_fuse = mapping_batch.pack_fuse_host(
        np.tile(np.eye(3, dtype=np.float32), (B, 1, 1)),
        np.zeros((B, 3), np.float32), np.zeros((B, Mb), bool),
        np.zeros((Mb, 3), np.float32), np.zeros((Mb, 3), np.float32),
        np.zeros(Mb, np.float32), np.zeros(Mb, np.float32),
        np.zeros((Mb, 32), np.uint8))
    r = mapping_batch.fuse_into_targets_packed(
        jK, jnp.asarray(packed_fuse),
        tuple(kp_und for _ in range(B)), tuple(kp_oct for _ in range(B)),
        tuple(kp_desc for _ in range(B)), tuple(kp_ok for _ in range(B)),
        lm._j_log_scale, lm._j_sfs, lm._j_is2, tr.j_bounds,
        B=B, M=Mb, n_levels=nlv, th=3.0)
    jax.block_until_ready(r)
    mark("fuse_forward")

    # ---- mapper: batched triangulation (one fixed shape, packed path) -----
    TB = lm.TRI_BATCH
    packed_tri = mapping_batch.pack_tri_host(
        np.eye(3, dtype=np.float32), np.zeros(3, np.float32), np.zeros(N, bool),
        np.tile(np.eye(3, dtype=np.float32), (TB, 1, 1)),
        np.zeros((TB, 3), np.float32), np.zeros((TB, N), bool),
        np.zeros(TB, bool))
    r = mapping_batch.triangulate_with_neighbors_packed(
        jK, lm._j_invK, jnp.asarray(packed_tri),
        kp_und, kp_oct, zang, kp_desc,
        tuple(kp_und for _ in range(TB)), tuple(kp_oct for _ in range(TB)),
        tuple(zang for _ in range(TB)), tuple(kp_desc for _ in range(TB)),
        lm._j_ls2, lm._j_sfs, lm._j_ratio, B=TB, N=N)
    jax.block_until_ready(r)
    mark("triangulate")

    # ---- local BA: the ONE session dense-solve shape x 2 iteration plans --
    # (localmapping._lba_build pads every window to at least this shape —
    # every config is warmed, including KITTI-scale BA budgets; a window can
    # only miss this cache by OVERFLOWING the envelope, which _lba_build
    # warns about loudly as the one event that breaks zero-recompiles)
    P0 = _bucket(4 * sh.max_local_keyframes, 8)
    MM0 = _bucket(sh.max_ba_points, 256)
    OO0 = _bucket(sh.max_ba_obs, 1024)
    ba_tail = (
        jnp.zeros((OO0,), jnp.int32), jnp.zeros((OO0,), jnp.int32),
        jnp.zeros((OO0, 2), jnp.float32), jnp.ones((OO0,), jnp.float32),
        jnp.zeros((OO0,), bool), jnp.ones((P0,), bool),
        jnp.zeros((MM0,), bool))
    r = optim.bundle_adjustment(
        jK, jnp.tile(eye, (P0, 1, 1)), jnp.zeros((P0, 3), jnp.float32),
        jnp.zeros((MM0, 3), jnp.float32), *ba_tail,
        iters_huber=5, iters_trimmed=5)
    # the live second call feeds the first solve's COMMITTED device
    # outputs back in (localmapping._local_bundle_adjustment); committed
    # vs uncommitted argument sharding is a distinct pjit cache entry, so
    # warm that exact variant
    r2 = optim.bundle_adjustment(
        jK, r.R, r.t, r.points, *ba_tail, iters_huber=0, iters_trimmed=5)
    jax.block_until_ready((r.R, r2.R))
    mark("local_ba")

    # ---- tracking fallbacks: standalone pose solve at frame size ----------
    r = optim.pose_optimization(
        jK, eye, zero3, jnp.zeros((N, 3), jnp.float32),
        jnp.zeros((N, 2), jnp.float32), jnp.ones((N,), jnp.float32),
        jnp.zeros((N,), bool))
    jax.block_until_ready(r.R)
    mark("pose_opt")

    # ---- relocalization + fallback tracking: every static variant ---------
    # the round-5 endurance runs showed the ONLY post-warmup compiles land
    # while LOST (blackout kidnap / tracking loss): ransac_pnp at the
    # candidate batch, the projection searches at their (static th,
    # check_rotation, dist_th) variants, and frustum/search at the local-map
    # fallback's pow2 point buckets. The reference compiles everything at
    # build time (CMakeLists.txt); warming these keeps the zero-recompile
    # contract through kidnap recovery too.
    import os

    from ceres_mono_orb_slam2_tpu.models.tracking import RELOC_MAX_CANDIDATES
    from ceres_mono_orb_slam2_tpu.ops import frustum, matcher, pnp

    # bisection hook for tunnel/driver wedge diagnosis: comma list of
    # sub-blocks to skip (reloc_bydesc, reloc_pnp, reloc_proj, reloc_frustum)
    _skip = set(os.environ.get("CERES_PREWARM_SKIP", "").split(","))

    bits = matcher.unpack_u8(kp_desc)  # (N, 256)
    if "reloc_bydesc" not in _skip:
        r = matcher.search_by_descriptor(
            zang, bits, kp_ok, zang, bits, kp_ok, ratio=0.75)
        jax.block_until_ready(r)
    if "reloc_pnp" not in _skip:
        key = jax.random.PRNGKey(0)
        r = pnp.ransac_pnp_multi(
            key, jK, jnp.zeros((RELOC_MAX_CANDIDATES, N, 3), jnp.float32),
            jnp.zeros((RELOC_MAX_CANDIDATES, N, 2), jnp.float32),
            jnp.ones((RELOC_MAX_CANDIDATES, N), jnp.float32),
            jnp.zeros((RELOC_MAX_CANDIDATES, N), bool))
        jax.block_until_ready(r.R)
    # motion-model retries (th 15/30, rotation check on) + reloc widening
    # (th 10/dist 100 and th 3/dist 64, rotation check off) — all at the
    # frame keypoint capacity
    if "reloc_proj" not in _skip:
        for th, cr, dth in ((15.0, True, matcher.TH_HIGH),
                            (30.0, True, matcher.TH_HIGH),
                            (10.0, False, 100), (3.0, False, 64)):
            r = matcher.search_by_projection_frame(
                kp_und, kp_oct, zang, bits, kp_ok,
                kp_und, kp_oct, zang, bits, kp_ok, sfs,
                th=th, check_rotation=cr, dist_th=dth)
            jax.block_until_ready(r[0])
    # local-map fallback (non-fused _track_local_map): pow2 candidate buckets
    if "reloc_frustum" not in _skip:
        for Mb in _pow2_lattice(512, max(4096, L)):
            uv, level, viewcos, visible = frustum.frustum_and_scale(
                eye, zero3, jK, tr.j_bounds,
                jnp.zeros((Mb, 3), jnp.float32), jnp.zeros((Mb, 3), jnp.float32),
                jnp.zeros((Mb,), jnp.float32), jnp.zeros((Mb,), jnp.float32),
                jnp.zeros((Mb,), bool),
                # the tracker fallback passes PYTHON floats (weak_type=True,
                # tracking.py frustum call) — a strong-typed jnp.float32 here
                # compiles a DIFFERENT program and the live call still
                # recompiles (smoke2: 3 post-warmup frustum compiles)
                float(np.log(cfg.orb.scale_factor)), nlv)
            mb_bits = matcher.unpack_u8(jnp.zeros((Mb, 32), jnp.uint8))
            for th in (1.0, 5.0):
                r = matcher.search_by_projection_points(
                    kp_und, kp_oct, bits, kp_ok, kp_ok,
                    uv, level, viewcos, mb_bits, visible, sfs, th=th)
                jax.block_until_ready(r[0])
    mark("reloc")

    done["total_s"] = round(time.perf_counter() - t_start, 2)
    log.info("prewarm done: %s", done)
    return done
