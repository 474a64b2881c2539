"""Minimal repro for the round-5 device wedge: after prewarm's reloc block
runs, the NEXT dispatch's device_get never completes. Bisect which warm call
wedges the axon tunnel, and whether degenerate (all-zero) inputs matter."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from ceres_mono_orb_slam2_tpu.ops import matcher, pnp

WHICH = os.environ.get("WHICH", "pnp_zero")
N = 2048
C = 8


def probe(tag):
    t0 = time.perf_counter()
    x = jnp.arange(1024.0)
    y = jax.device_get(jnp.sum(x * x))
    print(f"probe after {tag}: {float(y):.0f} ({time.perf_counter()-t0:.2f}s)",
          flush=True)


def main():
    print("device:", jax.devices()[0], "WHICH:", WHICH, flush=True)
    probe("start")
    K = jnp.asarray([[500.0, 0, 620.0], [0, 500.0, 188.0], [0, 0, 1]],
                    jnp.float32)
    key = jax.random.PRNGKey(0)
    if WHICH in ("pnp_zero", "all"):
        r = pnp.ransac_pnp_multi(
            key, K, jnp.zeros((C, N, 3), jnp.float32),
            jnp.zeros((C, N, 2), jnp.float32),
            jnp.ones((C, N), jnp.float32), jnp.zeros((C, N), bool))
        jax.block_until_ready(r.R)
        print("pnp_zero done", flush=True)
        probe("pnp_zero")
    if WHICH in ("pnp_rand", "all"):
        rng = np.random.default_rng(0)
        pts = rng.uniform(-5, 5, (C, N, 3)).astype(np.float32)
        pts[..., 2] += 10.0
        uv = rng.uniform(0, 1000, (C, N, 2)).astype(np.float32)
        r = pnp.ransac_pnp_multi(
            key, K, jnp.asarray(pts), jnp.asarray(uv),
            jnp.ones((C, N), jnp.float32), jnp.ones((C, N), bool))
        jax.block_until_ready(r.R)
        print("pnp_rand done", flush=True)
        probe("pnp_rand")
    if WHICH in ("search", "all"):
        bits = matcher.unpack_u8(jnp.zeros((N, 32), jnp.uint8))
        zang = jnp.zeros((N,), jnp.float32)
        ok = jnp.zeros((N,), bool)
        und = jnp.zeros((N, 2), jnp.float32)
        oct_ = jnp.zeros((N,), jnp.int32)
        sfs = jnp.asarray(np.full(8, 1.2, np.float32))
        r = matcher.search_by_descriptor(zang, bits, ok, zang, bits, ok,
                                         ratio=0.75)
        jax.block_until_ready(r[0])
        for th, cr, dth in ((15.0, True, matcher.TH_HIGH),
                            (30.0, True, matcher.TH_HIGH),
                            (10.0, False, 100), (3.0, False, 64)):
            r = matcher.search_by_projection_frame(
                und, oct_, zang, bits, ok, und, oct_, zang, bits, ok, sfs,
                th=th, check_rotation=cr, dist_th=dth)
            jax.block_until_ready(r[0])
        print("search done", flush=True)
        probe("search")
    # a bigger consumer after, like frame-0 extraction
    img = jnp.zeros((376, 1241), jnp.uint8)
    big = jnp.sum(img.astype(jnp.float32))
    print("final fetch:", float(jax.device_get(big)), flush=True)
    print("OK", flush=True)


if __name__ == "__main__":
    main()
