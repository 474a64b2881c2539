"""Reconcile the 47 ms bench_local_ba vs 0.24 ms prof_lba discrepancy:
time the SAME bundle_adjustment at both shapes, pipelined and per-call."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from ceres_mono_orb_slam2_tpu.ops import optim


def make(P, M, O, seed=0):
    rng = np.random.default_rng(seed)
    K = jnp.asarray([[718.856, 0, 607.19], [0, 718.856, 185.2], [0, 0, 1]],
                    jnp.float32)
    pts = np.stack([rng.uniform(-10, 10, M), rng.uniform(-3, 3, M),
                    rng.uniform(5, 40, M)], -1).astype(np.float32)
    R = np.tile(np.eye(3, dtype=np.float32), (P, 1, 1))
    t = np.stack([np.array([0.5 * i, 0, 0], np.float32) for i in range(P)])
    op = rng.integers(0, P, O).astype(np.int32)
    oj = rng.integers(0, M, O).astype(np.int32)
    Xc = np.einsum("oij,oj->oi", R[op], pts[oj]) + t[op]
    Kn = np.asarray(K)
    uv = np.stack([Kn[0, 0] * Xc[:, 0] / Xc[:, 2] + Kn[0, 2],
                   Kn[1, 1] * Xc[:, 1] / Xc[:, 2] + Kn[1, 2]], -1)
    uv = (uv + rng.normal(0, 0.5, uv.shape)).astype(np.float32)
    fixed = np.zeros(P, bool)
    fixed[:4] = True
    return (K, jnp.asarray(R), jnp.asarray(t), jnp.asarray(pts),
            jnp.asarray(op), jnp.asarray(oj), jnp.asarray(uv),
            jnp.ones(O, jnp.float32), jnp.ones(O, bool), jnp.asarray(fixed),
            jnp.ones(M, bool))


def run(tag, args, ih, it, n=10):
    res = optim.bundle_adjustment(*args, iters_huber=ih, iters_trimmed=it)
    jax.block_until_ready(res)
    # pipelined
    t0 = time.perf_counter()
    for _ in range(n):
        res = optim.bundle_adjustment(*args, iters_huber=ih, iters_trimmed=it)
    jax.block_until_ready(res)
    pipe = (time.perf_counter() - t0) / n * 1e3
    # per-call latency
    t0 = time.perf_counter()
    for _ in range(n):
        res = optim.bundle_adjustment(*args, iters_huber=ih, iters_trimmed=it)
        jax.block_until_ready(res)
    lat = (time.perf_counter() - t0) / n * 1e3
    print(f"{tag}: pipelined {pipe:.2f} ms  per-call {lat:.2f} ms")


if __name__ == "__main__":
    print("device:", jax.devices()[0])
    a16 = make(16, 2048, 8192)
    a64 = make(64, 2048, 8192)
    run("P=16 5+10 (bench shape)", a16, 5, 10)
    run("P=16 5+5           ", a16, 5, 5)
    run("P=16 0+5           ", a16, 0, 5)
    run("P=64 5+5           ", a64, 5, 5)
    run("P=64 0+5           ", a64, 0, 5)
