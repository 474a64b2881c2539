"""Benchmark: fused per-frame tracking step throughput on real TPU hardware.

Measures the flagship device pipeline (batched ORB extraction at KITTI
resolution with the KITTI 2000-feature budget, frustum + scale prediction,
local-map projection matching on the MXU, 4-round trimmed LM pose solve) in
steady state, single stream and the BASELINE.json 8-concurrent-stream batch.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "fps", "vs_baseline": N}
vs_baseline is against the reference's real-time pacing on KITTI (15 fps,
configs/KITTI00-02.yaml Camera.fps — the reference publishes no other
throughput number; SURVEY.md §6).
"""

import json
import time

import numpy as np


def bench(n_streams: int, iters: int = 30, h: int = 376, w: int = 1241):
    import jax

    from ceres_mono_orb_slam2_tpu.parallel.multistream import (
        make_multistream_step,
        synthetic_stream_state,
    )
    from ceres_mono_orb_slam2_tpu.utils.config import ORBConfig, SlamConfig

    # KITTI00-02.yaml budget: 2000 features, 8 levels, scale 1.2
    config = SlamConfig(orb=ORBConfig(n_features=2000))
    step = make_multistream_step(config, h, w)
    images, state = synthetic_stream_state(config, n_streams, n_map_points=4096, h=h, w=w)
    images = jax.device_put(images)
    state = jax.tree_util.tree_map(jax.device_put, state)

    # compile + warmup
    out = step(images, state)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step(images, state)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    return n_streams / dt  # frames tracked per second (aggregate)


def main():
    fps1 = bench(1)
    fps8 = bench(8, iters=10)
    result = {
        "metric": "kitti_res_tracking_step_fps_1stream",
        "value": round(fps1, 2),
        "unit": "fps",
        "vs_baseline": round(fps1 / 15.0, 2),
        "extra": {
            "fps_8_concurrent_streams_aggregate": round(fps8, 2),
            "baseline": "KITTI real-time pacing 15 fps (configs/KITTI00-02.yaml); reference publishes no throughput numbers",
            "shape": "376x1241, 2000 features, 4096-point local map",
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
