"""Host map-layer stress bench at KITTI-00 scale (no images, no device).

Builds a synthetic map graph the size a full KITTI-00 run produces
(~N_KF keyframes, ~150 live points bound per KF with ~4-6 observers each)
and times the host bookkeeping ops that run per keyframe insertion:
update_connections, refresh_points, _median_depth, keyframe-culling
redundancy, tracked_map_points, and the device-pool sync gather. The
reference performs the same bookkeeping under std::mutex in C++
(KeyFrame::UpdateConnections KeyFrame.cc:314-398, LocalMapping::
KeyFrameCulling LocalMapping.cc:576-637); this bench guards the Python+
numpy SoA equivalent against asymptotic cliffs as the map grows.

Usage: python tools/bench_host_map.py [--kfs 600] [--pts-per-kf 150]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# force CPU: the axon sitecustomize pre-sets JAX_PLATFORMS=axon, and the
# first jnp constant (ops/matcher.py import) would hang on a dead tunnel
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np


def build_map(n_kfs: int, pts_per_kf: int, n_slots: int, rng):
    from ceres_mono_orb_slam2_tpu.models.map import Map

    m = Map()

    class _F:
        pass

    # camera sweeps forward; each KF triangulates fresh points and re-observes
    # the previous ~4 KFs' points (a realistic covisibility band)
    prev_points = []  # sliding window of recent point ids
    for k in range(n_kfs):
        f = _F()
        f.id = k * 3
        f.timestamp = k / 10.0
        f.Rcw = np.eye(3, dtype=np.float32)
        f.tcw = np.array([0.0, 0.0, -0.6 * k], np.float32)
        f.kp_xy = rng.uniform(0, 1200, (n_slots, 2)).astype(np.float32)
        f.kp_und = f.kp_xy
        f.kp_octave = rng.integers(0, 8, n_slots).astype(np.int32)
        f.kp_angle = np.zeros(n_slots, np.float32)
        f.kp_response = np.zeros(n_slots, np.float32)
        f.desc = rng.integers(0, 256, (n_slots, 32)).astype(np.uint8)
        f.kp_valid = np.ones(n_slots, bool)
        f.mp_ids = np.full(n_slots, -1, np.int64)
        kf = m.new_keyframe(f)

        slot = 0
        new_ids = []
        for _ in range(pts_per_kf):
            pos = np.array([rng.normal(), rng.normal(), 0.6 * k + 5.0], np.float32)
            mp = m.new_map_point(pos, rng.integers(0, 256, 32).astype(np.uint8), kf.id)
            m.add_observation(mp, kf, slot)
            new_ids.append(mp.id)
            slot += 1
        # re-observe a sample of the recent window
        for ids in prev_points[-4:]:
            take = rng.choice(ids, size=min(60, len(ids)), replace=False)
            for mid in take:
                mp = m.map_points[int(mid)]
                if not mp.bad and slot < n_slots:
                    m.add_observation(mp, kf, slot)
                    slot += 1
        prev_points.append(new_ids)
        m.update_connections(kf)
    return m


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kfs", type=int, default=600)
    ap.add_argument("--pts-per-kf", type=int, default=150)
    ap.add_argument("--slots", type=int, default=2000)
    args = ap.parse_args()
    rng = np.random.default_rng(0)

    t0 = time.perf_counter()
    m = build_map(args.kfs, args.pts_per_kf, args.slots, rng)
    build_s = time.perf_counter() - t0
    n_obs = int(m.mp_nobs.sum())
    print("map: %d KFs, %d live points, %d observations (built in %.1f s, "
          "%.1f ms/KF incl. update_connections)" % (
              m.n_keyframes(), m.n_map_points(), n_obs, build_s,
              build_s / args.kfs * 1e3))

    last = m.keyframes[max(m.keyframes)]
    sf = (1.2 ** np.arange(8)).astype(np.float32)

    def timeit(label, fn, n=5):
        t = time.perf_counter()
        for _ in range(n):
            fn()
        dt = (time.perf_counter() - t) / n * 1e3
        print("%-34s %8.2f ms" % (label, dt), flush=True)
        return dt

    timeit("update_connections(newest)", lambda: m.update_connections(last))
    ids = [int(x) for x in last.mp_ids[last.mp_ids >= 0]]
    timeit("refresh_points(1 KF window)", lambda: m.refresh_points(ids, sf))
    all_ids = [mp.id for mp in m.all_map_points()]
    timeit("refresh_points(FULL map)", lambda: m.refresh_points(all_ids, sf), n=2)
    timeit("_obs_arrays(FULL map)", lambda: m._obs_arrays(), n=3)
    timeit("tracked_map_points", lambda: last.tracked_map_points(3, m), n=20)

    import jax
    jax.config.update("jax_platforms", "cpu")
    from ceres_mono_orb_slam2_tpu.models.localmapping import LocalMapping
    lm = LocalMapping.__new__(LocalMapping)
    lm.map = m
    lm.scale_factors = sf
    timeit("_median_depth", lambda: lm._median_depth(last), n=20)
    table = m._obs_arrays()
    timeit("_redundancy(1 candidate)", lambda: lm._redundancy(last, table), n=20)


if __name__ == "__main__":
    main()
