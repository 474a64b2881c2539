"""BoW vocabulary at the reference's real scale (VERDICT r2 item #3).

The reference loads ORBvoc.txt — k=10, L=6, 1,111,111 nodes / 1,000,000
words (TemplatedVocabulary.h:1338-1423) — and its KeyFrameDatabase gates are
calibrated to that scale. This tool:

1. structure-generates a full k=10 L=6 vocabulary (ops/bow.synth_vocabulary),
2. round-trips it through the standard ORBvoc.txt text format
   (dump_orbvoc_text -> parse_orbvoc_text) and checks the transform partition
   + weights survive,
3. measures `transform` for a 2000-descriptor frame with the 35 MB packed
   tree resident in HBM (target <= 2 ms),
4. smoke-tests KeyFrameDatabase share-word statistics at 1M words.

Run on the TPU:  python tools/bench_bow_scale.py [--skip-roundtrip]
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from ceres_mono_orb_slam2_tpu.ops import bow


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--levels", type=int, default=6)
    ap.add_argument("--skip-roundtrip", action="store_true")
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    t0 = time.perf_counter()
    voc = bow.synth_vocabulary(k=10, levels=args.levels, seed=0)
    print(f"synth vocabulary: {len(voc.node_desc):,} nodes, {voc.n_words:,} words "
          f"({time.perf_counter()-t0:.1f}s)", flush=True)

    if not args.skip_roundtrip:
        t0 = time.perf_counter()
        path = "/tmp/orbvoc_synth.txt"
        bow.dump_orbvoc_text(voc, path)
        import os
        size_mb = os.path.getsize(path) / 1e6
        print(f"dumped ORBvoc text: {size_mb:.0f} MB ({time.perf_counter()-t0:.1f}s)", flush=True)
        t0 = time.perf_counter()
        voc2 = bow.parse_orbvoc_text(path)
        print(f"parsed back: {len(voc2.node_desc):,} nodes ({time.perf_counter()-t0:.1f}s)", flush=True)
        assert voc2.n_words == voc.n_words
        rng = np.random.default_rng(0)
        q = rng.integers(0, 256, (256, 32), dtype=np.uint8)
        w1 = np.asarray(bow.make_transform_fn(voc)(jnp.asarray(q), jnp.ones(256, bool))[0])
        w2 = np.asarray(bow.make_transform_fn(voc2)(jnp.asarray(q), jnp.ones(256, bool))[0])
        for i in range(0, 256, 13):
            for j in range(i + 1, 256, 17):
                assert (w1[i] == w1[j]) == (w2[i] == w2[j])
        assert np.allclose(np.sort(voc.word_weight), np.sort(voc2.word_weight), rtol=1e-4)
        print("text round-trip: partition + weights preserved", flush=True)

    # transform throughput: one KITTI-budget frame (2000 descriptors)
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.integers(0, 256, (2048, 32), dtype=np.uint8))
    valid = jnp.ones(2048, bool)
    transform = bow.make_transform_fn(voc)
    out = transform(q, valid)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = transform(q, valid)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / args.iters * 1e3
    wids = np.asarray(out[0])
    print(f"transform 2048 descriptors through {len(voc.node_desc):,} nodes: "
          f"{ms:.2f} ms  ({len(np.unique(wids)):,} distinct words hit)", flush=True)

    # KeyFrameDatabase smoke at scale: 200 keyframes of random descriptors,
    # near-duplicate query must rank its source first by share-word count
    from ceres_mono_orb_slam2_tpu.models.keyframe_database import KeyFrameDatabase
    from ceres_mono_orb_slam2_tpu.models.map import Map

    m = Map()
    db = KeyFrameDatabase(voc, m)

    class KFShim:
        def __init__(self, i, desc):
            self.id = i
            self.desc = desc
            self.kp_valid = np.ones(len(desc), bool)
            self.bow_vec = None
            self.covisible = {}
            self.bad = False

    t0 = time.perf_counter()
    kfs = []
    for i in range(200):
        kf = KFShim(i, rng.integers(0, 256, (500, 32), dtype=np.uint8))
        m.keyframes[i] = kf
        db.add(kf)
        kfs.append(kf)
    print(f"indexed 200 KFs x 500 desc ({time.perf_counter()-t0:.1f}s)", flush=True)
    target = kfs[57]
    qdesc = target.desc.copy()
    flip = rng.integers(0, 256, (len(qdesc), 2))
    for r in range(len(qdesc)):
        for b in flip[r]:
            qdesc[r, b // 8] ^= 1 << (b % 8)
    qkf = KFShim(999, qdesc)
    qv = db.compute_bow(qkf.desc, qkf.kp_valid)
    scores = [(bow.l1_score(qv, db.kf_bow(kf)), kf.id) for kf in kfs]
    scores.sort(reverse=True)
    print(f"near-duplicate query: best={scores[0]}, second={scores[1]}", flush=True)
    assert scores[0][1] == 57, "1M-word database failed to rank the source KF first"
    print("OK", flush=True)


if __name__ == "__main__":
    main()
