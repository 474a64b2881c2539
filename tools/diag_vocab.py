"""Is the structure-generated ORBvoc-scale vocabulary (bow.synth_vocabulary)
actually usable for retrieval on REAL descriptors? The round-5 endurance
shakeout never relocalized after the blackout with --synth-vocab-levels 6,
while the corpus-trained vocabulary recovered fine. This probes why:
BoW similarity (L1 score) and shared-word counts between overlapping vs
non-overlapping views, under both vocabularies."""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from ceres_mono_orb_slam2_tpu.ops import bow
from ceres_mono_orb_slam2_tpu.ops.orb import ORBExtractor
from ceres_mono_orb_slam2_tpu.utils.config import ORBConfig
from ceres_mono_orb_slam2_tpu.utils.synthetic import (
    make_rendered_sequence_device)


def make_vec(voc):
    import jax.numpy as jnp

    tf = bow.make_transform_fn(voc)

    def vec(desc):
        wids, _ = tf(jnp.asarray(desc), jnp.asarray(np.ones(len(desc), bool)))
        return bow.bow_vector(np.asarray(wids), voc.word_weight, voc.n_words)

    return vec


def score_pair(vec, da, db):
    va, vb = vec(da), vec(db)
    shared = len(set(va.keys()) & set(vb.keys()))
    return bow.l1_score(va, vb), shared, len(va)


def main():
    seq = make_rendered_sequence_device(
        n_frames=160, h=376, w=1241, fx=500.0, fy=500.0, seed=11,
        motion="circle", step=0.06, cache_dir="/tmp/render_cache")
    ex = ORBExtractor(ORBConfig(n_features=2000))

    def desc_of(k):
        fe = ex.extract(seq.images[k])
        d = np.asarray(fe.desc)[0]
        v = np.asarray(fe.valid)[0]
        return d[v]

    d10, d12, d14, d100 = desc_of(10), desc_of(12), desc_of(14), desc_of(100)
    print(f"descriptors: {len(d10)} {len(d12)} {len(d100)}")

    corpus = [desc_of(k) for k in range(0, 40, 4)]
    t0 = time.perf_counter()
    voc_t = bow.train_vocabulary(np.concatenate(corpus), k=10, levels=4,
                                 seed=0, docs=corpus)
    print(f"trained vocab: {voc_t.n_words} words ({time.perf_counter()-t0:.0f}s)")
    t0 = time.perf_counter()
    voc_s = bow.synth_vocabulary(k=10, levels=6, seed=0)
    print(f"synth vocab: {voc_s.n_words:,} words ({time.perf_counter()-t0:.0f}s)")

    t0 = time.perf_counter()
    voc_d = bow.seeded_vocabulary(np.concatenate(corpus), k=10, levels=6,
                                  seed=0, docs=corpus)
    print(f"seeded vocab: {voc_d.n_words:,} words ({time.perf_counter()-t0:.0f}s)")

    for name, voc in (("trained", voc_t), ("synth-1M", voc_s),
                      ("seeded-1M", voc_d)):
        vec = make_vec(voc)
        s_near, sh_near, n_near = score_pair(vec, d10, d12)
        s_mid, sh_mid, _ = score_pair(vec, d10, d14)
        s_far, sh_far, _ = score_pair(vec, d10, d100)
        s_self, sh_self, _ = score_pair(vec, d10, d10)
        print(f"{name}: self={s_self:.3f}/{sh_self}w  near(10,12)={s_near:.3f}"
              f"/{sh_near}w  mid(10,14)={s_mid:.3f}/{sh_mid}w  "
              f"far(10,100)={s_far:.3f}/{sh_far}w  (words in f10: {n_near})")


if __name__ == "__main__":
    main()
