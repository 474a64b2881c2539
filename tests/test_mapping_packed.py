"""Parity of the packed/device-resident mapper stage entries vs the plain
array paths (round-5: ONE upload per mapping stage — the unpacked paths
re-uploaded ~17 host arrays per pass through the tunnel). Bit-exact
equality is required: same programs, different transport."""

import numpy as np
import jax.numpy as jnp

from ceres_mono_orb_slam2_tpu.ops import mapping_batch


def _rand_kp(rng, N):
    und = rng.uniform(0, 600, (N, 2)).astype(np.float32)
    oct_ = rng.integers(0, 8, N).astype(np.int32)
    ang = rng.uniform(0, 360, N).astype(np.float32)
    desc = rng.integers(0, 256, (N, 32)).astype(np.uint8)
    valid = rng.random(N) < 0.9
    return und, oct_, ang, desc, valid


def test_bits_roundtrip():
    rng = np.random.default_rng(0)
    for shape in ((70,), (3, 100), (2, 33)):
        m = rng.random(shape) < 0.5
        w = mapping_batch.pack_bits_host(m)
        back = np.asarray(mapping_batch.unpack_bits_dev(
            jnp.asarray(w), shape[-1]))
        assert (back == m).all()


def test_triangulate_packed_parity():
    rng = np.random.default_rng(1)
    B, N = 4, 128
    K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]], np.float32)
    invK = np.linalg.inv(K).astype(np.float32)
    cur = _rand_kp(rng, N)
    R1 = np.eye(3, dtype=np.float32)
    t1 = np.zeros(3, np.float32)
    free1 = rng.random(N) < 0.8
    R2 = np.tile(np.eye(3, dtype=np.float32), (B, 1, 1))
    t2 = rng.normal(0, 0.5, (B, 3)).astype(np.float32)
    nb = [_rand_kp(rng, N) for _ in range(B)]
    free2 = rng.random((B, N)) < 0.8
    nb_valid = np.array([True, True, False, True])
    ls2 = (1.2 ** (2 * np.arange(8))).astype(np.float32)
    sfs = (1.2 ** np.arange(8)).astype(np.float32)

    ref = mapping_batch.triangulate_with_neighbors(
        jnp.asarray(K), jnp.asarray(invK), jnp.asarray(R1), jnp.asarray(t1),
        jnp.asarray(cur[0]), jnp.asarray(cur[1]), jnp.asarray(cur[2]),
        jnp.asarray(cur[3]), jnp.asarray(free1),
        jnp.asarray(R2), jnp.asarray(t2),
        jnp.asarray(np.stack([x[0] for x in nb])),
        jnp.asarray(np.stack([x[1] for x in nb])),
        jnp.asarray(np.stack([x[2] for x in nb])),
        jnp.asarray(np.stack([x[3] for x in nb])),
        jnp.asarray(free2), jnp.asarray(nb_valid),
        jnp.asarray(ls2), jnp.asarray(sfs), jnp.float32(1.8))

    packed = mapping_batch.pack_tri_host(R1, t1, free1, R2, t2, free2, nb_valid)
    got = mapping_batch.triangulate_with_neighbors_packed(
        jnp.asarray(K), jnp.asarray(invK), jnp.asarray(packed),
        jnp.asarray(cur[0]), jnp.asarray(cur[1]), jnp.asarray(cur[2]),
        jnp.asarray(cur[3]),
        tuple(jnp.asarray(x[0]) for x in nb),
        tuple(jnp.asarray(x[1]) for x in nb),
        tuple(jnp.asarray(x[2]) for x in nb),
        tuple(jnp.asarray(x[3]) for x in nb),
        jnp.asarray(ls2), jnp.asarray(sfs), jnp.float32(1.8), B=B, N=N)

    for a, b in zip(ref, got):
        assert (np.asarray(a) == np.asarray(b)).all()


def test_fuse_packed_parity():
    rng = np.random.default_rng(2)
    B, N, M = 3, 96, 64
    K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]], np.float32)
    R = np.tile(np.eye(3, dtype=np.float32), (B, 1, 1))
    t = rng.normal(0, 0.5, (B, 3)).astype(np.float32)
    kps = [_rand_kp(rng, N) for _ in range(B)]
    pos = rng.normal(0, 2, (M, 3)).astype(np.float32)
    pos[:, 2] += 8
    normal = np.tile(np.array([0, 0, 1], np.float32), (M, 1))
    mind = np.full(M, 0.5, np.float32)
    maxd = np.full(M, 50.0, np.float32)
    desc = rng.integers(0, 256, (M, 32)).astype(np.uint8)
    mvalid = rng.random((B, M)) < 0.9
    ls = np.float32(np.log(1.2))
    sfs = (1.2 ** np.arange(8)).astype(np.float32)
    is2 = (1.0 / (1.2 ** (2 * np.arange(8)))).astype(np.float32)
    bounds = jnp.asarray(np.array([0, 640, 0, 480], np.float32))

    ref = mapping_batch.fuse_into_targets(
        jnp.asarray(K), jnp.asarray(R), jnp.asarray(t),
        jnp.asarray(np.stack([x[0] for x in kps])),
        jnp.asarray(np.stack([x[1] for x in kps])),
        jnp.asarray(np.stack([x[3] for x in kps])),
        jnp.asarray(np.stack([x[4] for x in kps])),
        jnp.asarray(pos), jnp.asarray(normal), jnp.asarray(mind),
        jnp.asarray(maxd), jnp.asarray(desc), jnp.asarray(mvalid),
        ls, 8, jnp.asarray(sfs), jnp.asarray(is2), bounds=bounds, th=3.0)

    packed = mapping_batch.pack_fuse_host(R, t, mvalid, pos, normal, mind,
                                          maxd, desc)
    got = mapping_batch.fuse_into_targets_packed(
        jnp.asarray(K), jnp.asarray(packed),
        tuple(jnp.asarray(x[0]) for x in kps),
        tuple(jnp.asarray(x[1]) for x in kps),
        tuple(jnp.asarray(x[3]) for x in kps),
        tuple(jnp.asarray(x[4]) for x in kps),
        ls, jnp.asarray(sfs), jnp.asarray(is2), bounds,
        B=B, M=M, n_levels=8, th=3.0)

    for a, b in zip(ref, got):
        assert (np.asarray(a) == np.asarray(b)).all()
