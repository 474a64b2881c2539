"""Bag-of-visual-words layer: vocabulary tree, batched transform, L1 scoring.

TPU-native equivalent of the vendored DBoW2 (reference lib/DBoW2/
TemplatedVocabulary.h): the vocabulary is stored as dense device tensors
(node descriptors (N,32)u8 -> unpacked bit matrix, children table (N,K)i32)
and `transform` descends the tree for ALL descriptors of a frame in parallel
— each level is one gather + one Hamming argmin over K children on the MXU,
replacing DBoW2's per-descriptor recursive walk (FORB::distance loops).

Two vocabulary sources:
- `parse_orbvoc_text` reads the standard ORBvoc.txt format
  (TemplatedVocabulary::loadFromTextFile, TemplatedVocabulary.h:1338-1423).
  The reference repo itself ships the file only as a missing-blob pointer.
- `train_vocabulary` builds a small k-medians binary-descriptor tree from
  sample descriptors (TemplatedVocabulary::create equivalent) so the system
  is self-contained on any dataset.

Scoring is DBoW2 L1 (ScoringObject.cpp): s = 1 - 0.5*|v1/|v1| - v2/|v2||_1.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict

import numpy as np
import jax
import jax.numpy as jnp

from ceres_mono_orb_slam2_tpu.ops import matcher


@dataclass
class Vocabulary:
    k: int  # branching factor
    levels: int
    node_desc: np.ndarray  # (N, 32) uint8
    children: np.ndarray  # (N, k) int32, -1 padded
    is_leaf: np.ndarray  # (N,) bool
    word_id: np.ndarray  # (N,) int32, -1 for non-leaves
    word_weight: np.ndarray  # (W,) float32 idf weights
    node_level: np.ndarray  # (N,) int32

    @property
    def n_words(self) -> int:
        return len(self.word_weight)

    def device_tensors(self):
        bits = matcher.unpack_bits_pm1(jnp.asarray(self.node_desc))
        return (
            bits,
            jnp.asarray(self.children),
            jnp.asarray(self.word_id),
            jnp.asarray(self.word_weight),
        )


def _kmedians_binary(descs: np.ndarray, k: int, rng, iters: int = 8):
    """Binary k-medians: centers are bitwise majority vote of members."""
    n = len(descs)
    k = min(k, n)
    centers = descs[rng.choice(n, k, replace=False)].copy()
    bits = np.unpackbits(descs, axis=-1).astype(np.int32)  # (n, 256)
    for _ in range(iters):
        cbits = np.unpackbits(centers, axis=-1).astype(np.int32)
        d = np.abs(bits[:, None, :] - cbits[None, :, :]).sum(-1)
        assign = d.argmin(-1)
        for j in range(k):
            sel = bits[assign == j]
            if len(sel):
                maj = (sel.mean(0) >= 0.5).astype(np.uint8)
                centers[j] = np.packbits(maj)
    cbits = np.unpackbits(centers, axis=-1).astype(np.int32)
    assign = np.abs(bits[:, None, :] - cbits[None, :, :]).sum(-1).argmin(-1)
    return centers, assign


def train_vocabulary(descs: np.ndarray, k: int = 10, levels: int = 3, seed: int = 0) -> Vocabulary:
    """Hierarchical binary k-medians vocabulary (DBoW2 create equivalent).
    descs: (N, 32) uint8 sample descriptors."""
    rng = np.random.default_rng(seed)
    node_desc = [np.zeros(32, np.uint8)]  # root (unused descriptor)
    children: list = [[]]
    is_leaf = [False]
    node_level = [0]

    def build(node, members, level):
        if level == levels or len(members) < k * 2:
            is_leaf[node] = True
            return
        centers, assign = _kmedians_binary(members, k, rng)
        for j in range(len(centers)):
            sub = members[assign == j]
            if len(sub) == 0:
                continue
            nid = len(node_desc)
            node_desc.append(centers[j])
            children.append([])
            is_leaf.append(False)
            node_level.append(level + 1)
            children[node].append(nid)
            build(nid, sub, level + 1)
        if not children[node]:
            is_leaf[node] = True

    build(0, descs, 0)
    n = len(node_desc)
    kmax = max((len(c) for c in children), default=1)
    kmax = max(kmax, 1)
    ch = np.full((n, kmax), -1, np.int32)
    for i, c in enumerate(children):
        ch[i, : len(c)] = c
    leaf_mask = np.array(is_leaf)
    word_id = np.full(n, -1, np.int32)
    wids = np.nonzero(leaf_mask)[0]
    word_id[wids] = np.arange(len(wids), dtype=np.int32)
    # uniform idf weights (reference uses TF_IDF trained from corpus; with a
    # self-trained vocab each leaf gets idf from the training sample)
    weights = np.ones(len(wids), np.float32)
    return Vocabulary(
        k=kmax, levels=levels, node_desc=np.stack(node_desc), children=ch,
        is_leaf=leaf_mask, word_id=word_id, word_weight=weights,
        node_level=np.array(node_level, np.int32),
    )


def parse_orbvoc_text(path: str) -> Vocabulary:
    """Parse the standard ORBvoc.txt (reference loadFromTextFile,
    TemplatedVocabulary.h:1338-1423): header 'k L scoring weighting', then one
    line per node: parent_id is_leaf d0..d31 weight."""
    with open(path, "r") as f:
        header = f.readline().split()
        k, levels = int(header[0]), int(header[1])
        parents, leafs, descs, weights = [], [], [], []
        for line in f:
            parts = line.split()
            if len(parts) < 35:
                continue
            parents.append(int(parts[0]))
            leafs.append(bool(int(parts[1])))
            descs.append([int(x) for x in parts[2:34]])
            weights.append(float(parts[34]))
    n = len(parents) + 1  # +1 root
    node_desc = np.zeros((n, 32), np.uint8)
    node_desc[1:] = np.array(descs, np.uint8)
    is_leaf = np.zeros(n, bool)
    is_leaf[1:] = leafs
    ch_lists: list = [[] for _ in range(n)]
    for i, p in enumerate(parents):
        ch_lists[p].append(i + 1)
    kmax = max((len(c) for c in ch_lists), default=1) or 1
    children = np.full((n, kmax), -1, np.int32)
    for i, c in enumerate(ch_lists):
        children[i, : len(c)] = c
    word_id = np.full(n, -1, np.int32)
    wids = np.nonzero(is_leaf)[0]
    word_id[wids] = np.arange(len(wids), dtype=np.int32)
    w = np.zeros(len(wids), np.float32)
    for j, nid in enumerate(wids):
        w[j] = weights[nid - 1]
    level = np.zeros(n, np.int32)
    for i, p in enumerate(parents):
        level[i + 1] = level[p] + 1
    return Vocabulary(k=kmax, levels=levels, node_desc=node_desc, children=children,
                      is_leaf=is_leaf, word_id=word_id, word_weight=w, node_level=level)


def make_transform_fn(voc: Vocabulary):
    """Returns a jitted fn: (desc_bits (N,256) pm1, valid (N,)) ->
    (word_ids (N,) i32 [-1 invalid], node_path (N, L+1) i32).

    Tree descent: at each level gather the K children's descriptor bit rows,
    one Hamming argmin per descriptor (batched matmul), descend. Descriptors
    reaching a leaf stay there (children row padded with self)."""
    bits, children, word_id, _ = voc.device_tensors()
    n_levels = int(voc.levels) + 2

    # make padded children self-referential so leaves are absorbing
    ch = np.array(voc.children)
    self_col = np.arange(len(ch), dtype=np.int32)[:, None]
    ch = np.where(ch < 0, self_col, ch)
    ch_j = jnp.asarray(ch)
    wid_j = jnp.asarray(voc.word_id)

    @jax.jit
    def transform(desc_bits, valid):
        node = jnp.zeros(desc_bits.shape[0], jnp.int32)
        path = [node]
        for _ in range(n_levels):
            cand = ch_j[node]  # (N, K)
            cand_bits = bits[cand]  # (N, K, 256)
            # hamming via dot: (N, 1, 256) x (N, K, 256)
            dots = jnp.einsum("nb,nkb->nk", desc_bits.astype(jnp.float32), cand_bits.astype(jnp.float32))
            best = jnp.argmax(dots, axis=-1)  # max dot = min hamming
            node = jnp.take_along_axis(cand, best[:, None], axis=1)[:, 0]
            path.append(node)
        wid = jnp.where(valid, wid_j[node], -1)
        return wid, jnp.stack(path, axis=1)

    return transform


def bow_vector(word_ids: np.ndarray, weights: np.ndarray, n_words: int) -> Dict[int, float]:
    """Sparse L1-normalized BoW vector (DBoW2 transform output equivalent)."""
    v: Dict[int, float] = {}
    for w in word_ids:
        if w >= 0:
            v[int(w)] = v.get(int(w), 0.0) + float(weights[int(w)])
    s = sum(v.values())
    if s > 0:
        for kk in v:
            v[kk] /= s
    return v


def l1_score(v1: Dict[int, float], v2: Dict[int, float]) -> float:
    """DBoW2 L1 score (ScoringObject.cpp): 1 - 0.5*sum|a - b| over the union
    of words, with both vectors L1-normalized. In [0, 1]."""
    s = 0.0
    for w, a in v1.items():
        b = v2.get(w)
        if b is not None:
            s += abs(a - b) - a - b
    total = 2.0 + s  # = sum|a-b| over union
    return 1.0 - 0.5 * total
