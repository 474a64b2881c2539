"""Device-resident map-point pool.

The reference keeps all map points in host memory and touches them through
pointer graphs every frame (Tracking::SearchLocalPoints walks each candidate
MapPoint, Tracking.cc:793-836). On a TPU — especially through a remote-device
tunnel where every dispatch and transfer is an RPC — re-uploading the local
map per frame is what made the shipped System ~60x slower than its own fused
device step (BASELINE.md round-2 measurement). This pool keeps the map-point
SoA tensors (position, viewing normal, scale-invariance distances, descriptor,
liveness) resident in HBM and uploads only deltas:

- `Map.mp_dirty` accumulates ids mutated by any host-side map operation
  (creation, culling, replace, distinctive-descriptor / normal updates,
  LBA/GBA position rewrites);
- `sync()` drains that set into one bucketed `.at[idx].set` device call;
- `gather(slots)` compacts the per-frame local-map candidate rows into a
  fixed-size block consumed by the fused tracking step (models/fused_track).

Slot layout: rows [0, cap) are map points, row `cap` is a scratch row that is
never valid — index padding routes there, so no masking is needed at call
sites. Capacity doubles on exhaustion (full re-upload, amortized).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp


@partial(jax.jit, donate_argnums=(0, 1, 2, 3, 4, 5))
def _pool_scatter(jpos, jnormal, jmind, jmaxd, jdesc, jvalid,
                  idx, pos, normal, mind, maxd, desc, valid):
    return (
        jpos.at[idx].set(pos),
        jnormal.at[idx].set(normal),
        jmind.at[idx].set(mind),
        jmaxd.at[idx].set(maxd),
        jdesc.at[idx].set(desc),
        jvalid.at[idx].set(valid),
    )


@jax.jit
def _pool_gather(jpos, jnormal, jmind, jmaxd, jdesc, jvalid, slots):
    return (
        jpos[slots], jnormal[slots], jmind[slots], jmaxd[slots],
        jdesc[slots], jvalid[slots],
    )


class DeviceMapPool:
    def __init__(self, map_, cap: int = 4096):
        self.map = map_
        self.cap = cap
        self.epoch = -1  # != any map_epoch: first sync() does a full mirror
        self._alloc_host(cap)
        # id -> slot lookup, grown with next_mp_id (ids are monotonic)
        self.slot_of = np.full(max(1024, map_.next_mp_id + 1), -1, np.int32)
        self.free = list(range(cap - 1, -1, -1))
        self.dev = None  # device array tuple, rows = cap + 1 (scratch last)
        self.n_syncs = 0
        self.n_grows = 0
        # scratch buffer for per-frame slot->row maps (fused tracking)
        self._row_of_slot = np.full(cap + 1, -1, np.int32)

    # ------------------------------------------------------------------ host

    def _alloc_host(self, cap: int):
        self.pos = np.zeros((cap, 3), np.float32)
        self.normal = np.zeros((cap, 3), np.float32)
        self.mind = np.zeros(cap, np.float32)
        self.maxd = np.zeros(cap, np.float32)
        self.desc = np.zeros((cap, 32), np.uint8)
        self.valid = np.zeros(cap, bool)
        self.id_of = np.full(cap, -1, np.int64)

    def _grow(self):
        old = self.cap
        new = old * 2
        for name in ("pos", "normal", "desc"):
            a = getattr(self, name)
            b = np.zeros((new,) + a.shape[1:], a.dtype)
            b[:old] = a
            setattr(self, name, b)
        for name, fill in (("mind", 0), ("maxd", 0), ("valid", False), ("id_of", -1)):
            a = getattr(self, name)
            b = np.full((new,), fill, a.dtype)
            b[:old] = a
            setattr(self, name, b)
        self.free.extend(range(new - 1, old - 1, -1))
        self.cap = new
        self.dev = None  # force full re-upload at the new capacity
        self._row_of_slot = np.full(new + 1, -1, np.int32)
        self.n_grows += 1

    def _ensure_slot(self, mid: int) -> int:
        if mid >= len(self.slot_of):
            b = np.full(max(len(self.slot_of) * 2, mid + 1), -1, np.int32)
            b[: len(self.slot_of)] = self.slot_of
            self.slot_of = b
        s = self.slot_of[mid]
        if s >= 0:
            return int(s)
        if not self.free:
            self._grow()
        s = self.free.pop()
        self.slot_of[mid] = s
        self.id_of[s] = mid
        return s

    def _release_slot(self, mid: int):
        if mid >= len(self.slot_of):
            return -1
        s = int(self.slot_of[mid])
        if s >= 0:
            self.slot_of[mid] = -1
            self.id_of[s] = -1
            self.valid[s] = False
            self.free.append(s)
        return s

    # ------------------------------------------------------------------ sync

    def _full_reset(self):
        m = self.map
        self.epoch = m.map_epoch
        self._alloc_host(self.cap)
        self.slot_of = np.full(max(1024, m.next_mp_id + 1), -1, np.int32)
        self.free = list(range(self.cap - 1, -1, -1))
        self.dev = None
        for mid, mp in m.map_points.items():
            if not mp.bad:
                m.mp_dirty.add(mid)

    def sync(self):
        """Drain Map.mp_dirty into the device mirrors. Call under
        map.update_lock. One device dispatch when there are deltas (or a full
        upload after growth/reset); zero dispatches otherwise."""
        m = self.map
        if m.map_epoch != self.epoch:
            self._full_reset()
        dirty = m.mp_dirty
        if dirty:
            m.mp_dirty = set()
        changed = []
        live_ids, live_slots = [], []
        for mid in dirty:
            mp = m.map_points.get(mid)
            if mp is None or mp.bad:
                s = self._release_slot(mid)
                if s >= 0:
                    changed.append(s)
                continue
            live_ids.append(mid)
            live_slots.append(self._ensure_slot(mid))
        if live_ids:
            # one table gather per field instead of 5 property reads/point
            ga = np.asarray(live_ids, np.int64)
            sl = np.asarray(live_slots, np.int64)
            self.pos[sl] = m.mp_pos[ga]
            self.normal[sl] = m.mp_normal[ga]
            self.mind[sl] = m.mp_mind[ga]
            self.maxd[sl] = m.mp_maxd[ga]
            self.desc[sl] = m.mp_desc[ga]
            self.valid[sl] = True
            changed.extend(live_slots)

        if self.dev is None:
            # full upload with the scratch row appended
            self.dev = (
                jnp.asarray(np.vstack([self.pos, np.zeros((1, 3), np.float32)])),
                jnp.asarray(np.vstack([self.normal, np.zeros((1, 3), np.float32)])),
                jnp.asarray(np.append(self.mind, 0.0).astype(np.float32)),
                jnp.asarray(np.append(self.maxd, 0.0).astype(np.float32)),
                jnp.asarray(np.vstack([self.desc, np.zeros((1, 32), np.uint8)])),
                jnp.asarray(np.append(self.valid, False)),
            )
            self.n_syncs += 1
            return
        if not changed:
            return
        from ceres_mono_orb_slam2_tpu.utils.padding import bucket

        idx = np.asarray(changed, np.int32)
        D = bucket(len(idx), 64)
        pad = np.full(D - len(idx), self.cap, np.int32)  # scratch row
        idx = np.concatenate([idx, pad])
        rows = idx.clip(0, self.cap - 1)
        pos = self.pos[rows]
        normal = self.normal[rows]
        mind = self.mind[rows]
        maxd = self.maxd[rows]
        desc = self.desc[rows]
        valid = self.valid[rows]
        valid[len(changed):] = False
        self.dev = _pool_scatter(
            *self.dev, jnp.asarray(idx), jnp.asarray(pos), jnp.asarray(normal),
            jnp.asarray(mind), jnp.asarray(maxd), jnp.asarray(desc), jnp.asarray(valid))
        self.n_syncs += 1

    # ---------------------------------------------------------------- access

    def gather(self, slots_padded: np.ndarray):
        """Gather pool rows for the given slot indices (pad with self.cap for
        never-valid scratch rows). Returns device arrays
        (pos, normal, mind, maxd, desc, valid), each leading dim = len(slots)."""
        return _pool_gather(*self.dev, jnp.asarray(slots_padded.astype(np.int32)))

    def slots_for_ids(self, ids: np.ndarray) -> np.ndarray:
        """Vectorized id -> slot lookup (-1 for unknown/dead)."""
        ids = np.asarray(ids, np.int64)
        out = np.full(len(ids), -1, np.int32)
        ok = (ids >= 0) & (ids < len(self.slot_of))
        out[ok] = self.slot_of[ids[ok]]
        return out

    def row_map(self, slots: np.ndarray) -> np.ndarray:
        """Scratch slot->row map for the current frame's local block: returns
        an array r with r[slot] = row for the given slots, -1 elsewhere.
        Reuses one buffer — valid until the next call."""
        r = self._row_of_slot
        r[:] = -1
        r[slots] = np.arange(len(slots), dtype=np.int32)
        return r
