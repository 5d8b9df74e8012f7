"""Cuckoo filter over uint64 keys (north-rule seen-set shard core).

Standard construction (Fan et al., "Cuckoo Filter: Practically Better Than
Bloom", CoNEXT'14): 4-slot buckets, 16-bit fingerprints, partial-key
cuckoo hashing — bucket2 = bucket1 XOR hash(fingerprint). Supports DELETE
(bloom cannot), bounded false-positive rate ~ 2*slots/2^fp_bits ≈ 0.012%
at 16-bit fingerprints.

Batch ``contains`` is fully vectorized (numpy gather over both candidate
buckets) — the hot path: most frontier candidates are membership checks.
``add`` inserts per item (duplicate buckets within a batch make bulk
placement racy); inserts are only the *novel* keys, a small fraction of
each round's candidates.

At the 10^10 design point: 16 bits/key * 1.05 slack ≈ 21 GiB of
fingerprint table across all shards — sized per shard via ``capacity``.
"""

from __future__ import annotations

import numpy as np

from icrawler_ray.state.bloom import _mix

SLOTS = 4
MAX_KICKS = 500


class CuckooFilter:
    def __init__(self, capacity: int, seed: int = 0):
        n_buckets = 1
        while n_buckets * SLOTS < capacity * 1.05:
            n_buckets *= 2
        self.n_buckets = n_buckets
        self.table = np.zeros((n_buckets, SLOTS), dtype=np.uint16)  # 0 = empty
        self.num_items = 0
        self.seed = seed
        self._rng = np.random.default_rng(seed)

    # --- key -> (fingerprint, bucket1, bucket2), all vectorized
    def _fp_and_buckets(self, keys: np.ndarray):
        keys = np.asarray(keys, dtype=np.uint64)
        fp = (_mix(keys, 7) & np.uint64(0xFFFF)).astype(np.uint16)
        fp = np.where(fp == 0, np.uint16(1), fp)  # reserve 0 for empty
        b1 = (_mix(keys, 11) % np.uint64(self.n_buckets)).astype(np.uint64)
        fph = _mix(fp.astype(np.uint64), 13) % np.uint64(self.n_buckets)
        b2 = b1 ^ fph
        return fp, b1, b2

    def _alt_bucket(self, fp: np.ndarray, b: np.ndarray) -> np.ndarray:
        fph = _mix(fp.astype(np.uint64), 13) % np.uint64(self.n_buckets)
        return b ^ fph

    def contains(self, keys: np.ndarray) -> np.ndarray:
        fp, b1, b2 = self._fp_and_buckets(keys)
        t1 = self.table[b1]          # (n, SLOTS) gather
        t2 = self.table[b2]
        fpc = fp[:, None]
        return ((t1 == fpc) | (t2 == fpc)).any(axis=1)

    def add(self, keys: np.ndarray) -> None:
        """Insert keys (caller has already dropped known-present ones).

        Fast path (vectorized): place each key into an empty slot of its
        FIRST bucket — batch-internal same-bucket collisions resolved with
        a per-bucket running rank. Keys whose first bucket is full fall to
        the per-item cuckoo-eviction path (<few % at normal load)."""
        fp, b1, b2 = self._fp_and_buckets(keys)
        n = len(fp)
        if n == 0:
            return
        order = np.argsort(b1, kind="stable")
        b1s, fps = b1[order], fp[order]
        change = np.ones(n, dtype=bool)
        change[1:] = b1s[1:] != b1s[:-1]
        grp_start = np.nonzero(change)[0]
        grp_sizes = np.diff(np.append(grp_start, n))
        rank = np.arange(n) - np.repeat(grp_start, grp_sizes)
        rows = self.table[b1s]                       # (n, SLOTS) gather
        n_empty = (rows == 0).sum(axis=1)
        # empty slot positions, empties first (stable: preserves slot order)
        empty_rank = np.argsort(rows != 0, kind="stable", axis=1)
        ok = rank < n_empty
        slot = empty_rank[np.arange(n), np.minimum(rank, SLOTS - 1)]
        self.table[b1s[ok], slot[ok]] = fps[ok]
        # slow path: first bucket full
        rest = np.nonzero(~ok)[0]
        b2s = b2[order]
        for i in rest:
            self._insert_one(int(fps[i]), int(b1s[i]), int(b2s[i]))
        self.num_items += n

    def _insert_one(self, fp: int, b1: int, b2: int) -> None:
        for b in (b1, b2):
            row = self.table[b]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                row[empty[0]] = fp
                return
        # both full: evict
        b = b1 if self._rng.integers(0, 2) else b2
        for _ in range(MAX_KICKS):
            slot = int(self._rng.integers(0, SLOTS))
            fp, self.table[b, slot] = int(self.table[b, slot]), fp
            b = int(self._alt_bucket(np.array([fp], dtype=np.uint16),
                                     np.array([b], dtype=np.uint64))[0])
            row = self.table[b]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                row[empty[0]] = fp
                return
        raise RuntimeError("cuckoo filter full: increase shard capacity")

    def delete(self, keys: np.ndarray) -> np.ndarray:
        """Remove one matching fingerprint per key; returns removed mask."""
        fp, b1, b2 = self._fp_and_buckets(keys)
        removed = np.zeros(len(fp), dtype=bool)
        for i in range(len(fp)):
            for b in (int(b1[i]), int(b2[i])):
                row = self.table[b]
                hit = np.nonzero(row == fp[i])[0]
                if len(hit):
                    row[hit[0]] = 0
                    removed[i] = True
                    self.num_items -= 1
                    break
        return removed

    # ---- checkpoint serialization
    def serialize(self) -> bytes:
        header = np.array([self.n_buckets, self.num_items, self.seed], dtype=np.int64)
        return header.tobytes() + self.table.tobytes()

    @classmethod
    def deserialize(cls, payload: bytes) -> "CuckooFilter":
        header = np.frombuffer(payload[:24], dtype=np.int64)
        f = cls.__new__(cls)
        f.n_buckets, f.num_items, f.seed = (int(x) for x in header)
        f.table = np.frombuffer(payload[24:], dtype=np.uint16).reshape(f.n_buckets, SLOTS).copy()
        f._rng = np.random.default_rng(f.seed)
        return f
