"""Vectorized Bloom filter over uint64 keys.

North-rule pre-filter in front of each cuckoo shard: cuts shard lookup
traffic for the common "definitely new" case. All operations are numpy
bulk ops over arrays of pre-hashed uint64 keys (the engine hashes URLs
once, upstream, with pandas' SipHash — functions/urlnorm.hash_urls).

k hash functions are derived from the single input hash by splitmix64-style
mixing (public-domain construction from Steele et al., "Fast Splittable
Pseudorandom Number Generators") — no re-hashing of the string.

Design point (SURVEY.md §7.4): 10^10 URLs across S shards; at 10 bits/key a
shard of 10^10/S keys costs 10^10*10/8/S bytes total across the cluster —
bits per key and k are constructor knobs.
"""

from __future__ import annotations

import numpy as np

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def _mix(x: np.ndarray, round_: int) -> np.ndarray:
    """splitmix64 finalizer with a per-round increment; vectorized uint64."""
    with np.errstate(over="ignore"):
        z = x + np.uint64(round_ + 1) * _GOLDEN
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


class BloomFilter:
    def __init__(self, capacity: int, bits_per_key: int = 10, k: int = 4):
        self.capacity = int(capacity)
        self.k = int(k)
        self.nbits = max(64, int(capacity) * int(bits_per_key))
        self.bits = np.zeros((self.nbits + 63) // 64, dtype=np.uint64)
        self.num_items = 0

    def _positions(self, keys: np.ndarray) -> np.ndarray:
        keys = np.asarray(keys, dtype=np.uint64)
        pos = np.empty((self.k, len(keys)), dtype=np.uint64)
        for r in range(self.k):
            pos[r] = _mix(keys, r) % np.uint64(self.nbits)
        return pos

    def add(self, keys: np.ndarray) -> None:
        pos = self._positions(keys)
        word = (pos >> np.uint64(6)).ravel()
        bit = np.uint64(1) << (pos & np.uint64(63)).ravel()
        np.bitwise_or.at(self.bits, word, bit)
        self.num_items += len(np.atleast_1d(keys))

    def contains(self, keys: np.ndarray) -> np.ndarray:
        pos = self._positions(keys)
        word = pos >> np.uint64(6)
        bit = np.uint64(1) << (pos & np.uint64(63))
        hit = (self.bits[word] & bit) != 0
        return hit.all(axis=0)

    # ---- checkpoint serialization
    def serialize(self) -> bytes:
        header = np.array([self.capacity, self.k, self.nbits, self.num_items], dtype=np.int64)
        return header.tobytes() + self.bits.tobytes()

    @classmethod
    def deserialize(cls, payload: bytes) -> "BloomFilter":
        header = np.frombuffer(payload[:32], dtype=np.int64)
        f = cls.__new__(cls)
        f.capacity, f.k, f.nbits, f.num_items = (int(x) for x in header)
        f.bits = np.frombuffer(payload[32:], dtype=np.uint64).copy()
        return f
