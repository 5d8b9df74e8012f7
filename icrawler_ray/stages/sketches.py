"""Mergeable sketches (aggregation-at-scale pattern).

HyperLogLog distinct counting: each map_batches task emits ONE serialized
register array per batch (partial sketch); a tiny reduce merges them with
elementwise max — the canonical pre-aggregate-then-merge shape for wide
aggregations (Flajolet et al., HyperLogLog, AofA'07; the +0.7213/(1+1.079/m)
bias constant and small/large-range corrections are the standard published
ones)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from icrawler_ray.state.bloom import _mix


class HLL:
    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def add_hashes(self, hashes: np.ndarray) -> None:
        h = _mix(np.asarray(hashes, dtype=np.uint64), 3)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        nbits = 64 - self.p  # 52 at p=12: w fits float64 mantissa exactly
        w = (h << np.uint64(self.p)) >> np.uint64(self.p)
        wf = np.maximum(w.astype(np.float64), 1.0)
        rank = np.where(
            w == 0, nbits + 1, nbits - np.floor(np.log2(wf)).astype(np.int64)
        ).astype(np.uint8)
        np.maximum.at(self.registers, idx, rank)

    def merge(self, other: "HLL") -> "HLL":
        assert self.p == other.p
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        e = alpha * m * m / np.sum(2.0 ** -self.registers.astype(np.float64))
        zeros = int((self.registers == 0).sum())
        if e <= 2.5 * m and zeros:
            e = m * np.log(m / zeros)  # small-range correction
        return float(e)

    def serialize(self) -> bytes:
        return bytes([self.p]) + self.registers.tobytes()

    @classmethod
    def deserialize(cls, payload: bytes) -> "HLL":
        h = cls(payload[0])
        h.registers = np.frombuffer(payload[1:], dtype=np.uint8).copy()
        return h


def hll_distinct(ds, col: str, p: int = 12) -> float:
    """Approximate distinct count of a column: one partial sketch per
    batch, merged on the driver (sketches are tiny: 2^p bytes)."""
    import pandas as pd

    def partial(t: pa.Table) -> pa.Table:
        h = HLL(p)
        vals = pd.Series(t[col].to_pylist()).astype(str)
        h.add_hashes(pd.util.hash_array(vals.to_numpy(dtype=object), categorize=False))
        return pa.table({"sketch": pa.array([h.serialize()], type=pa.binary())})

    merged = HLL(p)
    for row in ds.map_batches(partial, batch_format="pyarrow").take_all():
        merged.merge(HLL.deserialize(row["sketch"]))
    return merged.estimate()


def hll_distinct_by(ds, group_col: str, col: str, p: int = 12) -> "pd.DataFrame":
    """Per-group approximate distinct counts: each batch emits one
    (group, sketch) row per group it contains; the driver merge holds
    one 2^p-byte sketch per DISTINCT GROUP — bounded by group
    cardinality, never by row count (the documented assumption: the
    group key is low-cardinality, e.g. event types, languages, sources).
    """
    import pandas as pd

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({group_col: t[group_col].to_pylist(),
                           "v": pd.Series(t[col].to_pylist()).astype(str)})
        groups, sketches = [], []
        for g, sub in df.groupby(group_col, sort=False):
            h = HLL(p)
            h.add_hashes(pd.util.hash_array(sub["v"].to_numpy(dtype=object),
                                            categorize=False))
            groups.append(g)
            sketches.append(h.serialize())
        return pa.table({group_col: pa.array(groups),
                         "sketch": pa.array(sketches, type=pa.binary())})

    merged: dict = {}
    for row in ds.map_batches(partial, batch_format="pyarrow").take_all():
        g = row[group_col]
        h = HLL.deserialize(row["sketch"])
        if g in merged:
            merged[g].merge(h)
        else:
            merged[g] = h
    return pd.DataFrame({group_col: list(merged),
                         "estimate": [h.estimate() for h in merged.values()]})
