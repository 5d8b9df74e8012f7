"""Big-big equi-join with hot-key salting.

Every other join in this engine broadcasts its small side (customer,
nation, the dedup winner table) — the right call whenever one side fits
in worker memory.  This module covers the remaining case: BOTH sides are
block-scale, so the join must be a hash-partitioned exchange — and on
web-scale data the partition key is never uniform (a viral URL, a
mega-host, a bot user).  A plain ``groupby(key)`` lands every row of a
hot key in ONE task: the curse-of-the-last-reducer straggler.

The fix is the standard salting pattern the Ray guide and every shuffle
engine document: detect hot keys from per-batch combiner counts (an
output-sized partial, never a full key histogram shuffle), then split
each hot key across ``salt`` sub-groups — probe-side rows scatter by a
deterministic per-row salt, build-side rows REPLICATE into all ``salt``
sub-groups — so the fat group becomes ``salt`` bounded groups and the
join result is unchanged.  Cold keys pay nothing (salt 0, no
replication).

No reference counterpart (the reference crawler has no relational
layer); the pattern is public MapReduce/Spark skew-join lore.

Scale notes (100-TB design point)
---------------------------------
- Hot-key detection moves one row per (block, distinct-key-in-block)
  capped at ``detect_top`` per block — bounded by blocks x detect_top,
  not by data size.
- The only all-to-all exchange is the single ``groupby(skey)``; salting
  bounds its largest group by ~max(hot_count / salt, hot_threshold).
- Build-side replication costs ``salt`` x (build rows in hot keys) —
  hot keys should be detected on the PROBE side (the skewed one);
  pass the skewed dataset as ``probe``.
- Per-group work emits aggregation PARTIALS via ``agg_fn`` (one row per
  group per agg key), so the post-join reduce is output-sized; use
  ``agg_fn=None`` to emit raw joined rows when the caller needs them.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np
import pandas as pd
import ray
import ray.data as rd

__all__ = ["salted_hash_join"]


def _hot_keys(probe: rd.Dataset, key: str, hot_threshold: int,
              detect_top: int) -> np.ndarray:
    """Keys whose probe-side row count exceeds ``hot_threshold``.

    Per-batch combiner: each block emits its ``detect_top`` most frequent
    keys with local counts; the driver sums.  A key that is globally hot
    is hot in many blocks, so the cap loses only keys within a factor
    ~n_blocks of the threshold — acceptable for a straggler guard (a
    missed borderline key lands one group of ~hot_threshold rows)."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        c = df[key].value_counts().head(detect_top)
        return pd.DataFrame({"k": c.index.to_numpy(), "n": c.to_numpy()})

    parts = probe.map_batches(partial, batch_format="pandas").to_pandas()
    if not len(parts):
        return np.array([], dtype=np.int64)
    tot = parts.groupby("k")["n"].sum()
    return np.sort(tot.index.to_numpy(dtype=np.int64)[
        tot.to_numpy() > hot_threshold])


def salted_hash_join(
    probe: rd.Dataset,
    build: rd.Dataset,
    key: str,
    *,
    salt: int = 16,
    hot_threshold: int = 500_000,
    detect_top: int = 64,
    num_partitions: int = 64,
    probe_salt_col: Optional[str] = None,
    agg_fn: Optional[Callable[[pd.DataFrame], pd.DataFrame]] = None,
    hot_keys: Optional[np.ndarray] = None,
) -> rd.Dataset:
    """Inner equi-join ``probe ⋈ build`` on integer column ``key``.

    ``probe`` is the (possibly skewed) side whose hot keys get split;
    ``build`` rows for hot keys are replicated into every salt bucket.
    Per-row probe salt comes from ``probe_salt_col % salt`` when given
    (deterministic, resume-stable) else from a multiplicative hash of
    the row's position within its batch — deterministic per block
    layout.

    ``agg_fn(joined_group_df) -> partial_df`` turns each salted group's
    joined rows into combiner partials (recommended: keeps the stage
    output-sized).  With ``agg_fn=None`` the raw joined rows (probe
    columns + build columns) are emitted.

    ``hot_keys``: pass a precomputed sorted int64 array to skip the
    detection pass — in particular ``hot_keys=np.array([], np.int64)``
    when the key is STRUCTURALLY bounded (e.g. orderkey: the schema caps
    lines per order), which saves one full scan of the probe side."""
    hot = (np.asarray(hot_keys, dtype=np.int64) if hot_keys is not None
           else _hot_keys(probe, key, hot_threshold, detect_top))
    hot_ref = ray.put(hot)
    s64 = np.int64(salt)

    def tag_probe(df: pd.DataFrame) -> pd.DataFrame:
        k = df[key].to_numpy(dtype=np.int64)
        is_hot = np.zeros(len(k), dtype=bool)
        h = ray.get(hot_ref)
        if len(h):
            pos = np.searchsorted(h, k)
            pos[pos >= len(h)] = len(h) - 1
            is_hot = h[pos] == k
        if probe_salt_col is not None:
            sv = df[probe_salt_col].to_numpy(dtype=np.int64) % s64
        else:
            sv = (np.arange(len(k), dtype=np.int64) * 2654435761) % s64
        out = df.copy()
        out["skey"] = k * s64 + np.where(is_hot, sv, 0)
        out["side"] = 0
        return out

    def tag_build(df: pd.DataFrame) -> pd.DataFrame:
        k = df[key].to_numpy(dtype=np.int64)
        h = ray.get(hot_ref)
        is_hot = np.zeros(len(k), dtype=bool)
        if len(h):
            pos = np.searchsorted(h, k)
            pos[pos >= len(h)] = len(h) - 1
            is_hot = h[pos] == k
        rep = np.where(is_hot, salt, 1)
        idx = np.repeat(np.arange(len(k)), rep)
        out = df.iloc[idx].copy()
        # salt index within each row's replication run
        j = np.arange(len(idx), dtype=np.int64) - np.repeat(
            np.cumsum(rep) - rep, rep)
        out["skey"] = k[idx] * s64 + j
        out["side"] = 1
        return out

    tagged = (probe.map_batches(tag_probe, batch_format="pandas")
              .union(build.map_batches(tag_build, batch_format="pandas")))

    probe_schema, build_schema = probe.schema(), build.schema()
    probe_cols = list(probe_schema.names)
    build_cols = [c for c in build_schema.names if c != key]
    # the union null-pads each side's missing columns (int -> float64 in
    # pandas); restore the original dtypes after the side filter
    dtypes = {}
    for sch, cols in ((probe_schema, probe_cols), (build_schema, build_cols)):
        for name, typ in zip(sch.names, sch.types):
            if name in cols:
                try:
                    dtypes[name] = typ.to_pandas_dtype()
                except (NotImplementedError, AttributeError):
                    pass

    # One group per PARTITION (skey % num_partitions), not per key:
    # per-tiny-group map_groups overhead is the known Ray pitfall (see
    # stages/dedup.py bucket exchange).  Joining a whole partition on
    # skey in one vectorized merge is equivalent to per-skey joins —
    # skey encodes (key, salt bucket) — and a hot key's salt buckets
    # hash to DIFFERENT partitions, so the straggler bound holds.
    def join_partition(g: pd.DataFrame) -> pd.DataFrame:
        l = g.loc[g["side"] == 0, ["skey"] + probe_cols].astype(
            {c: t for c, t in dtypes.items() if c in probe_cols})
        r = g.loc[g["side"] == 1, ["skey"] + build_cols].astype(
            {c: t for c, t in dtypes.items() if c in build_cols})
        # merge handles one-sided (empty) partitions: empty result,
        # correct columns; agg_fn must map an empty join to an empty
        # partial (any groupby-agg does)
        joined = l.merge(r, on="skey").drop(columns="skey")
        return joined if agg_fn is None else agg_fn(joined)

    parted = tagged.map_batches(
        lambda df: df.assign(part=df["skey"].to_numpy() % np.int64(num_partitions)),
        batch_format="pandas")
    return parted.groupby("part").map_groups(join_partition,
                                             batch_format="pandas")
