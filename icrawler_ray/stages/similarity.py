"""Similarity search over an embedding column (list<float>).

- brute_force_topk: baseline ANN — per-batch numpy matmul of the batch's
  vectors against a BROADCAST query matrix (ray.put once, read per actor /
  worker, never re-shipped per batch), partial top-k per batch, tiny final
  merge. Scales linearly in corpus size with zero shuffle.
- lsh_bucketed_topk: the scale path — random-hyperplane LSH buckets
  (deterministic seeded planes); queries only score vectors in their
  probed buckets. Documented recall tradeoff vs brute force.
- embedding_near_dup_pairs: cosine >= threshold pairs within a partition
  key (label) — per-group matmul.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data


def _as_matrix(col) -> np.ndarray:
    arr = col.to_pylist()
    return np.asarray(arr, dtype=np.float64)


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def brute_force_topk(ds: ray.data.Dataset, queries: np.ndarray, k: int = 5,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     query_ids: np.ndarray | None = None,
                     exclude_self: bool = True) -> pd.DataFrame:
    """(query_id, vec_id, sim, rank) of cosine top-k per query vector."""
    qn = _normalize(np.asarray(queries, dtype=np.float64))
    q_ref = ray.put(qn)
    qids = np.asarray(query_ids) if query_ids is not None else np.arange(len(qn))

    def partial(batch: pa.Table) -> pa.Table:
        q = ray.get(q_ref)
        m = _normalize(_as_matrix(batch[vec_col]))
        sims = q @ m.T  # (nq, nb)
        ids = np.asarray(batch[id_col].to_pylist())
        out = {"query_id": [], "vec_id": [], "sim": []}
        kk = min(k + (1 if exclude_self else 0), sims.shape[1])
        for qi in range(sims.shape[0]):
            top = np.argpartition(-sims[qi], kk - 1)[:kk]
            out["query_id"].extend([int(qids[qi])] * len(top))
            out["vec_id"].extend(ids[top].tolist())
            out["sim"].extend(sims[qi][top].tolist())
        return pa.table(
            {
                "query_id": pa.array(out["query_id"], type=pa.int64()),
                "vec_id": pa.array(out["vec_id"], type=pa.int64()),
                "sim": pa.array(out["sim"], type=pa.float64()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=4096).to_pandas()
    if exclude_self:
        partials = partials[partials.query_id != partials.vec_id]
    partials["rank"] = (
        partials.sort_values(["query_id", "sim", "vec_id"], ascending=[True, False, True])
        .groupby("query_id").cumcount() + 1
    )
    out = partials[partials["rank"] <= k].sort_values(["query_id", "rank"]).reset_index(drop=True)
    out["sim"] = np.round(out["sim"], 6)
    return out[["query_id", "vec_id", "sim", "rank"]]


def lsh_bucketed_topk(ds: ray.data.Dataset, queries: np.ndarray, k: int = 5,
                      id_col: str = "vec_id", vec_col: str = "embedding",
                      n_planes: int = 8, seed: int = 0,
                      query_ids: np.ndarray | None = None) -> pd.DataFrame:
    """ANN via random-hyperplane buckets: score only vectors whose
    sign-pattern bucket matches the query's (single-probe). The bucket
    column is the shuffle key; planes are deterministic from ``seed``."""
    dim = np.asarray(queries).shape[1]
    planes = np.random.default_rng(seed).standard_normal((n_planes, dim))
    qn = _normalize(np.asarray(queries, dtype=np.float64))
    qbuckets = (qn @ planes.T > 0) @ (1 << np.arange(n_planes))
    qids = np.asarray(query_ids) if query_ids is not None else np.arange(len(qn))
    planes_ref = ray.put(planes)
    q_ref = ray.put((qn, qbuckets, qids))

    def partial(batch: pa.Table) -> pa.Table:
        pl = ray.get(planes_ref)
        q, qb, qi = ray.get(q_ref)
        m = _normalize(_as_matrix(batch[vec_col]))
        buckets = (m @ pl.T > 0) @ (1 << np.arange(pl.shape[0]))
        ids = np.asarray(batch[id_col].to_pylist())
        out = {"query_id": [], "vec_id": [], "sim": []}
        for j in range(len(q)):
            mask = buckets == qb[j]
            if not mask.any():
                continue
            sims = q[j] @ m[mask].T
            out["query_id"].extend([int(qi[j])] * int(mask.sum()))
            out["vec_id"].extend(ids[mask].tolist())
            out["sim"].extend(np.atleast_1d(sims).tolist())
        return pa.table(
            {
                "query_id": pa.array(out["query_id"], type=pa.int64()),
                "vec_id": pa.array(out["vec_id"], type=pa.int64()),
                "sim": pa.array(out["sim"], type=pa.float64()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=4096).to_pandas()
    if not len(partials):
        return pd.DataFrame({"query_id": [], "vec_id": [], "sim": [], "rank": []})
    partials = partials[partials.query_id != partials.vec_id]
    partials["rank"] = (
        partials.sort_values(["query_id", "sim", "vec_id"], ascending=[True, False, True])
        .groupby("query_id").cumcount() + 1
    )
    out = partials[partials["rank"] <= k].sort_values(["query_id", "rank"]).reset_index(drop=True)
    out["sim"] = np.round(out["sim"], 6)
    return out[["query_id", "vec_id", "sim", "rank"]]


def embedding_near_dup_pairs(ds: ray.data.Dataset, threshold: float = 0.98,
                             group_col: str = "label", id_col: str = "vec_id",
                             vec_col: str = "embedding") -> pd.DataFrame:
    """(a, b, sim) cosine >= threshold within ``group_col`` partitions —
    per-group dense matmul; the group key is the documented partitioning
    assumption (cross-group near-dups are not reported)."""

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"a": [], "b": [], "sim": []})
        g = g.sort_values(id_col)
        m = _normalize(np.asarray(g[vec_col].tolist(), dtype=np.float64))
        sims = m @ m.T
        ids = g[id_col].to_numpy()
        iu = np.triu_indices(len(g), k=1)
        mask = sims[iu] >= threshold
        return pd.DataFrame(
            {
                "a": ids[iu[0][mask]],
                "b": ids[iu[1][mask]],
                "sim": np.round(sims[iu][mask], 6),
            }
        )

    pairs = ds.groupby(group_col).map_groups(per_group, batch_format="pandas").to_pandas()
    return pairs.sort_values(["a", "b"]).reset_index(drop=True) if len(pairs) else pairs


def train_ivf_centroids(ds: ray.data.Dataset, n_centroids: int = 16,
                        vec_col: str = "embedding", sample_size: int = 4096,
                        n_iter: int = 5, seed: int = 0) -> np.ndarray:
    """Coarse quantizer for IVF: Lloyd k-means on a bounded deterministic
    sample (first ``sample_size`` rows — driver-resident only at
    dimension x sample scale), seeded init. At cluster scale the sample
    stays bounded while the corpus grows; training cost is O(sample)."""
    sample = _normalize(_as_matrix(
        pa.concat_tables([r for r in [ray.get(b) for b in
                          ds.limit(sample_size).to_arrow_refs()] if r.num_rows])[vec_col]))
    rng = np.random.default_rng(seed)
    cent = sample[rng.choice(len(sample), min(n_centroids, len(sample)), replace=False)]
    for _ in range(n_iter):
        assign = np.argmax(sample @ cent.T, axis=1)
        for c in range(len(cent)):
            m = assign == c
            if m.any():
                cent[c] = sample[m].mean(axis=0)
        cent = _normalize(cent)
    return cent


def ivf_topk(ds: ray.data.Dataset, queries: np.ndarray, k: int = 5,
             id_col: str = "vec_id", vec_col: str = "embedding",
             n_centroids: int = 16, n_probe: int = 4,
             query_ids: np.ndarray | None = None, seed: int = 0,
             centroids: np.ndarray | None = None) -> pd.DataFrame:
    """IVF ANN — the scale path next to lsh_bucketed_topk: a broadcast
    coarse quantizer assigns each corpus vector to its nearest centroid
    inside map_batches (one matmul); a query scores only vectors whose
    centroid is among its ``n_probe`` nearest lists. No shuffle: list
    filtering happens inline per batch, partial top-k merges small.
    Documented recall tradeoff: probing n_probe/n_centroids lists."""
    if centroids is None:
        centroids = train_ivf_centroids(ds, n_centroids, vec_col, seed=seed)
    qn = _normalize(np.asarray(queries, dtype=np.float64))
    qprobe = np.argsort(-(qn @ centroids.T), axis=1)[:, :n_probe]
    qids = np.asarray(query_ids) if query_ids is not None else np.arange(len(qn))
    ref = ray.put((centroids, qn, qprobe, qids))

    def partial(batch: pa.Table) -> pa.Table:
        cent, q, probe, qi = ray.get(ref)
        m = _normalize(_as_matrix(batch[vec_col]))
        lists = np.argmax(m @ cent.T, axis=1)
        ids = np.asarray(batch[id_col].to_pylist())
        out = {"query_id": [], "vec_id": [], "sim": []}
        for j in range(len(q)):
            mask = np.isin(lists, probe[j])
            if not mask.any():
                continue
            sims = q[j] @ m[mask].T
            out["query_id"].extend([int(qi[j])] * int(mask.sum()))
            out["vec_id"].extend(ids[mask].tolist())
            out["sim"].extend(np.atleast_1d(sims).tolist())
        return pa.table(
            {
                "query_id": pa.array(out["query_id"], type=pa.int64()),
                "vec_id": pa.array(out["vec_id"], type=pa.int64()),
                "sim": pa.array(out["sim"], type=pa.float64()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=4096).to_pandas()
    if not len(partials):
        return pd.DataFrame({"query_id": [], "vec_id": [], "sim": [], "rank": []})
    partials = partials[partials.query_id != partials.vec_id]
    partials["rank"] = (
        partials.sort_values(["query_id", "sim", "vec_id"], ascending=[True, False, True])
        .groupby("query_id").cumcount() + 1
    )
    out = partials[partials["rank"] <= k].sort_values(["query_id", "rank"]).reset_index(drop=True)
    out["sim"] = np.round(out["sim"], 6)
    return out[["query_id", "vec_id", "sim", "rank"]]
