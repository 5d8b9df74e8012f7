"""Link-graph analytics over the corpus: degree tables and PageRank.

A production crawl scheduler prioritizes its frontier by link-graph
signals (in-degree, PageRank of the linking host) — the reference has no
such notion (its queues are FIFO per stage, thread_pool.py), so this is
an engine addition in the spirit of SURVEY §2.10: the same
feeder->parser emission stream, aggregated into a graph and scored.

Edge substrate
--------------
The href graph the crawl actually produces lives in the parse emissions
(stages/fetch_parse.py emits (parent, link) rows).  For the driver's
oracle-checked queries we derive a deterministic graph from the
``documents`` table instead — doc ``i`` links to ``(i*131 + j*97) % n``
for ``j in 1..1+(i % 4)``, self-loops dropped — because the oracle SQL
must reproduce the edge set exactly (DuckDB cannot re-run our crawl).
``degree_table``/``pagerank`` themselves take ANY (src, dst) edge
Dataset; the derivation is just the test harness.

Scale notes (100-TB design point)
---------------------------------
- Degree counting is the combiner pattern: per-batch partial counts,
  then a tiny final reduce — the exchange moves one row per (block,
  node-seen-in-block), never the edge list.
- PageRank is broadcast-iterate: the rank vector is ``ray.put`` once per
  iteration and read zero-copy by every map_batches task; each iteration
  moves only per-block PARTIAL dst-sums.  This assumes the rank vector
  (8 B/node) fits in worker memory — true for host-level graphs (~1e8
  hosts = 800 MB, the intended use: host-rank frontier priority).  A
  doc-level graph at 1e10 nodes needs the shuffle variant instead
  (edges.groupby(dst) join rank-partitions); documented, not built.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data as rd

__all__ = ["derive_edges", "degree_table", "pagerank", "connected_components"]


def derive_edges(docs: rd.Dataset, n_docs: int) -> rd.Dataset:
    """Deterministic (src, dst) edges from a doc_id column (see module
    docstring).  Vectorized: each batch expands via np.repeat, no
    per-row loop."""

    def expand(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(dtype=np.int64)
        fanout = 1 + (ids % 4)
        src = np.repeat(ids, fanout)
        # j index within each src's fanout run: 1..fanout
        j = np.arange(len(src), dtype=np.int64) - np.repeat(
            np.cumsum(fanout) - fanout, fanout) + 1
        dst = (src * 131 + j * 97) % n_docs
        keep = dst != src
        return pd.DataFrame({"src": src[keep], "dst": dst[keep]})

    return docs.map_batches(expand, batch_format="pandas")


def degree_table(edges: rd.Dataset, docs: rd.Dataset) -> pd.DataFrame:
    """Per-node out/in-degree.  Combiner pattern: each edge batch emits
    one partial row per node it touches; the final reduce runs over
    output-sized partials only."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("src", sort=False).size()
        inn = df.groupby("dst", sort=False).size()
        return pd.DataFrame({
            "node": np.concatenate([out.index.to_numpy(), inn.index.to_numpy()]),
            "out_deg": np.concatenate([out.to_numpy(), np.zeros(len(inn), dtype=np.int64)]),
            "in_deg": np.concatenate([np.zeros(len(out), dtype=np.int64), inn.to_numpy()]),
        })

    partials = edges.map_batches(partial, batch_format="pandas").to_pandas()
    deg = partials.groupby("node", as_index=False).agg(
        out_deg=("out_deg", "sum"), in_deg=("in_deg", "sum"))
    # left-join onto the full node set so isolated nodes appear with 0s
    nodes = docs.select_columns(["doc_id"]).to_pandas().rename(columns={"doc_id": "node"})
    out = nodes.merge(deg, on="node", how="left").fillna(0)
    out["out_deg"] = out["out_deg"].astype(np.int64)
    out["in_deg"] = out["in_deg"].astype(np.int64)
    return out.sort_values("node").reset_index(drop=True)


def pagerank(edges: rd.Dataset, n_nodes: int, *, iters: int = 5,
             damping: float = 0.85) -> np.ndarray:
    """Broadcast-iterate PageRank: rank[v] = (1-d)/n + d * sum over
    in-edges of rank[u]/outdeg(u).  Uniform init 1/n; ``iters`` fixed
    sweeps (no convergence test, so the SQL oracle can unroll the exact
    same computation).

    The edge Dataset is materialized ONCE (it is re-scanned every
    iteration; at scale it lives in the object store and spills), the
    rank/outdeg contribution vector is broadcast via ``ray.put`` per
    iteration, and each iteration's exchange is per-block partial
    dst-sums — output-sized, not edge-sized."""
    edges = edges.materialize()

    # out-degree vector (dense, n_nodes) via the same combiner partials
    od_partials = edges.map_batches(
        lambda df: df.groupby("src", sort=False).size().rename("n").reset_index(),
        batch_format="pandas").to_pandas()
    od_small = od_partials.groupby("src")["n"].sum()
    outdeg = np.zeros(n_nodes, dtype=np.float64)
    outdeg[od_small.index.to_numpy()] = od_small.to_numpy(dtype=np.float64)
    safe_deg = np.where(outdeg > 0, outdeg, 1.0)  # derivation guarantees >0

    ranks = np.full(n_nodes, 1.0 / n_nodes)
    for _ in range(iters):
        contrib_ref = ray.put(ranks / safe_deg)

        def part(df: pd.DataFrame, _ref=contrib_ref) -> pd.DataFrame:
            contrib = ray.get(_ref)  # zero-copy shared numpy
            s = pd.Series(contrib[df["src"].to_numpy()]).groupby(
                df["dst"].to_numpy()).sum()
            return pd.DataFrame({"dst": s.index.to_numpy(), "s": s.to_numpy()})

        partials = edges.map_batches(part, batch_format="pandas").to_pandas()
        agg = partials.groupby("dst")["s"].sum()
        ranks = np.full(n_nodes, (1.0 - damping) / n_nodes)
        ranks[agg.index.to_numpy()] += damping * agg.to_numpy()
    return ranks


def connected_components(edges: rd.Dataset, n_nodes: int, *,
                         iters: int = 8) -> np.ndarray:
    """Min-label propagation connected components — the cluster-assignment
    step a near-dup pipeline runs over its candidate PAIRS (each doc gets
    the min doc_id of its duplicate cluster; the cluster min is the doc
    you keep).

    Fixed ``iters`` undirected sweeps: label'[v] = min(label[v], min over
    neighbors u of label[u]).  A fixed sweep count (no convergence test)
    keeps the computation identical to the unrolled SQL oracle
    (queries.py::SQL_CC_LABELS) even on graphs where it has not converged;
    pick iters >= graph diameter for true components.  Same
    broadcast-iterate exchange as :func:`pagerank` — per-block partial
    neighbor-mins, output-sized."""
    edges = edges.materialize()
    labels = np.arange(n_nodes, dtype=np.int64)
    for _ in range(iters):
        ref = ray.put(labels)

        def part(df: pd.DataFrame, _ref=ref) -> pd.DataFrame:
            lab = ray.get(_ref)
            src = df["src"].to_numpy()
            dst = df["dst"].to_numpy()
            node = np.concatenate([dst, src])          # undirected
            cand = np.concatenate([lab[src], lab[dst]])
            s = pd.Series(cand).groupby(node).min()
            return pd.DataFrame({"node": s.index.to_numpy(), "m": s.to_numpy()})

        partials = edges.map_batches(part, batch_format="pandas").to_pandas()
        agg = partials.groupby("node")["m"].min()
        new = labels.copy()
        np.minimum.at(new, agg.index.to_numpy(), agg.to_numpy())
        if np.array_equal(new, labels):
            break  # converged — further sweeps are identity in SQL too
        labels = new
    return labels
