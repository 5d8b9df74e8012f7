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
import pyarrow as pa
import ray
import ray.data as rd

__all__ = ["derive_edges", "degree_table", "pagerank", "pagerank_partitioned",
           "connected_components", "pairs_components", "triangle_counts", "bfs_depths",
           "seed_depths", "harmonic_centrality", "random_walks",
           "personalized_pagerank", "resolve_redirects",
           "hits", "hits_partitioned", "kcore_membership",
           "kcore_membership_partitioned"]

#: Broadcast-iterate CC/PageRank hold a dense ``n_nodes`` vector on the
#: driver and ship it per sweep — fine for the HOST-level graphs they
#: exist for (~1e8 hosts = 800 MB), catastrophic for doc-level graphs
#: (1e10 docs = 80 GB).  ``connected_components`` refuses beyond this
#: bound; doc-scale near-dup clustering must use :func:`pairs_components`.
MAX_BROADCAST_NODES = 200_000_000


def derive_edges(docs: rd.Dataset, n_docs: int) -> rd.Dataset:
    """Deterministic (src, dst) edges from a doc_id column (see module
    docstring).  Vectorized: each batch expands via np.repeat, no
    per-row loop."""

    def expand(t: "pa.Table") -> "pa.Table":
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        fanout = 1 + (ids % 4)
        src = np.repeat(ids, fanout)
        # j index within each src's fanout run: 1..fanout
        j = np.arange(len(src), dtype=np.int64) - np.repeat(
            np.cumsum(fanout) - fanout, fanout) + 1
        dst = (src * 131 + j * 97) % n_docs
        keep = dst != src
        return pa.table({"src": pa.array(src[keep]), "dst": pa.array(dst[keep])})

    return docs.map_batches(expand, batch_format="pyarrow")


def _canonical_undirected(edges: rd.Dataset, n: np.int64,
                          P: np.int64) -> rd.Dataset:
    """Canonicalize + globally dedup an undirected edge set: drop self
    loops, order endpoints, pack (a, b) -> a*n + b, local np.unique per
    batch, then one bucketed groupby (same key -> same bucket) with a
    per-bucket unique.  Packed int64 keys require n < 3e9; beyond that
    switch to a struct key (two-column groupby)."""

    def canon(t: "pa.Table") -> "pa.Table":
        s = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = s != d
        s, d = s[keep], d[keep]
        key = np.unique(np.minimum(s, d) * n + np.maximum(s, d))
        return pa.table({"key": pa.array(key), "part": pa.array(key % P)})

    def dedup_bucket(g: pd.DataFrame) -> pd.DataFrame:
        key = np.unique(g["key"].to_numpy(dtype=np.int64))
        return pd.DataFrame({"a": key // n, "b": key % n})

    return (edges.map_batches(canon, batch_format="pyarrow")
            .groupby("part").map_groups(dedup_bucket, batch_format="pandas"))


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


def pagerank_weighted(edges: rd.Dataset, n_nodes: int, *, iters: int = 5,
                      damping: float = 0.85) -> np.ndarray:
    """Edge-weighted PageRank: rank[v] = (1-d)/n + d * sum over in-edges
    (u, v) of rank[u] * w(u, v) / W(u), where w(u, v) = 1 + (u + v) % 3
    (a deterministic per-edge weight the SQL oracle reproduces) and
    W(u) is u's total outgoing weight.

    Same execution shape as :func:`pagerank` — edges materialized once,
    per-iteration broadcast of the rank/weight-degree vector, per-block
    partial dst-sums (output-sized exchange); the weight is recomputed
    from (src, dst) inside each batch so no extra column ever ships."""
    edges = edges.materialize()

    def wdeg_partial(df: pd.DataFrame) -> pd.DataFrame:
        s = df["src"].to_numpy()
        w = 1.0 + (s + df["dst"].to_numpy()) % 3
        g = pd.Series(w).groupby(s).sum()
        return pd.DataFrame({"src": g.index.to_numpy(), "w": g.to_numpy()})

    wd_partials = edges.map_batches(wdeg_partial, batch_format="pandas").to_pandas()
    wd_small = wd_partials.groupby("src")["w"].sum()
    wdeg = np.zeros(n_nodes, dtype=np.float64)
    wdeg[wd_small.index.to_numpy()] = wd_small.to_numpy(dtype=np.float64)
    safe_wdeg = np.where(wdeg > 0, wdeg, 1.0)  # derivation guarantees >0

    ranks = np.full(n_nodes, 1.0 / n_nodes)
    for _ in range(iters):
        contrib_ref = ray.put(ranks / safe_wdeg)

        def part(df: pd.DataFrame, _ref=contrib_ref) -> pd.DataFrame:
            contrib = ray.get(_ref)
            s = df["src"].to_numpy()
            d = df["dst"].to_numpy()
            w = 1.0 + (s + d) % 3
            g = pd.Series(contrib[s] * w).groupby(d).sum()
            return pd.DataFrame({"dst": g.index.to_numpy(), "s": g.to_numpy()})

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
    if n_nodes > MAX_BROADCAST_NODES:
        raise ValueError(
            f"connected_components is the broadcast (host-scale) variant; "
            f"n_nodes={n_nodes} exceeds MAX_BROADCAST_NODES="
            f"{MAX_BROADCAST_NODES} — use pairs_components for doc-scale "
            f"near-dup graphs (sparse, pair-set-bounded)")
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


def label_propagation(edges: rd.Dataset, n_nodes: int, *,
                      iters: int = 3) -> np.ndarray:
    """Synchronous label-propagation community detection (Raghavan et al.
    2007): each sweep, every node adopts the MOST FREQUENT label among its
    undirected neighbors (ties -> smallest label; isolated nodes keep
    theirs).  Fixed ``iters`` sweeps computed from the PREVIOUS sweep's
    labels so the unrolled SQL oracle (queries.py::SQL_LPA_COMMUNITIES)
    replays the identical computation.

    Scale shape: same broadcast-iterate exchange as :func:`pagerank` /
    :func:`connected_components` — labels broadcast once per sweep via
    ray.put, each edge block emits (node, label, count) partials bounded
    by its own edge count, the driver reduce is edge-set-bounded.  Same
    host-scale boundary as the other broadcast variants (the partitioned
    siblings show the 1e10-node shape)."""
    if n_nodes > MAX_BROADCAST_NODES:
        raise ValueError(
            f"label_propagation is the broadcast (host-scale) variant; "
            f"n_nodes={n_nodes} exceeds MAX_BROADCAST_NODES="
            f"{MAX_BROADCAST_NODES}")
    edges = edges.materialize()
    labels = np.arange(n_nodes, dtype=np.int64)
    for _ in range(iters):
        ref = ray.put(labels)

        def part(df: pd.DataFrame, _ref=ref) -> pd.DataFrame:
            lab = ray.get(_ref)
            src = df["src"].to_numpy()
            dst = df["dst"].to_numpy()
            node = np.concatenate([dst, src])           # undirected
            nb = np.concatenate([lab[src], lab[dst]])
            g = pd.DataFrame({"node": node, "lab": nb})
            c = g.groupby(["node", "lab"], sort=False).size()
            out = c.reset_index(name="c")
            return out

        partials = edges.map_batches(part, batch_format="pandas").to_pandas()
        agg = partials.groupby(["node", "lab"], as_index=False)["c"].sum()
        # most frequent, ties -> smallest label (mergesort keeps it stable)
        agg = agg.sort_values(["node", "c", "lab"],
                              ascending=[True, False, True], kind="mergesort")
        best = agg.groupby("node", sort=False).head(1)
        new = labels.copy()
        new[best["node"].to_numpy()] = best["lab"].to_numpy()
        if np.array_equal(new, labels):
            break  # fixed point: every further sweep is identity in SQL too
        labels = new
    return labels


def _contract_block(df: pd.DataFrame) -> pd.DataFrame:
    """Union-find over ONE edge block -> star edges (root, member) with
    root = min node id of each within-block set.  Output is bounded by
    the number of distinct nodes in the block (<= 2x its edge count, and
    typically far fewer after the first round), never grows.  Node-set
    and connectivity preserving: every node of an input edge appears as
    an endpoint of some output star edge."""
    if not len(df):
        return pd.DataFrame({"src": np.array([], dtype=np.int64),
                             "dst": np.array([], dtype=np.int64)})
    src = df["src"].to_numpy(dtype=np.int64)
    dst = df["dst"].to_numpy(dtype=np.int64)
    parent: dict = {}

    def find(x: int) -> int:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:        # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in zip(src.tolist(), dst.tolist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            # min-root convention: the smaller id wins, so the final
            # star root IS the set minimum (the "keep" doc id)
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb
    nodes = np.unique(np.concatenate([src, dst]))
    roots = np.fromiter((find(int(x)) for x in nodes), dtype=np.int64,
                        count=len(nodes))
    member = roots != nodes
    return pd.DataFrame({"src": roots[member], "dst": nodes[member]})


def _merge_shared_members(g: pd.DataFrame) -> pd.DataFrame:
    """groupby(member) merge step: a node holding star edges from
    several blocks has several roots r1..rk; link them through the
    minimum (m, node) + (m, r_j).  Connectivity- and node-set-
    preserving; output size per group is the group size."""
    node = int(g["dst"].iloc[0])
    roots = np.unique(g["src"].to_numpy(dtype=np.int64))
    m = int(roots[0])
    dsts = np.concatenate([[node], roots[1:]])
    return pd.DataFrame({"src": np.full(len(dsts), m, dtype=np.int64),
                         "dst": dsts})


def pairs_components(pairs: rd.Dataset, *, src_col: str = "src",
                     dst_col: str = "dst",
                     driver_edge_budget: int = 4_000_000,
                     max_rounds: int = 12) -> pd.DataFrame:
    """SPARSE connected components over a near-dup candidate PAIR set —
    the doc-scale clustering step of an end-to-end dedup pipeline
    (pairs from minhash_lsh_pairs / ngram_jaccard / simhash -> clusters
    -> keep min-id doc per cluster).

    Unlike :func:`connected_components` (broadcast dense label vector,
    host-scale only — see MAX_BROADCAST_NODES), nothing here is sized by
    the corpus: nodes that appear in no pair are their own singleton
    cluster and never get a row.  All work is bounded by the PAIR set —
    for a near-dup graph that is output-sized (dup clusters), orders of
    magnitude below the 1e10-doc corpus.

    Algorithm: alternating distributed contraction rounds —
      (a) per-block union-find -> star edges (min-root, member), which
          shrinks each block to <= its distinct-node count;
      (b) ``groupby(member)`` min-root merge, which links components
          that were split across blocks
    — repeated until the surviving edge set fits ``driver_edge_budget``,
    then one driver-side union-find over the contracted (pair-set-
    bounded, NEVER corpus-bounded) remainder produces final labels.
    Each round only shrinks the edge set; the driver finish makes
    correctness independent of how many distributed rounds ran, so
    ``max_rounds`` is a latency knob, not a correctness one.

    Returns a sparse DataFrame (node, component) sorted by node, one row
    per node appearing in >= 1 pair, component = min node id of its
    connected component.  Join it back to the doc stream with a
    broadcast sorted-array lookup (see queries.q_dedup_cluster_keep) —
    the table is pair-set-bounded, so the broadcast is the same
    small-side pattern as every other lookup in this engine.
    """
    edges = pairs
    if src_col != "src" or dst_col != "dst":
        edges = edges.map_batches(
            lambda df: df.rename(columns={src_col: "src", dst_col: "dst"})[["src", "dst"]],
            batch_format="pandas")
    edges = edges.map_batches(_contract_block, batch_format="pandas").materialize()
    rounds = 0
    while edges.count() > driver_edge_budget and rounds < max_rounds:
        edges = (edges.groupby("dst")
                 .map_groups(_merge_shared_members, batch_format="pandas")
                 .map_batches(_contract_block, batch_format="pandas")
                 .materialize())
        rounds += 1

    rem = edges.to_pandas()
    if not len(rem):
        return pd.DataFrame({"node": np.array([], dtype=np.int64),
                             "component": np.array([], dtype=np.int64)})
    parent: dict = {}

    def find(x: int) -> int:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    for a, b in zip(rem["src"].to_numpy(dtype=np.int64).tolist(),
                    rem["dst"].to_numpy(dtype=np.int64).tolist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb
    nodes = np.unique(rem[["src", "dst"]].to_numpy(dtype=np.int64))
    comp = np.fromiter((find(int(x)) for x in nodes), dtype=np.int64,
                       count=len(nodes))
    return pd.DataFrame({"node": nodes, "component": comp})


def pagerank_partitioned(edges: rd.Dataset, n_nodes: int, *, iters: int = 5,
                         damping: float = 0.85,
                         num_partitions: int = 32) -> pd.DataFrame:
    """Shuffle-variant PageRank for graphs whose rank vector exceeds the
    broadcast boundary (MAX_BROADCAST_NODES): the rank vector is never a
    dense driver array — it lives as (node, rank, outdeg) rows
    hash-partitioned by node, and every sweep is two bounded exchanges:

      1. rank rows and edge rows meet in a ``groupby(hash(src) % P)``
         partition join; each partition emits per-dst PARTIAL
         contribution sums (combiner — output is bounded by distinct dst
         per partition, never edge count);
      2. partials reduce in a ``groupby(hash(dst) % P)`` exchange and
         rejoin the static node table to produce next sweep's rank rows
         ((1-d)/n for nodes with no in-links, same dangling-mass
         semantics as :func:`pagerank` — dangling nodes contribute
         nothing).

    Same fixed-sweep computation as the broadcast variant (pinned
    equal-to-1e-9 by pytest on the derived graph); use this one when
    node count makes the dense vector impossible (doc-level graphs),
    the broadcast one for the host-rank signal.  Returns the final
    (node, rank) table sorted by node — at true scale callers keep it
    as a Dataset; the pandas return mirrors the test/query surface.
    """
    P = max(1, num_partitions)
    edges = edges.map_batches(
        lambda df: pd.DataFrame({
            "part": (pd.util.hash_array(df["src"].to_numpy(dtype=np.int64)) % P)
            .astype(np.int64),
            "src": df["src"].to_numpy(dtype=np.int64),
            "dst": df["dst"].to_numpy(dtype=np.int64)}),
        batch_format="pandas").materialize()

    # static node + outdeg table (one combiner pass over the edges; node
    # universe = 0..n_nodes-1 to match the broadcast variant's semantics)
    od_parts = edges.map_batches(
        lambda df: df.groupby("src", sort=False).size().rename("n").reset_index(),
        batch_format="pandas").to_pandas()
    od = od_parts.groupby("src")["n"].sum()

    def node_blocks(lo: int, hi: int) -> pd.DataFrame:
        nodes = np.arange(lo, hi, dtype=np.int64)
        deg = np.zeros(len(nodes), dtype=np.float64)
        inter = od.index.to_numpy()
        m = (inter >= lo) & (inter < hi)
        deg[inter[m] - lo] = od.to_numpy(dtype=np.float64)[m]
        return pd.DataFrame({
            "part": (pd.util.hash_array(nodes) % P).astype(np.int64),
            "node": nodes,
            "outdeg": deg})

    # node table built in blocks (at scale this comes straight from the
    # corpus Dataset; here n_nodes is test-sized)
    step = max(1, (n_nodes + 31) // 32)
    node_tab = rd.from_pandas([node_blocks(lo, min(lo + step, n_nodes))
                               for lo in range(0, n_nodes, step)]).materialize()

    rank = node_tab.map_batches(
        lambda df: df.assign(rank=np.full(len(df), 1.0 / n_nodes)),
        batch_format="pandas").materialize()

    for _ in range(iters):
        def contrib_partials(g: pd.DataFrame) -> pd.DataFrame:
            rk = g[g["kind"] == "r"]
            eg = g[g["kind"] == "e"]
            if not len(eg):
                return pd.DataFrame({"part2": np.array([], dtype=np.int64),
                                     "dst": np.array([], dtype=np.int64),
                                     "s": np.array([], dtype=np.float64)})
            cmap = pd.Series(
                np.where(rk["outdeg"].to_numpy() > 0,
                         rk["rank"].to_numpy() / np.where(rk["outdeg"].to_numpy() > 0,
                                                          rk["outdeg"].to_numpy(), 1.0),
                         0.0),
                index=rk["node"].to_numpy())
            s = pd.Series(cmap[eg["src"]].to_numpy()).groupby(
                eg["dst"].to_numpy()).sum()
            dsts = s.index.to_numpy().astype(np.int64)
            return pd.DataFrame({
                "part2": (pd.util.hash_array(dsts) % P).astype(np.int64),
                "dst": dsts, "s": s.to_numpy()})

        tagged_rank = rank.map_batches(
            lambda df: pd.DataFrame({
                "part": df["part"].to_numpy(), "kind": "r",
                "src": np.full(len(df), -1, dtype=np.int64),
                "dst": np.full(len(df), -1, dtype=np.int64),
                "node": df["node"].to_numpy(), "rank": df["rank"].to_numpy(),
                "outdeg": df["outdeg"].to_numpy()}),
            batch_format="pandas")
        tagged_edges = edges.map_batches(
            lambda df: pd.DataFrame({
                "part": df["part"].to_numpy(), "kind": "e",
                "src": df["src"].to_numpy(), "dst": df["dst"].to_numpy(),
                "node": np.full(len(df), -1, dtype=np.int64),
                "rank": np.zeros(len(df)), "outdeg": np.zeros(len(df))}),
            batch_format="pandas")
        partials = (tagged_edges.union(tagged_rank)
                    .groupby("part").map_groups(contrib_partials,
                                                batch_format="pandas"))

        def reduce_and_score(g: pd.DataFrame) -> pd.DataFrame:
            is_node = g["kind"] == "n"
            nodes = g[is_node]
            ss = g[~is_node].groupby("dst")["s"].sum()
            base = np.full(len(nodes), (1.0 - damping) / n_nodes)
            add = ss.reindex(nodes["node"].to_numpy()).fillna(0.0).to_numpy()
            return pd.DataFrame({
                "part": nodes["part"].to_numpy(),
                "node": nodes["node"].to_numpy(),
                "outdeg": nodes["outdeg"].to_numpy(),
                "rank": base + damping * add})

        tagged_nodes = node_tab.map_batches(
            lambda df: pd.DataFrame({
                "part2": df["part"].to_numpy(), "kind": "n",
                "part": df["part"].to_numpy(),
                "dst": np.full(len(df), -1, dtype=np.int64),
                "s": np.zeros(len(df)),
                "node": df["node"].to_numpy(),
                "outdeg": df["outdeg"].to_numpy()}),
            batch_format="pandas")
        tagged_partials = partials.map_batches(
            lambda df: pd.DataFrame({
                "part2": df["part2"].to_numpy(), "kind": "p",
                "part": np.zeros(len(df), dtype=np.int64),
                "dst": df["dst"].to_numpy(), "s": df["s"].to_numpy(),
                "node": df["dst"].to_numpy(),
                "outdeg": np.zeros(len(df))}),
            batch_format="pandas")
        rank = (tagged_nodes.union(tagged_partials)
                .groupby("part2").map_groups(reduce_and_score,
                                             batch_format="pandas")).materialize()

    out = rank.to_pandas()[["node", "rank"]]
    return out.sort_values("node").reset_index(drop=True)


def triangle_counts(edges: rd.Dataset, n_nodes: int, *,
                    deg_mode: str = "broadcast",
                    dense_output: bool = True,
                    return_deg: bool = False) -> pd.DataFrame:
    """Per-node triangle participation counts via degree-ordered edge
    orientation (the classic MapReduce triangle algorithm: Suri &
    Vassilvitskii, "Counting Triangles and the Curse of the Last
    Reducer", WWW'11 — public-paper pattern, no reference counterpart).

    Why orientation matters at 100 TB: naive wedge enumeration around a
    hub node is O(deg^2) — a 1e6-degree host emits 1e12 wedges.
    Orienting every undirected edge from its lower-(degree, id) endpoint
    to its higher one bounds every node's OUT-degree by O(sqrt(m)), so
    total wedge volume is O(m^1.5) worst case and near-linear on
    power-law web graphs, with no single fat group.

    Stages (every exchange is a groupby over hash BUCKETS — key %% P,
    never one Ray group per key, the many-tiny-groups map_groups
    pitfall — with fully vectorized in-partition kernels):
      1. canonicalize + global-dedup undirected edges (same packed key
         -> same bucket, per-bucket ``np.unique``);
      2. degrees — ``deg_mode="broadcast"`` (default): node-sized
         vector via combiner partials, ``ray.put`` once, under the
         same MAX_BROADCAST_NODES contract as :func:`pagerank`;
         ``deg_mode="partitioned"``: degrees stay hash-partitioned
         (node %% P) rows and are attached to each edge endpoint by
         two bucketed-groupby joins — NO dense vector anywhere, the
         doc-scale path (1e-parity-tested against broadcast);
      3. orient + emit wedges (``groupby(lo %% P)``; per-src runs found
         by sort inside the bucket, all later-neighbor pairs generated
         by one repeat/offset expansion — no per-node Python loop;
         out-run length bounded by step 2's orientation);
      4. closure: wedges keyed by their open pair (v, w) union the
         oriented edges keyed by themselves, ``groupby(key %% P)`` —
         wedge keys matched against the bucket's sorted edge keys via
         ``searchsorted``;
      5. per-node COUNT partials out of step 4 (output-sized), tiny
         final reduce.

    Returns (node, tri) for all ``n_nodes`` nodes, sorted by node.
    ``return_deg=True`` (broadcast + dense only) appends the undirected
    degree column computed by step 2, so callers that need both — e.g.
    :func:`local_clustering` — don't run a second canonicalize+degree
    pass over the edge Dataset.  Packed int64 keys require
    ``n_nodes < 3e9``; beyond that use a struct key (two-column
    groupby)."""
    if return_deg and (deg_mode != "broadcast" or not dense_output):
        raise ValueError("return_deg requires deg_mode='broadcast' and "
                         "dense_output=True (the dense degree vector)")
    if deg_mode == "broadcast" and n_nodes > MAX_BROADCAST_NODES:
        raise ValueError(
            f"triangle_counts(deg_mode='broadcast') holds a dense degree "
            f"vector; n_nodes={n_nodes} exceeds MAX_BROADCAST_NODES="
            f"{MAX_BROADCAST_NODES} — use deg_mode='partitioned'")

    n = np.int64(n_nodes)
    P = np.int64(64)
    und = _canonical_undirected(edges, n, P).materialize()

    def _deg_partial(df: pd.DataFrame) -> pd.DataFrame:
        s = pd.Series(1, index=np.concatenate(
            [df["a"].to_numpy(), df["b"].to_numpy()])).groupby(level=0).sum()
        return pd.DataFrame({"node": s.index.to_numpy(), "c": s.to_numpy()})

    # orientation order is LEXICOGRAPHIC (deg(v), v) — no dense rank
    # positions needed, which is what makes the partitioned path possible
    if deg_mode == "broadcast":
        deg_partials = und.map_batches(
            _deg_partial, batch_format="pandas").to_pandas()
        deg_small = deg_partials.groupby("node")["c"].sum()
        deg = np.zeros(n_nodes, dtype=np.int64)
        deg[deg_small.index.to_numpy()] = deg_small.to_numpy()
        deg_ref = ray.put(deg)

        def orient(df: pd.DataFrame, _ref=deg_ref) -> pd.DataFrame:
            dv = ray.get(_ref)
            a = df["a"].to_numpy(dtype=np.int64)
            b = df["b"].to_numpy(dtype=np.int64)
            flip = (dv[a] > dv[b]) | ((dv[a] == dv[b]) & (a > b))
            lo = np.where(flip, b, a)
            hi = np.where(flip, a, b)
            dhi = np.where(flip, dv[a], dv[b])
            return pd.DataFrame({"lo": lo, "hi": hi, "dhi": dhi,
                                 "part": lo % P})

        oriented = und.map_batches(orient, batch_format="pandas").materialize()
    elif deg_mode == "partitioned":
        deg_rows = (und.map_batches(
            lambda df: _deg_partial(df).assign(
                part=lambda d: d["node"].to_numpy() % P),
            batch_format="pandas")
            .groupby("part").map_groups(
                lambda g: g.groupby("node", as_index=False)["c"].sum(),
                batch_format="pandas"))

        def _attach(ds: rd.Dataset, col: str, out_col: str) -> rd.Dataset:
            """Bucketed-groupby join: attach deg(ds[col]) as ds[out_col]
            without any dense vector (edges and (node, deg) rows meet in
            their node's hash bucket)."""
            e_cols = [c for c in ds.schema().names if c != "part"]
            tag_e = ds.map_batches(
                lambda df: df[e_cols].assign(
                    part=df[col].to_numpy(dtype=np.int64) % P, kind=0,
                    node=-1, c=0),
                batch_format="pandas")
            tag_d = deg_rows.map_batches(
                lambda df: pd.DataFrame(
                    {**{c: 0 for c in e_cols}, "part": df["node"] % P,
                     "kind": 1, "node": df["node"], "c": df["c"]}),
                batch_format="pandas")

            def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
                e = g.loc[g["kind"] == 0, e_cols]
                d = g.loc[g["kind"] == 1, ["node", "c"]]
                out = e.merge(d, left_on=col, right_on="node") \
                    .drop(columns="node").rename(columns={"c": out_col})
                for c in e_cols + [out_col]:
                    out[c] = out[c].astype(np.int64)
                return out

            return tag_e.union(tag_d).groupby("part").map_groups(
                merge_bucket, batch_format="pandas")

        withdeg = _attach(_attach(und, "a", "da"), "b", "db")

        def orient_p(df: pd.DataFrame) -> pd.DataFrame:
            a = df["a"].to_numpy(dtype=np.int64)
            b = df["b"].to_numpy(dtype=np.int64)
            da = df["da"].to_numpy(dtype=np.int64)
            db = df["db"].to_numpy(dtype=np.int64)
            flip = (da > db) | ((da == db) & (a > b))
            lo = np.where(flip, b, a)
            hi = np.where(flip, a, b)
            dhi = np.where(flip, da, db)
            return pd.DataFrame({"lo": lo, "hi": hi, "dhi": dhi,
                                 "part": lo % P})

        oriented = withdeg.map_batches(
            orient_p, batch_format="pandas").materialize()
    else:
        raise ValueError(f"unknown deg_mode {deg_mode!r}")

    def wedges_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lo = g["lo"].to_numpy(dtype=np.int64)
        hi = g["hi"].to_numpy(dtype=np.int64)
        dhi = g["dhi"].to_numpy(dtype=np.int64)
        # sort by (lo, (deg(hi), hi)): per-src runs, order-ascending
        o = np.lexsort((hi, dhi, lo))
        lo, hi = lo[o], hi[o]
        # k[t] = number of LATER same-run elements pairing with t
        run_start = np.nonzero(np.concatenate(
            [[True], lo[1:] != lo[:-1]]))[0]
        run_len = np.diff(np.append(run_start, len(lo)))
        run_end = np.repeat(run_start + run_len, run_len)
        k = run_end - np.arange(len(lo)) - 1
        total = int(k.sum())
        if not total:
            return pd.DataFrame({"key": np.array([], dtype=np.int64),
                                 "u": np.array([], dtype=np.int64),
                                 "is_edge": np.array([], dtype=np.int64)})
        idx_i = np.repeat(np.arange(len(lo)), k)
        off = np.arange(total) - np.repeat(np.cumsum(k) - k, k) + 1
        idx_j = idx_i + off
        v, w = hi[idx_i], hi[idx_j]  # rank(v) < rank(w) by the sort
        return pd.DataFrame({"key": v * n + w, "u": lo[idx_i],
                             "is_edge": np.zeros(total, dtype=np.int64)})

    wedge_ds = oriented.groupby("part").map_groups(
        wedges_bucket, batch_format="pandas")
    edge_keys = oriented.map_batches(
        lambda df: pd.DataFrame({
            "key": df["lo"].to_numpy(dtype=np.int64) * n
                   + df["hi"].to_numpy(dtype=np.int64),
            "u": np.full(len(df), -1, dtype=np.int64),
            "is_edge": np.ones(len(df), dtype=np.int64)}),
        batch_format="pandas")
    tagged = (wedge_ds.union(edge_keys)).map_batches(
        lambda df: df.assign(part=df["key"].to_numpy(dtype=np.int64) % P),
        batch_format="pandas")

    def close_bucket(g: pd.DataFrame) -> pd.DataFrame:
        is_edge = g["is_edge"].to_numpy(dtype=np.int64) == 1
        ek = np.sort(g.loc[is_edge, "key"].to_numpy(dtype=np.int64))
        wk = g.loc[~is_edge, "key"].to_numpy(dtype=np.int64)
        wu = g.loc[~is_edge, "u"].to_numpy(dtype=np.int64)
        if not len(ek) or not len(wk):
            return pd.DataFrame({"node": np.array([], dtype=np.int64),
                                 "c": np.array([], dtype=np.int64)})
        pos = np.searchsorted(ek, wk)
        pos[pos >= len(ek)] = len(ek) - 1
        hit = ek[pos] == wk
        if not hit.any():
            return pd.DataFrame({"node": np.array([], dtype=np.int64),
                                 "c": np.array([], dtype=np.int64)})
        wk, wu = wk[hit], wu[hit]
        # each closed wedge credits its u, v, w once; compress per bucket
        nodes = np.concatenate([wu, wk // n, wk % n])
        s = pd.Series(1, index=nodes).groupby(level=0).sum()
        return pd.DataFrame({"node": s.index.to_numpy(),
                             "c": s.to_numpy()})

    partials = (tagged.groupby("part")
                .map_groups(close_bucket, batch_format="pandas")
                .to_pandas())  # output-sized partial counts per bucket
    if len(partials):
        cnt = partials.groupby("node")["c"].sum()
    else:
        cnt = pd.Series(dtype=np.int64)
    if not dense_output:
        # sparse finish: one row per node IN >= 1 triangle — the only
        # output shape allowed past the dense-vector ceiling
        return pd.DataFrame({
            "node": cnt.index.to_numpy(dtype=np.int64),
            "tri": cnt.to_numpy(dtype=np.int64)}).sort_values(
                "node").reset_index(drop=True)
    if n_nodes > MAX_BROADCAST_NODES:
        raise ValueError(
            f"dense_output=True allocates an n_nodes-sized array on the "
            f"driver; n_nodes={n_nodes} exceeds MAX_BROADCAST_NODES="
            f"{MAX_BROADCAST_NODES} — pass dense_output=False")
    tri = np.zeros(n_nodes, dtype=np.int64)
    if len(cnt):
        tri[cnt.index.to_numpy(dtype=np.int64)] = cnt.to_numpy(dtype=np.int64)
    out = pd.DataFrame({"node": np.arange(n_nodes, dtype=np.int64),
                        "tri": tri})
    if return_deg:
        out["deg"] = deg  # the step-2 dense vector (broadcast mode only)
    return out


def hits(edges: rd.Dataset, n_nodes: int, *, iters: int = 2) -> pd.DataFrame:
    """HITS hubs/authorities (Kleinberg, JACM'99) over a (src, dst)
    edge Dataset — the second classic link-quality signal next to
    :func:`pagerank` (a page that LINKS to many good pages is a hub; a
    page many hubs link to is an authority — crawl schedulers seed from
    hubs).

    Same broadcast-iterate exchange discipline as :func:`pagerank`:
    the edge set is materialized once and re-scanned per sweep; each
    sweep broadcasts the current score vector via ``ray.put`` and moves
    only per-block partial dst-sums (auth step) / src-sums (hub step) —
    output-sized, never edge-sized.  Fixed ``iters`` with L2
    normalization after each half-step so the SQL oracle can unroll the
    identical computation.  Subject to MAX_BROADCAST_NODES like every
    dense-vector variant here."""
    if n_nodes > MAX_BROADCAST_NODES:
        raise ValueError(
            f"hits broadcasts dense score vectors; n_nodes={n_nodes} "
            f"exceeds MAX_BROADCAST_NODES={MAX_BROADCAST_NODES}")
    edges = edges.materialize()
    hub = np.ones(n_nodes, dtype=np.float64)
    auth = np.ones(n_nodes, dtype=np.float64)

    def _sweep(vec: np.ndarray, from_col: str, to_col: str) -> np.ndarray:
        ref = ray.put(vec)

        def part(df: pd.DataFrame, _ref=ref) -> pd.DataFrame:
            v = ray.get(_ref)
            s = pd.Series(v[df[from_col].to_numpy()]).groupby(
                df[to_col].to_numpy()).sum()
            return pd.DataFrame({"node": s.index.to_numpy(),
                                 "s": s.to_numpy()})

        partials = edges.map_batches(part, batch_format="pandas").to_pandas()
        out = np.zeros(n_nodes, dtype=np.float64)
        if len(partials):
            agg = partials.groupby("node")["s"].sum()
            out[agg.index.to_numpy()] = agg.to_numpy()
        norm = np.sqrt(np.sum(out * out))
        return out / norm if norm > 0 else out

    for _ in range(iters):
        auth = _sweep(hub, "src", "dst")
        hub = _sweep(auth, "dst", "src")
    return pd.DataFrame({"node": np.arange(n_nodes, dtype=np.int64),
                         "hub": hub, "auth": auth})


def kcore_membership(edges: rd.Dataset, n_nodes: int, *, k: int = 2,
                     sweeps: int = 4) -> pd.DataFrame:
    """k-core membership after a FIXED number of peeling sweeps: each
    sweep removes every node whose degree within the surviving induced
    subgraph is < k.  The k-core (spam-farm / tightly-knit community
    signal; Seidman 1983) is the fixpoint; a fixed sweep count keeps
    the computation identical to the unrolled SQL oracle — pick
    ``sweeps`` >= peel depth for the true core.

    Same discipline as the other dense-vector variants: canonical edge
    dedup via a bucketed groupby, then per sweep one broadcast of the
    alive bitmap (``ray.put``) and per-block surviving-degree COUNT
    partials (output-sized).  Subject to MAX_BROADCAST_NODES."""
    if n_nodes > MAX_BROADCAST_NODES:
        raise ValueError(
            f"kcore_membership broadcasts an alive bitmap; n_nodes="
            f"{n_nodes} exceeds MAX_BROADCAST_NODES={MAX_BROADCAST_NODES}")
    n = np.int64(n_nodes)
    P = np.int64(64)
    und = _canonical_undirected(edges, n, P).materialize()

    alive = np.ones(n_nodes, dtype=bool)
    for _ in range(sweeps):
        ref = ray.put(alive)

        def part(df: pd.DataFrame, _ref=ref) -> pd.DataFrame:
            al = ray.get(_ref)
            a = df["a"].to_numpy(dtype=np.int64)
            b = df["b"].to_numpy(dtype=np.int64)
            both = al[a] & al[b]
            node = np.concatenate([a[both], b[both]])
            if not len(node):
                return pd.DataFrame({"node": pd.Series(dtype=np.int64),
                                     "c": pd.Series(dtype=np.int64)})
            s = pd.Series(1, index=node).groupby(level=0).sum()
            return pd.DataFrame({"node": s.index.to_numpy(),
                                 "c": s.to_numpy()})

        partials = und.map_batches(part, batch_format="pandas").to_pandas()
        deg = np.zeros(n_nodes, dtype=np.int64)
        if len(partials):
            agg = partials.groupby("node")["c"].sum()
            deg[agg.index.to_numpy()] = agg.to_numpy()
        alive = alive & (deg >= k)
    return pd.DataFrame({"node": np.arange(n_nodes, dtype=np.int64),
                         "in_core": alive.astype(np.int64)})


def hits_partitioned(edges: rd.Dataset, n_nodes: int, *, iters: int = 2,
                     num_partitions: int = 32,
                     dense_output: bool = True) -> pd.DataFrame:
    """Shuffle-variant HITS: scores live as hash-partitioned (node, s)
    rows, never as a dense driver vector — the doc-scale path next to
    :func:`hits`, exactly as :func:`pagerank_partitioned` is to
    :func:`pagerank`.

    Each half-step is two bucketed-groupby exchanges: (1) attach the
    current score to each edge's contributing endpoint inside that
    node's hash bucket and emit per-bucket partial sums keyed by the
    receiving endpoint; (2) reduce the partials in the receiving
    node's bucket.  The L2 norm is a scalar (per-bucket sum-of-squares
    partials -> one driver float), so nothing node-sized ever sits on
    the driver; only the FINAL result (output-sized by definition) is
    collected.  Nodes with no edges score 0, as in the broadcast
    variant."""
    P = np.int64(num_partitions)
    edges = edges.map_batches(
        lambda df: pd.DataFrame({
            "src": df["src"].to_numpy(dtype=np.int64),
            "dst": df["dst"].to_numpy(dtype=np.int64)}),
        batch_format="pandas").materialize()

    def node_rows(df: pd.DataFrame) -> pd.DataFrame:
        nodes = np.unique(np.concatenate(
            [df["src"].to_numpy(dtype=np.int64),
             df["dst"].to_numpy(dtype=np.int64)]))
        return pd.DataFrame({"node": nodes, "part": nodes % P})

    nodes_ds = (edges.map_batches(node_rows, batch_format="pandas")
                .groupby("part").map_groups(
                    lambda g: pd.DataFrame(
                        {"node": np.unique(g["node"].to_numpy(dtype=np.int64))}),
                    batch_format="pandas")
                .map_batches(
                    lambda df: df.assign(part=df["node"].to_numpy() % P),
                    batch_format="pandas")
                .materialize())

    hub = nodes_ds.map_batches(
        lambda df: df.assign(s=1.0), batch_format="pandas").materialize()

    def _half_step(score: rd.Dataset, from_col: str,
                   to_col: str) -> rd.Dataset:
        """new_score(v) = sum over edges (from->to) of score[from],
        L2-normalized; returns materialized (node, part, s) rows."""
        e_tag = edges.map_batches(
            lambda df: pd.DataFrame({
                "part": df[from_col].to_numpy(dtype=np.int64) % P,
                "kind": 0,
                "f": df[from_col].to_numpy(dtype=np.int64),
                "t": df[to_col].to_numpy(dtype=np.int64),
                "s": np.zeros(len(df))}),
            batch_format="pandas")
        s_tag = score.map_batches(
            lambda df: pd.DataFrame({
                "part": df["node"].to_numpy(dtype=np.int64) % P,
                "kind": 1,
                "f": df["node"].to_numpy(dtype=np.int64),
                "t": np.full(len(df), -1, dtype=np.int64),
                "s": df["s"].to_numpy()}),
            batch_format="pandas")

        def contrib(g: pd.DataFrame) -> pd.DataFrame:
            e = g[g["kind"] == 0]
            sc = g[g["kind"] == 1]
            if not len(e) or not len(sc):
                return pd.DataFrame({"part2": pd.Series(dtype=np.int64),
                                     "t": pd.Series(dtype=np.int64),
                                     "s": pd.Series(dtype=np.float64)})
            m = e[["f", "t"]].merge(sc[["f", "s"]], on="f")
            agg = m.groupby("t")["s"].sum()  # per-bucket combiner
            t = agg.index.to_numpy(dtype=np.int64)
            return pd.DataFrame({"part2": t % P, "t": t,
                                 "s": agg.to_numpy()})

        partials = (e_tag.union(s_tag).groupby("part")
                    .map_groups(contrib, batch_format="pandas"))

        raw = (partials.groupby("part2").map_groups(
            lambda g: g.groupby("t", as_index=False)["s"].sum(),
            batch_format="pandas")
            .map_batches(
                lambda df: pd.DataFrame({
                    "node": df["t"].to_numpy(dtype=np.int64),
                    "part": df["t"].to_numpy(dtype=np.int64) % P,
                    "s": df["s"].to_numpy()}),
                batch_format="pandas").materialize())

        # scalar L2 norm: per-block sumsq partials -> one driver float
        sq = raw.map_batches(
            lambda df: pd.DataFrame({"ss": [float(np.sum(
                df["s"].to_numpy() ** 2))]}),
            batch_format="pandas").to_pandas()
        nrm = float(np.sqrt(sq["ss"].sum())) if len(sq) else 0.0
        if nrm <= 0:
            return raw
        return raw.map_batches(
            lambda df: df.assign(s=df["s"].to_numpy() / nrm),
            batch_format="pandas").materialize()

    auth = hub
    for _ in range(iters):
        auth = _half_step(hub, "src", "dst")
        hub = _half_step(auth, "dst", "src")

    hub_df = hub.to_pandas()[["node", "s"]].rename(columns={"s": "hub"})
    auth_df = auth.to_pandas()[["node", "s"]].rename(columns={"s": "auth"})
    sparse = hub_df.merge(auth_df, on="node", how="outer").fillna(0.0)
    if not dense_output:
        # sparse finish: rows only for nodes touching >= 1 edge — the
        # only shape allowed past the dense-vector ceiling (the body
        # never holds anything node-sized; only this finish would)
        sparse["node"] = sparse["node"].astype(np.int64)
        return sparse.sort_values("node").reset_index(drop=True)
    if n_nodes > MAX_BROADCAST_NODES:
        raise ValueError(
            f"dense_output=True allocates n_nodes-sized arrays on the "
            f"driver; n_nodes={n_nodes} exceeds MAX_BROADCAST_NODES="
            f"{MAX_BROADCAST_NODES} — pass dense_output=False")
    out_hub = np.zeros(n_nodes)
    out_auth = np.zeros(n_nodes)
    idx = sparse["node"].to_numpy(dtype=np.int64)
    out_hub[idx] = sparse["hub"].to_numpy()
    out_auth[idx] = sparse["auth"].to_numpy()
    return pd.DataFrame({"node": np.arange(n_nodes, dtype=np.int64),
                         "hub": out_hub, "auth": out_auth})


def kcore_membership_partitioned(edges: rd.Dataset, n_nodes: int, *,
                                 k: int = 2, sweeps: int = 4,
                                 num_partitions: int = 32,
                                 dense_output: bool = True) -> pd.DataFrame:
    """Shuffle-variant k-core peeling: the alive set lives as
    hash-partitioned (node,) rows and each sweep SEMI-JOINS the edge
    set against it (once per endpoint, in that endpoint's hash bucket)
    before recounting surviving degrees — no dense bitmap anywhere,
    and the edge set only shrinks sweep over sweep (re-materialized,
    so later sweeps scan less).  Doc-scale sibling of
    :func:`kcore_membership`, exactly as :func:`pagerank_partitioned` /
    :func:`hits_partitioned` are to their broadcast variants."""
    n = np.int64(n_nodes)
    P = np.int64(num_partitions)
    live_edges = _canonical_undirected(edges, n, P).materialize()

    def node_rows(df: pd.DataFrame) -> pd.DataFrame:
        nodes = np.unique(np.concatenate(
            [df["a"].to_numpy(dtype=np.int64),
             df["b"].to_numpy(dtype=np.int64)]))
        return pd.DataFrame({"node": nodes, "part": nodes % P})

    alive = (live_edges.map_batches(node_rows, batch_format="pandas")
             .groupby("part").map_groups(
                 lambda g: pd.DataFrame(
                     {"node": np.unique(g["node"].to_numpy(dtype=np.int64))}),
                 batch_format="pandas").materialize())

    def _semi_join(eds: rd.Dataset, al: rd.Dataset, col: str) -> rd.Dataset:
        """Keep edges whose ``col`` endpoint is alive (bucketed)."""
        e_tag = eds.map_batches(
            lambda df: pd.DataFrame({
                "part": df[col].to_numpy(dtype=np.int64) % P, "kind": 0,
                "a": df["a"].to_numpy(dtype=np.int64),
                "b": df["b"].to_numpy(dtype=np.int64)}),
            batch_format="pandas")
        a_tag = al.map_batches(
            lambda df: pd.DataFrame({
                "part": df["node"].to_numpy(dtype=np.int64) % P, "kind": 1,
                "a": df["node"].to_numpy(dtype=np.int64),
                "b": np.full(len(df), -1, dtype=np.int64)}),
            batch_format="pandas")

        def filt(g: pd.DataFrame) -> pd.DataFrame:
            e = g[g["kind"] == 0]
            keep_set = np.sort(g.loc[g["kind"] == 1, "a"]
                               .to_numpy(dtype=np.int64))
            if not len(e) or not len(keep_set):
                return pd.DataFrame({"a": pd.Series(dtype=np.int64),
                                     "b": pd.Series(dtype=np.int64)})
            v = e[col].to_numpy(dtype=np.int64)
            pos = np.searchsorted(keep_set, v)
            pos[pos >= len(keep_set)] = len(keep_set) - 1
            hit = keep_set[pos] == v
            return pd.DataFrame({"a": e["a"].to_numpy(dtype=np.int64)[hit],
                                 "b": e["b"].to_numpy(dtype=np.int64)[hit]})

        return e_tag.union(a_tag).groupby("part").map_groups(
            filt, batch_format="pandas")

    for _ in range(sweeps):
        live_edges = _semi_join(
            _semi_join(live_edges, alive, "a"), alive, "b").materialize()

        deg_parts = live_edges.map_batches(
            lambda df: (lambda s: pd.DataFrame(
                {"node": s.index.to_numpy(), "c": s.to_numpy(),
                 "part": s.index.to_numpy() % P}))(
                pd.Series(1, index=np.concatenate(
                    [df["a"].to_numpy(dtype=np.int64),
                     df["b"].to_numpy(dtype=np.int64)])).groupby(level=0).sum()),
            batch_format="pandas")
        alive = (deg_parts.groupby("part").map_groups(
            lambda g: (lambda agg: pd.DataFrame(
                {"node": agg.index.to_numpy(dtype=np.int64)[
                    agg.to_numpy() >= k]}))(g.groupby("node")["c"].sum()),
            batch_format="pandas").materialize())

    alive_nodes = np.sort(
        alive.to_pandas()["node"].to_numpy(dtype=np.int64))
    if not dense_output:
        # sparse finish: surviving-core rows only
        return pd.DataFrame({"node": alive_nodes,
                             "in_core": np.ones(len(alive_nodes),
                                                dtype=np.int64)})
    if n_nodes > MAX_BROADCAST_NODES:
        raise ValueError(
            f"dense_output=True allocates an n_nodes-sized array on the "
            f"driver; n_nodes={n_nodes} exceeds MAX_BROADCAST_NODES="
            f"{MAX_BROADCAST_NODES} — pass dense_output=False")
    in_core = np.zeros(n_nodes, dtype=np.int64)
    in_core[alive_nodes] = 1
    return pd.DataFrame({"node": np.arange(n_nodes, dtype=np.int64),
                         "in_core": in_core})


def adamic_adar_pairs(edges: rd.Dataset, n_nodes: int, *,
                      max_deg: int = 64, top_k: int = 100) -> pd.DataFrame:
    """Adamic-Adar link prediction: for every non-adjacent pair (a, b)
    sharing >= 1 neighbor, score = sum over shared neighbors w of
    1 / ln(deg(w)) (Adamic & Adar 2003; Liben-Nowell & Kleinberg CIKM'03
    — public-paper method, no reference counterpart).  The crawl-side
    use: predicted links rank candidate URLs for speculative prefetch.

    Scale shape: adjacency rows are bucketed by ``w %% P`` so each
    neighbor-run (deg(w) rows) lands whole in one bucket; pair emission
    is the same repeat/offset expansion as ``triangle_counts`` — no
    per-node Python loop.  Skew mitigation is the standard hub cap:
    intermediates with deg(w) > ``max_deg`` are EXCLUDED on both the
    engine and oracle side (a 1e6-degree hub would emit 1e12 pairs and
    carries ~0 signal at weight 1/ln(1e6)).  Scored pairs are summed
    and anti-joined against existing edges inside one bucketed groupby
    (all rows of a pair key share a bucket); global top-k is per-bucket
    partial top-k then a P x k driver merge — rows never transit the
    driver.  Packed int64 pair keys require n_nodes < 3e9."""
    n = np.int64(n_nodes)
    P = np.int64(64)
    und = _canonical_undirected(edges, n, P).materialize()

    def adj_rows(df: pd.DataFrame) -> pd.DataFrame:
        a = df["a"].to_numpy(dtype=np.int64)
        b = df["b"].to_numpy(dtype=np.int64)
        w = np.concatenate([a, b])
        v = np.concatenate([b, a])
        return pd.DataFrame({"w": w, "v": v, "part": w % P})

    def pairs_bucket(g: pd.DataFrame) -> pd.DataFrame:
        o = np.lexsort((g["v"].to_numpy(dtype=np.int64),
                        g["w"].to_numpy(dtype=np.int64)))
        w = g["w"].to_numpy(dtype=np.int64)[o]
        v = g["v"].to_numpy(dtype=np.int64)[o]
        run_start = np.nonzero(np.concatenate([[True], w[1:] != w[:-1]]))[0]
        run_len = np.diff(np.append(run_start, len(w)))
        # hub cap: deg(w) is complete here (all of w's rows share this
        # bucket); drop runs outside [2, max_deg]
        elem_len = np.repeat(run_len, run_len)
        run_end = np.repeat(run_start + run_len, run_len)
        k = np.where((elem_len >= 2) & (elem_len <= max_deg),
                     run_end - np.arange(len(w)) - 1, 0)
        total = int(k.sum())
        empty = pd.DataFrame({"key": np.array([], dtype=np.int64),
                              "score": np.array([], dtype=np.float64),
                              "is_edge": np.array([], dtype=np.int64)})
        if not total:
            return empty
        idx_i = np.repeat(np.arange(len(w)), k)
        off = np.arange(total) - np.repeat(np.cumsum(k) - k, k) + 1
        idx_j = idx_i + off
        # v ascending within a run -> v[idx_i] < v[idx_j]: canonical pair
        key = v[idx_i] * n + v[idx_j]
        score = 1.0 / np.log(elem_len[idx_i].astype(np.float64))
        return pd.DataFrame({"key": key, "score": score,
                             "is_edge": np.zeros(total, dtype=np.int64)})

    scored = (und.map_batches(adj_rows, batch_format="pandas")
              .groupby("part").map_groups(pairs_bucket,
                                          batch_format="pandas"))
    edge_keys = und.map_batches(
        lambda df: pd.DataFrame({
            "key": df["a"].to_numpy(dtype=np.int64) * n
                   + df["b"].to_numpy(dtype=np.int64),
            "score": np.zeros(len(df), dtype=np.float64),
            "is_edge": np.ones(len(df), dtype=np.int64)}),
        batch_format="pandas")
    tagged = scored.union(edge_keys).map_batches(
        lambda df: df.assign(part=df["key"].to_numpy(dtype=np.int64) % P),
        batch_format="pandas")

    def topk_bucket(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("key").agg(score=("score", "sum"),
                                 is_edge=("is_edge", "max"))
        s = s[s["is_edge"] == 0]  # anti-join existing edges, in-bucket
        if not len(s):
            return pd.DataFrame({"a": np.array([], dtype=np.int64),
                                 "b": np.array([], dtype=np.int64),
                                 "score": np.array([], dtype=np.float64)})
        key = s.index.to_numpy(dtype=np.int64)
        out = pd.DataFrame({"a": key // n, "b": key % n,
                            "score": s["score"].to_numpy().round(6)})
        # per-bucket partial top-k (same rank key as the final merge)
        return out.sort_values(["score", "a", "b"],
                               ascending=[False, True, True]).head(top_k)

    partials = (tagged.groupby("part")
                .map_groups(topk_bucket, batch_format="pandas")
                .to_pandas())  # <= P x top_k rows
    if not len(partials):
        return partials
    return (partials.sort_values(["score", "a", "b"],
                                 ascending=[False, True, True])
            .head(top_k).reset_index(drop=True))


def local_clustering(edges: rd.Dataset, n_nodes: int) -> pd.DataFrame:
    """Per-node local clustering coefficient
    2*tri(v) / (deg(v) * (deg(v) - 1)) over the undirected graph —
    the link-farm-vs-organic-neighborhood signal (cliquish host
    clusters score ~1).  Composes the oriented triangle counter
    (:func:`triangle_counts` — O(m^1.5) wedge bound) with an
    undirected-degree combiner pass; the join is driver-side over two
    node-sized frames (bounded by MAX_BROADCAST_NODES via
    triangle_counts' dense-output guard; past that, both sides have
    sparse/partitioned siblings).  ``return_deg=True`` reuses the
    counter's own canonicalize+degree pass, so the edge Dataset (and
    anything lazy upstream of it) executes exactly once."""
    tri = triangle_counts(edges, n_nodes, return_deg=True)
    deg = tri["deg"].to_numpy(dtype=np.int64)
    t = tri["tri"].to_numpy(dtype=np.float64)
    denom = deg.astype(np.float64) * (deg - 1.0)
    coeff = np.divide(2.0 * t, denom, out=np.zeros_like(t),
                      where=denom > 0)
    return pd.DataFrame({"node": tri["node"].to_numpy(dtype=np.int64),
                         "deg": deg, "tri": tri["tri"].to_numpy(dtype=np.int64),
                         "coeff": np.round(coeff, 6)})


def bfs_depths(edges: rd.Dataset, n_nodes: int, seeds: np.ndarray, *,
               iters: int = 4) -> np.ndarray:
    """Multi-source BFS depth (directed shortest hop count from a seed
    set) — the crawl-analysis primitive behind "how deep is this page
    from the seed list" audits and frontier-budget planning.

    Min-plus label propagation with ``iters`` fixed sweeps (no
    convergence test, so the SQL oracle unrolls the identical
    computation): depth'[v] = min(depth[v], 1 + min over in-edges (u, v)
    of depth[u]).  Same broadcast-iterate exchange as :func:`pagerank` —
    the edge set is materialized once and re-scanned per sweep, the
    depth vector rides ``ray.put`` (zero-copy shared numpy per node),
    and each sweep's exchange is per-block partial dst-mins,
    output-sized rather than edge-sized.  Nodes not reached within
    ``iters`` hops return -1.  Guarded by MAX_BROADCAST_NODES like the
    other dense-vector sweeps; doc-scale graphs should run the frontier
    engine itself (pipelines/greedy.py), which is this computation in
    streaming form with a sharded seen-set instead of a dense vector."""
    if n_nodes > MAX_BROADCAST_NODES:
        raise ValueError(
            f"bfs_depths is the broadcast (host-scale) variant; "
            f"n_nodes={n_nodes} exceeds MAX_BROADCAST_NODES="
            f"{MAX_BROADCAST_NODES} — run the streaming frontier engine "
            f"for doc-scale reachability")
    edges = edges.materialize()
    INF = np.int64(n_nodes + 1)
    depth = np.full(n_nodes, INF, dtype=np.int64)
    depth[np.asarray(seeds, dtype=np.int64)] = 0
    for _ in range(iters):
        ref = ray.put(depth)

        def part(df: pd.DataFrame, _ref=ref) -> pd.DataFrame:
            d = ray.get(_ref)
            src = df["src"].to_numpy()
            dst = df["dst"].to_numpy()
            s = pd.Series(d[src] + 1).groupby(dst).min()
            return pd.DataFrame({"node": s.index.to_numpy(), "m": s.to_numpy()})

        partials = edges.map_batches(part, batch_format="pandas").to_pandas()
        agg = partials.groupby("node")["m"].min()
        new = depth.copy()
        np.minimum.at(new, agg.index.to_numpy(), agg.to_numpy(dtype=np.int64))
        if (new == depth).all():
            break  # converged: further sweeps are identity (oracle-safe)
        depth = new
    return np.where(depth >= INF, np.int64(-1), depth)


def seed_depths(edges: rd.Dataset, n_nodes: int, seeds: np.ndarray, *,
                iters: int = 4) -> pd.DataFrame:
    """PER-SEED BFS depths (one row per (seed, node) with finite depth
    <= ``iters``) — the sampled-source primitive behind harmonic
    centrality and seed-influence audits; :func:`bfs_depths` is its
    min-collapsed (multi-source) sibling.

    State is an (S, n) depth matrix broadcast per sweep via ``ray.put``
    (S = |seeds| sampled sources, so the budget is S x n x 8 bytes —
    sampling keeps S small by construction); per-block partials are
    (seed, dst, min) rows grouped in pandas, output-sized per sweep.
    """
    seeds = np.asarray(seeds, dtype=np.int64)
    S = len(seeds)
    if S * n_nodes > MAX_BROADCAST_NODES:
        raise ValueError(
            f"seed_depths broadcasts an (S={S}) x (n={n_nodes}) depth "
            f"matrix; budget exceeds MAX_BROADCAST_NODES="
            f"{MAX_BROADCAST_NODES} — sample fewer seeds or run the "
            f"streaming frontier engine per seed")
    edges = edges.materialize()
    INF = np.int64(n_nodes + 1)
    depth = np.full((S, n_nodes), INF, dtype=np.int64)
    depth[np.arange(S), seeds] = 0
    for _ in range(iters):
        ref = ray.put(depth)

        def part(df: pd.DataFrame, _ref=ref) -> pd.DataFrame:
            d = ray.get(_ref)
            src = df["src"].to_numpy()
            dst = df["dst"].to_numpy()
            cand = d[:, src] + 1  # (S, m)
            rows = pd.DataFrame({
                "s": np.repeat(np.arange(len(d), dtype=np.int64), len(src)),
                "node": np.tile(dst, len(d)),
                "m": cand.ravel(),
            })
            g = rows.groupby(["s", "node"], as_index=False)["m"].min()
            return g[g["m"] <= INF]

        partials = edges.map_batches(part, batch_format="pandas").to_pandas()
        agg = partials.groupby(["s", "node"])["m"].min()
        new = depth.copy()
        idx = agg.index.to_frame(index=False)
        np.minimum.at(new, (idx["s"].to_numpy(), idx["node"].to_numpy()),
                      agg.to_numpy(dtype=np.int64))
        if (new == depth).all():
            break  # converged: further sweeps are identity (oracle-safe)
        depth = new
    s_idx, node = np.nonzero(depth < INF)
    return pd.DataFrame({"seed": seeds[s_idx], "node": node.astype(np.int64),
                         "dep": depth[s_idx, node]})


def harmonic_centrality(edges: rd.Dataset, n_nodes: int, seeds: np.ndarray,
                        *, iters: int = 4, topk: int = 50) -> pd.DataFrame:
    """Sampled-seed harmonic centrality estimate: hc(v) = sum over
    sampled sources s of 1/d(s, v) for finite nonzero depths within
    ``iters`` hops (Boldi & Vigna's harmonic variant of closeness,
    estimated from a source sample as in HyperBall-style sweeps).
    Returns the top-``topk`` nodes by (round(hc, 6) desc, node asc) with
    the number of reaching seeds — rounding BEFORE ranking keeps the
    order identical to the SQL oracle's float64 sum."""
    rows = seed_depths(edges, n_nodes, seeds, iters=iters)
    rows = rows[rows["dep"] > 0]
    # seed-ascending accumulation order: fixed, so the float64 sum is
    # reproducible (the oracle orders its SUM identically)
    rows = rows.sort_values(["node", "seed"], kind="mergesort")
    g = rows.groupby("node").agg(hc=("dep", lambda d: (1.0 / d).sum()),
                                 n_reached=("dep", "size")).reset_index()
    g["hc"] = np.round(g["hc"], 6)
    g = g.sort_values(["hc", "node"], ascending=[False, True],
                      kind="mergesort").head(topk).reset_index(drop=True)
    g.insert(0, "rank", np.arange(1, len(g) + 1, dtype=np.int64))
    g["node"] = g["node"].astype("int64")
    g["n_reached"] = g["n_reached"].astype("int64")
    return g[["rank", "node", "hc", "n_reached"]]


def random_walks(edges: rd.Dataset, walkers: np.ndarray, *, steps: int = 4,
                 num_partitions: int = 32) -> pd.DataFrame:
    """Deterministic hash-driven random walks over the link graph (the
    subgraph-sampling / corpus-expansion primitive: node2vec-style
    traversal with a replayable pseudo-random next-hop choice instead of
    an RNG, so the SQL oracle can follow the identical paths).

    At node u on step t, walker w moves to the idx-th smallest distinct
    out-neighbour where idx = ((w % 997)*8191 + t*131071 +
    (u % 9973)*131) % outdeg(u); walks halt at sink nodes.  Each step is
    ONE bucketed exchange: position rows and adjacency rows meet in
    hash(node) buckets (adjacency is tagged ONCE and its materialized
    blocks are reused across all steps), so the per-step shuffle moves
    only frontier-sized + adjacency-sized narrow rows and millions of
    walkers ride the same P buckets.  Returns (walker, step, node)
    rows including step 0."""
    P = np.int64(max(1, num_partitions))

    def tag_adj(t: "pa.Table") -> "pa.Table":
        s = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"node": pa.array(s), "other": pa.array(d),
                         "kind": pa.array(np.zeros(len(s), dtype=np.int8)),
                         "part": pa.array(s % P)})

    adj = edges.map_batches(tag_adj, batch_format="pyarrow").materialize()

    out = [pd.DataFrame({"walker": walkers.astype(np.int64),
                         "step": np.zeros(len(walkers), dtype=np.int64),
                         "node": walkers.astype(np.int64)})]
    cur = out[0][["walker", "node"]]
    for t in range(1, steps + 1):
        nd = cur["node"].to_numpy(dtype=np.int64)
        pos = pa.table({
            "node": pa.array(nd),
            "other": pa.array(cur["walker"].to_numpy(dtype=np.int64)),
            "kind": pa.array(np.ones(len(nd), dtype=np.int8)),
            "part": pa.array(nd % P),
        })

        def step_group(g: pd.DataFrame, _t=t) -> pd.DataFrame:
            is_w = g["kind"].to_numpy() == 1
            nbr = {u: np.unique(d.to_numpy(dtype=np.int64))
                   for u, d in g[~is_w].groupby("node")["other"]}
            w = g[is_w]
            wk = w["other"].to_numpy(dtype=np.int64)
            at = w["node"].to_numpy(dtype=np.int64)
            nxt = np.full(len(wk), -1, dtype=np.int64)
            for i in range(len(wk)):  # frontier-sized, not corpus-sized
                ns = nbr.get(at[i])
                if ns is not None and len(ns):
                    h = ((wk[i] % 997) * 8191 + _t * 131071
                         + (at[i] % 9973) * 131) % len(ns)
                    nxt[i] = ns[h]
            keep = nxt >= 0
            return pd.DataFrame({"walker": wk[keep], "node": nxt[keep]})

        cur = (adj.union(rd.from_arrow(pos))
               .groupby("part").map_groups(step_group, batch_format="pandas")
               .to_pandas())
        if not len(cur):
            break
        frame = cur.copy()
        frame.insert(1, "step", np.int64(t))
        out.append(frame[["walker", "step", "node"]])
    res = pd.concat(out, ignore_index=True)
    return res.sort_values(["walker", "step"]).reset_index(drop=True)


def personalized_pagerank(edges: rd.Dataset, n_nodes: int,
                          seeds: np.ndarray, *, iters: int = 4,
                          alpha: float = 0.15) -> np.ndarray:
    """Personalized PageRank (random walk with restart to a seed set) —
    the topic-focused variant of :func:`pagerank` used for seed-anchored
    corpus expansion and relevance propagation (Haveliwala 2002):
    p'[v] = alpha * seed[v]/|seeds| + (1-alpha) * sum over in-edges of
    p[u]/outdeg(u), init uniform over seeds.

    Same broadcast-iterate scale shape as :func:`pagerank` (edges
    materialized once, contribution vector rides ``ray.put`` per sweep,
    per-block partial dst-sums are output-sized); unlike global
    PageRank the restart mass never spreads to non-seeds, so fixed
    sweeps replay exactly in the unrolled SQL oracle."""
    if n_nodes > MAX_BROADCAST_NODES:
        raise ValueError(
            f"personalized_pagerank broadcasts an n={n_nodes} score "
            f"vector; exceeds MAX_BROADCAST_NODES={MAX_BROADCAST_NODES} "
            f"— shard the score vector or run the partitioned sibling")
    seeds = np.asarray(seeds, dtype=np.int64)
    edges = edges.materialize()

    od_partials = edges.map_batches(
        lambda df: df.groupby("src", sort=False).size().rename("n").reset_index(),
        batch_format="pandas").to_pandas()
    od_small = od_partials.groupby("src")["n"].sum()
    outdeg = np.zeros(n_nodes, dtype=np.float64)
    outdeg[od_small.index.to_numpy()] = od_small.to_numpy(dtype=np.float64)
    safe_deg = np.where(outdeg > 0, outdeg, 1.0)

    base = np.zeros(n_nodes, dtype=np.float64)
    base[seeds] = alpha / len(seeds)
    p = np.zeros(n_nodes, dtype=np.float64)
    p[seeds] = 1.0 / len(seeds)
    for _ in range(iters):
        contrib_ref = ray.put(p / safe_deg)

        def part(df: pd.DataFrame, _ref=contrib_ref) -> pd.DataFrame:
            contrib = ray.get(_ref)
            s = pd.Series(contrib[df["src"].to_numpy()]).groupby(
                df["dst"].to_numpy()).sum()
            return pd.DataFrame({"dst": s.index.to_numpy(), "s": s.to_numpy()})

        partials = edges.map_batches(part, batch_format="pandas").to_pandas()
        agg = partials.groupby("dst")["s"].sum()
        p = base.copy()
        p[agg.index.to_numpy()] += (1.0 - alpha) * agg.to_numpy()
    return p


def resolve_redirects(edges: rd.Dataset, *, src_col: str = "src",
                      dst_col: str = "dst", num_partitions: int = 64,
                      max_rounds: int = 48) -> rd.Dataset:
    """Redirect-chain resolution to terminal targets via pointer doubling.

    Corpus-level redirect flattening the reference lacks entirely (it
    follows redirects inside each worker thread via the requests session,
    downloader.py:150 — no frontier-wide view): given a functional
    (src, dst) redirect edge set, rewrite every src to the END of its
    chain and report the hop count, in O(log L) rounds for max chain
    length L — never a per-row walk.

    Scale shape (1e10-URL design point): each round is ONE
    hash-partitioned exchange of (src, dst, hops) identities keyed by the
    current dst; the mapping is never broadcast, no dense per-node vector
    exists, so MAX_BROADCAST_NODES does not apply.  Pointer doubling
    composes the mapping with itself, so chains collapse in ceil(log2 L)
    rounds; rows whose dst is not itself a src are terminal and ride the
    exchange unchanged.  Early-stops on the first round with zero
    rewrites (one tiny ``sum`` over a materialized int8 column per
    round).  ``max_rounds`` bounds pathological redirect CYCLES, which
    real crawlers cap the same way (requests' 30-redirect limit the
    reference inherits); a cycle resolves to a deterministic in-cycle
    node after 2**max_rounds composed steps.

    Returns a Dataset (src, dst, hops) with dst = terminal target.
    """
    P = np.int64(num_partitions)

    def init(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "src": df[src_col].to_numpy(dtype=np.int64),
            "dst": df[dst_col].to_numpy(dtype=np.int64),
            "hops": np.ones(len(df), dtype=np.int64),
            "done": np.zeros(len(df), dtype=np.int8),
            "moved": np.zeros(len(df), dtype=np.int8),
        })

    cur = edges.map_batches(init, batch_format="pandas").materialize()

    def fanout(df: pd.DataFrame) -> pd.DataFrame:
        # Every row serves as a BUILD mapping entry keyed by its src
        # (probes pointing AT this node must still learn where it points,
        # even after it froze).  Only NOT-yet-terminal rows also emit a
        # PROBE keyed by their dst: a row that failed to advance once can
        # never advance again (the build key set — the srcs — never
        # changes), so terminal rows ride build-only, halving late-round
        # traffic and skipping their merge work.
        act = df[df["done"] == 0]
        probe = pd.DataFrame({
            "key": act["dst"], "side": np.int8(0), "src": act["src"],
            "dst": act["dst"], "hops": act["hops"],
            "bdst": np.int64(0), "bhops": np.int64(0), "bdone": np.int8(0)})
        build = pd.DataFrame({
            "key": df["src"], "side": np.int8(1), "src": np.int64(0),
            "dst": np.int64(0), "hops": np.int64(0),
            "bdst": df["dst"], "bhops": df["hops"],
            "bdone": df["done"].astype(np.int8)})
        out = pd.concat([probe, build], ignore_index=True)
        out["part"] = (out["key"].to_numpy(dtype=np.int64) % P).astype(np.int32)
        return out

    def advance(g: pd.DataFrame) -> pd.DataFrame:
        # frozen rows reconstruct from their build entry (each original
        # row appears exactly once on the build side, so no duplication)
        fz = g[(g["side"] == 1) & (g["bdone"] == 1)]
        frozen = pd.DataFrame({
            "src": fz["key"], "dst": fz["bdst"], "hops": fz["bhops"],
            "done": np.int8(1), "moved": np.int8(0)})
        p = g[g["side"] == 0]
        if not len(p):
            return frozen
        b = g.loc[g["side"] == 1, ["key", "bdst", "bhops"]]
        m = p[["key", "src", "dst", "hops"]].merge(b, on="key", how="left")
        hit = m["bdst"].notna().to_numpy()
        dst = np.where(hit, m["bdst"].fillna(0).to_numpy(dtype=np.int64),
                       m["dst"].to_numpy(dtype=np.int64))
        hops = m["hops"].to_numpy(dtype=np.int64) + np.where(
            hit, m["bhops"].fillna(0).to_numpy(dtype=np.int64), 0)
        adv = pd.DataFrame({"src": m["src"], "dst": dst, "hops": hops,
                            "done": (~hit).astype(np.int8),
                            "moved": hit.astype(np.int8)})
        return pd.concat([adv, frozen], ignore_index=True)

    for _ in range(max_rounds):
        cur = (cur.map_batches(fanout, batch_format="pandas")
               .groupby("part").map_groups(advance, batch_format="pandas")
               .materialize())
        if int(cur.sum("moved") or 0) == 0:
            break
    return cur.drop_columns(["done", "moved"])


def neighborhood_jaccard_pairs(edges: rd.Dataset, n_nodes: int, *,
                               max_deg: int = 64, threshold: float = 0.3,
                               num_partitions: int = 64) -> pd.DataFrame:
    """Structural-equivalence pairs: Jaccard similarity of neighbor SETS,
    J(a, b) = |N(a) ∩ N(b)| / |N(a) ∪ N(b)|, for every node pair sharing
    at least one neighbor (Lorrain & White 1971 structural equivalence;
    the mirror/doorway-page signal a crawl scheduler uses — two URLs
    whose outlink sets coincide are almost surely the same page).

    Scale shape: shared-neighbor counting is the triangle/adamic-adar
    wedge expansion — adjacency bucketed by ``w % P`` so each neighbor
    run lands whole, repeat/offset pair emission, runs capped at
    ``max_deg`` (a 1e6-degree hub emits 1e12 wedges and is never a
    mirror candidate).  Exact degrees fall out of the SAME bucketed pass
    (a node's full adjacency shares its bucket), so the union size needs
    no extra adjacency scan; degrees then attach to the pair table via
    two hash-bucketed joins keyed by each endpoint — every stage past
    the wedge pass is PAIR-set-sized, nothing is broadcast, and the
    endpoint cap bounds the join fan-in.  Packed int64 keys require
    n_nodes < 3e9."""
    n = np.int64(n_nodes)
    P = np.int64(num_partitions)
    und = _canonical_undirected(edges, n, P).materialize()

    def adj_rows(df: pd.DataFrame) -> pd.DataFrame:
        a = df["a"].to_numpy(dtype=np.int64)
        b = df["b"].to_numpy(dtype=np.int64)
        w = np.concatenate([a, b])
        v = np.concatenate([b, a])
        return pd.DataFrame({"w": w, "v": v, "part": w % P})

    def wedge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        o = np.lexsort((g["v"].to_numpy(dtype=np.int64),
                        g["w"].to_numpy(dtype=np.int64)))
        w = g["w"].to_numpy(dtype=np.int64)[o]
        v = g["v"].to_numpy(dtype=np.int64)[o]
        run_start = np.nonzero(np.concatenate([[True], w[1:] != w[:-1]]))[0]
        run_len = np.diff(np.append(run_start, len(w)))
        # kind=1 rows: exact degree per node (full adjacency is in-bucket)
        deg = pd.DataFrame({"kind": np.int8(1), "key": w[run_start],
                            "d": run_len.astype(np.int64)})
        elem_len = np.repeat(run_len, run_len)
        run_end = np.repeat(run_start + run_len, run_len)
        k = np.where((elem_len >= 2) & (elem_len <= max_deg),
                     run_end - np.arange(len(w)) - 1, 0)
        total = int(k.sum())
        if not total:
            return deg
        idx_i = np.repeat(np.arange(len(w)), k)
        off = np.arange(total) - np.repeat(np.cumsum(k) - k, k) + 1
        idx_j = idx_i + off
        pairs = pd.DataFrame({"kind": np.int8(0),
                              "key": v[idx_i] * n + v[idx_j],
                              "d": np.ones(total, dtype=np.int64)})
        return pd.concat([pairs, deg], ignore_index=True)

    mixed = (und.map_batches(adj_rows, batch_format="pandas")
             .groupby("part").map_groups(wedge_bucket, batch_format="pandas")
             .materialize())
    degs = mixed.map_batches(
        lambda df: df[df["kind"] == 1][["key", "d"]]
        .rename(columns={"key": "node"}), batch_format="pandas")

    def common_bucket(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("key")["d"].sum()
        key = s.index.to_numpy(dtype=np.int64)
        return pd.DataFrame({"a": key // n, "b": key % n,
                             "common": s.to_numpy(dtype=np.int64)})

    common = (mixed.map_batches(
        lambda df: df[df["kind"] == 0].assign(
            part=(df.loc[df["kind"] == 0, "key"].to_numpy(dtype=np.int64) % P)
            .astype(np.int32)), batch_format="pandas")
        .groupby("part").map_groups(common_bucket, batch_format="pandas"))

    def attach(endpoint: str, deg_name: str):
        def merge(g: pd.DataFrame) -> pd.DataFrame:
            p = g[g["side"] == 0].drop(columns=["side", "node", "d", "part"])
            b = g.loc[g["side"] == 1, ["node", "d"]]
            m = p.merge(b, left_on=endpoint, right_on="node", how="inner")
            m = m[m["d"] <= max_deg].drop(columns=["node"])
            return m.rename(columns={"d": deg_name})
        return merge

    def tag_pairs(col, extra):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            out = df.copy()
            out["side"] = np.int8(0)
            out["node"] = np.int64(0)
            out["d"] = np.int64(0)
            out["part"] = (out[col].to_numpy(dtype=np.int64) % P).astype(np.int32)
            return out[["a", "b", "common", *extra, "side", "node", "d", "part"]]
        return fn

    def tag_degs(extra):
        # schemas of the two union sides MUST match exactly — Ray
        # null-fills missing columns, silently floatifying the int keys
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            out = df.copy()
            z = np.zeros(len(df), dtype=np.int64)
            out["a"], out["b"], out["common"] = z, z, z
            for c in extra:
                out[c] = z
            out["side"] = np.int8(1)
            out["part"] = (out["node"].to_numpy(dtype=np.int64) % P).astype(np.int32)
            return out[["a", "b", "common", *extra, "side", "node", "d", "part"]]
        return fn

    with_da = (common.map_batches(tag_pairs("a", []), batch_format="pandas")
               .union(degs.map_batches(tag_degs([]), batch_format="pandas"))
               .groupby("part").map_groups(attach("a", "da"),
                                           batch_format="pandas"))
    with_db = (with_da.map_batches(tag_pairs("b", ["da"]), batch_format="pandas")
               .union(degs.map_batches(tag_degs(["da"]), batch_format="pandas"))
               .groupby("part").map_groups(attach("b", "db"),
                                           batch_format="pandas"))
    out = with_db.to_pandas()
    if not len(out):
        return pd.DataFrame({"a": np.array([], dtype=np.int64),
                             "b": np.array([], dtype=np.int64),
                             "jaccard": np.array([], dtype=np.float64)})
    union = (out["da"] + out["db"] - out["common"]).to_numpy(dtype=np.float64)
    out["jaccard"] = np.round(out["common"].to_numpy(dtype=np.float64) / union, 6)
    out = out[out["jaccard"] >= threshold][["a", "b", "jaccard"]]
    return out.sort_values(["a", "b"]).reset_index(drop=True)
