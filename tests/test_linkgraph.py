"""Link-graph operators (stages/linkgraph.py) vs an independent
pure-numpy reference on the same deterministic edge derivation."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from icrawler_ray.stages.linkgraph import degree_table, derive_edges, pagerank


def _ref_edges(n):
    rows = []
    for i in range(n):
        for j in range(1, 2 + i % 4):
            d = (i * 131 + j * 97) % n
            if d != i:
                rows.append((i, d))
    return np.array(rows, dtype=np.int64)


@pytest.fixture(scope="module")
def graph():
    n = 97  # prime, != the testdata sizes, exercises the modulus
    docs = rd.from_pandas(pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64)}))
    return n, docs.repartition(5), _ref_edges(n)


def test_derive_edges_matches_reference(graph):
    n, docs, ref = graph
    got = derive_edges(docs, n).to_pandas().sort_values(["src", "dst"])
    np.testing.assert_array_equal(got.to_numpy(), ref[np.lexsort((ref[:, 1], ref[:, 0]))])


def test_degree_table_matches_reference_and_zero_fills(graph):
    n, docs, ref = graph
    deg = degree_table(derive_edges(docs, n), docs)
    assert deg["node"].tolist() == list(range(n))
    np.testing.assert_array_equal(
        deg["out_deg"].to_numpy(), np.bincount(ref[:, 0], minlength=n))
    np.testing.assert_array_equal(
        deg["in_deg"].to_numpy(), np.bincount(ref[:, 1], minlength=n))


def test_pagerank_matches_numpy_power_iteration(graph):
    n, docs, ref = graph
    got = pagerank(derive_edges(docs, n), n, iters=5, damping=0.85)

    outdeg = np.bincount(ref[:, 0], minlength=n).astype(float)
    r = np.full(n, 1.0 / n)
    for _ in range(5):
        contrib = r / np.where(outdeg > 0, outdeg, 1.0)
        r = np.full(n, 0.15 / n)
        np.add.at(r, ref[:, 1], 0.85 * contrib[ref[:, 0]])
    np.testing.assert_allclose(got, r, rtol=1e-12)
    # at n=97 node 0's only edge is a dropped self-loop => it dangles and
    # leaks mass each sweep (identically in engine, numpy, and the SQL
    # oracle); the engine must agree with the reference's total exactly
    assert outdeg[0] == 0 and got.sum() < 1.0
    np.testing.assert_allclose(got.sum(), r.sum(), rtol=1e-12)


def test_connected_components_match_union_find(graph):
    from icrawler_ray.stages.linkgraph import connected_components

    n, docs, ref = graph
    got = connected_components(derive_edges(docs, n), n, iters=64)

    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, d in ref:
        parent[find(int(s))] = find(int(d))
    # canonical label = min node id per component
    comp_min = {}
    for v in range(n):
        r = find(v)
        comp_min[r] = min(comp_min.get(r, v), v)
    expect = np.array([comp_min[find(v)] for v in range(n)], dtype=np.int64)
    np.testing.assert_array_equal(got, expect)


def test_sequence_pack_prefix_sum_matches_numpy():
    """Distributed exclusive prefix sum (token tape) == numpy cumsum, at
    any block split; packing assignment is floor(tok_start / L)."""
    from icrawler_ray.queries import PACK_SEQ_LEN, q_sequence_pack

    sf = "/root/testdata/sf0.001"
    out = q_sequence_pack(sf)
    import pyarrow.parquet as pq
    docs = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"]) \
        .to_pandas().sort_values("doc_id")
    ntok = docs["text"].str.count(" ").to_numpy(dtype=np.int64) + 1
    starts = np.concatenate([[0], np.cumsum(ntok)[:-1]])
    np.testing.assert_array_equal(out["n_tokens"].to_numpy(), ntok)
    np.testing.assert_array_equal(out["tok_start"].to_numpy(), starts)
    np.testing.assert_array_equal(out["seq_id"].to_numpy(), starts // PACK_SEQ_LEN)
    # seq_ids are dense-ish and monotone with doc order
    assert (np.diff(out["seq_id"].to_numpy()) >= 0).all()


def test_cumsum_property_random_splits_and_weights():
    """assign_global_cumsum == numpy exclusive cumsum for random weights
    at random block splits (hypothesis-style sweep, fixed seeds)."""
    from icrawler_ray.functions.seq import assign_global_cumsum, from_table_blocks
    import pyarrow as pa

    rng = np.random.default_rng(7)
    for trial in range(4):
        n = int(rng.integers(1, 400))
        w = rng.integers(0, 1000, n).astype(np.int64)
        ids = rng.permutation(n).astype(np.int64)
        t = pa.table({"k": ids, "w": w})
        ds = from_table_blocks(t, min_rows_per_block=int(rng.integers(1, 50)))
        out = assign_global_cumsum(ds, ["k"], "w", col="start").to_pandas() \
            .sort_values("k").reset_index(drop=True)
        order = np.argsort(ids, kind="stable")
        expect = np.concatenate([[0], np.cumsum(w[order])[:-1]])
        np.testing.assert_array_equal(out["start"].to_numpy(), expect)


def test_running_max_property_random_splits():
    """assign_global_running_max == numpy exclusive running max at random
    block splits; the globally first row sees the sentinel."""
    from icrawler_ray.functions.seq import (
        RUNMAX_SENTINEL, assign_global_running_max, from_table_blocks)
    import pyarrow as pa

    rng = np.random.default_rng(11)
    for trial in range(4):
        n = int(rng.integers(1, 400))
        v = rng.integers(-10**6, 10**6, n).astype(np.int64)
        ids = rng.permutation(n).astype(np.int64)
        t = pa.table({"k": ids, "v": v})
        ds = from_table_blocks(t, min_rows_per_block=int(rng.integers(1, 50)))
        out = assign_global_running_max(ds, ["k"], "v", col="wm").to_pandas() \
            .sort_values("k").reset_index(drop=True)
        order = np.argsort(ids, kind="stable")
        run = np.maximum.accumulate(v[order])
        expect = np.concatenate([[RUNMAX_SENTINEL], run[:-1]])
        np.testing.assert_array_equal(out["wm"].to_numpy(), expect)


def test_connected_components_random_graphs_vs_union_find():
    """CC on random sparse graphs equals union-find (iters high enough to
    converge on these sizes)."""
    from icrawler_ray.stages.linkgraph import connected_components

    rng = np.random.default_rng(11)
    for trial in range(3):
        n = int(rng.integers(10, 120))
        m = int(rng.integers(0, n))
        e = rng.integers(0, n, size=(m, 2)).astype(np.int64)
        e = e[e[:, 0] != e[:, 1]]
        edges = rd.from_pandas(pd.DataFrame({"src": e[:, 0], "dst": e[:, 1]}))
        got = connected_components(edges.repartition(3), n, iters=n)

        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for s, d in e:
            parent[find(int(s))] = find(int(d))
        comp_min = {}
        for v in range(n):
            r = find(v)
            comp_min[r] = min(comp_min.get(r, v), v)
        expect = np.array([comp_min[find(v)] for v in range(n)], dtype=np.int64)
        np.testing.assert_array_equal(got, expect)


def test_stratified_sample_gate_and_weights_sum():
    from icrawler_ray.queries import (STRATA_RATES, q_mixture_weights,
                                      q_stratified_sample)

    sf = "/root/testdata/sf0.001"
    samp = q_stratified_sample(sf)
    rates = samp["lang"].map(STRATA_RATES).to_numpy()
    assert ((samp["doc_id"].to_numpy() % 100) < rates).all()

    mix = q_mixture_weights(sf)
    assert abs(mix["weight"].sum() - 1.0) < 1e-4
    assert (mix["n_tokens"] > 0).all()


def _uf_sparse(edges):
    """Sparse union-find reference: {node: min-id component label} for
    nodes appearing in >=1 edge."""
    parent = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for s, d in edges:
        rs, rd_ = find(int(s)), find(int(d))
        if rs != rd_:
            parent[max(rs, rd_)] = min(rs, rd_)
    nodes = sorted({int(x) for e in edges for x in e})
    return {v: find(v) for v in nodes}


def test_pairs_components_random_graphs_vs_union_find():
    from icrawler_ray.stages.linkgraph import pairs_components

    rng = np.random.default_rng(23)
    for trial in range(4):
        n = int(rng.integers(10, 200))
        m = int(rng.integers(1, 2 * n))
        e = rng.integers(0, n, size=(m, 2)).astype(np.int64)
        e = e[e[:, 0] != e[:, 1]]
        if not len(e):
            continue
        ds = rd.from_pandas(pd.DataFrame({"src": e[:, 0], "dst": e[:, 1]})) \
            .repartition(4)
        got = pairs_components(ds)
        ref = _uf_sparse(e.tolist())
        assert got["node"].tolist() == sorted(ref)
        assert dict(zip(got["node"], got["component"])) == ref


def test_pairs_components_long_chain_multiround_distributed():
    """Planted cluster with diameter >> any sweep budget: a 5000-node
    chain (plus scattered singleton pairs) must collapse to ONE
    component labelled by its min node — with driver_edge_budget forced
    tiny so several distributed contraction+merge rounds actually run.
    This is the doc-scale case the broadcast variant cannot serve."""
    from icrawler_ray.stages.linkgraph import pairs_components

    chain = np.arange(5000, dtype=np.int64)
    e = np.stack([chain[:-1], chain[1:]], axis=1)
    extra = np.array([[90001, 90002], [90003, 90004]], dtype=np.int64)
    e = np.concatenate([e, extra])
    ds = rd.from_pandas(pd.DataFrame({"src": e[:, 0], "dst": e[:, 1]})) \
        .repartition(16)
    got = pairs_components(ds, driver_edge_budget=100, max_rounds=12)
    lab = dict(zip(got["node"], got["component"]))
    assert all(lab[int(v)] == 0 for v in chain)
    assert lab[90002] == 90001 and lab[90004] == 90003
    assert len(got) == 5004


def test_pairs_components_sparse_ids_no_dense_array():
    """Node ids near 1e15 — any O(n_nodes) dense allocation would be
    impossible; the sparse path must handle them untouched."""
    from icrawler_ray.stages.linkgraph import pairs_components

    base = 10**15
    e = np.array([[base + 7, base + 3], [base + 3, base + 11],
                  [base + 100, base + 200]], dtype=np.int64)
    ds = rd.from_pandas(pd.DataFrame({"src": e[:, 0], "dst": e[:, 1]}))
    got = pairs_components(ds)
    lab = dict(zip(got["node"], got["component"]))
    assert lab == {base + 3: base + 3, base + 7: base + 3, base + 11: base + 3,
                   base + 100: base + 100, base + 200: base + 100}


def test_connected_components_refuses_doc_scale():
    """The broadcast variant asserts its host-scale boundary instead of
    silently allocating an 80 GB label vector."""
    from icrawler_ray.stages.linkgraph import (MAX_BROADCAST_NODES,
                                               connected_components)

    edges = rd.from_pandas(pd.DataFrame({"src": [0], "dst": [1]}))
    with pytest.raises(ValueError, match="pairs_components"):
        connected_components(edges, MAX_BROADCAST_NODES + 1)


def test_tfidf_partitioned_join_matches_broadcast():
    """Forcing broadcast_df_limit=0 routes TF-IDF through the
    hash-partitioned score join; output must equal the broadcast path
    row-for-row (same ranking, same rounded scores)."""
    import ray.data as rdata
    from icrawler_ray.queries import _read, tfidf_top_terms

    sf = "/root/testdata/sf0.001"
    docs = _read(sf, "documents", ["doc_id", "text"])
    n = docs.count()
    broad = tfidf_top_terms(docs, n)
    part = tfidf_top_terms(docs, n, broadcast_df_limit=0, score_partitions=7)
    pd.testing.assert_frame_equal(broad, part)


def test_pagerank_partitioned_matches_broadcast(graph):
    """The shuffle-variant PageRank (rank as hash-partitioned rows, no
    dense driver vector) must equal the broadcast variant sweep-for-sweep
    on the same graph — the doc-scale path vs the host-scale path."""
    from icrawler_ray.stages.linkgraph import pagerank, pagerank_partitioned

    n, docs, ref = graph
    broad = pagerank(derive_edges(docs, n), n, iters=4, damping=0.85)
    part = pagerank_partitioned(derive_edges(docs, n), n, iters=4,
                                damping=0.85, num_partitions=5)
    assert part["node"].tolist() == list(range(n))
    np.testing.assert_allclose(part["rank"].to_numpy(), broad, rtol=1e-9)


def test_triangle_counts_planted_cliques_and_chain():
    """Planted graph with known triangle census: a K4 (every node in 3
    triangles), a separate K3 (1 each), a chain (0), an isolated node,
    plus duplicate/reversed/self-loop edge noise that canonicalization
    must absorb."""
    from icrawler_ray.stages.linkgraph import triangle_counts

    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    k3 = [(4, 5), (5, 6), (4, 6)]
    chain = [(7, 8), (8, 9), (9, 10)]
    noise = [(1, 0), (2, 0), (5, 4), (7, 7), (8, 7)]  # dups/reversals/self
    edges = pd.DataFrame(k4 + k3 + chain + noise, columns=["src", "dst"])
    n = 12  # node 11 isolated
    out = triangle_counts(rd.from_pandas(edges).repartition(4), n)
    assert out["node"].tolist() == list(range(n))
    assert out["tri"].tolist() == [3, 3, 3, 3, 1, 1, 1, 0, 0, 0, 0, 0]


def test_triangle_counts_matches_bruteforce_on_derived_graph(graph):
    """Degree-ordered distributed count == O(n^3) brute force over the
    canonical undirected derived graph."""
    from icrawler_ray.stages.linkgraph import derive_edges, triangle_counts

    n, docs, ref = graph
    adj = np.zeros((n, n), dtype=bool)
    adj[ref[:, 0], ref[:, 1]] = True
    adj = adj | adj.T
    np.fill_diagonal(adj, False)
    expect = np.zeros(n, dtype=np.int64)
    for a in range(n):
        for b in range(a + 1, n):
            if not adj[a, b]:
                continue
            for c in range(b + 1, n):
                if adj[a, c] and adj[b, c]:
                    expect[[a, b, c]] += 1
    out = triangle_counts(derive_edges(docs, n), n)
    np.testing.assert_array_equal(out["tri"].to_numpy(), expect)


def test_hits_matches_numpy_reference(graph):
    from icrawler_ray.stages.linkgraph import derive_edges, hits

    n, docs, ref = graph
    A = np.zeros((n, n))
    np.add.at(A, (ref[:, 0], ref[:, 1]), 1.0)  # multigraph edge weights
    hub = np.ones(n)
    for _ in range(3):
        auth = A.T @ hub
        auth /= np.linalg.norm(auth)
        hub = A @ auth
        hub /= np.linalg.norm(hub)
    out = hits(derive_edges(docs, n), n, iters=3)
    np.testing.assert_allclose(out["hub"].to_numpy(), hub, rtol=1e-9)
    np.testing.assert_allclose(out["auth"].to_numpy(), auth, rtol=1e-9)


def test_kcore_planted_and_bruteforce(graph):
    from icrawler_ray.stages.linkgraph import derive_edges, kcore_membership

    # planted: K4 survives 2-core peeling, pendant chain dissolves
    k4 = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
    chain = [(3, 4), (4, 5), (5, 6)]
    edges = pd.DataFrame(k4 + chain, columns=["src", "dst"])
    out = kcore_membership(rd.from_pandas(edges).repartition(3), 8,
                           k=2, sweeps=4)
    assert out["in_core"].tolist() == [1, 1, 1, 1, 0, 0, 0, 0]

    # fixed-sweep parity vs a numpy peeling reference on the fixture graph
    n, docs, ref = graph
    adj = np.zeros((n, n), dtype=bool)
    adj[ref[:, 0], ref[:, 1]] = True
    adj = adj | adj.T
    np.fill_diagonal(adj, False)
    alive = np.ones(n, dtype=bool)
    for _ in range(3):
        deg = (adj & alive[None, :] & alive[:, None]).sum(axis=1)
        alive = alive & (deg >= 2)
    got = kcore_membership(derive_edges(docs, n), n, k=2, sweeps=3)
    np.testing.assert_array_equal(got["in_core"].to_numpy(),
                                  alive.astype(np.int64))


def test_triangle_counts_partitioned_matches_broadcast(graph):
    """deg_mode='partitioned' (no dense degree vector, bucketed-join
    degree attach) must equal the broadcast path exactly."""
    from icrawler_ray.stages.linkgraph import derive_edges, triangle_counts

    n, docs, ref = graph
    broad = triangle_counts(derive_edges(docs, n), n)
    part = triangle_counts(derive_edges(docs, n), n, deg_mode="partitioned")
    pd.testing.assert_frame_equal(part, broad)


def test_hits_partitioned_matches_broadcast(graph):
    """The shuffle-variant HITS (scores as hash-partitioned rows, no
    dense driver vector) must equal the broadcast variant
    sweep-for-sweep — the doc-scale path vs the host-scale path."""
    from icrawler_ray.stages.linkgraph import derive_edges, hits, hits_partitioned

    n, docs, ref = graph
    broad = hits(derive_edges(docs, n), n, iters=2)
    part = hits_partitioned(derive_edges(docs, n), n, iters=2,
                            num_partitions=5)
    assert part["node"].tolist() == list(range(n))
    np.testing.assert_allclose(part["hub"].to_numpy(),
                               broad["hub"].to_numpy(), rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(part["auth"].to_numpy(),
                               broad["auth"].to_numpy(), rtol=1e-9, atol=1e-12)


def test_kcore_partitioned_matches_broadcast(graph):
    from icrawler_ray.stages.linkgraph import (derive_edges, kcore_membership,
                                               kcore_membership_partitioned)

    n, docs, ref = graph
    broad = kcore_membership(derive_edges(docs, n), n, k=2, sweeps=3)
    part = kcore_membership_partitioned(derive_edges(docs, n), n, k=2,
                                        sweeps=3, num_partitions=5)
    pd.testing.assert_frame_equal(part, broad)


def test_partitioned_variants_sparse_output(graph):
    """dense_output=False (the only shape allowed past the dense-vector
    ceiling) must agree with the dense finish on its nonzero rows."""
    from icrawler_ray.stages.linkgraph import (
        derive_edges, hits_partitioned, kcore_membership_partitioned,
        triangle_counts)

    n, docs, ref = graph
    dense = triangle_counts(derive_edges(docs, n), n)
    sparse = triangle_counts(derive_edges(docs, n), n,
                             deg_mode="partitioned", dense_output=False)
    nz = dense[dense["tri"] > 0].reset_index(drop=True)
    pd.testing.assert_frame_equal(sparse, nz)

    hd = hits_partitioned(derive_edges(docs, n), n, iters=2,
                          num_partitions=5)
    hs = hits_partitioned(derive_edges(docs, n), n, iters=2,
                          num_partitions=5, dense_output=False)
    sub = hd[hd["node"].isin(hs["node"])].reset_index(drop=True)
    pd.testing.assert_frame_equal(hs, sub)

    kd = kcore_membership_partitioned(derive_edges(docs, n), n, k=2,
                                      sweeps=3, num_partitions=5)
    ks = kcore_membership_partitioned(derive_edges(docs, n), n, k=2,
                                      sweeps=3, num_partitions=5,
                                      dense_output=False)
    nz = kd[kd["in_core"] == 1].reset_index(drop=True)
    pd.testing.assert_frame_equal(ks, nz)
