"""Round-5 operator tests: the four new IN-window queries (which the
below-window oracle sweep does not cover) pinned against their DuckDB
oracles at sf0.001, brute-force parity for the new graph operators, the
water-filling invariants, and the empty-block guard in the seq.py
metadata stitches.
"""

from __future__ import annotations

import os.path as osp

import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()

R5_WINDOW_NAMES = ["gopher_rules", "word_entropy", "adamic_adar",
                   "host_budget", "jsonl_roundtrip", "coreset_kcenter"]


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df.columns = [c.lower() for c in df.columns]
    df = df[sorted(df.columns)]
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        if str(df[c].dtype).startswith(("uint", "int", "Int")):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def _to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(obj, ray.data.Dataset):
        return obj.to_pandas()
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj


@pytest.mark.skipif(not osp.isdir(SF_DIR), reason="driver testdata absent")
@pytest.mark.parametrize("name", R5_WINDOW_NAMES)
def test_r5_window_query_matches_oracle(ray_session, name):
    import duckdb

    from icrawler_ray.queries import ORACLE_SQL, QUERIES

    got = _normalize(_to_pandas(QUERIES[name](SF_DIR)))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')")
    want = _normalize(con.execute(ORACLE_SQL[name]).df())
    con.close()
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  check_exact=False, rtol=0, atol=1e-6)


def _brute_adamic_adar(edges: list[tuple[int, int]], max_deg: int = 64,
                       top_k: int = 100) -> pd.DataFrame:
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    adj: dict[int, set] = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    scores: dict[tuple[int, int], float] = {}
    for w, nbrs in adj.items():
        if not (2 <= len(nbrs) <= max_deg):
            continue
        ns = sorted(nbrs)
        for i in range(len(ns)):
            for j in range(i + 1, len(ns)):
                p = (ns[i], ns[j])
                scores[p] = scores.get(p, 0.0) + 1.0 / np.log(len(ns))
    rows = [(a, b, round(s, 6)) for (a, b), s in scores.items()
            if (a, b) not in und]
    rows.sort(key=lambda r: (-r[2], r[0], r[1]))
    return pd.DataFrame(rows[:top_k], columns=["a", "b", "score"])


def test_adamic_adar_matches_bruteforce(ray_session):
    import ray.data as rd

    from icrawler_ray.stages.linkgraph import adamic_adar_pairs

    rng = np.random.default_rng(11)
    n = 60
    src = rng.integers(0, n, 300)
    dst = rng.integers(0, n, 300)
    keep = src != dst
    edges = rd.from_pandas(pd.DataFrame({"src": src[keep], "dst": dst[keep]}))
    got = adamic_adar_pairs(edges, n).reset_index(drop=True)
    want = _brute_adamic_adar(list(zip(src[keep].tolist(), dst[keep].tolist())))
    pd.testing.assert_frame_equal(
        got, want, check_dtype=False, check_exact=False, rtol=0, atol=1e-6)


def test_adamic_adar_hub_cap_excludes_hot_intermediate(ray_session):
    import ray.data as rd

    from icrawler_ray.stages.linkgraph import adamic_adar_pairs

    # star around node 0 (degree 10) plus one shared-neighbor pair via 20
    rows = [(0, i) for i in range(1, 11)] + [(20, 30), (20, 31)]
    edges = rd.from_pandas(pd.DataFrame(rows, columns=["src", "dst"]))
    got = adamic_adar_pairs(edges, 40, max_deg=5)
    # the star's 45 leaf pairs are dropped (hub deg 10 > cap 5); only the
    # (30, 31) pair through intermediate 20 (deg 2) survives
    assert got[["a", "b"]].values.tolist() == [[30, 31]]
    assert got["score"].iloc[0] == round(1.0 / np.log(2.0), 6)


def test_local_clustering_triangle_plus_tail(ray_session):
    import ray.data as rd

    from icrawler_ray.stages.linkgraph import local_clustering

    # triangle 0-1-2 with a tail 2-3
    edges = rd.from_pandas(pd.DataFrame(
        [(0, 1), (1, 2), (0, 2), (2, 3)], columns=["src", "dst"]))
    out = local_clustering(edges, 4).set_index("node")
    assert out.loc[0, "coeff"] == 1.0 and out.loc[1, "coeff"] == 1.0
    # node 2: deg 3, one triangle -> 2*1/(3*2)
    assert out.loc[2, "coeff"] == round(1.0 / 3.0, 6)
    assert out.loc[3, "coeff"] == 0.0  # deg 1: well-defined zero


def test_host_budget_waterfill_invariants(ray_session):
    from icrawler_ray.queries import q_host_budget

    out = _to_pandas(q_host_budget(SF_DIR)) if osp.isdir(SF_DIR) else None
    if out is None:
        pytest.skip("driver testdata absent")
    tot = int(out["n"].sum())
    B = tot // 10
    # budget exactly exhausted (binding case), nobody above demand,
    # capped hosts share one water level
    assert abs(out["alloc"].sum() - min(B, tot)) < 1e-3
    assert (out["alloc"] <= out["n"] + 1e-9).all()
    capped = out[out["alloc"] < out["n"] - 1e-9]
    if len(capped) > 1:
        assert capped["alloc"].nunique() == 1


def test_seq_stitches_skip_empty_blocks(ray_session):
    import ray.data as rd

    from icrawler_ray.functions.seq import (assign_global_cumsum,
                                            assign_global_seq)

    # filter leaves zero-row blocks behind; the metadata stitches must
    # skip them (they can carry an empty schema) and stay correct
    base = rd.range(100).map_batches(
        lambda df: df.rename(columns={"id": "n"}), batch_format="pandas")
    sparse = base.filter(lambda r: r["n"] % 10 == 0)
    got = assign_global_cumsum(sparse, ["n"], "n", col="cumb").to_pandas()
    want = np.concatenate([[0], np.cumsum(np.arange(0, 100, 10))[:-1]])
    assert got.sort_values("n")["cumb"].tolist() == want.tolist()
    got2 = assign_global_seq(sparse, ["n"], col="seq").to_pandas()
    assert got2.sort_values("n")["seq"].tolist() == list(range(10))


def test_containment_join_finds_subset_doc(ray_session):
    import ray.data as rd

    from icrawler_ray.stages.dedup import containment_join_pairs

    rng = np.random.default_rng(3)
    vocab = [f"tok{i}" for i in range(2000)]
    long_words = [vocab[i] for i in rng.integers(0, 2000, 120)]
    rows = [
        {"doc_id": 1, "text": " ".join(long_words)},
        # doc 2: a 20-word excerpt of doc 1 -> containment 1.0 but
        # jaccard ~ 0.15 (the case jaccard-threshold LSH misses)
        {"doc_id": 2, "text": " ".join(long_words[40:60])},
        {"doc_id": 3, "text": " ".join(
            vocab[i] for i in rng.integers(0, 2000, 80))},
    ]
    ds = rd.from_pandas(pd.DataFrame(rows))
    out = containment_join_pairs(ds, threshold=0.8)
    got = set(zip(out["a"], out["b"]))
    assert (2, 1) in got  # excerpt contained in source (ordered)
    assert (1, 2) not in got  # source NOT contained in excerpt
    assert not any(3 in p for p in got)
    c = out.set_index(["a", "b"]).loc[(2, 1), "containment"]
    assert c == 1.0


def test_containment_join_threshold_excludes_partial(ray_session):
    import ray.data as rd

    from icrawler_ray.stages.dedup import containment_join_pairs

    # doc 2 shares only half its shingles with doc 1 -> below 0.8
    base = [f"w{i}" for i in range(40)]
    other = [f"z{i}" for i in range(20)]
    rows = [
        {"doc_id": 1, "text": " ".join(base)},
        {"doc_id": 2, "text": " ".join(base[:20] + other)},
    ]
    ds = rd.from_pandas(pd.DataFrame(rows))
    out = containment_join_pairs(ds, threshold=0.8)
    assert len(out) == 0


def _brute_bfs(edges, n, seed, max_d):
    import collections

    adj = collections.defaultdict(list)
    for s, d in edges:
        adj[s].append(d)
    dep = {seed: 0}
    q = collections.deque([seed])
    while q:
        u = q.popleft()
        if dep[u] >= max_d:
            continue
        for v in adj[u]:
            if v not in dep:
                dep[v] = dep[u] + 1
                q.append(v)
    return dep


def test_seed_depths_matches_bruteforce_bfs(ray_session):
    import ray.data as rd

    from icrawler_ray.stages.linkgraph import seed_depths

    rng = np.random.default_rng(7)
    n = 50
    e = np.unique(rng.integers(0, n, (220, 2)), axis=0)
    e = e[e[:, 0] != e[:, 1]]
    edges = rd.from_pandas(pd.DataFrame({"src": e[:, 0], "dst": e[:, 1]}))
    seeds = np.array([0, 17, 33], dtype=np.int64)
    got = seed_depths(edges, n, seeds, iters=4)
    got = {(int(r.seed), int(r.node)): int(r.dep)
           for r in got.itertuples()}
    pairs = list(zip(e[:, 0].tolist(), e[:, 1].tolist()))
    want = {(int(s), v): d for s in seeds
            for v, d in _brute_bfs(pairs, n, int(s), 4).items()}
    assert got == want


def test_harmonic_centrality_matches_bruteforce(ray_session):
    import ray.data as rd

    from icrawler_ray.stages.linkgraph import harmonic_centrality

    rng = np.random.default_rng(13)
    n = 40
    e = np.unique(rng.integers(0, n, (160, 2)), axis=0)
    e = e[e[:, 0] != e[:, 1]]
    edges = rd.from_pandas(pd.DataFrame({"src": e[:, 0], "dst": e[:, 1]}))
    seeds = np.array([1, 9, 25], dtype=np.int64)
    got = harmonic_centrality(edges, n, seeds, iters=4, topk=10)
    pairs = list(zip(e[:, 0].tolist(), e[:, 1].tolist()))
    hc, nr = {}, {}
    for s in seeds:
        for v, d in sorted(_brute_bfs(pairs, n, int(s), 4).items()):
            if d > 0:
                hc[v] = hc.get(v, 0.0) + 1.0 / d
                nr[v] = nr.get(v, 0) + 1
    want = sorted(((round(h, 6), v) for v, h in hc.items()),
                  key=lambda t: (-t[0], t[1]))[:10]
    assert [(row.hc, row.node) for row in got.itertuples()] == want
    assert all(int(got.set_index("node").loc[v, "n_reached"]) == nr[v]
               for _, v in want)
    assert got["rank"].tolist() == list(range(1, len(want) + 1))


def test_random_walks_follows_hash_rule_and_halts_at_sinks(ray_session):
    import ray.data as rd

    from icrawler_ray.stages.linkgraph import random_walks

    # 0 -> {1, 2}, 1 -> {3}, 2 -> {}, 3 -> {0}; duplicate edge 0->1 must
    # not change the distinct-neighbour fanout
    edges = rd.from_pandas(pd.DataFrame(
        [(0, 1), (0, 2), (0, 1), (1, 3), (3, 0)], columns=["src", "dst"]))
    walkers = np.array([0, 2], dtype=np.int64)
    got = random_walks(edges, walkers, steps=3, num_partitions=4)

    def hop(w, t, u, nbrs):
        return nbrs[((w % 997) * 8191 + t * 131071 + (u % 9973) * 131)
                    % len(nbrs)]

    adj = {0: [1, 2], 1: [3], 3: [0]}
    want = []
    for w in walkers:
        node, t = int(w), 0
        want.append((int(w), 0, int(w)))
        while t < 3 and node in adj:
            t += 1
            node = hop(int(w), t, node, adj[node])
            want.append((int(w), t, node))
    assert list(map(tuple, got[["walker", "step", "node"]].values)) == want
    # walker 2 starts at a sink: exactly its step-0 row survives
    assert (got["walker"] == 2).sum() == 1


def test_kcenter_coreset_greedy_trajectory(ray_session):
    import ray.data as rd

    from icrawler_ray.stages.clustering import kcenter_coreset

    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(30, 8))
    ds = rd.from_pandas(pd.DataFrame({
        "vec_id": np.arange(30, dtype=np.int64),
        "embedding": [v.tolist() for v in vecs]}))
    got = kcenter_coreset(ds, k=5)
    unit = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sel = [0]  # lowest id first
    dists = [0.0]
    for _ in range(4):
        mind = np.round(1.0 - (unit @ unit[sel].T).max(axis=1), 6)
        mind[sel] = -1.0
        j = int(np.lexsort((np.arange(30), -mind))[0])
        sel.append(j)
        dists.append(float(mind[j]))
    assert got["vec_id"].tolist() == sel
    assert got["dist"].tolist() == [round(d, 6) for d in dists]
    # greedy min-distances are non-increasing after the first pick
    d = got["dist"].to_numpy()
    assert (np.diff(d[1:]) <= 1e-12).all()


def test_personalized_pagerank_matches_numpy(ray_session):
    import ray.data as rd

    from icrawler_ray.stages.linkgraph import personalized_pagerank

    rng = np.random.default_rng(5)
    n = 40
    e = np.unique(rng.integers(0, n, (200, 2)), axis=0)
    e = e[e[:, 0] != e[:, 1]]
    edges = rd.from_pandas(pd.DataFrame({"src": e[:, 0], "dst": e[:, 1]}))
    seeds = np.array([2, 11], dtype=np.int64)
    got = personalized_pagerank(edges, n, seeds, iters=3, alpha=0.15)

    outdeg = np.zeros(n)
    np.add.at(outdeg, e[:, 0], 1.0)
    safe = np.where(outdeg > 0, outdeg, 1.0)
    base = np.zeros(n)
    base[seeds] = 0.15 / len(seeds)
    p = np.zeros(n)
    p[seeds] = 1.0 / len(seeds)
    for _ in range(3):
        contrib = p / safe
        p = base.copy()
        np.add.at(p, e[:, 1], 0.85 * contrib[e[:, 0]])
    assert np.allclose(got, p, atol=1e-12)
    # restart mass conservation: total <= 1, seeds hold the restart floor
    assert got.sum() <= 1.0 + 1e-9
    assert (got[seeds] >= 0.15 / len(seeds) - 1e-12).all()


def test_chunk_overlap_windows_and_stride(ray_session):
    from icrawler_ray.queries import _CHUNK_S, _CHUNK_W, q_chunk_overlap

    if not osp.isdir(SF_DIR):
        pytest.skip("driver testdata absent")
    import hashlib

    import pyarrow.parquet as pq

    out = q_chunk_overlap(SF_DIR)
    assert len(out)
    t = pq.read_table(f"{SF_DIR}/documents.parquet",
                      columns=["doc_id", "text"]).to_pandas()
    t = t[t["doc_id"] % 17 == 0].set_index("doc_id")
    # chunk_ids dense from 0; widths and fingerprints replay exactly
    for did, g in out.groupby("doc_id"):
        words = t.loc[did, "text"].split(" ")
        starts = list(range(0, len(words), _CHUNK_S))
        assert g["chunk_id"].tolist() == list(range(len(starts)))
        for row, st in zip(g.itertuples(), starts):
            cw = words[st:st + _CHUNK_W]
            assert row.n_words == len(cw)
            assert row.fp == hashlib.md5(" ".join(cw).encode()).hexdigest()
    assert set(out["doc_id"]) == set(t.index)
    # overlapping windows: stride < width
    assert _CHUNK_S < _CHUNK_W


def test_token_budget_never_exceeds_half_total(ray_session):
    from icrawler_ray.queries import q_token_budget

    if not osp.isdir(SF_DIR):
        pytest.skip("driver testdata absent")
    out = q_token_budget(SF_DIR)
    assert len(out)
    assert (out["tok_kept"] <= out["budget"]).all()
    # greedy fills the budget to within one max-doc of the cap: adding
    # any dropped doc (every doc has >= 1 token) must overflow is too
    # strong; but a kept set smaller than half the docs' tokens minus
    # the largest doc would mean the greedy stopped early
    assert (out["n_kept"] > 0).all()


def test_source_overlap_counts_cross_source_prefix_pairs(ray_session):
    import hashlib

    import pyarrow.parquet as pq

    from icrawler_ray.queries import q_source_overlap

    if not osp.isdir(SF_DIR):
        pytest.skip("driver testdata absent")
    out = q_source_overlap(SF_DIR)
    t = pq.read_table(f"{SF_DIR}/documents.parquet",
                      columns=["text", "source"]).to_pandas()
    t["fp"] = [hashlib.md5(" ".join(x.split(" ")[:8]).encode()).hexdigest()
               for x in t["text"]]
    c = t.groupby(["fp", "source"]).size()
    want = {}
    for fp, g in c.groupby(level=0):
        ss = g.droplevel(0)
        srcs = sorted(ss.index)
        for i in range(len(srcs)):
            for j in range(i + 1, len(srcs)):
                k = (srcs[i], srcs[j])
                want[k] = want.get(k, 0) + int(ss[srcs[i]] * ss[srcs[j]])
    got = {(r.src_a, r.src_b): int(r.n_pairs) for r in out.itertuples()}
    assert got == want and len(got)
