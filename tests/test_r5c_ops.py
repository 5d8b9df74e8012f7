"""Round-5 batch-F operator tests: reciprocal-rank fusion, hapax-ratio
vocabulary-tail audit, per-source exact-dup attribution, and directed-graph
reciprocity — property tests plus an oracle pin for the entries that sit
below the driver window.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"


# ------------------------------------------------------------- rrf fusion

def test_rrf_fusion_replay(ray_session):
    """RRF scores replay exactly from the two component rankings, and
    the fused top-10 is the score-desc/doc_id-asc head of the union."""
    from icrawler_ray.queries import _BM25_TERMS, _read, q_rrf_fusion
    from icrawler_ray.stages.similarity import brute_force_topk
    from icrawler_ray.stages.textfns import bm25_topk

    out = q_rrf_fusion(SF_DIR)
    assert list(out["rank"]) == list(range(1, len(out) + 1))

    bm = bm25_topk(_read(SF_DIR, "documents", ["doc_id", "text"]),
                   _BM25_TERMS, k=20)
    head = _read(SF_DIR, "embeddings", ["vec_id", "embedding"]) \
        .sort("vec_id").limit(1).to_pandas()
    cs = brute_force_topk(
        _read(SF_DIR, "embeddings", ["vec_id", "embedding"]),
        np.asarray(head["embedding"].tolist(), dtype=np.float64),
        k=20, query_ids=head["vec_id"].to_numpy())
    bm_rank = dict(zip(bm["doc_id"], bm["rank"]))
    cs_rank = dict(zip(cs["vec_id"], cs["rank"]))
    scores = {d: (1.0 / (60.0 + bm_rank[d]) if d in bm_rank else 0.0)
              + (1.0 / (60.0 + cs_rank[d]) if d in cs_rank else 0.0)
              for d in set(bm_rank) | set(cs_rank)}
    exp = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert list(out["doc_id"]) == [d for d, _ in exp]
    assert list(out["rrf"]) == [round(s, 6) for _, s in exp]


def test_rrf_dual_hit_beats_single_hit(ray_session):
    """A doc in both lists outranks a doc whose single-list rank equals
    its better rank (1/(60+r) + something > 1/(60+r))."""
    from icrawler_ray.queries import q_rrf_fusion

    out = q_rrf_fusion(SF_DIR)
    # scores strictly ordered or tied-then-id-asc
    rrf = out["rrf"].to_numpy()
    assert (np.diff(rrf) <= 0).all()
    ties = np.flatnonzero(np.diff(rrf) == 0)
    for i in ties:
        assert out["doc_id"].iloc[i] < out["doc_id"].iloc[i + 1]


# ------------------------------------------------------------ hapax ratio

def test_hapax_ratio_matches_pandas(ray_session):
    from icrawler_ray.queries import _read, q_hapax_ratio

    out = q_hapax_ratio(SF_DIR).set_index("source")
    docs = _read(SF_DIR, "documents", ["source", "text"]).to_pandas()
    tok = docs[["source"]].join(
        docs["text"].str.split(" ").rename("term")).explode("term")
    counts = tok["term"].value_counts()
    hapax_terms = set(counts[counts == 1].index)
    exp_hapax = tok[tok["term"].isin(hapax_terms)].groupby("source").size()
    exp_tokens = tok.groupby("source").size()
    for src in exp_tokens.index:
        assert out.loc[src, "n_tokens"] == exp_tokens[src]
        assert out.loc[src, "n_hapax"] == exp_hapax.get(src, 0)
        assert out.loc[src, "hapax_ratio"] == round(
            exp_hapax.get(src, 0) / exp_tokens[src], 6)


# --------------------------------------------------------- dup attribution

def test_dup_ratio_by_source_matches_pandas(ray_session):
    from icrawler_ray.queries import _read, q_dup_ratio_by_source

    out = q_dup_ratio_by_source(SF_DIR).set_index("source")
    docs = _read(SF_DIR, "documents", ["source", "text"]).to_pandas()
    vc = docs["text"].value_counts()
    docs["dup"] = docs["text"].map(vc) >= 2
    g = docs.groupby("source").agg(n_docs=("dup", "size"), n_dup=("dup", "sum"))
    for src, r in g.iterrows():
        assert out.loc[src, "n_docs"] == r["n_docs"]
        assert out.loc[src, "n_dup"] == r["n_dup"]
    # both copies counted: total dup mass is even across exact pairs
    assert int(out["n_dup"].sum()) == int(docs["dup"].sum())


# ------------------------------------------------------------- reciprocity

def test_edge_reciprocity_small_graph(ray_session):
    """Hand-built graph: 1<->2 reciprocal, 3->4 and 5->6 one-way, plus a
    duplicate 3->4 that must collapse before counting."""
    import ray.data as rd

    import icrawler_ray.queries as q

    edges = pd.DataFrame({"src": [1, 2, 3, 3, 5], "dst": [2, 1, 4, 4, 6]})

    # replicate the engine's bucketed counting directly on a tiny input
    n = np.int64(10)
    s, d = edges["src"].to_numpy(np.int64), edges["dst"].to_numpy(np.int64)
    canon = pd.DataFrame({
        "key": np.minimum(s, d) * n + np.maximum(s, d),
        "flag": np.where(s < d, 1, 2).astype(np.int64)}).drop_duplicates()
    per = canon.groupby("key").size()
    assert int(per.sum()) == 4          # distinct directed edges
    assert int((per == 2).sum()) * 2 == 2  # reciprocal directed edges

    out = q.q_edge_reciprocity(SF_DIR)
    assert out["n_edges"].iloc[0] > 0
    assert 0.0 <= out["reciprocity"].iloc[0] <= 1.0
    assert out["n_recip"].iloc[0] % 2 == 0
    assert round(out["n_recip"].iloc[0] / out["n_edges"].iloc[0], 6) == \
        out["reciprocity"].iloc[0]


def test_edge_reciprocity_matches_pandas(ray_session):
    from icrawler_ray.queries import _read, q_edge_reciprocity
    from icrawler_ray.stages.linkgraph import derive_edges

    docs = _read(SF_DIR, "documents", ["doc_id"])
    n = docs.count()
    e = derive_edges(docs, n).to_pandas().drop_duplicates()
    fwd = set(zip(e["src"], e["dst"]))
    n_recip = sum(1 for (a, b) in fwd if (b, a) in fwd)
    out = q_edge_reciprocity(SF_DIR)
    assert out["n_edges"].iloc[0] == len(fwd)
    assert out["n_recip"].iloc[0] == n_recip


# -------------------------------------------------- below-window oracle pin

@pytest.mark.parametrize("name", ["rrf_fusion", "hapax_ratio",
                                  "dup_ratio_by_source", "edge_reciprocity"])
def test_r5c_query_matches_oracle(ray_session, name):
    import duckdb

    from icrawler_ray.queries import ORACLE_SQL, QUERIES
    from tests.test_r5_ops import TABLES, _normalize, _to_pandas

    got = _normalize(_to_pandas(QUERIES[name](SF_DIR)))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    exp = _normalize(con.execute(ORACLE_SQL[name]).df())
    con.close()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
