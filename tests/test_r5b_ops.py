"""Round-5 batch-B operator tests: redirect-chain resolution (pointer
doubling), recrawl scheduling, URL-template mining / trap audit, and the
column profiler — property tests plus an oracle pin for the entries that
sit below the driver window.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"


# ---------------------------------------------------------------- redirects

def test_resolve_redirects_flattens_chains(ray_session):
    import ray.data as rd

    from icrawler_ray.stages.linkgraph import resolve_redirects

    # chains i -> i-1 down to multiples of 10 (max length 9)
    d = np.arange(200, dtype=np.int64)
    src = d[d % 10 != 0]
    e = rd.from_pandas(pd.DataFrame({"src": src, "dst": src - 1}))
    out = resolve_redirects(e).to_pandas().sort_values("src").reset_index(drop=True)
    assert (out["src"].to_numpy() == src).all()
    assert (out["dst"].to_numpy() == (src // 10) * 10).all()
    assert (out["hops"].to_numpy() == src - (src // 10) * 10).all()


def test_resolve_redirects_branching_tree(ray_session):
    """Many srcs pointing at the same dst (a redirect TREE, still
    functional) all resolve to the shared terminal."""
    import ray.data as rd

    from icrawler_ray.stages.linkgraph import resolve_redirects

    #   10..19 -> 5, 5 -> 3, 3 -> 0 (terminal)
    e = rd.from_pandas(pd.DataFrame({
        "src": list(range(10, 20)) + [5, 3],
        "dst": [5] * 10 + [3, 0]}))
    out = resolve_redirects(e).to_pandas().set_index("src")
    assert (out["dst"] == 0).all()
    for s in range(10, 20):
        assert out.loc[s, "hops"] == 3
    assert out.loc[5, "hops"] == 2 and out.loc[3, "hops"] == 1


def test_resolve_redirects_cycle_terminates(ray_session):
    import ray.data as rd

    from icrawler_ray.stages.linkgraph import resolve_redirects

    e = rd.from_pandas(pd.DataFrame({"src": [1, 2, 3], "dst": [2, 3, 1]}))
    out = resolve_redirects(e, max_rounds=5).to_pandas()
    # terminates deterministically; every resolved target is in-cycle
    assert set(out["dst"]).issubset({1, 2, 3})
    assert (out["hops"] == 2 ** 5).all()


# ------------------------------------------------------------ recrawl tiers

def test_recrawl_schedule_tier_partition(ray_session):
    """Tiers partition the corpus and per-source doc counts sum to the
    source totals; lambda formula replayed in numpy."""
    from icrawler_ray.queries import _read, q_recrawl_schedule

    out = q_recrawl_schedule(SF_DIR)
    docs = _read(SF_DIR, "documents", ["doc_id", "source"]).to_pandas()
    assert out["n_docs"].sum() == len(docs)
    d = docs["doc_id"].to_numpy(dtype=np.int64)
    n = 4 + (d % 5)
    k = (d * 7) % (n + 1)
    lam = np.round(-np.log((n - k + 0.5) / (n + 0.5)), 6)
    assert (lam > 0).any() and np.isfinite(lam).all()
    hot = int((lam >= 0.6931).sum())
    assert out.loc[out["tier"] == "hot", "n_docs"].sum() == hot


# ---------------------------------------------------------- templates/traps

def test_url_templates_collapse_digit_runs(ray_session):
    from icrawler_ray.queries import q_url_templates

    out = q_url_templates(SF_DIR)
    # no digits survive in any template; all three shapes appear
    assert not out["template"].str.contains(r"[0-9]").any()
    assert (out["template"] == "/archive/N").any()
    assert (out["template"] == "/post/N").any()
    assert out["template"].str.startswith("/tag/").any()


def test_trap_audit_consistent_with_templates(ray_session):
    from icrawler_ray.queries import q_trap_audit, q_url_templates

    t = q_url_templates(SF_DIR)
    a = q_trap_audit(SF_DIR).set_index("host")
    g = t.groupby("host")
    assert (a["n_urls"] == g["n_urls"].sum()).all()
    assert (a["n_templates"] == g["template"].nunique()).all()
    assert (a["trap"] == (a["ratio"] > 60.0).astype("int64")).all()


# ------------------------------------------------------------- profiler

def test_column_profile_matches_pandas(ray_session):
    from icrawler_ray.queries import _read, q_column_profile

    out = q_column_profile(SF_DIR).set_index("col")
    ev = _read(SF_DIR, "events",
               ["event_id", "ts", "user_id", "event_type", "value"]).to_pandas()
    for c in ["event_id", "user_id", "value"]:
        assert out.loc[c, "n_rows"] == len(ev)
        assert out.loc[c, "n_distinct"] == ev[c].nunique()
        assert out.loc[c, "min_num"] == pytest.approx(float(ev[c].min()))
        assert out.loc[c, "max_num"] == pytest.approx(float(ev[c].max()))
    assert out.loc["ts", "n_distinct"] == ev["ts"].nunique()
    assert np.isnan(out.loc["event_type", "min_num"])


# -------------------------------------------------- below-window oracle pin

@pytest.mark.parametrize("name", ["redirect_resolve", "url_templates",
                                  "source_drift"])
def test_r5b_query_matches_oracle(ray_session, name):
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


# ----------------------------------------------------------- batch C ops

def test_neighbor_jaccard_matches_bruteforce(ray_session):
    import ray.data as rd

    from icrawler_ray.stages.linkgraph import neighborhood_jaccard_pairs

    rng = np.random.default_rng(11)
    n = 60
    src = rng.integers(0, n, 300)
    dst = rng.integers(0, n, 300)
    e = rd.from_pandas(pd.DataFrame({"src": src, "dst": dst}))
    got = neighborhood_jaccard_pairs(e, n, max_deg=64, threshold=0.3)

    # brute force
    adj = [set() for _ in range(n)]
    for s, d in zip(src, dst):
        if s != d:
            adj[s].add(d); adj[d].add(s)
    exp = []
    for a in range(n):
        for b in range(a + 1, n):
            inter = len(adj[a] & adj[b])
            if inter and len(adj[a]) <= 64 and len(adj[b]) <= 64:
                j = round(inter / len(adj[a] | adj[b]), 6)
                if j >= 0.3:
                    exp.append((a, b, j))
    exp_df = pd.DataFrame(exp, columns=["a", "b", "jaccard"])
    got = got.reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype({"a": "int64", "b": "int64"}), exp_df, check_dtype=False)


def test_neighbor_jaccard_hub_cap(ray_session):
    """A hub with deg > max_deg is excluded both as intermediate and
    endpoint."""
    import ray.data as rd

    from icrawler_ray.stages.linkgraph import neighborhood_jaccard_pairs

    # hub 0 connects to 1..9; nodes 1 and 2 also share neighbor 10
    rows = [(0, i) for i in range(1, 10)] + [(1, 10), (2, 10)]
    e = rd.from_pandas(pd.DataFrame(rows, columns=["src", "dst"]))
    out = neighborhood_jaccard_pairs(e, 20, max_deg=4, threshold=0.1)
    # 0 has deg 9 > 4: wedges through it vanish; (1,2) still share 10
    assert list(out.itertuples(index=False)) and set(
        map(tuple, out[["a", "b"]].to_numpy())) == {(1, 2)}


def test_hard_negatives_numpy_replay(ray_session):
    from icrawler_ray.queries import _read, q_hard_negatives

    SF = SF_DIR
    out = q_hard_negatives(SF).set_index("query_id")
    emb = _read(SF, "embeddings", ["vec_id", "embedding", "label"]).to_pandas()
    M = np.asarray(emb["embedding"].tolist(), dtype=np.float64)
    M = M / np.linalg.norm(M, axis=1, keepdims=True)
    ids = emb["vec_id"].to_numpy()
    labels = emb["label"].to_numpy()
    head = emb.sort_values("vec_id").head(8)
    for _, r in head.iterrows():
        q = np.asarray(r["embedding"], dtype=np.float64)
        q = q / np.linalg.norm(q)
        sims = M @ q
        ok = labels != r["label"]
        order = np.lexsort((ids[ok], -sims[ok]))
        exp = ids[ok][order[0]]
        assert out.loc[r["vec_id"], "neg_id"] == exp


def test_host_latency_slo_quantile_definition(ray_session):
    from icrawler_ray.queries import _read, q_host_latency_slo

    out = q_host_latency_slo(SF_DIR)
    ev = _read(SF_DIR, "events", ["event_id", "user_id"]).to_pandas()
    host = "h" + (ev["user_id"] % 40).astype(str)
    lat = 20 + (ev["event_id"].to_numpy(dtype=np.int64) * 37) % 480
    df = pd.DataFrame({"host": host, "lat": lat})
    for _, r in out.iterrows():
        v = np.sort(df.loc[df["host"] == r["host"], "lat"].to_numpy())
        assert r["n"] == len(v)
        assert r["p50"] == v[int(np.ceil(0.5 * len(v))) - 1]
        assert r["p95"] == v[int(np.ceil(0.95 * len(v))) - 1]


# ----------------------------------------------------------- batch D ops

def test_host_reputation_bounds_and_decay(ray_session):
    """Reputation is a convex combination of daily error rates (in
    [0, 1]) and recent days dominate: replay one host in numpy."""
    from icrawler_ray.queries import _read, q_host_reputation

    out = q_host_reputation(SF_DIR)
    assert ((out["reputation"] >= 0) & (out["reputation"] <= 1)).all()
    ev = _read(SF_DIR, "events", ["event_id", "user_id", "ts"]).to_pandas()
    ev["host"] = "h" + (ev["user_id"] % 40).astype(str)
    ev["day"] = ev["ts"].dt.floor("D")
    ev["err"] = (ev["event_id"] % 7 == 0).astype(int)
    one = ev[ev["host"] == "h0"]
    d = one.groupby("day")["err"].mean()
    k = (ev["day"].max() - d.index).days.to_numpy(dtype=np.float64)
    wt = np.power(0.7, k)
    exp = round(float((d.to_numpy() * wt).sum() / wt.sum()), 6)
    got = float(out.set_index("host").loc["h0", "reputation"])
    assert got == exp


def test_value_histogram_counts_complete(ray_session):
    from icrawler_ray.queries import _read, q_value_histogram

    out = q_value_histogram(SF_DIR)
    ev = _read(SF_DIR, "events", ["value"]).to_pandas()
    assert out["n"].sum() == len(ev)
    assert out["bin"].between(0, 19).all()
    mn, mx = float(ev["value"].min()), float(ev["value"].max())
    b = np.minimum(19.0, np.floor((ev["value"].to_numpy() - mn) * 20.0 / (mx - mn)))
    exp = pd.Series(b.astype(np.int64)).value_counts().sort_index()
    got = out.set_index("bin")["n"]
    assert (got == exp).all()


def test_weighted_median_definition(ray_session):
    from icrawler_ray.queries import _read, q_weighted_median

    out = q_weighted_median(SF_DIR).set_index("lang")
    docs = _read(SF_DIR, "documents", ["lang", "text", "n_chars"]).to_pandas()
    docs["tok"] = docs["text"].str.count(" ") + 1
    for lang, g in docs.groupby("lang"):
        g = g.sort_values("tok")
        cum = g["n_chars"].cumsum().to_numpy()
        tot = int(cum[-1])
        exp = int(g["tok"].to_numpy()[np.searchsorted(cum, (tot + 1) // 2)])
        assert out.loc[lang, "wmedian_tok"] == exp
        assert out.loc[lang, "total_w"] == tot


# ----------------------------------------------------------- batch E ops

def test_source_drift_scipy_style_replay(ray_session):
    """KS statistic per source equals the direct two-sample-vs-pooled
    computation on sorted arrays."""
    from icrawler_ray.queries import _read, q_source_drift

    out = q_source_drift(SF_DIR).set_index("source")
    docs = _read(SF_DIR, "documents", ["source", "n_chars"]).to_pandas()
    grid = np.sort(docs["n_chars"].unique())
    allv = np.sort(docs["n_chars"].to_numpy())
    gcdf = np.searchsorted(allv, grid, side="right") / len(allv)
    for src, g in docs.groupby("source"):
        sv = np.sort(g["n_chars"].to_numpy())
        scdf = np.searchsorted(sv, grid, side="right") / len(sv)
        exp = float(np.round(np.abs(scdf - gcdf), 6).max())
        assert out.loc[src, "ks"] == pytest.approx(exp, abs=1e-9)


def test_stopword_coverage_bounds(ray_session):
    from icrawler_ray.queries import q_stopword_coverage

    out = q_stopword_coverage(SF_DIR)
    assert ((out["coverage"] > 0) & (out["coverage"] <= 1)).all()
    assert out["n_tokens"].sum() > 0


def test_trending_types_rank_consistency(ray_session):
    from icrawler_ray.queries import _read, q_trending_types

    out = q_trending_types(SF_DIR)
    # ranks 1..k exactly once; delta matches the two rank columns
    assert sorted(out["rank_today"]) == list(range(1, len(out) + 1))
    present = out["rank_prev"] > 0
    assert (out.loc[present, "delta"] ==
            out.loc[present, "rank_prev"] - out.loc[present, "rank_today"]).all()
    assert (out.loc[~present, "delta"] == 0).all()
