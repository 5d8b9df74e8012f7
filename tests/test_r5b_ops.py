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

@pytest.mark.parametrize("name", ["redirect_resolve", "url_templates"])
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
