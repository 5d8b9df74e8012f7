"""salted_hash_join (stages/joins.py) vs a pandas reference merge on a
planted-skew dataset: one key holds half the probe rows."""

import numpy as np
import pandas as pd
import ray.data as rd

from icrawler_ray.stages.joins import salted_hash_join


def _planted():
    rng = np.random.RandomState(7)
    n = 4000
    keys = np.where(rng.rand(n) < 0.5, 42, rng.randint(0, 500, n))
    probe = pd.DataFrame({
        "k": keys.astype(np.int64),
        "rowid": np.arange(n, dtype=np.int64),
        "val": rng.rand(n)})
    build = pd.DataFrame({
        "k": np.arange(0, 500, dtype=np.int64),
        "tag": [f"t{i % 7}" for i in range(500)]})
    return probe, build


def test_salted_join_raw_rows_match_pandas_merge():
    probe, build = _planted()
    got = salted_hash_join(
        rd.from_pandas(probe).repartition(6),
        rd.from_pandas(build).repartition(3),
        "k", salt=4, hot_threshold=100, num_partitions=8,
        probe_salt_col="rowid").to_pandas()
    expect = probe.merge(build, on="k")
    got = got.sort_values("rowid").reset_index(drop=True)[expect.columns.tolist()]
    expect = expect.sort_values("rowid").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, expect)
    # the planted key must actually have been salted
    from icrawler_ray.stages.joins import _hot_keys
    hot = _hot_keys(rd.from_pandas(probe).repartition(6), "k", 100, 64)
    assert 42 in hot.tolist()


def test_salted_join_agg_partials_match_pandas():
    probe, build = _planted()

    def agg(j: pd.DataFrame) -> pd.DataFrame:
        g = j.groupby("tag")["val"]
        return pd.DataFrame({"tag": g.sum().index, "n": g.size().to_numpy(),
                             "s": g.sum().to_numpy()})

    parts = salted_hash_join(
        rd.from_pandas(probe).repartition(6),
        rd.from_pandas(build).repartition(3),
        "k", salt=4, hot_threshold=100, num_partitions=8,
        probe_salt_col="rowid", agg_fn=agg).to_pandas()
    got = parts.groupby("tag", as_index=False).agg(n=("n", "sum"), s=("s", "sum"))
    ref = probe.merge(build, on="k").groupby("tag", as_index=False).agg(
        n=("val", "size"), s=("val", "sum"))
    got = got.sort_values("tag").reset_index(drop=True)
    ref = ref.sort_values("tag").reset_index(drop=True)
    assert got["tag"].tolist() == ref["tag"].tolist()
    assert got["n"].astype(int).tolist() == ref["n"].astype(int).tolist()
    np.testing.assert_allclose(got["s"].to_numpy(), ref["s"].to_numpy())


def test_salted_join_no_hot_keys_fast_path():
    probe, build = _planted()
    got = salted_hash_join(
        rd.from_pandas(probe).repartition(6),
        rd.from_pandas(build).repartition(3),
        "k", salt=4, hot_threshold=10**9, num_partitions=8,
        probe_salt_col="rowid").to_pandas()
    expect = probe.merge(build, on="k")
    assert len(got) == len(expect)
    assert got["val"].sum() == expect["val"].sum()


def test_percent_rank_sort_mode_matches_histogram_and_pandas(ray_session):
    """The continuous-score sort path (global sort + metadata-only
    boundary stitch) must equal the histogram path and pandas
    rank(method='min') exactly — including tie runs that straddle
    block boundaries and single-row partitions."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from icrawler_ray.stages.window import percent_rank_over

    rng = np.random.default_rng(42)
    n = 20_000
    df = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "lang": np.array(["en", "de", "fr", "zh"])[rng.integers(0, 4, n)],
        # coarse values -> long tie runs guaranteed to straddle blocks
        "score": rng.integers(0, 25, n).astype("float64"),
    })
    # a single-row partition
    df.loc[n - 1, "lang"] = "solo"
    ds = rd.from_pandas(df).repartition(13)  # odd split vs tie runs

    a = percent_rank_over(ds, "lang", "score", mode="histogram") \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = percent_rank_over(ds, "lang", "score", mode="sort") \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    sizes = df.groupby("lang")["score"].transform("size")
    ref = np.where(sizes > 1,
                   (df.groupby("lang")["score"].rank(method="min") - 1)
                   / np.maximum(sizes - 1, 1), 0.0)
    ref = np.round(ref, 6)
    assert np.array_equal(a["pr"].to_numpy(), ref)
    assert np.array_equal(b["pr"].to_numpy(), ref)
    assert a.loc[a["lang"] == "solo", "pr"].iloc[0] == 0.0


def test_percent_rank_empty_blocks_and_empty_input_keep_schema(ray_session):
    """Few distinct sort keys + many blocks makes Ray's sort emit EMPTY
    blocks (which come back schema-less); the sort path must not mix a
    pr-only block into the output. A zero-row input must still produce
    blocks carrying the input columns + pr in BOTH modes."""
    import numpy as np
    import pandas as pd
    import ray
    import ray.data as rd

    from icrawler_ray.stages.window import percent_rank_over

    df = pd.DataFrame({"doc_id": np.arange(200),
                       "lang": ["en"] * 100 + ["de"] * 100,
                       "score": ([1.0] * 50 + [2.0] * 50) * 2})
    out = percent_rank_over(rd.from_pandas(df).repartition(9),
                            "lang", "score", mode="sort")
    schemas = {str(ray.get(r).schema) for r in out.to_arrow_refs()}
    assert len(schemas) == 1, schemas  # no mixed-schema RefBundles
    assert len(out.to_pandas()) == 200

    for mode in ("sort", "histogram"):
        eds = percent_rank_over(rd.from_pandas(df.iloc[:0]),
                                "lang", "score", mode=mode)
        blks = [ray.get(r) for r in eds.to_arrow_refs()]
        names = {n for b in blks for n in b.schema.names}
        assert names == {"doc_id", "lang", "score", "pr"}, (mode, names)
        assert sum(b.num_rows for b in blks) == 0
