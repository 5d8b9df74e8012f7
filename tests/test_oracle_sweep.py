"""CI oracle sweep for the below-the-window queries.

The external driver's correctness gate compares only the FIRST 50
QUERIES entries against their DuckDB oracles; everything after that is
evidenced by the committed CHECK_QUERIES_r*.txt full-sweep logs.  This
test makes the below-the-fold half a CI invariant (ADVICE r3 #4): every
QUERIES entry past the window that has an ORACLE_SQL is run through Ray
AND DuckDB at sf0.001 and compared with the same normalization the
check script (and the driver) uses.  Rows-only entries (the crawl
pipelines) are pinned by their own oracle-parity tests, not here.
"""

from __future__ import annotations

import os.path as osp

import duckdb
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"
DRIVER_WINDOW = 50
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df.columns = [c.lower() for c in df.columns]
    df = df[sorted(df.columns)]
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        if str(df[c].dtype).startswith(("uint", "int", "Int")):
            df[c] = df[c].astype("int64")
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def _to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(obj, ray.data.Dataset):
        return obj.to_pandas()
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj


def _below_window_names():
    from icrawler_ray.queries import ORACLE_SQL, QUERIES

    names = list(QUERIES)[DRIVER_WINDOW:]
    return [n for n in names if n in ORACLE_SQL]


@pytest.mark.skipif(not osp.isdir(SF_DIR), reason="driver testdata absent")
@pytest.mark.parametrize("name", _below_window_names())
def test_below_window_oracle(name, ray_session):
    from icrawler_ray.queries import ORACLE_SQL, QUERIES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF_DIR}/{t}.parquet')")
    got = _to_pandas(QUERIES[name](SF_DIR))
    want = con.execute(ORACLE_SQL[name]).df()
    got.columns = [c.lower() for c in got.columns]
    want.columns = [c.lower() for c in want.columns]

    # the driver's value hash is dtype-KIND-sensitive (int vs float)
    for col in want.columns:
        if col in got.columns:
            gk, wk = got[col].dtype.kind, want[col].dtype.kind
            assert gk == wk or {gk, wk} <= {"i", "u"}, \
                (name, col, got[col].dtype, want[col].dtype)

    got_n, want_n = _normalize(got), _normalize(want)
    assert list(got_n.columns) == list(want_n.columns), name
    assert len(got_n) == len(want_n), (name, len(got_n), len(want_n))
    pd.testing.assert_frame_equal(got_n, want_n, check_dtype=False,
                                  check_exact=False, atol=1e-6, rtol=1e-6)
