"""Local stand-in for the driver's correctness gate: run every
queries() entry through Ray AND its oracle_sql() through DuckDB on the
same sf dir, compare row count / schema / order-insensitive values.

Usage: python scripts/check_queries.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(obj, ray.data.Dataset):
        return obj.to_pandas()
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df.columns = [c.lower() for c in df.columns]
    df = df[sorted(df.columns)]
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        if pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype(bool)
        if str(df[c].dtype).startswith(("uint", "int", "Int")):
            df[c] = df[c].astype("int64")
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import logging

    import ray
    import ray.data

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    ray.data.DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from icrawler_ray.queries import ORACLE_SQL, QUERIES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    n_pass = n_fail = n_rowsonly = 0
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            raw_got = to_pandas(fn(sf_dir))
            raw_got.columns = [c.lower() for c in raw_got.columns]
            got = normalize(raw_got)
        except Exception as e:
            print(f"FAIL {name}: ray error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in ORACLE_SQL:
            print(f"rows-only {name}: {len(got)} rows ({dt:.1f}s)")
            n_rowsonly += 1
            continue
        try:
            want = normalize(con.execute(ORACLE_SQL[name]).df())
        except Exception as e:
            print(f"FAIL {name}: sql error: {e}")
            n_fail += 1
            continue
        ok = True
        # The driver's value hash tolerates integer WIDTH differences but
        # not KIND differences (DuckDB HUGEINT surfaces as float64/object
        # and hash-mismatches an engine int64 even when values match —
        # the round-1 sessionize bug), so flag cross-kind columns.
        raw_want = con.execute(ORACLE_SQL[name]).df()
        raw_want.columns = [c.lower() for c in raw_want.columns]
        raw_got_kinds = {c: raw_got[c].dtype.kind for c in raw_got.columns}
        for col in raw_want.columns:
            gk = raw_got_kinds.get(col)
            wk = raw_want[col].dtype.kind
            if gk is None:
                continue
            if gk != wk and not ({gk, wk} <= {"i", "u"}):
                print(f"FAIL {name}: dtype kind mismatch on '{col}': "
                      f"ray={raw_got[col].dtype} oracle={raw_want[col].dtype}"
                      " (driver hash is kind-sensitive)")
                ok = False
        if not ok:
            n_fail += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
            ok = False
        elif len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
            ok = False
        else:
            try:
                pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                              check_exact=False, atol=1e-6, rtol=1e-6)
            except AssertionError as e:
                print(f"FAIL {name}: values differ: {str(e)[:300]}")
                ok = False
        if ok:
            print(f"PASS {name}: {len(got)} rows ({dt:.1f}s)")
            n_pass += 1
        else:
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    ray.shutdown()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
