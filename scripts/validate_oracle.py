"""Local stand-in for the driver's correctness gate: runs every
queries() entry and its oracle_sql() side by side, compares row count,
column names, and order-insensitive values.  Usage:

    python scripts/validate_oracle.py [sf_dir]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def to_pandas(res):
    import pyarrow as pa
    import ray.data
    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif df[c].dtype.kind in "iu":
            df[c] = df[c].astype("int64")
        elif df[c].dtype.kind == "f":
            df[c] = df[c].astype("float64")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name, ray_df, sql_df):
    a, b = norm(ray_df), norm(sql_df)
    if list(a.columns) != list(b.columns):
        return f"SCHEMA MISMATCH ray={list(a.columns)} sql={list(b.columns)}"
    if len(a) != len(b):
        return f"ROWCOUNT MISMATCH ray={len(a)} sql={len(b)}"
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if av.dtype.kind == "f":
            an, bn = np.isnan(av.astype(float)), np.isnan(bv.astype(float))
            ok = np.array_equal(an, bn) and np.allclose(
                av[~an].astype(float), bv[~bn].astype(float),
                rtol=0, atol=0, equal_nan=True)
            if not ok:
                exact = av[~an] == bv[~bn]
                return (f"VALUE MISMATCH col={c} "
                        f"n_diff={int((~exact).sum())} "
                        f"ex: {av[~an][~exact][:3]} vs {bv[~bn][~exact][:3]}")
        else:
            if not np.array_equal(av, bv):
                diff = av != bv
                return (f"VALUE MISMATCH col={c} n_diff={int(diff.sum())} "
                        f"ex: {av[diff][:3]} vs {bv[diff][:3]}")
    return None


def main(sf_dir: str, only=None):
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    import __ray_entry__ as E
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    qs = E.queries()
    oracles = E.oracle_sql()
    failures = 0
    import time
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            ray_df = to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"{name}: RAY ERROR {type(e).__name__}: {str(e)[:200]}")
            failures += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"{name}: rows-only ({len(ray_df)} rows, {dt:.1f}s)")
            continue
        try:
            sql_df = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"{name}: SQL ERROR {str(e)[:200]}")
            failures += 1
            continue
        err = compare(name, ray_df, sql_df)
        if err:
            print(f"{name}: FAIL {err}  ({dt:.1f}s)")
            failures += 1
        else:
            print(f"{name}: OK ({len(ray_df)} rows, {dt:.1f}s)")
    ray.shutdown()
    return failures


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
    sys.exit(1 if main(sf, only) else 0)
