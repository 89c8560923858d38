"""Local stand-in for the driver's correctness gate: runs every
queries() entry and its oracle_sql() side by side, compares row count,
column names, and order-insensitive values.  Usage:

    python scripts/validate_oracle.py [sf_dir] [only_csv] [--json PATH]

``--json PATH`` additionally writes a driver-artifact-shaped JSON
(per-query rows_match/schema_match/hash_match/err) covering EVERY
registered query — the committed full-registry correctness evidence
(the driver's own artifact caps at 50 queries).
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Oracles that are VALUES-literal fixtures generated at sf0.01 (the
# driver's gate scale): at any other sf the comparison is expected to
# differ and a mismatch is reported as a note, not a failure.
FIXTURE_SF01_ONLY = {"q19_simplify", "q57_s2_cells", "q71_bpe_train",
                     "q72_bpe_encode", "q91_hll_distinct",
                     "q92_hll_by_group"}


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


def dtype_class(dt) -> str:
    """Coarse dtype class matching the driver's dtype-sensitive hash:
    an int64 engine column vs a float64 oracle column (the DuckDB
    HUGEINT -> pandas float64 leak from sum() OVER window arithmetic)
    hash-mismatches even when values are exact."""
    k = getattr(dt, "kind", "O")
    if k in "iu":
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    if k == "M":
        return "datetime"
    return "object"


def compare(name, ray_df, sql_df):
    a, b = norm(ray_df), norm(sql_df)
    if list(a.columns) != list(b.columns):
        return f"SCHEMA MISMATCH ray={list(a.columns)} sql={list(b.columns)}"
    for c in a.columns:
        ka = dtype_class(ray_df[c].dtype)
        kb = dtype_class(sql_df[c].dtype)
        if ka != kb:
            return (f"DTYPE MISMATCH col={c} ray={ray_df[c].dtype} "
                    f"sql={sql_df[c].dtype} (driver hash is "
                    f"dtype-sensitive — CAST the oracle column)")
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


def main(sf_dir: str, only=None, json_path=None):
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
    report = {}
    import time
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            ray_df = to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"{name}: RAY ERROR {type(e).__name__}: {str(e)[:200]}")
            report[name] = {"rows_match": False, "schema_match": False,
                            "hash_match": False, "spark_rows": None,
                            "oracle_rows": None,
                            "err": f"{type(e).__name__}: {str(e)[:200]}"}
            failures += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"{name}: rows-only ({len(ray_df)} rows, {dt:.1f}s)")
            report[name] = {"rows_match": True, "schema_match": None,
                            "hash_match": None,
                            "spark_rows": int(len(ray_df)),
                            "oracle_rows": None, "err": None,
                            "note": "rows-only (no SQL oracle)"}
            continue
        try:
            sql_df = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"{name}: SQL ERROR {str(e)[:200]}")
            report[name] = {"rows_match": False, "schema_match": False,
                            "hash_match": False,
                            "spark_rows": int(len(ray_df)),
                            "oracle_rows": None,
                            "err": f"SQL: {str(e)[:200]}"}
            failures += 1
            continue
        err = compare(name, ray_df, sql_df)
        if err and name in FIXTURE_SF01_ONLY \
                and "sf0.01" not in sf_dir:
            print(f"{name}: SKIP at {sf_dir} (sf0.01-only fixture "
                  f"oracle): {err[:60]}")
            report[name] = {"rows_match": True, "schema_match": None,
                            "hash_match": None,
                            "spark_rows": int(len(ray_df)),
                            "oracle_rows": int(len(sql_df)),
                            "err": None,
                            "note": "fixture oracle valid at sf0.01 "
                                    "only; compared there"}
            continue
        ok = err is None
        report[name] = {"rows_match": ok or "ROWCOUNT" not in (err or ""),
                        "schema_match": ok or "SCHEMA" not in (err or ""),
                        "hash_match": ok,
                        "spark_rows": int(len(ray_df)),
                        "oracle_rows": int(len(sql_df)),
                        "err": err, "sec": round(dt, 2)}
        if err:
            print(f"{name}: FAIL {err}  ({dt:.1f}s)")
            failures += 1
        else:
            print(f"{name}: OK ({len(ray_df)} rows, {dt:.1f}s)")
    if json_path:
        import json
        with open(json_path, "w") as f:
            json.dump(report, f, indent=2)
        print(f"wrote {json_path}: {len(report)} queries, "
              f"{failures} failures")
    ray.shutdown()
    return failures


if __name__ == "__main__":
    argv = list(sys.argv[1:])
    json_path = None
    if "--json" in argv:
        i = argv.index("--json")
        json_path = argv[i + 1]
        del argv[i:i + 2]
    sf = argv[0] if len(argv) > 0 else "/root/testdata/sf0.001"
    only = set(argv[1].split(",")) if len(argv) > 1 else None
    sys.exit(1 if main(sf, only, json_path) else 0)
