"""Distributed exact rank / selection (k-th smallest) over a float
column — the scale path for the reference's exact-rank semantics:
`-simplify` pct→interval (getThresholdByPct,
src/paths/mapshaper-arcs.js:541-558) and `-calc` exact median
(src/commands/mapshaper-calc.js:15 + utils).

Two-level histogram narrowing: each pass computes per-partition bin
counts inside ``map_batches`` (only a ``bins``-length int array per
partition reaches the reduce), the driver locates the bin containing
the target rank, and recursion narrows until the candidate bin holds
few enough values to gather (``gather_limit``) — so the driver never
holds the column, only one histogram and one small bin.  Exact: the
final selection runs on the gathered candidate values with numpy
partition; ties/duplicates are handled because equal values always
land in the same bin.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _minmax_count(ds, col):
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        v = df[col].to_numpy(dtype=np.float64)
        v = v[np.isfinite(v)]
        if len(v) == 0:
            return pd.DataFrame({"lo": [], "hi": [], "n": []})
        return pd.DataFrame({"lo": [v.min()], "hi": [v.max()],
                             "n": [len(v)]})
    p = ds.map_batches(partial, batch_format="pandas").to_pandas()
    if len(p) == 0 or p["n"].sum() == 0:
        return None
    return float(p["lo"].min()), float(p["hi"].max()), int(p["n"].sum())


def _apply_preds(v: np.ndarray, preds) -> np.ndarray:
    """Compose every prior round's exact bin membership (same floor
    arithmetic that counted the value — boundary-consistent)."""
    for blo, bhi, pbins, pb in preds:
        v = v[(v >= blo) & (v <= bhi)]
        pidx = np.clip(((v - blo) / (bhi - blo) * pbins)
                       .astype(np.int64), 0, pbins - 1)
        v = v[pidx == pb]
    return v


def _histogram(ds, col, lo, hi, bins, preds=()):
    width = hi - lo

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        v = df[col].to_numpy(dtype=np.float64)
        v = v[np.isfinite(v)]
        if preds:
            v = _apply_preds(v, preds)
        else:
            v = v[(v >= lo) & (v <= hi)]
        if len(v) == 0:
            return pd.DataFrame({"bin": [], "cnt": []})
        idx = np.clip(((v - lo) / width * bins).astype(np.int64),
                      0, bins - 1)
        counts = np.bincount(idx, minlength=bins)
        nz = np.nonzero(counts)[0]
        return pd.DataFrame({"bin": nz, "cnt": counts[nz]})
    p = ds.map_batches(partial, batch_format="pandas").to_pandas()
    out = np.zeros(bins, dtype=np.int64)
    if len(p):
        agg = p.groupby("bin")["cnt"].sum()
        out[agg.index.to_numpy(dtype=np.int64)] = agg.to_numpy()
    return out


def _gather_range(ds, col, lo, hi, preds=()):
    """Gather candidate values: the composed bin-membership chain when
    narrowing happened (a value on a narrowed bin boundary must not be
    both counted below (cum[b-1]) and re-gathered, which a plain range
    compare can do under float rounding), else the plain range."""
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        v = df[col].to_numpy(dtype=np.float64)
        v = v[np.isfinite(v)]
        if preds:
            v = _apply_preds(v, preds)
        else:
            v = v[(v >= lo) & (v <= hi)]
        return pd.DataFrame({col: v})
    return ds.map_batches(partial, batch_format="pandas") \
             .to_pandas()[col].to_numpy()


def kth_smallest(ds, col: str, k: int, bins: int = 4096,
                 gather_limit: int = 262144, max_rounds: int = 10):
    """Exact k-th smallest (1-based) finite value of ``ds[col]``.

    Returns None for an empty column; raises if k is out of range."""
    mmc = _minmax_count(ds, col)
    if mmc is None:
        return None
    lo, hi, n = mmc
    if not 1 <= k <= n:
        raise ValueError(f"rank {k} out of range 1..{n}")
    below = 0  # finite values in bins before the target (prior rounds)
    preds: list = []  # composed exact bin-membership chain
    for _ in range(max_rounds):
        if lo == hi or n - below <= gather_limit:
            break
        counts = _histogram(ds, col, lo, hi, bins, preds=tuple(preds))
        cum = np.cumsum(counts)
        # target bin: first bin whose cumulative count reaches k - below
        b = int(np.searchsorted(cum, k - below))
        width = hi - lo
        new_lo = lo + b * width / bins
        new_hi = lo + (b + 1) * width / bins if b < bins - 1 else hi
        if new_lo == lo and new_hi == hi:
            break  # range cannot narrow further -> gather as is
        below += int(cum[b - 1]) if b > 0 else 0
        preds.append((lo, hi, bins, b))
        lo, hi = new_lo, new_hi
        n = below + int(counts[b])
    vals = _gather_range(ds, col, lo, hi, preds=tuple(preds))
    # vals may slightly over-cover (boundary values equal to lo/hi from
    # dropped bins never occur: bins partition [lo, hi])
    kk = k - below
    if not 1 <= kk <= len(vals):
        # float-edge fallback: widen to the full range (still exact)
        vals = _gather_range(ds, col, -np.inf, np.inf)
        kk = k
    return float(np.partition(vals, kk - 1)[kk - 1])


def threshold_by_pct_ds(ds, col: str, pct: float):
    """Distributed exact retained-percentage → interval with the
    reference's rank rule (getThresholdByPct,
    src/paths/mapshaper-arcs.js:541-558): rank = floor((1-pct)*(n+2)),
    1-based k-th smallest removable threshold.  ``ds[col]`` must hold
    the removable (finite) thresholds."""
    import math
    if pct >= 1:
        return 0.0
    mmc = _minmax_count(ds, col)
    n = mmc[2] if mmc else 0
    rank = math.floor((1 - pct) * (n + 2))
    if rank <= 0 or n == 0:
        return 0.0
    if rank > n:
        return np.inf
    return kth_smallest(ds, col, rank)


def median_exact(ds, col: str):
    """Exact median with the same even-n averaging as numpy/pandas:
    mean of the two middle order statistics."""
    mmc = _minmax_count(ds, col)
    if mmc is None:
        return None
    n = mmc[2]
    hi_rank = n // 2 + 1
    hi_val = kth_smallest(ds, col, hi_rank)
    if n % 2 == 1:
        return hi_val
    lo_val = kth_smallest(ds, col, hi_rank - 1)
    return (lo_val + hi_val) / 2


def percent_rank(ds, col: str, id_col: str, n_bins: int = 256,
                 bins: str = "equidepth", sample_rows: int = 65536):
    """Per-row global percentile rank — SQL ``percent_rank()``:
    (number of strictly smaller values) / (n - 1).

    The prefix-scan shape (cf. stages/text.mix_sample) along the VALUE
    axis: one min/max/count pass, rows range-bucket by value (equal
    values always share a bucket, so ties resolve locally),
    per-bucket counts reach the driver (``n_bins`` ints), the
    exclusive prefix broadcasts back, and each bucket computes exact
    in-bucket ranks with one sort + searchsorted.  No global sort.

    ``bins="equidepth"`` (default) draws quantile bin EDGES from a
    SPREAD sample — the head of every block up to ``sample_rows``
    total, not ``limit()`` (whose first-N rows cover only the low
    range when the table is written in value order) — so heavy-tailed
    or clustered value distributions still split into balanced
    buckets; the result is exact under EITHER binning (bucketing only
    partitions the work — the rank arithmetic never sees the edges),
    pytest-enforced.  ``bins="linear"`` skips the sample pass.

    Non-finite values (null → NaN, ±inf) are EXCLUDED from the
    ranking and the output, matching SQL window semantics where NULL
    rows don't participate in percent_rank over the value order.

    Returns a Dataset (id_col, col, pct_rank).
    """
    import ray

    mm = _minmax_count(ds, col)
    if mm is None:
        import ray.data as rd
        return rd.from_items([])
    lo, hi, n = mm
    if bins == "equidepth":
        per_block = max(16, sample_rows // 256)
        samp = ds.map_batches(
            lambda df: df[[col]].head(per_block),
            batch_format="pandas").limit(sample_rows) \
            .to_pandas()[col].to_numpy(dtype=np.float64)
        samp = samp[np.isfinite(samp)]
        if len(samp) == 0:
            samp = np.array([lo, hi])
        qs = np.quantile(samp, np.linspace(0, 1, n_bins + 1)[1:-1])
        edges = np.unique(qs)  # interior edges, may be < n_bins-1
    else:
        width = (hi - lo) / n_bins or 1.0
        edges = lo + width * np.arange(1, n_bins)
    eref = ray.put(edges)

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        v = df[col].to_numpy(dtype=np.float64)
        ids = df[id_col].to_numpy()
        fin = np.isfinite(v)  # NaN/inf rows drop out of the ranking
        v, ids = v[fin], ids[fin]
        # side='right': equal values always land in the same bucket
        b = np.searchsorted(ray.get(eref), v, side="right")
        return pd.DataFrame({id_col: ids, col: v, "__b": b})

    rows = ds.map_batches(bucketize, batch_format="pandas") \
        .materialize()
    counts = rows.map_batches(
        lambda df: pd.DataFrame(
            {"b": np.arange(len(edges) + 1, dtype=np.int64),
             "c": np.bincount(df["__b"].to_numpy(),
                              minlength=len(edges) + 1)}),
        batch_format="pandas").to_pandas() \
        .groupby("b")["c"].sum().sort_index().to_numpy()
    before = np.r_[0, np.cumsum(counts)[:-1]]
    pref = ray.put(before)

    def rank_part(df: pd.DataFrame) -> pd.DataFrame:
        base = ray.get(pref)
        out = []
        for b, g in df.groupby("__b", sort=False):
            v = g[col].to_numpy()
            sv = np.sort(v)
            less = np.searchsorted(sv, v, side="left") + base[int(b)]
            out.append(pd.DataFrame({
                id_col: g[id_col].to_numpy(), col: v,
                "pct_rank": np.round(less / max(n - 1, 1), 6)}))
        return pd.concat(out, ignore_index=True) if out else \
            pd.DataFrame({id_col: [], col: [], "pct_rank": []})

    return rows.groupby("__b").map_groups(rank_part,
                                          batch_format="pandas")


def grouped_rank_buckets(ds, key: str, col: str, id_col: str,
                         n_buckets: int = 3, n_parts: int = 64):
    """Per-group exact rank buckets — the CCNet head/middle/tail
    split when ``n_buckets=3``: each row gets
    ``floor(rank0 * B / n_group)`` where rank0 is its 0-based rank
    within its group under the deterministic order (col, id).

    Scale shape: ONE bucket shuffle by group hash (every row of a
    group shares a partition — the q52 sessionize pattern), then one
    vectorized in-partition lexsort; nothing on the driver.  A single
    group far larger than a partition's memory would need the
    histogram-rank path instead (documented trade: exact within-group
    ranks need per-group total order).

    SQL-equivalent: ((row_number() OVER (PARTITION BY key ORDER BY
    col, id) - 1) * B) // (COUNT(*) OVER (PARTITION BY key)).
    """
    from .partition import bucket_part

    def emit(df: pd.DataFrame) -> pd.DataFrame:
        k = df[key].to_numpy()
        h = pd.util.hash_array(k if k.dtype != object
                               else k.astype(str))
        out = df[[key, col, id_col]].copy()
        out["__part"] = bucket_part(h, n_parts)
        return out

    def rank_part(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0 or key not in df.columns:
            # zero-row no-column block the Sort exchange can emit
            return pd.DataFrame({key: [], col: [], id_col: [],
                                 "bucket": np.empty(0, np.int64)})
        df = df.sort_values([key, col, id_col], kind="mergesort") \
            .reset_index(drop=True)
        codes, _ = pd.factorize(df[key])  # sorted -> contiguous codes
        n = np.bincount(codes)
        starts = np.r_[0, np.cumsum(n)[:-1]]
        rank0 = np.arange(len(df)) - starts[codes]
        df["bucket"] = ((rank0 * n_buckets) // n[codes]).astype(np.int64)
        return df.drop(columns="__part")

    return ds.map_batches(emit, batch_format="pandas") \
        .groupby("__part").map_groups(rank_part, batch_format="pandas")


def ntile(ds, col: str, id_col: str, n: int, n_bins: int = 256):
    """Exact SQL ``NTILE(n) OVER (ORDER BY col, id)``: equal-frequency
    binning with the first ``N % n`` tiles one row larger.  Ties
    order deterministically by ``id_col`` (plain ``ORDER BY col``
    NTILE is tie-nondeterministic — the mirror must sort the same
    way).

    Same no-global-sort shape as :func:`percent_rank`: rows
    range-bucket by value (equal values share a bucket), bucket
    counts prefix-scan on the driver, each bucket computes its rows'
    exact global row numbers with one in-bucket (value, id) lexsort,
    and the tile is pure arithmetic ``((rn-1) * n) // N + 1``.
    Non-finite values drop (NULLs don't participate in the window).
    Returns (id_col, col, tile).
    """
    import ray

    mm = _minmax_count(ds, col)
    if mm is None:
        import ray.data as rd
        return rd.from_items([])
    lo, hi, N = mm
    width = (hi - lo) / n_bins or 1.0
    edges = lo + width * np.arange(1, n_bins)
    eref = ray.put(edges)

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        v = df[col].to_numpy(dtype=np.float64)
        ids = df[id_col].to_numpy()
        fin = np.isfinite(v)
        v, ids = v[fin], ids[fin]
        b = np.searchsorted(ray.get(eref), v, side="right")
        return pd.DataFrame({id_col: ids, col: v, "__b": b})

    rows = ds.map_batches(bucketize, batch_format="pandas") \
        .materialize()
    counts = rows.map_batches(
        lambda df: pd.DataFrame(
            {"b": np.arange(len(edges) + 1, dtype=np.int64),
             "c": np.bincount(df["__b"].to_numpy(),
                              minlength=len(edges) + 1)}),
        batch_format="pandas").to_pandas() \
        .groupby("b")["c"].sum().sort_index().to_numpy()
    before = np.r_[0, np.cumsum(counts)[:-1]]
    pref = ray.put(before)

    def tile_part(df: pd.DataFrame) -> pd.DataFrame:
        base = ray.get(pref)
        out = []
        for b, g in df.groupby("__b", sort=False):
            v = g[col].to_numpy()
            ids = g[id_col].to_numpy()
            order = np.lexsort((ids, v))
            rn = np.empty(len(v), dtype=np.int64)
            rn[order] = np.arange(len(v)) + 1 + base[int(b)]
            out.append(pd.DataFrame({
                id_col: ids, col: v,
                "tile": ((rn - 1) * n) // N + 1}))
        return pd.concat(out, ignore_index=True) if out else \
            pd.DataFrame({id_col: [], col: [], "tile": []})

    return rows.groupby("__b").map_groups(tile_part,
                                          batch_format="pandas")


def rrf_fuse(rankings, id_col: str = "doc_id", k0: int = 60,
             topk: int = 20, round_to: int = 9):
    """Reciprocal-rank fusion (Cormack et al. 2009): each input
    ranking contributes 1/(k0 + rank) per doc (1-based rank in list
    order); docs absent from a list contribute 0 from it.  The inputs
    are already-reduced top-k tables from distributed rankers (BM25,
    ANN, ...), so the fuse itself is bounded driver work — the
    distributed stage is the rankers.

    Exactness: each term is one IEEE division and terms add in list
    order, so a SQL mirror summing coalesce(1.0/(k0+r_i), 0) in the
    same order reproduces ``rrf`` bit-for-bit before the final
    round."""
    import numpy as np
    import pandas as pd

    score: dict = {}
    for rdf in rankings:
        ids = rdf[id_col].to_numpy()
        for r, i in enumerate(ids, start=1):
            score[i] = score.get(i, 0.0) + 1.0 / (k0 + r)
    out = pd.DataFrame({id_col: list(score.keys()),
                        "rrf": list(score.values())})
    order = np.lexsort((out[id_col].to_numpy(), -out["rrf"].to_numpy()))
    out = out.iloc[order[:topk]].reset_index(drop=True)
    out["rrf"] = out["rrf"].round(round_to)
    return out
