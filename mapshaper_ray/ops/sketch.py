"""Distributed mergeable sketches over Ray Datasets.

Three operators a 100-TB corpus needs constantly and none of which
should ever shuffle the corpus:

- ``hll_distinct`` / ``hll_distinct_by_group``: HyperLogLog distinct
  counting (Flajolet et al. 2007, 64-bit variant without the 32-bit
  large-range correction).  Per-batch register partials (2**p bytes
  each) are maximum-merged block-wise, then tree-reduced so the
  driver sees a handful of rows regardless of corpus size.
- ``heavy_hitters``: EXACT global top-k by frequency without a full
  vocabulary shuffle.  Phase 1 keeps each block's exact local top-m
  value counts; the union of those candidates provably contains
  every item with global frequency > N/m (if an item is outside the
  top-m of every block, then in each block i there are m items with
  local count >= its local count n_i, so m * sum(n_i) <= N).
  Phase 2 broadcasts the candidate set and recounts exactly with
  per-batch partials + a candidate-only groupby.  A guard checks the
  k-th count clears the N/m guarantee and falls back to the full
  distributed groupby when it does not, so the result is exact in
  every case.
- ``reservoir_sample``: deterministic uniform-without-replacement
  sample of n rows: rank every row by ``md5(seed:id)`` (the exact
  value DuckDB's ``md5_number_lower`` computes) and keep the n
  smallest, via per-batch partial top-n -> block merge -> driver
  final merge.  Equivalent to ``ORDER BY md5_number_lower(...)
  LIMIT n`` so a SQL oracle reproduces it value-exactly.

All hashing is md5-derived (``md5_lo64``) for oracle reproducibility.
No reference counterpart (mapshaper has no sketches); the HLL spec is
the published paper, provenance in each docstring.
"""
from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

from mapshaper_ray.stages.text import md5_lo64

__all__ = [
    "hll_distinct",
    "hll_distinct_by_group",
    "heavy_hitters",
    "reservoir_sample",
    "hll_estimate",
]

_MASK64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def _bit_length_u64(w: np.ndarray) -> np.ndarray:
    """Vectorized bit_length for uint64 (exact: frexp on <2**32 halves)."""
    hi = (w >> np.uint64(32)).astype(np.float64)
    lo = (w & np.uint64(0xFFFFFFFF)).astype(np.float64)
    bl_hi = np.frexp(hi)[1]
    bl_lo = np.frexp(lo)[1]
    return np.where(hi > 0, 32 + bl_hi, bl_lo).astype(np.int64)


def _registers_from_hashes(h: np.ndarray, p: int) -> tuple[np.ndarray,
                                                           np.ndarray]:
    """(register index, rho) per hash — HLL 64-bit split: top p bits
    pick the register, rho = leading-zero run of the remaining
    64-p bits + 1."""
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    w = h & np.uint64((1 << (64 - p)) - 1)
    rho = (64 - p) - _bit_length_u64(w) + 1
    return idx, rho.astype(np.uint8)


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_estimate(regs: np.ndarray) -> int:
    """Bias-corrected HLL estimate from a register array (uint8),
    with the small-range linear-counting correction.  Deterministic:
    the independent fixture oracle implements the same published
    formula scalar-wise."""
    m = len(regs)
    e = _alpha(m) * m * m / float(np.sum(np.exp2(-regs.astype(np.float64))))
    v = int(np.count_nonzero(regs == 0))
    if v > 0 and e <= 2.5 * m:
        e = m * math.log(m / v)
    return int(round(e))


class _HllPartial:
    """map_batches stage: one register-array row per batch."""

    def __init__(self, col: str, p: int):
        self.col, self.p = col, p
        self.schema = pa.schema([("registers", pa.binary())])

    def __call__(self, batch: pa.Table) -> pa.Table:
        regs = np.zeros(1 << self.p, dtype=np.uint8)
        vals = batch.column(self.col).to_pandas()
        vals = vals[vals.notna()]
        if len(vals):
            h = md5_lo64([str(v) for v in vals])
            idx, rho = _registers_from_hashes(h, self.p)
            np.maximum.at(regs, idx, rho)
        return pa.Table.from_arrays([pa.array([regs.tobytes()])],
                                    schema=self.schema)


def _merge_register_rows(batch: pa.Table) -> pa.Table:
    if batch.num_rows == 0:
        return batch
    blobs = batch.column("registers").to_pylist()
    stacked = np.vstack([np.frombuffer(b, dtype=np.uint8) for b in blobs])
    merged = np.maximum.reduce(stacked, axis=0)
    return pa.Table.from_arrays([pa.array([merged.tobytes()])],
                                schema=pa.schema([("registers",
                                                   pa.binary())]))


def hll_distinct(ds, col: str, p: int = 12) -> pd.DataFrame:
    """Approximate COUNT(DISTINCT col) via HyperLogLog.

    Scale shape: the corpus never shuffles — each block contributes
    one 2**p-byte register row; a fixed-width tree merge
    (repartition to <=8 blocks, block-wise maximum) bounds what the
    driver sees at 8 rows no matter how many input blocks exist.
    """
    partials = ds.map_batches(_HllPartial(col, p), batch_format="pyarrow")
    reduced = partials.repartition(8).map_batches(
        _merge_register_rows, batch_format="pyarrow", batch_size=None)
    rows = reduced.take_all()
    stacked = np.vstack([np.frombuffer(r["registers"], dtype=np.uint8)
                         for r in rows])
    est = hll_estimate(np.maximum.reduce(stacked, axis=0))
    return pd.DataFrame({"n_distinct_est": pd.array([est], dtype="int64")})


class _HllGroupPartial:
    """map_batches stage: one (key, registers) row per (batch, group)."""

    def __init__(self, key: str, col: str, p: int):
        self.key, self.col, self.p = key, col, p

    def __call__(self, batch: pa.Table) -> pa.Table:
        df = batch.select([self.key, self.col]).to_pandas()
        df = df[df[self.col].notna()]
        schema = pa.schema([(self.key, batch.schema.field(self.key).type),
                            ("registers", pa.binary())])
        if not len(df):
            return schema.empty_table()
        codes, uniques = pd.factorize(df[self.key], sort=True)
        h = md5_lo64([str(v) for v in df[self.col]])
        idx, rho = _registers_from_hashes(h, self.p)
        regs = np.zeros((len(uniques), 1 << self.p), dtype=np.uint8)
        np.maximum.at(regs, (codes, idx), rho)
        return pa.Table.from_arrays(
            [pa.array(uniques), pa.array([r.tobytes() for r in regs])],
            schema=schema)


def hll_distinct_by_group(ds, key: str, col: str, p: int = 12) \
        -> pd.DataFrame:
    """Per-group approximate distinct counts: group register partials
    merge under ``groupby(key)`` — the shuffle moves 2**p bytes per
    (block, group), never the corpus."""
    partials = ds.map_batches(_HllGroupPartial(key, col, p),
                              batch_format="pyarrow")

    def merge_group(g: pd.DataFrame) -> pd.DataFrame:
        stacked = np.vstack([np.frombuffer(b, dtype=np.uint8)
                             for b in g["registers"]])
        est = hll_estimate(np.maximum.reduce(stacked, axis=0))
        return pd.DataFrame({key: [g[key].iloc[0]],
                             "n_distinct_est": pd.array([est],
                                                        dtype="int64")})

    out = partials.groupby(key).map_groups(merge_group,
                                           batch_format="pandas")
    return out.to_pandas().sort_values(key).reset_index(drop=True)


# ---------------------------------------------------------------------------
# exact heavy hitters via local-top-m candidate pruning
# ---------------------------------------------------------------------------

class _LocalTopM:
    """Per-block exact local value counts, top-m only."""

    def __init__(self, col: str, m: int):
        self.col, self.m = col, m

    def __call__(self, batch: pa.Table) -> pa.Table:
        schema = pa.schema([(self.col, pa.string()),
                            ("_c", pa.int64())])
        if batch.num_rows == 0:
            return schema.empty_table()
        vals = batch.column(self.col).to_pandas().astype(str)
        vc = vals.value_counts().iloc[:self.m]
        return pa.Table.from_arrays(
            [pa.array(vc.index.to_numpy(dtype=object), type=pa.string()),
             pa.array(vc.to_numpy(dtype=np.int64))], schema=schema)


class _CandidateCounts:
    """Per-batch exact counts restricted to the broadcast candidates.
    The candidate set travels as an ObjectRef (``ray.put`` once) and
    resolves lazily from the local object store inside the task —
    never re-shipped per batch."""

    def __init__(self, col: str, cand_ref):
        self.col = col
        self.cand_ref = cand_ref
        self._cands = None

    @property
    def cands(self):
        if self._cands is None:
            import ray
            self._cands = frozenset(ray.get(self.cand_ref))
        return self._cands

    def __call__(self, batch: pa.Table) -> pa.Table:
        schema = pa.schema([(self.col, pa.string()), ("_c", pa.int64())])
        if batch.num_rows == 0:
            return schema.empty_table()
        vals = batch.column(self.col).to_pandas().astype(str)
        vc = vals[vals.isin(self.cands)].value_counts()
        return pa.Table.from_arrays(
            [pa.array(vc.index.to_numpy(dtype=object), type=pa.string()),
             pa.array(vc.to_numpy(dtype=np.int64))], schema=schema)


def _topk_full_groupby(ds, col: str, k: int) -> pd.DataFrame:
    counts = ds.groupby(col).count()
    df = counts.to_pandas()
    cnt_col = [c for c in df.columns if c != col][0]
    df[col] = df[col].astype(str)
    df = df.rename(columns={cnt_col: "freq"})
    df["freq"] = df["freq"].astype("int64")
    df = df.sort_values(["freq", col], ascending=[False, True]).head(k)
    return df.reset_index(drop=True)


def heavy_hitters(ds, col: str, k: int = 20, m: int = 4096,
                  candidate_cap: int = 2_000_000) -> pd.DataFrame:
    """EXACT top-k values by frequency with deterministic tie-break
    (freq desc, value asc), without shuffling the corpus.

    Phase 1: per-block exact local top-m counts -> distributed
    distinct over those candidate values only.  Phase 2: broadcast
    the candidate set (``ray.put`` once), per-batch exact counts of
    candidates, candidate-only groupby sum.  Exactness guard: the
    k-th count must exceed N/m (the pruning guarantee's threshold) or
    we fall back to the full distributed groupby.  The candidate
    distinct count is gated at ``candidate_cap`` before anything is
    collected to the driver.
    """
    import ray

    n_total = ds.count()
    local = ds.map_batches(_LocalTopM(col, m), batch_format="pyarrow")
    cand_ds = local.groupby(col).max("_c")
    n_cands = cand_ds.count()
    if n_cands > candidate_cap:
        return _topk_full_groupby(ds, col, k)
    cands = [r[col] for r in cand_ds.select_columns([col]).take_all()]
    cand_ref = ray.put(cands)

    counted = ds.map_batches(_CandidateCounts(col, cand_ref),
                             batch_format="pyarrow")
    sums = counted.groupby(col).sum("_c").to_pandas()
    sum_col = [c for c in sums.columns if c != col][0]
    sums = sums.rename(columns={sum_col: "freq"})
    sums["freq"] = sums["freq"].astype("int64")
    sums = sums.sort_values(["freq", col],
                            ascending=[False, True]).head(k)
    sums = sums.reset_index(drop=True)
    # pruning guarantee: every non-candidate has freq <= N/m, so the
    # candidate top-k is the true top-k iff the k-th kept count
    # strictly exceeds N/m (and we actually kept k rows).  Otherwise
    # recount exhaustively — the result stays exact in every case.
    if len(sums) < k or sums["freq"].iloc[-1] * m <= n_total:
        return _topk_full_groupby(ds, col, k)
    return sums


# ---------------------------------------------------------------------------
# deterministic reservoir sampling
# ---------------------------------------------------------------------------

class _SampleTopN:
    """Keep the n rows with the smallest md5(seed:id) rank.  Works
    both as the per-batch partial (ranks computed) and the merge
    stage (ranks already present)."""

    def __init__(self, id_col: str, n: int, seed: int):
        self.id_col, self.n, self.seed = id_col, n, seed

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            if "_rk" not in batch.schema.names:
                batch = batch.append_column(
                    "_rk", pa.array([], type=pa.uint64()))
            return batch
        if "_rk" not in batch.schema.names:
            ids = batch.column(self.id_col).to_pandas()
            rk = md5_lo64([f"{self.seed}:{v}" for v in ids])
            batch = batch.append_column("_rk", pa.array(rk,
                                                        type=pa.uint64()))
        rk = batch.column("_rk").to_numpy()
        if len(rk) > self.n:
            keep = np.argpartition(rk, self.n)[:self.n]
            batch = batch.take(pa.array(np.sort(keep)))
        return batch


def reservoir_sample(ds, n: int, id_col: str, seed: int = 7,
                     columns: list[str] | None = None) -> pd.DataFrame:
    """Deterministic uniform sample of n rows: global n-smallest by
    ``md5_number_lower(f"{seed}:{id}")``.  Per-batch partial top-n ->
    8-block merge -> driver final top-n, so the driver holds at most
    8n rows.  Output carries ``sample_rank`` (0..n-1 in rank order)
    for a stable row order the SQL oracle reproduces with
    ``row_number() OVER (ORDER BY md5_number_lower(...))``."""
    stage = _SampleTopN(id_col, n, seed)
    parts = ds.map_batches(stage, batch_format="pyarrow")
    merged = parts.repartition(8).map_batches(
        stage, batch_format="pyarrow", batch_size=None)
    df = merged.to_pandas()
    df = df.nsmallest(n, "_rk").sort_values(["_rk", id_col])
    df = df.drop(columns=["_rk"]).reset_index(drop=True)
    df.insert(0, "sample_rank", np.arange(len(df), dtype=np.int64))
    if columns is not None:
        df = df[["sample_rank"] + columns]
    return df
