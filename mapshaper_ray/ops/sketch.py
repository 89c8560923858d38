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
    "bloom_build",
    "bloom_contains",
    "incremental_dedup_bloom",
    "cms_build",
    "cms_update",
    "cms_query",
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

def pc_cast_string(arr: "pa.Array") -> "pa.Array":
    import pyarrow.compute as pc
    if not pa.types.is_string(arr.type):
        return pc.cast(arr, pa.string())
    return arr


def _arrow_value_counts(col: "pa.ChunkedArray") -> tuple:
    """(string values, int64 counts) via the Arrow hash kernel —
    zero pandas conversion, nulls dropped."""
    import pyarrow.compute as pc
    c = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if not pa.types.is_string(c.type) and \
            not pa.types.is_large_string(c.type):
        c = pc.cast(c, pa.string())
    vc = pc.value_counts(c)
    vals = vc.field("values")
    counts = vc.field("counts").to_numpy(zero_copy_only=False)
    keep = pc.is_valid(vals).to_numpy(zero_copy_only=False)
    if not keep.all():
        vals = vals.filter(pa.array(keep))
        counts = counts[keep]
    return vals, counts.astype(np.int64)


class _LocalTopM:
    """Per-block exact local value counts, top-m only (Arrow hash
    kernel end to end — no pandas conversion on the corpus pass).
    ``m=None`` keeps every distinct value (full partial counts)."""

    def __init__(self, col: str, m: int | None):
        self.col, self.m = col, m

    def __call__(self, batch: pa.Table) -> pa.Table:
        schema = pa.schema([(self.col, pa.string()),
                            ("_c", pa.int64())])
        if batch.num_rows == 0:
            return schema.empty_table()
        vals, counts = _arrow_value_counts(batch.column(self.col))
        if self.m is not None and len(counts) > self.m:
            keep = np.argpartition(-counts, self.m)[:self.m]
            vals = vals.take(pa.array(keep))
            counts = counts[keep]
        return pa.Table.from_arrays(
            [pc_cast_string(vals), pa.array(counts)], schema=schema)


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
    def cands(self) -> "pa.Array":
        if self._cands is None:
            import ray
            self._cands = pa.array(ray.get(self.cand_ref),
                                   type=pa.string())
        return self._cands

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        schema = pa.schema([(self.col, pa.string()), ("_c", pa.int64())])
        if batch.num_rows == 0:
            return schema.empty_table()
        vals, counts = _arrow_value_counts(batch.column(self.col))
        keep = pc.is_in(vals, value_set=self.cands) \
            .to_numpy(zero_copy_only=False)
        if not keep.all():
            vals = vals.filter(pa.array(keep))
            counts = counts[keep]
        return pa.Table.from_arrays(
            [pc_cast_string(vals), pa.array(counts)], schema=schema)


def _topk_full_groupby(ds, col: str, k: int,
                       driver_cap: int = 2_000_000) -> pd.DataFrame:
    """Exhaustive exact top-k: per-batch FULL value-count partials,
    reduced on the driver under ``driver_cap`` partial rows, else a
    distributed sum over the partials (still far smaller than the
    corpus) with per-block top-k + driver merge — never the native
    groupby().count() Aggregate (27 s on a 2M-row input where the
    partial reduce costs <1 s)."""
    parts = ds.map_batches(_LocalTopM(col, None),
                           batch_format="pyarrow").materialize()
    if parts.count() <= driver_cap:
        df = parts.to_pandas().groupby(col, sort=False)["_c"].sum() \
            .rename("freq").reset_index()
    else:
        sums = parts.groupby(col).sum("_c")

        def block_topk(t: pa.Table) -> pa.Table:
            if t.num_rows <= k:
                return t
            c = t.column("sum(_c)").to_numpy(zero_copy_only=False)
            keep = np.argpartition(-c, k)[:k]
            return t.take(pa.array(np.sort(keep)))

        df = sums.map_batches(block_topk, batch_format="pyarrow",
                              batch_size=None).to_pandas()
        df = df.rename(columns={"sum(_c)": "freq"})
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
    # bounded partial tables (<= n_blocks * m rows): materialize once
    # so the count gate and the reduce don't re-execute the pass
    local = ds.map_batches(_LocalTopM(col, m),
                           batch_format="pyarrow").materialize()
    if local.count() <= candidate_cap:
        # partials fit the driver: dedupe there (profiled 10x faster
        # than a Ray sort-groupby over these tiny tables — the sort
        # exchange costs seconds of fixed overhead per call)
        cands = np.unique(local.to_pandas()[col].to_numpy()).tolist()
    else:
        cand_ds = local.groupby(col).max("_c")
        if cand_ds.count() > candidate_cap:
            return _topk_full_groupby(ds, col, k)
        cands = [r[col] for r in
                 cand_ds.select_columns([col]).take_all()]
    if len(cands) > candidate_cap:
        return _topk_full_groupby(ds, col, k)
    cand_ref = ray.put(cands)

    counted = ds.map_batches(_CandidateCounts(col, cand_ref),
                             batch_format="pyarrow").materialize()
    if counted.count() <= candidate_cap:
        sums = counted.to_pandas().groupby(col, sort=False)["_c"] \
            .sum().rename("freq").reset_index()
    else:
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

# ---------------------------------------------------------------------------
# Bloom filter + bloom-gated incremental dedup
# ---------------------------------------------------------------------------

def _md5_two64(strings) -> tuple[np.ndarray, np.ndarray]:
    """Both 64-bit halves of md5 (little-endian).  The low half equals
    md5_lo64 / DuckDB md5_number_lower; the high half seeds the
    Kirsch-Mitzenmacher double-hashing scheme g_i = h1 + i*h2."""
    import hashlib
    lo = np.empty(len(strings), dtype=np.uint64)
    hi = np.empty(len(strings), dtype=np.uint64)
    for i, s in enumerate(strings):
        d = hashlib.md5(s.encode() if isinstance(s, str) else s).digest()
        lo[i] = int.from_bytes(d[8:16], "little")
        hi[i] = int.from_bytes(d[0:8], "little")
    return lo, hi


def _bloom_positions(values, k: int, n_bits: int) -> np.ndarray:
    """(n, k) bit positions via double hashing (Kirsch-Mitzenmacher
    2006: k hashes g_i = h1 + i*h2 preserve the Bloom fpr bound)."""
    h1, h2 = _md5_two64([str(v) for v in values])
    ii = np.arange(k, dtype=np.uint64)
    # uint64 arithmetic wraps mod 2^64, then reduce mod n_bits
    return ((h1[:, None] + ii[None, :] * h2[:, None])
            % np.uint64(n_bits)).astype(np.int64)


class _BloomPartial:
    """map_batches stage: one OR-able bit-array row per batch."""

    def __init__(self, col: str, n_bits: int, k: int):
        self.col, self.n_bits, self.k = col, n_bits, k

    def __call__(self, batch: pa.Table) -> pa.Table:
        bits = np.zeros(self.n_bits // 8, dtype=np.uint8)
        vals = batch.column(self.col).to_pandas()
        vals = vals[vals.notna()]
        if len(vals):
            pos = _bloom_positions(vals, self.k, self.n_bits).ravel()
            np.bitwise_or.at(bits, pos >> 3,
                             np.left_shift(np.uint8(1),
                                           (pos & 7).astype(np.uint8)))
        return pa.Table.from_arrays([pa.array([bits.tobytes()])],
                                    schema=pa.schema([("bits",
                                                       pa.binary())]))


def _or_bit_rows(batch: pa.Table) -> pa.Table:
    if batch.num_rows == 0:
        return batch
    blobs = batch.column("bits").to_pylist()
    stacked = np.vstack([np.frombuffer(b, dtype=np.uint8) for b in blobs])
    merged = np.bitwise_or.reduce(stacked, axis=0)
    return pa.Table.from_arrays([pa.array([merged.tobytes()])],
                                schema=pa.schema([("bits", pa.binary())]))


def bloom_build(ds, col: str, n_bits: int = 1 << 23, k: int = 4) -> bytes:
    """Build a Bloom filter over a column: per-block bit-array
    partials, OR-merged through a fixed-width tree (repartition to
    <=8 blocks) — the driver sees <=8 rows of n_bits/8 bytes each.
    n_bits must be a multiple of 8.  Size it ~10 bits/element for
    ~1% fpr with k=4-7; at corpus sizes where one filter would not
    broadcast, build one per hash bucket instead (the buckets of the
    downstream exchange) and ship each with its bucket."""
    if n_bits % 8:
        raise ValueError("n_bits must be a multiple of 8")
    partials = ds.map_batches(_BloomPartial(col, n_bits, k),
                              batch_format="pyarrow")
    reduced = partials.repartition(8).map_batches(
        _or_bit_rows, batch_format="pyarrow", batch_size=None)
    rows = reduced.take_all()
    stacked = np.vstack([np.frombuffer(r["bits"], dtype=np.uint8)
                         for r in rows])
    return np.bitwise_or.reduce(stacked, axis=0).tobytes()


def bloom_contains(bloom: bytes, values, k: int = 4) -> np.ndarray:
    """Vectorized membership test.  True = maybe present (false
    positives at the design fpr); False = DEFINITELY absent."""
    bits = np.frombuffer(bloom, dtype=np.uint8)
    n_bits = len(bits) * 8
    if len(values) == 0:
        return np.zeros(0, dtype=bool)
    pos = _bloom_positions(values, k, n_bits)
    hit = (bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
    return hit.all(axis=1)


class _BloomGate:
    """Split a new batch on bloom membership of its hash column.
    The filter travels as an ObjectRef (ray.put once) and resolves
    from the local object store inside each task."""

    def __init__(self, col: str, bloom_ref, k: int, keep_hits: bool):
        self.col, self.bloom_ref = col, bloom_ref
        self.k, self.keep_hits = k, keep_hits
        self._bloom = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._bloom is None:
            import ray
            self._bloom = ray.get(self.bloom_ref)
        if batch.num_rows == 0:
            return batch
        vals = batch.column(self.col).to_pandas()
        hit = bloom_contains(self._bloom, vals, self.k)
        mask = hit if self.keep_hits else ~hit
        return batch.filter(pa.array(mask))


def incremental_dedup_bloom(old_ds, new_ds, hash_col: str,
                            n_bits: int = 1 << 23, k: int = 4,
                            num_buckets: int = 32):
    """EXACT incremental dedup (new rows whose ``hash_col`` is absent
    from the old corpus), bloom-gated: rows whose hash misses the
    corpus Bloom filter are DEFINITELY new and bypass the exchange
    entirely; only bloom hits (true overlaps + the ~fpr false
    positives) enter the exact anti hash-join.  Output == the plain
    anti-join on every input (the gate is a prefilter, never a
    decision) — with overlap fraction f, the anti-join's left side
    shrinks from 100% of the new batch to ~(f + fpr).

    Both sides must already carry ``hash_col`` (e.g. content_md5).
    Returns a Dataset (definite-new union verified-new).
    """
    import ray

    from mapshaper_ray.ops.relational import hash_join

    bloom = bloom_build(old_ds, hash_col, n_bits=n_bits, k=k)
    bloom_ref = ray.put(bloom)
    definite_new = new_ds.map_batches(
        _BloomGate(hash_col, bloom_ref, k, keep_hits=False),
        batch_format="pyarrow")
    suspects = new_ds.map_batches(
        _BloomGate(hash_col, bloom_ref, k, keep_hits=True),
        batch_format="pyarrow")
    verified_new = hash_join(suspects, old_ds, on=hash_col, how="anti",
                             num_buckets=num_buckets,
                             left_cols=list(new_ds.schema().names))
    # the anti join emits pandas blocks whose empty partitions can
    # drift dtypes; cast back to the new side's Arrow schema so the
    # union sees ONE schema (the known empty-partition bug class)
    cols = list(new_ds.schema().names)
    target = getattr(new_ds.schema(), "base_schema", None)
    if not isinstance(target, pa.Schema):
        target = None

    def _rearrow(df: pd.DataFrame) -> pa.Table:
        t = pa.Table.from_pandas(df[cols], preserve_index=False)
        if target is not None:
            t = t.cast(target, safe=False)
        return t

    verified_new = verified_new.map_batches(_rearrow,
                                            batch_format="pandas")
    return definite_new.union(verified_new)


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


# ---------------------------------------------------------------------------
# persisted sketch state (incremental corpus statistics)
# ---------------------------------------------------------------------------

def save_sketch(path: str, payload: bytes, kind: str, **meta) -> None:
    """Atomically persist sketch bytes + JSON meta (kind, k/p, ...).
    Sketches are the corpus state an incremental 10^12-doc pipeline
    carries between runs — rebuilt never, merged always (Bloom bits
    OR, HLL registers max are both idempotent and commutative, so
    re-running a partially-applied update is safe)."""
    import json
    import os
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(json.dumps({"kind": kind, **meta}).encode() + b"\n")
        f.write(payload)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def load_sketch(path: str) -> tuple[bytes, dict]:
    import json
    with open(path, "rb") as f:
        meta = json.loads(f.readline())
        return f.read(), meta


def bloom_update(bloom: bytes, ds, col: str, k: int = 4) -> bytes:
    """OR-merge a new corpus slice into an existing Bloom filter —
    the incremental-dedup state update: one partial pass over the new
    slice only, the historical corpus is never re-read."""
    bits = np.frombuffer(bloom, dtype=np.uint8)
    new = bloom_build(ds, col, n_bits=len(bits) * 8, k=k)
    return np.bitwise_or(bits,
                         np.frombuffer(new, dtype=np.uint8)).tobytes()


def hll_update(registers: bytes, ds, col: str) -> bytes:
    """Max-merge a new corpus slice into existing HLL registers; the
    estimate over the union is ``hll_estimate`` of the result."""
    regs = np.frombuffer(registers, dtype=np.uint8)
    p = int(np.log2(len(regs)))
    partials = ds.map_batches(_HllPartial(col, p),
                              batch_format="pyarrow")
    rows = partials.repartition(8).map_batches(
        _merge_register_rows, batch_format="pyarrow",
        batch_size=None).take_all()
    stacked = np.vstack([regs] + [np.frombuffer(r["registers"],
                                                dtype=np.uint8)
                                  for r in rows])
    return np.maximum.reduce(stacked, axis=0).tobytes()


# ---------------------------------------------------------------------------
# Count-min sketch (Cormode & Muthukrishnan 2005, public paper)
# ---------------------------------------------------------------------------

def _cms_buckets(values, d: int, w: int) -> np.ndarray:
    """(n, d) bucket matrix with ONE md5 per value: row-j bucket =
    (h_lo + j*h_hi) mod w, Kirsch-Mitzenmacher double hashing from
    the two md5 64-bit halves — the exact values DuckDB's
    md5_number_lower / md5_number_upper compute, so a SQL oracle can
    rebuild the identical sketch (the modular identity
    (a + j*b) % w == ((a%w) + j*(b%w)) % w keeps the SQL in BIGINT
    range)."""
    lo, hi = _md5_two64([str(v) for v in values])
    j = np.arange(d, dtype=np.uint64)
    return ((lo % np.uint64(w))[:, None]
            + j[None, :] * (hi % np.uint64(w))[:, None]) \
        % np.uint64(w)


class _CmsPartial:
    """Per-batch partial: a flattened d x w bincount frame (one row
    per non-zero counter) — the corpus never shuffles, only d*w ints
    per batch move."""

    def __init__(self, col: str, d: int, w: int):
        self.col, self.d, self.w = col, d, w

    def __call__(self, batch: pa.Table) -> pa.Table:
        vals = pc_cast_string(batch.column(self.col)).to_pylist()
        b = _cms_buckets(vals, self.d, self.w)  # (n, d)
        flat = (b + np.arange(self.d, dtype=np.uint64)[None, :]
                * np.uint64(self.w)).astype(np.int64).ravel()
        counts = np.bincount(flat, minlength=self.d * self.w)
        nz = np.nonzero(counts)[0]
        return pa.table({"slot": pa.array(nz, pa.int64()),
                         "cnt": pa.array(counts[nz], pa.int64())})


def _sum_slots(batch: pa.Table) -> pa.Table:
    df = batch.to_pandas().groupby("slot", as_index=False)["cnt"] \
        .sum()
    return pa.Table.from_pandas(df, preserve_index=False)


def cms_build(ds, col: str, d: int = 4, w: int = 1024) -> np.ndarray:
    """Build a d x w count-min sketch of the value stream in ``col``:
    per-batch partial bincounts (sparse (slot, cnt) rows) tree-reduce
    through a small repartition so the driver receives <= 8 partial
    frames and holds only the d*w counter array — never the values.
    CMS is linear (counters sum), so partials merge exactly and the
    result is independent of partitioning.
    """
    rows = ds.map_batches(_CmsPartial(col, d, w),
                          batch_format="pyarrow") \
        .repartition(8).map_batches(_sum_slots,
                                    batch_format="pyarrow",
                                    batch_size=None).to_pandas()
    cms = np.zeros(d * w, dtype=np.int64)
    if len(rows):
        agg = rows.groupby("slot")["cnt"].sum()
        cms[agg.index.to_numpy(np.int64)] = agg.to_numpy(np.int64)
    return cms.reshape(d, w)


def cms_update(cms: np.ndarray, ds, col: str) -> np.ndarray:
    """Merge a new corpus slice into an existing sketch (counters are
    linear, so the sum IS the sketch of the union) — the incremental
    path for persisted sketch state alongside bloom_update/hll_update."""
    d, w = cms.shape
    return cms + cms_build(ds, col, d=d, w=w)


def cms_query(cms: np.ndarray, values) -> np.ndarray:
    """Point estimates: min over rows of the counter at each row's
    bucket — an overestimate with the standard (e/w, 1-e^-d)
    guarantee."""
    d, w = cms.shape
    b = _cms_buckets(values, d, w).astype(np.int64)  # (n, d)
    return cms[np.arange(d)[None, :], b].min(axis=1)


# ---------------------------------------------------------------------------
# DDSketch — relative-error quantiles (Masson, Rim & Lee, VLDB 2019)
# ---------------------------------------------------------------------------

DDSKETCH_GAMMA_POW = 8  # gamma = 2**(1/8)  ->  ~4.4% relative error


def _dd_buckets(x: np.ndarray, gamma_pow: int) -> tuple[np.ndarray,
                                                        np.ndarray]:
    """(sign, bucket) per value.  sign in {-1, 0, 1}; bucket =
    ceil(gamma_pow * log2(|x|)) for nonzero x, 0 for zeros — the
    DDSketch log-bucket index with gamma = 2**(1/gamma_pow), written
    base-2 so a DuckDB ``log2`` mirror is expression-identical.

    Exactness contract (the weighted_sample/q121 convention): the
    vectorized np.log2 result is re-checked with scalar math.log2 on
    the rows that land within 1e-9 of a ceil boundary, where numpy's
    SIMD log2 could round across the integer and disagree with the
    libm scalar that DuckDB calls.  Everywhere else a one-ulp
    difference cannot change ceil, so both sides bucket identically.
    """
    import math

    sign = np.sign(x).astype(np.int64)
    ax = np.abs(x)
    bucket = np.zeros(len(x), dtype=np.int64)
    nz = np.flatnonzero(sign != 0)
    if len(nz):
        v = gamma_pow * np.log2(ax[nz])
        c = np.ceil(v)
        frac = c - v  # in [0, 1): distance below the ceiling
        tol = 1e-9
        fix = np.flatnonzero((frac < tol) | (frac > 1.0 - tol))
        for j in fix:
            c[j] = math.ceil(gamma_pow * math.log2(ax[nz[j]]))
        bucket[nz] = c.astype(np.int64)
    return sign, bucket


class _DdPartial:
    """Per-batch (sign, bucket) -> count partials: the full batch
    collapses to at most a few hundred rows (the occupied buckets),
    so the corpus never shuffles."""

    def __init__(self, col: str, gamma_pow: int):
        self.col, self.gp = col, gamma_pow

    def __call__(self, batch: pa.Table) -> pa.Table:
        x = batch[self.col].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        x = x[~np.isnan(x)]
        sign, bucket = _dd_buckets(x, self.gp)
        # collision-free packing: |bucket| <= gamma_pow * 1075 << 10**6
        key = sign * (10 ** 6) + bucket
        u, cnt = np.unique(key, return_counts=True)
        s = np.rint(u / 10 ** 6).astype(np.int64)
        return pa.table({"sign": s,
                         "bucket": u - s * (10 ** 6),
                         "n": cnt.astype(np.int64)})


def ddsketch_build(ds, col: str,
                   gamma_pow: int = DDSKETCH_GAMMA_POW) -> pd.DataFrame:
    """Distributed DDSketch: returns the (sign, bucket, n) bucket
    table sorted in VALUE order (negatives by descending bucket, then
    zeros, then positives by ascending bucket).  Mergeable by
    addition, order- and partition-independent by construction.
    Bucket space is bounded (~gamma_pow * 2100 buckets spans every
    normal double), so the final reduce is a driver groupby over
    per-batch partials — the classic sketch shape, like cms_build."""
    rows = ds.map_batches(_DdPartial(col, gamma_pow),
                          batch_format="pyarrow") \
        .repartition(8).to_pandas()
    if not len(rows):
        return pd.DataFrame({"sign": np.empty(0, np.int64),
                             "bucket": np.empty(0, np.int64),
                             "n": np.empty(0, np.int64)})
    agg = rows.groupby(["sign", "bucket"], as_index=False)["n"].sum()
    order = np.lexsort((agg["sign"].to_numpy() * agg["bucket"].to_numpy(),
                        agg["sign"].to_numpy()))
    return agg.iloc[order].reset_index(drop=True) \
        .astype({"sign": np.int64, "bucket": np.int64, "n": np.int64})


def ddsketch_quantiles(sketch: pd.DataFrame,
                       qs: list[tuple[int, int]],
                       gamma_pow: int = DDSKETCH_GAMMA_POW) \
        -> pd.DataFrame:
    """Quantile lookup over a ddsketch_build table.  Each q is an
    exact rational (num, den); the target rank is the DDSketch paper's
    0-based floor(q * (n - 1)) computed in INTEGER arithmetic, so the
    selected bucket is hash-exact vs a SQL mirror (no float rank).
    Returns (q, sign, bucket, n_le) — the bucket holding the
    quantile and the cumulative count through it; the value estimate
    is sign * 2 * 2^(bucket/gp) / (2^(1/gp) + 1), left to the caller
    so the oracle-compared columns stay integer-exact."""
    n = int(sketch["n"].sum()) if len(sketch) else 0
    if n == 0:
        return pd.DataFrame(
            {"q": pd.Series([], dtype=object),
             "sign": pd.Series([], dtype=np.int64),
             "bucket": pd.Series([], dtype=np.int64),
             "n_le": pd.Series([], dtype=np.int64)})
    cum = sketch["n"].cumsum().to_numpy(np.int64)
    out = []
    for num, den in qs:
        rank = ((n - 1) * num) // den  # 0-based target rank
        i = int(np.searchsorted(cum, rank + 1, side="left"))
        out.append({"q": f"{num}/{den}",
                    "sign": int(sketch["sign"].iloc[i]),
                    "bucket": int(sketch["bucket"].iloc[i]),
                    "n_le": int(cum[i])})
    return pd.DataFrame(out)


class _DdGroupPartial:
    """Per-batch (key, sign, bucket) count partials — a batch
    collapses to (groups x occupied buckets) rows, so per-group
    quantiles cost one streaming pass like the global sketch."""

    def __init__(self, key: str, col: str, gamma_pow: int):
        self.key, self.col, self.gp = key, col, gamma_pow

    def __call__(self, batch: pa.Table) -> pa.Table:
        df = batch.select([self.key, self.col]).to_pandas()
        x = df[self.col].to_numpy(np.float64)
        ok = ~np.isnan(x)
        sign, bucket = _dd_buckets(x[ok], self.gp)
        g = pd.DataFrame({"k": df[self.key].to_numpy()[ok],
                          "sign": sign, "bucket": bucket}) \
            .groupby(["k", "sign", "bucket"], as_index=False).size() \
            .rename(columns={"size": "n"})
        return pa.Table.from_pandas(g, preserve_index=False)


def ddsketch_by_group(ds, key: str, col: str,
                      gamma_pow: int = DDSKETCH_GAMMA_POW) \
        -> pd.DataFrame:
    """Per-group DDSketch: one pass of per-batch (key, sign, bucket)
    partials + a bounded driver reduce (groups x buckets).  Returns
    the per-group bucket tables, each group's rows in value order."""
    rows = ds.map_batches(_DdGroupPartial(key, col, gamma_pow),
                          batch_format="pyarrow") \
        .repartition(8).to_pandas()
    if not len(rows):
        return pd.DataFrame({"k": [], "sign": [], "bucket": [],
                             "n": []})
    agg = rows.groupby(["k", "sign", "bucket"], as_index=False) \
        ["n"].sum()
    order = np.lexsort((agg["sign"].to_numpy() * agg["bucket"].to_numpy(),
                        agg["sign"].to_numpy(),
                        agg["k"].to_numpy()))
    return agg.iloc[order].reset_index(drop=True) \
        .astype({"sign": np.int64, "bucket": np.int64, "n": np.int64})


def ddsketch_group_quantiles(sketch: pd.DataFrame,
                             qs: list[tuple[int, int]],
                             gamma_pow: int = DDSKETCH_GAMMA_POW) \
        -> pd.DataFrame:
    """Per-group quantile walk over a ddsketch_by_group table —
    integer ranks, hash-exact vs a SQL mirror (the per-group p50/p99
    latency panel every service dashboard needs, at corpus scale)."""
    out = []
    for k, g in sketch.groupby("k", sort=True):
        g = g.reset_index(drop=True)
        r = ddsketch_quantiles(g, qs, gamma_pow)
        r.insert(0, "k", k)
        out.append(r)
    return pd.concat(out, ignore_index=True) if out else \
        pd.DataFrame({"k": [], "q": [], "sign": [], "bucket": [],
                      "n_le": []})


def ddsketch_update(sketch: pd.DataFrame, ds, col: str,
                    gamma_pow: int = DDSKETCH_GAMMA_POW) \
        -> pd.DataFrame:
    """Merge a new corpus slice into an existing DDSketch — bucket
    counts are linear, so the sum IS the sketch of the union (the
    bloom_update/hll_update/cms_update incremental contract).
    Quantiles over the merged table answer the union corpus without
    re-reading old data."""
    new = ddsketch_build(ds, col, gamma_pow)
    merged = pd.concat([sketch, new], ignore_index=True) \
        .groupby(["sign", "bucket"], as_index=False)["n"].sum()
    order = np.lexsort((merged["sign"].to_numpy()
                        * merged["bucket"].to_numpy(),
                        merged["sign"].to_numpy()))
    return merged.iloc[order].reset_index(drop=True) \
        .astype({"sign": np.int64, "bucket": np.int64, "n": np.int64})


# --------------------------------------------------------------------------
# KMV / theta sketch: mergeable distinct counting WITH set algebra
# (union / intersection / Jaccard) — the operation HLL can't do.
# Deterministic by construction (k minimum md5_number_lower values,
# no RNG), so a SQL ORDER BY hash LIMIT k mirror is value-exact.
# Public algorithm: Bar-Yossef et al. 2002 (KMV); Dasgupta et al.
# 2016 (theta sketch set operations).
# --------------------------------------------------------------------------

class _KmvPartial:
    """One blob row per batch: the batch's k smallest DISTINCT
    md5_lo64 hashes as little-endian uint64 bytes (binary blob like
    the HLL registers — exchanges never see wide ints)."""

    def __init__(self, col: str, k: int):
        self.col, self.k = col, k
        self.schema = pa.schema([("kmin", pa.binary())])

    def __call__(self, batch: pa.Table) -> pa.Table:
        vals = batch.column(self.col).to_pandas()
        vals = vals[vals.notna()]
        h = np.unique(md5_lo64([str(v) for v in vals])) \
            if len(vals) else np.empty(0, np.uint64)
        return pa.Table.from_arrays(
            [pa.array([h[:self.k].tobytes()])], schema=self.schema)


def _kmv_merge_rows(batch: pa.Table, k: int) -> pa.Table:
    if batch.num_rows == 0:
        return batch
    blobs = batch.column("kmin").to_pylist()
    merged = np.unique(np.concatenate(
        [np.frombuffer(b, dtype=np.uint64) for b in blobs]))[:k]
    return pa.Table.from_arrays(
        [pa.array([merged.tobytes()])],
        schema=pa.schema([("kmin", pa.binary())]))


def kmv_build(ds, col: str, k: int = 256) -> np.ndarray:
    """Distributed KMV sketch of ``col``: the k smallest distinct
    md5_lo64 hashes, sorted ascending (length < k means the column
    had fewer distinct values — the estimate is then EXACT).

    Scale shape: the corpus never shuffles — one <=8k-byte blob per
    block, tree-merged through repartition(8) so the driver sees at
    most 8 rows (the hll_distinct contract)."""
    partials = ds.map_batches(_KmvPartial(col, k),
                              batch_format="pyarrow")
    reduced = partials.repartition(8).map_batches(
        lambda b: _kmv_merge_rows(b, k), batch_format="pyarrow",
        batch_size=None)
    rows = reduced.take_all()
    if not rows:
        return np.empty(0, np.uint64)
    return np.unique(np.concatenate(
        [np.frombuffer(r["kmin"], dtype=np.uint64) for r in rows]))[:k]


def kmv_estimate(sk: np.ndarray, k: int) -> int:
    """Distinct estimate from a KMV sketch — pure integer arithmetic
    (the SQL mirror is ``(k-1) * 2^64 // h_k`` in HUGEINT): exact
    |set| when fewer than k distinct hashes exist, else the k-th
    minimum value estimator."""
    if len(sk) < k:
        return int(len(sk))
    hk = int(sk[k - 1])
    return ((k - 1) << 64) // hk


def kmv_union(a: np.ndarray, b: np.ndarray, k: int) -> np.ndarray:
    """Union sketch = k smallest of the merged hash sets (KMV is
    exactly union-mergeable)."""
    return np.unique(np.concatenate([a, b]))[:k]


def kmv_set_stats(a: np.ndarray, b: np.ndarray, k: int) -> dict:
    """Set-algebra estimates from two KMV sketches, every value an
    integer a SQL mirror reproduces: n_a/n_b/union estimates, the
    intersection support m = |kmin_k(A∪B) ∩ skA ∩ skB|, and
    inter_est = m * union_est // k' (k' = |union sketch|)."""
    u = kmv_union(a, b, k)
    union_est = kmv_estimate(u, k)
    m = int(np.intersect1d(np.intersect1d(u, a), b).size)
    kp = len(u)
    return {"k_used": int(kp),
            "n_a_est": kmv_estimate(a, k),
            "n_b_est": kmv_estimate(b, k),
            "union_est": union_est,
            "m_inter": m,
            "inter_est": (m * union_est) // kp if kp else 0}
