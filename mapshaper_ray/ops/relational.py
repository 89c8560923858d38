"""Relational operator layer — the data-side of the reference's commands.

Maps (SURVEY.md §2):
- ``each_expr`` / ``filter_expr``   → -each / -filter expression engine
  (src/data/mapshaper-expressions.js:76): string expression compiled once,
  evaluated VECTORIZED over a pandas batch namespace (numpy funcs
  available), not per row.
- ``groupby_agg``                   → -dissolve data aggregation
  (src/data/mapshaper-data-aggregation.js:39-81): partial per-batch
  pre-aggregation inside map_batches, then a small groupby over partials —
  the shuffle moves one row per (key, batch) instead of every row.
- ``broadcast_join``                → -join with a small source table
  (src/commands/mapshaper-join.js:54): ray.put once, pandas merge per batch.
- ``hash_join``                     → large-large -join: explicit bucketed
  hash join (hash both sides on the key into B buckets, join bucket-wise
  inside map_groups).
- ``calc_stats``                    → -calc (src/commands/mapshaper-calc.js:15)
  whole-layer stats incl. exact median (reference findMedian averages the
  two middle ranks, lib/mbloch-utils.js:944-951).
- ``uniq_first``                    → -uniq keep-first
  (src/commands/mapshaper-uniq.js:6-35): order-dependent distinct via
  explicit order column.
- ``sort_topk``                     → -sort + head: per-batch partial top-k
  then tiny final sort (no full shuffle).
- ``window_tumbling``               → event-time tumbling window aggregate
  (streaming-shaped; Ray Data has no watermarks — SURVEY.md §2.8).
"""

from __future__ import annotations

import math
import re

import numpy as np
import pandas as pd
import pyarrow as pa


# ---------------------------------------------------------------------------
# expression engine

_EXPR_GLOBALS = {
    "np": np, "abs": np.abs, "sqrt": np.sqrt, "log": np.log, "exp": np.exp,
    "floor": np.floor, "ceil": np.ceil, "round": np.round,
    "minimum": np.minimum, "maximum": np.maximum, "where": np.where,
}


def include_defs(source) -> dict:
    """-include: load a dict of names (constants / functions) into the
    expression environment (reference internal.include,
    src/commands/mapshaper-include.js:3-33 — a JS object merged into
    the 'defs' state var).  ``source`` is a dict, or a path to a Python
    file whose module-level names become defs (private names skipped).
    The returned dict is passed to each_expr/filter_expr as ``defs=``
    and ships to workers via closure serialization."""
    if isinstance(source, dict):
        return dict(source)
    with open(source) as f:
        code = f.read()
    # one namespace for globals AND locals so def'd functions can see
    # the module-level names they reference
    ns: dict = {"np": np, "pd": pd}
    exec(compile(code, str(source), "exec"), ns)
    return {k: v for k, v in ns.items()
            if not k.startswith("_") and k not in ("np", "pd")}


def compile_expression(expr: str, defs: dict | None = None):
    """String → vectorized evaluator over a pandas DataFrame namespace.
    Same user surface as the reference's compileFeatureExpression (column
    names are bare variables); compiled once, applied per batch.
    ``defs`` adds -include / -colorizer names to the environment.

    Reference-syntax JavaScript expressions (ternaries, `&&`/`||`,
    `===`, string methods, `Math.*`, `d.`/`this.properties.`/`$.`
    access) are detected and routed to the row-wise JS compatibility
    evaluator (`ops/jsexpr.py`) — correct but unvectorized; the Python
    DSL stays the hot path."""
    from .jsexpr import compile_js_expression, looks_js
    if looks_js(expr):
        return compile_js_expression(expr, defs)
    code = compile(expr, "<expr>", "eval")
    base = dict(_EXPR_GLOBALS)
    if defs:
        base.update(defs)

    def run(df: pd.DataFrame):
        env = {c: df[c] for c in df.columns}
        return eval(code, dict(base), env)
    return run


# geometry accessor names usable INSIDE expressions (the reference's
# feature proxy $.area / $.centroidX / $.bounds / $.width / $.height /
# $.innerX / $.innerY / $.isNull / $.x / $.y —
# src/data/mapshaper-feature-proxy.js:15-158); referencing one
# triggers a metric-computation pass before evaluation.
#
# JS expressions: reference-syntax strings (ternary, ===, &&/||,
# string methods, Math.*, this.properties./$. access) are detected by
# ops/jsexpr.looks_js and evaluated row-wise by the compatibility
# layer with JS value semantics — byte-parity-tested against the live
# reference CLI (test_each_filter_js_expressions_bytes_identical).
# The vectorized Python DSL equivalents stay the hot path:
#   d.name.toUpperCase()   → name.str.upper()     (pandas Series ops)
#   d.name.indexOf('x')>-1 → name.str.contains('x')
#   cond ? a : b           → where(cond, a, b)
# Cross-row-stateful JS (counts[type] = ... accumulating across
# features) remains unsupported: it is single-threaded by construction
# in the reference and cannot distribute.
_GEO_ACCESSORS = ("area", "perimeter", "cx", "cy", "part_count",
                  "bounds", "width", "height", "innerX", "innerY",
                  "isNull", "x", "y", "vertex_count")


def _needs_geo(ds, exprs) -> list[str]:
    """Accessor names referenced by the expressions and absent from the
    dataset.  ds.schema() is consulted ONLY when an accessor name
    appears (it can trigger first-block execution on a lazy plan)."""
    import ast
    from .jsexpr import js_accessor_names, looks_js
    needed = set()
    for e in exprs:
        if looks_js(e):
            # JS-syntax expression: $.partCount-style accessors map to
            # the engine's metric columns
            needed |= js_accessor_names(e) & set(_GEO_ACCESSORS)
            continue
        try:
            tree = ast.parse(e, mode="eval")
        except SyntaxError:
            continue
        names = {n.id for n in ast.walk(tree) if isinstance(n, ast.Name)}
        needed |= names & set(_GEO_ACCESSORS)
    if not needed:
        return []
    cols = set(ds.schema().names)
    return [n for n in needed if n not in cols]


def _with_geo_columns(ds, names):
    """Precompute requested geometry metrics as columns (the engine's
    column-first equivalent of lazy $.x accessors)."""
    if not names:
        return ds
    from .features import add_polygon_metrics, centroids
    cols = set(ds.schema().names)
    if ("area" in names or "perimeter" in names) and "rings_x" in cols:
        ds = add_polygon_metrics(ds, area_col="area",
                                 perimeter_col="perimeter")
    if ("cx" in names or "cy" in names) and "rings_x" in cols:
        ds = centroids(ds)
    if "part_count" in names:
        def pc_col(df: pd.DataFrame) -> pd.DataFrame:
            from ..sources.layers import nz
            geom = next((c for c in ("rings_x", "part_x", "px")
                         if c in df.columns), None)
            df = df.copy()
            df["part_count"] = [len(nz(v)) for v in df[geom]] \
                if geom else 0
            return df
        ds = ds.map_batches(pc_col, batch_format="pandas")
    bbox_like = {"bounds", "width", "height", "isNull", "vertex_count"}
    if bbox_like & set(names):
        def bbox_cols(df: pd.DataFrame, want=set(names) & bbox_like
                      ) -> pd.DataFrame:
            from ..sources.layers import nz
            geom = next((c for c in ("rings_x", "part_x", "px")
                         if c in df.columns), None)
            df = df.copy()
            bs, nv = [], []
            for v in (df[geom] if geom else []):
                parts = nz(v)
                if geom == "px":
                    parts = [parts] if len(np.atleast_1d(parts)) else []
                xs = [np.asarray(p, float) for p in parts]
                n = int(sum(len(a) for a in xs))
                nv.append(n)
                bs.append(None if n == 0 else
                          (min(a.min() for a in xs),
                           max(a.max() for a in xs)))
            ys = []
            ygeom = {"rings_x": "rings_y", "part_x": "part_y",
                     "px": "py"}.get(geom)
            for v in (df[ygeom] if ygeom else []):
                parts = nz(v)
                if ygeom == "py":
                    parts = [parts] if len(np.atleast_1d(parts)) else []
                ya = [np.asarray(p, float) for p in parts]
                ys.append(None if not ya or not sum(len(a) for a in ya)
                          else (min(a.min() for a in ya),
                                max(a.max() for a in ya)))
            if not geom:
                bs = [None] * len(df)
                ys = [None] * len(df)
                nv = [0] * len(df)
            if "isNull" in want:
                df["isNull"] = [b is None for b in bs]
            if "vertex_count" in want:
                df["vertex_count"] = nv
            if "bounds" in want:  # [xmin, ymin, xmax, ymax]; null
                # shapes get [] like the reference $.bounds
                df["bounds"] = [[] if b is None else
                                [b[0], yv[0], b[1], yv[1]]
                                for b, yv in zip(bs, ys)]
            if "width" in want:
                df["width"] = [0.0 if b is None else b[1] - b[0]
                               for b in bs]
            if "height" in want:
                df["height"] = [0.0 if y is None else y[1] - y[0]
                                for y in ys]
            return df
        ds = ds.map_batches(bbox_cols, batch_format="pandas")
    if ("innerX" in names or "innerY" in names):
        def inner_cols(df: pd.DataFrame) -> pd.DataFrame:
            from ..ops.anchor import anchor_point
            from ..sources.layers import nz
            df = df.copy()
            ix, iy = [], []
            for rx, ry in zip(df.get("rings_x", []),
                              df.get("rings_y", [])):
                rings = [(np.asarray(x, float), np.asarray(y, float))
                         for x, y in zip(nz(rx), nz(ry))]
                if rings:
                    p = anchor_point(rings)
                    ix.append(float(p[0]))
                    iy.append(float(p[1]))
                else:
                    ix.append(np.nan)
                    iy.append(np.nan)
            df["innerX"] = ix if len(ix) == len(df) else np.nan
            df["innerY"] = iy if len(iy) == len(df) else np.nan
            return df
        ds = ds.map_batches(inner_cols, batch_format="pandas")
    if ("x" in names or "y" in names):
        def xy_cols(df: pd.DataFrame) -> pd.DataFrame:
            # $.x/$.y — first coordinate of the shape (the reference
            # proxy's point get; setters handled in each_expr)
            from ..sources.layers import nz
            df = df.copy()
            if "px" in df.columns:
                df["x"] = [np.asarray(nz(v), float).ravel()[0]
                           if len(np.atleast_1d(nz(v))) else np.nan
                           for v in df["px"]]
                df["y"] = [np.asarray(nz(v), float).ravel()[0]
                           if len(np.atleast_1d(nz(v))) else np.nan
                           for v in df["py"]]
            else:
                geom = "rings_x" if "rings_x" in df.columns else "part_x"
                gy = "rings_y" if geom == "rings_x" else "part_y"
                df["x"] = [np.asarray(nz(v)[0], float)[0]
                           if nz(v) else np.nan for v in df[geom]]
                df["y"] = [np.asarray(nz(v)[0], float)[0]
                           if nz(v) else np.nan for v in df[gy]]
            return df
        ds = ds.map_batches(xy_cols, batch_format="pandas")
    return ds


def deterministic_sample(ds, fraction: float, id_col: str = "doc_id",
                         seed: int = 7):
    """Seeded, PARTITION-INDEPENDENT row sample: keep rows whose
    md5-hash of ``f"{seed}:{id}"`` falls under ``fraction`` of the
    2^64 key space.  Unlike per-task RNG sampling, membership is a
    pure function of the row id — reproducible across block layouts,
    cluster sizes and reruns, and reproducible by a DuckDB
    ``md5_number_lower`` oracle (q46)."""
    from ..stages.text import hash_tokens
    cut = np.uint64(int(fraction * float(2 ** 64 - 1)))

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        toks = [f"{seed}:{v}" for v in df[id_col]]
        h = hash_tokens(toks)
        return df[h < cut]
    return ds.map_batches(keep, batch_format="pandas")


def each_expr(ds, assignments: dict[str, str], defs: dict | None = None):
    """-each: add/overwrite computed columns (vectorized).  Geometry
    accessors (area, perimeter, cx, cy, part_count, bounds, width,
    height, innerX/innerY, isNull, x, y, vertex_count) may appear in
    the expressions; the needed metric columns compute automatically.
    Assigning to ``x`` / ``y`` on a POINT layer moves the geometry
    (the reference proxy's $.x/$.y setters)."""
    setters = {"x", "y"} & set(assignments)
    geo_names = set(_needs_geo(ds, assignments.values()))
    if setters and "px" in ds.schema().names:
        geo_names |= setters          # need current values to assign
    ds = _with_geo_columns(ds, sorted(geo_names))
    fns = {name: compile_expression(e, defs)
           for name, e in assignments.items()}
    move_points = bool(setters) and "px" in ds.schema().names

    def apply(df: pd.DataFrame) -> pd.DataFrame:
        for name, fn in fns.items():
            df[name] = fn(df)
        if move_points:
            # single-point features: write x/y back into px/py (the
            # reference mutates the shape; multipoint moves all by
            # rewriting every coordinate to the scalar is wrong, so
            # only the first/only point moves — reference $.x setter
            # also addresses coordinates[0])
            from ..sources.layers import nz
            if "x" in df.columns and "x" in setters:
                df["px"] = [[float(xv), *np.asarray(nz(old),
                                                    float).ravel()[1:]]
                            for xv, old in zip(df["x"], df["px"])]
            if "y" in df.columns and "y" in setters:
                df["py"] = [[float(yv), *np.asarray(nz(old),
                                                    float).ravel()[1:]]
                            for yv, old in zip(df["y"], df["py"])]
            df = df.drop(columns=[c for c in setters
                                  if c in df.columns])
        return df
    return ds.map_batches(apply, batch_format="pandas")


def filter_expr(ds, expr: str, defs: dict | None = None):
    """-filter: keep rows where the boolean expression holds.  Geometry
    accessors auto-compute (see each_expr)."""
    ds = _with_geo_columns(ds, _needs_geo(ds, [expr]))
    fn = compile_expression(expr, defs)

    def apply(df: pd.DataFrame) -> pd.DataFrame:
        return df[np.asarray(fn(df), dtype=bool)]
    return ds.map_batches(apply, batch_format="pandas")


# ---------------------------------------------------------------------------
# grouped aggregation with partial pre-aggregation

_DISTRIBUTIVE = {"sum", "count", "min", "max"}


def groupby_agg(ds, keys: list[str], aggs: dict[str, tuple[str, str]],
                final: str = "driver"):
    """aggs: out_col -> (in_col, fn) with fn in sum|count|min|max|mean|first.

    Two-phase: per-batch pandas groupby emits partials (sum+count for
    mean; min order idx for first), then a final reduce over the
    partials.  ``final="driver"`` (default) pulls the partials — one row
    per (key, batch), NOT per input row — to the driver and reduces in
    pandas: right whenever key cardinality is bounded (a Ray sort-based
    groupby shuffle costs seconds even on tiny partials).
    ``final="distributed"`` keeps the reduce as a Ray groupby for
    unbounded key spaces.
    """
    partial_specs = {}
    for out, (col, fn) in aggs.items():
        if fn == "mean":
            partial_specs[f"__{out}_sum"] = (col, "sum")
            partial_specs[f"__{out}_cnt"] = (col, "count")
        elif fn in ("var", "std"):
            # sample variance from (sum, sum-of-squares, count)
            # partials — every piece sum-reducible, so var/std stay
            # one-pass distributive like mean
            partial_specs[f"__{out}_sum"] = (col, "sum")
            partial_specs[f"__{out}_sumsq"] = (col, "sumsq")
            partial_specs[f"__{out}_cnt"] = (col, "count")
        else:
            partial_specs[out] = (col, fn)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        sq = {col for _, (col, fn) in partial_specs.items()
              if fn == "sumsq"}
        if sq:
            df = df.assign(**{
                f"__sq_{c}": df[c].to_numpy(dtype=np.float64) ** 2
                for c in sq})
        g = df.groupby(keys, sort=False, dropna=False)
        cols = {}
        for out, (col, fn) in partial_specs.items():
            if fn == "count":
                cols[out] = g[col].count()
            elif fn == "first":
                cols[out] = g[col].first()
            elif fn == "sumsq":
                cols[out] = g[f"__sq_{col}"].sum()
            else:
                cols[out] = getattr(g[col], fn)()
        return pd.DataFrame(cols).reset_index()

    partials = ds.map_batches(partial, batch_format="pandas")

    def final_fn(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(keys, sort=False, dropna=False)
        cols = {}
        for out, (col, fn) in partial_specs.items():
            if fn in ("sum", "count", "sumsq"):
                cols[out] = g[out].sum()
            elif fn == "min":
                cols[out] = g[out].min()
            elif fn == "max":
                cols[out] = g[out].max()
            elif fn == "first":
                cols[out] = g[out].first()
        res = pd.DataFrame(cols).reset_index()
        for out, (col, fn) in aggs.items():
            if fn == "mean":
                res[out] = res[f"__{out}_sum"] / res[f"__{out}_cnt"]
                res = res.drop(columns=[f"__{out}_sum", f"__{out}_cnt"])
            elif fn in ("var", "std"):
                n = res[f"__{out}_cnt"].to_numpy(dtype=np.float64)
                s = res[f"__{out}_sum"].to_numpy(dtype=np.float64)
                ss = res[f"__{out}_sumsq"].to_numpy(dtype=np.float64)
                with np.errstate(invalid="ignore", divide="ignore"):
                    v = (ss - s * s / n) / (n - 1)
                    v = np.where(n > 1, np.maximum(v, 0.0), np.nan)
                    res[out] = np.sqrt(v) if fn == "std" else v
                res = res.drop(columns=[f"__{out}_sum",
                                        f"__{out}_sumsq",
                                        f"__{out}_cnt"])
        return res

    # intermediate combine: partial blocks are tiny, so Ray's input
    # bundling (target_min_block_size) merges ~50 of them per combine
    # task — the driver then reduces 50x fewer rows.  Valid whenever all
    # partial columns are re-aggregable (sum/count->sum, min, max);
    # 'first' partials are order-sensitive, so they skip the combine.
    if all(fn in ("sum", "count", "min", "max", "sumsq")
           for _, fn in partial_specs.values()):
        def combine(df: pd.DataFrame) -> pd.DataFrame:
            g = df.groupby(keys, sort=False, dropna=False)
            cols = {}
            for out, (col, fn) in partial_specs.items():
                if fn in ("sum", "count", "sumsq"):
                    cols[out] = g[out].sum()
                else:
                    cols[out] = getattr(g[out], fn)()
            return pd.DataFrame(cols).reset_index()
        partials = partials.map_batches(combine, batch_format="pandas")

    if final == "driver":
        import ray.data as rd
        pdf = partials.to_pandas()
        return rd.from_pandas(final_fn(pdf)) if len(pdf) else \
            rd.from_pandas(pdf)
    # distributed final reduce: shuffle the (small) partials once
    return partials.groupby(keys).map_groups(final_fn,
                                             batch_format="pandas")


# ---------------------------------------------------------------------------
# joins

def broadcast_join(big_ds, small_df: pd.DataFrame, on, how="inner",
                   suffix="_r"):
    """Small side shipped once via ray.put; pandas merge per batch."""
    import ray
    ref = ray.put(small_df)

    class Joiner:
        def __init__(self):
            self.small = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            return df.merge(self.small, on=on, how=how, suffixes=("", suffix))

    return big_ds.map_batches(Joiner, batch_format="pandas",
                              concurrency=(1, 8))


def hash_join(left_ds, right_ds, on: str, how="inner", num_buckets=32,
              left_cols=None, right_cols=None, native=False):
    """Large-large join.  Default: the explicit bucketed hash join below
    — measured 16x FASTER than Ray 2.49's native ``Dataset.join`` at
    sf0.1 (3.4s vs 55s; the native hash-shuffle spins up per-partition
    aggregator actors whose startup dominates at this scale).  Pass
    ``native=True`` for the built-in operator (the right choice when
    both sides are far larger than the aggregator spin-up cost)."""
    if native and hasattr(left_ds, "join") \
            and how not in ("semi", "anti"):
        if left_cols:
            left_ds = left_ds.select_columns(
                list(dict.fromkeys(left_cols + [on])))
        if right_cols:
            right_ds = right_ds.select_columns(
                list(dict.fromkeys(right_cols + [on])))
        return left_ds.join(right_ds, join_type=how,
                            num_partitions=num_buckets, on=(on,),
                            right_suffix="_r")
    return hash_join_bucketed(left_ds, right_ds, on, how, num_buckets,
                              left_cols, right_cols)


def hash_join_bucketed(left_ds, right_ds, on, how="inner",
                       num_buckets=32, left_cols=None, right_cols=None):
    """Explicit partitioned hash join: bucket = hash(key) % B on both
    sides, union with a side tag, groupby bucket, merge per bucket.
    The portable large-large join pattern (one shuffle per side).
    ``on`` may be one column name or a LIST of names (composite key:
    buckets hash the column tuple via hash_pandas_object, the
    per-bucket merge joins on the full list)."""
    on_cols = [on] if isinstance(on, str) else list(on)
    # Dataset.union aligns schemas by null-padding, so each side's real
    # columns must be captured up front (schema() is metadata-only).
    l_names = left_cols or [c for c in left_ds.schema().names]
    r_names = right_cols or [c for c in right_ds.schema().names]

    # Arrow-native stampers: the tagged blocks feed the Sort exchange
    # (the join's dominant cost — profiled at sf0.1: Sort 5.4s vs
    # <0.7s per UDF stage), and Arrow blocks shuffle zero-copy where
    # pandas blocks pay a conversion on every exchange boundary.  The
    # bucket hash itself stays pd.util.hash_array (stable across both
    # sides for int and string keys alike).
    import pyarrow as pa

    # each side's declared dtypes (metadata-only): the union's NaN
    # padding degrades int columns to float inside mixed sorted
    # blocks, and a CHAINED join hashing float keys on one side and
    # int on the other scatters equal keys to different buckets
    # (found by q115's orders⋈cust output feeding lineitem⋈) — so
    # the per-bucket split below restores these dtypes before merge
    def _types(ds):
        s = ds.schema()
        out = {}
        for n, t in zip(s.names, s.types):
            try:
                out[n] = t.to_pandas_dtype()
            except Exception:  # extension/list types: leave as-is
                pass
        return out

    l_types, r_types = _types(left_ds), _types(right_ds)

    def _canon_keys(keys: np.ndarray) -> np.ndarray:
        # integral-valued float keys hash as ints so they land in the
        # same bucket as genuine int keys (pandas merge matches them)
        if getattr(keys.dtype, "kind", "") == "f" \
                and len(keys) and np.isfinite(keys).all() \
                and (keys == np.round(keys)).all():
            return keys.astype(np.int64)
        return keys

    def tag(side):
        def fn(t: "pa.Table") -> "pa.Table":
            cols = l_names if side == 0 else r_names
            t = t.select(list(dict.fromkeys(cols + on_cols)))
            if len(on_cols) == 1:
                keys = _canon_keys(t.column(on_cols[0])
                                   .to_numpy(zero_copy_only=False))
                hashed = pd.util.hash_array(keys)
            else:
                kf = pd.DataFrame({c: _canon_keys(
                    t.column(c).to_numpy(zero_copy_only=False))
                    for c in on_cols})
                hashed = pd.util.hash_pandas_object(
                    kf, index=False).to_numpy()
            b = (hashed % num_buckets).astype(np.int32)
            t = t.append_column(
                "__side", pa.array(np.full(len(t), side, np.int8)))
            return t.append_column("__bucket", pa.array(b))
        return fn

    l_ = left_ds.map_batches(tag(0), batch_format="pyarrow")
    r_ = right_ds.map_batches(tag(1), batch_format="pyarrow")
    both = l_.union(r_)

    def merge_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # A bucket whose rows all come from ONE side can arrive in a
        # sorted block that was never concatenated with the other
        # side, so the other side's columns are absent entirely
        # (union blocks keep per-side schemas until the sort merges
        # them); same for the zero-row no-column block Ray can emit.
        # Pad the missing columns so the per-bucket merge still sees
        # both schemas (and yields that side empty).
        if len(df) == 0 or "__side" not in df.columns:
            df = pd.DataFrame({"__side": np.empty(0, np.int8)})
        for c in dict.fromkeys(l_names + r_names + on_cols):
            if c not in df.columns:
                df = df.assign(**{c: np.full(len(df), np.nan)})
        lt = df[df["__side"] == 0][list(dict.fromkeys(
            l_names + on_cols))]
        rt = df[df["__side"] == 1][list(dict.fromkeys(
            r_names + on_cols))]

        # undo the union padding's dtype degradation: side-sliced
        # rows are genuine rows of that side, so casting back to the
        # side's declared dtype is lossless (and keeps chained joins
        # hashing consistently)
        def _restore(t: pd.DataFrame, types) -> pd.DataFrame:
            for c in t.columns:
                want = types.get(c)
                if want is not None and t[c].dtype != want:
                    try:
                        t = t.assign(**{c: t[c].astype(want)})
                    except (TypeError, ValueError):
                        pass
            return t

        lt = _restore(lt, l_types)
        rt = _restore(rt, r_types)
        if how in ("semi", "anti"):
            # existence filters: left rows with (semi) / without (anti)
            # a right match — all rows of a key share the bucket, so
            # the in-partition membership test IS the global test
            if len(on_cols) == 1:
                hit = lt[on_cols[0]].isin(pd.unique(rt[on_cols[0]]))
            else:
                idx = pd.MultiIndex.from_frame(lt[on_cols])
                hit = idx.isin(pd.MultiIndex.from_frame(rt[on_cols]))
            hit = np.asarray(hit)
            return lt[hit] if how == "semi" else lt[~hit]
        return lt.merge(rt, on=on_cols, how=how, suffixes=("", "_r"))

    return both.groupby("__bucket").map_groups(merge_bucket,
                                               batch_format="pandas")


def broadcast_join_calc(big_ds, small_df: pd.DataFrame, on,
                        calc: dict[str, tuple[str, str]], how="left"):
    """-join calc= : many-to-one join where the target receives
    AGGREGATES of all matching source rows (reference join-calc,
    src/data/mapshaper-join-calc.js:1-10 over mapshaper-calc).  The
    source side is reduced per key once driver-side, then broadcast."""
    g = small_df.groupby(on, sort=False)
    cols = {}
    for out, (col, fn) in calc.items():
        if fn == "count":
            cols[out] = g[col].count()
        elif fn in ("mean", "average"):
            cols[out] = g[col].mean()
        elif fn == "median":
            # reference findMedian: mean of the two middle ranks for
            # even n — pandas median does the same
            cols[out] = g[col].median()
        elif fn == "mode":
            cols[out] = g[col].agg(_calc_mode)
        elif fn == "collect":
            cols[out] = g[col].agg(list)
        else:
            cols[out] = getattr(g[col], fn)()
    reduced = pd.DataFrame(cols).reset_index()
    return broadcast_join(big_ds, reduced, on=on, how=how)


def join_side_outputs(big_ds, small_df: pd.DataFrame, on):
    """-join unmatched/unjoined side outputs
    (src/commands/mapshaper-join.js:69-158): returns
    (unmatched_targets_ds, unjoined_source_df) — target rows with no
    source match, and source rows never matched by any target."""
    import ray
    keys_ref = ray.put(set(small_df[on].tolist()))

    def unmatched(df: pd.DataFrame) -> pd.DataFrame:
        keys = ray.get(keys_ref)
        return df[~df[on].isin(keys)]
    unmatched_ds = big_ds.map_batches(unmatched, batch_format="pandas")

    # distinct target keys via partial dedup per batch + driver merge
    def batch_keys(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({on: df[on].unique()})
    tkeys = big_ds.map_batches(batch_keys, batch_format="pandas") \
                  .to_pandas()[on].unique()
    unjoined_src = small_df[~small_df[on].isin(set(tkeys))]
    return unmatched_ds, unjoined_src


# ---------------------------------------------------------------------------
# whole-layer stats

def calc_stats(ds, col: str) -> pd.DataFrame:
    """-calc equivalents: count/sum/mean/min/max distributive via
    ds.aggregate; exact median via DISTRIBUTED histogram-rank selection
    (ops/rank.py) — the driver sees one histogram and one candidate
    bin, never the column."""
    from ray.data.aggregate import Count, Max, Mean, Min, Sum
    from .rank import median_exact
    row = ds.aggregate(Count(), Sum(col), Mean(col), Min(col), Max(col))
    # materialize the pruned single column once so the rank passes don't
    # recompute the upstream pipeline (spillable; one float per row)
    col_ds = ds.select_columns([col]).materialize()
    med = median_exact(col_ds, col)
    return pd.DataFrame([{
        "count_rows": int(row["count()"]),
        "sum_v": float(row[f"sum({col})"]),
        "avg_v": float(row[f"mean({col})"]),
        "min_v": float(row[f"min({col})"]),
        "max_v": float(row[f"max({col})"]),
        "median_v": med,
    }])


# ---------------------------------------------------------------------------
# distinct / order / windows

def groupby_calc_exact(ds, keys: list[str],
                       aggs: dict[str, tuple[str, str]],
                       n_parts: int = 64):
    """Grouped NON-distributive calc functions (median / mode /
    collect): one bucket-hash shuffle co-locates every row of a key,
    then a per-partition pandas groupby computes exact results —
    median = findMedian mean-of-middles, mode = first-encounter tie
    rule, collect = value list.  Returns a Dataset with one row per
    key.  (Distributive fns belong in groupby_agg, which moves only
    per-(key, batch) partials.)"""
    from .partition import bucket_part

    def stamp(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        kh = pd.util.hash_pandas_object(df[keys], index=False) \
            .to_numpy()
        df["__part"] = bucket_part(kh, n_parts)
        return df

    def agg_part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=["__part"])
        g = df.groupby(keys, sort=False, dropna=False)
        cols = {}
        for out, (col, fn) in aggs.items():
            if fn == "median":
                cols[out] = g[col].median()
            elif fn == "mode":
                cols[out] = g[col].agg(_calc_mode)
            elif fn == "collect":
                cols[out] = g[col].agg(list)
            else:
                raise ValueError(
                    f"groupby_calc_exact: {fn!r} is distributive — "
                    "use groupby_agg")
        return pd.DataFrame(cols).reset_index()

    return ds.map_batches(stamp, batch_format="pandas") \
        .groupby("__part").map_groups(agg_part, batch_format="pandas")


def uniq_first(ds, key_cols: list[str], order_cols, max_count: int = 1):
    """-uniq: keep the first ``max_count`` rows per key in ``order_cols``
    order (order-dependent distinct, src/commands/mapshaper-uniq.js:6-35)."""
    order_cols = [order_cols] if isinstance(order_cols, str) else list(order_cols)

    def head(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(order_cols, kind="mergesort").head(max_count)
    return ds.groupby(key_cols).map_groups(head, batch_format="pandas")


def sort_topk(ds, col: str, k: int, descending=True):
    """Top-k without a full sort: per-batch partial top-k, then one tiny
    final sort over <= k * num_batches rows."""
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return (df.nlargest(k, col) if descending else df.nsmallest(k, col))
    pruned = ds.map_batches(partial, batch_format="pandas")
    out = pruned.sort(col, descending=descending).limit(k)
    return out


def window_tumbling(ds, key: str, ts_col: str, width_s: int,
                    aggs: dict[str, tuple[str, str]]):
    """Tumbling event-time window: bucket = floor(epoch/width), then
    grouped aggregation (partial+final)."""
    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        ep = df[ts_col].astype("datetime64[us]").astype("int64") / 1e6
        df = df.copy()
        df["window_start"] = (np.floor(ep / width_s) * width_s).astype("int64")
        return df
    bucketed = ds.map_batches(bucketize, batch_format="pandas")
    return groupby_agg(bucketed, [key, "window_start"], aggs)


def window_hopping(ds, key: str, ts_col: str, length_s: int,
                   hop_s: int, aggs: dict[str, tuple[str, str]]):
    """Hopping (sliding) event-time window: windows start every
    ``hop_s`` seconds and span ``length_s``, so each event lands in
    ``ceil(length/hop)`` overlapping windows.  One stateless pass
    replicates each row to its window ids (vectorized floor-division
    arithmetic — no per-event loop, the replication factor is the
    constant length/hop), then the same partial+final grouped
    aggregation as the tumbling window.  Returns one row per
    (key, window_start)."""
    if length_s % hop_s:
        raise ValueError("length_s must be a multiple of hop_s")

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        ep = df[ts_col].astype("datetime64[us]").astype("int64") \
            // 10 ** 6
        w0 = np.floor_divide(ep - length_s, hop_s) + 1
        # replication factor is the constant length/hop for every row
        k = length_s // hop_s
        idx = np.repeat(np.arange(len(df)), k)
        out = df.iloc[idx].copy()
        # window index for each replica: w0[i] .. w0[i]+k-1
        offs = np.tile(np.arange(k, dtype=np.int64), len(df))
        out["window_start"] = ((np.repeat(w0.to_numpy(), k) + offs)
                               * hop_s).astype("int64")
        return out

    exploded = ds.map_batches(explode, batch_format="pandas")
    return groupby_agg(exploded, [key, "window_start"], aggs)


def grouped_topk(ds, key: str, col: str, k: int, ascending=False,
                 tie_col: str | None = None):
    """Per-group top-k rows by ``col`` (ties broken by ``tie_col``
    ascending — deterministic).  Two-level: each batch keeps only its
    own per-group top-k (a group's global top-k row is a top-k row of
    every batch it appears in), then one small grouped reduce over
    the <= k x groups x batches survivors.  No full shuffle of the
    table — only candidate rows move."""
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        by = [key, col] + ([tie_col] if tie_col else [])
        asc = [True, ascending] + ([True] if tie_col else [])
        df = df.sort_values(by, ascending=asc, kind="mergesort")
        return df.groupby(key, sort=False).head(k)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return partial(df)

    return ds.map_batches(partial, batch_format="pandas") \
        .groupby(key).map_groups(final, batch_format="pandas")


def with_row_position(ds, col: str = "__pos"):
    """Stamp a GLOBAL row-position column (a delim table's identity is
    its row order).  Two light passes: per-block row counts (metadata
    scale), then a per-block remote stamp — blocks stay in the object
    store, no driver materialization."""
    import ray
    import ray.data as rd

    refs = ds.to_arrow_refs()

    @ray.remote
    def _count(t):
        return t.num_rows

    @ray.remote
    def _stamp(t, off):
        import numpy as np
        import pyarrow as pa
        return t.append_column(
            col, pa.array(np.arange(off, off + t.num_rows),
                          type=pa.int64()))

    counts = ray.get([_count.remote(r) for r in refs])
    offs = np.cumsum([0] + counts[:-1])
    out = rd.from_arrow_refs(
        [_stamp.remote(r, int(o)) for r, o in zip(refs, offs)])
    out.context.execution_options.preserve_order = True
    return out


def dissolve_table(ds, keys, sum_fields=(), copy_fields=()):
    """-dissolve on a DATA-ONLY layer (reference dissolve on a CSV
    table): one record per key group in FIRST-APPEARANCE order; the
    output keeps key fields + sum-fields (summed) + copy-fields (first
    value); every other field drops (getDissolveTable semantics)."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    pos = with_row_position(ds)
    first = uniq_first(pos, keys, ["__pos"])
    keep = keys + [c for c in copy_fields if c not in keys] + ["__pos"]

    def project(df: pd.DataFrame) -> pd.DataFrame:
        return df[[c for c in keep if c in df.columns]]
    out = first.map_batches(project, batch_format="pandas")
    if sum_fields:
        sums = groupby_agg(pos, keys,
                           {c: (c, "sum") for c in sum_fields})
        out = broadcast_join(out, sums.to_pandas(), on=keys)
    out = out.sort("__pos")

    def drop_pos(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop(columns="__pos")
    final = out.map_batches(drop_pos, batch_format="pandas")
    final.context.execution_options.preserve_order = True
    return final


# -calc aggregate functions (reference compileCalcExpression ctx,
# src/commands/mapshaper-calc.js:41-65).  Two classes:
#   distributive — sum/count/min/max/mean/average (one Ray aggregate
#     pass) and median (distributed histogram-rank selection);
#   capture — mode/collect/first/last, which the REFERENCE itself
#     implements by capturing every value into an in-memory array
#     (phase-1 capture / captureNum), so the engine's bounded gather
#     of the needed value column matches the operator's own contract.
_CALC_DISTRIBUTIVE = {"sum", "count", "min", "max", "mean", "average",
                      "median"}
_CALC_CAPTURE = {"mode", "collect", "first", "last"}
_CALC_FNS = _CALC_DISTRIBUTIVE | _CALC_CAPTURE | {"width", "height"}


def _calc_mode(values: "pd.Series"):
    """reference utils.getMode: among the max-count values, the FIRST
    in first-encounter order wins (NaN/None excluded like JS object
    keys never capture undefined)."""
    v = values.dropna()
    if not len(v):
        return None
    counts = v.value_counts(sort=False)
    mx = counts.max()
    winners = set(counts[counts == mx].index)
    for x in v:
        if x in winners:
            return x
    return None  # pragma: no cover


def calc_exprs(ds, spec: str, defs: dict | None = None) -> pd.DataFrame:
    """-calc 'name = expr, ...' → one-row DataFrame (reference
    mapshaper-calc.js).  Each expr may combine aggregate calls with
    arithmetic — ``pct = sum(a) / count() * 100`` — and aggregate
    ARGUMENTS may themselves be expressions (``sum(a * b)``), which the
    reference evaluates per feature in its capture phase and the
    engine computes as a vectorized column before aggregating.
    Functions: sum/count/min/max/mean/average (single distributive Ray
    aggregate pass), median (distributed histogram-rank), and the
    reference's capture-class mode/collect/first/last (bounded value
    gather, the reference's own phase-1 semantics), plus
    width()/height() (layer bbox) on geometry layers."""
    import ast as _ast

    from ray.data.aggregate import Count, Max, Mean, Min, Sum

    from .jsexpr import js_to_py, looks_js
    from .rank import median_exact

    # top-level comma split (commas inside parens/strings don't split)
    chunks, depth, quote, start = [], 0, None, 0
    for i, ch in enumerate(spec):
        if quote:
            if ch == quote and spec[i - 1] != "\\":
                quote = None
        elif ch in "\"'":
            quote = ch
        elif ch in "([{":
            depth += 1
        elif ch in ")]}":
            depth -= 1
        elif ch in ",;" and depth == 0:
            chunks.append(spec[start:i])
            start = i + 1
    chunks.append(spec[start:])

    agg_keys: dict[tuple, str] = {}   # (fn, arg_src) -> placeholder
    rewritten: dict[str, str] = {}    # out name -> outer expression

    class _Repl(_ast.NodeTransformer):
        def visit_Call(self, node):
            self.generic_visit(node)
            if isinstance(node.func, _ast.Name) \
                    and node.func.id in _CALC_FNS:
                fn = node.func.id
                arg_src = _ast.unparse(node.args[0]) if node.args \
                    else ""
                key = (fn, arg_src)
                if key not in agg_keys:
                    agg_keys[key] = f"__agg{len(agg_keys)}"
                return _ast.copy_location(
                    _ast.Name(id=agg_keys[key], ctx=_ast.Load()), node)
            return node

    for chunk in chunks:
        if not chunk.strip():
            continue
        m = re.search(r"(?<![=<>!])=(?!=)", chunk)
        if m:
            name, expr = chunk[:m.start()], chunk[m.end():]
        else:
            name, expr = chunk, chunk
        src = expr.strip()
        if looks_js(src):
            src = js_to_py(src)
        tree = _Repl().visit(_ast.parse(src, mode="eval"))
        _ast.fix_missing_locations(tree)
        rewritten[name.strip()] = _ast.unparse(tree)

    # value columns for non-bare aggregate arguments (computed
    # vectorized once, shared across aggregates over the same expr)
    cols = set(ds.schema().names)
    arg_col: dict[str, str] = {}
    computed: dict[str, str] = {}
    for fn, arg in agg_keys:
        if fn in ("count", "width", "height") or not arg:
            continue
        if arg in cols:
            arg_col[arg] = arg
        elif arg not in computed:
            computed[arg] = f"__val{len(computed)}"
            arg_col[arg] = computed[arg]
    if computed:
        ds = each_expr(ds, {c: src for src, c in computed.items()},
                       defs=defs)
    ds = ds.materialize()

    agg_map = {"sum": Sum, "min": Min, "max": Max, "mean": Mean,
               "average": Mean}
    ray_aggs, ray_keys = [], []
    need_count = any(fn == "count" for fn, _ in agg_keys)
    for (fn, arg), ph in agg_keys.items():
        if fn in agg_map:
            ray_aggs.append(agg_map[fn](arg_col[arg]))
            key = {"mean": "mean", "average": "mean"}.get(fn, fn)
            ray_keys.append((ph, f"{key}({arg_col[arg]})"))
    row = ds.aggregate(*ray_aggs) if ray_aggs else {}

    values: dict[str, object] = {}
    cap_cols = sorted({arg_col[arg] for fn, arg in agg_keys
                       if fn in _CALC_CAPTURE})
    cap_df = ds.select_columns(cap_cols).to_pandas() if cap_cols \
        else None
    bbox = None
    if any(fn in ("width", "height") for fn, _ in agg_keys):
        from ..pipelines.overlay import layer_bbox
        bbox = layer_bbox(ds)
    for (fn, arg), ph in agg_keys.items():
        if fn == "count":
            values[ph] = ds.count() if need_count else 0
        elif fn == "median":
            values[ph] = median_exact(
                ds.select_columns([arg_col[arg]]).materialize(),
                arg_col[arg])
        elif fn == "mode":
            values[ph] = _calc_mode(cap_df[arg_col[arg]])
        elif fn == "collect":
            values[ph] = list(cap_df[arg_col[arg]])
        elif fn == "first":
            s = cap_df[arg_col[arg]]
            values[ph] = s.iloc[0] if len(s) else None
        elif fn == "last":
            s = cap_df[arg_col[arg]]
            values[ph] = s.iloc[-1] if len(s) else None
        elif fn == "width":
            values[ph] = float(bbox[2] - bbox[0])
        elif fn == "height":
            values[ph] = float(bbox[3] - bbox[1])
        else:
            values[ph] = row[dict(ray_keys)[ph]]

    from .jsexpr import JSString
    base = dict(_EXPR_GLOBALS)
    base["JSS"] = JSString   # string literals in translated JS chunks
    if defs:
        base.update(defs)
    out = {}
    for name, src in rewritten.items():
        out[name] = eval(compile(src, "<calc>", "eval"), base,
                         dict(values))
    return pd.DataFrame([out])


def sessionize(ds, user_col: str = "user_id", ts_col: str = "ts",
               gap_s: float = 4 * 3600, n_parts: int = 64):
    """Event sessionization: consecutive events of a user belong to one
    session while the gap between them is <= ``gap_s`` seconds; a
    larger gap starts a new session.  Returns one row per session:
    (user_col, session_seq, n_events, t_start, t_end) with session_seq
    numbering a user's sessions 1..k in time order.

    ONE shuffle: events bucket by user-id hash (every event of a user
    lands in one partition), then a vectorized per-partition lexsort +
    gap cumsum — no per-user map_groups tasks."""
    gap_us = np.int64(round(gap_s * 1e6))

    def emit(df: pd.DataFrame) -> pd.DataFrame:
        u = df[user_col].to_numpy()
        from .partition import bucket_part
        return pd.DataFrame({
            user_col: u,
            "__ts": df[ts_col].astype("datetime64[us]")
            .astype("int64").to_numpy(),
            "__part": bucket_part(u, n_parts)})

    def part_sessions(df: pd.DataFrame) -> pd.DataFrame:
        u = df[user_col].to_numpy()
        ts = df["__ts"].to_numpy()
        order = np.lexsort((ts, u))
        u, ts = u[order], ts[order]
        new_user = np.empty(len(u), dtype=bool)
        new_user[0] = True
        new_user[1:] = u[1:] != u[:-1]
        gap = np.empty(len(u), dtype=bool)
        gap[0] = True
        gap[1:] = (ts[1:] - ts[:-1]) > gap_us
        new_s = new_user | gap
        sid = np.cumsum(new_s)                 # global across users
        out = pd.DataFrame({user_col: u, "__sid": sid, "__ts": ts})
        g = out.groupby([user_col, "__sid"], as_index=False).agg(
            n_events=("__ts", "size"), t_start=("__ts", "min"),
            t_end=("__ts", "max"))
        g = g.sort_values([user_col, "t_start"], kind="mergesort")
        g["session_seq"] = g.groupby(user_col).cumcount() + 1
        g["t_start"] = g["t_start"].astype("datetime64[us]")
        g["t_end"] = g["t_end"].astype("datetime64[us]")
        return g[[user_col, "session_seq", "n_events",
                  "t_start", "t_end"]]

    return ds.map_batches(emit, batch_format="pandas") \
        .groupby("__part").map_groups(part_sessions,
                                      batch_format="pandas")


def _key_bucket(arr, n_parts: int) -> np.ndarray:
    """Bucket column for integer OR string keys (string keys hash
    through pandas siphash first)."""
    from .partition import bucket_part
    a = np.asarray(arr)
    if a.dtype == object or a.dtype.kind in "US":
        a = pd.util.hash_array(a.astype(object))
    return bucket_part(a, n_parts)


def _run_bounds(sorted_keys: np.ndarray):
    """(starts, ends) of equal-key runs in a SORTED key array (object
    dtypes supported — no np.diff)."""
    n = len(sorted_keys)
    if n == 0:
        e = np.empty(0, dtype=np.int64)
        return e, e
    bnd = np.nonzero(sorted_keys[1:] != sorted_keys[:-1])[0] + 1
    return (np.concatenate([[0], bnd]),
            np.concatenate([bnd, [n]]))


def _join_scaffold(left_ds, right_ds, by, on_cols, keep_r, suffix,
                   n_parts):
    """Shared keyed-join plumbing for asof_join / range_join: capture
    schemas, guard output-name collisions, tag both sides with a
    bucket column, union (Dataset.union null-pads disjoint columns,
    floating int dtypes — the int column sets are returned so the
    partition kernels can restore them)."""
    import pyarrow as _pa

    def _is_int(t) -> bool:
        # Ray schemas carry pyarrow types for Arrow blocks but numpy /
        # python types for pandas blocks
        if isinstance(t, _pa.DataType):
            return _pa.types.is_integer(t)
        try:
            return np.issubdtype(t, np.integer)
        except TypeError:
            return False

    lschema = left_ds.schema()
    lcols = lschema.names
    rschema = right_ds.schema()
    clash = [c for c in keep_r if c + suffix in lcols]
    if clash:
        raise ValueError(
            f"right columns {clash} would overwrite left columns — "
            f"pass a suffix")
    int_l = {n for n, t in zip(lschema.names, lschema.types)
             if _is_int(t)}
    int_r = {c for c in keep_r if _is_int(
        rschema.types[rschema.names.index(c)])}

    def tag(side: int, narrow):
        def _t(df: pd.DataFrame) -> pd.DataFrame:
            if narrow:
                df = df[narrow]
            df = df.copy()
            df["__side"] = side
            df["__part"] = _key_bucket(df[by].to_numpy(), n_parts)
            return df
        return _t

    both = left_ds.map_batches(tag(0, None), batch_format="pandas") \
        .union(right_ds.map_batches(tag(1, [by, *on_cols, *keep_r]),
                                    batch_format="pandas"))
    return both, lcols, int_l, int_r


def _to_us(s) -> np.ndarray:
    return s.astype("datetime64[us]").astype("int64").to_numpy()


def asof_join(left_ds, right_ds, on: str = "ts", by: str = "user_id",
              right_cols: tuple = ("event_id",), suffix: str = "_r",
              n_parts: int = 64):
    """As-of join (backward): each left row matches the LATEST right
    row with ``right.on <= left.on`` in the same ``by`` group; rows
    with no prior right row are dropped (inner semantics, DuckDB
    ``ASOF JOIN``).  Ray Data has no native as-of join — this is the
    composition the mission doc calls for: both sides shuffle ONCE
    bucketed by the ``by`` key; inside each partition BOTH sides sort
    by (key, time) and groups pair through run bounds — O(n log n)
    per partition, no per-key scans or tasks.

    Returns left columns + ``right_cols`` renamed with ``suffix``."""
    keep_r = list(right_cols)
    both, lcols, int_l, int_r = _join_scaffold(
        left_ds, right_ds, by, [on], keep_r, suffix, n_parts)

    def part_asof(df: pd.DataFrame) -> pd.DataFrame:
        left = df[df["__side"] == 0]
        right = df[df["__side"] == 1]
        # right must be length-checked too: a bucket whose rows all
        # come from the LEFT side can arrive in a sorted block that
        # was never concatenated with a right block, so the right-only
        # columns are absent from the schema entirely (inner
        # semantics: those left rows drop anyway)
        if len(left) == 0 or len(right) == 0:
            return pd.DataFrame(columns=[*lcols, *[c + suffix
                                                   for c in keep_r]])
        rb = right[by].to_numpy()
        rt = _to_us(right[on])
        order_r = np.lexsort((rt, rb))
        rb, rt = rb[order_r], rt[order_r]
        rvals = {c: right[c].to_numpy()[order_r] for c in keep_r}
        rs, re_ = _run_bounds(rb)
        rkeys = rb[rs] if len(rs) else rb
        lb = left[by].to_numpy()
        lt = _to_us(left[on])
        order_l = np.lexsort((lt, lb))
        lb_s, lt_s = lb[order_l], lt[order_l]
        ls, le = _run_bounds(lb_s)
        idx = np.full(len(lb), -1, dtype=np.int64)
        for i in range(len(ls)):
            g = lb_s[ls[i]]
            j = int(np.searchsorted(rkeys, g))
            if j >= len(rkeys) or rkeys[j] != g:
                continue
            s, e = int(rs[j]), int(re_[j])
            sel = order_l[ls[i]:le[i]]
            pos = s + np.searchsorted(rt[s:e], lt_s[ls[i]:le[i]],
                                      side="right") - 1
            idx[sel] = np.where(pos >= s, pos, -1)
        ok = idx >= 0
        out = left.loc[ok, lcols].reset_index(drop=True)
        for c in keep_r:
            out[c + suffix] = rvals[c][idx[ok]]
        for c in int_l:
            out[c] = out[c].astype("int64")
        for c in int_r:
            out[c + suffix] = out[c + suffix].astype("int64")
        return out

    return both.groupby("__part").map_groups(part_asof,
                                             batch_format="pandas")


def range_join(left_ds, right_ds, by: str = "user_id", on: str = "ts",
               lo: str = "t_start", hi: str = "t_end",
               right_cols: tuple = ("session_seq",),
               suffix: str = "_r", n_parts: int = 64):
    """Interval (range) join: each left row matches every right row of
    the same ``by`` group whose [lo, hi] interval contains ``left.on``
    (inclusive both ends) — Ray Data has no native range join.  Same
    single-bucket-shuffle shape as asof_join; groups pair through
    sorted run bounds on both sides, and each left row back-scans the
    interval list bounded by the group's max interval length (one step
    for non-overlapping session tables; every containing interval
    matches when they overlap).  Inner semantics: unmatched left rows
    drop."""
    keep_r = list(right_cols)
    both, lcols, int_l, int_r = _join_scaffold(
        left_ds, right_ds, by, [lo, hi], keep_r, suffix, n_parts)

    def part_range(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(columns=[*lcols,
                                      *[c + suffix for c in keep_r]])
        left = df[df["__side"] == 0]
        right = df[df["__side"] == 1]
        if len(left) == 0 or len(right) == 0:
            return empty
        rb = right[by].to_numpy()
        rlo = _to_us(right[lo])
        rhi = _to_us(right[hi])
        order_r = np.lexsort((rlo, rb))
        rb, rlo, rhi = rb[order_r], rlo[order_r], rhi[order_r]
        rvals = {c: right[c].to_numpy()[order_r] for c in keep_r}
        rs, re_ = _run_bounds(rb)
        rkeys = rb[rs] if len(rs) else rb
        lb = left[by].to_numpy()
        lt = _to_us(left[on])
        order_l = np.lexsort((lt, lb))
        lb_s, lt_s = lb[order_l], lt[order_l]
        ls, le = _run_bounds(lb_s)
        out_li, out_ri = [], []
        for i in range(len(ls)):
            g = lb_s[ls[i]]
            j = int(np.searchsorted(rkeys, g))
            if j >= len(rkeys) or rkeys[j] != g:
                continue
            s, e = int(rs[j]), int(re_[j])
            m = order_l[ls[i]:le[i]]
            ts = lt_s[ls[i]:le[i]]
            # candidates = intervals starting at-or-before ts; scan
            # back collecting EVERY containing one, bounded by the
            # group's max interval length (an interval with
            # lo < ts - maxlen cannot reach ts)
            maxlen = int((rhi[s:e] - rlo[s:e]).max())
            cur = s + np.searchsorted(rlo[s:e], ts, side="right") - 1
            active = cur >= s
            while active.any():
                c = np.maximum(cur, s)
                hit = active & (ts >= rlo[c]) & (ts <= rhi[c])
                out_li.append(m[hit])
                out_ri.append(cur[hit])
                cur = cur - 1
                c = np.maximum(cur, s)
                active = (cur >= s) & (rlo[c] >= ts - maxlen)
        if not out_li:
            return empty
        li = np.concatenate(out_li)
        ri = np.concatenate(out_ri)
        if not len(li):
            return empty
        out = left.iloc[li][lcols].reset_index(drop=True)
        for c in keep_r:
            out[c + suffix] = rvals[c][ri]
        for c in int_l:
            out[c] = out[c].astype("int64")
        for c in int_r:
            out[c + suffix] = out[c + suffix].astype("int64")
        return out

    return both.groupby("__part").map_groups(part_range,
                                             batch_format="pandas")


def groupby_quantiles(ds, key: str, col: str, qs=(0.25, 0.5, 0.75),
                      n_parts: int = 64):
    """Exact per-group quantiles (linear interpolation, the SQL
    quantile_cont definition): groups bucket-shuffle by key hash —
    every row of a group lands in one partition — then one vectorized
    sort + interpolation pass per partition.  Unlike the global
    histogram-rank in ops/rank.py this moves the value column, but
    only one column, and per-group medians cannot be computed from
    partials without per-group state anyway."""
    from .partition import bucket_part

    def emit(df: pd.DataFrame) -> pd.DataFrame:
        k = df[key].to_numpy()
        h = pd.util.hash_array(np.asarray(k, dtype=object)) \
            if k.dtype == object else k
        return pd.DataFrame({key: k, col: df[col].to_numpy(),
                             "__part": bucket_part(h, n_parts)})

    def part_q(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(key)[col].quantile(list(qs)).unstack()
        out.columns = [f"q{int(round(q * 100))}" for q in qs]
        return out.reset_index()

    return ds.map_batches(emit, batch_format="pandas") \
        .groupby("__part").map_groups(part_q, batch_format="pandas")


def sliding_window_sum(ds, ts_col: str, id_col: str, val_col: str,
                       window: int, n_parts: int = 64):
    """Global row-based sliding-window aggregate — SQL
    ``SUM(val) OVER (ORDER BY ts, id ROWS BETWEEN window-1 PRECEDING
    AND CURRENT ROW)`` — via an explicit HALO EXCHANGE, the canonical
    distributed pattern for windows that cross partition boundaries:

    1. a min/max reduce plus ONE fine histogram pass fix EQUI-DEPTH
       ts-range buckets (ordered partitioning — rows of bucket b all
       sort before bucket b+1): bucket edges sit at the n/n_parts
       rank points of the sampled ts CDF at fine-bin granularity, so
       a skewed event-time distribution (diurnal peaks) still yields
       balanced buckets instead of concentrating rows in a few;
    2. ONE bucket shuffle materializes the range partitions (the
       only all-to-all — both later passes are block-local maps
       over it);
    3. a tail scan collects each bucket's last ``window-1`` rows in
       (ts, id) order — the HALO, bounded at n_parts x (window-1)
       rows on the driver regardless of corpus size;
    4. the windowed pass computes each bucket's sums over (halo of
       all earlier buckets' tails ++ own rows) with one vectorized
       cumsum — halo rows contribute history but emit nothing, so
       every row's window is exactly its global predecessor set.

    ``val_col`` must be integral (quantize floats first) so the
    cumsum is order-independent and a SQL oracle matches exactly.
    Returns (id_col, msum).  Partition-independent by construction:
    bucket edges depend only on the global min/max.

    Block contract: the shuffle emits one block per bucket (groupby
    map_groups), and both scans take whole blocks
    (``batch_size=None``); if a bucket ever outgrew a single block
    the windowed pass would see a mixed batch — it asserts
    one-bucket-per-batch and fails loudly.  Equi-depth edges make
    that a corner case (a single fine bin heavier than a block —
    i.e. one ts value dominating the corpus) rather than the normal
    outcome of time skew; ``n_parts`` remains the knob.
    """
    import ray

    from .rank import _histogram, _minmax_count

    mm = _minmax_count(ds, ts_col)
    if mm is None:
        import ray.data as rd
        return rd.from_items([])
    lo, hi, _n = mm
    fine = max(n_parts * 64, 4096)
    width = (hi - lo) or 1.0
    hist = _histogram(ds, ts_col, lo, hi, fine)
    cum = np.cumsum(hist)
    total = int(cum[-1])
    # cut after the fine bin where the CDF crosses each i*n/n_parts
    # rank; same floor arithmetic assigns rows below, so a row and
    # its histogram count land in the same fine bin by construction
    targets = (np.arange(1, n_parts, dtype=np.int64) * total) \
        // n_parts
    cuts = np.searchsorted(cum, targets, side="left") \
        .astype(np.int64)

    def stamp(df: pd.DataFrame) -> pd.DataFrame:
        v = df[ts_col].to_numpy(np.float64)
        fb = np.clip(((v - lo) / width * fine).astype(np.int64),
                     0, fine - 1)
        b = np.searchsorted(cuts, fb, side="left").astype(np.int64)
        out = pd.DataFrame({
            "__part": b,
            "__ts": df[ts_col].to_numpy(np.int64),
            id_col: df[id_col].to_numpy(np.int64),
            "__v": df[val_col].to_numpy(np.int64)})
        return out

    import uuid

    def tail(df: pd.DataFrame) -> pd.DataFrame:
        # per-BLOCK scan: a block holds several complete buckets
        # (map_groups packs small group outputs together), so take
        # each bucket's own last window-1 rows; __blk tags this
        # block so the driver can verify no bucket was split
        blk = uuid.uuid4().hex
        order = np.lexsort((df[id_col].to_numpy(),
                            df["__ts"].to_numpy(),
                            df["__part"].to_numpy()))
        df = df.iloc[order]
        g = df.groupby("__part", sort=False)
        cc = g.cumcount().to_numpy()
        size = g["__ts"].transform("size").to_numpy()
        out = df[cc >= size - (window - 1)].copy()
        out["__blk"] = blk
        return out

    # the ONE all-to-all: range partitions materialize, then tails +
    # windowed sums are block-local scans over the same blocks
    parts = ds.map_batches(stamp, batch_format="pandas") \
        .groupby("__part") \
        .map_groups(lambda df: df, batch_format="pandas") \
        .materialize()
    if window > 1:
        tails = parts.map_batches(tail, batch_format="pandas",
                                  batch_size=None).to_pandas()
        split = tails.groupby("__part")["__blk"].nunique()
        if (split > 1).any():  # see "Block contract" above
            raise AssertionError(
                "sliding_window_sum: ts bucket split across blocks "
                "— raise n_parts so each bucket fits one block")
        tails = tails.drop(columns="__blk")
    else:  # window of 1 never looks back — no halo pass at all
        tails = pd.DataFrame({"__part": np.empty(0, np.int64),
                              "__ts": np.empty(0, np.int64),
                              id_col: np.empty(0, np.int64),
                              "__v": np.empty(0, np.int64)})
    order = np.lexsort((tails[id_col].to_numpy(),
                        tails["__ts"].to_numpy(),
                        tails["__part"].to_numpy()))
    tails = tails.iloc[order].reset_index(drop=True)
    halo_ref = ray.put(tails)

    def windowed(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({id_col: np.empty(0, np.int64),
                                 "msum": np.empty(0, np.int64)})
        halo_all = ray.get(halo_ref)
        hp = halo_all["__part"].to_numpy()
        order = np.lexsort((df[id_col].to_numpy(),
                            df["__ts"].to_numpy(),
                            df["__part"].to_numpy()))
        df = df.iloc[order]
        outs = []
        # a handful of complete buckets per block — per bucket one
        # vectorized cumsum over (its halo ++ its rows)
        for b, g in df.groupby("__part", sort=True):
            halo = halo_all[hp < b]
            halo = halo.iloc[-(window - 1):] if window > 1 \
                else halo.iloc[:0]
            v = np.concatenate([halo["__v"].to_numpy(np.int64),
                                g["__v"].to_numpy(np.int64)])
            cs = np.concatenate([[0], np.cumsum(v)])
            nh = len(halo)
            i = np.arange(nh, len(v))
            msum = cs[i + 1] - cs[np.maximum(i + 1 - window, 0)]
            outs.append(pd.DataFrame(
                {id_col: g[id_col].to_numpy(np.int64),
                 "msum": msum.astype(np.int64)}))
        return pd.concat(outs, ignore_index=True)

    return parts.map_batches(windowed, batch_format="pandas",
                             batch_size=None)


def rollup_agg(ds, keys: list[str], aggs: dict[str, tuple[str, str]],
               all_label: str = "(all)"):
    """SQL ``GROUP BY ROLLUP(keys...)``: the aggregate at every key
    prefix — (k1..kn), (k1..kn-1), ..., () — in one result, subtotal
    rows carrying ``all_label`` in the rolled-up key columns.

    One distributed pass computes the FINEST level (the only one that
    sees the input); every coarser level re-aggregates the finest
    RESULT — valid because the supported fns (sum/count/min/max) are
    re-aggregable (count re-sums), and cheap because the finest table
    is key-cardinality bounded, never corpus-sized.  Returns a pandas
    DataFrame (keys + agg columns), all levels unioned.
    """
    for out, (col, fn) in aggs.items():
        if fn not in ("sum", "count", "min", "max"):
            raise ValueError(f"rollup_agg: {fn} is not re-aggregable")
    finest = groupby_agg(ds, keys, aggs, final="distributed") \
        .to_pandas()
    re_fn = {out: ("sum" if fn == "count" else fn)
             for out, (col, fn) in aggs.items()}
    levels = [finest]
    cur = finest
    for depth in range(len(keys) - 1, -1, -1):
        sub_keys = keys[:depth]
        if sub_keys:
            g = cur.groupby(sub_keys, as_index=False) \
                .agg({out: fn for out, fn in re_fn.items()})
        else:
            g = pd.DataFrame({out: [getattr(cur[out], fn)()]
                              for out, fn in re_fn.items()})
        for k in keys[depth:]:
            g[k] = all_label
        levels.append(g[keys + list(aggs)])
        cur = g[sub_keys + list(aggs)] if sub_keys else g
    out = pd.concat(levels, ignore_index=True)
    return out.sort_values(keys, kind="mergesort") \
        .reset_index(drop=True)


def pivot_agg(ds, key: str, pivot_col: str, val_col: str,
              fns=("sum", "count"), values=None, final: str = "driver"):
    """SQL ``PIVOT`` / crosstab: one output row per ``key``, one
    column per (pivot value, fn) — ``{value}_{fn}`` — aggregating
    ``val_col`` within each (key, pivot value) cell.

    Distributed shape: the pivot-value domain is discovered with a
    per-batch ``drop_duplicates`` partial (bounded by the domain, not
    the row count — a pivot over an unbounded domain is a schema
    error, not a scale problem), then ONE stateless pass emits
    per-batch pivoted partials (``pd.pivot_table`` per batch, zero
    rows per absent cell) and the existing :func:`groupby_agg`
    machinery reduces them — every supported fn re-aggregates
    (count→sum), so the reduce is a combine-then-small-groupby, never
    a corpus shuffle.  fns ⊆ {sum, count, min, max}.  Missing cells
    are 0 for sum/count and NaN for min/max.
    """
    for fn in fns:
        if fn not in ("sum", "count", "min", "max"):
            raise ValueError(f"pivot_agg: {fn} is not re-aggregable")
    if values is None:
        vals_df = ds.map_batches(
            lambda df: df[[pivot_col]].drop_duplicates(),
            batch_format="pandas").to_pandas()
        values = sorted(vals_df[pivot_col].dropna().unique().tolist())
    out_cols = [f"{v}_{fn}" for v in values for fn in fns]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        pt = pd.pivot_table(df, index=key, columns=pivot_col,
                            values=val_col,
                            aggfunc=list(dict.fromkeys(fns)),
                            dropna=True)
        res = pd.DataFrame(index=pt.index)
        for v in values:
            for fn in fns:
                if (fn, v) in pt.columns:
                    res[f"{v}_{fn}"] = pt[(fn, v)]
                else:
                    res[f"{v}_{fn}"] = np.nan
        return res.reset_index()

    partials = ds.map_batches(partial, batch_format="pandas")
    re_fns = {f"{v}_{fn}": (f"{v}_{fn}", "sum" if fn == "count" else fn)
              for v in values for fn in fns}
    out = groupby_agg(partials, [key], re_fns, final=final)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        for v in values:
            for fn in fns:
                c = f"{v}_{fn}"
                if fn in ("sum", "count"):
                    df[c] = df[c].fillna(0)
                if fn == "count":
                    df[c] = df[c].astype(np.int64)
        return df[[key] + out_cols]

    return out.map_batches(finish, batch_format="pandas")


def funnel(ds, steps, user_col: str = "user_id", ts_col: str = "ts",
           type_col: str = "event_type", n_parts: int = 64,
           within_s: float | None = None):
    """Ordered-funnel analysis: per user, the chained first-touch
    timestamps t1 < t2 < ... — t_k is the earliest event of type
    ``steps[k]`` STRICTLY after t_{k-1} — plus ``stage`` = how many
    steps completed.  Returns one row per user that reached step 1:
    (user_col, stage, ts_1..ts_K as timestamps, NaT past the stage).

    Distributed shape: events are FILTERED to the step types and
    projected to (user, type, ts) before the one bucket-hash shuffle
    (the only all-to-all, and it moves only funnel-relevant rows);
    each bucket then runs a vectorized lexsort + K masked
    grouped-min passes — no per-user tasks, no global sort.  The
    chained min is not partial-aggregable (t2 depends on the global
    t1), which is why the per-user co-location shuffle is required.
    
    ``within_s`` bounds each transition: step k must land within
    ``within_s`` seconds AFTER step k-1 (first-touch semantics — the
    chain anchors on the earliest step-1 event even when a later one
    would convert better; that is the standard strict funnel).
    """
    steps = list(steps)
    K = len(steps)
    step_ix = {s: i for i, s in enumerate(steps)}

    def emit(t):
        # Arrow-native: this is the only stage that sees the full
        # event volume — filter + project zero-copy, no pandas block
        import pyarrow as pa
        import pyarrow.compute as pc
        step_arr = pa.array(steps)
        t = t.filter(pc.is_in(t.column(type_col),
                              value_set=step_arr))
        s = pc.index_in(t.column(type_col), value_set=step_arr) \
            .cast(pa.int64())
        ts64 = t.column(ts_col).cast(pa.timestamp("us")) \
            .cast(pa.int64())
        u = t.column(user_col)
        part = _key_bucket(u.to_numpy(zero_copy_only=False), n_parts)
        return pa.table({user_col: u, "__s": s, "__ts": ts64,
                         "__part": pa.array(part)})

    NONE = np.iinfo(np.int64).max

    def part_funnel(df: pd.DataFrame) -> pd.DataFrame:
        u = df[user_col].to_numpy()
        s = df["__s"].to_numpy()
        ts = df["__ts"].to_numpy()
        order = np.lexsort((ts, u))
        u, s, ts = u[order], s[order], ts[order]
        starts, ends = _run_bounds(u)
        uid = np.repeat(np.arange(len(starts)), ends - starts)
        win = None if within_s is None \
            else np.int64(round(within_s * 1e6))
        t = np.full((K, len(starts)), NONE, dtype=np.int64)
        prev = np.full(len(starts), -np.iinfo(np.int64).max,
                       dtype=np.int64)
        for k in range(K):
            # ts is sorted within each user run, so the min qualifying
            # event is the FIRST masked row per user — no ufunc.at
            m = (s == k) & (ts > prev[uid])
            if win is not None and k > 0:
                lim = prev.copy()
                ok = prev != NONE        # avoid +win wraparound on
                lim[ok] += win           # the NONE sentinel
                m &= ts <= lim[uid]
            idx = np.flatnonzero(m)
            if len(idx):
                iu = uid[idx]
                sel = idx[np.r_[True, iu[1:] != iu[:-1]]]
                t[k][uid[sel]] = ts[sel]
            prev = t[k]
        stage = (t != NONE).sum(axis=0).astype(np.int64)
        keep = t[0] != NONE
        out = pd.DataFrame({user_col: u[starts][keep],
                            "stage": stage[keep]})
        for k in range(K):
            col = t[k][keep]
            out[f"ts_{k + 1}"] = pd.Series(col).astype("datetime64[us]") \
                .mask(col == NONE)
        return out

    return ds.map_batches(emit, batch_format="pyarrow") \
        .groupby("__part").map_groups(part_funnel,
                                      batch_format="pandas")


def weighted_sample(ds, k: int, weight_col: str, id_col: str = "doc_id",
                    seed: str = "s0", qscale: int = 10 ** 9,
                    group_col: str | None = None):
    """Efraimidis–Spirakis (A-ES) weighted sampling WITHOUT
    replacement: each row draws u = hash-uniform(0,1] and the k
    largest u^(1/w) win — equivalently the k largest ln(u)/w, which
    is what this computes.  Deterministic and partition-independent:
    u derives from md5(seed:id) (the q46 convention), never an RNG.

    Exactness contract: L = floor(ln(u) * qscale) is an integer —
    ln(u) goes through libm (DuckDB-``ln``-bit-identical; vectorized
    np.log with an exact math.log re-check on the ~2e-4 of rows that
    land within 1e-4 of a floor boundary, where numpy's SIMD log
    could round the quantization differently) — and the sort key
    L / w is a single IEEE division of exactly-representable values,
    so the selected set and the key column are value-exact vs a SQL
    oracle.  Rows with w <= 0 are excluded (their A-ES key is
    undefined).

    Distributed shape: per-block top-k partials (k rows each) reduce
    on the driver — k x n_blocks rows, never the corpus.  With
    ``group_col``, the top-k is PER GROUP (stratified weighted
    sampling): partials keep k rows per group per block, the driver
    reduce is k x groups x n_blocks.  Returns a pandas DataFrame of
    the winners (+ ``key`` column), ordered by group, key desc, id.
    """
    import math

    from ..stages.text import md5_lo64

    S = float(qscale)
    TWO64 = float(2 ** 64)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        w = df[weight_col].to_numpy(np.float64)
        df = df[w > 0]
        w = w[w > 0]
        if not len(df):
            return df.assign(key=np.empty(0, np.float64))
        h = md5_lo64([f"{seed}:{v}" for v in df[id_col]])
        u = (h.astype(np.float64) + 1.0) / TWO64
        v = np.log(u) * S
        q = np.floor(v)
        frac = v - q
        tol = 1e-4
        fix = np.flatnonzero((frac < tol) | (frac > 1.0 - tol))
        if len(fix):
            q[fix] = [float(math.floor(math.log(x) * S))
                      for x in u[fix]]
        key = q / w
        return _topk(df.assign(key=key))

    def _topk(df: pd.DataFrame) -> pd.DataFrame:
        key = df["key"].to_numpy()
        ids = df[id_col].to_numpy()
        if group_col is None:
            order = np.lexsort((ids, -key))[:k]
            return df.iloc[order]
        g = df[group_col].to_numpy()
        order = np.lexsort((ids, -key, g))
        gs = g[order]
        bnd = np.nonzero(gs[1:] != gs[:-1])[0] + 1
        starts = np.concatenate([[0], bnd])
        run = np.arange(len(gs)) - np.repeat(
            starts, np.diff(np.concatenate([starts, [len(gs)]])))
        return df.iloc[order[run < k]]

    pdf = ds.map_batches(partial, batch_format="pandas").to_pandas()
    return _topk(pdf).reset_index(drop=True)


def retention_cohorts(ds, user_col: str = "user_id",
                      ts_col: str = "ts",
                      period_s: int = 7 * 86400,
                      n_parts: int = 64):
    """Cohort retention analysis: users cohort by the DAY of their
    first event; each (cohort_day, period offset) cell counts the
    DISTINCT users from that cohort active in that period —
    offset = floor((event_ts - first_ts) / period_s), so offset 0 is
    every cohort's own period and the retention curve reads across
    offsets.  Returns (cohort_day, offset, n_users).

    ONE bucket-hash shuffle co-locates each user's events; the
    first-touch min, the offset derivation and the per-user cell
    dedup all run inside that partition (no separate first-touch
    groupby, no join back — the original two-exchange + join shape
    measured 40x slower at 10M events), and only per-partition
    (cell, count) partials reach the cell-bounded driver reduce.
    """
    day_us = np.int64(86400 * 10 ** 6)
    per_us = np.int64(period_s * 10 ** 6)

    def emit(df: pd.DataFrame) -> pd.DataFrame:
        u = df[user_col].to_numpy()
        return pd.DataFrame({
            user_col: u,
            "__ts": df[ts_col].astype("datetime64[us]")
            .astype("int64").to_numpy(),
            "__part": _key_bucket(u, n_parts)})

    def part_cells(df: pd.DataFrame) -> pd.DataFrame:
        u = df[user_col].to_numpy()
        ts = df["__ts"].to_numpy()
        order = np.lexsort((ts, u))
        u, ts = u[order], ts[order]
        starts, ends = _run_bounds(u)
        t0 = np.repeat(ts[starts], ends - starts)
        cells = pd.DataFrame({
            "cohort_day": t0 // day_us,
            "offset": (ts - t0) // per_us,
            user_col: u}).drop_duplicates()
        g = cells.groupby(["cohort_day", "offset"], sort=False) \
            .size().reset_index(name="n_users")
        return g

    partials = ds.map_batches(emit, batch_format="pandas") \
        .groupby("__part").map_groups(part_cells,
                                      batch_format="pandas")
    out = groupby_agg(partials, ["cohort_day", "offset"],
                      {"n_users": ("n_users", "sum")})
    return out.map_batches(
        lambda df: df.astype({"cohort_day": np.int64,
                              "offset": np.int64,
                              "n_users": np.int64}),
        batch_format="pandas")


def locf_fill(ds, col: str, user_col: str = "user_id",
              ts_col: str = "ts", n_parts: int = 64):
    """Last-observation-carried-forward fill: within each key's
    time-ordered event stream, a null ``col`` takes the most recent
    non-null value (leading nulls stay null) — the standard
    event-stream gap repair, SQL ``last_value(col IGNORE NULLS)``.

    One bucket-hash shuffle co-locates each key's events, then a
    vectorized per-partition lexsort + forward index propagation
    (np.maximum.accumulate over observed positions) fills every gap —
    no per-key tasks, no global sort.  Ties on (key, ts) resolve in
    input order within the partition, matching the window frame's
    ROWS semantics only when (key, ts) is unique — pass a unique
    tiebreak ts for exact parity.  Returns (user, ts, col) rows.
    """
    def emit(df: pd.DataFrame) -> pd.DataFrame:
        u = df[user_col].to_numpy()
        return pd.DataFrame({
            user_col: u,
            "__ts": df[ts_col].astype("datetime64[us]")
            .astype("int64").to_numpy(),
            col: df[col].to_numpy(np.float64),
            "__part": _key_bucket(u, n_parts)})

    def fill(df: pd.DataFrame) -> pd.DataFrame:
        u = df[user_col].to_numpy()
        ts = df["__ts"].to_numpy()
        v = df[col].to_numpy(np.float64)
        order = np.lexsort((ts, u))
        u, ts, v = u[order], ts[order], v[order]
        pos = np.arange(len(v))
        seen = np.where(~np.isnan(v), pos, -1)
        # reset the carry at key boundaries: a new key's first row
        # must not inherit the previous key's carry
        starts, ends = _run_bounds(u)
        carry = np.maximum.accumulate(seen)
        first = np.repeat(starts, ends - starts)
        carry = np.where(carry >= first, carry, -1)
        filled = np.where(carry >= 0, v[np.maximum(carry, 0)], np.nan)
        return pd.DataFrame({
            user_col: u,
            ts_col: pd.Series(ts).astype("datetime64[us]"),
            col: filled})

    return ds.map_batches(emit, batch_format="pandas") \
        .groupby("__part").map_groups(fill, batch_format="pandas")


def rolling_active(ds, user_col: str = "user_id", ts_col: str = "ts",
                   window: int = 7, n_parts: int = 64):
    """Rolling distinct active users (the DAU/WAU retention curve):
    for each event day d, how many DISTINCT users had at least one
    event in the trailing ``window`` days [d-window+1, d].

    Exact rolling COUNT DISTINCT does not decompose over a shuffle,
    so this uses interval coverage: each distinct (user, active-day)
    pair contributes the ``window`` days whose trailing window
    contains it, overlaps collapse per user, and a day count reads
    the curve.  ONE bucket-hash exchange total: events project to
    per-batch-deduped (user, day) rows bucketed by user; each bucket
    then dedups its users globally, expands windows against the
    broadcast day list (the day DOMAIN is calendar-bounded — days,
    unlike users, fit any driver), and emits per-day partial counts
    whose final reduce is day-bounded.  Output days are restricted
    to days that appear in the input (the SQL mirror joins the same
    day list).  Returns (day, n_users), day = epoch days.
    """
    import ray

    day_us = np.int64(86400 * 10 ** 6)

    def daily_partial(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            user_col: df[user_col].to_numpy(),
            "day": df[ts_col].astype("datetime64[us]")
            .astype("int64").to_numpy() // day_us}).drop_duplicates()
        out["__part"] = _key_bucket(out[user_col].to_numpy(), n_parts)
        return out

    daily = ds.map_batches(daily_partial,
                           batch_format="pandas").materialize()
    days = np.sort(daily.map_batches(
        lambda df: df[["day"]].drop_duplicates(),
        batch_format="pandas").to_pandas()["day"].unique())
    dref = ray.put(days)

    def part_counts(df: pd.DataFrame) -> pd.DataFrame:
        days_ = ray.get(dref)
        df = df[[user_col, "day"]].drop_duplicates()
        u = np.repeat(df[user_col].to_numpy(), window)
        d = (np.repeat(df["day"].to_numpy(), window)
             + np.tile(np.arange(window, dtype=np.int64), len(df)))
        i = np.searchsorted(days_, d)
        j = np.minimum(i, len(days_) - 1)
        ok = (i < len(days_)) & (days_[j] == d)
        cov = pd.DataFrame({user_col: u[ok],
                            "day": d[ok]}).drop_duplicates()
        g = cov.groupby("day").size().reset_index(name="n_users")
        return g

    partials = daily.groupby("__part").map_groups(
        part_counts, batch_format="pandas")
    out = groupby_agg(partials, ["day"],
                      {"n_users": ("n_users", "sum")})
    return out.map_batches(
        lambda df: df.astype({"day": np.int64,
                              "n_users": np.int64})
        .sort_values("day"), batch_format="pandas")


def dataset_diff(left_ds, right_ds, key: str, cols,
                 num_buckets: int = 32):
    """Keyed dataset diff (the incremental-pipeline regression
    check): full-outer bucketed join on ``key`` comparing row
    fingerprints — md5 of the ``cols`` values joined with the unit
    separator — and reporting every divergent key as
    (key, 'added' | 'removed' | 'changed'); unchanged rows drop
    in-partition, so the output is bounded by the diff size, not
    the table size.  Fingerprints stringify values (ints and strings
    mirror SQL CAST exactly; avoid raw floats in ``cols``).
    """
    from ..stages.text import md5_lo64

    cols = list(cols)

    def fp(df: pd.DataFrame, out: str) -> pd.DataFrame:
        parts = [df[c].astype(str).to_numpy(object) for c in cols]
        joined = parts[0]
        for p in parts[1:]:
            joined = np.char.add(np.char.add(
                joined.astype(str), "\x1f"), p.astype(str))
        # 52-bit fingerprints: the outer join NaN-pads the missing
        # side, degrading the column to float64 — 52 bits stay exact
        # through that round-trip (full uint64 would not)
        h = (md5_lo64(list(joined))
             & np.uint64((1 << 52) - 1)).astype(np.int64)
        return pd.DataFrame({key: df[key].to_numpy(), out: h})

    l_ = left_ds.map_batches(lambda df: fp(df, "__fl"),
                             batch_format="pandas")
    r_ = right_ds.map_batches(lambda df: fp(df, "__fr"),
                              batch_format="pandas")
    j = hash_join_bucketed(l_, r_, on=key, how="outer",
                           num_buckets=num_buckets)

    def classify(df: pd.DataFrame) -> pd.DataFrame:
        fl = df["__fl"].to_numpy(np.float64)
        fr = df["__fr"].to_numpy(np.float64)
        added = np.isnan(fl)
        removed = np.isnan(fr)
        changed = ~added & ~removed & (fl != fr)
        status = np.full(len(df), "", dtype=object)
        status[added] = "added"
        status[removed] = "removed"
        status[changed] = "changed"
        keep = status != ""
        return pd.DataFrame({key: df[key].to_numpy()[keep],
                             "status": status[keep]})

    return j.map_batches(classify, batch_format="pandas")


def cube_agg(ds, keys: list[str], aggs: dict[str, tuple[str, str]],
             all_label: str = "(all)"):
    """SQL ``GROUP BY CUBE(keys...)``: the aggregate at EVERY subset
    of the key columns (2^k grouping sets), rolled-up key columns
    carrying ``all_label``.  Like :func:`rollup_agg`, one distributed
    pass computes the finest level and every other grouping set
    re-aggregates that bounded result — valid because the supported
    fns (sum/count/min/max) are re-aggregable (count re-sums).
    Returns a pandas DataFrame, all 2^k levels unioned.
    """
    from itertools import combinations

    for out, (col, fn) in aggs.items():
        if fn not in ("sum", "count", "min", "max"):
            raise ValueError(f"cube_agg: {fn} is not re-aggregable")
    finest = groupby_agg(ds, keys, aggs, final="distributed") \
        .to_pandas()
    re_fn = {out: ("sum" if fn == "count" else fn)
             for out, (col, fn) in aggs.items()}
    levels = [finest[keys + list(aggs)]]
    for r in range(len(keys) - 1, -1, -1):
        for sub in combinations(keys, r):
            sub = list(sub)
            if sub:
                g = finest.groupby(sub, as_index=False) \
                    .agg({out: fn for out, fn in re_fn.items()})
            else:
                g = pd.DataFrame({out: [getattr(finest[out], fn)()]
                                  for out, fn in re_fn.items()})
            for k in keys:
                if k not in sub:
                    g[k] = all_label
            levels.append(g[keys + list(aggs)])
    out = pd.concat(levels, ignore_index=True)
    return out.sort_values(keys, kind="mergesort") \
        .reset_index(drop=True)


def user_features(ds, user_col: str = "user_id", ts_col: str = "ts",
                  session_gap_s: float = 4 * 3600, n_parts: int = 64):
    """Per-user behavioral feature matrix (the churn-model feature
    step): one row per user with
    ``n_events``, ``n_sessions`` (gap-based, ``session_gap_s``),
    ``days_active`` (distinct days), ``last_day`` (epoch day of the
    latest event) and ``median_gap_us`` (exact median inter-event
    gap in microseconds; -1 for single-event users).

    ONE bucket-hash shuffle co-locates each user's events; every
    feature then reads from one vectorized pass over the sorted
    partition — run-bound arithmetic for counts/sessions/days, and
    the gap median via a (user, gap) lexsort + per-run middle index
    (medians of even runs average two middles: exact .0/.5 halves,
    mirrored by SQL ``median``).  No per-user tasks.
    """
    gap_us = np.int64(round(session_gap_s * 1e6))
    day_us = np.int64(86400 * 10 ** 6)

    def emit(df: pd.DataFrame) -> pd.DataFrame:
        u = df[user_col].to_numpy()
        return pd.DataFrame({
            user_col: u,
            "__ts": df[ts_col].astype("datetime64[us]")
            .astype("int64").to_numpy(),
            "__part": _key_bucket(u, n_parts)})

    def feats(df: pd.DataFrame) -> pd.DataFrame:
        u = df[user_col].to_numpy()
        ts = df["__ts"].to_numpy()
        order = np.lexsort((ts, u))
        u, ts = u[order], ts[order]
        starts, ends = _run_bounds(u)
        n = ends - starts
        # sessions: 1 + gaps > threshold within each run
        new_u = np.zeros(len(u), dtype=bool)
        new_u[starts] = True
        gap = np.empty(len(u), dtype=np.int64)
        gap[0] = 0
        gap[1:] = ts[1:] - ts[:-1]
        sess_break = (~new_u) & (gap > gap_us)
        n_sessions = 1 + np.add.reduceat(
            sess_break.astype(np.int64), starts)
        # distinct active days per run
        day = ts // day_us
        day_change = np.zeros(len(u), dtype=np.int64)
        day_change[1:] = (day[1:] != day[:-1]).astype(np.int64)
        day_change[starts] = 0
        days_active = 1 + np.add.reduceat(day_change, starts)
        last_day = day[ends - 1]
        # exact median inter-event gap per run (n-1 gaps per run)
        med = np.full(len(starts), -1.0)
        multi = n > 1
        if multi.any():
            gu = u[~new_u]
            gv = gap[~new_u].astype(np.float64)
            go = np.lexsort((gv, gu))
            gu, gv = gu[go], gv[go]
            gs, ge = _run_bounds(gu)
            m = ge - gs
            lo = gs + (m - 1) // 2
            hi = gs + m // 2
            med_vals = (gv[lo] + gv[hi]) / 2.0
            med[multi] = med_vals
        return pd.DataFrame({
            user_col: u[starts],
            "n_events": n.astype(np.int64),
            "n_sessions": n_sessions.astype(np.int64),
            "days_active": days_active.astype(np.int64),
            "last_day": last_day.astype(np.int64),
            "median_gap_us": med})

    return ds.map_batches(emit, batch_format="pandas") \
        .groupby("__part").map_groups(feats, batch_format="pandas")


def histogram(ds, col: str, bins: int = 32, mn=None, mx=None):
    """Exact distributed histogram: one min/max reduce (skipped when
    ``mn``/``mx`` are given), then per-batch integer bin-count
    partials — bin = floor((v - mn) / (mx - mn) * bins) clipped to
    [0, bins-1], single IEEE ops so a SQL mirror matches exactly —
    summed on the driver (``bins`` ints).  NaNs drop.  Returns a
    pandas DataFrame (bin, lo, hi, n) with float bin edges.
    """
    if mn is None or mx is None:
        def mm(df: pd.DataFrame) -> pd.DataFrame:
            v = df[col].to_numpy(np.float64)
            v = v[~np.isnan(v)]
            if not len(v):
                return pd.DataFrame({"mn": [], "mx": []})
            return pd.DataFrame({"mn": [v.min()], "mx": [v.max()]})
        mmdf = ds.map_batches(mm, batch_format="pandas").to_pandas()
        mn = float(mmdf["mn"].min()) if mn is None else mn
        mx = float(mmdf["mx"].max()) if mx is None else mx

    def counts(df: pd.DataFrame) -> pd.DataFrame:
        v = df[col].to_numpy(np.float64)
        v = v[~np.isnan(v)]
        if mx > mn:
            b = np.floor((v - mn) / (mx - mn) * bins).astype(np.int64)
            b = np.clip(b, 0, bins - 1)
        else:
            b = np.zeros(len(v), dtype=np.int64)
        return pd.DataFrame({"bin": np.arange(bins, dtype=np.int64),
                             "n": np.bincount(b, minlength=bins)
                             .astype(np.int64)})

    agg = ds.map_batches(counts, batch_format="pandas").to_pandas() \
        .groupby("bin", as_index=False)["n"].sum()
    w = (mx - mn) / bins
    agg["lo"] = mn + agg["bin"].to_numpy(np.float64) * w
    agg["hi"] = mn + (agg["bin"].to_numpy(np.float64) + 1) * w
    return agg[["bin", "lo", "hi", "n"]].sort_values("bin") \
        .reset_index(drop=True)


def event_sequences(ds, k: int = 3, user_col: str = "user_id",
                    ts_col: str = "ts", type_col: str = "event_type",
                    n_parts: int = 64):
    """Event path analysis: counts of every length-``k`` sequence of
    CONSECUTIVE events within a user's time-ordered stream (the
    classic "top paths" funnel-discovery table).  One bucket-hash
    shuffle of (user, type, ts) rows; per partition a vectorized
    lexsort + shifted-array window (rows whose next k-1 events stay
    in the same user run); per-partition partial counts reduce
    driver-side — the k-gram domain is |types|^k bounded, never
    event-bounded.  Returns (s1..sk, n) sorted by count desc then
    sequence.
    """
    def emit(df: pd.DataFrame) -> pd.DataFrame:
        u = df[user_col].to_numpy()
        return pd.DataFrame({
            user_col: u,
            "__t": df[type_col].to_numpy(object),
            "__ts": df[ts_col].astype("datetime64[us]")
            .astype("int64").to_numpy(),
            "__part": _key_bucket(u, n_parts)})

    def part_counts(df: pd.DataFrame) -> pd.DataFrame:
        u = df[user_col].to_numpy()
        t = df["__t"].to_numpy(object)
        ts = df["__ts"].to_numpy()
        order = np.lexsort((ts, u))
        u, t = u[order], t[order]
        m = len(u)
        if m < k:
            return pd.DataFrame(
                {**{f"s{i+1}": np.empty(0, object) for i in range(k)},
                 "n": np.empty(0, np.int64)})
        ok = np.ones(m - k + 1, dtype=bool)
        for j in range(1, k):
            ok &= u[j:m - k + 1 + j] == u[:m - k + 1]
        cols = {f"s{j+1}": t[j:m - k + 1 + j][ok] for j in range(k)}
        g = pd.DataFrame(cols).groupby(list(cols), sort=False) \
            .size().reset_index(name="n")
        return g

    partials = ds.map_batches(emit, batch_format="pandas") \
        .groupby("__part").map_groups(part_counts,
                                      batch_format="pandas")
    scols = [f"s{j+1}" for j in range(k)]
    out = groupby_agg(partials, scols, {"n": ("n", "sum")}) \
        .to_pandas()
    out["n"] = out["n"].astype(np.int64)
    return out.sort_values(["n"] + scols,
                           ascending=[False] + [True] * k,
                           kind="mergesort").reset_index(drop=True)


def resample_time(ds, ts_col: str, key_col: str, val_col: str,
                  every_s: int = 3600, qscale: int = 100):
    """Fixed-interval time-series resampling with gap fill: events
    bucket to ``floor(epoch_us / every_us)`` (integer arithmetic, so
    a SQL ``time_bucket``/integer-division mirror is exact), aggregate
    per (key, bucket) to (n, sum_q) — sum over ``val_col`` quantized
    to ``floor(v * qscale)`` int64 cents so the distributed sum is
    order-independent and value-exact — then the grid zero-fills every
    missing bucket per key across the GLOBAL [min, max] bucket range.

    Distributed shape: one streaming pass of per-batch (key, bucket)
    partials (the corpus never shuffles; partial rows are bounded by
    keys x buckets per batch), a bounded groupby reduce, then the
    calendar fill runs on the reduced grid — the grid IS the output,
    so materializing it is not a scale leak.  Returns a pandas frame
    (key, bucket_ts, n, sum_q) ordered by (key, bucket_ts)."""
    every_us = np.int64(every_s) * 1_000_000

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ts = df[ts_col].to_numpy("datetime64[us]").astype(np.int64)
        b = np.floor_divide(ts, every_us)
        q = np.floor(df[val_col].to_numpy(np.float64)
                     * qscale).astype(np.int64)
        g = pd.DataFrame({"k": df[key_col].to_numpy(), "b": b, "q": q}) \
            .groupby(["k", "b"], as_index=False) \
            .agg(n=("q", "size"), sq=("q", "sum"))
        return g

    grid = groupby_agg(ds.map_batches(partial, batch_format="pandas"),
                       ["k", "b"], {"n": ("n", "sum"),
                                    "sum_q": ("sq", "sum")},
                       final="driver").to_pandas()
    if not len(grid):
        return pd.DataFrame({key_col: [], "bucket_ts": pd.Series(
            [], dtype="datetime64[us]"),
            "n": pd.Series([], dtype=np.int64),
            "sum_q": pd.Series([], dtype=np.int64)})
    lo, hi = int(grid["b"].min()), int(grid["b"].max())
    cal = np.arange(lo, hi + 1, dtype=np.int64)
    keys = np.sort(grid["k"].unique())
    full = pd.DataFrame({"k": np.repeat(keys, len(cal)),
                         "b": np.tile(cal, len(keys))})
    out = full.merge(grid, on=["k", "b"], how="left")
    out["n"] = out["n"].fillna(0).astype(np.int64)
    out["sum_q"] = out["sum_q"].fillna(0).astype(np.int64)
    out["bucket_ts"] = pd.Series(out["b"].to_numpy(np.int64)
                                 * every_us).astype("datetime64[us]")
    out = out.rename(columns={"k": key_col})
    return out[[key_col, "bucket_ts", "n", "sum_q"]] \
        .sort_values([key_col, "bucket_ts"]).reset_index(drop=True)


def group_outliers(ds, key_col: str, val_col: str, z: int = 3,
                   qscale: int = 100, id_col: str | None = None):
    """Per-group z-score outlier detection with an EXACT integer
    contract: values quantize to ``q = floor(v * qscale)``; a row is
    an outlier iff ``(n-1) * (n*q - S)^2  >  z^2 * n * (n*Q - S^2)``
    where (n, S, Q) are the group's count / sum / sum-of-squares of q
    — algebraically ``(q - mean)^2 > z^2 * var_samp`` with every
    division and sqrt cleared, so a SQL HUGEINT mirror decides each
    row identically (no float stddev anywhere in the contract).

    Distributed shape: one streaming pass of per-batch (n, S, Q)
    partials (groupby_agg's distributive reduce — the group table is
    bounded), stats broadcast once via ray.put, then a stateless
    vectorized flag pass.  The comparison runs in float with an exact
    Python-int re-check on rows within 1e-9 relative of the boundary
    (the weighted_sample tolerance pattern — int64 would overflow at
    n ~ 1e6, float alone could flip a borderline row).

    Returns the flagged rows (key, [id], q) ordered by (key, q, id).
    """
    import ray

    def q_of(df: pd.DataFrame) -> np.ndarray:
        return np.floor(df[val_col].to_numpy(np.float64)
                        * qscale).astype(np.int64)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        qv = q_of(df)
        if len(qv) and int(np.abs(qv).max()) >= (1 << 31):
            raise ValueError(
                "group_outliers: |floor(v*qscale)| >= 2^31; lower "
                "qscale so q^2 stays exactly representable")
        # q^2 < 2^62 split into three 21-bit limbs: limb sums stay
        # int64-exact through the distributed reduce up to ~4e12 rows,
        # so the boundary re-check below reconstructs Q as a genuine
        # Python int (a float64 qq sum goes inexact past 2^53 total)
        q2 = qv * qv
        return pd.DataFrame({"k": df[key_col].to_numpy(),
                             "n": np.ones(len(df), np.int64),
                             "s": qv,
                             "qq_lo": q2 & ((1 << 21) - 1),
                             "qq_mid": (q2 >> 21) & ((1 << 21) - 1),
                             "qq_hi": q2 >> 42}) \
            .groupby("k", as_index=False) \
            .agg(n=("n", "sum"), s=("s", "sum"),
                 qq_lo=("qq_lo", "sum"), qq_mid=("qq_mid", "sum"),
                 qq_hi=("qq_hi", "sum"))

    stats = groupby_agg(ds.map_batches(partial, batch_format="pandas"),
                        ["k"], {"n": ("n", "sum"), "s": ("s", "sum"),
                                "qq_lo": ("qq_lo", "sum"),
                                "qq_mid": ("qq_mid", "sum"),
                                "qq_hi": ("qq_hi", "sum")},
                        final="driver").to_pandas()
    if not len(stats):
        cols = {key_col: pd.Series([], dtype=object)}
        if id_col is not None:
            cols[id_col] = pd.Series([], dtype=np.int64)
        cols["q"] = pd.Series([], dtype=np.int64)
        return pd.DataFrame(cols)
    # per-group Q reconstructed exactly from the 21-bit limb sums;
    # the float view drives the vectorized pass, the Python-int view
    # decides boundary rows (genuinely exact at any corpus size)
    stats = stats.set_index("k")
    qmap_exact = {k: (int(h) << 42) + (int(m) << 21) + int(lo)
                  for k, h, m, lo in zip(stats.index,
                                         stats["qq_hi"],
                                         stats["qq_mid"],
                                         stats["qq_lo"])}
    ref = ray.put((stats["n"].to_dict(), stats["s"].to_dict(),
                   {k: float(v) for k, v in qmap_exact.items()},
                   qmap_exact))

    def flag(df: pd.DataFrame) -> pd.DataFrame:
        nmap, smap, qmap, qexact = ray.get(ref)
        k = df[key_col]
        n = k.map(nmap).to_numpy(np.float64)
        S = k.map(smap).to_numpy(np.float64)
        Q = k.map(qmap).to_numpy(np.float64)
        qv = q_of(df)
        qf = qv.astype(np.float64)
        lhs = (n - 1) * (n * qf - S) ** 2
        rhs = float(z * z) * n * (n * Q - S * S)
        out = lhs > rhs
        margin = np.abs(lhs - rhs) <= 1e-9 * np.maximum(
            np.abs(lhs), np.abs(rhs))
        for i in np.flatnonzero(margin):
            ki, qi = k.iloc[i], int(qv[i])
            ni, Si = int(nmap[ki]), int(smap[ki])
            Qi = qexact[ki]  # exact Python int from the limb sums
            out[i] = (ni - 1) * (ni * qi - Si) ** 2 \
                > z * z * ni * (ni * Qi - Si * Si)
        res = pd.DataFrame({key_col: k.to_numpy()[out], "q": qv[out]})
        if id_col is not None:
            res.insert(1, id_col, df[id_col].to_numpy()[out])
        return res.astype({"q": np.int64})

    out = ds.map_batches(flag, batch_format="pandas").to_pandas()
    sort_cols = [key_col, "q"] + ([id_col] if id_col else [])
    if not len(out):
        # all-empty blocks can surface schemaless: rebuild typed empty
        cols = {key_col: pd.Series([], dtype=object)}
        if id_col is not None:
            cols[id_col] = pd.Series([], dtype=np.int64)
        cols["q"] = pd.Series([], dtype=np.int64)
        return pd.DataFrame(cols)
    out["q"] = out["q"].astype(np.int64)
    return out.sort_values(sort_cols).reset_index(drop=True)


def grouped_cumsum(ds, key_col: str, order_cols, val_col: str,
                   qscale: int = 100, n_parts: int = 64):
    """Per-key cumulative sum in event order — the running-total
    window (SUM OVER PARTITION BY key ORDER BY order) without a
    global sort: keys are independent, so ONE key-hash bucket shuffle
    co-locates each key's rows and the scan is a vectorized
    in-partition lexsort + cumsum with key-boundary resets (locf's
    carry shape).  Values quantize to ``floor(v * qscale)`` int64 so
    the running sums are order-independent integers, value-exact vs
    the SQL window mirror.  Returns all rows with ``cum_q``."""
    order_cols = [order_cols] if isinstance(order_cols, str) \
        else list(order_cols)

    def stamp(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__q"] = np.floor(df[val_col].to_numpy(np.float64)
                             * qscale).astype(np.int64)
        key = pd.util.hash_array(df[key_col].to_numpy()) \
            .astype(np.uint64)
        df["__part"] = (key % np.uint64(n_parts)).astype(np.int64)
        return df.drop(columns=[val_col])

    def scan(df: pd.DataFrame) -> pd.DataFrame:
        sort_key = [key_col] + order_cols
        df = df.sort_values(sort_key, kind="mergesort") \
            .reset_index(drop=True)
        q = df["__q"].to_numpy(np.int64)
        cum = np.cumsum(q)
        k = df[key_col].to_numpy()
        starts = np.concatenate(
            [[0], np.nonzero(k[1:] != k[:-1])[0] + 1])
        # per-key reset: subtract the running total just before each
        # key's first row, broadcast to the key's rows via group ids
        grp = np.zeros(len(q), np.int64)
        grp[starts] = 1
        gid = np.cumsum(grp) - 1
        base = (cum[starts] - q[starts])[gid]
        df["cum_q"] = cum - base
        return df.drop(columns=["__part", "__q"])

    return ds.map_batches(stamp, batch_format="pandas") \
        .groupby("__part").map_groups(scan, batch_format="pandas")


def grouping_sets_agg(ds, keys: list[str], sets: list[list[str]],
                      aggs: dict[str, tuple[str, str]],
                      all_label: str = "(all)"):
    """SQL ``GROUP BY GROUPING SETS (...)`` — the general form of
    :func:`rollup_agg` / :func:`cube_agg`: aggregate at an arbitrary
    list of key subsets.  One distributed pass computes the finest
    level (the union of all requested keys); every requested set
    re-aggregates that bounded result (sum/count/min/max are
    re-aggregable; count re-sums).  Rolled-up key columns carry
    ``all_label``.  Returns all sets unioned, finest-first order."""
    for out, (col, fn) in aggs.items():
        if fn not in ("sum", "count", "min", "max"):
            raise ValueError(f"grouping_sets_agg: {fn} is not "
                             "re-aggregable")
    finest = groupby_agg(ds, keys, aggs, final="distributed") \
        .to_pandas()
    if not len(finest):
        finest = pd.DataFrame({c: [] for c in keys + list(aggs)})
    re_fn = {out: ("sum" if fn == "count" else fn)
             for out, (col, fn) in aggs.items()}
    levels = []
    for sub in sets:
        sub = list(sub)
        if sorted(sub) == sorted(keys):
            g = finest.copy()
        elif sub:
            g = finest.groupby(sub, as_index=False) \
                .agg({out: fn for out, fn in re_fn.items()})
        else:
            g = pd.DataFrame({out: [getattr(finest[out], fn)()]
                              for out, fn in re_fn.items()})
        for k in keys:
            if k not in sub:
                g[k] = all_label
        levels.append(g[keys + list(aggs)])
    out = pd.concat(levels, ignore_index=True)
    return out.sort_values(keys, kind="mergesort") \
        .reset_index(drop=True)


def group_linfit(ds, key_col: str, ts_col: str, val_col: str,
                 x_every_s: int = 86400, qscale: int = 100):
    """Per-group OLS trend (slope of value vs time) from one-pass
    sufficient statistics — the per-user / per-type drift detector:
    x = integer time bucket (``floor(epoch_us / every_us)``), y =
    ``floor(v * qscale)`` cents, and
    ``slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2)`` with every sum an
    exact integer.  The final numerator/denominator are formed in
    arbitrary-precision Python ints on the bounded group table (they
    exceed int64 at corpus scale), divided once as doubles and
    rounded — DuckDB's HUGEINT arithmetic + double division follows
    the identical rounding, so the mirror is value-exact.

    Distributed shape: per-batch grouped (n, Sx, Sy, Sxy, Sxx) int64
    partials (corpus never shuffles), bounded driver reduce.  Groups
    with zero x-variance are dropped (undefined slope).  Returns
    (key, n, slope)."""
    every_us = np.int64(x_every_s) * 1_000_000

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        x = np.floor_divide(
            df[ts_col].to_numpy("datetime64[us]").astype(np.int64),
            every_us)
        y = np.floor(df[val_col].to_numpy(np.float64)
                     * qscale).astype(np.int64)
        g = pd.DataFrame({"k": df[key_col].to_numpy(),
                          "n": np.ones(len(df), np.int64),
                          "sx": x, "sy": y, "sxy": x * y,
                          "sxx": x * x})
        return g.groupby("k", as_index=False).sum()

    st = groupby_agg(ds.map_batches(partial, batch_format="pandas"),
                     ["k"], {c: (c, "sum")
                             for c in ["n", "sx", "sy", "sxy", "sxx"]},
                     final="driver").to_pandas()
    if len(st):
        # object-dtype numpy = elementwise Python-int arithmetic:
        # n*Sxx - Sx^2 etc. exceed int64 at corpus scale, and the
        # big-int products stay exact without a row loop.
        n = st["n"].to_numpy(np.int64).astype(object)
        sx = st["sx"].to_numpy(np.int64).astype(object)
        sy = st["sy"].to_numpy(np.int64).astype(object)
        sxy = st["sxy"].to_numpy(np.int64).astype(object)
        sxx = st["sxx"].to_numpy(np.int64).astype(object)
        den = n * sxx - sx * sx
        num = n * sxy - sx * sy
        keep = (den != 0).astype(bool)
        slope = np.fromiter(
            (round(float(a) / float(b), 9)
             for a, b in zip(num[keep], den[keep])),
            dtype=np.float64, count=int(keep.sum()))
        out = pd.DataFrame({key_col: st["k"].to_numpy()[keep],
                            "n": st["n"].to_numpy(np.int64)[keep],
                            "slope": slope})
    else:
        out = pd.DataFrame(
            {key_col: [], "n": pd.Series([], dtype=np.int64),
             "slope": pd.Series([], dtype=np.float64)})
    return out.sort_values(key_col).reset_index(drop=True)


def group_trimmed_mean(ds, key_col: str, val_col: str, id_col: str,
                       trim_num: int = 1, trim_den: int = 10,
                       qscale: int = 100, n_parts: int = 64):
    """Per-group trimmed mean — the robust location statistic that
    survives the outliers group_outliers flags: per key, drop the
    lowest and highest ``floor(n * trim_num/trim_den)`` values (rank
    by quantized value with id tiebreak, so ties cut
    deterministically) and report the exact integer (n_kept, sum_q)
    of the middle.  A SQL ``row_number`` window mirror matches
    row-for-row; the mean itself is one division left to the caller
    so every compared column stays integer.

    Distributed shape: ONE key-hash bucket shuffle co-locates each
    group; trimming is a vectorized in-partition lexsort + per-run
    rank arithmetic (the grouped_cumsum partition pattern) — no
    global sort, no driver state."""
    def stamp(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__q"] = np.floor(df[val_col].to_numpy(np.float64)
                             * qscale).astype(np.int64)
        key = pd.util.hash_array(df[key_col].to_numpy()) \
            .astype(np.uint64)
        df["__part"] = (key % np.uint64(n_parts)).astype(np.int64)
        return df[[key_col, id_col, "__q", "__part"]]

    def trim(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col, "__q", id_col],
                            kind="mergesort").reset_index(drop=True)
        k = df[key_col].to_numpy()
        q = df["__q"].to_numpy(np.int64)
        starts = np.concatenate(
            [[0], np.nonzero(k[1:] != k[:-1])[0] + 1])
        ends = np.concatenate([starts[1:], [len(k)]])
        rows = []
        for s, e in zip(starts, ends):
            n = e - s
            cut = (n * trim_num) // trim_den
            kept = q[s + cut:e - cut]
            rows.append((k[s], int(len(kept)), int(kept.sum())))
        return pd.DataFrame(rows, columns=[key_col, "n_kept",
                                           "sum_q"]) \
            if rows else pd.DataFrame(
                {key_col: pd.Series([], dtype=object),
                 "n_kept": pd.Series([], dtype=np.int64),
                 "sum_q": pd.Series([], dtype=np.int64)})

    out = ds.map_batches(stamp, batch_format="pandas") \
        .groupby("__part").map_groups(trim, batch_format="pandas") \
        .to_pandas()
    if not len(out):
        return pd.DataFrame({key_col: pd.Series([], dtype=object),
                             "n_kept": pd.Series([], dtype=np.int64),
                             "sum_q": pd.Series([], dtype=np.int64)})
    out = out.astype({"n_kept": np.int64, "sum_q": np.int64})
    return out.sort_values(key_col).reset_index(drop=True)


def group_corr(ds, key_col: str, x_col: str, y_col: str,
               x_qscale: int = 1, y_qscale: int = 100):
    """Per-group Pearson correlation from one-pass integer sufficient
    statistics (the group_linfit shape, plus Syy): x and y quantize
    via ``floor(v * qscale)`` int64, partials (n, Sx, Sy, Sxy, Sxx,
    Syy) reduce distributively, and
    ``r = (n Sxy - Sx Sy) / sqrt((n Sxx - Sx^2)(n Syy - Sy^2))``
    forms the numerator/denominator in arbitrary-precision Python
    ints (object-dtype numpy — they exceed int64 at corpus scale)
    before ONE double division + round(9).  DuckDB HUGEINT + double
    sqrt follows identical IEEE rounding, so the mirror is
    value-exact.  Groups with zero variance in either column drop.
    Returns (key, n, r)."""
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        x = np.floor(df[x_col].to_numpy(np.float64)
                     * x_qscale).astype(np.int64)
        y = np.floor(df[y_col].to_numpy(np.float64)
                     * y_qscale).astype(np.int64)
        return pd.DataFrame({"k": df[key_col].to_numpy(),
                             "n": np.ones(len(df), np.int64),
                             "sx": x, "sy": y, "sxy": x * y,
                             "sxx": x * x, "syy": y * y}) \
            .groupby("k", as_index=False).sum()

    cols = ["n", "sx", "sy", "sxy", "sxx", "syy"]
    st = groupby_agg(ds.map_batches(partial, batch_format="pandas"),
                     ["k"], {c: (c, "sum") for c in cols},
                     final="driver").to_pandas()
    if not len(st):
        return pd.DataFrame({key_col: [],
                             "n": pd.Series([], dtype=np.int64),
                             "r": pd.Series([], dtype=np.float64)})
    o = {c: st[c].to_numpy(np.int64).astype(object) for c in cols}
    num = o["n"] * o["sxy"] - o["sx"] * o["sy"]
    dx = o["n"] * o["sxx"] - o["sx"] * o["sx"]
    dy = o["n"] * o["syy"] - o["sy"] * o["sy"]
    den2 = dx * dy
    keep = ((dx != 0) & (dy != 0)).astype(bool)
    r = np.fromiter(
        (round(float(a) / math.sqrt(float(b)), 9)
         for a, b in zip(num[keep], den2[keep])),
        dtype=np.float64, count=int(keep.sum()))
    out = pd.DataFrame({key_col: st["k"].to_numpy()[keep],
                        "n": st["n"].to_numpy(np.int64)[keep],
                        "r": r})
    return out.sort_values(key_col).reset_index(drop=True)


def scd2_intervals(ds, key_col: str, ts_col: str, val_col: str,
                   qscale: int = 100, n_parts: int = 64,
                   end_sentinel: str = "2100-01-01"):
    """Slowly-changing-dimension (type 2) validity intervals from a
    change-event stream: per key in event order, each observation is
    valid from its own timestamp until the NEXT observation's (the
    SQL ``LEAD(ts) OVER (PARTITION BY key ORDER BY ts, ...)``
    mirror); the key's last observation closes at ``end_sentinel``
    so the contract stays NULL-free.  Values quantize to
    ``floor(v*qscale)`` int64.

    Distributed shape: keys are independent — ONE key-hash bucket
    shuffle co-locates each key, then a vectorized in-partition
    lexsort + shift (no global sort, no driver state).  Returns
    (key, valid_from, valid_to, v_q) for every event."""
    end_us = np.datetime64(end_sentinel, "us")

    def stamp(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__q"] = np.floor(df[val_col].to_numpy(np.float64)
                             * qscale).astype(np.int64)
        key = pd.util.hash_array(df[key_col].to_numpy()) \
            .astype(np.uint64)
        df["__part"] = (key % np.uint64(n_parts)).astype(np.int64)
        return df[[key_col, ts_col, "__q", "__part"]]

    def intervals(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col, ts_col, "__q"],
                            kind="mergesort").reset_index(drop=True)
        k = df[key_col].to_numpy()
        ts = df[ts_col].to_numpy("datetime64[us]")
        nxt = np.empty_like(ts)
        nxt[:-1] = ts[1:]
        nxt[-1:] = end_us
        # key boundary: last row of each key closes at the sentinel
        if len(k) > 1:
            last = np.concatenate([k[:-1] != k[1:], [True]])
        else:
            last = np.ones(len(k), bool)
        nxt[last] = end_us
        return pd.DataFrame({key_col: k,
                             "valid_from": ts,
                             "valid_to": nxt,
                             "v_q": df["__q"].to_numpy(np.int64)})

    return ds.map_batches(stamp, batch_format="pandas") \
        .groupby("__part").map_groups(intervals, batch_format="pandas")


def time_weighted_avg(ds, key_col: str, ts_col: str, val_col: str,
                      qscale: int = 100, n_parts: int = 64):
    """Per-key time-weighted value integral — the metric a plain AVG
    gets wrong on irregularly-sampled observations: each value holds
    (LOCF) until the key's next observation, so the exact statistic
    is ``wsum = sum(v_q * dt_us)`` over consecutive pairs plus
    ``span_us = last - first``; the caller divides once.  Both output
    columns are integers, value-exact vs a SQL LEAD mirror (the
    per-key wsum accumulates as Python ints via an object-dtype
    groupby — v_q * dt_us products overflow int64 at corpus scale).

    Distributed shape: one key-hash bucket shuffle + vectorized
    in-partition scan (the scd2_intervals pattern).  Keys with a
    single observation report (n=1, span=0, wsum=0).  Returns
    (key, n, span_us, wsum) with wsum as int64 (asserts it fits —
    per-key spans are bounded in practice; widen qscale down if
    not)."""
    def stamp(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__q"] = np.floor(df[val_col].to_numpy(np.float64)
                             * qscale).astype(np.int64)
        key = pd.util.hash_array(df[key_col].to_numpy()) \
            .astype(np.uint64)
        df["__part"] = (key % np.uint64(n_parts)).astype(np.int64)
        return df[[key_col, ts_col, "__q", "__part"]]

    def scan(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col, ts_col, "__q"],
                            kind="mergesort").reset_index(drop=True)
        k = df[key_col].to_numpy()
        ts = df[ts_col].to_numpy("datetime64[us]").astype(np.int64)
        q = df["__q"].to_numpy(np.int64)
        if not len(k):
            return pd.DataFrame({key_col: [],
                                 "n": pd.Series([], dtype=np.int64),
                                 "span_us": pd.Series([],
                                                      dtype=np.int64),
                                 "wsum": pd.Series([],
                                                   dtype=np.int64)})
        nxt_same = np.concatenate([k[1:] == k[:-1], [False]])
        dt = np.zeros(len(k), dtype=object)
        dt[nxt_same] = (np.concatenate([ts[1:], [0]])[nxt_same]
                        - ts[nxt_same])
        w = q.astype(object) * dt  # Python-int products, no overflow
        g = pd.DataFrame({key_col: k, "n": np.ones(len(k), np.int64),
                          "__ts": ts, "w": w}) \
            .groupby(key_col, as_index=False) \
            .agg(n=("n", "sum"), first=("__ts", "min"),
                 last=("__ts", "max"), wsum=("w", "sum"))
        wl = [int(v) for v in g["wsum"]]
        assert all(abs(v) < (1 << 63) for v in wl), \
            "time_weighted_avg: wsum exceeds int64 — lower qscale"
        return pd.DataFrame({key_col: g[key_col].to_numpy(),
                             "n": g["n"].to_numpy(np.int64),
                             "span_us": (g["last"] - g["first"])
                             .to_numpy(np.int64),
                             "wsum": np.array(wl, dtype=np.int64)})

    return ds.map_batches(stamp, batch_format="pandas") \
        .groupby("__part").map_groups(scan, batch_format="pandas")


def hash_join_salted(left_ds, right_ds, on, num_buckets: int = 32,
                     n_salt: int = 16, hot_k: int = 64,
                     hot_min_count: int = 100_000, how: str = "inner"):
    """Skew-resistant fact-to-dimension hash join: a handful of hot
    keys (the 60%-of-events-on-one-user shape) would serialize a
    plain bucketed join into one straggler partition.  Detection
    uses the EXACT heavy-hitter reduce (ops.sketch.heavy_hitters —
    local top-m candidates, no vocabulary shuffle); every left row
    of a hot key then gets a deterministic salt
    ``md5(key:ordinal) % n_salt`` while the RIGHT side replicates
    only its hot-key rows n_salt times, and the join runs on
    (key, salt) — hot keys fan across n_salt partitions, cold keys
    pay nothing, and the result set is identical to the unsalted
    join (SQL mirror: the plain JOIN).

    ``right_ds`` must be the small/dimension side (its hot rows
    replicate |hot| * n_salt times — bounded by hot_k).  Keys with
    left count < ``hot_min_count`` are never salted.

    Detection is ONE pass of per-block top-``hot_k`` value counts
    (driver sums the bounded candidates) — deliberately approximate,
    unlike ops.sketch.heavy_hitters' exact 3-pass reduce: a key hot
    enough to matter tops many blocks, and a borderline key that
    slips through simply stays unsalted (correctness never depends
    on detection).  The exact reduce cost more than the straggler it
    was removing."""
    import ray

    on_cols = [on] if isinstance(on, str) else list(on)
    if len(on_cols) != 1:
        raise ValueError("hash_join_salted: single join key only")
    key = on_cols[0]

    def local_top(df: pd.DataFrame) -> pd.DataFrame:
        vc = df[key].value_counts().head(hot_k)
        return pd.DataFrame({key: vc.index.to_numpy(),
                             "c": vc.to_numpy().astype(np.int64)})

    cand = left_ds.map_batches(local_top, batch_format="pandas") \
        .to_pandas()
    if len(cand):
        freq = cand.groupby(key)["c"].sum()
        hot = set(freq[freq >= hot_min_count].index.tolist())
    else:
        hot = set()
    if not hot:
        return hash_join_bucketed(left_ds, right_ds, on=key, how=how,
                                  num_buckets=num_buckets)
    hot_ref = ray.put(hot)

    def salt_left(df: pd.DataFrame) -> pd.DataFrame:
        hs = ray.get(hot_ref)
        df = df.copy()
        # pd.Series.isin = hash-based C membership (a per-row Python
        # `in set` loop here cost more than the straggler it saves)
        is_hot = df[key].isin(hs).to_numpy()
        salt = np.zeros(len(df), np.int64)
        if is_hot.any():
            # round-robin salt over the batch's hot rows: any even
            # spread works — the salt only routes partitioning, the
            # join result is identical for every assignment
            salt[is_hot] = np.arange(int(is_hot.sum()),
                                     dtype=np.int64) % n_salt
        df["__salt"] = salt
        return df

    def replicate_right(df: pd.DataFrame) -> pd.DataFrame:
        hs = ray.get(hot_ref)
        is_hot = df[key].isin(hs).to_numpy()
        reps = np.where(is_hot, n_salt, 1)
        idx = np.repeat(np.arange(len(df)), reps)
        out = df.iloc[idx].reset_index(drop=True)
        salt = np.concatenate(
            [np.arange(r, dtype=np.int64) for r in reps]) \
            if len(df) else np.empty(0, np.int64)
        out["__salt"] = salt
        return out

    joined = hash_join_bucketed(
        left_ds.map_batches(salt_left, batch_format="pandas"),
        right_ds.map_batches(replicate_right, batch_format="pandas"),
        on=[key, "__salt"], how=how, num_buckets=num_buckets)

    def drop_salt(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop(columns=["__salt"])

    return joined.map_batches(drop_salt, batch_format="pandas")


def interval_overlap_join(left_ds, right_ds,
                          lo="t_start", hi="t_end",
                          left_cols=(), right_cols=(),
                          cell_us: int = 3_600_000_000,
                          n_parts: int = 64):
    """Interval-to-interval OVERLAP join (``a.lo <= b.hi AND b.lo <=
    a.hi``, inclusive) — the join range_join can't express (both
    sides are intervals).  Ray Data has no native version; the
    distributed shape is the standard grid trick: each interval
    emits one row per ``cell_us`` time cell it spans, cells bucket-
    shuffle, and a per-cell vectorized merge finds overlapping pairs
    — with each pair REPORTED ONLY in the cell containing
    ``max(lo_a, lo_b)`` (the cell where the overlap starts), so no
    dedup pass is needed.  Pick ``cell_us`` near the typical
    interval length: emitted copies per interval =
    ceil(len/cell)+1.  Returns left_cols + right_cols +
    ``overlap_us = min(hi)-max(lo)``.

    The two tagged sides meet in one Dataset.union, whose NaN
    padding degrades the other side's int columns to float64 in
    mixed blocks — safe here because epoch-us timestamps (~2^51)
    sit under the 2^53 float64-exact bound; columns wider than 52
    bits must not ride through left_cols/right_cols (the q132
    lesson)."""
    left_cols = list(left_cols)
    right_cols = list(right_cols)

    def stamp(side_cols, tag):
        def _s(df: pd.DataFrame) -> pd.DataFrame:
            lo_v = df[lo].to_numpy("datetime64[us]").astype(np.int64)
            hi_v = df[hi].to_numpy("datetime64[us]").astype(np.int64)
            c0 = lo_v // cell_us
            c1 = hi_v // cell_us
            reps = (c1 - c0 + 1).astype(np.int64)
            idx = np.repeat(np.arange(len(df)), reps)
            cell = np.concatenate(
                [np.arange(a, b + 1) for a, b in zip(c0, c1)]) \
                if len(df) else np.empty(0, np.int64)
            out = {f"__{tag}_lo": lo_v[idx], f"__{tag}_hi": hi_v[idx],
                   "__cell": cell,
                   "__part": (cell % n_parts).astype(np.int64),
                   "__side": np.full(len(idx), tag, dtype=object)}
            for c in side_cols:
                out[c] = df[c].to_numpy()[idx]
            return pd.DataFrame(out)
        return _s

    tagged = left_ds.map_batches(stamp(left_cols, "l"),
                                 batch_format="pandas") \
        .union(right_ds.map_batches(stamp(right_cols, "r"),
                                    batch_format="pandas"))

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        l = df[df["__side"] == "l"]
        r = df[df["__side"] == "r"]
        empty = {c: pd.Series([], dtype=object)
                 for c in left_cols + right_cols}
        empty["overlap_us"] = pd.Series([], dtype=np.int64)
        if not len(l) or not len(r):
            return pd.DataFrame(empty)
        m = l[["__cell", "__l_lo", "__l_hi"] + left_cols].merge(
            r[["__cell", "__r_lo", "__r_hi"] + right_cols],
            on="__cell")
        if not len(m):
            return pd.DataFrame(empty)
        alo = m["__l_lo"].to_numpy(np.int64)
        ahi = m["__l_hi"].to_numpy(np.int64)
        blo = m["__r_lo"].to_numpy(np.int64)
        bhi = m["__r_hi"].to_numpy(np.int64)
        start = np.maximum(alo, blo)
        keep = (alo <= bhi) & (blo <= ahi) & \
            (start // cell_us == m["__cell"].to_numpy(np.int64))
        m = m[keep]
        out = m[left_cols + right_cols].reset_index(drop=True)
        out["overlap_us"] = (np.minimum(ahi, bhi)
                             - start)[keep].astype(np.int64)
        return out

    return tagged.groupby("__part").map_groups(pairs,
                                               batch_format="pandas")


def profile_columns(ds, cols: list[str]):
    """One-pass column profiler — the data-engineering sanity report
    (rows, nulls, exact distinct) per column: a single map over the
    corpus emits per-column (n, n_null) count partials PLUS distinct
    value-hash rows (md5 of the string form, the md5_number_lower
    convention); a (col, hash) distinct reduce then counts per
    column, so no column ever shuffles raw values.  Returns
    (column, n, n_null, n_distinct) in cols order."""
    from ..stages.text import md5_lo64

    def partial(df: pd.DataFrame):
        counts = []
        hash_rows = []
        for c in cols:
            s = df[c]
            nn = int(s.isna().sum())
            counts.append((c, len(s), nn))
            # unique BEFORE hashing: md5 is the per-value cost and
            # low-cardinality columns (flags, enums) collapse to a
            # handful of hashes per batch
            vals = s[s.notna()].unique()
            h = np.unique(md5_lo64([str(v) for v in vals])) \
                if len(vals) else np.empty(0, np.uint64)
            hash_rows.append(pd.DataFrame({
                "c": np.full(len(h), c, dtype=object),
                "h": (h & np.uint64((1 << 52) - 1)).astype(np.int64),
                "kind": np.full(len(h), "h", dtype=object),
                "n": np.zeros(len(h), np.int64),
                "nn": np.zeros(len(h), np.int64)}))
        cnt = pd.DataFrame(counts, columns=["c", "n", "nn"])
        cnt["h"] = np.int64(0)
        cnt["kind"] = "c"
        return pd.concat(hash_rows + [cnt[["c", "h", "kind", "n",
                                           "nn"]]],
                         ignore_index=True)

    rows = ds.map_batches(partial, batch_format="pandas")
    per_hash = groupby_agg(rows, ["c", "kind", "h"],
                           {"n": ("n", "sum"), "nn": ("nn", "sum")},
                           final="distributed")
    agg = groupby_agg(per_hash, ["c", "kind"],
                      {"cnt": ("h", "count"), "n": ("n", "sum"),
                       "nn": ("nn", "sum")},
                      final="driver").to_pandas()
    out = []
    for c in cols:
        g = agg[agg["c"] == c].set_index("kind")
        nd = int(g.loc["h", "cnt"]) if "h" in g.index else 0
        n = int(g.loc["c", "n"]) if "c" in g.index else 0
        nn = int(g.loc["c", "nn"]) if "c" in g.index else 0
        out.append((c, n, nn, nd))
    return pd.DataFrame(out, columns=["column", "n", "n_null",
                                      "n_distinct"]) \
        .astype({"n": np.int64, "n_null": np.int64,
                 "n_distinct": np.int64})


def cdc_apply(ds, key_col: str, ts_col: str, op_col: str,
              val_col: str, delete_op: str = "D",
              qscale: int = 100, n_parts: int = 64):
    """Apply a CDC changelog (ordered upsert/delete events) to
    produce the final table state: per key, the LAST operation in
    (ts, v_q) order wins — an upsert leaves (key, v_q), a delete
    removes the key (the SQL ``row_number() DESC = 1`` + filter
    mirror).  One key-hash bucket shuffle + in-partition lexsort
    take-last; no global sort.  Returns (key, v_q) sorted by key."""
    def stamp(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__q"] = np.floor(df[val_col].to_numpy(np.float64)
                             * qscale).astype(np.int64)
        key = pd.util.hash_array(df[key_col].to_numpy()) \
            .astype(np.uint64)
        df["__part"] = (key % np.uint64(n_parts)).astype(np.int64)
        return df[[key_col, ts_col, op_col, "__q", "__part"]]

    def last_state(df: pd.DataFrame) -> pd.DataFrame:
        # op_col in the tiebreak: a delete and an upsert sharing
        # (ts, v_q) must resolve identically to the SQL ORDER BY
        df = df.sort_values([key_col, ts_col, "__q", op_col],
                            kind="mergesort").reset_index(drop=True)
        k = df[key_col].to_numpy()
        if not len(k):
            return pd.DataFrame({key_col: pd.Series([], dtype=object),
                                 "v_q": pd.Series([],
                                                  dtype=np.int64)})
        last = np.concatenate([k[1:] != k[:-1], [True]])
        sel = df[last]
        keep = sel[op_col].to_numpy() != delete_op
        return pd.DataFrame({key_col: sel[key_col].to_numpy()[keep],
                             "v_q": sel["__q"]
                             .to_numpy(np.int64)[keep]})

    return ds.map_batches(stamp, batch_format="pandas") \
        .groupby("__part").map_groups(last_state,
                                      batch_format="pandas")


def compaction_plan(ds, file_col: str, size_col: str,
                    target_bytes: int):
    """Small-file compaction planner — the lakehouse maintenance op:
    given a file manifest (name, size), group files into compaction
    bins of ~``target_bytes`` by linear packing in (size DESC, name)
    order: ``bin = (running_total - size) // target``.  Deterministic
    and SQL-mirrorable (ORDER BY + window cumsum), unlike first-fit
    heuristics.  The manifest is metadata (bounded: one row per FILE,
    not per data row), so the plan reduces on the driver after a
    distributed (size, name) sort of partials; the DATA never moves
    here — executing the plan is a separate partitioned rewrite.
    Returns (file, size, bin) in packing order."""
    parts = ds.map_batches(
        lambda df: df[[file_col, size_col]], batch_format="pandas") \
        .to_pandas()
    parts = parts.sort_values([size_col, file_col],
                              ascending=[False, True],
                              kind="mergesort").reset_index(drop=True)
    sz = parts[size_col].to_numpy(np.int64)
    cum = np.cumsum(sz)
    parts["bin"] = ((cum - sz) // target_bytes).astype(np.int64)
    return parts.rename(columns={file_col: "file",
                                 size_col: "size"})


def grouped_rolling_sum(ds, key_col: str, order_cols, val_col: str,
                        window: int, qscale: int = 100,
                        n_parts: int = 64):
    """Per-key ROWS-window rolling sum — ``SUM(v) OVER (PARTITION BY
    key ORDER BY order ROWS window-1 PRECEDING)``: keys are
    independent so, unlike the global sliding_window_sum (halo
    exchange), ONE key-hash bucket shuffle co-locates each key and a
    vectorized cumsum-difference with key-boundary clamping computes
    every window in-partition (the grouped_cumsum shape).  Values
    quantize to ``floor(v*qscale)`` int64.  Returns all rows +
    ``wsum_q``."""
    order_cols = [order_cols] if isinstance(order_cols, str) \
        else list(order_cols)

    def stamp(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__q"] = np.floor(df[val_col].to_numpy(np.float64)
                             * qscale).astype(np.int64)
        key = pd.util.hash_array(df[key_col].to_numpy()) \
            .astype(np.uint64)
        df["__part"] = (key % np.uint64(n_parts)).astype(np.int64)
        return df.drop(columns=[val_col])

    def scan(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col] + order_cols + ["__q"],
                            kind="mergesort").reset_index(drop=True)
        q = df["__q"].to_numpy(np.int64)
        k = df[key_col].to_numpy()
        cum = np.concatenate([[0], np.cumsum(q)])
        starts = np.concatenate(
            [[0], np.nonzero(k[1:] != k[:-1])[0] + 1]) \
            if len(k) else np.empty(0, np.int64)
        grp = np.zeros(len(q), np.int64)
        if len(k):
            grp[starts] = 1
        gid = np.cumsum(grp) - 1
        first = starts[gid] if len(k) else np.empty(0, np.int64)
        i = np.arange(len(q))
        lo = np.maximum(i + 1 - window, first)
        df["wsum_q"] = cum[i + 1] - cum[lo]
        return df.drop(columns=["__part", "__q"]) \
            .assign(wsum_q=df["wsum_q"].to_numpy(np.int64))

    return ds.map_batches(stamp, batch_format="pandas") \
        .groupby("__part").map_groups(scan, batch_format="pandas")


def event_gaps(ds, key_col: str, ts_col: str, id_col: str,
               n_parts: int = 64):
    """Per-key inter-event gap (LAG delta): each event's microseconds
    since the key's previous event, -1 for the first (NULL-free
    contract, the locf sentinel convention).  One bucket shuffle +
    vectorized in-partition diff; SQL mirror is
    ``epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY key ORDER
    BY ts, id)``.  Returns (id, key, gap_us)."""
    def stamp(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        key = pd.util.hash_array(df[key_col].to_numpy()) \
            .astype(np.uint64)
        df["__part"] = (key % np.uint64(n_parts)).astype(np.int64)
        return df[[key_col, ts_col, id_col, "__part"]]

    def scan(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col, ts_col, id_col],
                            kind="mergesort").reset_index(drop=True)
        k = df[key_col].to_numpy()
        e = df[ts_col].to_numpy("datetime64[us]").astype(np.int64)
        gap = np.empty(len(k), np.int64)
        if len(k):
            gap[0] = -1
            gap[1:] = np.where(k[1:] == k[:-1], e[1:] - e[:-1], -1)
        return pd.DataFrame({id_col: df[id_col].to_numpy(),
                             key_col: k,
                             "gap_us": gap})

    return ds.map_batches(stamp, batch_format="pandas") \
        .groupby("__part").map_groups(scan, batch_format="pandas")


def group_mad_outliers(ds, key_col: str, val_col: str, id_col: str,
                       k: int = 3, qscale: int = 100,
                       n_parts: int = 64):
    """Robust per-group outlier flags via median/MAD — the detector
    group_outliers' mean/std version breaks on when outliers inflate
    sigma: per key, med = the rank-floor((n-1)/2) quantized value in
    (q, id) order (an ELEMENT, not an interpolation, so everything
    stays integer), MAD = the same rank of |q - med| in (dev, id)
    order, and a row is an outlier iff ``|q - med| > k * MAD``.
    A SQL double-row_number mirror matches row-for-row.

    Distributed shape: ONE key-hash bucket shuffle co-locates each
    group; both medians are in-partition vectorized lexsorts (no
    driver state, no global sort).  Returns flagged rows
    (key, id, q, med_q, mad_q) ordered by (key, id)."""
    def stamp(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__q"] = np.floor(df[val_col].to_numpy(np.float64)
                             * qscale).astype(np.int64)
        key = pd.util.hash_array(df[key_col].to_numpy()) \
            .astype(np.uint64)
        df["__part"] = (key % np.uint64(n_parts)).astype(np.int64)
        return df[[key_col, id_col, "__q", "__part"]]

    def _group_rank_pick(k_arr, order_q, order_id):
        """Per-run element at rank floor((n-1)/2) after lexsort by
        (key, q, id); returns the picked value broadcast per row."""
        order = np.lexsort((order_id, order_q, k_arr))
        ks = k_arr[order]
        starts = np.concatenate(
            [[0], np.nonzero(ks[1:] != ks[:-1])[0] + 1])
        ends = np.concatenate([starts[1:], [len(ks)]])
        grp = np.zeros(len(ks), np.int64)
        grp[starts] = 1
        gid_sorted = np.cumsum(grp) - 1
        n = (ends - starts)
        pick_pos = starts + (n - 1) // 2
        picked_sorted = order_q[order][pick_pos][gid_sorted]
        out = np.empty(len(ks), np.int64)
        out[order] = picked_sorted
        return out

    def flag(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({key_col: pd.Series([], dtype=object),
                                 id_col: pd.Series([], dtype=np.int64),
                                 "q": pd.Series([], dtype=np.int64),
                                 "med_q": pd.Series([],
                                                    dtype=np.int64),
                                 "mad_q": pd.Series([],
                                                    dtype=np.int64)})
        kf = pd.factorize(df[key_col], sort=True)[0].astype(np.int64)
        q = df["__q"].to_numpy(np.int64)
        i = df[id_col].to_numpy(np.int64)
        med = _group_rank_pick(kf, q, i)
        dev = np.abs(q - med)
        mad = _group_rank_pick(kf, dev, i)
        out = dev > k * mad
        res = pd.DataFrame({key_col: df[key_col].to_numpy()[out],
                            id_col: i[out], "q": q[out],
                            "med_q": med[out], "mad_q": mad[out]})
        return res

    got = ds.map_batches(stamp, batch_format="pandas") \
        .groupby("__part").map_groups(flag, batch_format="pandas") \
        .to_pandas()
    if not len(got):
        return pd.DataFrame({key_col: pd.Series([], dtype=object),
                             id_col: pd.Series([], dtype=np.int64),
                             "q": pd.Series([], dtype=np.int64),
                             "med_q": pd.Series([], dtype=np.int64),
                             "mad_q": pd.Series([], dtype=np.int64)})
    got = got.astype({id_col: np.int64, "q": np.int64,
                      "med_q": np.int64, "mad_q": np.int64})
    return got.sort_values([key_col, id_col]).reset_index(drop=True)


def agg_update(agg_df: pd.DataFrame, delta_ds, keys: list[str],
               aggs: dict[str, tuple[str, str]]) -> pd.DataFrame:
    """Incremental materialized-aggregate maintenance: merge a new
    corpus slice's aggregate into an existing grouped table WITHOUT
    re-reading old data (the ddsketch_update / bloom_update
    incremental contract, applied to groupby_agg).  Supported
    re-aggregable fns: sum/count (add), min/max (combine) —
    append-only deltas; retractions need a different structure.
    Proven == from-scratch over the union by the oracle gate."""
    for out, (col, fn) in aggs.items():
        if fn not in ("sum", "count", "min", "max"):
            raise ValueError(f"agg_update: {fn} is not re-aggregable")
    delta = groupby_agg(delta_ds, keys, aggs, final="distributed") \
        .to_pandas()
    both = pd.concat([agg_df, delta], ignore_index=True)
    re_fn = {out: ("sum" if fn in ("sum", "count") else fn)
             for out, (col, fn) in aggs.items()}
    out = both.groupby(keys, as_index=False) \
        .agg({o: f for o, f in re_fn.items()})
    return out.sort_values(keys, kind="mergesort") \
        .reset_index(drop=True)


def merge_intervals(ds, key_col: str, lo_col: str, hi_col: str,
                    n_parts: int = 64):
    """Per-key interval union (the classic gaps-and-islands):
    overlapping or touching intervals merge into islands; returns one
    row per island (key, island, start_us, end_us, n_merged) with
    island numbered 1.. per key in start order.  An interval joins
    the current island iff its lo <= the running max hi of all
    earlier intervals of the key (ties in (lo, hi) order — the SQL
    window mirror's frame).  One key-hash bucket shuffle +
    in-partition pandas groupby cummax/shift (vectorized C, no
    Python loop); no global sort."""
    def stamp(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        key = pd.util.hash_array(df[key_col].to_numpy()) \
            .astype(np.uint64)
        df["__part"] = (key % np.uint64(n_parts)).astype(np.int64)
        return df[[key_col, lo_col, hi_col, "__part"]]

    def islands(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({key_col: pd.Series([], dtype=object),
                                 "island": pd.Series([],
                                                     dtype=np.int64),
                                 "start_us": pd.Series([],
                                                       dtype=np.int64),
                                 "end_us": pd.Series([],
                                                     dtype=np.int64),
                                 "n_merged": pd.Series([],
                                                       dtype=np.int64)})
        df = df.sort_values([key_col, lo_col, hi_col],
                            kind="mergesort").reset_index(drop=True)
        g = df.groupby(key_col, sort=False)
        prev_max = g[hi_col].cummax().groupby(
            df[key_col], sort=False).shift(1)
        lo = df[lo_col].to_numpy(np.int64)
        start = prev_max.isna().to_numpy() | \
            (lo > prev_max.fillna(np.iinfo(np.int64).min)
             .to_numpy(np.int64))
        isl = pd.Series(start.astype(np.int64)) \
            .groupby(df[key_col], sort=False).cumsum()
        out = df.assign(island=isl.to_numpy(np.int64)) \
            .groupby([key_col, "island"], as_index=False) \
            .agg(start_us=(lo_col, "min"), end_us=(hi_col, "max"),
                 n_merged=(lo_col, "size"))
        return out.astype({"island": np.int64,
                           "start_us": np.int64,
                           "end_us": np.int64,
                           "n_merged": np.int64})

    return ds.map_batches(stamp, batch_format="pandas") \
        .groupby("__part").map_groups(islands, batch_format="pandas")


def group_winsorize_sum(ds, key_col: str, val_col: str, id_col: str,
                        p_lo: int = 10, p_hi: int = 90,
                        qscale: int = 100, n_parts: int = 64):
    """Per-group winsorized sum — the feature-engineering clamp:
    values clip to the group's [p_lo, p_hi] percentile ELEMENTS
    (rank floor((n-1)*p/100) in (q, id) order, so everything stays
    integer like group_mad_outliers) and the clamped sum reports as
    exact ints.  SQL mirror: double row_number rank picks + least/
    greatest + HUGEINT sum.  One bucket shuffle, in-partition
    vectorized rank picks.  Returns (key, n, lo_q, hi_q, sum_wq)."""
    def stamp(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__q"] = np.floor(df[val_col].to_numpy(np.float64)
                             * qscale).astype(np.int64)
        key = pd.util.hash_array(df[key_col].to_numpy()) \
            .astype(np.uint64)
        df["__part"] = (key % np.uint64(n_parts)).astype(np.int64)
        return df[[key_col, id_col, "__q", "__part"]]

    def pick_rank(kf, q, i, num, den):
        order = np.lexsort((i, q, kf))
        ks = kf[order]
        starts = np.concatenate(
            [[0], np.nonzero(ks[1:] != ks[:-1])[0] + 1])
        ends = np.concatenate([starts[1:], [len(ks)]])
        grp = np.zeros(len(ks), np.int64)
        grp[starts] = 1
        gid_sorted = np.cumsum(grp) - 1
        n = ends - starts
        pos = starts + ((n - 1) * num) // den
        picked = q[order][pos][gid_sorted]
        out = np.empty(len(ks), np.int64)
        out[order] = picked
        return out

    def winsor(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({key_col: pd.Series([], dtype=object),
                                 "n": pd.Series([], dtype=np.int64),
                                 "lo_q": pd.Series([], dtype=np.int64),
                                 "hi_q": pd.Series([], dtype=np.int64),
                                 "sum_wq": pd.Series([],
                                                     dtype=np.int64)})
        kf = pd.factorize(df[key_col], sort=True)[0].astype(np.int64)
        q = df["__q"].to_numpy(np.int64)
        i = df[id_col].to_numpy(np.int64)
        lo = pick_rank(kf, q, i, p_lo, 100)
        hi = pick_rank(kf, q, i, p_hi, 100)
        w = np.clip(q, lo, hi)
        out = pd.DataFrame({key_col: df[key_col].to_numpy(),
                            "lo_q": lo, "hi_q": hi, "w": w}) \
            .groupby([key_col, "lo_q", "hi_q"], as_index=False) \
            .agg(n=("w", "size"), sum_wq=("w", "sum"))
        return out[[key_col, "n", "lo_q", "hi_q", "sum_wq"]] \
            .astype({"n": np.int64, "lo_q": np.int64,
                     "hi_q": np.int64, "sum_wq": np.int64})

    got = ds.map_batches(stamp, batch_format="pandas") \
        .groupby("__part").map_groups(winsor, batch_format="pandas") \
        .to_pandas()
    return got.sort_values(key_col).reset_index(drop=True) \
        .astype({"n": np.int64, "lo_q": np.int64, "hi_q": np.int64,
                 "sum_wq": np.int64})


def skew_report(ds, key_col: str):
    """Key-skew diagnostic — the measurement behind every salting
    decision here: distributed per-key row counts, then distribution
    stats of the GROUP SIZES (n_keys, total rows, max, and the p50 /
    p99 size as rank ELEMENTS at floor((n-1)*p/100) in (size, key)
    order, so the mirror is a row_number pick).  The count table is
    bounded by |keys|; sizes beyond driver memory would shard the
    final pick — the same count-gate every broadcast here uses.
    Returns one row (n_keys, n_rows, max_sz, p50_sz, p99_sz,
    top_share_pct = floor(100 * max / total))."""
    cnt = groupby_agg(ds, [key_col], {"c": (key_col, "count")},
                      final="distributed").to_pandas()
    if not len(cnt):
        return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                             for c in ["n_keys", "n_rows", "max_sz",
                                       "p50_sz", "p99_sz",
                                       "top_share_pct"]})
    sz = cnt["c"].to_numpy(np.int64)
    order = np.lexsort((cnt[key_col].to_numpy(), sz))
    ss = sz[order]
    n = len(ss)
    tot = int(ss.sum())
    p50 = int(ss[((n - 1) * 50) // 100])
    p99 = int(ss[((n - 1) * 99) // 100])
    return pd.DataFrame({"n_keys": [n], "n_rows": [tot],
                         "max_sz": [int(ss[-1])],
                         "p50_sz": [p50], "p99_sz": [p99],
                         "top_share_pct": [100 * int(ss[-1]) // tot]}) \
        .astype(np.int64)
