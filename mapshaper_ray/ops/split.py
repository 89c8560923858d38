"""Layer splitting / merging / subdivision (SURVEY.md §2.7).

- ``split_by_field``    → -split field=  (src/commands/mapshaper-split.js:3-42):
  partitioned parquet write, one directory per key value — the
  distributed "one layer per value" (resumable, scan-prunable).
- ``split_on_grid``     → -split-on-grid (src/commands/mapshaper-split-on-grid.js:6-62):
  r{row}c{col} cell id from the feature bbox center; generalizes to the
  quadkey cells of cells.py.
- ``merge_layers``      → -merge-layers [force]
  (src/commands/mapshaper-merge-layers.js:4): schema-aligned union.
- ``subdivide``         → -subdivide (src/commands/mapshaper-subdivide.js:8-46):
  recursive median bisection on the longer bbox axis while the calc
  expression holds — driver-recursion over dataset splits.
"""

from __future__ import annotations
from ..sources.layers import nz as _nz

import numpy as np
import pandas as pd



def split_by_field(ds, field: str, out_dir: str):
    """Partitioned write: hive-style ``field=value`` directories."""
    ds.write_parquet(out_dir, partition_cols=[field])
    return out_dir


def feature_bbox(df: pd.DataFrame) -> pd.DataFrame:
    """Per-feature bbox columns __xmin/__ymin/__xmax/__ymax (NaN for
    null geometry)."""
    from ..sources.layers import geom_type_of
    gt = geom_type_of(list(df.columns))
    out = {k: [] for k in ("__xmin", "__ymin", "__xmax", "__ymax")}
    for row in df.to_dict("records"):
        if gt == "polygon":
            xs = [np.asarray(v, float) for v in _nz(row["rings_x"])]
            ys = [np.asarray(v, float) for v in _nz(row["rings_y"])]
        elif gt == "polyline":
            xs = [np.asarray(v, float) for v in _nz(row["part_x"])]
            ys = [np.asarray(v, float) for v in _nz(row["part_y"])]
        else:
            xs = [np.asarray(_nz(row["px"]), float)]
            ys = [np.asarray(_nz(row["py"]), float)]
        ax = np.concatenate(xs) if xs else np.empty(0)
        ay = np.concatenate(ys) if ys else np.empty(0)
        if len(ax):
            out["__xmin"].append(ax.min())
            out["__xmax"].append(ax.max())
            out["__ymin"].append(ay.min())
            out["__ymax"].append(ay.max())
        else:
            for k in out:
                out[k].append(np.nan)
    df = df.copy()
    for k, v in out.items():
        df[k] = v
    return df


def feature_bbox_center(df: pd.DataFrame) -> pd.DataFrame:
    from ..sources.layers import geom_type_of
    gt = geom_type_of(list(df.columns))
    cxs, cys = [], []
    for row in df.to_dict("records"):
        if gt == "polygon":
            xs = [np.asarray(v, float) for v in _nz(row["rings_x"])]
            ys = [np.asarray(v, float) for v in _nz(row["rings_y"])]
        elif gt == "polyline":
            xs = [np.asarray(v, float) for v in _nz(row["part_x"])]
            ys = [np.asarray(v, float) for v in _nz(row["part_y"])]
        else:
            xs = [np.asarray(_nz(row["px"]), float)]
            ys = [np.asarray(_nz(row["py"]), float)]
        ax = np.concatenate(xs) if xs else np.empty(0)
        ay = np.concatenate(ys) if ys else np.empty(0)
        if len(ax):
            cxs.append((ax.min() + ax.max()) / 2)
            cys.append((ay.min() + ay.max()) / 2)
        else:
            cxs.append(np.nan)
            cys.append(np.nan)
    df = df.copy()
    df["__cx"] = cxs
    df["__cy"] = cys
    return df


def split_on_grid(ds, cols: int, rows: int, bbox=None,
                  id_field: str = "cell"):
    """Assign ``r{row}c{col}`` from the feature bbox center.  With no
    bbox given, a first distributive pass computes the layer bbox.
    ``id_field`` names the cell column (-split-on-grid id-field=)."""
    from .features import layer_info
    if bbox is None:
        bbox = layer_info(ds)["bbox"]
    xmin, ymin, xmax, ymax = bbox
    dx = ((xmax - xmin) / cols) or 1.0
    dy = ((ymax - ymin) / rows) or 1.0

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        df = feature_bbox_center(df)
        cx = df["__cx"].to_numpy(float)
        cy = df["__cy"].to_numpy(float)
        # null/empty geometry → NaN center; the reference assigns ''
        # when the shape has no bounds (mapshaper-split-on-grid.js
        # hasBounds() check) instead of crashing on the int cast
        ok = np.isfinite(cx) & np.isfinite(cy)
        c = np.clip(np.where(ok, (cx - xmin) / dx, 0).astype(int),
                    0, cols - 1)
        r = np.clip(np.where(ok, (cy - ymin) / dy, 0).astype(int),
                    0, rows - 1)
        ids = np.char.add(np.char.add("r", r.astype(str)),
                          np.char.add("c", c.astype(str)))
        df[id_field] = np.where(ok, ids, "")
        return df.drop(columns=["__cx", "__cy"])
    return ds.map_batches(assign, batch_format="pandas")


_GEOMETRY_COLS = ("feature_id", "rings_x", "rings_y", "ring_poly",
                  "part_x", "part_y", "px", "py")


def merge_layers(layers: list, force: bool = False):
    """Concatenate layer Datasets in order (reference mergeLayers).
    Schemas must match unless ``force``, which aligns to the field
    union (missing columns null-padded — here explicitly, not via
    Dataset.union's silent padding).  feature_id is renumbered
    sequentially across layers so output order equals input order.
    When forced layers differ in fields, a hidden ``__fields`` column
    records each row's NATIVE fields — the reference's records simply
    lack the other keys (undefined, omitted by JSON.stringify), which
    the GeoJSON writer reproduces."""
    schemas = [l.schema().names for l in layers]
    union_names: list[str] = []
    for sch in schemas:
        for n in sch:
            if n not in union_names:
                union_names.append(n)
    if not force and any(set(s) != set(union_names) for s in schemas):
        raise ValueError("incompatible layer fields; pass force=True")
    mixed = force and any(set(s) != set(union_names) for s in schemas)
    if mixed and "__fields" not in union_names:
        union_names.append("__fields")

    # offset by max-id+1 (ids may be sparse after filters) so output
    # sort order = layer order, then within-layer order
    spans = [int(l.max("feature_id")) + 1 if c else 0
             for l, c in zip(layers, (l.count() for l in layers))]
    offsets = [0]
    for s in spans[:-1]:
        offsets.append(offsets[-1] + s)

    aligned = []
    for li, l in enumerate(layers):
        native = ",".join(c for c in schemas[li]
                          if c not in _GEOMETRY_COLS)

        def align(df: pd.DataFrame, off=offsets[li], nat=native
                  ) -> pd.DataFrame:
            df = df.copy()
            df["feature_id"] = df["feature_id"].to_numpy() + off
            if mixed:
                df["__fields"] = nat
            for n in union_names:
                if n not in df.columns:
                    df[n] = None
            return df[union_names]
        aligned.append(l.map_batches(align, batch_format="pandas"))
    out = aligned[0]
    for l in aligned[1:]:
        out = out.union(l)
    return out


def subdivide(ds, max_features: int):
    """Recursive median bisection on the longer bbox axis until every
    part holds <= max_features (the reference's calc-expression special
    case ``count() > N``).  Driver-side recursion; each split is a
    distributed filter.  Returns list of (bbox, Dataset)."""
    from .features import layer_info

    out = []

    def rec(d):
        info = layer_info(d)
        n = info["count"]
        if n <= max_features:
            out.append((info["bbox"], d))
            return
        xmin, ymin, xmax, ymax = info["bbox"]
        horiz = (xmax - xmin) >= (ymax - ymin)
        centered = d.map_batches(feature_bbox_center, batch_format="pandas")
        col = "__cx" if horiz else "__cy"
        vals = centered.map_batches(
            lambda df: df[[col]], batch_format="pandas").to_pandas()[col]
        med = float(vals.median())

        # pandas-level split, NOT Dataset.filter(row_fn): the row path
        # re-converts blocks to Arrow, which rejects nested ring
        # object arrays (ArrowNotImplementedError) on polygon layers
        def side(keep_left):
            def go(df, keep_left=keep_left):
                m = df[col] <= med
                return df[m if keep_left else ~m] \
                    .drop(columns=["__cx", "__cy"])
            return centered.map_batches(go, batch_format="pandas")
        left = side(True)
        right = side(False)
        if left.count() in (0, n) or right.count() in (0, n):
            out.append((info["bbox"], d))  # degenerate split; stop
            return
        rec(left)
        rec(right)

    rec(ds)
    return out


def subdivide_expr(ds, expr: str, id_col: str = "feature_id",
                   defs: dict | None = None):
    """Reference -subdivide with a GENERAL calc expression
    (src/commands/mapshaper-subdivide.js): recursively halve the layer
    along the longer bbox side while the expression evaluates true —
    e.g. ``sum(POP) > 5000`` or ``count() > 100 && width() > 1``.

    Split rule is the reference's divideLayer: features sort by their
    bbox-center coordinate and the FIRST HALF BY COUNT (ceil(n/2), not
    a coordinate median) goes left; a half recurses only while
    1 < len(half) < len(parent).  Driver-side recursion; the per-part
    expression evaluates distributed via calc_exprs and the split
    membership broadcasts as a sorted id array.  Returns list of
    (bbox, Dataset)."""
    import ray

    from .features import layer_info
    from .relational import calc_exprs

    def divides(d) -> bool:
        r = calc_exprs(d, f"__r = ({expr})", defs=defs).iloc[0]["__r"]
        if not isinstance(r, (bool, np.bool_)):
            raise ValueError(
                "-subdivide expression must evaluate to true or false")
        return bool(r)

    out = []

    def halves(d, info):
        xmin, ymin, xmax, ymax = info["bbox"]
        horiz = (xmax - xmin) >= (ymax - ymin)
        col = "__cx" if horiz else "__cy"
        centered = d.map_batches(feature_bbox_center,
                                 batch_format="pandas").materialize()
        key = centered.map_batches(
            lambda df: df[[id_col, col]],
            batch_format="pandas").to_pandas()
        order = np.argsort(key[col].to_numpy(), kind="stable")
        n = len(order)
        left_ids = np.sort(key[id_col].to_numpy()[
            order[: int(np.ceil(n / 2))]])
        ref = ray.put(left_ids)

        def side(keep_left):
            def go(df, keep_left=keep_left):
                ids = df[id_col].to_numpy()
                li = ray.get(ref)
                idx = np.clip(np.searchsorted(li, ids), 0,
                              max(len(li) - 1, 0))
                m = (len(li) > 0) & (li[idx] == ids) if len(li) else \
                    np.zeros(len(ids), dtype=bool)
                return df[m if keep_left else ~m] \
                    .drop(columns=["__cx", "__cy"])
            return centered.map_batches(go, batch_format="pandas")
        return side(True), side(False)

    def rec(d, parent_n):
        info = layer_info(d)
        n = info["count"]
        if n <= 1 or not divides(d):
            out.append((info["bbox"], d))
            return
        left, right = halves(d, info)
        for half in (left, right):
            hn = half.count()
            if 1 < hn < n:
                rec(half, n)
            else:
                out.append((layer_info(half)["bbox"], half))

    rec(ds, ds.count() + 1)
    return out
