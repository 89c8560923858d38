"""Point-in-polygon spatial join — the flagship operator.

Ray-Data shape (SURVEY.md §2.4 row "spatial join point→polygon"):
the polygon side is small → a packed PathIndex is published ONCE with
``ray.put``; the join runs as an actor-pool ``map_batches`` stage whose
``__init__`` unpacks the index once per actor and whose ``__call__``
probes a whole Arrow batch vectorized.  Equivalent semantics to the
reference's ``api.joinPolygonsToPoints``
(src/commands/mapshaper-spatial-join.js:10 +
src/paths/mapshaper-path-index.js:38-47): each point receives the fields
of its enclosing polygon; boundary counts as inside; unmatched points
keep null fields (left) or are dropped (inner).

The reverse join (polygon receives aggregates of its points) is the same
probe followed by a groupby on region_id — see ops/relational.groupby_agg.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..state.path_index import PathIndex


class PIPJoin:
    """map_batches(PIPJoin, fn_constructor_kwargs=dict(index_ref=...,
    attrs=...), concurrency=N) — index unpacked once per actor."""

    def __init__(self, index_ref=None, packed=None, attrs=None,
                 lon_col="lon", lat_col="lat", how="left",
                 out_col="region_id"):
        import ray
        if packed is None:
            packed = ray.get(index_ref)
        self.index = PathIndex.unpack(packed)
        self.lon_col = lon_col
        self.lat_col = lat_col
        self.how = how
        self.out_col = out_col
        # attrs: pandas DataFrame with region_id + attribute columns,
        # positioned so attrs.iloc[region_id] is the region's row
        self.attrs = attrs.sort_values("region_id").reset_index(drop=True) \
            if attrs is not None else None

    def __call__(self, batch: pa.Table) -> pa.Table:
        lon = np.asarray(batch[self.lon_col].to_numpy(zero_copy_only=False),
                         dtype=np.float64)
        lat = np.asarray(batch[self.lat_col].to_numpy(zero_copy_only=False),
                         dtype=np.float64)
        rid = self.index.find_enclosing_feature(lon, lat)
        batch = batch.append_column(self.out_col,
                                    pa.array(rid, type=pa.int64()))
        if self.attrs is not None:
            matched = rid >= 0
            safe = np.where(matched, rid, 0)
            for col in self.attrs.columns:
                if col == "region_id":
                    continue
                vals = self.attrs[col].to_numpy()[safe]
                arr = pa.array(vals)
                if not matched.all():
                    arr = pa.array(
                        np.where(matched, vals, None) if vals.dtype == object
                        else vals.tolist(),
                        mask=~matched)
                batch = batch.append_column(col, arr)
        if self.how == "inner":
            batch = batch.filter(pa.array(rid >= 0))
        return batch


def spatial_join(points_ds, index: PathIndex, attrs=None, how="left",
                 concurrency=None, batch_size=None,
                 lon_col="lon", lat_col="lat", out_col="region_id"):
    """Broadcast-index PIP join of a points Dataset against a polygon
    layer.

    Default (``concurrency=None``): task-pool mode — the packed index
    rides inside the callable (serialized to the object store once and
    shared by every task), so the stage fuses with neighbouring task
    pools and scales to all CPUs.  Pass ``concurrency`` for an actor
    pool (index unpacked once per actor via ray.put handle) — required
    when the polygon side is large enough that per-task unpack matters.
    NB Ray Data fuses a task chain INTO a downstream actor pool, capping
    the whole fused chain at the pool size — measured 32-CPU flagship
    collapse to ~1 actor; keep small fixed pools or task mode."""
    import ray
    if concurrency is None:
        fn = PIPJoin(packed=index.pack(), attrs=attrs, how=how,
                     lon_col=lon_col, lat_col=lat_col, out_col=out_col)
        return points_ds.map_batches(fn, batch_format="pyarrow",
                                     batch_size=batch_size)
    ref = ray.put(index.pack())
    return points_ds.map_batches(
        PIPJoin, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1,
        fn_constructor_kwargs={"index_ref": ref, "attrs": attrs,
                               "how": how, "lon_col": lon_col,
                               "lat_col": lat_col, "out_col": out_col})


# ---------------------------------------------------------------------------
# S2-cover shuffle join — the LARGE-polygon-layer path (north star:
# "joined/tiled against polygon layers via H3/S2 cell covers")

def cover_join(points_ds, polys_ds, level=10, poly_id_col="poly_id",
               lon_col="lon", lat_col="lat", num_buckets=32):
    """Point→polygon spatial join with NOTHING broadcast: both sides
    shuffle, so it scales when the polygon layer itself is too large
    for the packed-index broadcast of ``spatial_join``.

    1. polygon side → conservative mixed-level S2 covers per feature
       (``s2.polygon_cover``); cells fully inside the polygon are
       tagged — their candidates skip the exact test entirely.
    2. point side → leaf cell id, then one narrow ancestor emit per
       cover level present (levels = tiny driver list; a point meets
       each polygon's disjoint cover in at most one cell, so the join
       needs no pair dedup).
    3. equality bucket-hash join on the cell id (ops/relational
       ``hash_join`` — one shuffle per side).
    4. boundary candidates + polygon rings meet in a poly-id bucket
       shuffle; one vectorized ``points_in_shape`` per (bucket,
       polygon) confirms.  Interior-cell candidates bypass.

    ``polys_ds`` needs (poly_id_col, rings_x, rings_y) — the engine's
    layer schema.  Returns the inner join: every point row once per
    enclosing polygon (boundary counts as inside), point columns +
    ``poly_id_col``.  Multi-match is possible for overlapping
    polygons, matching SQL join semantics rather than the
    first-feature rule of the broadcast ``spatial_join``.
    """
    import pandas as pd

    from .. import s2
    from ..geom.kernels import points_in_shape
    from ..ops.partition import bucket_part
    from ..ops.relational import hash_join

    point_cols = list(points_ds.schema().names)

    def emit_cover(df: pd.DataFrame) -> pd.DataFrame:
        cells, pids, fulls = [], [], []
        for pid, rxs, rys in zip(df[poly_id_col], df["rings_x"],
                                 df["rings_y"]):
            rings = [(np.asarray(rx, np.float64),
                      np.asarray(ry, np.float64))
                     for rx, ry in zip(rxs, rys)]
            ids, interior = s2.polygon_cover(rings, level,
                                             return_interior=True)
            cells.append(ids)
            fulls.append(interior)
            pids.append(np.full(len(ids), pid, dtype=np.int64))
        if not cells:
            return pd.DataFrame({"cell": np.empty(0, np.uint64),
                                 poly_id_col: np.empty(0, np.int64),
                                 "__full": np.empty(0, bool)})
        return pd.DataFrame({"cell": np.concatenate(cells),
                             poly_id_col: np.concatenate(pids),
                             "__full": np.concatenate(fulls)})

    covers = polys_ds.map_batches(emit_cover, batch_format="pandas") \
        .materialize()
    lv = covers.map_batches(
        lambda df: pd.DataFrame({"lv": np.unique(s2.cell_id_level(
            df["cell"].to_numpy(dtype=np.uint64)))}),
        batch_format="pandas").to_pandas()
    levels = sorted(set(int(v) for v in lv["lv"]))

    def expand(df: pd.DataFrame) -> pd.DataFrame:
        leaf = s2.lonlat_to_cell_id(
            df[lon_col].to_numpy(dtype=np.float64),
            df[lat_col].to_numpy(dtype=np.float64), s2.MAX_LEVEL)
        outs = []
        for L in levels:
            d = df.copy()
            d["cell"] = s2.parent(leaf, L)
            outs.append(d)
        if not outs:
            d = df.iloc[:0].copy()
            d["cell"] = np.empty(0, np.uint64)
            return d
        return pd.concat(outs, ignore_index=True)

    pts = points_ds.map_batches(expand, batch_format="pandas")
    cand = hash_join(pts, covers, on="cell", how="inner",
                     num_buckets=num_buckets).materialize()

    out_cols = point_cols + [poly_id_col]

    def _full_mask(df):
        # the join's union pad can degrade bool to object/int
        return df["__full"].astype(bool).to_numpy()

    passed = cand.map_batches(
        lambda df: df[_full_mask(df)][out_cols], batch_format="pandas")

    def tag_cand(df: pd.DataFrame) -> pd.DataFrame:
        df = df[~_full_mask(df)][out_cols].copy()
        df["__side"] = np.int8(0)
        df["__part"] = bucket_part(df[poly_id_col].to_numpy(),
                                   num_buckets)
        return df

    def tag_poly(df: pd.DataFrame) -> pd.DataFrame:
        df = df[[poly_id_col, "rings_x", "rings_y"]].copy()
        df["__side"] = np.int8(1)
        df["__part"] = bucket_part(df[poly_id_col].to_numpy(),
                                   num_buckets)
        return df

    u = cand.map_batches(tag_cand, batch_format="pandas").union(
        polys_ds.map_batches(tag_poly, batch_format="pandas"))

    empty_out = {c: np.empty(0) for c in out_cols}

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        # A bucket holding polygons but ZERO candidates can arrive in
        # a sorted block built only from tag_poly rows, whose schema
        # has no point columns at all (union blocks keep per-side
        # schemas until the sort concatenates them) — so the empty
        # output must be constructed explicitly, never sliced from df.
        if len(df) == 0 or "__side" not in df.columns:
            return pd.DataFrame(empty_out)
        cands = df[df["__side"] == 0]
        if len(cands) == 0 or any(c not in df.columns
                                  for c in out_cols):
            return pd.DataFrame(empty_out)
        here = df[df["__side"] == 1]
        rings_by_pid = {
            int(pid): [(np.asarray(rx, np.float64),
                        np.asarray(ry, np.float64))
                       for rx, ry in zip(rxs, rys)]
            for pid, rxs, rys in zip(here[poly_id_col],
                                     here["rings_x"], here["rings_y"])}
        keeps = []
        for pid, grp in cands.groupby(poly_id_col, sort=False):
            inside = points_in_shape(
                grp[lon_col].to_numpy(dtype=np.float64),
                grp[lat_col].to_numpy(dtype=np.float64),
                rings_by_pid[int(pid)])
            keeps.append(grp[inside])
        if not keeps:
            return cands.iloc[:0][out_cols]
        return pd.concat(keeps, ignore_index=True)[out_cols]

    confirmed = u.groupby("__part").map_groups(
        verify, batch_format="pandas")

    # the verify-side union pad degrades point dtypes (int -> float);
    # restore the input schema on the way out
    schema = points_ds.schema()
    dtypes = {}
    for name, typ in zip(schema.names, schema.types):
        try:
            dtypes[name] = np.dtype(typ.to_pandas_dtype())
        except (TypeError, NotImplementedError):
            pass
    dtypes.setdefault(poly_id_col, np.dtype(np.int64))

    def restore(df: pd.DataFrame) -> pd.DataFrame:
        for c, dt in dtypes.items():
            if c in df.columns and df[c].dtype != dt:
                df[c] = df[c].astype(dt)
        return df

    return passed.union(confirmed).map_batches(
        restore, batch_format="pandas")
