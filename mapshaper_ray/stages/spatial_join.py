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
