"""-simplify over a layer Dataset — the user-facing mapshaper flow
(`-i in.json -simplify 50% -o out.json`).

Semantics (reference api.simplify, src/simplify/mapshaper-simplify.js:
10-89): build shared-arc topology so adjacent features' common borders
are ONE arc simplified once (no gaps/slivers between neighbors), compute
per-vertex thresholds (VW default / DP), resolve the retained-percentage
threshold with the exact global rank (src/paths/mapshaper-arcs.js:
528-558), filter vertices, optionally protect shapes from collapse
(keep-shapes), reassemble features.

Ray shape: per-arc thresholding is an embarrassingly parallel
``map_batches`` over an arcs Dataset; topology build + reassembly run
driver-side at fixture scale and per spatial cell at 100 TB scale
(SURVEY.md §2.6 buildTopology row)."""

from __future__ import annotations

import numpy as np
import pandas as pd

import os

from ..geom.keep_shapes import protect_shapes
from ..geom.simplify import (dp_thresholds, removable_thresholds,
                             threshold_by_pct, visvalingam_thresholds)
from ..topo.arcs import ArcTable
from ..topo.build import build_topology

# simplify-specific auto-distribute threshold.  Unlike dissolve/clip
# (crossover ~AUTO_DISTRIBUTE_ROWS=5k), the distributed simplify
# pipeline carries two extra full-topology exchanges (arc tables +
# distributed rank) whose fixed cost the local kernel only amortizes
# around ~64k features (measured: 10k features local 15.9s vs
# distributed 17.4s; crossover ≈ 90k at round-3 constants).  Above
# this the local kernel's driver-side topology build is the
# bottleneck AND a 100-TB non-starter, so distributed wins on both
# axes.  Env-overridable so tests exercise both paths cheaply.
SIMPLIFY_AUTO_ROWS = int(os.environ.get(
    "MAPSHAPER_RAY_SIMPLIFY_AUTO_ROWS", "64000"))

# attribute-rejoin gate: under this row count the attr table ships
# once via ray.put (the bucketed join's sort exchange costs ~4s fixed
# at 10k rows); above it the bucketed path runs
ATTR_BROADCAST_ROWS = int(os.environ.get(
    "MAPSHAPER_RAY_ATTR_BROADCAST_ROWS", "2000000"))


def _layer_features(df: pd.DataFrame, xcol="rings_x", ycol="rings_y"):
    """Layer-model rows → list of path-array lists (+ ring_poly
    passthrough for reassembly)."""
    feats = []
    for row in df.to_dict("records"):
        rx = row[xcol] if row[xcol] is not None else []
        ry = row[ycol] if row[ycol] is not None else []
        feats.append([np.stack([np.asarray(x, float), np.asarray(y, float)],
                               axis=1) for x, y in zip(rx, ry)] or None)
    return feats


def calc_planar_interval(xres, yres, width, height):
    """resolution=AxB → retained interval (reference
    calcPlanarInterval, src/simplify/mapshaper-simplify.js:186-189:
    fit the dimension with the higher content/resolution ratio).
    A zero resolution on either axis fits the other axis (guard BEFORE
    the ratio division)."""
    fit_width = yres == 0 or \
        (xres != 0 and width / height > xres / yres)
    return width / xres if fit_width else height / yres


def simplify_layer(ds, pct: float | None = None,
                   method: str = "visvalingam",
                   keep_shapes: bool = True,
                   spherical: bool | None = None,
                   weighting: float | None = None,
                   interval: float | None = None,
                   resolution: str | None = None,
                   repair: bool = False):
    """Polygon or polyline layer Dataset → simplified layer Dataset
    (same schema).

    Exactly one of ``pct`` (retained fraction of removable vertices,
    reference percentage parameterization), ``interval`` (retained
    threshold directly), or ``resolution`` ('AxB' display cells →
    interval via calcPlanarInterval) selects the simplification
    amount.  ``spherical=True`` computes thresholds on the unit sphere
    (reference default for lat-lon data); ``weighting`` applies the
    weighted-VW (-cos*k + 1) metric (reference default 0.7)."""
    import ray.data as rd

    from ..geom.simplify import spherical_thresholds
    from ..sources.layers import geom_type_of
    gt = geom_type_of(ds.schema().names)

    # auto-route big polygon layers to the end-to-end distributed
    # pipeline (two-shuffle topology, no driver materialization); the
    # in-process kernel below stays the small-layer fast path and the
    # only home of repair= / interval= / resolution= (those need the
    # global arc view / display transform)
    from .overlay import layer_bbox
    if (gt == "polygon" and pct is not None and not repair
            and interval is None and resolution is None
            and ds.count() >= SIMPLIFY_AUTO_ROWS):
        if spherical is None:
            bb = layer_bbox(ds)
            spherical = (np.isfinite(bb).all() and bb[0] >= -181
                         and bb[2] <= 181 and bb[1] >= -91
                         and bb[3] <= 91)
        return simplify_layer_distributed(
            ds, pct=pct, method=method, weighting=weighting,
            keep_shapes=keep_shapes, spherical=bool(spherical))

    df = ds.to_pandas().sort_values("feature_id").reset_index(drop=True)
    gt = geom_type_of(list(df.columns))
    if gt == "polyline":
        xcol, ycol = "part_x", "part_y"
        keep_shapes = False  # protectShapes is polygon-only
    else:
        xcol, ycol = "rings_x", "rings_y"
    feats = _layer_features(df, xcol, ycol)
    arcs, shapes = build_topology(feats, closed=(gt != "polyline"))

    if spherical is None:
        # reference default: spherical when the data looks like
        # decimal degrees (useSphericalSimplify + probablyDecimal-
        # DegreeBounds, world bounds padded by 1 degree of excess)
        spherical = bool(len(arcs.xx)) and \
            arcs.xx.min() >= -181 and arcs.xx.max() <= 181 and \
            arcs.yy.min() >= -91 and arcs.yy.max() <= 91

    # per-arc thresholds: distributed map over the arcs table
    items = []
    for a in range(len(arcs.nn)):
        i0 = int(arcs.ii[a])
        n = int(arcs.nn[a])
        items.append({"arc_id": a,
                      "x": arcs.xx[i0:i0 + n].tolist(),
                      "y": arcs.yy[i0:i0 + n].tolist()})

    if spherical:
        def fn(x, y):
            return spherical_thresholds(
                x, y, method="dp" if method == "dp" else "visvalingam",
                weighting=weighting)
    elif method == "dp":
        fn = dp_thresholds
    else:
        def fn(x, y):
            return visvalingam_thresholds(x, y, weighting=weighting)

    def thresh(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["z"] = [fn(np.asarray(x), np.asarray(y)).tolist()
                  for x, y in zip(b["x"], b["y"])]
        return b

    zdf = rd.from_items(items).map_batches(thresh, batch_format="pandas") \
            .to_pandas().sort_values("arc_id")
    zz = {int(r["arc_id"]): np.asarray(r["z"], dtype=np.float64)
          for r in zdf.to_dict("records")}

    # simplification amount → retained interval
    if interval is not None:
        zlimit = float(interval)
    elif resolution is not None:
        xres, yres = (float(v) for v in str(resolution).split("x"))
        w = float(arcs.xx.max() - arcs.xx.min())
        h = float(arcs.yy.max() - arcs.yy.min())
        if spherical:
            # convertSimplifyResolution spherical branch: content width
            # is the parallel arc through the bbox center, in meters
            from ..geom.kernels import D2R, R
            cy = (float(arcs.yy.min()) + float(arcs.yy.max())) / 2.0
            w = w * D2R * R * np.cos(cy * D2R)
            h = h * D2R * R
        # reference scales the interval to DOUBLE the resolution
        # (convertSimplifyResolution: interval *= 0.5)
        zlimit = calc_planar_interval(xres, yres, w, h) * 0.5
    else:
        if pct is None:
            raise ValueError("need pct=, interval= or resolution=")
        # exact global pct → interval over removable thresholds
        removable = np.concatenate([removable_thresholds(z)
                                    for z in zz.values()]) \
            if zz else np.empty(0)
        zlimit = threshold_by_pct(removable, pct) if len(removable) \
            else 0.0

    if keep_shapes:
        shape_rings = []
        for shape in shapes:
            rings = []
            if shape:
                for part in shape:
                    xs, ys, zs = [], [], []
                    for sid in part:
                        aid = ~sid if sid < 0 else sid
                        i0 = int(arcs.ii[aid])
                        n = int(arcs.nn[aid])
                        ax = arcs.xx[i0:i0 + n]
                        ay = arcs.yy[i0:i0 + n]
                        az = zz[aid]
                        if sid < 0:  # traverse reversed arcs reversed
                            ax, ay, az = ax[::-1], ay[::-1], az[::-1]
                        xs.append(ax)
                        ys.append(ay)
                        zs.append(az)
                    rings.append({
                        "x": np.concatenate(xs),
                        "y": np.concatenate(ys),
                        "z": np.concatenate(zs),
                        "_parts": (part, [len(v) for v in zs])})
            shape_rings.append(rings)
        protect_shapes(shape_rings)
        # write locked z back into the arc store
        for rings in shape_rings:
            for r in rings:
                part, lens = r["_parts"]
                off = 0
                for sid, ln in zip(part, lens):
                    aid = ~sid if sid < 0 else sid
                    seg = np.asarray(r["z"][off:off + ln])
                    if sid < 0:  # stored z is forward order; un-reverse
                        seg = seg[::-1]
                    zz[aid] = np.maximum(zz[aid], seg)
                    off += ln

    if repair and zlimit > 0:
        # reference default: roll back simplification along segments
        # that newly intersect (postSimplifyRepair; -simplify no-repair
        # disables) — global across arcs, exact port
        from ..geom.keep_shapes import post_simplify_repair
        post_simplify_repair(arcs.nn, arcs.xx, arcs.yy, zz, zlimit)

    # filter arcs at zlimit and reassemble features
    def arc_coords(sid):
        aid = ~sid if sid < 0 else sid
        i0 = int(arcs.ii[aid])
        n = int(arcs.nn[aid])
        m = zz[aid] >= zlimit
        m[0] = m[-1] = True  # endpoints always retained
        x = arcs.xx[i0:i0 + n][m]
        y = arcs.yy[i0:i0 + n][m]
        if sid < 0:
            x, y = x[::-1], y[::-1]
        return x, y

    out_rx, out_ry, out_rp = [], [], []
    for fi, shape in enumerate(shapes):
        rx_row, ry_row = [], []
        if gt != "polyline" and df.iloc[fi]["ring_poly"] is not None:
            rp_row = list(df.iloc[fi]["ring_poly"])
        else:
            rp_row = []
        if shape:
            for part in shape:
                xs, ys = [], []
                for k, sid in enumerate(part):
                    x, y = arc_coords(sid)
                    if k:
                        x, y = x[1:], y[1:]
                    xs.append(x)
                    ys.append(y)
                x = np.concatenate(xs)
                y = np.concatenate(ys)
                rx_row.append(x.tolist())
                ry_row.append(y.tolist())
        out_rx.append(rx_row)
        out_ry.append(ry_row)
        out_rp.append(rp_row[:len(rx_row)] or [0] * len(rx_row))
    out = df.copy()
    out[xcol] = out_rx
    out[ycol] = out_ry
    if gt != "polyline":
        out["ring_poly"] = out_rp
    return rd.from_pandas(out)


def _with_part(ds_or_stage, key: str, n_parts: int = 64):
    """Add a coarse bucket-hash partition column for the given int key
    — the repo's standard replacement for per-key map_groups (one Ray
    task per bucket instead of one per key; measured 8x in dedup)."""
    from ..ops.partition import bucket_part

    def add(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__part"] = bucket_part(df[key].to_numpy(), n_parts)
        return df
    return ds_or_stage.map_batches(add, batch_format="pandas")


def simplify_layer_distributed(ds, pct: float, method: str = "visvalingam",
                               weighting: float | None = None,
                               keep_shapes: bool = False,
                               spherical: bool = False,
                               _pin_blocks: bool | None = None):
    """END-TO-END distributed -simplify over a polygon layer Dataset:

      rings explode to per-path rows → two-shuffle shared-arc topology
      (topo/build_distributed.py: vertex-key groupby finds junctions,
      arc-key groupby dedupes twins) → per-arc VW/DP thresholds in
      map_batches → distributed exact pct→interval rank (ops/rank.py)
      → arcs filter at the interval → shapes reassemble by joining
      their signed arc sequences against the filtered arcs (groupby
      feature) — no full-layer driver materialization at any stage
      (the topology build's junction set / arc-id map are O(borders)).

    ``keep_shapes=True`` adds a distributed protect pass: full arc
    z/coords ship to their features (one groupby), protect_shapes locks
    thresholds on each feature's largest ring, and the sparse z locks
    merge back per arc with a max-combine (second groupby) before the
    filter."""
    import ray
    import ray.data as rd

    from ..geom.simplify import removable_thresholds
    from ..ops.rank import threshold_by_pct_ds
    from ..sources.layers import nz
    from ..topo.build_distributed import build_topology_ds_tables

    # rings → per-path rows
    def to_paths(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for fid, rx, ry in zip(df["feature_id"].to_numpy(),
                               df["rings_x"].to_numpy(),
                               df["rings_y"].to_numpy()):
            for pi, (x, y) in enumerate(zip(nz(rx), nz(ry))):
                rows.append({"feature_id": int(fid), "part_id": pi,
                             "x": list(map(float, x)),
                             "y": list(map(float, y))})
        return pd.DataFrame(rows)
    # exchange cost scales with block count (Ray's sort emits one
    # output block per input block, so every one of this pipeline's
    # five exchanges inherits the input's block count).  A small
    # layer arriving in many tiny blocks pays per-task overhead on
    # each: measured at 10k features, 65 input blocks ran 16-20s vs
    # ~12s pinned to ~CPU blocks.  Count-gated so a 100-TB layer
    # keeps its natural block count; pinned BEFORE the path explode
    # so every stage inherits the pinned count.
    if _pin_blocks is None:
        _pin_blocks = ds.count() <= 1_000_000
    if _pin_blocks:
        ncpu = int(ray.cluster_resources().get("CPU", 8))
        ds = ds.repartition(max(16, min(ncpu, 64)))
    paths = ds.map_batches(to_paths, batch_format="pandas")

    # Dataset-native topology: arc coords and feature refs never touch
    # the driver (build_topology_ds_tables; the driver sees a P-row
    # bucket-count table and the O(junctions) key set only)
    arcs_ds, ref_rows = build_topology_ds_tables(paths, closed=True,
                                                  assign_ids=False)
    if spherical:
        from ..geom.simplify import spherical_thresholds

        def fn(x, y):
            return spherical_thresholds(x, y, method=method,
                                        weighting=weighting)
    elif method == "dp":
        fn = dp_thresholds
    else:
        def fn(x, y):
            return visvalingam_thresholds(x, y, weighting=weighting)

    def thresh(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["z"] = [fn(np.asarray(x, dtype=np.float64),
                      np.asarray(y, dtype=np.float64))
                   for x, y in zip(df["x"], df["y"])]
        return df
    with_z = arcs_ds.map_batches(
        thresh, batch_format="pandas").materialize()

    flat_z = with_z.map_batches(
        lambda df: pd.DataFrame(
            {"z": np.concatenate([removable_thresholds(z)
                                  for z in df["z"]])
             if len(df) else np.empty(0)}),
        batch_format="pandas")
    zlimit = threshold_by_pct_ds(flat_z, "z", pct)

    if keep_shapes:
        # distributed protect pass: full z/coords per arc ship to the
        # features using them; per feature, protect the largest ring
        # (geom/keep_shapes.protect_shapes); sparse z locks merge back
        # per arc with a max-combine
        def full_src(df: pd.DataFrame) -> pd.DataFrame:
            # store LISTS: same-length ndarray columns trip Ray's
            # pandas TensorArray concat
            return pd.DataFrame({
                "arc_key": df["arc_key"].to_numpy(),
                "__part": df["__part"].to_numpy(),
                "fx": [np.asarray(x).tolist() for x in df["x"]],
                "fy": [np.asarray(y).tolist() for y in df["y"]],
                "fz": [np.asarray(z).tolist() for z in df["z"]],
                "feature_id": -1, "part_id": -1, "seq": -1,
                "rev": False})
        # both streams already carry the arc-key bucket column
        both = ref_rows.union(with_z.map_batches(
            full_src, batch_format="pandas"))

        # ONE in-partition merge distributes each arc's full coords/z
        # to its uses (no per-arc map_groups tasks)
        def dist_full(df: pd.DataFrame) -> pd.DataFrame:
            src = df[df["feature_id"] == -1][["arc_key", "fx", "fy",
                                              "fz"]]
            uses = df[df["feature_id"] >= 0][["feature_id", "part_id",
                                              "seq", "rev", "arc_key"]]
            if len(src) == 0 or len(uses) == 0:
                return pd.DataFrame()
            return uses.merge(src, on="arc_key")
        per_feat_rows = both.groupby("__part").map_groups(
            dist_full, batch_format="pandas")

        def protect_feature(df: pd.DataFrame) -> pd.DataFrame:
            from ..geom.keep_shapes import protect_shapes
            rings = []
            for pid, part in df.groupby("part_id"):
                part = part.sort_values("seq")
                xs, ys, zs, meta = [], [], [], []
                for r in part.to_dict("records"):
                    x = np.asarray(r["fx"], dtype=np.float64)
                    y = np.asarray(r["fy"], dtype=np.float64)
                    z = np.asarray(r["fz"], dtype=np.float64)
                    if r["rev"]:
                        x, y, z = x[::-1], y[::-1], z[::-1]
                    xs.append(x)
                    ys.append(y)
                    zs.append(z)
                    meta.append((r["arc_key"], bool(r["rev"]),
                                 len(z)))
                rings.append({"x": np.concatenate(xs),
                              "y": np.concatenate(ys),
                              "z": np.concatenate(zs),
                              "_meta": meta})
            protect_shapes([rings])
            rows = []
            for ring in rings:
                off = 0
                for aid, rev, ln in ring["_meta"]:
                    seg = np.asarray(ring["z"][off:off + ln])
                    if rev:
                        seg = seg[::-1]  # back to forward arc order
                    if np.isinf(seg).any():
                        rows.append({"arc_key": aid,
                                     "zlock": seg.tolist()})
                    off += ln
            return pd.DataFrame(rows) if rows else pd.DataFrame(
                {"arc_key": pd.Series([], dtype="object"),
                 "zlock": pd.Series([], dtype="object")})
        def part_protect(df: pd.DataFrame) -> pd.DataFrame:
            outs = [protect_feature(g)
                    for _, g in df.groupby("feature_id")]
            return pd.concat(outs, ignore_index=True) if outs \
                else protect_feature(df.head(0))
        locks = _with_part(per_feat_rows, "feature_id") \
            .groupby("__part").map_groups(
                part_protect, batch_format="pandas").to_pandas()
        if len(locks):
            # max-combine sparse locks into the arc z store (lock tables
            # are O(protected features) — safe to broadcast)
            lock_map: dict = {}
            for aid, zl in zip(locks["arc_key"], locks["zlock"]):
                z = np.asarray(zl, dtype=np.float64)
                cur = lock_map.get(aid)
                lock_map[aid] = z if cur is None \
                    else np.maximum(cur, z)
            lock_ref = ray.put(lock_map)

            def apply_locks(df: pd.DataFrame) -> pd.DataFrame:
                lm = ray.get(lock_ref)
                df = df.copy()
                df["z"] = [np.maximum(np.asarray(z), lm[a])
                           if a in lm else z
                           for a, z in zip(df["arc_key"], df["z"])]
                return df
            with_z = with_z.map_batches(apply_locks,
                                        batch_format="pandas")

    # filtered arc coords, broadcast-free reassembly: explode shape
    # rows to (feature, part, seq, arc_id), join against filtered arcs
    # by arc id, regroup per feature
    def filt(df: pd.DataFrame) -> pd.DataFrame:
        xs, ys = [], []
        for x, y, z in zip(df["x"], df["y"], df["z"]):
            m = np.asarray(z) >= zlimit
            m[0] = m[-1] = True
            xs.append(np.asarray(x)[m].tolist())
            ys.append(np.asarray(y)[m].tolist())
        return pd.DataFrame({"arc_key": df["arc_key"].to_numpy(),
                             "__part": df["__part"].to_numpy(),
                             "fx": xs, "fy": ys})
    filtered = with_z.map_batches(filt, batch_format="pandas")

    # both streams already carry the arc-key bucket column — ONE
    # exchange attaches filtered coords to every use
    joined = ref_rows.union(filtered.map_batches(
        lambda df: df.assign(feature_id=-1, part_id=-1, seq=-1,
                             rev=False),
        batch_format="pandas"))

    # in-partition merge: filtered arc coords ship to every use in one
    # vectorized join per bucket (no per-arc map_groups tasks)
    def per_arc_group(df: pd.DataFrame) -> pd.DataFrame:
        src = df[df["feature_id"] == -1][["arc_key", "fx", "fy"]]
        uses = df[df["feature_id"] >= 0][["feature_id", "part_id",
                                          "seq", "rev", "arc_key"]]
        if len(src) == 0 or len(uses) == 0:
            return pd.DataFrame()
        return uses.merge(src, on="arc_key")
    dist = joined.groupby("__part").map_groups(per_arc_group,
                                               batch_format="pandas")

    def assemble(df: pd.DataFrame) -> pd.DataFrame:
        from .overlay import _rings_to_row
        fid = int(df["feature_id"].iloc[0])
        rings = []
        for pid, part in df.groupby("part_id"):
            part = part.sort_values("seq")
            xs, ys = [], []
            for k, r in enumerate(part.to_dict("records")):
                x = np.asarray(r["fx"], dtype=np.float64)
                y = np.asarray(r["fy"], dtype=np.float64)
                if r["rev"]:
                    x, y = x[::-1], y[::-1]
                if k:
                    x, y = x[1:], y[1:]
                xs.append(x)
                ys.append(y)
            rings.append((np.concatenate(xs), np.concatenate(ys)))
        # winding/containment-based nesting (MultiPolygon holes keep
        # their polygon membership)
        gx, gy, gp = _rings_to_row(rings)
        return pd.DataFrame([{"feature_id": fid, "rings_x": gx,
                              "rings_y": gy, "ring_poly": gp}])

    def part_assemble(df: pd.DataFrame) -> pd.DataFrame:
        return pd.concat([assemble(g)
                          for _, g in df.groupby("feature_id")],
                         ignore_index=True)
    assembled = _with_part(dist, "feature_id").groupby("__part") \
        .map_groups(part_assemble, batch_format="pandas")

    # rejoin the original attribute columns (the layer-schema contract:
    # geometry commands preserve the data table) — bucketed hash join,
    # no driver materialization of either side
    geom_cols = {"rings_x", "rings_y", "ring_poly"}
    attr_cols = [c for c in ds.schema().names if c not in geom_cols]
    if attr_cols != ["feature_id"]:
        attrs = ds.map_batches(
            lambda df: df[[c for c in attr_cols]],
            batch_format="pandas")
        # count-gated: an attribute table under the cap broadcasts
        # (the bucketed exchange costs ~4s of fixed sort overhead at
        # 10k rows); a 100-TB layer's attrs exceed the cap and take
        # the bucketed path
        if ds.count() <= ATTR_BROADCAST_ROWS:
            from ..ops.relational import broadcast_join
            return broadcast_join(assembled, attrs.to_pandas(),
                                  on="feature_id", how="inner")
        from ..ops.relational import hash_join
        return hash_join(assembled, attrs, on="feature_id", how="inner")
    return assembled
