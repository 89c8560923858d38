"""Layer-level -dissolve, -clip, -erase over the Arrow layer model —
the user-facing counterparts of topo/dissolve.py and topo/mosaic.py.

- ``dissolve_layer``: group features by a key field; shared borders
  between same-group neighbors melt away (arc cancellation,
  src/commands/mapshaper-dissolve.js:14 + polygon alg
  src/dissolve/mapshaper-polygon-dissolve.js:3-218); attribute columns
  aggregate per §2.5 (sum_fields / copy_fields-first).
- ``clip_layer`` / ``erase_layer``: general polygon×polygon boolean via
  the mosaic substrate (reference clip pipeline: merge datasets → cuts →
  mosaic-equivalent route walk, src/commands/mapshaper-clip-erase.js:
  39-93): build the arrangement of target ∪ clip rings, keep tiles
  whose interior is inside a target feature AND inside (clip) / outside
  (erase) the clip layer, regroup tiles per target feature, dissolve
  each feature's tile set back into rings.

Ray shape (the distributed substrate, used by default):

- ``dissolve_layer(cell=...)``: features are PRE-CUT at the lines of a
  spatial cell grid (``precut_by_cells`` — enforcing the locality
  assumption instead of assuming it), shuffled by cell id, dissolved
  per (cell, key) in ``map_groups`` (interior borders cancel locally),
  then a second ``groupby(key)`` dissolve of the per-cell piece
  outlines cancels the shared cell-border arcs by construction
  (SURVEY.md §7.4).  The second stage sees only boundary geometry —
  O(perimeter), not O(area).  Attribute aggregation runs as a separate
  distributive ``groupby_agg`` over the ORIGINAL features (a feature
  split across cells must not double count).
- ``clip_layer`` / ``erase_layer``: each target feature's clip result
  is independent of other targets, so the default path broadcasts the
  (small) clip layer once via ``ray.put`` and runs the mosaic kernel
  per map_batches task; ``cell=`` switches to the cell-shuffle path
  (both sides pre-cut) for a large clip side, regrouping pieces per
  feature with a border-cancelling dissolve.

Distributed outputs equal the single-pass kernels' geometry up to extra
COLLINEAR vertices where rings cross cell lines (the cut vertices stay
after the border arcs cancel); area/perimeter/ring membership are
identical — tests compare those invariants.
"""

from __future__ import annotations

import math
import os

import numpy as np
import pandas as pd

from ..geom.kernels import planar_ring_area
from ..topo.build import build_topology
from ..topo.dissolve import dissolve_shapes

# Row-count threshold above which the layer ops route to the
# distributed cell substrate BY DEFAULT (cell="auto").  Below it the
# single-pass driver kernel is the fast path (topology build on a few
# thousand features beats two shuffles).  Env-overridable so tests can
# exercise both paths cheaply.
AUTO_DISTRIBUTE_ROWS = int(os.environ.get("MAPSHAPER_RAY_AUTO_ROWS",
                                          "5000"))
_ROWS_PER_CELL = 512  # target features per grid cell for auto sizing


def auto_cell_size(ds, bbox=None, n=None):
    """Pick a distributed-substrate cell size for a polygon layer.

    Returns ``(cell, bbox)`` — ``cell=None`` below the row threshold
    (the local kernel is the small-layer fast path) or for a degenerate
    bbox; otherwise a square-cell edge length sized so the grid holds
    ~``n / _ROWS_PER_CELL`` cells (clamped to [16, 16384]): enough
    parallelism to spread the per-cell kernels without shattering
    features across thousands of near-empty cells."""
    if n is None:
        n = ds.count()
    if n < AUTO_DISTRIBUTE_ROWS:
        return None, bbox
    if bbox is None:
        bbox = layer_bbox(ds)
    w = bbox[2] - bbox[0]
    h = bbox[3] - bbox[1]
    span = max(w, h)
    if not span > 0 or not np.isfinite(span):
        return None, bbox  # all features stacked on one point/line
    ncells = min(max(n / _ROWS_PER_CELL, 16.0), 16384.0)
    area = (w if w > 0 else span) * (h if h > 0 else span)
    return math.sqrt(area / ncells), bbox


def _rows_to_features(df: pd.DataFrame):
    # column-array zip, NOT iterrows: pandas Series construction per row
    # costs more than the whole topology build at 10k features
    feats = []
    for rx, ry in zip(df["rings_x"].to_numpy(),
                      df["rings_y"].to_numpy()):
        if rx is None:
            feats.append(None)
            continue
        feats.append([np.stack([np.asarray(x, float),
                                np.asarray(y, float)], axis=1)
                      for x, y in zip(rx, ry)] or None)
    return feats


def _rewound_features(df: pd.DataFrame):
    """Like _rows_to_features, but rings are REWOUND to the reference
    convention (outer rings positive area, holes negative) using the
    row's ring_poly grouping — the pathfinder clip kernel
    (topo/refclip.py) depends on reference winding, while our layer
    model is otherwise winding-agnostic."""
    from ..geom.kernels import planar_ring_area
    feats = []
    rp_col = df["ring_poly"].to_numpy() if "ring_poly" in df.columns \
        else [None] * len(df)
    for rx, ry, rp in zip(df["rings_x"].to_numpy(),
                          df["rings_y"].to_numpy(), rp_col):
        if rx is None:
            feats.append(None)
            continue
        rp = list(rp) if rp is not None else list(range(len(rx)))
        rings = []
        seen_poly: set = set()
        for x, y, p in zip(rx, ry, rp):
            x = np.asarray(x, float)
            y = np.asarray(y, float)
            is_hole = p in seen_poly
            seen_poly.add(p)
            area = planar_ring_area(x, y)
            if (is_hole and area > 0) or (not is_hole and area < 0):
                x, y = x[::-1], y[::-1]
            rings.append(np.stack([x, y], axis=1))
        feats.append(rings or None)
    return feats


def _rings_to_row(rings):
    """list of (x, y) → layer-model ring columns.  Polygon nesting by
    CONTAINMENT, not emission order (ring stitching emits rings in
    survivor order — a hole can precede its outer): each hole-wound
    (kernel-negative-area) ring attaches to the SMALLEST outer strictly
    containing one of its vertices; rings of one polygon stay
    contiguous, outer first (the layer-model contract)."""
    from ..geom.kernels import points_in_ring
    arr = [(np.asarray(x, dtype=np.float64),
            np.asarray(y, dtype=np.float64)) for x, y in rings]
    areas = [planar_ring_area(x, y) for x, y in arr]
    outers = [i for i, a in enumerate(areas) if a >= 0]
    holes = [i for i, a in enumerate(areas) if a < 0]
    if not outers:  # degenerate: everything hole-wound
        outers, holes = list(range(len(arr))), []
    owner: dict[int, int | None] = {}
    for h in holes:
        hx, hy = arr[h]
        best, best_a = None, np.inf
        for o in outers:
            if abs(areas[o]) <= abs(areas[h]):
                continue  # container must be strictly bigger
            ox, oy = arr[o]
            # probe hole vertices until one is strictly inside (shared
            # topology vertices can sit ON the outer's boundary)
            for k in range(len(hx) - 1):
                r = points_in_ring(np.array([hx[k]]), np.array([hy[k]]),
                                   ox, oy)[0]
                if r != -1:
                    if r == 1 and abs(areas[o]) < best_a:
                        best, best_a = o, abs(areas[o])
                    break
        owner[h] = best
    rx, ry, rp = [], [], []
    poly = -1
    for o in outers:
        poly += 1
        rx.append(arr[o][0].tolist())
        ry.append(arr[o][1].tolist())
        rp.append(poly)
        for h in holes:
            if owner.get(h) == o:
                rx.append(arr[h][0].tolist())
                ry.append(arr[h][1].tolist())
                rp.append(poly)
    for h in holes:  # un-contained hole-wound rings: standalone
        if owner.get(h) is None:
            poly += 1
            rx.append(arr[h][0].tolist())
            ry.append(arr[h][1].tolist())
            rp.append(poly)
    return rx, ry, rp


def _dissolve_rows(df: pd.DataFrame, key: str):
    """In-process dissolve kernel: rows → {key: ring coord list}."""
    feats = _rows_to_features(df)
    arcs, shapes = build_topology(feats)
    groups = dissolve_shapes(shapes, list(df[key].astype(str)), arcs)
    out = {}
    for k, rings in groups.items():
        out[k] = [arcs.path_coords(r) for r in rings] if rings else []
    return out


def _dissolve_layer_local(ds, key: str | None, sum_fields=(),
                          copy_fields=()):
    """Single-pass driver kernel (fixture scale / per-group unit).
    ``key=None`` dissolves everything into one feature (the reference's
    bare ``-dissolve``).  Polyline layers merge arc chains at degree-2
    nodes (dissolve_polylines); polygon layers melt shared borders."""
    import ray.data as rd

    from ..sources.layers import geom_type_of, nz
    df = ds.to_pandas().sort_values("feature_id").reset_index(drop=True)
    gt = geom_type_of(list(df.columns))
    keys = (df[key].astype(str) if key
            else pd.Series(["_all"] * len(df), index=df.index))

    if gt == "polyline":
        from ..topo.dissolve import dissolve_polylines
        feats = []
        for px, py in zip(df["part_x"].to_numpy(),
                          df["part_y"].to_numpy()):
            feats.append([np.stack([np.asarray(x, float),
                                    np.asarray(y, float)], axis=1)
                          for x, y in zip(nz(px), nz(py))] or None)
        arcs, shapes = build_topology(feats, closed=False)
        groups = dissolve_polylines(shapes, list(keys), arcs)
        rows = []
        for fid, (k, chains) in enumerate(sorted(groups.items())):
            sub = df[keys == k]
            row = {"feature_id": fid}
            if key:
                row[key] = sub[key].iloc[0]
            for f in sum_fields:
                row[f] = sub[f].sum()
            for f in copy_fields:
                row[f] = sub[f].iloc[0]
            coords = [arcs.path_coords(c) for c in (chains or [])]
            row["part_x"] = [list(map(float, x)) for x, _ in coords]
            row["part_y"] = [list(map(float, y)) for _, y in coords]
            rows.append(row)
        return rd.from_items(rows)

    groups = _dissolve_rows(df.assign(__k=keys), "__k")
    rows = []
    for fid, (k, coords) in enumerate(sorted(groups.items())):
        sub = df[keys == k]
        row = {"feature_id": fid}
        if key:
            row[key] = sub[key].iloc[0]
        for f in sum_fields:
            row[f] = sub[f].sum()
        for f in copy_fields:
            row[f] = sub[f].iloc[0]
        row["rings_x"], row["rings_y"], row["ring_poly"] = \
            _rings_to_row(coords) if coords else ([], [], [])
        rows.append(row)
    return rd.from_items(rows)


# ---------------------------------------------------------------------------
# cell pre-cut (the locality enforcer)

def layer_bbox(ds):
    """Distributive bbox aggregate over a polygon layer."""
    from ..sources.layers import nz

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        xs = [v for rx in df["rings_x"] for r in nz(rx) for v in r]
        ys = [v for ry in df["rings_y"] for r in nz(ry) for v in r]
        if not xs:
            return pd.DataFrame({"xmin": [], "ymin": [],
                                 "xmax": [], "ymax": []})
        return pd.DataFrame({"xmin": [min(xs)], "ymin": [min(ys)],
                             "xmax": [max(xs)], "ymax": [max(ys)]})
    p = ds.map_batches(partial, batch_format="pandas").to_pandas()
    return (float(p["xmin"].min()), float(p["ymin"].min()),
            float(p["xmax"].max()), float(p["ymax"].max()))


def precut_by_cells(ds, cell: float, bbox=None):
    """Cut every polygon feature at the lines of a square cell grid:
    one output row per (feature, intersected cell), rings clipped to
    the cell rect with Sutherland–Hodgman.  Adjacent cells compute the
    SAME crossing vertices from the same segment arithmetic, so the cut
    edges cancel exactly in a later dissolve.  Adds a ``__cell`` id
    column (int64)."""
    from ..ops.clip import _sh_clip_ring
    if bbox is None:
        bbox = layer_bbox(ds)
    xmin, ymin = bbox[0], bbox[1]

    from ..sources.layers import clean_export_ring, nz

    def go(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        other_cols = [c for c in df.columns
                      if c not in ("rings_x", "rings_y", "ring_poly")]
        for row_rx, row_ry, row_rp, *others in zip(
                df["rings_x"].to_numpy(), df["rings_y"].to_numpy(),
                df["ring_poly"].to_numpy(),
                *(df[c].to_numpy() for c in other_cols)):
            row = dict(zip(other_cols, others))
            rx = [np.asarray(v, float) for v in nz(row_rx)]
            ry = [np.asarray(v, float) for v in nz(row_ry)]
            rp = list(row_rp) if row_rp is not None else [0] * len(rx)
            if not rx:
                continue
            fxmin = min(v.min() for v in rx)
            fxmax = max(v.max() for v in rx)
            fymin = min(v.min() for v in ry)
            fymax = max(v.max() for v in ry)
            i0 = int(np.floor((fxmin - xmin) / cell))
            i1 = int(np.floor((fxmax - xmin) / cell))
            j0 = int(np.floor((fymin - ymin) / cell))
            j1 = int(np.floor((fymax - ymin) / cell))
            for ci in range(i0, i1 + 1):
                for cj in range(j0, j1 + 1):
                    rect = (xmin + ci * cell, ymin + cj * cell,
                            xmin + (ci + 1) * cell, ymin + (cj + 1) * cell)
                    ox, oy, op = [], [], []
                    for x, y, p in zip(rx, ry, rp):
                        res = _sh_clip_ring(x, y, rect)
                        if res is None:
                            continue
                        # a feature edge exactly ON a cut line clips to
                        # a zero-area sliver (duplicate vertices); drop
                        # it — downstream topology would otherwise see
                        # zero-length arcs whose +/- twins intern to
                        # one id and derail dissolve cancellation
                        res = clean_export_ring(res[0], res[1])
                        if res is None:
                            continue
                        ox.append(res[0].tolist())
                        oy.append(res[1].tolist())
                        op.append(int(p))
                    if ox:
                        out = dict(row)
                        out["rings_x"] = ox
                        out["rings_y"] = oy
                        out["ring_poly"] = op
                        out["__cell"] = ci * 1000003 + cj
                        rows.append(out)
        return pd.DataFrame(rows)
    # modest bundling: generated meshes arrive in many ~150-row blocks
    # and the downstream cell/key sorts pay per-partition overhead per
    # input block (same pathology measured 10x in raster_to_polygons);
    # 256 features per cut task keeps blocks near the CPU count without
    # starving parallelism on big features
    return ds.map_batches(go, batch_format="pandas", batch_size=256)


def _node_axis_edges(feats):
    """Insert every vertex of the piece set into any AXIS-ALIGNED edge
    it lies on (exact equality).  Cell borders are axis-aligned by
    construction, so after noding, both sides of a cut line carry the
    identical vertex subdivision and their border arcs cancel exactly
    in the reassembly dissolve — even when per-cell kernels subdivided
    the border differently."""
    all_pts = set()
    for parts in feats:
        for ring in parts or []:
            for px, py in ring:
                all_pts.add((float(px), float(py)))
    by_x: dict[float, list[float]] = {}
    by_y: dict[float, list[float]] = {}
    for px, py in all_pts:
        by_x.setdefault(px, []).append(py)
        by_y.setdefault(py, []).append(px)
    for k in by_x:
        by_x[k] = sorted(by_x[k])
    for k in by_y:
        by_y[k] = sorted(by_y[k])

    out = []
    for parts in feats:
        new_parts = []
        for ring in parts or []:
            nx, ny = [], []
            n = len(ring)
            for i in range(n - 1):
                x1, y1 = float(ring[i][0]), float(ring[i][1])
                x2, y2 = float(ring[i + 1][0]), float(ring[i + 1][1])
                if x1 == x2 and y1 == y2:
                    # zero-length segment: skip — a consecutive
                    # duplicate vertex would become a zero-length arc
                    # whose forward/reverse byte keys coincide, so a
                    # +/- twin pair interns to ONE signed id and
                    # dissolve cancellation misses it
                    continue
                nx.append(x1)
                ny.append(y1)
                if x1 == x2 and x1 in by_x:
                    lo, hi = (y1, y2) if y1 < y2 else (y2, y1)
                    mids = [v for v in by_x[x1] if lo < v < hi]
                    for v in (mids if y1 < y2 else reversed(mids)):
                        nx.append(x1)
                        ny.append(v)
                elif y1 == y2 and y1 in by_y:
                    lo, hi = (x1, x2) if x1 < x2 else (x2, x1)
                    mids = [v for v in by_y[y1] if lo < v < hi]
                    for v in (mids if x1 < x2 else reversed(mids)):
                        nx.append(v)
                        ny.append(y1)
            nx.append(float(ring[n - 1][0]))
            ny.append(float(ring[n - 1][1]))
            new_parts.append(np.stack([nx, ny], axis=1))
        out.append(new_parts or None)
    return out


def _dissolve_points(ds, key, sum_fields=(), copy_fields=(),
                     weight=None, planar=False):
    """Point-layer ``-dissolve``: one weighted centroid per key group
    (reference src/dissolve/mapshaper-point-dissolve.js:3-61 +
    composeDissolveLayer).  Lon/lat layers (bounds inside the world
    box and not ``planar``) average weighted unit 3-D vectors
    (lngLatToXYZ mean, geom.js:163-179) and convert back; ``weight=``
    is a field name or expression; NaN points and weight <= 0 are
    skipped (reducePointCentroid's ``x==x && weight>0`` guard); a
    group with no usable point keeps its record with null geometry.
    Multi-part points are unsupported, as in the reference.

    Distribution: per-batch partial weighted sums (one row per
    (key, batch)) -> a single pandas reduce over the partial table —
    output-sized, never input-sized."""
    import ray.data as rd

    from ..ops.features import layer_info
    from ..ops.relational import compile_expression
    from ..sources.layers import nz

    use_sph = not planar
    if use_sph:
        bb = layer_info(ds)["bbox"]
        use_sph = (bb[0] >= -181 and bb[1] >= -91 and
                   bb[2] <= 181 and bb[3] <= 91)
    wfn = compile_expression(str(weight)) if weight is not None else None
    sum_fields = list(sum_fields)
    copy_fields = list(copy_fields)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        pts = [np.asarray(nz(v), float) for v in df["px"]]
        if any(len(p) > 1 for p in pts):
            raise ValueError(
                "Dissolving multi-part points is not supported")
        x = np.array([p[0] if len(p) else np.nan for p in pts])
        y = np.array([np.asarray(nz(v), float)[0]
                      if len(nz(v)) else np.nan for v in df["py"]])
        w = (np.asarray(wfn(df), float) if wfn
             else np.ones(len(df)))
        ok = np.isfinite(x) & np.isfinite(y) & (w > 0)
        w = np.where(ok, w, 0.0)
        t = pd.DataFrame({
            "__k": (df[key].astype(object) if key else "_all"),
            "__fid": df["feature_id"].to_numpy(),
            "__w": w})
        if use_sph:
            lam, phi = np.deg2rad(np.where(ok, x, 0.0)), \
                np.deg2rad(np.where(ok, y, 0.0))
            t["__wx"] = w * np.cos(lam) * np.cos(phi)
            t["__wy"] = w * np.sin(lam) * np.cos(phi)
            t["__wz"] = w * np.sin(phi)
        else:
            t["__wx"] = w * np.where(ok, x, 0.0)
            t["__wy"] = w * np.where(ok, y, 0.0)
        for f in sum_fields:
            t[f] = df[f].to_numpy()
        for f in copy_fields:
            t[f] = df[f].to_numpy()
        agg = {"__fid": "min", "__w": "sum", "__wx": "sum",
               "__wy": "sum"}
        if use_sph:
            agg["__wz"] = "sum"
        agg.update({f: "sum" for f in sum_fields})
        g = t.groupby("__k", sort=False, as_index=False)
        out = g.agg(agg)
        if copy_fields:
            # value at the batch-min feature id; the final reduce
            # keeps the row with the GLOBAL min fid per key
            first = t.sort_values("__fid", kind="mergesort") \
                .drop_duplicates("__k")[["__k"] + copy_fields]
            out = out.merge(first, on="__k")
        return out

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    agg = {"__w": "sum", "__wx": "sum", "__wy": "sum"}
    if use_sph:
        agg["__wz"] = "sum"
    agg.update({f: "sum" for f in sum_fields})
    parts = parts.sort_values("__fid", kind="mergesort")
    fin = parts.groupby("__k", sort=False, as_index=False).agg(agg)
    if copy_fields:
        fin = fin.merge(parts.drop_duplicates("__k")[["__k"]
                                                     + copy_fields],
                        on="__k")
    rows = []
    for fid in range(len(fin)):   # output-sized; __-prefixed column
        r = fin.iloc[fid]         # names rule out itertuples
        row = {"feature_id": fid}
        if key:
            row[key] = r["__k"]
        sw = r["__w"]
        if sw > 0:
            cx, cy = r["__wx"] / sw, r["__wy"] / sw
            if use_sph:
                cz = r["__wz"] / sw
                d = np.sqrt(cx * cx + cy * cy + cz * cz)
                lat = np.rad2deg(np.arcsin(cz / d))
                lon = np.rad2deg(np.arctan2(cy / d, cx / d))
                row["px"], row["py"] = [float(lon)], [float(lat)]
            else:
                row["px"], row["py"] = [float(cx)], [float(cy)]
        else:
            row["px"], row["py"] = [], []
        for f in sum_fields + copy_fields:
            row[f] = r[f]
        rows.append(row)
    return rd.from_items(rows)


def dissolve_layer(ds, key: str, sum_fields=(), copy_fields=(),
                   cell="auto", bbox=None, weight=None, planar=False):
    """Polygon layer → one feature per key value with melted borders.

    ``cell="auto"`` (default) auto-selects: polygon layers above
    ``AUTO_DISTRIBUTE_ROWS`` derive a cell size from the layer bbox and
    run the distributed substrate; smaller layers (and polyline /
    data-only layers) take the single-pass kernel.
    ``cell=None`` forces the single-pass kernel; ``cell=<size>`` forces
    the distributed substrate: pre-cut at cell lines → groupby(cell)
    per-cell dissolve → groupby(key) border dissolve (cell-cut arcs
    cancel) → join distributive attribute aggregates computed over the
    ORIGINAL rows."""
    import ray.data as rd
    from ..sources.layers import geom_type_of
    if geom_type_of(ds.schema().names) == "point":
        return _dissolve_points(ds, key, sum_fields, copy_fields,
                                weight=weight, planar=planar)
    if cell == "auto":
        if geom_type_of(ds.schema().names) == "polygon":
            cell, bbox = auto_cell_size(ds, bbox)
        else:
            cell = None  # polyline/data-only: local kernel handles
    if cell is None:
        return _dissolve_layer_local(ds, key, sum_fields, copy_fields)
    if key is None:
        # bare -dissolve with cell=: synthesize a constant key so the
        # distributed path runs (silently falling back to the local
        # driver kernel would defeat the point of cell=)
        ds = ds.map_batches(lambda df: df.assign(__all="_all"),
                            batch_format="pandas")
        out = dissolve_layer(ds, "__all", sum_fields, copy_fields,
                             cell=cell, bbox=bbox)
        return out.map_batches(lambda df: df.drop(columns="__all"),
                               batch_format="pandas")

    pieces = precut_by_cells(ds, cell, bbox=bbox)

    def per_cell(df: pd.DataFrame) -> pd.DataFrame:
        # deterministic across shuffles: group rows arrive in arrival
        # order; sort by the original feature id before topology build
        df = df.sort_values("feature_id").reset_index(drop=True)
        cell_id = int(df["__cell"].iloc[0])
        # keys stringify only INSIDE the kernel; output carries the
        # original value so dtype survives (int keys merge correctly)
        orig = {str(v): v for v in df[key]}
        groups = _dissolve_rows(df, key)
        rows = []
        for k, coords in sorted(groups.items()):
            gx, gy, gp = _rings_to_row(coords) if coords else ([], [], [])
            rows.append({key: orig[k], "__cell": cell_id, "rings_x": gx,
                         "rings_y": gy, "ring_poly": gp})
        return pd.DataFrame(rows)

    cell_outlines = pieces.groupby("__cell").map_groups(
        per_cell, batch_format="pandas")

    def per_key(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("__cell").reset_index(drop=True)
        feats = _node_axis_edges(_rows_to_features(df))
        arcs, shapes = build_topology(feats)
        k = str(df[key].iloc[0])
        rings = dissolve_shapes(shapes, [k] * len(shapes), arcs)[k] or []
        coords = [arcs.path_coords(r) for r in rings]
        gx, gy, gp = _rings_to_row(coords) if coords else ([], [], [])
        return pd.DataFrame([{key: df[key].iloc[0], "rings_x": gx,
                              "rings_y": gy, "ring_poly": gp}])

    melted = cell_outlines.groupby(key).map_groups(
        per_key, batch_format="pandas")

    # distributive attribute aggregation over the ORIGINAL features;
    # copy_fields take the LOWEST-feature_id row (deterministic — a
    # plain 'first' partial depends on block arrival order)
    from ..ops.relational import groupby_agg
    aggs = {f: (f, "sum") for f in sum_fields}
    data = groupby_agg(ds, [key], aggs).to_pandas() if aggs else None
    if copy_fields:
        def cf_partial(df: pd.DataFrame) -> pd.DataFrame:
            return df.sort_values("feature_id").groupby(
                key, sort=False).head(1)[
                [key, "feature_id", *copy_fields]]
        cp = ds.map_batches(cf_partial, batch_format="pandas") \
            .to_pandas().sort_values("feature_id") \
            .groupby(key, sort=False).head(1) \
            .drop(columns="feature_id")
        data = cp if data is None else data.merge(cp, on=key)
    # streaming assembly: the melted GEOMETRY never reaches the driver
    # — only the key COLUMN (for deterministic feature numbering) and
    # the small per-key aggregate table (broadcast merge per batch).
    # materialize() pins the melted blocks in the OBJECT STORE so the
    # key pull + finish pass don't re-execute the dissolve twice.
    import ray
    melted = melted.materialize()
    keys_sorted = sorted(melted.map_batches(
        lambda df: df[[key]], batch_format="pandas").to_pandas()[key])
    id_ref = ray.put({k: i for i, k in enumerate(keys_sorted)})
    data_ref = ray.put(data)
    cols = ["feature_id", key, *sum_fields, *copy_fields,
            "rings_x", "rings_y", "ring_poly"]

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        d = ray.get(data_ref)
        if d is not None:
            df = df.merge(d, on=key, how="left")
        ids = ray.get(id_ref)
        df.insert(0, "feature_id",
                  df[key].map(ids).astype(np.int64))
        return df[cols].sort_values("feature_id")
    return melted.map_batches(finish, batch_format="pandas")


def _overlay(df_target: pd.DataFrame, clip_feats, keep_inside_clip: bool):
    """Per-batch boolean kernel: the reference's flag-guarded pathfinder
    clip (topo/refclip.py clipPolygons port) — robust on defective
    input (partially overlapping collinear borders) where an explicit
    face arrangement is not."""
    from ..topo.refclip import clip_features
    tgt_feats = _rewound_features(df_target)
    out_shapes = clip_features(tgt_feats, [f for f in clip_feats if f],
                               "clip" if keep_inside_clip else "erase")
    rows = []
    for fi, rings in enumerate(out_shapes):
        if not rings:
            continue
        row = {c: df_target.iloc[fi][c] for c in df_target.columns
               if c not in ("rings_x", "rings_y", "ring_poly")}
        row["rings_x"], row["rings_y"], row["ring_poly"] = \
            _rings_to_row(rings)
        rows.append(row)
    return pd.DataFrame(rows)


def _overlay_layer(target_ds, clip_ds, keep_inside_clip: bool,
                   cell, bbox, batch_size: int):
    """Distributed general polygon boolean.

    Default path: each target feature's result depends only on itself
    and the clip layer, so the (small, dissolved-side per reference
    semantics) clip layer is broadcast ONCE via ray.put and the mosaic
    kernel runs inside map_batches over the streaming target —
    ``batch_size`` stays modest because the arrangement cost is
    superlinear in batch footprint.

    ``cell="auto"`` (default): broadcast while the CLIP side is under
    ``AUTO_DISTRIBUTE_ROWS`` rows (the target streams either way — only
    the broadcast side's size matters), else derive a cell from the
    target bbox and take the cell-shuffle path.

    ``cell=<size>``: large-clip-side path — BOTH layers pre-cut at the
    same cell grid, shuffled by cell id, overlaid per cell, and each
    feature's pieces re-dissolved (cut arcs cancel)."""
    import ray
    import ray.data as rd

    if cell == "auto":
        clip_n = clip_ds.count()
        if clip_n < AUTO_DISTRIBUTE_ROWS:
            cell = None
        else:
            if bbox is None:
                bbox = layer_bbox(target_ds)
            cell, bbox = auto_cell_size(target_ds, bbox=bbox, n=clip_n)

    if cell is None:
        # raw clip features broadcast once (reference winding); the
        # kernel dissolves the clip side internally
        clip_feats = _rewound_features(clip_ds.to_pandas())
        ref = ray.put(clip_feats)

        def kernel(df: pd.DataFrame) -> pd.DataFrame:
            return _overlay(df.reset_index(drop=True), ray.get(ref),
                            keep_inside_clip)
        return target_ds.map_batches(kernel, batch_format="pandas",
                                     batch_size=batch_size)

    if bbox is None:
        bbox = layer_bbox(target_ds)

    tgt = precut_by_cells(target_ds, cell, bbox=bbox)
    # clip side: geometry only — union-padding its attribute columns
    # into the target schema would leak spurious null columns through
    geom_only = clip_ds.map_batches(
        lambda df: df[["feature_id", "rings_x", "rings_y",
                       "ring_poly"]].assign(__is_clip=1),
        batch_format="pandas")
    clp = precut_by_cells(geom_only, cell, bbox=bbox)

    def tag_tgt(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(__is_clip=0)
    both = tgt.map_batches(tag_tgt, batch_format="pandas").union(clp)

    def per_cell(df: pd.DataFrame) -> pd.DataFrame:
        t = df[df["__is_clip"] == 0].drop(columns="__is_clip") \
            .sort_values("feature_id").reset_index(drop=True)
        c = df[df["__is_clip"] == 1]
        if len(t) == 0:
            return pd.DataFrame()
        c = c.sort_values("feature_id")
        clip_feats = _rewound_features(c) if len(c) else []
        if keep_inside_clip and not any(clip_feats):
            return pd.DataFrame()
        out = _overlay(t, clip_feats, keep_inside_clip)
        return out
    pieces = both.groupby("__cell").map_groups(per_cell,
                                               batch_format="pandas")

    def per_feature(df: pd.DataFrame) -> pd.DataFrame:
        if "__cell" in df.columns:
            df = df.sort_values("__cell").reset_index(drop=True)
        feats = _rows_to_features(df)
        feats = [f for f in feats if f]
        if not feats:
            return pd.DataFrame()
        feats = _node_axis_edges(feats)
        arcs, shapes = build_topology(feats)
        rings = dissolve_shapes(shapes, ["g"] * len(shapes), arcs)["g"] \
            or []
        coords = [arcs.path_coords(r) for r in rings]
        row = {c: df.iloc[0][c] for c in df.columns
               if c not in ("rings_x", "rings_y", "ring_poly", "__cell")}
        row["rings_x"], row["rings_y"], row["ring_poly"] = \
            _rings_to_row(coords)
        return pd.DataFrame([row])

    return pieces.groupby("feature_id").map_groups(per_feature,
                                                   batch_format="pandas")


def clip_layer(target_ds, clip_ds, cell="auto", bbox=None,
               batch_size: int = 64):
    """-clip: intersect target polygons with the clip layer."""
    return _overlay_layer(target_ds, clip_ds, True, cell, bbox,
                          batch_size)


def erase_layer(target_ds, erase_ds, cell="auto", bbox=None,
                batch_size: int = 64):
    """-erase: subtract the erase layer from target polygons."""
    return _overlay_layer(target_ds, erase_ds, False, cell, bbox,
                          batch_size)


def dissolve2_layer(ds, key: str, cell="auto", bbox=None,
                    gap_max_area: float = 0.0):
    """Overlap/gap-repairing -dissolve2 over a polygon layer Dataset.

    ``cell="auto"`` (default): distributed above AUTO_DISTRIBUTE_ROWS
    (cell derived from the layer bbox), in-process mosaic kernel below.
    ``cell=None``: in-process mosaic kernel over the collected layer.
    ``cell=<size>``: GENERAL-INPUT distributed path — features are
    PRE-CUT at the cell grid lines (enforcing the locality assumption
    that `dissolve2_pipeline` only documents), the mosaic + first-shape
    tile assignment runs per cell in map_groups (pieces ordered by
    original feature_id so the assignment rule matches the global
    order), and a final groupby(key) dissolve cancels the cell-border
    arcs.  Caveat: ``gap_max_area`` applies per cell piece — a gap
    straddling a cell line is judged piecewise."""
    import ray.data as rd

    from ..topo.refclip import dissolve2_features

    if key is None:
        # keyless -dissolve2 merges everything (like bare -dissolve)
        ds = ds.map_batches(lambda df: df.assign(__all="_all"),
                            batch_format="pandas")
        out = dissolve2_layer(ds, "__all", cell=cell, bbox=bbox,
                              gap_max_area=gap_max_area)
        return out.map_batches(lambda df: df.drop(columns="__all"),
                               batch_format="pandas")

    def d2_rows(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("feature_id").reset_index(drop=True)
        orig = {str(v): v for v in df[key]}
        # reference-exact kernel (robust on defective geometry);
        # gap_max_area=0 disables fill like the reference min-gap-area=0
        out = dissolve2_features(_rewound_features(df),
                                 [str(v) for v in df[key]],
                                 min_gap_area=gap_max_area)
        rows = []
        for k, rings in sorted(out.items()):
            gx, gy, gp = _rings_to_row(rings) if rings else ([], [], [])
            rows.append({key: orig[k], "rings_x": gx, "rings_y": gy,
                         "ring_poly": gp})
        return pd.DataFrame(rows)

    if cell == "auto":
        # gap filling is judged per piece on the cell path (caveat
        # below) — keep the exact kernel when a gap threshold is set
        cell, bbox = (None, bbox) if gap_max_area \
            else auto_cell_size(ds, bbox)
    if cell is None:
        df = ds.to_pandas()
        out = d2_rows(df)
        out.insert(0, "feature_id", np.arange(len(out), dtype=np.int64))
        return rd.from_pandas(out)

    pieces = precut_by_cells(ds, cell, bbox=bbox)

    def d2_cell(df: pd.DataFrame) -> pd.DataFrame:
        cell_id = int(df["__cell"].iloc[0])
        out = d2_rows(df.drop(columns="__cell"))
        if len(out):
            out["__cell"] = cell_id
        return out
    per_cell = pieces.groupby("__cell").map_groups(
        d2_cell, batch_format="pandas")

    def per_key(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("__cell").reset_index(drop=True)             .drop(columns="__cell")
        feats = _node_axis_edges(_rows_to_features(df))
        arcs, shapes = build_topology(feats)
        k = str(df[key].iloc[0])
        rings = dissolve_shapes(shapes, [k] * len(shapes), arcs)[k] or []
        coords = [arcs.path_coords(r) for r in rings]
        gx, gy, gp = _rings_to_row(coords) if coords else ([], [], [])
        return pd.DataFrame([{key: df[key].iloc[0], "rings_x": gx,
                              "rings_y": gy, "ring_poly": gp}])

    melted = per_cell.groupby(key).map_groups(per_key,
                                              batch_format="pandas")
    # streaming numbering (geometry stays distributed; only the key
    # column is pulled for the deterministic key→id map).
    # materialize() pins melted blocks in the object store so the key
    # pull + finish pass don't run the dissolve twice.
    import ray
    melted = melted.materialize()
    keys_sorted = sorted(melted.map_batches(
        lambda df: df[[key]], batch_format="pandas").to_pandas()[key])
    id_ref = ray.put({k: i for i, k in enumerate(keys_sorted)})

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        ids = ray.get(id_ref)
        df = df.copy()
        df.insert(0, "feature_id",
                  df[key].map(ids).astype(np.int64))
        return df.sort_values("feature_id")
    return melted.map_batches(finish, batch_format="pandas")
