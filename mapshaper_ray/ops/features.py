"""Per-feature geometry commands over the Arrow layer model
(sources/layers.py) — the -explode / -affine / precision / -points /
-filter-geom / -filter-islands / -filter-slivers / -info family
(SURVEY.md §2.2, §2.6 filter rows).  All are stateless map_batches
stages; per-ring math is numpy over the materialized ring arrays.
"""

from __future__ import annotations
from ..sources.layers import nz as _nz

import numpy as np
import pandas as pd

from ..geom.kernels import planar_ring_area, ring_centroid
from ..sources.layers import geom_type_of



def _rings(row):
    rx = row["rings_x"] if row["rings_x"] is not None else []
    ry = row["rings_y"] if row["rings_y"] is not None else []
    return ([np.asarray(x, dtype=np.float64) for x in rx],
            [np.asarray(y, dtype=np.float64) for y in ry])


# ---------------------------------------------------------------------------
# -explode: multipart -> singlepart (src/commands/mapshaper-explode.js:3)

def explode(ds, naive: bool = False):
    """One feature per polygon part (rings keep their hole ownership via
    ring_poly) / per line part / per point.  Attributes are duplicated;
    new sequential feature_id preserves (orig_feature, part) order.
    ``naive`` (reference -explode naive, explodePolygonNaive,
    src/commands/mapshaper-explode.js:55-63): every RING becomes its
    own polygon, hole-wound rings reversed to outer orientation."""
    def ex(df: pd.DataFrame) -> pd.DataFrame:
        gt = geom_type_of(list(df.columns))
        rows = []
        for row in df.to_dict("records"):
            base = {c: row[c] for c in df.columns
                    if c not in ("rings_x", "rings_y", "ring_poly",
                                 "part_x", "part_y", "px", "py")}
            if gt == "polygon":
                rx, ry = _rings(row)
                rp = np.asarray(row["ring_poly"] if row["ring_poly"]
                                is not None else [], dtype=np.int64)
                if naive:
                    from ..geom.kernels import planar_ring_area
                    for i in range(len(rp)):
                        x, y = rx[i], ry[i]
                        if planar_ring_area(x, y) < 0:
                            x, y = x[::-1], y[::-1]
                        rows.append({**base, "rings_x": [x.tolist()],
                                     "rings_y": [y.tolist()],
                                     "ring_poly": [0]})
                    if not len(rp):
                        rows.append({**base, "rings_x": [],
                                     "rings_y": [], "ring_poly": []})
                    continue
                for p in np.unique(rp) if len(rp) else []:
                    sel = np.nonzero(rp == p)[0]
                    rows.append({**base,
                                 "rings_x": [rx[i].tolist() for i in sel],
                                 "rings_y": [ry[i].tolist() for i in sel],
                                 "ring_poly": [0] * len(sel)})
                if not len(rp):
                    rows.append({**base, "rings_x": [], "rings_y": [],
                                 "ring_poly": []})
            elif gt == "polyline":
                parts_x = _nz(row["part_x"])
                parts_y = _nz(row["part_y"])
                if len(parts_x) == 0:
                    rows.append({**base, "part_x": [], "part_y": []})
                for x, y in zip(parts_x, parts_y):
                    rows.append({**base, "part_x": [list(x)],
                                 "part_y": [list(y)]})
            else:
                xs = _nz(row["px"])
                ys = _nz(row["py"])
                if len(xs) == 0:
                    rows.append({**base, "px": [], "py": []})
                for x, y in zip(xs, ys):
                    rows.append({**base, "px": [x], "py": [y]})
        return pd.DataFrame(rows)
    return ds.map_batches(ex, batch_format="pandas")


# ---------------------------------------------------------------------------
# -affine (src/commands/mapshaper-affine.js:5): shift/scale/rotate

def affine(ds, shift=(0.0, 0.0), scale=1.0, rotate_deg=0.0,
           anchor=(0.0, 0.0)):
    """Reference getAffineTransform
    (src/commands/mapshaper-affine.js:84-93): positive rotation is
    CLOCKWISE (x2 = a·dx − b·dy, y2 = b·dx + a·dy with a = s·cos,
    b = −s·sin), anchored at ``anchor`` (the command layer passes the
    dataset bbox center like the reference's getAffineAnchor)."""
    th = np.deg2rad(rotate_deg)
    a = np.cos(th) * scale
    b = -np.sin(th) * scale
    ax, ay = anchor
    tx, ty = shift

    def fx(x, y):
        return a * (x - ax) - b * (y - ay) + tx + ax

    def fy(x, y):
        return b * (x - ax) + a * (y - ay) + ty + ay

    return _map_coords(ds, fx, fy)


def round_coords(ds, precision: float):
    """Precision rounding to an INCREMENT (reference
    setCoordinatePrecision + getRoundingFunction,
    src/geom/mapshaper-rounding.js:10-46): ``precision=0.001`` snaps
    to thousandths via Math.round(x*inv)/inv (half toward +inf)."""
    inv = 1.0 / float(precision)
    if inv > 1:
        inv = np.floor(inv + 0.5)

    def rnd(v):
        return np.floor(np.asarray(v, float) * inv + 0.5) / inv
    return _map_coords(ds, lambda x, y: rnd(x), lambda x, y: rnd(y))


def _map_coords(ds, fx, fy):
    def go(df: pd.DataFrame) -> pd.DataFrame:
        gt = geom_type_of(list(df.columns))
        df = df.copy()
        if gt == "polygon":
            cols = ("rings_x", "rings_y")
        elif gt == "polyline":
            cols = ("part_x", "part_y")
        else:
            cols = ("px", "py")
        new_x, new_y = [], []
        for row in df.to_dict("records"):
            xs = row[cols[0]] if row[cols[0]] is not None else []
            ys = row[cols[1]] if row[cols[1]] is not None else []
            if gt == "point":
                x = np.asarray(xs, dtype=np.float64)
                y = np.asarray(ys, dtype=np.float64)
                new_x.append(fx(x, y).tolist())
                new_y.append(fy(x, y).tolist())
            else:
                rxs, rys = [], []
                for x, y in zip(xs, ys):
                    x = np.asarray(x, dtype=np.float64)
                    y = np.asarray(y, dtype=np.float64)
                    rxs.append(fx(x, y).tolist())
                    rys.append(fy(x, y).tolist())
                new_x.append(rxs)
                new_y.append(rys)
        df[cols[0]] = new_x
        df[cols[1]] = new_y
        return df
    return ds.map_batches(go, batch_format="pandas")


# ---------------------------------------------------------------------------
# polygon metrics + -points (centroid / inner)

def add_polygon_metrics(ds, area_col="area", perimeter_col=None):
    """Signed-area sum over rings (holes subtract via opposite winding —
    planar path area, src/geom/mapshaper-shape-geom.js:225-245)."""
    def go(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        areas, perims = [], []
        for row in df.to_dict("records"):
            rx, ry = _rings(row)
            a = 0.0
            p = 0.0
            for x, y in zip(rx, ry):
                a += planar_ring_area(x, y)
                p += float(np.sum(np.hypot(np.diff(x), np.diff(y))))
            areas.append(abs(a))
            perims.append(p)
        df[area_col] = areas
        if perimeter_col:
            df[perimeter_col] = perims
        return df
    return ds.map_batches(go, batch_format="pandas")


def centroids(ds, x_col="cx", y_col="cy"):
    """Centroid of the LARGEST ring of each polygon — holes and
    smaller parts are ignored, and a zero-area ring falls back to the
    vertex average, matching the reference exactly
    (src/points/mapshaper-polygon-centroid.js:6-35: getShapeCentroid
    takes getMaxPath only; verified against the built reference CLI on
    its six_counties fixture)."""
    def go(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        cxs, cys = [], []
        for row in df.to_dict("records"):
            rx, ry = _rings(row)
            best, best_a = None, 0.0
            for x, y in zip(rx, ry):
                x = np.asarray(x, dtype=np.float64)
                y = np.asarray(y, dtype=np.float64)
                # getMaxPath ranks by BOUNDING-BOX area (shape-geom.js:28-38)
                bb = (x.max() - x.min()) * (y.max() - y.min())
                if bb > best_a:
                    best, best_a = (x, y), bb
            if best is None:
                cxs.append(np.nan)
                cys.append(np.nan)
                continue
            x, y = best
            if planar_ring_area(x, y) == 0.0:
                cxs.append(float(np.mean(x[:-1])))
                cys.append(float(np.mean(y[:-1])))
            else:
                cx, cy = ring_centroid(x, y)
                cxs.append(cx)
                cys.append(cy)
        df[x_col] = cxs
        df[y_col] = cys
        return df
    return ds.map_batches(go, batch_format="pandas")


def _topology_rotated(ds):
    """Rebuild each feature's rings through the shared-arc topology —
    identical coordinates, but rings rotated to their first junction
    exactly as the reference stores them after buildTopology."""
    return _topology_rotated_many([ds])[0]


def _topology_rotated_many(dss):
    """Joint-topology ring rotation across SEVERAL layer Datasets (the
    reference's combine-files imports all files into ONE dataset, so
    junctions between files rotate rings too)."""
    import ray.data as rd

    from ..topo.build import build_topology
    dfs = [ds.to_pandas().sort_values("feature_id").reset_index(drop=True)
           for ds in dss]
    feats = []
    for df in dfs:
        for row in df.to_dict("records"):
            rx, ry = _rings(row)
            feats.append([np.stack([x, y], axis=1)
                          for x, y in zip(rx, ry)] or None)
    arcs, shapes = build_topology(feats)
    out_dss = []
    fi = 0
    for df in dfs:
        rows = []
        for row in df.to_dict("records"):
            out = {c: row[c] for c in df.columns
                   if c not in ("rings_x", "rings_y")}
            nx, ny = [], []
            for part in (shapes[fi] or []):
                x, y = arcs.path_coords(part)
                x = np.asarray(x, float)
                y = np.asarray(y, float)
                if len(x) and (x[0] != x[-1] or y[0] != y[-1]):
                    x = np.append(x, x[0])
                    y = np.append(y, y[0])
                nx.append(x.tolist())
                ny.append(y.tolist())
            out["rings_x"] = nx
            out["rings_y"] = ny
            rows.append(out)
            fi += 1
        out_dss.append(rd.from_items(rows))
    return out_dss


def to_point_layer(ds, mode="centroid"):
    """-points: polygon layer -> point layer (``centroid`` or ``inner``
    anchor points, src/commands/mapshaper-points.js)."""
    if mode == "inner":
        from .anchor import anchor_points
        # the reference places anchors AFTER buildTopology, where each
        # ring is rotated to its first junction — simplifyPathFast (and
        # hence the probe) depends on the start vertex, so rebuild the
        # rings through topology before anchoring (verified start-exact
        # against the reference CLI on two_states)
        ds = anchor_points(_topology_rotated(ds), x_col="cx", y_col="cy")
    else:
        ds = centroids(ds)

    def make(df: pd.DataFrame) -> pd.DataFrame:
        keep = [c for c in df.columns
                if c not in ("rings_x", "rings_y", "ring_poly", "cx", "cy")]
        out = df[keep].copy()
        out["px"] = [[v] if np.isfinite(v) else [] for v in df["cx"]]
        out["py"] = [[v] if np.isfinite(v) else [] for v in df["cy"]]
        return out
    return ds.map_batches(make, batch_format="pandas")


# ---------------------------------------------------------------------------
# filters

def filter_bbox(ds, xmin, ymin, xmax, ymax):
    """-filter-geom bbox= : PER-PART filtering like the reference
    (src/commands/mapshaper-filter-geom.js:13-32) — points keep only
    coordinates inside the bbox, paths/rings keep parts whose bbox
    intersects; features left with no geometry are removed
    (remove_empty)."""
    def go(df: pd.DataFrame) -> pd.DataFrame:
        gt = geom_type_of(list(df.columns))
        df = df.copy()
        keep = []
        for ri in range(len(df)):
            row = df.iloc[ri]
            if gt == "point":
                xs = np.asarray(_nz(row["px"]), dtype=float)
                ys = np.asarray(_nz(row["py"]), dtype=float)
                m = (xs >= xmin) & (xs <= xmax) & \
                    (ys >= ymin) & (ys <= ymax)
                df.at[df.index[ri], "px"] = xs[m].tolist()
                df.at[df.index[ri], "py"] = ys[m].tolist()
                keep.append(bool(m.any()))
                continue
            xc, yc = (("rings_x", "rings_y") if gt == "polygon"
                      else ("part_x", "part_y"))
            nx, ny, nrp = [], [], []
            rp = list(_nz(row["ring_poly"])) if gt == "polygon" else []
            for k, (x, y) in enumerate(zip(_nz(row[xc]),
                                           _nz(row[yc]))):
                x = np.asarray(x, dtype=float)
                y = np.asarray(y, dtype=float)
                if len(x) and x.min() <= xmax and x.max() >= xmin \
                        and y.min() <= ymax and y.max() >= ymin:
                    nx.append(x.tolist())
                    ny.append(y.tolist())
                    if gt == "polygon":
                        nrp.append(rp[k] if k < len(rp) else k)
            df.at[df.index[ri], xc] = nx
            df.at[df.index[ri], yc] = ny
            if gt == "polygon":
                df.at[df.index[ri], "ring_poly"] = nrp
            keep.append(bool(nx))
        return df[np.asarray(keep, dtype=bool)]
    return ds.map_batches(go, batch_format="pandas")


def filter_islands(ds, min_area: float):
    """-filter-islands min-area=: drop detached rings (not holes) whose
    area is below threshold (src/commands/mapshaper-filter-islands.js:3-64).
    Features losing all rings become null geometry."""
    def go(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        nx, ny, npl = [], [], []
        for row in df.to_dict("records"):
            rx, ry = _rings(row)
            rp = np.asarray(row["ring_poly"] if row["ring_poly"]
                            is not None else [], dtype=np.int64)
            keep_polys = set()
            for p in np.unique(rp) if len(rp) else []:
                sel = np.nonzero(rp == p)[0]
                outer = sel[0]
                if abs(planar_ring_area(rx[outer], ry[outer])) >= min_area:
                    keep_polys.add(int(p))
            sel = [i for i in range(len(rx)) if int(rp[i]) in keep_polys]
            remap = {p: k for k, p in enumerate(sorted(keep_polys))}
            nx.append([rx[i].tolist() for i in sel])
            ny.append([ry[i].tolist() for i in sel])
            npl.append([remap[int(rp[i])] for i in sel])
        df["rings_x"] = nx
        df["rings_y"] = ny
        df["ring_poly"] = npl
        return df
    return ds.map_batches(go, batch_format="pandas")


def sliver_area_threshold(ds) -> float:
    """Auto sliver threshold: (mean segment length)², with segments
    longer than half the layer bbox in either axis disregarded (they
    are bounding-box-like artifacts) — reference calcMaxSliverArea,
    src/commands/mapshaper-filter-slivers.js:66-84.  Distributed:
    bbox pre-pass, then distributive (sum, count) partials (the
    reference's online mean == arithmetic mean)."""
    info = layer_info(ds)
    xmin, ymin, xmax, ymax = info["bbox"]
    dx_max = (xmax - xmin) / 2
    dy_max = (ymax - ymin) / 2

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        tot = 0.0
        cnt = 0
        for row in df.to_dict("records"):
            rx, ry = _rings(row)
            for x, y in zip(rx, ry):
                dx = np.abs(np.diff(x))
                dy = np.abs(np.diff(y))
                keep = (dx < dx_max) & (dy < dy_max)
                tot += float(np.sum(np.hypot(dx[keep], dy[keep])))
                cnt += int(np.count_nonzero(keep))
        return pd.DataFrame({"tot": [tot], "cnt": [cnt]})
    p = ds.map_batches(partial, batch_format="pandas").to_pandas()
    cnt = int(p["cnt"].sum())
    if cnt == 0:
        return 0.0
    mean = float(p["tot"].sum()) / cnt
    return mean * mean


def filter_slivers(ds, min_area: float | None = None):
    """-filter-slivers: drop rings (incl. holes) below threshold
    (src/commands/mapshaper-filter-slivers.js:8).  ``min_area=None``
    computes the reference's auto threshold (mean-squared segment
    length; drop when area <= threshold)."""
    if min_area is None:
        thr = sliver_area_threshold(ds)

        def drop(a):
            return abs(a) <= thr
    else:
        def drop(a):
            return abs(a) < min_area

    def go(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        nx, ny, npl = [], [], []
        for row in df.to_dict("records"):
            rx, ry = _rings(row)
            rp = list(row["ring_poly"] if row["ring_poly"] is not None
                      else [])
            sel = [i for i in range(len(rx))
                   if not drop(planar_ring_area(rx[i], ry[i]))]
            nx.append([rx[i].tolist() for i in sel])
            ny.append([ry[i].tolist() for i in sel])
            npl.append([rp[i] for i in sel])
        df["rings_x"] = nx
        df["rings_y"] = ny
        df["ring_poly"] = npl
        return df
    return ds.map_batches(go, batch_format="pandas")


# ---------------------------------------------------------------------------
# -info: layer bounds + counts via distributive aggregates

def layer_info(ds) -> dict:
    def go(df: pd.DataFrame) -> pd.DataFrame:
        gt = geom_type_of(list(df.columns))
        n = len(df)
        nnull = 0
        xmin = ymin = np.inf
        xmax = ymax = -np.inf
        for row in df.to_dict("records"):
            if gt == "polygon":
                rx, ry = _rings(row)
            elif gt == "polyline":
                rx = [np.asarray(v) for v in _nz(row["part_x"])]
                ry = [np.asarray(v) for v in _nz(row["part_y"])]
            else:
                rx = [np.asarray(_nz(row["px"]))]
                ry = [np.asarray(_nz(row["py"]))]
            xs = np.concatenate(rx) if rx else np.empty(0)
            ys = np.concatenate(ry) if ry else np.empty(0)
            if len(xs) == 0:
                nnull += 1
                continue
            xmin = min(xmin, xs.min()); xmax = max(xmax, xs.max())
            ymin = min(ymin, ys.min()); ymax = max(ymax, ys.max())
        return pd.DataFrame([{"n": n, "n_null": nnull, "xmin": xmin,
                              "ymin": ymin, "xmax": xmax, "ymax": ymax}])
    parts = ds.map_batches(go, batch_format="pandas").to_pandas()
    return {
        "count": int(parts["n"].sum()),
        "null_geometries": int(parts["n_null"].sum()),
        "bbox": [float(parts["xmin"].min()), float(parts["ymin"].min()),
                 float(parts["xmax"].max()), float(parts["ymax"].max())],
    }


def clean_shapes(ds):
    """-clean shape cleanup over a layer Dataset (reference
    internal.cleanShapes via cleanPathsAfterImport,
    src/paths/mapshaper-path-import.js:13-29): per path, drop NaN
    vertices and consecutive duplicates; drop defective paths (rings
    with < 4 points after closing, parts with < 2); polygon rings also
    get nesting repair (same-winding nested rings removed, lone
    hole-wound rings flipped — ops/anchor.fix_ring_nesting)."""
    from ..sources.layers import geom_type_of, nz

    def go(df: pd.DataFrame) -> pd.DataFrame:
        gt = geom_type_of(list(df.columns))
        if gt == "polygon":
            xcol, ycol, min_pts = "rings_x", "rings_y", 4
        elif gt == "polyline":
            xcol, ycol, min_pts = "part_x", "part_y", 2
        else:
            return df
        df = df.copy()
        nx, ny, npl = [], [], []
        for row in df.to_dict("records"):
            rp = list(row["ring_poly"]) if gt == "polygon" and \
                row["ring_poly"] is not None else []
            ox, oy, op = [], [], []
            for i, (x, y) in enumerate(zip(nz(row[xcol]), nz(row[ycol]))):
                x = np.asarray(x, dtype=np.float64)
                y = np.asarray(y, dtype=np.float64)
                ok = np.isfinite(x) & np.isfinite(y)
                x, y = x[ok], y[ok]
                if len(x):
                    dup = np.concatenate(
                        [[False], (np.diff(x) == 0) & (np.diff(y) == 0)])
                    x, y = x[~dup], y[~dup]
                if gt == "polygon" and len(x) >= 3 and \
                        (x[0] != x[-1] or y[0] != y[-1]):
                    x = np.append(x, x[0])
                    y = np.append(y, y[0])
                if len(x) < min_pts:
                    continue  # defective path dropped
                ox.append(x.tolist())
                oy.append(y.tolist())
                if gt == "polygon":
                    op.append(rp[i] if i < len(rp) else 0)
            nx.append(ox)
            ny.append(oy)
            npl.append(op)
        df[xcol] = nx
        df[ycol] = ny
        if gt == "polygon":
            df["ring_poly"] = npl
        return df

    cleaned = ds.map_batches(go, batch_format="pandas")
    try:
        gt = geom_type_of(ds.schema().names)
    except Exception:
        gt = None
    if gt == "polygon":
        from .anchor import fix_ring_nesting
        cleaned = fix_ring_nesting(cleaned)
    return cleaned
