"""Clip / erase operators (SURVEY.md §2.4 row -clip/-erase, §2.6).

Implemented surface:
- ``clip_points`` / ``erase_points`` — the geometric SEMI / ANTI join:
  keep points inside / outside a polygon layer.  Exact semantics of the
  reference's point clipping (src/clipping/mapshaper-point-clipping.js:3-27:
  a point ON the boundary counts as inside → kept by clip, dropped by
  erase).  Ray shape: broadcast PathIndex probe in map_batches.
- ``clip_bbox`` / ``erase_bbox`` — polygon/polyline/point clip against a
  rectangle (the reference's ``-clip bbox=`` fast path,
  src/commands/mapshaper-clip-erase.js: bbox option → convex clip).
  Polygons use Sutherland–Hodgman against each rect edge (exact for a
  convex clip region); polylines split segments at rect crossings and
  keep inside runs; points filter.

- ``clip_polylines`` — general polyline × polygon-layer clip / erase /
  slice (reference src/clipping/mapshaper-polyline-clipping.js: divide
  arcs at crossings with the clip layer, then keep runs of arcs whose
  interior is enclosed (clip) / not enclosed (erase); ``slice`` keeps
  every run tagged with an ``inside`` flag, reference -slice in
  src/commands/mapshaper-clip-erase.js:13-27).  Ray shape: the clip
  layer (small side) broadcasts once via ray.put; each polyline
  feature cuts + classifies independently inside map_batches.

The general polygon×polygon boolean lives in pipelines/overlay.py on
the mosaic substrate; ``clip_bbox`` remains the rectangle fast path.
"""

from __future__ import annotations
from ..sources.layers import nz as _nz

import numpy as np
import pandas as pd


from ..state.path_index import PathIndex


# ---------------------------------------------------------------------------
# point semi / anti join

def _point_filter(ds, index: PathIndex, keep_inside: bool,
                  lon_col="px", lat_col="py"):
    fn_index = index.pack()

    def go(df: pd.DataFrame) -> pd.DataFrame:
        idx = PathIndex.unpack(fn_index)
        keep_rows = []
        new_px, new_py = [], []
        for row in df.to_dict("records"):
            xs = np.asarray(row[lon_col] if row[lon_col] is not None else [],
                            dtype=np.float64)
            ys = np.asarray(row[lat_col] if row[lat_col] is not None else [],
                            dtype=np.float64)
            if len(xs) == 0:
                keep_rows.append(False)
                new_px.append([])
                new_py.append([])
                continue
            rid = idx.find_enclosing_feature(xs, ys)
            m = (rid >= 0) if keep_inside else (rid < 0)
            keep_rows.append(bool(m.any()))
            new_px.append(xs[m].tolist())
            new_py.append(ys[m].tolist())
        df = df.copy()
        df[lon_col] = new_px
        df[lat_col] = new_py
        return df[np.asarray(keep_rows, dtype=bool)]
    return ds.map_batches(go, batch_format="pandas")


def clip_points(ds, index: PathIndex, **kw):
    """Keep points inside the clip polygons (boundary = inside)."""
    return _point_filter(ds, index, keep_inside=True, **kw)


def erase_points(ds, index: PathIndex, **kw):
    """Drop points inside the erase polygons (boundary = inside = dropped)."""
    return _point_filter(ds, index, keep_inside=False, **kw)


# ---------------------------------------------------------------------------
# rectangle clip

def _sh_clip_ring(x, y, bbox):
    """Sutherland–Hodgman polygon clip against an axis-aligned rect.
    Input/output rings closed (first == last).  Exact for the convex
    clip region; concave subjects fine."""
    xmin, ymin, xmax, ymax = bbox
    pts = np.stack([x[:-1], y[:-1]], axis=1)  # open ring

    def clip_edge(pts, inside, intersect):
        if len(pts) == 0:
            return pts
        out = []
        n = len(pts)
        for i in range(n):
            cur = pts[i]
            prv = pts[i - 1]
            ci, pi = inside(cur), inside(prv)
            if ci:
                if not pi:
                    out.append(intersect(prv, cur))
                out.append(cur)
            elif pi:
                out.append(intersect(prv, cur))
        return np.asarray(out, dtype=np.float64).reshape(-1, 2)

    def ix(p, q, axis, val):
        t = (val - p[axis]) / (q[axis] - p[axis])
        r = p + t * (q - p)
        r[axis] = val
        return r

    pts = clip_edge(pts, lambda p: p[0] >= xmin, lambda p, q: ix(p, q, 0, xmin))
    pts = clip_edge(pts, lambda p: p[0] <= xmax, lambda p, q: ix(p, q, 0, xmax))
    pts = clip_edge(pts, lambda p: p[1] >= ymin, lambda p, q: ix(p, q, 1, ymin))
    pts = clip_edge(pts, lambda p: p[1] <= ymax, lambda p, q: ix(p, q, 1, ymax))
    if len(pts) < 3:
        return None
    closed = np.vstack([pts, pts[:1]])
    return closed[:, 0], closed[:, 1]


def _clip_segments(x, y, bbox):
    """Polyline × rect: split at crossings, keep inside runs.  Returns a
    list of (x, y) parts."""
    xmin, ymin, xmax, ymax = bbox

    def inside(px, py):
        return (xmin <= px <= xmax) and (ymin <= py <= ymax)

    parts = []
    cur_x: list = []
    cur_y: list = []

    def flush():
        if len(cur_x) >= 2:
            parts.append((np.array(cur_x), np.array(cur_y)))
        cur_x.clear()
        cur_y.clear()

    for i in range(len(x) - 1):
        p = np.array([x[i], y[i]])
        q = np.array([x[i + 1], y[i + 1]])
        # parametric clip of segment p->q to the rect (Liang–Barsky)
        d = q - p
        t0, t1 = 0.0, 1.0
        ok = True
        for axis, lo, hi in ((0, xmin, xmax), (1, ymin, ymax)):
            if d[axis] == 0:
                if p[axis] < lo or p[axis] > hi:
                    ok = False
                    break
                continue
            ta = (lo - p[axis]) / d[axis]
            tb = (hi - p[axis]) / d[axis]
            ta, tb = min(ta, tb), max(ta, tb)
            t0, t1 = max(t0, ta), min(t1, tb)
            if t0 > t1:
                ok = False
                break
        if not ok:
            flush()
            continue
        a = p + t0 * d
        b = p + t1 * d
        if not cur_x or not np.isclose(cur_x[-1], a[0]) \
                or not np.isclose(cur_y[-1], a[1]):
            flush()
            cur_x.extend([a[0]])
            cur_y.extend([a[1]])
        cur_x.append(b[0])
        cur_y.append(b[1])
        if t1 < 1.0:
            flush()
    flush()
    return parts


def clip_bbox(ds, bbox):
    """-clip bbox=[xmin,ymin,xmax,ymax] over a layer Dataset."""
    from ..sources.layers import geom_type_of

    def go(df: pd.DataFrame) -> pd.DataFrame:
        gt = geom_type_of(list(df.columns))
        df = df.copy()
        if gt == "polygon":
            nx, ny, np_ = [], [], []
            keep = []
            for row in df.to_dict("records"):
                rx = [np.asarray(v, dtype=np.float64)
                      for v in (row["rings_x"] if row["rings_x"] is not None else [])]
                ry = [np.asarray(v, dtype=np.float64)
                      for v in (row["rings_y"] if row["rings_y"] is not None else [])]
                rp = list(row["ring_poly"] if row["ring_poly"] is not None else [])
                ox, oy, op = [], [], []
                for x, y, p in zip(rx, ry, rp):
                    res = _sh_clip_ring(x, y, bbox)
                    if res is not None:
                        ox.append(res[0].tolist())
                        oy.append(res[1].tolist())
                        op.append(p)
                nx.append(ox); ny.append(oy); np_.append(op)
                keep.append(bool(ox))
            df["rings_x"] = nx
            df["rings_y"] = ny
            df["ring_poly"] = np_
            return df[np.asarray(keep, dtype=bool)]
        if gt == "polyline":
            nx, ny = [], []
            keep = []
            for row in df.to_dict("records"):
                ox, oy = [], []
                for x, y in zip(_nz(row["part_x"]), _nz(row["part_y"])):
                    for px, py in _clip_segments(np.asarray(x, float),
                                                 np.asarray(y, float), bbox):
                        ox.append(px.tolist())
                        oy.append(py.tolist())
                nx.append(ox); ny.append(oy)
                keep.append(bool(ox))
            df["part_x"] = nx
            df["part_y"] = ny
            return df[np.asarray(keep, dtype=bool)]
        xmin, ymin, xmax, ymax = bbox
        nx, ny, keep = [], [], []
        for row in df.to_dict("records"):
            xs = np.asarray(_nz(row["px"]), dtype=np.float64)
            ys = np.asarray(_nz(row["py"]), dtype=np.float64)
            m = (xs >= xmin) & (xs <= xmax) & (ys >= ymin) & (ys <= ymax)
            nx.append(xs[m].tolist()); ny.append(ys[m].tolist())
            keep.append(bool(m.any()))
        df["px"] = nx
        df["py"] = ny
        return df[np.asarray(keep, dtype=bool)]
    return ds.map_batches(go, batch_format="pandas")


# ---------------------------------------------------------------------------
# general polyline x polygon clip / erase / slice

def _clip_part_runs(x, y, clip_rings, how):
    """One polyline part against a clip ring set.

    Cuts the part at every crossing with a clip-ring segment (the
    per-feature application of addIntersectionCuts), classifies each
    piece by whether an interior point is enclosed (even-odd over all
    rings, holes included), and merges adjacent same-class pieces back
    into runs.  Returns list of (x, y[, inside]) parts."""
    from ..geom.kernels import points_in_shape
    from ..topo.arcs import ArcTable
    from ..topo.cuts import add_intersection_cuts

    coords = [np.stack([x, y], axis=1)]
    for rx, ry in clip_rings:
        coords.append(np.stack([np.asarray(rx, float),
                                np.asarray(ry, float)], axis=1))
    arcs = ArcTable.from_coord_lists(coords)
    cut, remap, _ = add_intersection_cuts(arcs)
    pieces = []
    for aid in remap[0]:
        i0 = cut.ii[aid]
        n = cut.nn[aid]
        pieces.append((cut.xx[i0:i0 + n], cut.yy[i0:i0 + n]))

    def enclosed(px_arr, py_arr):
        # interior point: midpoint of the longest segment (stays off
        # the boundary for pieces produced by boundary cuts)
        dx = np.diff(px_arr)
        dy = np.diff(py_arr)
        k = int(np.argmax(dx * dx + dy * dy))
        mx = (px_arr[k] + px_arr[k + 1]) / 2
        my = (py_arr[k] + py_arr[k + 1]) / 2
        return bool(points_in_shape(np.array([mx]), np.array([my]),
                                    clip_rings)[0])

    flags = [enclosed(px, py) for px, py in pieces]
    runs = []
    cur_x, cur_y, cur_flag = None, None, None
    for (px, py), fl in zip(pieces, flags):
        keep = (fl if how == "clip" else
                (not fl) if how == "erase" else True)
        if not keep:
            if cur_x is not None:
                runs.append((cur_x, cur_y, cur_flag))
                cur_x = None
            continue
        if cur_x is not None and (how != "slice" or fl == cur_flag) \
                and cur_x[-1] == px[0] and cur_y[-1] == py[0]:
            cur_x = np.concatenate([cur_x, px[1:]])
            cur_y = np.concatenate([cur_y, py[1:]])
        else:
            if cur_x is not None:
                runs.append((cur_x, cur_y, cur_flag))
            cur_x, cur_y, cur_flag = px, py, fl
    if cur_x is not None:
        runs.append((cur_x, cur_y, cur_flag))
    return runs


def clip_polylines(target_ds, clip_ds, how="clip"):
    """Polyline layer × polygon layer clip/erase/slice.

    ``how="clip"`` keeps the parts inside the clip polygons,
    ``"erase"`` the parts outside, ``"slice"`` keeps everything split
    at the boundaries with an added ``inside`` flag column (one row per
    feature; parts of a slice output carry per-part flags in
    ``part_inside``).

    clip/erase run the reference-exact kernel (clipPolylines port,
    topo/refclip.clip_polyline_features — arcs divided by the snapped
    addIntersectionCuts, runs of enclosed divided arcs merged), so
    output coordinates match the reference bit-for-bit; slice keeps the
    run-classification variant (no reference equivalent for per-part
    flags)."""
    import ray

    if how in ("clip", "erase"):
        cdf = clip_ds.to_pandas()
        clip_feats = []
        for row in cdf.to_dict("records"):
            rings = [np.stack([np.asarray(rx, float),
                               np.asarray(ry, float)], axis=1)
                     for rx, ry in zip(_nz(row.get("rings_x")),
                                       _nz(row.get("rings_y")))]
            if rings:
                clip_feats.append(rings)
        cref = ray.put(clip_feats)

        def go_exact(df: pd.DataFrame) -> pd.DataFrame:
            from ..topo.refclip import clip_polyline_features
            df = df.reset_index(drop=True)
            feats = [[np.stack([np.asarray(x, float),
                                np.asarray(y, float)], axis=1)
                      for x, y in zip(_nz(row["part_x"]),
                                      _nz(row["part_y"]))]
                     for row in df.to_dict("records")]
            out = clip_polyline_features(feats, ray.get(cref), how)
            rows = []
            for i, parts in enumerate(out):
                if not parts:
                    continue
                row = {c: df.iloc[i][c] for c in df.columns
                       if c not in ("part_x", "part_y")}
                row["part_x"] = [p[0].tolist() for p in parts]
                row["part_y"] = [p[1].tolist() for p in parts]
                rows.append(row)
            return pd.DataFrame(rows)
        return target_ds.map_batches(go_exact, batch_format="pandas",
                                     batch_size=64)

    cdf = clip_ds.to_pandas()
    clip_rings = []
    for row in cdf.to_dict("records"):
        for rx, ry in zip(_nz(row.get("rings_x")), _nz(row.get("rings_y"))):
            clip_rings.append((np.asarray(rx, float), np.asarray(ry, float)))
    ref = ray.put(clip_rings)

    def go(df: pd.DataFrame) -> pd.DataFrame:
        rings = ray.get(ref)
        out_rows = []
        for row in df.to_dict("records"):
            nx, ny, nf = [], [], []
            for x, y in zip(_nz(row["part_x"]), _nz(row["part_y"])):
                for run in _clip_part_runs(np.asarray(x, float),
                                           np.asarray(y, float),
                                           rings, how):
                    nx.append(run[0].tolist())
                    ny.append(run[1].tolist())
                    nf.append(bool(run[2]))
            if not nx:
                continue
            out = {c: row[c] for c in df.columns
                   if c not in ("part_x", "part_y")}
            out["part_x"] = nx
            out["part_y"] = ny
            if how == "slice":
                out["part_inside"] = nf
            out_rows.append(out)
        return pd.DataFrame(out_rows)
    return target_ds.map_batches(go, batch_format="pandas")


def slice_polylines(target_ds, clip_ds):
    """-slice for polylines: split at clip boundaries, keep all parts."""
    return clip_polylines(target_ds, clip_ds, how="slice")
