"""Polygon mosaic — faces of the planar arrangement of all rings — and
the overlap/gap-repairing dissolve2 built on it.

Reference semantics (what to compute):
- ``buildPolygonMosaic`` (src/topology/mapshaper-polygon-mosaic.js:65):
  cut arcs at intersections, then trace every indivisible tile (face)
  of the arrangement.
- ``dissolvePolygonLayer2`` (src/dissolve/mapshaper-polygon-dissolve3.js:10-130):
  assign each tile to a shape (containment of a tile interior point;
  overlaps resolved by first/priority), then dissolve each group's
  tiles — output has no overlaps and no slivers below threshold.

Construction here (not a port): rings → intersection cuts
(topo/cuts.py) → junction split + twin dedup (topo/build.py machinery)
→ half-edge face walk: at each node the next half-edge is the most
clockwise leaving edge relative to the incoming edge (standard planar
face traversal); faces with positive signed area are the tiles, the
negative-area cycle is the unbounded face.

Scale shape (SURVEY.md §2.6 dissolve2 row): the mosaic is cut per cell
— faces are local to a cell once arcs are cut at cell borders — so
each cell's faces walk in a ``map_groups``; this module is the per-cell
kernel plus a driver-level convenience for fixture-sized layers.
"""

from __future__ import annotations

import numpy as np

from ..geom.kernels import planar_ring_area, points_in_shape
from .arcs import ArcTable
from .build import build_topology
from .cuts import add_intersection_cuts


def _split_and_dedupe(paths):
    """Open paths → junction-split, twin-deduped arc set (reuses the
    topology builder with one polyline feature per path)."""
    arcs, shapes = build_topology([[p] for p in paths], closed=False)
    return arcs


def _half_edges(arcs: ArcTable):
    """Directed half-edge table: for signed arc id h (0..2n-1, even =
    forward arc h//2, odd = reverse), start/end node keys and the
    leaving/arriving direction angles."""
    n = len(arcs.nn)
    start_xy = np.empty((2 * n, 2))
    end_xy = np.empty((2 * n, 2))
    theta_out = np.empty(2 * n)   # direction leaving start
    theta_in = np.empty(2 * n)    # direction arriving at end
    for a in range(n):
        i0 = arcs.ii[a]
        m = arcs.nn[a]
        x = arcs.xx[i0:i0 + m]
        y = arcs.yy[i0:i0 + m]
        for h, (xs, ys) in ((2 * a, (x, y)), (2 * a + 1, (x[::-1], y[::-1]))):
            start_xy[h] = (xs[0], ys[0])
            end_xy[h] = (xs[-1], ys[-1])
            theta_out[h] = np.arctan2(ys[1] - ys[0], xs[1] - xs[0])
            theta_in[h] = np.arctan2(ys[-1] - ys[-2], xs[-1] - xs[-2])
    return start_xy, end_xy, theta_out, theta_in


def _face_cycles(arcs: ArcTable):
    """All faces as lists of half-edge ids."""
    if len(arcs.nn) == 0:
        return []
    start_xy, end_xy, theta_out, theta_in = _half_edges(arcs)

    def node_key(p):
        return (round(p[0], 9), round(p[1], 9))

    # node -> list of (theta_out, half_edge) leaving it, angle-sorted
    leaving: dict[tuple, list] = {}
    for h in range(len(theta_out)):
        leaving.setdefault(node_key(start_xy[h]), []).append(
            (theta_out[h], h))
    for k in leaving:
        leaving[k].sort()

    def next_half_edge(h):
        """Face-to-the-left traversal: from the end of h, take the next
        leaving edge clockwise from the reversed incoming direction."""
        node = node_key(end_xy[h])
        cands = leaving[node]
        back = theta_in[h] + np.pi  # reversed incoming direction; the
        # comparator below is modular so no range normalization needed
        twin = h ^ 1
        # first leaving angle strictly below `back` in clockwise order
        # (wrap); skip the twin unless it's the only option
        ordered = sorted(cands, key=lambda t: (back - t[0]) % (2 * np.pi))
        for ang, cand in ordered:
            if cand != twin and (back - ang) % (2 * np.pi) > 1e-12:
                return cand
        for ang, cand in ordered:
            if cand != twin:
                return cand
        return twin

    used = np.zeros(2 * len(arcs.nn), dtype=bool)
    faces = []
    for h0 in range(len(used)):
        if used[h0]:
            continue
        cycle = []
        h = h0
        while True:
            used[h] = True
            cycle.append(h)
            h = next_half_edge(h)
            if h == h0:
                break
            if used[h]:  # merged into an already-traced cycle; discard
                cycle = None
                break
        if cycle:
            faces.append(cycle)
    return faces


def _face_coords(arcs: ArcTable, cycle):
    xs, ys = [], []
    for k, h in enumerate(cycle):
        a = h // 2
        i0 = arcs.ii[a]
        m = arcs.nn[a]
        x = arcs.xx[i0:i0 + m]
        y = arcs.yy[i0:i0 + m]
        if h & 1:
            x, y = x[::-1], y[::-1]
        if k:
            x, y = x[1:], y[1:]
        xs.append(x)
        ys.append(y)
    x = np.concatenate(xs)
    y = np.concatenate(ys)
    if x[0] != x[-1] or y[0] != y[-1]:
        x = np.append(x, x[0])
        y = np.append(y, y[0])
    return x, y


def _interior_point(x, y):
    """A point strictly inside the (simple) ring: midpoint of a short
    inward offset from the midpoint of the longest edge; validated by
    PIP with fallback to candidate edges."""
    n = len(x) - 1
    order = np.argsort(-(np.diff(x) ** 2 + np.diff(y) ** 2))[:n]
    area = planar_ring_area(x, y)
    sign = 1.0 if area > 0 else -1.0
    for e in order:
        mx = (x[e] + x[e + 1]) / 2
        my = (y[e] + y[e + 1]) / 2
        dx = x[e + 1] - x[e]
        dy = y[e + 1] - y[e]
        ln = np.hypot(dx, dy)
        if ln == 0:
            continue
        # left normal for CCW ring = inward
        for eps in (1e-3, 1e-6, 1e-9):
            px = mx - sign * dy / ln * ln * eps
            py = my + sign * dx / ln * ln * eps
            if points_in_shape(np.array([px]), np.array([py]),
                               [(x, y)])[0]:
                return px, py
    return float(np.mean(x[:-1])), float(np.mean(y[:-1]))


def polygon_mosaic(features):
    """features: list of shapes, each a list of closed (n,2) rings →
    list of tile dicts {x, y, area, point} (faces with positive area)."""
    rings = []
    for parts in features:
        if not parts:
            continue
        for r in parts:
            r = np.asarray(r, dtype=np.float64)
            rings.append(r)
    if not rings:
        return []
    base = ArcTable.from_coord_lists(rings)
    cut, _, _ = add_intersection_cuts(base)
    paths = []
    for a in range(len(cut.nn)):
        i0 = cut.ii[a]
        m = cut.nn[a]
        paths.append(np.stack([cut.xx[i0:i0 + m], cut.yy[i0:i0 + m]],
                              axis=1))
    arcs = _split_and_dedupe(paths)
    bounded = []   # kernel-negative cycles = face outer boundaries
    positive = []  # kernel-positive cycles = unbounded face OR a hole
    for cycle in _face_cycles(arcs):
        x, y = _face_coords(arcs, cycle)
        if len(x) < 4:
            continue
        area = planar_ring_area(x, y)
        # kernel sign convention is mapshaper's (clockwise positive), so
        # faces-to-the-left bounded cycles come out NEGATIVE; positive
        # cycles are the unbounded face and the inner boundaries of
        # faces with holes (annuli have two disjoint cycles)
        if area < -1e-12:
            bounded.append({"x": x, "y": y, "area": float(-area)})
        elif area > 1e-12:
            positive.append({"x": x, "y": y, "area": float(area)})

    # attach each positive cycle to the smallest bounded face strictly
    # containing it (none -> it is the unbounded face boundary)
    tiles = []
    holes_of: dict[int, list] = {}
    for p in positive:
        px, py = _interior_point(p["x"], p["y"])
        best = None
        for i, b in enumerate(bounded):
            if b["area"] <= p["area"]:
                continue
            if points_in_shape(np.array([px]), np.array([py]),
                               [(b["x"], b["y"])])[0]:
                if best is None or b["area"] < bounded[best]["area"]:
                    best = i
        if best is not None:
            holes_of.setdefault(best, []).append(p)
    for i, b in enumerate(bounded):
        holes = holes_of.get(i, [])
        rings = [(b["x"], b["y"])] + [(h["x"], h["y"]) for h in holes]
        area = b["area"] - sum(h["area"] for h in holes)
        pt = _tile_interior_point(rings)
        tiles.append({"x": b["x"], "y": b["y"], "rings": rings,
                      "area": float(area), "point": pt})
    return tiles


def _tile_interior_point(rings):
    """Point strictly inside a (outer + holes) tile: edge-midpoint
    offsets on BOTH normal sides of every ring, validated even-odd over
    all rings (an annulus rejects both naive ring-interior picks)."""
    for x, y in rings:
        n = len(x) - 1
        order = np.argsort(-(np.diff(x) ** 2 + np.diff(y) ** 2))[:n]
        for e in order[:8]:
            mx = (x[e] + x[e + 1]) / 2
            my = (y[e] + y[e + 1]) / 2
            dx = x[e + 1] - x[e]
            dy = y[e + 1] - y[e]
            ln = np.hypot(dx, dy)
            if ln == 0:
                continue
            for side in (1.0, -1.0):
                for eps in (1e-3, 1e-6, 1e-9):
                    px = mx - side * dy * eps
                    py = my + side * dx * eps
                    if points_in_shape(np.array([px]), np.array([py]),
                                      rings)[0]:
                        return float(px), float(py)
    x, y = rings[0]
    return float(np.mean(x[:-1])), float(np.mean(y[:-1]))


def dissolve2(features, keys, gap_max_area=0.0):
    """Overlap/gap-repairing dissolve: mosaic tiles assigned to the
    FIRST (lowest-index) shape containing the tile's interior point,
    then per-key tile-set dissolve.  Unassigned tiles (gaps) are
    dropped unless their area <= gap_max_area, in which case they melt
    into an adjacent group (reference sliver-gap fill,
    src/dissolve/mapshaper-polygon-dissolve3.js:35-44).

    Returns {key: {"area": float, "n_tiles": int, "rings": [(x,y)...]}}
    where rings are the dissolved group outlines."""
    from .dissolve import dissolve_shapes
    tiles = polygon_mosaic(features)
    shape_rings = [[(np.asarray(r)[:, 0], np.asarray(r)[:, 1])
                    for r in parts] for parts in features]

    assign = []
    for t in tiles:
        px, py = t["point"]
        owner = -1
        for si, rings in enumerate(shape_rings):
            if points_in_shape(np.array([px]), np.array([py]), rings)[0]:
                owner = si
                break
        assign.append(owner)

    # gap fill: tiny unassigned tiles adopt the first assigned neighbor
    # (shared vertex heuristic at fixture scale)
    for i, t in enumerate(tiles):
        if assign[i] >= 0 or t["area"] > gap_max_area:
            continue
        pts_i = {(round(a, 9), round(b, 9))
                 for a, b in zip(t["x"], t["y"])}
        for j, u in enumerate(tiles):
            if assign[j] < 0 or j == i:
                continue
            pts_j = {(round(a, 9), round(b, 9))
                     for a, b in zip(u["x"], u["y"])}
            if pts_i & pts_j:
                assign[i] = assign[j]
                break

    groups: dict = {}
    for t, a in zip(tiles, assign):
        if a < 0:
            continue
        k = keys[a]
        groups.setdefault(k, []).append(t)

    out = {}
    for k, ts in groups.items():
        feats = [[np.stack([rx, ry], axis=1) for rx, ry in t["rings"]]
                 for t in ts]
        arcs, shapes = build_topology(feats)
        rings = dissolve_shapes(shapes, [k] * len(shapes), arcs)[k] or []
        ring_coords = [arcs.path_coords(r) for r in rings]
        out[k] = {
            "area": float(sum(t["area"] for t in ts)),
            "n_tiles": len(ts),
            "rings": ring_coords,
        }
    return out


def polygons_from_lines(line_parts, close_gaps: float = 0.0):
    """-polygons (src/commands/mapshaper-polygons.js:3): enclosed faces
    of a polyline network → polygon rings.  ``close_gaps`` snaps
    dangling endpoints within that distance before the face walk
    (src/topology/mapshaper-gaps.js behavior for small gaps)."""
    from .snap import snap_coords_by_interval
    paths = [np.asarray(p, dtype=np.float64) for p in line_parts if len(p)]
    if not paths:
        return []
    if close_gaps > 0:
        flat = np.concatenate(paths)
        xs = flat[:, 0].copy()
        ys = flat[:, 1].copy()
        snap_coords_by_interval(xs, ys, close_gaps)
        out = []
        off = 0
        for p in paths:
            out.append(np.stack([xs[off:off + len(p)],
                                 ys[off:off + len(p)]], axis=1))
            off += len(p)
        paths = out
    base = ArcTable.from_coord_lists(paths)
    cut, _, _ = add_intersection_cuts(base)
    pieces = []
    for a in range(len(cut.nn)):
        i0 = cut.ii[a]
        m = cut.nn[a]
        pieces.append(np.stack([cut.xx[i0:i0 + m], cut.yy[i0:i0 + m]],
                               axis=1))
    arcs = _split_and_dedupe(pieces)
    rings = []
    for cycle in _face_cycles(arcs):
        x, y = _face_coords(arcs, cycle)
        if len(x) < 4:
            continue
        area = planar_ring_area(x, y)
        if area < -1e-12:  # bounded faces (kernel CW-positive)
            rings.append({"x": x, "y": y, "area": float(-area)})
    return rings


def clean_layer(features, keys=None):
    """-clean: repair overlaps/gaps, one group per original feature
    (src/commands/mapshaper-clean.js:3-19)."""
    if keys is None:
        keys = list(range(len(features)))
    return dissolve2(features, keys)
