"""Topology build: convert per-feature path coordinates into shared arcs.

Computes the same result as the reference's ``api.buildTopology``
(src/topology/mapshaper-topology.js:11-229 + mapshaper-topology-chains-v2.js
+ mapshaper-arc-index.js): coincident-vertex analysis finds topology nodes
(junctions), every path is cut at junctions, and duplicate (same or
reversed) arcs are stored once, so a border shared by two polygons becomes
a single arc referenced by both with opposite signs.

The algorithm here is the public junction-cut-dedup formulation (Bostock's
TopoJSON topology), which produces the same shared-arc decomposition;
exact float equality of coordinates defines coincidence, like the
reference's hashed point chains.

Scale note: this runs per partition/group (polygon side of a spatial join
is small and broadcast). The distributed variant for huge layers is a
2-stage shuffle — groupby quantized-vertex key to mark junctions, then
groupby endpoint-pair key to dedupe arcs (SURVEY.md §2.6 row 1).
"""

from __future__ import annotations

import numpy as np

from .arcs import ArcTable


def _neighbor_key(prev_pt, next_pt):
    """Unordered neighbor pair — reversal-invariant."""
    if prev_pt is None or (next_pt is not None and next_pt < prev_pt):
        return (next_pt, prev_pt)
    return (prev_pt, next_pt)


def find_junctions(paths):
    """Return the set of junction coordinates over all paths.

    paths: list of dicts {"coords": (n,2) float64 array, "closed": bool}.
    A coordinate is a junction when it occurs with two different
    (unordered) neighbor pairs, or more than once within contexts that
    cannot be merged (e.g. a self-intersection), or is an endpoint of an
    open path.
    """
    seen = {}       # coord -> first neighbor key
    junctions = set()
    counts = {}
    for p in paths:
        c = p["coords"]
        n = len(c)
        closed = p["closed"]
        pts = [tuple(pt) for pt in c]
        if closed and n > 1 and pts[0] == pts[-1]:
            ring = pts[:-1]
            m = len(ring)
            for i, pt in enumerate(ring):
                prev_pt = ring[(i - 1) % m]
                next_pt = ring[(i + 1) % m]
                _visit(pt, _neighbor_key(prev_pt, next_pt), seen, junctions, counts)
        else:
            for i, pt in enumerate(pts):
                if i == 0 or i == n - 1:
                    junctions.add(pt)  # open-path endpoints are nodes
                prev_pt = pts[i - 1] if i > 0 else None
                next_pt = pts[i + 1] if i < n - 1 else None
                _visit(pt, _neighbor_key(prev_pt, next_pt), seen, junctions, counts)
    return junctions


def _visit(pt, nkey, seen, junctions, counts):
    counts[pt] = counts.get(pt, 0) + 1
    if pt in seen:
        if seen[pt] != nkey:
            junctions.add(pt)
    else:
        seen[pt] = nkey


def _rotate_ring(pts, junctions):
    """Rotate a closed ring (without duplicate end vertex) so it starts at
    a junction if it contains one; else at its lexicographically smallest
    vertex (canonical start for rotation-invariant dedup)."""
    for i, pt in enumerate(pts):
        if pt in junctions:
            return pts[i:] + pts[:i]
    k = min(range(len(pts)), key=lambda i: pts[i])
    return pts[k:] + pts[:k]


def _cut_path(pts, closed, junctions):
    """Split a path's vertex list into arc vertex runs at junctions.
    Returns list of lists of coordinate tuples (each an arc, endpoints
    inclusive)."""
    if closed:
        ring = pts[:-1] if len(pts) > 1 and pts[0] == pts[-1] else pts
        ring = _rotate_ring(ring, junctions)
        pts = ring + [ring[0]]
    arcs = []
    start = 0
    for i in range(1, len(pts) - 1):
        if pts[i] in junctions:
            arcs.append(pts[start:i + 1])
            start = i
    arcs.append(pts[start:])
    return arcs


class TopologyBuilder:
    """Accumulates features; ``build()`` returns (ArcTable, shapes).

    shapes: one entry per feature; polygon/polyline shape is a list of
    parts, each part a list of signed arc ids (reference shape encoding,
    src/topology/mapshaper-topology.js:40-41). Null geometries stay None
    to preserve record alignment (src/commands/mapshaper-dissolve.js:36-41).
    """

    def __init__(self):
        self.features = []   # list of (geometry_type, list-of-parts) or None

    def add_feature(self, parts, closed=True):
        """parts: list of (n,2) coordinate arrays (rings or lines), or None."""
        if parts is None:
            self.features.append(None)
        else:
            self.features.append([
                {"coords": np.asarray(p, dtype=np.float64), "closed": closed}
                for p in parts])

    def build(self):
        all_paths = [p for f in self.features if f for p in f]
        junctions = find_junctions(all_paths)

        arc_ids = {}       # canonical coord tuple -> arc id
        arc_coords = []    # arc id -> list of coordinate tuples
        shapes = []

        def intern_arc(run):
            key_f = tuple(run)
            key_r = tuple(reversed(run))
            if key_f in arc_ids:
                return arc_ids[key_f]
            if key_r in arc_ids:
                return ~arc_ids[key_r]
            aid = len(arc_coords)
            arc_coords.append(run)
            arc_ids[key_f] = aid
            return aid

        for f in self.features:
            if f is None:
                shapes.append(None)
                continue
            parts_out = []
            for p in f:
                pts = [tuple(pt) for pt in p["coords"]]
                runs = _cut_path(pts, p["closed"], junctions)
                parts_out.append([intern_arc(run) for run in runs])
            shapes.append(parts_out)

        table = ArcTable.from_coord_lists(
            [np.asarray(a, dtype=np.float64) for a in arc_coords])
        return table, shapes


def build_topology(features, closed=True):
    """features: list of (list of (n,2) ring/line arrays) or None per feature."""
    b = TopologyBuilder()
    for parts in features:
        b.add_feature(parts, closed=closed)
    return b.build()
