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
                _visit(pt, _neighbor_key(prev_pt, next_pt), seen, junctions)
        else:
            for i, pt in enumerate(pts):
                if i == 0 or i == n - 1:
                    junctions.add(pt)  # open-path endpoints are nodes
                prev_pt = pts[i - 1] if i > 0 else None
                next_pt = pts[i + 1] if i < n - 1 else None
                _visit(pt, _neighbor_key(prev_pt, next_pt), seen, junctions)
    return junctions


def _visit(pt, nkey, seen, junctions):
    if pt in seen:
        if seen[pt] != nkey:
            junctions.add(pt)
    else:
        seen[pt] = nkey


def _rotate_ring(pts, junctions):
    """Rotate a closed ring (without duplicate end vertex) so it starts
    at its first junction vertex.  A junction-FREE ring keeps its
    original start — the reference stores island rings as-is, and the
    start vertex is observable downstream (DP/VW recursion trees and
    hence simplify thresholds depend on it; verified threshold-exact
    against the built reference CLI on two_states' island rings)."""
    for i, pt in enumerate(pts):
        if pt in junctions:
            return pts[i:] + pts[:i]
    return pts


def _least_rotation(seq):
    """Booth's algorithm: index k such that seq[k:]+seq[:k] is the
    lexicographically smallest rotation.  O(n)."""
    s = seq + seq
    n = len(seq)
    f = [-1] * len(s)
    k = 0
    for j in range(1, len(s)):
        sj = s[j]
        i = f[j - k - 1]
        while i != -1 and sj != s[k + i + 1]:
            if sj < s[k + i + 1]:
                k = j - i - 1
            i = f[i]
        if sj != s[k + i + 1]:
            if sj < s[k]:
                k = j
            f[j - k] = -1
        else:
            f[j - k] = i + 1
    return k % n


def _canon_cycle(cyc):
    """Rotation-canonical form of a cycle (tuple without the closing
    duplicate): the lexicographically smallest rotation."""
    if not cyc:
        return cyc
    k = _least_rotation(list(cyc))
    return cyc[k:] + cyc[:k]


def _canon_bytes(cyc_ids):
    """Rotation-canonical byte key for an int64 id cycle array."""
    if len(cyc_ids) == 0:
        return b""
    k = _least_rotation(cyc_ids.tolist())
    return np.concatenate([cyc_ids[k:], cyc_ids[:k]]).tobytes()


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
        ring_ids = {}      # rotation-canonical cycle -> arc id
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

        def intern_free_ring(run):
            # junction-free ring (closed run, no node): the FIRST
            # occurrence is stored at its ORIGINAL start vertex; any
            # later CONGRUENT ring — same cycle at any rotation, either
            # direction — aliases to that arc (reference addRing scans
            # all rotations via findDuplicateArc,
            # src/topology/mapshaper-topology.js:207-228; keeping the
            # original start is observable in simplify thresholds)
            cyc = tuple(run[:-1])
            cf = _canon_cycle(cyc)
            cr = _canon_cycle(tuple(reversed(cyc)))
            if cf in ring_ids:
                return ring_ids[cf]
            if cr in ring_ids:
                return ~ring_ids[cr]
            aid = len(arc_coords)
            arc_coords.append(run)
            ring_ids[cf] = aid
            return aid

        for f in self.features:
            if f is None:
                shapes.append(None)
                continue
            parts_out = []
            for p in f:
                pts = [tuple(pt) for pt in p["coords"]]
                runs = _cut_path(pts, p["closed"], junctions)
                free_ring = (p["closed"] and len(runs) == 1 and
                             len(runs[0]) > 1 and
                             runs[0][0] == runs[0][-1] and
                             runs[0][0] not in junctions)
                if free_ring:
                    parts_out.append([intern_free_ring(runs[0])])
                else:
                    parts_out.append([intern_arc(run) for run in runs])
            shapes.append(parts_out)

        table = ArcTable.from_coord_lists(
            [np.asarray(a, dtype=np.float64) for a in arc_coords])
        return table, shapes


def _build_topology_loop(features, closed=True):
    """Reference-shaped per-vertex loop implementation (kept as the
    equivalence baseline for the vectorized path)."""
    b = TopologyBuilder()
    for parts in features:
        b.add_feature(parts, closed=closed)
    return b.build()


def build_topology(features, closed=True):
    """features: list of (list of (n,2) ring/line arrays) or None per
    feature → (ArcTable, shapes with signed arc ids).

    Vectorized: vertices intern to point ids with one np.unique over a
    structured (x, y) view (ids are LEXICOGRAPHIC, so id comparisons
    reproduce the loop implementation's coordinate-tuple comparisons
    exactly); junction detection groups neighbor-pair keys per point id
    with a lexsort; only the per-path run splitting stays in Python,
    operating on small int arrays.  Semantics identical to
    ``_build_topology_loop`` (randomized equivalence-tested)."""
    paths = []          # (feature_idx, coords(n,2), is_ring)
    for fi, parts in enumerate(features):
        if parts is None:
            continue
        fclosed = closed[fi] if isinstance(closed, (list, tuple,
                                                    np.ndarray)) \
            else closed
        for p in parts:
            c = np.asarray(p, dtype=np.float64)
            is_ring = bool(fclosed and len(c) > 1 and
                           c[0, 0] == c[-1, 0] and c[0, 1] == c[-1, 1])
            paths.append((fi, c, is_ring))
    if not paths:
        return ArcTable.from_coord_lists([]), \
            [None if f is None else [[] for _ in f] for f in features]

    flat = np.concatenate([c for _, c, _ in paths])
    view = np.ascontiguousarray(flat).view(
        [("x", np.float64), ("y", np.float64)]).ravel()
    uniq, inv = np.unique(view, return_inverse=True)
    n_uniq = len(uniq)
    M = np.int64(n_uniq + 1)

    # per-path id arrays + per-occurrence (point, neighbor-key) rows
    lens = np.array([len(c) for _, c, _ in paths])
    offs = np.concatenate([[0], np.cumsum(lens)])
    path_ids = [inv[offs[i]:offs[i + 1]].astype(np.int64)
                for i in range(len(paths))]

    # one GLOBAL neighbor pass (no per-path roll/alloc): concatenate the
    # occurrence sequences (rings without the closing duplicate), shift
    # once, then patch the per-path boundaries via the offset arrays
    ring_flags = np.array([is_ring for _, _, is_ring in paths])
    occ_list = [ids[:-1] if rf else ids
                for ids, rf in zip(path_ids, ring_flags)]
    occ_lens = np.array([len(o) for o in occ_list], dtype=np.int64)
    keep = occ_lens > 0
    occ_list = [o for o, k in zip(occ_list, keep) if k]
    occ_lens = occ_lens[keep]
    rf_k = ring_flags[keep]
    pt = np.concatenate(occ_list)
    starts = np.concatenate([[0], np.cumsum(occ_lens)[:-1]])
    ends = starts + occ_lens - 1
    prv = np.empty(len(pt), dtype=np.int64)
    nxt = np.empty(len(pt), dtype=np.int64)
    prv[1:] = pt[:-1]
    nxt[:-1] = pt[1:]
    prv[starts] = np.where(rf_k, pt[ends], -1)
    nxt[ends] = np.where(rf_k, pt[starts], -1)
    endpoint_junctions = [np.concatenate([pt[starts[~rf_k]],
                                          pt[ends[~rf_k]]])] \
        if (~rf_k).any() else []
    lo = np.minimum(prv, nxt)
    hi = np.maximum(prv, nxt)
    key = (lo + 1) * M + (hi + 1)
    order = np.lexsort((key, pt))
    ps, ks = pt[order], key[order]
    # a point is a junction when its occurrences carry >1 distinct key
    junction = np.zeros(n_uniq, dtype=bool)
    if len(ps):
        new_pt = np.concatenate([[True], np.diff(ps) != 0])
        new_key = np.concatenate([[True], np.diff(ks) != 0])
        # count distinct (pt, key) combos per pt: first row of each
        # combo where the pt is NOT new marks a second distinct key
        second_combo = new_key & ~new_pt
        junction[ps[second_combo]] = True
    for e in endpoint_junctions:
        junction[e] = True

    # cut paths at junctions + intern arcs (id-array keys, byte-hashed)
    arc_ids: dict = {}
    ring_keys: dict = {}
    arc_runs: list = []

    def intern(run_ids):
        kf = run_ids.tobytes()
        hit = arc_ids.get(kf)
        if hit is not None:
            return hit
        kr = run_ids[::-1].tobytes()
        hit = arc_ids.get(kr)
        if hit is not None:
            return ~hit
        aid = len(arc_runs)
        arc_runs.append(run_ids)
        arc_ids[kf] = aid
        return aid

    def intern_free_ring(run_ids):
        # junction-free ring: first occurrence stored at its ORIGINAL
        # start; later congruent rings (any rotation, either direction)
        # alias to it — reference addRing semantics
        # (src/topology/mapshaper-topology.js:207-228)
        cyc = run_ids[:-1]
        kf = _canon_bytes(cyc)
        hit = ring_keys.get(kf)
        if hit is not None:
            return hit
        kr = _canon_bytes(cyc[::-1])
        hit = ring_keys.get(kr)
        if hit is not None:
            return ~hit
        aid = len(arc_runs)
        arc_runs.append(run_ids)
        ring_keys[kf] = aid
        return aid

    def cut(ids, is_ring):
        if is_ring:
            r = ids[:-1]
            jpos = np.nonzero(junction[r])[0]
            if len(jpos):
                # rotate to the first junction; junction-free rings
                # keep their original start (see _rotate_ring)
                k = int(jpos[0])
                r = np.concatenate([r[k:], r[:k]])
                ids = np.concatenate([r, r[:1]])
        interior = np.nonzero(junction[ids[1:-1]])[0] + 1
        bounds = np.concatenate([[0], interior, [len(ids) - 1]])
        return [ids[bounds[i]:bounds[i + 1] + 1]
                for i in range(len(bounds) - 1)]

    shapes = []
    path_ring = [is_ring for _, _, is_ring in paths]
    path_feat = [fi for fi, _, _ in paths]
    per_feature: dict[int, list] = {}
    for (ids, is_ring, fi) in zip(path_ids, path_ring, path_feat):
        free_ring = (is_ring and len(ids) > 1 and
                     not junction[ids[:-1]].any())
        if free_ring:
            per_feature.setdefault(fi, []).append(
                [intern_free_ring(ids)])
            continue
        runs = cut(ids, is_ring)
        per_feature.setdefault(fi, []).append(
            [intern(r) for r in runs if len(r) >= 2])
    for fi, f in enumerate(features):
        shapes.append(None if f is None else per_feature.get(fi, []))

    ux = uniq["x"]
    uy = uniq["y"]
    if arc_runs:
        flat_ids = np.concatenate(arc_runs)
        nn = np.array([len(r) for r in arc_runs], dtype=np.int64)
        table = ArcTable(ux[flat_ids], uy[flat_ids], nn)
    else:
        table = ArcTable.from_coord_lists([])
    return table, shapes
