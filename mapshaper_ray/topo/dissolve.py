"""Polygon/polyline dissolve and shared-edge classification over shared arcs.

Dissolve semantics follow the reference's arc-cancellation algorithm
(``dissolvePolygonGeometry``, src/dissolve/mapshaper-polygon-dissolve.js:3-218):
within a dissolve group, an arc traversed once forward and once backward by
two member rings is an interior border and cancels; surviving directed arcs
are stitched end-to-end into the dissolved rings.  Null shapes are kept
aligned (src/commands/mapshaper-dissolve.js:36-41).

``classify_arcs`` is the arc-classifier primitive behind ``-innerlines`` /
``-lines`` (src/commands/mapshaper-innerlines.js:3-44 +
src/topology/mapshaper-arc-classifier.js:4-46): each arc keyed by the <=2
features using it.
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np

from .arcs import ArcTable, abs_id


def _endpoint_nodes(arcs: ArcTable):
    """Map arc id -> (start_node, end_node).  Node keys are INTEGER ids
    interned with one np.unique over the exact endpoint coordinates
    (same coincidence semantics as coordinate-tuple keys, without
    per-arc tuple construction/hashing)."""
    n = len(arcs)
    if n == 0:
        return []
    i0 = arcs.ii
    ie = i0 + arcs.nn - 1
    px = np.concatenate([arcs.xx[i0], arcs.xx[ie]])
    py = np.concatenate([arcs.yy[i0], arcs.yy[ie]])
    pts = np.ascontiguousarray(np.stack([px, py], axis=1)).view(
        [("x", np.float64), ("y", np.float64)]).ravel()
    _, inv = np.unique(pts, return_inverse=True)
    s = inv[:n].tolist()
    e = inv[n:].tolist()
    return list(zip(s, e))


def _directed_ends(ends, signed_id):
    i = abs_id(signed_id)
    s, e = ends[i]
    return (s, e) if signed_id >= 0 else (e, s)


def dissolve_shapes(shapes, group_ids, arcs: ArcTable):
    """Dissolve polygon shapes by group.

    shapes: per-feature list of parts (lists of signed arc ids) or None.
    group_ids: per-feature hashable group key (None features are skipped).
    Returns dict group_id -> dissolved shape (list of rings of signed arc
    ids); groups whose geometry fully cancels map to None.
    """
    group_rings = defaultdict(list)  # group -> original rings, input order
    for shp, gid in zip(shapes, group_ids):
        if shp is None:
            continue
        for part in shp:
            if part:
                group_rings[gid].append(list(part))
    return {gid: (_dissolve_group(rings) or None)
            for gid, rings in group_rings.items()}


def _dissolve_group(rings):
    """Reference second pass (dissolveSecondPass,
    src/dissolve/mapshaper-polygon-dissolve.js:112-218): build each
    output ring by walking the ORIGINAL rings in stored order and, when
    the next arc instance has an unused opposite-direction twin in the
    group (a cancelled interior border), jumping to the twin's ring —
    single-arc twin rings (island inclusions) are skipped in place.
    Unlike node-based stitching, this splits pinched loops exactly
    where the reference does (verified ring-for-ring against the built
    reference CLI on its six_counties fixture)."""
    by_sid = defaultdict(list)          # signed id -> segments, global order
    seg_order = []
    for r, ring in enumerate(rings):
        for i, sid in enumerate(ring):
            by_sid[sid].append((r, i))
            seg_order.append((r, i))
    used = set()

    def find_twin(seg):
        sid = rings[seg[0]][seg[1]]
        for t in by_sid.get(~sid, ()):
            if t != seg and t not in used:
                return t
        return None

    def get_next(seg, depth=0):
        r, i = seg
        ring = rings[r]
        nxt = (r, (i + 1) % len(ring))
        if nxt != seg and depth <= 100:
            match = find_twin(nxt)
            if match is not None:
                if len(rings[match[0]]) == 1:
                    # island inclusion: continue traversing seg's ring
                    nxt = get_next(nxt, depth + 1)
                else:
                    nxt = get_next(match, depth + 1)
        return nxt

    out_rings = []
    for seg in seg_order:
        if seg in used or find_twin(seg) is not None:
            continue
        ring_ids = [rings[seg[0]][seg[1]]]
        used.add(seg)
        guard = len(seg_order) + 1
        nxt = get_next(seg)
        while nxt != seg and guard > 0:
            ring_ids.append(rings[nxt[0]][nxt[1]])
            used.add(nxt)
            nxt = get_next(nxt)
            guard -= 1
        out_rings.append(ring_ids)
    return out_rings


def dissolve_polylines(shapes, group_ids, arcs: ArcTable):
    """Polyline dissolve: merge chains of arcs meeting at degree-2 nodes
    within a group (src/dissolve/mapshaper-polyline-dissolve.js:7-76)."""
    ends = _endpoint_nodes(arcs)
    group_arcs = defaultdict(list)
    for shp, gid in zip(shapes, group_ids):
        if shp is None:
            continue
        for part in shp:
            group_arcs[gid].extend(part)
    out = {}
    for gid, segs in group_arcs.items():
        # node degree within the group
        deg = defaultdict(int)
        for sid in segs:
            s, e = _directed_ends(ends, sid)
            deg[s] += 1
            deg[e] += 1
        # register BOTH traversal directions so chains continue through
        # head-to-head / tail-to-tail meetings (the reference walks the
        # NodeCollection's connected arcs in either direction)
        by_node = defaultdict(list)
        for sid in segs:
            s, e = _directed_ends(ends, sid)
            by_node[s].append(sid)
            by_node[e].append(~sid)
        used = set()  # abs arc ids
        chains = []
        # start chains at nodes with degree != 2 (true endpoints or
        # junctions); an arc whose given direction starts mid-chain
        # walks from its other endpoint, reversed
        ordered = sorted(segs, key=abs_id)
        for sid in ordered:
            if abs_id(sid) in used:
                continue
            s, e = _directed_ends(ends, sid)
            if deg[s] != 2:
                chains.append(_walk_chain(sid, by_node, deg, used, ends))
            elif deg[e] != 2:
                chains.append(_walk_chain(~sid, by_node, deg, used, ends))
        for sid in ordered:  # remaining = pure loops
            if abs_id(sid) not in used:
                chains.append(_walk_chain(sid, by_node, deg, used, ends))
        out[gid] = chains or None
    return out


def _walk_chain(sid, by_node, deg, used, ends):
    chain = [sid]
    used.add(abs_id(sid))
    _, cur = _directed_ends(ends, sid)
    while deg[cur] == 2:
        nxt = None
        for cand in by_node.get(cur, []):
            if abs_id(cand) not in used:
                nxt = cand
                break
        if nxt is None:
            break
        chain.append(nxt)
        used.add(abs_id(nxt))
        _, cur = _directed_ends(ends, nxt)
    return chain


def classify_arcs(shapes):
    """Arc id -> sorted list of feature ids using it (<=2 for clean
    polygon topology).  Basis of -innerlines/-lines
    (src/topology/mapshaper-arc-classifier.js:4-46)."""
    users = defaultdict(set)
    for fid, shp in enumerate(shapes):
        if shp is None:
            continue
        for part in shp:
            for sid in part:
                users[abs_id(sid)].add(fid)
    return {aid: sorted(fids) for aid, fids in users.items()}


def innerlines(shapes):
    """Arc ids used by >= 2 features (shared borders), sorted.
    (api.innerlines, src/commands/mapshaper-innerlines.js:3-16)"""
    return sorted(a for a, u in classify_arcs(shapes).items() if len(u) >= 2)


def lines(shapes):
    """All arcs classified: list of (arc_id, type) with type 'inner' or
    'outer' (api.lines outputs inner + outer layers,
    src/commands/mapshaper-innerlines.js:18-44)."""
    return [(a, "inner" if len(u) >= 2 else "outer")
            for a, u in sorted(classify_arcs(shapes).items())]
