"""Segment intersection detection + arc cutting — the
``addIntersectionCuts`` substrate every boolean op rides on
(reference: src/paths/mapshaper-path-division.js:20-54 cut/splice;
src/paths/mapshaper-segment-intersection.js:18-133 stripe sweep;
src/geom/mapshaper-segment-geom.js:17-112 intersection semantics:
crossings inserted, pure endpoint-touches filtered out).

Distributed shape (SURVEY.md §2.6 addIntersectionCuts row): stripes ≈
partitions — segments bucketed by y-stripe (count =
ceil(yrange/avgSegLen/20), the reference's skew-adaptive formula),
each stripe swept independently after an x-sort, duplicates from
stripe-spanning segments deduped.  ``find_intersections_ds`` runs the
stripes as a Ray groupby; the in-process variant serves the per-cell
kernels.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..geom.kernels import segment_intersection
from .arcs import ArcTable


def _collect_segments(arcs: ArcTable):
    """All segments as flat arrays (arc_id, seg_idx, x1, y1, x2, y2)."""
    aid, sid, x1, y1, x2, y2 = [], [], [], [], [], []
    for a in range(len(arcs.nn)):
        i0 = arcs.ii[a]
        n = arcs.nn[a]
        if n < 2:
            continue
        xs = arcs.xx[i0:i0 + n]
        ys = arcs.yy[i0:i0 + n]
        aid.append(np.full(n - 1, a, dtype=np.int64))
        sid.append(np.arange(n - 1, dtype=np.int64))
        x1.append(xs[:-1]); y1.append(ys[:-1])
        x2.append(xs[1:]); y2.append(ys[1:])
    if not aid:
        z = np.empty(0)
        return (z.astype(np.int64), z.astype(np.int64), z, z, z, z)
    return (np.concatenate(aid), np.concatenate(sid),
            np.concatenate(x1), np.concatenate(y1),
            np.concatenate(x2), np.concatenate(y2))


def stripe_count(arcs: ArcTable) -> int:
    """ceil(yrange / avgSegLen / 20) — reference formula."""
    _, _, x1, y1, x2, y2 = _collect_segments(arcs)
    if len(x1) == 0:
        return 1
    yr = float(arcs.yy.max() - arcs.yy.min())
    seg = float(np.mean(np.abs(y2 - y1)))
    if seg <= 0 or yr <= 0:
        return 1
    return max(1, int(np.ceil(yr / seg / 20)))


def _sweep(seg_idx, x1, y1, x2, y2, aid, sid):
    """x-sorted sweep over one stripe's segments; returns crossing rows
    (ia, sa, ib, sb, x, y) with (arc, seg) pairs ordered ia<=ib."""
    xmin = np.minimum(x1[seg_idx], x2[seg_idx])
    order = seg_idx[np.argsort(xmin, kind="stable")]
    xmax_o = np.maximum(x1[order], x2[order])
    xmin_o = np.minimum(x1[order], x2[order])
    hits = []
    n = len(order)
    for i in range(n):
        si = order[i]
        for j in range(i + 1, n):
            sj = order[j]
            if xmin_o[j] > xmax_o[i]:
                break
            if aid[si] == aid[sj] and abs(sid[si] - sid[sj]) <= 1:
                continue  # adjacent segments of one arc share a vertex
            p = segment_intersection(x1[si], y1[si], x2[si], y2[si],
                                     x1[sj], y1[sj], x2[sj], y2[sj])
            if p is None:
                continue
            # reference filters hits where both segments only touch at
            # an endpoint (endpointHit -> null): that's a node, not a
            # crossing (src/geom/mapshaper-segment-geom.js:24-27)
            at_end_i = (p[0] == x1[si] and p[1] == y1[si]) or \
                       (p[0] == x2[si] and p[1] == y2[si])
            at_end_j = (p[0] == x1[sj] and p[1] == y1[sj]) or \
                       (p[0] == x2[sj] and p[1] == y2[sj])
            if at_end_i and at_end_j:
                continue
            a, b = (si, sj) if (aid[si], sid[si]) <= (aid[sj], sid[sj]) \
                else (sj, si)
            hits.append((aid[a], sid[a], aid[b], sid[b],
                         float(p[0]), float(p[1])))
    return hits


def find_intersections(arcs: ArcTable) -> pd.DataFrame:
    """All segment crossings (endpoint-only touches excluded) as a
    DataFrame (arc_a, seg_a, arc_b, seg_b, x, y)."""
    aid, sid, x1, y1, x2, y2 = _collect_segments(arcs)
    if len(aid) == 0:
        return pd.DataFrame(columns=["arc_a", "seg_a", "arc_b", "seg_b",
                                     "x", "y"])
    ns = stripe_count(arcs)
    ymin = float(arcs.yy.min())
    yr = float(arcs.yy.max() - arcs.yy.min()) or 1.0
    s_lo = np.clip(((np.minimum(y1, y2) - ymin) / yr * ns).astype(int),
                   0, ns - 1)
    s_hi = np.clip(((np.maximum(y1, y2) - ymin) / yr * ns).astype(int),
                   0, ns - 1)
    rows = []
    for s in range(ns):
        sel = np.nonzero((s_lo <= s) & (s_hi >= s))[0]
        if len(sel) > 1:
            rows.extend(_sweep(sel, x1, y1, x2, y2, aid, sid))
    if not rows:
        return pd.DataFrame(columns=["arc_a", "seg_a", "arc_b", "seg_b",
                                     "x", "y"])
    df = pd.DataFrame(rows, columns=["arc_a", "seg_a", "arc_b", "seg_b",
                                     "x", "y"])
    return df.drop_duplicates().reset_index(drop=True)


def insert_cuts(arcs: ArcTable, hits: pd.DataFrame):
    """Split arcs at crossing points → (new ArcTable, remap) where
    remap[old_arc] = list of new arc ids in order (traverse forward).
    Crossing vertices are inserted at their parametric position along
    the segment; identical cut points deduped
    (src/paths/mapshaper-path-division.js:151-231)."""
    cut_map: dict[int, list[tuple[int, float, float, float]]] = {}
    for side in ("a", "b"):
        for r in hits.to_dict("records"):
            cut_map.setdefault(int(r[f"arc_{side}"]), []).append(
                (int(r[f"seg_{side}"]), r["x"], r["y"], 0.0))

    new_coords = []
    remap: dict[int, list[int]] = {}
    for a in range(len(arcs.nn)):
        i0 = arcs.ii[a]
        n = arcs.nn[a]
        xs = arcs.xx[i0:i0 + n]
        ys = arcs.yy[i0:i0 + n]
        cuts = cut_map.get(a, [])
        # order cuts by (segment, param t along segment)
        keyed = []
        for seg, cx, cy, _ in cuts:
            dx = xs[seg + 1] - xs[seg]
            dy = ys[seg + 1] - ys[seg]
            t = ((cx - xs[seg]) * dx + (cy - ys[seg]) * dy) / \
                ((dx * dx + dy * dy) or 1.0)
            keyed.append((seg, float(np.clip(t, 0.0, 1.0)), cx, cy))
        keyed.sort()
        # build vertex list with cut points inserted; split positions
        out_x = [xs[0]]
        out_y = [ys[0]]
        split_at = []
        ki = 0
        for seg in range(n - 1):
            while ki < len(keyed) and keyed[ki][0] == seg:
                _, t, cx, cy = keyed[ki]
                ki += 1
                # exact-equality dedup: the crossing point is computed
                # deterministically, and a RELATIVE tolerance merges
                # distinct cuts ~10 units apart at 1e6-scale projected
                # coords, silently dropping topology cuts
                if cx == out_x[-1] and cy == out_y[-1]:
                    split_at.append(len(out_x) - 1)
                    continue
                out_x.append(cx)
                out_y.append(cy)
                split_at.append(len(out_x) - 1)
            if not (xs[seg + 1] == out_x[-1] and
                    ys[seg + 1] == out_y[-1]):
                out_x.append(xs[seg + 1])
                out_y.append(ys[seg + 1])
        # interior split positions only, deduped, ordered
        split_at = sorted({s for s in split_at if 0 < s < len(out_x) - 1})
        pieces = []
        prev = 0
        for s in split_at:
            pieces.append((out_x[prev:s + 1], out_y[prev:s + 1]))
            prev = s
        pieces.append((out_x[prev:], out_y[prev:]))
        ids = []
        for px, py in pieces:
            if len(px) < 2:
                continue
            ids.append(len(new_coords))
            new_coords.append(np.stack([px, py], axis=1))
        remap[a] = ids
    table = ArcTable.from_coord_lists(new_coords)
    return table, remap


def add_intersection_cuts(arcs: ArcTable):
    """find + insert in one call; returns (new_arcs, remap, n_hits)."""
    hits = find_intersections(arcs)
    if len(hits) == 0:
        return arcs, {a: [a] for a in range(len(arcs.nn))}, 0
    table, remap = insert_cuts(arcs, hits)
    return table, remap, len(hits)


def find_intersections_ds(segments_ds, ymin: float, yrange: float,
                          n_stripes: int):
    """Distributed stripe sweep: ``segments_ds`` rows = (arc_id, seg_id,
    x1, y1, x2, y2); each segment emitted to every stripe it spans, one
    groupby on stripe id, per-stripe sweep in map_groups, dedup after.
    Returns a Dataset of crossings."""
    import pyarrow as pa

    def emit(t: pa.Table) -> pa.Table:
        # Arrow-native stripe replication (SURVEY §7.0): numpy views of
        # the y columns, pa.Table.take per stripe — no pandas block
        # conversion on the widest intermediate of the pipeline
        y1 = t["y1"].to_numpy()
        y2 = t["y2"].to_numpy()
        lo = np.clip(((np.minimum(y1, y2) - ymin) /
                      (yrange or 1.0) * n_stripes).astype(int),
                     0, n_stripes - 1)
        hi = np.clip(((np.maximum(y1, y2) - ymin) /
                      (yrange or 1.0) * n_stripes).astype(int),
                     0, n_stripes - 1)
        parts = []
        for s in range(n_stripes):
            idx = np.flatnonzero((lo <= s) & (hi >= s))
            if len(idx):
                parts.append(t.take(idx).append_column(
                    "stripe", pa.array(np.full(len(idx), s,
                                               dtype=np.int64))))
        return pa.concat_tables(parts) if parts else \
            t.slice(0, 0).append_column("stripe",
                                        pa.array([], pa.int64()))

    striped = segments_ds.map_batches(emit, batch_format="pyarrow")

    def sweep_group(df: pd.DataFrame) -> pd.DataFrame:
        idx = np.arange(len(df))
        hits = _sweep(idx, df["x1"].to_numpy(), df["y1"].to_numpy(),
                      df["x2"].to_numpy(), df["y2"].to_numpy(),
                      df["arc_id"].to_numpy(), df["seg_id"].to_numpy())
        return pd.DataFrame(hits, columns=["arc_a", "seg_a", "arc_b",
                                           "seg_b", "x", "y"])

    out = striped.groupby("stripe").map_groups(sweep_group,
                                               batch_format="pandas")

    # global dedup: a segment pair spanning k stripes is found k times,
    # in k different blocks.  Coarse bucket-hash shuffle + one
    # vectorized drop_duplicates per partition — NOT one map_groups per
    # crossing (the per-group overhead pattern measured at 8x in
    # ops/dedup.py)
    def pair_bucket(t: pa.Table) -> pa.Table:
        h = (t["arc_a"].to_numpy().astype(np.uint64)
             * np.uint64(0x9E3779B97F4A7C15)
             ^ t["seg_a"].to_numpy().astype(np.uint64)
             * np.uint64(0xC2B2AE3D27D4EB4F)
             ^ t["arc_b"].to_numpy().astype(np.uint64)
             * np.uint64(0x165667B19E3779F9)
             ^ t["seg_b"].to_numpy().astype(np.uint64))
        return t.append_column("__dp", pa.array(
            (h % np.uint64(64)).astype(np.int64)))

    def dedupe_part(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["arc_a", "seg_a", "arc_b",
                                   "seg_b"]).drop(columns="__dp")

    return out.map_batches(pair_bucket, batch_format="pyarrow") \
        .groupby("__dp").map_groups(dedupe_part, batch_format="pandas")
