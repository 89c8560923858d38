"""Neighbor-graph operators: -data-fill and -cluster (SURVEY.md §2.5).

Both ride on the shared-edge neighbor graph (the arc classifier of
§2.6: which ≤2 features use each border edge, plus the border length).

- ``neighbor_edges``: feature pairs + total shared-border length,
  computed as a distributed groupby on the quantized edge key (one
  shuffle of edge rows, never geometry).
- ``data_fill``: reference semantics (src/commands/mapshaper-data-fill.js:3-22):
  pass 1 fills an empty record from the single neighbor value with the
  longest shared border among neighbors that have values and border
  share >= 50%; then iterate multi-assignment until stable; optional
  island postprocess flips features whose dominant (>=50%) border
  neighbor disagrees.  Iteration is a driver loop over compact arrays
  (the GRAPH, not the features, lives on the driver — fine up to ~1e8
  edges; beyond that each round is itself a groupby).
- ``cluster_polygons``: greedy agglomeration by ascending centroid
  distance with merge recompute, like the reference's heap loop
  (src/commands/mapshaper-cluster.js:15-130) but with a sorted
  candidate heap instead of an O(n) scan per merge; ``group_by``
  constraint honored.  At scale this runs per cell partition.
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd


def _feature_edges(df: pd.DataFrame, key="feature_id",
                   x_col="x", y_col="y") -> pd.DataFrame:
    ks, fids, lens = [], [], []
    for row in df.to_dict("records"):
        x = np.asarray(row[x_col], dtype=np.float64)
        y = np.asarray(row[y_col], dtype=np.float64)
        for i in range(len(x) - 1):
            a = (round(x[i], 9), round(y[i], 9))
            b = (round(x[i + 1], 9), round(y[i + 1], 9))
            lo, hi = (a, b) if a <= b else (b, a)
            ks.append(f"{lo[0]}_{lo[1]}_{hi[0]}_{hi[1]}")
            fids.append(row[key])
            lens.append(float(np.hypot(x[i + 1] - x[i], y[i + 1] - y[i])))
    return pd.DataFrame({"edge_key": ks, "fid": fids, "len": lens})


def neighbor_edges(features_ds, key="feature_id", x_col="x", y_col="y"):
    """Dataset of features (ring coords in x/y columns) → pandas frame
    (fid_a, fid_b, border_len) summed over all shared edges."""
    edges = features_ds.map_batches(
        lambda df: _feature_edges(df, key, x_col, y_col),
        batch_format="pandas")

    def pair(df: pd.DataFrame) -> pd.DataFrame:
        fids = sorted(set(df["fid"]))
        if len(fids) != 2:
            return pd.DataFrame({"fid_a": [], "fid_b": [], "border_len": []})
        return pd.DataFrame({"fid_a": [fids[0]], "fid_b": [fids[1]],
                             "border_len": [float(df["len"].iloc[0])]})

    pairs = edges.groupby("edge_key").map_groups(pair,
                                                 batch_format="pandas") \
                 .to_pandas()
    if len(pairs) == 0:
        return pd.DataFrame({"fid_a": [], "fid_b": [], "border_len": []})
    return pairs.groupby(["fid_a", "fid_b"], as_index=False)["border_len"] \
                .sum()


def polygon_neighbor_edges(ds, key="feature_id"):
    """Layer-model polygon Dataset (rings_x/rings_y) → the neighbor
    frame ``neighbor_edges`` produces: rings flatten to one single-ring
    row each (same feature id), so shared-edge detection is unchanged."""
    from ..sources.layers import nz

    def flat(df: pd.DataFrame) -> pd.DataFrame:
        ks, xs, ys = [], [], []
        for k, rx, ry in zip(df[key].to_numpy(),
                             df["rings_x"].to_numpy(),
                             df["rings_y"].to_numpy()):
            for x, y in zip(nz(rx), nz(ry)):
                ks.append(k)
                xs.append(list(np.asarray(x, dtype=np.float64)))
                ys.append(list(np.asarray(y, dtype=np.float64)))
        return pd.DataFrame({key: ks, "x": xs, "y": ys})

    return neighbor_edges(ds.map_batches(flat, batch_format="pandas"),
                          key=key)


def data_fill(values: dict, edges: pd.DataFrame, postprocess=False):
    """values: fid -> value or None; edges: neighbor frame from
    ``neighbor_edges``.  Returns filled dict (reference iteration
    semantics: longest-border neighbor wins; repeat until stable)."""
    nbrs: dict = {}
    for r in edges.to_dict("records"):
        nbrs.setdefault(r["fid_a"], []).append((r["fid_b"],
                                                r["border_len"]))
        nbrs.setdefault(r["fid_b"], []).append((r["fid_a"],
                                                r["border_len"]))
    vals = dict(values)

    def border_vote(fid, min_pct=0.0, skip_empty=True):
        cand: dict = {}
        total = 0.0
        for n, ln in nbrs.get(fid, []):
            total += ln
            v = vals.get(n)
            if v is None and skip_empty:
                continue
            cand[v] = cand.get(v, 0.0) + ln
        if not cand or total == 0:
            return None
        best = max(cand, key=cand.get)
        if cand[best] / total < min_pct:
            return None
        return best

    changed = True
    while changed:
        changed = False
        for fid in list(vals):
            if vals[fid] is not None:
                continue
            v = border_vote(fid)
            if v is not None:
                vals[fid] = v
                changed = True
    if postprocess:
        for _ in range(2):  # second pass removes flipped donut-holes
            for fid in list(vals):
                v = border_vote(fid, min_pct=0.5)
                if v is not None and v != vals[fid]:
                    vals[fid] = v
    return vals


def cluster_polygons(centroids: pd.DataFrame, edges: pd.DataFrame,
                     pct: float, group_by: str | None = None,
                     max_width=None, max_height=None, max_area=None):
    """centroids: frame (fid, cx, cy[, area][, group][, __xmin..__ymax]);
    edges: neighbor frame.  Greedy merge of closest neighboring clusters
    until ``round(n * pct)`` merges happen (reference main loop).
    ``max_width``/``max_height``/``max_area`` veto any merge whose
    combined bounds/area would exceed the cap
    (getPolygonClusterCalculator's score<0,
    src/commands/mapshaper-cluster.js:191-206).  Returns
    fid -> cluster_id (sequential)."""
    has_bb = "__xmin" in centroids.columns
    items = {r["fid"]: {"ids": [r["fid"]],
                        "cx": r["cx"], "cy": r["cy"],
                        "area": r.get("area", 1.0),
                        "bb": ([r["__xmin"], r["__ymin"],
                                r["__xmax"], r["__ymax"]]
                               if has_bb else None),
                        "group": r.get("group") if group_by else None}
             for r in centroids.to_dict("records")}
    merges_left = int(round(len(items) * pct))

    def score(a, b):
        ia, ib = items[a], items[b]
        if max_area is not None and ia["area"] + ib["area"] > max_area:
            return -1.0
        if ia["bb"] and ib["bb"] and (max_width is not None
                                      or max_height is not None):
            w = max(ia["bb"][2], ib["bb"][2]) - min(ia["bb"][0],
                                                    ib["bb"][0])
            h = max(ia["bb"][3], ib["bb"][3]) - min(ia["bb"][1],
                                                    ib["bb"][1])
            if max_width is not None and w > max_width:
                return -1.0
            if max_height is not None and h > max_height:
                return -1.0
        return float(np.hypot(ia["cx"] - ib["cx"],
                              ia["cy"] - ib["cy"]))

    heap = []
    alive = {f: f for f in items}  # fid -> representative

    def find(f):
        while alive[f] != f:
            alive[f] = alive[alive[f]]
            f = alive[f]
        return f

    adj: dict = {}
    for r in edges.to_dict("records"):
        a, b = r["fid_a"], r["fid_b"]
        if a not in items or b not in items:
            continue
        if items[a]["group"] != items[b]["group"]:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
        s0 = score(a, b)
        if s0 >= 0:           # cap-violating pairs never enter
            heapq.heappush(heap, (s0, a, b))

    while merges_left > 0 and heap:
        s, a, b = heapq.heappop(heap)
        ra, rb = find(a), find(b)
        if ra == rb:
            continue
        fresh = score(ra, rb)
        if s != fresh:  # stale entry; re-push with fresh score
            if fresh >= 0:
                heapq.heappush(heap, (fresh, ra, rb))
            continue
        if s < 0:
            continue
        # merge rb into ra: area-weighted centroid
        ia, ib = items[ra], items[rb]
        wa, wb = ia["area"], ib["area"]
        tot = (wa + wb) or 1.0
        ia["cx"] = (ia["cx"] * wa + ib["cx"] * wb) / tot
        ia["cy"] = (ia["cy"] * wa + ib["cy"] * wb) / tot
        ia["area"] = wa + wb
        if ia["bb"] and ib["bb"]:
            ia["bb"] = [min(ia["bb"][0], ib["bb"][0]),
                        min(ia["bb"][1], ib["bb"][1]),
                        max(ia["bb"][2], ib["bb"][2]),
                        max(ia["bb"][3], ib["bb"][3])]
        ia["ids"].extend(ib["ids"])
        alive[rb] = ra
        nbrs = (adj.get(ra, set()) | adj.get(rb, set())) - {ra, rb}
        adj[ra] = set()
        for n in nbrs:
            rn = find(n)
            if rn != ra:
                adj[ra].add(rn)
                adj.setdefault(rn, set()).add(ra)
                sn = score(ra, rn)
                if sn >= 0:
                    heapq.heappush(heap, (sn, ra, rn))
        merges_left -= 1

    out = {}
    cluster_id = 0
    seen = {}
    for f in items:
        r = find(f)
        if r not in seen:
            seen[r] = cluster_id
            cluster_id += 1
        out[f] = seen[r]
    return out
