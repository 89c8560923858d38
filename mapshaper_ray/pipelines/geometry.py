"""Distributed geometry pipelines: simplify over an arcs Dataset, and
dissolve-by-key via groupby + per-group topology build.

- ``simplify_pipeline``: synthesizes a deterministic arcs table (one arc
  per document id — vertices are a pure function of doc_id), computes
  VW/DP thresholds per arc inside ``map_batches`` (arcs are independent
  units — embarrassingly parallel, SURVEY.md §2.6 -simplify row), resolves
  the global retained-percentage threshold with the reference's exact
  rank semantics, and reports per-arc retained vertex counts.

- ``dissolve_pipeline``: synthesizes a deterministic grid-mesh polygon
  layer, shuffles features by dissolve key, and per group builds shared-
  arc topology + arc-cancellation dissolve (groupby → map_groups is the
  distributed dissolve shape; borders interior to a group cancel, group
  outlines survive).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..geom.kernels import planar_ring_area
from ..geom.simplify import (dp_thresholds, removable_thresholds,
                             threshold_by_pct, visvalingam_thresholds)
from ..topo.build import build_topology


# ---------------------------------------------------------------------------
# arcs synthesis + simplify

def synth_arcs(sf_dir: str, id_col="doc_id"):
    """One deterministic wiggly arc per document id."""
    import ray.data as rd
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def make(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for did in df["doc_id"]:
            n = 12 + (did * 7919) % 40
            t = np.arange(n, dtype=np.float64)
            x = t + 0.3 * np.sin(t * (1 + (did % 13) / 7.0))
            y = ((did % 17) / 3.0) * np.cos(t / 2.0) + 0.05 * np.sin(t * 3.1)
            out.append({"arc_id": did, "x": x, "y": y})
        return pd.DataFrame(out)

    return ds.map_batches(make, batch_format="pandas")


def simplify_pipeline(sf_dir: str, pct: float = 0.5, method="visvalingam"):
    """Per-arc thresholds (map_batches) → exact global pct→interval →
    per-arc retained counts.  Returns a Dataset (arc_id, n_in, n_out)."""
    arcs = synth_arcs(sf_dir)
    fn = visvalingam_thresholds if method == "visvalingam" else dp_thresholds

    def thresh(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["z"] = [fn(x, y) for x, y in zip(df["x"], df["y"])]
        return df

    # checkpoint the expensive threshold stage once (spillable blocks in
    # the object store) — the rank passes and the final retained count
    # both read it without recomputing
    with_z = arcs.map_batches(thresh, batch_format="pandas").materialize()
    # exact global rank, DISTRIBUTED (src/paths/mapshaper-arcs.js:541-558
    # semantics): histogram-narrowing selection over the flat removable-
    # threshold column — the driver sees bin counts and one candidate
    # bin, never the column (ops/rank.py)
    from ..ops.rank import threshold_by_pct_ds
    flat_z = with_z.map_batches(
        lambda df: pd.DataFrame(
            {"z": np.concatenate([removable_thresholds(z) for z in df["z"]])
             if len(df) else np.empty(0)}),
        batch_format="pandas")
    zlimit = threshold_by_pct_ds(flat_z, "z", pct)

    def retained(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "arc_id": df["arc_id"].to_numpy(),
            "n_in": [len(x) for x in df["x"]],
            "n_out": [int(np.count_nonzero(np.asarray(z) >= zlimit))
                      for z in df["z"]],
        })

    return with_z.map_batches(retained, batch_format="pandas")


# ---------------------------------------------------------------------------
# mesh synthesis + distributed dissolve

def synth_mesh(sf_dir: str, grid=24):
    """grid x grid unit squares, group = deterministic function of cell."""
    import ray.data as rd
    ds = rd.range(grid * grid)

    def make(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["id"].to_numpy()
        rows = []
        for i in ids:
            r, c = divmod(int(i), grid)
            x0, y0 = float(c), float(r)
            ring_x = np.array([x0, x0 + 1, x0 + 1, x0, x0])
            ring_y = np.array([y0, y0, y0 + 1, y0 + 1, y0])
            rows.append({"feature_id": int(i),
                         "grp": f"g{(i * 2654435761) % 5}",
                         "x": ring_x, "y": ring_y})
        return pd.DataFrame(rows)

    return ds.map_batches(make, batch_format="pandas")


def dissolve_by_key(features_ds, key="grp"):
    """groupby(key) → per-group shared-arc topology + dissolve-all.
    Emits per-group ring stats (ring count, total perimeter, total area).

    Oversized groups would be split hierarchically by cell before this
    stage (SURVEY.md §7.4); the per-group kernel is the reference
    algorithm (arc cancellation + ring stitch)."""
    from ..topo.dissolve import dissolve_shapes

    def melt(df: pd.DataFrame) -> pd.DataFrame:
        feats = [[np.stack([x, y], axis=1)] for x, y in zip(df["x"], df["y"])]
        arcs, shapes = build_topology(feats)
        gid = str(df[key].iloc[0])
        rings = dissolve_shapes(shapes, [gid] * len(shapes), arcs)[gid]
        if rings is None:
            return pd.DataFrame([{key: gid, "n_rings": 0,
                                  "perimeter": 0.0, "area": 0.0}])
        per = 0.0
        area = 0.0  # signed sum: holes (opposite winding) subtract
        for ring in rings:
            x, y = arcs.path_coords(ring)
            cx = np.r_[x, x[0]]
            cy = np.r_[y, y[0]]
            per += float(np.sum(np.hypot(np.diff(cx), np.diff(cy))))
            area += planar_ring_area(cx, cy)
        return pd.DataFrame([{key: gid, "n_rings": len(rings),
                              "perimeter": round(per, 6),
                              "area": round(abs(area), 6)}])

    return features_ds.groupby(key).map_groups(melt, batch_format="pandas")


def dissolve_pipeline(sf_dir: str, grid=24):
    return dissolve_by_key(synth_mesh(sf_dir, grid), key="grp")


# ---------------------------------------------------------------------------
# distributed innerlines / lines (shared-edge classification)

def innerlines_by_key(features_ds, key="grp", inner_only=True):
    """-innerlines / -lines (src/commands/mapshaper-innerlines.js:3,18):
    classify each edge by the pair of features using it.

    Distributed arc-classifier (SURVEY.md §2.6 innerlines row): one
    map_batches emits (edge_key, feature_id, group) per polygon edge —
    the quantized endpoint pair IS the abs arc id — then a groupby on
    edge_key yields each edge's ≤2 adjacent features.  Edges whose two
    sides carry different group values are inner boundaries; ``lines``
    additionally returns outer edges (single-sided)."""
    def edges(df: pd.DataFrame) -> pd.DataFrame:
        # vectorized edge emission: flatten all rings, drop each ring's
        # closing position, quantize endpoints to int64 (1e-9 grid) and
        # canonicalize (lo endpoint first) — no per-row Python loop
        arrs_x = [np.asarray(v, dtype=np.float64) for v in df["x"]]
        arrs_y = [np.asarray(v, dtype=np.float64) for v in df["y"]]
        lens = np.array([len(a) for a in arrs_x], dtype=np.int64)
        if lens.sum() == 0:
            return pd.DataFrame({"qx1": [], "qy1": [], "qx2": [], "qy2": [],
                                 "feature_id": [], key: []})
        fx = np.concatenate(arrs_x)
        fy = np.concatenate(arrs_y)
        idx = np.arange(len(fx))
        mask = np.ones(len(fx), dtype=bool)
        mask[np.cumsum(lens) - 1] = False  # last vertex of each ring
        ai = idx[mask]
        q = 1e9
        ax = np.round(fx[ai] * q).astype(np.int64)
        ay = np.round(fy[ai] * q).astype(np.int64)
        bx = np.round(fx[ai + 1] * q).astype(np.int64)
        by = np.round(fy[ai + 1] * q).astype(np.int64)
        swap = (ax > bx) | ((ax == bx) & (ay > by))
        qx1 = np.where(swap, bx, ax)
        qy1 = np.where(swap, by, ay)
        qx2 = np.where(swap, ax, bx)
        qy2 = np.where(swap, ay, by)
        n_edges = lens - 1
        return pd.DataFrame({
            "qx1": qx1, "qy1": qy1, "qx2": qx2, "qy2": qy2,
            "feature_id": np.repeat(df["feature_id"].to_numpy(), n_edges),
            key: np.repeat(df[key].to_numpy(), n_edges)})

    edge_ds = features_ds.map_batches(edges, batch_format="pandas")

    # coarse bucket-hash shuffle + vectorized in-partition classify —
    # NOT groupby(edge_key).map_groups: one tiny map_groups per polygon
    # edge is pure per-group overhead (the pattern measured at 8× and
    # fixed for MinHash bands in ops/dedup.py).  A bucket holds many
    # edges; all edges sharing a key land in one bucket (hash of the
    # exact composite key), where a lexsort + boundary diff classifies
    # every group without a Python loop.
    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        h = (df["qx1"].to_numpy(np.int64).astype(np.uint64)
             * np.uint64(0x9E3779B97F4A7C15)
             ^ df["qy1"].to_numpy(np.int64).astype(np.uint64)
             * np.uint64(0xC2B2AE3D27D4EB4F)
             ^ df["qx2"].to_numpy(np.int64).astype(np.uint64)
             * np.uint64(0x165667B19E3779F9)
             ^ df["qy2"].to_numpy(np.int64).astype(np.uint64)
             * np.uint64(0x27D4EB2F165667C5))
        df["__b"] = (h % np.uint64(64)).astype(np.int64)
        return df

    def classify_part(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"edge_key": [], "kind": [], "pair": []})
        # factorize group values to RANK ints before the lexsort —
        # np.lexsort over an object string column costs 10x the whole
        # classifier at 10^6 edges
        codes, uniq = pd.factorize(df[key].astype(str), sort=True)
        order = np.lexsort((codes, df["qy2"].to_numpy(),
                            df["qx2"].to_numpy(),
                            df["qy1"].to_numpy(), df["qx1"].to_numpy()))
        qx1 = df["qx1"].to_numpy()[order]
        qy1 = df["qy1"].to_numpy()[order]
        qx2 = df["qx2"].to_numpy()[order]
        qy2 = df["qy2"].to_numpy()[order]
        grp = codes[order]
        new = np.ones(len(df), dtype=bool)
        new[1:] = ((qx1[1:] != qx1[:-1]) | (qy1[1:] != qy1[:-1])
                   | (qx2[1:] != qx2[:-1]) | (qy2[1:] != qy2[:-1]))
        starts = np.flatnonzero(new)
        ends = np.r_[starts[1:], len(df)]
        sizes = ends - starts
        lo = grp[starts]        # min group (codes rank-sorted in edge)
        # second DISTINCT group value within each edge group: first
        # position where grp differs from the group's first value
        diff = np.zeros(len(df), dtype=bool)
        diff[1:] = (grp[1:] != grp[:-1]) & ~new[1:]
        second = np.full(len(starts), -1, dtype=np.int64)
        d_idx = np.flatnonzero(diff)
        if len(d_idx):
            owner = np.searchsorted(starts, d_idx, side="right") - 1
            # FIRST distinct-change position per group (owner is
            # nondecreasing, so unique's first-occurrence index is it)
            ow_u, first_pos = np.unique(owner, return_index=True)
            second[ow_u] = grp[d_idx[first_pos]]
        one_grp = second < 0
        kind = np.where(sizes == 1, "outer",
                        np.where(one_grp, "shared_same", "inner"))
        un = uniq.to_numpy() if hasattr(uniq, "to_numpy") \
            else np.asarray(uniq, dtype=object)
        lo_s = un[lo].astype(object)
        sec_s = un[np.where(second < 0, 0, second)].astype(object)
        pair = np.where(sizes == 1, lo_s + "-",
                        np.where(one_grp, lo_s + "-" + lo_s,
                                 lo_s + "-" + sec_s))
        def s(a):   # numpy '<U' arrays don't support the + operator
            return a.astype(str).astype(object)
        ek = (s(qx1[starts]) + "_" + s(qy1[starts])
              + "_" + s(qx2[starts]) + "_" + s(qy2[starts]))
        return pd.DataFrame({"edge_key": ek, "kind": kind, "pair": pair})

    classified = edge_ds.map_batches(bucket, batch_format="pandas") \
        .groupby("__b").map_groups(classify_part, batch_format="pandas")
    if inner_only:
        def keep(df: pd.DataFrame) -> pd.DataFrame:
            return df[df["kind"] == "inner"]
        classified = classified.map_batches(keep, batch_format="pandas")
    return classified


def synth_overlap_mesh(sf_dir: str, grid=8):
    """Deterministic OVERLAPPING squares (each shifted by 0.5 into its
    right neighbor) — dissolve2 input where plain dissolve would double
    count."""
    import ray.data as rd
    ds = rd.range(grid * grid)

    def make(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for i in df["id"].to_numpy():
            r, c = divmod(int(i), grid)
            x0 = c * 1.0
            y0 = r * 1.0
            w = 1.5 if c % 2 == 0 else 1.0  # even columns overlap right
            rows.append({"feature_id": int(i),
                         "grp": f"g{(i * 2654435761) % 3}",
                         "x": [x0, x0 + w, x0 + w, x0, x0],
                         "y": [y0, y0, y0 + 1, y0 + 1, y0]})
        return pd.DataFrame(rows)
    return ds.map_batches(make, batch_format="pandas")


def dissolve2_pipeline(sf_dir: str, grid=8, cell: float = 4.0):
    """Distributed dissolve2: features shuffled by spatial cell (each
    feature assigned to the cell of its bbox center; cell size chosen so
    overlap chains stay cell-local for this mesh), per-cell mosaic +
    tile assignment + per-key dissolve in map_groups, then a per-key
    roll-up of (area, n_tiles) across cells.

    Partitioning assumption (documented per SURVEY.md custom-operator
    rule): overlaps never span cell borders; for general input, cut
    features at cell boundaries first (clip_bbox) — the per-cell kernel
    is unchanged."""
    from ..ops.relational import groupby_agg
    from ..topo.mosaic import dissolve2
    feats = synth_overlap_mesh(sf_dir, grid)

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        cx = np.array([(min(x) + max(x)) / 2 for x in df["x"]])
        cy = np.array([(min(y) + max(y)) / 2 for y in df["y"]])
        df["cell_id"] = (np.floor(cx / cell).astype(np.int64) * 1000003 +
                         np.floor(cy / cell).astype(np.int64))
        return df

    def per_cell(df: pd.DataFrame) -> pd.DataFrame:
        features = [[np.stack([np.asarray(x, float), np.asarray(y, float)],
                              axis=1)] for x, y in zip(df["x"], df["y"])]
        out = dissolve2(features, list(df["grp"]))
        return pd.DataFrame([
            {"grp": k, "area": round(v["area"], 9),
             "n_tiles": v["n_tiles"]} for k, v in out.items()])

    per = feats.map_batches(tag, batch_format="pandas") \
               .groupby("cell_id").map_groups(per_cell,
                                              batch_format="pandas")
    return groupby_agg(per, ["grp"], {"area_total": ("area", "sum"),
                                      "n_tiles": ("n_tiles", "sum")})


def innerlines_pipeline(sf_dir: str, grid=16):
    """Per-pair inner-boundary edge counts over the synthetic mesh."""
    from ..ops.relational import groupby_agg
    cls = innerlines_by_key(synth_mesh(sf_dir, grid), key="grp")
    return groupby_agg(cls, ["pair"], {"n_edges": ("edge_key", "count")})


def innerlines_layer_distributed(ds, inner_only=True):
    """Distributed -innerlines / -lines over a polygon layer Dataset.

    Shape: map_batches emits one row per polygon EDGE (exact float64
    endpoints as the composite key — shared borders carry bit-identical
    coordinates, so exact equality is the arc identity, as in
    ``innerlines_by_key``); a coarse bucket-hash shuffle + vectorized
    in-partition groupby classifies edges by their user count/groups;
    inner (or outer) edges then shuffle by their canonical feature-PAIR
    key, and one map_groups per pair chains its edges into maximal
    polylines — pair borders are tiny compared to the layer, so the
    per-group kernel is O(border), never O(layer).

    Equivalent to the in-process kernel up to part order and line
    direction (canonicalized here: features sorted by pair key); the
    exact reference extraction order needs the global arc walk, which
    is why the local kernel remains the small-layer default."""
    import ray.data as rd

    from ..sources.layers import nz

    def edges(df: pd.DataFrame) -> pd.DataFrame:
        rows_x, rows_y, fids = [], [], []
        for fid, rx, ry in zip(df["feature_id"].to_numpy(),
                               df["rings_x"].to_numpy(),
                               df["rings_y"].to_numpy()):
            for x, y in zip(nz(rx), nz(ry)):
                rows_x.append(np.asarray(x, np.float64))
                rows_y.append(np.asarray(y, np.float64))
                fids.append(int(fid))
        if not rows_x:
            return pd.DataFrame({"x1": [], "y1": [], "x2": [], "y2": [],
                                 "fwd": [], "feature_id": []})
        lens = np.array([len(a) for a in rows_x], dtype=np.int64)
        fx = np.concatenate(rows_x)
        fy = np.concatenate(rows_y)
        idx = np.arange(len(fx))
        mask = np.ones(len(fx), dtype=bool)
        mask[np.cumsum(lens) - 1] = False
        ai = idx[mask]
        ax, ay, bx, by = fx[ai], fy[ai], fx[ai + 1], fy[ai + 1]
        swap = (ax > bx) | ((ax == bx) & (ay > by))
        return pd.DataFrame({
            "x1": np.where(swap, bx, ax), "y1": np.where(swap, by, ay),
            "x2": np.where(swap, ax, bx), "y2": np.where(swap, ay, by),
            "fwd": ~swap,
            "feature_id": np.repeat(np.array(fids, dtype=np.int64),
                                    lens - 1)})

    edge_ds = ds.map_batches(edges, batch_format="pandas")

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        h = (df["x1"].to_numpy().view(np.uint64)
             * np.uint64(0x9E3779B97F4A7C15)
             ^ df["y1"].to_numpy().view(np.uint64)
             * np.uint64(0xC2B2AE3D27D4EB4F)
             ^ df["x2"].to_numpy().view(np.uint64)
             * np.uint64(0x165667B19E3779F9)
             ^ df["y2"].to_numpy().view(np.uint64))
        df["__b"] = (h % np.uint64(64)).astype(np.int64)
        return df

    def classify_part(df: pd.DataFrame) -> pd.DataFrame:
        """Vectorized per-edge-group classification → one row per
        KEPT edge with its canonical pair key."""
        cols = ["x1", "y1", "x2", "y2"]
        if len(df) == 0:
            return pd.DataFrame(columns=[*cols, "pair"])
        arr = df.sort_values([*cols, "feature_id"],
                             kind="mergesort").reset_index(drop=True)
        key_arr = arr[cols].to_numpy()
        new = np.ones(len(arr), dtype=bool)
        new[1:] = (key_arr[1:] != key_arr[:-1]).any(axis=1)
        gid = np.cumsum(new) - 1
        fid = arr["feature_id"].to_numpy()
        starts = np.flatnonzero(new)
        ends = np.r_[starts[1:], len(arr)]
        sizes = ends - starts
        lo = fid[starts]
        hi = fid[ends - 1]
        if inner_only:
            keep_g = (sizes >= 2) & (lo != hi)
            pair_g = np.char.add(np.char.add(
                lo.astype(str), "-"), hi.astype(str))
        else:
            keep_g = np.ones(len(starts), dtype=bool)
            pair_g = np.where(
                sizes == 1, np.char.add(lo.astype(str), "-"),
                np.char.add(np.char.add(lo.astype(str), "-"),
                            hi.astype(str)))
        keep_first = new & keep_g[gid]   # ONE row per kept edge group
        out = arr.loc[keep_first, [*cols, "fwd"]].copy()
        out["pair"] = pair_g[gid[keep_first]]
        return out

    kept = edge_ds.map_batches(bucket, batch_format="pandas") \
        .groupby("__b").map_groups(classify_part, batch_format="pandas")

    def chain_pair(df: pd.DataFrame) -> pd.DataFrame:
        """Stitch one pair's edges into maximal chains (greedy walk
        over the degree-adjacency of shared endpoints)."""
        pts = {}
        edges_l = []
        for i, (x1, y1, x2, y2, fwd) in enumerate(zip(
                df["x1"], df["y1"], df["x2"], df["y2"], df["fwd"])):
            a, b = (x1, y1), (x2, y2)
            if not fwd:
                a, b = b, a
            edges_l.append((a, b))
            pts.setdefault(a, []).append(i)
            pts.setdefault(b, []).append(i)
        used = [False] * len(edges_l)
        parts_x, parts_y = [], []
        for i in range(len(edges_l)):
            if used[i]:
                continue
            used[i] = True
            chain = [edges_l[i][0], edges_l[i][1]]
            # extend forward then backward until no unused edge joins
            for rev in (False, True):
                while True:
                    tip = chain[0] if rev else chain[-1]
                    nxt = next((j for j in pts.get(tip, ())
                                if not used[j]), None)
                    if nxt is None:
                        break
                    used[nxt] = True
                    a, b = edges_l[nxt]
                    other = b if a == tip else a
                    if rev:
                        chain.insert(0, other)
                    else:
                        chain.append(other)
            parts_x.append([p[0] for p in chain])
            parts_y.append([p[1] for p in chain])
        row = {"pair": df["pair"].iloc[0],
               "part_x": parts_x, "part_y": parts_y}
        if not inner_only:
            outer = df["pair"].iloc[0].endswith("-")
            row["RANK"] = 0 if outer else 1
            row["TYPE"] = "outer" if outer else "inner"
        return pd.DataFrame([row])

    lines = kept.groupby("pair").map_groups(chain_pair,
                                            batch_format="pandas")

    # deterministic numbering without materializing the geometry: pull
    # only the pair-key COLUMN (O(pairs) strings, like the distributed
    # simplify's arc-id map), broadcast the sorted key→id dict, and map
    # ids on in a streaming pass
    import ray
    keys = sorted(lines.map_batches(
        lambda df: df[["pair"]], batch_format="pandas")
        .to_pandas()["pair"])
    id_ref = ray.put({k: i for i, k in enumerate(keys)})

    def number(df: pd.DataFrame) -> pd.DataFrame:
        ids = ray.get(id_ref)
        df = df.copy()
        df.insert(0, "feature_id",
                  df["pair"].map(ids).astype(np.int64))
        return df.drop(columns="pair").sort_values("feature_id")
    return lines.map_batches(number, batch_format="pandas")


def innerlines_layer(ds, inner_only=True, distributed="auto"):
    """-innerlines / -lines over a polygon layer Dataset → polyline
    layer of shared-border (or all) arcs (reference api.innerlines,
    src/commands/mapshaper-innerlines.js:3-44).  In-process topology
    kernel below AUTO_DISTRIBUTE_ROWS (exact reference extraction
    order); larger layers route to ``innerlines_layer_distributed``
    (same line set, canonicalized order)."""
    import ray.data as rd

    if distributed == "auto":
        from .overlay import AUTO_DISTRIBUTE_ROWS
        distributed = ds.count() >= AUTO_DISTRIBUTE_ROWS
    if distributed:
        return innerlines_layer_distributed(ds, inner_only=inner_only)

    from ..sources.layers import nz
    from ..topo.dissolve import classify_arcs

    df = ds.to_pandas().sort_values("feature_id").reset_index(drop=True)
    feats = []
    for row in df.to_dict("records"):
        feats.append([np.stack([np.asarray(x, float), np.asarray(y, float)],
                               axis=1)
                      for x, y in zip(nz(row["rings_x"]),
                                      nz(row["rings_y"]))] or None)
    from ..topo.arcs import abs_id
    arcs, shapes = build_topology(feats)
    cls = classify_arcs(shapes)

    claimed: set = set()  # classifier consumes each arc on first claim
                          # (mapshaper-arc-classifier.js:26-39 a[i]=-1)

    def extract(key_fn):
        """Reference extractLines (mapshaper-innerlines.js:108-151):
        one multi-part line feature per classifier key, consecutive
        in-ring arcs merged into parts, parts split across a ring's
        endpoint re-joined (the wrap merge)."""
        out, idx = [], {}
        prev_key = prev_sp = None
        for sid_, shape in enumerate(shapes):
            if shape is None:
                continue
            for pid, part in enumerate(shape):
                for i, signed in enumerate(part):
                    aid = abs_id(signed)
                    k = None if aid in claimed else key_fn(sid_, aid)
                    if k is not None:
                        claimed.add(aid)
                        line = idx.get(k)
                        cont = (k == prev_key and prev_sp == (sid_, pid))
                        if line is None:
                            line = [[signed]]
                            idx[k] = line
                            out.append(line)
                        elif cont:
                            line[-1].append(signed)
                        else:
                            line.append([signed])
                        if i == len(part) - 1 and len(line) > 1 and \
                                line[0][0] == part[0]:
                            line[0] = line.pop() + line[0]
                    prev_key = k
                    prev_sp = (sid_, pid)
        return out

    def outer_key(sid_, aid):
        return str(sid_) if len(cls.get(aid, [])) < 2 else None

    def inner_key(sid_, aid):
        users = cls.get(aid, [])
        return "-".join(map(str, users)) if len(users) >= 2 else None

    batches = []          # (lines, TYPE, RANK)
    if inner_only:
        batches.append((extract(inner_key), None, None))
    else:
        # reference api.lines PREPENDS each addLines group
        # (utils.merge(lines, shapes)) — output order is inner lines
        # first, outer last, while RANK still counts in add order
        # (outer=0, inner=1); extraction order stays outer-then-inner
        # because the classifier consumes arcs on first claim
        outer = (extract(outer_key), "outer", 0)
        inner = (extract(inner_key), "inner", 1)
        batches.append(inner)
        batches.append(outer)
    rows = []
    fid = 0
    for lines_b, type_name, rank in batches:
        for line in lines_b:
            px, py = [], []
            for part in line:
                x, y = arcs.path_coords(part)
                px.append(np.asarray(x, float).tolist())
                py.append(np.asarray(y, float).tolist())
            row = {"feature_id": fid, "part_x": px, "part_y": py}
            if type_name is not None:
                row["RANK"] = rank
                row["TYPE"] = type_name
            rows.append(row)
            fid += 1
    return rd.from_items(rows) if rows else rd.from_items(
        [{"feature_id": 0, "part_x": [], "part_y": []}]).limit(0)


def filter_islands_layer(ds, min_area=None, min_vertices=None):
    """Reference -filter-islands (src/commands/mapshaper-filter-islands.js:
    3-65): an island is a SINGLE-ARC ring whose arc is used by exactly
    one shape (not a shared border, not part of a donut hole) and that
    contains no holes; it is dropped when its area (SPHERICAL for
    lat-lon data, getMinAreaTest) is under ``min_area`` m^2, or its
    vertex count (first==last counted once) is <= ``min_vertices``.
    In-process topology kernel (fixture scale)."""
    import ray.data as rd
    from collections import Counter

    from ..geom.kernels import planar_ring_area, spherical_ring_area
    from ..sources.layers import nz
    from ..topo.arcs import abs_id
    from ..topo.build import build_topology

    df = ds.to_pandas().sort_values("feature_id").reset_index(drop=True)
    feats = []
    for row in df.to_dict("records"):
        feats.append([np.stack([np.asarray(x, float), np.asarray(y, float)],
                               axis=1)
                      for x, y in zip(nz(row["rings_x"]),
                                      nz(row["rings_y"]))] or None)
    arcs, shapes = build_topology(feats)
    usage = Counter(abs_id(s) for shp in shapes if shp
                    for part in shp for s in part)
    xs = [v for f in feats if f for r in f for v in r[:, 0]]
    latlong = (min(xs) >= -181 and max(xs) <= 181) if xs else False
    area_fn = spherical_ring_area if latlong else planar_ring_area

    from ..geom.kernels import points_in_ring

    def drop_ring(fi, ring_idx, rx, ry):
        """pathFilter (mapshaper-filter-islands.js:48-62): single-arc
        ring, arc used once, passes the criterion, and no SIBLING ring
        of the same feature lies inside it (ringHasHoles — geometric
        containment, not ring_poly grouping)."""
        part = shapes[fi][ring_idx] if shapes[fi] else None
        if not part or len(part) != 1 or usage[abs_id(part[0])] != 1:
            return False
        x, y = rx[ring_idx], ry[ring_idx]
        hit = False
        if min_area is not None and abs(area_fn(x, y)) < min_area:
            hit = True
        # countVerticesInPath iterates the closed ring INCLUDING the
        # closing duplicate (verified against the reference CLI:
        # min-vertices=20 keeps a 21-point closed ring)
        if min_vertices is not None and len(x) <= min_vertices:
            hit = True
        if not hit:
            return False
        for j in range(len(rx)):
            if j != ring_idx and len(rx[j]) and \
                    points_in_ring(rx[j][:1], ry[j][:1], x, y)[0] == 1:
                return False       # contains a hole
        return True

    rows = []
    for fi, row in enumerate(df.to_dict("records")):
        rx = [np.asarray(v, float) for v in nz(row["rings_x"])]
        ry = [np.asarray(v, float) for v in nz(row["rings_y"])]
        rp = list(row["ring_poly"]) if row["ring_poly"] is not None \
            else [0] * len(rx)
        keep = [i for i in range(len(rx))
                if not drop_ring(fi, i, rx, ry)]
        remap = {p: k for k, p in
                 enumerate(sorted(set(rp[i] for i in keep)))}
        out = {c: row[c] for c in df.columns
               if c not in ("rings_x", "rings_y", "ring_poly")}
        out["rings_x"] = [rx[i].tolist() for i in keep]
        out["rings_y"] = [ry[i].tolist() for i in keep]
        out["ring_poly"] = [remap[rp[i]] for i in keep]
        rows.append(out)
    return rd.from_items(rows)
