"""Distributed shared-arc topology build — the two-shuffle variant of
buildTopology (SURVEY.md §2.6 row 1; reference algorithm
src/topology/mapshaper-topology.js:11-229 done in one process, here as
Ray Data exchanges):

  stage 1  vertex shuffle: every path vertex emits its quantized
           coordinate key; a groupby over keys finds JUNCTIONS —
           vertices used by >2 path-neighborhoods or used twice with
           different neighbor sets (the reference's point-chain +
           neighbor test, mapshaper-topology-chains-v2.js:27).
  stage 2  per-feature path cutting against the broadcast junction set
           (map_batches — same `_cut_path` kernel as the in-process
           builder), emitting candidate arcs keyed by their canonical
           coordinate run; a groupby on the arc key DEDUPES twin arcs
           (forward == reversed, mapshaper-arc-index.js:15-31) and
           assigns global arc ids.
  stage 3  features re-emit their paths as signed arc-id sequences by
           looking up the broadcast arc-id map.

Equivalence to the in-process builder is asserted in tests (same arc
count, same per-feature ring geometry).  At 100 TB the junction set and
arc-id map are the only driver-side artifacts; both are O(borders), not
O(vertices) — and can themselves stay distributed (broadcast via
ray.put) when large.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .arcs import ArcTable
from .build import _cut_path


def _nz0(a: np.ndarray) -> np.ndarray:
    """Normalize -0.0 → 0.0 so float keys match tuple equality."""
    return np.where(a == 0.0, 0.0, a)


def _vertex_rows(df: pd.DataFrame, closed: bool) -> pd.DataFrame:
    """Per-path vertex emission with canonical unordered neighbor
    pairs, fully vectorized per path (np.roll for ring neighborhoods;
    NaN marks the missing neighbor at open-path endpoints — endpoints
    are junctions regardless, so the NaN canonicalization is free).
    A vertex is a junction when it occurs with more than one DISTINCT
    unordered neighbor pair (the reference's point-chain test) or is
    an open-path endpoint."""
    frames = []
    for xs, ys in zip(df["x"], df["y"]):
        x = _nz0(np.asarray(xs, dtype=np.float64))
        y = _nz0(np.asarray(ys, dtype=np.float64))
        n = len(x)
        if n == 0:
            continue
        ring = closed and x[0] == x[-1] and y[0] == y[-1]
        if ring:
            vx, vy = x[:-1], y[:-1]
            px, py = np.roll(vx, 1), np.roll(vy, 1)
            nx, ny = np.roll(vx, -1), np.roll(vy, -1)
            is_end = np.zeros(len(vx), dtype=bool)
        else:
            vx, vy = x, y
            px = np.concatenate([[np.nan], x[:-1]])
            py = np.concatenate([[np.nan], y[:-1]])
            nx = np.concatenate([x[1:], [np.nan]])
            ny = np.concatenate([y[1:], [np.nan]])
            is_end = np.zeros(n, dtype=bool)
            if n:
                is_end[0] = is_end[-1] = True
        if len(vx) == 0:
            continue
        # canonical unordered pair: lexicographic (x, y) swap
        swap = (px > nx) | ((px == nx) & (py > ny))
        frames.append(pd.DataFrame({
            "vx": vx, "vy": vy,
            "px": np.where(swap, nx, px),
            "py": np.where(swap, ny, py),
            "nx": np.where(swap, px, nx),
            "ny": np.where(swap, py, ny),
            "is_end": is_end}))
    if not frames:
        return pd.DataFrame({"vx": pd.Series([], dtype="float64"),
                             "vy": pd.Series([], dtype="float64"),
                             "px": pd.Series([], dtype="float64"),
                             "py": pd.Series([], dtype="float64"),
                             "nx": pd.Series([], dtype="float64"),
                             "ny": pd.Series([], dtype="float64"),
                             "is_end": pd.Series([], dtype="bool")})
    return pd.concat(frames, ignore_index=True)


def find_junctions_ds(features_ds, closed=True):
    """Stage 1: distributed junction detection.  Returns the set of
    junction (x, y) tuples (driver-side set; O(junctions))."""
    n_parts = 64

    def emit_rows(df: pd.DataFrame) -> pd.DataFrame:
        from ..ops.partition import float2_bucket_part
        out = _vertex_rows(df, closed)
        out["__part"] = float2_bucket_part(out["vx"].to_numpy(),
                                           out["vy"].to_numpy(),
                                           n_parts)
        return out

    emit = features_ds.map_batches(emit_rows, batch_format="pandas")

    # mirror the in-process rule (topo/build.find_junctions): a vertex
    # is a junction when it occurs with more than one distinct
    # unordered neighbor pair, or is an open-path endpoint.  ONE
    # vectorized groupby per bucket partition (a map_groups per vertex
    # is billions of tiny tasks at scale), and only junction rows
    # reach the driver — O(junctions), not O(vertices).
    def part_judge(df: pd.DataFrame) -> pd.DataFrame:
        uniq = df.drop_duplicates(["vx", "vy", "px", "py", "nx", "ny"])
        cnt = uniq.groupby(["vx", "vy"]).size()
        j = cnt[cnt > 1].index.to_frame(index=False)
        ends = df.loc[df["is_end"], ["vx", "vy"]].drop_duplicates()
        return pd.concat([j, ends], ignore_index=True) \
            .drop_duplicates()

    verdicts = emit.groupby("__part").map_groups(
        part_judge, batch_format="pandas").to_pandas()
    out = set()
    if "vx" not in verdicts.columns:        # no junctions anywhere
        return out
    for vx, vy in zip(verdicts["vx"], verdicts["vy"]):
        out.add((float(vx), float(vy)))
    return out


def build_topology_ds(features_ds, closed=True):
    """Full distributed build.  features_ds rows: {feature_id, x, y}
    (one ring/path per row; multi-part features = multiple rows with
    the same feature_id and a part_id).

    Returns (ArcTable, shapes_df) where shapes_df maps each input row to
    its signed arc-id sequence — identical semantics to
    topo.build.build_topology.  NOTE: this variant collects the arc
    table to the driver (the in-process ArcTable contract); the scale
    path is ``build_topology_ds_tables`` below, which keeps arcs and
    refs as Datasets end-to-end."""
    import ray

    junctions = find_junctions_ds(features_ds, closed)
    # endpoints of open paths are implicit junctions (reference
    # convertPath behavior)
    jref = ray.put(junctions)

    def cut(df: pd.DataFrame) -> pd.DataFrame:
        junc = ray.get(jref)
        rows = []
        for row in df.to_dict("records"):
            pts = [tuple(p) for p in zip(row["x"], row["y"])]
            is_ring = closed and len(pts) > 1 and pts[0] == pts[-1]
            runs = _cut_path(pts, is_ring, junc)  # rotates rings itself
            for k, run in enumerate(runs):
                fwd = tuple(run)
                rev = tuple(reversed(run))
                canon = min(fwd, rev)
                rows.append({
                    "feature_id": row["feature_id"],
                    "part_seq": row.get("part_id", 0),
                    "run_seq": k,
                    "arc_key": repr(canon),
                    "reversed": fwd != canon,
                    "coords_x": [p[0] for p in run],
                    "coords_y": [p[1] for p in run],
                })
        return pd.DataFrame(rows)

    runs = features_ds.map_batches(cut, batch_format="pandas").to_pandas()
    if len(runs) == 0:
        return ArcTable(np.empty(0), np.empty(0),
                        np.empty(0, np.int64)), pd.DataFrame()

    # stage 2: dedupe twin arcs on the canonical key, assign global ids
    # deterministically (sorted keys — partition-order independent)
    uniq = runs.drop_duplicates("arc_key").sort_values("arc_key") \
               .reset_index(drop=True)
    arc_ids = {k: i for i, k in enumerate(uniq["arc_key"])}
    coords = []
    for r in uniq.to_dict("records"):
        x = np.asarray(r["coords_x"], dtype=np.float64)
        y = np.asarray(r["coords_y"], dtype=np.float64)
        if r["reversed"]:
            x, y = x[::-1], y[::-1]
        coords.append(np.stack([x, y], axis=1))
    arcs = ArcTable.from_coord_lists(coords)

    # stage 3: signed arc refs per input row
    runs = runs.sort_values(["feature_id", "part_seq", "run_seq"])
    runs["arc_id"] = runs["arc_key"].map(arc_ids)
    runs["signed_id"] = np.where(runs["reversed"],
                                 ~runs["arc_id"].astype(np.int64),
                                 runs["arc_id"].astype(np.int64))
    shapes = runs.groupby(["feature_id", "part_seq"], sort=True)[
        "signed_id"].apply(list).reset_index()
    return arcs, shapes


def build_topology_ds_tables(features_ds, closed=True, n_parts=64,
                             assign_ids=True):
    """Fully Dataset-native topology build: returns (arcs_ds, refs_ds)

      arcs_ds  rows {arc_id, x, y}                — canonical direction
      refs_ds  rows {feature_id, part_id, seq, arc_id, rev}

    ``assign_ids=False`` skips global id assignment entirely and keys
    both tables by (arc_key, __part) instead — two fewer exchanges and
    no driver count sync; downstream stages join coords per bucket
    partition directly on arc_key (what simplify_layer_distributed
    does).  arcs_ds then has {arc_key, __part, x, y}; refs_ds
    {feature_id, part_id, seq, arc_key, rev, __part}.

    Unlike ``build_topology_ds`` NO coordinate data reaches the driver:
    twin-arc dedupe and deterministic id assignment happen inside each
    arc-key bucket partition; the driver sees only the P-row per-bucket
    count table (ids are bucket-major / key-minor — deterministic for a
    given ``n_parts``, partition-layout independent).  Feature refs
    join their arc ids through a second, coordinate-free bucket
    exchange."""
    import ray

    junctions = find_junctions_ds(features_ds, closed)
    jref = ray.put(junctions)

    cols = ["feature_id", "part_seq", "run_seq", "arc_key", "reversed",
            "coords_x", "coords_y"]

    def cut(df: pd.DataFrame) -> pd.DataFrame:
        import hashlib
        junc = ray.get(jref)
        rows = []
        parts_out = []
        for fid, xs, ys, pid in zip(
                df["feature_id"], df["x"], df["y"],
                df["part_id"] if "part_id" in df.columns
                else np.zeros(len(df), np.int64)):
            pts = [tuple(p) for p in zip(xs, ys)]
            is_ring = closed and len(pts) > 1 and pts[0] == pts[-1]
            runs = _cut_path(pts, is_ring, junc)
            for k, run in enumerate(runs):
                # arc key = md5 of the canonical-direction coord bytes
                # (16 bytes to shuffle/merge on instead of a repr
                # string of every coordinate; -0.0 normalized so bit
                # equality matches float equality)
                arr = np.asarray(run, dtype=np.float64)
                arr = np.where(arr == 0.0, 0.0, arr)
                fwd_b = arr.tobytes()
                rev_b = arr[::-1].tobytes()
                revd = rev_b < fwd_b
                key = hashlib.md5(rev_b if revd else fwd_b).digest()
                rows.append({
                    "feature_id": int(fid), "part_seq": int(pid),
                    "run_seq": k, "arc_key": key,
                    "reversed": bool(revd),
                    "coords_x": arr[:, 0].tolist(),
                    "coords_y": arr[:, 1].tolist()})
                parts_out.append(
                    int.from_bytes(key[:8], "little") % n_parts)
        out = pd.DataFrame(rows, columns=cols)
        out["__part"] = np.asarray(parts_out, dtype=np.int64) \
            if parts_out else np.empty(0, dtype=np.int64)
        return out

    runs = features_ds.map_batches(cut, batch_format="pandas") \
        .materialize()

    def part_arcs(df: pd.DataFrame) -> pd.DataFrame:
        u = df.drop_duplicates("arc_key").sort_values("arc_key") \
              .reset_index(drop=True)
        xs, ys = [], []
        for x, y, rev in zip(u["coords_x"], u["coords_y"],
                             u["reversed"]):
            x = list(map(float, x))
            y = list(map(float, y))
            if rev:                         # store canonical direction
                x, y = x[::-1], y[::-1]
            xs.append(x)
            ys.append(y)
        return pd.DataFrame({"__part": u["__part"].to_numpy(),
                             "local_rank": np.arange(len(u),
                                                     dtype=np.int64),
                             "arc_key": u["arc_key"].to_numpy(),
                             "x": xs, "y": ys})

    arcs_local = runs.groupby("__part").map_groups(
        part_arcs, batch_format="pandas").materialize()

    if not assign_ids:
        arcs_ds = arcs_local.map_batches(
            lambda df: df[["arc_key", "__part", "x", "y"]],
            batch_format="pandas")
        refs_ds = runs.map_batches(
            lambda df: pd.DataFrame(
                {"feature_id": df["feature_id"].to_numpy(),
                 "part_id": df["part_seq"].to_numpy(),
                 "seq": df["run_seq"].to_numpy(),
                 "arc_key": df["arc_key"].to_numpy(),
                 "rev": df["reversed"].to_numpy(),
                 "__part": df["__part"].to_numpy()}),
            batch_format="pandas")
        return arcs_ds, refs_ds

    counts = arcs_local.map_batches(
        lambda df: df.groupby("__part").size().reset_index(name="n"),
        batch_format="pandas").to_pandas()
    counts = counts.groupby("__part")["n"].sum().sort_index()
    offsets = counts.cumsum().shift(fill_value=0).to_dict()
    off_ref = ray.put(offsets)

    def assign_ids(df: pd.DataFrame) -> pd.DataFrame:
        off = ray.get(off_ref)
        df = df.copy()
        df["arc_id"] = (df["__part"].map(off).to_numpy(np.int64) +
                        df["local_rank"].to_numpy(np.int64))
        return df

    ided = arcs_local.map_batches(assign_ids, batch_format="pandas") \
        .materialize()
    arcs_ds = ided.map_batches(lambda df: df[["arc_id", "x", "y"]],
                               batch_format="pandas")

    # refs join their arc ids through a coordinate-free bucket
    # exchange: id rows + use rows union'd, merged per partition
    id_rows = ided.map_batches(
        lambda df: df[["__part", "arc_key", "arc_id"]].assign(
            feature_id=-1, part_id=-1, seq=-1, rev=False),
        batch_format="pandas")
    use_rows = runs.map_batches(
        lambda df: pd.DataFrame(
            {"__part": df["__part"].to_numpy(),
             "arc_key": df["arc_key"].to_numpy(),
             "arc_id": -1,
             "feature_id": df["feature_id"].to_numpy(),
             "part_id": df["part_seq"].to_numpy(),
             "seq": df["run_seq"].to_numpy(),
             "rev": df["reversed"].to_numpy()}),
        batch_format="pandas")

    def part_join(df: pd.DataFrame) -> pd.DataFrame:
        ids = df[df["feature_id"] < 0][["arc_key", "arc_id"]]
        uses = df[df["feature_id"] >= 0]
        m = uses.merge(ids, on="arc_key", suffixes=("_u", ""))
        return m[["feature_id", "part_id", "seq", "arc_id", "rev"]]

    refs_ds = id_rows.union(use_rows).groupby("__part").map_groups(
        part_join, batch_format="pandas")
    return arcs_ds, refs_ds
