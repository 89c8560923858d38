"""Layer-level -dissolve, -clip, -erase over the Arrow layer model —
the user-facing counterparts of topo/dissolve.py and topo/mosaic.py.

- ``dissolve_layer``: group features by a key field; shared borders
  between same-group neighbors melt away (arc cancellation,
  src/commands/mapshaper-dissolve.js:14 + polygon alg
  src/dissolve/mapshaper-polygon-dissolve.js:3-218); attribute columns
  aggregate per §2.5 (sum_fields / copy_fields-first).
- ``clip_layer`` / ``erase_layer``: general polygon×polygon boolean via
  the mosaic substrate (reference clip pipeline: merge datasets → cuts →
  mosaic-equivalent route walk, src/commands/mapshaper-clip-erase.js:
  39-93): build the arrangement of target ∪ clip rings, keep tiles
  whose interior is inside a target feature AND inside (clip) / outside
  (erase) the clip layer, regroup tiles per target feature, dissolve
  each feature's tile set back into rings.

Ray shape: target features shuffle by spatial cell; the clip layer
(small side) is broadcast whole; per-cell kernels run in map_groups.
The driver-level functions here are the per-cell kernels, exercised
directly at fixture scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..geom.kernels import planar_ring_area, points_in_shape
from ..topo.build import build_topology
from ..topo.dissolve import dissolve_shapes
from ..topo.mosaic import polygon_mosaic


def _rows_to_features(df: pd.DataFrame):
    feats = []
    for _, row in df.iterrows():
        rx = row["rings_x"] if row["rings_x"] is not None else []
        ry = row["rings_y"] if row["rings_y"] is not None else []
        feats.append([np.stack([np.asarray(x, float), np.asarray(y, float)],
                               axis=1) for x, y in zip(rx, ry)] or None)
    return feats


def _rings_to_row(rings):
    """list of (x, y) → layer-model ring columns with winding-based
    polygon nesting (outer rings CW-positive under the kernel)."""
    rx, ry, rp = [], [], []
    poly = -1
    for x, y in rings:
        a = planar_ring_area(np.asarray(x), np.asarray(y))
        if a >= 0 or poly < 0:
            poly += 1
        rx.append(list(map(float, x)))
        ry.append(list(map(float, y)))
        rp.append(poly)
    return rx, ry, rp


def dissolve_layer(ds, key: str, sum_fields=(), copy_fields=()):
    """Polygon layer → one feature per key value with melted borders."""
    import ray.data as rd
    df = ds.to_pandas().sort_values("feature_id").reset_index(drop=True)
    feats = _rows_to_features(df)
    arcs, shapes = build_topology(feats)
    groups = dissolve_shapes(shapes, list(df[key].astype(str)), arcs)
    rows = []
    for fid, (k, rings) in enumerate(sorted(groups.items())):
        sub = df[df[key].astype(str) == k]
        row = {"feature_id": fid, key: sub[key].iloc[0]}
        for f in sum_fields:
            row[f] = sub[f].sum()
        for f in copy_fields:
            row[f] = sub[f].iloc[0]
        if rings:
            coords = [arcs.path_coords(r) for r in rings]
            row["rings_x"], row["rings_y"], row["ring_poly"] = \
                _rings_to_row(coords)
        else:
            row["rings_x"], row["rings_y"], row["ring_poly"] = [], [], []
        rows.append(row)
    return rd.from_items(rows)


def _overlay(df_target: pd.DataFrame, clip_feats, keep_inside_clip: bool):
    """Per-cell boolean kernel: mosaic of target∪clip; tiles assigned to
    target features; kept by clip-side containment."""
    tgt_feats = _rows_to_features(df_target)
    all_feats = [f for f in tgt_feats if f] + \
        [f for f in clip_feats if f]
    tiles = polygon_mosaic(all_feats)

    tgt_rings = [[(np.asarray(r)[:, 0], np.asarray(r)[:, 1])
                  for r in (f or [])] for f in tgt_feats]
    clip_rings = [(np.asarray(r)[:, 0], np.asarray(r)[:, 1])
                  for f in clip_feats if f for r in f]

    per_feature_tiles: dict[int, list] = {}
    for t in tiles:
        px, py = t["point"]
        pin = np.array([px]), np.array([py])
        in_clip = bool(points_in_shape(pin[0], pin[1], clip_rings)[0]) \
            if clip_rings else False
        if in_clip != keep_inside_clip:
            continue
        # a tile joins EVERY containing target feature: the reference
        # clips each feature independently, so overlapping targets keep
        # their overlap in the output (unlike dissolve2's first-match)
        for fi, rings in enumerate(tgt_rings):
            if rings and points_in_shape(pin[0], pin[1], rings)[0]:
                per_feature_tiles.setdefault(fi, []).append(t)

    rows = []
    for fi, ts in sorted(per_feature_tiles.items()):
        feats = [[np.stack([rx, ry], axis=1) for rx, ry in t["rings"]]
                 for t in ts]
        arcs, shapes = build_topology(feats)
        rings = dissolve_shapes(shapes, ["g"] * len(shapes), arcs)["g"] or []
        coords = [arcs.path_coords(r) for r in rings]
        row = {c: df_target.iloc[fi][c] for c in df_target.columns
               if c not in ("rings_x", "rings_y", "ring_poly")}
        row["rings_x"], row["rings_y"], row["ring_poly"] = \
            _rings_to_row(coords)
        rows.append(row)
    return pd.DataFrame(rows)


def clip_layer(target_ds, clip_ds):
    """-clip: intersect target polygons with the clip layer."""
    import ray.data as rd
    clip_feats = _rows_to_features(clip_ds.to_pandas())
    df = target_ds.to_pandas().sort_values("feature_id") \
                  .reset_index(drop=True)
    out = _overlay(df, clip_feats, keep_inside_clip=True)
    return rd.from_pandas(out) if len(out) else rd.from_items([])


def erase_layer(target_ds, erase_ds):
    """-erase: subtract the erase layer from target polygons."""
    import ray.data as rd
    clip_feats = _rows_to_features(erase_ds.to_pandas())
    df = target_ds.to_pandas().sort_values("feature_id") \
                  .reset_index(drop=True)
    out = _overlay(df, clip_feats, keep_inside_clip=False)
    return rd.from_pandas(out) if len(out) else rd.from_items([])
