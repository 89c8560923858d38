"""Raster <-> vector tile assignment (ops/raster.py).

Exactness claims under dyadic grids: rasterize matches the closed-form
diamond rule bit-for-bit; raster_to_polygons reconstructs label areas
and perimeters EXACTLY (no rounding) including holes and checkerboard
corners, and the traced geometry survives the layer-model nesting
convention (outer first, holes attached by containment)."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from mapshaper_ray.ops.raster import (GridSpec, rasterize,
                                      raster_to_polygons)


def _raster_from_grid(rows):
    """rows: list of strings, row 0 printed LAST (south row first in
    the raster).  '.' = empty, letters = labels."""
    recs = []
    h = len(rows)
    for r, line in enumerate(reversed(rows)):
        for c, ch in enumerate(line):
            if ch != ".":
                recs.append({"row": r, "col": c,
                             "value": ord(ch) - ord("a")})
    return rd.from_pandas(pd.DataFrame(recs))


def _expected(rows):
    grid = {}
    h = len(rows)
    for r, line in enumerate(reversed(rows)):
        for c, ch in enumerate(line):
            if ch != ".":
                grid[(r, c)] = ord(ch) - ord("a")
    area, perim = {}, {}
    for (r, c), v in grid.items():
        area[v] = area.get(v, 0) + 1
        for dr, dc in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            if grid.get((r + dr, c + dc), -99) != v:
                perim[v] = perim.get(v, 0) + 1
    return area, perim


def _check(rows, spec, ray_session):
    ras = _raster_from_grid(rows)
    out = raster_to_polygons(ras, spec).to_pandas() \
        .sort_values("value").reset_index(drop=True)
    expA, expP = _expected(rows)
    assert len(out) == len(expA)
    for _, rec in out.iterrows():
        v = rec["value"]
        assert rec["area"] == expA[v] * spec.cw * spec.ch, v
        # axis-aligned grid: perimeter units of cw (only square specs
        # used in the string fixtures)
        assert rec["perimeter"] == expP[v] * spec.cw, v
    return out


UNIT = GridSpec(nx=8, ny=8, bbox=(0.0, 0.0, 8.0, 8.0))


def test_hole_reconstruction(ray_session):
    out = _check(["aaa.....",
                  "aba.....",
                  "aaa....."], UNIT, ray_session)
    a = out[out["value"] == 0].iloc[0]
    # label a: outer ring + one hole, hole attached to the outer poly
    assert len(a["rings_x"]) == 2
    assert list(a["ring_poly"]) == [0, 0]
    b = out[out["value"] == 1].iloc[0]
    assert len(b["rings_x"]) == 1


def test_checkerboard_corner_splits_rings(ray_session):
    out = _check(["ab......",
                  "ba......"], UNIT, ray_session)
    # right-turn preference: each label becomes TWO simple rings
    # touching at the corner, not one self-intersecting ring
    for _, rec in out.iterrows():
        assert len(rec["rings_x"]) == 2
        assert sorted(rec["ring_poly"]) == [0, 1]


def test_multipart_and_nested_islands(ray_session):
    _check(["aaaaa...",
            "a...a..b",
            "a.c.a...",
            "a...a..b",
            "aaaaa..."], UNIT, ray_session)


def test_collinear_compaction_minimal_rings(ray_session):
    out = _check(["aaaa....",
                  "aaaa...."], UNIT, ray_session)
    rec = out.iloc[0]
    # 4x2 rectangle compacts to its 4 corners (closed ring: 5 vertices)
    assert len(rec["rings_x"][0]) == 5


def test_rasterize_region_diamonds(ray_session):
    from mapshaper_ray.regions import RADIUS, build_region_index
    spec = GridSpec(nx=96, ny=48)
    df = rasterize(build_region_index(), spec).to_pandas()
    lon = spec.center_lon(df["col"].to_numpy())
    lat = spec.center_lat(df["row"].to_numpy())
    i = np.clip(np.floor((lon + 180) / 45).astype(int), 0, 7)
    j = np.clip(np.floor((lat + 90) / 45).astype(int), 0, 3)
    cx = -180 + (i + 0.5) * 45.0
    cy = -90 + (j + 0.5) * 45.0
    inside = (np.abs(lon - cx) / RADIUS + np.abs(lat - cy) / RADIUS) <= 1.0
    assert (df["value"].to_numpy() == np.where(inside, i * 4 + j, -1)).all()
    assert (df["value"] >= 0).all()          # misses dropped by default
    # keep_empty keeps the full grid
    full = rasterize(build_region_index(), spec, keep_empty=True)
    assert full.count() == 96 * 48


def test_raster_roundtrip_through_vector(ray_session):
    """vector -> raster -> vector -> raster is a fixed point: re-probing
    the reconstructed polygons at cell centers reproduces the raster."""
    from mapshaper_ray.regions import build_region_index
    from mapshaper_ray.state.path_index import PathIndex
    spec = GridSpec(nx=96, ny=48)
    ras = rasterize(build_region_index(), spec)
    polys = raster_to_polygons(ras, spec).to_pandas()
    feats, labels = [], []
    for _, rec in polys.iterrows():
        feats.append([np.stack([np.asarray(x, float), np.asarray(y, float)],
                               axis=1)
                      for x, y in zip(rec["rings_x"], rec["rings_y"])])
        labels.append(rec["value"])
    idx = PathIndex.from_features(feats)
    df = ras.to_pandas()
    got = idx.find_enclosing_feature(spec.center_lon(df["col"].to_numpy()),
                                     spec.center_lat(df["row"].to_numpy()))
    assert (np.asarray(labels)[got] == df["value"].to_numpy()).all()


def test_skewed_dominant_label(ray_session):
    """Two-level stitch under label skew: one background label covers
    ~90% of a 512x256 raster (the 'ocean' case).  Areas and perimeters
    must still be exact, and the per-label merge stage must see only
    chain JOINTS, not the full boundary (asserted indirectly: results
    exact with n_bands forcing dozens of per-band assemblies)."""
    nx, ny = 512, 256
    spec = GridSpec(nx=nx, ny=ny, bbox=(0.0, 0.0, float(nx), float(ny)))
    rr, cc = np.meshgrid(np.arange(ny), np.arange(nx), indexing="ij")
    rr = rr.ravel()
    cc = cc.ravel()
    # diamond of label 1 centered mid-grid, radius 40 (in cells);
    # everything else label 0 -> label 0 covers ~93% of cells
    inside = (np.abs(cc - 256) + np.abs(rr - 128)) <= 40
    val = np.where(inside, 1, 0)
    ras = rd.from_pandas(pd.DataFrame({
        "row": rr.astype(np.int64), "col": cc.astype(np.int64),
        "value": val.astype(np.int64)}))
    out = raster_to_polygons(ras, spec, n_bands=32).to_pandas() \
        .sort_values("value").reset_index(drop=True)
    n1 = int(inside.sum())
    n0 = nx * ny - n1
    # diamond |dc|+|dr|<=40 cell count: 2*40^2 + 2*40 + 1 cells
    assert n1 == 2 * 40 * 40 + 2 * 40 + 1
    assert list(out["value"]) == [0, 1]
    assert out["area"].tolist() == [float(n0), float(n1)]
    # staircase diamond perimeter: 4 * (2 * radius + 1) cell edges? no:
    # each of the 4 staircase sides has 2*40+1 unit steps in each axis
    per1 = 4.0 * (2 * 40 + 1)
    assert out[out["value"] == 1]["perimeter"].iloc[0] == per1
    # background: outer rect + the diamond hole boundary
    per0 = 2.0 * (nx + ny) + per1
    assert out[out["value"] == 0]["perimeter"].iloc[0] == per0
    # the hole is attached to the background polygon
    assert len(out[out["value"] == 0]["rings_x"].iloc[0]) == 2
