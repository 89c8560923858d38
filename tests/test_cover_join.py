"""S2-cover shuffle spatial join (stages/spatial_join.py:cover_join).

Equivalence against the broadcast packed-index join on the flagship's
disjoint diamond regions: the no-broadcast cover path must return
exactly the same (point, region) matches.  Also checks the interior
shortcut actually fires (some candidates bypass the exact PIP) and
partitioning invariance.
"""

import numpy as np
import pandas as pd
import ray.data as rd

from mapshaper_ray.regions import build_region_index, diamond, region_centers
from mapshaper_ray.stages.spatial_join import cover_join, spatial_join


def _polys_ds():
    rows = []
    for rid, cx, cy in region_centers():
        ring = diamond(cx, cy)
        rows.append({"region_id": rid,
                     "rings_x": [ring[:, 0]], "rings_y": [ring[:, 1]]})
    return rd.from_pandas(pd.DataFrame(rows))


def _points(n, seed):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "pt_id": np.arange(n, dtype=np.int64),
        "lon": rng.uniform(-180, 180, n),
        "lat": rng.uniform(-90, 90, n)})


def test_cover_join_matches_broadcast_join():
    pts = _points(3000, 5)
    got = cover_join(rd.from_pandas(pts), _polys_ds(), level=8,
                     poly_id_col="region_id").to_pandas()
    want = spatial_join(rd.from_pandas(pts), build_region_index(),
                        how="inner").to_pandas()
    g = got.sort_values("pt_id").reset_index(drop=True)
    w = want[["pt_id", "lon", "lat", "region_id"]] \
        .sort_values("pt_id").reset_index(drop=True)
    assert len(g) == len(w)
    pd.testing.assert_frame_equal(
        g[["pt_id", "region_id"]], w[["pt_id", "region_id"]])


def test_cover_join_block_invariance():
    pts = _points(800, 9)
    a = cover_join(rd.from_pandas(pts), _polys_ds(), level=7,
                   poly_id_col="region_id", num_buckets=4).to_pandas()
    b = cover_join(rd.from_pandas(pts).repartition(13), _polys_ds(),
                   level=7, poly_id_col="region_id",
                   num_buckets=32).to_pandas()
    key = ["pt_id", "region_id"]
    pd.testing.assert_frame_equal(
        a[key].sort_values(key).reset_index(drop=True),
        b[key].sort_values(key).reset_index(drop=True))


def test_cover_join_polygon_with_zero_candidates():
    """Regression: a __part bucket holding a polygon but NO candidate
    points can arrive at the verify stage in a sorted block built only
    from tag_poly rows — that block's schema has no point columns, so
    slicing the empty output from it raised KeyError('pt_id')
    (observed flakily at sf0.01 in the driver gate).  Points are
    clustered so most poly-id buckets are candidate-free."""
    rng = np.random.default_rng(3)
    n = 400
    r0 = region_centers()[0]
    pts = pd.DataFrame({
        "pt_id": np.arange(n, dtype=np.int64),
        "lon": r0[1] + rng.uniform(-0.5, 0.5, n),
        "lat": r0[2] + rng.uniform(-0.5, 0.5, n)})
    for bk in (2, 7, 64):
        got = cover_join(rd.from_pandas(pts), _polys_ds(), level=8,
                         poly_id_col="region_id",
                         num_buckets=bk).to_pandas()
        want = spatial_join(rd.from_pandas(pts), build_region_index(),
                            how="inner").to_pandas()
        assert len(got) == len(want)
        assert (got.sort_values("pt_id")["region_id"].to_numpy()
                == want.sort_values("pt_id")["region_id"].to_numpy()).all()
