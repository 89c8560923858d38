"""Intersection-cut substrate tests (addIntersectionCuts parity:
crossings found, endpoint-only touches filtered, arcs split at cuts)."""

import numpy as np
import pandas as pd

from mapshaper_ray.topo.arcs import ArcTable
from mapshaper_ray.topo.cuts import (add_intersection_cuts,
                                     find_intersections,
                                     find_intersections_ds, insert_cuts)


def _arcs(coords):
    return ArcTable.from_coord_lists(
        [np.asarray(c, dtype=np.float64) for c in coords])


def test_simple_cross():
    arcs = _arcs([[[0, 0], [4, 4]], [[0, 4], [4, 0]]])
    hits = find_intersections(arcs)
    assert len(hits) == 1
    assert np.isclose(hits.iloc[0]["x"], 2.0)
    assert np.isclose(hits.iloc[0]["y"], 2.0)
    new, remap = insert_cuts(arcs, hits)
    # each arc split in two at (2,2)
    assert len(new.nn) == 4
    assert remap[0] == [0, 1]
    assert remap[1] == [2, 3]
    # split point present in both pieces
    assert new.xx[new.ii[0] + new.nn[0] - 1] == 2.0


def test_endpoint_touch_filtered():
    # two arcs sharing an endpoint: NOT a crossing
    arcs = _arcs([[[0, 0], [2, 2]], [[2, 2], [4, 0]]])
    hits = find_intersections(arcs)
    assert len(hits) == 0


def test_t_touch_cuts_the_through_arc():
    # arc B ends ON the interior of arc A -> A is cut there
    arcs = _arcs([[[0, 0], [4, 0]], [[2, 2], [2, 0]]])
    hits = find_intersections(arcs)
    assert len(hits) == 1
    new, remap, n = add_intersection_cuts(arcs)
    assert n == 1
    assert len(remap[0]) == 2  # A split at (2,0)
    assert len(remap[1]) == 1  # B only touches with its endpoint


def test_self_intersection():
    # bowtie path crossing itself
    arcs = _arcs([[[0, 0], [4, 4], [4, 0], [0, 4]]])
    hits = find_intersections(arcs)
    assert len(hits) == 1
    assert np.isclose(hits.iloc[0]["x"], 2.0)
    new, remap = insert_cuts(arcs, hits)
    assert len(remap[0]) >= 2


def test_many_random_matches_bruteforce():
    rng = np.random.RandomState(11)
    coords = [rng.uniform(0, 10, size=(2, 2)) for _ in range(40)]
    arcs = _arcs(coords)
    hits = find_intersections(arcs)
    # brute force count
    from mapshaper_ray.geom.kernels import segment_intersection
    cnt = 0
    for i in range(40):
        for j in range(i + 1, 40):
            a, b = coords[i], coords[j]
            p = segment_intersection(a[0, 0], a[0, 1], a[1, 0], a[1, 1],
                                     b[0, 0], b[0, 1], b[1, 0], b[1, 1])
            if p is not None:
                cnt += 1
    assert len(hits) == cnt


def test_distributed_stripes_match(ray_session):
    import ray.data as rd
    rng = np.random.RandomState(13)
    coords = [rng.uniform(0, 10, size=(2, 2)) for _ in range(60)]
    arcs = _arcs(coords)
    expected = find_intersections(arcs)
    rows = []
    for a, c in enumerate(coords):
        rows.append({"arc_id": a, "seg_id": 0,
                     "x1": c[0, 0], "y1": c[0, 1],
                     "x2": c[1, 0], "y2": c[1, 1]})
    seg_ds = rd.from_items(rows)
    got = find_intersections_ds(
        seg_ds, ymin=float(arcs.yy.min()),
        yrange=float(arcs.yy.max() - arcs.yy.min()),
        n_stripes=6).to_pandas()
    key = ["arc_a", "seg_a", "arc_b", "seg_b"]
    e = expected.sort_values(key).reset_index(drop=True)
    g = got.sort_values(key).reset_index(drop=True)
    assert len(e) == len(g)
    assert np.allclose(e[["x", "y"]], g[["x", "y"]])
