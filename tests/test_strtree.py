"""Packed STRtree (state/strtree.py) vs brute force, and the
STRPathIndex variant vs the cell-grid PathIndex (identical
find_enclosing_feature results — the candidate step is the only thing
swapped, so any disagreement is a tree bug).
"""

import numpy as np
import pandas as pd

from mapshaper_ray.regions import build_region_index, diamond, region_centers
from mapshaper_ray.state.path_index import PathIndex
from mapshaper_ray.state.strtree import STRPathIndex, STRtree


def _rand_boxes(n, rng, skew=False):
    cx = rng.uniform(0, 100, n)
    cy = rng.uniform(0, 100, n)
    if skew:
        # heavy-tailed sizes: a few giant boxes over many tiny ones
        w = np.exp(rng.normal(-1, 2, n))
        h = np.exp(rng.normal(-1, 2, n))
    else:
        w = rng.uniform(0.1, 3, n)
        h = rng.uniform(0.1, 3, n)
    return np.stack([cx - w, cy - h, cx + w, cy + h], axis=1)


def _pairs_set(q, i):
    return set(zip(q.tolist(), i.tolist()))


def test_query_point_vs_brute():
    rng = np.random.default_rng(2)
    for n, cap, skew in [(1, 16, False), (17, 4, False), (400, 16, False),
                         (1000, 8, True), (257, 16, True)]:
        boxes = _rand_boxes(n, rng, skew)
        tree = STRtree(boxes, node_capacity=cap)
        px = rng.uniform(-5, 105, 300)
        py = rng.uniform(-5, 105, 300)
        q, it = tree.query_point(px, py)
        want = set()
        for k in range(len(px)):
            hit = ((px[k] >= boxes[:, 0]) & (px[k] <= boxes[:, 2]) &
                   (py[k] >= boxes[:, 1]) & (py[k] <= boxes[:, 3]))
            want |= {(k, int(b)) for b in np.flatnonzero(hit)}
        assert _pairs_set(q, it) == want, (n, cap, skew)


def test_query_box_vs_brute():
    rng = np.random.default_rng(3)
    boxes = _rand_boxes(500, rng, skew=True)
    tree = STRtree(boxes, node_capacity=10)
    qb = _rand_boxes(100, rng)
    q, it = tree.query_box(qb)
    want = set()
    for k in range(len(qb)):
        hit = ((qb[k, 0] <= boxes[:, 2]) & (qb[k, 2] >= boxes[:, 0]) &
               (qb[k, 1] <= boxes[:, 3]) & (qb[k, 3] >= boxes[:, 1]))
        want |= {(k, int(b)) for b in np.flatnonzero(hit)}
    assert _pairs_set(q, it) == want


def test_empty_tree():
    tree = STRtree(np.empty((0, 4)))
    q, it = tree.query_point([1.0], [2.0])
    assert len(q) == 0 and len(it) == 0


def test_str_path_index_matches_grid():
    rng = np.random.default_rng(5)
    feats = [[diamond(cx, cy)] for _, cx, cy in region_centers()]
    grid = PathIndex.from_features(feats)
    tree = STRPathIndex.from_features(feats)
    px = rng.uniform(-180, 180, 5000)
    py = rng.uniform(-90, 90, 5000)
    np.testing.assert_array_equal(grid.find_enclosing_feature(px, py),
                                  tree.find_enclosing_feature(px, py))
    # broadcast contract: pack/unpack rebuilds an identical probe
    re = STRPathIndex.unpack(tree.pack())
    np.testing.assert_array_equal(tree.find_enclosing_feature(px, py),
                                  re.find_enclosing_feature(px, py))


def test_str_path_index_flagship_regions_via_oracle():
    # same closed-form diamond rule as the q10 oracle
    idx = build_region_index()
    tree = STRPathIndex(idx.rx, idx.ry, idx.offsets, idx.ring_feature)
    rng = np.random.default_rng(8)
    px = rng.uniform(-180, 180, 2000)
    py = rng.uniform(-90, 90, 2000)
    np.testing.assert_array_equal(idx.find_enclosing_feature(px, py),
                                  tree.find_enclosing_feature(px, py))
