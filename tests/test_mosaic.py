"""Mosaic / dissolve2 tests: face counts, overlap resolution, gap fill."""

import numpy as np
import pytest

from mapshaper_ray.topo.mosaic import clean_layer, dissolve2, polygon_mosaic


def sq(x0, y0, w=2.0):
    return np.array([[x0, y0], [x0 + w, y0], [x0 + w, y0 + w],
                     [x0, y0 + w], [x0, y0]], dtype=float)


def test_mosaic_two_disjoint_squares():
    tiles = polygon_mosaic([[sq(0, 0)], [sq(10, 0)]])
    assert len(tiles) == 2
    assert np.allclose(sorted(t["area"] for t in tiles), [4.0, 4.0])


def test_mosaic_adjacent_squares():
    tiles = polygon_mosaic([[sq(0, 0)], [sq(2, 0)]])
    assert len(tiles) == 2
    assert np.allclose(sorted(t["area"] for t in tiles), [4.0, 4.0])


def test_mosaic_overlapping_squares():
    # squares overlapping by a 1x2 strip -> 3 tiles
    tiles = polygon_mosaic([[sq(0, 0)], [sq(1, 0)]])
    areas = sorted(t["area"] for t in tiles)
    assert len(tiles) == 3
    assert np.allclose(areas, [2.0, 2.0, 2.0])


def test_dissolve2_overlap_resolution():
    # overlap goes to the FIRST shape; total area = union area (no
    # double counting)
    out = dissolve2([[sq(0, 0)], [sq(1, 0)]], keys=["a", "b"])
    assert np.isclose(out["a"]["area"], 4.0)   # full first square
    assert np.isclose(out["b"]["area"], 2.0)   # second minus overlap
    assert out["a"]["n_tiles"] == 2
    assert out["b"]["n_tiles"] == 1


def test_dissolve2_same_key_merges():
    out = dissolve2([[sq(0, 0)], [sq(1, 0)]], keys=["g", "g"])
    assert np.isclose(out["g"]["area"], 6.0)   # union, overlap once
    # dissolved outline is a single ring
    assert len(out["g"]["rings"]) == 1


def test_mosaic_hole():
    outer = sq(0, 0, 4)
    inner = sq(1, 1, 2)[::-1].copy()  # reversed = hole winding
    tiles = polygon_mosaic([[outer, inner]])
    areas = sorted(t["area"] for t in tiles)
    # donut face (12) + hole face (4) are both tiles of the arrangement
    assert np.allclose(areas, [4.0, 12.0])


def test_dissolve2_hole_not_assigned():
    outer = sq(0, 0, 4)
    inner = sq(1, 1, 2)[::-1].copy()
    out = dissolve2([[outer, inner]], keys=["a"])
    # hole tile's interior point is not inside the (donut) shape
    assert np.isclose(out["a"]["area"], 12.0)


def test_clean_identity_on_clean_input():
    out = clean_layer([[sq(0, 0)], [sq(2, 0)]])
    assert np.isclose(out[0]["area"], 4.0)
    assert np.isclose(out[1]["area"], 4.0)


def test_polygons_from_lines():
    from mapshaper_ray.topo.mosaic import polygons_from_lines
    # four separate line segments forming a square outline + a diagonal
    lines = [
        np.array([[0, 0], [2, 0]], float),
        np.array([[2, 0], [2, 2]], float),
        np.array([[2, 2], [0, 2]], float),
        np.array([[0, 2], [0, 0]], float),
        np.array([[0, 0], [2, 2]], float),
    ]
    rings = polygons_from_lines(lines)
    # diagonal splits the square into two triangles
    assert len(rings) == 2
    assert np.allclose(sorted(r["area"] for r in rings), [2.0, 2.0])


def test_polygons_from_lines_gap_closing():
    from mapshaper_ray.topo.mosaic import polygons_from_lines
    # square outline with a tiny gap at one corner
    lines = [
        np.array([[0, 0], [2, 0], [2, 2], [0, 2], [0, 0.01]], float),
    ]
    assert polygons_from_lines(lines) == []           # open: no face
    rings = polygons_from_lines(lines, close_gaps=0.05)
    assert len(rings) == 1
    assert np.isclose(rings[0]["area"], 2 * 2, atol=0.1)


@pytest.mark.parametrize("seed", [17, 23, 41, 77])
def test_dissolve2_union_area_monte_carlo(seed):
    """Property check with an independent method: dissolve2 total area
    over random overlapping rects == Monte-Carlo union area estimate.
    (seed 17 caught a real bug: the intersection kernel's exact bbox
    guard dropped a 1-ULP-overshot crossing, losing a mosaic face.)"""
    from mapshaper_ray.geom.kernels import points_in_shape
    from mapshaper_ray.topo.mosaic import dissolve2
    rng = np.random.RandomState(seed)
    feats = []
    for _ in range(8):
        x0, y0 = rng.uniform(0, 6, 2)
        w, h = rng.uniform(1, 3, 2)
        feats.append([np.array([[x0, y0], [x0 + w, y0], [x0 + w, y0 + h],
                                [x0, y0 + h], [x0, y0]])])
    out = dissolve2(feats, keys=["g"] * len(feats))
    got = out["g"]["area"]
    # Monte Carlo union estimate over the bounding box
    allx = np.concatenate([f[0][:, 0] for f in feats])
    ally = np.concatenate([f[0][:, 1] for f in feats])
    bx0, bx1 = allx.min(), allx.max()
    by0, by1 = ally.min(), ally.max()
    n = 200_000
    px = rng.uniform(bx0, bx1, n)
    py = rng.uniform(by0, by1, n)
    inside = np.zeros(n, dtype=bool)
    for f in feats:
        inside |= points_in_shape(px, py, [(f[0][:, 0], f[0][:, 1])]) != 0
    est = inside.mean() * (bx1 - bx0) * (by1 - by0)
    assert abs(got - est) / est < 0.02, (got, est)
