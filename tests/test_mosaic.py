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
