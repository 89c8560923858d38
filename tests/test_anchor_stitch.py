"""Anchor (inner) points + antimeridian stitch."""

import numpy as np

from mapshaper_ray.geom.kernels import points_in_shape
from mapshaper_ray.ops.anchor import (anchor_point, anchor_points,
                                      stitch_antimeridian)


def test_anchor_inside_L_shape():
    # L-shape whose centroid falls OUTSIDE the polygon
    x = np.array([0, 10, 10, 6, 6, 0, 0], dtype=float)
    y = np.array([0, 0, 2, 2, 10, 10, 0], dtype=float)
    px, py = anchor_point([(x, y)])
    assert points_in_shape(np.array([px]), np.array([py]), [(x, y)])[0]


def test_anchor_respects_hole():
    outer = (np.array([0, 10, 10, 0, 0], float),
             np.array([0, 0, 10, 10, 0], float))
    hole = (np.array([2, 2, 8, 8, 2], float),
            np.array([2, 8, 8, 2, 2], float))
    px, py = anchor_point([outer, hole])
    # inside outer, outside hole (even-odd over both rings)
    assert points_in_shape(np.array([px]), np.array([py]),
                           [outer, hole])[0]


def test_anchor_points_ds(ray_session):
    import ray.data as rd
    ds = rd.from_items([{
        "feature_id": 0,
        "rings_x": [[0.0, 4.0, 4.0, 0.0, 0.0]],
        "rings_y": [[0.0, 0.0, 4.0, 4.0, 0.0]],
        "ring_poly": [0]}])
    out = anchor_points(ds).to_pandas()
    assert 0 < out.iloc[0]["ax"] < 4
    assert 0 < out.iloc[0]["ay"] < 4


def test_stitch_antimeridian(ray_session):
    import ray.data as rd
    # a strip split at the antimeridian: [170..180] + [-180..-170]
    ds = rd.from_items([{
        "feature_id": 0,
        "rings_x": [[170.0, 180.0, 180.0, 170.0, 170.0],
                    [-180.0, -170.0, -170.0, -180.0, -180.0]],
        "rings_y": [[0.0, 0.0, 10.0, 10.0, 0.0],
                    [0.0, 0.0, 10.0, 10.0, 0.0]],
        "ring_poly": [0, 1]}])
    out = stitch_antimeridian(ds).to_pandas()
    assert bool(out.iloc[0]["wrapped"])
    assert len(out.iloc[0]["rings_x"]) == 1      # seam melted
    x = np.asarray(out.iloc[0]["rings_x"][0])
    assert x.min() == 170.0 and x.max() == 190.0  # unwrapped frame
    assert not np.any(np.isclose(np.abs(x), 180.0) &
                      ~np.isclose(x, 180.0))


def test_stitch_leaves_normal_features(ray_session):
    import ray.data as rd
    ds = rd.from_items([{
        "feature_id": 0,
        "rings_x": [[0.0, 1.0, 1.0, 0.0, 0.0]],
        "rings_y": [[0.0, 0.0, 1.0, 1.0, 0.0]],
        "ring_poly": [0]}])
    out = stitch_antimeridian(ds).to_pandas()
    assert not bool(out.iloc[0]["wrapped"])
    assert list(out.iloc[0]["rings_x"][0]) == [0.0, 1.0, 1.0, 0.0, 0.0]


def test_stitch_spherical_merges_antimeridian_halves(ray_session):
    """Two halves of one polygon cut at the antimeridian: after edge
    snapping their lng=±180 edges coincide and cancel, leaving one
    ring whose seam vertices are interior (reference api.stitch)."""
    import ray.data as rd
    from mapshaper_ray.ops.anchor import stitch_spherical
    ds = rd.from_items([{
        "feature_id": 0,
        "rings_x": [[170.0, 180.0, 180.0, 170.0, 170.0],
                    [-180.0, -170.0, -170.0, -180.0, -180.0]],
        "rings_y": [[10.0, 10.0, 20.0, 20.0, 10.0],
                    [10.0, 10.0, 20.0, 20.0, 10.0]],
        "ring_poly": [0, 1]}])
    out = stitch_spherical(ds).to_pandas()
    assert bool(out.iloc[0]["stitched"])
    assert len(out.iloc[0]["rings_x"]) == 1
    # the stitched ring CROSSES the antimeridian: in planar lng-lat
    # it encloses the 360-wide complement, so |area| = 360*10 - 200
    from mapshaper_ray.geom.kernels import planar_ring_area
    x = np.asarray(out.iloc[0]["rings_x"][0])
    y = np.asarray(out.iloc[0]["rings_y"][0])
    assert abs(abs(planar_ring_area(x, y)) - (3600.0 - 200.0)) < 1e-9
    # and the seam vertices at lng=+-180 are gone (the cut is removed)
    assert not np.any(np.abs(np.abs(x) - 180.0) < 1e-9)


def test_stitch_spherical_passthrough(ray_session):
    import ray.data as rd
    from mapshaper_ray.ops.anchor import stitch_spherical
    ds = rd.from_items([{
        "feature_id": 0,
        "rings_x": [[0.0, 10.0, 10.0, 0.0, 0.0]],
        "rings_y": [[0.0, 0.0, 10.0, 10.0, 0.0]],
        "ring_poly": [0]}])
    out = stitch_spherical(ds).to_pandas()
    assert not bool(out.iloc[0]["stitched"])
    assert list(out.iloc[0]["rings_x"][0]) == [0.0, 10.0, 10.0, 0.0, 0.0]


def test_fix_ring_nesting(ray_session):
    """CW outer containing a CW (same-winding) ring -> inner dropped;
    un-contained CCW ring -> flipped to outer winding."""
    import ray.data as rd
    from mapshaper_ray.geom.kernels import planar_ring_area
    from mapshaper_ray.ops.anchor import fix_ring_nesting
    # kernel convention: clockwise positive
    outer_cw = ([0.0, 0.0, 10.0, 10.0, 0.0], [0.0, 10.0, 10.0, 0.0, 0.0])
    inner_cw = ([2.0, 2.0, 4.0, 4.0, 2.0], [2.0, 4.0, 4.0, 2.0, 2.0])
    lone_ccw = ([20.0, 24.0, 24.0, 20.0, 20.0],
                [0.0, 0.0, 4.0, 4.0, 0.0])
    assert planar_ring_area(np.array(outer_cw[0]),
                            np.array(outer_cw[1])) > 0
    assert planar_ring_area(np.array(lone_ccw[0]),
                            np.array(lone_ccw[1])) < 0
    ds = rd.from_items([{
        "feature_id": 0,
        "rings_x": [list(outer_cw[0]), list(inner_cw[0]),
                    list(lone_ccw[0])],
        "rings_y": [list(outer_cw[1]), list(inner_cw[1]),
                    list(lone_ccw[1])],
        "ring_poly": [0, 0, 1]}])
    out = fix_ring_nesting(ds).to_pandas()
    rx = out.iloc[0]["rings_x"]
    ry = out.iloc[0]["rings_y"]
    assert len(rx) == 2  # same-winding nested ring removed
    areas = [planar_ring_area(np.asarray(x), np.asarray(y))
             for x, y in zip(rx, ry)]
    assert all(a > 0 for a in areas)  # lone CCW flipped to CW
