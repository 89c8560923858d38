"""keep-shapes protection + post-simplify repair."""

import numpy as np

from mapshaper_ray.geom.keep_shapes import (find_retained_crossings,
                                            protect_ring, protect_shapes,
                                            repair_intersections)
from mapshaper_ray.geom.simplify import visvalingam_thresholds


def test_protect_ring_restores_area():
    # small square ring: aggressive zlimit would collapse it
    x = np.array([0.0, 1.0, 1.0, 0.0, 0.0])
    y = np.array([0.0, 0.0, 1.0, 1.0, 0.0])
    z = visvalingam_thresholds(x, y)
    # simulate full collapse: only inf-z endpoints retained
    xs, ys, zs = [x], [y], [z.copy()]
    protect_ring(xs, ys, zs)
    retained = np.asarray(zs[0]) >= np.inf
    rx = x[retained]
    ry = y[retained]
    from mapshaper_ray.geom.kernels import planar_ring_area
    area = abs(planar_ring_area(np.append(rx, rx[0]), np.append(ry, ry[0])))
    assert area > 1e-10


def test_protect_shapes_picks_largest_ring():
    big = {"x": np.array([0.0, 10.0, 10.0, 0.0, 0.0]),
           "y": np.array([0.0, 0.0, 10.0, 10.0, 0.0]),
           "z": None}
    small = {"x": np.array([20.0, 21.0, 21.0, 20.0, 20.0]),
             "y": np.array([0.0, 0.0, 1.0, 1.0, 0.0]),
             "z": None}
    for r in (big, small):
        r["z"] = visvalingam_thresholds(r["x"], r["y"])
    small_before = np.asarray(small["z"]).copy()
    protect_shapes([[big, small]])
    # big ring got protected (some z raised to inf)
    assert np.isinf(np.asarray(big["z"])).sum() >= 3
    assert np.allclose(np.nan_to_num(small_before, posinf=1e300),
                       np.nan_to_num(np.asarray(small["z"]), posinf=1e300))


def test_repair_crossing():
    # path with a detour vertex (index 3) routing AROUND segment 0-1;
    # removing it makes the chord (2,0)->(9,6) cross segment 0-1 at
    # (6.67, 4) — the full path is crossing-free
    x = np.array([4.0, 8.0, 2.0, 10.0, 9.0])
    y = np.array([4.0, 4.0, 0.0, 2.0, 6.0])
    z = np.full(len(x), np.inf)
    z[3] = 1.0
    zlimit = 2.0
    assert len(find_retained_crossings(x, y, np.full(len(x), np.inf),
                                       0.0)) == 0  # full path clean
    hits = find_retained_crossings(x, y, z, zlimit)
    assert len(hits) == 1
    remaining, z2 = repair_intersections(x, y, z, zlimit)
    assert remaining == 0
    assert z2[3] >= zlimit  # removed vertex re-added
