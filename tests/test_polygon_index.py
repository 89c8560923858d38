"""PolygonIndex x-bucket PIP vs the direct ray-crossing kernel."""

import numpy as np

from mapshaper_ray.geom.kernels import points_in_ring
from mapshaper_ray.state.polygon_index import PolygonIndex, should_index


def _blob(n=500, seed=2):
    rng = np.random.RandomState(seed)
    t = np.linspace(0, 2 * np.pi, n, endpoint=False)
    r = 5 + np.cumsum(rng.uniform(-0.1, 0.1, n))
    r -= np.linspace(0, r[-1] - r[0], n)  # close the radius walk
    r = np.clip(r, 2, 9)
    x = np.append(r * np.cos(t), r[0] * np.cos(t[0]))
    y = np.append(r * np.sin(t), r[0] * np.sin(t[0]))
    return x, y


def test_matches_direct_kernel():
    x, y = _blob()
    idx = PolygonIndex(x, y)
    rng = np.random.RandomState(7)
    px = rng.uniform(-10, 10, 500)
    py = rng.uniform(-10, 10, 500)
    direct = points_in_ring(px, py, x, y)
    for i in range(len(px)):
        got = idx.point_in_polygon(px[i], py[i])
        want = int(direct[i])
        if want == -1 or got == -1:
            continue  # boundary classification tolerance
        assert got == want, (px[i], py[i])


def test_bucket_count_formula():
    x, y = _blob(1000)
    idx = PolygonIndex(x, y)
    assert idx.n_buckets == int(np.ceil(1000 ** 0.75 / 10))


def test_pack_roundtrip():
    x, y = _blob(200)
    idx = PolygonIndex(x, y)
    back = PolygonIndex.unpack(idx.pack())
    assert back.point_in_polygon(0.0, 0.0) == idx.point_in_polygon(0.0, 0.0)
    assert back.point_in_polygon(20.0, 0.0) == 0


def test_should_index_gate():
    assert should_index(2.0, 100.0)
    assert not should_index(0.5, 100.0)
    assert not should_index(1.0, 0.0)
