"""Randomized cross-validation round 2: PathIndex vs direct kernel,
Shapefile multi-ring round trip, kNN halo-shuffle boundary cases."""

import numpy as np
import pytest


def _star(cx, cy, rng, n=7, r_lo=0.5, r_hi=2.0):
    """Random star-shaped (simple) polygon around (cx, cy)."""
    th = np.sort(rng.uniform(0, 2 * np.pi, n))
    r = rng.uniform(r_lo, r_hi, n)
    x = np.append(cx + r * np.cos(th), cx + r[0] * np.cos(th[0]))
    y = np.append(cy + r * np.sin(th), cy + r[0] * np.sin(th[0]))
    return x, y


@pytest.mark.parametrize("seed", [6, 21, 34])
def test_path_index_matches_direct(seed):
    """PathIndex (grid CSR + chunked probe) == direct even-odd kernel
    over random star polygons and random probes."""
    from mapshaper_ray.geom.kernels import points_in_shape
    from mapshaper_ray.state.path_index import PathIndex
    rng = np.random.RandomState(seed)
    shapes = []
    for i in range(12):
        cx, cy = rng.uniform(0, 20, 2)
        x, y = _star(cx, cy, rng)
        shapes.append([(x, y)])
    idx = PathIndex.from_features([[np.stack(r, axis=1) for r in s]
                                   for s in shapes])
    px = rng.uniform(-2, 22, 2000)
    py = rng.uniform(-2, 22, 2000)
    got = idx.find_enclosing_feature(px, py)
    for i in range(2000):
        want = -1
        for fi, rings in enumerate(shapes):
            r = points_in_shape(np.array([px[i]]), np.array([py[i]]),
                                rings)[0]
            if r:  # inside or on boundary
                want = fi
                break
        assert got[i] == want, (i, px[i], py[i], got[i], want)


@pytest.mark.parametrize("seed", [7, 29])
def test_shapefile_multiring_roundtrip(ray_session, tmp_path, seed):
    """Random multipolygon-with-hole features survive shp round trip
    with identical coordinates and ring counts."""
    import ray.data as rd
    from mapshaper_ray.sources.shapefile import (read_shapefile,
                                                 write_shapefile)
    rng = np.random.RandomState(seed)
    rows = []
    for i in range(5):
        x0, y0 = rng.uniform(0, 50, 2).round(3)
        w = round(float(rng.uniform(4, 8)), 3)
        outer_x = [x0, x0 + w, x0 + w, x0, x0]
        outer_y = [y0, y0, y0 + w, y0 + w, y0]
        hx0, hy0 = x0 + w / 4, y0 + w / 4
        hole_x = [hx0, hx0, hx0 + 1, hx0 + 1, hx0]
        hole_y = [hy0, hy0 + 1, hy0 + 1, hy0, hy0]
        rows.append({"feature_id": i, "name": f"f{i}",
                     "rings_x": [outer_x, hole_x],
                     "rings_y": [outer_y, hole_y],
                     "ring_poly": [0, 0]})
    ds = rd.from_items(rows)
    shp = tmp_path / "m.shp"
    write_shapefile(ds, str(shp))
    back = read_shapefile(str(shp)).to_pandas().sort_values("feature_id")
    assert len(back) == 5
    for i in range(5):
        row = back.iloc[i]
        assert len(row["rings_x"]) == 2, "ring lost in round trip"
        got = {(round(float(a), 6), round(float(b), 6))
               for x, y in zip(row["rings_x"], row["rings_y"])
               for a, b in zip(x, y)}
        want = {(round(float(a), 6), round(float(b), 6))
                for x, y in zip(rows[i]["rings_x"], rows[i]["rings_y"])
                for a, b in zip(x, y)}
        assert got == want


@pytest.mark.parametrize("seed", [10, 16])
def test_knn_shuffle_boundary_points(ray_session, seed):
    """Halo shuffle vs brute force with points ON cell boundaries
    (radius-multiple coordinates stress the floor-based cell keys)."""
    import pandas as pd
    import ray.data as rd
    from mapshaper_ray.ops.knn import nearest_join_shuffle
    rng = np.random.RandomState(seed)
    radius = 0.5
    # half the points snapped to the cell lattice
    def pts(n, base):
        x = rng.uniform(0, 5, n)
        y = rng.uniform(0, 5, n)
        snap = rng.rand(n) < 0.5
        x[snap] = np.round(x[snap] / radius) * radius
        y[snap] = np.round(y[snap] / radius) * radius
        return pd.DataFrame({"doc_id": np.arange(base, base + n),
                             "lon": x, "lat": y})
    src = pts(150, 0)
    probe = pts(60, 1000)
    got = nearest_join_shuffle(rd.from_pandas(probe), rd.from_pandas(src),
                               radius=radius).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    for _, q in probe.iterrows():
        d = np.hypot(src["lon"] - q["lon"], src["lat"] - q["lat"])
        a = int(np.argmin(d))
        want = src["doc_id"].iloc[a] if d.iloc[a] <= radius else -1
        row = got[got["doc_id"] == q["doc_id"]].iloc[0]
        if want == -1:
            assert row["neighbor_id"] == -1
        else:
            # equidistant ties may legitimately differ; compare distances
            dd = np.hypot(src.set_index("doc_id").loc[row["neighbor_id"],
                                                      "lon"] - q["lon"],
                          src.set_index("doc_id").loc[row["neighbor_id"],
                                                      "lat"] - q["lat"]) \
                if row["neighbor_id"] != -1 else np.inf
            assert np.isclose(dd, d.iloc[a]), (q["doc_id"], dd, d.iloc[a])
