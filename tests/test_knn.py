"""Grid-bucketed nearest-point operators vs brute force."""

import numpy as np
import pandas as pd

from mapshaper_ray.ops.knn import (GridPointIndex, nearest_join,
                                   nearest_join_shuffle)


def _brute(px, py, sx, sy, sid, radius):
    out_id, out_d = [], []
    for x, y in zip(px, py):
        d = np.hypot(sx - x, sy - y)
        a = int(np.argmin(d))
        if d[a] <= radius:
            out_id.append(sid[a])
            out_d.append(d[a])
        else:
            out_id.append(-1)
            out_d.append(np.inf)
    return np.array(out_id), np.array(out_d)


def test_grid_index_matches_brute():
    rng = np.random.RandomState(3)
    sx = rng.uniform(0, 10, 200)
    sy = rng.uniform(0, 10, 200)
    sid = np.arange(200)
    px = rng.uniform(-1, 11, 100)
    py = rng.uniform(-1, 11, 100)
    idx = GridPointIndex(sx, sy, sid, cell=0.5)
    gid, gd = idx.nearest(px, py, max_radius=0.5)
    bid, bd = _brute(px, py, sx, sy, sid, 0.5)
    assert (gid == bid).all()
    m = gid >= 0
    assert np.allclose(gd[m], bd[m])


def test_ring_expansion_beyond_radiusless_search():
    # single faraway source point: found via expanding rings
    idx = GridPointIndex([100.0], [100.0], [7], cell=1.0)
    gid, gd = idx.nearest([90.0], [90.0], max_radius=np.inf)
    assert gid[0] == 7
    assert np.isclose(gd[0], np.hypot(10, 10))


def test_nearest_join_broadcast(ray_session):
    import ray.data as rd
    src = pd.DataFrame({"doc_id": [0, 1], "lon": [0.0, 5.0],
                        "lat": [0.0, 5.0]})
    probes = rd.from_items([
        {"doc_id": 10, "lon": 0.4, "lat": 0.0},
        {"doc_id": 11, "lon": 5.1, "lat": 5.0},
        {"doc_id": 12, "lon": 50.0, "lat": 50.0},
    ])
    out = nearest_join(probes, src, radius=1.0).to_pandas() \
        .sort_values("doc_id")
    assert out["neighbor_id"].tolist() == [0, 1, -1]


def test_nearest_join_shuffle_matches(ray_session):
    import ray.data as rd
    rng = np.random.RandomState(5)
    src_df = pd.DataFrame({"doc_id": np.arange(300),
                           "lon": rng.uniform(0, 10, 300),
                           "lat": rng.uniform(0, 10, 300)})
    probe_df = pd.DataFrame({"doc_id": np.arange(1000, 1100),
                             "lon": rng.uniform(0, 10, 100),
                             "lat": rng.uniform(0, 10, 100)})
    radius = 0.4
    probes = rd.from_pandas(probe_df)
    srcs = rd.from_pandas(src_df)
    big = nearest_join_shuffle(probes, srcs, radius=radius).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    bid, bd = _brute(probe_df["lon"].to_numpy(), probe_df["lat"].to_numpy(),
                     src_df["lon"].to_numpy(), src_df["lat"].to_numpy(),
                     src_df["doc_id"].to_numpy(), radius)
    assert big["neighbor_id"].tolist() == bid.tolist()
