"""-data-fill and -cluster over the shared-edge neighbor graph."""

import numpy as np
import pandas as pd


def _mesh_rows(grid=3):
    rows = []
    for i in range(grid * grid):
        r, c = divmod(i, grid)
        x0, y0 = float(c), float(r)
        rows.append({"feature_id": i,
                     "x": [x0, x0 + 1, x0 + 1, x0, x0],
                     "y": [y0, y0, y0 + 1, y0 + 1, y0]})
    return rows


def test_neighbor_edges(ray_session):
    import ray.data as rd
    from mapshaper_ray.ops.neighbors import neighbor_edges
    ds = rd.from_items(_mesh_rows(3))
    e = neighbor_edges(ds)
    # 3x3 rook adjacency: 12 neighbor pairs, border length 1 each
    assert len(e) == 12
    assert np.allclose(e["border_len"], 1.0)


def test_data_fill(ray_session):
    import ray.data as rd
    from mapshaper_ray.ops.neighbors import data_fill, neighbor_edges
    ds = rd.from_items(_mesh_rows(3))
    e = neighbor_edges(ds)
    # left column 'L', right column 'R', middle empty
    vals = {0: "L", 3: "L", 6: "L", 2: "R", 5: "R", 8: "R",
            1: None, 4: None, 7: None}
    filled = data_fill(vals, e)
    assert all(v is not None for v in filled.values())
    assert filled[0] == "L" and filled[2] == "R"
    assert filled[4] in ("L", "R")


def test_data_fill_postprocess_island(ray_session):
    import ray.data as rd
    from mapshaper_ray.ops.neighbors import data_fill, neighbor_edges
    ds = rd.from_items(_mesh_rows(3))
    e = neighbor_edges(ds)
    # center cell is a one-cell island of 'X' surrounded by 'A'
    vals = {i: "A" for i in range(9)}
    vals[4] = "X"
    filled = data_fill(vals, e, postprocess=True)
    assert filled[4] == "A"          # island absorbed
    assert filled[0] == "A"


def test_cluster_polygons(ray_session):
    import ray.data as rd
    from mapshaper_ray.ops.neighbors import (cluster_polygons,
                                             neighbor_edges)
    ds = rd.from_items(_mesh_rows(4))
    e = neighbor_edges(ds)
    cent = pd.DataFrame([{"fid": i, "cx": (i % 4) + 0.5,
                          "cy": (i // 4) + 0.5, "area": 1.0}
                         for i in range(16)])
    groups = cluster_polygons(cent, e, pct=0.5)
    n_clusters = len(set(groups.values()))
    assert n_clusters == 8           # 16 shapes, 8 merges -> 8 clusters
    # merged members are neighbors (distance 1 apart originally)
    from collections import Counter
    sizes = Counter(groups.values())
    assert max(sizes.values()) >= 2


def test_cluster_group_by_constraint(ray_session):
    import ray.data as rd
    from mapshaper_ray.ops.neighbors import (cluster_polygons,
                                             neighbor_edges)
    ds = rd.from_items(_mesh_rows(2))
    e = neighbor_edges(ds)
    cent = pd.DataFrame([
        {"fid": 0, "cx": 0.5, "cy": 0.5, "area": 1.0, "group": "g1"},
        {"fid": 1, "cx": 1.5, "cy": 0.5, "area": 1.0, "group": "g2"},
        {"fid": 2, "cx": 0.5, "cy": 1.5, "area": 1.0, "group": "g1"},
        {"fid": 3, "cx": 1.5, "cy": 1.5, "area": 1.0, "group": "g2"},
    ])
    groups = cluster_polygons(cent, e, pct=1.0, group_by="group")
    # cross-group merges forbidden: 0+2 merge, 1+3 merge
    assert groups[0] == groups[2]
    assert groups[1] == groups[3]
    assert groups[0] != groups[1]
