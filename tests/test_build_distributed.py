"""Distributed topology build ≡ in-process builder."""

import numpy as np
import pandas as pd

from mapshaper_ray.topo.build import build_topology
from mapshaper_ray.topo.build_distributed import (build_topology_ds,
                                                  find_junctions_ds)


def _mesh_rows(grid=3):
    rows = []
    for i in range(grid * grid):
        r, c = divmod(i, grid)
        x0, y0 = float(c), float(r)
        rows.append({"feature_id": i, "part_id": 0,
                     "x": [x0, x0 + 1, x0 + 1, x0, x0],
                     "y": [y0, y0, y0 + 1, y0 + 1, y0]})
    return rows


def _mesh_features(grid=3):
    return [[np.stack([np.asarray(r["x"]), np.asarray(r["y"])], axis=1)]
            for r in _mesh_rows(grid)]


def test_junctions_match(ray_session):
    import ray.data as rd
    from mapshaper_ray.topo.build import find_junctions
    ds = rd.from_items(_mesh_rows(3))
    got = find_junctions_ds(ds)
    paths = [{"coords": np.stack([np.asarray(r["x"]), np.asarray(r["y"])],
                                 axis=1), "closed": True}
             for r in _mesh_rows(3)]
    want = find_junctions(paths)
    assert got == want


def test_arcs_match_in_process(ray_session):
    import ray.data as rd
    ds = rd.from_items(_mesh_rows(3))
    d_arcs, d_shapes = build_topology_ds(ds)
    l_arcs, l_shapes = build_topology(_mesh_features(3))
    # same number of shared arcs (12 inner + border pieces)
    assert len(d_arcs.nn) == len(l_arcs.nn)
    # identical total vertex mass
    assert d_arcs.nn.sum() == l_arcs.nn.sum()
    # per-feature ring geometry identical (modulo arc numbering):
    # reconstruct coordinates for each feature and compare as sets
    def ring_set(arcs, part_ids):
        x, y = arcs.path_coords(list(part_ids))
        return {(round(a, 9), round(b, 9)) for a, b in zip(x, y)}

    d_by_fid = {int(r["feature_id"]): r["signed_id"]
                for _, r in d_shapes.iterrows()}
    for fid, shape in enumerate(l_shapes):
        want = ring_set(l_arcs, shape[0])
        got = ring_set(d_arcs, d_by_fid[fid])
        assert got == want, fid


def test_polyline_network(ray_session):
    import ray.data as rd
    rows = [
        {"feature_id": 0, "part_id": 0, "x": [0.0, 1.0], "y": [0.0, 1.0]},
        {"feature_id": 1, "part_id": 0, "x": [2.0, 1.0], "y": [0.0, 1.0]},
        {"feature_id": 2, "part_id": 0, "x": [1.0, 1.0], "y": [2.0, 1.0]},
    ]
    ds = rd.from_items(rows)
    arcs, shapes = build_topology_ds(ds, closed=False)
    assert len(arcs.nn) == 3          # Y junction: three arcs
    assert len(shapes) == 3
