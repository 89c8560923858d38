"""Topology build + dissolve + innerlines tests on the FIXTURES.md shapes
(two adjacent polygons sharing a border = the two_states case; 3x2 mesh =
six_counties case)."""

import numpy as np

from mapshaper_ray.topo.arcs import ArcTable, abs_id
from mapshaper_ray.topo.build import build_topology
from mapshaper_ray.topo.dissolve import (classify_arcs, dissolve_shapes,
                                         innerlines, lines)


def square(x0, y0, x1, y1):
    return np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]],
                    dtype=float)


def two_adjacent():
    """Two squares sharing the x=1 edge (two_states.json analogue)."""
    a = square(0, 0, 1, 1)
    b = square(1, 0, 2, 1)
    return [[a], [b]]


def test_two_polygons_three_arcs():
    arcs, shapes = build_topology(two_adjacent())
    # shared border stored once -> 3 arcs (FIXTURES.md §2 expectation)
    assert len(arcs) == 3
    assert len(shapes) == 2
    # both shapes reference one common arc with opposite signs
    ids_a = {s for part in shapes[0] for s in part}
    ids_b = {s for part in shapes[1] for s in part}
    shared = {abs_id(s) for s in ids_a} & {abs_id(s) for s in ids_b}
    assert len(shared) == 1


def test_ring_roundtrip_coords():
    feats = two_adjacent()
    arcs, shapes = build_topology(feats)
    # reassembled ring must contain the same vertex set as the input ring
    for fi, f in enumerate(feats):
        x, y = arcs.path_coords(shapes[fi][0])
        got = set(zip(x, y))
        want = set(map(tuple, f[0]))
        assert got == want


def test_dissolve_melts_shared_border():
    arcs, shapes = build_topology(two_adjacent())
    groups = ["G", "G"]
    result = dissolve_shapes(shapes, groups, arcs)
    rings = result["G"]
    assert rings is not None and len(rings) == 1
    x, y = arcs.path_coords(rings[0])
    # dissolved ring must be the outer 1x2 rectangle: no interior x=1 border
    pts = set(zip(x, y))
    assert (0.0, 0.0) in pts and (2.0, 1.0) in pts
    # shared-border interior vertices are the endpoints of the shared arc
    # (1,0) and (1,1) — they remain as ring vertices, but the ring must
    # not traverse the border twice: total perimeter = 6
    per = np.sum(np.hypot(np.diff(np.r_[x, x[0]]), np.diff(np.r_[y, y[0]])))
    assert abs(per - 6.0) < 1e-9


def test_dissolve_two_groups_keeps_border():
    arcs, shapes = build_topology(two_adjacent())
    result = dissolve_shapes(shapes, ["A", "B"], arcs)
    assert len(result) == 2
    for g in ("A", "B"):
        x, y = arcs.path_coords(result[g][0])
        per = np.sum(np.hypot(np.diff(np.r_[x, x[0]]), np.diff(np.r_[y, y[0]])))
        assert abs(per - 4.0) < 1e-9


def test_innerlines_shared_edge_only():
    arcs, shapes = build_topology(two_adjacent())
    inner = innerlines(shapes)
    assert len(inner) == 1
    x, y = arcs.arc(inner[0])
    assert set(zip(x, y)) == {(1.0, 0.0), (1.0, 1.0)}
    all_arcs = lines(shapes)
    assert sorted(t for _, t in all_arcs) == ["inner", "outer", "outer"]


def mesh_3x2():
    """3x2 grid of unit squares + 3 null-geometry rows (FIXTURES.md §3)."""
    feats = []
    for r in range(2):
        for c in range(3):
            feats.append([square(c, r, c + 1, r + 1)])
    feats += [None, None, None]
    groups = ["A", "A", "B", "A", "A", "B", "A", "B", "A"]
    return feats, groups


def test_mesh_dissolve_groups():
    feats, groups = mesh_3x2()
    arcs, shapes = build_topology(feats)
    assert shapes[6] is None and shapes[7] is None and shapes[8] is None
    result = dissolve_shapes(shapes, groups, arcs)
    # group A = left 2x2 block, group B = right 1x2 column
    ax, ay = arcs.path_coords(result["A"][0])
    per_a = np.sum(np.hypot(np.diff(np.r_[ax, ax[0]]), np.diff(np.r_[ay, ay[0]])))
    assert abs(per_a - 8.0) < 1e-9
    bx, by = arcs.path_coords(result["B"][0])
    per_b = np.sum(np.hypot(np.diff(np.r_[bx, bx[0]]), np.diff(np.r_[by, by[0]])))
    assert abs(per_b - 6.0) < 1e-9


def test_classify_arcs_mesh():
    feats, _ = mesh_3x2()
    arcs, shapes = build_topology(feats)
    cls = classify_arcs(shapes)
    # interior vertical borders: x=1,x=2 (2 rows); horizontal y=1 (3 cols)
    inner_count = sum(1 for u in cls.values() if len(u) == 2)
    assert inner_count == 7  # 4 vertical + 3 horizontal shared edges


def test_arc_table_arrow_roundtrip():
    arcs, _ = build_topology(two_adjacent())
    t = arcs.to_arrow()
    back = ArcTable.from_arrow(t)
    assert np.array_equal(back.xx, arcs.xx)
    assert np.array_equal(back.yy, arcs.yy)
    assert np.array_equal(back.nn, arcs.nn)


def test_vectorized_build_matches_loop_randomized(ray_session):
    """The vectorized build_topology must produce the identical
    (ArcTable, shapes) decomposition as the per-vertex loop baseline on
    random shared-border meshes with multi-ring features and
    polylines."""
    from mapshaper_ray.topo.build import (_build_topology_loop,
                                          build_topology)
    rng = np.random.RandomState(11)
    for trial in range(6):
        g = rng.randint(2, 6)
        feats = []
        for i in range(g * g):
            r, c = divmod(i, g)
            ring = np.array([[c, r], [c + 1, r], [c + 1, r + 1],
                             [c, r + 1], [c, r]], dtype=float)
            parts = [ring]
            if rng.rand() < 0.3:  # occasional hole
                parts.append(np.array(
                    [[c + .2, r + .2], [c + .2, r + .8],
                     [c + .8, r + .8], [c + .8, r + .2],
                     [c + .2, r + .2]]))
            feats.append(parts)
        if rng.rand() < 0.5:
            feats.append(None)
        a_t, a_s = build_topology(feats)
        b_t, b_s = _build_topology_loop(feats)
        assert a_s == b_s, trial
        assert np.array_equal(a_t.xx, b_t.xx)
        assert np.array_equal(a_t.yy, b_t.yy)
        assert np.array_equal(a_t.nn, b_t.nn)

    # polylines (open paths)
    lines = [[np.array([[0., 0.], [1., 0.], [2., 0.]])],
             [np.array([[1., 0.], [1., 1.]])],
             [np.array([[2., 0.], [3., 0.]]),
              np.array([[0., 0.], [0., 1.]])]]
    a_t, a_s = build_topology(lines, closed=False)
    b_t, b_s = _build_topology_loop(lines, closed=False)
    assert a_s == b_s
    assert np.array_equal(a_t.xx, b_t.xx)
