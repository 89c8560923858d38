"""S2 cell-id scheme (mapshaper_ray/s2.py).

No S2 library exists in this container, so correctness is established
structurally: hand-derivable anchor ids (face centers encode to
face<<61 | 1<<60 | trailing-1 by construction of the curve's first
digit), encode/decode roundtrips, parent/range/children algebra, the
Hilbert continuity property (consecutive ids at a level are
edge-adjacent within a face, and globally consecutive centers are
never farther than a cell diameter apart — catches any wrong table
entry or orientation-seed bug), and conservative-cover guarantees
(every interior point of a polygon lands inside the cover; far-away
points do not).
"""

import numpy as np
import pytest

from mapshaper_ray import s2


def test_face_center_anchors():
    lon = [0, 90, 0, 180, -90, 0]
    lat = [0, 0, 90, 0, 0, -90]
    ids = s2.lonlat_to_cell_id(lon, lat, 30)
    face, i, j, level = s2.decode(ids)
    assert list(face) == [0, 1, 2, 3, 4, 5]
    assert (level == 30).all()
    # centers hit the exact ST midpoint (i = 2^29) on their faces
    # ((0,180) sits on a face edge: sin(pi) rounds j down by one)
    assert (i == 1 << 29).all()
    assert (np.abs(j - (1 << 29)) <= 1).all()
    # level-0 id of face f is f<<61 | 1<<60
    p0 = s2.parent(ids, 0)
    assert [int(v) for v in p0] == [(f << 61) | (1 << 60)
                                    for f in range(6)]


def test_roundtrip_all_levels():
    rng = np.random.default_rng(42)
    lon = rng.uniform(-180, 180, 2000)
    lat = rng.uniform(-90, 90, 2000)
    for lv in (0, 1, 4, 9, 17, 30):
        ids = s2.lonlat_to_cell_id(lon, lat, lv)
        assert (s2.cell_id_level(ids) == lv).all()
        clon, clat = s2.cell_center_lonlat(ids)
        assert (s2.lonlat_to_cell_id(clon, clat, lv) == ids).all()


def test_parent_range_children():
    rng = np.random.default_rng(1)
    lon = rng.uniform(-180, 180, 500)
    lat = rng.uniform(-90, 90, 500)
    leaf = s2.lonlat_to_cell_id(lon, lat, 30)
    for lv in (0, 2, 11, 29):
        p = s2.parent(leaf, lv)
        assert (p == s2.lonlat_to_cell_id(lon, lat, lv)).all()
        assert (s2.range_min(p) <= leaf).all()
        assert (leaf <= s2.range_max(p)).all()
    mid = s2.lonlat_to_cell_id(lon, lat, 7)
    ch = s2.children(mid)
    assert (s2.parent(ch.ravel(), 7) == np.repeat(mid, 4)).all()
    assert (s2.range_min(ch[:, 0]) == s2.range_min(mid)).all()
    assert (s2.range_max(ch[:, 3]) == s2.range_max(mid)).all()
    # children are disjoint, ordered, and tile the parent's leaf range
    # (consecutive ranges are separated by exactly one even non-leaf
    # value — leaf ids are odd, so no leaf falls in the gap)
    assert (s2.range_min(ch[:, 1:]) ==
            s2.range_max(ch[:, :3]) + np.uint64(2)).all()


def test_hilbert_adjacency_within_face():
    # all cells of one face at level 4, in id order: every consecutive
    # pair must be edge neighbors (the defining Hilbert property; any
    # wrong kIJtoPos/kPosToOrientation entry breaks it)
    lv, n = 4, 1 << 4
    for f in range(6):
        ii, jj = np.meshgrid(np.arange(n), np.arange(n))
        ids = s2._encode(np.full(n * n, f), ii.ravel(), jj.ravel(), lv)
        order = np.argsort(ids)
        fi, fj = ii.ravel()[order], jj.ravel()[order]
        step = np.abs(np.diff(fi)) + np.abs(np.diff(fj))
        assert (step == 1).all(), f"face {f} curve breaks adjacency"


def test_global_curve_continuity():
    # consecutive ids across the whole sphere (level 3): center
    # distance never exceeds ~one cell diagonal, including at face
    # seams — checks the per-face orientation seed (face & swap)
    lv, n = 3, 1 << 3
    f, ii, jj = np.meshgrid(np.arange(6), np.arange(n), np.arange(n),
                            indexing="ij")
    ids = np.sort(s2._encode(f.ravel(), ii.ravel(), jj.ravel(), lv))
    lon, lat = s2.cell_center_lonlat(ids)
    from mapshaper_ray.geom.kernels import great_circle_distance
    d = great_circle_distance(lon[:-1], lat[:-1], lon[1:], lat[1:])
    R = 6378137.0
    cell_diag = (np.pi / 2) / n * np.sqrt(2) * 1.3 * R
    assert d.max() <= cell_diag, (d.max(), cell_diag)


def test_token_roundtrip():
    rng = np.random.default_rng(3)
    lon = rng.uniform(-180, 180, 200)
    lat = rng.uniform(-90, 90, 200)
    for lv in (2, 13, 30):
        ids = s2.lonlat_to_cell_id(lon, lat, lv)
        toks = s2.token(ids)
        assert (s2.token_to_id(toks) == ids).all()
        assert all(not t.endswith("0") for t in toks)


def _sample_inside(rings, n, rng):
    ex = np.concatenate([r[0] for r in rings])
    ey = np.concatenate([r[1] for r in rings])
    from mapshaper_ray.geom.kernels import points_in_shape
    px = rng.uniform(ex.min(), ex.max(), n * 4)
    py = rng.uniform(ey.min(), ey.max(), n * 4)
    keep = points_in_shape(px, py, rings)
    return px[keep][:n], py[keep][:n]


@pytest.mark.parametrize("interior", [True, False])
def test_polygon_cover_conservative(interior):
    rng = np.random.default_rng(7)
    # irregular star-ish polygon around a random center
    cx, cy = 12.0, 47.0
    ang = np.linspace(0, 2 * np.pi, 24)
    rad = 3.0 + rng.uniform(-1.2, 1.2, 24)
    rad[-1] = rad[0]
    rx = cx + rad * np.cos(ang)
    ry = cy + rad * np.sin(ang)
    rings = [(rx, ry)]
    lv = 8
    cover = s2.polygon_cover(rings, lv, interior_shortcut=interior)
    assert len(cover) > 4
    if not interior:
        assert (s2.cell_id_level(cover) == lv).all()
    # every interior point must fall in the cover
    px, py = _sample_inside(rings, 500, rng)
    leafs = s2.lonlat_to_cell_id(px, py, 30)
    assert s2.cover_contains(cover, leafs).all()
    # far-away points must not (conservative pad at level 8 << 3 deg)
    fx = np.array([cx + 12.0, cx - 12.0, cx, -150.0])
    fy = np.array([cy, cy, cy - 15.0, -60.0])
    far = s2.lonlat_to_cell_id(fx, fy, 30)
    assert not s2.cover_contains(cover, far).any()


def test_polygon_cover_pole():
    # planar lonlat "cap" ring around the north pole
    rx = np.array([-180.0, 180.0, 180.0, -180.0, -180.0])
    ry = np.array([84.0, 84.0, 90.0, 90.0, 84.0])
    cover = s2.polygon_cover([(rx, ry)], 6)
    pts = s2.lonlat_to_cell_id([0.0, 120.0, -90.0, 33.0],
                               [89.9, 86.0, 85.0, 88.5], 30)
    assert s2.cover_contains(cover, pts).all()
    # equator far from the cap is excluded
    eq = s2.lonlat_to_cell_id([0.0, 90.0], [0.0, -45.0], 30)
    assert not s2.cover_contains(cover, eq).any()


def test_cover_cells_near_polygon():
    # looseness bound: every cover cell's center lies within a few
    # cell diameters of the polygon bbox (covers are conservative but
    # not unboundedly loose)
    rx = np.array([10.0, 20.0, 20.0, 10.0, 10.0])
    ry = np.array([40.0, 40.0, 48.0, 48.0, 40.0])
    lv = 7
    cover = s2.polygon_cover([(rx, ry)], lv, interior_shortcut=False)
    lon, lat = s2.cell_center_lonlat(cover)
    pad = 3 * 90.0 / (1 << lv)
    assert (lon >= 10 - pad).all() and (lon <= 20 + pad).all()
    assert (lat >= 40 - pad).all() and (lat <= 48 + pad).all()


def test_cover_as_spatial_join_prefilter():
    # the flagship's diamond regions: an S2 cover of each region must
    # contain every point the exact PIP join assigns to it (the
    # cover-prefilter-then-verify join pattern never loses a match)
    from mapshaper_ray.geom.kernels import points_in_shape
    from mapshaper_ray.regions import diamond, region_centers
    rng = np.random.default_rng(11)
    px = rng.uniform(-180, 180, 4000)
    py = rng.uniform(-90, 90, 4000)
    leafs = s2.lonlat_to_cell_id(px, py, 30)
    for rid, cx, cy in region_centers()[:6]:
        ring = diamond(cx, cy)
        inside = points_in_shape(px, py, [(ring[:, 0], ring[:, 1])])
        cover = s2.polygon_cover([(ring[:, 0], ring[:, 1])], 7)
        hit = s2.cover_contains(cover, leafs)
        assert (hit | ~inside).all(), f"region {rid} lost PIP matches"
        # the prefilter actually prunes (cover is not the whole sphere)
        assert hit.sum() < len(px) * 0.5


def test_lookup_encode_matches_bitwise():
    # the 4-bit block tables must reproduce the per-bit reference walk
    # at every level (incl. partial top blocks)
    rng = np.random.default_rng(21)
    f = rng.integers(0, 6, 20000)
    for lv in (0, 1, 2, 3, 4, 5, 7, 13, 22, 30):
        n = max(1 << lv, 1)
        i = rng.integers(0, n, 20000)
        j = rng.integers(0, n, 20000)
        assert (s2._encode(f, i, j, lv) ==
                s2._encode_bitwise(f, i, j, lv)).all(), lv
