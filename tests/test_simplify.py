"""Simplification threshold tests against reference-derived expected values
(test/visvalingam-test.js vectors; -simplify planar 0% case from
test/simplify-test.js:57-68)."""

import math

import numpy as np
import pytest

from mapshaper_ray.geom import simplify as S

INF = math.inf


def test_vw_two_vertex():
    kk = S.visvalingam_thresholds([0, 1], [0, 0], scaled=False)
    assert list(kk) == [INF, INF]


def test_vw_three_vertex():
    kk = S.visvalingam_thresholds([0, 1, 2], [0, 1, 0], scaled=False)
    assert list(kk) == [INF, 1.0, INF]


def test_vw_four_vertex_threshold_update():
    # reference: [Infinity, 0.5, 0.5, Infinity] — monotonic propagation
    kk = S.visvalingam_thresholds([0, 0, 1, 3], [0, 1, 0, 0], scaled=False)
    assert list(kk) == [INF, 0.5, 0.5, INF]


def test_vw_five_vertex_spike():
    kk = S.visvalingam_thresholds([0, 1, 1, 1, 2], [0, 0, 1, 0, 0], scaled=False)
    assert list(kk) == [INF, 0.0, 0.0, 0.0, INF]


def test_simplify_planar_0pct_removes_all_removable():
    # test/simplify-test.js:57-68: [[0,0],[0,1],[0.1,1.1],[0,1.2],[0,2]]
    # with planar 0% -> [[0,0],[0,2]]
    xx = np.array([0, 0, 0.1, 0, 0], dtype=float)
    yy = np.array([0, 1, 1.1, 1.2, 2], dtype=float)
    zz = S.visvalingam_thresholds(xx, yy, weighting=0.7)  # default weighted VW
    zlimit = S.threshold_by_pct(zz, 0.0)
    fx, fy = S.filter_arc_by_interval(xx, yy, zz, zlimit)
    assert list(fx) == [0, 0]
    assert list(fy) == [0, 2]


def test_dp_thresholds_shape():
    xx = np.array([0, 1, 2, 3, 4], dtype=float)
    yy = np.array([0, 1, 0, -1, 0], dtype=float)
    zz = S.dp_thresholds(xx, yy)
    assert zz[0] == INF and zz[-1] == INF
    assert np.all(zz[1:-1] >= 0)
    # max-deviation points get positive thresholds
    assert zz[1] > 0


def test_dp_parent_clamp():
    # child threshold never exceeds parent threshold
    xx = np.array([0, 1, 2, 3, 4, 5, 6], dtype=float)
    yy = np.array([0, 3, -1, 2, -3, 1, 0], dtype=float)
    zz = S.dp_thresholds(xx, yy)
    finite = zz[np.isfinite(zz)]
    assert np.max(finite) <= max(abs(yy)) * 2


def test_pct_threshold_roundtrip():
    rng = np.random.RandomState(7)
    zz = np.concatenate([[INF], rng.rand(100), [INF]])
    for pct in [0.1, 0.5, 0.9]:
        z = S.threshold_by_pct(zz, pct)
        back = S.pct_by_threshold(zz, z)
        assert abs(back - pct) < 0.05


def test_spherical_thresholds_endpoints_locked():
    lng = np.array([-100, -101, -105], dtype=float)
    lat = np.array([40, 42, 47], dtype=float)
    zz = S.spherical_thresholds(lng, lat)
    assert zz[0] == INF and zz[-1] == INF
    assert 0 < zz[1] < INF


def test_vw_scaled_linearization():
    # scaled thresholds = sqrt(area) * 0.65 for interior vertices
    raw = S.visvalingam_thresholds([0, 1, 2], [0, 1, 0], scaled=False)
    scaled = S.visvalingam_thresholds([0, 1, 2], [0, 1, 0], scaled=True)
    assert scaled[1] == pytest.approx(math.sqrt(raw[1]) * 0.65)
