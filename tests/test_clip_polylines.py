"""General polyline × polygon clip / erase / slice (reference
src/clipping/mapshaper-polyline-clipping.js semantics)."""

import numpy as np
import pytest


def _diamond():
    import ray.data as rd
    return rd.from_items([{
        "feature_id": 0,
        "rings_x": [[2.0, 3.5, 2.0, 0.5, 2.0]],
        "rings_y": [[0.5, 2.0, 3.5, 2.0, 0.5]],
        "ring_poly": [0]}])


def _hline(fid, y, x0=-1.0, x1=5.0):
    return {"feature_id": fid, "part_x": [[x0, x1]], "part_y": [[y, y]]}


def _lens(row):
    return [float(np.sum(np.hypot(np.diff(np.asarray(x)),
                                  np.diff(np.asarray(y)))))
            for x, y in zip(row["part_x"], row["part_y"])]


def test_clip_erase_slice_lines(ray_session):
    import ray.data as rd
    from mapshaper_ray.ops.clip import clip_polylines, slice_polylines
    lines = rd.from_items([_hline(0, 2.0), _hline(1, 0.75), _hline(2, 5.0)])
    clip = _diamond()

    out = clip_polylines(lines, clip, "clip").to_pandas() \
        .set_index("feature_id")
    assert sorted(out.index) == [0, 1]  # line 2 entirely outside
    assert np.allclose(_lens(out.loc[0]), [3.0])
    assert np.allclose(_lens(out.loc[1]), [0.5])

    out = clip_polylines(lines, clip, "erase").to_pandas() \
        .set_index("feature_id")
    assert np.allclose(sorted(_lens(out.loc[0])), [1.5, 1.5])
    assert np.allclose(_lens(out.loc[2]), [6.0])

    out = slice_polylines(lines, clip).to_pandas().set_index("feature_id")
    assert list(out.loc[0]["part_inside"]) == [False, True, False]
    assert np.allclose(_lens(out.loc[0]), [1.5, 3.0, 1.5])


def test_clip_lines_with_hole(ray_session):
    """A clip polygon with a hole: the piece over the hole is erased by
    even-odd containment."""
    import ray.data as rd
    from mapshaper_ray.ops.clip import clip_polylines
    donut = rd.from_items([{
        "feature_id": 0,
        "rings_x": [[0.0, 6.0, 6.0, 0.0, 0.0], [2.0, 4.0, 4.0, 2.0, 2.0]],
        "rings_y": [[0.0, 0.0, 6.0, 6.0, 0.0], [2.0, 2.0, 4.0, 4.0, 2.0]],
        "ring_poly": [0, 0]}])
    lines = rd.from_items([_hline(0, 3.0, -1.0, 7.0)])
    out = clip_polylines(lines, donut, "clip").to_pandas()
    # kept: [0,2] and [4,6] — the hole span [2,4] drops
    assert np.allclose(sorted(_lens(out.iloc[0])), [2.0, 2.0])


def test_clip_multipart_and_diagonal(ray_session):
    import ray.data as rd
    from mapshaper_ray.ops.clip import clip_polylines
    lines = rd.from_items([{
        "feature_id": 7,
        "part_x": [[0.0, 4.0], [2.0, 2.0]],
        "part_y": [[0.0, 4.0], [-1.0, 5.0]]}])
    out = clip_polylines(lines, _diamond(), "clip").to_pandas()
    lens = _lens(out.iloc[0])
    # diagonal through center: chord of the diamond along y=x is
    # 1.5*sqrt(2); vertical line keeps the full diamond height 3.0
    assert np.allclose(sorted(lens), [1.5 * np.sqrt(2), 3.0])


def test_clip_polylines_matches_rect_kernel_randomized(ray_session):
    """Cross-implementation check: clipping random polylines against a
    RECTANGLE polygon via the general cut+classify path must keep the
    same total length as the independent Liang-Barsky rect kernel."""
    import ray.data as rd
    from mapshaper_ray.ops.clip import _clip_segments, clip_polylines
    rng = np.random.RandomState(7)
    rect = (2.0, 2.0, 7.0, 6.0)
    rect_ds = rd.from_items([{
        "feature_id": 0,
        "rings_x": [[rect[0], rect[2], rect[2], rect[0], rect[0]]],
        "rings_y": [[rect[1], rect[1], rect[3], rect[3], rect[1]]],
        "ring_poly": [0]}])
    rows = []
    expected = []
    for i in range(20):
        n = rng.randint(3, 9)
        x = np.round(rng.uniform(0, 9, n), 3)
        y = np.round(rng.uniform(0, 8, n), 3)
        rows.append({"feature_id": i, "part_x": [x.tolist()],
                     "part_y": [y.tolist()]})
        parts = _clip_segments(x, y, rect)
        expected.append(sum(
            float(np.sum(np.hypot(np.diff(px), np.diff(py))))
            for px, py in parts))
    out = clip_polylines(rd.from_items(rows), rect_ds, "clip") \
        .to_pandas().set_index("feature_id")
    for i in range(20):
        got = 0.0
        if i in out.index:
            got = sum(float(np.sum(np.hypot(np.diff(np.asarray(px)),
                                            np.diff(np.asarray(py)))))
                      for px, py in zip(out.loc[i]["part_x"],
                                       out.loc[i]["part_y"]))
        assert abs(got - expected[i]) < 1e-9, (i, got, expected[i])
