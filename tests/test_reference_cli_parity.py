"""Parity against the ACTUAL reference implementation, run live.

scripts/build_reference_cli.py assembles a runnable copy of the
reference CLI under /tmp/refjs (catty-style concatenation of its
sources + npm deps shimmed from its own browserify bundle).  Each test
runs a reference command line and this engine's `run_commands` on the
SAME input and diffs the outputs.

Exactness levels, and why:
- dissolve / innerlines / simplify(planar): coordinate-EXACT — the
  engine reproduces the reference's arithmetic bit-for-bit (planar
  DP/VW/weighted-VW threshold arrays verified bit-identical on
  two_states during development).
- centroids / clip(bbox) / proj: 1e-6 / 1e-9 tolerance — identical
  formulas, but different summation order (vectorized vs streaming)
  leaves float noise.
- spherical simplify is NOT tested exactly: V8 and glibc trig differ
  in the last ulp, which cancellation amplifies past any fixed
  tolerance at the rank boundary.
"""

import json
import shutil
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo/scripts")

from mapshaper_ray.commands import run_commands

TWO_STATES = "/root/reference/test/test_data/two_states.shp"
SIX_COUNTIES = "/root/reference/test/test_data/six_counties.shp"
THREE_POINTS = "/root/reference/test/test_data/three_points.geojson"

pytestmark = pytest.mark.skipif(shutil.which("node") is None,
                                reason="node unavailable")


@pytest.fixture(scope="session")
def ref_cli():
    from build_reference_cli import build
    return build()


def ref_run(ref_cli, args):
    subprocess.run(["node", ref_cli, *args], check=True,
                   capture_output=True, timeout=120)


def geoms(path):
    doc = json.load(open(path))
    if "features" in doc:
        return [f["geometry"] for f in doc["features"]]
    return doc["geometries"]


def canon_ring(coords, nd=None):
    pts = [tuple(p) if nd is None else tuple(round(v, nd) for v in p)
           for p in coords[:-1]]
    best = None
    for seq in (pts, pts[::-1]):
        i = min(range(len(seq)), key=lambda k: seq[k])
        rot = seq[i:] + seq[:i]
        best = rot if best is None or rot < best else best
    return tuple(best)


def all_rings(path, nd=None):
    out = []
    for g in geoms(path):
        if g is None:
            continue
        if g["type"] == "Polygon":
            out.extend(canon_ring(r, nd) for r in g["coordinates"])
        elif g["type"] == "MultiPolygon":
            out.extend(canon_ring(r, nd)
                       for poly in g["coordinates"] for r in poly)
    return sorted(out)


def all_chains(path):
    out = []
    for g in geoms(path):
        if g is None:
            continue
        cs = [g["coordinates"]] if g["type"] == "LineString" \
            else g["coordinates"]
        for c in cs:
            pts = [tuple(p) for p in c]
            out.append(tuple(pts if pts <= pts[::-1] else pts[::-1]))
    return sorted(out)


def test_dissolve_six_counties_exact(ray_session, ref_cli, tmp_path):
    ref = tmp_path / "ref.json"
    ours = tmp_path / "ours.json"
    ref_run(ref_cli, [SIX_COUNTIES, "-dissolve", "-o", str(ref)])
    run_commands(f"-i {SIX_COUNTIES} -dissolve -o {ours}")
    assert all_rings(str(ours)) == all_rings(str(ref))


def test_innerlines_two_states_exact(ray_session, ref_cli, tmp_path):
    ref = tmp_path / "ref.json"
    ours = tmp_path / "ours.json"
    ref_run(ref_cli, [TWO_STATES, "-innerlines", "-o", str(ref)])
    run_commands(f"-i {TWO_STATES} -innerlines -o {ours}")
    assert all_chains(str(ours)) == all_chains(str(ref))


@pytest.mark.parametrize("ref_args,our_spec", [
    # planar: bit-exact thresholds
    (["-simplify", "dp", "30%", "planar", "no-repair"],
     "dp planar 30% no-repair"),
    (["-simplify", "visvalingam", "40%", "planar", "no-repair"],
     "visvalingam planar 40% no-repair"),
    (["-simplify", "55%", "planar", "no-repair"],
     "planar 55% no-repair"),
    # DEFAULT chain (weighted VW + spherical auto) and spherical dp —
    # trig ulp differences exist but flip no vertex on this fixture
    (["-simplify", "50%", "no-repair"], "50% no-repair"),
    (["-simplify", "dp", "35%", "no-repair"], "dp 35% no-repair"),
    (["-simplify", "interval=3000", "no-repair"],
     "interval=3000 no-repair"),
])
def test_simplify_planar_exact(ray_session, ref_cli, tmp_path,
                               ref_args, our_spec):
    ref = tmp_path / "ref.json"
    ours = tmp_path / "ours.json"
    ref_run(ref_cli, [TWO_STATES, *ref_args, "-o", str(ref)])
    run_commands(f"-i {TWO_STATES} -simplify {our_spec} -o {ours}")
    assert all_rings(str(ours)) == all_rings(str(ref))


def test_centroids_six_counties(ray_session, ref_cli, tmp_path):
    ref = tmp_path / "ref.json"
    ours = tmp_path / "ours.json"
    ref_run(ref_cli, [SIX_COUNTIES, "-points", "centroid",
                      "-o", str(ref)])
    run_commands(f"-i {SIX_COUNTIES} -points centroid -o {ours}")
    a = [g["coordinates"] for g in geoms(str(ours))]
    b = [g["coordinates"] for g in geoms(str(ref))]
    assert len(a) == len(b)
    # summation-order float noise only (reference streams pairwise
    # cross-sums; we vectorize)
    assert np.allclose(np.array(a), np.array(b), rtol=0, atol=1e-6)


def test_clip_bbox_two_states(ray_session, ref_cli, tmp_path):
    ref = tmp_path / "ref.json"
    ours = tmp_path / "ours.json"
    bb = "bbox=-124,40,-118,46"
    ref_run(ref_cli, [TWO_STATES, "-clip", bb, "-o", str(ref)])
    run_commands(f"-i {TWO_STATES} -clip {bb} -o {ours}")
    # intersection vertices carry ~1e-13 arithmetic noise: compare at
    # 9 decimals (~0.1mm), ring-canonicalized
    assert all_rings(str(ours), nd=9) == all_rings(str(ref), nd=9)


def test_proj_webmercator_points(ray_session, ref_cli, tmp_path):
    ref = tmp_path / "ref.json"
    ours = tmp_path / "ours.json"
    ref_run(ref_cli, [THREE_POINTS, "-proj", "webmercator",
                      "-o", str(ref)])
    run_commands(f"-i {THREE_POINTS} -proj webmercator -o {ours}")
    a = np.array([g["coordinates"] for g in geoms(str(ours))], float)
    b = np.array([g["coordinates"] for g in geoms(str(ref))], float)
    assert a.shape == b.shape
    assert np.allclose(a, b, rtol=1e-9, atol=1e-6)


def test_lines_six_counties_exact(ray_session, ref_cli, tmp_path):
    ref = tmp_path / "ref.json"
    ours = tmp_path / "ours.json"
    ref_run(ref_cli, [SIX_COUNTIES, "-lines", "-o", str(ref)])
    run_commands(f"-i {SIX_COUNTIES} -lines -o {ours}")
    # chain-exact including part merging and the ring wrap rule
    assert all_chains(str(ours)) == all_chains(str(ref))
    doc = json.load(open(ours))
    types = {f["properties"]["TYPE"] for f in doc["features"]}
    assert types == {"inner", "outer"}


@pytest.mark.parametrize("crit", ["min-area=100km2", "min-vertices=20"])
def test_filter_islands_exact(ray_session, ref_cli, tmp_path, crit):
    ref = tmp_path / "ref.json"
    ours = tmp_path / "ours.json"
    ref_run(ref_cli, [SIX_COUNTIES, "-filter-islands", crit,
                      "-o", str(ref)])
    run_commands(f"-i {SIX_COUNTIES} -filter-islands {crit} -o {ours}")
    assert all_rings(str(ours)) == all_rings(str(ref))


@pytest.mark.parametrize("cmd", ["-dissolve2", "-clean"])
def test_dissolve2_clean_exact(ray_session, ref_cli, tmp_path, cmd):
    """Keyless -dissolve2 (merge everything) and -clean (repair
    overlaps/gaps, keep features) through the ported reference mosaic
    (topo/refclip.py dissolve2 port) — coordinate-exact, including the
    self-intersecting DC sliver the old face arrangement misassigned."""
    ref = tmp_path / "ref.json"
    ours = tmp_path / "ours.json"
    ref_run(ref_cli, [SIX_COUNTIES, cmd, "-o", str(ref)])
    run_commands(f"-i {SIX_COUNTIES} {cmd} -o {ours}")
    assert all_rings(str(ours)) == all_rings(str(ref))


def test_points_inner_exact(ray_session, ref_cli, tmp_path):
    """Anchor placement is a faithful port (simplifyPolygonFast →
    probe → vertical scan → refine) over topology-rotated rings —
    coordinates match the reference bit-for-bit."""
    ref = tmp_path / "ref.json"
    ours = tmp_path / "ours.json"
    ref_run(ref_cli, [TWO_STATES, "-points", "inner", "-o", str(ref)])
    run_commands(f"-i {TWO_STATES} -points inner -o {ours}")
    a = sorted(tuple(g["coordinates"]) for g in geoms(str(ours)) if g)
    b = sorted(tuple(g["coordinates"]) for g in geoms(str(ref)) if g)
    assert a == b


def _write_tri(path, cw):
    tri = [[-124, 42], [-120, 48], [-118, 44], [-124, 42]] if cw else \
        [[-124, 42], [-118, 44], [-120, 48], [-124, 42]]
    json.dump({"type": "FeatureCollection", "features": [
        {"type": "Feature", "properties": {},
         "geometry": {"type": "Polygon", "coordinates": [tri]}}]},
        open(path, "w"))


@pytest.mark.parametrize("cw", [True, False])
def test_polygon_clip_exact(ray_session, ref_cli, tmp_path, cw):
    """General polygon-layer clip through the ported reference
    pathfinder (topo/refclip.py) — coordinate-exact on the reference's
    own DEFECTIVE two_states fixture (whose state borders cross ~49
    times; the old mosaic arrangement broke on it)."""
    tri = tmp_path / "tri.json"
    _write_tri(str(tri), cw)
    ref = tmp_path / "ref.json"
    ours = tmp_path / "ours.json"
    ref_run(ref_cli, [TWO_STATES, "-clip", str(tri), "-o", str(ref)])
    run_commands(f"-i {TWO_STATES} -clip {tri} -o {ours}")
    assert all_rings(str(ours)) == all_rings(str(ref))


@pytest.mark.parametrize("cw", [True, False])
def test_polygon_erase_near_exact(ray_session, ref_cli, tmp_path, cw):
    """Erase keeps the defective shared border in the output, where ONE
    snapped vertex differs from the reference in its last ulp (the
    snap winner between two near-duplicate source vertices depends on
    vertex-array order) — compare at 12 decimals."""
    tri = tmp_path / "tri.json"
    _write_tri(str(tri), cw)
    ref = tmp_path / "ref.json"
    ours = tmp_path / "ours.json"
    ref_run(ref_cli, [TWO_STATES, "-erase", str(tri), "-o", str(ref)])
    run_commands(f"-i {TWO_STATES} -erase {tri} -o {ours}")
    assert all_rings(str(ours), nd=12) == all_rings(str(ref), nd=12)


@pytest.mark.parametrize("spec,ref_args,atol", [
    ("robinson", ["-proj", "robinson"], 0.0),
    ("albersusa", ["-proj", "albersusa"], 1e-8),
    ("+proj=aea +lat_1=29.5 +lat_2=45.5 +lat_0=23 +lon_0=-96",
     ["-proj", "+proj=aea", "+lat_1=29.5", "+lat_2=45.5", "+lat_0=23",
      "+lon_0=-96"], 1e-8),
    ("+proj=lcc +lat_1=33 +lat_2=45 +lat_0=23 +lon_0=-96",
     ["-proj", "+proj=lcc", "+lat_1=33", "+lat_2=45", "+lat_0=23",
      "+lon_0=-96"], 1e-7),
    # round-3 families (PJ_stere/PJ_laea/PJ_eqdc ports)
    ("+proj=stere +lat_0=90 +lat_ts=70",
     ["-proj", "+proj=stere", "+lat_0=90", "+lat_ts=70"], 1e-8),
    ("+proj=stere +lat_0=52 +lon_0=5 +k_0=0.9999079",
     ["-proj", "+proj=stere", "+lat_0=52", "+lon_0=5",
      "+k_0=0.9999079"], 1e-7),
    ("+proj=laea +lat_0=52 +lon_0=10",
     ["-proj", "+proj=laea", "+lat_0=52", "+lon_0=10"], 1e-8),
    ("+proj=laea +lat_0=90",
     ["-proj", "+proj=laea", "+lat_0=90"], 1e-8),
    ("+proj=eqdc +lat_1=20 +lat_2=60 +lat_0=40 +lon_0=-96",
     ["-proj", "+proj=eqdc", "+lat_1=20", "+lat_2=60", "+lat_0=40",
      "+lon_0=-96"], 1e-8),
])
def test_proj_vs_mproj(ray_session, ref_cli, tmp_path, spec, ref_args,
                       atol):
    """Ellipsoidal projections vs the actual mproj running inside the
    reference CLI: robinson is BIT-exact (same float32 table + cubic);
    aea/lcc/albersusa agree to ~1e-8 m (iteration/summation ulps)."""
    ref = tmp_path / "ref.json"
    ours = tmp_path / "ours.json"
    ref_run(ref_cli, [THREE_POINTS, *ref_args, "-o", str(ref)])
    run_commands(f"-i {THREE_POINTS} -proj {spec} -o {ours}")
    a = np.array([g["coordinates"] for g in geoms(str(ours))], float)
    b = np.array([g["coordinates"] for g in geoms(str(ref))], float)
    assert a.shape == b.shape
    if atol == 0.0:
        assert (a == b).all()
    else:
        assert np.allclose(a, b, rtol=0, atol=atol)


# round-3 wide-family batch: per-family in-domain probe points (the
# azimuthal/national families error outside their hemisphere/zone in
# mproj too, so each spec carries its own domain)
_WORLD_PTS = [(-96.5, 38.2), (12.3, 48.7), (150.1, -33.9),
              (-70.2, -54.8), (5.1, 52.2), (0.0, 0.0),
              (-179.5, 71.2), (24.8, 60.2)]


@pytest.mark.parametrize("spec,pts", [
    ("+proj=ortho +lat_0=40 +lon_0=-100",
     [(-96.5, 38.2), (-120.3, 48.7), (-80.1, 25.9), (-140.5, 60.2)]),
    ("+proj=gnom +lat_0=90",
     [(-96.5, 68.2), (12.3, 48.7), (0.0, 89.0), (-179.5, 71.2)]),
    ("+proj=natearth", _WORLD_PTS),
    ("+proj=eck1", _WORLD_PTS),
    ("+proj=eck2", _WORLD_PTS),
    ("+proj=eck3", _WORLD_PTS),
    ("+proj=eck4", _WORLD_PTS),
    ("+proj=eck5", _WORLD_PTS),
    ("+proj=eck6", _WORLD_PTS),
    ("+proj=kav7", _WORLD_PTS),
    ("+proj=hammer", _WORLD_PTS),
    ("+proj=aitoff", _WORLD_PTS),
    ("+proj=wintri", _WORLD_PTS),
    ("+proj=wintri +lat_1=40", _WORLD_PTS),
    ("+proj=vandg", _WORLD_PTS),
    ("+proj=loxim +lat_1=40", _WORLD_PTS),
    ("+proj=times", _WORLD_PTS),
    ("+proj=tcea", _WORLD_PTS),
    ("+proj=goode", _WORLD_PTS),
    # national grids (EPSG definitions: RD New, CH1903/LV03, S-JTSK,
    # Kertau RSO, NZMG) — ellipsoidal, wrap-sensitive
    ("+proj=sterea +lat_0=52.15616055555555 +lon_0=5.38763888888889"
     " +k=0.9999079 +x_0=155000 +y_0=463000 +ellps=bessel",
     [(5.38, 52.15), (4.3, 51.9), (6.9, 53.2), (-179.5, 71.2)]),
    ("+proj=somerc +lat_0=46.95240555555556 +lon_0=7.439583333333333"
     " +k_0=1 +x_0=600000 +y_0=200000 +ellps=bessel",
     [(7.44, 46.95), (6.1, 46.2), (9.8, 47.5), (150.1, -33.9)]),
    ("+proj=krovak",
     [(14.42, 50.08), (17.1, 48.8), (12.9, 50.5), (-96.5, 38.2)]),
    ("+proj=poly +lat_0=30 +lon_0=-90", _WORLD_PTS),
    ("+proj=bonne +lat_1=45", _WORLD_PTS),
    ("+proj=omerc +lat_0=4 +lonc=102.25 +alpha=323.0257964666666"
     " +k=0.99984 +x_0=804671",
     [(102.25, 4.0), (101.7, 3.15), (103.8, 1.35), (100.3, 5.4)]),
    ("+proj=nzmg",
     [(173.0, -41.0), (174.7, -36.85), (170.5, -45.87),
      (168.0, -44.0)]),
    # azimuthal equidistant: pj_mlfn-based modes (polar N/S + Guam);
    # the oblique ellipsoidal mode is geodesic-based and unsupported
    ("+proj=aeqd +lat_0=90",
     [(-96.5, 68.2), (12.3, 48.7), (0.0, 89.0), (-179.5, 71.2)]),
    ("+proj=aeqd +lat_0=-90 +lon_0=30",
     [(150.1, -33.9), (-70.2, -54.8), (0.0, -89.0), (30.0, -60.0)]),
    ("+proj=aeqd +lat_0=13.47246635277778 +lon_0=144.7487507055556"
     " +x_0=50000 +y_0=50000 +guam",
     [(144.75, 13.47), (144.65, 13.25), (144.95, 13.65),
      (144.8, 13.5)]),
])
def test_proj_family_batch_vs_mproj(ray_session, ref_cli, tmp_path,
                                    spec, pts):
    """Round-3 world + national-grid families vs live mproj: same
    formulas (pj_* ports incl. the generic pj_fwd adjlon wrap), agree
    to <=2e-8 m everywhere probed."""
    src = tmp_path / "pts.json"
    src.write_text(json.dumps({
        "type": "FeatureCollection",
        "features": [{"type": "Feature", "properties": {"i": i},
                      "geometry": {"type": "Point",
                                   "coordinates": list(p)}}
                     for i, p in enumerate(pts)]}))
    ref = tmp_path / "ref.json"
    ours = tmp_path / "ours.json"
    ref_run(ref_cli, [str(src), "-proj", *spec.split(), "-o",
                      "precision=0.000000001", str(ref)])
    run_commands(f"-i {src} -proj {spec} -o precision=0.000000001 "
                 f"{ours}")
    a = np.array([g["coordinates"] for g in geoms(str(ours))], float)
    b = np.array([g["coordinates"] for g in geoms(str(ref))], float)
    assert a.shape == b.shape
    scale = np.maximum(1.0, np.abs(b))
    assert np.all(np.abs(a - b) / scale < 1e-7), \
        f"max abs diff {np.max(np.abs(a - b)):.3e}"


# round-4 long-tail batch: the remaining mproj spherical families
# (pseudocylindricals + misc-spherical, several forward-only in mproj
# too) plus pj_ups. Parameterized families probe non-default params.
_R4_WORLD = [(10.0, 20.0), (-60.0, -35.0), (120.0, 55.0),
             (-150.0, 70.0), (0.5, -0.25), (179.0, -80.0)]
_R4_SPECS = [
    "+proj=putp1", "+proj=putp2", "+proj=putp3", "+proj=putp3p",
    "+proj=putp4p", "+proj=weren", "+proj=putp5", "+proj=putp5p",
    "+proj=putp6", "+proj=putp6p", "+proj=wag1", "+proj=wag2",
    "+proj=wag3 +lat_ts=30", "+proj=wag4", "+proj=wag5",
    "+proj=wag7", "+proj=wink1 +lat_ts=20", "+proj=wink2 +lat_1=20",
    "+proj=urm5 +n=0.9 +q=0.5 +alpha=10", "+proj=urmfps +n=0.8",
    "+proj=kav5", "+proj=qua_aut", "+proj=fouc", "+proj=mbt_s",
    "+proj=mbt_fpp", "+proj=mbt_fpq", "+proj=mbt_fps",
    "+proj=mbtfps", "+proj=gn_sinu +m=1 +n=2", "+proj=nell",
    "+proj=nell_h", "+proj=hatano", "+proj=boggs", "+proj=crast",
    "+proj=denoy", "+proj=gins8", "+proj=august", "+proj=bacon",
    "+proj=apian", "+proj=ortel", "+proj=vandg2", "+proj=vandg3",
    "+proj=vandg4", "+proj=ups", "+proj=ups +south",
]


@pytest.mark.parametrize("spec", _R4_SPECS)
def test_proj_round4_batch_vs_mproj(ray_session, ref_cli, tmp_path,
                                    spec):
    """Round-4 long-tail families vs live mproj on the same world
    probe grid (gilbert's back hemisphere excluded — both engines
    reject it)."""
    pts = _R4_WORLD
    if spec.startswith("+proj=ups"):
        pts = [(p[0], -abs(p[1]) if "south" in spec else abs(p[1]))
               for p in _R4_WORLD if abs(p[1]) >= 20]
    test_proj_family_batch_vs_mproj(
        ray_session, ref_cli, tmp_path, spec, pts)


# round-4 batch 2: the remaining mproj families (full pj_list
# coverage except 3D geocent).  Conics probe non-default lat_1/lat_2;
# the azimuthal/perspective/polynomial-grid families use in-domain
# points (mproj errors outside them too); chamb stays within |dlam|,
# |dphi| < 1 rad of its control points (beyond that mproj's vect()
# hits its own `cs1` ReferenceError).
_R4B2_NA = [(-96.5, 38.2), (-120.3, 48.7), (-80.1, 25.9)]
_R4B2_SPECS = [
    ("+proj=euler +lat_1=20 +lat_2=60", _R4_WORLD),
    ("+proj=murd1 +lat_1=20 +lat_2=60", _R4_WORLD),
    ("+proj=murd2 +lat_1=20 +lat_2=60", _R4_WORLD),
    ("+proj=murd3 +lat_1=20 +lat_2=60", _R4_WORLD),
    ("+proj=pconic +lat_1=20 +lat_2=60 +lat_0=40", _R4_WORLD),
    ("+proj=tissot +lat_1=20 +lat_2=60", _R4_WORLD),
    ("+proj=vitk1 +lat_1=20 +lat_2=60", _R4_WORLD),
    ("+proj=leac +lat_1=30", _R4_WORLD),
    ("+proj=leac +lat_1=-30 +south", _R4_WORLD),
    ("+proj=airy +lat_0=40 +lon_0=-100", _R4B2_NA),
    ("+proj=airy +lat_0=90",
     [(-96.5, 68.2), (12.3, 48.7), (0.0, 89.0), (-179.5, 71.2)]),
    ("+proj=wag6", _R4_WORLD),
    ("+proj=natearth2", _R4_WORLD),
    ("+proj=nsper +h=3000000 +lat_0=40 +lon_0=-100", _R4B2_NA),
    ("+proj=tpers +h=5500000 +lat_0=40 +lon_0=-100 +tilt=25 +azi=20",
     _R4B2_NA),
    ("+proj=ocea +lat_1=40 +lat_2=50 +lon_1=-100 +lon_2=-60",
     _R4_WORLD),
    ("+proj=ocea +alpha=30 +lonc=-75", _R4_WORLD),
    ("+proj=tpeqd +lat_1=40 +lon_1=-100 +lat_2=50 +lon_2=-60",
     _R4_WORLD),
    ("+proj=chamb +lat_1=22 +lon_1=-120 +lat_2=45 +lon_2=-70"
     " +lat_3=10 +lon_3=-90 +lon_0=-95",
     [(-110.0, 30.0), (-95.0, 35.0), (-80.0, 20.0), (-100.0, 45.0)]),
    ("+proj=qsc",
     [(10.0, 20.0), (-35.0, -30.0), (0.5, -0.25), (25.0, 48.0)]),
    ("+proj=qsc +lat_0=90", _R4_WORLD),
    ("+proj=qsc +lon_0=90",
     [(80.0, 20.0), (100.0, -35.0), (60.5, -0.25), (115.0, 48.0)]),
    ("+proj=healpix", _R4_WORLD),
    ("+proj=rhealpix", _R4_WORLD),
    ("+proj=rhealpix +north_square=1 +south_square=2", _R4_WORLD),
    ("+proj=mil_os",
     [(20.0, 18.0), (5.0, 40.0), (35.0, 5.0), (-10.0, 30.0)]),
    ("+proj=lee_os",
     [(-165.0, -10.0), (-145.0, 10.0), (175.0, -30.0),
      (-150.0, -30.0)]),
    ("+proj=gs48",
     [(-96.0, 39.0), (-120.0, 48.0), (-80.0, 25.0), (-100.0, 30.0)]),
    ("+proj=alsk",
     [(-152.0, 64.0), (-165.0, 60.0), (-140.0, 70.0), (-155.0, 55.0)]),
    ("+proj=gs50",
     [(-120.0, 45.0), (-150.0, 62.0), (-96.0, 39.0), (-75.0, 42.0)]),
    ("+proj=ob_tran +o_proj=moll +o_lon_p=40 +o_lat_p=50 +lon_0=-100",
     _R4_WORLD),
    ("+proj=ob_tran +o_proj=eqc +o_lat_1=10 +o_lon_1=-90 +o_lat_2=30"
     " +o_lon_2=0", _R4_WORLD),
]


@pytest.mark.parametrize("spec,pts", _R4B2_SPECS)
def test_proj_round4_batch2_vs_mproj(ray_session, ref_cli, tmp_path,
                                     spec, pts):
    """Round-4 batch 2 — with these, every mproj pj_list family except
    3D geocent has a live-parity-tested kernel."""
    test_proj_family_batch_vs_mproj(ray_session, ref_cli, tmp_path,
                                    spec, list(pts))


def test_proj_gilbert_vs_mproj(ray_session, ref_cli, tmp_path):
    test_proj_family_batch_vs_mproj(
        ray_session, ref_cli, tmp_path, "+proj=gilbert +lat_1=10",
        [(10.0, 20.0), (-60.0, -35.0), (120.0, 55.0), (0.5, -0.25)])


@pytest.mark.parametrize("oopts", [
    ["precision=0.01"],          # rotate-then-round order
    ["bbox"],                    # container bbox key
    ["id-field=STATE"],          # feature ids appended after props
    ["drop-table"],              # GeometryCollection via drop-table
])
def test_o_options_bytes_identical(ray_session, ref_cli, tmp_path,
                                   oopts):
    ref = tmp_path / "ref.json"
    ours = tmp_path / "ours.json"
    ref_run(ref_cli, [TWO_STATES, "-o", *oopts, str(ref)])
    run_commands(f"-i {TWO_STATES} -o {' '.join(oopts)} {ours}")
    assert ours.read_bytes() == ref.read_bytes()


@pytest.mark.parametrize("spec", [
    "-simplify 40% planar",              # default repair rolls back
    "-simplify 25% planar",              # repair + ring-start keep
    "-simplify 10%",                     # spherical default chain
    "-simplify 60% planar keep-shapes",  # keep-shapes + repair
])
def test_simplify_repair_bytes_identical(ray_session, ref_cli,
                                         tmp_path, spec):
    """Default -simplify (REPAIR ON) byte parity: the postSimplifyRepair
    port (global retained-segment crossings, max-z unwind queue) plus
    simplify's own arc-order ring starts (no export re-rotation)."""
    ref = tmp_path / "ref.json"
    ours = tmp_path / "ours.json"
    ref_run(ref_cli, [TWO_STATES, *spec.split(), "-o", str(ref)])
    run_commands(f"-i {TWO_STATES} {spec} -o {ours}")
    assert ours.read_bytes() == ref.read_bytes()


@pytest.mark.parametrize("case", ["filter-fields", "rename-fields",
                                  "filter", "merge-layers",
                                  "graticule-proj"])
def test_table_commands_bytes_identical(ray_session, ref_cli, tmp_path,
                                        case):
    """Field-level and multi-layer commands, byte parity: rename-fields
    leads records with the renamed fields; -filter keeps the original
    import-rotation ring starts (rings rotate at -i like the
    reference's import-time buildTopology); -merge-layers force keeps
    each row's NATIVE field set in its own order (undefined keys
    omitted); projected output carries the reference's crs:null."""
    ref = tmp_path / "ref.json"
    ours = tmp_path / "ours.json"
    ra, cmd = {
        "filter-fields": ([SIX_COUNTIES, "-filter-fields",
                           "NAME,POP2010"],
                          f"-i {SIX_COUNTIES} -filter-fields "
                          "NAME,POP2010"),
        "rename-fields": ([SIX_COUNTIES, "-rename-fields",
                           "people=POP2010"],
                          f"-i {SIX_COUNTIES} -rename-fields "
                          "people=POP2010"),
        "filter": ([SIX_COUNTIES, "-filter", "POP2010 > 500000"],
                   f"-i {SIX_COUNTIES} -filter 'POP2010 > 500000'"),
        "merge-layers": ([TWO_STATES, SIX_COUNTIES, "combine-files",
                          "-merge-layers", "force"],
                         f"-i {TWO_STATES} {SIX_COUNTIES} "
                         "combine-files -merge-layers force"),
        "graticule-proj": (["-graticule", "-proj", "robinson"],
                           "-graticule -proj robinson"),
    }[case]
    ref_run(ref_cli, [*ra, "-o", str(ref)])
    run_commands(f"{cmd} -o {ours}")
    assert ours.read_bytes() == ref.read_bytes()


def test_uniq_bytes_identical(ray_session, ref_cli, tmp_path):
    ref = tmp_path / "ref.json"
    ours = tmp_path / "ours.json"
    ref_run(ref_cli, [SIX_COUNTIES, "-uniq", "STATE_NAME",
                      "-o", str(ref)])
    run_commands(f"-i {SIX_COUNTIES} -uniq STATE_NAME -o {ours}")
    assert ours.read_bytes() == ref.read_bytes()


@pytest.mark.parametrize("fixture", ["two_states.shp",
                                     "six_counties.shp"])
def test_topojson_export_bytes_identical(ray_session, ref_cli, tmp_path,
                                         fixture):
    """-o .topojson BYTE parity: auto quantization, delta-encoded
    arcs, exportTopology key order, the quantized-ring explodePolygon
    regroup (zero-area rings dropped, quantization-flipped holes
    re-homed) and JS number formatting."""
    ref = tmp_path / "ref.topojson"
    ours = tmp_path / "ours.topojson"
    path = "/root/reference/test/test_data/" + fixture
    ref_run(ref_cli, [path, "-o", "format=topojson", str(ref)])
    run_commands(f"-i {path} -o {ours}")
    assert ours.read_bytes() == ref.read_bytes()


@pytest.mark.parametrize("args", [
    ["six_counties.shp"],
    ["two_states.shp"],
    ["two_states.shp", "-lines"],          # polyline layer defaults
    ["three_points.geojson"],              # circles
])
def test_svg_export_bytes_identical(ray_session, ref_cli, tmp_path,
                                    args):
    """-o .svg BYTE parity: pixel transform with margins and y-flip,
    0.0001px precision rounding, path d-string / circle construction,
    layer <g> wrapper with polyline display defaults, XML template."""
    ref = tmp_path / "ref.svg"
    ours = tmp_path / "ours.svg"
    path = "/root/reference/test/test_data/" + args[0]
    ref_run(ref_cli, [path, *args[1:], "-o", "format=svg", str(ref)])
    run_commands(f"-i {path} {' '.join(args[1:])} -o {ours}")
    assert ours.read_bytes() == ref.read_bytes()


def props(path):
    doc = json.load(open(path))
    return [f.get("properties") for f in doc["features"]]


def test_graticule_exact(ray_session, ref_cli, tmp_path):
    """-graticule: port of createGraticule — same meridian pole
    clipping (non-90°-multiples stop 10° short), same 1° densification
    loop, same type/value properties."""
    ref = tmp_path / "ref.json"
    ours = tmp_path / "ours.json"
    ref_run(ref_cli, ["-graticule", "-o", str(ref)])
    run_commands(f"-graticule -o {ours}")
    assert all_chains(str(ours)) == all_chains(str(ref))
    key = lambda p: (p["type"], p["value"])
    assert sorted(map(key, props(str(ours)))) == \
        sorted(map(key, props(str(ref))))


def test_explode_exact(ray_session, ref_cli, tmp_path):
    ref = tmp_path / "ref.json"
    ours = tmp_path / "ours.json"
    ref_run(ref_cli, [SIX_COUNTIES, "-explode", "-o", str(ref)])
    run_commands(f"-i {SIX_COUNTIES} -explode -o {ours}")
    assert all_rings(str(ours)) == all_rings(str(ref))
    assert len(props(str(ours))) == len(props(str(ref)))


def test_each_properties_exact(ray_session, ref_cli, tmp_path):
    """-each arithmetic/string expressions match the reference's JS
    evaluation exactly (same IEEE ops)."""
    ref = tmp_path / "ref.json"
    ours = tmp_path / "ours.json"
    expr = 'K=LAT*2.5899752356, NM=STATE_NAME + "!"'
    ref_run(ref_cli, [TWO_STATES, "-each", expr, "-o", str(ref)])
    run_commands(f"-i {TWO_STATES} -each '{expr}' -o {ours}")
    a, b = props(str(ours)), props(str(ref))
    key = lambda p: p["STATE_NAME"]
    for pa, pb in zip(sorted(a, key=key), sorted(b, key=key)):
        assert pa["K"] == pb["K"] and pa["NM"] == pb["NM"]


def test_rectangle_exact(ray_session, ref_cli, tmp_path):
    ref = tmp_path / "ref.json"
    ours = tmp_path / "ours.json"
    bb = "bbox=2,3,10.5,20"
    ref_run(ref_cli, ["-rectangle", bb, "-o", str(ref)])
    run_commands(f"-rectangle {bb} -o {ours}")
    assert all_rings(str(ours)) == all_rings(str(ref))


@pytest.mark.parametrize("cmd", ["-clip", "-erase"])
def test_polyline_clip_exact(ray_session, ref_cli, tmp_path, cmd):
    """General polyline clip/erase against a polygon layer (the
    reference's mapshaper-polyline-clipping.js) — state-border lines
    clipped by a triangle.  Clip is coordinate-exact; erase keeps the
    defective shared border, where ONE snapped vertex's last ulp
    depends on the snap-winner order (same artifact as the polygon
    erase test) — compared at 12 decimals."""
    tri = tmp_path / "tri.json"
    _write_tri(str(tri), True)
    ref = tmp_path / "ref.json"
    ours = tmp_path / "ours.json"
    ref_run(ref_cli, [TWO_STATES, "-lines", cmd, str(tri),
                      "-o", str(ref)])
    run_commands(f"-i {TWO_STATES} -lines {cmd} {tri} -o {ours}")
    nd = None if cmd == "-clip" else 12

    def chains(path):
        out = []
        for g in geoms(path):
            if g is None:
                continue
            cs = [g["coordinates"]] if g["type"] == "LineString" \
                else g["coordinates"]
            for c in cs:
                pts = [tuple(p) if nd is None else
                       tuple(round(v, nd) for v in p) for p in c]
                out.append(tuple(pts if pts <= pts[::-1]
                                 else pts[::-1]))
        return sorted(out)
    assert chains(str(ours)) == chains(str(ref))


def test_clean_two_states_defective(ray_session, ref_cli, tmp_path):
    """-clean on the DEFECTIVE two_states fixture (borders cross ~49
    times) — full repair parity through the ported mosaic.  One
    snapped vertex's last ulp depends on the snap-winner order (same
    artifact as the erase tests): compared at 12 decimals."""
    ref = tmp_path / "ref.json"
    ours = tmp_path / "ours.json"
    ref_run(ref_cli, [TWO_STATES, "-clean", "-o", str(ref)])
    run_commands(f"-i {TWO_STATES} -clean -o {ours}")
    assert all_rings(str(ours), nd=12) == all_rings(str(ref), nd=12)


def test_dbf_export_bytes_identical(ray_session, ref_cli, tmp_path):
    """After -each adds a numeric column the reference rebuilds the
    DBF; our writer reproduces it byte-for-byte (field descriptors,
    getNumericFieldInfo width/decimal scan, record padding)."""
    ref = tmp_path / "ref.shp"
    ours = tmp_path / "ours.shp"
    ref_run(ref_cli, [TWO_STATES, "-each", "Z=LAT*2", "-o",
                      "format=shapefile", str(ref)])
    run_commands(f"-i {TWO_STATES} -each 'Z=LAT*2' -o {ours}")
    a = (tmp_path / "ours.dbf").read_bytes()
    b = (tmp_path / "ref.dbf").read_bytes()
    assert a[32:] == b[32:]  # descriptors+records; header has a date
    assert a[8:32] == b[8:32]


def test_csv_export_bytes_identical(ray_session, ref_cli, tmp_path):
    """-o format=csv byte parity: d3-dsv quoting, JS ToString number
    formatting (sources/jsnum.py), LF rows, no trailing newline."""
    ref = tmp_path / "ref.csv"
    ours = tmp_path / "ours.csv"
    ref_run(ref_cli, [SIX_COUNTIES, "-o", str(ref)])
    run_commands(f"-i {SIX_COUNTIES} -o {ours}")
    assert ours.read_bytes() == ref.read_bytes()


def test_sort_csv_bytes_identical(ray_session, ref_cli, tmp_path):
    ref = tmp_path / "ref.csv"
    ours = tmp_path / "ours.csv"
    ref_run(ref_cli, [SIX_COUNTIES, "-sort", "NAME", "descending",
                      "-o", str(ref)])
    run_commands(f"-i {SIX_COUNTIES} -sort NAME descending -o {ours}")
    assert ours.read_bytes() == ref.read_bytes()


def test_join_csv_exact(ray_session, ref_cli, tmp_path):
    src = tmp_path / "side.csv"
    src.write_text("ST,label,score\nOR,alpha,3\nWA,beta,4\n")
    ref = tmp_path / "ref.json"
    ours = tmp_path / "ours.json"
    ref_run(ref_cli, [TWO_STATES, "-join", str(src),
                      "keys=STATE,ST", "-o", str(ref)])
    run_commands(f"-i {TWO_STATES} -join {src} keys=STATE,ST -o {ours}")
    key = lambda p: p["STATE_NAME"]
    a = sorted(props(str(ours)), key=key)
    b = sorted(props(str(ref)), key=key)
    for pa, pb in zip(a, b):
        assert pa["label"] == pb["label"] and pa["score"] == pb["score"]


def test_dissolve_fields_exact(ray_session, ref_cli, tmp_path):
    """-dissolve with key + sum-fields/copy-fields: aggregation values
    and dissolved rings both match."""
    ref = tmp_path / "ref.json"
    ours = tmp_path / "ours.json"
    spec = ["STATE_NAME", "sum-fields=POP2000,POP2010",
            "copy-fields=STATE_FIPS"]
    ref_run(ref_cli, [SIX_COUNTIES, "-dissolve", *spec, "-o", str(ref)])
    run_commands(f"-i {SIX_COUNTIES} -dissolve {' '.join(spec)} "
                 f"-o {ours}")
    assert all_rings(str(ours)) == all_rings(str(ref))
    key = lambda p: p["STATE_NAME"]
    a = sorted(props(str(ours)), key=key)
    b = sorted(props(str(ref)), key=key)
    assert [(p["POP2000"], p["POP2010"], p["STATE_FIPS"]) for p in a] \
        == [(p["POP2000"], p["POP2010"], p["STATE_FIPS"]) for p in b]


def test_affine_exact(ray_session, ref_cli, tmp_path):
    """-affine shift/scale/rotate around the reference's bbox-center
    anchor, clockwise-positive rotation — coordinate-exact."""
    ref = tmp_path / "ref.json"
    ours = tmp_path / "ours.json"
    spec = "shift=1000,-500 scale=2 rotate=30"
    ref_run(ref_cli, ["/root/reference/test/test_data/"
                      "two_states_mercator.shp",
                      "-affine", *spec.split(), "-o", str(ref)])
    run_commands("-i /root/reference/test/test_data/"
                 f"two_states_mercator.shp -affine {spec} -o {ours}")
    assert all_rings(str(ours)) == all_rings(str(ref))


@pytest.mark.parametrize("spec", ["vertices",
                                  "interpolated interval=100000"])
def test_points_vertices_interpolated_exact(ray_session, ref_cli,
                                            tmp_path, spec):
    """-points vertices (polygon layer) and -points interpolated
    (polyline layer; the reference requires one) — exact planar
    interval walk on the mercator fixture."""
    ref = tmp_path / "ref.json"
    ours = tmp_path / "ours.json"
    merc = "/root/reference/test/test_data/two_states_mercator.shp"
    pre = [] if spec == "vertices" else ["-lines"]
    ref_run(ref_cli, [merc, *pre, "-points", *spec.split(),
                      "-o", str(ref)])
    run_commands(f"-i {merc} {' '.join(pre)} -points {spec} -o {ours}")

    def pts(path):
        out = []
        for g in geoms(path):
            if g is None:
                continue
            cs = [g["coordinates"]] if g["type"] == "Point" \
                else g["coordinates"]
            out.extend(tuple(p) for p in
                       ([cs] if g["type"] == "Point" else cs))
        return sorted(out)
    assert pts(str(ours)) == pts(str(ref))


def test_topojson_import_exact(ray_session, ref_cli, tmp_path):
    """TopoJSON reader: quantized delta-encoded arcs from the actual
    reference export decode to the same rings the reference itself
    re-exports."""
    topo = tmp_path / "t.topojson"
    ref = tmp_path / "ref.json"
    ours = tmp_path / "ours.json"
    ref_run(ref_cli, [SIX_COUNTIES, "-o", "format=topojson", str(topo)])
    ref_run(ref_cli, [str(topo), "-o", "format=geojson", str(ref)])
    run_commands(f"-i {topo} -o {ours}")
    assert all_rings(str(ours)) == all_rings(str(ref))
    key = lambda p: p["NAME"]
    a = sorted(props(str(ours)), key=key)
    b = sorted(props(str(ref)), key=key)
    assert a == b


@pytest.mark.parametrize("args", [
    ["six_counties.shp"],                       # shp import, attrs
    ["two_states.shp"],                         # defective fixture
    ["three_points.geojson"],                   # point layer
    ["six_counties.shp", "-dissolve", "STATE_NAME"],
    ["six_counties.shp", "-dissolve2"],         # GeometryCollection
    ["two_states.shp", "-innerlines"],          # polyline layer
])
def test_geojson_export_bytes_identical(ray_session, ref_cli, tmp_path,
                                        args):
    """-o GeoJSON byte parity: JS ToString numbers, formatGeoJSON
    framing, FeatureCollection vs bare-GeometryCollection rule,
    post-buildTopology ring rotation (kernel outputs keep their own
    reference arc order via Catalog.no_rotate)."""
    ref = tmp_path / "ref.json"
    ours = tmp_path / "ours.json"
    path = "/root/reference/test/test_data/" + args[0]
    ref_run(ref_cli, [path, *args[1:], "-o", str(ref)])
    run_commands(f"-i {path} {' '.join(args[1:])} -o {ours}")
    assert ours.read_bytes() == ref.read_bytes()


TD = "/root/reference/test/test_data"


@pytest.mark.parametrize("case", ["overlap-clean", "issue68-clip",
                                  "openring", "merge153"])
def test_issue_fixtures_bytes_identical(ray_session, ref_cli, tmp_path,
                                        case):
    """The reference's own regression fixtures, byte parity: -clean on
    crossing polygons (top-level GeometryCollection input), a real
    clip regression, open-ring repair at import, cross-file merge
    (joint import topology rotates rings across combine-files)."""
    ref = tmp_path / "ref.json"
    ours = tmp_path / "ours.json"
    ra, cmd = {
        "overlap-clean": (
            [f"{TD}/issues/clean/overlapping_polygons.json", "-clean"],
            f"-i {TD}/issues/clean/overlapping_polygons.json -clean"),
        "issue68-clip": (
            [f"{TD}/issues/68/cell1.shp", "-clip",
             f"{TD}/issues/68/clipper.shp"],
            f"-i {TD}/issues/68/cell1.shp -clip "
            f"{TD}/issues/68/clipper.shp"),
        "openring": ([f"{TD}/issues/125/openring.json"],
                     f"-i {TD}/issues/125/openring.json"),
        "merge153": (
            [f"{TD}/issues/153/a.json", f"{TD}/issues/153/b.json",
             "combine-files", "-merge-layers", "force"],
            f"-i {TD}/issues/153/a.json {TD}/issues/153/b.json "
            "combine-files -merge-layers force"),
    }[case]
    ref_run(ref_cli, [*ra, "-o", str(ref)])
    run_commands(f"{cmd} -o {ours}")
    assert ours.read_bytes() == ref.read_bytes()


@pytest.mark.parametrize("case", [
    ("shapefile/latin1-property.shp", None, "json"),
    ("shapefile/utf8-property.shp", None, "json"),   # .cpg sidecar
    ("dbf/latin1.dbf", None, "csv"),                 # detection
    ("dbf/gbk.dbf", "gbk", "csv"),                   # -i encoding=
    ("dbf/shiftjis.dbf", "shiftjis", "csv"),
])
def test_encodings_bytes_identical(ray_session, ref_cli, tmp_path,
                                   case):
    """DBF text encodings: .cpg sidecar, detection, -i encoding=, and
    the reference's latin-1 field-NAME decode (values use the record
    codec).  Bare .dbf imports as a data-only table layer."""
    path, enc, ext = case
    ref = tmp_path / f"ref.{ext}"
    ours = tmp_path / f"ours.{ext}"
    opts = [f"encoding={enc}"] if enc else []
    fmt = ["format=csv"] if ext == "csv" else []
    ref_run(ref_cli, [f"{TD}/{path}", *opts, "-o", *fmt, str(ref)])
    run_commands(f"-i {TD}/{path} {' '.join(opts)} -o "
                 f"{' '.join(fmt)} {ours}")
    assert ours.read_bytes() == ref.read_bytes()


def test_shapefile_export_shp_bytes_identical(ray_session, ref_cli,
                                              tmp_path):
    """.shp/.shx round-trip through the engine equals the reference's
    byte-for-byte (rings topology-rotated on export like the reference;
    the reference's .dbf is a lazy passthrough of the source file, so
    only the geometry pair is byte-compared)."""
    ref = tmp_path / "ref.shp"
    ours = tmp_path / "ours.shp"
    ref_run(ref_cli, [TWO_STATES, "-o", "format=shapefile", str(ref)])
    run_commands(f"-i {TWO_STATES} -o {ours}")
    for ext in ("shp", "shx"):
        a = (tmp_path / f"ours.{ext}").read_bytes()
        b = (tmp_path / f"ref.{ext}").read_bytes()
        assert a == b, ext


# --- -proj .prj / from= / match= parity (reference proj-test.js,
# issue-193-test.js, shapefile-test.js:23) --------------------------------

GK_SHP = "/root/reference/test/test_data/issues/193/gauss_kruger.shp"
THREE_POINTS_SHP = "/root/reference/test/test_data/three_points.shp"
MERC_SHP = "/root/reference/test/test_data/two_states_mercator.shp"
MERC_PRJ = "/root/reference/test/test_data/two_states_mercator.prj"


def _coords(path):
    out = []
    for g in geoms(path):
        if g is None:
            continue
        if g["type"] == "Point":
            out.append(g["coordinates"])
        elif g["type"] == "LineString":
            out.extend(g["coordinates"])
        elif g["type"] == "MultiLineString":
            out.extend(p for part in g["coordinates"] for p in part)
        elif g["type"] == "Polygon":
            out.extend(p for r in g["coordinates"] for p in r)
        elif g["type"] == "MultiPolygon":
            out.extend(p for poly in g["coordinates"]
                       for r in poly for p in r)
    return np.array(out, dtype=float)


def test_proj_gauss_kruger_prj_inverse(ray_session, ref_cli, tmp_path):
    """Issue 193: import a Gauss-Kruger (Krasovsky) .prj and -proj
    wgs84 — inverse tmerc matches the reference to float noise, and
    the exported .prj is the reference's WGS84 GEOGCS string."""
    ref = tmp_path / "ref.json"
    ours = tmp_path / "ours.json"
    ref_run(ref_cli, [GK_SHP, "-proj", "wgs84", "-o", str(ref)])
    run_commands(f"-i {GK_SHP} -proj wgs84 -o {ours}")
    np.testing.assert_allclose(_coords(str(ours)), _coords(str(ref)),
                               rtol=0, atol=1e-9)
    ref_shp = tmp_path / "r" ; ref_shp.mkdir()
    ref_run(ref_cli, [GK_SHP, "-proj", "wgs84", "-o",
                      str(ref_shp) + "/"])
    run_commands(f"-i {GK_SHP} -proj wgs84 -o {tmp_path}/gk.shp")
    assert (tmp_path / "gk.prj").read_text() == \
        (ref_shp / "gauss_kruger.prj").read_text()


def test_proj_match_prj_file(ray_session, ref_cli, tmp_path):
    """-proj match=<.prj file>: projects with the parsed CRS
    (ellipsoidal Mercator) and copies the .prj text verbatim."""
    ref = tmp_path / "ref.json"
    ours = tmp_path / "ours.json"
    ref_run(ref_cli, [THREE_POINTS_SHP, "-proj", f"match={MERC_PRJ}",
                      "-o", str(ref)])
    run_commands(f"-i {THREE_POINTS_SHP} -proj match={MERC_PRJ} "
                 f"-o {ours}")
    np.testing.assert_allclose(_coords(str(ours)), _coords(str(ref)),
                               rtol=0, atol=1e-6)
    run_commands(f"-i {THREE_POINTS_SHP} -proj match={MERC_PRJ} "
                 f"-o {tmp_path}/tp.shp")
    assert (tmp_path / "tp.prj").read_text() == \
        open(MERC_PRJ).read()


def test_proj_match_layer_name(ray_session, tmp_path):
    """match= can name another layer; source= is its alias."""
    for opt in ("match=states", "source=states"):
        run_commands(f"-i {MERC_SHP} name=states -i {THREE_POINTS_SHP} "
                     f"-proj {opt} -o {tmp_path}/tp.shp")
        assert "Mercator" in (tmp_path / "tp.prj").read_text()


def test_proj_from_assigns_crs(ray_session, tmp_path):
    """from= with no dest CRS assigns the CRS without moving
    coordinates (reference proj-test.js 'from= sets CRS...')."""
    run_commands(f"-i {MERC_SHP} -proj from=+proj=merc "
                 f"-o {tmp_path}/m.shp")
    assert "Mercator_1SP" in (tmp_path / "m.prj").read_text()
    # coordinates unchanged vs straight round-trip
    run_commands(f"-i {MERC_SHP} -o {tmp_path}/plain.shp")
    assert (tmp_path / "m.shp").read_bytes() == \
        (tmp_path / "plain.shp").read_bytes()


def test_proj_from_then_project(ray_session, ref_cli, tmp_path):
    """from=<.prj file> + +proj=robin (reference 'Match a .prj
    file')."""
    ref = tmp_path / "ref.json"
    ours = tmp_path / "ours.json"
    ref_run(ref_cli, [MERC_SHP, "-proj", f"from={MERC_PRJ}",
                      "+proj=robin", "-o", str(ref)])
    run_commands(f"-i {MERC_SHP} -proj from={MERC_PRJ} +proj=robin "
                 f"-o {ours}")
    np.testing.assert_allclose(_coords(str(ours)), _coords(str(ref)),
                               rtol=0, atol=1e-6)
    run_commands(f"-i {MERC_SHP} -proj from={MERC_PRJ} +proj=robin "
                 f"-o {tmp_path}/r.shp")
    assert "Robinson" in (tmp_path / "r.prj").read_text()


def test_prj_copied_verbatim_without_proj(ray_session, tmp_path):
    """Unprojected export copies the input .prj byte-for-byte
    (reference shapefile-test.js:23 / issue 193)."""
    run_commands(f"-i {MERC_SHP} -o {tmp_path}/o.shp")
    assert (tmp_path / "o.prj").read_text() == open(MERC_PRJ).read()


def test_proj_alias_prj_strings(ray_session, ref_cli, tmp_path):
    """-proj webmercator/robinson write the reference's exact WKT."""
    for alias, frag in (("webmercator", "Pseudo-Mercator"),
                        ("robinson", "Robinson")):
        refdir = tmp_path / f"ref_{alias}"
        refdir.mkdir()
        ref_run(ref_cli, [THREE_POINTS_SHP, "-proj", alias, "-o",
                          str(refdir) + "/"])
        run_commands(f"-i {THREE_POINTS_SHP} -proj {alias} "
                     f"-o {tmp_path}/{alias}.shp")
        assert (tmp_path / f"{alias}.prj").read_text() == \
            (refdir / "three_points.prj").read_text()


def test_proj_utm(ray_session, ref_cli, tmp_path):
    """+proj=utm +zone=17: the ported pj_etmerc (Poder/Engsager)
    matches the reference across the whole zone — including points
    30-80 degrees from the central meridian where the tmerc power
    series loses meters — and the generated .prj WKT is
    byte-identical."""
    ref = tmp_path / "ref.json"
    ours = tmp_path / "ours.json"
    ref_run(ref_cli, [THREE_POINTS_SHP, "-proj", "+proj=utm",
                      "+zone=17", "-o", str(ref)])
    run_commands(f"-i {THREE_POINTS_SHP} -proj +proj=utm +zone=17 "
                 f"-o {ours}")
    np.testing.assert_allclose(_coords(str(ours)), _coords(str(ref)),
                               rtol=0, atol=1e-6)
    refdir = tmp_path / "refshp"; refdir.mkdir()
    ref_run(ref_cli, [THREE_POINTS_SHP, "-proj", "+proj=utm",
                      "+zone=17", "-o", str(refdir) + "/"])
    run_commands(f"-i {THREE_POINTS_SHP} -proj +proj=utm +zone=17 "
                 f"-o {tmp_path}/u.shp")
    assert (tmp_path / "u.prj").read_text() == \
        (refdir / "three_points.prj").read_text()


# round-3 WKT-maker families: the live reference writes a .prj for
# these via mproj's add_simple_wkt_maker table; byte-compare ours.
# Each spec carries in-domain probe points so the export itself
# succeeds in both engines.
_NL = [(5.38, 52.15), (4.3, 51.9), (6.9, 53.2)]
_NZ = [(173.0, -41.0), (174.7, -36.85), (170.5, -45.87)]
_US3 = [(-96.5, 38.2), (-80.1, 25.9), (-120.3, 48.7)]


@pytest.mark.parametrize("spec,pts", [
    ("+proj=sterea +lat_0=52.15616055555555 +lon_0=5.38763888888889"
     " +k=0.9999079 +x_0=155000 +y_0=463000", _NL),
    ("+proj=poly +lat_0=30 +lon_0=-90", _US3),
    ("+proj=bonne +lat_1=45", _US3),
    ("+proj=loxim +lat_1=40", _US3),
    ("+proj=wintri +lat_1=40", _US3),
    ("+proj=ortho +lat_0=40 +lon_0=-100", _US3),
    ("+proj=gnom +lat_0=40 +lon_0=-100", _US3),
    ("+proj=nzmg", _NZ),
    ("+proj=aeqd +lat_0=90", [(-96.5, 68.2), (12.3, 48.7),
                              (-179.5, 71.2)]),
    ("+proj=eck4", _US3),
    ("+proj=vandg", _US3),
    ("+proj=omerc +lat_0=4 +lonc=102.25 +alpha=323.0257964666666"
     " +k=0.99984 +x_0=804671",
     [(102.25, 4.0), (101.7, 3.15), (103.8, 1.35)]),
])
def test_proj_round3_prj_bytes(ray_session, ref_cli, tmp_path,
                               spec, pts):
    """Round-3 family .prj writer parity: shapefile export after
    -proj <spec> produces the reference's exact WKT, and re-importing
    our .prj + -proj wgs84 inverts back to the sources (read path)."""
    src = tmp_path / "pts.json"
    src.write_text(json.dumps({
        "type": "FeatureCollection",
        "features": [{"type": "Feature", "properties": {"i": i},
                      "geometry": {"type": "Point",
                                   "coordinates": list(p)}}
                     for i, p in enumerate(pts)]}))
    refdir = tmp_path / "refshp"; refdir.mkdir()
    ref_run(ref_cli, [str(src), "-proj", *spec.split(),
                      "-o", str(refdir) + "/", "format=shapefile"])
    run_commands(f"-i {src} -proj {spec} "
                 f"-o format=shapefile {tmp_path}/o.shp")
    assert (tmp_path / "o.prj").read_text() == \
        (refdir / "pts.prj").read_text()
    # WKT read path: our own .prj must invert back to the inputs
    run_commands(f"-i {tmp_path}/o.shp -proj wgs84 "
                 f"-o {tmp_path}/back.json")
    back = np.array([g["coordinates"]
                     for g in geoms(f"{tmp_path}/back.json")], float)
    np.testing.assert_allclose(back, np.array(pts, float),
                               rtol=0, atol=1e-7)


def test_proj_densify_vs_reference(ray_session, ref_cli, tmp_path):
    """-proj densify inserts the same recursive-bisection midpoints as
    projectAndDensifyArcs — long segments on a graticule-like line and
    on two_states polygons, vertex-for-vertex."""
    src = tmp_path / "line.json"
    # many short segments (small avg segment -> small interval) plus
    # one 140-degree jump that must bisect recursively
    pts = [[-170 + i * 0.1, 0.0] for i in range(60)]
    pts.append([-20, 70])   # mercator bends this jump hard
    src.write_text(json.dumps({"type": "LineString",
                               "coordinates": pts}))
    for inp, spec in ((str(src), ["robin"]),
                      (str(src), ["merc"]),
                      (TWO_STATES, ["robin"])):
        ref = tmp_path / "ref.json"
        ours = tmp_path / "ours.json"
        ref_run(ref_cli, [inp, "-proj", *spec, "densify",
                          "-o", "precision=0.000000001", str(ref)])
        run_commands(f"-i {inp} -proj {' '.join(spec)} densify "
                     f"-o precision=0.000000001 {ours}")
        a, b = _coords(str(ref)), _coords(str(ours))
        assert a.shape == b.shape, (spec, a.shape, b.shape)
        scale = np.maximum(1.0, np.abs(a))
        assert np.all(np.abs(b - a) / scale < 1e-8)
    # the long jump actually densified (midpoints inserted)
    run_commands(f"-i {src} -proj merc densify -o {tmp_path}/d.json")
    run_commands(f"-i {src} -proj merc -o {tmp_path}/p.json")
    assert len(_coords(f"{tmp_path}/d.json")) > \
        len(_coords(f"{tmp_path}/p.json"))


def test_merge_layers_prj_preserved(ray_session, tmp_path):
    """Issue 166: .prj survives combine-files + -merge-layers; a
    missing .prj is compatible with anything; latlong + projected is
    an error; between incompatible projected CRS the first wins."""
    d = "/root/reference/test/test_data/issues/166"
    prj = open(f"{d}/a_utm.prj").read()
    for pair in (("a_utm", "b_utm"), ("a_utm", "c_utm"),
                 ("c_utm", "a_utm"), ("a_utm", "e_merc")):
        run_commands(f"-i {d}/{pair[0]}.shp {d}/{pair[1]}.shp "
                     f"combine-files -merge-layers force "
                     f"-o {tmp_path}/out.shp")
        assert "NAD_1983_UTM_Zone_18N" in \
            (tmp_path / "out.prj").read_text()
        if "c_utm" not in pair and "e_merc" not in pair:
            assert (tmp_path / "out.prj").read_text() == prj
    with pytest.raises(ValueError, match="projected and unprojected"):
        run_commands(f"-i {d}/a_utm.shp {d}/d_geo.shp combine-files "
                     f"-merge-layers force -o {tmp_path}/x.shp")


def test_mixed_type_geojson_import(ray_session, ref_cli, tmp_path):
    """Issue 177: mixed-geometry GeoJSON divides into one layer per
    type in encounter order; directory export writes the reference's
    numbered files byte-identically; -target type= selects by
    geometry type."""
    src = "/root/reference/test/test_data/issues/177/mixed_feature.json"
    refdir = tmp_path / "ref"; refdir.mkdir()
    ourdir = tmp_path / "ours"; ourdir.mkdir()
    ref_run(ref_cli, [src, "-o", str(refdir) + "/"])
    run_commands(f"-i {src} -o {ourdir}/")
    ref_files = sorted(p.name for p in refdir.iterdir())
    assert sorted(p.name for p in ourdir.iterdir()) == ref_files
    for f in ref_files:
        assert (ourdir / f).read_bytes() == (refdir / f).read_bytes()
    run_commands(f"-i {src} -target type=point -o {tmp_path}/pt.json")
    assert "MultiPoint" in (tmp_path / "pt.json").read_text()


def test_geojson_trailing_crs_member(ray_session, tmp_path):
    """Issue 236: FeatureCollection with a crs member AFTER the
    features array parses completely."""
    src = "/root/reference/test/test_data/issues/236/point.geojson"
    run_commands(f"-i {src} -o {tmp_path}/o.json")
    doc = json.load(open(tmp_path / "o.json"))
    assert len(doc["features"]) == 1
    assert doc["features"][0]["properties"]["name"] == "Niagara Falls"


@pytest.mark.parametrize("shp,gt", [
    ("issues/shp_point_import/points.shp", "point"),   # MultiPoint (8)
    ("shplib/multipnt.shp", "point"),                  # MultiPoint (8)
    # shplib's Z-type fixtures (3dpoints/brklinz/masspntz) have corrupt
    # DBFs the reference CLI itself errors on — Z parsing is covered by
    # test_shp_z_type_parse below instead
])
def test_shp_multipoint_and_z_types(ray_session, ref_cli, tmp_path,
                                    shp, gt):
    """MultiPoint (type 8) and Z-type records import as their 2D base
    class; coordinates match the reference's GeoJSON export."""
    src = f"{TD}/{shp}"
    ref = tmp_path / "ref.json"
    ours = tmp_path / "ours.json"
    ref_run(ref_cli, [src, "-o", str(ref)])
    run_commands(f"-i {src} -o {ours}")
    def pts(path):
        out = []
        for g in geoms(path):
            if g is None:
                out.append(None); continue
            c = g["coordinates"]
            if g["type"] in ("Point",):
                out.append([c])
            elif g["type"] in ("MultiPoint", "LineString"):
                out.append(c)
            else:
                out.append([p for part in c for p in part])
        return out
    assert pts(str(ours)) == pts(str(ref))


def test_shp_z_type_parse(ray_session):
    """PointZ / PolyLineZ records parse as their 2D base type (Z/M
    arrays skipped), matching the reference's 'Z data will be lost'
    import path."""
    import struct
    from mapshaper_ray.sources.shapefile import (parse_record,
                                                 parse_shp_header)
    for shp, want in (("3dpoints", 1), ("brklinz", 3),
                      ("masspntz", 1)):
        buf = open(f"{TD}/shplib/{shp}.shp", "rb").read()
        t, _ = parse_shp_header(buf)
        assert t in (11, 13)
        ln = struct.unpack(">i", buf[104:108])[0] * 2
        base, parts = parse_record(buf[108:108 + ln])
        assert base == want
        assert parts and parts[0].shape[1] == 2
        assert np.isfinite(parts[0]).all()


def test_topojson_multi_object_mixed(ray_session, ref_cli, tmp_path):
    """Multi-object TopoJSON imports one layer per object (named by
    key); a mixed-type object divides per class; geojson directory
    export matches the reference byte-for-byte including file names."""
    topo = {
        "type": "Topology",
        "arcs": [[[0, 0], [1, 1]], [[1, 1], [2, 0]]],
        "objects": {
            "roads": {"type": "GeometryCollection", "geometries": [
                {"type": "LineString", "arcs": [0],
                 "properties": {"n": "r1"}},
                {"type": "LineString", "arcs": [1],
                 "properties": {"n": "r2"}}]},
            "mix": {"type": "GeometryCollection", "geometries": [
                {"type": "Point", "coordinates": [5, 5],
                 "properties": {"n": "p"}},
                {"type": "LineString", "arcs": [0, 1],
                 "properties": {"n": "l"}}]}}}
    src = tmp_path / "multi.topojson"
    src.write_text(json.dumps(topo))
    refdir = tmp_path / "ref"; refdir.mkdir()
    ourdir = tmp_path / "ours"; ourdir.mkdir()
    ref_run(ref_cli, [str(src), "-o", "format=geojson",
                      str(refdir) + "/"])
    run_commands(f"-i {src} -o format=geojson {ourdir}/")
    ref_files = sorted(p.name for p in refdir.iterdir())
    assert sorted(p.name for p in ourdir.iterdir()) == ref_files
    for f in ref_files:
        assert (ourdir / f).read_bytes() == (refdir / f).read_bytes()


def test_multi_target_fanout_and_numbered_export(ray_session,
                                                 tmp_path):
    """A mixed-type import targets ALL its layers: per-layer commands
    fan out to each, and a single-file -o numbers the outputs
    (out1.json...), like the reference."""
    src = "/root/reference/test/test_data/issues/177/mixed_feature.json"
    run_commands(f"-i {src} -each \"tag = name + '!'\" "
                 f"-o {tmp_path}/out.json")
    names = sorted(p.name for p in tmp_path.iterdir())
    assert names == ["out1.json", "out2.json", "out3.json"]
    tags = []
    for n in names:
        doc = json.load(open(tmp_path / n))
        tags.extend(f["properties"]["tag"] for f in doc["features"])
    assert sorted(tags) == ["A!", "B!", "C!"]


def test_join_string_fields_and_field_types(ray_session, tmp_path):
    """-join string-fields= / -i field-types= reach the delim reader
    (reference join-test.js test2 + two-dataset join)."""
    shp = f"{TD}/two_states.shp"
    csv = f"{TD}/text/states.csv"
    run_commands(f"-i {shp} -join {csv} keys=FIPS,STATE_FIPS "
                 f"fields=POP2010,SUB_REGION "
                 f"string-fields=STATE_FIPS,POP2010 "
                 f"-o {tmp_path}/a.json")
    recs = [f["properties"] for f in
            json.load(open(tmp_path / "a.json"))["features"]]
    assert [r["POP2010"] for r in recs] == ["3831074", "6724540"]
    run_commands(f"-i {shp} -i {csv} field-types=STATE_FIPS:str "
                 f"-join target=two_states states "
                 f"keys=FIPS,STATE_FIPS fields=POP2010,SUB_REGION "
                 f"-target two_states -o {tmp_path}/b.json")
    recs = [f["properties"] for f in
            json.load(open(tmp_path / "b.json"))["features"]]
    assert [r["POP2010"] for r in recs] == [3831074, 6724540]
    assert [r["SUB_REGION"] for r in recs] == ["Pacific", "Pacific"]


@pytest.mark.parametrize("refopts,ourspec,ext", [
    (["quantization=10000", "format=topojson"],
     "quantization=10000 format=topojson", "topojson"),
    (["width=800", "margin=2", "format=svg"],
     "width=800 margin=2 format=svg", "svg"),
    (["geojson-type=GeometryCollection"],
     "geojson-type=GeometryCollection", "json"),
])
def test_o_writer_options_bytes_identical(ray_session, ref_cli,
                                          tmp_path, refopts, ourspec,
                                          ext):
    """-o quantization= / width= margin= / geojson-type= plumb through
    to the writers byte-identically."""
    ref = tmp_path / f"ref.{ext}"
    ours = tmp_path / f"ours.{ext}"
    ref_run(ref_cli, [TWO_STATES, "-o", *refopts, str(ref)])
    run_commands(f"-i {TWO_STATES} -o {ourspec} {ours}")
    assert ours.read_bytes() == ref.read_bytes()


def test_o_prettify_and_field_order(ray_session, ref_cli, tmp_path):
    """-o prettify (formatted stringify with inline coordinate arrays)
    and field-order=ascending (case-insensitive column sort for
    CSV/DBF) match the reference byte-for-byte (DBF compared minus its
    3 'last updated' date bytes)."""
    ref = tmp_path / "ref.json"
    ours = tmp_path / "ours.json"
    ref_run(ref_cli, [THREE_POINTS, "-o", "prettify", str(ref)])
    run_commands(f"-i {THREE_POINTS} -o prettify {ours}")
    assert ours.read_bytes() == ref.read_bytes()
    ref_run(ref_cli, [TWO_STATES, "-o", "field-order=ascending",
                      "format=csv", str(tmp_path / "ref.csv")])
    run_commands(f"-i {TWO_STATES} -o field-order=ascending format=csv "
                 f"{tmp_path}/ours.csv")
    assert (tmp_path / "ours.csv").read_bytes() == \
        (tmp_path / "ref.csv").read_bytes()
    ref_run(ref_cli, [TWO_STATES, "-o", "field-order=ascending",
                      "format=shapefile", str(tmp_path / "ref.shp")])
    run_commands(f"-i {TWO_STATES} -o field-order=ascending "
                 f"format=shapefile {tmp_path}/ours.shp")
    a = (tmp_path / "ref.dbf").read_bytes()
    b = (tmp_path / "ours.dbf").read_bytes()
    assert a[4:] == b[4:] and len(a) == len(b)


def test_o_rfc7946_bytes_identical(ray_session, ref_cli, tmp_path):
    """-o rfc7946: default 1e-6 precision, reversed ring order (CCW
    outers / CW holes), no crs member — byte-identical."""
    ref = tmp_path / "ref.json"
    ours = tmp_path / "ours.json"
    ref_run(ref_cli, [SIX_COUNTIES, "-o", "rfc7946", str(ref)])
    run_commands(f"-i {SIX_COUNTIES} -o rfc7946 {ours}")
    assert ours.read_bytes() == ref.read_bytes()


def test_o_combine_layers_bytes_identical(ray_session, ref_cli,
                                          tmp_path):
    """-o combine-layers merges all target layers into one
    FeatureCollection in layer order."""
    src = "/root/reference/test/test_data/issues/177/mixed_feature.json"
    ref = tmp_path / "ref.json"
    ours = tmp_path / "ours.json"
    ref_run(ref_cli, [src, "-o", "combine-layers", str(ref)])
    run_commands(f"-i {src} -o combine-layers {ours}")
    assert ours.read_bytes() == ref.read_bytes()


def test_multilayer_topojson_bytes_identical(ray_session, ref_cli,
                                             tmp_path):
    """combine-files + -o .topojson: every layer becomes an object in
    ONE topology with a shared arc table — byte-identical."""
    ref = tmp_path / "ref.topojson"
    ours = tmp_path / "ours.topojson"
    ref_run(ref_cli, [TWO_STATES, SIX_COUNTIES, "combine-files",
                      "-o", str(ref)])
    run_commands(f"-i {TWO_STATES} {SIX_COUNTIES} combine-files "
                 f"-o {ours}")
    assert ours.read_bytes() == ref.read_bytes()


def test_o_singles_topojson_bytes_identical(ray_session, ref_cli,
                                            tmp_path):
    """-o singles: one independently-quantized topology per layer,
    named <layer>.json."""
    refdir = tmp_path / "ref"; refdir.mkdir()
    ourdir = tmp_path / "ours"; ourdir.mkdir()
    ref_run(ref_cli, [TWO_STATES, SIX_COUNTIES, "combine-files",
                      "-o", "singles", str(refdir) + "/x.topojson"])
    run_commands(f"-i {TWO_STATES} {SIX_COUNTIES} combine-files "
                 f"-o singles {ourdir}/x.topojson")
    for f in ("two_states.json", "six_counties.json"):
        assert (ourdir / f).read_bytes() == (refdir / f).read_bytes()


def test_dissolve_fanout_combine_files(ray_session, ref_cli, tmp_path):
    """-dissolve after combine-files applies to EVERY layer, like the
    reference; per-layer outputs byte-identical."""
    refdir = tmp_path / "ref"; refdir.mkdir()
    ourdir = tmp_path / "ours"; ourdir.mkdir()
    ref_run(ref_cli, [TWO_STATES, SIX_COUNTIES, "combine-files",
                      "-dissolve", "-o", "format=geojson",
                      str(refdir) + "/"])
    run_commands(f"-i {TWO_STATES} {SIX_COUNTIES} combine-files "
                 f"-dissolve -o format=geojson {ourdir}/")
    for f in ("two_states.json", "six_counties.json"):
        assert (ourdir / f).read_bytes() == (refdir / f).read_bytes()


def test_i_options_bytes_identical(ray_session, ref_cli, tmp_path):
    """-i snap (auto threshold 0.0025 x avg segment), -i precision=
    (round before topology), -i geometry-type= (one layer, mismatched
    geometries null) match the reference byte-for-byte."""
    cases = [
        (["snap", f"{TD}/issues/clean/overlapping_polygons.json"],
         f"-i snap {TD}/issues/clean/overlapping_polygons.json"),
        ([f"{TD}/two_states.shp", "precision=0.01"],
         f"-i {TD}/two_states.shp precision=0.01"),
        ([f"{TD}/issues/177/mixed_feature.json",
          "geometry-type=polygon"],
         f"-i {TD}/issues/177/mixed_feature.json "
         f"geometry-type=polygon"),
    ]
    for k, (ref_args, our_i) in enumerate(cases):
        ref = tmp_path / f"ref{k}.json"
        ours = tmp_path / f"ours{k}.json"
        ref_run(ref_cli, [*ref_args, "-o", str(ref)])
        run_commands(f"{our_i} -o {ours}")
        assert ours.read_bytes() == ref.read_bytes(), ref_args


# --- clip/erase topological corner cases (reference clip-erase-test.js
# Figs 5-12 + bugfix cases), live-diffed on equivalent geometries ------

def _poly(*rings):
    return {"type": "Polygon", "coordinates": [list(r) for r in rings]}


def _fc(*geoms):
    return {"type": "FeatureCollection",
            "features": [{"type": "Feature", "geometry": g,
                          "properties": {"fid": i}}
                         for i, g in enumerate(geoms)]}


SQ = lambda x0, y0, s: [(x0, y0), (x0, y0 + s), (x0 + s, y0 + s),
                        (x0 + s, y0), (x0, y0)]
SQH = lambda x0, y0, s: [(x0, y0), (x0 + s, y0), (x0 + s, y0 + s),
                         (x0, y0 + s), (x0, y0)]  # hole winding


CLIP_CASES = {
    # polygon with hole clipped by an overlapping square (Fig 5/6)
    "hole_overlap": (_fc(_poly(SQ(0, 0, 10), SQH(3, 3, 4))),
                     _fc(_poly(SQ(5, -2, 10)))),
    # ring inside ring: clip the donut by a square inside the hole
    "ring_inside_ring": (_fc(_poly(SQ(0, 0, 10), SQH(2, 2, 6))),
                         _fc(_poly(SQ(3, 3, 4)))),
    # congruent rings (Fig 10): clip layer identical to target
    "congruent": (_fc(_poly(SQ(0, 0, 8))), _fc(_poly(SQ(0, 0, 8)))),
    # adjacent rings (Fig 11): two squares sharing an edge, clip by a
    # rect overlapping both
    "adjacent": (_fc(_poly(SQ(0, 0, 4)), _poly(SQ(4, 0, 4))),
                 _fc(_poly(SQ(2, -1, 4)))),
    # adjacent polygons inside polygon (Fig 8/12)
    "nested_adjacent": (_fc(_poly(SQ(1, 1, 3)), _poly(SQ(4, 1, 3))),
                        _fc(_poly(SQ(0, 0, 10)))),
    # interior ring touches the clip shape at one point (bugfix)
    "hole_touch_point": (_fc(_poly(SQ(0, 0, 10), SQH(5, 5, 5))),
                         _fc(_poly(SQ(0, 0, 5)))),
    # island clip/erase self (bugfix)
    "self_clip": (_fc(_poly(SQ(0, 0, 6))), None),
}


@pytest.mark.parametrize("case", sorted(CLIP_CASES))
@pytest.mark.parametrize("op", ["clip", "erase"])
def test_clip_erase_fig_cases(ray_session, ref_cli, tmp_path, case, op):
    tgt, clp = CLIP_CASES[case]
    t = tmp_path / "t.json"
    t.write_text(json.dumps(tgt))
    if clp is None:
        c = t  # self clip/erase
    else:
        c = tmp_path / "c.json"
        c.write_text(json.dumps(clp))
    ref = tmp_path / "ref.json"
    ours = tmp_path / "ours.json"
    ref_run(ref_cli, [str(t), f"-{op}", str(c), "-o", str(ref)])
    run_commands(f"-i {t} -{op} {c} -o {ours}")
    assert all_rings(str(ours), nd=9) == all_rings(str(ref), nd=9), \
        (case, op)


@pytest.mark.parametrize("op", ["clip", "erase"])
def test_clip_erase_self_intersecting_target(ray_session, ref_cli,
                                             tmp_path, op):
    """Bowtie (self-intersecting) target polygon clipped/erased by a
    rectangle — rides the same cut+repair path as the reference."""
    tgt = _fc(_poly([(0, 0), (10, 10), (10, 0), (0, 10), (0, 0)]))
    clp = _fc(_poly([(2, -1), (8, -1), (8, 11), (2, 11), (2, -1)]))
    t = tmp_path / "t.json"; t.write_text(json.dumps(tgt))
    c = tmp_path / "c.json"; c.write_text(json.dumps(clp))
    ref = tmp_path / "ref.json"
    ours = tmp_path / "ours.json"
    ref_run(ref_cli, [str(t), f"-{op}", str(c), "-o", str(ref)])
    run_commands(f"-i {t} -{op} {c} -o {ours}")
    assert all_rings(str(ours), nd=9) == all_rings(str(ref), nd=9)


def test_o_bbox_index_and_dry_run(ray_session, ref_cli, tmp_path):
    """-o bbox-index writes the reference's sidecar bbox-index.json
    byte-identically; -o dry-run writes nothing."""
    refdir = tmp_path / "ref"; refdir.mkdir()
    ourdir = tmp_path / "ours"; ourdir.mkdir()
    ref_run(ref_cli, [THREE_POINTS, "-o", "bbox-index",
                      str(refdir / "x.json")])
    run_commands(f"-i {THREE_POINTS} -o bbox-index {ourdir}/x.json")
    assert (ourdir / "bbox-index.json").read_bytes() == \
        (refdir / "bbox-index.json").read_bytes()
    assert (ourdir / "x.json").read_bytes() == \
        (refdir / "x.json").read_bytes()
    run_commands(f"-i {THREE_POINTS} -o dry-run {ourdir}/nope.json")
    assert not (ourdir / "nope.json").exists()


def test_mixed_poly_line_topojson_bytes_identical(ray_session, ref_cli,
                                                  tmp_path):
    """Mixed polygon+line import exported to TopoJSON: one topology,
    the line SHARES the polygon's edge arcs, polygon ring handling
    stays ring-aware (per-feature closed flags) — byte-identical."""
    doc = _fc(_poly([(0, 0), (0, 4), (4, 4), (4, 0), (0, 0)]),
              {"type": "LineString",
               "coordinates": [[0, 0], [0, 4], [4, 4]]})
    src = tmp_path / "mx.json"
    src.write_text(json.dumps(doc))
    ref = tmp_path / "ref.topojson"
    ours = tmp_path / "ours.topojson"
    ref_run(ref_cli, [str(src), "-o", str(ref)])
    run_commands(f"-i {src} -o {ours}")
    assert ours.read_bytes() == ref.read_bytes()


def test_dissolve_csv_table(ray_session, ref_cli, tmp_path):
    """-dissolve on a data-only CSV layer: one record per key group in
    first-appearance order (reference dissolve-test 'dissolve CSV on
    three fields'), byte-identical output."""
    src = tmp_path / "in.csv"
    src.write_text("id1,id2,id3\na,1,x\na,1,x\na,2,x\nb,1,x\nb,2,x\n"
                   "b,2,x\nc,2,x\na,1,y\na,1,y")
    ref = tmp_path / "ref.csv"
    ours = tmp_path / "ours.csv"
    ref_run(ref_cli, [str(src), "-dissolve", "id1,id2,id3",
                      "-o", str(ref)])
    run_commands(f"-i {src} -dissolve id1,id2,id3 -o {ours}")
    assert ours.read_bytes() == ref.read_bytes()


def test_uniq_csv_table(ray_session, ref_cli, tmp_path):
    """-uniq on a data-only CSV keeps the first row per key in row
    order (no feature_id on tables — position is identity)."""
    src = tmp_path / "u.csv"
    src.write_text("k,v\nb,1\na,2\nb,3\na,4\n")
    ref = tmp_path / "ref.csv"
    ours = tmp_path / "ours.csv"
    ref_run(ref_cli, [str(src), "-uniq", "k", "-o", str(ref)])
    run_commands(f"-i {src} -uniq k -o {ours}")
    assert ours.read_bytes() == ref.read_bytes()


def test_o_csv_encoding(ray_session, tmp_path):
    """-o encoding= transcodes CSV output; unmappable characters become
    '?' like the reference's iconv encode (delim-export-test.js)."""
    src = tmp_path / "in.csv"
    src.write_text("foo,bar\nétranger,外国人\n",
                   encoding="utf-8")
    run_commands(f"-i {src} -o encoding=latin-1 {tmp_path}/l1.csv")
    assert (tmp_path / "l1.csv").read_bytes() == \
        b"foo,bar\n\xe9tranger,???"
    run_commands(f"-i {src} -o encoding=ascii {tmp_path}/a.csv")
    assert (tmp_path / "a.csv").read_bytes() == b"foo,bar\n?tranger,???"
    run_commands(f"-i {src} -o encoding=utf-16be {tmp_path}/u.csv")
    assert (tmp_path / "u.csv").read_bytes().decode("utf-16be") == \
        "foo,bar\nétranger,外国人"


@pytest.mark.parametrize("case,mga", [
    ("cw_in_cw", None),            # Fig 14: ring inside ring dissolves
    ("hole_kept", None),           # hole preserved without min-gap
    ("hole_filled", "1.1"),        # min-gap-area removes small hole
    ("hole_retained", "0.9"),      # smaller threshold keeps it
    ("units", "10km2"),            # min-gap-area accepts area units
])
def test_dissolve2_min_gap_cases(ray_session, ref_cli, tmp_path, case,
                                 mga):
    """-dissolve2 hole/gap handling (reference dissolve3-test Fig 14
    cases incl. unit-bearing min-gap-area)."""
    if case == "cw_in_cw":
        doc = _fc(_poly(SQ(0, 0, 3)), _poly(SQ(1, 1, 1)))
    elif case == "units":
        doc = _fc(_poly(SQ(0, 0, 13),
                        [(1, 1), (1.02, 1), (1.02, 1.02), (1, 1.02),
                         (1, 1)]))
    else:
        doc = _fc(_poly(SQ(0, 100, 3),
                        [(1, 101), (2, 101), (2, 102), (1, 102),
                         (1, 101)]))
    src = tmp_path / "in.json"
    src.write_text(json.dumps(doc))
    opt = [f"min-gap-area={mga}"] if mga else []
    ref = tmp_path / "ref.json"
    ours = tmp_path / "ours.json"
    ref_run(ref_cli, [str(src), "-dissolve2", *opt, "-o", str(ref)])
    run_commands(f"-i {src} -dissolve2 {' '.join(opt)} -o {ours}")
    assert all_rings(str(ours)) == all_rings(str(ref))


def test_clip_target_and_o_all_layers(ray_session, tmp_path):
    """clip-issues-test: -clip target=a touches only layer a; -o
    target=* exports every layer to <layer>.json; the clipping layer's
    own arcs stay unmodified."""
    topo = {"type": "Topology",
            "arcs": [[[0, 0], [0, 1], [1, 1], [1, 0], [0, 0]],
                     [[2, 0], [2, 1], [3, 1], [3, 0], [2, 0]]],
            "objects": {
                "a": {"type": "Polygon", "arcs": [[0]],
                      "properties": {"name": "a"}},
                "b": {"type": "Polygon", "arcs": [[1]],
                      "properties": {"name": "b"}}}}
    src = tmp_path / "boxes.topojson"
    src.write_text(json.dumps(topo))
    run_commands(f"-i {src} -clip target=a bbox=-1,-1,1.5,1.5 "
                 f"-o format=geojson target=* {tmp_path}/out.json")
    a = json.load(open(tmp_path / "a.json"))
    b = json.load(open(tmp_path / "b.json"))
    assert a["features"][0]["geometry"]["coordinates"] == \
        [[[0, 0], [0, 1], [1, 1], [1, 0], [0, 0]]]
    assert b["features"][0]["geometry"]["coordinates"] == \
        [[[2, 0], [2, 1], [3, 1], [3, 0], [2, 0]]]
    # clipping layer not modified (second clip-issues case)
    clipper = tmp_path / "clipper.json"
    clipper.write_text(json.dumps(
        {"type": "Polygon",
         "coordinates": [[[0, 0], [0, 1], [1, 1], [1, 0], [0, 0]]]}))
    clipped = tmp_path / "clipped.json"
    clipped.write_text(json.dumps(
        {"type": "Polygon",
         "coordinates": [[[0, 0], [0, 1], [2, 1], [2, 0], [0, 0]]]}))
    out = tmp_path / "o2"
    out.mkdir()
    run_commands(f"-i {clipper} -i {clipped} -clip clipper "
                 f"-o target=* {out}/x.json")
    c2 = json.load(open(out / "clipper.json"))
    geoms = c2.get("geometries") or \
        [f["geometry"] for f in c2["features"]]
    assert geoms[0]["coordinates"] == \
        [[[0, 0], [0, 1], [1, 1], [1, 0], [0, 0]]]


def test_drop_geometry_and_all_fields(ray_session, tmp_path):
    """-drop geometry nulls shapes keeping data; -drop fields=* strips
    every attribute (reference drop-test)."""
    src = tmp_path / "in.json"
    src.write_text(json.dumps(
        {"type": "Feature", "properties": {"foo": "a", "bar": "b"},
         "geometry": {"type": "Point", "coordinates": [0, 0]}}))
    run_commands(f"-i {src} -drop geometry -o {tmp_path}/g.json")
    doc = json.load(open(tmp_path / "g.json"))
    assert doc["features"][0]["geometry"] is None
    assert doc["features"][0]["properties"] == {"foo": "a", "bar": "b"}
    run_commands(f"-i {src} -drop fields=* -o {tmp_path}/f.json")
    doc = json.load(open(tmp_path / "f.json"))
    assert doc["geometries"][0] == {"type": "Point",
                                    "coordinates": [0, 0]}


def test_rectangle_source_offset(ray_session, ref_cli, tmp_path):
    """-rectangle source=<layer> offset=<dist>: bbox of the source
    layer padded by the offset — byte-identical."""
    ref = tmp_path / "ref.json"
    ours = tmp_path / "ours.json"
    ref_run(ref_cli, [TWO_STATES, "name=states", "-rectangle",
                      "source=states", "offset=1", "-o",
                      "target=rectangle", str(ref)])
    run_commands(f"-i {TWO_STATES} name=states -rectangle "
                 f"source=states offset=1 -o target=rectangle {ours}")
    assert ours.read_bytes() == ref.read_bytes()


def test_clip_erase_random_fuzz(ray_session, ref_cli, tmp_path):
    """Seeded random star polygons, clip AND erase, rings diffed vs
    the live reference at 9 decimals (wider randomized sweep ran 24
    cases clean during development)."""
    rng = np.random.default_rng(7)

    def rand_poly(cx, cy):
        n = int(rng.integers(4, 9))
        ang = np.sort(rng.uniform(0, 2 * np.pi, n))
        rad = rng.uniform(0.5, 3.0, n)
        ring = [[float(round(cx + r * np.cos(a), 3)),
                 float(round(cy + r * np.sin(a), 3))]
                for a, r in zip(ang, rad)]
        ring.append(ring[0])
        return {"type": "Polygon", "coordinates": [ring]}

    for trial in range(3):
        tgt = _fc(*[rand_poly(rng.uniform(-1, 1), rng.uniform(-1, 1))
                    for _ in range(int(rng.integers(1, 4)))])
        clp = _fc(*[rand_poly(rng.uniform(-1, 1), rng.uniform(-1, 1))
                    for _ in range(int(rng.integers(1, 3)))])
        t = tmp_path / f"t{trial}.json"
        c = tmp_path / f"c{trial}.json"
        t.write_text(json.dumps(tgt))
        c.write_text(json.dumps(clp))
        for op in ("clip", "erase"):
            ref = tmp_path / f"ref{trial}{op}.json"
            ours = tmp_path / f"our{trial}{op}.json"
            ref_run(ref_cli, [str(t), f"-{op}", str(c), "-o",
                              str(ref)])
            run_commands(f"-i {t} -{op} {c} -o {ours}")
            assert all_rings(str(ours), nd=9) == \
                all_rings(str(ref), nd=9), (trial, op)


def test_dissolve2_clean_random_fuzz(ray_session, ref_cli, tmp_path):
    """Seeded random overlapping star polygons through -dissolve2
    (keyless + keyed) and -clean, rings diffed vs the live reference
    (a wider 24-case sweep ran clean during development)."""
    rng = np.random.default_rng(21)

    def rand_poly(cx, cy):
        n = int(rng.integers(4, 9))
        ang = np.sort(rng.uniform(0, 2 * np.pi, n))
        rad = rng.uniform(0.5, 3.0, n)
        ring = [[float(round(cx + r * np.cos(a), 3)),
                 float(round(cy + r * np.sin(a), 3))]
                for a, r in zip(ang, rad)]
        ring.append(ring[0])
        return {"type": "Polygon", "coordinates": [ring]}

    for trial in range(2):
        k = int(rng.integers(2, 5))
        feats = [{"type": "Feature",
                  "geometry": rand_poly(rng.uniform(-1, 1),
                                        rng.uniform(-1, 1)),
                  "properties": {"g": "ab"[int(rng.integers(0, 2))]}}
                 for _ in range(k)]
        src = tmp_path / f"t{trial}.json"
        src.write_text(json.dumps({"type": "FeatureCollection",
                                   "features": feats}))
        for spec in ("-dissolve2", "-dissolve2 g", "-clean"):
            tag = spec.replace(" ", "_")
            ref = tmp_path / f"ref{trial}{tag}.json"
            ours = tmp_path / f"our{trial}{tag}.json"
            ref_run(ref_cli, [str(src), *spec.split(), "-o", str(ref)])
            run_commands(f"-i {src} {spec} -o {ours}")
            assert all_rings(str(ours), nd=9) == \
                all_rings(str(ref), nd=9), (trial, spec)


def test_filter_geom_per_part(ray_session, ref_cli, tmp_path):
    """-filter-geom bbox= removes PARTS outside the bbox (points:
    per-coordinate; paths: per-part bbox intersect) and drops emptied
    features — byte-identical (reference filter-geom-test)."""
    lines = {"type": "GeometryCollection", "geometries": [
        {"type": "MultiLineString",
         "coordinates": [[[0, 0], [0, -10]], [[180, -1], [179, -2]],
                         [[-180, 90], [-180, 89]]]},
        {"type": "LineString", "coordinates": [[10, -10], [11, -11]]}]}
    src = tmp_path / "l.json"
    src.write_text(json.dumps(lines))
    ref = tmp_path / "ref.json"
    ours = tmp_path / "ours.json"
    ref_run(ref_cli, [str(src), "-filter-geom", "bbox=-180,0,180,90",
                      "-o", str(ref)])
    run_commands(f"-i {src} -filter-geom bbox=-180,0,180,90 -o {ours}")
    assert ours.read_bytes() == ref.read_bytes()
    pts = {"type": "GeometryCollection", "geometries": [
        {"type": "MultiPoint", "coordinates": [[0, 0], [5, 50]]},
        {"type": "Point", "coordinates": [0, -1]}]}
    src2 = tmp_path / "p.json"
    src2.write_text(json.dumps(pts))
    ref2 = tmp_path / "ref2.json"
    ours2 = tmp_path / "ours2.json"
    ref_run(ref_cli, [str(src2), "-filter-geom", "bbox=-180,0,180,90",
                      "-o", str(ref2)])
    run_commands(f"-i {src2} -filter-geom bbox=-180,0,180,90 "
                 f"-o {ours2}")
    assert ours2.read_bytes() == ref2.read_bytes()


@pytest.mark.parametrize("spec,ref_args", [
    ("+proj=stere +lat_0=90 +lat_ts=70",
     ["-proj", "+proj=stere", "+lat_0=90", "+lat_ts=70"]),
    ("+proj=laea +lat_0=52 +lon_0=10",
     ["-proj", "+proj=laea", "+lat_0=52", "+lon_0=10"]),
    ("+proj=eqdc +lat_1=20 +lat_2=60",
     ["-proj", "+proj=eqdc", "+lat_1=20", "+lat_2=60"]),
    ("+proj=aea +lat_1=29.5 +lat_2=45.5",
     ["-proj", "+proj=aea", "+lat_1=29.5", "+lat_2=45.5"]),
    ("+proj=lcc +lat_1=33 +lat_2=45 +lat_0=23 +lon_0=-96",
     ["-proj", "+proj=lcc", "+lat_1=33", "+lat_2=45", "+lat_0=23",
      "+lon_0=-96"]),
    ("+proj=merc +lat_ts=20", ["-proj", "+proj=merc", "+lat_ts=20"]),
    ("+proj=tmerc +lon_0=9 +k_0=0.9996 +x_0=500000",
     ["-proj", "+proj=tmerc", "+lon_0=9", "+k_0=0.9996",
      "+x_0=500000"]),
])
def test_parametered_prj_wkt_bytes(ray_session, ref_cli, tmp_path,
                                   spec, ref_args):
    """Parametered '+proj=' exports write BYTE-IDENTICAL .prj WKT to
    the reference's mproj converter (PARAMETER lists per
    wkt_param_table + family rules, ECMA number formatting)."""
    from mapshaper_ray.stages.proj import wkt_for_defn
    ref_run(ref_cli, [THREE_POINTS_SHP, *ref_args, "-o",
                      str(tmp_path / "ref.shp")])
    ref_prj = (tmp_path / "ref.prj").read_text()
    assert wkt_for_defn(spec) == ref_prj


def test_proj4_zero_defaults_vs_mproj(ray_session, ref_cli, tmp_path):
    """Bare '+proj=aea +lat_1 +lat_2' projects at lat_0=0/lon_0=0 like
    mproj — NOT at the albers alias's AlbersNYT parameters."""
    ref = tmp_path / "ref.json"
    ours = tmp_path / "ours.json"
    ref_run(ref_cli, [THREE_POINTS, "-proj", "+proj=aea",
                      "+lat_1=29.5", "+lat_2=45.5", "-o", str(ref)])
    run_commands(f"-i {THREE_POINTS} -proj +proj=aea +lat_1=29.5 "
                 f"+lat_2=45.5 -o {ours}")
    a = np.array([g["coordinates"] for g in geoms(str(ours))], float)
    b = np.array([g["coordinates"] for g in geoms(str(ref))], float)
    assert np.allclose(a, b, rtol=0, atol=1e-8)


@pytest.mark.parametrize("spec,ref_args,atol", [
    ("+proj=cass", ["-proj", "+proj=cass"], 1e-8),     # BIT-exact fwd
    ("+proj=moll", ["-proj", "+proj=moll"], 1e-8),
    ("+proj=mill", ["-proj", "+proj=mill"], 1e-8),
    ("+proj=gall", ["-proj", "+proj=gall"], 1e-8),
    ("+proj=cea +lat_ts=30",
     ["-proj", "+proj=cea", "+lat_ts=30"], 1e-8),
])
def test_proj_extra_families_vs_mproj(ray_session, ref_cli, tmp_path,
                                      spec, ref_args, atol):
    """Round-3 additions: cass/moll/mill/gall/cea vs live mproj."""
    ref = tmp_path / "ref.json"
    ours = tmp_path / "ours.json"
    ref_run(ref_cli, [THREE_POINTS, *ref_args, "-o", str(ref)])
    run_commands(f"-i {THREE_POINTS} -proj {spec} -o {ours}")
    a = np.array([g["coordinates"] for g in geoms(str(ours))], float)
    b = np.array([g["coordinates"] for g in geoms(str(ref))], float)
    assert a.shape == b.shape
    assert np.allclose(a, b, rtol=0, atol=atol)


def test_each_filter_js_expressions_bytes_identical(ray_session,
                                                    ref_cli, tmp_path):
    """Genuinely-JS -each/-filter expressions (ternary, ===, &&,
    string methods, Math.*, d. access) run unchanged through the JS
    compatibility evaluator and produce byte-identical output to the
    reference CLI."""
    ref = tmp_path / "ref.json"
    ours = tmp_path / "ours.json"
    each = ("UP = STATE_NAME.toUpperCase(), "
            "side = FIPS === '41' ? 'west' : 'east', "
            "n2 = Math.round(Number(FIPS) / 10), "
            "tag = this.properties.STATE_NAME.indexOf('re') > -1"
            " && FIPS !== '53' ? 'OR' : 'other'")
    flt = "STATE_NAME.length > 4 || FIPS === '53'"
    ref_run(ref_cli, [TWO_STATES, "-each", each, "-filter", flt,
                      "-o", str(ref)])
    from mapshaper_ray.commands import parse_commands
    run_commands(parse_commands(["-i", TWO_STATES, "-each", each,
                                 "-filter", flt, "-o", str(ours)]))
    assert ours.read_bytes() == ref.read_bytes()
