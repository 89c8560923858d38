"""Widened -proj surface: proj4 families, aliases, from= plumbing."""

import numpy as np
import pytest

from mapshaper_ray.stages.proj import (albers_fwd, albers_inv, lcc_fwd,
                                       lcc_inv, eqc_fwd, eqc_inv,
                                       albersusa_fwd, robinson_fwd,
                                       resolve_projection)


def _grid():
    lon, lat = np.meshgrid(np.linspace(-120, -70, 6),
                           np.linspace(25, 48, 5))
    return lon.ravel(), lat.ravel()


def test_lcc_roundtrip():
    lon, lat = _grid()
    x, y = lcc_fwd(lon, lat)
    lon2, lat2 = lcc_inv(x, y)
    assert np.allclose(lon, lon2, atol=1e-9)
    assert np.allclose(lat, lat2, atol=1e-9)


def test_albers_roundtrip():
    lon, lat = _grid()
    x, y = albers_fwd(lon, lat)
    lon2, lat2 = albers_inv(x, y)
    assert np.allclose(lon, lon2, atol=1e-9)
    assert np.allclose(lat, lat2, atol=1e-9)


def test_eqc_roundtrip_with_lat_ts():
    lon, lat = _grid()
    x, y = eqc_fwd(lon, lat, lat_ts=30.0)
    lon2, lat2 = eqc_inv(x, y, lat_ts=30.0)
    assert np.allclose(lon, lon2)
    assert np.allclose(lat, lat2)


def test_robinson_shape():
    # equator maps to y=0, poles to +-1.3523*R; x shrinks toward poles
    x0, y0 = robinson_fwd(np.array([90.0]), np.array([0.0]))
    xp, yp = robinson_fwd(np.array([90.0]), np.array([90.0]))
    # proj4's float32 c0 for the first Y row is -5.2e-18, not exactly 0
    assert abs(y0[0]) < 1e-9
    assert np.isclose(yp[0], 1.3523 * 6378137.0)
    assert abs(xp[0]) < abs(x0[0])
    xn, yn = robinson_fwd(np.array([90.0]), np.array([-90.0]))
    assert np.isclose(yn[0], -1.3523 * 6378137.0)


def test_albersusa_insets():
    # Anchorage lands left of / below the continental frame; Honolulu
    # below; continental points are plain Albers
    lon = np.array([-149.9, -157.85, -100.0])
    lat = np.array([61.2, 21.3, 40.0])
    x, y = albersusa_fwd(lon, lat)
    cx, cy = albers_fwd(np.array([-100.0]), np.array([40.0]))
    assert x[2] == cx[0] and y[2] == cy[0]
    assert y[0] < cy[0]  # AK inset shifted down-left
    assert y[1] < cy[0]  # HI inset below


def test_resolve_proj4_string_params():
    # '+proj=' strings take PROJ4's ZERO defaults for lat_0/lon_0
    # (verified live against mproj — the alias kernels' AlbersNYT-style
    # defaults apply only to the aliases)
    fwd, inv = resolve_projection("+proj=lcc +lat_1=40 +lat_2=50")
    x, y = fwd(np.array([-96.0]), np.array([45.0]))
    xd, yd = lcc_fwd(np.array([-96.0]), np.array([45.0]),
                     lat1=40.0, lat2=50.0, lat0=0.0, lon0=0.0)
    assert x[0] == xd[0] and y[0] == yd[0]
    with pytest.raises(ValueError):
        resolve_projection("+proj=nosuch")
    with pytest.raises(ValueError):
        resolve_projection("utm17n")
    with pytest.raises(ValueError):   # mproj: conic lat_1 = -lat_2
        resolve_projection("+proj=lcc")


def test_project_points_from_proj(ray_session):
    """from= plumbing: webmercator coords -> inverse -> lcc."""
    import pandas as pd
    import ray.data as rd
    from mapshaper_ray.stages.proj import project_points, webmercator_fwd
    lon = np.array([-100.0, -80.0])
    lat = np.array([30.0, 45.0])
    mx, my = webmercator_fwd(lon, lat)
    ds = rd.from_pandas(pd.DataFrame({"doc_id": [0, 1],
                                      "lon": mx, "lat": my}))
    out = project_points(ds, "lcc", from_proj="webmercator").to_pandas()
    ex, ey = lcc_fwd(lon, lat)
    assert np.allclose(out["x"], ex)
    assert np.allclose(out["y"], ey)


def test_stere_roundtrip_all_modes():
    """PJ_stere port: polar (with lat_ts), oblique (k0) and equatorial
    modes roundtrip fwd->inv to float tolerance."""
    from mapshaper_ray.stages.proj import stere_fwd, stere_inv
    lon = np.array([-96.0, 10.0, 150.0, -20.0])
    lat = np.array([40.0, -35.0, 70.0, 5.0])
    for kw in (dict(lat0=90.0, lat_ts=70.0),
               dict(lat0=52.15616, lon0=5.38764, k0=0.9999079),
               dict()):
        x, y = stere_fwd(lon, lat, **kw)
        lo, la = stere_inv(x, y, **kw)
        assert np.allclose(lo, lon, atol=1e-9)
        assert np.allclose(la, lat, atol=1e-9)


def test_laea_roundtrip_all_modes():
    from mapshaper_ray.stages.proj import laea_fwd, laea_inv
    lon = np.array([-96.0, 10.0, 150.0, -20.0])
    lat = np.array([40.0, -35.0, 70.0, 5.0])
    for kw in (dict(lat0=52.0, lon0=10.0), dict(lat0=90.0), dict()):
        x, y = laea_fwd(lon, lat, **kw)
        lo, la = laea_inv(x, y, **kw)
        assert np.allclose(lo, lon, atol=1e-7)
        # authalic series truncation ~1e-8 deg (same as PROJ itself)
        assert np.allclose(la, lat, atol=1e-7)


def test_eqdc_roundtrip():
    from mapshaper_ray.stages.proj import eqdc_fwd, eqdc_inv
    lon = np.array([-96.0, 10.0, 150.0, -20.0])
    lat = np.array([40.0, -35.0, 70.0, 5.0])
    kw = dict(lat1=20.0, lat2=60.0, lat0=40.0, lon0=-96.0)
    x, y = eqdc_fwd(lon, lat, **kw)
    lo, la = eqdc_inv(x, y, **kw)
    assert np.allclose(lo, lon, atol=1e-9)
    assert np.allclose(la, lat, atol=1e-9)


def test_extra_families_roundtrip():
    """cass (in series domain) / moll / mill / gall / cea roundtrip."""
    from mapshaper_ray.stages.proj import (cass_fwd, cass_inv, cea_fwd,
                                           cea_inv, gall_fwd, gall_inv,
                                           mill_fwd, mill_inv,
                                           moll_fwd, moll_inv)
    lon = np.array([-79.0, -76.5, -81.0])
    lat = np.array([43.0, 38.0, 47.5])
    x, y = cass_fwd(lon, lat, lon0=-78.0)
    lo, la = cass_inv(x, y, lon0=-78.0)
    assert np.allclose(lo, lon, atol=1e-6)   # series precision
    assert np.allclose(la, lat, atol=1e-6)
    for fwd, inv, kw in ((moll_fwd, moll_inv, {}),
                         (mill_fwd, mill_inv, {}),
                         (gall_fwd, gall_inv, {}),
                         (cea_fwd, cea_inv, dict(lat_ts=30.0))):
        x, y = fwd(lon, lat, **kw)
        lo, la = inv(x, y, **kw)
        assert np.allclose(lo, lon, atol=1e-7)
        assert np.allclose(la, lat, atol=1e-7)


def test_parse_prj_new_families(tmp_path):
    """WKT written by wkt_for_defn parses back to matching transforms
    for the round-3 families."""
    from mapshaper_ray.stages.proj import (parse_prj,
                                           resolve_projection,
                                           wkt_for_defn)
    lon = np.array([-70.0, 15.0])
    lat = np.array([45.0, -20.0])
    for spec in ("+proj=cass +lat_0=40 +lon_0=-75",
                 "+proj=cea +lat_ts=30",
                 "+proj=laea +lat_0=52 +lon_0=10",
                 "+proj=eqdc +lat_1=20 +lat_2=60",
                 "+proj=stere +lat_0=90 +lat_ts=70"):
        wkt = wkt_for_defn(spec)
        assert wkt is not None, spec
        pair = parse_prj(wkt)
        assert pair is not None, spec
        f1, _ = pair
        f2, _ = resolve_projection(spec)
        assert np.allclose(np.c_[f1(lon, lat)], np.c_[f2(lon, lat)],
                           atol=1e-6), spec


def test_round3_wide_batch_roundtrips():
    """Round-3 world-family kernels: fwd∘inv identity on in-domain
    points (live-mproj forward parity is in
    test_reference_cli_parity.py::test_proj_family_batch_vs_mproj)."""
    from mapshaper_ray.stages.proj import resolve_projection
    world = (np.array([-96.5, 12.3, 150.1, -70.2, 24.8]),
             np.array([38.2, 48.7, -33.9, -54.8, 60.2]))
    cases = {
        "+proj=natearth": world, "+proj=eck1": world,
        "+proj=eck2": world, "+proj=eck3": world, "+proj=eck4": world,
        "+proj=eck5": world, "+proj=eck6": world, "+proj=kav7": world,
        "+proj=hammer": world, "+proj=aitoff": world,
        "+proj=wintri": world, "+proj=loxim +lat_1=40": world,
        "+proj=times": world, "+proj=tcea": world,
        "+proj=goode": world, "+proj=bonne +lat_1=45": world,
        "+proj=ortho +lat_0=40 +lon_0=-100":
            (np.array([-96.5, -120.3, -80.1]),
             np.array([38.2, 48.7, 25.9])),
        "+proj=gnom +lat_0=40 +lon_0=-100":
            (np.array([-96.5, -120.3, -80.1]),
             np.array([38.2, 48.7, 25.9])),
        "+proj=poly +lat_0=30 +lon_0=-90":
            (np.array([-90.0, -96.5, -80.0]),
             np.array([30.0, 38.2, 25.0])),
        "+proj=sterea +lat_0=52.156 +lon_0=5.387 +k=0.9999079 "
        "+x_0=155000 +y_0=463000 +ellps=bessel":
            (np.array([5.38, 4.3, 6.9]), np.array([52.15, 51.9, 53.2])),
        "+proj=somerc +lat_0=46.95 +lon_0=7.44 +x_0=600000 "
        "+y_0=200000 +ellps=bessel":
            (np.array([7.44, 6.1, 9.8]), np.array([46.95, 46.2, 47.5])),
        "+proj=krovak":
            (np.array([14.42, 17.1, 12.9]),
             np.array([50.08, 48.8, 50.5])),
        "+proj=omerc +lat_0=4 +lonc=102.25 +alpha=323.0257964666666 "
        "+k=0.99984 +x_0=804671":
            (np.array([102.25, 101.7, 103.8]),
             np.array([4.0, 3.15, 1.35])),
        "+proj=nzmg":
            (np.array([173.0, 174.7, 170.5]),
             np.array([-41.0, -36.85, -45.87])),
    }
    for spec, (lon, lat) in cases.items():
        fwd, inv = resolve_projection(spec)
        x, y = fwd(lon, lat)
        lo, la = inv(x, y)
        assert np.allclose(lo, lon, atol=1e-7), spec
        assert np.allclose(la, lat, atol=1e-7), spec


def test_vandg_closed_form_inverse():
    """Van der Grinten: cubic-resolvent inverse is exact away from the
    equator singularity (same formula domain as mproj pj_vandg)."""
    from mapshaper_ray.stages.proj import resolve_projection
    fwd, inv = resolve_projection("+proj=vandg")
    lon = np.array([-96.5, 12.3, 150.1, 179.0])
    lat = np.array([38.2, 48.7, -33.9, 60.0])
    x, y = fwd(lon, lat)
    lo, la = inv(x, y)
    assert np.allclose(lo, lon, atol=1e-9)
    assert np.allclose(la, lat, atol=1e-9)


def test_proj_unknown_param_rejected():
    from mapshaper_ray.stages.proj import resolve_projection
    import pytest as _pytest
    with _pytest.raises(ValueError):
        resolve_projection("+proj=moll +lat_ts=30")


def test_round4_longtail_roundtrips():
    """Round-4 long-tail batch (remaining mproj spherical
    pseudocylindricals + misc): fwd∘inv identity on in-domain world
    points for every family that mproj itself can invert (live-mproj
    forward parity is in test_reference_cli_parity.py::
    test_proj_round4_batch_vs_mproj)."""
    from mapshaper_ray.stages.proj import resolve_projection
    world = (np.array([-96.5, 12.3, 150.1, -70.2, 24.8]),
             np.array([38.2, 48.7, -33.9, -54.8, 60.2]))
    specs = ["+proj=putp1", "+proj=putp2", "+proj=putp3",
             "+proj=putp3p", "+proj=putp4p", "+proj=weren",
             "+proj=putp5", "+proj=putp5p", "+proj=putp6",
             "+proj=putp6p", "+proj=wag1", "+proj=wag2",
             "+proj=wag3 +lat_ts=30", "+proj=wag4", "+proj=wag5",
             "+proj=wink1 +lat_ts=20", "+proj=urmfps +n=0.8",
             "+proj=kav5", "+proj=qua_aut", "+proj=fouc",
             "+proj=mbt_s", "+proj=mbt_fpp", "+proj=mbt_fpq",
             "+proj=mbt_fps", "+proj=mbtfps",
             "+proj=gn_sinu +m=1 +n=2", "+proj=nell", "+proj=nell_h",
             "+proj=hatano", "+proj=crast", "+proj=latlon"]
    for spec in specs:
        fwd, inv = resolve_projection(spec)
        assert inv is not None, spec
        x, y = fwd(*world)
        lo, la = inv(x, y)
        assert np.allclose(lo, world[0], atol=1e-6), spec
        assert np.allclose(la, world[1], atol=1e-6), spec


def test_ups_roundtrip_both_poles():
    """pj_ups: fixed-constant polar stereographic (k0=0.994,
    fe=fn=2e6) on the WGS84 ellipsoid."""
    from mapshaper_ray.stages.proj import resolve_projection
    fwd_n, inv_n = resolve_projection("+proj=ups")
    lon = np.array([-96.5, 12.3, -179.5, 0.0])
    lat = np.array([68.2, 48.7, 71.2, 89.0])
    lo, la = inv_n(*fwd_n(lon, lat))
    assert np.allclose(lo, lon, atol=1e-9)
    assert np.allclose(la, lat, atol=1e-9)
    fwd_s, inv_s = resolve_projection("+proj=ups +south")
    lo, la = inv_s(*fwd_s(lon, -lat))
    assert np.allclose(lo, lon, atol=1e-9)
    assert np.allclose(la, -lat, atol=1e-9)


def test_round4_fwd_only_families_finite():
    """Forward-only families (no inverse in mproj either) produce
    finite planar coordinates on in-domain points and are registered
    with inv=None."""
    from mapshaper_ray.stages.proj import PROJECTIONS, resolve_projection
    world = (np.array([-96.5, 12.3, 150.1, -70.2, 24.8]),
             np.array([38.2, 48.7, -33.9, -54.8, 60.2]))
    specs = ["+proj=wag7", "+proj=wink2 +lat_1=20",
             "+proj=urm5 +n=0.9 +q=0.5 +alpha=10", "+proj=boggs",
             "+proj=denoy", "+proj=gins8", "+proj=august",
             "+proj=bacon", "+proj=apian", "+proj=ortel",
             "+proj=vandg2", "+proj=vandg3", "+proj=vandg4",
             "+proj=gilbert +lat_1=10"]
    for spec in specs:
        name = spec.split()[0][6:]
        assert PROJECTIONS[name][1] is None, spec
        fwd, _ = resolve_projection(spec)
        x, y = fwd(*world)
        assert np.all(np.isfinite(x)) and np.all(np.isfinite(y)), spec


def test_round4_batch2_roundtrips():
    """Batch 2 (remaining mproj families): fwd∘inv identity for every
    kernel that mproj can invert; live parity is
    test_reference_cli_parity.py::test_proj_round4_batch2_vs_mproj."""
    from mapshaper_ray.stages.proj import resolve_projection
    world = (np.array([-96.5, 12.3, 150.1, -70.2, 24.8]),
             np.array([38.2, 48.7, -33.9, -54.8, 60.2]))
    na = (np.array([-96.5, -120.3, -80.1]),
          np.array([38.2, 48.7, 25.9]))
    cases = {
        "+proj=euler +lat_1=20 +lat_2=60": world,
        "+proj=murd1 +lat_1=20 +lat_2=60": world,
        "+proj=murd2 +lat_1=20 +lat_2=60": na,  # tan() domain: phi > sig-90
        "+proj=murd3 +lat_1=20 +lat_2=60": world,
        "+proj=pconic +lat_1=20 +lat_2=60 +lat_0=40": na,
        "+proj=tissot +lat_1=20 +lat_2=60": world,
        "+proj=vitk1 +lat_1=20 +lat_2=60": world,
        "+proj=leac +lat_1=30": world,
        "+proj=leac +lat_1=-30 +south": world,
        "+proj=wag6": world,
        "+proj=natearth2": world,
        "+proj=nsper +h=3000000 +lat_0=40 +lon_0=-100": na,
        "+proj=tpers +h=5500000 +lat_0=40 +lon_0=-100 +tilt=25"
        " +azi=20": na,
        "+proj=ocea +lat_1=40 +lat_2=50 +lon_1=-100 +lon_2=-60": world,
        "+proj=ocea +alpha=30 +lonc=-75": world,
        "+proj=tpeqd +lat_1=40 +lon_1=-100 +lat_2=50 +lon_2=-60":
            world,
        "+proj=qsc": na,
        "+proj=qsc +lat_0=90": world,
        "+proj=healpix": world,
        # rhealpix roundtrips only in the equatorial band — mproj's
        # own combine_caps translates every polar cap to square 0
        # with y=+pi/2 (its forward for (-70.2,-54.8) inverts to
        # (-19.8,+54.8) too; verified live) and we match it exactly
        "+proj=rhealpix":
            (np.array([-96.5, 12.3, 150.1, 24.8]),
             np.array([38.2, -33.9, 20.4, -41.0])),
        "+proj=rhealpix +north_square=1 +south_square=2":
            (np.array([-96.5, 12.3, 150.1, 24.8]),
             np.array([38.2, -33.9, 20.4, -41.0])),
        "+proj=mil_os": (np.array([20.0, 5.0, 35.0, -10.0]),
                         np.array([18.0, 40.0, 5.0, 30.0])),
        "+proj=lee_os": (np.array([-165.0, -145.0, 175.0]),
                         np.array([-10.0, 10.0, -30.0])),
        "+proj=gs48": (np.array([-96.0, -120.0, -80.0]),
                       np.array([39.0, 48.0, 25.0])),
        "+proj=alsk": (np.array([-152.0, -165.0, -140.0]),
                       np.array([64.0, 60.0, 70.0])),
        "+proj=gs50": (np.array([-120.0, -150.0, -96.0]),
                       np.array([45.0, 62.0, 39.0])),
        "+proj=ob_tran +o_proj=moll +o_lon_p=40 +o_lat_p=50"
        " +lon_0=-100": world,
        "+proj=ob_tran +o_proj=eqc +o_lat_1=10 +o_lon_1=-90"
        " +o_lat_2=30 +o_lon_2=0": world,
    }
    for spec, (lon, lat) in cases.items():
        fwd, inv = resolve_projection(spec)
        assert inv is not None, spec
        x, y = fwd(lon, lat)
        lo, la = inv(x, y)
        assert np.allclose(lo, lon, atol=1e-6), spec
        assert np.allclose(la, lat, atol=1e-6), spec


def test_full_mproj_family_coverage():
    """Every name mproj's pj_list dispatches resolves here, except 3D
    geocent (not a planar projection; the reference CLI cannot -proj
    to it meaningfully either)."""
    from mapshaper_ray.stages.proj import PROJECTIONS
    mproj_list = [
        "aea", "leac", "aeqd", "airy", "wintri", "aitoff", "august",
        "apian", "ortel", "bacon", "boggs", "bonne", "cass", "cea",
        "chamb", "crast", "denoy", "eck1", "eck2", "eck3", "wag6",
        "kav7", "putp1", "eck4", "eck5", "eqc", "eqdc", "etmerc",
        "utm", "gall", "gilbert", "gins8", "gn_sinu", "sinu", "eck6",
        "mbtfps", "gnom", "moll", "wag4", "wag5", "goode", "hammer",
        "hatano", "healpix", "rhealpix", "krovak", "laea", "lonlat",
        "longlat", "latlon", "latlong", "lcc", "loxim", "mbt_fpp",
        "mbt_fpq", "mbt_fps", "merc", "mill", "mil_os", "lee_os",
        "gs48", "alsk", "gs50", "natearth", "natearth2", "nell",
        "nell_h", "nsper", "tpers", "nzmg", "ob_tran", "ocea",
        "omerc", "ortho", "poly", "putp2", "putp3", "putp3p",
        "putp4p", "weren", "putp5", "putp5p", "putp6", "putp6p",
        "qsc", "robin", "euler", "murd1", "murd2", "murd3", "pconic",
        "tissot", "vitk1", "somerc", "stere", "ups", "sterea", "kav5",
        "qua_aut", "fouc", "mbt_s", "tcea", "times", "tmerc", "tpeqd",
        "urm5", "urmfps", "wag1", "vandg", "vandg2", "vandg3",
        "vandg4", "wag2", "wag3", "wag7", "wink1", "wink2",
    ]
    special = {"utm", "etmerc", "ups", "ob_tran"}  # resolve-time
    missing = [n for n in mproj_list
               if n not in PROJECTIONS and n not in special]
    assert missing == [], missing


def test_geocent_known_values_and_roundtrip():
    """geocent (the last pj_list name): axis points hit exact
    ellipsoid constants; Bowring inverse round-trips to sub-mm."""
    import numpy as np

    from mapshaper_ray.stages.proj import geocent_fwd, geocent_inv

    a, f = 6378137.0, 1.0 / 298.257223563
    b = a * (1.0 - f)
    x, y, z = geocent_fwd(np.array([0.0, 90.0, 0.0]),
                          np.array([0.0, 0.0, 90.0]))
    assert abs(x[0] - a) < 1e-6 and abs(y[0]) < 1e-6 and abs(z[0]) < 1e-6
    assert abs(x[1]) < 1e-6 and abs(y[1] - a) < 1e-6
    assert abs(z[2] - b) < 1e-6 and abs(x[2]) < 1e-3

    rng = np.random.default_rng(5)
    lon = rng.uniform(-180, 180, 500)
    lat = rng.uniform(-89.9, 89.9, 500)
    h = rng.uniform(-1000, 9000, 500)
    x, y, z = geocent_fwd(lon, lat, h)
    lon2, lat2, h2 = geocent_inv(x, y, z)
    assert np.max(np.abs(lon2 - lon)) < 1e-9
    assert np.max(np.abs(lat2 - lat)) < 1e-9
    assert np.max(np.abs(h2 - h)) < 1e-3


def test_geocent_points_stage(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from mapshaper_ray.stages.proj import geocent_fwd, geocent_points

    df = pd.DataFrame({"doc_id": np.arange(10, dtype=np.int64),
                       "lon": np.linspace(-170, 170, 10),
                       "lat": np.linspace(-80, 80, 10)})
    out = geocent_points(rd.from_pandas(df).repartition(3)) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    ex, ey, ez = geocent_fwd(df["lon"].to_numpy(), df["lat"].to_numpy())
    assert np.allclose(out["x"], ex, rtol=0, atol=1e-9)
    assert np.allclose(out["y"], ey, rtol=0, atol=1e-9)
    assert np.allclose(out["z"], ez, rtol=0, atol=1e-9)
