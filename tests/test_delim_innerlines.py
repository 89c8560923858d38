"""CSV typing + innerlines classification tests."""

import numpy as np
import pandas as pd

from mapshaper_ray.sources.delim import (adjust_record_types, read_delim,
                                         sniff_delimiter, write_delim)


def test_sniff():
    assert sniff_delimiter("a,b,c") == ","
    assert sniff_delimiter("a\tb\tc") == "\t"
    assert sniff_delimiter("a;b;c") == ";"


def test_adjust_types():
    df = pd.DataFrame({"n": ["1", "2", "3"], "m": ["1", "x", "3"],
                       "s": ["01", "02", "003"], "e": ["1.5", "", "2"]})
    out = adjust_record_types(df, string_fields=["s"])
    assert out["n"].dtype.kind in "if"
    assert out["m"].dtype == object          # not all-numeric -> string
    assert out["s"].dtype == object          # hint wins
    assert out["e"].dtype.kind == "f"        # empties -> NaN, still numeric
    assert np.isnan(out["e"][1])


def test_csv_roundtrip(ray_session, tmp_path):
    p = tmp_path / "t.csv"
    p.write_text("name,pop,rate\nalpha,10,0.5\nbeta,20,1.25\n")
    ds = read_delim(str(p))
    df = ds.to_pandas()
    assert df["pop"].dtype.kind in "if"
    out = tmp_path / "o.csv"
    write_delim(ds, str(out))
    back = pd.read_csv(out)
    assert list(back["name"]) == ["alpha", "beta"]
    assert back["rate"].tolist() == [0.5, 1.25]


def test_field_type_hints(ray_session, tmp_path):
    p = tmp_path / "z.csv"
    p.write_text("zip,v\n01234,1\n98765,2\n")
    df = read_delim(str(p), string_fields=["zip"]).to_pandas()
    assert list(df["zip"]) == ["01234", "98765"]  # leading zero preserved


def test_innerlines(ray_session):
    """2x2 mesh with two groups split left/right: one vertical inner
    boundary of 2 edges."""
    import ray.data as rd
    from mapshaper_ray.pipelines.geometry import innerlines_by_key
    rows = []
    for i in range(4):
        r, c = divmod(i, 2)
        x0, y0 = float(c), float(r)
        rows.append({"feature_id": i, "grp": "L" if c == 0 else "R",
                     "x": [x0, x0 + 1, x0 + 1, x0, x0],
                     "y": [y0, y0, y0 + 1, y0 + 1, y0]})
    ds = rd.from_items(rows)
    out = innerlines_by_key(ds, key="grp").to_pandas()
    assert len(out) == 2           # the x=1 edge, rows y 0-1 and 1-2
    assert set(out["pair"]) == {"L-R"}
    full = innerlines_by_key(ds, key="grp", inner_only=False).to_pandas()
    assert (full["kind"] == "outer").sum() == 8   # mesh outline
    assert (full["kind"] == "shared_same").sum() == 2  # horiz. interior
