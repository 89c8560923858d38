"""JS-expression compatibility layer: reference-syntax -each/-filter
strings run unchanged (row-wise), the Python DSL stays vectorized."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from mapshaper_ray.ops.jsexpr import (compile_js_expression, js_to_py,
                                      looks_js)
from mapshaper_ray.ops.relational import (compile_expression, each_expr,
                                          filter_expr)


def _df():
    return pd.DataFrame({
        "name": ["alpha", "Beta", "gamma"],
        "pop": [120, 80, 3000],
        "fips": ["41", "53", "06"],
        "feature_id": [0, 1, 2],
    })


def test_looks_js_detection():
    assert looks_js("a === 1")
    assert looks_js("x ? 1 : 2")
    assert looks_js("name.toUpperCase()")
    assert looks_js("this.properties.pop")
    assert looks_js("$.partCount > 1")
    assert not looks_js("pop * 2 + 1")
    assert not looks_js("where(pop > 100, 'big', 'small')")


def test_js_to_py_ternary_nesting():
    from mapshaper_ray.ops.jsexpr import JSString
    env = {"JSS": JSString}

    def ev(src):
        return eval(js_to_py(src), env)
    assert ev("1 ? 2 : 3") == 2
    # right-associative chain
    assert ev("0 ? 1 : 0 ? 2 : 3") == 3
    # nested in the then-branch, parenthesized
    assert ev("(1 ? 2 : 3) ? 4 : 5") == 4
    # ':' inside a string is untouched
    assert ev("1 ? 'a:b' : 'c'") == "a:b"


def test_js_operators_and_literals():
    fn = compile_js_expression(
        "pop > 100 && name.indexOf('a') > -1 ? 'big-a' : 'other'")
    out = fn(_df())
    assert list(out) == ["big-a", "other", "big-a"]
    fn = compile_js_expression("fips === '41' || pop === 3000")
    assert list(fn(_df())) == [True, False, True]
    fn = compile_js_expression("!name.startsWith('B')")
    assert list(fn(_df())) == [True, False, True]
    fn = compile_js_expression("name === null ? 'x' : name")
    assert list(fn(_df())) == ["alpha", "Beta", "gamma"]


def test_js_string_methods_and_coercion():
    fn = compile_js_expression("name.toUpperCase()")
    assert list(fn(_df())) == ["ALPHA", "BETA", "GAMMA"]
    fn = compile_js_expression("name.charAt(0) + pop")  # JS + coerces
    assert list(fn(_df())) == ["a120", "B80", "g3000"]
    fn = compile_js_expression("name.substr(1, 2).toUpperCase()")
    assert list(fn(_df())) == ["LP", "ET", "AM"]
    fn = compile_js_expression("name.length + 1")
    assert list(fn(_df())) == [6, 5, 6]
    fn = compile_js_expression("name.split('a').length")
    assert list(fn(_df())) == [3, 2, 3]
    fn = compile_js_expression("name.split('a').join('-')")
    assert list(fn(_df())) == ["-lph-", "Bet-", "g-mm-"]


def test_js_math_and_casts():
    fn = compile_js_expression("Math.round(pop / 1000)")
    assert list(fn(_df())) == [0, 0, 3]
    fn = compile_js_expression("Math.max(pop, 100)")
    assert list(fn(_df())) == [120, 100, 3000]
    fn = compile_js_expression("Number(fips) * 2")
    assert list(fn(_df())) == [82, 106, 12]
    fn = compile_js_expression("String(pop) + '!'")
    assert list(fn(_df())) == ["120!", "80!", "3000!"]
    fn = compile_js_expression("parseInt(fips) + 1")
    assert list(fn(_df())) == [42, 54, 7]


def test_js_proxies():
    fn = compile_js_expression("d.pop * 2")
    assert list(fn(_df())) == [240, 160, 6000]
    fn = compile_js_expression("this.properties.name.toLowerCase()")
    assert list(fn(_df())) == ["alpha", "beta", "gamma"]
    fn = compile_js_expression("this.id + 1")
    assert list(fn(_df())) == [1, 2, 3]
    fn = compile_js_expression("d.missing === null ? -1 : d.missing")
    assert list(fn(_df())) == [-1, -1, -1]


def test_compile_expression_routes_js(ray_session):
    ds = rd.from_pandas(_df())
    out = each_expr(ds, {"BIG": "name.toUpperCase()",
                         "cls": "pop > 100 ? 'big' : 'small'"}) \
        .to_pandas()
    assert list(out["BIG"]) == ["ALPHA", "BETA", "GAMMA"]
    assert list(out["cls"]) == ["big", "small", "big"]
    kept = filter_expr(ds, "fips === '41' || pop > 1000").to_pandas()
    assert sorted(kept["name"]) == ["alpha", "gamma"]
    # the Python DSL still takes the vectorized path (Series in, no
    # row loop): numpy kernels accept the whole column
    fn = compile_expression("where(pop > 100, 1, 0)")
    assert isinstance(fn(_df()), np.ndarray)


def test_js_geo_accessor_via_each(ray_session):
    # $.partCount maps to the engine's part_count metric column
    from mapshaper_ray.api import read_geojson
    import json, tempfile, os
    gj = {"type": "FeatureCollection", "features": [
        {"type": "Feature", "properties": {"id": 1},
         "geometry": {"type": "MultiPolygon", "coordinates": [
             [[[0, 0], [1, 0], [1, 1], [0, 0]]],
             [[[2, 0], [3, 0], [3, 1], [2, 0]]]]}},
        {"type": "Feature", "properties": {"id": 2},
         "geometry": {"type": "Polygon", "coordinates":
                      [[[0, 0], [1, 0], [1, 1], [0, 0]]]}},
    ]}
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "f.json")
        json.dump(gj, open(p, "w"))
        ds = read_geojson(p)
        out = each_expr(ds, {"multi": "$.partCount > 1 ? 'y' : 'n'"}) \
            .to_pandas().sort_values("id")
    assert list(out["multi"]) == ["y", "n"]


def test_js_differential_fuzz_vs_node():
    """Differential test: 300 generated JS expressions evaluate
    identically in live Node and in the translator + row evaluator
    (grammar avoids the documented non-goals: cross-row state, %
    remainder sign, chained comparisons)."""
    import json
    import random
    import shutil
    import subprocess

    if shutil.which("node") is None:
        pytest.skip("node not available")
    rng = random.Random(20260819)
    SCOPE = {"a": 7, "b": 2.5, "s": "Hello world", "t": "abc"}

    def num(d):
        if d <= 0:
            return rng.choice(["a", "b", "3", "10", "2.5", "0"])
        x, y = num(d - 1), num(d - 1)
        return rng.choice([
            f"({x} + {y})", f"({x} - {y})", f"({x} * {y})",
            f"Math.round({x})", f"Math.abs({x})",
            f"Math.max({x}, {y})", f"Math.min({x}, {y})",
            f"{strv(0)}.length", f"{strv(0)}.indexOf('l')",
            f"({boolv(d - 1)} ? {x} : {y})",
        ])

    def strv(d):
        if d <= 0:
            return rng.choice(["s", "t", "'Lo'", "'xyz'", "''"])
        x = strv(d - 1)
        return rng.choice([
            f"{x}.toUpperCase()", f"{x}.toLowerCase()",
            f"{x}.charAt(1)", f"{x}.substr(1, 3)", f"{x}.trim()",
            f"({x} + {num(0)})", f"({x} + {strv(0)})",
            f"({boolv(d - 1)} ? {x} : {strv(0)})",
            f"{x}.split('l').join('-')",
        ])

    def boolv(d):
        if d <= 0:
            return rng.choice(["true", "false", "(a > 3)", "(b <= 2)"])
        return rng.choice([
            f"({num(d - 1)} > {num(d - 1)})",
            f"({num(d - 1)} <= {num(d - 1)})",
            f"({strv(d - 1)} === {strv(d - 1)})",
            f"({strv(d - 1)} !== {strv(d - 1)})",
            f"({boolv(d - 1)} && {boolv(d - 1)})",
            f"({boolv(d - 1)} || {boolv(d - 1)})",
            f"!{boolv(d - 1)}",
            f"{strv(d - 1)}.startsWith('H')",
            f"({strv(d - 1)}.indexOf('o') > -1)",
        ])

    exprs = []
    for _ in range(100):
        exprs.append(num(rng.randint(1, 3)))
        exprs.append(strv(rng.randint(1, 3)))
        exprs.append(boolv(rng.randint(1, 3)))

    script = (
        "const scope = " + json.dumps(SCOPE) + ";\n"
        "const exprs = " + json.dumps(exprs) + ";\n"
        "const out = exprs.map(e => {\n"
        "  try { const f = new Function(...Object.keys(scope),"
        " 'return (' + e + ');');\n"
        "        return f(...Object.values(scope)); }\n"
        "  catch (err) { return {__err: String(err).slice(0, 40)}; }\n"
        "});\n"
        "console.log(JSON.stringify(out));\n")
    node_out = json.loads(subprocess.run(
        ["node", "-e", script], capture_output=True, text=True,
        check=True).stdout)

    df = pd.DataFrame([SCOPE])
    mismatches = []
    for e, expected in zip(exprs, node_out):
        if isinstance(expected, dict):
            continue  # node-side error (shouldn't happen w/ grammar)
        got = compile_js_expression(e)(df).iloc[0]
        got_bool = isinstance(got, (bool, np.bool_))
        exp_bool = isinstance(expected, bool)
        if isinstance(expected, (int, float)) and not exp_bool \
                and isinstance(got, (int, float, np.integer,
                                     np.floating)) and not got_bool:
            ok = got == pytest.approx(expected)
        else:
            ok = got == expected and got_bool == exp_bool
        if not ok:
            mismatches.append((e, expected, got))
    assert not mismatches, mismatches[:5]
