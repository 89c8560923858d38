"""ECMA-262 Number-to-String (7.1.12.1) in Python.

The reference serializes attribute values through JavaScript's
ToString (d3-dsv CSV cells, JSON.stringify) — reproducing it exactly
is what makes CSV/JSON exports byte-comparable.  Python's repr()
produces the same shortest round-trip digits as V8; only the
FORMATTING rules differ (when to use exponential notation, '.0'
suffixes, exponent zero-padding), so this converts repr() output to
the ECMA layout.
"""

from __future__ import annotations


def js_json(o) -> str:
    """JSON.stringify(obj) (no indent): identical bytes for the value
    types mapshaper serializes — numbers via js_number_str, NaN/inf ->
    null, insertion-ordered objects, utf-8 strings kept raw."""
    import json as _json

    import numpy as np
    if o is None:
        return "null"
    if o is True:
        return "true"
    if o is False:
        return "false"
    if isinstance(o, (bool, np.bool_)):
        return "true" if o else "false"
    if isinstance(o, (int, np.integer)):
        return str(int(o))
    if isinstance(o, (float, np.floating)):
        f = float(o)
        if f != f or f in (float("inf"), float("-inf")):
            return "null"  # JSON.stringify(NaN/Infinity) -> null
        return js_number_str(f)
    if isinstance(o, str):
        return _json.dumps(o, ensure_ascii=False)
    if isinstance(o, (list, tuple)):
        return "[" + ",".join(js_json(v) for v in o) + "]"
    if isinstance(o, np.ndarray):
        return js_json(o.tolist())
    if isinstance(o, dict):
        return "{" + ",".join(
            _json.dumps(str(k), ensure_ascii=False) + ":" + js_json(v)
            for k, v in o.items()) + "}"
    return _json.dumps(o, ensure_ascii=False)


def js_number_str(v) -> str:
    f = float(v)
    if f != f:
        return "NaN"
    if f == float("inf"):
        return "Infinity"
    if f == float("-inf"):
        return "-Infinity"
    if f == 0.0:
        return "0"
    r = repr(f)
    if "e" not in r and "E" not in r:
        return r[:-2] if r.endswith(".0") else r
    mant, exp = r.lower().split("e")
    e = int(exp)
    neg = mant.startswith("-")
    if neg:
        mant = mant[1:]
    digits = mant.replace(".", "").rstrip("0") or "0"
    k = len(digits)
    n = e + 1  # value = 0.digits x 10^n (ECMA notation)
    if k <= n <= 21:
        s = digits + "0" * (n - k)
    elif 0 < n <= 21:
        s = digits[:n] + "." + digits[n:]
    elif -6 < n <= 0:
        s = "0." + "0" * (-n) + digits
    else:
        s = digits[0] + ("." + digits[1:] if k > 1 else "") + "e" + \
            ("+" if n - 1 >= 0 else "-") + str(abs(n - 1))
    return ("-" if neg else "") + s


def js_json_pretty(o, level=1) -> str:
    """JSON.stringify(obj, replace, '  ') as the reference's -o
    prettify uses it (getFormattedStringify,
    src/geojson/mapshaper-stringify.js): 2-space indent, except
    'coordinates'/'bbox' arrays collapse to one line with ', '
    separators."""
    ind = "  " * level
    prev = "  " * (level - 1)
    if isinstance(o, dict):
        if not o:
            return "{}"
        items = []
        for k, v in o.items():
            if k in ("coordinates", "bbox") and isinstance(v, list):
                vs = _inline_array(v)
            else:
                vs = js_json_pretty(v, level + 1)
            items.append(f'{ind}{js_json(str(k))}: {vs}')
        return "{\n" + ",\n".join(items) + "\n" + prev + "}"
    if isinstance(o, (list, tuple)):
        if not o:
            return "[]"
        items = [f"{ind}{js_json_pretty(v, level + 1)}" for v in o]
        return "[\n" + ",\n".join(items) + "\n" + prev + "]"
    return js_json(o)


def _inline_array(v) -> str:
    if isinstance(v, (list, tuple)):
        return "[" + ", ".join(_inline_array(x) for x in v) + "]"
    return js_json(v)
