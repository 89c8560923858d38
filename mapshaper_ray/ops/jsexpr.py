"""JS-expression compatibility layer for -each / -filter / -calc.

The expression engine's primary surface is the vectorized Python DSL
(`relational.compile_expression`: bare column names are pandas Series,
numpy kernels preloaded).  The reference, however, accepts JavaScript
(src/expressions/mapshaper-expressions.js compiles user strings as JS
function bodies), so reference users paste expressions like

    STATE_NAME.toUpperCase()
    FIPS === '41' ? 'west' : 'east'
    d.pop > 100 && $.partCount > 1

This module makes those run unchanged: when a string is not valid
Python (or carries unambiguous JS markers), it is source-translated to
a row-context Python expression and evaluated ROW-WISE with JS-ish
value semantics (string/array method names, `Math`, `d` / `this` /
`$` proxies, `+` string coercion).

This is the COMPATIBILITY path, not the fast path: a Python loop per
row.  Pipelines at scale should use the vectorized DSL; the translator
exists so every reference expression that does not mutate cross-row
state still produces identical output (cross-row-stateful JS like
``counts[type] = counts[type] + 1`` is documented-unsupported — it is
single-threaded by construction in the reference and cannot
distribute).
"""

from __future__ import annotations

import ast
import math
import re

import numpy as np
import pandas as pd

# accessor spellings: reference feature-proxy name -> engine column
# (src/data/mapshaper-feature-proxy.js; the engine materializes the
# right-hand names via relational._with_geo_columns)
JS_ACCESSOR_MAP = {
    "partCount": "part_count",
    "vertexCount": "vertex_count",
    "centroidX": "cx",
    "centroidY": "cy",
    "originalArea": "area",
    "area": "area", "perimeter": "perimeter", "bounds": "bounds",
    "width": "width", "height": "height", "innerX": "innerX",
    "innerY": "innerY", "isNull": "isNull", "x": "x", "y": "y",
    "cx": "cx", "cy": "cy",
}

_JS_MARKERS = re.compile(
    r"===|!==|&&|\|\||\bthis\.|\$\.|\bnull\b|\bundefined\b"
    r"|\.toUpperCase\b|\.toLowerCase\b|\.indexOf\b|\.charAt\b"
    r"|\.toFixed\b|\bMath\.")


def looks_js(expr: str) -> bool:
    if _JS_MARKERS.search(expr):
        return True
    try:
        compile(expr, "<expr>", "eval")
        return False
    except SyntaxError:
        return True


# --- source translation ----------------------------------------------------

def _split_strings(src: str):
    """Tokenize into (is_string, text) chunks so rewrites never touch
    string literals."""
    out = []
    i, n = 0, len(src)
    while i < n:
        c = src[i]
        if c in "'\"":
            j = i + 1
            while j < n:
                if src[j] == "\\":
                    j += 2
                    continue
                if src[j] == c:
                    j += 1
                    break
                j += 1
            out.append((True, src[i:j]))
            i = j
        else:
            j = i
            while j < n and src[j] not in "'\"":
                j += 1
            out.append((False, src[i:j]))
            i = j
    return out


def _rewrite_tokens(code: str) -> str:
    """Operator / literal rewrites on non-string chunks."""
    parts = []
    for is_str, t in _split_strings(code):
        if is_str:
            # string literals get JS method/property spellings too:
            # 'Lo'.indexOf('l'), 'a,b'.split(',').length
            parts.append(f"JSS({t})")
            continue
        t = t.replace("===", "==").replace("!==", "!=")
        t = t.replace("&&", " and ").replace("||", " or ")
        # JS not: '!' not followed by '=' (and not '!=')
        t = re.sub(r"!(?!=)", " not ", t)
        t = re.sub(r"\bnull\b", "None", t)
        t = re.sub(r"\bundefined\b", "None", t)
        t = re.sub(r"\btrue\b", "True", t)
        t = re.sub(r"\bfalse\b", "False", t)
        # $.foo -> _dollar_.foo  (valid Python name for the proxy)
        t = t.replace("$.", "_dollar_.")
        parts.append(t)
    return "".join(parts)


def _find_top(code: str, ch: str, start: int = 0) -> int:
    """Index of the first top-level (outside parens/brackets/strings)
    occurrence of ``ch`` at/after start; -1 if none."""
    depth = 0
    i, n = start, len(code)
    while i < n:
        c = code[i]
        if c in "'\"":
            j = i + 1
            while j < n:
                if code[j] == "\\":
                    j += 2
                    continue
                if code[j] == c:
                    break
                j += 1
            i = j
        elif c in "([{":
            depth += 1
        elif c in ")]}":
            depth -= 1
        elif depth == 0 and c == ch:
            return i
        i += 1
    return -1


def _descend_groups(code: str) -> str:
    """Apply _rewrite_ternary inside every top-level bracket group."""
    out = []
    i, n = 0, len(code)
    while i < n:
        c = code[i]
        if c in "'\"":
            j = i + 1
            while j < n:
                if code[j] == "\\":
                    j += 2
                    continue
                if code[j] == c:
                    j += 1
                    break
                j += 1
            out.append(code[i:j])
            i = j
        elif c in "([{":
            close = {"(": ")", "[": "]", "{": "}"}[c]
            depth, j = 1, i + 1
            while j < n and depth:
                cj = code[j]
                if cj in "'\"":
                    k = j + 1
                    while k < n:
                        if code[k] == "\\":
                            k += 2
                            continue
                        if code[k] == cj:
                            break
                        k += 1
                    j = k
                elif cj in "([{":
                    depth += 1
                elif cj in ")]}":
                    depth -= 1
                j += 1
            out.append(c + _rewrite_ternary(code[i + 1:j - 1]) + close)
            i = j
        else:
            out.append(c)
            i += 1
    return "".join(out)


def _rewrite_ternary(code: str) -> str:
    """JS ``c ? a : b`` (right-associative) -> ``(a) if (c) else (b)``,
    recursively, respecting nesting and strings."""
    q = _find_top(code, "?")
    if q < 0:
        return _descend_groups(code)
    cond = code[:q]
    # matching ':' — skip over nested ternaries inside the then-branch
    rest = code[q + 1:]
    depth_t = 0
    i, n = 0, len(rest)
    colon = -1
    while i < n:
        c = rest[i]
        if c in "'\"":
            j = i + 1
            while j < n:
                if rest[j] == "\\":
                    j += 2
                    continue
                if rest[j] == c:
                    break
                j += 1
            i = j
        elif c in "([{":
            # skip bracketed region entirely
            d2, j = 1, i + 1
            while j < n and d2:
                if rest[j] in "([{":
                    d2 += 1
                elif rest[j] in ")]}":
                    d2 -= 1
                elif rest[j] in "'\"":
                    qc, k = rest[j], j + 1
                    while k < n:
                        if rest[k] == "\\":
                            k += 2
                            continue
                        if rest[k] == qc:
                            break
                        k += 1
                    j = k
                j += 1
            i = j - 1
        elif c == "?":
            depth_t += 1
        elif c == ":":
            if depth_t == 0:
                colon = i
                break
            depth_t -= 1
        i += 1
    if colon < 0:
        raise SyntaxError(f"unmatched ternary '?' in {code!r}")
    then = rest[:colon]
    other = rest[colon + 1:]
    return (f"(({_rewrite_ternary(then)}) if ({_rewrite_ternary(cond)})"
            f" else ({_rewrite_ternary(other)}))")


def js_to_py(expr: str) -> str:
    return _rewrite_ternary(_rewrite_tokens(expr)).strip()


# --- JS-ish runtime values ---------------------------------------------------

def _js_num_str(v) -> str:
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float) and v.is_integer() and abs(v) < 1e16:
        return str(int(v))
    return str(v)


class JSString(str):
    """str with the JS method/property spellings used in reference
    expressions (toUpperCase, indexOf, length, ...) and JS `+`
    coercion against numbers."""

    @property
    def length(self):
        return len(self)

    def toUpperCase(self):
        return JSString(self.upper())

    def toLowerCase(self):
        return JSString(self.lower())

    def indexOf(self, sub, start=0):
        return self.find(str(sub), int(start))

    def lastIndexOf(self, sub):
        return self.rfind(str(sub))

    def includes(self, sub):
        return str(sub) in self

    def startsWith(self, sub):
        return self.startswith(str(sub))

    def endsWith(self, sub):
        return self.endswith(str(sub))

    def charAt(self, i):
        i = int(i)
        return JSString(self[i] if 0 <= i < len(self) else "")

    def charCodeAt(self, i):
        return ord(self[int(i)])

    def substr(self, start, length=None):
        start = int(start)
        if start < 0:
            start = max(len(self) + start, 0)
        end = len(self) if length is None else start + int(length)
        return JSString(self[start:end])

    def substring(self, a, b=None):
        a = max(int(a), 0)
        b = len(self) if b is None else max(int(b), 0)
        if a > b:
            a, b = b, a
        return JSString(self[a:b])

    def slice(self, a=0, b=None):
        return JSString(self[int(a): None if b is None else int(b)])

    def trim(self):
        return JSString(str.strip(self))

    def split(self, sep=None, maxsplit=-1):
        return JSArray(JSString(p)
                       for p in str.split(self, sep, maxsplit))

    def replace(self, a, b):
        # JS String.replace replaces the FIRST occurrence
        return JSString(str.replace(self, str(a), str(b), 1))

    def replaceAll(self, a, b):
        return JSString(str.replace(self, str(a), str(b)))

    def concat(self, *others):
        return JSString(self + "".join(str(o) for o in others))

    def repeat(self, n):
        return JSString(str(self) * int(n))

    def padStart(self, n, fill=" "):
        return JSString(self.rjust(int(n), str(fill)[:1] or " "))

    def padEnd(self, n, fill=" "):
        return JSString(self.ljust(int(n), str(fill)[:1] or " "))

    def __add__(self, other):
        if isinstance(other, str):
            return JSString(str.__add__(self, other))
        return JSString(str(self) + _js_num_str(other))

    def __radd__(self, other):
        if isinstance(other, str):
            return JSString(other + str(self))
        return JSString(_js_num_str(other) + str(self))


class JSArray(list):
    @property
    def length(self):
        return len(self)

    def indexOf(self, v):
        try:
            return self.index(v)
        except ValueError:
            return -1

    def includes(self, v):
        return v in self

    def join(self, sep=","):
        return JSString(str(sep).join(
            "" if v is None else _js_num_str(v) if not isinstance(v, str)
            else str(v) for v in self))

    def slice(self, a=0, b=None):
        return JSArray(list.__getitem__(
            self, builtins_slice(int(a), None if b is None else int(b))))

    def concat(self, other):
        return JSArray(list(self) + list(other))


builtins_slice = slice


def jswrap(v):
    if isinstance(v, JSString) or isinstance(v, JSArray):
        return v
    if isinstance(v, str):
        return JSString(v)
    if isinstance(v, (list, tuple)):
        return JSArray(jswrap(x) for x in v)
    if isinstance(v, np.ndarray):
        return JSArray(jswrap(x) for x in v.tolist())
    if isinstance(v, np.generic):
        return v.item()
    return v


class _MathShim:
    PI = math.pi
    E = math.e

    @staticmethod
    def abs(x):
        return abs(x)

    @staticmethod
    def sqrt(x):
        return math.sqrt(x)

    @staticmethod
    def floor(x):
        return math.floor(x)

    @staticmethod
    def ceil(x):
        return math.ceil(x)

    @staticmethod
    def round(x):
        # JS Math.round: half-up toward +Infinity
        return math.floor(x + 0.5)

    @staticmethod
    def pow(a, b):
        return a ** b

    @staticmethod
    def max(*xs):
        return max(xs)

    @staticmethod
    def min(*xs):
        return min(xs)

    @staticmethod
    def log(x):
        return math.log(x)

    @staticmethod
    def log2(x):
        return math.log2(x)

    @staticmethod
    def log10(x):
        return math.log10(x)

    @staticmethod
    def exp(x):
        return math.exp(x)

    @staticmethod
    def sin(x):
        return math.sin(x)

    @staticmethod
    def cos(x):
        return math.cos(x)

    @staticmethod
    def tan(x):
        return math.tan(x)

    @staticmethod
    def atan2(y, x):
        return math.atan2(y, x)

    @staticmethod
    def hypot(*xs):
        return math.hypot(*xs)

    @staticmethod
    def sign(x):
        return (x > 0) - (x < 0)

    @staticmethod
    def trunc(x):
        return math.trunc(x)


def _js_number(x):
    if x is None:
        return 0
    if isinstance(x, bool):
        return int(x)
    if isinstance(x, str):
        try:
            f = float(x.strip() or 0)
        except ValueError:
            return float("nan")
        return int(f) if f.is_integer() else f
    return x


class _RowProxy:
    """Attribute access over the current row (the reference's ``d`` /
    ``this.properties``).  Missing names read as None (~undefined)."""

    __slots__ = ("_row",)

    def __init__(self, row):
        self._row = row

    def __getattr__(self, name):
        if name.startswith("_"):
            raise AttributeError(name)
        return jswrap(self._row.get(name))

    def __getitem__(self, name):
        return jswrap(self._row.get(name))

    def __contains__(self, name):
        return name in self._row


class _GeoProxy(_RowProxy):
    """``$.`` accessor proxy: maps reference camelCase accessor names
    onto the engine's materialized metric columns."""

    def __getattr__(self, name):
        col = JS_ACCESSOR_MAP.get(name, name)
        return jswrap(self._row.get(col))


class _ThisProxy:
    __slots__ = ("_row",)

    def __init__(self, row):
        self._row = row

    @property
    def properties(self):
        return _RowProxy(self._row)

    @property
    def id(self):
        return jswrap(self._row.get("feature_id"))

    @property
    def geojson(self):  # pragma: no cover - documented unsupported
        raise NotImplementedError(
            "this.geojson is not available in expressions; use the "
            "geometry commands instead")


_JS_GLOBALS = {
    "JSS": JSString,
    "Math": _MathShim,
    "String": lambda x="": JSString(_js_num_str(x)
                                    if not isinstance(x, str) else x),
    "Number": _js_number,
    "Boolean": bool,
    "parseInt": lambda s, base=10: int(str(s).strip() or "0", base),
    "parseFloat": lambda s: float(str(s).strip() or "nan"),
    "isNaN": lambda x: (isinstance(_js_number(x), float)
                        and math.isnan(_js_number(x))),
    "NaN": float("nan"),
    "Infinity": float("inf"),
}


def js_accessor_names(expr: str) -> set[str]:
    """Engine accessor COLUMN names referenced by a JS expression via
    ``$.<name>`` (after camelCase mapping) — used by the engine to
    materialize geometry metrics before evaluation."""
    try:
        tree = ast.parse(js_to_py(expr), mode="eval")
    except SyntaxError:
        return set()
    names = set()
    for node in ast.walk(tree):
        if (isinstance(node, ast.Attribute)
                and isinstance(node.value, ast.Name)
                and node.value.id == "_dollar_"):
            names.add(JS_ACCESSOR_MAP.get(node.attr, node.attr))
    return names


def compile_js_expression(expr: str, defs: dict | None = None):
    """JS expression string -> row-wise evaluator over a pandas
    DataFrame (returns a list-like of per-row values).  The
    compatibility path for reference-syntax expressions; the
    vectorized Python DSL remains the hot path."""
    code = compile(js_to_py(expr), "<js-expr>", "eval")
    base = dict(_JS_GLOBALS)
    if defs:
        base.update(defs)

    def run(df: pd.DataFrame):
        cols = list(df.columns)
        out = []
        for row in df.to_dict("records"):
            env = {c: jswrap(row[c]) for c in cols}
            env["d"] = _RowProxy(row)
            env["this"] = _ThisProxy(row)
            env["_dollar_"] = _GeoProxy(row)
            out.append(eval(code, dict(base), env))
        return pd.Series(out, index=df.index) if len(out) else \
            pd.Series([], dtype=object)
    return run
