"""-colorizer / -svg-style: value→color classifier functions usable in
expressions (SURVEY.md §2.2 -colorizer row; reference
src/commands/mapshaper-colorizer.js:3-60).

``make_colorizer`` returns a vectorized callable registered into the
expression environment (the reference injects it into the `defs` state,
src/commands/mapshaper-include.js pattern); ``svg_style`` assigns
presentation columns (stroke/fill/...) from literals or expressions.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def make_colorizer(colors, breaks=None, categories=None, other=None,
                   nodata="white"):
    """Sequential (breaks) or categorical (categories) value→color
    mapper.  len(colors) must be len(breaks)+1 or len(categories)."""
    colors = list(colors)
    if breaks is not None:
        if len(colors) != len(breaks) + 1:
            raise ValueError("need len(colors) == len(breaks) + 1")
        br = np.asarray(breaks, dtype=np.float64)

        def fn(v):
            v = np.asarray(v, dtype=np.float64)
            idx = np.searchsorted(br, v, side="right")
            out = np.asarray(colors, dtype=object)[idx]
            out = np.where(np.isnan(v), nodata, out)
            return out
        return fn
    if categories is not None:
        if len(colors) != len(categories):
            raise ValueError("need len(colors) == len(categories)")
        table = dict(zip(categories, colors))
        fallback = other or nodata

        def fn(v):
            return np.array([table.get(x, fallback) if x is not None
                             else nodata for x in np.asarray(v, object)],
                            dtype=object)
        return fn
    raise ValueError("need breaks= or categories=")


def colorize(ds, out_col: str, value_col: str, **kw):
    """Apply a colorizer to a column (the -each 'col = name(value)'
    usage, precompiled)."""
    fn = make_colorizer(**kw)

    def go(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df[out_col] = fn(df[value_col])
        return df
    return ds.map_batches(go, batch_format="pandas")


def svg_style(ds, **styles):
    """-svg-style: assign stroke/fill/opacity/r/class columns from
    literals or single-column references."""
    def go(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        for k, v in styles.items():
            df[k] = df[v] if isinstance(v, str) and v in df.columns else v
        return df
    return ds.map_batches(go, batch_format="pandas")
