"""Shared coarse bucket-partition helpers.

The repo's standard replacement for per-key ``map_groups`` (one Ray
task per bucket instead of one per key — the tiny-groups overhead was
measured 8x in the minhash band stage): producer stages stamp a
``__part`` column with one of these, the matching ``groupby("__part")``
runs ONE vectorized kernel per bucket.  Producers and consumers must
share the same function, so the hash lives here, once.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

GOLD = np.uint64(0x9E3779B97F4A7C15)
_GOLD2 = np.uint64(0xC2B2AE3D27D4EB4F)


def bucket_part(values, n_parts: int = 64) -> np.ndarray:
    """Integer keys → bucket ids.  A low-bits modulus of key*GOLD is
    fine for ids whose entropy sits in the LOW bits (row numbers,
    doc/user ids)."""
    return (np.asarray(values).astype(np.uint64) * GOLD %
            np.uint64(n_parts)).astype(np.int64)


def float2_bucket_part(x, y, n_parts: int = 64) -> np.ndarray:
    """(x, y) float64 coordinate keys → bucket ids.  Mixes the float
    BIT patterns and keys on the HIGH bits: integer/quantized
    coordinates have zero low-mantissa bits, so a low-bits modulus
    would send every grid vertex to partition 0."""
    with np.errstate(over="ignore"):
        h = (np.asarray(x, np.float64).view(np.uint64) * GOLD) ^ \
            (np.asarray(y, np.float64).view(np.uint64) * _GOLD2)
        h = h * GOLD
    return ((h >> np.uint64(48)).astype(np.int64) % n_parts)


def _spread_bits(x: np.ndarray, k: int, bits: int) -> np.ndarray:
    """Insert k-1 zero bits between the low ``bits`` bits of x
    (generic Morton spread).  k=2/bits<=16 uses the magic-mask
    shifts; other shapes fall back to a per-BIT loop (<= bits vector
    ops, never per-row)."""
    x = x.astype(np.int64)
    if k == 1:
        return x
    if k == 2 and bits <= 16:
        x = (x | (x << 8)) & 0x00FF00FF
        x = (x | (x << 4)) & 0x0F0F0F0F
        x = (x | (x << 2)) & 0x33333333
        x = (x | (x << 1)) & 0x55555555
        return x
    out = np.zeros_like(x)
    for b in range(bits):
        out |= ((x >> b) & 1) << (k * b)
    return out


def zorder_keys(ds, cols, bits: int = 8, n_parts: int | None = None):
    """Z-order (Morton) layout keys over ``cols`` — the
    locality-preserving multi-column sort/partition key lakehouse
    engines use (Delta Z-ORDER) so range filters on ANY keyed column
    prune output files: pass 1 reduces per-column min/max (2k doubles
    to the driver), pass 2 quantizes each column to ``bits`` bits —
    floor((v - mn) / (mx - mn) * (2^bits - 1)), single IEEE ops,
    constant columns quantize to 0 — and interleaves the bit planes
    into ``zkey``.  With ``n_parts``, adds an equal-width range
    bucket ``part`` = zkey * n_parts >> (k*bits) for resumable
    partitioned writes.  Stateless pass 2; nothing shuffles.
    """
    cols = list(cols)
    k = len(cols)
    if k * bits > 62:
        raise ValueError("zorder_keys: k*bits must fit in int64")

    def mm_partial(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"k": np.empty(0, np.int64),
                                 "mn": np.empty(0),
                                 "mx": np.empty(0)})
        vals = [df[c].to_numpy(np.float64) for c in cols]
        return pd.DataFrame({"k": np.arange(k),
                             "mn": [v.min() for v in vals],
                             "mx": [v.max() for v in vals]})

    mm = ds.map_batches(mm_partial, batch_format="pandas") \
        .to_pandas().groupby("k").agg(mn=("mn", "min"),
                                      mx=("mx", "max"))
    mn = mm["mn"].to_numpy(np.float64)
    mx = mm["mx"].to_numpy(np.float64)
    top = np.int64((1 << bits) - 1)

    def stamp(df: pd.DataFrame) -> pd.DataFrame:
        z = np.zeros(len(df), dtype=np.int64)
        for i, c in enumerate(cols):
            v = df[c].to_numpy(np.float64)
            if mx[i] > mn[i]:
                q = np.floor((v - mn[i]) / (mx[i] - mn[i])
                             * float(top)).astype(np.int64)
            else:
                q = np.zeros(len(df), dtype=np.int64)
            z |= _spread_bits(q, k, bits) << i
        df = df.assign(zkey=z)
        if n_parts is not None:
            df["part"] = (z * np.int64(n_parts)) >> (k * bits)
        return df

    return ds.map_batches(stamp, batch_format="pandas")
