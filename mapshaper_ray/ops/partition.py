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
