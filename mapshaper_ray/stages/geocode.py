"""Deterministic geocode stage (actor pool).

The north star mandates "each page geocoded from its extracted text" with
a deterministic, byte-stable per-url output (SURVEY.md §2.3 last row).
The sandbox has no gazetteer/model, so the geocoder derives (lon, lat)
from ``md5(text)``:

    h1 = int(md5(text)[0:4] bytes, big-endian)   # == hex digits 1-8
    h2 = int(md5(text)[4:8] bytes, big-endian)   # == hex digits 9-16
    hot  = h1 % 10 < 2          (20% of pages -> 2 dense "urban" cells)
    hot:  city = h1 % 2; lon = city_lon + (h2%1000)/1000*0.5 - 0.25
                         lat = city_lat + ((h2//1000)%1000)/1000*0.5 - 0.25
    else: lon = (h1 % 3600000)/10000 - 180
          lat = (h2 % 1600000)/10000 - 80

Pure integer arithmetic on the md5 words → the exact same values are
computable in ANSI SQL (DuckDB: ('0x'||substr(md5(text),1,8))::BIGINT),
which is how the driver's correctness oracle validates the whole
spatial-join chain end-to-end.

Deployed as a callable CLASS via ``map_batches(Geocoder, concurrency=N)``
— the actor-pool pattern for stateful stages; a real model/gazetteer
would load in ``__init__``.  A model-backed path is stubbed behind
NotImplementedError.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

HOT_PCT_MOD = 10
HOT_PCT_LT = 2
CITIES = ((-62.5, 27.5), (149.5, 30.5))  # two dense "urban" hot cells
# (chosen inside region diamonds so the skew shows up in join output too)


def md5_words(texts) -> tuple[np.ndarray, np.ndarray]:
    """First two big-endian uint32 words of md5 per text.

    hashlib releases the GIL per call and runs at C speed; at true
    100TB scale this whole stage is the geocode model forward pass, so
    the per-row digest here is the deterministic stand-in, not a hot
    Python loop to optimize away."""
    n = len(texts)
    h1 = np.empty(n, dtype=np.int64)
    h2 = np.empty(n, dtype=np.int64)
    for i, t in enumerate(texts):
        d = hashlib.md5(t.encode() if isinstance(t, str) else t).digest()
        h1[i] = int.from_bytes(d[:4], "big")
        h2[i] = int.from_bytes(d[4:8], "big")
    return h1, h2


def md5_words_arrow(arr) -> tuple[np.ndarray, np.ndarray]:
    """md5_words over an Arrow string/binary array by slicing the flat
    DATA BUFFER with the offsets — no per-row Python string
    materialization (utf-8 string values' buffer bytes ARE the encoded
    text, so digests match the str path exactly)."""
    import pyarrow as pa
    if isinstance(arr, pa.ChunkedArray):
        parts = [md5_words_arrow(c) for c in arr.chunks]
        if not parts:
            return (np.empty(0, np.int64), np.empty(0, np.int64))
        return (np.concatenate([p[0] for p in parts]),
                np.concatenate([p[1] for p in parts]))
    t = arr.type
    if not (pa.types.is_string(t) or pa.types.is_binary(t) or
            pa.types.is_large_string(t) or pa.types.is_large_binary(t)) \
            or arr.null_count:
        return md5_words(arr.to_pylist())
    bufs = arr.buffers()
    odt = np.int64 if (pa.types.is_large_string(t) or
                       pa.types.is_large_binary(t)) else np.int32
    offsets = np.frombuffer(bufs[1], dtype=odt,
                            count=len(arr) + 1 + arr.offset)[arr.offset:]
    data = memoryview(bufs[2])
    n = len(arr)
    h1 = np.empty(n, dtype=np.int64)
    h2 = np.empty(n, dtype=np.int64)
    md5 = hashlib.md5
    offs = offsets.tolist()  # python ints: numpy-scalar slicing is slower
    prev = offs[0]
    from_bytes = int.from_bytes
    for i in range(n):
        nxt = offs[i + 1]
        d = md5(data[prev:nxt]).digest()
        prev = nxt
        h1[i] = from_bytes(d[:4], "big")
        h2[i] = from_bytes(d[4:8], "big")
    return h1, h2


def geocode_arrays(h1: np.ndarray, h2: np.ndarray):
    hot = (h1 % HOT_PCT_MOD) < HOT_PCT_LT
    city = h1 % 2
    city_lon = np.where(city == 0, CITIES[0][0], CITIES[1][0])
    city_lat = np.where(city == 0, CITIES[0][1], CITIES[1][1])
    hot_lon = city_lon + (h2 % 1000) / 1000.0 * 0.5 - 0.25
    hot_lat = city_lat + ((h2 // 1000) % 1000) / 1000.0 * 0.5 - 0.25
    cold_lon = (h1 % 3600000) / 10000.0 - 180.0
    cold_lat = (h2 % 1600000) / 10000.0 - 80.0
    lon = np.where(hot, hot_lon, cold_lon)
    lat = np.where(hot, hot_lat, cold_lat)
    return lon, lat


class Geocoder:
    """Actor-pool geocode stage: hash-based by default; ``model=`` path
    reserved for a real geocoder loaded once per actor."""

    def __init__(self, model: str | None = None):
        if model is not None:
            raise NotImplementedError(
                "model-backed geocoding needs an external gazetteer; "
                "the deterministic md5 geocoder is the sandbox path")
        self.model = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        h1, h2 = md5_words_arrow(batch["text"])
        lon, lat = geocode_arrays(h1, h2)
        batch = batch.append_column("lon", pa.array(lon, type=pa.float64()))
        batch = batch.append_column("lat", pa.array(lat, type=pa.float64()))
        return batch


def geocode(pages, concurrency=None, batch_size=None):
    # batch_size=None = whole-block batches: an explicit batch_size sets
    # the fused operator's min-rows-per-task bundling, which collapses a
    # many-small-blocks input into ONE task (measured; see SKILL.md)
    """Default: stateless task pool (the md5 geocoder has no per-actor
    state; task workers are reused from Ray's warm pool, so parallelism
    scales without paying actor-process spawn + import per run).  Pass
    ``concurrency`` to run as an actor pool — the shape a model-backed
    geocoder (state loaded in __init__) requires."""
    if concurrency is None:
        return pages.map_batches(Geocoder(), batch_format="pyarrow",
                                 batch_size=batch_size)
    return pages.map_batches(Geocoder, batch_format="pyarrow",
                             batch_size=batch_size, concurrency=concurrency,
                             num_cpus=1)
