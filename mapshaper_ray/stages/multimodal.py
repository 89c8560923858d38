"""Multimodal column stages: image / audio / video payloads as opaque
``binary`` columns with typed metadata.

The decode kernels themselves need codec libraries that are NOT in this
container, so each stage's ``_decode_real`` raises NotImplementedError
and the default path uses a deterministic fake decoder (pure function
of the payload bytes) — the Ray-side plumbing is the real deliverable:
schema in/out, actor-pool ``map_batches`` with per-actor setup, small
batch sizes for wide binary rows, and streaming-safe output layout.

Schema conventions
  image:  payload:binary, img_format:string   → height,width,channels +
          feature vector (list<float32>)
  audio:  payload:binary, sample_rate:int32   → n_samples, duration_s +
          frame features
  video:  payload:binary                       → sampled frame table
          (one row per sampled frame, frame_idx column)

Batch sizing: binary payloads dominate block size — callers should keep
``batch_size`` small (default 64 here vs 4096 for text stages) so a
batch × concurrency fits in worker heap (SURVEY.md §4 memory row).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa


def _u32(data: bytes, salt: bytes = b"") -> int:
    """First 4 big-endian bytes of md5(salt_ascii + hex(data[:256])).
    Hashing the HEX of the payload head (not raw bytes) keeps the fake
    decoder reproducible by a DuckDB oracle (md5 there is VARCHAR-only)."""
    s = (salt.decode("ascii") if salt else "") + data[:256].hex()
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:4], "big")


def _fake_features(base: int, n: int) -> np.ndarray:
    """Deterministic pseudo-embedding in [-0.5, 0.5): pure integer
    arithmetic on the decode hash so SQL oracles reproduce each value
    (a PRNG like np.random would not be)."""
    j = np.arange(1, n + 1, dtype=np.int64)
    return ((base * j) % 1000003 / 1000003.0 - 0.5).astype(np.float32)


class ImageDecoder:
    """Actor-pool stage: decode + feature-extract an image column.

    Real path (``backend='pil'``) would load PIL/turbojpeg once per
    actor in ``__init__`` — unavailable here, so it raises.  The fake
    backend derives (h, w, c) and an ``n_features``-dim embedding
    deterministically from the payload bytes, so downstream plumbing
    (ANN over image embeddings, resize planning) is fully testable."""

    def __init__(self, backend: str = "fake", n_features: int = 8,
                 resize_to: tuple[int, int] | None = None):
        if backend != "fake":
            raise NotImplementedError(
                f"image backend {backend!r} needs codec libs not present "
                "in this container; 'fake' is the deterministic stand-in")
        self.n_features = n_features
        self.resize_to = resize_to

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        n = len(payloads)
        h = np.empty(n, np.int32)
        w = np.empty(n, np.int32)
        feats = np.empty((n, self.n_features), np.float32)
        for i, p in enumerate(payloads):
            p = p or b""
            base = _u32(p)
            h[i] = 16 + base % 1024
            w[i] = 16 + (base // 1024) % 1024
            feats[i] = _fake_features(base, self.n_features)
        if self.resize_to:
            h[:] = self.resize_to[0]
            w[:] = self.resize_to[1]
        batch = batch.append_column("height", pa.array(h))
        batch = batch.append_column("width", pa.array(w))
        batch = batch.append_column(
            "channels", pa.array(np.full(n, 3, np.int32)))
        batch = batch.append_column(
            "img_features",
            pa.array(list(feats), type=pa.list_(pa.float32())))
        return batch


class AudioFeaturizer:
    """Actor-pool stage: audio payload → duration + frame features.
    Real backend (soundfile/librosa) unavailable → NotImplementedError;
    fake derives sample count and ``n_mfcc`` frame-mean features."""

    def __init__(self, backend: str = "fake", n_mfcc: int = 4):
        if backend != "fake":
            raise NotImplementedError(
                f"audio backend {backend!r} needs codec libs not present")
        self.n_mfcc = n_mfcc

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        sr = (batch["sample_rate"].to_numpy(zero_copy_only=False)
              if "sample_rate" in batch.column_names
              else np.full(len(payloads), 16000))
        n_samples = np.array([len(p or b"") * 4 for p in payloads],
                             dtype=np.int64)  # fake: 4 samples per byte
        dur = n_samples / np.maximum(sr, 1)
        feats = [_fake_features(_u32(p or b"", b"a"), self.n_mfcc)
                 for p in payloads]
        batch = batch.append_column("n_samples", pa.array(n_samples))
        batch = batch.append_column("duration_s",
                                    pa.array(dur, type=pa.float64()))
        batch = batch.append_column(
            "audio_features", pa.array(feats, type=pa.list_(pa.float32())))
        return batch


class VideoFrameSampler:
    """Actor-pool stage: video payload → one row per sampled frame
    (row-expanding map).  Real backend (pyav/ffmpeg) unavailable →
    NotImplementedError; fake derives a frame count from the payload
    and emits every ``stride``-th frame index with a per-frame hash."""

    def __init__(self, backend: str = "fake", stride: int = 10,
                 max_frames: int = 16):
        if backend != "fake":
            raise NotImplementedError(
                f"video backend {backend!r} needs codec libs not present")
        self.stride = stride
        self.max_frames = max_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, fidx, fhash = [], [], []
        payloads = batch["payload"].to_pylist()
        keys = (batch["media_id"].to_pylist()
                if "media_id" in batch.column_names
                else list(range(len(payloads))))
        for k, p in zip(keys, payloads):
            p = p or b""
            n_frames = 1 + _u32(p, b"v") % 300
            take = list(range(0, n_frames, self.stride))[:self.max_frames]
            for t in take:
                ids.append(k)
                fidx.append(t)
                fhash.append(_u32(p, str(t).encode()))
        return pa.table({
            "media_id": pa.array(ids),
            "frame_idx": pa.array(fidx, type=pa.int32()),
            "frame_hash": pa.array(fhash, type=pa.int64()),
        })


def decode_images(ds, concurrency=(1, 4), batch_size=64, **kw):
    """Wide-binary-aware actor pool: small batches, setup in __init__."""
    return ds.map_batches(ImageDecoder, batch_format="pyarrow",
                          batch_size=batch_size, concurrency=concurrency,
                          num_cpus=1, fn_constructor_kwargs=kw)


def featurize_audio(ds, concurrency=(1, 4), batch_size=64, **kw):
    return ds.map_batches(AudioFeaturizer, batch_format="pyarrow",
                          batch_size=batch_size, concurrency=concurrency,
                          num_cpus=1, fn_constructor_kwargs=kw)


def sample_video_frames(ds, concurrency=(1, 4), batch_size=16, **kw):
    return ds.map_batches(VideoFrameSampler, batch_format="pyarrow",
                          batch_size=batch_size, concurrency=concurrency,
                          num_cpus=1, fn_constructor_kwargs=kw)


def synth_media(sf_dir: str, kind: str = "image"):
    """Deterministic media table derived from documents (payload bytes =
    md5-keyed expansion of the text) — test/bench input, no external
    data."""
    import ray.data as rd

    def make(batch: pa.Table) -> pa.Table:
        rows = {"media_id": batch["doc_id"],
                "payload": pa.array(
                    [hashlib.md5(t.encode()).digest() * (4 + len(t) % 64)
                     for t in batch["text"].to_pylist()],
                    type=pa.binary())}
        if kind == "image":
            rows["img_format"] = pa.array(["png"] * len(batch))
        elif kind == "audio":
            rows["sample_rate"] = pa.array(
                np.full(len(batch), 16000, np.int32))
        return pa.table(rows)
    return rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"]) \
             .map_batches(make, batch_format="pyarrow")


class PerceptualHasher:
    """Actor-pool stage: image payload -> 64-bit average-hash (aHash)
    for near-duplicate image detection.  Real path would decode +
    grayscale + 8x8 downsample per actor (codec libs absent, raises);
    the fake backend derives the 8x8 luma grid deterministically from
    the decode hash with pure integer arithmetic, so the aHash bits —
    cell*64 > sum(cells), strictly greater, no float mean — are
    reproducible by a SQL oracle.  The hash emits as two int64
    columns (phash_lo bits 0-31, phash_hi bits 32-63): 64-bit values
    don't survive float64-padded exchanges (the 52-bit join-key
    lesson), two 32-bit halves always do."""

    def __init__(self, backend: str = "fake"):
        if backend != "fake":
            raise NotImplementedError(
                f"image backend {backend!r} needs codec libs not "
                "present in this container; 'fake' is the stand-in")

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        base = np.array([_u32(p or b"") for p in payloads],
                        dtype=np.int64)
        j = np.arange(1, 65, dtype=np.int64)
        cells = (base[:, None] * j[None, :]) % 1000003
        total = cells.sum(axis=1)
        bits = cells * 64 > total[:, None]
        pw = (1 << np.arange(32, dtype=np.int64))
        lo = (bits[:, :32] * pw[None, :]).sum(axis=1)
        hi = (bits[:, 32:] * pw[None, :]).sum(axis=1)
        batch = batch.append_column("phash_lo", pa.array(lo))
        batch = batch.append_column("phash_hi", pa.array(hi))
        return batch


def phash_images(ds, concurrency=(1, 4), batch_size=256, **kw):
    return ds.map_batches(PerceptualHasher(**kw),
                          batch_format="pyarrow",
                          batch_size=batch_size)


def phash_near_dup_pairs(ds, max_hamming: int = 3, bands: int = 4,
                         id_col: str = "media_id"):
    """Hamming-radius perceptual near-dup pairs — real image dedup
    wants hamming <= d, not exact hash equality: rebuild the 64-bit
    aHash from its (phash_hi, phash_lo) halves inside each batch and
    run the pigeonhole band machinery (ops.dedup.banded_hamming_pairs
    — exact recall for max_hamming < bands, hamming64 verify for
    precision 1).  The full hash exists only transiently inside the
    band shuffle's int64 ``h`` column, which Ray's Arrow-native
    groupby exchange preserves bit-exactly (only float64-padded join
    feeds corrupt wide ints — the 52-bit join-key lesson).
    Returns (id_a, id_b, hamming)."""
    import pandas as pd

    from ..ops.dedup import banded_hamming_pairs

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        h = (df["phash_hi"].to_numpy(np.int64).astype(np.uint64)
             << np.uint64(32)) | \
            df["phash_lo"].to_numpy(np.int64).astype(np.uint64)
        return pd.DataFrame({id_col: df[id_col].to_numpy(np.int64),
                             "__h64": h.astype(np.int64)})

    h64 = ds.map_batches(combine, batch_format="pandas")
    return banded_hamming_pairs(h64, "__h64", id_col=id_col,
                                max_hamming=max_hamming, bands=bands)


def phash_near_dup_groups(ds, max_hamming: int = 3, bands: int = 4,
                          id_col: str = "media_id"):
    """Near-dup image GROUPS at hamming radius: banded pairs ->
    distributed connected components (large/small-star contraction,
    ops.dedup.cluster_pairs).  Returns (media_id, cluster_id) for
    every image in a cluster of >= 2, cluster_id = min member id."""
    from ..ops.dedup import cluster_pairs

    pairs = phash_near_dup_pairs(ds, max_hamming=max_hamming,
                                 bands=bands, id_col=id_col)
    cc = cluster_pairs(pairs).to_pandas() \
        .rename(columns={"node": id_col})
    return cc.astype({id_col: np.int64, "cluster_id": np.int64}) \
        .sort_values(id_col).reset_index(drop=True)


def phash_dup_groups(ds, id_col: str = "media_id"):
    """Exact near-dup image groups by aHash equality: distributed
    grouped (min id, count) over the two hash halves; only groups
    with >= 2 members return."""
    import pandas as pd

    from ..ops.relational import groupby_agg

    g = groupby_agg(ds, ["phash_hi", "phash_lo"],
                    {"first_media": (id_col, "min"),
                     "n_dups": (id_col, "count")},
                    final="distributed").to_pandas()
    g = g[g["n_dups"].to_numpy() >= 2]
    g = g.astype({"phash_hi": np.int64, "phash_lo": np.int64,
                  "first_media": np.int64, "n_dups": np.int64})
    return g.sort_values(["phash_hi", "phash_lo"]) \
        .reset_index(drop=True)
