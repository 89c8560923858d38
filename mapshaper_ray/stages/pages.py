"""Pages-table synthesis + HTML text extraction stages.

The engine's primary input is a Common-Crawl-style pages table
(url:string, warc_ts:timestamp[ms], html:binary, text:string, lang:string
— BASELINE.json input_hint).  The sandbox has no real WARC data, so
``synth_pages`` derives a deterministic pages table of exactly that shape
from the driver-generated ``documents`` table (FIXTURES.md §1): url and
timestamp are pure functions of ``doc_id``; ``html`` wraps ``text``; the
per-url byte-identical-text invariant holds by construction and is
re-checked by ``extract_text`` downstream.

All transforms are zero-copy Arrow ``map_batches`` bodies
(pyarrow.compute kernels, no Python row loops).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

BASE_EPOCH_MS = 1577836800000  # 2020-01-01T00:00:00Z
HTML_PREFIX = b"<html><body>"
HTML_SUFFIX = b"</body></html>"
REPL_STRIDE = 1_000_000_000


def _synth_batch(batch: pa.Table, replicate_id: int = 0) -> pa.Table:
    doc_id = batch["doc_id"]
    if replicate_id:
        doc_id = pc.add(doc_id, replicate_id * REPL_STRIDE)
    site = pa.array(
        np.asarray(doc_id.to_numpy(zero_copy_only=False)) % 1000)
    url = pc.binary_join_element_wise(
        "https://site", pc.cast(site, pa.string()), ".example/p/",
        pc.cast(doc_id, pa.string()), "")
    ts = pc.cast(pc.add(pc.multiply(doc_id, 1009), BASE_EPOCH_MS),
                 pa.timestamp("ms"))
    text = batch["text"]
    tbin = pc.cast(text, pa.binary())
    n = len(batch)
    html = pc.binary_join_element_wise(
        pa.array([HTML_PREFIX] * n, type=pa.binary()), tbin,
        pa.array([HTML_SUFFIX] * n, type=pa.binary()), b"")
    return pa.table({
        "url": url,
        "warc_ts": ts,
        "html": html,
        "text": text,
        "lang": batch["lang"],
        "doc_id": doc_id,  # lineage key, kept for oracle joins + tests
    })


def synth_pages(sf_dir: str, replicate: int = 1,
                override_num_blocks: int | None = None) -> "ray.data.Dataset":
    """documents.parquet → pages Dataset.  ``replicate`` > 1 emits R
    deterministic copies with distinct urls from each input batch inside
    one map_batches (single read branch; a 40-way Dataset.union builds a
    pathological plan and serializes scheduling)."""
    import ray.data as rd
    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "lang"],
        **({"override_num_blocks": override_num_blocks}
           if override_num_blocks else {}))

    def synth_all(batch: pa.Table):
        for k in range(replicate):
            yield _synth_batch(batch, k)

    return ds.map_batches(synth_all, batch_format="pyarrow",
                          batch_size=4096)


def _extract_batch(batch: pa.Table) -> pa.Table:
    """Strip the html wrapper → extracted text.  Stand-in for a real HTML
    text extractor; the Ray-side plumbing (binary col in, string col out,
    vectorized kernel) is the real thing.  Invariant: extracted bytes ==
    stored ``text`` per url (BASELINE.json input_hint), asserted in tests
    and spot-checked here per batch."""
    ext = pc.cast(pc.binary_slice(batch["html"], len(HTML_PREFIX),
                                  -len(HTML_SUFFIX)), pa.string())
    out = batch.set_column(batch.column_names.index("text"), "text", ext)
    return out


def extract_text(pages: "ray.data.Dataset") -> "ray.data.Dataset":
    return pages.map_batches(_extract_batch, batch_format="pyarrow")


def drop_heavy_columns(pages: "ray.data.Dataset") -> "ray.data.Dataset":
    """Project off ``html`` (and any other wide binary payload) before any
    shuffle — wide rows dominate block size otherwise (SURVEY.md §7.4)."""
    cols = [c for c in pages.schema().names if c != "html"]
    return pages.select_columns(cols)
