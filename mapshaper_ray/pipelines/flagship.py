"""Flagship pipeline: pages → extract → geocode → cells → PIP join → tiles.

The end-to-end slice of SURVEY.md §7.1 step 2, composed from the stage
modules.  Streaming throughout: the only materializations are the small
tile-count pre-pass and the final aggregate/manifest.
"""

from __future__ import annotations

from ..regions import build_region_index, make_regions
from ..stages.geocode import geocode
from ..stages.pages import drop_heavy_columns, extract_text, synth_pages
from ..stages.spatial_join import spatial_join
from ..stages.tiles import assign_cells, write_tiles


def build_pipeline(sf_dir: str, replicate: int = 1, how: str = "left",
                   level: int = 8, tile_level: int = 4,
                   concurrency=None, join_concurrency=None,
                   override_num_blocks=None, light: bool = False):
    """pages Dataset with lon/lat, region_id/attrs, cell/tile columns —
    lazy; callers consume via aggregate or write_tiles.

    ``light=True`` projects the wide page payload (text/url/...) off
    right after geocode for aggregate-only consumers — the join itself
    only needs (doc_id, lon, lat); rejoin by doc_id/url hash when the
    payload is needed downstream (SURVEY.md §7.4 "very wide records")."""
    pages = synth_pages(sf_dir, replicate, override_num_blocks)
    pages = extract_text(pages)
    pages = geocode(pages, concurrency=concurrency)
    if light:
        pages = pages.select_columns(["doc_id", "lon", "lat"])
    else:
        pages = drop_heavy_columns(pages)  # html off before any shuffle
    pages = assign_cells(pages, level=level, tile_level=tile_level)
    _, attrs = make_regions()
    idx = build_region_index()
    pages = spatial_join(pages, idx, attrs=attrs if not light else None,
                         how=how, concurrency=join_concurrency)
    return pages


def build_pipeline_from_parquet(pages_dir: str, how: str = "left",
                                level: int = 8, tile_level: int = 4,
                                join_concurrency=None, light: bool = True,
                                override_num_blocks=None):
    """The production-shaped flagship: read pages PARQUET (column-pruned
    to doc_id+html), extract text, geocode, assign cells, PIP-join.
    This is the benchmark path — input is real files, like the 10^12-doc
    deployment, not in-memory synthesis."""
    from ..stages.pages import extract_text, read_pages
    cols = ["doc_id", "html"] if light else None
    pages = read_pages(pages_dir, columns=cols,
                       override_num_blocks=override_num_blocks)
    pages = extract_text(pages)
    pages = geocode(pages)
    if light:
        pages = pages.select_columns(["doc_id", "lon", "lat"])
    pages = assign_cells(pages, level=level, tile_level=tile_level)
    _, attrs = make_regions()
    idx = build_region_index()
    pages = spatial_join(pages, idx, attrs=None if light else attrs,
                         how=how, concurrency=join_concurrency)
    return pages


def flagship_counts_from_parquet(pages_dir: str, **kw):
    """Counts per (region_id, tile) from a materialized pages directory."""
    from ..ops.relational import groupby_agg
    ds = build_pipeline_from_parquet(pages_dir, **kw)
    out = groupby_agg(ds, ["region_id", "tile"],
                      {"count()": ("doc_id", "count")})
    import ray.data as rd
    pdf = out.to_pandas().sort_values(["region_id", "tile"]) \
             .reset_index(drop=True)
    return rd.from_pandas(pdf)


def flagship_counts(sf_dir: str, replicate: int = 1, **kw):
    """Aggregated result: pages per (region_id, tile) — the spatial-join +
    tile-assignment summary (small output, safe to materialize).

    Partial per-batch counts inside map_batches, one tiny shuffle over
    the partials, driver-side sort of the ~500-row result — not a full
    hash shuffle of every page row."""
    from ..ops.relational import groupby_agg
    kw.setdefault("light", True)
    ds = build_pipeline(sf_dir, replicate, **kw)
    out = groupby_agg(ds, ["region_id", "tile"],
                      {"count()": ("doc_id", "count")})
    import ray.data as rd
    pdf = out.to_pandas().sort_values(["region_id", "tile"]) \
             .reset_index(drop=True)
    return rd.from_pandas(pdf)


def flagship_tiles(sf_dir: str, out_dir: str, replicate: int = 1,
                   target_rows: int = 50_000, resume: bool = True, **kw):
    """Full run with resumable partitioned tile writes; returns manifest."""
    ds = build_pipeline(sf_dir, replicate, **kw)
    return write_tiles(ds, out_dir, target_rows=target_rows, resume=resume)
