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
                   concurrency=(1, 8), override_num_blocks=None):
    """pages Dataset with lon/lat, region_id/attrs, cell/tile columns —
    lazy; callers consume via aggregate or write_tiles."""
    pages = synth_pages(sf_dir, replicate, override_num_blocks)
    pages = extract_text(pages)
    pages = geocode(pages, concurrency=concurrency)
    pages = drop_heavy_columns(pages)  # html off before any shuffle
    pages = assign_cells(pages, level=level, tile_level=tile_level)
    _, attrs = make_regions()
    idx = build_region_index()
    pages = spatial_join(pages, idx, attrs=attrs, how=how,
                         concurrency=concurrency)
    return pages


def flagship_counts(sf_dir: str, replicate: int = 1, **kw):
    """Aggregated result: pages per (region_id, tile) — the spatial-join +
    tile-assignment summary (small output, safe to materialize)."""
    ds = build_pipeline(sf_dir, replicate, **kw)
    return (ds.groupby(["region_id", "tile"]).count()
            .sort(["region_id", "tile"]))


def flagship_tiles(sf_dir: str, out_dir: str, replicate: int = 1,
                   target_rows: int = 50_000, resume: bool = True, **kw):
    """Full run with resumable partitioned tile writes; returns manifest."""
    ds = build_pipeline(sf_dir, replicate, **kw)
    return write_tiles(ds, out_dir, target_rows=target_rows, resume=resume)
