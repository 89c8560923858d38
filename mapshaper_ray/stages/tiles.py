"""Cell/tile assignment, hot-cell salting, resumable partitioned tile writes.

Generalizes the reference's ``-split-on-grid`` r{row}c{col} assignment
(src/commands/mapshaper-split-on-grid.js:6-62) to the hierarchical quadkey
scheme (cells.py): a page's level-L cell is pure arithmetic on (lon, lat);
its tile is the level-K prefix (K < L) — "groupby on cell prefix" is the
engine's one spatial shuffle key (north rule).

Skew: dense urban cells are salted.  A cheap count pre-pass (groupby over
the projected tile column only) finds tiles whose row count exceeds the
per-partition target; those split into ``ceil(count/target)`` salts keyed
``tile#salt`` with salt = h1 % n (valid because the PIP join and the tile
write are per-row).  Mirrors the reference's skew-adaptive stripe count
(src/paths/mapshaper-segment-intersection.js:125-133).

Resumability: each tile partition is written atomically (tmp + rename)
by a ``map_groups`` writer that emits a lineage-manifest row
{partition, rows, bytes, fingerprint, status}; the driver appends them to
``manifest.json``.  A resumed run loads the manifest and filters completed
partitions out BEFORE the shuffle, so finished work is skipped at the
read side.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

DEFAULT_LEVEL = 8
DEFAULT_TILE_LEVEL = 4


def assign_cells_batch(batch: pa.Table, level=DEFAULT_LEVEL,
                       tile_level=DEFAULT_TILE_LEVEL,
                       lon_col="lon", lat_col="lat") -> pa.Table:
    lon = np.asarray(batch[lon_col].to_numpy(zero_copy_only=False))
    lat = np.asarray(batch[lat_col].to_numpy(zero_copy_only=False))
    n = 1 << level
    cx = np.clip(((lon + 180.0) / 360.0 * n).astype(np.int64), 0, n - 1)
    cy = np.clip(((90.0 - lat) / 180.0 * n).astype(np.int64), 0, n - 1)
    shift = level - tile_level
    tx = cx >> shift
    ty = cy >> shift
    tile = tx * (1 << tile_level) + ty
    batch = batch.append_column("cell_x", pa.array(cx, type=pa.int64()))
    batch = batch.append_column("cell_y", pa.array(cy, type=pa.int64()))
    batch = batch.append_column("tile", pa.array(tile, type=pa.int64()))
    return batch


def assign_cells(ds, level=DEFAULT_LEVEL, tile_level=DEFAULT_TILE_LEVEL,
                 lon_col="lon", lat_col="lat"):
    return ds.map_batches(
        lambda b: assign_cells_batch(b, level, tile_level, lon_col, lat_col),
        batch_format="pyarrow")


def assign_cells_s2_batch(batch: pa.Table, level=12, tile_level=6,
                          lon_col="lon", lat_col="lat") -> pa.Table:
    """S2 cell + tile ids (uint64) per row — the sphere-correct
    alternative to the quadkey grid above (see mapshaper_ray/s2.py):
    uniform-area cells, and Hilbert locality means sorting or
    range-sharding by ``s2_cell`` IS a spatial partition, so a plain
    id-range split co-locates neighboring pages with no custom
    partitioner.  ``s2_tile = parent(s2_cell, tile_level)`` keeps the
    groupby-on-cell-prefix pattern (prefix = ancestor)."""
    from .. import s2
    lon = np.asarray(batch[lon_col].to_numpy(zero_copy_only=False))
    lat = np.asarray(batch[lat_col].to_numpy(zero_copy_only=False))
    ids = s2.lonlat_to_cell_id(lon, lat, level)
    tiles = s2.parent(ids, tile_level)
    batch = batch.append_column("s2_cell", pa.array(ids, type=pa.uint64()))
    batch = batch.append_column("s2_tile", pa.array(tiles, type=pa.uint64()))
    return batch


def assign_cells_s2(ds, level=12, tile_level=6,
                    lon_col="lon", lat_col="lat"):
    return ds.map_batches(
        lambda b: assign_cells_s2_batch(b, level, tile_level,
                                        lon_col, lat_col),
        batch_format="pyarrow")


# ---------------------------------------------------------------------------
# salting

def tile_counts(ds) -> pd.DataFrame:
    """Count pre-pass: per-batch value_counts partials (one row per
    (block, tile) — tiles are bounded by the grid level) summed on
    the driver.  No shuffle at all; the native groupby().count()
    Aggregate this replaces cost 27 s on a 2M-row/64-block input
    where the partial reduce costs <1 s."""
    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        schema = pa.schema([("tile", pa.int64()),
                            ("count()", pa.int64())])
        if batch.num_rows == 0:
            return schema.empty_table()
        c = batch.column("tile")
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        vc = pc.value_counts(c)
        return pa.Table.from_arrays(
            [vc.field("values").cast(pa.int64()),
             vc.field("counts").cast(pa.int64())], schema=schema)

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    return parts.groupby("tile", sort=True)["count()"].sum() \
        .reset_index()


def salt_plan(counts: pd.DataFrame, target_rows: int) -> dict[int, int]:
    """tile -> number of salts (only hot tiles present)."""
    plan = {}
    for tile, cnt in zip(counts["tile"], counts["count()"]):
        if cnt > target_rows:
            plan[int(tile)] = int(np.ceil(cnt / target_rows))
    return plan


def add_salted_key_batch(batch: pa.Table, plan: dict[int, int],
                         hash_col="doc_id") -> pa.Table:
    tile = np.asarray(batch["tile"].to_numpy(zero_copy_only=False))
    if plan:
        nsplit = np.ones(len(tile), dtype=np.int64)
        for t, k in plan.items():
            nsplit[tile == t] = k
        h = np.asarray(batch[hash_col].to_numpy(zero_copy_only=False))
        salt = (h % nsplit).astype(np.int64)
    else:
        salt = np.zeros(len(tile), dtype=np.int64)
    part = np.char.add(np.char.add(tile.astype("U8"), "#"), salt.astype("U4"))
    return batch.append_column("partition", pa.array(part, type=pa.string()))


# ---------------------------------------------------------------------------
# resumable tile sink

def _fingerprint(df: pd.DataFrame) -> int:
    """Order-independent content hash of a partition (sum of stable row
    hashes) — byte-stability evidence for resume tests."""
    h = pd.util.hash_pandas_object(
        df.sort_index(axis=1).astype(str), index=False)
    return int(np.bitwise_xor.reduce(h.to_numpy()) ^ np.uint64(len(df)))


class _TileWriter:
    def __init__(self, out_dir: str):
        self.out_dir = out_dir

    def __call__(self, group: pd.DataFrame) -> pd.DataFrame:
        part = str(group["partition"].iloc[0])
        pdir = os.path.join(self.out_dir, f"part={part}")
        os.makedirs(pdir, exist_ok=True)
        final = os.path.join(pdir, "data.parquet")
        tmp = final + f".tmp-{os.getpid()}"
        out = group.sort_values(
            [c for c in ("doc_id", "url") if c in group.columns] or
            list(group.columns[:1])).reset_index(drop=True)
        table = pa.Table.from_pandas(out.drop(columns=["partition"]),
                                     preserve_index=False)
        pq.write_table(table, tmp)
        os.replace(tmp, final)  # atomic commit
        return pd.DataFrame([{
            "partition": part,
            "rows": len(out),
            "bytes": os.path.getsize(final),
            "fingerprint": _fingerprint(out.drop(columns=["partition"])),
            "status": "done",
            "ts": time.time(),
        }])


def load_manifest(out_dir: str) -> pd.DataFrame | None:
    path = os.path.join(out_dir, "manifest.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return pd.DataFrame(json.load(f))


def write_tiles(ds, out_dir: str, target_rows: int = 50_000,
                resume: bool = True, hash_col: str = "doc_id") -> pd.DataFrame:
    """Salted, resumable partitioned tile write.  Returns the manifest.

    ds must already carry a ``tile`` column (assign_cells)."""
    os.makedirs(out_dir, exist_ok=True)
    done = set()
    prior = load_manifest(out_dir) if resume else None
    if prior is not None and len(prior):
        done = set(prior[prior["status"] == "done"]["partition"])
    # checkpoint ONCE: the count pre-pass and the salted write would
    # otherwise each execute the whole upstream (geocode + join) —
    # materialized blocks live in the (spillable) object store
    ds = ds.materialize()
    counts = tile_counts(ds)
    plan = salt_plan(counts, target_rows)
    salted = ds.map_batches(
        lambda b: add_salted_key_batch(b, plan, hash_col),
        batch_format="pyarrow")
    if done:
        done_arr = done
        salted = salted.map_batches(
            lambda b: b.filter(
                pa.array(~np.isin(np.asarray(b["partition"]), list(done_arr)))),
            batch_format="pyarrow")
    writer = _TileWriter(out_dir)

    def write_partition(group: pd.DataFrame) -> pd.DataFrame:
        return writer(group)

    result_ds = salted.groupby("partition").map_groups(
        write_partition, batch_format="pandas")
    new_rows = result_ds.to_pandas()
    manifest = (pd.concat([prior, new_rows], ignore_index=True)
                if prior is not None else new_rows)
    manifest = manifest.drop_duplicates("partition", keep="last")
    tmp = os.path.join(out_dir, "manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest.to_dict("records"), f, indent=1)
    os.replace(tmp, os.path.join(out_dir, "manifest.json"))
    # observability half of the lineage+metrics contract: how the run
    # executed, next to what it produced
    try:
        from .metrics import write_run_metrics
        write_run_metrics(result_ds, out_dir, extra={
            "partitions_written": int(len(new_rows)),
            "partitions_skipped": int(len(done)),
            "rows_total": int(manifest["rows"].sum())})
    except Exception:
        pass  # metrics are advisory; never fail a write over them
    return manifest
