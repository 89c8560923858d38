"""Command facade — one importable surface mapping every reference
command (SURVEY.md §2 operator inventory; authoritative registry
src/cli/mapshaper-options.js) to its Ray-Data implementation here.

A user of the reference switches like-for-like:

    mapshaper -i in.json -simplify 50% -o out.json
    →  lyr = api.i("in.json"); api.o(api.simplify(lyr, pct=0.5), "out.json")

Each entry notes the semantics source (reference file:line) in the
implementation module's docstring.  ``run_commands`` exposes the same
operators through the reference's command-string grammar.
"""

from __future__ import annotations

# --- sources / sinks (§2.1) -------------------------------------------------
from .sources.delim import read_delim, write_delim  # -i .csv / -o .csv
from .sources.geojson import (read_geojson,  # -i .json
                              write_geojson,  # -o .json
                              write_geojson_shards)
from .sources.shapefile import (read_shapefile,  # -i .shp (+.shx/.dbf)
                                write_shapefile)  # -o .shp
from .sources.svg import write_svg  # -o .svg
from .sources.topojson import (read_topojson,  # -i .topojson
                               write_topojson)  # -o format=topojson

# --- per-record transforms (§2.2) ------------------------------------------
from .ops.relational import (broadcast_join, broadcast_join_calc,  # -join
                             calc_stats,  # -calc
                             each_expr,  # -each
                             filter_expr,  # -filter
                             include_defs,  # -include
                             groupby_agg,  # -dissolve (data side)
                             hash_join,  # -join (large-large)
                             join_side_outputs,  # -join unmatched/unjoined
                             sort_topk,  # -sort + head
                             uniq_first,  # -uniq
                             window_tumbling)
from .ops.features import (add_polygon_metrics,  # $.area etc. (§2.2a)
                           affine,  # -affine
                           centroids,  # -points (centroid source)
                           clean_shapes,  # -clean (shape repair)
                           explode,  # -explode
                           filter_bbox,  # -filter-geom bbox=
                           filter_islands,  # -filter-islands
                           filter_slivers,  # -filter-slivers
                           layer_info,  # -info
                           round_coords,  # precision= rounding
                           to_point_layer)  # -points
from .ops.generate import (graticule,  # -graticule
                           point_grid,  # -point-grid
                           points_endpoints,  # -points endpoints
                           points_from_columns,  # -points x= y=
                           points_interpolated,  # -points interpolated
                           points_vertices,  # -points vertices
                           polygon_grid,  # -polygon-grid
                           rectangle)  # -rectangle
from .stages.proj import project_layer, project_points  # -proj

# --- joins / spatial (§2.3-2.4) --------------------------------------------
from .stages.spatial_join import spatial_join  # -join polygons onto points
from .ops.clip import (clip_bbox,  # -clip bbox=
                       clip_points,  # -clip (point target)
                       clip_polylines,  # -clip/-erase (polyline target)
                       erase_points,  # -erase (point target)
                       slice_polylines)  # -slice (polyline target)
from .ops.knn import (nearest_join,  # point->point join (PointIndex repl.)
                      nearest_join_shuffle)
from .state.path_index import PathIndex
from .state.polygon_index import PolygonIndex  # per-ring x-bucket PIP
from .ops.colorizer import (colorize, make_colorizer,  # -colorizer
                            svg_style)  # -svg-style

# --- topology (§2.6) --------------------------------------------------------
from .topo.build import build_topology  # buildTopology (in-process kernel)
from .topo.build_distributed import (build_topology_ds,  # 2-shuffle variant
                                     find_junctions_ds)
from .topo.cuts import (add_intersection_cuts,  # addIntersectionCuts
                        find_intersections,
                        find_intersections_ds)
from .topo.dissolve import (classify_arcs,  # arc classifier
                            dissolve_polylines,
                            dissolve_shapes,  # -dissolve (geometry)
                            innerlines,  # -innerlines
                            lines)  # -lines
from .topo.snap import (dedup_arc_coords,  # dedupCoords
                        snap_arcs,  # -i snap
                        snap_coords_by_interval,
                        snap_points_ds)
from .geom.simplify import (dp_thresholds,  # -simplify dp
                            filter_arc_by_interval,
                            pct_by_threshold,
                            threshold_by_pct,
                            visvalingam_thresholds)  # -simplify visvalingam

# --- splitting / merging (§2.7) --------------------------------------------
from .ops.split import (merge_layers,  # -merge-layers
                        split_by_field,  # -split
                        split_on_grid,  # -split-on-grid
                        subdivide)  # -subdivide

# --- dedup / text / ANN / multimodal (training-data ops) -------------------
from .ops.dedup import (banded_hamming_pairs, cluster_pairs,
                        embedding_near_dup, embedding_near_dup_exact,
                        exact_dedup, minhash_lsh, simhash)
from .ops.ann import brute_topk, ivf_topk
from .stages.text import analyze_text, fingerprint
from .stages.multimodal import (decode_images, featurize_audio,
                                phash_near_dup_groups,
                                phash_near_dup_pairs,
                                sample_video_frames)

# --- analytics / sketches / lakehouse (round-5 band) -----------------------
from .cells import hex_center, lonlat_to_hex
from .ops.relational import (cdc_apply, compaction_plan, event_gaps,
                             group_corr, grouped_rolling_sum,
                             hash_join_salted, interval_overlap_join,
                             profile_columns, scd2_intervals,
                             time_weighted_avg)
from .ops.sketch import (kmv_build, kmv_estimate, kmv_set_stats,
                         kmv_union)
from .stages.proj import geocent_fwd, geocent_inv, geocent_points

# --- pipelines --------------------------------------------------------------
from .pipelines.simplify_layer import (simplify_layer,  # -simplify (layer)
                                       simplify_layer_distributed)
from .pipelines.overlay import (clip_layer,  # -clip (general polygon)
                                dissolve2_layer,  # -dissolve2 (layer, cell=)
                                dissolve_layer,  # -dissolve (layer)
                                erase_layer,  # -erase (general polygon)
                                precut_by_cells)  # cell-grid pre-cut
from .pipelines.flagship import (build_pipeline, build_pipeline_from_parquet,
                                 flagship_counts,
                                 flagship_counts_from_parquet,
                                 flagship_tiles)


from .topo.mosaic import (clean_layer,  # -clean
                          dissolve2,  # -dissolve2
                          polygon_mosaic,  # -mosaic
                          polygons_from_lines)  # -polygons
from .ops.neighbors import (cluster_polygons,  # -cluster
                            data_fill,  # -data-fill
                            neighbor_edges)  # polygon-neighbors graph
from .ops.anchor import (anchor_point, anchor_points,  # -points inner
                         fix_ring_nesting,  # ring-nesting repair
                         stitch_antimeridian,  # -stitch (planar unwrap)
                         stitch_spherical)  # -stitch (lat-lon edge snap)
from .geom.keep_shapes import (protect_shapes,  # -simplify keep-shapes
                               repair_intersections)  # post-simplify repair


def run_commands(command_str, catalog=None):
    """mapshaper-style command string → executed Ray pipeline
    (reference api.runCommands, src/cli/mapshaper-commands.js:5)."""
    from .commands import run_commands as _run
    return _run(command_str, catalog)


def apply_commands(command_str, inputs=None):
    """In-memory command pipeline: {name: content} in → {name: bytes}
    out (reference api.applyCommands,
    src/cli/mapshaper-commands.js:25)."""
    from .commands import apply_commands as _apply
    return _apply(command_str, inputs)


def i(path: str, **kw):
    """-i: format-sniffing import dispatch (reference api.importFile,
    src/io/mapshaper-file-import.js:6,34 — extension first, content
    sniff for .json ambiguity)."""
    low = path.lower()
    if low.endswith((".shp",)):
        return read_shapefile(path, **kw)
    if low.endswith((".dbf",)):
        # bare DBF -> data-only table layer (reference importDbfTable)
        import ray.data as rd

        from .sources.shapefile import parse_dbf
        with open(path, "rb") as f:
            _, recs = parse_dbf(f.read(),
                                encoding=kw.get("encoding"))
        return rd.from_items([{"feature_id": i, **r}
                              for i, r in enumerate(recs)])
    if low.endswith((".csv", ".tsv", ".txt")):
        return read_delim(path, **kw)
    if low.endswith((".topojson",)):
        return read_topojson(path, **kw)
    if low.endswith((".ndjson", ".geojsonl", ".jsonl")):
        # newline-delimited features (our own shard-sink output)
        import ray.data as rd
        from .sources.geojson import parse_feature_batch
        with open(path, "r", encoding="utf-8") as f:
            lines = [ln.strip() for ln in f if ln.strip()]
        items = [{"feature_id": i, "json": t}
                 for i, t in enumerate(lines)]
        from .sources.geojson import _GEOM_CLASS
        counts: dict = {}
        for t in lines:
            for g, cls in _GEOM_CLASS.items():
                if f'"{g}"' in t:
                    counts[cls] = counts.get(cls, 0) + 1
                    break
        gc = max(counts, key=counts.get) if counts else "point"
        return rd.from_items(items).map_batches(
            lambda b: parse_feature_batch(b, gc, None),
            batch_format="pyarrow")
    if low.endswith((".json", ".geojson")):
        with open(path, "r", encoding="utf-8", errors="replace") as f:
            head = f.read(4096)
        if '"Topology"' in head:
            return read_topojson(path, **kw)
        if head.lstrip().startswith("[") and '"geometry"' not in head \
                and '"Feature"' not in head and '"coordinates"' not in head:
            # JSON array of PLAIN records → data-only layer (reference
            # importJSONTable, src/data/mapshaper-json-table.js:3);
            # arrays of GeoJSON Features fall through to the GeoJSON
            # reader (the reference checks record content first)
            import numpy as np
            import pandas as pd
            import ray.data as rd
            tbl = pd.read_json(path)
            tbl.insert(0, "feature_id",
                       np.arange(len(tbl), dtype=np.int64))
            return rd.from_pandas(tbl)
        return read_geojson(path, **kw)
    if low.endswith((".parquet",)) or "/" not in low.rsplit(".", 1)[-1]:
        import ray.data as rd
        return rd.read_parquet(path)
    raise ValueError(f"unrecognized input format: {path}")


def i_layers(path: str, **kw):
    """-i returning one layer PER GEOMETRY CLASS for mixed-type
    GeoJSON/TopoJSON input (reference divideFeaturesByType,
    src/dataset/mapshaper-dataset-utils.js:7): [(suffix, Dataset)] —
    suffix is '' for single-class input, '1'/'2'/... in encounter
    order for mixed (the reference's numbered output naming)."""
    low = path.lower()
    is_topo = low.endswith(".topojson")
    if low.endswith((".json", ".geojson")):
        with open(path, "r", encoding="utf-8", errors="replace") as f:
            head = f.read(4096)
        if '"Topology"' in head:
            is_topo = True
        elif not (head.lstrip().startswith("[")
                  and '"geometry"' not in head
                  and '"Feature"' not in head
                  and '"coordinates"' not in head):
            from .sources.geojson import read_geojson_split
            parts = read_geojson_split(path, **kw)
            if len(parts) == 1:
                return [("", parts[0][1])]
            return [(str(j + 1), ds) for j, (_, ds) in
                    enumerate(parts)]
    if is_topo:
        from .sources.topojson import read_topojson_layers
        parts = read_topojson_layers(path, **kw)
        if len(parts) == 1:
            return [("", parts[0][2])]
        # multiple layers: objects keep their key as the layer name
        # ("::name" marks a full-name override for the caller); a
        # mixed-type object numbers its per-class layers
        out, seen = [], {}
        multi_obj = len({n for n, _, _ in parts}) > 1
        for name, n_classes, ds in parts:
            label = name if multi_obj else ""
            if n_classes > 1:
                seen[name] = seen.get(name, 0) + 1
                label += str(seen[name])
            out.append(("::" + label if multi_obj else label, ds))
        return out
    return [("", i(path, **kw))]


def o(ds, path: str, **kw):
    """-o: export dispatch by extension (reference exportTargetLayers
    format inference, src/io/mapshaper-export.js:130-144).  ``rotate``
    applies to ring-geometry writers only (see write_geojson)."""
    low = path.lower()
    rotate = kw.pop("rotate", True)
    if low.endswith(".shp"):
        return write_shapefile(ds, path, rotate=rotate, **kw)
    if low.endswith((".csv", ".tsv")):
        return write_delim(ds, path, **kw)
    if low.endswith(".svg"):
        return write_svg(ds, path, rotate=rotate, **kw)
    if low.endswith(".topojson"):
        from .sources.topojson import write_topojson_layer
        return write_topojson_layer(ds, path, **kw)
    if low.endswith((".json", ".geojson")):
        return write_geojson(ds, path, rotate=rotate, **kw)
    if low.endswith(".parquet") or low.rstrip("/").endswith("_dir"):
        ds.write_parquet(path)
        return path
    raise ValueError(f"unrecognized output format: {path}")
