"""Command-string surface — the Ray-Data-native counterpart of the
reference's primary user entry points ``api.runCommands`` /
``api.applyCommands`` (src/cli/mapshaper-commands.js:5,25; tokenizer
src/cli/mapshaper-chunker.js:3-18; option registry
src/cli/mapshaper-options.js).

    run_commands("-i in.json -filter 'area > 2' -simplify 50% "
                 "keep-shapes -o out.json")

Differences from the reference, by design:
- expressions are vectorized PYTHON expressions over columns (the
  engine's expression surface, ops/relational.compile_expression), not
  JS — same option grammar, different expression language;
- each command resolves to the library's distributed implementation
  (map_batches / groupby pipelines), so a command string IS a Ray
  pipeline; nothing here materializes beyond what the underlying op
  needs.

The catalog mirrors the reference Catalog: named layer Datasets with a
default target (src/dataset/mapshaper-catalog.js:6-60).
"""

from __future__ import annotations

import os
import re
import shlex

import numpy as np
import pandas as pd


def split_tokens(command_str: str) -> list[str]:
    """Shell-like tokenization with quote support (reference
    splitShellTokens)."""
    lex = shlex.shlex(command_str, posix=True)
    lex.whitespace_split = True
    lex.commenters = ""
    return list(lex)


# per-command boolean flags (the reference declares every option in
# src/cli/mapshaper-options.js; bare tokens matching a declared flag
# parse as True options, everything else stays positional)
_FLAGS = {
    "simplify": {"keep-shapes", "dp", "visvalingam", "weighted",
                 "planar", "cartesian", "spherical", "no-repair",
                 "stats", "lock-box"},
    "points": {"vertices", "endpoints", "inner", "centroid",
               "interpolated"},
    "sort": {"descending", "ascending"},
    "merge-layers": {"force"},
    "i": {"snap", "auto-snap", "combine-files", "merge-files",
          "no-topology"},
    "o": {"force", "bbox", "drop-table", "cut-table",
          "prettify", "singles", "no-quantization", "rfc7946",
          "combine-layers", "bbox-index", "dry-run"},
    "join": {"unjoined", "unmatched"},
    "clean": {"allow-overlaps"},
    "dissolve": {"planar"},
    "explode": {"naive"},
    "proj": {"densify"},
    "filter": {"remove-empty"},
    "data-fill": {"postprocess"},
    "drop": {"geometry"},
}

# string option values the reference parses as booleans ('closed=false'
# must read false, not truthy-string true)
_FALSY = {"false", "0", "no", ""}


def _bool_opt(val) -> bool:
    if isinstance(val, str):
        return val.strip().lower() not in _FALSY
    return bool(val)


# meters per unit (reference UNITS_LOOKUP + pj_units,
# src/geom/mapshaper-units.js:3-13)
_UNIT_M = {"m": 1.0, "meter": 1.0, "meters": 1.0,
           "km": 1000.0, "kilometers": 1000.0,
           "mi": 1609.344, "mile": 1609.344, "miles": 1609.344,
           "ft": 0.3048, "feet": 0.3048}


def _parse_measure(val):
    """'100km2' / '5km' / 12.5 → (value, meters_factor, areal)
    (reference parseMeasure, src/geom/mapshaper-units.js:63-85)."""
    if isinstance(val, (int, float)):
        return float(val), 1.0, False
    s = str(val).strip()
    m = re.search(r"(sq|)([a-z]+)(2|)$", s, re.I)
    if m and m.group(2).lower() in _UNIT_M:
        areal = bool(m.group(1) or m.group(3))
        return (float(s[:m.start()]), _UNIT_M[m.group(2).lower()], areal)
    return float(s), 1.0, False


def _parse_area(val) -> float:
    """Area param → m^2 (convertAreaParam)."""
    v, k, _ = _parse_measure(val)
    return v * k * k


def _parse_distance(val) -> float:
    """Distance param → meters (convertDistanceParam)."""
    v, k, areal = _parse_measure(val)
    if areal:
        raise ValueError(f"expected a distance, got an area: {val!r}")
    return v * k


# commands whose FIRST positional argument is an expression /
# assignment list that may itself contain '=' (reference: these declare
# a DEFAULT option that captures the first bare token)
_VALUE_FIRST = {"each", "filter", "rename-fields", "uniq", "sort",
                "calc", "subdivide", "inspect"}

# declared key=value option names per command: recognized even before
# the expression token so "-each where=... 'a = b'" parses correctly
_OPT_KEYS = {
    "each": {"where"},
    "filter": {"where"},
    "uniq": {"max-count"},  # uniq_first max_count
    "calc": {"where"},
    "sort": set(),
    "rename-fields": set(),
    "subdivide": set(),
}


def parse_commands(tokens) -> list[dict]:
    """Token list / string → [{name, options: {…}, args: […]}]
    (reference parseCommands IR).  ``key=value`` tokens become options,
    declared bare flags become True options, everything else is a
    positional arg."""
    if isinstance(tokens, str):
        tokens = split_tokens(tokens)
    cmds: list[dict] = []
    cur = None
    for tok in tokens:
        if re.match(r"^-[a-z]", tok):
            cur = {"name": tok.lstrip("-"), "options": {}, "args": []}
            cmds.append(cur)
            continue
        if cur is None:
            raise ValueError(f"token before any command: {tok!r}")
        if cur["name"] in _VALUE_FIRST and not cur["args"]:
            m = re.match(r"^([a-z][\w-]*)=", tok)
            if tok in _FLAGS.get(cur["name"], ()):
                cur["options"][tok.replace("-", "_")] = True
                continue
            if m and m.group(1) in _OPT_KEYS.get(cur["name"], ()):
                cur["options"][m.group(1).replace("-", "_")] = \
                    tok.split("=", 1)[1]
                continue
            cur["args"].append(tok)
            continue
        m = re.match(r"^([a-z][\w-]*)=(.*)$", tok)
        if m:
            cur["options"][m.group(1).replace("-", "_")] = m.group(2)
        elif tok == "+":
            # '+' shorthand = no-replace (add the output as a NEW
            # layer, reference option parser)
            cur["options"]["no_replace"] = True
        elif tok in _FLAGS.get(cur["name"], ()):
            cur["options"][tok.replace("-", "_")] = True
        else:
            cur["args"].append(tok)
    return cmds


def _parse_calc(spec: str) -> dict:
    """'out1 = sum(col), out2 = count()' → {out: (col, fn)} for the
    aggregate forms groupby_agg / broadcast_join_calc support
    (the reference's -dissolve calc= / -join calc= common cases)."""
    out = {}
    for part in spec.split(","):
        name, expr = part.split("=", 1)
        m = re.match(r"\s*(sum|count|min|max|mean|average|median"
                     r"|first|last|mode|collect)"
                     r"\(\s*([\w]*)\s*\)\s*$", expr.strip())
        if not m:
            raise ValueError(f"unsupported calc expression: {expr!r} "
                             "(supported: fn(col) with fn in sum/count/"
                             "min/max/mean/average/median/first/last/"
                             "mode/collect)")
        fn, col = m.group(1), m.group(2)
        out[name.strip()] = (col, fn)  # empty col = fill later
    return out


def _num_list(s, typ=float):
    return [typ(v) for v in str(s).split(",")]


def _split_assignments(s: str) -> dict[str, str]:
    """'a = expr1, b = expr2; c = expr3' → {name: expr}.  Separators
    are ';' and top-level ',' (the reference compiles -each as one JS
    comma expression, so 'a=1, b=2' is a valid multi-assignment);
    commas inside (), [], {} or string literals don't split, and '='
    splits only outside comparison operators (==, <=, >=, !=)."""
    parts, depth, quote, start = [], 0, None, 0
    for i, ch in enumerate(s):
        if quote:
            if ch == quote and s[i - 1] != "\\":
                quote = None
        elif ch in "\"'":
            quote = ch
        elif ch in "([{":
            depth += 1
        elif ch in ")]}":
            depth -= 1
        elif (ch == ";" or ch == ",") and depth == 0:
            parts.append(s[start:i])
            start = i + 1
    parts.append(s[start:])
    out = {}
    for part in parts:
        if not part.strip():
            continue
        m = re.search(r"(?<![=<>!])=(?!=)", part)
        if not m:
            raise ValueError(f"expected an assignment: {part!r}")
        out[part[:m.start()].strip()] = part[m.end():].strip()
    return out


def _pct(v):
    v = str(v)
    return float(v[:-1]) / 100.0 if v.endswith("%") else float(v)


class Catalog:
    """Named layer Datasets + default target."""

    def __init__(self):
        self.layers: dict[str, object] = {}
        self.target: str | None = None
        self.defs: dict = {}
        self._anon = 0
        # layer names whose polygon rings are ALREADY in the
        # reference's arc traversal order (refclip-kernel outputs) —
        # export must NOT re-rotate them through a topology rebuild
        self.no_rotate: set[str] = set()
        # layers projected to a non-latlong CRS: GeoJSON export writes
        # "crs":null like the reference's exportCRS
        self.projected: set[str] = set()
        # per-layer CRS: {"fwd","inv","prj","latlong"} — fwd/inv are
        # (lon,lat)<->(x,y) callables or None when the .prj could not
        # be parsed; "prj" is the WKT text written back on .shp export
        # (the reference keeps the input .prj verbatim and copies it
        # through, test/shapefile-test.js:23)
        self.crs: dict[str, dict] = {}
        # layer → source file path (reference keeps it for bare -o
        # output-name derivation, getOutputFileName)
        self.src_file: dict[str, str] = {}
        self.last_input: str | None = None
        # default directory for DERIVED output names (bare -o); set by
        # apply_commands so in-memory outputs land in its temp dir
        self.out_dir: str | None = None

        # the CURRENT TARGETS — all layers of the last -i (the
        # reference's default target is every layer of the imported
        # dataset; transform commands apply to each)
        self.targets: list[str] = []

    def add(self, ds, name=None):
        if not name:
            self._anon += 1
            name = f"layer{self._anon}"
        self.layers[name] = ds
        self.target = name
        self.targets = [name]
        self.no_rotate.discard(name)
        self.crs.pop(name, None)
        return name

    def get(self, name=None):
        key = name or self.target
        if key is None or key not in self.layers:
            raise ValueError(f"no target layer {key!r}; "
                             f"have {sorted(self.layers)}")
        return self.layers[key]

    def replace(self, ds, no_rotate=False):
        self.layers[self.target] = ds
        if no_rotate:
            self.no_rotate.add(self.target)
        else:
            self.no_rotate.discard(self.target)


def _geom_type(ds):
    from .sources.layers import geom_type_of
    return geom_type_of(ds.schema().names)


def _resolve_crs_ref(cat: Catalog, ref: str):
    """A -proj CRS reference → {"fwd","inv","prj","latlong"}: a layer
    name (its recorded CRS), a .prj file path (parsed WKT), or an
    alias / proj4 string (reference getCrsInfo,
    src/commands/mapshaper-proj.js:95-108)."""
    from .stages.proj import parse_prj, resolve_projection, wkt_for_defn
    if ref in cat.layers:
        ent = cat.crs.get(ref)
        if ent is None:  # un-projected layer = wgs84
            from .stages.proj import _identity
            return {"fwd": _identity, "inv": _identity,
                    "prj": wkt_for_defn("wgs84"), "latlong": True}
        return ent
    if ref.lower().endswith(".prj") or os.path.exists(ref):
        text = open(ref, encoding="utf-8", errors="replace").read()
        pair = parse_prj(text)
        if pair is None:
            raise ValueError(f"unsupported .prj projection: {ref}")
        return {"fwd": pair[0], "inv": pair[1], "prj": text,
                "latlong": text.lstrip().startswith("GEOGCS")}
    fwd, inv = resolve_projection(ref)
    from .stages.proj import _identity
    return {"fwd": fwd, "inv": inv, "prj": wkt_for_defn(ref),
            "latlong": fwd is _identity}


def _snap_layer(ds, interval=None):
    """-i snap / snap-interval=: merge nearly-identical vertices across
    the whole layer (reference snapCoords,
    src/paths/mapshaper-snapping.js:15-27 — auto threshold is
    0.0025 x the average segment length).  Global pass on the
    collected layer (import-sized); the cell-partitioned variant
    (topo/snap.snap_points_ds) is the at-scale path."""
    import ray.data as rd

    from .sources.layers import nz
    from .topo.snap import snap_coords_by_interval
    names = ds.schema().names
    cols = ("rings_x", "rings_y") if "rings_x" in names else \
        (("part_x", "part_y") if "part_x" in names else None)
    if cols is None:
        return ds
    df = ds.to_pandas().sort_values("feature_id").reset_index(drop=True)
    xs, ys, spans = [], [], []
    pos = 0
    for row in df.to_dict("records"):
        for x, y in zip(nz(row[cols[0]]), nz(row[cols[1]])):
            x = np.asarray(x, float)
            y = np.asarray(y, float)
            spans.append((pos, len(x)))
            pos += len(x)
            xs.append(x)
            ys.append(y)
    if not xs:
        return ds
    xx = np.concatenate(xs)
    yy = np.concatenate(ys)
    if interval is None:
        dseg = np.concatenate(
            [np.hypot(np.diff(x), np.diff(y))
             for x, y in zip(xs, ys) if len(x) > 1] or
            [np.array([0.0])])
        interval = float(dseg.mean()) * 0.0025  # getAvgSegment * 0.0025
    snapped = snap_coords_by_interval(xx, yy, interval)
    it = iter(spans)
    for ri in range(len(df)):
        nx, ny = [], []
        for _ in nz(df.at[ri, cols[0]]):
            s, n = next(it)
            px, py = xx[s:s + n], yy[s:s + n]
            if snapped:
                # reference snapCoords: dedupCoords() after snapping
                keep = np.ones(len(px), dtype=bool)
                keep[1:] = (np.diff(px) != 0) | (np.diff(py) != 0)
                px, py = px[keep], py[keep]
            nx.append(px.tolist())
            ny.append(py.tolist())
        df.at[ri, cols[0]] = nx
        df.at[ri, cols[1]] = ny
    return rd.from_pandas(df)


def _merged_crs(cat: Catalog, names):
    """CRS for a merged layer (reference issue-166 semantics): layers
    with no recorded CRS are compatible with anything; mixing an
    explicit latlong CRS with an explicit projected one is an error;
    between incompatible explicit CRS, the FIRST layer's wins."""
    ents = [cat.crs[n] for n in names if n in cat.crs]
    if not ents:
        return None
    kinds = {e["latlong"] for e in ents}
    if len(kinds) > 1:
        raise ValueError("cannot merge projected and unprojected "
                         "datasets")
    return ents[0]


def _write_bbox_index(entries, out_dir):
    """-o bbox-index: sidecar bbox-index.json listing every written
    file's bbox (reference writeFiles bbox-index option)."""
    from .sources.geojson import _dataset_bbox
    from .sources.jsnum import js_json
    items = []
    for fname, ds in entries:
        bb = _dataset_bbox(ds)
        base = os.path.splitext(os.path.basename(str(fname)))[0]
        items.append({"bbox": [float(v) for v in (bb or [])],
                      "name": base})
    with open(os.path.join(out_dir or ".", "bbox-index.json"),
              "w") as f:
        f.write(js_json(items))


def _cmd_proj(cat: Catalog, args, opts):
    """-proj dest / from= / match=/source= (reference
    src/commands/mapshaper-proj.js:14-93: match/source and bare dest
    set the target CRS; from= overrides the source CRS; from= with no
    dest only ASSIGNS the CRS without transforming)."""
    from . import api
    mref = opts.get("match") or opts.get("source")
    dest = None
    if mref:
        dest = _resolve_crs_ref(cat, mref)
    elif args or opts.get("crs"):
        # a proj4 definition spans multiple +key=value tokens
        defn = " ".join(args) if args and args[0].startswith("+") \
            else (args[0] if args else opts.get("crs"))
        dest = _resolve_crs_ref(cat, str(defn).strip())
    src = None
    if "from" in opts:
        src = _resolve_crs_ref(cat, opts["from"])
    else:
        src = cat.crs.get(cat.target)
    if dest is None:
        if src is None:
            raise ValueError("-proj needs a destination CRS, match=, "
                             "or from=")
        # from= alone assigns the CRS (no coordinate change)
        cat.crs[cat.target] = src
        if src["latlong"]:
            cat.projected.discard(cat.target)
        else:
            cat.projected.add(cat.target)
        return
    if dest["fwd"] is None:
        raise ValueError("destination CRS has no forward transform")
    src_pair = None
    if src is not None and not src["latlong"]:
        if src["inv"] is None:
            raise ValueError("source CRS is not invertible; "
                             "cannot reproject from it")
        src_pair = (src["fwd"], src["inv"])
    if not (dest["latlong"] and src_pair is None):
        cat.replace(api.project_layer(
            cat.get(), (dest["fwd"], dest["inv"]), from_proj=src_pair,
            densify=bool(opts.get("densify"))))
    cat.crs[cat.target] = dest
    # reference exportCRS: projected (non-latlong) datasets export
    # GeoJSON with "crs":null
    if dest["latlong"]:
        cat.projected.discard(cat.target)
    else:
        cat.projected.add(cat.target)


def _load_source(cat: Catalog, opts, args):
    """Resolve a command's source= option / positional file to a
    Dataset (reference source-layer resolution,
    src/cli/mapshaper-run-command.js:359-381)."""
    from . import api
    src = opts.get("source") or (args[0] if args else None)
    if src is None:
        raise ValueError("command needs a source layer or file")
    if isinstance(src, str) and src in cat.layers:
        return cat.layers[src]
    kw = {}
    if src.lower().endswith((".csv", ".tsv", ".txt")):
        # -join string-fields= / field-types= reach the delim reader
        # (reference importJoinTable passes them through)
        if "string_fields" in opts:
            kw["string_fields"] = _num_list(opts["string_fields"], str)
        if "field_types" in opts:
            ft = {}
            for part in _num_list(opts["field_types"], str):
                k, _, t = part.partition(":")
                ft[k] = t or "str"
            kw["field_types"] = ft
    return api.i(src, **kw)


def _with_lonlat(points_ds):
    """Point layer → same rows plus __lon/__lat scalar columns (first
    point of each feature, the membership probe the reference uses,
    src/commands/mapshaper-spatial-join.js tests shp[0])."""
    from .sources.layers import nz

    def go(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__lon"] = [nz(v)[0] if len(nz(v)) else np.nan
                       for v in df["px"]]
        df["__lat"] = [nz(v)[0] if len(nz(v)) else np.nan
                       for v in df["py"]]
        return df
    return points_ds.map_batches(go, batch_format="pandas")


def _geom_join(tgt, src, opts):
    """Keyless -join: geometry dispatch like the reference
    (src/commands/mapshaper-join.js:24-31) — polygons→points attribute
    copy, points→polygons aggregation (calc=/fields=), point→point
    nearest-within-buffer."""
    from .ops.relational import broadcast_join, groupby_agg
    from .pipelines.overlay import _rows_to_features
    from .sources.layers import GEOM_COLS
    from .state.path_index import PathIndex
    from .stages.spatial_join import spatial_join

    tgt_gt = _geom_type(tgt)
    src_gt = _geom_type(src)
    fields = _num_list(opts["fields"], str) if "fields" in opts else None

    if tgt_gt == "point" and src_gt == "polygon":
        sdf = src.to_pandas()          # polygon side broadcast-small
        index = PathIndex.from_features(_rows_to_features(sdf))
        attrs = sdf.drop(columns=[c for c in GEOM_COLS["polygon"]
                                  if c in sdf.columns])
        attrs = attrs.rename(columns={"feature_id": "src_feature_id"})
        if fields:
            attrs = attrs[fields]
        attrs = attrs.assign(region_id=np.arange(len(attrs)))
        # temp names ("__…") so a pre-existing region_id/dist column on
        # the target is never clobbered-then-dropped by the cleanup
        out = spatial_join(_with_lonlat(tgt), index, attrs=attrs,
                           lon_col="__lon", lat_col="__lat",
                           out_col="__region_id")
        drop = ["__lon", "__lat", "__region_id"]
        return out.map_batches(
            lambda df, d=drop: df[[c for c in df.columns if c not in d]],
            batch_format="pandas")

    if tgt_gt == "polygon" and src_gt == "point":
        tdf = tgt.to_pandas()
        index = PathIndex.from_features(_rows_to_features(tdf))
        pts = spatial_join(_with_lonlat(src), index, how="inner",
                           lon_col="__lon", lat_col="__lat",
                           out_col="__region_id")
        if "calc" in opts:
            aggs = {k: (c or "__region_id", f) for k, (c, f)
                    in _parse_calc(opts["calc"]).items()}
        elif fields:
            aggs = {f: (f, "first") for f in fields}
        else:
            raise ValueError("points→polygons join needs calc= or "
                             "fields=")
        agg = groupby_agg(pts, keys=["__region_id"], aggs=aggs).to_pandas()
        agg["feature_id"] = tdf["feature_id"].to_numpy()[
            agg["__region_id"].to_numpy(dtype=np.int64)]
        return broadcast_join(tgt, agg.drop(columns=["__region_id"]),
                              on="feature_id", how="left")

    if tgt_gt == "point" and src_gt == "point":
        from .ops.knn import nearest_join
        radius = float(opts.get("max_distance", 1e-3))
        sdf = _with_lonlat(src).to_pandas()
        out = nearest_join(_with_lonlat(tgt), sdf, radius=radius,
                           x_col="__lon", y_col="__lat",
                           id_col="feature_id", out_id="__nbr",
                           out_dist="__dist")
        keep = sdf.drop(columns=[c for c in GEOM_COLS["point"] +
                                 ["__lon", "__lat"] if c in sdf.columns])
        if fields:
            keep = keep[["feature_id"] + fields]
        keep = keep.rename(columns={"feature_id": "__nbr"})
        out = broadcast_join(out, keep, on="__nbr", how="left")
        drop = ["__lon", "__lat", "__nbr", "__dist"]
        return out.map_batches(
            lambda df, d=drop: df[[c for c in df.columns if c not in d]],
            batch_format="pandas")

    raise ValueError(f"unsupported -join geometry: {src_gt}→{tgt_gt}")


# transform commands the reference applies to every target layer
_PER_LAYER_CMDS = {"each", "filter", "filter-fields", "filter_fields",
                   "rename-fields", "rename_fields", "filter-geom",
                   "filter_geom", "affine", "proj", "points",
                   "explode", "simplify", "uniq", "sort",
                   "filter-islands", "filter_islands",
                   "filter-slivers", "filter_slivers",
                   "dissolve", "innerlines", "lines", "clip", "erase",
                   "slice", "join", "data-fill", "data_fill",
                   "cluster", "subdivide", "style", "svg-style",
                   "svg_style"}


def run_commands(command_str, catalog: Catalog | None = None,
                 out_dir: str | None = None) -> Catalog:
    """Execute a mapshaper-style command string; returns the Catalog
    (inspect ``catalog.layers`` / read files written by -o).
    ``out_dir`` sets the directory for DERIVED output names (bare
    -o)."""
    from . import api
    from .ops import relational as rel

    cat = catalog or Catalog()
    if out_dir is not None:
        cat.out_dir = out_dir
    cmds = command_str if isinstance(command_str, list) \
        else parse_commands(command_str)

    # divideImportCommand (src/cli/mapshaper-commands.js:152-180): a
    # leading -i with SEVERAL files and no combine-files/merge-files
    # duplicates the whole command list once per file, each repetition
    # starting from a REPLACED catalog — N independent pipeline runs in
    # sequence.  Top-level invocations only (recursive re-entries pass
    # a catalog).
    if catalog is None and cmds and cmds[0]["name"] == "i":
        files0 = cmds[0]["args"]
        opts0 = cmds[0]["options"]
        if len(files0) >= 2 and not opts0.get("combine_files") \
                and not opts0.get("merge_files"):
            expanded = []
            for f in files0:
                expanded.append({"name": "i",
                                 "options": {**opts0, "replace": True},
                                 "args": [f]})
                expanded.extend(cmds[1:])
            cmds = expanded

    for cmd in cmds:
        name = cmd["name"]
        opts = cmd["options"]
        args = cmd["args"]

        # target= on any command retargets it (reference targetOpt on
        # nearly every command; -o keeps its own handling)
        if "target" in opts and name not in ("o", "target") \
                and opts["target"] in cat.layers:
            cat.target = opts["target"]
            cat.targets = [opts["target"]]

        # the reference applies per-layer transform commands to EVERY
        # current target layer (a multi-class import targets them all);
        # fan out by re-entering with a single target at a time
        if name in _PER_LAYER_CMDS and len(cat.targets) > 1 \
                and "target" not in opts:
            src_name = opts.get("source") or \
                (args[0] if name in ("clip", "erase", "slice", "join")
                 and args else None)
            saved = [n for n in cat.targets
                     if n in cat.layers and n != src_name]
            for t in saved:
                cat.target = t
                cat.targets = [t]
                run_commands([cmd], cat)
            cat.targets = saved
            cat.target = saved[-1] if saved else cat.target
            continue

        if name == "i":
            if opts.get("replace"):
                # per-file pipeline repetition: fresh catalog state
                cat.layers.clear()
                cat.crs.clear()
                cat.projected.clear()
                cat.no_rotate.clear()
                cat.targets = []
                cat.target = None
            loaded = []
            for path in args or [opts.get("files")]:
                lname = opts.get("name") if len(args) <= 1 else None
                lname = lname or \
                    os.path.splitext(os.path.basename(path))[0]
                ikw = {"encoding": opts["encoding"]} \
                    if "encoding" in opts else {}
                if "id_field" in opts and \
                        path.lower().endswith((".json", ".geojson",
                                               ".topojson")):
                    # import the Topo/GeoJSON id into this field
                    ikw["id_field"] = opts["id_field"]
                if opts.get("geometry_type") and \
                        path.lower().endswith((".json", ".geojson")):
                    # reference: a single layer of the requested class;
                    # other geometries import as null shapes
                    from .sources.geojson import read_geojson
                    want = {"point": "point", "line": "polyline",
                            "polyline": "polyline",
                            "polygon": "polygon"}[opts["geometry_type"]]
                    loaded.append(cat.add(
                        read_geojson(path, geom_class=want,
                                     keep_mismatch=True), lname))
                    cat.no_rotate.add(loaded[-1])
                    cat.src_file[loaded[-1]] = path
                    cat.last_input = path
                    continue
                if path.lower().endswith((".csv", ".tsv", ".txt")):
                    if "string_fields" in opts:
                        ikw["string_fields"] = _num_list(
                            opts["string_fields"], str)
                    if "field_types" in opts:
                        ikw["field_types"] = {
                            k: (t or "str") for k, _, t in
                            (p.partition(":") for p in _num_list(
                                opts["field_types"], str))}
                for suffix, lds in api.i_layers(path, **ikw):
                    # "::name" = full layer-name override (TopoJSON
                    # objects are layers named by their key)
                    full = suffix[2:] if suffix.startswith("::") \
                        else lname + suffix
                    loaded.append(cat.add(lds, full))
                    cat.no_rotate.add(loaded[-1])
                    cat.src_file[loaded[-1]] = path
                    cat.last_input = path
                if path.lower().endswith(".shp"):
                    # sibling .prj → recorded layer CRS (reference
                    # importShapefile reads it through parsePrj)
                    prj_path = path[:-4] + ".prj"
                    if os.path.exists(prj_path):
                        from .stages.proj import parse_prj
                        text = open(prj_path, encoding="utf-8",
                                    errors="replace").read()
                        pair = parse_prj(text)
                        latlong = text.lstrip().startswith("GEOGCS")
                        cat.crs[loaded[-1]] = {
                            "fwd": pair[0] if pair else None,
                            "inv": pair[1] if pair else None,
                            "prj": text, "latlong": latlong}
                        if not latlong:
                            cat.projected.add(loaded[-1])
            if "precision" in opts:
                # reference: coordinates round at IMPORT, before the
                # topology build
                for n in loaded:
                    cat.layers[n] = api.round_coords(
                        cat.layers[n], float(opts["precision"]))
            if opts.get("snap") or opts.get("auto_snap") or \
                    "snap_interval" in opts:
                si = (_parse_distance(opts["snap_interval"])
                      if "snap_interval" in opts else None)
                for n in loaded:
                    cat.layers[n] = _snap_layer(cat.layers[n], si)
            # the reference builds topology at IMPORT over ALL files of
            # one -i (combine-files shares arcs across files), rotating
            # every ring to its first junction; doing the same keeps
            # ring starts stable through subsetting commands
            # (-filter/-uniq) exactly like the reference, so exports
            # never re-rotate
            poly = [n for n in loaded
                    if "rings_x" in cat.layers[n].schema().names]
            if poly:
                from .ops.features import _topology_rotated_many
                for n, rds in zip(poly, _topology_rotated_many(
                        [cat.layers[n] for n in poly])):
                    cat.layers[n] = rds
            if opts.get("merge_files") and len(loaded) > 1:
                mcrs = _merged_crs(cat, loaded)
                for n in loaded:
                    cat.crs.pop(n, None)
                merged = api.merge_layers(
                    [cat.layers.pop(n) for n in loaded], force=True)
                mname = cat.add(merged, opts.get("name") or "merged")
                if mcrs is not None:
                    cat.crs[mname] = mcrs
                    if not mcrs["latlong"]:
                        cat.projected.add(mname)
            else:
                # every layer of this -i is a current target
                cat.targets = [n for n in loaded if n in cat.layers]
        elif name == "o":
            path = args[0] if args else opts.get("file")
            tgt = opts.get("target")
            if path is None:
                # bare -o: output name derives from the target layer's
                # source file (reference getOutputFileName), with the
                # extension swapped when format= changes it
                src = cat.src_file.get(
                    tgt if tgt not in (None, "*") else cat.target) \
                    or cat.last_input
                if src:
                    base = os.path.basename(src)
                    fmt = opts.get("format")
                    if fmt:
                        # reference getOutputFileName: topojson's
                        # default extension is .json
                        # (src/topojson/topojson-export.js:14)
                        ext = {"geojson": ".json",
                               "topojson": ".json",
                               "shapefile": ".shp", "shp": ".shp",
                               "csv": ".csv",
                               "tsv": ".tsv", "dbf": ".dbf",
                               "svg": ".svg",
                               "json": ".json"}.get(fmt)
                        if ext:
                            base = os.path.splitext(base)[0] + ext
                    path = os.path.join(cat.out_dir, base) \
                        if cat.out_dir else base
            all_layers = tgt in ("*",)
            if all_layers:
                tgt = None
            multi_tgt = None
            if tgt and "," in tgt:
                # -o target=a,b: explicit multi-layer selection
                # (reference findCommandTargets comma lists)
                multi_tgt = [n.strip() for n in tgt.split(",")
                             if n.strip() in cat.layers]
                tgt = None
            if opts.get("dry_run"):
                continue  # reference dry-run: plan only, write nothing
            if isinstance(path, str) and (path.endswith("/")
                                          or os.path.isdir(path)) \
                    and not path.rstrip("/").endswith("_dir"):
                # directory output: one file PER LAYER named after the
                # layer (the reference's multi-layer export naming —
                # mixed-type imports yield base1.json, base2.json, ...)
                fmt = opts.get("format", "geojson").lstrip(".")
                ext = {"geojson": "json", "json": "json",
                       "topojson": "topojson", "csv": "csv",
                       "tsv": "tsv", "svg": "svg",
                       "shapefile": "shp", "shp": "shp"}.get(fmt, fmt)
                if "extension" in opts:  # -o extension= override
                    ext = opts["extension"].lstrip(".")
                os.makedirs(path, exist_ok=True)
                names = multi_tgt if multi_tgt else \
                    (list(cat.layers) if all_layers else
                     ([tgt] if tgt else
                      ([n for n in cat.targets if n in cat.layers]
                       or list(cat.layers))))
                # route each layer through the SINGLE-FILE writer path
                # (recursive run_commands, the numbered multi-layer
                # export pattern) so precision= / prettify / rfc7946 /
                # id-field= / drop-table / encoding= / quantization
                # apply to directory exports exactly as the reference
                # does regardless of output destination
                saved_t, saved_ts = cat.target, list(cat.targets)
                sub_opts = {k: v for k, v in opts.items()
                            if k not in ("target", "file", "extension",
                                         "bbox_index")}
                entries = []
                for n in names:
                    out = os.path.join(path, f"{n}.{ext}")
                    run_commands([{"name": "o",
                                   "options": {**sub_opts, "target": n},
                                   "args": [out]}], cat)
                    entries.append((out, cat.get(n)))
                if opts.get("bbox_index"):
                    _write_bbox_index(entries, path)
                cat.target, cat.targets = saved_t, saved_ts
                continue
            sel_targets = multi_tgt if multi_tgt else \
                (list(cat.layers) if all_layers else
                 [n for n in cat.targets if n in cat.layers])
            if multi_tgt and len(multi_tgt) == 1:
                # comma list that resolved to one layer still selects
                # THAT layer, not the current target
                tgt = multi_tgt[0]
            is_svg_out = str(path).lower().endswith(".svg") or \
                opts.get("format", "").lstrip(".") == "svg"
            if tgt is None and len(sel_targets) > 1 and is_svg_out:
                # multi-layer SVG: one shared pixel transform, a <g
                # id=layer> per target (reference issue-247)
                from .sources.svg import write_svg_layers
                svg_kw0 = {k: float(opts[o]) for o, k in
                           (("width", "width"), ("height", "height"),
                            ("margin", "margin")) if o in opts}
                if "point_symbol" in opts:
                    svg_kw0["point_symbol"] = opts["point_symbol"]
                svg_layers = [(n, cat.get(n)) for n in sel_targets]
                if "precision" in opts or opts.get("rfc7946"):
                    svg_layers = [
                        (n, api.round_coords(
                            d, float(opts.get("precision", 0.000001))))
                        for n, d in svg_layers]
                write_svg_layers(svg_layers, path, rotate=False,
                                 **svg_kw0)
                continue
            is_topo_out = str(path).lower().endswith(".topojson") or \
                opts.get("format", "").lstrip(".") == "topojson"
            if tgt is None and len(sel_targets) > 1 and is_topo_out \
                    and opts.get("singles"):
                # -o singles: one single-object topology PER LAYER,
                # named <layer>.json (the reference's default topojson
                # extension), quantized independently
                from .sources.topojson import write_topojson_layer
                d = str(path) if (str(path).endswith("/")
                                  or os.path.isdir(path)) \
                    else (os.path.dirname(str(path)) or ".")
                os.makedirs(d, exist_ok=True)
                for n in sel_targets:
                    write_topojson_layer(
                        cat.get(n), os.path.join(d, f"{n}.json"),
                        object_name=n)
                continue
            if tgt is None and len(sel_targets) > 1 and is_topo_out:
                # multi-layer TopoJSON: every target layer becomes an
                # object in ONE topology with shared arcs
                from .sources.topojson import write_topojson_layers
                topo_kw2 = {}
                if "quantization" in opts:
                    topo_kw2["quantization"] = int(opts["quantization"])
                write_topojson_layers(
                    [(n, cat.get(n)) for n in sel_targets], path,
                    **topo_kw2)
                continue
            if tgt is None and len(sel_targets) > 1 and \
                    opts.get("combine_layers") and \
                    str(path).lower().endswith((".json", ".geojson")):
                from .sources.geojson import write_geojson_combined
                if "precision" in opts or opts.get("rfc7946"):
                    dss = [api.round_coords(
                        cat.get(n), float(opts.get("precision",
                                                   0.000001)))
                           for n in sel_targets]
                else:
                    dss = [cat.get(n) for n in sel_targets]
                write_geojson_combined(
                    dss, path,
                    # a combined file is projected when ANY exported
                    # layer is (reference: CRS comes from the dataset
                    # the layers live in, not the current target)
                    crs_null=any(n in cat.projected
                                 for n in sel_targets),
                    prettify=bool(opts.get("prettify")),
                    rfc7946=bool(opts.get("rfc7946")))
                continue
            if tgt is None and len(sel_targets) > 1:
                # several target layers, one output file: the reference
                # numbers the files (out.json -> out1.json, out2.json,
                # ...) UNLESS target=* named the layers, in which case
                # files carry the layer names; -o must not change the
                # current targets
                saved_t, saved_ts = cat.target, list(cat.targets)
                base, ext = os.path.splitext(str(path))
                sub_opts = {k: v for k, v in opts.items()
                            if k != "bbox_index"}
                entries = []
                for k, n in enumerate(
                        [x for x in sel_targets if x in cat.layers]):
                    out = os.path.join(os.path.dirname(str(path)) or
                                       ".", f"{n}{ext}") \
                        if all_layers else f"{base}{k + 1}{ext}"
                    run_commands([{"name": "o",
                                   "options": {**sub_opts, "target": n},
                                   "args": [out]}], cat)
                    entries.append((out, cat.get(n)))
                if opts.get("bbox_index"):
                    # ONE index listing every written file (reference
                    # createIndexFile)
                    _write_bbox_index(entries,
                                      os.path.dirname(str(path)))
                cat.target, cat.targets = saved_t, saved_ts
                continue
            ds = cat.get(tgt)
            # every layer is kept in reference ring order (rotated at
            # -i, or emitted in arc order by the kernels) — exports
            # write rings as stored
            rotate = False
            gj_kw = {k: opts[o] for o, k in
                     (("id_field", "id_field"), ("bbox", "bbox"),
                      ("drop_table", "drop_table"),
                      ("cut_table", "cut_table"),
                      ("geojson_type", "geojson_type"),
                      ("field_order", "field_order"),
                      ("prettify", "prettify"),
                      ("rfc7946", "rfc7946")) if o in opts}
            svg_kw = {k: float(opts[o]) for o, k in
                      (("width", "width"), ("height", "height"),
                       ("margin", "margin")) if o in opts}
            if "point_symbol" in opts:
                svg_kw["point_symbol"] = opts["point_symbol"]
            fo_kw = {"field_order": opts["field_order"]} \
                if "field_order" in opts else {}
            enc_kw = {"encoding": opts["encoding"]} \
                if "encoding" in opts else {}
            topo_kw = {}
            if "quantization" in opts:
                topo_kw["quantization"] = int(opts["quantization"])
            elif opts.get("no_quantization"):
                topo_kw["quantization"] = 0
            if (tgt or cat.target) in cat.projected:
                gj_kw["crs_null"] = True
            if "precision" in opts or opts.get("rfc7946"):
                # rings were rotated at import; rounding after matches
                # the reference's pipeline order (rfc7946 defaults to
                # 1e-6 precision)
                ds = api.round_coords(
                    ds, float(opts.get("precision", 0.000001)))
            if "format" in opts:
                # format= overrides extension-based dispatch but the
                # file is written to the path the user gave
                fmt = opts["format"].lstrip(".")
                writers = {
                    "geojson": api.write_geojson,
                    "json": api.write_geojson,
                    "csv": api.write_delim,
                    "tsv": api.write_delim,
                    "svg": api.write_svg,
                    "shapefile": api.write_shapefile,
                    "shp": api.write_shapefile,
                }
                if fmt in ("topojson",):
                    from .sources.topojson import write_topojson_layer
                    write_topojson_layer(
                        ds, path,
                        object_name=tgt or cat.target or "layer1",
                        **topo_kw)
                elif fmt in ("geojson", "json"):
                    writers[fmt](ds, path, rotate=rotate, **gj_kw)
                elif fmt in ("shapefile", "shp"):
                    writers[fmt](ds, path, rotate=rotate, **fo_kw)
                elif fmt == "svg":
                    api.write_svg(ds, path, rotate=rotate,
                                  name=tgt or cat.target or "layer1",
                                  **svg_kw)
                elif fmt in writers:  # csv / tsv
                    writers[fmt](ds, path, **fo_kw, **enc_kw)
                elif fmt == "parquet":
                    ds.write_parquet(path)
                else:
                    raise ValueError(f"unknown output format {fmt!r}")
            elif str(path).lower().endswith(".topojson"):
                from .sources.topojson import write_topojson_layer
                write_topojson_layer(
                    ds, path,
                    object_name=tgt or cat.target or "layer1",
                    **topo_kw)
            else:
                if str(path).lower().endswith(".svg"):
                    api.write_svg(ds, path, rotate=rotate,
                                  name=tgt or cat.target or "layer1",
                                  **svg_kw)
                elif str(path).lower().endswith((".json", ".geojson")):
                    api.write_geojson(ds, path, rotate=rotate, **gj_kw)
                elif str(path).lower().endswith((".csv", ".tsv")):
                    api.write_delim(ds, path, **fo_kw, **enc_kw)
                else:
                    api.o(ds, path, rotate=rotate, **fo_kw)
            # .shp export writes the layer's .prj sidecar (verbatim
            # input WKT, the matched layer's text, or the generated
            # alias WKT — reference exportPrjFile)
            is_shp = str(path).lower().endswith(".shp") or \
                opts.get("format", "").lstrip(".") in ("shp",
                                                       "shapefile")
            ent = cat.crs.get(tgt or cat.target)
            if is_shp and ent and ent.get("prj"):
                base = str(path)[:-4] if str(path).lower() \
                    .endswith(".shp") else str(path)
                with open(base + ".prj", "w", encoding="utf-8") as f:
                    f.write(ent["prj"])
            if opts.get("bbox_index"):
                _write_bbox_index([(path, ds)],
                                  os.path.dirname(str(path)))
        elif name == "target":
            tname = args[0] if args else opts.get("name")
            ttype = opts.get("type")
            if ttype:
                # select by geometry type, optionally narrowed by name
                # (reference target-test 'select target by type';
                # numbered suffixes come from mixed-type imports)
                want = {"point": "point", "points": "point",
                        "line": "polyline", "polyline": "polyline",
                        "polygon": "polygon"}.get(ttype, ttype)
                cands = [n for n in cat.layers
                         if (not tname or n == tname or
                             (n.startswith(tname) and
                              n[len(tname):].isdigit()))
                         and _geom_type(cat.layers[n]) == want]
                if not cands:
                    raise ValueError(f"no {want} layer matches "
                                     f"-target {tname or ''}")
                cat.target = cands[0]
            else:
                cat.target = tname
                if cat.target not in cat.layers:
                    raise ValueError(f"unknown layer {cat.target!r}")
            cat.targets = [cat.target]
        elif name == "rename-layers" or name == "rename_layers":
            new_names = _num_list(args[0], str) if args else []
            old = list(cat.layers)
            for o, n in zip(old, new_names):
                cat.layers[n] = cat.layers.pop(o)
            if cat.target in old:
                cat.target = new_names[old.index(cat.target)]
        elif name == "include":
            cat.defs.update(api.include_defs(args[0]))
        elif name == "filter":
            ds = cat.get()
            if args:
                ds = rel.filter_expr(ds, args[0], defs=cat.defs)
            if opts.get("remove_empty"):
                from .sources.layers import GEOM_COLS, nz
                gt = _geom_type(ds)
                gcol = GEOM_COLS[gt][0] if gt else None
                if gcol:
                    ds = ds.map_batches(
                        lambda df, g=gcol: df[[len(nz(v)) > 0
                                               for v in df[g]]],
                        batch_format="pandas")
            if not args and not opts.get("remove_empty"):
                raise ValueError("-filter needs an expression or "
                                 "remove-empty")
            cat.replace(ds)
        elif name == "each":
            # 'del foo' / 'delete foo' statements drop columns (the
            # reference's JS `delete foo` in -each expressions)
            parts = [p.strip() for p in re.split(r"[;,]", args[0])]
            dels = [re.sub(r"^(?:del|delete)\s+", "", p) for p in parts
                    if re.match(r"^(?:del|delete)\s+\w+$", p)]
            rest = "; ".join(p for p in parts
                             if not re.match(r"^(?:del|delete)\s+\w+$",
                                             p) and p)
            ds = cat.get()
            if dels:
                have = [c for c in dels if c in ds.schema().names]
                if have:
                    ds = ds.map_batches(
                        lambda df, cols=tuple(have):
                        df.drop(columns=list(cols)),
                        batch_format="pandas")
                if not rest:
                    cat.replace(ds)
                    continue
            assigns = _split_assignments(rest if dels else args[0])
            if "where" in opts:
                # reference -each where=: assignments apply only to the
                # guarded rows; other rows keep/NULL the columns
                guard = rel.compile_expression(opts["where"], cat.defs)
                fns = {k: rel.compile_expression(v, cat.defs)
                       for k, v in assigns.items()}

                def guarded(df, guard=guard, fns=fns):
                    m = np.asarray(guard(df), dtype=bool)
                    df = df.copy()
                    for k, fn in fns.items():
                        vals = np.asarray(fn(df))
                        if vals.ndim == 0:  # scalar expression
                            vals = np.broadcast_to(vals, len(df))
                        if k in df.columns:
                            df.loc[m, k] = vals[m]
                        else:
                            col = pd.Series([None] * len(df),
                                            index=df.index, dtype=object)
                            col[m] = vals[m]
                            df[k] = col
                    return df
                cat.replace(ds.map_batches(guarded, batch_format="pandas"))
            else:
                cat.replace(rel.each_expr(ds, assigns, defs=cat.defs))
        elif name in ("filter-fields", "filter_fields"):
            keep = _num_list(args[0], str)
            ds = cat.get()
            from .sources.layers import GEOM_COLS
            gt = _geom_type(ds)
            geom = (GEOM_COLS[gt] if gt else []) + ["feature_id"]
            cols = [c for c in ds.schema().names
                    if c in keep or c in geom]
            cat.replace(ds.select_columns(cols))
        elif name in ("rename-fields", "rename_fields"):
            ren = dict(p.split("=", 1) for p in args[0].split(","))
            # new=old pairs (reference grammar) -> rename old->new;
            # rename inside map_batches (Ray's Project op rejects the
            # pandas blocks many upstream stages emit).  The reference
            # builds each record from the rename map FIRST, so renamed
            # fields lead the record (mapFieldNames + utils.defaults).
            mapping = {old: new for new, old in ren.items()}
            dests = list(ren)

            def rename_lead(df, m=mapping, lead=dests):
                df = df.rename(columns=m)
                rest = [c for c in df.columns if c not in lead]
                return df[lead + rest]
            cat.replace(cat.get().map_batches(
                rename_lead, batch_format="pandas"))
        elif name == "simplify":
            amount = {}
            if "interval" in opts:
                amount["interval"] = float(opts["interval"])
            elif "resolution" in opts:
                amount["resolution"] = opts["resolution"]
            else:
                amount["pct"] = _pct(
                    args[0] if args else
                    opts.get("percentage", opts.get("value", "100%")))
            # reference defaults (getSimplifyMethod + useSpherical-
            # Simplify): bare -simplify = WEIGHTED visvalingam (0.7),
            # spherical for decimal-degree data; 'visvalingam' selects
            # the unweighted metric, 'planar' forces planar thresholds
            method = opts.get("method", "")
            dp = bool(opts.get("dp")) or method == "dp"
            vis = bool(opts.get("visvalingam")) or \
                method == "visvalingam"
            if method == "weighted_visvalingam":
                opts["weighted"] = True
            if "weighting" in opts:
                weighting = float(opts["weighting"])
            elif opts.get("weighted") or not (dp or vis):
                weighting = 0.7
            else:
                weighting = None
            if opts.get("planar") or opts.get("cartesian"):
                spherical = False
            elif opts.get("spherical"):
                spherical = True
            else:
                spherical = None   # auto-detect from bounds
            cat.replace(api.simplify_layer(
                cat.get(),
                method="dp" if dp else "visvalingam",
                keep_shapes=bool(opts.get("keep_shapes")),
                repair=not opts.get("no_repair"),
                spherical=spherical,
                weighting=None if dp else weighting,
                **amount), no_rotate=True)  # rings already in
            # reference arc order (assembled from the simplify
            # topology) — export must not re-rotate them
        elif name == "dissolve":
            key = args[0] if args else opts.get("fields",
                                                opts.get("field"))
            if _geom_type(cat.get()) is None:
                # DATA-ONLY layer: one record per key group in
                # first-appearance order (reference dissolve on CSV)
                cat.replace(rel.dissolve_table(
                    cat.get(), _num_list(key, str),
                    sum_fields=_num_list(opts["sum_fields"], str)
                    if "sum_fields" in opts else (),
                    copy_fields=_num_list(opts["copy_fields"], str)
                    if "copy_fields" in opts else ()))
                continue
            out = api.dissolve_layer(
                cat.get(), key,
                sum_fields=_num_list(opts["sum_fields"], str)
                if "sum_fields" in opts else (),
                copy_fields=_num_list(opts["copy_fields"], str)
                if "copy_fields" in opts else (),
                cell=float(opts["cell"]) if "cell" in opts else "auto",
                weight=opts.get("weight"),
                planar=bool(opts.get("planar")))
            if "calc" in opts and key:
                # -dissolve calc=: per-group aggregate expressions join
                # onto the dissolved features.  Distributive fns move
                # per-(key, batch) partials; median/mode/collect route
                # through the exact bucket-shuffle path.
                aggs = {k: (c or key, f)
                        for k, (c, f) in _parse_calc(opts["calc"]).items()}
                exact = {k: v for k, v in aggs.items()
                         if v[1] in ("median", "mode", "collect")}
                rest = {k: v for k, v in aggs.items() if k not in exact}
                tables = []
                if rest:
                    tables.append(
                        rel.groupby_agg(cat.get(), [key], rest)
                        .to_pandas())
                if exact:
                    tables.append(
                        rel.groupby_calc_exact(cat.get(), [key], exact)
                        .to_pandas())
                stats = tables[0]
                for t in tables[1:]:
                    stats = stats.merge(t, on=key, how="outer")
                out = rel.broadcast_join(out, stats, on=key)
            if opts.get("no_replace"):
                cat.add(out, opts.get("name"))
                cat.no_rotate.add(cat.target)
            else:
                cat.replace(out, no_rotate=True)
        elif name in ("clip", "erase", "slice"):
            ds = cat.get()
            if "bbox" in opts:
                cat.replace(api.clip_bbox(ds, _num_list(opts["bbox"])))
                continue
            src = _load_source(cat, opts, args)
            gt = _geom_type(ds)
            if gt == "point" and name in ("clip", "erase"):
                from .sources.layers import nz
                from .state.path_index import PathIndex
                cdf = src.to_pandas()
                feats = [[np.stack([np.asarray(x, float),
                                    np.asarray(y, float)], axis=1)
                          for x, y in zip(nz(row["rings_x"]),
                                          nz(row["rings_y"]))] or None
                         for row in cdf.to_dict("records")]
                idx = PathIndex.from_features(feats)
                fn = api.clip_points if name == "clip" \
                    else api.erase_points
                cat.replace(fn(ds, idx))
            elif gt == "polyline":
                cat.replace(api.clip_polylines(
                    ds, src, how="clip" if name == "clip" else name))
            elif name == "clip":
                cat.replace(api.clip_layer(ds, src), no_rotate=True)
            elif name == "erase":
                cat.replace(api.erase_layer(ds, src), no_rotate=True)
            else:
                raise ValueError("-slice supports polyline targets")
        elif name in ("innerlines", "lines"):
            from .pipelines.geometry import innerlines_layer
            out = innerlines_layer(cat.get(),
                                   inner_only=name == "innerlines")
            if opts.get("no_replace"):
                cat.add(out, opts.get("name"))
            else:
                cat.replace(out)
        elif name == "points":
            ds = cat.get()
            if opts.get("vertices"):
                out = api.points_vertices(ds)
            elif opts.get("endpoints"):
                out = api.points_endpoints(ds)
            elif opts.get("interpolated"):
                # reference dispatch keys on the 'interpolated' flag
                # only; interval= without it falls through to centroids
                # (createPointLayer, mapshaper-points.js:13-24)
                if "interval" not in opts:
                    raise ValueError(
                        "-points interpolated needs interval=")
                out = api.points_interpolated(
                    ds, float(opts["interval"]))
            elif "x" in opts and "y" in opts:
                out = api.points_from_columns(ds, opts["x"], opts["y"])
            elif opts.get("inner"):
                out = api.to_point_layer(ds, mode="inner")
            else:
                out = api.to_point_layer(ds)
            if opts.get("no_replace"):
                cat.add(out, opts.get("name"))
            else:
                cat.replace(out)
        elif name == "proj":
            _cmd_proj(cat, args, opts)
        elif name == "sort":
            ds = rel.each_expr(cat.get(), {"__sort_key": args[0]},
                               defs=cat.defs)
            ds = ds.sort("__sort_key",
                         descending=bool(opts.get("descending")))
            cat.replace(ds.map_batches(
                lambda df: df.drop(columns="__sort_key"),
                batch_format="pandas"))
        elif name == "uniq":
            ds = cat.get()
            order_col = "feature_id"
            drop = ["__uniq_key"]
            if "feature_id" not in ds.schema().names:
                # data-only tables order by ROW POSITION
                ds = rel.with_row_position(ds)
                order_col = "__pos"
                drop.append("__pos")
            ds = rel.each_expr(ds, {"__uniq_key": args[0]},
                               defs=cat.defs)
            out = rel.uniq_first(ds, ["__uniq_key"], [order_col],
                                 max_count=int(opts.get("max_count", 1)))
            if order_col == "__pos":
                out = out.sort("__pos")
            cat.replace(out.map_batches(
                lambda df: df.drop(columns=drop),
                batch_format="pandas"))
        elif name == "calc":
            import ray.data as rd
            ds = cat.get()
            if "where" in opts:
                ds = rel.filter_expr(ds, opts["where"], defs=cat.defs)
            spec = args[0]
            if "(" in spec:
                # aggregate expression list: 'a = sum(v), n = count()'
                out = rel.calc_exprs(ds, spec, defs=cat.defs)
            else:
                # bare column: the full stats block
                out = rel.calc_stats(ds, spec)
            cat.add(rd.from_pandas(out), "calc")
        elif name == "join":
            src = _load_source(cat, opts, args)
            if "keys" not in opts:
                cat.replace(_geom_join(cat.get(), src, opts))
                continue
            keys = _num_list(opts["keys"], str)
            sdf = src.to_pandas()
            if keys[0] != keys[-1] or len(keys) > 1:
                sdf = sdf.rename(columns={keys[-1]: keys[0]})
            if "where" in opts:
                guard = rel.compile_expression(opts["where"], cat.defs)
                sdf = sdf[np.asarray(guard(sdf), dtype=bool)]
            if "calc" in opts:
                cat.replace(rel.broadcast_join_calc(
                    cat.get(), sdf, on=keys[0],
                    calc={k: (c or keys[0], f) for k, (c, f)
                          in _parse_calc(opts["calc"]).items()}))
                continue
            if "fields" in opts:
                sdf = sdf[[keys[0]] + _num_list(opts["fields"], str)]
            # reference -join is a LEFT join: unmatched targets keep
            # their rows with absent fields
            cat.replace(rel.broadcast_join(cat.get(), sdf, on=keys[0],
                                           how="left"))
        elif name == "split":
            key = args[0] if args else opts.get("field")
            out_dir = opts.get("out_dir") or "/tmp/mapshaper_ray_split"
            api.split_by_field(cat.get(), key, out_dir)
        elif name in ("split-on-grid", "split_on_grid"):
            if args:
                cols, rows = _num_list(args[0], int)
            else:
                cols = int(opts["cols"])
                rows = int(opts["rows"])
            cat.replace(api.split_on_grid(
                cat.get(), cols, rows,
                id_field=opts.get("id_field", "cell")))
        elif name in ("merge-layers", "merge_layers"):
            names = _num_list(opts["layers"], str) if "layers" in opts \
                else list(cat.layers)
            mcrs = _merged_crs(cat, names)
            merged = api.merge_layers([cat.layers[n] for n in names],
                                      force=bool(opts.get("force")))
            mname = cat.add(merged, opts.get("name") or "merged")
            if mcrs is not None:
                cat.crs[mname] = mcrs
                if not mcrs["latlong"]:
                    cat.projected.add(mname)
        elif name == "graticule":
            cat.add(api.graticule(), "graticule")
        elif name == "rectangle":
            if "bbox" in opts:
                bb = _num_list(opts["bbox"])
            else:
                # bbox of the source= layer (or the current target)
                from .pipelines.overlay import layer_bbox
                src = opts.get("source") or cat.target
                if src not in cat.layers:
                    raise ValueError("-rectangle needs bbox= or a "
                                     "source layer")
                bb = list(layer_bbox(cat.layers[src]))
            if "offset" in opts:
                off = _parse_distance(opts["offset"])
                bb = [bb[0] - off, bb[1] - off, bb[2] + off,
                      bb[3] + off]
            cat.add(api.rectangle(bb), opts.get("name") or "rectangle")
        elif name in ("point-grid", "point_grid"):
            c, r = _num_list(args[0], int)
            cat.add(api.point_grid(c, r), "point_grid")
        elif name in ("polygon-grid", "polygon_grid"):
            c, r = _num_list(args[0], int)
            cat.add(api.polygon_grid(c, r), "polygon_grid")
        elif name == "affine":
            shift = _num_list(opts.get("shift", "0,0"))
            if "anchor" in opts:
                anchor = tuple(_num_list(opts["anchor"]))
            else:
                # reference getAffineAnchor: dataset bbox center
                from .pipelines.overlay import layer_bbox
                bb = layer_bbox(cat.get())
                anchor = ((bb[0] + bb[2]) * 0.5, (bb[1] + bb[3]) * 0.5)
            cat.replace(api.affine(
                cat.get(), shift=tuple(shift),
                scale=float(opts.get("scale", 1.0)),
                rotate_deg=float(opts.get("rotate", 0.0)),
                anchor=anchor))
        elif name in ("filter-islands", "filter_islands"):
            from .pipelines.geometry import filter_islands_layer
            cat.replace(filter_islands_layer(
                cat.get(),
                min_area=_parse_area(opts["min_area"])
                if "min_area" in opts else None,
                min_vertices=int(opts["min_vertices"])
                if "min_vertices" in opts else None))
        elif name in ("filter-slivers", "filter_slivers"):
            cat.replace(api.filter_slivers(
                cat.get(),
                min_area=float(opts["min_area"])
                if "min_area" in opts else None))
        elif name in ("dissolve2", "mosaic", "clean", "polygons"):
            # mosaic-substrate commands: in-process kernel over the
            # collected layer (the distributed shape is
            # pipelines.geometry.dissolve2_pipeline's cell shuffle)
            import ray.data as rd

            from .sources.layers import nz
            from .topo import mosaic as mz
            if name == "dissolve2":
                # route to the distributed substrate BEFORE collecting
                # the layer: explicit cell=, or auto above the row
                # threshold (gap options keep the exact local kernel —
                # gap areas are judged per cell piece on that path)
                from .pipelines.overlay import (AUTO_DISTRIBUTE_ROWS,
                                                dissolve2_layer)
                key0 = args[0] if args else opts.get("fields")
                has_gap = ("min_gap_area" in opts
                           or "gap_fill_area" in opts)
                if "cell" in opts or (
                        not has_gap
                        and cat.get().count() >= AUTO_DISTRIBUTE_ROWS):
                    cat.replace(dissolve2_layer(
                        cat.get(), key0,
                        cell=float(opts["cell"]) if "cell" in opts
                        else "auto",
                        gap_max_area=float(opts.get("gap_fill_area",
                                                    0))),
                        no_rotate=True)
                    continue
            df = cat.get().to_pandas().sort_values("feature_id") \
                .reset_index(drop=True)
            if name == "polygons":
                parts = [np.stack([np.asarray(x, float),
                                   np.asarray(y, float)], axis=1)
                         for row in df.to_dict("records")
                         for x, y in zip(nz(row.get("part_x")),
                                         nz(row.get("part_y")))]
                tiles = mz.polygons_from_lines(
                    parts, close_gaps=float(opts.get("gap_tolerance", 0)))
                rows = [{"feature_id": i,
                         "rings_x": [t["x"].tolist()],
                         "rings_y": [t["y"].tolist()],
                         "ring_poly": [0]} for i, t in enumerate(tiles)]
                cat.replace(rd.from_items(rows), no_rotate=True)
                continue
            feats = [[np.stack([np.asarray(x, float),
                                np.asarray(y, float)], axis=1)
                      for x, y in zip(nz(row["rings_x"]),
                                      nz(row["rings_y"]))]
                     for row in df.to_dict("records")]
            if name == "mosaic":
                tiles = mz.polygon_mosaic(feats)
                rows = [{"feature_id": i,
                         "rings_x": [np.asarray(t["x"]).tolist()],
                         "rings_y": [np.asarray(t["y"]).tolist()],
                         "ring_poly": [0]} for i, t in enumerate(tiles)]
                cat.replace(rd.from_items(rows), no_rotate=True)
                continue
            key = args[0] if args else opts.get("fields")
            if name == "clean":
                # -clean: erase overlaps / fill gaps but keep features
                keys = [str(i) for i in df["feature_id"]]
            elif key is None:
                # keyless -dissolve2 merges EVERYTHING (like -dissolve)
                keys = ["_all"] * len(df)
            else:
                keys = [str(v) for v in df[key]]
            # reference-exact kernel (topo/refclip.py dissolve2 port:
            # mosaic tiles assigned by arc index, sliver-gap fill)
            from .pipelines.overlay import (_rewound_features,
                                            _rings_to_row)
            from .topo.refclip import dissolve2_features
            mga = _parse_area(opts["min_gap_area"]) \
                if "min_gap_area" in opts else \
                (_parse_area(opts["gap_fill_area"])
                 if "gap_fill_area" in opts else None)
            out = dissolve2_features(_rewound_features(df), keys,
                                     min_gap_area=mga)
            items = sorted(out.items(), key=(lambda kv: int(kv[0]))
                           if name == "clean" else None)
            rows = []
            attr_cols = [c for c in df.columns
                         if c not in ("feature_id", "rings_x",
                                      "rings_y", "ring_poly")]
            for i, (k, rings) in enumerate(items):
                gx, gy, gp = _rings_to_row(rings) if rings \
                    else ([], [], [])
                row = {"feature_id": i, "rings_x": gx, "rings_y": gy,
                       "ring_poly": gp}
                if name == "clean":
                    # -clean keeps each feature's original attributes
                    src = df[df["feature_id"] == int(k)].iloc[0]
                    for c in attr_cols:
                        row[c] = src[c]
                elif key is not None:
                    row[key] = k
                # keyless -dissolve2 keeps no data table (the reference
                # then exports a bare GeometryCollection)
                rows.append(row)
            cat.replace(rd.from_items(rows), no_rotate=True)
        elif name == "explode":
            cat.replace(api.explode(cat.get(),
                                    naive=bool(opts.get("naive"))))
        elif name == "stitch":
            cat.replace(api.stitch_spherical(cat.get()))
        elif name == "info":
            info = api.layer_info(cat.get())
            print(f"[info] {cat.target}: {info}")
        elif name == "shape":
            # src/commands/mapshaper-shape.js:3-38 — coordinate list
            # (+relative offsets) becomes a one-feature polygon (ring
            # closes or closed flag) or polyline layer
            import ray.data as rd
            coords = _num_list(opts.get("coordinates") or args[0])
            pts = [(coords[i], coords[i + 1])
                   for i in range(0, len(coords), 2)]
            if "offsets" in opts:
                offs = _num_list(opts["offsets"])
                x, y = pts[-1]
                for i in range(0, len(offs), 2):
                    x, y = x + offs[i], y + offs[i + 1]
                    pts.append((x, y))
            is_ring = len(pts) >= 4 and pts[0] == pts[-1]
            closed = ("closed" in opts and _bool_opt(opts["closed"])) \
                or "closed" in args
            if not is_ring and closed and len(pts) >= 3:
                pts.append(pts[0])
                is_ring = True
            xs = [p[0] for p in pts]
            ys = [p[1] for p in pts]
            if is_ring:
                ds = rd.from_items([{"feature_id": 0, "rings_x": [xs],
                                     "rings_y": [ys], "ring_poly": [0]}])
            else:
                ds = rd.from_items([{"feature_id": 0, "part_x": [xs],
                                     "part_y": [ys]}])
            cat.add(ds, opts.get("name") or "shape")
        elif name in ("filter-geom", "filter_geom"):
            from .ops.features import filter_bbox
            cat.replace(filter_bbox(cat.get(),
                                    *_num_list(opts["bbox"])))
        elif name == "colorizer":
            # registers a named vectorized value→color function usable
            # in later -each/-filter expressions (the reference injects
            # it into the expression env, mapshaper-colorizer.js:3-37)
            from .ops.colorizer import make_colorizer
            if "name" not in opts:
                raise ValueError("-colorizer needs name=")
            cat.defs[opts["name"]] = make_colorizer(
                colors=_num_list(opts["colors"], str),
                breaks=(_num_list(opts["breaks"])
                        if "breaks" in opts else None),
                categories=(_num_list(opts["categories"], str)
                            if "categories" in opts else None),
                other=opts.get("other"),
                nodata=opts.get("nodata", "white"))
        elif name in ("style", "svg-style", "svg_style"):
            # -style is the modern name; svg-style the old alias
            # (reference options registry .oldAlias("svg-style"))
            from .ops.colorizer import svg_style
            styles = {k: v for k, v in opts.items() if k != "where"}
            if "where" in opts:
                guard = rel.compile_expression(opts["where"], cat.defs)

                def style_where(df, guard=guard, styles=styles):
                    m = np.asarray(guard(df), dtype=bool)
                    df = df.copy()
                    for k, v in styles.items():
                        vals = (df[v] if isinstance(v, str)
                                and v in df.columns else v)
                        if k not in df.columns:
                            df[k] = None
                        df.loc[m, k] = vals[m] if hasattr(vals, "__len__") \
                            and not isinstance(vals, str) else vals
                    return df
                cat.replace(cat.get().map_batches(style_where,
                                                  batch_format="pandas"))
            else:
                cat.replace(svg_style(cat.get(), **styles))
        elif name == "cluster":
            # src/commands/mapshaper-cluster.js:15-21: assign cluster
            # ids by greedy centroid-distance agglomeration over the
            # shared-border neighbor graph
            from .ops.features import add_polygon_metrics, centroids
            from .ops.neighbors import (cluster_polygons,
                                        polygon_neighbor_edges)
            ds = cat.get()
            edges = polygon_neighbor_edges(ds)
            grp = opts.get("group_by")
            caps = {k: float(opts[k]) for k in
                    ("max_width", "max_height", "max_area")
                    if k in opts}
            cols = ["feature_id", "cx", "cy", "area"] + ([grp] if grp
                                                         else [])
            if "max_width" in caps or "max_height" in caps:
                from .ops.split import feature_bbox
                cols += ["__xmin", "__ymin", "__xmax", "__ymax"]
                base = centroids(add_polygon_metrics(ds)) \
                    .map_batches(feature_bbox, batch_format="pandas")
            else:
                base = centroids(add_polygon_metrics(ds))
            cent = base.map_batches(
                lambda df, c=cols: df[c], batch_format="pandas") \
                .to_pandas().rename(columns={"feature_id": "fid"})
            if grp:
                cent = cent.rename(columns={grp: "group"})
            groups = cluster_polygons(
                cent, edges, pct=_pct(opts.get("pct", "100%")),
                group_by="group" if grp else None, **caps)
            idf = opts.get("id_field", "cluster")

            def tag_cluster(df, groups=groups, idf=idf):
                df = df.copy()
                df[idf] = [groups.get(f) for f in df["feature_id"]]
                return df
            cat.replace(ds.map_batches(tag_cluster,
                                       batch_format="pandas"))
        elif name in ("data-fill", "data_fill"):
            from .ops.neighbors import data_fill, polygon_neighbor_edges
            field = opts.get("field") or args[0]
            ds = cat.get()
            edges = polygon_neighbor_edges(ds)
            vdf = ds.map_batches(lambda df, f=field: df[["feature_id", f]],
                                 batch_format="pandas").to_pandas()
            vals = {f: (None if pd.isna(v) else v)
                    for f, v in zip(vdf["feature_id"], vdf[field])}
            filled = data_fill(vals, edges,
                               postprocess=bool(opts.get("postprocess")))

            def tag_fill(df, filled=filled, field=field):
                df = df.copy()
                df[field] = [filled.get(f) for f in df["feature_id"]]
                return df
            cat.replace(ds.map_batches(tag_fill, batch_format="pandas"))
        elif name == "subdivide":
            # general calc-expression surface (mapshaper-subdivide.js);
            # the common 'count() > N' form keeps its cheap
            # layer_info-only fast path
            from .ops.split import subdivide, subdivide_expr
            expr = args[0] if args else opts.get("expression", "")
            m = re.match(r"\s*count\(\)\s*>\s*(\d+)\s*$", expr)
            base = cat.target or "layer"
            parts = subdivide(cat.get(), int(m.group(1))) if m else \
                subdivide_expr(cat.get(), expr, defs=cat.defs)
            for i, (bbox, part) in enumerate(parts):
                cat.add(part, f"{base}_{i + 1}")
        elif name == "inspect":
            # src/commands/mapshaper-inspect.js:3-12 — report matching
            # feature(s); single match stores the full record
            guard = rel.compile_expression(args[0], cat.defs)
            matched = cat.get().map_batches(
                lambda df: df[np.asarray(guard(df), dtype=bool)],
                batch_format="pandas").to_pandas()
            if len(matched) == 1:
                cat.last_inspect = matched.iloc[0].to_dict()
            else:
                cat.last_inspect = (f"Expression matched {len(matched)} "
                                    "features. Select one feature for "
                                    "details")
        elif name == "drop":
            geomc = {"feature_id", "rings_x", "rings_y", "ring_poly",
                     "part_x", "part_y", "px", "py", "__fields"}
            if opts.get("geometry"):
                # -drop geometry: null every shape, keep the data
                ds = cat.get()
                coord_cols = [c for c in ds.schema().names
                              if c in geomc - {"feature_id",
                                               "__fields"}]

                def clear_geom(df: pd.DataFrame) -> pd.DataFrame:
                    df = df.copy()
                    for c in coord_cols:
                        df[c] = [[] for _ in range(len(df))]
                    return df
                cat.replace(ds.map_batches(clear_geom,
                                           batch_format="pandas"))
            elif "fields" in opts:
                ds = cat.get()
                if opts["fields"].strip() == "*":
                    keep = [c for c in ds.schema().names if c in geomc]
                else:
                    fields = set(_num_list(opts["fields"], str))
                    keep = [c for c in ds.schema().names
                            if c not in fields]
                cat.replace(ds.select_columns(keep))
            else:
                cat.layers.pop(cat.target)
                cat.targets = [t for t in cat.targets
                               if t != cat.target]
                cat.target = next(iter(cat.layers), None)
        else:
            raise ValueError(f"unknown or unsupported command -{name}")
    return cat


def apply_commands(command_str, inputs: dict | None = None) -> dict:
    """In-memory pipeline — the reference's ``api.applyCommands``
    (src/cli/mapshaper-commands.js:25): ``inputs`` maps file names to
    str/bytes content; every file the command string writes (``-o``)
    is returned as ``{name: bytes}`` without touching the caller's
    filesystem.  Relative paths in the command string resolve inside a
    temporary directory seeded with ``inputs`` (so ``-i``, ``-join``,
    ``-include``, ``-proj match=`` etc. all see them)."""
    import os
    import tempfile

    inputs = inputs or {}
    with tempfile.TemporaryDirectory() as td:
        for name, content in inputs.items():
            p = os.path.join(td, name)
            os.makedirs(os.path.dirname(p), exist_ok=True)
            if isinstance(content, (bytes, bytearray)):
                with open(p, "wb") as f:
                    f.write(content)
            else:
                with open(p, "w", encoding="utf8") as f:
                    f.write(content)
        # resolve paths against the temp dir WITHOUT chdir (Ray workers
        # spawn with the driver's cwd — a chdir breaks module imports
        # in lazily-started workers): an arg is an input file iff it
        # matches an ``inputs`` key; every relative -o target lands in
        # the temp dir
        import copy
        cmds = copy.deepcopy(command_str) \
            if isinstance(command_str, list) \
            else parse_commands(command_str)
        for cmd in cmds:
            if cmd["name"] == "o":
                cmd["args"] = [a if os.path.isabs(a)
                               else os.path.join(td, a)
                               for a in cmd["args"]]
                if isinstance(cmd["options"].get("file"), str) and \
                        not os.path.isabs(cmd["options"]["file"]):
                    cmd["options"]["file"] = os.path.join(
                        td, cmd["options"]["file"])
            else:
                cmd["args"] = [os.path.join(td, a) if a in inputs
                               else a for a in cmd["args"]]
                for k in ("match", "source", "file"):
                    v = cmd["options"].get(k)
                    if isinstance(v, str) and v in inputs:
                        cmd["options"][k] = os.path.join(td, v)
        run_commands(cmds, out_dir=td)
        out = {}
        for root, _, files in os.walk(td):
            for fn in files:
                full = os.path.join(root, fn)
                rel = os.path.relpath(full, td)
                with open(full, "rb") as f:
                    data = f.read()
                if rel in inputs:
                    # an output may overwrite its input name (the
                    # reference's bare -o does); only UNCHANGED input
                    # files are excluded from the result
                    src = inputs[rel]
                    if not isinstance(src, (bytes, bytearray)):
                        src = src.encode("utf8")
                    if data == src:
                        continue
                out[rel] = data
        return out
