"""Shapefile (.shp/.shx/.dbf) source/sink.

Capability parity with the reference's readers/writers
(src/shapefile/shp-reader.js:23 record iterator; shp-import.js;
shp-export.js:9; dbf-reader.js:299-312 typed decode C/N/F/I/L/D;
dbf-writer.js:29 width-scan encode) built from the public ESRI
shapefile / dBASE specs.  Shape types: 1 point, 3 polyline, 5 polygon
(2D).  Distribution: the .shx offset table gives perfect byte-range
record splits — ``read_shapefile`` shards record ranges across read
tasks; the writer is a single-writer sink (the format is
offset-dependent, SURVEY.md §2.1 Shapefile writer row).
"""

from __future__ import annotations
from .layers import nz as _nz

import struct

import numpy as np
import pyarrow as pa

SHP_POINT = 1
SHP_POLYLINE = 3
SHP_POLYGON = 5
SHP_MULTIPOINT = 8

# Z (11-18) and M (21-28) variants parse as their 2D base type — the
# reference's kType table (src/shapefile/shp-common.js); Z/M arrays
# trail the XY block and are skipped
_BASE_TYPE = {1: 1, 11: 1, 21: 1, 3: 3, 13: 3, 23: 3,
              5: 5, 15: 5, 25: 5, 8: 8, 18: 8, 28: 8}


# ---------------------------------------------------------------------------
# low-level parse

def parse_shp_header(buf: bytes):
    code = struct.unpack(">i", buf[0:4])[0]
    if code != 9994:
        raise ValueError("not a shapefile")
    shp_type = struct.unpack("<i", buf[32:36])[0]
    bbox = struct.unpack("<4d", buf[36:68])
    return shp_type, bbox


def parse_shx(buf: bytes):
    """.shx → (offsets_bytes, lengths_bytes) per record."""
    n = (len(buf) - 100) // 8
    arr = np.frombuffer(buf, dtype=">i4", offset=100, count=n * 2)
    return arr[0::2] * 2, arr[1::2] * 2


def parse_record(content: bytes):
    """record content bytes → (shape_type, parts) where parts is a list
    of (n,2) float arrays (empty list = null shape)."""
    st = struct.unpack("<i", content[0:4])[0]
    if st == 0:
        return st, []
    base = _BASE_TYPE.get(st)
    if base == SHP_POINT:
        x, y = struct.unpack("<2d", content[4:20])
        return base, [np.array([[x, y]])]
    if base == SHP_MULTIPOINT:
        n_points = struct.unpack("<i", content[36:40])[0]
        pts = np.frombuffer(content, dtype="<f8", offset=40,
                            count=n_points * 2).reshape(-1, 2)
        return base, [pts]
    if base in (SHP_POLYLINE, SHP_POLYGON):
        n_parts, n_points = struct.unpack("<2i", content[36:44])
        parts = np.frombuffer(content, dtype="<i4", offset=44, count=n_parts)
        pts = np.frombuffer(content, dtype="<f8", offset=44 + 4 * n_parts,
                            count=n_points * 2).reshape(-1, 2)
        bounds = np.append(parts, n_points)
        return base, [pts[bounds[i]:bounds[i + 1]] for i in range(n_parts)]
    raise NotImplementedError(f"shape type {st}")


# ---------------------------------------------------------------------------
# DBF

def parse_dbf(buf: bytes, encoding: str | None = None):
    """.dbf bytes → (fields, records) with typed decode:
    C→str, N/F→float/int, L→bool, D→str yyyymmdd (reference type map,
    src/shapefile/dbf-reader.js:299-312).

    ``encoding=None`` resolves the text codec like the reference
    (src/shapefile/dbf-import.js + mapshaper-encoding-detection.js):
    the header's language driver id first, then sample-based detection
    over character fields, then latin-1."""
    from .encodings import LDID_CODECS, detect_encoding, \
        standardize_encoding
    n_rec = struct.unpack("<i", buf[4:8])[0]
    hdr_size, rec_size = struct.unpack("<2H", buf[8:12])
    fields = []
    pos = 32
    while buf[pos] != 0x0D:
        # keep raw name bytes; decoded latin-1 below like the reference
        # (field names may be non-ascii, e.g. utf8-property.dbf)
        name = buf[pos:pos + 11].split(b"\x00")[0]
        ftype = chr(buf[pos + 11])
        flen = buf[pos + 16]
        fdec = buf[pos + 17]
        fields.append((name, ftype, flen, fdec))
        pos += 32
    if encoding is None:
        ldid = buf[29]
        if ldid in LDID_CODECS:
            encoding = LDID_CODECS[ldid]
        else:
            # sample up to 32 records' character fields
            samples = []
            for r in range(min(n_rec, 32)):
                off = hdr_size + r * rec_size + 1
                p = off
                for _, ftype, flen, _ in fields:
                    if ftype == "C":
                        raw = buf[p:p + flen].rstrip(b"\x00 ")
                        if raw:
                            samples.append(raw)
                    p += flen
            encoding = detect_encoding(samples) or "latin-1"
    codec = standardize_encoding(encoding)
    # the reference reads field NAMES with readCString (one byte per
    # char = latin-1), regardless of the record encoding — match it,
    # mojibake and all (dbf-reader.js:226)
    fields = [(n.decode("latin-1") if isinstance(n, bytes)
               else n, t, ln, dc) for n, t, ln, dc in fields]
    records = []
    for r in range(n_rec):
        off = hdr_size + r * rec_size
        # NB: deletion-flagged rows (b"*") are read anyway — the .shp
        # pairs records positionally, so skipping one would shift every
        # later feature's attributes off by one
        row = {}
        p = off + 1
        for name, ftype, flen, fdec in fields:
            raw = buf[p:p + flen]
            p += flen
            s = raw.rstrip(b"\x00").decode(codec,
                                           errors="replace").strip()
            if ftype == "C":
                row[name] = s
            elif ftype in ("N", "F"):
                row[name] = (None if not s else
                             (int(s) if fdec == 0 and "." not in s
                              else float(s)))
            elif ftype == "L":
                row[name] = s in ("Y", "y", "T", "t") if s else None
            elif ftype == "D":
                row[name] = s or None
            elif ftype == "I":
                row[name] = struct.unpack("<i", raw)[0]
            else:
                row[name] = None
        records.append(row)
    return fields, records


def write_dbf(path: str, records: list[dict]):
    """Two-pass: scan for field widths (reference Dbf.exportRecords,
    src/shapefile/dbf-writer.js:29), then fixed-width encode."""
    fields = []
    names: list[str] = []
    for r in records:
        for k in r:
            if k not in names:
                names.append(k)
    for name in names:
        vals = [r.get(name) for r in records]
        nn = [v for v in vals if v is not None]
        if all(isinstance(v, bool) for v in nn) and nn:
            fields.append((name, "L", 1, 0))
        elif all(isinstance(v, (int, np.integer)) and not isinstance(v, bool)
                 for v in nn) and nn:
            w = max((len(str(int(v))) for v in nn), default=1)
            fields.append((name, "N", max(w, 1), 0))
        elif all(isinstance(v, (int, float, np.floating, np.integer))
                 and not isinstance(v, bool) for v in nn) and nn:
            # reference getNumericFieldInfo: decimals = fewest needed
            # to represent every value (scan with a scaled epsilon),
            # width = longest toFixed rendering
            decimals = 0
            k = 1.0
            eps = 1e-15
            power = 1.0
            lo = hi = 0.0
            for v in nn:         # single interleaved pass, like the JS
                v = float(v)
                if v < lo or v > hi:
                    lo, hi = min(lo, v), max(hi, v)
                    while abs(v) >= power:
                        power *= 10
                        eps *= 10
                while abs(round(v * k) - v * k) > eps and decimals < 15:
                    decimals += 1
                    k *= 10
            strs = [format(float(v), f".{decimals}f") for v in nn]
            fields.append((name, "N", max(len(s) for s in strs), decimals))
        else:
            w = max((len(str(v).encode("latin-1", "replace")) for v in nn),
                    default=1)
            fields.append((name, "C", min(max(w, 1), 254), 0))

    rec_size = 1 + sum(f[2] for f in fields)
    hdr_size = 32 + 32 * len(fields) + 1
    out = bytearray()
    out += struct.pack("<B3Bi2H20x", 0x03, 95, 1, 1, len(records),
                       hdr_size, rec_size)
    rec_off = 1  # reference writes the cumulative record offset at
    for name, ftype, flen, fdec in fields:  # descriptor bytes 12-15
        out += struct.pack("<11scIBB14x", name.encode("ascii")[:11],
                           ftype.encode(), rec_off, flen, fdec)
        rec_off += flen
    out += b"\x0d"
    for r in records:
        out += b" "
        for name, ftype, flen, fdec in fields:
            v = r.get(name)
            if ftype == "C":
                s = ("" if v is None else str(v)).encode("latin-1", "replace")
                # reference writes encoded bytes then skips to field
                # width over a zero-initialized buffer -> NUL padding
                out += s[:flen].ljust(flen, b"\x00")
            elif ftype == "L":
                out += (b"?" if v is None else (b"T" if v else b"F"))
            else:
                if v is None:
                    out += b" " * flen
                else:
                    s = (str(int(v)) if fdec == 0
                         else format(float(v), f".{fdec}f")).encode()
                    out += s[:flen].rjust(flen)
    out += b"\x1a"
    with open(path, "wb") as f:
        f.write(bytes(out))
    return fields


# ---------------------------------------------------------------------------
# dataset-level read

def _records_to_table(geoms, shp_type, attrs_rows, fid0):
    from .layers import point_table, polygon_table, polyline_table
    fids = list(range(fid0, fid0 + len(geoms)))
    fieldset: list[str] = []
    for r in attrs_rows:
        for k in r:
            if k not in fieldset:
                fieldset.append(k)
    attrs = {k: [r.get(k) for r in attrs_rows] for k in fieldset}
    if shp_type == SHP_POLYGON:
        rx = [[p[:, 0].tolist() for p in g] for g in geoms]
        ry = [[p[:, 1].tolist() for p in g] for g in geoms]
        # ring→poly nesting: clockwise ring (negative signed area in
        # screen-y-down convention is format-specific; shapefile outer =
        # clockwise) starts a new polygon
        rp = []
        for g in geoms:
            cur = -1
            row = []
            for p in g:
                x, y = p[:, 0], p[:, 1]
                area = float(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1]))
                if area <= 0 or cur < 0:  # shapefile outer ring: clockwise
                    cur += 1
                row.append(cur)
            rp.append(row)
        return polygon_table(fids, rx, ry, rp, attrs)
    if shp_type == SHP_POLYLINE:
        px = [[p[:, 0].tolist() for p in g] for g in geoms]
        py = [[p[:, 1].tolist() for p in g] for g in geoms]
        return polyline_table(fids, px, py, attrs)
    # point / multipoint: every coordinate of the record is one point
    # of the feature (type-8 records hold several per shape)
    xs = [p[0][:, 0].tolist() if p else [] for p in geoms]
    ys = [p[0][:, 1].tolist() if p else [] for p in geoms]
    return point_table(fids, xs, ys, attrs)


def read_shapefile(path: str, shard_records: int = 2048,
                   encoding: str | None = None):
    """path to .shp (with sibling .shx/.dbf) → Ray Dataset (layer model).
    Record ranges from .shx are sharded across parallel parse tasks."""
    import ray
    import ray.data as rd
    base = path[:-4] if path.endswith(".shp") else path
    with open(base + ".shp", "rb") as f:
        shp = f.read()
    shp_type, _ = parse_shp_header(shp)
    shp_type = _BASE_TYPE.get(shp_type, shp_type)
    try:
        with open(base + ".shx", "rb") as f:
            offs, lens = parse_shx(f.read())
    except FileNotFoundError:  # scan records sequentially
        offs_l, lens_l = [], []
        pos = 100
        while pos < len(shp):
            ln = struct.unpack(">i", shp[pos + 4:pos + 8])[0] * 2
            offs_l.append(pos + 8)
            lens_l.append(ln)
            pos += 8 + ln
        offs = np.array(offs_l) - 8
        lens = np.array(lens_l)
    cpg = None
    try:  # .cpg sidecar names the DBF text encoding (read before LDID
        with open(base + ".cpg") as f:  # like the reference's loader)
            cpg = f.read().strip() or None
    except FileNotFoundError:
        pass
    try:
        with open(base + ".dbf", "rb") as f:
            _, recs = parse_dbf(f.read(), encoding=encoding or cpg)
    except FileNotFoundError:
        recs = [{} for _ in offs]

    shp_ref = ray.put(shp)
    recs_ref = ray.put(recs)
    n = len(offs)
    shards = [(i, min(i + shard_records, n))
              for i in range(0, max(n, 1), shard_records)]

    def parse_shard(batch: pa.Table) -> pa.Table:
        buf = ray.get(shp_ref)
        rows = ray.get(recs_ref)
        out = []
        for s, e in zip(batch["start"].to_pylist(),
                        batch["end"].to_pylist()):
            geoms = [parse_record(buf[offs[i] + 8: offs[i] + 8 + lens[i]])[1]
                     for i in range(s, e)]
            out.append(_records_to_table(geoms, shp_type, rows[s:e], s))
        return pa.concat_tables(out)

    ds = rd.from_items([{"start": s, "end": e} for s, e in shards],
                       override_num_blocks=len(shards))
    return ds.map_batches(parse_shard, batch_format="pyarrow", batch_size=1)


# ---------------------------------------------------------------------------
# dataset-level write (single-writer sink)



def _feature_parts(row, gt):
    if gt == "polygon":
        # enforce the shapefile ring convention by ring_poly nesting:
        # the FIRST ring of each polygon group is the outer (written
        # clockwise, reader-signed-area <= 0), later rings of the group
        # are holes (counter-clockwise) — GeoJSON-sourced RFC-7946
        # winding would otherwise round-trip as misnested polygons
        rp = list(_nz(row["ring_poly"])) if "ring_poly" in row \
            else []
        out = []
        seen_poly = set()
        for i, (x, y) in enumerate(zip(_nz(row["rings_x"]),
                                       _nz(row["rings_y"]))):
            x = np.asarray(x, dtype=np.float64)
            y = np.asarray(y, dtype=np.float64)
            poly = rp[i] if i < len(rp) else i
            is_outer = poly not in seen_poly
            seen_poly.add(poly)
            area = float(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1]))
            want_neg = is_outer  # reader: outer when area <= 0
            if (area > 0) == want_neg and area != 0:
                x, y = x[::-1], y[::-1]
            out.append(np.stack([x, y], axis=1))
        return out
    if gt == "polyline":
        return [np.stack([np.asarray(x), np.asarray(y)], axis=1)
                for x, y in zip(_nz(row["part_x"]), _nz(row["part_y"]))]
    return [np.array([[x, y]]) for x, y in zip(_nz(row["px"]),
                                               _nz(row["py"]))]


def write_shapefile(ds, path: str, rotate=True,
                    field_order: str | None = None):
    """Dataset (layer model) → .shp/.shx/.dbf triple, ordered by
    feature_id.  Small-side sink: rendered on the driver from sorted
    batches (the format needs global offsets)."""
    from .layers import geom_type_of
    base = path[:-4] if path.endswith(".shp") else path
    df = ds.to_pandas().sort_values("feature_id").reset_index(drop=True)
    gt = geom_type_of(list(df.columns))
    if rotate and gt == "polygon" and len(df):
        # the reference exports AFTER buildTopology, where rings are
        # rotated to their first junction vertex — rebuild through
        # topology so .shp output is byte-comparable to the reference
        # (refclip-kernel outputs pass rotate=False: their rings are
        # already in reference arc order)
        from ..ops.features import _topology_rotated
        df = _topology_rotated(ds).to_pandas() \
            .sort_values("feature_id").reset_index(drop=True)
    shp_type = {"polygon": SHP_POLYGON, "polyline": SHP_POLYLINE,
                "point": SHP_POINT}[gt]
    geom_cols = {"feature_id", "rings_x", "rings_y", "ring_poly",
                 "part_x", "part_y", "px", "py", "__fields"}
    attr_cols = [c for c in df.columns if c not in geom_cols]
    if field_order == "ascending":  # -o field-order= (applyFieldOrder)
        attr_cols = sorted(attr_cols, key=lambda c: c.lower())

    contents = []
    allx, ally = [], []
    for row in df.to_dict("records"):
        parts = _feature_parts(row, gt)
        if not parts:
            contents.append(struct.pack("<i", 0))
            continue
        if shp_type == SHP_POINT:
            p = parts[0][0]
            contents.append(struct.pack("<i2d", SHP_POINT, p[0], p[1]))
            allx.append(p[0:1]); ally.append(p[1:2])
            continue
        pts = np.concatenate(parts)
        starts = np.cumsum([0] + [len(p) for p in parts[:-1]])
        bb = (pts[:, 0].min(), pts[:, 1].min(),
              pts[:, 0].max(), pts[:, 1].max())
        body = struct.pack("<i4d2i", shp_type, *bb, len(parts), len(pts))
        body += np.asarray(starts, dtype="<i4").tobytes()
        body += np.ascontiguousarray(pts, dtype="<f8").tobytes()
        contents.append(body)
        allx.append(pts[:, 0]); ally.append(pts[:, 1])

    ax = np.concatenate(allx) if allx else np.zeros(1)
    ay = np.concatenate(ally) if ally else np.zeros(1)
    bbox = (ax.min(), ay.min(), ax.max(), ay.max())

    shp = bytearray()
    shx = bytearray()
    rec_offsets = []
    pos = 100
    for i, c in enumerate(contents):
        rec_offsets.append((pos // 2, len(c) // 2))
        shp += struct.pack(">2i", i + 1, len(c) // 2) + c
        pos += 8 + len(c)

    def header(total_bytes):
        h = struct.pack(">i5i", 9994, 0, 0, 0, 0, 0)
        h += struct.pack(">i", total_bytes // 2)
        h += struct.pack("<2i", 1000, shp_type)
        h += struct.pack("<4d", *bbox) + struct.pack("<4d", 0, 0, 0, 0)
        return h

    with open(base + ".shp", "wb") as f:
        f.write(header(100 + len(shp)))
        f.write(bytes(shp))
    for off, ln in rec_offsets:
        shx += struct.pack(">2i", off, ln)
    with open(base + ".shx", "wb") as f:
        f.write(header(100 + len(shx)))
        f.write(bytes(shx))
    records = df[attr_cols].to_dict("records") if attr_cols else \
        [{} for _ in range(len(df))]
    write_dbf(base + ".dbf", records)
    return base + ".shp"
