"""CSV/TSV source/sink (SURVEY.md §2.1 CSV rows).

Wraps ``ray.data.read_csv`` (Arrow CSV) with the reference's import
semantics (src/text/mapshaper-delim-import.js:9-152):
- delimiter guess from the first line (',' ';' '\\t' '|'),
- all-string parse then per-column numeric auto-detection,
- ``field_types`` / ``string_fields`` hints override detection.

Writer: ``ds.write_csv`` passthrough plus a small single-file sink for
fixture-sized outputs (the reference emits one file per layer).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

DELIMS = [",", "\t", ";", "|"]


def sniff_delimiter(first_line: str) -> str:
    counts = {d: first_line.count(d) for d in DELIMS}
    best = max(counts, key=counts.get)
    return best if counts[best] else ","


def adjust_record_types(df: pd.DataFrame, field_types: dict | None = None,
                        string_fields: list | None = None) -> pd.DataFrame:
    """Numeric auto-detect per column over string data, honoring hints
    (internal.adjustRecordTypes, src/text/mapshaper-delim-import.js:109-152):
    a column converts only if EVERY non-empty value parses as a number."""
    field_types = field_types or {}
    string_fields = set(string_fields or [])
    out = df.copy()
    for col in out.columns:
        if col in string_fields:
            out[col] = out[col].astype(str)
            continue
        want = field_types.get(col)
        if want == "str":
            out[col] = out[col].astype(str)
            continue
        if out[col].dtype == object or want in ("num", "number"):
            s = out[col].astype(str).str.strip()
            nonempty = s != ""
            parsed = pd.to_numeric(s.where(nonempty), errors="coerce")
            if want in ("num", "number") or \
                    (nonempty.any() and not parsed[nonempty].isna().any()):
                out[col] = parsed
    return out


def read_delim(path: str, delimiter: str | None = None,
               field_types: dict | None = None,
               string_fields: list | None = None,
               override_num_blocks: int | None = None,
               encoding: str | None = None):
    """CSV/TSV → Ray Dataset with reference-style typing.
    ``encoding`` transcodes non-UTF-8 input to a UTF-8 temp file first
    (the reference decodes the whole buffer before parsing)."""
    import ray.data as rd
    from ray.data.datasource import FileShuffleConfig  # noqa: F401  (doc)
    if encoding and encoding.lower().replace("-", "") not in \
            ("utf8", "ascii"):
        import atexit
        import os as _os
        import tempfile
        with open(path, "rb") as f:
            text = f.read().decode(encoding, errors="replace")
        tmp = tempfile.NamedTemporaryFile(
            mode="w", encoding="utf-8", suffix=".csv", delete=False)
        tmp.write(text)
        tmp.close()
        # the Ray read is lazy, so the file must outlive this call —
        # remove it at interpreter exit instead of leaking it
        atexit.register(lambda p=tmp.name: _os.path.exists(p)
                        and _os.unlink(p))
        path = tmp.name
    with open(path, "r", encoding="utf-8", errors="replace") as f:
        header = f.readline()
    if delimiter is None:
        delimiter = sniff_delimiter(header)
    import pyarrow as pa
    from pyarrow import csv as pacsv
    parse = pacsv.ParseOptions(delimiter=delimiter)
    # all-string parse (every column forced to string), then our own
    # type adjustment — exact reference semantics instead of Arrow's
    # per-chunk inference (which would eat leading zeros pre-hint)
    colnames = [c.strip() for c in header.rstrip("\r\n").split(delimiter)]
    convert = pacsv.ConvertOptions(
        strings_can_be_null=False,
        column_types={c: pa.string() for c in colnames})
    ds = rd.read_csv(path, parse_options=parse, convert_options=convert,
                     **({"override_num_blocks": override_num_blocks}
                        if override_num_blocks else {}))

    def adjust(df: pd.DataFrame) -> pd.DataFrame:
        return adjust_record_types(df, field_types, string_fields)
    # a delim table has no feature_id — row POSITION is its identity
    # (reference keeps input order through every command), so pin
    # preserve_order on this dataset's context; it propagates to every
    # dataset derived from it, making downstream collects plan-ordered
    ds.context.execution_options.preserve_order = True
    return ds.map_batches(adjust, batch_format="pandas")


#: geometry / bookkeeping columns never exported to a delim table
#: (the reference exports the data table only)
_NON_DATA_COLS = ("feature_id", "rings_x", "rings_y", "ring_poly",
                  "part_x", "part_y", "px", "py", "__fields")


def format_delim(df, delimiter: str = ",") -> str:
    """Serialize a DataFrame exactly like the reference's
    exportLayerAsDSV (src/text/mapshaper-delim-export.js:19-79):
    d3-dsv formatRows quoting (quote only cells containing the
    delimiter, '\"', CR or LF; '\"'->'\"\"'), JS ToString for numbers,
    null/NaN -> empty, rows joined with LF and no trailing newline."""
    import numpy as np

    from .jsnum import js_number_str

    def cell(v) -> str:
        if v is None:
            return ""
        if isinstance(v, (bool, np.bool_)):
            return "true" if v else "false"
        if isinstance(v, (int, np.integer)):
            return str(int(v))
        if isinstance(v, (float, np.floating)):
            return "" if v != v else js_number_str(v)
        if isinstance(v, (list, dict, np.ndarray)):
            import json
            return json.dumps(v.tolist() if isinstance(v, np.ndarray)
                              else v, separators=(",", ":"))
        return str(v)

    def quoted(s: str) -> str:
        if delimiter in s or '"' in s or "\n" in s or "\r" in s:
            return '"' + s.replace('"', '""') + '"'
        return s

    cols = [c for c in df.columns if c not in _NON_DATA_COLS]
    lines = [delimiter.join(quoted(c) for c in cols)]
    for row in df[cols].itertuples(index=False):
        lines.append(delimiter.join(quoted(cell(v)) for v in row))
    return "\n".join(lines)


def write_delim(ds, path: str, delimiter: str | None = None,
                field_order: str | None = None,
                encoding: str | None = None):
    """Single-file sink ordered by position (fixture-sized outputs; at
    scale use ``ds.write_csv(dir)`` which shards per block).  Output
    bytes match the reference's CSV/TSV export exactly."""
    from .layers import ordered_pandas
    if delimiter is None:
        delimiter = "\t" if path.lower().endswith(".tsv") else ","
    df = ordered_pandas(ds)
    if field_order == "ascending":  # case-insensitive (applyFieldOrder)
        df = df[sorted(df.columns, key=lambda c: c.lower())]
    text = format_delim(df, delimiter)
    if encoding and encoding.lower().replace("-", "") not in \
            ("utf8",):
        # reference iconv encode: unmappable chars become '?'
        with open(path, "wb") as f:
            f.write(text.encode(encoding, errors="replace"))
    else:
        with open(path, "w", encoding="utf-8") as f:
            f.write(text)
    return path
