"""Per-run pipeline metrics — the observability half of the
north-rule's "per-partition lineage manifest plus metrics" contract
(the lineage half lives in stages/tiles.py's manifest.json).

``run_metrics`` distills Ray Data's executor stats for a consumed
Dataset into a structured summary (per-operator wall time, output
rows/blocks, spill indicators); ``write_run_metrics`` persists it
atomically next to an output directory so a ``ray job submit`` run
leaves both WHAT was produced (manifest) and HOW it ran (metrics)
behind for the next attempt / the on-call engineer.

Parsing targets the stable lines of ``Dataset.stats()`` (operator
header, wall time range, output rows) and degrades gracefully — an
unparseable section still lands verbatim under ``raw_tail`` rather
than failing the pipeline.
"""
from __future__ import annotations

import json
import os
import re
import time

_STAGE_RE = re.compile(
    r"^Operator (?P<idx>\d+) (?P<name>.+?):"
    r"(?: (?P<tasks>\d+) tasks executed,"
    r" (?P<blocks>\d+) blocks)?",
    re.M)
_ROWS_RE = re.compile(
    r"Output num rows per block: .*?, ([0-9.]+) total")
_WALL_RE = re.compile(
    r"\* Remote wall time: .*?, ([0-9.]+(?:us|ms|s)) total")
_BYTES_RE = re.compile(
    r"Output size bytes per block: .*?, ([0-9.]+) total")


def _secs(tok: str) -> float:
    if tok.endswith("us"):
        return float(tok[:-2]) / 1e6
    if tok.endswith("ms"):
        return float(tok[:-2]) / 1000.0
    if tok.endswith("s"):
        return float(tok[:-1])
    return float(tok)


def run_metrics(ds) -> dict:
    """Structured per-operator summary of a consumed Dataset's stats."""
    text = ds.stats()
    ops = []
    sections = re.split(r"(?=^Operator \d+ )", text, flags=re.M)
    for sec in sections:
        m = _STAGE_RE.match(sec)
        if not m:
            continue
        op = {"operator": m.group("name").strip(),
              "index": int(m.group("idx"))}
        if m.group("tasks"):
            op["tasks"] = int(m.group("tasks"))
            op["blocks"] = int(m.group("blocks"))
        rw = _ROWS_RE.search(sec)
        if rw:
            op["rows_out"] = int(float(rw.group(1)))
        bt = _BYTES_RE.search(sec)
        if bt:
            op["bytes_out"] = int(float(bt.group(1)))
        wl = _WALL_RE.search(sec)
        if wl:
            try:
                op["wall_s_total"] = _secs(wl.group(1))
            except ValueError:
                pass
        ops.append(op)
    out = {"captured_at": time.time(), "operators": ops}
    if not ops:
        out["raw_tail"] = text[-2000:]
    return out


def write_run_metrics(ds, out_dir: str, extra: dict | None = None,
                      filename: str = "metrics.json") -> dict:
    """Persist run_metrics(ds) atomically under ``out_dir`` (the
    manifest.json convention); ``extra`` merges in caller-side facts
    (input paths, row counts, config)."""
    m = run_metrics(ds)
    if extra:
        m.update(extra)
    os.makedirs(out_dir, exist_ok=True)
    tmp = os.path.join(out_dir, filename + ".tmp")
    with open(tmp, "w") as f:
        json.dump(m, f, indent=1, default=str)
    os.replace(tmp, os.path.join(out_dir, filename))
    return m
