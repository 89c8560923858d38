"""JSONL (newline-delimited JSON) sink + source — the lingua franca
of web-corpus interchange (WET/CC-derived dumps, HF datasets).  Both
directions are Ray-native: ``write_jsonl`` streams blocks to one
.jsonl file per block (resumable partitioned layout, never one giant
file), ``read_jsonl`` is pyarrow's parallel JSON reader.  Round-trip
fidelity (text bytes survive the escape/unescape cycle) is
oracle-gated by q183's md5 comparison."""
from __future__ import annotations

import ray.data


def write_jsonl(ds: "ray.data.Dataset", out_dir: str) -> str:
    import shutil
    shutil.rmtree(out_dir, ignore_errors=True)
    ds.write_json(out_dir)
    return out_dir


def read_jsonl(path: str, **kw) -> "ray.data.Dataset":
    import ray.data as rd
    return rd.read_json(path, **kw)
