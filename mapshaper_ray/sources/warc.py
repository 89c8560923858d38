"""WARC source/sink (ISO 28500 / WARC-1.1, public spec) — the native
container of Common-Crawl-style corpora, so a pages pipeline can start
from raw crawl archives instead of pre-converted parquet.

Layout per record (the spec's canonical framing):

    WARC/1.0\r\n
    <name>: <value>\r\n ...            (header block)
    \r\n
    <Content-Length payload bytes>
    \r\n\r\n                           (record boundary)

``read_warc`` parallelizes per archive file — the unit Common Crawl
itself shards by (one task per ``read_binary_files`` block; a 100-TB
crawl is ~100k archives, far more files than cores).  Parsing is a
single forward scan per file (no regex backtracking), gzip members are
decompressed with a streaming decompressobj loop (Common Crawl gzips
each record as its own member; plain concatenated-member files and
whole-file gzip both work).  HTTP response payloads optionally split
into headers/body so the ``html`` column carries only the body bytes.

``write_warc_bytes`` is the matching serializer (deterministic record
ids — md5 of uri+date — so round-trips are byte-reproducible), used by
the tests and as a sink helper for re-sharding.
"""

from __future__ import annotations

import gzip
import hashlib

import numpy as np
import pandas as pd

_CRLF = b"\r\n"
_GZ_MAGIC = b"\x1f\x8b"


def write_warc_bytes(records) -> bytes:
    """Serialize records -> one WARC buffer.  Each record is a dict
    with ``uri`` (str), ``date`` (ISO-8601 str), ``payload`` (bytes)
    and optional ``rec_type`` (default 'response') / ``content_type``.
    """
    out = []
    for r in records:
        payload = r["payload"]
        rid = hashlib.md5(
            (r["uri"] + r["date"]).encode()).hexdigest()
        headers = [
            b"WARC/1.0",
            b"WARC-Type: " + r.get("rec_type", "response").encode(),
            b"WARC-Record-ID: <urn:uuid:" + rid.encode() + b">",
            b"WARC-Date: " + r["date"].encode(),
            b"WARC-Target-URI: " + r["uri"].encode(),
            b"Content-Type: "
            + r.get("content_type",
                    "application/http; msgtype=response").encode(),
            b"Content-Length: " + str(len(payload)).encode(),
        ]
        out.append(_CRLF.join(headers) + _CRLF + _CRLF
                   + payload + _CRLF + _CRLF)
    return b"".join(out)


def _gunzip_members(buf: bytes) -> bytes:
    """Decompress ALL gzip members (Common Crawl: one member per
    record; gzip.decompress stops after the first on some paths)."""
    import zlib
    out, pos = [], 0
    while pos < len(buf):
        d = zlib.decompressobj(wbits=31)
        out.append(d.decompress(buf[pos:]))
        tail = d.unused_data
        if not tail:
            break
        pos = len(buf) - len(tail)
    return b"".join(out)


def parse_warc_bytes(buf: bytes, http_split: bool = True):
    """One forward scan -> list of (uri, date, rec_type, payload)
    tuples.  ``http_split=True`` strips HTTP response headers from
    ``application/http`` payloads so the returned payload is the body
    (the html) only — the Common-Crawl extraction convention."""
    if buf[:2] == _GZ_MAGIC:
        buf = _gunzip_members(buf)
    recs = []
    pos = 0
    n = len(buf)
    while pos < n:
        # skip inter-record padding
        while pos < n and buf[pos:pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            break
        if not buf.startswith(b"WARC/", pos):
            raise ValueError(f"malformed WARC header at byte {pos}")
        hdr_end = buf.index(_CRLF + _CRLF, pos)
        headers = {}
        for line in buf[pos:hdr_end].split(_CRLF)[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower()] = v.strip()
        length = int(headers[b"content-length"])
        body_start = hdr_end + 4
        payload = buf[body_start:body_start + length]
        pos = body_start + length
        ctype = headers.get(b"content-type", b"")
        if (http_split and ctype.startswith(b"application/http")
                and payload[:5] == b"HTTP/"):
            sep = payload.find(_CRLF + _CRLF)
            if sep >= 0:
                payload = payload[sep + 4:]
        uri = headers.get(b"warc-target-uri", b"").decode()
        date = headers.get(b"warc-date", b"").decode()
        rtype = headers.get(b"warc-type", b"").decode()
        recs.append((uri, date, rtype, payload))
    return recs


def read_warc(paths, rec_types=("response",), http_split=True):
    """Distributed WARC -> pages Dataset (url, warc_ts, html):
    ``read_binary_files`` shards by archive file, each block parses
    in one stateless pass.  ``warc_ts`` parses WARC-Date to
    timestamp[ms]; records not in ``rec_types`` are dropped."""
    import ray.data as rd

    files = rd.read_binary_files(paths)

    def parse(df: pd.DataFrame) -> pd.DataFrame:
        uris, dates, payloads = [], [], []
        for buf in df["bytes"]:
            for uri, date, rtype, payload in \
                    parse_warc_bytes(bytes(buf), http_split):
                if rtype in rec_types:
                    uris.append(uri)
                    dates.append(date)
                    payloads.append(payload)
        ts = pd.to_datetime(pd.Series(dates, dtype=object),
                            format="ISO8601", utc=True) \
            .dt.tz_localize(None).astype("datetime64[ms]") \
            if dates else pd.Series(np.empty(0, "datetime64[ms]"))
        return pd.DataFrame({
            "url": pd.Series(uris, dtype=object),
            "warc_ts": ts,
            "html": pd.Series(payloads, dtype=object)})

    return files.map_batches(parse, batch_format="pandas")
