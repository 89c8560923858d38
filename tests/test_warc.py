"""WARC source (sources/warc.py): round-trip byte identity, gzip
member handling, HTTP payload splitting, record-type filtering, and
the pages-pipeline integration invariant (byte-identical extracted
text per url, the north-rule contract)."""
import gzip

import numpy as np
import pandas as pd

from mapshaper_ray.sources.warc import (parse_warc_bytes, read_warc,
                                        write_warc_bytes)


def _recs(n=5, http=False):
    recs = []
    for i in range(n):
        body = f"<html><body>doc {i} body</body></html>".encode()
        payload = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                   b"\r\n" + body) if http else body
        recs.append({
            "uri": f"https://site{i % 3}.example/p/{i}",
            "date": f"2024-01-0{i % 9 + 1}T00:00:0{i % 10}Z",
            "payload": payload,
            "content_type": ("application/http; msgtype=response"
                             if http else "text/html")})
    return recs


def test_roundtrip_plain():
    recs = _recs(7)
    buf = write_warc_bytes(recs)
    got = parse_warc_bytes(buf)
    assert len(got) == 7
    for r, (uri, date, rtype, payload) in zip(recs, got):
        assert (uri, date, rtype) == (r["uri"], r["date"], "response")
        assert payload == r["payload"]  # byte-identical


def test_http_split_and_no_split():
    recs = _recs(3, http=True)
    buf = write_warc_bytes(recs)
    bodies = [p for _, _, _, p in parse_warc_bytes(buf)]
    assert bodies[1] == b"<html><body>doc 1 body</body></html>"
    raw = [p for _, _, _, p in parse_warc_bytes(buf,
                                                http_split=False)]
    assert raw[1].startswith(b"HTTP/1.1 200 OK")


def test_gzip_whole_file_and_per_record_members():
    recs = _recs(4)
    buf = write_warc_bytes(recs)
    # whole-file gzip
    assert [p for *_, p in parse_warc_bytes(gzip.compress(buf))] \
        == [r["payload"] for r in recs]
    # Common-Crawl style: each record its own gzip member
    members = b"".join(gzip.compress(write_warc_bytes([r]))
                       for r in recs)
    assert [p for *_, p in parse_warc_bytes(members)] \
        == [r["payload"] for r in recs]


def test_payload_containing_crlf_boundary():
    """Content-Length framing must survive payloads that embed the
    record-boundary byte sequence."""
    tricky = b"a\r\n\r\nWARC/1.0\r\n\r\nb"
    recs = [{"uri": "https://x.example/1",
             "date": "2024-01-01T00:00:00Z", "payload": tricky,
             "content_type": "application/octet-stream"}]
    got = parse_warc_bytes(write_warc_bytes(recs))
    assert len(got) == 1 and got[0][3] == tricky


def test_read_warc_dataset(ray_session, tmp_path):
    recs = _recs(9, http=True)
    # a request record that must be filtered out
    recs.insert(3, {"uri": "https://site0.example/p/0",
                    "date": "2024-01-01T00:00:00Z",
                    "payload": b"GET /p/0 HTTP/1.1\r\n\r\n",
                    "rec_type": "request"})
    # shard across two archive files, one gzipped
    (tmp_path / "a.warc").write_bytes(write_warc_bytes(recs[:5]))
    (tmp_path / "b.warc.gz").write_bytes(
        gzip.compress(write_warc_bytes(recs[5:])))
    out = read_warc([str(tmp_path / "a.warc"),
                     str(tmp_path / "b.warc.gz")]).to_pandas() \
        .sort_values("url").reset_index(drop=True)
    assert len(out) == 9  # request dropped
    exp = sorted(r["uri"] for r in recs if "rec_type" not in r)
    assert out["url"].tolist() == exp
    assert str(out["warc_ts"].dtype) == "datetime64[ms]"
    # byte-identical body per url — the north-rule invariant
    bodies = {r["uri"]: r["payload"].split(b"\r\n\r\n", 1)[1]
              for r in recs if "rec_type" not in r}
    for _, row in out.iterrows():
        assert bytes(row["html"]) == bodies[row["url"]]
