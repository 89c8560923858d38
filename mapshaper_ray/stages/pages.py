"""Pages-table synthesis + HTML text extraction stages.

The engine's primary input is a Common-Crawl-style pages table
(url:string, warc_ts:timestamp[ms], html:binary, text:string, lang:string
— BASELINE.json input_hint).  The sandbox has no real WARC data, so
``synth_pages`` derives a deterministic pages table of exactly that shape
from the driver-generated ``documents`` table (FIXTURES.md §1): url and
timestamp are pure functions of ``doc_id``; ``html`` wraps ``text``; the
per-url byte-identical-text invariant holds by construction and is
re-checked by ``extract_text`` downstream.

All transforms are zero-copy Arrow ``map_batches`` bodies
(pyarrow.compute kernels, no Python row loops).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

BASE_EPOCH_MS = 1577836800000  # 2020-01-01T00:00:00Z
HTML_PREFIX = b"<html><body>"
HTML_SUFFIX = b"</body></html>"
REPL_STRIDE = 1_000_000_000


def _synth_batch(batch: pa.Table, replicate_id: int = 0) -> pa.Table:
    doc_id = batch["doc_id"]
    if replicate_id:
        doc_id = pc.add(doc_id, replicate_id * REPL_STRIDE)
    site = pa.array(
        np.asarray(doc_id.to_numpy(zero_copy_only=False)) % 1000)
    url = pc.binary_join_element_wise(
        "https://site", pc.cast(site, pa.string()), ".example/p/",
        pc.cast(doc_id, pa.string()), "")
    ts = pc.cast(pc.add(pc.multiply(doc_id, 1009), BASE_EPOCH_MS),
                 pa.timestamp("ms"))
    text = batch["text"]
    tbin = pc.cast(text, pa.binary())
    n = len(batch)
    html = pc.binary_join_element_wise(
        pa.array([HTML_PREFIX] * n, type=pa.binary()), tbin,
        pa.array([HTML_SUFFIX] * n, type=pa.binary()), b"")
    return pa.table({
        "url": url,
        "warc_ts": ts,
        "html": html,
        "text": text,
        "lang": batch["lang"],
        "doc_id": doc_id,  # lineage key, kept for oracle joins + tests
    })


def synth_pages(sf_dir: str, replicate: int = 1,
                override_num_blocks: int | None = None) -> "ray.data.Dataset":
    """documents.parquet → pages Dataset.

    ``replicate`` > 1 is the bench scale knob: the small doc table is
    broadcast once (ray.put) and ``range(replicate)`` fans out one
    block per replica, so parallelism scales with the data multiplier
    instead of being pinned to the single input file's block count (a
    one-file read = one block = serial downstream task pool).  At real
    scale the input is many parquet shards and the replicate path is
    unused."""
    import ray
    import ray.data as rd
    if replicate <= 1:
        return rd.read_parquet(
            f"{sf_dir}/documents.parquet",
            columns=["doc_id", "text", "lang"],
            **({"override_num_blocks": override_num_blocks}
               if override_num_blocks else {})
        ).map_batches(_synth_batch, batch_format="pyarrow")

    import pyarrow.parquet as pq
    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "lang"])
    ref = ray.put(docs)

    def synth_replica(batch: pa.Table):
        # one concatenated output table per ~64k rows, not one tiny
        # block per replica: block count drives per-object scheduling
        # and driver-fetch overhead downstream
        base = ray.get(ref)
        chunk, rows = [], 0
        for k in batch["id"].to_pylist():
            t = _synth_batch(base, int(k))
            chunk.append(t)
            rows += len(t)
            if rows >= 65536:
                yield pa.concat_tables(chunk)
                chunk, rows = [], 0
        if chunk:
            yield pa.concat_tables(chunk)

    # block count ~4x CPUs: enough slices to keep every core busy, few
    # enough that per-task latency (~0.2s submit+fetch) stays amortized
    try:
        ncpu = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        ncpu = 8
    n_blocks = override_num_blocks or max(1, min(replicate, 4 * ncpu))
    return rd.range(replicate, override_num_blocks=n_blocks).map_batches(
        synth_replica, batch_format="pyarrow")


def _extract_batch(batch: pa.Table) -> pa.Table:
    """Strip the html wrapper → extracted text.  Stand-in for a real HTML
    text extractor; the Ray-side plumbing (binary col in, string col out,
    vectorized kernel) is the real thing.  Invariant: extracted bytes ==
    stored ``text`` per url (BASELINE.json input_hint), asserted in tests
    and spot-checked here per batch."""
    ext = pc.cast(pc.binary_slice(batch["html"], len(HTML_PREFIX),
                                  -len(HTML_SUFFIX)), pa.string())
    if "text" in batch.column_names:
        return batch.set_column(batch.column_names.index("text"),
                                "text", ext)
    return batch.append_column("text", ext)


def extract_text(pages: "ray.data.Dataset") -> "ray.data.Dataset":
    return pages.map_batches(_extract_batch, batch_format="pyarrow")


def write_pages_parquet(sf_dir: str, out_dir: str, replicate: int = 1,
                        force: bool = False) -> str:
    """Materialize the synthetic pages table to partitioned parquet —
    the benchmark INPUT (the BASELINE metric is throughput over
    Common-Crawl-style *Parquet*, so timed runs read real files, they
    don't synthesize in memory).  One file per output block; skipped if
    the directory already holds the expected row count (resumable)."""
    import os

    import pyarrow.parquet as pq
    meta = os.path.join(out_dir, "_META")
    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    expect = n_docs * replicate
    if not force and os.path.exists(meta):
        with open(meta) as f:
            if f.read().strip() == str(expect):
                return out_dir
    ds = synth_pages(sf_dir, replicate)
    ds.write_parquet(out_dir)
    with open(meta, "w") as f:
        f.write(str(expect))
    return out_dir


def read_pages(parquet_dir: str, columns=None,
               override_num_blocks=None) -> "ray.data.Dataset":
    """Pages-from-parquet source with column pruning (read only what the
    pipeline needs — html for extraction, doc_id for lineage)."""
    import ray.data as rd
    return rd.read_parquet(
        parquet_dir, columns=columns,
        **({"override_num_blocks": override_num_blocks}
           if override_num_blocks else {}))


def drop_heavy_columns(pages: "ray.data.Dataset") -> "ray.data.Dataset":
    """Project off ``html`` (and any other wide binary payload) before any
    shuffle — wide rows dominate block size otherwise (SURVEY.md §7.4)."""
    cols = [c for c in pages.schema().names if c != "html"]
    return pages.select_columns(cols)


def add_url_host(pages: "ray.data.Dataset", url_col: str = "url",
                 out_col: str = "host") -> "ray.data.Dataset":
    """Extract the host from a Common-Crawl-style url column — one
    vectorized Arrow regex per batch, zero-copy otherwise.  The
    building block for per-domain corpus stats / domain-level dedup
    and sampling."""
    def f(batch: pa.Table) -> pa.Table:
        m = pc.extract_regex(batch[url_col],
                             r"^[a-z][a-z0-9+.-]*://(?P<host>[^/?#]+)")
        return batch.append_column(out_col, pc.struct_field(m, "host"))
    return pages.map_batches(f, batch_format="pyarrow")


_URL_RULES = [
    # 1. strip the fragment
    (r"#.*$", "", False),
    # 2-3. strip utm_* tracking params (mid-query, then trailing)
    (r"utm_[A-Za-z0-9_]*=[^&]*&", "", True),
    (r"[?&]utm_[A-Za-z0-9_]*=[^&]*$", "", False),
    # 4. dangling '?' left by param stripping
    (r"\?$", "", False),
    # (5. scheme+host lowercase — handled separately: needs case fold)
    # 6. default ports
    (r"^(http://[^/?#]*):80([/?#].*)?$", r"\1\2", False),
    (r"^(https://[^/?#]*):443([/?#].*)?$", r"\1\2", False),
    # 7. trailing path slash(es) before query/end
    (r"/+([?#]|$)", r"\1", False),
]
_URL_HEAD = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*"


def normalize_urls(pages: "ray.data.Dataset", url_col: str = "url",
                   out_col: str = "url_norm") -> "ray.data.Dataset":
    """Canonical URL normalization for web-corpus dedup: strip
    fragments, strip ``utm_*`` tracking params, lowercase scheme+host,
    strip default ports (http:80 / https:443), strip trailing path
    slashes.  Every rule is a RE2-compatible regex so a DuckDB
    ``regexp_replace`` chain reproduces the output byte-for-byte
    (q100's oracle).  Vectorized pandas str ops per batch; stateless
    task pool."""
    import pandas as pd  # noqa: F401

    def f(df):
        s = df[url_col].astype(str)
        s = s.str.replace(_URL_RULES[0][0], "", regex=True)
        s = s.str.replace(_URL_RULES[1][0], "", regex=True)
        s = s.str.replace(_URL_RULES[2][0], "", regex=True)
        s = s.str.replace(_URL_RULES[3][0], "", regex=True)
        s = s.str.replace(_URL_HEAD, lambda m: m.group(0).lower(),
                          regex=True)
        s = s.str.replace(_URL_RULES[4][0], _URL_RULES[4][1], regex=True)
        s = s.str.replace(_URL_RULES[5][0], _URL_RULES[5][1], regex=True)
        s = s.str.replace(_URL_RULES[6][0], _URL_RULES[6][1], regex=True)
        df = df.copy()
        df[out_col] = s
        return df

    return pages.map_batches(f, batch_format="pandas")


def url_normalize_sql(col: str = "url") -> str:
    """The DuckDB expression mirroring ``normalize_urls`` rule for
    rule (shared by the q100 oracle and any SQL cross-check)."""
    e = col
    e = f"regexp_replace({e}, '#.*$', '')"
    e = f"regexp_replace({e}, 'utm_[A-Za-z0-9_]*=[^&]*&', '', 'g')"
    e = f"regexp_replace({e}, '[?&]utm_[A-Za-z0-9_]*=[^&]*$', '')"
    e = f"regexp_replace({e}, '\\?$', '')"
    head = f"regexp_extract({e}, '{_URL_HEAD}')"
    e = (f"lower({head}) || substr({e}, length({head}) + 1)")
    e = (f"regexp_replace({e}, '^(http://[^/?#]*):80([/?#].*)?$', "
         f"'\\1\\2')")
    e = (f"regexp_replace({e}, '^(https://[^/?#]*):443([/?#].*)?$', "
         f"'\\1\\2')")
    e = f"regexp_replace({e}, '/+([?#]|$)', '\\1')"
    return e


def filter_blocked_hosts(pages: "ray.data.Dataset", blocked,
                         url_col: str = "url", keep_blocked: bool = False,
                         out_col: str = "host") -> "ray.data.Dataset":
    """C4/RedPajama-style URL blocklist filter: a page is blocked when
    its host (lowercased, port stripped) equals a blocked domain or is
    a SUBDOMAIN of one (``ads.site7.example`` matches blocklist entry
    ``site7.example``).  The blocklist is bounded (broadcast once as a
    frozenset in the task closure — Ray ships it to each task via the
    object store, never per batch); the corpus streams through one
    stateless vectorized pass, no shuffle.

    Suffix matching is vectorized by candidate generation: a host with
    L dot-separated labels has exactly L suffix domains, so each batch
    explodes hosts into their <= max-depth suffixes and one
    ``isin(blocked)`` over the flat suffix array decides membership —
    no per-row Python loop, no per-entry regex scan.  Returns the
    surviving pages with ``out_col`` attached (or only the blocked
    pages with ``keep_blocked=True``, the audit view).
    """
    import pandas as pd

    blocked_set = frozenset(str(b).lower() for b in blocked)

    def f(df: pd.DataFrame) -> pd.DataFrame:
        host = df[url_col].astype(str).str.extract(
            r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:@]+(?::\d+)?)",
            expand=False).fillna("").str.lower() \
            .str.replace(r":\d+$", "", regex=True)
        parts = host.str.split(".")
        lens = parts.str.len().to_numpy()
        flat = np.concatenate([np.asarray(p, dtype=object)
                               for p in parts]) if len(df) else \
            np.empty(0, object)
        hit = np.zeros(len(df), dtype=bool)
        off = np.concatenate([[0], np.cumsum(lens)])
        # vectorized suffix build: for depth d (1..max), join the last
        # d labels of every host with >= d labels
        max_d = int(lens.max()) if len(df) else 0
        for d in range(1, max_d + 1):
            has = lens >= d
            idx = off[1:][has] - d  # start of the last-d window
            sfx = flat[idx[:, None] + np.arange(d)] if d > 1 else \
                flat[idx][:, None]
            joined = pd.Series([".".join(x) for x in sfx]) \
                if d > 1 else pd.Series(sfx[:, 0], dtype=object)
            hit[has] |= joined.isin(blocked_set).to_numpy()
        df = df.copy()
        df[out_col] = host
        return df[hit] if keep_blocked else df[~hit]

    return pages.map_batches(f, batch_format="pandas")


def blocked_hosts_sql(blocked, url_col: str = "url",
                      host_alias: str = "host") -> tuple[str, str]:
    """DuckDB mirror of ``filter_blocked_hosts``: returns (host_expr,
    blocked_cond) — the host-extraction expression and a boolean
    condition true when that host is blocked (equal to or subdomain
    of an entry)."""
    host = (f"regexp_replace(lower(regexp_extract({url_col}, "
            f"'^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:@]+(?::[0-9]+)?)', 1)), "
            f"':[0-9]+$', '')")
    vals = ", ".join("('" + str(b).lower().replace("'", "''") + "')"
                     for b in blocked)
    cond = (f"EXISTS (SELECT 1 FROM (VALUES {vals}) AS __bl(d) "
            f"WHERE {host_alias} = __bl.d "
            f"OR {host_alias} LIKE '%.' || __bl.d)")
    return host, cond


BOILERPLATE_BROADCAST_CAP = int(__import__("os").environ.get(
    "MAPSHAPER_RAY_BOILERPLATE_CAP", "2000000"))


def remove_boilerplate(pages: "ray.data.Dataset", host_col: str = "host",
                       id_col: str = "doc_id", text_col: str = "text",
                       frac_num: int = 1, frac_den: int = 2,
                       min_pages: int = 2,
                       broadcast_cap: int | None = None,
                       n_parts: int = 64) -> "ray.data.Dataset":
    """Per-host template/boilerplate line removal (the CCNet /
    RefinedWeb recipe): a LINE is boilerplate for a host when it
    appears in at least ``frac_num/frac_den`` of that host's pages
    (integer-exact test: ``n_docs * frac_den >= frac_num * n_pages``)
    and in at least ``min_pages`` pages.  Those lines are deleted
    from every page of the host; remaining lines re-join with
    ``\\n`` byte-exactly.  Returns (id, host, text_clean).

    Distributed shape: line identity is ``md5_lo64(host \\x1f line)``
    — host-scoped in ONE uint64 key, DuckDB-``md5_number_lower``
    reproducible.  Pass 1 emits per-batch distinct-per-doc (key,
    host) partials; a distributed grouped count + a bucketed join
    against per-host page counts yields the boilerplate key table.
    Below ``broadcast_cap`` keys it broadcasts as a sorted array and
    the corpus streams through one stateless rebuild pass (no corpus
    shuffle at all); above the cap, pages explode to (doc, pos,
    line) rows, a bucketed anti-join on the key drops boilerplate
    lines, and docs reassemble in a doc-bucket shuffle — the corpus
    moves, but host/line state never concentrates anywhere.
    """
    import pandas as pd
    import ray

    from ..ops.relational import groupby_agg, hash_join_bucketed
    from .text import md5_lo64

    cap = BOILERPLATE_BROADCAST_CAP if broadcast_cap is None \
        else broadcast_cap

    def _split(texts):
        return [t.split("\n") if t else [] for t in texts]

    def _lh(strings) -> np.ndarray:
        # 52-bit key: int64 columns wider than the float64 mantissa
        # are corrupted by the join exchange's NaN padding (the q132
        # fingerprint lesson) — 52 bits survive it exactly
        return (md5_lo64(strings)
                & np.uint64((1 << 52) - 1)).astype(np.int64)

    def line_partial(df: pd.DataFrame) -> pd.DataFrame:
        hosts = df[host_col].astype(str).tolist()
        out_k = []
        for h, ls in zip(hosts, _split(df[text_col].tolist())):
            if not ls:
                continue
            uniq = sorted(set(ls))
            out_k.extend(f"{h}\x1f{ln}" for ln in uniq)
        k = _lh(out_k) if out_k else np.empty(0, np.int64)
        hrep = np.repeat(
            np.arange(len(hosts)), [len(set(ls)) if ls else 0
                                    for ls in _split(
                                        df[text_col].tolist())])
        g = pd.DataFrame({"lh": k,
                          "h": np.asarray(hosts, object)[hrep]}) \
            .groupby(["h", "lh"], as_index=False).size() \
            .rename(columns={"size": "c"})
        return g

    cnt = groupby_agg(
        pages.map_batches(line_partial, batch_format="pandas"),
        ["h", "lh"], {"n_docs": ("c", "sum")}, final="distributed")

    def host_partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(host_col, as_index=False).size() \
            .rename(columns={host_col: "h", "size": "c"})

    host_counts = groupby_agg(
        pages.map_batches(host_partial, batch_format="pandas"),
        ["h"], {"n_pages": ("c", "sum")}, final="distributed")

    if cnt.schema() is None or host_counts.schema() is None:
        # zero-row input: nothing to join, no boilerplate
        import ray.data as rd
        bl = rd.from_pandas(pd.DataFrame(
            {"h": pd.Series([], dtype=object),
             "lh": pd.Series([], dtype=np.int64)})).materialize()
    else:
        joined = hash_join_bucketed(cnt, host_counts, on="h",
                                    num_buckets=n_parts)

        def pick(df: pd.DataFrame) -> pd.DataFrame:
            nd = df["n_docs"].to_numpy(np.int64)
            np_ = df["n_pages"].to_numpy(np.int64)
            m = (nd >= min_pages) & (nd * frac_den >= frac_num * np_)
            # keep the host alongside the 52-bit line hash: membership
            # is tested per (host, lh), so a cross-host hash collision
            # can never delete a line (the key domain is one host's
            # distinct lines, not the global corpus)
            return df[m][["h", "lh"]]

        bl = joined.map_batches(pick, batch_format="pandas") \
            .materialize()
    n_bl = bl.count()

    def _clean_rows(df: pd.DataFrame, by_host: dict) -> pd.DataFrame:
        hosts = df[host_col].astype(str).tolist()
        lines = _split(df[text_col].tolist())
        flat = [f"{h}\x1f{ln}" for h, ls in zip(hosts, lines)
                for ln in ls]
        lens = np.array([len(ls) for ls in lines], np.int64)
        if flat:
            k = _lh(flat)
            drop = np.zeros(len(k), bool)
            # membership per host: group line indices by host once
            # (factorize + stable argsort), then one searchsorted per
            # host against that host's own sorted key array — a
            # cross-host 52-bit collision can't match
            line_hosts = np.repeat(np.asarray(hosts, object), lens)
            codes, uniq = pd.factorize(line_hosts)
            order = np.argsort(codes, kind="stable")
            bounds = np.searchsorted(codes[order],
                                     np.arange(len(uniq) + 1))
            for ui, h in enumerate(uniq):
                arr = by_host.get(h)
                if arr is None or not len(arr):
                    continue
                sel = order[bounds[ui]:bounds[ui + 1]]
                kk = k[sel]
                idx = np.searchsorted(arr, kk).clip(0, len(arr) - 1)
                drop[sel] = arr[idx] == kk
        else:
            drop = np.empty(0, bool)
        row = np.repeat(np.arange(len(df)), lens)
        flat_lines = np.asarray([ln for ls in lines for ln in ls],
                                object)
        keep = ~drop
        counts = np.bincount(row[keep], minlength=len(df)) \
            .astype(np.int64)
        parts = np.split(flat_lines[keep], np.cumsum(counts)[:-1])
        return pd.DataFrame({
            id_col: df[id_col].to_numpy(),
            host_col: np.asarray(hosts, object),
            "text_clean": ["\n".join(p) for p in parts]})

    if n_bl <= cap:
        parts = [b for b in bl.iter_batches(batch_format="pandas")]
        bl_df = pd.concat(parts, ignore_index=True) if parts else \
            pd.DataFrame({"h": pd.Series([], dtype=object),
                          "lh": pd.Series([], dtype=np.int64)})
        by_host = {h: np.sort(g["lh"].to_numpy(np.int64))
                   for h, g in bl_df.groupby("h")}
        ref = ray.put(by_host)

        def clean(df: pd.DataFrame) -> pd.DataFrame:
            return _clean_rows(df, ray.get(ref))

        return pages.map_batches(clean, batch_format="pandas")

    # bucketed path: explode -> anti-join -> doc-bucket reassemble
    def explode(df: pd.DataFrame) -> pd.DataFrame:
        hosts = df[host_col].astype(str).tolist()
        lines = _split(df[text_col].tolist())
        lens = np.array([len(ls) for ls in lines], np.int64)
        flat = [f"{h}\x1f{ln}" for h, ls in zip(hosts, lines)
                for ln in ls]
        k = _lh(flat) if flat else np.empty(0, np.int64)
        return pd.DataFrame({
            id_col: np.repeat(df[id_col].to_numpy(), lens),
            host_col: np.repeat(np.asarray(hosts, object), lens),
            "pos": np.concatenate([np.arange(n) for n in lens]) if
            len(lens) else np.empty(0, np.int64),
            "line": np.asarray(flat, object)
            if flat else np.empty(0, object),
            "lh": k})

    ex = pages.map_batches(explode, batch_format="pandas")

    def bl_rename(df: pd.DataFrame) -> pd.DataFrame:
        return df.rename(columns={"h": host_col})

    kept = hash_join_bucketed(
        ex, bl.map_batches(bl_rename, batch_format="pandas"),
        on=[host_col, "lh"], how="anti", num_buckets=n_parts)

    # one sentinel row per doc (pos=-1): a doc whose every line is
    # boilerplate (or whose text is empty) produces no surviving
    # exploded rows, and without this it would vanish from the output
    # entirely — the broadcast path and the SQL oracle both keep such
    # docs with text_clean=''.  The sentinel unions into the same
    # doc-bucket shuffle and reassemble drops it from the line list.
    def universe(df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        return pd.DataFrame({
            id_col: df[id_col].to_numpy(),
            host_col: df[host_col].astype(str).to_numpy(dtype=object),
            "pos": np.full(n, -1, np.int64),
            "line": np.full(n, "\x1f", dtype=object),
            "lh": np.zeros(n, np.int64)})

    kept = kept.union(pages.map_batches(universe,
                                        batch_format="pandas"))

    def stamp(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        key = pd.util.hash_array(df[id_col].to_numpy()) \
            .astype(np.uint64)
        df["__part"] = (key % np.uint64(n_parts)).astype(np.int64)
        return df

    def reassemble(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([id_col, "pos"], kind="mergesort")
        ids = df[id_col].to_numpy()
        pos = df["pos"].to_numpy(np.int64)
        starts = np.concatenate(
            [[0], np.nonzero(ids[1:] != ids[:-1])[0] + 1])
        ends = np.concatenate([starts[1:], [len(ids)]])
        # strip the "host\x1f" prefix back off each kept line
        lines = [s.split("\x1f", 1)[1] for s in df["line"].tolist()]
        # pos=-1 sentinel (one per doc) sorts first in its run; skip
        # it when joining lines so an all-boilerplate doc yields ''
        return pd.DataFrame({
            id_col: ids[starts],
            host_col: df[host_col].to_numpy()[starts],
            "text_clean": [
                "\n".join(lines[s + (0 if pos[s] >= 0 else 1):e])
                for s, e in zip(starts, ends)]})

    return kept.map_batches(stamp, batch_format="pandas") \
        .groupby("__part").map_groups(reassemble,
                                      batch_format="pandas")


def crawl_waves(pages: "ray.data.Dataset", host_col: str = "host",
                url_col: str = "url", per_wave: int = 4,
                n_parts: int = 64):
    """Politeness-aware crawl scheduling: per host, urls rank in
    deterministic (url) order and fetch in waves of ``per_wave``
    (slot = rank % per_wave, wave = rank // per_wave) — one host
    never has more than ``per_wave`` urls in flight per wave, hosts
    fetch independently.  One host-hash bucket shuffle + vectorized
    in-partition rank (the grouped_cumsum shape); SQL mirror is
    ``row_number() OVER (PARTITION BY host ORDER BY url)``.
    Returns (url, host, wave, slot)."""
    import pandas as pd

    def stamp(df: pd.DataFrame) -> pd.DataFrame:
        df = df[[host_col, url_col]].copy()
        key = pd.util.hash_array(df[host_col].to_numpy()) \
            .astype(np.uint64)
        df["__part"] = (key % np.uint64(n_parts)).astype(np.int64)
        return df

    def rank(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([host_col, url_col],
                            kind="mergesort").reset_index(drop=True)
        h = df[host_col].to_numpy()
        starts = np.concatenate(
            [[0], np.nonzero(h[1:] != h[:-1])[0] + 1]) \
            if len(h) else np.empty(0, np.int64)
        grp = np.zeros(len(h), np.int64)
        if len(h):
            grp[starts] = 1
        gid = np.cumsum(grp) - 1
        r = np.arange(len(h)) - starts[gid] if len(h) \
            else np.empty(0, np.int64)
        return pd.DataFrame({url_col: df[url_col].to_numpy(),
                             host_col: h,
                             "wave": (r // per_wave).astype(np.int64),
                             "slot": (r % per_wave).astype(np.int64)})

    return pages.map_batches(stamp, batch_format="pandas") \
        .groupby("__part").map_groups(rank, batch_format="pandas")
