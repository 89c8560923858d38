"""Driver contract: entry() smoke, queries() pipelines, oracle_sql() checks.

Ray is initialised by the driver BEFORE import; nothing here calls
ray.init()/ray.shutdown().  Every callable takes ``sf_dir`` and returns a
Dataset / pandas DataFrame / pyarrow Table; computed columns carry the
same names as the matching oracle SQL (pre-registered DuckDB views:
region nation customer supplier part orders lineitem events documents
embeddings).
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any

import numpy as np
import pandas as pd


# ---------------------------------------------------------------------------
# shared SQL fragments: the md5 geocode arithmetic (mirrors
# mapshaper_ray/stages/geocode.py exactly — same IEEE op order)

_H1 = "(('0x' || substr(md5(text), 1, 8))::BIGINT)"
_H2 = "(('0x' || substr(md5(text), 9, 8))::BIGINT)"
_HOT = f"(({_H1} % 10) < 2)"
_CITY_LON = f"(CASE WHEN {_H1} % 2 = 0 THEN -62.5 ELSE 149.5 END)"
_CITY_LAT = f"(CASE WHEN {_H1} % 2 = 0 THEN 27.5 ELSE 30.5 END)"
_LON = (f"(CASE WHEN {_HOT} THEN ({_CITY_LON} + (({_H2} % 1000) / 1000.0 * 0.5)) - 0.25 "
        f"ELSE ({_H1} % 3600000) / 10000.0 - 180.0 END)")
_LAT = (f"(CASE WHEN {_HOT} THEN ({_CITY_LAT} + ((({_H2} // 1000) % 1000) / 1000.0 * 0.5)) - 0.25 "
        f"ELSE ({_H2} % 1600000) / 10000.0 - 80.0 END)")
# level-8 cells, level-4 tiles (mirrors stages/tiles.py)
_CX = f"LEAST(GREATEST(CAST(FLOOR(({_LON} + 180.0) / 360.0 * 256) AS BIGINT), 0), 255)"
_CY = f"LEAST(GREATEST(CAST(FLOOR((90.0 - {_LAT}) / 180.0 * 256) AS BIGINT), 0), 255)"
_TILE = f"(({_CX} // 16) * 16 + ({_CY} // 16))"

_GEO_CTE = f"""geo AS (
  SELECT doc_id, n_chars, {_LON} AS lon, {_LAT} AS lat, {_TILE} AS tile
  FROM documents)"""


def _region_case(lon="lon", lat="lat"):
    from mapshaper_ray.regions import region_oracle_sql_case
    return region_oracle_sql_case(lon, lat)


# ---------------------------------------------------------------------------
# query implementations

def _q1_lineitem_agg(sf_dir: str):
    import ray.data as rd
    from mapshaper_ray.ops.relational import each_expr, filter_expr, groupby_agg
    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_returnflag", "l_linestatus", "l_quantity",
                                  "l_extendedprice", "l_discount", "l_shipdate"])
    ds = filter_expr(ds, "l_shipdate < np.datetime64('1996-01-01')")
    # integer-cents partial sums: floor(x*100+0.5) on the bit-identical
    # per-row double makes the aggregate order-independent and exact,
    # so the Ray sum and the DuckDB oracle sum hash-match.
    ds = each_expr(ds, {
        "revenue_c": "floor(l_extendedprice * (1 - l_discount) * 100.0 + 0.5)",
        "disc_c": "floor(l_discount * 100.0 + 0.5)",
    })
    out = groupby_agg(ds, ["l_returnflag", "l_linestatus"], {
        "sum_qty": ("l_quantity", "sum"),
        "sum_revenue_c": ("revenue_c", "sum"),
        "sum_disc_c": ("disc_c", "sum"),
        "n": ("l_quantity", "count"),
    }).to_pandas()
    out["sum_revenue"] = out["sum_revenue_c"] / 100.0
    out["avg_disc"] = (out["sum_disc_c"] / 100.0) / out["n"]
    return out.drop(columns=["sum_revenue_c", "sum_disc_c"])


def _q2_each_filter(sf_dir: str):
    import ray.data as rd
    from mapshaper_ray.ops.relational import each_expr, filter_expr
    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_linenumber", "l_quantity",
                                  "l_extendedprice", "l_discount"])
    ds = filter_expr(ds, "(l_discount >= 0.05) & (l_discount <= 0.07) & (l_quantity < 24)")
    ds = each_expr(ds, {"revenue": "l_extendedprice * l_discount"})
    return ds.select_columns(["l_orderkey", "l_linenumber", "revenue"])


def _q3_broadcast_join(sf_dir: str):
    import ray.data as rd
    from mapshaper_ray.ops.relational import broadcast_join, groupby_agg
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_totalprice"])
    cust = pd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_mktsegment"]).rename(
        columns={"c_custkey": "o_custkey"})
    joined = broadcast_join(orders, cust, on="o_custkey", how="inner")
    out = groupby_agg(joined, ["c_mktsegment"], {
        "n_orders": ("o_totalprice", "count"),
        "sum_total": ("o_totalprice", "sum"),
    }).to_pandas()
    out["sum_total"] = out["sum_total"].round(2)
    return out


def _q4_hash_join(sf_dir: str):
    import ray.data as rd
    from mapshaper_ray.ops.relational import groupby_agg, hash_join
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_quantity"]).rename_columns(
        {"l_orderkey": "o_orderkey"})
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_orderpriority"])
    joined = hash_join(li, orders, on="o_orderkey", how="inner")
    return groupby_agg(joined, ["o_orderpriority"], {
        "n": ("l_quantity", "count"),
        "sum_qty": ("l_quantity", "sum"),
    })


def _q5_topk(sf_dir: str):
    import ray.data as rd
    from mapshaper_ray.ops.relational import sort_topk
    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_orderkey", "o_totalprice"])
    # deterministic tie-break on orderkey: sort on a composite computed col
    out = sort_topk(ds, "o_totalprice", 20, descending=True).to_pandas()
    out = out.sort_values(["o_totalprice", "o_orderkey"],
                          ascending=[False, True]).head(20)
    return out.reset_index(drop=True)


def _q6_uniq_first(sf_dir: str):
    import ray.data as rd
    from mapshaper_ray.ops.relational import uniq_first
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "user_id", "value"])
    out = uniq_first(ds, ["user_id"], ["ts", "event_id"])

    # project/rename inside map_batches: Ray's Project op rejects the
    # pandas blocks that map_groups emits.
    def project(df: pd.DataFrame) -> pd.DataFrame:
        return df[["user_id", "event_id", "value"]].rename(
            columns={"event_id": "first_event_id"})
    return out.map_batches(project, batch_format="pandas")


def _q7_calc_stats(sf_dir: str):
    import ray.data as rd
    from mapshaper_ray.ops.relational import calc_stats
    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_extendedprice"])
    out = calc_stats(ds, "l_extendedprice")
    out["sum_v"] = out["sum_v"].round(2)
    out["avg_v"] = out["avg_v"].round(4)
    return out


def _q8_window(sf_dir: str):
    import ray.data as rd
    from mapshaper_ray.ops.relational import window_tumbling
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts", "value"])
    out = window_tumbling(ds, "event_type", "ts", 3600, {
        "n": ("value", "count"),
        "sum_value": ("value", "sum"),
    }).to_pandas()
    out["sum_value"] = out["sum_value"].round(4)
    return out


def _geo_points(sf_dir: str):
    """documents → deterministic geocoded points + cell/tile columns."""
    import ray.data as rd
    from mapshaper_ray.stages.geocode import geocode
    from mapshaper_ray.stages.tiles import assign_cells
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "n_chars"])
    ds = geocode(ds)
    ds = assign_cells(ds)
    return ds


def _q9_cells(sf_dir: str):
    from mapshaper_ray.ops.relational import groupby_agg
    ds = _geo_points(sf_dir)
    return groupby_agg(ds, ["tile"], {"n_pages": ("doc_id", "count")})


def _q10_spatial_join(sf_dir: str):
    from mapshaper_ray.pipelines.flagship import build_pipeline
    ds = build_pipeline(sf_dir)
    return ds.select_columns(["doc_id", "region_id", "tile"])


def _q11_region_counts(sf_dir: str):
    from mapshaper_ray.ops.relational import groupby_agg
    from mapshaper_ray.pipelines.flagship import build_pipeline
    ds = build_pipeline(sf_dir)
    out = groupby_agg(ds, ["region_id"], {
        "n_pages": ("doc_id", "count")}).to_pandas()
    out["region_name"] = np.where(
        out["region_id"] >= 0,
        "region_" + out["region_id"].astype(int).astype(str).str.zfill(2),
        None)
    return out


def _q12_exact_dedup(sf_dir: str):
    import ray.data as rd
    from mapshaper_ray.ops.dedup import exact_dedup
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    out = exact_dedup(ds, text_col="text", order_col="doc_id")
    return out.select_columns(["doc_id", "content_md5"])


def _q13_token_stats(sf_dir: str):
    import ray.data as rd
    from mapshaper_ray.stages.text import analyze_text
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    out = analyze_text(ds)
    return out.select_columns(["doc_id", "tok_count", "n_chars2"])


def _q14_ann_topk(sf_dir: str):
    import ray.data as rd
    from mapshaper_ray.ops.ann import brute_topk
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    qdf = pd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    qdf = qdf[qdf["vec_id"] < 4].sort_values("vec_id")
    queries = np.stack(qdf["embedding"].to_numpy()).astype(np.float64)
    out = brute_topk(emb, queries, qdf["vec_id"].to_numpy(), k=15).to_pandas()
    # rank on rounded cosine for float robustness vs the SQL oracle
    out["cosine"] = out["cosine"].round(6)
    out = out.sort_values(["query_id", "cosine", "vec_id"],
                          ascending=[True, False, True], kind="mergesort")
    out = out.groupby("query_id", sort=True).head(10).reset_index(drop=True)
    return out


def _q15_embedding_neardup(sf_dir: str):
    """Exact near-dup pairs (synthetic embeddings have max cosine ~0.51,
    so 0.35 exercises real pair output; LSH variant is the scale path)."""
    import ray.data as rd
    from mapshaper_ray.ops.dedup import embedding_near_dup_exact
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    out = embedding_near_dup_exact(emb, threshold=0.35).to_pandas()
    if "cosine" not in out.columns:  # no pair anywhere -> schemaless empty
        out = pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                            "id_b": pd.Series([], dtype="int64"),
                            "cosine": pd.Series([], dtype="float64")})
    out["cosine"] = out["cosine"].round(6)
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def _q16_minhash_pairs(sf_dir: str):
    import ray.data as rd
    from mapshaper_ray.ops.dedup import minhash_lsh
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    out = minhash_lsh(ds, threshold=0.4)
    out["jaccard"] = out["jaccard"].round(6)
    return out


def _q47_ngram_jaccard(sf_dir: str):
    """Exact all-pairs 3-token-shingle Jaccard >= 0.6 via prefix
    filtering (PPJoin) — deterministic, no probabilistic stage, so the
    all-pairs SQL IS the same computation."""
    import ray.data as rd
    from mapshaper_ray.ops.dedup import all_pairs_jaccard
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    out = all_pairs_jaccard(ds, threshold=0.6, shingle_k=3)
    out["jaccard"] = out["jaccard"].round(6)
    return out


def _q48_dedup_clusters(sf_dir: str):
    """Near-dup clusters: MinHash-LSH pairs (recall 1 on this corpus —
    the q16-verified exact pair set) → DISTRIBUTED connected
    components (alternating large-star/small-star contraction over
    bucket-hash partitions) → (doc_id, cluster_id = component min)."""
    import ray.data as rd
    from mapshaper_ray.ops.dedup import cluster_pairs, minhash_lsh
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    pairs = minhash_lsh(ds, threshold=0.4)
    labels = cluster_pairs(rd.from_pandas(pairs[["id_a", "id_b"]]))
    out = labels.to_pandas().rename(columns={"node": "doc_id"})
    return out.sort_values("doc_id").reset_index(drop=True)


def _q49_dedup_near(sf_dir: str):
    """End-to-end fuzzy dedup: drop every near-dup doc except each
    cluster's min-id representative; returns surviving doc_ids."""
    import ray.data as rd
    from mapshaper_ray.ops.dedup import dedup_near
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    out = dedup_near(ds, threshold=0.4).to_pandas()
    return out[["doc_id"]].sort_values("doc_id").reset_index(drop=True)


def _q50_dup_window_stats(sf_dir: str):
    """Per-doc duplicated-passage share (fraction of distinct 5-token
    windows occurring in >1 doc corpus-wide) — Lee et al. 2022 style
    dedup quality signal, exact by construction."""
    import ray.data as rd
    from mapshaper_ray.ops.dedup import duplicate_window_stats
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    out = duplicate_window_stats(ds).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _q51_token_df(sf_dir: str):
    """Corpus vocabulary: top-100 tokens by document frequency
    (bucketed count + per-partition top-k merge)."""
    import ray.data as rd
    from mapshaper_ray.stages.text import token_df_topk
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return token_df_topk(ds, k=100)


def _q52_sessions(sf_dir: str):
    """Event sessionization (4h inactivity gap): one bucketed shuffle
    by user-id hash, vectorized per-partition lexsort + gap cumsum."""
    import ray.data as rd
    from mapshaper_ray.ops.relational import sessionize
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])
    out = sessionize(ds, gap_s=4 * 3600).to_pandas()
    return out.sort_values(["user_id", "session_seq"]) \
        .reset_index(drop=True)


def _q53_asof_join(sf_dir: str):
    """As-of join: each purchase matched to the user's most recent
    click at-or-before it (inner).  Ray Data lacks a native as-of
    join; this is the bucket-shuffle + per-group searchsorted
    composition, validated against DuckDB's native ASOF JOIN."""
    import ray.data as rd
    from mapshaper_ray.ops.relational import asof_join
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "user_id",
                                  "event_type"])

    def side(kind):
        def _f(df):
            return df[df["event_type"] == kind] \
                .drop(columns=["event_type"])
        return _f
    left = ev.map_batches(side("purchase"), batch_format="pandas")
    right = ev.map_batches(side("click"), batch_format="pandas")
    out = asof_join(left, right, on="ts", by="user_id",
                    right_cols=("event_id",), suffix="_click")
    return out.to_pandas().sort_values("event_id") \
        .reset_index(drop=True)


def _q54_range_join(sf_dir: str):
    """Interval join: every event tagged with the 4h-gap session
    containing it (sessions from q52's sessionize) — Ray Data has no
    native range join; validated against a SQL BETWEEN join."""
    import ray.data as rd
    from mapshaper_ray.ops.relational import range_join, sessionize
    # materialize the narrow read once: BOTH branches (sessionize and
    # the join's left side) consume it — without this the plan scans
    # events.parquet twice
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts"]) \
        .materialize()
    sess = sessionize(ev, gap_s=4 * 3600)
    out = range_join(ev, sess, by="user_id", on="ts",
                     lo="t_start", hi="t_end",
                     right_cols=("session_seq",), suffix="")
    return out.to_pandas().sort_values("event_id") \
        .reset_index(drop=True)


def _q55_group_quantiles(sf_dir: str):
    """Exact per-group quantiles of l_quantity by returnflag/linestatus
    (bucket shuffle; one vectorized quantile pass per partition)."""
    import ray.data as rd
    from mapshaper_ray.ops.relational import groupby_quantiles

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_returnflag", "l_quantity"])
    out = groupby_quantiles(ds, "l_returnflag", "l_quantity",
                            qs=(0.25, 0.5, 0.75)).to_pandas()
    for c in ("q25", "q50", "q75"):
        out[c] = out[c].round(6)
    return out.sort_values("l_returnflag").reset_index(drop=True)


def _q56_repetition(sf_dir: str):
    """Gopher-style per-doc repetition quality signals (distinct-word
    ratio, top-/duplicated-bigram occurrence shares) — one stateless
    map_batches pass, no shuffle."""
    import ray.data as rd
    from mapshaper_ray.stages.text import repetition_signals
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    out = repetition_signals(ds).to_pandas()
    for c in ("distinct_word_ratio", "top_bigram_share",
              "dup_bigram_share"):
        out[c] = out[c].round(6)
    return out.sort_values("doc_id").reset_index(drop=True)


def _q57_s2_cells(sf_dir: str):
    """S2 cell/tile assignment of the geocoded corpus (north-star
    "H3/S2 cell covers"): vectorized face→UV→ST→Hilbert encode at
    level 12 + level-6 ancestor tiles, zero-copy pyarrow batches.
    Oracle: VALUES fixture from an independent scalar interval-descent
    encoder (scripts/gen_s2_fixture.py)."""
    import ray.data as rd
    from mapshaper_ray import s2
    from mapshaper_ray.stages.geocode import geocode
    from mapshaper_ray.stages.tiles import assign_cells_s2
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "n_chars"])
    ds = assign_cells_s2(geocode(ds), level=12, tile_level=6)
    out = ds.select_columns(["doc_id", "s2_cell", "s2_tile"]).to_pandas()
    out["s2_cell"] = s2.token(out["s2_cell"].to_numpy())
    out["s2_tile"] = s2.token(out["s2_tile"].to_numpy())
    return out.sort_values("doc_id").reset_index(drop=True)


def _q58_cover_join(sf_dir: str):
    """S2-cover SHUFFLE spatial join (north star "H3/S2 cell covers"):
    geocoded pages joined to the diamond regions with nothing
    broadcast — per-polygon mixed-level covers, equality hash join on
    ancestor cells, interior-cell bypass, exact PIP verify after a
    poly-id bucket shuffle.  Oracle: the same closed-form diamond
    inequality SQL as q10, restricted to matches."""
    import ray.data as rd
    from mapshaper_ray.regions import diamond, region_centers
    from mapshaper_ray.stages.geocode import geocode
    from mapshaper_ray.stages.spatial_join import cover_join
    rows = []
    for rid, cx, cy in region_centers():
        ring = diamond(cx, cy)
        rows.append({"region_id": rid,
                     "rings_x": [ring[:, 0]], "rings_y": [ring[:, 1]]})
    polys = rd.from_pandas(pd.DataFrame(rows))
    pts = geocode(rd.read_parquet(f"{sf_dir}/documents.parquet",
                                  columns=["doc_id", "text", "n_chars"]))
    pts = pts.select_columns(["doc_id", "lon", "lat"])
    out = cover_join(pts, polys, level=8,
                     poly_id_col="region_id").to_pandas()
    return out[["doc_id", "region_id"]].sort_values("doc_id") \
        .reset_index(drop=True)


def _q59_host_stats(sf_dir: str):
    """Per-domain corpus stats over the Common-Crawl-style pages:
    host parsed from the url by a vectorized Arrow regex, then a
    partial+final groupby.  The oracle never sees the url — it derives
    the host arithmetically from doc_id, so the parse itself is under
    test."""
    from mapshaper_ray.ops.relational import groupby_agg
    from mapshaper_ray.stages.pages import add_url_host, synth_pages

    pages = add_url_host(synth_pages(sf_dir))

    def measure(batch):
        import pyarrow as pa
        import pyarrow.compute as pc
        # int64: utf8_length is int32 and an int32 SUM overflows at
        # corpus scale (also the driver hash is dtype-sensitive)
        return batch.select(["host"]).append_column(
            "n_chars3", pc.cast(pc.utf8_length(batch["text"]),
                                pa.int64()))
    narrow = pages.map_batches(measure, batch_format="pyarrow")
    out = groupby_agg(narrow, ["host"], {
        "n_pages": ("n_chars3", "count"),
        "sum_chars": ("n_chars3", "sum")}).to_pandas()
    return out.sort_values("host").reset_index(drop=True)


def _q60_group_sample(sf_dir: str):
    """Stratified quota sample: 20 docs per language, ranked by a
    deterministic md5(text+seed) hash — one bucket shuffle + one
    vectorized lexsort/cumcount per partition."""
    import ray.data as rd
    from mapshaper_ray.stages.text import sample_per_group
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "lang", "text"])
    out = sample_per_group(ds, key="lang", n=20, seed="s0").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


_BM25_TERMS = ("window", "stream", "hash")


def _q61_bm25(sf_dir: str):
    """BM25 top-50 for a fixed 3-term query: integer-exact corpus
    stats reduce, stateless scoring pass, partial top-k merge."""
    import ray.data as rd
    from mapshaper_ray.stages.text import bm25_topk
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return bm25_topk(ds, _BM25_TERMS, k=50)


def _q62_pagerank(sf_dir: str):
    """Distributed PageRank (5 power iterations, d=0.85) over a
    deterministic 3-out-link citation graph on doc ids — the
    iterative-pipeline operator: per iteration one bucket-hash join +
    one grouped sum; rank vector stays in the object store.  Oracle:
    the same five iterations unrolled as SQL CTEs."""
    import ray.data as rd
    from mapshaper_ray.ops.graph import pagerank
    ids = rd.read_parquet(f"{sf_dir}/documents.parquet",
                          columns=["doc_id"])
    n = ids.count()

    def mk_edges(df):
        d = df["doc_id"].to_numpy()
        src = np.concatenate([d, d, d])
        dst = np.concatenate([(d * 7 + 1) % n, (d * 13 + 5) % n,
                              (d * 31 + 11) % n])
        return pd.DataFrame({"src": src, "dst": dst})

    def as_node(df):
        return pd.DataFrame({"node": df["doc_id"].to_numpy()})

    edges = ids.map_batches(mk_edges, batch_format="pandas")
    nodes = ids.map_batches(as_node, batch_format="pandas")
    out = pagerank(edges, nodes, damping=0.85, iters=5).to_pandas()
    out = out.rename(columns={"node": "doc_id"})
    out["rank"] = out["rank"].round(9)
    return out.sort_values("doc_id").reset_index(drop=True)


def _q63_kmeans(sf_dir: str):
    """Distributed k-means over the embedding table (k=8, 3 Lloyd
    iterations, integer-quantized so every assignment and centroid
    update is bit-reproducible): broadcast centroids, one stateless
    partial-sums pass per iteration, driver reduces k tiny rows.
    Oracle: the same three iterations unrolled as SQL CTEs over
    list_dot_product distances."""
    import ray.data as rd
    from mapshaper_ray.ops.cluster import kmeans
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    out = kmeans(ds, k=8, iters=3, scale=1024).to_pandas()
    return out.sort_values("vec_id").reset_index(drop=True)


def _q64_lm_nll(sf_dir: str):
    """Unigram-LM perplexity quality scoring (CCNet-style): corpus
    token counts (bucket shuffle, driver holds only the vocab table),
    broadcast, then one stateless scoring pass.  Quantized-log
    arithmetic keeps the per-doc sums integer-exact, so the SQL
    oracle matches value-exact."""
    import ray.data as rd
    from mapshaper_ray.stages.text import lm_nll
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    out = lm_nll(ds).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _q65_semantic_dedup(sf_dir: str):
    """SemDeDup: k-means cluster prefilter + within-cluster exact
    cosine, keep the lowest id of each duplicate set — the scale path
    for embedding dedup (pair cost bounded per cluster instead of the
    q15 all-pairs matmul).  Survivors with their cluster id."""
    import ray.data as rd
    from mapshaper_ray.ops.cluster import semantic_dedup
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    out = semantic_dedup(ds, k=8, iters=3, scale=1024,
                         threshold=0.35).to_pandas()
    return out.sort_values("vec_id").reset_index(drop=True)


def _q66_redact_pii(sf_dir: str):
    """PII scrubbing (email/phone regex redaction) as an actor-pool
    stage.  The corpus has no natural PII, so both engines inject the
    same deterministic email+phone per doc before redacting — the
    oracle checks the actual redacted text byte-for-byte."""
    import ray.data as rd
    from mapshaper_ray.stages.text import redact_pii

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def inject(df: pd.DataFrame) -> pd.DataFrame:
        d = df["doc_id"].astype("int64")
        return pd.DataFrame({
            "doc_id": d.to_numpy(),
            "text": df["text"].to_numpy() + " contact user"
            + d.astype(str) + "@mail" + (d % 7).astype(str)
            + ".example.org or call "
            + (d % 1000).astype(str).str.zfill(3) + "-555-"
            + (d % 10000).astype(str).str.zfill(4)})

    out = redact_pii(ds.map_batches(inject, batch_format="pandas")) \
        .to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _q67_pack_sequences(sf_dir: str):
    """Sequence packing for pretraining: the doc-ordered token stream
    cut into fixed 512-token examples via a distributed prefix scan
    (per-bucket totals to the driver, in-bucket vectorized cumsum —
    one shuffle, no sort).  One row per (example, doc) span; integer
    arithmetic end-to-end, so the SQL window-cumsum oracle is exact."""
    import ray.data as rd
    from mapshaper_ray.stages.text import pack_sequences
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    out = pack_sequences(ds, seq_len=512).to_pandas()
    return out.sort_values(["example_id", "doc_id"]) \
        .reset_index(drop=True)


def _q68_exact_substring_dedup(sf_dir: str):
    """Exact substring-span dedup (Lee et al. 2022 ExactSubstr): every
    duplicated 5-token window keeps one canonical occurrence; other
    occurrences' tokens are removed and each doc's text rebuilt.
    Documents never move: window hashes shuffle by hash (global
    counts/argmins in-partition), covered spans shuffle by doc as
    integer lists, a bucketed left join + difference-array mask
    rebuilds the text."""
    import ray.data as rd
    from mapshaper_ray.ops.dedup import exact_substring_dedup
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    out = exact_substring_dedup(ds, k=5).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _q69_dsir_weights(sf_dir: str):
    """DSIR data-selection importance weights (Xie et al. 2023):
    hashed-bigram features, add-1-smoothed target (lang='en') vs
    full-corpus proposal, per-doc mean log-ratio.  One partial-count
    pass (2x1024 ints reach the driver), broadcast quantized-log
    tables, one stateless scoring pass — integer-exact vs DuckDB ln."""
    import ray.data as rd
    from mapshaper_ray.stages.text import dsir_weights
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "lang"])
    out = dsir_weights(ds).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _q70_ann_pq(sf_dir: str):
    """Product-quantization ANN (Jégou et al. 2011) with exact
    re-rank: codebooks train on a seeded sample, vectors encode once
    to uint8 codes (the 32x-smaller scan side), ADC lookup-table scan
    shortlists candidates, and only the shortlist re-ranks against
    the original vectors.  Output = exact top-k (validated: the true
    top-10 survives the default shortlist at the driver scales), so
    the exact-cosine SQL is a value-exact oracle — the q43 pattern."""
    import numpy as np
    import ray.data as rd
    from mapshaper_ray.ops.ann import pq_topk
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    qdf = pd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    head = qdf[(qdf["vec_id"] >= 4) & (qdf["vec_id"] < 8)] \
        .sort_values("vec_id")
    queries = np.stack(head["embedding"].to_numpy())
    out = pq_topk(ds, queries, head["vec_id"].to_numpy(), k=10,
                  m_subspaces=16, n_codes=16, shortlist=16).to_pandas()
    out["cosine"] = out["cosine"].round(6)
    return out.sort_values(["query_id", "cosine", "vec_id"],
                           ascending=[True, False, True]) \
        .reset_index(drop=True)


def _q71_bpe_train(sf_dir: str):
    """BPE tokenizer training (Sennrich et al. 2016): 20 merge rules
    learned from the corpus.  One corpus pass builds the distributed
    (word, freq) vocab; each merge iteration is a stateless
    pair-count pass + pair-hash bucket top-1 (driver sees n_parts
    candidate rows) + broadcast rewrite.  Oracle: VALUES fixture from
    an independent scalar trainer (scripts/gen_bpe_fixture.py)."""
    import ray.data as rd
    from mapshaper_ray.stages.text import bpe_train
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["text"])
    return bpe_train(ds, n_merges=20)


def _q72_bpe_encode(sf_dir: str):
    """Tokenize the corpus with the trained BPE merges (greedy rank
    replay per word, per-actor distinct-word cache): per-doc word and
    subword counts — the compression diagnostic.  Oracle: VALUES
    fixture from the independent scalar encoder
    (scripts/gen_bpe_fixture.py)."""
    import ray.data as rd
    from mapshaper_ray.stages.text import bpe_encode, bpe_train
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    merges = bpe_train(ds, n_merges=20)
    out = bpe_encode(ds, merges).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _q73_window_hopping(sf_dir: str):
    """Hopping (sliding) window aggregate over events: 2h windows
    every 1h, so each event lands in two windows — one vectorized
    replicate pass + the partial+final grouped aggregation."""
    import ray.data as rd
    from mapshaper_ray.ops.relational import window_hopping
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts", "value"])
    out = window_hopping(ds, "event_type", "ts", 7200, 3600, {
        "n": ("value", "count"),
        "sum_value": ("value", "sum"),
    }).to_pandas()
    out["sum_value"] = out["sum_value"].round(4)
    return out.sort_values(["event_type", "window_start"]) \
        .reset_index(drop=True)


def _q74_mix_sample(sf_dir: str):
    """Deterministic training-mix sampling: each source contributes
    docs in md5(text+seed) hash order until a 600-token budget fills.
    Distributed prefix scan along the hash order (bucket by hash
    range, S x 64 totals to the driver, broadcast exclusive prefixes,
    one vectorized in-partition decide) — no global sort."""
    import ray.data as rd
    from mapshaper_ray.stages.text import mix_sample
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "source"])
    out = mix_sample(ds, 600).to_pandas()
    out["n_tokens"] = out["n_tokens"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


def _q75_quality_filter(sf_dir: str):
    """Composed quality-filter pipeline (CCNet-style): unigram-LM
    perplexity per doc (lm_nll) -> per-source EXACT p75 thresholds
    (groupby_quantiles bucket shuffle) -> broadcast threshold filter.
    Keeps docs at or below their source's p75 (lower nll = more
    fluent).  Three existing operators composed; the thresholds table
    (one row per source) broadcasts — no second corpus shuffle."""
    import ray
    import ray.data as rd
    from mapshaper_ray.ops.relational import (groupby_quantiles,
                                              hash_join)
    from mapshaper_ray.stages.text import lm_nll
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "source"])
    scored = hash_join(
        lm_nll(ds), ds, on="doc_id",
        left_cols=["doc_id", "lm_nll"],
        right_cols=["doc_id", "source"]).materialize()
    thr = groupby_quantiles(scored, "source", "lm_nll",
                            qs=(0.75,)).to_pandas()
    cuts = dict(zip(thr["source"], thr["q75"]))
    cref = ray.put(cuts)

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        c = ray.get(cref)
        lim = df["source"].map(c).to_numpy(dtype=np.float64)
        return df[df["lm_nll"].to_numpy() <= lim]

    out = scored.map_batches(keep, batch_format="pandas").to_pandas()
    return out[["doc_id", "source", "lm_nll"]] \
        .sort_values("doc_id").reset_index(drop=True)


def _q76_decontaminate(sf_dir: str):
    """Benchmark decontamination (GPT-3-style train/test overlap):
    docs 0..19 act as the held-out benchmark; every corpus doc
    sharing an 8-token window with any of them is flagged with its
    hit count.  Benchmark window hashes broadcast once (small side);
    the corpus pass is stateless, no shuffle."""
    import ray.data as rd
    from mapshaper_ray.stages.text import decontaminate
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    bench = rd.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text"],
        filter=__import__("pyarrow").dataset.field("doc_id") < 20)
    out = decontaminate(ds, bench, k=8).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _q17_simhash(sf_dir: str):
    import ray.data as rd
    from mapshaper_ray.ops.dedup import simhash
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    out = simhash(ds).to_pandas()
    out["simhash"] = out["simhash"].astype("uint64").astype(str)
    return out[["doc_id", "simhash", "simhash_prefix"]]


def _q18_text_quality(sf_dir: str):
    import ray.data as rd
    from mapshaper_ray.stages.text import analyze_text, fingerprint
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    out = fingerprint(analyze_text(ds)).to_pandas()
    out["quality"] = out["quality"].round(6)
    out["fingerprint"] = out["fingerprint"].astype("uint64").astype(str)
    return out[["doc_id", "lang_pred", "quality", "fingerprint"]]


def _q19_simplify(sf_dir: str):
    from mapshaper_ray.pipelines.geometry import simplify_pipeline
    return simplify_pipeline(sf_dir, pct=0.5)


def _q20_dissolve(sf_dir: str):
    from mapshaper_ray.pipelines.geometry import dissolve_pipeline
    out = dissolve_pipeline(sf_dir)

    # the oracle reproduces perimeter/area by independent edge-multiset
    # arithmetic; ring counting needs connectivity (not SQL-checkable)
    def project(df: pd.DataFrame) -> pd.DataFrame:
        return df[["grp", "perimeter", "area"]]
    return out.map_batches(project, batch_format="pandas")


def _q21_region_point_agg(sf_dir: str):
    """Reverse spatial join: polygon receives aggregates of its points."""
    from mapshaper_ray.ops.relational import groupby_agg
    from mapshaper_ray.regions import build_region_index
    from mapshaper_ray.stages.spatial_join import spatial_join
    ds = _geo_points(sf_dir)
    joined = spatial_join(ds, build_region_index(), attrs=None, how="inner")
    return groupby_agg(joined, ["region_id"], {
        "n_points": ("doc_id", "count"),
        "sum_chars": ("n_chars", "sum"),
    })


def _q22_knn(sf_dir: str):
    """Nearest other point (among doc_id < 2000) for each of the first 50
    geocoded pages — broadcast queries + per-batch partial min."""
    import ray
    from mapshaper_ray.ops.relational import filter_expr
    ds = _geo_points(sf_dir).select_columns(["doc_id", "lon", "lat"])
    ds = filter_expr(ds, "doc_id < 2000")
    qdf = ds.to_pandas().sort_values("doc_id").head(50)
    ref = ray.put((qdf["doc_id"].to_numpy(), qdf["lon"].to_numpy(),
                   qdf["lat"].to_numpy()))

    class NN:
        def __init__(self):
            self.qid, self.qx, self.qy = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            px = df["lon"].to_numpy()
            py = df["lat"].to_numpy()
            pid = df["doc_id"].to_numpy()
            frames = []
            d2 = ((px[None, :] - self.qx[:, None]) ** 2 +
                  (py[None, :] - self.qy[:, None]) ** 2)
            d2[pid[None, :] == self.qid[:, None]] = np.inf  # exclude self
            best = np.argmin(d2, axis=1)
            return pd.DataFrame({
                "doc_id": self.qid,
                "neighbor_id": pid[best],
                "dist2": d2[np.arange(len(self.qid)), best]})

    partials = ds.map_batches(NN, batch_format="pandas", batch_size=8192,
                              concurrency=(1, 4), num_cpus=1).to_pandas()
    out = partials.sort_values(["dist2", "neighbor_id"]).groupby(
        "doc_id", sort=True).head(1).reset_index(drop=True)
    out["dist2"] = out["dist2"].round(9)
    return out[["doc_id", "neighbor_id", "dist2"]]


def _q23_clip_points(sf_dir: str):
    """Point clip = spatial SEMI join: keep geocoded pages inside the
    region polygons (boundary counts as inside)."""
    from mapshaper_ray.ops.clip import clip_points
    from mapshaper_ray.regions import build_region_index
    ds = _geo_points(sf_dir).select_columns(["doc_id", "lon", "lat"])

    def to_pts(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "feature_id": df["doc_id"],
            "doc_id": df["doc_id"],
            "px": [[v] for v in df["lon"]],
            "py": [[v] for v in df["lat"]]})
    pts = ds.map_batches(to_pts, batch_format="pandas")
    out = clip_points(pts, build_region_index())

    def flat(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"doc_id": df["doc_id"]})
    return out.map_batches(flat, batch_format="pandas")


def _q24_erase_points(sf_dir: str):
    """Point erase = spatial ANTI join: pages outside every region."""
    from mapshaper_ray.ops.clip import erase_points
    from mapshaper_ray.regions import build_region_index
    ds = _geo_points(sf_dir).select_columns(["doc_id", "lon", "lat"])

    def to_pts(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "feature_id": df["doc_id"],
            "doc_id": df["doc_id"],
            "px": [[v] for v in df["lon"]],
            "py": [[v] for v in df["lat"]]})
    pts = ds.map_batches(to_pts, batch_format="pandas")
    out = erase_points(pts, build_region_index())

    def flat(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"doc_id": df["doc_id"]})
    return out.map_batches(flat, batch_format="pandas")


def _q25_webmercator(sf_dir: str):
    """-proj webmercator over geocoded pages (spherical EPSG:3857)."""
    from mapshaper_ray.stages.proj import project_points
    ds = _geo_points(sf_dir).select_columns(["doc_id", "lon", "lat"])
    out = project_points(ds, "webmercator").to_pandas()
    out["x"] = out["x"].round(4)
    out["y"] = out["y"].round(4)
    return out[["doc_id", "x", "y"]]


def _q88_natearth2(sf_dir: str):
    """-proj +proj=natearth2 (round-4 long-tail family; closed-form
    polynomial pseudocylindrical — mproj pj_natearth2 constants)."""
    from mapshaper_ray.stages.proj import project_points
    ds = _geo_points(sf_dir).select_columns(["doc_id", "lon", "lat"])
    out = project_points(ds, "+proj=natearth2").to_pandas()
    out["x"] = out["x"].round(4)
    out["y"] = out["y"].round(4)
    return out[["doc_id", "x", "y"]]


def _q89_tissot(sf_dir: str):
    """-proj +proj=tissot +lat_1=20 +lat_2=60 (round-4 simple-conic
    family; closed-form spherical conic — mproj pj_sconic TISSOT)."""
    from mapshaper_ray.stages.proj import project_points
    ds = _geo_points(sf_dir).select_columns(["doc_id", "lon", "lat"])
    out = project_points(
        ds, "+proj=tissot +lat_1=20 +lat_2=60").to_pandas()
    out["x"] = out["x"].round(4)
    out["y"] = out["y"].round(4)
    return out[["doc_id", "x", "y"]]


def _q90_js_each(sf_dir: str):
    """-each with genuinely-JS expressions (the ops/jsexpr
    compatibility path): ternary, ===, string methods, + coercion —
    value-exact against a CASE WHEN / upper() SQL oracle."""
    import ray.data as rd
    from mapshaper_ray.ops.relational import each_expr
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "lang", "source",
                                  "n_chars"])
    out = each_expr(ds, {
        "lang_up": "lang.toUpperCase()",
        "cls": "n_chars > 300 ? 'long' : 'short'",
        "mark": "lang.charAt(0) + doc_id",
        "is_web": "source === 'web' || source === 'news'",
    }).to_pandas()
    return out[["doc_id", "lang_up", "cls", "mark", "is_web"]]


def _q91_hll_distinct(sf_dir: str):
    """HyperLogLog distinct user count (p=12): per-block register
    partials, tree maximum-merge — the corpus never shuffles.
    Oracle: independent scalar HLL fixture
    (scripts/gen_hll_fixture.py)."""
    import ray.data as rd
    from mapshaper_ray.ops.sketch import hll_distinct
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id"])
    return hll_distinct(ds, "user_id", p=12)


def _q92_hll_by_group(sf_dir: str):
    """Per-event-type HyperLogLog distinct users: group register
    partials merged under groupby — 4 KiB per (block, group) moves,
    never the rows.  Oracle: independent scalar HLL fixture."""
    import ray.data as rd
    from mapshaper_ray.ops.sketch import hll_distinct_by_group
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "user_id"])
    return hll_distinct_by_group(ds, "event_type", "user_id", p=12)


def _q93_heavy_hitters(sf_dir: str):
    """EXACT top-20 users by event count via local-top-m candidate
    pruning (union provably complete above N/m) + broadcast recount —
    no full-vocabulary shuffle; falls back to the full groupby when
    the k-th count does not clear the N/m guarantee."""
    import ray.data as rd
    from mapshaper_ray.ops.sketch import heavy_hitters
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id"])
    return heavy_hitters(ds, "user_id", k=20, m=4096)


def _q94_reservoir_sample(sf_dir: str):
    """Deterministic 50-row uniform sample: global n-smallest by
    md5(seed:event_id) via per-batch partial top-n -> block merge ->
    driver final (<= 8n rows on the driver)."""
    import ray.data as rd
    from mapshaper_ray.ops.sketch import reservoir_sample
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "event_type"])
    return reservoir_sample(ds, 50, "event_id", seed=7)


def _q95_bloom_incremental(sf_dir: str):
    """q79's incremental-dedup scenario through the BLOOM-GATED path:
    a Bloom filter built over the old corpus (OR-merged bit-array
    partials) lets definitely-new rows bypass the exchange entirely;
    only bloom hits enter the exact anti join.  Output == the plain
    anti join (the gate is a prefilter, never a decision), so q79's
    SQL is the oracle verbatim."""
    import ray
    import ray.data as rd
    from mapshaper_ray.ops.dedup import content_md5
    from mapshaper_ray.ops.sketch import incremental_dedup_bloom

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"]).materialize()
    old_pdf = pd.read_parquet(f"{sf_dir}/documents.parquet",
                              columns=["doc_id", "text"])
    old_pdf = old_pdf[old_pdf["doc_id"] < 250]
    old_texts = dict(zip(old_pdf["doc_id"], old_pdf["text"]))
    tref = ray.put(old_texts)

    def synth_new(df: pd.DataFrame) -> pd.DataFrame:
        ot = ray.get(tref)
        df = df[df["doc_id"] >= 250].copy()
        ids = df["doc_id"].to_numpy()
        df["text"] = [ot[i % 250] if i % 3 == 0 else t
                      for i, t in zip(ids, df["text"])]
        df["content_md5"] = content_md5(df["text"])
        return df[["doc_id", "content_md5"]]

    def old_md5(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["doc_id"] < 250].copy()
        df["content_md5"] = content_md5(df["text"])
        return df[["doc_id", "content_md5"]]

    new = docs.map_batches(synth_new, batch_format="pandas")
    old = docs.map_batches(old_md5, batch_format="pandas")
    out = incremental_dedup_bloom(old, new, "content_md5",
                                  n_bits=1 << 16, k=4).to_pandas()
    return out[["doc_id", "content_md5"]].sort_values("doc_id") \
        .reset_index(drop=True)


def _q96_ccnet_buckets(sf_dir: str):
    """CCNet-style per-language perplexity bucketing: unigram-LM nll
    (q64's integer-exact scoring), doc language re-attached through
    the bucketed hash join, then exact rank terciles within each
    language (head/middle/tail) via ONE group-hash shuffle +
    vectorized in-partition lexsort (ops/rank.grouped_rank_buckets).
    The composition a web-corpus quality pipeline runs per shard."""
    import ray.data as rd
    from mapshaper_ray.ops.rank import grouped_rank_buckets
    from mapshaper_ray.ops.relational import hash_join
    from mapshaper_ray.stages.text import lm_nll

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text", "lang"])
    nll = lm_nll(docs.select_columns(["doc_id", "text"]))
    langs = docs.select_columns(["doc_id", "lang"])
    joined = hash_join(nll, langs, on="doc_id",
                       left_cols=["doc_id", "lm_nll"],
                       right_cols=["lang"])
    out = grouped_rank_buckets(joined, key="lang", col="lm_nll",
                               id_col="doc_id",
                               n_buckets=3).to_pandas()
    out = out[["doc_id", "lang", "lm_nll", "bucket"]]
    return out.sort_values("doc_id").reset_index(drop=True)


def _q97_group_variance(sf_dir: str):
    """Distributive per-group variance/stddev: (sum, sum-of-squares,
    count) partials per batch — one row per (key, block) — reduced
    like mean; no exchange of the value column."""
    import ray.data as rd
    from mapshaper_ray.ops.relational import groupby_agg
    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_returnflag", "l_quantity"])
    out = groupby_agg(ds, ["l_returnflag"],
                      {"var_qty": ("l_quantity", "var"),
                       "std_qty": ("l_quantity", "std")}).to_pandas()
    out["var_qty"] = out["var_qty"].round(6)
    out["std_qty"] = out["std_qty"].round(6)
    return out.sort_values("l_returnflag").reset_index(drop=True)


def _q98_random_project(sf_dir: str):
    """Johnson-Lindenstrauss sign random projection of the embedding
    column to 8 dims (md5-derived +-1 matrix, one matmul per batch) —
    the dim-reduction step before ANN/LSH at corpus scale."""
    import ray.data as rd
    from mapshaper_ray.ops.ann import random_project
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    out = random_project(ds, out_dim=8).to_pandas()
    return out.sort_values(["vec_id", "k"]).reset_index(drop=True)


_Q99_BOILER = ("cookie notice we use cookies and trackers to improve "
               "and measure your experience on our site accept all now")


def _q99_passage_dedup(sf_dir: str):
    """Passage-level exact dedup (Dolma/Gopher paragraph-dedup over
    fixed 10-word passages): every doc gets one of four 20-token
    boilerplate banners PREPENDED (aligned to the passage grid), so
    the banner passages are corpus-wide duplicates — the lowest
    (doc_id, idx) occurrence survives, every other copy is stripped,
    and each doc's own unique passages pass through untouched."""
    import ray.data as rd
    from mapshaper_ray.ops.dedup import passage_dedup
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def banner(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(np.int64)
        v = pd.Series(ids % 4).astype(str)
        return pd.DataFrame({
            "doc_id": ids,
            "text": ("v" + v + " " + _Q99_BOILER + " "
                     + df["text"].to_numpy(object)).to_numpy(object)})

    out = passage_dedup(docs.map_batches(banner, batch_format="pandas"),
                        words=10).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _q100_url_dedup(sf_dir: str):
    """Web-corpus URL canonicalization + dedup: messy crawl URLs
    (mixed-case scheme/host, default ports, utm params, trailing
    slashes, fragments) normalize byte-exactly (RE2-mirrorable rule
    chain), then group to (canonical url, first doc, dup count)."""
    import ray.data as rd
    from mapshaper_ray.ops.relational import groupby_agg
    from mapshaper_ray.stages.pages import normalize_urls
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id"])

    def mess(df: pd.DataFrame) -> pd.DataFrame:
        i = df["doc_id"].to_numpy(np.int64)
        s = pd.Series(np.where(i % 2 == 0, "HTTP", "https"))
        port = pd.Series(np.select([i % 4 == 0, i % 4 == 1],
                                   [":80", ":443"], ""))
        path = ("/Path/" + pd.Series(i % 100).astype(str)
                + pd.Series(np.where(i % 3 == 0, "/", "")))
        qid = pd.Series(i % 200).astype(str)
        query = pd.Series(np.where(
            i % 2 == 0, "?utm_source=feed&id=" + qid,
            "?id=" + qid + "&utm_campaign=x"))
        frag = pd.Series(np.where(i % 5 == 0, "#sec", ""))
        return pd.DataFrame({
            "doc_id": i,
            "url": (s + "://WWW.Site" + pd.Series(i % 50).astype(str)
                    + ".Example" + port + path + query + frag)
                   .to_numpy(object)})

    urls = normalize_urls(docs.map_batches(mess, batch_format="pandas"))
    out = groupby_agg(urls, ["url_norm"],
                      {"first_doc": ("doc_id", "min"),
                       "n_dups": ("doc_id", "count")},
                      final="distributed").to_pandas()
    out["first_doc"] = out["first_doc"].astype(np.int64)
    out["n_dups"] = out["n_dups"].astype(np.int64)
    return out.sort_values("url_norm").reset_index(drop=True)


def _q101_nn_join(sf_dir: str):
    """Dataset x dataset exact cosine top-k join (odd vec_ids query
    the even-id corpus): query blocks live in the object store and
    every corpus batch matmuls against them — neither side is
    driver-materialized, shuffle is k rows per (query, batch)."""
    import ray.data as rd
    from mapshaper_ray.ops.ann import nn_join
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])

    def parity(df: pd.DataFrame, keep: int) -> pd.DataFrame:
        return df[df["vec_id"].to_numpy(np.int64) % 2 == keep]

    q = emb.map_batches(parity, fn_kwargs={"keep": 1},
                        batch_format="pandas")
    c = emb.map_batches(parity, fn_kwargs={"keep": 0},
                        batch_format="pandas")
    out = nn_join(q, c, k=3).to_pandas()
    out["cosine"] = out["cosine"].round(6)
    return out.sort_values(["query_id", "cosine", "vec_id"],
                           ascending=[True, False, True]) \
        .reset_index(drop=True)


def _q102_pmi_bigrams(sf_dir: str):
    """Top-50 adjacent-bigram PMI (phrase-mining collocations): one
    corpus scan of partial unigram/bigram counts, count-gated unigram
    broadcast, quantized-log integer PMI (exact vs libm/DuckDB ln)."""
    import ray.data as rd
    from mapshaper_ray.stages.text import pmi_bigrams
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    out = pmi_bigrams(docs, top_k=50, min_count=5)
    return out[["w1", "w2", "c", "pmi_q"]]


def _q103_gopher_rules(sf_dir: str):
    """Gopher quality-rule flags (Rae et al. 2021): each doc gets a
    deterministic junk tail (digit words, '#', '...') so the word
    count / mean-word-length / alpha-fraction / symbol-ratio /
    stop-word rules all discriminate; one stateless vectorized pass,
    metrics + keep flag value-exact vs the SQL rule mirror."""
    import ray.data as rd
    from mapshaper_ray.stages.text import gopher_quality
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def junk(df: pd.DataFrame) -> pd.DataFrame:
        i = df["doc_id"].to_numpy(np.int64)
        t = (df["text"].fillna("")
             + pd.Series(np.full(len(df), " 123")).str.repeat(i % 8)
             + pd.Series(np.full(len(df), " #")).str.repeat(i % 6)
             + pd.Series(np.full(len(df), " ...")).str.repeat(i % 3))
        return pd.DataFrame({"doc_id": i,
                             "text": t.to_numpy(object)})

    out = gopher_quality(docs.map_batches(junk, batch_format="pandas"),
                         min_words=40).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _q104_c4_filter(sf_dir: str):
    """C4 line-level cleaning (Raffel et al. 2020): docs are re-lined
    into 6-word lines with deterministic suffixes (some end '.', some
    get a blocklisted 'cookie' marker); lines must have >=5 words,
    terminal punctuation and no blocklist hit, docs must keep >=2
    lines — rebuilt text byte-exact vs the SQL mirror."""
    import ray.data as rd
    from mapshaper_ray.stages.text import c4_filter
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def to_lines(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(np.int64)
        outs = []
        for i, t in zip(ids, df["text"].fillna("")):
            ws = t.split(" ") if t else []
            lines = []
            for idx in range(0, (len(ws) + 5) // 6):
                chunk = " ".join(ws[idx * 6:idx * 6 + 6])
                m = (i + idx) % 7
                if m == 0:
                    chunk += " cookie deal."
                elif (i + idx) % 3 == 0:
                    chunk += "."
                lines.append(chunk)
            outs.append("\n".join(lines))
        return pd.DataFrame({"doc_id": ids,
                             "text": np.array(outs, object)})

    out = c4_filter(docs.map_batches(to_lines, batch_format="pandas"),
                    min_line_words=5, min_lines=2).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _q105_tfidf(sf_dir: str):
    """Per-doc top-5 terms by tf-idf: one distinct-(token,doc)
    token-hash shuffle builds the df vocab (count-gated broadcast),
    scoring is per-doc local; idf is quantized-log integer so the
    SQL oracle matches integer-exactly."""
    import ray.data as rd
    from mapshaper_ray.stages.text import tfidf_topk
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    out = tfidf_topk(docs, k=5).to_pandas()
    return out.sort_values(["doc_id", "score_q", "token"],
                           ascending=[True, False, True]) \
        .reset_index(drop=True)


def _q106_inverted_index(sf_dir: str):
    """Distributed inverted-index build: token -> (df, first 20
    posting doc ids) fully inside the token-hash partitions — the
    driver never holds the index."""
    import ray.data as rd
    from mapshaper_ray.stages.text import inverted_index
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    out = inverted_index(docs, min_df=2, max_postings=20).to_pandas()
    out["df"] = out["df"].astype(np.int64)
    return out.sort_values("token").reset_index(drop=True)


def _q107_cms(sf_dir: str):
    """Count-min sketch (Cormode & Muthukrishnan 2005): one pass of
    4x512 counter partials (the corpus never shuffles), estimates
    queried for the exact global top-20 tokens (heavy_hitters) —
    sketch counters are md5-derived so SQL rebuilds the identical
    sketch and the (token, exact, estimate) rows match value-exactly."""
    import ray.data as rd
    from mapshaper_ray.ops.sketch import cms_build, cms_query, \
        heavy_hitters
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["text"])

    def toks(df: pd.DataFrame) -> pd.DataFrame:
        parts = [t.split(" ") for t in df["text"].fillna("") if t]
        tok = (np.concatenate([np.asarray(p, object) for p in parts])
               if parts else np.empty(0, object))
        return pd.DataFrame({"token": tok})

    tok_ds = docs.map_batches(toks, batch_format="pandas")
    top = heavy_hitters(tok_ds, "token", k=20)
    cms = cms_build(tok_ds, "token", d=4, w=512)
    est = cms_query(cms, list(top["token"]))
    out = pd.DataFrame({"token": top["token"].to_numpy(object),
                        "c_exact": top["freq"].to_numpy(np.int64),
                        "c_est": est.astype(np.int64)})
    return out.sort_values(["c_exact", "token"],
                           ascending=[False, True]) \
        .reset_index(drop=True)


def _q108_stratified_split(sf_dir: str):
    """Deterministic per-language train/valid/test split with exact
    80/10/10 quotas (md5-rank within stratum) — one tiny group-size
    reduce + one key-hash shuffle, partition-independent."""
    import ray.data as rd
    from mapshaper_ray.stages.text import stratified_split
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "lang"])
    out = stratified_split(docs, key="lang",
                           fractions=(0.8, 0.1, 0.1)).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _q109_sliding_window(sf_dir: str):
    """Global row-based sliding-window sum over the event stream
    (SUM OVER ROWS 9 PRECEDING) via the halo-exchange pattern: ts-
    range buckets + per-bucket tails broadcast as the halo — no
    global sort; values quantized to int64 so the windowed sums are
    order-independent and SQL-exact."""
    import ray.data as rd
    from mapshaper_ray.ops.relational import sliding_window_sum
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "value"])

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        ep = df["ts"].astype("datetime64[us]").astype("int64")
        v = np.floor(df["value"].to_numpy(np.float64)
                     * 1000000.0).astype(np.int64)
        return pd.DataFrame({"event_id": df["event_id"]
                             .to_numpy(np.int64),
                             "ep": ep.to_numpy(), "v": v})

    out = sliding_window_sum(ev.map_batches(prep,
                                            batch_format="pandas"),
                             ts_col="ep", id_col="event_id",
                             val_col="v", window=10).to_pandas()
    return out.sort_values("event_id").reset_index(drop=True)


def _q110_clean_text(sf_dir: str):
    """Web-text normalization: docs get deterministic HTML-entity +
    extra-whitespace wrappers, then the clean_text rule chain
    (entity unescape, whitespace collapse, strip) — the engine and
    the oracle share ONE rule table via clean_text_sql, byte-exact."""
    import ray.data as rd
    from mapshaper_ray.stages.text import clean_text
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def dirty(df: pd.DataFrame) -> pd.DataFrame:
        i = df["doc_id"].to_numpy(np.int64)
        pre = np.where(i % 3 == 0, "&lt;p&gt;&nbsp;&nbsp;", "")
        suf = np.where(i % 2 == 0, "  &amp;&amp; &quot;x&#39; ", "")
        return pd.DataFrame({
            "doc_id": i,
            "text": (pre + df["text"].fillna("").to_numpy(object)
                     + suf)})

    out = clean_text(docs.map_batches(dirty, batch_format="pandas")) \
        .to_pandas()
    return out[["doc_id", "text"]].sort_values("doc_id") \
        .reset_index(drop=True)


def _q111_bigram_nll(sf_dir: str):
    """Bigram stupid-backoff LM perplexity on a held-out split
    (even doc_ids train the counts, odd doc_ids are scored) — the
    backoff path fires on genuinely unseen bigrams; quantized-log
    integer scores are value-exact vs the SQL mirror."""
    import ray.data as rd
    from mapshaper_ray.stages.text import bigram_nll
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def parity(df: pd.DataFrame, keep: int) -> pd.DataFrame:
        return df[df["doc_id"].to_numpy(np.int64) % 2 == keep]

    train = docs.map_batches(parity, fn_kwargs={"keep": 0},
                             batch_format="pandas")
    score = docs.map_batches(parity, fn_kwargs={"keep": 1},
                             batch_format="pandas")
    out = bigram_nll(train, score).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _q112_scalar_quantize(sf_dir: str):
    """int8 scalar quantization of the embedding column (per-dim
    min/max reduce + stateless quantize pass) — the 4x compression
    step before corpus-scale ANN; codes value-exact vs SQL."""
    import ray.data as rd
    from mapshaper_ray.ops.ann import scalar_quantize
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    out = scalar_quantize(emb).to_pandas()
    return out.sort_values(["vec_id", "k"]).reset_index(drop=True)


def _q113_warc_ingest(sf_dir: str):
    """Full crawl-ingest path under the value-exact gate: documents
    serialize to sharded gzipped WARC archives (one writer task per
    shard), the distributed WARC reader parses them back, HTTP
    payloads split, html bodies extract — (url, warc_ts, text)
    matches SQL computed straight from the documents table, so the
    north-rule byte-identical-text-per-url invariant holds through
    the whole container round-trip."""
    import gzip
    import os
    import tempfile

    import ray.data as rd
    from mapshaper_ray.sources.warc import read_warc, \
        write_warc_bytes
    from mapshaper_ray.stages.pages import (BASE_EPOCH_MS,
                                            HTML_PREFIX, HTML_SUFFIX,
                                            extract_text)
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    tmp = tempfile.mkdtemp(prefix="q113_warc_")

    def emit(df: pd.DataFrame) -> pd.DataFrame:
        i = df["doc_id"].to_numpy(np.int64)
        dt = pd.to_datetime(BASE_EPOCH_MS + i * 1009, unit="ms")
        return pd.DataFrame({
            "uri": ("https://site" + pd.Series(i % 1000).astype(str)
                    + ".example/p/" + pd.Series(i).astype(str))
                   .to_numpy(object),
            "date": np.asarray(
                dt.strftime("%Y-%m-%dT%H:%M:%S.%fZ"), object),
            "payload": [HTML_PREFIX + (t or "").encode()
                        + HTML_SUFFIX for t in df["text"]],
            "__shard": i % 8})

    def write_shard(df: pd.DataFrame) -> pd.DataFrame:
        s = int(df["__shard"].iloc[0])
        df = df.sort_values("uri")
        recs = [{"uri": u, "date": d,
                 "payload": b"HTTP/1.1 200 OK\r\n"
                            b"Content-Type: text/html\r\n\r\n" + p}
                for u, d, p in zip(df["uri"], df["date"],
                                   df["payload"])]
        path = os.path.join(tmp, f"shard_{s}.warc.gz")
        with open(path, "wb") as f:
            f.write(gzip.compress(write_warc_bytes(recs)))
        return pd.DataFrame({"path": [path]})

    paths = docs.map_batches(emit, batch_format="pandas") \
        .groupby("__shard").map_groups(write_shard,
                                       batch_format="pandas") \
        .to_pandas()["path"].tolist()
    out = extract_text(read_warc(sorted(paths))).to_pandas()
    out = out[["url", "warc_ts", "text"]]
    return out.sort_values("url").reset_index(drop=True)


def _q114_rollup(sf_dir: str):
    """GROUP BY ROLLUP(source, lang) over documents: one distributed
    pass at the finest level, coarser subtotals re-aggregated from
    its bounded result (sum/count/min/max are re-aggregable)."""
    import ray.data as rd
    from mapshaper_ray.ops.relational import rollup_agg
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "source", "lang",
                                    "n_chars"])
    out = rollup_agg(docs, ["source", "lang"],
                     {"n_docs": ("doc_id", "count"),
                      "sum_chars": ("n_chars", "sum")})
    out["n_docs"] = out["n_docs"].astype(np.int64)
    out["sum_chars"] = out["sum_chars"].astype(np.int64)
    return out.sort_values(["source", "lang"]).reset_index(drop=True)


def _q115_tpch_q3(sf_dir: str):
    """TPC-H Q3-shaped 3-table pipeline: filtered customer segment ⋈
    orders ⋈ lineitem through two bucketed hash joins, integer-cents
    revenue (order-independent sums), grouped reduce, top-10."""
    import ray.data as rd
    from mapshaper_ray.ops.relational import groupby_agg, hash_join
    cut = np.datetime64("1998-06-01")

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_mktsegment"])

    def c_filter(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["c_mktsegment"] == "BUILDING"]
        return pd.DataFrame({"o_custkey": df["c_custkey"]
                             .to_numpy(np.int64)})

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey",
                                      "o_orderdate"])

    def o_filter(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["o_orderdate"].to_numpy("datetime64[us]")
                  < cut]

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_extendedprice",
                                  "l_discount", "l_shipdate"])

    def l_filter(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["l_shipdate"].to_numpy("datetime64[us]") > cut]
        p = np.round(df["l_extendedprice"].to_numpy(np.float64)
                     * 100.0).astype(np.int64)
        d = np.round(df["l_discount"].to_numpy(np.float64)
                     * 100.0).astype(np.int64)
        return pd.DataFrame({"o_orderkey": df["l_orderkey"]
                             .to_numpy(np.int64),
                             "rev": p * (100 - d)})

    j1 = hash_join(orders.map_batches(o_filter,
                                      batch_format="pandas"),
                   cust.map_batches(c_filter, batch_format="pandas"),
                   on="o_custkey", how="inner")
    j2 = hash_join(li.map_batches(l_filter, batch_format="pandas"),
                   j1, on="o_orderkey", how="inner")
    agg = groupby_agg(j2, ["o_orderkey", "o_orderdate"],
                      {"revenue_cents": ("rev", "sum")}).to_pandas()
    agg["revenue_cents"] = agg["revenue_cents"].astype(np.int64)
    agg["o_orderdate"] = agg["o_orderdate"] \
        .astype("datetime64[us]")
    out = agg.sort_values(["revenue_cents", "o_orderdate",
                           "o_orderkey"],
                          ascending=[False, True, True]).head(10)
    return out[["o_orderkey", "o_orderdate", "revenue_cents"]] \
        .reset_index(drop=True)


def _q116_nb_classifier(sf_dir: str):
    """fastText-style hashed-unigram Naive-Bayes language classifier
    (the CCNet/RedPajama classifier component): train per-lang
    token-bucket counts on the even doc_ids, score the odd doc_ids —
    the model is a distributed aggregate (L x 1024 ints), scoring is
    a broadcast stateless pass; quantized-log integer scores are
    value-exact vs the SQL mirror."""
    import ray.data as rd
    from mapshaper_ray.stages.text import nb_classifier
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text", "lang"])

    def parity(df: pd.DataFrame, keep: int) -> pd.DataFrame:
        return df[df["doc_id"].to_numpy(np.int64) % 2 == keep]

    train = docs.map_batches(parity, fn_kwargs={"keep": 0},
                             batch_format="pandas")
    score = docs.map_batches(parity, fn_kwargs={"keep": 1},
                             batch_format="pandas")
    out = nb_classifier(train, score).to_pandas()
    out["score_q"] = out["score_q"].astype(np.int64)
    return out.sort_values("doc_id").reset_index(drop=True)


def _q117_host_graph(sf_dir: str):
    """Host-level web link graph with reciprocity: page outlinks
    (two deterministic links per doc over 50 hosts) aggregate to
    (src_host, dst_host, n_links, mutual) — mutual = the reversed
    pair also links (classic web-graph signal).  One grouped sum
    plus one unordered-pair bucket exchange; page rows never
    shuffle raw."""
    import ray.data as rd
    from mapshaper_ray.ops.graph import host_link_graph
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id"])

    def mk_links(df: pd.DataFrame) -> pd.DataFrame:
        i = df["doc_id"].to_numpy(np.int64)
        s = np.char.add("h", (i % 50).astype(str)).astype(object)
        d1 = np.char.add("h", ((i * 7 + 1) % 50).astype(str)) \
            .astype(object)
        d2 = np.char.add("h", ((i * 13 + 5) % 50).astype(str)) \
            .astype(object)
        return pd.DataFrame({
            "src_host": np.concatenate([s, s]),
            "dst_host": np.concatenate([d1, d2])})

    out = host_link_graph(
        docs.map_batches(mk_links, batch_format="pandas")) \
        .to_pandas()
    out["n_links"] = out["n_links"].astype(np.int64)
    out["mutual"] = out["mutual"].astype(np.int64)
    return out.sort_values(["src_host", "dst_host"]) \
        .reset_index(drop=True)


def _q118_kcore(sf_dir: str):
    """k-core decomposition (k=8) of a deterministic web-ish graph
    on doc ids — a ring link and a hub link per doc plus a dense
    community among the lowest n/10 ids (the part that survives the
    peel).  Parallel peeling: per round one degree reduce + one
    survivor filter, both count-gated driver/distributed.  Oracle:
    the same peel unrolled as six idempotent SQL rounds."""
    import ray.data as rd
    from mapshaper_ray.ops.graph import kcore
    ids = rd.read_parquet(f"{sf_dir}/documents.parquet",
                          columns=["doc_id"])
    n = ids.count()
    C = max(n // 10, 8)

    def mk_edges(df: pd.DataFrame) -> pd.DataFrame:
        d = df["doc_id"].to_numpy(np.int64)
        cl = d[d < C]
        src = [d, d]
        dst = [(d * 7 + 1) % n, d % C]
        for j in range(1, 7):
            src.append(cl)
            dst.append((cl + j) % C)
        return pd.DataFrame({"src": np.concatenate(src),
                             "dst": np.concatenate(dst)})

    out = kcore(ids.map_batches(mk_edges, batch_format="pandas"),
                k=8).to_pandas()
    out = out.astype({"node": np.int64, "deg": np.int64})
    return out.sort_values("node").reset_index(drop=True)


def _q119_pivot_events(sf_dir: str):
    """PIVOT/crosstab: per user one column per (event type, agg) —
    integer-cents sums and counts — via the pivot_agg operator
    (per-batch pivoted partials, re-aggregable reduce)."""
    import ray.data as rd
    from mapshaper_ray.ops.relational import pivot_agg
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type", "value"])

    def cents(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": df["user_id"].to_numpy(np.int64),
            "event_type": df["event_type"],
            "cents": np.round(df["value"].to_numpy(np.float64)
                              * 100.0).astype(np.int64)})

    out = pivot_agg(ev.map_batches(cents, batch_format="pandas"),
                    "user_id", "event_type", "cents").to_pandas()
    for c in out.columns:
        if c != "user_id":
            out[c] = out[c].astype(np.int64)
    return out.sort_values("user_id").reset_index(drop=True)


def _q120_funnel(sf_dir: str):
    """Ordered funnel view -> click -> purchase: per user the chained
    first-touch timestamps (each strictly after the previous stage)
    and the stage count, via the funnel operator (one bucket-hash
    shuffle of step-filtered events, vectorized chained grouped
    mins)."""
    import ray.data as rd
    from mapshaper_ray.ops.relational import funnel
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type", "ts"])
    out = funnel(ev, ["view", "click", "purchase"]).to_pandas()
    out = out.astype({"user_id": np.int64, "stage": np.int64})
    return out.sort_values("user_id").reset_index(drop=True)


def _q121_weighted_sample(sf_dir: str):
    """Efraimidis-Spirakis weighted sampling without replacement:
    top-100 docs by ln(u)/w with u = md5-hash-uniform and
    w = n_chars + 1.  Quantized libm log + single IEEE division
    keep the selection and key value-exact vs the SQL mirror;
    per-block top-k partials bound the driver at k x n_blocks."""
    import ray.data as rd
    from mapshaper_ray.ops.relational import weighted_sample
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "n_chars"])

    def addw(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(np.int64),
            "w": df["n_chars"].to_numpy(np.int64) + 1})

    out = weighted_sample(docs.map_batches(addw,
                                           batch_format="pandas"),
                          k=100, weight_col="w", seed="s0")
    return out[["doc_id", "w", "key"]].reset_index(drop=True)


def _q122_retention(sf_dir: str):
    """Cohort retention analysis: users cohort by first-event day,
    weekly-offset cells count distinct active users — grouped
    first-touch min, one bucketed join back, grouped dedup then cell
    count (nothing bigger than the distinct (cell, user) set
    shuffles)."""
    import ray.data as rd
    from mapshaper_ray.ops.relational import retention_cohorts
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])
    out = retention_cohorts(ev).to_pandas()
    return out.sort_values(["cohort_day", "offset"]) \
        .reset_index(drop=True)


def _q123_window_funnel(sf_dir: str):
    """Conversion-window funnel: view -> click -> purchase where each
    transition must land within 24 h of the previous stage (strict
    first-touch chaining) — the funnel operator's ``within_s``
    path."""
    import ray.data as rd
    from mapshaper_ray.ops.relational import funnel
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type", "ts"])
    out = funnel(ev, ["view", "click", "purchase"],
                 within_s=86400.0).to_pandas()
    out = out.astype({"user_id": np.int64, "stage": np.int64})
    return out.sort_values("user_id").reset_index(drop=True)


def _q124_temperature_mix(sf_dir: str):
    """Temperature-flattened source mixing (alpha=0.5): each source
    keeps a deterministic hash sample at rate 1/sqrt(n_source) —
    the GPT-3/PaLM mixture-flattening step — via the
    temperature_sample operator (per-group counts to the driver,
    broadcast uint64 cutoffs, stateless membership filter)."""
    import ray.data as rd
    from mapshaper_ray.stages.text import temperature_sample
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "source"])
    out = temperature_sample(docs, alpha=0.5).to_pandas()
    out["doc_id"] = out["doc_id"].astype(np.int64)
    return out.sort_values("doc_id").reset_index(drop=True)


def _q125_chunk_docs(sf_dir: str):
    """Sliding-window document chunking (size=64, overlap=16) for
    long-context training prep — stateless flat transform, byte-exact
    chunk text vs the SQL list-slice mirror."""
    import ray.data as rd
    from mapshaper_ray.stages.text import chunk_documents
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    out = chunk_documents(docs, size=64, overlap=16).to_pandas()
    out["doc_id"] = out["doc_id"].astype(np.int64)
    return out.sort_values(["doc_id", "chunk_id"]) \
        .reset_index(drop=True)


def _q126_label_prop(sf_dir: str):
    """Synchronous label propagation (3 rounds) over the q118
    community graph — per round a label join along both edge
    directions, a grouped (node, label) count and a per-node argmax
    (ties to the smallest label); count-gated broadcast vs bucketed
    rounds.  Oracle: the same three rounds unrolled."""
    import ray.data as rd
    from mapshaper_ray.ops.graph import label_propagation
    ids = rd.read_parquet(f"{sf_dir}/documents.parquet",
                          columns=["doc_id"])
    n = ids.count()
    C = max(n // 10, 8)

    def mk_edges(df: pd.DataFrame) -> pd.DataFrame:
        d = df["doc_id"].to_numpy(np.int64)
        cl = d[d < C]
        src = [d, d]
        dst = [(d * 7 + 1) % n, d % C]
        for j in range(1, 7):
            src.append(cl)
            dst.append((cl + j) % C)
        return pd.DataFrame({"src": np.concatenate(src),
                             "dst": np.concatenate(dst)})

    out = label_propagation(
        ids.map_batches(mk_edges, batch_format="pandas"),
        iters=3).to_pandas()
    out = out.astype({"node": np.int64, "label": np.int64})
    return out.sort_values("node").reset_index(drop=True)


def _q127_gram_matrix(sf_dir: str):
    """Distributed integer Gram matrix over int8-quantized
    embeddings (covariance / whitening sufficient statistics): only
    d x d int64 partials travel, the corpus never shuffles; exact by
    construction because the Gram runs on quantized codes (no
    float-sum ordering hazard)."""
    import ray.data as rd
    from mapshaper_ray.ops.ann import gram_matrix
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    out = gram_matrix(emb).to_pandas()
    return out.sort_values(["i", "j"]).reset_index(drop=True)


def _q128_zorder(sf_dir: str):
    """Z-order (Morton) layout keys over (value, event time) — the
    locality-preserving multi-column partition key for pruned
    lakehouse writes: per-column min/max reduce, stateless 8-bit
    quantize + bit interleave, equal-width range bucket for 16
    output partitions."""
    import ray.data as rd
    from mapshaper_ray.ops.partition import zorder_keys
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "value", "ts"])

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_id": df["event_id"].to_numpy(np.int64),
            "value": df["value"].to_numpy(np.float64),
            "ep": df["ts"].astype("datetime64[us]").astype("int64")
            .to_numpy()})

    out = zorder_keys(ev.map_batches(prep, batch_format="pandas"),
                      ["value", "ep"], bits=8, n_parts=16) \
        .to_pandas()[["event_id", "zkey", "part"]]
    out = out.astype({"zkey": np.int64, "part": np.int64})
    return out.sort_values("event_id").reset_index(drop=True)


def _q129_locf_fill(sf_dir: str):
    """LOCF gap repair: error events' values are nulled then each
    user's time-ordered stream forward-fills from the most recent
    observation (leading gaps -> -1 sentinel on both sides, keeping
    the contract NaN-free) — one bucket shuffle + vectorized carry
    propagation vs the last_value IGNORE NULLS window mirror."""
    import ray.data as rd
    from mapshaper_ray.ops.relational import locf_fill
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type", "ts",
                                  "value"])

    def null_errors(df: pd.DataFrame) -> pd.DataFrame:
        v = df["value"].to_numpy(np.float64).copy()
        v[(df["event_type"] == "error").to_numpy()] = np.nan
        return pd.DataFrame({"user_id": df["user_id"]
                             .to_numpy(np.int64),
                             "ts": df["ts"], "value": v})

    out = locf_fill(ev.map_batches(null_errors,
                                   batch_format="pandas"),
                    col="value").to_pandas()
    out["value"] = np.where(np.isnan(out["value"].to_numpy()),
                            -1.0, out["value"].to_numpy())
    out["user_id"] = out["user_id"].astype(np.int64)
    return out.sort_values(["user_id", "ts"]).reset_index(drop=True)


def _q130_attribution(sf_dir: str):
    """Multi-touch attribution: every click within 6 h before a
    same-user purchase earns an equal share of that purchase's
    credit (1/n single IEEE division — no float accumulation, so
    value-exact) — a composition over the range_join operator
    (purchases become [ts-6h, ts] intervals; one bucket shuffle)."""
    import ray.data as rd
    from mapshaper_ray.ops.relational import broadcast_join, range_join
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "event_type",
                                  "ts"]).materialize()

    def side(df: pd.DataFrame, which: str) -> pd.DataFrame:
        df = df[df["event_type"] == which]
        return pd.DataFrame({"event_id": df["event_id"]
                             .to_numpy(np.int64),
                             "user_id": df["user_id"]
                             .to_numpy(np.int64),
                             "ts": df["ts"]})

    clicks = ev.map_batches(side, fn_kwargs={"which": "click"},
                            batch_format="pandas")

    def windows(df: pd.DataFrame) -> pd.DataFrame:
        ts = df["ts"].astype("datetime64[us]")
        return pd.DataFrame({
            "p_event": df["event_id"].to_numpy(np.int64),
            "user_id": df["user_id"].to_numpy(np.int64),
            "t_start": ts - pd.Timedelta(hours=6),
            "t_end": ts})

    purch = ev.map_batches(side, fn_kwargs={"which": "purchase"},
                           batch_format="pandas")         .map_batches(windows, batch_format="pandas")
    pairs = range_join(clicks, purch, by="user_id", on="ts",
                       lo="t_start", hi="t_end",
                       right_cols=("p_event",), suffix="")
    pairs = pairs.map_batches(
        lambda df: pd.DataFrame({
            "click_event": df["event_id"].to_numpy(np.int64),
            "p_event": df["p_event"].to_numpy(np.int64)}),
        batch_format="pandas").materialize()
    from mapshaper_ray.ops.relational import groupby_agg
    n = groupby_agg(pairs, ["p_event"],
                    {"nc": ("click_event", "count")}).to_pandas()
    out = broadcast_join(pairs, n, on="p_event").to_pandas()
    out["credit"] = 1.0 / out["nc"].to_numpy(np.float64)
    return out[["click_event", "p_event", "credit"]] \
        .sort_values(["click_event", "p_event"]) \
        .reset_index(drop=True)


def _q131_rolling_dau(sf_dir: str):
    """Rolling 7-day distinct active users per event day — exact
    rolling COUNT DISTINCT via interval coverage (each distinct
    (user, active-day) contributes its trailing-window days; grouped
    dedup collapses overlaps), only users x days pairs shuffle."""
    import ray.data as rd
    from mapshaper_ray.ops.relational import rolling_active
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])
    out = rolling_active(ev, window=7).to_pandas()
    return out.sort_values("day").reset_index(drop=True)


def _q132_dataset_diff(sf_dir: str):
    """Keyed dataset diff (incremental-pipeline regression check):
    documents vs a deterministically perturbed copy (every 17th doc
    dropped, every 13th text edited, every 29th re-keyed as new) —
    full-outer bucketed join on 52-bit md5 fingerprints, unchanged
    rows drop in-partition."""
    import ray.data as rd
    from mapshaper_ray.ops.relational import dataset_diff
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"]).materialize()

    def left(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(np.int64),
            "text": df["text"].fillna("").to_numpy(object)})

    def right(df: pd.DataFrame) -> pd.DataFrame:
        i = df["doc_id"].to_numpy(np.int64)
        t = df["text"].fillna("").to_numpy(object)
        keep = i % 17 != 0
        ik, tk = i[keep], t[keep].copy()
        ed = ik % 13 == 0
        tk[ed] = np.char.add(tk[ed].astype(str), " x").astype(object)
        add = i % 29 == 0
        return pd.DataFrame({
            "doc_id": np.concatenate([ik, i[add] + 1000000000]),
            "text": np.concatenate([tk, t[add]])})

    out = dataset_diff(docs.map_batches(left, batch_format="pandas"),
                       docs.map_batches(right,
                                        batch_format="pandas"),
                       key="doc_id", cols=["text"]).to_pandas()
    out["doc_id"] = out["doc_id"].astype(np.int64)
    return out.sort_values(["doc_id", "status"]) \
        .reset_index(drop=True)


def _q133_cube(sf_dir: str):
    """GROUP BY CUBE over (lang, source): all four grouping sets from
    one distributed finest pass, coarser sets re-aggregated from its
    bounded result (counts re-sum)."""
    import ray.data as rd
    from mapshaper_ray.ops.relational import cube_agg
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["lang", "source", "n_chars"])
    out = cube_agg(docs, ["lang", "source"],
                   {"n_docs": ("n_chars", "count"),
                    "sum_chars": ("n_chars", "sum")})
    out = out.astype({"n_docs": np.int64, "sum_chars": np.int64})
    return out.sort_values(["lang", "source"]).reset_index(drop=True)


def _q134_edit1_pairs(sf_dir: str):
    """FastSS edit-distance-1 similarity join over a synthesized
    word table (base-5 letter words per doc plus truncations): no
    all-pairs stage — single-deletion neighborhoods key every true
    pair into exactly one group; oracle is the exhaustive
    levenshtein join."""
    import ray.data as rd
    from mapshaper_ray.ops.dedup import edit1_pairs
    ids = rd.read_parquet(f"{sf_dir}/documents.parquet",
                          columns=["doc_id"])

    def words(df: pd.DataFrame) -> pd.DataFrame:
        i = df["doc_id"].to_numpy(np.int64)
        digs = [(i // p) % 5 for p in (625, 125, 25, 5, 1)]
        base = ["".join(chr(97 + int(d[j])) for d in digs)
                for j in range(len(i))]
        trunc = [w[:4] for w, v in zip(base, i) if v % 7 == 0]
        return pd.DataFrame({"w": np.array(base + trunc,
                                           dtype=object)})

    out = edit1_pairs(ids.map_batches(words, batch_format="pandas"),
                      col="w").to_pandas()
    return out.sort_values(["a", "b"]).reset_index(drop=True)


def _q135_user_features(sf_dir: str):
    """Per-user behavioral feature matrix (churn-model features):
    event/session/active-day counts, last active day and the exact
    median inter-event gap — one bucket shuffle, every feature from
    one vectorized pass over the sorted partition."""
    import ray.data as rd
    from mapshaper_ray.ops.relational import user_features
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])
    out = user_features(ev).to_pandas()
    out["user_id"] = out["user_id"].astype(np.int64)
    return out.sort_values("user_id").reset_index(drop=True)


def _q136_multikey_join(sf_dir: str):
    """Composite-key bucketed join: per-(user, day) event counts
    joined back onto each event — hash_join_bucketed's multi-column
    key path (tuple-hashed buckets, full-list in-bucket merge)."""
    import ray.data as rd
    from mapshaper_ray.ops.relational import (groupby_agg,
                                              hash_join_bucketed)
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts"])

    def daily(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_id": df["event_id"].to_numpy(np.int64),
            "user_id": df["user_id"].to_numpy(np.int64),
            "day": df["ts"].astype("datetime64[us]").astype("int64")
            .to_numpy() // (86400 * 10 ** 6)})

    d = ev.map_batches(daily, batch_format="pandas").materialize()
    counts = groupby_agg(d, ["user_id", "day"],
                         {"n_day": ("event_id", "count")},
                         final="distributed")
    out = hash_join_bucketed(d, counts, on=["user_id", "day"]) \
        .to_pandas()
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out[["event_id", "user_id", "day", "n_day"]] \
        .sort_values("event_id").reset_index(drop=True)


def _q137_group_weighted_sample(sf_dir: str):
    """Stratified A-ES weighted sampling: top-20 docs PER SOURCE by
    ln(u)/w — weighted_sample's group_col path (per-group per-block
    partials, k x groups x blocks driver reduce)."""
    import ray.data as rd
    from mapshaper_ray.ops.relational import weighted_sample
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "source", "n_chars"])

    def addw(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(np.int64),
            "source": df["source"].to_numpy(object),
            "w": df["n_chars"].to_numpy(np.int64) + 1})

    out = weighted_sample(docs.map_batches(addw,
                                           batch_format="pandas"),
                          k=20, weight_col="w", seed="s0",
                          group_col="source")
    return out[["doc_id", "source", "w", "key"]] \
        .reset_index(drop=True)


def _q138_histogram(sf_dir: str):
    """Exact 32-bin histogram of event values: min/max reduce +
    per-batch integer bin partials (single-IEEE-op bin edges, so the
    SQL mirror matches bin-for-bin)."""
    import ray.data as rd
    from mapshaper_ray.ops.relational import histogram
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["value"])
    out = histogram(ev, "value", bins=32)
    out["bin"] = out["bin"].astype(np.int64)
    out["n"] = out["n"].astype(np.int64)
    return out


def _q139_ntile(sf_dir: str):
    """Exact NTILE(10) over event values (ties ordered by event_id,
    making the window deterministic) — the percent_rank bucket-prefix
    shape: no global sort, per-bucket exact row numbers + pure
    arithmetic tiles."""
    import ray.data as rd
    from mapshaper_ray.ops.rank import ntile
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "value"])
    out = ntile(ev, "value", "event_id", 10).to_pandas()
    out["event_id"] = out["event_id"].astype(np.int64)
    out["tile"] = out["tile"].astype(np.int64)
    return out.sort_values("event_id").reset_index(drop=True)


def _q140_event_paths(sf_dir: str):
    """Top event paths: counts of every consecutive 3-step event-type
    sequence within a user's time-ordered stream — one bucket
    shuffle + shifted-array windows, |types|^3-bounded reduce."""
    import ray.data as rd
    from mapshaper_ray.ops.relational import event_sequences
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type", "ts"])
    return event_sequences(ev, k=3).reset_index(drop=True)


def _q141_ddsketch(sf_dir: str):
    """DDSketch relative-error quantiles (Masson et al., VLDB 2019)
    over event values: mergeable log-bucket partials (gamma =
    2**(1/8)), integer-rank quantile walk — the oracle-compared
    columns are all integers, so the sketch is hash-exact vs the SQL
    bucket rebuild."""
    import ray.data as rd
    from mapshaper_ray.ops.sketch import (ddsketch_build,
                                          ddsketch_quantiles)
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["value"])
    sk = ddsketch_build(ev, "value")
    out = ddsketch_quantiles(sk, [(1, 100), (1, 4), (1, 2), (3, 4),
                                  (9, 10), (99, 100)])
    out = out.astype({"sign": np.int64, "bucket": np.int64,
                      "n_le": np.int64})
    return out.sort_values("q").reset_index(drop=True)


def _q142_bfs(sf_dir: str):
    """BFS hop distances (<= 3 hops) from node 0 over the q126
    community graph — synchronous frontier expansion, count-gated
    broadcast vs bucketed anti-join rounds; oracle = three unrolled
    DISTINCT-neighbor CTE hops."""
    import ray.data as rd
    from mapshaper_ray.ops.graph import bfs_distances
    ids = rd.read_parquet(f"{sf_dir}/documents.parquet",
                          columns=["doc_id"])
    n = ids.count()
    C = max(n // 10, 8)

    def mk_edges(df: pd.DataFrame) -> pd.DataFrame:
        d = df["doc_id"].to_numpy(np.int64)
        cl = d[d < C]
        src = [d, d]
        dst = [(d * 7 + 1) % n, d % C]
        for j in range(1, 7):
            src.append(cl)
            dst.append((cl + j) % C)
        return pd.DataFrame({"src": np.concatenate(src),
                             "dst": np.concatenate(dst)})

    out = bfs_distances(
        ids.map_batches(mk_edges, batch_format="pandas"),
        [0], max_hops=3).to_pandas()
    out = out.astype({"node": np.int64, "dist": np.int64})
    return out.sort_values("node").reset_index(drop=True)


def _q143_url_blocklist(sf_dir: str):
    """C4-style URL blocklist filter: synthetic crawl urls (mixed
    case, ports, subdomain tiers) against a domain-suffix blocklist —
    blocked when host equals or is a subdomain of an entry; broadcast
    frozenset + vectorized suffix explode, no shuffle."""
    import ray.data as rd
    from mapshaper_ray.stages.pages import filter_blocked_hosts
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id"])

    def mk_urls(df: pd.DataFrame) -> pd.DataFrame:
        i = df["doc_id"].to_numpy(np.int64)
        sub = pd.Series(np.select([i % 3 == 0, i % 3 == 1],
                                  ["www.", "Ads."], ""))
        port = pd.Series(np.where(i % 4 == 0, ":80", ""))
        return pd.DataFrame({
            "doc_id": i,
            "url": ("http://" + sub + "Site"
                    + pd.Series(i % 40).astype(str) + ".example"
                    + port + "/p/" + pd.Series(i).astype(str))
                   .to_numpy(object)})

    blocked = ["site7.example", "site13.example", "ads.site21.example"]
    out = filter_blocked_hosts(
        docs.map_batches(mk_urls, batch_format="pandas"),
        blocked).to_pandas()
    out = out[["doc_id", "host"]].astype({"doc_id": np.int64})
    return out.sort_values("doc_id").reset_index(drop=True)


def _q144_resample(sf_dir: str):
    """Daily time-series resampling of the event stream per event
    type with zero-filled gaps over the global calendar — integer
    bucket arithmetic + floor-quantized value sums, value-exact vs
    the SQL generate_series mirror."""
    import ray.data as rd
    from mapshaper_ray.ops.relational import resample_time
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts", "value"])
    return resample_time(ev, "ts", "event_type", "value",
                         every_s=86400, qscale=100)


def _q145_skipgram(sf_dir: str):
    """Skip-gram co-occurrence counts (window 2, unordered pairs,
    n >= 5) over document text — vectorized shifted-array pair emit
    per batch, one bucket shuffle of pair-count partials."""
    import ray.data as rd
    from mapshaper_ray.stages.text import skipgram_counts
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["text"])
    return skipgram_counts(docs, window=2, min_count=5)


def _q146_group_ddsketch(sf_dir: str):
    """Per-group DDSketch quantiles (p50/p95/p99 of event value per
    event type) — the service-latency panel: one pass of (key, sign,
    bucket) partials, bounded driver reduce, integer-rank walks."""
    import ray.data as rd
    from mapshaper_ray.ops.sketch import (ddsketch_by_group,
                                          ddsketch_group_quantiles)
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])
    sk = ddsketch_by_group(ev, "event_type", "value")
    out = ddsketch_group_quantiles(sk, [(1, 2), (19, 20), (99, 100)])
    out = out.rename(columns={"k": "event_type"})
    out = out.astype({"sign": np.int64, "bucket": np.int64,
                      "n_le": np.int64})
    return out.sort_values(["event_type", "q"]).reset_index(drop=True)


_RRF_TERMS_B = ["join", "merge", "sort"]

_RRF_RANK_A = """
        words_a AS (
          SELECT doc_id, string_split(coalesce(text, ''), ' ') AS w
          FROM documents),
        base_a AS (
          SELECT doc_id, len(w) AS dl,
                 len(list_filter(w, x -> x = 'window')) AS tf0,
                 len(list_filter(w, x -> x = 'stream')) AS tf1,
                 len(list_filter(w, x -> x = 'hash')) AS tf2,
          FROM words_a),
        g_a AS (
          SELECT count(*) AS nd,
                 sum(dl) / count(*) AS avgdl,
                 sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS df0,
                 sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1,
                 sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2
          FROM base_a),
        rank_a AS (
          SELECT doc_id,
                 row_number() OVER (ORDER BY
                   ln(1 + (nd - df0 + 0.5) / (df0 + 0.5))
                     * ((tf0 * (1.2 + 1))
                        / (tf0 + 1.2 * ((1 - 0.75) + 0.75 * (dl / avgdl))))
                   + ln(1 + (nd - df1 + 0.5) / (df1 + 0.5))
                     * ((tf1 * (1.2 + 1))
                        / (tf1 + 1.2 * ((1 - 0.75) + 0.75 * (dl / avgdl))))
                   + ln(1 + (nd - df2 + 0.5) / (df2 + 0.5))
                     * ((tf2 * (1.2 + 1))
                        / (tf2 + 1.2 * ((1 - 0.75) + 0.75 * (dl / avgdl))))
                   DESC, doc_id) AS r
          FROM base_a, g_a
          QUALIFY r <= 50)"""

_RRF_RANK_B = """
        words_b AS (
          SELECT doc_id, string_split(coalesce(text, ''), ' ') AS w
          FROM documents),
        base_b AS (
          SELECT doc_id, len(w) AS dl,
                 len(list_filter(w, x -> x = 'join')) AS tf0,
                 len(list_filter(w, x -> x = 'merge')) AS tf1,
                 len(list_filter(w, x -> x = 'sort')) AS tf2,
          FROM words_b),
        g_b AS (
          SELECT count(*) AS nd,
                 sum(dl) / count(*) AS avgdl,
                 sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS df0,
                 sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1,
                 sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2
          FROM base_b),
        rank_b AS (
          SELECT doc_id,
                 row_number() OVER (ORDER BY
                   ln(1 + (nd - df0 + 0.5) / (df0 + 0.5))
                     * ((tf0 * (1.2 + 1))
                        / (tf0 + 1.2 * ((1 - 0.75) + 0.75 * (dl / avgdl))))
                   + ln(1 + (nd - df1 + 0.5) / (df1 + 0.5))
                     * ((tf1 * (1.2 + 1))
                        / (tf1 + 1.2 * ((1 - 0.75) + 0.75 * (dl / avgdl))))
                   + ln(1 + (nd - df2 + 0.5) / (df2 + 0.5))
                     * ((tf2 * (1.2 + 1))
                        / (tf2 + 1.2 * ((1 - 0.75) + 0.75 * (dl / avgdl))))
                   DESC, doc_id) AS r
          FROM base_b, g_b
          QUALIFY r <= 50)"""




def _q147_rrf(sf_dir: str):
    """Reciprocal-rank fusion of two BM25 rankings (different query
    formulations) — distributed rankers, bounded fuse; each term one
    IEEE division summed in list order so the SQL mirror is
    bit-exact before the final round."""
    import ray.data as rd
    from mapshaper_ray.ops.rank import rrf_fuse
    from mapshaper_ray.stages.text import bm25_topk
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    ra = bm25_topk(ds, _BM25_TERMS, k=50)
    rb = bm25_topk(ds, _RRF_TERMS_B, k=50)
    out = rrf_fuse([ra, rb], id_col="doc_id", k0=60, topk=20)
    out["doc_id"] = out["doc_id"].astype(np.int64)
    return out


def _q148_anomaly(sf_dir: str):
    """Per-type z-score outliers over event values under an EXACT
    integer contract ((n-1)(nq-S)^2 > 9n(nQ-S^2), no float stddev) —
    distributive stats partials broadcast once, stateless flag pass
    with a boundary re-check."""
    import ray.data as rd
    from mapshaper_ray.ops.relational import group_outliers
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "event_id", "value"])
    out = group_outliers(ev, "event_type", "value", z=3,
                         id_col="event_id")
    return out.astype({"event_id": np.int64, "q": np.int64})


def _q149_pool_embeddings(sf_dir: str):
    """Per-label embedding mean-pooling (the chunk-embeddings ->
    document-embedding step) — integer-quantized element sums so the
    distributed reduce and the SQL unnest mirror are value-exact."""
    import ray.data as rd
    from mapshaper_ray.ops.ann import pool_embeddings
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["label", "embedding"])
    out = pool_embeddings(emb, "label", "embedding", mode="mean")
    out["label"] = out["label"].astype(np.int64)
    return out


def _q150_web_curation(sf_dir: str):
    """End-to-end web-corpus curation: blocklist filter -> URL
    canonicalization -> per-URL dedup -> exact text dedup -> word
    count floor — the session-6 operators chained as one streaming
    pipeline, mirrored by a chained-CTE oracle (q84's contract shape
    for the web side)."""
    import ray.data as rd
    from mapshaper_ray.ops.dedup import exact_dedup
    from mapshaper_ray.ops.relational import uniq_first
    from mapshaper_ray.stages.pages import (filter_blocked_hosts,
                                            normalize_urls)
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def mk_urls(df: pd.DataFrame) -> pd.DataFrame:
        i = df["doc_id"].to_numpy(np.int64)
        sub = pd.Series(np.select([i % 3 == 0, i % 3 == 1],
                                  ["www.", "Ads."], ""))
        port = pd.Series(np.where(i % 4 == 0, ":80", ""))
        df = df.copy()
        df["url"] = ("http://" + sub + "Site"
                     + pd.Series(i % 40).astype(str) + ".example"
                     + port + "/p/" + pd.Series(i % 97).astype(str))             .to_numpy(object)
        return df

    blocked = ["site7.example", "site13.example", "ads.site21.example"]
    pages = filter_blocked_hosts(
        docs.map_batches(mk_urls, batch_format="pandas"), blocked)
    pages = normalize_urls(pages)
    pages = uniq_first(pages, ["url_norm"], ["doc_id"])
    pages = exact_dedup(pages, text_col="text", order_col="doc_id")

    def wc_floor(df: pd.DataFrame) -> pd.DataFrame:
        wc = df["text"].fillna("").str.count(r"\S+").astype(np.int64)
        out = df.assign(n_words=wc)
        out = out[wc >= 50]
        return out[["doc_id", "host", "url_norm", "n_words"]]

    out = pages.map_batches(wc_floor, batch_format="pandas")         .to_pandas()
    out = out.astype({"doc_id": np.int64, "n_words": np.int64})
    return out.sort_values("doc_id").reset_index(drop=True)


def _q151_grouped_cumsum(sf_dir: str):
    """Per-user running total of event values in time order — one
    key-hash bucket shuffle + in-partition vectorized scan with
    key-boundary resets; integer-quantized so the window mirror is
    value-exact."""
    import ray.data as rd
    from mapshaper_ray.ops.relational import grouped_cumsum
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_id", "ts",
                                  "value"])
    out = grouped_cumsum(ev, "user_id", ["ts", "event_id"],
                         "value").to_pandas()
    out = out[["user_id", "event_id", "cum_q"]]         .astype({"user_id": np.int64, "event_id": np.int64,
                 "cum_q": np.int64})
    return out.sort_values(["user_id", "event_id"])         .reset_index(drop=True)


def _q152_containment(sf_dir: str):
    """Exact all-pairs 3-shingle CONTAINMENT >= 0.8 (asymmetric
    quote/subset detection Jaccard misses) — shingle-bucket pair
    emission + grouped intersection counts, integer evidence
    columns."""
    import ray.data as rd
    from mapshaper_ray.ops.dedup import all_pairs_containment
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    out = all_pairs_containment(ds, threshold=0.8, shingle_k=3)
    out["cont"] = out["cont"].round(6)
    return out


def _q153_grouping_sets(sf_dir: str):
    """GROUP BY GROUPING SETS ((lang, source), (lang), (source)) —
    the general rollup/cube form: one distributed finest pass, each
    requested set re-aggregated from its bounded result."""
    import ray.data as rd
    from mapshaper_ray.ops.relational import grouping_sets_agg
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["lang", "source", "n_chars"])
    out = grouping_sets_agg(
        docs, ["lang", "source"],
        [["lang", "source"], ["lang"], ["source"]],
        {"n": ("n_chars", "count"), "sum_chars": ("n_chars", "sum")})
    out = out.astype({"n": np.int64, "sum_chars": np.int64})
    return out.sort_values(["lang", "source"]).reset_index(drop=True)


def _q154_char_entropy(sf_dir: str):
    """Per-document Shannon character entropy (low-entropy /
    boilerplate quality signal) as an exact integer
    (n*qlog(n) - sum c*qlog(c)) — utf-32 codepoint decode, one
    lexsort, run arithmetic; no shuffle."""
    import ray.data as rd
    from mapshaper_ray.stages.text import char_entropy
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    out = char_entropy(docs).to_pandas()
    out = out.astype({"doc_id": np.int64, "n_chars_cp": np.int64,
                      "ent_q": np.int64})
    return out.sort_values("doc_id").reset_index(drop=True)


def _q155_boilerplate(sf_dir: str):
    """Per-host template-line removal (the CCNet/RefinedWeb
    boilerplate recipe): synthetic multi-line pages (nav header,
    optional promo line, body, copyright footer per host); lines in
    >= 30% of a host's pages (and >= 2 pages) delete from every
    page.  Count-gated broadcast of the boilerplate key table vs a
    bucketed anti-join + reassemble path above the cap."""
    import ray.data as rd
    from mapshaper_ray.stages.pages import remove_boilerplate
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def mk(df: pd.DataFrame) -> pd.DataFrame:
        i = df["doc_id"].to_numpy(np.int64)
        h = "site" + pd.Series(i % 20).astype(str) + ".example"
        promo = pd.Series(np.where(i % 3 == 0,
                                   "PROMO subscribe now\n", ""))
        page = ("NAV home about " + h + "\n" + promo
                + df["text"].fillna("").reset_index(drop=True)
                + "\nCOPYRIGHT 2024 " + h)
        return pd.DataFrame({"doc_id": i,
                             "host": h.to_numpy(object),
                             "text": page.to_numpy(object)})

    pages = docs.map_batches(mk, batch_format="pandas")
    out = remove_boilerplate(pages, frac_num=3, frac_den=10,
                             min_pages=2).to_pandas()
    out["doc_id"] = out["doc_id"].astype(np.int64)
    return out.sort_values("doc_id").reset_index(drop=True)


def _q156_phash_dedup(sf_dir: str):
    """Near-duplicate image detection via 64-bit average-hash over
    the multimodal decode path (deterministic fake decoder, real
    actor plumbing): aHash bits from pure integer arithmetic, dup
    groups by exact hash equality."""
    from mapshaper_ray.stages.multimodal import (phash_dup_groups,
                                                 phash_images,
                                                 synth_media)
    hashed = phash_images(synth_media(sf_dir, kind="image"))
    return phash_dup_groups(hashed)


def _q157_group_trend(sf_dir: str):
    """Per-event-type OLS value trend (slope vs day) from one-pass
    integer sufficient statistics — exact HUGEINT/bigint arithmetic
    to the final single division."""
    import ray.data as rd
    from mapshaper_ray.ops.relational import group_linfit
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts", "value"])
    out = group_linfit(ev, "event_type", "ts", "value")
    out["n"] = out["n"].astype(np.int64)
    return out


def _q158_rate_anomaly(sf_dir: str):
    """Daily event-rate anomaly detection — q144's resample grid fed
    into q148's exact integer outlier contract: a (type, day) cell is
    anomalous when (n-1)(n*c - S)^2 > 4n(nQ - S^2) (z=2) over that type's
    daily counts.  Composition of two verified stages; the grid is
    bounded, so the flag pass runs on the reduced result."""
    import ray.data as rd
    from mapshaper_ray.ops.relational import resample_time
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts", "value"])
    grid = resample_time(ev, "ts", "event_type", "value",
                         every_s=86400)
    rows = []
    for k, g in grid.groupby("event_type", sort=True):
        c = [int(x) for x in g["n"]]
        n, S, Q = len(c), sum(c), sum(x * x for x in c)
        for ts, x in zip(g["bucket_ts"], c):
            if (n - 1) * (n * x - S) ** 2 > 4 * n * (n * Q - S * S):
                rows.append({"event_type": k, "bucket_ts": ts,
                             "n_events": x})
    out = pd.DataFrame(rows) if rows else pd.DataFrame(
        {"event_type": [], "bucket_ts": pd.Series(
            [], dtype="datetime64[us]"),
         "n_events": pd.Series([], dtype=np.int64)})
    out["n_events"] = out["n_events"].astype(np.int64)
    return out.sort_values(["event_type", "bucket_ts"])         .reset_index(drop=True)


def _q159_related_terms(sf_dir: str):
    """Related-terms table: q145's skip-gram co-occurrence counts fed
    into the per-group top-k reduce — top-5 partners per left term by
    (count desc, partner)."""
    import ray.data as rd
    from mapshaper_ray.ops.relational import grouped_topk
    from mapshaper_ray.stages.text import skipgram_counts
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["text"])
    pairs = skipgram_counts(docs, window=2, min_count=5)
    top = grouped_topk(rd.from_pandas(pairs), "w1", "n", 5,
                       tie_col="w2").to_pandas()
    top["n"] = top["n"].astype(np.int64)
    return top.sort_values(["w1", "n", "w2"],
                           ascending=[True, False, True])         .reset_index(drop=True)


def _q160_log_odds(sf_dir: str):
    """Distinctive terms of the 'en' sub-corpus vs the rest —
    +1-smoothed log-odds (Monroe et al. 2008) as exact quantized-log
    integers; token-bucket shuffle, per-partition top-k prune."""
    import ray.data as rd
    from mapshaper_ray.stages.text import log_odds_terms
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["lang", "text"])
    return log_odds_terms(docs, "lang", "en", k=25)


def _q161_ddsketch_incremental(sf_dir: str):
    """Incremental DDSketch under the oracle gate: build on the
    even-event half, ddsketch_update with the odd half — the merged
    quantiles must equal the full-corpus sketch (q141's SQL verbatim
    is the oracle), proving the persisted-sketch update path exact."""
    import ray.data as rd
    from mapshaper_ray.ops.sketch import (ddsketch_build,
                                          ddsketch_quantiles,
                                          ddsketch_update)
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "value"])
    even = ev.map_batches(
        lambda df: df[df["event_id"] % 2 == 0][["value"]],
        batch_format="pandas")
    odd = ev.map_batches(
        lambda df: df[df["event_id"] % 2 == 1][["value"]],
        batch_format="pandas")
    sk = ddsketch_update(ddsketch_build(even, "value"), odd, "value")
    out = ddsketch_quantiles(sk, [(1, 100), (1, 4), (1, 2), (3, 4),
                                  (9, 10), (99, 100)])
    out = out.astype({"sign": np.int64, "bucket": np.int64,
                      "n_le": np.int64})
    return out.sort_values("q").reset_index(drop=True)


def _q162_trimmed_mean(sf_dir: str):
    """Per-type 10%-trimmed mean of event values (robust location):
    one key-bucket shuffle, vectorized in-partition rank trim with
    deterministic (value, id) tie order; integer evidence columns."""
    import ray.data as rd
    from mapshaper_ray.ops.relational import group_trimmed_mean
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "event_id", "value"])
    return group_trimmed_mean(ev, "event_type", "value", "event_id")


def _q163_host_dup_rate(sf_dir: str):
    """Per-host exact-duplicate rate (crawl-quality report): docs
    keyed to hosts, content-md5 distinct counts per host as exact
    integers (n_docs, n_distinct) — the groupby_agg partial/reduce
    path over a derived content-hash column."""
    import ray.data as rd
    from mapshaper_ray.ops.dedup import content_md5
    from mapshaper_ray.ops.relational import groupby_agg
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def keyed(df: pd.DataFrame) -> pd.DataFrame:
        i = df["doc_id"].to_numpy(np.int64)
        return pd.DataFrame({
            "host": ("site" + pd.Series(i % 20).astype(str)
                     + ".example").to_numpy(object),
            "h": np.asarray(content_md5(df["text"]), object)})

    kd = docs.map_batches(keyed, batch_format="pandas")
    per_hash = groupby_agg(kd, ["host", "h"],
                           {"c": ("h", "count")}, final="distributed")
    out = groupby_agg(per_hash, ["host"],
                      {"n_distinct": ("h", "count"),
                       "n_docs": ("c", "sum")},
                      final="driver").to_pandas()
    out = out[["host", "n_docs", "n_distinct"]]         .astype({"n_docs": np.int64, "n_distinct": np.int64})
    return out.sort_values("host").reset_index(drop=True)


def _q164_phash_near_dup(sf_dir: str):
    """Hamming-radius perceptual near-dup pairs (hamming <= 3 over
    the 64-bit aHash) — pigeonhole banding with exact recall
    (stages/multimodal.phash_near_dup_pairs), not just exact-equality
    groups.  A deterministic per-image bit flip (bit media_id % 64)
    spreads identical payloads to hamming-2 pairs so the radius is
    genuinely exercised; the oracle reproduces hash, flip, and a
    brute-force bit_count(xor) pair scan in SQL."""
    from mapshaper_ray.stages.multimodal import (phash_images,
                                                 phash_near_dup_pairs,
                                                 synth_media)
    hashed = phash_images(synth_media(sf_dir, kind="image"))

    def perturb(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["media_id"].to_numpy(np.int64)
        pos = ids % 64
        lo = df["phash_lo"].to_numpy(np.int64)
        hi = df["phash_hi"].to_numpy(np.int64)
        in_lo = pos < 32
        lo = np.where(in_lo, lo ^ (np.int64(1) << np.clip(pos, 0, 31)),
                      lo)
        hi = np.where(~in_lo,
                      hi ^ (np.int64(1) << np.clip(pos - 32, 0, 31)),
                      hi)
        return pd.DataFrame({"media_id": ids, "phash_lo": lo,
                             "phash_hi": hi})

    pert = hashed.map_batches(perturb, batch_format="pandas")
    out = phash_near_dup_pairs(pert, max_hamming=3, bands=4) \
        .to_pandas()
    out = out.astype({"id_a": np.int64, "id_b": np.int64,
                      "hamming": np.int64})
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def _q165_geocent(sf_dir: str):
    """mproj `geocent`: geodetic lon/lat -> 3D ECEF x/y/z on the
    WGS84 ellipsoid (stages/proj.geocent_points) — closes the last
    pj_list name (a 3D conversion, so it lives beside the planar
    registry, not in it)."""
    from mapshaper_ray.stages.proj import geocent_points
    ds = _geo_points(sf_dir).select_columns(["doc_id", "lon", "lat"])
    out = geocent_points(ds).to_pandas()
    for c in ("x", "y", "z"):
        out[c] = out[c].round(2)
    return out[["doc_id", "x", "y", "z"]].sort_values("doc_id") \
        .reset_index(drop=True)


def _q166_theta_sketch(sf_dir: str):
    """KMV/theta sketch set algebra — distinct-count UNION and
    INTERSECTION estimates across two document subsets (the op HLL
    cannot do): k smallest distinct md5 hashes per set, deterministic
    by construction, so the SQL mirror is ORDER BY
    md5_number_lower(text) LIMIT k plus the same integer estimator
    (ops/sketch.kmv_build / kmv_set_stats)."""
    import ray.data as rd
    from mapshaper_ray.ops.sketch import kmv_build, kmv_set_stats
    k = 64
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def even(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["doc_id"] % 2 == 0][["text"]]

    def div3(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["doc_id"] % 3 == 0][["text"]]

    ska = kmv_build(docs.map_batches(even, batch_format="pandas"),
                    "text", k)
    skb = kmv_build(docs.map_batches(div3, batch_format="pandas"),
                    "text", k)
    st = kmv_set_stats(ska, skb, k)
    return pd.DataFrame([st]).astype(
        {c: np.int64 for c in st})[
        ["k_used", "n_a_est", "n_b_est", "union_est", "m_inter",
         "inter_est"]]


def _q167_group_corr(sf_dir: str):
    """Per-event-type Pearson correlation between hour-of-day and
    value from one-pass integer sufficient statistics
    (ops/relational.group_corr) — exact HUGEINT mirror with one
    double division + sqrt at the end."""
    import ray.data as rd
    from mapshaper_ray.ops.relational import group_corr
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts", "value"])

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        e = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
        return pd.DataFrame({
            "event_type": df["event_type"].to_numpy(),
            "hour": ((e // 3_600_000_000) % 24).astype(np.float64),
            "value": df["value"].to_numpy(np.float64)})

    return group_corr(ev.map_batches(prep, batch_format="pandas"),
                      "event_type", "hour", "value",
                      x_qscale=1, y_qscale=100)


def _q168_scd2(sf_dir: str):
    """SCD-2 validity intervals from the event stream: per user in
    (ts, value) order each observation is valid until the next one
    (LEAD mirror), last closes at the 2100-01-01 sentinel
    (ops/relational.scd2_intervals — one bucket shuffle, vectorized
    in-partition shift)."""
    import ray.data as rd
    from mapshaper_ray.ops.relational import scd2_intervals
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "value"])
    out = scd2_intervals(ev, "user_id", "ts", "value").to_pandas()
    return out.sort_values(["user_id", "valid_from", "v_q"]) \
        .reset_index(drop=True)


def _q169_time_weighted(sf_dir: str):
    """Per-user time-weighted value integral (LOCF between
    observations): exact integer (n, span_us, wsum) per user — the
    statistic plain AVG gets wrong on irregular sampling
    (ops/relational.time_weighted_avg)."""
    import ray.data as rd
    from mapshaper_ray.ops.relational import time_weighted_avg
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "value"])
    out = time_weighted_avg(ev, "user_id", "ts", "value").to_pandas()
    return out.sort_values("user_id").reset_index(drop=True)


def _q170_skew_join(sf_dir: str):
    """Skew-resistant salted join: 60% of lineitem rows share ONE
    join key (the hot-user shape that serializes a plain bucketed
    join into a straggler partition); hash_join_salted detects hot
    keys with the exact heavy-hitter reduce, salts their left rows
    across 8 sub-partitions and replicates only the dimension side's
    hot rows — result identical to the plain join (the SQL mirror)."""
    import ray.data as rd
    from mapshaper_ray.ops.relational import (groupby_agg,
                                              hash_join_salted)
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_extendedprice"])

    def mk_left(df: pd.DataFrame) -> pd.DataFrame:
        ok = df["l_orderkey"].to_numpy(np.int64)
        return pd.DataFrame({
            "skew_key": np.where(ok % 10 < 6, 0, ok % 25)
            .astype(np.int64),
            "price_q": np.floor(df["l_extendedprice"]
                                .to_numpy(np.float64) * 100)
            .astype(np.int64)})

    nation = rd.read_parquet(f"{sf_dir}/nation.parquet",
                             columns=["n_nationkey", "n_name"])

    def mk_dim(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "skew_key": df["n_nationkey"].to_numpy(np.int64),
            "n_name": df["n_name"].to_numpy(object)})

    j = hash_join_salted(
        li.map_batches(mk_left, batch_format="pandas"),
        nation.map_batches(mk_dim, batch_format="pandas"),
        on="skew_key", n_salt=8, hot_min_count=1000)
    out = groupby_agg(j, ["n_name"],
                      {"n_rows": ("price_q", "count"),
                       "sum_price_q": ("price_q", "sum")}).to_pandas()
    out = out.astype({"n_rows": np.int64, "sum_price_q": np.int64})
    return out.sort_values("n_name").reset_index(drop=True)


def _q171_connected_components(sf_dir: str):
    """Weakly connected components over a sparse doc-derived graph —
    the large/small-star contraction CC (ops/dedup.cluster_pairs,
    Kiveris et al.) exposed as a first-class query: (node,
    cluster_id = component min id), validated against a WITH
    RECURSIVE min-label transitive closure in SQL."""
    import ray.data as rd
    from mapshaper_ray.ops.dedup import cluster_pairs
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id"])

    def mk(df: pd.DataFrame) -> pd.DataFrame:
        i = df["doc_id"].to_numpy(np.int64)
        a = i % 997
        b = (a + 1 + (i * 3) % 996) % 997  # b != a by construction
        return pd.DataFrame({"id_a": a, "id_b": b})

    cc = cluster_pairs(docs.map_batches(mk, batch_format="pandas"))
    out = cc.to_pandas() if hasattr(cc, "to_pandas") else cc
    out = out.rename(columns={"node": "node"}) \
        .astype({"node": np.int64, "cluster_id": np.int64})
    return out.sort_values("node").reset_index(drop=True)


def _q172_interval_join(sf_dir: str):
    """Interval-to-interval overlap join (both sides are intervals —
    the join range_join can't express): short per-event activity
    windows against sparse 2-hour campaign windows, grid-cell
    distributed with the report-in-the-overlap-start-cell dedup rule
    (ops/relational.interval_overlap_join); SQL mirror is the plain
    inequality join."""
    import ray.data as rd
    from mapshaper_ray.ops.relational import interval_overlap_join
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "value"]) \
        .materialize()

    def mk_a(df: pd.DataFrame) -> pd.DataFrame:
        e = df["ts"].to_numpy("datetime64[us]")
        dur = ((1 + np.floor(df["value"].to_numpy(np.float64)) % 10)
               * 60_000_000).astype("timedelta64[us]")
        return pd.DataFrame({"a_id": df["event_id"]
                             .to_numpy(np.int64),
                             "t_start": e, "t_end": e + dur})

    def mk_b(df: pd.DataFrame) -> pd.DataFrame:
        m = df["event_id"].to_numpy(np.int64) % 100 == 0
        e = df["ts"].to_numpy("datetime64[us]")[m]
        return pd.DataFrame({
            "b_id": df["event_id"].to_numpy(np.int64)[m],
            "t_start": e,
            "t_end": e + np.timedelta64(2 * 3600 * 1_000_000, "us")})

    out = interval_overlap_join(
        ev.map_batches(mk_a, batch_format="pandas"),
        ev.map_batches(mk_b, batch_format="pandas"),
        left_cols=("a_id",), right_cols=("b_id",),
        cell_us=2 * 3600 * 1_000_000).to_pandas()
    out = out.astype({"a_id": np.int64, "b_id": np.int64,
                      "overlap_us": np.int64})
    return out.sort_values(["a_id", "b_id"]).reset_index(drop=True)


def _q173_profile(sf_dir: str):
    """One-pass column profiler over lineitem (rows / nulls / exact
    distinct per column) — per-column count partials + a (col,
    value-hash) distinct reduce; raw values never shuffle
    (ops/relational.profile_columns)."""
    import ray.data as rd
    from mapshaper_ray.ops.relational import profile_columns
    cols = ["l_orderkey", "l_partkey", "l_returnflag",
            "l_linestatus"]
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=cols)
    return profile_columns(li, cols)


def _q174_cdc_apply(sf_dir: str):
    """CDC changelog apply: events become an ordered upsert/delete
    stream over 200 entities ('error' = delete, else upsert of the
    quantized value); the final state keeps each key's LAST operation
    in (ts, value) order, deletes drop the key
    (ops/relational.cdc_apply — one bucket shuffle, take-last scan,
    row_number DESC SQL mirror)."""
    import ray.data as rd
    from mapshaper_ray.ops.relational import cdc_apply
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts",
                                  "event_type", "value"])

    def mk(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "entity": (df["user_id"].to_numpy(np.int64) % 200),
            "ts": df["ts"].to_numpy("datetime64[us]"),
            "op": np.where(df["event_type"].to_numpy() == "error",
                           "D", "U").astype(object),
            "value": df["value"].to_numpy(np.float64)})

    out = cdc_apply(ev.map_batches(mk, batch_format="pandas"),
                    "entity", "ts", "op", "value").to_pandas()
    out = out.astype({"entity": np.int64, "v_q": np.int64})
    return out.sort_values("entity").reset_index(drop=True)


def _q175_hexbin(sf_dir: str):
    """Hex-bin density of the geocoded pages — H3-style pointy-top
    axial hexes (cells.lonlat_to_hex, cube-rounded with a
    floor(v+0.5) rule both engines share), the equal-neighborhood
    aggregation quadkeys can't express; grouped count + char sum per
    hex."""
    from mapshaper_ray.cells import lonlat_to_hex
    from mapshaper_ray.ops.relational import groupby_agg
    ds = _geo_points(sf_dir).select_columns(
        ["doc_id", "lon", "lat", "n_chars"])

    def hexes(df: pd.DataFrame) -> pd.DataFrame:
        hq, hr = lonlat_to_hex(df["lon"].to_numpy(np.float64),
                               df["lat"].to_numpy(np.float64), 5.0)
        return pd.DataFrame({"hq": hq, "hr": hr,
                             "nc": df["n_chars"]
                             .to_numpy(np.int64)})

    out = groupby_agg(ds.map_batches(hexes, batch_format="pandas"),
                      ["hq", "hr"], {"n_pages": ("nc", "count"),
                                     "sum_chars": ("nc", "sum")}) \
        .to_pandas()
    out = out.astype({"hq": np.int64, "hr": np.int64,
                      "n_pages": np.int64, "sum_chars": np.int64})
    return out.sort_values(["hq", "hr"]).reset_index(drop=True)


def _q176_compaction_plan(sf_dir: str):
    """Small-file compaction plan over a synthetic file manifest
    (one 'file' per document, size = n_chars): deterministic linear
    packing in (size DESC, name) order, bin = running_total // target
    (ops/relational.compaction_plan; SQL window-cumsum mirror)."""
    import ray.data as rd
    from mapshaper_ray.ops.relational import compaction_plan
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "n_chars"])

    def mk(df: pd.DataFrame) -> pd.DataFrame:
        i = df["doc_id"].to_numpy(np.int64)
        return pd.DataFrame({
            "file": np.char.add("part-", i.astype(str))
            .astype(object),
            "size": df["n_chars"].to_numpy(np.int64)})

    out = compaction_plan(docs.map_batches(mk,
                                           batch_format="pandas"),
                          "file", "size", target_bytes=50_000)
    return out.astype({"size": np.int64, "bin": np.int64}) \
        .reset_index(drop=True)


def _q177_grouped_window(sf_dir: str):
    """Per-user 5-row rolling value sum — the PARTITION BY form of
    the global sliding window (no halo needed: keys independent, one
    bucket shuffle, cumsum-difference with key-boundary clamp;
    ops/relational.grouped_rolling_sum)."""
    import ray.data as rd
    from mapshaper_ray.ops.relational import grouped_rolling_sum
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts",
                                  "value"])
    out = grouped_rolling_sum(ev, "user_id", ["ts", "event_id"],
                              "value", window=5).to_pandas()
    out = out[["event_id", "user_id", "wsum_q"]] \
        .astype({"event_id": np.int64, "user_id": np.int64,
                 "wsum_q": np.int64})
    return out.sort_values("event_id").reset_index(drop=True)


def _q178_event_gaps(sf_dir: str):
    """Per-user inter-event gap in microseconds (-1 for each user's
    first event) — the LAG-delta primitive under sessionization and
    rate limiting (ops/relational.event_gaps)."""
    import ray.data as rd
    from mapshaper_ray.ops.relational import event_gaps
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts"])
    out = event_gaps(ev, "user_id", "ts", "event_id").to_pandas()
    out = out.astype({"event_id": np.int64, "user_id": np.int64,
                      "gap_us": np.int64})
    return out.sort_values("event_id").reset_index(drop=True)


def _q179_crawl_waves(sf_dir: str):
    """Politeness-aware crawl scheduling over the synthetic pages:
    per host, urls fetch in waves of 4 (wave = per-host rank // 4,
    slot = rank % 4) — one host-bucket shuffle + in-partition rank
    (stages/pages.crawl_waves; row_number SQL mirror)."""
    from mapshaper_ray.stages.pages import (add_url_host, crawl_waves,
                                            synth_pages)
    pages = add_url_host(synth_pages(sf_dir))
    out = crawl_waves(pages, per_wave=4).to_pandas()
    out = out.astype({"wave": np.int64, "slot": np.int64})
    return out.sort_values("url").reset_index(drop=True)


def _q180_mad_outliers(sf_dir: str):
    """Robust per-event-type outliers via exact integer median/MAD
    (rank-element medians, |q-med| > 3*MAD) — the robust sibling of
    q148's mean/std anomaly (ops/relational.group_mad_outliers;
    double-row_number SQL mirror)."""
    import ray.data as rd
    from mapshaper_ray.ops.relational import group_mad_outliers
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "event_type", "value"])
    return group_mad_outliers(ev, "event_type", "value", "event_id",
                              k=3)


def _q181_personalized_pagerank(sf_dir: str):
    """Personalized PageRank (TrustRank shape): teleport mass only to
    the doc_id % 17 == 0 seed set over the same synthetic 3-out-link
    graph as q62 — rank measures proximity to trusted sources
    (ops/graph.personalized_pagerank, 3 iterations, broadcast rank
    vector; oracle = 3 unrolled CTE iterations)."""
    import ray.data as rd
    from mapshaper_ray.ops.graph import personalized_pagerank
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id"]).materialize()
    n = docs.count()

    def mk_edges(df: pd.DataFrame) -> pd.DataFrame:
        i = df["doc_id"].to_numpy(np.int64)
        return pd.DataFrame({
            "src": np.concatenate([i, i, i]),
            "dst": np.concatenate([(i * 7 + 1) % n,
                                   (i * 13 + 5) % n,
                                   (i * 31 + 11) % n])})

    def mk_nodes(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": df["doc_id"]
                             .to_numpy(np.int64)})

    seeds = [i for i in range(n) if i % 17 == 0]
    out = personalized_pagerank(
        docs.map_batches(mk_edges, batch_format="pandas"),
        docs.map_batches(mk_nodes, batch_format="pandas"),
        seeds, iters=3).to_pandas()
    out["rank"] = out["rank"].round(9)
    out = out.rename(columns={"node": "doc_id"})
    return out.astype({"doc_id": np.int64}) \
        .sort_values("doc_id").reset_index(drop=True)


def _q182_agg_incremental(sf_dir: str):
    """Incremental aggregate maintenance: the per-event-type
    (n, sum_q, min_q, max_q) table built from 3/4 of the events is
    UPDATED with the remaining quarter (ops/relational.agg_update —
    no re-read of old data) and must equal the from-scratch SQL
    aggregate over everything."""
    import ray.data as rd
    from mapshaper_ray.ops.relational import agg_update, groupby_agg
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "event_type", "value"]) \
        .materialize()

    def quant(part):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            m = (df["event_id"].to_numpy(np.int64) % 4 == 0) \
                if part == "delta" else \
                (df["event_id"].to_numpy(np.int64) % 4 != 0)
            d = df[m]
            return pd.DataFrame({
                "event_type": d["event_type"].to_numpy(),
                "q": np.floor(d["value"].to_numpy(np.float64)
                              * 100).astype(np.int64)})
        return f

    aggs = {"n": ("q", "count"), "sum_q": ("q", "sum"),
            "min_q": ("q", "min"), "max_q": ("q", "max")}
    base = groupby_agg(ev.map_batches(quant("base"),
                                      batch_format="pandas"),
                       ["event_type"], aggs,
                       final="distributed").to_pandas()
    out = agg_update(base,
                     ev.map_batches(quant("delta"),
                                    batch_format="pandas"),
                     ["event_type"], aggs)
    return out.astype({"n": np.int64, "sum_q": np.int64,
                       "min_q": np.int64, "max_q": np.int64})


def _q183_jsonl_roundtrip(sf_dir: str):
    """JSONL sink + source round-trip: documents stream to
    one-file-per-block .jsonl and back (sources/jsonl); the md5 of
    each round-tripped text must equal the oracle's md5 of the
    original — byte fidelity through the JSON escape/unescape
    cycle."""
    import ray.data as rd
    from mapshaper_ray.ops.dedup import content_md5
    from mapshaper_ray.sources.jsonl import read_jsonl, write_jsonl
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "lang", "text"])
    out_dir = f"/tmp/graft_jsonl_{os.path.basename(sf_dir)}"
    write_jsonl(docs, out_dir)
    back = read_jsonl(out_dir)

    def digest(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(np.int64),
            "lang": df["lang"].to_numpy(object),
            "n_chars2": [len(t) for t in df["text"]],
            "text_md5": np.asarray(content_md5(df["text"]), object)})

    out = back.map_batches(digest, batch_format="pandas").to_pandas()
    out["n_chars2"] = out["n_chars2"].astype(np.int64)
    return out.sort_values("doc_id").reset_index(drop=True)


def _q184_merge_intervals(sf_dir: str):
    """Gaps-and-islands: per-user 30-minute activity intervals merge
    into islands (overlap OR touch); one row per island with its
    span and member count (ops/relational.merge_intervals; classic
    window-cummax SQL mirror)."""
    import ray.data as rd
    from mapshaper_ray.ops.relational import merge_intervals
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])

    def mk(df: pd.DataFrame) -> pd.DataFrame:
        e = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
        return pd.DataFrame({"user_id": df["user_id"]
                             .to_numpy(np.int64),
                             "lo": e, "hi": e + 1_800_000_000})

    out = merge_intervals(ev.map_batches(mk, batch_format="pandas"),
                          "user_id", "lo", "hi").to_pandas()
    out = out.astype({"user_id": np.int64, "island": np.int64,
                      "start_us": np.int64, "end_us": np.int64,
                      "n_merged": np.int64})
    return out.sort_values(["user_id", "island"]) \
        .reset_index(drop=True)


def _q185_winsorize(sf_dir: str):
    """Per-event-type winsorized value sum: clamp to the group's
    [p10, p90] percentile ELEMENTS (integer rank picks) and report
    exact clamped sums (ops/relational.group_winsorize_sum)."""
    import ray.data as rd
    from mapshaper_ray.ops.relational import group_winsorize_sum
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "event_type", "value"])
    return group_winsorize_sum(ev, "event_type", "value",
                               "event_id", p_lo=10, p_hi=90)


def _q186_trending_terms(sf_dir: str):
    """Trending terms per sub-corpus: top-5 tokens by count per
    (lang, source) with deterministic token tiebreak — per-batch
    token-count partials, one distributed (group, token) reduce,
    then grouped_topk over the bounded count table (tokens never
    shuffle raw text)."""
    import ray.data as rd
    from mapshaper_ray.ops.relational import groupby_agg, grouped_topk
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["lang", "source", "text"])

    def counts(df: pd.DataFrame) -> pd.DataFrame:
        gs = (df["lang"].astype(str) + "\x1f"
              + df["source"].astype(str))
        toks = df["text"].fillna("").str.split(" ")
        ex = pd.DataFrame({"gs": gs, "token": toks}) \
            .explode("token", ignore_index=True)
        ex = ex[ex["token"].astype(bool)]
        return ex.groupby(["gs", "token"], as_index=False) \
            .size().rename(columns={"size": "c"})

    cnt = groupby_agg(docs.map_batches(counts, batch_format="pandas"),
                      ["gs", "token"], {"n": ("c", "sum")},
                      final="distributed")
    top = grouped_topk(cnt, "gs", "n", 5, tie_col="token") \
        .to_pandas()
    gs = top["gs"].str.split("\x1f", expand=True)
    out = pd.DataFrame({"lang": gs[0], "source": gs[1],
                        "token": top["token"],
                        "n": top["n"].astype(np.int64)})
    return out.sort_values(["lang", "source", "token"]) \
        .reset_index(drop=True)


def _q187_skew_report(sf_dir: str):
    """Key-skew diagnostic over the q170 skewed join key (60% of
    lineitem on one key): group-size distribution stats — n_keys,
    max, rank-element p50/p99 sizes, hot-key share
    (ops/relational.skew_report; row_number-pick SQL mirror)."""
    import ray.data as rd
    from mapshaper_ray.ops.relational import skew_report
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey"])

    def mk(df: pd.DataFrame) -> pd.DataFrame:
        ok = df["l_orderkey"].to_numpy(np.int64)
        return pd.DataFrame({"k": np.where(ok % 10 < 6, 0, ok % 25)
                             .astype(np.int64)})

    return skew_report(li.map_batches(mk, batch_format="pandas"),
                       "k")


def _q36_lcc(sf_dir: str):
    """-proj lcc (spherical Lambert conformal conic, proj4-family
    params via the +proj string surface)."""
    from mapshaper_ray.stages.proj import project_points
    ds = _geo_points(sf_dir).select_columns(["doc_id", "lon", "lat"])
    out = project_points(
        ds, "+proj=lcc +lat_1=33 +lat_2=45 +lat_0=23 +lon_0=-96") \
        .to_pandas()
    out["x"] = out["x"].round(2)
    out["y"] = out["y"].round(2)
    return out[["doc_id", "x", "y"]]


def _q45_stere(sf_dir: str):
    """-proj +proj=stere +lat_0=90 +lat_ts=70 (polar stereographic,
    new round-3 family; closed-form ellipsoidal oracle)."""
    from mapshaper_ray.stages.proj import project_points
    ds = _geo_points(sf_dir).select_columns(["doc_id", "lon", "lat"])
    out = project_points(
        ds, "+proj=stere +lat_0=90 +lat_ts=70").to_pandas()
    out["x"] = out["x"].round(2)
    out["y"] = out["y"].round(2)
    return out[["doc_id", "x", "y"]]


def _q37_robinson(sf_dir: str):
    """-proj robinson (table-interpolated, the reference's alias)."""
    from mapshaper_ray.stages.proj import project_points
    ds = _geo_points(sf_dir).select_columns(["doc_id", "lon", "lat"])
    out = project_points(ds, "robinson").to_pandas()
    out["x"] = out["x"].round(2)
    out["y"] = out["y"].round(2)
    return out[["doc_id", "x", "y"]]


def _q26_innerlines(sf_dir: str):
    """Shared-edge classification (distributed arc classifier)."""
    from mapshaper_ray.pipelines.geometry import innerlines_pipeline
    return innerlines_pipeline(sf_dir, grid=16)


def _q27_split_on_grid(sf_dir: str):
    """-split-on-grid cell assignment counts over region polygons."""
    from mapshaper_ray.ops.generate import polygon_grid
    from mapshaper_ray.ops.relational import groupby_agg
    from mapshaper_ray.ops.split import split_on_grid
    grid = polygon_grid(8, 8, bbox=(-180, -90, 180, 90))
    out = split_on_grid(grid, 4, 4, bbox=(-180, -90, 180, 90))
    return groupby_agg(out, ["cell"], {"n": ("feature_id", "count")})


def _q31_dissolve2(sf_dir: str):
    """Overlap-repairing dissolve (mosaic tiles, per-cell distributed)."""
    from mapshaper_ray.pipelines.geometry import dissolve2_pipeline
    out = dissolve2_pipeline(sf_dir).to_pandas()
    out["area_total"] = out["area_total"].round(6)
    return out.sort_values("grp").reset_index(drop=True)


def _q32_dissolve_layer(sf_dir: str):
    """Layer-level -dissolve with attribute aggregation + melted
    borders over a generated grid."""
    from mapshaper_ray.ops.features import add_polygon_metrics
    from mapshaper_ray.ops.generate import polygon_grid
    from mapshaper_ray.pipelines.overlay import dissolve_layer

    grid = polygon_grid(6, 6, bbox=(0, 0, 6, 6))

    def key(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["grp"] = "g" + ((df["col"] * 2654435761) % 4).astype(str)
        df["v"] = 1
        return df
    keyed = grid.map_batches(key, batch_format="pandas")
    # cell=2.5 runs the DISTRIBUTED substrate (pre-cut at cell lines →
    # per-cell dissolve → border-cancelling rollup); 2.5 does not align
    # with the unit mesh, so features genuinely get cut mid-ring
    out = dissolve_layer(keyed, "grp", sum_fields=("v",), cell=2.5)
    out = add_polygon_metrics(out).to_pandas()
    out["area"] = out["area"].round(6)
    return out[["grp", "v", "area"]].sort_values("grp") \
        .reset_index(drop=True)


def _q33_clip_layer(sf_dir: str):
    """General polygon clip: grid cells x rotated-square clip region."""
    from mapshaper_ray.ops.features import add_polygon_metrics
    from mapshaper_ray.ops.generate import polygon_grid
    from mapshaper_ray.pipelines.overlay import clip_layer
    import ray.data as rd
    grid = polygon_grid(4, 4, bbox=(0, 0, 4, 4))
    clip = rd.from_items([{
        "feature_id": 0,
        "rings_x": [[2.0, 3.5, 2.0, 0.5, 2.0]],
        "rings_y": [[0.5, 2.0, 3.5, 2.0, 0.5]],
        "ring_poly": [0]}])
    out = add_polygon_metrics(clip_layer(grid, clip)).to_pandas()
    out["area"] = out["area"].round(6)
    return out[["feature_id", "row", "col", "area"]] \
        .sort_values("feature_id").reset_index(drop=True)


def _q35_clip_lines(sf_dir: str):
    """Polyline × polygon clip AND erase (reference polyline-clipping
    semantics: cut at boundary crossings, keep enclosed / non-enclosed
    runs) over 8 horizontal lines × the diamond clip region."""
    import ray.data as rd
    from mapshaper_ray.ops.clip import clip_polylines
    lines = rd.from_items([
        {"line_id": i, "feature_id": i,
         "part_x": [[-1.0, 5.0]],
         "part_y": [[0.25 + i * 0.5, 0.25 + i * 0.5]]}
        for i in range(8)])
    clip = rd.from_items([{
        "feature_id": 0,
        "rings_x": [[2.0, 3.5, 2.0, 0.5, 2.0]],
        "rings_y": [[0.5, 2.0, 3.5, 2.0, 0.5]],
        "ring_poly": [0]}])
    frames = []
    for how in ("clip", "erase"):
        out = clip_polylines(lines, clip, how=how).to_pandas()
        if len(out) == 0:
            continue
        frames.append(pd.DataFrame({
            "line_id": out["line_id"].astype("int64"),
            "mode": how,
            "n_parts": [len(p) for p in out["part_x"]],
            "length": [round(float(sum(
                np.sum(np.hypot(np.diff(np.asarray(x)),
                                np.diff(np.asarray(y))))
                for x, y in zip(px, py))), 6)
                for px, py in zip(out["part_x"], out["part_y"])],
        }))
    return pd.concat(frames, ignore_index=True) \
        .sort_values(["mode", "line_id"]).reset_index(drop=True)


def _q34_text_quality_oracle(sf_dir: str):
    """Language-ID + quality score with a full SQL oracle (q18 minus the
    siphash fingerprint, which SQL can't reproduce)."""
    import ray.data as rd
    from mapshaper_ray.stages.text import analyze_text
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    out = analyze_text(ds).to_pandas()
    out["quality"] = out["quality"].round(6)
    out["stop_ratio"] = out["stop_ratio"].round(6)
    return out[["doc_id", "lang_pred", "stop_ratio", "quality"]] \
        .sort_values("doc_id").reset_index(drop=True)


def _q28_image_features(sf_dir: str):
    """Multimodal plumbing: binary payload -> decoded metadata +
    feature vector (deterministic fake decoder; real codec stubbed)."""
    from mapshaper_ray.stages.multimodal import decode_images, synth_media
    out = decode_images(synth_media(sf_dir, kind="image"),
                        n_features=8).to_pandas()
    out["feat0"] = [round(float(f[0]), 6) for f in out["img_features"]]
    return out[["media_id", "height", "width", "channels", "feat0"]]


def _q29_video_frames(sf_dir: str):
    """Row-expanding frame sampling over video payloads."""
    from mapshaper_ray.stages.multimodal import (sample_video_frames,
                                                 synth_media)
    out = sample_video_frames(synth_media(sf_dir, kind="image"),
                              stride=10, max_frames=4)
    return out


def _q38_audio_features(sf_dir: str):
    """Audio featurize plumbing: payload → sample count, duration,
    deterministic features (codec stubbed; hex-domain md5 arithmetic
    reproducible in SQL)."""
    from mapshaper_ray.stages.multimodal import featurize_audio, synth_media
    out = featurize_audio(synth_media(sf_dir, kind="audio"),
                          n_mfcc=4).to_pandas()
    out["duration_s"] = out["duration_s"].round(6)
    out["feat0"] = [round(float(f[0]), 6) for f in out["audio_features"]]
    return out[["media_id", "n_samples", "duration_s", "feat0"]] \
        .sort_values("media_id").reset_index(drop=True)


def _q39_ann_ivf(sf_dir: str):
    """IVF ANN with nprobe = n_clusters (exhaustive probing): the
    centroid pruning is a no-op, so the result must EQUAL the brute
    top-k — validating the whole IVF path (sampled k-means, centroid
    assignment, per-cluster scoring, partial top-k) against the q14
    SQL oracle."""
    import ray.data as rd
    from mapshaper_ray.ops.ann import ivf_topk
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    qdf = pd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    qdf = qdf[qdf["vec_id"] < 4].sort_values("vec_id")
    queries = np.stack(qdf["embedding"].to_numpy()).astype(np.float64)
    out = ivf_topk(emb, queries, qdf["vec_id"].to_numpy(), k=15,
                   n_clusters=8, nprobe=8).to_pandas()
    out["cosine"] = out["cosine"].round(6)
    out = out.sort_values(["query_id", "cosine", "vec_id"],
                          ascending=[True, False, True], kind="mergesort")
    out = out.groupby("query_id", sort=True).head(10).reset_index(drop=True)
    return out


def _q40_simhash_pairs(sf_dir: str):
    """Simhash near-dup pairs, EXACT by pigeonhole banding (4 x 16-bit
    bands, hamming <= 3 => at least one identical band => recall 1;
    in-bucket Hamming verify => precision 1) — so the distributed
    banded path must equal the SQL all-pairs Hamming oracle."""
    import ray.data as rd
    from mapshaper_ray.ops.dedup import simhash_pairs
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    out = simhash_pairs(ds, max_hamming=3).to_pandas()
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def _q30_nearest_within(sf_dir: str):
    """Nearest other geocoded page within radius 2.0 for pages with
    doc_id < 200 — the large-x-large shuffle path (one cell-id
    exchange with a halo; the full point set never reaches the
    driver)."""
    from mapshaper_ray.ops.knn import nearest_join_shuffle
    from mapshaper_ray.ops.relational import filter_expr
    ds = _geo_points(sf_dir).select_columns(["doc_id", "lon", "lat"])
    probes = filter_expr(ds, "doc_id < 200")
    out = nearest_join_shuffle(probes, ds, radius=2.0,
                               exclude_self=True).to_pandas()
    out["dist"] = out["dist"].replace(np.inf, None)
    out["dist"] = pd.to_numeric(out["dist"]).round(6)
    return out[["doc_id", "neighbor_id", "dist"]] \
        .sort_values("doc_id").reset_index(drop=True)


_RASTER_SPEC = None


def _raster_spec():
    """192x96 world grid; 360/192 = 180/96 = 1.875 is dyadic, so every
    cell center / corner / area / perimeter below is float-EXACT and the
    DuckDB oracle can recompute them bit-for-bit."""
    global _RASTER_SPEC
    if _RASTER_SPEC is None:
        from mapshaper_ray.ops.raster import GridSpec
        _RASTER_SPEC = GridSpec(nx=192, ny=96)
    return _RASTER_SPEC


def _q41_rasterize(sf_dir: str):
    """Vector->raster tile assignment: sample the region-diamond layer
    onto the world grid (row-band shards probing the broadcast
    PathIndex); one row per covered cell."""
    from mapshaper_ray.ops.raster import rasterize
    from mapshaper_ray.regions import build_region_index
    out = rasterize(build_region_index(), _raster_spec()).to_pandas()
    return out.sort_values(["row", "col"]).reset_index(drop=True)


def _q77_zonal_stats(sf_dir: str):
    """Zonal statistics (classic raster GIS op): a deterministic value
    surface v = (row*191 + col) % 97 aggregated per region zone — the
    zones come from the same distributed rasterize pass as q41, the
    aggregation is the partial+final grouped reduce (one partial row
    per (zone, batch)).  Closed-form SQL oracle (dyadic grid)."""
    import pandas as pd
    from mapshaper_ray.ops.raster import rasterize
    from mapshaper_ray.ops.relational import groupby_agg
    from mapshaper_ray.regions import build_region_index
    ras = rasterize(build_region_index(), _raster_spec())

    def surf(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["v"] = ((df["row"].to_numpy() * 191 + df["col"].to_numpy())
                   % 97).astype("float64")
        return df

    out = groupby_agg(ras.map_batches(surf, batch_format="pandas"),
                      ["value"], {
                          "n_cells": ("v", "count"),
                          "sum_v": ("v", "sum"),
                          "mean_v": ("v", "mean"),
                          "min_v": ("v", "min"),
                          "max_v": ("v", "max")}).to_pandas()
    out["mean_v"] = out["mean_v"].round(6)
    for c in ("sum_v", "min_v", "max_v"):
        out[c] = out[c].astype("float64")
    return out.sort_values("value").reset_index(drop=True)


def _q78_triangles(sf_dir: str):
    """Distributed triangle counting over the q62 synthetic 3-out-link
    graph: canonical-edge dedup shuffle, by-pivot wedge emit
    (vectorized triu pairs), wedge⋈edge bucket exchange — one partial
    count per partition reaches the driver."""
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from mapshaper_ray.ops.graph import triangle_count
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id"])
    n = docs.count()

    def mk_edges(df: pd.DataFrame) -> pd.DataFrame:
        d = df["doc_id"].to_numpy(dtype=np.int64)
        src = np.concatenate([d, d, d])
        dst = np.concatenate([(d * 7 + 1) % n, (d * 13 + 5) % n,
                              (d * 31 + 11) % n])
        return pd.DataFrame({"src": src, "dst": dst})

    edges = docs.map_batches(mk_edges, batch_format="pandas")
    return pd.DataFrame({"n_triangles": [triangle_count(edges)]})


def _q79_incremental_dedup(sf_dir: str):
    """Incremental exact dedup (new-batch-vs-corpus ANTI join): docs
    with doc_id >= 250 arrive as the 'new' batch — every third one
    deterministically reuses an existing doc's text (simulated
    re-crawl overlap) — and only those whose content md5 is ABSENT
    from the existing corpus (doc_id < 250) survive.  Both sides hash
    on content and meet in the bucketed exchange; the in-partition
    existence test is global because all rows of a hash share a
    bucket (``how='anti'`` in hash_join)."""
    import ray
    import ray.data as rd
    from mapshaper_ray.ops.dedup import content_md5
    from mapshaper_ray.ops.relational import hash_join

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"]).materialize()
    old_pdf = pd.read_parquet(f"{sf_dir}/documents.parquet",
                              columns=["doc_id", "text"])
    old_pdf = old_pdf[old_pdf["doc_id"] < 250]
    old_texts = dict(zip(old_pdf["doc_id"], old_pdf["text"]))
    tref = ray.put(old_texts)

    def synth_new(df: pd.DataFrame) -> pd.DataFrame:
        ot = ray.get(tref)
        df = df[df["doc_id"] >= 250].copy()
        ids = df["doc_id"].to_numpy()
        df["text"] = [ot[i % 250] if i % 3 == 0 else t
                      for i, t in zip(ids, df["text"])]
        df["content_md5"] = content_md5(df["text"])
        return df

    def old_md5(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["doc_id"] < 250].copy()
        df["content_md5"] = content_md5(df["text"])
        return df

    new = docs.map_batches(synth_new, batch_format="pandas")
    old = docs.map_batches(old_md5, batch_format="pandas")
    out = hash_join(new, old, on="content_md5", how="anti",
                    left_cols=["doc_id", "content_md5"],
                    right_cols=["content_md5"]).to_pandas()
    return out[["doc_id", "content_md5"]].sort_values("doc_id") \
        .reset_index(drop=True)


def _q80_label_centroids(sf_dir: str):
    """Per-label embedding centroids: each batch contributes one
    (label, dim-sum vector, count) partial — k x dim floats — and the
    driver combines the tiny partials (k labels).  The grouped-mean
    building block of kmeans/semantic_dedup exposed as its own op;
    long (label, i, mean_v) output so the SQL oracle is exact."""
    import numpy as np
    import ray.data as rd
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["label", "embedding"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        vecs = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        out = []
        for lab, idx in df.groupby("label").indices.items():
            out.append({"label": int(lab),
                        "s": vecs[idx].sum(axis=0),
                        "n": len(idx)})
        return pd.DataFrame(out)

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    rows = []
    for lab, g in parts.groupby("label"):
        s = np.sum(np.stack(g["s"].to_numpy()), axis=0)
        n = int(g["n"].sum())
        for i, v in enumerate(s / n):
            rows.append({"label": int(lab), "i": i + 1,
                         "mean_v": round(float(v), 6)})
    return pd.DataFrame(rows).sort_values(["label", "i"]) \
        .reset_index(drop=True)


def _q81_percent_rank(sf_dir: str):
    """Global per-row percentile rank of doc length (SQL
    percent_rank): value-range buckets + broadcast exclusive prefix +
    in-bucket sort — the distributed-rank substrate as its own
    contract row (no global sort)."""
    import ray.data as rd
    from mapshaper_ray.ops.rank import percent_rank
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "n_chars"])
    out = percent_rank(ds, "n_chars", "doc_id").to_pandas()
    out["n_chars"] = out["n_chars"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


def _q82_grouped_topk(sf_dir: str):
    """Top-3 longest docs per source: per-batch partial per-group
    top-k, then one grouped reduce over the candidate rows only."""
    import ray.data as rd
    from mapshaper_ray.ops.relational import grouped_topk
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "source", "n_chars"])
    out = grouped_topk(ds, "source", "n_chars", 3,
                       tie_col="doc_id").to_pandas()
    return out.sort_values(["source", "doc_id"]) \
        .reset_index(drop=True)


def _q83_vocab_stats(sf_dir: str):
    """Exact global COUNT(DISTINCT token) + total tokens: per-batch
    distinct tokens bucket-shuffle by token hash (per-partition
    distincts sum to the global), token totals reduce as ints."""
    import ray.data as rd
    from mapshaper_ray.stages.text import vocab_stats
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["text"])
    return vocab_stats(ds)


def _q84_pretrain_pipeline(sf_dir: str):
    """End-to-end pretraining-data pipeline — four verified operators
    composed into one run: exact dedup (keep-first by content md5) →
    Gopher repetition filter (dup_bigram_share <= 0.2) →
    benchmark decontamination (drop docs sharing an 8-token window
    with docs 0..19) → sequence packing into 512-token examples.
    Every stage is the same op its own contract row validates; the
    oracle chains the same four SQL fragments."""
    import ray
    import ray.data as rd
    from mapshaper_ray.ops.dedup import exact_dedup
    from mapshaper_ray.ops.relational import hash_join
    from mapshaper_ray.stages.text import (decontaminate,
                                           pack_sequences,
                                           repetition_signals)
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"]).materialize()
    dd = exact_dedup(docs, text_col="text", order_col="doc_id") \
        .map_batches(lambda df: df[["doc_id", "text"]],
                     batch_format="pandas").materialize()

    keep_ids = repetition_signals(dd).map_batches(
        lambda df: df[df["dup_bigram_share"] <= 0.2][["doc_id"]],
        batch_format="pandas")
    kept = hash_join(dd, keep_ids, on="doc_id", how="semi",
                     left_cols=["doc_id", "text"],
                     right_cols=["doc_id"]).materialize()

    bench = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"],
        filter=__import__("pyarrow").dataset.field("doc_id") < 20)
    bad = decontaminate(kept, bench, k=8).to_pandas()
    bad_ref = ray.put(set(bad["doc_id"]))

    def drop_bad(df: pd.DataFrame) -> pd.DataFrame:
        return df[~df["doc_id"].isin(ray.get(bad_ref))]

    final = kept.map_batches(drop_bad, batch_format="pandas")
    out = pack_sequences(final, seq_len=512).to_pandas()
    return out.sort_values(["example_id", "doc_id"]) \
        .reset_index(drop=True)


def _q85_soft_dedup_weights(sf_dir: str):
    """SoftDeDup-style duplicate down-weighting (train-time
    reweighting instead of dropping): every doc gets weight =
    1 / size of its near-dup cluster (singletons keep 1.0).  The
    label table is bounded by near-dup membership, so it broadcasts
    (two sorted arrays + searchsorted, no per-row dict lookups);
    clusters come from the same distributed LSH + large/small-star
    components q48 validates.  Thin wrapper over the library operator
    `ops.dedup.soft_dedup_weights`."""
    import ray.data as rd
    from mapshaper_ray.ops.dedup import minhash_lsh, soft_dedup_weights
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"]).materialize()
    pairs = minhash_lsh(docs, threshold=0.4)
    out = soft_dedup_weights(
        docs, pairs=rd.from_pandas(pairs[["id_a", "id_b"]])).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _q86_latest_capture(sf_dir: str):
    """WARC-style keep-latest-capture-per-url dedup (the input
    table's (url, warc_ts) contract): three deterministic re-crawls
    per page, the newest snapshot survives per url via grouped_topk
    (per-batch partial top-1, candidate rows only — no full shuffle).
    The content hash in the output proves the RIGHT capture's text
    survived, not just the right timestamp."""
    import ray.data as rd
    from mapshaper_ray.ops.dedup import content_md5
    from mapshaper_ray.ops.relational import grouped_topk
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def captures(df: pd.DataFrame) -> pd.DataFrame:
        ids = np.repeat(df["doc_id"].to_numpy(), 3)
        r = np.tile(np.arange(3, dtype=np.int64), len(df))
        texts = [t + " r" + str(k) for t in df["text"]
                 for k in range(3)]
        return pd.DataFrame({
            "url": ["https://site" + str(i % 1000) + ".example/p/"
                    + str(i) for i in ids],
            "doc_id": ids,
            "ts_ms": ids * 1009 + 1577836800000 + r * 86400000,
            "text": texts})

    caps = docs.map_batches(captures, batch_format="pandas")
    latest = grouped_topk(caps, "url", "ts_ms", 1,
                          tie_col="doc_id").to_pandas()
    latest["content_md5"] = content_md5(latest["text"])
    return latest[["url", "doc_id", "ts_ms", "content_md5"]] \
        .sort_values("doc_id").reset_index(drop=True)


def _q87_tile_lang_mix(sf_dir: str):
    """Geo × text composition: per-(tile, language) page counts —
    the geocode → cell-assign flagship stages feeding the grouped
    reduce, with the corpus lang column carried through."""
    import ray.data as rd
    from mapshaper_ray.ops.relational import groupby_agg
    from mapshaper_ray.stages.geocode import geocode
    from mapshaper_ray.stages.tiles import assign_cells
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "n_chars",
                                  "lang"])
    ds = assign_cells(geocode(ds))
    out = groupby_agg(ds, ["tile", "lang"],
                      {"n_pages": ("doc_id", "count")}).to_pandas()
    return out.sort_values(["tile", "lang"]).reset_index(drop=True)


def _q43_embedding_lsh(sf_dir: str):
    """Hyperplane-LSH near-dup (the scale path for embedding dedup):
    band-OR over 64 tables of 4 hyperplanes, exact cosine verify
    in-bucket.  Precision is 1 BY CONSTRUCTION (every emitted pair
    passed the exact-cosine verify, so q43 ⊆ q15 always); with 4×64
    banding the per-pair miss probability at cosine 0.35 is
    (1-0.614^4)^64 ≈ 5e-5, and the seeded run is DETERMINISTIC —
    verified missed=0 against the exact pair set at sf0.001/sf0.01
    (tests/test_embedding_lsh.py), so the exact all-pairs SQL (q15's)
    is this query's value-exact oracle."""
    import ray.data as rd
    from mapshaper_ray.ops.dedup import embedding_near_dup
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    out = embedding_near_dup(emb, threshold=0.35,
                             n_planes=4, n_tables=64).to_pandas()
    if "cosine" not in out.columns:
        out = pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                            "id_b": pd.Series([], dtype="int64"),
                            "cosine": pd.Series([], dtype="float64")})
    out["cosine"] = out["cosine"].round(6)
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def _q44_dissolve_auto(sf_dir: str):
    """DEFAULT-path dissolve over a >AUTO_DISTRIBUTE_ROWS layer: no
    cell= is passed, so dissolve_layer itself selects the distributed
    cell substrate (pre-cut → per-cell dissolve → border-cancelling
    rollup) — the contract query for the round-3 'distributed by
    default' guarantee.  The 80×80 unit grid groups by whole columns,
    so the oracle is closed-form (80 cells / 80.0 area per column)."""
    from mapshaper_ray.ops.features import add_polygon_metrics
    from mapshaper_ray.ops.generate import polygon_grid
    from mapshaper_ray.pipelines.overlay import (auto_cell_size,
                                                 dissolve_layer)

    grid = polygon_grid(80, 80, bbox=(0, 0, 80, 80))

    def key(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["grp"] = "g" + ((df["col"] * 2654435761) % 7).astype(str)
        df["v"] = 1
        return df
    keyed = grid.map_batches(key, batch_format="pandas")
    assert auto_cell_size(keyed)[0] is not None, \
        "6400-row layer must route to the distributed substrate"
    out = dissolve_layer(keyed, "grp", sum_fields=("v",))  # default!
    out = add_polygon_metrics(out).to_pandas()
    out["area"] = out["area"].round(6)
    return out[["grp", "v", "area"]].sort_values("grp") \
        .reset_index(drop=True)


def _q46_sample(sf_dir: str):
    """Seeded partition-independent sampling (hash-membership): the
    sampled id set is a pure function of (seed, doc_id), so DuckDB's
    md5_number_lower reproduces it bit-for-bit."""
    import ray.data as rd
    from mapshaper_ray.ops.relational import deterministic_sample
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id"])
    out = deterministic_sample(ds, 0.2, id_col="doc_id",
                               seed=7).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _q42_raster_polygons(sf_dir: str):
    """Raster->vector: reconstruct the diamond regions from the q41
    raster by distributed edge cancellation + ring stitching; area and
    perimeter are measured from the TRACED geometry (shoelace / segment
    lengths), which the oracle recomputes closed-form — exact, no
    rounding."""
    from mapshaper_ray.ops.raster import rasterize, raster_to_polygons
    from mapshaper_ray.regions import build_region_index
    spec = _raster_spec()
    ras = rasterize(build_region_index(), spec)
    out = raster_to_polygons(ras, spec).to_pandas()
    return out[["value", "area", "perimeter"]] \
        .sort_values("value").reset_index(drop=True)


# ---------------------------------------------------------------------------
# contract functions

def entry() -> Any:
    from mapshaper_ray.pipelines.flagship import flagship_counts
    return flagship_counts("/root/testdata/sf0.001")


#: Ordering contract: the driver's correctness artifact caps at the
#: FIRST 50 queries() entries, so this list pins a representative
#: cross-family window; it ROTATES each round so families the driver
#: has never gated get driver rows (round 5: 26 carried anchors + 24
#: first-time entries — sketch persistence, GROUPING SETS,
#: containment join, OLS/anomaly, trimmed mean, phash radius,
#: geocent, sliding window, resample, retention, ...).  Everything
#: not listed follows in registration order; the committed
#: full-registry evidence for ALL entries is
#: CORRECTNESS_FULL_r{N}.json (scripts/validate_oracle.py --json).
_DRIVER_WINDOW = [
    # carried anchors (one per heavy family + the q1 canary)
    "q1_lineitem_agg", "q2_each_filter", "q4_hash_join", "q5_topk",
    "q7_calc_stats", "q10_spatial_join", "q19_simplify",
    "q20_dissolve", "q31_dissolve2", "q33_clip_layer",
    "q41_rasterize", "q57_s2_cells", "q58_cover_join",
    "q12_exact_dedup", "q16_minhash_pairs",
    "q68_exact_substring_dedup", "q14_ann_topk", "q63_kmeans",
    "q62_pagerank", "q78_triangles", "q61_bm25", "q71_bpe_train",
    "q67_pack_sequences", "q84_pretrain_pipeline", "q115_tpch_q3",
    "q113_warc_ingest",
    # first-time driver rows (round-5 rotation)
    "q152_containment", "q153_grouping_sets", "q157_group_trend",
    "q158_rate_anomaly", "q95_bloom_incremental",
    "q161_ddsketch_incremental", "q162_trimmed_mean",
    "q163_host_dup_rate", "q164_phash_near_dup", "q165_geocent",
    "q109_sliding_window", "q59_host_stats", "q144_resample",
    "q146_group_ddsketch", "q154_char_entropy", "q160_log_odds",
    "q159_related_terms", "q156_phash_dedup",
    "q85_soft_dedup_weights", "q166_theta_sketch",
    "q170_skew_join", "q93_heavy_hitters", "q122_retention",
    "q136_multikey_join",
]


def queries() -> dict[str, Callable[[str], Any]]:
    q = {
        "q1_lineitem_agg": _q1_lineitem_agg,
        "q2_each_filter": _q2_each_filter,
        "q3_broadcast_join": _q3_broadcast_join,
        "q4_hash_join": _q4_hash_join,
        "q5_topk": _q5_topk,
        "q6_uniq_first": _q6_uniq_first,
        "q7_calc_stats": _q7_calc_stats,
        "q8_window": _q8_window,
        "q9_cells": _q9_cells,
        "q10_spatial_join": _q10_spatial_join,
        "q11_region_counts": _q11_region_counts,
        "q19_simplify": _q19_simplify,
        "q20_dissolve": _q20_dissolve,
        "q25_webmercator": _q25_webmercator,
        "q26_innerlines": _q26_innerlines,
        "q31_dissolve2": _q31_dissolve2,
        "q33_clip_layer": _q33_clip_layer,
        "q41_rasterize": _q41_rasterize,
        "q42_raster_polygons": _q42_raster_polygons,
        "q57_s2_cells": _q57_s2_cells,
        "q58_cover_join": _q58_cover_join,
        "q77_zonal_stats": _q77_zonal_stats,
        "q22_knn": _q22_knn,
        "q12_exact_dedup": _q12_exact_dedup,
        "q16_minhash_pairs": _q16_minhash_pairs,
        "q43_embedding_lsh": _q43_embedding_lsh,
        "q48_dedup_clusters": _q48_dedup_clusters,
        "q68_exact_substring_dedup": _q68_exact_substring_dedup,
        "q118_kcore": _q118_kcore,
        "q14_ann_topk": _q14_ann_topk,
        "q70_ann_pq": _q70_ann_pq,
        "q65_semantic_dedup": _q65_semantic_dedup,
        "q63_kmeans": _q63_kmeans,
        "q62_pagerank": _q62_pagerank,
        "q78_triangles": _q78_triangles,
        "q141_ddsketch": _q141_ddsketch,
        "q148_anomaly": _q148_anomaly,
        "q61_bm25": _q61_bm25,
        "q142_bfs": _q142_bfs,
        "q67_pack_sequences": _q67_pack_sequences,
        "q69_dsir_weights": _q69_dsir_weights,
        "q71_bpe_train": _q71_bpe_train,
        "q116_nb_classifier": _q116_nb_classifier,
        "q150_web_curation": _q150_web_curation,
        "q143_url_blocklist": _q143_url_blocklist,
        "q155_boilerplate": _q155_boilerplate,
        "q120_funnel": _q120_funnel,
        "q113_warc_ingest": _q113_warc_ingest,
        "q115_tpch_q3": _q115_tpch_q3,
        "q84_pretrain_pipeline": _q84_pretrain_pipeline,
        "q149_pool_embeddings": _q149_pool_embeddings,
        "q151_grouped_cumsum": _q151_grouped_cumsum,
        "q152_containment": _q152_containment,
        "q153_grouping_sets": _q153_grouping_sets,
        "q154_char_entropy": _q154_char_entropy,
        "q156_phash_dedup": _q156_phash_dedup,
        "q157_group_trend": _q157_group_trend,
        "q158_rate_anomaly": _q158_rate_anomaly,
        "q159_related_terms": _q159_related_terms,
        "q160_log_odds": _q160_log_odds,
        "q161_ddsketch_incremental": _q161_ddsketch_incremental,
        "q162_trimmed_mean": _q162_trimmed_mean,
        "q163_host_dup_rate": _q163_host_dup_rate,
        "q164_phash_near_dup": _q164_phash_near_dup,
        "q165_geocent": _q165_geocent,
        "q166_theta_sketch": _q166_theta_sketch,
        "q167_group_corr": _q167_group_corr,
        "q168_scd2": _q168_scd2,
        "q169_time_weighted": _q169_time_weighted,
        "q170_skew_join": _q170_skew_join,
        "q171_connected_components": _q171_connected_components,
        "q172_interval_join": _q172_interval_join,
        "q173_profile": _q173_profile,
        "q174_cdc_apply": _q174_cdc_apply,
        "q175_hexbin": _q175_hexbin,
        "q176_compaction_plan": _q176_compaction_plan,
        "q177_grouped_window": _q177_grouped_window,
        "q178_event_gaps": _q178_event_gaps,
        "q179_crawl_waves": _q179_crawl_waves,
        "q180_mad_outliers": _q180_mad_outliers,
        "q181_personalized_pagerank": _q181_personalized_pagerank,
        "q182_agg_incremental": _q182_agg_incremental,
        "q183_jsonl_roundtrip": _q183_jsonl_roundtrip,
        "q184_merge_intervals": _q184_merge_intervals,
        "q185_winsorize": _q185_winsorize,
        "q186_trending_terms": _q186_trending_terms,
        "q187_skew_report": _q187_skew_report,
        "q76_decontaminate": _q76_decontaminate,
        "q121_weighted_sample": _q121_weighted_sample,
        "q30_nearest_within": _q30_nearest_within,
        "q47_ngram_jaccard": _q47_ngram_jaccard,
        "q49_dedup_near": _q49_dedup_near,
        "q66_redact_pii": _q66_redact_pii,
        "q85_soft_dedup_weights": _q85_soft_dedup_weights,
        "q18_text_quality": _q18_text_quality,
        "q51_token_df": _q51_token_df,
        "q74_mix_sample": _q74_mix_sample,
        "q13_token_stats": _q13_token_stats,
        "q15_embedding_neardup": _q15_embedding_neardup,
        "q17_simhash": _q17_simhash,
        "q21_region_point_agg": _q21_region_point_agg,
        "q23_clip_points": _q23_clip_points,
        "q24_erase_points": _q24_erase_points,
        "q27_split_on_grid": _q27_split_on_grid,
        "q28_image_features": _q28_image_features,
        "q29_video_frames": _q29_video_frames,
        "q32_dissolve_layer": _q32_dissolve_layer,
        "q34_text_quality_oracle": _q34_text_quality_oracle,
        "q35_clip_lines": _q35_clip_lines,
        "q36_lcc": _q36_lcc,
        "q37_robinson": _q37_robinson,
        "q38_audio_features": _q38_audio_features,
        "q39_ann_ivf": _q39_ann_ivf,
        "q40_simhash_pairs": _q40_simhash_pairs,
        "q44_dissolve_auto": _q44_dissolve_auto,
        "q45_stere": _q45_stere,
        "q46_sample": _q46_sample,
        "q50_dup_window_stats": _q50_dup_window_stats,
        "q52_sessions": _q52_sessions,
        "q53_asof_join": _q53_asof_join,
        "q54_range_join": _q54_range_join,
        "q55_group_quantiles": _q55_group_quantiles,
        "q56_repetition": _q56_repetition,
        "q59_host_stats": _q59_host_stats,
        "q60_group_sample": _q60_group_sample,
        "q72_bpe_encode": _q72_bpe_encode,
        "q73_window_hopping": _q73_window_hopping,
        "q75_quality_filter": _q75_quality_filter,
        "q80_label_centroids": _q80_label_centroids,
        "q81_percent_rank": _q81_percent_rank,
        "q82_grouped_topk": _q82_grouped_topk,
        "q83_vocab_stats": _q83_vocab_stats,
        "q86_latest_capture": _q86_latest_capture,
        "q87_tile_lang_mix": _q87_tile_lang_mix,
        "q88_natearth2": _q88_natearth2,
        "q89_tissot": _q89_tissot,
        "q90_js_each": _q90_js_each,
        "q92_hll_by_group": _q92_hll_by_group,
        "q94_reservoir_sample": _q94_reservoir_sample,
        "q96_ccnet_buckets": _q96_ccnet_buckets,
        "q97_group_variance": _q97_group_variance,
        "q98_random_project": _q98_random_project,
        "q99_passage_dedup": _q99_passage_dedup,
        "q100_url_dedup": _q100_url_dedup,
        "q101_nn_join": _q101_nn_join,
        "q102_pmi_bigrams": _q102_pmi_bigrams,
        "q104_c4_filter": _q104_c4_filter,
        "q105_tfidf": _q105_tfidf,
        "q106_inverted_index": _q106_inverted_index,
        "q108_stratified_split": _q108_stratified_split,
        "q110_clean_text": _q110_clean_text,
        "q111_bigram_nll": _q111_bigram_nll,
        "q112_scalar_quantize": _q112_scalar_quantize,
        "q114_rollup": _q114_rollup,
        "q117_host_graph": _q117_host_graph,
        "q119_pivot_events": _q119_pivot_events,
        "q79_incremental_dedup": _q79_incremental_dedup,
        "q95_bloom_incremental": _q95_bloom_incremental,
        "q109_sliding_window": _q109_sliding_window,
        "q107_cms": _q107_cms,
        "q122_retention": _q122_retention,
        "q123_window_funnel": _q123_window_funnel,
        "q124_temperature_mix": _q124_temperature_mix,
        "q125_chunk_docs": _q125_chunk_docs,
        "q126_label_prop": _q126_label_prop,
        "q127_gram_matrix": _q127_gram_matrix,
        "q128_zorder": _q128_zorder,
        "q129_locf_fill": _q129_locf_fill,
        "q130_attribution": _q130_attribution,
        "q131_rolling_dau": _q131_rolling_dau,
        "q132_dataset_diff": _q132_dataset_diff,
        "q133_cube": _q133_cube,
        "q134_edit1_pairs": _q134_edit1_pairs,
        "q135_user_features": _q135_user_features,
        "q136_multikey_join": _q136_multikey_join,
        "q137_group_weighted_sample": _q137_group_weighted_sample,
        "q138_histogram": _q138_histogram,
        "q139_ntile": _q139_ntile,
        "q140_event_paths": _q140_event_paths,
        "q144_resample": _q144_resample,
        "q145_skipgram": _q145_skipgram,
        "q91_hll_distinct": _q91_hll_distinct,
        "q93_heavy_hitters": _q93_heavy_hitters,
        "q103_gopher_rules": _q103_gopher_rules,
        "q64_lm_nll": _q64_lm_nll,
        "q146_group_ddsketch": _q146_group_ddsketch,
        "q147_rrf": _q147_rrf,
    }
    window = set(_DRIVER_WINDOW)
    missing = window - q.keys()
    assert not missing, f"_DRIVER_WINDOW names unknown: {missing}"
    assert len(_DRIVER_WINDOW) == 50
    return {**{k: q[k] for k in _DRIVER_WINDOW},
            **{k: v for k, v in q.items() if k not in window}}


# shared fragment: per-doc k=5 token-window md5 shingle/fingerprint hashes
# (mirrors stages/text.py window_hashes: md5_number_lower of the window
# tokens joined with the unit separator; <k tokens -> one hash of all)
def _shingle_list(ts: str = "ts", k: int = 5) -> str:
    return f"""
    CASE WHEN len({ts}) = 0 THEN [CAST(0 AS UBIGINT)]
         WHEN len({ts}) < {k}
           THEN [md5_number_lower(array_to_string({ts}, chr(31)))]
         ELSE list_transform(generate_series(1, len({ts}) - {k - 1}),
                i -> md5_number_lower(
                    array_to_string({ts}[i:i+{k - 1}], chr(31))))
    END"""


_SHINGLE_LIST = _shingle_list("ts")

# shared fragment (q48/q49): exact near-dup pairs at jaccard >= 0.4
# (the q16-verified pair set) + transitive closure to connected
# components via a recursive CTE — min reachable id = cluster_id
_CLUSTER_CTES = rf"""
            toks AS (
              SELECT doc_id, regexp_extract_all(text, '\S+') AS ts
              FROM documents),
            sh AS (SELECT doc_id, list_distinct({_SHINGLE_LIST}) AS s
                   FROM toks),
            ex AS (SELECT doc_id, unnest(s) AS h FROM sh),
            inter AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                     count(*) AS n_inter
              FROM ex a JOIN ex b ON a.h = b.h AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
            sz AS (SELECT doc_id, len(s) AS n FROM sh),
            pairs AS (
              SELECT id_a, id_b
              FROM inter JOIN sz na ON id_a = na.doc_id
                         JOIN sz nb ON id_b = nb.doc_id
              WHERE CAST(n_inter AS DOUBLE) / (na.n + nb.n - n_inter)
                    >= 0.4),
            edges AS (SELECT id_a AS u, id_b AS v FROM pairs
                      UNION SELECT id_b, id_a FROM pairs),
            nodes AS (SELECT DISTINCT u AS node FROM edges),
            reach AS (
              SELECT node, node AS r FROM nodes
              UNION
              SELECT e.v AS node, reach.r
              FROM reach JOIN edges e ON e.u = reach.node),
            labels AS (SELECT node, min(r) AS cluster_id
                       FROM reach GROUP BY node)"""


def _q19_fixture_sql() -> str:
    """VALUES-literal fixture from scripts/gen_q19_fixture.py — an
    independent brute-force Visvalingam implementation (no heap, direct
    sort rank), valid at the driver's sf0.01 correctness scale."""
    try:
        import fixture_oracles
    except ImportError:
        # the driver may import this module by file path without the
        # repo root on sys.path
        import importlib.util
        import os
        spec = importlib.util.spec_from_file_location(
            "fixture_oracles",
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "fixture_oracles.py"))
        fixture_oracles = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(fixture_oracles)
    return fixture_oracles.Q19_SQL


def _q57_fixture_sql() -> str:
    """VALUES-literal fixture from scripts/gen_s2_fixture.py — an
    independent scalar interval-descent S2 encoder, valid at the
    driver's sf0.01 correctness scale."""
    try:
        import fixture_oracles_s2
    except ImportError:
        import importlib.util
        import os
        spec = importlib.util.spec_from_file_location(
            "fixture_oracles_s2",
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "fixture_oracles_s2.py"))
        fixture_oracles_s2 = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(fixture_oracles_s2)
    return fixture_oracles_s2.Q57_SQL

def _bpe_fixture_sqls() -> tuple:
    """VALUES-literal fixtures from scripts/gen_bpe_fixture.py — an
    independent scalar plain-dict BPE trainer + greedy encoder, valid
    at the driver's sf0.01 correctness scale."""
    try:
        import fixture_oracles_bpe
    except ImportError:
        import importlib.util
        import os
        spec = importlib.util.spec_from_file_location(
            "fixture_oracles_bpe",
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "fixture_oracles_bpe.py"))
        fixture_oracles_bpe = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(fixture_oracles_bpe)
    return fixture_oracles_bpe.Q71_SQL, fixture_oracles_bpe.Q72_SQL


def _hll_fixture_sqls() -> tuple:
    """VALUES-literal fixtures from scripts/gen_hll_fixture.py — an
    independent scalar HyperLogLog (pure-Python per-row, no numpy, no
    shared code with ops/sketch.py), valid at the driver's sf0.01
    correctness scale."""
    try:
        import fixture_oracles_hll
    except ImportError:
        import importlib.util
        import os
        spec = importlib.util.spec_from_file_location(
            "fixture_oracles_hll",
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "fixture_oracles_hll.py"))
        fixture_oracles_hll = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(fixture_oracles_hll)
    return fixture_oracles_hll.Q91_SQL, fixture_oracles_hll.Q92_SQL


# shared fragment: the synthetic media payload's hex head (mirrors
# stages/multimodal.py synth_media + _u32: payload = md5-digest(text)
# repeated (4 + len%64) times; decode hashes md5(salt + hex(payload[:256])))
_MEDIA_HEAD = """media AS (
  SELECT doc_id AS media_id,
         substring(repeat(lower(md5(text)), 4 + length(text) % 64),
                   1, 512) AS head
  FROM documents)"""



# Robinson float32-rounded cubic coefficients, one VALUES row per
# 5-degree node: (idx, x0..x3, y0..y3) — same public proj4 table the
# engine uses (mproj stores them as Float32Array; these literals are
# the float32-rounded doubles)
_ROBIN_ROWS_SQL = """\
              (0, 1.0, 2.21989997769713e-17, -7.155149796744809e-05, 3.1102999855647795e-06,
               -5.204170014340115e-18, 0.012400000356137753, 1.2143100314194296e-18, -8.452839816985858e-11),
              (1, 0.9986000061035156, -0.0004822429909836501, -2.4896999093471095e-05, -1.3308999768923968e-06,
               0.06199999898672104, 0.012400000356137753, -1.267929983228555e-09, 4.226420047270807e-10),
              (2, 0.9954000115394592, -0.0008310300181619823, -4.486049874685705e-05, -9.867010248854058e-07,
               0.12399999797344208, 0.012400000356137753, 5.071710162951604e-09, -1.6060399676831594e-09),
              (3, 0.9900000095367432, -0.0013536399928852916, -5.966100070509128e-05, 3.677700078696944e-06,
               0.1860000044107437, 0.012399899773299694, -1.9018900232481428e-08, 6.001520169718333e-09),
              (4, 0.982200026512146, -0.001674419967457652, -4.495469966059318e-06, -5.724109996663174e-06,
               0.24799999594688416, 0.01240019965916872, 7.100390320147199e-08, -2.240000007702747e-08),
              (5, 0.9729999899864197, -0.0021486799232661724, -9.035709808813408e-05, 1.8735999418595384e-08,
               0.3100000023841858, 0.012399200350046158, -2.6499699856685766e-07, 8.359860004247821e-08),
              (6, 0.9599999785423279, -0.0030508500058203936, -9.007610060507432e-05, 1.6491700307597057e-06,
               0.3720000088214874, 0.01240289956331253, 9.88982947092154e-07, -3.119940004125965e-07),
              (7, 0.9427000284194946, -0.003827919950708747, -6.533860141644254e-05, -2.6154000352107687e-06,
               0.4339999854564667, 0.012389300391077995, -3.6909300433762837e-06, -4.3562098994698317e-07),
              (8, 0.9215999841690063, -0.004677460063248873, -0.00010456999734742567, 4.812429779121885e-06,
               0.4957999885082245, 0.012319800443947315, -1.0225199730484746e-05, -3.455230057625158e-07),
              (9, 0.8962000012397766, -0.005362229887396097, -3.2383100915467367e-05, -5.43431997357402e-06,
               0.5570999979972839, 0.012191600166261196, -1.540810080769006e-05, -5.822880098094174e-07),
              (10, 0.867900013923645, -0.006093630101531744, -0.00011389800056349486, 3.324840008644969e-06,
               0.6176000237464905, 0.011993800289928913, -2.4142400434357114e-05, -5.253269819149864e-07),
              (11, 0.8349999785423279, -0.006983249913901091, -6.402529834304005e-05, 9.34959018650261e-07,
               0.6769000291824341, 0.011713000014424324, -3.202230072929524e-05, -5.164050094208505e-07),
              (12, 0.7986000180244446, -0.007553379982709885, -5.000090095563792e-05, 9.353240102427662e-07,
               0.7346000075340271, 0.011354099959135056, -3.976840162067674e-05, -6.090519946155837e-07),
              (13, 0.7597000002861023, -0.00798324029892683, -3.5970999306300655e-05, -2.276259920108714e-06,
               0.7903000116348267, 0.01091070007532835, -4.8904199502430856e-05, -1.0473900147189852e-06),
              (14, 0.7185999751091003, -0.008513670414686203, -7.011489651631564e-05, -8.63029981701402e-06,
               0.843500018119812, 0.010343099944293499, -6.461500015575439e-05, -1.4037400131172717e-09),
              (15, 0.6732000112533569, -0.009862090460956097, -0.00019956899632234126, 1.919739952427335e-05,
               0.8935999870300293, 0.009696859866380692, -6.463599856942892e-05, -8.54700010677334e-06),
              (16, 0.6212999820709229, -0.0104179996997118, 8.839229849399999e-05, 6.240510174393421e-06,
               0.9394000172615051, 0.008409470319747925, -0.00019284100562799722, -4.210599854559405e-06),
              (17, 0.5722000002861023, -0.009066009894013405, 0.00018200000340584666, 6.240510174393421e-06,
               0.9761000275611877, 0.0061652702279388905, -0.00025599999935366213, -4.210599854559405e-06),
              (18, 0.5321999788284302, -0.006777970120310783, 0.0002756080066319555, 6.240510174393421e-06,
               1.0, 0.0032894699834287167, -0.0003191590076312423, -4.210599854559405e-06)"""


def _kmeans_ctes(k: int = 8, iters: int = 3,
                 scale: int = 1024) -> list[str]:
    """Unroll ops/cluster.kmeans as SQL CTEs: the same integer
    quantization, exact int-valued squared distances via
    list_dot_product, lowest-cid tiebreak, and round-half-up centroid
    means (floor((2s + n) / (2n))); empty clusters keep the previous
    centroid via the LEFT JOIN coalesce."""
    def assign(name, cents):
        return f"""{name} AS (
          SELECT vec_id, cid FROM (
            SELECT q.vec_id, c.cid,
              row_number() OVER (PARTITION BY q.vec_id ORDER BY
                list_dot_product(q.v, q.v) + list_dot_product(c.v, c.v)
                - 2 * list_dot_product(q.v, c.v), c.cid) AS rn
            FROM q, {cents} c) WHERE rn = 1)"""

    def update(name, prev_cents, asg):
        return f"""{name} AS (
          SELECT p.cid, coalesce(m.v, p.v) AS v
          FROM {prev_cents} p LEFT JOIN (
            SELECT cid, list(CAST(floor((2 * s + n) / (2.0 * n))
                                  AS BIGINT) ORDER BY d) AS v
            FROM (SELECT a.cid AS cid, qd.d AS d,
                         sum(qd.val) AS s, count(*) AS n
                  FROM {asg} a JOIN qd USING (vec_id)
                  GROUP BY a.cid, qd.d)
            GROUP BY cid) m ON p.cid = m.cid)"""

    ctes = [f"""q AS (
          SELECT vec_id,
                 list_transform(embedding,
                   x -> CAST(floor(x * {scale} + 0.5) AS BIGINT)) AS v
          FROM embeddings)""",
            """qd AS (
          SELECT vec_id, unnest(v) AS val,
                 generate_subscripts(v, 1) AS d FROM q)""",
            f"c0 AS (SELECT vec_id AS cid, v FROM q WHERE vec_id < {k})"]
    for i in range(1, iters + 1):
        ctes.append(assign(f"a{i}", f"c{i - 1}"))
        ctes.append(update(f"c{i}", f"c{i - 1}", f"a{i}"))
    ctes.append(assign("afin", f"c{iters}"))
    return ctes


def _kmeans_sql(k: int = 8, iters: int = 3, scale: int = 1024) -> str:
    return ("WITH " + ",\n".join(_kmeans_ctes(k, iters, scale)) +
            "\nSELECT vec_id, cid AS cluster FROM afin ORDER BY vec_id")


def _semantic_dedup_sql(k: int = 8, iters: int = 3, scale: int = 1024,
                        threshold: float = 0.35) -> str:
    """ops/cluster.semantic_dedup unrolled: the kmeans CTEs label each
    vector, then a within-cluster lower-id cosine join finds the rows
    to drop; survivors remain."""
    ctes = _kmeans_ctes(k, iters, scale)
    ctes.append("""ev AS (
          SELECT vec_id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
          FROM embeddings)""")
    ctes.append(f"""dropped AS (
          SELECT DISTINCT hi.vec_id
          FROM afin hi
          JOIN afin lo ON hi.cid = lo.cid AND lo.vec_id < hi.vec_id
          JOIN ev a ON a.vec_id = hi.vec_id
          JOIN ev b ON b.vec_id = lo.vec_id
          WHERE list_cosine_similarity(a.ve, b.ve) >= {threshold})""")
    return ("WITH " + ",\n".join(ctes) + """
        SELECT f.vec_id, f.cid AS cluster FROM afin f
        WHERE f.vec_id NOT IN (SELECT vec_id FROM dropped)
        ORDER BY f.vec_id""")


def oracle_sql() -> dict[str, str]:
    region_case = _region_case()
    out = {
        "q1_lineitem_agg": """
            SELECT l_returnflag, l_linestatus,
                   sum(l_quantity) AS sum_qty,
                   count(*) AS n,
                   sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100.0 + 0.5)
                            AS BIGINT)) / 100.0 AS sum_revenue,
                   (sum(CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT)) / 100.0)
                     / count(*) AS avg_disc
            FROM lineitem
            WHERE l_shipdate < TIMESTAMP '1996-01-01'
            GROUP BY l_returnflag, l_linestatus""",
        "q2_each_filter": """
            SELECT l_orderkey, l_linenumber,
                   l_extendedprice * l_discount AS revenue
            FROM lineitem
            WHERE l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""",
        "q3_broadcast_join": """
            SELECT c_mktsegment,
                   count(*) AS n_orders,
                   round(sum(o_totalprice), 2) AS sum_total
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment""",
        "q4_hash_join": """
            SELECT o_orderpriority, count(*) AS n, sum(l_quantity) AS sum_qty
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            GROUP BY o_orderpriority""",
        "q5_topk": """
            SELECT o_orderkey, o_totalprice FROM orders
            ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""",
        "q6_uniq_first": """
            SELECT user_id, event_id AS first_event_id, value
            FROM events
            QUALIFY row_number() OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) = 1""",
        "q7_calc_stats": """
            SELECT count(*) AS count_rows,
                   round(sum(l_extendedprice), 2) AS sum_v,
                   round(avg(l_extendedprice), 4) AS avg_v,
                   min(l_extendedprice) AS min_v,
                   max(l_extendedprice) AS max_v,
                   median(l_extendedprice) AS median_v
            FROM lineitem""",
        "q8_window": """
            SELECT event_type,
                   CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS window_start,
                   count(*) AS n, round(sum(value), 4) AS sum_value
            FROM events GROUP BY event_type, window_start""",
        "q73_window_hopping": """
            -- 2h windows hopping every 1h: each event joins the two
            -- windows containing it (floor-division arithmetic
            -- matches ops/relational.window_hopping exactly)
            SELECT event_type,
                   CAST(u.w * 3600 AS BIGINT) AS window_start,
                   count(*) AS n, round(sum(value), 4) AS sum_value
            FROM events,
                 unnest(generate_series(
                   CAST(floor((epoch(ts) - 7200) / 3600) + 1 AS BIGINT),
                   CAST(floor(epoch(ts) / 3600) AS BIGINT))) AS u(w)
            GROUP BY event_type, window_start
            ORDER BY event_type, window_start""",
        "q74_mix_sample": """
            -- per-source 600-token budget fill in md5 hash order;
            -- window cumsum = the engine's distributed prefix scan
            WITH t AS (
              SELECT doc_id, source,
                     len(string_split(coalesce(text,''), ' '))
                       AS n_tokens,
                     md5_number_lower(coalesce(text,'') || 's0') AS h
              FROM documents),
            c AS (
              SELECT doc_id, source, n_tokens,
                     coalesce(sum(n_tokens) OVER (PARTITION BY source
                         ORDER BY h, doc_id
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING), 0) AS before
              FROM t)
            SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens
            FROM c WHERE before < 600 ORDER BY doc_id""",
        "q9_cells": f"""
            WITH {_GEO_CTE}
            SELECT tile, count(*) AS n_pages FROM geo GROUP BY tile""",
        "q87_tile_lang_mix": f"""
            WITH {_GEO_CTE}
            SELECT g.tile, d.lang, count(*) AS n_pages
            FROM geo g JOIN documents d USING (doc_id)
            GROUP BY g.tile, d.lang ORDER BY g.tile, d.lang""",
        "q10_spatial_join": f"""
            WITH {_GEO_CTE}
            SELECT doc_id, {region_case} AS region_id, tile FROM geo""",
        "q11_region_counts": f"""
            WITH {_GEO_CTE},
            assigned AS (SELECT doc_id, {region_case} AS region_id FROM geo)
            SELECT region_id, count(*) AS n_pages,
                   CASE WHEN region_id >= 0
                        THEN 'region_' || lpad(region_id::VARCHAR, 2, '0')
                        ELSE NULL END AS region_name
            FROM assigned GROUP BY region_id""",
        "q12_exact_dedup": """
            SELECT doc_id, md5(text) AS content_md5 FROM documents
            QUALIFY row_number() OVER (PARTITION BY md5(text)
                                       ORDER BY doc_id) = 1""",
        "q13_token_stats": r"""
            SELECT doc_id,
                   len(regexp_extract_all(text, '\S+')) AS tok_count,
                   length(text) AS n_chars2
            FROM documents""",
        "q14_ann_topk": """
            WITH q AS (SELECT vec_id AS query_id,
                              list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
                       FROM embeddings WHERE vec_id < 4),
            scored AS (
              SELECT q.query_id, e.vec_id,
                     round(list_cosine_similarity(
                       list_transform(e.embedding, x -> CAST(x AS DOUBLE)), q.qv), 6) AS cosine
              FROM embeddings e CROSS JOIN q)
            SELECT query_id, vec_id, cosine FROM scored
            QUALIFY row_number() OVER (PARTITION BY query_id
                                       ORDER BY cosine DESC, vec_id) <= 10""",
        "q15_embedding_neardup": """
            WITH e AS (SELECT vec_id,
                              list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                       FROM embeddings)
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round(list_cosine_similarity(a.v, b.v), 6) AS cosine
            FROM e a JOIN e b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.v, b.v) >= 0.35
            ORDER BY id_a, id_b""",
        # q43 ⊆ q15 by construction (exact in-bucket cosine verify ⇒
        # precision 1); 4-plane × 64-table band-OR pushes the per-pair
        # miss probability to ~5e-5 and the seeded run is verified
        # missed=0 vs the exact pair set at the driver's scales, so the
        # exact all-pairs join is the LSH path's value-exact oracle
        "q43_embedding_lsh": """
            WITH e AS (SELECT vec_id,
                              list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                       FROM embeddings)
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round(list_cosine_similarity(a.v, b.v), 6) AS cosine
            FROM e a JOIN e b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.v, b.v) >= 0.35
            ORDER BY id_a, id_b""",
        "q21_region_point_agg": f"""
            WITH {_GEO_CTE},
            assigned AS (SELECT doc_id, n_chars, {region_case} AS region_id FROM geo)
            SELECT region_id, count(*) AS n_points,
                   CAST(sum(n_chars) AS BIGINT) AS sum_chars
            FROM assigned WHERE region_id >= 0 GROUP BY region_id""",
        "q34_text_quality_oracle": r"""
            WITH base AS (
              SELECT doc_id, text,
                     len(regexp_extract_all(text, '\S+')) AS toks,
                     length(text) AS n_chars,
                     len(regexp_extract_all(text, '[^\w\s]')) AS n_punct,
                     len(regexp_extract_all(text,
                       '\b(?:the|and|of|to|in|is|you|that)\b')) AS h_en,
                     len(regexp_extract_all(text,
                       '\b(?:der|die|und|das|ist|nicht|ein|ich)\b')) AS h_de,
                     len(regexp_extract_all(text,
                       '\b(?:le|la|et|les|des|est|une|que)\b')) AS h_fr,
                     len(regexp_extract_all(text,
                       '\b(?:el|la|que|de|los|una|por|con)\b')) AS h_es,
                     len(regexp_extract_all(text,
                       '\b(?:il|la|che|di|non|per|una|sono)\b')) AS h_it
              FROM documents),
            scored AS (
              SELECT doc_id,
                     n_punct / CAST(GREATEST(n_chars, 1) AS DOUBLE) AS punct_ratio,
                     h_en / CAST(GREATEST(toks, 1) AS DOUBLE) AS s_en,
                     h_de / CAST(GREATEST(toks, 1) AS DOUBLE) AS s_de,
                     h_fr / CAST(GREATEST(toks, 1) AS DOUBLE) AS s_fr,
                     h_es / CAST(GREATEST(toks, 1) AS DOUBLE) AS s_es,
                     h_it / CAST(GREATEST(toks, 1) AS DOUBLE) AS s_it,
                     toks
              FROM base),
            lang AS (
              SELECT doc_id, punct_ratio, toks,
                     GREATEST(s_en, s_de, s_fr, s_es, s_it) AS stop_raw,
                     CASE WHEN GREATEST(s_en, s_de, s_fr, s_es, s_it) = 0
                          THEN 'und'
                          WHEN s_en >= s_de AND s_en >= s_fr AND
                               s_en >= s_es AND s_en >= s_it THEN 'en'
                          WHEN s_de >= s_fr AND s_de >= s_es AND
                               s_de >= s_it THEN 'de'
                          WHEN s_fr >= s_es AND s_fr >= s_it THEN 'fr'
                          WHEN s_es >= s_it THEN 'es'
                          ELSE 'it' END AS lang_pred
              FROM scored)
            SELECT doc_id, lang_pred,
                   round(stop_raw, 6) AS stop_ratio,
                   round(0.5 * LEAST(GREATEST(ln(1 + toks) / ln(500), 0), 1)
                       + 0.3 * LEAST(GREATEST(1 - punct_ratio * 4, 0), 1)
                       + 0.2 * LEAST(GREATEST(stop_raw * 5, 0), 1), 6)
                     AS quality
            FROM lang ORDER BY doc_id""",
        "q16_minhash_pairs": rf"""
            -- exact all-pairs shingle Jaccard: recall of the banded
            -- MinHash-LSH path is exactly 1 on this corpus (verified:
            -- every true pair has jaccard >= 0.87, far above the
            -- r=4/b=16 band threshold ~0.5), so LSH output == truth
            WITH toks AS (
              SELECT doc_id, regexp_extract_all(text, '\S+') AS ts
              FROM documents),
            sh AS (SELECT doc_id, list_distinct({_SHINGLE_LIST}) AS s
                   FROM toks),
            ex AS (SELECT doc_id, unnest(s) AS h FROM sh),
            inter AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                     count(*) AS n_inter
              FROM ex a JOIN ex b ON a.h = b.h AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
            sz AS (SELECT doc_id, len(s) AS n FROM sh)
            SELECT id_a, id_b,
                   round(CAST(n_inter AS DOUBLE)
                         / (na.n + nb.n - n_inter), 6) AS jaccard
            FROM inter JOIN sz na ON id_a = na.doc_id
                       JOIN sz nb ON id_b = nb.doc_id
            WHERE CAST(n_inter AS DOUBLE) / (na.n + nb.n - n_inter) >= 0.4
            ORDER BY id_a, id_b""",
        "q17_simhash": r"""
            WITH tl AS (
              SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS tok
              FROM documents),
            bits AS (
              SELECT doc_id, b,
                     sum(CASE WHEN (md5_number_lower(tok) >> b) & 1 = 1
                              THEN 1 ELSE -1 END) AS vote
              FROM tl CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS b)
              GROUP BY doc_id, b),
            sh AS (
              SELECT doc_id,
                     CAST(sum(CASE WHEN vote > 0
                              THEN CAST(CAST(1 AS UBIGINT) << b AS HUGEINT)
                              ELSE 0 END) AS UBIGINT) AS s
              FROM bits GROUP BY doc_id)
            SELECT d.doc_id, CAST(COALESCE(sh.s, 0) AS VARCHAR) AS simhash,
                   CAST(COALESCE(sh.s, 0) >> 48 AS BIGINT) AS simhash_prefix
            FROM documents d LEFT JOIN sh ON d.doc_id = sh.doc_id""",
        "q18_text_quality": rf"""
            WITH base AS (
              SELECT doc_id, text,
                     len(regexp_extract_all(text, '\S+')) AS toks,
                     length(text) AS n_chars,
                     len(regexp_extract_all(text, '[^\w\s]')) AS n_punct,
                     len(regexp_extract_all(text,
                       '\b(?:the|and|of|to|in|is|you|that)\b')) AS h_en,
                     len(regexp_extract_all(text,
                       '\b(?:der|die|und|das|ist|nicht|ein|ich)\b')) AS h_de,
                     len(regexp_extract_all(text,
                       '\b(?:le|la|et|les|des|est|une|que)\b')) AS h_fr,
                     len(regexp_extract_all(text,
                       '\b(?:el|la|que|de|los|una|por|con)\b')) AS h_es,
                     len(regexp_extract_all(text,
                       '\b(?:il|la|che|di|non|per|una|sono)\b')) AS h_it
              FROM documents),
            scored AS (
              SELECT doc_id,
                     n_punct / CAST(GREATEST(n_chars, 1) AS DOUBLE) AS punct_ratio,
                     h_en / CAST(GREATEST(toks, 1) AS DOUBLE) AS s_en,
                     h_de / CAST(GREATEST(toks, 1) AS DOUBLE) AS s_de,
                     h_fr / CAST(GREATEST(toks, 1) AS DOUBLE) AS s_fr,
                     h_es / CAST(GREATEST(toks, 1) AS DOUBLE) AS s_es,
                     h_it / CAST(GREATEST(toks, 1) AS DOUBLE) AS s_it,
                     toks
              FROM base),
            lang AS (
              SELECT doc_id, punct_ratio, toks,
                     GREATEST(s_en, s_de, s_fr, s_es, s_it) AS stop_raw,
                     CASE WHEN GREATEST(s_en, s_de, s_fr, s_es, s_it) = 0
                          THEN 'und'
                          WHEN s_en >= s_de AND s_en >= s_fr AND
                               s_en >= s_es AND s_en >= s_it THEN 'en'
                          WHEN s_de >= s_fr AND s_de >= s_es AND
                               s_de >= s_it THEN 'de'
                          WHEN s_fr >= s_es AND s_fr >= s_it THEN 'fr'
                          WHEN s_es >= s_it THEN 'es'
                          ELSE 'it' END AS lang_pred
              FROM scored),
            fp AS (
              SELECT doc_id, {_shingle_list("ts2")} AS shl
              FROM (SELECT doc_id,
                           regexp_extract_all(text, '\S+') AS ts2
                    FROM documents))
            SELECT l.doc_id, l.lang_pred,
                   round(0.5 * LEAST(GREATEST(ln(1 + toks) / ln(500), 0), 1)
                       + 0.3 * LEAST(GREATEST(1 - punct_ratio * 4, 0), 1)
                       + 0.2 * LEAST(GREATEST(stop_raw * 5, 0), 1), 6)
                     AS quality,
                   CAST(list_min(fp.shl) AS VARCHAR) AS fingerprint
            FROM lang l JOIN fp ON l.doc_id = fp.doc_id""",
        "q19_simplify": _q19_fixture_sql(),
        "q57_s2_cells": _q57_fixture_sql(),
        "q71_bpe_train": _bpe_fixture_sqls()[0],
        "q72_bpe_encode": _bpe_fixture_sqls()[1],
        "q58_cover_join": f"""
            WITH {_GEO_CTE},
            assigned AS (SELECT doc_id, {region_case} AS region_id
                         FROM geo)
            SELECT doc_id, region_id FROM assigned
            WHERE region_id >= 0 ORDER BY doc_id""",
        "q59_host_stats": """
            -- host derived arithmetically (the Ray side PARSES the
            -- synthesized url; see stages/pages._synth_batch)
            SELECT 'site' || CAST(doc_id % 1000 AS VARCHAR)
                   || '.example' AS host,
                   count(*) AS n_pages,
                   CAST(sum(length(text)) AS BIGINT) AS sum_chars
            FROM documents GROUP BY host ORDER BY host""",
        "q60_group_sample": """
            SELECT doc_id, lang FROM documents
            QUALIFY row_number() OVER (
                PARTITION BY lang
                ORDER BY md5_number_lower(text || 's0'), doc_id) <= 20
            ORDER BY doc_id""",
        "q61_bm25": """
            -- same arithmetic shape as stages/text.bm25_topk (integer
            -- corpus stats make avgdl/idf exact across engines)
            WITH words AS (
              SELECT doc_id, string_split(coalesce(text, ''), ' ') AS w
              FROM documents),
            base AS (
              SELECT doc_id, len(w) AS dl,
                     len(list_filter(w, x -> x = 'window')) AS tf0,
                     len(list_filter(w, x -> x = 'stream')) AS tf1,
                     len(list_filter(w, x -> x = 'hash')) AS tf2,
              FROM words),
            g AS (
              SELECT count(*) AS nd,
                     sum(dl) / count(*) AS avgdl,
                     sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS df0,
                     sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1,
                     sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2
              FROM base),
            scored AS (
              SELECT doc_id,
                ln(1 + (nd - df0 + 0.5) / (df0 + 0.5))
                  * ((tf0 * (1.2 + 1))
                     / (tf0 + 1.2 * ((1 - 0.75) + 0.75 * (dl / avgdl))))
                + ln(1 + (nd - df1 + 0.5) / (df1 + 0.5))
                  * ((tf1 * (1.2 + 1))
                     / (tf1 + 1.2 * ((1 - 0.75) + 0.75 * (dl / avgdl))))
                + ln(1 + (nd - df2 + 0.5) / (df2 + 0.5))
                  * ((tf2 * (1.2 + 1))
                     / (tf2 + 1.2 * ((1 - 0.75) + 0.75 * (dl / avgdl))))
                AS score
              FROM base, g)
            SELECT doc_id, round(score, 6) AS bm25 FROM scored
            ORDER BY score DESC, doc_id LIMIT 50""",
        "q62_pagerank": """
            -- five unrolled power iterations over the same synthetic
            -- 3-out-link graph
            WITH nd AS (SELECT count(*) AS n FROM documents),
            nodes AS (SELECT doc_id AS node FROM documents),
            e AS (
              SELECT doc_id AS src, (doc_id * 7 + 1) % nd.n AS dst
              FROM documents, nd
              UNION ALL
              SELECT doc_id, (doc_id * 13 + 5) % nd.n
              FROM documents, nd
              UNION ALL
              SELECT doc_id, (doc_id * 31 + 11) % nd.n
              FROM documents, nd),
            deg AS (SELECT src, count(*) AS c FROM e GROUP BY src),
            ew AS (SELECT e.src, e.dst, 1.0 / deg.c AS w
                   FROM e JOIN deg ON e.src = deg.src),
            r0 AS (SELECT node, 1.0 / nd.n AS r FROM nodes, nd),
            r1 AS (
              SELECT nn.node,
                     (1 - 0.85) / (SELECT n FROM nd)
                     + 0.85 * coalesce(s.x, 0) AS r
              FROM nodes nn
              LEFT JOIN (
                SELECT ew.dst AS node, sum(p.r * ew.w) AS x
                FROM r0 p JOIN ew ON p.node = ew.src
                GROUP BY ew.dst) s ON nn.node = s.node),
            r2 AS (
              SELECT nn.node,
                     (1 - 0.85) / (SELECT n FROM nd)
                     + 0.85 * coalesce(s.x, 0) AS r
              FROM nodes nn
              LEFT JOIN (
                SELECT ew.dst AS node, sum(p.r * ew.w) AS x
                FROM r1 p JOIN ew ON p.node = ew.src
                GROUP BY ew.dst) s ON nn.node = s.node),
            r3 AS (
              SELECT nn.node,
                     (1 - 0.85) / (SELECT n FROM nd)
                     + 0.85 * coalesce(s.x, 0) AS r
              FROM nodes nn
              LEFT JOIN (
                SELECT ew.dst AS node, sum(p.r * ew.w) AS x
                FROM r2 p JOIN ew ON p.node = ew.src
                GROUP BY ew.dst) s ON nn.node = s.node),
            r4 AS (
              SELECT nn.node,
                     (1 - 0.85) / (SELECT n FROM nd)
                     + 0.85 * coalesce(s.x, 0) AS r
              FROM nodes nn
              LEFT JOIN (
                SELECT ew.dst AS node, sum(p.r * ew.w) AS x
                FROM r3 p JOIN ew ON p.node = ew.src
                GROUP BY ew.dst) s ON nn.node = s.node),
            r5 AS (
              SELECT nn.node,
                     (1 - 0.85) / (SELECT n FROM nd)
                     + 0.85 * coalesce(s.x, 0) AS r
              FROM nodes nn
              LEFT JOIN (
                SELECT ew.dst AS node, sum(p.r * ew.w) AS x
                FROM r4 p JOIN ew ON p.node = ew.src
                GROUP BY ew.dst) s ON nn.node = s.node)
            SELECT node AS doc_id, round(r, 9) AS rank
            FROM r5 ORDER BY doc_id""",
        "q20_dissolve": """
            -- independent edge-multiset arithmetic over the same
            -- deterministic 24x24 mesh: an edge used twice inside a
            -- dissolve group cancels (interior); used once -> boundary.
            -- perimeter = boundary-edge count (unit edges), area = cells
            WITH cells AS (
              SELECT i, (i * 2654435761) % 5 AS g,
                     i // 24 AS r, i % 24 AS c
              FROM (SELECT unnest(generate_series(0, 575)) AS i)),
            edges AS (
              SELECT g, 0 AS kind, c AS ex, r AS ey FROM cells
              UNION ALL SELECT g, 0, c, r + 1 FROM cells
              UNION ALL SELECT g, 1, c, r FROM cells
              UNION ALL SELECT g, 1, c + 1, r FROM cells),
            ecnt AS (
              SELECT g, kind, ex, ey, count(*) AS cnt
              FROM edges GROUP BY g, kind, ex, ey)
            SELECT 'g' || CAST(g AS VARCHAR) AS grp,
                   round(CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END)
                              AS DOUBLE), 6) AS perimeter,
                   round(CAST(sum(cnt) / 4 AS DOUBLE), 6) AS area
            FROM ecnt GROUP BY g""",
        "q26_innerlines": """
            -- inner boundary = unit edge between two grid cells whose
            -- dissolve groups differ (independent adjacency arithmetic
            -- over the same deterministic 16x16 mesh)
            WITH cells AS (
              SELECT i, (i * 2654435761) % 5 AS g,
                     i // 16 AS r, i % 16 AS c
              FROM (SELECT unnest(generate_series(0, 255)) AS i)),
            adj AS (
              SELECT a.g AS ga, b.g AS gb
              FROM cells a JOIN cells b
                ON (b.r = a.r AND b.c = a.c + 1)
                OR (b.r = a.r + 1 AND b.c = a.c)
              WHERE a.g <> b.g)
            SELECT 'g' || CAST(LEAST(ga, gb) AS VARCHAR) || '-' ||
                   'g' || CAST(GREATEST(ga, gb) AS VARCHAR) AS pair,
                   count(*) AS n_edges
            FROM adj GROUP BY 1""",
        "q27_split_on_grid": """
            -- 8x8 polygon grid over (-180,-90,180,90), split on a 4x4
            -- grid by bbox center -> every target cell holds exactly the
            -- cells whose centers land in it
            WITH g AS (
              SELECT i // 8 AS r, i % 8 AS c
              FROM (SELECT unnest(generate_series(0, 63)) AS i)),
            a AS (
              SELECT CAST(floor(((-180 + (c + 0.5) * 45.0) + 180) / 90.0)
                          AS INT) AS cc,
                     CAST(floor(((-90 + (r + 0.5) * 22.5) + 90) / 45.0)
                          AS INT) AS rr
              FROM g)
            SELECT 'r' || CAST(rr AS VARCHAR) || 'c' || CAST(cc AS VARCHAR)
                     AS cell,
                   count(*) AS n
            FROM a GROUP BY 1""",
        "q28_image_features": f"""
            WITH {_MEDIA_HEAD},
            b AS (
              SELECT media_id,
                     ('0x' || substring(md5(head), 1, 8))::BIGINT AS base
              FROM media)
            SELECT media_id,
                   CAST(16 + base % 1024 AS INT) AS height,
                   CAST(16 + (base // 1024) % 1024 AS INT) AS width,
                   3 AS channels,
                   round(CAST(CAST((base % 1000003) / 1000003.0 - 0.5
                              AS FLOAT) AS DOUBLE), 6) AS feat0
            FROM b""",
        "q29_video_frames": f"""
            WITH {_MEDIA_HEAD},
            nf AS (
              SELECT media_id, head,
                     1 + ('0x' || substring(md5('v' || head), 1, 8))::BIGINT
                         % 300 AS n_frames
              FROM media),
            fr AS (
              SELECT media_id, head,
                     unnest(generate_series(
                       0, LEAST(3, CAST(ceil(n_frames / 10.0) AS BIGINT)
                                   - 1))) * 10 AS frame_idx
              FROM nf)
            SELECT media_id, CAST(frame_idx AS INT) AS frame_idx,
                   ('0x' || substring(md5(CAST(frame_idx AS VARCHAR)
                                          || head), 1, 8))::BIGINT
                     AS frame_hash
            FROM fr""",
        "q31_dissolve2": """
            -- independent arrangement arithmetic for the overlapping
            -- 8x8 mesh (even columns 1.5 wide): within a row every face
            -- of the mosaic is a vertical strip between consecutive
            -- interval endpoints; each strip is assigned to the LOWEST
            -- feature index covering it (dissolve2 first-shape rule)
            WITH f AS (
              SELECT i, i // 8 AS r, i % 8 AS c,
                     CAST(i % 8 AS DOUBLE) AS x0,
                     i % 8 + CASE WHEN (i % 8) % 2 = 0
                                  THEN 1.5 ELSE 1.0 END AS x1
              FROM (SELECT unnest(generate_series(0, 63)) AS i)),
            fc AS (SELECT *, CAST(floor((x0 + x1) / 2 / 4.0) AS INT)
                             AS cellx FROM f),
            bp AS (
              SELECT DISTINCT r, cellx, x0 AS x FROM fc
              UNION SELECT DISTINCT r, cellx, x1 FROM fc),
            strips AS (
              SELECT r, cellx, x AS lo,
                     lead(x) OVER (PARTITION BY r, cellx ORDER BY x) AS hi
              FROM bp),
            owner AS (
              SELECT s.r, s.lo, s.hi, min(f.i) AS owner_i
              FROM strips s JOIN fc f
                ON f.r = s.r AND f.cellx = s.cellx
               AND f.x0 <= s.lo AND s.hi <= f.x1
              WHERE s.hi IS NOT NULL
              GROUP BY s.r, s.lo, s.hi)
            SELECT 'g' || CAST((owner_i * 2654435761) % 3 AS VARCHAR) AS grp,
                   round(sum(hi - lo), 6) AS area_total,
                   count(*) AS n_tiles
            FROM owner GROUP BY 1""",
        "q35_clip_lines": """
            -- closed-form segment arithmetic: a horizontal line at y=c
            -- meets the diamond |x-2|+|y-2|<=1.5 on [2-t, 2+t] with
            -- t = 1.5-|c-2|; erase keeps the complement (2 runs)
            WITH lines AS (
              SELECT i AS line_id, 0.25 + i * 0.5 AS c
              FROM (SELECT unnest(generate_series(0, 7)) AS i)),
            t AS (SELECT line_id, 1.5 - ABS(c - 2) AS t FROM lines),
            m AS (SELECT line_id,
                         CASE WHEN t > 0
                              THEN LEAST(2 + t, 5.0) - GREATEST(2 - t, -1.0)
                              ELSE 0 END AS ilen
                  FROM t)
            SELECT line_id, 'clip' AS mode, 1 AS n_parts,
                   round(ilen, 6) AS length
            FROM m WHERE ilen > 0
            UNION ALL
            SELECT line_id, 'erase',
                   CASE WHEN ilen > 0 THEN 2 ELSE 1 END,
                   round(6.0 - ilen, 6)
            FROM m""",
        "q33_clip_layer": """
            -- exact trapezoid integration of each unit cell's
            -- intersection with the diamond |x-2|+|y-2| <= 1.5: the
            -- y-width at x is piecewise linear, so integrating between
            -- ALL candidate kink breakpoints is exact (and every
            -- breakpoint/area here is a dyadic rational -> float-exact)
            WITH cells AS (
              SELECT i AS feature_id, i // 4 AS r, i % 4 AS c
              FROM (SELECT unnest(generate_series(0, 15)) AS i)),
            bp AS (
              SELECT feature_id, r, c,
                list_sort(list_distinct(list_filter(
                  [CAST(c AS DOUBLE), c + 1.0, 2.0, 0.5, 3.5,
                   2 - (2.5 - r), 2 + (2.5 - r),
                   2 - (r - 0.5), 2 + (r - 0.5),
                   2 - (2.5 - (r + 1)), 2 + (2.5 - (r + 1)),
                   2 - ((r + 1) - 0.5), 2 + ((r + 1) - 0.5)],
                  v -> v >= c AND v <= c + 1))) AS xs
              FROM cells),
            ar AS (
              SELECT feature_id, r, c,
                list_sum(list_transform(generate_series(1, len(xs) - 1),
                  i ->
                  ((GREATEST(0, LEAST(2 + (1.5 - ABS(xs[i] - 2)), r + 1.0)
                     - GREATEST(2 - (1.5 - ABS(xs[i] - 2)),
                                CAST(r AS DOUBLE)))
                  + GREATEST(0, LEAST(2 + (1.5 - ABS(xs[i+1] - 2)), r + 1.0)
                     - GREATEST(2 - (1.5 - ABS(xs[i+1] - 2)),
                                CAST(r AS DOUBLE))))
                  / 2) * (xs[i+1] - xs[i]))) AS area
              FROM bp)
            SELECT feature_id, r AS row, c AS col, round(area, 6) AS area
            FROM ar WHERE area > 0""",
        "q32_dissolve_layer": """
            -- groups are whole columns of the 6x6 unit grid (the group
            -- key depends on col only), so v = 6 rows per col and
            -- area = 6 unit cells per col
            WITH cols AS (SELECT unnest(generate_series(0, 5)) AS c)
            SELECT 'g' || CAST((c * 2654435761) % 4 AS VARCHAR) AS grp,
                   CAST(sum(6) AS BIGINT) AS v,
                   round(sum(6.0), 6) AS area
            FROM cols GROUP BY 1""",
        "q44_dissolve_auto": """
            -- default-path (auto-distributed) dissolve of the 80x80
            -- unit grid grouped by whole columns: 80 cells and 80.0
            -- area per column, summed over the columns of each group
            WITH cols AS (SELECT unnest(generate_series(0, 79)) AS c)
            SELECT 'g' || CAST((c * 2654435761) % 7 AS VARCHAR) AS grp,
                   CAST(sum(80) AS BIGINT) AS v,
                   round(sum(80.0), 6) AS area
            FROM cols GROUP BY 1 ORDER BY grp""",
        "q30_nearest_within": f"""
            WITH {_GEO_CTE},
            pts AS (SELECT doc_id, lon, lat FROM geo),
            probes AS (SELECT * FROM pts WHERE doc_id < 200),
            best AS (
              SELECT q.doc_id, p.doc_id AS neighbor_id,
                     sqrt((p.lon - q.lon) * (p.lon - q.lon) +
                          (p.lat - q.lat) * (p.lat - q.lat)) AS d
              FROM probes q JOIN pts p ON p.doc_id <> q.doc_id
              QUALIFY row_number() OVER (PARTITION BY q.doc_id
                ORDER BY (p.lon - q.lon) * (p.lon - q.lon) +
                         (p.lat - q.lat) * (p.lat - q.lat), p.doc_id) = 1)
            SELECT q.doc_id,
                   CASE WHEN b.d <= 2.0 THEN b.neighbor_id ELSE -1 END
                     AS neighbor_id,
                   CASE WHEN b.d <= 2.0 THEN round(b.d, 6) END AS dist
            FROM probes q LEFT JOIN best b ON q.doc_id = b.doc_id
            ORDER BY q.doc_id""",
        "q23_clip_points": f"""
            WITH {_GEO_CTE}
            SELECT doc_id FROM geo WHERE {region_case} >= 0""",
        "q24_erase_points": f"""
            WITH {_GEO_CTE}
            SELECT doc_id FROM geo WHERE {region_case} < 0""",
        "q25_webmercator": f"""
            WITH {_GEO_CTE}
            SELECT doc_id,
                   round(6378137.0 * radians(lon), 4) AS x,
                   round(6378137.0 * ln(tan(pi() / 4 +
                         radians(LEAST(GREATEST(lat, -85.051128779806604),
                                       85.051128779806604)) / 2)), 4) AS y
            FROM geo""",
        "q40_simhash_pairs": r"""
            -- exact all-pairs Hamming over SQL-recomputed simhashes:
            -- the engine's 4-band pigeonhole candidates have recall 1
            -- for hamming <= 3, so banded output == ground truth
            WITH tl AS (
              SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS tok
              FROM documents),
            bits AS (
              SELECT doc_id, b,
                     sum(CASE WHEN (md5_number_lower(tok) >> b) & 1 = 1
                              THEN 1 ELSE -1 END) AS vote
              FROM tl CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS b)
              GROUP BY doc_id, b),
            sh AS (
              SELECT doc_id,
                     CAST(sum(CASE WHEN vote > 0
                              THEN CAST(CAST(1 AS UBIGINT) << b AS HUGEINT)
                              ELSE 0 END) AS UBIGINT) AS s
              FROM bits GROUP BY doc_id),
            full_sh AS (
              SELECT d.doc_id, COALESCE(sh.s, 0) AS s
              FROM documents d LEFT JOIN sh ON d.doc_id = sh.doc_id)
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   CAST(bit_count(xor(a.s, b.s)) AS BIGINT) AS hamming
            FROM full_sh a JOIN full_sh b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.s, b.s)) <= 3
            ORDER BY id_a, id_b""",
        "q38_audio_features": f"""
            WITH {_MEDIA_HEAD},
            b AS (
              SELECT m.media_id,
                     16 * (4 + length(d.text) % 64) AS payload_len,
                     ('0x' || substring(md5('a' || m.head), 1, 8))::BIGINT
                       AS base
              FROM media m JOIN documents d ON m.media_id = d.doc_id)
            SELECT media_id,
                   CAST(payload_len * 4 AS BIGINT) AS n_samples,
                   round(payload_len * 4 / 16000.0, 6) AS duration_s,
                   round(CAST(CAST((base % 1000003) / 1000003.0 - 0.5
                              AS FLOAT) AS DOUBLE), 6) AS feat0
            FROM b""",
        "q46_sample": """
            -- hash-membership sample: md5_number_lower('7:' || id)
            -- under 0.2 of the uint64 key space (exact engine mirror)
            SELECT doc_id FROM documents
            WHERE md5_number_lower('7:' || CAST(doc_id AS VARCHAR))
                  < CAST(3689348814741910528 AS UBIGINT)
            ORDER BY doc_id""",
        "q47_ngram_jaccard": rf"""
            -- exact all-pairs 3-token-shingle Jaccard >= 0.6: the Ray
            -- side (prefix-filtered all-pairs, PPJoin property) is
            -- deterministic and complete, so this all-pairs join IS
            -- the identical computation, not a recall bound
            WITH toks AS (
              SELECT doc_id, regexp_extract_all(text, '\S+') AS ts
              FROM documents),
            sh AS (SELECT doc_id,
                          list_distinct({_shingle_list("ts", 3)}) AS s
                   FROM toks),
            ex AS (SELECT doc_id, unnest(s) AS h FROM sh),
            inter AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                     count(*) AS n_inter
              FROM ex a JOIN ex b ON a.h = b.h AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
            sz AS (SELECT doc_id, len(s) AS n FROM sh)
            SELECT id_a, id_b,
                   round(CAST(n_inter AS DOUBLE)
                         / (na.n + nb.n - n_inter), 6) AS jaccard
            FROM inter JOIN sz na ON id_a = na.doc_id
                       JOIN sz nb ON id_b = nb.doc_id
            WHERE CAST(n_inter AS DOUBLE)
                  / (na.n + nb.n - n_inter) >= 0.6
            ORDER BY id_a, id_b""",
        "q48_dedup_clusters": rf"""
            -- connected components over the exact near-dup pair set
            -- (recursive-CTE transitive closure; min reachable id is
            -- the canonical representative)
            WITH RECURSIVE {_CLUSTER_CTES}
            SELECT node AS doc_id, cluster_id
            FROM labels ORDER BY doc_id""",
        "q85_soft_dedup_weights": rf"""
            -- SoftDeDup-style duplicate down-weighting: weight =
            -- 1 / near-dup-cluster size (1.0 for singletons)
            WITH RECURSIVE {_CLUSTER_CTES},
            csize AS (SELECT cluster_id, count(*) AS sz
                      FROM labels GROUP BY cluster_id)
            SELECT d.doc_id,
                   round(coalesce(1.0 / cs.sz, 1.0), 6) AS dup_weight
            FROM documents d
            LEFT JOIN labels l ON d.doc_id = l.node
            LEFT JOIN csize cs ON l.cluster_id = cs.cluster_id
            ORDER BY d.doc_id""",
        "q49_dedup_near": rf"""
            -- fuzzy-dedup survivors: every doc except non-canonical
            -- near-dup cluster members
            WITH RECURSIVE {_CLUSTER_CTES}
            SELECT doc_id FROM documents
            WHERE doc_id NOT IN
                  (SELECT node FROM labels WHERE node != cluster_id)
            ORDER BY doc_id""",
        "q50_dup_window_stats": rf"""
            -- exact duplicated-window share per doc: a window hash is
            -- "duplicated" when it appears in more than one document
            WITH toks AS (
              SELECT doc_id, regexp_extract_all(text, '\S+') AS ts
              FROM documents),
            sh AS (SELECT doc_id, list_distinct({_SHINGLE_LIST}) AS s
                   FROM toks),
            ex AS (SELECT doc_id, unnest(s) AS h FROM sh),
            cnt AS (SELECT h, count(*) AS nd FROM ex GROUP BY h),
            perdoc AS (
              SELECT e.doc_id,
                     CAST(count(*) AS BIGINT) AS n_windows,
                     CAST(sum(CASE WHEN c.nd > 1 THEN 1 ELSE 0 END)
                          AS BIGINT) AS n_dup_windows
              FROM ex e JOIN cnt c ON e.h = c.h GROUP BY e.doc_id)
            SELECT doc_id, n_windows, n_dup_windows,
                   round(CAST(n_dup_windows AS DOUBLE) / n_windows,
                         6) AS dup_share
            FROM perdoc ORDER BY doc_id""",
        "q51_token_df": r"""
            -- top-100 tokens by document frequency, ties by token text
            WITH ex AS (
              SELECT DISTINCT doc_id,
                     unnest(regexp_extract_all(text, '\S+')) AS token
              FROM documents),
            cnt AS (SELECT token, CAST(count(*) AS BIGINT) AS df
                    FROM ex GROUP BY token)
            SELECT token, df FROM cnt
            ORDER BY df DESC, token LIMIT 100""",
        "q52_sessions": r"""
            -- 4h-gap sessionization via window functions
            WITH flag AS (
              SELECT user_id, ts,
                     CASE WHEN lag(ts) OVER w IS NULL
                            OR ts - lag(ts) OVER w > INTERVAL 4 HOUR
                          THEN 1 ELSE 0 END AS new_s
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
            sess AS (
              SELECT user_id, ts,
                     sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS sid
              FROM flag)
            SELECT user_id, CAST(sid AS BIGINT) AS session_seq,
                   CAST(count(*) AS BIGINT) AS n_events,
                   min(ts) AS t_start, max(ts) AS t_end
            FROM sess GROUP BY user_id, sid
            ORDER BY user_id, session_seq""",
        "q55_group_quantiles": r"""
            -- quantile_cont = linear interpolation, the same
            -- definition pandas' default quantile uses
            SELECT l_returnflag,
                   round(quantile_cont(l_quantity, 0.25), 6) AS q25,
                   round(quantile_cont(l_quantity, 0.50), 6) AS q50,
                   round(quantile_cont(l_quantity, 0.75), 6) AS q75
            FROM lineitem GROUP BY l_returnflag
            ORDER BY l_returnflag""",
        "q56_repetition": r"""
            -- Gopher-style repetition signals; single-space split
            -- matches the engine's tokenizer exactly
            WITH words AS (
              SELECT doc_id, string_split(coalesce(text, ''), ' ') AS w
              FROM documents),
            ws AS (
              SELECT doc_id, count(*) AS n_words,
                     count(DISTINCT word) AS n_distinct
              FROM (SELECT doc_id, unnest(w) AS word FROM words)
              GROUP BY doc_id),
            bi AS (
              SELECT doc_id,
                     unnest(list_transform(
                       generate_series(1, len(w) - 1),
                       i -> w[i] || ' ' || w[i + 1])) AS bg
              FROM words WHERE len(w) >= 2),
            bc AS (SELECT doc_id, bg, count(*) AS n
                   FROM bi GROUP BY doc_id, bg),
            bs AS (SELECT doc_id, max(n) AS mx, sum(n) AS tot,
                          sum(CASE WHEN n > 1 THEN n ELSE 0 END) AS dup
                   FROM bc GROUP BY doc_id)
            SELECT w.doc_id, CAST(w.n_words AS BIGINT) AS n_words,
                   round(CASE WHEN w.n_words = 0 THEN 1.0
                         ELSE w.n_distinct / CAST(w.n_words AS DOUBLE)
                         END, 6) AS distinct_word_ratio,
                   round(coalesce(b.mx / CAST(b.tot AS DOUBLE), 0),
                         6) AS top_bigram_share,
                   round(coalesce(b.dup / CAST(b.tot AS DOUBLE), 0),
                         6) AS dup_bigram_share
            FROM ws w LEFT JOIN bs b ON w.doc_id = b.doc_id
            ORDER BY w.doc_id""",
        "q54_range_join": r"""
            -- BETWEEN join of events onto their 4h-gap sessions
            WITH flag AS (
              SELECT user_id, ts,
                     CASE WHEN lag(ts) OVER w IS NULL
                            OR ts - lag(ts) OVER w > INTERVAL 4 HOUR
                          THEN 1 ELSE 0 END AS new_s
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
            sess0 AS (
              SELECT user_id, ts,
                     sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS sid
              FROM flag),
            sess AS (
              SELECT user_id, sid, min(ts) AS t_start, max(ts) AS t_end
              FROM sess0 GROUP BY user_id, sid)
            SELECT e.event_id, e.user_id, e.ts,
                   CAST(s.sid AS BIGINT) AS session_seq
            FROM events e JOIN sess s
              ON e.user_id = s.user_id
             AND e.ts BETWEEN s.t_start AND s.t_end
            ORDER BY e.event_id""",
        "q53_asof_join": r"""
            -- native ASOF JOIN: latest click at-or-before each
            -- purchase, same user (inner)
            WITH p AS (SELECT event_id, ts, user_id FROM events
                       WHERE event_type = 'purchase'),
            c AS (SELECT event_id, ts, user_id FROM events
                  WHERE event_type = 'click')
            SELECT p.event_id, p.ts, p.user_id,
                   c.event_id AS event_id_click
            FROM p ASOF JOIN c
              ON p.user_id = c.user_id AND p.ts >= c.ts
            ORDER BY p.event_id""",
        "q165_geocent": f"""
            -- PROJ geocent.c: N = a/sqrt(1 - e^2 sin^2 phi);
            -- x = N cos(phi) cos(lam); y = N cos(phi) sin(lam);
            -- z = N (1 - e^2) sin(phi)   (h = 0, WGS84)
            WITH {_GEO_CTE},
            e AS (SELECT (1/298.257223563)*(2 - 1/298.257223563)
                    AS e2),
            p AS (SELECT doc_id, radians(lon) AS lam,
                         radians(lat) AS phi FROM geo),
            t AS (SELECT doc_id, lam, phi,
                         6378137.0 /
                         sqrt(1 - e.e2*sin(phi)*sin(phi)) AS N,
                         e.e2 AS e2
                  FROM p, e)
            SELECT doc_id,
                   round(N * cos(phi) * cos(lam), 2) AS x,
                   round(N * cos(phi) * sin(lam), 2) AS y,
                   round(N * (1 - e2) * sin(phi), 2) AS z
            FROM t ORDER BY doc_id""",
        "q45_stere": f"""
            -- PJ_stere.c polar branch closed-form: akm1 = cos(lat_ts)
            -- / tsfn(lat_ts) / sqrt(1 - es sin^2(lat_ts)); x = R akm1
            -- ts(phi) sin(lam), y = -R akm1 ts(phi) cos(lam)
            WITH {_GEO_CTE},
            e AS (SELECT sqrt((1/298.257223563)*(2 - 1/298.257223563))
                    AS ecc),
            k AS (SELECT ecc,
              (cos(radians(70.0)) /
                (tan(pi()/4 - radians(70.0)/2) /
                 pow((1 - ecc*sin(radians(70.0))) /
                     (1 + ecc*sin(radians(70.0))), ecc/2))) /
              sqrt(1 - ecc*ecc*sin(radians(70.0))*sin(radians(70.0)))
                AS akm1 FROM e),
            p AS (SELECT doc_id, radians(lon) AS lam,
                         radians(lat) AS phi FROM geo),
            t AS (SELECT doc_id, lam,
                         tan(pi()/4 - phi/2) /
                         pow((1 - k.ecc*sin(phi)) /
                             (1 + k.ecc*sin(phi)), k.ecc/2) AS ts,
                         k.akm1 AS akm1
                  FROM p, k)
            SELECT doc_id,
                   round(6378137.0 * akm1 * ts * sin(lam), 2) AS x,
                   round(-6378137.0 * akm1 * ts * cos(lam), 2) AS y
            FROM t ORDER BY doc_id""",
        "q36_lcc": f"""
            WITH {_GEO_CTE},
            e AS (SELECT sqrt((1/298.257223563)*(2 - 1/298.257223563))
                    AS ecc),
            k AS (SELECT ecc,
              -- msfn/tsfn at the two standard parallels (WGS84)
              cos(radians(33.0)) /
                sqrt(1 - ecc*ecc*sin(radians(33.0))*sin(radians(33.0)))
                AS m1,
              cos(radians(45.0)) /
                sqrt(1 - ecc*ecc*sin(radians(45.0))*sin(radians(45.0)))
                AS m2,
              tan(pi()/4 - radians(33.0)/2) /
                pow((1 - ecc*sin(radians(33.0))) /
                    (1 + ecc*sin(radians(33.0))), ecc/2) AS ts1,
              tan(pi()/4 - radians(45.0)/2) /
                pow((1 - ecc*sin(radians(45.0))) /
                    (1 + ecc*sin(radians(45.0))), ecc/2) AS ts2,
              tan(pi()/4 - radians(23.0)/2) /
                pow((1 - ecc*sin(radians(23.0))) /
                    (1 + ecc*sin(radians(23.0))), ecc/2) AS ts0
              FROM e),
            kn AS (SELECT ecc, ln(m1/m2)/ln(ts1/ts2) AS n, ts0, m1, ts1
                   FROM k),
            kc AS (SELECT ecc, n, m1*pow(ts1, -n)/n AS c,
                          m1*pow(ts1, -n)/n * pow(ts0, n) AS rho0
                   FROM kn),
            p AS (SELECT doc_id, lon,
                         LEAST(GREATEST(lat, -89.999999), 89.999999)
                           AS lat FROM geo),
            t AS (SELECT doc_id, lon, lat, ecc, n, c, rho0,
                         c * pow(tan(pi()/4 - radians(lat)/2) /
                                 pow((1 - ecc*sin(radians(lat))) /
                                     (1 + ecc*sin(radians(lat))),
                                     ecc/2), n) AS rho
                  FROM p, kc)
            SELECT doc_id,
              round(6378137.0 * rho *
                    sin(n*(radians(lon) - radians(-96.0))), 2) AS x,
              round(6378137.0 * (rho0 - rho *
                    cos(n*(radians(lon) - radians(-96.0)))), 2) AS y
            FROM t""",
        "q88_natearth2": f"""
            -- pj_natearth2 closed form: x = R lam (A0 + A1 p2 +
            -- p6^2 (A2 + A3 p2 + A4 p4 + A5 p6)); y = R phi (B0 +
            -- p4^2 (B1 + B2 p2 + B3 p4))
            WITH {_GEO_CTE},
            p AS (SELECT doc_id, radians(lon) AS lam,
                         radians(lat) AS phi FROM geo),
            q AS (SELECT doc_id, lam, phi, phi*phi AS p2,
                         phi*phi*phi*phi AS p4,
                         phi*phi*phi*phi*phi*phi AS p6 FROM p)
            SELECT doc_id,
              round(6378137.0 * lam * (0.84719 - 0.13063*p2 +
                p6*p6*(-0.04515 + 0.05494*p2 - 0.02326*p4 +
                       0.00331*p6)), 4) AS x,
              round(6378137.0 * phi * (1.01183 +
                p4*p4*(-0.02625 + 0.01926*p2 - 0.00396*p4)), 4) AS y
            FROM q ORDER BY doc_id""",
        "q89_tissot": f"""
            -- pj_sconic TISSOT: n = sin(sig), cs = cos(del),
            -- rho_c = n/cs + cs/n, rho_0 = sqrt((rho_c - 2 sin(phi0))
            -- / n), rho = rho_c - phi; x = R rho sin(n lam),
            -- y = R (rho_0 - rho cos(n lam))  [lat_1=20 lat_2=60,
            -- phi0 = 0]
            WITH {_GEO_CTE},
            k AS (SELECT sin(radians(40.0)) AS n,
                         cos(radians(20.0)) AS cs),
            k2 AS (SELECT n, cs, n/cs + cs/n AS rho_c FROM k),
            k3 AS (SELECT n, rho_c, sqrt(rho_c / n) AS rho_0 FROM k2),
            p AS (SELECT doc_id, radians(lon) AS lam,
                         radians(lat) AS phi FROM geo),
            t AS (SELECT doc_id, k3.rho_c - phi AS rho, lam * k3.n
                    AS lamn, k3.rho_0 AS rho_0 FROM p, k3)
            SELECT doc_id,
                   round(6378137.0 * rho * sin(lamn), 4) AS x,
                   round(6378137.0 * (rho_0 - rho * cos(lamn)), 4)
                     AS y
            FROM t ORDER BY doc_id""",
        "q90_js_each": """
            SELECT doc_id, upper(lang) AS lang_up,
                   CASE WHEN n_chars > 300 THEN 'long' ELSE 'short'
                        END AS cls,
                   substr(lang, 1, 1) || CAST(doc_id AS VARCHAR)
                     AS mark,
                   (source = 'web' OR source = 'news') AS is_web
            FROM documents ORDER BY doc_id""",
        "q91_hll_distinct": _hll_fixture_sqls()[0],
        "q92_hll_by_group": _hll_fixture_sqls()[1],
        "q93_heavy_hitters": """
            SELECT CAST(user_id AS VARCHAR) AS user_id,
                   COUNT(*)::BIGINT AS freq
            FROM events GROUP BY 1
            ORDER BY freq DESC, user_id ASC LIMIT 20""",
        "q94_reservoir_sample": """
            SELECT (row_number() OVER (
                      ORDER BY md5_number_lower(
                        '7:' || CAST(event_id AS VARCHAR)), event_id)
                    - 1)::BIGINT AS sample_rank,
                   event_id, user_id, event_type
            FROM events
            ORDER BY md5_number_lower(
              '7:' || CAST(event_id AS VARCHAR)), event_id
            LIMIT 50""",
        "q37_robinson": f"""
            WITH {_GEO_CTE},
            rob(idx, x0, x1, x2, x3, y0, y1, y2, y3) AS (VALUES
{_ROBIN_ROWS_SQL}),
            p AS (SELECT doc_id, lon, lat,
                         LEAST(CAST(floor(radians(abs(lat)) *
                             11.45915590261646417544) AS INT), 17) AS idx,
                         degrees(radians(abs(lat)) -
                             0.08726646259971647884 *
                             LEAST(CAST(floor(radians(abs(lat)) *
                                 11.45915590261646417544) AS INT), 17))
                           AS dphi
                  FROM geo)
            SELECT doc_id,
              round(6378137.0 * 0.8487 *
                    (x0 + dphi*(x1 + dphi*(x2 + dphi*x3))) *
                    radians(lon), 2) AS x,
              round(6378137.0 * 1.3523 *
                    (CASE WHEN lat < 0 THEN
                       -(y0 + dphi*(y1 + dphi*(y2 + dphi*y3)))
                     ELSE (y0 + dphi*(y1 + dphi*(y2 + dphi*y3))) END),
                    2) AS y
            FROM p JOIN rob ON rob.idx = p.idx""",
        "q22_knn": f"""
            WITH {_GEO_CTE},
            pts AS (SELECT doc_id, lon, lat FROM geo WHERE doc_id < 2000),
            q AS (SELECT * FROM pts ORDER BY doc_id LIMIT 50)
            SELECT q.doc_id, p.doc_id AS neighbor_id,
                   round((p.lon - q.lon) * (p.lon - q.lon) +
                         (p.lat - q.lat) * (p.lat - q.lat), 9) AS dist2
            FROM q JOIN pts p ON p.doc_id <> q.doc_id
            QUALIFY row_number() OVER (PARTITION BY q.doc_id
              ORDER BY (p.lon - q.lon) * (p.lon - q.lon) +
                       (p.lat - q.lat) * (p.lat - q.lat), p.doc_id) = 1""",
    }
    # IVF with exhaustive probing must equal the brute top-k
    out["q39_ann_ivf"] = out["q14_ann_topk"]

    out["q63_kmeans"] = _kmeans_sql(k=8, iters=3, scale=1024)
    out["q65_semantic_dedup"] = _semantic_dedup_sql(
        k=8, iters=3, scale=1024, threshold=0.35)

    out["q66_redact_pii"] = r"""
        -- same deterministic injection, then RE2 global replace
        -- (patterns chosen inside the re/RE2-identical subset)
        WITH injected AS (
          SELECT doc_id,
                 text || ' contact user' || doc_id || '@mail'
                      || (doc_id % 7) || '.example.org or call '
                      || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
                      || '-555-'
                      || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                   AS text
          FROM documents)
        SELECT doc_id,
               regexp_replace(regexp_replace(text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                 '<EMAIL>', 'g'),
                 '[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS text
        FROM injected ORDER BY doc_id"""

    out["q67_pack_sequences"] = """
        -- same integer arithmetic as stages/text.pack_sequences:
        -- exclusive window cumsum = the distributed prefix scan
        WITH dl AS (
          SELECT doc_id, len(string_split(coalesce(text, ''), ' ')) AS n
          FROM documents),
        o AS (
          SELECT doc_id, n,
                 coalesce(sum(n) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING), 0) AS off
          FROM dl)
        SELECT ex.ex AS example_id, doc_id,
               CAST(greatest(off, ex.ex * 512) - off AS BIGINT)
                 AS tok_start,
               CAST(least(off + n, (ex.ex + 1) * 512)
                 - greatest(off, ex.ex * 512) AS BIGINT) AS n_toks
        FROM o, unnest(generate_series(CAST(off // 512 AS BIGINT),
                 CAST((off + n - 1) // 512 AS BIGINT))) AS ex(ex)
        ORDER BY example_id, doc_id"""

    out["q68_exact_substring_dedup"] = r"""
        -- ExactSubstr dedup (Lee et al. 2022): duplicated 5-token
        -- windows keep the min-(doc,pos) occurrence; covered tokens
        -- elsewhere are removed.  Same \S+ tokenizer + md5 window
        -- hash + int packing as ops/dedup.exact_substring_dedup
        WITH toks AS (
          SELECT doc_id,
                 regexp_extract_all(coalesce(text, ''), '\S+') AS ts
          FROM documents),
        win AS (
          SELECT doc_id, w.pos AS pos, w.h AS h
          FROM toks, unnest(list_transform(
                generate_series(1, len(ts) - 4),
                i -> {'pos': i, 'h': md5_number_lower(
                       array_to_string(ts[i:i+4], chr(31)))})) AS u(w)
          WHERE len(ts) >= 5),
        dup AS (
          SELECT h, min(doc_id * 16777216 + pos - 1) AS canon
          FROM win GROUP BY h HAVING count(*) > 1),
        cov AS (
          SELECT DISTINCT w.doc_id, u.cp AS cp
          FROM win w JOIN dup d ON w.h = d.h,
               unnest(generate_series(w.pos, w.pos + 4)) AS u(cp)
          WHERE w.doc_id * 16777216 + w.pos - 1 <> d.canon),
        tok_rows AS (
          SELECT doc_id, u.r['i'] AS i, u.r['tok'] AS tok
          FROM toks, unnest(list_transform(
                generate_series(1, len(ts)),
                i -> {'i': i, 'tok': ts[i]})) AS u(r)),
        kept AS (
          SELECT tr.doc_id, tr.i, tr.tok
          FROM tok_rows tr LEFT JOIN cov c
            ON tr.doc_id = c.doc_id AND tr.i = c.cp
          WHERE c.doc_id IS NULL)
        SELECT d.doc_id,
               coalesce(string_agg(k.tok, ' ' ORDER BY k.i), '') AS text
        FROM documents d LEFT JOIN kept k ON d.doc_id = k.doc_id
        GROUP BY d.doc_id ORDER BY d.doc_id"""

    out["q70_ann_pq"] = """
        -- exact top-k oracle for the PQ+re-rank path (q43 pattern:
        -- the validated shortlist recovers the exact result set)
        WITH q AS (SELECT vec_id AS query_id,
                      list_transform(embedding,
                                     x -> CAST(x AS DOUBLE)) AS qv
                   FROM embeddings WHERE vec_id >= 4 AND vec_id < 8),
        scored AS (
          SELECT q.query_id, e.vec_id,
                 round(list_cosine_similarity(
                   list_transform(e.embedding,
                                  x -> CAST(x AS DOUBLE)), q.qv),
                       6) AS cosine
          FROM embeddings e CROSS JOIN q)
        SELECT query_id, vec_id, cosine FROM scored
        QUALIFY row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, vec_id) <= 10
        ORDER BY query_id, cosine DESC, vec_id"""

    out["q69_dsir_weights"] = """
        -- DSIR hashed-bigram importance weights; same quantized-log
        -- integer arithmetic as stages/text.dsir_weights (q64 trick)
        WITH toks AS (SELECT doc_id, lang,
               string_split(coalesce(text,''), ' ') AS ts
               FROM documents),
        bg AS (SELECT doc_id, lang,
                CAST(md5_number_lower(ts[u.i] || chr(31) || ts[u.i+1])
                     % 1024 AS BIGINT) AS b
               FROM toks, unnest(generate_series(1, len(ts)-1)) AS u(i)
               WHERE len(ts) >= 2),
        buckets AS (SELECT unnest(generate_series(0, 1023)) AS b),
        cc AS (SELECT b, count(*) AS c FROM bg GROUP BY b),
        ct AS (SELECT b, count(*) AS c FROM bg WHERE lang='en'
               GROUP BY b),
        tot AS (SELECT (SELECT count(*) FROM bg) AS nc,
                       (SELECT count(*) FROM bg WHERE lang='en') AS nt),
        q AS (SELECT buckets.b,
                CAST(floor(ln(CAST(coalesce(ct.c,0)+1 AS DOUBLE))
                           *1000000000) AS BIGINT)
              - CAST(floor(ln(CAST(coalesce(cc.c,0)+1 AS DOUBLE))
                           *1000000000) AS BIGINT) AS qd
              FROM buckets LEFT JOIN cc ON buckets.b=cc.b
                           LEFT JOIN ct ON buckets.b=ct.b),
        z AS (SELECT CAST(floor(ln(CAST(nt+1024 AS DOUBLE))
                                *1000000000) AS BIGINT)
                   - CAST(floor(ln(CAST(nc+1024 AS DOUBLE))
                                *1000000000) AS BIGINT) AS zd
              FROM tot),
        per AS (SELECT bg.doc_id, sum(q.qd) AS s, count(*) AS n
                FROM bg JOIN q ON bg.b = q.b GROUP BY bg.doc_id)
        SELECT d.doc_id,
               round(coalesce((per.s - per.n * z.zd)
                     / (1000000000.0 * per.n), 0.0), 6) AS dsir_logw
        FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id, z
        ORDER BY d.doc_id"""

    out["q75_quality_filter"] = """
        -- q64's quantized-log lm_nll + per-source quantile_cont(0.75)
        -- + threshold filter (same arithmetic as the composed
        -- lm_nll -> groupby_quantiles -> broadcast-filter pipeline)
        WITH tok AS (
          SELECT doc_id, unnest(string_split(coalesce(text, ''), ' ')) AS t
          FROM documents),
        cnt AS (SELECT t, count(*) AS c FROM tok GROUP BY t),
        g AS (SELECT sum(c) AS total, count(*) AS v FROM cnt),
        qz AS (SELECT CAST(floor(ln(CAST(total + v AS DOUBLE))
                                 * 1000000000) AS BIGINT) AS z FROM g),
        ql AS (SELECT t, CAST(floor(ln(CAST(c + 1 AS DOUBLE))
                                    * 1000000000) AS BIGINT) AS q
               FROM cnt),
        dl AS (SELECT doc_id, count(*) AS n, sum(q) AS s
               FROM tok JOIN ql USING (t) GROUP BY doc_id),
        nll AS (SELECT doc_id,
                       round((n * (SELECT z FROM qz) - s)
                             / (1000000000.0 * n), 6) AS lm_nll
                FROM dl),
        j AS (SELECT d.doc_id, d.source, nll.lm_nll
              FROM documents d JOIN nll ON d.doc_id = nll.doc_id),
        thr AS (SELECT source, quantile_cont(lm_nll, 0.75) AS q75
                FROM j GROUP BY source)
        SELECT j.doc_id, j.source, j.lm_nll
        FROM j JOIN thr USING (source)
        WHERE j.lm_nll <= thr.q75 ORDER BY j.doc_id"""

    out["q79_incremental_dedup"] = """
        -- anti join: new docs (id >= 250; every third reuses an old
        -- doc's text) whose md5 is absent from the corpus (id < 250)
        WITH old AS (SELECT doc_id, text FROM documents
                     WHERE doc_id < 250),
        new AS (
          SELECT n.doc_id,
                 CASE WHEN n.doc_id % 3 = 0 THEN o.text
                      ELSE n.text END AS text
          FROM documents n JOIN old o ON o.doc_id = n.doc_id % 250
          WHERE n.doc_id >= 250)
        SELECT new.doc_id, md5(new.text) AS content_md5 FROM new
        WHERE NOT EXISTS (
          SELECT 1 FROM old WHERE md5(old.text) = md5(new.text))
        ORDER BY new.doc_id"""

    # the bloom-gated path must equal the plain anti join exactly
    out["q95_bloom_incremental"] = out["q79_incremental_dedup"]

    out["q97_group_variance"] = """
        SELECT l_returnflag,
               round(var_samp(l_quantity), 6) AS var_qty,
               round(stddev_samp(l_quantity), 6) AS std_qty
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""

    # JL sign projection: the +-1 matrix is md5-derived so SQL
    # rebuilds it exactly; FLOAT*sign is exact, only the sum order
    # differs (double accumulate both sides; rounded to 6dp)
    out["q98_random_project"] = """
        WITH e AS (
          SELECT vec_id, CAST(u.r['j'] AS BIGINT) AS j,
                 CAST(u.r['v'] AS DOUBLE) AS v
          FROM embeddings, unnest(list_transform(
                generate_series(1, len(embedding)),
                i -> {'j': i, 'v': embedding[i]})) AS u(r)),
        ks AS (SELECT unnest(generate_series(0, 7)) AS k),
        s AS (SELECT e2.j, ks.k,
                     CASE WHEN md5_number_lower(
                            CAST(e2.j AS VARCHAR) || ':' ||
                            CAST(ks.k AS VARCHAR)) % 2 = 0
                          THEN 1.0 ELSE -1.0 END AS sgn
              FROM (SELECT DISTINCT j FROM e) e2, ks)
        SELECT e.vec_id, s.k, round(SUM(e.v * s.sgn), 6) AS y
        FROM e JOIN s USING (j)
        GROUP BY e.vec_id, s.k ORDER BY vec_id, k"""

    # q99: passage-level dedup — same 10-word chunk grid, keep the
    # min (doc_id, idx) occurrence per distinct chunk text, re-join
    # surviving chunks in order (engine: ops/dedup.passage_dedup)
    out["q99_passage_dedup"] = """
        WITH d AS (
          SELECT doc_id,
                 'v' || CAST(doc_id % 4 AS VARCHAR) || ' ' ||
                 'cookie notice we use cookies and trackers to improve '
                 || 'and measure your experience on our site accept '
                 || 'all now' || ' ' || text AS t
          FROM documents),
        w AS (SELECT doc_id, string_split(t, ' ') AS ws FROM d),
        ch0 AS (
          SELECT doc_id, unnest(list_transform(
                generate_series(0, (len(ws) + 9) // 10 - 1),
                i -> {'idx': i,
                      'chunk': array_to_string(
                          list_slice(ws, i*10+1, i*10+10),
                          ' ')})) AS r
          FROM w),
        ch AS (SELECT doc_id, CAST(r['idx'] AS BIGINT) AS idx,
                      CAST(r['chunk'] AS VARCHAR) AS chunk
               FROM ch0),
        keep AS (
          SELECT doc_id, idx, chunk FROM ch
          QUALIFY row_number() OVER (PARTITION BY chunk
                                     ORDER BY doc_id, idx) = 1),
        agg AS (SELECT doc_id,
                       string_agg(chunk, ' ' ORDER BY idx) AS text
                FROM keep GROUP BY doc_id)
        SELECT d.doc_id, coalesce(a.text, '') AS text
        FROM d LEFT JOIN agg a USING (doc_id) ORDER BY doc_id"""

    # q100: messy-URL synth + the normalize_urls rule chain (the SQL
    # side of each regex comes from stages/pages.url_normalize_sql so
    # engine and oracle share ONE rule table), grouped dedup
    from mapshaper_ray.stages.pages import url_normalize_sql
    out["q100_url_dedup"] = f"""
        WITH m AS (
          SELECT doc_id,
            (CASE WHEN doc_id % 2 = 0 THEN 'HTTP' ELSE 'https' END)
            || '://WWW.Site' || CAST(doc_id % 50 AS VARCHAR)
            || '.Example'
            || (CASE WHEN doc_id % 4 = 0 THEN ':80'
                     WHEN doc_id % 4 = 1 THEN ':443' ELSE '' END)
            || '/Path/' || CAST(doc_id % 100 AS VARCHAR)
            || (CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END)
            || (CASE WHEN doc_id % 2 = 0
                     THEN '?utm_source=feed&id='
                          || CAST(doc_id % 200 AS VARCHAR)
                     ELSE '?id=' || CAST(doc_id % 200 AS VARCHAR)
                          || '&utm_campaign=x' END)
            || (CASE WHEN doc_id % 5 = 0 THEN '#sec' ELSE '' END)
            AS url
          FROM documents),
        n AS (SELECT doc_id, {url_normalize_sql("url")} AS url_norm
              FROM m)
        SELECT url_norm, min(doc_id) AS first_doc,
               count(*) AS n_dups
        FROM n GROUP BY url_norm ORDER BY url_norm"""

    # q101: dataset x dataset top-3 cosine join, q14's idiom with a
    # parity split (odd ids query the even-id corpus)
    out["q101_nn_join"] = """
        WITH q AS (SELECT vec_id AS query_id,
                          list_transform(embedding,
                                         x -> CAST(x AS DOUBLE)) AS qv
                   FROM embeddings WHERE vec_id % 2 = 1),
        scored AS (
          SELECT q.query_id, e.vec_id,
                 round(list_cosine_similarity(
                   list_transform(e.embedding,
                                  x -> CAST(x AS DOUBLE)), q.qv),
                       6) AS cosine
          FROM embeddings e CROSS JOIN q WHERE e.vec_id % 2 = 0)
        SELECT query_id, vec_id, cosine FROM scored
        QUALIFY row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, vec_id) <= 3"""

    # q102: adjacent-bigram PMI, quantized-log integers (the q64
    # libm-vs-DuckDB ln trick) so pmi_q is exactly comparable
    out["q102_pmi_bigrams"] = """
        WITH tok AS (
          SELECT doc_id, string_split(coalesce(text, ''), ' ') AS ws
          FROM documents),
        uni AS (SELECT unnest(ws) AS w FROM tok),
        u AS (SELECT w, count(*) AS c FROM uni GROUP BY w),
        big AS (
          SELECT ws[t.i] AS w1, ws[t.i + 1] AS w2
          FROM tok, unnest(generate_series(1, len(ws) - 1)) AS t(i)),
        b AS (SELECT w1, w2, count(*) AS c FROM big GROUP BY w1, w2
              HAVING count(*) >= 5),
        g AS (SELECT (SELECT sum(c) FROM u) AS n1,
                     (SELECT count(*) FROM big) AS n2),
        s AS (
          SELECT b.w1, b.w2, b.c,
                 CAST(floor(ln(CAST(b.c AS DOUBLE)) * 1000000000)
                      AS BIGINT)
                 + 2 * CAST(floor(ln(CAST((SELECT n1 FROM g)
                                          AS DOUBLE)) * 1000000000)
                            AS BIGINT)
                 - CAST(floor(ln(CAST((SELECT n2 FROM g) AS DOUBLE))
                              * 1000000000) AS BIGINT)
                 - CAST(floor(ln(CAST(u1.c AS DOUBLE)) * 1000000000)
                        AS BIGINT)
                 - CAST(floor(ln(CAST(u2.c AS DOUBLE)) * 1000000000)
                        AS BIGINT) AS pmi_q
          FROM b JOIN u u1 ON b.w1 = u1.w JOIN u u2 ON b.w2 = u2.w)
        SELECT w1, w2, c, pmi_q FROM s
        ORDER BY pmi_q DESC, w1, w2 LIMIT 50"""

    # q103: Gopher quality rules over junk-tailed docs — every metric
    # is integer/list arithmetic + ONE double division per doc, so the
    # SQL mirror is value-exact (rounded 6dp for display, unrounded
    # for the keep comparisons, same as the engine)
    out["q103_gopher_rules"] = """
        WITH d AS (
          SELECT doc_id,
                 coalesce(text, '')
                 || repeat(' 123', CAST(doc_id % 8 AS INT))
                 || repeat(' #', CAST(doc_id % 6 AS INT))
                 || repeat(' ...', CAST(doc_id % 3 AS INT)) AS t
          FROM documents),
        w AS (SELECT doc_id, string_split(t, ' ') AS ws FROM d),
        m AS (SELECT doc_id,
                     len(ws) AS n_words,
                     list_sum(list_transform(ws, x -> len(x)))
                       AS n_chars,
                     len(list_filter(ws,
                         x -> regexp_matches(x, '[A-Za-z]')))
                       AS n_alpha,
                     len(list_filter(ws, x -> x IN ('#', '...')))
                       AS n_sym,
                     len(list_filter(ws, x -> x IN
                         ('the','be','to','of','and','that',
                          'have','with'))) AS n_stop
              FROM w),
        s AS (SELECT doc_id, n_words,
                     n_chars / CAST(greatest(n_words, 1) AS DOUBLE)
                       AS mwl,
                     n_alpha / CAST(greatest(n_words, 1) AS DOUBLE)
                       AS alpha_frac,
                     n_sym / CAST(greatest(n_words, 1) AS DOUBLE)
                       AS sym_frac,
                     n_stop
              FROM m)
        SELECT doc_id, n_words, round(mwl, 6) AS mwl,
               round(alpha_frac, 6) AS alpha_frac,
               round(sym_frac, 6) AS sym_frac, n_stop,
               CAST(n_words >= 40 AND n_words <= 100000
                    AND mwl >= 3.0 AND mwl <= 10.0
                    AND sym_frac <= 0.1 AND alpha_frac >= 0.8
                    AND n_stop >= 2 AS BIGINT) AS keep
        FROM s ORDER BY doc_id"""

    # q104: C4 line filter — docs re-lined into 6-word chunks (q99's
    # chunk idiom) with deterministic '.' / 'cookie' suffixes, then
    # the line rules + min-lines gate; byte-exact rebuilt text
    out["q104_c4_filter"] = """
        WITH d AS (SELECT doc_id,
                          string_split(coalesce(text, ''), ' ') AS ws
                   FROM documents),
        ch0 AS (
          SELECT doc_id, unnest(list_transform(
                generate_series(0, (len(ws) + 5) // 6 - 1),
                i -> {'idx': i,
                      'chunk': array_to_string(
                          list_slice(ws, i*6+1, i*6+6), ' ')})) AS r
          FROM d),
        ch AS (SELECT doc_id, CAST(r['idx'] AS BIGINT) AS idx,
                      CAST(r['chunk'] AS VARCHAR) AS chunk
               FROM ch0),
        ln AS (SELECT doc_id, idx,
                      chunk || CASE
                        WHEN (doc_id + idx) % 7 = 0
                          THEN ' cookie deal.'
                        WHEN (doc_id + idx) % 3 = 0 THEN '.'
                        ELSE '' END AS line
               FROM ch),
        ok AS (SELECT doc_id, idx, line FROM ln
               WHERE len(string_split(line, ' ')) >= 5
                 AND regexp_matches(line, '[.!?"]$')
                 AND NOT contains(line, 'cookie')
                 AND NOT contains(line, 'javascript')
                 AND NOT contains(line, '{')),
        agg AS (SELECT doc_id,
                       string_agg(line, chr(10) ORDER BY idx)
                         AS text,
                       count(*) AS n
                FROM ok GROUP BY doc_id)
        SELECT doc_id, text FROM agg WHERE n >= 2 ORDER BY doc_id"""

    # q105: per-doc top-5 tf-idf terms, idf quantized-log integer
    # (q64's libm-vs-DuckDB ln trick) so score_q is integer-exact
    out["q105_tfidf"] = """
        WITH w AS (SELECT doc_id,
                          string_split(coalesce(text, ''), ' ') AS ws
                   FROM documents),
        tf AS (SELECT doc_id, tok AS token, count(*) AS tf
               FROM (SELECT doc_id, unnest(ws) AS tok FROM w)
               GROUP BY doc_id, tok),
        dfq AS (SELECT token, count(DISTINCT doc_id) AS dfc
                FROM tf GROUP BY token),
        n AS (SELECT count(*) AS nd FROM documents),
        s AS (SELECT tf.doc_id, tf.token, tf.tf,
                     tf.tf * (CAST(floor(ln(CAST((SELECT nd FROM n)
                                AS DOUBLE)) * 1000000000) AS BIGINT)
                              - CAST(floor(ln(CAST(dfq.dfc AS DOUBLE))
                                * 1000000000) AS BIGINT)) AS score_q
              FROM tf JOIN dfq USING (token))
        SELECT doc_id, token, tf, score_q FROM s
        QUALIFY row_number() OVER (PARTITION BY doc_id
                                   ORDER BY score_q DESC, token) <= 5
        ORDER BY doc_id, score_q DESC, token"""

    # q106: inverted index — token df + first-20 posting list
    out["q106_inverted_index"] = """
        WITH t AS (SELECT DISTINCT doc_id, token
                   FROM (SELECT doc_id,
                                unnest(string_split(
                                    coalesce(text, ''), ' ')) AS token
                         FROM documents)),
        g AS (SELECT token, count(*) AS df,
                     array_to_string(
                       list_slice(list(doc_id ORDER BY doc_id),
                                  1, 20), ',') AS postings
              FROM t GROUP BY token)
        SELECT token, df, postings FROM g
        WHERE df >= 2 ORDER BY token"""

    # q107: count-min sketch rebuilt in SQL — ONE md5 per value,
    # row-j bucket = (lo%w + j*(hi%w)) % w (Kirsch-Mitzenmacher, the
    # engine's exact arithmetic); counter(j,b) = occurrences hashing
    # there, estimate = min over the 4 rows; queried for the exact
    # global top-20 tokens
    out["q107_cms"] = """
        WITH tok AS (SELECT unnest(string_split(
                         coalesce(text, ''), ' ')) AS token
                     FROM documents),
        hsh AS (SELECT token,
                       CAST(md5_number_lower(token) % 512 AS BIGINT)
                         AS lo,
                       CAST(md5_number_upper(token) % 512 AS BIGINT)
                         AS hi
                FROM tok),
        cnt AS (SELECT token, count(*) AS c FROM tok GROUP BY token),
        top AS (SELECT token, c FROM cnt
                ORDER BY c DESC, token LIMIT 20),
        J AS (SELECT unnest(generate_series(0, 3)) AS j),
        buck AS (SELECT J.j, (h.lo + J.j * h.hi) % 512 AS b,
                        count(*) AS cnt
                 FROM hsh h CROSS JOIN J GROUP BY 1, 2),
        est AS (SELECT top.token, top.c, min(buck.cnt) AS e
                FROM top CROSS JOIN J
                JOIN buck ON buck.j = J.j
                 AND buck.b = (CAST(md5_number_lower(top.token) % 512
                                    AS BIGINT)
                               + J.j *
                               CAST(md5_number_upper(top.token) % 512
                                    AS BIGINT)) % 512
                GROUP BY top.token, top.c)
        SELECT token, c AS c_exact, CAST(e AS BIGINT) AS c_est
        FROM est ORDER BY c_exact DESC, token"""

    # q108: stratified 80/10/10 split — md5-rank within language,
    # integer quota arithmetic ((8n)//10 == floor(0.8*n) in IEEE for
    # every n < 2**50, see stages/text.stratified_split)
    out["q108_stratified_split"] = """
        WITH r AS (
          SELECT doc_id, lang,
                 row_number() OVER (PARTITION BY lang
                   ORDER BY md5_number_lower(
                     's0:' || CAST(doc_id AS VARCHAR)), doc_id) AS rn,
                 count(*) OVER (PARTITION BY lang) AS n
          FROM documents)
        SELECT doc_id, lang,
               CASE WHEN rn <= (8 * n) // 10 THEN 'train'
                    WHEN rn <= (9 * n) // 10 THEN 'valid'
                    ELSE 'test' END AS split
        FROM r ORDER BY doc_id"""

    # q109: global sliding-window sum, ROWS 9 PRECEDING over
    # (ts, event_id) order; values quantized to int64 so the sum is
    # order-independent and the halo-exchange engine matches exactly
    out["q109_sliding_window"] = """
        WITH e AS (SELECT event_id, epoch_us(ts) AS ep,
                          CAST(floor(value * 1000000) AS BIGINT) AS v
                   FROM events)
        SELECT event_id,
               CAST(SUM(v) OVER (ORDER BY ep, event_id
                            ROWS BETWEEN 9 PRECEDING
                            AND CURRENT ROW) AS BIGINT) AS msum
        FROM e ORDER BY event_id"""

    # q110: entity/whitespace normalization — the SQL side of every
    # rule comes from stages/text.clean_text_sql so engine and oracle
    # share ONE rule table (the url_normalize_sql pattern)
    from mapshaper_ray.stages.text import clean_text_sql
    out["q110_clean_text"] = f"""
        WITH m AS (
          SELECT doc_id,
                 (CASE WHEN doc_id % 3 = 0
                       THEN '&lt;p&gt;&nbsp;&nbsp;' ELSE '' END)
                 || coalesce(text, '')
                 || (CASE WHEN doc_id % 2 = 0
                          THEN '  &amp;&amp; &quot;x&#39; '
                          ELSE '' END) AS t
          FROM documents)
        SELECT doc_id, {clean_text_sql("t")} AS text
        FROM m ORDER BY doc_id"""

    # q111: bigram stupid-backoff LM on the held-out odd docs;
    # quantized libm logs (q64 trick) make nll_q integer-exact
    import math as _math
    _qb = _math.floor(_math.log(0.4) * 1000000000)
    _QL = ("CAST(floor(ln(CAST({x} AS DOUBLE)) * 1000000000) "
           "AS BIGINT)")
    out["q111_bigram_nll"] = f"""
        WITH tr AS (SELECT string_split(coalesce(text, ''), ' ') AS ws
                    FROM documents WHERE doc_id % 2 = 0),
        uni AS (SELECT unnest(ws) AS w FROM tr),
        u AS (SELECT w, count(*) AS c FROM uni GROUP BY w),
        g AS (SELECT (SELECT sum(c) FROM u) AS n1,
                     (SELECT count(*) FROM u) AS v),
        bt AS (SELECT ws[t.i] AS w1, ws[t.i + 1] AS w2
               FROM tr, unnest(generate_series(1, len(ws) - 1))
                    AS t(i)),
        b AS (SELECT w1, w2, count(*) AS c FROM bt GROUP BY w1, w2),
        sd AS (SELECT doc_id,
                      string_split(coalesce(text, ''), ' ') AS ws
               FROM documents WHERE doc_id % 2 = 1),
        sb AS (SELECT doc_id, ws[t.i] AS w1, ws[t.i + 1] AS w2
               FROM sd, unnest(generate_series(1, len(ws) - 1))
                    AS t(i)),
        s AS (SELECT sb.doc_id,
                     CASE WHEN b.c IS NOT NULL
                       THEN {_QL.format(x='b.c')}
                            - {_QL.format(x='u1.c')}
                       ELSE {_qb}
                            + CASE WHEN u2.c IS NOT NULL
                                   THEN {_QL.format(x='u2.c + 1')}
                                   ELSE 0 END
                            - {_QL.format(x='g.n1 + g.v')} END AS sq
              FROM sb LEFT JOIN b ON sb.w1 = b.w1 AND sb.w2 = b.w2
                      LEFT JOIN u u1 ON sb.w1 = u1.w
                      LEFT JOIN u u2 ON sb.w2 = u2.w
                      CROSS JOIN g),
        a AS (SELECT doc_id, count(*) AS nb,
                     -sum(sq) AS nll FROM s GROUP BY doc_id)
        SELECT sd.doc_id,
               CAST(coalesce(a.nb, 0) AS BIGINT) AS n_bigrams,
               CAST(coalesce(a.nll, 0) AS BIGINT) AS nll_q
        FROM sd LEFT JOIN a USING (doc_id) ORDER BY doc_id"""

    # q112: per-dim min/max scalar quantization to 256 codes — every
    # step is a single IEEE op, so qv is exact (k is 1-based)
    out["q112_scalar_quantize"] = """
        WITH e AS (
          SELECT vec_id, CAST(u.r['j'] AS BIGINT) AS k,
                 CAST(u.r['v'] AS DOUBLE) AS v
          FROM embeddings, unnest(list_transform(
                generate_series(1, len(embedding)),
                i -> {'j': i, 'v': embedding[i]})) AS u(r)),
        mm AS (SELECT k, min(v) AS mn, max(v) AS mx
               FROM e GROUP BY k)
        SELECT e.vec_id, e.k,
               CASE WHEN mm.mx > mm.mn
                    THEN CAST(floor((e.v - mm.mn) / (mm.mx - mm.mn)
                                    * 255) AS BIGINT)
                    ELSE 0 END AS qv
        FROM e JOIN mm USING (k) ORDER BY vec_id, k"""

    # q113: the WARC ingest round-trip must reproduce exactly what
    # SQL computes straight from the documents table (url/ts are pure
    # functions of doc_id; text byte-identical per url)
    out["q113_warc_ingest"] = """
        SELECT 'https://site' || CAST(doc_id % 1000 AS VARCHAR)
               || '.example/p/' || CAST(doc_id AS VARCHAR) AS url,
               make_timestamp((1577836800000 + doc_id * 1009)
                              * 1000) AS warc_ts,
               text
        FROM documents ORDER BY url"""

    # q114: ROLLUP subtotals; '(all)' labels the rolled-up levels
    # (the data has no NULL keys, so coalesce marks subtotals only)
    out["q114_rollup"] = """
        SELECT coalesce(source, '(all)') AS source,
               coalesce(lang, '(all)') AS lang,
               count(*) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS sum_chars
        FROM documents GROUP BY ROLLUP(source, lang)
        ORDER BY source, lang"""

    # q115: TPC-H Q3 shape; revenue in integer cents so the grouped
    # sum is order-independent and hash-exact
    out["q115_tpch_q3"] = """
        SELECT o.o_orderkey, o.o_orderdate,
               CAST(sum(CAST(round(l.l_extendedprice * 100)
                             AS BIGINT)
                        * (100 - CAST(round(l.l_discount * 100)
                                      AS BIGINT)))
                    AS BIGINT) AS revenue_cents
        FROM customer c
        JOIN orders o ON o.o_custkey = c.c_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1998-06-01'
          AND l.l_shipdate > TIMESTAMP '1998-06-01'
        GROUP BY o.o_orderkey, o.o_orderdate
        ORDER BY revenue_cents DESC, o.o_orderdate, o.o_orderkey
        LIMIT 10"""

    # q116: hashed-unigram multinomial Naive Bayes — train counts on
    # the even docs, score the odd docs; quantized libm logs (q64
    # trick) make score_q integer-exact; argmax tie-break = smallest
    # lang (mirrors np.argmax first-max)
    _NQ = ("CAST(floor(ln(CAST({x} AS DOUBLE)) * 1000000000) "
           "AS BIGINT)")
    out["q116_nb_classifier"] = f"""
        WITH tr AS (SELECT lang,
                      string_split(coalesce(text, ''), ' ') AS ts
                    FROM documents WHERE doc_id % 2 = 0),
        tok AS (SELECT lang,
                  CAST(md5_number_lower(u.t) % 1024 AS BIGINT) AS b
                FROM tr, unnest(ts) AS u(t)),
        cls AS (SELECT lang, count(*) AS nd FROM documents
                WHERE doc_id % 2 = 0 GROUP BY lang),
        cb AS (SELECT lang, b, count(*) AS c FROM tok
               GROUP BY lang, b),
        tot AS (SELECT lang, count(*) AS n FROM tok GROUP BY lang),
        g AS (SELECT (SELECT sum(nd) FROM cls) AS ndt),
        kq AS (SELECT cls.lang,
                 {_NQ.format(x='cls.nd')}
                 - {_NQ.format(x='g.ndt')} AS prior_q,
                 {_NQ.format(x='tot.n + 1024')} AS qz
               FROM cls JOIN tot USING (lang), g),
        sd AS (SELECT doc_id,
                 string_split(coalesce(text, ''), ' ') AS ts
               FROM documents WHERE doc_id % 2 = 1),
        st AS (SELECT doc_id,
                 CAST(md5_number_lower(u.t) % 1024 AS BIGINT) AS b
               FROM sd, unnest(ts) AS u(t)),
        sc AS (SELECT st.doc_id, kq.lang, kq.prior_q, kq.qz,
                 sum(CASE WHEN cb.c IS NOT NULL
                          THEN {_NQ.format(x='cb.c + 1')}
                          ELSE 0 END) AS s,
                 count(*) AS ntok
               FROM st CROSS JOIN kq
                    LEFT JOIN cb ON cb.lang = kq.lang
                                AND cb.b = st.b
               GROUP BY st.doc_id, kq.lang, kq.prior_q, kq.qz),
        fin AS (SELECT doc_id, lang,
                  prior_q + s - ntok * qz AS score FROM sc)
        SELECT doc_id, lang AS pred,
               CAST(score AS BIGINT) AS score_q
        FROM fin
        QUALIFY row_number() OVER (PARTITION BY doc_id
                 ORDER BY score DESC, lang) = 1
        ORDER BY doc_id"""

    out["q117_host_graph"] = """
        WITH l AS (
          SELECT 'h' || CAST(doc_id % 50 AS VARCHAR) AS src_host,
                 'h' || CAST((doc_id * 7 + 1) % 50 AS VARCHAR)
                   AS dst_host
          FROM documents
          UNION ALL
          SELECT 'h' || CAST(doc_id % 50 AS VARCHAR),
                 'h' || CAST((doc_id * 13 + 5) % 50 AS VARCHAR)
          FROM documents),
        a AS (SELECT src_host, dst_host, count(*) AS n_links
              FROM l GROUP BY 1, 2)
        SELECT a.src_host, a.dst_host,
               CAST(a.n_links AS BIGINT) AS n_links,
               CAST(a.src_host = a.dst_host OR EXISTS (
                 SELECT 1 FROM a r
                 WHERE r.src_host = a.dst_host
                   AND r.dst_host = a.src_host) AS BIGINT) AS mutual
        FROM a ORDER BY a.src_host, a.dst_host"""

    # q118: parallel k-core peel unrolled as six idempotent rounds
    # (the sf0.01 graph converges in <= 4; extra rounds are no-ops)
    out["q118_kcore"] = f"""
        WITH nn AS (SELECT count(*) AS n,
                      greatest(count(*) // 10, 8) AS c
                    FROM documents),
        raw AS (
          SELECT doc_id AS s, (doc_id * 7 + 1) % nn.n AS t
          FROM documents, nn
          UNION ALL
          SELECT doc_id, doc_id % nn.c FROM documents, nn
          UNION ALL
          SELECT doc_id, (doc_id + j.j) % nn.c
          FROM documents, nn,
               (VALUES (1), (2), (3), (4), (5), (6)) AS j(j)
          WHERE doc_id < nn.c),
        e0 AS MATERIALIZED (SELECT DISTINCT least(s, t) AS a,
                 greatest(s, t) AS b
               FROM raw WHERE s <> t),
        a0 AS MATERIALIZED (SELECT a AS node FROM e0
               UNION SELECT b AS node FROM e0),
        a1 AS MATERIALIZED (SELECT node FROM (
          SELECT x.node, count(*) AS c FROM (
            SELECT e.a AS node FROM e0 e
              JOIN a0 s ON e.a = s.node
              JOIN a0 t ON e.b = t.node
            UNION ALL
            SELECT e.b AS node FROM e0 e
              JOIN a0 s ON e.a = s.node
              JOIN a0 t ON e.b = t.node
          ) x GROUP BY x.node) WHERE c >= 8),
        a2 AS MATERIALIZED (SELECT node FROM (
          SELECT x.node, count(*) AS c FROM (
            SELECT e.a AS node FROM e0 e
              JOIN a1 s ON e.a = s.node
              JOIN a1 t ON e.b = t.node
            UNION ALL
            SELECT e.b AS node FROM e0 e
              JOIN a1 s ON e.a = s.node
              JOIN a1 t ON e.b = t.node
          ) x GROUP BY x.node) WHERE c >= 8),
        a3 AS MATERIALIZED (SELECT node FROM (
          SELECT x.node, count(*) AS c FROM (
            SELECT e.a AS node FROM e0 e
              JOIN a2 s ON e.a = s.node
              JOIN a2 t ON e.b = t.node
            UNION ALL
            SELECT e.b AS node FROM e0 e
              JOIN a2 s ON e.a = s.node
              JOIN a2 t ON e.b = t.node
          ) x GROUP BY x.node) WHERE c >= 8),
        a4 AS MATERIALIZED (SELECT node FROM (
          SELECT x.node, count(*) AS c FROM (
            SELECT e.a AS node FROM e0 e
              JOIN a3 s ON e.a = s.node
              JOIN a3 t ON e.b = t.node
            UNION ALL
            SELECT e.b AS node FROM e0 e
              JOIN a3 s ON e.a = s.node
              JOIN a3 t ON e.b = t.node
          ) x GROUP BY x.node) WHERE c >= 8),
        a5 AS MATERIALIZED (SELECT node FROM (
          SELECT x.node, count(*) AS c FROM (
            SELECT e.a AS node FROM e0 e
              JOIN a4 s ON e.a = s.node
              JOIN a4 t ON e.b = t.node
            UNION ALL
            SELECT e.b AS node FROM e0 e
              JOIN a4 s ON e.a = s.node
              JOIN a4 t ON e.b = t.node
          ) x GROUP BY x.node) WHERE c >= 8),
        a6 AS MATERIALIZED (SELECT node FROM (
          SELECT x.node, count(*) AS c FROM (
            SELECT e.a AS node FROM e0 e
              JOIN a5 s ON e.a = s.node
              JOIN a5 t ON e.b = t.node
            UNION ALL
            SELECT e.b AS node FROM e0 e
              JOIN a5 s ON e.a = s.node
              JOIN a5 t ON e.b = t.node
          ) x GROUP BY x.node) WHERE c >= 8)
        SELECT x.node, CAST(count(*) AS BIGINT) AS deg FROM (
          SELECT e.a AS node FROM e0 e
            JOIN a6 s ON e.a = s.node JOIN a6 t ON e.b = t.node
          UNION ALL
          SELECT e.b AS node FROM e0 e
            JOIN a6 s ON e.a = s.node JOIN a6 t ON e.b = t.node
        ) x GROUP BY x.node ORDER BY x.node"""

    out["q119_pivot_events"] = """
        WITH c AS (SELECT user_id, event_type,
                     CAST(round(value * 100) AS BIGINT) AS cents
                   FROM events)
        SELECT user_id,
          CAST(coalesce(sum(cents) FILTER (event_type = 'click'), 0)
               AS BIGINT) AS click_sum,
          CAST(count(*) FILTER (event_type = 'click')
               AS BIGINT) AS click_count,
          CAST(coalesce(sum(cents) FILTER (event_type = 'error'), 0)
               AS BIGINT) AS error_sum,
          CAST(count(*) FILTER (event_type = 'error')
               AS BIGINT) AS error_count,
          CAST(coalesce(sum(cents) FILTER (event_type = 'purchase'),
               0) AS BIGINT) AS purchase_sum,
          CAST(count(*) FILTER (event_type = 'purchase')
               AS BIGINT) AS purchase_count,
          CAST(coalesce(sum(cents) FILTER (event_type = 'signup'), 0)
               AS BIGINT) AS signup_sum,
          CAST(count(*) FILTER (event_type = 'signup')
               AS BIGINT) AS signup_count,
          CAST(coalesce(sum(cents) FILTER (event_type = 'view'), 0)
               AS BIGINT) AS view_sum,
          CAST(count(*) FILTER (event_type = 'view')
               AS BIGINT) AS view_count
        FROM c GROUP BY user_id ORDER BY user_id"""

    out["q120_funnel"] = """
        WITH s1 AS (SELECT user_id, min(ts) AS ts_1 FROM events
                    WHERE event_type = 'view' GROUP BY user_id),
        s2 AS (SELECT e.user_id, min(e.ts) AS ts_2
               FROM events e JOIN s1 ON e.user_id = s1.user_id
               WHERE e.event_type = 'click' AND e.ts > s1.ts_1
               GROUP BY e.user_id),
        s3 AS (SELECT e.user_id, min(e.ts) AS ts_3
               FROM events e JOIN s2 ON e.user_id = s2.user_id
               WHERE e.event_type = 'purchase' AND e.ts > s2.ts_2
               GROUP BY e.user_id)
        SELECT s1.user_id,
               CAST(1 + CASE WHEN s2.user_id IS NULL THEN 0 ELSE 1
                    END + CASE WHEN s3.user_id IS NULL THEN 0 ELSE 1
                    END AS BIGINT) AS stage,
               s1.ts_1, s2.ts_2, s3.ts_3
        FROM s1
        LEFT JOIN s2 ON s1.user_id = s2.user_id
        LEFT JOIN s3 ON s1.user_id = s3.user_id
        ORDER BY s1.user_id"""

    # q121: A-ES weighted sampling — L = floor(libm-ln(u) * 1e9) is
    # integer-exact (q64 trick), the key a single IEEE division
    out["q121_weighted_sample"] = """
        WITH h AS (SELECT doc_id,
                     CAST(n_chars + 1 AS BIGINT) AS w,
                     md5_number_lower('s0:' || CAST(doc_id AS VARCHAR))
                       AS hh
                   FROM documents),
        k AS (SELECT doc_id, w,
                CAST(floor(ln((CAST(hh AS DOUBLE) + 1)
                     / 18446744073709551616.0) * 1000000000)
                  AS BIGINT) AS L
              FROM h)
        SELECT doc_id, w, CAST(L AS DOUBLE) / CAST(w AS DOUBLE) AS key
        FROM k ORDER BY key DESC, doc_id LIMIT 100"""

    out["q122_retention"] = """
        WITH f AS (SELECT user_id, min(ts) AS t0 FROM events
                   GROUP BY user_id),
        x AS (SELECT DISTINCT
                epoch_us(f.t0) // 86400000000 AS cohort_day,
                (epoch_us(e.ts) - epoch_us(f.t0)) // 604800000000
                  AS "offset",
                e.user_id
              FROM events e JOIN f ON e.user_id = f.user_id)
        SELECT CAST(cohort_day AS BIGINT) AS cohort_day,
               CAST("offset" AS BIGINT) AS "offset",
               CAST(count(*) AS BIGINT) AS n_users
        FROM x GROUP BY 1, 2 ORDER BY 1, 2"""

    out["q123_window_funnel"] = """
        WITH s1 AS (SELECT user_id, min(ts) AS ts_1 FROM events
                    WHERE event_type = 'view' GROUP BY user_id),
        s2 AS (SELECT e.user_id, min(e.ts) AS ts_2
               FROM events e JOIN s1 ON e.user_id = s1.user_id
               WHERE e.event_type = 'click' AND e.ts > s1.ts_1
                 AND e.ts <= s1.ts_1 + INTERVAL 1 DAY
               GROUP BY e.user_id),
        s3 AS (SELECT e.user_id, min(e.ts) AS ts_3
               FROM events e JOIN s2 ON e.user_id = s2.user_id
               WHERE e.event_type = 'purchase' AND e.ts > s2.ts_2
                 AND e.ts <= s2.ts_2 + INTERVAL 1 DAY
               GROUP BY e.user_id)
        SELECT s1.user_id,
               CAST(1 + CASE WHEN s2.user_id IS NULL THEN 0 ELSE 1
                    END + CASE WHEN s3.user_id IS NULL THEN 0 ELSE 1
                    END AS BIGINT) AS stage,
               s1.ts_1, s2.ts_2, s3.ts_3
        FROM s1
        LEFT JOIN s2 ON s1.user_id = s2.user_id
        LEFT JOIN s3 ON s1.user_id = s3.user_id
        ORDER BY s1.user_id"""

    # q124: rate = pow(n, -0.5) through libm on both sides; the
    # cutoff floor(rate * (2^64-1)) is one IEEE multiply, compared in
    # HUGEINT (rate >= 1 keeps the whole group, no UBIGINT overflow)
    out["q124_temperature_mix"] = """
        WITH c AS (SELECT source, count(*) AS n FROM documents
                   GROUP BY source),
        r AS (SELECT source, pow(CAST(n AS DOUBLE), -0.5) AS rate
              FROM c),
        k AS (SELECT d.doc_id, d.source,
                md5_number_lower('s0:' || CAST(d.doc_id AS VARCHAR))
                  AS h,
                r.rate
              FROM documents d JOIN r ON d.source = r.source)
        SELECT doc_id, source FROM k
        WHERE rate >= 1 OR CAST(h AS HUGEINT) <
              CAST(floor(rate * 18446744073709551615.0) AS HUGEINT)
        ORDER BY doc_id"""

    # q125: chunk starts = range(0, max(n-overlap, 1), stride) —
    # the final window reaches the last token, never a window wholly
    # inside the previous one
    out["q125_chunk_docs"] = """
        WITH t AS (SELECT doc_id,
                     string_split(coalesce(text, ''), ' ') AS ts
                   FROM documents),
        s AS (SELECT doc_id, ts, len(ts) AS n FROM t),
        g AS (SELECT doc_id, ts, u.st AS st,
                CAST(u.st // 48 AS BIGINT) AS chunk_id
              FROM s, unnest(range(0, greatest(n - 16, 1), 48))
                   AS u(st))
        SELECT doc_id, chunk_id,
               CAST(len(list_slice(ts, st + 1, st + 64)) AS BIGINT)
                 AS n_tokens,
               array_to_string(list_slice(ts, st + 1, st + 64), ' ')
                 AS text
        FROM g ORDER BY doc_id, chunk_id"""

    out["q126_label_prop"] = """
        WITH nn AS (SELECT count(*) AS n,
                      greatest(count(*) // 10, 8) AS c
                    FROM documents),
        raw AS (
          SELECT doc_id AS s, (doc_id * 7 + 1) % nn.n AS t
          FROM documents, nn
          UNION ALL
          SELECT doc_id, doc_id % nn.c FROM documents, nn
          UNION ALL
          SELECT doc_id, (doc_id + j.j) % nn.c
          FROM documents, nn,
               (VALUES (1), (2), (3), (4), (5), (6)) AS j(j)
          WHERE doc_id < nn.c),
        e0 AS MATERIALIZED (SELECT DISTINCT least(s, t) AS a,
                 greatest(s, t) AS b
               FROM raw WHERE s <> t),
        a0 AS MATERIALIZED (SELECT a AS node FROM e0
               UNION SELECT b AS node FROM e0),
        l0 AS MATERIALIZED (SELECT node, node AS lab FROM a0),
        m1 AS MATERIALIZED (
          SELECT e.a AS node, l.lab FROM e0 e
            JOIN l0 l ON l.node = e.b
          UNION ALL
          SELECT e.b AS node, l.lab FROM e0 e
            JOIN l0 l ON l.node = e.a),
        w1 AS MATERIALIZED (
          SELECT node, lab FROM (
            SELECT node, lab, count(*) AS c FROM m1
            GROUP BY node, lab)
          QUALIFY row_number() OVER (
            PARTITION BY node ORDER BY c DESC, lab) = 1),
        l1 AS MATERIALIZED (
          SELECT l0.node, coalesce(w1.lab, l0.lab) AS lab
          FROM l0 LEFT JOIN w1 ON l0.node = w1.node),
        m2 AS MATERIALIZED (
          SELECT e.a AS node, l.lab FROM e0 e
            JOIN l1 l ON l.node = e.b
          UNION ALL
          SELECT e.b AS node, l.lab FROM e0 e
            JOIN l1 l ON l.node = e.a),
        w2 AS MATERIALIZED (
          SELECT node, lab FROM (
            SELECT node, lab, count(*) AS c FROM m2
            GROUP BY node, lab)
          QUALIFY row_number() OVER (
            PARTITION BY node ORDER BY c DESC, lab) = 1),
        l2 AS MATERIALIZED (
          SELECT l1.node, coalesce(w2.lab, l1.lab) AS lab
          FROM l1 LEFT JOIN w2 ON l1.node = w2.node),
        m3 AS MATERIALIZED (
          SELECT e.a AS node, l.lab FROM e0 e
            JOIN l2 l ON l.node = e.b
          UNION ALL
          SELECT e.b AS node, l.lab FROM e0 e
            JOIN l2 l ON l.node = e.a),
        w3 AS MATERIALIZED (
          SELECT node, lab FROM (
            SELECT node, lab, count(*) AS c FROM m3
            GROUP BY node, lab)
          QUALIFY row_number() OVER (
            PARTITION BY node ORDER BY c DESC, lab) = 1),
        l3 AS MATERIALIZED (
          SELECT l2.node, coalesce(w3.lab, l2.lab) AS lab
          FROM l2 LEFT JOIN w3 ON l2.node = w3.node)
        SELECT node, CAST(lab AS BIGINT) AS label
        FROM l3 ORDER BY node"""

    out["q127_gram_matrix"] = """
        WITH e AS (
          SELECT vec_id, CAST(u.r['j'] AS BIGINT) AS k,
                 CAST(u.r['v'] AS DOUBLE) AS v
          FROM embeddings, unnest(list_transform(
                generate_series(1, len(embedding)),
                i -> {'j': i, 'v': embedding[i]})) AS u(r)),
        mm AS (SELECT k, min(v) AS mn, max(v) AS mx
               FROM e GROUP BY k),
        q AS MATERIALIZED (
          SELECT e.vec_id, e.k,
                 CASE WHEN mm.mx > mm.mn
                      THEN CAST(floor((e.v - mm.mn)
                                      / (mm.mx - mm.mn)
                                      * 255) AS BIGINT)
                      ELSE 0 END AS qv
          FROM e JOIN mm USING (k)),
        p AS (SELECT a.k AS i, b.k AS j, sum(a.qv * b.qv) AS v
              FROM q a JOIN q b ON a.vec_id = b.vec_id
                               AND a.k <= b.k
              GROUP BY 1, 2),
        s AS (SELECT k AS i, 0 AS j, sum(qv) AS v FROM q GROUP BY 1),
        c AS (SELECT 0 AS i, 0 AS j, count(*) AS v FROM embeddings)
        SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
               CAST(v AS BIGINT) AS v
        FROM (SELECT * FROM p UNION ALL SELECT * FROM s
              UNION ALL SELECT * FROM c)
        ORDER BY i, j"""

    # q128: the 8-bit interleave unrolled as 16 shift/mask terms;
    # quantization mirrors the op's float64 expression order exactly
    out["q128_zorder"] = """
        WITH s AS (SELECT min(value) AS mn0, max(value) AS mx0,
                     min(epoch_us(ts)) AS mn1,
                     max(epoch_us(ts)) AS mx1
                   FROM events),
        q AS (SELECT e.event_id,
                CAST(floor((e.value - s.mn0) / (s.mx0 - s.mn0)
                           * 255.0) AS BIGINT) AS q0,
                CAST(floor((CAST(epoch_us(e.ts) AS DOUBLE)
                            - CAST(s.mn1 AS DOUBLE))
                           / (CAST(s.mx1 AS DOUBLE)
                              - CAST(s.mn1 AS DOUBLE))
                           * 255.0) AS BIGINT) AS q1
              FROM events e, s),
        z AS (SELECT event_id, (((q0 >> 0) & 1) << 0) | (((q1 >> 0) & 1) << 1) | (((q0 >> 1) & 1) << 2) | (((q1 >> 1) & 1) << 3) | (((q0 >> 2) & 1) << 4) | (((q1 >> 2) & 1) << 5) | (((q0 >> 3) & 1) << 6) | (((q1 >> 3) & 1) << 7) | (((q0 >> 4) & 1) << 8) | (((q1 >> 4) & 1) << 9) | (((q0 >> 5) & 1) << 10) | (((q1 >> 5) & 1) << 11) | (((q0 >> 6) & 1) << 12) | (((q1 >> 6) & 1) << 13) | (((q0 >> 7) & 1) << 14) | (((q1 >> 7) & 1) << 15) AS zkey FROM q)
        SELECT event_id, CAST(zkey AS BIGINT) AS zkey,
               CAST((zkey * 16) >> 16 AS BIGINT) AS part
        FROM z ORDER BY event_id"""

    out["q129_locf_fill"] = """
        WITH x AS (SELECT user_id, ts,
                     CASE WHEN event_type = 'error' THEN NULL
                          ELSE value END AS v
                   FROM events)
        SELECT user_id, ts,
               coalesce(last_value(v IGNORE NULLS) OVER (
                 PARTITION BY user_id ORDER BY ts
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                 -1.0) AS value
        FROM x ORDER BY user_id, ts"""

    out["q130_attribution"] = """
        WITH c AS (SELECT event_id AS click_event, user_id, ts
                   FROM events WHERE event_type = 'click'),
        p AS (SELECT event_id AS p_event, user_id, ts
              FROM events WHERE event_type = 'purchase'),
        j AS (SELECT c.click_event, p.p_event
              FROM c JOIN p ON c.user_id = p.user_id
               AND c.ts >= p.ts - INTERVAL 6 HOUR
               AND c.ts <= p.ts),
        n AS (SELECT p_event, count(*) AS nc FROM j GROUP BY 1)
        SELECT j.click_event, j.p_event, 1.0 / n.nc AS credit
        FROM j JOIN n USING (p_event)
        ORDER BY click_event, p_event"""

    out["q131_rolling_dau"] = """
        WITH d AS (SELECT DISTINCT user_id,
                     epoch_us(ts) // 86400000000 AS day
                   FROM events),
        days AS (SELECT DISTINCT day FROM d)
        SELECT CAST(g.day AS BIGINT) AS day,
               CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
        FROM days g JOIN d e ON e.day BETWEEN g.day - 6 AND g.day
        GROUP BY g.day ORDER BY g.day"""

    # q132: 52-bit md5 fingerprints on both sides (the op masks to 52
    # bits so NaN padding in the outer join stays exact)
    out["q132_dataset_diff"] = """
        WITH l AS (SELECT doc_id, coalesce(text, '') AS text
                   FROM documents),
        r AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 13 = 0
                      THEN coalesce(text, '') || ' x'
                      ELSE coalesce(text, '') END AS text
          FROM documents WHERE doc_id % 17 <> 0
          UNION ALL
          SELECT doc_id + 1000000000, coalesce(text, '')
          FROM documents WHERE doc_id % 29 = 0),
        j AS (SELECT coalesce(l.doc_id, r.doc_id) AS doc_id,
                CASE WHEN l.doc_id IS NULL THEN 'added'
                     WHEN r.doc_id IS NULL THEN 'removed'
                     WHEN md5_number_lower(l.text) % 4503599627370496
                          <> md5_number_lower(r.text)
                             % 4503599627370496 THEN 'changed'
                END AS status
              FROM l FULL OUTER JOIN r ON l.doc_id = r.doc_id)
        SELECT doc_id, status FROM j WHERE status IS NOT NULL
        ORDER BY doc_id, status"""

    out["q133_cube"] = """
        SELECT coalesce(lang, '(all)') AS lang,
               coalesce(source, '(all)') AS source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS sum_chars
        FROM documents GROUP BY CUBE (lang, source)
        ORDER BY lang, source"""

    out["q134_edit1_pairs"] = """
        WITH s AS (
          SELECT chr(97 + CAST((doc_id // 625) % 5 AS INT))
              || chr(97 + CAST((doc_id // 125) % 5 AS INT))
              || chr(97 + CAST((doc_id // 25) % 5 AS INT))
              || chr(97 + CAST((doc_id // 5) % 5 AS INT))
              || chr(97 + CAST(doc_id % 5 AS INT)) AS w
          FROM documents
          UNION ALL
          SELECT chr(97 + CAST((doc_id // 625) % 5 AS INT))
              || chr(97 + CAST((doc_id // 125) % 5 AS INT))
              || chr(97 + CAST((doc_id // 25) % 5 AS INT))
              || chr(97 + CAST((doc_id // 5) % 5 AS INT))
          FROM documents WHERE doc_id % 7 = 0),
        t AS MATERIALIZED (SELECT DISTINCT w FROM s)
        SELECT a.w AS a, b.w AS b
        FROM t a JOIN t b
          ON a.w < b.w AND levenshtein(a.w, b.w) <= 1
        ORDER BY a, b"""

    out["q135_user_features"] = """
        WITH s AS (SELECT user_id,
                     epoch_us(ts) AS tu,
                     epoch_us(ts) // 86400000000 AS day,
                     lag(epoch_us(ts)) OVER (
                       PARTITION BY user_id ORDER BY ts) AS prev
                   FROM events)
        SELECT user_id,
          CAST(count(*) AS BIGINT) AS n_events,
          CAST(1 + sum(CASE WHEN prev IS NOT NULL
                             AND tu - prev > 14400000000
                            THEN 1 ELSE 0 END) AS BIGINT)
            AS n_sessions,
          CAST(count(DISTINCT day) AS BIGINT) AS days_active,
          CAST(max(day) AS BIGINT) AS last_day,
          CAST(coalesce(median(tu - prev), -1.0) AS DOUBLE)
            AS median_gap_us
        FROM s GROUP BY user_id ORDER BY user_id"""

    out["q136_multikey_join"] = """
        WITH d AS (SELECT event_id, user_id,
                     epoch_us(ts) // 86400000000 AS day
                   FROM events)
        SELECT event_id, user_id, CAST(day AS BIGINT) AS day,
               CAST(count(*) OVER (PARTITION BY user_id, day)
                    AS BIGINT) AS n_day
        FROM d ORDER BY event_id"""

    out["q137_group_weighted_sample"] = """
        WITH h AS (SELECT doc_id, source,
                     CAST(n_chars + 1 AS BIGINT) AS w,
                     md5_number_lower('s0:' || CAST(doc_id AS VARCHAR))
                       AS hh
                   FROM documents),
        k AS (SELECT doc_id, source, w,
                CAST(floor(ln((CAST(hh AS DOUBLE) + 1)
                     / 18446744073709551616.0) * 1000000000)
                  AS BIGINT) AS L
              FROM h)
        SELECT doc_id, source, w,
               CAST(L AS DOUBLE) / CAST(w AS DOUBLE) AS key
        FROM k
        QUALIFY row_number() OVER (PARTITION BY source
          ORDER BY CAST(L AS DOUBLE) / CAST(w AS DOUBLE) DESC,
                   doc_id) <= 20
        ORDER BY source, key DESC, doc_id"""

    out["q138_histogram"] = """
        WITH s AS (SELECT min(value) AS mn, max(value) AS mx
                   FROM events),
        b AS (SELECT least(greatest(CAST(floor(
                (e.value - s.mn) / (s.mx - s.mn) * 32) AS BIGINT),
                0), 31) AS bin
              FROM events e, s),
        c AS (SELECT bin, CAST(count(*) AS BIGINT) AS n
              FROM b GROUP BY bin),
        g AS (SELECT CAST(u.b AS BIGINT) AS bin
              FROM unnest(range(0, 32)) AS u(b))
        SELECT g.bin,
               s.mn + g.bin * ((s.mx - s.mn) / 32) AS lo,
               s.mn + (g.bin + 1) * ((s.mx - s.mn) / 32) AS hi,
               coalesce(c.n, 0) AS n
        FROM g CROSS JOIN s LEFT JOIN c ON g.bin = c.bin
        ORDER BY g.bin"""

    out["q139_ntile"] = """
        SELECT event_id, value,
               CAST(ntile(10) OVER (ORDER BY value, event_id)
                    AS BIGINT) AS tile
        FROM events ORDER BY event_id"""

    out["q140_event_paths"] = """
        WITH s AS (SELECT user_id, event_type,
                     lead(event_type, 1) OVER (
                       PARTITION BY user_id ORDER BY ts) AS t2,
                     lead(event_type, 2) OVER (
                       PARTITION BY user_id ORDER BY ts) AS t3
                   FROM events)
        SELECT event_type AS s1, t2 AS s2, t3 AS s3,
               CAST(count(*) AS BIGINT) AS n
        FROM s WHERE t2 IS NOT NULL AND t3 IS NOT NULL
        GROUP BY 1, 2, 3 ORDER BY n DESC, s1, s2, s3"""

    out["q141_ddsketch"] = """
        WITH b AS (
          SELECT CASE WHEN value > 0 THEN 1
                      WHEN value < 0 THEN -1 ELSE 0 END AS sign,
                 CASE WHEN value = 0 THEN 0
                      ELSE CAST(ceil(8 * log2(abs(value)))
                                AS BIGINT) END AS bucket
          FROM events WHERE value IS NOT NULL),
        c AS (SELECT sign, bucket, count(*) AS n
              FROM b GROUP BY 1, 2),
        o AS (SELECT sign, bucket,
                     sum(n) OVER (ORDER BY sign, sign * bucket
                                  ROWS UNBOUNDED PRECEDING) AS cum
              FROM c),
        t AS (SELECT count(*) AS N FROM b),
        qs(q, num, den) AS (VALUES
          ('1/100', 1, 100), ('1/4', 1, 4), ('1/2', 1, 2),
          ('3/4', 3, 4), ('9/10', 9, 10), ('99/100', 99, 100)),
        sel AS (
          SELECT qs.q, o.sign, o.bucket, o.cum,
                 row_number() OVER (PARTITION BY qs.q
                   ORDER BY o.sign, o.sign * o.bucket) AS rn
          FROM qs CROSS JOIN t
          JOIN o ON o.cum >= (t.N - 1) * qs.num // qs.den + 1)
        SELECT q, sign, bucket, CAST(cum AS BIGINT) AS n_le
        FROM sel WHERE rn = 1 ORDER BY q"""

    out["q161_ddsketch_incremental"] = out["q141_ddsketch"]

    out["q162_trimmed_mean"] = """
        WITH b AS (
          SELECT event_type, event_id,
                 CAST(floor(value * 100) AS BIGINT) AS q
          FROM events),
        r AS (SELECT event_type, q,
                     row_number() OVER (PARTITION BY event_type
                       ORDER BY q, event_id) AS rn,
                     count(*) OVER (PARTITION BY event_type) AS n
              FROM b)
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_kept,
               CAST(sum(q) AS BIGINT) AS sum_q
        FROM r
        WHERE rn > n * 1 // 10 AND rn <= n - n * 1 // 10
        GROUP BY event_type ORDER BY event_type"""

    out["q163_host_dup_rate"] = """
        WITH k AS (
          SELECT 'site' || CAST(doc_id % 20 AS VARCHAR) || '.example'
                   AS host,
                 md5(coalesce(text, '')) AS h
          FROM documents)
        SELECT host,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(count(DISTINCT h) AS BIGINT) AS n_distinct
        FROM k GROUP BY host ORDER BY host"""



    out["q142_bfs"] = """
        WITH nn AS (SELECT count(*) AS n,
                      greatest(count(*) // 10, 8) AS c
                    FROM documents),
        raw AS (
          SELECT doc_id AS s, (doc_id * 7 + 1) % nn.n AS t
          FROM documents, nn
          UNION ALL
          SELECT doc_id, doc_id % nn.c FROM documents, nn
          UNION ALL
          SELECT doc_id, (doc_id + j.j) % nn.c
          FROM documents, nn,
               (VALUES (1), (2), (3), (4), (5), (6)) AS j(j)
          WHERE doc_id < nn.c),
        e0 AS MATERIALIZED (SELECT DISTINCT least(s, t) AS a,
                 greatest(s, t) AS b
               FROM raw WHERE s <> t),
        d0 AS (SELECT CAST(0 AS BIGINT) AS node),
        r1 AS MATERIALIZED (
          SELECT DISTINCT x.node FROM (
            SELECT e.b AS node FROM e0 e JOIN d0 ON e.a = d0.node
            UNION ALL
            SELECT e.a FROM e0 e JOIN d0 ON e.b = d0.node) x
          WHERE x.node NOT IN (SELECT node FROM d0)),
        k1 AS (SELECT node FROM d0 UNION ALL SELECT node FROM r1),
        r2 AS MATERIALIZED (
          SELECT DISTINCT x.node FROM (
            SELECT e.b AS node FROM e0 e JOIN r1 ON e.a = r1.node
            UNION ALL
            SELECT e.a FROM e0 e JOIN r1 ON e.b = r1.node) x
          WHERE x.node NOT IN (SELECT node FROM k1)),
        k2 AS (SELECT node FROM k1 UNION ALL SELECT node FROM r2),
        r3 AS MATERIALIZED (
          SELECT DISTINCT x.node FROM (
            SELECT e.b AS node FROM e0 e JOIN r2 ON e.a = r2.node
            UNION ALL
            SELECT e.a FROM e0 e JOIN r2 ON e.b = r2.node) x
          WHERE x.node NOT IN (SELECT node FROM k2))
        SELECT node, CAST(d AS BIGINT) AS dist FROM (
          SELECT node, 0 AS d FROM d0
          UNION ALL SELECT node, 1 FROM r1
          UNION ALL SELECT node, 2 FROM r2
          UNION ALL SELECT node, 3 FROM r3)
        ORDER BY node"""

    _bh_host, _bh_cond = __import__(
        "mapshaper_ray.stages.pages", fromlist=["blocked_hosts_sql"]) \
        .blocked_hosts_sql(
            ["site7.example", "site13.example", "ads.site21.example"],
            url_col="url")
    out["q143_url_blocklist"] = """
        WITH u AS (
          SELECT doc_id,
                 'http://' ||
                 CASE WHEN doc_id % 3 = 0 THEN 'www.'
                      WHEN doc_id % 3 = 1 THEN 'Ads.' ELSE '' END ||
                 'Site' || CAST(doc_id % 40 AS VARCHAR) || '.example' ||
                 CASE WHEN doc_id % 4 = 0 THEN ':80' ELSE '' END ||
                 '/p/' || CAST(doc_id AS VARCHAR) AS url
          FROM documents),
        h AS (SELECT doc_id, __BH_HOST__ AS host FROM u)
        SELECT doc_id, host FROM h
        WHERE NOT __BH_COND__
        ORDER BY doc_id""".replace("__BH_HOST__", _bh_host) \
        .replace("__BH_COND__", _bh_cond)

    out["q144_resample"] = """
        WITH b AS (
          SELECT event_type,
                 epoch_us(ts) // 86400000000 AS bk,
                 CAST(floor(value * 100) AS BIGINT) AS q
          FROM events),
        agg AS (SELECT event_type, bk, count(*) AS n, sum(q) AS sq
                FROM b GROUP BY 1, 2),
        rng AS (SELECT min(bk) AS lo, max(bk) AS hi FROM b),
        cal AS (SELECT u.bk FROM rng,
                  unnest(generate_series(rng.lo, rng.hi)) AS u(bk)),
        ks AS (SELECT DISTINCT event_type FROM b)
        SELECT ks.event_type,
               make_timestamp(cal.bk * 86400000000) AS bucket_ts,
               CAST(coalesce(agg.n, 0) AS BIGINT) AS n,
               CAST(coalesce(agg.sq, 0) AS BIGINT) AS sum_q
        FROM ks CROSS JOIN cal
        LEFT JOIN agg ON agg.event_type = ks.event_type
                     AND agg.bk = cal.bk
        ORDER BY ks.event_type, cal.bk"""

    out["q145_skipgram"] = r"""
        WITH t AS (SELECT doc_id,
                     regexp_extract_all(coalesce(text, ''), '\S+') AS ts
                   FROM documents),
        p AS (SELECT doc_id, u.i AS i, ts[u.i] AS w
              FROM t, unnest(generate_series(1, len(ts))) AS u(i)),
        pr AS (SELECT least(a.w, b.w) AS w1, greatest(a.w, b.w) AS w2
               FROM p a JOIN p b
                 ON a.doc_id = b.doc_id AND b.i > a.i
                AND b.i <= a.i + 2)
        SELECT w1, w2, CAST(count(*) AS BIGINT) AS n
        FROM pr GROUP BY 1, 2 HAVING count(*) >= 5
        ORDER BY n DESC, w1, w2"""


    out["q146_group_ddsketch"] = """
        WITH b AS (
          SELECT event_type,
                 CASE WHEN value > 0 THEN 1
                      WHEN value < 0 THEN -1 ELSE 0 END AS sign,
                 CASE WHEN value = 0 THEN 0
                      ELSE CAST(ceil(8 * log2(abs(value)))
                                AS BIGINT) END AS bucket
          FROM events WHERE value IS NOT NULL),
        c AS (SELECT event_type, sign, bucket, count(*) AS n
              FROM b GROUP BY 1, 2, 3),
        o AS (SELECT event_type, sign, bucket,
                     sum(n) OVER (PARTITION BY event_type
                                  ORDER BY sign, sign * bucket
                                  ROWS UNBOUNDED PRECEDING) AS cum
              FROM c),
        t AS (SELECT event_type, count(*) AS N FROM b GROUP BY 1),
        qs(q, num, den) AS (VALUES
          ('1/2', 1, 2), ('19/20', 19, 20), ('99/100', 99, 100)),
        sel AS (
          SELECT t.event_type, qs.q, o.sign, o.bucket, o.cum,
                 row_number() OVER (PARTITION BY t.event_type, qs.q
                   ORDER BY o.sign, o.sign * o.bucket) AS rn
          FROM qs CROSS JOIN t
          JOIN o ON o.event_type = t.event_type
                AND o.cum >= (t.N - 1) * qs.num // qs.den + 1)
        SELECT event_type, q, sign, bucket, CAST(cum AS BIGINT) AS n_le
        FROM sel WHERE rn = 1 ORDER BY event_type, q"""

    out["q147_rrf"] = """
        WITH__RANK_A__,__RANK_B__
        SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
               round(coalesce(1.0 / (60 + a.r), 0)
                     + coalesce(1.0 / (60 + b.r), 0), 9) AS rrf
        FROM rank_a a FULL OUTER JOIN rank_b b USING (doc_id)
        ORDER BY coalesce(1.0 / (60 + a.r), 0)
                 + coalesce(1.0 / (60 + b.r), 0) DESC, doc_id
        LIMIT 20"""

    out["q147_rrf"] = out["q147_rrf"] \
        .replace("__RANK_A__", _RRF_RANK_A) \
        .replace("__RANK_B__", _RRF_RANK_B)

    out["q148_anomaly"] = """
        WITH b AS (SELECT event_type, event_id,
                     CAST(floor(value * 100) AS BIGINT) AS q
                   FROM events),
        g AS (SELECT event_type,
                     CAST(count(*) AS HUGEINT) AS n,
                     CAST(sum(q) AS HUGEINT) AS s,
                     sum(CAST(q AS HUGEINT) * q) AS qq
              FROM b GROUP BY 1)
        SELECT b.event_type, b.event_id, b.q
        FROM b JOIN g USING (event_type)
        WHERE (g.n - 1) * (g.n * b.q - g.s) * (g.n * b.q - g.s)
              > 9 * g.n * (g.n * g.qq - g.s * g.s)
        ORDER BY b.event_type, b.q, b.event_id"""

    out["q149_pool_embeddings"] = """
        WITH x AS (
          SELECT CAST(label AS BIGINT) AS label, u.i - 1 AS dim,
                 CAST(floor(CAST(embedding[u.i] AS DOUBLE) * 1048576)
                      AS BIGINT) AS q
          FROM embeddings,
               unnest(generate_series(1, len(embedding))) AS u(i))
        SELECT label, CAST(dim AS BIGINT) AS dim,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(q) // count(*) AS BIGINT) AS pooled_q
        FROM x GROUP BY label, dim ORDER BY label, dim"""

    out["q150_web_curation"] = """
        WITH u AS (
          SELECT doc_id, text,
                 'http://' ||
                 CASE WHEN doc_id % 3 = 0 THEN 'www.'
                      WHEN doc_id % 3 = 1 THEN 'Ads.' ELSE '' END ||
                 'Site' || CAST(doc_id % 40 AS VARCHAR) || '.example' ||
                 CASE WHEN doc_id % 4 = 0 THEN ':80' ELSE '' END ||
                 '/p/' || CAST(doc_id % 97 AS VARCHAR) AS url
          FROM documents),
        h AS (SELECT doc_id, text, url, __BH_HOST__ AS host FROM u),
        kept AS (SELECT * FROM h WHERE NOT __BH_COND__),
        norm AS (SELECT doc_id, text, host, __NORM__ AS url_norm
                 FROM kept),
        ud AS (SELECT * FROM norm
               QUALIFY row_number() OVER (PARTITION BY url_norm
                                          ORDER BY doc_id) = 1),
        td AS (SELECT * FROM ud
               QUALIFY row_number() OVER (PARTITION BY md5(text)
                                          ORDER BY doc_id) = 1),
        sel AS (
          SELECT doc_id, host, url_norm,
                 CAST(len(regexp_extract_all(coalesce(text, ''),
                                             '\\S+')) AS BIGINT)
                   AS n_words
          FROM td)
        SELECT doc_id, host, url_norm, n_words
        FROM sel WHERE n_words >= 50
        ORDER BY doc_id""".replace("__BH_HOST__", _bh_host) \
        .replace("__BH_COND__", _bh_cond) \
        .replace("__NORM__", __import__(
            "mapshaper_ray.stages.pages",
            fromlist=["url_normalize_sql"]).url_normalize_sql("url"))

    out["q151_grouped_cumsum"] = """
        WITH b AS (SELECT user_id, event_id, ts,
                     CAST(floor(value * 100) AS BIGINT) AS q
                   FROM events)
        SELECT user_id, event_id,
               CAST(sum(q) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT)
                 AS cum_q
        FROM b ORDER BY user_id, event_id"""

    out["q152_containment"] = r"""
        WITH toks AS (
          SELECT doc_id, regexp_extract_all(text, '\S+') AS ts
          FROM documents),
        sh AS (SELECT doc_id,
                      list_distinct(
    CASE WHEN len(ts) = 0 THEN [CAST(0 AS UBIGINT)]
         WHEN len(ts) < 3
           THEN [md5_number_lower(array_to_string(ts, chr(31)))]
         ELSE list_transform(generate_series(1, len(ts) - 2),
                i -> md5_number_lower(
                    array_to_string(ts[i:i+2], chr(31))))
    END) AS s
               FROM toks),
        ex AS (SELECT doc_id, unnest(s) AS h FROM sh),
        inter AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                 CAST(count(*) AS BIGINT) AS n_inter
          FROM ex a JOIN ex b ON a.h = b.h AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
        sz AS (SELECT doc_id, len(s) AS n FROM sh)
        SELECT id_a, id_b, n_inter,
               CAST(na.n AS BIGINT) AS n_a, CAST(nb.n AS BIGINT) AS n_b,
               round(greatest(CAST(n_inter AS DOUBLE) / na.n,
                              CAST(n_inter AS DOUBLE) / nb.n), 6)
                 AS cont
        FROM inter JOIN sz na ON id_a = na.doc_id
                   JOIN sz nb ON id_b = nb.doc_id
        WHERE greatest(CAST(n_inter AS DOUBLE) / na.n,
                       CAST(n_inter AS DOUBLE) / nb.n) >= 0.8
        ORDER BY id_a, id_b"""

    out["q153_grouping_sets"] = """
        SELECT coalesce(lang, '(all)') AS lang,
               coalesce(source, '(all)') AS source,
               CAST(count(n_chars) AS BIGINT) AS n,
               CAST(sum(n_chars) AS BIGINT) AS sum_chars
        FROM documents
        GROUP BY GROUPING SETS ((lang, source), (lang), (source))
        ORDER BY 1, 2"""

    out["q154_char_entropy"] = """
        WITH ch AS (
          SELECT doc_id, unnest(string_split(text, '')) AS c
          FROM documents WHERE text IS NOT NULL AND text <> ''),
        cc AS (SELECT doc_id, c, count(*) AS cnt
               FROM ch GROUP BY 1, 2),
        s AS (SELECT doc_id, sum(cnt) AS n,
                     sum(cnt * CAST(floor(ln(cnt) * 1000000000)
                                    AS BIGINT)) AS sub
              FROM cc GROUP BY 1)
        SELECT d.doc_id,
               CAST(coalesce(s.n, 0) AS BIGINT) AS n_chars_cp,
               CAST(CASE WHEN s.n IS NULL THEN 0
                    ELSE s.n * CAST(floor(ln(s.n) * 1000000000)
                                    AS BIGINT) - s.sub END
                    AS BIGINT) AS ent_q
        FROM documents d LEFT JOIN s USING (doc_id)
        ORDER BY d.doc_id"""

    out["q155_boilerplate"] = """
        WITH p AS (
          SELECT doc_id,
                 'site' || CAST(doc_id % 20 AS VARCHAR) || '.example'
                   AS host,
                 'NAV home about site' || CAST(doc_id % 20 AS VARCHAR)
                   || '.example' || chr(10) ||
                 CASE WHEN doc_id % 3 = 0
                      THEN 'PROMO subscribe now' || chr(10)
                      ELSE '' END ||
                 coalesce(text, '') || chr(10) ||
                 'COPYRIGHT 2024 site' || CAST(doc_id % 20 AS VARCHAR)
                   || '.example' AS text
          FROM documents),
        sp AS (SELECT doc_id, host,
                      string_split(text, chr(10)) AS ls
               FROM p),
        ln AS (SELECT doc_id, host, u.i AS pos, ls[u.i] AS line
               FROM sp, unnest(generate_series(1, len(ls))) AS u(i)),
        d AS (SELECT host, line,
                     count(DISTINCT doc_id) AS n_docs
              FROM ln GROUP BY 1, 2),
        hp AS (SELECT host, count(*) AS n_pages FROM p GROUP BY 1),
        bl AS (SELECT d.host, d.line
               FROM d JOIN hp USING (host)
               WHERE n_docs >= 2 AND n_docs * 10 >= 3 * n_pages),
        kept AS (SELECT l.doc_id, l.pos, l.line
                 FROM ln l ANTI JOIN bl b
                   ON l.host = b.host AND l.line = b.line),
        agg AS (SELECT doc_id,
                       string_agg(line, chr(10) ORDER BY pos) AS txt
                FROM kept GROUP BY doc_id)
        SELECT p.doc_id, p.host,
               coalesce(agg.txt, '') AS text_clean
        FROM p LEFT JOIN agg USING (doc_id)
        ORDER BY p.doc_id"""

    out["q156_phash_dedup"] = """
        WITH media AS (
          SELECT doc_id AS media_id,
                 substring(repeat(lower(md5(text)),
                                  4 + length(text) % 64),
                           1, 512) AS head
          FROM documents),
        b AS (SELECT media_id,
                     ('0x' || substring(md5(head), 1, 8))::BIGINT
                       AS base
              FROM media),
        c AS (SELECT media_id, u.j AS j,
                     (b.base * u.j) % 1000003 AS cell
              FROM b, unnest(generate_series(1, 64)) AS u(j)),
        t AS (SELECT media_id, sum(cell) AS total FROM c
              GROUP BY 1),
        h AS (SELECT c.media_id,
                     sum(CASE WHEN c.j <= 32 AND c.cell * 64 > t.total
                         THEN (CAST(1 AS BIGINT) << (c.j - 1))
                         ELSE 0 END) AS phash_lo,
                     sum(CASE WHEN c.j > 32 AND c.cell * 64 > t.total
                         THEN (CAST(1 AS BIGINT) << (c.j - 33))
                         ELSE 0 END) AS phash_hi
              FROM c JOIN t USING (media_id) GROUP BY 1)
        SELECT CAST(phash_hi AS BIGINT) AS phash_hi,
               CAST(phash_lo AS BIGINT) AS phash_lo,
               CAST(min(media_id) AS BIGINT) AS first_media,
               CAST(count(*) AS BIGINT) AS n_dups
        FROM h GROUP BY 1, 2 HAVING count(*) >= 2
        ORDER BY phash_hi, phash_lo"""

    out["q164_phash_near_dup"] = """
        -- brute-force hamming<=3 pair scan over the same fake aHash
        -- + per-image bit flip the engine's banded search uses
        WITH media AS (
          SELECT doc_id AS media_id,
                 substring(repeat(lower(md5(text)),
                                  4 + length(text) % 64),
                           1, 512) AS head
          FROM documents),
        b AS (SELECT media_id,
                     ('0x' || substring(md5(head), 1, 8))::BIGINT
                       AS base
              FROM media),
        c AS (SELECT media_id, u.j AS j,
                     (b.base * u.j) % 1000003 AS cell
              FROM b, unnest(generate_series(1, 64)) AS u(j)),
        t AS (SELECT media_id, sum(cell) AS total FROM c
              GROUP BY 1),
        h AS (SELECT c.media_id,
                     CAST(sum(CASE WHEN c.j <= 32
                              AND c.cell * 64 > t.total
                         THEN (CAST(1 AS BIGINT) << (c.j - 1))
                         ELSE 0 END) AS BIGINT) AS lo,
                     CAST(sum(CASE WHEN c.j > 32
                              AND c.cell * 64 > t.total
                         THEN (CAST(1 AS BIGINT) << (c.j - 33))
                         ELSE 0 END) AS BIGINT) AS hi
              FROM c JOIN t USING (media_id) GROUP BY 1),
        p AS (SELECT media_id,
                     CASE WHEN media_id % 64 < 32
                          THEN xor(lo, CAST(1 AS BIGINT)
                                       << CAST(media_id % 64 AS INT))
                          ELSE lo END AS lo,
                     CASE WHEN media_id % 64 >= 32
                          THEN xor(hi, CAST(1 AS BIGINT)
                                   << CAST(media_id % 64 - 32 AS INT))
                          ELSE hi END AS hi
              FROM h)
        SELECT a.media_id AS id_a, b2.media_id AS id_b,
               CAST(bit_count(xor(a.lo, b2.lo))
                    + bit_count(xor(a.hi, b2.hi)) AS BIGINT)
                 AS hamming
        FROM p a JOIN p b2 ON a.media_id < b2.media_id
        WHERE bit_count(xor(a.lo, b2.lo))
              + bit_count(xor(a.hi, b2.hi)) <= 3
        ORDER BY id_a, id_b"""

    out["q166_theta_sketch"] = """
        -- KMV/theta mirror: k smallest distinct md5 hashes per set,
        -- integer estimator (k-1)*2^64 // h_k (exact count below k),
        -- union = k-min of merged sketches, intersection support
        -- m = |kmin(A u B) ^ skA ^ skB|
        WITH a AS (SELECT DISTINCT md5_number_lower(text) AS h
                   FROM documents WHERE doc_id % 2 = 0),
        b AS (SELECT DISTINCT md5_number_lower(text) AS h
              FROM documents WHERE doc_id % 3 = 0),
        ka AS (SELECT h FROM a ORDER BY h LIMIT 64),
        kb AS (SELECT h FROM b ORDER BY h LIMIT 64),
        ku AS (SELECT h FROM (SELECT h FROM ka UNION
                              SELECT h FROM kb) ORDER BY h LIMIT 64),
        est AS (SELECT
          (SELECT count(*) FROM ka) AS ca,
          (SELECT count(*) FROM kb) AS cb,
          (SELECT count(*) FROM ku) AS cu,
          (SELECT max(h) FROM ka) AS ha,
          (SELECT max(h) FROM kb) AS hb,
          (SELECT max(h) FROM ku) AS hu,
          (SELECT count(*) FROM ku
           WHERE h IN (SELECT h FROM ka)
             AND h IN (SELECT h FROM kb)) AS m),
        ests AS (SELECT
          CAST(cu AS BIGINT) AS k_used,
          CAST(CASE WHEN ca < 64 THEN ca ELSE
            63 * CAST(18446744073709551616 AS HUGEINT)
              // CAST(ha AS HUGEINT) END AS BIGINT) AS n_a_est,
          CAST(CASE WHEN cb < 64 THEN cb ELSE
            63 * CAST(18446744073709551616 AS HUGEINT)
              // CAST(hb AS HUGEINT) END AS BIGINT) AS n_b_est,
          CAST(CASE WHEN cu < 64 THEN cu ELSE
            63 * CAST(18446744073709551616 AS HUGEINT)
              // CAST(hu AS HUGEINT) END AS BIGINT) AS union_est,
          CAST(m AS BIGINT) AS m_inter, cu, m
          FROM est)
        SELECT k_used, n_a_est, n_b_est, union_est, m_inter,
               CAST(CASE WHEN cu > 0 THEN
                 (m * CAST(union_est AS HUGEINT)) // cu
                 ELSE 0 END AS BIGINT) AS inter_est
        FROM ests"""

    out["q167_group_corr"] = """
        -- one-pass integer sufficient statistics; HUGEINT products,
        -- one double division + sqrt at the end (IEEE-identical to
        -- the engine's Python-int path)
        WITH b AS (SELECT event_type,
                          CAST((epoch_us(ts) // 3600000000) % 24
                               AS BIGINT) AS x,
                          CAST(floor(value * 100) AS BIGINT) AS y
                   FROM events),
        g AS (SELECT event_type,
                     CAST(count(*) AS HUGEINT) AS n,
                     CAST(sum(x) AS HUGEINT) AS sx,
                     CAST(sum(y) AS HUGEINT) AS sy,
                     CAST(sum(x*y) AS HUGEINT) AS sxy,
                     CAST(sum(x*x) AS HUGEINT) AS sxx,
                     CAST(sum(y*y) AS HUGEINT) AS syy
              FROM b GROUP BY event_type)
        SELECT event_type, CAST(n AS BIGINT) AS n,
               round(CAST(n*sxy - sx*sy AS DOUBLE) /
                     sqrt(CAST((n*sxx - sx*sx) * (n*syy - sy*sy)
                               AS DOUBLE)), 9) AS r
        FROM g
        WHERE (n*sxx - sx*sx) != 0 AND (n*syy - sy*sy) != 0
        ORDER BY event_type"""

    out["q168_scd2"] = """
        -- SCD-2 LEAD mirror with the 2100-01-01 close-out sentinel
        WITH b AS (SELECT user_id, ts,
                          CAST(floor(value * 100) AS BIGINT) AS v_q
                   FROM events)
        SELECT user_id, ts AS valid_from,
               coalesce(LEAD(ts) OVER (PARTITION BY user_id
                                       ORDER BY ts, v_q),
                        TIMESTAMP '2100-01-01') AS valid_to,
               v_q
        FROM b ORDER BY user_id, valid_from, v_q"""

    out["q169_time_weighted"] = """
        -- LOCF time-weighted integral per user: wsum = sum(v * dt)
        -- over consecutive observation pairs (LEAD), span = last -
        -- first; single-observation users report (1, 0, 0)
        WITH b AS (SELECT user_id, epoch_us(ts) AS e,
                          CAST(floor(value * 100) AS BIGINT) AS q
                   FROM events),
        o AS (SELECT user_id, e, q,
                     LEAD(e) OVER (PARTITION BY user_id
                                   ORDER BY e, q) AS ne
              FROM b)
        SELECT user_id, CAST(count(*) AS BIGINT) AS n,
               CAST(max(e) - min(e) AS BIGINT) AS span_us,
               CAST(coalesce(sum(q * (ne - e)), 0) AS BIGINT) AS wsum
        FROM o GROUP BY user_id ORDER BY user_id"""

    out["q170_skew_join"] = """
        -- the salted join must equal the PLAIN join (salting is an
        -- execution detail): 60% of lineitem on one hot key
        WITH l AS (SELECT CASE WHEN l_orderkey % 10 < 6 THEN 0
                               ELSE l_orderkey % 25 END AS k,
                          CAST(floor(l_extendedprice * 100) AS BIGINT)
                            AS pq
                   FROM lineitem)
        SELECT n_name, CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(pq) AS BIGINT) AS sum_price_q
        FROM l JOIN nation ON l.k = nation.n_nationkey
        GROUP BY n_name ORDER BY n_name"""

    out["q171_connected_components"] = """
        -- min-label transitive closure (recursive CTE) over the same
        -- doc-derived undirected edges
        WITH RECURSIVE base AS (
          SELECT DISTINCT doc_id % 997 AS a,
                 ((doc_id % 997) + 1 + (doc_id * 3) % 996) % 997 AS b
          FROM documents),
        und AS (SELECT a AS u, b AS v FROM base
                UNION SELECT b, a FROM base),
        reach(u, l) AS (
          SELECT u, u FROM (SELECT u FROM und
                            UNION SELECT v FROM und)
          UNION
          SELECT und.v, reach.l FROM reach
          JOIN und ON und.u = reach.u)
        SELECT CAST(u AS BIGINT) AS node,
               CAST(min(l) AS BIGINT) AS cluster_id
        FROM reach GROUP BY u ORDER BY node"""

    out["q172_interval_join"] = """
        -- plain inequality overlap join (inclusive bounds); the
        -- engine's grid-cell emit + start-cell dedup must match it
        WITH a AS (SELECT event_id AS a_id, epoch_us(ts) AS lo,
                          epoch_us(ts) + CAST(
                            (1 + CAST(floor(value) AS BIGINT) % 10)
                            * 60000000 AS BIGINT) AS hi
                   FROM events),
        b AS (SELECT event_id AS b_id, epoch_us(ts) AS lo,
                     epoch_us(ts) + 7200000000 AS hi
              FROM events WHERE event_id % 100 = 0)
        SELECT a.a_id, b.b_id,
               CAST(least(a.hi, b.hi) - greatest(a.lo, b.lo)
                    AS BIGINT) AS overlap_us
        FROM a JOIN b ON a.lo <= b.hi AND b.lo <= a.hi
        ORDER BY a_id, b_id"""

    out["q173_profile"] = """
        -- per-column rows/nulls/exact distinct, unioned in column
        -- order (the engine hashes values with md5_number_lower of
        -- the string form; distinct-by-hash == distinct-by-value
        -- absent a 52-bit collision)
        SELECT 'l_orderkey' AS "column",
               CAST(count(*) AS BIGINT) AS n,
               CAST(count(*) - count(l_orderkey) AS BIGINT) AS n_null,
               CAST(count(DISTINCT l_orderkey) AS BIGINT)
                 AS n_distinct
        FROM lineitem
        UNION ALL
        SELECT 'l_partkey', CAST(count(*) AS BIGINT),
               CAST(count(*) - count(l_partkey) AS BIGINT),
               CAST(count(DISTINCT l_partkey) AS BIGINT)
        FROM lineitem
        UNION ALL
        SELECT 'l_returnflag', CAST(count(*) AS BIGINT),
               CAST(count(*) - count(l_returnflag) AS BIGINT),
               CAST(count(DISTINCT l_returnflag) AS BIGINT)
        FROM lineitem
        UNION ALL
        SELECT 'l_linestatus', CAST(count(*) AS BIGINT),
               CAST(count(*) - count(l_linestatus) AS BIGINT),
               CAST(count(DISTINCT l_linestatus) AS BIGINT)
        FROM lineitem"""

    out["q174_cdc_apply"] = """
        -- last operation per entity wins; deletes drop the key
        WITH c AS (SELECT user_id % 200 AS entity, ts,
                          CASE WHEN event_type = 'error' THEN 'D'
                               ELSE 'U' END AS op,
                          CAST(floor(value * 100) AS BIGINT) AS v_q
                   FROM events),
        r AS (SELECT entity, op, v_q,
                     row_number() OVER (PARTITION BY entity
                       ORDER BY ts DESC, v_q DESC, op DESC) AS rn
              FROM c)
        SELECT CAST(entity AS BIGINT) AS entity, v_q
        FROM r WHERE rn = 1 AND op != 'D'
        ORDER BY entity"""

    out["q175_hexbin"] = f"""
        -- axial hex assignment with the shared floor(v+0.5) cube
        -- round (fix the coordinate that moved farthest; x > z
        -- priority as in cells.lonlat_to_hex)
        WITH {_GEO_CTE},
        f AS (SELECT doc_id, n_chars,
                     (1.7320508075688772 / 3 * lon - lat / 3) / 5.0
                       AS xf,
                     (2 * lat / 3) / 5.0 AS zf
              FROM geo),
        g AS (SELECT doc_id, n_chars, xf, zf, -xf - zf AS yf,
                     floor(xf + 0.5) AS rx, floor(-xf - zf + 0.5)
                       AS ry, floor(zf + 0.5) AS rz
              FROM f),
        d AS (SELECT doc_id, n_chars, rx, ry, rz,
                     abs(rx - xf) AS dx, abs(ry - yf) AS dy,
                     abs(rz - zf) AS dz
              FROM g),
        h AS (SELECT doc_id, n_chars,
                     CASE WHEN dx > dy AND dx > dz THEN -ry - rz
                          ELSE rx END AS hq,
                     CASE WHEN NOT (dx > dy AND dx > dz)
                               AND dz > dy THEN -rx - ry
                          ELSE rz END AS hr
              FROM d)
        SELECT CAST(hq AS BIGINT) AS hq, CAST(hr AS BIGINT) AS hr,
               CAST(count(*) AS BIGINT) AS n_pages,
               CAST(sum(n_chars) AS BIGINT) AS sum_chars
        FROM h GROUP BY 1, 2 ORDER BY hq, hr"""

    out["q176_compaction_plan"] = """
        -- linear packing mirror: window cumsum in (size DESC, name)
        WITH m AS (SELECT 'part-' || CAST(doc_id AS VARCHAR) AS file,
                          CAST(n_chars AS BIGINT) AS size
                   FROM documents),
        o AS (SELECT file, size,
                     sum(size) OVER (ORDER BY size DESC, file
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) AS cum
              FROM m)
        SELECT file, size,
               CAST((cum - size) // 50000 AS BIGINT) AS bin
        FROM o ORDER BY size DESC, file"""

    out["q177_grouped_window"] = """
        WITH b AS (SELECT event_id, user_id, ts,
                          CAST(floor(value * 100) AS BIGINT) AS v
                   FROM events)
        SELECT event_id, user_id,
               CAST(SUM(v) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id
                                 ROWS BETWEEN 4 PRECEDING
                                 AND CURRENT ROW) AS BIGINT) AS wsum_q
        FROM b ORDER BY event_id"""

    out["q178_event_gaps"] = """
        SELECT event_id, user_id,
               CAST(coalesce(epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id), -1)
                 AS BIGINT) AS gap_us
        FROM events ORDER BY event_id"""

    out["q179_crawl_waves"] = """
        WITH p AS (SELECT 'https://site'
                          || CAST(doc_id % 1000 AS VARCHAR)
                          || '.example/p/'
                          || CAST(doc_id AS VARCHAR) AS url,
                          'site' || CAST(doc_id % 1000 AS VARCHAR)
                          || '.example' AS host
                   FROM documents),
        r AS (SELECT url, host,
                     row_number() OVER (PARTITION BY host
                                        ORDER BY url) - 1 AS rk
              FROM p)
        SELECT url, host, CAST(rk // 4 AS BIGINT) AS wave,
               CAST(rk % 4 AS BIGINT) AS slot
        FROM r ORDER BY url"""

    out["q180_mad_outliers"] = """
        -- rank-ELEMENT medians (floor((n-1)/2) in (q, id) order)
        -- keep everything integer; |q - med| > 3 * MAD
        WITH b AS (SELECT event_id, event_type,
                          CAST(floor(value * 100) AS BIGINT) AS q
                   FROM events),
        r1 AS (SELECT *, row_number() OVER (PARTITION BY event_type
                        ORDER BY q, event_id) AS rn,
                      count(*) OVER (PARTITION BY event_type) AS n
               FROM b),
        med AS (SELECT event_type, q AS med_q FROM r1
                WHERE rn - 1 = (n - 1) // 2),
        d AS (SELECT b.event_id, b.event_type, b.q, med.med_q,
                     abs(b.q - med.med_q) AS dev
              FROM b JOIN med USING (event_type)),
        r2 AS (SELECT *, row_number() OVER (PARTITION BY event_type
                        ORDER BY dev, event_id) AS rn,
                      count(*) OVER (PARTITION BY event_type) AS n
               FROM d),
        mad AS (SELECT event_type, dev AS mad_q FROM r2
                WHERE rn - 1 = (n - 1) // 2)
        SELECT d.event_type, d.event_id, d.q, d.med_q, mad.mad_q
        FROM d JOIN mad USING (event_type)
        WHERE d.dev > 3 * mad.mad_q
        ORDER BY event_type, event_id"""

    out["q181_personalized_pagerank"] = """
        -- three unrolled PPR iterations: teleport only to the
        -- doc_id % 17 = 0 seeds (same 3-out-link graph as q62)
        WITH nd AS (SELECT count(*) AS n FROM documents),
        ns AS (SELECT count(*) AS s FROM documents
               WHERE doc_id % 17 = 0),
        nodes AS (SELECT doc_id AS node FROM documents),
        e AS (
          SELECT doc_id AS src, (doc_id * 7 + 1) % nd.n AS dst
          FROM documents, nd
          UNION ALL
          SELECT doc_id, (doc_id * 13 + 5) % nd.n
          FROM documents, nd
          UNION ALL
          SELECT doc_id, (doc_id * 31 + 11) % nd.n
          FROM documents, nd),
        deg AS (SELECT src, count(*) AS c FROM e GROUP BY src),
        ew AS (SELECT e.src, e.dst, 1.0 / deg.c AS w
               FROM e JOIN deg ON e.src = deg.src),
        t AS (SELECT node,
                     CASE WHEN node % 17 = 0 THEN 1.0 / ns.s
                          ELSE 0.0 END AS tv
              FROM nodes, ns),
        r0 AS (SELECT node, tv AS r FROM t),
        r1 AS (SELECT nn.node,
                      (1 - 0.85) * t.tv + 0.85 * coalesce(s.x, 0)
                        AS r
               FROM nodes nn JOIN t ON t.node = nn.node
               LEFT JOIN (SELECT ew.dst AS node,
                                 sum(p.r * ew.w) AS x
                          FROM r0 p JOIN ew ON p.node = ew.src
                          GROUP BY ew.dst) s ON nn.node = s.node),
        r2 AS (SELECT nn.node,
                      (1 - 0.85) * t.tv + 0.85 * coalesce(s.x, 0)
                        AS r
               FROM nodes nn JOIN t ON t.node = nn.node
               LEFT JOIN (SELECT ew.dst AS node,
                                 sum(p.r * ew.w) AS x
                          FROM r1 p JOIN ew ON p.node = ew.src
                          GROUP BY ew.dst) s ON nn.node = s.node),
        r3 AS (SELECT nn.node,
                      (1 - 0.85) * t.tv + 0.85 * coalesce(s.x, 0)
                        AS r
               FROM nodes nn JOIN t ON t.node = nn.node
               LEFT JOIN (SELECT ew.dst AS node,
                                 sum(p.r * ew.w) AS x
                          FROM r2 p JOIN ew ON p.node = ew.src
                          GROUP BY ew.dst) s ON nn.node = s.node)
        SELECT node AS doc_id, round(r, 9) AS rank
        FROM r3 ORDER BY doc_id"""

    out["q182_agg_incremental"] = """
        -- the incrementally-maintained aggregate must equal the
        -- from-scratch aggregate over ALL events
        WITH b AS (SELECT event_type,
                          CAST(floor(value * 100) AS BIGINT) AS q
                   FROM events)
        SELECT event_type, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(q) AS BIGINT) AS sum_q,
               CAST(min(q) AS BIGINT) AS min_q,
               CAST(max(q) AS BIGINT) AS max_q
        FROM b GROUP BY event_type ORDER BY event_type"""

    out["q183_jsonl_roundtrip"] = """
        -- byte fidelity through the JSONL escape/unescape cycle
        SELECT doc_id, lang,
               CAST(length(text) AS BIGINT) AS n_chars2,
               md5(text) AS text_md5
        FROM documents ORDER BY doc_id"""

    out["q184_merge_intervals"] = """
        -- gaps-and-islands: island starts where lo exceeds the
        -- running max hi of all earlier intervals of the key
        WITH i AS (SELECT user_id, epoch_us(ts) AS lo,
                          epoch_us(ts) + 1800000000 AS hi
                   FROM events),
        s AS (SELECT *, max(hi) OVER (PARTITION BY user_id
                       ORDER BY lo, hi
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING) AS pm
              FROM i),
        f AS (SELECT *, CASE WHEN pm IS NULL OR lo > pm THEN 1
                             ELSE 0 END AS st
              FROM s),
        g AS (SELECT *, sum(st) OVER (PARTITION BY user_id
                       ORDER BY lo, hi
                       ROWS UNBOUNDED PRECEDING) AS isl
              FROM f)
        SELECT user_id, CAST(isl AS BIGINT) AS island,
               CAST(min(lo) AS BIGINT) AS start_us,
               CAST(max(hi) AS BIGINT) AS end_us,
               CAST(count(*) AS BIGINT) AS n_merged
        FROM g GROUP BY user_id, isl
        ORDER BY user_id, island"""

    out["q185_winsorize"] = """
        -- percentile-ELEMENT clamp: rank floor((n-1)*p/100) picks in
        -- (q, id) order; least/greatest + HUGEINT sum stays integer
        WITH b AS (SELECT event_id, event_type,
                          CAST(floor(value * 100) AS BIGINT) AS q
                   FROM events),
        r AS (SELECT *, row_number() OVER (PARTITION BY event_type
                       ORDER BY q, event_id) AS rn,
                      count(*) OVER (PARTITION BY event_type) AS n
               FROM b),
        lo AS (SELECT event_type, q AS lo_q FROM r
               WHERE rn - 1 = ((n - 1) * 10) // 100),
        hi AS (SELECT event_type, q AS hi_q FROM r
               WHERE rn - 1 = ((n - 1) * 90) // 100)
        SELECT b.event_type, CAST(count(*) AS BIGINT) AS n,
               lo.lo_q, hi.hi_q,
               CAST(sum(least(greatest(b.q, lo.lo_q), hi.hi_q))
                    AS BIGINT) AS sum_wq
        FROM b JOIN lo USING (event_type) JOIN hi USING (event_type)
        GROUP BY b.event_type, lo.lo_q, hi.hi_q
        ORDER BY event_type"""

    out["q186_trending_terms"] = """
        -- top-5 tokens per (lang, source) by count, token-ascending
        -- tiebreak (the engine's grouped_topk order)
        WITH toks AS (
          SELECT lang, source, u.tok AS token
          FROM documents,
               unnest(string_split(coalesce(text, ''), ' '))
                 AS u(tok)
          WHERE u.tok != ''),
        cnt AS (SELECT lang, source, token,
                       CAST(count(*) AS BIGINT) AS n
                FROM toks GROUP BY 1, 2, 3),
        r AS (SELECT *, row_number() OVER (
                PARTITION BY lang, source
                ORDER BY n DESC, token) AS rn
              FROM cnt)
        SELECT lang, source, token, n FROM r WHERE rn <= 5
        ORDER BY lang, source, token"""

    out["q187_skew_report"] = """
        -- group-size distribution with rank-ELEMENT percentiles in
        -- (size, key) order
        WITH c AS (SELECT CASE WHEN l_orderkey % 10 < 6 THEN 0
                               ELSE l_orderkey % 25 END AS k,
                          count(*) AS sz
                   FROM lineitem GROUP BY 1),
        r AS (SELECT sz, row_number() OVER (ORDER BY sz, k) AS rn,
                     count(*) OVER () AS n
              FROM c)
        SELECT CAST((SELECT count(*) FROM c) AS BIGINT) AS n_keys,
               CAST((SELECT sum(sz) FROM c) AS BIGINT) AS n_rows,
               CAST((SELECT max(sz) FROM c) AS BIGINT) AS max_sz,
               CAST((SELECT sz FROM r
                     WHERE rn - 1 = ((n - 1) * 50) // 100)
                    AS BIGINT) AS p50_sz,
               CAST((SELECT sz FROM r
                     WHERE rn - 1 = ((n - 1) * 99) // 100)
                    AS BIGINT) AS p99_sz,
               CAST(100 * (SELECT max(sz) FROM c)
                    // (SELECT sum(sz) FROM c) AS BIGINT)
                 AS top_share_pct"""

    out["q157_group_trend"] = """
        WITH b AS (
          SELECT event_type,
                 epoch_us(ts) // 86400000000 AS x,
                 CAST(floor(value * 100) AS BIGINT) AS y
          FROM events),
        g AS (SELECT event_type,
                     CAST(count(*) AS HUGEINT) AS n,
                     CAST(sum(x) AS HUGEINT) AS sx,
                     CAST(sum(y) AS HUGEINT) AS sy,
                     CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT)
                       AS sxy,
                     CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT)
                       AS sxx
              FROM b GROUP BY 1)
        SELECT event_type, CAST(n AS BIGINT) AS n,
               round(CAST(n * sxy - sx * sy AS DOUBLE)
                     / CAST(n * sxx - sx * sx AS DOUBLE), 9)
                 AS slope
        FROM g WHERE n * sxx - sx * sx <> 0
        ORDER BY event_type"""

    out["q158_rate_anomaly"] = """
        WITH b AS (
          SELECT event_type,
                 epoch_us(ts) // 86400000000 AS bk
          FROM events),
        rng AS (SELECT min(bk) AS lo, max(bk) AS hi FROM b),
        cal AS (SELECT u.bk FROM rng,
                  unnest(generate_series(rng.lo, rng.hi)) AS u(bk)),
        ks AS (SELECT DISTINCT event_type FROM b),
        agg AS (SELECT event_type, bk, count(*) AS c
                FROM b GROUP BY 1, 2),
        grid AS (
          SELECT ks.event_type, cal.bk,
                 CAST(coalesce(agg.c, 0) AS HUGEINT) AS c
          FROM ks CROSS JOIN cal
          LEFT JOIN agg ON agg.event_type = ks.event_type
                       AND agg.bk = cal.bk),
        st AS (SELECT event_type,
                      CAST(count(*) AS HUGEINT) AS n,
                      CAST(sum(c) AS HUGEINT) AS s,
                      CAST(sum(c * c) AS HUGEINT) AS q
               FROM grid GROUP BY 1)
        SELECT g.event_type,
               make_timestamp(g.bk * 86400000000) AS bucket_ts,
               CAST(g.c AS BIGINT) AS n_events
        FROM grid g JOIN st USING (event_type)
        WHERE (st.n - 1) * (st.n * g.c - st.s)
              * (st.n * g.c - st.s)
              > 4 * st.n * (st.n * st.q - st.s * st.s)
        ORDER BY g.event_type, g.bk"""

    out["q159_related_terms"] = r"""
        WITH t AS (SELECT doc_id,
                     regexp_extract_all(coalesce(text, ''), '\S+') AS ts
                   FROM documents),
        p AS (SELECT doc_id, u.i AS i, ts[u.i] AS w
              FROM t, unnest(generate_series(1, len(ts))) AS u(i)),
        pr AS (SELECT least(a.w, b.w) AS w1, greatest(a.w, b.w) AS w2
               FROM p a JOIN p b
                 ON a.doc_id = b.doc_id AND b.i > a.i
                AND b.i <= a.i + 2),
        cnt AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS n
                FROM pr GROUP BY 1, 2 HAVING count(*) >= 5)
        SELECT w1, w2, n FROM cnt
        QUALIFY row_number() OVER (PARTITION BY w1
                                   ORDER BY n DESC, w2) <= 5
        ORDER BY w1, n DESC, w2"""

    out["q160_log_odds"] = r"""
        WITH tk AS (
          SELECT lang = 'en' AS is_a,
                 unnest(regexp_extract_all(coalesce(text, ''),
                                           '\S+')) AS tok
          FROM documents),
        tot AS (SELECT sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS ta,
                       sum(CASE WHEN is_a THEN 0 ELSE 1 END) AS tb
                FROM tk),
        c AS (SELECT tok,
                     sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS a,
                     sum(CASE WHEN is_a THEN 0 ELSE 1 END) AS b
              FROM tk GROUP BY 1),
        d AS (SELECT tok, CAST(a AS BIGINT) AS a,
                     CAST(b AS BIGINT) AS b,
                     CAST(floor(ln(a + 1) * 1000000000) AS BIGINT)
                     - CAST(floor(ln(t.ta - a + 1) * 1000000000)
                            AS BIGINT)
                     - CAST(floor(ln(b + 1) * 1000000000) AS BIGINT)
                     + CAST(floor(ln(t.tb - b + 1) * 1000000000)
                            AS BIGINT) AS delta_q
              FROM c CROSS JOIN tot t)
        SELECT tok, a, b, delta_q
        FROM d ORDER BY delta_q DESC, tok LIMIT 25"""


    out["q84_pretrain_pipeline"] = r"""
        -- the q12 dedup, q56 repetition-share, q76 decontamination
        -- and q67 packing fragments chained end-to-end
        WITH dd AS (
          SELECT doc_id, text FROM documents
          QUALIFY row_number() OVER (PARTITION BY md5(text)
                                     ORDER BY doc_id) = 1),
        w AS (SELECT doc_id, text,
                     string_split(coalesce(text,''), ' ') AS ws
              FROM dd),
        bi AS (SELECT doc_id,
                      unnest(list_transform(
                        generate_series(1, len(ws) - 1),
                        i -> ws[i] || ' ' || ws[i + 1])) AS bg
               FROM w WHERE len(ws) >= 2),
        bc AS (SELECT doc_id, bg, count(*) AS n
               FROM bi GROUP BY doc_id, bg),
        bs AS (SELECT doc_id, sum(n) AS tot,
                      sum(CASE WHEN n > 1 THEN n ELSE 0 END) AS dup
               FROM bc GROUP BY doc_id),
        rep AS (SELECT w.doc_id, w.text
                FROM w LEFT JOIN bs USING (doc_id)
                WHERE coalesce(bs.dup / CAST(bs.tot AS DOUBLE), 0)
                      <= 0.2),
        rt AS (SELECT doc_id,
                      regexp_extract_all(coalesce(text,''), '\S+')
                        AS ts
               FROM rep),
        rwin AS (SELECT doc_id, u.h AS h
                 FROM rt, unnest(list_transform(
                       generate_series(1, len(ts) - 7),
                       i -> md5_number_lower(array_to_string(
                              ts[i:i+7], chr(31))))) AS u(h)
                 WHERE len(ts) >= 8),
        bt AS (SELECT doc_id,
                      regexp_extract_all(coalesce(text,''), '\S+')
                        AS ts
               FROM documents WHERE doc_id < 20),
        bwin AS (SELECT DISTINCT u.h AS h
                 FROM bt, unnest(list_transform(
                       generate_series(1, len(ts) - 7),
                       i -> md5_number_lower(array_to_string(
                              ts[i:i+7], chr(31))))) AS u(h)
                 WHERE len(ts) >= 8),
        contaminated AS (
          SELECT DISTINCT r.doc_id FROM rwin r
          JOIN bwin b ON r.h = b.h WHERE r.doc_id >= 20),
        final AS (SELECT doc_id, text FROM rep
                  WHERE doc_id NOT IN
                        (SELECT doc_id FROM contaminated)),
        dl AS (SELECT doc_id,
                      len(string_split(coalesce(text,''), ' ')) AS n
               FROM final),
        o AS (SELECT doc_id, n,
                     coalesce(sum(n) OVER (ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), 0) AS off
              FROM dl)
        SELECT ex.ex AS example_id, doc_id,
               CAST(greatest(off, ex.ex * 512) - off AS BIGINT)
                 AS tok_start,
               CAST(least(off + n, (ex.ex + 1) * 512)
                 - greatest(off, ex.ex * 512) AS BIGINT) AS n_toks
        FROM o, unnest(generate_series(CAST(off // 512 AS BIGINT),
                 CAST((off + n - 1) // 512 AS BIGINT))) AS ex(ex)
        ORDER BY example_id, doc_id"""

    out["q86_latest_capture"] = """
        -- keep the newest of 3 deterministic re-crawls per url; the
        -- md5 proves the right capture's TEXT survived
        WITH caps AS (
          SELECT 'https://site' || (doc_id % 1000) || '.example/p/'
                   || doc_id AS url,
                 doc_id, doc_id * 1009 + 1577836800000
                   + r.r * 86400000 AS ts_ms,
                 text || ' r' || r.r AS text
          FROM documents, unnest(generate_series(0, 2)) AS r(r))
        SELECT url, doc_id, CAST(ts_ms AS BIGINT) AS ts_ms,
               md5(text) AS content_md5
        FROM caps
        QUALIFY row_number() OVER (PARTITION BY url
                                   ORDER BY ts_ms DESC) = 1
        ORDER BY doc_id"""

    out["q83_vocab_stats"] = """
        WITH tok AS (
          SELECT unnest(string_split(coalesce(text, ''), ' ')) AS t
          FROM documents)
        SELECT count(DISTINCT t) AS n_distinct_tokens,
               count(*) AS n_tokens FROM tok"""

    out["q82_grouped_topk"] = """
        SELECT doc_id, source, n_chars FROM documents
        QUALIFY row_number() OVER (PARTITION BY source
                 ORDER BY n_chars DESC, doc_id) <= 3
        ORDER BY source, doc_id"""

    out["q81_percent_rank"] = """
        SELECT doc_id, n_chars,
               round(percent_rank() OVER (ORDER BY n_chars), 6)
                 AS pct_rank
        FROM documents ORDER BY doc_id"""

    out["q80_label_centroids"] = """
        -- per-(label, dimension) mean of the embedding vectors
        WITH e AS (
          SELECT label, u.r['i'] AS i,
                 CAST(u.r['v'] AS DOUBLE) AS v
          FROM embeddings, unnest(list_transform(
                generate_series(1, len(embedding)),
                i -> {'i': i, 'v': embedding[i]})) AS u(r))
        SELECT CAST(label AS BIGINT) AS label, CAST(i AS BIGINT) AS i,
               round(avg(v), 6) AS mean_v
        FROM e GROUP BY label, i ORDER BY label, i"""

    out["q78_triangles"] = """
        -- exact 3-way self-join over the canonical undirected edge
        -- set of the q62 synthetic graph; each triangle x<y<z is one
        -- (x,y)-(x,z)-(y,z) row
        WITH nd AS (SELECT count(*) AS n FROM documents),
        e0 AS (
          SELECT doc_id AS src, (doc_id * 7 + 1) % nd.n AS dst
          FROM documents, nd
          UNION ALL
          SELECT doc_id, (doc_id * 13 + 5) % nd.n FROM documents, nd
          UNION ALL
          SELECT doc_id, (doc_id * 31 + 11) % nd.n FROM documents, nd),
        e AS (SELECT DISTINCT least(src, dst) AS u,
                     greatest(src, dst) AS v
              FROM e0 WHERE src <> dst)
        SELECT count(*) AS n_triangles
        FROM e a JOIN e b ON a.u = b.u AND a.v < b.v
                 JOIN e c ON c.u = a.v AND c.v = b.v"""

    out["q76_decontaminate"] = r"""
        -- 8-token-window overlap vs the doc_id<20 benchmark set;
        -- same \S+ tokenizer + md5 window hash as q68
        WITH toks AS (
          SELECT doc_id,
                 regexp_extract_all(coalesce(text, ''), '\S+') AS ts
          FROM documents),
        win AS (
          SELECT doc_id, u.h AS h
          FROM toks, unnest(list_transform(
                generate_series(1, len(ts) - 7),
                i -> md5_number_lower(
                       array_to_string(ts[i:i+7], chr(31))))) AS u(h)
          WHERE len(ts) >= 8),
        bench AS (SELECT DISTINCT h FROM win WHERE doc_id < 20)
        SELECT w.doc_id, count(*) AS n_hits
        FROM win w JOIN bench b ON w.h = b.h
        WHERE w.doc_id >= 20
        GROUP BY w.doc_id ORDER BY w.doc_id"""

    out["q64_lm_nll"] = """
        -- same quantized-log arithmetic as stages/text.lm_nll:
        -- floor(ln(count+1) * 1e9) is bit-identical between libm
        -- (math.log) and DuckDB ln, so per-doc sums are exact ints
        WITH tok AS (
          SELECT doc_id, unnest(string_split(coalesce(text, ''), ' ')) AS t
          FROM documents),
        cnt AS (SELECT t, count(*) AS c FROM tok GROUP BY t),
        g AS (SELECT sum(c) AS total, count(*) AS v FROM cnt),
        qz AS (SELECT CAST(floor(ln(CAST(total + v AS DOUBLE))
                                 * 1000000000) AS BIGINT) AS z FROM g),
        ql AS (SELECT t, CAST(floor(ln(CAST(c + 1 AS DOUBLE))
                                    * 1000000000) AS BIGINT) AS q
               FROM cnt),
        dl AS (SELECT doc_id, count(*) AS n, sum(q) AS s
               FROM tok JOIN ql USING (t) GROUP BY doc_id)
        SELECT doc_id,
               round((n * (SELECT z FROM qz) - s)
                     / (1000000000.0 * n), 6) AS lm_nll
        FROM dl ORDER BY doc_id"""

    # CCNet buckets: q64's nll joined to lang, exact rank terciles
    # within each language (deterministic tie-break on doc_id); the
    # engine's floor(rank0*3/n) == SQL ((row_number-1)*3)//count
    out["q96_ccnet_buckets"] = f"""
        WITH nll AS ({out["q64_lm_nll"]}),
        j AS (SELECT n.doc_id, d.lang, n.lm_nll
              FROM nll n JOIN documents d USING (doc_id))
        SELECT doc_id, lang, lm_nll,
               ((row_number() OVER (PARTITION BY lang
                                    ORDER BY lm_nll, doc_id) - 1) * 3)
                 // (COUNT(*) OVER (PARTITION BY lang)) AS bucket
        FROM j ORDER BY doc_id"""

    # raster grid oracles: cell centers -180 + (c+0.5)*1.875 etc. are
    # float-exact (dyadic 1.875 = 15/8), so the diamond-rule CASE at a
    # center and at a neighbor center is bit-identical to the engine's
    # numpy arithmetic; perimeter counts boundary edges closed-form
    # (neighbor label differs or grid border), area counts cells
    raster_cells = """
            cells AS (
              SELECT CAST(r.r AS BIGINT) AS row, CAST(c.c AS BIGINT) AS col,
                     -180.0 + (c.c + 0.5) * 1.875 AS lon,
                     -90.0 + (r.r + 0.5) * 1.875 AS lat
              FROM (SELECT unnest(generate_series(0, 95)) AS r) r
              CROSS JOIN (SELECT unnest(generate_series(0, 191)) AS c) c),
            labeled AS (
              SELECT row, col, lon, lat, {v} AS value FROM cells)
    """.format(v=_region_case())
    out["q41_rasterize"] = f"""
            WITH {raster_cells}
            SELECT row, col, value FROM labeled WHERE value >= 0"""
    out["q77_zonal_stats"] = f"""
            -- zonal stats of v = (row*191 + col) %% 97 per region zone
            WITH {raster_cells}
            SELECT value, count(*) AS n_cells,
                   CAST(sum((row * 191 + col) % 97) AS DOUBLE) AS sum_v,
                   round(avg((row * 191 + col) % 97), 6) AS mean_v,
                   CAST(min((row * 191 + col) % 97) AS DOUBLE) AS min_v,
                   CAST(max((row * 191 + col) % 97) AS DOUBLE) AS max_v
            FROM labeled WHERE value >= 0
            GROUP BY value ORDER BY value"""
    nbr = {
        "s": _region_case("lon", "(lat - 1.875)"),
        "n": _region_case("lon", "(lat + 1.875)"),
        "w": _region_case("(lon - 1.875)", "lat"),
        "e": _region_case("(lon + 1.875)", "lat"),
    }
    out["q42_raster_polygons"] = f"""
            WITH {raster_cells}
            SELECT value,
                   count(*) * 3.515625 AS area,
                   sum(CASE WHEN row = 0  OR {nbr['s']} <> value
                            THEN 1 ELSE 0 END
                     + CASE WHEN row = 95 OR {nbr['n']} <> value
                            THEN 1 ELSE 0 END
                     + CASE WHEN col = 0  OR {nbr['w']} <> value
                            THEN 1 ELSE 0 END
                     + CASE WHEN col = 191 OR {nbr['e']} <> value
                            THEN 1 ELSE 0 END) * 1.875 AS perimeter
            FROM labeled WHERE value >= 0
            GROUP BY value"""
    return out
