"""Iterative graph algorithms over edge Datasets.

PageRank is the representative iterative-pipeline operator (power
iteration; Page et al. 1999): each iteration is one bucket-hash join
(ranks → weighted edges on src) plus one grouped sum (contributions by
dst) — the canonical Ray Data shape for iterative algorithms, with the
per-iteration state (the rank vector) materialized to the object
store, never the driver.  Complements the non-iterative connected
components in ops/dedup.cluster_pairs (large/small-star contraction).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .relational import groupby_agg, hash_join


def out_weighted_edges(edges_ds, src_col="src", dst_col="dst",
                       num_buckets=32):
    """(src, dst) -> (src, dst, w=1/outdeg(src)): one groupby + one
    join, done once before the iterations."""
    deg = groupby_agg(edges_ds, [src_col],
                      {"__deg": (dst_col, "count")})
    ew = hash_join(edges_ds, deg, on=src_col,
                   num_buckets=num_buckets)

    def weigh(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["w"] = 1.0 / df["__deg"].to_numpy(dtype=np.float64)
        return df[[src_col, dst_col, "w"]]

    return ew.map_batches(weigh, batch_format="pandas")


def pagerank(edges_ds, nodes_ds, damping=0.85, iters=5,
             src_col="src", dst_col="dst", node_col="node",
             num_buckets=32):
    """Distributed PageRank power iteration.

    ``nodes_ds`` supplies the node universe (nodes without in-edges
    keep the teleport base).  Per iteration: ranks bucket-join the
    weighted edge table on src, contributions group-sum by dst, and
    ``r' = (1-d)/N + d*(inflow + dangling/N)`` — the dangling mass is
    one tiny driver scalar (total rank minus rank that flowed through
    edges), not a node list.  The rank vector lives in the object
    store between iterations (materialize), never on the driver.
    Returns a Dataset (node_col, rank).
    """
    n = nodes_ds.count()
    ew = out_weighted_edges(edges_ds, src_col, dst_col,
                            num_buckets=num_buckets).materialize()
    base0 = 1.0 / n

    def init(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({node_col: df[node_col].to_numpy(),
                             "rank": np.full(len(df), base0)})

    ranks = nodes_ds.map_batches(init, batch_format="pandas") \
        .materialize()

    for _ in range(iters):
        # rename for the src-keyed join without a schema clash
        def as_src(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                src_col: df[node_col].to_numpy(dtype=np.int64),
                "rank": df["rank"].to_numpy(dtype=np.float64)})
        contrib_in = hash_join(
            ranks.map_batches(as_src, batch_format="pandas"), ew,
            on=src_col, num_buckets=num_buckets)

        def emit(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                node_col: df[dst_col].to_numpy(dtype=np.int64),
                "__x": df["rank"].to_numpy() * df["w"].to_numpy()})
        # materialized: consumed twice (dangling scalar + the left
        # join) — without this the join/emit chain executes twice
        inflow = groupby_agg(
            contrib_in.map_batches(emit, batch_format="pandas"),
            [node_col], {"__x": ("__x", "sum")}).materialize()

        # dangling mass = rank not carried by any out-edge (tiny
        # driver scalars from two partial-sum aggregates)
        total = ranks.map_batches(
            lambda df: pd.DataFrame({"s": [df["rank"].sum()]}),
            batch_format="pandas").to_pandas()["s"].sum()
        flowed = inflow.map_batches(
            lambda df: pd.DataFrame({"s": [df["__x"].sum()]}),
            batch_format="pandas").to_pandas()["s"].sum()
        dangling = max(total - flowed, 0.0)

        joined = hash_join(nodes_ds, inflow, on=node_col, how="left",
                           num_buckets=num_buckets)
        base = (1 - damping) / n + damping * (dangling / n)

        def renew(df: pd.DataFrame) -> pd.DataFrame:
            x = df["__x"].to_numpy(dtype=np.float64)
            x = np.where(np.isnan(x), 0.0, x)
            return pd.DataFrame({
                node_col: df[node_col].to_numpy(dtype=np.int64),
                "rank": base + damping * x})
        ranks = joined.map_batches(renew, batch_format="pandas") \
            .materialize()
    return ranks
