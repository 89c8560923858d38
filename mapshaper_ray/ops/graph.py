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

import os

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


# inflow reduce auto-gate: at or below this node count the
# per-iteration contribution reduce runs as per-batch partials +
# driver pandas groupby (no sort exchange — the partial table is
# bounded by blocks x in-block-unique <= edges, and the REDUCED table
# by n); above it the fully distributed bucket shuffle keeps the
# driver out of the loop entirely.  Same gate pattern as minhash's
# pair cap and lm_nll's vocab cap.
PAGERANK_DRIVER_REDUCE_CAP = int(os.environ.get(
    "MAPSHAPER_RAY_PAGERANK_DRIVER_CAP", "2000000"))


def pagerank(edges_ds, nodes_ds, damping=0.85, iters=5,
             src_col="src", dst_col="dst", node_col="node",
             num_buckets=32, inflow_mode="auto"):
    """Distributed PageRank power iteration.

    ``nodes_ds`` supplies the node universe (nodes without in-edges
    keep the teleport base).  Per iteration exactly TWO exchanges:
    (1) ranks bucket-join the weighted edge table on src; (2) the
    emitted (dst, contribution) rows — unioned with a once-
    materialized ZERO row per node, so the node universe rides the
    same shuffle instead of a third per-iteration join — group-sum by
    dst-bucket, and the fused renew computes ``r' = (1-d)/N +
    d*(inflow + dangling/N)``.  The dangling mass is one tiny driver
    scalar (total rank minus rank that flowed through edges), not a
    node list.  The rank vector lives in the object store between
    iterations (materialize), never on the driver.  Returns a Dataset
    (node_col, rank).

    ``inflow_mode``: "auto" (default) picks the contribution-reduce
    strategy by node count — "driver" (partials + driver groupby, no
    sort exchange) at or below PAGERANK_DRIVER_REDUCE_CAP, "shuffle"
    (zeros-union bucket exchange, driver-unbounded) above.  Both are
    pytest-equivalence-tested.
    """
    from .partition import bucket_part

    nodes_ds = nodes_ds.materialize()
    n = nodes_ds.count()
    if inflow_mode == "auto":
        inflow_mode = ("driver" if n <= PAGERANK_DRIVER_REDUCE_CAP
                       else "shuffle")
    ew = out_weighted_edges(edges_ds, src_col, dst_col,
                            num_buckets=num_buckets).materialize()
    base0 = 1.0 / n

    import pyarrow as pa

    def init(t: "pa.Table") -> "pa.Table":
        return pa.table({
            node_col: t.column(node_col).cast(pa.int64()),
            "rank": pa.array(np.full(len(t), base0))})

    ranks = nodes_ds.map_batches(init, batch_format="pyarrow") \
        .materialize()

    # one zero contribution per node, pre-bucketed by dst-hash — the
    # node universe joins each iteration's contribution shuffle for
    # free (vs a dedicated nodes-left-join exchange per iteration)
    def zero(t: "pa.Table") -> "pa.Table":
        nd = np.asarray(t.column(node_col).to_numpy(
            zero_copy_only=False), dtype=np.int64)
        return pa.table({node_col: nd,
                         "__x": np.zeros(len(nd)),
                         "__part": bucket_part(nd, num_buckets)
                         .astype(np.int64)})

    zeros = nodes_ds.map_batches(zero, batch_format="pyarrow") \
        .materialize()

    for _ in range(iters):
        # rename for the src-keyed join without a schema clash —
        # Arrow-native: these blocks feed the join's Sort exchange
        def as_src(t: "pa.Table") -> "pa.Table":
            return pa.table({
                src_col: t.column(node_col).cast(pa.int64()),
                "rank": t.column("rank").cast(pa.float64())})
        contrib_in = hash_join(
            ranks.map_batches(as_src, batch_format="pyarrow"), ew,
            on=src_col, num_buckets=num_buckets)

        # Arrow out: the union partner (zeros) is Arrow and Ray's
        # sort sampler requires ONE block type across the exchange
        def emit(t: "pa.Table") -> "pa.Table":
            dst = np.asarray(t.column(dst_col).to_numpy(
                zero_copy_only=False), dtype=np.int64)
            r = np.asarray(t.column("rank").to_numpy(
                zero_copy_only=False), dtype=np.float64)
            w = np.asarray(t.column("w").to_numpy(
                zero_copy_only=False), dtype=np.float64)
            return pa.table({
                node_col: dst, "__x": r * w,
                "__part": bucket_part(dst, num_buckets)
                .astype(np.int64)})

        def sum_part(df: pd.DataFrame) -> pd.DataFrame:
            g = df.groupby(node_col, sort=False)["__x"].sum()
            return pd.DataFrame({
                node_col: g.index.to_numpy(np.int64),
                "__x": g.to_numpy(np.float64)})

        # materialized: consumed twice (dangling scalar + renew)
        contrib = contrib_in.map_batches(emit, batch_format="pyarrow") \
            .union(zeros)
        if inflow_mode == "driver":
            # per-batch partials + driver pandas groupby: no sort
            # exchange; the zeros union still carries the node
            # universe so nodes without inflow keep the teleport base
            inflow = groupby_agg(contrib, [node_col],
                                 {"__x": ("__x", "sum")}).materialize()
        else:
            inflow = contrib.groupby("__part") \
                .map_groups(sum_part, batch_format="pandas") \
                .materialize()

        # dangling mass = rank not carried by any out-edge (one tiny
        # driver scalar from a partial-sum aggregate; the zero rows
        # add nothing).  Total rank is invariantly 1: the update
        # redistributes dangling mass, so each iteration's ranks sum
        # to (1-d) + d*(flowed + dangling) = 1 — no per-iteration
        # pass over ranks needed.
        flowed = inflow.map_batches(
            lambda df: pd.DataFrame({"s": [df["__x"].sum()]}),
            batch_format="pandas").to_pandas()["s"].sum()
        dangling = max(1.0 - flowed, 0.0)
        base = (1 - damping) / n + damping * (dangling / n)

        def renew(t: "pa.Table") -> "pa.Table":
            x = np.asarray(t.column("__x").to_numpy(
                zero_copy_only=False), dtype=np.float64)
            nd = np.asarray(t.column(node_col).to_numpy(
                zero_copy_only=False), dtype=np.int64)
            return pa.table({node_col: nd, "rank": base + damping * x})
        # repartition: Ray's sort emits one output block per INPUT
        # block, so without this each iteration inherits the previous
        # one's partition count and the loop inflates unboundedly
        # (196 -> 327 -> 458 -> ... blocks, mostly empty; measured
        # 6.3s -> 14.3s -> 26.4s per iteration).  Pinning the rank
        # table at num_buckets blocks keeps every iteration's two
        # exchanges constant-cost — 4.8s/iter flat at 2M edges.
        ranks = inflow.map_batches(renew, batch_format="pyarrow") \
            .repartition(num_buckets).materialize()
    return ranks


def pagerank_broadcast(edges_ds, nodes_ds, damping=0.85, iters=5,
                       src_col="src", dst_col="dst", node_col="node",
                       num_buckets=32):
    """PageRank fast path for node sets that fit on the driver
    (<= ~1e8): the rank VECTOR broadcasts via ``ray.put`` each
    iteration, so the per-iteration cost drops from two bucket joins
    re-sorting the full EDGE table to one stateless edge pass
    (searchsorted rank lookup + per-batch pre-aggregated
    contributions) and one small grouped sum over <= |nodes| rows.
    Same arithmetic as ``pagerank`` (the shuffle scale path — use it
    when the node table itself is too large to hold): equivalence is
    pytest-enforced to 1e-12.
    """
    import ray

    nodes = np.sort(nodes_ds.to_pandas()[node_col]
                    .to_numpy(dtype=np.int64))
    n = len(nodes)
    ew = out_weighted_edges(edges_ds, src_col, dst_col,
                            num_buckets=num_buckets).materialize()
    rank = np.full(n, 1.0 / n)

    for _ in range(iters):
        rref = ray.put((nodes, rank))

        def contribs(df: pd.DataFrame) -> pd.DataFrame:
            nd, r = ray.get(rref)
            si = np.searchsorted(nd, df[src_col].to_numpy())
            x = r[si] * df["w"].to_numpy()
            # pre-aggregate inside the batch: one row per distinct dst
            dst = df[dst_col].to_numpy()
            order = np.argsort(dst, kind="stable")
            dst_s, x_s = dst[order], x[order]
            cut = np.r_[True, dst_s[1:] != dst_s[:-1]]
            starts = np.flatnonzero(cut)
            sums = np.add.reduceat(x_s, starts)
            return pd.DataFrame({node_col: dst_s[starts], "__x": sums})

        inflow = groupby_agg(ew.map_batches(contribs,
                                            batch_format="pandas"),
                             [node_col], {"__x": ("__x", "sum")}) \
            .to_pandas()
        x = np.zeros(n)
        x[np.searchsorted(nodes, inflow[node_col].to_numpy())] = \
            inflow["__x"].to_numpy()
        dangling = max(rank.sum() - x.sum(), 0.0)
        rank = (1 - damping) / n + damping * (x + dangling / n)

    import ray.data as rd
    out = pd.DataFrame({node_col: nodes, "rank": rank})
    return rd.from_pandas(out)


def triangle_count(edges_ds, src_col="src", dst_col="dst",
                   num_buckets=64, pivot="id"):
    """Distributed triangle counting (the node-iterator / wedge-join
    algorithm): (1) edges canonicalize to u < v and dedup via a
    bucket-hash shuffle; (2) wedges — neighbor pairs (v, w) of each
    pivot u — emit from a by-pivot shuffle (one vectorized
    triu-indices pass per partition, no per-node task); (3) wedges
    and edges meet in a (v, w)-bucket exchange and matches count
    in-partition.  Only partial counts reach the driver (one int per
    partition).  Each triangle x<y<z is counted exactly once: pivot =
    its smallest vertex (in the chosen order), wedge = (y, z).

    ``pivot="degree"`` orients edges by (degree, id) instead of id —
    the compact-forward ordering (Latapy 2008): a hub never pivots,
    so wedge volume drops from O(Σdeg²) to O(m^1.5) on power-law
    graphs.  Two extra bucket joins attach degrees; the count is
    identical (pytest-enforced).  Returns the triangle count (int).
    """
    from .partition import bucket_part

    def canon(df: pd.DataFrame) -> pd.DataFrame:
        s = df[src_col].to_numpy(dtype=np.int64)
        d = df[dst_col].to_numpy(dtype=np.int64)
        keep = s != d
        s, d = s[keep], d[keep]
        u = np.minimum(s, d)
        v = np.maximum(s, d)
        return pd.DataFrame({
            "u": u, "v": v,
            "__b": bucket_part(u * np.int64(2654435761) + v,
                               num_buckets)})

    def dedup(df: pd.DataFrame) -> pd.DataFrame:
        g = df.drop_duplicates(["u", "v"])
        return pd.DataFrame({"u": g["u"].to_numpy(),
                             "v": g["v"].to_numpy()})

    edges = edges_ds.map_batches(canon, batch_format="pandas") \
        .groupby("__b").map_groups(dedup, batch_format="pandas") \
        .materialize()

    if pivot == "degree":
        # (deg, id)-ordered orientation: attach both endpoint degrees,
        # point each edge from the lower-(deg,id) node to the higher,
        # and carry the neighbor's order key so the wedge stage emits
        # pairs in the SAME order the edge table stores them.  ids
        # must fit 32 bits (packed key).
        def ends_(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({"node": np.concatenate(
                [df["u"].to_numpy(), df["v"].to_numpy()])})

        deg = groupby_agg(edges.map_batches(ends_,
                                            batch_format="pandas"),
                          ["node"], {"deg": ("node", "count")}) \
            .materialize()
        n_nodes = deg.count()

        def _pack_orient(u, v, du, dv):
            if len(u) and (int(max(u.max(), v.max())) >= (1 << 32)
                           or int(min(u.min(), v.min())) < 0):
                raise ValueError(
                    "triangle_count pivot='degree' packs (deg<<32)|id"
                    " — node ids must be in [0, 2^32); remap ids or "
                    "use pivot='id'")
            ku = (du << 32) | u
            kv = (dv << 32) | v
            lo = ku < kv
            return pd.DataFrame({
                "u": np.where(lo, u, v),
                "v": np.where(lo, v, u),
                "kv": np.maximum(ku, kv)})

        if n_nodes <= PAGERANK_DRIVER_REDUCE_CAP:
            # degree table fits the driver: broadcast it once and
            # orient in ONE stateless pass — saves the two bucket
            # joins (and their sort exchanges) of the scale path
            import ray as _ray
            dd = deg.to_pandas()
            nd = dd["node"].to_numpy(dtype=np.int64)
            o = np.argsort(nd, kind="stable")
            deg_ref = _ray.put((nd[o],
                                dd["deg"].to_numpy(np.int64)[o]))

            def orient_b(df: pd.DataFrame) -> pd.DataFrame:
                nodes_s, degs_s = _ray.get(deg_ref)
                u = df["u"].to_numpy(dtype=np.int64)
                v = df["v"].to_numpy(dtype=np.int64)
                du = degs_s[np.searchsorted(nodes_s, u)]
                dv = degs_s[np.searchsorted(nodes_s, v)]
                return _pack_orient(u, v, du, dv)

            edges = edges.map_batches(orient_b,
                                      batch_format="pandas") \
                .materialize()
        else:
            def as_u(df: pd.DataFrame) -> pd.DataFrame:
                return pd.DataFrame({"u": df["node"].to_numpy(),
                                     "__du": df["deg"].to_numpy()})

            def as_v(df: pd.DataFrame) -> pd.DataFrame:
                return pd.DataFrame({"v": df["node"].to_numpy(),
                                     "__dv": df["deg"].to_numpy()})

            e1 = hash_join(edges, deg.map_batches(
                as_u, batch_format="pandas"), on="u",
                num_buckets=num_buckets)

            # the join's one-sided-bucket NaN pad coerces carried int
            # columns to float — restore int64 BEFORE the second join
            # or its hash buckets mismatch (float64 2.0 hashes
            # differently from int64 2; same pitfall asof_join
            # documents)
            def re_int(df: pd.DataFrame) -> pd.DataFrame:
                return pd.DataFrame({
                    "u": df["u"].to_numpy(dtype=np.int64),
                    "v": df["v"].to_numpy(dtype=np.int64),
                    "__du": df["__du"].to_numpy(dtype=np.int64)})

            e2 = hash_join(e1.map_batches(re_int,
                                          batch_format="pandas"),
                           deg.map_batches(as_v,
                                           batch_format="pandas"),
                           on="v", num_buckets=num_buckets)

            def orient(df: pd.DataFrame) -> pd.DataFrame:
                return _pack_orient(
                    df["u"].to_numpy(dtype=np.int64),
                    df["v"].to_numpy(dtype=np.int64),
                    df["__du"].to_numpy(dtype=np.int64),
                    df["__dv"].to_numpy(dtype=np.int64))

            edges = e2.map_batches(orient, batch_format="pandas") \
                .materialize()
    else:
        edges = edges.map_batches(
            lambda df: df.assign(kv=df["v"].to_numpy()),
            batch_format="pandas").materialize()

    def by_pivot(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__b"] = bucket_part(df["u"].to_numpy(), num_buckets)
        return df

    def wedges(df: pd.DataFrame) -> pd.DataFrame:
        # all ordered (v, w) neighbor pairs per pivot u — neighbors
        # sort by their orientation key so pairs match the edge
        # table's stored direction.  Pair enumeration is pure
        # group-size arithmetic (repeat + arange) with NO per-pivot
        # Python loop: element at local offset l of a run of size n
        # leads (n-1-l) pairs, each with the elements that follow it.
        order = np.lexsort((df["kv"].to_numpy(), df["u"].to_numpy()))
        u = df["u"].to_numpy()[order]
        v = df["v"].to_numpy()[order]
        if len(u) < 2:
            return pd.DataFrame({"u": pd.Series([], dtype=np.int64),
                                 "v": pd.Series([], dtype=np.int64),
                                 "__side": pd.Series([],
                                                     dtype=np.int8)})
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        ends = np.r_[starts[1:], len(u)]
        grp_end = np.repeat(ends, ends - starts)  # run end per elem
        pos = np.arange(len(u), dtype=np.int64)
        cnt = grp_end - pos - 1  # pairs this element leads
        total = int(cnt.sum())
        if total == 0:
            return pd.DataFrame({"u": pd.Series([], dtype=np.int64),
                                 "v": pd.Series([], dtype=np.int64),
                                 "__side": pd.Series([],
                                                     dtype=np.int8)})
        first = np.repeat(pos, cnt)
        excl = np.concatenate(([0], np.cumsum(cnt)[:-1]))
        second = first + 1 + (np.arange(total, dtype=np.int64)
                              - excl[first])
        return pd.DataFrame({"u": v[first], "v": v[second],
                             "__side": np.zeros(total, np.int8)})

    wedge_ds = edges.map_batches(by_pivot, batch_format="pandas") \
        .groupby("__b").map_groups(wedges, batch_format="pandas")

    def tag_edges(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"u": df["u"].to_numpy(),
                             "v": df["v"].to_numpy(),
                             "__side": np.ones(len(df), np.int8)})

    both = wedge_ds.union(edges.map_batches(tag_edges,
                                            batch_format="pandas"))

    def key_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__b"] = bucket_part(df["u"].to_numpy()
                                * np.int64(2654435761)
                                + df["v"].to_numpy(), num_buckets)
        return df

    def count_matches(df: pd.DataFrame) -> pd.DataFrame:
        side = df["__side"].to_numpy()
        eu = df["u"].to_numpy()[side == 1]
        ev = df["v"].to_numpy()[side == 1]
        wu = df["u"].to_numpy()[side == 0]
        wv = df["v"].to_numpy()[side == 0]
        if not len(eu) or not len(wu):
            return pd.DataFrame({"n": [0]})
        hi = max(int(eu.max()), int(ev.max()),
                 int(wu.max()), int(wv.max()))
        lo = min(int(eu.min()), int(ev.min()),
                 int(wu.min()), int(wv.min()))
        if 0 <= lo and hi < (1 << 32):
            # pack (u, v) into one int64 key — np.isin on ints is
            # much faster than a pandas MultiIndex membership test
            ekey = (eu.astype(np.int64) << 32) | ev.astype(np.int64)
            wkey = (wu.astype(np.int64) << 32) | wv.astype(np.int64)
            return pd.DataFrame(
                {"n": [int(np.isin(wkey, ekey).sum())]})
        eset = pd.MultiIndex.from_arrays([eu, ev])
        widx = pd.MultiIndex.from_arrays([wu, wv])
        return pd.DataFrame({"n": [int(widx.isin(eset).sum())]})

    parts = both.map_batches(key_bucket, batch_format="pandas") \
        .groupby("__b").map_groups(count_matches,
                                   batch_format="pandas").to_pandas()
    return int(parts["n"].sum())


def pagerank_checkpointed(edges_ds, nodes_ds, damping=0.85, iters=5,
                          checkpoint_dir=None, tol=None,
                          src_col="src", dst_col="dst",
                          node_col="node", num_buckets=32):
    """Checkpoint-resumable PageRank (the north rule's
    resume-from-checkpoint contract applied to an ITERATIVE pipeline,
    not just a sink): after every iteration the rank vector writes to
    ``checkpoint_dir/iter_NNNN/`` as partitioned parquet, with a
    manifest row (iteration, rows, rank-sum fingerprint, and — when
    ``tol`` is set — the L1 delta vs the previous iteration).  A
    fresh call with the same checkpoint_dir skips every completed
    iteration — it reads the LAST complete checkpoint and runs only
    the remaining iterations, bit-identical to an uninterrupted run
    (pytest-enforced): each iteration is a pure function of the
    previous ranks, so replay-from-checkpoint is exact.
    ``tol`` enables convergence-based early exit (one extra bucket
    join per iteration for the delta — only paid when requested).
    ``checkpoint_dir=None`` degrades to plain ``pagerank``.

    Returns (ranks Dataset, manifest DataFrame).
    """
    import json
    import os

    import ray.data as rd

    if checkpoint_dir is None:
        return pagerank(edges_ds, nodes_ds, damping, iters, src_col,
                        dst_col, node_col, num_buckets), None

    os.makedirs(checkpoint_dir, exist_ok=True)
    man_path = os.path.join(checkpoint_dir, "manifest.json")
    manifest = []
    if os.path.exists(man_path):
        with open(man_path) as f:
            manifest = json.load(f)

    nodes_ds = nodes_ds.materialize()
    n = nodes_ds.count()
    ew = out_weighted_edges(edges_ds, src_col, dst_col,
                            num_buckets=num_buckets).materialize()

    done = [m for m in manifest if m["status"] == "done"
            and m["iteration"] <= iters]
    start = max((m["iteration"] for m in done), default=0)
    if start:
        ranks = rd.read_parquet(
            os.path.join(checkpoint_dir, f"iter_{start:04d}"))
    else:
        base0 = 1.0 / n

        def init(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                node_col: df[node_col].to_numpy(),
                "rank": np.full(len(df), base0)})

        ranks = nodes_ds.map_batches(init, batch_format="pandas") \
            .materialize()

    for it in range(start + 1, iters + 1):
        def as_src(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                src_col: df[node_col].to_numpy(dtype=np.int64),
                "rank": df["rank"].to_numpy(dtype=np.float64)})

        contrib = hash_join(
            ranks.map_batches(as_src, batch_format="pandas"), ew,
            on=src_col, num_buckets=num_buckets)

        def emit(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                node_col: df[dst_col].to_numpy(dtype=np.int64),
                "__x": df["rank"].to_numpy() * df["w"].to_numpy()})

        inflow = groupby_agg(
            contrib.map_batches(emit, batch_format="pandas"),
            [node_col], {"__x": ("__x", "sum")}).materialize()
        flowed = inflow.map_batches(
            lambda df: pd.DataFrame({"s": [df["__x"].sum()]}),
            batch_format="pandas").to_pandas()["s"].sum()
        dangling = max(1.0 - flowed, 0.0)
        joined = hash_join(nodes_ds, inflow, on=node_col,
                           how="left", num_buckets=num_buckets)
        base = (1 - damping) / n + damping * (dangling / n)

        def renew(df: pd.DataFrame) -> pd.DataFrame:
            x = df["__x"].to_numpy(dtype=np.float64)
            x = np.where(np.isnan(x), 0.0, x)
            return pd.DataFrame({
                node_col: df[node_col].to_numpy(dtype=np.int64),
                "rank": base + damping * x})

        # repartition: same block-inflation guard as plain pagerank —
        # the join's sort emits one block per input block, so without
        # a fixed partition count each iteration compounds the last
        # one's block count
        new_ranks = joined.map_batches(renew,
                                       batch_format="pandas") \
            .repartition(num_buckets).materialize()

        l1 = None
        if tol is not None:
            def as_old(df: pd.DataFrame) -> pd.DataFrame:
                return pd.DataFrame({
                    node_col: df[node_col].to_numpy(dtype=np.int64),
                    "rank_old": df["rank"].to_numpy(np.float64)})
            dj = hash_join(new_ranks,
                           ranks.map_batches(as_old,
                                             batch_format="pandas"),
                           on=node_col, num_buckets=num_buckets)
            l1 = float(dj.map_batches(
                lambda df: pd.DataFrame({"d": [float(np.abs(
                    df["rank"].to_numpy()
                    - df["rank_old"].to_numpy()).sum())]}),
                batch_format="pandas").to_pandas()["d"].sum())

        # checkpoint: write THEN record — a crash between the two
        # re-writes the iteration on resume (idempotent: pure
        # function of the prior checkpoint).  The dir is CLEARED
        # first: Ray's write_parquet appends, so a partial dir left
        # by a mid-write crash would otherwise keep its stale files
        # next to the rewrite's
        import shutil
        it_dir = os.path.join(checkpoint_dir, f"iter_{it:04d}")
        if os.path.exists(it_dir):
            shutil.rmtree(it_dir)
        new_ranks.write_parquet(it_dir)
        stats = new_ranks.map_batches(
            lambda df: pd.DataFrame(
                {"s": [float(df["rank"].sum())], "n": [len(df)]}),
            batch_format="pandas").to_pandas()
        row = {"iteration": it, "rows": int(stats["n"].sum()),
               "rank_sum": round(float(stats["s"].sum()), 12),
               "status": "done", "path": f"iter_{it:04d}"}
        if l1 is not None:
            row["l1_delta"] = round(l1, 12)
        manifest = [m for m in manifest
                    if m["iteration"] != it] + [row]
        # atomic manifest update: a crash mid-dump must not leave a
        # truncated json that makes every later resume unparseable
        tmp = man_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(sorted(manifest,
                             key=lambda m: m["iteration"]), f)
        os.replace(tmp, man_path)
        ranks = new_ranks
        if tol is not None and l1 is not None and l1 < tol:
            break

    return ranks, pd.DataFrame(manifest)


# survivor-set broadcast gate for kcore: at or below this many live
# nodes the survivor ids collect to a sorted array and broadcast once
# per iteration (each task filters edges with two searchsorted
# probes); above it the filter stays a fully distributed semi-join
# pair and the driver never sees node ids.  Same gate pattern as
# minhash's pair cap / pagerank's reduce cap.
KCORE_BROADCAST_CAP = int(os.environ.get(
    "MAPSHAPER_RAY_KCORE_BROADCAST_CAP", "20000000"))


def kcore(edges_ds, k: int, src_col="src", dst_col="dst",
          max_iters: int = 30, num_buckets: int = 32,
          broadcast_cap: int | None = None):
    """k-core decomposition by parallel peeling: repeatedly delete
    every node of degree < ``k`` (all at once per round) until the
    remaining subgraph has min-degree >= k.  Input edges are treated
    as UNDIRECTED; self-loops and duplicate/reversed duplicates are
    removed first.  Returns one row per surviving node:
    (node, deg) with deg the node's degree INSIDE the k-core.

    Distributed shape: one canonical-edge dedup exchange up front,
    then per peel round (a) a degree count — per-batch np.unique
    partials, reduced on the driver below ``broadcast_cap`` live
    edges (pagerank's driver-reduce gate: the REDUCED table is
    node-bounded) and by a distributed grouped sum above it — and
    (b) a survivor filter — broadcast sorted-id membership below the
    cap, a bucketed semi-join per endpoint above it.  The live edge
    set is materialized each round so lineage does not re-execute,
    and only SHRINKS.  Parallel peeling converges in O(log n)-ish
    rounds on web graphs (each round removes every sub-k node).
    """
    import ray
    import ray.data as rd
    from .relational import groupby_agg, hash_join_bucketed

    cap = KCORE_BROADCAST_CAP if broadcast_cap is None else broadcast_cap

    def canon(df: pd.DataFrame) -> pd.DataFrame:
        a = df[src_col].to_numpy()
        b = df[dst_col].to_numpy()
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        m = lo != hi
        return pd.DataFrame({src_col: lo[m], dst_col: hi[m]}) \
            .drop_duplicates()

    partial = edges_ds.map_batches(canon, batch_format="pandas") \
        .materialize()
    n_edges = partial.count()          # upper bound on deduped edges
    mode = "driver" if n_edges <= cap else "distributed"
    edges = groupby_agg(
        partial, [src_col, dst_col], {"__n": (src_col, "count")},
        final=mode).map_batches(
            lambda df: df[[src_col, dst_col]], batch_format="pandas") \
        .materialize()

    def node_partials(df: pd.DataFrame) -> pd.DataFrame:
        both = np.concatenate([df[src_col].to_numpy(),
                               df[dst_col].to_numpy()])
        nodes, cnt = np.unique(both, return_counts=True)
        return pd.DataFrame({"node": nodes,
                             "__c": cnt.astype(np.int64)})

    empty = pd.DataFrame({"node": np.empty(0, np.int64),
                          "deg": np.empty(0, np.int64)})
    prev_n = None
    for _ in range(max_iters):
        deg = groupby_agg(
            edges.map_batches(node_partials, batch_format="pandas"),
            ["node"], {"deg": ("__c", "sum")}, final=mode)
        surv = deg.map_batches(
            lambda df: df[df["deg"].to_numpy() >= k],
            batch_format="pandas").materialize()
        # materialized once per round: count, the id collect, and both
        # semi-join key derivations would otherwise each re-execute
        # the degree reduce
        n = surv.count()
        if n == 0:
            return rd.from_pandas(empty)
        if n == prev_n:          # nodes only ever leave: equal count
            return surv          # means equal set — min degree >= k
        prev_n = n
        if n <= cap:
            ids = np.sort(np.concatenate(
                [b["node"].to_numpy() for b in surv.iter_batches(
                    batch_format="pandas")] or
                [np.empty(0, np.int64)]))
            ref = ray.put(ids)

            def keep(df: pd.DataFrame) -> pd.DataFrame:
                # plain task (no actor pool spin-up per round): the
                # ray.get is a zero-copy plasma read, cached per node
                ids = ray.get(ref)

                def member(x):
                    i = np.searchsorted(ids, x)
                    j = np.minimum(i, len(ids) - 1)
                    return (i < len(ids)) & (ids[j] == x)

                m = member(df[src_col].to_numpy()) \
                    & member(df[dst_col].to_numpy())
                return df[m]

            edges = edges.map_batches(
                keep, batch_format="pandas").materialize()
        else:
            for col in (src_col, dst_col):
                keys = surv.map_batches(
                    lambda df, c=col: pd.DataFrame(
                        {c: df["node"].to_numpy()}),
                    batch_format="pandas")
                edges = hash_join_bucketed(
                    edges, keys, on=col, how="semi",
                    num_buckets=num_buckets,
                    left_cols=[src_col, dst_col], right_cols=[])
            # the bucketed join multiplies block count (one block per
            # bucket group); left unchecked the next round's sort
            # exchange grows super-linearly — coalesce the (shrinking)
            # live edge set back to a bounded block count each round
            edges = edges.repartition(num_buckets).materialize()
    raise RuntimeError(f"kcore: no convergence in {max_iters} rounds")


def host_link_graph(links_ds, src_col="src_host", dst_col="dst_host",
                    num_buckets: int = 32):
    """Aggregate a page-level outlink table into a host-level link
    graph: one row per directed (src_host, dst_host) with the link
    count and ``mutual`` = whether the REVERSED pair also carries at
    least one link (link reciprocity, the classic web-graph signal).

    Distributed shape: per-batch pandas groupby partials reduce the
    page-level volume to the host-pair domain (one distributed
    grouped sum), then ONE bucket exchange keyed on the UNORDERED
    pair — (a,b) and (b,a) hash to the same bucket, so mutuality
    resolves in-partition with a vectorized nunique.  No stage sees
    more than the host-pair table; page rows never shuffle raw.
    """
    from .relational import _key_bucket, groupby_agg

    agg = groupby_agg(links_ds, [src_col, dst_col],
                      {"n_links": (src_col, "count")},
                      final="distributed")

    def stamp(df: pd.DataFrame) -> pd.DataFrame:
        a = df[src_col].astype(str).to_numpy(object)
        b = df[dst_col].astype(str).to_numpy(object)
        lo = np.minimum(a, b)
        hi = np.maximum(a, b)
        pair = np.char.add(np.char.add(lo.astype(str), "\x1f"),
                           hi.astype(str)).astype(object)
        return df.assign(__pair=pair,
                         __part=_key_bucket(pair, num_buckets))

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        # a pair group holds 1 or 2 rows (the two directions, each
        # already aggregated); self-links (a == a) count as mutual
        sizes = df.groupby("__pair")["n_links"].transform("size")
        mutual = (sizes.to_numpy() == 2) \
            | (df[src_col] == df[dst_col]).to_numpy()
        out = df[[src_col, dst_col, "n_links"]].copy()
        out["mutual"] = mutual
        return out

    return agg.map_batches(stamp, batch_format="pandas") \
        .groupby("__part").map_groups(resolve, batch_format="pandas")


def label_propagation(edges_ds, iters: int = 4, src_col="src",
                      dst_col="dst", num_buckets: int = 32,
                      broadcast_cap: int | None = None):
    """Synchronous label propagation (community detection): every
    node starts labelled with its own id; each round every node
    adopts the most frequent label among its NEIGHBORS (undirected;
    ties break to the smallest label; a node with no neighbors keeps
    its label).  Synchronous updates + a total tie order make a
    fixed-``iters`` run fully deterministic — and SQL-unrollable,
    like pagerank's oracle.  Returns (node, label) after the rounds.

    Distributed shape: one canonical-edge dedup up front (kcore's),
    then per round a label join along both edge directions + a
    grouped (node, label) count + a per-node argmax.  Below
    ``broadcast_cap`` nodes the label table broadcasts as sorted
    arrays (searchsorted lookup inside a stateless edge pass; only
    per-batch count partials reduce to the driver).  Above it, a
    bucketed hash join ships labels to edges and the count/argmax
    run as one more bucket exchange — the driver never sees node
    state.
    """
    import ray
    import ray.data as rd
    from .relational import (_run_bounds, groupby_agg,
                             hash_join_bucketed)

    cap = KCORE_BROADCAST_CAP if broadcast_cap is None else broadcast_cap

    def canon(df: pd.DataFrame) -> pd.DataFrame:
        a = df[src_col].to_numpy()
        b = df[dst_col].to_numpy()
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        m = lo != hi
        return pd.DataFrame({"a": lo[m], "b": hi[m]}).drop_duplicates()

    partial = edges_ds.map_batches(canon, batch_format="pandas") \
        .materialize()
    n_edges = partial.count()
    mode = "driver" if n_edges <= cap else "distributed"
    edges = groupby_agg(partial, ["a", "b"],
                        {"__n": ("a", "count")}, final=mode) \
        .map_batches(lambda df: df[["a", "b"]],
                     batch_format="pandas").materialize()

    def node_rows(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": pd.unique(np.concatenate(
            [df["a"].to_numpy(), df["b"].to_numpy()]))})

    nodes_pd = groupby_agg(
        edges.map_batches(node_rows, batch_format="pandas"),
        ["node"], {"__n": ("node", "count")}, final=mode)
    n_nodes = nodes_pd.count()

    def _argmax(df: pd.DataFrame) -> pd.DataFrame:
        # winner per node: highest count, then smallest label
        node = df["node"].to_numpy()
        lab = df["lab"].to_numpy()
        c = df["c"].to_numpy()
        order = np.lexsort((lab, -c, node))
        node, lab = node[order], lab[order]
        starts, _ = _run_bounds(node)
        return pd.DataFrame({"node": node[starts],
                             "lab": lab[starts]})

    # broadcast path needs BOTH bounds: the label arrays are
    # node-bounded, but the per-round count reduce that reaches the
    # driver is bounded by distinct (node, neighbor-label) pairs —
    # an edge-volume quantity (pagerank's driver-reduce cap logic)
    if n_nodes <= cap and n_edges <= 4 * cap:
        ids = np.sort(np.concatenate(
            [b["node"].to_numpy() for b in nodes_pd.iter_batches(
                batch_format="pandas")]))
        labels = ids.copy()
        for _ in range(iters):
            ref = ray.put((ids, labels))

            def count_msgs(df: pd.DataFrame) -> pd.DataFrame:
                ids_, labels_ = ray.get(ref)
                a = df["a"].to_numpy()
                b = df["b"].to_numpy()
                la = labels_[np.searchsorted(ids_, a)]
                lb = labels_[np.searchsorted(ids_, b)]
                node = np.concatenate([a, b])
                lab = np.concatenate([lb, la])
                key = pd.DataFrame({"node": node, "lab": lab})
                g = key.groupby(["node", "lab"], sort=False) \
                    .size().reset_index(name="c")
                return g

            cnt = edges.map_batches(count_msgs,
                                    batch_format="pandas").to_pandas()
            cnt = cnt.groupby(["node", "lab"], as_index=False)["c"] \
                .sum()
            win = _argmax(cnt)
            new = labels.copy()
            pos = np.searchsorted(ids, win["node"].to_numpy())
            new[pos] = win["lab"].to_numpy()
            labels = new
        return rd.from_pandas(pd.DataFrame({"node": ids,
                                            "label": labels}))

    # fully distributed rounds: labels live as a Dataset
    labels_ds = nodes_pd.map_batches(
        lambda df: pd.DataFrame({"node": df["node"].to_numpy(),
                                 "lab": df["node"].to_numpy()}),
        batch_format="pandas").materialize()
    for _ in range(iters):
        msgs = []
        for ecol, other in (("a", "b"), ("b", "a")):
            e = edges.map_batches(
                lambda df, c=ecol, o=other: pd.DataFrame(
                    {"node": df[o].to_numpy(),
                     "recv": df[c].to_numpy()}),
                batch_format="pandas")
            msgs.append(hash_join_bucketed(
                e, labels_ds, on="node", num_buckets=num_buckets)
                .map_batches(lambda df: pd.DataFrame(
                    {"node": df["recv"].to_numpy(),
                     "lab": df["lab"].to_numpy()}),
                    batch_format="pandas"))
        both = msgs[0].union(msgs[1])
        cnt = groupby_agg(both.map_batches(
            lambda df: df.groupby(["node", "lab"], sort=False)
            .size().reset_index(name="c"), batch_format="pandas"),
            ["node", "lab"], {"c": ("c", "sum")}, final="distributed")
        win = cnt.map_batches(
            lambda df: df.assign(
                __part=(pd.util.hash_array(df["node"].to_numpy())
                        % num_buckets).astype(np.int64)),
            batch_format="pandas") \
            .groupby("__part").map_groups(
                lambda df: _argmax(df), batch_format="pandas")
        # nodes with no incoming message keep their previous label
        keep = hash_join_bucketed(labels_ds, win, on="node",
                                  how="anti",
                                  num_buckets=num_buckets)
        labels_ds = win.union(keep).repartition(num_buckets) \
            .materialize()
    return labels_ds.map_batches(
        lambda df: pd.DataFrame({"node": df["node"].to_numpy(),
                                 "label": df["lab"].to_numpy()}),
        batch_format="pandas")


def bfs_distances(edges_ds, seeds, max_hops: int = 3,
                  src_col="src", dst_col="dst", num_buckets: int = 32,
                  broadcast_cap: int | None = None):
    """BFS hop distances from a seed set over an UNDIRECTED graph:
    returns (node, dist) for every node within ``max_hops`` hops
    (seeds at dist 0).  Synchronous frontier expansion with a fixed
    hop budget makes the result deterministic and SQL-unrollable
    (one DISTINCT-neighbor CTE per hop), like label_propagation.

    Distributed shape: one canonical-edge dedup exchange up front
    (kcore's), then per hop a frontier->neighbor expansion and a
    known-set anti.  Below ``broadcast_cap`` REACHED nodes the
    known/frontier sets broadcast as sorted arrays and each hop is
    one stateless edge pass emitting per-batch UNIQUE neighbor
    partials (bounded by reached nodes, never edge volume).  Above
    the cap, the frontier ships to edges via two bucketed semi-joins
    (src side + dst side), the candidate set dedups in a distributed
    grouped reduce and subtracts the known table with a bucketed
    anti-join — node state never reaches the driver.
    """
    import ray
    import ray.data as rd
    from .relational import groupby_agg, hash_join_bucketed

    cap = KCORE_BROADCAST_CAP if broadcast_cap is None else broadcast_cap

    def canon(df: pd.DataFrame) -> pd.DataFrame:
        a = df[src_col].to_numpy()
        b = df[dst_col].to_numpy()
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        m = lo != hi
        return pd.DataFrame({"a": lo[m], "b": hi[m]}).drop_duplicates()

    partial = edges_ds.map_batches(canon, batch_format="pandas") \
        .materialize()
    n_edges = partial.count()
    mode = "driver" if n_edges <= cap else "distributed"
    edges = groupby_agg(partial, ["a", "b"],
                        {"__n": ("a", "count")}, final=mode) \
        .map_batches(lambda df: df[["a", "b"]],
                     batch_format="pandas").materialize()

    seed_arr = np.unique(np.asarray(list(seeds), dtype=np.int64))

    if n_edges <= cap:
        # broadcast rounds: known ids + frontier as sorted arrays
        known = seed_arr.copy()
        dists = [pd.DataFrame({"node": seed_arr,
                               "dist": np.zeros(len(seed_arr),
                                                np.int64)})]
        frontier = seed_arr
        for h in range(1, max_hops + 1):
            if not len(frontier):
                break
            ref = ray.put(frontier)

            def neigh(df: pd.DataFrame) -> pd.DataFrame:
                f = ray.get(ref)
                a = df["a"].to_numpy()
                b = df["b"].to_numpy()
                ina = f[np.searchsorted(f, a).clip(0, len(f) - 1)] == a
                inb = f[np.searchsorted(f, b).clip(0, len(f) - 1)] == b
                cand = np.unique(np.concatenate([b[ina], a[inb]]))
                return pd.DataFrame({"node": cand})

            cand = np.unique(np.concatenate(
                [bt["node"].to_numpy() for bt in
                 edges.map_batches(neigh, batch_format="pandas")
                 .iter_batches(batch_format="pandas")] or
                [np.empty(0, np.int64)]))
            idx = np.searchsorted(known, cand).clip(0, len(known) - 1) \
                if len(known) else np.zeros(len(cand), np.int64)
            new = cand[known[idx] != cand] if len(known) else cand
            if not len(new):
                break
            dists.append(pd.DataFrame(
                {"node": new, "dist": np.full(len(new), h, np.int64)}))
            known = np.union1d(known, new)
            frontier = new
        out = pd.concat(dists, ignore_index=True)
        return rd.from_pandas(out.sort_values("node")
                              .reset_index(drop=True))

    # bucketed rounds: dist table lives as a Dataset end to end
    dist = rd.from_pandas(pd.DataFrame(
        {"node": seed_arr,
         "dist": np.zeros(len(seed_arr), np.int64)})).materialize()
    frontier = dist
    for h in range(1, max_hops + 1):
        fr_nodes = frontier.map_batches(
            lambda df: df[["node"]], batch_format="pandas")
        via_a = hash_join_bucketed(
            edges, fr_nodes.map_batches(
                lambda df: df.rename(columns={"node": "a"}),
                batch_format="pandas"),
            on="a", num_buckets=num_buckets).map_batches(
                lambda df: df.rename(columns={"b": "node"})[["node"]],
                batch_format="pandas")
        via_b = hash_join_bucketed(
            edges, fr_nodes.map_batches(
                lambda df: df.rename(columns={"node": "b"}),
                batch_format="pandas"),
            on="b", num_buckets=num_buckets).map_batches(
                lambda df: df.rename(columns={"a": "node"})[["node"]],
                batch_format="pandas")
        cand = groupby_agg(via_a.union(via_b), ["node"],
                           {"__n": ("node", "count")},
                           final="distributed").map_batches(
            lambda df: df[["node"]], batch_format="pandas")
        new = hash_join_bucketed(cand, dist.map_batches(
            lambda df: df[["node"]], batch_format="pandas"),
            on="node", how="anti",
            num_buckets=num_buckets).map_batches(
            lambda df, h=h: df.assign(
                dist=np.full(len(df), h, np.int64)),
            batch_format="pandas").repartition(num_buckets) \
            .materialize()
        if new.count() == 0:
            break
        dist = dist.union(new).repartition(num_buckets).materialize()
        frontier = new
    return dist


def personalized_pagerank(edges_ds, nodes_ds, seeds, damping=0.85,
                          iters=3, src_col="src", dst_col="dst",
                          node_col="node", num_buckets=32):
    """Personalized PageRank (topic-/trust-sensitive ranking — the
    TrustRank shape): teleport mass goes only to the ``seeds`` set,
    so rank measures proximity to trusted sources rather than global
    centrality.  Same broadcast fast path as pagerank_broadcast (rank
    vector via ray.put per iteration, one stateless pre-aggregated
    edge pass + one small grouped sum; <= ~1e8 nodes — shard the
    vector or use the shuffle pagerank beyond that); dangling mass
    recycles to the seed distribution, not uniformly.  Returns
    (node, rank)."""
    import ray

    nodes = np.sort(nodes_ds.to_pandas()[node_col]
                    .to_numpy(dtype=np.int64))
    n = len(nodes)
    seeds = np.asarray(sorted(set(int(s) for s in seeds)),
                       dtype=np.int64)
    si = np.searchsorted(nodes, seeds)
    ok = (si < n)
    ok &= nodes[np.clip(si, 0, n - 1)] == seeds
    t = np.zeros(n)
    hit = si[ok]
    if len(hit) == 0:
        raise ValueError("personalized_pagerank: no seed is a node")
    t[hit] = 1.0 / len(hit)
    ew = out_weighted_edges(edges_ds, src_col, dst_col,
                            num_buckets=num_buckets).materialize()
    rank = t.copy()

    for _ in range(iters):
        rref = ray.put((nodes, rank))

        def contribs(df: pd.DataFrame) -> pd.DataFrame:
            nd, r = ray.get(rref)
            sidx = np.searchsorted(nd, df[src_col].to_numpy())
            x = r[sidx] * df["w"].to_numpy()
            dst = df[dst_col].to_numpy()
            order = np.argsort(dst, kind="stable")
            dst_s, x_s = dst[order], x[order]
            cut = np.r_[True, dst_s[1:] != dst_s[:-1]]
            starts = np.flatnonzero(cut)
            sums = np.add.reduceat(x_s, starts)
            return pd.DataFrame({node_col: dst_s[starts],
                                 "__x": sums})

        inflow = groupby_agg(ew.map_batches(contribs,
                                            batch_format="pandas"),
                             [node_col], {"__x": ("__x", "sum")}) \
            .to_pandas()
        x = np.zeros(n)
        x[np.searchsorted(nodes, inflow[node_col].to_numpy())] = \
            inflow["__x"].to_numpy()
        dangling = max(rank.sum() - x.sum(), 0.0)
        rank = (1 - damping) * t + damping * (x + dangling * t)

    import ray.data as rd
    return rd.from_pandas(pd.DataFrame({node_col: nodes,
                                        "rank": rank}))
