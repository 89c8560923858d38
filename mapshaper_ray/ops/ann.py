"""Approximate-nearest-neighbor search over an embedding column.

- ``brute_topk``: exact cosine top-k — the baseline.  Query matrix is
  broadcast (ray.put) once; each batch does one (B, d) @ (d, Q) matmul
  and emits per-query PARTIAL top-k rows; a tiny final reduce picks the
  global top-k.  The shuffle volume is k rows per (query, batch), never
  the embeddings.
- ``ivf_topk``: the scale path — a seeded k-means-lite coarse quantizer
  (fit on a driver-side sample once, broadcast), batches probe only the
  ``nprobe`` nearest centroids' vectors.  Same partial-topk reduce.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.where(n == 0, 1, n)


def _partial_topk_frame(ids, sims, k, query_ids):
    """per-query top-k from a (B, Q) sim matrix -> long frame."""
    out = []
    B, Q = sims.shape
    kk = min(k, B)
    for q in range(Q):
        col = sims[:, q]
        idx = np.argpartition(-col, kk - 1)[:kk]
        out.append(pd.DataFrame({
            "query_id": query_ids[q],
            "vec_id": ids[idx],
            "cosine": col[idx]}))
    return pd.concat(out, ignore_index=True)


def brute_topk(ds, queries: np.ndarray, query_ids, k=10,
               id_col="vec_id", emb_col="embedding",
               concurrency=(1, 8)):
    """Exact cosine top-k of every query against the dataset.
    Deterministic tie-break: higher cosine first, then lower vec_id."""
    import ray
    qm = _normalize(np.asarray(queries, dtype=np.float64))
    ref = ray.put((qm, np.asarray(query_ids)))

    class Scorer:
        def __init__(self):
            self.qm, self.qids = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            vecs = _normalize(np.stack(df[emb_col].to_numpy()).astype(np.float64))
            sims = vecs @ self.qm.T
            return _partial_topk_frame(df[id_col].to_numpy(), sims, k, self.qids)

    partials = ds.map_batches(Scorer, batch_format="pandas",
                              batch_size=8192, concurrency=concurrency,
                              num_cpus=1)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["cosine", "vec_id"],
                            ascending=[False, True], kind="mergesort")
        return df.head(k)

    out = partials.groupby("query_id").map_groups(final, batch_format="pandas")
    return out


def kmeans_lite(sample: np.ndarray, n_clusters: int, iters: int = 8,
                seed: int = 3) -> np.ndarray:
    """Seeded deterministic k-means on a sample (driver side, small)."""
    rng = np.random.RandomState(seed)
    sample = _normalize(np.asarray(sample, dtype=np.float64))
    idx = rng.choice(len(sample), size=min(n_clusters, len(sample)),
                     replace=False)
    cents = sample[np.sort(idx)].copy()
    for _ in range(iters):
        assign = np.argmax(sample @ cents.T, axis=1)
        for c in range(len(cents)):
            m = assign == c
            if m.any():
                cents[c] = sample[m].mean(axis=0)
        cents = _normalize(cents)
    return cents


def ivf_topk(ds, queries: np.ndarray, query_ids, k=10, n_clusters=16,
             nprobe=4, id_col="vec_id", emb_col="embedding",
             sample_rows=4096, concurrency=(1, 8)):
    """IVF-style ANN: coarse centroids from a seeded sample; each batch
    scores only vectors whose nearest centroid is among each query's
    ``nprobe`` probed centroids."""
    import ray
    sample = np.stack(
        ds.limit(sample_rows).to_pandas()[emb_col].to_numpy()).astype(np.float64)
    cents = kmeans_lite(sample, n_clusters)
    qm = _normalize(np.asarray(queries, dtype=np.float64))
    qc = np.argsort(-(qm @ cents.T), axis=1)[:, :nprobe]  # (Q, nprobe)
    ref = ray.put((qm, np.asarray(query_ids), cents, qc))

    class Scorer:
        def __init__(self):
            self.qm, self.qids, self.cents, self.qc = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            vecs = _normalize(np.stack(df[emb_col].to_numpy()).astype(np.float64))
            vc = np.argmax(vecs @ self.cents.T, axis=1)  # vector->centroid
            frames = []
            ids = df[id_col].to_numpy()
            for q in range(len(self.qm)):
                mask = np.isin(vc, self.qc[q])
                if not mask.any():
                    continue
                sims = vecs[mask] @ self.qm[q]
                sub_ids = ids[mask]
                kk = min(k, len(sims))
                idx = np.argpartition(-sims, kk - 1)[:kk]
                frames.append(pd.DataFrame({
                    "query_id": self.qids[q],
                    "vec_id": sub_ids[idx],
                    "cosine": sims[idx]}))
            if not frames:
                return pd.DataFrame({"query_id": [], "vec_id": [],
                                     "cosine": []})
            return pd.concat(frames, ignore_index=True)

    partials = ds.map_batches(Scorer, batch_format="pandas",
                              batch_size=8192, concurrency=concurrency,
                              num_cpus=1)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["cosine", "vec_id"],
                            ascending=[False, True], kind="mergesort")
        return df.head(k)

    return partials.groupby("query_id").map_groups(final, batch_format="pandas")


def pq_train(sample: np.ndarray, m_subspaces: int, n_codes: int,
             iters: int = 10, seed: int = 5) -> np.ndarray:
    """Seeded product-quantization codebooks (Jégou et al. 2011,
    "Product Quantization for Nearest Neighbor Search" — public):
    Lloyd k-means with EUCLIDEAN assignment per subspace over a
    normalized sample.  Returns (m, n_codes, dim/m)."""
    rng = np.random.RandomState(seed)
    sample = _normalize(np.asarray(sample, dtype=np.float64))
    dim = sample.shape[1]
    if dim % m_subspaces:
        raise ValueError(f"dim {dim} not divisible by m={m_subspaces}")
    dsub = dim // m_subspaces
    books = np.empty((m_subspaces, n_codes, dsub))
    for s in range(m_subspaces):
        sub = sample[:, s * dsub:(s + 1) * dsub]
        idx = rng.choice(len(sub), size=min(n_codes, len(sub)),
                         replace=False)
        cents = sub[np.sort(idx)].copy()
        for _ in range(iters):
            d2 = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
            assign = np.argmin(d2, axis=1)
            for c in range(len(cents)):
                mask = assign == c
                if mask.any():
                    cents[c] = sub[mask].mean(axis=0)
        books[s, :len(cents)] = cents
        if len(cents) < n_codes:          # tiny-sample degenerate pad
            books[s, len(cents):] = cents[-1]
    return books


def pq_encode(ds, books: np.ndarray, id_col="vec_id",
              emb_col="embedding", concurrency=(1, 8)):
    """Encode vectors to m uint8 codes (nearest codebook centroid per
    subspace, euclidean).  The codes Dataset is the scan-side index:
    at 64-dim float32 and m=8 it is ~32x smaller than the vectors, so
    a 100-TB embedding corpus scans ~3 TB of codes."""
    import ray
    bref = ray.put(books)
    m, _, dsub = books.shape

    class Encoder:
        def __init__(self):
            self.books = ray.get(bref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            vecs = _normalize(np.stack(df[emb_col].to_numpy())
                              .astype(np.float64))
            codes = np.empty((len(vecs), m), dtype=np.uint8)
            for s in range(m):
                sub = vecs[:, s * dsub:(s + 1) * dsub]
                d2 = ((sub[:, None, :] - self.books[s][None, :, :])
                      ** 2).sum(-1)
                codes[:, s] = np.argmin(d2, axis=1)
            return pd.DataFrame({
                id_col: df[id_col].to_numpy(),
                "pq_code": [row.tobytes() for row in codes]})

    return ds.map_batches(Encoder, batch_format="pandas",
                          batch_size=8192, concurrency=concurrency,
                          num_cpus=1)


def pq_topk(ds, queries: np.ndarray, query_ids, k=10, m_subspaces=8,
            n_codes=16, shortlist=8, id_col="vec_id",
            emb_col="embedding", sample_rows=4096,
            concurrency=(1, 8)):
    """PQ ANN with exact re-rank: (1) codebooks train on a seeded
    sample; (2) vectors encode ONCE to uint8 codes (``pq_encode``) and
    the codes Dataset materializes — the 32x-smaller scan side;
    (3) each query scans the codes via an ADC lookup table
    (approx cosine = sum of per-subspace dot-product table entries —
    a (m, n_codes) table per query, the scan itself is a take-along +
    sum, no vector math); per-partition ``shortlist*k`` candidates
    reduce to a global shortlist per query; (4) only the shortlisted
    ids re-rank EXACTLY against the original vectors (broadcast id
    set, one filtered pass).  Output contract = brute_topk: exact
    cosine, (cosine desc, vec_id) order — identical to the exact
    top-k whenever the true top-k survives the ADC pre-screen, which
    the generous default shortlist guarantees at the validated scales
    (pytest + q70 oracle); recall/scan-cost trades via ``shortlist``.
    """
    import ray

    sample = np.stack(ds.limit(sample_rows).to_pandas()[emb_col]
                      .to_numpy()).astype(np.float64)
    books = pq_train(sample, m_subspaces, n_codes)
    codes_ds = pq_encode(ds, books, id_col=id_col, emb_col=emb_col,
                         concurrency=concurrency).materialize()

    qm = _normalize(np.asarray(queries, dtype=np.float64))
    dsub = books.shape[2]
    # ADC tables: lut[q, s, c] = q_sub(s) . centroid(s, c)
    lut = np.einsum("qsd,scd->qsc",
                    qm.reshape(len(qm), m_subspaces, dsub), books)
    lref = ray.put((lut, np.asarray(query_ids)))
    nshort = shortlist * k

    class AdcScan:
        def __init__(self):
            self.lut, self.qids = ray.get(lref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            codes = np.frombuffer(
                b"".join(df["pq_code"]), dtype=np.uint8) \
                .reshape(len(df), m_subspaces)
            ids = df[id_col].to_numpy()
            frames = []
            for q in range(len(self.lut)):
                approx = np.take_along_axis(
                    self.lut[q], codes.T, axis=1).sum(axis=0)
                kk = min(nshort, len(approx))
                idx = np.argpartition(-approx, kk - 1)[:kk]
                frames.append(pd.DataFrame({
                    "query_id": self.qids[q], "vec_id": ids[idx],
                    "approx": approx[idx]}))
            return pd.concat(frames, ignore_index=True)

    def shortlist_final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["approx", "vec_id"],
                            ascending=[False, True], kind="mergesort")
        return df.head(nshort)[["query_id", "vec_id"]]

    cand = codes_ds.map_batches(AdcScan, batch_format="pandas",
                                batch_size=65536,
                                concurrency=concurrency, num_cpus=1) \
        .groupby("query_id").map_groups(shortlist_final,
                                        batch_format="pandas") \
        .to_pandas()
    # bounded driver state: Q * shortlist * k ids
    keep = np.unique(cand["vec_id"].to_numpy())
    kref = ray.put((qm, np.asarray(query_ids), keep))

    class Rerank:
        def __init__(self):
            self.qm, self.qids, keep = ray.get(kref)
            self.keep = keep

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            mask = np.isin(df[id_col].to_numpy(), self.keep)
            if not mask.any():
                return pd.DataFrame({"query_id": [], "vec_id": [],
                                     "cosine": []})
            df = df[mask]
            vecs = _normalize(np.stack(df[emb_col].to_numpy())
                              .astype(np.float64))
            sims = vecs @ self.qm.T
            return _partial_topk_frame(df[id_col].to_numpy(), sims,
                                       k, self.qids)

    partials = ds.map_batches(Rerank, batch_format="pandas",
                              batch_size=8192,
                              concurrency=concurrency, num_cpus=1)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["cosine", "vec_id"],
                            ascending=[False, True], kind="mergesort")
        return df.head(k)

    return partials.groupby("query_id").map_groups(
        final, batch_format="pandas")


def random_project(ds, out_dim: int = 8, col: str = "embedding",
                   id_col: str = "vec_id"):
    """Johnson-Lindenstrauss sign random projection — the
    dimensionality-reduction preprocessing step before ANN / LSH at
    corpus scale: ``y_k = sum_j v_j * s(j, k)`` with the sign matrix
    ``s(j, k) = +1 if md5_number_lower(f"{j}:{k}") is even else -1``
    (Achlioptas 2003: +-1 entries satisfy the JL lemma).

    Deterministic and data-independent: the d x out_dim sign matrix
    is derived from md5, so a SQL oracle reproduces it exactly; it is
    built once on the driver (tiny) and travels in the task closure.
    Per batch one (n x d) @ (d x out_dim) float64 matmul.  Output is
    long-form (id, k, y) rounded to 6 decimals for value-exact
    comparison.  j is 1-based (SQL generate_series convention),
    k 0-based.
    """
    import pandas as pd
    import pyarrow as pa

    from ..stages.text import md5_lo64

    def signs(d: int) -> np.ndarray:
        h = md5_lo64([f"{j}:{k}" for j in range(1, d + 1)
                      for k in range(out_dim)])
        return np.where(h % 2 == 0, 1.0, -1.0).reshape(d, out_dim)

    smat = {}

    def project(batch: "pa.Table") -> "pa.Table":
        schema = pa.schema([(id_col, pa.int64()), ("k", pa.int64()),
                            ("y", pa.float64())])
        if batch.num_rows == 0:
            return schema.empty_table()
        df = batch.to_pandas()
        vecs = np.stack(df[col].to_numpy()).astype(np.float64)
        d = vecs.shape[1]
        if d not in smat:
            smat[d] = signs(d)
        y = vecs @ smat[d]
        n = len(df)
        ids = np.repeat(df[id_col].to_numpy().astype(np.int64),
                        out_dim)
        ks = np.tile(np.arange(out_dim, dtype=np.int64), n)
        return pa.Table.from_arrays(
            [pa.array(ids), pa.array(ks),
             pa.array(np.round(y.ravel(), 6))], schema=schema)

    return ds.map_batches(project, batch_format="pyarrow")


def nn_join(query_ds, corpus_ds, k=10, id_col="vec_id",
            emb_col="embedding", concurrency=(1, 8)):
    """Dataset×dataset exact cosine top-k join: for every row of
    ``query_ds`` find its k nearest ``corpus_ds`` rows.  Unlike
    ``brute_topk`` (query MATRIX broadcast from the driver), both
    sides here are Datasets and neither touches the driver:

    - the query side materializes to Arrow blocks in the OBJECT STORE
      (``to_arrow_refs``) — ``ray.put``-equivalent, shipped once, read
      zero-copy by every scorer task;
    - the corpus streams through an actor pool; each batch loops over
      the query BLOCKS (plasma-resident, normalized once per actor
      and cached), does one (B, d) @ (d, Qblk) matmul per block, and
      emits per-query PARTIAL top-k rows;
    - a grouped final reduce keeps the global top-k per query.

    Memory per task = one corpus batch + one normalized query block;
    shuffle volume = k rows per (query, corpus-batch).  Tie-break:
    higher cosine, then lower corpus id (matches brute_topk / q14).
    """
    import ray

    refs = query_ds.materialize().to_arrow_refs()
    empty = pd.DataFrame({"query_id": np.empty(0, np.int64),
                          id_col: np.empty(0, np.int64),
                          "cosine": np.empty(0, np.float64)})

    class Scorer:
        """Actor-pool stage: the normalized query blocks are cached in
        ``__init__``-owned state, so each actor pays the plasma read +
        normalize once and every subsequent corpus batch reuses it."""

        def __init__(self):
            self.cache: dict = {}

        def _qblock(self, ref):
            key = ref.hex() if hasattr(ref, "hex") else id(ref)
            got = self.cache.get(key)
            if got is None:
                df = ray.get(ref).to_pandas()
                qm = (_normalize(np.stack(df[emb_col].to_numpy())
                                 .astype(np.float64))
                      if len(df) else np.empty((0, 1)))
                got = (df[id_col].to_numpy(), qm)
                self.cache[key] = got
            return got

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            if not len(df):
                return empty.copy()
            vecs = _normalize(
                np.stack(df[emb_col].to_numpy()).astype(np.float64))
            ids = df[id_col].to_numpy()
            out = []
            for ref in refs:
                qids, qm = self._qblock(ref)
                if not len(qids):
                    continue
                sims = vecs @ qm.T
                out.append(_partial_topk_frame(ids, sims, k, qids))
            return (pd.concat(out, ignore_index=True) if out
                    else empty.copy())

    partials = corpus_ds.map_batches(Scorer, batch_format="pandas",
                                     batch_size=8192,
                                     concurrency=concurrency, num_cpus=1)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["cosine", id_col],
                            ascending=[False, True], kind="mergesort")
        return df.head(k)

    return partials.groupby("query_id").map_groups(
        final, batch_format="pandas")


def scalar_quantize(ds, col: str = "embedding",
                    id_col: str = "vec_id", levels: int = 256):
    """Per-dimension scalar quantization of an embedding column to
    ``levels`` integer codes (int8 SQ — the standard 4x vector
    compression before ANN at corpus scale): pass 1 reduces per-dim
    min/max (one (2, d) float row per batch, d doubles on the
    driver); pass 2 is stateless — qv = floor((v - mn_k) /
    (mx_k - mn_k) * (levels - 1)), all single IEEE ops so a SQL
    oracle matches exactly (constant dims quantize to 0).

    Output is long-form (id_col, k, qv) with k 1-based (SQL
    generate_series convention).  The codes dataset is
    ``levels<=256`` -> 1 byte per dim vs 4 for float32.
    """
    import pandas as pd
    import pyarrow as pa

    def mm_partial(batch: "pa.Table") -> "pd.DataFrame":
        df = batch.to_pandas()
        if not len(df):
            return pd.DataFrame({"k": np.empty(0, np.int64),
                                 "mn": np.empty(0),
                                 "mx": np.empty(0)})
        vecs = np.stack(df[col].to_numpy()).astype(np.float64)
        d = vecs.shape[1]
        return pd.DataFrame({"k": np.arange(1, d + 1),
                             "mn": vecs.min(axis=0),
                             "mx": vecs.max(axis=0)})

    mm = ds.map_batches(mm_partial, batch_format="pyarrow") \
        .to_pandas().groupby("k").agg(mn=("mn", "min"),
                                      mx=("mx", "max"))
    mn = mm["mn"].to_numpy(np.float64)
    mx = mm["mx"].to_numpy(np.float64)
    rng_ok = mx > mn

    def quantize(batch: "pa.Table") -> "pa.Table":
        schema = pa.schema([(id_col, pa.int64()), ("k", pa.int64()),
                            ("qv", pa.int64())])
        if batch.num_rows == 0:
            return schema.empty_table()
        df = batch.to_pandas()
        vecs = np.stack(df[col].to_numpy()).astype(np.float64)
        n, d = vecs.shape
        with np.errstate(divide="ignore", invalid="ignore"):
            q = np.floor((vecs - mn[None, :]) / (mx - mn)[None, :]
                         * (levels - 1))
        q = np.where(rng_ok[None, :], q, 0.0).astype(np.int64)
        ids = np.repeat(df[id_col].to_numpy().astype(np.int64), d)
        ks = np.tile(np.arange(1, d + 1, dtype=np.int64), n)
        return pa.table({id_col: ids, "k": ks, "qv": q.ravel()},
                        schema=schema)

    return ds.map_batches(quantize, batch_format="pyarrow")


def gram_matrix(ds, col: str = "embedding", id_col: str = "vec_id",
                levels: int = 256):
    """Distributed integer Gram matrix over int8-quantized
    embeddings — the sufficient statistics for covariance / PCA
    whitening at corpus scale: per-dim min/max reduce (pass 1, same
    as :func:`scalar_quantize`), then each batch contributes
    Q^T Q (d x d int64 matmul), per-dim code sums and a row count —
    ALL integer partials, so the reduce is order-independent and the
    SQL mirror matches exactly (no float-sum ordering hazard; that
    is WHY the Gram runs on the quantized codes, not raw floats).

    Only d x d partials travel — the corpus never shuffles.  Returns
    long-form rows (i, j, v), 1-based, i <= j for second moments,
    (i, 0) per-dim sums, (0, 0) the row count; covariance follows as
    (G[i,j] - s_i s_j / n) / n on the consumer side.
    """
    import pandas as pd
    import pyarrow as pa

    def mm_partial(batch: "pa.Table") -> "pd.DataFrame":
        df = batch.to_pandas()
        if not len(df):
            return pd.DataFrame({"k": np.empty(0, np.int64),
                                 "mn": np.empty(0),
                                 "mx": np.empty(0)})
        vecs = np.stack(df[col].to_numpy()).astype(np.float64)
        d = vecs.shape[1]
        return pd.DataFrame({"k": np.arange(1, d + 1),
                             "mn": vecs.min(axis=0),
                             "mx": vecs.max(axis=0)})

    mm = ds.map_batches(mm_partial, batch_format="pyarrow") \
        .to_pandas().groupby("k").agg(mn=("mn", "min"),
                                      mx=("mx", "max"))
    mn = mm["mn"].to_numpy(np.float64)
    mx = mm["mx"].to_numpy(np.float64)
    rng_ok = mx > mn

    def gram_partial(batch: "pa.Table") -> "pd.DataFrame":
        df = batch.to_pandas()
        if not len(df):
            return pd.DataFrame({"i": np.empty(0, np.int64),
                                 "j": np.empty(0, np.int64),
                                 "v": np.empty(0, np.int64)})
        vecs = np.stack(df[col].to_numpy()).astype(np.float64)
        n, d = vecs.shape
        with np.errstate(divide="ignore", invalid="ignore"):
            q = np.floor((vecs - mn[None, :]) / (mx - mn)[None, :]
                         * (levels - 1))
        q = np.where(rng_ok[None, :], q, 0.0).astype(np.int64)
        G = q.T @ q                       # exact int64 matmul
        iu, ju = np.triu_indices(d)
        return pd.DataFrame({
            "i": np.concatenate([iu + 1,
                                 np.arange(1, d + 1), [0]]),
            "j": np.concatenate([ju + 1,
                                 np.zeros(d, np.int64), [0]]),
            "v": np.concatenate([G[iu, ju], q.sum(axis=0), [n]])})

    from .relational import groupby_agg
    out = groupby_agg(
        ds.map_batches(gram_partial, batch_format="pyarrow"),
        ["i", "j"], {"v": ("v", "sum")})
    return out.map_batches(
        lambda df: df.astype({"i": np.int64, "j": np.int64,
                              "v": np.int64}),
        batch_format="pandas")


def pool_embeddings(ds, key_col: str, vec_col: str = "embedding",
                    mode: str = "mean", qscale: int = 1 << 20,
                    n_parts: int = 32):
    """Per-group embedding pooling — the chunk-embeddings -> document
    embedding step of a retrieval/curation pipeline: for each key,
    the element-wise mean (or max) over its vectors.

    Exactness contract: elements quantize to ``floor(x * qscale)``
    int64, per-(key, dim) sums/maxes are exact integer reduces, and
    ``mean_q = s // n`` stays integer — so a SQL mirror over
    ``unnest WITH ORDINALITY`` is value-exact (no float summation
    order anywhere).

    Distributed shape: each batch stacks its vectors once
    (np.reshape over the Arrow list values, zero Python loops) and
    collapses to (key, dim) partials — groups x dim rows per batch,
    never the corpus — then one bounded grouped reduce.  Returns
    (key, dim, n, pooled_q) long-form, ordered.
    """
    from .relational import groupby_agg

    agg_fn = "sum" if mode == "mean" else "max"

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"k": pd.Series([], dtype=object),
                                 "dim": pd.Series([], dtype=np.int64),
                                 "s": pd.Series([], dtype=np.int64),
                                 "n": pd.Series([], dtype=np.int64)})
        mat = np.stack([np.asarray(v, dtype=np.float64)
                        for v in df[vec_col]])
        q = np.floor(mat * qscale).astype(np.int64)
        d = q.shape[1]
        keys = df[key_col].to_numpy()
        g = pd.DataFrame({"k": np.repeat(keys, d),
                          "dim": np.tile(np.arange(d, dtype=np.int64),
                                         len(df)),
                          "s": q.ravel(),
                          "n": 1})
        return g.groupby(["k", "dim"], as_index=False) \
            .agg(s=("s", agg_fn), n=("n", "sum"))

    out = groupby_agg(ds.map_batches(partial, batch_format="pandas"),
                      ["k", "dim"], {"s": ("s", agg_fn),
                                     "n": ("n", "sum")},
                      final="distributed").to_pandas()
    if not len(out):
        return pd.DataFrame({key_col: pd.Series([], dtype=object),
                             "dim": pd.Series([], dtype=np.int64),
                             "n": pd.Series([], dtype=np.int64),
                             "pooled_q": pd.Series([],
                                                   dtype=np.int64)})
    out = out.rename(columns={"k": key_col})
    if mode == "mean":
        # DuckDB's integer ``//`` truncates toward zero, so mirror
        # that exactly (np.floor_divide floors, which differs on
        # negative sums)
        s = out["s"].to_numpy(np.int64)
        n = out["n"].to_numpy(np.int64)
        out["pooled_q"] = np.sign(s) * (np.abs(s) // n)
    else:
        out["pooled_q"] = out["s"]
    out = out[[key_col, "dim", "n", "pooled_q"]] \
        .astype({"dim": np.int64, "n": np.int64, "pooled_q": np.int64})
    return out.sort_values([key_col, "dim"]).reset_index(drop=True)
