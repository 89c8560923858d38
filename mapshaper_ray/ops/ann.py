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
