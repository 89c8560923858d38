"""Distributed k-means over an embedding column.

The curation use (cluster-based dedup / diversity balancing, e.g.
SemDeDup-style pruning) needs Lloyd's algorithm at corpus scale: the
centroid set is tiny (k x dim) and broadcast via ``ray.put``; each
iteration is ONE stateless ``map_batches`` pass emitting per-batch
partial sums (k rows of (count, sum-vector) per batch), reduced on the
driver — no shuffle at all, and nothing driver-side grows with the
corpus.  That is the canonical Ray Data shape for centroid-style
iterative ML (same skeleton as ops/ann.ivf_build).

Everything runs in INTEGER arithmetic so results are bit-reproducible
and independently checkable: embeddings are quantized once
(``floor(x * scale + 0.5)``), distances are exact int64 sums of
squares, ties break to the lowest centroid id, and the centroid update
rounds the exact rational mean half-up via ``floor((2*s + c) / (2c))``
— every step expressible in SQL over the same parquet, which is how
the q63 oracle validates it value-exact (a float k-means could flip an
argmin on summation order and can't be oracled).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def quantize_batch(vecs, scale: int) -> np.ndarray:
    """list<float> column -> (n, dim) int64, floor(x*scale + 0.5)
    (round-half-up, matching SQL floor semantics for negatives)."""
    m = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
    return np.floor(m * scale + 0.5).astype(np.int64)


def _assign(q: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """Exact int64 squared distances; ties -> lowest centroid id
    (np.argmin picks the first minimum)."""
    qq = (q * q).sum(axis=1, keepdims=True)
    cc = (cents * cents).sum(axis=1)[None, :]
    d = qq + cc - 2 * (q @ cents.T)
    return np.argmin(d, axis=1)


def kmeans_centroids(ds, k: int = 8, iters: int = 3, scale: int = 1024,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding",
                     checkpoint_dir: str | None = None) -> np.ndarray:
    """Train the centroids only: init = the quantized vectors of the
    ``k`` smallest ids (deterministic, seedless), then ``iters``
    assignment/update rounds.  Empty clusters keep their previous
    centroid.  The driver holds only centroids and per-batch partials
    (k rows each).  Returns the (k, dim) int64 centroid matrix.

    ``checkpoint_dir`` makes training resumable (the
    pagerank_checkpointed contract for the other iterative pipeline):
    each completed Lloyd iteration persists its integer centroid
    matrix + a manifest row (iteration, centroid-sum fingerprint);
    a fresh call with the same dir skips completed iterations and —
    because each iteration is a pure function of integer centroids —
    resumes bit-identical to an uninterrupted run (pytest-enforced).
    """
    import json
    import os

    import ray

    seed_df = ds.map_batches(
        lambda df: df[df[id_col] < k],
        batch_format="pandas").to_pandas().sort_values(id_col)
    if len(seed_df) < k:
        raise ValueError(f"need ids 0..{k-1} present for seeding, "
                         f"got {len(seed_df)}")
    cents = quantize_batch(seed_df[vec_col].tolist(), scale)

    manifest, man_path, start = [], None, 0
    if checkpoint_dir is not None:
        os.makedirs(checkpoint_dir, exist_ok=True)
        man_path = os.path.join(checkpoint_dir, "manifest.json")
        if os.path.exists(man_path):
            with open(man_path) as f:
                manifest = json.load(f)
        done = [m for m in manifest if m["status"] == "done"
                and m["iteration"] <= iters]
        start = max((m["iteration"] for m in done), default=0)
        if start:
            cents = np.load(os.path.join(
                checkpoint_dir, f"iter_{start:04d}.npy"))

    for it in range(start, iters):
        cref = ray.put(cents)

        def partials(df: pd.DataFrame) -> pd.DataFrame:
            c = ray.get(cref)
            q = quantize_batch(df[vec_col].tolist(), scale)
            lab = _assign(q, c)
            rows = []
            for cid in np.unique(lab):
                m = lab == cid
                rows.append({"cid": int(cid), "n": int(m.sum()),
                             "s": q[m].sum(axis=0)})
            return pd.DataFrame(rows)

        p = ds.map_batches(partials, batch_format="pandas").to_pandas()
        new = cents.copy()
        for cid, grp in p.groupby("cid", sort=False):
            s = np.sum(np.stack(grp["s"].tolist()), axis=0)
            n = int(grp["n"].sum())
            # round-half-up of the exact rational mean s/n
            new[int(cid)] = np.floor_divide(2 * s + n, 2 * n)
        cents = new
        if checkpoint_dir is not None:
            # atomic: write the matrix first, fsync the manifest last
            np.save(os.path.join(checkpoint_dir,
                                 f"iter_{it + 1:04d}.npy"), cents)
            manifest.append({"iteration": it + 1, "status": "done",
                             "fingerprint": int(cents.sum())})
            tmp = man_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(manifest, f)
                f.flush()
                os.fsync(f.fileno())
            os.replace(tmp, man_path)
    return cents


def kmeans(ds, k: int = 8, iters: int = 3, scale: int = 1024,
           id_col: str = "vec_id", vec_col: str = "embedding",
           checkpoint_dir: str | None = None):
    """Lloyd's k-means; returns a Dataset of (id_col, cluster) —
    ``cluster`` is the centroid index after ``iters`` rounds.  The
    final labeling is a streaming map_batches against the broadcast
    trained centroids.  ``checkpoint_dir`` makes training resumable
    (see kmeans_centroids)."""
    import ray

    cref = ray.put(kmeans_centroids(ds, k, iters, scale, id_col,
                                    vec_col, checkpoint_dir))

    def label(df: pd.DataFrame) -> pd.DataFrame:
        c = ray.get(cref)
        q = quantize_batch(df[vec_col].tolist(), scale)
        return pd.DataFrame({
            id_col: df[id_col].to_numpy(),
            "cluster": _assign(q, c).astype(np.int64)})

    return ds.map_batches(label, batch_format="pandas")


def semantic_dedup(ds, k: int = 8, iters: int = 3, scale: int = 1024,
                   threshold: float = 0.95, id_col: str = "vec_id",
                   vec_col: str = "embedding"):
    """SemDeDup (Abbas et al. 2023): k-means partitions the corpus so
    the quadratic cosine comparison runs only WITHIN clusters — the
    cluster count is the scale knob (k ~ sqrt(n) bounds per-cluster
    pair cost; the all-pairs q15 path is the small-corpus baseline,
    LSH the shuffle alternative).

    One labeling pass (broadcast centroids) tags each row, a shuffle
    on the cluster id co-locates each cluster, and one vectorized
    normalized-matmul per cluster finds pairs; a row drops when some
    LOWER id in its cluster is >= threshold cosine-similar (keep one
    representative per duplicate set, lowest id wins).  Returns the
    SURVIVORS as a Dataset (id_col, cluster).
    """
    import ray

    cref = ray.put(kmeans_centroids(ds, k, iters, scale, id_col,
                                    vec_col))

    def label_keep(df: pd.DataFrame) -> pd.DataFrame:
        c = ray.get(cref)
        q = quantize_batch(df[vec_col].tolist(), scale)
        return pd.DataFrame({
            id_col: df[id_col].to_numpy(),
            vec_col: df[vec_col].to_numpy(),
            "cluster": _assign(q, c).astype(np.int64)})

    labeled = ds.map_batches(label_keep, batch_format="pandas")

    def dedupe_cluster(df: pd.DataFrame) -> pd.DataFrame:
        ids = df[id_col].to_numpy()
        mat = np.stack([np.asarray(v, np.float64)
                        for v in df[vec_col]])
        nrm = np.linalg.norm(mat, axis=1, keepdims=True)
        mat = mat / np.where(nrm == 0, 1, nrm)
        # blocked row scan: peak memory is block x cluster, never
        # cluster x cluster (a hot cluster would otherwise allocate
        # an O(c^2) similarity matrix)
        drop = np.zeros(len(ids), dtype=bool)
        step = 4096
        for s in range(0, len(ids), step):
            sims = mat[s:s + step] @ mat.T
            lower = ids[s:s + step, None] > ids[None, :]
            drop[s:s + step] = ((sims >= threshold) & lower).any(axis=1)
        return pd.DataFrame({
            id_col: ids[~drop],
            "cluster": df["cluster"].to_numpy()[~drop]})

    return labeled.groupby("cluster").map_groups(
        dedupe_cluster, batch_format="pandas")
