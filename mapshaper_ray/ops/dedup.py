"""Deduplication operators for large-scale training-data pipelines.

- ``exact_dedup``:     md5-of-content hash-partition + keep-first
  (first = lowest order key — reproducible regardless of partitioning).
- ``minhash_lsh``:     shingle → minhash (P permutations) → band-bucket
  groupby → candidate pairs → exact Jaccard verify.  The shuffle moves
  only (band_id, band_hash, doc_id) triples, never documents.
- ``simhash``:         64-bit simhash per doc + bucket grouping on the
  top-16-bit prefix for candidate generation.
- ``ngram_jaccard_pairs``: exact n-gram Jaccard for a candidate pair set.
- ``all_pairs_jaccard``:   EXACT all-pairs n-gram Jaccard via prefix
  filtering (PPJoin prefix property) — every qualifying pair, no
  probabilistic stage.
- ``embedding_near_dup``: cosine near-dup via random-hyperplane LSH
  buckets, verified by exact cosine inside each bucket.

All per-doc work is vectorized (token hashing via pandas siphash, minhash
via one (P, m) universal-hash broadcast per doc batch); shuffles are
explicit groupbys on small key tables.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd

from ..stages.text import hash_tokens, window_hashes
from .partition import GOLD as _CC_GOLD, bucket_part

_MERSENNE = np.uint64((1 << 61) - 1)

# candidate-pair rows above which minhash_lsh abandons the bounded
# driver collect for the fully distributed verify (~32 MB at the cap)
MINHASH_DRIVER_PAIR_CAP = 2_000_000


def content_md5(texts) -> list[str]:
    return [hashlib.md5(t.encode() if isinstance(t, str) else t).hexdigest()
            for t in texts]


def exact_dedup(ds, text_col="text", order_col="doc_id"):
    """Keep the first (lowest order_col) row per identical content.
    Hash-partition on the content hash; per-group first."""
    def add_hash(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["content_md5"] = content_md5(df[text_col])
        return df

    hashed = ds.map_batches(add_hash, batch_format="pandas")

    def first(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(order_col, kind="mergesort").head(1)

    return hashed.groupby("content_md5").map_groups(first,
                                                    batch_format="pandas")


class _MinHasher:
    """Stateful minhash signature computer (permutation params built once
    per actor)."""

    def __init__(self, num_perm=64, shingle_k=5, text_col="text", seed=7):
        self.text_col = text_col
        self.k = shingle_k
        rng = np.random.RandomState(seed)
        # universal hashing: h_i(x) = (a_i * x + b_i) mod p
        self.a = rng.randint(1, (1 << 61) - 1, size=num_perm).astype(np.uint64)
        self.b = rng.randint(0, (1 << 61) - 1, size=num_perm).astype(np.uint64)
        self.ws = re.compile(r"\S+")

    def signature(self, sh: np.ndarray) -> np.ndarray:
        with np.errstate(over="ignore"):
            # (P, m) broadcast; mod 2^64 wraparound then mersenne fold
            hv = (self.a[:, None] * sh[None, :] + self.b[:, None]) % _MERSENNE
        return hv.min(axis=1)

    def doc_shingle_sets(self, texts):
        """Per doc, the k-token-window md5 shingle hashes (multiset;
        np.unique for set semantics) — SQL-reproducible."""
        return [window_hashes(self.ws.findall(t), self.k) for t in texts]


def _bucket_pairs(key: np.ndarray, ids_all: np.ndarray):
    """Vectorized same-bucket pair emission via lexsort run
    detection (a python loop over every bucket is 100x slower)."""
    order = np.lexsort((ids_all, key))
    ks = key[order]
    ids_s = ids_all[order]
    boundary = np.nonzero(np.diff(ks))[0] + 1
    starts = np.concatenate([[0], boundary])
    ends = np.concatenate([boundary, [len(ks)]])
    pa_, pb_ = [], []
    for s, e in zip(starts, ends):
        if e - s < 2:
            continue
        u = np.unique(ids_s[s:e])
        if len(u) < 2:
            continue
        ia, ib = np.triu_indices(len(u), k=1)
        pa_.append(u[ia])
        pb_.append(u[ib])
    if not pa_:
        return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                             "id_b": pd.Series([], dtype="int64")})
    return pd.DataFrame({"id_a": np.concatenate(pa_),
                         "id_b": np.concatenate(pb_)})


def minhash_lsh(ds, num_perm=64, bands=16, shingle_k=5, threshold=0.5,
                text_col="text", id_col="doc_id", concurrency=None,
                band_grouping="distributed"):
    """Near-duplicate pairs via MinHash+LSH.

    Returns verified pairs (id_a, id_b, jaccard) with id_a < id_b and
    jaccard >= threshold.  Pipeline:
      docs -> (band_id, band_hash, doc_id) rows     [map_batches tasks]
           -> group by (band_id, band_hash)          [exchange #1]
           -> candidate pairs (small side, ray.put broadcast)
           -> shingle sets of candidate docs emitted per pair
           -> group by pair                          [exchange #2]
           -> exact Jaccard per pair in map_groups

    ``band_grouping="distributed"`` (default, the 100 TB path) groups
    band triples with a Ray groupby; "driver" reduces the tiny triple
    table on the driver (faster below ~10^6 docs — the documents never
    move either way).  The VERIFY stage is always distributed: the
    driver holds only candidate PAIR IDS (bounded by the near-dup
    count), never a dict of shingle sets, and each pair's exact Jaccard
    is computed inside a map_groups task.
    ``concurrency=None`` runs the emitters as task pools (fuse with the
    read, reuse warm workers); pass a value for an actor pool."""
    import ray
    rows_per_band = num_perm // bands

    import pyarrow as pa

    class BandEmitter:
        """Arrow-native band emit (SURVEY §7.0): the input text column
        reads zero-copy from the object store; output is a packed
        numeric pa.Table — no pandas block on the hot emit stage."""

        def __init__(self):
            self.mh = _MinHasher(num_perm, shingle_k, text_col)

        def __call__(self, t: pa.Table) -> pa.Table:
            texts = t[text_col].to_pylist()
            ids = t[id_col].to_numpy()
            sets = self.mh.doc_shingle_sets(texts)
            n = len(ids)
            bh_all = np.empty((n, bands), dtype=np.uint64)
            for i, sh in enumerate(sets):
                hv = self.mh.signature(sh)
                bsig = hv.reshape(bands, rows_per_band)
                bh_all[i] = pd.util.hash_array(
                    np.ascontiguousarray(bsig).view(
                        [("", np.uint64)] * rows_per_band).ravel())
            return pa.table({
                "band_id": pa.array(np.tile(
                    np.arange(bands, dtype=np.int64), n)),
                "band_hash": pa.array(bh_all.ravel()),
                id_col: pa.array(np.repeat(ids, bands))})

    if concurrency is None:
        triples = ds.map_batches(BandEmitter(), batch_format="pyarrow",
                                 batch_size=2048)
    else:
        triples = ds.map_batches(BandEmitter, batch_format="pyarrow",
                                 batch_size=2048, concurrency=concurrency,
                                 num_cpus=1)

    if band_grouping == "driver":
        # run detection over the driver-collected band table (the
        # triple table is tiny relative to the corpus)
        tp = triples.to_pandas()
        key = (tp["band_hash"].to_numpy().astype(np.uint64) ^
               (tp["band_id"].to_numpy().astype(np.uint64) *
                np.uint64(0x9E3779B97F4A7C15)))
        cand_pd = _bucket_pairs(key, tp[id_col].to_numpy()) \
            .drop_duplicates()
    else:
        # COARSE-grained distributed grouping: shuffle by bucket-hash
        # mod P (each partition receives every row of its buckets), run
        # the vectorized bucket-pair detection once per partition — NOT
        # one map_groups call per bucket (~n_docs*bands tiny groups is
        # pure per-group overhead, measured 8x the whole driver path)
        n_parts = 64

        def add_part(df: pd.DataFrame) -> pd.DataFrame:
            key = (df["band_hash"].to_numpy().astype(np.uint64) ^
                   (df["band_id"].to_numpy().astype(np.uint64) *
                    np.uint64(0x9E3779B97F4A7C15)))
            df = df.copy()
            df["__bkey"] = key.astype(np.int64)
            df["__part"] = (key % np.uint64(n_parts)).astype(np.int64)
            return df

        def part_pairs(df: pd.DataFrame) -> pd.DataFrame:
            return _bucket_pairs(df["__bkey"].to_numpy(),
                                 df[id_col].to_numpy())

        cand = triples.map_batches(add_part, batch_format="pandas") \
            .groupby("__part").map_groups(part_pairs,
                                          batch_format="pandas") \
            .materialize()

        # BOUNDED driver collect: the candidate table reaches the
        # driver only when a distributed count proves it small (a
        # normal corpus has O(near-dups) candidates; ~2M rows = 32 MB).
        # Above the cap — the degenerate all-dup regime — the fully
        # distributed verify below runs instead, at the cost of three
        # extra exchanges (~6 s fixed in Ray 2.49, why it is not the
        # unconditional path).
        if cand.count() <= MINHASH_DRIVER_PAIR_CAP:
            cand_pd = cand.to_pandas().drop_duplicates(["id_a", "id_b"])
        else:
            cand_pd = None
    if cand_pd is not None and len(cand_pd) == 0:
        return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                             "id_b": pd.Series([], dtype="int64"),
                             "jaccard": pd.Series([], dtype="float64")})
    if cand_pd is None:
        # FULLY DISTRIBUTED verify path — the candidate PAIR TABLE
        # never materializes on the driver; only the unique member-ID
        # COLUMN — ≤ corpus size — is pulled for read pruning:
        #   1. pairs dedupe per pair-hash partition   [exchange]
        #   2. docs in any pair emit (doc, shingles); pairs emit two
        #      (doc, id_a, id_b) probe rows; both shuffle by doc-hash
        #      partition and shingles attach via an in-partition merge
        #   3. attached rows shuffle by pair-hash partition; one exact
        #      Jaccard per complete pair (vectorized run detection)
        import ray

        def pair_bucket(df: pd.DataFrame) -> pd.DataFrame:
            h = (df["id_a"].to_numpy().astype(np.uint64)
                 * np.uint64(0x9E3779B97F4A7C15)
                 ^ df["id_b"].to_numpy().astype(np.uint64)
                 * np.uint64(0xC2B2AE3D27D4EB4F))
            return df.assign(__pp=(h % np.uint64(n_parts))
                             .astype(np.int64))

        def dedupe_pairs(df: pd.DataFrame) -> pd.DataFrame:
            return df.drop_duplicates(["id_a", "id_b"])
        pairs = cand.map_batches(pair_bucket, batch_format="pandas") \
            .groupby("__pp").map_groups(dedupe_pairs,
                                        batch_format="pandas")

        # unique member ids: a single int64 column on the driver,
        # strictly smaller than the corpus — prunes shingle compute
        member_ids = np.unique(np.concatenate([
            pairs.map_batches(
                lambda df: pd.DataFrame({
                    "m": np.concatenate([df["id_a"].to_numpy(),
                                         df["id_b"].to_numpy()])
                    if len(df) else np.array([], dtype=np.int64)}),
                batch_format="pandas").to_pandas()["m"].to_numpy(),
            np.array([], dtype=np.int64)]))
        if len(member_ids) == 0:
            return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                 "id_b": pd.Series([], dtype="int64"),
                                 "jaccard": pd.Series([], dtype="float64")})
        member_ref = ray.put(member_ids)
        mh = _MinHasher(num_perm, shingle_k, text_col)

        def probe_rows(df: pd.DataFrame) -> pd.DataFrame:
            a = df["id_a"].to_numpy()
            b = df["id_b"].to_numpy()
            doc = np.concatenate([a, b]) if len(df) else \
                np.array([], dtype=np.int64)
            return pd.DataFrame({
                id_col: doc,
                "id_a": np.concatenate([a, a]) if len(df) else doc,
                "id_b": np.concatenate([b, b]) if len(df) else doc,
                # EMPTY arrays, not None: Ray's sort exchange rejects
                # object columns holding non-ndarray scalars; real
                # shingle sets are never empty (>=1 hash per doc)
                "shingles": [np.array([], dtype=np.uint64)
                             for _ in range(2 * len(df))],
                "__dp": (doc.astype(np.uint64)
                         * np.uint64(0x165667B19E3779F9)
                         % np.uint64(n_parts)).astype(np.int64)})

        def shingle_rows(df: pd.DataFrame) -> pd.DataFrame:
            mem = ray.get(member_ref)
            sel = df[np.isin(df[id_col].to_numpy(), mem)]
            sets = mh.doc_shingle_sets(sel[text_col]) if len(sel) else []
            doc = sel[id_col].to_numpy()
            return pd.DataFrame({
                id_col: doc,
                "id_a": np.full(len(sel), -1, dtype=np.int64),
                "id_b": np.full(len(sel), -1, dtype=np.int64),
                "shingles": [np.unique(s) for s in sets],
                "__dp": (doc.astype(np.uint64)
                         * np.uint64(0x165667B19E3779F9)
                         % np.uint64(n_parts)).astype(np.int64)})

        both = pairs.map_batches(probe_rows, batch_format="pandas") \
            .union(ds.map_batches(shingle_rows, batch_format="pandas"))

        def attach(df: pd.DataFrame) -> pd.DataFrame:
            src = df[df["id_a"] < 0][[id_col, "shingles"]]
            probes = df[df["id_a"] >= 0][[id_col, "id_a", "id_b"]]
            if len(src) == 0 or len(probes) == 0:
                return pd.DataFrame({
                    "id_a": pd.Series([], dtype="int64"),
                    "id_b": pd.Series([], dtype="int64"),
                    "shingles": pd.Series([], dtype="object"),
                    "__pp": pd.Series([], dtype="int64")})
            m = probes.merge(src, on=id_col, how="left")
            m["shingles"] = [v if hasattr(v, "__len__")
                             else np.array([], dtype=np.uint64)
                             for v in m["shingles"]]
            h = (m["id_a"].to_numpy().astype(np.uint64)
                 * np.uint64(0x9E3779B97F4A7C15)
                 ^ m["id_b"].to_numpy().astype(np.uint64)
                 * np.uint64(0xC2B2AE3D27D4EB4F))
            return pd.DataFrame({
                "id_a": m["id_a"].to_numpy(),
                "id_b": m["id_b"].to_numpy(),
                "shingles": m["shingles"].to_numpy(),
                "__pp": (h % np.uint64(n_parts)).astype(np.int64)})

        attached = both.groupby("__dp").map_groups(
            attach, batch_format="pandas")

        def jaccard_part(df: pd.DataFrame) -> pd.DataFrame:
            df = df.sort_values(["id_a", "id_b"], kind="mergesort")
            a = df["id_a"].to_numpy()
            b = df["id_b"].to_numpy()
            sh = df["shingles"].to_numpy()
            new = np.ones(len(df), dtype=bool)
            new[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
            starts = np.flatnonzero(new)
            ends = np.r_[starts[1:], len(df)]
            out_a, out_b, out_j = [], [], []
            for s, e in zip(starts, ends):
                sa = sh[s]
                sb = sh[s + 1] if e - s >= 2 else None
                # a candidate id missing from the corpus leaves an
                # empty placeholder set or an unpaired row
                if sb is None or len(sa) == 0 or len(sb) == 0:
                    jac = 0.0
                else:
                    sa = np.asarray(sa)
                    sb = np.asarray(sb)
                    inter = len(np.intersect1d(sa, sb,
                                               assume_unique=True))
                    union = len(sa) + len(sb) - inter
                    jac = inter / union if union else 1.0
                out_a.append(int(a[s]))
                out_b.append(int(b[s]))
                out_j.append(jac)
            return pd.DataFrame({"id_a": out_a, "id_b": out_b,
                                 "jaccard": out_j})

        verified = attached.groupby("__pp").map_groups(
            jaccard_part, batch_format="pandas")

        def keep(df: pd.DataFrame) -> pd.DataFrame:
            return df[df["jaccard"] >= threshold]
        out = verified.map_batches(keep, batch_format="pandas") \
            .to_pandas()   # the RESULT (verified near-dups), not the
        # candidate table — collected for API compatibility
        if "id_a" not in out.columns:
            out = pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                "id_b": pd.Series([], dtype="int64"),
                                "jaccard": pd.Series([], dtype="float64")})
        return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)

    # driver band-grouping path keeps the broadcast-member verify:
    # the pair table is already on the driver by choice here
    return ngram_jaccard_pairs(ds, cand_pd, shingle_k=shingle_k,
                               threshold=threshold, id_col=id_col,
                               text_col=text_col)


def ngram_jaccard_pairs(ds, cand_pd, shingle_k=5, threshold=0.5,
                        id_col="doc_id", text_col="text"):
    """Exact k-token-shingle Jaccard for a candidate pair table.

    ``cand_pd`` (columns id_a/id_b) is broadcast as a member→pair map
    (bounded by the candidate count, not the corpus); each doc in any
    pair emits its shingle set per pair, pairs shuffle to partitions,
    and one exact Jaccard per complete pair is computed vectorized.
    Returns pairs with jaccard >= threshold, sorted."""
    import ray
    if len(cand_pd) == 0:
        return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                             "id_b": pd.Series([], dtype="int64"),
                             "jaccard": pd.Series([], dtype="float64")})
    cand_pd = cand_pd.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    pid_a = cand_pd["id_a"].to_numpy()
    pid_b = cand_pd["id_b"].to_numpy()
    member: dict = {}
    for pi, (a, b) in enumerate(zip(pid_a, pid_b)):
        member.setdefault(a, []).append(pi)
        member.setdefault(b, []).append(pi)
    member_ref = ray.put(member)
    mh = _MinHasher(1, shingle_k, text_col)

    def emit_pair_shingles(df: pd.DataFrame) -> pd.DataFrame:
        mem = ray.get(member_ref)
        sel = df[df[id_col].isin(mem)]
        if len(sel) == 0:
            return pd.DataFrame({"pair": pd.Series([], dtype="int64"),
                                 "__part": pd.Series([], dtype="int64"),
                                 id_col: pd.Series([], dtype="int64"),
                                 "shingles": pd.Series([], dtype="object")})
        sets = mh.doc_shingle_sets(sel[text_col])
        out_pair, out_id, out_sh = [], [], []
        for did, s in zip(sel[id_col], sets):
            su = np.unique(s)
            for pi in mem[did]:
                out_pair.append(pi)
                out_id.append(did)
                out_sh.append(su)
        out_pair = np.asarray(out_pair, dtype=np.int64)
        return pd.DataFrame({"pair": out_pair,
                             "__part": out_pair % 64,
                             id_col: np.asarray(out_id, dtype=np.int64),
                             "shingles": out_sh})

    def jaccard_of_partition(df: pd.DataFrame) -> pd.DataFrame:
        # all rows of each pair land in the same partition (pair % 64);
        # compute one exact Jaccard per complete pair
        df = df.sort_values("pair", kind="mergesort")
        pv = df["pair"].to_numpy()
        sh = df["shingles"].to_numpy()
        boundary = np.nonzero(np.diff(pv))[0] + 1
        starts = np.concatenate([[0], boundary])
        ends = np.concatenate([boundary, [len(pv)]])
        out_p, out_j = [], []
        for s, e in zip(starts, ends):
            if e - s < 2:
                jac = 0.0  # a candidate id missing from the corpus
            else:
                sa = np.asarray(sh[s])
                sb = np.asarray(sh[s + 1])
                inter = len(np.intersect1d(sa, sb, assume_unique=True))
                union = len(sa) + len(sb) - inter
                jac = inter / union if union else 1.0
            out_p.append(int(pv[s]))
            out_j.append(jac)
        return pd.DataFrame({"pair": out_p, "jaccard": out_j})

    jac_pd = ds.map_batches(emit_pair_shingles, batch_format="pandas") \
               .groupby("__part").map_groups(jaccard_of_partition,
                                             batch_format="pandas") \
               .to_pandas()
    jac = np.zeros(len(cand_pd))
    jac[jac_pd["pair"].to_numpy()] = jac_pd["jaccard"].to_numpy()
    cand_pd = cand_pd.assign(jaccard=jac)
    out = cand_pd[cand_pd["jaccard"] >= threshold].reset_index(drop=True)
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def all_pairs_jaccard(ds, threshold=0.8, shingle_k=3, id_col="doc_id",
                      text_col="text", n_parts=64):
    """EXACT all-pairs k-token-shingle Jaccard >= threshold, via
    prefix filtering (Bayardo/Ma/Srikant "Scaling Up All Pairs
    Similarity Search", WWW'07; the PPJoin prefix property).

    Unlike ``minhash_lsh`` (probabilistic candidate generation), this
    finds EVERY qualifying pair: with each doc's shingle set sorted by
    a global total order (the md5 hash value), J(x,y) >= t implies an
    overlap o >= ceil(t*max(|x|,|y|)), so the smallest common hash must
    sit within the first |x|-ceil(t*|x|)+1 hashes of x AND the first
    |y|-ceil(t*|y|)+1 of y — indexing only those PREFIXES (a ~(1-t)
    fraction of each doc) still surfaces every true pair, which the
    exact per-pair Jaccard then verifies.

    Shuffles move only (prefix-hash, doc_id) posting rows, never
    documents; candidate emission is the bucket-partitioned vectorized
    run detection shared with minhash_lsh.  Skew note: a shingle
    appearing in d docs emits O(d^2) candidates — real corpora bound
    this via the threshold (common boilerplate dedups away first);
    the posting rows themselves stay O(corpus * (1-t))."""
    import pyarrow as pa

    ws = re.compile(r"\S+")

    def emit_prefix(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_pylist()
        ids = t[id_col].to_numpy()
        hs, is_ = [], []
        for did, txt in zip(ids, texts):
            sh = np.unique(window_hashes(ws.findall(txt), shingle_k))
            p = len(sh) - int(np.ceil(threshold * len(sh))) + 1
            hs.append(sh[:p])
            is_.append(np.full(min(p, len(sh)), did, dtype=np.int64))
        h = np.concatenate(hs) if hs else np.empty(0, np.uint64)
        i = np.concatenate(is_) if is_ else np.empty(0, np.int64)
        return pa.table({"h": pa.array(h),
                         id_col: pa.array(i),
                         "__part": pa.array(
                             (h % np.uint64(n_parts)).astype(np.int64))})

    def part_pairs(df: pd.DataFrame) -> pd.DataFrame:
        return _bucket_pairs(df["h"].to_numpy().astype(np.int64),
                             df[id_col].to_numpy())

    cand = ds.map_batches(emit_prefix, batch_format="pyarrow") \
        .groupby("__part").map_groups(part_pairs, batch_format="pandas")
    cand_pd = cand.to_pandas().drop_duplicates(["id_a", "id_b"])
    return ngram_jaccard_pairs(ds, cand_pd, shingle_k=shingle_k,
                               threshold=threshold, id_col=id_col,
                               text_col=text_col)


class SimHasher:
    """64-bit simhash over token hashes; vectorized bit-count per batch."""

    def __init__(self, text_col="text"):
        self.text_col = text_col
        self.ws = re.compile(r"\S+")
        self.bits = np.uint64(1) << np.arange(64, dtype=np.uint64)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        token_lists = [self.ws.findall(t) for t in df[self.text_col]]
        flat = hash_tokens([t for ts in token_lists for t in ts])
        lens = np.array([len(ts) for ts in token_lists])
        offs = np.concatenate([[0], np.cumsum(lens)])
        out = np.empty(len(df), dtype=np.uint64)
        for i in range(len(df)):
            ids = flat[offs[i]:offs[i + 1]]
            if len(ids) == 0:
                out[i] = 0
                continue
            bitmat = ((ids[:, None] & self.bits[None, :]) != 0)
            votes = 2 * bitmat.sum(axis=0) - len(ids)
            out[i] = np.bitwise_or.reduce(self.bits[votes > 0]) if (votes > 0).any() else np.uint64(0)
        df["simhash"] = out
        df["simhash_prefix"] = (out >> np.uint64(48)).astype(np.int64)
        return df


def simhash(ds, text_col="text", concurrency=(1, 8)):
    return ds.map_batches(SimHasher, batch_format="pandas",
                          batch_size=2048, concurrency=concurrency,
                          fn_constructor_kwargs={"text_col": text_col},
                          num_cpus=1)


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = (np.asarray(a, dtype=np.uint64) ^ np.asarray(b, dtype=np.uint64))
    return np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1)


def embedding_near_dup_exact(ds, threshold=0.95, id_col="vec_id",
                             emb_col="embedding", batch_size=4096,
                             concurrency=(1, 8)):
    """Exact cosine near-dup pairs via blocked all-pairs matmul: the full
    normalized matrix is broadcast once (ray.put), each batch computes
    batch@all.T and emits pairs with id_a < id_b and cosine >= threshold.
    O(n^2) flops but embarrassingly parallel and exact — the brute
    baseline; ``embedding_near_dup`` (LSH) is the scale path."""
    import ray
    ref_df = ds.select_columns([id_col, emb_col]).to_pandas()
    mat = np.stack(ref_df[emb_col].to_numpy()).astype(np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    mat = mat / np.where(norms == 0, 1, norms)
    ref = ray.put((ref_df[id_col].to_numpy(), mat))

    class Scorer:
        def __init__(self):
            self.all_ids, self.all_mat = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            vecs = np.stack(df[emb_col].to_numpy()).astype(np.float64)
            n = np.linalg.norm(vecs, axis=1, keepdims=True)
            vecs = vecs / np.where(n == 0, 1, n)
            sims = vecs @ self.all_mat.T
            ids = df[id_col].to_numpy()
            # keep (row, col) with id_row < id_col so each pair appears once
            ri, ci = np.nonzero((sims >= threshold) &
                                (ids[:, None] < self.all_ids[None, :]))
            return pd.DataFrame({
                "id_a": ids[ri], "id_b": self.all_ids[ci],
                "cosine": sims[ri, ci]})

    return ds.map_batches(Scorer, batch_format="pandas",
                          batch_size=batch_size, concurrency=concurrency,
                          num_cpus=1)


def tune_lsh(threshold: float, target_recall: float = 0.95,
             max_tables: int = 64):
    """(n_planes, n_tables) reaching ``target_recall`` for pairs at
    ``threshold`` cosine: per-plane collision p = 1 - theta/pi; pick
    the band width so a band still fires a few % of the time, then OR
    enough tables.  Low thresholds (wide angles) need many small
    bands — the fixed defaults tuned for ~0.95 dedup miss nearly
    everything at 0.35."""
    import math
    p = 1.0 - math.acos(max(min(threshold, 1.0), -1.0)) / math.pi
    p = min(max(p, 1e-6), 1 - 1e-9)
    miss = 1.0 - target_recall
    n_planes = max(1, min(16, int(math.log(0.05) / math.log(p))))
    band_p = p ** n_planes
    n_tables = max(1, min(max_tables, math.ceil(
        math.log(miss) / math.log(1 - band_p))))
    return n_planes, n_tables


def embedding_near_dup(ds, threshold=0.95, id_col="vec_id",
                       emb_col="embedding", n_planes=None, n_tables=None,
                       seed=11):
    """Embedding-cosine near-dup: random-hyperplane LSH bucket keys,
    groupby bucket, exact cosine verify within bucket.  Returns pairs
    (id_a, id_b, cosine) with cosine >= threshold.

    ``n_tables`` > 1 enables band-OR multi-probing: L independent
    plane sets, a vector lands in one bucket PER TABLE, candidates are
    the union — recall 1-(1-p^k)^L where p = 1 - theta/pi, bounding
    the single-table recall loss at moderate cosine thresholds (the
    scale path for thresholds below ~0.9).  Output pairs dedupe across
    tables inside a final groupby.  ``n_planes``/``n_tables`` default
    to ``tune_lsh(threshold)`` (>=95% expected recall)."""
    if n_planes is None or n_tables is None:
        tp, tt = tune_lsh(threshold)
        n_planes = tp if n_planes is None else n_planes
        n_tables = tt if n_tables is None else n_tables
    first = ds.take(1)[0]
    dim = len(first[emb_col])
    rng = np.random.RandomState(seed)
    planes = rng.normal(size=(n_tables, dim, n_planes))

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        vecs = np.stack(df[emb_col].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        vecs = vecs / np.where(norms == 0, 1, norms)
        frames = []
        for t in range(n_tables):
            signs = (vecs @ planes[t]) > 0
            key = (signs @ (1 << np.arange(n_planes))).astype(np.int64)
            frames.append(pd.DataFrame({
                id_col: df[id_col].to_numpy(),
                "bucket": key * np.int64(n_tables) + t,
                "vec": list(vecs)}))
        return pd.concat(frames, ignore_index=True)

    bucketed = ds.map_batches(bucketize, batch_format="pandas")

    empty = pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                          "id_b": pd.Series([], dtype="int64"),
                          "cosine": pd.Series([], dtype="float64")})

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) < 2:
            return empty.copy()
        df = df.sort_values(id_col)
        vecs = np.stack(df["vec"].to_numpy())
        sims = vecs @ vecs.T
        ia, ib = np.triu_indices(len(df), k=1)
        mask = sims[ia, ib] >= threshold
        ids = df[id_col].to_numpy()
        return pd.DataFrame({"id_a": ids[ia[mask]], "id_b": ids[ib[mask]],
                             "cosine": sims[ia[mask], ib[mask]]})

    out = bucketed.groupby("bucket").map_groups(verify,
                                                batch_format="pandas")
    if n_tables == 1:
        return out

    def first_of_pair(df: pd.DataFrame) -> pd.DataFrame:
        return df.head(1)
    return out.groupby(["id_a", "id_b"]).map_groups(
        first_of_pair, batch_format="pandas")


def simhash_pairs(ds, max_hamming=3, bands=4, text_col="text",
                  id_col="doc_id"):
    """Near-duplicate pairs by simhash Hamming distance — EXACT by
    construction: with ``bands`` 16-bit bands and ``max_hamming`` <
    ``bands``, the pigeonhole principle guarantees every pair within
    the Hamming budget shares at least one identical band, so the
    band-bucket candidate generation has recall 1 and the in-bucket
    Hamming verify gives precision 1.  Distributed exactly like
    minhash_lsh: band rows shuffle on bucket-hash mod 64, vectorized
    run detection per partition, pair dedupe via one groupby."""
    return banded_hamming_pairs(simhash(ds, text_col=text_col),
                                "simhash", id_col=id_col,
                                max_hamming=max_hamming, bands=bands)


def banded_hamming_pairs(ds, hash_col, id_col="doc_id",
                         max_hamming=3, bands=4):
    """Generic pigeonhole-banded Hamming-radius pair search over ANY
    64-bit hash column (simhash, perceptual aHash, ...): exact recall
    for ``max_hamming < bands`` since a pair within the budget must
    agree on at least one band; in-bucket hamming64 verify gives
    precision 1.  One band-bucket shuffle, no all-pairs stage."""
    if max_hamming >= bands:
        raise ValueError("pigeonhole exactness needs max_hamming < bands")
    width = 64 // bands
    mask = np.uint64((1 << width) - 1)

    def emit(df: pd.DataFrame) -> pd.DataFrame:
        h = df[hash_col].to_numpy().astype(np.uint64)
        ids = df[id_col].to_numpy()
        frames = []
        for b in range(bands):
            bv = (h >> np.uint64(width * b)) & mask
            key = bv.astype(np.int64) * bands + b
            frames.append(pd.DataFrame({
                "__bkey": key, "__part": key % 64,
                id_col: ids, "h": h.astype(np.int64)}))
        return pd.concat(frames, ignore_index=True)

    banded = ds.map_batches(emit, batch_format="pandas")

    def part_pairs(df: pd.DataFrame) -> pd.DataFrame:
        key = df["__bkey"].to_numpy()
        ids = df[id_col].to_numpy()
        hs = df["h"].to_numpy().astype(np.uint64)
        order = np.lexsort((ids, key))
        ks, ids_s, hs_s = key[order], ids[order], hs[order]
        boundary = np.nonzero(np.diff(ks))[0] + 1
        starts = np.concatenate([[0], boundary])
        ends = np.concatenate([boundary, [len(ks)]])
        pa_, pb_, hd_ = [], [], []
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            u, ui = np.unique(ids_s[s:e], return_index=True)
            if len(u) < 2:
                continue
            hu = hs_s[s:e][ui]
            ia, ib = np.triu_indices(len(u), k=1)
            hd = hamming64(hu[ia], hu[ib])
            keep = hd <= max_hamming
            pa_.append(u[ia][keep])
            pb_.append(u[ib][keep])
            hd_.append(hd[keep])
        if not pa_:
            return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                 "id_b": pd.Series([], dtype="int64"),
                                 "hamming": pd.Series([], dtype="int64")})
        return pd.DataFrame({"id_a": np.concatenate(pa_),
                             "id_b": np.concatenate(pb_),
                             "hamming": np.concatenate(hd_).astype(np.int64)})

    cand = banded.groupby("__part").map_groups(part_pairs,
                                               batch_format="pandas")

    def first_of_pair(df: pd.DataFrame) -> pd.DataFrame:
        return df.head(1)
    return cand.groupby(["id_a", "id_b"]).map_groups(
        first_of_pair, batch_format="pandas")


# --------------------------------------------------------------------------
# Near-dup clustering (connected components) + end-to-end fuzzy dedup
# --------------------------------------------------------------------------

def _cc_local(u: np.ndarray, v: np.ndarray) -> pd.DataFrame:
    """Union-find (path-halving) connected components over an edge
    list; returns (node, cluster_id) with cluster_id = min node id of
    the component.  Local kernel for bounded pair sets."""
    nodes, inv = np.unique(np.concatenate([u, v]), return_inverse=True)
    ui, vi = inv[:len(u)], inv[len(u):]
    parent = np.arange(len(nodes))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(ui, vi):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            # larger root under smaller: root index stays the min index,
            # and nodes[] is sorted so min index == min id
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb
    roots = np.fromiter((find(i) for i in range(len(nodes))),
                        dtype=np.int64, count=len(nodes))
    return pd.DataFrame({"node": nodes, "cluster_id": nodes[roots]})


def _star_partition(df: pd.DataFrame, large: bool) -> pd.DataFrame:
    """One vectorized star contraction over a complete bucket
    partition: groups of (center c, neighbor n) rows are detected by
    lexsort run boundaries; per-group min via the sorted first
    element.  large-star: every neighbor > c re-points to
    m = min(N(c) ∪ {c}); small-star: every member of N(c) ∪ {c}
    except m points to m (all n ≤ c by keying)."""
    c = df["u"].to_numpy()
    n = df["v"].to_numpy()
    order = np.lexsort((n, c))
    cs, ns = c[order], n[order]
    b = np.nonzero(np.diff(cs))[0] + 1
    starts = np.concatenate([[0], b])
    ends = np.concatenate([b, [len(cs)]])
    cval = cs[starts]
    gmin = ns[starts]                      # sorted within group
    m = np.minimum(gmin, cval)
    m_full = np.repeat(m, ends - starts)
    if large:
        mask = ns > cs
        out_u, out_v = ns[mask], m_full[mask]
    else:
        mask = ns != m_full
        out_u = np.concatenate([ns[mask], cval])
        out_v = np.concatenate([m_full[mask], m])
        keep = out_u != out_v
        out_u, out_v = out_u[keep], out_v[keep]
    return pd.DataFrame({"u": out_u, "v": out_v}) \
        .drop_duplicates(ignore_index=True)


def cluster_pairs(pairs, id_a="id_a", id_b="id_b", n_parts=64,
                  max_rounds=64):
    """Connected components over a near-dup pair list → one row
    (node, cluster_id) per member node, cluster_id = min node id of the
    component (the canonical representative).

    A pandas pair table (the bounded output of minhash_lsh /
    simhash_pairs / embedding_near_dup) runs the local union-find.  A
    Ray Dataset of pairs runs alternating large-star / small-star
    contraction (Kiveris et al., "Connected Components in MapReduce and
    Beyond", SoCC'14 — public): each round shuffles edges by a coarse
    bucket hash of the center node and runs ONE vectorized groupby per
    partition (no per-node map_groups), converging in O(log²|V|)
    rounds to star graphs rooted at each component's min node.  The
    driver never sees edges — only a per-round (hash-sum, count)
    fingerprint for the convergence test."""
    if isinstance(pairs, pd.DataFrame):
        if len(pairs) == 0:
            return pd.DataFrame({"node": pd.Series([], dtype="int64"),
                                 "cluster_id": pd.Series([], dtype="int64")})
        return _cc_local(pairs[id_a].to_numpy().astype(np.int64),
                         pairs[id_b].to_numpy().astype(np.int64))

    # count-gated local path (the standard broadcast/bucketed pair):
    # star contraction pays ~8 Ray stages PER ROUND, which dwarfs a
    # driver union-find until the edge list is genuinely large; both
    # paths produce identical labels (pytest-equal)
    import os
    cap = int(os.environ.get("MAPSHAPER_RAY_CC_LOCAL_CAP",
                             "2000000"))
    pairs = pairs.materialize()
    if pairs.count() <= cap:
        import ray.data as rd
        pdf = pairs.to_pandas()
        if len(pdf) == 0:
            local = pd.DataFrame(
                {"node": pd.Series([], dtype="int64"),
                 "cluster_id": pd.Series([], dtype="int64")})
        else:
            local = _cc_local(pdf[id_a].to_numpy().astype(np.int64),
                              pdf[id_b].to_numpy().astype(np.int64))
        return rd.from_pandas(local)  # Dataset in -> Dataset out

    def canon(df: pd.DataFrame) -> pd.DataFrame:
        a = df[id_a].to_numpy().astype(np.int64)
        b = df[id_b].to_numpy().astype(np.int64)
        keep = a != b
        a, b = a[keep], b[keep]
        return pd.DataFrame({"u": np.maximum(a, b), "v": np.minimum(a, b)})

    def emit(large: bool):
        def _e(df: pd.DataFrame) -> pd.DataFrame:
            u = df["u"].to_numpy()
            v = df["v"].to_numpy()
            if large:
                cc = np.concatenate([u, v])
                nn = np.concatenate([v, u])
            else:
                cc = np.maximum(u, v)
                nn = np.minimum(u, v)
            return pd.DataFrame({"u": cc, "v": nn,
                                 "__part": bucket_part(cc, n_parts)})
        return _e

    def fingerprint(edges_ds) -> tuple:
        def fp(df: pd.DataFrame) -> pd.DataFrame:
            h = (df["u"].to_numpy().astype(np.uint64) * _CC_GOLD) ^ \
                df["v"].to_numpy().astype(np.uint64)
            return pd.DataFrame({"h": [int(h.sum(dtype=np.uint64))],
                                 "n": [len(df)]})
        parts = edges_ds.map_batches(fp, batch_format="pandas").to_pandas()
        return (int(np.uint64(parts["h"].to_numpy(np.uint64).sum(
            dtype=np.uint64))), int(parts["n"].sum()))

    edges = pairs.map_batches(canon, batch_format="pandas").materialize()
    prev = None
    for _ in range(max_rounds):
        for large in (True, False):
            edges = edges.map_batches(emit(large), batch_format="pandas") \
                .groupby("__part") \
                .map_groups(lambda df, lg=large: _star_partition(df, lg),
                            batch_format="pandas") \
                .materialize()
        cur = fingerprint(edges)
        if cur == prev:
            break
        prev = cur

    # converged star edges are (child u, root v); roots label themselves
    def labels(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "node": np.concatenate([df["u"].to_numpy(),
                                    df["v"].to_numpy()]),
            "cluster_id": np.concatenate([df["v"].to_numpy(),
                                          df["v"].to_numpy()])})

    def part_min(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("node", as_index=False)["cluster_id"].min()

    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__part"] = bucket_part(df["node"].to_numpy(), n_parts)
        return df

    return edges.map_batches(labels, batch_format="pandas") \
        .map_batches(add_part, batch_format="pandas") \
        .groupby("__part").map_groups(part_min, batch_format="pandas")


def dedup_near(ds, id_col="doc_id", text_col="text", threshold=0.5,
               pairs=None, **minhash_kw):
    """End-to-end fuzzy dedup: near-dup pairs (MinHash+LSH unless a
    pair table is passed) → connected components → keep ONE canonical
    row per cluster (the min id) and every non-duplicated row.

    The drop set is bounded by the number of near-duplicate documents
    (not corpus size); it broadcasts once via ray.put and each batch
    filters with a vectorized isin — no shuffle of the corpus."""
    import ray

    if pairs is None:
        pairs = minhash_lsh(ds, threshold=threshold, text_col=text_col,
                            id_col=id_col, **minhash_kw)
    labels = cluster_pairs(pairs)
    if not isinstance(labels, pd.DataFrame):
        labels = labels.to_pandas()
    drop = labels.loc[labels["node"] != labels["cluster_id"],
                      "node"].to_numpy()
    drop_ref = ray.put(np.sort(drop))

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        d = ray.get(drop_ref)
        ids = df[id_col].to_numpy()
        idx = np.searchsorted(d, ids)
        idx = np.clip(idx, 0, max(len(d) - 1, 0))
        is_dup = (len(d) > 0) & (d[idx] == ids) if len(d) else \
            np.zeros(len(ids), dtype=bool)
        return df[~is_dup]

    return ds.map_batches(keep, batch_format="pandas")


def soft_dedup_weights(ds, id_col="doc_id", text_col="text",
                       threshold=0.5, pairs=None, weight_col="dup_weight",
                       decimals=6, **minhash_kw):
    """SoftDeDup-style duplicate down-weighting: instead of dropping
    near-duplicates, every doc gets weight = 1 / size of its near-dup
    cluster (singletons keep 1.0), for train-time example reweighting.

    Clusters come from the same distributed LSH + large/small-star
    components `dedup_near` uses.  The (member_id, weight) table is
    bounded by near-dup MEMBERSHIP (not corpus size): it broadcasts
    once via ray.put as two parallel sorted arrays and each batch
    scores with one vectorized searchsorted — no per-row Python dict
    lookups and no shuffle of the corpus."""
    import ray

    if pairs is None:
        pairs = minhash_lsh(ds, threshold=threshold, text_col=text_col,
                            id_col=id_col, **minhash_kw)
    labels = cluster_pairs(pairs)
    if not isinstance(labels, pd.DataFrame):
        labels = labels.to_pandas()
    sizes = labels.groupby("cluster_id")["node"].transform("size")
    members = labels["node"].to_numpy()
    order = np.argsort(members)
    members = members[order]
    weights = (1.0 / sizes.to_numpy(dtype=np.float64))[order]
    ref = ray.put((members, weights))

    def weigh(df: pd.DataFrame) -> pd.DataFrame:
        m, w = ray.get(ref)
        ids = df[id_col].to_numpy()
        out = np.ones(len(ids), dtype=np.float64)
        if len(m):
            idx = np.clip(np.searchsorted(m, ids), 0, len(m) - 1)
            hit = m[idx] == ids
            out[hit] = w[idx[hit]]
        return pd.DataFrame({id_col: ids,
                             weight_col: np.round(out, decimals)})

    return ds.map_batches(weigh, batch_format="pandas")


def duplicate_window_stats(ds, text_col="text", id_col="doc_id", k=5,
                           n_parts=64):
    """Per-document duplicated-passage share: the fraction of the
    doc's DISTINCT k-token windows whose hash occurs in more than one
    document corpus-wide (the train-data quality signal of Lee et al.
    2022, "Deduplicating Training Data Makes Language Models Better" —
    public).  Returns (doc_id, n_windows, n_dup_windows, dup_share).

    One shuffle carries (window_hash, doc_id) pairs bucketed by hash —
    every row of a hash lands in one partition, so in-partition
    doc-counts per hash ARE global counts; per-doc partials then
    reduce in a second small exchange.  Documents never move."""
    ws = re.compile(r"\S+")

    def emit(df: pd.DataFrame) -> pd.DataFrame:
        hs, ids = [], []
        for i, t in zip(df[id_col].to_numpy(), df[text_col]):
            h = np.unique(window_hashes(ws.findall(t or ""), k))
            hs.append(h)
            ids.append(np.full(len(h), i, dtype=np.int64))
        h = np.concatenate(hs) if hs else np.empty(0, np.uint64)
        return pd.DataFrame({
            "h": h.astype(np.int64),
            id_col: np.concatenate(ids) if ids else
            np.empty(0, np.int64),
            "__part": (h % np.uint64(n_parts)).astype(np.int64)})

    def part_stats(df: pd.DataFrame) -> pd.DataFrame:
        h = df["h"].to_numpy()
        ids = df[id_col].to_numpy()
        uniq, inv, counts = np.unique(h, return_inverse=True,
                                      return_counts=True)
        # pairs are distinct per doc, so per-hash row count == number
        # of docs containing the window
        dup = counts[inv] > 1
        out = pd.DataFrame({id_col: ids, "n_windows": 1,
                            "n_dup_windows": dup.astype(np.int64)})
        return out.groupby(id_col, as_index=False).sum()

    partials = ds.map_batches(emit, batch_format="pandas") \
        .groupby("__part").map_groups(part_stats, batch_format="pandas")

    def reduce_doc(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(id_col, as_index=False)[
            ["n_windows", "n_dup_windows"]].sum()
        out["dup_share"] = (out["n_dup_windows"] /
                            out["n_windows"]).round(6)
        return out

    def add_doc_part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__dpart"] = bucket_part(df[id_col].to_numpy(), n_parts)
        return df

    def strip(df: pd.DataFrame) -> pd.DataFrame:
        return df[[id_col, "n_windows", "n_dup_windows", "dup_share"]]

    return partials.map_batches(add_doc_part, batch_format="pandas") \
        .groupby("__dpart").map_groups(reduce_doc, batch_format="pandas") \
        .map_batches(strip, batch_format="pandas")


# position packing for exact_substring_dedup occurrence keys: doc_id
# and 0-based window position share one int64 so per-hash argmin is a
# single vectorized min.  2^24 tokens/doc (~100 MB of text) bounds any
# realistic web page; the guard below raises rather than corrupting.
_ESD_POS_LIM = np.int64(1) << np.int64(24)

# exact_substring_dedup span-table attach: broadcast under this many
# affected-doc rows, bucketed join above
ESD_SPAN_BROADCAST_CAP = 2_000_000


def exact_substring_dedup(ds, text_col="text", id_col="doc_id", k=50,
                          n_parts=64, num_buckets=32):
    """Exact substring-span deduplication (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better",
    ExactSubstr): every k-token window whose hash occurs more than
    once corpus-wide keeps ONE canonical occurrence (the smallest
    (doc_id, position)) and the covered tokens of every other
    occurrence are removed; each doc's surviving tokens re-join with
    single spaces.  Whitespace is normalized by the ``\\S+`` tokenizer
    (same convention as duplicate_window_stats / the q48 oracles).

    Distribution: documents never move.  (1) a stateless pass emits
    (window_hash, packed doc·pos) rows bucketed BY HASH, so
    (2) in-partition counts/argmins ARE global — duplicated,
    non-canonical occurrences emit (doc, pos) covered spans;
    (3) spans bucket-shuffle BY DOC and aggregate to one span-list row
    per affected doc (integers only — never the text); (4) a bucketed
    left join attaches the span list to its doc and a vectorized
    difference-array mask rebuilds the text per row.  Driver sees
    nothing; skew is bounded because a pathological hash (the empty
    page's window) still lands in one partition as rows, not text.

    Returns a Dataset (id_col, text) over ALL input docs.
    """
    from .relational import hash_join

    ws = re.compile(r"\S+")

    def emit(df: pd.DataFrame) -> pd.DataFrame:
        hs, ords = [], []
        for i, t in zip(df[id_col].to_numpy(), df[text_col]):
            toks = ws.findall(t or "")
            n = len(toks)
            if n < k:
                continue
            if n >= _ESD_POS_LIM:
                raise ValueError(
                    f"doc {i}: {n} tokens exceeds the 2^24 position "
                    "packing bound of exact_substring_dedup")
            h = window_hashes(toks, k)  # n >= k: one hash per window
            hs.append(h)
            ords.append(np.int64(i) * _ESD_POS_LIM
                        + np.arange(n - k + 1, dtype=np.int64))
        h = np.concatenate(hs) if hs else np.empty(0, np.uint64)
        return pd.DataFrame({
            "h": h.astype(np.int64),
            "ord": (np.concatenate(ords) if ords
                    else np.empty(0, np.int64)),
            "__part": (h % np.uint64(n_parts)).astype(np.int64)})

    def covered(df: pd.DataFrame) -> pd.DataFrame:
        """All rows of a hash are in this partition: group by h, keep
        duplicated hashes, drop each group's min ord (canonical)."""
        h = df["h"].to_numpy()
        o = df["ord"].to_numpy()
        order = np.lexsort((o, h))
        h, o = h[order], o[order]
        first = np.r_[True, h[1:] != h[:-1]]
        gid = np.cumsum(first) - 1
        counts = np.bincount(gid)
        dup = counts[gid] > 1
        kill = dup & ~first  # min ord per group survives
        o = o[kill]
        return pd.DataFrame({
            id_col: o // _ESD_POS_LIM,
            "pos": o % _ESD_POS_LIM,
            "__dpart": bucket_part(o // _ESD_POS_LIM, n_parts)})

    def span_lists(df: pd.DataFrame) -> pd.DataFrame:
        # spans travel as a comma-joined STRING, not a list column:
        # the sort exchange's arrow->pandas round trip turns object
        # lists into ndarrays, and Ray's TensorArray auto-cast then
        # fails on ragged blocks (hit at 50k docs; latent at 5k)
        g = df.groupby(id_col, sort=False)["pos"] \
            .agg(lambda s: ",".join(map(str, s)))
        return pd.DataFrame({id_col: g.index.to_numpy(np.int64),
                             "__spans": g.to_numpy(object)})

    spans = ds.map_batches(emit, batch_format="pandas") \
        .groupby("__part").map_groups(covered, batch_format="pandas") \
        .groupby("__dpart").map_groups(span_lists,
                                       batch_format="pandas") \
        .materialize()

    # span-table attach, count-gated: one (id -> spans) row per
    # AFFECTED doc — under the cap it broadcasts once (ray.put) and a
    # stateless pass attaches it, skipping the bucketed join's two
    # stamp passes + sort exchange (~2s fixed at 5k docs); above the
    # cap the join path runs
    if spans.count() <= ESD_SPAN_BROADCAST_CAP:
        import ray

        sp_pdf = spans.to_pandas()
        sp_ref = ray.put(dict(zip(sp_pdf[id_col].to_numpy(),
                                  sp_pdf["__spans"].to_numpy())))

        def attach(df: pd.DataFrame) -> pd.DataFrame:
            sp = ray.get(sp_ref)
            df = df[[id_col, text_col]].copy()
            df["__spans"] = [sp.get(i) for i in df[id_col].to_numpy()]
            return df

        joined = ds.map_batches(attach, batch_format="pandas")
    else:
        joined = hash_join(ds, spans, on=id_col, how="left",
                           num_buckets=num_buckets,
                           left_cols=[id_col, text_col],
                           right_cols=[id_col, "__spans"])

    def rebuild(df: pd.DataFrame) -> pd.DataFrame:
        texts = []
        for t, sp in zip(df[text_col], df["__spans"]):
            toks = ws.findall(t or "")
            if isinstance(sp, str) and sp:
                p = np.fromiter((int(x) for x in sp.split(",")),
                                dtype=np.int64)
            elif isinstance(sp, (list, np.ndarray)) and len(sp):
                p = np.asarray(sp, dtype=np.int64)
            else:
                texts.append(" ".join(toks))
                continue
            delta = np.zeros(len(toks) + 1, dtype=np.int64)
            np.add.at(delta, p, 1)
            np.add.at(delta, np.minimum(p + k, len(toks)), -1)
            keep = np.cumsum(delta[:-1]) == 0
            texts.append(" ".join(np.asarray(toks, object)[keep]))
        return pd.DataFrame({id_col: df[id_col].to_numpy(np.int64),
                             text_col: texts})

    return joined.map_batches(rebuild, batch_format="pandas")


def passage_dedup(ds, text_col="text", id_col="doc_id", words=20,
                  n_parts=64, num_buckets=32):
    """Passage-level exact deduplication (the Dolma / Gopher
    paragraph-dedup recipe applied to fixed word windows): each doc is
    segmented into consecutive ``words``-token passages (the tail
    passage may be shorter); every passage whose text occurs more than
    once corpus-wide keeps ONE canonical occurrence — the smallest
    (doc_id, passage_idx) — and all other occurrences are dropped;
    each doc's surviving passages re-join with single spaces in
    passage order.  Tokenization is the ``\\S+`` convention shared
    with exact_substring_dedup / duplicate_window_stats.

    Distribution (mirrors exact_substring_dedup — docs never move):
    (1) a stateless pass emits (passage_hash, packed doc·idx) rows
    bucketed BY HASH so (2) in-partition dup detection is global —
    non-canonical occurrences emit (doc, idx) kill rows; (3) kill
    rows bucket-shuffle BY DOC into one comma-joined index string per
    affected doc; (4) a count-gated broadcast (or bucketed join above
    the cap) attaches the kill list and a vectorized mask rebuilds
    the text.  Driver never sees text.

    Returns a Dataset (id_col, text_col) over ALL input docs.
    """
    from .relational import hash_join
    from ..stages.text import md5_lo64

    ws = re.compile(r"\S+")

    def emit(df: pd.DataFrame) -> pd.DataFrame:
        hs, ords = [], []
        for i, t in zip(df[id_col].to_numpy(), df[text_col]):
            toks = ws.findall(t or "")
            if not toks:
                continue
            n_chunks = (len(toks) + words - 1) // words
            if n_chunks >= _ESD_POS_LIM:
                raise ValueError(
                    f"doc {i}: {n_chunks} passages exceeds the 2^24 "
                    "index packing bound of passage_dedup")
            chunks = [" ".join(toks[j * words:(j + 1) * words])
                      for j in range(n_chunks)]
            hs.append(md5_lo64(chunks))
            ords.append(np.int64(i) * _ESD_POS_LIM
                        + np.arange(n_chunks, dtype=np.int64))
        h = np.concatenate(hs) if hs else np.empty(0, np.uint64)
        return pd.DataFrame({
            "h": h.astype(np.int64),
            "ord": (np.concatenate(ords) if ords
                    else np.empty(0, np.int64)),
            "__part": (h % np.uint64(n_parts)).astype(np.int64)})

    def kills(df: pd.DataFrame) -> pd.DataFrame:
        h = df["h"].to_numpy()
        o = df["ord"].to_numpy()
        order = np.lexsort((o, h))
        h, o = h[order], o[order]
        first = np.r_[True, h[1:] != h[:-1]]
        gid = np.cumsum(first) - 1
        dup = np.bincount(gid)[gid] > 1
        o = o[dup & ~first]  # min (doc, idx) per passage survives
        return pd.DataFrame({
            id_col: o // _ESD_POS_LIM,
            "idx": o % _ESD_POS_LIM,
            "__dpart": bucket_part(o // _ESD_POS_LIM, n_parts)})

    def kill_lists(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(id_col, sort=False)["idx"] \
            .agg(lambda s: ",".join(map(str, s)))
        return pd.DataFrame({id_col: g.index.to_numpy(np.int64),
                             "__kills": g.to_numpy(object)})

    kl = ds.map_batches(emit, batch_format="pandas") \
        .groupby("__part").map_groups(kills, batch_format="pandas") \
        .groupby("__dpart").map_groups(kill_lists,
                                       batch_format="pandas") \
        .materialize()

    if kl.count() <= ESD_SPAN_BROADCAST_CAP:
        import ray

        kl_pdf = kl.to_pandas()
        kl_ref = ray.put(dict(zip(kl_pdf[id_col].to_numpy(),
                                  kl_pdf["__kills"].to_numpy())))

        def attach(df: pd.DataFrame) -> pd.DataFrame:
            km = ray.get(kl_ref)
            df = df[[id_col, text_col]].copy()
            df["__kills"] = [km.get(i) for i in df[id_col].to_numpy()]
            return df

        joined = ds.map_batches(attach, batch_format="pandas")
    else:
        joined = hash_join(ds, kl, on=id_col, how="left",
                           num_buckets=num_buckets,
                           left_cols=[id_col, text_col],
                           right_cols=[id_col, "__kills"])

    def rebuild(df: pd.DataFrame) -> pd.DataFrame:
        texts = []
        for t, ks in zip(df[text_col], df["__kills"]):
            toks = ws.findall(t or "")
            if not (isinstance(ks, str) and ks):
                texts.append(" ".join(toks))
                continue
            n_chunks = (len(toks) + words - 1) // words
            keep = np.ones(n_chunks, dtype=bool)
            keep[np.fromiter((int(x) for x in ks.split(",")),
                             dtype=np.int64)] = False
            tok_keep = np.repeat(keep, np.minimum(
                words, len(toks) - np.arange(n_chunks) * words))
            texts.append(" ".join(np.asarray(toks, object)[tok_keep]))
        return pd.DataFrame({id_col: df[id_col].to_numpy(np.int64),
                             text_col: texts})

    return joined.map_batches(rebuild, batch_format="pandas")


def edit1_pairs(strings_ds, col: str = "token", max_len: int = 64,
                num_buckets: int = 64):
    """FastSS similarity join: every unordered pair of DISTINCT input
    strings within Levenshtein distance 1 — the spelling-variant /
    host-typo matcher.  No all-pairs stage: each string emits its
    full form plus its single-deletion neighborhood, keyed so that
    (a) two strings sharing a SAME-INDEX deletion differ by exactly
    one substitution, and (b) a string equal to another's deletion
    variant is one indel away — every true pair lands in exactly one
    key group (substitution pairs: the unique differing index; indel
    pairs: the shorter string's full key), so in-group dedup is
    global dedup and groups never see unrelated strings.  Strings
    longer than ``max_len`` are skipped (emit volume is
    len+1 keys/string; FastSS is a short-string — token / host /
    identifier — matcher by design).  Returns (a, b), a < b.

    The per-string deletion loop is Python by necessity (ragged
    slicing), but runs over the DISTINCT string table, never a
    corpus; key groups resolve with one bucket exchange.
    """
    from .relational import _run_bounds  # noqa: F401  (doc pointer)
    from ..ops.partition import bucket_part

    def emit(df: pd.DataFrame) -> pd.DataFrame:
        keys, parents = [], []
        for s in df[col]:
            if s is None or len(s) > max_len:
                continue
            keys.append("F\x1f" + s)
            parents.append(s)
            for i in range(len(s)):
                d = s[:i] + s[i + 1:]
                keys.append(f"S\x1f{i}\x1f{d}")
                parents.append(s)
                keys.append("F\x1f" + d)
                parents.append(s)
        out = pd.DataFrame({"k": np.array(keys, dtype=object),
                            "p": np.array(parents, dtype=object)})
        h = pd.util.hash_array(out["k"].to_numpy(object))
        out["__part"] = bucket_part(h, num_buckets)
        return out

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        a_out, b_out = [], []
        k = df["k"].to_numpy(object)
        p = df["p"].to_numpy(object)
        order = np.argsort(k.astype(str), kind="stable")
        k, p = k[order], p[order]
        bnd = np.nonzero(k[1:] != k[:-1])[0] + 1
        starts = np.concatenate([[0], bnd])
        ends = np.concatenate([bnd, [len(k)]])
        for s0, e0 in zip(starts, ends):
            key = k[s0]
            grp = p[s0:e0]
            if key.startswith("S\x1f"):
                u = np.unique(grp)
                for x in range(len(u)):
                    for y in range(x + 1, len(u)):
                        a_out.append(u[x])
                        b_out.append(u[y])
            else:
                full = key[2:]
                if full not in grp:
                    continue
                for v in np.unique(grp):
                    if v != full:
                        a_out.append(min(v, full))
                        b_out.append(max(v, full))
        return pd.DataFrame({"a": np.array(a_out, dtype=object),
                             "b": np.array(b_out, dtype=object)})

    return strings_ds.map_batches(emit, batch_format="pandas") \
        .groupby("__part").map_groups(resolve, batch_format="pandas")


def all_pairs_containment(ds, threshold=0.9, shingle_k=3,
                          id_col="doc_id", text_col="text",
                          n_parts=64, cms_w=1 << 18):
    """Exact all-pairs shingle CONTAINMENT join — the asymmetric
    near-dup statistic (Broder 1997): c(A,B) = |A∩B| / |A| detects a
    short document quoted/embedded inside a longer one, which Jaccard
    misses.  Returns pairs where EITHER direction's containment >=
    ``threshold`` with integer evidence (n_inter, n_a, n_b) and
    ``cont = max(inter/n_a, inter/n_b)`` (single IEEE divisions +
    greatest, SQL-exact).

    Candidate generation is the size-stratified prefix filter
    (Bayardo WWW'07 adapted to overlap >= t*min(|A|,|B|)): with A
    the smaller side, an overlap of ceil(t*|A|) forces a shared
    shingle inside A's first |A| - ceil(t*|A|) + 1 shingles under
    ANY consistent global total order — so only the smaller side's
    ~(1-t) prefix probes, while every doc posts its full set as the
    index side.  The total order is (approx document frequency,
    hash): a count-min sketch of shingle dfs (one mergeable pass,
    broadcast once) pushes corpus-hot shingles OUT of every prefix,
    which is what bounds pair volume under skew — correctness does
    not depend on the order (any total order preserves the prefix
    property), only the volume does.  Exact per-pair verification
    (vectorized intersect over a pair-bucket exchange, the
    ngram_jaccard_pairs machinery) decides the final set, so the
    result is exact regardless of the sketch.
    """
    import ray

    from .sketch import _CmsPartial, _sum_slots

    mh = _MinHasher(1, shingle_k, text_col)
    CMS_D = 2

    # ---- pass 1: CMS of shingle document frequencies (mergeable,
    # corpus never shuffles; 2 x cms_w int64 = a few MB broadcast)
    def shingle_rows(df: pd.DataFrame) -> pd.DataFrame:
        sets = mh.doc_shingle_sets(df[text_col])
        h = np.concatenate([np.unique(s) for s in sets]) if len(df) \
            else np.empty(0, np.uint64)
        return pd.DataFrame({"h": h.astype(np.int64)})

    import pyarrow as pa

    cms_rows = ds.map_batches(shingle_rows, batch_format="pandas") \
        .map_batches(_CmsPartial("h", CMS_D, cms_w),
                     batch_format="pyarrow") \
        .repartition(4).map_batches(_sum_slots, batch_format="pyarrow",
                                    batch_size=None).to_pandas()
    cms = np.zeros(CMS_D * cms_w, dtype=np.int64)
    if len(cms_rows):
        agg = cms_rows.groupby("slot")["cnt"].sum()
        cms[agg.index.to_numpy(np.int64)] = agg.to_numpy(np.int64)
    cms = cms.reshape(CMS_D, cms_w)
    cms_ref = ray.put(cms)

    # ---- pass 2: postings — full index side + smaller-side prefix
    def emit(df: pd.DataFrame) -> pd.DataFrame:
        from .sketch import _cms_buckets
        cms_ = ray.get(cms_ref)
        sets = [np.unique(s) for s in
                mh.doc_shingle_sets(df[text_col])]
        ids = df[id_col].to_numpy(np.int64)
        hs, ds_, sz, fl = [], [], [], []
        for did, s in zip(ids, sets):
            n = len(s)
            if n == 0:
                continue
            b = _cms_buckets(s.astype(np.int64), CMS_D, cms_w) \
                .astype(np.int64)
            est = cms_[np.arange(CMS_D)[None, :], b].min(axis=1)
            order = np.lexsort((s, est))  # rare first, hash tiebreak
            p = n - int(np.ceil(threshold * n)) + 1
            pref = s[order][:p]
            hs.extend([s, pref])
            ds_.extend([np.full(n, did), np.full(len(pref), did)])
            sz.extend([np.full(n, n), np.full(len(pref), n)])
            fl.extend([np.zeros(n, np.int64),
                       np.ones(len(pref), np.int64)])
        if not hs:
            return pd.DataFrame({"h": pd.Series([], dtype=np.int64),
                                 "doc": pd.Series([], dtype=np.int64),
                                 "sz": pd.Series([], dtype=np.int64),
                                 "fl": pd.Series([], dtype=np.int64),
                                 "__part": pd.Series([],
                                                     dtype=np.int64)})
        h = np.concatenate(hs).astype(np.uint64)
        return pd.DataFrame({
            "h": h.astype(np.int64),
            "doc": np.concatenate(ds_).astype(np.int64),
            "sz": np.concatenate(sz).astype(np.int64),
            "fl": np.concatenate(fl),
            "__part": (h % np.uint64(n_parts)).astype(np.int64)})

    def part_pairs(df: pd.DataFrame) -> pd.DataFrame:
        # per shingle run: prefix rows x full rows, smaller side must
        # be the prefix side ((sz, id) order stratification)
        order = np.lexsort((df["doc"].to_numpy(),
                            df["h"].to_numpy()))
        h = df["h"].to_numpy()[order]
        doc = df["doc"].to_numpy()[order]
        sz = df["sz"].to_numpy()[order]
        fl = df["fl"].to_numpy()[order]
        boundary = np.nonzero(np.diff(h))[0] + 1
        starts = np.concatenate([[0], boundary])
        ends = np.concatenate([boundary, [len(h)]])
        pa_, pb_ = [], []
        for s, e in zip(starts, ends):
            pm = fl[s:e] == 1
            fm = ~pm
            if not pm.any() or not fm.any():
                continue
            pd_, ps_ = doc[s:e][pm], sz[s:e][pm]
            fd_, fs_ = doc[s:e][fm], sz[s:e][fm]
            # pairs (prefix i, full j) with (ps,pd) < (fs,fd)
            ii, jj = np.meshgrid(np.arange(len(pd_)),
                                 np.arange(len(fd_)), indexing="ij")
            ii, jj = ii.ravel(), jj.ravel()
            m = (ps_[ii] < fs_[jj]) | ((ps_[ii] == fs_[jj])
                                       & (pd_[ii] < fd_[jj]))
            a, b = pd_[ii[m]], fd_[jj[m]]
            lo, hi = np.minimum(a, b), np.maximum(a, b)
            pa_.append(lo)
            pb_.append(hi)
        if not pa_:
            return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                 "id_b": pd.Series([], dtype="int64")})
        return pd.DataFrame({"id_a": np.concatenate(pa_),
                             "id_b": np.concatenate(pb_)}) \
            .drop_duplicates()

    cand_pd = ds.map_batches(emit, batch_format="pandas") \
        .groupby("__part").map_groups(part_pairs,
                                      batch_format="pandas") \
        .to_pandas()
    if not set(["id_a", "id_b"]).issubset(cand_pd.columns):
        cand_pd = pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                "id_b": pd.Series([], dtype="int64")})
    cand_pd = cand_pd.drop_duplicates(["id_a", "id_b"]) \
        .sort_values(["id_a", "id_b"]).reset_index(drop=True)

    empty = pd.DataFrame({
        "id_a": pd.Series([], dtype=np.int64),
        "id_b": pd.Series([], dtype=np.int64),
        "n_inter": pd.Series([], dtype=np.int64),
        "n_a": pd.Series([], dtype=np.int64),
        "n_b": pd.Series([], dtype=np.int64),
        "cont": pd.Series([], dtype=np.float64)})
    if not len(cand_pd):
        return empty

    # ---- pass 3: exact verification over the candidate pairs (the
    # ngram_jaccard_pairs pair-bucket exchange, containment variant)
    member: dict = {}
    for pi, (a, b) in enumerate(zip(cand_pd["id_a"].to_numpy(),
                                    cand_pd["id_b"].to_numpy())):
        member.setdefault(a, []).append(pi)
        member.setdefault(b, []).append(pi)
    member_ref = ray.put(member)

    def emit_pair_sh(df: pd.DataFrame) -> pd.DataFrame:
        mem = ray.get(member_ref)
        sel = df[df[id_col].isin(mem)]
        if len(sel) == 0:
            return pd.DataFrame({"pair": pd.Series([], dtype="int64"),
                                 "__part": pd.Series([], dtype="int64"),
                                 id_col: pd.Series([], dtype="int64"),
                                 "sh": pd.Series([], dtype="object")})
        sets = mh.doc_shingle_sets(sel[text_col])
        op, oi, os_ = [], [], []
        for did, s in zip(sel[id_col], sets):
            su = np.unique(s)
            for pi in mem[did]:
                op.append(pi)
                oi.append(did)
                os_.append(su)
        op = np.asarray(op, dtype=np.int64)
        return pd.DataFrame({"pair": op, "__part": op % 64,
                             id_col: np.asarray(oi, dtype=np.int64),
                             "sh": os_})

    def cont_of_partition(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["pair", id_col], kind="mergesort")
        pv = df["pair"].to_numpy()
        sh = df["sh"].to_numpy()
        boundary = np.nonzero(np.diff(pv))[0] + 1
        starts = np.concatenate([[0], boundary])
        ends = np.concatenate([boundary, [len(pv)]])
        rows = []
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            sa = np.asarray(sh[s])
            sb = np.asarray(sh[s + 1])
            inter = len(np.intersect1d(sa, sb, assume_unique=True))
            rows.append((int(pv[s]), inter, len(sa), len(sb)))
        return pd.DataFrame(rows, columns=["pair", "n_inter",
                                           "n_a", "n_b"]) \
            if rows else pd.DataFrame({"pair": pd.Series([], dtype="int64"),
                                       "n_inter": pd.Series([], dtype="int64"),
                                       "n_a": pd.Series([], dtype="int64"),
                                       "n_b": pd.Series([], dtype="int64")})

    ver = ds.map_batches(emit_pair_sh, batch_format="pandas") \
        .groupby("__part").map_groups(cont_of_partition,
                                      batch_format="pandas") \
        .to_pandas()
    if not len(ver):
        return empty
    # doc_shingle_sets order within a pair partition is (pair, doc_id)
    # ascending, so n_a belongs to the smaller id — matching cand_pd's
    # id_a < id_b convention
    out = cand_pd.merge(ver, left_index=True, right_on="pair",
                        how="inner").drop(columns=["pair"])
    ni = out["n_inter"].to_numpy(np.float64)
    cont = np.maximum(ni / out["n_a"].to_numpy(np.float64),
                      ni / out["n_b"].to_numpy(np.float64))
    out = out.assign(cont=cont)
    out = out[cont >= threshold]
    out = out.astype({"id_a": np.int64, "id_b": np.int64,
                      "n_inter": np.int64, "n_a": np.int64,
                      "n_b": np.int64})
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)
