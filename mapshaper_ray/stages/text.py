"""Text-analysis stages for training-data pipelines over the documents /
pages tables: language ID (stopword-marker heuristic), quality scoring,
token counting (whitespace + BPE-ish regex), and rolling-hash document
fingerprinting.  All stages are actor-pool ``map_batches`` classes —
regexes/marker tables compiled once per actor — with vectorized pandas
string kernels per batch.
"""

from __future__ import annotations

import hashlib
import os
import re

import numpy as np
import pandas as pd

# tiny marker lexicons (deterministic, public common words)
_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in", "is", "you", "that"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "ich"],
    "fr": ["le", "la", "et", "les", "des", "est", "une", "que"],
    "es": ["el", "la", "que", "de", "los", "una", "por", "con"],
    "it": ["il", "la", "che", "di", "non", "per", "una", "sono"],
}

# GPT2-style pre-tokenizer pattern (public regex shape), simplified to
# stdlib `re` syntax.
_BPE_PAT = (r"'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+|"
            r" ?[^\sA-Za-z0-9]+|\s+(?!\S)|\s+")


class TextAnalyzer:
    """Adds tok_count, bpe_count, quality + language scores per doc."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.ws = re.compile(r"\S+")
        self.bpe = re.compile(_BPE_PAT)
        self.punct = re.compile(r"[^\w\s]")
        self.marker_res = {
            lang: re.compile(r"\b(?:" + "|".join(ws) + r")\b")
            for lang, ws in _LANG_MARKERS.items()}

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        s = df[self.text_col]
        n_chars = s.str.len().astype("int64")
        toks = s.str.count(self.ws).astype("int64")
        df = df.copy()
        df["n_chars2"] = n_chars
        df["tok_count"] = toks
        df["bpe_count"] = s.str.count(self.bpe).astype("int64")
        n_punct = s.str.count(self.punct).astype("int64")
        df["punct_ratio"] = n_punct / n_chars.clip(lower=1)
        df["mean_word_len"] = (n_chars - toks + 1).clip(lower=0) / toks.clip(lower=1)
        # language scores: marker hits per token; argmax = predicted lang
        scores = {}
        for lang, rx in self.marker_res.items():
            scores[lang] = s.str.count(rx).astype("int64") / toks.clip(lower=1)
        sc = pd.DataFrame(scores)
        df["lang_pred"] = sc.idxmax(axis=1).where(sc.max(axis=1) > 0, "und")
        df["stop_ratio"] = sc.max(axis=1)
        # composite quality in [0,1]: length + structure heuristics
        len_score = np.clip(np.log1p(toks) / np.log(500), 0, 1)
        df["quality"] = (0.5 * len_score +
                         0.3 * np.clip(1 - df["punct_ratio"] * 4, 0, 1) +
                         0.2 * np.clip(df["stop_ratio"] * 5, 0, 1))
        return df


def analyze_text(ds, text_col="text", concurrency=(1, 8), batch_size=4096):
    return ds.map_batches(TextAnalyzer, batch_format="pandas",
                          batch_size=batch_size, concurrency=concurrency,
                          fn_constructor_kwargs={"text_col": text_col},
                          num_cpus=1)


_SEP = "\x1f"  # unit-separator joiner for k-gram window strings


def _str_col(batch, col):
    """Arrow text column as non-null string: all-null blocks arrive
    with null type (fill_null can't scalar-cast "" into those), so
    cast first, then fill nulls with ''."""
    import pyarrow as pa
    import pyarrow.compute as pc
    c = batch.column(col)
    if pa.types.is_null(c.type):
        c = c.cast(pa.string())
    return pc.fill_null(c, "")


def md5_lo64(strings) -> np.ndarray:
    """Lower 64 bits of md5 (little-endian digest bytes 8:16) — the
    EXACT value DuckDB's ``md5_number_lower`` computes, so every hash
    derived from this is reproducible by a SQL oracle."""
    out = np.empty(len(strings), dtype=np.uint64)
    for i, s in enumerate(strings):
        d = hashlib.md5(s.encode() if isinstance(s, str) else s).digest()
        out[i] = int.from_bytes(d[8:16], "little")
    return out


def window_hashes(tokens: list[str], k: int) -> np.ndarray:
    """k-token shingle hashes: md5_lo64 of the window tokens joined with
    the unit separator.  Degenerate docs mirror the SQL CASE exactly:
    no tokens -> [0]; fewer than k -> one hash of all tokens joined."""
    n = len(tokens)
    if n == 0:
        return np.zeros(1, dtype=np.uint64)
    if n < k:
        return md5_lo64([_SEP.join(tokens)])
    return md5_lo64([_SEP.join(tokens[i:i + k]) for i in range(n - k + 1)])


class Fingerprinter:
    """64-bit document fingerprint: min over k-token-window md5 hashes
    (winnowing-style global min) — deterministic near-dup prefilter
    signal, reproducible in SQL via md5_number_lower."""

    def __init__(self, text_col: str = "text", k: int = 5):
        self.text_col = text_col
        self.k = k
        self.ws = re.compile(r"\S+")

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["fingerprint"] = [
            np.uint64(window_hashes(self.ws.findall(t), self.k).min())
            if t else np.uint64(0)
            for t in df[self.text_col]]
        return df


def hash_tokens(tokens: list[str], fn: str = "md5") -> np.ndarray:
    """Deterministic 64-bit token hashes.  ``fn="md5"`` (default) is
    md5_lo64 over the UNIQUE tokens (cached via np.unique inverse) —
    language-independent and reproducible by DuckDB SQL oracles.
    ``fn="sip"`` is the faster pandas siphash (stable across processes
    but not reproducible outside pandas)."""
    if not tokens:
        return np.empty(0, dtype=np.uint64)
    if fn == "sip":
        return pd.util.hash_array(
            np.asarray(tokens, dtype=object)).astype(np.uint64)
    arr = np.asarray(tokens, dtype=object)
    uniq, inv = np.unique(arr, return_inverse=True)
    return md5_lo64(list(uniq))[inv]


def fingerprint(ds, text_col="text", k=5, concurrency=(1, 8)):
    return ds.map_batches(Fingerprinter, batch_format="pandas",
                          batch_size=4096, concurrency=concurrency,
                          fn_constructor_kwargs={"text_col": text_col, "k": k},
                          num_cpus=1)


def repetition_signals(ds, text_col="text", id_col="doc_id",
                       batch_size=4096):
    """Gopher-style per-document repetition signals (Rae et al. 2021
    §A1.1 quality heuristics): word count, distinct-word ratio, the
    share of word-bigram occurrences taken by the single most frequent
    bigram, and the share taken by any bigram occurring more than once.

    Purely per-row statistics — one stateless ``map_batches`` pass, no
    shuffle.  Tokenization is a plain single-space split (matching SQL
    ``string_split(text, ' ')`` so the oracle is exactly expressible);
    counting is one vectorized pandas hash-groupby over the whole
    batch's (doc, bigram) pairs, not a per-document Python loop.

    Returns a Dataset with columns (id_col, n_words,
    distinct_word_ratio, top_bigram_share, dup_bigram_share).
    Degenerate docs follow split semantics: empty/null text is one
    (empty) token like SQL ``string_split('', ' ') = ['']``, so
    n_words >= 1 always; <2 words -> both bigram shares 0.0.
    """

    def _signals(df: pd.DataFrame) -> pd.DataFrame:
        toks = [(t or "").split(" ") for t in df[text_col]]
        lens = np.fromiter((len(x) for x in toks), dtype=np.int64,
                           count=len(toks))
        flat = np.array([w for ws in toks for w in ws], dtype=object)
        doc = np.repeat(np.arange(len(toks), dtype=np.int64), lens)

        wdf = pd.DataFrame({"d": doc, "w": flat})
        nuniq = wdf.groupby("d")["w"].nunique()
        n_distinct = np.zeros(len(toks), dtype=np.int64)
        n_distinct[nuniq.index.to_numpy()] = nuniq.to_numpy()
        distinct_ratio = np.where(
            lens > 0, n_distinct / np.maximum(lens, 1), 1.0)

        top_share = np.zeros(len(toks), dtype=np.float64)
        dup_share = np.zeros(len(toks), dtype=np.float64)
        if len(flat) > 1:
            same = doc[1:] == doc[:-1]
            bd = doc[:-1][same]
            bg = pd.Series(flat[:-1][same]) + " " + pd.Series(flat[1:][same])
            bc = pd.DataFrame({"d": bd, "b": bg.to_numpy()}) \
                .groupby(["d", "b"], sort=False).size().reset_index(name="n")
            g = bc.groupby("d")["n"]
            mx, tot = g.max(), g.sum()
            top_share[mx.index.to_numpy()] = \
                mx.to_numpy() / tot.to_numpy()
            dups = bc[bc["n"] > 1].groupby("d")["n"].sum()
            dup_share[dups.index.to_numpy()] = \
                dups.to_numpy() / tot.reindex(dups.index).to_numpy()

        return pd.DataFrame({
            id_col: df[id_col].to_numpy(),
            "n_words": lens,
            "distinct_word_ratio": distinct_ratio,
            "top_bigram_share": top_share,
            "dup_bigram_share": dup_share,
        })

    return ds.map_batches(_signals, batch_format="pandas",
                          batch_size=batch_size)


def sample_per_group(ds, key, n, seed="s0", id_col="doc_id",
                     text_col="text", n_parts=64):
    """Deterministic per-group quota sample: the ``n`` rows of each
    group with the smallest md5(text+seed) (ties by id) survive —
    stratified downsampling by lang/domain/source, the standard
    balance step before training-data mixing.

    Partition-independent by construction (the rank hash is a pure
    row function); one bucket shuffle on the group key, then a single
    vectorized lexsort + cumcount per partition — no per-group tasks.
    Reproducible in SQL via md5_number_lower.  Returns (id_col, key).
    """
    from ..ops.partition import bucket_part

    def emit(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            id_col: df[id_col].to_numpy(),
            key: df[key].to_numpy(),
            "__h": md5_lo64((df[text_col] + seed).tolist()),
        })
        kh = pd.util.hash_array(out[key].to_numpy().astype(object))
        out["__part"] = bucket_part(kh, n_parts)
        return out

    def head_n(df: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort((df[id_col].to_numpy(),
                            df["__h"].to_numpy(),
                            df[key].to_numpy().astype(str)))
        df = df.iloc[order]
        rank = df.groupby(key, sort=False).cumcount()
        return df[rank < n][[id_col, key]]

    return ds.map_batches(emit, batch_format="pandas") \
        .groupby("__part").map_groups(head_n, batch_format="pandas")


def bm25_topk(ds, terms, k=50, k1=1.2, b=0.75, id_col="doc_id",
              text_col="text"):
    """Distributed BM25 retrieval against a fixed term query
    (Robertson–Sparck Jones weighting, the Lucene idf variant
    ln(1 + (N - df + 0.5)/(df + 0.5))).

    Two passes, no shuffle: (1) a partial-stats reduce — each batch
    contributes one row of (doc count, Σdl, per-term doc counts), the
    driver sums INTEGERS (exact, order-independent, so avgdl and idf
    match a SQL oracle bit-for-bit); (2) a stateless scoring pass +
    per-partition partial top-k, with the ≤ k×P candidate rows merged
    on the driver.  Returns a pandas DataFrame (id_col, bm25), score
    descending with id tiebreak.
    """
    terms = list(terms)

    def _doclen_tf(batch):
        """(dl, tf-matrix) per doc, all C++ kernels: split_pattern +
        index_in against the tiny term set + per-doc reduceat.
        dl = len(split(text, ' ')), so empty/null text counts as one
        (empty) token — exactly len(string_split(text, ' ')) in SQL
        and the same convention as lm_nll / pack_sequences."""
        import pyarrow as pa
        import pyarrow.compute as pc
        t = _str_col(batch, text_col)
        dl = pc.add(pc.count_substring(t, " "), 1) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        lists = pc.split_pattern(t, " ")
        lens = pc.list_value_length(lists) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        ia = pc.fill_null(pc.index_in(
            pc.list_flatten(lists), value_set=pa.array(terms)), -1) \
            .to_numpy(zero_copy_only=False)
        offs = np.r_[0, np.cumsum(lens)[:-1]]
        tf = np.zeros((len(dl), len(terms)), dtype=np.int64)
        for ti in range(len(terms)):
            tf[:, ti] = np.add.reduceat((ia == ti).astype(np.int64),
                                        offs)
        return dl, tf

    def stats(batch) -> pd.DataFrame:
        if batch.num_rows == 0:
            return pd.DataFrame()
        dl, tf = _doclen_tf(batch)
        row = {"n": len(dl), "sum_dl": int(dl.sum())}
        for ti in range(len(terms)):
            row[f"df{ti}"] = int((tf[:, ti] > 0).sum())
        return pd.DataFrame([row])

    st = ds.map_batches(stats, batch_format="pyarrow").to_pandas()
    n_docs = int(st["n"].sum())
    avgdl = st["sum_dl"].sum() / n_docs
    import math
    idf = [math.log(1 + (n_docs - int(st[f"df{ti}"].sum()) + 0.5)
                    / (int(st[f"df{ti}"].sum()) + 0.5))
           for ti in range(len(terms))]
    k1p1 = k1 + 1
    one_b = 1 - b

    def score(batch) -> pd.DataFrame:
        if batch.num_rows == 0:
            return pd.DataFrame({id_col: np.empty(0, np.int64),
                                 "bm25": np.empty(0)})
        dl, tf = _doclen_tf(batch)
        dl = dl.astype(np.float64)
        s = np.zeros(len(dl))
        norm = k1 * (one_b + b * (dl / avgdl))
        for ti in range(len(terms)):
            tft = tf[:, ti].astype(np.float64)
            s = s + idf[ti] * ((tft * k1p1) / (tft + norm))
        out = pd.DataFrame({
            id_col: batch.column(id_col).to_numpy(
                zero_copy_only=False),
            "bm25": s})
        return out.sort_values(["bm25", id_col],
                               ascending=[False, True]).head(k)

    cand = ds.map_batches(score, batch_format="pyarrow").to_pandas()
    out = cand.sort_values(["bm25", id_col],
                           ascending=[False, True]).head(k)
    out["bm25"] = out["bm25"].round(6)
    return out.reset_index(drop=True)


# lm_nll vocab-broadcast gate: above this many distinct tokens the
# vocab table stays distributed (`_lm_nll_shuffle`) instead of landing
# on the driver — the same counted-gate pattern as the minhash
# MINHASH_DRIVER_PAIR_CAP.  5M tokens x ~40B/row ≈ 200MB broadcast,
# the comfortable ceiling for a per-actor value_set.
LM_VOCAB_BROADCAST_CAP = 5_000_000

# bpe_train candidate selection: vocabs under this row count reduce
# their per-block pair partials on the driver (no per-merge exchange);
# larger vocabs keep the pair-hash bucket-shuffle top-1 path
BPE_DRIVER_VOCAB_CAP = int(os.environ.get(
    "MAPSHAPER_RAY_BPE_DRIVER_VOCAB_CAP", "2000000"))


def lm_nll(ds, id_col="doc_id", text_col="text", n_parts=64,
           qscale=10 ** 9, vocab_broadcast="auto"):
    """Unigram language-model perplexity scoring (the CCNet-style
    quality filter): per-doc mean negative log-likelihood under an
    add-1-smoothed unigram LM trained on the corpus itself.

    Two passes.  (1) corpus token counts: per-batch partial Counter ->
    bucket shuffle by token hash -> per-partition sum; the driver
    collects only the VOCAB-sized (token, count) table, never token
    occurrences.  (2) the count table broadcasts via ``ray.put`` and a
    stateless pass scores each doc vectorized (one exploded
    Series.map + add.reduceat per batch).

    Exactness: log-probabilities are quantized to integers with
    ``floor(math.log(n) * qscale)`` — ``math.log`` (libm) is
    bit-identical to DuckDB's ``ln`` (verified 0/50k mismatches; the
    SIMD ``np.log`` is NOT), so the per-doc sum is an exact integer
    in both engines and the q64 oracle matches value-exact.
    Tokenization is ``text.split(' ')`` = SQL ``string_split``.
    Returns (id_col, lm_nll) with nll in nats rounded to 6 decimals.
    ``vocab_broadcast``: ``"auto"`` (default) counts the distinct-token
    table FIRST (a distributed scalar reduce — nothing but one int on
    the driver) and broadcasts only when it is under
    ``LM_VOCAB_BROADCAST_CAP``; above the cap — e.g. a raw 100-TB web
    corpus's vocabulary — it routes to the shuffle scale path
    (``_lm_nll_shuffle``) automatically.  ``True``/``False`` force a
    path.  Both paths are bit-identical (same quantized libm logs;
    pytest-enforced).
    """
    import math

    import ray

    from ..ops.partition import bucket_part

    import pyarrow as pa
    import pyarrow.compute as pc

    def count_partial(batch: "pa.Table") -> pd.DataFrame:
        # Arrow-native tokenize + count: split_pattern/value_counts
        # are C++ kernels over the string buffers — the Python
        # str.split equivalent materializes every token as a PyObject
        # (measured 640M tokens: the split dominated wall time)
        t = _str_col(batch, text_col)
        vc = pc.value_counts(pc.list_flatten(pc.split_pattern(t, " ")))
        uniq = np.asarray(vc.field("values").to_pylist(), dtype=object)
        cnt = vc.field("counts").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        out = pd.DataFrame({"token": uniq, "c": cnt})
        h = pd.util.hash_array(uniq)
        out["__part"] = bucket_part(h, n_parts)
        return out

    def count_final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("token", sort=False)["c"].sum()
        return pd.DataFrame({"token": g.index.to_numpy(object),
                             "c": g.to_numpy(np.int64)})

    vocab_ds = ds.map_batches(count_partial, batch_format="pyarrow") \
        .groupby("__part").map_groups(count_final,
                                      batch_format="pandas") \
        .materialize()
    if vocab_broadcast == "auto":
        # one distributed count over the materialized vocab — a
        # scalar on the driver decides the route
        vocab_broadcast = vocab_ds.count() <= LM_VOCAB_BROADCAST_CAP
    if not vocab_broadcast:
        return _lm_nll_shuffle(ds, vocab_ds, id_col, text_col,
                               n_parts, qscale)

    vocab = vocab_ds.to_pandas()
    total = int(vocab["c"].sum())
    v_size = len(vocab)
    qz = math.floor(math.log(total + v_size) * qscale)
    # (token, qlog) arrays: the scoring pass resolves tokens via
    # Arrow index_in (a C++ hash probe — no ordering requirement),
    # never a per-token Python dict/Series lookup — measured 4x on a
    # 640M-token corpus where Series.map dominated wall time
    vtok = vocab["token"].to_numpy(object)
    vq = np.fromiter((math.floor(math.log(int(c) + 1) * qscale)
                      for c in vocab["c"].to_numpy()),
                     np.int64, len(vocab))
    qref = ray.put((vtok, vq))

    class Scorer:
        """Actor-pool scoring: the vocab ships once per actor (the
        Arrow value_set for index_in is built in __init__); each batch
        is split/flattened/hash-matched entirely in C++ kernels."""

        def __init__(self):
            import pyarrow as _pa
            vt, q_sorted = ray.get(qref)
            self.vs = _pa.array(vt, type=_pa.string())
            self.vq = q_sorted

        def __call__(self, batch: "pa.Table") -> pd.DataFrame:
            import pyarrow.compute as _pc
            ids = batch.column(id_col).to_numpy(zero_copy_only=False)
            if len(ids) == 0:
                return pd.DataFrame({id_col: ids,
                                     "lm_nll": np.empty(0)})
            t = _str_col(batch, text_col)
            lists = _pc.split_pattern(t, " ")
            lens = _pc.list_value_length(lists) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            flat = _pc.list_flatten(lists)
            idx = _pc.index_in(flat, value_set=self.vs)
            valid = _pc.is_valid(idx).to_numpy(zero_copy_only=False)
            ia = _pc.fill_null(idx, 0).to_numpy(zero_copy_only=False)
            q = np.where(valid, self.vq[ia], 0)
            offs = np.r_[0, np.cumsum(lens)[:-1]]
            s = np.add.reduceat(q, offs)
            nll = (lens * qz - s) / (qscale * lens.astype(np.float64))
            return pd.DataFrame({id_col: ids,
                                 "lm_nll": np.round(nll, 6)})

    return ds.map_batches(Scorer, batch_format="pyarrow",
                          batch_size=4096, concurrency=(1, 8),
                          num_cpus=1)


def _lm_nll_shuffle(ds, vocab_ds, id_col, text_col, n_parts, qscale):
    """lm_nll scale path for vocabularies too large to broadcast: the
    token stream shuffles TWICE instead of the vocab shipping once —
    (1) per-doc partial tf rows meet the count table in a token-hash
    bucket exchange (one merge per partition attaches q), (2) the
    attached (doc, tf*q) partials group-sum by doc-hash bucket.  Only
    two scalars (corpus size, vocab size) touch the driver.
    Equivalent to the broadcast path bit-for-bit (same quantized
    libm logs); pytest-enforced."""
    import math

    from ..ops.partition import bucket_part

    g = vocab_ds.map_batches(
        lambda df: pd.DataFrame({"total": [int(df["c"].sum())],
                                 "v": [len(df)]}),
        batch_format="pandas").to_pandas()
    qz = math.floor(math.log(int(g["total"].sum())
                             + int(g["v"].sum())) * qscale)

    def with_q(df: pd.DataFrame) -> pd.DataFrame:
        # math.log (libm), NOT np.log: bit-parity with the SQL oracle
        q = np.fromiter((math.floor(math.log(int(c) + 1) * qscale)
                         for c in df["c"]), np.int64, len(df))
        h = pd.util.hash_array(df["token"].to_numpy(object))
        return pd.DataFrame({"token": df["token"].to_numpy(object),
                             "q": q, id_col: np.int64(-1),
                             "tf": np.int64(0),
                             "__part": bucket_part(h, n_parts)})

    def doc_tf(df: pd.DataFrame) -> pd.DataFrame:
        # per-doc partial term frequencies: one row per (doc, token)
        ids, toks, tfs = [], [], []
        for i, t in zip(df[id_col], df[text_col]):
            vc = pd.Series((t or "").split(" "),
                           dtype=object).value_counts()
            ids.append(np.full(len(vc), i, dtype=np.int64))
            toks.append(vc.index.to_numpy(object))
            tfs.append(vc.to_numpy(np.int64))
        tok = np.concatenate(toks) if toks else np.empty(0, object)
        out = pd.DataFrame({
            "token": tok, "q": np.int64(0),
            id_col: np.concatenate(ids) if ids
            else np.empty(0, np.int64),
            "tf": np.concatenate(tfs) if tfs
            else np.empty(0, np.int64)})
        out["__part"] = bucket_part(
            pd.util.hash_array(out["token"].to_numpy(object)), n_parts)
        return out

    both = vocab_ds.map_batches(with_q, batch_format="pandas").union(
        ds.map_batches(doc_tf, batch_format="pandas"))

    def attach(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0 or "token" not in df.columns:
            return pd.DataFrame({id_col: np.empty(0, np.int64),
                                 "n": np.empty(0, np.int64),
                                 "s": np.empty(0, np.int64),
                                 "__dp": np.empty(0, np.int64)})
        src = df[df[id_col] < 0][["token", "q"]]
        uses = df[df[id_col] >= 0][[id_col, "token", "tf"]]
        m = uses.merge(src, on="token", how="left")
        q = m["q"].fillna(0).to_numpy(np.int64)
        tf = m["tf"].to_numpy(np.int64)
        out = pd.DataFrame({id_col: m[id_col].to_numpy(np.int64),
                            "n": tf, "s": tf * q})
        out["__dp"] = bucket_part(out[id_col].to_numpy(), n_parts)
        return out

    def per_doc(df: pd.DataFrame) -> pd.DataFrame:
        gg = df.groupby(id_col, sort=False)[["n", "s"]].sum()
        n = gg["n"].to_numpy(np.float64)
        s = gg["s"].to_numpy(np.int64)
        nll = np.where(n > 0, (n * qz - s) / (qscale * n), 0.0)
        return pd.DataFrame({id_col: gg.index.to_numpy(np.int64),
                             "lm_nll": np.round(nll, 6)})

    return both.groupby("__part").map_groups(
        attach, batch_format="pandas").groupby("__dp").map_groups(
        per_doc, batch_format="pandas")


PII_PATTERNS = (
    # order matters: emails first so their digits can't half-match
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"[0-9]{3}-[0-9]{3}-[0-9]{4}", "<PHONE>"),
)


class PiiRedactor:
    """PII scrubbing as a stateless actor-pool stage: patterns compile
    once per actor (``__init__``), each batch is one pass of global
    ``re.sub`` per pattern.  The default patterns stay within the
    regex subset where Python ``re`` and RE2 (DuckDB
    ``regexp_replace 'g'``) are verified byte-identical, so the q66
    oracle checks the actual redaction output."""

    def __init__(self, text_col: str = "text",
                 patterns=PII_PATTERNS):
        import re as _re
        self.text_col = text_col
        self.compiled = [(_re.compile(p), repl) for p, repl in patterns]

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        vals = out[self.text_col].tolist()
        for rx, repl in self.compiled:
            # null text stays null (SQL regexp_replace(NULL,..) IS NULL)
            vals = [v if v is None else rx.sub(repl, v) for v in vals]
        out[self.text_col] = vals
        return out


def redact_pii(ds, text_col="text", concurrency=(1, 8),
               batch_size=4096):
    return ds.map_batches(PiiRedactor, batch_format="pandas",
                          fn_constructor_kwargs={"text_col": text_col},
                          concurrency=concurrency,
                          batch_size=batch_size, num_cpus=1)


def token_df_topk(ds, text_col="text", k=100, n_parts=64):
    """Corpus vocabulary stats: top-k tokens by DOCUMENT frequency
    (number of docs containing the token), ties broken by token text.
    Returns a pandas DataFrame (token, df) of at most k rows.

    Distinct (token, doc) pairs shuffle bucketed by token hash — all
    rows of a token land in one partition, so in-partition counts are
    global; each partition then contributes only its own top-k and the
    driver merges P×k candidate rows (exact: a global top-k member is
    a top-k member of its own partition)."""
    import re as _re

    ws = _re.compile(r"\S+")

    def emit(df: pd.DataFrame) -> pd.DataFrame:
        toks = []
        for t in df[text_col]:
            toks.append(np.unique(ws.findall(t or "")))
        tok = np.concatenate(toks) if toks else np.empty(0, object)
        h = pd.util.hash_array(tok.astype(object)).astype(np.uint64)
        return pd.DataFrame({"token": tok,
                             "__part": (h % np.uint64(n_parts))
                             .astype(np.int64)})

    def part_topk(df: pd.DataFrame) -> pd.DataFrame:
        c = df.groupby("token").size().reset_index(name="df")
        c = c.sort_values(["df", "token"], ascending=[False, True],
                          kind="mergesort")
        return c.head(k)

    parts = ds.map_batches(emit, batch_format="pandas") \
        .groupby("__part").map_groups(part_topk, batch_format="pandas") \
        .to_pandas()
    out = parts.sort_values(["df", "token"], ascending=[False, True],
                            kind="mergesort").head(k)
    return out.reset_index(drop=True)


def pack_sequences(ds, seq_len, id_col="doc_id", text_col="text",
                   n_buckets=256):
    """Sequence packing for pretraining: the corpus token stream,
    ordered by doc id, is cut greedily into fixed-length examples of
    ``seq_len`` tokens; each output row is one (example, doc) span —
    ``(example_id, doc_id, tok_start, n_toks)`` with ``tok_start``
    the offset INSIDE the doc.  Documents spanning an example boundary
    appear in both examples (no padding rows; the tail example is
    short).

    The global token offset of each doc is a distributed PREFIX SCAN,
    never a sort: docs bucket by id range (``doc_id`` has a known
    order), pass 1 reduces per-bucket token totals (n_buckets rows to
    the driver), the exclusive bucket prefix broadcasts back, and
    pass 2 adds an in-bucket vectorized cumsum — one shuffle total.
    Span emission is pure integer arithmetic, so the q67 oracle (SQL
    window cumsum + generate_series) matches value-exact.
    """
    import ray

    # bucket width from the id range: two tiny scalar reduces
    mm = ds.map_batches(
        lambda df: pd.DataFrame({"lo": [int(df[id_col].min())],
                                 "hi": [int(df[id_col].max())]})
        if len(df) else pd.DataFrame({"lo": [], "hi": []}),
        batch_format="pandas").to_pandas()
    lo, hi = int(mm["lo"].min()), int(mm["hi"].max())
    width = max(1, (hi - lo) // n_buckets + 1)

    import pyarrow.compute as pc

    def tok_rows(batch) -> pd.DataFrame:
        d = batch.column(id_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        # token count = separator count + 1, as a C++ kernel
        dl = pc.add(pc.count_substring(
            _str_col(batch, text_col), " "), 1) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        return pd.DataFrame({id_col: d, "dl": dl,
                             "__b": (d - lo) // width})

    lens = ds.map_batches(tok_rows, batch_format="pyarrow") \
        .materialize()

    totals = lens.map_batches(
        lambda df: df.groupby("__b", sort=False)["dl"].sum()
        .reset_index(), batch_format="pandas").to_pandas() \
        .groupby("__b")["dl"].sum().sort_index()
    # exclusive prefix per bucket (n_buckets scalars on the driver)
    buckets = totals.index.to_numpy()
    prefix = np.r_[0, np.cumsum(totals.to_numpy())[:-1]]
    pref_ref = ray.put(dict(zip(buckets.tolist(), prefix.tolist())))

    def emit_spans(df: pd.DataFrame) -> pd.DataFrame:
        pref = ray.get(pref_ref)
        df = df.sort_values(id_col, kind="mergesort")
        d = df[id_col].to_numpy()
        dl = df["dl"].to_numpy()
        b = int(df["__b"].iloc[0])
        off = pref[b] + np.r_[0, np.cumsum(dl)[:-1]]
        first_ex = off // seq_len
        last_ex = (off + dl - 1) // seq_len
        reps = (last_ex - first_ex + 1).astype(np.int64)
        doc_i = np.repeat(np.arange(len(d)), reps)
        ex = np.concatenate([np.arange(f, l + 1) for f, l in
                             zip(first_ex, last_ex)]) \
            if len(d) else np.empty(0, np.int64)
        o, n_ = off[doc_i], dl[doc_i]
        s = np.maximum(o, ex * seq_len)
        e = np.minimum(o + n_, (ex + 1) * seq_len)
        return pd.DataFrame({
            "example_id": ex.astype(np.int64),
            id_col: d[doc_i],
            "tok_start": (s - o).astype(np.int64),
            "n_toks": (e - s).astype(np.int64)})

    return lens.groupby("__b").map_groups(emit_spans,
                                          batch_format="pandas")


def dsir_weights(ds, target_col="lang", target_value="en",
                 n_buckets=1024, id_col="doc_id", text_col="text",
                 qscale=10 ** 9):
    """DSIR-style importance weights for data selection (Xie et al.
    2023, "Data Selection for Language Models via Importance
    Resampling" — public): hashed-bigram bag-of-ngrams features, an
    add-1-smoothed target distribution (rows where ``target_col ==
    target_value``) vs the full-corpus proposal, and per-doc
    log-importance weight = mean over the doc's bigrams of
    ``ln p_target(b) - ln p_proposal(b)``.

    Distributed shape: (1) one stateless pass emits per-batch partial
    bucket counts (2 x ``n_buckets`` ints — np.bincount over md5
    bigram hashes); a tiny groupby reduces them and only 2 x 1024
    scalars reach the driver; (2) the quantized log tables broadcast
    and a second stateless pass scores each doc.  Logs are
    ``floor(ln(c+1) * qscale)`` integers (libm == DuckDB ln
    bit-for-bit, the q64 trick), so per-doc sums are exact and the
    SQL oracle matches to the last ulp.

    Tokenization is single-space split (``string_split`` parity);
    docs with fewer than 2 tokens get weight 0.0.  Returns a Dataset
    (id_col, dsir_logw).
    """
    import math

    import ray

    def _bigram_buckets(texts):
        """Concatenated bucket ids + per-doc bigram counts.  md5 runs
        only over the batch's UNIQUE bigrams (np.unique inverse —
        natural-language bigrams repeat heavily), measured 4x on the
        50k-doc bench probe vs hashing every occurrence."""
        toks = [(t or "").split(" ") for t in texts]
        lens = np.fromiter((len(x) for x in toks), np.int64,
                           len(toks))
        ns = lens - 1  # split(' ') yields >= 1 token always
        flat = np.array([w for ws in toks for w in ws], dtype=object)
        if len(flat) < 2:
            return np.empty(0, dtype=np.int64), ns
        doc = np.repeat(np.arange(len(toks), dtype=np.int64), lens)
        same = doc[1:] == doc[:-1]  # drop cross-doc boundary pairs
        grams = (pd.Series(flat[:-1][same]) + _SEP
                 + pd.Series(flat[1:][same])).to_numpy(object)
        if not len(grams):
            return np.empty(0, dtype=np.int64), ns
        uniq, inv = np.unique(grams, return_inverse=True)
        b = (md5_lo64(list(uniq)) % np.uint64(n_buckets)) \
            .astype(np.int64)
        return b[inv], ns

    def partial_counts(df: pd.DataFrame) -> pd.DataFrame:
        # hash ONCE for the whole batch; the target counts are the
        # same bucket stream masked to target rows (np.repeat over the
        # per-doc bigram counts) — no second tokenize/md5 pass
        b, ns = _bigram_buckets(list(df[text_col]))
        cc = np.bincount(b, minlength=n_buckets)
        is_t = (df[target_col].to_numpy() == target_value)
        ct = np.bincount(b[np.repeat(is_t, ns)], minlength=n_buckets)
        return pd.DataFrame({"b": np.arange(n_buckets, dtype=np.int64),
                             "cc": cc, "ct": ct})

    # two-level reduce instead of the native groupby Aggregate (whose
    # per-partition aggregator spin-up costs ~12s on tiny count
    # tables — the same pitfall hash_join documents): per-batch
    # bincount frames repartition to a handful of blocks, sum
    # in-partition, and the driver adds <= 8 x n_buckets rows
    def local_sum(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("b", as_index=False)[["cc", "ct"]].sum()

    counts = ds.map_batches(partial_counts, batch_format="pandas",
                            batch_size=16384) \
        .repartition(8).map_batches(local_sum, batch_format="pandas") \
        .to_pandas() \
        .groupby("b", as_index=False)[["cc", "ct"]].sum() \
        .sort_values("b").reset_index(drop=True)
    cc = counts["cc"].to_numpy(np.int64)
    ct = counts["ct"].to_numpy(np.int64)
    nc, nt = int(cc.sum()), int(ct.sum())

    def qlog(x):
        return math.floor(math.log(x) * qscale)

    qt = np.fromiter((qlog(int(c) + 1) for c in ct), np.int64,
                     n_buckets)
    qc = np.fromiter((qlog(int(c) + 1) for c in cc), np.int64,
                     n_buckets)
    zt, zc = qlog(nt + n_buckets), qlog(nc + n_buckets)
    qdiff_ref = ray.put(qt - qc)  # per-bucket integer log-ratio part
    zdiff = zt - zc

    class Scorer:
        def __init__(self):
            self.qdiff = ray.get(qdiff_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            b, ns = _bigram_buckets(list(df[text_col]))
            offs = np.r_[0, np.cumsum(ns)[:-1]]
            sums = np.zeros(len(ns), dtype=np.int64)
            nz = ns > 0
            if len(b):
                sums[nz] = np.add.reduceat(self.qdiff[b],
                                           offs[nz])
            w = np.where(nz,
                         (sums - ns * zdiff)
                         / (qscale * np.maximum(ns, 1).astype(float)),
                         0.0)
            return pd.DataFrame({id_col: df[id_col].to_numpy(),
                                 "dsir_logw": np.round(w, 6)})

    return ds.map_batches(Scorer, batch_format="pandas",
                          batch_size=4096, concurrency=(1, 8),
                          num_cpus=1)


def bpe_train(ds, n_merges=20, text_col="text", n_parts=32):
    """Byte-pair-encoding tokenizer training (Sennrich et al. 2016,
    "Neural Machine Translation of Rare Words with Subword Units" —
    public): learn ``n_merges`` merge rules from the corpus.

    Classic word-level BPE: (1) ONE corpus pass + word-hash bucket
    shuffle builds the global (word, freq) vocabulary — the corpus is
    never touched again, every merge iteration runs over the vocab
    table, which stays a DISTRIBUTED Dataset (web-scale corpora have
    ~1e8 distinct words); (2) per iteration, a stateless pass emits
    freq-weighted adjacent-symbol-pair partial counts, a pair-hash
    bucket shuffle makes in-partition sums global, each partition
    contributes its top-1 and the driver picks the global best
    (count desc, then lexicographic pair — deterministic); (3) the
    winning pair broadcasts and a stateless pass rewrites the symbol
    sequences.  Driver state per iteration: ``n_parts`` candidate
    rows + one merge rule.

    Word symbols start as characters with a '</w>' end marker.
    Returns a pandas DataFrame (rank, left, right, pair_count) of at
    most ``n_merges`` rows (fewer if the vocab runs out of pairs).
    """
    import ray

    def word_counts(df: pd.DataFrame) -> pd.DataFrame:
        toks = [w for t in df[text_col]
                for w in (t or "").split(" ") if w]
        if not toks:
            return pd.DataFrame({"word": pd.Series([], dtype=object),
                                 "freq": pd.Series([], dtype=np.int64),
                                 "__part": pd.Series([],
                                                     dtype=np.int64)})
        s = pd.Series(toks).value_counts()
        words = s.index.to_numpy(object)
        h = pd.util.hash_array(words.astype(object)).astype(np.uint64)
        return pd.DataFrame({"word": words,
                             "freq": s.to_numpy(np.int64),
                             "__part": (h % np.uint64(n_parts))
                             .astype(np.int64)})

    def reduce_words(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("word", sort=False)["freq"].sum()
        words = g.index.to_numpy(object)
        # symbol sequences stay Python LISTS (never joined strings):
        # symbols may contain any byte, so a joiner char would corrupt
        # tokens containing it and flip the tie-break order vs the
        # tuple-comparing scalar oracle
        return pd.DataFrame({
            "syms": [list(w) + ["</w>"] for w in words],
            "freq": g.to_numpy(np.int64)})

    vocab = ds.map_batches(word_counts, batch_format="pandas") \
        .groupby("__part").map_groups(reduce_words,
                                      batch_format="pandas") \
        .materialize()

    # candidate-selection route, decided ONCE: a vocab under the cap
    # reduces its per-block pair partials on the driver (one map pass,
    # no exchange — the per-iteration pair-hash sort exchange costs
    # ~1s of fixed latency ALONE); a web-scale vocab (~1e8 words)
    # keeps the bucket-shuffle top-1 path
    driver_reduce = vocab.count() <= BPE_DRIVER_VOCAB_CAP

    merges = []
    for rank in range(n_merges):
        def pair_counts(df: pd.DataFrame) -> pd.DataFrame:
            ls, rs, freqs = [], [], []
            for syms, f in zip(df["syms"], df["freq"]):
                for a, b in zip(syms, syms[1:]):
                    ls.append(a)
                    rs.append(b)
                    freqs.append(f)
            if not ls:
                return pd.DataFrame({
                    "left": pd.Series([], dtype=object),
                    "right": pd.Series([], dtype=object),
                    "c": pd.Series([], dtype=np.int64),
                    "__part": pd.Series([], dtype=np.int64)})
            g = pd.DataFrame({"left": ls, "right": rs, "c": freqs}) \
                .groupby(["left", "right"], sort=False)["c"].sum() \
                .reset_index()
            h = (pd.util.hash_array(g["left"].to_numpy(object))
                 ^ pd.util.hash_array(g["right"].to_numpy(object))
                 * np.uint64(0x9e3779b97f4a7c15))
            g["__part"] = (h % np.uint64(n_parts)).astype(np.int64)
            return g

        def part_best(df: pd.DataFrame) -> pd.DataFrame:
            g = df.groupby(["left", "right"], sort=False)["c"].sum() \
                .reset_index()
            g = g.sort_values(["c", "left", "right"],
                              ascending=[False, True, True],
                              kind="mergesort")
            return g.head(1)

        if driver_reduce:
            parts = vocab.map_batches(pair_counts,
                                      batch_format="pandas").to_pandas()
            cand = part_best(parts) if len(parts) else parts
        else:
            cand = vocab.map_batches(pair_counts,
                                     batch_format="pandas") \
                .groupby("__part").map_groups(part_best,
                                              batch_format="pandas") \
                .to_pandas()
        if cand.empty:
            break
        cand = cand.sort_values(["c", "left", "right"],
                                ascending=[False, True, True],
                                kind="mergesort")
        best = cand.iloc[0]
        left, right = best["left"], best["right"]
        merges.append({"rank": rank, "left": left, "right": right,
                       "pair_count": int(best["c"])})
        rep = left + right

        def apply_merge(df: pd.DataFrame, left=left, right=right,
                        rep=rep) -> pd.DataFrame:
            out = []
            for syms in df["syms"]:
                merged, i, n = [], 0, len(syms)
                while i < n:
                    if (i + 1 < n and syms[i] == left
                            and syms[i + 1] == right):
                        merged.append(rep)
                        i += 2
                    else:
                        merged.append(syms[i])
                        i += 1
                out.append(merged)
            return pd.DataFrame({"syms": out,
                                 "freq": df["freq"].to_numpy()})

        vocab = vocab.map_batches(apply_merge,
                                  batch_format="pandas").materialize()

    return pd.DataFrame(merges,
                        columns=["rank", "left", "right",
                                 "pair_count"])


def bpe_encode(ds, merges, id_col="doc_id", text_col="text"):
    """Apply trained BPE merge rules (the ``bpe_train`` output) to the
    corpus: each word becomes its subword-symbol sequence by replaying
    the merges in rank order (the standard greedy apply).  Stateless
    actor-pool pass — the merge table (tiny) ships once per actor and
    each batch encodes its DISTINCT words once (np.unique), so a word
    repeated across the corpus re-encodes per distinct-word-per-batch,
    not per occurrence.  Returns (id_col, n_words, n_subwords) — the
    compression diagnostic used to pick vocab sizes.
    """
    import ray

    ranks = {(l, r): i for i, (l, r) in
             enumerate(zip(merges["left"], merges["right"]))}
    rref = ray.put(ranks)

    class Encoder:
        def __init__(self):
            self.ranks = ray.get(rref)
            self.cache = {}

        def _encode(self, w):
            got = self.cache.get(w)
            if got is not None:
                return got
            syms = list(w) + ["</w>"]
            while len(syms) > 1:
                best, bi = None, -1
                for i, pair in enumerate(zip(syms, syms[1:])):
                    rk = self.ranks.get(pair)
                    if rk is not None and (best is None or rk < best):
                        best, bi = rk, i
                if best is None:
                    break
                syms[bi:bi + 2] = [syms[bi] + syms[bi + 1]]
            self.cache[w] = len(syms)
            return len(syms)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            n_words = np.empty(len(df), dtype=np.int64)
            n_sub = np.empty(len(df), dtype=np.int64)
            for j, t in enumerate(df[text_col]):
                ws = [w for w in (t or "").split(" ") if w]
                n_words[j] = len(ws)
                n_sub[j] = sum(self._encode(w) for w in ws)
            return pd.DataFrame({id_col: df[id_col].to_numpy(),
                                 "n_words": n_words,
                                 "n_subwords": n_sub})

    return ds.map_batches(Encoder, batch_format="pandas",
                          batch_size=4096, concurrency=(1, 8),
                          num_cpus=1)


def mix_sample(ds, budget_tokens, seed="s0", id_col="doc_id",
               source_col="source", text_col="text", n_parts=64):
    """Deterministic training-mix sampling to a per-source token
    budget (the data-mixing step before pretraining): within each
    source, docs are taken in md5(text+seed) hash order (ties by id)
    until the source's token budget fills — a doc is kept while the
    tokens BEFORE it are under budget, so the mix overshoots by at
    most one doc per source.

    ``budget_tokens`` is either one int (same budget per source) or a
    {source: budget} dict.  Distribution is the pack_sequences prefix
    scan along the HASH order: rows bucket by hash RANGE (top bits —
    md5 is uniform so ranges are balanced), per-(source, bucket)
    token totals reach the driver (S x n_parts ints), the exclusive
    prefix per source broadcasts back, and each partition decides its
    rows with one vectorized sort + cumsum.  No global sort, one
    shuffle; docs never move (only id/len/hash rows do).

    Returns a Dataset (id_col, source_col, n_tokens) of kept docs.
    """
    import ray

    def emit(df: pd.DataFrame) -> pd.DataFrame:
        n = np.fromiter(((t or "").count(" ") + 1
                         for t in df[text_col]), np.int64, len(df))
        h = md5_lo64([(t or "") + seed for t in df[text_col]])
        return pd.DataFrame({
            id_col: df[id_col].to_numpy(),
            source_col: df[source_col].to_numpy(),
            "n_tokens": n,
            "__h": h.astype(np.int64),  # order-preserving as uint64
            # monotone range bucket in [0, n_parts) for ANY n_parts:
            # ceil(2^64 / n_parts) fits uint64 via (2^64-1)//n + 1
            "__part": np.minimum(
                h // np.uint64((2 ** 64 - 1) // n_parts + 1),
                np.uint64(n_parts - 1)).astype(np.int64)})

    rows = ds.map_batches(emit, batch_format="pandas").materialize()

    totals = rows.map_batches(
        lambda df: df.groupby([source_col, "__part"],
                              as_index=False)["n_tokens"].sum(),
        batch_format="pandas").to_pandas() \
        .groupby([source_col, "__part"], as_index=False)["n_tokens"] \
        .sum()
    # exclusive prefix of each source's bucket totals, in bucket order
    totals = totals.sort_values([source_col, "__part"])
    totals["__before"] = totals.groupby(source_col)["n_tokens"] \
        .cumsum() - totals["n_tokens"]
    pref = {(s, int(p)): int(b) for s, p, b in
            zip(totals[source_col], totals["__part"],
                totals["__before"])}
    if isinstance(budget_tokens, int):
        budgets = {s: budget_tokens
                   for s in totals[source_col].unique()}
    else:
        budgets = dict(budget_tokens)
    bref = ray.put((pref, budgets))

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        prefixes, buds = ray.get(bref)
        out = []
        for (s, p), g in df.groupby([source_col, "__part"],
                                    sort=False):
            bud = buds.get(s)
            if bud is None:
                continue
            order = np.lexsort((g[id_col].to_numpy(),
                                g["__h"].to_numpy()
                                .astype(np.uint64)))
            g = g.iloc[order]
            before = prefixes.get((s, int(p)), 0) \
                + g["n_tokens"].cumsum().to_numpy() \
                - g["n_tokens"].to_numpy()
            out.append(g[before < bud])
        if not out:
            return pd.DataFrame({id_col: [], source_col: [],
                                 "n_tokens": []})
        res = pd.concat(out, ignore_index=True)
        return res[[id_col, source_col, "n_tokens"]]

    return rows.groupby("__part").map_groups(keep,
                                             batch_format="pandas")


def decontaminate(ds, bench_ds, k=8, id_col="doc_id",
                  text_col="text", concurrency=(1, 8)):
    """Benchmark decontamination (the GPT-3-style train/test overlap
    check, Brown et al. 2020 §C — public): count, per corpus doc, the
    k-token windows that also occur anywhere in the benchmark set.

    The benchmark is the SMALL side: its distinct window hashes
    collect to the driver (bounded by benchmark size) and broadcast
    once; the corpus side is one stateless actor-pool pass
    (window-hash + np.isin against the sorted benchmark array) — no
    shuffle, documents never move.  Docs also present in the
    benchmark (same id) are excluded from the report.

    Returns a Dataset (id_col, n_hits) for corpus docs with >= 1
    overlapping window.
    """
    import ray

    ws = re.compile(r"\S+")

    # ONE scan of the small side (ids + hashes together), each text
    # tokenized once
    bpdf = bench_ds.select_columns([id_col, text_col]).to_pandas()
    hs = []
    for t in bpdf[text_col]:
        toks = ws.findall(t or "")
        if len(toks) >= k:
            hs.append(np.unique(window_hashes(toks, k)))
    bset = (np.unique(np.concatenate(hs)) if hs
            else np.empty(0, np.uint64))
    bids = set(bpdf[id_col])
    bref = ray.put((bset, bids))

    class Overlap:
        def __init__(self):
            self.bset, self.bids = ray.get(bref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            out_ids, out_hits = [], []
            for i, t in zip(df[id_col].to_numpy(), df[text_col]):
                if i in self.bids:
                    continue
                toks = ws.findall(t or "")
                if len(toks) < k:
                    continue
                hits = int(np.isin(window_hashes(toks, k),
                                   self.bset).sum())
                if hits:
                    out_ids.append(i)
                    out_hits.append(hits)
            return pd.DataFrame({
                id_col: np.asarray(out_ids, dtype=np.int64),
                "n_hits": np.asarray(out_hits, dtype=np.int64)})

    return ds.map_batches(Overlap, batch_format="pandas",
                          batch_size=4096, concurrency=concurrency,
                          num_cpus=1)


def vocab_stats(ds, text_col="text", n_parts=64):
    """Exact corpus vocabulary stats — global COUNT(DISTINCT token)
    plus total token count — in ONE corpus scan: each batch emits its
    distinct tokens (bucket-shuffled by token hash, so per-partition
    distinct counts sum to the global) plus one total-count row in a
    dedicated bucket (``__part == n_parts``).  Returns a one-row
    DataFrame (n_distinct_tokens, n_tokens)."""
    def emit(df: pd.DataFrame) -> pd.DataFrame:
        toks = [(t or "").split(" ") for t in df[text_col]]
        total = int(sum(len(ws) for ws in toks))
        flat = np.array([w for ws in toks for w in ws], dtype=object)
        uniq = np.unique(flat) if len(flat) else flat
        h = pd.util.hash_array(uniq.astype(object)) \
            .astype(np.uint64) if len(uniq) else \
            np.empty(0, np.uint64)
        return pd.DataFrame({
            "token": pd.Series(list(uniq) + [""], dtype=object),
            "__n": pd.Series([0] * len(uniq) + [total],
                             dtype=np.int64),
            "__part": pd.Series(
                list((h % np.uint64(n_parts)).astype(np.int64))
                + [n_parts], dtype=np.int64)})

    def count_part(df: pd.DataFrame) -> pd.DataFrame:
        if int(df["__part"].iat[0]) == n_parts:  # the totals bucket
            return pd.DataFrame({"d": [0],
                                 "t": [int(df["__n"].sum())]})
        return pd.DataFrame({"d": [df["token"].nunique()], "t": [0]})

    parts = ds.map_batches(emit, batch_format="pandas") \
        .groupby("__part").map_groups(count_part,
                                      batch_format="pandas") \
        .to_pandas()
    return pd.DataFrame({
        "n_distinct_tokens": [int(parts["d"].sum())],
        "n_tokens": [int(parts["t"].sum())]})


def _take_kind(df: "pd.DataFrame", k: int) -> "pd.DataFrame":
    return df[df["kind"] == k]


PMI_VOCAB_BROADCAST_CAP = 2_000_000


def pmi_bigrams(ds, text_col="text", top_k=50, min_count=5,
                qscale=10 ** 9, n_parts=64,
                vocab_broadcast_cap=PMI_VOCAB_BROADCAST_CAP):
    """Top-k adjacent-bigram PMI — the phrase-mining / collocation
    statistic corpus-prep pipelines use to find multiword expressions:
    ``pmi(w1,w2) = ln( (c12/N2) / ((c1/N1)(c2/N1)) )``.

    Exactness: each log term is quantized ``floor(ln(x) * qscale)``
    (the q64 libm-vs-DuckDB trick), so ``pmi_q`` is an exact integer
    sum and the reported ``pmi = round(pmi_q / qscale, 6)`` is
    bit-reproducible by a SQL oracle.

    Distribution: ONE corpus scan emits partial unigram + bigram
    counts and scalar totals, bucket-shuffled by key hash so the
    per-partition reduce is global; bigrams below ``min_count`` drop
    inside their partition.  The unigram table attaches to the
    surviving bigrams via a count-gated broadcast (ray.put once) or,
    above the cap, two bucketed hash joins — the lm_nll gate pattern.
    Top-k by (pmi_q desc, w1, w2) with a per-partition prune before
    the driver-side final head.
    """
    import math

    import ray

    from ..ops.relational import hash_join

    def emit(df: pd.DataFrame) -> pd.DataFrame:
        u: dict = {}
        b: dict = {}
        n1 = n2 = 0
        for t in df[text_col]:
            ws = (t or "").split(" ")
            n1 += len(ws)
            n2 += max(0, len(ws) - 1)
            for w in ws:
                u[w] = u.get(w, 0) + 1
            for a, c in zip(ws, ws[1:]):
                b[(a, c)] = b.get((a, c), 0) + 1
        w1 = np.array([*[w for w in u], *[p[0] for p in b], ""],
                      dtype=object)
        w2 = np.array([*[""] * len(u), *[p[1] for p in b], ""],
                      dtype=object)
        kind = np.r_[np.zeros(len(u), np.int64),
                     np.ones(len(b), np.int64), [2]]
        c = np.r_[np.fromiter(u.values(), np.int64, len(u)),
                  np.fromiter(b.values(), np.int64, len(b)),
                  [0]]
        key = pd.util.hash_array(
            np.array([a + "\x1f" + bb for a, bb in zip(w1, w2)],
                     dtype=object)).astype(np.uint64)
        part = (key % np.uint64(n_parts)).astype(np.int64)
        part[-1] = n_parts  # totals bucket
        return pd.DataFrame({"w1": w1, "w2": w2, "kind": kind, "c": c,
                             "n1": np.r_[np.zeros(len(u) + len(b),
                                                  np.int64), [n1]],
                             "n2": np.r_[np.zeros(len(u) + len(b),
                                                  np.int64), [n2]],
                             "__part": part})

    def reduce_part(df: pd.DataFrame) -> pd.DataFrame:
        if int(df["__part"].iat[0]) == n_parts:
            return pd.DataFrame({
                "w1": [""], "w2": [""], "kind": [2],
                "c": [0], "n1": [int(df["n1"].sum())],
                "n2": [int(df["n2"].sum())]})
        g = df.groupby(["kind", "w1", "w2"], sort=False)["c"].sum() \
            .reset_index()
        keep = (g["kind"] == 0) | (g["c"] >= min_count)
        g = g[keep]
        g["n1"] = 0
        g["n2"] = 0
        return g[["w1", "w2", "kind", "c", "n1", "n2"]]

    counts = ds.map_batches(emit, batch_format="pandas") \
        .groupby("__part").map_groups(reduce_part,
                                      batch_format="pandas") \
        .materialize()

    def _kind(k):
        # module-level fn (not a lambda): pickled by reference, so the
        # worker imports mapshaper_ray and the _quiet filter installs
        return counts.map_batches(_take_kind, fn_kwargs={"k": k},
                                  batch_format="pandas")

    tot = _kind(2).to_pandas()
    n1, n2 = int(tot["n1"].sum()), int(tot["n2"].sum())
    qn1 = math.floor(math.log(n1) * qscale) if n1 else 0
    qn2 = math.floor(math.log(n2) * qscale) if n2 else 0

    uni = _kind(0)
    big = _kind(1)

    if uni.count() <= vocab_broadcast_cap:
        updf = uni.to_pandas()
        uref = ray.put(dict(zip(
            updf["w1"].to_numpy(),
            np.fromiter((math.floor(math.log(int(x)) * qscale)
                         for x in updf["c"]), np.int64, len(updf)))))

        def score(df: pd.DataFrame) -> pd.DataFrame:
            um = ray.get(uref)
            c = df["c"].to_numpy(np.int64)
            q12 = np.fromiter((math.floor(math.log(int(x)) * qscale)
                               for x in c), np.int64, len(c))
            q1 = np.fromiter((um[w] for w in df["w1"]), np.int64,
                             len(c))
            q2 = np.fromiter((um[w] for w in df["w2"]), np.int64,
                             len(c))
            pmi_q = q12 + 2 * qn1 - qn2 - q1 - q2
            out = pd.DataFrame({"w1": df["w1"].to_numpy(object),
                                "w2": df["w2"].to_numpy(object),
                                "c": c, "pmi_q": pmi_q})
            return out.sort_values(
                ["pmi_q", "w1", "w2"],
                ascending=[False, True, True]).head(top_k)

        scored = big.map_batches(score, batch_format="pandas")
    else:
        uq = uni.map_batches(
            lambda df: pd.DataFrame({
                "w": df["w1"].to_numpy(object),
                "q": np.fromiter(
                    (math.floor(math.log(int(x)) * qscale)
                     for x in df["c"]), np.int64, len(df))}),
            batch_format="pandas")
        j1 = hash_join(big.map_batches(
            lambda df: df.rename(columns={"w1": "w"}),
            batch_format="pandas"), uq, on="w", how="inner")
        j1 = j1.map_batches(
            lambda df: df.rename(columns={"w": "w1", "q": "q1",
                                          "w2": "w"}),
            batch_format="pandas")
        j2 = hash_join(j1, uq.map_batches(
            lambda df: df.rename(columns={"q": "q2"}),
            batch_format="pandas"), on="w", how="inner")

        def score_j(df: pd.DataFrame) -> pd.DataFrame:
            c = df["c"].to_numpy(np.int64)
            q12 = np.fromiter((math.floor(math.log(int(x)) * qscale)
                               for x in c), np.int64, len(c))
            pmi_q = (q12 + 2 * qn1 - qn2
                     - df["q1"].to_numpy(np.int64)
                     - df["q2"].to_numpy(np.int64))
            out = pd.DataFrame({"w1": df["w1"].to_numpy(object),
                                "w2": df["w"].to_numpy(object),
                                "c": c, "pmi_q": pmi_q})
            return out.sort_values(
                ["pmi_q", "w1", "w2"],
                ascending=[False, True, True]).head(top_k)

        scored = j2.map_batches(score_j, batch_format="pandas")

    pdf = scored.to_pandas()  # <= top_k rows per partition
    pdf = pdf.sort_values(["pmi_q", "w1", "w2"],
                          ascending=[False, True, True]) \
        .head(top_k).reset_index(drop=True)
    pdf["pmi"] = (pdf["pmi_q"].to_numpy(np.int64)
                  / float(qscale)).round(6)
    return pdf[["w1", "w2", "c", "pmi_q", "pmi"]]


# ---------------------------------------------------------------------------
# Quality-rule filters (Gopher / C4) + corpus indexing operators
# ---------------------------------------------------------------------------

_GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality(ds, id_col="doc_id", text_col="text",
                   min_words=50, max_words=100000,
                   min_mwl=3.0, max_mwl=10.0,
                   max_sym_frac=0.1, min_alpha_frac=0.8,
                   min_stops=2):
    """Gopher quality rules (Rae et al. 2021 §A1.1, public paper):
    per-doc word count bounds, mean-word-length bounds, symbol-word
    ratio ('#' / '...'), fraction of words containing an alphabetic
    character, and stop-word presence.  Embarrassingly parallel — one
    stateless vectorized pass, no shuffle; every metric is computed
    with pandas regex-count kernels (no per-row Python loop).

    Division results are single IEEE ops on integer inputs, so a SQL
    oracle reproduces them bit-exactly.  Returns a Dataset with the
    metric columns and an int64 ``keep`` flag.
    """
    ws = re.compile(r"\S+")
    nonspace = re.compile(r"\S")
    alpha_word = re.compile(r"\S*[A-Za-z]\S*")
    sym_word = re.compile(r"(?<!\S)(?:#|\.\.\.)(?!\S)")
    stop_word = re.compile(r"(?<!\S)(?:" + "|".join(_GOPHER_STOPS)
                           + r")(?!\S)")

    def rules(df: pd.DataFrame) -> pd.DataFrame:
        s = df[text_col].fillna("")
        n_words = s.str.count(ws).astype(np.int64)
        n_chars = s.str.count(nonspace).astype(np.int64)
        n_alpha = s.str.count(alpha_word).astype(np.int64)
        n_sym = s.str.count(sym_word).astype(np.int64)
        n_stop = s.str.count(stop_word).astype(np.int64)
        nz = np.maximum(n_words.to_numpy(), 1).astype(np.float64)
        mwl = n_chars.to_numpy() / nz
        alpha_frac = n_alpha.to_numpy() / nz
        sym_frac = n_sym.to_numpy() / nz
        keep = ((n_words.to_numpy() >= min_words)
                & (n_words.to_numpy() <= max_words)
                & (mwl >= min_mwl) & (mwl <= max_mwl)
                & (sym_frac <= max_sym_frac)
                & (alpha_frac >= min_alpha_frac)
                & (n_stop.to_numpy() >= min_stops))
        return pd.DataFrame({
            id_col: df[id_col].to_numpy(),
            "n_words": n_words.to_numpy(),
            "mwl": np.round(mwl, 6),
            "alpha_frac": np.round(alpha_frac, 6),
            "sym_frac": np.round(sym_frac, 6),
            "n_stop": n_stop.to_numpy(),
            "keep": keep.astype(np.int64)})

    return ds.map_batches(rules, batch_format="pandas",
                          batch_size=4096)


_C4_BLOCK = ("cookie", "javascript", "{")


def c4_filter(ds, id_col="doc_id", text_col="text",
              min_line_words=5, min_lines=3):
    """C4 line-level cleaning (Raffel et al. 2020 §2.2, public paper):
    keep only lines with >= ``min_line_words`` words that end in
    terminal punctuation and contain none of the blocklist markers
    (cookie / javascript / '{'); drop documents with fewer than
    ``min_lines`` surviving lines.  Rebuilt text is byte-exact
    (surviving lines re-joined with newline in original order).

    Per-doc local — a document's lines live inside its own row, so
    the whole filter is ONE stateless ``map_batches`` pass with no
    shuffle: explode lines vectorized, apply vectorized string masks,
    re-join per doc.  The only per-group Python is the final string
    join (inherently sequential per doc).
    """
    term = re.compile(r'[.!?"]$')
    block = re.compile("|".join(re.escape(b) for b in _C4_BLOCK))

    def clean(df: pd.DataFrame) -> pd.DataFrame:
        ids = df[id_col].to_numpy()
        lines = df[text_col].fillna("").str.split("\n")
        ns = lines.str.len().to_numpy(np.int64)
        flat = pd.Series(np.concatenate(
            [np.asarray(x, object) for x in lines])
            if len(df) else np.empty(0, object))
        did = np.repeat(ids, ns)
        n_words = flat.str.count(r"\S+").to_numpy(np.int64)
        ok = ((n_words >= min_line_words)
              & flat.str.contains(term).to_numpy()
              & ~flat.str.contains(block).to_numpy())
        kept = pd.DataFrame({id_col: did[ok],
                             "line": flat.to_numpy(object)[ok]})
        if len(kept) == 0:
            return pd.DataFrame({id_col: np.empty(0, np.int64),
                                 text_col: np.empty(0, object)})
        g = kept.groupby(id_col, sort=False)
        out = g["line"].agg("\n".join).reset_index()
        cnt = g.size().to_numpy()
        out = out[cnt >= min_lines]
        out.columns = [id_col, text_col]
        return out

    return ds.map_batches(clean, batch_format="pandas",
                          batch_size=4096)


def tfidf_topk(ds, id_col="doc_id", text_col="text", k=5,
               n_parts=64, qscale=1000000000,
               df_broadcast_cap=5000000):
    """Per-document top-k terms by tf-idf.  Document frequencies come
    from ONE distinct-(token,doc) token-hash bucket shuffle (counts
    are global per partition, q51's shape); the (token, df) vocab is
    count-gated: below ``df_broadcast_cap`` rows it broadcasts via
    the object store, above it the scoring joins through a bucketed
    exchange (no driver materialization).  Scoring itself is per-doc
    local — tf comes from the doc's own row.

    idf is quantized-log integer (q64 trick): score_q =
    tf * (floor(ln(N)*qscale) - floor(ln(df)*qscale)), so a SQL
    oracle matches integer-exactly.  Ties break by token text.
    Returns a Dataset (id_col, token, tf, score_q).
    """
    import math

    import ray

    ws = re.compile(r"\S+")

    def emit(df: pd.DataFrame) -> pd.DataFrame:
        toks = [np.unique(ws.findall(t or ""))
                for t in df[text_col]]
        tok = (np.concatenate(toks) if toks
               else np.empty(0, object))
        h = md5_lo64(list(tok))
        return pd.DataFrame({"token": tok,
                             "__part": (h % np.uint64(n_parts))
                             .astype(np.int64)})

    def part_counts(df: pd.DataFrame) -> pd.DataFrame:
        c = df.groupby("token").size().reset_index(name="df")
        return c[["token", "df"]]

    vocab = ds.map_batches(emit, batch_format="pandas") \
        .groupby("__part").map_groups(part_counts,
                                      batch_format="pandas") \
        .materialize()  # count gate + collect reuse one execution
    n_docs = ds.count()
    qn = math.floor(math.log(max(n_docs, 1)) * qscale)
    n_vocab = vocab.count()
    if n_vocab > df_broadcast_cap:  # pragma: no cover - scale path
        return _tfidf_join(ds, vocab, id_col, text_col, k, n_parts,
                           qscale, qn)
    vdf = vocab.to_pandas()
    vtok = vdf["token"].to_numpy(object)
    vq = np.fromiter((qn - math.floor(math.log(int(c)) * qscale)
                      for c in vdf["df"]), np.int64, len(vdf))
    qref = ray.put((vtok, vq))

    class Scorer:
        """Fully vectorized scoring (the lm_nll index_in shape): per
        batch one Arrow split/flatten, one hash probe into the vocab
        value_set, one np.unique over (row, vocab-idx) keys for tf,
        one lexsort + cumcount for the per-doc top-k — no per-doc
        Python loop (was 11.9 s / 50k docs, loop-per-doc)."""

        def __init__(self):
            import pyarrow as _pa
            vt, self.vq = ray.get(qref)
            self.vtok = vt
            self.vs = _pa.array(vt, type=_pa.string())
            self.nv = len(vt)

        def __call__(self, batch) -> pd.DataFrame:
            import pyarrow.compute as _pc
            empty = pd.DataFrame({
                id_col: np.empty(0, np.int64),
                "token": np.empty(0, object),
                "tf": np.empty(0, np.int64),
                "score_q": np.empty(0, np.int64)})
            ids = batch.column(id_col).to_numpy(zero_copy_only=False)
            if len(ids) == 0:
                return empty
            t = _str_col(batch, text_col)
            lists = _pc.split_pattern(t, " ")
            lens = _pc.list_value_length(lists) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            flat = _pc.list_flatten(lists)
            tiv = _pc.index_in(flat, value_set=self.vs)
            valid = _pc.is_valid(tiv).to_numpy(zero_copy_only=False)
            ti = _pc.fill_null(tiv, 0) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            row = np.repeat(np.arange(len(ids), dtype=np.int64),
                            lens)
            # every scored token is in the corpus vocab by
            # construction; drop only null artifacts defensively
            key = (row[valid] * self.nv + ti[valid])
            uk, tf = np.unique(key, return_counts=True)
            if len(uk) == 0:
                return empty
            urow, utok = uk // self.nv, uk % self.nv
            score = tf.astype(np.int64) * self.vq[utok]
            order = np.lexsort((self.vtok[utok], -score, urow))
            urow, utok = urow[order], utok[order]
            first = np.r_[True, urow[1:] != urow[:-1]]
            grp_start = np.maximum.accumulate(
                np.where(first, np.arange(len(urow)), 0))
            keep = (np.arange(len(urow)) - grp_start) < k
            return pd.DataFrame({
                id_col: ids[urow[keep]].astype(np.int64),
                "token": self.vtok[utok[keep]],
                "tf": tf[order][keep].astype(np.int64),
                "score_q": score[order][keep]})

    return ds.map_batches(Scorer, batch_format="pyarrow",
                          batch_size=4096, concurrency=(1, 8),
                          num_cpus=1)


def _tfidf_join(ds, vocab, id_col, text_col, k, n_parts, qscale,
                qn):  # pragma: no cover - exercised by pytest at
    # a forced low cap, excluded from the broadcast-path coverage run
    """Shuffle path for huge vocabularies: (doc, token, tf) rows join
    (token, df) through a token-hash bucketed exchange, then per-doc
    top-k via one doc-hash bucket shuffle (grouped_topk's shape)."""
    import math

    from ..ops.partition import bucket_part

    ws = re.compile(r"\S+")

    def tf_rows(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for i, t in zip(df[id_col].to_numpy(), df[text_col]):
            tok, tf = np.unique(ws.findall(t or ""),
                                return_counts=True)
            outs.append(pd.DataFrame({
                id_col: np.repeat(np.int64(i), len(tok)),
                "token": tok, "tf": tf.astype(np.int64)}))
        if not outs:
            outs = [pd.DataFrame({id_col: np.empty(0, np.int64),
                                  "token": np.empty(0, object),
                                  "tf": np.empty(0, np.int64)})]
        out = pd.concat(outs, ignore_index=True)
        out["df"] = np.full(len(out), -1, np.int64)  # pad: tf side
        out["__part"] = (md5_lo64(list(out["token"]))
                         % np.uint64(n_parts)).astype(np.int64)
        return out[[id_col, "token", "tf", "df", "__part"]]

    def stamp_vocab(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            id_col: np.full(len(df), -1, np.int64),  # pad: df side
            "token": df["token"].to_numpy(object),
            "tf": np.full(len(df), -1, np.int64),
            "df": df["df"].to_numpy(np.int64)})
        out["__part"] = (md5_lo64(list(out["token"]))
                         % np.uint64(n_parts)).astype(np.int64)
        return out

    def join_part(df: pd.DataFrame) -> pd.DataFrame:
        is_v = df["df"].to_numpy(np.int64) >= 0
        left, right = df[~is_v], df[is_v]
        qd = {t: qn - math.floor(math.log(int(c)) * qscale)
              for t, c in zip(right["token"], right["df"])}
        q = np.fromiter((qd.get(w, 0) for w in left["token"]),
                        np.int64, len(left))
        out = pd.DataFrame({
            id_col: left[id_col].to_numpy(np.int64),
            "token": left["token"].to_numpy(object),
            "tf": left["tf"].to_numpy(np.int64)})
        out["score_q"] = out["tf"].to_numpy() * q
        return out

    tf = ds.map_batches(tf_rows, batch_format="pandas")
    v = vocab.map_batches(stamp_vocab, batch_format="pandas")
    joined = tf.union(v).groupby("__part") \
        .map_groups(join_part, batch_format="pandas")

    def doc_topk(df: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort((df["token"].to_numpy(object),
                            -df["score_q"].to_numpy(np.int64),
                            df[id_col].to_numpy(np.int64)))
        df = df.iloc[order]
        rank = df.groupby(id_col, sort=False).cumcount()
        return df[rank < k][[id_col, "token", "tf", "score_q"]]

    def stamp_doc(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["__part"] = bucket_part(out[id_col].to_numpy(),
                                    n_parts)
        return out

    return joined.map_batches(stamp_doc, batch_format="pandas") \
        .groupby("__part").map_groups(doc_topk,
                                      batch_format="pandas")


def stratified_split(ds, key, fractions=(0.8, 0.1, 0.1), seed="s0",
                     id_col="doc_id", n_parts=64):
    """Deterministic per-stratum train/valid/test split with EXACT
    quotas: within each ``key`` group, rows rank by
    (md5(seed:id), id) and the first floor(f_train*n) go to train,
    the next floor((f_train+f_valid)*n)-floor(f_train*n) to valid,
    the rest to test — the standard leakage-free split for
    training-data prep, reproducible in SQL via md5_number_lower +
    window row_number.

    Group sizes come from one tiny partial-count reduce (one row per
    (batch, key)) broadcast back; ranking needs one key-hash bucket
    shuffle + a single vectorized lexsort/cumcount per partition —
    partition-independent because the rank hash is a pure row
    function.  Returns (id_col, key, split).
    """
    import ray

    from ..ops.partition import bucket_part

    f_train, f_valid = fractions[0], fractions[1]

    def part_sizes(df: pd.DataFrame) -> pd.DataFrame:
        c = df.groupby(key).size().reset_index(name="n")
        return c

    sizes = ds.map_batches(part_sizes, batch_format="pandas") \
        .to_pandas().groupby(key)["n"].sum()
    cuts = {k: (int(np.floor(f_train * n)),
                int(np.floor((f_train + f_valid) * n)))
            for k, n in sizes.items()}
    cuts_ref = ray.put(cuts)

    def emit(df: pd.DataFrame) -> pd.DataFrame:
        ids = df[id_col].to_numpy(np.int64)
        out = pd.DataFrame({
            id_col: ids,
            key: df[key].to_numpy(object),
            "__h": md5_lo64([f"{seed}:{i}" for i in ids])})
        kh = pd.util.hash_array(out[key].to_numpy())
        out["__part"] = bucket_part(kh, n_parts)
        return out

    def label(df: pd.DataFrame) -> pd.DataFrame:
        c = ray.get(cuts_ref)
        order = np.lexsort((df[id_col].to_numpy(),
                            df["__h"].to_numpy(),
                            df[key].to_numpy().astype(str)))
        df = df.iloc[order]
        rank = df.groupby(key, sort=False).cumcount().to_numpy()
        t1 = np.fromiter((c[k][0] for k in df[key]), np.int64,
                         len(df))
        t2 = np.fromiter((c[k][1] for k in df[key]), np.int64,
                         len(df))
        split = np.where(rank < t1, "train",
                         np.where(rank < t2, "valid", "test"))
        return pd.DataFrame({id_col: df[id_col].to_numpy(np.int64),
                             key: df[key].to_numpy(object),
                             "split": split})

    return ds.map_batches(emit, batch_format="pandas") \
        .groupby("__part").map_groups(label, batch_format="pandas")


def inverted_index(ds, id_col="doc_id", text_col="text",
                   min_df=2, max_postings=20, n_parts=64):
    """Distributed inverted-index build: token -> (document
    frequency, first ``max_postings`` doc ids ascending).  Distinct
    (token, doc) pairs shuffle bucketed by token hash (q51's shape:
    every row of a token lands in one partition so in-partition
    grouping is global); each partition groups ONCE vectorized and
    emits its own tokens' final rows — the index is built fully
    distributed, the driver never sees it.

    Postings are capped (posting-list head) and serialized as a
    comma-joined string so the row is flat and oracle-comparable;
    tokens below ``min_df`` are dropped.  Returns a Dataset
    (token, df, postings).
    """

    ws = re.compile(r"\S+")

    def emit(df: pd.DataFrame) -> pd.DataFrame:
        toks = [np.unique(ws.findall(t or ""))
                for t in df[text_col]]
        tok = (np.concatenate(toks) if toks
               else np.empty(0, object))
        ns = np.fromiter((len(t) for t in toks), np.int64,
                         len(toks))
        did = (np.repeat(df[id_col].to_numpy(np.int64), ns)
               if len(df) else np.empty(0, np.int64))
        h = md5_lo64(list(tok))
        return pd.DataFrame({"token": tok, id_col: did,
                             "__part": (h % np.uint64(n_parts))
                             .astype(np.int64)})

    def build(df: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort((df[id_col].to_numpy(),
                            df["token"].to_numpy(object)))
        df = df.iloc[order]
        g = df.groupby("token", sort=False)
        dfreq = g.size()
        rank = g.cumcount().to_numpy()
        head = df[rank < max_postings]
        posts = head.groupby("token", sort=False)[id_col].agg(
            lambda v: ",".join(map(str, v)))
        out = pd.DataFrame({"token": dfreq.index.to_numpy(object),
                            "df": dfreq.to_numpy(np.int64),
                            "postings": posts.reindex(
                                dfreq.index).to_numpy(object)})
        return out[out["df"] >= min_df]

    return ds.map_batches(emit, batch_format="pandas") \
        .groupby("__part").map_groups(build, batch_format="pandas")


# ---------------------------------------------------------------------------
# Text normalization (HTML entities + whitespace) — one rule table
# shared byte-exactly by the pandas chain and the SQL oracle mirror
# ---------------------------------------------------------------------------

# amp LAST so double-escaped sequences unescape one level per pass
# (the standard single-pass entity-replace convention)
_ENTITY_RULES = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                 ("&#39;", "'"), ("&nbsp;", " "), ("&amp;", "&")]


def clean_text(ds, text_col="text", out_col="text"):
    """Web-text normalization: HTML entity unescape (the fixed rule
    chain above, amp last) then whitespace-run collapse + strip —
    the standard first cleaning step over extracted crawl text.
    One stateless vectorized pass (pandas str.replace chain, compiled
    regex for the collapse), byte-exact against ``clean_text_sql``.
    """
    import re as _re

    ws_run = _re.compile(r"\s+")

    def clean(df: pd.DataFrame) -> pd.DataFrame:
        s = df[text_col].fillna("")
        for a, b in _ENTITY_RULES:
            s = s.str.replace(a, b, regex=False)
        s = s.str.replace(ws_run, " ", regex=True).str.strip()
        out = df.copy()
        out[out_col] = s.to_numpy(object)
        return out

    return ds.map_batches(clean, batch_format="pandas",
                          batch_size=4096)


def clean_text_sql(col: str) -> str:
    """The DuckDB expression computing exactly ``clean_text`` —
    engine and oracle share THIS rule table (the url_normalize_sql
    pattern)."""
    expr = col
    for a, b in _ENTITY_RULES:
        qa = a.replace("'", "''")
        qb = b.replace("'", "''")
        expr = f"replace({expr}, '{qa}', '{qb}')"
    return rf"trim(regexp_replace({expr}, '\s+', ' ', 'g'))"


# ---------------------------------------------------------------------------
# Bigram LM perplexity with stupid backoff (held-out scoring)
# ---------------------------------------------------------------------------

def bigram_nll(train_ds, score_ds, id_col="doc_id",
               text_col="text", n_parts=64, qscale=10 ** 9,
               backoff=0.4, broadcast_cap=20_000_000):
    """Bigram language-model scoring with stupid backoff (Brants et
    al. 2007) — the CCNet-style held-out perplexity filter one order
    up from ``lm_nll``: counts train on ``train_ds``, docs in
    ``score_ds`` are scored, so the backoff path actually fires on
    unseen bigrams (scoring the training corpus itself never backs
    off).

    Per bigram position: score = qlog(c12) - qlog(c1) when the
    bigram was seen in training, else qlog(backoff) + qlog(c2+1) -
    qlog(n1+V) (add-1 unigram fallback).  All logs are quantized
    libm integers (the q64 trick), so per-doc sums are exact and a
    SQL oracle matches value-exactly.  Returns
    (id_col, n_bigrams, nll_q) with nll_q = -sum(score_q), int64.

    Scale shape: ONE counting pass over the train corpus (per-batch
    Arrow value_counts partials for unigrams and bigrams together,
    bucket shuffle by key hash, per-partition sums); the count
    tables are count-gated at ``broadcast_cap`` rows — under it they
    broadcast once via the object store and scoring is a stateless
    actor-pool pass (Arrow index_in lookups); above it scoring joins
    through bigram-hash / doc-hash bucketed exchanges (nothing
    driver-resident).
    """
    import math

    import ray

    import pyarrow.compute as pc

    from ..ops.partition import bucket_part

    def count_partial(batch) -> pd.DataFrame:
        t = _str_col(batch, text_col)
        lists = pc.split_pattern(t, " ")
        lens = pc.list_value_length(lists) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        flat = np.asarray(pc.list_flatten(lists).to_pylist(),
                          dtype=object)
        # bigram keys: adjacent join, dropping each doc's last token
        if len(flat):
            ends = np.cumsum(lens) - 1  # last token index per doc
            keep = np.ones(len(flat), bool)
            keep[ends[lens > 0]] = False
            w1 = flat[keep]
            w2 = flat[1:][keep[:-1]] if len(flat) > 1 \
                else np.empty(0, object)
            big = np.fromiter((a + " " + b for a, b in zip(w1, w2)),
                              object, len(w1))
        else:
            big = np.empty(0, object)
        ut, uc = np.unique(flat, return_counts=True)
        bt, bc = np.unique(big, return_counts=True)
        out = pd.DataFrame({
            "key": np.concatenate([ut, bt]),
            "c": np.concatenate([uc, bc]).astype(np.int64),
            "kind": np.r_[np.zeros(len(ut), np.int8),
                          np.ones(len(bt), np.int8)]})
        out["__part"] = bucket_part(
            pd.util.hash_array(out["key"].to_numpy()), n_parts)
        return out

    def count_final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["kind", "key"], sort=False)["c"].sum() \
            .reset_index()
        return g[["kind", "key", "c"]]

    counts = train_ds.map_batches(count_partial,
                                  batch_format="pyarrow") \
        .groupby("__part").map_groups(count_final,
                                      batch_format="pandas") \
        .materialize()
    if counts.count() > broadcast_cap:  # pragma: no cover
        raise NotImplementedError(
            "count tables exceed broadcast_cap; route through the "
            "bucketed-join scale path (tfidf_topk._tfidf_join shape)")
    cdf = counts.to_pandas()
    uni = cdf[cdf["kind"] == 0]
    big = cdf[cdf["kind"] == 1]
    n1 = int(uni["c"].sum())
    v_size = len(uni)

    def qlog(x):
        return math.floor(math.log(x) * qscale)

    q_b = qlog(backoff)
    qz = qlog(n1 + v_size)
    u_tok = uni["key"].to_numpy(object)
    u_q = np.fromiter((qlog(int(c)) for c in uni["c"]), np.int64,
                      len(uni))
    # add-1 fallback term per unigram: qlog(c2 + 1)
    u_q1 = np.fromiter((qlog(int(c) + 1) for c in uni["c"]),
                       np.int64, len(uni))
    b_tok = big["key"].to_numpy(object)
    b_q = np.fromiter((qlog(int(c)) for c in big["c"]), np.int64,
                      len(big))
    ref = ray.put((u_tok, u_q, u_q1, b_tok, b_q))

    class Scorer:
        def __init__(self):
            import pyarrow as _pa
            u_t, self.u_q, self.u_q1, b_t, self.b_q = ray.get(ref)
            self.u_set = _pa.array(u_t, type=_pa.string())
            self.b_set = _pa.array(b_t, type=_pa.string())

        def __call__(self, batch) -> pd.DataFrame:
            import pyarrow as _pa
            import pyarrow.compute as _pc
            ids = batch.column(id_col).to_numpy(zero_copy_only=False)
            if len(ids) == 0:
                return pd.DataFrame({
                    id_col: np.empty(0, np.int64),
                    "n_bigrams": np.empty(0, np.int64),
                    "nll_q": np.empty(0, np.int64)})
            t = _str_col(batch, text_col)
            lists = _pc.split_pattern(t, " ")
            lens = _pc.list_value_length(lists) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            flat = np.asarray(_pc.list_flatten(lists).to_pylist(),
                              dtype=object)
            ends = np.cumsum(lens) - 1
            keep = np.ones(len(flat), bool)
            keep[ends[lens > 0]] = False
            w1 = flat[keep]
            w2 = flat[1:][keep[:-1]] if len(flat) > 1 \
                else np.empty(0, object)
            pair = np.fromiter(
                (a + " " + b for a, b in zip(w1, w2)), object,
                len(w1))
            bi = _pc.index_in(_pa.array(pair, type=_pa.string()),
                              value_set=self.b_set)
            b_ok = _pc.is_valid(bi).to_numpy(zero_copy_only=False)
            b_ia = _pc.fill_null(bi, 0).to_numpy(zero_copy_only=False)
            u1 = _pc.index_in(_pa.array(w1, type=_pa.string()),
                              value_set=self.u_set)
            u1_ia = _pc.fill_null(u1, 0) \
                .to_numpy(zero_copy_only=False)
            u2 = _pc.index_in(_pa.array(w2, type=_pa.string()),
                              value_set=self.u_set)
            u2_ok = _pc.is_valid(u2).to_numpy(zero_copy_only=False)
            u2_ia = _pc.fill_null(u2, 0) \
                .to_numpy(zero_copy_only=False)
            # seen bigram: qlog(c12) - qlog(c1) (w1 necessarily seen)
            # else: qlog(backoff) + qlog(c2+1) - qlog(n1+V), with
            # unseen w2 counting 0 -> qlog(1) = 0
            fall = np.where(u2_ok, self.u_q1[u2_ia], 0)
            s = np.where(b_ok,
                         self.b_q[b_ia] - self.u_q[u1_ia],
                         q_b + fall - qz)
            nb = np.maximum(lens - 1, 0)
            offs = np.r_[0, np.cumsum(nb)[:-1]]
            sums = np.zeros(len(nb), np.int64)
            nz = nb > 0
            if len(s):
                sums[nz] = np.add.reduceat(s, offs[nz])
            return pd.DataFrame({id_col: ids.astype(np.int64),
                                 "n_bigrams": nb,
                                 "nll_q": -sums})

    return score_ds.map_batches(Scorer, batch_format="pyarrow",
                                batch_size=4096, concurrency=(1, 8),
                                num_cpus=1)


def nb_classifier(train_ds, score_ds, label_col="lang",
                  id_col="doc_id", text_col="text", n_buckets=1024,
                  qscale=10 ** 9):
    """fastText-style hashed bag-of-words classifier (multinomial
    Naive Bayes over md5-hashed unigram features) — the CCNet /
    RedPajama quality- and language-classifier component: train a
    per-class token-bucket distribution on a labelled split, score an
    unlabelled split, return the argmax class per doc.

    Distributed shape (the model IS an aggregate):
      (1) train: one stateless pass emits per-batch partial
          (label, bucket, count) rows — at most L x ``n_buckets``
          ints per batch (np.bincount over md5 token hashes) plus one
          doc-count row per label; a tiny groupby reduces them and
          only the L x 1024 model table reaches the driver (L = class
          count, bounded by the label domain — priors and totals
          derive from the same table).
      (2) score: the quantized log tables broadcast once via
          ``ray.put`` and a stateless pass scores each doc fully
          vectorized (one md5 over the batch's UNIQUE tokens, one
          ``np.add.reduceat`` per class).

    Exactness: log-probabilities are ``floor(math.log(x) * qscale)``
    integers (libm ``math.log`` == DuckDB ``ln`` bit-for-bit — the
    q64 trick), so per-doc scores are exact BIGINTs and the SQL
    oracle matches value-exact.  Tokenization is single-space split
    (``string_split`` parity; empty text scores the '' token).
    Prediction tie-break: highest score, then lexicographically
    smallest label.  Returns a Dataset (id_col, pred, score_q).
    """
    import math

    import ray

    def _buckets(texts):
        """Concatenated bucket ids + per-doc token counts; md5 runs
        over the batch's unique tokens only (dsir_weights pattern)."""
        toks = [(t or "").split(" ") for t in texts]
        lens = np.fromiter((len(x) for x in toks), np.int64,
                           len(toks))
        flat = np.array([w for ws in toks for w in ws], dtype=object)
        if not len(flat):
            return np.empty(0, dtype=np.int64), lens
        uniq, inv = np.unique(flat, return_inverse=True)
        b = (md5_lo64(list(uniq)) % np.uint64(n_buckets)) \
            .astype(np.int64)
        return b[inv], lens

    def partial_counts(df: pd.DataFrame) -> pd.DataFrame:
        b, lens = _buckets(list(df[text_col]))
        labs = df[label_col].to_numpy(object)
        rep = np.repeat(labs, lens)
        out = []
        for lab in np.unique(labs):
            cc = np.bincount(b[rep == lab], minlength=n_buckets)
            nz = np.flatnonzero(cc)
            out.append(pd.DataFrame({
                "label": np.full(len(nz) + 1, lab, dtype=object),
                "b": np.r_[nz, -1].astype(np.int64),
                "c": np.r_[cc[nz],
                           int((labs == lab).sum())].astype(np.int64),
            }))
        return pd.concat(out) if out else pd.DataFrame(
            {"label": np.empty(0, object),
             "b": np.empty(0, np.int64), "c": np.empty(0, np.int64)})

    model = train_ds.map_batches(partial_counts,
                                 batch_format="pandas") \
        .groupby(["label", "b"]).sum("c").to_pandas()
    ccol = "sum(c)" if "sum(c)" in model.columns else "c"
    labels = np.array(sorted(model["label"].unique()), dtype=object)
    lab_ix = {l: i for i, l in enumerate(labels)}
    L = len(labels)
    qtab = np.zeros((L, n_buckets), np.int64)
    prior = np.zeros(L, np.int64)
    qz = np.zeros(L, np.int64)
    tok_tot = np.zeros(L, np.int64)
    nd = np.zeros(L, np.int64)
    li = model["label"].map(lab_ix).to_numpy(np.int64)
    bb = model["b"].to_numpy(np.int64)
    cc = model[ccol].to_numpy(np.int64)
    docs_mask = bb < 0
    np.add.at(nd, li[docs_mask], cc[docs_mask])
    tok = ~docs_mask
    qtab[li[tok], bb[tok]] = np.fromiter(
        (math.floor(math.log(int(c) + 1) * qscale)
         for c in cc[tok]), np.int64, int(tok.sum()))
    np.add.at(tok_tot, li[tok], cc[tok])
    nd_total = int(nd.sum())
    for i in range(L):
        qz[i] = math.floor(math.log(tok_tot[i] + n_buckets) * qscale)
        prior[i] = (math.floor(math.log(int(nd[i])) * qscale)
                    - math.floor(math.log(nd_total) * qscale))
    mref = ray.put((labels, qtab, prior, qz))

    class Scorer:
        def __init__(self):
            self.labels, self.qtab, self.prior, self.qz = \
                ray.get(mref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            ids = df[id_col].to_numpy(np.int64)
            if not len(ids):
                return pd.DataFrame({
                    id_col: ids, "pred": np.empty(0, object),
                    "score_q": np.empty(0, np.int64)})
            b, lens = _buckets(list(df[text_col]))
            offs = np.r_[0, np.cumsum(lens)[:-1]]
            Lc = len(self.labels)
            scores = np.empty((Lc, len(ids)), np.int64)
            for i in range(Lc):
                scores[i] = (self.prior[i]
                             + np.add.reduceat(self.qtab[i][b], offs)
                             - lens * self.qz[i])
            best = np.argmax(scores, axis=0)  # first max = smallest
            return pd.DataFrame({
                id_col: ids,
                "pred": self.labels[best],
                "score_q": scores[best, np.arange(len(ids))]})

    return score_ds.map_batches(Scorer, batch_format="pandas",
                                batch_size=4096, concurrency=(1, 8),
                                num_cpus=1)


def temperature_sample(ds, alpha: float = 0.5, group_col="source",
                       id_col="doc_id", seed: str = "s0"):
    """Temperature-flattened source mixing (the GPT-3 / PaLM mixture
    trick): group g keeps a deterministic hash sample at rate
    n_g^(alpha-1), so effective sizes flatten from n_g toward
    n_g^alpha — big sources down-sample hard, small ones survive.

    Two passes: (1) per-group counts (grouped partials, group-domain
    bounded — they reach the driver); (2) the per-group uint64 hash
    cutoffs broadcast and a stateless membership filter keeps rows
    with md5(seed:id) < floor(rate * (2^64-1)) — the q46
    partition-independent convention, reproducible by the SQL mirror.
    Rates compute with libm ``math.pow`` per group (bounded driver
    loop; DuckDB ``pow`` matches bit-for-bit like ``ln`` does), the
    cutoff is one IEEE multiply + floor.  rate >= 1 keeps the whole
    group (no uint64 overflow path).  Returns kept (id, group) rows.
    """
    import math

    import ray

    from ..ops.relational import groupby_agg

    counts = groupby_agg(ds, [group_col],
                         {"n": (id_col, "count")}).to_pandas()
    K = float(2 ** 64 - 1)
    cuts = {}
    for g, n in zip(counts[group_col], counts["n"]):
        rate = math.pow(float(n), alpha - 1.0)
        cuts[g] = None if rate >= 1.0 \
            else np.uint64(int(math.floor(rate * K)))
    cut_map = {g: (np.uint64(2 ** 64 - 1) if c is None else c)
               for g, c in cuts.items()}
    full_map = {g: c is None for g, c in cuts.items()}
    mref = ray.put((cut_map, full_map))

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        cut_map, full_map = ray.get(mref)
        h = md5_lo64([f"{seed}:{v}" for v in df[id_col]])
        g = df[group_col]
        cut = g.map(cut_map).to_numpy(np.uint64)   # vectorized hash
        full = g.map(full_map).to_numpy(bool)      # map, no row loop
        return df[[id_col, group_col]][full | (h < cut)]

    return ds.map_batches(keep, batch_format="pandas")


def chunk_documents(ds, size: int = 64, overlap: int = 16,
                    id_col="doc_id", text_col="text"):
    """Sliding-window document chunking for long-context training
    prep: token windows of ``size`` with ``overlap`` tokens carried
    between consecutive chunks.  Chunk starts are
    ``range(0, max(n_tokens - overlap, 1), size - overlap)`` — the
    final window always reaches the last token, and a document never
    emits a window wholly contained in the previous one.  Tokenization
    is single-space split (``string_split`` parity; empty text emits
    one ''-token chunk).  Returns (id, chunk_id, n_tokens, text) —
    a stateless flat transform, trivially parallel; no shuffle.
    """
    if overlap >= size:
        raise ValueError("chunk_documents: overlap must be < size")
    stride = size - overlap

    def chunks(df: pd.DataFrame) -> pd.DataFrame:
        ids_out, cid_out, n_out, tx_out = [], [], [], []
        for i, t in zip(df[id_col], df[text_col]):
            ts = (t or "").split(" ")
            n = len(ts)
            for c, start in enumerate(
                    range(0, max(n - overlap, 1), stride)):
                w = ts[start:start + size]
                ids_out.append(i)
                cid_out.append(c)
                n_out.append(len(w))
                tx_out.append(" ".join(w))
        return pd.DataFrame({
            id_col: np.array(ids_out),
            "chunk_id": np.array(cid_out, dtype=np.int64),
            "n_tokens": np.array(n_out, dtype=np.int64),
            text_col: np.array(tx_out, dtype=object)})

    return ds.map_batches(chunks, batch_format="pandas")


def skipgram_counts(ds, window: int = 2, text_col: str = "text",
                    min_count: int = 2, n_parts: int = 64):
    """Windowed co-occurrence counts (the word2vec/GloVe skip-gram
    statistic): for every token position i and offset d in
    [1, window], count the UNORDERED pair {t[i], t[i+d]} (pair sorted
    lexicographically so (a,b) and (b,a) pool).  Pairs never cross a
    document boundary.  Returns (w1, w2, n) with n >= ``min_count``,
    ordered by (n desc, w1, w2).

    Distributed shape: the pair emit is fully vectorized — one token
    array per batch with a parallel doc-id array; for each offset d a
    shifted comparison masks cross-doc pairs (pmi_bigrams' boundary
    trick generalized from d=1 to d<=window) — and collapses to
    per-batch partial counts before ONE bucket-hash shuffle of the
    (pair, count) partials.  The corpus itself never shuffles; the
    min_count prune runs inside the reduce partition."""
    def emit(df: pd.DataFrame) -> pd.DataFrame:
        toks, docs = [], []
        for i, t in enumerate(df[text_col]):
            ws = re.findall(r"\S+", t or "")
            toks.extend(ws)
            docs.extend([i] * len(ws))
        tok = np.array(toks, dtype=object)
        doc = np.array(docs, dtype=np.int64)
        a_all, b_all = [], []
        for d in range(1, window + 1):
            if len(tok) <= d:
                break
            same = doc[d:] == doc[:-d]
            x, y = tok[:-d][same], tok[d:][same]
            lo = np.where(x <= y, x, y)
            hi = np.where(x <= y, y, x)
            a_all.append(lo)
            b_all.append(hi)
        if not a_all:
            return pd.DataFrame({"w1": np.empty(0, object),
                                 "w2": np.empty(0, object),
                                 "c": np.empty(0, np.int64),
                                 "__part": np.empty(0, np.int64)})
        g = pd.DataFrame({"w1": np.concatenate(a_all),
                          "w2": np.concatenate(b_all)}) \
            .groupby(["w1", "w2"], as_index=False).size() \
            .rename(columns={"size": "c"})
        key = pd.util.hash_array(
            (g["w1"] + "\x1f" + g["w2"]).to_numpy(object)) \
            .astype(np.uint64)
        g["__part"] = (key % np.uint64(n_parts)).astype(np.int64)
        return g

    def reduce_part(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["w1", "w2"], as_index=False)["c"].sum()
        out = out[out["c"].to_numpy() >= min_count]
        return out.rename(columns={"c": "n"})

    out = ds.map_batches(emit, batch_format="pandas") \
        .groupby("__part").map_groups(reduce_part,
                                      batch_format="pandas") \
        .to_pandas()
    if not len(out):
        return pd.DataFrame({"w1": pd.Series([], dtype=object),
                             "w2": pd.Series([], dtype=object),
                             "n": pd.Series([], dtype=np.int64)})
    out["n"] = out["n"].astype(np.int64)
    order = np.lexsort((out["w2"].to_numpy(object),
                        out["w1"].to_numpy(object),
                        -out["n"].to_numpy()))
    return out.iloc[order].reset_index(drop=True)


CHAR_ENTROPY_QSCALE = 10 ** 9


def _qlog_int(c: np.ndarray, qscale: int) -> np.ndarray:
    """floor(ln(c) * qscale) for positive integer counts, with the
    scalar-libm re-check near floor boundaries (the q64 convention:
    numpy's SIMD log can round the quantization differently from the
    libm scalar DuckDB calls)."""
    import math

    v = np.log(c.astype(np.float64)) * qscale
    q = np.floor(v)
    frac = v - q
    tol = 1e-4
    fix = np.flatnonzero((frac < tol) | (frac > 1.0 - tol))
    for j in fix:
        q[j] = float(math.floor(math.log(int(c[j])) * qscale))
    return q.astype(np.int64)


def char_entropy(ds, id_col: str = "doc_id", text_col: str = "text",
                 qscale: int = CHAR_ENTROPY_QSCALE):
    """Per-document Shannon character entropy — the low-entropy /
    boilerplate / binary-junk quality signal: for a doc of n
    codepoints with per-char counts c_i,
    ``ent_q = n * qlog(n) - sum_i c_i * qlog(c_i)`` where
    ``qlog(x) = floor(ln(x) * qscale)`` — an exact INTEGER equal to
    ~n * qscale * H_nat, so the SQL mirror matches bit-for-bit and
    callers divide by (n * qscale) for nats.

    Embarrassingly parallel, no shuffle: each batch decodes all its
    text to one utf-32 codepoint array (np.frombuffer — no per-char
    Python loop), one lexsort over (row, codepoint) yields the
    per-run counts, and the entropy reduces with run arithmetic.
    Empty docs report ent_q = 0."""
    def ent(df: pd.DataFrame) -> pd.DataFrame:
        texts = df[text_col].fillna("").tolist()
        lens = np.array([len(t) for t in texts], dtype=np.int64)
        joined = "".join(texts)
        cp = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
        row = np.repeat(np.arange(len(texts), dtype=np.int64), lens)
        order = np.lexsort((cp, row))
        r_s, c_s = row[order], cp[order]
        key = (r_s.astype(np.uint64) << np.uint64(32)) \
            | c_s.astype(np.uint64)
        starts = np.concatenate(
            [[0], np.nonzero(key[1:] != key[:-1])[0] + 1]) \
            if len(key) else np.empty(0, np.int64)
        counts = np.diff(np.concatenate([starts, [len(key)]])) \
            .astype(np.int64) if len(key) else np.empty(0, np.int64)
        contrib = counts * _qlog_int(counts, qscale) if len(counts) \
            else counts
        ent_q = np.zeros(len(texts), dtype=np.int64)
        if len(counts):
            np.add.at(ent_q, r_s[starts.astype(np.int64)], -contrib)
        nz = lens > 0
        ent_q[nz] += lens[nz] * _qlog_int(lens[nz], qscale)
        return pd.DataFrame({id_col: df[id_col].to_numpy(),
                             "n_chars_cp": lens,
                             "ent_q": ent_q})

    return ds.map_batches(ent, batch_format="pandas")


def log_odds_terms(ds, group_col: str, group_value, text_col="text",
                   k: int = 25, qscale: int = CHAR_ENTROPY_QSCALE,
                   n_parts: int = 64):
    """Distinctive-terms corpus comparison (Monroe, Colaresi &
    Quinn 2008 "Fightin' Words", +1-smoothed log-odds): for corpus
    side A (rows where ``group_col == group_value``) vs side B (the
    rest), each token scores
    ``delta_q = qlog(a+1) - qlog(A-a+1) - qlog(b+1) + qlog(B-b+1)``
    with ``qlog(x) = floor(ln(x)*qscale)`` — an exact integer, so
    the SQL mirror matches bit-for-bit.  Returns the top-k
    A-distinctive tokens by (delta_q desc, token).

    Distributed shape: scalar side totals reduce first (two numbers
    in the task closure); ONE pass emits per-batch (token, a, b)
    count partials bucket-hashed by token, so each token's global
    counts land in one partition where its delta and the
    per-partition top-k prune compute locally; the driver reduces
    k x n_parts candidate rows."""
    def side_counts(df: pd.DataFrame) -> pd.DataFrame:
        is_a = (df[group_col] == group_value).to_numpy()
        toks_a, toks_b = [], []
        for t, a in zip(df[text_col], is_a):
            (toks_a if a else toks_b).extend(
                re.findall(r"\S+", t or ""))
        return pd.DataFrame({"na": [len(toks_a)],
                             "nb": [len(toks_b)]})

    tot = ds.map_batches(side_counts, batch_format="pandas") \
        .to_pandas()
    A = int(tot["na"].sum()) if len(tot) else 0
    B = int(tot["nb"].sum()) if len(tot) else 0

    def emit(df: pd.DataFrame) -> pd.DataFrame:
        is_a = (df[group_col] == group_value).to_numpy()
        toks_a, toks_b = [], []
        for t, a in zip(df[text_col], is_a):
            (toks_a if a else toks_b).extend(
                re.findall(r"\S+", t or ""))
        ua, ca = np.unique(np.asarray(toks_a, object),
                           return_counts=True) if toks_a else \
            (np.empty(0, object), np.empty(0, np.int64))
        ub, cb = np.unique(np.asarray(toks_b, object),
                           return_counts=True) if toks_b else \
            (np.empty(0, object), np.empty(0, np.int64))
        g = pd.DataFrame({
            "tok": np.concatenate([ua, ub]),
            "a": np.concatenate([ca.astype(np.int64),
                                 np.zeros(len(ub), np.int64)]),
            "b": np.concatenate([np.zeros(len(ua), np.int64),
                                 cb.astype(np.int64)])})
        g = g.groupby("tok", as_index=False).sum()
        key = pd.util.hash_array(g["tok"].to_numpy(object)) \
            .astype(np.uint64)
        g["__part"] = (key % np.uint64(n_parts)).astype(np.int64)
        return g

    def part_top(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("tok", as_index=False)[["a", "b"]].sum()
        a = g["a"].to_numpy(np.int64)
        b = g["b"].to_numpy(np.int64)
        delta = (_qlog_int(a + 1, qscale)
                 - _qlog_int(A - a + 1, qscale)
                 - _qlog_int(b + 1, qscale)
                 + _qlog_int(B - b + 1, qscale))
        g["delta_q"] = delta
        order = np.lexsort((g["tok"].to_numpy(object), -delta))
        return g.iloc[order[:k]]

    cand = ds.map_batches(emit, batch_format="pandas") \
        .groupby("__part").map_groups(part_top,
                                      batch_format="pandas") \
        .to_pandas()
    if not len(cand):
        return pd.DataFrame({"tok": pd.Series([], dtype=object),
                             "a": pd.Series([], dtype=np.int64),
                             "b": pd.Series([], dtype=np.int64),
                             "delta_q": pd.Series([], dtype=np.int64)})
    order = np.lexsort((cand["tok"].to_numpy(object),
                        -cand["delta_q"].to_numpy()))
    out = cand.iloc[order[:k]].reset_index(drop=True)
    return out.astype({"a": np.int64, "b": np.int64,
                       "delta_q": np.int64})
