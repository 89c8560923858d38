"""Text-analysis stages for training-data pipelines over the documents /
pages tables: language ID (stopword-marker heuristic), quality scoring,
token counting (whitespace + BPE-ish regex), and rolling-hash document
fingerprinting.  All stages are actor-pool ``map_batches`` classes —
regexes/marker tables compiled once per actor — with vectorized pandas
string kernels per batch.
"""

from __future__ import annotations

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


class Fingerprinter:
    """64-bit rolling-hash document fingerprint (winnowing-style min over
    k-token windows) — deterministic near-dup prefilter signal."""

    def __init__(self, text_col: str = "text", k: int = 5):
        self.text_col = text_col
        self.k = k
        self.ws = re.compile(r"\S+")
        self.B = np.uint64(1000003)
        self.powers = self.B ** np.arange(k - 1, -1, -1, dtype=np.uint64)

    def _doc_fp(self, ids: np.ndarray) -> int:
        if len(ids) == 0:
            return 0
        if len(ids) < self.k:
            return int(np.bitwise_xor.reduce(ids))
        win = np.lib.stride_tricks.sliding_window_view(ids, self.k)
        with np.errstate(over="ignore"):
            hashes = (win * self.powers).sum(axis=1, dtype=np.uint64)
        return int(hashes.min())

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        token_lists = [self.ws.findall(t) for t in df[self.text_col]]
        ids_flat = hash_tokens([t for ts in token_lists for t in ts])
        lens = np.array([len(ts) for ts in token_lists])
        offs = np.concatenate([[0], np.cumsum(lens)])
        df["fingerprint"] = [
            np.uint64(self._doc_fp(ids_flat[offs[i]:offs[i + 1]]))
            for i in range(len(token_lists))]
        return df


def hash_tokens(tokens: list[str]) -> np.ndarray:
    """Deterministic vectorized 64-bit token hashes (pandas siphash with
    its fixed default key — stable across processes, unlike Python's
    seeded hash())."""
    if not tokens:
        return np.empty(0, dtype=np.uint64)
    return pd.util.hash_array(np.asarray(tokens, dtype=object)).astype(np.uint64)


def fingerprint(ds, text_col="text", k=5, concurrency=(1, 8)):
    return ds.map_batches(Fingerprinter, batch_format="pandas",
                          batch_size=4096, concurrency=concurrency,
                          fn_constructor_kwargs={"text_col": text_col, "k": k},
                          num_cpus=1)
