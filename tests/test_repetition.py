"""Gopher-style repetition signals (stages/text.py:repetition_signals).

Checked against an independent per-row brute force (collections.Counter)
on hand-built docs covering the degenerate definitions (empty doc, one
word, all-identical words) and on a random corpus; also checks batch
independence (the vectorized whole-batch groupby must not leak counts
across documents).
"""

from collections import Counter

import numpy as np
import pandas as pd
import ray.data as rd

from mapshaper_ray.stages.text import repetition_signals


def _brute(doc_id: int, text: str) -> dict:
    # split semantics: ''/null is one (empty) token, matching the SQL
    # oracle's string_split(coalesce(text,''), ' ')
    w = (text or "").split(" ")  # always >= 1 (possibly empty) token
    out = {"doc_id": doc_id, "n_words": len(w)}
    out["distinct_word_ratio"] = len(set(w)) / len(w)
    bigs = Counter(" ".join(p) for p in zip(w, w[1:]))
    tot = sum(bigs.values())
    out["top_bigram_share"] = max(bigs.values()) / tot if tot else 0.0
    out["dup_bigram_share"] = (
        sum(n for n in bigs.values() if n > 1) / tot if tot else 0.0)
    return out


def _run(texts, **kw):
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                       "text": texts})
    got = repetition_signals(rd.from_pandas(df), **kw).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    want = pd.DataFrame([_brute(i, t) for i, t in enumerate(texts)])
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    return got


def test_degenerate_docs():
    _run(["", "solo", "a a a a", "a b a b", "x y z", "a a b b a a"])


def test_random_corpus_and_batch_independence():
    rng = np.random.default_rng(7)
    vocab = np.array(["w%d" % i for i in range(12)])
    texts = [" ".join(rng.choice(vocab, size=rng.integers(0, 40)))
             for _ in range(100)]
    texts = ["" if t == "" else t for t in texts]
    big = _run(texts)
    small = _run(texts, batch_size=7)
    pd.testing.assert_frame_equal(big, small)


def test_add_url_host_edge_cases():
    import pyarrow as pa
    from mapshaper_ray.stages.pages import add_url_host
    urls = ["https://site7.example/p/7",
            "http://a.b.c:8080/x?q=1",
            "ftp://host.example",
            "https://h/#frag"]
    ds = rd.from_arrow(pa.table({"url": urls}))
    out = add_url_host(ds).to_pandas()
    assert list(out["host"]) == ["site7.example", "a.b.c:8080",
                                 "host.example", "h"]
