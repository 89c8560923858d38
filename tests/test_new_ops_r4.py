"""Round-4 session-3 operators: passage-level dedup, URL
normalization + dedup, dataset×dataset nn_join, bigram PMI.

Each op is checked against an independent brute-force implementation
and for partition invariance (block boundaries must not change the
result) — the property-test pattern that caught the asof_join /
triangle dtype-drift bugs.
"""
import numpy as np
import pandas as pd
import pytest

import ray.data as rd


def _passage_brute(pdf: pd.DataFrame, w: int) -> dict:
    seen: dict = {}
    chunks: dict = {}
    for i, t in zip(pdf.doc_id, pdf.text):
        toks = t.split()
        cs = [" ".join(toks[j * w:(j + 1) * w])
              for j in range((len(toks) + w - 1) // w)]
        chunks[int(i)] = cs
        for j, c in enumerate(cs):
            if c not in seen:
                seen[c] = (int(i), j)
    return {i: " ".join(c for j, c in enumerate(cs)
                        if seen[c] == (i, j))
            for i, cs in chunks.items()}


def test_passage_dedup_brute_and_partition_invariance(ray_session):
    from mapshaper_ray.ops.dedup import passage_dedup

    rng = np.random.RandomState(11)
    vocab = "a b c d e f g h".split()
    docs = [" ".join(rng.choice(vocab, size=rng.randint(1, 90)))
            for _ in range(80)]
    boiler = " ".join(rng.choice(vocab, size=40))  # 2 full passages
    for i in range(0, 80, 4):  # shared banner on every 4th doc
        docs[i] = boiler + " " + docs[i]
    docs[7] = docs[3]  # a full-doc duplicate
    pdf = pd.DataFrame({"doc_id": np.arange(80), "text": docs})
    exp = _passage_brute(pdf, 20)

    for parts in (1, 3, 9):
        got = passage_dedup(rd.from_pandas(pdf).repartition(parts),
                            words=20).to_pandas()
        assert got.set_index("doc_id")["text"].to_dict() == exp


def test_passage_dedup_empty_and_short_docs(ray_session):
    from mapshaper_ray.ops.dedup import passage_dedup

    pdf = pd.DataFrame({"doc_id": [0, 1, 2, 3],
                        "text": ["", "one two", "one two", "x"]})
    got = passage_dedup(rd.from_pandas(pdf), words=20) \
        .to_pandas().set_index("doc_id")["text"].to_dict()
    # doc 2's single (short) passage duplicates doc 1's -> stripped
    assert got == {0: "", 1: "one two", 2: "", 3: "x"}


def test_normalize_urls_rules(ray_session):
    from mapshaper_ray.stages.pages import normalize_urls

    urls = [
        "HTTP://WWW.S.Example:80/A/?utm_source=f&id=1#x",
        "https://h.example:443/",
        "http://h.example:8080/keep:80/?",
        "http://h.example/a?utm_x=1&keep=2&utm_y=3#f",
        "HTTPS://H.example#only",
    ]
    exp = [
        "http://www.s.example/A?id=1",
        "https://h.example",
        "http://h.example:8080/keep:80",
        "http://h.example/a?keep=2",
        "https://h.example",
    ]
    got = normalize_urls(
        rd.from_pandas(pd.DataFrame({"url": urls}))).to_pandas()
    assert got["url_norm"].tolist() == exp


def test_nn_join_vs_brute_and_partition_invariance(ray_session):
    from mapshaper_ray.ops.ann import nn_join

    rng = np.random.RandomState(3)
    n, d, k = 120, 8, 3
    V = rng.randn(n, d).astype(np.float32)
    pdf = pd.DataFrame({"vec_id": np.arange(n), "embedding": list(V)})
    q = pdf[pdf.vec_id % 2 == 1]
    c = pdf[pdf.vec_id % 2 == 0]

    def nrm(m):
        nn_ = np.linalg.norm(m, axis=1, keepdims=True)
        return m / np.where(nn_ == 0, 1, nn_)

    sims = nrm(np.stack(c.embedding).astype(np.float64)) \
        @ nrm(np.stack(q.embedding).astype(np.float64)).T
    cid = c.vec_id.to_numpy()
    exp = []
    for j, qid in enumerate(q.vec_id.to_numpy()):
        order = np.lexsort((cid, -sims[:, j]))[:k]
        exp.extend((qid, cid[i], sims[i, j]) for i in order)
    exp = pd.DataFrame(exp, columns=["query_id", "vec_id", "cosine"]) \
        .sort_values(["query_id", "cosine", "vec_id"],
                     ascending=[True, False, True]) \
        .reset_index(drop=True)

    for qp, cp in ((1, 1), (4, 7)):
        got = nn_join(rd.from_pandas(q).repartition(qp),
                      rd.from_pandas(c).repartition(cp), k=k) \
            .to_pandas() \
            .sort_values(["query_id", "cosine", "vec_id"],
                         ascending=[True, False, True]) \
            .reset_index(drop=True)
        assert (got.query_id.to_numpy() == exp.query_id.to_numpy()).all()
        assert (got.vec_id.to_numpy() == exp.vec_id.to_numpy()).all()
        assert np.allclose(got.cosine, exp.cosine, atol=1e-12)


def _pmi_brute(texts, min_count, top_k):
    import math
    u: dict = {}
    b: dict = {}
    n1 = n2 = 0
    for t in texts:
        ws = (t or "").split(" ")
        n1 += len(ws)
        n2 += max(0, len(ws) - 1)
        for w in ws:
            u[w] = u.get(w, 0) + 1
        for a, c in zip(ws, ws[1:]):
            b[(a, c)] = b.get((a, c), 0) + 1
    qs = 10 ** 9

    def q(x):
        return math.floor(math.log(x) * qs)

    rows = [(w1, w2, c, q(c) + 2 * q(n1) - q(n2) - q(u[w1]) - q(u[w2]))
            for (w1, w2), c in b.items() if c >= min_count]
    rows.sort(key=lambda r: (-r[3], r[0], r[1]))
    return pd.DataFrame(rows[:top_k],
                        columns=["w1", "w2", "c", "pmi_q"])


def test_pmi_bigrams_brute_both_paths(ray_session):
    from mapshaper_ray.stages.text import pmi_bigrams

    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    exp = _pmi_brute(docs["text"], 5, 20)
    for cap in (2_000_000, 0):  # broadcast path, then forced join path
        got = pmi_bigrams(rd.from_pandas(docs).repartition(5),
                          top_k=20, min_count=5,
                          vocab_broadcast_cap=cap)
        pd.testing.assert_frame_equal(
            got[["w1", "w2", "c", "pmi_q"]].reset_index(drop=True),
            exp, check_dtype=False)
