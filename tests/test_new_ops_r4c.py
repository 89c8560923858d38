"""Round-4 operator batch #4: naive-Bayes hashed-unigram classifier,
host link graph, k-core decomposition, pivot, funnel analysis,
weighted sampling without replacement.

Covers brute-force equivalence on synthetic corpora plus partition
invariance (block boundaries must not change results).
"""
import math

import numpy as np
import pandas as pd
import pytest

import ray.data as rd


def _ds(df, n_blocks=1):
    return rd.from_pandas(df.copy()).repartition(n_blocks)


# ---------------------------------------------------------------------------
# nb_classifier
# ---------------------------------------------------------------------------

def _nb_bruteforce(train, score, n_buckets=1024, q=10 ** 9):
    """Scalar multinomial NB with quantized libm logs, md5 buckets."""
    from mapshaper_ray.stages.text import md5_lo64

    def buckets(t):
        toks = (t or "").split(" ")
        return (md5_lo64(toks) % np.uint64(n_buckets)).astype(np.int64)

    labels = sorted(train["lang"].unique())
    nd = {l: int((train["lang"] == l).sum()) for l in labels}
    nd_total = sum(nd.values())
    counts = {l: np.zeros(n_buckets, np.int64) for l in labels}
    for _, r in train.iterrows():
        np.add.at(counts[r["lang"]], buckets(r["text"]), 1)
    rows = []
    for _, r in score.iterrows():
        b = buckets(r["text"])
        best, bscore = None, None
        for l in labels:
            qz = math.floor(math.log(int(counts[l].sum()) + n_buckets) * q)
            prior = (math.floor(math.log(nd[l]) * q)
                     - math.floor(math.log(nd_total) * q))
            s = prior - len(b) * qz
            for bi in b:
                c = int(counts[l][bi])
                if c:
                    s += math.floor(math.log(c + 1) * q)
            if bscore is None or s > bscore:
                best, bscore = l, s
        rows.append((r["doc_id"], best, bscore))
    return pd.DataFrame(rows, columns=["doc_id", "pred", "score_q"])


@pytest.mark.parametrize("n_blocks", [1, 7])
def test_nb_classifier_bruteforce(ray_session, n_blocks):
    from mapshaper_ray.stages.text import nb_classifier
    rng = np.random.default_rng(7)
    vocab = {"en": ["the", "cat", "sat", "dog", "ran"],
             "fr": ["le", "chat", "est", "chien", "vite"],
             "de": ["der", "katze", "hund", "ist", "schnell"]}
    rows = []
    for i in range(90):
        lang = ["en", "fr", "de"][i % 3]
        words = rng.choice(vocab[lang], size=rng.integers(3, 12))
        rows.append((i, " ".join(words), lang))
    df = pd.DataFrame(rows, columns=["doc_id", "text", "lang"])
    train, score = df[df.doc_id % 2 == 0], df[df.doc_id % 2 == 1]
    out = nb_classifier(_ds(train, n_blocks), _ds(score, n_blocks)) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    exp = _nb_bruteforce(train, score).sort_values("doc_id") \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(out, exp, check_dtype=False)
    # sanity: the classifier actually classifies (mostly right)
    acc = (out["pred"].to_numpy()
           == score.sort_values("doc_id")["lang"].to_numpy()).mean()
    assert acc > 0.9


def test_nb_classifier_empty_text_and_single_class(ray_session):
    from mapshaper_ray.stages.text import nb_classifier
    train = pd.DataFrame({"doc_id": [0, 2], "text": ["a b", ""],
                          "lang": ["en", "en"]})
    score = pd.DataFrame({"doc_id": [1, 3], "text": ["", "a"],
                          "lang": ["en", "en"]})
    out = nb_classifier(_ds(train), _ds(score)).to_pandas()
    assert (out["pred"] == "en").all() and len(out) == 2
