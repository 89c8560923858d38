"""Round-4 operator batch #3: quality-rule filters (Gopher / C4),
tf-idf, inverted index, count-min sketch, stratified split, and the
halo-exchange sliding window.

Covers: brute-force equivalence on synthetic corpora, partition
invariance (block boundaries must not change results — the bug class
that bit asof_join/triangles twice), the tf-idf shuffle path at a
forced zero broadcast cap, CMS overestimate + linearity guarantees,
and exact stratified quotas.
"""
import numpy as np
import pandas as pd
import pytest

import ray.data as rd


def _docs_ds(texts, n_blocks=1):
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                       "text": texts})
    return rd.from_pandas(df).repartition(n_blocks)


# ---------------------------------------------------------------------------
# gopher_quality
# ---------------------------------------------------------------------------

def test_gopher_quality_metrics(ray_session):
    from mapshaper_ray.stages.text import gopher_quality
    texts = [
        "the cat sat on the mat with a hat",   # 9 words, all alpha
        "# # # ... xx",                        # symbol-heavy
        " ".join(["word"] * 60) + " the of",   # long, 2 stops
    ]
    out = gopher_quality(_docs_ds(texts), min_words=5).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out["n_words"].tolist() == [9, 5, 62]
    # doc 0: 25 non-space chars / 9 words
    assert out["mwl"][0] == round(25 / 9, 6)
    # doc 1: words '#','#','#','...','xx' -> 1 alpha, 4 sym
    assert out["alpha_frac"][1] == round(1 / 5, 6)
    assert out["sym_frac"][1] == round(4 / 5, 6)
    # doc 2 has 'the' and 'of' -> 2 stops, keeps
    assert out["n_stop"][2] == 2
    assert out["keep"][2] == 1
    assert out["keep"][1] == 0  # fails alpha + symbol rules


def test_gopher_partition_invariance(ray_session):
    from mapshaper_ray.stages.text import gopher_quality
    rng = np.random.RandomState(7)
    texts = [" ".join(rng.choice(["the", "of", "x", "#", "12", "abc"],
                                 rng.randint(3, 40)))
             for _ in range(50)]
    a = gopher_quality(_docs_ds(texts, 1)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = gopher_quality(_docs_ds(texts, 7)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


# ---------------------------------------------------------------------------
# c4_filter
# ---------------------------------------------------------------------------

def test_c4_filter_rules(ray_session):
    from mapshaper_ray.stages.text import c4_filter
    texts = [
        "one two three four five six.\nshort line.\n"
        "uses a cookie banner here.\n"
        "a second good line stays here!\n"
        "third good line is also kept?",
        "only one good line survives here.",   # < min_lines
        "no terminal punctuation at all here", # line dropped
    ]
    out = c4_filter(_docs_ds(texts), min_line_words=5,
                    min_lines=2).to_pandas()
    assert out["doc_id"].tolist() == [0]
    assert out["text"][0] == (
        "one two three four five six.\n"
        "a second good line stays here!\n"
        "third good line is also kept?")


def test_c4_filter_partition_invariance(ray_session):
    from mapshaper_ray.stages.text import c4_filter
    rng = np.random.RandomState(3)
    texts = ["\n".join(
        " ".join(rng.choice(["aa", "bb", "cc", "dd", "ee", "ff"],
                            rng.randint(2, 9)))
        + ("." if rng.rand() < 0.6 else "")
        for _ in range(rng.randint(1, 8))) for _ in range(40)]
    a = c4_filter(_docs_ds(texts, 1)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = c4_filter(_docs_ds(texts, 9)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


# ---------------------------------------------------------------------------
# tfidf_topk — broadcast path vs forced shuffle path
# ---------------------------------------------------------------------------

def test_tfidf_matches_bruteforce_and_shuffle_path(ray_session):
    import math

    from mapshaper_ray.stages.text import tfidf_topk
    rng = np.random.RandomState(11)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]
    texts = [" ".join(rng.choice(vocab, rng.randint(3, 20)))
             for _ in range(30)]

    def norm(df):
        return df.sort_values(["doc_id", "score_q", "token"],
                              ascending=[True, False, True]) \
            .reset_index(drop=True)[["doc_id", "token", "tf",
                                     "score_q"]]

    got = norm(tfidf_topk(_docs_ds(texts, 4), k=3).to_pandas())
    # brute force
    q = 1000000000
    n = len(texts)
    dfc = {}
    for t in texts:
        for w in set(t.split()):
            dfc[w] = dfc.get(w, 0) + 1
    rows = []
    for i, t in enumerate(texts):
        ws = pd.Series(t.split()).value_counts()
        cand = sorted(
            ((w, int(c), int(c) * (math.floor(math.log(n) * q)
                                   - math.floor(math.log(dfc[w]) * q)))
             for w, c in ws.items()),
            key=lambda r: (-r[2], r[0]))[:3]
        rows += [(i, w, c, s) for w, c, s in cand]
    exp = pd.DataFrame(rows, columns=["doc_id", "token", "tf",
                                      "score_q"])
    pd.testing.assert_frame_equal(
        got, norm(exp), check_dtype=False)
    # shuffle path (vocab broadcast forcibly disabled) must agree
    got2 = norm(tfidf_topk(_docs_ds(texts, 4), k=3,
                           df_broadcast_cap=0).to_pandas())
    pd.testing.assert_frame_equal(got, got2, check_dtype=False)


# ---------------------------------------------------------------------------
# inverted_index
# ---------------------------------------------------------------------------

def test_inverted_index_bruteforce(ray_session):
    from mapshaper_ray.stages.text import inverted_index
    texts = ["a b c", "b c d", "c d e", "a a c"]
    out = inverted_index(_docs_ds(texts, 3), min_df=2,
                         max_postings=2).to_pandas() \
        .sort_values("token").reset_index(drop=True)
    exp = pd.DataFrame({
        "token": ["a", "b", "c", "d"],
        "df": [2, 2, 4, 2],
        "postings": ["0,3", "0,1", "0,1", "1,2"]})
    pd.testing.assert_frame_equal(out, exp, check_dtype=False)


# ---------------------------------------------------------------------------
# count-min sketch
# ---------------------------------------------------------------------------

def test_cms_overestimates_and_merges(ray_session):
    from mapshaper_ray.ops.sketch import cms_build, cms_query, \
        cms_update
    rng = np.random.RandomState(5)
    vals = rng.choice([f"t{i}" for i in range(200)], 5000,
                      p=np.linspace(1, 40, 200)
                      / np.linspace(1, 40, 200).sum())
    ds = rd.from_pandas(pd.DataFrame({"v": vals})).repartition(6)
    cms = cms_build(ds, "v", d=4, w=256)
    assert int(cms.sum()) == 4 * 5000  # every occurrence counted d times
    truth = pd.Series(vals).value_counts()
    qs = truth.index[:20].tolist()
    est = cms_query(cms, qs)
    assert (est >= truth[qs].to_numpy()).all()  # CMS never undercounts
    # partition invariance
    cms_b = cms_build(rd.from_pandas(pd.DataFrame({"v": vals}))
                      .repartition(1), "v", d=4, w=256)
    assert (cms == cms_b).all()
    # linearity: sketch(union) == sketch(a) + sketch(b)
    half = len(vals) // 2
    a = rd.from_pandas(pd.DataFrame({"v": vals[:half]}))
    b = rd.from_pandas(pd.DataFrame({"v": vals[half:]}))
    merged = cms_update(cms_build(a, "v", d=4, w=256), b, "v")
    assert (merged == cms).all()


# ---------------------------------------------------------------------------
# stratified_split
# ---------------------------------------------------------------------------

def test_stratified_split_quotas_and_invariance(ray_session):
    from mapshaper_ray.stages.text import stratified_split
    rng = np.random.RandomState(2)
    n = 230
    df = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "lang": rng.choice(["en", "de", "fr"], n, p=[0.7, 0.2, 0.1])})
    ds = rd.from_pandas(df).repartition(5)
    out = stratified_split(ds, key="lang",
                           fractions=(0.8, 0.1, 0.1)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert len(out) == n
    for lang, g in out.groupby("lang"):
        m = len(g)
        assert (g["split"] == "train").sum() == int(np.floor(0.8 * m))
        assert (g["split"] == "valid").sum() == \
            int(np.floor(0.9 * m)) - int(np.floor(0.8 * m))
    out2 = stratified_split(rd.from_pandas(df).repartition(1),
                            key="lang",
                            fractions=(0.8, 0.1, 0.1)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, out2)


# ---------------------------------------------------------------------------
# sliding_window_sum — halo exchange
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("window,n_parts", [(1, 4), (5, 4), (10, 13),
                                            (50, 3)])
def test_sliding_window_matches_pandas(ray_session, window, n_parts):
    from mapshaper_ray.ops.relational import sliding_window_sum
    rng = np.random.RandomState(window * 100 + n_parts)
    n = 400
    df = pd.DataFrame({
        # heavy ts ties to exercise the (ts, id) tie order
        "ep": rng.randint(0, 60, n).astype(np.int64),
        "event_id": rng.permutation(n).astype(np.int64),
        "v": rng.randint(-50, 50, n).astype(np.int64)})
    got = sliding_window_sum(rd.from_pandas(df).repartition(6),
                             ts_col="ep", id_col="event_id",
                             val_col="v", window=window,
                             n_parts=n_parts).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    exp = df.sort_values(["ep", "event_id"]).reset_index(drop=True)
    exp["msum"] = exp["v"].rolling(window, min_periods=1).sum() \
        .astype(np.int64)
    exp = exp[["event_id", "msum"]].sort_values("event_id") \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)


def test_sliding_window_constant_ts_single_bucket(ray_session):
    """All rows share one ts -> one bucket; order falls to id."""
    from mapshaper_ray.ops.relational import sliding_window_sum
    df = pd.DataFrame({"ep": np.zeros(20, np.int64),
                       "event_id": np.arange(20, dtype=np.int64),
                       "v": np.ones(20, np.int64)})
    got = sliding_window_sum(rd.from_pandas(df).repartition(3),
                             ts_col="ep", id_col="event_id",
                             val_col="v", window=4).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    assert got["msum"].tolist() == [1, 2, 3] + [4] * 17


def test_sliding_window_diurnal_skew_equi_depth(ray_session):
    """95% of events inside a narrow nightly spike plus a long sparse
    tail: uniform min/max edges would put nearly everything in one
    bucket; equi-depth edges keep the buckets balanced and the result
    exact."""
    from mapshaper_ray.ops.relational import sliding_window_sum
    rng = np.random.RandomState(7)
    n_spike, n_tail = 950, 50
    ep = np.concatenate([
        rng.randint(0, 100, n_spike),            # the spike
        rng.randint(100, 1_000_000, n_tail)])    # the sparse tail
    n = n_spike + n_tail
    df = pd.DataFrame({"ep": ep.astype(np.int64),
                       "event_id": rng.permutation(n).astype(np.int64),
                       "v": rng.randint(-9, 9, n).astype(np.int64)})
    got = sliding_window_sum(rd.from_pandas(df).repartition(6),
                             ts_col="ep", id_col="event_id",
                             val_col="v", window=7,
                             n_parts=8).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    exp = df.sort_values(["ep", "event_id"]).reset_index(drop=True)
    exp["msum"] = exp["v"].rolling(7, min_periods=1).sum() \
        .astype(np.int64)
    exp = exp[["event_id", "msum"]].sort_values("event_id") \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)


# ---------------------------------------------------------------------------
# clean_text / bigram_nll / scalar_quantize
# ---------------------------------------------------------------------------

def test_clean_text_rules(ray_session):
    from mapshaper_ray.stages.text import clean_text
    texts = ["&lt;b&gt;hi&nbsp;there&lt;/b&gt;  &amp;  you ",
             "  a&#39;b &quot;c&quot;\t\nd  ",
             "&amp;amp; stays one level"]
    out = clean_text(_docs_ds(texts)).to_pandas() \
        .sort_values("doc_id")["text"].tolist()
    assert out == ['<b>hi there</b> & you',
                   'a\'b "c" d',
                   '&amp; stays one level']


def test_bigram_nll_bruteforce(ray_session):
    import math

    from mapshaper_ray.stages.text import bigram_nll
    train = ["a b a b c", "b c a", "c c b a"]
    score = ["a b c z", "z z", "a"]
    tr = _docs_ds(train, 2)
    sc = _docs_ds(score, 2)
    got = bigram_nll(tr, sc).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)

    # scalar reference
    uni, big = {}, {}
    for t in train:
        ws = t.split(" ")
        for w in ws:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(ws, ws[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
    n1 = sum(uni.values())
    v = len(uni)
    q = lambda x: math.floor(math.log(x) * 10 ** 9)  # noqa: E731
    qb = q(0.4)
    exp_rows = []
    for i, t in enumerate(score):
        ws = t.split(" ")
        s = 0
        for a, b in zip(ws, ws[1:]):
            if (a, b) in big:
                s += q(big[(a, b)]) - q(uni[a])
            else:
                s += qb + (q(uni[b] + 1) if b in uni else 0) \
                    - q(n1 + v)
        exp_rows.append((i, max(len(ws) - 1, 0), -s))
    exp = pd.DataFrame(exp_rows,
                       columns=["doc_id", "n_bigrams", "nll_q"])
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # seen bigrams score better (lower nll per position) than the
    # all-unseen doc
    nll0 = got["nll_q"][0] / got["n_bigrams"][0]
    nll1 = got["nll_q"][1] / got["n_bigrams"][1]
    assert nll0 < nll1


def test_scalar_quantize_roundtrip(ray_session):
    from mapshaper_ray.ops.ann import scalar_quantize
    rng = np.random.RandomState(9)
    vecs = rng.randn(40, 6).astype(np.float32)
    vecs[:, 3] = 1.25  # constant dim -> code 0
    df = pd.DataFrame({"vec_id": np.arange(40, dtype=np.int64),
                       "embedding": list(vecs)})
    out = scalar_quantize(rd.from_pandas(df).repartition(4)) \
        .to_pandas().sort_values(["vec_id", "k"]) \
        .reset_index(drop=True)
    assert len(out) == 240
    assert out["qv"].between(0, 255).all()
    q = out["qv"].to_numpy().reshape(40, 6)
    assert (q[:, 3] == 0).all()
    # max/min of each non-constant dim hit the code range ends
    v64 = vecs.astype(np.float64)
    for k in [0, 1, 2, 4, 5]:
        assert q[np.argmax(v64[:, k]), k] == 255
        assert q[np.argmin(v64[:, k]), k] == 0
    # dequantized values approximate the originals within one step
    mn, mx = v64.min(axis=0), v64.max(axis=0)
    step = (mx - mn) / 255
    deq = mn[None, :] + (q + 0.5) * step[None, :]
    err = np.abs(deq - v64)[:, [0, 1, 2, 4, 5]]
    assert (err <= step[[0, 1, 2, 4, 5]]).all()


# ---------------------------------------------------------------------------
# chained hash_join regression (q115): the union padding degraded the
# join output's int keys to float, and a chained join hashing float
# keys on one side / int on the other scattered equal keys across
# buckets — 341 matches silently became 10
# ---------------------------------------------------------------------------

def test_hash_join_chained_keeps_dtype_and_matches(ray_session):
    from mapshaper_ray.ops.relational import hash_join
    a = rd.from_pandas(pd.DataFrame(
        {"k": np.arange(50, dtype=np.int64),
         "x": np.arange(50, dtype=np.int64)})).repartition(4)
    b = rd.from_pandas(pd.DataFrame(
        {"k": np.arange(0, 50, 2, dtype=np.int64),
         "y": np.arange(25, dtype=np.int64)})).repartition(3)
    c = rd.from_pandas(pd.DataFrame(
        {"k": np.repeat(np.arange(50, dtype=np.int64), 3),
         "z": np.arange(150, dtype=np.int64)})).repartition(5)
    j1 = hash_join(a, b, on="k", how="inner")
    j2 = hash_join(c, j1, on="k", how="inner").to_pandas()
    assert len(j2) == 25 * 3  # every even key, 3 c-rows each
    assert j2["k"].dtype == np.int64
    assert j2["x"].dtype == np.int64 and j2["y"].dtype == np.int64


def test_rollup_agg_matches_manual_levels(ray_session):
    from mapshaper_ray.ops.relational import rollup_agg
    rng = np.random.RandomState(4)
    df = pd.DataFrame({
        "s": rng.choice(["a", "b"], 200),
        "g": rng.choice(["x", "y", "z"], 200),
        "v": rng.randint(0, 100, 200).astype(np.int64),
        "id": np.arange(200, dtype=np.int64)})
    got = rollup_agg(rd.from_pandas(df).repartition(5), ["s", "g"],
                     {"n": ("id", "count"), "sv": ("v", "sum")})
    fine = df.groupby(["s", "g"]).agg(
        n=("id", "count"), sv=("v", "sum")).reset_index()
    mid = df.groupby(["s"]).agg(
        n=("id", "count"), sv=("v", "sum")).reset_index()
    mid["g"] = "(all)"
    top = pd.DataFrame({"s": ["(all)"], "g": ["(all)"],
                        "n": [len(df)], "sv": [df["v"].sum()]})
    exp = pd.concat([fine, mid, top], ignore_index=True) \
        .sort_values(["s", "g"], kind="mergesort") \
        .reset_index(drop=True)[["s", "g", "n", "sv"]]
    got = got.sort_values(["s", "g"], kind="mergesort") \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
