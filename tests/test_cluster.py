"""Distributed integer-quantized k-means (ops/cluster.py) vs a dense
in-memory Lloyd reference, plus partitioning invariance (the partial
sums reduce must be independent of batch layout)."""

import numpy as np
import pandas as pd
import ray.data as rd

from mapshaper_ray.ops.cluster import kmeans, quantize_batch


def _brute(vecs, k, iters, scale):
    q = np.floor(np.asarray(vecs, np.float64) * scale + 0.5).astype(
        np.int64)
    cents = q[:k].copy()
    for _ in range(iters):
        d = ((q[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        lab = np.argmin(d, axis=1)
        for cid in range(k):
            m = lab == cid
            if m.any():
                s, n = q[m].sum(axis=0), int(m.sum())
                cents[cid] = np.floor_divide(2 * s + n, 2 * n)
    d = ((q[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    return np.argmin(d, axis=1)


def _ds(vecs, n_blocks=1):
    df = pd.DataFrame({
        "vec_id": np.arange(len(vecs), dtype=np.int64),
        "embedding": [np.asarray(v, np.float32) for v in vecs]})
    ds = rd.from_pandas(df)
    return ds.repartition(n_blocks) if n_blocks > 1 else ds


def test_kmeans_vs_brute():
    rng = np.random.default_rng(11)
    # 4 gaussian blobs in 8 dims, plus noise points
    centers = rng.normal(0, 1, (4, 8))
    vecs = np.concatenate([
        centers[i % 4] + rng.normal(0, 0.15, 8).reshape(1, -1)
        for i in range(120)])
    got = kmeans(_ds(vecs), k=4, iters=4, scale=512).to_pandas() \
        .sort_values("vec_id")["cluster"].to_numpy()
    want = _brute(vecs, k=4, iters=4, scale=512)
    np.testing.assert_array_equal(got, want)


def test_kmeans_partition_invariance():
    rng = np.random.default_rng(7)
    vecs = rng.normal(0, 0.3, (90, 16))
    a = kmeans(_ds(vecs, 1), k=5, iters=3).to_pandas() \
        .sort_values("vec_id")["cluster"].to_numpy()
    b = kmeans(_ds(vecs, 17), k=5, iters=3).to_pandas() \
        .sort_values("vec_id")["cluster"].to_numpy()
    np.testing.assert_array_equal(a, b)


def test_kmeans_empty_cluster_keeps_centroid():
    # two far blobs, k=3 seeded from the first 3 points (all in blob
    # A) -> at least one centroid never wins a point and must persist
    vecs = np.concatenate([
        np.full((10, 4), 0.0) + np.arange(10)[:, None] * 1e-4,
        np.full((10, 4), 5.0)])
    out = kmeans(_ds(vecs), k=3, iters=3, scale=1024).to_pandas()
    assert len(out) == 20
    assert out["cluster"].nunique() >= 2


def test_quantize_round_half_up_negative():
    q = quantize_batch([np.array([-0.00048828125, 0.00048828125,
                                  -1.5 / 1024])], 1024)
    # -0.5 rounds half-up to 0; +0.5 to 1; -1.5 to -1
    np.testing.assert_array_equal(q[0], [0, 1, -1])


# --- lm_nll (stages/text.py) ---------------------------------------

from mapshaper_ray.stages.text import lm_nll  # noqa: E402


def _brute_nll(texts):
    import math
    from collections import Counter
    cnt = Counter()
    for t in texts:
        cnt.update(t.split(" "))
    total = sum(cnt.values())
    v = len(cnt)
    qz = math.floor(math.log(total + v) * 10 ** 9)
    ql = {t: math.floor(math.log(c + 1) * 10 ** 9)
          for t, c in cnt.items()}
    out = []
    for t in texts:
        toks = t.split(" ")
        s = sum(ql[x] for x in toks)
        out.append(round((len(toks) * qz - s)
                         / (10 ** 9 * len(toks)), 6))
    return np.array(out)


def test_lm_nll_vs_brute_and_partition_invariance():
    rng = np.random.default_rng(2)
    words = ["the", "cat", "sat", "on", "mat", "dog", "ran", "", "x"]
    texts = [" ".join(rng.choice(words, rng.integers(1, 30)))
             for _ in range(200)]
    df = pd.DataFrame({"doc_id": np.arange(200, dtype=np.int64),
                       "text": texts})
    want = _brute_nll(texts)
    for nb in (1, 23):
        ds = rd.from_pandas(df)
        if nb > 1:
            ds = ds.repartition(nb)
        got = lm_nll(ds).to_pandas().sort_values("doc_id")
        np.testing.assert_array_equal(got["lm_nll"].to_numpy(), want)
    # rare words score higher (less likely) than common words
    common = lm_nll(rd.from_pandas(pd.DataFrame({
        "doc_id": [0, 1], "text": ["the the the the", "zzz qqq www"]
    }))).to_pandas().sort_values("doc_id")["lm_nll"].to_numpy()
    assert common[0] < common[1]


# --- semantic_dedup (ops/cluster.py) --------------------------------

from mapshaper_ray.ops.cluster import semantic_dedup  # noqa: E402


def test_semantic_dedup_vs_brute():
    rng = np.random.default_rng(5)
    base = rng.normal(0, 1, (30, 12))
    # every third vector is a near-copy of the previous one
    vecs = []
    for i in range(90):
        v = base[i % 30] + rng.normal(0, 0.02, 12)
        vecs.append(v)
    vecs = np.asarray(vecs)
    k, iters, scale, t = 4, 3, 512, 0.9

    # brute reference: same integer kmeans then per-cluster pair scan
    q = np.floor(vecs * scale + 0.5).astype(np.int64)
    cents = q[:k].copy()
    for _ in range(iters):
        d = ((q[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        lab = np.argmin(d, axis=1)
        for cid in range(k):
            m = lab == cid
            if m.any():
                s, n = q[m].sum(axis=0), int(m.sum())
                cents[cid] = np.floor_divide(2 * s + n, 2 * n)
    d = ((q[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    lab = np.argmin(d, axis=1)
    norm = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = norm @ norm.T
    keep = []
    for i in range(len(vecs)):
        dup = any(lab[j] == lab[i] and sims[i, j] >= t
                  for j in range(i))
        if not dup:
            keep.append(i)

    for nb in (1, 11):
        ds = _ds(vecs, nb)
        got = semantic_dedup(ds, k=k, iters=iters, scale=scale,
                             threshold=t).to_pandas() \
            .sort_values("vec_id")
        np.testing.assert_array_equal(got["vec_id"].to_numpy(), keep)
        np.testing.assert_array_equal(got["cluster"].to_numpy(),
                                      lab[keep])
    assert len(keep) < 90  # the near-copies actually deduped


# --- redact_pii (stages/text.py) ------------------------------------

from mapshaper_ray.stages.text import redact_pii  # noqa: E402


def test_redact_pii():
    df = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": ["mail a.b-c%d@sub.example.co.uk now",
                 "call 212-555-0187 or 999-000-1111",
                 "clean text with @ loose and 12-34 numbers",
                 "x@y.io 000-000-0000 tail"]})
    out = redact_pii(rd.from_pandas(df)).to_pandas() \
        .sort_values("doc_id")["text"].tolist()
    assert out == [
        "mail <EMAIL> now",
        "call <PHONE> or <PHONE>",
        "clean text with @ loose and 12-34 numbers",
        "<EMAIL> <PHONE> tail"]


# --- sample_per_group / bm25_topk (stages/text.py) -------------------

from mapshaper_ray.stages.text import (bm25_topk,  # noqa: E402
                                       md5_lo64, sample_per_group)


def test_sample_per_group_partition_invariance_and_quota():
    rng = np.random.default_rng(13)
    langs = np.array(["en", "de", "fr"])[rng.integers(0, 3, 300)]
    df = pd.DataFrame({
        "doc_id": np.arange(300, dtype=np.int64),
        "lang": langs,
        "text": ["w%d %d" % (i % 17, i) for i in range(300)]})
    outs = []
    for nb in (1, 19):
        ds = rd.from_pandas(df)
        if nb > 1:
            ds = ds.repartition(nb)
        out = sample_per_group(ds, key="lang", n=20, seed="s0") \
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    got = outs[0]
    assert (got.groupby("lang").size() == 20).all()
    # the survivors are exactly the 20 smallest md5(text+seed) per lang
    h = md5_lo64((df["text"] + "s0").tolist())
    df2 = df.assign(h=h)
    want = df2.sort_values(["h", "doc_id"]).groupby("lang").head(20)
    assert set(got["doc_id"]) == set(want["doc_id"])


def test_bm25_topk_matches_brute():
    import math
    rng = np.random.default_rng(17)
    vocab = ["alpha", "beta", "gamma", "delta", "eps"]
    texts = [" ".join(rng.choice(vocab, rng.integers(1, 40)))
             for _ in range(150)]
    df = pd.DataFrame({"doc_id": np.arange(150, dtype=np.int64),
                       "text": texts})
    terms = ("alpha", "gamma")
    got = bm25_topk(rd.from_pandas(df).repartition(7), terms, k=10)

    toks = [t.split(" ") for t in texts]
    nd = len(toks)
    avgdl = sum(len(x) for x in toks) / nd
    scores = []
    for i, x in enumerate(toks):
        s = 0.0
        for term in terms:
            dfreq = sum(1 for y in toks if term in y)
            idf = math.log(1 + (nd - dfreq + 0.5) / (dfreq + 0.5))
            tf = x.count(term)
            s += idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 *
                                                 (len(x) / avgdl)))
        scores.append((round(s, 6), i))
    want = sorted(scores, key=lambda p: (-p[0], p[1]))[:10]
    assert list(got["doc_id"]) == [i for _, i in want]
    assert list(got["bm25"]) == [s for s, _ in want]


def test_lm_nll_shuffle_path_matches_broadcast():
    rng = np.random.default_rng(21)
    words = ["aa", "bb", "cc", "dd", "ee", "ff", "g"]
    texts = [" ".join(rng.choice(words, rng.integers(1, 25)))
             for _ in range(150)]
    df = pd.DataFrame({"doc_id": np.arange(150, dtype=np.int64),
                       "text": texts})
    a = lm_nll(rd.from_pandas(df)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = lm_nll(rd.from_pandas(df).repartition(13),
               vocab_broadcast=False).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_lm_nll_auto_gate_routes_to_shuffle(monkeypatch):
    # force the counted gate below the vocab size: "auto" must take
    # the shuffle path and still match the broadcast result exactly
    import mapshaper_ray.stages.text as T
    rng = np.random.default_rng(29)
    words = ["aa", "bb", "cc", "dd", "ee", "ff", "g", "hh", "iii"]
    texts = [" ".join(rng.choice(words, rng.integers(1, 20)))
             for _ in range(120)]
    df = pd.DataFrame({"doc_id": np.arange(120, dtype=np.int64),
                       "text": texts})
    want = lm_nll(rd.from_pandas(df),
                  vocab_broadcast=True).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    monkeypatch.setattr(T, "LM_VOCAB_BROADCAST_CAP", 3)
    got = T.lm_nll(rd.from_pandas(df).repartition(7)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(want, got)
    # and the gate broadcasts when the vocab fits
    monkeypatch.setattr(T, "LM_VOCAB_BROADCAST_CAP", 10 ** 6)
    got2 = T.lm_nll(rd.from_pandas(df)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(want, got2)


# --- pack_sequences (stages/text.py) ---------------------------------

from mapshaper_ray.stages.text import pack_sequences  # noqa: E402


def test_pack_sequences_vs_brute_and_partition_invariance():
    rng = np.random.default_rng(23)
    texts = [" ".join("w%d" % j for j in range(rng.integers(1, 70)))
             for _ in range(120)]
    df = pd.DataFrame({"doc_id": np.arange(120, dtype=np.int64),
                       "text": texts})
    L = 64
    # brute: global concat order by doc_id
    off = 0
    want = []
    for i, t in enumerate(texts):
        n = len(t.split(" "))
        for ex in range(off // L, (off + n - 1) // L + 1):
            s = max(off, ex * L)
            e = min(off + n, (ex + 1) * L)
            want.append((ex, i, s - off, e - s))
        off += n
    want = pd.DataFrame(want, columns=["example_id", "doc_id",
                                       "tok_start", "n_toks"])
    for nb in (1, 17):
        ds = rd.from_pandas(df)
        if nb > 1:
            ds = ds.repartition(nb)
        got = pack_sequences(ds, seq_len=L, n_buckets=9).to_pandas() \
            .sort_values(["example_id", "doc_id"]) \
            .reset_index(drop=True).astype("int64")
        pd.testing.assert_frame_equal(got, want.astype("int64"))
    # every example except the last is exactly full
    tot = got.groupby("example_id")["n_toks"].sum()
    assert (tot.iloc[:-1] == L).all()


def test_kmeans_checkpoint_resume_bit_identical(ray_session, tmp_path):
    """Interrupted-then-resumed training must equal an uninterrupted
    run exactly: iterations are pure functions of integer centroids."""
    import ray.data as rd

    from mapshaper_ray.ops.cluster import kmeans, kmeans_centroids

    rng = np.random.RandomState(17)
    df = pd.DataFrame({
        "vec_id": np.arange(120, dtype=np.int64),
        "embedding": list(rng.randn(120, 5).astype(np.float32))})
    ds = rd.from_pandas(df).repartition(4)

    plain = kmeans_centroids(ds, k=4, iters=4)
    ck = str(tmp_path / "km_ck")
    # "interrupted" run: only 2 of 4 iterations complete
    kmeans_centroids(ds, k=4, iters=2, checkpoint_dir=ck)
    # resume to 4 — must skip 2 done iterations and match exactly
    resumed = kmeans_centroids(ds, k=4, iters=4, checkpoint_dir=ck)
    assert (plain == resumed).all()
    # a third call with everything done replays nothing and matches
    again = kmeans_centroids(ds, k=4, iters=4, checkpoint_dir=ck)
    assert (plain == again).all()
    # end-to-end labels through the checkpointed path
    lab_ck = kmeans(ds, k=4, iters=4, checkpoint_dir=ck).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    lab = kmeans(ds, k=4, iters=4).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(lab, lab_ck)
