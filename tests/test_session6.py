"""Session-6 operator band: DDSketch quantiles, BFS hop distances,
URL blocklist filter, time resampling, skip-gram co-occurrence.
Each op gets a brute-force check plus partition-invariance and (for
the count-gated ones) forced-path equivalence."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from mapshaper_ray.ops.graph import bfs_distances
from mapshaper_ray.ops.relational import resample_time
from mapshaper_ray.ops.sketch import (_dd_buckets, ddsketch_build,
                                      ddsketch_quantiles)
from mapshaper_ray.stages.pages import filter_blocked_hosts
from mapshaper_ray.stages.text import skipgram_counts


def _layouts(df, seed=7):
    rng = np.random.default_rng(seed)
    yield rd.from_pandas(df)
    yield rd.from_pandas(df).repartition(13)
    perm = rng.permutation(len(df))
    yield rd.from_pandas(df.iloc[perm].reset_index(drop=True)) \
        .repartition(29)


# ---------------------------------------------------------------- ddsketch

def test_ddsketch_buckets_brute():
    x = np.array([1.0, 2.0, 0.5, -4.0, 0.0, 3.7, 1e-6, 1e6])
    sign, bucket = _dd_buckets(x, 8)
    import math
    for xi, si, bi in zip(x, sign, bucket):
        if xi == 0:
            assert si == 0 and bi == 0
        else:
            assert si == (1 if xi > 0 else -1)
            assert bi == math.ceil(8 * math.log2(abs(xi)))


def test_ddsketch_quantiles_empty_sketch():
    # zero-row input: typed empty frame, not a negative-rank IndexError
    from mapshaper_ray.ops.sketch import (ddsketch_build,
                                          ddsketch_quantiles)
    empty = rd.from_pandas(pd.DataFrame({"v": pd.Series(
        [], dtype=np.float64)}))
    sk = ddsketch_build(empty, "v")
    out = ddsketch_quantiles(sk, [(1, 2), (99, 100)])
    assert len(out) == 0
    assert list(out.columns) == ["q", "sign", "bucket", "n_le"]
    assert out["n_le"].dtype == np.int64


def test_ddsketch_relative_error_and_partition_invariance():
    rng = np.random.default_rng(3)
    x = np.concatenate([rng.lognormal(0, 2, 4000),
                        -rng.lognormal(1, 1, 300), np.zeros(11)])
    df = pd.DataFrame({"v": x})
    gamma = 2 ** (1 / 8)
    outs = []
    for ds in _layouts(df):
        sk = ddsketch_build(ds, "v")
        assert int(sk["n"].sum()) == len(x)
        q = ddsketch_quantiles(sk, [(1, 2), (9, 10), (99, 100)])
        outs.append(q)
        # relative-error bound vs the true quantile
        xs = np.sort(x)
        n = len(x)
        for _, row in q.iterrows():
            num, den = map(int, row["q"].split("/"))
            true = xs[((n - 1) * num) // den]
            est = row["sign"] * 2 * gamma ** row["bucket"] / (gamma + 1)
            if true != 0:
                assert abs(est - true) / abs(true) < (gamma - 1)
    for o in outs[1:]:
        pd.testing.assert_frame_equal(outs[0], o)


def test_ddsketch_merge_is_addition():
    rng = np.random.default_rng(5)
    a = pd.DataFrame({"v": rng.lognormal(0, 1, 1000)})
    b = pd.DataFrame({"v": rng.lognormal(2, 1, 800)})
    whole = ddsketch_build(rd.from_pandas(pd.concat([a, b])), "v")
    pa_, pb = ddsketch_build(rd.from_pandas(a), "v"), \
        ddsketch_build(rd.from_pandas(b), "v")
    merged = pd.concat([pa_, pb]).groupby(
        ["sign", "bucket"], as_index=False)["n"].sum()
    o = np.lexsort((merged["sign"].to_numpy() * merged["bucket"].to_numpy(),
                    merged["sign"].to_numpy()))
    merged = merged.iloc[o].reset_index(drop=True)
    pd.testing.assert_frame_equal(whole, merged)


# ---------------------------------------------------------------- bfs

def _brute_bfs(edges: pd.DataFrame, seeds, max_hops):
    adj = {}
    for a, b in zip(edges["src"], edges["dst"]):
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    dist = {s: 0 for s in seeds}
    frontier = list(seeds)
    for h in range(1, max_hops + 1):
        nxt = []
        for u in frontier:
            for v in adj.get(u, ()):
                if v not in dist:
                    dist[v] = h
                    nxt.append(v)
        frontier = nxt
    return pd.DataFrame(sorted(dist.items()),
                        columns=["node", "dist"]).astype(np.int64)


def test_bfs_brute_and_forced_bucketed_path():
    rng = np.random.default_rng(11)
    e = pd.DataFrame({"src": rng.integers(0, 200, 600),
                      "dst": rng.integers(0, 200, 600)})
    want = _brute_bfs(e, [0, 5], 3)
    for cap in (None, 0):  # broadcast path, then forced bucketed
        got = bfs_distances(rd.from_pandas(e), [0, 5], max_hops=3,
                            broadcast_cap=cap).to_pandas() \
            .sort_values("node").reset_index(drop=True) \
            .astype({"node": np.int64, "dist": np.int64})
        pd.testing.assert_frame_equal(got, want)


def test_bfs_partition_invariance():
    rng = np.random.default_rng(13)
    e = pd.DataFrame({"src": rng.integers(0, 500, 2000),
                      "dst": rng.integers(0, 500, 2000)})
    outs = [bfs_distances(ds, [1], max_hops=2).to_pandas()
            .sort_values("node").reset_index(drop=True)
            for ds in _layouts(e)]
    for o in outs[1:]:
        pd.testing.assert_frame_equal(outs[0], o)


def test_bfs_disconnected_and_hop_budget():
    e = pd.DataFrame({"src": [0, 1, 2, 10], "dst": [1, 2, 3, 11]})
    got = bfs_distances(rd.from_pandas(e), [0], max_hops=2) \
        .to_pandas().sort_values("node").reset_index(drop=True)
    assert got["node"].tolist() == [0, 1, 2]
    assert got["dist"].tolist() == [0, 1, 2]


# ---------------------------------------------------------------- blocklist

def test_blocklist_suffix_semantics():
    df = pd.DataFrame({"i": range(7), "url": [
        "http://site1.example/a",          # exact hit
        "http://ads.site1.example/b",      # subdomain hit
        "http://mysite1.example/c",        # NOT a hit (label boundary)
        "http://site1.example.org/d",      # NOT a hit (suffix only)
        "https://SITE1.EXAMPLE:443/e",     # case + port hit
        "http://x.y.z.site1.example/f",    # deep subdomain hit
        "http://other.example/g"]})
    out = filter_blocked_hosts(rd.from_pandas(df), ["site1.example"]) \
        .to_pandas()
    assert sorted(out["i"].tolist()) == [2, 3, 6]
    blk = filter_blocked_hosts(rd.from_pandas(df), ["site1.example"],
                               keep_blocked=True).to_pandas()
    assert sorted(blk["i"].tolist()) == [0, 1, 4, 5]


def test_blocklist_partition_invariance_and_empty():
    rng = np.random.default_rng(17)
    hosts = [f"s{i % 23}.d{i % 7}.example" for i in range(400)]
    df = pd.DataFrame({"i": range(400),
                       "url": [f"http://{h}/p" for h in hosts]})
    blocked = ["d3.example", "s5.d1.example"]
    outs = [filter_blocked_hosts(ds, blocked).to_pandas()
            .sort_values("i").reset_index(drop=True)
            for ds in _layouts(df, 17)]
    for o in outs[1:]:
        pd.testing.assert_frame_equal(outs[0], o)
    # no blocklist: everything survives
    out = filter_blocked_hosts(rd.from_pandas(df), []).to_pandas()
    assert len(out) == len(df)


# ---------------------------------------------------------------- resample

def test_resample_brute_and_gap_fill():
    ts = pd.to_datetime(["2024-01-01 00:30", "2024-01-01 07:00",
                         "2024-01-03 12:00", "2024-01-02 01:00",
                         "2024-01-05 23:59"]).astype("datetime64[us]")
    df = pd.DataFrame({"k": ["a", "a", "a", "b", "b"], "ts": ts,
                       "v": [1.25, 2.0, -0.5, 3.0, 4.444]})
    out = resample_time(rd.from_pandas(df), "ts", "k", "v",
                        every_s=86400)
    # grid: 2 keys x 5 days
    assert len(out) == 10
    a0 = out[(out["k"] == "a")
             & (out["bucket_ts"] == pd.Timestamp("2024-01-01"))]
    assert int(a0["n"].iloc[0]) == 2
    assert int(a0["sum_q"].iloc[0]) == int(np.floor(1.25 * 100)
                                           + np.floor(2.0 * 100))
    gaps = out[(out["k"] == "b")
               & (out["bucket_ts"] == pd.Timestamp("2024-01-03"))]
    assert int(gaps["n"].iloc[0]) == 0 and int(gaps["sum_q"].iloc[0]) == 0
    # negative value floors toward -inf on both sides of the contract
    a2 = out[(out["k"] == "a")
             & (out["bucket_ts"] == pd.Timestamp("2024-01-03"))]
    assert int(a2["sum_q"].iloc[0]) == -50


def test_resample_partition_invariance():
    rng = np.random.default_rng(23)
    n = 3000
    df = pd.DataFrame({
        "k": rng.choice(["x", "y", "z"], n),
        "ts": pd.Timestamp("2024-03-01").value // 1000
        + rng.integers(0, 40 * 86400 * 10 ** 6, n),
        "v": rng.normal(10, 5, n)})
    df["ts"] = df["ts"].astype("datetime64[us]")
    outs = [resample_time(ds, "ts", "k", "v", every_s=7 * 86400)
            for ds in _layouts(df, 23)]
    for o in outs[1:]:
        pd.testing.assert_frame_equal(outs[0], o)


# ---------------------------------------------------------------- skipgram

def _brute_skipgram(texts, window, min_count):
    from collections import Counter
    c = Counter()
    for t in texts:
        ws = (t or "").split()
        for i in range(len(ws)):
            for d in range(1, window + 1):
                if i + d < len(ws):
                    a, b = ws[i], ws[i + d]
                    c[(min(a, b), max(a, b))] += 1
    rows = [(k[0], k[1], v) for k, v in c.items() if v >= min_count]
    out = pd.DataFrame(rows, columns=["w1", "w2", "n"])
    order = np.lexsort((out["w2"].to_numpy(object),
                        out["w1"].to_numpy(object),
                        -out["n"].to_numpy()))
    return out.iloc[order].reset_index(drop=True).astype({"n": np.int64})


def test_skipgram_brute_and_partition_invariance():
    rng = np.random.default_rng(29)
    vocab = [f"w{i}" for i in range(30)]
    texts = [" ".join(rng.choice(vocab, rng.integers(0, 40)))
             for _ in range(200)]
    df = pd.DataFrame({"text": texts})
    want = _brute_skipgram(texts, 2, 2)
    outs = [skipgram_counts(ds, window=2, min_count=2)
            for ds in _layouts(df, 29)]
    for o in outs:
        pd.testing.assert_frame_equal(o, want)


def test_skipgram_window_one_equals_bigrams():
    texts = ["a b a b c", "b a"]
    out = skipgram_counts(rd.from_pandas(pd.DataFrame({"text": texts})),
                          window=1, min_count=1)
    # adjacent unordered pairs: (a,b)x4, (b,c)x1
    assert out[(out.w1 == "a") & (out.w2 == "b")]["n"].iloc[0] == 4
    assert out[(out.w1 == "b") & (out.w2 == "c")]["n"].iloc[0] == 1
    assert len(out) == 2


# ------------------------------------------------------- grouped ddsketch

def test_group_ddsketch_matches_per_group_global():
    from mapshaper_ray.ops.sketch import (ddsketch_by_group,
                                          ddsketch_group_quantiles)
    rng = np.random.default_rng(31)
    df = pd.DataFrame({"k": rng.choice(["a", "b", "c"], 3000),
                       "v": rng.lognormal(1, 1.5, 3000)})
    sk = ddsketch_by_group(rd.from_pandas(df).repartition(11), "k", "v")
    qs = [(1, 2), (9, 10)]
    got = ddsketch_group_quantiles(sk, qs)
    for k in ["a", "b", "c"]:
        sub = df[df["k"] == k]
        ref = ddsketch_quantiles(
            ddsketch_build(rd.from_pandas(sub[["v"]]), "v"), qs)
        g = got[got["k"] == k].drop(columns=["k"]) \
            .reset_index(drop=True)
        pd.testing.assert_frame_equal(g, ref)


# ------------------------------------------------------------------- rrf

def test_rrf_brute():
    from mapshaper_ray.ops.rank import rrf_fuse
    a = pd.DataFrame({"doc_id": [1, 2, 3]})
    b = pd.DataFrame({"doc_id": [3, 4]})
    out = rrf_fuse([a, b], topk=10, k0=60)
    want = {1: 1 / 61, 2: 1 / 62, 3: 1 / 63 + 1 / 61, 4: 1 / 62}
    got = dict(zip(out["doc_id"], out["rrf"]))
    for k, v in want.items():
        assert abs(got[k] - round(v, 9)) < 1e-12
    # 3 ranks first (sum of two), ties (2 and 4) break by id
    assert out["doc_id"].tolist()[0] == 3
    i2 = out["doc_id"].tolist().index(2)
    i4 = out["doc_id"].tolist().index(4)
    assert i2 < i4


# ------------------------------------------------------------- outliers

def test_group_outliers_brute_and_partition_invariance():
    from mapshaper_ray.ops.relational import group_outliers
    rng = np.random.default_rng(37)
    n = 4000
    df = pd.DataFrame({"k": rng.choice(["x", "y"], n),
                       "i": np.arange(n),
                       "v": rng.normal(50, 4, n)})
    # plant obvious outliers
    df.loc[df.index[:5], "v"] = 500.0
    outs = [group_outliers(ds, "k", "v", z=3, id_col="i")
            for ds in _layouts(df, 37)]
    for o in outs[1:]:
        pd.testing.assert_frame_equal(outs[0], o)
    got = outs[0]
    assert set(df["i"][:5]).issubset(set(got["i"]))
    # brute force with exact integer arithmetic (python ints)
    q = np.floor(df["v"].to_numpy() * 100).astype(np.int64)
    flg = []
    for k in ["x", "y"]:
        m = (df["k"] == k).to_numpy()
        qs = [int(x) for x in q[m]]
        nn, S, Q = len(qs), sum(qs), sum(x * x for x in qs)
        for i, x in zip(df["i"].to_numpy()[m], qs):
            if (nn - 1) * (nn * x - S) ** 2 > 9 * nn * (nn * Q - S * S):
                flg.append(i)
    assert sorted(got["i"].tolist()) == sorted(flg)


def test_group_outliers_constant_group_flags_nothing():
    from mapshaper_ray.ops.relational import group_outliers
    df = pd.DataFrame({"k": ["c"] * 50, "i": range(50),
                       "v": [7.25] * 50})
    out = group_outliers(rd.from_pandas(df), "k", "v", id_col="i")
    assert len(out) == 0


# ------------------------------------------------------- embedding pooling

def test_pool_embeddings_brute_and_partition_invariance():
    from mapshaper_ray.ops.ann import pool_embeddings
    rng = np.random.default_rng(43)
    n, d = 500, 16
    vecs = rng.normal(0, 1, (n, d)).astype(np.float32)
    labels = rng.integers(0, 5, n)
    df = pd.DataFrame({"label": labels,
                       "embedding": [v for v in vecs]})
    outs = [pool_embeddings(ds, "label", "embedding", mode="mean")
            for ds in _layouts(df, 43)]
    for o in outs[1:]:
        pd.testing.assert_frame_equal(outs[0], o)
    got = outs[0]
    # brute: exact integer arithmetic with truncating division
    q = np.floor(vecs.astype(np.float64) * (1 << 20)).astype(np.int64)
    for lab in range(5):
        m = labels == lab
        s = q[m].sum(axis=0)
        nn = int(m.sum())
        want = np.sign(s) * (np.abs(s) // nn)
        sub = got[got["label"] == lab].sort_values("dim")
        assert (sub["pooled_q"].to_numpy() == want).all()
        assert (sub["n"].to_numpy() == nn).all()


def test_pool_embeddings_max_mode():
    from mapshaper_ray.ops.ann import pool_embeddings
    df = pd.DataFrame({"label": [0, 0, 1],
                       "embedding": [np.array([1.0, -2.0]),
                                     np.array([0.5, 5.0]),
                                     np.array([3.0, 3.0])]})
    out = pool_embeddings(rd.from_pandas(df), "label", "embedding",
                          mode="max")
    g0 = out[out["label"] == 0].sort_values("dim")["pooled_q"].to_numpy()
    S = 1 << 20
    assert g0.tolist() == [int(np.floor(1.0 * S)),
                           int(np.floor(5.0 * S))]


# ------------------------------------------------------- grouped cumsum

def test_grouped_cumsum_brute_and_partition_invariance():
    from mapshaper_ray.ops.relational import grouped_cumsum
    rng = np.random.default_rng(47)
    n = 2000
    df = pd.DataFrame({"k": rng.integers(0, 50, n),
                       "o": rng.permutation(n),
                       "v": rng.normal(10, 5, n)})
    outs = []
    for ds in _layouts(df, 47):
        o = grouped_cumsum(ds, "k", "o", "v").to_pandas() \
            .sort_values(["k", "o"]).reset_index(drop=True)
        outs.append(o)
    for o in outs[1:]:
        pd.testing.assert_frame_equal(outs[0], o)
    # brute via pandas window
    b = df.copy()
    b["q"] = np.floor(b["v"] * 100).astype(np.int64)
    b = b.sort_values(["k", "o"])
    b["cum_q"] = b.groupby("k")["q"].cumsum()
    want = b[["k", "o", "cum_q"]].reset_index(drop=True)
    got = outs[0][["k", "o", "cum_q"]]
    pd.testing.assert_frame_equal(
        got.astype({"cum_q": np.int64}), want)


# ------------------------------------------------------- containment

def test_containment_detects_quotes_jaccard_misses():
    from mapshaper_ray.ops.dedup import all_pairs_containment
    quote = " ".join(f"q{i}" for i in range(12))
    long_doc = quote + " " + " ".join(f"x{i}" for i in range(200))
    other = " ".join(f"y{i}" for i in range(50))
    df = pd.DataFrame({"doc_id": [1, 2, 3],
                       "text": [quote, long_doc, other]})
    out = all_pairs_containment(rd.from_pandas(df), threshold=0.8,
                                shingle_k=3)
    assert out[["id_a", "id_b"]].values.tolist() == [[1, 2]]
    row = out.iloc[0]
    # every one of the quote's shingles appears in the long doc
    assert row["n_inter"] == row["n_a"]
    assert row["cont"] == 1.0
    # jaccard for that pair is tiny — the asymmetry is the point
    assert row["n_inter"] / (row["n_a"] + row["n_b"]
                             - row["n_inter"]) < 0.1


def test_containment_partition_invariance():
    from mapshaper_ray.ops.dedup import all_pairs_containment
    rng = np.random.default_rng(53)
    vocab = [f"w{i}" for i in range(40)]
    texts = [" ".join(rng.choice(vocab, 30)) for _ in range(60)]
    # plant a containment pair
    texts[7] = texts[3][:len(texts[3]) // 2]
    df = pd.DataFrame({"doc_id": range(60), "text": texts})
    outs = [all_pairs_containment(ds, threshold=0.7, shingle_k=3)
            for ds in _layouts(df, 53)]
    for o in outs[1:]:
        pd.testing.assert_frame_equal(outs[0], o)
    assert len(outs[0]) >= 1


# ------------------------------------------------------- grouping sets

def test_grouping_sets_matches_pandas():
    from mapshaper_ray.ops.relational import grouping_sets_agg
    rng = np.random.default_rng(59)
    df = pd.DataFrame({"a": rng.choice(["p", "q"], 500),
                       "b": rng.choice(["x", "y", "z"], 500),
                       "v": rng.integers(0, 100, 500)})
    out = grouping_sets_agg(rd.from_pandas(df).repartition(7),
                            ["a", "b"], [["a", "b"], ["b"], []],
                            {"n": ("v", "count"), "s": ("v", "sum")})
    fine = df.groupby(["a", "b"], as_index=False) \
        .agg(n=("v", "size"), s=("v", "sum"))
    assert len(out) == len(fine) + 3 + 1
    bonly = out[(out["a"] == "(all)") & (out["b"] == "y")]
    want = df[df["b"] == "y"]
    assert int(bonly["n"].iloc[0]) == len(want)
    assert int(bonly["s"].iloc[0]) == int(want["v"].sum())
    tot = out[(out["a"] == "(all)") & (out["b"] == "(all)")]
    assert int(tot["n"].iloc[0]) == 500
    assert int(tot["s"].iloc[0]) == int(df["v"].sum())


# ------------------------------------------------------- char entropy

def test_char_entropy_brute_and_edge_cases():
    import math
    from collections import Counter

    from mapshaper_ray.stages.text import char_entropy
    texts = ["aab", "", "zzzz", "hello world", "ab\ncd",
             "ééx☃", None]
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})

    def brute(t, S=10 ** 9):
        if not t:
            return 0
        n = len(t)
        c = Counter(t)
        return n * math.floor(math.log(n) * S) \
            - sum(v * math.floor(math.log(v) * S) for v in c.values())

    out = char_entropy(rd.from_pandas(df).repartition(3)) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    for i, t in enumerate(texts):
        assert out["ent_q"].iloc[i] == brute(t), (i, t)
        assert out["n_chars_cp"].iloc[i] == (len(t) if t else 0)
    # uniform text has zero entropy; all-distinct has n*qlog(n) shape
    assert out["ent_q"].iloc[2] == 0


# ------------------------------------------------------- boilerplate

def _bp_pages():
    rows = []
    for h in range(3):
        for i in range(6):
            body = f"unique body {h} {i}\nsecond line {h} {i}"
            promo = "PROMO line\n" if i % 2 == 0 else ""
            rows.append({"doc_id": h * 100 + i, "host": f"h{h}",
                         "text": f"HEADER h{h}\n{promo}{body}"
                                 f"\nFOOTER h{h}"})
    return pd.DataFrame(rows)


def test_boilerplate_brute_both_paths():
    from mapshaper_ray.stages.pages import remove_boilerplate
    df = _bp_pages()
    for cap in (None, 0):  # broadcast, then forced bucketed
        out = remove_boilerplate(rd.from_pandas(df), frac_num=1,
                                 frac_den=2, broadcast_cap=cap) \
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        # header/footer in 100% of pages, promo in 50% -> all removed
        for _, r in out.iterrows():
            assert "HEADER" not in r["text_clean"]
            assert "FOOTER" not in r["text_clean"]
            assert "PROMO" not in r["text_clean"]
            assert "unique body" in r["text_clean"]
        # bodies survive byte-exactly
        r0 = out[out["doc_id"] == 0].iloc[0]
        assert r0["text_clean"] == "unique body 0 0\nsecond line 0 0"


def test_boilerplate_partition_invariance():
    from mapshaper_ray.stages.pages import remove_boilerplate
    df = _bp_pages()
    outs = [remove_boilerplate(ds, frac_num=1, frac_den=2)
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
            for ds in _layouts(df, 61)]
    for o in outs[1:]:
        pd.testing.assert_frame_equal(outs[0], o)


def test_boilerplate_threshold_boundary():
    from mapshaper_ray.stages.pages import remove_boilerplate
    # line in exactly 1/2 of 4 pages with frac 1/2: 2*2 >= 1*4 -> drop
    df = pd.DataFrame({
        "doc_id": range(4), "host": ["h"] * 4,
        "text": ["EDGE\na0", "EDGE\na1", "a2", "a3"]})
    out = remove_boilerplate(rd.from_pandas(df), frac_num=1,
                             frac_den=2).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out["text_clean"].tolist() == ["a0", "a1", "a2", "a3"]


def test_boilerplate_all_boilerplate_doc_survives_both_paths():
    # a doc whose EVERY line is boilerplate (and an empty doc) must
    # appear with text_clean='' in BOTH paths — the bucketed
    # explode->anti-join chain used to drop them entirely
    from mapshaper_ray.stages.pages import remove_boilerplate
    rows = [{"doc_id": i, "host": "h",
             "text": f"HEADER\nbody {i}"} for i in range(4)]
    rows.append({"doc_id": 4, "host": "h", "text": "HEADER"})
    rows.append({"doc_id": 5, "host": "h", "text": ""})
    df = pd.DataFrame(rows)
    outs = []
    for cap in (None, 0):  # broadcast, then forced bucketed
        out = remove_boilerplate(rd.from_pandas(df), frac_num=1,
                                 frac_den=2, broadcast_cap=cap) \
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        assert out["doc_id"].tolist() == [0, 1, 2, 3, 4, 5]
        assert out.loc[4, "text_clean"] == ""
        assert out.loc[5, "text_clean"] == ""
        assert out.loc[0, "text_clean"] == "body 0"
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_boilerplate_same_line_hash_other_host_not_dropped():
    # membership is (host, line-hash): a line that is boilerplate on
    # h0 must survive verbatim on h1 where it is rare
    from mapshaper_ray.stages.pages import remove_boilerplate
    rows = [{"doc_id": i, "host": "h0", "text": f"AD\nb{i}"}
            for i in range(4)]
    rows += [{"doc_id": 10 + i, "host": "h1",
              "text": f"AD\nc{i}" if i == 0 else f"c{i}"}
             for i in range(4)]
    df = pd.DataFrame(rows)
    for cap in (None, 0):
        out = remove_boilerplate(rd.from_pandas(df), frac_num=1,
                                 frac_den=2, broadcast_cap=cap) \
            .to_pandas().set_index("doc_id")
        assert "AD" not in out.loc[0, "text_clean"]
        assert out.loc[10, "text_clean"] == "AD\nc0"


# ------------------------- adversarial partition invariance (r5 #10)

def test_trimmed_mean_partition_invariance():
    from mapshaper_ray.ops.relational import group_trimmed_mean
    rng = np.random.default_rng(21)
    n = 600
    df = pd.DataFrame({
        "k": rng.choice(["a", "b", "c"], n),
        "v": np.round(rng.normal(50, 30, n), 2),
        "i": np.arange(n, dtype=np.int64)})
    # heavy ties to stress the deterministic id tiebreak
    df.loc[: n // 3, "v"] = 42.0
    outs = [group_trimmed_mean(ds, "k", "v", "i", trim_num=1,
                               trim_den=5)
            for ds in _layouts(df, 31)]
    for o in outs[1:]:
        pd.testing.assert_frame_equal(outs[0], o)


def test_group_linfit_partition_invariance():
    from mapshaper_ray.ops.relational import group_linfit
    rng = np.random.default_rng(22)
    n = 500
    df = pd.DataFrame({
        "k": rng.choice(["x", "y", "z", "flat"], n),
        "ts": pd.to_datetime(
            rng.integers(0, 90 * 86400, n), unit="s"),
        "v": np.round(rng.normal(10, 4, n), 2)})
    # a genuinely zero-variance-x group must drop identically
    df.loc[df["k"] == "flat", "ts"] = pd.Timestamp("2024-01-02")
    outs = [group_linfit(ds, "k", "ts", "v")
            for ds in _layouts(df, 32)]
    for o in outs[1:]:
        pd.testing.assert_frame_equal(outs[0], o)
    assert "flat" not in outs[0]["k"].tolist()


def test_grouping_sets_partition_invariance():
    from mapshaper_ray.ops.relational import grouping_sets_agg
    rng = np.random.default_rng(23)
    n = 400
    df = pd.DataFrame({
        "a": rng.choice(["p", "q"], n),
        "b": rng.choice(["u", "v", "w"], n),
        "m": rng.integers(0, 100, n).astype(np.int64)})
    sets = [["a", "b"], ["a"], ["b"], []]
    outs = [grouping_sets_agg(ds, ["a", "b"], sets,
                              {"s": ("m", "sum"), "c": ("m", "count")})
            for ds in _layouts(df, 33)]
    for o in outs[1:]:
        pd.testing.assert_frame_equal(outs[0], o)


def test_host_dup_rate_partition_invariance():
    # the q163 shape: per-host (n_docs, n_distinct) over content md5
    from mapshaper_ray.ops.dedup import content_md5
    from mapshaper_ray.ops.relational import groupby_agg
    rng = np.random.default_rng(24)
    n = 300
    df = pd.DataFrame({
        "host": ("h" + pd.Series(rng.integers(0, 5, n)).astype(str)),
        "text": ["dup text %d" % (i % 40) for i in range(n)]})

    def run(ds):
        def keyed(d):
            return pd.DataFrame({
                "host": d["host"].to_numpy(object),
                "h": np.asarray(content_md5(d["text"]), object)})
        kd = ds.map_batches(keyed, batch_format="pandas")
        per_hash = groupby_agg(kd, ["host", "h"], {"c": ("h", "count")},
                               final="distributed")
        out = groupby_agg(per_hash, ["host"],
                          {"n_distinct": ("h", "count"),
                           "n_docs": ("c", "sum")},
                          final="driver").to_pandas()
        return out.sort_values("host").reset_index(drop=True) \
            .astype({"n_docs": np.int64, "n_distinct": np.int64})

    outs = [run(ds) for ds in _layouts(df, 34)]
    for o in outs[1:]:
        pd.testing.assert_frame_equal(outs[0], o)


# ------------------------------------------------------- phash dedup

def test_phash_near_dup_pairs_brute_force_and_invariance():
    # banded hamming<=3 pairs == brute-force over planted near-dups,
    # identical across partition layouts
    from mapshaper_ray.ops.dedup import hamming64
    from mapshaper_ray.stages.multimodal import phash_near_dup_pairs
    rng = np.random.RandomState(11)
    n = 200
    h = rng.randint(0, 2**63, n).astype(np.uint64)
    for i in range(40):  # rows 0..39 = rows 40..79 with <=3 flips
        v = h[i + 40]
        for b in rng.choice(64, 1 + i % 3, replace=False):
            v ^= np.uint64(1) << np.uint64(b)
        h[i] = v
    df = pd.DataFrame({
        "media_id": np.arange(n, dtype=np.int64),
        "phash_lo": (h & np.uint64(0xFFFFFFFF)).astype(np.int64),
        "phash_hi": (h >> np.uint64(32)).astype(np.int64)})
    ia, ib = np.triu_indices(n, k=1)
    hd = hamming64(h[ia], h[ib])
    keep = hd <= 3
    exp = pd.DataFrame({"id_a": ia[keep].astype(np.int64),
                        "id_b": ib[keep].astype(np.int64),
                        "hamming": hd[keep].astype(np.int64)}) \
        .sort_values(["id_a", "id_b"]).reset_index(drop=True)
    assert len(exp) >= 40
    for ds in _layouts(df, 17):
        got = phash_near_dup_pairs(ds, max_hamming=3).to_pandas() \
            .astype({"id_a": np.int64, "id_b": np.int64,
                     "hamming": np.int64}) \
            .sort_values(["id_a", "id_b"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, exp)


def test_phash_near_dup_groups_transitive():
    # a -1bit- b -1bit- c chains into ONE cluster rooted at min id
    from mapshaper_ray.stages.multimodal import phash_near_dup_groups
    base = np.uint64(0x0123456789ABCDEF)
    hs = np.array([base,
                   base ^ np.uint64(1),
                   base ^ np.uint64(1) ^ (np.uint64(1) << np.uint64(40)),
                   np.uint64(0x7EDCBA9876543210)], dtype=np.uint64)
    df = pd.DataFrame({
        "media_id": np.array([5, 9, 2, 7], np.int64),
        "phash_lo": (hs & np.uint64(0xFFFFFFFF)).astype(np.int64),
        "phash_hi": (hs >> np.uint64(32)).astype(np.int64)})
    out = phash_near_dup_groups(rd.from_pandas(df), max_hamming=2)
    assert out["media_id"].tolist() == [2, 5, 9]
    assert out["cluster_id"].tolist() == [2, 2, 2]


def test_phash_identical_payloads_group_and_halves_fit():
    from mapshaper_ray.stages.multimodal import (phash_dup_groups,
                                                 phash_images)
    import pyarrow as pa
    t = pa.table({"media_id": pa.array([1, 2, 3, 4],
                                       type=pa.int64()),
                  "payload": pa.array([b"imgA", b"imgA", b"imgB",
                                       b"imgC"], type=pa.binary())})
    hashed = phash_images(rd.from_arrow(t))
    hp = hashed.to_pandas()
    # halves are 32-bit: always exchange-safe
    assert (hp["phash_lo"] < (1 << 32)).all()
    assert (hp["phash_hi"] < (1 << 32)).all()
    groups = phash_dup_groups(hashed)
    assert len(groups) == 1
    assert groups["first_media"].iloc[0] == 1
    assert groups["n_dups"].iloc[0] == 2


# ------------------------------------------------------- group trend

def test_group_linfit_brute_and_partition_invariance():
    from mapshaper_ray.ops.relational import group_linfit
    rng = np.random.default_rng(67)
    n = 3000
    base = pd.Timestamp("2024-01-01").value // 1000
    df = pd.DataFrame({
        "k": rng.choice(["up", "down", "flat"], n),
        "ts": pd.Series(base + rng.integers(0, 90 * 86400 * 10 ** 6, n))
        .astype("datetime64[us]"),
        "v": rng.normal(0, 1, n)})
    # plant a known positive trend in 'up'
    m = (df["k"] == "up").to_numpy()
    day = (df["ts"].astype(np.int64) // (86400 * 10 ** 6)).to_numpy()
    df.loc[m, "v"] = day[m] * 0.5 + rng.normal(0, 0.1, int(m.sum()))
    outs = [group_linfit(ds, "k", "ts", "v")
            for ds in _layouts(df, 67)]
    for o in outs[1:]:
        pd.testing.assert_frame_equal(outs[0], o)
    got = outs[0]
    up = got[got["k"] == "up"]["slope"].iloc[0]
    # y is in cents: slope ~ 0.5 * 100
    assert 45 < up < 55
    # brute with exact python ints
    sub = df[m]
    x = (sub["ts"].astype(np.int64) // (86400 * 10 ** 6)).tolist()
    y = np.floor(sub["v"].to_numpy() * 100).astype(int).tolist()
    nn = len(x)
    num = nn * sum(a * b for a, b in zip(x, y)) - sum(x) * sum(y)
    den = nn * sum(a * a for a in x) - sum(x) ** 2
    assert up == round(float(num) / float(den), 9)


def test_group_linfit_zero_variance_dropped():
    from mapshaper_ray.ops.relational import group_linfit
    df = pd.DataFrame({"k": ["c"] * 10,
                       "ts": pd.Series([pd.Timestamp("2024-01-01")]
                                       * 10).astype("datetime64[us]"),
                       "v": np.arange(10.0)})
    out = group_linfit(rd.from_pandas(df), "k", "ts", "v")
    assert len(out) == 0


# ------------------------------------------------------- log-odds terms

def test_log_odds_brute_and_partition_invariance():
    import math

    from mapshaper_ray.stages.text import log_odds_terms
    rng = np.random.default_rng(71)
    # side A over-uses 'alpha', side B over-uses 'beta'
    def mk(side, n):
        rows = []
        for _ in range(n):
            toks = list(rng.choice(["x", "y", "z", "w"], 20))
            toks += ["alpha"] * (6 if side == "A" else 1)
            toks += ["beta"] * (1 if side == "A" else 6)
            rows.append(" ".join(toks))
        return rows
    df = pd.DataFrame({
        "grp": ["A"] * 50 + ["B"] * 50,
        "text": mk("A", 50) + mk("B", 50)})
    outs = [log_odds_terms(ds, "grp", "A", k=3)
            for ds in _layouts(df, 71)]
    for o in outs[1:]:
        pd.testing.assert_frame_equal(outs[0], o)
    got = outs[0]
    assert got["tok"].iloc[0] == "alpha"
    assert "beta" not in got["tok"].tolist()
    # brute check of the winner's delta with exact ints
    S = 10 ** 9
    qlog = lambda x: math.floor(math.log(x) * S)
    a = int(got["a"].iloc[0]); b = int(got["b"].iloc[0])
    A = sum(len(t.split()) for t in df[df.grp == "A"]["text"])
    B = sum(len(t.split()) for t in df[df.grp == "B"]["text"])
    want = qlog(a + 1) - qlog(A - a + 1) - qlog(b + 1) + qlog(B - b + 1)
    assert int(got["delta_q"].iloc[0]) == want


# ---------------------------------------------------- empty-input sweep

def test_session6_ops_on_empty_inputs():
    """The schemaless-empty bug class (group_outliers hit it): every
    session-6 op must return a well-formed empty (or degenerate)
    result on a zero-row input, not crash or drop its schema."""
    from mapshaper_ray.ops.ann import pool_embeddings
    from mapshaper_ray.ops.dedup import all_pairs_containment
    from mapshaper_ray.ops.graph import bfs_distances
    from mapshaper_ray.ops.relational import (group_outliers,
                                              grouped_cumsum,
                                              grouping_sets_agg,
                                              resample_time)
    from mapshaper_ray.ops.sketch import ddsketch_build
    from mapshaper_ray.stages.pages import (filter_blocked_hosts,
                                            remove_boilerplate)
    from mapshaper_ray.stages.text import (char_entropy,
                                           log_odds_terms,
                                           skipgram_counts)

    empty_txt = rd.from_pandas(pd.DataFrame(
        {"doc_id": pd.Series([], dtype=np.int64),
         "text": pd.Series([], dtype=object)})).materialize()
    empty_ev = rd.from_pandas(pd.DataFrame(
        {"k": pd.Series([], dtype=object),
         "ts": pd.Series([], dtype="datetime64[us]"),
         "i": pd.Series([], dtype=np.int64),
         "v": pd.Series([], dtype=np.float64)})).materialize()

    sk = ddsketch_build(rd.from_pandas(pd.DataFrame(
        {"v": pd.Series([], dtype=np.float64)})), "v")
    assert len(sk) == 0
    assert len(resample_time(empty_ev, "ts", "k", "v")) == 0
    assert len(group_outliers(empty_ev, "k", "v", id_col="i")) == 0
    assert grouped_cumsum(empty_ev, "k", ["ts"], "v") \
        .to_pandas().shape[0] == 0
    assert len(grouping_sets_agg(
        empty_ev, ["k"], [["k"], []],
        {"n": ("v", "count")})) == 1  # the () set always emits 1 row
    assert char_entropy(empty_txt).to_pandas().shape[0] == 0
    assert len(skipgram_counts(empty_txt, window=2, min_count=1)) == 0
    assert len(all_pairs_containment(empty_txt, threshold=0.8)) == 0
    e = pd.DataFrame({"src": pd.Series([], dtype=np.int64),
                      "dst": pd.Series([], dtype=np.int64)})
    bfs = bfs_distances(rd.from_pandas(e), [0], max_hops=2) \
        .to_pandas()
    assert bfs["node"].tolist() == [0]  # the seed itself
    eu = rd.from_pandas(pd.DataFrame(
        {"doc_id": pd.Series([], dtype=np.int64),
         "url": pd.Series([], dtype=object)}))
    assert len(filter_blocked_hosts(eu, ["x.example"])
               .to_pandas()) == 0
    ep = rd.from_pandas(pd.DataFrame(
        {"doc_id": pd.Series([], dtype=np.int64),
         "host": pd.Series([], dtype=object),
         "text": pd.Series([], dtype=object)}))
    assert remove_boilerplate(ep).to_pandas().shape[0] == 0
    lo = log_odds_terms(rd.from_pandas(pd.DataFrame(
        {"grp": pd.Series([], dtype=object),
         "text": pd.Series([], dtype=object)})), "grp", "A", k=5)
    assert len(lo) == 0
    ee = rd.from_pandas(pd.DataFrame(
        {"label": pd.Series([], dtype=np.int64),
         "embedding": pd.Series([], dtype=object)}))
    assert len(pool_embeddings(ee, "label", "embedding")) == 0


# ---------------------------------------------------- run metrics

def test_write_tiles_emits_run_metrics():
    import json
    import shutil

    from mapshaper_ray.stages.tiles import write_tiles
    df = pd.DataFrame({"doc_id": range(3000),
                       "tile": np.arange(3000) % 5})
    out = "/tmp/test_metrics_tiles"
    shutil.rmtree(out, ignore_errors=True)
    write_tiles(rd.from_pandas(df), out, target_rows=1000)
    m = json.load(open(f"{out}/metrics.json"))
    names = [o["operator"] for o in m["operators"]]
    assert any("write_partition" in n for n in names)
    wp = [o for o in m["operators"]
          if "write_partition" in o["operator"]][0]
    assert wp["rows_out"] == 5  # one manifest row per partition
    assert wp["wall_s_total"] > 0
    assert m["partitions_written"] == 5
    assert m["rows_total"] == 3000
    # resumed run skips everything but still refreshes metrics
    write_tiles(rd.from_pandas(df), out, target_rows=1000)
    m2 = json.load(open(f"{out}/metrics.json"))
    assert m2["partitions_skipped"] == 5


def test_ddsketch_update_equals_union_build():
    from mapshaper_ray.ops.sketch import ddsketch_build, ddsketch_update
    rng = np.random.default_rng(73)
    a = pd.DataFrame({"v": rng.lognormal(0, 1, 1500)})
    b = pd.DataFrame({"v": -rng.lognormal(1, 1, 700)})
    incr = ddsketch_update(
        ddsketch_build(rd.from_pandas(a), "v"), rd.from_pandas(b), "v")
    whole = ddsketch_build(rd.from_pandas(pd.concat([a, b])), "v")
    pd.testing.assert_frame_equal(incr, whole)


def test_trimmed_mean_brute_and_partition_invariance():
    from mapshaper_ray.ops.relational import group_trimmed_mean
    rng = np.random.default_rng(79)
    n = 2000
    df = pd.DataFrame({"k": rng.choice(["a", "b"], n),
                       "i": np.arange(n),
                       "v": rng.normal(10, 3, n)})
    df.loc[df.index[:3], "v"] = 1e6  # outliers the trim must drop
    outs = [group_trimmed_mean(ds, "k", "v", "i")
            for ds in _layouts(df, 79)]
    for o in outs[1:]:
        pd.testing.assert_frame_equal(outs[0], o)
    got = outs[0]
    for k in ["a", "b"]:
        sub = df[df["k"] == k]
        q = np.floor(sub["v"].to_numpy() * 100).astype(np.int64)
        order = np.lexsort((sub["i"].to_numpy(), q))
        qs = q[order]
        cut = len(qs) // 10
        kept = qs[cut:len(qs) - cut]
        row = got[got["k"] == k].iloc[0]
        assert row["n_kept"] == len(kept)
        assert row["sum_q"] == kept.sum()
        # outliers gone: trimmed mean is near 10, plain mean is not
        assert abs(kept.mean() / 100 - 10) < 1
