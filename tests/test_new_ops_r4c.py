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


# ---------------------------------------------------------------------------
# pivot_agg
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("n_blocks", [1, 7, 64])
def test_pivot_agg_matches_pandas(ray_session, n_blocks):
    from mapshaper_ray.ops.relational import pivot_agg
    rng = np.random.default_rng(0)
    df = pd.DataFrame({
        "user_id": rng.integers(0, 10, 500),
        "event_type": rng.choice(["view", "click", "purchase"], 500),
        "cents": rng.integers(0, 1000, 500)})
    out = pivot_agg(_ds(df, n_blocks), "user_id", "event_type",
                    "cents").to_pandas() \
        .sort_values("user_id").reset_index(drop=True)
    exp_pt = df.pivot_table(index="user_id", columns="event_type",
                            values="cents", aggfunc=["sum", "count"],
                            fill_value=0)
    exp = pd.DataFrame({"user_id": exp_pt.index})
    for v in ["click", "purchase", "view"]:
        for fn in ["sum", "count"]:
            exp[f"{v}_{fn}"] = exp_pt[(fn, v)].to_numpy()
    exp = exp[out.columns.tolist()]
    pd.testing.assert_frame_equal(out, exp, check_dtype=False)


def test_pivot_agg_minmax_and_given_values(ray_session):
    from mapshaper_ray.ops.relational import pivot_agg
    df = pd.DataFrame({"k": [1, 1, 2], "p": ["a", "b", "a"],
                       "v": [5, 7, 9]})
    out = pivot_agg(_ds(df, 2), "k", "p", "v", fns=("min", "max"),
                    values=["a", "b", "c"]).to_pandas() \
        .sort_values("k").reset_index(drop=True)
    assert out.columns.tolist() == [
        "k", "a_min", "a_max", "b_min", "b_max", "c_min", "c_max"]
    assert out["a_min"].tolist() == [5, 9]
    assert np.isnan(out["c_min"]).all()
    assert out["b_max"][0] == 7 and np.isnan(out["b_max"][1])


# ---------------------------------------------------------------------------
# funnel
# ---------------------------------------------------------------------------

def _funnel_brute(df, steps):
    rows = []
    for u, g in df.groupby("user_id"):
        g = g.sort_values("ts")
        prev, tss = None, []
        for s in steps:
            c = g[(g.event_type == s)
                  & ((g.ts > prev) if prev is not None else True)]
            if len(c):
                prev = c["ts"].min()
                tss.append(prev)
            else:
                break
        if tss:
            rows.append((u, len(tss),
                         *(tss + [pd.NaT] * (len(steps) - len(tss)))))
    cols = ["user_id", "stage"] + [f"ts_{i+1}"
                                   for i in range(len(steps))]
    out = pd.DataFrame(rows, columns=cols)
    for c in cols[2:]:
        out[c] = out[c].astype("datetime64[us]")
    return out.sort_values("user_id").reset_index(drop=True)


@pytest.mark.parametrize("n_blocks", [1, 9])
def test_funnel_bruteforce(ray_session, n_blocks):
    from mapshaper_ray.ops.relational import funnel
    rng = np.random.default_rng(1)
    n = 600
    df = pd.DataFrame({
        "user_id": rng.integers(0, 120, n),   # sparse: ~5 events/user
        "event_type": rng.choice(
            ["view", "click", "purchase", "error"], n),
        "ts": pd.to_datetime("2024-01-01") + pd.to_timedelta(
            rng.integers(0, 10 ** 9, n), unit="us")})
    steps = ["view", "click", "purchase"]
    out = funnel(_ds(df, n_blocks), steps).to_pandas() \
        .sort_values("user_id").reset_index(drop=True)
    exp = _funnel_brute(df, steps)
    pd.testing.assert_frame_equal(out, exp, check_dtype=False)
    # sparse users must spread across stages for the test to mean much
    assert out["stage"].nunique() >= 2


def test_funnel_strictly_after(ray_session):
    from mapshaper_ray.ops.relational import funnel
    t = pd.to_datetime("2024-01-01")
    # click at the SAME instant as view must not count (strict >)
    df = pd.DataFrame({
        "user_id": [1, 1, 2, 2],
        "event_type": ["view", "click", "view", "click"],
        "ts": [t, t, t, t + pd.Timedelta(seconds=1)]})
    out = funnel(_ds(df), ["view", "click"]).to_pandas() \
        .sort_values("user_id").reset_index(drop=True)
    assert out["stage"].tolist() == [1, 2]


# ---------------------------------------------------------------------------
# kcore
# ---------------------------------------------------------------------------

def _kcore_brute(df, k):
    E = sorted({(min(a, b), max(a, b))
                for a, b in zip(df.src, df.dst) if a != b})
    alive = set(x for e in E for x in e)
    while True:
        deg = {}
        for a, b in E:
            if a in alive and b in alive:
                deg[a] = deg.get(a, 0) + 1
                deg[b] = deg.get(b, 0) + 1
        new = {x for x in alive if deg.get(x, 0) >= k}
        if new == alive:
            break
        alive = new
    return pd.DataFrame(sorted((x, deg.get(x, 0)) for x in alive),
                        columns=["node", "deg"])


@pytest.mark.parametrize("k", [2, 4, 6])
def test_kcore_bruteforce(ray_session, k):
    from mapshaper_ray.ops.graph import kcore
    rng = np.random.default_rng(3)
    df = pd.DataFrame({"src": rng.integers(0, 200, 900),
                       "dst": rng.integers(0, 200, 900)})
    out = kcore(_ds(df, 5), k).to_pandas() \
        .sort_values("node").reset_index(drop=True) \
        .astype({"node": np.int64, "deg": np.int64})
    pd.testing.assert_frame_equal(out, _kcore_brute(df, k),
                                  check_dtype=False)


def test_kcore_empty_core(ray_session):
    from mapshaper_ray.ops.graph import kcore
    df = pd.DataFrame({"src": [0, 1, 2], "dst": [1, 2, 0]})
    out = kcore(_ds(df), 3).to_pandas()
    assert len(out) == 0
    out2 = kcore(_ds(df), 2).to_pandas().sort_values("node")
    assert out2["node"].tolist() == [0, 1, 2]
    assert out2["deg"].tolist() == [2, 2, 2]


# ---------------------------------------------------------------------------
# weighted_sample
# ---------------------------------------------------------------------------

def test_weighted_sample_partition_invariant_and_exact(ray_session):
    import math
    from mapshaper_ray.ops.relational import weighted_sample
    from mapshaper_ray.stages.text import md5_lo64
    df = pd.DataFrame({"doc_id": np.arange(1000, dtype=np.int64),
                       "w": (np.arange(1000) % 17 + 1)
                       .astype(np.int64)})
    outs = [weighted_sample(_ds(df, nb), 50, "w") for nb in (1, 13)]
    pd.testing.assert_frame_equal(outs[0], outs[1])
    h = md5_lo64([f"s0:{i}" for i in df.doc_id])
    u = (h.astype(np.float64) + 1.0) / 2.0 ** 64
    L = np.array([math.floor(math.log(x) * 1e9) for x in u],
                 dtype=np.float64)
    key = L / df.w.to_numpy(np.float64)
    order = np.lexsort((df.doc_id.to_numpy(), -key))[:50]
    exp = df.iloc[order].assign(key=key[order]).reset_index(drop=True)
    pd.testing.assert_frame_equal(outs[0], exp)


def test_weighted_sample_zero_weight_excluded(ray_session):
    from mapshaper_ray.ops.relational import weighted_sample
    df = pd.DataFrame({"doc_id": [1, 2, 3],
                       "w": [0, 5, -1]})
    out = weighted_sample(_ds(df), 10, "w")
    assert out["doc_id"].tolist() == [2]


# ---------------------------------------------------------------------------
# host_link_graph
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("n_blocks", [1, 7])
def test_host_link_graph_bruteforce(ray_session, n_blocks):
    from mapshaper_ray.ops.graph import host_link_graph
    rng = np.random.default_rng(5)
    links = pd.DataFrame({
        "src_host": [f"h{x}" for x in rng.integers(0, 12, 800)],
        "dst_host": [f"h{x}" for x in rng.integers(0, 12, 800)]})
    out = host_link_graph(_ds(links, n_blocks)).to_pandas() \
        .sort_values(["src_host", "dst_host"]).reset_index(drop=True)
    agg = links.groupby(["src_host", "dst_host"], as_index=False) \
        .size().rename(columns={"size": "n_links"})
    pairs = set(zip(agg.src_host, agg.dst_host))
    agg["mutual"] = [(b, a) in pairs
                     for a, b in zip(agg.src_host, agg.dst_host)]
    agg = agg.sort_values(["src_host", "dst_host"]) \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(
        out.astype({"n_links": np.int64, "mutual": bool}),
        agg.astype({"n_links": np.int64, "mutual": bool}),
        check_dtype=False)


def test_host_link_graph_self_link_mutual(ray_session):
    from mapshaper_ray.ops.graph import host_link_graph
    links = pd.DataFrame({"src_host": ["a", "a", "b"],
                          "dst_host": ["a", "b", "c"]})
    out = host_link_graph(_ds(links)).to_pandas() \
        .sort_values(["src_host", "dst_host"]).reset_index(drop=True)
    m = dict(zip(zip(out.src_host, out.dst_host), out.mutual))
    assert bool(m[("a", "a")]) is True      # self-link counts
    assert bool(m[("a", "b")]) is False
    assert bool(m[("b", "c")]) is False


# ---------------------------------------------------------------------------
# retention_cohorts / windowed funnel
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("n_blocks", [1, 7])
def test_retention_cohorts_bruteforce(ray_session, n_blocks):
    from mapshaper_ray.ops.relational import retention_cohorts
    rng = np.random.default_rng(2)
    n = 4000
    df = pd.DataFrame({
        "user_id": rng.integers(0, 80, n),
        "ts": pd.to_datetime("2024-01-01") + pd.to_timedelta(
            rng.integers(0, 40 * 86400 * 10 ** 6, n), unit="us")})
    out = retention_cohorts(_ds(df, n_blocks)).to_pandas() \
        .sort_values(["cohort_day", "offset"]).reset_index(drop=True)
    t0 = df.groupby("user_id")["ts"].transform("min")
    us = lambda s: s.astype("datetime64[us]").astype("int64")
    b = pd.DataFrame({
        "cohort_day": us(t0) // (86400 * 10 ** 6),
        "offset": (us(df.ts) - us(t0)) // (7 * 86400 * 10 ** 6),
        "user_id": df.user_id})
    exp = b.drop_duplicates() \
        .groupby(["cohort_day", "offset"], as_index=False)["user_id"] \
        .count().rename(columns={"user_id": "n_users"}) \
        .sort_values(["cohort_day", "offset"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(out, exp, check_dtype=False)
    assert out["offset"].max() >= 1     # curve spans multiple periods


def test_funnel_within_window(ray_session):
    from mapshaper_ray.ops.relational import funnel
    t = pd.to_datetime("2024-01-01")
    h = pd.Timedelta(hours=1)
    df = pd.DataFrame({
        "user_id": [1, 1, 1, 2, 2, 2],
        "event_type": ["view", "click", "purchase"] * 2,
        # user 1 converts within the hour; user 2's click comes 3 h
        # after view (outside within_s=7200) so stage stops at 1
        "ts": [t, t + h, t + 2 * h, t, t + 3 * h, t + 4 * h]})
    out = funnel(_ds(df), ["view", "click", "purchase"],
                 within_s=7200.0).to_pandas() \
        .sort_values("user_id").reset_index(drop=True)
    assert out["stage"].tolist() == [3, 1]
    assert pd.isna(out["ts_2"][1])


# ---------------------------------------------------------------------------
# temperature_sample / chunk_documents
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("n_blocks", [1, 7])
def test_temperature_sample_rates_and_invariance(ray_session,
                                                 n_blocks):
    import math
    from mapshaper_ray.stages.text import md5_lo64, temperature_sample
    sizes = {"a": 4000, "b": 250, "c": 1}
    rows = []
    i = 0
    for s, n in sizes.items():
        for _ in range(n):
            rows.append((i, s))
            i += 1
    df = pd.DataFrame(rows, columns=["doc_id", "source"])
    out = temperature_sample(_ds(df, n_blocks), alpha=0.5) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    # brute: keep md5(s0:id) < floor(n^-0.5 * (2^64-1)); n=1 keeps all
    h = md5_lo64([f"s0:{v}" for v in df.doc_id])
    cut = np.empty(len(df), dtype=np.uint64)
    full = np.zeros(len(df), dtype=bool)
    for s, n in sizes.items():
        rate = math.pow(float(n), -0.5)
        m = (df.source == s).to_numpy()
        if rate >= 1:
            full |= m
            cut[m] = 0
        else:
            cut[m] = np.uint64(int(math.floor(
                rate * float(2 ** 64 - 1))))
    exp = df[full | (h < cut)].reset_index(drop=True)
    pd.testing.assert_frame_equal(out, exp, check_dtype=False)
    # flattening: the big source keeps ~sqrt(n), the singleton stays
    kept = out.groupby("source").size()
    assert kept.get("c", 0) == 1
    assert 30 <= kept["a"] <= 110        # ~sqrt(4000) ≈ 63
    assert 8 <= kept["b"] <= 35          # ~sqrt(250) ≈ 16


@pytest.mark.parametrize("size,overlap", [(8, 3), (64, 16)])
def test_chunk_documents_bruteforce(ray_session, size, overlap):
    from mapshaper_ray.stages.text import chunk_documents
    texts = ["", "one", " ".join(f"t{i}" for i in range(30)),
             " ".join(f"w{i}" for i in range(7)),
             " ".join(f"x{i}" for i in range(size))]
    df = pd.DataFrame({"doc_id": np.arange(len(texts),
                                           dtype=np.int64),
                       "text": texts})
    out = chunk_documents(_ds(df, 3), size=size, overlap=overlap) \
        .to_pandas().sort_values(["doc_id", "chunk_id"]) \
        .reset_index(drop=True)
    rows = []
    stride = size - overlap
    for i, t in zip(df.doc_id, df.text):
        ts = (t or "").split(" ")
        n = len(ts)
        for c, st in enumerate(range(0, max(n - overlap, 1), stride)):
            w = ts[st:st + size]
            rows.append((i, c, len(w), " ".join(w)))
    exp = pd.DataFrame(rows, columns=["doc_id", "chunk_id",
                                      "n_tokens", "text"])
    pd.testing.assert_frame_equal(out, exp, check_dtype=False)
    # every chunk ends where the doc does or overlaps the next start
    last = out.groupby("doc_id").tail(1)
    for _, r in last.iterrows():
        n = len((texts[int(r.doc_id)] or "").split(" "))
        assert r.chunk_id * stride + r.n_tokens == n


def test_chunk_documents_overlap_guard(ray_session):
    from mapshaper_ray.stages.text import chunk_documents
    with pytest.raises(ValueError):
        chunk_documents(None, size=8, overlap=8)


# ---------------------------------------------------------------------------
# label_propagation
# ---------------------------------------------------------------------------

def _lpa_brute(df, iters):
    E = sorted({(min(a, b), max(a, b))
                for a, b in zip(df.src, df.dst) if a != b})
    nodes = sorted({x for e in E for x in e})
    lab = {x: x for x in nodes}
    nbrs = {x: [] for x in nodes}
    for a, b in E:
        nbrs[a].append(b)
        nbrs[b].append(a)
    for _ in range(iters):
        new = {}
        for x in nodes:
            if not nbrs[x]:
                new[x] = lab[x]
                continue
            cnt = {}
            for y in nbrs[x]:
                cnt[lab[y]] = cnt.get(lab[y], 0) + 1
            best = sorted(cnt.items(),
                          key=lambda kv: (-kv[1], kv[0]))[0][0]
            new[x] = best
        lab = new
    return pd.DataFrame(sorted(lab.items()),
                        columns=["node", "label"])


@pytest.mark.parametrize("n_blocks,iters", [(1, 2), (5, 3)])
def test_label_propagation_bruteforce(ray_session, n_blocks, iters):
    from mapshaper_ray.ops.graph import label_propagation
    rng = np.random.default_rng(9)
    df = pd.DataFrame({"src": rng.integers(0, 120, 500),
                       "dst": rng.integers(0, 120, 500)})
    out = label_propagation(_ds(df, n_blocks), iters=iters) \
        .to_pandas().sort_values("node").reset_index(drop=True) \
        .astype({"node": np.int64, "label": np.int64})
    pd.testing.assert_frame_equal(out, _lpa_brute(df, iters),
                                  check_dtype=False)


def test_label_propagation_distributed_path(ray_session):
    from mapshaper_ray.ops.graph import label_propagation
    rng = np.random.default_rng(9)
    df = pd.DataFrame({"src": rng.integers(0, 60, 200),
                       "dst": rng.integers(0, 60, 200)})
    out = label_propagation(_ds(df, 3), iters=2, broadcast_cap=0) \
        .to_pandas().sort_values("node").reset_index(drop=True) \
        .astype({"node": np.int64, "label": np.int64})
    pd.testing.assert_frame_equal(out, _lpa_brute(df, 2),
                                  check_dtype=False)


def test_label_propagation_communities(ray_session):
    # two cliques joined by one bridge edge: each clique converges to
    # its own minimum label
    from mapshaper_ray.ops.graph import label_propagation
    import itertools
    c1 = list(itertools.combinations(range(5), 2))
    c2 = list(itertools.combinations(range(10, 15), 2))
    E = c1 + c2 + [(4, 10)]
    df = pd.DataFrame(E, columns=["src", "dst"])
    out = label_propagation(_ds(df), iters=4).to_pandas()
    m = dict(zip(out.node, out.label))
    assert all(m[i] == 0 for i in range(4))
    assert all(m[i] == 10 for i in range(11, 15))


# ---------------------------------------------------------------------------
# gram_matrix
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("n_blocks", [1, 5])
def test_gram_matrix_bruteforce(ray_session, n_blocks):
    from mapshaper_ray.ops.ann import gram_matrix
    rng = np.random.default_rng(11)
    n, d = 120, 6
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    vecs[:, 3] = 2.5                       # constant dim -> code 0
    df = pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                       "embedding": [v for v in vecs]})
    out = gram_matrix(_ds(df, n_blocks)).to_pandas() \
        .sort_values(["i", "j"]).reset_index(drop=True)
    v64 = vecs.astype(np.float64)
    mn, mx = v64.min(0), v64.max(0)
    with np.errstate(divide="ignore", invalid="ignore"):
        q = np.floor((v64 - mn) / (mx - mn) * 255)
    q = np.where(mx > mn, q, 0.0).astype(np.int64)
    G = q.T @ q
    rows = [(0, 0, n)] + \
        [(i + 1, 0, int(q[:, i].sum())) for i in range(d)] + \
        [(i + 1, j + 1, int(G[i, j]))
         for i in range(d) for j in range(i, d)]
    exp = pd.DataFrame(rows, columns=["i", "j", "v"]) \
        .sort_values(["i", "j"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(out, exp, check_dtype=False)


# ---------------------------------------------------------------------------
# zorder_keys
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("n_blocks", [1, 6])
def test_zorder_keys_bruteforce(ray_session, n_blocks):
    from mapshaper_ray.ops.partition import zorder_keys
    rng = np.random.default_rng(4)
    df = pd.DataFrame({"id": np.arange(400, dtype=np.int64),
                       "x": rng.normal(size=400),
                       "y": rng.uniform(0, 1000, 400)})
    out = zorder_keys(_ds(df, n_blocks), ["x", "y"], bits=8,
                      n_parts=16).to_pandas() \
        .sort_values("id").reset_index(drop=True)
    z = np.zeros(400, dtype=np.int64)
    for i, c in enumerate(["x", "y"]):
        v = df[c].to_numpy(np.float64)
        q = np.floor((v - v.min()) / (v.max() - v.min())
                     * 255.0).astype(np.int64)
        sp = np.zeros(400, dtype=np.int64)
        for b in range(8):
            sp |= ((q >> b) & 1) << (2 * b)
        z |= sp << i
    assert out["zkey"].tolist() == z.tolist()
    assert out["part"].tolist() == ((z * 16) >> 16).tolist()
    # locality: points in the same fine z-cell share a part
    assert out["part"].nunique() > 4


def test_zorder_keys_constant_col_and_3d(ray_session):
    from mapshaper_ray.ops.partition import zorder_keys
    df = pd.DataFrame({"a": [1.0, 1.0, 1.0], "b": [0.0, 0.5, 1.0],
                       "c": [3.0, 2.0, 1.0]})
    out = zorder_keys(_ds(df), ["a", "b", "c"], bits=4).to_pandas()
    # constant col contributes 0 bits; key ordering follows b asc,
    # c desc interleaved
    assert (out["zkey"] >= 0).all()
    import pytest as _pt
    with _pt.raises(ValueError):
        zorder_keys(_ds(df), ["a"] * 9, bits=8)


# ---------------------------------------------------------------------------
# locf_fill
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("n_blocks", [1, 7])
def test_locf_fill_bruteforce(ray_session, n_blocks):
    from mapshaper_ray.ops.relational import locf_fill
    rng = np.random.default_rng(6)
    n = 800
    df = pd.DataFrame({
        "user_id": rng.integers(0, 30, n),
        "ts": pd.to_datetime("2024-01-01") + pd.to_timedelta(
            rng.choice(10 ** 9, n, replace=False), unit="us"),
        "value": np.where(rng.uniform(size=n) < 0.4, np.nan,
                          rng.uniform(0, 100, n))})
    out = locf_fill(_ds(df, n_blocks), col="value").to_pandas() \
        .sort_values(["user_id", "ts"]).reset_index(drop=True)
    exp = df.sort_values(["user_id", "ts"]).reset_index(drop=True)
    exp["value"] = exp.groupby("user_id")["value"].ffill()
    exp["ts"] = exp["ts"].astype("datetime64[us]")
    pd.testing.assert_frame_equal(
        out.astype({"user_id": np.int64}),
        exp.astype({"user_id": np.int64}), check_dtype=False)
    # leading nulls stay null; some fills actually happened
    assert out["value"].isna().sum() < df["value"].isna().sum()


# ---------------------------------------------------------------------------
# rolling_active / dataset_diff
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("n_blocks", [1, 7])
def test_rolling_active_bruteforce(ray_session, n_blocks):
    from mapshaper_ray.ops.relational import rolling_active
    rng = np.random.default_rng(8)
    n = 2000
    df = pd.DataFrame({
        "user_id": rng.integers(0, 40, n),
        "ts": pd.to_datetime("2024-01-01") + pd.to_timedelta(
            rng.integers(0, 30 * 86400 * 10 ** 6, n), unit="us")})
    out = rolling_active(_ds(df, n_blocks), window=7).to_pandas() \
        .sort_values("day").reset_index(drop=True)
    day = (df.ts.astype("datetime64[us]").astype("int64")
           // (86400 * 10 ** 6))
    d = pd.DataFrame({"u": df.user_id, "day": day}).drop_duplicates()
    rows = []
    for g in sorted(d["day"].unique()):
        rows.append((g, d[(d.day >= g - 6) & (d.day <= g)]["u"]
                     .nunique()))
    exp = pd.DataFrame(rows, columns=["day", "n_users"])
    pd.testing.assert_frame_equal(out, exp, check_dtype=False)
    # the rolling count exceeds any single day's count somewhere
    daily = d.groupby("day")["u"].nunique()
    assert (out.set_index("day")["n_users"] >= daily).all()


@pytest.mark.parametrize("n_blocks", [1, 5])
def test_dataset_diff_statuses(ray_session, n_blocks):
    from mapshaper_ray.ops.relational import dataset_diff
    left = pd.DataFrame({
        "doc_id": np.arange(10, dtype=np.int64),
        "text": [f"t{i}" for i in range(10)]})
    right = pd.DataFrame({
        "doc_id": [0, 1, 2, 3, 5, 6, 7, 8, 9, 42],
        "text": ["t0", "CHANGED", "t2", "t3", "t5", "t6",
                 "t7", "t8", "CHANGED2", "new"]})
    out = dataset_diff(_ds(left, n_blocks), _ds(right, n_blocks),
                       key="doc_id", cols=["text"]).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    exp = pd.DataFrame({"doc_id": [1, 4, 9, 42],
                        "status": ["changed", "removed", "changed",
                                   "added"]})
    pd.testing.assert_frame_equal(
        out.astype({"doc_id": np.int64}), exp, check_dtype=False)


# ---------------------------------------------------------------------------
# cube_agg / edit1_pairs
# ---------------------------------------------------------------------------

def test_cube_agg_matches_pandas(ray_session):
    from mapshaper_ray.ops.relational import cube_agg
    rng = np.random.default_rng(12)
    df = pd.DataFrame({"a": rng.choice(["x", "y"], 300),
                       "b": rng.choice(["p", "q", "r"], 300),
                       "v": rng.integers(0, 100, 300)})
    out = cube_agg(_ds(df, 4), ["a", "b"],
                   {"n": ("v", "count"), "s": ("v", "sum")})
    # 2x3 finest + 2 + 3 + 1 = 12 rows
    assert len(out) == 12
    g = out.set_index(["a", "b"])
    assert g.loc[("(all)", "(all)"), "n"] == 300
    assert g.loc[("(all)", "(all)"), "s"] == df.v.sum()
    fx = df[df.a == "x"]
    assert g.loc[("x", "(all)"), "s"] == fx.v.sum()
    fq = df[df.b == "q"]
    assert g.loc[("(all)", "q"), "n"] == len(fq)
    fxq = df[(df.a == "x") & (df.b == "q")]
    assert g.loc[("x", "q"), "s"] == fxq.v.sum()


def _lev1(a, b):
    if a == b:
        return True
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    if la == lb:
        return sum(x != y for x, y in zip(a, b)) == 1
    if la > lb:
        a, b, la, lb = b, a, lb, la
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1:]


@pytest.mark.parametrize("n_blocks", [1, 6])
def test_edit1_pairs_bruteforce(ray_session, n_blocks):
    from mapshaper_ray.ops.dedup import edit1_pairs
    rng = np.random.default_rng(13)
    words = list({"".join(rng.choice(list("abc"), rng.integers(2, 6)))
                  for _ in range(120)})
    df = pd.DataFrame({"token": words})
    out = edit1_pairs(_ds(df, n_blocks)).to_pandas() \
        .sort_values(["a", "b"]).reset_index(drop=True)
    exp = sorted((min(u, v), max(u, v))
                 for i, u in enumerate(words)
                 for v in words[i + 1:] if _lev1(u, v))
    got = list(zip(out.a, out.b))
    assert got == exp
    assert len(exp) > 20          # the alphabet guarantees density


def test_edit1_pairs_duplicates_and_maxlen(ray_session):
    from mapshaper_ray.ops.dedup import edit1_pairs
    df = pd.DataFrame({"token": ["ab", "ab", "abc", "x" * 100]})
    out = edit1_pairs(_ds(df), max_len=10).to_pandas()
    assert sorted(zip(out.a, out.b)) == [("ab", "abc")]


# ---------------------------------------------------------------------------
# user_features
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("n_blocks", [1, 7])
def test_user_features_bruteforce(ray_session, n_blocks):
    from mapshaper_ray.ops.relational import user_features
    rng = np.random.default_rng(14)
    n = 1500
    df = pd.DataFrame({
        "user_id": rng.integers(0, 50, n),
        "ts": pd.to_datetime("2024-01-01") + pd.to_timedelta(
            rng.choice(20 * 86400 * 10 ** 6, n, replace=False),
            unit="us")})
    out = user_features(_ds(df, n_blocks)).to_pandas() \
        .sort_values("user_id").reset_index(drop=True)
    rows = []
    for u, g in df.groupby("user_id"):
        ts = np.sort(g.ts.astype("datetime64[us]")
                     .astype("int64").to_numpy())
        gaps = np.diff(ts)
        day = ts // (86400 * 10 ** 6)
        rows.append((
            u, len(ts),
            1 + int((gaps > 4 * 3600 * 10 ** 6).sum()),
            len(np.unique(day)), int(day[-1]),
            float(np.median(gaps)) if len(gaps) else -1.0))
    exp = pd.DataFrame(rows, columns=[
        "user_id", "n_events", "n_sessions", "days_active",
        "last_day", "median_gap_us"]) \
        .sort_values("user_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(out.astype({"user_id": np.int64}),
                                  exp.astype({"user_id": np.int64}),
                                  check_dtype=False)


def test_user_features_single_event_user(ray_session):
    from mapshaper_ray.ops.relational import user_features
    df = pd.DataFrame({"user_id": [7],
                       "ts": [pd.to_datetime("2024-01-03 12:00")]})
    out = user_features(_ds(df)).to_pandas()
    r = out.iloc[0]
    assert (r.n_events, r.n_sessions, r.days_active) == (1, 1, 1)
    assert r.median_gap_us == -1.0


# ---------------------------------------------------------------------------
# composite-key hash_join_bucketed
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("how", ["inner", "left", "semi", "anti"])
def test_hash_join_bucketed_multikey(ray_session, how):
    from mapshaper_ray.ops.relational import hash_join_bucketed
    rng = np.random.default_rng(15)
    left = pd.DataFrame({"k1": rng.integers(0, 8, 300),
                         "k2": rng.choice(["a", "b", "c"], 300),
                         "lv": np.arange(300)})
    right = pd.DataFrame({"k1": rng.integers(0, 8, 60),
                          "k2": rng.choice(["a", "b", "d"], 60),
                          "rv": np.arange(60)}).drop_duplicates(
                              ["k1", "k2"])
    out = hash_join_bucketed(_ds(left, 4), _ds(right, 3),
                             on=["k1", "k2"], how=how).to_pandas()
    if how in ("semi", "anti"):
        idx = pd.MultiIndex.from_frame(left[["k1", "k2"]])
        hit = np.asarray(idx.isin(
            pd.MultiIndex.from_frame(right[["k1", "k2"]])))
        exp = left[hit] if how == "semi" else left[~hit]
        assert sorted(out["lv"]) == sorted(exp["lv"])
    else:
        exp = left.merge(right, on=["k1", "k2"], how=how)
        assert len(out) == len(exp)
        a = out.sort_values(["lv"]).reset_index(drop=True)
        b = exp.sort_values(["lv"]).reset_index(drop=True)
        av = a["rv"].fillna(-1).to_numpy(np.float64)
        bv = b["rv"].fillna(-1).to_numpy(np.float64)
        assert np.array_equal(np.sort(av), np.sort(bv))


# ---------------------------------------------------------------------------
# grouped weighted_sample / histogram
# ---------------------------------------------------------------------------

def test_weighted_sample_grouped(ray_session):
    import math
    from mapshaper_ray.ops.relational import weighted_sample
    from mapshaper_ray.stages.text import md5_lo64
    df = pd.DataFrame({
        "doc_id": np.arange(600, dtype=np.int64),
        "g": np.array(["a", "b", "c"])[np.arange(600) % 3],
        "w": (np.arange(600) % 9 + 1).astype(np.int64)})
    out = weighted_sample(_ds(df, 5), 10, "w", group_col="g")
    assert out.groupby("g").size().tolist() == [10, 10, 10]
    # per-group winners match the global key ranking within the group
    h = md5_lo64([f"s0:{i}" for i in df.doc_id])
    u = (h.astype(np.float64) + 1.0) / 2.0 ** 64
    L = np.array([math.floor(math.log(x) * 1e9) for x in u],
                 dtype=np.float64)
    key = L / df.w.to_numpy(np.float64)
    for g in ["a", "b", "c"]:
        m = (df.g == g).to_numpy()
        order = np.lexsort((df.doc_id.to_numpy()[m], -key[m]))[:10]
        exp_ids = df.doc_id.to_numpy()[m][order]
        got = out[out.g == g]["doc_id"].to_numpy()
        assert np.array_equal(np.sort(got), np.sort(exp_ids))
    # partition invariance
    out2 = weighted_sample(_ds(df, 1), 10, "w", group_col="g")
    pd.testing.assert_frame_equal(out.reset_index(drop=True),
                                  out2.reset_index(drop=True))


@pytest.mark.parametrize("n_blocks", [1, 6])
def test_histogram_bruteforce(ray_session, n_blocks):
    from mapshaper_ray.ops.relational import histogram
    rng = np.random.default_rng(16)
    v = np.concatenate([rng.normal(10, 3, 900), [np.nan] * 20])
    df = pd.DataFrame({"value": v})
    out = histogram(_ds(df, n_blocks), "value", bins=16)
    vv = v[~np.isnan(v)]
    mn, mx = vv.min(), vv.max()
    b = np.clip(np.floor((vv - mn) / (mx - mn) * 16).astype(int),
                0, 15)
    exp = np.bincount(b, minlength=16)
    assert out["n"].tolist() == exp.tolist()
    assert out["n"].sum() == len(vv)
    assert out["lo"][0] == mn and abs(out["hi"][15] - mx) < 1e-9


# ---------------------------------------------------------------------------
# ntile / event_sequences
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("n_blocks,n", [(1, 4), (7, 10)])
def test_ntile_bruteforce(ray_session, n_blocks, n):
    from mapshaper_ray.ops.rank import ntile
    rng = np.random.default_rng(17)
    df = pd.DataFrame({"id": np.arange(777, dtype=np.int64),
                       "v": rng.choice([1.5, 2.5, 3.5, 9.0], 777)})
    out = ntile(_ds(df, n_blocks), "v", "id", n).to_pandas() \
        .sort_values("id").reset_index(drop=True)
    order = np.lexsort((df.id.to_numpy(), df.v.to_numpy()))
    rn = np.empty(777, dtype=np.int64)
    rn[order] = np.arange(777) + 1
    exp_tile = ((rn - 1) * n) // 777 + 1
    assert out["tile"].tolist() == exp_tile[np.argsort(
        df.id.to_numpy())].tolist()
    # NTILE size contract: first N%n tiles one row larger
    sizes = out.groupby("tile").size()
    assert sizes.max() - sizes.min() <= 1
    assert sizes.sum() == 777


@pytest.mark.parametrize("n_blocks", [1, 7])
def test_event_sequences_bruteforce(ray_session, n_blocks):
    from mapshaper_ray.ops.relational import event_sequences
    rng = np.random.default_rng(18)
    n = 900
    df = pd.DataFrame({
        "user_id": rng.integers(0, 25, n),
        "event_type": rng.choice(["a", "b", "c"], n),
        "ts": pd.to_datetime("2024-01-01") + pd.to_timedelta(
            rng.choice(10 ** 9, n, replace=False), unit="us")})
    out = event_sequences(_ds(df, n_blocks), k=3)
    cnt = {}
    for _, g in df.groupby("user_id"):
        t = g.sort_values("ts")["event_type"].tolist()
        for i in range(len(t) - 2):
            cnt[tuple(t[i:i + 3])] = cnt.get(tuple(t[i:i + 3]), 0) + 1
    exp = pd.DataFrame([(a, b, c, v)
                        for (a, b, c), v in cnt.items()],
                       columns=["s1", "s2", "s3", "n"]) \
        .sort_values(["n", "s1", "s2", "s3"],
                     ascending=[False, True, True, True],
                     kind="mergesort").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, exp, check_dtype=False)
