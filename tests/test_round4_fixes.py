"""Round-4 regression + property tests: partition-invariance of the
newest operator band (soft-dedup weights, latest-capture top-1,
tile-lang-mix) under adversarial partitionings, plus the lm_nll auto
gate and the vectorized triangle wedge emit (covered in test_cluster /
test_graph respectively — here the q84-q87 composition band)."""

import numpy as np
import pandas as pd
import ray.data as rd

from mapshaper_ray.ops.dedup import soft_dedup_weights
from mapshaper_ray.ops.relational import grouped_topk, groupby_agg


def _adversarial_layouts(df, seed):
    """Yield the same table under hostile layouts: one block, many
    tiny blocks, reverse order, and a seeded shuffle split unevenly."""
    rng = np.random.default_rng(seed)
    yield rd.from_pandas(df)
    yield rd.from_pandas(df).repartition(17)
    yield rd.from_pandas(df.iloc[::-1].reset_index(drop=True)) \
        .repartition(5)
    perm = rng.permutation(len(df))
    yield rd.from_pandas(df.iloc[perm].reset_index(drop=True)) \
        .repartition(31)


def test_soft_dedup_weights_brute_and_partition_invariance():
    # planted clusters: 3 exact families of sizes 4/3/2 + singletons
    rng = np.random.default_rng(41)
    texts = []
    for i in range(200):
        if i < 4:
            texts.append("alpha beta gamma delta epsilon zeta " * 6)
        elif i < 7:
            texts.append("one two three four five six seven " * 6)
        elif i < 9:
            texts.append("red green blue cyan magenta yellow " * 6)
        else:
            texts.append(" ".join(
                f"w{rng.integers(0, 50000)}" for _ in range(40)))
    df = pd.DataFrame({"doc_id": np.arange(200, dtype=np.int64),
                       "text": texts})

    # brute expectation with an explicit pair table (the operator's
    # clustering itself is q48-validated; here we pin the weighting)
    pairs = pd.DataFrame({
        "id_a": [0, 1, 2, 4, 5, 7],
        "id_b": [1, 2, 3, 5, 6, 8]})
    want = np.ones(200)
    want[[0, 1, 2, 3]] = 0.25
    want[[4, 5, 6]] = round(1 / 3, 6)
    want[[7, 8]] = 0.5

    outs = []
    for i, ds in enumerate(_adversarial_layouts(df, 43)):
        out = soft_dedup_weights(ds, pairs=pairs).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        np.testing.assert_allclose(out["dup_weight"].to_numpy(), want,
                                   rtol=0, atol=5e-7)
        outs.append(out)
    for o in outs[1:]:
        pd.testing.assert_frame_equal(outs[0], o)

    # end-to-end (LSH-discovered pairs) must also be layout-invariant
    e2e = [soft_dedup_weights(ds, threshold=0.4).to_pandas()
           .sort_values("doc_id").reset_index(drop=True)
           for ds in _adversarial_layouts(df, 47)]
    for o in e2e[1:]:
        pd.testing.assert_frame_equal(e2e[0], o)
    # the planted exact families must be down-weighted in e2e too
    assert (e2e[0]["dup_weight"].to_numpy()[:9] < 1.0).all()


def test_latest_capture_topk_partition_invariance_with_ties():
    # 60 urls x 5 captures; some urls carry DUPLICATE max timestamps
    # so tie_col decides — the adversarial case for per-batch partials
    rows = []
    for u in range(60):
        for c in range(5):
            ts = 1000 + (c if u % 3 else min(c, 3))  # u%3==0: tie at 3
            rows.append((f"https://s{u}.example/p", u * 10 + c, ts,
                         f"body {u} {c}"))
    df = pd.DataFrame(rows, columns=["url", "cap_id", "ts_ms", "text"])

    def brute(d):
        d = d.sort_values(["url", "ts_ms", "cap_id"],
                          ascending=[True, False, True],
                          kind="mergesort")
        return d.groupby("url", sort=False).head(1) \
            .sort_values("url").reset_index(drop=True)

    want = brute(df)
    for ds in _adversarial_layouts(df, 53):
        got = grouped_topk(ds, "url", "ts_ms", 1, tie_col="cap_id") \
            .to_pandas().sort_values("url").reset_index(drop=True)
        pd.testing.assert_frame_equal(
            got[["url", "cap_id", "ts_ms", "text"]],
            want[["url", "cap_id", "ts_ms", "text"]])
        # the tie rows must have kept the LOWEST cap_id capture
        t0 = got[got["url"] == "https://s0.example/p"]
        assert int(t0["cap_id"].iloc[0]) == 3  # caps 3,4 tie at ts=1003


def test_tile_lang_mix_partition_invariance():
    from mapshaper_ray.stages.geocode import geocode
    from mapshaper_ray.stages.tiles import assign_cells
    rng = np.random.default_rng(59)
    langs = np.array(["en", "de", "fr", "pt", "ja"])
    df = pd.DataFrame({
        "doc_id": np.arange(3000, dtype=np.int64),
        "text": [f"page body {i} tok{i % 17}" for i in range(3000)],
        "n_chars": rng.integers(10, 500, 3000).astype(np.int64),
        "lang": langs[rng.integers(0, 5, 3000)]})
    outs = []
    for ds in _adversarial_layouts(df, 61):
        cells = assign_cells(geocode(ds))
        out = groupby_agg(cells, ["tile", "lang"],
                          {"n_pages": ("doc_id", "count")}).to_pandas() \
            .sort_values(["tile", "lang"]).reset_index(drop=True)
        outs.append(out)
    assert int(outs[0]["n_pages"].sum()) == 3000
    for o in outs[1:]:
        pd.testing.assert_frame_equal(outs[0], o)
