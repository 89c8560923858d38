"""Round-5 operator batch: KMV/theta sketch, per-group Pearson corr,
SCD-2 intervals, time-weighted average, salted skew join — brute-force
equivalence + adversarial partition invariance for each."""
import numpy as np
import pandas as pd
import pytest
import ray.data as rd


def _layouts(df, seed=7):
    rng = np.random.default_rng(seed)
    yield rd.from_pandas(df)
    yield rd.from_pandas(df).repartition(13)
    perm = rng.permutation(len(df))
    yield rd.from_pandas(df.iloc[perm].reset_index(drop=True)) \
        .repartition(29)


# ------------------------------------------------------------- KMV

def test_kmv_exact_below_k(ray_session):
    from mapshaper_ray.ops.sketch import kmv_build, kmv_estimate
    df = pd.DataFrame({"v": [f"x{i % 40}" for i in range(500)]})
    for ds in _layouts(df):
        sk = kmv_build(ds, "v", k=256)
        assert kmv_estimate(sk, 256) == 40  # < k distinct -> exact


def test_kmv_estimator_and_partition_invariance(ray_session):
    from mapshaper_ray.ops.sketch import kmv_build, kmv_estimate
    df = pd.DataFrame({"v": [f"item-{i}" for i in range(5000)]})
    sks = [kmv_build(ds, "v", k=128) for ds in _layouts(df, 9)]
    for sk in sks[1:]:
        assert np.array_equal(sks[0], sk)  # sketch itself invariant
    est = kmv_estimate(sks[0], 128)
    assert 3500 < est < 6500  # ~1/sqrt(k) relative error


def test_kmv_set_stats_matches_exact_on_overlapping_sets(ray_session):
    from mapshaper_ray.ops.sketch import kmv_build, kmv_set_stats
    a = pd.DataFrame({"v": [f"d{i}" for i in range(0, 3000, 2)]})
    b = pd.DataFrame({"v": [f"d{i}" for i in range(0, 3000, 3)]})
    k = 128
    ska = kmv_build(rd.from_pandas(a).repartition(5), "v", k)
    skb = kmv_build(rd.from_pandas(b).repartition(7), "v", k)
    st = kmv_set_stats(ska, skb, k)
    # truth: |A|=1500, |B|=1000, |A u B|=2000, |A ^ B|=500
    assert abs(st["n_a_est"] - 1500) / 1500 < 0.25
    assert abs(st["n_b_est"] - 1000) / 1000 < 0.25
    assert abs(st["union_est"] - 2000) / 2000 < 0.25
    assert abs(st["inter_est"] - 500) / 500 < 0.45
    # union merge == sketch built over the concatenation
    sku = kmv_build(rd.from_pandas(pd.concat([a, b])), "v", k)
    from mapshaper_ray.ops.sketch import kmv_union
    assert np.array_equal(kmv_union(ska, skb, k), sku)


# ------------------------------------------------------ group_corr

def test_group_corr_brute_force_and_invariance(ray_session):
    from mapshaper_ray.ops.relational import group_corr
    rng = np.random.default_rng(4)
    n = 800
    k = rng.choice(["a", "b", "c"], n)
    x = rng.integers(0, 24, n).astype(np.float64)
    y = np.round(x * 2.5 + rng.normal(0, 5, n), 2)
    df = pd.DataFrame({"k": k, "x": x, "y": y})
    outs = [group_corr(ds, "k", "x", "y", x_qscale=1, y_qscale=100)
            for ds in _layouts(df, 11)]
    for o in outs[1:]:
        pd.testing.assert_frame_equal(outs[0], o)
    # brute force on quantized values
    for key, g in df.groupby("k"):
        xi = np.floor(g["x"]).astype(np.int64)
        yi = np.floor(g["y"] * 100).astype(np.int64)
        r = np.corrcoef(xi, yi)[0, 1]
        got = outs[0].set_index("k").loc[key, "r"]
        assert abs(got - r) < 1e-6
        assert got > 0.9  # strongly correlated by construction


def test_group_corr_zero_variance_group_dropped(ray_session):
    from mapshaper_ray.ops.relational import group_corr
    df = pd.DataFrame({"k": ["c0"] * 5 + ["ok"] * 5,
                       "x": [3.0] * 5 + [1, 2, 3, 4, 5],
                       "y": [1, 2, 3, 4, 5] * 2})
    out = group_corr(rd.from_pandas(df), "k", "x", "y")
    assert out["k"].tolist() == ["ok"]


# ------------------------------------------------ scd2 / tw average

def _events(n=600, seed=3):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "user_id": rng.integers(0, 12, n).astype(np.int64),
        "ts": pd.to_datetime(rng.integers(0, 10 ** 6, n), unit="s"),
        "value": np.round(rng.uniform(0, 50, n), 2)})


def test_scd2_intervals_brute_force_and_invariance(ray_session):
    from mapshaper_ray.ops.relational import scd2_intervals
    df = _events()
    outs = []
    for ds in _layouts(df, 13):
        o = scd2_intervals(ds, "user_id", "ts", "value").to_pandas() \
            .sort_values(["user_id", "valid_from", "v_q"]) \
            .reset_index(drop=True)
        outs.append(o)
    for o in outs[1:]:
        pd.testing.assert_frame_equal(outs[0], o)
    exp = df.copy()
    exp["v_q"] = np.floor(exp["value"] * 100).astype(np.int64)
    exp = exp.sort_values(["user_id", "ts", "v_q"]) \
        .reset_index(drop=True)
    nxt = exp.groupby("user_id")["ts"].shift(-1)
    exp["valid_to"] = nxt.fillna(pd.Timestamp("2100-01-01"))
    exp = exp.rename(columns={"ts": "valid_from"})[
        ["user_id", "valid_from", "valid_to", "v_q"]]
    got = outs[0].astype({"valid_from": "datetime64[ns]",
                          "valid_to": "datetime64[ns]"})
    pd.testing.assert_frame_equal(got, exp)


def test_time_weighted_avg_brute_force(ray_session):
    from mapshaper_ray.ops.relational import time_weighted_avg
    df = _events(400, 8)
    outs = []
    for ds in _layouts(df, 14):
        o = time_weighted_avg(ds, "user_id", "ts", "value") \
            .to_pandas().sort_values("user_id") \
            .reset_index(drop=True)
        outs.append(o)
    for o in outs[1:]:
        pd.testing.assert_frame_equal(outs[0], o)
    q = np.floor(df["value"] * 100).astype(np.int64)
    e = df["ts"].astype("datetime64[us]").astype(np.int64)
    b = pd.DataFrame({"u": df["user_id"], "e": e, "q": q}) \
        .sort_values(["u", "e", "q"]).reset_index(drop=True)
    for u, g in b.groupby("u"):
        dt = np.diff(g["e"].to_numpy())
        wsum = int((g["q"].to_numpy()[:-1] * dt).sum()) if len(g) > 1 \
            else 0
        row = outs[0].set_index("user_id").loc[u]
        assert row["n"] == len(g)
        assert row["span_us"] == int(g["e"].max() - g["e"].min())
        assert row["wsum"] == wsum


def test_time_weighted_single_observation_user(ray_session):
    from mapshaper_ray.ops.relational import time_weighted_avg
    df = pd.DataFrame({"user_id": [7], "ts": [pd.Timestamp("2024-01-01")],
                       "value": [3.5]})
    out = time_weighted_avg(rd.from_pandas(df), "user_id", "ts",
                            "value").to_pandas()
    assert out.iloc[0].tolist() == [7, 1, 0, 0]


# ------------------------------------------------------ salted join

def test_salted_join_equals_plain_join(ray_session):
    from mapshaper_ray.ops.relational import (hash_join_bucketed,
                                              hash_join_salted)
    rng = np.random.default_rng(17)
    n = 20000
    k = np.where(rng.integers(0, 10, n) < 6, 0,
                 rng.integers(1, 25, n)).astype(np.int64)
    left = pd.DataFrame({"key": k,
                         "v": rng.integers(0, 100, n).astype(np.int64)})
    right = pd.DataFrame({"key": np.arange(25, dtype=np.int64),
                          "label": [f"L{i}" for i in range(25)]})

    def agg(ds):
        return ds.to_pandas().groupby("label", as_index=False) \
            .agg(n=("v", "size"), s=("v", "sum")) \
            .sort_values("label").reset_index(drop=True) \
            .astype({"n": np.int64, "s": np.int64})

    plain = agg(hash_join_bucketed(rd.from_pandas(left),
                                   rd.from_pandas(right), on="key"))
    for hot_min in (100, 10 ** 9):  # salted path, then forced-cold
        salted = agg(hash_join_salted(
            rd.from_pandas(left).repartition(9),
            rd.from_pandas(right), on="key",
            n_salt=8, hot_min_count=hot_min))
        pd.testing.assert_frame_equal(salted, plain)


def test_salted_join_spreads_hot_key(ray_session):
    # the hot key's left rows must actually land in >1 salt value
    from mapshaper_ray.ops.relational import hash_join_salted
    import ray
    n = 5000
    left = pd.DataFrame({"key": np.zeros(n, np.int64),
                         "v": np.arange(n, dtype=np.int64)})
    right = pd.DataFrame({"key": [0], "label": ["hot"]})
    out = hash_join_salted(rd.from_pandas(left).repartition(4),
                           rd.from_pandas(right), on="key",
                           n_salt=8, hot_min_count=100).to_pandas()
    assert len(out) == n
    assert set(out["label"]) == {"hot"}


# --------------------------------------------- connected components

def test_cluster_pairs_local_gate_equals_distributed(ray_session):
    # the count-gated driver union-find and the star-contraction path
    # must label identically (forced via the env cap)
    import os

    from mapshaper_ray.ops.dedup import cluster_pairs
    rng = np.random.default_rng(19)
    a = rng.integers(0, 300, 400).astype(np.int64)
    b = rng.integers(0, 300, 400).astype(np.int64)
    keep = a != b
    df = pd.DataFrame({"id_a": a[keep], "id_b": b[keep]})
    local = cluster_pairs(rd.from_pandas(df).repartition(7)) \
        .to_pandas().sort_values("node").reset_index(drop=True)
    os.environ["MAPSHAPER_RAY_CC_LOCAL_CAP"] = "0"
    try:
        dist = cluster_pairs(rd.from_pandas(df).repartition(7)) \
            .to_pandas().sort_values("node").reset_index(drop=True)
    finally:
        del os.environ["MAPSHAPER_RAY_CC_LOCAL_CAP"]
    pd.testing.assert_frame_equal(
        local.astype({"node": np.int64, "cluster_id": np.int64}),
        dist.astype({"node": np.int64, "cluster_id": np.int64}))


# ------------------------------------------------ interval overlap

def test_interval_overlap_join_brute_force(ray_session):
    from mapshaper_ray.ops.relational import interval_overlap_join
    rng = np.random.default_rng(23)
    na, nb = 300, 40
    a_lo = rng.integers(0, 10 ** 6, na)
    a_len = rng.integers(0, 5000, na)
    b_lo = rng.integers(0, 10 ** 6, nb)
    b_len = rng.integers(0, 200_000, nb)
    A = pd.DataFrame({"a_id": np.arange(na, dtype=np.int64),
                      "t_start": a_lo.astype("datetime64[us]"),
                      "t_end": (a_lo + a_len).astype("datetime64[us]")})
    B = pd.DataFrame({"b_id": np.arange(nb, dtype=np.int64),
                      "t_start": b_lo.astype("datetime64[us]"),
                      "t_end": (b_lo + b_len).astype("datetime64[us]")})
    exp_rows = []
    for i in range(na):
        for j in range(nb):
            lo = max(a_lo[i], b_lo[j])
            hi = min(a_lo[i] + a_len[i], b_lo[j] + b_len[j])
            if lo <= hi:
                exp_rows.append((i, j, hi - lo))
    exp = pd.DataFrame(exp_rows, columns=["a_id", "b_id",
                                          "overlap_us"]) \
        .astype(np.int64).sort_values(["a_id", "b_id"]) \
        .reset_index(drop=True)
    for cell in (1000, 50_000, 10 ** 7):  # tiny, medium, one-cell
        got = interval_overlap_join(
            rd.from_pandas(A).repartition(5),
            rd.from_pandas(B).repartition(3),
            left_cols=("a_id",), right_cols=("b_id",),
            cell_us=cell).to_pandas() \
            .astype({"a_id": np.int64, "b_id": np.int64,
                     "overlap_us": np.int64}) \
            .sort_values(["a_id", "b_id"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, exp)


# -------------------------------------------------------- profiler

def test_profile_columns_brute_force(ray_session):
    from mapshaper_ray.ops.relational import profile_columns
    df = pd.DataFrame({
        "i": [1, 2, 2, 3, None, None],
        "s": ["a", "b", "a", None, "c", "a"]})
    for ds in _layouts(df, 29):
        out = profile_columns(ds, ["i", "s"])
        assert out["column"].tolist() == ["i", "s"]
        assert out["n"].tolist() == [6, 6]
        assert out["n_null"].tolist() == [2, 1]
        assert out["n_distinct"].tolist() == [3, 3]


# ------------------------------------------------------------- cdc

def test_cdc_apply_brute_force_and_invariance(ray_session):
    from mapshaper_ray.ops.relational import cdc_apply
    rng = np.random.default_rng(31)
    n = 500
    df = pd.DataFrame({
        "entity": rng.integers(0, 20, n).astype(np.int64),
        "ts": pd.to_datetime(rng.integers(0, 10 ** 5, n), unit="s"),
        "op": np.where(rng.integers(0, 4, n) == 0, "D", "U")
        .astype(object),
        "value": np.round(rng.uniform(0, 100, n), 2)})
    outs = []
    for ds in _layouts(df, 37):
        o = cdc_apply(ds, "entity", "ts", "op", "value").to_pandas() \
            .astype({"entity": np.int64, "v_q": np.int64}) \
            .sort_values("entity").reset_index(drop=True)
        outs.append(o)
    for o in outs[1:]:
        pd.testing.assert_frame_equal(outs[0], o)
    b = df.copy()
    b["v_q"] = np.floor(b["value"] * 100).astype(np.int64)
    b = b.sort_values(["entity", "ts", "v_q", "op"],
                      kind="mergesort")
    last = b.groupby("entity").tail(1)
    exp = last[last["op"] != "D"][["entity", "v_q"]] \
        .sort_values("entity").reset_index(drop=True) \
        .astype({"entity": np.int64, "v_q": np.int64})
    pd.testing.assert_frame_equal(outs[0], exp)


# ------------------------------------------------------- hex cells

def test_hex_cells_containment_and_roundtrip():
    from mapshaper_ray.cells import hex_center, lonlat_to_hex
    rng = np.random.default_rng(41)
    lon = rng.uniform(-179, 179, 50000)
    lat = rng.uniform(-85, 85, 50000)
    for size in (0.5, 2.0, 5.0):
        q, r = lonlat_to_hex(lon, lat, size)
        cl, ct = hex_center(q, r, size)
        # every point within one circumradius of its assigned center
        assert (np.hypot(lon - cl, lat - ct) / size).max() < 1.0001
        # centers land in their own cell
        q2, r2 = lonlat_to_hex(cl, ct, size)
        assert np.array_equal(q, q2) and np.array_equal(r, r2)


def test_hex_assignment_is_nearest_center():
    # cube rounding == nearest hex center (up to boundary ties)
    from mapshaper_ray.cells import hex_center, lonlat_to_hex
    rng = np.random.default_rng(43)
    lon = rng.uniform(-30, 30, 2000)
    lat = rng.uniform(-30, 30, 2000)
    q, r = lonlat_to_hex(lon, lat, 3.0)
    cl, ct = hex_center(q, r, 3.0)
    d_own = np.hypot(lon - cl, lat - ct)
    # compare against the 6 neighbors
    for dq, dr in [(1, 0), (-1, 0), (0, 1), (0, -1), (1, -1),
                   (-1, 1)]:
        nl, nt = hex_center(q + dq, r + dr, 3.0)
        d_n = np.hypot(lon - nl, lat - nt)
        assert (d_own <= d_n + 1e-9).all()


# ------------------------------------------------- compaction plan

def test_compaction_plan_bins_bounded_and_invariant(ray_session):
    from mapshaper_ray.ops.relational import compaction_plan
    rng = np.random.default_rng(47)
    df = pd.DataFrame({
        "f": [f"part-{i:04d}" for i in range(300)],
        "sz": rng.integers(1, 40_000, 300).astype(np.int64)})
    outs = [compaction_plan(ds, "f", "sz", target_bytes=100_000)
            for ds in _layouts(df, 49)]
    for o in outs[1:]:
        pd.testing.assert_frame_equal(outs[0], o)
    out = outs[0]
    # every bin except possibly the last holds >= target once closed:
    # linear packing guarantees bin totals in [target - max_size + 1,
    # target + max_size)
    tot = out.groupby("bin")["size"].sum()
    mx = int(out["size"].max())
    assert (tot.iloc[:-1] >= 100_000 - mx).all()
    assert (tot < 100_000 + mx).all()
    # all files planned exactly once
    assert sorted(out["file"]) == sorted(df["f"])


# -------------------------------------- grouped window / event gaps

def test_grouped_rolling_sum_brute_force_and_invariance(ray_session):
    from mapshaper_ray.ops.relational import grouped_rolling_sum
    df = _events(500, 51)
    df["eid"] = np.arange(len(df), dtype=np.int64)
    outs = []
    for ds in _layouts(df, 53):
        o = grouped_rolling_sum(ds, "user_id", ["ts", "eid"],
                                "value", window=4).to_pandas() \
            .sort_values("eid").reset_index(drop=True)[
            ["eid", "wsum_q"]]
        outs.append(o)
    for o in outs[1:]:
        pd.testing.assert_frame_equal(outs[0], o)
    b = df.copy()
    b["q"] = np.floor(b["value"] * 100).astype(np.int64)
    b = b.sort_values(["user_id", "ts", "eid"], kind="mergesort")
    b["exp"] = b.groupby("user_id")["q"] \
        .transform(lambda s: s.rolling(4, min_periods=1).sum()) \
        .astype(np.int64)
    exp = b.sort_values("eid")[["eid", "exp"]] \
        .rename(columns={"exp": "wsum_q"}).reset_index(drop=True)
    pd.testing.assert_frame_equal(outs[0], exp)


def test_event_gaps_brute_force(ray_session):
    from mapshaper_ray.ops.relational import event_gaps
    df = _events(400, 57)
    df["eid"] = np.arange(len(df), dtype=np.int64)
    got = event_gaps(rd.from_pandas(df).repartition(11),
                     "user_id", "ts", "eid").to_pandas() \
        .sort_values("eid").reset_index(drop=True)
    b = df.sort_values(["user_id", "ts", "eid"], kind="mergesort") \
        .reset_index(drop=True)
    d = b.groupby("user_id")["ts"].diff()
    gap = (d / pd.Timedelta(microseconds=1)).fillna(-1) \
        .astype(np.int64)
    exp = pd.DataFrame({"eid": b["eid"].to_numpy(),
                        "gap_us": gap.to_numpy()}) \
        .sort_values("eid").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["eid", "gap_us"]].astype({"gap_us": np.int64}), exp)


# ---------------------------------------- crawl waves / MAD outliers

def test_crawl_waves_per_host_cap_and_invariance(ray_session):
    from mapshaper_ray.stages.pages import crawl_waves
    rng = np.random.default_rng(61)
    n = 400
    df = pd.DataFrame({
        "host": ("h" + pd.Series(rng.integers(0, 7, n)).astype(str)),
        "url": [f"u{i:05d}" for i in rng.permutation(n)]})
    outs = [crawl_waves(ds, per_wave=3).to_pandas()
            .sort_values("url").reset_index(drop=True)
            for ds in _layouts(df, 63)]
    for o in outs[1:]:
        pd.testing.assert_frame_equal(outs[0], o)
    out = outs[0]
    # per (host, wave): at most per_wave urls, slots 0..k unique
    g = out.groupby(["host", "wave"])["slot"]
    assert (g.count() <= 3).all()
    assert (g.nunique() == g.count()).all()
    # rank order: within a host, urls sort ascending across waves
    for h, gh in out.groupby("host"):
        gh = gh.sort_values(["wave", "slot"])
        assert gh["url"].is_monotonic_increasing


def test_group_mad_outliers_brute_force(ray_session):
    from mapshaper_ray.ops.relational import group_mad_outliers
    rng = np.random.default_rng(67)
    n = 600
    df = pd.DataFrame({
        "k": rng.choice(["a", "b"], n),
        "id": np.arange(n, dtype=np.int64),
        "v": np.round(rng.normal(100, 5, n), 2)})
    df.loc[:10, "v"] = 10_000.0  # gross outliers that inflate sigma
    outs = [group_mad_outliers(ds, "k", "v", "id", k=3)
            for ds in _layouts(df, 69)]
    for o in outs[1:]:
        pd.testing.assert_frame_equal(outs[0], o)
    out = outs[0]
    # every planted outlier flagged
    assert set(df.loc[:10, "id"]) <= set(out["id"])
    # brute force per group
    q = np.floor(df["v"] * 100).astype(np.int64)
    for key, g in df.assign(q=q).groupby("k"):
        gs = g.sort_values(["q", "id"], kind="mergesort")
        med = int(gs["q"].iloc[(len(gs) - 1) // 2])
        dev = (g["q"] - med).abs()
        gd = g.assign(dev=dev).sort_values(["dev", "id"],
                                           kind="mergesort")
        mad = int(gd["dev"].iloc[(len(gd) - 1) // 2])
        exp_ids = sorted(g[dev > 3 * mad]["id"])
        assert sorted(out[out["k"] == key]["id"]) == exp_ids


def test_salted_join_string_keys_and_anti(ray_session):
    # string hot key + how="anti" passthrough both preserve semantics
    from mapshaper_ray.ops.relational import (hash_join_bucketed,
                                              hash_join_salted)
    rng = np.random.default_rng(71)
    n = 8000
    k = np.where(rng.integers(0, 10, n) < 7, "hot",
                 "cold" + pd.Series(rng.integers(0, 9, n)).astype(str))
    left = pd.DataFrame({"key": k.astype(object),
                         "v": np.arange(n, dtype=np.int64)})
    right = pd.DataFrame({"key": ["hot", "cold3", "cold7"],
                          "label": ["H", "C3", "C7"]})
    plain = hash_join_bucketed(rd.from_pandas(left),
                               rd.from_pandas(right),
                               on="key").to_pandas() \
        .sort_values("v").reset_index(drop=True)
    salted = hash_join_salted(rd.from_pandas(left).repartition(6),
                              rd.from_pandas(right), on="key",
                              n_salt=4, hot_min_count=500) \
        .to_pandas().sort_values("v").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        salted[plain.columns.tolist()], plain)


# ----------------------------------- PPR / agg_update / jsonl

def test_personalized_pagerank_properties(ray_session):
    from mapshaper_ray.ops.graph import (pagerank_broadcast,
                                         personalized_pagerank)
    rng = np.random.default_rng(73)
    n = 200
    edges = pd.DataFrame({
        "src": np.repeat(np.arange(n, dtype=np.int64), 3),
        "dst": rng.integers(0, n, 3 * n).astype(np.int64)})
    nodes = pd.DataFrame({"node": np.arange(n, dtype=np.int64)})
    e = rd.from_pandas(edges).repartition(5)
    nn = rd.from_pandas(nodes)
    ppr = personalized_pagerank(e, nn, seeds=[0, 17, 34],
                                iters=4).to_pandas()
    assert abs(ppr["rank"].sum() - 1.0) < 1e-9  # mass conserved
    # seeds-everywhere == global pagerank (uniform teleport)
    ppr_all = personalized_pagerank(e, nn, seeds=range(n),
                                    iters=4).to_pandas()
    pr = pagerank_broadcast(e, nn, iters=4).to_pandas()
    assert np.allclose(ppr_all["rank"], pr["rank"], atol=1e-12)
    # seed proximity: a seed outranks its global-pagerank self
    assert ppr.set_index("node").loc[0, "rank"] > \
        pr.set_index("node").loc[0, "rank"]


def test_agg_update_equals_from_scratch(ray_session):
    from mapshaper_ray.ops.relational import agg_update, groupby_agg
    rng = np.random.default_rng(79)
    n = 500
    df = pd.DataFrame({"k": rng.choice(["a", "b", "c"], n),
                       "q": rng.integers(-50, 50, n)
                       .astype(np.int64)})
    aggs = {"n": ("q", "count"), "s": ("q", "sum"),
            "lo": ("q", "min"), "hi": ("q", "max")}
    full = groupby_agg(rd.from_pandas(df), ["k"], aggs,
                       final="distributed").to_pandas() \
        .sort_values("k").reset_index(drop=True)
    for cut in (100, 499):
        base = groupby_agg(rd.from_pandas(df.iloc[:cut]), ["k"],
                           aggs, final="distributed").to_pandas()
        got = agg_update(base,
                         rd.from_pandas(df.iloc[cut:]
                                        .reset_index(drop=True))
                         .repartition(7),
                         ["k"], aggs)
        pd.testing.assert_frame_equal(
            got.astype(full.dtypes.to_dict()), full)


def test_jsonl_roundtrip_hostile_strings(ray_session):
    from mapshaper_ray.sources.jsonl import read_jsonl, write_jsonl
    texts = ['line1\nline2', 'quote " and \\ backslash',
             'unicode é中文 \U0001f600',
             'tab\tand\rcr', '', 'plain']
    df = pd.DataFrame({"doc_id": np.arange(len(texts),
                                           dtype=np.int64),
                       "text": texts})
    out_dir = "/tmp/test_jsonl_rt"
    write_jsonl(rd.from_pandas(df).repartition(3), out_dir)
    back = read_jsonl(out_dir).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert back["text"].tolist() == texts


# ------------------------------------ merge intervals / winsorize

def test_merge_intervals_brute_force_and_invariance(ray_session):
    from mapshaper_ray.ops.relational import merge_intervals
    rng = np.random.default_rng(83)
    n = 400
    lo = rng.integers(0, 10 ** 6, n).astype(np.int64)
    df = pd.DataFrame({
        "k": rng.choice(["a", "b", "c"], n),
        "lo": lo,
        "hi": lo + rng.integers(1, 60_000, n).astype(np.int64)})
    outs = []
    for ds in _layouts(df, 87):
        o = merge_intervals(ds, "k", "lo", "hi").to_pandas() \
            .sort_values(["k", "island"]).reset_index(drop=True) \
            .astype({"island": np.int64, "start_us": np.int64,
                     "end_us": np.int64, "n_merged": np.int64})
        outs.append(o)
    for o in outs[1:]:
        pd.testing.assert_frame_equal(outs[0], o)
    # brute force per key
    for key, g in df.groupby("k"):
        g = g.sort_values(["lo", "hi"]).reset_index(drop=True)
        islands = []
        cur = None
        for _, r in g.iterrows():
            if cur is None or r["lo"] > cur[1]:
                cur = [r["lo"], r["hi"], 1]
                islands.append(cur)
            else:
                cur[1] = max(cur[1], r["hi"])
                cur[2] += 1
        got = outs[0][outs[0]["k"] == key]
        assert got["start_us"].tolist() == [i[0] for i in islands]
        assert got["end_us"].tolist() == [i[1] for i in islands]
        assert got["n_merged"].tolist() == [i[2] for i in islands]
        # islands are disjoint and ordered
        assert (got["start_us"].to_numpy()[1:]
                > got["end_us"].to_numpy()[:-1]).all()


def test_winsorize_brute_force(ray_session):
    from mapshaper_ray.ops.relational import group_winsorize_sum
    rng = np.random.default_rng(89)
    n = 500
    df = pd.DataFrame({"k": rng.choice(["a", "b"], n),
                       "id": np.arange(n, dtype=np.int64),
                       "v": np.round(rng.normal(0, 40, n), 2)})
    outs = [group_winsorize_sum(ds, "k", "v", "id")
            for ds in _layouts(df, 91)]
    for o in outs[1:]:
        pd.testing.assert_frame_equal(outs[0], o)
    q = np.floor(df["v"] * 100).astype(np.int64)
    for key, g in df.assign(q=q).groupby("k"):
        gs = g.sort_values(["q", "id"], kind="mergesort")
        m = len(gs)
        lo = int(gs["q"].iloc[((m - 1) * 10) // 100])
        hi = int(gs["q"].iloc[((m - 1) * 90) // 100])
        exp = int(g["q"].clip(lo, hi).sum())
        row = outs[0].set_index("k").loc[key]
        assert row["lo_q"] == lo and row["hi_q"] == hi
        assert row["sum_wq"] == exp and row["n"] == m


def test_skew_report_brute_force(ray_session):
    from mapshaper_ray.ops.relational import skew_report
    rng = np.random.default_rng(97)
    k = np.where(rng.integers(0, 10, 5000) < 6, 0,
                 rng.integers(1, 40, 5000)).astype(np.int64)
    df = pd.DataFrame({"k": k})
    for ds in _layouts(df, 99):
        out = skew_report(ds, "k")
        vc = pd.Series(k).value_counts()
        sz = np.sort(vc.to_numpy())
        assert out["n_keys"].iloc[0] == len(vc)
        assert out["n_rows"].iloc[0] == 5000
        assert out["max_sz"].iloc[0] == sz[-1]
        assert out["p50_sz"].iloc[0] == sz[((len(sz) - 1) * 50) // 100]
        assert out["p99_sz"].iloc[0] == sz[((len(sz) - 1) * 99) // 100]
        assert out["top_share_pct"].iloc[0] == 100 * sz[-1] // 5000
