"""Distributed sketches: HyperLogLog, exact heavy hitters via
candidate pruning, deterministic reservoir sampling.

Covers: estimation-regime accuracy (tens of thousands of distinct
values, where the bias-corrected harmonic-mean path runs, not linear
counting), agreement with an independent scalar HLL, partition
invariance (the result must not depend on block boundaries), the
heavy-hitters N/m fallback guard, and reservoir edge cases.
"""
import hashlib
import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from mapshaper_ray.ops.sketch import (heavy_hitters, hll_distinct,
                                      hll_distinct_by_group,
                                      hll_estimate, reservoir_sample)


def _scalar_hll(values, p):
    """Independent per-row scalar HLL (mirrors
    scripts/gen_hll_fixture.py — plain ints, no numpy)."""
    m = 1 << p
    regs = [0] * m
    for v in values:
        d = hashlib.md5(str(v).encode()).digest()
        h = int.from_bytes(d[8:16], "little")
        idx = h >> (64 - p)
        w = h & ((1 << (64 - p)) - 1)
        rho = (64 - p) - w.bit_length() + 1
        if rho > regs[idx]:
            regs[idx] = rho
    if m == 16:
        a = 0.673
    elif m == 32:
        a = 0.697
    elif m == 64:
        a = 0.709
    else:
        a = 0.7213 / (1.0 + 1.079 / m)
    e = a * m * m / sum(2.0 ** -r for r in regs)
    v0 = regs.count(0)
    if v0 > 0 and e <= 2.5 * m:
        e = m * math.log(m / v0)
    return int(round(e))


def _events_df(n=6000, n_users=40, seed=3):
    rng = np.random.default_rng(seed)
    # zipf-ish skew so heavy hitters are non-trivial
    w = 1.0 / np.arange(1, n_users + 1)
    users = rng.choice(n_users, size=n, p=w / w.sum())
    return pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": users.astype(np.int64),
        "event_type": np.array(["a", "b", "c"])[
            rng.integers(0, 3, size=n)],
    })


def test_hll_estimation_regime_matches_scalar(ray_session):
    import ray.data as rd
    # 30k distinct values at p=8 (m=256): far beyond linear counting,
    # the harmonic-mean estimator runs.  Distributed must equal the
    # independent scalar implementation exactly, and land within 3
    # standard errors (1.04/sqrt(m) ~ 6.5%) of the truth.
    vals = [f"item-{i}" for i in range(30000)]
    ds = rd.from_pandas(pd.DataFrame({"v": vals})).repartition(7)
    est = hll_distinct(ds, "v", p=8)["n_distinct_est"].iloc[0]
    assert est == _scalar_hll(vals, 8)
    assert abs(est - 30000) / 30000 < 3 * 1.04 / math.sqrt(256)


def test_hll_partition_invariance(ray_session):
    import ray.data as rd
    df = _events_df()
    ests = []
    for nparts in (1, 3, 17):
        ds = rd.from_pandas(df).repartition(nparts)
        ests.append(hll_distinct(ds, "user_id",
                                 p=10)["n_distinct_est"].iloc[0])
    assert ests[0] == ests[1] == ests[2]
    assert ests[0] == _scalar_hll(df["user_id"].tolist(), 10)


def test_hll_by_group_matches_scalar_per_group(ray_session):
    import ray.data as rd
    df = _events_df()
    ds = rd.from_pandas(df).repartition(5)
    out = hll_distinct_by_group(ds, "event_type", "user_id", p=10)
    for _, row in out.iterrows():
        vals = df.loc[df["event_type"] == row["event_type"],
                      "user_id"].tolist()
        assert row["n_distinct_est"] == _scalar_hll(vals, 10)


def test_hll_estimate_zero_registers():
    assert hll_estimate(np.zeros(256, dtype=np.uint8)) == 0


def test_heavy_hitters_exact(ray_session):
    import ray.data as rd
    df = _events_df()
    truth = (df["user_id"].astype(str).value_counts()
             .rename_axis("user_id").reset_index(name="freq"))
    truth = truth.sort_values(["freq", "user_id"],
                              ascending=[False, True]).head(10)
    truth = truth.reset_index(drop=True)
    truth["freq"] = truth["freq"].astype("int64")
    ds = rd.from_pandas(df).repartition(6)
    got = heavy_hitters(ds, "user_id", k=10, m=512)
    pd.testing.assert_frame_equal(got, truth)


def test_heavy_hitters_fallback_guard_still_exact(ray_session):
    import ray.data as rd
    # m=2: the k-th count cannot clear N/2, so the guard must route
    # to the full groupby — and the answer must still be exact.
    df = _events_df(n=2000, n_users=30)
    truth = (df["user_id"].astype(str).value_counts()
             .rename_axis("user_id").reset_index(name="freq"))
    truth = truth.sort_values(["freq", "user_id"],
                              ascending=[False, True]).head(8)
    truth = truth.reset_index(drop=True)
    truth["freq"] = truth["freq"].astype("int64")
    got = heavy_hitters(rd.from_pandas(df).repartition(4),
                        "user_id", k=8, m=2)
    pd.testing.assert_frame_equal(got, truth)


def test_topk_full_groupby_distributed_path(ray_session):
    import ray.data as rd
    from mapshaper_ray.ops.sketch import _topk_full_groupby
    df = _events_df(n=3000)
    truth = (df["user_id"].astype(str).value_counts()
             .rename_axis("user_id").reset_index(name="freq"))
    truth = truth.sort_values(["freq", "user_id"],
                              ascending=[False, True]).head(6)
    truth = truth.reset_index(drop=True)
    truth["freq"] = truth["freq"].astype("int64")
    ds = rd.from_pandas(df).repartition(5)
    # driver_cap=1 forces the distributed-sum + per-block-topk branch
    got = _topk_full_groupby(ds, "user_id", 6, driver_cap=1)
    got = got[["user_id", "freq"]].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, truth)


def test_heavy_hitters_partition_invariance(ray_session):
    import ray.data as rd
    df = _events_df(n=3000)
    outs = [heavy_hitters(rd.from_pandas(df).repartition(n),
                          "user_id", k=5, m=256) for n in (1, 9)]
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_reservoir_deterministic_and_partition_invariant(ray_session):
    import ray.data as rd
    df = _events_df(n=1500)
    outs = [reservoir_sample(rd.from_pandas(df).repartition(n),
                             40, "event_id", seed=7) for n in (1, 11)]
    pd.testing.assert_frame_equal(outs[0], outs[1])
    assert list(outs[0]["sample_rank"]) == list(range(40))
    # matches a brute-force scalar ranking
    keys = {eid: int.from_bytes(
        hashlib.md5(f"7:{eid}".encode()).digest()[8:16], "little")
        for eid in df["event_id"]}
    want = sorted(df["event_id"], key=lambda e: (keys[e], e))[:40]
    assert list(outs[0]["event_id"]) == want


def test_reservoir_n_larger_than_dataset(ray_session):
    import ray.data as rd
    df = _events_df(n=25)
    out = reservoir_sample(rd.from_pandas(df), 100, "event_id", seed=1)
    assert len(out) == 25
    assert set(out["event_id"]) == set(df["event_id"])


def test_reservoir_different_seeds_differ(ray_session):
    import ray.data as rd
    df = _events_df(n=500)
    a = reservoir_sample(rd.from_pandas(df), 30, "event_id", seed=1)
    b = reservoir_sample(rd.from_pandas(df), 30, "event_id", seed=2)
    assert list(a["event_id"]) != list(b["event_id"])


def test_bloom_no_false_negatives_and_bounded_fpr(ray_session):
    import ray.data as rd
    from mapshaper_ray.ops.sketch import bloom_build, bloom_contains
    members = [f"doc-{i}" for i in range(20000)]
    ds = rd.from_pandas(pd.DataFrame({"h": members})).repartition(6)
    bloom = bloom_build(ds, "h", n_bits=1 << 18, k=4)
    # Bloom guarantee: zero false negatives
    assert bloom_contains(bloom, members, k=4).all()
    # fpr near theory ((1-e^{-kn/m})^k ~ 0.5%) — allow 4x slack
    others = [f"other-{i}" for i in range(20000)]
    fpr = bloom_contains(bloom, others, k=4).mean()
    assert fpr < 0.02


def test_bloom_partition_invariance(ray_session):
    import ray.data as rd
    from mapshaper_ray.ops.sketch import bloom_build
    vals = pd.DataFrame({"h": [f"v{i}" for i in range(5000)]})
    blooms = [bloom_build(rd.from_pandas(vals).repartition(n), "h",
                          n_bits=1 << 16, k=4) for n in (1, 13)]
    assert blooms[0] == blooms[1]


def test_incremental_dedup_bloom_equals_plain_anti(ray_session):
    import ray.data as rd
    from mapshaper_ray.ops.relational import hash_join
    from mapshaper_ray.ops.sketch import incremental_dedup_bloom
    rng = np.random.default_rng(11)
    old = pd.DataFrame({
        "doc_id": np.arange(1000, dtype=np.int64),
        "h": [f"hash-{i}" for i in range(1000)]})
    # new batch: 40% re-crawls of old content, 60% genuinely new
    reuse = rng.integers(0, 1000, size=400)
    new = pd.DataFrame({
        "doc_id": np.arange(5000, 6000, dtype=np.int64),
        "h": [f"hash-{i}" for i in reuse] +
             [f"hash-new-{i}" for i in range(600)]})
    old_ds = rd.from_pandas(old).repartition(5)
    new_ds = rd.from_pandas(new).repartition(7)
    got = incremental_dedup_bloom(old_ds, new_ds, "h",
                                  n_bits=1 << 16, k=4).to_pandas()
    want = hash_join(new_ds, old_ds, on="h", how="anti",
                     left_cols=["doc_id", "h"]).to_pandas()
    got = got.sort_values("doc_id").reset_index(drop=True)
    want = want.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["doc_id", "h"]],
                                  want[["doc_id", "h"]],
                                  check_dtype=False)
    # and equals first principles: exactly the non-reused rows
    assert set(got["doc_id"]) == set(range(5400, 6000))


def test_incremental_dedup_bloom_all_old_or_all_new(ray_session):
    import ray.data as rd
    from mapshaper_ray.ops.sketch import incremental_dedup_bloom
    old = pd.DataFrame({"doc_id": np.arange(100, dtype=np.int64),
                        "h": [f"x{i}" for i in range(100)]})
    old_ds = rd.from_pandas(old)
    # every new row is a duplicate -> empty result
    dup = old.copy()
    dup["doc_id"] += 1000
    out = incremental_dedup_bloom(old_ds, rd.from_pandas(dup), "h",
                                  n_bits=1 << 14).to_pandas()
    assert len(out) == 0
    # every new row is fresh -> all pass through
    fresh = pd.DataFrame({"doc_id": np.arange(50, dtype=np.int64),
                          "h": [f"y{i}" for i in range(50)]})
    out2 = incremental_dedup_bloom(old_ds, rd.from_pandas(fresh), "h",
                                   n_bits=1 << 14).to_pandas()
    assert sorted(out2["doc_id"]) == list(range(50))


def test_hll_empty_and_null_inputs(ray_session):
    import ray.data as rd
    df = pd.DataFrame({"v": pd.array([None, None],
                                     dtype="string")})
    ds = rd.from_pandas(df)
    assert hll_distinct(ds, "v", p=8)["n_distinct_est"].iloc[0] == 0


def test_grouped_rank_buckets_partition_invariant_with_ties(ray_session):
    import ray.data as rd
    from mapshaper_ray.ops.rank import grouped_rank_buckets
    rng = np.random.default_rng(5)
    n = 2000
    df = pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        "g": np.array(["en", "de", "fr"])[rng.integers(0, 3, n)],
        # heavy ties: scores drawn from only 7 distinct values
        "score": rng.integers(0, 7, n).astype(np.float64),
    })
    outs = []
    for parts in (1, 9):
        ds = rd.from_pandas(df).repartition(parts)
        o = grouped_rank_buckets(ds, "g", "score", "id",
                                 n_buckets=3).to_pandas()
        outs.append(o.sort_values("id").reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], outs[1])
    # first principles: floor(rank0*3/n_group) under (score, id) order
    want = df.sort_values(["g", "score", "id"]).copy()
    want["rank0"] = want.groupby("g").cumcount()
    sizes = want.groupby("g")["id"].transform("size")
    want["bucket"] = (want["rank0"] * 3 // sizes).astype(np.int64)
    want = want.sort_values("id")
    assert list(outs[0]["bucket"]) == list(want["bucket"])
    # every group splits into near-equal thirds
    chk = outs[0].groupby(["g", "bucket"]).size().unstack()
    assert (chk.max(axis=1) - chk.min(axis=1)).max() <= 1


def test_groupby_agg_var_std(ray_session):
    import ray.data as rd
    from mapshaper_ray.ops.relational import groupby_agg
    rng = np.random.default_rng(9)
    df = pd.DataFrame({"g": rng.integers(0, 4, 5000),
                       "v": rng.normal(100, 15, 5000)})
    out = groupby_agg(rd.from_pandas(df).repartition(7), ["g"],
                      {"var_v": ("v", "var"),
                       "std_v": ("v", "std"),
                       "mean_v": ("v", "mean")}).to_pandas()
    out = out.sort_values("g").reset_index(drop=True)
    want = df.groupby("g")["v"].agg(["var", "std", "mean"]).reset_index()
    np.testing.assert_allclose(out["var_v"], want["var"], rtol=1e-9)
    np.testing.assert_allclose(out["std_v"], want["std"], rtol=1e-9)
    np.testing.assert_allclose(out["mean_v"], want["mean"], rtol=1e-12)
    # single-element group -> sample variance is NaN (SQL var_samp NULL)
    one = pd.DataFrame({"g": [1, 2, 2], "v": [5.0, 1.0, 3.0]})
    o2 = groupby_agg(rd.from_pandas(one), ["g"],
                     {"var_v": ("v", "var")}).to_pandas()
    o2 = o2.sort_values("g").reset_index(drop=True)
    assert np.isnan(o2["var_v"].iloc[0]) and o2["var_v"].iloc[1] == 2.0


def test_random_project_matches_bruteforce(ray_session):
    import ray.data as rd
    from mapshaper_ray.ops.ann import random_project
    from mapshaper_ray.stages.text import md5_lo64
    rng = np.random.default_rng(2)
    vecs = rng.normal(size=(40, 16)).astype(np.float32)
    df = pd.DataFrame({"vec_id": np.arange(40, dtype=np.int64),
                       "embedding": [v for v in vecs]})
    out = random_project(rd.from_pandas(df).repartition(3),
                         out_dim=4).to_pandas()
    out = out.sort_values(["vec_id", "k"]).reset_index(drop=True)
    h = md5_lo64([f"{j}:{k}" for j in range(1, 17) for k in range(4)])
    smat = np.where(h % 2 == 0, 1.0, -1.0).reshape(16, 4)
    want = np.round(vecs.astype(np.float64) @ smat, 6).ravel()
    np.testing.assert_array_equal(out["y"].to_numpy(), want)


def test_bpe_train_driver_and_shuffle_paths_equal(ray_session, monkeypatch):
    import ray.data as rd
    import mapshaper_ray.stages.text as T
    df = pd.DataFrame({"text": ["low lower lowest", "new newer newest",
                                "wide wider widest", "low low low"] * 50})
    ds = rd.from_pandas(df).repartition(5)
    a = T.bpe_train(ds, n_merges=8)
    monkeypatch.setattr(T, "BPE_DRIVER_VOCAB_CAP", 0)  # force shuffle
    b = T.bpe_train(ds, n_merges=8)
    pd.testing.assert_frame_equal(a, b)


def test_sketch_state_incremental_update_equals_rebuild(
        ray_session, tmp_path):
    import ray.data as rd
    from mapshaper_ray.ops.sketch import (bloom_build, bloom_contains,
                                          bloom_update, hll_estimate,
                                          hll_update, load_sketch,
                                          save_sketch, _HllPartial,
                                          _merge_register_rows)
    a = pd.DataFrame({"h": [f"a{i}" for i in range(3000)]})
    b = pd.DataFrame({"h": [f"b{i}" for i in range(2000)]})
    both = pd.concat([a, b], ignore_index=True)
    ds_a, ds_b = rd.from_pandas(a).repartition(3), \
        rd.from_pandas(b).repartition(4)
    # bloom: build on a, persist, reload, update with b == rebuild
    bl = bloom_build(ds_a, "h", n_bits=1 << 16, k=4)
    path = str(tmp_path / "corpus.bloom")
    save_sketch(path, bl, "bloom", k=4)
    loaded, meta = load_sketch(path)
    assert loaded == bl and meta["kind"] == "bloom" and meta["k"] == 4
    upd = bloom_update(loaded, ds_b, "h", k=4)
    rebuilt = bloom_build(rd.from_pandas(both).repartition(9), "h",
                          n_bits=1 << 16, k=4)
    assert upd == rebuilt
    assert bloom_contains(upd, ["a5", "b1999"], k=4).all()
    # idempotent: re-applying the same slice changes nothing
    assert bloom_update(upd, ds_b, "h", k=4) == upd
    # hll: registers max-merge == rebuild over the union
    p = 10
    regs_a = np.zeros(1 << p, dtype=np.uint8)
    rows = rd.from_pandas(a).map_batches(
        _HllPartial("h", p), batch_format="pyarrow").take_all()
    regs_a = np.maximum.reduce(
        [np.frombuffer(r["registers"], dtype=np.uint8) for r in rows])
    merged = hll_update(regs_a.tobytes(), ds_b, "h")
    rows2 = rd.from_pandas(both).map_batches(
        _HllPartial("h", p), batch_format="pyarrow").take_all()
    want = np.maximum.reduce(
        [np.frombuffer(r["registers"], dtype=np.uint8) for r in rows2])
    assert merged == want.tobytes()
    assert hll_estimate(np.frombuffer(merged, dtype=np.uint8)) == \
        hll_estimate(want)


def test_exact_substring_span_attach_paths_equal(ray_session,
                                                 monkeypatch):
    import ray.data as rd
    import mapshaper_ray.ops.dedup as D
    base = "alpha beta gamma delta epsilon zeta eta theta"
    df = pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "text": [base + " one", base + " two", base + " one",
                 "unique words only here now", base + " three",
                 base + " one"]})
    ds = rd.from_pandas(df).repartition(3)
    a = D.exact_substring_dedup(ds, k=3).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    monkeypatch.setattr(D, "ESD_SPAN_BROADCAST_CAP", 0)  # force join
    b = D.exact_substring_dedup(ds, k=3).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
