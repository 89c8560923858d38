"""Randomized partition-invariance sweep over the session-5 operator
band (the bug class that bit asof_join/triangles: results must not
depend on block boundaries), under ADVERSARIAL skew — one user holds
most events, one pivot value dominates, duplicate strings — plus
empty-block layouts (repartition far above the row count)."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd


def _skewed_events(seed, n=1200):
    rng = np.random.default_rng(seed)
    hot = rng.uniform(size=n) < 0.7          # user 0 takes ~70%
    return pd.DataFrame({
        "user_id": np.where(hot, 0, rng.integers(1, 25, n)),
        "event_type": rng.choice(
            ["view", "click", "purchase", "error"], n),
        "ts": pd.to_datetime("2024-01-01") + pd.to_timedelta(
            rng.choice(20 * 86400 * 10 ** 6, n, replace=False),
            unit="us"),
        "value": np.where(rng.uniform(size=n) < 0.3, np.nan,
                          rng.uniform(0, 50, n))})


def _norm(df):
    df = df[sorted(df.columns)].reset_index(drop=True)
    return df.sort_values(list(df.columns), kind="mergesort") \
        .reset_index(drop=True)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_partition_invariance_event_ops(ray_session, seed):
    from mapshaper_ray.ops.relational import (funnel, locf_fill,
                                              pivot_agg,
                                              retention_cohorts,
                                              rolling_active,
                                              user_features)
    df = _skewed_events(seed)
    layouts = [1, 7, 97]          # 97 > users: many empty buckets
    ops = {
        "funnel": lambda ds: funnel(
            ds, ["view", "click", "purchase"], within_s=86400.0),
        "pivot": lambda ds: pivot_agg(
            ds.map_batches(lambda d: d.assign(
                cents=np.where(np.isnan(d["value"].to_numpy()), 0,
                               np.round(d["value"].to_numpy() * 100))
                .astype(np.int64)), batch_format="pandas"),
            "user_id", "event_type", "cents"),
        "retention": lambda ds: retention_cohorts(ds),
        "rolling": lambda ds: rolling_active(ds, window=3),
        "locf": lambda ds: locf_fill(ds, col="value"),
        "features": lambda ds: user_features(ds),
    }
    for name, op in ops.items():
        outs = []
        for nb in layouts:
            ds = rd.from_pandas(df.copy()).repartition(nb)
            outs.append(_norm(op(ds).to_pandas()))
        for o in outs[1:]:
            pd.testing.assert_frame_equal(outs[0], o,
                                          check_dtype=False), name


@pytest.mark.parametrize("seed", [3, 4])
def test_partition_invariance_string_graph_ops(ray_session, seed):
    from mapshaper_ray.ops.dedup import edit1_pairs
    from mapshaper_ray.ops.graph import kcore, label_propagation
    rng = np.random.default_rng(seed)
    words = rng.choice(
        ["".join(rng.choice(list("abcd"), rng.integers(2, 5)))
         for _ in range(60)], 200)           # heavy duplicates
    sdf = pd.DataFrame({"token": words})
    edf = pd.DataFrame({"src": rng.integers(0, 40, 300),
                        "dst": rng.integers(0, 40, 300)})
    for op, df in [
            (lambda ds: edit1_pairs(ds), sdf),
            (lambda ds: kcore(ds, 3), edf),
            (lambda ds: label_propagation(ds, iters=2), edf)]:
        outs = []
        for nb in [1, 11]:
            outs.append(_norm(
                op(rd.from_pandas(df.copy()).repartition(nb))
                .to_pandas()))
        pd.testing.assert_frame_equal(outs[0], outs[1],
                                      check_dtype=False)
