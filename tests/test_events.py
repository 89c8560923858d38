"""Event-table operators: sessionization and as-of join — distributed
results checked against brute-force pandas references and for
partition invariance."""

import numpy as np
import pandas as pd
import ray.data as rd

from mapshaper_ray.ops.relational import asof_join, sessionize


def _events(n=400, users=13, seed=5):
    rng = np.random.default_rng(seed)
    ts = (np.cumsum(rng.integers(1, 7200, n)) * 1_000_000) \
        .astype("int64")
    return pd.DataFrame({
        "event_id": np.arange(n),
        "ts": pd.to_datetime(ts, unit="us"),
        "user_id": rng.integers(0, users, n),
        "event_type": rng.choice(["click", "purchase", "view"], n)})


def _ref_sessions(df, gap_s):
    rows = []
    for uid, g in df.sort_values("ts").groupby("user_id"):
        t = g["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        seq, n, t0 = 0, 0, None
        for i, v in enumerate(t):
            if i == 0 or v - t[i - 1] > gap_s * 1e6:
                if n:
                    rows.append((uid, seq, n, t0, t[i - 1]))
                seq += 1
                n, t0 = 0, v
            n += 1
        rows.append((uid, seq, n, t0, t[-1]))
    out = pd.DataFrame(rows, columns=["user_id", "session_seq",
                                      "n_events", "t_start", "t_end"])
    out["t_start"] = pd.to_datetime(out["t_start"], unit="us")
    out["t_end"] = pd.to_datetime(out["t_end"], unit="us")
    return out.sort_values(["user_id", "session_seq"]) \
        .reset_index(drop=True)


def test_sessionize_matches_bruteforce(ray_session):
    df = _events()
    for parts in (1, 5):
        out = sessionize(rd.from_pandas(df).repartition(parts),
                         gap_s=3600).to_pandas() \
            .sort_values(["user_id", "session_seq"]) \
            .reset_index(drop=True)
        ref = _ref_sessions(df, 3600)
        pd.testing.assert_frame_equal(
            out.astype({"session_seq": "int64", "n_events": "int64",
                        "t_start": "datetime64[us]",
                        "t_end": "datetime64[us]"}),
            ref.astype({"session_seq": "int64", "n_events": "int64",
                        "t_start": "datetime64[us]",
                        "t_end": "datetime64[us]"}))


def test_asof_join_matches_merge_asof(ray_session):
    df = _events()
    left = df[df["event_type"] == "purchase"].drop(columns="event_type")
    right = df[df["event_type"] == "click"].drop(columns="event_type")
    out = asof_join(rd.from_pandas(left).repartition(3),
                    rd.from_pandas(right).repartition(2),
                    on="ts", by="user_id", right_cols=("event_id",),
                    suffix="_click").to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    ref = pd.merge_asof(left.sort_values("ts"), right.sort_values("ts"),
                        on="ts", by="user_id", direction="backward",
                        suffixes=("", "_click")) \
        .dropna(subset=["event_id_click"]) \
        .sort_values("event_id").reset_index(drop=True)
    assert list(out["event_id"]) == list(ref["event_id"])
    assert list(out["event_id_click"]) == \
        [int(v) for v in ref["event_id_click"]]
    assert out["event_id_click"].dtype == np.int64


def test_asof_join_no_matches(ray_session):
    left = pd.DataFrame({"event_id": [1], "user_id": [7],
                         "ts": pd.to_datetime([1000], unit="us")})
    right = pd.DataFrame({"event_id": [2], "user_id": [7],
                          "ts": pd.to_datetime([2000], unit="us")})
    out = asof_join(rd.from_pandas(left), rd.from_pandas(right),
                    right_cols=("event_id",)).to_pandas()
    assert len(out) == 0


def test_range_join_matches_bruteforce(ray_session):
    from mapshaper_ray.ops.relational import range_join
    rng = np.random.default_rng(9)
    n = 200
    left = pd.DataFrame({
        "event_id": np.arange(n),
        "user_id": rng.integers(0, 7, n),
        "ts": pd.to_datetime(rng.integers(0, 10_000, n) * 1_000_000,
                             unit="us")})
    # OVERLAPPING intervals on purpose
    m = 40
    lo = rng.integers(0, 9_000, m) * 1_000_000
    ln = rng.integers(500, 3_000, m) * 1_000_000
    right = pd.DataFrame({
        "user_id": rng.integers(0, 7, m),
        "iv_id": np.arange(m),
        "t_start": pd.to_datetime(lo, unit="us"),
        "t_end": pd.to_datetime(lo + ln, unit="us")})
    out = range_join(rd.from_pandas(left).repartition(3),
                     rd.from_pandas(right).repartition(2),
                     by="user_id", on="ts", lo="t_start", hi="t_end",
                     right_cols=("iv_id",), suffix="").to_pandas()
    got = sorted(zip(out["event_id"], out["iv_id"]))
    ref = left.merge(right, on="user_id")
    ref = ref[(ref["ts"] >= ref["t_start"]) & (ref["ts"] <= ref["t_end"])]
    want = sorted(zip(ref["event_id"], ref["iv_id"]))
    assert got == want and len(want) > 0
    assert out["iv_id"].dtype == np.int64


def test_groupby_quantiles_matches_pandas(ray_session):
    from mapshaper_ray.ops.relational import groupby_quantiles
    rng = np.random.default_rng(3)
    df = pd.DataFrame({"g": rng.choice(list("abcd"), 500),
                       "v": rng.normal(size=500)})
    out = groupby_quantiles(rd.from_pandas(df).repartition(5),
                            "g", "v", qs=(0.1, 0.5, 0.9)).to_pandas() \
        .sort_values("g").reset_index(drop=True)
    ref = df.groupby("g")["v"].quantile([0.1, 0.5, 0.9]).unstack()
    for i, g in enumerate(out["g"]):
        assert out.loc[i, "q10"] == ref.loc[g, 0.1]
        assert out.loc[i, "q50"] == ref.loc[g, 0.5]
        assert out.loc[i, "q90"] == ref.loc[g, 0.9]


def test_joins_string_keys_and_collision_guard(ray_session):
    from mapshaper_ray.ops.relational import asof_join, range_join
    left = pd.DataFrame({"event_id": [1, 2], "user": ["x", "y"],
                         "ts": pd.to_datetime([2000, 3000], unit="us")})
    right = pd.DataFrame({"event_id": [10, 20], "user": ["x", "y"],
                          "ts": pd.to_datetime([1000, 5000],
                                               unit="us")})
    out = asof_join(rd.from_pandas(left), rd.from_pandas(right),
                    by="user", right_cols=("event_id",)).to_pandas()
    assert sorted(zip(out["event_id"], out["event_id_r"])) == [(1, 10)]
    # suffix collision refused instead of silently clobbering
    import pytest as _pt
    with _pt.raises(ValueError):
        asof_join(rd.from_pandas(left), rd.from_pandas(right),
                  by="user", right_cols=("event_id",), suffix="")
    riv = pd.DataFrame({"user": ["x"], "iv": [7],
                        "t_start": pd.to_datetime([500], unit="us"),
                        "t_end": pd.to_datetime([2500], unit="us")})
    out2 = range_join(rd.from_pandas(left), rd.from_pandas(riv),
                      by="user", right_cols=("iv",)).to_pandas()
    assert list(out2["event_id"]) == [1] and list(out2["iv_r"]) == [7]
