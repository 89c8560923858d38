"""Distributed exact rank selection (ops/rank.py)."""

import numpy as np
import pandas as pd
import pytest


@pytest.mark.parametrize("n,seed", [(1000, 0), (50_000, 1), (999, 2)])
def test_kth_smallest_matches_numpy(ray_session, n, seed):
    import ray.data as rd
    from mapshaper_ray.ops.rank import kth_smallest, median_exact
    rng = np.random.RandomState(seed)
    # mixture with heavy duplicates to stress the pileup path
    v = np.concatenate([rng.normal(size=n // 2),
                        np.repeat(rng.normal(size=5), n // 10),
                        rng.exponential(size=n - n // 2 - 5 * (n // 10))])
    rng.shuffle(v)
    ds = rd.from_pandas(pd.DataFrame({"v": v})).repartition(8)
    s = np.sort(v)
    for k in [1, 2, n // 3, n // 2, n - 1, n]:
        # tiny gather_limit forces several histogram rounds
        got = kth_smallest(ds, "v", k, bins=32, gather_limit=64)
        assert got == s[k - 1], (k, got, s[k - 1])
    assert median_exact(ds, "v") == float(np.median(v))


def test_kth_with_nan_and_inf(ray_session):
    import ray.data as rd
    from mapshaper_ray.ops.rank import kth_smallest
    v = np.array([3.0, np.nan, 1.0, np.inf, 2.0, -np.inf, 5.0])
    ds = rd.from_pandas(pd.DataFrame({"v": v}))
    # only finite values count
    assert kth_smallest(ds, "v", 1) == 1.0
    assert kth_smallest(ds, "v", 4) == 5.0
    with pytest.raises(ValueError):
        kth_smallest(ds, "v", 5)


def test_threshold_by_pct_ds_matches_local(ray_session):
    import ray.data as rd
    from mapshaper_ray.geom.simplify import threshold_by_pct
    from mapshaper_ray.ops.rank import threshold_by_pct_ds
    rng = np.random.RandomState(3)
    v = rng.exponential(size=10_000)
    ds = rd.from_pandas(pd.DataFrame({"z": v})).repartition(4)
    for pct in [0.0, 0.1, 0.5, 0.9, 1.0]:
        assert threshold_by_pct_ds(ds, "z", pct) == \
            threshold_by_pct(v, pct), pct
