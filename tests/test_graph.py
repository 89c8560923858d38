"""Distributed PageRank (ops/graph.py) vs a dense numpy power
iteration, including dangling nodes and partitioning invariance."""

import numpy as np
import pandas as pd
import ray.data as rd

from mapshaper_ray.ops.graph import pagerank


def _brute(n, edges, d=0.85, iters=5):
    deg = np.zeros(n)
    for s, _ in edges:
        deg[s] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        inflow = np.zeros(n)
        for s, t in edges:
            inflow[t] += r[s] / deg[s]
        dangling = r[deg == 0].sum()
        r = (1 - d) / n + d * (inflow + dangling / n)
    return r


def _run(n, edges, **kw):
    e = pd.DataFrame(edges, columns=["src", "dst"])
    nodes = pd.DataFrame({"node": np.arange(n, dtype=np.int64)})
    out = pagerank(rd.from_pandas(e), rd.from_pandas(nodes), **kw) \
        .to_pandas().sort_values("node").reset_index(drop=True)
    return out["rank"].to_numpy()


def test_pagerank_vs_brute_with_dangling():
    rng = np.random.default_rng(4)
    n = 60
    edges = [(int(s), int(t)) for s, t in
             zip(rng.integers(0, 40, 150), rng.integers(0, n, 150))]
    # nodes 40..59 have no out-edges (dangling); some have no in-edges
    got = _run(n, edges)
    want = _brute(n, edges)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-12)
    assert abs(got.sum() - 1.0) < 1e-9


def test_pagerank_partition_invariance():
    n = 50
    edges = [(i, (i * 7 + 1) % n) for i in range(n)] + \
            [(i, (i * 13 + 5) % n) for i in range(n)]
    e = pd.DataFrame(edges, columns=["src", "dst"])
    nodes = pd.DataFrame({"node": np.arange(n, dtype=np.int64)})
    a = pagerank(rd.from_pandas(e), rd.from_pandas(nodes),
                 num_buckets=4).to_pandas() \
        .sort_values("node")["rank"].to_numpy()
    b = pagerank(rd.from_pandas(e).repartition(11),
                 rd.from_pandas(nodes).repartition(7),
                 num_buckets=32).to_pandas() \
        .sort_values("node")["rank"].to_numpy()
    np.testing.assert_allclose(a, b, rtol=0, atol=1e-14)


def test_pagerank_broadcast_matches_shuffle():
    from mapshaper_ray.ops.graph import pagerank_broadcast
    rng = np.random.default_rng(9)
    n = 80
    edges = [(int(s), int(t)) for s, t in
             zip(rng.integers(0, 50, 300), rng.integers(0, n, 300))]
    e = pd.DataFrame(edges, columns=["src", "dst"])
    nodes = pd.DataFrame({"node": np.arange(n, dtype=np.int64)})
    a = pagerank(rd.from_pandas(e), rd.from_pandas(nodes)) \
        .to_pandas().sort_values("node")["rank"].to_numpy()
    b = pagerank_broadcast(rd.from_pandas(e).repartition(9),
                           rd.from_pandas(nodes)) \
        .to_pandas().sort_values("node")["rank"].to_numpy()
    np.testing.assert_allclose(a, b, rtol=0, atol=1e-12)
    assert abs(b.sum() - 1.0) < 1e-9


def test_pagerank_inflow_modes_equivalent_and_blocks_bounded():
    """The driver-reduce and bucket-shuffle inflow paths agree to
    1e-12, and the rank table's block count stays pinned at
    num_buckets across iterations (regression: Ray's sort emits one
    output block per INPUT block, so without the per-iteration
    repartition the loop inflated 196 -> 327 -> 458 blocks and each
    iteration cost ~2x the previous one)."""
    from mapshaper_ray.ops.graph import pagerank
    rng = np.random.default_rng(11)
    n = 120
    e = pd.DataFrame({"src": rng.integers(0, 70, 500),
                      "dst": rng.integers(0, n, 500)})
    nodes = pd.DataFrame({"node": np.arange(n, dtype=np.int64)})
    a = pagerank(rd.from_pandas(e), rd.from_pandas(nodes), iters=4,
                 num_buckets=5, inflow_mode="driver") \
        .to_pandas().sort_values("node")["rank"].to_numpy()
    shf = pagerank(rd.from_pandas(e), rd.from_pandas(nodes), iters=4,
                   num_buckets=5, inflow_mode="shuffle")
    b = shf.to_pandas().sort_values("node")["rank"].to_numpy()
    np.testing.assert_allclose(a, b, rtol=0, atol=1e-12)
    assert shf.num_blocks() <= 5


def test_triangle_degree_orientation_paths_agree(monkeypatch):
    """Broadcast degree-orientation (deg table <= cap) and the
    two-join scale path count identically."""
    import mapshaper_ray.ops.graph as G
    rng = np.random.default_rng(3)
    e = pd.DataFrame({"src": rng.integers(0, 60, 600),
                      "dst": rng.integers(0, 60, 600)})
    ds = rd.from_pandas(e).repartition(7)
    a = G.triangle_count(ds, pivot="degree", num_buckets=8)
    monkeypatch.setattr(G, "PAGERANK_DRIVER_REDUCE_CAP", 0)
    b = G.triangle_count(ds, pivot="degree", num_buckets=8)
    assert a == b and a > 0
