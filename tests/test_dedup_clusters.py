"""Connected-components near-dup clustering (cluster_pairs) and the
end-to-end fuzzy dedup (dedup_near).

The distributed path is the alternating large-star / small-star
contraction of Kiveris et al. (SoCC'14); tests check exact equivalence
with the local union-find on adversarial graph shapes (long paths =
worst-case diameter, cliques, forests) and that dedup_near keeps
exactly one canonical doc per near-dup cluster.
"""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from mapshaper_ray.ops.dedup import _cc_local, cluster_pairs, dedup_near


def _ref_components(pairs: pd.DataFrame) -> pd.DataFrame:
    """Brute-force reference: repeated min-label propagation."""
    nodes = np.unique(np.concatenate([pairs["id_a"], pairs["id_b"]]))
    label = {int(n): int(n) for n in nodes}
    for _ in range(len(nodes)):
        changed = False
        for a, b in zip(pairs["id_a"], pairs["id_b"]):
            m = min(label[int(a)], label[int(b)])
            if label[int(a)] != m or label[int(b)] != m:
                label[int(a)] = label[int(b)] = m
                changed = True
        if not changed:
            break
    return pd.DataFrame({"node": list(label),
                         "cluster_id": [label[n] for n in label]}) \
        .sort_values("node").reset_index(drop=True)


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values("node").reset_index(drop=True).astype("int64")


@pytest.mark.parametrize("shape", ["path", "clique", "forest", "random"])
def test_cluster_pairs_local_matches_reference(shape):
    rng = np.random.default_rng(3)
    if shape == "path":
        a = np.arange(0, 30)
        pairs = pd.DataFrame({"id_a": a[:-1], "id_b": a[1:]})
    elif shape == "clique":
        ia, ib = np.triu_indices(12, k=1)
        pairs = pd.DataFrame({"id_a": ia + 100, "id_b": ib + 100})
    elif shape == "forest":
        pairs = pd.DataFrame({"id_a": [1, 2, 10, 11, 20],
                              "id_b": [2, 3, 11, 12, 21]})
    else:
        a = rng.integers(0, 60, 120)
        b = rng.integers(0, 60, 120)
        pairs = pd.DataFrame({"id_a": a, "id_b": b})[lambda d:
                                                     d.id_a != d.id_b]
    got = _norm(cluster_pairs(pairs))
    want = _norm(_ref_components(pairs))
    pd.testing.assert_frame_equal(got, want)


@pytest.mark.parametrize("shape", ["path", "random", "two_cliques"])
def test_cluster_pairs_distributed_matches_local(ray_session, shape):
    rng = np.random.default_rng(11)
    if shape == "path":
        # long path: worst-case diameter for naive propagation
        a = rng.permutation(400)
        pairs = pd.DataFrame({"id_a": a[:-1], "id_b": a[1:]})
    elif shape == "two_cliques":
        ia, ib = np.triu_indices(15, k=1)
        pairs = pd.DataFrame(
            {"id_a": np.concatenate([ia, ia + 1000]),
             "id_b": np.concatenate([ib, ib + 1000])})
    else:
        a = rng.integers(0, 300, 500)
        b = rng.integers(0, 300, 500)
        pairs = pd.DataFrame({"id_a": a, "id_b": b})[lambda d:
                                                     d.id_a != d.id_b]
    local = _norm(cluster_pairs(pairs))
    dist = cluster_pairs(rd.from_pandas(pairs).repartition(7))
    dist = _norm(dist.to_pandas())
    pd.testing.assert_frame_equal(dist, local)


def test_cluster_pairs_empty():
    out = cluster_pairs(pd.DataFrame({"id_a": [], "id_b": []}))
    assert len(out) == 0 and list(out.columns) == ["node", "cluster_id"]


def test_cc_local_min_id_is_representative():
    out = _cc_local(np.array([5, 7, 20]), np.array([7, 9, 21]))
    got = dict(zip(out["node"], out["cluster_id"]))
    assert got == {5: 5, 7: 5, 9: 5, 20: 20, 21: 20}


def test_dedup_near_keeps_one_per_cluster(ray_session):
    # 3 exact-dup groups + 2 singletons; minhash at threshold .5 finds
    # identical texts trivially
    texts = (["alpha beta gamma delta epsilon zeta eta theta"] * 3 +
             ["one two three four five six seven eight"] * 2 +
             ["unique document text number one entirely different"] +
             ["another standalone piece of writing with its own words"])
    df = pd.DataFrame({"doc_id": np.arange(len(texts)), "text": texts})
    ds = rd.from_pandas(df).repartition(3)
    out = dedup_near(ds, threshold=0.5).to_pandas()
    kept = sorted(out["doc_id"])
    assert kept == [0, 3, 5, 6]
    # pairs passed explicitly short-circuit the minhash stage
    pairs = pd.DataFrame({"id_a": [0, 0], "id_b": [1, 2]})
    out2 = dedup_near(ds, pairs=pairs).to_pandas()
    assert sorted(out2["doc_id"]) == [0, 3, 4, 5, 6]


def test_duplicate_window_stats(ray_session):
    from mapshaper_ray.ops.dedup import duplicate_window_stats
    from mapshaper_ray.stages.text import window_hashes

    texts = ["a b c d e f g h",           # shares 5-windows with doc 1
             "a b c d e f x y",
             "p q r s t u v w",           # unique
             "short"]                     # <k tokens -> one hash
    df = pd.DataFrame({"doc_id": [0, 1, 2, 3], "text": texts})
    out = duplicate_window_stats(rd.from_pandas(df).repartition(2)) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)

    # brute-force reference
    sets = [np.unique(window_hashes(t.split(), 5)) for t in texts]
    from collections import Counter
    cnt = Counter()
    for s in sets:
        cnt.update(s.tolist())
    for i, s in enumerate(sets):
        n_dup = sum(1 for h in s if cnt[h] > 1)
        assert out.loc[i, "n_windows"] == len(s)
        assert out.loc[i, "n_dup_windows"] == n_dup
        assert out.loc[i, "dup_share"] == round(n_dup / len(s), 6)


def test_token_df_topk(ray_session):
    from mapshaper_ray.stages.text import token_df_topk
    texts = ["the cat sat", "the dog ran", "the cat ran fast",
             "a dog a cat"]
    df = pd.DataFrame({"doc_id": range(4), "text": texts})
    out = token_df_topk(rd.from_pandas(df).repartition(3), k=3)
    # df: the=3, cat=3, dog=2, ran=2, ...; ties by token text
    assert list(out["token"]) == ["cat", "the", "dog"]
    assert list(out["df"]) == [3, 3, 2]
