"""Band-OR multi-table embedding LSH: recall bound + subset property."""

import numpy as np
import pytest


def test_multi_table_recall_improves(ray_session):
    import ray.data as rd
    from mapshaper_ray.ops.dedup import (embedding_near_dup,
                                         embedding_near_dup_exact)
    emb = rd.read_parquet("/root/testdata/sf0.001/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    exact = embedding_near_dup_exact(emb, threshold=0.35).to_pandas()
    pe = set(zip(exact.id_a, exact.id_b))
    one = embedding_near_dup(emb, threshold=0.35, n_planes=4,
                             n_tables=1).to_pandas()
    many = embedding_near_dup(emb, threshold=0.35, n_planes=4,
                              n_tables=16).to_pandas()
    p1 = set(zip(one.id_a, one.id_b))
    pm = set(zip(many.id_a, many.id_b))
    # every LSH pair is a true pair (verify stage), and band-OR
    # strictly improves recall
    assert p1 <= pe and pm <= pe
    assert len(pm) > len(p1)
    assert len(pm) >= 0.5 * len(pe)  # 16 tables, p^4 ~ .14 -> ~90%
    # no duplicate pairs across tables
    assert len(many) == len(pm)


def test_tuned_lsh_recall(ray_session):
    """Auto-tuned band-OR reaches >=90% recall at a LOW cosine
    threshold (the fixed 0.95-dedup defaults recall ~0% there) with
    zero false positives (exact in-bucket verify)."""
    import ray.data as rd

    from mapshaper_ray.ops.dedup import (embedding_near_dup,
                                         embedding_near_dup_exact,
                                         tune_lsh)
    planes, tables = tune_lsh(0.35)
    assert tables > 10  # low threshold demands many small bands
    emb = rd.read_parquet("/root/testdata/sf0.001/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    a = embedding_near_dup(emb, threshold=0.35).to_pandas()
    b = embedding_near_dup_exact(emb, threshold=0.35).to_pandas()
    ka = set(zip(a["id_a"], a["id_b"]))
    kb = set(zip(b["id_a"], b["id_b"]))
    assert not (ka - kb)          # exact verify -> no false positives
    if kb:
        assert len(ka & kb) / len(kb) >= 0.9


def test_q43_params_exact_recall(ray_session):
    """The q43 configuration (4 planes x 64 tables, seed 11) reproduces
    the exact pair set VERBATIM at fixture scale — the basis for q43's
    value-exact oracle (= q15's all-pairs SQL)."""
    import ray.data as rd

    from mapshaper_ray.ops.dedup import (embedding_near_dup,
                                         embedding_near_dup_exact)
    emb = rd.read_parquet("/root/testdata/sf0.001/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    lsh = embedding_near_dup(emb, threshold=0.35, n_planes=4,
                             n_tables=64).to_pandas()
    exact = embedding_near_dup_exact(emb, threshold=0.35).to_pandas()
    assert set(zip(lsh.id_a, lsh.id_b)) == \
        set(zip(exact.id_a, exact.id_b))
