"""End-to-end flagship pipeline tests at sf0.001 (FIXTURES.md §5.2 ring 2/3):
join row counts, tile assignment, byte-identical text per url, resume."""

import glob
import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def joined(ray_session):
    from mapshaper_ray.pipelines.flagship import build_pipeline
    ds = build_pipeline(SF)
    return ds.to_pandas()


def test_row_count_preserved(joined):
    n_docs = pq.read_metadata(f"{SF}/documents.parquet").num_rows
    assert len(joined) == n_docs  # left join keeps every page


def test_text_byte_identical_per_url(joined, ray_session):
    src = pq.read_table(f"{SF}/documents.parquet",
                        columns=["doc_id", "text"]).to_pandas()
    m = joined.merge(src, on="doc_id", suffixes=("", "_src"))
    assert (m["text"] == m["text_src"]).all()


def test_geocode_matches_sql_oracle(joined):
    import duckdb
    con = duckdb.connect()
    oracle = con.sql(f"""
        SELECT doc_id,
          (('0x' || substr(md5(text), 1, 8))::BIGINT % 3600000)/10000.0 - 180.0 AS cold_lon
        FROM read_parquet('{SF}/documents.parquet')
    """).df()
    m = joined.merge(oracle, on="doc_id")
    h1_mod = None  # cold pages only: lon must match the SQL arithmetic
    cold = m[np.abs(m["lon"] - m["cold_lon"]) < 1e-12]
    assert len(cold) > len(m) * 0.5  # ~80% are cold


def test_region_join_matches_sql_oracle(joined):
    import duckdb
    from mapshaper_ray.regions import region_oracle_sql_case
    con = duckdb.connect()
    lon = "((('0x' || substr(md5(text), 1, 8))::BIGINT % 3600000)/10000.0 - 180.0)"
    lat = "((('0x' || substr(md5(text), 9, 8))::BIGINT % 1600000)/10000.0 - 80.0)"
    hot = "(('0x' || substr(md5(text), 1, 8))::BIGINT % 10) < 2"
    case = region_oracle_sql_case("lon", "lat")
    oracle = con.sql(f"""
        WITH geo AS (
          SELECT doc_id,
            CASE WHEN {hot} THEN NULL ELSE {lon} END AS lon,
            CASE WHEN {hot} THEN NULL ELSE {lat} END AS lat
          FROM read_parquet('{SF}/documents.parquet'))
        SELECT doc_id, CASE WHEN lon IS NULL THEN -999 ELSE {case} END AS region_id
        FROM geo
    """).df()
    m = joined.merge(oracle, on="doc_id", suffixes=("", "_sql"))
    cold = m[m["region_id_sql"] != -999]
    assert len(cold) > 0
    assert (cold["region_id"] == cold["region_id_sql"]).all()


def test_hot_cells_exist(joined):
    # ~20% of pages in 2 urban cells -> their tiles are hot
    counts = joined.groupby("tile").size()
    assert counts.max() > len(joined) * 0.05


def test_tile_assignment_deterministic(joined, ray_session):
    from mapshaper_ray.pipelines.flagship import build_pipeline
    again = build_pipeline(SF).to_pandas()
    a = joined.sort_values("doc_id")[["doc_id", "tile", "region_id"]].reset_index(drop=True)
    b = again.sort_values("doc_id")[["doc_id", "tile", "region_id"]].reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_write_tiles_and_resume(ray_session, tmp_path):
    from mapshaper_ray.pipelines.flagship import build_pipeline
    from mapshaper_ray.stages.tiles import load_manifest, write_tiles

    full_dir = str(tmp_path / "full")
    ds = build_pipeline(SF)
    manifest = write_tiles(ds, full_dir, target_rows=100)
    assert (manifest["status"] == "done").all()
    # salting bounds partition size
    assert manifest["rows"].max() <= max(200, manifest["rows"].median() * 30)

    # simulate an interrupted run: manifest with only half the partitions
    resume_dir = str(tmp_path / "resume")
    os.makedirs(resume_dir)
    half = manifest.iloc[: len(manifest) // 2]
    import json
    with open(os.path.join(resume_dir, "manifest.json"), "w") as f:
        json.dump(half.to_dict("records"), f)
    for p in half["partition"]:
        src = os.path.join(full_dir, f"part={p}", "data.parquet")
        dst_dir = os.path.join(resume_dir, f"part={p}")
        os.makedirs(dst_dir)
        os.link(src, os.path.join(dst_dir, "data.parquet"))

    ds2 = build_pipeline(SF)
    manifest2 = write_tiles(ds2, resume_dir, target_rows=100)
    # resumed manifest covers the same partitions with identical fingerprints
    a = manifest.set_index("partition")["fingerprint"].sort_index()
    b = manifest2.set_index("partition")["fingerprint"].sort_index()
    pd.testing.assert_series_equal(a, b)
    # outputs byte-identical per partition
    for p in manifest["partition"]:
        t1 = pq.read_table(os.path.join(full_dir, f"part={p}", "data.parquet"))
        t2 = pq.read_table(os.path.join(resume_dir, f"part={p}", "data.parquet"))
        assert t1.equals(t2)
