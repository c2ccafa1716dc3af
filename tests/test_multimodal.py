from __future__ import annotations

import pytest

from designing_data_warehouse_in_sql_server_spark.operators.multimodal import (
    decode_image,
    documents_as_assets,
    extract_features,
    fake_features,
)
from tests.conftest import SF_DIR


def test_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG...")


def test_extract_features_matches_local(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(20)
    assets = documents_as_assets(docs)
    got = {r.asset_id: (r.n_bytes, r.first_byte, r.last_byte, r.feature_sum)
           for r in extract_features(assets).collect()}
    for row in docs.collect():
        expected = fake_features(row.text.encode("utf-8"))
        assert got[row.doc_id] == expected


def test_extract_features_partition_invariant(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    assets = documents_as_assets(docs)
    one = {tuple(r) for r in extract_features(assets.coalesce(1)).collect()}
    many = {tuple(r) for r in extract_features(assets.repartition(7)).collect()}
    assert one == many


def test_resize_stub_raises():
    from designing_data_warehouse_in_sql_server_spark.operators.multimodal import real_resize

    with pytest.raises(NotImplementedError):
        real_resize(b"\x89PNG...", 8, 8)


def test_resize_assets_payload_contract(spark):
    from designing_data_warehouse_in_sql_server_spark.operators.multimodal import (
        fake_resize,
        resize_assets,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(10)
    assets = documents_as_assets(docs)
    got = {r.asset_id: r for r in resize_assets(assets, 8, 4).collect()}
    for row in docs.collect():
        r = got[row.doc_id]
        assert (r.width, r.height, r.n_bytes) == (8, 4, 32)
        assert bytes(r.content) == fake_resize(row.text.encode("utf-8"), 8, 4)


def test_sample_frames_fanout(spark):
    from designing_data_warehouse_in_sql_server_spark.operators.multimodal import (
        sample_frames,
    )
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(10)
    # give each asset a duration so the sampler has something to sample
    assets = documents_as_assets(docs).withColumn(
        "meta",
        F.struct(
            F.col("meta.mime"),
            F.col("meta.width"),
            F.col("meta.height"),
            F.lit(3500).alias("duration_ms"),
        ),
    )
    frames = sample_frames(assets, every_ms=1000).collect()
    by_asset = {}
    for r in frames:
        by_asset.setdefault(r.asset_id, []).append(r)
    assert set(by_asset) == {row.doc_id for row in docs.collect()}
    for rows in by_asset.values():
        assert len(rows) == 3  # 3500 // 1000
        assert sorted(r.frame_idx for r in rows) == [0, 1, 2]
        assert {r.ts_ms for r in rows} == {0, 1000, 2000}
        for r in rows:
            assert len(bytes(r.frame)) <= 16
