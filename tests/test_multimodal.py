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
