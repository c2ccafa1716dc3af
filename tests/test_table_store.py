from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from designing_data_warehouse_in_sql_server_spark.sources.table_store import TableStore


@pytest.fixture()
def store(spark, tmp_path):
    return TableStore(spark, str(tmp_path / "warehouse"))


def _df(spark, rows, schema="k int, v string"):
    return spark.createDataFrame(rows, schema)


def test_overwrite_read_roundtrip(spark, store):
    store.overwrite("t", _df(spark, [(1, "a"), (2, "b")]))
    assert sorted(r.k for r in store.read("t").collect()) == [1, 2]


def test_append_and_truncate(spark, store):
    store.overwrite("t", _df(spark, [(1, "a")]))
    store.append("t", _df(spark, [(2, "b")]))
    assert store.read("t").count() == 2
    store.truncate("t")
    assert store.read("t").count() == 0
    assert store.read("t").columns == ["k", "v"]


def test_update_with_predicate(spark, store):
    store.overwrite("t", _df(spark, [(1, "a"), (2, "b")]))
    store.update("t", {"v": F.lit("x")}, where=F.col("k") == 1)
    got = {r.k: r.v for r in store.read("t").collect()}
    assert got == {1: "x", 2: "b"}


def test_time_travel(spark, store):
    v1 = store.overwrite("t", _df(spark, [(1, "a")]))
    store.overwrite("t", _df(spark, [(1, "z")]))
    assert store.time_travel("t", v1).first().v == "a"
    assert store.read("t").first().v == "z"


def test_merge_upsert_and_insert_only(spark, store):
    store.overwrite("t", _df(spark, [(1, "a"), (2, "b")]))
    src = _df(spark, [(2, "B"), (3, "c")])
    store.merge("t", src, on=["k"])
    got = {r.k: r.v for r in store.read("t").collect()}
    assert got == {1: "a", 2: "B", 3: "c"}

    store.overwrite("t2", _df(spark, [(1, "a")]))
    store.merge("t2", _df(spark, [(1, "KEEP-OLD"), (9, "new")]), on=["k"], insert_only=True)
    got = {r.k: r.v for r in store.read("t2").collect()}
    assert got == {1: "a", 9: "new"}


def test_merge_rejects_duplicate_source_keys(spark, store):
    store.overwrite("t", _df(spark, [(1, "a")]))
    with pytest.raises(ValueError, match="duplicate"):
        store.merge("t", _df(spark, [(1, "x"), (1, "y")]), on=["k"])


def test_cdc_feed(spark, store):
    store.overwrite("t", _df(spark, [(1, "a"), (2, "b")]))
    store.merge("t", _df(spark, [(2, "B"), (3, "c")]), on=["k"])
    changes = store.read_changes("t")
    by_type = {
        (r.k, r._change_type) for r in changes.collect()
    }
    assert (3, "insert") in by_type
    assert (2, "update_preimage") in by_type
    assert (2, "update_postimage") in by_type
    pre = changes.filter((F.col("k") == 2) & (F.col("_change_type") == "update_preimage"))
    post = changes.filter((F.col("k") == 2) & (F.col("_change_type") == "update_postimage"))
    assert pre.first().v == "b" and post.first().v == "B"
