"""Structured Streaming tests (SURVEY.md §7 phase 5): the availableNow
trigger drains the bounded testdata through the same code paths a live
stream uses; results are compared to the batch equivalents."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from designing_data_warehouse_in_sql_server_spark.sources.parquet import load_table
from designing_data_warehouse_in_sql_server_spark.sources.table_store import TableStore
from designing_data_warehouse_in_sql_server_spark.streaming import (
    stream_changes,
    stream_events,
    streaming_dedupe,
    streaming_session_counts,
    tumbling_counts,
)
from tests.conftest import SF_DIR


def _run_to_memory(df, name: str, mode: str) -> None:
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_tumbling_counts_matches_batch(spark):
    from designing_data_warehouse_in_sql_server_spark.plans.analytics import (
        events_tumbling_window,
    )

    _run_to_memory(tumbling_counts(stream_events(spark, SF_DIR)), "t_tumbling", "complete")
    got = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in spark.table("t_tumbling").collect()
    }
    want = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in events_tumbling_window(spark, SF_DIR).collect()
    }
    assert got == want


def test_streaming_dedupe(spark):
    events = stream_events(spark, SF_DIR)
    _run_to_memory(streaming_dedupe(events.unionByName(events)), "t_dedupe", "append")
    n_distinct = load_table(spark, SF_DIR, "events").select("event_id").distinct().count()
    assert spark.table("t_dedupe").count() == n_distinct


def test_session_window_matches_batch_sessionization(spark):
    from designing_data_warehouse_in_sql_server_spark.plans.analytics import (
        sessionize_events,
    )

    _run_to_memory(
        streaming_session_counts(stream_events(spark, SF_DIR)), "t_sessions", "complete"
    )
    got = {
        (r.user_id, r.session_start): r.n_events for r in spark.table("t_sessions").collect()
    }
    want = {
        (r.user_id, r.session_start): r.n_events
        for r in sessionize_events(spark, SF_DIR).collect()
    }
    assert got == want


def test_foreach_batch_upsert(spark, tmp_path):
    from designing_data_warehouse_in_sql_server_spark.streaming import foreach_batch_upsert

    store = TableStore(spark, str(tmp_path / "wh"))
    events = load_table(spark, SF_DIR, "events")
    store.overwrite(
        "event_latest", events.limit(0).select("event_id", "event_type", "value")
    )

    def merge_batch(batch, batch_id):
        store.merge(
            "event_latest",
            batch.select("event_id", "event_type", "value").dropDuplicates(["event_id"]),
            on=["event_id"],
            capture_cdc=False,
        )

    q = foreach_batch_upsert(
        stream_events(spark, SF_DIR), merge_batch, str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    assert store.read("event_latest").count() == events.count()


def test_cdc_stream_matches_batch_feed(spark, tmp_path):
    store = TableStore(spark, str(tmp_path / "wh"))
    t = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    store.overwrite("t", t)
    store.merge("t", spark.createDataFrame([(2, "B"), (3, "c")], "k int, v string"), on=["k"])
    store.merge("t", spark.createDataFrame([(4, "d")], "k int, v string"), on=["k"])

    _run_to_memory(stream_changes(spark, store, "t"), "t_cdc", "append")
    got = {(r.k, r._change_type, r._commit_version) for r in spark.table("t_cdc").collect()}
    want = {
        (r.k, r._change_type, r._commit_version) for r in store.read_changes("t").collect()
    }
    assert got == want and len(got) > 0


def test_cdc_stream_copy_fallback_when_link_fails(spark, tmp_path, monkeypatch):
    """A cross-device stream dir makes os.link raise EXDEV; the CDC stream
    copy must fall back to a plain copy with identical content."""
    import errno
    import os as _os

    real_link = _os.link

    def exdev_for_stream(src, dst, *a, **kw):
        if "_cdc_stream" in dst:
            raise OSError(errno.EXDEV, "Invalid cross-device link")
        return real_link(src, dst, *a, **kw)

    monkeypatch.setattr(_os, "link", exdev_for_stream)
    store = TableStore(spark, str(tmp_path / "wh"))
    store.overwrite("t", spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string"))
    store.merge("t", spark.createDataFrame([(2, "B"), (3, "c")], "k int, v string"), on=["k"])

    _run_to_memory(stream_changes(spark, store, "t"), "t_cdc_fallback", "append")
    got = {(r.k, r._change_type) for r in spark.table("t_cdc_fallback").collect()}
    want = {(r.k, r._change_type) for r in store.read_changes("t").collect()}
    assert got == want and len(got) > 0


def test_stateful_running_user_stats(spark):
    """applyInPandasWithState accumulates across micro-batches; the final
    state per user must equal the batch aggregate (integer cents make
    the comparison exact)."""
    from designing_data_warehouse_in_sql_server_spark.streaming.stateful import (
        running_user_stats,
    )

    _run_to_memory(running_user_stats(stream_events(spark, SF_DIR)), "t_state", "update")
    # last emitted row per user = final running totals
    out = spark.table("t_state")
    latest = (
        out.withColumn("__rn", F.monotonically_increasing_id())
        .orderBy(F.col("__rn").desc())
        .dropDuplicates(["user_id"])
    )
    got = {(r.user_id): (r.n_events, r.sum_cents) for r in latest.collect()}
    want = {
        r.user_id: (r.n, r.cents)
        for r in load_table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("cents"),
        )
        .collect()
    }
    assert got == want


def test_streaming_dedupe_within_watermark(spark):
    from designing_data_warehouse_in_sql_server_spark.streaming import (
        streaming_dedupe_within,
    )

    _run_to_memory(
        streaming_dedupe_within(stream_events(spark, SF_DIR)), "t_dedupe_within", "append"
    )
    got = spark.table("t_dedupe_within")
    n_distinct = load_table(spark, SF_DIR, "events").select("event_id").distinct().count()
    # testdata event_ids are unique, so the stream must pass through 1:1
    assert got.count() == n_distinct
    assert got.select("event_id").distinct().count() == n_distinct


def test_stream_stream_interval_join_matches_batch(spark):
    from designing_data_warehouse_in_sql_server_spark.streaming import (
        stream_stream_interval_join,
    )

    _run_to_memory(
        stream_stream_interval_join(stream_events(spark, SF_DIR)),
        "t_ss_join",
        "append",
    )
    got = {
        (r.first_id, r.then_id) for r in spark.table("t_ss_join").collect()
    }

    events = load_table(spark, SF_DIR, "events")
    first = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("first_id"),
        F.col("user_id").alias("first_user"),
        F.col("ts").alias("first_ts"),
    )
    then = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("then_id"),
        F.col("user_id").alias("then_user"),
        F.col("ts").alias("then_ts"),
    )
    want = {
        (r.first_id, r.then_id)
        for r in first.join(
            then,
            (F.col("first_user") == F.col("then_user"))
            & (F.col("then_ts") > F.col("first_ts"))
            & (F.col("then_ts") <= F.col("first_ts") + F.expr("INTERVAL 30 minutes")),
        ).collect()
    }
    assert want, "batch join produced no pairs — fixture assumption broken"
    # availableNow drains everything, so the stream must find every batch pair
    assert got == want


def test_transform_with_state_matches_apply_in_pandas(spark):
    """Spark 4's transformWithStateInPandas (typed ValueState) must land
    on the identical final per-user totals as the applyInPandasWithState
    form and the batch aggregate.

    The runtime state-server protocol needs google.protobuf, which this
    sandbox does not ship — skip (not fail) where it is absent; the
    applyInPandasWithState twin above covers the same semantics."""
    import pytest

    pytest.importorskip("google.protobuf")
    from designing_data_warehouse_in_sql_server_spark.streaming.stateful import (
        running_user_stats_tws,
    )

    _run_to_memory(
        running_user_stats_tws(stream_events(spark, SF_DIR)), "t_tws", "update"
    )
    out = spark.table("t_tws")
    latest = (
        out.withColumn("__rn", F.monotonically_increasing_id())
        .orderBy(F.col("__rn").desc())
        .dropDuplicates(["user_id"])
    )
    got = {r.user_id: (r.n_events, r.sum_cents) for r in latest.collect()}
    want = {
        r.user_id: (r.n, r.cents)
        for r in load_table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("cents"),
        )
        .collect()
    }
    assert got == want
