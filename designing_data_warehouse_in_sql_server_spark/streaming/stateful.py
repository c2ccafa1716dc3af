"""Custom stateful streaming operator via ``applyInPandasWithState`` —
the escape hatch for stream logic the built-in watermark/window operators
cannot express (per-key running accumulators, custom eviction, decisions
that depend on prior state).

The built-ins (streaming/events.py) cover the reference-derived surface;
this operator exists for the 100 TB training-data path: e.g. per-source
ingestion accounting that must survive across micro-batches.

Scale notes:
- State lives in the state store, partitioned by the grouping key — one
  key's state never leaves its partition, so throughput scales with
  shuffle partitions.
- Arrow batches cross the JVM/Python boundary per (key, micro-batch);
  keep state rows narrow (fixed-width numerics) so the store stays
  compact.
- A timeout (``GroupStateTimeout.ProcessingTimeTimeout``) would bound
  state for keys that go quiet; the accounting use case keeps state
  forever by design, which is safe because the key space (sources/users)
  is bounded, unlike e.g. event ids.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

if TYPE_CHECKING:  # pragma: no cover
    pass

RUNNING_STATS_STATE = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_cents", T.LongType()),
    ]
)

RUNNING_STATS_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_cents", T.LongType()),
    ]
)


def _update_running_stats(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Accumulate (count, integer-cent sum) per user across micro-batches
    and emit the running totals once per batch. Integer cents keep the
    accumulation exactly associative (double adds are not), so totals are
    reproducible regardless of batch slicing."""
    (user_id,) = key
    n, cents = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        cents += int(pdf["value"].mul(100).round().astype("int64").sum())
    state.update((n, cents))
    yield pd.DataFrame({"user_id": [user_id], "n_events": [n], "sum_cents": [cents]})


def running_user_stats(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum) maintained in the state store; one
    output row per user per micro-batch with the totals so far."""
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _update_running_stats,
            outputStructType=RUNNING_STATS_OUTPUT,
            stateStructType=RUNNING_STATS_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
