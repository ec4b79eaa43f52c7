"""Custom stateful streaming operators (``applyInPandasWithState``).

The reference's persistent keyed state (T1: the download database that
survives runs and accumulates per-key facts) maps to Structured
Streaming arbitrary state: per-key state lives in the state store,
checkpointed, restored across triggers and restarts. The batch
equivalent in :mod:`incremental` covers the idempotent-rerun contract;
this module is the always-on form.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_TOTALS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)


def _update_totals(
    key: tuple,
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Accumulate per-user (count, value-sum) across microbatches."""
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 6)]}
    )


def running_user_totals_stream(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    output_dir: str,
    schema: T.StructType,
) -> None:
    """File-source stream → per-user running totals with arbitrary
    keyed state, AvailableNow trigger, ``foreachBatch`` parquet sink
    (update-mode emissions append per microbatch; foreachBatch is the
    sink that supports checkpoint recovery). Re-running with the same
    checkpoint restores state and continues the totals — the reference's
    resumable-accumulator contract (run_full_pipeline re-runs)."""
    stream = spark.readStream.schema(schema).parquet(source_dir)

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.write.mode("append").parquet(output_dir)

    (
        stream.groupBy("user_id")
        .applyInPandasWithState(
            _update_totals,
            outputStructType=RUNNING_TOTALS_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

_SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("end_us", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)


def _session_fn(gap_seconds: int):
    """Build the per-key session updater. A session CLOSES (and is
    emitted) only via event-time TIMEOUT: when the watermark passes
    last-event-time + gap, the state store fires the key with an empty
    batch iterator and ``hasTimedOut`` set. Until then events keep
    extending the open session in state. This is the semantics
    ``session_window`` gives for free — implemented with arbitrary
    state so the session can carry ANY payload (here value totals; in
    the reference's world, accumulated download/enrichment facts)."""
    gap_us = gap_seconds * 1_000_000

    def update(
        key: tuple,
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            start_us, end_us, n, total = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_end": [pd.Timestamp(end_us, unit="us")],
                    "n_events": [n],
                    "total_value": [round(total, 6)],
                }
            )
            return
        start_us, end_us, n, total = (
            state.get if state.exists else (None, None, 0, 0.0)
        )
        for pdf in batches:
            ts_us = (pdf["ts"].astype("int64") // 1000).tolist()
            lo, hi = min(ts_us), max(ts_us)
            start_us = lo if start_us is None else min(start_us, lo)
            end_us = hi if end_us is None else max(end_us, hi)
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((start_us, end_us, n, total))
        # Close when the WATERMARK (not wall clock) passes end + gap.
        state.setTimeoutTimestamp(end_us // 1000 + gap_seconds * 1000)
        return
        yield  # pragma: no cover - generator marker

    return update


def session_stream(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    output_dir: str,
    schema: T.StructType,
    gap_seconds: int = 1800,
    watermark: str = "30 minutes",
) -> None:
    """T2/streaming sessionization with ARBITRARY state + event-time
    timeout: gap-based sessions per user that emit exactly once, when
    the watermark proves no more events can join them. State is
    per-open-session only (closed sessions leave the store), so state
    size tracks concurrently-open sessions, not history — the bounded-
    state property that makes this run forever at 100 TB/day."""
    stream = (
        spark.readStream.schema(schema)
        .parquet(source_dir)
        .withWatermark("ts", watermark)
    )

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.write.mode("append").parquet(output_dir)

    (
        stream.groupBy("user_id")
        .applyInPandasWithState(
            _session_fn(gap_seconds),
            outputStructType=SESSION_SCHEMA,
            stateStructType=_SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
        .writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
