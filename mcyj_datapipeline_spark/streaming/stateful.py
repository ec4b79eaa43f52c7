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
    """Build the per-key session updater. Sessions split on EVERY gap
    larger than ``gap_seconds`` — including gaps between events that
    arrive in the same microbatch (an availableNow backfill delivers a
    key's whole history at once; merging it into one mega-session would
    diverge from ``session_window`` semantics). All but the newest
    session close and emit immediately; the newest stays open in state
    and closes via event-time TIMEOUT when the watermark passes its end
    + gap. Arbitrary state (vs built-in ``session_window``) so the
    session can carry ANY payload (here value totals; in the
    reference's world, accumulated download/enrichment facts)."""
    gap_us = gap_seconds * 1_000_000

    def _emit(key, sessions):
        return pd.DataFrame(
            {
                "user_id": [key[0]] * len(sessions),
                "session_start": [
                    pd.Timestamp(s[0], unit="us") for s in sessions
                ],
                "session_end": [pd.Timestamp(s[1], unit="us") for s in sessions],
                "n_events": [s[2] for s in sessions],
                "total_value": [round(s[3], 6) for s in sessions],
            }
        )

    def update(
        key: tuple,
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            closed = tuple(state.get)
            state.remove()
            yield _emit(key, [closed])
            return
        events: list[tuple[int, float]] = []
        for pdf in batches:
            ts_us = pdf["ts"].astype("int64") // 1000
            events.extend(zip(ts_us.tolist(), pdf["value"].tolist()))
        events.sort()
        # fold sorted events into gap-separated blocks
        blocks: list[list[float]] = []  # [start, end, n, total]
        for ts, val in events:
            if blocks and ts - blocks[-1][1] <= gap_us:
                b = blocks[-1]
                b[1] = ts
                b[2] += 1
                b[3] += float(val)
            else:
                blocks.append([ts, ts, 1, float(val)])
        # carried open session: fold it in as a pseudo-block in ts order
        # and re-merge adjacency. Special-casing blocks[0] would be wrong
        # for out-of-order batches straddling the carried span (carried
        # [100,200], new events at 10 and 150: the carried block must
        # absorb BOTH neighbours, not just the earlier one).
        closed: list[tuple] = []
        if state.exists:
            cs, ce, cn, ct = state.get
            blocks.append([cs, ce, cn, ct])
            blocks.sort(key=lambda b: (b[0], b[1]))
            merged: list[list[float]] = []
            for b in blocks:
                if merged and b[0] - merged[-1][1] <= gap_us:
                    m = merged[-1]
                    m[1] = max(m[1], b[1])
                    m[2] += b[2]
                    m[3] += b[3]
                else:
                    merged.append(b)
            blocks = merged
        closed.extend(tuple(b) for b in blocks[:-1])
        open_s = tuple(blocks[-1]) if blocks else None
        if open_s is None:  # only possible if carried state saw no events
            state.remove()
        else:
            state.update(open_s)
            # Close when the WATERMARK (not wall clock) passes end+gap.
            # Clamp above the current watermark: a late straggler's
            # candidate timeout could land behind it, which crashes the
            # query (arbitrary-state ops don't auto-drop late rows).
            candidate_ms = open_s[1] // 1000 + gap_seconds * 1000
            state.setTimeoutTimestamp(
                max(candidate_ms, state.getCurrentWatermarkMs() + 1)
            )
        if closed:
            yield _emit(key, closed)
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


# ---------------------------------------------------------------------------
# transformWithStateInPandas — the Spark 4 arbitrary-state API
# (StatefulProcessor + typed state handles + RocksDB state store).
# Same running-totals contract as running_user_totals_stream above, so
# the two APIs can be asserted equivalent on identical input.
# ---------------------------------------------------------------------------

try:  # the processor API exists from Spark 4.0 — but its state-server
    # wire protocol needs the google.protobuf runtime, which this
    # sandbox does not ship; gate on BOTH so environments with
    # protobuf get the real path and others skip cleanly
    from google.protobuf import descriptor as _pb_descriptor  # noqa: F401
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _RunningTotalsProcessor(StatefulProcessor):
        """Per-user (count, value-sum) via a typed ValueState handle —
        the transformWithState twin of ``_update_totals``. The handle
        API replaces the whole-state tuple of GroupState with named,
        schema'd state variables (here one ValueState; ListState /
        MapState cover the multi-variable cases) stored in RocksDB."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", _STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            prior = self._totals.get() if self._totals.exists() else (0, 0.0)
            n, total = int(prior[0]), float(prior[1])
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._totals.update((n, total))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [round(total, 6)],
                }
            )

        def close(self) -> None:
            pass

    HAS_TRANSFORM_WITH_STATE = True
except ImportError:  # pragma: no cover - older Spark
    HAS_TRANSFORM_WITH_STATE = False


def running_user_totals_tws(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    output_dir: str,
    schema: T.StructType,
) -> None:
    """``transformWithStateInPandas`` form of the running totals: the
    Spark 4 StatefulProcessor replaces applyInPandasWithState's
    (fn, state-tuple) with an object carrying named typed state
    handles, and REQUIRES the RocksDB state store provider (set here
    for the query via the session conf; the provider ships with
    Spark). Same AvailableNow + foreachBatch + checkpoint contract —
    tests/test_batch26.py drives both APIs over identical landing
    data and asserts identical final totals and restart behavior."""
    if not HAS_TRANSFORM_WITH_STATE:  # pragma: no cover
        raise RuntimeError("transformWithStateInPandas requires Spark >= 4.0")
    prior_provider = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        stream = spark.readStream.schema(schema).parquet(source_dir)

        def sink(batch_df: DataFrame, epoch_id: int) -> None:
            batch_df.write.mode("append").parquet(output_dir)

        (
            stream.groupBy("user_id")
            .transformWithStateInPandas(
                statefulProcessor=_RunningTotalsProcessor(),
                outputStructType=RUNNING_TOTALS_SCHEMA,
                outputMode="Update",
                timeMode="None",
            )
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )
    finally:
        if prior_provider is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prior_provider
            )
