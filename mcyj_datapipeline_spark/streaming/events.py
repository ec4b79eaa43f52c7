"""Structured Streaming + event-time operators.

The reference has no stream runtime, but its append-only batch contract
(T2) is exactly the file-source + ``Trigger.AvailableNow`` + checkpoint
pattern, and the driver's ``events`` table lets us demonstrate
event-time capability: tumbling/sliding windows, watermarked late-data
handling, and gap sessionization. The batch forms below share the same
column expressions as the streaming forms, so correctness is oracle-
checkable in batch and the streaming path only adds the trigger.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mcyj_datapipeline_spark.functions.dates import epoch_us


def tumbling_counts(events: DataFrame, duration: str = "1 hour") -> DataFrame:
    """Tumbling event-time window: per (window, event_type) count + sum."""
    return (
        events.groupBy(
            F.window(F.col("ts"), duration).alias("w"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sliding_counts(
    events: DataFrame, duration: str = "1 hour", slide: str = "30 minutes"
) -> DataFrame:
    """Sliding window: each event lands in duration/slide windows."""
    return (
        events.groupBy(F.window(F.col("ts"), duration, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessionization per user (batch form): lag + cumulative
    sum of gap-breaks → session ids, then per-session aggregates.
    Streaming form would be ``session_window``/``applyInPandasWithState``;
    this window-function form is the oracle-checkable batch equivalent."""
    by_user = Window.partitionBy("user_id").orderBy("ts")
    with_breaks = events.withColumn(
        "_prev_ts", F.lag("ts").over(by_user)
    ).withColumn(
        "_new_session",
        (
            F.col("_prev_ts").isNull()
            | (
                epoch_us("ts") - epoch_us("_prev_ts")
                > gap_minutes * 60 * 1_000_000
            )
        ).cast("int"),
    )
    with_ids = with_breaks.withColumn(
        "session_seq",
        F.sum("_new_session").over(
            by_user.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return (
        with_ids.groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        .withColumn(
            "duration_us",
            epoch_us("session_end")
            - epoch_us("session_start"),
        )
    )


def stream_ingest_available_now(
    spark: SparkSession,
    source_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    schema,
    dedup_key: str | None = None,
    watermark: tuple[str, str] | None = None,
) -> None:
    """T2 as a real stream: file source over a landing dir, optional
    within-stream dedup, parquet sink, ``Trigger.AvailableNow`` =
    process-everything-then-stop — the exact 'incremental batch append'
    contract of the reference's parquet batch files, with checkpointed
    exactly-once bookkeeping.

    Dedup state bounding: with a watermark the dedup uses
    ``dropDuplicatesWithinWatermark`` — a plain
    ``dropDuplicates([key])`` would NOT let the watermark evict state
    (the event-time column isn't in the dedup subset), so the state
    store would grow with every key ever seen. Without a watermark the
    dedup is exact and the unbounded-state trade-off is the caller's
    explicit choice."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    if watermark:
        stream = stream.withWatermark(*watermark)
    if dedup_key:
        if watermark:
            stream = stream.dropDuplicatesWithinWatermark([dedup_key])
        else:
            stream = stream.dropDuplicates([dedup_key])
    (
        stream.writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def stream_windowed_counts(
    spark: SparkSession,
    source_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    schema,
    window_duration: str = "1 hour",
    watermark_delay: str = "30 minutes",
) -> None:
    """Watermarked event-time windowed aggregation as a real stream.

    Append output mode: a window is emitted exactly once, when the
    watermark (max observed event time − delay, checkpointed across
    runs) passes its end — and events arriving later than the watermark
    are DROPPED, which is the bounded-state contract that makes
    event-time aggregation feasible on an unbounded stream. The batch
    twin (:func:`tumbling_counts`) computes the same columns without the
    finalize/drop semantics."""
    stream = (
        spark.readStream.schema(schema)
        .parquet(source_dir)
        .withWatermark("ts", watermark_delay)
        .groupBy(F.window(F.col("ts"), window_duration).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("n_events"),
        )
    )
    (
        stream.writeStream.format("parquet")
        .outputMode("append")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def stream_session_counts(
    spark: SparkSession,
    source_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    schema,
    gap: str = "30 minutes",
    watermark_delay: str = "30 minutes",
) -> None:
    """Gap-based sessionization as a real stream: ``session_window``
    merges events within ``gap`` per user into one growing window; a
    session is finalized (emitted once, append mode) when the watermark
    passes its close. The streaming twin of the batch
    :func:`sessionize` (which is the oracle-checkable form)."""
    stream = (
        spark.readStream.schema(schema)
        .parquet(source_dir)
        .withWatermark("ts", watermark_delay)
        .groupBy(F.session_window(F.col("ts"), gap).alias("w"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("user_id"),
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            F.col("n_events"),
        )
    )
    (
        stream.writeStream.format("parquet")
        .outputMode("append")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def stream_stream_join(
    spark: SparkSession,
    clicks_dir: str,
    views_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    schema,
    max_lag: str = "30 minutes",
    watermark_delay: str = "10 minutes",
) -> None:
    """Stream-stream inner join with state bounded on BOTH sides: each
    click joins views for the same user within ``max_lag`` before it.
    The watermark + time-range predicate is what lets Spark expire
    buffered rows — without the range condition the join state would
    grow forever. Append-mode file sink, AvailableNow trigger, same
    incremental-batch contract as the rest of the engine."""
    clicks = (
        spark.readStream.schema(schema)
        .parquet(clicks_dir)
        .withWatermark("ts", watermark_delay)
        .select(
            F.col("user_id"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
    )
    views = (
        spark.readStream.schema(schema)
        .parquet(views_dir)
        .withWatermark("ts", watermark_delay)
        .select(
            F.col("user_id").alias("v_user_id"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("view_ts"),
        )
    )
    joined = clicks.join(
        views,
        F.expr(
            f"""
            user_id = v_user_id AND
            view_ts <= click_ts AND
            view_ts >= click_ts - INTERVAL {max_lag}
            """
        ),
    ).select("user_id", "click_id", "view_id", "click_ts", "view_ts")
    (
        joined.writeStream.format("parquet")
        .outputMode("append")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def stream_static_enrich(
    spark: SparkSession,
    source_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    schema,
    dim: DataFrame,
    dim_key: str = "user_id",
) -> None:
    """Stream-static enrichment join: each micro-batch joins the static
    dimension (re-evaluated per batch, so a refreshed dim table is
    picked up on the next trigger — no restart). The static side is
    broadcast; stream-static joins keep NO watermark state, which makes
    this the cheapest join in the streaming toolbox — use it for
    dimension lookups and save stateful stream-stream joins for
    genuinely bitemporal correlation."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    enriched = stream.join(F.broadcast(dim), dim_key, "left")
    (
        enriched.writeStream.format("parquet")
        .outputMode("append")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def stream_dedup_within_watermark(
    spark: SparkSession,
    source_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    schema,
    dedup_key: str = "event_id",
    watermark_delay: str = "30 minutes",
) -> None:
    """Streaming dedup with BOUNDED state: ``dropDuplicatesWithinWatermark``
    keeps a key in state only until the watermark passes its event time,
    so state size is delay × key-arrival rate — constant in stream
    length. Plain ``dropDuplicates`` on a stream grows state forever
    (every key ever seen); this is the version that survives an
    unbounded 100 TB/day stream, with the documented contract that a
    duplicate arriving later than the delay is NOT suppressed."""
    stream = (
        spark.readStream.schema(schema)
        .parquet(source_dir)
        .withWatermark("ts", watermark_delay)
        .dropDuplicatesWithinWatermark([dedup_key])
    )
    (
        stream.writeStream.format("parquet")
        .outputMode("append")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def stream_dedup_against_corpus(
    spark: SparkSession,
    source_dir: str,
    corpus: DataFrame,
    sink_dir: str,
    checkpoint_dir: str,
    schema: T.StructType,
    key: str = "sha256",
) -> None:
    """Streaming ingest that drops documents already in the corpus: a
    stream-static LEFT ANTI join on the content key — the streaming
    twin of the batch ``pending_work`` anti-join and the exact-dedup
    complement of :func:`...dedup.minhash_lsh_pairs_incremental`.

    The static side is re-resolved per micro-batch (a corpus digest
    table: key column only, so the join build is digests, not
    documents), and the stream side is STATELESS — nothing accumulates
    in the state store, because membership lives in the corpus table
    itself. Combine with ``dropDuplicatesWithinWatermark`` upstream for
    intra-stream dups; at 100 TB the corpus digest table is exactly
    what the exact-dedup pass already maintains."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    fresh = stream.join(corpus.select(key), on=key, how="left_anti")
    (
        fresh.writeStream.format("parquet")
        .outputMode("append")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def stream_dedup_bloom_screened(
    spark: SparkSession,
    source_dir: str,
    sink_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    schema: T.StructType,
    key: str = "sha256",
    m_bits: int = 1 << 16,
    k: int = 4,
) -> None:
    """Streaming ingest with the bloom-screened incremental dedup:
    per micro-batch, probe the PERSISTED bloom bitmap map-side, exact-
    confirm only the positives against the corpus key table, admit the
    rest, then fold the admitted keys into both pieces of state.

    State layout under ``state_dir``:

    - ``keys/`` — append-only parquet of admitted keys (the exact
      membership table the confirm join probes; at 100 TB this is the
      digest table the batch dedup already maintains).
    - ``bitmap/v{batch_id}/`` — versioned bitmap snapshots; the latest
      version is read next batch. bit_or merging is idempotent, so a
      replayed micro-batch (foreachBatch's at-least-once contract)
      re-merges the same keys harmlessly; the keys/ append may
      duplicate rows on replay, which the confirm join's ``distinct``
      absorbs. Exactly-once SINK delivery composes with the state-table
      upsert (:func:`stream_upsert_into_state`) instead of the plain
      append used here.

    The scale contract is the batch screen's (registry_batch7): the
    bitmap stays <= m/64 rows forever, so every micro-batch's screen is
    a broadcast probe regardless of how large the accumulated corpus
    grows — the anti-join shuffle carries only bloom positives.
    """
    from mcyj_datapipeline_spark.operators.sketches import bloom_merge
    from mcyj_datapipeline_spark.registry_batch7 import (
        bloom_bitmap,
        bloom_screen_new,
    )

    keys_dir = f"{state_dir}/keys"
    bm_root = f"{state_dir}/bitmap"

    def handle(batch: DataFrame, batch_id: int) -> None:
        s = batch.sparkSession
        batch = batch.dropDuplicates([key])
        try:
            corpus = s.read.parquet(keys_dir)
            have_state = True
        except Exception:
            have_state = False
        if have_state:
            import os

            versions = sorted(
                (d for d in os.listdir(bm_root) if d.startswith("v")),
                key=lambda d: int(d[1:]),
            )
            bm = s.read.parquet(f"{bm_root}/{versions[-1]}")
            fresh = bloom_screen_new(
                batch, corpus, key, m_bits, k, bitmap=bm
            ).persist()
        else:
            bm = None
            fresh = batch.persist()
        fresh.write.mode("append").parquet(sink_dir)
        fresh.select(key).write.mode("append").parquet(keys_dir)
        delta = bloom_bitmap(fresh.select(key), key, m_bits, k)
        new_bm = bloom_merge(bm, delta) if bm is not None else delta
        new_bm.write.mode("overwrite").parquet(f"{bm_root}/v{batch_id}")
        fresh.unpersist()

    stream = spark.readStream.schema(schema).parquet(source_dir)
    (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
