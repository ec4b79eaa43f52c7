"""T2 streaming ingest (file source + AvailableNow + checkpoint) and
event-time window operators."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from mcyj_datapipeline_spark.io import read_table
from mcyj_datapipeline_spark.streaming.events import (
    stream_ingest_available_now,
    tumbling_counts,
)

SCHEMA = T.StructType(
    [
        T.StructField("sha256", T.StringType()),
        T.StructField("payload", T.StringType()),
    ]
)


def test_available_now_ingest_incremental(spark, tmp_path):
    src = str(tmp_path / "landing")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    batch1 = spark.createDataFrame([("a", "1"), ("b", "2"), ("a", "1dup")], SCHEMA)
    batch1.write.mode("append").parquet(src)
    stream_ingest_available_now(spark, src, sink, ckpt, SCHEMA, dedup_key="sha256")
    first = spark.read.parquet(sink)
    assert first.select("sha256").distinct().count() == 2

    # Second batch: only new files are processed (checkpoint bookkeeping).
    batch2 = spark.createDataFrame([("c", "3")], SCHEMA)
    batch2.write.mode("append").parquet(src)
    stream_ingest_available_now(spark, src, sink, ckpt, SCHEMA, dedup_key="sha256")
    out = spark.read.parquet(sink)
    assert out.filter(F.col("sha256") == "c").count() == 1
    # 'a'/'b' not re-emitted by the second run.
    assert out.count() == first.count() + 1


def test_tumbling_counts_conservation(spark, sf_dir):
    ev = read_table(spark, sf_dir, "events")
    win = tumbling_counts(ev, "1 hour")
    assert win.agg(F.sum("n_events")).first()[0] == ev.count()


def test_stateful_running_totals_across_restarts(spark, tmp_path):
    """applyInPandasWithState: keyed state survives stream restarts via
    the checkpoint (reference's resumable accumulator contract, T1)."""
    from pyspark.sql import types as T

    from mcyj_datapipeline_spark.streaming.stateful import (
        running_user_totals_stream,
    )

    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    src = str(tmp_path / "ev")
    ckpt = str(tmp_path / "ck")
    out = str(tmp_path / "out")

    spark.createDataFrame([(1, 10.0), (1, 5.0), (2, 1.0)], schema).write.mode(
        "append"
    ).parquet(src)
    running_user_totals_stream(spark, src, ckpt, out, schema)
    first = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in spark.read.parquet(out).collect()
    }
    assert first == {1: (2, 15.0), 2: (1, 1.0)}

    # New file lands; restarted query restores state and continues.
    spark.createDataFrame([(1, 2.0), (3, 7.0)], schema).write.mode(
        "append"
    ).parquet(src)
    running_user_totals_stream(spark, src, ckpt, out, schema)
    # Latest emission per key carries the ACCUMULATED totals.
    latest = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in spark.read.parquet(out)
        .groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max("total_value").alias("total_value"),
        )
        .collect()
    }
    assert latest[1] == (3, 17.0)
    assert latest[2] == (1, 1.0)
    assert latest[3] == (1, 7.0)


def test_watermarked_window_finalizes_and_drops_late(spark, tmp_path):
    """Append-mode windowed agg: a window is emitted once when the
    checkpointed watermark passes its end; events later than the
    watermark are dropped (bounded state on an unbounded stream)."""
    import datetime as dt

    from mcyj_datapipeline_spark.streaming.events import stream_windowed_counts

    schema = T.StructType(
        [T.StructField("ts", T.TimestampType()), T.StructField("v", T.LongType())]
    )
    src, sink, ckpt = (str(tmp_path / d) for d in ("src", "sink", "ckpt"))
    D = dt.datetime
    b1 = [(D(2024, 1, 1, 10, 0), 1), (D(2024, 1, 1, 10, 30), 1), (D(2024, 1, 1, 12, 0), 1)]
    spark.createDataFrame(b1, schema).write.mode("append").parquet(src)
    stream_windowed_counts(spark, src, sink, ckpt, schema)
    first = {
        r["window_start"]: r["n_events"] for r in spark.read.parquet(sink).collect()
    }
    # Watermark = 12:00 - 30m = 11:30 > 11:00 -> the 10:00 window finalized.
    assert first == {D(2024, 1, 1, 10, 0): 2}

    # A late event behind the watermark + a new event far ahead.
    b2 = [(D(2024, 1, 1, 10, 45), 1), (D(2024, 1, 1, 14, 0), 1)]
    spark.createDataFrame(b2, schema).write.mode("append").parquet(src)
    stream_windowed_counts(spark, src, sink, ckpt, schema)
    final = {
        r["window_start"]: r["n_events"] for r in spark.read.parquet(sink).collect()
    }
    # Late 10:45 DROPPED (10:00 window still 2, not re-emitted); the
    # 12:00 window finalized by the advanced watermark.
    assert final == {D(2024, 1, 1, 10, 0): 2, D(2024, 1, 1, 12, 0): 1}


def test_streaming_session_windows(spark, tmp_path):
    """session_window stream: events within the gap merge into one
    session per user; sessions finalize (append-mode emit) when the
    watermark passes; a returning user opens a NEW session."""
    import datetime as dt

    from mcyj_datapipeline_spark.streaming.events import stream_session_counts

    schema = T.StructType(
        [T.StructField("user_id", T.LongType()), T.StructField("ts", T.TimestampType())]
    )
    src, sink, ckpt = (str(tmp_path / d) for d in ("s", "k", "c"))
    D = dt.datetime
    b1 = [
        (1, D(2024, 1, 1, 10, 0)),
        (1, D(2024, 1, 1, 10, 10)),
        (2, D(2024, 1, 1, 10, 5)),
        (9, D(2024, 1, 1, 13, 0)),  # advances the watermark
    ]
    spark.createDataFrame(b1, schema).write.mode("append").parquet(src)
    stream_session_counts(spark, src, sink, ckpt, schema)
    first = sorted(
        (r["user_id"], r["n_events"]) for r in spark.read.parquet(sink).collect()
    )
    assert first == [(1, 2), (2, 1)]  # merged session for user 1

    b2 = [(1, D(2024, 1, 1, 14, 0)), (9, D(2024, 1, 1, 16, 0))]
    spark.createDataFrame(b2, schema).write.mode("append").parquet(src)
    stream_session_counts(spark, src, sink, ckpt, schema)
    sessions_u1 = (
        spark.read.parquet(sink).filter(F.col("user_id") == 1).count()
    )
    assert sessions_u1 == 2  # the 14:00 return opened a second session


def test_stream_stream_join_time_bounded(spark, tmp_path):
    """Stream-stream inner join: clicks match same-user views within the
    lag window only; both join-state buffers are watermark-bounded."""
    import datetime as dt

    from mcyj_datapipeline_spark.streaming.events import stream_stream_join

    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    cl, vw, sink, ckpt = (str(tmp_path / d) for d in ("cl", "vw", "k", "c"))
    D = dt.datetime
    spark.createDataFrame(
        [(1, 500, D(2024, 1, 1, 9, 0)), (1, 501, D(2024, 1, 1, 10, 0))], schema
    ).write.mode("append").parquet(vw)
    spark.createDataFrame(
        [(1, 900, D(2024, 1, 1, 10, 15)), (2, 901, D(2024, 1, 1, 10, 15))], schema
    ).write.mode("append").parquet(cl)
    stream_stream_join(spark, cl, vw, sink, ckpt, schema)
    rows = sorted(
        (r["click_id"], r["view_id"]) for r in spark.read.parquet(sink).collect()
    )
    # 900 matches only the in-window view 501; 9:00 view is beyond the
    # 30-minute lag; user 2 has no views at all.
    assert rows == [(900, 501)]


def test_stream_upsert_into_state_table(spark, tmp_path):
    """foreachBatch streaming MERGE: updates stream into the versioned
    state table with batch-path upsert semantics (non-empty wins),
    exactly once per file across restarts."""
    from mcyj_datapipeline_spark.streaming.incremental import (
        ParquetStateTable,
        stream_upsert_into_state,
    )

    schema = T.StructType(
        [
            T.StructField("ContentDocumentId", T.StringType()),
            T.StructField("sha256", T.StringType()),
        ]
    )
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ck")
    st = ParquetStateTable(spark, str(tmp_path / "state"), "ContentDocumentId")
    st.write_initial(
        spark.createDataFrame([("CD1", ""), ("CD2", "keep")], schema)
    )

    spark.createDataFrame([("CD1", "sha-new"), ("CD3", "sha-3")], schema).write.mode(
        "append"
    ).parquet(src)
    stream_upsert_into_state(spark, src, st, ckpt, schema, ["sha256"])
    got = {r["ContentDocumentId"]: r["sha256"] for r in st.read().collect()}
    assert got == {"CD1": "sha-new", "CD2": "keep", "CD3": "sha-3"}

    # Re-run with no new files: checkpoint prevents re-application.
    v_before = st._next_version()
    stream_upsert_into_state(spark, src, st, ckpt, schema, ["sha256"])
    assert st._next_version() == v_before  # no new state version written


def test_stream_static_enrich_broadcast_join(spark, tmp_path):
    """Stream-static left join: every streamed row enriched from the
    static dim; unmatched keys null-filled; no state directory needed
    beyond the source checkpoint."""
    from mcyj_datapipeline_spark.streaming.events import stream_static_enrich

    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("event_id", T.LongType()),
        ]
    )
    src, sink, ckpt = (
        str(tmp_path / "src"),
        str(tmp_path / "sink"),
        str(tmp_path / "ckpt"),
    )
    spark.createDataFrame(
        [(1, 100), (2, 200), (9, 900)], schema
    ).write.mode("append").parquet(src)
    dim = spark.createDataFrame(
        [(1, "gold"), (2, "silver")], ["user_id", "tier"]
    )
    stream_static_enrich(spark, src, sink, ckpt, schema, dim)
    out = {
        (r.user_id, r.tier) for r in spark.read.parquet(sink).collect()
    }
    assert out == {(1, "gold"), (2, "silver"), (9, None)}


def test_stream_dedup_within_watermark_bounded_state(spark, tmp_path):
    """Duplicates inside the watermark window are suppressed; the
    operator requires an event-time watermark (bounded state)."""
    from mcyj_datapipeline_spark.streaming.events import (
        stream_dedup_within_watermark,
    )

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("v", T.StringType()),
        ]
    )
    src, sink, ckpt = (
        str(tmp_path / "src"),
        str(tmp_path / "sink"),
        str(tmp_path / "ckpt"),
    )
    import datetime as dt

    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    rows = [
        (1, t0, "first"),
        (1, t0 + dt.timedelta(minutes=5), "dup-within-window"),
        (2, t0 + dt.timedelta(minutes=1), "other"),
    ]
    spark.createDataFrame(rows, schema).write.mode("append").parquet(src)
    stream_dedup_within_watermark(spark, src, sink, ckpt, schema)
    out = spark.read.parquet(sink)
    assert out.count() == 2
    assert {r.event_id for r in out.collect()} == {1, 2}


def test_stateful_session_stream_event_time_timeout(spark, tmp_path):
    """Gap sessions via arbitrary state + EventTimeTimeout: a session is
    emitted exactly once, when the watermark passes its end + gap;
    still-open sessions stay in state (and in the store only — closed
    ones leave it)."""
    import datetime as dt

    from mcyj_datapipeline_spark.streaming.stateful import session_stream

    schema = T.StructType(
        [
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    src, ckpt, out = (str(tmp_path / d) for d in ("src", "ck", "out"))
    D = dt.datetime
    # User 1: two events 10 min apart (one session). User 2: one event.
    b1 = [
        (D(2024, 1, 1, 10, 0), 1, 1.0),
        (D(2024, 1, 1, 10, 10), 1, 2.0),
        (D(2024, 1, 1, 10, 5), 2, 5.0),
    ]
    spark.createDataFrame(b1, schema).write.mode("append").parquet(src)
    session_stream(
        spark, src, ckpt, out, schema, gap_seconds=1800, watermark="30 minutes"
    )
    # Watermark so far: 10:10 - 30m; nothing can have closed yet.
    assert not [
        f for f in __import__("os").listdir(out) if f.endswith(".parquet")
    ] or spark.read.parquet(out).count() == 0

    # A much later event advances the watermark past both sessions'
    # end+gap (10:40 / 10:35 <= WM 13:30), closing them; user 3's new
    # session stays open.
    b2 = [(D(2024, 1, 1, 14, 0), 3, 9.0)]
    spark.createDataFrame(b2, schema).write.mode("append").parquet(src)
    session_stream(
        spark, src, ckpt, out, schema, gap_seconds=1800, watermark="30 minutes"
    )
    rows = {r["user_id"]: r for r in spark.read.parquet(out).collect()}
    assert set(rows) == {1, 2}  # user 3 still open -> not emitted
    assert rows[1]["n_events"] == 2 and rows[1]["total_value"] == 3.0
    assert rows[1]["session_start"] == D(2024, 1, 1, 10, 0)
    assert rows[1]["session_end"] == D(2024, 1, 1, 10, 10)
    assert rows[2]["n_events"] == 1 and rows[2]["total_value"] == 5.0


def test_stream_dedup_against_corpus(spark, tmp_path):
    """Stream-static anti-join ingest: docs whose sha is already in the
    corpus never reach the sink; the corpus table can GROW between runs
    and the next batch respects the additions (static side re-resolved
    per micro-batch)."""
    schema = T.StructType(
        [
            T.StructField("sha256", T.StringType()),
            T.StructField("body", T.StringType()),
        ]
    )
    src, sink, ckpt = (str(tmp_path / d) for d in ("src", "sink", "ck"))
    corpus_path = str(tmp_path / "corpus")
    spark.createDataFrame([("A", "known")], schema).write.parquet(corpus_path)
    corpus = spark.read.parquet(corpus_path)

    from mcyj_datapipeline_spark.streaming.events import (
        stream_dedup_against_corpus,
    )

    spark.createDataFrame(
        [("A", "dup"), ("B", "new")], schema
    ).write.mode("append").parquet(src)
    stream_dedup_against_corpus(spark, src, corpus, sink, ckpt, schema)
    assert {r["sha256"] for r in spark.read.parquet(sink).collect()} == {"B"}

    # Corpus grows (B was ingested); a later batch with B and C drops B.
    spark.createDataFrame([("B", "new")], schema).write.mode("append").parquet(
        corpus_path
    )
    spark.createDataFrame(
        [("B", "dup-now"), ("C", "newest")], schema
    ).write.mode("append").parquet(src)
    stream_dedup_against_corpus(spark, src, corpus, sink, ckpt, schema)
    assert {r["sha256"] for r in spark.read.parquet(sink).collect()} == {"B", "C"}


def test_session_updater_splits_intra_batch_gaps():
    """Regression: one microbatch delivering a key's whole history (the
    availableNow backfill case) must split on gaps > gap_seconds, not
    merge everything into one mega-session."""
    import pandas as pd

    from mcyj_datapipeline_spark.streaming.stateful import _session_fn

    class FakeState:
        exists = False
        hasTimedOut = False

        def __init__(self):
            self.stored = None
            self.timeout_ms = None

        @property
        def get(self):
            return self.stored

        def update(self, v):
            self.stored = v
            self.exists = True

        def remove(self):
            self.stored = None
            self.exists = False

        def setTimeoutTimestamp(self, ms):
            self.timeout_ms = ms

        def getCurrentWatermarkMs(self):
            return 0

    update = _session_fn(gap_seconds=1800)
    state = FakeState()
    base = pd.Timestamp("2026-01-01T00:00:00")
    batch = pd.DataFrame(
        {
            "ts": [base, base + pd.Timedelta("10min"),
                   base + pd.Timedelta("4h")],  # 4h ≫ 30min gap
            "value": [1.0, 2.0, 3.0],
        }
    )
    out = list(update((7,), iter([batch]), state))
    # first session (2 events) closed immediately; third event stays open
    assert len(out) == 1 and len(out[0]) == 1
    closed = out[0].iloc[0]
    assert closed["n_events"] == 2 and closed["total_value"] == 3.0
    assert state.exists and state.stored[2] == 1  # open session: 1 event
    # timeout set past the open session's end + gap
    assert state.timeout_ms > 0


def test_session_updater_carried_state_straddled_by_late_events():
    """Regression: a batch whose out-of-order events STRADDLE the carried
    open session (carried [100,200]min, new events at 10min and 150min,
    all gaps <= gap_seconds) must fold into ONE session [10,200] — the
    old blocks[0]-only merge closed [10,200] while leaving the 150min
    event open as an overlapping second session."""
    import pandas as pd

    from mcyj_datapipeline_spark.streaming.stateful import _session_fn

    class FakeState:
        exists = True
        hasTimedOut = False

        def __init__(self, carried):
            self.stored = carried
            self.timeout_ms = None

        @property
        def get(self):
            return self.stored

        def update(self, v):
            self.stored = v
            self.exists = True

        def remove(self):
            self.stored = None
            self.exists = False

        def setTimeoutTimestamp(self, ms):
            self.timeout_ms = ms

        def getCurrentWatermarkMs(self):
            return 0

    gap_min = 100  # gap_seconds = 6000
    base_us = int(pd.Timestamp("2026-01-01T00:00:00").value // 1000)

    def at_min(m):
        return base_us + m * 60_000_000

    # carried open session spans [100min, 200min], 5 events, total 5.0
    state = FakeState((at_min(100), at_min(200), 5, 5.0))
    update = _session_fn(gap_seconds=gap_min * 60)
    batch = pd.DataFrame(
        {
            "ts": [
                pd.Timestamp(at_min(150), unit="us"),  # inside carried span
                pd.Timestamp(at_min(10), unit="us"),  # before it, gap 90min
            ],
            "value": [2.0, 1.0],
        }
    )
    out = list(update((7,), iter([batch]), state))
    # everything merges into ONE open session [10, 200]; nothing closes
    assert out == []
    assert state.exists
    s, e, n, total = state.stored
    assert (s, e) == (at_min(10), at_min(200))
    assert n == 7 and total == 8.0
