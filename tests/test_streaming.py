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
