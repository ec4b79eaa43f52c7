"""Batch 36 semantic tests: VARIANT typed extraction, XML roundtrip
escaping, observe() zero-extra-scan metrics, statestore checkpoint
introspection. Value parity vs DuckDB runs in test_oracle_parity.py."""

from __future__ import annotations

import datetime as dt
import json

from pyspark.sql import functions as F
from pyspark.sql import types as T

SF = "/root/testdata/sf0.001"


def test_variant_extraction_matches_json_loads(spark):
    """variant_get typed extraction equals driver-side json.loads for
    every event; missing paths come back NULL, not an error."""
    ev = spark.read.parquet(f"{SF}/events.parquet").select(
        "event_id", "props"
    )
    got = {
        r["event_id"]: r["k"]
        for r in ev.select(
            "event_id",
            F.variant_get(F.parse_json("props"), "$.k", "int").alias("k"),
        ).collect()
    }
    for r in ev.collect():
        assert got[r["event_id"]] == json.loads(r["props"])["k"]
    # absent path -> NULL (schema-on-read, not schema enforcement)
    row = spark.createDataFrame([('{"k": 1}',)], "props string").select(
        F.variant_get(F.parse_json("props"), "$.missing", "int").alias("m")
    ).collect()[0]
    assert row["m"] is None


def test_xml_roundtrip_preserves_special_characters(spark):
    """to_xml -> from_xml is lossless for XML-hostile strings (angle
    brackets, ampersands, quotes, unicode, leading/trailing spaces)."""
    rows = [
        (1, "<scary> & 'quoted' \"double\""),
        (2, "unicode: éâ日本語"),
        (3, "  padded  "),
        (4, "a]]>cdata-ish"),
    ]
    df = spark.createDataFrame(rows, "id long, s string")
    # ignoreSurroundingSpaces defaults to true (the parser trims text
    # nodes); disable it to make the roundtrip byte-lossless
    back = (
        df.select(F.to_xml(F.struct("id", "s")).alias("x"))
        .select(
            F.from_xml(
                "x",
                "id LONG, s STRING",
                {"ignoreSurroundingSpaces": "false"},
            ).alias("r")
        )
        .select("r.*")
        .collect()
    )
    assert {(r["id"], r["s"]) for r in back} == set(rows)


def test_observed_metrics_ride_on_single_action(spark):
    """observed() returns exactly the metrics a separate aggregate
    would compute, the plan carries a CollectMetrics node (the
    zero-extra-scan mechanism), and metrics reflect the observed
    stage, not a re-scan."""
    from mcyj_datapipeline_spark.operators.observability import observed

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    obs_df, obs = observed(
        docs,
        "dq",
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("text").isNull(), 1).otherwise(0)).alias(
            "null_text"
        ),
        F.min("n_chars").alias("min_chars"),
    )
    assert "CollectMetrics" in obs_df._jdf.queryExecution().toString()
    kept = obs_df.filter(F.col("lang") == "en")  # downstream of observe
    kept.count()  # ONE action materializes both result and metrics
    m = obs.get
    direct = docs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("text").isNull(), 1).otherwise(0)).alias("nt"),
        F.min("n_chars").alias("mc"),
    ).collect()[0]
    assert m["n_rows"] == direct["n"]
    assert m["null_text"] == direct["nt"]
    assert m["min_chars"] == direct["mc"]


def test_statestore_reader_exposes_unfinalized_windows(spark, tmp_path):
    """The statestore data source reads a streaming checkpoint's
    internal state: after an append-mode windowed run, state holds
    exactly the windows NOT yet finalized by the watermark (emitted
    windows are evicted) — the ops introspection that debugging a
    stuck stream at scale requires."""
    from mcyj_datapipeline_spark.streaming.events import (
        stream_windowed_counts,
    )

    schema = T.StructType(
        [
            T.StructField("ts", T.TimestampType()),
            T.StructField("v", T.LongType()),
        ]
    )
    src, sink, ckpt = (str(tmp_path / d) for d in ("src", "sink", "ckpt"))
    D = dt.datetime
    batch = [
        (D(2024, 1, 1, 10, 0), 1),
        (D(2024, 1, 1, 10, 30), 1),
        (D(2024, 1, 1, 12, 0), 1),
        (D(2024, 1, 1, 12, 15), 1),
    ]
    spark.createDataFrame(batch, schema).write.mode("append").parquet(src)
    stream_windowed_counts(spark, src, sink, ckpt, schema)
    # Watermark 12:15-30m = 11:45 -> 10:00 window emitted+evicted,
    # 12:00 window still pending in state.
    emitted = {
        (r["window_start"], r["n_events"])
        for r in spark.read.parquet(sink).collect()
    }
    assert emitted == {(D(2024, 1, 1, 10, 0), 2)}
    state = spark.read.format("statestore").load(ckpt).collect()
    pending = {
        (r["key"]["window"]["start"], r["value"]["count"]) for r in state
    }
    assert pending == {(D(2024, 1, 1, 12, 0), 2)}
