"""Sequential (chained) per-key operators: previous-KEPT throttle and
EWMA — verified against plain-Python references on seeded random data,
plus the semantic distinction from the window (previous-EVENT) form."""

from __future__ import annotations

import datetime as dt
import random

import pytest
from pyspark.sql import functions as F

from mcyj_datapipeline_spark.operators.sequential import (
    ewma_per_key,
    throttle_keep_chain,
)

BASE = dt.datetime(2025, 1, 1)


def _events(spark, rows):
    return spark.createDataFrame(
        [(k, BASE + dt.timedelta(minutes=m), i, float(v)) for i, (k, m, v) in enumerate(rows)],
        "k string, ts timestamp, eid long, value double",
    )


def test_throttle_chain_vs_lag_semantics(spark):
    """t, t+20m, t+40m @30m cooldown: chain keeps {t, t+40m}; the lag
    form would keep only {t}. This is the case the batch window query
    explicitly defers to this operator."""
    df = _events(spark, [("a", 0, 1), ("a", 20, 2), ("a", 40, 3)])
    kept = sorted(
        r["eid"]
        for r in throttle_keep_chain(df, ["k"], "ts", 1800, "eid").collect()
    )
    assert kept == [0, 2]


def test_throttle_chain_matches_python_reference(spark):
    rng = random.Random(11)
    rows = []
    for k in "abcdef":
        t = 0
        for _ in range(60):
            t += rng.randint(1, 50)
            rows.append((k, t, rng.random()))
    df = _events(spark, rows)
    got = sorted(
        r["eid"]
        for r in throttle_keep_chain(df, ["k"], "ts", 1800, "eid").collect()
    )
    # reference: per key in ts order, keep iff > 30min after last kept
    want = []
    by_key: dict = {}
    for i, (k, m, _) in enumerate(rows):
        by_key.setdefault(k, []).append((m, i))
    for k, seq in by_key.items():
        last = None
        for m, i in sorted(seq):
            if last is None or (m - last) * 60 > 1800:
                want.append(i)
                last = m
    assert got == sorted(want)


def test_ewma_matches_python_reference(spark):
    rng = random.Random(5)
    rows = [("x", i * 3, rng.random() * 10) for i in range(50)] + [
        ("y", i * 7, rng.random()) for i in range(30)
    ]
    df = _events(spark, rows)
    alpha = 0.3
    out = {
        (r["k"], r["eid"]): r["ewma"]
        for r in ewma_per_key(df, ["k"], "ts", "value", alpha, "eid").collect()
    }
    # reference recurrence per key
    ref: dict = {}
    state: dict = {}
    for i, (k, _, v) in enumerate(rows):
        if k not in state:
            state[k] = v
        else:
            state[k] = alpha * v + (1 - alpha) * state[k]
        ref[(k, i)] = state[k]
    assert len(out) == len(rows)
    for key, want in ref.items():
        assert out[key] == pytest.approx(want, rel=1e-12), key


def test_ewma_null_values_carry_forward(spark):
    df = spark.createDataFrame(
        [
            ("a", BASE, 0, 4.0),
            ("a", BASE + dt.timedelta(minutes=1), 1, None),
            ("a", BASE + dt.timedelta(minutes=2), 2, 8.0),
        ],
        "k string, ts timestamp, eid long, value double",
    )
    out = {
        r["eid"]: r["ewma"]
        for r in ewma_per_key(df, ["k"], "ts", "value", 0.5, "eid").collect()
    }
    assert out[0] == 4.0
    assert out[1] == 4.0  # NULL carries the smoother unchanged
    assert out[2] == pytest.approx(0.5 * 8.0 + 0.5 * 4.0)


def test_throttle_chain_keys_independent(spark):
    """State never crosses keys: identical timelines in two keys make
    identical independent decisions."""
    rows = [("p", m, 0) for m in (0, 20, 40)] + [
        ("q", m, 0) for m in (0, 20, 40)
    ]
    df = _events(spark, rows)
    kept = throttle_keep_chain(df, ["k"], "ts", 1800, "eid")
    per_key = {
        r["k"]: r["n"]
        for r in kept.groupBy("k").agg(F.count("*").alias("n")).collect()
    }
    assert per_key == {"p": 2, "q": 2}


def test_state_version_diff(spark, tmp_path):
    """Added/removed/changed keys between two commits; unchanged keys
    absent from the diff."""
    from mcyj_datapipeline_spark.streaming.incremental import (
        ParquetStateTable,
        state_version_diff,
    )

    t = ParquetStateTable(spark, str(tmp_path / "st"), key="k")
    t.write_initial(
        spark.createDataFrame(
            [("a", 1), ("b", 2), ("c", 3)], "k string, v int"
        )
    )
    t.update(
        spark.createDataFrame(
            [("b", 20), ("d", 4)], "k string, v int"
        ),
        ["v"],
    )
    # v0: a,b,c ; v1: a, b(changed), c, d — removal via tombstone-less
    # upsert never drops, so emulate a removal with a direct commit
    diff = {
        r["k"]: r["change"]
        for r in state_version_diff(t, 0, 1).collect()
    }
    assert diff == {"b": "changed", "d": "added"}

    # removal shows up when a later version lacks a key
    cur = t.read()
    t._commit(cur.filter(F.col("k") != "a"), 2)
    diff2 = {
        r["k"]: r["change"] for r in state_version_diff(t, 1, 2).collect()
    }
    assert diff2 == {"a": "removed"}


def test_compression_ratio_orders_and_invariance(spark):
    """Repetitive text compresses below fluent text below random-ish
    text; results identical across partitionings; empty text -> NULL
    ratio (no div-by-zero)."""
    import random

    from mcyj_datapipeline_spark.operators.text_analysis import (
        compression_ratio,
    )

    rng = random.Random(3)
    fluent = " ".join(
        rng.choice("the quick brown fox jumps over lazy dogs".split())
        for _ in range(300)
    )
    rows = [
        (0, "spam " * 400),
        (1, fluent),
        (2, "".join(chr(rng.randint(33, 126)) for _ in range(2000))),
        (3, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in compression_ratio(df).collect()
    }
    assert out[0]["ratio"] < out[1]["ratio"] < out[2]["ratio"]
    assert out[2]["ratio"] > 0.7  # random barely compresses
    assert out[3]["ratio"] is None
    # partitioning invariance
    out13 = {
        r["doc_id"]: r["ratio"]
        for r in compression_ratio(df.repartition(13)).collect()
    }
    assert out13 == {k: v["ratio"] for k, v in out.items()}


def test_e10_single_user_shuffle(spark, sf_dir):
    """E10: sessionization windows + both aggregations all ride ONE
    hash Exchange on user_id (the only other Exchange is the final
    orderBy's range partitioning)."""
    import __spark_entry__ as e

    plan = (
        e.queries()["e10_event_analytics_pipeline"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1


def test_holt_linear_hand_computed(spark):
    """y=[10,14,12], alpha=0.5, beta=0.25:
    t1: fitted=10, level=12, trend=0.5
    t2: fitted=12.5, level=12.25, trend=0.4375"""
    from mcyj_datapipeline_spark.operators.sequential import (
        holt_linear_per_key,
    )

    df = _events(spark, [("a", 0, 10), ("a", 1, 14), ("a", 2, 12)])
    out = sorted(
        holt_linear_per_key(
            df, ["k"], "ts", "value", 0.5, 0.25, "eid"
        ).collect(),
        key=lambda r: r["eid"],
    )
    got = [(r["level"], r["trend"], r["fitted"]) for r in out]
    assert got[0] == (10.0, 0.0, None)
    assert got[1] == (12.0, 0.5, 10.0)
    assert got[2] == (12.25, 0.4375, 12.5)


def test_holt_linear_state_never_crosses_keys(spark):
    from mcyj_datapipeline_spark.operators.sequential import (
        holt_linear_per_key,
    )

    df = _events(spark, [("a", 0, 10), ("b", 1, 99), ("a", 2, 14)])
    rows = {
        (r["k"], r["eid"]): r
        for r in holt_linear_per_key(
            df, ["k"], "ts", "value", 0.5, 0.25, "eid"
        ).collect()
    }
    assert rows[("b", 1)]["level"] == 99.0  # b's chain starts fresh
    assert rows[("b", 1)]["fitted"] is None
    assert rows[("a", 2)]["fitted"] == 10.0  # a's chain ignores b


def test_spanning_key_buffering_across_tiny_arrow_batches(spark):
    """r13 regression test for _ordered_partition_map's list-buffered
    carryover (ADVICE r12: the old growing-buffer concat was quadratic
    for a key spanning many batches). Forcing 37-row Arrow batches
    makes every key span ~dozens of batches; the recurrence must still
    see each group whole and in order."""
    from pyspark.sql import functions as F

    from mcyj_datapipeline_spark.operators.sequential import ewma_per_key

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "37")
    try:
        n = 3000
        df = spark.range(n).select(
            (F.col("id") % 3).alias("k"),
            F.col("id").alias("eid"),
            (F.col("id") * 1000).cast("timestamp").alias("ts"),
            (F.col("id") % 17).cast("double").alias("v"),
        )
        out = {
            (r["k"], r["eid"]): r["ewma"]
            for r in ewma_per_key(df, ["k"], "ts", "v", 0.3, "eid").collect()
        }
        state: dict = {}
        for i in range(n):  # plain-Python reference, same (k, eid) order
            k, v = i % 3, float(i % 17)
            state[k] = v if k not in state else 0.3 * v + 0.7 * state[k]
            assert abs(out[(k, i)] - state[k]) < 1e-9, (k, i)
        assert len(out) == n
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def test_throttle_chain_rejects_null_timestamps(spark):
    """r13 (ADVICE r12): a null ts has no position in a keep chain and
    NaT.astype(int64) would wrap — the operator now fails fast instead
    of emitting garbage keep decisions."""
    import pytest
    from pyspark.sql import types as T

    from mcyj_datapipeline_spark.operators.sequential import (
        throttle_keep_chain,
    )

    schema = T.StructType(
        [
            T.StructField("k", T.StringType()),
            T.StructField("eid", T.LongType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    df = spark.createDataFrame(
        [("a", 0, None), ("a", 1, __import__("datetime").datetime(2024, 1, 1))],
        schema,
    )
    with pytest.raises(Exception, match="null 'ts'"):
        throttle_keep_chain(df, ["k"], "ts", 1800, "eid").collect()
