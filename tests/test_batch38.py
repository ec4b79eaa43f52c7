"""Batch 38 tests: Arrow-native kernel equivalence + edge cases,
CBO statistics-driven broadcast flip, WindowGroupLimit top-k pushdown.
Value parity vs DuckDB runs in test_oracle_parity.py."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_arrow_kernel_equals_expression_tier(spark):
    """The mapInArrow kernel reproduces the tier-1 expression path on
    hostile inputs: leading/trailing/multiple whitespace, empty text,
    unicode (codepoint counting), single token."""
    from mcyj_datapipeline_spark.operators import text_analysis as TA
    from mcyj_datapipeline_spark.operators.arrow_kernels import (
        token_stats_arrow,
    )

    rows = [
        (0, "  leading and   inner   gaps "),
        (1, ""),
        (2, "one"),
        (3, "日本語 текст étude"),
        (4, "tabs\tand\nnewlines split"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["tok_chars"])
        for r in token_stats_arrow(df).collect()
    }
    expect = {
        r["doc_id"]: (r["n"], r["c"])
        for r in df.select(
            "doc_id",
            F.size(TA.tokens(F.col("text"))).cast("long").alias("n"),
            F.aggregate(
                F.transform(TA.tokens(F.col("text")), F.length),
                F.lit(0),
                lambda a, x: a + x,
            )
            .cast("long")
            .alias("c"),
        ).collect()
    }
    assert got == expect
    assert got[1] == (0, 0)  # empty text -> zero tokens, zero chars
    assert got[3][1] == len("日本語") + len("текст") + len("étude")


def test_cbo_column_stats_flip_join_to_broadcast(spark, tmp_path):
    """Without column statistics a selectively-filtered dimension
    keeps its file-size estimate (no broadcast at a small threshold);
    ANALYZE ... FOR COLUMNS lets the CBO estimate the filtered
    cardinality and flip the join to BroadcastHashJoin — the
    stats-collection workflow a 100 TB warehouse runs nightly."""
    import shutil

    # the warehouse dir is per-process since round 7 (concurrent-
    # session isolation) — resolve it from the session conf instead of
    # assuming ./spark-warehouse
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("cbo_big_t", "cbo_dim_t"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{wh}/{t}", ignore_errors=True)
    spark.read.parquet(f"{SF}/../sf0.1/lineitem.parquet").write.saveAsTable(
        "cbo_big_t"
    )
    spark.read.parquet(f"{SF}/../sf0.1/orders.parquet").write.saveAsTable(
        "cbo_dim_t"
    )
    q = """SELECT b.l_orderkey, d.o_orderstatus FROM cbo_big_t b
           JOIN (SELECT * FROM cbo_dim_t WHERE o_totalprice < 1200) d
             ON b.l_orderkey = d.o_orderkey"""
    try:
        spark.conf.set("spark.sql.cbo.enabled", "true")
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(256 * 1024)
        )
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        before = spark.sql(q)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in before
        spark.sql(
            "ANALYZE TABLE cbo_dim_t COMPUTE STATISTICS FOR COLUMNS"
            " o_totalprice"
        )
        after = spark.sql(q)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in after
    finally:
        spark.conf.unset("spark.sql.cbo.enabled")
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.adaptive.enabled")
        for t in ("cbo_big_t", "cbo_dim_t"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_window_group_limit_pushdown(spark):
    """rank/row_number <= k filters compile to WindowGroupLimit — the
    per-partition top-k pre-prune (each map task keeps only k rows
    per key BEFORE the shuffle) that makes windowed top-k viable at
    scale. Guards the physical shape w2-family queries rely on."""
    from pyspark.sql import Window

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    w = Window.partitionBy("lang").orderBy(F.desc("n_chars"), "doc_id")
    topk = docs.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= 3
    )
    plan = topk._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
    # sanity: it still returns exactly k rows per key
    counts = topk.groupBy("lang").count().collect()
    assert counts and all(r["count"] <= 3 for r in counts)


def test_arrow_kernel_handles_null_text(spark):
    """NULL text counts as the empty document (0 tokens, 0 chars) —
    without fill_null the group-by realignment desyncs and the
    kernel raises a RecordBatch length mismatch."""
    from mcyj_datapipeline_spark.operators.arrow_kernels import (
        token_stats_arrow,
    )

    df = spark.createDataFrame(
        [(0, "two words"), (1, None), (2, "one")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["tok_chars"])
        for r in token_stats_arrow(df).collect()
    }
    assert got == {0: (2, 8), 1: (0, 0), 2: (1, 3)}
