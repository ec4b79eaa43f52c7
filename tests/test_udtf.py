"""Spark 4 Python UDTF: the sentence-split table function and its
LATERAL-join usage."""

from __future__ import annotations

from mcyj_datapipeline_spark.functions.udtf import (
    SplitSentences,
    register_udtfs,
)


def test_udtf_splits_and_indexes(spark):
    register_udtfs(spark)
    df = spark.createDataFrame(
        [(1, "One. Two! Three? Done."), (2, "no breaks"), (3, None)],
        "id long, t string",
    )
    df.createOrReplaceTempView("udtf_t")
    rows = spark.sql(
        "SELECT id, s.idx, s.sentence FROM udtf_t, "
        "LATERAL split_sentences(t) s ORDER BY id, s.idx"
    ).collect()
    got = [(r["id"], r["idx"], r["sentence"]) for r in rows]
    assert got == [
        (1, 0, "One"),
        (1, 1, "Two"),
        (1, 2, "Three"),
        (1, 3, "Done."),
        (2, 0, "no breaks"),
    ]  # NULL text (id 3) expands to zero rows


def test_udtf_empty_and_whitespace_rows(spark):
    register_udtfs(spark)
    df = spark.createDataFrame([(1, ""), (2, "! ! ! ")], "id long, t string")
    df.createOrReplaceTempView("udtf_e")
    rows = spark.sql(
        "SELECT id, s.sentence FROM udtf_e, LATERAL split_sentences(t) s"
    ).collect()
    # "" -> no fragments; "! ! ! " -> fragments "!" pieces? split on
    # [.!?]+\s+ gives ["", "", "", ""] -> all empty, filtered
    assert rows == []


def test_udtf_direct_invocation(spark):
    """The UDTF class is also callable as a plain table function."""
    from pyspark.sql.functions import lit

    out = SplitSentences(lit("a. b")).collect()
    assert [(r["idx"], r["sentence"]) for r in out] == [(0, "a"), (1, "b")]
