"""Batch 8 tests: segment-dedup semantics on crafted corpora and plan
shapes for the TPC-H Q3/Q4/Q6/Q10/Q19 analogs. Value parity vs DuckDB
runs in test_oracle_parity.py automatically."""

from __future__ import annotations

import re

from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _rewrite(spark, rows):
    """Run the segment-dedup rewrite logic over an in-memory corpus by
    registering it under the documents schema the query expects."""
    import tempfile

    from mcyj_datapipeline_spark.registry_batch8 import dedup_segment_rewrite

    d = tempfile.mkdtemp(prefix="seg_dedup_")
    spark.createDataFrame(
        [(i, t, "en", "test", len(t)) for i, t in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    out = dedup_segment_rewrite(spark, d).collect()
    return {r["doc_id"]: (r["text"], r["n_segs_kept"]) for r in out}


def test_segment_dedup_drops_exact_duplicate_docs(spark):
    """A document identical to an earlier one loses ALL its segments —
    segment dedup subsumes exact-document dedup."""
    ten = " ".join(f"w{i}" for i in range(10))
    twenty = ten + " " + " ".join(f"v{i}" for i in range(10))
    got = _rewrite(spark, [twenty, twenty])
    assert 0 in got and got[0][0] == twenty
    assert 1 not in got  # every segment of doc 1 was seen in doc 0


def test_segment_dedup_keeps_first_occurrence_and_reassembles(spark):
    """A later doc sharing one 10-word segment keeps its OTHER segments
    in original order; the shared segment survives only in the first
    doc."""
    shared = " ".join(f"s{i}" for i in range(10))
    mine = " ".join(f"m{i}" for i in range(10))
    tail = " ".join(f"t{i}" for i in range(10))
    got = _rewrite(spark, [shared, mine + " " + shared + " " + tail])
    assert got[0] == (shared, 1)
    # doc 1: segment 0 (mine) and 2 (tail) survive, order preserved.
    assert got[1] == (mine + " " + tail, 2)


def test_segment_dedup_short_tail_segment_counts(spark):
    """Sub-10-word tails form their own final segment and participate
    in dedup like any other."""
    base = " ".join(f"w{i}" for i in range(10))
    got = _rewrite(spark, [base + " tail words", "tail words"])
    assert got[0][1] == 2  # full segment + short tail
    assert 1 not in got  # the 2-word doc IS the tail segment, already seen


def test_q3_q10_use_take_ordered(spark, sf_dir):
    import __spark_entry__ as e

    for name in ("sql15_unshipped_topk", "sql18_returned_topk"):
        plan = _plan(e.queries()[name](spark, sf_dir))
        assert "TakeOrderedAndProject" in plan, name
        # no global Sort node outside the take-ordered operator
        assert not re.search(r"\n\s*\+?-? ?Sort ", plan), name


def test_q4_semi_join_no_aggregate_dedup(spark, sf_dir):
    """The EXISTS must be a left-semi join — not an inner join followed
    by a distinct/aggregate to undo fan-out."""
    import __spark_entry__ as e

    plan = _plan(e.queries()["sql16_priority_waiting"](spark, sf_dir))
    assert "LeftSemi" in plan
    # exactly one aggregate pair (partial+final for the count), no
    # extra dedup aggregate
    assert plan.count("HashAggregate") <= 2


def test_q6_all_predicates_pushed(spark, sf_dir):
    """Q6: every filter reaches the parquet scan and only the 4 needed
    columns are read."""
    import __spark_entry__ as e

    plan = _plan(e.queries()["sql17_forecast_revenue"](spark, sf_dir))
    pushed = re.search(r"PushedFilters: \[([^\]]*)", plan).group(1)
    for frag in ("l_shipdate", "l_discount", "l_quantity"):
        assert frag in pushed, frag
    schema = re.search(r"ReadSchema: struct<([^>]*)>", plan).group(1)
    cols = {c.split(":")[0] for c in schema.split(",")}
    assert cols == {
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_shipdate",
    }


def test_q19_single_side_conjuncts_factored_to_scan(spark, sf_dir):
    """Q19's OR-of-ANDs: the quantity bounds common to the disjunction
    must be CNF-extracted and pushed to the lineitem scan."""
    import __spark_entry__ as e

    plan = _plan(e.queries()["sql19_or_of_ands"](spark, sf_dir))
    pushed = re.search(r"PushedFilters: \[([^\]]*)", plan).group(1)
    assert "l_quantity" in pushed


def test_bucketed_join_and_agg_are_shuffle_free(spark, sf_dir, tmp_path):
    """Two tables bucketed on the join key with equal bucket counts
    must join with ZERO Exchange (co-location baked into the layout),
    and a groupBy on the bucket key must aggregate without an Exchange
    — the write-once-shuffle-never contract of write_bucketed."""
    from mcyj_datapipeline_spark.io import read_table, write_bucketed

    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    write_bucketed(
        orders, "t_bkt_orders", str(tmp_path / "o"), "o_orderkey", 4,
        "o_orderkey",
    )
    write_bucketed(
        li, "t_bkt_lineitem", str(tmp_path / "l"), "o_orderkey", 4,
        "o_orderkey",
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = spark.table("t_bkt_orders").join(
            spark.table("t_bkt_lineitem"), "o_orderkey"
        )
        plan = _plan(j)
        assert "Exchange" not in plan
        assert "SortMergeJoin" in plan
        assert j.count() == li.count()

        agg = (
            spark.table("t_bkt_lineitem")
            .groupBy("o_orderkey")
            .agg(F.sum("l_quantity").alias("q"))
        )
        assert "Exchange" not in _plan(agg)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_bkt_orders")
        spark.sql("DROP TABLE IF EXISTS t_bkt_lineitem")
