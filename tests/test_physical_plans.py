"""Physical-plan assertions: the properties that make these plans hold
at 100 TB — column pruning, predicate pushdown into the parquet scan,
broadcast of dimension sides, no shuffle where none is needed."""

from __future__ import annotations

import pytest

from mcyj_datapipeline_spark import registry


def plan_of(spark, sf_dir, name: str) -> str:
    df = registry.queries()[name](spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_scan_prunes_and_pushes(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "s3_scan_project_filter")
    # Only the 3 referenced columns are read; the shipdate predicate is
    # pushed into the scan.
    assert "l_orderkey" in plan and "l_extendedprice" in plan
    assert "l_comment" not in plan and "l_quantity" not in plan
    assert "l_shipdate" in plan.split("DataFilters")[1][:200]


def test_metadata_query_never_reads_text(spark, sf_dir):
    """SURVEY §4: column pruning must keep `text` out of metadata-only
    scans (the reference re-read full text for hash counting)."""
    plan = plan_of(spark, sf_dir, "a07_uniqueness_report")
    scan = [l for l in plan.splitlines() if "FileScan" in l][0]
    assert "text" not in scan


def test_enrichment_join_broadcasts(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "j01_left_enrich_join")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_flagship_broadcasts_dims(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "e3_flagship_revenue_rollup")
    # nation + region (tiny dims) must be broadcast, never shuffled.
    assert plan.count("BroadcastHashJoin") >= 2


def test_anti_join_is_join_not_subquery_scan(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "j06_anti_join_new_work")
    assert "LeftAnti" in plan


def test_work_queue_uses_take_ordered(spark, sf_dir):
    """O4: orderBy+limit must plan TakeOrderedAndProject (per-partition
    top-N + merge), not a global sort."""
    plan = plan_of(spark, sf_dir, "o4_bounded_work_queue")
    assert "TakeOrderedAndProject" in plan
    assert "Sort " not in plan or "TakeOrdered" in plan


def test_topk_uses_take_ordered(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "o6_top_k_by_aggregate")
    assert "TakeOrderedAndProject" in plan
