"""Batch 26 semantic tests: truncation-recall bounds, FK-audit
completeness, and the Spark 4 transformWithStateInPandas processor —
equivalence with the legacy applyInPandasWithState path plus state
survival across a checkpointed restart."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

SF = "/root/testdata/sf0.001"

EV_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def test_truncation_recall_bounds_and_self_consistency(spark):
    """Recall values sit in [0,1] in fifths, mean matches the rows,
    and truncating to the FULL width would give recall 1.0 (sanity of
    the harness itself)."""
    from mcyj_datapipeline_spark.registry_batch26 import (
        _RECALL_K,
        sim_truncated_dim_recall,
    )

    rows = sim_truncated_dim_recall(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_overlap"] <= _RECALL_K
        assert abs(r["recall"] - r["n_overlap"] / _RECALL_K) < 1e-9
    mean = round(sum(r["recall"] for r in rows) / len(rows), 6)
    assert abs(rows[0]["mean_recall"] - mean) < 2e-6


def test_fk_audit_covers_all_relationships_and_counts_add_up(spark):
    """One row per declared FK; n_child equals the child table's row
    count; orphan share is consistent."""
    from mcyj_datapipeline_spark.registry_batch26 import (
        _FKS,
        dq5_referential_integrity,
    )

    rows = {r["relationship"]: r for r in dq5_referential_integrity(spark, SF).collect()}
    assert set(rows) == {name for name, *_ in _FKS}
    for name, child, _ckey, _parent, _pkey in _FKS:
        n = spark.read.parquet(f"{SF}/{child}.parquet").count()
        r = rows[name]
        assert r["n_child"] == n
        assert 0 <= r["n_orphan"] <= n
        assert abs(r["orphan_share"] - round(r["n_orphan"] / n, 6)) < 1e-9


@pytest.mark.skipif(
    not __import__(
        "mcyj_datapipeline_spark.streaming.stateful", fromlist=["x"]
    ).HAS_TRANSFORM_WITH_STATE,
    reason="transformWithStateInPandas needs Spark >= 4.0 + protobuf",
)
def test_transform_with_state_matches_legacy_api_and_survives_restart(
    spark, tmp_path
):
    """The Spark 4 StatefulProcessor path must produce the same final
    per-user totals as applyInPandasWithState on identical input, and
    a second AvailableNow run over NEW files must continue from
    checkpointed state, not restart from zero."""
    from mcyj_datapipeline_spark.streaming.stateful import (
        running_user_totals_stream,
        running_user_totals_tws,
    )

    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    batch1 = spark.createDataFrame(
        [(1, 10.0), (1, 5.0), (2, 1.0)], EV_SCHEMA
    )
    batch1.coalesce(1).write.mode("append").parquet(landing)

    def totals_of(out_dir):
        df = spark.read.parquet(out_dir)
        w = df.groupBy("user_id").agg(
            F.max("n_events").alias("n"), F.max("total_value").alias("v")
        )
        return {r["user_id"]: (r["n"], r["v"]) for r in w.collect()}

    legacy_out = str(tmp_path / "legacy_out")
    tws_out = str(tmp_path / "tws_out")
    running_user_totals_stream(
        spark, landing, str(tmp_path / "ck_legacy"), legacy_out, EV_SCHEMA
    )
    running_user_totals_tws(
        spark, landing, str(tmp_path / "ck_tws"), tws_out, EV_SCHEMA
    )
    assert totals_of(legacy_out) == totals_of(tws_out) == {
        1: (2, 15.0),
        2: (1, 1.0),
    }

    batch2 = spark.createDataFrame([(1, 2.5), (3, 7.0)], EV_SCHEMA)
    batch2.coalesce(1).write.mode("append").parquet(landing)
    running_user_totals_tws(
        spark, landing, str(tmp_path / "ck_tws"), tws_out, EV_SCHEMA
    )
    got = totals_of(tws_out)
    # user 1 continued from state (2, 15.0) -> (3, 17.5); user 3 fresh
    assert got[1] == (3, 17.5)
    assert got[3] == (1, 7.0)
    assert got[2] == (1, 1.0)
