"""Opportunistic Delta Lake twin of the ParquetStateTable MERGE seam.

The engine's keyed-state merge (``streaming/incremental.py
ParquetStateTable.update``) is the exact seam ``MERGE INTO`` fills on a
cluster with a table format: bucketed partition-pruned merge here,
file-pruned merge there. delta-spark is not in this sandbox, so the
module auto-skips — but wherever it IS importable, these tests run for
real: the same (initial, updates, expected) fixtures drive a genuine
``DeltaTable.merge`` and must agree row-for-row with
``ParquetStateTable.update``. That keeps the claim "this maps onto
Delta MERGE at cluster scale" executable instead of rhetorical.

NOTE: a Delta session needs its own SparkSession with the Delta SQL
extension installed; the module builds one (stopping the shared test
session would poison other modules, so the Delta session reuses the
JVM via getOrCreate on a cloned conf — see the fixture).
"""

from __future__ import annotations

import pytest

delta = pytest.importorskip(
    "delta", reason="delta-spark not installed; seam runs wherever it is"
)

from pyspark.sql import SparkSession  # noqa: E402


@pytest.fixture(scope="module")
def delta_spark():
    """Delta-enabled session. configure_spark_with_delta_pip pins the
    matching delta-spark jars for the installed pip version."""
    from delta import configure_spark_with_delta_pip

    builder = (
        SparkSession.builder.appName("delta-state-seam")
        .master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config(
            "spark.sql.extensions",
            "io.delta.sql.DeltaSparkSessionExtension",
        )
        .config(
            "spark.sql.catalog.spark_catalog",
            "org.apache.spark.sql.delta.catalog.DeltaCatalog",
        )
    )
    spark = configure_spark_with_delta_pip(builder).getOrCreate()
    yield spark


def _fixtures(spark):
    initial = spark.createDataFrame(
        [("a", 1, "x"), ("b", 2, "y"), ("c", 3, "z")],
        "k string, v int, tag string",
    )
    updates = spark.createDataFrame(
        [("b", 20, "y2"), ("d", 4, "w")],
        "k string, v int, tag string",
    )
    return initial, updates


def _rows(df):
    return sorted(tuple(r) for r in df.select("k", "v", "tag").collect())


def test_delta_merge_agrees_with_parquet_state_update(
    delta_spark, tmp_path
):
    from delta.tables import DeltaTable

    from mcyj_datapipeline_spark.streaming.incremental import (
        ParquetStateTable,
    )

    initial, updates = _fixtures(delta_spark)

    # engine side: bucketed partition-pruned merge
    st = ParquetStateTable(
        delta_spark, str(tmp_path / "pst"), key="k", num_buckets=4
    )
    st.write_initial(initial)
    engine = _rows(st.update(updates, ["v", "tag"]))

    # Delta side: the real MERGE INTO
    dpath = str(tmp_path / "delta")
    initial.write.format("delta").save(dpath)
    tbl = DeltaTable.forPath(delta_spark, dpath)
    (
        tbl.alias("t")
        .merge(updates.alias("u"), "t.k = u.k")
        .whenMatchedUpdate(set={"v": "u.v", "tag": "u.tag"})
        .whenNotMatchedInsertAll()
        .execute()
    )
    got = _rows(delta_spark.read.format("delta").load(dpath))

    assert got == engine == [
        ("a", 1, "x"),
        ("b", 20, "y2"),
        ("c", 3, "z"),
        ("d", 4, "w"),
    ]


def test_delta_merge_is_idempotent_like_state_update(delta_spark, tmp_path):
    """Re-merging the same batch must be a no-op on both sides — the
    retry contract every nightly fold depends on."""
    from delta.tables import DeltaTable

    initial, updates = _fixtures(delta_spark)
    dpath = str(tmp_path / "delta")
    initial.write.format("delta").save(dpath)
    tbl = DeltaTable.forPath(delta_spark, dpath)
    for _ in range(2):
        (
            tbl.alias("t")
            .merge(updates.alias("u"), "t.k = u.k")
            .whenMatchedUpdate(set={"v": "u.v", "tag": "u.tag"})
            .whenNotMatchedInsertAll()
            .execute()
        )
    got = _rows(delta_spark.read.format("delta").load(dpath))
    assert len(got) == 4
    assert ("b", 20, "y2") in got and ("d", 4, "w") in got
