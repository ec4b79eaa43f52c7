"""Regression tests for the doc-export last-wins READ-ORDER contract
(`plans/doc_export.py:_stamp_file_read_order`).

The reference exporter loads enrichment CSVs sequentially into
``dict[sha] = row`` (``website/export_parquet_to_json.py:237-265``), so
a duplicate sha resolves to the row read LAST. Spark's file scan gives
no such order for free: splits are bin-packed into partitions by SIZE
descending, so both a bare ``monotonically_increasing_id`` (ADVICE r6)
and a ``coalesce(1)`` concatenation (ADVICE r7 — unequal splits of one
file concatenate in size order, not offset order) can disagree with
sequential read order. The fix stamps ``_ord`` from the scan's hidden
``_metadata`` column as (file_path, file_block_start, row counter).

Both tests compare against an oracle built the reference's way: read
the same files sequentially in sorted-path order into a plain dict.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from mcyj_datapipeline_spark.plans.doc_export import (
    _stamp_file_read_order,
    build_doc_export,
)

_SCHEMA = (
    "sha256 string, agency_id string, agency_name string, "
    "document_title string, date string, is_special_investigation string"
)


def _sequential_dict_load(paths):
    """The reference's loader shape: csv rows into dict[sha]=row, files
    in the given order — last occurrence wins."""
    import csv

    winners = {}
    for p in paths:
        with open(p, newline="") as fh:
            for row in csv.DictReader(fh):
                if row["sha256"].strip():
                    winners[row["sha256"].strip()] = row
    return winners


def _write_csvs(tmp_path, n_files, rows_per_file, shas):
    """n_files CSVs, every sha repeated in every file with a
    file-specific agency_id so the winner identifies the winning row."""
    paths = []
    for i in range(n_files):
        p = tmp_path / f"info_{i:02d}.csv"
        with open(p, "w") as fh:
            fh.write(
                "sha256,agency_id,agency_name,document_title,date,"
                "is_special_investigation\n"
            )
            for j in range(rows_per_file):
                sha = shas[j % len(shas)]
                fh.write(
                    f"{sha},F{i:02d}R{j:04d},Agency {i},Title,"
                    f"2020-01-0{(j % 9) + 1},false\n"
                )
        paths.append(str(p))
    return sorted(paths)


def _docs_frame(spark, shas):
    return spark.createDataFrame(
        [(s, "2024-01-01", ["p"]) for s in shas],
        "sha256 string, dateprocessed string, text array<string>",
    )


def test_multi_file_last_wins_matches_sequential_load(spark, tmp_path):
    """3 files, every sha duplicated across all of them and within each
    one; the exported metadata must match the sequential dict-load of
    the files in sorted-path order, whatever partitioning the scan
    chose."""
    shas = [c * 64 for c in "abcde"]
    paths = _write_csvs(tmp_path, n_files=3, rows_per_file=50, shas=shas)
    info = spark.read.csv(
        os.path.dirname(paths[0]), header=True, schema=_SCHEMA
    )
    # the scan must actually be multi-partition for this test to mean
    # anything — otherwise any stamp passes trivially
    assert info.rdd.getNumPartitions() >= 3
    expect = _sequential_dict_load(paths)
    out = build_doc_export(_docs_frame(spark, shas), document_info=info)
    got = {
        r["sha256"]: r["metadata"]["agency_id"]
        for r in out.select("sha256", "metadata").collect()
    }
    assert got == {s: expect[s]["agency_id"] for s in shas}


def test_single_file_multi_split_last_wins(spark, tmp_path):
    """One CSV forced into many small splits (maxPartitionBytes): the
    ADVICE-r7 scenario where coalesce(1) concatenates splits in
    bin-packing (size-desc) order. The _metadata stamp orders by byte
    offset, so the file's true last row must still win."""
    shas = [c * 64 for c in "xyz"]
    paths = _write_csvs(tmp_path, n_files=1, rows_per_file=400, shas=shas)
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    old_cost = spark.conf.get("spark.sql.files.openCostInBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", "4096")
        spark.conf.set("spark.sql.files.openCostInBytes", "0")
        info = spark.read.csv(paths[0], header=True, schema=_SCHEMA)
        assert info.rdd.getNumPartitions() >= 4
        expect = _sequential_dict_load(paths)
        out = build_doc_export(
            _docs_frame(spark, shas), document_info=info
        )
        got = {
            r["sha256"]: r["metadata"]["agency_id"]
            for r in out.select("sha256", "metadata").collect()
        }
        assert got == {s: expect[s]["agency_id"] for s in shas}
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)
        spark.conf.set("spark.sql.files.openCostInBytes", old_cost)


def test_stamp_returns_none_for_in_memory_frames(spark):
    """Derived frames have no file read order; the stamp must decline
    (None) so keyed() falls back instead of mis-resolving."""
    df = spark.createDataFrame([("a",)], "sha256 string")
    assert _stamp_file_read_order(df) is None


def test_stamp_returns_none_for_shuffled_scan(spark, tmp_path):
    """_metadata resolves THROUGH a repartition, but the row counter
    then numbers post-shuffle partitions, not within-split order — the
    stamp must decline rather than mint a wrong winner (ADVICE r8)."""
    shas = [c * 64 for c in "ab"]
    paths = _write_csvs(tmp_path, n_files=2, rows_per_file=10, shas=shas)
    info = spark.read.csv(
        os.path.dirname(paths[0]), header=True, schema=_SCHEMA
    )
    assert _stamp_file_read_order(info) is not None
    assert _stamp_file_read_order(info.repartition(4)) is None
    assert _stamp_file_read_order(info.repartition(4, "sha256")) is None


def test_stamp_declines_any_reordering_node(spark, tmp_path):
    """The r9 review generalized the ADVICE-r8 finding: repartition is
    not the only order-destroying node _metadata survives — sort and
    sample also reorder/move rows. The whitelist guard must decline
    them all while still stamping plain projected/filtered scans."""
    shas = [c * 64 for c in "ab"]
    paths = _write_csvs(tmp_path, n_files=2, rows_per_file=10, shas=shas)
    info = spark.read.csv(
        os.path.dirname(paths[0]), header=True, schema=_SCHEMA
    )
    assert _stamp_file_read_order(info) is not None
    assert (
        _stamp_file_read_order(info.filter(F.col("sha256") != ""))
        is not None
    )
    assert _stamp_file_read_order(info.select("sha256", "agency_id")) is not None
    assert _stamp_file_read_order(info.orderBy("date")) is None
    assert _stamp_file_read_order(info.sample(0.5, seed=1)) is None
    assert _stamp_file_read_order(info.sortWithinPartitions("date")) is None
    assert _stamp_file_read_order(info.limit(5)) is None


def test_whitelist_accepts_datasource_v2_node_names(spark, tmp_path):
    """A DSv2 file scan prints ``RelationV2`` in the optimized plan;
    the old ``[A-Za-z]+`` capture truncated it to ``RelationV`` and
    silently declined EVERY v2 plan into the coalesce(1) fallback
    (ADVICE r9). The whitelist check must capture digit-bearing node
    names whole and accept a pure Project/Filter/RelationV2 plan —
    exercised directly on a REAL v2 optimized plan string (Spark 4's
    v2 scans don't resolve ``_metadata`` yet, so the stamp itself
    still declines earlier for them; fail-closed either way)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from mcyj_datapipeline_spark.plans.doc_export import (
        _plan_is_order_preserving_scan,
    )

    p = str(tmp_path / "v2src")
    os.makedirs(p)
    pq.write_table(
        pa.table({"sha256": ["a" * 64, "b" * 64], "agency_id": [1, 2]}),
        os.path.join(p, "part0.parquet"),
    )
    old = spark.conf.get("spark.sql.sources.useV1SourceList")
    try:
        spark.conf.set("spark.sql.sources.useV1SourceList", "")
        df = spark.read.parquet(p).select("sha256").filter(
            F.col("sha256") != ""
        )
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        assert "RelationV2" in plan, f"fixture not v2:\n{plan}"
        assert _plan_is_order_preserving_scan(plan)
        sorted_plan = (
            df.orderBy("sha256")
            ._jdf.queryExecution()
            .optimizedPlan()
            .toString()
        )
        assert not _plan_is_order_preserving_scan(sorted_plan)
        # v2 scans still decline at the _metadata resolution (no stamp
        # basis exists) — fail-closed, never a wrong stamp
        assert _stamp_file_read_order(spark.read.parquet(p)) is None
    finally:
        spark.conf.set("spark.sql.sources.useV1SourceList", old)
