"""Batch 17 semantic tests: CDC classification completeness, compaction
file-count behavior, and datasheet-delta reconciliation. Value parity
vs DuckDB runs in test_oracle_parity.py."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_cdc_classifies_every_bucket_correctly(spark):
    """Bucket 0 keys -> deleted, bucket 1 -> updated with new = round
    (old * 1.1, 2), bucket 2 clones -> inserted under key+1e8; buckets
    3-9 never appear in the feed."""
    from mcyj_datapipeline_spark.operators.hashing import hash60
    from mcyj_datapipeline_spark.registry_batch17 import j20_snapshot_diff_cdc

    out = j20_snapshot_diff_cdc(spark, SF).collect()
    # expected updated prices via the same engine-side HALF_UP round —
    # Python's round() is repr-based and disagrees on .xx5 boundaries
    orders = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderkey",
        "o_totalprice",
        F.round(F.col("o_totalprice") * 1.1, 2).alias("upd_price"),
        (hash60(F.col("o_orderkey").cast("string")) % 10).alias("b"),
    )
    buckets = {
        r["o_orderkey"]: (r["b"], r["upd_price"]) for r in orders.collect()
    }
    assert len(out) > 0
    seen_types = set()
    for r in out:
        k, ct = r["o_orderkey"], r["change_type"]
        seen_types.add(ct)
        if ct == "deleted":
            assert buckets[k][0] == 0
            assert r["new_price"] is None
        elif ct == "updated":
            assert buckets[k][0] == 1
            assert r["new_price"] == buckets[k][1]
        else:
            assert ct == "inserted"
            src = k - 100000000
            assert buckets[src][0] == 2
            assert r["old_price"] is None
    assert seen_types == {"deleted", "updated", "inserted"}
    # completeness: every bucket-0/1 key appears exactly once
    expect_del = {k for k, (b, _) in buckets.items() if b == 0}
    got_del = {r["o_orderkey"] for r in out if r["change_type"] == "deleted"}
    assert got_del == expect_del


def test_compaction_actually_reduces_file_count(spark):
    from mcyj_datapipeline_spark.registry_batch17 import (
        o13_compaction_roundtrip,
    )
    from mcyj_datapipeline_spark.session import session_scratch

    o13_compaction_roundtrip(spark, SF).collect()
    frag = glob.glob(
        os.path.join(session_scratch("compact"), "fragmented", "*.parquet")
    )
    comp = glob.glob(
        os.path.join(session_scratch("compact"), "compacted", "*.parquet")
    )
    assert len(frag) >= 32, f"fragmented write produced {len(frag)} files"
    assert 1 <= len(comp) <= 4, f"compaction produced {len(comp)} files"


def test_datasheet_delta_reconciles_with_direct_counts(spark):
    """docs_added/removed and token totals must reconcile with directly
    computed snapshot slices; overlap identity:
    n_new = n_old - removed + added."""
    from mcyj_datapipeline_spark.registry_batch17 import e15_datasheet_delta

    rows = e15_datasheet_delta(spark, SF).collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    old_n = docs.filter("doc_id < 450").count()
    new_n = docs.filter("doc_id >= 50").count()
    assert sum(r["n_docs_old"] for r in rows) == old_n
    assert sum(r["n_docs_new"] for r in rows) == new_n
    for r in rows:
        assert (
            r["n_docs_new"]
            == r["n_docs_old"] - r["docs_removed"] + r["docs_added"]
        )
        assert r["token_delta"] == r["tokens_new"] - r["tokens_old"]
