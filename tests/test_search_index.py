"""Semantic tests for the incremental BM25 index (round 12). Value
parity vs the verbatim text_bm25_topk oracle runs in
test_oracle_parity.py; here: fold idempotency, fold-vs-scan equality
in-engine, and incremental growth (a night's docs become findable
after its fold, ranks shift accordingly)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mcyj_datapipeline_spark.operators.search_index import (
    bm25_topk_from_state,
    fold_index_batch,
    open_index_state,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _state_snapshot(postings, doclen):
    return (
        sorted(map(tuple, postings.read().select(
            "posting_key", "term", "doc_id", "tf").collect())),
        sorted(map(tuple, doclen.read().select("doc_id", "dl").collect())),
    )


def test_fold_replay_is_noop(spark, tmp_path):
    postings, doclen = open_index_state(spark, str(tmp_path / "s"), 4)
    batch = _docs(
        spark,
        [(1, "hash join hash"), (2, "vector scan join")],
    )
    fold_index_batch(batch, postings, doclen)
    first = _state_snapshot(postings, doclen)
    fold_index_batch(batch, postings, doclen)  # re-delivery
    assert _state_snapshot(postings, doclen) == first
    # tf really is per-(term, doc): 'hash' twice in doc 1
    tf = {
        (r["term"], r["doc_id"]): r["tf"]
        for r in postings.read().collect()
    }
    assert tf[("hash", 1)] == 2.0 and tf[("join", 2)] == 1.0


def test_fold_then_score_equals_scan(spark, sf_dir):
    """The registered query vs the one-shot scan query, in-engine —
    the equality the verbatim oracle also pins."""
    from mcyj_datapipeline_spark import registry

    q = registry.queries()
    a = [tuple(r) for r in q["text_bm25_index_fold"](spark, sf_dir).collect()]
    b = [tuple(r) for r in q["text_bm25_topk"](spark, sf_dir).collect()]
    assert a == b and len(a) == 10


def test_incremental_growth_updates_ranking(spark, tmp_path):
    """Docs folded later are findable and corpus stats shift: after
    night 2 lands, its heavy-tf doc outranks night 1's."""
    postings, doclen = open_index_state(spark, str(tmp_path / "s"), 4)
    fold_index_batch(
        _docs(spark, [(1, "hash join filler words here"),
                      (2, "nothing relevant at all")]),
        postings, doclen,
    )
    top1 = bm25_topk_from_state(postings, doclen, ("hash", "join"), top_k=3)
    ids1 = [r["doc_id"] for r in top1.collect()]
    assert ids1[0] == 1 and 3 not in ids1
    fold_index_batch(
        _docs(spark, [(3, "hash hash join hash join")]), postings, doclen
    )
    top2 = bm25_topk_from_state(postings, doclen, ("hash", "join"), top_k=3)
    ids2 = [r["doc_id"] for r in top2.collect()]
    assert ids2[0] == 3 and 1 in ids2


# -- term-partitioned layout (storage-level query pruning) ---------------


def test_term_pruned_read_opens_only_query_buckets(spark, tmp_path):
    """The load-bearing claim of the term-partitioned layout: the
    pruned postings read's input files all live under the query
    terms' `_bucket=` dirs, and buckets holding no query term are
    not opened at all."""
    import re

    postings, doclen = open_index_state(
        spark, str(tmp_path / "s"), num_buckets=8, term_partitioned=True
    )
    rows = [(i, f"term{i % 20} filler common") for i in range(40)]
    fold_index_batch(_docs(spark, rows), postings, doclen)

    all_files = spark.read.parquet(str(tmp_path / "s/postings/data")).inputFiles()
    all_buckets = {re.search(r"_bucket=(\d+)", f).group(1) for f in all_files}
    assert len(all_buckets) > 2  # data actually spreads across buckets

    terms = ("term3", "term7")
    pruned = postings.read_pruned(terms)
    got_buckets = {
        re.search(r"_bucket=(\d+)", f).group(1) for f in pruned.inputFiles()
    }
    # at most one bucket per query term, and strictly fewer than all
    assert got_buckets and len(got_buckets) <= len(terms)
    assert got_buckets < all_buckets
    # and the pruned slice still contains every posting of the terms
    want = {
        (r["term"], r["doc_id"])
        for r in postings.read().filter(F.col("term").isin(*terms)).collect()
    }
    got = {
        (r["term"], r["doc_id"])
        for r in pruned.filter(F.col("term").isin(*terms)).collect()
    }
    assert got == want and len(want) == 4


def test_term_layout_scores_equal_key_layout(spark, tmp_path):
    """Same folds into both layouts → identical BM25 answers."""
    rows = [
        (1, "hash join hash filler"),
        (2, "vector scan join"),
        (3, "hash vector vector words"),
        (4, "nothing relevant"),
    ]
    pk, dk = open_index_state(spark, str(tmp_path / "key"), 4)
    pt, dt = open_index_state(
        spark, str(tmp_path / "term"), 4, term_partitioned=True
    )
    fold_index_batch(_docs(spark, rows), pk, dk)
    fold_index_batch(_docs(spark, rows), pt, dt)
    terms = ("hash", "vector")
    a = [tuple(r) for r in bm25_topk_from_state(pk, dk, terms).collect()]
    b = [tuple(r) for r in bm25_topk_from_state(pt, dt, terms).collect()]
    assert a == b and len(a) == 3


def test_layout_marker_refuses_mismatched_reopen(spark, tmp_path):
    import pytest

    open_index_state(spark, str(tmp_path / "s"), 4, term_partitioned=True)
    with pytest.raises(ValueError, match="layout"):
        open_index_state(spark, str(tmp_path / "s"), 4)


def test_bucket_col_requires_bucketed_layout(spark, tmp_path):
    import pytest

    from mcyj_datapipeline_spark.streaming.incremental import ParquetStateTable

    with pytest.raises(ValueError, match="bucketed"):
        ParquetStateTable(
            spark, str(tmp_path / "s"), key="k", bucket_col="c"
        )


# -- streaming fold (landing files -> foreachBatch -> state) -------------


def test_stream_fold_equals_batch_fold_and_restart_noop(spark, tmp_path):
    """Folding nights via the file-source stream lands the same state
    as folding them as plain batches, and re-running the stream with
    an intact checkpoint re-delivers nothing."""
    import os

    from mcyj_datapipeline_spark.operators.search_index import (
        stream_index_fold,
    )

    rows = [
        (1, "en", "hash join hash"),
        (2, "en", "vector scan join"),
        (3, "en", "hash vector words"),
    ]
    landing = tmp_path / "landing"
    landing.mkdir()
    for i, r in enumerate(rows):
        spark.createDataFrame([r], "doc_id long, lang string, text string") \
            .coalesce(1).write.mode("overwrite") \
            .parquet(str(landing / f"_b{i}"))
        import glob
        (part,) = glob.glob(str(landing / f"_b{i}" / "part-*.parquet"))
        os.replace(part, str(landing / f"night{i}.parquet"))
        import shutil
        shutil.rmtree(str(landing / f"_b{i}"))

    stream_index_fold(
        spark, str(landing), str(tmp_path / "st"), str(tmp_path / "ck"), 4
    )
    ps, ds = open_index_state(spark, str(tmp_path / "st"), 4)
    streamed = _state_snapshot(ps, ds)

    pb, db = open_index_state(spark, str(tmp_path / "batch"), 4)
    fold_index_batch(
        _docs(spark, [(d, t) for d, _, t in rows]), pb, db
    )
    assert streamed == _state_snapshot(pb, db)

    # restart with intact checkpoint: no new files, state unchanged
    stream_index_fold(
        spark, str(landing), str(tmp_path / "st"), str(tmp_path / "ck"), 4
    )
    assert _state_snapshot(ps, ds) == streamed
