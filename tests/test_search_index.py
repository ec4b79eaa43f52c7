"""Semantic tests for the incremental BM25 index (round 12). Value
parity vs the verbatim text_bm25_topk oracle runs in
test_oracle_parity.py; here: fold idempotency, fold-vs-scan equality
in-engine, and incremental growth (a night's docs become findable
after its fold, ranks shift accordingly)."""

from __future__ import annotations

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
