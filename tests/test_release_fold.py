"""Semantic tests for the streaming release fold (e17b, round 12).

Value parity vs the e17 DuckDB oracle runs in test_oracle_parity.py
(the oracle string is reused verbatim); these tests pin the fold's
own contracts: min-id semilattice merge (replay/no-op idempotency,
later-duplicate screening, smaller-id takeover), metadata-only state
(text never stored), and batch-vs-stream equality in-engine.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mcyj_datapipeline_spark.streaming.release_fold import (
    fold_release_batch,
    open_release_state,
    publish_release,
    score_documents,
)

SF = "/root/testdata/sf0.001"


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "lang", "text"])


def _state_rows(state):
    return sorted(
        map(tuple, state.read().select(
            "content_sha", "doc_id", "lang", "quality", "tokens"
        ).collect())
    )


def test_fold_replay_is_noop(spark, tmp_path):
    state = open_release_state(spark, str(tmp_path / "s"), num_buckets=4)
    batch = _docs(
        spark,
        [(1, "en", "alpha beta gamma"), (2, "en", "delta epsilon zeta")],
    )
    fold_release_batch(batch, state)
    first = _state_rows(state)
    fold_release_batch(batch, state)  # streaming re-delivery
    assert _state_rows(state) == first


def test_fold_min_id_wins_across_batches(spark, tmp_path):
    state = open_release_state(spark, str(tmp_path / "s"), num_buckets=4)
    fold_release_batch(
        _docs(spark, [(5, "en", "same text here"), (9, "fr", "unique one")]),
        state,
    )
    # later duplicate with LARGER id: screened out
    fold_release_batch(_docs(spark, [(7, "de", "same text here")]), state)
    rows = {r["doc_id"]: r["lang"] for r in state.read().collect()}
    assert rows == {5: "en", 9: "fr"}
    # later duplicate with SMALLER id: takes over (first-id-wins is
    # global, not arrival-order — e17's row_number ORDER BY doc_id)
    fold_release_batch(_docs(spark, [(3, "it", "same text here")]), state)
    rows = {r["doc_id"]: r["lang"] for r in state.read().collect()}
    assert rows == {3: "it", 9: "fr"}


def test_fold_batch_internal_dedup_and_no_text_in_state(spark, tmp_path):
    state = open_release_state(spark, str(tmp_path / "s"), num_buckets=4)
    committed = fold_release_batch(
        _docs(
            spark,
            [(4, "en", "dup in batch"), (2, "fr", "dup in batch")],
        ),
        state,
    )
    assert [r["doc_id"] for r in committed.collect()] == [2]
    assert "text" not in state.read().columns  # metadata-grain state


def test_stream_fold_publishes_batch_answer(spark, sf_dir):
    """The registered e17b must equal e17 run in-engine on the same
    corpus — the stream/batch equality the verbatim oracle also pins,
    asserted here without DuckDB in the loop."""
    from mcyj_datapipeline_spark import registry

    q = registry.queries()
    a = sorted(map(tuple, q["e17b_stream_release_fold"](spark, sf_dir).collect()))
    b = sorted(map(tuple, q["e17_corpus_release_pipeline"](spark, sf_dir).collect()))
    assert a == b


def test_publish_release_matches_scored_path(spark):
    """publish_release over a window-deduped scored frame equals the
    fold-state path on the same tiny corpus (the two e17 halves
    compose the same way batch and stream use them)."""
    from pyspark.sql import Window

    rows = [
        (i, "en", f"word{i % 3} common text body {'x ' * (i % 5)}")
        for i in range(1, 21)
    ]
    docs = _docs(spark, rows)
    scored = score_documents(docs)
    w = Window.partitionBy("content_sha").orderBy("doc_id")
    deduped = (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("doc_id", "lang", "quality", "tokens")
    )
    direct = sorted(map(tuple, publish_release(deduped).collect()))
    best = (
        scored.groupBy("content_sha")
        .agg(F.min(F.struct("doc_id", "lang", "quality", "tokens")).alias("m"))
        .select("m.doc_id", "m.lang", "m.quality", "m.tokens")
    )
    via_min = sorted(map(tuple, publish_release(best).collect()))
    assert direct == via_min
