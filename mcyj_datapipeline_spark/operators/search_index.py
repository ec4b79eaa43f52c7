"""Incremental search-index maintenance (round 12): fold new
documents into a PERSISTED posting-list index and answer BM25 queries
from the folded state — the index-maintenance shape a 100 TB corpus
needs (re-tokenizing the corpus per query, which the one-shot
``text_bm25_topk`` scan models, stops being an option long before
100 TB; real retrieval stacks maintain postings incrementally and
queries touch only the query terms' slices).

Reference provenance: the reference's trie rebuild
(generate_prefix_trie.py — rebuilt from scratch each run) is the
from-scratch form of this; the fold is its incremental twin, same
contract as the e12/e17b nightly folds (run_full_pipeline.py:202-431
re-run idempotency).

State: two :class:`ParquetStateTable`s under one root —

* ``postings``: one row per ``(term, doc_id)`` with its term
  frequency, keyed by the composite ``posting_key`` (``term:doc_id``)
  so the keyed upsert is per-posting. Bucketing hashes the composite
  key, which balances the nightly merge; a production layout would
  partition by term-hash so QUERY reads prune to the query terms'
  buckets too (the Delta/Iceberg seam, same trade recorded for the
  dedup state tables).
* ``doclen``: one row per doc with its token count, keyed by doc_id.
  Corpus stats (N, avgdl) are derived from it at query time — one
  aggregate over a metadata-grain relation, never the corpus.

Idempotency: both tables are keyed upserts of rows derived
deterministically from the batch alone (tf and dl are per-document
facts), so re-folding a delivered batch rewrites identical rows —
crash/replay safe with no bookkeeping, like the release fold.

Scoring from state is the same two-shuffle plan as the scan-based
query: postings filtered to the query terms (|q| rows per matching
doc), df as a |q|-row broadcast, dl joined at doc grain, one per-doc
sum. The g-oracle (``text_bm25_topk``'s DuckDB SQL, reused VERBATIM
by the registered query) pins fold-then-score == scan-then-score.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mcyj_datapipeline_spark.streaming.incremental import ParquetStateTable


def open_index_state(
    spark: SparkSession, state_root: str, num_buckets: int | None = 8
) -> tuple[ParquetStateTable, ParquetStateTable]:
    postings = ParquetStateTable(
        spark,
        f"{state_root}/postings",
        key="posting_key",
        num_buckets=num_buckets,
    )
    doclen = ParquetStateTable(
        spark,
        f"{state_root}/doclen",
        key="doc_id",
        num_buckets=num_buckets,
    )
    return postings, doclen


def fold_index_batch(
    batch: DataFrame,
    postings: ParquetStateTable,
    doclen: ParquetStateTable,
) -> None:
    """ONE fold of a ``(doc_id, text)`` batch into the index state:
    tokenize the batch (the only corpus-sized work, batch-sized per
    fold), upsert its postings and doc lengths. Deterministic per
    batch → replay-idempotent."""
    from mcyj_datapipeline_spark.operators import text_analysis as TA

    toks = batch.select(
        "doc_id", F.explode(TA.tokens(F.col("text"))).alias("term")
    )
    tf = (
        toks.groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
        .select(
            F.concat_ws(":", "term", F.col("doc_id").cast("string")).alias(
                "posting_key"
            ),
            "term",
            "doc_id",
            "tf",
        )
    )
    postings.update(tf, ["term", "doc_id", "tf"])
    dl = batch.select(
        "doc_id",
        F.size(TA.tokens(F.col("text"))).cast("double").alias("dl"),
    )
    doclen.update(dl, ["dl"])


def bm25_topk_from_state(
    postings: ParquetStateTable,
    doclen: ParquetStateTable,
    terms: tuple[str, ...],
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 10,
) -> DataFrame:
    """Okapi BM25 top-k for ``terms`` answered from the FOLDED state:
    no text is read or tokenized. Same plan shape as the scan-based
    ``text_bm25_topk`` minus the tokenize pass — postings filtered to
    the query terms, df/stats as broadcast one-or-|q|-row aggregates,
    ``orderBy().limit()`` planning as TakeOrderedAndProject."""
    tf = (
        postings.read()
        .filter(F.col("term").isin(*terms))
        .select("doc_id", "term", F.col("tf").cast("double").alias("tf"))
    )
    df_ = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("double").alias("df")
    )
    dl = doclen.read().select(
        "doc_id", F.col("dl").cast("double").alias("dl")
    )
    stats = dl.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg("dl").alias("avgdl"),
    )
    contrib = (
        tf.join(F.broadcast(df_), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            (
                F.log(
                    F.lit(1.0)
                    + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5)
                )
                * F.col("tf")
                * (k1 + 1.0)
                / (
                    F.col("tf")
                    + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
                )
            ).alias("part"),
        )
    )
    scored = contrib.groupBy("doc_id").agg(
        F.round(F.sum("part"), 6).alias("score")
    )
    return scored.select("doc_id", "score").orderBy(
        F.desc("score"), F.asc("doc_id")
    ).limit(top_k)
