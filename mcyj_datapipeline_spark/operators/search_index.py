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
  so the keyed upsert is per-posting. Two bucketings: hashing the
  composite key balances the nightly merge but query reads open every
  bucket; ``term_partitioned=True`` hashes the TERM instead, so query
  reads prune to the query terms' buckets at the storage level (the
  trade measured in SCALE.md r12; hot-term skew is the cost, bounded
  by ``num_buckets`` and the writer's one-file-per-task split).
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
    spark: SparkSession,
    state_root: str,
    num_buckets: int | None = 8,
    term_partitioned: bool = False,
) -> tuple[ParquetStateTable, ParquetStateTable]:
    """``term_partitioned=True`` buckets postings by ``term`` hash
    instead of the composite ``posting_key`` — the production layout
    the module docstring records as the trade: QUERY reads prune to
    the query terms' buckets at the storage level
    (:meth:`ParquetStateTable.read_pruned` — untouched buckets
    contribute zero input splits), at the cost of (a) a nightly fold
    touching ~every bucket (a batch's terms spread across the hash
    space either way) and (b) a hot term concentrating its postings
    in one bucket (scale ``num_buckets`` with corpus vocabulary; the
    writer still splits a hot bucket across one file per task). The
    two layouts are disjoint on disk, so the root records its layout
    in a ``_LAYOUT`` marker and a mismatched reopen refuses instead
    of silently seeing misplaced state (the dedup-state precedent)."""
    import os

    layout = "term" if term_partitioned else "key"
    marker = os.path.join(state_root, "_LAYOUT")
    if os.path.exists(marker):
        with open(marker) as f:
            existing = f.read().strip()
        if existing != layout:
            raise ValueError(
                f"index state at {state_root} has layout {existing!r}, "
                f"reopened as {layout!r} — the layouts are disjoint on "
                "disk; use a fresh root or the matching flag"
            )
    else:
        os.makedirs(state_root, exist_ok=True)
        with open(marker, "w") as f:
            f.write(layout)
    postings = ParquetStateTable(
        spark,
        f"{state_root}/postings",
        key="posting_key",
        num_buckets=num_buckets,
        bucket_col="term" if term_partitioned else None,
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


def stream_index_fold(
    spark: SparkSession,
    landing_dir: str,
    state_root: str,
    checkpoint_dir: str,
    num_buckets: int | None = 8,
    term_partitioned: bool = False,
    max_files_per_trigger: int | None = None,
) -> None:
    """The index fold as a real Structured-Streaming query: file
    source over the landing dir → ``foreachBatch(fold_index_batch)``
    → ``Trigger.AvailableNow`` + checkpoint — e12c/e17b's
    exactly-once story applied to posting-list maintenance. Offsets
    are written before a batch and commits after; a crash re-delivers
    the batch, and the fold's keyed per-(term, doc) upserts make
    re-delivery a rewrite of identical rows (the module's idempotency
    contract), so restart safety needs no extra bookkeeping."""
    postings, doclen = open_index_state(
        spark, state_root, num_buckets, term_partitioned
    )

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        pinned = batch_df.select("doc_id", "text").localCheckpoint(
            eager=True
        )
        fold_index_batch(pinned, postings, doclen)

    reader = spark.readStream.schema(
        "doc_id long, lang string, text string"
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(landing_dir)
    (
        stream.writeStream.foreachBatch(_fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


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
    ``orderBy().limit()`` planning as TakeOrderedAndProject.

    On a term-partitioned index the postings read is PRUNED to the
    query terms' buckets (``_bucket IN`` at partition discovery —
    untouched buckets contribute zero input splits); the term filter
    stays on top because a bucket holds every term that hashes to it."""
    if postings.bucket_col == "term":
        base = postings.read_pruned(terms)
    else:
        base = postings.read()
    tf = (
        base.filter(F.col("term").isin(*terms))
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
