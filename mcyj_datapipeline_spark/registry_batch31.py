"""Batch 31 registry entries (round 6, continued): three
training-data-curation gaps the inventory still had open —

- ``sim_hard_negatives``: hard-negative mining for contrastive /
  embedding training (the retrieval-training twin of
  ``text_similar_docs_topk``): per anchor, the most-similar vectors
  with a DIFFERENT label, near-duplicates excluded by a cosine
  ceiling.
- ``text_boolean_retrieval``: AND/NOT boolean retrieval over the
  token inverted index — the third retrieval mode next to positional
  phrase search (``text_phrase_search``) and ranked BM25
  (``text_bm25_topk``).
- ``text_ngram_novelty``: per-document novelty share — the fraction
  of a document's distinct word trigrams that occur in NO other
  document — the diversity/memorization-risk signal dual to the
  duplication signals in the dedup family.

Reference provenance: none direct — these are the standard curation
ops a large-scale pipeline adds beyond the reference's document
workflow (SURVEY.md "beyond-reference" mandate)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mcyj_datapipeline_spark.io import read_table
from mcyj_datapipeline_spark.operators import dedup as D
from mcyj_datapipeline_spark.operators import similarity as S
from mcyj_datapipeline_spark.operators import text_analysis as TA
from mcyj_datapipeline_spark.registry import register

__all__ = [
    "sim_hard_negatives",
    "text_boolean_retrieval",
    "text_ngram_novelty",
]


def _t(spark, sf_dir, name):
    return read_table(spark, sf_dir, name)


# ===========================================================================
# Hard-negative mining — per anchor, top-k most-similar vectors with a
# different label, cosine < ceiling (near-dups are mislabeled
# positives, not negatives). Anchor batch: the same fixed vec_id < 8
# slice every sim_* query uses.
# ===========================================================================

_HN_K = 5
_HN_CEIL = 0.99


@register(
    "sim_hard_negatives",
    f"""
    WITH q AS (
      SELECT vec_id AS anchor_id, label AS a_label, embedding AS qv
      FROM embeddings WHERE vec_id < 8
    ), c AS (
      SELECT vec_id AS negative_id, label AS n_label, embedding AS cv
      FROM embeddings
    ), scored AS (
      SELECT q.anchor_id, c.negative_id,
             round(
               list_sum([qv[i]::DOUBLE * cv[i]::DOUBLE
                         for i in range(1, len(qv) + 1)]) /
               (sqrt(list_sum([qv[i]::DOUBLE * qv[i]::DOUBLE
                               for i in range(1, len(qv) + 1)])) *
                sqrt(list_sum([cv[i]::DOUBLE * cv[i]::DOUBLE
                               for i in range(1, len(cv) + 1)]))),
             6) AS cosine
      FROM c CROSS JOIN q
      WHERE c.n_label <> q.a_label
    )
    SELECT anchor_id, negative_id, cosine, rank FROM (
      SELECT anchor_id, negative_id, cosine,
             row_number() OVER (PARTITION BY anchor_id
                                ORDER BY cosine DESC, negative_id) AS rank
      FROM scored WHERE cosine < {_HN_CEIL}
    ) WHERE rank <= {_HN_K}
    """,
    "Hard-negative mining for contrastive training: per anchor "
    "(fixed vec_id<8 batch), the top-5 most-cosine-similar corpus "
    f"vectors with a DIFFERENT label, capped at cosine < {_HN_CEIL} "
    "so near-duplicates (almost certainly mislabeled positives) never "
    "enter the negative pool. Plan: broadcast anchor batch, ONE "
    "corpus scan scores JVM-side (zip_with/aggregate dot products), "
    "label filter and ceiling applied before the per-anchor "
    "row_number top-k — the corpus never shuffles; only the surviving "
    "candidate rows do. Cosines round to 6dp (raw pairwise dots are "
    "operand-order-identical cross-engine).",
)
def sim_hard_negatives(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    anchors = emb.filter(F.col("vec_id") < 8)
    return S.hard_negatives(emb, anchors, k=_HN_K, max_cosine=_HN_CEIL)


# ===========================================================================
# Boolean retrieval — docs containing ALL of the must-terms and NONE
# of the must-not terms. The posting lists are filtered to the query's
# terms BEFORE any shuffle, so the aggregate moves O(|q| · df) rows,
# never the token stream.
# ===========================================================================

_BOOL_MUST = ("hash", "join")
_BOOL_MUST_NOT = ("vector",)


def _sql_list(terms):
    """Render a term tuple as a SQL IN-list — the oracle interpolates
    the SAME constants the Spark side reads, so editing the query
    terms cannot desync the twins."""
    return ", ".join("'" + t + "'" for t in terms)


@register(
    "text_boolean_retrieval",
    f"""
    WITH toks AS (
      SELECT doc_id, lang,
             unnest(list_distinct(
               list_filter(string_split_regex(text, '\\s+'),
                           t -> t <> ''))) AS term
      FROM documents
    ), hits AS (
      SELECT doc_id, lang,
             sum(CASE WHEN term IN ({_sql_list(_BOOL_MUST)}) THEN 1
                      ELSE 0 END) AS n_must,
             sum(CASE WHEN term IN ({_sql_list(_BOOL_MUST_NOT)}) THEN 1
                      ELSE 0 END) AS n_not
      FROM toks
      WHERE term IN ({_sql_list(_BOOL_MUST + _BOOL_MUST_NOT)})
      GROUP BY doc_id, lang
    )
    SELECT doc_id, lang FROM hits
    WHERE n_must = {len(_BOOL_MUST)} AND n_not = 0
    ORDER BY doc_id
    """,
    "Boolean retrieval (hash AND join AND NOT vector) over the token "
    "inverted index — the third retrieval mode next to positional "
    "phrase search and ranked BM25. Plan: tokenize once, keep ONLY "
    "postings for the query's terms (a map-side isin filter — the "
    "shuffle moves O(|query| x df) rows, never the token stream), one "
    "conditional-count groupBy decides AND/NOT membership. At 100 TB "
    "this is the same two-stage shape regardless of corpus size; a "
    "persisted inverted index would replace the tokenize scan with a "
    "term-range parquet read.",
)
def text_boolean_retrieval(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    all_terms = list(_BOOL_MUST) + list(_BOOL_MUST_NOT)
    postings = docs.select(
        "doc_id",
        "lang",
        F.explode(F.array_distinct(TA.tokens(F.col("text")))).alias("term"),
    ).filter(F.col("term").isin(*all_terms))
    hits = postings.groupBy("doc_id", "lang").agg(
        F.sum(
            F.when(F.col("term").isin(*_BOOL_MUST), 1).otherwise(0)
        ).alias("n_must"),
        F.sum(
            F.when(F.col("term").isin(*_BOOL_MUST_NOT), 1).otherwise(0)
        ).alias("n_not"),
    )
    return (
        hits.filter(
            (F.col("n_must") == len(_BOOL_MUST)) & (F.col("n_not") == 0)
        )
        .select("doc_id", "lang")
        .orderBy("doc_id")
    )


# ===========================================================================
# Per-document n-gram novelty — fraction of a doc's distinct word
# trigrams that appear in no other document. High novelty = unique
# content worth keeping; low novelty = templated/boilerplate-heavy.
# The inverse signal of the dedup family's shared-shingle metrics.
# ===========================================================================


@register(
    "text_ngram_novelty",
    """
    WITH sh AS (
      SELECT doc_id, lang,
             list_distinct([array_to_string(w[i:i+2], ' ')
                            for i in range(1, len(w) - 1)]) AS sh
      FROM (SELECT doc_id, lang, string_split(text, ' ') AS w
            FROM documents)
      WHERE len(w) >= 3
    ), inv AS (
      SELECT doc_id, lang, unnest(sh) AS shingle FROM sh
    ), df AS (
      SELECT shingle, count(*) AS df FROM inv GROUP BY shingle
    )
    SELECT i.doc_id, i.lang,
           count(*) AS n_shingles,
           sum(CASE WHEN d.df = 1 THEN 1 ELSE 0 END)::BIGINT AS n_novel,
           round(sum(CASE WHEN d.df = 1 THEN 1 ELSE 0 END)::DOUBLE
                 / count(*), 6) AS novelty
    FROM inv i JOIN df d ON d.shingle = i.shingle
    GROUP BY i.doc_id, i.lang
    ORDER BY i.doc_id
    """,
    "Per-document n-gram novelty: the share of a doc's distinct word "
    "trigrams (the dedup family's shingling, dedup.word_shingles n=3) "
    "that occur in NO other document — the diversity signal dual to "
    "the duplication metrics. Plan: one shingle explode feeds a "
    "corpus-wide document-frequency groupBy and a join back to the "
    "per-doc rollup — two shuffles total. At 100 TB the df shuffle "
    "carries the distinct (doc, gram) postings; the hash-first "
    "variant (8-byte hash60 keys with exact-string confirm, the "
    "dedup_repeated_ngram_spans pattern) drops shuffle bytes ~10x "
    "when grams are long.",
)
def text_ngram_novelty(spark, sf_dir):
    # No join back onto the posting list: a df=1 shingle has exactly
    # one owner, so min(struct(doc,lang)) riding the df aggregate IS
    # the owner — per-doc novel counts then come from the tiny
    # unique-shingle relation. ONE explode feeds both the totals
    # groupBy and the df groupBy (back to the r9 shape — the
    # r10-interim persisted-shingle-array variant was measured and
    # reversed: caching 2.6M string arrays costs ~15 s at sf1, and a
    # no-persist size()-based variant triples the text passes via
    # the inferred size() filter under the attribute explode; this
    # shape shingles once and was the fastest of the three at sf1,
    # 17.2 vs 17.4 vs 55.4 s min-of-3).
    docs = _t(spark, sf_dir, "documents")
    inv = docs.select(
        "doc_id",
        "lang",
        F.explode(D.word_shingles(F.col("text"), 3)).alias("shingle"),
    )
    totals = inv.groupBy("doc_id", "lang").agg(
        F.count(F.lit(1)).alias("n_shingles")
    )
    dfagg = inv.groupBy("shingle").agg(
        F.count(F.lit(1)).alias("df"),
        F.min(F.struct("doc_id", "lang")).alias("owner"),
    )
    novel = (
        dfagg.filter(F.col("df") == 1)
        .groupBy(
            F.col("owner.doc_id").alias("doc_id"),
            F.col("owner.lang").alias("lang"),
        )
        .agg(F.count(F.lit(1)).alias("n_novel"))
    )
    return (
        totals.join(novel, ["doc_id", "lang"], "left")
        .na.fill({"n_novel": 0})
        .select(
            "doc_id",
            "lang",
            "n_shingles",
            "n_novel",
            F.round(
                F.col("n_novel").cast("double") / F.col("n_shingles"), 6
            ).alias("novelty"),
        )
        .orderBy("doc_id")
    )
