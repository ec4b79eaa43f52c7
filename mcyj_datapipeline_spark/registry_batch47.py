"""Batch 47 registry entries (round 7): training-corpus governance —

- ``decon_ngram_overlap``: benchmark decontamination by exact n-gram
  collision (the GPT-3/PaLM-style 13-gram rule, n=4 here: the synthetic corpus
  shares phrases at the 3-5-word grain, so 4 is the selective choice): any training document sharing a word n-gram with
  the held-out eval slice is flagged, with how many grams and how many
  eval documents it collides with. Complements the embedding-space
  ``decon_embedding_contamination`` (similarity.py): surface overlap
  vs semantic overlap are different leak channels.
- ``e19_stratified_split``: the per-STRATUM accounting readout of a
  deterministic hash train/val/test split (80/10/10) — counts and
  within-language fractions per (lang, split), the release-report
  companion to ``split_train_val_test`` (batch 3), which emits the
  per-document assignment itself. Bucket = (doc_id * 2654435761) mod
  1000, a pure-arithmetic Knuth hash both engines compute identically.
- ``text_gopher_quality_flags``: the Gopher-style rule gate as one
  row-per-document flag readout (token-count bounds, mean-word-length
  band, alpha ratio floor, stopword floor, top-token repetition
  ceiling) composed from the existing text_analysis signal columns —
  the per-rule WHY for every document the e4 cleaning pipeline drops.

Reference provenance: none direct — beyond-reference LLM-data-pipeline
operators per the SURVEY.md mandate.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mcyj_datapipeline_spark.io import read_table
from mcyj_datapipeline_spark.operators import text_analysis as TA
from mcyj_datapipeline_spark.registry import register

__all__ = [
    "decon_ngram_overlap",
    "e19_stratified_split",
    "text_gopher_quality_flags",
]


def _t(spark, sf_dir, name):
    return read_table(spark, sf_dir, name)


# ===========================================================================
# Benchmark decontamination by exact n-gram collision
# ===========================================================================

_DECON_N = 4  # synthetic docs share phrases at 3-5 words; 4 is selective
_EVAL_MOD = 97  # doc_id % 97 == 0 -> held-out benchmark slice

_DECON_ORACLE = f"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '\\s+'),
                         t -> t <> '') AS w
      FROM documents
    ), grams AS (
      SELECT DISTINCT doc_id,
             array_to_string(w[i.i:i.i + {_DECON_N} - 1], ' ') AS gram
      FROM toks,
           LATERAL (SELECT unnest(generate_series(
                    1, greatest(len(w) - {_DECON_N} + 1, 0))) AS i) i
    ),
    ev AS (SELECT doc_id AS eval_doc, gram FROM grams
           WHERE doc_id % {_EVAL_MOD} = 0),
    tr AS (SELECT doc_id, gram FROM grams
           WHERE doc_id % {_EVAL_MOD} <> 0)
    SELECT tr.doc_id,
           count(DISTINCT tr.gram) AS n_shared_grams,
           count(DISTINCT ev.eval_doc) AS n_eval_docs
    FROM tr JOIN ev USING (gram)
    GROUP BY tr.doc_id
    ORDER BY tr.doc_id
"""


@register(
    "decon_ngram_overlap",
    _DECON_ORACLE,
    f"Benchmark decontamination by exact {_DECON_N}-gram collision "
    "(the GPT-3 13-gram rule scaled to test-corpus phrase lengths): training "
    "docs sharing any word n-gram with the eval slice, with shared-"
    "gram and eval-doc counts. Scale: the benchmark side is SMALL by "
    "construction (eval suites are MBs) -> distinct eval grams "
    "broadcast; the training side streams map-side through one "
    "broadcast hash join + one groupBy on flagged docs only. No "
    "windows, no cartesians; at 100 TB swap the modulo eval marker "
    "for the real benchmark table and nothing else changes.",
)
def decon_ngram_overlap(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")

    def grams_of(df):
        toks = TA.tokens(F.col("text"))
        k = F.size(toks) - (_DECON_N - 1)
        grams = F.when(
            k >= 1,
            F.transform(
                F.sequence(F.lit(1), F.greatest(k, F.lit(1))),
                lambda i: F.concat_ws(" ", F.slice(toks, i, _DECON_N)),
            ),
        ).otherwise(F.array().cast("array<string>"))
        return df.select(
            "doc_id", F.explode(F.array_distinct(grams)).alias("gram")
        )

    ev = grams_of(
        docs.filter(F.col("doc_id") % _EVAL_MOD == 0)
    ).withColumnRenamed("doc_id", "eval_doc")
    tr = grams_of(docs.filter(F.col("doc_id") % _EVAL_MOD != 0))
    return (
        tr.join(F.broadcast(ev), "gram")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("gram").alias("n_shared_grams"),
            F.countDistinct("eval_doc").alias("n_eval_docs"),
        )
        .orderBy("doc_id")
    )


# ===========================================================================
# Deterministic stratified train/val/test split
# ===========================================================================

_SPLIT_MULT = 2654435761  # Knuth multiplicative hash constant

_SPLIT_ORACLE = f"""
    WITH tagged AS (
      SELECT lang,
             CASE WHEN (doc_id * {_SPLIT_MULT}) % 1000 < 800 THEN 'train'
                  WHEN (doc_id * {_SPLIT_MULT}) % 1000 < 900 THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    ), per AS (
      SELECT lang, split, count(*) AS n_docs FROM tagged GROUP BY 1, 2
    ), tot AS (
      SELECT lang, sum(n_docs) AS n_lang FROM per GROUP BY 1
    )
    SELECT per.lang, per.split, per.n_docs,
           round(per.n_docs / tot.n_lang, 6) AS frac_of_lang
    FROM per JOIN tot USING (lang)
    ORDER BY lang, split
"""


@register(
    "e19_stratified_split",
    _SPLIT_ORACLE,
    "Per-stratum accounting of the deterministic 80/10/10 split "
    "(counts + within-language fractions; the per-document assignment "
    "itself is split_train_val_test): bucket = (doc_id * Knuth-"
    "constant) mod 1000, pure integer arithmetic — reproducible "
    "across engines, runs, AND partitionings (never rand()). Scale: "
    "the split column is a row-local expression (zero shuffle to "
    "assign); accounting is one map-side-combined groupBy plus a "
    "broadcast join against per-language totals. At petabyte ids use "
    "pmod on a 128-bit hash to avoid bigint overflow (noted, not "
    "needed at any test sf).",
)
def e19_stratified_split(spark, sf_dir):
    bucket = (F.col("doc_id") * _SPLIT_MULT) % 1000
    tagged = _t(spark, sf_dir, "documents").select(
        "lang",
        F.when(bucket < 800, "train")
        .when(bucket < 900, "val")
        .otherwise("test")
        .alias("split"),
    )
    per = tagged.groupBy("lang", "split").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    tot = per.groupBy("lang").agg(F.sum("n_docs").alias("n_lang"))
    return (
        per.join(F.broadcast(tot), "lang")
        .select(
            "lang",
            "split",
            "n_docs",
            F.round(F.col("n_docs") / F.col("n_lang"), 6).alias(
                "frac_of_lang"
            ),
        )
        .orderBy("lang", "split")
    )


# ===========================================================================
# Gopher-style rule gate: per-document flag readout
# ===========================================================================

_GOPHER_ORACLE = """
    WITH toks AS (
      SELECT doc_id, text,
             list_filter(string_split_regex(text, '\\s+'),
                         t -> t <> '') AS w,
             list_filter(string_split_regex(lower(text), '\\s+'),
                         t -> t <> '') AS wl
      FROM documents
    ), rep AS (
      SELECT doc_id, max(c) AS top_c, sum(c) AS n_tok
      FROM (SELECT doc_id, tok, count(*) AS c
            FROM (SELECT doc_id, unnest(w) AS tok FROM toks)
            GROUP BY doc_id, tok)
      GROUP BY doc_id
    )
    SELECT t.doc_id,
           len(w) BETWEEN 20 AND 1000 AS len_ok,
           (list_sum(list_transform(w, x -> length(x)))::DOUBLE
              / greatest(len(w), 1)) BETWEEN 3 AND 10 AS mwl_ok,
           (length(regexp_replace(text, '[^A-Za-z ]', '', 'g'))::DOUBLE
              / greatest(length(text), 1)) >= 0.8 AS alpha_ok,
           (len(list_filter(wl, x -> list_contains(
              ['the','a','an','and','or','of','to','in','is','it'], x)))
              ::DOUBLE / greatest(len(wl), 1)) >= 0.05 AS stopword_ok,
           (rep.top_c::DOUBLE / rep.n_tok) <= 0.2 AS repetition_ok,
           (len(w) BETWEEN 20 AND 1000)
             AND ((list_sum(list_transform(w, x -> length(x)))::DOUBLE
                   / greatest(len(w), 1)) BETWEEN 3 AND 10)
             AND ((length(regexp_replace(text, '[^A-Za-z ]', '', 'g'))
                   ::DOUBLE / greatest(length(text), 1)) >= 0.8)
             AND ((len(list_filter(wl, x -> list_contains(
                   ['the','a','an','and','or','of','to','in','is','it'],
                   x)))::DOUBLE / greatest(len(wl), 1)) >= 0.05)
             AND ((rep.top_c::DOUBLE / rep.n_tok) <= 0.2) AS keep
    FROM toks t JOIN rep USING (doc_id)
    ORDER BY t.doc_id
"""


@register(
    "text_gopher_quality_flags",
    _GOPHER_ORACLE,
    "Gopher-rule gate as a per-document flag readout: token-count "
    "bounds [20,1000], mean-word-length band [3,10], alpha-ratio "
    "floor 0.8, stopword-ratio floor 0.05, top-token share ceiling "
    "0.2, and the conjunctive keep — the per-rule WHY behind every "
    "document the cleaning pipeline drops (rule-attribution is what "
    "corpus datasheets report). Scale: four signals are row-local "
    "expressions in one codegen stage; the repetition signal is one "
    "explode + two-level map-side-combined aggregation joined back "
    "on doc_id. Empty docs join with n_tok>=1 guard denominators.",
)
def text_gopher_quality_flags(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    rep = (
        docs.select(
            "doc_id", F.explode(TA.tokens(F.col("text"))).alias("tok")
        )
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_c"), F.sum("c").alias("n_tok"))
    )
    n_words = F.size(TA.tokens(F.col("text")))
    flags = docs.join(rep, "doc_id").select(
        "doc_id",
        n_words.between(20, 1000).alias("len_ok"),
        TA.mean_word_length(F.col("text")).between(3, 10).alias("mwl_ok"),
        (TA.alpha_ratio(F.col("text")) >= 0.8).alias("alpha_ok"),
        (TA.stopword_ratio(F.col("text")) >= 0.05).alias("stopword_ok"),
        ((F.col("top_c") / F.col("n_tok")) <= 0.2).alias("repetition_ok"),
    )
    return flags.select(
        "doc_id",
        "len_ok",
        "mwl_ok",
        "alpha_ok",
        "stopword_ok",
        "repetition_ok",
        (
            F.col("len_ok")
            & F.col("mwl_ok")
            & F.col("alpha_ok")
            & F.col("stopword_ok")
            & F.col("repetition_ok")
        ).alias("keep"),
    ).orderBy("doc_id")
