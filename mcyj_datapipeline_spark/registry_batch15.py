"""Batch 15 registry entries (round 6, continued): market-basket
association rules (the a-priori 2-itemset pass), PMI collocation
mining, BPE encode (tokenizer application over the trained merges),
and the daily new-vs-returning user split.

Reference provenance: the reference's aggregation surface is counts
and rollups (A3/A9/A12); these add the co-occurrence-strength and
tokenizer-application layers a curation/analytics pipeline asks next
on the same tables — each as a declarative DataFrame plan with a
DuckDB value oracle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mcyj_datapipeline_spark.io import read_table
from mcyj_datapipeline_spark.registry import register
from mcyj_datapipeline_spark.registry_batch13 import _bpe_blocks


def _t(spark, sf_dir, name):
    return read_table(spark, sf_dir, name)


# ===========================================================================
# MB: market-basket association rules over order baskets
# ===========================================================================

@register(
    "mb_association_rules",
    """
    WITH b AS (SELECT DISTINCT l_orderkey AS basket, l_partkey AS item
               FROM lineitem),
    supp AS (SELECT item, count(*) AS s FROM b GROUP BY item),
    freq AS (SELECT item FROM supp WHERE s >= 3),
    bf AS (SELECT b.* FROM b JOIN freq USING (item)),
    pairs AS (
      SELECT a.item AS item_a, c.item AS item_b, count(*) AS pair_support
      FROM bf a JOIN bf c
        ON a.basket = c.basket AND a.item < c.item
      GROUP BY a.item, c.item
      HAVING count(*) >= 3
    ),
    n AS (SELECT count(DISTINCT basket)::DOUBLE AS n_baskets FROM b),
    rules AS (
      SELECT item_a AS antecedent, item_b AS consequent, pair_support
      FROM pairs
      UNION ALL
      SELECT item_b, item_a, pair_support FROM pairs
    )
    SELECT r.antecedent, r.consequent, r.pair_support,
           round(r.pair_support / sa.s, 6) AS confidence,
           round((r.pair_support / sa.s) / (sc.s / n.n_baskets), 6) AS lift
    FROM rules r
    JOIN supp sa ON sa.item = r.antecedent
    JOIN supp sc ON sc.item = r.consequent, n
    ORDER BY r.antecedent, r.consequent
    """,
    "Market-basket association rules (a-priori 2-itemset pass) over "
    "order baskets: items co-ordered at least 3 times yield both "
    "directed rules with support, confidence and lift. The scale story "
    "IS the pruning — infrequent items are semi-joined away BEFORE the "
    "quadratic basket self-join (a-priori monotonicity), the pair "
    "floor applies straight after the count, and item supports plus "
    "the one-row basket total broadcast onto the surviving pairs. One "
    "basket-key shuffle regardless of catalog size.",
)
def mb_association_rules(spark, sf_dir):
    from mcyj_datapipeline_spark.operators.basket import (
        association_rules_pairs,
    )

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    out = association_rules_pairs(
        li, "l_orderkey", "l_partkey", min_item_support=3, min_pair_support=3
    )
    return out.select(
        F.col("antecedent"),
        F.col("consequent"),
        "pair_support",
        "confidence",
        "lift",
    ).orderBy("antecedent", "consequent")


# ===========================================================================
# PMI collocations over documents
# ===========================================================================

@register(
    "text_pmi_bigrams",
    """
    WITH toks AS (
      SELECT list_filter(string_split_regex(text, '\\s+'), t -> t <> '')
               AS ws
      FROM documents
    ), uni AS (
      SELECT w, count(*) AS c
      FROM (SELECT unnest(ws) AS w FROM toks) GROUP BY w
    ), tot AS (SELECT sum(c)::DOUBLE AS t_tok FROM uni),
    big AS (
      SELECT g AS bigram, count(*) AS c_ab FROM (
        SELECT unnest([ws[i] || ' ' || ws[i+1]
                       for i in range(1, len(ws))]) AS g
        FROM toks WHERE len(ws) >= 2
      ) GROUP BY g HAVING count(*) >= 5
    ), btot AS (
      SELECT sum(greatest(len(ws) - 1, 0))::DOUBLE AS t_big FROM toks
    )
    SELECT bigram, c_ab,
           round(ln((c_ab / t_big) /
                    ((ua.c / t_tok) * (ub.c / t_tok))), 6) AS pmi
    FROM big
    JOIN uni ua ON ua.w = string_split(bigram, ' ')[1]
    JOIN uni ub ON ub.w = string_split(bigram, ' ')[2], tot, btot
    ORDER BY pmi DESC, bigram LIMIT 25
    """,
    "Collocation mining: top-25 word bigrams by pointwise mutual "
    "information over token occurrences with a count-5 floor — the "
    "above-chance co-occurrence signal a tokenizer or n-gram blocklist "
    "wants, complementing a05's raw document-frequency ranking. Three "
    "column-pruned passes (unigram explode, bigram explode, no-explode "
    "totals), each collapsing map-side before any shuffle; the "
    "vocabulary-sized unigram relation is checkpointed once and "
    "broadcasts onto the floor-filtered bigrams, the two totals "
    "ride along as one-row broadcasts. The top-25 cut orders on "
    "round(pmi, 6) with the bigram as tie-break, so it is "
    "deterministic across engines.",
)
def text_pmi_bigrams(spark, sf_dir):
    from mcyj_datapipeline_spark.operators.text_analysis import pmi_bigrams

    docs = _t(spark, sf_dir, "documents")
    return pmi_bigrams(docs, min_count=5, top_k=25)


# ===========================================================================
# BPE encode: segmentation of every word type under the trained merges
# ===========================================================================

def _bpe_encode_oracle_sql() -> str:
    blocks, _selects, final = _bpe_blocks()
    return (
        "WITH "
        + ",".join(blocks)
        + f"""
    SELECT w, cnt, sym AS pieces,
           len(string_split(sym, ' ')) AS n_pieces
    FROM {final} ORDER BY w"""
    )


@register(
    "text_bpe_encode_vocab",
    _bpe_encode_oracle_sql(),
    "BPE tokenizer APPLICATION: the segmentation of every word TYPE "
    "after the 3 trained merge rounds, with its corpus frequency — "
    "(w, cnt, pieces, n_pieces). Encoding rides the training loop for "
    "free: the word table after the k-th rewrite IS the encoded "
    "vocabulary, so serving-time corpus encoding is a join of the "
    "(vocabulary-sized) word table against this relation — per-word "
    "work once per TYPE, never per token occurrence. The oracle reuses "
    "the unrolled training CTE chain and projects the final word table "
    "instead of the merge list.",
)
def text_bpe_encode_vocab(spark, sf_dir):
    from mcyj_datapipeline_spark.operators.text_analysis import (
        bpe_encode_vocab,
    )

    return bpe_encode_vocab(
        _t(spark, sf_dir, "documents"), k=3
    ).orderBy("w")


# ===========================================================================
# EV: daily new-vs-returning user split
# ===========================================================================

@register(
    "ev_new_vs_returning_daily",
    """
    WITH a AS (
      SELECT DISTINCT user_id, date_trunc('day', ts)::DATE AS d
      FROM events
    ), f AS (SELECT user_id, min(d) AS fd FROM a GROUP BY user_id)
    SELECT a.d AS day,
           count(*) FILTER (a.d = f.fd) AS n_new,
           count(*) FILTER (a.d > f.fd) AS n_returning
    FROM a JOIN f USING (user_id)
    GROUP BY a.d ORDER BY day
    """,
    "Daily active users split into new (first-ever activity that day) "
    "vs returning — the growth-accounting counterpart of c1's cohort "
    "retention. One distinct over (user, day), one groupBy(user) for "
    "first-seen dates, one user-key join (both sides already hash-"
    "partitioned on user by the distinct/groupBy), one day rollup. "
    "First-seen state is one row per user — at 100 TB it would persist "
    "as a bucketed state table and the join prunes to touched users.",
)
def ev_new_vs_returning_daily(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    active = ev.select(
        "user_id", F.to_date("ts").alias("d")
    ).distinct()
    first = active.groupBy("user_id").agg(F.min("d").alias("fd"))
    j = active.join(first, "user_id")
    return (
        j.groupBy(F.col("d").alias("day"))
        .agg(
            F.count(F.when(F.col("d") == F.col("fd"), 1)).alias("n_new"),
            F.count(F.when(F.col("d") > F.col("fd"), 1)).alias(
                "n_returning"
            ),
        )
        .orderBy("day")
    )
