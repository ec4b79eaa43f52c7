"""Named invariant tests for complex driver-blind queries — the
registry names the driver's fixed 50-query snapshot has never sampled
(graph/sequential/flagship/text families). Each test asserts one
nontrivial SEMANTIC invariant beyond the DuckDB oracle hash, in the
mold of the PageRank mass-conservation test: a property that must hold
for the math to be right, checked on the real test tables so a
refactor that keeps the plan running but breaks the semantics fails
loudly.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from mcyj_datapipeline_spark import registry
from mcyj_datapipeline_spark.io import read_table


@pytest.fixture(scope="module")
def qs():
    return registry.queries()


def test_funnel_stage_counts_monotone_nonincreasing(spark, sf_dir, qs):
    """c2_event_funnel: each ordered stage is a refinement of the
    previous (view ⊇ view→click ⊇ view→click→purchase), so the three
    counts must be monotone non-increasing; and no stage can exceed
    the number of distinct users."""
    row = qs["c2_event_funnel"](spark, sf_dir).collect()[0]
    n_users = (
        read_table(spark, sf_dir, "events")
        .select("user_id")
        .distinct()
        .count()
    )
    assert row["n_view"] >= row["n_view_click"] >= row["n_full_funnel"] >= 0
    assert row["n_view"] <= n_users
    assert row["n_view"] > 0, "vacuous funnel: fixture drift?"


def test_cohort_retention_month_zero_is_cohort_size_and_dominates(
    spark, sf_dir, qs
):
    """c1_cohort_retention: every customer is active in their own
    first month, so months_since=0 equals the cohort's size and upper-
    bounds every later month's active count."""
    rows = qs["c1_cohort_retention"](spark, sf_dir).collect()
    by_cohort = {}
    for r in rows:
        by_cohort.setdefault(r["cohort_month"], {})[r["months_since"]] = r[
            "active_customers"
        ]
        assert 0 <= r["months_since"] <= 6
    orders = read_table(spark, sf_dir, "orders")
    sizes = {
        r["m"].date() if hasattr(r["m"], "date") else r["m"]: r["n"]
        for r in orders.groupBy("o_custkey")
        .agg(
            F.min(
                F.date_trunc("month", F.col("o_orderdate").cast("timestamp"))
            ).alias("m")
        )
        .groupBy("m")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    assert by_cohort, "no cohorts"
    for cohort, months in by_cohort.items():
        assert months.get(0) == sizes[cohort], (
            f"cohort {cohort}: month-0 {months.get(0)} != size "
            f"{sizes[cohort]}"
        )
        for m, n in months.items():
            assert n <= months[0], f"cohort {cohort} month {m} exceeds m0"


def test_markov_transition_rows_are_stochastic_and_conserve_counts(
    spark, sf_dir, qs
):
    """ev_markov_transitions: P(next|type) must sum to 1 within each
    from-state (rounding to 6 dp allows tiny slack), every p ∈ (0, 1],
    and the transition counts must total exactly n_events − n_users
    (each user's sequence of length L contributes L−1 transitions)."""
    rows = qs["ev_markov_transitions"](spark, sf_dir).collect()
    by_from = {}
    total_n = 0
    for r in rows:
        assert 0 < r["p"] <= 1
        by_from.setdefault(r["event_type"], 0.0)
        by_from[r["event_type"]] += r["p"]
        total_n += r["n"]
    for state, s in by_from.items():
        assert math.isclose(s, 1.0, abs_tol=5e-6), f"{state} sums to {s}"
    ev = read_table(spark, sf_dir, "events")
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    assert total_n == n_events - n_users


def test_attribution_lookback_window_and_latest_click_choice(
    spark, sf_dir, qs
):
    """ev_attribution_last_touch: one output row per purchase; an
    attributed row's click must belong to the same user, precede the
    purchase, sit inside the 7-day lookback, and be that user's LATEST
    qualifying click; a non-attributed row's user must have NO click
    in the lookback window at all."""
    out = qs["ev_attribution_last_touch"](spark, sf_dir)
    ev = read_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase")
    assert out.count() == purchases.count()

    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("attributed_click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    att = out.filter(F.col("attributed")).join(
        clicks, "attributed_click_id", "left"
    )
    bad_link = att.filter(
        F.col("c_user").isNull()
        | (F.col("c_user") != F.col("user_id"))
        | (F.col("c_ts") > F.col("ts"))
        | (F.col("c_ts") < F.col("ts") - F.expr("INTERVAL 7 DAY"))
    ).count()
    assert bad_link == 0

    # latest-touch: no OTHER same-user click strictly between the
    # attributed click and the purchase
    later = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("u2"), F.col("ts").alias("t2")
    )
    stolen = (
        att.join(later, att["user_id"] == later["u2"])
        .filter((F.col("t2") > F.col("c_ts")) & (F.col("t2") <= F.col("ts")))
        .count()
    )
    assert stolen == 0, "an attributed click is not the last touch"

    # non-attributed purchases truly have an empty lookback window
    misses = (
        out.filter(~F.col("attributed"))
        .join(later, out["user_id"] == later["u2"], "left")
        .filter(
            (F.col("t2") <= F.col("ts"))
            & (F.col("t2") >= F.col("ts") - F.expr("INTERVAL 7 DAY"))
        )
        .count()
    )
    assert misses == 0, "a purchase with an in-window click went uncredited"


def test_bm25_results_contain_query_terms_in_descending_score_order(
    spark, sf_dir, qs
):
    """text_bm25_topk: BM25 scores a disjunction of query terms, so
    every returned doc must actually CONTAIN at least one query term
    (whitespace tokenization — the same the scorer uses), all scores
    are strictly positive, and the list is sorted descending with the
    doc_id tiebreak."""
    from mcyj_datapipeline_spark.registry_batch13 import _BM25_TERMS

    rows = qs["text_bm25_topk"](spark, sf_dir).collect()
    assert 0 < len(rows) <= 10
    scores = [(r["score"], r["doc_id"]) for r in rows]
    assert scores == sorted(scores, key=lambda t: (-t[0], t[1]))
    assert all(r["score"] > 0 for r in rows)
    docs = {
        r["doc_id"]: r["text"]
        for r in read_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id").isin([r["doc_id"] for r in rows]))
        .collect()
    }
    for r in rows:
        toks = set(docs[r["doc_id"]].split())
        assert toks & set(_BM25_TERMS), (
            f"doc {r['doc_id']} scored without containing any query term"
        )


def test_vocab_oov_rate_bounds_and_internal_consistency(
    spark, sf_dir, qs
):
    """text_vocab_oov_rate: every rate ∈ [0, 1]; the corpus-weighted
    rate must equal n_oov/n_tokens recomputed from the same row; and a
    vocabulary covering every corpus term yields exactly zero OOV."""
    rows = qs["text_vocab_oov_rate"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["oov_rate"] <= 1
        assert 0 <= r["avg_doc_oov_rate"] <= 1
        assert 0 <= r["n_oov"] <= r["n_tokens"]
        assert math.isclose(
            r["oov_rate"], round(r["n_oov"] / r["n_tokens"], 6), abs_tol=1e-6
        )
    # identity: a full vocabulary has no OOV at all
    from mcyj_datapipeline_spark.operators import text_analysis as TA

    docs = read_table(spark, sf_dir, "documents").limit(50)
    toks = docs.select(F.explode(TA.tokens(F.col("text"))).alias("term"))
    vocab = toks.distinct().withColumn("_v", F.lit(1))
    n_oov = (
        toks.join(vocab, "term", "left")
        .filter(F.col("_v").isNull())
        .count()
    )
    assert n_oov == 0


def test_hll_rollup_tolerance_flags_and_cardinality_bounds(
    spark, sf_dir, qs
):
    """sk_hll_daily_uniques_rollup: the ε-contract booleans must all
    be true, and set algebra must hold on the exact twins — the total
    distinct count is bounded below by the biggest day and above by
    the sum of days."""
    rows = qs["sk_hll_daily_uniques_rollup"](spark, sf_dir).collect()
    assert rows
    assert all(r["daily_within_tol"] for r in rows)
    assert all(r["total_within_tol"] for r in rows)
    total = rows[0]["total_uniques_exact"]
    assert len({r["total_uniques_exact"] for r in rows}) == 1
    daily = [r["daily_uniques_exact"] for r in rows]
    assert max(daily) <= total <= sum(daily)


def test_embedding_decontamination_flags_planted_duplicate_only(spark):
    """decon_embedding_contamination's operator: a corpus vector that
    IS a benchmark vector must be flagged with cosine ≈ 1 against that
    benchmark; an orthogonal vector must not be flagged; and scaling a
    contaminated vector (cosine is scale-invariant) changes nothing."""
    from mcyj_datapipeline_spark.operators.similarity import (
        embedding_contamination,
    )

    bench = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    corpus = spark.createDataFrame(
        [
            (10, [1.0, 0.0, 0.0, 0.0]),  # exact copy of bench 0
            (11, [0.0, 3.0, 0.0, 0.0]),  # scaled copy of bench 1
            (12, [0.0, 0.0, 1.0, 0.0]),  # orthogonal to both
        ],
        "vec_id long, embedding array<double>",
    )
    got = {
        r["vec_id"]: (r["bench_id"], r["cosine"])
        for r in embedding_contamination(corpus, bench, tau=0.9).collect()
    }
    assert set(got) == {10, 11}
    assert got[10][0] == 0 and math.isclose(got[10][1], 1.0, abs_tol=1e-5)
    assert got[11][0] == 1 and math.isclose(got[11][1], 1.0, abs_tol=1e-5)


def test_e8_curation_outputs_partition_cleanly_by_split_and_lang(
    spark, sf_dir, qs
):
    """e8_curation_pipeline: the (split, lang) report must cover only
    the three configured splits, count every kept doc exactly once
    across groups, and never exceed the corpus' doc/lang population."""
    rows = qs["e8_curation_pipeline"](spark, sf_dir).collect()
    assert rows
    assert {r["split"] for r in rows} <= {"train", "val", "test"}
    docs = read_table(spark, sf_dir, "documents")
    lang_pop = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang")
        .agg(F.countDistinct("doc_id").alias("n"))
        .collect()
    }
    per_lang = {}
    for r in rows:
        assert r["n_docs"] > 0 and r["n_tokens"] > 0
        per_lang[r["lang"]] = per_lang.get(r["lang"], 0) + r["n_docs"]
    for lang, n in per_lang.items():
        assert n <= lang_pop[lang], f"{lang}: more kept docs than exist"
    assert sum(per_lang.values()) <= docs.count()


def test_pagerank_on_purchase_graph_conserves_mass(spark, sf_dir, qs):
    """g1_pagerank_purchase_graph on the REAL events-derived graph
    (the operator-level tests use synthetic graphs): ranks are a
    probability distribution — strictly positive, summing to 1 — and
    no single node absorbs the graph."""
    rows = qs["g1_pagerank_purchase_graph"](spark, sf_dir).collect()
    assert rows
    ranks = [r["rank"] for r in rows]
    assert all(v > 0 for v in ranks)
    # the query rounds each rank to 6 dp, so the sum can drift by up
    # to n x 5e-7
    assert math.isclose(sum(ranks), 1.0, abs_tol=len(ranks) * 5e-7)
    assert max(ranks) < 0.5


def test_e13_span_rewrite_conserves_and_only_removes(spark, sf_dir, qs):
    """e13_span_dedup_rewrite on the real corpus: one output row per
    document, no document GAINS words, total words only shrink, and
    clean_text's own word count equals the reported n_words_after."""
    rows = qs["e13_span_dedup_rewrite"](spark, sf_dir).collect()
    docs = read_table(spark, sf_dir, "documents")
    assert len(rows) == docs.count()
    lost = 0
    for r in rows:
        assert 0 <= r["n_words_after"] <= r["n_words_before"]
        got_words = len(r["clean_text"].split()) if r["clean_text"] else 0
        assert got_words == r["n_words_after"], r["doc_id"]
        lost += r["n_words_before"] - r["n_words_after"]
    assert lost > 0, "no spans cut on a corpus with known duplicates"


def test_e14_datasheet_internally_consistent(spark, sf_dir, qs):
    """e14_corpus_datasheet: per-language rows must reconcile with the
    corpus (docs sum to corpus count, dup counts below doc counts,
    rate == dups/docs, quartiles ordered within [0, 1], vocab no
    larger than the token count)."""
    rows = qs["e14_corpus_datasheet"](spark, sf_dir).collect()
    docs = read_table(spark, sf_dir, "documents")
    assert sum(r["n_docs"] for r in rows) == docs.count()
    for r in rows:
        assert 0 <= r["n_exact_dups"] < r["n_docs"]
        assert abs(r["dup_rate"] - round(r["n_exact_dups"] / r["n_docs"], 6)) < 1e-9
        assert 0 <= r["quality_p25"] <= r["quality_p50"] <= r["quality_p75"] <= 1
        assert 0 < r["n_distinct_terms"] <= r["n_tokens"]
        assert r["n_chars"] > 0
