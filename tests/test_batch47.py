"""Batch 47 semantics: n-gram decontamination, stratified split,
Gopher rule flags (oracle parity runs in test_oracle_parity)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mcyj_datapipeline_spark.registry_batch47 import (
    _DECON_N,
    _EVAL_MOD,
    decon_ngram_overlap,
    e19_stratified_split,
    text_gopher_quality_flags,
)


def test_decon_flags_only_training_docs(spark, sf_dir):
    out = decon_ngram_overlap(spark, sf_dir)
    rows = out.collect()
    # eval docs never appear in the flagged output
    assert all(r["doc_id"] % _EVAL_MOD != 0 for r in rows)
    assert all(r["n_shared_grams"] >= 1 for r in rows)
    assert all(r["n_eval_docs"] >= 1 for r in rows)


def test_decon_planted_verbatim_copy_is_caught(spark):
    """A training doc that verbatim-copies an eval doc's text must be
    flagged with every one of its grams shared."""
    from mcyj_datapipeline_spark.operators import text_analysis  # noqa: F401
    import mcyj_datapipeline_spark.registry_batch47 as B

    text = " ".join(f"w{i}" for i in range(_DECON_N + 4))
    docs = spark.createDataFrame(
        [
            (0, text),              # eval (0 % 97 == 0)
            (1, text),              # training verbatim copy
            (2, "totally different words " * 5),
        ],
        "doc_id long, text string",
    )

    import unittest.mock as mock

    with mock.patch.object(B, "_t", lambda s, d, n: docs):
        rows = decon_ngram_overlap(spark, "unused").collect()
    assert [r["doc_id"] for r in rows] == [1]
    assert rows[0]["n_shared_grams"] == 5  # 12 words -> 5 distinct 8-grams
    assert rows[0]["n_eval_docs"] == 1


def test_split_partitions_and_proportions(spark, sf_dir):
    rows = e19_stratified_split(spark, sf_dir).collect()
    # fractions sum to ~1 within each language
    by_lang: dict[str, float] = {}
    for r in rows:
        by_lang[r["lang"]] = by_lang.get(r["lang"], 0.0) + r["frac_of_lang"]
    assert all(abs(v - 1.0) < 1e-4 for v in by_lang.values())
    # train dominates every language (80% target)
    train = {r["lang"]: r["frac_of_lang"] for r in rows if r["split"] == "train"}
    assert all(v > 0.6 for v in train.values())


def test_split_is_deterministic_and_total(spark, sf_dir):
    a = {(r["lang"], r["split"]): r["n_docs"]
         for r in e19_stratified_split(spark, sf_dir).collect()}
    b = {(r["lang"], r["split"]): r["n_docs"]
         for r in e19_stratified_split(spark, sf_dir).collect()}
    assert a == b
    from mcyj_datapipeline_spark.io import read_table

    n_docs = read_table(spark, sf_dir, "documents").count()
    assert sum(a.values()) == n_docs


def test_gopher_flags_keep_is_conjunction(spark, sf_dir):
    out = text_gopher_quality_flags(spark, sf_dir)
    bad = out.filter(
        F.col("keep")
        != (
            F.col("len_ok")
            & F.col("mwl_ok")
            & F.col("alpha_ok")
            & F.col("stopword_ok")
            & F.col("repetition_ok")
        )
    )
    assert bad.count() == 0
    # the gate is a per-document readout: one row per document
    from mcyj_datapipeline_spark.io import read_table

    assert out.count() == read_table(spark, sf_dir, "documents").count()


def test_gopher_flags_catch_planted_spam(spark):
    import unittest.mock as mock

    import mcyj_datapipeline_spark.registry_batch47 as B

    good = (
        "the committee reviewed the annual report and it is clear that "
        "the facility met every requirement of the licensing period in "
        "a manner consistent with the standards and the expectations"
    )
    spam = "buy " * 60  # one token repeated -> repetition_ok False
    docs = spark.createDataFrame(
        [(1, good), (2, spam)], "doc_id long, text string"
    )
    with mock.patch.object(B, "_t", lambda s, d, n: docs):
        got = {
            r["doc_id"]: r
            for r in text_gopher_quality_flags(spark, "unused").collect()
        }
    assert got[1]["keep"] is True
    assert got[2]["repetition_ok"] is False and got[2]["keep"] is False
