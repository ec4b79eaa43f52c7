"""ML quality classifier over hashed n-gram features (pyspark.ml).

The public pattern behind GPT-3/LLaMA-style corpus curation: train a
linear classifier to separate "high-quality reference" text from random
web text, then score the whole corpus and keep documents by probability
(optionally Pareto-sampled near the boundary). The reference pipeline
has no ML scoring stage — this is one of the beyond-reference
training-data operators (brief: quality scoring at 100 TB).

Spark-first shape:

* **Training** runs on a (sampled) labeled frame with distributed
  L-BFGS — no driver-side data pull beyond the coefficient vector.
* **Scoring** is a pure map: the fitted pipeline broadcasts its
  coefficients (``num_features`` doubles, ~2 MB at 2**18) and each row
  costs one tokenize + two hashing passes + a sparse dot product. The
  scoring plan contains NO Exchange — asserted in
  ``tests/test_ml_quality.py``.
* **Weak labels** come from the engine's own heuristic quality score
  (:func:`..text_analysis.quality_score` — C4/Gopher-style signals):
  top-quantile docs are positives, bottom-quantile negatives, the
  ambiguous middle is dropped. Quantile cutpoints are computed with the
  exact ``percentile`` aggregate (single tiny reduce) and broadcast.

At 100 TB: train on a hash-sampled ~1M-doc slice (sampling.py), then
score the corpus with ``score_quality`` — one narrow stage, trivially
parallel, no skew exposure (no keys involved).
"""

from __future__ import annotations

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.classification import LogisticRegression
from pyspark.ml.feature import HashingTF, NGram, RegexTokenizer, VectorAssembler
from pyspark.ml.functions import vector_to_array
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mcyj_datapipeline_spark.operators.text_analysis import quality_score

# Columns the feature stages add; dropped again after scoring.
_FEATURE_COLS = [
    "_ml_words",
    "_ml_bigrams",
    "_ml_tf_words",
    "_ml_tf_bigrams",
    "features",
    "rawPrediction",
    "probability",
    "prediction",
]


def weak_quality_labels(
    docs: DataFrame,
    text_col: str = "text",
    low_quantile: float = 0.35,
    high_quantile: float = 0.65,
) -> DataFrame:
    """Self-supervised labels from the heuristic quality score: docs at
    or above the ``high_quantile`` cutpoint get label 1, at or below the
    ``low_quantile`` cutpoint label 0, the middle band is dropped (the
    classifier should not train on ambiguous examples).

    The two cutpoints are ONE exact-percentile aggregate (a scalar row)
    joined back by broadcast — no per-row subquery, no window.
    """
    scored = docs.withColumn("_wq", quality_score(F.col(text_col)))
    cuts = scored.agg(
        F.expr(
            f"percentile(_wq, array({low_quantile}, {high_quantile}))"
        ).alias("c")
    ).select(
        F.col("c")[0].alias("_lo"), F.col("c")[1].alias("_hi")
    )
    return (
        scored.join(F.broadcast(cuts))
        .withColumn(
            "label",
            F.when(F.col("_wq") >= F.col("_hi"), F.lit(1.0))
            .when(F.col("_wq") <= F.col("_lo"), F.lit(0.0)),
        )
        .filter(F.col("label").isNotNull())
        .drop("_wq", "_lo", "_hi")
    )


def build_quality_pipeline(
    text_col: str = "text",
    num_features: int = 1 << 18,
    reg_param: float = 1e-3,
    max_iter: int = 25,
) -> Pipeline:
    """Tokenize → word + bigram hashing → logistic regression.

    Word unigrams and bigrams are hashed into separate spaces then
    assembled, the fastText recipe's feature set minus the learned
    embedding (a linear model over hashed n-grams is the
    publicly-documented shape of the GPT-3 quality filter).
    """
    tokenizer = RegexTokenizer(
        inputCol=text_col,
        outputCol="_ml_words",
        pattern=r"[^\p{L}\p{N}]+",
        gaps=True,
        toLowercase=True,
        minTokenLength=1,
    )
    bigrams = NGram(n=2, inputCol="_ml_words", outputCol="_ml_bigrams")
    tf_words = HashingTF(
        inputCol="_ml_words", outputCol="_ml_tf_words",
        numFeatures=num_features,
    )
    tf_bigrams = HashingTF(
        inputCol="_ml_bigrams", outputCol="_ml_tf_bigrams",
        numFeatures=num_features,
    )
    assemble = VectorAssembler(
        inputCols=["_ml_tf_words", "_ml_tf_bigrams"], outputCol="features"
    )
    lr = LogisticRegression(
        featuresCol="features",
        labelCol="label",
        regParam=reg_param,
        maxIter=max_iter,
        standardization=False,
    )
    return Pipeline(stages=[tokenizer, bigrams, tf_words, tf_bigrams, assemble, lr])


def train_quality_classifier(
    labeled: DataFrame,
    text_col: str = "text",
    num_features: int = 1 << 18,
    reg_param: float = 1e-3,
    max_iter: int = 25,
) -> PipelineModel:
    """Fit the quality pipeline on a labeled frame (``label`` in {0,1}).
    Training is distributed (L-BFGS over executor partials); only the
    coefficient vector lands on the driver."""
    model = build_quality_pipeline(
        text_col=text_col,
        num_features=num_features,
        reg_param=reg_param,
        max_iter=max_iter,
    ).fit(labeled)
    lrm = model.stages[-1]
    # Drop the training summary: it pins the fitting SparkSession into
    # the model's object graph (summary -> predictions DataFrame ->
    # session), and on Spark 4.1 serializing that chain inside a task
    # closure dies on the session's non-serializable ObservationManager
    # ("Task not serializable" during scoring — surfaced as the
    # long-session pytest flake). Scoring only needs the coefficient
    # vector; a model loaded from disk never has a summary either, so
    # this also makes fit-then-score behave identically to
    # save-then-load-then-score.
    try:
        lrm._java_obj.setSummary(
            labeled.sparkSession._jvm.scala.Option.apply(None)
        )
    except Exception:
        pass  # py4j seam only; a future Spark may rename the setter
    return model


def score_quality(
    model: PipelineModel,
    docs: DataFrame,
    prob_col: str = "ml_quality_prob",
) -> DataFrame:
    """Add ``prob_col`` = P(high quality) to ``docs``. Pure map stage:
    the model transform adds only narrow projections (no Exchange), so
    this composes with any upstream scan without a shuffle."""
    scored = model.transform(docs).withColumn(
        prob_col, vector_to_array(F.col("probability"))[1]
    )
    return scored.drop(*_FEATURE_COLS)


def train_and_score(
    docs: DataFrame,
    text_col: str = "text",
    num_features: int = 1 << 14,
    train_fraction_cap: int = 100_000,
    prob_col: str = "ml_quality_prob",
    max_iter: int = 25,
) -> DataFrame:
    """End-to-end convenience: weak-label, train, score the full frame.

    ``train_fraction_cap`` bounds the training set row count. The cap
    is taken after a deterministic sort on the TEXT HASH ALONE — a
    stable pseudo-random interleave of both classes — never on the
    label: sorting label-first would fill the cap entirely with
    negatives whenever they outnumber it, training a degenerate
    single-class model. At 100 TB pass a hash-sampled slice instead of
    the full corpus.
    """
    labeled = weak_quality_labels(docs, text_col=text_col)
    # persist: every L-BFGS iteration is a job over this frame — without
    # the cache each one re-runs the weak-label lineage (quality regex +
    # percentile agg + sort-limit) end to end.
    train = (
        labeled
        .withColumn("_h", F.xxhash64(F.col(text_col)))
        .orderBy("_h")
        .limit(train_fraction_cap)
        .drop("_h")
        .persist()
    )
    try:
        model = train_quality_classifier(
            train, text_col=text_col, num_features=num_features,
            max_iter=max_iter,
        )
    finally:
        train.unpersist()
    return score_quality(model, docs, prob_col=prob_col)
