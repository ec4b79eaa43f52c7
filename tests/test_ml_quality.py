"""ML quality classifier: separability on a constructed corpus, scoring
determinism, and the no-shuffle scoring-plan guarantee."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mcyj_datapipeline_spark.operators.ml_quality import (
    score_quality,
    train_and_score,
    train_quality_classifier,
    weak_quality_labels,
)

GOOD = (
    "The committee reviewed the annual report and concluded that the "
    "facility met every licensing requirement during the review period. "
    "Inspectors documented the findings in a detailed summary."
)
BAD = "click here click here BUY NOW !!! $$$ free free free wow wow wow"


@pytest.fixture(scope="module")
def corpus(spark):
    rows = []
    for i in range(40):
        rows.append((i, f"{GOOD} Case number {i} was archived properly."))
    for i in range(40, 80):
        rows.append((i, f"{BAD} {'spam ' * (i % 5)}!!!"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_weak_labels_band_structure(corpus):
    labeled = weak_quality_labels(corpus)
    vals = {r["label"] for r in labeled.select("label").distinct().collect()}
    assert vals == {0.0, 1.0}
    # the ambiguous middle band is dropped
    assert labeled.count() < corpus.count() or corpus.count() == labeled.count()


@pytest.mark.heavytier
def test_classifier_separates_constructed_corpus(corpus):
    labeled = weak_quality_labels(corpus)
    model = train_quality_classifier(labeled, num_features=1 << 12)
    scored = score_quality(model, corpus)
    agg = (
        scored.withColumn("is_good", (F.col("doc_id") < 40).cast("int"))
        .groupBy("is_good")
        .agg(F.avg("ml_quality_prob").alias("p"))
        .collect()
    )
    by = {r["is_good"]: r["p"] for r in agg}
    assert by[1] > 0.9, by
    assert by[0] < 0.1, by
    # schema: original columns + prob, no feature residue
    assert set(scored.columns) == {"doc_id", "text", "ml_quality_prob"}


def test_scoring_plan_has_no_exchange(corpus):
    """Scoring must stay a pure map — model broadcast, no shuffle."""
    labeled = weak_quality_labels(corpus)
    model = train_quality_classifier(labeled, num_features=1 << 12)
    plan = score_quality(model, corpus)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_train_and_score_deterministic(corpus):
    a = train_and_score(corpus, num_features=1 << 12)
    b = train_and_score(corpus, num_features=1 << 12)
    ra = {r["doc_id"]: round(r["ml_quality_prob"], 6) for r in a.collect()}
    rb = {r["doc_id"]: round(r["ml_quality_prob"], 6) for r in b.collect()}
    assert ra == rb
    assert len(ra) == 80


@pytest.mark.heavytier
def test_model_persistence_roundtrip(corpus, tmp_path):
    """Production pattern: train ONCE, persist, score many batches —
    a loaded PipelineModel must reproduce byte-identical scores (the
    registry entry retrains per call only because driver queries must
    be self-contained)."""
    from pyspark.ml import PipelineModel

    labeled = weak_quality_labels(corpus)
    model = train_quality_classifier(labeled, num_features=1 << 12)
    path = str(tmp_path / "quality_model")
    model.write().overwrite().save(path)
    loaded = PipelineModel.load(path)

    a = {r["doc_id"]: r["ml_quality_prob"] for r in score_quality(model, corpus).collect()}
    b = {r["doc_id"]: r["ml_quality_prob"] for r in score_quality(loaded, corpus).collect()}
    assert a == b
    assert len(b) == 80


def test_train_cap_interleaves_classes(spark):
    """Regression: the training cap must sample BOTH classes (hash
    order), not fill up with whichever label sorts first."""
    from pyspark.sql import functions as F

    rows = [(i, f"{GOOD} case {i}") for i in range(40)]
    rows += [(i + 40, f"{BAD} {'junk ' * (i % 7)}") for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    scored = train_and_score(docs, num_features=1 << 12, train_fraction_cap=30)
    agg = (
        scored.withColumn("is_good", (F.col("doc_id") < 40).cast("int"))
        .groupBy("is_good").agg(F.avg("ml_quality_prob").alias("p")).collect()
    )
    by = {r["is_good"]: r["p"] for r in agg}
    # a degenerate single-class model scores everything alike
    assert by[1] - by[0] > 0.5, by
