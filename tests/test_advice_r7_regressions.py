"""Regression pins for the two ADVICE-r7 medium findings.

1. ``label_outliers`` (similarity.py): the argmin rewrite
   ``min(struct(-cos, clabel))`` sorts a NULL score FIRST, so an
   unfiltered null-cos row (null embedding propagating through cosine)
   would WIN the per-vector argmin and surface as best_label with
   best_cos NULL. Fixed by dropping null-cos rows before the agg — the
   pre-rewrite ``max(struct(cos, ...))`` contract.

2. ``ev_funnel_reach`` (registry_batch48.py): sessions run with
   ANSI SQL on, so the step-over-step division raised DIVIDE_BY_ZERO
   the moment a funnel step was empty. Fixed with a NULLIF-guarded
   denominator, pinned identically in the DuckDB oracle.
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from mcyj_datapipeline_spark.operators.similarity import label_outliers
from mcyj_datapipeline_spark.registry_batch48 import ev_funnel_reach


def test_label_outliers_ignores_null_embedding_rows(spark):
    """A vector with a NULL embedding yields NULL cosine against every
    centroid. It must be silently ignored (absent from output), not win
    the argmin with best_cos NULL — and it must not perturb the flags
    of healthy vectors."""
    rows = [
        # two clean clusters: label A near (1,0), label B near (0,1)
        ("a1", "A", [1.0, 0.0]),
        ("a2", "A", [0.9, 0.1]),
        ("b1", "B", [0.0, 1.0]),
        ("b2", "B", [0.1, 0.9]),
        # mislabeled: sits in B's region but labeled A -> must flag
        ("m1", "A", [0.05, 0.95]),
        # poisoned: NULL embedding -> NULL cos everywhere
        ("n1", "A", None),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id string, label string, embedding array<double>"
    )
    out = label_outliers(emb).collect()
    by_id = {r["vec_id"]: r for r in out}
    assert "n1" not in by_id, "null-embedding row won the argmin"
    assert set(by_id) == {"m1"}, f"expected only m1 flagged, got {set(by_id)}"
    r = by_id["m1"]
    assert r["best_label"] == "B"
    assert r["best_cos"] is not None and r["delta"] > 0


def _events(spark, tmp_path, types):
    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (i, t0 + datetime.timedelta(hours=i), 1, et, 1.0, None)
        for i, et in enumerate(types)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_funnel_empty_tail_step_yields_null_not_ansi_crash(
    spark, tmp_path
):
    """User signs up and views but never clicks: steps 3 and 4 are
    empty. Under ANSI the old bare division raised DIVIDE_BY_ZERO on
    step 4 (0 / coalesce(0, 0)); the contract is NULL conversion out of
    an empty previous step."""
    sf = _events(spark, tmp_path, ["signup", "view"])
    rows = {r["step_no"]: r for r in ev_funnel_reach(spark, sf).collect()}
    assert [rows[i]["n_users"] for i in (1, 2, 3, 4)] == [1, 1, 0, 0]
    assert rows[1]["conv_from_prev"] == 1.0  # self-division, n>0
    assert rows[2]["conv_from_prev"] == 1.0
    assert rows[3]["conv_from_prev"] == 0.0  # 0 / 1
    assert rows[4]["conv_from_prev"] is None  # 0 / NULLIF(0) -> NULL


def test_funnel_totally_empty_yields_all_null_conversions(
    spark, tmp_path
):
    """No funnel events at all: every step is 0 users and every
    conversion — including step 1's self-division — is NULL."""
    sf = _events(spark, tmp_path, ["other"])
    rows = ev_funnel_reach(spark, sf).collect()
    assert [r["n_users"] for r in rows] == [0, 0, 0, 0]
    assert all(r["conv_from_prev"] is None for r in rows)
