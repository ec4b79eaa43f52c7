"""Compensating + semantic tests for the incremental PCA Gram fold:
batch-split invariance (the additive-sufficient-statistics claim),
replay idempotency without bookkeeping, and model-from-state equal to
the cold fit (value parity vs the DuckDB oracle runs in
test_oracle_parity.py)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from mcyj_datapipeline_spark.io import read_table
from mcyj_datapipeline_spark.operators.pca import pca_fit
from mcyj_datapipeline_spark.operators.pca_incremental import (
    fold_gram_batch,
    gram_totals,
    open_gram_state,
    pca_model_from_state,
)

SF = "/root/testdata/sf0.001"


def _emb(spark):
    return read_table(spark, SF, "embeddings").select("vec_id", "embedding")


def _totals_q(state):
    return {
        (r["kind"], r["i"], r["j"]): r["gq"]
        for r in gram_totals(state).collect()
    }


def test_batch_split_invariance_and_replay(spark, tmp_path):
    emb = _emb(spark)
    one = open_gram_state(spark, str(tmp_path / "one"))
    fold_gram_batch(emb, "all", one)

    three = open_gram_state(spark, str(tmp_path / "three"))
    for name, lo, hi in (("b0", None, 400), ("b1", 400, 450), ("b2", 450, None)):
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (F.col("vec_id") >= lo)
        if hi is not None:
            cond = cond & (F.col("vec_id") < hi)
        fold_gram_batch(emb.filter(cond), name, three)

    t1, t3 = _totals_q(one), _totals_q(three)
    assert t1 == t3  # integer-exact: no tolerance
    assert t1[("n", 0, 0)] == 500
    assert len(t1) == 1 + 64 + 64 * 65 // 2

    # replaying a delivered batch rewrites identical rows
    fold_gram_batch(
        emb.filter((F.col("vec_id") >= 400) & (F.col("vec_id") < 450)),
        "b1",
        three,
    )
    assert _totals_q(three) == t3


def test_model_from_state_matches_cold_fit(spark, tmp_path):
    emb = _emb(spark)
    state = open_gram_state(spark, str(tmp_path / "s"))
    fold_gram_batch(emb.filter(F.col("vec_id") < 300), "a", state)
    fold_gram_batch(emb.filter(F.col("vec_id") >= 300), "b", state)
    inc = pca_model_from_state(state, k=8)
    cold = pca_fit(emb, "embedding", k=8)
    np.testing.assert_allclose(inc.mean, cold.mean, atol=1e-9)
    np.testing.assert_allclose(inc.explained, cold.explained, atol=1e-9)
    np.testing.assert_allclose(inc.components, cold.components, atol=1e-6)
    assert abs(inc.variance_retained() - cold.variance_retained()) < 1e-9


def test_empty_state_refuses(spark, tmp_path):
    state = open_gram_state(spark, str(tmp_path / "s"))
    with pytest.raises((ValueError, AttributeError)):
        pca_model_from_state(state)


def test_stream_fold_survives_checkpoint_loss(spark, tmp_path):
    """The additive-state design point: partials are keyed by landing
    FILE NAME, so re-streaming with a REBUILT checkpoint (which
    re-delivers and may re-group every file) rewrites identical cells
    instead of double-counting."""
    import glob
    import os
    import shutil

    from mcyj_datapipeline_spark.operators.pca_incremental import (
        stream_gram_fold,
    )

    emb = _emb(spark)
    landing = tmp_path / "landing"
    landing.mkdir()
    for i, (lo, hi) in enumerate(((0, 250), (250, 500))):
        tmp = str(landing / f"_b{i}")
        emb.filter(
            (F.col("vec_id") >= lo) & (F.col("vec_id") < hi)
        ).coalesce(1).write.parquet(tmp)
        (part,) = glob.glob(os.path.join(tmp, "part-*.parquet"))
        os.replace(part, str(landing / f"night{i}.parquet"))
        shutil.rmtree(tmp)

    state_root = str(tmp_path / "st")
    stream_gram_fold(spark, str(landing), state_root, str(tmp_path / "ck"))
    state = open_gram_state(spark, state_root)
    first = _totals_q(state)
    assert first[("n", 0, 0)] == 500

    # checkpoint lost: everything re-delivered under a new lineage
    shutil.rmtree(str(tmp_path / "ck"))
    stream_gram_fold(spark, str(landing), state_root, str(tmp_path / "ck"))
    assert _totals_q(state) == first


def test_colon_batch_id_refused(spark, tmp_path):
    from mcyj_datapipeline_spark.operators.pca_incremental import (
        fold_gram_batch,
    )

    state = open_gram_state(spark, str(tmp_path / "s"))
    with pytest.raises(ValueError, match="batch_id"):
        fold_gram_batch(_emb(spark), "a:b", state)
