"""Semantic tests for the persistent IVF index: from-state answers
equal the in-memory operator's on identical centroids, probe reads
open only the probed buckets, ingest folds are frozen-centroid
idempotent, and refits must rebuild."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mcyj_datapipeline_spark.io import read_table
from mcyj_datapipeline_spark.operators.ann_index import (
    ann_topk_from_state,
    fold_ivf_batch,
    open_ivf_state,
    rebuild_ivf_state,
)
from mcyj_datapipeline_spark.operators.similarity import (
    default_centroids,
    ivf_topk,
)

SF = "/root/testdata/sf0.001"


def _emb(spark):
    return read_table(spark, SF, "embeddings").select("vec_id", "embedding")


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_state_answers_equal_in_memory(spark, tmp_path):
    emb = _emb(spark)
    cents = default_centroids(emb, 16)
    cst, ast = open_ivf_state(spark, str(tmp_path / "ivf"))
    rebuild_ivf_state(emb, cents, cst, ast)
    queries = emb.filter(F.col("vec_id") < 8)
    a = _rows(ann_topk_from_state(cst, ast, queries, k=5, nprobe=4))
    b = _rows(ivf_topk(emb, queries, k=5, nprobe=4, centroids=cents))
    assert a == b and len(a) == 40


def test_probe_read_opens_only_probed_buckets(spark, tmp_path):
    import re

    emb = _emb(spark)
    cents = default_centroids(emb, 16)
    cst, ast = open_ivf_state(spark, str(tmp_path / "ivf"), num_buckets=16)
    rebuild_ivf_state(emb, cents, cst, ast)

    all_files = spark.read.parquet(
        str(tmp_path / "ivf/assignments/data")
    ).inputFiles()
    all_buckets = {re.search(r"_bucket=(\d+)", f).group(1) for f in all_files}
    assert len(all_buckets) > 4

    pruned = ast.read_pruned([0, 3])
    got = {
        re.search(r"_bucket=(\d+)", f).group(1) for f in pruned.inputFiles()
    }
    assert got and len(got) <= 2 and got < all_buckets


def test_fold_matches_full_rebuild_and_replays(spark, tmp_path):
    emb = _emb(spark)
    cents = default_centroids(emb, 16)

    full_c, full_a = open_ivf_state(spark, str(tmp_path / "full"))
    rebuild_ivf_state(emb, cents, full_c, full_a)

    inc_c, inc_a = open_ivf_state(spark, str(tmp_path / "inc"))
    rebuild_ivf_state(emb.filter(F.col("vec_id") < 400), cents, inc_c, inc_a)
    night = emb.filter(F.col("vec_id") >= 400)
    fold_ivf_batch(night, inc_c, inc_a)

    def snap(ast):
        return sorted(
            (r["vec_id"], r["centroid_id"])
            for r in ast.read().select("vec_id", "centroid_id").collect()
        )

    assert snap(inc_a) == snap(full_a)
    fold_ivf_batch(night, inc_c, inc_a)  # re-delivery
    assert snap(inc_a) == snap(full_a)

    queries = emb.filter(F.col("vec_id") < 8)
    assert _rows(ann_topk_from_state(inc_c, inc_a, queries)) == _rows(
        ann_topk_from_state(full_c, full_a, queries)
    )


def test_fold_without_centroids_refuses(spark, tmp_path):
    cst, ast = open_ivf_state(spark, str(tmp_path / "ivf"))
    with pytest.raises(ValueError, match="centroids"):
        fold_ivf_batch(_emb(spark), cst, ast)
