"""Compensating tests for the rows-only v5_kmeans_warm_restart
(round 12): centroid-shift stopping is not SQL-expressible and
k-means has local minima, so the contract is the LPA one — the warm
fit has STOPPED MOVING (within tol) in no more rounds than cold,
never centroid equality."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mcyj_datapipeline_spark.io import read_table
from mcyj_datapipeline_spark.operators.similarity import (
    kmeans_centroids,
    kmeans_centroids_converged,
)

SF = "/root/testdata/sf0.001"
TOL = 1e-4


@pytest.fixture(scope="module")
def emb(spark):
    return read_table(spark, SF, "embeddings").select(
        "vec_id", "embedding"
    )


def test_converged_stops_below_tol_and_is_absorbing(spark, emb):
    cents, its, shift = kmeans_centroids_converged(
        emb, n_centroids=16, max_iters=25, tol=TOL
    )
    assert shift < TOL and 0 < its < 25
    assert cents.count() == 16
    # restarting FROM the fixed point: one round, still below tol
    _, its2, shift2 = kmeans_centroids_converged(
        emb, n_centroids=16, max_iters=1, tol=TOL, start_centroids=cents
    )
    assert its2 == 1 and shift2 < TOL


@pytest.mark.heavytier
def test_warm_restart_no_more_rounds_than_cold(spark, emb):
    yday = emb.filter(F.pmod(F.xxhash64("vec_id"), F.lit(50)) != 0)
    ycents, _, yshift = kmeans_centroids_converged(
        yday, n_centroids=16, max_iters=25, tol=TOL
    )
    assert yshift < TOL
    _, cold_its, cold_shift = kmeans_centroids_converged(
        emb, n_centroids=16, max_iters=25, tol=TOL
    )
    _, warm_its, warm_shift = kmeans_centroids_converged(
        emb, n_centroids=16, max_iters=25, tol=TOL,
        start_centroids=ycents,
    )
    assert cold_shift < TOL and warm_shift < TOL
    assert warm_its <= cold_its


def test_fixed_count_round_body_shared(spark, emb):
    """The refactored shared round body: a fixed-3 kmeans_centroids
    equals a converged run capped at 3 rounds with an impossible tol
    (same seed, same rounds — byte-identical centroid rows)."""
    fixed = kmeans_centroids(emb, n_centroids=8, iters=3)
    capped, its, _ = kmeans_centroids_converged(
        emb, n_centroids=8, max_iters=3, tol=1e-30
    )
    assert its == 3
    a = sorted(map(tuple, fixed.collect()))
    b = sorted(map(tuple, capped.collect()))
    assert a == b


def test_converged_guards(spark, emb):
    with pytest.raises(ValueError, match="max_iters"):
        kmeans_centroids_converged(emb, max_iters=0)
    with pytest.raises(ValueError, match="tol"):
        kmeans_centroids_converged(emb, tol=0.0)
