"""PCA operator tests: the properties the missing SQL oracle would
have checked — orthonormal basis, numpy ground-truth parity,
partitioning invariance (the distributed Gram must not depend on how
rows are split), variance ordering, and reconstruction-error bound."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from mcyj_datapipeline_spark.operators.pca import pca_fit, pca_project


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.RandomState(7)
    # anisotropic cloud: variance concentrated in a few directions
    basis = rng.randn(64, 64)
    scales = np.concatenate([np.array([10, 6, 4, 2.5]), 0.3 * np.ones(60)])
    x = rng.randn(400, 64) * scales @ basis[:64]
    rows = [(i, x[i].astype(float).tolist()) for i in range(400)]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).persist()


def test_components_are_orthonormal(spark, emb):
    m = pca_fit(emb, "embedding", k=8)
    gram = m.components @ m.components.T
    assert np.allclose(gram, np.eye(8), atol=1e-8)


def test_matches_numpy_ground_truth(spark, emb):
    """The distributed fit must agree with a plain numpy PCA on the
    collected data — eigenvalues exactly, eigenvectors up to the sign
    convention (which the operator fixes deterministically)."""
    m = pca_fit(emb, "embedding", k=4)
    x = np.asarray(
        [r["embedding"] for r in emb.orderBy("vec_id").collect()]
    )
    cov = np.cov(x.T, bias=True)
    evals = np.sort(np.linalg.eigvalsh(cov))[::-1]
    assert np.allclose(m.explained, evals[:4], rtol=1e-8)
    # projected variance per component == eigenvalue
    proj = (x - x.mean(axis=0)) @ m.components.T
    assert np.allclose(proj.var(axis=0), m.explained, rtol=1e-8)


def test_fit_invariant_to_partitioning(spark, emb):
    """Same model whether the data arrives in 1 partition or 13 —
    the map-side Gram partials must merge exactly."""
    m1 = pca_fit(emb.coalesce(1), "embedding", k=6)
    m13 = pca_fit(emb.repartition(13), "embedding", k=6)
    assert np.allclose(m1.explained, m13.explained, rtol=1e-10)
    assert np.allclose(m1.components, m13.components, atol=1e-8)
    assert np.allclose(m1.mean, m13.mean, rtol=1e-12)


def test_explained_variance_decreasing_and_retained(spark, emb):
    m = pca_fit(emb, "embedding", k=8)
    assert all(
        m.explained[i] >= m.explained[i + 1] - 1e-12
        for i in range(len(m.explained) - 1)
    )
    # 4 real directions dominate -> 8 components retain almost all var
    assert m.variance_retained() > 0.9


def test_projection_reconstruction_error_bound(spark, emb):
    """||x - reconstruct(project(x))||^2 averaged over rows must equal
    the energy of the DROPPED eigenvalues — the PCA optimality
    identity, here doubling as an end-to-end check of pca_project."""
    k = 8
    m = pca_fit(emb, "embedding", k=k)
    out = pca_project(emb, m, "vec_id", "embedding", "reduced")
    red = {
        r["vec_id"]: np.asarray(r["reduced"], dtype=np.float64)
        for r in out.collect()
    }
    x = np.asarray(
        [r["embedding"] for r in emb.orderBy("vec_id").collect()]
    )
    y = np.stack([red[i] for i in range(len(x))])
    recon = y @ m.components + m.mean
    err = ((x - recon) ** 2).sum(axis=1).mean()
    dropped = m.total_var - m.explained.sum()
    assert err == pytest.approx(dropped, rel=1e-3)  # float32 projection


def test_projection_schema_and_width(spark, emb):
    m = pca_fit(emb, "embedding", k=5)
    out = pca_project(emb, m)
    row = out.first()
    assert out.columns == ["vec_id", "reduced"]
    assert len(row["reduced"]) == 5
    assert out.count() == emb.count()
