"""Distributed PCA for embedding columns: one-pass covariance via
map-side Gram matrices, driver-side eigendecomposition (d x d, tiny),
Arrow-batched projection.

The 100 TB shape: the ONLY full-data pass is the Gram accumulation,
and it reduces to one (d*d + d + 1)-float row PER PARTITION before
anything moves — a 1000-executor job shuffles a few thousand 33 KB
rows (d=64) no matter how many vectors. The eigensolve is O(d^3) on
the driver (microseconds at d=64; d is embedding width, never corpus
size). Projection is an Arrow-batched numpy matmul — dense linear
algebra is the one hot path where a Pandas UDF beats codegen row
expressions.

Public-knowledge basis: standard PCA (Pearson 1901/Hotelling 1933) and
the map-reduce Gram-matrix formulation used by every distributed ML
library (e.g. Spark MLlib's RowMatrix.computeCovariance — re-expressed
here over DataFrame/mapInPandas so ml.linalg types never enter the
pipeline's schemas).
"""

from __future__ import annotations

from typing import Iterator, NamedTuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class PCAModel(NamedTuple):
    """Fitted PCA basis. ``components`` is (k, d) orthonormal rows in
    decreasing-eigenvalue order; ``mean`` is (d,); ``explained`` the
    top-k eigenvalues; ``total_var`` the full trace (for
    variance-retained reporting)."""

    components: np.ndarray
    mean: np.ndarray
    explained: np.ndarray
    total_var: float

    def variance_retained(self) -> float:
        return float(self.explained.sum() / self.total_var)


def pca_fit(
    df: DataFrame, vec_col: str = "embedding", k: int = 8
) -> PCAModel:
    """One data pass: per-partition (n, sum, X^T X) with numpy, then a
    driver-side merge of the per-partition partials (<= one tiny row
    per partition — the documented exception to no-collect, same class
    as the k-means centroid pull) and an eigh of the d x d covariance.

    Sign convention: each component's largest-|coordinate| entry is
    made positive, so the basis is deterministic across runs/partition
    counts (eigenvectors are otherwise sign-ambiguous).
    """

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n, s, g = 0, None, None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.asarray(list(pdf[vec_col]), dtype=np.float64)
            n += x.shape[0]
            s = x.sum(axis=0) if s is None else s + x.sum(axis=0)
            gram = x.T @ x
            g = gram if g is None else g + gram
        if n:
            yield pd.DataFrame(
                {
                    "n": [n],
                    "s": [s.tolist()],
                    "g": [g.reshape(-1).tolist()],
                }
            )

    rows = (
        df.select(vec_col)
        .mapInPandas(
            partials, "n long, s array<double>, g array<double>"
        )
        .collect()
    )
    if not rows:
        raise ValueError("pca_fit: empty input")
    n = sum(r["n"] for r in rows)
    s = np.sum([np.asarray(r["s"]) for r in rows], axis=0)
    d = s.shape[0]
    g = np.sum(
        [np.asarray(r["g"]).reshape(d, d) for r in rows], axis=0
    )
    return model_from_moments(n, s, g, k)


def model_from_moments(
    n: int, s: np.ndarray, g: np.ndarray, k: int
) -> PCAModel:
    """The driver-side tail of :func:`pca_fit`, split out so the
    incremental Gram fold (:mod:`pca_incremental`) derives the SAME
    model from persisted moments: ``n`` row count, ``s`` (d,) dim
    sums, ``g`` (d, d) raw Gram — sufficient statistics; the
    eigensolve never sees data."""
    mean = s / n
    # covariance = E[xx^T] - mean mean^T  (population; n, not n-1 —
    # the eigenbasis is scale-invariant so the choice cannot change it)
    cov = g / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1]
    evals, evecs = evals[order], evecs[:, order]
    comps = evecs[:, :k].T  # (k, d)
    # deterministic sign: dominant coordinate positive
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return PCAModel(
        components=comps,
        mean=mean,
        explained=evals[:k],
        total_var=float(evals.sum()),
    )


def pca_project(
    df: DataFrame,
    model: PCAModel,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "reduced",
) -> DataFrame:
    """Project vectors onto the fitted basis: (x - mean) @ components^T
    as an Arrow-batched matmul. The model (k x d + d floats) rides the
    closure — a few KB serialized once per task, the same
    broadcast-coefficients pattern as ml_quality scoring."""
    comps = model.components
    mean = model.mean

    def proj(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.asarray(list(pdf[vec_col]), dtype=np.float64)
            y = (x - mean) @ comps.T
            yield pd.DataFrame(
                {id_col: pdf[id_col], out_col: list(y.astype(np.float32))}
            )

    return df.select(id_col, vec_col).mapInPandas(
        proj, f"{id_col} long, {out_col} array<float>"
    )
