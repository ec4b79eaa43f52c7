"""Incremental PCA maintenance (round 12): fold per-batch Gram
partials into a PERSISTED state table and derive the model from
state — the nightly-refresh shape (e12/e17b, the BM25 index fold)
extended to the embedding-moments family.

The from-scratch :func:`pca.pca_fit` is one full corpus pass per fit;
at 100 TB a nightly refit re-reads everything for a sub-percent
delta. PCA's sufficient statistics are ADDITIVE — ``n``, per-dim sums
``s`` (d,), raw Gram ``G = Σ x xᵀ`` (d, d) — so the incremental form
folds each ingest batch's moments (one batch-sized pass, a
(d² + d + 1)-row upsert) and the model derivation
(:func:`pca.model_from_moments`, the SAME driver-side tail the cold
fit uses) reads only the metadata-grain state.

Idempotency without bookkeeping: additive state normally needs
applied-batch tracking (a replayed night would double-count). Instead
the state holds PER-BATCH partials keyed ``(batch_id, cell)`` — a
replayed fold rewrites the same keys with the same values, and
query-time totals sum across batches (a few thousand rows however
many nights have landed). Same crash/replay contract as the BM25
index fold, no commit-ordering problem between tables.

Cross-engine exactness: the oracle-facing column ``val_q`` quantizes
each coordinate to ``floor(x * 1000 + 0.5)`` (an exact int64 —
float32 inputs make the product of two quantized values ≤ 1e6 and
sums over millions of rows stay far under 2^53), so partials are
INTEGER-exact: invariant to partitioning, batch split, and engine
(DuckDB computes the identical number from the parquet — a true
value-hash oracle with no rounding tolerance at all). The parallel
``val`` column keeps full-precision doubles for the model path;
tests pin model-from-state ≈ cold-fit to numpy tolerance.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mcyj_datapipeline_spark.operators.pca import PCAModel, model_from_moments
from mcyj_datapipeline_spark.streaming.incremental import ParquetStateTable

_SCHEMA = "kind string, i int, j int, val_q long, val double"


def gram_partial_long(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """One pass over a batch → its moment partial in long form at
    ``(kind, i, j)`` grain, 1-based dims: kind ``'n'`` row count,
    ``'s'`` per-dim sums, ``'g'`` upper-triangular raw-Gram entries.
    Each partition reduces to ≤ (d²+d)/2 + d + 1 rows before the
    single groupBy — the long-form twin of :func:`pca.pca_fit`'s
    per-partition collect, shaped for a keyed state upsert instead of
    a driver merge."""

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n, sq, s, gq, g = 0, None, None, None, None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.asarray(list(pdf[vec_col]), dtype=np.float64)
            xq = np.floor(x * 1000.0 + 0.5).astype(np.int64)
            n += x.shape[0]
            sq = xq.sum(axis=0) if sq is None else sq + xq.sum(axis=0)
            s = x.sum(axis=0) if s is None else s + x.sum(axis=0)
            gq = xq.T @ xq if gq is None else gq + xq.T @ xq
            g = x.T @ x if g is None else g + x.T @ x
        if not n:
            return
        d = s.shape[0]
        iu, ju = np.triu_indices(d)
        yield pd.DataFrame(
            {
                "kind": ["n"] + ["s"] * d + ["g"] * len(iu),
                "i": [0] + list(range(1, d + 1)) + list(iu + 1),
                "j": [0] + [0] * d + list(ju + 1),
                "val_q": np.concatenate(
                    ([n], sq, gq[iu, ju])
                ).astype(np.int64),
                "val": np.concatenate(([float(n)], s, g[iu, ju])),
            }
        )

    return (
        df.select(vec_col)
        .mapInPandas(partials, _SCHEMA)
        .groupBy("kind", "i", "j")
        .agg(
            F.sum("val_q").alias("val_q"),
            F.sum("val").alias("val"),
        )
    )


def open_gram_state(
    spark: SparkSession, state_root: str, num_buckets: int | None = 4
) -> ParquetStateTable:
    return ParquetStateTable(
        spark, state_root, key="cell", num_buckets=num_buckets
    )


def fold_gram_batch(
    batch: DataFrame,
    batch_id: str,
    state: ParquetStateTable,
    vec_col: str = "embedding",
) -> None:
    """ONE fold: the batch's moment partial (the only batch-sized
    work) upserted under ``(batch_id, cell)`` keys. Replaying a
    delivered batch rewrites identical rows (the int column exactly;
    the double column up to partial-sum order) — idempotent with no
    applied-batch bookkeeping."""
    if ":" in batch_id:
        # cell keys are colon-joined (batch_id:kind:i:j); a colon in
        # the id could alias another batch's cells
        raise ValueError(
            f"batch_id must not contain ':', got {batch_id!r}"
        )
    partial = gram_partial_long(batch, vec_col).select(
        F.concat_ws(
            ":", F.lit(batch_id), "kind", F.col("i").cast("string"),
            F.col("j").cast("string"),
        ).alias("cell"),
        F.lit(batch_id).alias("batch_id"),
        "kind",
        "i",
        "j",
        "val_q",
        "val",
    )
    state.update(partial, ["batch_id", "kind", "i", "j", "val_q", "val"])


def stream_gram_fold(
    spark: SparkSession,
    landing_dir: str,
    state_root: str,
    checkpoint_dir: str,
    vec_col: str = "embedding",
    num_buckets: int | None = 4,
) -> None:
    """The Gram fold as a Structured-Streaming query over a landing
    dir (foreachBatch + Trigger.AvailableNow + checkpoint). One
    subtlety the keyed BM25/release folds don't have: this state is
    ADDITIVE PER BATCH, so the batch identity must survive not just
    crash-replay (epoch ids do) but checkpoint LOSS — a fresh
    checkpoint re-delivers old files, possibly re-grouped into
    different epochs, and epoch-keyed partials would double-count.
    So the fold keys partials by the landing FILE NAME
    (``input_file_name()``, split within the micro-batch): re-folding
    a file under any grouping rewrites its own cells. The per-batch
    file list is a driver-side collect bounded by files-per-trigger,
    never data-sized."""
    import os

    state = open_gram_state(spark, state_root, num_buckets)

    def _fold(batch_df: DataFrame, _epoch: int) -> None:
        pinned = batch_df.withColumn(
            "_file", F.input_file_name()
        ).localCheckpoint(eager=True)
        files = sorted(
            r[0] for r in pinned.select("_file").distinct().collect()
        )
        for f in files:
            fold_gram_batch(
                pinned.filter(F.col("_file") == f),
                os.path.basename(f),
                state,
                vec_col,
            )

    (
        spark.readStream.schema(f"vec_id long, {vec_col} array<float>")
        .parquet(landing_dir)
        .writeStream.foreachBatch(_fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def gram_totals(state: ParquetStateTable) -> DataFrame:
    """Moments summed across every folded batch — ``(kind, i, j,
    gq, g)`` at d²-grain, never data-sized."""
    return (
        state.read()
        .groupBy("kind", "i", "j")
        .agg(F.sum("val_q").alias("gq"), F.sum("val").alias("g"))
    )


def pca_model_from_state(state: ParquetStateTable, k: int = 8) -> PCAModel:
    """Derive the PCA model from the folded state: collect the
    d²-grain totals (bounded by construction — same class as the
    k-means centroid pull) and run the exact driver-side tail the
    cold fit runs. No corpus pass."""
    rows = gram_totals(state).collect()
    n = 0
    s_entries: dict[int, float] = {}
    g_entries: dict[tuple[int, int], float] = {}
    for r in rows:
        if r["kind"] == "n":
            n = int(r["g"])
        elif r["kind"] == "s":
            s_entries[r["i"] - 1] = r["g"]
        else:
            g_entries[(r["i"] - 1, r["j"] - 1)] = r["g"]
    if not n:
        raise ValueError("pca_model_from_state: empty state")
    d = len(s_entries)
    s = np.array([s_entries[i] for i in range(d)])
    g = np.zeros((d, d))
    for (i, j), v in g_entries.items():
        g[i, j] = v
        g[j, i] = v
    return model_from_moments(n, s, g, k)
