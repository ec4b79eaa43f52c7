"""Incremental batch semantics (T1–T6): persistent keyed state,
idempotent re-runs, bounded work batches, cascaded derivations.

The reference's contract everywhere is ``new = all − already_done``,
append, repeat (SURVEY §2.10). Batch form: anti-join work queues against
a parquet state table with full-outer merge writes (the seam where a
Delta ``MERGE`` slots in at cluster scale). Streaming form: the file
source + ``Trigger.AvailableNow`` + checkpoint in :mod:`events` carries
the same semantics with exactly-once bookkeeping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mcyj_datapipeline_spark.operators.relational import coalesce_merge


class ParquetStateTable:
    """T1: persistent keyed state over plain parquet with merge-on-write.

    ``update`` computes existing ⊕ updates (non-empty updates win per
    column, J11 semantics) and atomically swaps the directory via a
    versioned subdir + _CURRENT pointer — the poor man's Delta commit
    protocol; swap in Delta/Iceberg for real clusters."""

    def __init__(self, spark: SparkSession, path: str, key: str):
        self.spark = spark
        self.path = path
        self.key = key

    def _current_file(self) -> str:
        return f"{self.path}/_CURRENT"

    def read(self) -> DataFrame | None:
        import os

        cur = self._current_file()
        if not os.path.exists(cur):
            return None
        with open(cur) as f:
            version = f.read().strip()
        return self.spark.read.parquet(f"{self.path}/v{version}")

    def write_initial(self, df: DataFrame) -> None:
        self._commit(df, 0)

    def _commit(self, df: DataFrame, version: int) -> None:
        import os

        df.write.mode("overwrite").parquet(f"{self.path}/v{version}")
        os.makedirs(self.path, exist_ok=True)
        tmp = f"{self._current_file()}.tmp"
        with open(tmp, "w") as f:
            f.write(str(version))
        os.replace(tmp, self._current_file())

    def _next_version(self) -> int:
        import os

        cur = self._current_file()
        if not os.path.exists(cur):
            return 0
        with open(cur) as f:
            return int(f.read().strip()) + 1

    def update(self, updates: DataFrame, columns: list[str]) -> DataFrame:
        existing = self.read()
        if existing is None:
            merged = updates
        else:
            merged = coalesce_merge(existing, updates, self.key, columns)
        merged = merged.localCheckpoint(eager=True)  # cut lineage before swap
        self._commit(merged, self._next_version())
        return merged


def pending_work(
    candidates: DataFrame,
    state: DataFrame | None,
    key: str,
    done_predicate=None,
    limit: int | None = None,
) -> DataFrame:
    """T3/T4/O4: the bounded incremental work queue. ``done`` rows are
    state rows satisfying ``done_predicate`` (e.g. sha256 != '');
    deterministic ordering before the limit makes re-runs reproducible
    (reference sorted(missing)[:count], update_sir_summaries.py:336)."""
    if state is None:
        work = candidates
    else:
        done = state if done_predicate is None else state.filter(done_predicate)
        work = candidates.join(done.select(key), key, "left_anti")
    work = work.orderBy(key)
    return work.limit(limit) if limit else work


def three_way_download_decision(api: DataFrame, state: DataFrame) -> DataFrame:
    """T1 (reference run_full_pipeline.py:361-395): per API row decide
    skip (sha known) / backfill (row known, sha missing, local file
    present) / download (unknown). One left join + ``when`` chain instead
    of a per-row dict probe."""
    s = state.select(
        F.col("ContentDocumentId"),
        F.col("sha256").alias("_state_sha"),
        F.col("downloaded_path").alias("_state_path"),
    )
    return api.join(s, "ContentDocumentId", "left").withColumn(
        "decision",
        F.when(
            F.col("_state_sha").isNotNull() & (F.col("_state_sha") != ""), "skip"
        )
        .when(
            F.col("_state_path").isNotNull() & (F.col("_state_path") != ""),
            "backfill",
        )
        .otherwise("download"),
    ).drop("_state_sha", "_state_path")


def stream_upsert_into_state(
    spark: SparkSession,
    source_dir: str,
    state: "ParquetStateTable",
    checkpoint_dir: str,
    schema,
    columns: list[str],
) -> None:
    """Streaming MERGE: a file-source stream of updates applied to the
    persistent keyed state via ``foreachBatch`` — each micro-batch runs
    the same full-outer coalesce-merge as the batch path (J11), so
    stream and batch ingestion share one upsert semantics. The
    checkpoint makes delivery exactly-once per batch id; with Delta this
    exact seam becomes ``MERGE INTO`` inside the same foreachBatch."""

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.take(1):
            state.update(batch_df, columns)

    (
        spark.readStream.schema(schema)
        .parquet(source_dir)
        .writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
