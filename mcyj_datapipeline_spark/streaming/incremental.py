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
    """T1: persistent keyed state over plain parquet with merge-on-write
    (reference full-table rewrite: run_full_pipeline.py:44-50,
    backfill_download_metadata.py:106-112).

    Two layouts behind one interface:

    * ``num_buckets=None`` (legacy): ``update`` rewrites the whole table
      and atomically swaps via a versioned subdir + _CURRENT pointer —
      the poor man's Delta commit protocol. Fine at reference scale
      (thousands of keys); a full rewrite per merge is the bottleneck at
      100 TB state.
    * ``num_buckets=N``: the table lives in ONE directory hash-
      partitioned by ``_bucket = pmod(xxhash64(key), N)``. ``update``
      computes the touched buckets from the updates (partition-pruned
      read of only those buckets), merges, and rewrites ONLY the touched
      partitions via dynamic partition overwrite — untouched partitions'
      files are not even opened. Merge cost is now proportional to the
      update's key-spread, not the table size: the real MERGE shape that
      Delta/Iceberg ``MERGE INTO`` implements with finer (file-level)
      pruning, at this exact seam.
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        key: str,
        num_buckets: int | None = None,
        bucket_col: str | None = None,
    ):
        """``bucket_col`` (bucketed layout only) hashes a DIFFERENT
        column than ``key`` into ``_bucket`` — e.g. postings upserted
        per ``posting_key`` but partitioned by ``term`` so query reads
        prune to the query terms' buckets (:meth:`read_pruned`).
        CONTRACT: ``bucket_col`` must be functionally determined by
        ``key`` (a component of a composite key) — if a key's
        bucket-col value could change between upserts, the old row
        would survive in its old bucket beside the new one."""
        if bucket_col is not None and num_buckets is None:
            raise ValueError("bucket_col requires the bucketed layout")
        self.spark = spark
        self.path = path
        self.key = key
        self.num_buckets = num_buckets
        self.bucket_col = bucket_col if bucket_col is not None else key

    # -- legacy versioned-swap layout ------------------------------------

    def _current_file(self) -> str:
        return f"{self.path}/_CURRENT"

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

    # -- bucketed layout -------------------------------------------------

    def _data_dir(self) -> str:
        return f"{self.path}/data"

    def _bucket_of(self, col) -> "F.Column":
        return F.pmod(F.xxhash64(col), F.lit(self.num_buckets)).cast("int")

    # -- shared interface ------------------------------------------------

    def read(self, version: int | None = None) -> DataFrame | None:
        """Current state, or — versioned layout only — the state as of
        an earlier commit (``version=N`` reads ``vN``; superseded
        versions stay on disk until vacuumed). The audit/debug
        affordance Delta calls time travel, for free from the commit
        protocol."""
        import os

        if self.num_buckets is not None:
            if version is not None:
                raise ValueError(
                    "time travel requires the versioned layout "
                    "(num_buckets=None); bucketed state overwrites in place"
                )
            data = self._data_dir()
            if not os.path.isdir(data):
                return None
            return self.spark.read.parquet(data).drop("_bucket")
        if version is not None:
            vdir = f"{self.path}/v{version}"
            if not os.path.isdir(vdir):
                return None
            return self.spark.read.parquet(vdir)
        cur = self._current_file()
        if not os.path.exists(cur):
            return None
        with open(cur) as f:
            version_s = f.read().strip()
        return self.spark.read.parquet(f"{self.path}/v{version_s}")

    def vacuum(self, keep_last: int = 2) -> int:
        """Drop superseded version directories beyond the newest
        ``keep_last`` (versioned layout only). Returns the number of
        versions removed. The current version is never removed."""
        import os
        import re
        import shutil

        if self.num_buckets is not None:
            return 0
        if not os.path.exists(self._current_file()):
            return 0
        with open(self._current_file()) as f:
            current = int(f.read().strip())
        removed = 0
        for name in os.listdir(self.path):
            m = re.fullmatch(r"v(\d+)", name)
            # keep_last is clamped to >= 1: the CURRENT version must
            # survive any vacuum (the docstring's guarantee) — keep_last=0
            # would otherwise delete the directory _CURRENT points at
            if m and int(m.group(1)) <= current - max(1, keep_last):
                shutil.rmtree(os.path.join(self.path, name))
                removed += 1
        return removed

    def write_initial(self, df: DataFrame) -> None:
        if self.num_buckets is not None:
            (
                df.withColumn(
                    "_bucket", self._bucket_of(F.col(self.bucket_col))
                )
                .write.mode("overwrite")
                .partitionBy("_bucket")
                .parquet(self._data_dir())
            )
            return
        self._commit(df, 0)

    def read_pruned(self, bucket_values) -> DataFrame | None:
        """Rows whose ``bucket_col`` hashes into the buckets of the
        given values. The read lists ONLY those buckets' partition
        directories (explicit paths + ``basePath``), so untouched
        buckets contribute zero input splits — and zero listing — by
        construction, not by trusting a filter to reach partition
        discovery (the storage-level pruning a term-partitioned
        posting list buys query reads). The bucket list is computed
        driver-side from the values: at most ``len(bucket_values)``
        ints, never data-sized. A bucket can hold other values too —
        callers keep their value-level filter on top."""
        import os

        if self.num_buckets is None:
            raise ValueError("read_pruned requires the bucketed layout")
        data = self._data_dir()
        if not os.path.isdir(data):
            return None
        wanted = sorted(
            {
                r[0]
                for r in self.spark.createDataFrame(
                    [(v,) for v in bucket_values], [self.bucket_col]
                )
                .select(
                    self._bucket_of(F.col(self.bucket_col)).alias("_b")
                )
                .collect()
            }
        )
        paths = [
            p
            for b in wanted
            if os.path.isdir(p := os.path.join(data, f"_bucket={b}"))
        ]
        if not paths:
            # every wanted bucket is empty on disk: zero-row frame with
            # the table's schema (one listing of the root, no row reads)
            return (
                self.spark.read.parquet(data)
                .filter(F.lit(False))
                .drop("_bucket")
            )
        return (
            self.spark.read.option("basePath", data)
            .parquet(*paths)
            .drop("_bucket")
        )

    def update(self, updates: DataFrame, columns: list[str]) -> DataFrame:
        if self.num_buckets is not None:
            return self._update_bucketed(updates, columns)
        existing = self.read()
        if existing is None:
            merged = updates
        else:
            merged = coalesce_merge(existing, updates, self.key, columns)
        merged = merged.localCheckpoint(eager=True)  # cut lineage before swap
        self._commit(merged, self._next_version())
        return merged

    def _update_bucketed(self, updates: DataFrame, columns: list[str]) -> DataFrame:
        """Merge ``updates`` rewriting only the hash-buckets they touch.

        The touched-bucket list is collected to the driver — it is at
        most ``num_buckets`` ints, never data-sized. The pruned read of
        existing rows pushes ``_bucket IN (...)`` into partition
        discovery, so untouched buckets contribute zero input splits and
        their files stay byte-identical after the commit (dynamic
        partition overwrite only replaces partitions present in the
        written frame)."""
        if self.read() is None:
            self.write_initial(updates)
            return self.read()
        touched = [
            r[0]
            for r in updates.select(
                self._bucket_of(F.col(self.bucket_col)).alias("_bucket")
            )
            .distinct()
            .collect()
        ]
        if not touched:
            return self.read()
        existing = (
            self.spark.read.parquet(self._data_dir())
            .filter(F.col("_bucket").isin(touched))
            .drop("_bucket")
        )
        merged = coalesce_merge(existing, updates, self.key, columns).withColumn(
            "_bucket", self._bucket_of(F.col(self.bucket_col))
        )
        # Materialize before overwriting the directory we just read.
        merged = merged.localCheckpoint(eager=True)
        conf = self.spark.conf
        prev = conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        try:
            conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
            (
                merged.write.mode("overwrite")
                .partitionBy("_bucket")
                .parquet(self._data_dir())
            )
        finally:
            conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        return self.read()


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
    # limit=0 is a real request ("no budget this run"), not "unbounded"
    return work.limit(limit) if limit is not None else work


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


def state_version_diff(
    table: ParquetStateTable,
    old_version: int,
    new_version: int,
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Audit diff between two commits of a versioned state table:
    one row per key that was ADDED, REMOVED, or CHANGED between
    ``old_version`` and ``new_version``, with a ``change`` column.

    Change detection hashes the compared columns (``compare_cols``,
    default: all non-key columns present in both versions) on each
    side, so the full-outer join carries (key, 8-byte hash) — never
    the row payloads — and unchanged keys drop out before anything
    wide is materialized. This is the CDC-style "what did this merge
    actually do" question the reference answers by re-reading whole
    CSVs (run_full_pipeline.py:44-61); against 100 TB state it is two
    partition-pruned scans + one digest-width shuffle.

    Requires the versioned (num_buckets=None) layout, same as
    ``read(version=...)`` time travel.
    """
    old = table.read(version=old_version)
    new = table.read(version=new_version)
    if old is None or new is None:
        raise ValueError(
            f"missing state version: v{old_version if old is None else new_version}"
        )
    key = table.key
    if compare_cols is None:
        compare_cols = sorted(
            (set(old.columns) & set(new.columns)) - {key}
        )
    digest = F.xxhash64(*[F.col(c) for c in compare_cols])
    o = old.select(key, digest.alias("_h_old"))
    n = new.select(key, digest.alias("_h_new"))
    j = o.join(n, key, "full_outer")
    return (
        j.select(
            key,
            F.when(F.col("_h_old").isNull(), F.lit("added"))
            .when(F.col("_h_new").isNull(), F.lit("removed"))
            .when(F.col("_h_old") != F.col("_h_new"), F.lit("changed"))
            .alias("change"),
        )
        .filter(F.col("change").isNotNull())
    )
