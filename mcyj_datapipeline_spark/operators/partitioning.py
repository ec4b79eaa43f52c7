"""Partitioning helpers: compute-aware parallelism control.

Spark sizes scan partitions by bytes (``spark.sql.files.maxPartitionBytes``),
which is right for IO-bound relational work but wrong for compute-bound
stages — sketches (MinHash/SimHash), vector arithmetic, and Python
(mapInPandas) kernels want partition count to track cores, not input
bytes. A small input (one parquet file under the split size) would
otherwise serialize the whole stage onto one task / one Python worker
while every other core idles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_for_compute(df: DataFrame, key: str) -> DataFrame:
    """Ensure ``df`` has at least core-count partitions before a
    compute-bound stage.

    CONDITIONAL: when the scan already yields >= cores partitions (any
    real cluster reading real data), no shuffle is added — an
    unconditional repartition would funnel the full payload through an
    exchange for nothing. Keyed hashing keeps distribution deterministic.
    """
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= parallelism:
        return df
    return df.repartition(parallelism, key)
