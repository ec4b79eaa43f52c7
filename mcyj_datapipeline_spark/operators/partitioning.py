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

    CONDITIONAL: when the input already has >= cores partitions, no
    shuffle is added — an unconditional repartition would funnel the
    full payload through an exchange for nothing. Keyed hashing keeps
    distribution deterministic.

    Two-step check, cheap first: if the lineage already contains a wide
    transform (join/aggregate/repartition/window/sort), its output
    partitioning tracks ``spark.sql.shuffle.partitions`` (>= cores by
    our session defaults) — and, critically, calling ``.rdd`` on such
    an AQE plan would EXECUTE its query stages just to report a
    partition count, running the join twice. Only for narrow scan
    lineages (where ``.rdd`` is free) do we consult the actual
    partition count."""
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    if _has_wide_node(df._jdf.queryExecution().optimizedPlan()):
        return df
    if df.rdd.getNumPartitions() >= parallelism:
        return df
    return df.repartition(parallelism, key)


_WIDE_NODE_NAMES = frozenset(
    {
        "Join",
        "Aggregate",
        "Window",
        "Sort",
        "Repartition",
        "RepartitionByExpression",
        "RepartitionOperation",
        "Deduplicate",
        "Distinct",
        "Intersect",
        "Except",
        "CoGroup",
        "FlatMapGroupsInPandas",
        "GlobalLimit",
    }
)


def _has_wide_node(jplan) -> bool:
    """True if the JVM logical plan TREE contains a wide transform node.

    Walks actual plan nodes and compares ``nodeName()`` exactly —
    substring-matching the rendered plan string false-positives on any
    column/alias/relation whose NAME contains 'Join'/'Sort'/etc., which
    would silently skip the compute spread."""
    stack = [jplan]
    while stack:
        node = stack.pop()
        if node.nodeName() in _WIDE_NODE_NAMES:
            return True
        children = node.children()
        for i in range(children.size()):
            stack.append(children.apply(i))
    return False
