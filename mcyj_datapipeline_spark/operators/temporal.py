"""Temporal operators Spark lacks as built-ins: the as-of join.

For each left row, attach the most recent right row at-or-before the
left timestamp within the same key. The naive formulation is an
inequality (range) join — quadratic blowup per key. This implementation
is the merge-style linear form: tag and union both sides, sort within
key by time, carry the last-seen right values forward with a window,
keep the left rows. One shuffle on (key), one sort — the same cost as a
window aggregate, independent of how many right rows precede each left
row. At 100 TB the shuffle partitions by key and AQE splits skewed keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
) -> DataFrame:
    """Left as-of join: every ``left`` row + the latest ``right`` values
    with ``right_ts <= left_ts`` for the same ``key`` (nulls when no
    prior right row exists). Ties (equal timestamps) take the right row,
    matching DuckDB ``ASOF JOIN``'s ``>=`` semantics — the right side
    sorts before the left at the same instant."""
    l_tagged = left.withColumn("_ts", F.col(left_ts)).withColumn(
        "_side", F.lit(1)
    )
    r_tagged = (
        right.select(
            key,
            F.col(right_ts).alias("_ts"),
            *[F.col(c).alias(f"_r_{c}") for c in value_cols],
        )
        .withColumn("_side", F.lit(0))
    )
    unioned = l_tagged.unionByName(r_tagged, allowMissingColumns=True)
    # Right rows (side 0) sort before left rows at the same timestamp,
    # so an exactly-simultaneous right value is visible to the left row.
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("_ts"), F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_asof_{c}")
            for c in value_cols
        ],
    )
    out_cols = [c for c in left.columns] + [
        F.col(f"_asof_{c}").alias(f"asof_{c}") for c in value_cols
    ]
    return carried.filter(F.col("_side") == 1).select(*out_cols)
