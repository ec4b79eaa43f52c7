"""Skew mitigation: salted two-phase aggregation.

For algebraic aggregates (count/sum/min/max) Spark's map-side partial
aggregation already bounds per-key shuffle volume, and AQE splits skewed
join partitions at runtime (both enabled in :mod:`session`). Salting is
the remaining tool for the cases those don't cover — e.g. holistic
aggregates (``collect_list``/``collect_set``) or extreme heavy-hitter
keys where even the partially-aggregated rows for one key exceed a
task: append a deterministic salt to the key, aggregate (key, salt)
first (spreads one hot key over ``n_salt`` reducers), then combine the
per-salt partials per key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def deterministic_salt(col: Column, n_salt: int) -> Column:
    """Salt derived from a (high-cardinality) column so re-runs place
    rows identically — never ``rand()``, which breaks retry/recompute
    determinism in a distributed run."""
    return F.pmod(F.xxhash64(col), F.lit(n_salt))


def salted_group_count(
    df: DataFrame, key: str, salt_source: str, n_salt: int = 16
) -> DataFrame:
    """Two-phase count over a heavy-hitter key: groupBy(key, salt) →
    groupBy(key) sum of partials. Identical result to a plain
    groupBy-count; the shuffle for any single key is spread over
    ``n_salt`` reducers."""
    phase1 = (
        df.select(F.col(key), deterministic_salt(F.col(salt_source), n_salt).alias("_salt"))
        .groupBy(key, "_salt")
        .agg(F.count(F.lit(1)).alias("_partial"))
    )
    return phase1.groupBy(key).agg(F.sum("_partial").alias("count"))


def salted_collect_set(
    df: DataFrame, key: str, value: str, n_salt: int = 16
) -> DataFrame:
    """Holistic aggregate under skew: collect distinct values per key in
    two phases — per-(key, salt) ``collect_set`` (bounded task state),
    then flatten + distinct per key. This is the case map-side partial
    aggregation cannot save: one hot key's value set would otherwise
    assemble in a single reducer."""
    phase1 = (
        df.select(
            F.col(key),
            F.col(value),
            deterministic_salt(F.col(value), n_salt).alias("_salt"),
        )
        .groupBy(key, "_salt")
        .agg(F.collect_set(value).alias("_vals"))
    )
    return phase1.groupBy(key).agg(
        F.array_sort(
            F.array_distinct(F.flatten(F.collect_list("_vals")))
        ).alias("values")
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt_source: str,
    n_salt: int = 8,
) -> DataFrame:
    """Skew-mitigated equi-join: salt the BIG side's hot keys across
    ``n_salt`` sub-partitions (deterministic salt from a secondary
    column) and replicate the small side once per salt value, joining on
    ``(on, _salt)``. Result set is IDENTICAL to ``big.join(small, on)``
    — salting only changes row placement — so the plain join is the
    oracle. Use when one join key carries so many big-side rows that a
    single shuffle partition exceeds a task even after AQE's skew split
    (AQE can't split a partition mid-aggregation pipeline); the cost is
    ``n_salt``× the small side's shuffle volume, so keep the small side
    small or broadcast it instead."""
    salts = F.array(*[F.lit(i) for i in range(n_salt)])
    big_s = big.withColumn(
        "_salt", deterministic_salt(F.col(salt_source), n_salt)
    )
    small_s = small.withColumn("_salt", F.explode(salts))
    return big_s.join(small_s, [on, "_salt"]).drop("_salt")
