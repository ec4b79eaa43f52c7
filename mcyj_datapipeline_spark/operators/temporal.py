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

from mcyj_datapipeline_spark.functions.dates import epoch_us


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
    # Right rows carry their values inside ONE struct: last(ignorenulls)
    # must key on "was there a right ROW" — a right row whose VALUE is
    # legitimately NULL still matches (DuckDB ASOF returns its NULL; a
    # per-column ignorenulls would skip past it to a stale older value).
    r_tagged = (
        right.select(
            key,
            F.col(right_ts).alias("_ts"),
            F.struct(
                *[F.col(c).alias(f"_r_{c}") for c in value_cols]
            ).alias("_rvals"),
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
        "*", F.last("_rvals", ignorenulls=True).over(w).alias("_asof")
    )
    out_cols = [c for c in left.columns] + [
        F.col(f"_asof._r_{c}").alias(f"asof_{c}") for c in value_cols
    ]
    return carried.filter(F.col("_side") == 1).select(*out_cols)


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    key: str,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bucket: str = "1 hour",
) -> DataFrame:
    """Range join (point ∈ [start, end], same key) without the planner's
    inequality-join cross product: band both sides into fixed time
    buckets — an interval lands in every bucket it overlaps, a point in
    exactly one — equi-join on (key, bucket), then refine with the exact
    containment predicate. Shuffle is on (key, bucket); the quadratic
    term is bounded by per-bucket density instead of per-key row counts.
    Interval end is inclusive; each (point, interval) pair emits once
    (the point's bucket is unique)."""
    # Bucket ids via epoch arithmetic (F.window can appear only once per
    # plan, and integer bucket ids shuffle cheaper than timestamps).
    try:
        n, unit = bucket.split()
        bucket_us = int(n) * {
            "second": 1_000_000,
            "seconds": 1_000_000,
            "minute": 60_000_000,
            "minutes": 60_000_000,
            "hour": 3_600_000_000,
            "hours": 3_600_000_000,
        }[unit]
    except (ValueError, KeyError) as exc:
        raise ValueError(f"unsupported bucket spec: {bucket!r}") from exc

    def bucket_of(col):
        return F.floor(epoch_us(col) / F.lit(bucket_us))

    p = points.withColumn("_bucket", bucket_of(point_ts))
    iv = intervals.withColumn(
        "_buckets",
        F.sequence(bucket_of(start_ts), bucket_of(end_ts), F.lit(1)),
    ).withColumn("_bucket", F.explode("_buckets")).drop("_buckets")
    joined = p.join(iv, on=[key, "_bucket"]).filter(
        (F.col(point_ts) >= F.col(start_ts)) & (F.col(point_ts) <= F.col(end_ts))
    )
    return joined.drop("_bucket")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bucket: str = "1 hour",
) -> DataFrame:
    """Interval×interval overlap join (``[l_start,l_end] ∩
    [r_start,r_end] ≠ ∅``, same key, bounds inclusive) — the
    generalization of :func:`point_in_interval_join` where BOTH sides
    are ranges, which the planner would otherwise run as a per-key
    cross product with an inequality filter.

    Banding: each interval explodes into every fixed-width bucket it
    overlaps; the equi-join on (key, bucket) finds every overlapping
    pair (two overlapping intervals share the bucket containing
    max(l_start, r_start)), then the exact predicate refines and the
    CANONICAL-BUCKET filter (keep the pair only in that shared
    max-start bucket) collapses multi-bucket double-hits — emitting
    each pair exactly once without a dedup shuffle, and without
    conflating genuinely duplicate input rows the way a row-wide
    ``dropDuplicates`` would. Shuffle is
    on (key, bucket); per-bucket density bounds the quadratic term.
    Pick ``bucket`` near the typical interval length: too small
    multiplies fan-out rows, too large re-creates per-key density."""
    try:
        n, unit = bucket.split()
        bucket_us = int(n) * {
            "second": 1_000_000,
            "seconds": 1_000_000,
            "minute": 60_000_000,
            "minutes": 60_000_000,
            "hour": 3_600_000_000,
            "hours": 3_600_000_000,
        }[unit]
    except (ValueError, KeyError) as exc:
        raise ValueError(f"unsupported bucket spec: {bucket!r}") from exc

    def bucket_of(col: str):
        return F.floor(epoch_us(col) / F.lit(bucket_us))

    lb = left.withColumn(
        "_bucket",
        F.explode(F.sequence(bucket_of(l_start), bucket_of(l_end), F.lit(1))),
    )
    rb = right.withColumn(
        "_bucket",
        F.explode(F.sequence(bucket_of(r_start), bucket_of(r_end), F.lit(1))),
    )
    canonical = F.floor(
        epoch_us(F.greatest(F.col(l_start), F.col(r_start))) / F.lit(bucket_us)
    )
    return (
        lb.join(rb, on=[key, "_bucket"])
        .filter(
            (F.col(l_start) <= F.col(r_end))
            & (F.col(r_start) <= F.col(l_end))
        )
        .filter(F.col("_bucket") == canonical)
        .drop("_bucket")
    )


def frontier_schedule(
    urls: DataFrame,
    delays: DataFrame,
    id_col: str = "url_id",
    host_col: str = "host",
    delay_col: str = "crawl_delay_s",
    default_delay_s: float = 1.0,
) -> DataFrame:
    """Crawl-frontier scheduling: assign each URL a fetch offset that
    honors its host's crawl delay — the i-th URL of a host fetches at
    ``i * delay`` seconds. One window per host (ordered by ``id_col``
    for determinism) LEFT-joined against the one-row-per-domain delay
    table (broadcast side) — a host with no delay row schedules at
    ``default_delay_s`` instead of silently vanishing from the
    frontier (the missing-rules convention :func:`..procedural
    .robots_filter` also uses). Offsets stay fractional so sub-second
    delays keep their politeness spacing. The schedule is a pure
    function of (host, rank), so retries and re-runs agree; real
    crawlers add jitter on top.

    At 100 TB of frontier this is exactly the per-host sequence the
    politeness constraint forces — the window partitions by host, so no
    global ordering ever materializes."""
    from pyspark.sql import Window

    w = Window.partitionBy(host_col).orderBy(id_col)
    delay = F.coalesce(F.col(delay_col), F.lit(default_delay_s))
    return (
        urls.join(F.broadcast(delays), host_col, "left")
        .withColumn("_rank", F.row_number().over(w) - 1)
        .select(
            id_col,
            host_col,
            (F.col("_rank") * delay).cast("double").alias("fetch_at_s"),
        )
    )


def interval_islands(
    df,
    key_col: str,
    start_col: str,
    end_col: str,
):
    """Gaps-and-islands: merge overlapping/touching intervals per key
    into maximal covered spans, reporting per key the island count,
    total covered milliseconds, and the longest island. The classic
    coverage rollup (user activity spans, sensor uptime, lease
    coalescing).

    Plan: one key-partitioned window ordered by (start, end) computes
    the running max of prior ends; a row starts a new island iff its
    start exceeds that max, and the island id is the running sum of
    those flags — islands then aggregate with min(start)/max(end)
    (an island's union is contiguous by construction, so covered time
    is exactly max_end - min_start). Two groupBys after the window,
    all partitioned on the key; no self-join, no explode. Equal-start
    ties cannot flip island boundaries (equal starts imply overlap),
    so the result is partition-layout invariant."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy(key_col).orderBy(start_col, end_col)
    prev_max = F.max(end_col).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = df.select(key_col, start_col, end_col).withColumn(
        "_new",
        F.when(
            prev_max.isNull() | (F.col(start_col) > prev_max), 1
        ).otherwise(0),
    )
    islands = (
        flagged.withColumn(
            "island_id",
            F.sum("_new").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .groupBy(key_col, "island_id")
        .agg(
            F.min(start_col).alias("s"),
            F.max(end_col).alias("e"),
        )
        .select(
            key_col,
            # TIMESTAMP_NTZ sources need the cast; the session timezone
            # is pinned to UTC (session.py) so it is a pure relabel and
            # the subtraction is exact epoch arithmetic either way
            (
                F.unix_millis(F.col("e").cast("timestamp"))
                - F.unix_millis(F.col("s").cast("timestamp"))
            ).alias("span_ms"),
        )
    )
    return islands.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_islands"),
        F.sum("span_ms").alias("covered_ms"),
        F.max("span_ms").alias("max_island_ms"),
    )
