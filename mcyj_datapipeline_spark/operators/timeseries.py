"""Time-series regularization: resample sparse per-key observations
onto a dense calendar spine, then fill gaps by last-observation-
carried-forward or linear interpolation.

The staple pre-processing for any per-entity metric feed (sensor
readings, account balances, engagement scores) before windowed models
consume it: models want one row per (key, period), reality delivers
rows only when something happened.

Plan shape (both fills): one groupBy to daily observations, a spine
built from a 1-ROW global bounds relation cross-joined to the distinct
keys (``sequence`` + ``explode`` — no driver collect, no per-key
range scan), one left join back, and key-partitioned windows. Spine
cardinality is keys × days — linear, explicit, and the only term that
grows. The ignore-nulls window frames hold O(days-per-key) rows per
task; for multi-year histories partition the spine by year and carry
boundary values, the same trick as the packing windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def daily_observations(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Collapse an event stream to one (key, day, avg value) row."""
    return (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(
            F.col(key_col).alias("k"),
            F.to_date(F.date_trunc("day", F.col(ts_col))).alias("d"),
        )
        .agg(F.round(F.avg(value_col), round_to).alias("v"))
    )


def _with_spine(obs: DataFrame) -> DataFrame:
    """(k, d, v) left-joined onto the dense per-key daily spine built
    from the GLOBAL date bounds (1-row broadcast, no collect)."""
    bounds = obs.agg(
        F.min("d").alias("lo"), F.max("d").alias("hi")
    )
    spine = (
        obs.select("k")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "k",
            F.explode(
                F.sequence("lo", "hi", F.expr("interval 1 day"))
            ).alias("d"),
        )
    )
    return spine.join(obs, ["k", "d"], "left")


def resample_locf(obs: DataFrame) -> DataFrame:
    """Dense daily series with gaps filled by the last observed value
    (rows before a key's first observation stay NULL). Input: the
    (k, d, v) shape produced by :func:`daily_observations`."""
    wp = (
        Window.partitionBy("k")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return _with_spine(obs).select(
        "k", "d", F.last("v", ignorenulls=True).over(wp).alias("locf")
    )


def interpolate_linear(obs: DataFrame, round_to: int = 6) -> DataFrame:
    """Dense daily series with gaps filled by linear interpolation
    between the neighboring observations; edges (before first / after
    last) extend the nearest observation flat."""
    wp = (
        Window.partitionBy("k")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("k")
        .orderBy("d")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_d = F.when(F.col("v").isNotNull(), F.col("d"))
    ctx = _with_spine(obs).select(
        "k",
        "d",
        "v",
        F.last("v", ignorenulls=True).over(wp).alias("pv"),
        F.last(obs_d, ignorenulls=True).over(wp).alias("pd"),
        F.first("v", ignorenulls=True).over(wf).alias("nv"),
        F.first(obs_d, ignorenulls=True).over(wf).alias("nd"),
    )
    frac = F.datediff("d", "pd").cast("double") / F.datediff("nd", "pd")
    interp = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(
            F.col("pv").isNotNull() & F.col("nv").isNotNull(),
            F.col("pv") + (F.col("nv") - F.col("pv")) * frac,
        )
        .when(F.col("pv").isNotNull(), F.col("pv"))
        .otherwise(F.col("nv"))
    )
    # FLOAT-formula rounding, not F.round: interpolation of 6dp-rounded
    # values with small-integer day fractions lands EXACTLY on decimal
    # round-halves (e.g. ...3335), where Spark's BigDecimal HALF_UP
    # (shortest-repr) and a float-side round disagree by 1 ulp of the
    # last digit. floor(x*10^r + 0.5)/10^r runs the same IEEE754 ops on
    # the same bits in any engine, so cross-engine parity is exact.
    # (Values here are non-negative; for negatives use half-away signs.)
    scale = float(10**round_to)
    stable_round = F.floor(interp * scale + F.lit(0.5)) / scale
    return ctx.select("k", "d", stable_round.alias("v_interp"))
