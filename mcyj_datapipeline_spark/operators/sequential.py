"""Sequential per-key operators whose outputs CHAIN (each row's result
depends on previous rows' *results*, not just previous rows): throttle
with previous-KEPT semantics and exponential moving averages.

These are the honest ``applyInPandas`` cases: a window function can see
previous INPUT rows (lag/lead/cumsum), but not previous OUTPUT
decisions — keep/drop chains and recursively-defined smoothers are
sequential recurrences. Spark's contribution is the grouping: state
never crosses a key, so the recurrence runs embarrassingly parallel
across keys with one shuffle, and per-group memory is the group's row
count.

100 TB notes: group cardinality (user x type) grows with users, not
with time-per-user, so groups stay small and numerous — ideal for the
grouped-map path. A single pathological key with millions of rows
would pin one task: cap it upstream (the same valve as the dedup
bucket caps) or window the recurrence by time-slicing with carried
state (streaming/stateful.py runs THIS logic incrementally with
timeouts; these batch forms are its replay/backfill twins).
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def throttle_keep_chain(
    df: DataFrame,
    key_cols: Iterable[str],
    ts_col: str,
    cooldown_seconds: float,
    tiebreak_col: str,
) -> DataFrame:
    """Rate-limit with previous-KEPT semantics: within each key group
    (ordered by ``ts_col`` then ``tiebreak_col``), keep a row iff it is
    more than ``cooldown_seconds`` after the last KEPT row — the
    decision chain an alerting pipeline actually wants.

    Distinct from the window form (``ev_throttle_dedup``), whose lag
    compares to the previous EVENT: with a 30m cooldown and events at
    t, t+20m, t+40m, this keeps {t, t+40m} (t+20m suppressed; t+40m is
    40m past the last KEPT row t) while the lag form keeps only {t}
    (t+40m is just 20m past its suppressed predecessor). Output schema
    == input schema (kept rows only).
    """
    key_cols = list(key_cols)
    schema = df.schema

    def keep(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([ts_col, tiebreak_col])
        ts = pd.to_datetime(pdf[ts_col])
        kept_idx = []
        last_kept = None
        for i, t in zip(pdf.index, ts):
            if (
                last_kept is None
                or (t - last_kept).total_seconds() > cooldown_seconds
            ):
                kept_idx.append(i)
                last_kept = t
        return pdf.loc[kept_idx]

    return df.groupBy(*key_cols).applyInPandas(keep, schema=schema)


def ewma_per_key(
    df: DataFrame,
    key_cols: Iterable[str],
    ts_col: str,
    value_col: str,
    alpha: float,
    tiebreak_col: str,
    out_col: str = "ewma",
) -> DataFrame:
    """Exponentially-weighted moving average per key, ordered by
    (``ts_col``, ``tiebreak_col``): ewma_0 = v_0, ewma_i = alpha*v_i +
    (1-alpha)*ewma_{i-1} — the standard recursive smoother (pandas
    ``ewm(alpha, adjust=False)`` semantics; NULL values carry the
    previous ewma forward unchanged).

    Not window-expressible without numerically-explosive a^{-j} prefix
    tricks; as a grouped recurrence it is one shuffle + an O(rows)
    in-memory pass per group.
    """
    from pyspark.sql import types as T

    key_cols = list(key_cols)
    # fresh StructType: StructType.add mutates the receiver, and
    # df.schema must stay untouched
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.DoubleType())]
    )

    def smooth(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([ts_col, tiebreak_col])
        pdf[out_col] = (
            pdf[value_col].ewm(alpha=alpha, adjust=False, ignore_na=True)
            .mean()
        )
        return pdf

    return df.groupBy(*key_cols).applyInPandas(smooth, schema=out_schema)


def holt_linear_per_key(
    df: DataFrame,
    key_cols: Iterable[str],
    ts_col: str,
    value_col: str,
    alpha: float,
    beta: float,
    tiebreak_col: str,
) -> DataFrame:
    """Holt's linear-trend double exponential smoothing per key,
    ordered by (``ts_col``, ``tiebreak_col``): a LEVEL and a TREND
    recurrence chained through each other —

        level_0 = y_0,  trend_0 = 0
        fitted_t = level_{t-1} + trend_{t-1}          (1-step forecast)
        level_t  = alpha*y_t + (1-alpha)*fitted_t
        trend_t  = beta*(level_t - level_{t-1}) + (1-beta)*trend_{t-1}

    Appends ``level``, ``trend``, ``fitted`` (NULL on each key's first
    row — nothing to forecast from). Like the EWMA/throttle ops this
    depends on previous OUTPUTS, so it is a grouped ``applyInPandas``
    recurrence (one shuffle on the key, O(rows) per group) with a
    recursive-CTE DuckDB twin; the arithmetic is written in exactly
    this operation order so the float paths agree across engines."""
    import numpy as np
    from pyspark.sql import types as T

    key_cols = list(key_cols)
    out_schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("level", T.DoubleType()),
            T.StructField("trend", T.DoubleType()),
            T.StructField("fitted", T.DoubleType()),
        ]
    )

    def smooth(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([ts_col, tiebreak_col]).reset_index(drop=True)
        y = pdf[value_col].to_numpy(dtype=np.float64)
        n = len(y)
        level = np.empty(n)
        trend = np.empty(n)
        fitted = np.full(n, np.nan)
        if n:
            level[0], trend[0] = y[0], 0.0
            for i in range(1, n):
                f = level[i - 1] + trend[i - 1]
                fitted[i] = f
                level[i] = alpha * y[i] + (1.0 - alpha) * f
                trend[i] = (
                    beta * (level[i] - level[i - 1])
                    + (1.0 - beta) * trend[i - 1]
                )
        pdf["level"], pdf["trend"], pdf["fitted"] = level, trend, fitted
        return pdf

    return df.groupBy(*key_cols).applyInPandas(smooth, schema=out_schema)


def cusum_per_key(
    df: DataFrame,
    key_cols: Iterable[str],
    ts_col: str,
    value_col: str,
    k_frac: float = 0.25,
    h_frac: float = 1.0,
) -> DataFrame:
    """Two-sided CUSUM mean-shift detector per key, ordered by
    ``ts_col``: with ``mu`` the key's series mean, allowance
    ``k = k_frac * mu`` and threshold ``h = h_frac * mu``,

        sp_0 = max(0, (x_0 - mu) - k)        (upward drift)
        sp_t = max(0, sp_{t-1} + ((x_t - mu) - k))
        sm_0 = max(0, (mu - x_0) - k)        (downward drift)
        sm_t = max(0, sm_{t-1} + ((mu - x_t) - k))
        alarm_t = sp_t > h OR sm_t > h

    Like the EWMA/Holt recurrences this depends on previous OUTPUTS
    (the max(0, .) clamp kills any prefix-sum rewrite), so it is a
    grouped ``applyInPandas`` pass — one shuffle on the key, O(rows)
    per group — with a recursive-CTE DuckDB twin written in the same
    operation order so the float paths agree bit-for-bit. ``mu`` is
    sum/n (exact for integer inputs). At 100 TB the input is already
    a per-key day-grain rollup (thousands of rows per key), never the
    raw event stream.

    Appends ``mu``, ``sp``, ``sm``, ``alarm``.
    """
    from pyspark.sql import types as T

    key_cols = list(key_cols)
    out_schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("mu", T.DoubleType()),
            T.StructField("sp", T.DoubleType()),
            T.StructField("sm", T.DoubleType()),
            T.StructField("alarm", T.BooleanType()),
        ]
    )

    def walk(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values(ts_col).reset_index(drop=True)
        y = pdf[value_col].to_numpy(dtype=np.float64)
        n = len(y)
        mu = float(y.sum()) / n if n else 0.0
        k = k_frac * mu
        h = h_frac * mu
        sp = np.empty(n)
        sm = np.empty(n)
        prev_p = 0.0
        prev_m = 0.0
        for i in range(n):
            prev_p = prev_p + ((y[i] - mu) - k)
            if prev_p < 0.0:
                prev_p = 0.0
            prev_m = prev_m + ((mu - y[i]) - k)
            if prev_m < 0.0:
                prev_m = 0.0
            sp[i], sm[i] = prev_p, prev_m
        pdf["mu"] = mu
        pdf["sp"] = sp
        pdf["sm"] = sm
        pdf["alarm"] = (sp > h) | (sm > h)
        return pdf

    return df.groupBy(*key_cols).applyInPandas(walk, schema=out_schema)
