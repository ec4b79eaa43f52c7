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
with time-per-user, so groups stay small and numerous. That is
exactly why these run as ONE ``mapInPandas`` pass over key-partitioned,
key-sorted partitions instead of ``groupBy().applyInPandas`` (r12):
the grouped-map path pays one Arrow batch + one Python call + one
pandas-frame construction PER GROUP, and with tens of thousands of
tiny groups that fixed overhead was 95% of the operator (measured:
ev_throttle_chained 29.5 summed task-seconds at 0.7s CPU — 18s wall
at sf0.1 — for a recurrence whose actual work is a single pass over
200k rows). The partition map runs the same hash exchange the groupBy
did, sorts within partitions by (key, order), and walks each partition
once in numpy with group-boundary resets — per-GROUP state and
semantics unchanged, per-group overhead gone. A single pathological
key with millions of rows pins one task in either form: cap it
upstream (the same valve as the dedup bucket caps) or window the
recurrence by time-slicing with carried state (streaming/stateful.py
runs THIS logic incrementally with timeouts; these batch forms are its
replay/backfill twins).
"""

from __future__ import annotations

from typing import Callable, Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _group_starts(pdf: pd.DataFrame, key_cols: list[str]):
    """Boolean ndarray: True where a new key group begins (frame sorted
    by ``key_cols``, so groups are contiguous). Null-safe: NaN == NaN
    for this purpose, matching groupBy's null-is-a-group semantics."""
    import numpy as np

    n = len(pdf)
    starts = np.zeros(n, dtype=bool)
    if n:
        starts[0] = True
        for c in key_cols:
            s = pdf[c]
            same = (s == s.shift()) | (s.isna() & s.shift().isna())
            starts |= ~same.to_numpy(dtype=bool)
    return starts


def _ordered_partition_map(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    out_schema,
) -> DataFrame:
    """Run ``fn`` over pandas frames of COMPLETE, (key, order)-sorted
    groups — the grouped-recurrence execution shape that amortizes the
    per-group Python overhead of applyInPandas across a whole
    partition.

    Same exchange the groupBy would do (hash on ``key_cols``), plus a
    partition-local sort; ``mapInPandas`` then streams Arrow batches in
    partition order. A group can span batches, so rows of each batch's
    LAST key are buffered and prepended to the next batch — ``fn``
    always sees every row of a group together, exactly like the grouped
    map, with per-group state reset at the boundaries ``_group_starts``
    reports. The buffer is a LIST of frames concatenated once at the
    group boundary (ADVICE r12: re-concatenating a growing buffer into
    every batch made one key spanning many batches cost quadratic
    copying on top of pinning one task)."""
    sorted_df = df.repartition(*key_cols).sortWithinPartitions(
        *key_cols, *order_cols
    )

    def run(batches):
        # frames of ONE key's batch-spanning tail run; concat deferred
        # to the group boundary so a key spanning k batches copies its
        # rows O(1) times, not O(k) (quadratic overall)
        buf: list[pd.DataFrame] = []

        def _tail_run(pdf: pd.DataFrame) -> int:
            """Length of the contiguous tail run sharing the last
            row's key (null-safe equality, same as _group_starts)."""
            tail = pd.Series(True, index=pdf.index)
            for c in key_cols:
                v = pdf[c].iloc[-1]
                col = pdf[c]
                tail &= (col == v) | (col.isna() & pd.isna(v))
            t = tail.to_numpy(dtype=bool)
            n_tail = 0
            i = len(pdf) - 1
            while i >= 0 and t[i]:
                n_tail += 1
                i -= 1
            return n_tail

        def _continues_buffer(pdf: pd.DataFrame) -> bool:
            """True if pdf's FIRST row shares the buffered key."""
            last = buf[-1]
            for c in key_cols:
                a = pdf[c].iloc[0]
                b = last[c].iloc[-1]
                if not ((a == b) or (pd.isna(a) and pd.isna(b))):
                    return False
            return True

        for pdf in batches:
            n = len(pdf)
            if not n:
                continue
            n_tail = _tail_run(pdf)
            if buf and n_tail == n and _continues_buffer(pdf):
                buf.append(pdf)  # whole batch extends the spanning key
                continue
            if buf:
                pdf = pd.concat(buf + [pdf], ignore_index=True)
                buf = []
                n = len(pdf)
                n_tail = _tail_run(pdf)
            if n_tail == n:
                buf = [pdf]
                continue
            head = pdf.iloc[: n - n_tail].reset_index(drop=True)
            buf = [pdf.iloc[n - n_tail :].reset_index(drop=True)]
            out = fn(head)
            if len(out):
                yield out
        if buf:
            last_pdf = (
                pd.concat(buf, ignore_index=True) if len(buf) > 1 else buf[0]
            )
            out = fn(last_pdf)
            if len(out):
                yield out

    return sorted_df.mapInPandas(run, schema=out_schema)


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
    import numpy as np

    key_cols = list(key_cols)
    schema = df.schema
    cols = [f.name for f in schema.fields]

    def keep(pdf: pd.DataFrame) -> pd.DataFrame:
        ts = pd.to_datetime(pdf[ts_col]).astype("datetime64[ns]")
        if ts.isna().any():
            # explicit, overflow-free behavior for null timestamps
            # (ADVICE r12): NaT.astype(int64) yields INT64_MIN, so the
            # cooldown subtraction would wrap — and a null has no
            # defined position in a keep chain ordered by time. Fail
            # fast instead of silently keeping/dropping garbage; mask
            # or impute upstream if nulls are expected.
            raise ValueError(
                f"throttle_keep_chain: null {ts_col!r} in group input — "
                "null timestamps have no position in the keep chain; "
                "filter or impute them upstream"
            )
        ts_ns = ts.astype("int64").to_numpy()
        starts = _group_starts(pdf, key_cols)
        kept = np.zeros(len(pdf), dtype=bool)
        last_ns = 0
        for i in range(len(pdf)):
            # same arithmetic as Timedelta.total_seconds(): ns / 1e9
            if starts[i] or (ts_ns[i] - last_ns) / 1e9 > cooldown_seconds:
                kept[i] = True
                last_ns = ts_ns[i]
        return pdf.loc[kept, cols]

    return _ordered_partition_map(
        df, key_cols, [ts_col, tiebreak_col], keep, schema
    )


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

    import numpy as np

    def smooth(pdf: pd.DataFrame) -> pd.DataFrame:
        # per-group Cython ewm in ONE call: groups are contiguous and
        # in order, so the concatenated groupby result aligns with the
        # frame rows positionally
        gid = np.cumsum(_group_starts(pdf, key_cols))
        pdf = pdf.copy()
        pdf[out_col] = (
            pdf.groupby(gid, sort=False)[value_col]
            .ewm(alpha=alpha, adjust=False, ignore_na=True)
            .mean()
            .to_numpy()
        )
        return pdf

    return _ordered_partition_map(
        df, key_cols, [ts_col, tiebreak_col], smooth, out_schema
    )


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
    depends on previous OUTPUTS, so it is a sequential recurrence (one
    shuffle on the key, one ordered partition-map pass) with a
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
        y = pdf[value_col].to_numpy(dtype=np.float64)
        n = len(y)
        starts = _group_starts(pdf, key_cols)
        level = np.empty(n)
        trend = np.empty(n)
        fitted = np.full(n, np.nan)
        for i in range(n):
            if starts[i]:
                level[i], trend[i] = y[i], 0.0
            else:
                f = level[i - 1] + trend[i - 1]
                fitted[i] = f
                level[i] = alpha * y[i] + (1.0 - alpha) * f
                trend[i] = (
                    beta * (level[i] - level[i - 1])
                    + (1.0 - beta) * trend[i - 1]
                )
        pdf = pdf.copy()
        pdf["level"], pdf["trend"], pdf["fitted"] = level, trend, fitted
        return pdf

    return _ordered_partition_map(
        df, key_cols, [ts_col, tiebreak_col], smooth, out_schema
    )


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
    key-partitioned ordered recurrence — one shuffle on the key, one
    partition-map pass — with a recursive-CTE DuckDB twin written in the same
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

        y = pdf[value_col].to_numpy(dtype=np.float64)
        n = len(y)
        starts = _group_starts(pdf, key_cols)
        bounds = np.flatnonzero(starts).tolist() + [n]
        mu_arr = np.empty(n)
        # per-group mu via the slice's own np.sum — the identical
        # pairwise summation the grouped form used, so the float path
        # (and the bit-for-bit oracle note above) is unchanged
        for s, e in zip(bounds[:-1], bounds[1:]):
            seg = y[s:e]
            mu_arr[s:e] = float(seg.sum()) / len(seg)
        sp = np.empty(n)
        sm = np.empty(n)
        prev_p = 0.0
        prev_m = 0.0
        for i in range(n):
            if starts[i]:
                prev_p = 0.0
                prev_m = 0.0
            mu = mu_arr[i]
            k = k_frac * mu
            prev_p = prev_p + ((y[i] - mu) - k)
            if prev_p < 0.0:
                prev_p = 0.0
            prev_m = prev_m + ((mu - y[i]) - k)
            if prev_m < 0.0:
                prev_m = 0.0
            sp[i], sm[i] = prev_p, prev_m
        pdf = pdf.copy()
        pdf["mu"] = mu_arr
        pdf["sp"] = sp
        pdf["sm"] = sm
        pdf["alarm"] = (sp > h_frac * mu_arr) | (sm > h_frac * mu_arr)
        return pdf

    return _ordered_partition_map(df, key_cols, [ts_col], walk, out_schema)
