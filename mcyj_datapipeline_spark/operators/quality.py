"""Data-quality expectation checks — the constraint audit a pipeline
runs before promoting a batch (null/range/set membership per row,
referential integrity across tables), as DataFrame plans.

Row-level rules for one table collapse into ONE aggregate pass
(conditional counts — no per-rule scans); referential rules are
anti-join counts. Everything returns the same (rule, n_violations,
n_rows) shape so reports union cleanly. At 100 TB: one scan per table
regardless of rule count, and the anti-join shuffles keys only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def expectations_report(
    df: DataFrame, rules: list[tuple[str, Column]]
) -> DataFrame:
    """One-pass row-level DQ report. ``rules`` are (name, VIOLATION
    condition) pairs — the condition marks bad rows. Output: one row per
    rule with (rule, n_violations, n_rows)."""
    if not rules:
        raise ValueError("expectations_report needs at least one rule")
    aggs = [
        F.count(F.when(cond, 1)).alias(f"_r{i}")
        for i, (_name, cond) in enumerate(rules)
    ]
    wide = df.agg(F.count(F.lit(1)).alias("_n"), *aggs)
    # rule names are user strings — escape quotes rather than letting a
    # name like "date isn't null" break the stack() SQL parse
    stack_args = ", ".join(
        "'{}', _r{}".format(name.replace("'", "\\'"), i)
        for i, (name, _cond) in enumerate(rules)
    )
    return wide.select(
        F.expr(f"stack({len(rules)}, {stack_args}) AS (rule, n_violations)"),
        F.col("_n").alias("n_rows"),
    )


def referential_violations(
    child: DataFrame,
    parent: DataFrame,
    child_key: str,
    parent_key: str,
    rule: str,
) -> DataFrame:
    """Referential-integrity rule: child rows whose key has no parent.
    Anti-join (keys only cross the wire) + scalar counts, emitted in the
    same (rule, n_violations, n_rows) shape as row-level rules."""
    orphans = child.join(
        parent.select(F.col(parent_key).alias(child_key)).distinct(),
        child_key,
        "left_anti",
    ).agg(F.count(F.lit(1)).alias("n_violations"))
    total = child.agg(F.count(F.lit(1)).alias("n_rows"))
    return orphans.crossJoin(total).select(
        F.lit(rule).alias("rule"), "n_violations", "n_rows"
    )


def column_profile(
    df: DataFrame,
    columns: list[str],
    numeric_cols: list[str] | None = None,
) -> DataFrame:
    """Deequ-style per-column profile in ONE aggregation pass: for every
    column, ``completeness`` (non-null fraction) and ``distinct_count``;
    for numeric columns additionally ``min`` / ``max`` / ``mean``.
    Output: (column, metric, value DOUBLE) — the long shape profile
    stores union over and diff across batches.

    Scale shape: a single ``agg`` over one scan. The exact
    count-distincts ride the same pass via Catalyst's Expand (one scan,
    one k-way replicated shuffle of the profiled columns only); at
    100 TB swap them for ``approx_count_distinct`` (the a04 epsilon
    pattern) and the Expand disappears — completeness/min/max/mean are
    plain partial aggregates either way. The wide->long pivot is a
    ``stack`` over ONE aggregated row, driver-side cost zero.
    """
    numeric = list(numeric_cols or [])

    def _qcol(name: str) -> Column:
        # F.col() PARSES its argument (dots, backticks) — a name with
        # an unpaired backtick or embedded quote raises or resolves to
        # the wrong attribute. Standard identifier quoting: double any
        # backticks, wrap the whole name, so arbitrary user column
        # names profile verbatim.
        return F.col("`" + name.replace("`", "``") + "`")

    aggs: list[Column] = [F.count(F.lit(1)).alias("_n")]
    # (column name, metric name, value Column over the agg aliases) —
    # typed Columns end to end; nothing user-supplied is ever spliced
    # into a SQL string (the former f-string stack() broke — or worse,
    # silently re-targeted — on column names containing quotes, commas
    # or backtick-needing characters; ADVICE r6).
    metrics: list[tuple[str, str, Column]] = []
    for i, c in enumerate(columns):
        aggs.append(F.count(_qcol(c)).alias(f"_c{i}"))
        aggs.append(F.countDistinct(_qcol(c)).alias(f"_d{i}"))
        metrics.append(
            (c, "completeness", F.col(f"_c{i}") / F.col("_n"))
        )
        metrics.append((c, "distinct_count", F.col(f"_d{i}")))
    for i, c in enumerate(numeric):
        aggs.append(F.min(_qcol(c)).cast("double").alias(f"_mn{i}"))
        aggs.append(F.max(_qcol(c)).cast("double").alias(f"_mx{i}"))
        aggs.append(F.avg(_qcol(c)).alias(f"_av{i}"))
        metrics.append((c, "min", F.col(f"_mn{i}")))
        metrics.append((c, "max", F.col(f"_mx{i}")))
        metrics.append((c, "mean", F.col(f"_av{i}")))
    wide = df.agg(*aggs)
    # wide-to-long over the ONE aggregated row: inline(array(struct...))
    # is stack() with typed literals — same physical shape (a generator
    # over a 1-row frame), zero string SQL.
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.lit(m).alias("metric"),
                F.round(v.cast("double"), 6).alias("value"),
            )
            for c, m, v in metrics
        ]
    )
    return wide.select(F.inline(rows))


def token_budget_select(
    scored: DataFrame,
    budget: Column,
    id_col: str = "doc_id",
    quality_col: str = "quality",
    tokens_col: str = "tokens",
    bin_dp: int = 3,
) -> DataFrame:
    """Greedy quality-first prefix under a token budget WITHOUT a
    global sort: keep documents in (quality DESC, id) order while the
    running token total fits ``budget`` (a one-row-DataFrame column —
    pass e.g. ``F.lit(...)`` via a broadcast agg).

    Plan: quality rounds to ``bin_dp`` decimals (monotone, so bin
    order equals quality order across bins), a bin-grain rollup plus
    a triangular self-join yields each bin's tokens-above, and the
    only per-row window is PARTITIONED by bin. Provably identical to
    the global running-sum prefix; at 100 TB the bin relation is KBs
    and nothing single-reducer touches the data.

    ``budget`` must be a DataFrame with exactly one row and one column
    named ``budget``. Returns (id, quality, tokens, cum_tokens)."""
    from pyspark.sql import Window

    scored = scored.localCheckpoint(eager=False)
    binned = scored.withColumn("_bin", F.round(F.col(quality_col), bin_dp))
    bin_tokens = binned.groupBy("_bin").agg(
        F.sum(tokens_col).alias("_bt")
    ).localCheckpoint(eager=False)
    hi = bin_tokens.select(
        F.col("_bin").alias("_hb"), F.col("_bt").alias("_ht")
    )
    above = (
        bin_tokens.join(F.broadcast(hi), F.col("_hb") > F.col("_bin"), "left")
        .groupBy("_bin")
        .agg(F.coalesce(F.sum("_ht"), F.lit(0)).alias("_above"))
    )
    w = (
        Window.partitionBy("_bin")
        .orderBy(F.desc(quality_col), id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        binned.join(F.broadcast(above), "_bin")
        .withColumn(
            "cum_tokens", F.col("_above") + F.sum(tokens_col).over(w)
        )
        .crossJoin(F.broadcast(budget))
        .filter(F.col("cum_tokens") <= F.col("budget"))
        .drop("_bin", "_above", "budget")
    )
