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
