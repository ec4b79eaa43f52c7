"""Zero-extra-scan pipeline observability: named metric observations
riding on an action (Spark's ``Observation`` / ``df.observe``), and a
tiny helper for asserting them.

The DQ-expectations operators compute their checks as separate
aggregates — an extra scan per audit. ``observe`` attaches metric
expressions to an EXISTING action's plan (AggregatingAccumulator
under the hood), so a production write can report row counts, null
counts, and range violations for free: at 100 TB the difference is
one full pass of the corpus per audit. The trade: observe metrics
are accumulator-style (computed once per action, on the rows that
action actually processed) and must be aggregate expressions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation


def observed(
    df: DataFrame, name: str, *metrics: Column
) -> tuple[DataFrame, Observation]:
    """Attach named aggregate ``metrics`` to ``df``'s next action.
    Returns ``(df_with_observation, observation)`` — read
    ``observation.get`` AFTER an action has materialized the frame.
    """
    obs = Observation(name)
    return df.observe(obs, *metrics), obs
