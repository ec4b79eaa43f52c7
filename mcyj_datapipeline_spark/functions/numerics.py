"""Shared numeric helpers for cross-engine value parity."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def stable6(c: Column) -> Column:
    """Cross-engine-stable 6dp rounding: ``floor(x*1e6 + 0.5) / 1e6``.

    ``round()`` half-even vs half-up conventions differ between
    engines on exact .5 boundaries; this floor form is the single
    rounding contract every oracle pair uses (DuckDB twin:
    ``floor(x * 1000000.0 + 0.5) / 1000000.0``). Keep the two sides
    textually in sync — the 4dp cosine flake fix showed what hunting
    divergent copies costs.
    """
    return F.floor(c * F.lit(1000000.0) + F.lit(0.5)) / F.lit(1000000.0)
