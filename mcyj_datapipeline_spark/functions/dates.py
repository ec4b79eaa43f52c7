"""Multi-format date parsing (SURVEY §2.8 F8, F24).

The reference parses dates with try-format cascades in four places
(``website/generate_website_data.py:23-62``, ``run_full_pipeline.py:118-127``,
``get_download_list.py:45``, ``mcyj_download.py:66-71``). Here it is one
``coalesce(try_to_date...)`` chain — JVM-side, codegen'd, null on failure
exactly like the reference's ``except ValueError: continue``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Formats accepted by the website date normalizer
# (generate_website_data.py:23-62), in the reference's priority order.
WEBSITE_DATE_FORMATS = [
    "M/d/yyyy",
    "MMMM d, yyyy",
    "MMM d, yyyy",
    "yyyy-MM-dd",
]

# API timestamp formats (run_full_pipeline.py:118-127), widened to the
# shapes the engine itself emits: optional fractional seconds and Z /
# +00 / +00:00 offsets ('X' alone does NOT match a colon offset — the
# original two-format list returned null for the engine's own
# '1970-01-01T00:00:00+00:00' dateprocessed stamps), plus bare date.
API_TS_FORMATS = [
    "yyyy-MM-dd'T'HH:mm:ss.SSSXXX",
    "yyyy-MM-dd'T'HH:mm:ss.SSSX",
    "yyyy-MM-dd'T'HH:mm:ssXXX",
    "yyyy-MM-dd'T'HH:mm:ssX",
    "yyyy-MM-dd",
]


def parse_date_multi(col: Column, formats: list[str] | None = None) -> Column:
    """F8: first format that parses wins; null if none do. The reference
    additionally validity-checks (rejects month>12 etc.) — ``try_to_date``
    does the same under the CORRECTED parser policy."""
    fmts = formats or WEBSITE_DATE_FORMATS
    return F.coalesce(*[F.try_to_date(col, f) for f in fmts])


def parse_iso_timestamp(col: Column) -> Column:
    """F8 API variant: ISO timestamp (fraction and offset optional)
    else bare date → timestamp; null if nothing parses."""
    return F.coalesce(
        *[F.try_to_timestamp(col, F.lit(fmt)) for fmt in API_TS_FORMATS]
    )


def epoch_us(col: Column | str) -> Column:
    """Microseconds since epoch, tolerant of TIMESTAMP vs TIMESTAMP_NTZ.

    Parquet written by pandas/pyarrow without an explicit UTC flag reads
    as TIMESTAMP_NTZ under Spark 4's ``inferTimestampNTZ``, and
    ``unix_micros`` rejects NTZ input. The cast interprets NTZ values in
    the session timezone (pinned to UTC by ``session.get_spark``), so it
    is value-preserving there; callers that only difference two
    ``epoch_us`` values are additionally immune to any fixed offset.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))
