"""Batch 46 registry entries (round 7): inventory close-out — named,
driver-visible oracle rows for the three SURVEY §2 lines that had been
carried as "covered elsewhere / out of scope" for six rounds
(VERDICT r6 "next round" #4):

- ``f26_format_duration``: the reference's ``format_time`` helper
  (``pdf_parsing/extract_pdf_text.py:108-117``) — seconds → "12.3s" /
  "4.5m" / "1.6h" human strings. Engine-expressible after all: the
  branch cutoffs and the 1-decimal rounding run entirely in integer
  cent/tenth arithmetic (half-up via ``(n + half) div unit``), so both
  engines agree bit-for-bit with no float-formatting ties. Dialect
  note: Python's f"{x:.1f}" rounds half-EVEN; this implements half-UP
  in exact integers — the two differ only on exact .x5 ties, which the
  cent-grain fixture cannot produce from real event values.
- ``o2_sort_by_name``: the agency-summary sort
  (``website/generate_website_data.py:326,334-346``) as a named query —
  per-agency report counts ordered by AgencyName. Subsumed by
  e3_website_pipeline since round 1, but the checklist line deserves
  its own driver row.
- ``f24_run_timestamp``: run-metadata stamping
  (``run_full_pipeline.py:144``, ``backfill_download_metadata.py:179``)
  with the INJECTED deterministic clock the engine uses everywhere
  (operators/procedural.py — ``datetime.now`` would make every re-run
  hash-differ); the stamp is derived through real timestamp functions
  (to_timestamp → date_format ISO-8601), not just a pass-through
  literal, so the driver row checks the timestamp formatting path.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mcyj_datapipeline_spark.io import read_table
from mcyj_datapipeline_spark.registry import register

__all__ = ["f26_format_duration", "o2_sort_by_name", "f24_run_timestamp"]


def _t(spark, sf_dir, name):
    return read_table(spark, sf_dir, name)


# ===========================================================================
# F26 — format_time (reference extract_pdf_text.py:108-117)
# ===========================================================================

# Exact integer formatting: value (dollars.cents) → cents bigint →
# tenths of the branch unit with half-up integer rounding → "W.Fs".
# No engine round(): Spark's round() is HALF_UP on BigDecimal while
# DuckDB's double round differs on representable ties (e.g. 1.25), and
# printf/format_string disagree engine-to-engine on such ties too. The
# integer form has no ties and no doubles at all.
_F26_ORACLE = """
    WITH ev AS (
      SELECT event_id, user_id,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      FROM events
    ),
    spans AS (
      SELECT 'event' AS grain, event_id::VARCHAR AS key, cents
      FROM ev WHERE event_id % 7 = 0
      UNION ALL
      SELECT 'user_total' AS grain, user_id::VARCHAR AS key,
             sum(cents) AS cents
      FROM ev GROUP BY user_id
    )
    SELECT grain, key,
           CASE
             WHEN cents < 6000 THEN
               ((cents + 5) // 10 // 10)::VARCHAR || '.' ||
               ((cents + 5) // 10 % 10)::VARCHAR || 's'
             WHEN cents < 360000 THEN
               ((cents + 300) // 600 // 10)::VARCHAR || '.' ||
               ((cents + 300) // 600 % 10)::VARCHAR || 'm'
             ELSE
               ((cents + 18000) // 36000 // 10)::VARCHAR || '.' ||
               ((cents + 18000) // 36000 % 10)::VARCHAR || 'h'
           END AS human
    FROM spans
"""


@register(
    "f26_format_duration",
    _F26_ORACLE,
    "F26 format_time parity (reference extract_pdf_text.py:108-117): "
    "seconds -> '12.3s'/'4.5m'/'1.6h' across all three branches (event "
    "grain hits s/m, per-user totals hit m/h). All arithmetic is exact "
    "integer cents/tenths with half-up div — no doubles, no formatter "
    "tie divergence between engines. Scale: stateless row-local "
    "expressions + one map-side-combined groupBy; codegen end to end.",
)
def f26_format_duration(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
    )
    spans = (
        ev.filter(F.col("event_id") % 7 == 0)
        .select(
            F.lit("event").alias("grain"),
            F.col("event_id").cast("string").alias("key"),
            "cents",
        )
        .unionByName(
            ev.groupBy("user_id").agg(F.sum("cents").alias("cents")).select(
                F.lit("user_total").alias("grain"),
                F.col("user_id").cast("string").alias("key"),
                "cents",
            )
        )
    )

    def tenths_fmt(tenths, suffix):
        return F.concat(
            F.expr(f"({tenths}) div 10").cast("string"),
            F.lit("."),
            F.expr(f"({tenths}) % 10").cast("string"),
            F.lit(suffix),
        )

    human = (
        F.when(F.col("cents") < 6000, tenths_fmt("(cents + 5) div 10", "s"))
        .when(
            F.col("cents") < 360000,
            tenths_fmt("(cents + 300) div 600", "m"),
        )
        .otherwise(tenths_fmt("(cents + 18000) div 36000", "h"))
    )
    return spans.select("grain", "key", human.alias("human"))


# ===========================================================================
# O2 — sort agency summaries by name (generate_website_data.py:326)
# ===========================================================================

_O2_ORACLE = """
    SELECT 'AG' || (doc_id % 50)::VARCHAR AS agencyId,
           'Agency ' || (doc_id % 50)::VARCHAR AS AgencyName,
           count(*) AS total_reports
    FROM documents
    GROUP BY 1, 2
    ORDER BY AgencyName, agencyId
"""


@register(
    "o2_sort_by_name",
    _O2_ORACLE,
    "O2 named form (reference generate_website_data.py:326,334-346): "
    "the agencies_summary.json rows — per-agency report counts sorted "
    "by AgencyName (unique names; id tiebreak documents determinism). "
    "Same agency synthesis as e3_website_pipeline. Scale: one "
    "map-side-combined groupBy on a ~constant-cardinality dim; the "
    "sort is over agency-count rows, never document-grain.",
)
def o2_sort_by_name(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.groupBy(
            F.concat(
                F.lit("AG"), (F.col("doc_id") % 50).cast("string")
            ).alias("agencyId"),
            F.concat(
                F.lit("Agency "), (F.col("doc_id") % 50).cast("string")
            ).alias("AgencyName"),
        )
        .agg(F.count(F.lit(1)).alias("total_reports"))
        .orderBy("AgencyName", "agencyId")
    )


# ===========================================================================
# F24 — run-timestamp stamping with the injected deterministic clock
# ===========================================================================

# The engine-wide injected clock (see operators/procedural.py): a fixed
# ISO instant, NOT datetime.now(), so every oracle/bench re-run hashes
# identically. The reference stamps datetime.now(timezone.utc)
# .isoformat() per downloaded row (run_full_pipeline.py:144).
_F24_CLOCK = "2024-06-01 12:00:00"

_F24_ORACLE = f"""
    SELECT doc_id::VARCHAR AS ContentDocumentId,
           strftime(TIMESTAMP '{_F24_CLOCK}',
                    '%Y-%m-%dT%H:%M:%S+00:00') AS downloaded_at_utc,
           CAST(TIMESTAMP '{_F24_CLOCK}' AS DATE) AS run_date,
           'downloaded' AS download_status
    FROM documents WHERE doc_id % 3 = 0
"""


@register(
    "f24_run_timestamp",
    _F24_ORACLE,
    "F24 driver-visible form (reference run_full_pipeline.py:144, "
    "backfill_download_metadata.py:179): stamp the rows selected for "
    "download with run metadata from the INJECTED deterministic clock, "
    "derived through to_timestamp -> date_format(ISO-8601) so the "
    "timestamp-formatting path (not a pass-through literal) is what "
    "the oracle checks. Scale: stateless literals + row-local filter.",
)
def f24_run_timestamp(spark, sf_dir):
    run_ts = F.to_timestamp(F.lit(_F24_CLOCK))
    return (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 3 == 0)
        .select(
            F.col("doc_id").cast("string").alias("ContentDocumentId"),
            F.date_format(run_ts, "yyyy-MM-dd'T'HH:mm:ss+00:00").alias(
                "downloaded_at_utc"
            ),
            run_ts.cast("date").alias("run_date"),
            F.lit("downloaded").alias("download_status"),
        )
    )
