"""E2 — parse/derive pipeline (reference
``pdf_parsing/extract_document_info.py:235-314``).

The reference loops ``iterrows`` over every parquet batch file and
re-parses with Python regex per row. Here the whole pipeline is ONE
narrow Spark stage: parquet scan → ``array_join`` → regex column
expressions → select. No shuffle, full WholeStageCodegen, and Catalyst
prunes the scan to (sha256, text, dateprocessed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mcyj_datapipeline_spark.functions.extractors import parse_document

DOCUMENT_INFO_COLUMNS = [
    "agency_id",
    "date",
    "agency_name",
    "document_title",
    "is_special_investigation",
    "sha256",
    "date_processed",
]


def normalize_text_column(df: DataFrame, text_col: str = "text") -> DataFrame:
    """§1.3 ingestion-boundary normalization: ``text`` may be a real
    array<string> or a stringified Python list (legacy rows,
    reference extract_document_info.py:268 ``ast.literal_eval``).
    Normalize ONCE here; everything downstream sees array<string>."""
    field = dict(zip(df.schema.names, df.schema.fields))[text_col]
    if field.dataType.simpleString().startswith("array"):
        return df
    c = F.col(text_col)
    # "['a', 'b']" → '["a", "b"]': each delimiter needs its own JSON
    # replacement (a single alternation collapsing all three to one
    # quote emitted '"a"b"' — invalid JSON, so every legacy row silently
    # took the wrap-as-one-page fallback)
    s = F.regexp_replace(c, r"^\[\s*'", '["')
    s = F.regexp_replace(s, r"'\s*\]$", '"]')
    s = F.regexp_replace(s, r"'\s*,\s*'", '", "')
    parsed = F.from_json(s, "array<string>")
    return df.withColumn(
        text_col,
        F.when(c.startswith("["), F.coalesce(parsed, F.array(c))).otherwise(
            F.array(c)
        ),
    )


def document_info(docs_raw: DataFrame) -> DataFrame:
    """parquet batches (sha256, text: array<string>, dateprocessed) →
    document_info table (the reference's 7-column CSV,
    extract_document_info.py:294-297)."""
    parsed = parse_document(F.col("text"))
    return normalize_text_column(docs_raw).select(
        parsed["agency_id"].alias("agency_id"),
        parsed["date"].alias("date"),
        parsed["agency_name"].alias("agency_name"),
        parsed["document_title"].alias("document_title"),
        parsed["is_special_investigation"].alias("is_special_investigation"),
        F.col("sha256"),
        F.col("dateprocessed").alias("date_processed"),
    )
