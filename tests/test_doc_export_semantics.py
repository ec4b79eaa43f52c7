"""Unit tests for the doc-export edge semantics the golden corpus can't
exercise (the real CSVs are sha-unique and the real parquet has no null
dateprocessed): duplicate-sha last-wins in the enrichment loaders and
the ``str(None)``/``str(NaT)`` null-date representation — both pinned to
the reference exporter's dict-load / unconditional-``str`` behavior
(``website/export_parquet_to_json.py:205-246``).
"""

from __future__ import annotations

import datetime

from pyspark.sql import Row
from pyspark.sql import functions as F

from mcyj_datapipeline_spark.plans.doc_export import build_doc_export


def _docs(spark, dateprocessed_type="string"):
    if dateprocessed_type == "timestamp":
        rows = [
            Row(
                sha256="a" * 64,
                dateprocessed=datetime.datetime(2024, 1, 2, 3, 4, 5),
                text=["p1"],
            ),
            Row(sha256="b" * 64, dateprocessed=None, text=["p2"]),
        ]
        schema = (
            "sha256 string, dateprocessed timestamp, text array<string>"
        )
    else:
        rows = [
            Row(sha256="a" * 64, dateprocessed="2024-01-02", text=["p1"]),
            Row(sha256="b" * 64, dateprocessed=None, text=["p2"]),
        ]
        schema = "sha256 string, dateprocessed string, text array<string>"
    return spark.createDataFrame(rows, schema)


def test_duplicate_sha_in_enrichment_is_last_wins(spark):
    """The exporter loads each CSV into ``dict[sha] = row`` — a repeated
    sha overwrites, so the LAST file row wins and exactly one document
    per sha is exported. A naive left join would fan out to two rows."""
    info = spark.createDataFrame(
        [
            (
                "a" * 64,
                "AG1",
                "First Agency",
                "Title One",
                "2020-01-01",
                "false",
            ),
            (
                "a" * 64,
                "AG2",
                "Second Agency",
                "Title Two",
                "2021-02-02",
                "true",
            ),
        ],
        "sha256 string, agency_id string, agency_name string, "
        "document_title string, date string, is_special_investigation string",
    ).coalesce(1)  # one partition = CSV file order under mono-id
    out = build_doc_export(_docs(spark), document_info=info)
    rows = out.filter(F.col("sha256") == "a" * 64).collect()
    assert len(rows) == 1, "duplicate enrichment sha fanned out the join"
    md = rows[0]["metadata"]
    assert md["agency_id"] == "AG2"
    assert md["agency_name"] == "Second Agency"
    assert md["is_special_investigation"] is True


def test_null_dateprocessed_string_column_serializes_as_None(spark):
    out = {
        r["sha256"]: r["dateprocessed"]
        for r in build_doc_export(_docs(spark, "string")).collect()
    }
    assert out["a" * 64] == "2024-01-02"
    assert out["b" * 64] == "None"


def test_null_dateprocessed_timestamp_column_serializes_as_NaT(spark):
    out = {
        r["sha256"]: r["dateprocessed"]
        for r in build_doc_export(_docs(spark, "timestamp")).collect()
    }
    assert out["a" * 64] == "2024-01-02 03:04:05"
    assert out["b" * 64] == "NaT"


def test_blank_sha_rows_are_dropped_not_joined(spark):
    """Loader skip: a blank/whitespace sha row never attaches
    (``export_parquet_to_json.py:39-41`` pattern in every loader)."""
    info = spark.createDataFrame(
        [
            ("", "AGX", "Blank", "T", "2020-01-01", "false"),
            ("   ", "AGY", "Space", "T", "2020-01-01", "false"),
            ("a" * 64, "AG1", "Real", "T", "2020-01-01", "false"),
        ],
        "sha256 string, agency_id string, agency_name string, "
        "document_title string, date string, is_special_investigation string",
    )
    out = build_doc_export(_docs(spark), document_info=info)
    got = {
        r["sha256"]: r["metadata"] for r in out.collect()
    }
    assert got["a" * 64]["agency_name"] == "Real"
    assert got["b" * 64] is None
