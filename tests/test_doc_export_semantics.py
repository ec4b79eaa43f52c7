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


def test_malformed_keyword_cell_collapses_to_empty_array(spark):
    """DOCUMENTED DEVIATION (plans/doc_export.py module docstring;
    ADVICE r6 follow-up): the reference ``json.loads`` would store any
    valid-JSON cell verbatim — a bare string, an object, a number —
    leaking arbitrary shapes into the export. Here keywords parse via
    ``from_json(..., 'array<string>')`` with NULL → [], so every
    non-string-array cell degrades to the EMPTY case. This test pins
    the deviation's exact contract so it cannot silently widen."""
    lv = spark.createDataFrame(
        [
            ("a" * 64, "high", "j", '["kw1", "kw2"]'),   # well-formed
            ("b" * 64, "low", "j", '"bare string"'),      # JSON, not array
            ("c" * 64, "low", "j", '{"k": 1}'),           # JSON object
            ("d" * 64, "low", "j", "not json at all"),    # unparseable
            ("e" * 64, "low", "j", None),                  # NULL cell
        ],
        "sha256 string, level string, justification string, "
        "keywords string",
    )
    docs = spark.createDataFrame(
        [(c * 64, "2024-01-02", ["p"]) for c in "abcde"],
        "sha256 string, dateprocessed string, text array<string>",
    )
    got = {
        r["sha256"][0]: r["sir_violation_level"]["keywords"]
        for r in build_doc_export(docs, violation_levels=lv).collect()
    }
    assert got["a"] == ["kw1", "kw2"]
    # every malformed/non-array shape collapses to [] — never a leaked
    # scalar, object, or NULL
    assert got["b"] == [] and got["c"] == [] and got["d"] == []
    assert got["e"] == []


def test_nonstring_page_literal_elements_coerce_to_str(spark):
    """DOCUMENTED DEVIATION (``_literal_eval_pages`` docstring): the
    reference keeps ``ast.literal_eval`` elements verbatim, so a
    repr'd list holding a number or None would serialize as a JSON
    number/null there; this engine's pages column is typed
    array<string>, so those elements coerce to their str() form. Pin
    the exact coercion (str(3) -> '3', str(None) -> 'None') and the
    non-list salvage cases."""
    docs = spark.createDataFrame(
        [
            ("a" * 64, "d", "['p1', 'p2']"),       # clean repr list
            ("b" * 64, "d", "['p1', 3, None]"),    # mixed element types
            ("c" * 64, "d", "{'not': 'a list'}"),  # literal but not a list
            ("d" * 64, "d", "plain text"),          # not a literal at all
            ("e" * 64, "d", None),                   # NULL text
        ],
        "sha256 string, dateprocessed string, text string",
    )
    got = {
        r["sha256"][0]: r["pages"]
        for r in build_doc_export(docs).collect()
    }
    assert got["a"] == ["p1", "p2"]
    assert got["b"] == ["p1", "3", "None"]
    assert got["c"] == [] and got["d"] == [] and got["e"] == []
