"""F1–F7 regex extractors vs the reference's Python-re semantics,
verified against an independent Python reimplementation of the
documented behavior (SURVEY §2.8) on reference-shaped fixtures."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mcyj_datapipeline_spark.plans.document_info import document_info
from tests.fixtures import make_documents_raw

DOC_SCHEMA = T.StructType(
    [
        T.StructField("sha256", T.StringType()),
        T.StructField("text", T.ArrayType(T.StringType())),
        T.StructField("dateprocessed", T.StringType()),
    ]
)


@pytest.fixture(scope="module")
def docs_df(spark):
    rows = make_documents_raw()
    df = spark.createDataFrame(
        [(r["sha256"], r["text"], r["dateprocessed"]) for r in rows], DOC_SCHEMA
    )
    return rows, df


def test_license_extraction(docs_df, spark):
    rows, df = docs_df
    out = {r["sha256"]: r["agency_id"] for r in document_info(df).collect()}
    for r in rows:
        assert out[r["sha256"]] == r["_license"], r["sha256"]


def test_is_sir_flag(docs_df):
    rows, df = docs_df
    out = {
        r["sha256"]: r["is_special_investigation"]
        for r in document_info(df).collect()
    }
    for r in rows:
        assert out[r["sha256"]] == r["_is_sir"]


def test_title_and_casing(docs_df):
    rows, df = docs_df
    out = {r["sha256"]: r["document_title"] for r in document_info(df).collect()}
    for r in rows:
        title = out[r["sha256"]]
        assert title is not None
        # Smart title-casing: all-caps titles come back title-cased.
        assert not title.isupper() or "#" in title
        full = "\n".join(r["text"])[:3000]
        if re.search(r"Attached is the Special Investigation Report", full, re.I):
            assert title.startswith("Special Investigation Report")
        if r["_is_sir"] and "Special Investigation" in title:
            assert re.search(r"#2024C\d+$", title)


def test_date_extracted_nonnull(docs_df):
    rows, df = docs_df
    out = {r["sha256"]: r["date"] for r in document_info(df).collect()}
    for r in rows:
        assert out[r["sha256"]], "every fixture embeds a date pattern"


def test_decoy_beyond_header_ignored(spark):
    """Title/SIR detection must only see the first 3000 chars."""
    filler = "x" * 3200
    df = spark.createDataFrame(
        [("s1", [filler + "\nSPECIAL INVESTIGATION REPORT"], "d")], DOC_SCHEMA
    )
    row = document_info(df).collect()[0]
    assert row["is_special_investigation"] is False
    assert row["document_title"] is None


def test_plan_is_single_stage_no_shuffle(docs_df):
    """E2 must stay a narrow scan→project plan (no exchange)."""
    _, df = docs_df
    plan = document_info(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
