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


def test_chunk_documents_windows_and_final_partial(spark):
    from mcyj_datapipeline_spark.operators.text_analysis import chunk_documents

    doc = " ".join(f"t{i}" for i in range(20))  # 20 tokens
    df = spark.createDataFrame([(1, doc), (2, "a b")], ["doc_id", "text"])
    rows = chunk_documents(df, chunk_size=8, stride=4).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    d1 = sorted(by_doc[1], key=lambda r: r["chunk_idx"])
    # ceil((20-8)/4)=3 strides -> chunk_idx 0..3
    assert [r["chunk_idx"] for r in d1] == [0, 1, 2, 3]
    assert d1[0]["chunk"].split() == [f"t{i}" for i in range(8)]
    assert d1[1]["chunk"].split() == [f"t{i}" for i in range(4, 12)]
    assert d1[3]["chunk"].split() == [f"t{i}" for i in range(12, 20)]
    assert all(r["n_tokens"] == 8 for r in d1)
    # Short doc: single truncated window.
    d2 = by_doc[2]
    assert len(d2) == 1 and d2[0]["chunk"] == "a b" and d2[0]["n_tokens"] == 2


def test_char_entropy_known_values(spark):
    import math

    from mcyj_datapipeline_spark.operators.text_analysis import char_entropy

    df = spark.createDataFrame(
        [(1, "aaaa"), (2, "abab"), (3, "abcd")], ["i", "t"]
    )
    got = {r["i"]: r["h"] for r in df.select(
        "i", char_entropy(F.col("t")).alias("h")).collect()}
    assert got[1] == 0.0          # single symbol: zero entropy
    assert abs(got[2] - 1.0) < 1e-12   # two symbols 50/50: 1 bit
    assert abs(got[3] - 2.0) < 1e-12   # four equiprobable: 2 bits
    assert math.isfinite(got[1])


def test_llm_json_extract_key_order_agnostic(spark):
    """Regression: a valid flat object with violation BEFORE summary
    must still parse (LLMs emit fields in any order)."""
    from mcyj_datapipeline_spark.functions.textfn import extract_llm_json

    df = spark.createDataFrame(
        [
            ('ok {"summary": "s1", "violation": "y"} end',),
            ('ok {"violation": "n", "summary": "s2"} end',),
        ],
        "txt string",
    )
    rows = df.select(extract_llm_json(F.col("txt")).alias("j")).collect()
    assert rows[0]["j"]["summary"] == "s1" and rows[0]["j"]["violation"] == "y"
    assert rows[1]["j"]["summary"] == "s2" and rows[1]["j"]["violation"] == "n"


def test_parse_iso_timestamp_engine_stamp_shapes(spark):
    """Regression: the engine's own dateprocessed stamp shape
    (no fraction, colon offset) must parse — the original format list
    silently nulled every such value."""
    from mcyj_datapipeline_spark.functions.dates import parse_iso_timestamp

    df = spark.createDataFrame(
        [
            ("1970-01-01T00:00:00+00:00",),   # engine's own stamp
            ("2024-03-05T10:20:30.123Z",),    # reference API shape
            ("2024-03-05T10:20:30Z",),
            ("2024-03-05",),
            ("not a timestamp",),
        ],
        "s string",
    )
    got = [r["t"] for r in df.select(parse_iso_timestamp(F.col("s")).alias("t")).collect()]
    assert got[0] is not None and got[0].year == 1970
    assert got[1] is not None and got[1].microsecond == 123000
    assert got[2] is not None and got[3] is not None
    assert got[4] is None
