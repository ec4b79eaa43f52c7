"""Batch 3 registry entries: the remaining SURVEY §2 line items —
dedicated F3/F4/F5 cascades, F16 brace-salvage, F17/F20/F21 codecs and
array ops, P13, A2/A10/A12, O1, the T1 three-way decision, the E3
website pipeline end-to-end, and oracle-checked queries for the
multimodal (mapInPandas) and procedural (U1/U2) operators.

Every kernel here is deterministic, so even the Arrow/mapInPandas
operators get full DuckDB value-hash oracles: the SQL re-derives the
fake-decoder outputs arithmetically from the same bytes.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mcyj_datapipeline_spark.io import read_table
from mcyj_datapipeline_spark.operators import aggregates as A
from mcyj_datapipeline_spark.operators import multimodal as MM
from mcyj_datapipeline_spark.operators import procedural as PR
from mcyj_datapipeline_spark.operators import text_analysis as TA
from mcyj_datapipeline_spark.plans import website as WEB
from mcyj_datapipeline_spark.registry import register
from mcyj_datapipeline_spark.streaming.incremental import (
    three_way_download_decision,
)


def _t(spark, sf_dir, name):
    return read_table(spark, sf_dir, name)


from mcyj_datapipeline_spark.session import session_scratch as _session_scratch


# ===========================================================================
# §2.8 — dedicated scalar cascades F3 / F4 / F5
# ===========================================================================


@register(
    "f03_title_cascade",
    """
    SELECT doc_id,
           CASE doc_id % 5
             WHEN 0 THEN 'Special Investigation Report #2024C' || doc_id::VARCHAR
             WHEN 1 THEN 'Interim Monitoring Report'
             WHEN 2 THEN 'Inspection Report'
             WHEN 3 THEN 'Annual safety review INSPECTION'
             ELSE NULL
           END AS document_title
    FROM documents
    """,
    "F3: full title cascade — cover-letter branch + SIR# suffix, pattern "
    "cascade with smart title-case, first-10-lines fallback, no-match null "
    "(reference extract_document_info.py:68-148)",
)
def f03_title_cascade(spark, sf_dir):
    from mcyj_datapipeline_spark.functions.extractors import (
        extract_document_title,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    txt = (
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(
                F.lit(
                    "Dear Director,\n"
                    "Attached is the Special Investigation Report.\n"
                    "Investigation #: 2024C"
                ),
                F.col("doc_id").cast("string"),
            ),
        )
        .when(
            F.col("doc_id") % 5 == 1,
            F.lit("cover line\nINTERIM MONITORING REPORT\nbody"),
        )
        .when(
            F.col("doc_id") % 5 == 2,
            F.lit("header\nON-SITE   INSPECTION REPORT\nbody"),
        )
        .when(
            F.col("doc_id") % 5 == 3,
            F.lit("Random Cover Line\nAnnual safety review INSPECTION\nrest"),
        )
        .otherwise(F.lit("nothing relevant in this text"))
    )
    return docs.select(
        "doc_id", extract_document_title(txt).alias("document_title")
    )


@register(
    "f04_investigation_number",
    """
    SELECT doc_id,
           CASE doc_id % 4
             WHEN 0 THEN '2024C' || doc_id::VARCHAR
             WHEN 1 THEN '88B' || doc_id::VARCHAR
             WHEN 2 THEN 'R' || doc_id::VARCHAR
             ELSE NULL
           END AS investigation_number
    FROM documents
    """,
    "F4: investigation-number cascade (3 labeled patterns, first wins)",
)
def f04_investigation_number(spark, sf_dir):
    from mcyj_datapipeline_spark.functions.extractors import (
        extract_investigation_number,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    txt = (
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(F.lit("Investigation #: 2024C"), F.col("doc_id").cast("string")),
        )
        .when(
            F.col("doc_id") % 4 == 1,
            F.concat(F.lit("SIR # : 88B"), F.col("doc_id").cast("string")),
        )
        .when(
            F.col("doc_id") % 4 == 2,
            F.concat(F.lit("Report #: R"), F.col("doc_id").cast("string")),
        )
        .otherwise(F.lit("no number"))
    )
    return docs.select(
        "doc_id",
        extract_investigation_number(txt).alias("investigation_number"),
    )


@register(
    "f05_inspection_date",
    """
    SELECT doc_id,
           CASE doc_id % 4
             WHEN 0 THEN '01/15/2024 and 01/16/2024'
             WHEN 1 THEN '02/01/2024'
             WHEN 2 THEN 'March 5, 2024'
             ELSE '3/7/2023'
           END AS date
    FROM documents
    """,
    "F5: inspection-date cascade — labeled lines (group 1) else bare "
    "Month-name / M/D/YYYY (group 0), whitespace-collapsed",
)
def f05_inspection_date(spark, sf_dir):
    from mcyj_datapipeline_spark.functions.extractors import (
        extract_inspection_date,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    txt = (
        F.when(
            F.col("doc_id") % 4 == 0,
            F.lit("Date(s) of On-site Inspection:   01/15/2024  and  01/16/2024"),
        )
        .when(
            F.col("doc_id") % 4 == 1,
            F.lit("Special Investigation Intake Date: 02/01/2024"),
        )
        .when(F.col("doc_id") % 4 == 2, F.lit("visited March 5, 2024 today"))
        .otherwise(F.lit("on 3/7/2023."))
    )
    return docs.select("doc_id", extract_inspection_date(txt).alias("date"))


# ===========================================================================
# F16 — nested-safe JSON salvage (greedy from_json path + UDF fallback U4)
# ===========================================================================


@register(
    "f16_json_salvage",
    """
    SELECT doc_id,
           CASE doc_id % 3
             WHEN 0 THEN 's' || doc_id::VARCHAR
             WHEN 1 THEN 'n' || doc_id::VARCHAR
             ELSE 't' || doc_id::VARCHAR
           END AS summary,
           CASE doc_id % 3 WHEN 1 THEN 'n' ELSE 'y' END AS violation
    FROM documents
    """,
    "F16/U4: nested-safe JSON extraction — greedy-brace from_json fast "
    "path, brace-matching Python UDF fallback only for rows the fast path "
    "cannot parse (reference update_violation_levels.py:281-320)",
)
def f16_json_salvage(spark, sf_dir):
    from mcyj_datapipeline_spark.functions.textfn import salvage_llm_json_table

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    txt = (
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.lit('ok {"summary": "s'),
                F.col("doc_id").cast("string"),
                F.lit('", "violation": "y"} thanks'),
            ),
        )
        .when(
            F.col("doc_id") % 3 == 1,
            F.concat(
                F.lit('x {"summary": "n'),
                F.col("doc_id").cast("string"),
                F.lit('", "detail": {"depth": 2}, "violation": "n"} y'),
            ),
        )
        .otherwise(
            F.concat(
                F.lit('a {"summary": "t'),
                F.col("doc_id").cast("string"),
                F.lit('", "violation": "y"} plus an unmatched } brace'),
            )
        )
    )
    salvaged = salvage_llm_json_table(docs.withColumn("raw", txt), "raw", "parsed")
    return salvaged.select(
        "doc_id",
        F.col("parsed")["summary"].alias("summary"),
        F.col("parsed")["violation"].alias("violation"),
    )


# ===========================================================================
# F17 / F20 / F21 — codecs and array ops
# ===========================================================================


@register(
    "f17_keywords_json_roundtrip",
    """
    SELECT doc_id, unnest(w[1:5]) AS keyword
    FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
    """,
    "F17: keywords array → JSON text → array round trip (the CSV-boundary "
    "serialization, reference update_violation_levels.py:485)",
)
def f17_keywords_json_roundtrip(spark, sf_dir):
    from mcyj_datapipeline_spark.functions.textfn import (
        keywords_from_json,
        keywords_to_json,
    )

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.slice(F.split(F.col("text"), " "), 1, 5).alias("kws")
    )
    roundtrip = keywords_from_json(keywords_to_json(F.col("kws")))
    return docs.select("doc_id", F.explode(roundtrip).alias("keyword"))


@register(
    "f20_base64_roundtrip",
    """
    SELECT doc_id,
           to_base64(encode(substr(text, 1, 40))) AS b64,
           substr(text, 1, 40) AS decoded
    FROM documents
    """,
    "F20: base64 encode/decode of binary payloads (API PDF body shape, "
    "reference download_pdf.py:90-91)",
)
def f20_base64_roundtrip(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    head = F.substring(F.col("text"), 1, 40)
    b64 = F.base64(F.encode(head, "UTF-8"))
    return docs.select(
        "doc_id",
        b64.alias("b64"),
        F.decode(F.unbase64(b64), "UTF-8").alias("decoded"),
    )


@register(
    "f21_pages_array_ops",
    """
    SELECT doc_id,
           len(pages) AS n_pages,
           length(array_to_string(pages, chr(10))) AS n_chars
    FROM (SELECT doc_id, string_split(text, '. ') AS pages FROM documents)
    """,
    "F21: array ops on the pages column — join, count, char count",
)
def f21_pages_array_ops(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    pages = F.split(F.col("text"), r"\. ")
    return docs.select(
        "doc_id",
        F.size(pages).alias("n_pages"),
        F.length(F.array_join(pages, "\n")).alias("n_chars"),
    )


# ===========================================================================
# P13 / A2 / A10 / A12 / O1
# ===========================================================================


@register(
    "p13_file_extension_filter",
    """
    SELECT p_partkey, fname FROM (
      SELECT p_partkey,
             p_name || CASE p_partkey % 3 WHEN 0 THEN '.pdf'
                                          WHEN 1 THEN '.PDF'
                                          ELSE '.txt' END AS fname
      FROM part
    ) WHERE ends_with(lower(fname), '.pdf')
    """,
    "P13: case-insensitive file-extension predicate",
)
def p13_file_extension_filter(spark, sf_dir):
    part = _t(spark, sf_dir, "part")
    fname = F.concat(
        F.col("p_name"),
        F.when(F.col("p_partkey") % 3 == 0, ".pdf")
        .when(F.col("p_partkey") % 3 == 1, ".PDF")
        .otherwise(".txt"),
    )
    return (
        part.select("p_partkey", fname.alias("fname"))
        .filter(F.lower(F.col("fname")).endswith(".pdf"))
    )


@register(
    "a02_global_sums",
    """
    SELECT count(*) AS total_reports,
           round(sum(o_totalprice), 2) AS total_value
    FROM orders
    """,
    "A2: global sums across all groups",
)
def a02_global_sums(spark, sf_dir):
    return _t(spark, sf_dir, "orders").agg(
        F.count(F.lit(1)).alias("total_reports"),
        F.round(F.sum("o_totalprice"), 2).alias("total_value"),
    )


@register(
    "a10_token_cost_sums",
    """
    SELECT lang,
           sum(len(list_filter(string_split_regex(text, '\\s+'), t -> t <> '')))::BIGINT
             AS total_tokens,
           sum(length(text))::BIGINT AS total_chars
    FROM documents GROUP BY lang ORDER BY lang
    """,
    "A10: token/cost accounting sums per group (LLM usage rollup shape)",
)
def a10_token_cost_sums(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.groupBy("lang")
        .agg(
            F.sum(TA.token_count(F.col("text"))).alias("total_tokens"),
            F.sum(TA.char_count(F.col("text"))).alias("total_chars"),
        )
        .orderBy("lang")
    )


@register(
    "a12_status_counters",
    """
    SELECT CASE o_orderstatus WHEN 'F' THEN 'processed'
                              WHEN 'O' THEN 'pending'
                              ELSE 'partial' END AS status,
           count(*) AS count
    FROM orders GROUP BY 1 ORDER BY status
    """,
    "A12: processed/skipped/error run counters as groupBy-count",
)
def a12_status_counters(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    status = (
        F.when(F.col("o_orderstatus") == "F", "processed")
        .when(F.col("o_orderstatus") == "O", "pending")
        .otherwise("partial")
    )
    return (
        orders.groupBy(status.alias("status"))
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy("status")
    )


@register(
    "o1_multi_key_sort",
    """
    SELECT o_custkey, o_orderkey FROM orders
    ORDER BY o_custkey, o_orderkey LIMIT 500
    """,
    "O1: deterministic multi-key sort before sink (stable CSV ordering)",
)
def o1_multi_key_sort(spark, sf_dir):
    return (
        _t(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderkey")
        .orderBy("o_custkey", "o_orderkey")
        .limit(500)
    )


# ===========================================================================
# T1 — three-way incremental download decision
# ===========================================================================


@register(
    "t1_three_way_decision",
    """
    SELECT c_custkey::VARCHAR AS ContentDocumentId,
           CASE c_custkey % 3 WHEN 0 THEN 'skip'
                              WHEN 1 THEN 'backfill'
                              ELSE 'download' END AS decision
    FROM customer
    """,
    "T1: per-row skip/backfill/download decision — one left join + when "
    "chain (reference run_full_pipeline.py:361-395)",
)
def t1_three_way_decision(spark, sf_dir):
    customer = _t(spark, sf_dir, "customer")
    api = customer.select(
        F.col("c_custkey").cast("string").alias("ContentDocumentId")
    )
    state = (
        customer.filter(F.col("c_custkey") % 3 != 2)
        .select(
            F.col("c_custkey").cast("string").alias("ContentDocumentId"),
            F.when(
                F.col("c_custkey") % 3 == 0,
                F.concat(F.lit("sha"), F.col("c_custkey").cast("string")),
            )
            .otherwise(F.lit(""))
            .alias("sha256"),
            F.when(
                F.col("c_custkey") % 3 == 1,
                F.concat(F.lit("/dl/"), F.col("c_custkey").cast("string")),
            )
            .otherwise(F.lit(""))
            .alias("downloaded_path"),
        )
    )
    return three_way_download_decision(api, state).select(
        "ContentDocumentId", "decision"
    )


# ===========================================================================
# E3 website pipeline end-to-end (J1–J4 + F8 + F17/F18 + P6/P2)
# ===========================================================================

_E3_ORACLE = """
    WITH document_info AS (
      SELECT doc_id::VARCHAR AS sha256,
             'AG' || (doc_id % 50)::VARCHAR AS agency_id,
             'Agency ' || (doc_id % 50)::VARCHAR AS agency_name,
             CASE WHEN doc_id % 2 = 0 THEN '01/15/2024' ELSE 'March 5, 2024' END AS date,
             doc_id % 2 = 0 AS is_special_investigation
      FROM documents
    ), sir AS (
      SELECT doc_id::VARCHAR AS sha256, 'sum' || doc_id::VARCHAR AS summary,
             CASE WHEN doc_id % 6 = 0 THEN 'y' ELSE 'n' END AS violation
      FROM documents WHERE doc_id % 3 = 0
    ), lvl AS (
      SELECT doc_id::VARCHAR AS sha256, 'severe' AS level
      FROM documents WHERE doc_id % 6 = 0
    ), staff AS (
      SELECT doc_id::VARCHAR AS sha256, true AS staffing_problem, 'high' AS confidence
      FROM documents WHERE doc_id % 4 = 0
    ), fac AS (
      SELECT DISTINCT 'AG' || (doc_id % 50)::VARCHAR AS agency_id,
             CASE WHEN doc_id % 2 = 0 THEN 'Regular' ELSE 'Closed' END AS LicenseStatus
      FROM documents WHERE doc_id < 50
    )
    SELECT d.sha256, d.agency_id, s.summary, l.level,
           coalesce(st.staffing_problem, false) AS staffing_problem,
           CASE WHEN d.date = '01/15/2024' THEN DATE '2024-01-15'
                ELSE DATE '2024-03-05' END AS date_iso,
           f.LicenseStatus
    FROM document_info d
    LEFT JOIN sir s ON d.sha256 = s.sha256
    LEFT JOIN lvl l ON d.sha256 = l.sha256
    LEFT JOIN staff st ON d.sha256 = st.sha256
    LEFT JOIN fac f ON d.agency_id = f.agency_id
    WHERE d.is_special_investigation AND f.LicenseStatus IN
      ('Regular', 'Original', '1st Provisional', '2nd Provisional', 'Inspected')
"""


@register(
    "e3_website_pipeline",
    _E3_ORACLE,
    "E3 end-to-end: build_flat_table (J1–J4 broadcast joins + F8 date "
    "normalize + F17/F18 casts) + interactive_filter (P6 active-status, "
    "P2 SIR-only) over reference-shaped frames",
)
def e3_website_pipeline(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").select("doc_id")
    sha = F.col("doc_id").cast("string")
    agid = F.concat(F.lit("AG"), (F.col("doc_id") % 50).cast("string"))
    document_info = docs.select(
        sha.alias("sha256"),
        agid.alias("agency_id"),
        F.concat(F.lit("Agency "), (F.col("doc_id") % 50).cast("string")).alias(
            "agency_name"
        ),
        F.when(F.col("doc_id") % 2 == 0, "01/15/2024")
        .otherwise("March 5, 2024")
        .alias("date"),
        (F.col("doc_id") % 2 == 0).alias("is_special_investigation"),
    )
    sir = docs.filter(F.col("doc_id") % 3 == 0).select(
        sha.alias("sha256"),
        F.concat(F.lit("sum"), sha).alias("response"),
        F.when(F.col("doc_id") % 6 == 0, "y").otherwise("n").alias("violation"),
    )
    lvl = docs.filter(F.col("doc_id") % 6 == 0).select(
        sha.alias("sha256"),
        F.lit("severe").alias("level"),
        F.lit("justified").alias("justification"),
        F.lit('["kw1", "kw2"]').alias("keywords"),
    )
    staff = docs.filter(F.col("doc_id") % 4 == 0).select(
        sha.alias("sha256"),
        F.lit("true").alias("staffing_problem"),
        F.lit("high").alias("confidence"),
        F.lit("reason").alias("primary_reason"),
    )
    fac = (
        docs.filter(F.col("doc_id") < 50)
        .select(
            agid.alias("LicenseNumber"),
            F.when(F.col("doc_id") % 2 == 0, "Regular")
            .otherwise("Closed")
            .alias("LicenseStatus"),
        )
        .distinct()
    )
    flat = WEB.build_flat_table(document_info, sir, lvl, staff, fac)
    out = WEB.interactive_filter(
        flat, license_statuses=WEB.ACTIVE_LICENSE_STATUSES, sir_only=True
    )
    return out.select(
        "sha256",
        "agency_id",
        F.col("summary"),
        "level",
        F.coalesce(F.col("staffing_problem"), F.lit(False)).alias(
            "staffing_problem"
        ),
        "date_iso",
        "LicenseStatus",
    )


# ===========================================================================
# Multimodal (opaque binary columns; Arrow-batched mapInPandas plumbing)
# ===========================================================================


def _media_df(spark, sf_dir):
    """documents text re-cast as opaque media blobs with magic-number
    prefixes — deterministic stand-in for image/audio bytes."""
    docs = _t(spark, sf_dir, "documents")
    magic = (
        F.when(F.col("doc_id") % 4 == 0, F.unhex(F.lit("FFD8FFE0")))
        .when(F.col("doc_id") % 4 == 1, F.unhex(F.lit("89504E47")))
        .when(F.col("doc_id") % 4 == 2, F.unhex(F.lit("25504446")))
        .otherwise(F.unhex(F.lit("00000000")))
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.concat(magic, F.encode(F.col("text"), "UTF-8")).alias("content"),
    )


_MM_BLOB_SQL = """
      SELECT doc_id AS media_id,
             CASE doc_id % 4 WHEN 0 THEN unhex('FFD8FFE0')
                             WHEN 1 THEN unhex('89504E47')
                             WHEN 2 THEN unhex('25504446')
                             ELSE unhex('00000000') END || encode(text) AS content
      FROM documents
"""


@register(
    "mm_media_metadata",
    f"""
    SELECT media_id,
           octet_length(content) AS n_bytes,
           CASE left(hex(content), 8)
             WHEN 'FFD8FFE0' THEN 'jpeg'
             WHEN '89504E47' THEN 'png'
             WHEN '25504446' THEN 'pdf'
             ELSE 'unknown' END AS format_sniff
    FROM ({_MM_BLOB_SQL})
    """,
    "Multimodal: JVM-side typed metadata over opaque binary (length, "
    "magic-number sniff) — no decode, no Python",
)
def mm_media_metadata(spark, sf_dir):
    meta = MM.with_media_metadata(_media_df(spark, sf_dir))
    return meta.select("media_id", "n_bytes", "format_sniff")


@register(
    "mm_image_features",
    f"""
    SELECT media_id,
           octet_length(content) AS n_bytes,
           16 + (octet_length(content) % 241) AS width,
           16 + ((octet_length(content) * 31) % 241) AS height
    FROM ({_MM_BLOB_SQL})
    """,
    "Multimodal: decode/feature-extract via Arrow mapInPandas (1:1). "
    "Decoder is a deterministic STUB, so the oracle re-derives the fake "
    "geometry arithmetically — the Spark-side plumbing under test is real",
)
def mm_image_features(spark, sf_dir):
    # Decoder pinned to the deterministic fake: the media column holds
    # synthetic (non-image) bytes and the oracle re-derives the fake's
    # arithmetic, so auto-detecting a real Pillow must not kick in here.
    feats = MM.extract_image_features(
        _media_df(spark, sf_dir), decoder=MM._fake_decode_image
    )
    return feats.select(
        "media_id",
        "n_bytes",
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
    )


@register(
    "mm_frame_sample",
    f"""
    SELECT media_id,
           unnest(range(CAST(ceil(octet_length(content) / 160.0) AS BIGINT)))
             AS frame_index
    FROM ({_MM_BLOB_SQL}) WHERE octet_length(content) > 0
    """,
    "Multimodal: frame sampling via mapInPandas (1 row in → N frame rows "
    "out, the generator/UDTF shape); fake demuxer chunks bytes",
)
def mm_frame_sample(spark, sf_dir):
    frames = MM.sample_frames(_media_df(spark, sf_dir), every_n=10)
    return frames.select(
        "media_id", F.col("frame_index").cast("long").alias("frame_index")
    )


# ===========================================================================
# Procedural edge U1 / U2 as oracle-checked queries
# ===========================================================================


@register(
    "u1_pdf_extract",
    """
    SELECT doc_id::VARCHAR AS sha256,
           1 + (octet_length(encode(text)) % 5) AS n_pages,
           'page 1 len ' || octet_length(encode(text))::VARCHAR AS page1
    FROM documents
    """,
    "U1: binary → pages-array extraction via Arrow mapInPandas (1:1). "
    "pdfplumber kernel injectable; the deterministic fake extractor lets "
    "the oracle re-derive page counts from byte lengths "
    "(reference extract_pdf_text.py:98-105)",
)
def u1_pdf_extract(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("sha256"),
        F.encode(F.col("text"), "UTF-8").alias("content"),
    )
    out = PR.extract_pdf_text(docs, extractor=PR._fake_pdf_pages)
    return out.select(
        "sha256",
        F.size("text").cast("long").alias("n_pages"),
        F.element_at("text", 1).alias("page1"),
    )


@register(
    "u2_llm_enrich",
    """
    SELECT doc_id::VARCHAR AS sha256,
           'summary of ' || length(text)::VARCHAR || ' chars' AS response,
           CASE WHEN contains(lower(text), 'violation') THEN 'y' ELSE 'n' END
             AS violation,
           length(text) // 4 AS input_tokens,
           (50 + length(length(text)::VARCHAR)) // 4 AS output_tokens
    FROM documents
    """,
    "U2: LLM enrichment via mapInPandas with usage accounting; document-"
    "first prompt order preserved for provider cache reuse. Deterministic "
    "mock client → full value oracle "
    "(reference update_sir_summaries.py:154-259)",
)
def u2_llm_enrich(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("sha256"),
        F.col("text").alias("full_text"),
    )
    out = PR.llm_enrich(docs, prompt="summarize; flag violation")
    return out.select(
        "sha256", "response", "violation", "input_tokens", "output_tokens"
    )


# ===========================================================================
# A5 word-level inverted index with per-phrase insert semantics (X1 feed)
# ===========================================================================


@register(
    "f22_phrase_to_words",
    """
    SELECT DISTINCT doc_id, word
    FROM (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                w -> w <> '')) AS word
      FROM documents
    )
    """,
    "F22: phrase → word explode for the word-level index (trie insert "
    "feed, reference App.jsx:95-99)",
)
def f22_phrase_to_words(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id",
            F.explode(
                F.array_distinct(
                    F.filter(
                        F.split(F.lower(F.col("text")), r"\s+"),
                        lambda w: w != "",
                    )
                )
            ).alias("word"),
        )
        .distinct()
    )


# ===========================================================================
# Similarity: IVF (inverted-file) approximate top-k — the ANN scale path
# ===========================================================================

_IVF_COS = """list_sum([{a}[i]::DOUBLE * {b}[i]::DOUBLE for i in range(1, len({a}) + 1)]) /
      (sqrt(list_sum([{a}[i]::DOUBLE * {a}[i]::DOUBLE for i in range(1, len({a}) + 1)])) *
       sqrt(list_sum([{b}[i]::DOUBLE * {b}[i]::DOUBLE for i in range(1, len({b}) + 1)])))"""


def _ivf_oracle_sql(k: int = 5, n_centroids: int = 16, nprobe: int = 4) -> str:
    cos_vc = _IVF_COS.format(a="v", b="cent_vec")
    cos_qc = _IVF_COS.format(a="qv", b="cent_vec")
    cos_qn = _IVF_COS.format(a="qv", b="nv")
    return f"""
    WITH cent AS (
      SELECT vec_id AS centroid_id, embedding AS cent_vec
      FROM embeddings WHERE vec_id < {n_centroids}
    ), assigned AS (
      SELECT vec_id, v, centroid_id FROM (
        SELECT e.vec_id, e.embedding AS v, c.centroid_id,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY round({cos_vc}, 6) DESC, c.centroid_id) AS rn
        FROM embeddings e CROSS JOIN cent c
      ) WHERE rn = 1
    ), probes AS (
      SELECT query_id, qv, centroid_id FROM (
        SELECT q.vec_id AS query_id, q.embedding AS qv, c.centroid_id,
               row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY round({cos_qc}, 6) DESC, c.centroid_id) AS rn
        FROM embeddings q CROSS JOIN cent c WHERE q.vec_id < 8
      ) WHERE rn <= {nprobe}
    ), scored AS (
      SELECT p.query_id, a.vec_id AS neighbor_id,
             round({cos_qn}, 6) AS cosine
      FROM probes p
      JOIN (SELECT vec_id, v AS nv, centroid_id FROM assigned) a
        ON p.centroid_id = a.centroid_id AND a.vec_id <> p.query_id
    )
    SELECT query_id, neighbor_id, cosine, rank FROM (
      SELECT query_id, neighbor_id, cosine,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, neighbor_id) AS rank
      FROM scored
    ) WHERE rank <= {k}
    """


@register(
    "sim_ivf_topk",
    _ivf_oracle_sql(),
    "Similarity/IVF: nearest-centroid inverted lists, nprobe probing, "
    "exact re-rank of candidates only — the ANN scale path (corpus "
    "partitioned by centroid; each query touches nprobe/n_centroids of "
    "the data). Deterministic centroids (smallest ids) make it fully "
    "oracle-checkable; k-means centroids slot into the same plan",
)
def sim_ivf_topk(spark, sf_dir):
    from mcyj_datapipeline_spark.operators.similarity import ivf_topk

    emb = _t(spark, sf_dir, "embeddings")
    return ivf_topk(emb, emb.filter(F.col("vec_id") < 8), k=5)


# ===========================================================================
# Skew mitigation: salted two-phase aggregation (same results, spread key)
# ===========================================================================


@register(
    "skew_salted_group_count",
    """
    SELECT l_returnflag, count(*) AS count
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    "Skew: salted two-phase count over a 3-value heavy-hitter key — "
    "identical to plain groupBy-count, but one hot key's shuffle is "
    "spread over n_salt reducers",
)
def skew_salted_group_count(spark, sf_dir):
    from mcyj_datapipeline_spark.operators.skew import salted_group_count

    li = _t(spark, sf_dir, "lineitem")
    return salted_group_count(li, "l_returnflag", "l_orderkey").orderBy(
        "l_returnflag"
    )


@register(
    "skew_salted_collect_set",
    """
    SELECT l_returnflag,
           array_to_string(list_sort(list_distinct(list(l_linenumber::VARCHAR))), ',')
             AS distinct_values
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    "Skew: salted two-phase collect_set (holistic aggregate) — the case "
    "partial aggregation cannot bound; per-(key,salt) sets then flatten",
)
def skew_salted_collect_set(spark, sf_dir):
    from mcyj_datapipeline_spark.operators.skew import salted_collect_set

    li = _t(spark, sf_dir, "lineitem")
    out = salted_collect_set(
        li.withColumn("l_linenumber", F.col("l_linenumber").cast("string")),
        "l_returnflag",
        "l_linenumber",
    )
    return out.select(
        "l_returnflag",
        F.array_join("values", ",").alias("distinct_values"),
    ).orderBy("l_returnflag")


# ===========================================================================
# T4 — cascaded incremental derivations (chained anti-join work queues)
# ===========================================================================


@register(
    "t4_cascaded_work_queues",
    """
    WITH doc_info AS (
      SELECT o_orderkey AS sha256, o_orderkey % 2 = 0 AS is_special_investigation
      FROM orders
    ), summaries_done AS (
      SELECT o_orderkey AS sha256 FROM orders WHERE o_orderkey % 4 = 0
    ), sir_work AS (
      SELECT d.sha256 FROM doc_info d
      WHERE d.is_special_investigation
        AND d.sha256 NOT IN (SELECT sha256 FROM summaries_done)
      ORDER BY d.sha256 LIMIT 50
    ), levels_done AS (
      SELECT o_orderkey AS sha256 FROM orders WHERE o_orderkey % 8 = 0
    ), level_work AS (
      SELECT s.sha256 FROM summaries_done s
      WHERE s.sha256 NOT IN (SELECT sha256 FROM levels_done)
      ORDER BY s.sha256 LIMIT 50
    )
    SELECT sha256, 'sir' AS stage FROM sir_work
    UNION ALL
    SELECT sha256, 'level' AS stage FROM level_work
    """,
    "T4: cascaded incremental derivations — doc_info → (filter SIR) → "
    "summary queue, summaries → level queue, each stage an anti-join + "
    "deterministic ORDER BY + LIMIT bounded batch "
    "(reference update_sir_summaries.py:314-337 → update_violation_levels.py:420-447)",
)
def t4_cascaded_work_queues(spark, sf_dir):
    from mcyj_datapipeline_spark.streaming.incremental import pending_work

    orders = _t(spark, sf_dir, "orders")
    doc_info = orders.select(
        F.col("o_orderkey").alias("sha256"),
        (F.col("o_orderkey") % 2 == 0).alias("is_special_investigation"),
    )
    summaries_done = orders.filter(F.col("o_orderkey") % 4 == 0).select(
        F.col("o_orderkey").alias("sha256")
    )
    levels_done = orders.filter(F.col("o_orderkey") % 8 == 0).select(
        F.col("o_orderkey").alias("sha256")
    )
    sir_work = pending_work(
        doc_info.filter("is_special_investigation").select("sha256"),
        summaries_done,
        "sha256",
        limit=50,
    )
    level_work = pending_work(summaries_done, levels_done, "sha256", limit=50)
    return sir_work.withColumn("stage", F.lit("sir")).unionByName(
        level_work.withColumn("stage", F.lit("level"))
    )


# ===========================================================================
# X1 — multi-word phrase inverted index (word → phrase pointing)
# ===========================================================================


@register(
    "x1_phrase_prefix_search",
    """
    WITH counts AS (
      SELECT p_name AS phrase, count(*) AS weight FROM part GROUP BY p_name
    ), index_terms AS (
      SELECT phrase, weight,
             unnest(list_distinct(list_prepend(lower(phrase),
               string_split_regex(lower(trim(phrase)), '\\s+')))) AS term
      FROM counts
    )
    SELECT phrase, max(weight) AS count
    FROM index_terms WHERE term LIKE 'r%' AND term <> ''
    GROUP BY phrase ORDER BY count DESC, phrase LIMIT 10
    """,
    "X1 multi-word: each phrase indexed under itself AND each word, so a "
    "word-prefix query surfaces full phrases (trie insert semantics, "
    "reference trie.js:19-41 / App.jsx:119-125)",
)
def x1_phrase_prefix_search(spark, sf_dir):
    part = _t(spark, sf_dir, "part")
    counts = part.groupBy(F.col("p_name").alias("phrase")).agg(
        F.count(F.lit(1)).alias("weight")
    )
    index = A.build_inverted_index(counts, "phrase", "weight")
    return A.prefix_search(index, "r", 10)


# ===========================================================================
# Similarity: NumPy-vectorized brute-force (Arrow kernel, same oracle)
# ===========================================================================


@register(
    "sim_cosine_topk_numpy",
    None,  # oracle assigned below — shared with sim_cosine_topk_bruteforce
    "Similarity: brute-force cosine top-k with BLAS matrix-multiply "
    "kernel over Arrow batches — the vectorized-Python alternative to "
    "the JVM zip_with/aggregate fold; identical results, shared oracle",
)
def sim_cosine_topk_numpy(spark, sf_dir):
    from mcyj_datapipeline_spark.operators.similarity import cosine_topk_numpy

    emb = _t(spark, sf_dir, "embeddings")
    return cosine_topk_numpy(emb, emb.filter(F.col("vec_id") < 8), k=5)


# Share the brute-force oracle: same query semantics, different kernel.
from mcyj_datapipeline_spark import registry as _reg  # noqa: E402

_reg.set_oracle(
    "sim_cosine_topk_numpy", _reg._REGISTRY["sim_cosine_topk_bruteforce"][1]
)


@register(
    "text_bpe_token_count",
    """
    SELECT doc_id,
           (len(regexp_extract_all(text, '[A-Za-z0-9]+'))
            + length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g')))::INT
             AS n_bpe_tokens
    FROM documents
    """,
    "Text analysis: BPE-ish pre-tokenizer count (alnum word pieces + "
    "punctuation singletons). The Spark side splits with lookaround "
    "boundaries; the oracle counts the equivalent closed form since RE2 "
    "lacks lookbehind",
)
def text_bpe_token_count(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", F.size(TA.bpe_ish_tokens(F.col("text"))).alias("n_bpe_tokens")
    )


# ===========================================================================
# Upgrade the LSH-embedding queries from rows-only to full oracles: the
# hyperplane literals are embedded in the SQL, and both engines compute
# the dot products over the same element order with the same IEEE
# doubles, so bucket assignments agree exactly.
# ===========================================================================


def _planes_values_sql() -> str:
    from mcyj_datapipeline_spark.operators.similarity import LSH_PLANES

    rows = ", ".join(
        f"({i}, [{', '.join(repr(v) for v in plane)}]::DOUBLE[])"
        for i, plane in enumerate(LSH_PLANES)
    )
    return f"(VALUES {rows}) AS p(pid, pv)"


def _lsh_bucket_cte(source_filter: str = "") -> str:
    return f"""
    dots AS (
      SELECT e.vec_id, e.embedding, p.pid,
             list_sum([e.embedding[i]::DOUBLE * p.pv[i]
                       for i in range(1, len(p.pv) + 1)]) AS d
      FROM embeddings e CROSS JOIN {_planes_values_sql()} {source_filter}
    ), buckets AS (
      SELECT vec_id, any_value(embedding) AS embedding,
             sum(CASE WHEN d >= 0 THEN (1::BIGINT << pid) ELSE 0::BIGINT END)::BIGINT
               AS bucket
      FROM dots GROUP BY vec_id
    )"""


_LSH_COS = """list_sum([x.embedding[i]::DOUBLE * y.embedding[i]::DOUBLE
                 for i in range(1, len(x.embedding) + 1)]) /
      (sqrt(list_sum([x.embedding[i]::DOUBLE * x.embedding[i]::DOUBLE
                      for i in range(1, len(x.embedding) + 1)])) *
       sqrt(list_sum([y.embedding[i]::DOUBLE * y.embedding[i]::DOUBLE
                      for i in range(1, len(y.embedding) + 1)])))"""


def _embedding_near_dup_oracle(threshold: float = 0.9) -> str:
    return f"""
    WITH {_lsh_bucket_cte()}
    SELECT id_a, id_b, cosine FROM (
      SELECT x.vec_id AS id_a, y.vec_id AS id_b,
             round({_LSH_COS}, 6) AS cosine
      FROM buckets x JOIN buckets y
        ON x.bucket = y.bucket AND x.vec_id < y.vec_id
    ) WHERE cosine >= {threshold}
    """


def _lsh_topk_oracle(k: int = 5) -> str:
    return f"""
    WITH {_lsh_bucket_cte()}
    SELECT query_id, neighbor_id, cosine, rank FROM (
      SELECT y.vec_id AS query_id, x.vec_id AS neighbor_id,
             round({_LSH_COS}, 6) AS cosine,
             row_number() OVER (PARTITION BY y.vec_id
                                ORDER BY round({_LSH_COS}, 6) DESC, x.vec_id)
               AS rank
      FROM buckets x JOIN buckets y
        ON x.bucket = y.bucket AND x.vec_id <> y.vec_id
      WHERE y.vec_id < 8
    ) WHERE rank <= {k}
    """


_reg.set_oracle("sim_embedding_near_dup", _embedding_near_dup_oracle())
_reg.set_oracle("sim_lsh_topk", _lsh_topk_oracle())


@register(
    "f27_html_escape",
    """
    SELECT p_partkey,
           replace(replace(replace(replace(replace(
             p_name || ' <tag> & "q" ''s''', '&', '&amp;'),
             '<', '&lt;'), '>', '&gt;'), '"', '&quot;'), '''', '&#39;')
             AS escaped
    FROM part
    """,
    "F27: HTML escaping for rendered output (reference helpers.js:6-11); "
    "'&' replaced first so entities don't double-escape",
)
def f27_html_escape(spark, sf_dir):
    part = _t(spark, sf_dir, "part")
    s = F.concat(F.col("p_name"), F.lit(" <tag> & \"q\" 's'"))
    for frm, to in [
        ("&", "&amp;"),
        ("<", "&lt;"),
        (">", "&gt;"),
        ('"', "&quot;"),
        ("'", "&#39;"),
    ]:
        s = F.replace(s, F.lit(frm), F.lit(to))
    return part.select("p_partkey", s.alias("escaped"))


@register(
    "o3_sorted_file_scan",
    """
    SELECT doc_id FROM documents ORDER BY doc_id LIMIT 100
    """,
    # Value oracle pins the first-100 ids under (src_file, doc_id)
    # ordering; the src_file BASENAME itself is deliberately NOT in the
    # oracle — it would couple the oracle to the storage layout rather
    # than the operator (a multi-part regeneration would fail it for
    # layout reasons). Basename attribution stays a test-level concern
    # (test_io.py); under the harness's single-file-per-table contract
    # (oracle views read '{sf_dir}/{t}.parquet' directly) the file-then-
    # id ordering is exactly global doc_id ordering, so equality here
    # witnesses the sort. TakeOrderedAndProject, not a global sort.
    "O3: deterministic file-order processing via input_file_name ordering "
    "(reference sorted(pdf_files) loops); rows process in sorted "
    "(source-file, id) order so audits can replay the exact sequence",
)
def o3_sorted_file_scan(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.withColumn(
            "src_file",
            F.regexp_extract(F.input_file_name(), "[^/]+$", 0),
        )
        .orderBy("src_file", "doc_id")
        .select("doc_id")
        .limit(100)
    )


def _lsh_multiprobe_oracle(k: int = 5) -> str:
    from mcyj_datapipeline_spark.operators.similarity import N_PLANES

    probe_list = ", ".join(
        ["y.bucket"] + [f"xor(y.bucket, {1 << i})" for i in range(N_PLANES)]
    )
    return f"""
    WITH {_lsh_bucket_cte()},
    probes AS (
      SELECT y.vec_id AS query_id, y.embedding AS q_emb,
             unnest([{probe_list}]) AS bucket
      FROM buckets y WHERE y.vec_id < 8
    ), scored AS (
      SELECT DISTINCT p.query_id, x.vec_id AS neighbor_id,
             round(list_sum([p.q_emb[i]::DOUBLE * x.embedding[i]::DOUBLE
                             for i in range(1, len(p.q_emb) + 1)]) /
                   (sqrt(list_sum([p.q_emb[i]::DOUBLE * p.q_emb[i]::DOUBLE
                                   for i in range(1, len(p.q_emb) + 1)])) *
                    sqrt(list_sum([x.embedding[i]::DOUBLE * x.embedding[i]::DOUBLE
                                   for i in range(1, len(x.embedding) + 1)]))),
                   6) AS cosine
      FROM probes p JOIN buckets x ON p.bucket = x.bucket
      WHERE x.vec_id <> p.query_id
    )
    SELECT query_id, neighbor_id, cosine, rank FROM (
      SELECT query_id, neighbor_id, cosine,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, neighbor_id) AS rank
      FROM scored
    ) WHERE rank <= {k}
    """


@register(
    "sim_lsh_multiprobe_topk",
    None,  # assigned right below (needs the helper above at def time)
    "Similarity: multi-probe LSH top-k — each query also probes every "
    "Hamming-1 neighbor bucket (flip one sign bit); the standard recall "
    "lever that widens only the broadcast probe list, never the corpus",
)
def sim_lsh_multiprobe_topk(spark, sf_dir):
    from mcyj_datapipeline_spark.operators.similarity import lsh_topk_multiprobe

    emb = _t(spark, sf_dir, "embeddings")
    return lsh_topk_multiprobe(emb, emb.filter(F.col("vec_id") < 8), k=5)


_reg.set_oracle("sim_lsh_multiprobe_topk", _lsh_multiprobe_oracle())


@register(
    "sim_ivf_kmeans_topk",
    """
    SELECT count(*) AS n_queries,
           5 * count(*) AS n_pairs_exact,
           CAST(0.3 AS DOUBLE) AS recall_floor,
           true AS recall_ok
    FROM embeddings WHERE vec_id < 8
    """,
    # value-oracled since round 5 via a recall-floor contract (the q1b
    # ε pattern): float means over unordered groups make the refined
    # centroids — and hence the exact neighbor LISTS — engine-specific,
    # so the query computes recall@5 against the in-plan brute-force
    # baseline and returns the floor assertion; the hash compare fails
    # if k-means IVF ever drops below it. sim_ivf_topk (deterministic
    # centroids) carries the exact-list value oracle.
    "Similarity/IVF with Lloyd-refined centroids (k-means via DataFrame "
    "ops): same probe plan as sim_ivf_topk, better-balanced lists; "
    "recall@5 vs exact brute-force asserted in-query >= 0.3",
)
def sim_ivf_kmeans_topk(spark, sf_dir):
    from mcyj_datapipeline_spark.operators.similarity import (
        cosine_topk,
        ivf_topk,
        kmeans_centroids,
    )

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    cents = kmeans_centroids(emb, n_centroids=16, iters=2)
    approx = ivf_topk(emb, queries, k=5, centroids=cents).select(
        "query_id", "neighbor_id", F.lit(1).alias("_m")
    )
    exact = cosine_topk(emb, queries, k=5).select("query_id", "neighbor_id")
    return exact.join(approx, ["query_id", "neighbor_id"], "left").agg(
        F.countDistinct("query_id").alias("n_queries"),
        F.count(F.lit(1)).alias("n_pairs_exact"),
        F.lit(0.3).alias("recall_floor"),
        (
            F.sum(F.coalesce(F.col("_m"), F.lit(0)))
            / F.count(F.lit(1))
            >= 0.3
        ).alias("recall_ok"),
    )


# ===========================================================================
# Grouped-map applyInPandas: per-group normalization (training-data prep)
# ===========================================================================


@register(
    "ta_grouped_zscore",
    """
    SELECT lang, n_chars,
           round(CASE WHEN stddev_pop(n_chars) OVER (PARTITION BY lang) > 0
                      THEN (n_chars - avg(n_chars) OVER (PARTITION BY lang))
                           / stddev_pop(n_chars) OVER (PARTITION BY lang)
                      ELSE 0.0 END, 6) AS zscore
    FROM documents
    """,
    "Grouped-map applyInPandas: per-language z-score of document length "
    "— one pandas frame per group, vectorized numpy kernel; the window-"
    "function twin is the oracle",
)
def ta_grouped_zscore(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return TA.grouped_zscore(docs, "lang", "n_chars")


# ===========================================================================
# E4 — corpus-cleaning pipeline (the training-data preparation flow):
# quality score → language filter → exact dedup (min-id winner) → stats
# ===========================================================================

_E4_QUALITY_SQL = """
      SELECT doc_id, text, lang,
             round(0.25 * least(n / 20.0, 1.0)
                   + 0.25 * (CASE WHEN mwl >= 3 AND mwl <= 10 THEN 1.0 ELSE 0.5 END)
                   + 0.25 * alpha
                   + 0.25 * least(sw * 4, 1.0), 6) AS quality
      FROM (
        SELECT doc_id, text, lang,
               len(toks)::DOUBLE AS n,
               list_sum([length(t)::DOUBLE for t in toks]) / greatest(len(toks), 1) AS mwl,
               length(regexp_replace(text, '[^A-Za-z ]', '', 'g'))::DOUBLE
                 / greatest(length(text), 1) AS alpha,
               len(list_filter(ltoks, t -> list_contains(
                 ['the','a','an','and','or','of','to','in','is','it'], t)))::DOUBLE
                 / greatest(len(ltoks), 1) AS sw
        FROM (SELECT doc_id, text, lang,
                     list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS toks,
                     list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '') AS ltoks
              FROM documents)
      )
"""


@register(
    "e4_corpus_cleaning_pipeline",
    f"""
    WITH scored AS ({_E4_QUALITY_SQL}),
    kept AS (
      SELECT doc_id, text, quality FROM scored
      WHERE lang = 'en' AND quality >= 0.5
    ),
    winners AS (
      SELECT min(doc_id) AS doc_id FROM kept GROUP BY sha256(text)
    )
    SELECT k.doc_id, k.quality,
           len(list_filter(string_split_regex(k.text, '\\s+'), t -> t <> ''))
             AS n_tokens
    FROM kept k SEMI JOIN winners w ON k.doc_id = w.doc_id
    """,
    "E4 end-to-end training-data cleaning: quality scoring → language "
    "filter → exact dedup (hash groupBy, min-id winner) → token "
    "accounting. One declarative plan: the filters precede the dedup "
    "shuffle, which carries digests only",
)
def e4_corpus_cleaning_pipeline(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        "text",
        "lang",
        TA.quality_score(F.col("text")).alias("quality"),
    )
    kept = scored.filter((F.col("lang") == "en") & (F.col("quality") >= 0.5))
    winners = (
        kept.groupBy(F.sha2(F.col("text"), 256).alias("_sha"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    return (
        kept.join(winners, "doc_id", "left_semi")
        .select(
            "doc_id",
            "quality",
            TA.token_count(F.col("text")).alias("n_tokens"),
        )
    )


@register(
    "dedup_fuzzy_exact",
    """
    SELECT sha256(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')))
             AS norm_sha,
           min(doc_id) AS keep_id, count(*) AS n_copies
    FROM documents GROUP BY 1
    """,
    "Dedup/normalized-exact: hash groupBy over the canonical text form "
    "(lowercase, punctuation stripped, whitespace collapsed) — catches "
    "trivial reformattings byte-exact hashing misses, same one-shuffle "
    "plan as dedup_exact_hash",
)
def dedup_fuzzy_exact(spark, sf_dir):
    from mcyj_datapipeline_spark.operators.dedup import (
        fuzzy_exact_dedup_winners,
    )

    return fuzzy_exact_dedup_winners(_t(spark, sf_dir, "documents"))


@register(
    "a01_nested_json_rollup",
    """
    SELECT o_custkey AS agency_id,
           count(*) AS total_reports,
           to_json(list(struct_pack(date_iso := o_orderdate::DATE,
                                    doc_key := o_orderkey)
                   ORDER BY o_orderdate DESC, o_orderkey DESC))
             AS documents_json
    FROM orders GROUP BY o_custkey
    """,
    "A1/W2 with a full value oracle: per-agency nested doc list (newest "
    "first) serialized to canonical JSON on both engines — proves the "
    "collect_list(struct) nesting itself, not just scalar rollups",
)
def a01_nested_json_rollup(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    doc = F.struct(
        F.col("o_orderdate").cast("date").alias("date_iso"),
        F.col("o_orderkey").alias("doc_key"),
    )
    return (
        orders.groupBy(F.col("o_custkey").alias("agency_id"))
        .agg(
            F.count(F.lit(1)).alias("total_reports"),
            F.to_json(F.reverse(F.sort_array(F.collect_list(doc)))).alias(
                "documents_json"
            ),
        )
    )


@register(
    "p02_p03_p05_filter_chain",
    """
    SELECT doc_id, violation, agency_key FROM (
      SELECT doc_id,
             doc_id % 2 = 0 AS is_special_investigation,
             CASE WHEN doc_id % 3 = 0 THEN 'y' ELSE 'n' END AS violation,
             CASE WHEN doc_id % 7 = 0 THEN '  '
                  ELSE 'AG' || doc_id::VARCHAR END AS agency_key
      FROM documents
    ) WHERE is_special_investigation AND violation = 'y'
      AND trim(agency_key) <> ''
    """,
    "P2+P3+P5: boolean-column filter, code-equality filter, and "
    "non-blank-key guard in one conjunctive chain (the reference's "
    "row-loop skip conditions as sargable predicates)",
)
def p02_p03_p05_filter_chain(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        (F.col("doc_id") % 2 == 0).alias("is_special_investigation"),
        F.when(F.col("doc_id") % 3 == 0, "y").otherwise("n").alias("violation"),
        F.when(F.col("doc_id") % 7 == 0, "  ")
        .otherwise(F.concat(F.lit("AG"), F.col("doc_id").cast("string")))
        .alias("agency_key"),
    )
    return (
        docs.filter(F.col("is_special_investigation"))  # P2
        .filter(F.col("violation") == "y")  # P3
        .filter(F.trim(F.col("agency_key")) != "")  # P5
        .select("doc_id", "violation", "agency_key")
    )


# ===========================================================================
# Deterministic sampling / dataset splitting (training-data prep)
# ===========================================================================

from mcyj_datapipeline_spark.operators.hashing import hash60_sql  # noqa: E402


@register(
    "o7_hash_sample",
    f"""
    SELECT doc_id, lang FROM documents
    WHERE {hash60_sql("doc_id::VARCHAR")} % 10000 < 500
    """,
    "O7 scale form: deterministic hash-bucket sampling — a pure function "
    "of the row key, reproducible across runs/partitionings/engines "
    "(rand(seed) is not, once a repartition or retry moves rows)",
)
def o7_hash_sample(spark, sf_dir):
    from mcyj_datapipeline_spark.operators.sampling import hash_sample

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    return hash_sample(docs, "doc_id", fraction=0.05)


@register(
    "split_train_val_test",
    f"""
    SELECT doc_id,
           CASE WHEN b < 1000 THEN 'val'
                WHEN b < 2000 THEN 'test'
                ELSE 'train' END AS split
    FROM (SELECT doc_id, {hash60_sql("doc_id::VARCHAR")} % 10000 AS b
          FROM documents)
    """,
    "Dataset splitting: train/val/test as a pure function of the key "
    "hash — a document lands in the same split across reruns and scale "
    "factors, the property leakage audits require",
)
def split_train_val_test(spark, sf_dir):
    from mcyj_datapipeline_spark.operators.sampling import split_assign

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    return split_assign(docs, "doc_id", val_fraction=0.1, test_fraction=0.1)


@register(
    "text_redact_pii",
    r"""
    SELECT doc_id,
           regexp_replace(
             regexp_replace(
               regexp_replace(
                 'contact j' || doc_id::VARCHAR || '@example.com or 555-123-4567 ssn 123-45-6789 ' || substr(text, 1, 40),
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
               '\b\d{3}-\d{2}-\d{4}\b', '<SSN>', 'g'),
             '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '<PHONE>', 'g') AS redacted
    FROM documents
    """,
    "Training-data hygiene: PII redaction (email/phone/SSN → typed "
    "placeholders) as a JVM-side regexp_replace chain; patterns in the "
    "RE2-compatible subset so the oracle runs them verbatim",
)
def text_redact_pii(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    synthetic = F.concat(
        F.lit("contact j"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or 555-123-4567 ssn 123-45-6789 "),
        F.substring("text", 1, 40),
    )
    return docs.select("doc_id", TA.redact_pii(synthetic).alias("redacted"))


@register(
    "text_repetition_signals",
    """
    SELECT doc_id,
           round(1 - _distinct / _n, 6) AS dup_token_frac,
           round(_top / _n, 6) AS top_token_share
    FROM (
      SELECT doc_id, sum(c)::DOUBLE AS _n, count(*)::DOUBLE AS _distinct,
             max(c)::DOUBLE AS _top
      FROM (
        SELECT doc_id, tok, count(*) AS c FROM (
          SELECT doc_id, unnest(list_filter(string_split_regex(text, '\\s+'),
                                            t -> t <> '')) AS tok
          FROM documents
        ) GROUP BY doc_id, tok
      ) GROUP BY doc_id
    )
    """,
    "Gopher-style repetition signals: duplicate-token fraction + top-"
    "token share per doc (boilerplate/spam detector for the cleaning "
    "pipeline) — explode + two-level partial-agg, no UDFs",
)
def text_repetition_signals(spark, sf_dir):
    return TA.repetition_signals(_t(spark, sf_dir, "documents"))


# ===========================================================================
# As-of join (temporal operator Spark lacks; merge-style linear form)
# ===========================================================================


@register(
    "t_asof_join",
    """
    WITH clicks AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    ), views AS (
      SELECT user_id, ts, max(value) AS value FROM events
      WHERE event_type = 'view' GROUP BY user_id, ts
    )
    SELECT l.event_id, l.user_id, round(r.value, 6) AS asof_value
    FROM clicks l
    ASOF LEFT JOIN views r ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
    "As-of join: each click joined to the user's most recent view at-or-"
    "before it. Implemented merge-style (tag+union, one keyed sort, "
    "carry-forward window) — linear per key, no range-join blowup; "
    "DuckDB's native ASOF JOIN is the oracle",
)
def t_asof_join(spark, sf_dir):
    from mcyj_datapipeline_spark.operators.temporal import asof_join

    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("value"))
    )
    out = asof_join(clicks, views, "user_id", "ts", "ts", ["value"])
    return out.select(
        "event_id", "user_id", F.round("asof_value", 6).alias("asof_value")
    )


@register(
    "t_range_join_banded",
    """
    WITH sessions AS (
      SELECT user_id, event_id AS session_id, ts AS start_ts,
             ts + INTERVAL 30 MINUTE AS end_ts
      FROM events WHERE event_type = 'signup'
    ), pts AS (
      SELECT user_id, event_id, ts FROM events WHERE event_type = 'click'
    )
    SELECT p.event_id, s.session_id
    FROM pts p JOIN sessions s
      ON p.user_id = s.user_id
     AND p.ts >= s.start_ts AND p.ts <= s.end_ts
    """,
    "Range join via time-bucket banding: clicks matched into 30-minute "
    "windows after each signup. Equi-join on (key, bucket) + exact "
    "refine — per-bucket density bounds the quadratic term, vs the "
    "planner's inequality cross product; the oracle is the plain "
    "inequality join",
)
def t_range_join_banded(spark, sf_dir):
    from mcyj_datapipeline_spark.operators.temporal import (
        point_in_interval_join,
    )

    ev = _t(spark, sf_dir, "events")
    sessions = ev.filter(F.col("event_type") == "signup").select(
        "user_id",
        F.col("event_id").alias("session_id"),
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTE")).alias("end_ts"),
    )
    pts = ev.filter(F.col("event_type") == "click").select(
        "user_id", "event_id", "ts"
    )
    out = point_in_interval_join(
        pts, sessions, "user_id", "ts", "start_ts", "end_ts"
    )
    return out.select("event_id", "session_id")


@register(
    "o7_stratified_hash_sample",
    f"""
    SELECT doc_id, lang FROM documents
    WHERE {hash60_sql("doc_id::VARCHAR")} % 10000 <
          CASE lang WHEN 'en' THEN 1000 WHEN 'es' THEN 5000 ELSE 10000 END
    """,
    "Stratified deterministic sampling: per-language hash-bucket cutoffs "
    "(downsample dominant strata, keep rare ones whole) — map-side "
    "filter, no shuffle, reproducible across engines",
)
def o7_stratified_hash_sample(spark, sf_dir):
    from mcyj_datapipeline_spark.operators.sampling import (
        stratified_hash_sample,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    return stratified_hash_sample(
        docs, "lang", "doc_id", {"en": 0.1, "es": 0.5}, default_fraction=1.0
    )


@register(
    "a05_bigram_counts",
    """
    SELECT bigram, count(*) AS count FROM (
      SELECT doc_id, unnest(list_distinct(
        [array_to_string(w[i:i+1], ' ') for i in range(1, len(w))])) AS bigram
      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
      WHERE len(w) >= 2
    ) GROUP BY bigram ORDER BY count DESC, bigram LIMIT 25
    """,
    "A5 n-gram form: word-bigram document frequency, top-25 — the "
    "n-gram statistics pass of corpus analysis (shingle machinery "
    "reused from dedup)",
)
def a05_bigram_counts(spark, sf_dir):
    from mcyj_datapipeline_spark.operators.dedup import word_shingles

    docs = _t(spark, sf_dir, "documents")
    grams = docs.select(
        "doc_id", word_shingles(F.col("text"), 2).alias("grams")
    ).filter(F.size("grams") > 0)
    return (
        grams.select("doc_id", F.explode("grams").alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy(F.desc("count"), "bigram")
        .limit(25)
    )


@register(
    "mm_resize_images",
    f"""
    SELECT media_id, 32 AS out_width, 32 AS out_height,
           octet_length(content) AS src_bytes
    FROM ({_MM_BLOB_SQL})
    """,
    "Multimodal: resize plumbing (binary in → fixed-size binary out via "
    "Arrow mapInPandas); fake strided resampler, real batch/schema "
    "contract — oracle checks ids + output geometry",
)
def mm_resize_images(spark, sf_dir):
    out = MM.resize_images(_media_df(spark, sf_dir))
    return out.select(
        "media_id",
        F.col("out_width").cast("int").alias("out_width"),
        F.col("out_height").cast("int").alias("out_height"),
        "src_bytes",
    )


@register(
    "mm_audio_features",
    f"""
    SELECT media_id,
           octet_length(content) AS n_bytes,
           round(octet_length(content) / 16000.0, 6) AS duration_s,
           CAST(ceil((octet_length(content) / 16000.0) / 0.5) AS INT)
             AS n_windows
    FROM ({_MM_BLOB_SQL})
    """,
    "Multimodal: audio feature plumbing (duration + analysis windows "
    "from byte length at nominal rate) via Arrow mapInPandas; decode "
    "stubbed, arithmetic oracle-checked",
)
def mm_audio_features(spark, sf_dir):
    out = MM.extract_audio_features(_media_df(spark, sf_dir))
    return out.select(
        "media_id",
        "n_bytes",
        F.round("duration_s", 6).alias("duration_s"),
        F.col("n_windows").cast("int").alias("n_windows"),
    )


# ===========================================================================
# Dashboard aggregate capability: rollup (grouping sets) + percentiles
# ===========================================================================


@register(
    "a03_rollup_counts",
    """
    SELECT coalesce(o_orderstatus, 'ALL') AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           count(*) AS count
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    ORDER BY status, priority
    """,
    "A3 generalized: ROLLUP grouping sets (status × priority hierarchy "
    "with subtotals + grand total) — the multi-dimension form of the "
    "dashboard's one-dimension-at-a-time group-count",
)
def a03_rollup_counts(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("count"))
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias("status"),
            F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias("priority"),
            "count",
        )
        .orderBy("status", "priority")
    )


@register(
    "a13_percentiles",
    """
    SELECT o_orderpriority,
           round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
           round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
           round(quantile_cont(o_totalprice, 0.99), 4) AS p99
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    "Percentile aggregates: exact interpolated p50/p90/p99 per group "
    "(Spark percentile ≡ DuckDB quantile_cont); at 100 TB swap in "
    "approx_percentile for one-pass sketching",
)
def a13_percentiles(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90"),
            F.round(F.expr("percentile(o_totalprice, 0.99)"), 4).alias("p99"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "a04_approx_count_distinct",
    """
    SELECT count(DISTINCT user_id) AS n_users_exact,
           count(DISTINCT event_type) AS n_types_exact,
           true AS users_within_tol,
           true AS types_within_tol
    FROM events
    """,
    # value-oracled since round 5 via the q1b ε-floor contract: the HLL
    # register values are engine-specific, so the query returns the
    # EXACT twin's counts plus booleans asserting the sketch lies
    # within 3x its configured rsd (0.02 -> 6%, absolute slack 2 for
    # tiny cardinalities like event_type). The hash compare fails if
    # the sketch ever drifts out of bound. The exact countDistinct here
    # is the validation harness, not the scale path — production
    # cardinality uses the sketch alone (a04_count_distinct carries the
    # plain exact form).
    "A4 scale form: approx_count_distinct (HyperLogLog++) — one-pass "
    "mergeable sketch checked in-query against the exact count with an "
    "ε-floor; at 100 TB the exact countDistinct's global dedup shuffle "
    "becomes the bottleneck this replaces",
)
def a04_approx_count_distinct(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")

    def within(approx, exact):
        return F.abs(approx - exact) <= F.greatest(
            exact * 0.06, F.lit(2.0)
        )

    agg = ev.agg(
        F.countDistinct("user_id").alias("_ue"),
        F.countDistinct("event_type").alias("_te"),
        F.approx_count_distinct("user_id", 0.02).alias("_ua"),
        F.approx_count_distinct("event_type", 0.02).alias("_ta"),
    )
    return agg.select(
        F.col("_ue").alias("n_users_exact"),
        F.col("_te").alias("n_types_exact"),
        within(F.col("_ua"), F.col("_ue")).alias("users_within_tol"),
        within(F.col("_ta"), F.col("_te")).alias("types_within_tol"),
    )


# ===========================================================================
# Batch 4 (round-1 continuation): dedup clustering, pivot, write round-trip
# ===========================================================================

from mcyj_datapipeline_spark.operators import dedup as _D4
from mcyj_datapipeline_spark.registry import _minhash_oracle_sql as _mh_sql


def _cluster_oracle_sql() -> str:
    # Connected components in SQL: seed every endpoint with itself, then
    # transitively propagate reachable ids (semi-naive via recursive
    # UNION's dedup); min reachable id == the cluster's canonical id.
    return f"""
    WITH RECURSIVE edges AS (
      SELECT id_a, id_b FROM ({_mh_sql()})
    ), und AS (
      SELECT id_a AS u, id_b AS v FROM edges
      UNION
      SELECT id_b AS u, id_a AS v FROM edges
    ), walk(node, comp) AS (
      SELECT u, u FROM und
      UNION
      SELECT und.v, walk.comp FROM walk JOIN und ON und.u = walk.node
    )
    SELECT node AS doc_id, min(comp) AS cluster_id FROM walk GROUP BY node
    """


@register(
    "dedup_cluster_components",
    _cluster_oracle_sql(),
    "Dedup/clusters: connected components over MinHash-LSH candidate "
    "pairs (iterative min-label propagation, one shuffle join per round, "
    "O(cluster diameter) rounds) — turns pairwise near-dup hits into "
    "whole duplicate groups with a canonical keep-id",
)
def dedup_cluster_components(spark, sf_dir):
    pairs = _D4.minhash_lsh_pairs(
        _t(spark, sf_dir, "documents"), jaccard_threshold=0.8
    )
    return _D4.connected_components(pairs, "id_a", "id_b")


_PRIORITIES = [
    ("1-URGENT", "p1_urgent"),
    ("2-HIGH", "p2_high"),
    ("3-MEDIUM", "p3_medium"),
    ("4-NOT SPECIFIED", "p4_not_specified"),
    ("5-LOW", "p5_low"),
]


def _pivot_oracle_sql() -> str:
    cells = ",\n           ".join(
        f"count(*) FILTER (o_orderpriority = '{v}') AS {a}"
        for v, a in _PRIORITIES
    )
    return f"""
    SELECT o_orderstatus AS status,
           {cells}
    FROM orders GROUP BY o_orderstatus
    """


@register(
    "a03_pivot_status_priority",
    _pivot_oracle_sql(),
    "A3 pivot form: status × priority count matrix via pivot() with an "
    "EXPLICIT value list — skips the extra distinct-collect job Spark "
    "otherwise runs to discover pivot columns; single shuffle, map-side "
    "partial agg",
)
def a03_pivot_status_priority(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    wide = (
        orders.groupBy(F.col("o_orderstatus").alias("status"))
        .pivot("o_orderpriority", [v for v, _ in _PRIORITIES])
        .count()
    )
    # pivot-count leaves NULL (not 0) in empty cells; match SQL's count=0
    return wide.select(
        "status",
        *[
            F.coalesce(F.col(f"`{v}`"), F.lit(0)).alias(a)
            for v, a in _PRIORITIES
        ],
    )


@register(
    "o4_partitioned_write_roundtrip",
    """
    SELECT o_orderpriority AS priority,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS sum_price
    FROM orders
    WHERE o_orderstatus = 'F'
    GROUP BY o_orderpriority
    """,
    "O4/W write path: hive-partitioned parquet write (partitionBy status) "
    "+ read-back with a partition-column filter — the read scan must "
    "show PartitionFilters (pruned directory listing), not a data-file "
    "filter; proves the sink/ingest round trip inside the driver gate",
)
def o4_partitioned_write_roundtrip(spark, sf_dir):
    import os
    import tempfile

    orders = _t(spark, sf_dir, "orders")
    out = os.path.join(_session_scratch("roundtrip"), "data")
    # per-process scratch + overwrite mode: repeated runs in one driver
    # reuse ONE copy; concurrent sessions get disjoint dirs
    (
        orders.write.mode("overwrite")
        .partitionBy("o_orderstatus")
        .parquet(out)
    )
    back = spark.read.parquet(out)
    return (
        back.filter(F.col("o_orderstatus") == "F")
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
    )


from pyspark.sql import Window as _W


@register(
    "w4_rolling_range_sum",
    """
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
             RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW), 2) AS rolling_7d
    FROM orders
    """,
    "W4: rolling 7-day revenue per customer — value-based RANGE frame "
    "over epoch seconds (frame membership is by value, so same-timestamp "
    "ties contribute identically in both engines); one shuffle on the "
    "partition key, sort within partitions only",
)
def w4_rolling_range_sum(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    w = (
        _W.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").cast("timestamp").cast("long"))
        .rangeBetween(-7 * 86400, 0)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("rolling_7d"),
    )


# W5 ntile exhibit — RETIRED from the registry (round 4): with
# w5b_decile_by_cutpoints oracle-proven equivalent on bucketing, the
# registry now contains ZERO single-reducer sorts, even fenced ones.
# The function + its DuckDB twin live on as a pytest-only parity check
# (tests/test_oracle_parity.py::test_w5_ntile_exhibit_parity) that
# keeps validating w5b's cutpoint bucketing against the ntile ground
# truth. The unpartitioned ORDER BY here is exactly the plan shape the
# registry-wide window gate forbids on scale paths.
W5_NTILE_EXHIBIT_SQL = """
    WITH d AS (
      SELECT ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile,
             o_totalprice
      FROM orders
    )
    SELECT decile, count(*) AS n,
           round(min(o_totalprice), 2) AS lo,
           round(max(o_totalprice), 2) AS hi
    FROM d GROUP BY decile
    """


def w5_ntile_deciles(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    w = _W.orderBy("o_totalprice", "o_orderkey")
    return (
        orders.select(
            F.ntile(10).over(w).alias("decile"), "o_totalprice"
        )
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
    )


@register(
    "text_tfidf_top_terms",
    """
    WITH toks AS (
      SELECT doc_id, unnest(list_filter(string_split_regex(text, '\\s+'),
                                        t -> t <> '')) AS term
      FROM documents
    ), tf AS (
      SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2
    ), idf AS (
      SELECT term, count(*) AS df FROM tf GROUP BY 1
    )
    SELECT doc_id, term, tf, df
    FROM (
      SELECT t.doc_id, t.term, t.tf, i.df,
             row_number() OVER (PARTITION BY t.doc_id
                                ORDER BY t.tf DESC, i.df, t.term) AS rn
      FROM tf t JOIN idf i ON t.term = i.term
    ) WHERE rn <= 3
    """,
    "Text analysis/TF-IDF: top-3 salient terms per doc ranked by "
    "(tf desc, document-frequency asc) — the integer-exact ordering of "
    "tf·idf for fixed tf (idf monotone-decreasing in df), so the rank is "
    "bit-stable with no float ln() in the compare. Two shuffles: "
    "doc-term tf groupBy, then term df groupBy joined back",
)
def text_tfidf_top_terms(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(TA.tokens(F.col("text"))).alias("term")
    )
    # tf feeds BOTH the idf aggregate and the join left side, and the
    # executed plan tokenizes the corpus twice (no ReusedExchange
    # across the aggregate). Pinning tf was A/B-measured and REJECTED:
    # materializing the (doc, term, tf) relation costs more than the
    # second codegen tokenize pass (sf1 warm min 3.48 s plain vs
    # 4.70 s pinned; sf0.1 a wash — SCALE.md r12 adjudication).
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    idf = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    w = _W.partitionBy("doc_id").orderBy(
        F.desc("tf"), F.asc("df"), F.asc("term")
    )
    return (
        tf.join(idf, "term")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "term", "tf", "df")
    )


from mcyj_datapipeline_spark.operators import skew as _SK


@register(
    "j15_salted_skew_join",
    """
    SELECT o_orderpriority AS priority,
           count(*) AS n_items,
           round(sum(l_extendedprice), 2) AS sum_price
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
    "J15 skew path: salted equi-join — big side salted on a secondary "
    "column, small side replicated n_salt times, join on (key, salt); "
    "result provably identical to the plain join (the oracle), row "
    "placement spread so one hot key cannot overflow a task",
)
def j15_salted_skew_join(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    joined = _SK.salted_join(li, orders, "l_orderkey", "l_linenumber")
    return joined.groupBy(
        F.col("o_orderpriority").alias("priority")
    ).agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
    )


@register(
    "u1_union_by_name_evolution",
    """
    WITH legacy AS (
      SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 2 = 0
    ), current AS (
      SELECT o_orderkey, o_totalprice, o_orderpriority
      FROM orders WHERE o_orderkey % 2 = 1
    ), unioned AS (
      SELECT * FROM legacy UNION ALL BY NAME SELECT * FROM current
    )
    SELECT coalesce(o_orderpriority, 'MISSING') AS priority,
           count(*) AS n,
           round(sum(o_totalprice), 2) AS sum_price
    FROM unioned GROUP BY 1
    """,
    "U1 schema evolution: unionByName(allowMissingColumns) merges "
    "batches whose schemas drifted (old files lack the new column -> "
    "NULL), the parquet-mergeSchema situation handled declaratively; "
    "no shuffle for the union itself, columns aligned by NAME not "
    "position",
)
def u1_union_by_name_evolution(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    legacy = orders.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_totalprice"
    )
    current = orders.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    unioned = legacy.unionByName(current, allowMissingColumns=True)
    return unioned.groupBy(
        F.coalesce("o_orderpriority", F.lit("MISSING")).alias("priority")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
    )


@register(
    "d1_date_spine_gap_fill",
    """
    WITH daily AS (
      SELECT o_orderdate::DATE AS day, count(*) AS n_orders
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1995-01-01'
        AND o_orderdate < TIMESTAMP '1995-03-01'
      GROUP BY 1
    ), spine AS (
      SELECT unnest(generate_series(DATE '1995-01-01', DATE '1995-02-28',
                                    INTERVAL 1 DAY))::DATE AS day
    )
    SELECT s.day, coalesce(d.n_orders, 0) AS n_orders
    FROM spine s LEFT JOIN daily d ON s.day = d.day
    """,
    "D1 gap fill: generated date spine (sequence + explode — no "
    "driver-side loop) left-joined to daily counts, missing days "
    "zero-filled; the time-series densification every dashboard rollup "
    "needs. Spine is tiny -> broadcast side of the join",
)
def d1_date_spine_gap_fill(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    daily = (
        orders.filter(
            (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1995-03-01").cast("timestamp"))
        )
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("1995-01-01").cast("date"),
                F.lit("1995-02-28").cast("date"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("day")
    )
    return spine.join(daily, "day", "left").select(
        "day", F.coalesce("n_orders", F.lit(0)).alias("n_orders")
    )


@register(
    "w6_lag_delta",
    """
    WITH daily AS (
      SELECT o_orderpriority AS priority, o_orderdate::DATE AS day,
             round(sum(o_totalprice), 2) AS revenue
      FROM orders GROUP BY 1, 2
    )
    SELECT priority, day, revenue,
           round(revenue - lag(revenue) OVER (
             PARTITION BY priority ORDER BY day), 2) AS delta
    FROM daily
    """,
    "W6: lag-based day-over-day revenue delta per priority — the "
    "period-over-period comparison; one shuffle on the partition key, "
    "lag is a narrow in-partition pass",
)
def w6_lag_delta(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderdate").cast("date").alias("day"),
    ).agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    w = _W.partitionBy("priority").orderBy("day")
    return daily.select(
        "priority",
        "day",
        "revenue",
        F.round(
            F.col("revenue") - F.lag("revenue").over(w), 2
        ).alias("delta"),
    )


@register(
    "a14_unpivot_melt",
    """
    SELECT l_orderkey, l_linenumber, 'quantity' AS measure,
           l_quantity AS value FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'extendedprice', l_extendedprice
    FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'discount', l_discount FROM lineitem
    """,
    "A14 unpivot: wide -> long melt via stack() — the inverse of pivot, "
    "narrow (no shuffle), values pass through bit-exact",
)
def a14_unpivot_melt(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.selectExpr(
        "l_orderkey",
        "l_linenumber",
        "stack(3, 'quantity', l_quantity, "
        "'extendedprice', l_extendedprice, "
        "'discount', l_discount) AS (measure, value)",
    )


@register(
    "x2_levenshtein_fuzzy_match",
    """
    SELECT a.s_suppkey AS key_a, b.s_suppkey AS key_b,
           levenshtein(a.s_name, b.s_name) AS dist
    FROM supplier a JOIN supplier b
      ON a.s_nationkey = b.s_nationkey AND a.s_suppkey < b.s_suppkey
    WHERE levenshtein(a.s_name, b.s_name) <= 2
    """,
    "X2 fuzzy entity matching: edit-distance pairs within a blocking "
    "key (nation) — blocked self-join bounds the quadratic term to "
    "block size, the facility-name reconciliation shape; at 100 TB "
    "block on a cheaper canopy (prefix/phonetic/minhash bucket) first",
)
def x2_levenshtein_fuzzy_match(spark, sf_dir):
    sup = _t(spark, sf_dir, "supplier")
    a = sup.select(
        F.col("s_suppkey").alias("key_a"),
        F.col("s_name").alias("name_a"),
        F.col("s_nationkey").alias("nk"),
    )
    b = sup.select(
        F.col("s_suppkey").alias("key_b"),
        F.col("s_name").alias("name_b"),
        F.col("s_nationkey").alias("nk"),
    )
    return (
        a.join(b, "nk")
        .filter(F.col("key_a") < F.col("key_b"))
        .withColumn("dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("dist") <= 2)
        .select("key_a", "key_b", "dist")
    )


@register(
    "i1_mergeable_partial_aggs",
    """
    SELECT o_orderpriority AS priority,
           count(*) AS n,
           round(sum(o_totalprice), 2) AS total,
           round(min(o_totalprice), 2) AS lo,
           round(max(o_totalprice), 2) AS hi,
           round(sum(o_totalprice) / count(*), 6) AS mean
    FROM orders GROUP BY 1
    """,
    "I1 incremental rollup: per-batch PARTIAL aggregates (count/sum/"
    "min/max are mergeable semigroups) unioned and re-merged — provably "
    "equal to the direct aggregate (the oracle). This is how a 100 TB "
    "rollup stays incremental: persist partials per ingest batch, merge "
    "on read, never rescan history; avg derives from merged sum/count",
)
def i1_mergeable_partial_aggs(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    # three simulated ingest batches
    partials = [
        orders.filter(F.col("o_orderkey") % 3 == i)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("o_totalprice").alias("total"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
        for i in range(3)
    ]
    merged = partials[0].unionByName(partials[1]).unionByName(partials[2])
    return merged.groupBy(
        F.col("o_orderpriority").alias("priority")
    ).agg(
        F.sum("n").alias("n"),
        F.round(F.sum("total"), 2).alias("total"),
        F.round(F.min("lo"), 2).alias("lo"),
        F.round(F.max("hi"), 2).alias("hi"),
        F.round(F.sum("total") / F.sum("n"), 6).alias("mean"),
    )


@register(
    "w5b_decile_by_cutpoints",
    """
    WITH cps AS (
      SELECT [round(quantile_cont(o_totalprice, 0.1), 4),
              round(quantile_cont(o_totalprice, 0.2), 4),
              round(quantile_cont(o_totalprice, 0.3), 4),
              round(quantile_cont(o_totalprice, 0.4), 4),
              round(quantile_cont(o_totalprice, 0.5), 4),
              round(quantile_cont(o_totalprice, 0.6), 4),
              round(quantile_cont(o_totalprice, 0.7), 4),
              round(quantile_cont(o_totalprice, 0.8), 4),
              round(quantile_cont(o_totalprice, 0.9), 4)] AS cp
      FROM orders
    )
    SELECT 1 + len(list_filter(cps.cp, c -> c < o.o_totalprice)) AS decile,
           count(*) AS n,
           round(sum(o.o_totalprice), 2) AS sum_price
    FROM orders o CROSS JOIN cps
    GROUP BY 1
    """,
    "W5 scale path: decile assignment via BROADCAST cutpoints instead "
    "of a global sort — one aggregate computes the 9 quantile cutpoints "
    "(rounded identically on both engines so boundary doubles are "
    "bit-equal), broadcast to every row, bucket = #cutpoints below the "
    "value. No single-reducer window; at 100 TB swap the exact "
    "percentile for approx_percentile and nothing else changes",
)
def w5b_decile_by_cutpoints(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    cps = orders.agg(
        F.expr(
            "transform(percentile(o_totalprice, "
            "array(0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9)), "
            "c -> round(c, 4))"
        ).alias("cp")
    )
    return (
        orders.crossJoin(F.broadcast(cps))
        .select(
            (
                F.lit(1)
                + F.size(
                    F.filter(
                        F.col("cp"), lambda c: c < F.col("o_totalprice")
                    )
                )
            ).alias("decile"),
            "o_totalprice",
        )
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
    )


@register(
    "a15_regr_slope_trend",
    """
    WITH daily AS (
      SELECT o_orderpriority AS priority,
             epoch(o_orderdate) / 86400.0 AS day_x,
             o_totalprice AS y
      FROM orders
    )
    SELECT priority,
           round(regr_slope(y, day_x), 6) AS slope,
           round(regr_intercept(y, day_x), 2) AS intercept,
           count(*) AS n
    FROM daily GROUP BY priority
    """,
    "A15 trend detection: per-group least-squares slope/intercept via "
    "the BUILT-IN regr_* aggregates (single-pass mergeable moments — "
    "no pandas fit loop, no second scan); the drift-monitoring shape "
    "for any metric over time",
)
def a15_regr_slope_trend(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    daily = orders.select(
        F.col("o_orderpriority").alias("priority"),
        (
            F.col("o_orderdate").cast("timestamp").cast("long") / 86400.0
        ).alias("day_x"),
        F.col("o_totalprice").alias("y"),
    )
    return daily.groupBy("priority").agg(
        F.round(F.regr_slope("y", "day_x"), 6).alias("slope"),
        F.round(F.regr_intercept("y", "day_x"), 2).alias("intercept"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "a16_argmax_per_group",
    """
    SELECT o_orderpriority AS priority, o_orderkey AS top_orderkey,
           round(o_totalprice, 2) AS top_price
    FROM orders
    QUALIFY row_number() OVER (PARTITION BY o_orderpriority
                               ORDER BY o_totalprice DESC, o_orderkey DESC) = 1
    """,
    "A16 argmax: top row per group via max(struct(price, key)) — ONE "
    "aggregate with map-side partials carrying a single struct per "
    "group, instead of a window sort over every row; ties broken by key "
    "inside the struct comparison so the result is deterministic",
)
def a16_argmax_per_group(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.max(
                F.struct(
                    F.col("o_totalprice").alias("p"),
                    F.col("o_orderkey").alias("k"),
                )
            ).alias("top")
        )
        .select(
            "priority",
            F.col("top.k").alias("top_orderkey"),
            F.round(F.col("top.p"), 2).alias("top_price"),
        )
    )


@register(
    "a17_string_agg_sorted",
    """
    SELECT n_nationkey AS nation,
           string_agg(s_name, '|' ORDER BY s_name) AS members,
           count(*) AS n_members
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    GROUP BY 1
    """,
    "A17 string aggregation: sorted member concatenation via "
    "array_sort(collect_list(...)) + array_join — the ORDER in the "
    "output is imposed AFTER collection (collect_list order is "
    "partition-nondeterministic; sorting makes it canonical)",
)
def a17_string_agg_sorted(spark, sf_dir):
    sup = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    return (
        sup.join(
            F.broadcast(nation),
            sup["s_nationkey"] == nation["n_nationkey"],
        )
        .groupBy(F.col("n_nationkey").alias("nation"))
        .agg(
            F.array_join(
                F.array_sort(F.collect_list("s_name")), "|"
            ).alias("members"),
            F.count(F.lit(1)).alias("n_members"),
        )
    )


@register(
    "dq1_null_profile",
    """
    SELECT count(*) AS n_rows,
           count(*) - count(o_custkey) AS null_custkey,
           count(*) - count(o_orderstatus) AS null_status,
           count(*) - count(o_totalprice) AS null_price,
           count(*) - count(o_orderdate) AS null_date
    FROM orders
    """,
    "DQ1 data-quality profile: per-column null counts in ONE scan "
    "(count(col) skips nulls) — the ingest-validation audit every "
    "pipeline runs before trusting a batch; no shuffle beyond the "
    "single global aggregate",
)
def dq1_null_profile(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    return orders.agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.count(F.lit(1)) - F.count("o_custkey")).alias("null_custkey"),
        (F.count(F.lit(1)) - F.count("o_orderstatus")).alias("null_status"),
        (F.count(F.lit(1)) - F.count("o_totalprice")).alias("null_price"),
        (F.count(F.lit(1)) - F.count("o_orderdate")).alias("null_date"),
    )


@register(
    "c1_cohort_retention",
    """
    WITH firsts AS (
      SELECT o_custkey,
             min(date_trunc('month', o_orderdate)) AS cohort_month
      FROM orders GROUP BY 1
    ), activity AS (
      SELECT o.o_custkey, f.cohort_month,
             (year(o.o_orderdate) * 12 + month(o.o_orderdate)) -
             (year(f.cohort_month) * 12 + month(f.cohort_month))
               AS months_since
      FROM orders o JOIN firsts f ON o.o_custkey = f.o_custkey
    )
    SELECT cohort_month::DATE AS cohort_month, months_since,
           count(DISTINCT o_custkey) AS active_customers
    FROM activity
    WHERE months_since <= 6
    GROUP BY 1, 2
    """,
    "C1 cohort retention: first-activity month per customer (one "
    "aggregate), joined back to activity, bucketed by months-since — "
    "the retention triangle. The firsts side is one row per customer "
    "(smaller than facts) and the join is on the aggregate's own "
    "partitioning key, so the shuffle is already co-located",
)
def c1_cohort_retention(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    od = F.col("o_orderdate").cast("timestamp")
    firsts = orders.groupBy("o_custkey").agg(
        F.min(F.date_trunc("month", od)).alias("cohort_month")
    )
    cm = F.col("cohort_month")
    activity = orders.join(firsts, "o_custkey").select(
        "o_custkey",
        cm,
        (
            (F.year(od) * 12 + F.month(od))
            - (F.year(cm) * 12 + F.month(cm))
        ).alias("months_since"),
    )
    return (
        activity.filter(F.col("months_since") <= 6)
        .groupBy(cm.cast("date").alias("cohort_month"), "months_since")
        .agg(F.countDistinct("o_custkey").alias("active_customers"))
    )


@register(
    "c2_event_funnel",
    """
    WITH per_user AS (
      SELECT user_id,
             min(ts) FILTER (event_type = 'view') AS t_view,
             min(ts) FILTER (event_type = 'click') AS t_click,
             min(ts) FILTER (event_type = 'purchase') AS t_purchase
      FROM events GROUP BY user_id
    )
    SELECT count(*) FILTER (t_view IS NOT NULL) AS n_view,
           count(*) FILTER (t_view < t_click) AS n_view_click,
           count(*) FILTER (t_view < t_click AND t_click < t_purchase)
             AS n_full_funnel
    FROM per_user
    """,
    "C2 funnel: ordered view->click->purchase conversion — per-user "
    "first-touch times via conditional min in ONE groupBy (no per-step "
    "self-joins; k funnel steps = k conditional aggregates in the same "
    "pass), then global stage counts",
)
def c2_event_funnel(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias(
            "t_view"
        ),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias(
            "t_click"
        ),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).alias("t_purchase"),
    )
    return per_user.agg(
        F.count(F.when(F.col("t_view").isNotNull(), 1)).alias("n_view"),
        F.count(
            F.when(F.col("t_view") < F.col("t_click"), 1)
        ).alias("n_view_click"),
        F.count(
            F.when(
                (F.col("t_view") < F.col("t_click"))
                & (F.col("t_click") < F.col("t_purchase")),
                1,
            )
        ).alias("n_full_funnel"),
    )


@register(
    "o9_orc_roundtrip",
    """
    SELECT o_orderstatus AS status, count(*) AS n,
           round(sum(o_totalprice), 2) AS sum_price
    FROM orders GROUP BY 1
    """,
    "O9 source format: ORC write + read-back (zstd), aggregated — the "
    "second columnar format behind the same scan interface; ORC scans "
    "get the same pushdown/pruning treatment as parquet in Spark",
)
def o9_orc_roundtrip(spark, sf_dir):
    import os
    import tempfile

    orders = _t(spark, sf_dir, "orders")
    out = os.path.join(_session_scratch("orc"), "data")
    # per-process scratch + overwrite mode: repeated runs in one driver
    # reuse ONE copy; concurrent sessions get disjoint dirs
    orders.write.mode("overwrite").option("compression", "zstd").orc(out)
    back = spark.read.orc(out)
    return back.groupBy(F.col("o_orderstatus").alias("status")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
    )


@register(
    "o10_jsonl_roundtrip",
    """
    SELECT n_regionkey AS region, count(*) AS n_nations,
           string_agg(n_name, ',' ORDER BY n_name) AS names
    FROM nation GROUP BY 1
    """,
    "O10 source format: JSON-lines write + schema-locked read-back "
    "(explicit schema on read — NEVER schema inference on a 100 TB "
    "path, which triggers a full extra scan), aggregated",
)
def o10_jsonl_roundtrip(spark, sf_dir):
    import os
    import tempfile

    nation = _t(spark, sf_dir, "nation")
    out = os.path.join(_session_scratch("jsonl"), "data")
    # per-process scratch + overwrite mode: repeated runs in one driver
    # reuse ONE copy; concurrent sessions get disjoint dirs
    nation.write.mode("overwrite").json(out)
    back = spark.read.schema(nation.schema).json(out)
    return back.groupBy(F.col("n_regionkey").alias("region")).agg(
        F.count(F.lit(1)).alias("n_nations"),
        F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias(
            "names"
        ),
    )


@register(
    "a18_corr_covar",
    """
    SELECT l_returnflag AS flag,
           round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
           round(covar_samp(l_quantity, l_extendedprice), 4) AS qty_price_covar,
           round(stddev_samp(l_extendedprice), 4) AS price_stddev
    FROM lineitem GROUP BY l_returnflag
    """,
    "A18 statistics: per-group Pearson correlation, sample covariance "
    "and stddev — one-pass mergeable co-moment aggregates (the same "
    "partial-merge shape as sum/count, so map-side combine applies)",
)
def a18_corr_covar(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy(F.col("l_returnflag").alias("flag")).agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias(
            "qty_price_corr"
        ),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias(
            "qty_price_covar"
        ),
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("price_stddev"),
    )


@register(
    "a03_cube_counts",
    """
    SELECT coalesce(o_orderstatus, 'ALL') AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           count(*) AS n
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    "A3 cube form: CUBE grouping sets — all 2^k dimension combinations "
    "(status-only and priority-only subtotals included) in one pass; "
    "the grouping-set expansion happens BEFORE the shuffle so partial "
    "aggregation still applies per grouping id",
)
def a03_cube_counts(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n",
        )
    )


@register(
    "e5_token_shard_packing",
    """
    WITH toks AS (
      SELECT doc_id, lang,
             len(list_filter(string_split_regex(text, '\\s+'),
                             t -> t <> '')) AS n_tokens
      FROM documents
    ), packed AS (
      SELECT doc_id, lang, n_tokens,
             sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) AS cum_tokens
      FROM toks
    )
    SELECT lang,
           ((greatest(cum_tokens, 1) - 1) // 20000)::BIGINT AS shard,
           count(*) AS n_docs, sum(n_tokens)::BIGINT AS shard_tokens
    FROM packed
    GROUP BY 1, 2
    """,
    "E5 training-shard packing: assign docs to ~20k-token shards by "
    "running token count, partitioned by language (the natural "
    "training-mix key, which also keeps every cumulative window "
    "per-partition instead of one global reducer); deterministic "
    "doc_id order so re-runs produce identical shards — the "
    "tokenize->pack step between cleaning and training",
)
def e5_token_shard_packing(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "lang",
        TA.token_count(F.col("text")).alias("n_tokens"),
    )
    w = (
        _W.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(_W.unboundedPreceding, _W.currentRow)
    )
    packed = toks.withColumn("cum_tokens", F.sum("n_tokens").over(w))
    return (
        packed.select(
            "lang",
            ((F.greatest(F.col("cum_tokens"), F.lit(1)) - 1) / 20000)
            .cast("long")
            .alias("shard"),
            "n_tokens",
        )
        .groupBy("lang", "shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("shard_tokens"),
        )
    )


@register(
    "v1_embedding_centroid_pooling",
    """
    SELECT vec_id % 4 AS grp, i AS pos,
           round(avg(embedding[i]::DOUBLE), 6) AS mean_v
    FROM embeddings, range(1, 65) t(i)
    GROUP BY 1, 2
    """,
    "V1 vector pooling: element-wise mean embedding per group "
    "(posexplode -> per-(group, dim) avg) — the centroid/mean-pooling "
    "primitive under k-means, class prototypes, and diversity "
    "sampling; shuffle carries one scalar per (group, dim), never "
    "whole vectors",
)
def v1_embedding_centroid_pooling(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    return (
        emb.select(
            (F.col("vec_id") % 4).alias("grp"),
            F.posexplode("embedding").alias("pos0", "v"),
        )
        .groupBy("grp", (F.col("pos0") + 1).alias("pos"))
        .agg(F.round(F.avg(F.col("v").cast("double")), 6).alias("mean_v"))
    )


@register(
    "a20_event_type_cooccurrence",
    """
    WITH ut AS (
      SELECT DISTINCT user_id, event_type FROM events
    )
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           count(*) AS n_users
    FROM ut a JOIN ut b
      ON a.user_id = b.user_id AND a.event_type < b.event_type
    GROUP BY 1, 2
    """,
    "A20 co-occurrence: event-type pairs per user (market-basket "
    "shape) — distinct (user, type) first so the self-join fan-out is "
    "bounded by types-per-user (≤5 here), not events-per-user; the "
    "join shuffles on user_id once",
)
def a20_event_type_cooccurrence(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    ut = ev.select("user_id", "event_type").distinct()
    a = ut.select("user_id", F.col("event_type").alias("type_a"))
    b = ut.select("user_id", F.col("event_type").alias("type_b"))
    return (
        a.join(b, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


from mcyj_datapipeline_spark.operators.hashing import (  # noqa: E402
    MINHASH_PRIME as _P,
    hash60_sql as _h60,
)


def _contamination_oracle_sql() -> str:
    h = _h60("s")
    return f"""
    WITH words AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ), sh AS (
      SELECT doc_id,
             list_distinct([{h} % {_P}
                            for s in list_distinct([array_to_string(w[i:i+2], ' ')
                                                    for i in range(1, len(w) - 1)])]) AS hs
      FROM words WHERE len(w) >= 3
    ), c AS (
      SELECT doc_id AS corpus_id, unnest(hs) AS sh FROM sh WHERE doc_id >= 10
    ), b AS (
      SELECT doc_id AS bench_id, unnest(hs) AS sh FROM sh WHERE doc_id < 10
    )
    SELECT c.corpus_id, count(DISTINCT c.sh) AS n_collisions,
           count(DISTINCT b.bench_id) AS n_bench_docs
    FROM c JOIN b ON c.sh = b.sh
    GROUP BY c.corpus_id
    HAVING count(DISTINCT c.sh) >= 2
    """


@register(
    "d2_benchmark_decontamination",
    _contamination_oracle_sql(),
    "D2 decontamination: corpus docs sharing >=2 distinct word n-grams "
    "with any benchmark doc (GPT-3-style n-gram collision test; "
    "benchmark stand-in = doc_id < 10). Both sides join on hashed "
    "shingles — text never shuffles; the benchmark side is tiny so AQE "
    "broadcasts it",
)
def d2_benchmark_decontamination(spark, sf_dir):
    from mcyj_datapipeline_spark.operators import dedup as _DD

    docs = _t(spark, sf_dir, "documents")
    return _DD.ngram_contamination(
        docs.filter(F.col("doc_id") >= 10),
        docs.filter(F.col("doc_id") < 10),
        min_collisions=2,
    )


@register(
    "j16_intersect_keys",
    """
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
    INTERSECT
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
    """,
    "J16 set op: INTERSECT — customers active in BOTH years; Spark "
    "plans intersect() as a left-semi join over distinct sets, one "
    "shuffle per side on the key",
)
def j16_intersect_keys(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    od = F.col("o_orderdate").cast("timestamp")
    y95 = orders.filter(F.year(od) == 1995).select("o_custkey")
    y96 = orders.filter(F.year(od) == 1996).select("o_custkey")
    return y95.intersect(y96)


@register(
    "sql1_shipping_priority",
    """
    SELECT o_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           o_orderdate::DATE AS odate, o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderdate < TIMESTAMP '1995-03-15'
      AND l_shipdate > TIMESTAMP '1995-03-15'
    GROUP BY o_orderkey, odate, o_orderpriority
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
    "SQL surface: TPC-H Q3 (shipping priority) submitted through "
    "spark.sql over temp views — same Catalyst plan as the DataFrame "
    "API (joins reordered, filters pushed, TakeOrderedAndProject for "
    "the top-10), proving the engine's SQL entry path end-to-end",
)
def sql1_shipping_priority(spark, sf_dir):
    for t in ("customer", "orders", "lineitem"):
        _t(spark, sf_dir, t).createOrReplaceTempView(f"sql1_{t}")
    return spark.sql(
        """
        SELECT o_orderkey,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               CAST(o_orderdate AS DATE) AS odate, o_orderpriority
        FROM sql1_customer JOIN sql1_orders ON c_custkey = o_custkey
        JOIN sql1_lineitem ON l_orderkey = o_orderkey
        WHERE o_orderdate < TIMESTAMP '1995-03-15'
          AND l_shipdate > TIMESTAMP '1995-03-15'
        GROUP BY o_orderkey, odate, o_orderpriority
        ORDER BY revenue DESC, o_orderkey
        LIMIT 10
        """
    )


@register(
    "j17_null_safe_join",
    """
    WITH x AS (
      SELECT nullif(o_orderpriority, '5-LOW') AS pk, count(*) AS n_all
      FROM orders GROUP BY 1
    ), y AS (
      SELECT nullif(o_orderpriority, '5-LOW') AS pk, count(*) AS n_f
      FROM orders WHERE o_orderstatus = 'F' GROUP BY 1
    )
    SELECT coalesce(x.pk, 'NULL_KEY') AS priority, x.n_all, y.n_f
    FROM x JOIN y ON x.pk IS NOT DISTINCT FROM y.pk
    """,
    "J17 null-safe equi-join: <=> (IS NOT DISTINCT FROM) matches NULL "
    "keys to each other — the semantics a plain equi-join silently "
    "drops; still hash-joinable (null is just another key value), "
    "unlike general non-equi predicates",
)
def j17_null_safe_join(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    pk = F.nullif(F.col("o_orderpriority"), F.lit("5-LOW")).alias("pk")
    x = orders.groupBy(pk).agg(F.count(F.lit(1)).alias("n_all"))
    y = (
        orders.filter(F.col("o_orderstatus") == "F")
        .groupBy(pk)
        .agg(F.count(F.lit(1)).alias("n_f"))
    )
    return x.join(y, x["pk"].eqNullSafe(y["pk"])).select(
        F.coalesce(x["pk"], F.lit("NULL_KEY")).alias("priority"),
        "n_all",
        "n_f",
    )


@register(
    "sql2_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(avg(l_quantity), 6) AS avg_qty,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    "SQL surface: TPC-H Q1 pricing summary submitted through spark.sql "
    "— the aggregate path of the SQL entry (partial aggregation map-side, "
    "one shuffle on the 2-column group key), twin of the DataFrame-API "
    "a01_pricing_summary",
)
def sql2_pricing_summary(spark, sf_dir):
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("sql2_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               round(avg(l_quantity), 6) AS avg_qty,
               count(*) AS count_order
        FROM sql2_lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
        """
    )


@register(
    "sql3_grouping_sets",
    """
    SELECT coalesce(o_orderstatus, 'ALL') AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS total_value
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                            (o_orderstatus), ())
    """,
    "SQL surface: GROUPING SETS through spark.sql — detail, per-status "
    "subtotal, and grand total in ONE pass (Spark plans an Expand node: "
    "each input row fans out once per grouping set, then a single "
    "aggregate shuffle — no N-pass union of separate groupBys)",
)
def sql3_grouping_sets(spark, sf_dir):
    _t(spark, sf_dir, "orders").createOrReplaceTempView("sql3_orders")
    return spark.sql(
        """
        SELECT coalesce(o_orderstatus, 'ALL') AS status,
               coalesce(o_orderpriority, 'ALL') AS priority,
               count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS total_value
        FROM sql3_orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                (o_orderstatus), ())
        """
    )


@register(
    "sql4_window_top_customers",
    """
    SELECT * FROM (
      SELECT c_mktsegment, c_custkey,
             round(sum(o_totalprice), 2) AS revenue,
             rank() OVER (PARTITION BY c_mktsegment
                          ORDER BY round(sum(o_totalprice), 2) DESC,
                                   c_custkey) AS rnk
      FROM customer JOIN orders ON c_custkey = o_custkey
      GROUP BY c_mktsegment, c_custkey
    ) WHERE rnk <= 3
    """,
    "SQL surface: aggregate + ranked window through spark.sql — top-3 "
    "customers by revenue per market segment. Window is PARTITIONED by "
    "segment (parallel per-partition sort, never a single-reducer global "
    "sort); rank over the aggregate needs no second shuffle when the "
    "grouping already co-located the segment",
)
def sql4_window_top_customers(spark, sf_dir):
    _t(spark, sf_dir, "customer").createOrReplaceTempView("sql4_customer")
    _t(spark, sf_dir, "orders").createOrReplaceTempView("sql4_orders")
    return spark.sql(
        """
        SELECT * FROM (
          SELECT c_mktsegment, c_custkey,
                 round(sum(o_totalprice), 2) AS revenue,
                 rank() OVER (PARTITION BY c_mktsegment
                              ORDER BY round(sum(o_totalprice), 2) DESC,
                                       c_custkey) AS rnk
          FROM sql4_customer JOIN sql4_orders ON c_custkey = o_custkey
          GROUP BY c_mktsegment, c_custkey
        ) WHERE rnk <= 3
        """
    )


# ===========================================================================
# Round 2 training-data additions: sequence chunking, balanced sampling,
# embedding quantization, entropy quality signal, vocabulary coverage
# ===========================================================================


@register(
    "text_chunk_windows",
    """
    SELECT doc_id, chunk_idx,
           array_to_string(w[(chunk_idx*8)+1:(chunk_idx*8)+16], ' ') AS chunk,
           len(w[(chunk_idx*8)+1:(chunk_idx*8)+16]) AS n_tokens
    FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         LATERAL (SELECT unnest(generate_series(
             0, greatest(0, (len(w) - 16 + 7) // 8))) AS chunk_idx)
    """,
    "Training-sequence prep: sliding-window chunking (16-token windows, "
    "stride 8) — tokenize once, sequence+explode+slice all inside "
    "codegen, text never re-tokenized per chunk",
)
def text_chunk_windows(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return TA.chunk_documents(docs, chunk_size=16, stride=8)


@register(
    "o9_sample_n_per_key",
    """
    SELECT doc_id, source FROM documents
    QUALIFY row_number() OVER (
        PARTITION BY source ORDER BY md5(doc_id::VARCHAR), doc_id) <= 5
    """,
    "O7 flavor, balanced: deterministic n-per-key sampling by md5-hash "
    "order — caps a dominant source so one crawl domain cannot swamp "
    "the training mixture; md5 is engine-portable (reproducible across "
    "Spark, DuckDB, anything)",
)
def o9_sample_n_per_key(spark, sf_dir):
    from mcyj_datapipeline_spark.operators.sampling import sample_n_per_key

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    return sample_n_per_key(docs, "source", 5, "doc_id")


@register(
    "v2_embedding_quantization",
    """
    SELECT vec_id,
           round(sqrt(list_sum(list_transform(e, x -> x*x))), 5) AS l2,
           round(scale, 5) AS scale,
           round(list_sum(list_transform(
               e, x -> abs(x - round(x*scale)/scale))) / len(e), 6
           ) AS mean_abs_err
    FROM (
      SELECT vec_id, e,
             CASE WHEN mx = 0 THEN 1.0 ELSE 127.0 / mx END AS scale
      FROM (SELECT vec_id, embedding::DOUBLE[] AS e,
                   list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) AS mx
            FROM embeddings)
    )
    """,
    "Embedding int8 quantization round trip: symmetric scale = "
    "127/max|x|, mean |x - dequant(quant(x))| per vector — 4x smaller "
    "storage/shuffle payload for ~0.3% error; quantize at ingest, "
    "dequantize only at scoring",
)
def v2_embedding_quantization(spark, sf_dir):
    from mcyj_datapipeline_spark.operators.similarity import (
        dequantize_int8,
        norm,
        quantize_int8,
    )

    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    q = emb.withColumn("qs", quantize_int8(F.col("e")))
    deq = dequantize_int8(F.col("qs"))
    err = F.aggregate(
        F.zip_with(F.col("e"), deq, lambda a, b: F.abs(a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    ) / F.size("e")
    return q.select(
        "vec_id",
        F.round(norm(F.col("e")), 5).alias("l2"),
        F.round(F.col("qs.scale"), 5).alias("scale"),
        F.round(err, 6).alias("mean_abs_err"),
    )


@register(
    "text_char_entropy",
    """
    WITH chars AS (
      SELECT doc_id, unnest(regexp_split_to_array(text, '')) AS ch,
             len(regexp_split_to_array(text, '')) AS n
      FROM documents WHERE doc_id < 500
    ), hist AS (
      SELECT doc_id, ch, any_value(n) AS n, count(*)::DOUBLE AS c
      FROM chars GROUP BY doc_id, ch
    )
    SELECT doc_id, round(-sum((c/n) * log2(c/n)), 6) + 0.0 AS entropy
    FROM hist GROUP BY doc_id
    """,
    "Quality signal: per-document character-level Shannon entropy "
    "(bits/char) — the cheap perplexity proxy; binary junk and "
    "repeated-char spam score low. Map-side aggregate over the char "
    "histogram, no per-character shuffle",
)
def text_char_entropy(spark, sf_dir):
    docs = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 500)
        .select("doc_id", "text")
    )
    return docs.select(
        "doc_id",
        (F.round(TA.char_entropy(F.col("text")), 6) + F.lit(0.0)).alias(
            "entropy"
        ),
    )


@register(
    "text_vocab_coverage",
    """
    WITH counts AS (
      SELECT tok, count(*)::BIGINT AS c
      FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
      GROUP BY tok
    ), top AS (
      SELECT c FROM counts ORDER BY c DESC, tok LIMIT 100
    )
    SELECT (SELECT count(*) FROM counts) AS vocab_size,
           (SELECT sum(c) FROM counts)::BIGINT AS total_tokens,
           round((SELECT sum(c) FROM top)::DOUBLE /
                 (SELECT sum(c) FROM counts), 6) AS coverage_top100
    """,
    "Vocabulary coverage: fraction of all token occurrences covered by "
    "the 100 most frequent tokens. Scale-safe shape: token counts via "
    "one explode+groupBy, top-100 via TakeOrderedAndProject (never a "
    "global sort or unpartitioned window), scalar cross join at the end",
)
def text_vocab_coverage(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    totals = counts.agg(
        F.count(F.lit(1)).alias("vocab_size"),
        F.sum("c").alias("total_tokens"),
    )
    top = counts.orderBy(F.desc("c"), "tok").limit(100).agg(
        F.sum("c").alias("top_c")
    )
    return totals.crossJoin(top).select(
        "vocab_size",
        "total_tokens",
        F.round(F.col("top_c").cast("double") / F.col("total_tokens"), 6).alias(
            "coverage_top100"
        ),
    )


@register(
    "e6_dedup_corpus_rewrite",
    f"""
    WITH RECURSIVE edges AS (
      SELECT id_a, id_b FROM ({_mh_sql()})
    ), und AS (
      SELECT id_a AS u, id_b AS v FROM edges
      UNION
      SELECT id_b AS u, id_a AS v FROM edges
    ), walk(node, comp) AS (
      SELECT u, u FROM und
      UNION
      SELECT und.v, walk.comp FROM walk JOIN und ON und.u = walk.node
    ), clusters AS (
      SELECT node AS doc_id, min(comp) AS cluster_id FROM walk GROUP BY node
    ), sizes AS (
      SELECT cluster_id, count(*)::BIGINT AS n_members
      FROM clusters GROUP BY cluster_id
    )
    SELECT d.doc_id, d.source,
           coalesce(s.n_members, 1) AS n_members
    FROM documents d
    LEFT JOIN clusters c ON d.doc_id = c.doc_id
    LEFT JOIN sizes s ON coalesce(c.cluster_id, d.doc_id) = s.cluster_id
    WHERE coalesce(c.cluster_id, d.doc_id) = d.doc_id
    """,
    "E6 end-to-end corpus dedup-rewrite: MinHash-LSH candidate pairs -> "
    "connected components -> keep ONLY each cluster's canonical (min-id) "
    "doc, annotated with how many near-dups it absorbed. The full "
    "training-corpus dedup pass: every stage is the bucketed/banded "
    "shape (no all-pairs anywhere), the final rewrite is a left join + "
    "canonical filter on the cluster map, which is tiny relative to the "
    "corpus (only docs that HAD a near-dup appear in it)",
)
def e6_dedup_corpus_rewrite(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    pairs = _D4.minhash_lsh_pairs(docs, jaccard_threshold=0.8)
    clusters = _D4.connected_components(pairs, "id_a", "id_b")
    sizes = clusters.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_members")
    )
    return (
        docs.select("doc_id", "source")
        .join(clusters.withColumnRenamed("cluster_id", "_cl"), "doc_id", "left")
        .withColumn("_cl", F.coalesce(F.col("_cl"), F.col("doc_id")))
        .filter(F.col("doc_id") == F.col("_cl"))
        .join(sizes, F.col("_cl") == sizes["cluster_id"], "left")
        .select(
            "doc_id",
            "source",
            F.coalesce("n_members", F.lit(1)).alias("n_members"),
        )
    )


@register(
    "o10_mixture_resample",
    f"""
    WITH counts AS (
      SELECT lang, count(*)::DOUBLE AS c FROM documents GROUP BY lang
    ), tgt(lang, t) AS (
      SELECT * FROM (VALUES ('en', 0.4), ('zh', 0.2), ('es', 0.2),
                            ('de', 0.1), ('fr', 0.1))
    ), j AS (
      SELECT counts.lang, c, t FROM counts JOIN tgt ON counts.lang = tgt.lang
    ), n AS (
      SELECT min(c / t) AS n_out FROM j
    ), rates AS (
      SELECT lang, least(1.0, (n_out * t) / c) AS rate FROM j, n
    )
    SELECT d.doc_id, d.lang FROM documents d
    JOIN rates r ON d.lang = r.lang
    WHERE {_h60("d.doc_id::VARCHAR")} % 10000 < r.rate * 10000
    """,
    "O7/training-mixture form: rebalance the corpus to target language "
    "proportions (en .4 / zh .2 / es .2 / de .1 / fr .1) — the largest "
    "output with those shares, no upsampling. Per-stratum counts are a "
    "stratum-sized collect; the resample itself is a map-side "
    "deterministic hash filter, zero corpus shuffle",
)
def o10_mixture_resample(spark, sf_dir):
    from mcyj_datapipeline_spark.operators.sampling import mixture_resample

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    return mixture_resample(
        docs,
        "lang",
        "doc_id",
        {"en": 0.4, "zh": 0.2, "es": 0.2, "de": 0.1, "fr": 0.1},
    )


@register(
    "dedup_incremental_minhash",
    f"""
    SELECT id_b AS new_id, id_a AS existing_id, jaccard
    FROM ({_mh_sql()})
    WHERE id_a < 400 AND id_b >= 400
    """,
    "Incremental near-dup screening: NEW batch (doc_id >= 400) banded "
    "against the EXISTING corpus (doc_id < 400) only — never existing x "
    "existing, which was screened when those docs arrived. Per-batch "
    "cost is batch-sized, not corpus-sized; at scale the existing side's "
    "signature relation is persisted, not recomputed (oracle: the full "
    "pair set restricted to cross-side pairs — identical by "
    "construction, since signatures are per-doc)",
)
def dedup_incremental_minhash(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return _D4.minhash_lsh_pairs_incremental(
        docs.filter(F.col("doc_id") >= 400),
        docs.filter(F.col("doc_id") < 400),
        jaccard_threshold=0.8,
    )


@register(
    "o11_range_clustered_write",
    """
    SELECT l_returnflag, count(*) AS n, round(sum(l_quantity), 2) AS qty
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01'
      AND l_shipdate < TIMESTAMP '1995-04-01'
    GROUP BY l_returnflag
    """,
    "K3 scale layout: range-clustered parquet write (repartitionByRange "
    "+ sortWithinPartitions on l_shipdate) + read-back with a date-range "
    "predicate — each file owns a disjoint shipdate range, so the footer "
    "min/max stats prune non-overlapping files before any IO (verified "
    "structurally in test_range_clustered_files_disjoint)",
)
def o11_range_clustered_write(spark, sf_dir):
    import os
    import tempfile

    from mcyj_datapipeline_spark.io import write_range_clustered

    li = _t(spark, sf_dir, "lineitem").select(
        "l_shipdate", "l_returnflag", "l_quantity"
    )
    out = os.path.join(_session_scratch("rangecluster"), "data")
    # per-process scratch + overwrite mode: repeated runs in one driver
    # reuse ONE copy; concurrent sessions get disjoint dirs
    write_range_clustered(li, out, ["l_shipdate"], n_files=8)
    back = spark.read.parquet(out)
    return (
        back.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1995-04-01").cast("timestamp"))
        )
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("qty"),
        )
    )


@register(
    "dq1_expectations_report",
    """
    SELECT 'o_nonpositive_price' AS rule,
           (count(*) FILTER (o_totalprice <= 0))::BIGINT AS n_violations,
           count(*)::BIGINT AS n_rows
    FROM orders
    UNION ALL
    SELECT 'o_null_date',
           (count(*) FILTER (o_orderdate IS NULL))::BIGINT, count(*)::BIGINT
    FROM orders
    UNION ALL
    SELECT 'o_bad_status',
           (count(*) FILTER (o_orderstatus NOT IN ('F','O','P')))::BIGINT,
           count(*)::BIGINT
    FROM orders
    UNION ALL
    SELECT 'o_orphan_custkey',
           (SELECT count(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey))::BIGINT,
           (SELECT count(*) FROM orders)::BIGINT
    """,
    "DQ expectations audit: null/range/set-membership rules collapse "
    "into ONE aggregate pass over orders (conditional counts, no "
    "per-rule scans); the referential rule is an anti-join that "
    "shuffles keys only. The report a pipeline runs before promoting "
    "a batch",
)
def dq1_expectations_report(spark, sf_dir):
    from mcyj_datapipeline_spark.operators.quality import (
        expectations_report,
        referential_violations,
    )

    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    row_rules = expectations_report(
        orders,
        [
            ("o_nonpositive_price", F.col("o_totalprice") <= 0),
            ("o_null_date", F.col("o_orderdate").isNull()),
            ("o_bad_status", ~F.col("o_orderstatus").isin("F", "O", "P")),
        ],
    )
    ref_rule = referential_violations(
        orders, customer, "o_custkey", "c_custkey", "o_orphan_custkey"
    )
    return row_rules.unionByName(ref_rule)


@register(
    "q1_winsorized_stats",
    """
    WITH cuts AS (
      SELECT quantile_cont(o_totalprice, 0.01) AS p01,
             quantile_cont(o_totalprice, 0.99) AS p99
      FROM orders
    )
    SELECT round(p01, 2) AS p01, round(p99, 2) AS p99,
           round(avg(least(greatest(o_totalprice, p01), p99)), 4) AS mean_clipped,
           round(min(least(greatest(o_totalprice, p01), p99)), 2) AS min_clipped,
           round(max(least(greatest(o_totalprice, p01), p99)), 2) AS max_clipped
    FROM orders, cuts
    GROUP BY p01, p99
    """,
    "Outlier treatment for numeric quality signals: winsorize to the "
    "[p1, p99] band. Percentiles are ONE tiny row broadcast back over "
    "the fact scan (exact here to match the oracle; swap "
    "percentile -> approx_percentile at 100 TB for a mergeable sketch "
    "— same plan shape, the scale twin pattern)",
)
def q1_winsorized_stats(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    cuts = orders.agg(
        F.expr("percentile(o_totalprice, 0.01)").alias("p01"),
        F.expr("percentile(o_totalprice, 0.99)").alias("p99"),
    )
    clipped = F.least(
        F.greatest(F.col("o_totalprice"), F.col("p01")), F.col("p99")
    )
    return (
        orders.crossJoin(F.broadcast(cuts))
        .agg(
            F.round(F.first("p01"), 2).alias("p01"),
            F.round(F.first("p99"), 2).alias("p99"),
            F.round(F.avg(clipped), 4).alias("mean_clipped"),
            F.round(F.min(clipped), 2).alias("min_clipped"),
            F.round(F.max(clipped), 2).alias("max_clipped"),
        )
    )


@register(
    "dq2_key_skew_report",
    """
    WITH counts AS (
      SELECT o_custkey, count(*)::BIGINT AS n FROM orders GROUP BY o_custkey
    ), total AS (
      SELECT sum(n)::BIGINT AS total_rows, count(*)::BIGINT AS n_keys
      FROM counts
    )
    SELECT o_custkey, n, total_rows,
           round(n::DOUBLE / total_rows, 6) AS share,
           round(n::DOUBLE * n_keys / total_rows, 4) AS x_over_uniform
    FROM (SELECT o_custkey, n FROM counts ORDER BY n DESC, o_custkey LIMIT 10),
         total
    """,
    "Skew diagnostic BEFORE the join bites: the 10 heaviest join keys "
    "with their share of rows and multiple over a uniform key. "
    "TakeOrderedAndProject over the counts (never a global sort) + one "
    "scalar total — the report that tells you which keys need salting "
    "or AQE skew handling at 100 TB",
)
def dq2_key_skew_report(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    counts = orders.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n"))
    total = counts.agg(
        F.sum("n").alias("total_rows"), F.count(F.lit(1)).alias("n_keys")
    )
    top = counts.orderBy(F.desc("n"), "o_custkey").limit(10)
    return top.crossJoin(F.broadcast(total)).select(
        "o_custkey",
        "n",
        "total_rows",
        F.round(F.col("n").cast("double") / F.col("total_rows"), 6).alias(
            "share"
        ),
        F.round(
            F.col("n").cast("double") * F.col("n_keys") / F.col("total_rows"), 4
        ).alias("x_over_uniform"),
    )


@register(
    "t5_interval_overlap_join",
    """
    WITH v AS (
      SELECT user_id, date_trunc('day', ts) AS d,
             min(ts) AS v_start, max(ts) AS v_end
      FROM events WHERE event_type = 'view' GROUP BY user_id, d
    ), c AS (
      SELECT user_id, date_trunc('day', ts) AS d,
             min(ts) AS c_start, max(ts) AS c_end
      FROM events WHERE event_type = 'click' GROUP BY user_id, d
    )
    SELECT v.user_id, v.v_start, v.v_end, c.c_start, c.c_end
    FROM v JOIN c ON v.user_id = c.user_id
    WHERE v.v_start <= c.c_end AND c.c_start <= v.v_end
    """,
    "Temporal: interval x interval overlap join (daily view-activity "
    "spans x click-activity spans per user) via time-bucket banding — "
    "equi-join on (key, bucket) + exact refinement instead of the "
    "per-key cross product an inequality join plans; per-bucket density "
    "bounds the quadratic term",
)
def t5_interval_overlap_join(spark, sf_dir):
    from mcyj_datapipeline_spark.operators.temporal import (
        interval_overlap_join,
    )

    ev = _t(spark, sf_dir, "events")

    def spans(etype, s, e):
        return (
            ev.filter(F.col("event_type") == etype)
            .groupBy("user_id", F.date_trunc("day", "ts").alias("_d"))
            .agg(F.min("ts").alias(s), F.max("ts").alias(e))
            .drop("_d")
        )

    views = spans("view", "v_start", "v_end")
    clicks = spans("click", "c_start", "c_end")
    return interval_overlap_join(
        views, clicks, "user_id", "v_start", "v_end", "c_start", "c_end",
        bucket="6 hours",
    ).select("user_id", "v_start", "v_end", "c_start", "c_end")


def _chunk_mh_oracle_sql() -> str:
    # Chunk relation mirroring chunk_documents(chunk_size=30, stride=30)
    # with composite ids, fed through the parameterized MinHash pair SQL.
    chunk_src = """(
      SELECT doc_id * 100000 + chunk_idx AS doc_id,
             array_to_string(w[(chunk_idx*30)+1:(chunk_idx*30)+30], ' ') AS text
      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
           LATERAL (SELECT unnest(generate_series(
               0, greatest(0, (len(w) - 30 + 29) // 30))) AS chunk_idx)
    )"""
    return f"""
    SELECT least(id_a // 100000, id_b // 100000) AS id_a,
           greatest(id_a // 100000, id_b // 100000) AS id_b,
           count(*)::BIGINT AS n_chunk_hits
    FROM ({_mh_sql(chunk_src)})
    WHERE id_a // 100000 <> id_b // 100000
    GROUP BY 1, 2
    """


@register(
    "dedup_chunk_near_dup",
    _chunk_mh_oracle_sql(),
    "Partial-document duplication: MinHash at CHUNK granularity "
    "(30-token disjoint windows) — catches a passage copied into an "
    "otherwise-different document, which document-level Jaccard misses "
    "(the containment problem). Same banded LSH shape over a finer "
    "unit; output is document pairs with their matching-chunk count",
)
def dedup_chunk_near_dup(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return _D4.chunk_near_dup_pairs(
        docs, chunk_size=30, stride=30, jaccard_threshold=0.8
    )


@register(
    "dedup_ngram_containment_pairs",
    """
    WITH sh AS (
      SELECT doc_id,
             list_distinct([array_to_string(w[i:i+2], ' ')
                            for i in range(1, len(w) - 1)]) AS sh
      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
      WHERE len(w) >= 3
    ), inv AS (
      SELECT doc_id, unnest(sh) AS shingle FROM sh
    ), shared AS (
      SELECT x.doc_id AS id_a, y.doc_id AS id_b, count(*) AS shared
      FROM inv x JOIN inv y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
      GROUP BY 1, 2
    )
    SELECT s.id_a, s.id_b,
           round(s.shared::DOUBLE / least(len(a.sh), len(b.sh)), 6)
             AS containment
    FROM shared s JOIN sh a ON s.id_a = a.doc_id JOIN sh b ON s.id_b = b.doc_id
    WHERE s.shared::DOUBLE / least(len(a.sh), len(b.sh)) >= 0.8
    """,
    "Dedup/containment: |A∩B| / min(|A|,|B|) over word shingles — the "
    "subset-duplication signal (abstract inside a paper, quote inside "
    "an article) that Jaccard misses because the union is dominated by "
    "the larger doc. Same inverted-index spine as the Jaccard exact "
    "baseline; same stop-shingle cap applies at scale",
)
def dedup_ngram_containment_pairs(spark, sf_dir):
    return _D4.ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), threshold=0.8, metric="containment"
    )


@register(
    "e7_corpus_health_report",
    r"""
    SELECT source,
           count(*)::BIGINT AS n_docs,
           round(avg(len(toks)), 4) AS avg_tokens,
           round(avg(len(list_filter(toks, t -> list_contains(
             ['the','a','an','and','or','of','to','in','is','it'], t)))::DOUBLE
             / greatest(len(toks), 1)), 6) AS avg_stopword_ratio,
           round(avg(length(regexp_replace(text, '[^A-Za-z ]', '', 'g'))::DOUBLE
             / greatest(length(text), 1)), 6) AS avg_alpha_ratio,
           round(count(DISTINCT sha256(text))::DOUBLE / count(*), 6)
             AS distinct_ratio
    FROM (SELECT source, text,
                 list_filter(string_split_regex(lower(text), '\s+'),
                             t -> t <> '') AS toks
          FROM documents)
    GROUP BY source
    """,
    "E7 corpus health dashboard: per-source document count, token "
    "volume, quality-signal means, and exact-dup ratio in ONE pass — "
    "the report that decides which crawl sources to keep, reweight, or "
    "drop. All signals are row-local column expressions before a single "
    "groupBy(source); the shuffle carries one partial-agg row per "
    "(partition, source)",
)
def e7_corpus_health_report(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    per_row = docs.select(
        "source",
        TA.token_count(F.col("text")).alias("n_tok"),
        TA.stopword_ratio(F.col("text")).alias("sw"),
        TA.alpha_ratio(F.col("text")).alias("al"),
        F.sha2(F.col("text"), 256).alias("sha"),
    )
    return per_row.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("n_tok"), 4).alias("avg_tokens"),
        F.round(F.avg("sw"), 6).alias("avg_stopword_ratio"),
        F.round(F.avg("al"), 6).alias("avg_alpha_ratio"),
        F.round(
            F.countDistinct("sha").cast("double") / F.count(F.lit(1)), 6
        ).alias("distinct_ratio"),
    )


@register(
    "q1b_winsorized_approx",
    """
    WITH c AS (
      SELECT quantile_cont(o_totalprice, 0.01) AS e01,
             quantile_cont(o_totalprice, 0.99) AS e99
      FROM orders
    )
    SELECT count(*) AS n_rows,
           round(min(c.e01), 2) AS p01_exact,
           round(min(c.e99), 2) AS p99_exact,
           round(avg(least(greatest(o_totalprice, c.e01), c.e99)), 4)
             AS mean_clipped_exact,
           true AS p01_within_tol,
           true AS p99_within_tol,
           true AS mean_within_tol
    FROM orders CROSS JOIN c
    """,
    # value-oracled since round 4 via an ε-floor contract: the raw
    # sketch cutpoints are engine-specific (Spark GK vs DuckDB
    # t-digest), so the query returns the EXACT twin's values plus
    # booleans asserting the sketch lies within tolerance of them
    # (cutpoints within 1% of the exact inter-cutpoint spread, mean
    # within 0.1% relative). The hash compare then fails if the sketch
    # ever drifts out of bound. The exact percentile here is the
    # validation harness, not the scale path — production winsorizing
    # uses the sketch cutpoints alone (the first agg below).
    "q1 scale twin: winsorize against approx_percentile cutpoints — a "
    "mergeable one-pass sketch (no exact global sort of the column) — "
    "checked in-query against the exact percentiles with an ε-floor "
    "so the driver's value oracle pins the sketch's error bound",
)
def q1b_winsorized_approx(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    cuts = orders.agg(
        F.expr(
            "approx_percentile(o_totalprice, array(0.01, 0.99), 10000)"
        ).alias("a"),
        F.expr("percentile(o_totalprice, array(0.01, 0.99))").alias("e"),
    ).select(
        F.col("a")[0].alias("a01"),
        F.col("a")[1].alias("a99"),
        F.col("e")[0].alias("e01"),
        F.col("e")[1].alias("e99"),
    )
    clip_a = F.least(
        F.greatest(F.col("o_totalprice"), F.col("a01")), F.col("a99")
    )
    clip_e = F.least(
        F.greatest(F.col("o_totalprice"), F.col("e01")), F.col("e99")
    )
    spread = F.first("e99") - F.first("e01")
    return orders.crossJoin(F.broadcast(cuts)).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.first("e01"), 2).alias("p01_exact"),
        F.round(F.first("e99"), 2).alias("p99_exact"),
        F.round(F.avg(clip_e), 4).alias("mean_clipped_exact"),
        (
            F.abs(F.first("a01") - F.first("e01")) <= spread * 0.01
        ).alias("p01_within_tol"),
        (
            F.abs(F.first("a99") - F.first("e99")) <= spread * 0.01
        ).alias("p99_within_tol"),
        (
            F.abs(F.avg(clip_a) - F.avg(clip_e))
            <= F.abs(F.avg(clip_e)) * 0.001
        ).alias("mean_within_tol"),
    )


@register(
    "dedup_exact_incremental",
    """
    SELECT d.doc_id, sha256(d.text) AS content_sha
    FROM documents d
    WHERE d.doc_id >= 400
      AND NOT EXISTS (
        SELECT 1 FROM documents e
        WHERE e.doc_id < 400 AND sha256(e.text) = sha256(d.text)
      )
    """,
    "Incremental exact dedup: new batch (doc_id >= 400) anti-joined "
    "against the corpus digest set — only genuinely-new content "
    "survives to ingest. The batch twin of the stream-static anti-join "
    "ingest; the shuffle carries 32-byte digests, never text, and at "
    "scale the corpus side IS the digest table the exact-dedup pass "
    "already maintains (bloom-filtered for point probes)",
)
def dedup_exact_incremental(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    new = docs.filter(F.col("doc_id") >= 400).select(
        "doc_id", F.sha2(F.col("text"), 256).alias("content_sha")
    )
    corpus = docs.filter(F.col("doc_id") < 400).select(
        F.sha2(F.col("text"), 256).alias("content_sha")
    )
    return new.join(corpus, on="content_sha", how="left_anti").select(
        "doc_id", "content_sha"
    )
