"""String / JSON / normalization column builders (SURVEY §2.8 F9–F23).

All JVM-side built-ins; the only procedural fallback in the whole
reference surface (brace-matching JSON salvage, F16) lives in
``operators.procedural`` as a pandas UDF and is used only when
``from_json`` on the regex-extracted candidate fails.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def sanitize_filename(col: Column) -> Column:
    """F9 (reference download_pdf.py:118-141): strip ``[<>:"/\\|?*]`` → ``_``,
    collapse whitespace."""
    cleaned = F.regexp_replace(col, r'[<>:"/\\|?*]', "_")
    return F.trim(F.regexp_replace(cleaned, r"\s+", " "))


def generated_filename(*parts: Column) -> Column:
    """F9: join sanitized parts with ``_`` and force a ``.pdf`` suffix
    (reference download_pdf.py:143-175)."""
    stem = F.concat_ws("_", *[sanitize_filename(p) for p in parts])
    return F.when(F.lower(stem).endswith(".pdf"), stem).otherwise(
        F.concat(stem, F.lit(".pdf"))
    )


def strip_date_suffix(col: Column) -> Column:
    """F10 (reference get_download_list.py:21): drop trailing
    ``_YYYY-MM-DD.pdf`` for join-key normalization."""
    return F.regexp_replace(col, r"_\d{4}-\d{2}-\d{2}\.pdf$", "")


def infer_content_document_id(stem: Column) -> Column:
    """F11 (reference backfill_download_metadata.py:36-50): trailing
    15–18-char alnum id on the filename stem."""
    return F.nullif(
        F.regexp_extract(stem, r"_([A-Za-z0-9]{15,18})$", 1), F.lit("")
    )


def normalize_violation_level(col: Column) -> Column:
    """F13 (reference update_violation_levels.py:182-204): lowercase;
    exact {low, moderate, severe}; contains-fallbacks (medium→moderate,
    high→severe); else ``''``."""
    lc = F.lower(F.trim(col))
    return (
        F.when(lc.isin("low", "moderate", "severe"), lc)
        .when(lc.contains("low"), F.lit("low"))
        .when(lc.contains("medium") | lc.contains("moderate"), F.lit("moderate"))
        .when(lc.contains("high") | lc.contains("severe"), F.lit("severe"))
        .otherwise(F.lit(""))
    )


def normalize_violation_yn(col: Column) -> Column:
    """F14 (reference update_sir_summaries.py:234-244): lowercase y/n;
    else 'y' iff the text claims a substantiated violation."""
    lc = F.lower(F.trim(col))
    return (
        F.when(lc.isin("y", "n"), lc)
        .when(lc.contains("yes") | lc.contains("substantiated"), F.lit("y"))
        .otherwise(F.lit("n"))
    )


_LLM_JSON_SCHEMA = T.StructType(
    [
        T.StructField("summary", T.StringType()),
        T.StructField("violation", T.StringType()),
    ]
)


def extract_llm_json(col: Column, schema: T.StructType | None = None) -> Column:
    """F15 (reference update_sir_summaries.py:226-249): pull the first
    flat ``{...}`` object containing the anchor key out of free-form
    LLM text, then parse. Anchoring on ``"summary"`` alone keeps the
    match key-order-agnostic — LLMs emit fields in any order, and
    requiring ``summary`` before ``violation`` would silently null a
    valid ``{"violation": ..., "summary": ...}``. ``from_json`` returns
    null on malformed input exactly like the reference's try/except."""
    candidate = F.regexp_extract(col, r'(\{[^{}]*"summary"[^{}]*\})', 1)
    return F.from_json(F.nullif(candidate, F.lit("")), schema or _LLM_JSON_SCHEMA)


_CORRUPT = "_mcyj_corrupt"


def _fast_llm_json(col: Column, schema: T.StructType) -> Column:
    """Greedy first-``{``-to-last-``}`` slice + ``from_json`` — the
    JVM-side fast path shared by both salvage shapes below.

    ``from_json`` runs PERMISSIVE, where a corrupt slice yields a
    struct-of-nulls — NOT null — so a bare null-check would count
    garbage like ``xx {not json} yy {"summary":"ok"}`` as a fast-path
    HIT and the brace-matching salvage (which recovers the trailing
    object) would never run. Parse with a corrupt-record column and
    treat the fast path as failed whenever it is set; trailing junk
    after a complete first object does NOT set it (Jackson stops at the
    first value), matching the scanner's first-balanced-object pick."""
    aug = T.StructType(
        list(schema.fields) + [T.StructField(_CORRUPT, T.StringType())]
    )
    parsed = F.from_json(
        F.nullif(F.regexp_extract(col, r"(\{.*\})", 1), F.lit("")),
        aug,
        {"columnNameOfCorruptRecord": _CORRUPT},
    )
    return F.when(
        parsed.isNotNull() & parsed.getField(_CORRUPT).isNull(),
        parsed.dropFields(_CORRUPT),
    )


def _salvage_udf():
    """Brace-matching scanner (``operators.procedural.salvage_json``)
    wrapped as a row-at-a-time Python UDF — the slow path. Built lazily
    so importing this module never touches py4j."""
    import json

    from pyspark.sql.functions import udf

    @udf(returnType=T.StringType())
    def _salvage(text: str | None) -> str | None:
        from mcyj_datapipeline_spark.operators.procedural import salvage_json

        obj = salvage_json(text or "")
        return json.dumps(obj) if obj is not None else None

    return _salvage


def salvage_llm_json(col: Column, schema: T.StructType | None = None) -> Column:
    """F16/U4 (reference update_violation_levels.py:281-320): nested-safe
    JSON extraction as a single Column. Fast path: greedy slice +
    ``from_json``. Fallback for rows the fast path cannot parse: the
    brace-matching scanner as a Python UDF.

    CAUTION — Spark extracts Python UDFs into an unconditional
    BatchEvalPython stage, so this Column shape serializes EVERY row
    through Python even when the fast path hit. Use it only where a
    Column expression is required (e.g. inside another expression); for
    table-shaped work use :func:`salvage_llm_json_table`, which filters
    the failed slice first so only it pays the Python tax."""
    schema = schema or _LLM_JSON_SCHEMA
    fast = _fast_llm_json(col, schema)
    slow = F.from_json(_salvage_udf()(col), schema)
    return F.when(fast.isNotNull(), fast).otherwise(slow)


def salvage_llm_json_table(
    df,
    text: Column | str,
    out: str = "parsed",
    schema: T.StructType | None = None,
):
    """F16/U4, cluster shape: same semantics as :func:`salvage_llm_json`
    but split so the Python brace-matching fallback runs ONLY on rows
    the JVM fast path failed to parse (reference
    update_violation_levels.py:281-320 try/except salvage order).

    Plan shape: ``Union( filter(fast IS NOT NULL) → fast,
    filter(fast IS NULL) → BatchEvalPython → slow )`` — at 100 TB with
    rare LLM formatting glitches the Python stage sees ~0% of the
    corpus instead of 100%. Returns ``df`` plus ``out`` (struct).
    """
    schema = schema or _LLM_JSON_SCHEMA
    text = F.col(text) if isinstance(text, str) else text
    staged = df.withColumn(out, _fast_llm_json(text, schema))
    hit = staged.filter(F.col(out).isNotNull())
    missed = staged.filter(F.col(out).isNull()).withColumn(
        out, F.from_json(_salvage_udf()(text), schema)
    )
    return hit.unionByName(missed)


def keywords_from_json(col: Column) -> Column:
    """F17 (reference generate_website_data.py:104-111): JSON-encoded
    array<string> in a CSV cell → real array; null/'' → empty array."""
    parsed = F.from_json(col, T.ArrayType(T.StringType()))
    return F.coalesce(parsed, F.array().cast(T.ArrayType(T.StringType())))


def keywords_to_json(col: Column) -> Column:
    """F17 inverse (reference update_violation_levels.py:485)."""
    return F.to_json(col)


def parse_bool_string(col: Column) -> Column:
    """F18 (reference generate_website_data.py:151,199): 'true'/'1'/'yes'
    (case-insensitive) → true."""
    return F.lower(F.trim(col)).isin("true", "1", "yes")


def sha256_of(content: Column) -> Column:
    """F19 (reference run_full_pipeline.py:53-61): sha256 hex digest of
    binary content — distributed ``sha2``, not a driver-side loop."""
    return F.sha2(content, 256)


def decode_base64_pdf(col: Column) -> Column:
    """F20 (reference download_pdf.py:90-91)."""
    return F.unbase64(col)
