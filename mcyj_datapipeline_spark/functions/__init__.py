"""Scalar column-expression builders (SURVEY.md §2.8, F1–F27).

Every function here returns a ``pyspark.sql.Column`` built from built-in
JVM functions — no Python UDFs — so they stay inside whole-stage codegen
and Catalyst can constant-fold / push them down.
"""

from mcyj_datapipeline_spark.functions.extractors import (  # noqa: F401
    extract_agency_name,
    extract_document_title,
    extract_inspection_date,
    extract_investigation_number,
    extract_license_number,
    is_special_investigation,
    parse_document,
)
from mcyj_datapipeline_spark.functions.dates import (  # noqa: F401
    parse_date_multi,
    parse_iso_timestamp,
)
from mcyj_datapipeline_spark.functions.textfn import (  # noqa: F401
    keywords_from_json,
    keywords_to_json,
    normalize_violation_level,
    normalize_violation_yn,
    parse_bool_string,
    sanitize_filename,
    sha256_of,
    strip_date_suffix,
)
