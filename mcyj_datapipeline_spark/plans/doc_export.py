"""The per-document JSON export — the reference website's SECOND
artifact (one ``{sha256}.json`` per document, built by
``website/export_parquet_to_json.py:203-276``), re-expressed as a
single declarative plan over the extracted-text parquet plus the four
enrichment CSVs.

Reference semantics pinned here (each cited to the exporter):

- base document = ``{sha256, dateprocessed: str, pages}`` where
  ``pages`` is the text column normalized through the dual-format
  path (``export_parquet_to_json.py:206-226``): an array column passes
  through (``list(text_data)``, None → []); a STRING column parses via
  ``ast.literal_eval`` only when it looks like a list
  (strip/startswith '['/endswith ']'), anything else → [].
- ``metadata`` sub-object present iff the sha is in document_info
  (``:237-246``): five fields, string defaults '' and the
  ``lower() in ('true','1','yes')`` boolean (default 'False').
- ``sir_summary`` present iff sha in sir_summaries (``:248-253``):
  ``summary`` = the CSV's ``response`` column, plus ``violation``.
- ``sir_violation_level`` present iff sha in sir_violation_levels
  (``:255-261``): level/justification plus keywords JSON-parsed
  (failure → []) and run through the curation-map reduction
  (``load_sir_violation_levels``, ``keyword_reduction.py:45-77``).
- ``staffing_summary`` present iff sha in staffing_summaries
  (``:263-265``): two strict ``== 'true'`` booleans, JSON-parsed
  evidence keywords, three passthrough strings (``:90-125``).

Absent-iff-missing is the join's left-ness: a missing lookup row
leaves the struct NULL, and Spark's JSON sink omits null fields
(``spark.sql.jsonGenerator.ignoreNullFields`` default), which is
byte-compatible with the reference's conditional ``document[...] =``
assignment. ``io.write_json_per_key`` (K5) is the partitioned sink.

Intentional deviations from byte-parity (hardening, not bugs):

- keyword cells parse via ``from_json(..., 'array<string>')`` with
  NULL → []; the reference's ``json.loads`` stores any valid-JSON
  value verbatim (a bare string or object would land in the document
  as-is). Here a non-array or non-string-array cell collapses to [] —
  malformed cells degrade to the empty case instead of leaking
  arbitrary JSON shapes into a typed column. Same applies to
  ``evidence_keywords_found``.
- pages coerce to array<string> (see ``_literal_eval_pages``).
- NULL ``dateprocessed`` serializes as the string 'NaT'/'None'
  matching ``str()`` through pandas, not as an absent field.

Scale shape: four broadcast-or-shuffle hash joins on a 64-char key,
no UDF except the stringly-text salvage path (Arrow-batched, applied
only when the input column is actually a string), mapping straight
onto a 100 TB corpus as key-partitioned joins.
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from mcyj_datapipeline_spark.operators.aggregates import reduce_keywords

def _empty():
    # built lazily: F.array() touches the active JVM session, and this
    # module must stay importable before any SparkSession exists
    return F.array().cast("array<string>")


def _s(col: str):
    """String field with the csv.DictReader default: missing/empty → ''."""
    return F.coalesce(F.col(col), F.lit(""))


@F.pandas_udf(ArrayType(StringType()))
def _literal_eval_pages(s):
    """The exporter's stringly-text salvage
    (``export_parquet_to_json.py:208-221``): ``ast.literal_eval`` on
    values that look like a Python list literal, [] otherwise — the
    reference stores pages as a Python repr (single quotes), which no
    JSON parser accepts. Arrow-batched; only ever planned when the
    text column is a string, so array-typed corpora never pay it.

    Intentional deviation: elements are coerced to str because the
    column is typed array<string>. The reference keeps literal_eval's
    elements verbatim, so a repr'd list holding a number or None would
    serialize as a JSON number/null there but as a string here. Pages
    are page TEXT by construction; a non-string element is already
    corrupt upstream, and a uniform string type is the honest schema."""
    import ast

    def parse(v):
        if v is None:
            return []
        t = v.strip()
        if t.startswith("[") and t.endswith("]"):
            try:
                out = ast.literal_eval(t)
                return [str(x) for x in out] if isinstance(out, list) else []
            except (ValueError, SyntaxError):
                return []
        return []

    return s.map(parse)


def _stamp_file_read_order(df: DataFrame) -> DataFrame | None:
    """Load-time read-order stamp for frames scanned straight off
    files: ``_ord = struct(file_path, block_start, row_counter)``.

    Why this triple is the sequential read order: the hidden
    ``_metadata`` column carries the split's source file and byte
    offset, and ``monotonically_increasing_id`` increases along each
    partition; a split never spans partitions and rows inside a
    partition arrive in (file, offset) order, so the lexicographic
    struct order equals "files in sorted-path order, bytes in offset
    order" regardless of how FileSourceScan bin-packs splits by SIZE
    (descending) into partitions — the exact reordering that made both
    a bare ``monotonically_increasing_id`` (ADVICE r6, multi-file) and
    the ``coalesce(1)`` fallback (ADVICE r7, unequal splits of one
    file concatenate in size order, not offset order) unsound.

    Returns None when ``_metadata`` doesn't resolve (derived or
    in-memory frames — no file read order exists to recover), and
    also when ANYTHING that can move or reorder rows sits between the
    file scan and this frame: ``_metadata`` still resolves through a
    repartition, sort, or sample, but ``monotonically_increasing_id``
    then numbers post-shuffle/post-sort partitions, no longer
    within-split row order, and the stamp would silently pick a wrong
    last-wins winner (ADVICE r8 named Repartition; the r9 review
    generalized it). The guard is a WHITELIST over the optimized
    logical plan — only Project/Filter/Relation preserve both the
    partition↔split mapping and within-partition order, so any other
    node declines the stamp rather than guessing. Classic sessions
    analyze eagerly, so a missing ``_metadata`` raises
    AnalysisException right here; we catch exactly that.
    """
    try:
        stamped = df.withColumn(
            "_ord",
            F.struct(
                F.col("_metadata.file_path").alias("f"),
                F.col("_metadata.file_block_start").alias("b"),
                F.monotonically_increasing_id().alias("r"),
            ),
        )
    except AnalysisException:
        return None
    plan = stamped._jdf.queryExecution().optimizedPlan().toString()
    if not _plan_is_order_preserving_scan(plan):
        return None
    return stamped


def _plan_is_order_preserving_scan(plan: str) -> bool:
    """True iff every node of the printed optimized plan is on the
    order-preserving whitelist. Captured with ``\\w+`` so digit-bearing
    node names survive whole — a DataSource-v2 scan prints
    ``RelationV2``, which the old ``[A-Za-z]+`` truncated to
    ``RelationV`` and thereby declined into the fail-closed fallback
    (ADVICE r9; note Spark 4's DSv2 file scans currently don't resolve
    ``_metadata`` at all, so they decline earlier — this keeps the
    whitelist honest for when they do). A v2 leaf is still a plain
    file scan: same partition↔split mapping and within-partition
    order as ``Relation``."""
    import re

    nodes = {
        m.group(1) for m in re.finditer(r"^[\s:+-]*(\w+)", plan, re.M)
    }
    return not (nodes - {"Project", "Filter", "Relation", "RelationV2"})


def build_doc_export(
    docs_raw: DataFrame,
    document_info: DataFrame | None = None,
    sir_summaries: DataFrame | None = None,
    violation_levels: DataFrame | None = None,
    staffing: DataFrame | None = None,
    keyword_map: DataFrame | None = None,
) -> DataFrame:
    """One row per document, shaped exactly like the reference's
    per-sha JSON files. Each enrichment input is optional, like the
    exporter's optional CSV arguments — absent input ⇒ the sub-object
    is absent from every document."""
    dtypes = dict(docs_raw.dtypes)
    text_type = dtypes.get("text", "")
    pages = (
        _literal_eval_pages(F.col("text"))
        if text_type == "string"
        else F.coalesce(F.col("text").cast("array<string>"), _empty())
    )
    # The exporter writes ``str(dateprocessed)`` unconditionally
    # (``export_parquet_to_json.py:232``) off a pandas row, so a NULL
    # surfaces as the string 'NaT' (timestamp/date column) or 'None'
    # (object column) rather than an absent field; mirror that instead
    # of letting the JSON sink's ignoreNullFields drop the key.
    dp_type = dtypes.get("dateprocessed", "")
    null_repr = "NaT" if ("timestamp" in dp_type or dp_type == "date") else "None"
    out = docs_raw.select(
        "sha256",
        F.coalesce(
            F.col("dateprocessed").cast("string"), F.lit(null_repr)
        ).alias("dateprocessed"),
        pages.alias("pages"),
    )

    def keyed(df):
        # loaders skip rows with a blank sha (``:39-41`` etc.) and load
        # into a dict, so a duplicate sha is LAST-WINS, in the
        # reference's sequential file-read order. That order must be
        # DERIVED, not assumed. Three-tier policy:
        #   * caller supplies ``_ord`` → used verbatim; the scalable
        #     seam when the read sequence is anything other than
        #     sorted-path file order.
        #   * frame reads straight off files → ``_ord`` is stamped from
        #     the scan's ``_metadata`` as (file_path, block_start,
        #     row counter), which IS sequential read order no matter
        #     how the scan bin-packs splits (see
        #     ``_stamp_file_read_order``). Fully parallel — no
        #     coalesce — so multi-file corpora stay on the scale path.
        #   * derived/in-memory frame (no file order to recover) →
        #     collapse to ONE partition and stamp
        #     monotonically_increasing_id; order is the parent
        #     partition order, documented best-effort for test frames.
        if "_ord" not in df.columns:
            stamped = _stamp_file_read_order(df)
            if stamped is not None:
                df = stamped
            else:
                df = df.coalesce(1).withColumn(
                    "_ord", F.monotonically_increasing_id()
                )
        w = Window.partitionBy("sha256").orderBy(F.col("_ord").desc())
        return (
            df.filter(
                F.col("sha256").isNotNull() & (F.trim(F.col("sha256")) != "")
            )
            .withColumn("sha256", F.trim(F.col("sha256")))
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_ord", "_rn")
        )

    if document_info is not None:
        md = keyed(document_info).select(
            "sha256",
            F.struct(
                _s("agency_id").alias("agency_id"),
                _s("agency_name").alias("agency_name"),
                _s("document_title").alias("document_title"),
                _s("date").alias("date"),
                F.lower(
                    F.coalesce(
                        F.col("is_special_investigation"), F.lit("False")
                    )
                )
                .isin("true", "1", "yes")
                .alias("is_special_investigation"),
            ).alias("metadata"),
        )
        out = out.join(md, "sha256", "left")

    if sir_summaries is not None:
        sm = keyed(sir_summaries).select(
            "sha256",
            F.struct(
                _s("response").alias("summary"),
                _s("violation").alias("violation"),
            ).alias("sir_summary"),
        )
        out = out.join(sm, "sha256", "left")

    if violation_levels is not None:
        lv = keyed(violation_levels).select(
            "sha256",
            _s("level").alias("level"),
            _s("justification").alias("justification"),
            F.coalesce(
                F.from_json(F.col("keywords"), "array<string>"), _empty()
            ).alias("keywords"),
        )
        if keyword_map is not None:
            lv = reduce_keywords(lv, keyword_map, "keywords", ["sha256"])
        lv = lv.select(
            "sha256",
            F.struct("level", "justification", "keywords").alias(
                "sir_violation_level"
            ),
        )
        out = out.join(lv, "sha256", "left")

    if staffing is not None:
        st = keyed(staffing).select(
            "sha256",
            F.struct(
                (
                    F.lower(F.trim(F.coalesce(F.col("staffing_problem"), F.lit(""))))
                    == "true"
                ).alias("staffing_problem"),
                _s("confidence").alias("confidence"),
                _s("primary_reason").alias("primary_reason"),
                (
                    F.lower(
                        F.trim(
                            F.coalesce(
                                F.col("evidence_staffing_cited"), F.lit("")
                            )
                        )
                    )
                    == "true"
                ).alias("evidence_staffing_cited"),
                F.coalesce(
                    F.from_json(
                        F.col("evidence_keywords_found"), "array<string>"
                    ),
                    _empty(),
                ).alias("evidence_keywords_found"),
                _s("evidence_explanation").alias("evidence_explanation"),
            ).alias("staffing_summary"),
        )
        out = out.join(st, "sha256", "left")

    return out
