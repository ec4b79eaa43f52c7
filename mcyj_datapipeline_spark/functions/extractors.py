"""Regex metadata extractors (SURVEY §2.8 F1–F7, F25).

Re-expresses the reference's row-at-a-time Python ``re`` cascades
(``pdf_parsing/extract_document_info.py:30-232``) as pure Spark column
expressions: ``coalesce(nullif(regexp_extract(...)))`` chains that run
inside whole-stage codegen. No Python UDFs — at 100 TB these run
JVM-side on every core with the parquet scan, and Catalyst prunes the
``text`` column scan to exactly the queries that need it.

Dialect notes (SURVEY §7 "regex dialect drift"): Java regex via
``(?i)`` inline flag replaces Python's ``re.IGNORECASE``; both engines'
``.`` excludes newlines by default, and ``re.search`` ≡ first-match
``regexp_extract``, so the cascades port pattern-for-pattern.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# First-3000-chars header truncation (reference extract_document_info.py:80,199
# — F25). Applied *before* the expensive regexes: a manual predicate
# cheapening Catalyst will not invent on its own.
HEADER_CHARS = 3000

_LICENSE_PATTERNS = [
    r"(?i)License\s*#?\s*:\s*([A-Z0-9]+)",
    r"(?i)License\s*Number\s*:\s*([A-Z0-9]+)",
    r"(?i)Re:\s*License\s*#?\s*:\s*([A-Z0-9]+)",
]

_AGENCY_PATTERNS = [
    r"(?i)Agency Name:\s*([^\n]+)",
    r"(?i)Name of Agency:\s*([^\n]+)",
    r"(?i)Licensee Name:\s*([^\n]+)",
    r"(?i)Name of Facility:\s*([^\n]+)",
]

_INVESTIGATION_PATTERNS = [
    r"(?i)Investigation\s*#\s*:\s*([A-Z0-9]+)",
    r"(?i)SIR\s*#\s*:\s*([A-Z0-9]+)",
    r"(?i)Report\s*#\s*:\s*([A-Z0-9]+)",
]

# Title cascade, priority-ordered (reference extract_document_info.py:92-115).
# NOTE: some longer patterns (e.g. 'LICENSING STUDY REPORT') are
# shadowed by earlier substrings ('LICENSING STUDY') — this mirrors the
# REFERENCE's own priority order (extract_document_info.py:96-107)
# exactly, shadowing included; parity outranks tidiness here.
_TITLE_PATTERNS = [
    r"(?i)(?:BUREAU OF CHILDREN AND ADULT LICENSING\s+)?SPECIAL INVESTIGATION REPORT",
    r"(?i)(?:BUREAU OF CHILDREN AND ADULT LICENSING\s+)?LICENSING STUDY",
    r"(?i)LICENSING STUDY REPORT",
    r"(?i)(?:BUREAU OF CHILDREN AND ADULT LICENSING\s+)?RENEWAL INSPECTION REPORT",
    r"(?i)RENEWAL REPORT",
    r"(?i)RENEWAL INSPECTION",
    r"(?i)COMPLAINT INVESTIGATION REPORT",
    r"(?i)COMPLAINT INVESTIGATION",
    r"(?i)(?:BUREAU OF CHILDREN AND ADULT LICENSING\s+)?INSPECTION REPORT",
    r"(?i)ON-SITE INSPECTION REPORT",
    r"(?i)INTERIM MONITORING REPORT",
    r"(?i)MONITORING REPORT",
    r"(?i)INSPECTION CHECKLIST",
    r"(?i)CORRECTIVE ACTION PLAN",
    r"(?i)PROVISIONAL LICENSE REPORT",
]

_ATTACHED_SIR = r"(?i)Attached is the Special Investigation Report"

_DATE_PATTERNS_GROUP1 = [
    r"(?i)Date\(s\) of On-site Inspection:\s*([^\n]+)",
    r"(?i)Date of On-site Inspection\(s\):\s*([^\n]+)",
    r"(?i)Special Investigation Intake Date:\s*([^\n]+)",
]
_DATE_PATTERNS_GROUP0 = [
    r"(?i)(?:January|February|March|April|May|June|July|August|September|October"
    r"|November|December)\s+\d{1,2},\s+\d{4}",
    r"\d{1,2}/\d{1,2}/\d{4}",
]


def _first_match(col: Column, patterns: list[str], group: int = 1) -> Column:
    """Python ``for pattern: if re.search`` cascade → coalesce of
    null-if-empty ``regexp_extract``s, evaluated in priority order."""
    return F.coalesce(
        *[F.nullif(F.regexp_extract(col, p, group), F.lit("")) for p in patterns]
    )


def _collapse_ws(col: Column) -> Column:
    """``re.sub(r'\\s+', ' ', s).strip()`` equivalent."""
    return F.trim(F.regexp_replace(col, r"\s+", " "))


def _smart_title_case(col: Column) -> Column:
    """Reference's ``title.title() if title.isupper() else title``
    (extract_document_info.py:124-125). Python ``str.title`` capitalizes
    after any non-letter (``ON-SITE`` → ``On-Site``) while ``initcap``
    splits on whitespace only, so hyphen boundaries get the same
    treatment via a split-titlecase-rejoin on ``-``."""
    hyphen_title = F.regexp_replace(
        F.initcap(F.regexp_replace(col, "-", "- ")), "- ", "-"
    )
    return F.when(col == F.upper(col), hyphen_title).otherwise(col)


def extract_license_number(text: Column) -> Column:
    """F1 (reference extract_document_info.py:30-44)."""
    return _first_match(text, _LICENSE_PATTERNS)


def extract_agency_name(text: Column) -> Column:
    """F2 (reference extract_document_info.py:47-65): first matching
    pattern, whitespace-collapsed."""
    return _collapse_ws(_first_match(text, _AGENCY_PATTERNS))


def extract_investigation_number(text: Column) -> Column:
    """F4 (reference extract_document_info.py:151-165)."""
    return _first_match(text, _INVESTIGATION_PATTERNS)


def extract_document_title(text: Column) -> Column:
    """F3 (reference extract_document_info.py:68-148): priority cascade —
    cover-letter SIR phrase → 15 title patterns → first-10-lines fallback
    (< 100 chars, ends REPORT/STUDY/INSPECTION/INVESTIGATION) — with smart
    title-casing and ``#<invnum>`` suffix for SIRs."""
    header = F.substring(text, 1, HEADER_CHARS)
    sir_number = extract_investigation_number(header)
    with_sir_suffix = lambda t: F.when(  # noqa: E731
        sir_number.isNotNull(), F.concat(t, F.lit(" #"), sir_number)
    ).otherwise(t)

    # Branch 1: cover-letter phrase.
    attached_title = with_sir_suffix(F.lit("Special Investigation Report"))

    # Branch 2: pattern cascade (group 0 = whole match), normalized + cased.
    pattern_hit = _first_match(header, _TITLE_PATTERNS, group=0)
    cased = _smart_title_case(_collapse_ws(pattern_hit))
    pattern_title = F.when(
        F.upper(cased).contains("SPECIAL INVESTIGATION"), with_sir_suffix(cased)
    ).otherwise(cased)

    # Branch 3: fallback scan of the first 10 lines.
    lines = F.slice(F.split(header, "\n"), 1, 10)
    candidates = F.filter(
        F.transform(lines, F.trim),
        lambda l: (l != "")
        & l.rlike(r"(?i)(REPORT|STUDY|INSPECTION|INVESTIGATION)$")
        & (F.length(l) < 100),
    )
    fallback = F.when(
        F.size(candidates) > 0,
        _smart_title_case(_collapse_ws(F.element_at(candidates, 1))),
    )

    return F.when(header.rlike(_ATTACHED_SIR), attached_title).otherwise(
        F.coalesce(pattern_title, fallback)
    )


def extract_inspection_date(text: Column) -> Column:
    """F5 (reference extract_document_info.py:168-189): labeled date lines
    (capturing group) else bare Month-name / M/D/YYYY (full match),
    whitespace-collapsed."""
    raw = F.coalesce(
        _first_match(text, _DATE_PATTERNS_GROUP1, group=1),
        _first_match(text, _DATE_PATTERNS_GROUP0, group=0),
    )
    return _collapse_ws(raw)


def is_special_investigation(text: Column) -> Column:
    """F6 (reference extract_document_info.py:192-211): OR of cover-letter
    phrase, SIR header pattern, or investigation number — all on the
    first 3000 chars."""
    header = F.substring(text, 1, HEADER_CHARS)
    return (
        header.rlike(_ATTACHED_SIR)
        | header.rlike(
            r"(?i)(?:BUREAU OF CHILDREN AND ADULT LICENSING\s+)?"
            r"SPECIAL INVESTIGATION REPORT"
        )
        | extract_investigation_number(header).isNotNull()
    )


def parse_document(pages: Column) -> dict[str, Column]:
    """F7 composite (reference extract_document_info.py:214-232):
    pages → ``\\n``-join → F1–F6. Returns named columns matching the
    reference's ``document_info`` schema."""
    full_text = F.array_join(pages, "\n")
    return {
        "agency_id": extract_license_number(full_text),
        "date": extract_inspection_date(full_text),
        "agency_name": extract_agency_name(full_text),
        "document_title": extract_document_title(full_text),
        "is_special_investigation": is_special_investigation(full_text),
    }
