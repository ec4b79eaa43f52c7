"""Golden invariants: the E3 website-build pipeline vs the reference's
REAL CSVs.

`test_golden_reference_parity.py` pins the E2 extractor chain to the
reference's real parquet at 596/596 exact. This file extends golden
coverage to E3 — `build_flat_table` + `interactive_filter` +
`nest_agencies` (`plans/website.py`) — over the five CSVs the reference
actually commits (written by `extract_document_info.py:294-297`,
`update_sir_summaries.py:406-407`, `update_violation_levels.py:514-515`,
`update_staffing_summaries.py:484-486`,
`facility_information/pull_facility_info.py:63-77`) plus the 1,611-row
keyword-curation map (`website/keyword_reduction.py`).

No committed `agencies_data.json` golden exists (the reference builds
website data at deploy time), so exact-output parity is impossible —
but HARD invariants on the real data are not, and the real CSVs are
where the messy multi-format dates and stringly booleans live:

1. Row conservation — every enrichment join is 1:1-or-miss, so
   3,510 document_info rows in ⇒ 3,510 flat rows out and
   Σ total_reports over nested agencies == 3,510.
2. Attach rates — summary/level/staffing non-null counts equal the
   exact sha256 key overlaps computed independently with pandas.
3. Date normalization — `parse_date_multi` succeeds on ≥ the measured
   floor of the real `MM/DD/YYYY` + `"Month DD, YYYY"` mix
   (`generate_website_data.py:23-62` semantics), and every parsed
   value round-trips as a valid date.
4. Keyword reduction closure — after `reduce_keywords`, no keyword
   that the curation map maps away survives, and every surviving
   keyword is either a map target or an unmapped original.
"""

from __future__ import annotations

import json
import os

import pandas as pd
import pytest

REF_PDF = "/root/reference/pdf_parsing"
REF_FAC = "/root/reference/facility_information/facility_information.csv"

CSVS = {
    "document_info": f"{REF_PDF}/document_info.csv",
    "sir_summaries": f"{REF_PDF}/sir_summaries.csv",
    "violation_levels": f"{REF_PDF}/sir_violation_levels.csv",
    "staffing": f"{REF_PDF}/staffing_summaries.csv",
    "keyword_map": f"{REF_PDF}/violation_curation_keyword_reduction.csv",
    "facilities": REF_FAC,
}

# Measured on the committed snapshot at authoring time (round 4):
# 3,510 documents; the reference's own parser resolves 2,918 of them
# (83.1%) — the remainder are date RANGES ("4/1/21-4/5/21"), multi-date
# lists, 2-digit years, and scanner junk that
# generate_website_data.py:23-62 deliberately returns None for.
# The invariant is PER-ROW PARITY with those semantics, not a blanket
# rate: parse_date_multi must agree with the reference parser on every
# one of the 3,510 real values, parseable or not.
EXPECT_DOCS = 3510
EXPECT_PARSED = 2918

pytestmark = pytest.mark.skipif(
    not all(os.path.isfile(p) for p in CSVS.values()),
    reason="reference CSV snapshot not present",
)


def _read_csv(spark, path):
    # the reference writes RFC4180 CSVs via the Python csv module:
    # embedded newlines inside quotes, quotes escaped by doubling
    return (
        spark.read.option("header", True)
        .option("multiLine", True)
        .option("escape", '"')
        .csv(path)
    )


@pytest.fixture(scope="module")
def flat_and_frames(spark):
    from mcyj_datapipeline_spark.plans.website import build_flat_table

    sdf = {k: _read_csv(spark, p) for k, p in CSVS.items()}
    flat = build_flat_table(
        sdf["document_info"],
        sdf["sir_summaries"],
        sdf["violation_levels"],
        sdf["staffing"],
        sdf["facilities"],
        keyword_map=sdf["keyword_map"],
    ).cache()
    pdf = {k: pd.read_csv(p, dtype=str) for k, p in CSVS.items()}
    yield flat, pdf
    flat.unpersist()


def test_row_conservation_through_all_joins(flat_and_frames):
    flat, pdf = flat_and_frames
    assert len(pdf["document_info"]) == EXPECT_DOCS
    # 1:1-or-miss joins: no fan-out, no loss
    assert flat.count() == EXPECT_DOCS
    # and the document key stays unique end-to-end
    assert flat.select("sha256").distinct().count() == EXPECT_DOCS


def test_attach_rates_equal_csv_key_overlaps(flat_and_frames):
    flat, pdf = flat_and_frames
    doc_shas = set(pdf["document_info"].sha256)
    expected = {
        "summary": len(doc_shas & set(pdf["sir_summaries"].sha256)),
        "level": len(doc_shas & set(pdf["violation_levels"].sha256)),
        "staffing_problem": len(doc_shas & set(pdf["staffing"].sha256)),
        "LicenseStatus": len(
            set(pdf["document_info"].agency_id)
            & set(pdf["facilities"].LicenseNumber)
        ),
    }
    from pyspark.sql import functions as F

    got_row = flat.agg(
        *[
            F.count(F.col(c)).alias(c)
            for c in ("summary", "level", "staffing_problem")
        ],
        F.countDistinct(
            F.when(F.col("LicenseStatus").isNotNull(), F.col("agency_id"))
        ).alias("LicenseStatus"),
    ).collect()[0]
    got = {c: got_row[c] for c in expected}
    assert got == expected, f"attach-rate drift: got {got} want {expected}"
    # the enrichment tables are ~30% of docs (only SIRs get LLM rows):
    # sanity that the overlap is genuinely partial, not accidentally 0/all
    assert 0 < expected["summary"] < EXPECT_DOCS


def _reference_parse_document_date(date_str):
    """generate_website_data.py:23-62, verbatim semantics: anchored
    M/D/YYYY regex with datetime validity, then '%B %d, %Y',
    '%b %d, %Y', '%Y-%m-%d'; None when nothing matches."""
    import re
    from datetime import datetime

    if not isinstance(date_str, str) or not date_str:
        return None
    date_str = date_str.strip()
    m = re.match(r"^(\d{1,2})/(\d{1,2})/(\d{4})$", date_str)
    if m:
        mo, d, y = m.groups()
        try:
            return datetime(int(y), int(mo), int(d)).strftime("%Y-%m-%d")
        except ValueError:
            pass
    for fmt in ("%B %d, %Y", "%b %d, %Y", "%Y-%m-%d"):
        try:
            return datetime.strptime(date_str, fmt).strftime("%Y-%m-%d")
        except ValueError:
            continue
    return None


def test_real_date_mix_matches_reference_parser_per_row(flat_and_frames):
    flat, pdf = flat_and_frames
    from pyspark.sql import functions as F

    expected = {
        r.sha256: _reference_parse_document_date(r.date)
        for r in pdf["document_info"].itertuples()
    }
    got = {
        r["sha256"]: r["iso"]
        for r in flat.select(
            "sha256", F.col("date_iso").cast("string").alias("iso")
        ).collect()
    }
    assert len(got) == EXPECT_DOCS
    diffs = [
        (sha, expected[sha], got[sha])
        for sha in expected
        if expected[sha] != got[sha]
    ]
    assert not diffs, f"{len(diffs)} rows diverge; first 5: {diffs[:5]}"
    n_parsed = sum(v is not None for v in got.values())
    assert n_parsed == EXPECT_PARSED  # pins the measured snapshot rate


def test_reduced_keywords_closed_under_curation_map(flat_and_frames):
    flat, pdf = flat_and_frames
    from pyspark.sql import functions as F

    kmap = pdf["keyword_map"].fillna({"reduced_keyword": ""})
    mapped_away = set(
        kmap[kmap.reduced_keyword == ""].original_keyword
    )
    mapping = dict(zip(kmap.original_keyword, kmap.reduced_keyword))
    # originals straight from the committed levels CSV (JSON arrays)
    originals: set[str] = set()
    for s in pdf["violation_levels"].keywords.dropna():
        try:
            originals.update(json.loads(s))
        except ValueError:
            pass
    allowed = {
        v for v in mapping.values() if v
    } | {k for k in originals if k not in mapping}

    surviving = {
        r["kw"]
        for r in flat.select(
            F.explode("keywords").alias("kw")
        ).distinct().collect()
    }
    assert surviving, "keyword reduction produced an empty vocabulary"
    assert not (surviving & mapped_away), (
        f"keywords the map deletes survived: {sorted(surviving & mapped_away)[:5]}"
    )
    stray = surviving - allowed
    assert not stray, f"keywords outside the map's closure: {sorted(stray)[:5]}"
    # and the map genuinely fired: at least one reduced target present
    assert surviving & {v for v in mapping.values() if v}


def test_nest_agencies_conserves_documents_and_filter_bounds(
    flat_and_frames,
):
    from mcyj_datapipeline_spark.plans.website import (
        interactive_filter,
        nest_agencies,
    )

    flat, pdf = flat_and_frames
    from pyspark.sql import functions as F

    nested = nest_agencies(
        flat, ["document_title", "is_special_investigation"]
    )
    tot = nested.agg(F.sum("total_reports").alias("t")).collect()[0]["t"]
    assert tot == EXPECT_DOCS
    n_agencies = nested.count()
    assert n_agencies == len(set(pdf["document_info"].agency_id))
    # documents arrays are sorted newest-first within each agency
    bad_order = nested.filter(
        F.exists(
            F.expr(
                "zip_with(documents, slice(documents, 2, size(documents)),"
                " (a, b) -> a.date_iso < b.date_iso)"
            ),
            lambda x: x,
        )
    ).count()
    assert bad_order == 0
    # SIR-only filter: matches the CSV's own True-count exactly
    sir_true = int(
        (pdf["document_info"].is_special_investigation == "True").sum()
    )
    got_sir = interactive_filter(flat, sir_only=True).count()
    assert got_sir == sir_true
    # severity sub-filter (P9, real vocabulary is severe/moderate/low):
    # count must equal the exact CSV overlap of SIR docs with a
    # 'severe' level row
    lv = pdf["violation_levels"]
    expect_severe = len(
        set(
            pdf["document_info"][
                pdf["document_info"].is_special_investigation == "True"
            ].sha256
        )
        & set(lv[lv.level == "severe"].sha256)
    )
    got_severe = interactive_filter(
        flat, sir_only=True, severity=["severe"]
    ).count()
    assert got_severe == expect_severe and expect_severe > 0
