"""Golden-parity: the E2 extractor chain vs the reference's REAL data.

Every other extractor test runs on synthetic reference-shaped fixtures;
this one runs F1-F7 (`plans/document_info.py` -> `functions/extractors`)
over the reference's actual committed corpus —
``/root/reference/pdf_parsing/parquet_files/*.parquet`` (596 real PDF
text rows) — and field-diffs the output against the matching sha256
rows of the reference's committed ``document_info.csv`` (3,510 rows,
written by ``extract_document_info.py:294-297``).

SURVEY §7 names Python-``re`` vs Spark/Java-regex dialect drift as the
#1 porting risk; production text is exactly where that drift hides.
Measured at authoring time: 596/596 rows match EXACTLY on all five
extracted fields, so the floor is 1.0 — any future regression prints a
per-field diff report and fails.
"""

from __future__ import annotations

import os

import pandas as pd
import pytest

REF_PARQUET = "/root/reference/pdf_parsing/parquet_files"
REF_CSV = "/root/reference/pdf_parsing/document_info.csv"

GOLDEN_FIELDS = [
    "agency_id",
    "date",
    "agency_name",
    "document_title",
    "is_special_investigation",
]

# 596/596 exact at authoring time; the floor is deliberately 1.0 per
# field — extractor regexes are deterministic, so ANY diff is drift.
MATCH_RATE_FLOOR = 1.0


@pytest.mark.skipif(
    not (os.path.isdir(REF_PARQUET) and os.path.isfile(REF_CSV)),
    reason="reference pdf_parsing snapshot not present",
)
def test_document_info_matches_reference_golden_csv(spark):
    from mcyj_datapipeline_spark.plans.document_info import document_info

    docs = spark.read.parquet(os.path.join(REF_PARQUET, "*.parquet"))
    mine = document_info(docs).toPandas().set_index("sha256")
    assert len(mine) == 596, f"expected 596 reference rows, got {len(mine)}"

    gold = pd.read_csv(REF_CSV, dtype=str, keep_default_na=False)
    gold = gold[gold.sha256.isin(set(mine.index))].set_index("sha256")
    assert len(gold) == len(mine), (
        "reference CSV is missing shas present in the parquet snapshot"
    )

    report: list[str] = []
    rates: dict[str, float] = {}
    for f in GOLDEN_FIELDS:
        a = mine[f].astype(object)
        if f == "is_special_investigation":
            # CSV serializes Python bools as 'True'/'False'
            a = a.map(
                lambda v: "True" if v is True else (
                    "False" if v is False else str(v)
                )
            )
        a = a.fillna("").astype(str)
        b = gold[f].astype(str)
        eq = a == b.loc[a.index]
        rates[f] = float(eq.mean())
        for sha in a.index[~eq][:10]:
            report.append(
                f"  {f} @ {sha[:12]}: ours={a.loc[sha]!r} "
                f"gold={b.loc[sha]!r}"
            )

    failing = {f: r for f, r in rates.items() if r < MATCH_RATE_FLOOR}
    assert not failing, (
        f"golden parity below floor {MATCH_RATE_FLOOR}: "
        f"{ {f: round(r, 4) for f, r in failing.items()} }\n"
        + "\n".join(report)
    )
