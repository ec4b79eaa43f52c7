"""Golden parity: the per-document JSON export vs the reference's REAL
data — 596 extracted-text parquet rows + the five committed CSVs.

`test_golden_e3_invariants.py` pins the E3 flat-table/website artifact;
this file pins the reference website's SECOND artifact: one
``{sha256}.json`` per document (``website/export_parquet_to_json.py``).
The oracle is an in-test reimplementation of the exporter's own loaders
(csv.DictReader semantics — '' defaults, blank-sha skips, strict
``== 'true'`` staffing booleans, JSON-parsed keyword lists run through
the curation-map reduction) and document assembly, executed on the real
files; the engine side is ``plans/doc_export.build_doc_export`` +
``io.write_json_per_key``. Checks:

1. count + key-set equality over ALL 596 documents;
2. sub-object PRESENCE sets over all 596 equal the exporter's
   conditional-assignment sets (sha ∈ CSV keyset);
3. exact per-field parity on a deterministic sample (every 17th sha);
4. the K5 sink writes exactly one partition dir per sha whose JSON
   body equals the reference document (null sub-objects omitted).
"""

from __future__ import annotations

import ast
import csv
import glob
import json
import os

import pytest

REF_PDF = "/root/reference/pdf_parsing"
PARQUET_DIR = f"{REF_PDF}/parquet_files"
CSVS = {
    "document_info": f"{REF_PDF}/document_info.csv",
    "sir_summaries": f"{REF_PDF}/sir_summaries.csv",
    "violation_levels": f"{REF_PDF}/sir_violation_levels.csv",
    "staffing": f"{REF_PDF}/staffing_summaries.csv",
    "keyword_map": f"{REF_PDF}/violation_curation_keyword_reduction.csv",
}

pytestmark = pytest.mark.skipif(
    not (
        os.path.isdir(PARQUET_DIR)
        and all(os.path.isfile(p) for p in CSVS.values())
    ),
    reason="reference pdf_parsing snapshot not present",
)


# ---------------------------------------------------------------------------
# oracle: the exporter's loaders + assembly, verbatim semantics
# (export_parquet_to_json.py:27-153, 203-276; keyword_reduction.py:14-77)
# ---------------------------------------------------------------------------


def _rows(path):
    with open(path, encoding="utf-8") as f:
        for row in csv.DictReader(f):
            sha = row.get("sha256", "").strip()
            if sha:
                yield sha, row


def _load_keyword_map():
    out = {}
    with open(CSVS["keyword_map"], encoding="utf-8") as f:
        for row in csv.DictReader(f):
            orig = row.get("original_keyword", "").strip()
            red = row.get("reduced_keyword", "").strip()
            if orig != "":
                out[orig] = red
    return out


def _apply_reduction(keywords, kmap):
    if not kmap:
        return keywords
    seen, out = set(), []
    for kw in keywords:
        red = kmap.get(kw, kw)
        if red == "" or red in seen:
            continue
        seen.add(red)
        out.append(red)
    return out


def _json_list(s):
    if not s:
        return []
    try:
        return json.loads(s)
    except (json.JSONDecodeError, ValueError):
        return []


@pytest.fixture(scope="module")
def expected():
    import pandas as pd

    kmap = _load_keyword_map()
    metadata = {
        sha: {
            "agency_id": r.get("agency_id", ""),
            "agency_name": r.get("agency_name", ""),
            "document_title": r.get("document_title", ""),
            "date": r.get("date", ""),
            "is_special_investigation": r.get(
                "is_special_investigation", "False"
            ).lower()
            in ("true", "1", "yes"),
        }
        for sha, r in _rows(CSVS["document_info"])
    }
    summaries = {
        sha: {
            "summary": r.get("response", ""),
            "violation": r.get("violation", ""),
        }
        for sha, r in _rows(CSVS["sir_summaries"])
    }
    levels = {
        sha: {
            "level": r.get("level", ""),
            "justification": r.get("justification", ""),
            "keywords": _apply_reduction(
                _json_list(r.get("keywords", "")), kmap
            ),
        }
        for sha, r in _rows(CSVS["violation_levels"])
    }
    staffing = {
        sha: {
            "staffing_problem": r.get("staffing_problem", "")
            .strip()
            .lower()
            == "true",
            "confidence": r.get("confidence", ""),
            "primary_reason": r.get("primary_reason", ""),
            "evidence_staffing_cited": r.get(
                "evidence_staffing_cited", ""
            )
            .strip()
            .lower()
            == "true",
            "evidence_keywords_found": _json_list(
                r.get("evidence_keywords_found", "")
            ),
            "evidence_explanation": r.get("evidence_explanation", ""),
        }
        for sha, r in _rows(CSVS["staffing"])
    }

    docs = {}
    for pf in sorted(glob.glob(f"{PARQUET_DIR}/*.parquet")):
        df = pd.read_parquet(pf)
        for _, row in df.iterrows():
            sha = row["sha256"]
            text = row["text"]
            if isinstance(text, str):
                t = text.strip()
                pages = []
                if t.startswith("[") and t.endswith("]"):
                    try:
                        parsed = ast.literal_eval(t)
                        pages = parsed if isinstance(parsed, list) else []
                    except (ValueError, SyntaxError):
                        pages = []
            else:
                pages = list(text) if text is not None else []
            doc = {
                "sha256": sha,
                "dateprocessed": str(row["dateprocessed"]),
                "pages": pages,
            }
            if sha in metadata:
                doc["metadata"] = metadata[sha]
            if sha in summaries:
                doc["sir_summary"] = summaries[sha]
            if sha in levels:
                doc["sir_violation_level"] = levels[sha]
            if sha in staffing:
                doc["staffing_summary"] = staffing[sha]
            docs[sha] = doc
    return docs


def _read_csv(spark, path):
    return (
        spark.read.option("header", True)
        .option("multiLine", True)
        .option("escape", '"')
        .csv(path)
    )


@pytest.fixture(scope="module")
def export_df(spark):
    from mcyj_datapipeline_spark.plans.doc_export import build_doc_export

    df = build_doc_export(
        spark.read.parquet(PARQUET_DIR),
        document_info=_read_csv(spark, CSVS["document_info"]),
        sir_summaries=_read_csv(spark, CSVS["sir_summaries"]),
        violation_levels=_read_csv(spark, CSVS["violation_levels"]),
        staffing=_read_csv(spark, CSVS["staffing"]),
        keyword_map=_read_csv(spark, CSVS["keyword_map"]),
    ).cache()
    yield df
    df.unpersist()


def _row_to_doc(row):
    d = row.asDict(recursive=True)
    return {k: v for k, v in d.items() if v is not None}


def test_count_and_key_set_parity_on_all_596(export_df, expected):
    assert len(expected) == 596
    got = {r["sha256"] for r in export_df.select("sha256").collect()}
    assert got == set(expected)
    assert export_df.count() == 596


def test_sub_object_presence_matches_csv_key_overlap(export_df, expected):
    for field in (
        "metadata",
        "sir_summary",
        "sir_violation_level",
        "staffing_summary",
    ):
        want = {sha for sha, doc in expected.items() if field in doc}
        got = {
            r["sha256"]
            for r in export_df.filter(
                export_df[field].isNotNull()
            )
            .select("sha256")
            .collect()
        }
        assert got == want, (
            f"{field}: {len(got)} present vs {len(want)} expected; "
            f"diff sample {sorted(got ^ want)[:3]}"
        )
        # the artifact is useless if nothing attaches — guard against a
        # vacuously-passing empty overlap
        assert want, f"{field} never present: fixture drift?"


def test_exact_per_field_parity_on_sample(export_df, expected):
    sample = sorted(expected)[::17]  # deterministic ~36 docs
    rows = {
        r["sha256"]: _row_to_doc(r)
        for r in export_df.filter(
            export_df["sha256"].isin(sample)
        ).collect()
    }
    assert set(rows) == set(sample)
    for sha in sample:
        assert rows[sha] == expected[sha], (
            f"document {sha} diverges: "
            + json.dumps(
                {
                    k: (rows[sha].get(k), expected[sha].get(k))
                    for k in set(rows[sha]) | set(expected[sha])
                    if rows[sha].get(k) != expected[sha].get(k)
                },
                default=str,
            )[:800]
        )


def test_k5_sink_one_file_per_sha_with_reference_body(
    spark, export_df, expected, tmp_path
):
    from mcyj_datapipeline_spark.io import write_json_per_key

    sample = sorted(expected)[::100]  # 6 docs through the real sink
    out = str(tmp_path / "docs")
    write_json_per_key(
        export_df.filter(export_df["sha256"].isin(sample)), out, "sha256"
    )
    dirs = {
        os.path.basename(p).split("=", 1)[1]
        for p in glob.glob(f"{out}/sha256=*")
    }
    assert dirs == set(sample)
    for sha in sample:
        lines = []
        for f in glob.glob(f"{out}/sha256={sha}/*.json"):
            with open(f, encoding="utf-8") as fh:
                lines += [ln for ln in fh.read().splitlines() if ln]
        assert len(lines) == 1, f"{sha}: {len(lines)} JSON rows"
        body = json.loads(lines[0])
        want = {k: v for k, v in expected[sha].items() if k != "sha256"}
        assert body == want
