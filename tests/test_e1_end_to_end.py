"""E1 end-to-end: the reference's main download/ingest pipeline
(run_full_pipeline.py:202-431) composed from this engine's operators —
API listing → 3-way decision (T1) → mock download + hash (U3/F19) →
PDF extract (U1) → parquet batch append (K3) → state merge (J11) →
idempotent re-run. Plus the spot-check determinism contract
(extract_pdf_text.py:249-333)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mcyj_datapipeline_spark.io import append_parquet_batch
from mcyj_datapipeline_spark.operators.procedural import (
    download_documents,
    extract_pdf_text,
)
from mcyj_datapipeline_spark.streaming.incremental import (
    ParquetStateTable,
    three_way_download_decision,
)

STATE_COLS = ["sha256", "downloaded_path"]


# Defined as lambdas so cloudpickle serializes them by VALUE into the
# worker closures — a module-level def in a test file pickles by
# reference and executors cannot import the tests module.
fake_fetch = lambda doc_id: (  # noqa: E731
    None if doc_id == "CD004" else f"PDFBYTES-{doc_id}".encode()
)
fake_extract = lambda content: [  # noqa: E731
    f"page {i} of {content.decode()}" for i in range(1, 3)
]


def run_once(spark, api, state_table, batch_dir):
    state = state_table.read()
    decisions = three_way_download_decision(api, state)
    to_download = decisions.filter(F.col("decision") == "download")
    fetched = download_documents(to_download, fetcher=fake_fetch)
    ok = fetched.filter(F.col("download_status") == "downloaded")
    texts = extract_pdf_text(ok, extractor=fake_extract)
    if texts.take(1):
        append_parquet_batch(texts, batch_dir)
    updates = ok.select(
        "ContentDocumentId",
        "sha256",
        F.concat(F.lit("/dl/"), F.col("ContentDocumentId"), F.lit(".pdf")).alias(
            "downloaded_path"
        ),
    )
    state_table.update(updates, STATE_COLS)
    return decisions


def test_e1_pipeline_and_idempotent_rerun(spark, tmp_path):
    api = spark.createDataFrame(
        [(f"CD{i:03d}",) for i in range(6)], ["ContentDocumentId"]
    )
    # CD000: sha known (skip); CD001: local file, sha missing (backfill);
    # CD002..5: unknown (download; CD004 will fail).
    state0 = spark.createDataFrame(
        [
            ("CD000", "sha-known", "/dl/CD000.pdf"),
            ("CD001", "", "/dl/CD001.pdf"),
        ],
        ["ContentDocumentId", *STATE_COLS],
    )
    st = ParquetStateTable(spark, str(tmp_path / "state"), "ContentDocumentId")
    st.write_initial(state0)
    batch_dir = str(tmp_path / "batches")

    d1 = {
        r["ContentDocumentId"]: r["decision"]
        for r in run_once(spark, api, st, batch_dir).collect()
    }
    assert d1 == {
        "CD000": "skip",
        "CD001": "backfill",
        "CD002": "download",
        "CD003": "download",
        "CD004": "download",
        "CD005": "download",
    }

    # Extracted batch: 3 successful downloads, correct hashes + pages.
    texts = spark.read.parquet(batch_dir)
    assert texts.count() == 3
    row = texts.orderBy("sha256").first()
    assert len(row["text"]) == 2 and row["text"][0].startswith("page 1 of PDFBYTES-")

    # State after merge: the 3 successes now carry sha + path.
    state1 = st.read()
    assert state1.filter(
        (F.col("sha256") != "") & F.col("sha256").isNotNull()
    ).count() == 4  # CD000 + 3 new

    # Re-run: previously-downloaded ids now skip; only CD004 retries.
    d2 = {
        r["ContentDocumentId"]: r["decision"]
        for r in run_once(spark, api, st, batch_dir).collect()
    }
    assert d2["CD002"] == d2["CD003"] == d2["CD005"] == "skip"
    assert d2["CD004"] == "download"
    # No duplicate batch rows were appended for already-processed docs.
    assert spark.read.parquet(batch_dir).count() == 3


def test_spot_check_reextraction_matches_stored(spark, tmp_path):
    """Reference spot_check: re-extract a sample and byte-compare pages
    against the stored parquet — the determinism contract of U1."""
    docs = spark.createDataFrame(
        [(f"s{i}", f"PDFBYTES-{i}".encode()) for i in range(20)],
        ["sha256", "content"],
    )
    stored_dir = str(tmp_path / "stored")
    append_parquet_batch(extract_pdf_text(docs, extractor=fake_extract), stored_dir)
    stored = spark.read.parquet(stored_dir)

    sample = docs.orderBy(F.rand(seed=7)).limit(5)
    redone = extract_pdf_text(sample, extractor=fake_extract).select(
        "sha256", F.col("text").alias("text_redone")
    )
    joined = stored.join(redone, "sha256")
    assert joined.count() == 5
    assert joined.filter(F.col("text") != F.col("text_redone")).count() == 0
