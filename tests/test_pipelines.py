"""E3 website pipeline + incremental state (T1–T6) + procedural kernels
(U1–U4) + multimodal plumbing on reference-shaped fixtures."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mcyj_datapipeline_spark.operators import multimodal as MM
from mcyj_datapipeline_spark.operators import procedural as PR
from mcyj_datapipeline_spark.plans import website as W
from mcyj_datapipeline_spark.plans.document_info import document_info
from mcyj_datapipeline_spark.streaming.incremental import (
    ParquetStateTable,
    pending_work,
    three_way_download_decision,
)
from tests.fixtures import make_documents_raw, make_facilities

DOC_SCHEMA = T.StructType(
    [
        T.StructField("sha256", T.StringType()),
        T.StructField("text", T.ArrayType(T.StringType())),
        T.StructField("dateprocessed", T.StringType()),
    ]
)


@pytest.fixture(scope="module")
def doc_info(spark):
    rows = make_documents_raw()
    df = spark.createDataFrame(
        [(r["sha256"], r["text"], r["dateprocessed"]) for r in rows], DOC_SCHEMA
    )
    return document_info(df).cache()


def test_website_flat_and_nested(spark, doc_info):
    shas = [r["sha256"] for r in doc_info.select("sha256").collect()]
    summaries = spark.createDataFrame(
        [(s, f"summary {i}", "y" if i % 2 else "n") for i, s in enumerate(shas[:20])],
        ["sha256", "response", "violation"],
    )
    levels = spark.createDataFrame(
        [
            (s, ["low", "moderate", "severe"][i % 3], "because", json.dumps(["neglect", "injury"]))
            for i, s in enumerate(shas[:10])
        ],
        ["sha256", "level", "justification", "keywords"],
    )
    staffing = spark.createDataFrame(
        [(s, "True" if i % 2 else "False", "high", "shift_coverage_gap") for i, s in enumerate(shas[:10])],
        ["sha256", "staffing_problem", "confidence", "primary_reason"],
    )
    facilities = spark.createDataFrame(make_facilities())
    kw_map = spark.createDataFrame(
        [("neglect", "inadequate supervision"), ("injury", "")],
        ["original_keyword", "reduced_keyword"],
    )
    flat = W.build_flat_table(doc_info, summaries, levels, staffing, facilities, kw_map)
    assert flat.count() == doc_info.count()  # left joins never drop docs

    # F12 applied: 'injury' dropped, 'neglect' merged.
    kws = flat.filter(F.size("keywords") > 0).select("keywords").first()
    assert kws["keywords"] == ["inadequate supervision"]

    # P6-P12 parameterized filters compose.
    sirs = W.interactive_filter(flat, sir_only=True)
    assert sirs.count() == doc_info.filter("is_special_investigation").count()
    sev = W.interactive_filter(flat, sir_only=True, severity=["severe"])
    assert sev.count() <= sirs.count()

    nested = W.nest_agencies(flat, ["sha256", "document_title"])
    total = nested.agg(F.sum("total_reports")).first()[0]
    assert total == doc_info.count()
    # Newest-first within each agency (W2).
    docs0 = nested.filter(F.size("documents") > 1).first()["documents"]
    dates = [d["date_iso"] for d in docs0]
    assert dates == sorted(dates, reverse=True)


def test_state_table_merge_idempotent(spark, tmp_path):
    state = ParquetStateTable(spark, str(tmp_path / "state"), "id")
    base = spark.createDataFrame(
        [("a", "x", ""), ("b", "", "p2")], ["id", "sha", "path"]
    )
    state.write_initial(base)
    updates = spark.createDataFrame(
        [("b", "sha-b", ""), ("c", "sha-c", "p3")], ["id", "sha", "path"]
    )
    merged = state.update(updates, ["sha", "path"])
    got = {r["id"]: (r["sha"], r["path"]) for r in merged.collect()}
    assert got == {
        "a": ("x", None),  # untouched
        "b": ("sha-b", "p2"),  # update filled sha, kept existing path
        "c": ("sha-c", "p3"),  # new row
    }
    # Idempotent re-run: same updates → same state.
    again = state.update(updates, ["sha", "path"])
    assert {r["id"]: (r["sha"], r["path"]) for r in again.collect()} == got


def test_pending_work_bounded_deterministic(spark):
    cands = spark.range(0, 100).select(F.col("id").cast("string").alias("k"))
    state = spark.createDataFrame(
        [(str(i), "done" if i % 2 == 0 else "") for i in range(50)], ["k", "status"]
    )
    work = pending_work(cands, state, "k", F.col("status") != "", limit=10)
    keys = [r["k"] for r in work.collect()]
    assert len(keys) == 10
    assert keys == sorted(keys)
    assert all(int(k) % 2 == 1 or int(k) >= 50 for k in keys)


def test_three_way_download_decision(spark):
    api = spark.createDataFrame([("d1",), ("d2",), ("d3",)], ["ContentDocumentId"])
    state = spark.createDataFrame(
        [("d1", "sha1", "/p1"), ("d2", "", "/p2")],
        ["ContentDocumentId", "sha256", "downloaded_path"],
    )
    out = {
        r["ContentDocumentId"]: r["decision"]
        for r in three_way_download_decision(api, state).collect()
    }
    assert out == {"d1": "skip", "d2": "backfill", "d3": "download"}


def test_u1_pdf_extract_kernel(spark):
    df = spark.createDataFrame(
        [("s1", bytearray(b"%PDF-fake-bytes")), ("s2", bytearray(b"%PDF-other"))],
        ["sha256", "content"],
    )
    out = PR.extract_pdf_text(df, extractor=lambda b: [f"p{len(b)}"])
    rows = {r["sha256"]: r["text"] for r in out.collect()}
    assert rows == {"s1": ["p15"], "s2": ["p10"]}


def test_u2_llm_enrich_mock(spark):
    df = spark.createDataFrame(
        [("s1", "clean text"), ("s2", "a violation occurred")],
        ["sha256", "full_text"],
    )
    out = PR.llm_enrich(df, prompt="classify")
    rows = {r["sha256"]: r for r in out.collect()}
    assert rows["s1"]["violation"] == "n"
    assert rows["s2"]["violation"] == "y"
    assert rows["s2"]["input_tokens"] > 0


def test_u3_download_kernel(spark):
    df = spark.createDataFrame([("d1",), ("d2",)], ["ContentDocumentId"])
    out = PR.download_documents(
        df, fetcher=lambda i: b"bytes-" + i.encode() if i == "d1" else None
    )
    rows = {r["ContentDocumentId"]: r for r in out.collect()}
    assert rows["d1"]["download_status"] == "downloaded"
    assert len(rows["d1"]["sha256"]) == 64
    assert rows["d2"]["download_status"] == "failed"


def test_u4_salvage_json():
    assert PR.salvage_json('noise {"a": {"b": 1}} tail')["a"]["b"] == 1
    assert PR.salvage_json("{broken} {\"ok\": true}")["ok"] is True
    assert PR.salvage_json("no json") is None


def test_multimodal_plumbing(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"\xff\xd8\xff" + b"img-bytes" * 10)), (2, bytearray(b"\x89PNG\r\n"))],
        ["media_id", "content"],
    )
    meta = MM.with_media_metadata(df)
    sniffs = {r["media_id"]: r["format_sniff"] for r in meta.collect()}
    assert sniffs == {1: "jpeg", 2: "png"}

    # Fake decoder pinned: these are synthetic non-image bytes, and a
    # real Pillow (if this env ever gains one) must not try to decode.
    feats = MM.extract_image_features(df, decoder=MM._fake_decode_image).collect()
    assert {f["media_id"] for f in feats} == {1, 2}
    assert all(f["width"] >= 16 for f in feats)

    frames = MM.sample_frames(df, every_n=2).collect()
    assert len(frames) > 2  # 1:N fan-out
    with pytest.raises(Exception):
        # strict + junk bytes: NotImplementedError without Pillow, a
        # decode error with it — either way no silent fake.
        MM.extract_image_features(df, strict=True).collect()


def test_asof_join_semantics(spark):
    """Edge semantics: equal-timestamp right row IS visible (>= match);
    a left row before any right row gets null."""
    import datetime as dt

    from mcyj_datapipeline_spark.operators.temporal import asof_join

    D = dt.datetime
    left = spark.createDataFrame(
        [
            (1, 100, D(2024, 1, 1, 9, 0)),   # before any right -> null
            (1, 101, D(2024, 1, 1, 10, 0)),  # ties right@10:00 -> 5.0
            (1, 102, D(2024, 1, 1, 12, 0)),  # latest prior is 11:00 -> 7.0
            (2, 200, D(2024, 1, 1, 12, 0)),  # other key, no rights -> null
        ],
        ["user_id", "event_id", "ts"],
    )
    right = spark.createDataFrame(
        [(1, D(2024, 1, 1, 10, 0), 5.0), (1, D(2024, 1, 1, 11, 0), 7.0)],
        ["user_id", "ts", "value"],
    )
    out = {
        r["event_id"]: r["asof_value"]
        for r in asof_join(left, right, "user_id", "ts", "ts", ["value"]).collect()
    }
    assert out == {100: None, 101: 5.0, 102: 7.0, 200: None}


def test_bucketed_state_table_merge_idempotent(spark, tmp_path):
    """Bucketed layout must give byte-for-byte the same merge semantics
    as the legacy full-rewrite layout (J11 coalesce-merge upsert)."""
    state = ParquetStateTable(spark, str(tmp_path / "state"), "id", num_buckets=4)
    base = spark.createDataFrame(
        [("a", "x", ""), ("b", "", "p2")], ["id", "sha", "path"]
    )
    state.write_initial(base)
    updates = spark.createDataFrame(
        [("b", "sha-b", ""), ("c", "sha-c", "p3")], ["id", "sha", "path"]
    )
    merged = state.update(updates, ["sha", "path"])
    got = {r["id"]: (r["sha"], r["path"]) for r in merged.collect()}
    # "a" lives in an untouched bucket, so — exactly like a Delta MERGE —
    # its row is preserved verbatim ('' stays '', not normalized to null
    # the way the legacy full-rewrite incidentally did). '' and null are
    # both "missing" under the reference contract (sha != '' checks).
    assert got == {
        "a": ("x", ""),
        "b": ("sha-b", "p2"),
        "c": ("sha-c", "p3"),
    }
    again = state.update(updates, ["sha", "path"])
    assert {r["id"]: (r["sha"], r["path"]) for r in again.collect()} == got


def test_bucketed_state_merge_leaves_untouched_partitions_alone(spark, tmp_path):
    """The MERGE contract at scale: a merge touching one key must
    rewrite ONLY that key's hash-bucket — every file in every other
    bucket stays byte-identical (same paths, same bytes)."""
    import hashlib
    import os

    def snapshot(root):
        out = {}
        for dirpath, _dirs, files in os.walk(root):
            for fn in files:
                if fn.endswith(".parquet"):
                    p = os.path.join(dirpath, fn)
                    with open(p, "rb") as f:
                        out[os.path.relpath(p, root)] = hashlib.sha256(
                            f.read()
                        ).hexdigest()
        return out

    state = ParquetStateTable(spark, str(tmp_path / "state"), "id", num_buckets=8)
    base = spark.createDataFrame(
        [(f"k{i}", f"sha{i}", "") for i in range(64)], ["id", "sha", "path"]
    )
    state.write_initial(base)
    data_dir = str(tmp_path / "state" / "data")
    before = snapshot(data_dir)
    buckets_before = {p.split("/")[0] for p in before}
    assert len(buckets_before) == 8  # 64 keys spread over all 8 buckets

    updates = spark.createDataFrame([("k3", "", "new-path")], ["id", "sha", "path"])
    merged = state.update(updates, ["sha", "path"])
    after = snapshot(data_dir)

    changed_buckets = {
        p.split("/")[0]
        for p in set(before) ^ set(after)
        | {p for p in before.keys() & after.keys() if before[p] != after[p]}
    }
    assert len(changed_buckets) == 1  # only k3's bucket was rewritten
    untouched = {p for p in before if not p.startswith(next(iter(changed_buckets)))}
    for p in untouched:
        assert after[p] == before[p]  # byte-identical, never rewritten

    got = {r["id"]: (r["sha"], r["path"]) for r in merged.collect()}
    assert got["k3"] == ("sha3", "new-path")  # coalesce kept sha, added path
    assert len(got) == 64


def test_dq_expectations_count_violations(spark):
    from mcyj_datapipeline_spark.operators.quality import (
        expectations_report,
        referential_violations,
    )

    child = spark.createDataFrame(
        [(1, 10.0), (2, -5.0), (3, None), (9, 0.0)], ["k", "price"]
    )
    parent = spark.createDataFrame([(1,), (2,), (3,)], ["pk"])
    rows = expectations_report(
        child,
        [
            ("nonpositive_price", F.col("price") <= 0),
            ("null_price", F.col("price").isNull()),
        ],
    ).collect()
    got = {r["rule"]: (r["n_violations"], r["n_rows"]) for r in rows}
    # NULL <= 0 is NULL -> not a violation of the range rule (it has
    # its own rule), exactly like SQL FILTER semantics.
    assert got == {"nonpositive_price": (2, 4), "null_price": (1, 4)}

    ref = referential_violations(child, parent, "k", "pk", "orphans").collect()
    assert [(r["rule"], r["n_violations"], r["n_rows"]) for r in ref] == [
        ("orphans", 1, 4)
    ]


def test_interval_overlap_join_edges(spark):
    """Inclusive bounds: touching endpoints overlap; disjoint intervals
    don't; a pair spanning many buckets emits exactly once."""
    import datetime as dt

    from mcyj_datapipeline_spark.operators.temporal import (
        interval_overlap_join,
    )

    D = dt.datetime
    left = spark.createDataFrame(
        [
            (1, D(2024, 1, 1, 0, 0), D(2024, 1, 1, 10, 0)),   # long: many buckets
            (2, D(2024, 1, 1, 5, 0), D(2024, 1, 1, 6, 0)),
        ],
        ["k", "ls", "le"],
    )
    right = spark.createDataFrame(
        [
            (1, D(2024, 1, 1, 2, 0), D(2024, 1, 1, 9, 0)),    # inside left
            (2, D(2024, 1, 1, 6, 0), D(2024, 1, 1, 7, 0)),    # touches at 6:00
            (2, D(2024, 1, 1, 7, 30), D(2024, 1, 1, 8, 0)),   # disjoint
        ],
        ["k", "rs", "re"],
    )
    rows = interval_overlap_join(
        left, right, "k", "ls", "le", "rs", "re", bucket="1 hour"
    ).collect()
    got = {(r["k"], r["rs"]) for r in rows}
    assert got == {(1, D(2024, 1, 1, 2, 0)), (2, D(2024, 1, 1, 6, 0))}
    assert len(rows) == 2  # multi-bucket pair deduped to one row


def test_state_table_time_travel_and_vacuum(spark, tmp_path):
    """Versioned layout: every merge leaves the prior version readable
    (time travel) until vacuum drops superseded versions; the current
    version always survives."""
    import os

    state = ParquetStateTable(spark, str(tmp_path / "st"), "id")
    state.write_initial(
        spark.createDataFrame([("a", "1")], ["id", "v"])
    )
    state.update(spark.createDataFrame([("b", "2")], ["id", "v"]), ["v"])
    state.update(spark.createDataFrame([("c", "3")], ["id", "v"]), ["v"])

    assert {r["id"] for r in state.read(version=0).collect()} == {"a"}
    assert {r["id"] for r in state.read(version=1).collect()} == {"a", "b"}
    assert {r["id"] for r in state.read().collect()} == {"a", "b", "c"}

    removed = state.vacuum(keep_last=1)
    assert removed == 2  # v0, v1 dropped; v2 (current) kept
    assert state.read(version=0) is None
    assert {r["id"] for r in state.read().collect()} == {"a", "b", "c"}
    assert sorted(
        d for d in os.listdir(str(tmp_path / "st")) if d.startswith("v")
    ) == ["v2"]


def test_bucketed_state_read_is_partition_pruned(spark, tmp_path):
    """The merge's read of existing state must prune to the touched
    buckets at PARTITION level (directory listing), not scan-and-filter
    — that is what makes merge cost track the update, not the table."""
    state = ParquetStateTable(spark, str(tmp_path / "st"), "id", num_buckets=8)
    state.write_initial(
        spark.createDataFrame(
            [(f"k{i}", str(i)) for i in range(64)], ["id", "v"]
        )
    )
    touched = [3]
    pruned = (
        spark.read.parquet(str(tmp_path / "st" / "data"))
        .filter(F.col("_bucket").isin(touched))
    )
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "_bucket" in plan.split(
        "PartitionFilters"
    )[1][:120]
    # And the pruned scan reads strictly fewer rows than the table.
    assert 0 < pruned.count() < 64


def test_winsorize_approx_twin_within_tolerance(spark, sf_dir):
    """q1b is now an in-query ε-floor contract (round 4): the sketch's
    tolerance booleans must all hold, and the exact columns it reports
    must agree with the exact twin's own output."""
    from mcyj_datapipeline_spark import registry

    qs = registry.queries()
    exact = qs["q1_winsorized_stats"](spark, sf_dir).first()
    approx = qs["q1b_winsorized_approx"](spark, sf_dir).first()
    assert approx["p01_within_tol"] is True
    assert approx["p99_within_tol"] is True
    assert approx["mean_within_tol"] is True
    assert approx["mean_clipped_exact"] == exact["mean_clipped"]


def test_normalize_text_column_parses_stringified_list(spark):
    """Regression: legacy stringified-Python-list rows must parse into a
    real page array (the old single-alternation regex emitted invalid
    JSON, silently wrapping the whole repr as one page)."""
    from mcyj_datapipeline_spark.plans.document_info import (
        normalize_text_column,
    )

    df = spark.createDataFrame(
        [
            ("['page one', 'page two']",),
            ("['only page']",),
            ("plain text page",),
        ],
        "text string",
    )
    rows = [r["text"] for r in normalize_text_column(df).collect()]
    assert rows[0] == ["page one", "page two"]
    assert rows[1] == ["only page"]
    assert rows[2] == ["plain text page"]


def test_expectations_report_quoted_rule_name(spark, sf_dir):
    from mcyj_datapipeline_spark.io import read_table
    from mcyj_datapipeline_spark.operators.quality import expectations_report
    from pyspark.sql import functions as F

    orders = read_table(spark, sf_dir, "orders")
    rep = expectations_report(
        orders, [("price isn't negative", F.col("o_totalprice") < 0)]
    ).collect()
    assert rep[0]["rule"] == "price isn't negative"
    assert rep[0]["n_violations"] == 0


def test_e12_nightly_fold_is_idempotent_and_screens_exact_dups(
    spark, sf_dir
):
    """E12 contract: (a) re-running the fold in the same process (same
    state) returns the identical cluster map — the nightly job may be
    retried without corrupting state; (b) batch docs that are byte-dups
    of corpus docs never appear in the output; (c) every corpus doc
    survives every fold."""
    from mcyj_datapipeline_spark import registry
    from pyspark.sql import functions as F

    q = registry.queries()["e12_nightly_dedup_fold"]
    first = q(spark, sf_dir).collect()
    second = q(spark, sf_dir).collect()
    assert first == second, "re-folding the same batch changed the state"

    rows = {r["doc_id"]: (r["cluster_id"], r["status"]) for r in first}
    from mcyj_datapipeline_spark.io import read_table

    docs = read_table(spark, sf_dir, "documents")
    corpus_ids = {
        r["doc_id"] for r in docs.filter(F.col("doc_id") < 400).collect()
    }
    assert corpus_ids <= set(rows), "corpus docs lost by the fold"
    # exact corpus-dups in the batch are screened out
    dup_new = {
        r["doc_id"]
        for r in docs.filter(F.col("doc_id") >= 400)
        .withColumn("sha", F.sha2("text", 256))
        .join(
            docs.filter(F.col("doc_id") < 400)
            .select(F.sha2("text", 256).alias("sha"))
            .distinct(),
            "sha",
        )
        .collect()
    }
    assert dup_new.isdisjoint(set(rows)), (
        f"exact corpus-dups ingested: {sorted(dup_new & set(rows))[:5]}"
    )
    # cluster labels are canonical minima: label <= member, label is a member
    clusters = {}
    for d, (c, _) in rows.items():
        clusters.setdefault(c, set()).add(d)
    for c, members in clusters.items():
        assert c == min(members)


@pytest.mark.heavytier
def test_e12b_two_night_fold_sequence_state_evolution(spark, sf_dir):
    """E12b contract: (a) re-running the two-night sequence against the
    already-folded state returns the identical map (retry-safe);
    (b) night-2 docs near-dup ONLY of night-1 docs land in the same
    cluster — the state-evolution case a single-fold oracle can't see
    (requires night 2 to screen against state-recorded night 1, not
    just the corpus); (c) exact dups of prior nights never ingest."""
    from pyspark.sql import functions as F

    from mcyj_datapipeline_spark import registry
    from mcyj_datapipeline_spark.io import read_table

    q = registry.queries()["e12b_two_night_fold"]
    first = q(spark, sf_dir).collect()
    second = q(spark, sf_dir).collect()
    assert first == second, "re-running the fold sequence changed state"

    rows = {r["doc_id"]: (r["cluster_id"], r["status"]) for r in first}
    docs = read_table(spark, sf_dir, "documents")
    # (c) exact dups of earlier nights are screened, in order
    shas = {
        r["doc_id"]: r["sha"]
        for r in docs.select(
            "doc_id", F.sha2("text", 256).alias("sha")
        ).collect()
    }
    for d, sha in shas.items():
        if 400 <= d < 450:
            dup_of_corpus = any(
                shas[e] == sha for e in shas if e < 400
            )
            if dup_of_corpus:
                assert d not in rows, f"night-1 corpus-dup {d} ingested"
        elif d >= 450 and d in rows:
            assert not any(
                shas[e] == sha for e in shas if e < 450
            ), f"night-2 doc {d} is a byte-dup of an earlier doc"
    # statuses partition by night
    for d, (_, status) in rows.items():
        expected = (
            "corpus" if d < 400 else "night1" if d < 450 else "night2"
        )
        assert status == expected
    # (b) cluster labels are canonical minima over their members
    clusters = {}
    for d, (c, _) in rows.items():
        clusters.setdefault(c, set()).add(d)
    for c, members in clusters.items():
        assert c == min(members), (c, sorted(members)[:5])


@pytest.mark.heavytier
def test_e12_state_tables_stay_one_row_per_key_across_three_nights(
    spark, sf_dir
):
    """E12 state-growth bound: the pre-sketched fold makes the state
    tables (digests, cluster map, MinHash signatures) the permanent
    corpus-sized artifact — a bug that re-appended rows per night would
    silently multiply nightly cost. Over a 3-night sequence (corpus
    <350, then [350,400), [400,450), [450,∞)) assert after EVERY fold:
    each state table holds exactly one row per key, the cluster map and
    signature table cover exactly the ingested doc set, digests hold
    exactly one row per distinct content sha seen so far — and a RETRY
    of the last night leaves every row count unchanged."""
    from pyspark.sql import functions as F

    from mcyj_datapipeline_spark.io import read_table
    from mcyj_datapipeline_spark.registry_batch13 import (
        _e12_bootstrap,
        _e12_fold_night,
        _e12_state,
    )

    docs = read_table(spark, sf_dir, "documents")
    digests, clusters, sigs = _e12_state(spark, sf_dir, "e12growth")
    _e12_bootstrap(spark, docs, digests, clusters, sigs, corpus_hi=350)

    def check(seen_hi):
        cl = clusters.read()
        sg = sigs.read()
        dg = digests.read()
        n_cl, k_cl = cl.count(), cl.select("doc_id").distinct().count()
        n_sg, k_sg = sg.count(), sg.select("doc_id").distinct().count()
        n_dg, k_dg = (
            dg.count(),
            dg.select("content_sha").distinct().count(),
        )
        assert n_cl == k_cl, f"cluster map has dup doc rows ({n_cl}/{k_cl})"
        assert n_sg == k_sg, f"signatures re-appended ({n_sg}/{k_sg})"
        assert n_dg == k_dg, f"digest table has dup shas ({n_dg}/{k_dg})"
        # ingested set == cluster-map keys == signature keys
        assert n_cl == n_sg, f"cluster map {n_cl} != signatures {n_sg}"
        # digests: one row per distinct sha over every doc SEEN so far
        # (screened dups still contribute their sha — it's already there)
        want_shas = (
            docs.filter(F.col("doc_id") < seen_hi)
            .select(F.sha2("text", 256))
            .distinct()
            .count()
        )
        assert n_dg == want_shas, f"digests {n_dg} != seen shas {want_shas}"
        return n_cl, n_sg, n_dg

    check(350)
    _e12_fold_night(docs, 350, 400, digests, clusters, sigs)
    check(400)
    _e12_fold_night(docs, 400, 450, digests, clusters, sigs)
    check(450)
    _e12_fold_night(docs, 450, None, digests, clusters, sigs)
    before = check(10**9)
    # retry of the last night: a no-op on every table
    _e12_fold_night(docs, 450, None, digests, clusters, sigs)
    assert check(10**9) == before, "re-fold grew the state tables"
