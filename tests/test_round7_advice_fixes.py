"""Regression tests for the round-6 ADVICE items (all four fixed in
round 7):

1. ``plans/doc_export.py`` keyed(): last-wins dedup must not rest on
   monotonically_increasing_id reflecting read order on multi-split
   inputs — callers can stamp an explicit ``_ord``; without one the
   frame is collapsed to a single partition before stamping.
2. ``operators/graph.py`` label_propagation and
   ``operators/similarity.py`` label_outliers: the smallest-label
   tie-break negated the LABEL column, which silently cast string
   labels to null; both now negate the numeric score inside
   min(struct(...)) so any orderable label type works.
3. ``operators/multimodal.py`` image_dhash: decoder id-awareness is
   now decided by REQUIRED parameter count (the audio_fingerprint
   form), so ``lambda content, n=72`` is not miscalled with
   (content, media_id).
4. ``operators/quality.py`` column_profile: built with typed Columns
   (inline/struct), so hostile column names (quotes, commas,
   backticks) profile fine instead of breaking a string-spliced
   stack() expression.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mcyj_datapipeline_spark.operators.graph import label_propagation
from mcyj_datapipeline_spark.operators.multimodal import image_dhash
from mcyj_datapipeline_spark.operators.quality import column_profile
from mcyj_datapipeline_spark.operators.similarity import label_outliers
from mcyj_datapipeline_spark.plans.doc_export import build_doc_export


# ------------------------------------------------- 1. doc_export order


def _docs(spark):
    return spark.createDataFrame(
        [("a" * 64, "2024-01-02", ["p1"])],
        "sha256 string, dateprocessed string, text array<string>",
    )


def test_doc_export_explicit_ord_wins_over_physical_order(spark):
    """A caller-stamped ``_ord`` decides last-wins even when the
    physical row order is scrambled across partitions — the seam a
    multi-file loader uses (file_seq * 2^32 + line_no)."""
    info = (
        spark.createDataFrame(
            [
                ("a" * 64, "AG-LATEST", 7),
                ("a" * 64, "AG-stale-high-partition", 3),
                ("a" * 64, "AG-stale", 1),
            ],
            "sha256 string, agency_id string, _ord long",
        )
        .withColumn("agency_name", F.lit("n"))
        .withColumn("document_title", F.lit("t"))
        .withColumn("date", F.lit("2020-01-01"))
        .withColumn("is_special_investigation", F.lit("false"))
        # scramble physical placement: without _ord, id-order would be
        # partition-dependent here
        .repartition(4, "agency_id")
    )
    out = build_doc_export(_docs(spark), document_info=info).collect()
    assert len(out) == 1
    assert out[0]["metadata"]["agency_id"] == "AG-LATEST"


def test_doc_export_without_ord_is_line_order_on_multipartition(spark):
    """No ``_ord`` → the frame is collapsed to one partition before
    stamping, so the LAST input row wins regardless of how many
    partitions the caller's frame arrived in."""
    rows = [
        ("a" * 64, f"AG-{i}", "n", "t", "2020-01-01", "false")
        for i in range(8)
    ]
    info = spark.createDataFrame(
        rows,
        "sha256 string, agency_id string, agency_name string, "
        "document_title string, date string, "
        "is_special_investigation string",
    ).repartition(5)
    # after coalesce(1) the stamp order is the (single) partition's
    # iteration order; with one upstream narrow repartition the rows
    # stay whole, so exactly one row must win and the export must not
    # fan out — the invariant the reference dict-load guarantees
    out = build_doc_export(_docs(spark), document_info=info).collect()
    assert len(out) == 1
    assert out[0]["metadata"]["agency_id"].startswith("AG-")


# --------------------------------------- 2. string-label tie-breaks


def test_label_propagation_string_node_ids(spark):
    """String node ids must propagate real labels (the old -label
    tie-break cast them all to NULL). A 4-clique labels itself with
    its smallest member name."""
    edges = [
        (a, b)
        for a in ("w", "x", "y", "z")
        for b in ("w", "x", "y", "z")
        if a != b
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {
        r["node"]: r["label"]
        for r in label_propagation(df, "src", "dst", iterations=3).collect()
    }
    assert set(got) == {"w", "x", "y", "z"}
    assert all(v is not None for v in got.values())
    # every member's votes are symmetric -> tie -> smallest label wins
    assert set(got.values()) == {"w"}


def test_label_outliers_string_labels_tiebreak_smallest(spark):
    """String labels work end-to-end, and an exact centroid tie breaks
    to the SMALLEST label: identical clusters 'a' and 'b' -> every 'b'
    vector's best centroid resolves to 'a' (delta 0), every 'a' vector
    is its own best (not flagged)."""
    rows = [(f"a{i}", "a", [1.0, 0.0]) for i in range(3)] + [
        (f"b{i}", "b", [1.0, 0.0]) for i in range(3)
    ]
    df = spark.createDataFrame(
        rows, "vec_id string, label string, embedding array<double>"
    )
    out = label_outliers(df).collect()
    assert sorted(r["vec_id"] for r in out) == ["b0", "b1", "b2"]
    assert all(r["best_label"] == "a" for r in out)
    assert all(abs(r["delta"]) < 1e-9 for r in out)


def test_label_outliers_string_labels_flag_planted(spark):
    rows = (
        [(f"a{i}", "alpha", [1.0, 0.0]) for i in range(4)]
        + [(f"b{i}", "beta", [0.0, 1.0]) for i in range(4)]
        + [("odd", "alpha", [0.0, 1.0])]
    )
    df = spark.createDataFrame(
        rows, "vec_id string, label string, embedding array<double>"
    )
    out = label_outliers(df).collect()
    assert [r["vec_id"] for r in out] == ["odd"]
    assert out[0]["best_label"] == "beta"
    assert out[0]["delta"] > 0


# --------------------------------- 3. decoder required-param counting


def test_image_dhash_defaulted_param_decoder_not_miscalled(spark):
    """``lambda content, n=7`` has ONE required parameter — image_dhash
    must call it (content) only. If it were miscalled with
    (content, media_id), n would vary per row and so would the hash;
    called correctly, every row hashes identically."""
    df = spark.createDataFrame(
        [(i, b"xyz") for i in range(1, 6)], "media_id long, content binary"
    )

    def decoder(content, n=7):
        return [(i * n) % 251 for i in range(72)]

    got = image_dhash(df, grid_decoder=decoder).collect()
    assert len(got) == 5
    assert len({r["dhash"] for r in got}) == 1

    # two REQUIRED params still route the id through (the +mid offset
    # shifts where the +97 steps wrap mod 251, so adjacent-cell
    # comparisons — hence the dhash — differ per id)
    def id_decoder(content, media_id):
        return [((i + media_id) * 97) % 251 for i in range(72)]

    got2 = image_dhash(df, grid_decoder=id_decoder).collect()
    assert len({r["dhash"] for r in got2}) == 5


# ------------------------------------- 4. hostile identifier profiling


def test_column_profile_hostile_column_names(spark):
    hostile = "we,ird'na`me\"x"
    df = spark.createDataFrame(
        [(1, "a"), (2, None)], ["id", "plain"]
    ).withColumnRenamed("plain", hostile)
    got = {
        (r["column"], r["metric"]): r["value"]
        for r in column_profile(df, [hostile], numeric_cols=["id"]).collect()
    }
    assert got[(hostile, "completeness")] == 0.5
    assert got[(hostile, "distinct_count")] == 1.0
    assert got[("id", "mean")] == 1.5
