"""Behavioral tests for the batch-4 corpus-cleaning operators:
boilerplate line removal, line repetition signals, SemDeDup — on
constructed corpora with KNOWN boilerplate / duplicates."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mcyj_datapipeline_spark.operators import similarity as S
from mcyj_datapipeline_spark.operators import text_analysis as TA

FOOTER = "subscribe to our newsletter"


@pytest.fixture(scope="module")
def lined_docs(spark):
    """Newline-delimited docs where a footer line appears in 3 of 4
    documents and one document is ALL boilerplate."""
    rows = [
        (1, "alpha beta\n" + FOOTER + "\ngamma delta"),
        (2, "epsilon zeta\n" + FOOTER),
        (3, FOOTER),
        (4, "unique only content"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"]).cache()


def test_boilerplate_line_dropped_everywhere(lined_docs):
    lines = TA.split_lines(lined_docs)
    out = {
        r["doc_id"]: r
        for r in TA.remove_boilerplate_lines(
            lines, min_docs=3, joiner="\n"
        ).collect()
    }
    assert out[1]["clean_text"] == "alpha beta\ngamma delta"
    assert out[1]["n_kept"] == 2 and out[1]["n_dropped"] == 1
    assert out[2]["clean_text"] == "epsilon zeta"
    # the all-boilerplate doc survives as an empty row, not a lost id
    assert out[3]["clean_text"] == "" and out[3]["n_kept"] == 0
    assert out[4]["clean_text"] == "unique only content"
    assert out[4]["n_dropped"] == 0


def test_boilerplate_threshold_respected(lined_docs):
    # min_docs=4: the footer appears in only 3 docs, so nothing drops
    lines = TA.split_lines(lined_docs)
    out = TA.remove_boilerplate_lines(lines, min_docs=4)
    assert out.agg(F.sum("n_dropped")).collect()[0][0] == 0


def test_reassembly_preserves_order(spark):
    text = " ".join(f"w{i}" for i in range(30))
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    lines = TA.window_lines(df, line_words=3)
    out = TA.remove_boilerplate_lines(lines, min_docs=2).collect()[0]
    assert out["clean_text"] == text  # nothing dropped, order intact


def test_line_repetition_signals_flag_template_doc(spark):
    spam = " ".join(["buy now cheap"] * 10)  # one 3-gram repeated
    clean = " ".join(f"w{i}" for i in range(30))
    df = spark.createDataFrame(
        [(1, spam), (2, clean)], ["doc_id", "text"]
    )
    sig = {
        r["doc_id"]: r
        for r in TA.line_repetition_signals(df, line_words=3).collect()
    }
    assert sig[1]["dup_line_frac"] > 0.8
    assert sig[1]["dup_line_char_frac"] == 1.0
    assert sig[1]["top_trigram_share"] > 0.3
    assert sig[2]["dup_line_frac"] == 0.0
    assert sig[2]["dup_line_char_frac"] == 0.0
    assert sig[2]["top_trigram_share"] < 0.1


def test_semdedup_drops_known_near_duplicate(spark):
    # 2-d embeddings: ids 0,1 are the centroids (corpus members, so
    # they compete too — keep the others at cos < tau from them).
    # 10 and 11 sit in centroid-0's half-plane at ~45 deg (cos ~0.7
    # from the centroid), near-copies of each other (cos ~ 1); 12 is
    # alone in centroid-1's half-plane.
    rows = [
        (0, [1.0, 0.0]),
        (1, [-1.0, 0.0]),
        (10, [0.7, 0.7]),
        (11, [0.69, 0.71]),
        (12, [-0.7, 0.7]),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    kept = {
        r["vec_id"]: r["centroid_id"]
        for r in S.semantic_dedup_winners(
            df, tau=0.95, n_centroids=2
        ).collect()
    }
    assert 10 in kept and 11 not in kept  # smaller id wins the pair
    assert 12 in kept  # different cluster, untouched
    assert kept[10] == 0 and kept[12] == 1
    # centroids themselves near-dup their cluster-mates only above tau
    assert 0 in kept and 1 in kept
