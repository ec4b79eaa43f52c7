"""Batch 7 tests: bloom-screen incremental dedup semantics and plan
shape, band-join strategy, top-k shape, and the bigram LM score.

Oracle value parity for every batch-7 query runs in
test_oracle_parity.py automatically; these tests cover what the oracle
cannot — size bounds, exactness under forced false positives, and
physical plan strategy.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mcyj_datapipeline_spark.registry_batch7 import (
    bloom_bitmap,
    bloom_screen_new,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------------------
# bloom_bitmap / bloom_screen_new
# ---------------------------------------------------------------------------


def test_bloom_bitmap_row_count_is_bounded_by_m(spark):
    """The bitmap's cardinality is <= m/64 words no matter how many
    keys fold in — THE property that keeps the screen broadcastable at
    any corpus size."""
    keys = spark.range(5000).select(F.conv(F.col("id"), 10, 16).alias("k"))
    m_bits = 1024
    bm = bloom_bitmap(keys, "k", m_bits=m_bits, k=4)
    n = bm.count()
    assert n <= m_bits // 64
    # 5000 keys x 4 probes over 1024 bits: every word should be hot.
    assert n == m_bits // 64


def test_bloom_screen_exact_even_when_bloom_saturated(spark):
    """With m=64 bits and 500 corpus keys the bloom is fully saturated
    (every probe is a false positive) — the confirm join must still
    make the final answer EXACT: identical to the plain anti-join."""
    corpus = spark.range(500).select(
        F.concat(F.lit("doc-"), F.col("id")).alias("k")
    )
    batch = spark.range(400, 600).select(
        F.concat(F.lit("doc-"), F.col("id")).alias("k")
    )
    got = sorted(
        r["k"]
        for r in bloom_screen_new(batch, corpus, "k", m_bits=64, k=4)
        .select("k")
        .collect()
    )
    want = sorted(f"doc-{i}" for i in range(500, 600))
    assert got == want


def test_bloom_screen_no_false_negatives(spark):
    """A bloom can never drop a true duplicate: every batch key present
    in the corpus must be absent from the screen output at ANY m."""
    corpus = spark.range(300).select(F.col("id").cast("string").alias("k"))
    batch = spark.range(0, 300, 3).select(
        F.col("id").cast("string").alias("k")
    )  # all duplicates
    for m_bits in (64, 4096, 1 << 16):
        assert (
            bloom_screen_new(batch, corpus, "k", m_bits=m_bits, k=4).count()
            == 0
        )


def test_bloom_screen_probe_is_broadcast(spark, sf_dir):
    """The bitmap probe must be a broadcast hash join (map-side
    screen), never a shuffled join on the probe positions."""
    import __spark_entry__ as e

    df = e.queries()["dedup_bloom_screen"](spark, sf_dir)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    # The probe side (batch x k positions) must not shuffle for the
    # bitmap lookup: no Exchange may feed the bitmap join's streamed
    # side. Cheap proxy: the only SortMergeJoin allowed is none.
    assert "SortMergeJoin" not in plan


def test_bloom_confirm_join_sees_only_maybes(spark):
    """The exact anti-join's probe side must be the bloom POSITIVES
    only — definite-new rows skip the shuffle. Verified by counting
    rows through the screen stages with a bloom sized so most of the
    batch is definitely-new."""
    corpus = spark.range(100).select(F.col("id").cast("string").alias("k"))
    batch = spark.range(100, 10100).select(
        F.col("id").cast("string").alias("k")
    )
    m_bits = 1 << 16  # comfortably sized: fp rate ~ (1-e^-kn/m)^k << 1
    bitmap = bloom_bitmap(corpus, "k", m_bits=m_bits, k=4)
    probes = batch.select(
        "k",
        F.explode(
            F.array(
                *[
                    F.pmod(F.xxhash64(F.col("k"), F.lit(j)), F.lit(m_bits))
                    for j in range(4)
                ]
            )
        ).alias("pos"),
    ).select(
        "k",
        (F.col("pos") / 64).cast("long").alias("word_idx"),
        F.expr("shiftleft(1L, cast(pos % 64 as int))").alias("mask"),
    )
    maybes = (
        probes.join(F.broadcast(bitmap), "word_idx", "left")
        .select(
            "k",
            (
                F.col("bits").isNotNull()
                & (F.col("bits").bitwiseAND(F.col("mask")) == F.col("mask"))
            ).alias("hit"),
        )
        .groupBy("k")
        .agg(F.every("hit").alias("maybe_dup"))
        .filter("maybe_dup")
        .count()
    )
    # All 10k batch keys are new; with a sane bloom only a tiny
    # fraction may false-positive into the confirm join.
    assert maybes < 500  # < 5% of the batch pays the shuffle


# ---------------------------------------------------------------------------
# plan shapes for the SQL batch
# ---------------------------------------------------------------------------


def test_band_join_is_broadcast_nested_loop(spark, sf_dir):
    """The 4-row tier table must drive a BroadcastNestedLoopJoin (map-
    side interval probe) — not a CartesianProduct shuffle."""
    import __spark_entry__ as e

    plan = _plan(e.queries()["j17_band_join_price_tier"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_sql13_uses_take_ordered(spark, sf_dir):
    """Top-20 big orders must be TakeOrderedAndProject (per-partition
    heaps), never a global Sort + Limit."""
    import __spark_entry__ as e

    plan = _plan(e.queries()["sql13_big_orders"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan


def test_sql11_aggregates_revenue_once(spark, sf_dir):
    """Q15 shape: the quarter-revenue rollup feeds both the max scalar
    and the probe; the plan must contain the lineitem scan at most
    twice (once per reuse is acceptable without an explicit cache) and
    the max side must come in as a broadcast."""
    import __spark_entry__ as e

    plan = _plan(e.queries()["sql11_top_supplier"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


# ---------------------------------------------------------------------------
# bigram LM score semantics
# ---------------------------------------------------------------------------


def test_bigram_logprob_orders_junk_below_fluent(spark, sf_dir):
    """A fluent-text document must outscore a junk (rare-char) one
    under the corpus-trained bigram model — the semantic point of the
    perplexity-proxy filter."""
    import __spark_entry__ as e

    scored = e.queries()["text_bigram_logprob"](spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    rows = (
        scored.join(docs, "doc_id")
        .select("doc_id", "avg_log2p", F.length("text").alias("n"))
        .collect()
    )
    assert len(rows) > 0
    # All log-probs are negative and finite.
    assert all(r["avg_log2p"] < 0 for r in rows)


def test_stream_dedup_bloom_screened(spark, tmp_path):
    """foreachBatch bloom-screened ingest: per-batch the persisted
    bitmap screens, the key table confirms, and BOTH pieces of state
    absorb the admitted keys — a later run drops everything admitted
    earlier, the bitmap stays bounded, and intra-batch dups collapse."""
    from pyspark.sql import types as T

    from mcyj_datapipeline_spark.streaming.events import (
        stream_dedup_bloom_screened,
    )

    schema = T.StructType(
        [
            T.StructField("sha256", T.StringType()),
            T.StructField("body", T.StringType()),
        ]
    )
    src, sink, state, ckpt = (
        str(tmp_path / d) for d in ("src", "sink", "state", "ck")
    )
    m_bits = 4096

    spark.createDataFrame(
        [("A", "first"), ("B", "second"), ("A", "intra-dup")], schema
    ).write.mode("append").parquet(src)
    stream_dedup_bloom_screened(
        spark, src, sink, state, ckpt, schema, m_bits=m_bits
    )
    got1 = {r["sha256"] for r in spark.read.parquet(sink).collect()}
    assert got1 == {"A", "B"}

    # Second run: A is cross-run dup, C is new.
    spark.createDataFrame(
        [("A", "dup-later"), ("C", "third")], schema
    ).write.mode("append").parquet(src)
    stream_dedup_bloom_screened(
        spark, src, sink, state, ckpt, schema, m_bits=m_bits
    )
    rows = spark.read.parquet(sink).collect()
    assert {r["sha256"] for r in rows} == {"A", "B", "C"}
    assert len(rows) == 3  # A admitted exactly once across runs

    # Bitmap state bounded and versioned.
    import os

    versions = sorted(os.listdir(f"{state}/bitmap"))
    assert len(versions) == 2
    latest = spark.read.parquet(
        f"{state}/bitmap/{versions[-1]}"
    )
    assert latest.count() <= m_bits // 64


def test_bpe_top_merges_hand_computed(spark):
    """The Sennrich toy corpus, hand-walked: 'low'x3 + 'lower' +
    'lowest'. Round 1 ties ('l o' and 'o w' both 5) and must break on
    pair asc; rounds 2-3 follow the merged symbols."""
    from mcyj_datapipeline_spark.operators.text_analysis import (
        bpe_top_merges,
    )

    docs = spark.createDataFrame(
        [(1, "low low low lower lowest")], "doc_id long, text string"
    )
    rows = [
        (r["iteration"], r["pair"], r["merged"], r["pair_count"])
        for r in bpe_top_merges(docs, k=3).orderBy("iteration").collect()
    ]
    assert rows == [
        (1, "l o", "lo", 5),
        (2, "lo w", "low", 5),
        (3, "low e", "lowe", 2),
    ]


def test_bpe_merge_applies_everywhere_and_weights_by_frequency(spark):
    """A pair occurring once in a frequent word must outrank a pair
    occurring in many distinct but rare words only when the weighted
    count says so; after the merge, the pair no longer exists in any
    word's symbols (next round's top differs)."""
    from mcyj_datapipeline_spark.operators.text_analysis import (
        bpe_top_merges,
    )

    # 'zz' pair appears in one word repeated 10 times (weight 10);
    # 'ab' appears in 4 distinct words once each (weight 4)
    docs = spark.createDataFrame(
        [(1, " ".join(["qzz"] * 10 + ["abc", "abd", "abe", "abf"]))],
        "doc_id long, text string",
    )
    rows = [
        (r["iteration"], r["pair"], r["pair_count"])
        for r in bpe_top_merges(docs, k=2).orderBy("iteration").collect()
    ]
    # 'q z' and 'z z' both weigh 10 (the frequent word contributes
    # both); the tie breaks on pair asc, so 'q z' merges first and
    # round 2's symbols are 'qz z' — weight still 10, ahead of the
    # 4-weight 'a b'
    assert rows[0] == (1, "q z", 10)
    assert rows[1] == (2, "qz z", 10)
