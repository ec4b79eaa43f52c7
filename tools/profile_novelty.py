#!/usr/bin/env python3
"""Stagewise profile of text_ngram_novelty (VERDICT r10 #3).

Times, in ONE session per sf, min-of-3 with cleared caches:
  stage A  — explode + df groupBy alone (the posting shuffle)
  stage B  — totals via explode+groupBy (current) vs size() (variant)
  full     — current shape vs size-based-totals variant

Usage: python tools/profile_novelty.py /root/testdata/sf0.1 [reps]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from mcyj_datapipeline_spark.io import read_table
from mcyj_datapipeline_spark.operators import dedup as D
from mcyj_datapipeline_spark.session import get_spark


def timed(spark, label, build, reps):
    outs = []
    for _ in range(reps):
        spark.catalog.clearCache()
        t0 = time.monotonic()
        df = build()
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(F.xxhash64(F.struct(*df.columns))).alias("h"),
        ).collect()[0]
        outs.append(time.monotonic() - t0)
    print(
        f"{label}: min {min(outs):.3f}s reps "
        f"{[round(x, 3) for x in outs]} rows={row['n']}"
    )
    return min(outs)


def main():
    sf_dir = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark(app_name="profile-novelty")
    docs = read_table(spark, sf_dir, "documents")
    docs.count()  # footer warm

    def inv():
        return docs.select(
            "doc_id",
            "lang",
            F.explode(D.word_shingles(F.col("text"), 3)).alias("shingle"),
        )

    def dfagg():
        return inv().groupBy("shingle").agg(
            F.count(F.lit(1)).alias("df"),
            F.min(F.struct("doc_id", "lang")).alias("owner"),
        )

    def totals_explode():
        return inv().groupBy("doc_id", "lang").agg(
            F.count(F.lit(1)).alias("n_shingles")
        )

    def totals_size():
        return (
            docs.select(
                "doc_id",
                "lang",
                D.word_shingles(F.col("text"), 3).alias("sh"),
            )
            .select("doc_id", "lang", F.size("sh").alias("n_shingles"))
            .filter(F.col("n_shingles") > 0)
        )

    def novel():
        return (
            dfagg()
            .filter(F.col("df") == 1)
            .groupBy(
                F.col("owner.doc_id").alias("doc_id"),
                F.col("owner.lang").alias("lang"),
            )
            .agg(F.count(F.lit(1)).alias("n_novel"))
        )

    def full(totals_fn):
        def build():
            return (
                totals_fn()
                .join(novel(), ["doc_id", "lang"], "left")
                .na.fill({"n_novel": 0})
                .select(
                    "doc_id",
                    "lang",
                    "n_shingles",
                    "n_novel",
                    F.round(
                        F.col("n_novel").cast("double")
                        / F.col("n_shingles"),
                        6,
                    ).alias("novelty"),
                )
                .orderBy("doc_id")
            )

        return build

    # warmup both full shapes once (codegen)
    for fn in (full(totals_explode), full(totals_size)):
        fn().limit(1).count()

    timed(spark, "stage df-agg (posting shuffle)", dfagg, reps)
    timed(spark, "stage totals explode (current)", totals_explode, reps)
    timed(spark, "stage totals size()  (variant)", totals_size, reps)
    timed(spark, "FULL current (explode totals) ", full(totals_explode), reps)
    timed(spark, "FULL variant (size totals)    ", full(totals_size), reps)
    spark.stop()


if __name__ == "__main__":
    main()
