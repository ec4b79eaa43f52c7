#!/usr/bin/env python3
"""Stagewise profile of e8_curation_pipeline (VERDICT r10 #4).

Times each stage CUMULATIVELY (url winners -> quality gate -> content
winners -> split -> packing -> final rollup) min-of-3 in one session,
so stage N's marginal cost = cum(N) - cum(N-1) under the same
concurrency. Also A/Bs the full pipeline against a variant that
shares the quality_kept subtree via persist.

Usage: python tools/profile_e8.py <sf_dir> [reps]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from mcyj_datapipeline_spark.io import read_table
from mcyj_datapipeline_spark.operators import text_analysis as TA
from mcyj_datapipeline_spark.session import get_spark


def timed(spark, label, build, reps):
    outs = []
    n = None
    for _ in range(reps):
        spark.catalog.clearCache()
        t0 = time.monotonic()
        df = build()
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(F.xxhash64(F.struct(*df.columns))).alias("h"),
        ).collect()[0]
        n = row["n"]
        outs.append(time.monotonic() - t0)
    print(
        f"{label}: min {min(outs):.3f}s reps "
        f"{[round(x, 3) for x in outs]} rows={n}"
    )
    return min(outs)


def main():
    sf_dir = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark(app_name="profile-e8")
    from mcyj_datapipeline_spark.functions import urls as U
    from mcyj_datapipeline_spark.operators.sampling import split_assign
    from mcyj_datapipeline_spark.registry_batch5 import _MESSY_URL_SPARK

    docs = read_table(spark, sf_dir, "documents")
    docs.count()

    def url_winners():
        with_url = docs.withColumn("url", F.expr(_MESSY_URL_SPARK))
        return (
            with_url.groupBy(U.url_key(F.col("url")).alias("_uk"))
            .agg(F.min("doc_id").alias("doc_id"))
            .select("doc_id")
        )

    def quality_kept():
        return (
            docs.join(url_winners(), "doc_id", "left_semi")
            .filter(TA.quality_score(F.col("text")) >= 0.5)
            .select("doc_id", "lang", "text")
        )

    def content_winners(qk):
        return (
            qk.groupBy(F.sha2("text", 256).alias("_sha"))
            .agg(F.min("doc_id").alias("doc_id"))
            .select("doc_id")
        )

    def kept(qk):
        return split_assign(
            qk.join(content_winners(qk), "doc_id", "left_semi"),
            key="doc_id",
        )

    def full(qk_fn):
        def build():
            qk = qk_fn()
            pieces = TA.pack_training_sequences(
                kept(qk).withColumn(
                    "stream_key", F.concat_ws("|", "split", "lang")
                ),
                seq_len=128,
                stream_col="stream_key",
            )
            return (
                pieces.withColumn("split", F.split("stream", "\\|")[0])
                .withColumn("lang", F.split("stream", "\\|")[1])
                .groupBy("split", "lang")
                .agg(
                    F.countDistinct("doc_id").alias("n_docs"),
                    F.sum("piece_tokens").alias("n_tokens"),
                    F.countDistinct("seq_id").alias("n_sequences"),
                )
                .orderBy("split", "lang")
            )

        return build

    # codegen warm
    full(quality_kept)().limit(1).count()

    timed(spark, "cum1 url_winners              ", url_winners, reps)
    timed(spark, "cum2 quality_kept (drop text) ",
          lambda: quality_kept().select("doc_id", "lang"), reps)
    timed(spark, "cum3 + content_winners        ",
          lambda: content_winners(quality_kept()), reps)
    timed(spark, "cum4 + split (kept, drop text)",
          lambda: kept(quality_kept()).select("doc_id", "lang", "split"),
          reps)
    timed(spark, "FULL current                  ", full(quality_kept), reps)

    def qk_persisted():
        qk = quality_kept().persist()
        return qk

    t = timed(spark, "FULL qk-persisted             ", full(qk_persisted), reps)
    spark.catalog.clearCache()
    spark.stop()
    return t


if __name__ == "__main__":
    main()
