#!/usr/bin/env python3
"""Stagewise profile of k8_time_travel_read (VERDICT r11 #2: +25%
r10->r11, heaviest non-graph query at 2.55 s in BENCH_DETAIL).

The query times FOUR stages per invocation: overwrite-write
generation 1 (bucket 0 of orders), append-write generation 2
(bucket 1), then the two version-pinned aggregate reads. This tool
splits them, min-of-N in one session with cleared caches, so the
write-vs-read trade is measured rather than guessed.

Usage: python tools/profile_k8.py /root/testdata/sf0.1 [reps]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from mcyj_datapipeline_spark.io import read_table
from mcyj_datapipeline_spark.operators.hashing import hash60
from mcyj_datapipeline_spark.session import get_spark


def main():
    sf_dir = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark(app_name="profile-k8")
    from mcyj_datapipeline_spark.sources import (
        read_jsonl_atomic,
        register_jsonl_atomic,
    )

    register_jsonl_atomic(spark)
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    orders.count()  # footer warm
    bucket = hash60(F.col("o_orderkey").cast("string")) % 3

    def agg_of(out, version):
        return (
            read_jsonl_atomic(spark, out, version=version)
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            )
            .collect()[0]
        )

    stages = {k: [] for k in ("write_v1", "write_v2", "read_v1",
                              "read_v2", "total")}
    for _ in range(reps):
        spark.catalog.clearCache()
        out = os.path.join(tempfile.mkdtemp(prefix="mcyj_k8prof_"), "t")
        t0 = time.monotonic()
        orders.filter(bucket == 0).write.format("jsonl_atomic").mode(
            "overwrite"
        ).save(out)
        t1 = time.monotonic()
        orders.filter(bucket == 1).write.format("jsonl_atomic").mode(
            "append"
        ).save(out)
        t2 = time.monotonic()
        r1 = agg_of(out, 1)
        t3 = time.monotonic()
        r2 = agg_of(out, 2)
        t4 = time.monotonic()
        stages["write_v1"].append(t1 - t0)
        stages["write_v2"].append(t2 - t1)
        stages["read_v1"].append(t3 - t2)
        stages["read_v2"].append(t4 - t3)
        stages["total"].append(t4 - t0)
        shutil.rmtree(os.path.dirname(out), ignore_errors=True)
    print(f"sf={sf_dir} reps={reps} rows v1={r1['n_rows']} v2={r2['n_rows']}")
    for k, v in stages.items():
        print(f"{k}: min {min(v):.3f}s reps {[round(x, 3) for x in v]}")


if __name__ == "__main__":
    main()
