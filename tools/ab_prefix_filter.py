#!/usr/bin/env python3
"""Bench-regime A/B for `prefix_filter_jaccard_pairs` defaults
(VERDICT r9 #2): the r8->r9 `hash_keys` flip-flop was decided on
local reps whose variance (warm spread 2.8-6.8 s, GC 42-110 ms/rep)
exceeded the effect being measured. This tool times each variant
under the SAME regime bench.py uses — fresh-JVM-equivalent warmup,
clearCache + GC release between reps, min/spread over warm reps —
and prints one JSON line per variant plus a verdict, so the default
is decided from data taken under the regime that graded it.

Variants: (hash_keys x persist_intermediates). Each rep materializes
the full output row hash (bench.py's materialized_count) so nothing
prunes. Run:

    python tools/ab_prefix_filter.py [sf_dir] [reps]

Defaults: /root/testdata/sf0.1, 5 warm reps (min + spread reported).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    warm_reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    from pyspark.sql import functions as F

    from bench import _release_pinned_blocks, materialized_count
    from mcyj_datapipeline_spark.io import read_table
    from mcyj_datapipeline_spark.operators.dedup import (
        prefix_filter_jaccard_pairs,
    )
    from mcyj_datapipeline_spark.session import get_spark

    spark = get_spark(app_name="ab-prefix-filter")
    docs = read_table(spark, sf_dir, "documents")
    docs.count()  # footer/page-cache warm

    variants = {
        "str_nopersist": dict(hash_keys=False, persist_intermediates=False),
        "str_persist": dict(hash_keys=False, persist_intermediates=True),
        "hash_nopersist": dict(hash_keys=True, persist_intermediates=False),
        "hash_persist": dict(hash_keys=True, persist_intermediates=True),
    }

    gc_beans = (
        spark.sparkContext._jvm.java.lang.management.ManagementFactory
        .getGarbageCollectorMXBeans()
    )

    results = {}
    baseline_hash = None
    for name, kw in variants.items():
        # warmup once per variant (codegen/JIT for this plan shape)
        df = prefix_filter_jaccard_pairs(docs, threshold=0.5, **kw)
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(F.xxhash64(F.struct(*df.columns))).alias("h"),
        ).collect()[0]
        n_rows, out_hash = row["n"], row["h"]
        if baseline_hash is None:
            baseline_hash = (n_rows, out_hash)
        spark.catalog.clearCache()
        _release_pinned_blocks(spark)
        reps, gcs = [], []
        for _ in range(warm_reps):
            spark.catalog.clearCache()
            _release_pinned_blocks(spark)
            gc0 = sum(b.getCollectionTime() for b in gc_beans)
            t0 = time.monotonic()
            n = materialized_count(
                prefix_filter_jaccard_pairs(docs, threshold=0.5, **kw)
            )
            reps.append(round(time.monotonic() - t0, 3))
            gcs.append(
                sum(b.getCollectionTime() for b in gc_beans) - gc0
            )
            assert n == n_rows, f"{name}: row count moved between reps"
        results[name] = {
            "min": min(reps),
            "spread": round(max(reps) - min(reps), 3),
            "reps": reps,
            "gc_ms": gcs,
            "rows": n_rows,
            "out_hash_matches_str_nopersist": (n_rows, out_hash)
            == baseline_hash,
        }
        print(f"# {name}: {results[name]}", file=sys.stderr)

    best = min(results, key=lambda k: results[k]["min"])
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "warm_reps": warm_reps,
                "variants": results,
                "best": best,
            },
            indent=1,
        )
    )


if __name__ == "__main__":
    main()
