#!/usr/bin/env python3
"""Iterations-vs-tolerance table for PageRank early exit (VERDICT r10
#8). For the g1 purchase graph at a given sf: how many rounds each
tolerance needs, what it costs wall-clock vs the oracle-pinned
fixed-3 run, and what residual fixed-3 actually leaves.

Usage: python tools/pagerank_tolerance_table.py <sf_dir>
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from mcyj_datapipeline_spark.operators.graph import (
    pagerank,
    pagerank_converged,
)
from mcyj_datapipeline_spark.registry_batch49 import _purchase_edges
from mcyj_datapipeline_spark.session import get_spark


def main():
    sf_dir = sys.argv[1]
    spark = get_spark(app_name="pagerank-tol")
    edges = _purchase_edges(spark, sf_dir)
    edges.count()

    def run_fixed(n):
        spark.catalog.clearCache()
        t0 = time.monotonic()
        r = pagerank(edges, iterations=n)
        r.agg(F.bit_xor(F.xxhash64(F.struct(*r.columns)))).collect()
        return time.monotonic() - t0

    def run_conv(tol, check_every=1):
        spark.catalog.clearCache()
        t0 = time.monotonic()
        r, its, delta = pagerank_converged(
            edges, tol=tol, max_iterations=60, check_every=check_every
        )
        r.agg(F.bit_xor(F.xxhash64(F.struct(*r.columns)))).collect()
        return time.monotonic() - t0, its, delta

    run_fixed(3)  # warm
    t3 = min(run_fixed(3) for _ in range(3))
    # residual fixed-3 leaves: delta between rounds 3 and 2
    r3, r2 = pagerank(edges, iterations=3), pagerank(edges, iterations=2)
    resid3 = (
        r3.alias("a")
        .join(r2.alias("b"), F.col("a.node") == F.col("b.node"))
        .agg(F.max(F.abs(F.col("a.rank") - F.col("b.rank"))).alias("d"))
        .collect()[0]["d"]
    )
    print(f"fixed-3: min {t3:.2f}s  residual_after={resid3:.2e}")
    for tol in (1e-3, 1e-4, 1e-5, 1e-6):
        best = None
        for _ in range(2):
            t, its, delta = run_conv(tol)
            best = min(best, t) if best is not None else t
        print(
            f"tol {tol:.0e}: {its} rounds, min {best:.2f}s "
            f"({best / t3:.1f}x fixed-3), final delta {delta:.2e}"
        )
    # check_every amortization at the tightest tol
    for ce in (1, 3, 5):
        t, its, delta = run_conv(1e-6, check_every=ce)
        print(f"tol 1e-06 check_every={ce}: {its} rounds, {t:.2f}s")
    spark.stop()


if __name__ == "__main__":
    main()
