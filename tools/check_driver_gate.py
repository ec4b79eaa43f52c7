#!/usr/bin/env python3
"""Simulate the driver's correctness gate: run EVERY registered oracle
pair at sf0.01 (the driver's scale) and report mismatches. The pytest
gate runs the same compare at sf0.001; this catches anything
scale-sensitive (rounding at bigger sums, bucket boundaries, skew).

Usage: python tools/check_driver_gate.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mcyj_datapipeline_spark import registry
from mcyj_datapipeline_spark.session import get_spark
from tests.oracle_compare import compare, duckdb_conn


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="driver-gate-check")
    con = duckdb_conn(sf_dir)
    qs, oracles = registry.queries(), registry.oracle_sql()
    failures = []
    t0 = time.monotonic()
    for name in sorted(oracles):
        try:
            ok, msg = compare(qs[name](spark, sf_dir), con, oracles[name])
        except Exception as ex:
            ok, msg = False, f"{type(ex).__name__}: {str(ex)[:200]}"
        if not ok:
            failures.append((name, msg))
            print(f"FAIL {name}: {msg}")
    rows_only = sorted(set(qs) - set(oracles))
    for name in rows_only:
        try:
            # materialize values, not count(): a bare count lets the
            # optimizer prune the output expressions this smoke-test
            # exists to execute
            from bench import materialized_count

            materialized_count(qs[name](spark, sf_dir))
        except Exception as ex:
            failures.append((name, str(ex)[:200]))
            print(f"FAIL (rows-only) {name}: {str(ex)[:200]}")
    dt = time.monotonic() - t0
    print(
        f"{len(oracles) - sum(1 for n, _ in failures if n in oracles)}/"
        f"{len(oracles)} oracles match, {len(rows_only)} rows-only ran, "
        f"{dt:.0f}s at {sf_dir}"
    )
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
