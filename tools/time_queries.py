#!/usr/bin/env python3
"""Isolated bench-regime timing of named queries: one fresh JVM, bench-
identical methodology (table warm, per-query warmup rep, min of 1+N
cache-cleared reps via materialized_count).

Usage: python tools/time_queries.py QUERY [QUERY...]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
       SPARK_GRAFT_WARM_REPS (default 3)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import run_batch  # noqa: E402


def main() -> int:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out = run_batch(names, sf_dir)
    print(json.dumps({
        "queries": out["queries"],
        "queries_reps": out["queries_reps"],
        "calib_sec": out["calib_sec"],
        "calib_serial_sec": out["calib_serial_sec"],
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
