#!/usr/bin/env python3
"""Simulate the driver's correctness gate: run registered oracle pairs
at sf0.01 (the driver's scale) and report mismatches. The pytest gate
runs the same compare at sf0.001; this catches anything
scale-sensitive (rounding at bigger sums, bucket boundaries, skew).

Usage:
    python tools/check_driver_gate.py [sf_dir]
    python tools/check_driver_gate.py [sf_dir] --sample N --seed R

The full run verifies every oracle (~3-4 min). ``--sample N`` verifies
a seeded random subset of N oracles in well under a minute — the cheap
spot-audit for reviewers: any seed re-verifies a reproducible slice of
the registry, so repeated audits with different seeds cover it all
without anyone trusting a single committed log.
"""

from __future__ import annotations

import argparse
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mcyj_datapipeline_spark import registry
from mcyj_datapipeline_spark.session import get_spark
from tests.oracle_compare import compare, duckdb_conn


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.01")
    ap.add_argument(
        "--sample",
        type=int,
        default=None,
        help="verify only N oracles, chosen by --seed (spot-audit mode)",
    )
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument(
        "--match",
        default=None,
        help="comma-separated name prefixes — verify only matching "
        "queries (family mode, e.g. 'dedup_,sim_,sk_' to re-run the "
        "scale-sensitive ANN/dedup/sketch contracts at a bigger sf)",
    )
    args = ap.parse_args()

    spark = get_spark(app_name="driver-gate-check")
    con = duckdb_conn(args.sf_dir)
    qs, oracles = registry.queries(), registry.oracle_sql()
    names = sorted(oracles)
    rows_only = sorted(set(qs) - set(oracles))
    if args.match:
        prefixes = tuple(p for p in args.match.split(",") if p)
        names = [n for n in names if n.startswith(prefixes)]
        rows_only = [n for n in rows_only if n.startswith(prefixes)]
        print(
            f"family mode: {len(names)} oracles + {len(rows_only)} "
            f"rows-only match {prefixes}"
        )
    if args.sample is not None:
        rng = random.Random(args.seed)
        names = sorted(rng.sample(names, min(args.sample, len(names))))
        rows_only = []  # spot-audit targets value oracles only
        print(
            f"spot-audit: {len(names)} of {len(oracles)} oracles "
            f"(seed={args.seed}): {', '.join(names)}"
        )
    failures = []
    t0 = time.monotonic()
    for name in names:
        try:
            ok, msg = compare(qs[name](spark, args.sf_dir), con, oracles[name])
        except Exception as ex:
            ok, msg = False, f"{type(ex).__name__}: {str(ex)[:200]}"
        if not ok:
            failures.append((name, msg))
            print(f"FAIL {name}: {msg}")
    for name in rows_only:
        try:
            # materialize values, not count(): a bare count lets the
            # optimizer prune the output expressions this smoke-test
            # exists to execute
            from bench import materialized_count

            materialized_count(qs[name](spark, args.sf_dir))
        except Exception as ex:
            failures.append((name, str(ex)[:200]))
            print(f"FAIL (rows-only) {name}: {str(ex)[:200]}")
    dt = time.monotonic() - t0
    print(
        f"{len(names) - sum(1 for n, _ in failures if n in oracles)}/"
        f"{len(names)} oracles match, {len(rows_only)} rows-only ran, "
        f"{dt:.0f}s at {args.sf_dir}"
    )
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
