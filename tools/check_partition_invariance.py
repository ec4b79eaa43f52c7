#!/usr/bin/env python3
"""Partition-invariance audit: every query's result must be IDENTICAL
under different physical partitioning — the determinism property that
separates "passes on local[32]" from "correct on a 1000-executor
cluster", where shuffle partitioning, AQE coalescing, and task
ordering all differ from the test harness.

For each sampled query the tool runs the SAME plan twice in one
session, flipping the runtime knobs between executions:

  run A: spark.sql.shuffle.partitions = 32, AQE on   (the test default)
  run B: spark.sql.shuffle.partitions = 5,  AQE off  (a hostile layout)

and compares the normalized outputs (the oracle harness's normalize —
column-sorted, 6dp float rounding, row-sorted). A mismatch means the
query's result depends on partition count or execution order:
unstable float reduction orders beyond the rounding contract,
first/last without ordering, partition-dependent sampling — the bugs
a single-layout gate can never see.

Usage:
    python tools/check_partition_invariance.py [sf_dir] [--sample N --seed R]
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
from tests.oracle_compare import _normalize


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.01")
    ap.add_argument("--sample", type=int, default=None)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument(
        "--match",
        default=None,
        help="comma-separated name prefixes — audit only matching queries",
    )
    args = ap.parse_args()

    spark = get_spark(app_name="partition-invariance")
    qs = registry.queries()
    names = sorted(qs)
    if args.match:
        prefixes = tuple(p for p in args.match.split(",") if p)
        names = [n for n in names if n.startswith(prefixes)]
        print(f"family mode: {len(names)} queries match {prefixes}")
    if args.sample is not None:
        rng = random.Random(args.seed)
        names = sorted(rng.sample(names, min(args.sample, len(names))))
        print(
            f"sampled {len(names)} of {len(qs)} queries "
            f"(seed={args.seed}): {', '.join(names)}"
        )

    failures, errors = [], []
    t0 = time.monotonic()
    for name in names:
        try:
            spark.conf.set("spark.sql.shuffle.partitions", "32")
            spark.conf.set("spark.sql.adaptive.enabled", "true")
            a = _normalize(qs[name](spark, args.sf_dir).toPandas())
            spark.conf.set("spark.sql.shuffle.partitions", "5")
            spark.conf.set("spark.sql.adaptive.enabled", "false")
            b = _normalize(qs[name](spark, args.sf_dir).toPandas())
        except Exception as e:  # noqa: BLE001
            errors.append(name)
            print(f"ERR  {name}: {type(e).__name__}: {str(e)[:160]}")
            continue
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", "32")
            spark.conf.set("spark.sql.adaptive.enabled", "true")
        if len(a) != len(b) or not a.equals(b):
            failures.append(name)
            print(
                f"FAIL {name}: layout-dependent result "
                f"({len(a)} vs {len(b)} rows)"
            )
    took = int(time.monotonic() - t0)
    print(
        f"{len(names) - len(failures) - len(errors)}/{len(names)} "
        f"partition-invariant, {len(failures)} layout-dependent, "
        f"{len(errors)} errored, {took}s at {args.sf_dir}"
    )
    return 1 if failures or errors else 0


if __name__ == "__main__":
    sys.exit(main())
