#!/usr/bin/env python3
"""Run one registered query by name and show its result + physical plan.

Usage: python tools/run_query.py QUERY_NAME [sf_dir] [--plan] [--oracle]

  --plan    also print the executed physical plan
  --oracle  also run the DuckDB oracle side-by-side (if registered)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = {a for a in sys.argv[1:] if a.startswith("--")}
    if not args:
        from mcyj_datapipeline_spark import registry

        print("\n".join(sorted(registry.queries())))
        return 0
    name = args[0]
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.001"

    from mcyj_datapipeline_spark import registry
    from mcyj_datapipeline_spark.session import get_spark

    qs = registry.queries()
    if name not in qs:
        print(f"unknown query {name!r}; run with no args to list", file=sys.stderr)
        return 1
    spark = get_spark(app_name=f"run-{name}")
    # persist: show() + count() would otherwise execute the plan twice
    df = qs[name](spark, sf_dir).persist()
    df.show(20, truncate=False)
    print(f"rows: {df.count()}")
    if "--plan" in flags:
        print(df._jdf.queryExecution().executedPlan().toString())
    if "--oracle" in flags:
        sql = registry.oracle_sql().get(name)
        if sql is None:
            print("(no oracle registered — rows-only query)")
        else:
            # reuse the canonical table list — an inline copy drifts
            # when fixtures gain tables (check_driver_gate already
            # imports the same helper)
            from tests.oracle_compare import duckdb_conn

            con = duckdb_conn(sf_dir)
            print(con.execute(sql).df().head(20).to_string())
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
