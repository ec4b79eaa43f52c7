#!/usr/bin/env python3
"""Contention-independent structural metrics per query: stages, tasks,
shuffle read/write bytes, input bytes, executor run/CPU time.

Wall-clock on this microVM moves 2-3x with co-tenant load (bench.py's
probe divergence), but the plan's SHAPE — how many stages run, how many
bytes shuffle — is a pure function of code + data. This reads Spark's
AppStatusStore after running each named query in isolation (fresh
spark.catalog.clearCache() per query, bench's materialized_count), and
prints one JSON line per query. Used for optimization A/B while the
host is noisy; wall-clock confirmation happens on a quiet host.

Usage: python tools/measure_structure.py QUERY [QUERY...]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import materialized_count  # noqa: E402
from mcyj_datapipeline_spark import registry  # noqa: E402
from mcyj_datapipeline_spark.session import get_spark  # noqa: E402


def _stage_totals(spark) -> dict:
    """Sum metrics over ALL completed stages via AppStatusStore."""
    sc = spark.sparkContext
    store = sc._jsc.sc().statusStore()
    it = store.stageList(
        sc._jvm.java.util.ArrayList(),
        getattr(store, "stageList$default$2")(),
        getattr(store, "stageList$default$3")(),
        getattr(store, "stageList$default$4")(),
        getattr(store, "stageList$default$5")(),
    ).iterator()
    tot = {
        "stages": 0,
        "tasks": 0,
        "shuffle_read_mb": 0.0,
        "shuffle_write_mb": 0.0,
        "input_mb": 0.0,
        "run_sec": 0.0,
        "cpu_sec": 0.0,
    }
    while it.hasNext():
        s = it.next()
        tot["stages"] += 1
        tot["tasks"] += s.numCompleteTasks()
        tot["shuffle_read_mb"] += s.shuffleReadBytes() / 1e6
        tot["shuffle_write_mb"] += s.shuffleWriteBytes() / 1e6
        tot["input_mb"] += s.inputBytes() / 1e6
        tot["run_sec"] += s.executorRunTime() / 1e3
        tot["cpu_sec"] += s.executorCpuTime() / 1e9
    return tot


def main() -> int:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # retain every stage: the default 1000-stage eviction silently
    # corrupts before/after deltas once a few warm reps have run
    spark = get_spark(
        app_name="measure-structure",
        extra_conf={
            "spark.ui.retainedStages": "1000000",
            "spark.ui.retainedJobs": "1000000",
        },
    )
    qs = registry.queries()
    # warm tables + python workers like bench does
    from mcyj_datapipeline_spark.io import read_table

    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        read_table(spark, sf_dir, t).count()
    reps = int(os.environ.get("MEASURE_REPS", "2"))
    for name in names:
        # warm rep(s) then one measured rep: cold codegen/JIT inflates
        # run_sec and the host-stall lottery inflates wall; the LAST
        # rep's structure is the steady-state plan shape
        for rep in range(reps):
            spark.catalog.clearCache()
            before = _stage_totals(spark)
            t0 = time.monotonic()
            n = materialized_count(qs[name](spark, sf_dir))
            wall = time.monotonic() - t0
            after = _stage_totals(spark)
        delta = {k: round(after[k] - before[k], 2) for k in after}
        delta["query"] = name
        delta["rows"] = n
        delta["wall_sec"] = round(wall, 2)
        print(json.dumps(delta))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
