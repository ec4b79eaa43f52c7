"""Subprocess harness for the crash-restart streaming test (NOT a
pytest module — driven by ``test_stream_crash_restart.py``).

Runs the full Data Source API quartet — ``rest_pages`` stream reader
into the ``jsonl_atomic`` manifest sink — against a shared checkpoint.
A per-row sleeping UDF filter widens every micro-batch's
offset-written → batch-committed window to several hundred ms so the
parent process can land a SIGKILL deterministically inside it.

Usage::

    python crash_restart_child.py CKPT TARGET PAGES PAGE_SIZE \
        PAGES_PER_BATCH SLEEP_MS_PER_ROW EXPECTED_ROWS TIMEOUT_S

Exits 0 once the sink manifest holds EXPECTED_ROWS rows (then stops
the query cleanly); exits 3 on timeout. The crashing invocation never
reaches either — the parent kills it first.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> int:
    (
        ckpt,
        target,
        pages,
        page_size,
        pages_per_batch,
        sleep_ms,
        expected_rows,
        timeout_s,
    ) = sys.argv[1:9]

    # small, fast-booting session: this child's job is protocol
    # behavior, not throughput
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "1g")
    os.environ.setdefault(
        "SPARK_GRAFT_DRIVER_JAVA_OPTS", "-Xms512m"
    )

    from pyspark.sql import functions as F
    from pyspark.sql.types import BooleanType

    from mcyj_datapipeline_spark.session import get_spark
    from mcyj_datapipeline_spark.sources import (
        register_jsonl_atomic,
        register_rest_source,
    )

    spark = get_spark(app_name=f"crash_restart_child_{os.getpid()}")
    register_rest_source(spark)
    register_jsonl_atomic(spark)

    delay = int(sleep_ms) / 1000.0

    @F.udf(BooleanType())
    def _slow_true(_page):
        time.sleep(delay)
        return True

    sdf = (
        spark.readStream.format("rest_pages")
        .option("pages", pages)
        .option("page_size", page_size)
        .option("pages_per_batch", pages_per_batch)
        .load()
        .filter(_slow_true(F.col("page")))
    )
    q = (
        sdf.writeStream.format("jsonl_atomic")
        .option("path", target)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="0 seconds")
        .start()
    )

    mp = os.path.join(target, "_committed.json")
    deadline = time.time() + float(timeout_s)
    want = int(expected_rows)
    while time.time() < deadline:
        if q.exception() is not None:
            print(f"child: query failed: {q.exception()}", flush=True)
            return 2
        try:
            with open(mp) as fh:
                if json.load(fh).get("rows", 0) >= want:
                    q.stop()
                    return 0
        except (OSError, ValueError):
            pass
        time.sleep(0.1)
    print("child: timeout before manifest reached target", flush=True)
    return 3


if __name__ == "__main__":
    sys.exit(main())
