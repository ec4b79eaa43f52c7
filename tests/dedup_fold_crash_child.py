"""Subprocess harness for the streaming dedup-fold crash-restart test
(NOT a pytest module — driven by ``test_stream_dedup_fold.py``).

Runs :func:`streaming.dedup_fold.stream_dedup_fold` with
``Trigger.AvailableNow`` over a landing dir the parent prepared. The
crashing invocation is SIGKILLed by the parent inside a fold (between
``offsets/N`` and ``commits/N``); the second invocation drains the
remaining batches on the same checkpoint and exits 0.

Usage::

    python dedup_fold_crash_child.py LANDING STATE_ROOT CKPT
"""

from __future__ import annotations

import os
import sys


def main() -> int:
    landing, state_root, ckpt = sys.argv[1:4]

    # small, fast-booting session: this child's job is protocol
    # behavior, not throughput
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "1g")
    os.environ.setdefault("SPARK_GRAFT_DRIVER_JAVA_OPTS", "-Xms512m")

    from mcyj_datapipeline_spark.session import get_spark
    from mcyj_datapipeline_spark.streaming.dedup_fold import (
        stream_dedup_fold,
    )

    spark = get_spark(app_name=f"dedup_fold_crash_child_{os.getpid()}")
    stream_dedup_fold(
        spark,
        landing,
        state_root,
        ckpt,
        # versioned layout: every state commit is an atomic pointer
        # swap, so kill -9 anywhere leaves clean per-table versions
        num_buckets=None,
        max_files_per_trigger=1,
        available_now=True,
    )
    print("DRAINED")
    return 0


if __name__ == "__main__":
    sys.exit(main())
