"""Python user-defined TABLE functions (Spark 4 UDTF API).

One-row-in/N-rows-out text expansion as a first-class relation: the
UDTF participates in SQL like any table source — including correlated
``LATERAL`` references to outer columns — instead of the
array-column + ``explode`` two-step. Arrow-optimized (``useArrow``),
so batches cross the Python boundary columnar, same transfer path as
the Pandas-UDF kernels.

When to prefer which: ``explode(split(...))`` stays fully JVM-side and
wins whenever the expansion is expressible in Spark SQL functions;
the UDTF is the seam for expansions that need real Python (a model
tokenizer, a spaCy sentencizer) while keeping the SQL shape. The
sentence splitter here is deliberately regex-simple so the registry
query has an exact DuckDB oracle.
"""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf

_SENTENCE_BREAK = re.compile(r"[.!?]+\s+")


@udtf(returnType="idx int, sentence string", useArrow=True)
class SplitSentences:
    """Split ``text`` on sentence-ending punctuation followed by
    whitespace; one output row per non-empty fragment with its
    0-based position. NULL text expands to zero rows (matching SQL
    NULL propagation through unnest)."""

    def eval(self, text):  # noqa: D102 — contract described above
        if text is None:
            return
        idx = 0
        for part in _SENTENCE_BREAK.split(text):
            if part != "":
                yield idx, part
                idx += 1


def register_udtfs(spark) -> None:
    """Idempotent registration of the UDTF catalog names."""
    spark.udtf.register("split_sentences", SplitSentences)
