"""Batch 38 registry entries (round 6, continued): the Arrow-native
kernel tier —

- ``f31_arrow_native_kernel``: per-document token stats computed via
  ``mapInArrow`` + ``pyarrow.compute`` — Arrow batches cross the
  Python boundary and the work runs in Arrow's C++ kernels with NO
  pandas materialization and NO per-row Python, completing the
  three-tier kernel spectrum (JVM expressions -> pandas UDF ->
  Arrow-native). The oracle is the exact tier-1 semantics, so the
  value hash proves the tiers agree.

The companion CBO/ANALYZE and WindowGroupLimit coverage is
plan-level — see tests/test_batch38.py.

Reference provenance: none direct — engine-surface completion per
the SURVEY.md mandate.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mcyj_datapipeline_spark.io import read_table
from mcyj_datapipeline_spark.registry import register

__all__ = ["f31_arrow_native_kernel"]


@register(
    "f31_arrow_native_kernel",
    r"""
    SELECT doc_id,
           coalesce(len(list_filter(string_split_regex(text, '\s+'),
                                    t -> t <> '')), 0) AS n_tokens,
           coalesce(list_sum(list_transform(
             list_filter(string_split_regex(text, '\s+'), t -> t <> ''),
             t -> length(t))), 0)::BIGINT AS tok_chars
    FROM documents ORDER BY doc_id
    """,
    "The Arrow-native kernel tier (mapInArrow + pyarrow.compute): "
    "whitespace-token count and kept-token character mass per "
    "document, computed as regex-split -> flatten -> non-empty mask "
    "-> one hash group-by on the list-parent index — ALL in Arrow "
    "C++ kernels; Python touches only per-batch dispatch, with no "
    "pandas materialization on either side of the boundary. The "
    "oracle re-states tier-1 expression semantics, so the hash "
    "compare proves the Arrow path computes exactly what the JVM "
    "path would. Map-only plan: at 100 TB this is an "
    "embarrassingly parallel scan, and the kernel shape is the "
    "template for Arrow-speaking libraries (tokenizers, "
    "featurizers) that would otherwise pay the pandas tax.",
)
def f31_arrow_native_kernel(spark, sf_dir):
    from mcyj_datapipeline_spark.operators.arrow_kernels import (
        token_stats_arrow,
    )

    docs = read_table(spark, sf_dir, "documents")
    return token_stats_arrow(docs).select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("tok_chars").cast("long").alias("tok_chars"),
    ).orderBy("doc_id")
