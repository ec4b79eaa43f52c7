"""Bounded-state sketch operators: space-saving heavy hitters with an
exact recount phase, and bloom-bitmap merging for cross-run incremental
screens.

These exist for the regime where exact two-phase aggregation stops
working: a groupBy's map-side partial state is O(distinct keys per
task), which is fine for grouped rollups but unbounded for open-domain
keys (tokens, URLs, n-grams) at 100 TB. Space-saving caps per-task
state at a fixed capacity with a proven guarantee (Metwally et al.
2005, public): every key with global frequency > N/capacity survives
as a candidate in at least one partition (averaging argument), so a
final exact recount of the candidate set alone returns the EXACT top-k
whenever the k-th frequency clears that threshold — capacity is a
memory knob, not an accuracy knob, once it is sized to the data.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _space_saving_candidates(
    df: DataFrame, col: str, capacity: int
) -> DataFrame:
    """Phase 1: per-partition space-saving. Emits <= capacity candidate
    keys per partition regardless of input size — the bounded-state
    part. Arrow-batched (mapInPandas); the per-row work is one dict
    update, and the Python stage's output is the tiny candidate list,
    never the data."""

    def ss(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts: dict[str, int] = {}
        for pdf in batches:
            for v in pdf[col]:
                if v is None:
                    continue
                if v in counts:
                    counts[v] += 1
                elif len(counts) < capacity:
                    counts[v] = 1
                else:
                    # evict the current minimum, inherit its count + 1:
                    # the space-saving overestimate that preserves the
                    # "no heavy hitter evicted for good" guarantee.
                    mk = min(counts, key=counts.get)
                    mv = counts.pop(mk)
                    counts[v] = mv + 1
        yield pd.DataFrame({col: list(counts.keys())})

    return df.select(col).mapInPandas(ss, f"{col} string")


def heavy_hitters_topk(
    df: DataFrame, col: str, k: int = 20, capacity: int = 4096
) -> DataFrame:
    """Exact top-k most frequent values of ``col`` with bounded
    aggregation state.

    Two phases: (1) space-saving candidate generation — per-partition
    state capped at ``capacity`` entries; (2) exact recount of ONLY the
    candidate keys (broadcast semi-join) + TakeOrdered k. The result is
    provably exact when the true k-th frequency exceeds N/capacity
    (guaranteed at test scale where capacity >= distinct count; at
    100 TB, capacity ~ 1e5 per task covers any Zipfian corpus where
    top-k frequencies are >> N/1e5).

    Output: (value, cnt) sorted by cnt desc with value as tiebreak.
    """
    cands = _space_saving_candidates(df, col, capacity).distinct()
    return (
        df.join(F.broadcast(cands), col, "left_semi")
        .groupBy(F.col(col).alias("value"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), "value")
        .limit(k)
    )


def bloom_merge(*bitmaps: DataFrame) -> DataFrame:
    """Merge bloom bitmaps built by
    :func:`mcyj_datapipeline_spark.registry_batch7.bloom_bitmap` over
    the SAME (m_bits, k) geometry: union + bit_or per word. Because
    bit_or is commutative/associative/idempotent, merging the bitmaps
    of two corpora equals the bitmap of their union (property-tested)
    — which is what makes the screen incremental across runs: persist
    the bitmap (m/64 rows), bit_or each new batch's bitmap in, never
    rebuild from the full corpus."""
    if not bitmaps:
        raise ValueError("bloom_merge needs at least one bitmap")
    out = bitmaps[0]
    for b in bitmaps[1:]:
        out = out.unionByName(b)
    return out.groupBy("word_idx").agg(F.bit_or("bits").alias("bits"))
