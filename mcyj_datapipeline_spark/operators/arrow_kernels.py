"""Arrow-native kernels via ``mapInArrow`` — the third tier of the
Python-kernel spectrum.

Tier 1 is JVM column expressions (always preferred), tier 2 is pandas
UDFs (Arrow transfer + pandas materialization per batch), tier 3 —
this module — is ``mapInArrow``: the same Arrow batch transfer but NO
pandas conversion on either side, with the computation itself running
in Arrow's C++ compute kernels (``pyarrow.compute``). For kernels
expressible in pc.* this skips both the pandas object materialization
and any per-row Python, so the only Python cost is per-BATCH dispatch
— the cheapest possible Python seam. Use it when a kernel needs a
library that speaks Arrow natively (tokenizers, Arrow-native ML
featurizers) or when pandas conversion dominates a pandas UDF.
"""

from __future__ import annotations

from collections.abc import Iterator

import pyarrow as pa
import pyarrow.compute as pc
from pyspark.sql import DataFrame


def _token_stats_batches(
    batches: Iterator[pa.RecordBatch],
) -> Iterator[pa.RecordBatch]:
    """Per-document whitespace-token stats computed entirely in Arrow
    C++ kernels: regex split -> flatten -> non-empty mask -> one
    hash group-by on the list-parent index. Parent indices are
    ascending and every document owns >= 1 slot (splitting '' yields
    ['']), so the group-by result realigns 1:1 with the batch after a
    defensive sort."""
    for b in batches:
        # fill_null BEFORE splitting: a null list gets NO parent index
        # from pc.list_parent_indices, which would desync the group-by
        # realignment (n-1 groups vs n rows) — NULL text counts as the
        # empty document, matching the oracle's coalesce.
        text = pc.fill_null(pc.cast(b.column("text"), pa.string()), "")
        toks = pc.split_pattern_regex(text, r"\s+")
        flat = pc.list_flatten(toks)
        parents = pc.list_parent_indices(toks)
        nonempty = pc.not_equal(flat, "")
        tbl = pa.table(
            {
                "p": parents,
                "ne": pc.cast(nonempty, pa.int64()),
                "len": pc.if_else(
                    nonempty, pc.utf8_length(flat), pa.scalar(0, pa.int64())
                ),
            }
        )
        agg = (
            tbl.group_by("p")
            .aggregate([("ne", "sum"), ("len", "sum")])
            .sort_by("p")
        )
        yield pa.RecordBatch.from_arrays(
            [
                b.column("doc_id"),
                agg.column("ne_sum").combine_chunks(),
                agg.column("len_sum").combine_chunks(),
            ],
            ["doc_id", "n_tokens", "tok_chars"],
        )


def token_stats_arrow(docs: DataFrame) -> DataFrame:
    """``(doc_id, n_tokens, tok_chars)`` per document — byte-identical
    semantics to the tier-1 expression path (``TA.tokens`` /
    non-empty whitespace tokens; tok_chars sums unicode codepoints of
    the kept tokens), proven by the registry oracle."""
    return docs.select("doc_id", "text").mapInArrow(
        _token_stats_batches, "doc_id long, n_tokens long, tok_chars long"
    )
