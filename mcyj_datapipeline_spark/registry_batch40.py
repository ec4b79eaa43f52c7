"""Batch 40 registry entries (round 6, continued): the hashing-trick
featurizer —

- ``ml_feature_hashing``: fixed-width text features via the hashing
  trick (Weinberger 2009): every token maps to ``hash(term) % D``
  and per-document bucket counts form the feature vector — D-wide
  regardless of vocabulary, no fitted dictionary, no OOV problem,
  mergeable across shards. The bucket hash is the shared 60-bit md5
  (the engine-portable construction every sketch here uses), so the
  full featurization is value-oracled cross-engine.

Reference provenance: none direct — beyond-reference ML featurizer
per the SURVEY.md mandate.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mcyj_datapipeline_spark.io import read_table
from mcyj_datapipeline_spark.operators import text_analysis as TA
from mcyj_datapipeline_spark.operators.hashing import hash60, hash60_sql
from mcyj_datapipeline_spark.registry import register

__all__ = ["ml_feature_hashing"]

_FH_DIM = 64  # feature width; production uses 2^18+ — nothing changes


@register(
    "ml_feature_hashing",
    rf"""
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(text, '\s+'),
                                t -> t <> '')) AS term
      FROM documents
    )
    SELECT doc_id,
           (abs({hash60_sql('term')}) % {_FH_DIM})::INT AS bucket,
           count(*) AS tf
    FROM toks
    GROUP BY 1, 2
    ORDER BY doc_id, bucket
    """,
    "The hashing-trick featurizer: token -> shared-md5 hash -> "
    f"bucket (mod {_FH_DIM}), per-document bucket term frequencies "
    "as sparse (doc, bucket, tf) rows — fixed-width features with NO "
    "fitted dictionary, no OOV handling, and shard-mergeable counts "
    "(sum per bucket), which is why it is the default text "
    "featurizer at corpus scale (production widens D to 2^18+; the "
    "plan is identical). One tokenize pass, one (doc, bucket) "
    "groupBy; the hash is the engine-portable 60-bit md5 so the "
    "entire featurization is value-oracled, not just row-counted.",
)
def ml_feature_hashing(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(TA.tokens(F.col("text"))).alias("term")
    )
    return (
        toks.select(
            "doc_id",
            (F.abs(hash60(F.col("term"))) % _FH_DIM)
            .cast("int")
            .alias("bucket"),
        )
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).alias("tf"))
        .orderBy("doc_id", "bucket")
    )
