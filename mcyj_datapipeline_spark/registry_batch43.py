"""Batch 43 registry entry (round 6, continued): crawl-boundary
overlap detection —

- ``dedup_boundary_overlap``: documents whose TAIL n-gram equals
  another document's HEAD n-gram — the signature of crawl-pagination
  artifacts and bad chunking (one logical document split across two
  records with an overlap seam). Document-level digests, MinHash,
  and even span dedup miss this case when the overlap is shorter
  than their shingle/window floor; the boundary join targets exactly
  the seam.

Reference provenance: none direct — beyond-reference dedup family
completion per the SURVEY.md mandate.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mcyj_datapipeline_spark.io import read_table
from mcyj_datapipeline_spark.operators import text_analysis as TA
from mcyj_datapipeline_spark.registry import register

__all__ = ["dedup_boundary_overlap"]

_BOUNDARY_K = 3  # seam width in tokens


@register(
    "dedup_boundary_overlap",
    rf"""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '\s+'),
                         w -> w <> '') AS ws
      FROM documents
    ), hd AS (
      SELECT doc_id, array_to_string(ws[1:{_BOUNDARY_K}], ' ') AS gram
      FROM t WHERE len(ws) >= {_BOUNDARY_K}
    ), tl AS (
      SELECT doc_id,
             array_to_string(
               ws[len(ws) - {_BOUNDARY_K - 1}:len(ws)], ' ') AS gram
      FROM t WHERE len(ws) >= {_BOUNDARY_K}
    )
    SELECT tl.doc_id AS tail_doc, hd.doc_id AS head_doc, tl.gram
    FROM tl JOIN hd ON tl.gram = hd.gram AND tl.doc_id <> hd.doc_id
    ORDER BY tail_doc, head_doc
    """,
    f"Crawl-boundary overlap: document pairs where one's trailing "
    f"{_BOUNDARY_K}-token gram equals the other's leading gram — the "
    "seam a pagination crawler or a bad chunker leaves when one "
    "logical document lands as two records. Digest dedup (different "
    "full text), MinHash (overlap below the similarity floor), and "
    "span dedup (window longer than the seam) all miss it; the "
    "boundary join targets it directly. Plan: one tokenize pass "
    "emits TWO single-gram rows per document (head + tail — not a "
    "shingle explosion), and the equi-join on the gram key moves "
    "only boundary rows; at 100 TB swap the join key for hash60 "
    "(gram) to cut shuffle bytes, the dedup family's standard move.",
)
def dedup_boundary_overlap(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id", TA.tokens(F.col("text")).alias("ws")
    ).filter(F.size("ws") >= _BOUNDARY_K)
    hd = t.select(
        F.col("doc_id").alias("head_doc"),
        F.concat_ws(
            " ", F.slice(F.col("ws"), 1, _BOUNDARY_K)
        ).alias("gram"),
    )
    tl = t.select(
        F.col("doc_id").alias("tail_doc"),
        F.concat_ws(
            " ",
            F.slice(F.col("ws"), F.size("ws") - (_BOUNDARY_K - 1), _BOUNDARY_K),
        ).alias("gram"),
    )
    return (
        tl.join(hd, "gram")
        .filter(F.col("tail_doc") != F.col("head_doc"))
        .select("tail_doc", "head_doc", "gram")
        .orderBy("tail_doc", "head_doc")
    )
