"""mcyj_datapipeline_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of stefaneng/MCYJ-Datapipeline.

Everything is expressed Spark-first: declarative DataFrame/SQL plans that
Catalyst optimizes (predicate pushdown, column pruning, broadcast joins,
AQE), with Pandas-UDF/`mapInPandas` kernels only where built-in operators
genuinely cannot express the semantics (PDF text extraction, external
HTTP/LLM enrichment — see `operators.procedural`).

Layout
------
- ``session``    — tuned SparkSession builder (AQE, shuffle partitions, UTC)
- ``io``         — sources & sinks (SURVEY §2.1 S1–S9 / K1–K6)
- ``functions``  — scalar column-expression builders (SURVEY §2.8 F1–F27)
- ``operators``  — relational ops, aggregates, dedup, similarity,
                   text analysis, search, multimodal
- ``plans``      — end-to-end pipelines (SURVEY §3 E1–E3)
- ``streaming``  — incremental/state semantics (SURVEY §2.10 T1–T6)
"""

__version__ = "0.1.0"
