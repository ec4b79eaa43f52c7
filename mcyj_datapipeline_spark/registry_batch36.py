"""Batch 36 registry entries (round 6, continued): Spark 4
semi-structured surfaces —

- ``f30_variant_json_extract``: the VARIANT type (Spark 4's
  schema-on-read path for semi-structured data): ``parse_json`` into
  a variant column, ``variant_get`` typed extraction, aggregation on
  the extracted values — oracled against DuckDB's native JSON
  extraction over the same strings.
- ``s17_xml_function_roundtrip``: the built-in XML surface (new in
  Spark 4): ``to_xml`` serializes each row, ``from_xml`` parses it
  back with an explicit schema, and the aggregate over the roundtrip
  must equal the aggregate the oracle computes directly from the
  base table — any serialization/parsing drift breaks the hash.

The companion observe()/statestore coverage (zero-extra-scan metric
observations, streaming state-store introspection) is pytest-level —
see tests/test_batch36.py.

Reference provenance: none direct — engine-surface completions per
the SURVEY.md mandate.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mcyj_datapipeline_spark.io import read_table
from mcyj_datapipeline_spark.registry import register

__all__ = [
    "f30_variant_json_extract",
    "s17_xml_function_roundtrip",
]


def _t(spark, sf_dir, name):
    return read_table(spark, sf_dir, name)


from mcyj_datapipeline_spark.functions.numerics import stable6 as _stable  # noqa: E402


# ===========================================================================
# VARIANT: schema-on-read extraction from the events props JSON
# ===========================================================================

_HOT_K = 50


@register(
    "f30_variant_json_extract",
    f"""
    SELECT event_type,
           count(*) AS n_events,
           sum(CASE WHEN json_extract(props, '$.k')::INT >= {_HOT_K}
                    THEN 1 ELSE 0 END)::BIGINT AS n_hot,
           max(json_extract(props, '$.k')::INT) AS max_k,
           floor((sum(json_extract(props, '$.k')::INT)::DOUBLE
                  / count(*)) * 1000000.0 + 0.5) / 1000000.0 AS avg_k
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    "Semi-structured analytics through Spark 4's VARIANT type: the "
    "events props JSON parses once into a variant column "
    "(parse_json), variant_get('$.k', 'int') extracts a TYPED value "
    "with no user-declared row schema, and the rollup runs on the "
    "extracted ints (exact integer sums; the mean divides once). "
    "This is the schema-on-read path for ragged telemetry at 100 TB "
    "— the binary variant encoding scans ~an order of magnitude "
    "faster than re-parsing JSON strings per access, and the "
    "extraction pushes into the scan. Oracle: DuckDB's native JSON "
    "extraction over the identical strings.",
)
def f30_variant_json_extract(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json(F.col("props")), "$.k", "int")
    withk = ev.select("event_type", k.alias("k"))
    return (
        withk.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                F.when(F.col("k") >= _HOT_K, 1).otherwise(0)
            ).alias("n_hot"),
            F.max("k").alias("max_k"),
            F.sum("k").alias("_sk"),
        )
        .select(
            "event_type",
            "n_events",
            "n_hot",
            "max_k",
            _stable(
                F.col("_sk").cast("double") / F.col("n_events")
            ).alias("avg_k"),
        )
        .orderBy("event_type")
    )


# ===========================================================================
# XML: to_xml -> from_xml roundtrip proven by aggregate parity
# ===========================================================================

_XML_SCHEMA = "o_orderkey BIGINT, status STRING, cents BIGINT"


@register(
    "s17_xml_function_roundtrip",
    """
    SELECT o_orderstatus AS status, count(*) AS n,
           sum(round(o_totalprice * 100)::BIGINT)::BIGINT AS sum_cents
    FROM orders GROUP BY 1 ORDER BY 1
    """,
    "Built-in XML surface (new in Spark 4), proven by roundtrip: "
    "every order serializes to an XML document (to_xml over a "
    "struct), parses back with an explicit schema (from_xml), and "
    "the per-status count/cents rollup over the ROUNDTRIPPED rows "
    "must equal what the oracle computes directly from the base "
    "table — any escaping, type-rendering, or parsing drift in "
    "either direction breaks the value hash. Money rides as integer "
    "cents (the i2 lesson) so the text roundtrip is exact. The "
    "roundtrip is a map-only chain; the rollup is the only shuffle.",
)
def s17_xml_function_roundtrip(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    doc = orders.select(
        F.to_xml(
            F.struct(
                F.col("o_orderkey"),
                F.col("o_orderstatus").alias("status"),
                F.round(F.col("o_totalprice") * 100, 0)
                .cast("long")
                .alias("cents"),
            )
        ).alias("xml")
    )
    back = doc.select(
        F.from_xml("xml", _XML_SCHEMA).alias("r")
    ).select("r.*")
    return (
        back.groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("cents").alias("sum_cents"),
        )
        .orderBy("status")
    )
