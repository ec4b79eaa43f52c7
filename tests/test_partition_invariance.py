"""In-suite partition-invariance net: a representative slice of the
registry must produce IDENTICAL results under a hostile shuffle layout
(5 partitions, AQE off) as under the test default (32, AQE on) — the
determinism property a 1000-executor cluster depends on. The full
registry audit lives in ``tools/check_partition_invariance.py``; this
keeps the highest-risk shapes (float aggregation, hash sampling,
windows, sketches, iterative merges, driver-looped training) guarded
on every pytest run.
"""

from __future__ import annotations

import pytest

from mcyj_datapipeline_spark import registry
from tests.oracle_compare import _normalize

REPRESENTATIVE = [
    "a01_pricing_summary",        # float sums over shuffled groups
    "o7_stratified_hash_sample",  # sampling must be hash-, not task-based
    "w3_last_value_per_group",    # window ordering under repartition
    "sk_hll_daily_uniques_rollup",  # sketch merge order
    "dedup_minhash_lsh_pairs",    # banded self-join candidate order
    "text_bpe_top_merges",        # driver-looped argmax (tie stability)
]


@pytest.mark.parametrize("name", REPRESENTATIVE)
def test_result_survives_hostile_shuffle_layout(spark, sf_dir, name):
    q = registry.queries()[name]
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        a = _normalize(q(spark, sf_dir).toPandas())
        spark.conf.set("spark.sql.shuffle.partitions", "5")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        b = _normalize(q(spark, sf_dir).toPandas())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert len(a) == len(b), f"{name}: row count changed with layout"
    assert a.equals(b), f"{name}: layout-dependent values"
