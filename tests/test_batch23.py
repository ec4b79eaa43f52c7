"""Batch 23 semantic tests: PPR mass conservation + locality vs BFS,
trigram accounting for session paths, and growth-curve monotonicity.
Value parity vs DuckDB runs in test_oracle_parity.py."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_g5_ppr_mass_conserved_and_local_to_seeds(spark):
    """On the mirrored (stochastic) purchase graph PPR preserves unit
    mass every round, seeds keep at least their teleport floor, and —
    since mass moves one hop per iteration — every positive-rank node
    must be within 3 hops of the seed set (g4's BFS is the referee)."""
    from mcyj_datapipeline_spark.registry_batch19 import g4_khop_reachability
    from mcyj_datapipeline_spark.registry_batch23 import (
        g5_personalized_pagerank,
    )

    ranks = g5_personalized_pagerank(spark, SF).collect()
    total = sum(r["rank"] for r in ranks)
    assert abs(total - 1.0) < 1e-3, total  # 6dp rounding over ~n nodes

    seeds = [r for r in ranks if r["node"][0] == "c" and int(r["node"][1:]) < 5]
    assert seeds
    floor = 0.15 / len(seeds)
    for s in seeds:
        assert s["rank"] >= floor - 1e-6, s

    reachable = {r["node"] for r in g4_khop_reachability(spark, SF).collect()}
    positive = {r["node"] for r in ranks}
    assert positive <= reachable, sorted(positive - reachable)[:5]


def test_session_paths_account_for_all_trigrams(spark):
    """Every reported path has exactly 3 steps, counts sort
    descending, and the trigram population the top-20 was cut from
    equals sum over sessions of max(0, session_len - 2)."""
    from mcyj_datapipeline_spark.registry_batch23 import ev_session_paths
    from mcyj_datapipeline_spark.streaming.events import sessionize
    from mcyj_datapipeline_spark.io import read_table

    rows = ev_session_paths(spark, SF).collect()
    assert rows
    ns = [r["n"] for r in rows]
    assert ns == sorted(ns, reverse=True)
    for r in rows:
        assert len(r["path"].split(">")) == 3

    sessions = sessionize(read_table(spark, SF, "events"), 30).collect()
    expected_total = sum(max(0, s["n_events"] - 2) for s in sessions)
    # the registered query limits to 20, so its counts must be bounded
    # by the independently-derived trigram population
    assert 0 < sum(ns) <= expected_total


def test_w7_growth_curve_is_monotone_and_complete(spark):
    """cum_users is nondecreasing, ends at the total distinct-user
    count, and new_users sums to the same total."""
    from mcyj_datapipeline_spark.registry_batch23 import (
        w7_cumulative_distinct_users,
    )
    from mcyj_datapipeline_spark.io import read_table

    rows = w7_cumulative_distinct_users(spark, SF).collect()
    assert rows == sorted(rows, key=lambda r: r["day"])
    cums = [r["cum_users"] for r in rows]
    assert cums == sorted(cums)
    n_users = (
        read_table(spark, SF, "events").select("user_id").distinct().count()
    )
    assert cums[-1] == n_users
    assert sum(r["new_users"] for r in rows) == n_users
    for prev, cur in zip(rows, rows[1:]):
        assert cur["cum_users"] - prev["cum_users"] == cur["new_users"]
