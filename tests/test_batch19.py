"""Batch 19 semantic tests: BFS hop-minimality and frontier semantics
on the real graph (the fixture-free invariants the oracle hash cannot
express). Value parity vs DuckDB runs in test_oracle_parity.py."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_g4_hops_are_minimal_and_alternate_bipartite_sides(spark):
    """On the bipartite customer/supplier graph, hop parity must match
    node side (even hops = customers, odd hops = suppliers), every
    node appears at most once (visited-set semantics), and hop-0 is
    exactly the seed set."""
    from mcyj_datapipeline_spark.registry_batch19 import (
        _SEED_MAX_CUSTKEY,
        g4_khop_reachability,
    )

    rows = g4_khop_reachability(spark, SF).collect()
    nodes = [r["node"] for r in rows]
    assert len(nodes) == len(set(nodes))
    seeds = {r["node"] for r in rows if r["hop"] == 0}
    assert seeds == {
        f"c{i}" for i in range(_SEED_MAX_CUSTKEY) if f"c{i}" in nodes
    }
    for r in rows:
        side = r["node"][0]
        assert (side == "c") == (r["hop"] % 2 == 0), r


def test_g4_hop_counts_monotone_coverage(spark):
    """Cumulative reached-node counts grow monotonically with hops and
    never exceed the node universe."""
    from mcyj_datapipeline_spark.registry_batch19 import (
        g4_khop_reachability,
    )

    rows = g4_khop_reachability(spark, SF).collect()
    by_hop = {}
    for r in rows:
        by_hop[r["hop"]] = by_hop.get(r["hop"], 0) + 1
    assert sorted(by_hop) == list(range(min(by_hop), max(by_hop) + 1))
    assert all(v > 0 for v in by_hop.values())
