"""Compensating tests for the rows-only g8_greedy_coloring and
g3d_lpa_colored_schedule (round 12, ROADMAP item): greedy coloring is
PROPER (no edge monochromatic), bounded (≤ max_degree + 1 colors),
deterministic, and the color-class LPA schedule it feeds converges on
graphs where the id-parity schedule degenerates to fully synchronous
and oscillates."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mcyj_datapipeline_spark.operators.graph import (
    greedy_coloring,
    label_propagation_colored_converged,
    label_propagation_semisync_converged,
)


def _mirror(spark, pairs):
    both = pairs + [(b, a) for a, b in pairs]
    return spark.createDataFrame(both, ["src", "dst"])


def _assert_proper(edges, colors):
    c = colors
    conflicts = (
        edges.join(
            c.select(F.col("node").alias("src"), F.col("color").alias("cs")),
            "src",
        )
        .join(
            c.select(F.col("node").alias("dst"), F.col("color").alias("cd")),
            "dst",
        )
        .filter(F.col("cs") == F.col("cd"))
        .count()
    )
    assert conflicts == 0


def test_coloring_proper_and_bounded_on_triangle_plus(spark):
    """A triangle fused to a square — odd cycle present, so 2 colors
    are impossible; greedy must stay within max_degree + 1 = 4."""
    edges = _mirror(
        spark, [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (5, 6), (6, 3)]
    )
    colors, rounds = greedy_coloring(edges)
    rows = colors.collect()
    assert len(rows) == 6 and rounds >= 1
    _assert_proper(edges, colors)
    used = {r["color"] for r in rows}
    assert min(used) == 0 and max(used) <= 3


def test_coloring_proper_on_random_graph_and_deterministic(spark):
    import random

    rng = random.Random(7)
    pairs = list(
        {
            (a, b)
            for _ in range(300)
            for a, b in [sorted(rng.sample(range(60), 2))]
        }
    )
    edges = _mirror(spark, [(a, b) for a, b in pairs])
    c1, _ = greedy_coloring(edges)
    _assert_proper(edges, c1)
    assert c1.select("node").distinct().count() == 60
    # deterministic: a second run lands on the identical assignment
    c2, _ = greedy_coloring(edges)
    assert sorted(map(tuple, c1.collect())) == sorted(map(tuple, c2.collect()))
    # bounded by max degree + 1
    maxdeg = (
        edges.groupBy("src").count().agg(F.max("count")).collect()[0][0]
    )
    assert c1.agg(F.max("color")).collect()[0][0] <= maxdeg


def test_coloring_refuses_partial(spark):
    edges = _mirror(spark, [(1, 2), (2, 3), (1, 3)])
    with pytest.raises(RuntimeError, match="partial coloring"):
        greedy_coloring(edges, max_rounds=1)


def test_colored_schedule_converges_where_parity_degenerates(spark):
    """K_{2,2} with ALL-EVEN node ids: every node has even parity, so
    the parity semisync schedule is fully synchronous on this graph
    and oscillates (period 2, honestly reported changed != 0 at the
    bound); a proper coloring separates the bipartition, and the
    colored schedule converges."""
    edges = _mirror(spark, [(0, 4), (0, 6), (2, 4), (2, 6)])
    _, sweeps_p, changed_p = label_propagation_semisync_converged(
        edges, max_sweeps=8
    )
    assert changed_p != 0 and sweeps_p == 8  # degenerate schedule spins
    labels, sweeps_c, changed_c, n_classes = (
        label_propagation_colored_converged(edges, max_sweeps=8)
    )
    assert changed_c == 0 and sweeps_c < 8 and n_classes == 2
    # converged means fixed point: one more sweep from here is a no-op
    colors, _ = greedy_coloring(edges)
    again, s2, ch2, _ = label_propagation_colored_converged(
        edges, max_sweeps=1, colors=colors, start_labels=labels
    )
    assert ch2 == 0
    assert sorted(map(tuple, again.collect())) == sorted(
        map(tuple, labels.collect())
    )


def test_colored_schedule_on_triangle_communities(spark):
    """Two triangles joined by one bridge — non-bipartite, parity is
    not a proper coloring. The colored schedule reaches a fixed point
    and keeps the two communities distinct."""
    c1 = [(1, 2), (2, 3), (1, 3)]
    c2 = [(11, 12), (12, 13), (11, 13)]
    edges = _mirror(spark, c1 + c2 + [(3, 11)])
    labels, sweeps, changed, n_classes = (
        label_propagation_colored_converged(edges, max_sweeps=15)
    )
    assert changed == 0 and 2 <= n_classes <= 4
    got = {r["node"]: r["label"] for r in labels.collect()}
    assert got[1] == got[2] == got[3]
    assert got[11] == got[12] == got[13]


@pytest.mark.heavytier
def test_colored_warm_restart_fixed_point(spark):
    """Warm restart from yesterday's converged labels on today's
    slightly-changed graph: lands on a fixed point of TODAY's graph
    in no more sweeps than cold."""
    c1 = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    c2 = [(i, j) for i in range(10, 15) for j in range(i + 1, 15)]
    yday = _mirror(spark, c1 + c2 + [(4, 10)])
    today = _mirror(spark, c1 + c2 + [(4, 10), (0, 14)])
    ylabels, _, ych, _ = label_propagation_colored_converged(
        yday, max_sweeps=15
    )
    assert ych == 0
    cold, cold_sweeps, cch, _ = label_propagation_colored_converged(
        today, max_sweeps=15
    )
    warm, warm_sweeps, wch, _ = label_propagation_colored_converged(
        today, max_sweeps=15, start_labels=ylabels
    )
    assert cch == 0 and wch == 0
    assert warm_sweeps <= cold_sweeps


# -- warm restart / maintenance under edge insertions --------------------


def test_warm_recolor_proper_and_untouched_nodes_keep_colors(spark):
    """Insert edges into a colored graph: the warm recolor is proper,
    and every node outside the blast radius keeps its exact color."""
    import random

    rng = random.Random(11)
    pairs = list(
        {
            (a, b)
            for _ in range(200)
            for a, b in [sorted(rng.sample(range(50), 2))]
        }
    )
    yday = _mirror(spark, pairs)
    c0, _ = greedy_coloring(yday)
    _assert_proper(yday, c0)

    inserted = [(0, 49), (1, 48), (2, 47)]
    today = _mirror(spark, pairs + [p for p in inserted if p not in pairs])
    cw, warm_rounds = greedy_coloring(today, start_colors=c0)
    _assert_proper(today, cw)
    assert cw.select("node").distinct().count() == 50

    # blast radius: endpoints of inserted edges (at most); everyone
    # else keeps yesterday's color verbatim
    touched = {a for a, _ in inserted} | {b for _, b in inserted}
    old = {r["node"]: r["color"] for r in c0.collect()}
    new = {r["node"]: r["color"] for r in cw.collect()}
    for n in old:
        if n not in touched:
            assert new[n] == old[n], f"untouched node {n} recolored"

    # warm work is blast-radius-sized: far fewer rounds than cold
    _, cold_rounds = greedy_coloring(today)
    assert warm_rounds <= cold_rounds


def test_warm_recolor_with_new_nodes(spark):
    """Nodes absent from the start coloring are colored fresh."""
    yday = _mirror(spark, [(1, 2), (2, 3)])
    c0, _ = greedy_coloring(yday)
    today = _mirror(spark, [(1, 2), (2, 3), (3, 4), (4, 5), (4, 1)])
    cw, _ = greedy_coloring(today, start_colors=c0)
    _assert_proper(today, cw)
    assert cw.select("node").distinct().count() == 5


def test_warm_recolor_noop_when_still_proper(spark):
    """No conflicts after the edge change → zero recolor rounds and
    colors identical."""
    yday = _mirror(spark, [(1, 2), (2, 3), (1, 3)])
    c0, _ = greedy_coloring(yday)
    cw, rounds = greedy_coloring(yday, start_colors=c0)
    assert rounds == 0
    assert sorted(map(tuple, cw.collect())) == sorted(map(tuple, c0.collect()))
