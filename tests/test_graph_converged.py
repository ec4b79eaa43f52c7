"""Compensating tests for the rows-only g1b_pagerank_converged
(tolerance stopping is not SQL-expressible — batch 49 docstring).

The contraction argument these tests verify: the damped update is a
contraction with factor d in L1, so once the L-inf residual is below
tol the remaining distance to the true fixed point is bounded by
tol * d / (1 - d). A fixed-N run with N large enough that its own
residual is far below tol stands in for the fixed point.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mcyj_datapipeline_spark.operators.graph import (
    pagerank,
    pagerank_converged,
)

TOL = 1e-6
DAMPING = 0.85


@pytest.fixture(scope="module")
def edges(spark):
    # a graph with real structure: a hub, a chain, a cycle, mirrored
    # so the walk is stochastic (same densification as g1)
    pairs = (
        [(0, i) for i in range(1, 8)]          # hub fan-out
        + [(i, i + 1) for i in range(1, 7)]    # chain
        + [(8, 9), (9, 10), (10, 8)]           # cycle
        + [(3, 8), (7, 0)]
    )
    both = pairs + [(b, a) for a, b in pairs]
    return spark.createDataFrame(both, ["src", "dst"])


def test_converged_matches_fixed_point(spark, edges):
    ranks, its, delta = pagerank_converged(
        edges, tol=TOL, max_iterations=100, damping=DAMPING
    )
    assert delta < TOL
    assert 0 < its < 100
    truth = pagerank(edges, iterations=120, damping=DAMPING)
    bound = TOL * DAMPING / (1 - DAMPING)
    worst = (
        ranks.alias("a")
        .join(truth.alias("b"), F.col("a.node") == F.col("b.node"))
        .agg(F.max(F.abs(F.col("a.rank") - F.col("b.rank"))).alias("d"))
        .collect()[0]["d"]
    )
    assert worst <= bound, (worst, bound)
    # same node set, ranks sum to ~1 (stochastic mirrored graph)
    assert ranks.count() == truth.count()
    total = ranks.agg(F.sum("rank")).collect()[0][0]
    assert abs(total - 1.0) < 1e-9


def test_stop_is_minimal(spark, edges):
    """Running one round fewer must leave the residual ABOVE tol —
    i.e. the loop stopped at the first qualifying round, not late."""
    _, its, _ = pagerank_converged(
        edges, tol=TOL, max_iterations=100, damping=DAMPING
    )
    r_prev = pagerank(edges, iterations=its - 1, damping=DAMPING)
    r_prev2 = pagerank(edges, iterations=its - 2, damping=DAMPING)
    resid_before = (
        r_prev.alias("a")
        .join(r_prev2.alias("b"), F.col("a.node") == F.col("b.node"))
        .agg(F.max(F.abs(F.col("a.rank") - F.col("b.rank"))).alias("d"))
        .collect()[0]["d"]
    )
    assert resid_before >= TOL, (its, resid_before)


def test_residual_decays_geometrically(spark, edges):
    """The early exit is sound because the residual contracts; check
    it actually shrinks by ~damping per round on this graph."""
    deltas = []
    prev = None
    for n in (2, 4, 6, 8):
        r = pagerank(edges, iterations=n, damping=DAMPING)
        if prev is not None:
            d = (
                r.alias("a")
                .join(prev.alias("b"), F.col("a.node") == F.col("b.node"))
                .agg(
                    F.max(F.abs(F.col("a.rank") - F.col("b.rank"))).alias("d")
                )
                .collect()[0]["d"]
            )
            deltas.append(d)
        prev = r
    assert deltas[0] > deltas[1] > deltas[2] > 0


@pytest.mark.heavytier
def test_check_every_amortization_same_answer(spark, edges):
    """check_every=3 measures the 3-round block residual — about
    (1-d^3)/(1-d) = 2.57x the single-round one — so it legitimately
    runs extra rounds past the minimal stop (log(2.57)/log(1/d) ~ 6,
    rounded up to a block boundary); the extra rounds only tighten
    the answer. Bound the overshoot and check the result is at least
    as converged."""
    import math

    r1, its1, d1 = pagerank_converged(
        edges, tol=TOL, max_iterations=100, check_every=1
    )
    r3, its3, d3 = pagerank_converged(
        edges, tol=TOL, max_iterations=100, check_every=3
    )
    assert d3 < TOL
    block_inflation = (1 - DAMPING**3) / (1 - DAMPING)
    max_extra = math.log(block_inflation) / math.log(1 / DAMPING) + 3
    assert its1 <= its3 <= its1 + max_extra, (its1, its3)
    assert its3 % 3 == 0  # stops only at block boundaries
    # more rounds => at least as close to the fixed point: compare
    # both to a long fixed run
    truth = pagerank(edges, iterations=120, damping=DAMPING)

    def dist(r):
        return (
            r.alias("a")
            .join(truth.alias("b"), F.col("a.node") == F.col("b.node"))
            .agg(F.max(F.abs(F.col("a.rank") - F.col("b.rank"))).alias("d"))
            .collect()[0]["d"]
        )

    assert dist(r3) <= dist(r1) + 1e-12


@pytest.mark.heavytier
def test_relative_tol_is_scale_invariant(spark, edges):
    """Doubling the graph (two disjoint copies) halves every rank, so
    an ABSOLUTE tol stops earlier on the bigger graph, while
    relative=True (tol scaled by uniform mass 1/N) needs the same
    number of rounds — "converged" means the same thing at every
    corpus size."""
    off = 1000
    doubled = edges.union(
        edges.select(
            (F.col("src") + off).alias("src"),
            (F.col("dst") + off).alias("dst"),
        )
    )
    _, its_small, _ = pagerank_converged(
        edges, tol=1e-3, max_iterations=100, relative=True
    )
    _, its_big, _ = pagerank_converged(
        doubled, tol=1e-3, max_iterations=100, relative=True
    )
    assert its_small == its_big
    _, its_small_abs, _ = pagerank_converged(
        edges, tol=1e-5, max_iterations=100
    )
    _, its_big_abs, _ = pagerank_converged(
        doubled, tol=1e-5, max_iterations=100
    )
    assert its_big_abs < its_small_abs  # absolute tol drifts with N


def test_empty_graph(spark):
    empty = spark.createDataFrame([], "src long, dst long")
    ranks, its, delta = pagerank_converged(empty, tol=TOL)
    assert ranks.count() == 0 and its == 0 and delta == 0.0


def test_invalid_params_refused(spark, edges):
    with pytest.raises(ValueError, match="check_every"):
        pagerank_converged(edges, check_every=0)
    with pytest.raises(ValueError, match="tol"):
        pagerank_converged(edges, tol=0.0)


@pytest.mark.heavytier
def test_warm_restart_same_fixed_point(spark, edges):
    """Start-independence: warm-starting from a PERTURBED graph's
    converged ranks must land on the same fixed point as a cold run.
    (No round-count assertion here: on a 36-edge toy graph one
    removed edge moves the fixed point as far as uniform is, so round
    reduction is a property of SMALL RELATIVE perturbations — that's
    what the next test and the sf-scale g1c measurements pin.)"""
    perturbed = edges.filter(
        ~((F.col("src") == 3) & (F.col("dst") == 8))
    )
    old_ranks, _, _ = pagerank_converged(
        perturbed, tol=TOL, max_iterations=100
    )
    cold, cold_its, _ = pagerank_converged(
        edges, tol=TOL, max_iterations=100
    )
    warm, warm_its, d_warm = pagerank_converged(
        edges, tol=TOL, max_iterations=100, start_ranks=old_ranks
    )
    assert d_warm < TOL and warm_its < 100
    bound = 2 * TOL * DAMPING / (1 - DAMPING)  # both within tol*d/(1-d)
    worst = (
        warm.alias("a")
        .join(cold.alias("b"), F.col("a.node") == F.col("b.node"))
        .agg(F.max(F.abs(F.col("a.rank") - F.col("b.rank"))).alias("d"))
        .collect()[0]["d"]
    )
    assert worst <= bound, (worst, bound)


def test_warm_restart_near_fixed_point_is_fast(spark, edges):
    """The round-reduction mechanism itself, isolated from
    perturbation size: starting AT the fixed point must reconverge in
    a handful of rounds vs the cold count (residual starts at the
    convergence floor, not at the uniform-start distance)."""
    cold, cold_its, _ = pagerank_converged(
        edges, tol=TOL, max_iterations=100
    )
    _, warm_its, d = pagerank_converged(
        edges, tol=TOL, max_iterations=100, start_ranks=cold
    )
    assert d < TOL
    assert warm_its <= max(3, cold_its // 4), (warm_its, cold_its)


@pytest.mark.heavytier
def test_warm_restart_new_nodes_get_uniform_start(spark, edges):
    """Nodes missing from start_ranks (newly appeared) begin at the
    uniform mass and still converge — no nulls, full node set."""
    partial = pagerank(edges, iterations=5).filter(F.col("node") < 5)
    ranks, its, delta = pagerank_converged(
        edges, tol=TOL, max_iterations=100, start_ranks=partial
    )
    assert delta < TOL
    n_nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .count()
    )
    assert ranks.count() == n_nodes
    assert ranks.filter(F.col("rank").isNull()).count() == 0


def test_registry_query_shape(spark, sf_dir):
    import math

    from mcyj_datapipeline_spark import registry

    df = registry.queries()["g1b_pagerank_converged"](spark, sf_dir)
    rows = df.collect()
    assert rows and set(df.columns) == {
        "node",
        "rank",
        "iterations",
        "residual_decade",
    }
    its = rows[0]["iterations"]
    assert 1 <= its <= 60 and its % 3 == 0  # block-boundary stop
    # stopped below the RELATIVE tol 0.5/N (decade is sf-dependent:
    # -3 at sf0.001's 160 nodes, -5 at sf0.1's 16k)
    n_nodes = len(rows)
    assert rows[0]["residual_decade"] <= math.floor(
        math.log10(0.5 / n_nodes)
    )


def test_lpa_converged_equals_fixed_at_stop(spark, edges):
    """Converged LPA must equal the fixed-count operator run for
    exactly iterations_run rounds (same update rule, same start), the
    flip count at stop must be 0 (fixed point on this graph), and one
    more round must be a no-op."""
    from mcyj_datapipeline_spark.operators.graph import (
        label_propagation,
        label_propagation_converged,
    )

    labels, its, changed = label_propagation_converged(
        edges, max_iterations=50
    )
    assert changed == 0 and 0 < its < 50
    fixed = label_propagation(edges, iterations=its)
    diff = (
        labels.alias("a")
        .join(fixed.alias("b"), F.col("a.node") == F.col("b.node"))
        .filter(F.col("a.label") != F.col("b.label"))
        .count()
    )
    assert diff == 0
    one_more = label_propagation(edges, iterations=its + 1)
    diff2 = (
        labels.alias("a")
        .join(one_more.alias("b"), F.col("a.node") == F.col("b.node"))
        .filter(F.col("a.label") != F.col("b.label"))
        .count()
    )
    assert diff2 == 0  # fixed point: extra rounds change nothing


def test_lpa_converged_check_every_same_labels(spark, edges):
    from mcyj_datapipeline_spark.operators.graph import (
        label_propagation_converged,
    )

    l1, its1, c1 = label_propagation_converged(edges, max_iterations=50)
    l3, its3, c3 = label_propagation_converged(
        edges, max_iterations=50, check_every=3
    )
    assert c1 == 0 and c3 == 0
    assert its1 <= its3 <= its1 + 3  # block-boundary overshoot only
    diff = (
        l1.alias("a")
        .join(l3.alias("b"), F.col("a.node") == F.col("b.node"))
        .filter(F.col("a.label") != F.col("b.label"))
        .count()
    )
    assert diff == 0


def test_lpa_registry_query_shape(spark, sf_dir):
    from mcyj_datapipeline_spark import registry

    df = registry.queries()["g3b_label_propagation_converged"](
        spark, sf_dir
    )
    rows = df.limit(3).collect()
    assert rows and set(df.columns) == {
        "node",
        "label",
        "iterations",
        "changed_at_stop",
    }
    assert rows[0]["iterations"] % 3 == 0 or rows[0]["iterations"] == 30


def test_lpa_even_check_every_detects_2cycle(spark):
    """ADVICE r11: a single mirrored edge 1-2 makes synchronous LPA
    oscillate with period 2 forever (the two labels swap each round).
    check_every=2 compares states two rounds apart — identical in a
    2-cycle — and used to misreport a fixed point (changed == 0). The
    confirm-vs-last-round check must now report NOT converged."""
    from mcyj_datapipeline_spark.operators.graph import (
        label_propagation_converged,
    )

    edges = spark.createDataFrame([(1, 2), (2, 1)], ["src", "dst"])
    labels, its, changed = label_propagation_converged(
        edges, max_iterations=8, check_every=2
    )
    assert changed != 0  # the contract: 0 would claim a fixed point
    assert its == 8  # oscillation never converges; ran to the bound


def test_lpa_even_check_every_true_fixed_point_still_stops(spark, edges):
    """Even check_every on a genuinely converging graph: the extra
    confirm action must agree (changed == 0) and labels must match
    the check_every=1 result exactly."""
    from mcyj_datapipeline_spark.operators.graph import (
        label_propagation_converged,
    )

    l1, its1, c1 = label_propagation_converged(edges, max_iterations=50)
    l2, its2, c2 = label_propagation_converged(
        edges, max_iterations=50, check_every=2
    )
    assert c1 == 0 and c2 == 0
    assert its1 <= its2 <= its1 + 2
    diff = (
        l1.alias("a")
        .join(l2.alias("b"), F.col("a.node") == F.col("b.node"))
        .filter(F.col("a.label") != F.col("b.label"))
        .count()
    )
    assert diff == 0


def test_converged_parameter_guards(spark, edges):
    """max_iterations < 1 is refused like the other guards (ADVICE
    r11: 0 used to return delta=inf which callers feed to log10)."""
    from mcyj_datapipeline_spark.operators.graph import (
        label_propagation_converged,
    )

    with pytest.raises(ValueError, match="max_iterations"):
        pagerank_converged(edges, max_iterations=0)
    with pytest.raises(ValueError, match="max_iterations"):
        label_propagation_converged(edges, max_iterations=0)


@pytest.mark.heavytier
def test_converged_large_check_every_block_bounded(spark, edges):
    """A large check_every (> the in-block truncation stride) still
    returns the same answer as check_every=1 — exercises the new
    inside-block localCheckpoint path (ADVICE r11 lineage growth)."""
    r1, its1, _ = pagerank_converged(
        edges, tol=TOL, max_iterations=100, check_every=1
    )
    r12, its12, d12 = pagerank_converged(
        edges, tol=TOL, max_iterations=100, check_every=12
    )
    assert d12 < TOL and its12 % 12 == 0
    bound = (
        r1.alias("a")
        .join(r12.alias("b"), F.col("a.node") == F.col("b.node"))
        .agg(F.max(F.abs(F.col("a.rank") - F.col("b.rank"))).alias("d"))
        .collect()[0]["d"]
    )
    # both within tol*d/(1-d) of the fixed point -> within 2x that
    assert bound < 2 * TOL * DAMPING / (1 - DAMPING)
