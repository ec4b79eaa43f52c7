"""Distributed graph analytics over edge-list DataFrames: PageRank by
iterative weighted-contribution joins, and triangle counting via
degree-ordered orientation.

Complements :func:`operators.dedup.connected_components` (cluster
formation): these are the *analysis* graph ops a corpus/event pipeline
wants — rank nodes in an interaction graph (which suppliers sit at the
center of the purchase network; which domains dominate a link graph)
and measure clustering (triangle density distinguishes organic
communities from spam link farms).

Both are pure DataFrame programs — edges never leave the JVM, every
step is a shuffle-join or groupBy Catalyst can plan, and the iteration
count is a small constant, so the 100 TB cost model is
``iterations x (one shuffle on the edge key)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mcyj_datapipeline_spark.functions.numerics import stable6
from mcyj_datapipeline_spark.operators.caching import pin_partitioned


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    damping: float = 0.85,
    checkpoint_every: int = 5,
    weight: str | None = None,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list; returns
    ``(node, rank)`` for every node that appears as a source or
    destination.

    Semantics: ``rank_0 = 1/N``; each round
    ``rank(v) = (1-d)/N + d * sum_{u->v} rank(u) / outdeg(u)``.
    Dangling-node mass is NOT redistributed (nodes with no out-edges
    leak their mass, the common simplified formulation) — callers that
    need a stochastic matrix should densify first (e.g. mirror edges,
    as the bipartite registry query does, which guarantees every node
    both emits and receives).

    Scale shape: out-degrees are pre-joined ONCE into a weighted edge
    list (``w = 1/outdeg``) that is repartitioned on ``src`` and
    persisted, so every iteration is exactly one join of ranks (hash-
    partitioned on node from the previous round's groupBy) against the
    cached edges plus one groupBy(dst) — no per-round degree
    recomputation, no driver-side collect of anything but the node
    count. ``localCheckpoint`` per round keeps the plan from growing
    with the iteration count (swap for ``checkpoint`` + a checkpoint
    dir on a fault-tolerant cluster).
    """
    # Checkpoint the edge list FIRST: nodes (2 union branches),
    # out-degrees, and the weighted join would otherwise each re-execute
    # whatever join/distinct produced the edges — 4-5 runs of the most
    # expensive subtree for one graph. All three checkpoints are LAZY:
    # the node count() below materializes e + nodes in one job, and the
    # caller's action materializes weighted — two driver round-trips
    # total instead of five (each job is scheduler latency plus a spin
    # of the host-stall lottery; same batching rationale as
    # connected_components' check_every).
    cols = [F.col(src).alias("src"), F.col(dst).alias("dst")]
    if weight is not None:
        # weighted walk: step probability proportional to edge weight
        # (TextRank's formulation) — out-"degree" is the weight sum
        cols.append(F.col(weight).cast("double").alias("_ew"))
    e = edges.select(*cols).localCheckpoint(eager=False)
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))

    if weight is None:
        outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
        w_expr = F.lit(1.0) / F.col("deg")
    else:
        outdeg = e.groupBy("src").agg(F.sum("_ew").alias("deg"))
        w_expr = F.col("_ew") / F.col("deg")
    weighted = (
        e.join(outdeg, "src")
        .select("src", "dst", w_expr.alias("w"))
        .repartition("src")
        .localCheckpoint(eager=False)
    )

    base = 1.0 / n
    teleport = (1.0 - damping) / n
    ranks = nodes.withColumn("rank", F.lit(base))
    for i in range(iterations):
        contribs = (
            weighted.join(ranks, weighted["src"] == ranks["node"])
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("w")).alias("mass"))
        )
        # left join back onto the full node set so in-edge-less nodes
        # keep their teleport share instead of silently dropping out.
        # (r12 note: a fused union-of-zero-rows + single groupBy variant
        # was A/B-measured here and REVERTED — it raised per-query
        # executor CPU 25-58% at sf0.1 because this left join runs as a
        # cheap AQE broadcast join of the node-sized contribs, while the
        # fused shape defeats the exchange-reuse the two-step plan gets;
        # see OPTIMIZATION_r12.md.)
        ranks = nodes.join(
            contribs, nodes["node"] == contribs["dst"], "left"
        ).select(
            "node",
            (
                F.lit(teleport)
                + F.lit(damping) * F.coalesce("mass", F.lit(0.0))
            ).alias("rank"),
        )
        # Each rank relation feeds exactly ONE consumer (the next
        # iteration's join), so the un-checkpointed chain still
        # executes every stage once — checkpointing per round would
        # only pay extra materialization jobs. Truncate lineage every
        # `checkpoint_every` rounds purely to bound plan size on long
        # runs.
        if (i + 1) % checkpoint_every == 0 and (i + 1) < iterations:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks


def pagerank_converged(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    tol: float = 1e-6,
    max_iterations: int = 40,
    damping: float = 0.85,
    check_every: int = 1,
    weight: str | None = None,
    relative: bool = False,
    start_ranks: DataFrame | None = None,
) -> tuple[DataFrame, int, float]:
    """PageRank iterated to a fixed point instead of a fixed count:
    stop when ``max_v |rank_i(v) - rank_{i-1}(v)| < tol`` (L-inf
    residual, the standard stopping rule), bounded by
    ``max_iterations``. Returns ``(ranks, iterations_run, delta)``.

    ``start_ranks`` (``(node, rank)``) warm-starts the iteration —
    the incremental-maintenance seam: after a small edge delta,
    yesterday's converged ranks are already near today's fixed
    point, and the contraction converges from ANY start, so
    reconvergence needs ~log(||start - fixed||/tol)/log(1/d) rounds
    instead of the full from-uniform count (measured: 24 cold vs 3
    warm rounds after a 2% edge delta, at sf0.001/0.01/0.1 alike —
    SCALE.md r11). Nodes absent
    from ``start_ranks`` (newly appeared) begin at the uniform mass;
    stale nodes (no longer in the graph) are ignored. The fixed
    point is start-independent, so warm and cold agree to within the
    tol-derived bound — property-tested.

    ``relative=True`` scales tol by the uniform mass ``1/N`` —
    ranks are O(1/N), so an ABSOLUTE L-inf tol silently tightens as
    the graph grows (at 1e9 nodes, tol=1e-6 is 1000x the typical
    rank and stops immediately; at 1e3 nodes it's 1000x below and
    grinds). Relative tol makes "converged" mean the same thing at
    every corpus size; the invariance is property-tested on a
    duplicated graph (same iterations at 2x the nodes).

    Same per-round shape as :func:`pagerank` (one hash join + one
    groupBy against the pre-weighted cached edge list). The residual
    check adds, every ``check_every`` rounds, one narrow join of the
    current ranks against the previous checkpoint plus a max-agg — a
    driver action, so each checked round materializes via a lazy
    ``localCheckpoint`` and later rounds read its blocks instead of
    recomputing (total executed work stays one pass per round).
    ``check_every > 1`` amortizes the check's scheduler round-trip on
    clusters where driver latency dominates. Its residual is then the
    K-ROUND block delta — about ``(1-d^k)/(1-d)`` times the
    single-round one — so the loop runs a handful of extra rounds
    before that larger delta crosses tol (k=3, d=0.85, tol=1e-6
    measured +7 rounds on the test graph), buying k× fewer driver
    actions; the extra rounds only tighten the answer.

    Convergence guarantee: the damped update is a contraction with
    factor ``damping`` in L1, so the residual shrinks geometrically
    and the loop terminates for any tol > 0; iterations needed ~=
    log(tol)/log(damping) from a uniform start (measured table in
    SCALE.md r11 — the sf0.1 purchase graph hits absolute 1e-4/1e-5/
    1e-6 in 15/29/43 rounds). Oracle-pinned fixed-iteration queries
    keep using :func:`pagerank`; this variant is for production
    convergence, where "3 iterations" is a benchmark contract, not
    an answer.
    """
    if check_every < 1:
        # a zero-round "block" would measure delta between identical
        # frames (0.0 < any tol) and return the uniform start as
        # "converged" — refuse instead of silently not iterating
        raise ValueError(f"check_every must be >= 1, got {check_every}")
    if tol <= 0:
        raise ValueError(f"tol must be > 0, got {tol}")
    if max_iterations < 1:
        # zero iterations never enters the loop, so delta stays
        # float('inf') — a value callers feed to math (g1b log10s the
        # delta) — and the "converged" tuple lies. Refuse like the
        # other parameter guards.
        raise ValueError(
            f"max_iterations must be >= 1, got {max_iterations}"
        )
    cols = [F.col(src).alias("src"), F.col(dst).alias("dst")]
    if weight is not None:
        cols.append(F.col(weight).cast("double").alias("_ew"))
    e = edges.select(*cols).localCheckpoint(eager=False)
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0)), 0, 0.0

    if weight is None:
        outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
        w_expr = F.lit(1.0) / F.col("deg")
    else:
        outdeg = e.groupBy("src").agg(F.sum("_ew").alias("deg"))
        w_expr = F.col("_ew") / F.col("deg")
    weighted = (
        e.join(outdeg, "src")
        .select("src", "dst", w_expr.alias("w"))
        .repartition("src")
        .localCheckpoint(eager=False)
    )

    base = 1.0 / n
    eff_tol = tol * base if relative else tol
    teleport = (1.0 - damping) / n
    if start_ranks is not None:
        ranks = (
            nodes.join(
                start_ranks.select(
                    F.col("node"), F.col("rank").alias("_r0")
                ),
                "node",
                "left",
            )
            .select(
                "node",
                F.coalesce("_r0", F.lit(base)).alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    else:
        ranks = nodes.withColumn("rank", F.lit(base)).localCheckpoint(
            eager=False
        )
    iterations_run = 0
    delta = float("inf")
    while iterations_run < max_iterations:
        prev = ranks
        block = min(check_every, max_iterations - iterations_run)
        for inner in range(block):
            contribs = (
                weighted.join(ranks, weighted["src"] == ranks["node"])
                .groupBy("dst")
                .agg(F.sum(F.col("rank") * F.col("w")).alias("mass"))
            )
            ranks = nodes.join(
                contribs, nodes["node"] == contribs["dst"], "left"
            ).select(
                "node",
                (
                    F.lit(teleport)
                    + F.lit(damping) * F.coalesce("mass", F.lit(0.0))
                ).alias("rank"),
            )
            iterations_run += 1
            # truncate lineage INSIDE the block too: a large
            # check_every (20-40) otherwise grows the unresolved plan
            # linearly until the block-end checkpoint, same analysis/
            # codegen blow-up the fixed-count pagerank bounds with
            # checkpoint_every=5 (ADVICE r11). Skip the final inner
            # round — the block-end checkpoint below covers it.
            if (inner + 1) % 5 == 0 and inner + 1 < block:
                ranks = ranks.localCheckpoint(eager=False)
        # checkpoint so the residual action doesn't leave the next
        # round recomputing this one, then one narrow join + max-agg
        ranks = ranks.localCheckpoint(eager=False)
        delta = (
            ranks.alias("a")
            .join(prev.alias("b"), F.col("a.node") == F.col("b.node"))
            .agg(
                F.max(F.abs(F.col("a.rank") - F.col("b.rank"))).alias("d")
            )
            .collect()[0]["d"]
        )
        if delta is not None and delta < eff_tol:
            break
    return ranks, iterations_run, float(delta or 0.0)


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    damping: float = 0.85,
    checkpoint_every: int = 5,
) -> DataFrame:
    """Personalized PageRank: the teleport vector is uniform over the
    ``seeds`` relation (single column ``node``) instead of over all
    nodes — random walks restart AT THE SEEDS, so ranks measure
    proximity/trust relative to that set (the recommendation /
    TrustRank formulation). ``rank_0 = 1/|S|`` on seeds, 0 elsewhere;
    each round ``rank(v) = (1-d)/|S| * [v in S] + d * sum contribs``.

    Same scale shape as :func:`pagerank`: weights pre-joined once,
    one join + one groupBy per iteration; the seed flag rides the node
    relation (one broadcast-size semi-join at setup, never per
    round). Seeds not present in the graph still teleport-anchor
    (they hold rank even with no edges) — standard PPR behavior.
    """
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    ).localCheckpoint(eager=False)
    s = seeds.select("node").distinct().localCheckpoint(eager=False)
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .union(s.select("node"))
        .distinct()
    )
    flagged = nodes.join(
        F.broadcast(s.withColumn("_seed", F.lit(1))), "node", "left"
    ).select(
        "node", F.coalesce("_seed", F.lit(0)).alias("is_seed")
    ).localCheckpoint(eager=False)
    ns = s.count()
    if ns == 0:
        return flagged.select("node", F.lit(0.0).alias("rank"))

    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    weighted = (
        e.join(outdeg, "src")
        .select("src", "dst", (F.lit(1.0) / F.col("deg")).alias("w"))
        .repartition("src")
        .localCheckpoint(eager=False)
    )

    teleport = F.col("is_seed") * ((1.0 - damping) / ns)
    ranks = flagged.select(
        "node", "is_seed", (F.col("is_seed") / ns).alias("rank")
    )
    for i in range(iterations):
        contribs = (
            weighted.join(ranks, weighted["src"] == ranks["node"])
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("w")).alias("mass"))
        )
        ranks = flagged.join(
            contribs, flagged["node"] == contribs["dst"], "left"
        ).select(
            "node",
            "is_seed",
            (
                teleport
                + F.lit(damping) * F.coalesce("mass", F.lit(0.0))
            ).alias("rank"),
        )
        if (i + 1) % checkpoint_every == 0 and (i + 1) < iterations:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks.select("node", "rank")


def _canonical_oriented(edges: DataFrame, a: str, b: str):
    """Shared triangle-counting preamble: canonical distinct edge list
    (checkpointed — it is read three times downstream), per-node
    degrees, and the degree-ordered orientation (Suri &
    Vassilvitskii) that bounds every node's out-degree by O(sqrt(m)).
    Returns ``(co, deg, oriented)``."""
    co = edges.select(F.col(a).alias("a"), F.col(b).alias("b")).distinct()
    co = co.localCheckpoint(eager=True)
    deg = (
        co.select(F.col("a").alias("node"))
        .union(co.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    da = deg.select(F.col("node").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("node").alias("b"), F.col("d").alias("db"))
    lower_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = (
        co.join(da, "a")
        .join(db, "b")
        .select(
            F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("u"),
            F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("v"),
        )
        .localCheckpoint(eager=True)
    )
    return co, deg, oriented


def triangle_stats(
    edges: DataFrame, a: str = "a", b: str = "b"
) -> DataFrame:
    """Global triangle census over an undirected graph given as a
    canonical edge list (each edge once, ``a < b``). Returns one row
    ``(n_edges, n_wedges, n_triangles)``.

    Algorithm: degree-ordered orientation (Suri & Vassilvitskii's
    MR triangle counting) — direct every edge from its lower-(degree,
    id) endpoint to the higher one, enumerate wedges by self-joining
    the oriented list on the source, then close each wedge with a
    semi-join back to the edge set. Orientation bounds every node's
    out-degree by O(sqrt(m)), so the wedge (shuffle) volume is
    O(m^1.5) worst case instead of sum-of-squared-degrees — the skewed
    hub that would explode a naive wedge join contributes only
    low-degree-endpoint wedges.

    Every step is a hash join / groupBy on node or edge keys; nothing
    is collected. The count row at the end is the only driver traffic.
    """
    co, deg, oriented = _canonical_oriented(edges, a, b)
    o1 = oriented.select(F.col("u"), F.col("v").alias("x"))
    o2 = oriented.select(F.col("u"), F.col("v").alias("y"))
    wedges = o1.join(o2, "u").filter(F.col("x") < F.col("y"))
    closed = wedges.join(
        co,
        (wedges["x"] == co["a"]) & (wedges["y"] == co["b"]),
        "left_semi",
    )
    return (
        closed.agg(F.count(F.lit(1)).alias("n_triangles"))
        .crossJoin(co.agg(F.count(F.lit(1)).alias("n_edges")))
        .crossJoin(wedges.agg(F.count(F.lit(1)).alias("n_wedges")))
        .select("n_edges", "n_wedges", "n_triangles")
    )


def clustering_coefficients(
    edges: DataFrame, a: str = "a", b: str = "b"
) -> DataFrame:
    """Per-node local clustering coefficient over an undirected graph
    given as a canonical edge list (each edge once, ``a < b``):
    ``cc(v) = 2*T(v) / (d(v)*(d(v)-1))`` with ``T(v)`` the number of
    triangles through ``v`` — the local-density signal behind
    community detection and spam-graph screening.

    Same degree-ordered orientation as :func:`triangle_stats` (shared
    preamble), but the wedge-closing join is an INNER join so each
    closed triangle ``(u, x, y)`` survives with all three vertices;
    one unpivot + groupBy then yields per-node triangle counts.
    Every triangle is produced exactly once (its vertices appear in
    one canonical orientation order), so the per-node counts are
    exact. Shuffle volume is the same O(m^1.5) wedge bound as the
    census; the output is node-grain (|V| rows), never pair-grain."""
    co, deg, oriented = _canonical_oriented(edges, a, b)
    o1 = oriented.select(F.col("u"), F.col("v").alias("x"))
    o2 = oriented.select(F.col("u"), F.col("v").alias("y"))
    wedges = o1.join(o2, "u").filter(F.col("x") < F.col("y"))
    tri = wedges.join(
        co, (wedges["x"] == co["a"]) & (wedges["y"] == co["b"])
    ).select("u", "x", "y")
    tn = (
        tri.select(F.col("u").alias("node"))
        .union(tri.select(F.col("x").alias("node")))
        .union(tri.select(F.col("y").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    d = F.col("d")
    cc = F.when(
        d >= 2,
        (F.lit(2.0) * F.col("triangles")) / (d * (d - F.lit(1))),
    ).otherwise(F.lit(0.0))
    return (
        deg.join(tn, "node", "left")
        .na.fill({"triangles": 0})
        .select(
            "node",
            d.alias("degree"),
            "triangles",
            stable6(cc).alias("cc"),
        )
        .orderBy("node")
    )


def kcore_nodes(
    edges: DataFrame,
    k: int,
    rounds: int,
    a: str = "a",
    b: str = "b",
) -> DataFrame:
    """Nodes of the ``k``-core: the maximal subgraph where every node
    keeps degree >= ``k`` — computed by the standard peel (drop all
    sub-``k`` nodes, recompute degrees, repeat). Runs a FIXED
    ``rounds`` peel passes rather than a data-dependent convergence
    probe: extra passes after the fixpoint are no-ops, and the fixed
    count is what lets a SQL twin unroll the identical computation
    (the unrolled-PageRank oracle pattern). Callers assert fixpoint
    by checking that ``rounds+1`` returns the same set.

    Each pass is one degree groupBy + two semi-joins on node keys,
    with the surviving edge list checkpointed so lineage stays flat —
    at 100 TB that is ``rounds`` edge-key shuffles, no driver-side
    data movement. Returns a single-column ``node`` frame, sorted."""
    co = edges.select(F.col(a).alias("a"), F.col(b).alias("b")).distinct()
    co = co.localCheckpoint(eager=True)
    for _ in range(rounds):
        deg = (
            co.select(F.col("a").alias("node"))
            .union(co.select(F.col("b").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("d"))
        )
        keep = deg.filter(F.col("d") >= k).select("node")
        co = (
            co.join(
                keep.select(F.col("node").alias("a")), "a", "left_semi"
            )
            .join(keep.select(F.col("node").alias("b")), "b", "left_semi")
            .select("a", "b")
            .localCheckpoint(eager=True)
        )
    deg = (
        co.select(F.col("a").alias("node"))
        .union(co.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    return deg.filter(F.col("d") >= k).select("node").orderBy("node")


def label_propagation_semisync_converged(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_sweeps: int = 30,
    start_labels: DataFrame | None = None,
) -> tuple[DataFrame, int, int]:
    """Label propagation on a SEMI-SYNCHRONOUS two-color schedule
    (Cordasco & Gargano): each sweep updates the even-id nodes from
    their neighbors' current labels, then the odd-id nodes from the
    just-updated state. Returns ``(labels, sweeps_run,
    changed_at_stop)`` with the same vote/tie semantics as
    :func:`label_propagation` (neighbor majority, ties to the
    smallest label, own label does not vote).

    Why this variant exists: the fully synchronous schedule
    OSCILLATES on bipartite(-ish) graphs — both sides flip
    simultaneously, period 2 — and the engine's customer/supplier
    purchase graph is exactly bipartite, so the synchronous
    :func:`label_propagation_converged` runs to its iteration bound
    there and honestly reports changed != 0 (measured at every sf:
    SCALE.md r12). Updating one color class at a time removes the
    simultaneous-flip mechanism: within a half-round the voting side
    is frozen, so the bipartite 2-cycle cannot occur. The id parity
    IS a proper 2-coloring for the packed purchase graph (customers
    even, suppliers odd); on non-bipartite graphs parity is just a
    schedule heuristic — convergence is then empirical, which is why
    ``max_sweeps`` still bounds the loop and ``changed_at_stop``
    reports the outcome instead of assuming it.

    ``start_labels`` warm-restarts from a prior run's communities
    (nightly refresh, VERDICT r11 #4); absent nodes start at their
    own id. The warm result is a fixed point of TODAY's graph when
    changed == 0 — not necessarily the cold run's labels (LPA has no
    unique fixed point); compensating tests assert fixed-point-ness.

    Scale shape: the edge list is split by destination parity ONCE
    (two cached halves); each half-round is one hash join + vote
    groupBy + argmax groupBy over its half, plus one narrow
    node-key merge join back into the label state — a sweep touches
    every edge exactly once, like one synchronous round, and the
    stop check is one integer flip count per sweep. State never
    exceeds one row per node; lineage stays flat via per-half-round
    ``localCheckpoint`` (swap for ``checkpoint`` on a real cluster).
    """
    if max_sweeps < 1:
        raise ValueError(f"max_sweeps must be >= 1, got {max_sweeps}")
    # edge-layout seam (ADVICE r12): default byte-identical to the
    # former inline repartition+localCheckpoint
    e = pin_partitioned(
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")),
        "src",
    )
    halves = [
        e.filter(F.pmod("dst", F.lit(2)) == p).localCheckpoint(
            eager=False
        )
        for p in (0, 1)
    ]
    base = e.select(F.col("src").alias("node")).distinct()
    if start_labels is None:
        labels = base.select("node", F.col("node").alias("label"))
    else:
        labels = base.join(
            start_labels.select("node", F.col("label").alias("_l0")),
            "node",
            "left",
        ).select(
            "node", F.coalesce("_l0", F.col("node")).alias("label")
        )
    labels = labels.localCheckpoint(eager=False)
    return _lpa_scheduled_sweeps(halves, labels, max_sweeps)


def _lpa_scheduled_sweeps(
    halves: list[DataFrame], labels: DataFrame, max_sweeps: int
) -> tuple[DataFrame, int, int]:
    """Shared scheduled-LPA sweep loop: per sweep, update each class
    in ``halves`` (edge slices keyed by the DESTINATION's class) in
    order from the current label state; stop on a zero integer flip
    count across a full sweep. Vote/tie semantics are
    :func:`label_propagation`'s (neighbor majority, ties to smallest
    label, own label does not vote)."""
    sweeps = 0
    changed = -1
    while sweeps < max_sweeps:
        prev = labels
        for half in halves:
            # one deterministic-mode vote round (see _neighbor_vote)
            new = _neighbor_vote(
                half.join(labels, half["src"] == labels["node"]),
                half["dst"],
                out="_new",
            )
            labels = (
                labels.join(new, "node", "left")
                .select(
                    "node",
                    F.coalesce("_new", F.col("label")).alias("label"),
                )
                .localCheckpoint(eager=False)
            )
        sweeps += 1
        changed = (
            labels.alias("a")
            .join(prev.alias("b"), F.col("a.node") == F.col("b.node"))
            .filter(F.col("a.label") != F.col("b.label"))
            .count()
        )
        if changed == 0:
            break
    return labels, sweeps, changed


def greedy_coloring(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 60,
    start_colors: DataFrame | None = None,
) -> tuple[DataFrame, int]:
    """Distributed greedy graph coloring (speculative/conflict-fix,
    Gebremedhin–Manne style, with deterministic hash priorities):
    returns ``((node, color), rounds)`` with a PROPER coloring — no
    edge's endpoints share a color — using at most ``max_degree + 1``
    colors. The schedule preprocessing the color-scheduled LPA needs
    on graphs where id parity is not a proper 2-coloring (any graph
    with triangles).

    Per round, EVERY uncolored node tentatively takes the smallest
    color its already-committed neighbors don't use (the mex,
    computed JVM-side: ``array_min(array_except(sequence(0, |used|),
    used))`` over a per-node ``collect_set`` bounded by degree); then
    same-color conflicts between tentative neighbors are resolved by
    ``(xxhash64(node), node)`` priority — the losers stay uncolored,
    everyone else commits. Speculating on all uncolored nodes at once
    is what keeps the round count small on DENSE graphs: the
    alternative (color only local priority maxima, Jones–Plassmann)
    commits ~n/Δ nodes per round, which measured 50+ rounds on the
    sf0.001 co-purchase graph, while the speculative schedule's
    committed colors differentiate the candidate space after round
    one and conflicts collapse (measured: same graph, 7 rounds).
    Mex over committed neighbors never exceeds degree, so the
    Δ+1 bound survives. Refuses (raises) rather than returning a
    partial coloring if ``max_rounds`` is hit — a partial coloring
    silently breaks the no-simultaneous-neighbors contract downstream
    schedules rely on; the priority-max node of any conflicted
    neighborhood always commits, so each round makes progress and the
    bound is a backstop, not a tuning knob.

    Determinism: priorities and tie-breaks are pure functions of node
    ids, so the coloring is reproducible across runs and partitioning
    (the partition-invariance gate covers the registered query).

    ``start_colors`` warm-restarts from a prior coloring (nightly
    edge churn): colors still proper on today's graph are KEPT
    verbatim; for each now-monochromatic edge only the lower-priority
    endpoint is evicted, and the evicted plus brand-new nodes form
    the work set — recoloring cost tracks the insertion blast radius,
    not the graph. The warm result is proper by the same loop
    invariant; its color count is bounded by
    ``max(old colors, today's max_degree + 1)`` (kept colors are
    inherited, new ones mex-bounded) — the standard incremental-
    coloring contract, pinned by tests.
    """
    if max_rounds < 1:
        raise ValueError(f"max_rounds must be >= 1, got {max_rounds}")
    e = edges.select(F.col(src).alias("node"), F.col(dst).alias("nbr"))
    adj = (
        e.union(
            e.select(
                F.col("nbr").alias("node"), F.col("node").alias("nbr")
            )
        )
        .repartition("node")
        .localCheckpoint(eager=False)
    )
    all_nodes = (
        adj.select("node")
        .distinct()
        .select(
            "node",
            F.struct(F.xxhash64("node").alias("pri"), "node").alias("key"),
        )
        .localCheckpoint(eager=False)
    )
    colors: DataFrame | None = None
    uncolored = all_nodes
    if start_colors is not None:
        # warm restart: keep yesterday's colors where they are still
        # proper on TODAY's graph. For each now-monochromatic edge the
        # LOWER-priority endpoint is evicted (the higher keeps its
        # color, so an edge never evicts both); evicted nodes plus
        # nodes absent from the start coloring form the work set —
        # blast-radius-sized, not graph-sized.
        sc = all_nodes.join(
            start_colors.select("node", "color"), "node"
        ).select("node", "key", "color")
        losers = (
            adj.join(sc, "node")
            .join(
                sc.select(
                    F.col("node").alias("nbr"),
                    F.col("key").alias("nkey"),
                    F.col("color").alias("ncolor"),
                ),
                "nbr",
            )
            .filter(
                (F.col("color") == F.col("ncolor"))
                & (F.col("key") < F.col("nkey"))
            )
            .select("node")
            .distinct()
        )
        kept = sc.join(losers, "node", "left_anti").select("node", "color")
        colors = kept.localCheckpoint(eager=False)
        uncolored = all_nodes.join(
            kept, "node", "left_anti"
        ).localCheckpoint(eager=False)
    rounds = 0
    while uncolored.count() > 0:
        if rounds >= max_rounds:
            raise RuntimeError(
                f"greedy_coloring did not finish in {max_rounds} rounds "
                "— refusing to return a partial coloring"
            )
        rounds += 1
        # tentative color: mex over COMMITTED neighbors, all uncolored
        # nodes at once
        if colors is None:
            tent = uncolored.select(
                "node", "key", F.lit(0).alias("tcolor")
            )
        else:
            used = (
                adj.join(uncolored, "node", "left_semi")
                .join(
                    colors.select(
                        F.col("node").alias("nbr"),
                        F.col("color").alias("ncolor"),
                    ),
                    "nbr",
                )
                .groupBy("node")
                .agg(F.sort_array(F.collect_set("ncolor")).alias("used"))
            )
            tent = uncolored.join(used, "node", "left").select(
                "node",
                "key",
                F.when(F.col("used").isNull(), F.lit(0))
                .otherwise(
                    F.array_min(
                        F.array_except(
                            F.sequence(F.lit(0), F.size("used")),
                            F.col("used"),
                        )
                    )
                )
                .alias("tcolor"),
            )
        tent = tent.localCheckpoint(eager=False)
        # conflicts: tentative neighbors with the SAME tentative color
        # — the lower-priority endpoint loses and stays uncolored
        losers = (
            adj.join(tent, "node")
            .join(
                tent.select(
                    F.col("node").alias("nbr"),
                    F.col("key").alias("nkey"),
                    F.col("tcolor").alias("ntcolor"),
                ),
                "nbr",
            )
            .filter(
                (F.col("tcolor") == F.col("ntcolor"))
                & (F.col("key") < F.col("nkey"))
            )
            .select("node")
            .distinct()
        )
        newly = tent.join(losers, "node", "left_anti").select(
            "node", F.col("tcolor").alias("color")
        )
        colors = newly if colors is None else colors.union(newly)
        colors = colors.localCheckpoint(eager=False)
        uncolored = uncolored.join(
            newly, "node", "left_anti"
        ).localCheckpoint(eager=False)
    if colors is None:
        # empty edge list: empty coloring with the right schema
        colors = (
            adj.select("node").distinct().select("node", F.lit(0).alias("color"))
        )
    return colors, rounds


def label_propagation_colored_converged(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_sweeps: int = 30,
    colors: DataFrame | None = None,
    start_labels: DataFrame | None = None,
) -> tuple[DataFrame, int, int, int]:
    """Label propagation on a GENERAL color-class schedule — the
    :func:`label_propagation_semisync_converged` idea extended to
    graphs where id parity is NOT a proper 2-coloring (any graph with
    odd cycles; the co-purchase graph has triangles). A proper
    coloring (``colors``, or :func:`greedy_coloring` if absent)
    partitions nodes so no class contains an adjacent pair; each sweep
    updates class 0, then class 1 from the just-updated state, and so
    on — within a class the voting side is frozen AND no two updating
    nodes are neighbors, so the simultaneous-flip mechanism behind
    synchronous LPA's 2-cycles cannot occur inside any class. Returns
    ``(labels, sweeps_run, changed_at_stop, n_classes)``.

    Class sizes are SKEWED by construction — greedy coloring packs
    most nodes into the low colors (color 0 is a maximal independent
    set) — but per-sweep cost is skew-proof: each edge participates in
    exactly one class's half-round (the one owning its destination),
    so a sweep touches every edge once regardless of how unevenly the
    classes split, same as one synchronous round. The edge list is
    sliced by destination color ONCE (k cached slices, k ≤ Δ+1).

    Convergence on general graphs remains empirical (sequential-order
    LPA can cycle through label ties in pathological cases), so the
    contract stays honest: ``max_sweeps`` bounds the loop and
    ``changed_at_stop`` reports the outcome. ``start_labels``
    warm-restarts from a prior run's communities (nightly refresh);
    changed == 0 certifies a fixed point of TODAY's graph regardless
    of the starting labels.
    """
    if max_sweeps < 1:
        raise ValueError(f"max_sweeps must be >= 1, got {max_sweeps}")
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if colors is None:
        colors, _ = greedy_coloring(edges, src, dst)
    # edge-layout seam (ADVICE r12), default byte-identical to the
    # former inline repartition+localCheckpoint
    ec = pin_partitioned(
        e.join(
            colors.select(
                F.col("node").alias("dst"), F.col("color").alias("_c")
            ),
            "dst",
        ),
        "src",
    )
    # one int per class — ≤ max_degree + 1, never data-sized
    classes = sorted(r[0] for r in ec.select("_c").distinct().collect())
    halves = [
        ec.filter(F.col("_c") == c).drop("_c").localCheckpoint(eager=False)
        for c in classes
    ]
    base = e.select(F.col("src").alias("node")).distinct()
    if start_labels is None:
        labels = base.select("node", F.col("node").alias("label"))
    else:
        labels = base.join(
            start_labels.select("node", F.col("label").alias("_l0")),
            "node",
            "left",
        ).select(
            "node", F.coalesce("_l0", F.col("node")).alias("label")
        )
    labels = labels.localCheckpoint(eager=False)
    labels, sweeps, changed = _lpa_scheduled_sweeps(
        halves, labels, max_sweeps
    )
    return labels, sweeps, changed, len(classes)


def kcore_nodes_after_deletions(
    edges: DataFrame,
    old_core: DataFrame,
    k: int,
    rounds: int,
    a: str = "a",
    b: str = "b",
) -> DataFrame:
    """k-core maintenance under edge DELETIONS (nightly expiry — the
    reference forever-loop's re-run-cheaply shape): ``edges`` is
    TODAY's edge list (yesterday's minus the deleted edges) and
    ``old_core`` yesterday's k-core membership (single column
    ``node``). Returns today's exact k-core.

    Why restricting to the old core is exact, not approximate:
    deleting edges can only SHRINK the k-core —
    ``kcore(G') ⊆ kcore(G)`` for ``G' ⊆ G``, since kcore(G') is a
    min-degree-k subgraph of G and kcore(G) is the maximal one. So
    today's core lives inside ``induced(old_core, G')``; and any
    min-degree-k subgraph of that induced graph is also one of G',
    hence ``kcore(G') == kcore(induced(old_core, G'))`` exactly.
    The peel therefore touches |core-induced edges| per pass instead
    of |E|. How much that saves is a property of the DEGREE
    DISTRIBUTION: on power-law graphs (web, co-occurrence, social —
    the 100 TB reality) the k-core is a small dense nucleus and the
    restriction drops most of the edge list; on the near-regular
    synthetic co-purchase graph the 20-core keeps ~88% of edges, so
    the measured saving there is ~12% (SCALE.md r12 — measured, not
    assumed; the same testdata has NO selective-core graph at any k,
    its degree cliff peels to all-or-nothing). The restriction is
    never worse than the cold peel's first round (two node-key
    semi-joins), and the correctness does not depend on the ratio —
    the value oracle peels today's graph cold and must hash-match.
    The peel itself is :func:`kcore_nodes`.

    Edge INSERTIONS can GROW the core and need the candidate-expansion
    traversal of :func:`kcore_nodes_after_insertions`.
    """
    core_a = old_core.select(F.col("node").alias(a))
    core_b = old_core.select(F.col("node").alias(b))
    induced = edges.join(core_a, a, "left_semi").join(
        core_b, b, "left_semi"
    )
    return kcore_nodes(induced, k=k, rounds=rounds, a=a, b=b)


def kcore_nodes_after_insertions(
    edges: DataFrame,
    inserted: DataFrame,
    old_core: DataFrame,
    k: int,
    rounds: int,
    a: str = "a",
    b: str = "b",
    max_expand_rounds: int = 30,
) -> tuple[DataFrame, int]:
    """k-core maintenance under edge INSERTIONS — the other half of
    :func:`kcore_nodes_after_deletions` (the Sariyüce-et-al-style
    candidate expansion, DataFrame-shaped). ``edges`` is TODAY's full
    edge list ``G' = G ∪ inserted``, ``inserted`` the new edges,
    ``old_core`` yesterday's k-core of G. Returns ``(today's exact
    k-core, expansion_rounds_run)``.

    Why the candidate set is exact, not heuristic: insertions only
    GROW the core (``kcore(G) ⊆ kcore(G')``), so the unknown is the
    JOINER set ``S = kcore(G') \\ kcore(G)``. Two necessary facts
    about any joining component S:

    * every ``v ∈ S`` has full-graph degree ``deg_G'(v) >= k``
      (subgraph degree is a lower bound) — the "eligible" prune;
    * S contains an endpoint of an inserted edge: if no new edge
      were incident to S, then every S-node's >= k new-core
      neighbors (old-core or S members, via old edges only) existed
      already in G, making ``kcore(G) ∪ S`` a min-degree-k subgraph
      of G — contradicting kcore(G)'s maximality. The same argument
      applied to S's connected components (through S) means every
      joiner is REACHABLE from an inserted endpoint through eligible
      non-core nodes.

    So ``candidates = old_core ∪ reach(inserted endpoints, through
    eligible non-core nodes)`` contains kcore(G'), and — as in the
    deletion case — any min-degree-k subgraph of
    ``induced(candidates, G')`` is one of G', hence
    ``kcore(induced(candidates, G')) == kcore(G')`` exactly. The
    expansion is a frontier BFS (one edge-join + anti-join per
    round, frontiers checkpointed) that stops when the frontier
    empties; ``max_expand_rounds`` bounds the pathological chain
    case, and overrunning it raises rather than silently returning a
    subset — exactness over availability. The final peel is
    :func:`kcore_nodes` over the candidate-induced subgraph: at
    100 TB the traversal touches the insertion's blast radius
    (eligible non-core nodes near new edges), not the corpus-scale
    edge list, and the peel input is old-core-plus-blast-radius
    sized. The g7c query pins exactness with a VALUE oracle: the
    DuckDB twin peels today's graph cold.
    """
    e = (
        edges.select(F.col(a).alias("a"), F.col(b).alias("b"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    mirrored = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    deg = mirrored.groupBy(F.col("a").alias("node")).agg(
        F.count(F.lit(1)).alias("d")
    )
    core_nodes = old_core.select("node").localCheckpoint(eager=False)
    # joiner candidates must be non-core with full-graph degree >= k
    eligible = (
        deg.filter(F.col("d") >= k)
        .select("node")
        .join(core_nodes, "node", "left_anti")
        .localCheckpoint(eager=False)
    )
    seeds = (
        inserted.select(F.col(a).alias("node"))
        .union(inserted.select(F.col(b).alias("node")))
        .distinct()
        .join(eligible, "node", "left_semi")
    )
    reach = seeds.localCheckpoint(eager=False)
    frontier = reach
    expand_rounds = 0
    while frontier.take(1):
        if expand_rounds >= max_expand_rounds:
            raise RuntimeError(
                f"kcore_nodes_after_insertions: candidate expansion "
                f"did not close within {max_expand_rounds} rounds — "
                "refusing to peel a possibly-incomplete candidate set "
                "(run a cold kcore_nodes peel instead, or raise "
                "max_expand_rounds)"
            )
        nbrs = (
            mirrored.join(
                frontier.select(F.col("node").alias("a")), "a", "left_semi"
            )
            .select(F.col("b").alias("node"))
            .distinct()
        )
        frontier = (
            nbrs.join(eligible, "node", "left_semi")
            .join(reach, "node", "left_anti")
            .localCheckpoint(eager=False)
        )
        reach = reach.union(frontier).distinct().localCheckpoint(
            eager=False
        )
        expand_rounds += 1
    cand = core_nodes.union(reach).distinct()
    induced = e.join(
        cand.select(F.col("node").alias("a")), "a", "left_semi"
    ).join(cand.select(F.col("node").alias("b")), "b", "left_semi")
    out = kcore_nodes(induced, k=k, rounds=rounds, a="a", b="b")
    return out, expand_rounds


def _neighbor_vote(joined: DataFrame, dst, out: str = "label") -> DataFrame:
    """One LPA vote round over an (edges ⋈ labels) relation: the most
    frequent neighbor label per destination node, ties to the LOWEST
    label, as column ``out``.

    Default is the r12 single deterministic-mode aggregate — one
    exchange per round (``mode(label, deterministic=true)`` is exactly
    "most frequent, ties to lowest" for any orderable label type).
    ``SPARK_GRAFT_LPA_VOTE=two_stage`` restores the r11
    count + ``min(struct(-votes, label))`` cascade (two exchanges per
    round) — kept as a measurement seam so the r12 rewrite stays
    A/B-able cold-JVM at the driver's bench regime (VERDICT r12 #1).
    Results are identical in both shapes by construction; the oracle
    and tests pin the default path.
    """
    import os

    if os.environ.get("SPARK_GRAFT_LPA_VOTE", "mode") == "two_stage":
        votes = joined.groupBy(dst.alias("node"), "label").agg(
            F.count(F.lit(1)).alias("votes")
        )
        return (
            votes.groupBy("node")
            .agg(
                F.min(
                    F.struct((-F.col("votes")).alias("nv"), F.col("label"))
                ).alias("m")
            )
            .select("node", F.col("m.label").alias(out))
        )
    return joined.groupBy(dst.alias("node")).agg(
        F.mode("label", True).alias(out)
    )


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
) -> DataFrame:
    """Synchronous label propagation (community detection) over an
    undirected edge list given in mirrored form (both directions
    present). Returns ``(node, label)`` after ``iterations`` rounds.

    Semantics: ``label_0(v) = v``; each round every node adopts the
    most frequent label among its NEIGHBORS (the node's own previous
    label does not vote), ties broken to the smallest label — the
    deterministic variant of Raghavan et al.'s LPA, so the result is a
    pure function of the edge set and both engines agree bit-for-bit.

    Scale shape: edges are repartitioned on ``src`` once and lazily
    checkpointed; each round is one hash join of the previous labels
    (already partitioned on node by the round's final groupBy) against
    the cached edges, a partial-aggregating groupBy(node, label)
    vote count, and a groupBy(node) argmax — label state never exceeds
    one row per node, and the plan stays constant-size via
    ``localCheckpoint`` (swap for ``checkpoint`` on a real cluster).
    The neighbor-majority argmax is ONE ``mode(label,
    deterministic=true)`` aggregate (r12): Spark's deterministic mode
    returns the most frequent value with ties to the LOWEST — exactly
    the count-then-``min(struct(-votes, label))`` two-aggregate cascade
    it replaces, for any orderable label type, but in a single
    groupBy(dst): one exchange per round instead of two (the
    (dst,label) vote-count exchange is gone), with the per-mapper
    label->count maps still merging partially map-side
    (ObjectHashAggregate).
    """
    e = pin_partitioned(
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")),
        "src",
    )
    labels = (
        e.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
    )
    for _ in range(iterations):
        labels = _neighbor_vote(
            e.join(labels, e["src"] == labels["node"]), e["dst"]
        ).localCheckpoint(eager=False)
    return labels


def label_propagation_converged(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 30,
    check_every: int = 1,
    start_labels: DataFrame | None = None,
) -> tuple[DataFrame, int, int]:
    """:func:`label_propagation` run until LABELS STOP CHANGING — the
    algorithm's natural stopping rule (the synchronous deterministic
    variant either reaches a fixed point or enters a 2-cycle;
    ``max_iterations`` bounds the 2-cycle case, and the returned
    ``changed`` count says which happened: 0 = fixed point). Returns
    ``(labels, iterations_run, changed_at_stop)``.

    Unlike PageRank's float residual there is no tolerance to pick:
    the per-check action counts label flips (one narrow self-join +
    count — an INTEGER, so the stop decision is exact and
    partition-invariant; no ulp-at-the-boundary concern).
    ``check_every=k`` folds k vote rounds into one job between
    checks, same amortization trade as :func:`pagerank_converged`.
    Per-round cost is identical to the fixed-count operator: one
    join + one deterministic-mode vote groupBy on the cached edge
    list.

    2-cycle safety: the block check compares labels k rounds apart,
    and for EVEN k the two states of a period-2 oscillation compare
    equal — a bipartite-ish graph would be misreported as a fixed
    point (ADVICE r11). So a zero block-delta at k > 1 is confirmed
    against the block's second-to-last round (one extra narrow
    join + count, only at a candidate stop): equal there too means a
    genuine fixed point (one synchronous round is deterministic, so
    labels(i) == labels(i-1) is absorbing); unequal means the cycle —
    the loop keeps going and the returned ``changed`` is the
    single-round flip count, honoring the "0 = fixed point" contract.

    ``start_labels`` (``(node, label)``) warm-restarts from a prior
    run's communities — the nightly-refresh seam (VERDICT r11 #4,
    same shape as :func:`pagerank_converged`'s ``start_ranks``):
    nodes present take their old label, new nodes start at their own
    id. UNLIKE PageRank there is no unique fixed point — LPA's
    stopping state depends on the start — so warm labels are a valid
    fixed point of TODAY's graph (changed == 0 means no node wants to
    flip, regardless of how labels got there) but not necessarily the
    cold run's labels. That is the standard incremental-LPA contract;
    the compensating tests assert fixed-point-ness of the warm result
    and the measured round savings live in SCALE.md.
    """
    if check_every < 1:
        raise ValueError(f"check_every must be >= 1, got {check_every}")
    if max_iterations < 1:
        raise ValueError(
            f"max_iterations must be >= 1, got {max_iterations}"
        )
    # same edge-layout seam as the fixed-iteration operator (ADVICE
    # r12: SPARK_GRAFT_EDGE_LAYOUT was honored only there); default
    # layout is byte-identical to the former inline
    # repartition+localCheckpoint
    e = pin_partitioned(
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")),
        "src",
    )
    base = e.select(F.col("src").alias("node")).distinct()
    if start_labels is None:
        labels = base.select("node", F.col("node").alias("label"))
    else:
        labels = base.join(
            start_labels.select("node", F.col("label").alias("_l0")),
            "node",
            "left",
        ).select(
            "node", F.coalesce("_l0", F.col("node")).alias("label")
        )
    labels = labels.localCheckpoint(eager=False)

    def _flips(a: DataFrame, b: DataFrame) -> int:
        return (
            a.alias("a")
            .join(b.alias("b"), F.col("a.node") == F.col("b.node"))
            .filter(F.col("a.label") != F.col("b.label"))
            .count()
        )

    iterations_run = 0
    changed = -1
    while iterations_run < max_iterations:
        prev = labels
        second_last = labels
        for _ in range(min(check_every, max_iterations - iterations_run)):
            second_last = labels
            # one deterministic-mode vote round (see _neighbor_vote)
            labels = _neighbor_vote(
                e.join(labels, e["src"] == labels["node"]), e["dst"]
            ).localCheckpoint(eager=False)
            iterations_run += 1
        changed = _flips(labels, prev)
        if changed == 0:
            if second_last is prev:
                break  # k==1: the block delta IS the one-round delta
            # confirm vs the block's last single round — a 2-cycle at
            # even k aliases to 0 across the block (see docstring)
            changed = _flips(labels, second_last)
            if changed == 0:
                break
    return labels, iterations_run, changed
