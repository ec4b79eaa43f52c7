"""Cache lifecycle seam for operators that pin intermediates (r11).

Operators whose RETURNED plan reads a relation two or more times pin
it with :func:`pin` — the persist is what makes one materialization
cheap. But the returned frame is lazy, so the operator cannot know
when the caller is done; a long-lived session composing many
pipelines would accumulate pinned blocks until LRU eviction (VERDICT
r10 "What's wrong" #3). :func:`released_after` scopes the lifecycle
explicitly::

    with released_after():
        pairs = prefix_filter_jaccard_pairs(docs, threshold=0.8)
        hits = pairs.collect()      # pins serve their multiple reads
    # scope exit: every relation pinned inside is unpersisted

Outside any scope, behavior is the historical one: the caller owns
the cache (``spark.catalog.clearCache()`` between rounds, as bench.py
does, or per-frame unpersist). Scopes nest; each :func:`pin`
registers with the innermost. Regression coverage:
``tests/test_cache_hygiene.py`` asserts against the JVM
persistent-RDD table that no pins survive a scope.
"""

from __future__ import annotations

import contextlib
import threading

from pyspark.sql import DataFrame

# Scope stacks are PER-THREAD (ADVICE r11): submitting jobs from
# multiple driver threads is a standard Spark pattern, and a
# process-global stack would let thread B's pin() register into
# thread A's innermost released_after() scope — A's scope exit would
# then unpersist a cache B is still reading mid-query. threading.local
# gives each driver thread its own (initially empty) stack; a thread
# that never opens a scope keeps the historical caller-owns-the-cache
# behavior.
_TLS = threading.local()


def _scopes() -> list[list[DataFrame]]:
    stack = getattr(_TLS, "scopes", None)
    if stack is None:
        stack = _TLS.scopes = []
    return stack


def pin(df: DataFrame) -> DataFrame:
    """``persist()`` that registers in this THREAD's innermost
    :func:`released_after` scope (plain persist outside one)."""
    out = df.persist()
    stack = _scopes()
    if stack:
        stack[-1].append(out)
    return out


def pin_partitioned(df: DataFrame, key: str) -> DataFrame:
    """Pin a relation an ITERATIVE operator joins on ``key`` every
    round, keyed layout chosen by ``SPARK_GRAFT_EDGE_LAYOUT``. Callers
    (r13): the LPA family's edge lists — fixed-iteration
    ``label_propagation``, ``label_propagation_converged``, and the
    scheduled-sweep builders (ADVICE r12: the converged/scheduled
    variants used to hardcode the checkpoint layout while this
    docstring claimed coverage). PageRank/CC/BFS edge lists keep their
    own r11-adjudicated shapes (plain ``repartition`` + checkpoint, or
    distinct-partitioned) — routing them here would CHANGE their
    default plan, which the r12 layout A/B measured as a local loss.

    - ``checkpoint`` (default): ``repartition(key)`` + lazy
      ``localCheckpoint`` — the historical shape. The LogicalRDD loses
      the hash layout under AQE (captured pre-execution, partitioning
      Unknown), but per-round AQE re-plans freely: at bench scale it
      BROADCASTS the node-sized rank/label side, so the edge relation
      is never re-shuffled anyway, and coalesced AQEShuffleReads keep
      task counts proportional to data. Measured r12 (sf0.1): the
      persist layout tripled per-query task counts (32 fixed cached
      partitions; `canChangeCachedPlanOutputPartitioning` defaults
      false, so AQE cannot coalesce an InMemoryTableScan) and doubled
      summed task time — a pure local regression.

    - ``persist``: hash(key)-partitioned MEMORY_AND_DISK cache. An
      InMemoryTableScan reports the cached plan's outputPartitioning,
      so a scale-shaped (sort-merge) per-round join reuses the layout
      and only the rank/label side is exchanged per round — at
      cluster scale, where ranks outgrow the broadcast ceiling and
      every round would otherwise re-Exchange the FULL edge relation
      (measured r12: shuffle-read bytes per query drop 28-49% under
      this layout even at sf0.1). Production clusters set this; the
      local default stays ``checkpoint`` so the driver's bench regime
      is comparable across rounds.
    """
    import os

    if os.environ.get("SPARK_GRAFT_EDGE_LAYOUT", "checkpoint") == "persist":
        return pin(df.repartition(key))
    return df.repartition(key).localCheckpoint(eager=False)


@contextlib.contextmanager
def released_after():
    """Unpersist every :func:`pin` taken inside the block ON THIS
    THREAD on exit — non-blocking and exception-safe. Materialize
    INSIDE the block."""
    stack = _scopes()
    pins: list[DataFrame] = []
    stack.append(pins)
    try:
        yield
    finally:
        stack.pop()
        for p in pins:
            try:
                p.unpersist(False)
            except Exception:  # session already stopped, etc.
                pass
