"""Cache-lifecycle regression tests for the dedup operators (r11).

VERDICT r10 "What's wrong" #3: ``minhash_lsh_pairs`` and
``prefix_filter_jaccard_pairs`` pin intermediates and relied on the
caller to ``clearCache()``; a long-lived session composing pipelines
accumulated pinned blocks until LRU eviction. The fix is the
``dedup.released_after()`` scope — every persist an operator takes
inside it is unpersisted on scope exit, AFTER the caller has
materialized the result. These tests assert the contract directly
against the JVM's persistent-RDD table: no pinned blocks survive the
scope, for every operator that pins, on both key paths.
"""

from __future__ import annotations

import pytest

from mcyj_datapipeline_spark.operators import dedup as D


def _persisted_ids(spark) -> set[int]:
    """RDD ids currently registered as persistent in the JVM —
    persisted DataFrames appear here once materialized, and unpersist
    removes them. Set-difference (not emptiness) so caches other
    tests in the shared session legitimately hold don't interfere."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    return {int(k) for k in jmap.keySet().toArray()}


@pytest.fixture()
def corpus(spark):
    rows = [
        (i, f"alpha beta gamma delta w{i % 7} epsilon zeta eta theta")
        for i in range(30)
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


@pytest.mark.parametrize("hash_keys", [False, True])
def test_prefix_filter_pins_released_on_scope_exit(
    spark, corpus, hash_keys
):
    before = _persisted_ids(spark)
    with D.released_after():
        pairs = D.prefix_filter_jaccard_pairs(
            corpus, threshold=0.5, hash_keys=hash_keys
        )
        rows = pairs.collect()
        assert rows  # near-dup-rich corpus: the pins served real work
        # inside the scope the pinned relations ARE materialized
        # (string path: ordered; hash path: sh + ordered)
        assert len(_persisted_ids(spark) - before) >= 1
    assert _persisted_ids(spark) - before == set()


def test_minhash_lsh_pairs_pins_released_on_scope_exit(spark, corpus):
    before = _persisted_ids(spark)
    with D.released_after():
        pairs = D.minhash_lsh_pairs(corpus, jaccard_threshold=0.5)
        pairs.collect()
        assert len(_persisted_ids(spark) - before) >= 1
    assert _persisted_ids(spark) - before == set()


def test_simhash_near_pairs_pins_released_on_scope_exit(spark, corpus):
    before = _persisted_ids(spark)
    with D.released_after():
        D.simhash_near_pairs(corpus, max_hamming=3).collect()
    assert _persisted_ids(spark) - before == set()


def test_incremental_lsh_pins_released_on_scope_exit(spark, corpus):
    new = corpus.filter("doc_id >= 15")
    old = corpus.filter("doc_id < 15")
    before = _persisted_ids(spark)
    with D.released_after():
        D.minhash_lsh_pairs_incremental(
            new, old, jaccard_threshold=0.3
        ).collect()
    assert _persisted_ids(spark) - before == set()


def test_scope_releases_on_exception(spark, corpus):
    """The unpersist runs in a finally: a pipeline that raises
    mid-materialization must not leak its pins."""
    before = _persisted_ids(spark)
    with pytest.raises(RuntimeError, match="boom"):
        with D.released_after():
            D.prefix_filter_jaccard_pairs(corpus, threshold=0.5).collect()
            raise RuntimeError("boom")
    assert _persisted_ids(spark) - before == set()


def test_scopes_nest_independently(spark, corpus):
    """Inner scope releases its own pins without touching the outer
    scope's; the outer release still happens at outer exit."""
    before = _persisted_ids(spark)
    with D.released_after():
        outer = D.minhash_lsh_pairs(corpus, jaccard_threshold=0.5)
        outer.collect()
        after_outer = _persisted_ids(spark) - before
        assert after_outer
        with D.released_after():
            D.prefix_filter_jaccard_pairs(corpus, threshold=0.5).collect()
        # inner pins gone, outer pins intact
        assert _persisted_ids(spark) - before == after_outer
        # outer result still served from cache (re-materialize works)
        outer.count()
    assert _persisted_ids(spark) - before == set()


def test_e8_pipeline_pin_scoped(spark, sf_dir):
    """The shared seam covers non-dedup pinning operators too: e8's
    narrow quality_kept pin (registry_batch5) registers in the same
    scope stack and is released on exit."""
    from mcyj_datapipeline_spark import registry

    before = _persisted_ids(spark)
    with D.released_after():
        registry.queries()["e8_curation_pipeline"](spark, sf_dir).collect()
        assert len(_persisted_ids(spark) - before) >= 1
    assert _persisted_ids(spark) - before == set()


def test_outside_scope_caller_owns_cache(spark, corpus):
    """Documented legacy behavior is unchanged: with no scope active,
    pins outlive materialization (so a driver composing a pipeline
    and re-reading the result keeps the cache) and clearCache drops
    them."""
    before = _persisted_ids(spark)
    D.prefix_filter_jaccard_pairs(corpus, threshold=0.5).collect()
    leaked = _persisted_ids(spark) - before
    assert leaked  # the pin intentionally survives — caller-owned
    spark.catalog.clearCache()
    assert _persisted_ids(spark) - before == set()


def test_pin_scopes_are_thread_local(spark, corpus):
    """ADVICE r11: pins taken on a different driver thread must NOT
    register in this thread's released_after() scope — the scope exit
    here must not unpersist a cache the other thread still owns."""
    import threading

    from mcyj_datapipeline_spark.operators import caching

    before = _persisted_ids(spark)
    worker_df = []

    def worker():
        df = caching.pin(corpus.select("doc_id"))
        df.count()  # materialize the worker-thread pin
        worker_df.append(df)

    with D.released_after():
        t = threading.Thread(target=worker)
        t.start()
        t.join()
        assert worker_df
    # the main-thread scope exited; the worker's pin must survive
    # (it was caller-owned on that thread, no scope was active there)
    assert len(_persisted_ids(spark) - before) >= 1
    worker_df[0].unpersist(False)
    assert _persisted_ids(spark) - before == set()


def test_scope_on_worker_thread_releases_its_own_pins(spark, corpus):
    """The converse: a released_after() scope opened ON a worker
    thread sees that thread's pins and releases them on exit."""
    import threading

    from mcyj_datapipeline_spark.operators import caching

    before = _persisted_ids(spark)
    inside = []

    def worker():
        with caching.released_after():
            df = caching.pin(corpus.select("doc_id"))
            df.count()
            inside.append(len(_persisted_ids(spark) - before))

    t = threading.Thread(target=worker)
    t.start()
    t.join()
    assert inside and inside[0] >= 1  # pin registered + materialized
    assert _persisted_ids(spark) - before == set()  # and released
