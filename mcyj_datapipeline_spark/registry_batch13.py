"""Batch 13 registry entries (round 3, continued): time-series
regularization — dense calendar resampling with LOCF and linear-
interpolation gap fill over the per-user purchase-value series.

Reference provenance: the reference's time handling is cutoff filters
and max-date scans (P8/A8); these add the regularization layer any
per-entity metric consumer (windowed models, charts, anomaly scoring)
needs on the same event data, as declarative spine-join-window plans
with DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mcyj_datapipeline_spark.io import read_table
from mcyj_datapipeline_spark.operators.timeseries import (
    daily_observations,
    interpolate_linear,
    resample_locf,
)
from mcyj_datapipeline_spark.registry import register


def _t(spark, sf_dir, name):
    return read_table(spark, sf_dir, name)


_OBS_SQL = """
  SELECT user_id, date_trunc('day', ts)::DATE AS d,
         round(avg(value), 6) AS v
  FROM events
  WHERE event_type = 'purchase' AND value IS NOT NULL AND user_id < 200
  GROUP BY user_id, date_trunc('day', ts)::DATE
"""

_SPINE_SQL = f"""
obs AS ({_OBS_SQL}),
bounds AS (SELECT min(d) AS lo, max(d) AS hi FROM obs),
spine AS (
  SELECT o.user_id, gs.g::DATE AS d
  FROM (SELECT DISTINCT user_id FROM obs) o,
       bounds b,
       LATERAL (SELECT unnest(generate_series(b.lo, b.hi,
                                              INTERVAL 1 DAY)) AS g) gs
),
joined AS (
  SELECT s.user_id, s.d, o.v
  FROM spine s LEFT JOIN obs o
    ON o.user_id = s.user_id AND o.d = s.d
)
"""


def _obs(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").filter(
        (F.col("event_type") == "purchase") & (F.col("user_id") < 200)
    )
    return daily_observations(ev, "user_id", "ts", "value")


@register(
    "ts1_locf_resample",
    f"""
    WITH {_SPINE_SQL}
    SELECT user_id, d,
           last_value(v IGNORE NULLS) OVER (PARTITION BY user_id
             ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS locf
    FROM joined ORDER BY user_id, d
    """,
    "Time-series regularization, LOCF: sparse per-user daily "
    "observations land on a dense calendar spine (distinct keys x a "
    "1-row broadcast bounds relation -> sequence+explode, no driver "
    "collect) and gaps carry the last observed value forward via an "
    "ignore-nulls window. One groupBy, one spine join, one "
    "key-partitioned window; spine cardinality keys x days is the "
    "only growing term, and rows before a key's first observation "
    "stay NULL (no fabricated history).",
)
def ts1_locf_resample(spark, sf_dir):
    out = resample_locf(_obs(spark, sf_dir))
    return out.select(
        F.col("k").alias("user_id"), "d", "locf"
    ).orderBy("user_id", "d")


@register(
    "ts2_linear_interpolation",
    f"""
    WITH {_SPINE_SQL},
    ctx AS (
      SELECT user_id, d, v,
             last_value(v IGNORE NULLS) OVER wp AS pv,
             last_value(CASE WHEN v IS NOT NULL THEN d END IGNORE NULLS)
               OVER wp AS pd,
             first_value(v IGNORE NULLS) OVER wf AS nv,
             first_value(CASE WHEN v IS NOT NULL THEN d END IGNORE NULLS)
               OVER wf AS nd
      FROM joined
      WINDOW wp AS (PARTITION BY user_id ORDER BY d
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wf AS (PARTITION BY user_id ORDER BY d
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id, d,
           floor((CASE
             WHEN v IS NOT NULL THEN v
             WHEN pv IS NOT NULL AND nv IS NOT NULL
               THEN pv + (nv - pv) * (datediff('day', pd, d)::DOUBLE
                                      / datediff('day', pd, nd))
             WHEN pv IS NOT NULL THEN pv
             ELSE nv END) * 1000000.0 + 0.5) / 1000000.0 AS v_interp
    FROM ctx ORDER BY user_id, d
    """,
    "Time-series regularization, linear interpolation: gaps fill on "
    "the straight line between the neighboring observations (edges "
    "extend flat). The prev/next observation AND its date come from "
    "four ignore-nulls window expressions over the same two "
    "key-partitioned frames — no self-join, no per-gap subquery; the "
    "interpolation itself is pure arithmetic on datediffs, written "
    "identically in both engines so the float paths agree bit-for-bit "
    "before the final round.",
)
def ts2_linear_interpolation(spark, sf_dir):
    out = interpolate_linear(_obs(spark, sf_dir))
    return out.select(
        F.col("k").alias("user_id"), "d", "v_interp"
    ).orderBy("user_id", "d")


@register(
    "ts3_holt_linear_smoothing",
    f"""
    WITH RECURSIVE obs AS ({_OBS_SQL}),
    seq AS (
      SELECT user_id, d, v,
             row_number() OVER (PARTITION BY user_id ORDER BY d) AS rn
      FROM obs
    ), walk AS (
      SELECT user_id, d, v, rn,
             v AS level, 0.0::DOUBLE AS trend, NULL::DOUBLE AS fitted
      FROM seq WHERE rn = 1
      UNION ALL
      SELECT s.user_id, s.d, s.v, s.rn,
             0.5*s.v + (1.0-0.5)*(w.level + w.trend),
             0.25*((0.5*s.v + (1.0-0.5)*(w.level + w.trend)) - w.level)
               + (1.0-0.25)*w.trend,
             w.level + w.trend
      FROM walk w
      JOIN seq s ON s.user_id = w.user_id AND s.rn = w.rn + 1
    )
    SELECT user_id, d,
           floor(level * 1000000.0 + 0.5) / 1000000.0 AS level,
           floor(trend * 1000000.0 + 0.5) / 1000000.0 AS trend,
           floor(fitted * 1000000.0 + 0.5) / 1000000.0 AS fitted
    FROM walk ORDER BY user_id, d
    """,
    "Holt's linear-trend double exponential smoothing (alpha=0.5, "
    "beta=0.25 — exact binary fractions) over each user's daily "
    "purchase series: TWO recurrences chained through each other "
    "(level needs the previous level+trend, trend needs the new "
    "level), the case one window pass cannot express even with "
    "prefix tricks. Ordered partition-map, one shuffle on the key; "
    "the DuckDB twin walks the same chain as a recursive CTE with "
    "the arithmetic in the same operation order, and output rounding "
    "is the cross-engine-stable floor(x*1e6+0.5)/1e6 formula.",
)
def ts3_holt_linear_smoothing(spark, sf_dir):
    from mcyj_datapipeline_spark.operators.sequential import (
        holt_linear_per_key,
    )

    obs = _obs(spark, sf_dir).select(
        F.col("k").alias("user_id"), "d", "v"
    )
    out = holt_linear_per_key(
        obs, ["user_id"], "d", "v", alpha=0.5, beta=0.25, tiebreak_col="d"
    )
    scale = F.lit(1000000.0)

    def stable(c):
        return F.floor(F.col(c) * scale + F.lit(0.5)) / scale

    return out.select(
        "user_id",
        "d",
        stable("level").alias("level"),
        stable("trend").alias("trend"),
        stable("fitted").alias("fitted"),
    ).orderBy("user_id", "d")


@register(
    "a13b_exact_median_two_pass",
    """
    SELECT count(*) AS n_rows,
           round(median(o_totalprice), 4) AS median
    FROM orders
    """,
    "A13 scale twin #2: EXACT median with NO global sort and NO "
    "sketch error — pass 1 histograms into 1024 equal-width bins "
    "(map-side-combined groupBy; the collected histogram is 1024 "
    "rows, bounded like the k-means/stratified collects), the running "
    "counts locate the bin(s) holding the middle ranks, pass 2 "
    "touches only those bins' rows (~n/1024) and takes the order "
    "statistics via orderBy().limit(k) — TakeOrderedAndProject, "
    "per-partition top-k + merge. Completes the quantile ladder: "
    "exact percentile (test scale) / approx_percentile (one-pass "
    "sketch) / two-pass exact (no-sort exact at scale).",
)
def a13b_exact_median_two_pass(spark, sf_dir):
    from mcyj_datapipeline_spark.operators.aggregates import (
        exact_median_two_pass,
    )

    out = exact_median_two_pass(
        _t(spark, sf_dir, "orders"), "o_totalprice", buckets=1024
    )
    return out.select(
        "n_rows", F.round("median", 4).alias("median")
    )


# ===========================================================================
# Incremental connected components: fold a NEW batch into an existing
# cluster map without re-pairing the corpus
# ===========================================================================

from mcyj_datapipeline_spark.registry_batch3 import (  # noqa: E402
    _cluster_oracle_sql,
)


@register(
    "dedup_incremental_cc",
    _cluster_oracle_sql(),
    "Incremental clustering: the EXISTING corpus (doc_id < 400) "
    "contributes only its saved (node, cluster) map — re-encoded as "
    "edges, a diameter-1 star per cluster — while the NEW batch "
    "(doc_id >= 400) contributes its intra-batch pairs plus "
    "batch-vs-corpus screening pairs (the incremental band join, "
    "never existing x existing). CC over that union provably equals "
    "CC over the full pair set (each piece preserves connectivity), "
    "so the oracle is the same recursive-CTE clustering as the "
    "from-scratch query — but the per-ingest cost is batch-sized, "
    "and the flattened star edges converge in O(new-chain) rounds.",
)
def dedup_incremental_cc(spark, sf_dir):
    from mcyj_datapipeline_spark.operators.dedup import (
        connected_components,
        minhash_lsh_pairs,
        minhash_lsh_pairs_incremental,
    )

    docs = _t(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") < 400)
    new = docs.filter(F.col("doc_id") >= 400)
    old_map = connected_components(
        minhash_lsh_pairs(old, jaccard_threshold=0.8), "id_a", "id_b"
    ).select(
        F.col("doc_id").alias("id_a"), F.col("cluster_id").alias("id_b")
    )
    cross = minhash_lsh_pairs_incremental(
        new, old, jaccard_threshold=0.8
    ).select(
        F.col("new_id").alias("id_a"), F.col("existing_id").alias("id_b")
    )
    intra_new = minhash_lsh_pairs(new, jaccard_threshold=0.8).select(
        "id_a", "id_b"
    )
    merged = old_map.unionByName(cross).unionByName(intra_new)
    return connected_components(merged, "id_a", "id_b")


@register(
    "dedup_snm_multipass",
    """
    WITH norm AS (
      SELECT doc_id, lang,
             trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))
               AS sk0
      FROM documents
    ), passes AS (
      SELECT doc_id, lang, sk0 AS sk, 0 AS pass FROM norm
      UNION ALL
      SELECT doc_id, lang, reverse(sk0), 1 FROM norm
    ), lagd AS (
      SELECT pass, doc_id, lang, sk,
             lag(doc_id, 1) OVER w AS d1, lag(sk, 1) OVER w AS s1,
             lag(doc_id, 2) OVER w AS d2, lag(sk, 2) OVER w AS s2,
             lag(doc_id, 3) OVER w AS d3, lag(sk, 3) OVER w AS s3
      FROM passes
      WINDOW w AS (PARTITION BY pass, lang, substr(sk, 1, 1)
                   ORDER BY sk, doc_id)
    ), cand AS (
      SELECT d1 AS id_a, doc_id AS id_b, s1 AS sk_a, sk AS sk_b
      FROM lagd WHERE d1 IS NOT NULL
      UNION ALL
      SELECT d2, doc_id, s2, sk FROM lagd WHERE d2 IS NOT NULL
      UNION ALL
      SELECT d3, doc_id, s3, sk FROM lagd WHERE d3 IS NOT NULL
    )
    SELECT DISTINCT id_a, id_b FROM cand
    WHERE substr(sk_a, 1, 12) = substr(sk_b, 1, 12)
      AND greatest(length(sk_a), length(sk_b)) > 0
      AND least(length(sk_a), length(sk_b))::DOUBLE
          / greatest(length(sk_a), length(sk_b)) >= 0.8
    ORDER BY id_a, id_b
    """,
    "Multi-pass SNM (the standard recall fix): pass 1 sorts on the "
    "normalized key, pass 2 on its REVERSAL — an edit near the string "
    "head breaks pass-1 adjacency but not pass-2's, so the union "
    "recovers the single-pass blind spot. Both passes are the same "
    "block-partitioned O(n*w) window plan; DISTINCT dedups pairs both "
    "passes find. Still never all-pairs.",
)
def dedup_snm_multipass(spark, sf_dir):
    from mcyj_datapipeline_spark.operators.dedup import (
        sorted_neighborhood_pairs,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    common = dict(
        id_col="doc_id",
        text_col="text",
        block_col="lang",
        window=3,
        prefix_len=12,
        min_len_ratio=0.8,
    )
    p1 = sorted_neighborhood_pairs(docs, **common).select("id_a", "id_b")
    p2 = sorted_neighborhood_pairs(
        docs, reverse_key=True, **common
    ).select("id_a", "id_b")
    return p1.unionByName(p2).distinct().orderBy("id_a", "id_b")


# ===========================================================================
# E12: the nightly batch fold — the reference's actual nightly shape
# (run_full_pipeline.py:202-431: new = all - already_done, screen,
# enrich, fold into persistent state, append) composed from the
# individually-green incremental pieces into ONE flagship contract.
# ===========================================================================

from mcyj_datapipeline_spark.registry import _minhash_oracle_sql
from mcyj_datapipeline_spark.session import session_scratch


def _e12_oracle_sql() -> str:
    # From-scratch equivalent of the fold: ingested = corpus + new docs
    # that are not byte-dups of the corpus; cluster = recursive-CTE CC
    # over the MinHash pair set of exactly that ingested relation
    # (fold-equals-from-scratch is the provable contract: star edges
    # from the saved map preserve connectivity, cross/intra pairs are
    # the restriction of the full pair set to the ingested nodes).
    pairs = _minhash_oracle_sql(
        "(SELECT doc_id, text FROM ingested)"
    )
    return f"""
    WITH RECURSIVE ingested AS (
      SELECT doc_id, text,
             CASE WHEN doc_id < 400 THEN 'corpus' ELSE 'new' END AS status
      FROM documents
      WHERE doc_id < 400
         OR sha256(text) NOT IN
            (SELECT sha256(text) FROM documents WHERE doc_id < 400)
    ), pairs AS (
      SELECT id_a, id_b FROM ({pairs})
    ), und AS (
      SELECT id_a AS u, id_b AS v FROM pairs
      UNION
      SELECT id_b, id_a FROM pairs
    ), walk(node, comp) AS (
      SELECT u, u FROM und
      UNION
      SELECT und.v, walk.comp FROM walk JOIN und ON und.u = walk.node
    ), cl AS (
      SELECT node, min(comp) AS cluster_id FROM walk GROUP BY node
    )
    SELECT d.doc_id, coalesce(cl.cluster_id, d.doc_id) AS cluster_id,
           d.status
    FROM ingested d LEFT JOIN cl ON cl.node = d.doc_id
    ORDER BY d.doc_id
    """


@register(
    "e12_nightly_dedup_fold",
    _e12_oracle_sql(),
    "E12 flagship: the nightly incremental ingest fold. New batch "
    "(doc_id >= 400) -> exact-digest screen against the persistent "
    "digest state (32-byte shas, never text; drop only when the owner "
    "is OUTSIDE the batch, which makes re-runs idempotent) -> "
    "incremental MinHash screening (new x corpus banded join + "
    "intra-batch pairs, never corpus x corpus) -> CC fold over the "
    "star edges of only the TOUCHED saved components (semi-joined "
    "down to clusters adjacent to the batch/new pairs) + new pairs "
    "-> commit only those rows into bucketed ParquetStateTables "
    "(partition-pruned merge-on-write; untouched buckets' files stay "
    "byte-identical). Per-ingest cost — sketch and commit — is "
    "batch-adjacent; the corpus is touched only through its saved "
    "digest/cluster/signature state. Output: every ingested doc with "
    "its cluster id and provenance.",
)
def e12_nightly_dedup_fold(spark, sf_dir):
    state = _e12_state(spark, sf_dir, "e12")
    docs = _t(spark, sf_dir, "documents")
    _e12_bootstrap(spark, docs, *state)
    committed = _e12_fold_night(docs, 400, None, *state)
    return committed.select(
        "doc_id",
        "cluster_id",
        F.when(F.col("doc_id") < 400, "corpus")
        .otherwise("new")
        .alias("status"),
    ).orderBy("doc_id")


def _e12_state(spark, sf_dir, tag):
    """Digest + cluster + SIGNATURE ParquetStateTables scoped per
    (process, sf_dir, flagship): repeated calls in one driver fold into
    ONE state — and must be idempotent on re-fold. The signature table
    is what makes the per-ingest cost genuinely batch-sized: prior
    nights' TEXT is never re-read or re-shingled, the fold screens
    against the stored (shingles, signature) relation."""
    import os

    from mcyj_datapipeline_spark.streaming.dedup_fold import (
        open_dedup_state,
    )

    root = session_scratch(
        f"{tag}_state_{os.path.basename(sf_dir.rstrip('/'))}"
    )
    # one constructor for batch flagships AND the streaming twin, so
    # the "stream and batch run the same state" invariant can't split
    return open_dedup_state(spark, root, num_buckets=8)


def _e12_bootstrap(spark, docs, digests, clusters, sigs, corpus_hi: int = 400):
    """Corpus state (cluster map + content digests + MinHash
    signatures), built once per process — the reference's initial
    full-pipeline run. Signatures are computed here, exactly once per
    doc; every later fold reads them from state."""
    from mcyj_datapipeline_spark.operators.dedup import (
        connected_components,
        minhash_lsh_pairs,
        minhash_signatures,
    )

    if clusters.read() is not None:
        return
    corpus = docs.filter(F.col("doc_id") < corpus_hi).select(
        "doc_id", "text"
    )
    corpus_cc = connected_components(
        minhash_lsh_pairs(corpus, jaccard_threshold=0.8),
        "id_a",
        "id_b",
    ).withColumnRenamed("cluster_id", "_cl")
    corpus_map = (
        corpus.select("doc_id")
        .join(corpus_cc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("_cl"), F.col("doc_id")).alias("cluster_id"),
        )
    )
    clusters.write_initial(corpus_map)
    digests.write_initial(
        corpus.select(
            F.sha2(F.col("text"), 256).alias("content_sha"), "doc_id"
        )
        .groupBy("content_sha")
        .agg(F.min("doc_id").alias("owner_id"))
    )
    sigs.write_initial(minhash_signatures(corpus))


def _e12_fold_night(docs, lo, hi, digests, clusters, sigs):
    """ONE nightly fold of batch = doc_id in [lo, hi) into the
    persistent state; returns the committed cluster map. The prior-
    ingested side is defined BY THE STATE — the saved signature table,
    never a doc_id predicate or a re-read of prior text — so a sequence
    of folds screens night N against corpus + nights < N exactly as the
    reference's forever-loop does (run_full_pipeline.py:202-431), at
    batch-sized cost: only this batch is sketched fresh.

    Since r9 this delegates to the SHARED fold body
    (:func:`streaming.dedup_fold.fold_dedup_batch`) that the streaming
    twin's ``foreachBatch`` also runs — so the E12/E12b DuckDB oracles
    pin the exact code the stream executes. The only difference from
    the pre-r9 inline body: batch exclusion by anti-join on the
    batch's id set instead of the [lo, hi) predicate (equivalent:
    owners and signatures in state only ever come from docs), and no
    broadcast hint on the corpus-sized digest screen (AQE broadcasts
    while small; a hint would pin a 100 TB state table to broadcast).
    """
    from mcyj_datapipeline_spark.streaming.dedup_fold import (
        fold_dedup_batch,
    )

    def in_range(col):
        rng = F.col(col) >= lo
        return rng if hi is None else rng & (F.col(col) < hi)

    batch = docs.filter(in_range("doc_id")).select("doc_id", "text")
    return fold_dedup_batch(batch, digests, clusters, sigs, 0.8)


def _e12b_oracle_sql() -> str:
    # From-scratch twin of the TWO-night sequence. Ingestion is
    # order-dependent: night-1 docs (400-449) screen against corpus
    # shas; night-2 docs (450+) screen against every doc before 450 —
    # equivalent to "previously INGESTED" because a dropped night-1
    # doc's sha is by definition also a corpus sha. Clustering is
    # recursive-CTE CC over the MinHash pairs of exactly the final
    # ingested relation: fold-equals-from-scratch holds transitively
    # (each night's star edges preserve prior connectivity; the
    # cross/intra pairs are the full pair set restricted to new nodes).
    pairs = _minhash_oracle_sql("(SELECT doc_id, text FROM ingested)")
    return f"""
    WITH RECURSIVE ingested AS (
      SELECT doc_id, text,
             CASE WHEN doc_id < 400 THEN 'corpus'
                  WHEN doc_id < 450 THEN 'night1'
                  ELSE 'night2' END AS status
      FROM documents
      WHERE doc_id < 400
         OR (doc_id < 450 AND sha256(text) NOT IN
             (SELECT sha256(text) FROM documents WHERE doc_id < 400))
         OR (doc_id >= 450 AND sha256(text) NOT IN
             (SELECT sha256(text) FROM documents WHERE doc_id < 450))
    ), pairs AS (
      SELECT id_a, id_b FROM ({pairs})
    ), und AS (
      SELECT id_a AS u, id_b AS v FROM pairs
      UNION
      SELECT id_b, id_a FROM pairs
    ), walk(node, comp) AS (
      SELECT u, u FROM und
      UNION
      SELECT und.v, walk.comp FROM walk JOIN und ON und.u = walk.node
    ), cl AS (
      SELECT node, min(comp) AS cluster_id FROM walk GROUP BY node
    )
    SELECT d.doc_id, coalesce(cl.cluster_id, d.doc_id) AS cluster_id,
           d.status
    FROM ingested d LEFT JOIN cl ON cl.node = d.doc_id
    ORDER BY d.doc_id
    """


@register(
    "e12b_two_night_fold",
    _e12b_oracle_sql(),
    "E12b: TWO successive nightly folds (doc_id 400-449, then 450+) "
    "mutating the same persistent state in order — the reference's "
    "real forever-loop contract (run_full_pipeline.py:202-431), where "
    "a single-fold oracle can't see state-evolution bugs (stale star "
    "edges, digest owner drift, night-2 pairs against night-1 docs). "
    "Night 2's screens run against corpus + night 1 AS RECORDED IN "
    "STATE, never a doc_id predicate; the oracle is from-scratch "
    "clustering of the order-dependent final ingested set.",
)
def e12b_two_night_fold(spark, sf_dir):
    state = _e12_state(spark, sf_dir, "e12b")
    docs = _t(spark, sf_dir, "documents")
    _e12_bootstrap(spark, docs, *state)
    _e12_fold_night(docs, 400, 450, *state)
    committed = _e12_fold_night(docs, 450, None, *state)
    return committed.select(
        "doc_id",
        "cluster_id",
        F.when(F.col("doc_id") < 400, "corpus")
        .when(F.col("doc_id") < 450, "night1")
        .otherwise("night2")
        .alias("status"),
    ).orderBy("doc_id")


@register(
    "e12c_stream_dedup_fold",
    _e12b_oracle_sql(),
    "E12c: e12b's two-night fold as a REAL Structured-Streaming "
    "query — file source over a landing dir (one parquet per night, "
    "maxFilesPerTrigger=1 so each night is its own micro-batch), "
    "foreachBatch folding every batch into the persistent digest/"
    "cluster/signature ParquetStateTables through the SAME shared "
    "fold body the batch flagships run, Trigger.AvailableNow + "
    "checkpoint. The oracle is e12b's from-scratch DuckDB clustering "
    "verbatim: stream and batch must land the identical state. "
    "Crash-restart exactly-once (SIGKILL mid-fold, replay on the "
    "same checkpoint, state equals the clean fold) is proven by "
    "tests/test_stream_dedup_fold.py — the reference forever-loop's "
    "re-run idempotency contract (run_full_pipeline.py:202-431).",
)
def e12c_stream_dedup_fold(spark, sf_dir):
    import glob
    import os
    import time

    from mcyj_datapipeline_spark.streaming.dedup_fold import (
        open_dedup_state,
        stream_dedup_fold,
    )

    docs = _t(spark, sf_dir, "documents")
    root = session_scratch(
        f"e12c_{os.path.basename(sf_dir.rstrip('/'))}"
    )
    # landing files: one parquet per night, mtimes 10 s apart so the
    # file source's (modTime, path) order delivers night1 first —
    # ingestion order is semantic (night2 screens against night1's
    # committed state). Written once per process; re-calls re-use the
    # landing dir and the checkpoint makes the stream a no-op.
    # crash-safe bootstrap (ADVICE r9): the nights are staged into a
    # temp dir and os.rename'd into place as ONE atomic publish — a
    # crash mid-write leaves only the stage dir, never a partial
    # `landing` that a later call (guarded by isdir) would treat as
    # complete and fold fewer nights from.
    landing = os.path.join(root, "landing")
    if not os.path.isdir(landing):
        stage = landing + ".stage"
        if os.path.isdir(stage):
            import shutil

            shutil.rmtree(stage)
        os.makedirs(stage)
        now = time.time()
        for i, (lo, hi) in enumerate(((400, 450), (450, None))):
            cond = F.col("doc_id") >= lo
            if hi is not None:
                cond = cond & (F.col("doc_id") < hi)
            # batch-bounded staging (VERDICT r11 #3): the night is
            # written by an EXECUTOR task via df.write — no corpus
            # slice ever crosses the driver (the old toPandas() path
            # was the repo's one data-sized driver collect). One file
            # per night is the landing CONTRACT (a nightly drop is one
            # file, and night2 must sort after night1's mtime), so
            # coalesce(1) is layout, not a scale concession — a real
            # deployment's drops arrive pre-formed.
            tmp = os.path.join(stage, f"_night{i + 1}_build")
            docs.filter(cond).select("doc_id", "text").coalesce(
                1
            ).write.parquet(tmp)
            (part,) = glob.glob(os.path.join(tmp, "part-*.parquet"))
            path = os.path.join(stage, f"night{i + 1}.parquet")
            os.replace(part, path)
            import shutil

            shutil.rmtree(tmp)
            t = now - 20 + 10 * i
            os.utime(path, (t, t))
        os.rename(stage, landing)
    state_root = os.path.join(root, "state")
    state = open_dedup_state(spark, state_root, num_buckets=8)
    _e12_bootstrap(spark, docs, *state)
    stream_dedup_fold(
        spark,
        landing,
        state_root,
        os.path.join(root, "ckpt"),
        num_buckets=8,
    )
    committed = state[1].read()
    return committed.select(
        "doc_id",
        "cluster_id",
        F.when(F.col("doc_id") < 400, "corpus")
        .when(F.col("doc_id") < 450, "night1")
        .otherwise("night2")
        .alias("status"),
    ).orderBy("doc_id")


# ===========================================================================
# BM25 ranked retrieval — the lexical-search workhorse of training-data
# curation (query-based corpus filtering, hard-negative mining, RAG
# retrieval baselines). Okapi BM25 with k1=1.2, b=0.75.
# ===========================================================================

_BM25_TERMS = ("hash", "join", "vector")
_BM25_K1, _BM25_B = 1.2, 0.75


def _bm25_oracle_sql() -> str:
    terms = ", ".join(f"'{t}'" for t in _BM25_TERMS)
    return f"""
    WITH toks AS (
      SELECT doc_id, unnest(list_filter(string_split_regex(text, '\\s+'),
                                        t -> t <> '')) AS term
      FROM documents
    ), dl AS (
      SELECT d.doc_id, count(t.term) AS dl
      FROM documents d LEFT JOIN toks t ON t.doc_id = d.doc_id
      GROUP BY d.doc_id
    ), stats AS (
      SELECT count(*)::DOUBLE AS n, avg(dl)::DOUBLE AS avgdl FROM dl
    ), tf AS (
      SELECT doc_id, term, count(*)::DOUBLE AS tf FROM toks
      WHERE term IN ({terms}) GROUP BY 1, 2
    ), df AS (
      SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1
    ), scored AS (
      SELECT tf.doc_id,
             sum( ln(1.0 + (s.n - df.df + 0.5) / (df.df + 0.5))
                  * tf.tf * ({_BM25_K1} + 1.0)
                  / (tf.tf + {_BM25_K1} * (1.0 - {_BM25_B}
                     + {_BM25_B} * dl.dl / s.avgdl)) ) AS score
      FROM tf JOIN df USING (term)
              JOIN dl USING (doc_id)
              CROSS JOIN stats s
      GROUP BY tf.doc_id
    )
    SELECT doc_id, round(score, 6) AS score
    FROM scored
    ORDER BY round(score, 6) DESC, doc_id
    LIMIT 10
    """


def _bm25_scores(docs):
    """BM25 per-doc scores for the fixed query terms — shared by the
    ranked-retrieval query and the RRF hybrid below."""
    from mcyj_datapipeline_spark.operators import text_analysis as TA

    toks = docs.select(
        "doc_id", F.explode(TA.tokens(F.col("text"))).alias("term")
    )
    # doc length is size(tokens) — a pure projection over the scan, no
    # second explode/groupBy pass over the corpus
    dl = docs.select(
        "doc_id",
        F.size(TA.tokens(F.col("text"))).cast("double").alias("dl"),
    )
    stats = dl.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg("dl").alias("avgdl"),
    )
    tf = (
        toks.filter(F.col("term").isin(*_BM25_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    df_ = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("double").alias("df")
    )
    k1, b = _BM25_K1, _BM25_B
    contrib = (
        tf.join(F.broadcast(df_), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            (
                F.log(
                    F.lit(1.0)
                    + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5)
                )
                * F.col("tf")
                * (k1 + 1.0)
                / (
                    F.col("tf")
                    + k1
                    * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
                )
            ).alias("part"),
        )
    )
    return contrib.groupBy("doc_id").agg(
        F.round(F.sum("part"), 6).alias("score")
    )


@register(
    "text_bm25_topk",
    _bm25_oracle_sql(),
    "BM25 ranked retrieval (Okapi k1=1.2 b=0.75) for a fixed 3-term "
    "query over the corpus: tf and doc-length from one tokenize pass, "
    "document frequency over the query terms only (a 3-row broadcast), "
    "corpus stats (N, avgdl) as a broadcast one-row aggregate — the "
    "whole plan is two shuffles (doc-term tf, per-doc sum) regardless "
    "of corpus size, and the tf relation is pre-filtered to the query "
    "terms so the score join moves |q| rows per doc, not the "
    "vocabulary. Scores rounded to 6dp for the cross-engine compare "
    "(sum-order float noise ~1e-15); ties broken by doc_id.",
)
def text_bm25_topk(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    scored = _bm25_scores(docs)
    # orderBy().limit() plans as TakeOrderedAndProject (per-partition
    # top-k + driver merge of 10-row heads) — never a global sort, and
    # no rank column so no window at all
    return scored.select("doc_id", "score").orderBy(
        F.desc("score"), F.asc("doc_id")
    ).limit(10)


# ===========================================================================
# Vocabulary coverage / OOV rate — the tokenizer-fit signal every
# pretraining-corpus curation loop tracks (a rising OOV rate against a
# frozen vocabulary means the incoming data drifted away from what the
# tokenizer was fit on).
# ===========================================================================

_VOCAB_SIZE = 10


@register(
    "text_vocab_oov_rate",
    f"""
    WITH toks AS (
      SELECT doc_id, lang,
             unnest(list_filter(string_split_regex(text, '\\s+'),
                                t -> t <> '')) AS term
      FROM documents
    ), vocab AS (
      SELECT term FROM (
        SELECT term, count(*) AS c FROM toks GROUP BY term
        ORDER BY c DESC, term LIMIT {_VOCAB_SIZE}
      )
    ), per_doc AS (
      SELECT t.doc_id, t.lang,
             count(*) AS n_tok,
             sum(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS n_oov
      FROM toks t LEFT JOIN vocab v ON v.term = t.term
      GROUP BY t.doc_id, t.lang
    )
    SELECT lang,
           count(*) AS n_docs,
           sum(n_tok)::BIGINT AS n_tokens,
           sum(n_oov)::BIGINT AS n_oov,
           round(sum(n_oov)::DOUBLE / sum(n_tok), 6) AS oov_rate,
           round(avg(n_oov::DOUBLE / n_tok), 6) AS avg_doc_oov_rate
    FROM per_doc GROUP BY lang ORDER BY lang
    """,
    f"Vocabulary coverage: fit a tiny top-{_VOCAB_SIZE} frequency vocabulary "
    "over the corpus (deterministic count-desc/term tiebreak), then "
    "per-language OOV statistics — corpus OOV rate and mean per-doc "
    "OOV rate. Plan: one tokenize pass feeds both the vocabulary "
    "aggregate (TakeOrdered, broadcast back) and the per-doc "
    "left-anti-style coverage join; the vocab side is always tiny so "
    "the join never shuffles the token stream twice. The frozen-vocab "
    "variant at 100 TB broadcasts a persisted vocab table instead of "
    "refitting.",
)
def text_vocab_oov_rate(spark, sf_dir):
    from mcyj_datapipeline_spark.operators import text_analysis as TA

    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "lang", F.explode(TA.tokens(F.col("text"))).alias("term")
    )
    vocab = (
        toks.groupBy("term")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("term"))
        .limit(_VOCAB_SIZE)
        .select("term", F.lit(1).alias("_in_vocab"))
    )
    per_doc = (
        toks.join(F.broadcast(vocab), "term", "left")
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_tok"),
            F.sum(
                F.when(F.col("_in_vocab").isNull(), 1).otherwise(0)
            ).alias("n_oov"),
        )
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
            F.sum("n_oov").alias("n_oov"),
            F.round(
                F.sum("n_oov").cast("double") / F.sum("n_tok"), 6
            ).alias("oov_rate"),
            F.round(
                F.avg(F.col("n_oov").cast("double") / F.col("n_tok")), 6
            ).alias("avg_doc_oov_rate"),
        )
        .orderBy("lang")
    )


# ===========================================================================
# Exact-substring duplicate spans (Lee et al. 2022 shape, n-gram
# relaxation) — span-level dedup signal document digests can't see
# ===========================================================================

_SPAN_N = 5


def _repeated_span_oracle_sql() -> str:
    return f"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '\\s+'),
                         t -> t <> '') AS w
      FROM documents
    ), grams AS (
      SELECT doc_id, i.i AS pos,
             array_to_string(w[i.i:i.i + {_SPAN_N} - 1], ' ') AS gram
      FROM toks,
           LATERAL (SELECT unnest(generate_series(
                    1, greatest(len(w) - {_SPAN_N} + 1, 0))) AS i) i
    ), dup AS (
      SELECT gram FROM grams
      GROUP BY gram HAVING count(DISTINCT doc_id) >= 2
    ), dpos AS (
      SELECT doc_id, pos FROM grams SEMI JOIN dup USING (gram)
    ), runs AS (
      SELECT doc_id, pos,
             CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id
                                            ORDER BY pos) <= {_SPAN_N}
                  THEN 0 ELSE 1 END AS brk
      FROM dpos
    ), sp AS (
      SELECT doc_id, pos,
             sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS sid
      FROM runs
    )
    SELECT doc_id, min(pos) AS span_start,
           max(pos) + {_SPAN_N} - 1 AS span_end,
           count(*) AS n_dup_grams
    FROM sp GROUP BY doc_id, sid
    ORDER BY doc_id, span_start
    """


@register(
    "dedup_repeated_ngram_spans",
    _repeated_span_oracle_sql(),
    "Exact-substring duplicate spans: per-document merged word ranges "
    "covered by 5-grams occurring in >=2 distinct documents — the "
    "span-level signal whole-doc digests miss (boilerplate pasted "
    "into otherwise-unique pages). Positional n-grams from one "
    "transform+posexplode, gram frequency in ONE groupBy, semi-join "
    "back, per-doc window merges touching ranges: two gram shuffles "
    "plus one doc shuffle, no self-join. hash_first=True narrows the "
    "frequency shuffle to 8-byte gram hashes (exact-string confirm) "
    "for network-bound clusters — opt-in since r9: A/B-measured "
    "slower at both sf0.1 and sf1 where shuffle is intra-host memcpy.",
)
def dedup_repeated_ngram_spans(spark, sf_dir):
    from mcyj_datapipeline_spark.operators.dedup import (
        repeated_ngram_spans,
    )

    docs = _t(spark, sf_dir, "documents")
    return repeated_ngram_spans(docs, n=_SPAN_N).orderBy(
        "doc_id", "span_start"
    )


# ===========================================================================
# Hybrid retrieval: reciprocal-rank fusion of BM25 and TF-IDF-cosine
# rankings — the standard two-system fusion (lexical + second scorer;
# in production the second list comes from the ANN index, same shape)
# ===========================================================================

_RRF_K0 = 60
_RRF_POOL = 20


def _rrf_oracle_sql() -> str:
    terms = ", ".join(f"'{t}'" for t in _BM25_TERMS)
    return f"""
    WITH toks AS (
      SELECT doc_id, unnest(list_filter(string_split_regex(text, '\\s+'),
                                        t -> t <> '')) AS term
      FROM documents
    ), tf_all AS (
      SELECT doc_id, term, count(*)::DOUBLE AS tf FROM toks GROUP BY 1, 2
    ), df_all AS (
      SELECT term, count(*)::DOUBLE AS df FROM tf_all GROUP BY 1
    ), dl AS (
      SELECT d.doc_id, count(t.term)::DOUBLE AS dl
      FROM documents d LEFT JOIN toks t ON t.doc_id = d.doc_id
      GROUP BY d.doc_id
    ), stats AS (
      SELECT count(*)::DOUBLE AS n, avg(dl)::DOUBLE AS avgdl FROM dl
    ), tfq AS (
      SELECT doc_id, term, tf FROM tf_all WHERE term IN ({terms})
    ), dfq AS (
      SELECT term, count(*)::DOUBLE AS df FROM tfq GROUP BY 1
    ), bm25 AS (
      SELECT tfq.doc_id,
             round(sum( ln(1.0 + (s.n - dfq.df + 0.5) / (dfq.df + 0.5))
                  * tfq.tf * ({_BM25_K1} + 1.0)
                  / (tfq.tf + {_BM25_K1} * (1.0 - {_BM25_B}
                     + {_BM25_B} * dl.dl / s.avgdl)) ), 6) AS score
      FROM tfq JOIN dfq USING (term)
               JOIN dl USING (doc_id)
               CROSS JOIN stats s
      GROUP BY tfq.doc_id
    ), bm25_rank AS (
      SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id)
               AS bm25_rank
      FROM bm25 QUALIFY bm25_rank <= {_RRF_POOL}
    ), norms AS (
      SELECT t.doc_id,
             sqrt(sum(pow(t.tf * ln(1.0 + s.n / d.df), 2))) AS nrm
      FROM tf_all t JOIN df_all d USING (term) CROSS JOIN stats s
      GROUP BY t.doc_id
    ), cos AS (
      SELECT t.doc_id,
             round(sum(t.tf * ln(1.0 + s.n / d.df) * ln(1.0 + s.n / d.df))
                   / (any_value(nm.nrm) *
                      (SELECT sqrt(sum(pow(ln(1.0 + s2.n / d2.df), 2)))
                       FROM dfq qd JOIN df_all d2 USING (term)
                            CROSS JOIN stats s2)), 6) AS score
      FROM tfq t JOIN df_all d USING (term)
                 JOIN norms nm ON nm.doc_id = t.doc_id
                 CROSS JOIN stats s
      GROUP BY t.doc_id
    ), cos_rank AS (
      SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id)
               AS tfidf_rank
      FROM cos QUALIFY tfidf_rank <= {_RRF_POOL}
    )
    SELECT coalesce(b.doc_id, c.doc_id) AS doc_id,
           round(coalesce(1.0 / ({_RRF_K0} + b.bm25_rank), 0)
                 + coalesce(1.0 / ({_RRF_K0} + c.tfidf_rank), 0), 6)
             AS rrf_score,
           b.bm25_rank, c.tfidf_rank
    FROM bm25_rank b FULL OUTER JOIN cos_rank c USING (doc_id)
    ORDER BY rrf_score DESC, doc_id LIMIT 10
    """


def _rank_top_pool(scored, rank_name):
    """Top-``_RRF_POOL`` rows of a (doc_id, score) frame with dense
    1-based ranks — WITHOUT a global window (rank-over-the-corpus is
    the one-reducer sort the registry-wide plan gate bans). The
    orderBy().limit() plans as TakeOrderedAndProject (per-partition
    top-k, driver merge of pool-sized heads); ranks then come from a
    pool x pool self-join count of strictly-preceding rows — constant
    work (20x20) regardless of corpus size, broadcast both sides.
    Deterministic because scores are rounded before ranking and ties
    break on doc_id."""
    top = scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(_RRF_POOL)
    a = top.select(
        F.col("doc_id").alias("_ad"), F.col("score").alias("_as")
    )
    b = top.select(
        F.col("doc_id").alias("_bd"), F.col("score").alias("_bs")
    )
    before = (F.col("_bs") > F.col("_as")) | (
        (F.col("_bs") == F.col("_as")) & (F.col("_bd") < F.col("_ad"))
    )
    return (
        a.join(F.broadcast(b), before, "left")
        .groupBy(F.col("_ad").alias("doc_id"))
        .agg((F.count("_bd") + 1).cast("int").alias(rank_name))
    )


@register(
    "text_hybrid_rrf_topk",
    _rrf_oracle_sql(),
    "Hybrid retrieval via reciprocal-rank fusion (k0=60): BM25 and "
    "TF-IDF-cosine each rank the corpus for the same fixed query, the "
    "two top-20 lists full-outer-join on doc_id, and each doc scores "
    "sum(1/(k0+rank)) over the lists it appears in — rank-space "
    "fusion, so the two systems' incomparable score scales never mix. "
    "Both scores round to 6dp BEFORE ranking with a doc_id tiebreak, "
    "making ranks (and hence the fused order) engine-exact. One "
    "tokenize feeds both scorers; the fusion join touches 2x20 rows "
    "regardless of corpus size. In production the second list is the "
    "ANN index's — same fusion shape.",
)
def text_hybrid_rrf_topk(spark, sf_dir):
    from mcyj_datapipeline_spark.operators import text_analysis as TA

    docs = _t(spark, sf_dir, "documents")

    # system 1: BM25 (shared scorer), top-20 ranks
    bm25 = _rank_top_pool(_bm25_scores(docs), "bm25_rank")

    # system 2: TF-IDF cosine of the query against each doc
    toks = docs.select(
        "doc_id", F.explode(TA.tokens(F.col("text"))).alias("term")
    )
    tf_all = toks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("double").alias("tf")
    )
    df_all = tf_all.groupBy("term").agg(
        F.count(F.lit(1)).cast("double").alias("df")
    )
    n_docs = docs.agg(F.count(F.lit(1)).cast("double").alias("n"))
    idf = F.log(F.lit(1.0) + F.col("n") / F.col("df"))
    weighted = tf_all.join(df_all, "term").crossJoin(
        F.broadcast(n_docs)
    ).select("doc_id", "term", (F.col("tf") * idf).alias("w"), idf.alias("idf"))
    norms = weighted.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm")
    )
    qnorm = (
        weighted.filter(F.col("term").isin(*_BM25_TERMS))
        .select("term", "idf")
        .distinct()
        .agg(F.sqrt(F.sum(F.col("idf") * F.col("idf"))).alias("qn"))
    )
    cos = _rank_top_pool(
        weighted.filter(F.col("term").isin(*_BM25_TERMS))
        .groupBy("doc_id")
        .agg(F.sum(F.col("w") * F.col("idf")).alias("dot"))
        .join(norms, "doc_id")
        .crossJoin(F.broadcast(qnorm))
        .select(
            "doc_id",
            F.round(F.col("dot") / (F.col("nrm") * F.col("qn")), 6).alias(
                "score"
            ),
        ),
        "tfidf_rank",
    )

    # rank-space fusion over the two tiny lists
    fused = bm25.join(cos, "doc_id", "full_outer").select(
        "doc_id",
        F.round(
            F.coalesce(
                F.lit(1.0) / (_RRF_K0 + F.col("bm25_rank")), F.lit(0.0)
            )
            + F.coalesce(
                F.lit(1.0) / (_RRF_K0 + F.col("tfidf_rank")), F.lit(0.0)
            ),
            6,
        ).alias("rrf_score"),
        "bm25_rank",
        "tfidf_rank",
    )
    return fused.orderBy(F.desc("rrf_score"), F.asc("doc_id")).limit(10)


# ===========================================================================
# E13 flagship: span-level dedup REWRITE — cut corpus-repeated n-gram
# spans everywhere except their owner document (Lee et al. 2022's
# keep-one-occurrence policy), rebuilding the cleaned corpus
# ===========================================================================


def _span_cut_oracle_sql() -> str:
    return f"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '\\s+'),
                         t -> t <> '') AS w
      FROM documents
    ), grams AS (
      SELECT doc_id, i.i AS pos,
             array_to_string(w[i.i:i.i + {_SPAN_N} - 1], ' ') AS gram
      FROM toks,
           LATERAL (SELECT unnest(generate_series(
                    1, greatest(len(w) - {_SPAN_N} + 1, 0))) AS i) i
    ), owners AS (
      SELECT gram, min(doc_id) AS owner FROM grams
      GROUP BY gram HAVING count(DISTINCT doc_id) >= 2
    ), cut AS (
      SELECT DISTINCT g.doc_id, x.widx
      FROM grams g JOIN owners o USING (gram),
           LATERAL (SELECT unnest(generate_series(
                    g.pos, g.pos + {_SPAN_N} - 1)) AS widx) x
      WHERE g.doc_id <> o.owner
    ), words AS (
      SELECT doc_id, j.j AS widx, w[j.j] AS word
      FROM toks,
           LATERAL (SELECT unnest(generate_series(1, len(w))) AS j) j
    ), kept AS (
      SELECT wd.doc_id, wd.widx, wd.word
      FROM words wd ANTI JOIN cut c
        ON c.doc_id = wd.doc_id AND c.widx = wd.widx
    ), rebuilt AS (
      SELECT doc_id, count(*) AS n_words_after,
             string_agg(word, ' ' ORDER BY widx) AS clean_text
      FROM kept GROUP BY doc_id
    )
    SELECT t.doc_id, len(t.w) AS n_words_before,
           coalesce(r.n_words_after, 0) AS n_words_after,
           coalesce(r.clean_text, '') AS clean_text
    FROM toks t LEFT JOIN rebuilt r USING (doc_id)
    ORDER BY t.doc_id
    """


@register(
    "e13_span_dedup_rewrite",
    _span_cut_oracle_sql(),
    "E13 flagship: span-level dedup rewrite — every word covered by a "
    "corpus-repeated 5-gram is cut from all documents except the "
    "gram's owner (min doc id), keeping repeated boilerplate in "
    "exactly one place; full cleaned corpus rebuilt with before/after "
    "word counts. Plan: positional grams via one transform+posexplode, "
    "the cross-doc frequency pass as ONE string-keyed groupBy (the "
    "hash_first=True 8-byte variant with exact-string confirm exists "
    "for network-bound clusters but A/B-measured SLOWER on this rig "
    "at both sf0.1 and sf1 — r9 reverted the r8 default); then one "
    "anti-join of the word stream against the cut set and an order-"
    "preserving grouped reassembly (sort_array over each doc's own "
    "(idx, word) structs — never a global sort).",
)
def e13_span_dedup_rewrite(spark, sf_dir):
    from mcyj_datapipeline_spark.operators.dedup import (
        cut_repeated_ngram_spans,
    )

    docs = _t(spark, sf_dir, "documents")
    return cut_repeated_ngram_spans(docs, n=_SPAN_N).orderBy("doc_id")


# ===========================================================================
# Prefix-filtered exact Jaccard join (AllPairs/PPJoin family) — the
# EXACT set-similarity join; oracle is the brute shared-shingle join
# ===========================================================================


@register(
    "dedup_prefix_filter_jaccard",
    # Same oracle as dedup_ngram_jaccard_pairs: prefix filtering is a
    # candidate-pruning strategy with recall 1.0 by theorem, so the
    # output must EQUAL the brute-force shared-shingle join's.
    """
    WITH sh AS (
      SELECT doc_id,
             list_distinct([array_to_string(w[i:i+2], ' ')
                            for i in range(1, len(w) - 1)]) AS sh
      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
      WHERE len(w) >= 3
    ), inv AS (
      SELECT doc_id, unnest(sh) AS shingle FROM sh
    ), shared AS (
      SELECT x.doc_id AS id_a, y.doc_id AS id_b, count(*) AS shared
      FROM inv x JOIN inv y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
      GROUP BY 1, 2
    )
    SELECT s.id_a, s.id_b,
           round(s.shared::DOUBLE / (len(a.sh) + len(b.sh) - s.shared), 6) AS jaccard
    FROM shared s JOIN sh a ON s.id_a = a.doc_id JOIN sh b ON s.id_b = b.doc_id
    WHERE s.shared::DOUBLE / (len(a.sh) + len(b.sh) - s.shared) >= 0.5
    """,
    "EXACT Jaccard pairs via prefix filtering (AllPairs/PPJoin): each "
    "doc indexes only its |r|-ceil(t|r|)+1 globally-rarest shingles "
    "(df-asc canonical order, sorted per-doc with sort_array — no "
    "vocabulary-wide window), candidates self-join on prefix shingles "
    "and pass the PPJoin length + positional prunes (r10, both exact "
    "by theorem: 409k -> 125k candidates at sf0.1 for 256 true "
    "pairs), then exact array_intersect verification off ONE "
    "persisted canonical-token relation (the r9 two-persist shape "
    "spent more time writing caches than the query now takes: 3.25 "
    "-> 2.05 s at sf0.1, 24.6 -> ~5.4 s normalized at sf1). Recall "
    "1.0 by theorem on string identity (default hash_keys=False — "
    "ratified r10 by bench-regime A/B, strings 1.7-1.9x faster "
    "single-host; the 8-byte xxhash64 candidate pipeline remains "
    "opt-in for network-bound clusters, recall exact up to 64-bit "
    "collisions there). The oracle is the brute shared-shingle join "
    "verbatim. The exact counterpart to LSH at scale: boilerplate "
    "shingles live in suffixes and never reach the self-join, "
    "attacking the same fan-out ngram_jaccard's max_shingle_docs "
    "valve caps lossily.",
)
def dedup_prefix_filter_jaccard(spark, sf_dir):
    from mcyj_datapipeline_spark.operators.dedup import (
        prefix_filter_jaccard_pairs,
    )

    return prefix_filter_jaccard_pairs(
        _t(spark, sf_dir, "documents"), threshold=0.5
    )


# ===========================================================================
# E14 flagship: corpus datasheet — the per-language release report
# (docs/tokens/vocab, exact-dup share, quality quartiles) every
# dataset card needs, as ONE declarative pass
# ===========================================================================


def _datasheet_oracle_sql() -> str:
    from mcyj_datapipeline_spark.registry_batch3 import _E4_QUALITY_SQL

    return f"""
    WITH scored AS ({_E4_QUALITY_SQL}),
    toks AS (
      SELECT doc_id, lang,
             unnest(list_filter(string_split_regex(text, '\\s+'),
                                t -> t <> '')) AS term
      FROM documents
    ), tok_stats AS (
      SELECT lang, count(*) AS n_tokens,
             count(DISTINCT term) AS n_distinct_terms
      FROM toks GROUP BY lang
    ), owners AS (
      SELECT sha256(text) AS sha, min(doc_id) AS owner
      FROM documents GROUP BY 1
    ), flags AS (
      SELECT d.lang, d.doc_id, length(d.text) AS n_chars,
             CASE WHEN o.owner <> d.doc_id THEN 1 ELSE 0 END AS is_dup,
             s.quality
      FROM documents d
      JOIN owners o ON o.sha = sha256(d.text)
      JOIN scored s ON s.doc_id = d.doc_id
    )
    SELECT f.lang,
           count(*) AS n_docs,
           t.n_tokens, t.n_distinct_terms,
           sum(f.n_chars)::BIGINT AS n_chars,
           sum(f.is_dup)::BIGINT AS n_exact_dups,
           round(sum(f.is_dup)::DOUBLE / count(*), 6) AS dup_rate,
           round(quantile_cont(f.quality, 0.25), 4) AS quality_p25,
           round(quantile_cont(f.quality, 0.50), 4) AS quality_p50,
           round(quantile_cont(f.quality, 0.75), 4) AS quality_p75
    FROM flags f JOIN tok_stats t USING (lang)
    GROUP BY f.lang, t.n_tokens, t.n_distinct_terms
    ORDER BY f.lang
    """


@register(
    "e14_corpus_datasheet",
    _datasheet_oracle_sql(),
    "E14 flagship: the corpus datasheet — per-language doc/token/"
    "distinct-term/char counts, exact-duplicate share (sha owner != "
    "self), and quality quartiles (exact interpolated percentile, "
    "both engines linear-interpolate identically on 6dp-rounded "
    "scores) — the release report every dataset card carries. One "
    "tokenize pass feeds token and vocab stats; the dup flag is a "
    "digest-only groupBy joined back; quality is a pure column "
    "expression; everything meets in a per-lang aggregate (tiny "
    "grouping key set).",
)
def e14_corpus_datasheet(spark, sf_dir):
    from mcyj_datapipeline_spark.operators import text_analysis as TA

    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "lang", F.explode(TA.tokens(F.col("text"))).alias("term")
    )
    tok_stats = toks.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.countDistinct("term").alias("n_distinct_terms"),
    )
    owners = docs.groupBy(F.sha2("text", 256).alias("_sha")).agg(
        F.min("doc_id").alias("_owner")
    )
    flags = (
        docs.select(
            "lang",
            "doc_id",
            F.length("text").alias("n_chars"),
            F.sha2("text", 256).alias("_sha"),
            TA.quality_score(F.col("text")).alias("quality"),
        )
        .join(owners, "_sha")
        .withColumn(
            "is_dup",
            F.when(F.col("_owner") != F.col("doc_id"), 1).otherwise(0),
        )
    )
    per_lang = flags.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("n_chars"),
        F.sum("is_dup").alias("n_exact_dups"),
        F.round(
            F.sum("is_dup").cast("double") / F.count(F.lit(1)), 6
        ).alias("dup_rate"),
        F.round(F.expr("percentile(quality, 0.25)"), 4).alias(
            "quality_p25"
        ),
        F.round(F.expr("percentile(quality, 0.50)"), 4).alias(
            "quality_p50"
        ),
        F.round(F.expr("percentile(quality, 0.75)"), 4).alias(
            "quality_p75"
        ),
    )
    return (
        per_lang.join(tok_stats, "lang")
        .select(
            "lang",
            "n_docs",
            "n_tokens",
            "n_distinct_terms",
            "n_chars",
            "n_exact_dups",
            "dup_rate",
            "quality_p25",
            "quality_p50",
            "quality_p75",
        )
        .orderBy("lang")
    )


# ===========================================================================
# Perceptual image dedup: dHash + banded hamming near-pair join
# ===========================================================================


def _dhash_oracle_sql() -> str:
    from mcyj_datapipeline_spark.registry_batch3 import _MM_BLOB_SQL

    # closed-form twin of the fake grid decoder + dHash bit rule:
    # grid[i] = (L*7 + i*13) % 251 over flat index i = r*9 + c, bit
    # r*8+c set iff grid[r*9+c+1] > grid[r*9+c]; signed-int64 wrap
    # mirrors Spark's LongType.
    cell = (
        "((L + seed*31) * ({j}*{j} + 3*{j} + 7)) % 251"
    )
    j1 = "((i//8)*9 + (i%8))"
    j2 = "((i//8)*9 + (i%8) + 1)"
    bit = (
        f"CASE WHEN {cell.format(j=j2)} > {cell.format(j=j1)} "
        "THEN (1::HUGEINT << i) ELSE 0::HUGEINT END"
    )
    return f"""
    WITH blobs AS ({_MM_BLOB_SQL}),
    sums AS (
      SELECT media_id,
             list_sum([{bit} for i in range(0, 64)]) AS s
      FROM (SELECT media_id, octet_length(content) AS L,
                   CASE WHEN media_id % 100 < 2
                        THEN media_id - (media_id % 100)
                        ELSE media_id END AS seed
            FROM blobs)
    ),
    hashes AS (
      SELECT media_id,
             (CASE WHEN s >= (1::HUGEINT << 63)
                   THEN s - (1::HUGEINT << 64) ELSE s END)::BIGINT AS dhash
      FROM sums
    )
    SELECT a.media_id AS id_a, b.media_id AS id_b,
           bit_count(xor(a.dhash, b.dhash)) AS hamming
    FROM hashes a JOIN hashes b ON a.media_id < b.media_id
    WHERE bit_count(xor(a.dhash, b.dhash)) <= 4
    ORDER BY id_a, id_b
    """


@register(
    "mm_image_dhash_near_dup",
    _dhash_oracle_sql(),
    "Perceptual image dedup: per-image 64-bit difference hash (dHash) "
    "via Arrow mapInPandas, then near-pairs at hamming <= 4 via "
    "pigeonhole banding — 5 bands of 12-13 bits, equi-join on (band, "
    "value), exact bit_count(xor) verification; the full cross join "
    "never exists. Grid decoder is the injectable seam (real stdlib "
    "PNG block-mean path unit-tested separately); the registered "
    "query pins the deterministic fake so the oracle re-derives the "
    "grid arithmetic closed-form — the mm_image_features convention.",
)
def mm_image_dhash_near_dup(spark, sf_dir):
    from mcyj_datapipeline_spark.operators.multimodal import (
        _fake_grid_decoder_id,
        dhash_near_pairs,
        image_dhash,
    )
    from mcyj_datapipeline_spark.registry_batch3 import _media_df

    hashes = image_dhash(
        _media_df(spark, sf_dir), grid_decoder=_fake_grid_decoder_id
    )
    return dhash_near_pairs(hashes, max_hamming=4).orderBy(
        "id_a", "id_b"
    )


# ===========================================================================
# Audio near-dup: frame-energy fingerprint + the same banded hamming join
# ===========================================================================


def _afp_oracle_sql() -> str:
    from mcyj_datapipeline_spark.registry_batch3 import _MM_BLOB_SQL

    # closed-form twin of the fake energy frames + sign-of-delta bits:
    # f(i) = (L*11 + i*17) % 257, bit i set iff f(i+1) > f(i).
    f = "((L + seed*29) * ({j}*{j} + 5*{j} + 11)) % 257"
    bit = (
        f"CASE WHEN {f.format(j='(i+1)')} > {f.format(j='i')} "
        "THEN (1::HUGEINT << i) ELSE 0::HUGEINT END"
    )
    return f"""
    WITH blobs AS ({_MM_BLOB_SQL}),
    sums AS (
      SELECT media_id,
             list_sum([{bit} for i in range(0, 64)]) AS s
      FROM (SELECT media_id, octet_length(content) AS L,
                   CASE WHEN media_id % 100 < 2
                        THEN media_id - (media_id % 100)
                        ELSE media_id END AS seed
            FROM blobs)
    ),
    hashes AS (
      SELECT media_id,
             (CASE WHEN s >= (1::HUGEINT << 63)
                   THEN s - (1::HUGEINT << 64) ELSE s END)::BIGINT AS afp
      FROM sums
    )
    SELECT a.media_id AS id_a, b.media_id AS id_b,
           bit_count(xor(a.afp, b.afp)) AS hamming
    FROM hashes a JOIN hashes b ON a.media_id < b.media_id
    WHERE bit_count(xor(a.afp, b.afp)) <= 4
    ORDER BY id_a, id_b
    """


@register(
    "mm_audio_fingerprint_near_dup",
    _afp_oracle_sql(),
    "Audio near-dup: per-clip 64-bit fingerprint (sign of frame-energy "
    "delta over 65 equal time blocks — loudness-invariant, the 1-D "
    "dHash analog) via Arrow mapInPandas, then hamming <= 4 pairs "
    "through the SAME pigeonhole-banded join as image dHash (the "
    "banding operator is hash-agnostic). Real stdlib PCM16 framing "
    "unit-tested separately; the registered query pins the "
    "deterministic fake with a closed-form oracle.",
)
def mm_audio_fingerprint_near_dup(spark, sf_dir):
    from mcyj_datapipeline_spark.operators.multimodal import (
        _fake_energy_frames_id,
        audio_fingerprint,
        dhash_near_pairs,
    )
    from mcyj_datapipeline_spark.registry_batch3 import _media_df

    fps = audio_fingerprint(
        _media_df(spark, sf_dir), frame_fn=_fake_energy_frames_id
    )
    return dhash_near_pairs(
        fps, max_hamming=4, hash_col="afp"
    ).orderBy("id_a", "id_b")


# ===========================================================================
# BPE tokenizer-training core: k rounds of count-pairs / merge-argmax
# (Sennrich et al. 2016), DuckDB twin as an unrolled-CTE chain
# ===========================================================================

_BPE_K = 3


def _bpe_blocks() -> tuple[list[str], list[str], str]:
    """The unrolled BPE-training CTE chain, shared by the merge-list
    oracle below and batch 15's encode oracle: returns (with-blocks,
    per-round merge selects, name of the final rewritten word table)."""
    blocks = [
        """
    words AS (
      SELECT w, count(*) AS cnt,
             trim(regexp_replace(w, '(.)', '\\1 ', 'g')) AS sym
      FROM (SELECT unnest(list_filter(string_split_regex(text, '\\s+'),
                                      t -> t <> '')) AS w
            FROM documents)
      GROUP BY w
    )"""
    ]
    prev = "words"
    selects = []
    for i in range(1, _BPE_K + 1):
        blocks.append(f"""
    p{i} AS (
      SELECT pair, sum(cnt) AS total FROM (
        SELECT cnt,
               unnest([s[j] || ' ' || s[j+1] for j in range(1, len(s))])
                 AS pair
        FROM (SELECT cnt, string_split(sym, ' ') AS s FROM {prev})
      ) GROUP BY pair
    ),
    t{i} AS (SELECT pair, total FROM p{i}
             ORDER BY total DESC, pair LIMIT 1),
    it{i} AS (
      SELECT w, cnt,
             trim(replace(' ' || sym || ' ',
                          ' ' || (SELECT pair FROM t{i}) || ' ',
                          ' ' || replace((SELECT pair FROM t{i}), ' ', '')
                              || ' ')) AS sym
      FROM {prev}
    )""")
        selects.append(
            f"SELECT {i} AS iteration, pair, replace(pair, ' ', '') AS "
            f"merged, total::BIGINT AS pair_count FROM t{i}"
        )
        prev = f"it{i}"
    return blocks, selects, prev


def _bpe_oracle_sql() -> str:
    blocks, selects, _final = _bpe_blocks()
    return (
        "WITH "
        + ",".join(blocks)
        + "\n    "
        + "\n    UNION ALL ".join(selects)
        + "\n    ORDER BY iteration"
    )


@register(
    "text_bpe_top_merges",
    _bpe_oracle_sql(),
    f"BPE tokenizer-training core: {_BPE_K} rounds of 'count adjacent "
    "symbol pairs weighted by word frequency, merge the argmax "
    "everywhere' (Sennrich et al. 2016). The corpus collapses to a "
    "distinct-word frequency table first (vocabulary-sized — the "
    "standard trick that makes BPE training tractable at corpus "
    "scale); each round is one pair-count groupBy plus a one-row "
    "argmax collect (bounded, k-means-style) and a literal symbol "
    "rewrite. DuckDB twin unrolls the rounds as a CTE chain with the "
    "identical padded-replace merge semantics.",
)
def text_bpe_top_merges(spark, sf_dir):
    from mcyj_datapipeline_spark.operators.text_analysis import (
        bpe_top_merges,
    )

    return bpe_top_merges(_t(spark, sf_dir, "documents"), k=_BPE_K)
