"""Streaming twin of the nightly dedup fold (E12/E12b).

The reference's forever-loop (``run_full_pipeline.py:202-431``) is
"wake up, take whatever landed since last run, screen it against
everything already ingested, commit, repeat" — and its correctness
hinges on RE-RUN IDEMPOTENCY: the loop crashes and restarts freely, so
processing the same batch twice must leave the same state as once.
The batch form of that contract is proven by the oracle-checked
``e12_nightly_dedup_fold`` / ``e12b_two_night_fold`` queries; this
module is the same fold as a real Structured-Streaming query:

    file source over a landing dir → ``foreachBatch(fold)`` against
    persistent :class:`ParquetStateTable` state, ``Trigger.AvailableNow``.

Why ``foreachBatch`` and not a stateful operator: the fold's state is
three KEYED RELATIONS (content digests, cluster map, MinHash
signatures) that the fold reads with joins and rewrites with keyed
merges — relational state, not per-key timers — and the fold itself is
a multi-join batch plan (banded LSH self/cross joins + connected
components). ``foreachBatch`` hands each micro-batch to exactly that
batch plan, which is the documented Spark pattern for sinks/state the
engine doesn't natively transactionalize.

Exactly-once story (what the crash-restart test proves): Structured
Streaming writes ``offsets/N`` BEFORE running batch N and ``commits/N``
after; a crash between the two re-delivers batch N — same files, same
``batch_id`` — on restart. The fold is a no-op on re-delivery because
every state mutation is a keyed upsert of rows derived
DETERMINISTICALLY from (batch content, state-minus-batch):

* digest screen: a batch doc is dropped only when its content sha is
  owned OUTSIDE the batch, so shas the crashed attempt already
  committed don't evict their own batch on replay;
* the prior-ingested side of the MinHash screen is the signature state
  MINUS the batch's own ids (anti-join), so a replay screens against
  exactly what the first attempt saw;
* the cluster fold re-derives the same connected components (saved
  star edges the crashed attempt may have already folded lie inside
  the components the replayed pairs regenerate), and
  ``ParquetStateTable.update`` merges by key — rewriting identical
  rows.

A kill can also land BETWEEN the three state commits (clusters →
digests → signatures); each intermediate state re-folds to the same
final state, which the SIGKILL test exercises by killing inside the
fold window at an arbitrary point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mcyj_datapipeline_spark.streaming.incremental import ParquetStateTable


def open_dedup_state(
    spark: SparkSession, state_root: str, num_buckets: int | None = 8
) -> tuple[ParquetStateTable, ParquetStateTable, ParquetStateTable]:
    """The fold's three state tables under one root. ``num_buckets=8``
    (default) is the 100 TB merge-on-write shape — partition-pruned
    rewrites of only the buckets a batch touches; ``None`` selects the
    versioned layout whose ``_CURRENT`` pointer swap makes each state
    commit ATOMIC under kill -9 (the layout the crash-restart test
    uses, and the seam where Delta/Iceberg MERGE slots in at cluster
    scale).

    The chosen layout is recorded in ``{state_root}/_LAYOUT`` on first
    open and ENFORCED on every later open (r9 review): the two layouts
    store under different subpaths, so re-opening bootstrapped state
    with the other layout would silently read None everywhere and fold
    into a fresh empty state — the corpus screens would never run.
    """
    import os

    marker = os.path.join(state_root, "_LAYOUT")
    want = "versioned" if num_buckets is None else f"bucketed:{num_buckets}"
    if os.path.exists(marker):
        with open(marker) as fh:
            have = fh.read().strip()
        if have != want:
            raise ValueError(
                f"dedup state at {state_root!r} was created with layout "
                f"{have!r} but is being opened as {want!r} — the layouts "
                "are disjoint on disk, so this open would silently see "
                "EMPTY state. Pass the original num_buckets."
            )
    else:
        os.makedirs(state_root, exist_ok=True)
        tmp = marker + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(want)
        os.replace(tmp, marker)
    digests = ParquetStateTable(
        spark, f"{state_root}/digests", key="content_sha",
        num_buckets=num_buckets,
    )
    clusters = ParquetStateTable(
        spark, f"{state_root}/clusters", key="doc_id",
        num_buckets=num_buckets,
    )
    sigs = ParquetStateTable(
        spark, f"{state_root}/signatures", key="doc_id",
        num_buckets=num_buckets,
    )
    return digests, clusters, sigs


def fold_dedup_batch(
    batch: DataFrame,
    digests: ParquetStateTable,
    clusters: ParquetStateTable,
    sigs: ParquetStateTable,
    jaccard_threshold: float = 0.8,
) -> DataFrame:
    """ONE fold of a ``(doc_id, text)`` batch into the persistent dedup
    state; returns the committed cluster map. Shared body of the batch
    flagships (``e12_nightly_dedup_fold`` / ``e12b_two_night_fold``,
    which pin it to a DuckDB from-scratch oracle) and the streaming
    form below.

    Cost — sketch AND commit — is batch-adjacent, never corpus-sized:
    only the batch is sha'd/shingled/sketched; the corpus participates
    through its saved digest/cluster/signature state; and (since r10)
    the cluster COMMIT folds only the components the batch actually
    touches. The saved map is a star forest (every doc points at its
    component-minimum root), so any component a new pair can merge is
    one whose saved ``cluster_id`` is held by a pair endpoint — one
    adjacency level suffices. The fold semi-joins the saved map down to
    those components, runs connected components over (that slice's star
    edges + the new pairs), and merges only those rows; untouched
    components' state rows — and, in the bucketed layout, the parquet
    files of buckets holding no touched row — are not rewritten
    (pinned by ``tests/test_stream_dedup_fold.py``'s byte-identical
    inventory test). At 100 TB this is the difference between a
    nightly full rewrite of an id-grain table and a merge proportional
    to the batch's blast radius.

    Null-text contract (r10): ``text`` is pinned to ``''`` via
    ``coalesce`` BEFORE hashing — ``sha2(NULL)`` is NULL, and a NULL
    digest key can never equi-match in the keyed digest merge, so
    un-pinned null rows would accumulate duplicate NULL-key digest
    state on every re-fold. Pinned, null-text docs are exact
    duplicates of the empty document and of each other.

    The batch's own ids are excluded from every state read (broadcast
    anti-joins on the batch-sized id set), which is what makes a
    re-fold of the same batch — the streaming re-delivery case —
    byte-identical to the first fold even when a crashed attempt
    already committed part of its state.

    Scale notes: the two anti-joins against state (digest screen,
    prior-signature exclusion) deliberately carry NO broadcast hint on
    the state side — state is corpus-sized; AQE broadcasts it while it
    is small and falls back to shuffle joins keyed on 32-byte
    shas / 8-byte ids at scale. The batch-id exclusion side IS
    broadcast: it is batch-sized by contract — as are the touched-id
    and touched-cluster-id sets driving the commit's semi-joins.
    """
    from mcyj_datapipeline_spark.operators.dedup import (
        connected_components,
        minhash_lsh_pairs,
        minhash_lsh_pairs_presketched,
        minhash_signatures,
    )

    batch = batch.select(
        "doc_id", F.coalesce(F.col("text"), F.lit("")).alias("text")
    )
    ids = batch.select("doc_id").distinct()

    # Loud-failure guards (r9 review, tightened r10): a cluster map
    # that knows docs OUTSIDE this batch while the digest or signature
    # table is absent — or readable but EMPTY, the same corruption one
    # crash-shape away — is a corrupt/partial bootstrap: folding
    # through it would silently skip the exact and near-dup screens
    # against those prior docs and diverge from the oracle with no
    # error anywhere. (A map whose every doc is IN the batch is the
    # benign first-fold replay state: there is genuinely nothing prior
    # to screen against.) The CONVERSE is equally corrupt (ADVICE r9):
    # digest/signature state holding foreign-owned rows while the
    # cluster map is absent would fold those prior docs OUT of the
    # committed map with no error. Commit order (clusters → digests →
    # signatures, each atomic in the versioned layout) means no clean
    # crash produces either state.
    saved = clusters.read()
    digest_state = digests.read()
    sig_state = sigs.read()
    if saved is not None:
        foreign = saved.join(F.broadcast(ids), "doc_id", "left_anti")
        if foreign.take(1):
            bad = [
                name
                for name, st in (
                    ("digests", digest_state),
                    ("signatures", sig_state),
                )
                if st is None or not st.take(1)
            ]
            if bad:
                raise ValueError(
                    "dedup fold state is inconsistent: cluster map "
                    "holds docs outside this batch but these state "
                    f"tables are missing or empty: {bad} — refusing "
                    "to fold (the exact/near-dup screens against "
                    "prior docs would be silently skipped). "
                    "Re-bootstrap the state."
                )
    else:
        for name, st, key in (
            ("digests", digest_state, "owner_id"),
            ("signatures", sig_state, "doc_id"),
        ):
            if st is not None and st.join(
                F.broadcast(ids.withColumnRenamed("doc_id", key)),
                key,
                "left_anti",
            ).take(1):
                raise ValueError(
                    f"dedup fold state is inconsistent: {name} state "
                    "holds rows owned outside this batch but the "
                    "cluster map is absent — folding would silently "
                    "drop those prior docs from the committed map. "
                    "Re-bootstrap the state."
                )

    # ---- exact screen: drop batch docs whose content is owned by a
    # doc OUTSIDE the batch (an owner inside the batch means this very
    # batch is being re-delivered -> keep, so the re-fold is a no-op)
    batch_sha = batch.withColumn(
        "content_sha", F.sha2(F.col("text"), 256)
    )
    if digest_state is not None:
        foreign_owned = digest_state.join(
            F.broadcast(ids.withColumnRenamed("doc_id", "owner_id")),
            "owner_id",
            "left_anti",
        )
        survivors = batch_sha.join(
            foreign_owned.select("content_sha"), "content_sha", "left_anti"
        ).select("doc_id", "text")
    else:
        survivors = batch

    # ---- incremental near-dup screens (batch-sized, never corpus^2):
    # prior side = persisted signature state minus this batch's ids —
    # prior text is never re-read or re-shingled
    sig_new = minhash_signatures(survivors).persist()
    pairs_schema = "id_a long, id_b long"
    if sig_state is not None:
        sig_prior = sig_state.join(F.broadcast(ids), "doc_id", "left_anti")
        cross = minhash_lsh_pairs_presketched(
            sig_new, sig_prior, jaccard_threshold=jaccard_threshold
        ).select(
            F.col("new_id").alias("id_a"), F.col("existing_id").alias("id_b")
        )
    else:
        cross = batch.sparkSession.createDataFrame([], pairs_schema)
    intra = minhash_lsh_pairs(
        survivors, jaccard_threshold=jaccard_threshold
    ).select("id_a", "id_b")

    # ---- fold: TOUCHED components only (r10). The saved map is a star
    # forest whose root is the component minimum, so one adjacency
    # level finds every component a new pair can reach: the components
    # whose saved cluster_id is held by a pair endpoint (or a batch
    # survivor — the re-delivery case where a crashed attempt already
    # committed the doc's row). CC then runs over that slice's star
    # edges plus the new pairs — pairs-adjacent work, never the corpus
    # — and the commit merges only those rows, so untouched components
    # (and, bucketed, the parquet files of buckets holding none of
    # them) are not rewritten. Label stability is inductive: the slice
    # carries ALL members of each touched component, so the new label
    # is the min over the merged component's full membership — exactly
    # what from-scratch CC (the e12/e12b/e12c oracle) assigns.
    # persisted: the pair relation feeds the touched-id/touched-cluster
    # semi-joins AND the CC fold — without the pin, the banded LSH
    # candidate generation would re-run for each consumer
    new_pairs = cross.unionByName(intra).persist()
    if saved is not None:
        touched_ids = (
            survivors.select("doc_id")
            .unionByName(new_pairs.select(F.col("id_a").alias("doc_id")))
            .unionByName(new_pairs.select(F.col("id_b").alias("doc_id")))
            .distinct()
        )
        touched_clusters = (
            saved.join(F.broadcast(touched_ids), "doc_id", "left_semi")
            .select("cluster_id")
            .distinct()
        )
        saved_slice = saved.join(
            F.broadcast(touched_clusters), "cluster_id", "left_semi"
        )
        stars = saved_slice.filter(
            F.col("doc_id") != F.col("cluster_id")
        ).select(
            F.col("doc_id").alias("id_a"), F.col("cluster_id").alias("id_b")
        )
        slice_ids = saved_slice.select("doc_id")
    else:
        stars = batch.sparkSession.createDataFrame([], pairs_schema)
        slice_ids = batch.sparkSession.createDataFrame([], "doc_id long")
    folded = connected_components(
        stars.unionByName(new_pairs), "id_a", "id_b"
    ).withColumnRenamed("cluster_id", "_cl")

    scope = slice_ids.unionByName(survivors.select("doc_id")).distinct()
    new_map = scope.join(
        folded.withColumnRenamed("doc_id", "_n"),
        scope["doc_id"] == F.col("_n"),
        "left",
    ).select(
        "doc_id",
        F.coalesce(F.col("_cl"), F.col("doc_id")).alias("cluster_id"),
    )

    # ---- commit: merge map; append only genuinely-new digests;
    # signatures enter state exactly once (keyed merge rewrites
    # identical rows on a re-fold)
    committed = clusters.update(new_map, ["cluster_id"])
    new_digests = batch_sha.groupBy("content_sha").agg(
        F.min("doc_id").alias("owner_id")
    )
    if digest_state is not None:
        new_digests = new_digests.join(
            digest_state.select("content_sha"), "content_sha", "left_anti"
        )
    if new_digests.take(1):
        digests.update(new_digests, ["owner_id"])
    if sig_new.take(1):
        sigs.update(sig_new, ["shingles", "signature"])
    sig_new.unpersist()
    new_pairs.unpersist()
    return committed


def stream_dedup_fold(
    spark: SparkSession,
    landing_dir: str,
    state_root: str,
    checkpoint_dir: str,
    schema="doc_id long, text string",
    jaccard_threshold: float = 0.8,
    max_files_per_trigger: int | None = 1,
    num_buckets: int | None = 8,
    available_now: bool = True,
):
    """The nightly dedup fold as a real Structured-Streaming query:
    each parquet file landing in ``landing_dir`` is a "night";
    ``foreachBatch`` folds it into the persistent dedup state with
    :func:`fold_dedup_batch`. ``Trigger.AvailableNow`` (default)
    processes everything pending then stops — the reference loop's
    one-iteration shape; ``available_now=False`` runs the forever-loop
    itself (continuous trigger, caller stops the query).

    ``num_buckets`` defaults to 8 — the same bucketed merge-on-write
    layout as :func:`open_dedup_state`, so bootstrap-then-stream with
    both defaults shares one state (the r9 review found the old
    mismatched defaults silently opened a second, empty layout; the
    ``_LAYOUT`` marker now also makes any mismatch raise). Pass
    ``num_buckets=None`` for the versioned layout, whose ``os.replace``
    pointer swap commits each table ATOMICALLY under kill -9 — the
    layout the crash-restart tests use; the bucketed layout's dynamic
    partition overwrite is only as atomic as the filesystem/table
    format underneath (the Delta/Iceberg seam).

    Returns the started ``StreamingQuery`` when ``available_now=False``
    (already-awaited and None otherwise).
    """
    digests, clusters, sigs = open_dedup_state(
        spark, state_root, num_buckets
    )

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        # localCheckpoint pins the micro-batch's file-list so the three
        # state reads inside the fold can't observe the landing dir
        # mid-batch; eager=False would re-list on every downstream job
        pinned = batch_df.select("doc_id", "text").localCheckpoint(
            eager=True
        )
        fold_dedup_batch(
            pinned, digests, clusters, sigs, jaccard_threshold
        )

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(landing_dir)
    writer = stream.writeStream.foreachBatch(_fold).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer.trigger(availableNow=True).start().awaitTermination()
        return None
    return writer.trigger(processingTime="0 seconds").start()
