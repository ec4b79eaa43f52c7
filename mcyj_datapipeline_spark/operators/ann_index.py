"""Persistent IVF index (round 12): centroids and inverted lists live
in ParquetStateTables and ANN queries answer FROM STATE — the BM25
posting-index shape applied to vector retrieval.

The one-shot :func:`similarity.ivf_topk` re-assigns the whole corpus
per query batch; at 100 TB the index must persist and queries must
touch only the probed slices. Layout:

* ``centroids``: k rows (versioned layout — tiny, and the version
  history doubles as refit audit).
* ``assignments``: one row per vector ``(vec_id, embedding,
  centroid_id)``, keyed by ``vec_id`` but BUCKETED BY ``centroid_id``
  (the :class:`ParquetStateTable` ``bucket_col`` seam) — the on-disk
  form of the inverted lists. A probe read lists ONLY the probed
  centroids' bucket dirs (``read_pruned``): untouched lists cost
  zero input splits and zero listing, the same storage-level pruning
  the term-partitioned BM25 layout buys.

bucket_col contract note: a vector's centroid is functionally
determined by its id ONLY while the centroids are fixed. Ingest folds
(:func:`fold_ivf_batch`) assign against the FROZEN stored centroids,
so re-delivered batches rewrite identical rows (idempotent). A REFIT
moves vectors between lists and therefore must go through
:func:`rebuild_ivf_state` (full rewrite via ``write_initial``), never
through ``update`` — the nightly-refresh split: cheap keyed folds
every night, a warm-restarted k-means rebuild
(:func:`similarity.kmeans_centroids_converged` ``start_centroids``)
when drift warrants.

Probe semantics mirror :func:`similarity.ivf_topk` exactly (rounded
cosine, ties to smallest id, self excluded) — pinned by an in-engine
equality test between from-state and in-memory answers on identical
centroids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mcyj_datapipeline_spark.operators.similarity import cosine, ivf_assign
from mcyj_datapipeline_spark.streaming.incremental import ParquetStateTable


def open_ivf_state(
    spark: SparkSession, state_root: str, num_buckets: int = 16
) -> tuple[ParquetStateTable, ParquetStateTable]:
    centroids = ParquetStateTable(
        spark, f"{state_root}/centroids", key="centroid_id"
    )
    assignments = ParquetStateTable(
        spark,
        f"{state_root}/assignments",
        key="vec_id",
        num_buckets=num_buckets,
        bucket_col="centroid_id",
    )
    return centroids, assignments


def rebuild_ivf_state(
    corpus: DataFrame,
    centroids_df: DataFrame,
    centroids_st: ParquetStateTable,
    assignments_st: ParquetStateTable,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """(Re)build the index for a given centroid set: store the
    centroids (versioned commit — history is the refit audit trail)
    and FULLY rewrite the inverted lists. A refit can move any vector
    between lists, which the bucketed ``update`` path must never do
    (a moved key would leave its stale row in the old bucket), so
    rebuilds overwrite; incremental ingest belongs in
    :func:`fold_ivf_batch`."""
    centroids_st.update(
        centroids_df.select("centroid_id", "cent_vec"), ["cent_vec"]
    )
    assigned = ivf_assign(
        corpus, id_col=id_col, vec_col=vec_col, centroids=centroids_df
    )
    assignments_st.write_initial(
        assigned.select(id_col, vec_col, "centroid_id")
    )


def fold_ivf_batch(
    new_vectors: DataFrame,
    centroids_st: ParquetStateTable,
    assignments_st: ParquetStateTable,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Ingest fold: assign the batch against the FROZEN stored
    centroids and upsert its rows — batch-sized work, touched-bucket
    commits, replay-idempotent (same centroids → same assignment →
    identical rows). New vectors only: the frozen-centroid contract
    is what keeps vec_id → centroid_id functional (module note)."""
    cents = centroids_st.read()
    if cents is None:
        raise ValueError(
            "fold_ivf_batch: no centroids stored — rebuild_ivf_state first"
        )
    assigned = ivf_assign(
        new_vectors, id_col=id_col, vec_col=vec_col, centroids=cents
    )
    assignments_st.update(
        assigned.select(id_col, vec_col, "centroid_id"),
        [vec_col, "centroid_id"],
    )


def ann_topk_from_state(
    centroids_st: ParquetStateTable,
    assignments_st: ParquetStateTable,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF top-k answered from the persisted index: per query, rank
    the stored centroids (a k-row broadcast), take the ``nprobe``
    nearest, and read ONLY those centroids' bucket dirs from the
    assignment table — the probed-lists read is pruned at the storage
    level, so query cost tracks nprobe/n_centroids of the index, not
    its size. The probed-centroid-id list is a driver-side collect
    bounded by ``n_queries × nprobe`` (and by the centroid count),
    never data-sized. Ranking semantics are
    :func:`similarity.ivf_topk`'s exactly: rounded cosine, ties to
    the smallest neighbor id, self excluded."""
    cents = centroids_st.read()
    if cents is None:
        raise ValueError("ann_topk_from_state: empty index")
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    qprobe = q.crossJoin(F.broadcast(cents)).select(
        "query_id",
        "q_vec",
        "centroid_id",
        F.round(cosine(F.col("q_vec"), F.col("cent_vec")), 6).alias("_cos"),
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.desc("_cos"), F.col("centroid_id")
    )
    probes = (
        qprobe.withColumn("_rn", F.row_number().over(wq))
        .filter(F.col("_rn") <= nprobe)
        .select("query_id", "q_vec", "centroid_id")
    )
    probe_ids = sorted(
        r[0] for r in probes.select("centroid_id").distinct().collect()
    )
    lists = assignments_st.read_pruned(probe_ids).filter(
        F.col("centroid_id").isin(probe_ids)
    )
    cands = lists.join(F.broadcast(probes), on="centroid_id").filter(
        F.col(id_col) != F.col("query_id")
    )
    scored = cands.select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        F.round(cosine(F.col("q_vec"), F.col(vec_col)), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.col("neighbor_id")
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select("query_id", "neighbor_id", "cosine", F.col("_rn").alias("rank"))
    )
