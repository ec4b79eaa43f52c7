"""Deterministic sampling and dataset splitting.

``rand(seed)`` is reproducible only for a fixed partitioning — a
repartition, AQE re-plan, or recompute-after-failure can reshuffle which
rows draw which random numbers. For training-data pipelines the sample
and the train/val/test split must be a pure function of the ROW, not of
the execution: hash the key, bucket the hash. Same rows in, same split
out, on any cluster shape — and expressible in the SQL oracle via the
shared md5-based :func:`hashing.hash60`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from mcyj_datapipeline_spark.operators.hashing import hash60


def hash_bucket(key: Column, n_buckets: int = 10_000) -> Column:
    """Stable bucket in [0, n_buckets) from the row key."""
    return hash60(key.cast("string")) % n_buckets


def hash_sample(
    df: DataFrame, key: str, fraction: float, n_buckets: int = 10_000
) -> DataFrame:
    """Deterministic ~``fraction`` sample: keep rows whose key-hash
    bucket falls below the cutoff. Exactly reproducible across runs,
    partitionings, and engines (unlike ``rand(seed)``)."""
    cutoff = int(round(fraction * n_buckets))
    return df.filter(hash_bucket(F.col(key), n_buckets) < cutoff)


def split_assign(
    df: DataFrame,
    key: str,
    val_fraction: float = 0.1,
    test_fraction: float = 0.1,
    n_buckets: int = 10_000,
    out_col: str = "split",
) -> DataFrame:
    """Train/val/test assignment as a pure function of the key hash:
    bucket < val_cut → 'val'; < val_cut+test_cut → 'test'; else 'train'.
    A document always lands in the same split — across reruns, scale
    factors, and engines — which is the property leakage audits need."""
    b = hash_bucket(F.col(key), n_buckets)
    val_cut = int(round(val_fraction * n_buckets))
    test_cut = val_cut + int(round(test_fraction * n_buckets))
    return df.withColumn(
        out_col,
        F.when(b < val_cut, "val")
        .when(b < test_cut, "test")
        .otherwise("train"),
    )


def stratified_hash_sample(
    df: DataFrame,
    stratum: str,
    key: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    n_buckets: int = 10_000,
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. downsample dominant
    languages, keep all of rare ones): each stratum gets its own hash-
    bucket cutoff. Pure map-side filter — no shuffle, no rand()."""
    cutoff = F.lit(int(round(default_fraction * n_buckets)))
    for value, frac in sorted(fractions.items()):
        cutoff = F.when(
            F.col(stratum) == value, F.lit(int(round(frac * n_buckets)))
        ).otherwise(cutoff)
    return df.filter(hash_bucket(F.col(key), n_buckets) < cutoff)


def sample_n_per_key(
    df: DataFrame,
    key: str,
    n: int,
    id_col: str,
) -> DataFrame:
    """Balanced per-group sampling: keep (up to) ``n`` rows per key,
    chosen by md5-hash order of ``id_col`` — deterministic,
    engine-reproducible (md5 is bit-identical everywhere, unlike
    engine-private hash functions), and uniform-ish because the hash
    destroys any correlation with insertion or value order.

    Plan: one shuffle on ``key`` for the window, per-partition sort by
    the hash — rank ≤ n is evaluated before anything wide. The standard
    move for capping a dominant source/language so one crawl domain
    doesn't swamp the mixture."""
    h = F.md5(F.col(id_col).cast("string"))
    w = Window.partitionBy(key).orderBy(h, id_col)
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= n)
        .drop("_rk")
    )


def mixture_resample(
    df: DataFrame,
    stratum: str,
    key: str,
    targets: dict[str, float],
    n_buckets: int = 10_000,
) -> DataFrame:
    """Domain/language mixture rebalancing: downsample strata so the
    output's proportions match ``targets`` (e.g. en 0.4, zh 0.2, ...),
    producing the LARGEST such corpus without upsampling anything —
    output size = min over strata of count_s / target_s; stratum s
    keeps rate_s = (that minimum × target_s) / count_s.

    One tiny aggregate collect (one row per stratum — never data-
    sized), then a pure map-side hash filter: no shuffle of the corpus,
    deterministic across runs/partitionings/engines. Strata absent from
    ``targets`` are dropped (target share 0). Cutoffs stay floating
    (bucket < rate·n_buckets) so the SQL oracle reproduces them exactly
    without integer-rounding divergence."""
    counts = {
        r[0]: r[1]
        for r in df.groupBy(stratum).agg(F.count(F.lit(1))).collect()
        if r[0] in targets
    }
    # a target stratum with zero input rows pins the mixture to empty
    # (can't upsample) — a defined degenerate result, not a KeyError;
    # likewise an all-zero target dict.
    ratios = [counts.get(s, 0) / t for s, t in targets.items() if t > 0]
    n_out = min(ratios) if ratios else 0
    cutoff = F.lit(-1.0)  # unknown strata: bucket < -1 never holds
    for s, t in sorted(targets.items()):
        n_s = counts.get(s, 0)
        rate = 0.0 if n_s == 0 else min(1.0, (n_out * t) / n_s)
        cutoff = F.when(
            F.col(stratum) == s, F.lit(rate * n_buckets)
        ).otherwise(cutoff)
    return df.filter(hash_bucket(F.col(key), n_buckets) < cutoff)


def leakage_safe_split(
    docs: DataFrame,
    dup_edges: DataFrame,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
    val_fraction: float = 0.1,
    test_fraction: float = 0.1,
    n_buckets: int = 10_000,
) -> DataFrame:
    """Train/val/test assignment that can never leak near-duplicates
    across the boundary: documents are split by their duplicate-CLUSTER
    key, not their own id, so every member of a near-dup cluster (from
    :func:`..dedup.connected_components` over e.g. MinHash pairs) lands
    on the same side. Singletons fall back to their own id.

    This is the eval-hygiene op every public lineage describes (GPT-3's
    train/test overlap post-mortem; the decontamination sections of
    Llama/Pile papers): dedup BEFORE splitting, or equivalently split by
    canonical duplicate key. Cost at 100 TB: CC over the candidate-pair
    edge list (edges only — tiny vs the corpus) + one broadcast-size
    join back; the split itself stays a pure map of the key hash.
    """
    from mcyj_datapipeline_spark.operators.dedup import connected_components

    comps = connected_components(dup_edges, src, dst).select(
        F.col("doc_id").alias("_cc_node"), F.col("cluster_id").alias("_cc_id")
    )
    keyed = docs.join(
        comps, docs[id_col] == comps["_cc_node"], "left"
    ).withColumn(
        "split_key", F.coalesce(F.col("_cc_id"), F.col(id_col))
    ).drop("_cc_node", "_cc_id")
    return split_assign(
        keyed,
        key="split_key",
        val_fraction=val_fraction,
        test_fraction=test_fraction,
        n_buckets=n_buckets,
    )


def weighted_sample_topk(
    df: DataFrame,
    key: str,
    weight: Column,
    k: int,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis-
    Spirakis A-ES): each row draws a pseudo-uniform ``u`` from its key
    hash and is ranked by ``ln(u)/w`` (the monotone-equivalent log form
    of ``u^(1/w)``); the top-k ranked rows are the sample. Inclusion
    probability is proportional to weight, yet the draw is a pure
    function of the row — reproducible across runs, partitionings, and
    engines, unlike ``rand(seed)``-based designs (module docstring).

    Scale shape: the priority is a per-row expression (no shuffle), and
    the top-k is a ``TakeOrdered`` — per-partition heaps of size k, one
    k-row merge at the driver, never a global sort. Rows with
    non-positive weight are excluded (zero mass). ``u`` lands in
    ``(0, 1]`` so ``ln(u)`` is finite.
    """
    u = (hash60(F.col(key).cast("string")) + F.lit(1).cast("double")) / F.lit(
        float(1 << 60)
    )
    pri = F.log(u) / weight
    return (
        df.filter(weight > 0)
        .withColumn("priority", pri)
        .orderBy(F.col("priority").desc(), F.col(key).asc())
        .limit(k)
    )
