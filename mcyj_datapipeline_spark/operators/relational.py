"""Joins, set ops, window-equivalents, sorts/limits
(SURVEY §2.3 J1–J15, §2.5 W1–W3, §2.6 O1–O8, §2.7).

Every reference join is a hand-built dict-index probe over a small build
side; here they are declarative joins so Catalyst picks
BroadcastHashJoin for the small dims (all reference build sides are
≤ a few MB) and SortMergeJoin/shuffled-hash beyond, with AQE converting
at runtime when stats allow. The enrichment helpers take an optional
``broadcast=True`` to hint the build side explicitly — at 100 TB the
fact side never shuffles for these joins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def left_enrich(
    facts: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    broadcast: bool | None = None,
) -> DataFrame:
    """J1–J5: left-join enrichment with a dimension.
    Reference: dict build+probe, e.g. generate_website_data.py:65-159.

    ``broadcast`` is tri-state. ``None`` (default) lets Catalyst + AQE
    pick the strategy from size estimates — the right call for
    enrichment tables that are keyed per-fact-row (1 row per document)
    and therefore GROW with the corpus; a hard hint on those would
    force an executor-OOM broadcast at 100 TB. Pass ``True`` only for
    genuinely fixed-cardinality dims (a lookup table that stays ~kB no
    matter the corpus size). ``False`` behaves like ``None`` — the hint
    is simply omitted and AQE may still auto-broadcast under its size
    threshold; to truly force a shuffle join, set
    ``spark.sql.autoBroadcastJoinThreshold=-1`` or hint
    ``dim.hint("shuffle_hash")`` at the call site.
    """
    d = F.broadcast(dim) if broadcast else dim
    return facts.join(d, on=on, how="left")


def anti_new(
    candidates: DataFrame, done: DataFrame, on: str | list[str]
) -> DataFrame:
    """J6–J8: incremental anti-join — work = candidates ∖ done.
    Reference: set-difference loops, e.g. run_full_pipeline.py:361-376,
    update_sir_summaries.py:322-329. This single operator replaces the
    reference's O(files·rows) repeated scans."""
    return candidates.join(done, on=on, how="left_anti")


def semi_existing(left: DataFrame, right: DataFrame, on: str | list[str]) -> DataFrame:
    """J14: left-semi — rows of ``left`` with a match in ``right``
    (reference extract_pdf_text.py:271-280)."""
    return left.join(right, on=on, how="left_semi")


def except_both(
    left: DataFrame, right: DataFrame, key: str
) -> tuple[DataFrame, DataFrame]:
    """J9 (reference get_download_list.py:57-58): set difference in both
    directions on a key → (left_only, right_only)."""
    lk, rk = left.select(key).distinct(), right.select(key).distinct()
    return lk.join(rk, key, "left_anti"), rk.join(lk, key, "left_anti")


def union_dedup_first_wins(
    preferred: DataFrame, legacy: DataFrame, key: str | list[str]
) -> DataFrame:
    """J13 (reference run_full_pipeline.py:286-310): union current +
    legacy rows, keep the first (preferred) row per key. Precedence is
    made explicit with a rank column instead of relying on union order —
    distributed union order is not deterministic."""
    keys = [key] if isinstance(key, str) else list(key)
    tagged = preferred.withColumn("_prec", F.lit(0)).unionByName(
        legacy.withColumn("_prec", F.lit(1)), allowMissingColumns=True
    )
    # duplicate keys WITHIN a side would tie on _prec alone and resolve
    # per-partitioning; a row-content hash tiebreak (to_json handles any
    # column type) keeps the pick deterministic across runs
    others = [c for c in tagged.columns if c not in keys and c != "_prec"]
    tiebreak = F.xxhash64(F.to_json(F.struct(*[F.col(c) for c in others])))
    w = Window.partitionBy(*keys).orderBy("_prec", tiebreak)
    return (
        tagged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_prec", "_rn")
    )


def coalesce_merge(
    existing: DataFrame,
    updates: DataFrame,
    key: str,
    columns: list[str],
    updates_win: bool = True,
    empty_is_null: bool = True,
) -> DataFrame:
    """J11 upsert/merge (reference backfill_download_metadata.py:106-112,
    168-192): full outer join on ``key``; per column, non-empty value
    from the winning side, falling back to the other side. This is the
    batch-parquet equivalent of a Delta ``MERGE`` — the function is the
    seam where Delta slots in at cluster scale."""

    from pyspark.sql.types import StringType

    # empty-string-is-null only applies to STRING columns: the "" vs
    # null ambiguity is a CSV artifact (reference semantics). Applying
    # nullif(col, '') to a numeric column would ANSI-cast '' and throw
    # at runtime, so the treatment is type-gated per side.
    side_str_cols = {
        "e": {
            f.name
            for f in existing.schema.fields
            if isinstance(f.dataType, StringType)
        },
        "u": {
            f.name
            for f in updates.schema.fields
            if isinstance(f.dataType, StringType)
        },
    }

    def val(side: str, c: str) -> Column:
        df_col = F.col(f"{side}.{c}")
        if empty_is_null and c in side_str_cols[side]:
            return F.nullif(df_col, F.lit(""))
        return df_col

    e = existing.alias("e")
    u = updates.alias("u")
    first, second = ("u", "e") if updates_win else ("e", "u")
    merged = e.join(u, on=F.col(f"e.{key}") == F.col(f"u.{key}"), how="full_outer")
    out_cols = [
        F.coalesce(F.col(f"e.{key}"), F.col(f"u.{key}")).alias(key)
    ] + [
        F.coalesce(val(first, c), val(second, c)).alias(c)
        for c in columns
        if c != key
    ]
    return merged.select(*out_cols)


def keyed_merge_tombstone(
    state: DataFrame,
    api: DataFrame,
    key: str,
    status_col: str,
    absent_status: str = "Unknown",
) -> DataFrame:
    """J12 (reference facility_information/pull_facility_info.py:100-121):
    API rows upsert by key; state rows absent from the API keep their
    data but get ``status_col = absent_status`` (soft tombstone)."""
    api_cols = api.columns
    s = state.alias("s")
    a = api.alias("a")
    joined = s.join(a, on=F.col(f"s.{key}") == F.col(f"a.{key}"), how="full_outer")
    picked = [
        F.coalesce(F.col(f"a.{key}"), F.col(f"s.{key}")).alias(key)
    ] + [
        F.when(F.col(f"a.{key}").isNotNull(), F.col(f"a.{c}"))
        .otherwise(
            F.lit(absent_status) if c == status_col else F.col(f"s.{c}")
        )
        .alias(c)
        for c in api_cols
        if c != key
    ]
    return joined.select(*picked)


def fallback_two_key_join(
    left: DataFrame,
    right: DataFrame,
    primary: str,
    fallback: str,
) -> DataFrame:
    """J10 (reference download_all_pdfs.py:146-148): resolve each left row
    against ``right`` by ``primary`` key, else by ``fallback`` key.
    Implemented as two broadcast joins + struct pick, not a per-row probe.

    The reference's dict probe yields exactly ONE match per input row,
    so each right side is deduplicated per key first (min struct —
    deterministic) — duplicate right keys would otherwise multiply left
    rows through the joins."""
    def _valid(col: Column, df: DataFrame, name: str) -> Column:
        is_str = dict(df.dtypes)[name] == "string"
        return col.isNotNull() & (col != "") if is_str else col.isNotNull()

    r1 = (
        right.select(
            F.col(primary).alias("_k1"), F.struct(*right.columns).alias("_m1")
        )
        .filter(_valid(F.col("_k1"), right, primary))
        .groupBy("_k1")
        .agg(F.min("_m1").alias("_m1"))
    )
    r2 = (
        right.select(
            F.col(fallback).alias("_k2"), F.struct(*right.columns).alias("_m2")
        )
        .filter(_valid(F.col("_k2"), right, fallback))
        .groupBy("_k2")
        .agg(F.min("_m2").alias("_m2"))
    )
    out = (
        left.join(F.broadcast(r1), left[primary] == r1["_k1"], "left")
        .join(F.broadcast(r2), left[fallback] == r2["_k2"], "left")
        .withColumn("matched", F.coalesce(F.col("_m1"), F.col("_m2")))
        .drop("_k1", "_k2", "_m1", "_m2")
    )
    return out


# ---------------------------------------------------------------------------
# Window-equivalents (W1–W3)
# ---------------------------------------------------------------------------


def first_row_per_key(
    df: DataFrame, key: str | list[str], order: list[Column]
) -> DataFrame:
    """W1 (reference backfill_download_metadata.py:72-75 'first occurrence
    wins'): deterministic representative row per key."""
    keys = [key] if isinstance(key, str) else list(key)
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def last_value_per_group(
    df: DataFrame, key: str, value: str, order: Column
) -> DataFrame:
    """W3 (reference generate_website_data.py:184-186 'last write wins'):
    value of ``value`` at the max ``order`` per key — ``max_by``, one
    shuffle, no window materialization."""
    return df.groupBy(key).agg(F.max_by(value, order).alias(value))


# ---------------------------------------------------------------------------
# Sorts / limits / top-k / sampling (O1–O8)
# ---------------------------------------------------------------------------


def work_queue(
    candidates: DataFrame,
    done: DataFrame,
    key: str,
    limit: int,
) -> DataFrame:
    """O4/O5 + J8 + T3: deterministic bounded work batch —
    ``sorted(all − done)[:limit]`` (reference update_sir_summaries.py:
    322-336). TakeOrderedAndProject keeps this a single pass: Spark
    pushes the limit into the sort (per-partition top-N + merge), so no
    full global sort happens even at 100 TB."""
    return candidates.join(done, key, "left_anti").orderBy(key).limit(limit)


def top_k(df: DataFrame, order: list[Column], k: int) -> DataFrame:
    """O6 (reference trie.js:54-59): global top-k. Spark plans
    ``TakeOrderedAndProject`` — per-partition heap + driver merge of k
    rows, not a global sort."""
    return df.orderBy(*order).limit(k)


def top_k_per_group(
    df: DataFrame, group: str | list[str], order: list[Column], k: int
) -> DataFrame:
    """Top-k within each group via row_number window (the scalable form
    of the reference's per-agency newest-first document lists, W2)."""
    keys = [group] if isinstance(group, str) else list(group)
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def deterministic_sample(df: DataFrame, n: int, seed: int = 42) -> DataFrame:
    """O7 (reference investigate_violations.py:124): seeded sample of
    exactly n rows, reproducible under ANY input partitioning.

    ``orderBy(rand(seed))`` is NOT reproducible across partitionings
    (rand is seeded per-partition), so we order by a content hash of the
    whole row salted with the seed — same rows in, same sample out, no
    matter how the input was split.  Executes as TakeOrderedAndProject
    (per-partition top-n + driver merge), not a global sort.
    """
    h = F.xxhash64(F.lit(seed), *[F.col(c) for c in df.columns])
    return (
        df.withColumn("__h", h)
        .orderBy("__h")
        .limit(n)
        .drop("__h")
    )
