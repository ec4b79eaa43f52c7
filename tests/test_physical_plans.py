"""Physical-plan assertions: the properties that make these plans hold
at 100 TB — column pruning, predicate pushdown into the parquet scan,
broadcast of dimension sides, no shuffle where none is needed."""

from __future__ import annotations

import pytest

from mcyj_datapipeline_spark import registry


def plan_of(spark, sf_dir, name: str) -> str:
    df = registry.queries()[name](spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_scan_prunes_and_pushes(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "s3_scan_project_filter")
    # Only the 3 referenced columns are read; the shipdate predicate is
    # pushed into the scan.
    assert "l_orderkey" in plan and "l_extendedprice" in plan
    assert "l_comment" not in plan and "l_quantity" not in plan
    assert "l_shipdate" in plan.split("DataFilters")[1][:200]


def test_metadata_query_never_reads_text(spark, sf_dir):
    """SURVEY §4: column pruning must keep `text` out of metadata-only
    scans (the reference re-read full text for hash counting)."""
    plan = plan_of(spark, sf_dir, "a07_uniqueness_report")
    scan = [l for l in plan.splitlines() if "FileScan" in l][0]
    assert "text" not in scan


def test_enrichment_join_broadcasts(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "j01_left_enrich_join")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_flagship_broadcasts_dims(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "e3_flagship_revenue_rollup")
    # nation + region (tiny dims) must be broadcast, never shuffled.
    assert plan.count("BroadcastHashJoin") >= 2


def test_anti_join_is_join_not_subquery_scan(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "j06_anti_join_new_work")
    assert "LeftAnti" in plan


def test_work_queue_uses_take_ordered(spark, sf_dir):
    """O4: orderBy+limit must plan TakeOrderedAndProject (per-partition
    top-N + merge), not a global sort."""
    plan = plan_of(spark, sf_dir, "o4_bounded_work_queue")
    assert "TakeOrderedAndProject" in plan
    assert "Sort " not in plan or "TakeOrdered" in plan


def test_topk_uses_take_ordered(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "o6_top_k_by_aggregate")
    assert "TakeOrderedAndProject" in plan


def test_bucketed_join_avoids_shuffle(spark, sf_dir, tmp_path):
    """Bucketing both sides of a recurring join key pre-co-locates the
    data: the sort-merge join reads bucket files directly, with no
    Exchange on either side — the 100 TB answer for joins repeated
    across runs (state table ⋈ updates)."""
    from mcyj_datapipeline_spark import io as MIO

    orders = MIO.read_table(spark, sf_dir, "orders")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        for name in ("t_bucket_a", "t_bucket_b"):
            spark.sql(f"DROP TABLE IF EXISTS {name}")
            (
                orders.select("o_orderkey", "o_totalprice")
                .write.bucketBy(8, "o_orderkey")
                .sortBy("o_orderkey")
                .option("path", str(tmp_path / name))
                .saveAsTable(name)
            )
        a = spark.table("t_bucket_a")
        b = spark.table("t_bucket_b").withColumnRenamed("o_totalprice", "p2")
        joined = a.join(b, "o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located: no shuffle at all
        assert joined.count() == orders.count()
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        for name in ("t_bucket_a", "t_bucket_b"):
            spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_website_pipeline_broadcasts_all_dims(spark, sf_dir):
    """E3: every enrichment join (summaries/levels/staffing/facility)
    must broadcast — the fact table is the only large input."""
    plan = plan_of(spark, sf_dir, "e3_website_pipeline")
    assert plan.count("BroadcastHashJoin") >= 4
    assert "SortMergeJoin" not in plan


def test_ivf_assignment_broadcasts_centroids(spark, sf_dir):
    """IVF: centroid set rides a broadcast nested-loop join; the corpus
    itself is never shuffled for assignment."""
    plan = plan_of(spark, sf_dir, "sim_ivf_topk")
    assert "BroadcastNestedLoopJoin" in plan


def test_salted_agg_two_exchanges_small_second(spark, sf_dir):
    """Salted collect_set: phase 1 shuffles on (key, salt), phase 2 on
    key over already-collapsed partials."""
    plan = plan_of(spark, sf_dir, "skew_salted_collect_set")
    assert "_salt" in plan and plan.count("HashAggregate") >= 2


# Queries that intentionally use a (broadcast) cross join: small-side
# query batches / centroid or plane sets against the corpus.
_INTENTIONAL_CROSS = {
    "p08_date_cutoff_filter",     # 1-row cutoff broadcast
    "sim_cosine_topk_bruteforce",
    "sim_cosine_topk_numpy",
    "sim_ivf_topk",
    "sim_ivf_kmeans_topk",
    "sim_lsh_topk",
    "sim_lsh_multiprobe_topk",
    "sim_embedding_near_dup",
}


@pytest.mark.heavytier
def test_no_unintended_cartesian_products(spark, sf_dir):
    """Sweep every registered query's physical plan: a CartesianProduct
    outside the intentional broadcast-cross set is a planning bug (an
    equi-join key got lost somewhere)."""
    offenders = []
    for name in sorted(registry.queries()):
        if name in _INTENTIONAL_CROSS:
            continue
        try:
            plan = plan_of(spark, sf_dir, name)
        except Exception:
            continue  # other tests cover runnability
        if "CartesianProduct" in plan:
            offenders.append(name)
    assert offenders == [], offenders


def test_date_spine_broadcasts(spark, sf_dir):
    """The generated date spine is tiny; its join against daily counts
    must be a broadcast, never a shuffle of the fact side."""
    plan = plan_of(spark, sf_dir, "d1_date_spine_gap_fill")
    assert "BroadcastHashJoin" in plan


def test_unpivot_has_no_shuffle(spark, sf_dir):
    """stack() is a narrow transformation — any Exchange in the melt
    plan means rows were moved for no reason."""
    plan = plan_of(spark, sf_dir, "a14_unpivot_melt")
    assert "Exchange" not in plan


def test_pivot_skips_value_discovery_job(spark, sf_dir):
    """Pivot with an explicit value list must stay a single aggregate
    plan (no separate distinct-collect of pivot values)."""
    plan = plan_of(spark, sf_dir, "a03_pivot_status_priority")
    assert plan.count("Exchange") <= 2


def test_sql_entry_q3_plan_quality(spark, sf_dir):
    """The spark.sql-submitted Q3 must plan like the DataFrame API:
    top-10 via TakeOrderedAndProject (never a global sort) and the
    customer dimension joined by broadcast."""
    plan = plan_of(spark, sf_dir, "sql1_shipping_priority")
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan


def test_enrichment_broadcast_is_size_gated(spark, sf_dir):
    """The per-document enrichment tables in build_flat_table
    (summaries/levels/staffing) grow with the corpus, so they carry NO
    forced broadcast hint: at reference scale the optimizer broadcasts
    them from size estimates (previous test), and when they exceed the
    broadcast threshold the plan must fall back to a shuffle join
    instead of force-broadcasting a corpus-sized table. ``facilities``
    is a fixed-cardinality dim with an explicit hint, which must
    survive the threshold change."""
    conf = spark.conf
    prev = conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = plan_of(spark, sf_dir, "e3_website_pipeline")
        # Per-doc enrich joins: no hint -> shuffle strategy once the
        # optimizer can no longer prove them small.
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        # The fixed-size facilities dim keeps its forced broadcast.
        assert "BroadcastHashJoin" in plan
    finally:
        conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_enrichment_broadcast_chosen_when_small(spark, sf_dir):
    """Flip side of the gate: with the default threshold the optimizer
    must still pick broadcast for every enrichment join (the dims ARE
    small at this scale) — dropping the hard hints must not cost the
    small-scale plan anything."""
    plan = plan_of(spark, sf_dir, "e3_website_pipeline")
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 4


def test_salvage_python_udf_only_on_failed_rows(spark, sf_dir):
    """F16 at scale: the brace-matching Python fallback must live in a
    BatchEvalPython stage under the fast-path-failed filter only — the
    fast-path branch of the union must stay whole-stage-codegen with no
    Python evaluation at all."""
    plan = plan_of(spark, sf_dir, "f16_json_salvage")
    assert "Union" in plan
    # Spark 4 plans the UDF as ArrowEvalPython (Arrow-batched); older
    # versions as BatchEvalPython. Exactly one Python stage either way.
    n_python = plan.count("ArrowEvalPython") + plan.count("BatchEvalPython")
    assert n_python == 1
    # The Python stage's branch is gated by an isnull filter on the
    # fast-path parse result.
    python_branch = plan.split("EvalPython")[1]
    assert "isnull" in python_branch


def test_sql_grouping_sets_uses_expand(spark, sf_dir):
    """sql3: GROUPING SETS must plan ONE Expand + one aggregate shuffle,
    not a union of per-grouping-set scans (one pass over orders)."""
    plan = plan_of(spark, sf_dir, "sql3_grouping_sets")
    assert "Expand" in plan
    assert "Union" not in plan
    assert plan.count("FileScan") == 1


def test_sql_window_is_partitioned(spark, sf_dir):
    """sql4: the rank window must be hash-partitioned by segment — a
    parallel per-partition sort, never the single-reducer global sort
    Spark falls back to when no PARTITION BY is given."""
    plan = plan_of(spark, sf_dir, "sql4_window_top_customers")
    assert "Window" in plan
    assert "hashpartitioning(c_mktsegment" in plan
    assert "SinglePartition" not in plan


def test_mixture_resample_is_map_side_only(spark, sf_dir):
    """o10: the mixture filter must be a pure map-side scan+filter —
    the only Exchange tolerated is AQE's final coalesce; the corpus is
    never shuffled to be sampled."""
    plan = plan_of(spark, sf_dir, "o10_mixture_resample")
    assert "Exchange hashpartitioning" not in plan
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


def test_chunk_windows_no_shuffle(spark, sf_dir):
    """Chunking is tokenize+sequence+explode+slice — narrow end to end;
    any Exchange means rows moved for nothing."""
    plan = plan_of(spark, sf_dir, "text_chunk_windows")
    assert "Exchange" not in plan


def test_skew_report_take_ordered(spark, sf_dir):
    """dq2: top-10 heavy keys via TakeOrderedAndProject over the
    counts, never a global sort of the key histogram."""
    plan = plan_of(spark, sf_dir, "dq2_key_skew_report")
    assert "TakeOrderedAndProject" in plan
    assert "Sort " not in plan or "TakeOrdered" in plan


def test_winsorize_broadcasts_cutpoints(spark, sf_dir):
    """q1: the percentile row rides a broadcast join back over the
    fact scan — the fact side is never shuffled to meet a 1-row agg."""
    plan = plan_of(spark, sf_dir, "q1_winsorized_stats")
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


def test_url_normalize_is_map_only(spark, sf_dir):
    """URL canonicalization is pure column expressions — no Exchange,
    no BatchEvalPython; it must fuse with the scan."""
    plan = plan_of(spark, sf_dir, "url_normalize_canonical")
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan


def test_url_dedup_shuffles_fixed_width_key(spark, sf_dir):
    """URL dedup groups on sha256(canonical) — the projection feeding
    the exchange carries the 64-char key, not the raw text column."""
    plan = plan_of(spark, sf_dir, "url_dedup_groups")
    scan = [l for l in plan.splitlines() if "FileScan" in l][0]
    assert "text" not in scan  # column pruning: only doc_id read


def test_decon_corpus_side_never_shuffles(spark, sf_dir):
    """Benchmark side broadcasts; the corpus side of the contamination
    scan must reach the aggregate without a join-driven Exchange (the
    only exchange allowed is the final groupBy on vec_id)."""
    plan = plan_of(spark, sf_dir, "decon_embedding_contamination")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_sql5_dim_chain_broadcasts(spark, sf_dir):
    """Q5 shape: region/nation (fixed-cardinality dims) broadcast; no
    cartesian product despite the comma-join syntax."""
    plan = plan_of(spark, sf_dir, "sql5_local_supplier_volume")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_hll_rollup_scans_events_once(spark, sf_dir):
    """The corpus total is a union of the DAILY sketches, not a second
    scan: both the per-day branch and the total branch must read the
    persisted day-grain sketch cache (events is scanned once, when the
    cache populates — the InMemoryRelation's printed lineage is the
    only place a FileScan appears)."""
    plan = plan_of(spark, sf_dir, "sk_hll_daily_uniques_rollup")
    assert plan.count("InMemoryTableScan") == 2, plan
    # and the total rides a broadcast back onto the day rows
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_pack_sequences_window_is_partitioned(spark, sf_dir):
    """The running token sum must partition by stream — a global window
    would serialize the whole corpus through one reducer."""
    plan = plan_of(spark, sf_dir, "pack_training_sequences")
    assert "WindowExec: No Partition Defined" not in plan
    assert "Window" in plan


def test_quality_threshold_broadcasts_cutpoints(spark, sf_dir):
    """Per-language cutoffs are a languages-count row set — must join
    back by broadcast, never SMJ."""
    plan = plan_of(spark, sf_dir, "quality_keep_top_per_lang")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_media_decode_python_is_kernel_only(spark, sf_dir):
    """WAV/PNG decode queries: exactly the two mapInPandas stages
    (synth + decode) touch Python — no row-at-a-time BatchEvalPython
    anywhere."""
    for name in ("mm_wav_decode_features", "mm_png_decode_features"):
        plan = plan_of(spark, sf_dir, name)
        assert "BatchEvalPython" not in plan, name
        assert plan.count("MapInPandas") == 2, (name, plan.count("MapInPandas"))


def test_e8_pipeline_plan_quality(spark, sf_dir):
    """E8: the whole curation flow is one Catalyst plan — no Python
    stages outside sequence bookkeeping, broadcast for the semi-joins
    against the winner sets (tiny at every scale relative to the fact
    side at gate SF), and the text column never reaches the packer's
    window (only token counts shuffle)."""
    plan = plan_of(spark, sf_dir, "e8_curation_pipeline")
    assert "BatchEvalPython" not in plan
    assert "MapInPandas" not in plan  # packing is pure column ops
    assert "CartesianProduct" not in plan
    # token counts are computed in a projection BEFORE the window's
    # exchange (`... AS n#`): the shuffle carries counts, not text
    window_part = plan.split("Window")[-1]
    assert " AS n#" in window_part


def test_sql6_exists_becomes_semi_join(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "sql6_order_priority_exists")
    assert "LeftSemi" in plan
    assert "o_orderdate" in plan.split("DataFilters")[1][:300]


def test_frontier_schedule_window_is_partitioned(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "t7_frontier_schedule")
    assert "WindowExec: No Partition Defined" not in plan
    assert "BroadcastHashJoin" in plan  # delay table rides broadcast


def test_e9_acquisition_is_shuffle_free(spark, sf_dir):
    """E9: WARC walk -> HTML extract -> quality score are consecutive
    map stages. The only allowed exchange is the single head-of-chain
    compute spread (REPARTITION to core count) — downstream kernels
    must reuse that partitioning, never re-shuffle between stages."""
    plan = plan_of(spark, sf_dir, "e9_acquisition_pipeline")
    assert plan.count("Exchange") == 1, plan.count("Exchange")
    assert "REPARTITION" in plan  # the spread, not a semantic shuffle
    assert plan.count("MapInPandas") == 3  # synth, WARC, HTML


@pytest.mark.heavytier
def test_registry_has_no_unpartitioned_windows_on_scale_paths(spark, sf_dir):
    """Registry-wide scale gate: NO query outside registry.TEST_SCALE_ONLY
    may contain an unpartitioned window (empty PARTITION BY = Spark
    funnels the whole input through one reducer for the sort — the
    classic silent 100 TB killer). Walks the optimized LOGICAL plan's
    Window nodes and checks their partitionSpec directly, so a renamed
    alias can't hide one and plan-string formatting can't break it."""

    def has_global_window(df) -> bool:
        stack = [df._jdf.queryExecution().optimizedPlan()]
        while stack:
            node = stack.pop()
            if (
                node.nodeName() == "Window"
                and node.partitionSpec().isEmpty()
            ):
                return True
            children = node.children()
            for i in range(children.size()):
                stack.append(children.apply(i))
        return False

    offenders = []
    for name, fn in registry.queries().items():
        if name in registry.TEST_SCALE_ONLY:
            continue
        if has_global_window(fn(spark, sf_dir)):
            offenders.append(name)
    assert not offenders, (
        f"unpartitioned window in scale-path queries: {offenders}"
    )
    # the exhibit set stays honest in both directions: every listed name
    # must exist and actually contain the global window it is excused for
    for name in registry.TEST_SCALE_ONLY:
        assert has_global_window(registry.queries()[name](spark, sf_dir))


# --- batch 10: the five remaining TPC-H optimizer shapes -------------------


def test_sql22_correlated_min_plan(spark, sf_dir):
    """Q2 shape: top-100 plans TakeOrderedAndProject (no global sort);
    every dimension decoration broadcasts; the per-part min is an
    aggregate of the cost relation, not a window over raw lineitem."""
    plan = plan_of(spark, sf_dir, "sql22_min_cost_supplier")
    assert "TakeOrderedAndProject" in plan
    assert plan.count("BroadcastHashJoin") >= 4
    assert "Window" not in plan


def test_sql23_part_filter_broadcasts_into_fact(spark, sf_dir):
    """Q9 shape: the p_name LIKE filter must prune part BEFORE the
    broadcast build (fact rows drop at the join, not after), and
    supplier/nation must never arrive via SortMergeJoin."""
    plan = plan_of(spark, sf_dir, "sql23_profit_by_nation_year")
    assert plan.count("BroadcastHashJoin") >= 2
    # the LIKE predicate is pushed into part's scan, not evaluated
    # post-join on the fact
    scan_lines = [l for l in plan.splitlines() if "FileScan" in l and "part" in l]
    assert any("p_name" in l for l in scan_lines)


def test_sql24_single_fact_scan_with_broadcast_scalar(spark, sf_dir):
    """Q11 shape: the global threshold is a broadcast nested-loop of a
    1-row aggregate — the lineitem fact is scanned once (the grouped
    relation is persisted across its two consumers)."""
    plan = plan_of(spark, sf_dir, "sql24_important_value_parts")
    assert "BroadcastNestedLoopJoin" in plan
    assert plan.count("InMemoryTableScan") >= 2 or plan.count("FileScan parquet") <= 3


def test_sql25_semi_join_after_aggregate(spark, sf_dir):
    """Q20 shape: the IN-subquery plans as a LeftSemi broadcast join
    against the aggregated supplier-key set."""
    plan = plan_of(spark, sf_dir, "sql25_excess_shipped_parts")
    assert "LeftSemi" in plan
    assert "BroadcastHashJoin" in plan


def test_sql26_exists_collapsed_to_one_aggregate(spark, sf_dir):
    """Q21 shape: the double correlated EXISTS/NOT EXISTS must NOT plan
    as two extra fact joins — one per-order aggregate plus one join
    back. Exactly: lineitem-orders join, per-order agg, agg-late join,
    broadcast supplier, final group. No anti join survives."""
    plan = plan_of(spark, sf_dir, "sql26_waiting_suppliers")
    assert "LeftAnti" not in plan
    assert "TakeOrderedAndProject" in plan
    # fact scanned at most twice (base + late reuse one scan pattern each)
    assert plan.count("FileScan parquet") <= 5


def test_yoy_and_share_shapes_broadcast_dims(spark, sf_dir):
    """Batch-12 report shapes: every dimension decoration and the YoY
    self-join side are broadcast — the only shuffle over facts is the
    single aggregation."""
    for name in ("sql27_yoy_revenue_growth", "sql28_revenue_share_of_region"):
        plan = plan_of(spark, sf_dir, name)
        assert "BroadcastHashJoin" in plan, name
        assert "SortMergeJoin" not in plan, name


def test_channel_union_is_metadata_only(spark, sf_dir):
    """The conformed-channel union must plan as Union over the two
    scans feeding ONE partial-aggregated groupBy — no join, no extra
    exchange per source."""
    plan = plan_of(spark, sf_dir, "sql29_channel_union_rollup")
    assert "Union" in plan
    assert "Join" not in plan
