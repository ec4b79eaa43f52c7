#!/usr/bin/env python3
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Process-batched since round 7 (VERDICT r6 "what's wrong" #2): running
all 79 headline queries in ONE JVM inflated every shared query 15-25%
vs its isolated truth (r6 booked g1_pagerank at 3.54s while it runs
1.76s isolated — codegen-cache pressure, accumulated broadcast/shuffle
state, and heap churn from 78 neighbours). The parent process now
splits the headline set into batches of ~20 and runs each batch in a
FRESH subprocess/JVM with its own warmup, then merges the per-batch
results into the single machine line. Per-query numbers are therefore
close to isolated-session truth while still amortizing session
startup over ~20 queries. Set SPARK_GRAFT_BENCH_BATCH_SIZE=0 to force
the old single-process regime for A/B.

Each query is timed end-to-end (plan + execute + collect-to-count);
a warmup iteration per batch amortizes JVM/codegen/C2 out of the
numbers (regime rationale inline below).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def materialized_count(df) -> int:
    """Row count that FORCES every output expression to evaluate.

    A bare ``df.count()`` lets Catalyst prune projection-only plans to
    the underlying scan — a benchmark timing of a fingerprint or
    quantization query would then measure parquet IO, not the operator.
    Hashing the full output row into the aggregate makes every column
    load-bearing; ``bit_xor`` folds the hashes without overflow."""
    from pyspark.sql import functions as F

    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.bit_xor(F.xxhash64(F.struct(*df.columns))).alias("_h"),
    ).collect()[0]
    return row["n"]


def _release_pinned_blocks(spark) -> None:
    """Free localCheckpoint blocks left behind by iterative queries
    (PageRank, connected components). ``clearCache`` only drops
    CacheManager entries — checkpointed RDD blocks release when the
    driver-side references are GC'd and the ContextCleaner runs, so
    without a nudge they accumulate across the query loop and the
    storage pressure turns into GC churn for later queries."""
    import gc

    gc.collect()
    try:
        spark.sparkContext._jvm.System.gc()
    except Exception:
        pass
    # ContextCleaner drains its ref queue ASYNCHRONOUSLY after the GC —
    # without a beat here its block/broadcast/shuffle removals land
    # inside the NEXT timed window (observed as rep-2/3 inflation on
    # the checkpoint-heavy iterative queries)
    time.sleep(0.3)


# --- Host-drift calibration (round 8, VERDICT r7 #5) -----------------
# Same-commit bench totals moved ±20% between bookings (SCALE.md r7
# note: 64.3 -> 76.4s with trivial scans drifting uniformly) — the
# microVM host's day-scale speed is now the dominant cross-round noise.
# Every batch JVM therefore times a FIXED-SIZE, sf-independent probe
# (pure whole-stage-codegen CPU over spark.range — no IO, no shuffle,
# no data dependence, so it measures the host, never the workload) and
# the machine line carries drift-normalized numbers alongside raw:
#     normalized = raw * (CALIB_REF_SEC / batch_calib_sec)
# CALIB_REF_SEC is PINNED to the round-8 booking host (min of 5 probe
# reps, median across 4 batch JVMs); cross-round comparisons quote the
# normalized fields. Per-query normalized values live in
# BENCH_DETAIL.json (the stdout machine line stays compact — the
# driver's bounded tail outgrew a 3-dict line once already).
# pinned round-8 (2026-08-15 booking host: probe mins 0.238-0.266
# across four settled JVMs); see SCALE.md drift note
CALIB_REF_SEC: float | None = 0.24

# --- Dual probes (round 11, VERDICT r10 #2) ---------------------------
# The r10 driver bench showed ~40 untouched queries reading 1.4-2.5x
# slow while the calibration factor read near-1: whatever contended
# the host hit sustained 32-way query work but not the short min-of-5
# probe windows, so drift normalization under-corrected. Two probes
# now run per batch JVM:
#   parallel — the original 32-partition probe (ref CALIB_REF_SEC;
#     this is what `value_normalized` continues to use, because the
#     query mix is itself 32-way parallel and the r8-r10 normalized
#     series is pinned to it);
#   serial   — a 1-partition probe (ref below, derived on the r11
#     booking host so the two factors agree on an uncontended host:
#     parallel factor 0.24/0.3024 = 0.794 x serial min 0.2300 =
#     0.183; fresh-JVM medians of min-of-5, 3 JVMs).
# A contended host slows the oversubscribed parallel probe MORE than
# the serial one (co-tenant load steals cores; a single thread usually
# still gets one), so factor_serial/factor_parallel drifting >20%
# apart flags the window: `calib_divergent` rides the machine line and
# the round's per-query numbers should be read with suspicion rather
# than booked as regressions.
CALIB_SERIAL_REF_SEC: float | None = 0.183


def _probe(spark, n: int, parts: int) -> float:
    """Min-of-5 timing of a fixed spark.range CPU probe in THIS JVM."""
    from pyspark.sql import functions as F

    reps = []
    for _ in range(5):
        start = time.monotonic()
        spark.range(0, n, 1, parts).agg(
            F.bit_xor(F.xxhash64("id"))
        ).collect()
        reps.append(time.monotonic() - start)
    return round(min(reps), 4)


def _calibrate(spark) -> float:
    """32-way parallel probe (the r8-r10 normalization series)."""
    return _probe(spark, 1 << 30, 32)


def _calibrate_serial(spark) -> float:
    """1-partition probe — the contention sensor (r11)."""
    return _probe(spark, 1 << 26, 1)


HEADLINE = [
    "a01_pricing_summary",
    "e3_flagship_revenue_rollup",
    "j01_left_enrich_join",
    "j06_anti_join_new_work",
    "a05_explode_word_count",
    "w1_first_row_per_key",
    "st_sessionization",
    "st_tumbling_window_counts",
    "dedup_exact_hash",
    "dedup_minhash_lsh_pairs",
    "sim_cosine_topk_bruteforce",
    "text_token_stats",
    "text_fingerprint",
    "f08_multiformat_date_parse",
    "e3_website_pipeline",
    "u2_llm_enrich",
    "mm_image_features",
    "sim_ivf_topk",
    "e4_corpus_cleaning_pipeline",
    "dedup_cluster_components",
    "text_tfidf_top_terms",
    "e5_token_shard_packing",
    "w4_rolling_range_sum",
    "e6_dedup_corpus_rewrite",
    "text_chunk_windows",
    "v2_embedding_quantization",
    "ml_quality_classifier_score",
    "url_dedup_groups",
    "sk_hll_daily_uniques_rollup",
    "decon_embedding_contamination",
    "sql5_local_supplier_volume",
    "e8_curation_pipeline",
    "s10_warc_record_parse",
    "e9_acquisition_pipeline",
    "dedup_bloom_screen",
    "sql13_big_orders",
    "text_bigram_logprob",
    "e10_event_analytics_pipeline",
    "g1_pagerank_purchase_graph",
    "dedup_sorted_neighborhood",
    "s6_rest_datasource_scan",
    "e11_entity_resolution_pipeline",
    "ts2_linear_interpolation",
    "text_bm25_topk",
    "text_vocab_oov_rate",
    "dedup_repeated_ngram_spans",
    "text_hybrid_rrf_topk",
    "e13_span_dedup_rewrite",
    "e14_corpus_datasheet",
    "dedup_prefix_filter_jaccard",
    "text_bpe_top_merges",
    "g3_label_propagation",
    "text_phrase_search",
    "mb_association_rules",
    "text_pmi_bigrams",
    "j20_snapshot_diff_cdc",
    "t9_interval_islands",
    "sk_count_min_heavy_hitters",
    "g4_khop_reachability",
    "ml_psi_drift",
    "quality_token_budget_select",
    "e16_quality_canonical_rewrite",
    "i2_incremental_join_maintenance",
    "ev_session_paths",
    "g5_personalized_pagerank",
    "text_textrank_keywords",
    "e17_corpus_release_pipeline",
    "dedup_minhash_eval",
    "o15_dynamic_partition_pruning",
    "k8_time_travel_read",
    "sim_hard_negatives",
    "text_ngram_novelty",
    "text_readability",
    "ev_cusum_changepoint",
    "er_jaro_winkler_vocab",
    "ts5_dow_baseline_anomaly",
    "w9_session_window_tvf",
    "ml_feature_hashing",
    "sk_hll_daily_merge",
    # mm_image_dhash_near_dup / mm_audio_fingerprint_near_dup stay
    # gate-only: their runtime is dominated by the deterministic fake
    # fixture's length-degenerate hash density (many identical hashes
    # -> dense pair output), which benchmarks the fixture, not the
    # banded-join operator
]


def run_batch(names: list[str], sf_dir: str) -> dict:
    """Run one batch of headline queries in THIS process and return the
    per-query detail dict. Called in a fresh subprocess per batch by
    main(); callable directly (all names, batch_size=0) for the legacy
    single-process regime."""
    from mcyj_datapipeline_spark import registry
    from mcyj_datapipeline_spark.session import get_spark

    spark = get_spark(app_name="mcyj-bench")
    qs = registry.queries()
    # Warmup: JVM + codegen + parquet footer reads, plus the Python
    # worker pool (one trivial mapInPandas spawns the per-core workers
    # that the Arrow-path queries reuse — session overhead, not
    # per-operator cost).
    # warm up with a NON-headline query: warming a01 (first headline
    # entry) would make its reported "cold" time secretly warm
    qs["a06_distinct_sorted"](spark, sf_dir).count()
    spark.range(0, 1024, 1, spark.sparkContext.defaultParallelism).mapInPandas(
        lambda it: it, "id long"
    ).count()
    # Touch every table once (footer + page-cache warm): the first
    # query over a table otherwise pays its parquet bring-up inside the
    # timed "cold" number — session overhead, not that operator's cost.
    from mcyj_datapipeline_spark.io import read_table

    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        read_table(spark, sf_dir, t).count()
    if "ml_quality_classifier_score" in names:
        # Fit the train-once ML model fixture outside the timed loop:
        # the headline entry benchmarks SCORING (the per-batch path
        # that must scale); training is the one-time sampled job
        # registered separately as ml_quality_train.
        from mcyj_datapipeline_spark.registry_batch4 import _fitted_quality_model

        _fitted_quality_model(spark, sf_dir)
    # Warmup iteration: run every query of THIS batch once, untimed, at
    # the TARGET scale (standard benchmark practice — JMH-style). First
    # execution of a plan shape pays whole-stage-codegen compilation
    # and C2 JIT of the generated classes, and on this microVM host
    # that costs up to 10-30x the data-proportional time and lands
    # nondeterministically (compiler-queue contention). A smaller-SF
    # pre-pass does NOT absorb it — AQE picks different physical shapes
    # at different scales, so the at-scale codegen stays cold. The
    # timed pass below therefore measures steady-state execution of
    # each plan on the measured data — the engine, not the host's
    # compiler. Results are never reused: caches are cleared before
    # every timed run, and BENCH_DETAIL.json carries warm-min/spread
    # reps separately.
    for name in names:
        try:
            materialized_count(qs[name](spark, sf_dir))
        except Exception:
            pass  # warmup must never fail the bench
        spark.catalog.clearCache()
    _release_pinned_blocks(spark)
    # calibration AFTER warmup (codegen/JIT settled), BEFORE the timed
    # loop — measures this JVM's host-speed for drift normalization
    calib_sec = _calibrate(spark)
    calib_serial_sec = _calibrate_serial(spark)
    print(
        f"# calib: parallel {calib_sec:.4f}s (ref {CALIB_REF_SEC}) "
        f"serial {calib_serial_sec:.4f}s (ref {CALIB_SERIAL_REF_SEC})",
        file=sys.stderr,
    )

    timings: dict[str, float] = {}
    pass1: dict[str, float] = {}
    warm: dict[str, float] = {}
    warm_spread: dict[str, float] = {}
    all_reps: dict[str, list[float]] = {}
    all_gc: dict[str, list[int]] = {}
    warm_reps = int(os.environ.get("SPARK_GRAFT_WARM_REPS", "3"))
    for name in names:
        # 1 + WARM_REPS identical executions, caches cleared before
        # EACH (each query call persists its own intermediates —
        # signatures, CC labels — and CacheManager would otherwise let
        # later reps reuse them). The reported per-query number is the
        # MIN across the executions: the host shows random 5-25s
        # stalls (hypervisor-side, CPU near-idle during them) that
        # land on a different query every run, so any single-execution
        # number measures the hypervisor lottery, not the plan; the
        # min of identical full recomputations is the standard
        # noise-robust estimator and is reproducible run-to-run.
        # Pass-1-only timings are preserved in BENCH_DETAIL.json.
        reps = []
        rep_gc: list[int] = []
        gc_beans = (
            spark.sparkContext._jvm.java.lang.management.ManagementFactory
            .getGarbageCollectorMXBeans()
        )
        for _ in range(1 + warm_reps):
            spark.catalog.clearCache()
            # release checkpoint blocks + force a GC BETWEEN reps, not
            # just between queries: a rep otherwise inherits the prior
            # rep's pinned blocks and garbage, and the induced major GC
            # lands INSIDE the next timed window (observed as the
            # 14-18s warm spreads on the allocation-heavy iterative
            # queries in BENCH_r03 — same plan, no data change)
            _release_pinned_blocks(spark)
            gc0 = sum(b.getCollectionTime() for b in gc_beans)
            start = time.monotonic()
            n = materialized_count(qs[name](spark, sf_dir))
            reps.append(time.monotonic() - start)
            # in-rep GC wall per rep: separates heap churn from the
            # host's hypervisor-stall lottery when a rep balloons (a
            # 10s rep with 200ms GC is the HOST, not the plan)
            rep_gc.append(
                sum(b.getCollectionTime() for b in gc_beans) - gc0
            )
        pass1[name] = round(reps[0], 3)
        timings[name] = round(min(reps), 3)
        warm[name] = round(min(reps[1:]), 3)
        # Instability spread over WARM reps only (reps[1:]): pass-1 can
        # legitimately run >2x warm (JIT/codegen on heavier sfs) and is
        # already reported separately — folding it in would flag
        # cold-start delta as run-to-run variance.
        warm_spread[name] = round(max(reps[1:]) - min(reps[1:]), 3)
        all_reps[name] = [round(r, 3) for r in reps]
        all_gc[name] = rep_gc
        print(
            f"# {name}: min {timings[name]:.3f}s / pass1 {pass1[name]:.3f}s"
            f" spread {warm_spread[name]:.3f}s ({n} rows)",
            file=sys.stderr,
        )
    spark.stop()
    return {
        "queries": timings,
        "queries_pass1": pass1,
        "queries_warm": warm,
        "queries_warm_spread": warm_spread,
        "queries_reps": all_reps,
        "queries_rep_gc_ms": all_gc,
        "warm_reps": warm_reps,
        "calib_sec": calib_sec,
        "calib_serial_sec": calib_serial_sec,
    }


def _child_main() -> None:
    names = os.environ["SPARK_GRAFT_BENCH_NAMES"].split(",")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out = os.environ["SPARK_GRAFT_BENCH_OUT"]
    result = run_batch(names, sf_dir)
    with open(out, "w") as fh:
        json.dump(result, fh)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    batch_size = int(os.environ.get("SPARK_GRAFT_BENCH_BATCH_SIZE", "20"))

    if batch_size <= 0:
        parts = [run_batch(list(HEADLINE), sf_dir)]
        n_batches = 1
    else:
        batches = [
            HEADLINE[i : i + batch_size]
            for i in range(0, len(HEADLINE), batch_size)
        ]
        n_batches = len(batches)
        parts = []
        for bi, names in enumerate(batches):
            with tempfile.NamedTemporaryFile(
                mode="r", suffix=".json", prefix=f"bench_b{bi}_", delete=False
            ) as fh:
                out_path = fh.name
            env = dict(os.environ)
            env["SPARK_GRAFT_BENCH_NAMES"] = ",".join(names)
            env["SPARK_GRAFT_BENCH_OUT"] = out_path
            env["SPARK_GRAFT_BENCH_ROLE"] = "child"
            print(
                f"# batch {bi + 1}/{n_batches}: {len(names)} queries "
                f"in a fresh JVM",
                file=sys.stderr,
            )
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env,
                stdout=sys.stderr,  # children never write the machine line
            )
            if proc.returncode != 0:
                print(
                    f"# FATAL: batch {bi + 1} exited {proc.returncode}",
                    file=sys.stderr,
                )
                sys.exit(proc.returncode)
            with open(out_path) as rfh:
                parts.append(json.load(rfh))
            os.unlink(out_path)

    # Merge per-batch dicts (disjoint query sets — plain dict unions).
    merged: dict[str, dict] = {}
    for key in (
        "queries",
        "queries_pass1",
        "queries_warm",
        "queries_warm_spread",
        "queries_reps",
        "queries_rep_gc_ms",
    ):
        merged[key] = {}
        for p in parts:
            merged[key].update(p[key])
    timings = merged["queries"]
    warm = merged["queries_warm"]
    pass1 = merged["queries_pass1"]
    warm_spread = merged["queries_warm_spread"]
    all_reps = merged["queries_reps"]
    warm_reps = parts[0]["warm_reps"]

    # Drift normalization: each batch JVM's fixed CPU probe scales ITS
    # queries to the pinned reference host-speed (per-batch, because
    # the hypervisor's speed can move within one bench run).
    calib_secs = [p["calib_sec"] for p in parts]
    calib_serial_secs = [p.get("calib_serial_sec") for p in parts]
    normalized: dict[str, float] = {}
    for p in parts:
        factor = CALIB_REF_SEC / p["calib_sec"] if CALIB_REF_SEC else 1.0
        for qname, v in p["queries"].items():
            normalized[qname] = round(v * factor, 3)

    # Probe divergence (r11, VERDICT r10 #2): on an uncontended host
    # the two factors agree by construction of the serial ref. The
    # flag is DIRECTION-AWARE:
    #   positive (serial factor > parallel factor) = the 32-way probe
    #     slowed more than the 1-thread one — the r10 contention
    #     signature (co-tenant load steals cores; one thread still
    #     gets a core) — flagged at +20%;
    #   negative = the single thread slowed relative to the parallel
    #     probe, which quiet-host A/B showed is ordinary turbo/
    #     frequency jitter (r11 two-run baseline: -19%..+5% across 8
    #     batches with per-query numbers agreeing run-to-run) — only
    #     noted, at -30%, never flagged, or every bench would cry
    #     wolf and the flag would stop meaning "contended".
    calib_divergence: list[float] = []
    normalized_serial: dict[str, float] = {}
    for p in parts:
        cs = p.get("calib_serial_sec")
        if not (cs and CALIB_REF_SEC and CALIB_SERIAL_REF_SEC):
            continue
        f_par = CALIB_REF_SEC / p["calib_sec"]
        f_ser = CALIB_SERIAL_REF_SEC / cs
        calib_divergence.append(round(f_ser / f_par - 1.0, 4))
        for qname, v in p["queries"].items():
            normalized_serial[qname] = round(v * f_ser, 3)
    calib_divergent = any(d > 0.20 for d in calib_divergence)
    if calib_divergent:
        print(
            "# CALIB DIVERGENT: parallel probe slowed vs serial "
            f"({calib_divergence}) — host window contended, treat "
            "per-query deltas as suspect",
            file=sys.stderr,
        )
    elif any(d < -0.30 for d in calib_divergence):
        print(
            "# calib note: single-thread probe slow vs parallel "
            f"({calib_divergence}) — frequency jitter, not contention",
            file=sys.stderr,
        )

    total = round(sum(timings.values()), 3)
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    # Variance gate: min-of-N must never silently mask a record swing.
    # A query is flagged unstable when its WARM rep spread exceeds both
    # an absolute floor (2s) and HALF its own min — so a 3s swing on a
    # 3.5s query (BENCH_r04's g1) can't pass silently. Flags ride the
    # machine line so the per-round artifact carries the warning.
    unstable = {
        name: warm_spread[name]
        for name in HEADLINE
        if warm_spread[name] > max(2.0, 0.5 * timings[name])
    }
    for name, s in unstable.items():
        print(
            f"# UNSTABLE: {name} spread {s:.3f}s vs min "
            f"{timings[name]:.3f}s — reps {all_reps[name]}",
            file=sys.stderr,
        )
    # stdout carries ONE COMPACT machine line: the driver captures only a
    # bounded stdout tail (round 2's line with three 34-entry dicts
    # outgrew it -> "parsed": null), so warm/spread per-query detail goes
    # to a sidecar file + stderr instead. `queries` values are
    # STEADY-STATE MINIMA over 1+warm_reps cleared-cache executions
    # (regime key says so explicitly); the cold first-execution total is
    # reported alongside so neither regime can be mistaken for the other,
    # with per-query cold numbers in BENCH_DETAIL.json.
    machine_line = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "regime": (
            f"steady_min_of_{1 + warm_reps}"
            f"_batched{batch_size}x{n_batches}"
        ),
        "queries": timings,
        "total_warm": round(sum(warm.values()), 3),
        "total_cold_pass1": round(sum(pass1.values()), 3),
        "unstable": unstable,
        "sf": sf_val,
        # drift calibration: fixed CPU probe per batch JVM vs pinned ref
        # (CALIB_REF_SEC); value_normalized is the cross-round number
        "calib": {
            "ref_sec": CALIB_REF_SEC,
            "batch_sec": calib_secs,
            "factor_median": round(
                sorted(
                    CALIB_REF_SEC / c if CALIB_REF_SEC else 1.0
                    for c in calib_secs
                )[len(calib_secs) // 2],
                4,
            ),
            "serial_ref_sec": CALIB_SERIAL_REF_SEC,
            "serial_batch_sec": calib_serial_secs,
            "divergence": calib_divergence,
        },
        "calib_divergent": calib_divergent,
        "value_normalized": round(sum(normalized.values()), 3),
    }
    detail = dict(
        machine_line,
        queries_normalized=normalized,
        # serial-probe normalization, detail-only: the A/B record the
        # divergence flag summarizes (parallel stays the headline
        # series — the query mix is itself 32-way parallel)
        queries_normalized_serial=normalized_serial,
        value_normalized_serial=round(sum(normalized_serial.values()), 3),
        **merged,
        warm_reps=warm_reps,
        batch_size=batch_size,
        n_batches=n_batches,
        cpus=os.environ.get("SPARK_GRAFT_CPUS", ""),
    )
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    with open(detail_path, "w") as fh:
        json.dump(detail, fh, indent=1)
    print(json.dumps(detail, indent=1), file=sys.stderr)
    print(json.dumps(machine_line, separators=(",", ":")))


if __name__ == "__main__":
    if os.environ.get("SPARK_GRAFT_BENCH_ROLE") == "child":
        _child_main()
    else:
        main()
