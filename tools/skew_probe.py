#!/usr/bin/env python3
"""Skew stress probe (VERDICT r7 "next round" #2): measure the
join/window-heavy queries on the skewed sf0.1 variant produced by
``tools/gen_skewed_data.py`` (one hot key = 40% of lineitem/events
rows) and prove the two skew valves ENGAGE:

1. AQE skew-join split — the plain lineitem x orders join is run on
   the skewed data with the skew-split thresholds lowered to
   test-scale (1 MB; the 256 MB defaults are cluster numbers — a 240k
   row hot partition at sf0.1 is ~20 MB, relatively as skewed as a
   40% hot key at 100 TB). The probe asserts ``skew=true`` appears in
   the executed adaptive plan and records wall time with the valve on
   vs OFF (spark.sql.adaptive.skewJoin.enabled=false).
2. Salting — `salted_join` / `salted_collect_set` vs their plain
   twins on the hot key, wall time plus the max single-group row
   count (the metric that decides whether one task's state explodes
   on a real cluster).

Registry queries are timed bench-style (materialized_count, min of
reps, cache cleared between) at BOTH the base sf0.1 and the skewed
variant, so the committed table shows how each plan degrades under a
hot key — sublinear degradation + engaged valves is the pass
criterion, not any absolute number.

Usage:
    python tools/skew_probe.py [--skew-dir testdata_sf0.1_skew]
        [--base-dir /root/testdata/sf0.1] [--reps 2]
        [--out evidence/SKEW_PROBE_r8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

QUERIES = [
    # join-heavy TPC-H shapes on the skewed fact keys
    "sql5_local_supplier_volume",
    "sql18_returned_topk",
    "sql13_big_orders",
    # event pipelines grouping/windowing on the hot user
    "e10_event_analytics_pipeline",
    "w4_rolling_range_sum",
    "t_asof_join",
    "ev_session_paths",
    "st_sessionization",
    # the dedicated skew forms
    "j15_salted_skew_join",
    "skew_salted_group_count",
    "skew_salted_collect_set",
    # iterative graph over the hot-user purchase edges
    "g1_pagerank_purchase_graph",
]


def _timed(fn, reps: int) -> float:
    best = None
    for _ in range(reps):
        t0 = time.monotonic()
        fn()
        el = time.monotonic() - t0
        best = el if best is None else min(best, el)
    return round(best, 3)


def time_registry(spark, qs, sf_dir: str, reps: int) -> dict[str, float]:
    from bench import materialized_count

    out = {}
    for name in QUERIES:
        fn = qs[name]
        materialized_count(fn(spark, sf_dir))  # warm (codegen/JIT)
        spark.catalog.clearCache()
        out[name] = _timed(
            lambda: materialized_count(fn(spark, sf_dir)), reps
        )
        spark.catalog.clearCache()
        print(f"# {sf_dir}: {name} {out[name]}s", file=sys.stderr)
    return out


def ab_join(spark, skew_dir: str, reps: int) -> dict:
    """Plain join vs AQE-skew-split vs salted_join on the hot order
    key, identical outputs by construction."""
    from bench import materialized_count
    from mcyj_datapipeline_spark.io import read_table
    from mcyj_datapipeline_spark.operators import skew as SK

    li = read_table(spark, skew_dir, "lineitem")
    orders = read_table(spark, skew_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )

    def agg(joined, exact: bool = False):
        # the timed form rounds (display/r8 parity); the equality check
        # reads the UNROUNDED sum so ulp-level order-of-addition drift
        # can be compared with a tolerance instead of being amplified
        # into a half-cent flip by round(x, 2)
        total = F.sum("l_extendedprice")
        return joined.groupBy(
            F.col("o_orderpriority").alias("priority")
        ).agg(
            F.count(F.lit(1)).alias("n_items"),
            (total if exact else F.round(total, 2)).alias("sum_price"),
        )

    def plain(exact: bool = False):
        return agg(li.join(orders, "l_orderkey"), exact)

    def salted(exact: bool = False):
        return agg(
            SK.salted_join(li, orders, "l_orderkey", "l_linenumber"), exact
        )

    res: dict = {}
    # broadcast would hide the shuffle skew entirely (orders at sf0.1
    # fits); disable it for the A/B so the probe exercises the
    # shuffle-join path a 100 TB orders table would be forced onto
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
        "spark.sql.adaptive.autoBroadcastJoinThreshold", "-1"
    )
    # test-scale skew thresholds (defaults are 256 MB cluster numbers)
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "1MB",
    )
    spark.conf.set(
        "spark.sql.adaptive.advisoryPartitionSizeInBytes", "1MB"
    )
    try:
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        materialized_count(plain())
        res["plain_join_skewvalve_off_sec"] = _timed(
            lambda: materialized_count(plain()), reps
        )

        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        df = plain()
        # execute df's OWN QueryExecution: materialized_count builds a
        # separate one (df.agg(...)), whose finalized adaptive plan
        # never attaches back to df — reading df's plan after only a
        # materialized_count captures the pre-execution initial plan
        # with no skew markers (r9 root cause of a false negative)
        df.collect()
        res["plain_join_skewvalve_on_sec"] = _timed(
            lambda: materialized_count(plain()), reps
        )
        # the executed ADAPTIVE plan must show the valve engaged
        final_plan = df._jdf.queryExecution().executedPlan().toString()
        res["aqe_skew_split_engaged"] = "skew=true" in final_plan

        materialized_count(salted())
        res["salted_join_sec"] = _timed(
            lambda: materialized_count(salted()), reps
        )
        # identical results — but compare the SUM float-tolerantly:
        # the two plans add l_extendedprice in different shuffle
        # orders, so an ulp-level difference at a rounding boundary
        # must not abort the probe (r9 review; round(x, 2) amplified
        # ulp drift into a half-cent flip)
        import math

        a = sorted(map(tuple, plain(exact=True).collect()))
        b = sorted(map(tuple, salted(exact=True).collect()))
        res["salted_equals_plain"] = len(a) == len(b) and all(
            ra[0] == rb[0]
            and ra[1] == rb[1]
            and math.isclose(ra[2], rb[2], rel_tol=1e-9, abs_tol=1e-6)
            for ra, rb in zip(a, b)
        )
    finally:
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.enabled",
        ):
            spark.conf.unset(k)
    return res


def ab_holistic(spark, skew_dir: str, reps: int) -> dict:
    """Plain vs salted collect_set of event ids per user — the
    holistic aggregate one hot user (40% of events) breaks: partial
    aggregation cannot bound the hot key's set state."""
    from bench import materialized_count
    from mcyj_datapipeline_spark.io import read_table
    from mcyj_datapipeline_spark.operators.skew import (
        deterministic_salt,
        salted_collect_set,
    )

    ev = read_table(spark, skew_dir, "events").select(
        F.col("user_id"), F.col("event_id").cast("string").alias("eid")
    )

    def plain():
        return ev.groupBy("user_id").agg(
            F.array_sort(F.collect_set("eid")).alias("values")
        )

    def salted():
        return salted_collect_set(ev, "user_id", "eid")

    res: dict = {}
    materialized_count(plain())
    res["plain_collect_set_sec"] = _timed(
        lambda: materialized_count(plain()), reps
    )
    materialized_count(salted())
    res["salted_collect_set_sec"] = _timed(
        lambda: materialized_count(salted()), reps
    )
    # the metric that matters on a real cluster: max rows any single
    # aggregation group holds (one task's state). Deterministic.
    res["plain_max_group_rows"] = ev.groupBy("user_id").count().agg(
        F.max("count")
    ).collect()[0][0]
    res["salted_max_group_rows"] = (
        ev.select(
            "user_id", deterministic_salt(F.col("eid"), 16).alias("_s")
        )
        .groupBy("user_id", "_s")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    return res


def main() -> None:
    ap = argparse.ArgumentParser()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ap.add_argument(
        "--skew-dir", default=os.path.join(repo, "testdata_sf0.1_skew")
    )
    ap.add_argument("--base-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument(
        "--out", default=os.path.join(repo, "evidence", "SKEW_PROBE_r8")
    )
    args = ap.parse_args()

    from mcyj_datapipeline_spark import registry
    from mcyj_datapipeline_spark.session import get_spark

    spark = get_spark(app_name="skew-probe")
    qs = registry.queries()

    base = time_registry(spark, qs, args.base_dir, args.reps)
    skew = time_registry(spark, qs, args.skew_dir, args.reps)
    join_ab = ab_join(spark, args.skew_dir, args.reps)
    hol_ab = ab_holistic(spark, args.skew_dir, args.reps)

    result = {
        "base_dir": args.base_dir,
        "skew_dir": args.skew_dir,
        "reps": args.reps,
        "queries_base_sec": base,
        "queries_skew_sec": skew,
        "join_ab": join_ab,
        "holistic_ab": hol_ab,
    }
    with open(args.out + ".json", "w") as fh:
        json.dump(result, fh, indent=1)

    lines = [
        "| query | base sf0.1 s | skew sf0.1 s | ratio |",
        "| --- | --- | --- | --- |",
    ]
    for name in QUERIES:
        r = skew[name] / base[name] if base[name] else float("nan")
        lines.append(
            f"| `{name}` | {base[name]:.2f} | {skew[name]:.2f} "
            f"| {r:.2f}x |"
        )
    lines += [
        "",
        "A/B on the skewed data (hot order key = 40% of lineitem):",
        "",
        f"- plain join, skew valve OFF: "
        f"{join_ab['plain_join_skewvalve_off_sec']} s",
        f"- plain join, AQE skew split ON: "
        f"{join_ab['plain_join_skewvalve_on_sec']} s "
        f"(engaged: {join_ab['aqe_skew_split_engaged']})",
        f"- salted_join (n_salt=8): {join_ab['salted_join_sec']} s "
        f"(identical rows: {join_ab['salted_equals_plain']})",
        "",
        "Holistic aggregate on the hot user (40% of events):",
        "",
        f"- plain collect_set: {hol_ab['plain_collect_set_sec']} s, "
        f"max single-group rows {hol_ab['plain_max_group_rows']}",
        f"- salted collect_set (16 salts): "
        f"{hol_ab['salted_collect_set_sec']} s, "
        f"max single-group rows {hol_ab['salted_max_group_rows']}",
    ]
    with open(args.out + "_table.md", "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print("\n".join(lines))

    # the probe's whole point is proving the valves ENGAGE — a run
    # where the AQE skew split never fired (or salting diverged) must
    # not be committable as a passing probe (ADVICE r8)
    failures = []
    if not join_ab["aqe_skew_split_engaged"]:
        failures.append("AQE skew split did not engage (skew=true absent)")
    if not join_ab["salted_equals_plain"]:
        failures.append("salted_join rows != plain join rows")
    if failures:
        print("SKEW PROBE FAILED: " + "; ".join(failures), file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
