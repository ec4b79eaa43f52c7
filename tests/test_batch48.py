"""Batch 48 semantics: greedy-chain funnel reach (oracle parity runs
in test_oracle_parity)."""

from __future__ import annotations

import datetime
import unittest.mock as mock

import mcyj_datapipeline_spark.registry_batch48 as B
from mcyj_datapipeline_spark.registry_batch48 import ev_funnel_reach


def _ev(spark, rows):
    return spark.createDataFrame(
        [
            (i, datetime.datetime(2024, 1, 1, 0, 0, s), u, t, v)
            for i, (s, u, t, v) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double",
    )


def test_funnel_requires_strict_order(spark):
    rows = [
        # u1 completes the whole funnel in order
        (1, 1, "signup", 0.0),
        (2, 1, "view", 0.0),
        (3, 1, "click", 0.0),
        (4, 1, "purchase", 1.0),
        # u2 views BEFORE signing up -> stops at signup
        (1, 2, "view", 0.0),
        (2, 2, "signup", 0.0),
        # u3 signup+view but clicks before viewing -> stops at view
        (1, 3, "signup", 0.0),
        (2, 3, "click", 0.0),
        (3, 3, "view", 0.0),
        # u4 never signs up -> not in the funnel at all
        (1, 4, "view", 0.0),
        (2, 4, "purchase", 9.0),
    ]
    with mock.patch.object(B, "_t", lambda s, d, n: _ev(spark, rows)):
        got = {
            r["step"]: (r["n_users"], r["conv_from_prev"])
            for r in ev_funnel_reach(spark, "unused").collect()
        }
    assert got["signup"] == (3, 1.0)
    assert got["view"] == (2, round(2 / 3, 6))
    assert got["click"] == (1, 0.5)
    assert got["purchase"] == (1, 1.0)


def test_funnel_counts_monotone_on_testdata(spark, sf_dir):
    rows = ev_funnel_reach(spark, sf_dir).collect()
    ns = [r["n_users"] for r in sorted(rows, key=lambda r: r["step_no"])]
    assert ns == sorted(ns, reverse=True)
    assert all(0 < r["conv_from_prev"] <= 1.0 for r in rows)
