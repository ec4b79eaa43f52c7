#!/usr/bin/env python3
"""Generate a SKEWED variant of a testdata sf directory for the skew
stress probe (VERDICT r7 "next round" #2).

The scaled/base corpora are near-uniform on their join/group keys, so
the salting and AQE-skew machinery (`operators/skew.py`,
`j15_salted_skew_join`, `skew_salted_*`) has only ever been
correctness-proven, never stress-proven. This tool rewrites the two
highest-fanout key columns so ONE hot key holds ``--hot-frac`` (~40%)
of the rows:

- ``lineitem.l_orderkey``: every k-th-bucket row is reassigned to the
  MINIMUM existing order key — still a valid FK into orders, so every
  join in the registry keeps its semantics; the hot order simply has
  ~240k line items at sf0.1 instead of ~4.
- ``events.user_id``: same treatment — one hot user emitting ~40% of
  all events (the bot-traffic shape that breaks sessionization and
  per-user windows in production).

Reassignment is deterministic (row_index % stride < hot_buckets), no
RNG, so probe runs are reproducible bit-for-bit. All other tables are
copied verbatim.

Usage: python tools/gen_skewed_data.py [--src /root/testdata/sf0.1]
       [--out testdata_sf0.1_skew] [--hot-frac 0.4]
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

SKEW_COLS = {"lineitem": "l_orderkey", "events": "user_id"}


def _skew(tbl: pa.Table, key: str, hot_frac: float) -> pa.Table:
    hot = pc.min(tbl[key]).as_py()
    n = tbl.num_rows
    # deterministic bucket mask: stride of 100 buckets, first
    # round(hot_frac*100) of them become the hot key
    hot_buckets = int(round(hot_frac * 100))
    mask = (np.arange(n) % 100) < hot_buckets
    col = tbl[key].to_numpy(zero_copy_only=False).copy()
    col[mask] = hot
    idx = tbl.column_names.index(key)
    new = pa.array(col, type=tbl.schema.field(key).type)
    out = tbl.set_column(idx, tbl.schema.field(key), new)
    print(
        f"  hot key {hot!r}: {int(mask.sum())}/{n} rows "
        f"({mask.sum() / n:.0%})"
    )
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--out",
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "testdata_sf0.1_skew",
        ),
    )
    ap.add_argument("--hot-frac", type=float, default=0.4)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    for t in TABLES:
        tbl = pq.read_table(os.path.join(args.src, f"{t}.parquet"))
        if t in SKEW_COLS:
            print(f"{t}: skewing {SKEW_COLS[t]}")
            tbl = _skew(tbl, SKEW_COLS[t], args.hot_frac)
        # Small row groups matter for the probe's realism: AQE's skew
        # split can only cut a skewed reduce partition at MAP-OUTPUT
        # boundaries, and parquet splits no finer than a row group — a
        # single-row-group fact file collapses to ONE mapper, making
        # the hot partition structurally unsplittable however skewed
        # its bytes (observed r9: isSkewed=true, createSkewPartitionSpecs
        # =None). A 100 TB fact table has thousands of row groups;
        # 64k-row groups give this fixture the same many-mapper shape.
        pq.write_table(
            tbl,
            os.path.join(args.out, f"{t}.parquet"),
            compression="zstd",
            row_group_size=64 * 1024,
        )
        print(f"{t}: {tbl.num_rows} rows written")


if __name__ == "__main__":
    main()
