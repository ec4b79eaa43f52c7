#!/usr/bin/env python3
"""Generate a k×-scaled copy of a testdata sf directory for SCALING
PROBES (VERDICT r6 "next round" #3) — /root/testdata is read-only, so
the scaled set lands inside the repo (gitignored).

NOT a re-implementation of the driver's generator: each fact table is
k deterministic copies of the source with every key column shifted by
copy_index * domain_size, so all foreign-key relationships (orders →
customer, lineitem → orders/part/supplier) hold across copies and key
cardinalities grow k× like a real scale-up. Dims (region, nation) stay
fixed, as in TPC-H. Two content perturbations keep WORKLOAD SHAPE
honest at scale:

- ``documents.text``: copies >0 are Caesar-shifted (letters rotated by
  the copy index). Identical lengths/token structure, but NO shingle
  overlap across copies — naive replication would make every document
  a 10-way near-duplicate and blow the MinHash/LSH pair count ~k²,
  measuring the fixture instead of the operator. Within-copy duplicate
  rates (what dedup actually measures) are preserved exactly.
- ``embeddings.embedding``: copies >0 get deterministic per-copy
  Gaussian jitter (σ=0.02, seed=42+copy) so vectors spread instead of
  stacking k deep on identical points (which would degenerate IVF/LSH
  bucket balance).

Timestamps pass through pyarrow untouched, so the events table keeps
its TIMESTAMP(NANOS) physical type and io.read_table's nanosAsLong
path behaves identically on generated dirs.

Usage: python tools/gen_scaled_data.py [--src /root/testdata/sf0.1]
       [--factor 10] [--out testdata_sf1]
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

DIMS = ("region", "nation")
FACTS = (
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# key column -> key domain (columns sharing a domain shift together so
# FK joins stay consistent across copies)
DOMAIN_OF = {
    "c_custkey": "cust",
    "o_custkey": "cust",
    "o_orderkey": "ord",
    "l_orderkey": "ord",
    "s_suppkey": "supp",
    "l_suppkey": "supp",
    "p_partkey": "part",
    "l_partkey": "part",
    "event_id": "evt",
    "user_id": "user",
    "doc_id": "doc",
    "vec_id": "vec",
}


def _caesar(text_arr: pa.ChunkedArray, shift: int) -> pa.Array:
    """Letter-rotate a string column by ``shift`` (vectorized via
    bytes-level translate on the utf8 storage — the source corpus is
    ASCII by construction)."""
    lower = "abcdefghijklmnopqrstuvwxyz"
    upper = lower.upper()
    k = shift % 26
    table = str.maketrans(
        lower + upper, lower[k:] + lower[:k] + upper[k:] + upper[:k]
    )
    py = text_arr.to_pylist()
    return pa.array(
        [None if s is None else s.translate(table) for s in py],
        type=pa.string(),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument(
        "--out",
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "testdata_sf1",
        ),
    )
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    # domain sizes from the source (max key + 1 → shift stride)
    stride: dict[str, int] = {}
    for t in FACTS:
        tbl = pq.read_table(os.path.join(args.src, f"{t}.parquet"))
        for col in tbl.column_names:
            dom = DOMAIN_OF.get(col)
            if dom is not None:
                mx = pc.max(tbl[col]).as_py() or 0
                stride[dom] = max(stride.get(dom, 0), int(mx) + 1)

    for t in DIMS:
        src = os.path.join(args.src, f"{t}.parquet")
        pq.write_table(
            pq.read_table(src), os.path.join(args.out, f"{t}.parquet"),
            compression="zstd",
        )
        print(f"{t}: copied dim")

    for t in FACTS:
        src = pq.read_table(os.path.join(args.src, f"{t}.parquet"))
        copies = []
        for i in range(args.factor):
            cols = []
            for name in src.column_names:
                col = src[name]
                dom = DOMAIN_OF.get(name)
                if dom is not None and i > 0:
                    col = pc.add(col, i * stride[dom])
                    col = col.cast(src.schema.field(name).type)
                elif t == "documents" and name == "text" and i > 0:
                    col = _caesar(col, i)
                elif t == "embeddings" and name == "embedding" and i > 0:
                    rng = np.random.default_rng(42 + i)
                    lists = col.to_pylist()
                    jittered = [
                        None
                        if v is None
                        else (
                            np.asarray(v, dtype=np.float32)
                            + rng.normal(0, 0.02, len(v)).astype(np.float32)
                        ).tolist()
                        for v in lists
                    ]
                    col = pa.array(jittered, type=src.schema.field(name).type)
                cols.append(col)
            copies.append(pa.table(cols, schema=src.schema))
        out_tbl = pa.concat_tables(copies)
        pq.write_table(
            out_tbl,
            os.path.join(args.out, f"{t}.parquet"),
            compression="zstd",
        )
        print(f"{t}: {src.num_rows} -> {out_tbl.num_rows} rows")


if __name__ == "__main__":
    main()
