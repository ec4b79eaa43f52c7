"""Shared deterministic hashing primitives for dedup / similarity.

The hash is defined as the first 15 hex chars of md5, read as a base-16
integer (60 bits, fits signed int64 in both engines). This exact
construction is reproducible in ANSI SQL (DuckDB:
``('0x' || substr(md5(s), 1, 15))::BIGINT``), which is what lets the
MinHash/SimHash pipelines be verified against a SQL oracle instead of
being trusted as "probably right" — xxhash64 etc. would be faster but
engine-private.
"""

from __future__ import annotations

import random

from pyspark.sql import Column
from pyspark.sql import functions as F

# Mersenne prime 2^31 - 1; universal-hash family (a*x + b) mod P with
# x, a, b < P keeps every product below 2^62 (no int64 overflow in
# either engine).
MINHASH_PRIME = 2_147_483_647

_rng = random.Random(42)
NUM_PERMUTATIONS = 16
MINHASH_PERMS: list[tuple[int, int]] = [
    (_rng.randrange(1, MINHASH_PRIME), _rng.randrange(0, MINHASH_PRIME))
    for _ in range(NUM_PERMUTATIONS)
]

LSH_BANDS = 4
LSH_ROWS_PER_BAND = NUM_PERMUTATIONS // LSH_BANDS


def hash60(col: Column) -> Column:
    """60-bit integer hash of a string, identical across Spark and DuckDB."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def hash60_sql(expr: str) -> str:
    """DuckDB rendering of :func:`hash60` for oracle queries."""
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"


def count_hash60_in_plan(plan: str) -> int:
    """How many times the :func:`hash60` subtree appears in an
    optimized-plan string — the repo-owned anchor for plan-shape
    regression pins (tests must not count bare ``md5`` tokens, which
    couples them to unrelated uses of md5 and to Catalyst's
    rendering). Owned HERE so a change to the hash60 implementation
    updates the marker in the same commit."""
    import re

    # conv(substring(md5(...), 1, 15), 16, 10) — match the stable
    # head of the subtree; arguments/casts render differently across
    # Spark versions but the function nesting is the construction
    # itself.
    return len(re.findall(r"conv\(substring\(md5\(", plan))
