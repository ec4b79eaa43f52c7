#!/usr/bin/env python3
"""Regenerate the registered-queries table in COVERAGE.md from the
live registry. Usage: python tools/gen_coverage.py"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mcyj_datapipeline_spark import registry  # noqa: E402

MARK = "## Registered queries (driver-checked)"


def main() -> None:
    registry.load_all()  # raw _REGISTRY reads need the full registry
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "COVERAGE.md")
    old = open(path).read()
    head, _, tail = old.partition(MARK)
    table_end = tail.index("\n\n## §2 line items")
    rows = ["", "", "| query | check | covers |", "|---|---|---|"]
    for name, (_, sql, desc) in sorted(registry._REGISTRY.items()):
        kind = "oracle" if sql else "rows-only"
        # escape literal pipes in descriptions (|A∩B| etc.) — raw pipes
        # split the markdown row into phantom columns
        safe_desc = " ".join(desc.split()).replace("|", "\\|")
        rows.append(f"| `{name}` | {kind} | {safe_desc} |")
    open(path, "w").write(head + MARK + "\n".join(rows) + tail[table_end:])
    n = len(registry._REGISTRY)
    n_oracle = sum(1 for _, (f, s, d) in registry._REGISTRY.items() if s)
    print(f"COVERAGE.md regenerated: {n} queries, {n_oracle} with oracles")


if __name__ == "__main__":
    main()
