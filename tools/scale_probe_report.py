#!/usr/bin/env python3
"""Emit the sf0.1 → sf1 scaling table for SCALE.md from two bench-child
output JSONs (see tools/gen_scaled_data.py for the sf1 corpus).

Exponent = log(t_sf1 / t_sf01) / log(10): 1.0 = linear in data volume,
<1 sublinear (fixed overheads amortizing, sub-quadratic candidate
generation holding), >1 superlinear (a contract slip — investigate).

Usage: python tools/scale_probe_report.py /tmp/probe_sf01.json /tmp/probe_sf1.json
"""

from __future__ import annotations

import json
import math
import sys


def main() -> None:
    a = json.load(open(sys.argv[1]))["queries"]
    b = json.load(open(sys.argv[2]))["queries"]
    print("| query | sf0.1 s | sf1 s | ratio | exponent |")
    print("| --- | --- | --- | --- | --- |")
    for name in a:
        r = b[name] / a[name]
        exp = math.log10(r)
        print(
            f"| `{name}` | {a[name]:.2f} | {b[name]:.2f} "
            f"| {r:.2f}x | {exp:.2f} |"
        )


if __name__ == "__main__":
    main()
