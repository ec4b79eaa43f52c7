#!/usr/bin/env bash
# End-of-round evidence ritual. Usage: tools/snapshot_round.sh <round>
#
# Produces, and REFUSES to succeed without:
#   GATE_r<round>.log          — full 240-oracle gate at sf0.01 (non-empty,
#                                must end in the "oracles match" summary)
#   SPOT_r<round>_a.log        — seeded spot-audit, seed=<round>
#   SPOT_r<round>_b.log        — seeded spot-audit, seed=<round>+100
#
# Round 4 shipped a 0-byte GATE log because `tee` ran but the gate was
# interrupted; every artifact here is size- and content-checked so an
# empty or truncated log fails the snapshot instead of landing in git.
set -euo pipefail
cd "$(dirname "$0")/.."

round="${1:?usage: tools/snapshot_round.sh <round-number>}"
gate="GATE_r${round}.log"
spot_a="SPOT_r${round}_a.log"
spot_b="SPOT_r${round}_b.log"

# COVERAGE.md regenerates from the live registry first, so the
# committed snapshot can never under-report the query table (round-5
# drift: 3 late-added queries missing). The row-count check is belt
# and braces against a partial write.
python tools/gen_coverage.py
python - <<'EOF'
import re, sys
sys.path.insert(0, ".")
from mcyj_datapipeline_spark import registry
registry.load_all()  # raw _REGISTRY reads need the full registry (r9)
text = open("COVERAGE.md").read()
section = text.split("## Registered queries (driver-checked)", 1)[1]
section = section.split("\n## ", 1)[0]
table_rows = len(re.findall(r"^\| `", section, re.M))
want = len(registry._REGISTRY)
assert table_rows == want, f"COVERAGE.md table {table_rows} != registry {want}"
print(f"COVERAGE.md table matches registry: {want} rows")
EOF

python tools/check_driver_gate.py /root/testdata/sf0.01 2>&1 | tee "$gate"
test -s "$gate" || { echo "FATAL: $gate is empty"; exit 1; }
grep -q "oracles match" "$gate" || {
    echo "FATAL: $gate has no summary line — gate did not finish"; exit 1; }

python tools/check_driver_gate.py /root/testdata/sf0.01 \
    --sample 40 --seed "$round" 2>&1 | tee "$spot_a"
python tools/check_driver_gate.py /root/testdata/sf0.01 \
    --sample 40 --seed "$((round + 100))" 2>&1 | tee "$spot_b"
for f in "$spot_a" "$spot_b"; do
    test -s "$f" || { echo "FATAL: $f is empty"; exit 1; }
    grep -q "oracles match" "$f" || {
        echo "FATAL: $f has no summary line"; exit 1; }
done

# FULL-REGISTRY sf0.1 gate (round 7+, VERDICT r6 #2): every oracle at
# 10x the driver's scale, not just the scale-sensitive families — a
# contract that only slips at bigger data (rounding at larger sums,
# bucket boundaries, skew) has nowhere to hide. ~15-20 min.
gate_sf01="GATE_r${round}_sf01.log"
python tools/check_driver_gate.py /root/testdata/sf0.1 2>&1 | tee "$gate_sf01"
test -s "$gate_sf01" || { echo "FATAL: $gate_sf01 is empty"; exit 1; }
grep -q "oracles match" "$gate_sf01" || {
    echo "FATAL: $gate_sf01 has no summary line"; exit 1; }

# Full-registry partition-invariance audit: same plan under a hostile
# shuffle layout (5 partitions, AQE off) must produce identical rows.
pinv="PINV_r${round}.log"
python tools/check_partition_invariance.py /root/testdata/sf0.01 \
    2>&1 | tee "$pinv"
test -s "$pinv" || { echo "FATAL: $pinv is empty"; exit 1; }
grep -q "invariant" "$pinv" || {
    echo "FATAL: $pinv has no summary line"; exit 1; }

echo "snapshot OK: $gate $spot_a $spot_b $gate_sf01 $pinv"
