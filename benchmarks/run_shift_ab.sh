#!/bin/bash
# Round-4 shift-executor A/B driver (VERDICT r3 item 1).  One subprocess per
# impl (HYGRID_RESAMPLE_IMPL is trace-time), all stages batched per process
# so each TPU tunnel compile burst is amortised.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/shift_ab.jsonl}
: > "$OUT"
for impl in shift periodic onehot; do
  echo "=== impl=$impl ===" >> "$OUT"
  timeout 1800 python benchmarks/shift_ab.py "$impl" check legs resample4k mosaic video >> "$OUT" 2>&1
  echo "--- exit=$? ---" >> "$OUT"
done
echo "=== northstar auto (shift routed) ===" >> "$OUT"
timeout 1800 python benchmarks/shift_ab.py auto northstar >> "$OUT" 2>&1
echo "DONE" >> "$OUT"
