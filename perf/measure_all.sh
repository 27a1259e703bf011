#!/bin/bash
# Full TPU measurement battery (run as the ONLY JAX process).
# Usage: bash perf/measure_all.sh [outdir]
set -u
OUT=${1:-/tmp/measure_r3}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."
run() {
  name=$1; shift
  echo "=== $name: $* ==="
  timeout 1800 "$@" > "$OUT/$name.log" 2>&1
  echo "rc=$? $(tail -1 "$OUT/$name.log")"
}
run headline      python bench.py
run headline_1080p python bench.py 1080p
run headline_fuse python bench.py fused
run headline_qrow python bench.py qrow
run headline_a8   python bench.py a8
run headline_batch python bench.py batched
run passes        python perf/pass_breakdown.py
run qrow_ab       python perf/qrow_ab.py
run big           python bench.py big
run big_fused     python bench.py big fused
run big_rebraid   python bench.py big rebraid4
run city          python bench.py city
run city_tlas     python bench.py city tlas
run city_rebraid  python bench.py city rebraid4
run city_tlas_rb  python bench.py city tlas rebraid4
echo "=== summary ==="
grep -h '"metric"' "$OUT"/*.log 2>/dev/null
