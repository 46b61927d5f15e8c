#!/bin/bash
# Final round-4 perf validation: bench with scan unroll=4 adopted
# (flagship + moist3d + ensemble recompile), then a last smoke.
set -u
cd "$(dirname "$0")/.."
while ! grep -q "CHAIN8 COMPLETE" jw06_chain8_driver.log 2>/dev/null; do
  sleep 120
done
echo "=== bench (unroll) start $(date +%H:%M:%S) ==="
timeout 5400 python bench.py 2>&1 | grep -v Platform > bench_r4_unroll.log
echo "bench rc=$? done $(date +%H:%M:%S)"
echo "=== smoke final start $(date +%H:%M:%S) ==="
timeout 2400 make tpu-smoke 2>&1 | grep -v Platform > tpu_smoke_r4c.log
echo "smoke rc=$? done $(date +%H:%M:%S)"
echo "CHAIN7 COMPLETE $(date +%H:%M:%S)"
