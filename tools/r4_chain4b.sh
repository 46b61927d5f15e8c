#!/bin/bash
set -u
cd "$(dirname "$0")/.."
while ! grep -q "SWEEP9 COMPLETE" tc_sweep9_driver.log 2>/dev/null; do
  sleep 120
done
echo "=== scan-carry probe start $(date +%H:%M:%S) ==="
timeout 3600 python tools/probe_scan_carry.py 2>&1 | grep -v Platform > perf_scan_carry_r4.log
echo "=== scan-carry probe done $(date +%H:%M:%S) ==="
echo "CHAIN4B COMPLETE $(date +%H:%M:%S)"
