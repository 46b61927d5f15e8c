#!/bin/bash
# Round-4 chain 4: moist scan-gap forensics (after JW06 chain 3).
set -u
cd "$(dirname "$0")/.."
while ! grep -q "CHAIN3 COMPLETE" jw06_chain3_driver.log 2>/dev/null; do
  sleep 120
done
echo "=== fine profile v2 start $(date +%H:%M:%S) ==="
timeout 3600 python tools/profile_moist3d_fine.py 2>&1 | grep -v Platform > perf_moist3d_fine2_r4.log
echo "=== fine profile v2 done $(date +%H:%M:%S) ==="
echo "CHAIN4 COMPLETE $(date +%H:%M:%S)"
