#!/bin/bash
# Round-3 TPU queue: runs after tc_sweep5 completes.
# 1. JW06 production-resolution runs (VERDICT #5): steady-state drift +
#    the 9-day baroclinic wave vs the published ps_min curve.
# 2. make tpu-smoke (VERDICT #7 session log).
set -u
cd "$(dirname "$0")/.."

while ! grep -q "SWEEP5 COMPLETE" tc_sweep5_driver.log 2>/dev/null; do
  sleep 60
done

echo "=== jw06 steady start $(date +%H:%M:%S) ==="
timeout 7200 python examples/jw06_baroclinic_slz.py --steady --days 9 \
  --cells 32 --nl 96 --zdim 24 --ts 15 --out /tmp/jw06_steady_prod 2>&1 \
  | grep -v Platform > jw06_steady_prod.log
echo "=== jw06 steady done  $(date +%H:%M:%S) ==="

echo "=== jw06 wave start $(date +%H:%M:%S) ==="
timeout 10800 python examples/jw06_baroclinic_slz.py --days 10 \
  --cells 32 --nl 96 --zdim 24 --ts 15 --out /tmp/jw06_wave_prod 2>&1 \
  | grep -v Platform > jw06_wave_prod.log
echo "=== jw06 wave done  $(date +%H:%M:%S) ==="

echo "=== tpu-smoke start $(date +%H:%M:%S) ==="
make tpu-smoke 2>&1 | grep -v Platform > tpu_smoke_r3.log
echo "=== tpu-smoke done  $(date +%H:%M:%S) ==="
echo "QUEUE COMPLETE $(date +%H:%M:%S)"
