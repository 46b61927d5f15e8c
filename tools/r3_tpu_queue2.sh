#!/bin/bash
# Round-3 TPU queue v2 (post-wedge priorities): perf baseline first, then
# one bubble-trigger TC run, the filtered JW06 wave, and the smoke lane.
set -u
cd "$(dirname "$0")/.."

while ! grep -q "SWEEP6 COMPLETE" tc_sweep6_driver.log 2>/dev/null; do
  sleep 60
done

# tunnel-liveness gate: don't burn queue items into a wedged tunnel
until timeout 120 python /tmp/tunnel_probe.py 2>/dev/null | grep -q alive; do
  echo "tunnel wedged, waiting $(date +%H:%M:%S)"
  sleep 120
done

echo "=== perf baseline start $(date +%H:%M:%S) ==="
timeout 3600 python tools/profile_moist3d.py 2>&1 | grep -v Platform > perf_moist3d_r3.log
echo "=== perf baseline done  $(date +%H:%M:%S) ==="

echo "=== sweep7 bubble start $(date +%H:%M:%S) ==="
timeout 5400 python examples/tc_intensification_rlz.py \
  --hours 96 --out /tmp/tc_bub --rh 0.85 --qv0 20 --cells 100 \
  --stable --cap 5e-5 --smag 0.20 --ivd --bubble 2.0 2>&1 \
  | grep -v Platform > tc_sweep_r3/m85_r5_diag5e-5_ivd_bub2.log
echo "=== sweep7 bubble done  $(date +%H:%M:%S) ==="

echo "=== jw06 wave+filter start $(date +%H:%M:%S) ==="
timeout 9000 python examples/jw06_baroclinic_slz.py --days 10 \
  --cells 32 --nl 96 --zdim 24 --ts 15 --filter-tau 60 \
  --out /tmp/jw06_wave_filt 2>&1 | grep -v Platform > jw06_wave_filt.log
echo "=== jw06 wave+filter done  $(date +%H:%M:%S) ==="

echo "=== tpu-smoke start $(date +%H:%M:%S) ==="
make tpu-smoke 2>&1 | grep -v Platform > tpu_smoke_r3.log
echo "=== tpu-smoke done  $(date +%H:%M:%S) ==="
echo "QUEUE2 COMPLETE $(date +%H:%M:%S)"
