#!/bin/bash
# TC sweep 10: break the zero-precipitation-efficiency loop (sweep 9:
# saturated core, q_c pinned ~0.3 g/kg below the 1 g/kg autoconversion
# threshold -> condensate re-evaporates, net heating ~0).  One arm:
# faster adjustment (tau 30) + higher cap (2e-4) + deep envelope (10 km)
# + moister sounding (rh 0.9): deeper saturated ascent builds q_c past
# the threshold so rain removes water and heating becomes net-positive.
set -u
cd "$(dirname "$0")/.."
while ! grep -q "CHAIN6 COMPLETE" jw06_chain6_driver.log 2>/dev/null; do
  sleep 120
done
echo "=== sweep10 start $(date +%H:%M:%S) ==="
timeout 10800 python examples/tc_intensification_rlz.py \
  --hours 150 --out /tmp/tc10 --rh 0.9 --qv0 20 --cells 100 \
  --stable --cap 2e-4 --smag 0.20 --ivd --cond-tau 30 \
  --moist-core 0.85 --moist-core-depth 10000 --vmax 15 2>&1 \
  | grep -v Platform > tc_sweep_r4/s10_deep_tau30_cap2e4.log
echo "sweep10 rc=$? done $(date +%H:%M:%S)"
echo "SWEEP10 COMPLETE $(date +%H:%M:%S)"
