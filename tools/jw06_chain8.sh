#!/bin/bash
# JW06 chain 8: the spinup-adjusted base GROWS the wave at the physical
# rate (|v| 2 -> 16 m/s by day 5, chain 6) but breaks at day 6 under
# order-8 tau-120.  Arm: order-8 tau-30 — grid-scale e-fold 30 s (front
# absorber) while k=8 keeps a ~23 DAY e-fold (wave untouched).
set -u
cd "$(dirname "$0")/.."
while ! grep -q "SWEEP10 COMPLETE" tc_sweep10_driver.log 2>/dev/null; do
  sleep 120
done
echo "=== wave c48 ord8 tau30 spinup start $(date +%H:%M:%S) ==="
timeout 10800 python examples/jw06_baroclinic_slz.py --days 12 \
  --cells 48 --nl 96 --zdim 24 --ts 15 --filter-tau 30 --filter-order 8 \
  --spinup-days 4 --filter-axes l --out /tmp/jw06_o8t30c48 2>&1 \
  | grep -v Platform > jw06_wave48_o8_tau30.log
echo "done $(date +%H:%M:%S)"
echo "CHAIN8 COMPLETE $(date +%H:%M:%S)"
