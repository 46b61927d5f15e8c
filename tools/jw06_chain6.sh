#!/bin/bash
# JW06 chain 6: order-8 'l' filter arms (scale separation: k=8 e-fold
# ~90 days at tau 120 while grid scale damps in minutes) at 32 cells
# (the 48-cell steady state has its own day-5 instability, separate
# problem), + an order-8 48-cell wave arm to see if the filter also
# carries the 48-cell run through its steady-state instability.
set -u
cd "$(dirname "$0")/.."
while ! grep -q "CHAIN5 COMPLETE" r4_chain5_driver.log 2>/dev/null; do
  sleep 120
done

echo "=== wave c32 ord8 tau120 start $(date +%H:%M:%S) ==="
timeout 10800 python examples/jw06_baroclinic_slz.py --days 12 \
  --cells 32 --nl 96 --zdim 24 --ts 15 --filter-tau 120 --filter-order 8 \
  --filter-axes l --out /tmp/jw06_o8t120 2>&1 \
  | grep -v Platform > jw06_wave32_o8_tau120.log
echo "done $(date +%H:%M:%S)"

echo "=== wave c48 ord8 tau120 start $(date +%H:%M:%S) ==="
timeout 10800 python examples/jw06_baroclinic_slz.py --days 12 \
  --cells 48 --nl 96 --zdim 24 --ts 15 --filter-tau 120 --filter-order 8 \
  --spinup-days 4 --filter-axes l --out /tmp/jw06_o8t120c48 2>&1 \
  | grep -v Platform > jw06_wave48_o8_tau120.log
echo "done $(date +%H:%M:%S)"
echo "CHAIN6 COMPLETE $(date +%H:%M:%S)"
