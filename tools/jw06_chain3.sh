#!/bin/bash
# JW06 round-4 chain 3: the tau=60 'l' filter preserves stability but
# SUPPRESSES the baroclinic wave (measured: |v|max pinned at ~1.5 m/s for
# 10 days, ps_min rising not deepening — at wave scales k/kmax ~ 0.25 the
# order-4 falloff gives a 4.3 h e-fold vs the ~1/day physical growth).
# Also both steady and wave runs lose ~3 m/s/day of jet at 32 cells: the
# l_q spline analysis filter's half-power scale (2 cells = 11 deg) bites
# the jet's latitude structure.  Arms: weaker tau at 48 latitude cells.
set -u
cd "$(dirname "$0")/.."

while ! grep -q "SWEEP8 COMPLETE" tc_sweep8_driver.log 2>/dev/null; do
  sleep 120
done

echo "=== steady cells48 start $(date +%H:%M:%S) ==="
timeout 7200 python examples/jw06_baroclinic_slz.py --steady --days 5 \
  --cells 48 --nl 96 --zdim 24 --ts 15 --out /tmp/jw06_steady48 2>&1 \
  | grep -v Platform > jw06_steady48.log
echo "=== steady cells48 done $(date +%H:%M:%S) ==="

echo "=== wave cells48 tau300 start $(date +%H:%M:%S) ==="
timeout 10800 python examples/jw06_baroclinic_slz.py --days 10 \
  --cells 48 --nl 96 --zdim 24 --ts 15 --filter-tau 300 --filter-axes l \
  --out /tmp/jw06_w48t300 2>&1 | grep -v Platform > jw06_wave48_tau300.log
echo "=== wave cells48 tau300 done $(date +%H:%M:%S) ==="

echo "=== wave cells48 tau120 start $(date +%H:%M:%S) ==="
timeout 10800 python examples/jw06_baroclinic_slz.py --days 10 \
  --cells 48 --nl 96 --zdim 24 --ts 15 --filter-tau 120 --filter-axes l \
  --out /tmp/jw06_w48t120 2>&1 | grep -v Platform > jw06_wave48_tau120.log
echo "=== wave cells48 tau120 done $(date +%H:%M:%S) ==="
echo "CHAIN3 COMPLETE $(date +%H:%M:%S)"
