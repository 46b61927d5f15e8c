#!/bin/bash
# Round-5 JW06 chain 3: top sponge (kills the polar model-top mode,
# probe2/3) + 'l'-only order-8 tau-30 modal filter (clamps the k>=24
# zonal cascade of the equatorial surface mode; proven shell-safe in
# round 4, whose day-7 "breaking death" the probes now attribute to
# the then-unfixed top mode).  l_q=0 + balanced init throughout.
set -u
cd "$(dirname "$0")/.."

echo "=== r5c3 wave zsp lf30 start $(date +%H:%M:%S) ==="
timeout 7200 python examples/jw06_baroclinic_slz.py --days 12 \
  --cells 48 --nl 96 --zdim 24 --ts 15 --l-q 0 --balanced-init \
  --balance-cache --sponge-top-km 8 \
  --filter-tau 30 --filter-order 8 --filter-axes l \
  --out /tmp/jw06_r5c3_wave 2>&1 \
  | grep -v Platform > jw06_r5_wave_zsp_lf30.log
echo "wave lf30 done $(date +%H:%M:%S)"

echo "=== r5c3 wave zsp lf30 s21 start $(date +%H:%M:%S) ==="
timeout 7200 python examples/jw06_baroclinic_slz.py --days 12 \
  --cells 48 --nl 96 --zdim 24 --ts 15 --l-q 0 --balanced-init \
  --balance-cache --sponge-top-km 8 --smag 0.21 \
  --filter-tau 30 --filter-order 8 --filter-axes l \
  --out /tmp/jw06_r5c3_wave_s 2>&1 \
  | grep -v Platform > jw06_r5_wave_zsp_lf30_s21.log
echo "wave lf30 s21 done $(date +%H:%M:%S)"

echo "=== r5c3 steady zsp lf30 start $(date +%H:%M:%S) ==="
timeout 7200 python examples/jw06_baroclinic_slz.py --steady --days 10 \
  --cells 48 --nl 96 --zdim 24 --ts 15 --l-q 0 --balanced-init \
  --balance-cache --sponge-top-km 8 \
  --filter-tau 30 --filter-order 8 --filter-axes l \
  --out /tmp/jw06_r5c3_steady 2>&1 \
  | grep -v Platform > jw06_r5_steady_zsp_lf30.log
echo "steady done $(date +%H:%M:%S)"
echo "R5 JW06 CHAIN3 COMPLETE $(date +%H:%M:%S)"
