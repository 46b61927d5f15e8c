#!/bin/bash
# Round-5 JW06 closure chain (VERDICT r4 items 1+2): every arm runs on
# the l_q=0 (neutral-fit) grid with the discretely-balanced
# initialization — the two round-5 mechanisms that removed the
# base-state drift — and the horizontal Smagorinsky closure for the
# day-7+ breaking front (the latitude modal filter is structurally
# unusable on the shell, round-4 endgame).
#
# Arms:
#   1. steady control, 10 days: drift with zero dynamics forcing
#      (round-4 arm lost u_max 35 -> 25 by day 6 and died day 7).
#   2. wave, 12 days, smag 0.21 (classic Cs).
#   3. wave, 12 days, smag 0.28 (stronger, if 2 breaks).
#   4. wave, 12 days, smag 0.21 + l-only order-8 tau-60 modal filter
#      (combined absorber backup).
set -u
cd "$(dirname "$0")/.."

echo "=== r5 steady c48 lq0 bal start $(date +%H:%M:%S) ==="
timeout 7200 python examples/jw06_baroclinic_slz.py --steady --days 10 \
  --cells 48 --nl 96 --zdim 24 --ts 15 --l-q 0 --balanced-init \
  --out /tmp/jw06_r5_steady 2>&1 | grep -v Platform > jw06_r5_steady.log
echo "steady done $(date +%H:%M:%S)"

echo "=== r5 wave c48 lq0 bal smag0.21 start $(date +%H:%M:%S) ==="
timeout 7200 python examples/jw06_baroclinic_slz.py --days 12 \
  --cells 48 --nl 96 --zdim 24 --ts 15 --l-q 0 --balanced-init \
  --smag 0.21 --out /tmp/jw06_r5_w21 2>&1 \
  | grep -v Platform > jw06_r5_wave_s21.log
echo "wave s21 done $(date +%H:%M:%S)"

echo "=== r5 wave c48 lq0 bal smag0.28 start $(date +%H:%M:%S) ==="
timeout 7200 python examples/jw06_baroclinic_slz.py --days 12 \
  --cells 48 --nl 96 --zdim 24 --ts 15 --l-q 0 --balanced-init \
  --smag 0.28 --out /tmp/jw06_r5_w28 2>&1 \
  | grep -v Platform > jw06_r5_wave_s28.log
echo "wave s28 done $(date +%H:%M:%S)"

echo "=== r5 wave c48 lq0 bal smag0.21+o8tau60 start $(date +%H:%M:%S) ==="
timeout 7200 python examples/jw06_baroclinic_slz.py --days 12 \
  --cells 48 --nl 96 --zdim 24 --ts 15 --l-q 0 --balanced-init \
  --smag 0.21 --filter-tau 60 --filter-order 8 --filter-axes l \
  --out /tmp/jw06_r5_w21f 2>&1 \
  | grep -v Platform > jw06_r5_wave_s21_o8t60.log
echo "wave s21+filter done $(date +%H:%M:%S)"
echo "R5 JW06 CHAIN COMPLETE $(date +%H:%M:%S)"
