#!/bin/bash
# Round-5 JW06 chain 2: the top-sponge configuration (the probe proved
# the round-4 "breaking-phase death" was a polar MODEL-TOP mode, e-fold
# ~222 min, killed by an 8 km Rayleigh absorber; the masked latitude
# filter excites it even WITH the sponge — tools/jw06_r5_probe.py,
# jw06_r5_probe2.log).  All arms: l_q=0 + discretely-balanced init +
# sponge_top 8 km + horizontal Smagorinsky 0.21; balance solve cached.
set -u
cd "$(dirname "$0")/.."

echo "=== r5c2 wave zsp s21 start $(date +%H:%M:%S) ==="
timeout 7200 python examples/jw06_baroclinic_slz.py --days 12 \
  --cells 48 --nl 96 --zdim 24 --ts 15 --l-q 0 --balanced-init \
  --balance-cache --smag 0.21 --sponge-top-km 8 \
  --out /tmp/jw06_r5c2_wave 2>&1 \
  | grep -v Platform > jw06_r5_wave_zsp_s21.log
echo "wave done $(date +%H:%M:%S)"

echo "=== r5c2 steady zsp s21 start $(date +%H:%M:%S) ==="
timeout 7200 python examples/jw06_baroclinic_slz.py --steady --days 10 \
  --cells 48 --nl 96 --zdim 24 --ts 15 --l-q 0 --balanced-init \
  --balance-cache --smag 0.21 --sponge-top-km 8 \
  --out /tmp/jw06_r5c2_steady 2>&1 \
  | grep -v Platform > jw06_r5_steady_zsp_s21.log
echo "steady done $(date +%H:%M:%S)"
echo "R5 JW06 CHAIN2 COMPLETE $(date +%H:%M:%S)"
