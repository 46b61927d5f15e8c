#!/bin/bash
# TC sweep 9: moist-envelope core + 150 h (RE87 intensifies at h60-150;
# sweep 8 proved 96 h stability THROUGH convection events with
# cond_tau=90 but the dry-core vortex spins down faster than sporadic
# cells can feed it).  Arms:
#   a) moist core 0.9 + vmax 15, 150 h
#   b) moist core 0.9 + vmax 15 + bubble 2, 150 h
#   c) re-run sweep8a control (cond-tau alone; killed by the tunnel
#      wedge, now a cache hit)
set -u
cd "$(dirname "$0")/.."
mkdir -p tc_sweep_r4
while ! grep -q "CHAIN4 COMPLETE" r4_chain4_driver.log 2>/dev/null; do
  sleep 120
done

echo "=== sweep9a moistcore start $(date +%H:%M:%S) ==="
timeout 10800 python examples/tc_intensification_rlz.py \
  --hours 150 --out /tmp/tc9a --rh 0.85 --qv0 20 --cells 100 \
  --stable --cap 5e-5 --smag 0.20 --ivd --cond-tau 90 \
  --moist-core 0.85 --vmax 15 2>&1 \
  | grep -v Platform > tc_sweep_r4/s9a_mc90_v15_150h.log
echo "sweep9a rc=$? done $(date +%H:%M:%S)"

echo "=== sweep9b moistcore+bubble start $(date +%H:%M:%S) ==="
timeout 10800 python examples/tc_intensification_rlz.py \
  --hours 150 --out /tmp/tc9b --rh 0.85 --qv0 20 --cells 100 \
  --stable --cap 5e-5 --smag 0.20 --ivd --cond-tau 90 \
  --moist-core 0.85 --vmax 15 --bubble 2.0 2>&1 \
  | grep -v Platform > tc_sweep_r4/s9b_mc90_v15_bub2_150h.log
echo "sweep9b rc=$? done $(date +%H:%M:%S)"

echo "=== sweep8a rerun start $(date +%H:%M:%S) ==="
timeout 7200 python examples/tc_intensification_rlz.py \
  --hours 96 --out /tmp/tc8a --rh 0.85 --qv0 20 --cells 100 \
  --stable --cap 5e-5 --smag 0.20 --ivd --cond-tau 90 2>&1 \
  | grep -v Platform > tc_sweep_r4/s8a_condtau90.log
echo "sweep8a rc=$? done $(date +%H:%M:%S)"
echo "SWEEP9 COMPLETE $(date +%H:%M:%S)"
