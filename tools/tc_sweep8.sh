#!/bin/bash
# TC sweep 8 (round 4): the condensation-tau de-impulsed onset + moist
# bubble + stronger vortex.  Sweep 7's forensic: first saturation at h34
# -> ringing-adjustment resonance death at h36.  Three arms:
#   a) control: cond-tau alone (does de-impulsing survive the h36 onset?)
#   b) cond-tau + moist 2K bubble + vmax 15 (ignition + survival)
#   c) cond-tau + moist 3K bubble + vmax 18 (stronger forcing arm)
set -u
cd "$(dirname "$0")/.."
mkdir -p tc_sweep_r4

# wait for the 10-day JW06 wave run to release the chip
while pgrep -f "jw06_baroclinic_slz" > /dev/null 2>&1; do sleep 120; done

echo "=== fine profile start $(date +%H:%M:%S) ==="
timeout 3600 python tools/profile_moist3d_fine.py 2>&1 | grep -v Platform > perf_moist3d_fine_r4.log
echo "=== fine profile done $(date +%H:%M:%S) ==="

echo "=== sweep8a cond-tau control start $(date +%H:%M:%S) ==="
timeout 7200 python examples/tc_intensification_rlz.py \
  --hours 96 --out /tmp/tc8a --rh 0.85 --qv0 20 --cells 100 \
  --stable --cap 5e-5 --smag 0.20 --ivd --cond-tau 90 2>&1 \
  | grep -v Platform > tc_sweep_r4/s8a_condtau90.log
echo "=== sweep8a done $(date +%H:%M:%S) ==="

echo "=== sweep8b bubble+vmax15 start $(date +%H:%M:%S) ==="
timeout 7200 python examples/tc_intensification_rlz.py \
  --hours 96 --out /tmp/tc8b --rh 0.85 --qv0 20 --cells 100 \
  --stable --cap 5e-5 --smag 0.20 --ivd --cond-tau 90 \
  --bubble 2.0 --vmax 15 2>&1 \
  | grep -v Platform > tc_sweep_r4/s8b_condtau90_bub2_v15.log
echo "=== sweep8b done $(date +%H:%M:%S) ==="

echo "=== sweep8c bubble3+vmax18 start $(date +%H:%M:%S) ==="
timeout 7200 python examples/tc_intensification_rlz.py \
  --hours 96 --out /tmp/tc8c --rh 0.85 --qv0 20 --cells 100 \
  --stable --cap 5e-5 --smag 0.20 --ivd --cond-tau 90 \
  --bubble 3.0 --vmax 18 2>&1 \
  | grep -v Platform > tc_sweep_r4/s8c_condtau90_bub3_v18.log
echo "=== sweep8c done $(date +%H:%M:%S) ==="

echo "=== tpu-smoke (band) start $(date +%H:%M:%S) ==="
timeout 2400 make tpu-smoke 2>&1 | grep -v Platform > tpu_smoke_r4b.log
echo "=== smoke done $(date +%H:%M:%S) ==="
echo "SWEEP8 COMPLETE $(date +%H:%M:%S)"
