#!/bin/bash
# Round-4 TPU queue: converts round-3 machinery into on-device evidence
# (VERDICT r3 item 1).  Order: smoke gate first (green golden-50 is the
# prerequisite for trusting everything else), then the bench JSON
# (flagship + moist3d + rlz_hbm_fraction), then the moist3d profile, the
# TC bubble-trigger run (sweep 7), and the filtered JW06 wave production
# run.  Each item has its own timeout so one hang cannot eat the queue.
set -u
cd "$(dirname "$0")/.."

probe() {
  until timeout 300 python /tmp/tunnel_probe.py 2>/dev/null | grep -q alive; do
    echo "tunnel wedged, waiting $(date +%H:%M:%S)"
    sleep 120
  done
}

probe
echo "=== tpu-smoke start $(date +%H:%M:%S) ==="
timeout 2400 make tpu-smoke 2>&1 | grep -v Platform > tpu_smoke_r4.log
echo "tpu-smoke rc=$? done $(date +%H:%M:%S)"

probe
echo "=== bench start $(date +%H:%M:%S) ==="
timeout 5400 python bench.py 2>&1 | grep -v Platform > bench_r4_manual.log
echo "bench rc=$? done $(date +%H:%M:%S)"

probe
echo "=== profile_moist3d start $(date +%H:%M:%S) ==="
timeout 3600 python tools/profile_moist3d.py 2>&1 | grep -v Platform > perf_moist3d_r4.log
echo "profile_moist3d rc=$? done $(date +%H:%M:%S)"

probe
echo "=== sweep7 bubble start $(date +%H:%M:%S) ==="
mkdir -p tc_sweep_r4
timeout 7200 python examples/tc_intensification_rlz.py \
  --hours 96 --out /tmp/tc_bub --rh 0.85 --qv0 20 --cells 100 \
  --stable --cap 5e-5 --smag 0.20 --ivd --bubble 2.0 2>&1 \
  | grep -v Platform > tc_sweep_r4/m85_r5_diag5e-5_ivd_bub2.log
echo "sweep7 rc=$? done $(date +%H:%M:%S)"

probe
echo "=== jw06 wave+filter start $(date +%H:%M:%S) ==="
timeout 10800 python examples/jw06_baroclinic_slz.py --days 10 \
  --cells 32 --nl 96 --zdim 24 --ts 15 --filter-tau 60 \
  --out /tmp/jw06_wave_filt 2>&1 | grep -v Platform > jw06_wave_filt.log
echo "jw06 rc=$? done $(date +%H:%M:%S)"

echo "R4 QUEUE COMPLETE $(date +%H:%M:%S)"
