#!/bin/bash
# Round-3 TC sweep #5: PROGNOSTIC condensation with a rate cap
# (EqContext.cap_condensation).  Sweep-4 established: implicit vdiff makes
# the BL work (WISHE ignition h20-22 at every resolution) but prognostic
# qss still grid-storm-collapses right after ignition (heating measured
# 0.3 K/s = 10x physical), while the diagnostic scheme never ignites and
# the mixed BL + drag spin the vortex down.  The cap preserves the
# resolved WISHE heating (~1.5e-5 kg/kg/s at w = 10 m/s saturated ascent)
# and clips the ringing spikes.
set -u
cd "$(dirname "$0")/.."
OUT=tc_sweep_r3
mkdir -p $OUT

run() {
  name=$1; shift
  echo "=== $name start $(date +%H:%M:%S) ==="
  timeout 7200 python examples/tc_intensification_rlz.py \
    --hours 72 --out /tmp/tc_$name --rh 0.85 --qv0 20 "$@" 2>&1 \
    | grep -v Platform > $OUT/$name.log
  echo "=== $name done  $(date +%H:%M:%S) ==="
}

run m85_r10_prog_cap1e-4_smag20_ivd  --cells 50 --cap 1e-4 --smag 0.20 --ivd
run m85_r10_prog_cap3e-5_smag20_ivd  --cells 50 --cap 3e-5 --smag 0.20 --ivd
run m85_r10_prog_cap1e-5_smag20_ivd  --cells 50 --cap 1e-5 --smag 0.20 --ivd
echo "SWEEP5 COMPLETE $(date +%H:%M:%S)"
