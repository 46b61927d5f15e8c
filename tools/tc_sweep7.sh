#!/bin/bash
# Round-3 TC sweep #7: convective TRIGGER over the stabilized machinery.
# Sweep 6 closed the stability side (tight diagnostic cap + flux-form ivd
# completes 96 h at every resolution) but resolved convection never
# self-ignites at 5-10 km cells before drag+mixing spin the vortex down.
# Standard practice (and the axisymmetric analog of real-case BL noise):
# a warm-bubble trigger inside the RMW (--bubble, examples/
# tc_intensification_rlz.py::write_ics).  Success = the forced first cell
# closes the WISHE loop: Vmax turns UP and holds without collapse.
set -u
cd "$(dirname "$0")/.."
OUT=tc_sweep_r3
mkdir -p $OUT

run() {
  name=$1; shift
  echo "=== $name start $(date +%H:%M:%S) ==="
  timeout 7200 python examples/tc_intensification_rlz.py \
    --hours 96 --out /tmp/tc_$name --rh 0.85 --qv0 20 "$@" 2>&1 \
    | grep -v Platform > $OUT/$name.log
  echo "=== $name done  $(date +%H:%M:%S) ==="
}

run m85_r5_diag2e-5_ivd_bub2   --cells 100 --stable --cap 2e-5 --smag 0.20 --ivd --bubble 2.0
run m85_r5_diag5e-5_ivd_bub2   --cells 100 --stable --cap 5e-5 --smag 0.20 --ivd --bubble 2.0
echo "SWEEP7 COMPLETE $(date +%H:%M:%S)"
