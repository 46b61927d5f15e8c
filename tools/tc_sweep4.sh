#!/bin/bash
# Round-3 TC sweep #4: implicit vertical diffusion (options['implicit_vdiff'])
# is in (model.build_implicit_vdiff).  Sweep #3 + ivd measured: the mixed BL
# accelerates the WISHE loop (convection h20 vs h32, intensification onset
# h22) but the prognostic-qss eyewall still grid-storm-collapses (h24).
# Hypothesis: the diagnostic (rate-capped saturation-adjustment) scheme --
# 72 h stable in every earlier sweep but never igniting over an UNMIXED BL
# -- can now ignite, giving intensification + stability together.
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

run m85_r10_diag1e-3_smag20_ivd  --cells 50  --stable --cap 1e-3 --smag 0.20 --ivd
run m85_r10_diag4e-3_smag20_ivd  --cells 50  --stable --cap 4e-3 --smag 0.20 --ivd
run m85_r5_prog_smag25_ivd       --cells 100 --smag 0.25 --ivd
run m85_r5_diag1e-3_smag20_ivd   --cells 100 --stable --cap 1e-3 --smag 0.20 --ivd
echo "SWEEP4 COMPLETE $(date +%H:%M:%S)"
