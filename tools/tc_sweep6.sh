#!/bin/bash
# Round-3 TC sweep #6: TIGHT diagnostic cap over the implicit-vdiff BL.
# Forensics (tools/tc_nan_forensic.py, docs/RESULTS.md): the ivd BL
# moistens the low levels to grid saturation around h38-42; the
# diagnostic adjustment then ignites a cell, and at cap 1e-3 kg/kg/s the
# per-step increment (2e-3 kg/kg = ~5 K latent per step) re-excites the
# known ringing-adjustment resonance -> f32 explosion with ~7-step
# e-fold at (69 km, 3.4 km) — NOT a quiet solver instability (the
# flux-form ivd held).  A real eyewall heats at ~100 K/h = 0.055 K/step
# at ts = 2, so cap 2e-5 (0.1 K/step) bounds the ringing while leaving
# the physical WISHE heating room.
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

run m85_r10_diag2e-5_smag20_ivd  --cells 50  --stable --cap 2e-5 --smag 0.20 --ivd
run m85_r10_diag5e-5_smag20_ivd  --cells 50  --stable --cap 5e-5 --smag 0.20 --ivd
run m85_r5_diag2e-5_smag20_ivd   --cells 100 --stable --cap 2e-5 --smag 0.20 --ivd
echo "SWEEP6 COMPLETE $(date +%H:%M:%S)"
