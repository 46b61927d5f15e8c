#!/bin/bash
# Round-3 TC sweep #3: the moistened (RH 0.85) sounding now IGNITES
# (sweep #2) but everything collapses at ignition — the azimuthal-only
# modal filter cannot drain (r,z) grid noise at lDim=4 and the radial
# filter is vortex-unsafe.  This sweep adds the vortex-safe stabilizer
# RE87 itself used: the strain-activated Smagorinsky closure
# (physics/turbulence.py), alone and with the diagnostic cap.
set -u
cd "$(dirname "$0")/.."
OUT=tc_sweep_r3
mkdir -p $OUT

run() {
  name=$1; shift
  echo "=== $name start $(date +%H:%M:%S) ==="
  timeout 5400 python examples/tc_intensification_rlz.py \
    --hours 72 --out /tmp/tc_$name --rh 0.85 --qv0 20 "$@" 2>&1 \
    | grep -v Platform > $OUT/$name.log
  echo "=== $name done  $(date +%H:%M:%S) ==="
}

run m85_r10_prog_smag20      --cells 50 --smag 0.20
run m85_r10_diag1e-3_smag20  --cells 50 --stable --cap 1e-3 --smag 0.20
run m85_r10_diag2e-4_smag20  --cells 50 --stable --smag 0.20
run m85_r5_diag1e-3_smag20   --cells 100 --stable --cap 1e-3 --smag 0.20
run m85_r10_prog_smag25      --cells 50 --smag 0.25
run m85_r5_prog_smag20       --cells 100 --smag 0.20
echo "SWEEP3 COMPLETE $(date +%H:%M:%S)"
