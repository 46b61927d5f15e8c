#!/bin/bash
# Round-3 TC sweep #2: the moistened (Jordan-realistic, RH 0.85 BL)
# sounding that gives the saturation-gated diagnostic scheme an honest
# ignition path (sweep #1 measured the 0.7-RH column never saturating in
# 72 h at any cap/resolution, while prognostic qss ignites off its own
# sub-saturation noise).  Plus the prognostic 5 km envelope baseline.
set -u
cd "$(dirname "$0")/.."
OUT=tc_sweep_r3
mkdir -p $OUT

run() {
  name=$1; shift
  echo "=== $name start $(date +%H:%M:%S) ==="
  timeout 5400 python examples/tc_intensification_rlz.py \
    --hours 72 --out /tmp/tc_$name "$@" 2>&1 \
    | grep -v Platform > $OUT/$name.log
  echo "=== $name done  $(date +%H:%M:%S) ==="
}

# 1. moist sounding, diagnostic default cap, 10 km — does it ignite now?
run m85_r10_diag_cap2e-4 --cells 50 --stable --rh 0.85 --qv0 20
# 2. moist sounding, intermediate cap, 10 km
run m85_r10_diag_cap1e-3 --cells 50 --stable --cap 1e-3 --rh 0.85 --qv0 20
# 3. moist sounding, intermediate cap, 5 km
run m85_r5_diag_cap1e-3 --cells 100 --stable --cap 1e-3 --rh 0.85 --qv0 20
# 4. moist sounding + bubble trigger, diag cap 1e-3, 10 km
run m85_r10_diag_cap1e-3_bub --cells 50 --stable --cap 1e-3 --rh 0.85 --qv0 20 --bubble 1.0
# 5. prognostic at 5 km, dry sounding: where is the envelope edge now?
run r5_prog --cells 100
# 6. prognostic, moist sounding, 10 km: collapse timing vs r2's h30
run m85_r10_prog --cells 50 --rh 0.85 --qv0 20
# 7. moist sounding, strong cap, 10 km
run m85_r10_diag_cap4e-3 --cells 50 --stable --cap 4e-3 --rh 0.85 --qv0 20
echo "SWEEP2 COMPLETE $(date +%H:%M:%S)"
