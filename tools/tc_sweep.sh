#!/bin/bash
# Round-3 TC intensification sweep (VERDICT #1 levers: 5 km cells,
# condensation-cap intermediate values, balanced-vortex-safe filter
# configs).  Sequential — one TPU chip; each run gets a hard timeout so
# a wedged tunnel cannot eat the round.  Logs timestamped per interval.
set -u
cd "$(dirname "$0")/.."
OUT=tc_sweep_r3
mkdir -p $OUT

run() {
  name=$1; shift
  echo "=== $name start $(date +%H:%M:%S) ==="
  timeout 5400 python examples/tc_intensification_rlz.py \
    --hours 72 --out /tmp/tc_$name "$@" 2>&1 \
    | grep -v Platform | while IFS= read -r l; do
        echo "$(date +%H:%M:%S) $l"; done > $OUT/$name.log
  echo "=== $name done  $(date +%H:%M:%S) rc=$? ==="
}

# 1. resolution + intermediate cap together (most likely ignite+stable)
run r5_diag_cap1e-3 --cells 100 --stable --cap 1e-3
# 2. prognostic qss + radial/azimuthal filter at 5 km: the known
#    intensifier, with the filter that 5 km cells may make admissible
run r5_prog_filt_rl30 --cells 100 --filter-tau 30 --filter-axes rl
# 3. resolution alone (default 2e-4 cap)
run r5_diag_cap2e-4 --cells 100 --stable
# 4. cap alone at 10 km
run r10_diag_cap1e-3 --cells 50 --stable --cap 1e-3
# 5. diag intermediate cap + filter at 5 km
run r5_diag_cap1e-3_filt --cells 100 --stable --cap 1e-3 --filter-tau 30 --filter-axes rl
# 6. stronger cap at 5 km if 1e-3 is still tame
run r5_diag_cap4e-3 --cells 100 --stable --cap 4e-3
echo "SWEEP COMPLETE $(date +%H:%M:%S)"
