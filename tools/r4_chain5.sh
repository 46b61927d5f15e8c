#!/bin/bash
# Round-4 chain 5: on-device evidence for features that were CPU-only
# (VERDICT r3: "every round-3 feature is CPU-verified only"):
# adjoint/4D-Var, EnKF, the XYZ convective shower, and the factored-DFT
# transform path (nl > 2048 compile-payload claim).
set -u
cd "$(dirname "$0")/.."
while ! grep -q "CHAIN4B COMPLETE" r4_chain4b_driver.log 2>/dev/null; do
  sleep 120
done

echo "=== 4dvar device start $(date +%H:%M:%S) ==="
timeout 3600 python examples/assimilate_4dvar.py --iters 100 2>&1 \
  | grep -v Platform > dev_4dvar_r4.log
echo "4dvar rc=$? done $(date +%H:%M:%S)"

echo "=== enkf device start $(date +%H:%M:%S) ==="
timeout 3600 python examples/assimilate_enkf.py --members 32 2>&1 \
  | grep -v Platform > dev_enkf_r4.log
echo "enkf rc=$? done $(date +%H:%M:%S)"

echo "=== xyz shower device start $(date +%H:%M:%S) ==="
timeout 3600 python examples/convective_shower_xyz.py --time 1800 2>&1 \
  | grep -v Platform > dev_shower_r4.log
echo "shower rc=$? done $(date +%H:%M:%S)"

echo "=== factored-DFT device start $(date +%H:%M:%S) ==="
timeout 3600 python - <<'PYEOF' 2>&1 | grep -v Platform > dev_factored_r4.log
import numpy as np, jax, jax.numpy as jnp
from scythe_tpu.utils.runtime import enable_compile_cache
enable_compile_cache()
from scythe_tpu import BC, GridParameters, create_grid
# nl = 4096 > 2048 -> auto factored-DFT; RL polar ring grid
gp = GridParameters(geometry="RL", xmin=0.0, xmax=3.0e5, num_cells=64,
                    lDim=4096, BCL={"h": BC.R1T1}, BCR={"h": BC.R0},
                    vars={"h": 1})
grid = create_grid(gp, jnp.float32)
assert grid.l_fact is not None, "expected factored-DFT mode"
rng = np.random.default_rng(0)
f = rng.standard_normal((1,) + grid.spatial_shape).astype(np.float32)
spec = grid.analysis(jnp.asarray(f))
out = grid.synthesis(spec)
val = np.asarray(out["val"])
rt = np.asarray(grid.synthesis(grid.analysis(out["val"]))["val"])
err = np.abs(rt - val).max() / (np.abs(val).max() + 1e-30)
print("factored nl=4096 device roundtrip projection err:", err)
assert err < 5e-2, err
print("FACTORED OK")
PYEOF
echo "factored rc=$? done $(date +%H:%M:%S)"
echo "CHAIN5 COMPLETE $(date +%H:%M:%S)"
