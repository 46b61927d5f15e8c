"""Trajectory-drift gate for `deriv_single` (docs/NUMERICS.md: "Measure
trajectory drift ... before adopting"): run the production flagship
configuration (24 h Twoway + outer sponge, f32) back-to-back with
compensated vs selective-bf16 derivative synthesis and compare the
intensity timeseries against the established f32-vs-f64 agreement band
(RESULTS.md: Vmax within 1% to t=2.5 h, 4.4% to t=8.5 h; divergence
beyond is the chaotic marginal regime, not a numerics defect).
"""

import dataclasses
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from flagship_stability import build_ics, run_flagship  # noqa: E402


def run(ics_csv, dtype, deriv_single, hours=24.0):
    sys.path.insert(0, os.path.join(REPO, "models", "cha_bell2024"))
    from common import GRID, PHYSICS

    from scythe_tpu import ModelParameters

    gp = dataclasses.replace(GRID, deriv_single=deriv_single)
    model = ModelParameters(
        ts=3.0,
        integration_time=hours * 3600.0,
        output_interval=hours * 3600.0,
        equation_set="Twoway_ShallowWater_Slab",
        initial_conditions=ics_csv,
        output_dir="/tmp/twoway_fastderiv",
        grid_params=gp,
        physical_params={**PHYSICS, "S1": 1.0e-5},
        options={"sponge_width": 45000.0, "sponge_tau": 600.0},
    )
    out, grid = run_flagship(model, dtype, label=f"deriv_single={deriv_single}")
    assert grid.fast == bool(deriv_single)
    out["deriv_single"] = deriv_single
    return out


def main():
    import jax.numpy as jnp

    from scythe_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache()
    dtype = jnp.float32
    workdir = "/tmp/flagship_f32"
    os.makedirs(workdir, exist_ok=True)
    ics = build_ics(workdir, dtype)

    base = run(ics, dtype, False)
    fast = run(ics, dtype, True)
    json.dump([base, fast], open("/tmp/fastderiv_traj.json", "w"), indent=1)

    t = np.asarray(base["times_h"])
    n = min(len(base["vmax"]), len(fast["vmax"]))
    rel = np.abs(np.asarray(fast["vmax"][:n]) - np.asarray(base["vmax"][:n])) / (
        np.asarray(base["vmax"][:n])
    )
    for t_gate, tol in [(2.5, 0.01), (8.5, 0.044)]:
        m = t[:n] <= t_gate
        worst = rel[m].max() if m.any() else np.nan
        print(
            f"Vmax rel diff to t<={t_gate}h: {worst:.4f} "
            f"({'OK' if worst < tol else 'EXCEEDS'} band {tol})"
        )
    print(f"full-run max rel diff: {rel.max():.4f} at t={t[:n][rel.argmax()]}h")


if __name__ == "__main__":
    main()
