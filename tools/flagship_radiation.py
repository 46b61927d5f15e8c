"""Flagship 24 h Twoway run: outer-boundary treatment comparison (f32 TPU).

Round-2 stabilized the marginal f32 flagship with an outer Rayleigh sponge
(docs/RESULTS.md).  This compares, back-to-back in one session:
  A. sponge only (production: 45 km / tau 600 s)
  B. radiation only (45 km Sommerfeld strip)
  C. radiation + sponge
recording completion, the Vmax timeseries, and outer-region wave energy
(RMS of h over the outer 100 km excluding the treated strip — the pile-up
that drove the round-1 NaN).
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))
sys.path.insert(0, os.path.join(REPO, "models", "cha_bell2024"))

from flagship_stability import build_ics  # noqa: E402


def run(ics_csv, dtype, options, label, hours=24.0):
    from common import GRID, PHYSICS

    from scythe_tpu import ModelParameters
    from scythe_tpu.model import build_step, initialize, make_scan

    model = ModelParameters(
        ts=3.0,
        integration_time=hours * 3600.0,
        output_interval=hours * 3600.0,
        equation_set="Twoway_ShallowWater_Slab",
        initial_conditions=ics_csv,
        output_dir="/tmp/twoway_radiation",
        grid_params=GRID,
        physical_params={**PHYSICS, "S1": 1.0e-5},
        options=options,
    )
    grid, ctx, state = initialize(model, dtype)
    step = build_step(model, grid, ctx, dtype)
    chunk = 600  # 30 model-minutes
    scan = make_scan(step, chunk)
    n_chunks = int(round(hours * 3600.0 / 3.0 / chunk))
    r = np.asarray(grid.r_mish)
    outer = (r > 2.0e5) & (r < 2.55e5)  # outer region, outside the strip
    times, vmaxs, hmins, h_outer = [], [], [], []
    failed_at = None
    t0 = time.time()
    for i in range(n_chunks):
        state = scan(state)
        phys = np.asarray(grid.synthesis(state.spec)["val"])
        t_h = (i + 1) * chunk * 3.0 / 3600.0
        if not np.isfinite(phys).all():
            failed_at = t_h
            break
        times.append(t_h)
        vmaxs.append(float(phys[2].max()))
        hmins.append(float(phys[0].min()))
        h_outer.append(float(np.sqrt(np.mean(phys[0][outer] ** 2))))
    wall = time.time() - t0
    status = f"NaN at t={failed_at}h" if failed_at else f"COMPLETED {hours}h"
    vm = f"{vmaxs[-1]:.1f}" if vmaxs else "-"
    ho = f"{max(h_outer):.3f}" if h_outer else "-"
    print(
        f"[{label}] {status}; Vmax(end)={vm} peak outer h_rms={ho} "
        f"({wall:.0f}s)",
        flush=True,
    )
    return dict(
        label=label,
        options=options,
        failed_at_h=failed_at,
        times_h=times,
        vmax=vmaxs,
        hmin=hmins,
        h_outer_rms=h_outer,
    )


def main():
    import jax.numpy as jnp

    from scythe_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache()
    dtype = jnp.float32
    workdir = "/tmp/flagship_f32"
    os.makedirs(workdir, exist_ok=True)
    ics = build_ics(workdir, dtype)

    cases = [
        ("sponge", {"sponge_width": 45000.0, "sponge_tau": 600.0}),
        ("radiation", {"radiation_width": 45000.0}),
        (
            "radiation+sponge",
            {
                "radiation_width": 45000.0,
                "sponge_width": 45000.0,
                "sponge_tau": 600.0,
            },
        ),
    ]
    results = [run(ics, dtype, opts, label) for label, opts in cases]
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/flagship_radiation.json"
    json.dump(results, open(out, "w"), indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
