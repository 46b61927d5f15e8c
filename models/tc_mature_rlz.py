"""The mature-TC production configuration (round-4 "sweep 10") as a
named model: the settings that carried a 3-D moist-core tropical
cyclone through 150 h of intensification to a mature Vmax ~78 m/s /
RMW 29 km vortex with rain and a -14 m/s BL inflow
(tc_sweep_r4/s10_deep_tau30_cap2e4.log; docs/RESULTS.md).

This file encodes the validated option bundle; the initial conditions
(gradient-balanced vortex + deep moist envelope) come from
examples/tc_intensification_rlz.py, which this file defers to:

    python examples/tc_intensification_rlz.py --hours 150 --rh 0.9 \
        --qv0 20 --cells 100 --stable --cap 2e-4 --smag 0.20 --ivd \
        --cond-tau 30 --moist-core 0.85 --moist-core-depth 10000 --vmax 15

The load-bearing stabilizers, each measured (docs/RESULTS.md):
  * diagnostic condensation with rate cap 2e-4 kg/kg/s — bounds the
    latent-heating RATE a grid-point storm can extract;
  * condensation_tau = 30 s — de-impulses saturation onset (the
    ringing-adjustment resonance class);
  * (r,z)-plane Smagorinsky Cs = 0.2 + implicit vertical diffusion —
    the vortex-safe closure pair (the modal filter is NOT admissible on
    a balanced vortex core at 10 km cells);
  * active sedimentation + exp stiff relaxation + outer sponge.
Contract: tests/test_tc_intensification.py pins a reduced-size onset
run of exactly this bundle (Vmax increasing + rain onset).
"""

import os

import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from examples.tc_intensification_rlz import build_model, write_ics  # noqa: E402

_OUT = "./tc_mature/"

model = build_model(
    _OUT,
    num_cells=100,
    ts=2.0,
    t_end=150 * 3600.0,
    fluxes=True,
    stable=True,
    cap=2.0e-4,
    rh=0.9,
    qv0=20.0,
    smag=0.20,
    ivd=True,
    cond_tau=30.0,
)

if not os.path.exists(model.initial_conditions):
    # materialize the sweep-10 initial vortex (balanced 15 m/s vortex +
    # 85%-saturated 10 km-deep moist core) so `run_scythe.py
    # models/tc_mature_rlz.py` works stand-alone
    import jax.numpy as jnp

    from scythe_tpu import create_grid
    from scythe_tpu.model import build_context, default_dtype

    _grid = create_grid(model.grid_params, default_dtype())
    _ctx = build_context(model, _grid, default_dtype())
    write_ics(model, _grid, _ctx.ref_state, vmax=15.0, moist_core=0.85,
              moist_core_depth=10000.0)
