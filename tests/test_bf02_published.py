"""Bryan & Fritsch (2002) published-number moist validation (round-3
VERDICT #4: the moist family needed a published quantitative benchmark
like the dry dynamics' Straka/SK94 numbers).

The full benchmark lives in examples/bf02_moist_benchmark.py (setup,
published values, and the model-adiabat base-state construction).
Measured convergence of w_max(t=1000 s) toward the published value
(BF02 Delta=100 m: ~14.3 m/s; reproductions 13.9-14.6):

    Delta = 417 m ->  3.97 m/s   (thermal under-resolved)
    Delta = 208 m -> 10.76 m/s   (this test's resolution)
    Delta = 139 m -> 14.09 m/s   (within 1.5% of published)

This test pins the Delta = 208 m point (31 s of suite time) and the
material theta_e conservation criterion; the 139 m published-number
agreement is recorded in docs/RESULTS.md and reproducible with
    python examples/bf02_moist_benchmark.py --cpu --cells 48 --zdim 48
        --ts 0.15
"""

import importlib.util
import os
import sys

import numpy as np
import jax.numpy as jnp

_spec = importlib.util.spec_from_file_location(
    "bf02_example",
    os.path.join(os.path.dirname(__file__), "..", "examples",
                 "bf02_moist_benchmark.py"),
)
bf = importlib.util.module_from_spec(_spec)
sys.modules["bf02_example"] = bf
_spec.loader.exec_module(bf)


def test_bf02_wmax_converging_to_published(tmp_path):
    from scythe_tpu import create_grid
    from scythe_tpu import timeintegration as ti
    from scythe_tpu.io import read_physical_grid
    from scythe_tpu.model import build_context, build_step, make_scan

    model = bf.build_model(str(tmp_path), num_cells=32, zdim=40, ts=0.25,
                           t_end=1000.0)
    grid = create_grid(model.grid_params, jnp.float64)
    ctx = build_context(model, grid, jnp.float64)
    bf.write_ics(model, grid, ctx.ref_state)
    phys0 = read_physical_grid(model.initial_conditions, grid)
    spec0 = grid.analysis(jnp.asarray(phys0, jnp.float64))
    state = ti.initial_state(spec0, (grid.nvars,) + grid.spatial_shape,
                             jnp.float64)
    step = build_step(model, grid, ctx, jnp.float64)

    phys = np.asarray(grid.synthesis(state.spec)["val"])
    w0, tmx0, tmn0, te_lo0, te_hi0 = bf.diagnostics(grid, ctx.ref_state, phys)
    # the theta_rho' bubble is +2 K (spectral fit of the cos^2 cap)
    assert 1.8 < tmx0 < 2.1 and abs(tmn0) < 0.15 and w0 == 0.0

    state = make_scan(step, 4000)(state)  # 1000 s at ts = 0.25
    phys = np.asarray(grid.synthesis(state.spec)["val"])
    assert np.isfinite(phys).all()
    wm, tmx, tmn, te_lo, te_hi = bf.diagnostics(grid, ctx.ref_state, phys)

    # Delta = 208 m point of the measured convergence to the published
    # 14.3 m/s (band = measured 10.76 +- 15%: catches numerics drift
    # without over-pinning an under-converged value)
    assert 9.1 < wm < 12.4, wm
    # material theta_e conservation (max principle on the invariant):
    # extrema must not escape the initial range by more than ~1 K
    assert te_lo > te_lo0 - 1.0, (te_lo, te_lo0)
    assert te_hi < te_hi0 + 1.0, (te_hi, te_hi0)
