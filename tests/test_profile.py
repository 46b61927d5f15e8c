"""The ``options['profile']`` preset system (round-3 VERDICT item: the
documented stable moist option set required hand-assembly, inviting
misconfigured long runs).

Contract:
* ``profile='moist_production'`` expands to the measured-stable bundle
  (active sedimentation, exp stiff relaxation, variable SI, diagnostic
  condensation, modal filter with geometry-appropriate axes —
  docs/RESULTS.md "the stable pair" + tools/probe_tc_blowup.py);
* explicit user options override their profile values;
* unknown profile names fail loudly;
* the preset actually RUNS the two headline moist configs (XYZ shower,
  RLZ TC) to finite state.
"""

import dataclasses

import numpy as np
import pytest

from scythe_tpu import GridParameters, ModelParameters


def test_profile_expansion_and_override():
    m = ModelParameters(
        grid_params=GridParameters(geometry="XYZ", vars={"u": 1}),
        options={"profile": "moist_production"},
    )
    o = m.opts()
    assert o["sedimentation"] == "active"
    assert o["stiff_relaxation"] == "exp"
    assert o["si_mode"] == "variable"
    assert o["condensation"] == "diagnostic"
    assert o["modal_filter_tau"] == 30.0
    assert o["modal_filter_axes"] == "rlz"
    assert "profile" not in o

    # geometry-dependent filter axes: balanced cylindrical/spherical
    # vortices must not get the radial factor (probe_tc_blowup.py)
    m2 = ModelParameters(
        grid_params=GridParameters(geometry="RLZ", vars={"u": 1}),
        options={"profile": "moist_production"},
    )
    assert m2.opts()["modal_filter_axes"] == "l"

    # explicit user options win
    m3 = ModelParameters(
        grid_params=GridParameters(geometry="XYZ", vars={"u": 1}),
        options={"profile": "moist_production", "modal_filter_tau": 60.0,
                 "condensation": "prognostic"},
    )
    o3 = m3.opts()
    assert o3["modal_filter_tau"] == 60.0
    assert o3["condensation"] == "prognostic"
    assert o3["sedimentation"] == "active"


def test_unknown_profile_raises():
    m = ModelParameters(
        grid_params=GridParameters(vars={"u": 1}),
        options={"profile": "nope"},
    )
    with pytest.raises(ValueError, match="nope"):
        m.opts()


def test_profile_runs_shower_xyz(tmp_path):
    """The preset must actually integrate the convective-shower (XYZ
    moist bubble) configuration: finite state, bubble rises."""
    import tests.test_xyz as tx

    gp, grid = tx._xyz_grid()
    pts = grid.gridpoints()
    x = pts[:, 0].reshape(grid.spatial_shape)
    z = pts[:, 2].reshape(grid.spatial_shape)
    phys0 = np.zeros((grid.nvars,) + grid.spatial_shape)
    phys0[0] = tx._bubble_s(x, z)
    model = tx._model(tmp_path, gp, "MoistEulerXYZ", "ics.csv")
    model = dataclasses.replace(model, options={"profile": "moist_production"})
    phys = tx._run(model, grid, phys0, 150)  # 30 s at ts = 0.2
    assert np.isfinite(phys).all()
    assert phys[5].max() > 0.01  # w: bubble rising


def test_profile_runs_tc_rlz(tmp_path):
    """The preset must integrate the TC (RLZ balanced vortex + surface
    fluxes) configuration a few hundred steps to finite state."""
    import importlib.util
    import os
    import sys

    import jax.numpy as jnp

    spec_ = importlib.util.spec_from_file_location(
        "tc_example",
        os.path.join(os.path.dirname(__file__), "..", "examples",
                     "tc_intensification_rlz.py"),
    )
    tc = importlib.util.module_from_spec(spec_)
    sys.modules["tc_example"] = spec_.loader.exec_module(tc) or tc

    from scythe_tpu import create_grid
    from scythe_tpu import timeintegration as ti
    from scythe_tpu.io import read_physical_grid
    from scythe_tpu.model import build_context, build_step, make_scan

    model = tc.build_model(str(tmp_path), num_cells=12, ts=2.0,
                           t_end=600.0, fluxes=True)
    model = dataclasses.replace(
        model, options={**model.opts(), "profile": "moist_production"}
    )
    dtype = jnp.float64
    grid = create_grid(model.grid_params, dtype)
    ctx = build_context(model, grid, dtype)
    tc.write_ics(model, grid, ctx.ref_state)
    phys0 = read_physical_grid(model.initial_conditions, grid)
    spec0 = grid.analysis(jnp.asarray(phys0, dtype))
    ctx.extras["sponge_ref"] = grid.synthesis(spec0)["val"]
    state = ti.initial_state(spec0, (grid.nvars,) + grid.spatial_shape, dtype)
    step = build_step(model, grid, ctx, dtype)
    out = make_scan(step, 300)(state)  # 10 min at ts = 2
    phys = np.asarray(grid.synthesis(out.spec)["val"])
    assert np.isfinite(phys).all()
    v = phys[4]
    assert v.max() > 8.0  # vortex survives (initial Vmax 12, drag decay)
