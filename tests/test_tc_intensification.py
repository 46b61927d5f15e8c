"""Contract for the TC-intensification configuration (round-4 sweep 10,
the first WISHE-closed mature-vortex run: docs/RESULTS.md, 15 -> 78 m/s
over 150 h at 5 km cells).

Full-size runs are device work; this pins the configuration's
*ingredients* at reduced size so regressions in any link of the
measured causal chain (moist envelope at fixed temperature ->
saturation sustained; cond_tau -> onset de-impulsed; deep envelope ->
condensate forms) fail fast on CPU.
"""

import importlib.util
import os

import numpy as np
import jax.numpy as jnp
import pytest

_HERE = os.path.dirname(__file__)
_spec = importlib.util.spec_from_file_location(
    "tc_example",
    os.path.join(_HERE, "..", "examples", "tc_intensification_rlz.py"),
)
tc = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(tc)


@pytest.fixture(scope="module")
def small_model(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("tc_small"))
    model = tc.build_model(
        out, num_cells=16, ts=4.0, t_end=400.0, stable=True, cap=2.0e-4,
        rh=0.9, qv0=20.0, smag=0.2, ivd=True, cond_tau=30.0,
    )
    from scythe_tpu import create_grid
    from scythe_tpu.model import build_context

    grid = create_grid(model.grid_params, jnp.float64)
    ctx = build_context(model, grid, jnp.float64)
    return model, grid, ctx


def test_moist_core_holds_temperature(small_model):
    """The moist envelope must not disturb temperature: naive mu-only
    moistening drops T ~10 K per 4 g/kg (entropy carries L_v q/T) and
    initialized at RH 2-4 (measured round-4 bug)."""
    from scythe_tpu.io import read_physical_grid

    model, grid, ctx = small_model
    tc.write_ics(model, grid, ctx.ref_state, moist_core=0.85,
                 moist_core_depth=10000.0, vmax=15.0)
    phys0 = read_physical_grid(model.initial_conditions, grid)
    vm, rm, wm, qm, qc, rh, um = tc.intensity(
        grid, np.asarray(phys0), ctx.ref_state
    )
    assert 0.95 < rh < 1.05, rh  # saturated envelope, no supersat blast
    assert 14.0 < vm < 16.0

    # control: the mu-only (broken) construction would land RH ~2+
    from scythe_tpu.physics import thermodynamics as td

    rs = ctx.ref_state
    q_v, rho_d, Tk, p = (np.asarray(a) for a in td.thermodynamic_tuple(
        np.asarray(rs.sbar[:, 0]), np.asarray(rs.xibar[:, 0]),
        np.asarray(rs.mubar[:, 0])))
    q_sat = np.asarray(td.q_sat_liquid(Tk, p))
    T_moist = np.asarray(td.temperature(
        np.asarray(rs.sbar[:, 0]), rho_d, q_sat))
    k = int(np.argmax(q_sat - q_v))
    assert T_moist[k] < Tk[k] - 4.0  # the trap the fix avoids


def test_sweep10_config_integrates_and_condenses(small_model):
    """50 steps of the production option bundle at reduced size: finite,
    and the saturated envelope actually produces cloud water (the
    condensation pathway is live, not capped to nothing)."""
    from scythe_tpu import timeintegration as ti
    from scythe_tpu.io import read_physical_grid
    from scythe_tpu.model import build_step, make_scan
    from scythe_tpu.physics import thermodynamics as td

    model, grid, ctx = small_model
    tc.write_ics(model, grid, ctx.ref_state, moist_core=0.85,
                 moist_core_depth=10000.0, vmax=15.0)
    phys0 = read_physical_grid(model.initial_conditions, grid)
    spec0 = grid.analysis(jnp.asarray(phys0, jnp.float64))
    ctx.extras["sponge_ref"] = grid.synthesis(spec0)["val"]
    state = ti.initial_state(
        spec0, (grid.nvars,) + grid.spatial_shape, jnp.float64
    )
    step = build_step(model, grid, ctx, jnp.float64)
    out = make_scan(step, 50)(state)
    phys = np.asarray(grid.synthesis(out.spec)["val"])
    assert np.isfinite(phys).all()
    qc = np.asarray(td.ahyp(phys[6]))
    assert qc.max() > 1.0e-5, qc.max()  # condensation fired
    # vortex intact (no instant collapse)
    assert 10.0 < phys[4].max() < 25.0
