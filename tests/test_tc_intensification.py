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


def test_sweep10_onset_signatures_30min(small_model):
    """Medium-horizon (450-step / 30-min) contract for the mature-TC
    bundle (models/tc_mature_rlz.py): the links of the measured round-4
    causal chain that ARE reachable at 31 km cells must all fire —

      * RAIN onset (qr well past trace): the precipitation-efficiency
        pathway (condensation -> autoconversion past the 1 g/kg
        threshold -> collection -> active sedimentation) produces rain,
        the exact link whose absence (q_c pinned sub-threshold, qr = 0)
        stalled every pre-sweep-10 run;
      * a building warm core (positive core entropy perturbation);
      * the vortex intact over the horizon (bounded Vmax decay).

    Vmax INCREASE itself is NOT asserted: WISHE intensification needs
    convection-resolving (~5 km) cells and tens of simulated hours —
    measured here as a slow 13.7 -> 12.2 m/s drag decay over 4 h at 31
    km cells regardless of fluxes (round-5 probe), while the full-size
    run intensifies 15 -> 78 m/s (tc_sweep_r4/s10_deep_tau30_cap2e4.log,
    the protected artifact this contract guards the ingredients of).
    """
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
        spec0, (grid.nvars,) + grid.spatial_shape, jnp.float64, imp_rows=2
    )
    step = build_step(model, grid, ctx, jnp.float64)
    out = make_scan(step, 450)(state)
    phys = np.asarray(grid.synthesis(out.spec)["val"])
    assert np.isfinite(phys).all()
    # rain onset: measured 0.78 g/kg at 30 min; trace would be < 1e-5
    qr = np.asarray(td.ahyp(phys[7]))
    assert qr.max() > 1.0e-4, qr.max()
    # building warm core: core (inner radii, lower/mid levels) entropy
    # perturbation strongly positive (measured ~6.5 J/kg/K)
    assert phys[0, :3, :, :12].max() > 1.0
    # vortex intact: bounded decay, no collapse and no spin-up artifact
    vm = float(phys[4].max())
    assert 12.0 < vm < 20.0, vm
