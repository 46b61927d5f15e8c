"""Jablonowski & Williamson (2006) baroclinic-wave setup on the SLZ
shell (examples/jw06_baroclinic_slz.py) — pins the three measured
ingredients that make the pole-to-pole 3-D state integrable:

1. the exact perturbation-PGF cross term (ctx.vertical_pgf): without it
   the initial w forcing is ~1.9 m/s^2 (blow-up in 3 steps);
2. free (R0) vertical fits for the thermo/wind perturbations: the
   insulated R1T1 clamp was a non-converging ~0.5 m/s^2 surface misfit;
3. options['si_scale'] and the stratopause buoyancy-CFL timestep.

The full 9-day wave run is examples/jw06_baroclinic_slz.py (TPU);
this test keeps a coarse CPU version of the t=0 balance and a short
stability window in the suite.
"""

import importlib.util
import os
import sys

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

_spec = importlib.util.spec_from_file_location(
    "jw06_example",
    os.path.join(os.path.dirname(__file__), "..", "examples",
                 "jw06_baroclinic_slz.py"),
)
jw = importlib.util.module_from_spec(_spec)
sys.modules["jw06_example"] = jw
_spec.loader.exec_module(jw)

from scythe_tpu import create_grid
from scythe_tpu import timeintegration as ti
from scythe_tpu.model import build_context, build_step, make_scan
from scythe_tpu.physics import thermodynamics as td


def _setup(tmp_path, cells=12, nl=32, zdim=20, ts=15.0):
    model = jw.build_model(str(tmp_path), num_cells=cells, nl=nl,
                           zdim=zdim, ts=ts, t_end=86400.0)
    grid = create_grid(model.grid_params, jnp.float64)
    ctx = build_context(model, grid, jnp.float64)
    return model, grid, ctx


def test_initial_state_discretely_balanced(tmp_path):
    """The analytic JW06 state, fit on the grid, must carry a small
    residual w forcing: measured 0.033 m/s^2 at cells=16/zdim=24 (vs
    1.9 uncorrected / 0.5 with the R1T1 clamp).  Coarser test grid
    gets a looser but still order-separating bound."""
    model, grid, ctx = _setup(tmp_path)
    phys0 = jw.initial_fields(grid, ctx.ref_state, perturb=False)
    spec = grid.analysis(jnp.asarray(phys0, jnp.float64))
    f = grid.synthesis(spec)
    val, dz = f["val"], f["dz"]
    rs = ctx.ref_state
    sbar = np.asarray(rs.sbar)
    xibar = np.asarray(rs.xibar)
    mubar = np.asarray(rs.mubar)
    q_v, rho_d, Tk, _ = td.thermodynamic_tuple(
        val[0] + sbar[None, None, :, 0],
        val[1] + xibar[None, None, :, 0],
        val[2] + mubar[None, None, :, 0],
    )
    rho_t = rho_d * (1.0 + q_v)
    rhobar = td.dry_density(xibar[None, None, :, 0]) * (
        1.0 + td.ahyp(mubar[None, None, :, 0])
    )
    coeffs = td.pressure_gradient_coeffs(Tk, rho_d, q_v)
    mu_fac = td.dmudq(val[2] + mubar[None, None, :, 0], q_v)
    dpdz = ctx.vertical_pgf(coeffs, dz[0], dz[1], dz[2] / mu_fac)
    force = np.asarray(
        (-td.GRAVITY * (rho_t - rhobar) - dpdz) / rho_t
    )
    assert np.isfinite(force).all()
    assert np.abs(force).max() < 0.25, np.abs(force).max()
    # the uncorrected form is an order of magnitude worse (the pinned
    # regression: dropping the cross term must be visible)
    base = np.asarray(
        ctx.vertical_pgf(coeffs, dz[0], dz[1], dz[2] / mu_fac,
                         default_exact=False)
    )
    force_unc = np.asarray(
        (-td.GRAVITY * (rho_t - rhobar) - base) / rho_t
    )
    assert np.abs(force_unc).max() > 4.0 * np.abs(force).max()


def test_steady_state_short_window(tmp_path):
    """100 steps (25 min) of the unperturbed state: finite, w bounded,
    and the zonal jet essentially intact."""
    model, grid, ctx = _setup(tmp_path)
    phys0 = jw.initial_fields(grid, ctx.ref_state, perturb=False)
    spec0 = grid.analysis(jnp.asarray(phys0, jnp.float64))
    state = ti.initial_state(spec0, (grid.nvars,) + grid.spatial_shape,
                             jnp.float64)
    step = build_step(model, grid, ctx, jnp.float64)
    state = make_scan(step, 100)(state)
    phys = np.asarray(grid.synthesis(state.spec)["val"])
    assert np.isfinite(phys).all()
    w = phys[5]
    assert np.abs(w).max() < 1.0, np.abs(w).max()
    u0 = phys0[3].max()
    assert abs(phys[3].max() - u0) < 0.15 * u0


def test_lq0_analysis_is_idempotent(tmp_path):
    """l_q=0 makes analysis a pure LSQ left-inverse of synthesis: the
    per-step re-analysis is bitwise NEUTRAL.  With the default l_q=2
    penalty the fit map is contractive and, at 5760 steps/day, erodes
    the fitted jet ~30%/day with ZERO dynamics — the round-3/4
    "base-state drift" root cause (round 5; docs/RESULTS.md)."""
    model = jw.build_model(str(tmp_path), num_cells=8, nl=24, zdim=12,
                           ts=15.0, l_q=0.0)
    grid = create_grid(model.grid_params, jnp.float64)
    ctx = build_context(model, grid, jnp.float64)
    phys0 = jw.initial_fields(grid, ctx.ref_state, perturb=False)
    spec = grid.analysis(jnp.asarray(phys0, jnp.float64))
    s = spec
    for _ in range(50):
        s = grid.analysis(grid.synthesis(s)["val"])
    assert float(jnp.abs(s - spec).max()) < 1e-10 * float(
        jnp.abs(spec).max()
    )

    # control: the default penalty IS contractive on the same state
    model2 = jw.build_model(str(tmp_path) + "2", num_cells=8, nl=24,
                            zdim=12, ts=15.0, l_q=2.0)
    grid2 = create_grid(model2.grid_params, jnp.float64)
    s2 = spec2 = grid2.analysis(jnp.asarray(phys0, jnp.float64))
    for _ in range(50):
        s2 = grid2.analysis(grid2.synthesis(s2)["val"])
    u0 = float(grid2.synthesis(spec2)["val"][3].max())
    u50 = float(grid2.synthesis(s2)["val"][3].max())
    assert u50 < u0 - 0.05  # measurable erosion within 50 fits


def test_balanced_init_transfers_across_nl(tmp_path):
    """scythe_tpu.balance: the Newton solve runs on a small-nl replica
    grid; the zonal-mean (k=0) discrete operators are nl-independent, so
    the correction must reduce the PRODUCTION grid's fitted (v, w)
    tendency residuals by orders of magnitude (measured 1600x/5000x at
    12 cells round 5)."""
    import jax

    from scythe_tpu.balance import balance_zonal_state, _total_tendency
    from scythe_tpu.equations.common import get_equation_set

    model = jw.build_model(str(tmp_path), num_cells=8, nl=24, zdim=12,
                           ts=15.0, l_q=0.0)
    grid = create_grid(model.grid_params, jnp.float64)
    ctx = build_context(model, grid, jnp.float64)
    phys0 = jw.initial_fields(grid, ctx.ref_state, perturb=False)
    zm = np.asarray(phys0).mean(axis=2)
    bal, info = balance_zonal_state(model, zm, nl_solve=4, iters=3)
    assert info["history"][-1] < 0.02 * info["history"][0]

    eqset = get_equation_set(model.equation_set)
    vi = model.grid_params.var_index

    def resid(z):
        phys = jnp.asarray(z)[:, :, None, :] * jnp.ones(
            (1, 1, grid.nl, 1)
        )
        tot = _total_tendency(eqset, grid, ctx, phys)
        return np.asarray(
            jnp.stack(
                [tot[vi("v")].mean(axis=1), tot[vi("w")].mean(axis=1)]
            )
        )

    r_un = resid(zm)
    r_bal = resid(bal)
    # production-grid residual reduction matches the solve grid's
    assert np.abs(r_bal).max() < 0.02 * np.abs(r_un).max()


def test_wave_growth_on_balanced_base(tmp_path):
    """The round-5 growth-phase contract (round-4 VERDICT weak #1: the
    growth the spinup protocol achieved was never pinned).  One
    simulated day of the PERTURBED state on the l_q=0 + discretely-
    balanced base with the horizontal Smagorinsky closure — the exact
    production recipe of examples/jw06_baroclinic_slz.py minus the
    spinup protocol (obsoleted by the balance solve):

    * the base jet must HOLD (round-4 logs lost 2.3 m/s on day 1 at 48
      cells to the contractive l_q fit; the balanced l_q=0 run measures
      -0.8 m/s at this coarse 8-cell size, dynamics adjustment only);
    * the eddy must GROW from the 1 m/s u-bump: |v|_max 0 -> ~0.14 m/s
      by day 1 (baroclinic conversion; bounded above — no instability).

    Calibrated against the measured CPU-f64 run of 2026-08-20 (u_max
    35.47 -> 34.67, |v|_max 0.141, ps_eddy_min -0.09 hPa)."""
    model = jw.build_model(str(tmp_path), num_cells=8, nl=16, zdim=16,
                           ts=15.0, l_q=0.0, smag=0.21)
    grid = create_grid(model.grid_params, jnp.float64)
    ctx = build_context(model, grid, jnp.float64)

    from scythe_tpu.balance import balance_zonal_state

    base0 = jw.initial_fields(grid, ctx.ref_state, perturb=False)
    zm = np.asarray(base0).mean(axis=2)
    bal, info = balance_zonal_state(model, zm, verbose=False)
    assert info["history"][-1] < 1e-3 * info["history"][0]
    phys0 = jw.initial_fields(grid, ctx.ref_state, perturb=True)
    phys0 = np.asarray(phys0) + (bal - zm)[:, :, None, :]
    spec0 = grid.analysis(jnp.asarray(phys0, jnp.float64))
    state = ti.initial_state(spec0, (grid.nvars,) + grid.spatial_shape,
                             jnp.float64, imp_rows=2)
    step = build_step(model, grid, ctx, jnp.float64)
    scan = make_scan(step, 720)
    for _ in range(8):  # 5760 steps = 1 day at ts = 15
        state = scan(state)
    phys = np.asarray(grid.synthesis(state.spec)["val"])
    assert np.isfinite(phys).all()
    u0, u1 = float(phys0[3].max()), float(phys[3].max())
    v1 = float(np.abs(phys[4]).max())
    # base holds: day-1 jet loss under 1.5 m/s (vs 2.3 at day 1 in the
    # round-4 contractive-fit logs, compounding to u_max 25 by day 6)
    assert u1 > u0 - 1.5, (u0, u1)
    # eddy growth from the bump, bounded: the band brackets the
    # calibrated 0.141 with headroom for numerics drift
    assert 0.05 < v1 < 0.5, v1


def test_production_bundle_short_window(tmp_path):
    """The full round-5 production stabilizer bundle — 12-km top
    sponge + del^4 K4 + incremental closing analysis + isotropic
    Smagorinsky with the implicit-vertical-diffusion (Ri factor)
    convective closure — builds and integrates 100 steps finite with w
    bounded on the perturbed balanced state.  Pins the option WIRING
    (each piece has its own physics test; the device chain validates
    the long run): a regression that silently drops one of these
    options reproduces a measured multi-day TPU failure mode
    (docs/RESULTS.md round-5 JW06 forensic chain)."""
    model = jw.build_model(str(tmp_path), num_cells=12, nl=24, zdim=12,
                           ts=15.0, l_q=0.0, k4=5.0e15, smag=0.21,
                           ivd=True, sponge_top=12.0e3)
    od = dict(model.options)
    for key in ("hyperdiffusion_k4", "smagorinsky", "implicit_vdiff",
                "incremental_analysis", "sponge_top_width"):
        assert key in od, key
    grid = create_grid(model.grid_params, jnp.float64)
    ctx = build_context(model, grid, jnp.float64)
    phys0 = jw.initial_fields(grid, ctx.ref_state, perturb=True)
    spec0 = grid.analysis(jnp.asarray(phys0, jnp.float64))
    state = ti.initial_state(spec0, (grid.nvars,) + grid.spatial_shape,
                             jnp.float64, imp_rows=2)
    from scythe_tpu.model import _set_boundary_refs

    _set_boundary_refs(ctx, grid, spec0)
    step = build_step(model, grid, ctx, jnp.float64)
    state = make_scan(step, 100)(state)
    phys = np.asarray(grid.synthesis(state.spec)["val"])
    assert np.isfinite(phys).all()
    assert np.abs(phys[5]).max() < 1.0, np.abs(phys[5]).max()
    assert phys[3].max() > 30.0  # jet intact over 25 min
