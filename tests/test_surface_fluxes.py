"""Bulk air-sea surface fluxes (options['surface_fluxes'],
model.build_surface_fluxes) — the WISHE engine for TC intensification;
demo: examples/tc_intensification_rlz.py."""

import numpy as np
import jax.numpy as jnp
import pytest

from scythe_tpu import BC, GridParameters, ModelParameters, create_grid
from scythe_tpu import timeintegration as ti
from scythe_tpu.model import (build_context, build_step,
                              build_surface_fluxes, make_scan)
from scythe_tpu.physics import thermodynamics as td

MOIST = {"s": 1, "xi": 2, "mu": 3, "u": 4, "w": 5, "mu_l": 6, "qss": 7}


def _sounding(tmp_path):
    zs = np.linspace(0.0, 12000.0, 50)
    theta = 300.0 + 0.004 * zs
    qv = 14.0 * np.exp(-zs / 2500.0)
    p = tmp_path / "snd.txt"
    with open(p, "w") as f:
        f.write(f"1013.0 {theta[0]} {qv[0]}\n")
        for z, th, q in zip(zs[1:], theta[1:], qv[1:]):
            f.write(f"{z} {th} {q}\n")
    return str(p)


def _model(tmp_path, sfx, ts=1.0, T=600.0):
    gp = GridParameters(
        geometry="RZ",
        xmin=0.0,
        xmax=50000.0,
        num_cells=6,
        zmin=0.0,
        zmax=10000.0,
        zDim=20,
        BCL={"u": BC.R1T0, "w": BC.R1T1},
        BCR={"u": BC.R1T0},
        vars=MOIST,
    )
    return ModelParameters(
        ts=ts,
        integration_time=T,
        output_interval=T,
        equation_set="BF02_test",
        initial_conditions="unused",
        output_dir=str(tmp_path / "out"),
        ref_state_file=_sounding(tmp_path),
        grid_params=gp,
        physical_params={"K": 10.0},
        # ts=1.0 exceeds the explicit qss-relaxation limit at this lid
        # (ts*invtau ~ 3.5 aloft) — run with the stiff limiter, the
        # production deep-column combination
        options={"semiimplicit": True, "stiff_relaxation": "exp",
                 "surface_fluxes": sfx},
    )


def _run(model, phys0=None, n=600):
    grid = create_grid(model.grid_params, jnp.float64)
    ctx = build_context(model, grid, jnp.float64)
    if phys0 is None:
        phys0 = np.zeros((grid.nvars,) + grid.spatial_shape)
    spec0 = grid.analysis(jnp.asarray(phys0))
    state = ti.initial_state(spec0, (grid.nvars,) + grid.spatial_shape, jnp.float64)
    step = build_step(model, grid, ctx, jnp.float64)
    state = make_scan(step, n)(state)
    return grid, np.asarray(grid.synthesis(state.spec)["val"])


def test_resting_column_warms_and_moistens(tmp_path):
    """Warm SST under a resting reference atmosphere: the surface layer
    gains entropy and moisture at the bulk rate; the interior stays
    quiet (this is how a WISHE boundary layer energizes)."""
    model = _model(tmp_path, {"sst": 302.0, "depth": 500.0})
    grid, phys = _run(model)
    assert np.isfinite(phys).all()
    s_sfc = phys[0][:, 0].mean()
    mu_sfc = phys[2][:, 0].mean()
    assert s_sfc > 0.05, s_sfc  # warming
    assert mu_sfc > 1e-6, mu_sfc  # moistening
    # decays with the exp(-z/depth) deposition: 5 km value far smaller
    assert abs(phys[0][:, 13].mean()) < 0.1 * s_sfc


def test_momentum_drag_decays_surface_wind(tmp_path):
    model = _model(tmp_path, {"sst": 300.0, "Cd": 3.0e-3, "depth": 500.0})
    grid = create_grid(model.grid_params, jnp.float64)
    z = grid.gridpoints()[:, 1].reshape(grid.spatial_shape)
    phys0 = np.zeros((grid.nvars,) + grid.spatial_shape)
    phys0[3] = 10.0 * np.exp(-z / 1500.0)  # low-level jet
    _, phys = _run(model, phys0)
    assert np.isfinite(phys).all()
    u_sfc0 = 10.0
    u_sfc = phys[3][:, 0].mean()
    assert u_sfc < 0.98 * u_sfc0  # drag spun it down measurably


def test_flux_magnitude_matches_bulk_formula(tmp_path):
    """One application of the flux operator on the resting state equals
    the analytic bulk tendency Ck*floor*(x* - xbar)*w(z)."""
    model = _model(tmp_path, {"sst": 302.0, "Ck": 2.0e-3, "depth": 400.0,
                              "wind_floor": 3.0})
    grid = create_grid(model.grid_params, jnp.float64)
    ctx = build_context(model, grid, jnp.float64)
    apply = build_surface_fluxes(grid, ctx, {"sst": 302.0, "Ck": 2.0e-3,
                                             "depth": 400.0,
                                             "wind_floor": 3.0}, jnp.float64)
    phys = jnp.zeros((grid.nvars,) + grid.spatial_shape)
    out = np.asarray(apply(jnp.zeros_like(phys), phys))
    rs = ctx.ref_state
    sbar0 = float(rs.sbar[0, 0])
    _, rho0, _, p0 = (float(x) for x in td.thermodynamic_tuple(
        sbar0, float(rs.xibar[0, 0]), float(rs.mubar[0, 0])))
    q_star = float(td.q_sat_liquid(jnp.asarray(302.0), p0))
    s_star = float(td.entropy(jnp.asarray(302.0), rho0, q_star))
    z = np.asarray(grid.z_mish)
    wz = np.exp(-(z - z[0]) / 400.0)
    trapz = getattr(np, "trapezoid", None) or np.trapz
    wz /= trapz(wz, z)
    expect = 2.0e-3 * 3.0 * (s_star - sbar0) * wz
    assert np.allclose(out[0], expect[None, :], rtol=1e-12)
    # u tendency is zero at zero wind (drag ~ u)
    assert np.abs(out[3]).max() == 0.0


def test_surface_fluxes_require_ref_state_and_vars(tmp_path):
    import dataclasses

    model = _model(tmp_path, {"sst": 302.0})
    # disable semiimplicit so the surface-flux validation is what fires
    model = dataclasses.replace(
        model, ref_state_file="",
        options={"surface_fluxes": {"sst": 302.0}},
    )
    grid = create_grid(model.grid_params, jnp.float64)
    ctx = build_context(model, grid, jnp.float64)
    with pytest.raises(ValueError, match="surface_fluxes.*ref_state"):
        build_step(model, grid, ctx, jnp.float64)
