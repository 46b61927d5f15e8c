"""Stiff microphysics relaxation: the real deep-column instability.

Root cause (measured here, previously misattributed to the semi-implicit
acoustic split): the prognostic supersaturation is relaxed explicitly,
``dqss/dt = ... - qss*invtau``, and invtau_condensation ~ Dv ~ 1/p
(microphysics.py), so it GROWS with altitude.  Over a 20 km lid the top
levels reach ts*invtau ~ 0.8-4 — past the AB3 real-axis stability limit
(~0.545) — and roundoff in qss explodes through the latent-heat coupling
into s.  A dry 20 km column is stable at the same ts (pinned below),
which rules out the acoustic-split explanation.

Fix: options['stiff_relaxation']='exp' (EqContext.stiff_rate) replaces
each relaxation rate by the exponential-integrator effective rate
(1-exp(-r*ts))/ts capped at 0.4/ts, applied consistently to the qss sink
and the q_cond/q_evap sources so equilibria are preserved.  Measured:
the 20 km moist column then holds machine zero at ts=1.0 (10x the old
0.1 s ceiling; the next limit is the config's explicit horizontal
acoustic CFL, not the column).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from scythe_tpu import BC, GridParameters, ModelParameters, create_grid
from scythe_tpu import timeintegration as ti
from scythe_tpu.model import build_context, build_step, make_scan

MOIST_VARS = {"s": 1, "xi": 2, "mu": 3, "u": 4, "w": 5, "mu_l": 6, "qss": 7}


def _kink_sounding(tmp_path):
    """Tropopause-kink sounding: ~isothermal 213 K stratosphere above
    12 km — the deep COLD column that drives invtau past the limit."""
    zs = np.linspace(0.0, 24000.0, 80)
    theta = np.where(
        zs <= 12000.0,
        300.0 + 43.0 * (zs / 12000.0) ** 1.25,
        343.0 * np.exp(9.81 / (1004.0 * 213.0) * (zs - 12000.0)),
    )
    qv = np.where(zs <= 1200.0, 13.0, 13.0 * np.exp(-(zs - 1200.0) / 2200.0))
    qv = np.where(zs > 9000.0, 0.02, qv)
    p = tmp_path / "snd.txt"
    with open(p, "w") as f:
        f.write(f"1000.0 {theta[0]} {qv[0]}\n")
        for z, th, q in zip(zs[1:], theta[1:], qv[1:]):
            f.write(f"{z} {th} {q}\n")
    return str(p)


def _run_zero_pert(tmp_path, eqset, vars, ts, nsteps, options):
    gp = GridParameters(
        geometry="RZ",
        xmin=0.0,
        xmax=10000.0,
        num_cells=8,
        zmin=0.0,
        zmax=20000.0,
        zDim=24,
        BCL={"u": BC.R1T0, "w": BC.R1T1},
        BCR={"u": BC.R1T0},
        vars=vars,
    )
    model = ModelParameters(
        ts=ts,
        integration_time=nsteps * ts,
        output_interval=nsteps * ts,
        equation_set=eqset,
        initial_conditions="unused",
        output_dir=str(tmp_path / "out"),
        ref_state_file=_kink_sounding(tmp_path),
        grid_params=gp,
        physical_params={"K": 10.0},
        options=options,
    )
    grid = create_grid(gp, jnp.float64)
    ctx = build_context(model, grid, jnp.float64)
    spec0 = grid.analysis(jnp.asarray(np.zeros((grid.nvars,) + grid.spatial_shape)))
    state = ti.initial_state(spec0, (grid.nvars,) + grid.spatial_shape, jnp.float64)
    step = build_step(model, grid, ctx, jnp.float64)
    state = make_scan(step, nsteps)(state)
    return np.asarray(grid.synthesis(state.spec)["val"])


def test_stiff_rate_limiter_properties():
    from scythe_tpu.equations.common import EqContext

    def mk(opts, ts):
        return EqContext(grid=None, coords={}, params={}, options=opts,
                         ts=ts, var_index=None)

    r = jnp.asarray([1.0e-3, 0.1, 1.0, 20.0, 1.0e4])
    # default: identity (reference behavior)
    np.testing.assert_array_equal(np.asarray(mk({}, 0.25).stiff_rate(r)), np.asarray(r))
    eff = np.asarray(mk({"stiff_relaxation": "exp"}, 0.25).stiff_rate(r))
    # resolved limit: unchanged to O(r*ts)
    assert abs(eff[0] / 1.0e-3 - 1.0) < 2.0e-4
    # stiff limit: capped at 0.4/ts — inside the AB3 real-axis limit 0.545/ts
    assert eff[-1] <= 0.4 / 0.25 + 1e-12
    # monotone, positive
    assert (np.diff(eff) >= 0).all() and (eff > 0).all()


def test_deep_cold_column_repro_without_fix(tmp_path):
    """The pinned failure: 20 km moist column, zero perturbation, ts=0.25
    — ts*invtau ~ 4 at the top, qss roundoff explodes within ~100 steps.
    (The dry column below is stable at the same ts: it is the
    microphysics relaxation, not the acoustic split.)"""
    phys = _run_zero_pert(
        tmp_path, "BF02_test", MOIST_VARS, 0.25, 150, {"semiimplicit": True}
    )
    assert not np.isfinite(phys).all()


def test_dry_deep_column_stable_same_ts(tmp_path):
    dry = {"s": 1, "xi": 2, "mu": 3, "u": 4, "w": 5}
    phys = _run_zero_pert(
        tmp_path, "Euler_test", dry, 0.25, 150, {"semiimplicit": True}
    )
    assert np.isfinite(phys).all()
    assert np.abs(phys[4]).max() < 1e-10


@pytest.mark.parametrize("si_mode", ["constant", "variable"])
def test_deep_cold_column_stable_with_exp_relaxation(tmp_path, si_mode):
    """With the limited rates the same column holds machine zero at
    ts=1.0 — 10x the old ceiling — in both semi-implicit operator modes."""
    phys = _run_zero_pert(
        tmp_path,
        "BF02_test",
        MOIST_VARS,
        1.0,
        150,
        {"semiimplicit": True, "stiff_relaxation": "exp", "si_mode": si_mode},
    )
    assert np.isfinite(phys).all()
    assert np.abs(phys[4]).max() < 1e-10


def test_variable_si_operator_matches_constant_on_uniform_profile():
    """The variable-coefficient Helmholtz build reduces exactly to the
    reference's constant one when the profile is constant."""
    h_s = ti.helmholtz_matrix(24, 1.0e4, 1.0e5, 0.3)
    h_p = ti.helmholtz_matrix(24, 1.0e4, np.full(24, 1.0e5), 0.3)
    np.testing.assert_array_equal(h_s, h_p)


def test_bubble_physics_unchanged_by_limiter(tmp_path):
    """In the resolved regime the limiter is a small rate perturbation:
    a moist warm-bubble run (10 km lid, where ts*invtau stays below the
    limit) with 'exp' matches the default to ~10% in updraft amplitude —
    same rise, same condensation equilibrium."""
    gp = GridParameters(
        geometry="RZ",
        xmin=0.0,
        xmax=10000.0,
        num_cells=12,
        zmin=0.0,
        zmax=10000.0,
        zDim=24,
        BCL={"u": BC.R1T0, "w": BC.R1T1},
        BCR={"u": BC.R1T0},
        vars=MOIST_VARS,
    )
    grid = create_grid(gp, jnp.float64)
    pts = grid.gridpoints()
    r, z = pts[:, 0], pts[:, 1]
    rad = np.sqrt((r / 2000.0) ** 2 + ((z - 2000.0) / 2000.0) ** 2)
    s_pert = 2.0 * np.maximum(0.0, np.cos(np.pi * np.minimum(rad, 1.0) / 2.0)) ** 2

    outs = {}
    for name, opts in (
        ("ref", {"semiimplicit": True}),
        ("exp", {"semiimplicit": True, "stiff_relaxation": "exp"}),
    ):
        model = ModelParameters(
            ts=0.15,
            integration_time=90.0,
            output_interval=90.0,
            equation_set="BF02_test",
            initial_conditions=str(tmp_path / "ics.csv"),
            output_dir=str(tmp_path / "out"),
            ref_state_file=_kink_sounding(tmp_path),
            grid_params=gp,
            physical_params={"K": 5.0},
            options=opts,
        )
        with open(model.initial_conditions, "w") as f:
            f.write("r,z,s,xi,mu,u,w,mu_l,qss\n")
            for i in range(len(r)):
                f.write(f"{r[i]},{z[i]},{s_pert[i]},0.0,0.0,0.0,0.0,0.0,0.0\n")
        from scythe_tpu import integrate_model

        _, phys = integrate_model(model, write_outputs=False)
        outs[name] = phys
    w_ref, w_exp = outs["ref"][4], outs["exp"][4]
    assert np.isfinite(w_exp).all()
    assert w_ref.max() > 0.05  # the bubble actually rises
    assert abs(w_exp.max() - w_ref.max()) < 0.10 * w_ref.max() + 1e-4
