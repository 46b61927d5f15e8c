"""Diagnostic (rate-capped saturation-adjustment) condensation mode.

``options['condensation'] = 'diagnostic'`` replaces the reference's
prognostic-qss partial relaxation (microphysics.jl:139-195) with a full
saturation adjustment whose per-step phase change is bounded by
``options['condensation_rate_cap']`` (kg/kg/s) — the grid-storm-regime
alternative flagged in docs/ROADMAP.md item 3.  These tests pin

* the per-step cap (both condensation and evaporation directions),
* relaxation toward (not past) saturation,
* the zero-vapor guard surviving at float32, and
* an end-to-end moist-bubble run on the rainfall_test set.
"""

import dataclasses

import numpy as np
import jax.numpy as jnp

from scythe_tpu import create_grid
from scythe_tpu.model import build_context
from scythe_tpu.physics import microphysics as mp
from scythe_tpu.physics import thermodynamics as td

from tests.test_moist import _moist_model, _write_bubble_ics

RAIN_VARS = {"s": 1, "xi": 2, "mu": 3, "u": 4, "w": 5, "mu_c": 6, "mu_r": 7,
             "qss": 8}


def _ctx(tmp_path, **opts):
    model = _moist_model(tmp_path, "rainfall_test", RAIN_VARS)
    model = dataclasses.replace(model, options={**model.opts(), **opts})
    grid = create_grid(model.grid_params, jnp.float64)
    return model, grid, build_context(model, grid, jnp.float64)


def _totals(var, ctx):
    vi = ctx.var_index
    rs = ctx.ref_state
    s = var[vi("s")] + rs.sbar[None, :, 0]
    xi = var[vi("xi")] + rs.xibar[None, :, 0]
    mu = var[vi("mu")] + rs.mubar[None, :, 0]
    return td.thermodynamic_tuple(s, xi, mu)


def test_rate_cap_bounds_per_step_condensation(tmp_path):
    cap_rate = 2.0e-4
    model, grid, ctx = _ctx(
        tmp_path, condensation="diagnostic", condensation_rate_cap=cap_rate
    )
    var = jnp.zeros((grid.nvars,) + grid.spatial_shape)
    # strongly supersaturated everywhere: +2 mu perturbation is far more
    # vapor than any q_sat in this sounding
    var = var.at[ctx.var_index("mu")].set(2.0)
    q_v0, _, Tk0, p0 = _totals(var, ctx)
    q_sat0 = td.q_sat_liquid(Tk0, p0)
    assert float(jnp.min(q_v0 - q_sat0)) > 0.0  # premise: supersaturated

    out = mp.condensation_adjustment(var, None, ctx)
    q_v1, _, _, _ = _totals(out, ctx)
    dq = np.asarray(q_v0 - q_v1)  # vapor condensed this step
    cap = cap_rate * ctx.ts
    assert dq.min() > 0.0  # everything condenses a bit
    # bounded by the cap (small slack for the dmudq linearization)
    assert dq.max() <= cap * 1.05
    # cloud water gains what vapor loses, up to the hyperbolic-compression
    # Jacobian: the reference's q->mu conversion uses the LOCAL dmudq, and
    # bhyp's transition scale q0 = 1e-7 makes ahyp(dmu) -> 2*dmu for
    # increments >> q0, so a cap-sized step from q_c = 0 lands at ~2x in
    # q-space (same behavior as the reference's adjustment).
    q_c1 = np.asarray(td.ahyp(out[ctx.var_index("mu_c")]))
    assert q_c1.min() > 0.0
    assert (q_c1 >= 0.9 * dq).all() and (q_c1 <= 2.2 * dq).all()
    # latent heating: entropy perturbation moves (s is the moist entropy;
    # the adjustment applies only the irreversible correction, which is
    # nonzero away from exact saturation)
    assert float(jnp.abs(out[ctx.var_index("s")]).max()) > 0.0


def test_rate_cap_bounds_evaporation_and_stops_at_cloud(tmp_path):
    cap_rate = 2.0e-4
    model, grid, ctx = _ctx(
        tmp_path, condensation="diagnostic", condensation_rate_cap=cap_rate
    )
    var = jnp.zeros((grid.nvars,) + grid.spatial_shape)
    # subsaturated columns (the unperturbed sounding is subsaturated)
    # carrying a little cloud: thin cloud evaporates entirely, thick cloud
    # evaporates at the cap
    thin = 1.0e-6
    q_c0 = jnp.full(grid.spatial_shape, 5.0e-4).at[:, :3].set(thin)
    var = var.at[ctx.var_index("mu_c")].set(td.bhyp(q_c0))
    q_v0, _, _, _ = _totals(var, ctx)

    out = mp.condensation_adjustment(var, None, ctx)
    q_v1, _, _, _ = _totals(out, ctx)
    q_c1 = np.asarray(td.ahyp(out[ctx.var_index("mu_c")]))
    dq = np.asarray(q_v1 - q_v0)  # vapor gained by evaporation
    cap = cap_rate * ctx.ts
    assert dq.min() >= 0.0
    assert dq.max() <= cap * 1.05
    # thin cloud can lose at most what it has
    assert q_c1[:, :3].max() <= thin * 1.05
    # cloud never driven negative (the -q_c clamp)
    assert q_c1.min() >= -1e-15


def test_adjustment_stops_at_saturation_not_past(tmp_path):
    """Supersaturation BELOW the cap is removed toward saturation in one
    step (tau_r = 1), never overshooting into subsaturation by more than
    the Q_s linearization allows.  (Adding vapor at fixed moist entropy
    also cools the state, so the low-level columns of this construction
    end up far above saturation — those points exercise the cap instead
    and are excluded from the one-step assertion.)"""
    model, grid, ctx = _ctx(tmp_path, condensation="diagnostic")
    vi = ctx.var_index
    var = jnp.zeros((grid.nvars,) + grid.spatial_shape)
    _, _, Tk, p = _totals(var, ctx)
    q_sat = td.q_sat_liquid(Tk, p)
    target = 1.00002 * q_sat * jnp.ones(grid.spatial_shape)
    var = var.at[vi("mu")].set(td.bhyp(target) - ctx.ref_state.mubar[None, :, 0])
    q_v0, _, Tk0, p0 = _totals(var, ctx)
    ss0 = np.asarray(q_v0 - td.q_sat_liquid(Tk0, p0))
    assert ss0.min() > 0.0

    out = mp.condensation_adjustment(var, None, ctx)
    q_v1, _, Tk1, p1 = _totals(out, ctx)
    ss1 = np.asarray(q_v1 - td.q_sat_liquid(Tk1, p1))
    cap = 2.0e-4 * ctx.ts
    mild = ss0 < 0.5 * cap
    assert mild.any()
    # one Newton step removes >75% of a sub-cap supersaturation, residual
    # of either sign
    assert (np.abs(ss1[mild]) < 0.25 * ss0[mild]).all()
    # capped points condense no more than the cap
    dq = np.asarray(q_v0 - q_v1)
    assert dq.max() <= cap * 1.05


def test_diagnostic_rainfall_bubble_end_to_end(tmp_path):
    """A vapor-loaded (initially supersaturated) moist bubble runs finite
    with the diagnostic mode and condenses cloud at the capped rate.
    (The dry-entropy-only bubble of test_moist does not reach saturation
    within this short window in either mode.)"""
    from scythe_tpu import integrate_model

    model = _moist_model(tmp_path, "rainfall_test", RAIN_VARS)
    model = dataclasses.replace(
        model, options={**model.opts(), "condensation": "diagnostic"}
    )
    grid = create_grid(model.grid_params, jnp.float64)
    pts = grid.gridpoints()
    r, z = pts[:, 0], pts[:, 1]
    rad = np.sqrt((r / 2000.0) ** 2 + ((z - 2000.0) / 2000.0) ** 2)
    shape = np.maximum(0.0, np.cos(np.pi * np.minimum(rad, 1.0) / 2.0)) ** 2
    names = list(model.grid_params.vars)
    with open(model.initial_conditions, "w") as f:
        f.write("r,z," + ",".join(names) + "\n")
        for i in range(len(r)):
            # +3 K-ish entropy AND a ~6 g/kg vapor excess (mu is the
            # compressed vapor variable; dq ~ 2*dmu at these magnitudes)
            vals = {"s": 3.0 * shape[i], "mu": 0.003 * shape[i]}
            f.write(
                f"{r[i]},{z[i]},"
                + ",".join(str(vals.get(n, 0.0)) for n in names)
                + "\n"
            )
    grid, phys = integrate_model(model, write_outputs=False)
    assert np.isfinite(phys).all()
    q_c = np.asarray(td.ahyp(jnp.asarray(phys[5])))
    assert q_c.max() > 1.0e-5  # the supersaturated core condenses cloud
    # and the per-step cap kept the total bounded: 150 steps * cap
    assert q_c.max() <= 150 * 2.0e-4 * model.ts * 2.2


def test_zero_vapor_point_survives_float32(tmp_path):
    """The f32 _TINY guard must hold in diagnostic mode too: an exactly
    dry point (q_v = 0) through the adjustment at float32 stays finite."""
    model, grid64, _ = _ctx(tmp_path, condensation="diagnostic")
    grid = create_grid(model.grid_params, jnp.float32)
    ctx = build_context(model, grid, jnp.float32)
    var = jnp.zeros((grid.nvars,) + grid.spatial_shape, jnp.float32)
    # drive total mu to a large negative value -> q_v = ahyp(mu) ~ 0
    var = var.at[ctx.var_index("mu")].set(
        -jnp.asarray(ctx.ref_state.mubar[None, :, 0], jnp.float32) - 30.0
    )
    out = mp.condensation_adjustment(var, None, ctx)
    assert bool(jnp.isfinite(out).all())


def test_prognostic_rate_cap():
    """EqContext.cap_condensation: clips the prognostic condensation
    RATE symmetrically when options['condensation_rate_cap'] is set,
    passes through untouched otherwise and under diagnostic
    condensation (whose post-step adjustment owns the cap)."""
    import jax.numpy as jnp
    import numpy as np

    from scythe_tpu.equations.common import EqContext

    rate = jnp.asarray([-3.0e-4, -1.0e-5, 0.0, 2.0e-5, 4.0e-4])

    def ctx_with(options):
        return EqContext(grid=None, coords={}, params={}, options=options,
                         ts=1.0, var_index=lambda n: 0)

    out = ctx_with({"condensation_rate_cap": 1.0e-4}).cap_condensation(rate)
    np.testing.assert_allclose(
        np.asarray(out), [-1.0e-4, -1.0e-5, 0.0, 2.0e-5, 1.0e-4]
    )
    out = ctx_with({}).cap_condensation(rate)
    assert np.array_equal(np.asarray(out), np.asarray(rate))
    out = ctx_with({"condensation": "diagnostic",
                    "condensation_rate_cap": 1.0e-4}).cap_condensation(rate)
    assert np.array_equal(np.asarray(out), np.asarray(rate))


def test_condensation_tau_partial_adjustment_factor(tmp_path):
    """options['condensation_tau'] removes exactly 1-exp(-ts/tau) of the
    (sub-cap) supersaturation a full adjustment would remove — the
    de-impulsing stabilizer that closed the saturation-onset resonance
    class on the TC runs (round 4; microphysics.py condensation_tau).
    Pins (a) the partial-removal factor itself against the tau=0 full
    adjustment, point by point, and (b) that the factor is applied
    BEFORE the rate cap, so strongly supersaturated points still
    condense min(cap, factor * ss) — tau softens onset, the cap still
    bounds the rate."""
    tau = 60.0
    model, grid, ctx_full = _ctx(tmp_path, condensation="diagnostic")
    _, _, ctx_tau = _ctx(
        tmp_path, condensation="diagnostic", condensation_tau=tau
    )
    factor = 1.0 - np.exp(-ctx_tau.ts / tau)
    assert 0.0 < factor < 0.05  # acoustic ts (0.2 s) vs droplet tau

    vi = ctx_full.var_index
    var = jnp.zeros((grid.nvars,) + grid.spatial_shape)
    _, _, Tk, p = _totals(var, ctx_full)
    q_sat = td.q_sat_liquid(Tk, p)
    # mild supersaturation: the FULL adjustment stays under the cap at
    # these points, so tau is the only difference between the two runs
    target = 1.00002 * q_sat * jnp.ones(grid.spatial_shape)
    var = var.at[vi("mu")].set(td.bhyp(target) - ctx_full.ref_state.mubar[None, :, 0])
    q_v0, _, _, _ = _totals(var, ctx_full)

    out_full = mp.condensation_adjustment(var, None, ctx_full)
    out_tau = mp.condensation_adjustment(var, None, ctx_tau)
    q_v_full, _, _, _ = _totals(out_full, ctx_full)
    q_v_tau, _, _, _ = _totals(out_tau, ctx_tau)
    dq_full = np.asarray(q_v0 - q_v_full)  # vapor removed, full
    dq_tau = np.asarray(q_v0 - q_v_tau)  # vapor removed, partial
    cap = 2.0e-4 * ctx_full.ts
    mild = (dq_full > 1e-12) & (dq_full < 0.5 * cap)
    assert mild.sum() > 10
    ratio = dq_tau[mild] / dq_full[mild]
    # the mu<->q_v map is mildly nonlinear; 2% tolerance on the factor
    np.testing.assert_allclose(ratio, factor, rtol=0.02)

    # (b) tau=0 (default) reproduces the full adjustment bitwise
    _, _, ctx_tau0 = _ctx(
        tmp_path, condensation="diagnostic", condensation_tau=0.0
    )
    out_tau0 = mp.condensation_adjustment(var, None, ctx_tau0)
    assert np.array_equal(np.asarray(out_tau0), np.asarray(out_full))

    # (c) factor-before-cap: a strongly supersaturated point under tau
    # still condenses, bounded by the cap
    var_hot = var.at[vi("mu")].set(2.0)
    out_hot = mp.condensation_adjustment(var_hot, None, ctx_tau)
    q_v_hot0, _, _, _ = _totals(var_hot, ctx_tau)
    q_v_hot1, _, _, _ = _totals(out_hot, ctx_tau)
    dq_hot = np.asarray(q_v_hot0 - q_v_hot1)
    assert dq_hot.max() > 0.0
    assert dq_hot.max() <= cap * 1.05
