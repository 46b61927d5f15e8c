"""Warm-rain (Ooyama 2001-style) microphysics (ref src/microphysics.jl).

Elementwise jnp versions of the reference process rates plus the post-step
condensation adjustment.  Branches become `jnp.where`; the Newton-iteration
saturation adjustment uses a fixed 10-iteration `lax.fori_loop` matching the
reference's cap.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import thermodynamics as td

_TINY = 1.0e-37  # must be representable in float32: 1e-300 underflows to
# exactly 0.0 there, silently disabling every max(x, _TINY) guard on the
# f32 production path -- measured as 0*log(0) = NaN in s_condensation
# wherever the dry stratosphere drives q_v to exact zero (docs/RESULTS.md)


def q_condensation(qss, Tk, p, q_v, q_l, N_c, r_c, invtau=None):
    """(ref microphysics.jl:102-112).  ``invtau`` overrides the internal
    rate so callers can pass a stability-limited one (EqContext.stiff_rate)
    consistently with the qss relaxation term — the equilibrium condensation
    flux is then preserved because the same rate appears in both."""
    Q_s = Q_s_factor(Tk, p, q_v, q_l)
    q_cond = qss / (1.0 + Q_s)
    q_cond = jnp.minimum(q_v, q_cond)
    q_cond = jnp.maximum(-q_l, q_cond)
    if invtau is None:
        invtau = invtau_condensation(Tk, p, N_c, r_c)
    return q_cond * invtau


def s_condensation(q_cond, Tk, rho_d, q_v, q_l, p):
    """Entropy source of condensation (ref microphysics.jl:115-123)."""
    Cm = (q_l * td.Cl) / (td.Cvd + q_v * td.Cvv + q_l * td.Cl)
    e = td.vapor_pressure(p, q_v)
    sat_e = td.sat_pressure_liquid_buck(Tk, p)
    # Guard the RATIO, not just e: max(e, _TINY)/sat_e still underflows to
    # 0.0 in float32 wherever sat_e > ~10 hPa (warm low levels) because XLA
    # flushes subnormals, and log(0) = -inf turns the masked q_cond = 0
    # branch into 0 * -inf = NaN (measured at f32 with an exactly-dry
    # point; tests/test_diagnostic_condensation.py).
    ratio = jnp.maximum(e / sat_e, _TINY)
    return q_cond * (
        (-td.L_v(Tk) * Cm) / Tk
        - td.Cl * jnp.log(Tk / td.T_0)
        + td.Rv * jnp.log(ratio)
    )


def Q_s_factor(Tk, p, q_v, q_l):
    e_s = td.sat_pressure_liquid_buck(Tk, p)
    dqsdT = td.sat_pressure_liquid_buck_dT(Tk, p) * td.Eps * p / (p - e_s) ** 2
    return td.L_v(Tk) * dqsdT / (td.Cpd + q_v * td.Cpv + q_l * td.Cl)


def dqsdp(Tk, p, rho_d, q_v, q_l):
    q_sat = td.q_sat_liquid(Tk, p)
    e_s = td.sat_pressure_liquid_buck(Tk, p)
    dqsdT = td.sat_pressure_liquid_buck_dT(Tk, p) * td.Eps * p / (p - e_s) ** 2
    return q_sat / (100.0 * (p - e_s)) - dqsdT / (
        rho_d * (td.Cpd + q_v * td.Cpv + q_l * td.Cl)
    )


def invtau_condensation(Tk, p, N_c, r_c):
    Dv = vapor_diffusity(Tk, p)
    return 4.0 * jnp.pi * Dv * N_c * (r_c * 1.0e-4)


def vapor_diffusity(Tk, p):
    """Pruppacher & Klett (1997); Tk in K, p in hPa, Dv in cm^2/s."""
    return 0.211 * (Tk / 273.15) ** 1.94 * (1013.25 / p)


def linear_saturation_adjustment(qss, Tk, p, q_v, q_l):
    """(ref microphysics.jl:85-100)."""
    q_sat = td.q_sat_liquid(Tk, p)
    Q_s = Q_s_factor(Tk, p, q_v, q_l)
    dq = (q_v - q_sat - qss) / (1.0 + Q_s)
    dq = jnp.minimum(q_v, dq)
    dq = jnp.maximum(-q_l, dq)
    return jnp.where(q_v == 0.0, 0.0, dq)


def saturation_adjustment(s, xi, mu, mu_l, tol=1.0e-12):
    """Newton iteration to saturation (ref microphysics.jl:1-70); returns
    (dq, dT).  Fixed 10 iterations with converged-mask freezing."""
    incr = 1.0e-6
    q_v, rho_d, Tk, p = td.thermodynamic_tuple(s, xi, mu)
    q_l = td.ahyp(mu_l)
    q_sat = td.q_sat_liquid(Tk, p)
    e_s = td.sat_pressure_liquid_buck(Tk, p)
    dqsdT = td.sat_pressure_liquid_buck_dT(Tk, p) * td.Eps * p / (p - e_s) ** 2
    cp = td.Cpd + q_v * td.Cpv + q_l * td.Cl
    dq0 = (q_sat - q_v) / (1.0 + td.L_v(Tk) * dqsdT / cp)
    SS0 = q_v - q_sat

    def body(_, carry):
        dq, SS = carry
        dq_up = dq + incr
        dT_up = -dq_up * td.L_v(Tk) / cp
        SS_up = (q_v + dq_up) - td.q_sat_liquid(Tk + dT_up, p)
        dT = -dq * td.L_v(Tk) / cp
        SS_dn = (q_v + dq) - td.q_sat_liquid(Tk + dT, p)
        dSSdq = (SS_up - SS_dn) / incr
        step = jnp.where(jnp.abs(dSSdq) > 0, SS_dn / dSSdq, 0.0)
        active = jnp.abs(SS_dn) > tol
        return jnp.where(active, dq - step, dq), SS_dn

    dq, SS = jax.lax.fori_loop(0, 9, body, (dq0, SS0))
    # clamp to available water (ref microphysics.jl:52-63)
    dq = jnp.where(q_v + dq < 0.0, -q_v, dq)
    dq = jnp.where(q_l - dq < 0.0, q_l, dq)
    dT = -dq * td.L_v(Tk) / cp
    zero = q_v == 0.0
    dq = jnp.where(zero, 0.0, dq)
    dT = jnp.where(zero, 0.0, dT)
    init_sat = jnp.abs(SS0) < tol
    dq = jnp.where(init_sat, 0.0, dq)
    dT = jnp.where(init_sat, 0.0, dT)
    return dq, dT


def autoconversion(q_c, rho_d):
    """Ooyama (2001) (ref microphysics.jl:197-205)."""
    return jnp.maximum(0.001 * (q_c - 0.001), 0.0)


def f_ice(Tk):
    """(ref microphysics.jl:216-224)."""
    sech = 1.0 / jnp.cosh((273.15 - Tk) / 5.0)
    return jnp.where(Tk < 273.15, 0.2 + 0.8 * sech, 1.0)


def collection(q_c, q_r, rho_d, Tk):
    """(ref microphysics.jl:207-214)."""
    qr = jnp.maximum(q_r, 0.0)
    return jnp.maximum(2.20 * q_c * qr**0.875 * f_ice(Tk), 0.0)


def rain_evaporation(q_r, rho_d, Tk, p):
    """(ref microphysics.jl:226-238)."""
    e_s = td.sat_pressure_liquid_buck(Tk, p)
    rho_vs = e_s / (td.Rv * Tk)
    rho_r = jnp.maximum(q_r * rho_d, 0.0)
    q_evap = (f_ventilation(q_r, rho_d, Tk) * rho_r**0.525) / (
        1.0e4 * (2.03 * rho_vs + 3.337 / Tk)
    )
    return jnp.maximum(q_evap, 0.0)


def f_ventilation(q_r, rho_d, Tk):
    rho_r = jnp.maximum(q_r * rho_d, 0.0)
    return jnp.maximum(1.6 + 30.39 * rho_r**0.2046 * f_ice(Tk) ** 1.5, 0.0)


def sedimentation_formula(q_r, rho_d, Tk):
    """The reference's terminal-velocity expression verbatim
    (microphysics.jl:240-249): a NEGATIVE magnitude clamped at zero."""
    rho_r = jnp.maximum(q_r * rho_d, 0.0)
    Vt = -14.164 * rho_r**0.1364 * jnp.sqrt(td.rho_d0 / rho_d) * f_ice(Tk)
    return jnp.maximum(Vt, 0.0)


def sedimentation(q_r, rho_d, Tk):
    """Terminal velocity (ref microphysics.jl:240-249).

    NOTE: the reference formula yields Vt <= 0 (negative prefactor times
    nonnegative factors) and then clamps negatives to zero, so it always
    returns 0 (reference quirk, flagged in SURVEY.md 2.6; pinned by
    tests/test_physics.py over a broad randomized input range against
    ``sedimentation_formula``).  Returning a literal zero is therefore
    exact AND lets XLA fold the dependent rain-flux column GEMM away;
    ``fall_speed_sign = -1`` semantics are NOT silently introduced.

    Consequence (measured, docs/RESULTS.md): with rain never falling out,
    long moist convection accumulates unbounded q_r and eventually
    blows up — use ``options['sedimentation'] = 'active'``
    (EqContext.sedimentation -> ``sedimentation_active``) for
    physically-sedimenting runs.
    """
    return jnp.zeros_like(q_r * rho_d * Tk)


def sedimentation_active(q_r, rho_d, Tk):
    """The reference formula WITHOUT the sign-clamp bug: a negative
    (downward) rain terminal velocity, as the Ooyama (2001) form clearly
    intends.  Opt-in via ``options['sedimentation'] = 'active'``."""
    rho_r = jnp.maximum(q_r * rho_d, 0.0)
    return -14.164 * rho_r**0.1364 * jnp.sqrt(td.rho_d0 / rho_d) * f_ice(Tk)


def condensation_adjustment(var_np1, impdot_n, ctx):
    """Post-step Euler adjustment toward saturation using the advected
    supersaturation (ref condensation_adjustment, microphysics.jl:139-195).

    ``var_np1``: [nvars, *spatial]; uses vars s, xi, mu, mu_c (or mu_l),
    mu_r (optional), qss.  Returns the adjusted var_np1.
    """
    vi = ctx.var_index
    rs = ctx.ref_state
    s = var_np1[vi("s")]
    xi = var_np1[vi("xi")]
    mu = var_np1[vi("mu")]
    has_rain = "mu_r" in ctx.grid.params.vars
    cloud_name = "mu_c" if "mu_c" in ctx.grid.params.vars else "mu_l"
    mu_c = var_np1[vi(cloud_name)]
    qss = var_np1[vi("qss")]

    s_total = s + rs.sbar[None, :, 0]
    xi_total = xi + rs.xibar[None, :, 0]
    mu_total = mu + rs.mubar[None, :, 0]
    q_v, rho_d, Tk, p = td.thermodynamic_tuple(s_total, xi_total, mu_total)
    q_c = td.ahyp(mu_c)
    if has_rain:
        q_r = td.ahyp(var_np1[vi("mu_r")])
    else:
        q_r = jnp.zeros_like(q_c)
    q_l = q_c + q_r
    q_sat = td.q_sat_liquid(Tk, p)
    Q_s = Q_s_factor(Tk, p, q_v, q_l)

    # Default: the reference's partial relaxation toward the qss-shifted
    # saturation (tau_r = 0.25 per step).  options['condensation'] =
    # 'diagnostic' switches to a RATE-CAPPED saturation adjustment (no
    # qss shift): supersaturation is removed toward saturation every
    # step, but the per-step phase change is bounded by
    # options['condensation_rate_cap'] (kg/kg/s, default 2e-4) * ts.
    # The cap is essential on a spectral basis: an UNCAPPED full
    # adjustment is an impulsive pointwise source whose global spectral
    # re-projection rings, and the rung points re-fire the adjustment —
    # a measured ~10x/step ringing-adjustment resonance
    # (docs/RESULTS.md).  The cap keeps each increment spectrally gentle
    # while still bounding the latent-heating RATE a grid-point storm
    # can extract — the property the prognostic-qss scheme lacks.
    if ctx.options.get("condensation") == "diagnostic":
        tau_r = 1.0
        cap = float(ctx.options.get("condensation_rate_cap", 2.0e-4)) * ctx.ts
        q_cond = (q_v - q_sat) / (1.0 + Q_s)
        # options['condensation_tau'] (s, 0 = off): finite adjustment
        # timescale — remove only 1-exp(-ts/tau) of the supersaturation
        # per step instead of all of it.  The per-step FULL adjustment is
        # an impulsive point source whose spectral re-projection rings
        # and re-fires neighboring points (the measured saturation-onset
        # ringing-adjustment resonance, docs/RESULTS.md round 3 / the
        # round-4 bubble run's h36 death); a droplet-growth-scale tau
        # (~60-120 s) keeps each increment small against the acoustic
        # ts while the integrated rate still bounds supersaturation the
        # way the prognostic-qss scheme's relaxation does.
        tau_c = float(ctx.options.get("condensation_tau", 0.0) or 0.0)
        if tau_c > 0.0:
            q_cond = q_cond * (1.0 - float(np.exp(-ctx.ts / tau_c)))
        q_cond = jnp.clip(q_cond, -cap, cap)
    else:
        tau_r = 0.25
        q_cond = (q_v - q_sat - qss) / (1.0 + Q_s)
    q_cond = jnp.minimum(q_v, q_cond)
    q_cond = jnp.maximum(-q_c, q_cond)  # restrict to condensate, not rain
    mu_new = mu - tau_r * td.dmudq(mu_total, q_v) * q_cond
    mu_c_new = mu_c + tau_r * ctx.dmudq_source(mu_c, q_c) * q_cond
    s_new = s + tau_r * s_condensation(q_cond, Tk, rho_d, q_v, q_l, p)

    out = var_np1
    out = out.at[vi("s")].set(s_new)
    out = out.at[vi("mu")].set(mu_new)
    out = out.at[vi(cloud_name)].set(mu_c_new)
    return out
