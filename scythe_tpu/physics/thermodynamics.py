"""Moist thermodynamic state functions (ref src/thermodynamics.jl).

All functions are elementwise jnp (vectorize over whole grids; XLA fuses
them into the tendency kernels).  Constants follow Emanuel (1994) exactly as
in the reference (thermodynamics.jl:1-32).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# Constants (ref thermodynamics.jl:1-16)
Rd = 287.04
Rv = 461.50
Eps = Rd / Rv
Cvd = 716.96
Cvv = 1410.0
Cpd = Cvd + Rd
Cpv = Cvv + Rv
Cl = 4186.0
Ci = 2106.0
GRAVITY = 9.81
gravity = GRAVITY
L_v0 = 2.501e6
T_0 = 273.16
p_0 = 1000.0
q0 = 1.0e-7

rho_d0 = 100.0 * p_0 / (T_0 * Rd)
# float(): np.exp yields an np.float64 scalar, which is a STRONG dtype in
# JAX — left as-is it silently promotes float32 fields to float64 whenever
# x64 is enabled (the bench mixes f32 accel runs with an f64 CPU proxy)
_es_T0 = float(6.112 * np.exp(17.67 * (T_0 - 273.15) / ((T_0 - 273.15) + 243.5)))
rho_v0 = 100.0 * _es_T0 / (T_0 * Rv)

_TINY = 1.0e-37  # must be representable in float32: 1e-300 underflows to
# exactly 0.0 there, silently disabling every max(x, _TINY) guard on the
# f32 production path -- measured as 0*log(0) = NaN in s_condensation
# wherever the dry stratosphere drives q_v to exact zero (docs/RESULTS.md)


def sat_pressure_liquid(Tk):
    Tc = Tk - 273.15
    return 6.112 * jnp.exp(17.67 * Tc / (Tc + 243.5))


def sat_pressure_ice(Tk):
    Tc = Tk - 273.15
    return 6.112 * jnp.exp(21.8745584 * Tc / (Tc + 265.49))


def L_v(Tk):
    return L_v0 + (Cpv - Cl) * (Tk - T_0)


def vapor_pressure(p, q_v):
    return (p * q_v) / (Eps + q_v)


def mixing_ratio(p, e):
    return (Eps * e) / (p - e)


def dewpoint(p, q_v):
    e = vapor_pressure(p, q_v)
    le = jnp.log(e / 6.112)
    return 243.5 * le / (17.67 - le) + 273.15


def entropy(Tk, rho_d, q_v):
    """Moist entropy (ref thermodynamics.jl:46-58)."""
    qs = jnp.maximum(q_v, _TINY)
    qfactor = jnp.where(
        q_v != 0.0,
        q_v * (Rv * jnp.log(qs * rho_d / rho_v0) - (L_v(T_0) / T_0)),
        0.0,
    )
    Cfactor = Cvd + q_v * Cvv
    return Cfactor * jnp.log(Tk / T_0) - Rd * jnp.log(rho_d / rho_d0) - qfactor


def vapor_entropy(Tk, rho_d, q_v):
    qs = jnp.maximum(q_v, _TINY)
    return jnp.where(
        q_v > 0.0,
        Cvv * jnp.log(Tk / T_0) - Rv * jnp.log(qs * rho_d / rho_v0) + L_v(T_0) / T_0,
        0.0,
    )


def temperature(s, rho_d, q_v):
    """Inverse of entropy at fixed (rho_d, q_v) (ref thermodynamics.jl:70-84)."""
    Cfactor = Cvd + q_v * Cvv
    qs = jnp.maximum(q_v, _TINY)
    qfactor = jnp.where(
        q_v != 0.0, (rho_d * qs / rho_v0) ** ((q_v * Rv) / Cfactor), 1.0
    )
    rhofactor = (rho_d / rho_d0) ** (Rd / Cfactor)
    Tfactor = jnp.exp((s - (q_v * L_v(T_0) / T_0)) / Cfactor)
    return T_0 * Tfactor * rhofactor * qfactor


def pressure(s, rho_d, q_v):
    Tk = temperature(s, rho_d, q_v)
    return 0.01 * Rd * Tk * rho_d + 0.01 * Rv * Tk * rho_d * q_v


# Buck-formula temperature guard: the fit has a pole at Tk ~ 15.3 K
# (Tc + 257.87 = 0) where exp(...) overflows — (p - e_s)^2 then hits Inf
# and NaN-poisons the whole spectral state in one transform (measured:
# the final stage of the mature-cell collapse, docs/RESULTS.md).  Inputs
# are clipped to the range where the fit is meaningful; physical states
# never reach the clip, runaway states stay finite (and diffusible)
# instead of detonating.
_T_SAT_MIN, _T_SAT_MAX = 100.0, 400.0


def sat_pressure_liquid_buck(Tk, phPa):
    """Buck (1981) with pressure enhancement (ref thermodynamics.jl:113-130)."""
    Tc = jnp.clip(Tk - 273.15, _T_SAT_MIN - 273.15, _T_SAT_MAX - 273.15)
    fw4 = 1.0 + 7.2e-4 + phPa * (3.20e-6 + 5.9e-10 * Tc**2)
    ew4 = 6.1121 * jnp.exp((18.729 - Tc / 227.3) * Tc / (Tc + 257.87))
    return fw4 * ew4


def sat_pressure_liquid_buck_dT(Tk, phPa):
    """d/dT of the Buck formula (ref thermodynamics.jl:132-153)."""
    Tc = jnp.clip(Tk - 273.15, _T_SAT_MIN - 273.15, _T_SAT_MAX - 273.15)
    C = 5.9e-10
    fw4 = 1.0 + 7.2e-4 + phPa * (3.20e-6 + C * Tc**2)
    d_fw4 = 2.0 * phPa * C * Tc
    b, c, d = 18.729, 257.87, 227.3
    ew4 = 6.1121 * jnp.exp((b - Tc / d) * Tc / (Tc + c))
    T1 = (d * b - 2.0 * Tc) * (d * (Tc + c)) - d * ((d * b * Tc) - Tc**2)
    T2 = (d * (Tc + c)) ** 2
    d_ew4 = ew4 * T1 / T2
    return ew4 * d_fw4 + fw4 * d_ew4


def sat_pressure_ice_buck(Tk, phPa):
    Tc = jnp.clip(Tk - 273.15, _T_SAT_MIN - 273.15, _T_SAT_MAX - 273.15)
    fi4 = 1.0 + 2.2e-4 + phPa * (3.83e-6 + 6.4e-10 * Tc**2)
    ei3 = 6.1115 * jnp.exp((23.036 - Tc / 333.7) * Tc / (Tc + 279.82))
    return fi4 * ei3


def q_sat_liquid(Tk, phPa):
    ew = sat_pressure_liquid_buck(Tk, phPa)
    return Eps * ew / (phPa - ew)


def q_sat_ice(Tk, phPa):
    ei = sat_pressure_ice_buck(Tk, phPa)
    return Eps * ei / (phPa - ei)


def bhyp(q_v):
    """Hyperbolic compression of vapor (ref thermodynamics.jl:184-188)."""
    return 0.5 * ((q_v + q0) - q0 * q0 / (q_v + q0))


def ahyp(mu):
    """Inverse of bhyp, clipped at zero (ref thermodynamics.jl:190-198)."""
    return jnp.where(mu < 0.0, 0.0, jnp.sqrt(mu * mu + q0 * q0) + mu - q0)


def dmudq(mu, q_v):
    return ((q_v + q0) - mu) / (q_v + q0)


def dmudq_source(mu, q_v):
    """dmudq clamped for use in q->mu source-term conversions.

    Physical states have mu = bhyp(q) >= 0 where dmudq is in (0, 1];
    spectral ringing can drive mu slightly negative, where the raw Jacobian
    blows up like -mu/q0 (q0 = 1e-7) and turns roundoff-level undershoot
    into an explosive feedback on the condensate tendencies.  Clamping at 2
    only alters the unphysical mu < -q0 region.  (Stability guard; the
    reference applies the raw Jacobian, microphysics.jl/testModels.jl.)
    """
    return jnp.minimum(dmudq(mu, q_v), 2.0)


def dry_density(xi):
    return rho_d0 * jnp.exp(xi)


def log_dry_density(rho_d):
    return jnp.log(rho_d / rho_d0)


def P_s(Tk, rho_d, q_v):
    Cfactor = Cvd + q_v * Cvv
    return Tk * ((rho_d * Rd) + (q_v * rho_d * Rv)) / Cfactor


def P_xi(Tk, rho_d, q_v):
    """Note: reproduces the reference expression verbatim, including its
    idiosyncratic (Rd + q_v*rho_d*Rv) factor (thermodynamics.jl:221-224)."""
    return (Rd + (q_v * rho_d * Rv)) * ((rho_d * Tk) + P_s(Tk, rho_d, q_v))


def P_xi_from_s(s, xi, mu):
    q_v, rho_d, Tk, p = thermodynamic_tuple(s, xi, mu)
    return P_xi(Tk, rho_d, q_v)


def P_qv(Tk, rho_d, q_v):
    qs = jnp.maximum(q_v, _TINY)
    rho_v = qs * rho_d
    qfactor = (
        Rv * (1.0 + jnp.log(rho_v / rho_v0))
        - Cvv * jnp.log(Tk / T_0)
        - L_v(T_0) / T_0
    ) * P_s(Tk, rho_d, q_v)
    return jnp.where(q_v != 0.0, rho_d * Rv * Tk + qfactor, 0.0)


def P_mu(Tk, rho_d, mu):
    q_v = ahyp(mu)
    return P_qv(Tk, rho_d, q_v) / dmudq(mu, q_v)


def pressure_gradient(Tk, rho_d, q_v, s_x, xi_x, qv_x):
    """(ref thermodynamics.jl:246-254)."""
    return (
        P_s(Tk, rho_d, q_v) * s_x
        + P_xi(Tk, rho_d, q_v) * xi_x
        + P_qv(Tk, rho_d, q_v) * qv_x
    )


def pressure_gradient_coeffs(Tk, rho_d, q_v):
    """(P_s, P_xi, P_qv) evaluated once, for callers that apply the same
    local coefficients to several directional gradients (the three
    perturbation directions + the reference vertical gradient).  One
    coefficient evaluation instead of the 3-4 ``pressure_gradient``
    calls would pay."""
    return P_s(Tk, rho_d, q_v), P_xi(Tk, rho_d, q_v), P_qv(Tk, rho_d, q_v)


def reference_pgf_columns(rs):
    """Ingredients of the exact perturbation-form vertical PGF.

    The chain rule gives dp/dz = P(local)·(pert_z + bar_z); the
    perturbation form computes -g rho' - P(local)·pert_z, which silently
    drops the CROSS term (P(local) - P(bar))·bar_z.  That term vanishes
    on the reference column but scales with the thermodynamic
    perturbation: measured 1.9 m/s^2 of spurious vertical acceleration
    on the Jablonowski-Williamson (2006) initial state (pole vs the
    45-deg reference column), and O(0.1 m/s^2) on a mature TC warm core.
    Returns (qbar_z [nz], pgf_bar [nz]) with pgf_bar = P(bar)·bar_z, so
    an equation set can form the corrected gradient as

        dpd_z + P(local)·bar_z - pgf_bar

    which reduces EXACTLY to the uncorrected form when the local state
    equals the reference column (the quiet column stays quiet regardless
    of the column's own discrete hydrostatic residual)."""
    sbar, xibar, mubar = rs.sbar, rs.xibar, rs.mubar
    qbar_v, rhobar_d, Tbar, _ = thermodynamic_tuple(
        sbar[:, 0], xibar[:, 0], mubar[:, 0]
    )
    qbar_z = mubar[:, 1] / dmudq(mubar[:, 0], qbar_v)
    pgf_bar = pressure_gradient(
        Tbar, rhobar_d, qbar_v, sbar[:, 1], xibar[:, 1], qbar_z
    )
    return qbar_z, pgf_bar


def thermodynamic_tuple(s, xi, mu):
    """(q_v, rho_d, Tk, p) from prognostic (s, xi, mu)
    (ref thermodynamics.jl:260-269)."""
    q_v = ahyp(mu)
    rho_d = dry_density(xi)
    Tk = temperature(s, rho_d, q_v)
    pd = 0.01 * Rd * Tk * rho_d
    e = 0.01 * Rv * Tk * rho_d * q_v
    return q_v, rho_d, Tk, pd + e


def potential_temperature(s, xi, mu):
    q_v, rho_d, Tk, p = thermodynamic_tuple(s, xi, mu)
    return Tk * (p_0 / p) ** (Rd / Cpd)


def reversible_theta_e(s, xi, mu, mu_l=0.0):
    q_v, rho_d, Tk, p = thermodynamic_tuple(s, xi, mu)
    q_l = ahyp(mu_l)
    q_t = q_v + q_l
    e = vapor_pressure(p, q_v)
    es = sat_pressure_liquid_buck(Tk, p)
    cp = Cpd + Cl * q_t
    theta_term = Tk * (p_0 / (p - e)) ** (Rd / cp)
    H_term = (e / es) ** ((-Rv * q_v) / cp)
    exp_term = jnp.exp(L_v(Tk) * q_v / (cp * Tk))
    return theta_term * H_term * exp_term


def theta_rho(s, xi, mu, mu_l=0.0):
    q_v, rho_d, Tk, p = thermodynamic_tuple(s, xi, mu)
    q_l = ahyp(mu_l)
    theta = potential_temperature(s, xi, mu)
    return theta * (1.0 + q_v / Eps) / (1.0 + q_v + q_l)
