"""Physics layer tests: thermodynamics, reference state, microphysics."""

import numpy as np
import jax.numpy as jnp
import pytest

from scythe_tpu.physics import microphysics as mp
from scythe_tpu.physics import thermodynamics as td


def test_entropy_temperature_roundtrip():
    Tk = np.array([250.0, 280.0, 300.0])
    rho_d = np.array([0.5, 0.9, 1.2])
    q_v = np.array([0.0, 0.005, 0.018])
    s = td.entropy(Tk, rho_d, q_v)
    Tk2 = td.temperature(np.asarray(s), rho_d, q_v)
    assert np.allclose(np.asarray(Tk2), Tk, rtol=1e-12)


def test_bhyp_ahyp_roundtrip_and_jacobian():
    q = np.array([0.0, 1e-6, 1e-4, 1e-2, 0.03])
    mu = np.asarray(td.bhyp(q))
    q2 = np.asarray(td.ahyp(mu))
    assert np.allclose(q2, q, atol=1e-18)
    # finite-difference check of dmudq (skip q=0 where fd is inaccurate at
    # the q0=1e-7 regularization scale)
    eps = 1e-10
    fd = (np.asarray(td.bhyp(q + eps)) - mu) / eps
    assert np.allclose(np.asarray(td.dmudq(mu, q))[1:], fd[1:], rtol=1e-4)
    # negative mu maps to zero vapor
    assert float(td.ahyp(jnp.asarray(-1e-5))) == 0.0


def test_thermodynamic_tuple_consistency():
    s, xi, mu = 150.0, -0.1, float(td.bhyp(0.01))
    q_v, rho_d, Tk, p = (float(x) for x in td.thermodynamic_tuple(s, xi, mu))
    assert np.isclose(q_v, 0.01, atol=1e-12)
    assert np.isclose(rho_d, td.rho_d0 * np.exp(-0.1), rtol=1e-12)
    # pressure = dry + vapor partial pressures in hPa
    assert np.isclose(p, 0.01 * rho_d * Tk * (td.Rd + td.Rv * q_v), rtol=1e-12)
    # entropy of the recovered state reproduces s
    assert np.isclose(float(td.entropy(jnp.asarray(Tk), rho_d, q_v)), s, rtol=1e-10)


def test_pressure_gradient_matches_finite_difference():
    """P_s/P_xi/P_qv closure vs direct differentiation of pressure(s,xi,q)."""
    s0, xi0, q0v = 120.0, -0.05, 0.008
    mu0 = float(td.bhyp(q0v))

    def pressure_of(s, xi, q_v):
        rho_d = td.rho_d0 * np.exp(xi)
        Tk = float(td.temperature(jnp.asarray(s), rho_d, q_v))
        return 100.0 * 0.01 * rho_d * Tk * (td.Rd + td.Rv * q_v)  # Pa

    eps = 1e-7
    dpds = (pressure_of(s0 + eps, xi0, q0v) - pressure_of(s0 - eps, xi0, q0v)) / (2 * eps)
    q_v, rho_d, Tk, p = (float(x) for x in td.thermodynamic_tuple(s0, xi0, mu0))
    Ps = float(td.P_s(jnp.asarray(Tk), rho_d, q_v))
    assert np.isclose(Ps, dpds, rtol=1e-5)


def test_saturation_adjustment_converges():
    # a supersaturated state should condense (dq < 0 removes vapor)
    Tk, p = 285.0, 900.0
    q_sat = float(td.q_sat_liquid(jnp.asarray(Tk), p))
    q_v = 1.3 * q_sat
    rho_d = 100.0 * p / (td.Rd * Tk)
    s = float(td.entropy(jnp.asarray(Tk), rho_d, q_v))
    xi = float(td.log_dry_density(jnp.asarray(rho_d)))
    dq, dT = mp.saturation_adjustment(
        jnp.asarray(s), jnp.asarray(xi), jnp.asarray(float(td.bhyp(q_v))), jnp.asarray(0.0)
    )
    dq, dT = float(dq), float(dT)
    assert dq < 0.0  # removes vapor
    assert dT > 0.0  # latent heating
    # post-adjustment state is saturated at the state's own total pressure
    # (thermodynamic_tuple adds the vapor partial pressure)
    _, _, _, p_tot = (float(x) for x in td.thermodynamic_tuple(
        s, xi, float(td.bhyp(q_v))
    ))
    q_new = q_v + dq
    assert np.isclose(
        q_new, float(td.q_sat_liquid(jnp.asarray(Tk + dT), p_tot)), rtol=1e-3
    )


def test_microphysics_rates_signs():
    assert float(mp.autoconversion(jnp.asarray(0.0005), 1.0)) == 0.0
    assert float(mp.autoconversion(jnp.asarray(0.003), 1.0)) > 0.0
    assert float(mp.collection(jnp.asarray(0.001), jnp.asarray(0.001), 1.0, 280.0)) > 0.0
    assert float(mp.f_ice(jnp.asarray(300.0))) == 1.0
    assert 0.2 < float(mp.f_ice(jnp.asarray(250.0))) < 1.0
    # _TINY guards must be representable at float32: 1e-300 underflows to
    # exactly 0.0 there, silently disabling every max(x, _TINY) guard on
    # the f32 production path (measured: 0*log(0) = NaN in s_condensation
    # wherever a dry stratosphere drives q_v to exact zero)
    assert np.float32(mp._TINY) > 0.0
    f32 = jnp.float32
    out = mp.s_condensation(
        jnp.zeros((4,), f32),               # q_cond = 0
        jnp.full((4,), 215.0, f32),
        jnp.full((4,), 0.2, f32),
        jnp.zeros((4,), f32),               # q_v = 0 (dry stratosphere)
        jnp.zeros((4,), f32),
        jnp.full((4,), 120.0, f32),
    )
    assert np.isfinite(np.asarray(out)).all()
    # reference quirk: sedimentation always returns 0 (clamped)
    assert float(mp.sedimentation(jnp.asarray(0.001), 1.0, 280.0)) == 0.0
    # ... which the literal-zero shortcut relies on: the raw reference
    # formula is <= 0 (hence clamps to exactly 0) over the full physical
    # input range
    rng = np.random.default_rng(0)
    q_r = jnp.asarray(rng.uniform(0.0, 0.05, 4096))
    rho_d = jnp.asarray(rng.uniform(0.05, 1.5, 4096))
    Tk = jnp.asarray(rng.uniform(180.0, 330.0, 4096))
    formula = np.asarray(mp.sedimentation_formula(q_r, rho_d, Tk))
    assert (formula == 0.0).all()
    assert np.asarray(mp.sedimentation(q_r, rho_d, Tk)).max() == 0.0
    assert float(mp.rain_evaporation(jnp.asarray(0.001), 1.0, 280.0, 900.0)) > 0.0


def _write_sounding(path, zmax=10000.0):
    """Small moist tropical-ish sounding: theta increasing, q decreasing."""
    zs = np.linspace(0.0, zmax * 1.2, 40)
    theta = 300.0 + 0.004 * zs
    qv = 15.0 * np.exp(-zs / 2500.0)  # g/kg
    with open(path, "w") as f:
        f.write(f"1015.0 {theta[0]} {qv[0]}\n")
        for z, th, q in zip(zs[1:], theta[1:], qv[1:]):
            f.write(f"{z} {th} {q}\n")
    return path


def test_reference_state_hydrostatic(tmp_path):
    from scythe_tpu.physics.reference_state import interpolate_reference_file

    path = _write_sounding(str(tmp_path / "sounding.txt"))
    nz = 40
    rs = interpolate_reference_file(path, 0.0, 10000.0, nz, None)
    sbar = np.asarray(rs.sbar)
    xibar = np.asarray(rs.xibar)
    mubar = np.asarray(rs.mubar)
    assert sbar.shape == (nz, 3)
    # density decreases with height
    assert np.all(np.diff(xibar[:, 0]) < 0)
    # Pxi_bar ~ speed of sound squared (300-350 m/s)^2
    c2 = float(rs.Pxi_bar)
    assert 250.0**2 < c2 < 400.0**2
    # hydrostatic balance of the recovered (T, p): dp/dz ~ -rho g
    q_v, rho_d, Tk, p = (np.asarray(x) for x in __import__(
        "scythe_tpu.physics.thermodynamics", fromlist=["td"]
    ).thermodynamic_tuple(sbar[:, 0], xibar[:, 0], mubar[:, 0]))
    from scythe_tpu.basis import chebyshev
    zops = chebyshev.build_ops(nz, 0.0, 10000.0)
    dpdz = zops.dsynth @ (zops.constrain @ (zops.analysis @ (p * 100.0)))
    rho_t = rho_d * (1.0 + q_v)
    resid = dpdz + rho_t * td.GRAVITY
    # residual small relative to the weight term, away from the endpoints
    scale = np.abs(rho_t * td.GRAVITY).max()
    assert np.abs(resid[2:-2]).max() < 0.02 * scale


def test_potential_temperature_identities():
    # at p = p_0 (1000 hPa), theta == T by definition
    Tk, q_v = 290.0, 0.0
    # find (s, xi) that give p = 1000 exactly: dry air, rho from ideal gas
    rho_d = 100.0 * td.p_0 / (td.Rd * Tk)
    s = float(td.entropy(jnp.asarray(Tk), rho_d, q_v))
    xi = float(td.log_dry_density(jnp.asarray(rho_d)))
    theta = float(td.potential_temperature(s, xi, 0.0))
    assert np.isclose(theta, Tk, rtol=1e-10)


def test_theta_e_and_theta_rho_ordering():
    """theta_e >= theta (latent reserve); theta_rho < theta for moist air
    with condensate loading."""
    Tk, q_v = 295.0, 0.015
    rho_d = 1.0
    s = float(td.entropy(jnp.asarray(Tk), rho_d, q_v))
    xi = float(td.log_dry_density(jnp.asarray(rho_d)))
    mu = float(td.bhyp(q_v))
    theta = float(td.potential_temperature(s, xi, mu))
    theta_e = float(td.reversible_theta_e(s, xi, mu))
    theta_rho_dry_load = float(td.theta_rho(s, xi, mu, float(td.bhyp(0.003))))
    assert theta_e > theta
    # vapor raises theta_rho vs theta/(1+qt); condensate lowers it:
    theta_rho_noload = float(td.theta_rho(s, xi, mu, 0.0))
    assert theta_rho_dry_load < theta_rho_noload


def test_dewpoint_below_temperature_when_subsaturated():
    p, q_v = 950.0, 0.008
    Td = float(td.dewpoint(p, q_v))
    # air at 300 K with this vapor content is subsaturated
    assert Td < 300.0
    # and dewpoint of saturated air ~ its temperature
    Tk = 285.0
    q_sat = float(td.q_sat_liquid(jnp.asarray(Tk), p))
    Td_sat = float(td.dewpoint(p, q_sat))
    assert abs(Td_sat - Tk) < 1.0


def test_reference_quirks_dmudq_dispatch():
    """options['reference_quirks'] restores the reference's raw q->mu
    Jacobian; the default is the clamped stability guard (PARITY.md)."""
    import jax.numpy as jnp

    from scythe_tpu.equations.common import EqContext
    from scythe_tpu.physics import thermodynamics as td

    mu = jnp.asarray([-0.5, 0.1])  # mu < 0: raw Jacobian blows past clamp
    q = jnp.asarray([1e-6, 1e-3])

    def ctx(opts):
        return EqContext(
            grid=None, coords={}, params={}, options=opts, ts=1.0,
            var_index=lambda n: 0,
        )

    raw = np.asarray(td.dmudq(mu, q))
    clamped = np.asarray(td.dmudq_source(mu, q))
    assert raw[0] > 2.0 and clamped[0] == 2.0  # they differ where it matters
    np.testing.assert_array_equal(
        np.asarray(ctx({}).dmudq_source(mu, q)), clamped
    )
    np.testing.assert_array_equal(
        np.asarray(ctx({"reference_quirks": True}).dmudq_source(mu, q)), raw
    )
