"""Diagnostics: vorticity/divergence of analytic flows on the RL grid."""

import numpy as np
import jax.numpy as jnp

from scythe_tpu import BC, GridParameters, create_grid
from scythe_tpu import diagnostics as dg


def _grid():
    gp = GridParameters(
        geometry="RL",
        xmin=0.0,
        xmax=100.0,
        num_cells=32,
        lDim=32,
        BCL={"u": BC.R1T0, "v": BC.R1T0},
        vars={"u": 1, "v": 2},
    )
    return create_grid(gp, jnp.float64)


def test_solid_body_vorticity():
    g = _grid()
    r = g.r_mish[:, None]
    omega = 0.3
    u = np.zeros(g.spatial_shape)
    v = np.broadcast_to(omega * r, g.spatial_shape)
    fields = g.synthesis(g.analysis(jnp.asarray(np.stack([u, v]))))
    zeta = np.asarray(dg.relative_vorticity(fields, jnp.asarray(r), 0, 1))
    # solid body: zeta = 2 omega everywhere (interior; edges have fit error)
    assert np.allclose(zeta[3:-3], 2 * omega, rtol=2e-3)
    div = np.asarray(dg.divergence(fields, jnp.asarray(r), 0, 1))
    assert np.abs(div[3:-3]).max() < 2e-3 * 2 * omega


def test_radial_outflow_divergence():
    g = _grid()
    r = g.r_mish[:, None]
    a = 0.02
    u = np.broadcast_to(a * r, g.spatial_shape)  # u = a r -> div = 2a
    v = np.zeros(g.spatial_shape)
    fields = g.synthesis(g.analysis(jnp.asarray(np.stack([u, v]))))
    div = np.asarray(dg.divergence(fields, jnp.asarray(r), 0, 1))
    assert np.allclose(div[3:-3], 2 * a, rtol=2e-3)
    zeta = np.asarray(dg.relative_vorticity(fields, jnp.asarray(r), 0, 1))
    assert np.abs(zeta[3:-3]).max() < 2e-3 * 2 * a


def test_emanuel_potential_intensity():
    """E-MPI of a textbook tropical sounding lands in the literature
    range (60-80 m/s at SST ~28 C), scales with the air-sea thermo
    disequilibrium, and vanishes when the sea matches a saturated BL."""
    import numpy as np

    from scythe_tpu.diagnostics import emanuel_potential_intensity
    from scythe_tpu.physics import thermodynamics as td

    z = np.linspace(0.0, 16000.0, 40)
    Tk = np.maximum(300.0 - 6.5e-3 * z, 200.0)
    p = 1015.0 * np.exp(-z / 8000.0)
    q = 0.02 * np.exp(-z / 2500.0)
    v, To, dk = emanuel_potential_intensity(Tk, p, q, 301.15)
    assert 55.0 < v < 85.0, v
    assert To == 200.0
    # warmer sea -> stronger ceiling
    v_hot, _, _ = emanuel_potential_intensity(Tk, p, q, 303.15)
    assert v_hot > v
    # saturated BL at SST == T_b: zero disequilibrium -> zero MPI
    q_sat = float(np.asarray(td.q_sat_liquid(300.0, p[0])))
    q0 = q.copy()
    q0[0] = q_sat
    v0, _, dk0 = emanuel_potential_intensity(Tk, p, q0, 300.0)
    assert dk0 == 0.0 and v0 == 0.0
