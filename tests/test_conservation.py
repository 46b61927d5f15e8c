"""Conservation properties of the discretization (quality gates).

Linear shallow water on a periodic 1-D domain: mass is exactly conserved by
the divergence form, and energy must be nearly conserved (slow monotone
decay from the spline filter, no growth)."""

import numpy as np
import jax.numpy as jnp

from scythe_tpu import BC, GridParameters, ModelParameters, create_grid
from scythe_tpu import timeintegration as ti
from scythe_tpu.basis import bspline
from scythe_tpu.model import build_context, build_step, make_scan


def test_periodic_sw_mass_and_energy(tmp_path):
    gp = GridParameters(
        geometry="R",
        xmin=0.0,
        xmax=1000.0,
        num_cells=64,
        BCL={"h": BC.PERIODIC, "u": BC.PERIODIC},
        BCR={"h": BC.PERIODIC, "u": BC.PERIODIC},
        vars={"h": 1, "u": 2},
    )
    g_, H = 9.81, 100.0
    model = ModelParameters(
        ts=0.05,  # omega_max*dt ~ 0.3 (AB3 gravity-wave CFL)
        integration_time=50.0,
        output_interval=50.0,
        equation_set="LinearShallowWater1D",
        grid_params=gp,
        physical_params={"g": g_, "K": 0.0, "H": H},
    )
    grid = create_grid(gp, jnp.float64)
    ctx = build_context(model, grid, jnp.float64)
    step = build_step(model, grid, ctx, jnp.float64)

    r = grid.r_mish
    h0 = np.exp(-(((r - 500.0) / 80.0) ** 2))
    phys0 = jnp.asarray(np.stack([h0, np.zeros_like(h0)]))
    state = ti.initial_state(
        grid.analysis(phys0), (2,) + grid.spatial_shape, jnp.float64
    )
    w = bspline.mish_weights(0.0, 1000.0, 64)

    def diag(st):
        f = grid.synthesis(st.spec)["val"]
        h, u = np.asarray(f[0]), np.asarray(f[1])
        mass = np.sum(w * h)
        energy = np.sum(w * (g_ * h * h + H * u * u)) / 2.0
        return mass, energy

    m0, e0 = diag(state)
    scan = make_scan(step, 100)
    masses, energies = [], []
    for _ in range(10):
        state = scan(state)
        m, e = diag(state)
        masses.append(m)
        energies.append(e)
    # mass conserved to near machine precision
    assert np.abs(np.asarray(masses) - m0).max() < 1e-10 * abs(m0)
    # energy: bounded, non-growing beyond 0.1%, and not decaying more than
    # a few percent over 1000 steps (the l_q filter dissipates slightly)
    energies = np.asarray(energies)
    assert energies.max() < e0 * 1.001
    assert energies.min() > e0 * 0.93, energies.min() / e0
