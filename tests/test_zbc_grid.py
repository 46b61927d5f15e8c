"""Per-variable vertical boundary conditions at the grid level."""

import numpy as np
import jax.numpy as jnp

from scythe_tpu import GridParameters, ZBC, create_grid


def test_per_variable_z_bcs():
    gp = GridParameters(
        geometry="RZ",
        xmin=0.0,
        xmax=10.0,
        num_cells=4,
        zmin=0.0,
        zmax=1.0,
        zDim=20,
        BCB={"w": ZBC.R1T0},  # w = 0 at the bottom; s unconstrained
        BCT={"w": ZBC.R1T0},
        vars={"s": 1, "w": 2},
    )
    g = create_grid(gp, jnp.float64)
    rng = np.random.default_rng(0)
    f = rng.normal(size=(2,) + g.spatial_shape)
    spec = np.asarray(g.analysis(jnp.asarray(f)))
    # evaluate each variable's column fit at the exact boundaries:
    # sum_k a_k T_k(-1) = sum (-1)^k a_k ;  T_k(+1) = 1
    k = np.arange(gp.zDim)
    bottom = ((-1.0) ** k)
    top = np.ones(gp.zDim)
    # reconstruct z-coefficients: spec is [v, nb_r, nz-coeff]; any radial
    # basis combination keeps the per-variable BC property, so test the
    # synthesized column coefficients var by var via a mid-domain point
    from scythe_tpu.basis import chebyshev

    zops = chebyshev.build_ops(gp.zDim, 0.0, 1.0, gp.b_zDim)
    for v, name in enumerate(gp.vars):
        acoef = np.asarray(
            jnp.einsum("vkz,vrz->vrk", g.analysis_z, jnp.asarray(f))
        )[v]
        bottom_vals = acoef @ bottom
        if name == "w":
            assert np.abs(bottom_vals).max() < 1e-10
            assert np.abs(acoef @ top).max() < 1e-10
        else:
            assert np.abs(bottom_vals).max() > 1e-3  # unconstrained
