"""Fused Pallas RLZ analysis kernel (experimental; docs/RESULTS.md records
the on-device measurement): interpret-mode equivalence with the einsum
compensated analysis — same operators, same 3-dot compensation, different
blocking/sum order, so agreement is f32-roundoff-level."""

import numpy as np
import jax.numpy as jnp
import pytest

from scythe_tpu import GridParameters, create_grid
from scythe_tpu.ops import pallas_transforms as pt


@pytest.mark.parametrize("nvars,cells,nl,nz", [(4, 16, 64, 20), (2, 12, 32, 16)])
def test_fused_analysis_matches_einsum(nvars, cells, nl, nz):
    gp = GridParameters(
        geometry="RLZ",
        xmin=0.0,
        xmax=3.0e5,
        num_cells=cells,
        lDim=nl,
        zmin=0.0,
        zmax=1.0e4,
        zDim=nz,
        vars={n: i + 1 for i, n in enumerate("abcdefgh"[:nvars])},
    )
    grid = create_grid(gp, jnp.float32, matmul="compensated")
    rng = np.random.default_rng(0)
    phys = jnp.asarray(
        rng.normal(size=(nvars,) + grid.spatial_shape), jnp.float32
    )
    want = np.asarray(grid.analysis(phys))
    got = np.asarray(pt.build_rlz_analysis(grid, interpret=True)(phys))
    err = np.abs(got - want).max() / np.abs(want).max()
    assert err < 1e-5, err
