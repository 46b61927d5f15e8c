"""Pallas TPU kernel: fused semi-implicit vertical column solve.

The AI2* corrector (timeintegration.semiimplicit_adjustment) applies a
chain of six [nz, nz] operators to every vertical column:

    xf = F  @ x*          (Chebyshev truncation refit of xi*)
    xz = Dz @ x*          (d/dz of the refit)
    g  = bc_rows(ts' Pxi xz - w*)
    a  = Hinv @ g         (prefactorized Helmholtz solve)
    w  = S @ a
    xi = xf - ts' Ds @ a

As separate XLA GEMMs each stage round-trips the [ncols, nz] batch through
HBM.  This kernel keeps a tile of columns plus all six operators (a few
tens of KB) resident in VMEM and runs the whole chain per tile on the MXU.
Falls back transparently to the einsum path off-TPU (pallas interpret mode
in tests).

nz is small (typically 40-100), so operators are padded to the fp32 tile
granularity by the compiler; the batch dimension provides the parallelism.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(
    xstar_ref,
    wstar_ref,
    f_ref,
    dz_ref,
    hinv_ref,
    s_ref,
    ds_ref,
    scal_ref,  # [2] = (ts_term, pxi_bar) in SMEM
    w_out_ref,
    xi_out_ref,
):
    ts_term = scal_ref[0]
    pxi = scal_ref[1]
    x = xstar_ref[:]  # [tile, nz]
    w = wstar_ref[:]
    xf = jax.lax.dot_general(
        x, f_ref[:], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    xz = jax.lax.dot_general(
        x, dz_ref[:], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    g = ts_term * pxi * xz - w
    # BC row shuffle: g -> [0, 0, g[1:nz-1]]
    nz = g.shape[1]
    rolled = pltpu.roll(g, 1, 1)  # rolled[:, j] = g[:, j-1]
    col = jax.lax.broadcasted_iota(jnp.int32, g.shape, 1)
    g = jnp.where(col < 2, 0.0, rolled)
    a = jax.lax.dot_general(
        g, hinv_ref[:], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    w_out_ref[:] = jax.lax.dot_general(
        a, s_ref[:], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    xi_out_ref[:] = xf - ts_term * jax.lax.dot_general(
        a, ds_ref[:], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )


@functools.partial(jax.jit, static_argnames=("interpret", "tile"))
def fused_column_solve(
    xstar, wstar, F, Dz, Hinv, S, Ds, ts_term, pxi_bar, interpret=False, tile=256
):
    """Apply the fused chain to [ncols, nz] column batches.

    ``Hinv`` must already be the inverse of the bc-row-shuffled Helmholtz
    matrix (timeintegration.helmholtz_matrix).  Returns (w_new, xi_new).
    """
    ncols, nz = xstar.shape
    tile = min(tile, ncols)
    pad = (-ncols) % tile
    if pad:
        xstar = jnp.pad(xstar, ((0, pad), (0, 0)))
        wstar = jnp.pad(wstar, ((0, pad), (0, 0)))
    n = xstar.shape[0]
    scal = jnp.stack(
        [jnp.asarray(ts_term, jnp.float32), jnp.asarray(pxi_bar, jnp.float32)]
    )
    grid = (n // tile,)
    col_spec = pl.BlockSpec((tile, nz), lambda i: (i, 0), memory_space=pltpu.VMEM)
    op_spec = pl.BlockSpec((nz, nz), lambda i: (0, 0), memory_space=pltpu.VMEM)
    w_new, xi_new = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            col_spec,
            col_spec,
            op_spec,
            op_spec,
            op_spec,
            op_spec,
            op_spec,
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(col_spec, col_spec),
        out_shape=(
            jax.ShapeDtypeStruct((n, nz), jnp.float32),
            jax.ShapeDtypeStruct((n, nz), jnp.float32),
        ),
        interpret=interpret,
    )(
        xstar.astype(jnp.float32),
        wstar.astype(jnp.float32),
        F.astype(jnp.float32),
        Dz.astype(jnp.float32),
        Hinv.astype(jnp.float32),
        S.astype(jnp.float32),
        Ds.astype(jnp.float32),
        scal,
    )
    return w_new[:ncols], xi_new[:ncols]
