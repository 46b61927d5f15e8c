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


def _dot(a, b):
    """a [tile, k] @ b[z, k]^T -> [tile, z] with f32 accumulation."""
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )


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
    xf = _dot(x, f_ref[:])
    xz = _dot(x, dz_ref[:])
    g = ts_term * pxi * xz - w
    # BC row shuffle: g -> [0, 0, g[1:nz-1]]
    rolled = pltpu.roll(g, 1, 1)  # rolled[:, j] = g[:, j-1]
    col = jax.lax.broadcasted_iota(jnp.int32, g.shape, 1)
    g = jnp.where(col < 2, 0.0, rolled)
    a = _dot(g, hinv_ref[:])
    w_out_ref[:] = _dot(a, s_ref[:])
    xi_out_ref[:] = xf - ts_term * _dot(a, ds_ref[:])


def _mm3(x, oh_ref, ol_ref):
    """Compensated bf16_3x operator application inside the kernel: the MXU
    multiplies in bf16, so x and each operator O are split into bf16
    hi/lo parts and O_hi x_hi + O_lo x_hi + O_hi x_lo is accumulated in
    f32 (same scheme as Grid._mm; docs/NUMERICS.md)."""
    xh = x.astype(jnp.bfloat16)
    xl = (x - xh.astype(jnp.float32)).astype(jnp.bfloat16)
    return _dot(xh, oh_ref[:]) + _dot(xh, ol_ref[:]) + _dot(xl, oh_ref[:])


def _kernel_comp(
    xstar_ref,
    wstar_ref,
    f_h,
    f_l,
    dz_h,
    dz_l,
    hinv_h,
    hinv_l,
    s_h,
    s_l,
    ds_h,
    ds_l,
    scal_ref,
    w_out_ref,
    xi_out_ref,
):
    ts_term = scal_ref[0]
    pxi = scal_ref[1]
    x = xstar_ref[:]
    w = wstar_ref[:]
    xf = _mm3(x, f_h, f_l)
    xz = _mm3(x, dz_h, dz_l)
    g = ts_term * pxi * xz - w
    rolled = pltpu.roll(g, 1, 1)
    col = jax.lax.broadcasted_iota(jnp.int32, g.shape, 1)
    g = jnp.where(col < 2, 0.0, rolled)
    a = _mm3(g, hinv_h, hinv_l)
    w_out_ref[:] = _mm3(a, s_h, s_l)
    xi_out_ref[:] = xf - ts_term * _mm3(a, ds_h, ds_l)


def _split(op):
    """bf16 (hi, lo) split of an operator matrix."""
    o32 = op.astype(jnp.float32)
    hi = o32.astype(jnp.bfloat16)
    lo = (o32 - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


@functools.partial(jax.jit, static_argnames=("interpret", "tile", "mode"))
def fused_column_solve(
    xstar,
    wstar,
    F,
    Dz,
    Hinv,
    S,
    Ds,
    ts_term,
    pxi_bar,
    interpret=False,
    tile=256,
    mode="comp",
):
    """Apply the fused chain to [ncols, nz] column batches.

    ``Hinv`` must already be the inverse of the bc-row-shuffled Helmholtz
    matrix (timeintegration.helmholtz_matrix).  Returns (w_new, xi_new).

    ``mode``: "comp" (default) runs every dot as compensated bf16_3x —
    f32-grade accuracy at MXU rate (docs/NUMERICS.md); "plain" runs f32
    dots, which Mosaic rounds to bf16 on TPU (~1e-3 relative error;
    useful only for comparison).
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
    out_specs = (col_spec, col_spec)
    out_shape = (
        jax.ShapeDtypeStruct((n, nz), jnp.float32),
        jax.ShapeDtypeStruct((n, nz), jnp.float32),
    )
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    cols = (xstar.astype(jnp.float32), wstar.astype(jnp.float32))
    if mode == "comp":
        ops = []
        for o in (F, Dz, Hinv, S, Ds):
            ops.extend(_split(o))
        w_new, xi_new = pl.pallas_call(
            _kernel_comp,
            grid=grid,
            in_specs=[col_spec, col_spec] + [op_spec] * 10 + [smem],
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
        )(*cols, *ops, scal)
    else:
        w_new, xi_new = pl.pallas_call(
            _kernel,
            grid=grid,
            in_specs=[col_spec, col_spec] + [op_spec] * 5 + [smem],
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
        )(
            *cols,
            F.astype(jnp.float32),
            Dz.astype(jnp.float32),
            Hinv.astype(jnp.float32),
            S.astype(jnp.float32),
            Ds.astype(jnp.float32),
            scal,
        )
    return w_new[:ncols], xi_new[:ncols]
