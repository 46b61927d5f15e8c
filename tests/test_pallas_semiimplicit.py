"""Fused Pallas semi-implicit solve matches the einsum path (interpret mode)."""

import numpy as np
import jax.numpy as jnp
import pytest

from scythe_tpu import timeintegration as ti
from scythe_tpu.ops.pallas_semiimplicit import fused_column_solve


@pytest.mark.parametrize("mode,atol,rtol", [("plain", 2e-4, 1e-7), ("comp", 1e-2, 1e-4)])
def test_fused_solve_matches_einsum(mode, atol, rtol):
    nz, ncols = 40, 96
    ts = 0.2
    pxi = 90000.0
    ops = ti.build_semiimplicit_ops(
        nz, 0.0, 10000.0, None, pxi, ts, jnp.float64, use_pallas=False
    )
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(ncols, nz)))
    x = jnp.asarray(rng.normal(size=(ncols, nz)))
    zeros = jnp.zeros_like(w)
    t = jnp.asarray(5)

    w_ref, xi_ref = ti.semiimplicit_adjustment(
        ops, w, x, zeros, zeros, zeros, zeros, zeros, zeros, t
    )

    ts_term = 1.25 * ts
    # NB: fused_column_solve(xstar, wstar, ...) signature is (xi*, w*)
    w_k2, xi_k2 = fused_column_solve(
        x,
        w,
        ops.col_filter,
        ops.col_deriv,
        ops.hinv,
        ops.synth,
        ops.dsynth,
        ts_term,
        pxi,
        interpret=True,
        mode=mode,
    )
    # "plain" interpret runs true f32 GEMMs (tight); "comp" splits to
    # bf16_3x even in interpret mode, so it carries the scheme's ~1e-5
    # relative error (the point is that on REAL TPU hardware comp is the
    # ACCURATE mode; tools/validate_pallas.py measures it there)
    scale = np.abs(np.asarray(w_ref)).max()
    np.testing.assert_allclose(
        np.asarray(w_k2), np.asarray(w_ref), atol=atol * scale, rtol=rtol
    )
    scale = np.abs(np.asarray(xi_ref)).max()
    np.testing.assert_allclose(
        np.asarray(xi_k2), np.asarray(xi_ref), atol=atol * scale, rtol=rtol
    )


def test_fused_solve_pads_ragged_batches():
    nz, ncols = 24, 37  # not a multiple of the tile
    ops = ti.build_semiimplicit_ops(
        nz, 0.0, 1000.0, None, 1.0e5, 0.1, jnp.float64, use_pallas=False
    )
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(ncols, nz)))
    w = jnp.asarray(rng.normal(size=(ncols, nz)))
    w_k, xi_k = fused_column_solve(
        x, w, ops.col_filter, ops.col_deriv, ops.hinv, ops.synth, ops.dsynth,
        0.125, 1.0e5, interpret=True, tile=16, mode="plain",
    )
    assert w_k.shape == (ncols, nz)
    assert np.isfinite(np.asarray(w_k)).all()
