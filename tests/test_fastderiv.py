"""Selective single-pass bf16 derivative synthesis (`deriv_single`).

The value slot must stay at compensated (f32-grade) accuracy — its errors
feed analysis and accumulate — while the derivative slots may relax to
single-pass bf16 (they only enter the state through tendencies x dt; see
docs/NUMERICS.md "Where plain bf16 would be acceptable")."""

import jax.numpy as jnp
import numpy as np
import pytest

from scythe_tpu import BC, GridParameters, create_grid
from scythe_tpu.basis.chebyshev import ZBC


def _grids(geometry):
    kw = dict(
        geometry=geometry,
        xmin=0.0,
        xmax=100.0,
        num_cells=24,
        vars={"h": 1, "u": 2},
        BCL={"h": BC.R1T1},
    )
    if geometry in ("RL", "RLZ"):
        kw["lDim"] = 32
    if geometry in ("RZ", "RLZ"):
        kw.update(zmin=0.0, zmax=10.0, zDim=16, BCB={"u": ZBC.R1T0})
    gp = GridParameters(**kw, deriv_single=False)
    gp_f = GridParameters(**kw)  # auto -> ON in compensated mode
    g64 = create_grid(gp, jnp.float64, matmul="plain")
    gc = create_grid(gp, jnp.float32, matmul="compensated")
    gf = create_grid(gp_f, jnp.float32, matmul="compensated")
    assert gf.fast and not gc.fast
    return g64, gc, gf


def _smooth_field(g64):
    c = {k: np.asarray(v) for k, v in g64.coords().items()}
    r = c["r"] / 100.0
    f = np.broadcast_to(np.exp(-(((r - 0.5) / 0.3) ** 2)), (1,) + g64.spatial_shape)
    out = [f[0], 0.5 - f[0]]
    if "l" in c:
        out[0] = out[0] * (1.0 + 0.3 * np.cos(2 * c["l"]))
    if "z" in c:
        out[1] = out[1] * (1.0 + 0.1 * np.sin(np.pi * c["z"] / 10.0))
    return np.stack(np.broadcast_arrays(*out))


@pytest.mark.parametrize("geometry", ["RL", "RZ", "RLZ"])
def test_fastderiv_value_exact_derivs_bf16_grade(geometry):
    g64, gc, gf = _grids(geometry)
    f = _smooth_field(g64)
    spec64 = g64.analysis(jnp.asarray(f))
    spec32 = jnp.asarray(np.asarray(spec64), jnp.float32)
    out64 = g64.synthesis(spec64)
    outc = gc.synthesis(spec32)
    outf = gf.synthesis(spec32)

    # value slot: same compensated chain (same grade vs comp and vs f64 —
    # the stacked vs sliced einsum lowerings differ by a few bf16-residual
    # ULPs, so bitwise equality is not required)
    vc = np.asarray(outc["val"], np.float64)
    vf = np.asarray(outf["val"], np.float64)
    vscale = np.abs(np.asarray(out64["val"])).max()
    assert np.abs(vf - vc).max() < 3e-5 * vscale
    assert np.abs(vf - np.asarray(out64["val"])).max() < 3e-5 * vscale

    # derivative slots: single-pass bf16 grade (~0.4% of the chain scale)
    gscale = max(np.abs(np.asarray(out64[k])).max() for k in g64.field_keys)
    for key in g64.field_keys:
        if key == "val":
            continue
        a = np.asarray(out64[key])
        b = np.asarray(outf[key], np.float64)
        assert np.abs(a - b).max() < 1.5e-2 * gscale, key


def test_fastderiv_ignored_outside_compensated_mode():
    gp = GridParameters(
        geometry="RL",
        xmin=0.0,
        xmax=100.0,
        num_cells=8,
        lDim=16,
        vars=("h",),
        deriv_single=True,
    )
    g = create_grid(gp, jnp.float64, matmul="plain")
    assert not g.fast


def test_fastderiv_disabled_with_factored_dft():
    gp = GridParameters(
        geometry="RL",
        xmin=0.0,
        xmax=100.0,
        num_cells=8,
        lDim=16,
        vars=("h",),
        deriv_single=True,
        l_factored=True,
    )
    g = create_grid(gp, jnp.float32, matmul="compensated")
    assert not g.fast
    # and the factored path still synthesizes all slots
    f = jnp.asarray(np.random.default_rng(0).normal(size=(1,) + g.spatial_shape))
    out = g.synthesis(g.analysis(f))
    assert set(out) == set(g.field_keys)
