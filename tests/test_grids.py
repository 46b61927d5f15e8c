"""Composed-transform accuracy tests on RL, RZ, RLZ grids."""

import numpy as np
import jax.numpy as jnp
import pytest

from scythe_tpu import BC, GridParameters, create_grid


def test_rz_roundtrip_and_derivatives():
    gp = GridParameters(
        geometry="RZ",
        xmin=0.0,
        xmax=1000.0,
        num_cells=20,
        zmin=0.0,
        zmax=500.0,
        zDim=30,
        vars={"h": 1},
    )
    g = create_grid(gp, jnp.float64)
    r = g.r_mish[:, None]
    z = g.z_mish[None, :]
    f = np.sin(2 * np.pi * r / 500.0) * np.cos(np.pi * z / 500.0)
    fr = (2 * np.pi / 500.0) * np.cos(2 * np.pi * r / 500.0) * np.cos(np.pi * z / 500.0)
    fz = -np.sin(2 * np.pi * r / 500.0) * (np.pi / 500.0) * np.sin(np.pi * z / 500.0)
    spec = g.analysis(jnp.asarray(f[None]))
    out = g.synthesis(spec)
    # dominant error is the l_q spline filter: (2*dx/lambda)^6 ~ 0.4% damping
    assert np.allclose(out["val"][0], f, atol=5e-3)
    # derivative: free-end (R0) cells have larger error; interior is ~1%
    assert np.allclose(out["dr"][0][3:-3], fr[3:-3], atol=1.5e-2 * np.abs(fr).max())
    assert np.allclose(out["dr"][0], fr, atol=7e-2 * np.abs(fr).max())
    assert np.allclose(out["dz"][0], fz, atol=5e-3 * np.abs(fz).max())
    # second derivatives: consistency of mixed operators
    assert out["drr"].shape == out["dzz"].shape == (1,) + g.spatial_shape


def test_rl_roundtrip_and_angular_derivatives():
    gp = GridParameters(
        geometry="RL",
        xmin=0.0,
        xmax=100.0,
        num_cells=24,
        lDim=32,
        BCL={"h": BC.R1T1},
        vars={"h": 1},
    )
    g = create_grid(gp, jnp.float64)
    r = g.r_mish[:, None]
    lam = np.linspace(0, 2 * np.pi, g.nl, endpoint=False)[None, :]
    # wavenumber-2 field vanishing near the pole (regular): f = (r/R)^2 cos 2l
    f = (r / 100.0) ** 2 * np.cos(2 * lam) * np.exp(-(((r - 50.0) / 30.0) ** 2))
    spec = g.analysis(jnp.asarray(f[None]))
    out = g.synthesis(spec)
    val = np.asarray(out["val"][0])
    assert np.allclose(val, f, atol=5e-3 * np.abs(f).max())
    # angular derivative of cos(2l) is -2 sin(2l) of the radial profile
    dl_expect = -2.0 * (r / 100.0) ** 2 * np.sin(2 * lam) * np.exp(
        -(((r - 50.0) / 30.0) ** 2)
    )
    assert np.allclose(np.asarray(out["dl"][0]), dl_expect, atol=2e-2 * np.abs(dl_expect).max())
    dll_expect = -4.0 * f
    assert np.allclose(np.asarray(out["dll"][0]), dll_expect, atol=2e-2 * np.abs(dll_expect).max())


def test_rl_ring_mask_limits_inner_wavenumbers():
    gp = GridParameters(
        geometry="RL", xmin=0.0, xmax=100.0, num_cells=24, lDim=64, vars={"h": 1}
    )
    g = create_grid(gp, jnp.float64)
    # high wavenumber everywhere: inner rings must be filtered to ~zero
    lam = np.linspace(0, 2 * np.pi, g.nl, endpoint=False)[None, :]
    f = np.cos(16 * lam) * np.ones((g.params.rDim, 1))
    spec = g.analysis(jnp.asarray(f[None]))
    val = np.asarray(g.synthesis(spec)["val"][0])
    # innermost ring: k=16 unresolvable -> tiny amplitude
    assert np.abs(val[0]).max() < 0.2
    # outermost ring: resolvable -> amplitude near 1
    assert np.abs(val[-1]).max() > 0.8


def test_rlz_shapes_and_roundtrip():
    gp = GridParameters(
        geometry="RLZ",
        xmin=0.0,
        xmax=100.0,
        num_cells=8,
        lDim=16,
        zmin=0.0,
        zmax=50.0,
        zDim=12,
        vars={"h": 1, "u": 2},
    )
    g = create_grid(gp, jnp.float64)
    assert g.spatial_shape == (24, 16, 12)
    r = g.r_mish[:, None, None]
    lam = np.linspace(0, 2 * np.pi, 16, endpoint=False)[None, :, None]
    z = g.z_mish[None, None, :]
    f = (r / 100.0) * np.cos(lam) * np.sin(np.pi * z / 50.0)
    phys = np.stack([f, 2.0 * f])
    spec = g.analysis(jnp.asarray(phys))
    out = g.synthesis(spec)
    assert set(out.keys()) == {"val", "dr", "drr", "dl", "dll", "dz", "dzz"}
    assert np.allclose(np.asarray(out["val"]), phys, atol=2e-2 * np.abs(phys).max())
    # linearity between the two variables
    assert np.allclose(np.asarray(out["dz"][1]), 2 * np.asarray(out["dz"][0]), atol=1e-10)


def test_column_helpers_batch_shapes():
    gp = GridParameters(
        geometry="RZ",
        xmin=0.0,
        xmax=10.0,
        num_cells=4,
        zmin=0.0,
        zmax=2.0,
        zDim=16,
        vars={"h": 1},
    )
    g = create_grid(gp, jnp.float64)
    z = g.z_mish[None, :]
    f = np.broadcast_to(3.0 * z**2, (g.params.rDim, 16))
    F = np.asarray(g.column_integrate(jnp.asarray(f)))
    assert np.allclose(F, z**3, atol=1e-8)
    d = np.asarray(g.column_derivative(jnp.asarray(np.broadcast_to(z**2, f.shape))))
    assert np.allclose(d, 2 * z, atol=1e-8)


def test_default_nl_warns_when_capped():
    import warnings

    from scythe_tpu.basis import fourier

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        nl = fourier.default_nl(2000)  # outermost ring wants ~18850 points
        assert nl == 4096
        assert any("capped" in str(x.message) for x in w)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        fourier.default_nl(16)
        assert not w


def test_innermost_ring_keeps_mean_and_k1():
    """The innermost mish ring sits at ~0.11 cell widths from the axis:
    its mask must retain exactly the mean and wavenumber-1 (the floor —
    enough to represent a smooth vector field through the axis) however
    fine the azimuthal grid is."""
    from scythe_tpu.basis import fourier

    dr = 3000.0
    r_inner = 0.1127 * dr
    for nl in (16, 64, 256):
        kmax = fourier.ring_kmax(np.array([r_inner]), dr, nl)
        assert kmax[0] == 1, (nl, kmax)
        mask = fourier.ring_coeff_mask(np.array([r_inner]), dr, nl)[0]
        k = fourier.coeff_wavenumbers(nl)
        assert set(k[mask > 0]) == {0, 1}
