"""Unit tests for the Chebyshev vertical column engine."""

import numpy as np

from scythe_tpu.basis import chebyshev
from scythe_tpu.basis.chebyshev import ZBC


def test_analysis_synthesis_inverse():
    o = chebyshev.build_ops(16, 0.0, 1.0, bdim=16)
    assert np.allclose(o.synth @ o.analysis, np.eye(16), atol=1e-12)


def test_b_zdim_matches_reference_formula():
    # ref spectralGrid.jl:36
    for nz in (4, 10, 16, 33, 60):
        assert chebyshev.b_zdim(nz) == min(nz, int(np.floor((2 * nz - 1) / 3) + 1))


def test_smooth_roundtrip_and_derivatives():
    nz, zmin, zmax = 40, 0.0, 10000.0
    o = chebyshev.build_ops(nz, zmin, zmax)
    z = o.points
    f = np.exp(-((z - 4000.0) ** 2) / 2000.0**2)
    a = o.constrain @ (o.analysis @ f)
    fz = -(z - 4000.0) / 2000.0**2 * 2.0 * f / 2.0 * 2.0  # d/dz of f
    assert np.allclose(o.synth @ a, f, atol=1e-6)
    assert np.allclose(o.dsynth @ a, fz, atol=1e-6 * np.max(np.abs(fz)) * 1e3 + 1e-8)
    # second derivative against finite check via dsynth twice
    assert np.allclose(o.d2synth @ a, o.dsynth @ (o.dcoef @ a), atol=1e-10)


def test_antiderivative():
    nz = 32
    o = chebyshev.build_ops(nz, 0.0, 2.0, bdim=nz)
    z = o.points
    f = 3.0 * z**2
    a = o.analysis @ f
    F = o.isynth @ a  # should be z^3, anchored 0 at z=0
    assert np.allclose(F, z**3, atol=1e-10)


def test_antiderivative_consistency_with_derivative():
    """For CA-truncated columns (the production path) d/dz of the
    antiderivative reproduces the input exactly."""
    nz = 24
    o = chebyshev.build_ops(nz, 0.0, 5.0)  # default 2/3-rule truncation
    rng = np.random.default_rng(0)
    a = o.constrain @ (o.analysis @ rng.normal(size=nz))
    f = o.synth @ a
    F = o.isynth @ a
    aF = o.analysis @ F  # untruncated refit of the antiderivative
    assert np.allclose(o.dsynth @ aF, f, atol=1e-8)


def test_truncation_filter():
    nz = 30
    o = chebyshev.build_ops(nz, 0.0, 1.0)
    bdim = chebyshev.b_zdim(nz)
    a = o.constrain @ np.ones(nz)
    assert np.allclose(a[bdim:], 0.0)


def test_bc_projector_value_zero():
    nz = 20
    o = chebyshev.build_ops(nz, 0.0, 1.0, bdim=nz, bcb=ZBC.R1T0)
    rng = np.random.default_rng(1)
    a = o.constrain @ (o.analysis @ rng.normal(size=nz))
    k = np.arange(nz)
    bottom_val = float(((-1.0) ** k) @ a)  # T_k(-1)
    assert abs(bottom_val) < 1e-10


def test_helmholtz_matrices_shapes():
    nz = 20
    s = chebyshev.dct_matrix(nz)
    d1 = chebyshev.dct_1st_derivative(nz, 2.0)
    d2 = chebyshev.dct_2nd_derivative(nz, 2.0)
    assert s.shape == d1.shape == d2.shape == (nz, nz)
    # d1 of T_1 (linear in zeta) is constant 2/L * 1
    a = np.zeros(nz)
    a[1] = 1.0
    assert np.allclose(d1 @ a, 1.0, atol=1e-10)
