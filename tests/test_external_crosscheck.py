"""Cross-validation of the basis layer against EXTERNAL independent
implementations (scipy / numpy.polynomial / numpy.fft).

The reference's grid layer (Springsteel) is not vendored, so round-1
parity evidence for the [inferred] choices was self-referential
(VERDICT round 1, Missing #1).  These tests pin the mathematical objects
against code we did not write:

* the unfiltered R0 B-spline analysis is the weighted least-squares
  cubic-spline fit — scipy.interpolate.make_lsq_spline computes the same
  fit from a clamped-knot basis (same spline space, different basis), so
  fitted values and derivatives must agree to roundoff;
* the mish points/weights are the 3-point Gauss-Legendre rule per cell;
* the Chebyshev column engine must reproduce numpy.polynomial.chebyshev
  (chebval / chebder / chebint) on the module's own collocation points;
* the azimuthal real-DFT matrices must agree with numpy.fft.rfft.
"""

import numpy as np
import pytest

from scythe_tpu.basis import bspline as bs
from scythe_tpu.basis import chebyshev as cb
from scythe_tpu.basis import fourier as fo


def test_mish_is_gauss_legendre():
    gx, gw = np.polynomial.legendre.leggauss(3)
    assert np.abs(np.sort(bs._GAUSS_X) - (gx + 1.0) / 2.0).max() < 1e-15
    assert np.abs(np.sort(bs._GAUSS_W) - np.sort(gw / 2.0)).max() < 1e-15


def test_bspline_lsq_fit_matches_scipy():
    from scipy.interpolate import make_lsq_spline

    xmin, xmax, n = 0.0, 10.0, 12
    ops = bs.build_ops(xmin, xmax, n, bs.BC.R0, bs.BC.R0, l_q=0.0)
    f = np.sin(ops.mish * 0.9) + 0.3 * np.cos(ops.mish * 2.3) + 0.1 * ops.mish
    a = ops.analysis @ f

    dx = (xmax - xmin) / n
    t = np.r_[[xmin] * 4, xmin + dx * np.arange(1, n), [xmax] * 4]
    spl = make_lsq_spline(ops.mish, f, t, k=3, w=np.sqrt(ops.weights))
    for d in range(3):
        ours = ops.synth[d] @ a
        theirs = spl.derivative(d)(ops.mish) if d else spl(ops.mish)
        scale = np.abs(theirs).max()
        assert np.abs(ours - theirs).max() < 1e-11 * scale, d


def test_chebyshev_matches_numpy_polynomial():
    nz, zmin, zmax = 16, 0.0, 2.0
    ops = cb.build_ops(nz, zmin, zmax, bdim=nz)  # R0, no truncation
    zeta = 2.0 * (ops.points - zmin) / (zmax - zmin) - 1.0
    rng = np.random.default_rng(0)
    c = rng.normal(size=nz) / (1.0 + np.arange(nz)) ** 2

    vals = np.polynomial.chebyshev.chebval(zeta, c)
    # analysis recovers the exact coefficients of an in-space function
    assert np.abs(ops.analysis @ vals - c).max() < 1e-10
    # synthesis reproduces chebval
    assert np.abs(ops.synth @ c - vals).max() < 1e-11

    # derivative: chain rule dzeta/dz = 2/L
    dc = np.polynomial.chebyshev.chebder(c) * 2.0 / (zmax - zmin)
    dvals = np.polynomial.chebyshev.chebval(zeta, dc)
    assert np.abs(ops.dsynth @ c - dvals).max() < 1e-9 * np.abs(dvals).max()

    # antiderivative anchored at z = zmin.  Integrating T_{nz-1} produces
    # a T_nz term outside the nz-dim space (the operator truncates it), so
    # the exact comparison uses an in-space input with c[nz-1] = 0.
    c2 = c.copy()
    c2[-1] = 0.0
    ic = np.polynomial.chebyshev.chebint(c2) * (zmax - zmin) / 2.0
    ivals = np.polynomial.chebyshev.chebval(
        zeta, ic
    ) - np.polynomial.chebyshev.chebval(-1.0, ic)
    assert np.abs(ops.isynth @ c2 - ivals).max() < 1e-10 * np.abs(ivals).max()


def test_fourier_matches_numpy_rfft():
    nl = 32
    la, ls, _, _ = fo.dft_matrices(nl)
    rng = np.random.default_rng(0)
    f = rng.normal(size=nl)
    X = np.fft.rfft(f)
    half = nl // 2
    expected = np.concatenate(
        [
            [X[0].real / nl],
            2.0 * X[1:half].real / nl,
            [X[half].real / nl],
            -2.0 * X[1:half].imag / nl,
        ]
    )
    assert np.abs(la @ f - expected).max() < 1e-12
    assert np.abs(ls @ expected - f).max() < 1e-12
