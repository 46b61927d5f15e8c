"""Unit tests for the cubic B-spline radial basis (analysis/synthesis/BCs)."""

import numpy as np
import pytest

from scythe_tpu.basis import bspline
from scythe_tpu.basis.bspline import BC


def ops(bcl=BC.R0, bcr=BC.R0, n=32, xmin=-1.0, xmax=3.0, l_q=2.0):
    return bspline.build_ops(xmin, xmax, n, bcl, bcr, l_q)


def test_partition_of_unity():
    o = ops()
    phi = bspline.collocation_matrix(o.xmin, o.xmax, o.num_cells, o.mish, 0)
    assert np.allclose(phi.sum(axis=1), 1.0)


def test_roundtrip_exact_for_spline_space():
    """Any function already in the (unfiltered) spline space round-trips."""
    o = ops(l_q=0.0)
    rng = np.random.default_rng(0)
    a = rng.normal(size=o.project.shape[0])
    f = o.synth[0] @ a
    a2 = o.analysis @ f
    f2 = o.synth[0] @ a2
    assert np.allclose(f2, f, atol=1e-10)


def test_smooth_function_accuracy():
    o = ops(n=64)
    f = np.sin(2.0 * np.pi * o.mish / 4.0)
    fp = (2.0 * np.pi / 4.0) * np.cos(2.0 * np.pi * o.mish / 4.0)
    fpp = -((2.0 * np.pi / 4.0) ** 2) * np.sin(2.0 * np.pi * o.mish / 4.0)
    a = o.analysis @ f
    assert np.allclose(o.synth[0] @ a, f, atol=1e-5)
    assert np.allclose(o.synth[1] @ a, fp, atol=1e-3)
    assert np.allclose(o.synth[2] @ a, fpp, atol=1e-1)


def test_filter_damps_2dx_waves():
    """The l_q filter should strongly damp node-scale (2*dx) oscillations
    but pass well-resolved scales nearly unchanged."""
    o = ops(n=64, xmin=0.0, xmax=64.0, l_q=2.0)  # dx = 1
    noise = np.sin(np.pi * o.mish / 1.0)  # wavelength 2*dx
    smooth = np.sin(2.0 * np.pi * o.mish / 32.0)  # wavelength 32*dx
    out_noise = o.synth[0] @ (o.analysis @ noise)
    out_smooth = o.synth[0] @ (o.analysis @ smooth)
    assert np.linalg.norm(out_noise) < 0.8 * np.linalg.norm(noise)
    assert np.allclose(out_smooth, smooth, atol=1e-3)


@pytest.mark.parametrize(
    "bc,check",
    [
        (BC.R1T0, lambda v, d, dd: abs(v) < 1e-12),
        (BC.R1T1, lambda v, d, dd: abs(d) < 1e-12),
        (BC.R1T2, lambda v, d, dd: abs(dd) < 1e-12),
        (BC.R2T10, lambda v, d, dd: abs(v) < 1e-12 and abs(d) < 1e-12),
        (BC.R2T20, lambda v, d, dd: abs(v) < 1e-12 and abs(dd) < 1e-12),
    ],
)
def test_left_bc_satisfied(bc, check):
    o = ops(bcl=bc, bcr=BC.R0, n=24, xmin=0.0, xmax=6.0)
    rng = np.random.default_rng(1)
    f = rng.normal(size=o.mish.shape)
    a = o.analysis @ f
    phi0 = bspline.collocation_matrix(o.xmin, o.xmax, o.num_cells, np.array([o.xmin]), 0)
    phi1 = bspline.collocation_matrix(o.xmin, o.xmax, o.num_cells, np.array([o.xmin]), 1)
    phi2 = bspline.collocation_matrix(o.xmin, o.xmax, o.num_cells, np.array([o.xmin]), 2)
    assert check(float(phi0 @ a), float(phi1 @ a), float(phi2 @ a))


def test_right_bc_satisfied():
    o = ops(bcl=BC.R0, bcr=BC.R1T1, n=24, xmin=0.0, xmax=6.0)
    rng = np.random.default_rng(2)
    a = o.analysis @ rng.normal(size=o.mish.shape)
    phi1 = bspline.collocation_matrix(o.xmin, o.xmax, o.num_cells, np.array([o.xmax]), 1)
    assert abs(float(phi1 @ a)) < 1e-12


def test_periodic_roundtrip_and_derivative():
    o = ops(bcl=BC.PERIODIC, bcr=BC.PERIODIC, n=50, xmin=-50.0, xmax=50.0)
    L = 100.0
    f = np.exp(np.sin(2.0 * np.pi * o.mish / L))
    fp = f * (2.0 * np.pi / L) * np.cos(2.0 * np.pi * o.mish / L)
    a = o.analysis @ f
    assert np.allclose(o.synth[0] @ a, f, atol=2e-4)
    assert np.allclose(o.synth[1] @ a, fp, atol=2e-2)
    # periodicity of the reconstruction at the ends
    phi_l = bspline.collocation_matrix(o.xmin, o.xmax, o.num_cells, np.array([o.xmin]), 0)
    phi_r = bspline.collocation_matrix(o.xmin, o.xmax, o.num_cells, np.array([o.xmax]), 0)
    assert abs(float(phi_l @ a) - float(phi_r @ a)) < 1e-10


def test_projection_decomposes_over_cells():
    """The local quadrature projection must be an exact sum of per-cell
    contributions — the contract that makes sharded overlap-add exact."""
    o = ops(n=30, xmin=0.0, xmax=10.0)
    rng = np.random.default_rng(3)
    f = rng.normal(size=o.mish.shape)
    p_full = o.project @ f
    # split at cell 13: rows are mish points, 3 per cell
    split = 13 * 3
    p_a = o.project[:, :split] @ f[:split]
    p_b = o.project[:, split:] @ f[split:]
    assert np.allclose(p_a + p_b, p_full, atol=1e-12)
    # and msolve(project) == analysis
    assert np.allclose(o.msolve @ p_full, o.analysis @ f, atol=1e-12)
