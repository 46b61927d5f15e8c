"""Exactness of the Schur-complement distributed radial solve.

The distributed analysis (parallel/schur.py) must equal the dense global
filtered least-squares analysis to roundoff — same linear system, different
elimination order — across BC families, shard counts, and geometries.
"""

import numpy as np
import pytest

from scythe_tpu import BC, GridParameters
from scythe_tpu.basis import bspline
from scythe_tpu.parallel import schur


def _params(num_cells, bcl, bcr, nvars=2):
    names = "uvwxyz"[:nvars]
    return GridParameters(
        geometry="R",
        xmin=-40.0,
        xmax=60.0,
        num_cells=num_cells,
        BCL={n: bcl for n in names},
        BCR={n: bcr for n in names},
        vars={n: i + 1 for i, n in enumerate(names)},
    )


def _dense_analysis(p, phys):
    out = np.zeros((p.nvars, p.b_rDim) + phys.shape[2:])
    for v in range(p.nvars):
        ops = bspline.build_ops(p.xmin, p.xmax, p.num_cells, p.BCL[v], p.BCR[v], p.l_q)
        out[v] = np.einsum("br,r...->b...", ops.analysis, phys[v])
    return out


@pytest.mark.parametrize(
    "bcl,bcr",
    [
        (BC.R0, BC.R0),
        (BC.R1T0, BC.R1T1),
        (BC.R2T10, BC.R1T0),
        (BC.R3, BC.R0),
        (BC.PERIODIC, BC.PERIODIC),
    ],
)
@pytest.mark.parametrize("n", [2, 4, 8])
@pytest.mark.parametrize("interface", ["gather", "pcr"])
def test_schur_matches_dense(bcl, bcr, n, interface):
    p = _params(32, bcl, bcr)
    ops = schur.build_schur_ops(p, n)
    pcr = schur.build_pcr_ops(p, n) if interface == "pcr" else None
    rng = np.random.default_rng(42)
    phys = rng.normal(size=(p.nvars, p.rDim))
    want = _dense_analysis(p, phys)
    got = schur.numpy_sharded_analysis(p, ops, phys, pcr=pcr)
    scale = np.abs(want).max()
    assert np.abs(got - want).max() / scale < 1e-12


@pytest.mark.parametrize(
    "num_cells,n,bcl,bcr",
    [
        (256, 64, BC.R1T0, BC.R0),  # pod-scale shard count
        (256, 64, BC.PERIODIC, BC.PERIODIC),
        (24, 6, BC.PERIODIC, BC.PERIODIC),  # non-power-of-two cyclic
        (512, 128, BC.R1T0, BC.R0),
    ],
)
def test_pcr_large_shard_counts(num_cells, n, bcl, bcr):
    """PCR interface solve at shard counts far past the gather path's O(n)
    comfort zone.  Also pins the measured convergence depth: the B-spline
    interface Schur complement is so diagonally dominant that couplings die
    in <= 3 levels regardless of n, i.e. per-chip interface communication
    is O(1) 3-row slabs."""
    p = _params(num_cells, bcl, bcr)
    ops = schur.build_schur_ops(p, n)
    pcr = schur.build_pcr_ops(p, n)
    assert pcr.levels <= 4
    rng = np.random.default_rng(7)
    phys = rng.normal(size=(p.nvars, p.rDim))
    want = _dense_analysis(p, phys)
    got = schur.numpy_sharded_analysis(p, ops, phys, pcr=pcr)
    assert np.abs(got - want).max() / np.abs(want).max() < 1e-12


def test_schur_trailing_axes():
    """Non-radial (lambda/vertical coefficient) axes ride through."""
    p = _params(16, BC.R1T0, BC.R0)
    ops = schur.build_schur_ops(p, 4)
    rng = np.random.default_rng(0)
    phys = rng.normal(size=(p.nvars, p.rDim, 5))
    want = _dense_analysis(p, phys)
    got = schur.numpy_sharded_analysis(p, ops, phys)
    assert np.abs(got - want).max() / np.abs(want).max() < 1e-12


def test_schur_rejects_bad_partitions():
    p = _params(10, BC.R0, BC.R0)
    with pytest.raises(ValueError):
        schur.build_schur_ops(p, 3)  # not divisible
    with pytest.raises(ValueError):
        schur.build_schur_ops(_params(8, BC.R0, BC.R0), 4)  # cl < 4
