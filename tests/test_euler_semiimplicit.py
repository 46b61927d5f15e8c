"""RZ compressible Euler benchmarks: balance, bubble, semi-implicit solve."""

import numpy as np
import jax.numpy as jnp
import pytest

from scythe_tpu import BC, GridParameters, ModelParameters, create_grid


def _write_sounding(path, zmax=10000.0):
    zs = np.linspace(0.0, zmax * 1.2, 50)
    theta = 300.0 + 0.004 * zs
    qv = 12.0 * np.exp(-zs / 2500.0)
    with open(path, "w") as f:
        f.write(f"1015.0 {theta[0]} {qv[0]}\n")
        for z, th, q in zip(zs[1:], theta[1:], qv[1:]):
            f.write(f"{z} {th} {q}\n")
    return path


def _euler_model(tmp_path, semiimplicit, ts=2.0, T=60.0, nz=40):
    gp = GridParameters(
        geometry="RZ",
        xmin=0.0,
        xmax=10000.0,
        num_cells=25,
        zmin=0.0,
        zmax=10000.0,
        zDim=nz,
        BCL={"u": BC.R1T0, "w": BC.R1T1},
        BCR={"u": BC.R1T0},
        vars={"s": 1, "xi": 2, "mu": 3, "u": 4, "w": 5},
    )
    model = ModelParameters(
        ts=ts,
        integration_time=T,
        output_interval=T,
        equation_set="Euler_test",
        initial_conditions=str(tmp_path / "ics.csv"),
        output_dir=str(tmp_path / "out"),
        ref_state_file=_write_sounding(str(tmp_path / "sounding.txt")),
        grid_params=gp,
        physical_params={"K": 5.0},
        options={"semiimplicit": semiimplicit},
    )
    return model


def _write_ics(model, bubble_amp=0.0):
    grid = create_grid(model.grid_params, jnp.float64)
    pts = grid.gridpoints()
    r, z = pts[:, 0], pts[:, 1]
    # warm bubble: entropy perturbation (BF02-style)
    rad = np.sqrt(((r - 0.0) / 2000.0) ** 2 + ((z - 2000.0) / 2000.0) ** 2)
    s_pert = bubble_amp * np.maximum(0.0, np.cos(np.pi * np.minimum(rad, 1.0) / 2.0)) ** 2
    with open(model.initial_conditions, "w") as f:
        f.write("r,z,s,xi,mu,u,w\n")
        for i in range(len(r)):
            f.write(f"{r[i]},{z[i]},{s_pert[i]},0.0,0.0,0.0,0.0\n")
    return grid


def test_hydrostatic_balance_preserved(tmp_path):
    """Zero perturbation on a balanced reference state stays near zero
    (the discrete analog of the reference's perturbation formulation).

    Timestep note: the semi-implicit scheme absorbs the *vertical* acoustic
    CFL (min Chebyshev spacing ~30 m -> explicit limit ~0.06 s); the radial
    acoustic limit (~0.18 s at 90 m min mish spacing) stays explicit, as in
    the reference."""
    model = _euler_model(tmp_path, semiimplicit=True, ts=0.15, T=15.0)
    _write_ics(model, bubble_amp=0.0)
    from scythe_tpu import integrate_model

    grid, phys = integrate_model(model, write_outputs=False)
    # w perturbations stay small (m/s); the reference state is balanced to
    # spectral accuracy, residual acoustic noise is acceptable
    assert np.abs(phys[4]).max() < 0.2, np.abs(phys[4]).max()
    assert np.abs(phys[3]).max() < 0.2


def test_warm_bubble_rises(tmp_path):
    model = _euler_model(tmp_path, semiimplicit=True, ts=0.15, T=90.0)
    _write_ics(model, bubble_amp=2.0)
    from scythe_tpu import integrate_model

    grid, phys = integrate_model(model, write_outputs=False)
    w = phys[4]
    assert np.isfinite(phys).all()
    # the bubble should be rising: positive w in the interior, meaningfully
    assert w.max() > 0.05
    assert w.max() < 50.0


def test_semiimplicit_allows_larger_timestep(tmp_path):
    """With the acoustic terms treated implicitly, a timestep well above the
    vertical acoustic CFL must stay stable."""
    # vertical acoustic CFL: min Chebyshev spacing ~30 m, c ~ 340 m/s ->
    # explicit limit ~0.06 s; run ts=0.15 s with the implicit vertical solve
    model = _euler_model(tmp_path, semiimplicit=True, ts=0.15, T=30.0)
    _write_ics(model, bubble_amp=2.0)
    from scythe_tpu import integrate_model

    grid, phys = integrate_model(model, write_outputs=False)
    assert np.isfinite(phys).all()
    assert np.abs(phys[4]).max() < 50.0


def test_explicit_blows_up_where_semiimplicit_does_not(tmp_path):
    model = _euler_model(tmp_path, semiimplicit=False, ts=0.15, T=30.0)
    _write_ics(model, bubble_amp=2.0)
    from scythe_tpu import integrate_model

    with pytest.raises(FloatingPointError):
        integrate_model(model, write_outputs=False)
