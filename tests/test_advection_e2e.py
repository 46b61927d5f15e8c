"""End-to-end smoke tests: linear advection round trips.

The canonical reference check (notebooks/LinearAdvection_example.ipynb):
advect a Gaussian around a 100 m periodic domain for exactly one period and
require the L2 difference from the initial state to be small.
"""

import numpy as np
import pytest

from scythe_tpu import BC, GridParameters, ModelParameters, create_grid, integrate_model
from scythe_tpu import io as sio


def make_advection_model(tmp_path, num_cells=100, ts=0.05, T=100.0):
    gp = GridParameters(
        geometry="R",
        xmin=-50.0,
        xmax=50.0,
        num_cells=num_cells,
        BCL={"u": BC.PERIODIC},
        BCR={"u": BC.PERIODIC},
        vars={"u": 1},
    )
    model = ModelParameters(
        ts=ts,
        integration_time=T,
        output_interval=T / 2,
        equation_set="LinearAdvection1D",
        initial_conditions=str(tmp_path / "ics.csv"),
        output_dir=str(tmp_path / "out"),
        grid_params=gp,
        physical_params={"c_0": 1.0, "K": 0.0},
    )
    grid = create_grid(gp)
    r = grid.r_mish
    u0 = np.exp(-((r / 20.0) ** 2))  # sigma = 20 Gaussian (notebook cell 4)
    with open(model.initial_conditions, "w") as f:
        f.write("r,u\n")
        for ri, ui in zip(r, u0):
            f.write(f"{ri},{ui}\n")
    return model, u0


def test_gaussian_round_trip(tmp_path):
    model, u0 = make_advection_model(tmp_path)
    grid, phys = integrate_model(model)
    u_final = phys[0]
    l2 = np.sqrt(np.sum((u_final - u0) ** 2))
    # the notebook's acceptance: "should be small"; AB3 + cubic splines at
    # CFL 0.15 keep it well below 1e-2 for sigma=20
    assert l2 < 2e-2, l2
    # outputs exist in the reference CSV schema
    out0 = tmp_path / "out" / "physical_out_0.0.csv"
    outT = tmp_path / "out" / "physical_out_100.0.csv"
    assert out0.exists() and outT.exists()
    names0, data0 = sio._read_csv(str(out0))
    assert names0 == ["r", "u"]
    assert data0.shape == (300, 2)


def test_diffusion_decays_gaussian(tmp_path):
    model, u0 = make_advection_model(tmp_path, T=10.0)
    model = model.with_(physical_params={"c_0": 0.0, "K": 1.0})
    grid, phys = integrate_model(model, write_outputs=False)
    u_final = phys[0]
    assert u_final.max() < u0.max()
    assert u_final.max() > 0.5 * u0.max()
    # diffusion preserves the integral on a periodic domain
    w = grid.params  # noqa: F841
    import scythe_tpu.basis.bspline as bs

    wts = bs.mish_weights(-50.0, 50.0, 100)
    assert np.isclose(np.sum(wts * u_final), np.sum(wts * u0), rtol=1e-6)


def test_nan_watchdog(tmp_path):
    model, u0 = make_advection_model(tmp_path, T=15.0)
    # unstable diffusion coefficient -> NaN/overflow should raise
    model = model.with_(physical_params={"c_0": 0.0, "K": -50.0})
    with pytest.raises(FloatingPointError):
        integrate_model(model, write_outputs=False)
