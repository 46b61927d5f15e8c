"""RL and RZ advection equation-set round trips."""

import numpy as np
import jax.numpy as jnp

from scythe_tpu import BC, GridParameters, ModelParameters, create_grid, integrate_model


def test_rl_solid_body_rotation(tmp_path):
    """LinearAdvectionRL: half a revolution moves the blob to the far side."""
    gp = GridParameters(
        geometry="RL",
        xmin=0.0,
        xmax=100.0,
        num_cells=16,
        lDim=32,
        BCL={"h": BC.R1T1},
        vars={"h": 1, "u": 2, "v": 3},
    )
    omega = 2.0 * np.pi / 100.0
    model = ModelParameters(
        ts=0.05,
        integration_time=50.0,
        output_interval=50.0,
        equation_set="LinearAdvectionRL",
        initial_conditions=str(tmp_path / "ics.csv"),
        output_dir=str(tmp_path / "out"),
        grid_params=gp,
        physical_params={"K": 0.0},
    )
    grid = create_grid(gp, jnp.float64)
    pts = grid.gridpoints()
    r, lam = pts[:, 0], pts[:, 1]
    h0 = np.exp(-(((r - 50.0) / 20.0) ** 2)) * np.exp(-((np.cos(lam) - 1.0) ** 2) * 4.0)
    with open(model.initial_conditions, "w") as f:
        f.write("r,l,h,u,v\n")
        for i in range(len(r)):
            f.write(f"{r[i]},{lam[i]},{h0[i]},0.0,{omega * r[i]}\n")
    grid, phys = integrate_model(model, write_outputs=False)
    h_expect = np.exp(-(((r - 50.0) / 20.0) ** 2)) * np.exp(
        -((np.cos(lam - np.pi) - 1.0) ** 2) * 4.0
    )
    err = np.sqrt(np.mean((phys[0].reshape(-1) - h_expect) ** 2)) / h_expect.max()
    assert err < 0.08, err


def test_rz_translation(tmp_path):
    """LinearAdvectionRZ: uniform (u, w) translates the blob diagonally."""
    gp = GridParameters(
        geometry="RZ",
        xmin=0.0,
        xmax=1000.0,
        num_cells=25,
        zmin=0.0,
        zmax=1000.0,
        zDim=24,
        vars={"h": 1, "u": 2, "v": 3, "w": 4},
    )
    # NOTE: uniform w through the z boundaries is an inflow without boundary
    # data — ill-posed for any spectral method over long times (the
    # reference shares this), so the run is kept short enough that the
    # inflow-boundary ringing stays negligible.
    u0, w0, T = 2.0, 1.0, 30.0
    model = ModelParameters(
        ts=0.5,
        integration_time=T,
        output_interval=T,
        equation_set="LinearAdvectionRZ",
        initial_conditions=str(tmp_path / "ics.csv"),
        output_dir=str(tmp_path / "out"),
        grid_params=gp,
        physical_params={"K": 0.0},
    )
    grid = create_grid(gp, jnp.float64)
    pts = grid.gridpoints()
    r, z = pts[:, 0], pts[:, 1]

    def blob(rc, zc):
        return np.exp(-(((r - rc) / 120.0) ** 2) - ((z - zc) / 120.0) ** 2)

    with open(model.initial_conditions, "w") as f:
        f.write("r,z,h,u,v,w\n")
        for i in range(len(r)):
            f.write(f"{r[i]},{z[i]},{blob(400.0, 400.0)[i]},{u0},0.0,{w0}\n")
    grid, phys = integrate_model(model, write_outputs=False)
    h_expect = blob(400.0 + u0 * T, 400.0 + w0 * T)
    err = np.sqrt(np.mean((phys[0].reshape(-1) - h_expect) ** 2)) / h_expect.max()
    assert err < 0.08, err
