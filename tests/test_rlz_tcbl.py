"""RLZ-grid end-to-end tests and TCBL equation sets."""

import numpy as np
import jax.numpy as jnp
import pytest

from scythe_tpu import BC, GridParameters, ModelParameters, create_grid, integrate_model


def test_rlz_advection(tmp_path):
    """Solid-body rotation on the RLZ grid: a blob advected azimuthally by
    half a revolution ends up on the opposite side."""
    gp = GridParameters(
        geometry="RLZ",
        xmin=0.0,
        xmax=100.0,
        num_cells=10,
        lDim=32,
        zmin=0.0,
        zmax=50.0,
        zDim=8,
        BCL={"h": BC.R1T1},
        vars={"h": 1, "u": 2, "v": 3},
    )
    omega = 2.0 * np.pi / 100.0  # one revolution per 100 s
    model = ModelParameters(
        ts=0.05,
        integration_time=50.0,
        output_interval=50.0,
        equation_set="LinearAdvectionRLZ",
        initial_conditions=str(tmp_path / "ics.csv"),
        output_dir=str(tmp_path / "out"),
        grid_params=gp,
        physical_params={"K": 0.0},
    )
    grid = create_grid(gp, jnp.float64)
    pts = grid.gridpoints()
    r, lam, z = pts[:, 0], pts[:, 1], pts[:, 2]
    h0 = np.exp(-(((r - 50.0) / 20.0) ** 2)) * np.exp(
        -((np.cos(lam) - 1.0) ** 2) * 4.0
    )
    v = omega * r  # solid body: dl/dt = omega
    with open(model.initial_conditions, "w") as f:
        f.write("r,l,z,h,u,v\n")
        for i in range(len(r)):
            f.write(f"{r[i]},{lam[i]},{z[i]},{h0[i]},0.0,{v[i]}\n")
    grid, phys = integrate_model(model, write_outputs=False)
    h = phys[0].reshape(-1)
    # expected: rotated by pi
    h_expect = np.exp(-(((r - 50.0) / 20.0) ** 2)) * np.exp(
        -((np.cos(lam - np.pi) - 1.0) ** 2) * 4.0
    )
    err = np.sqrt(np.mean((h - h_expect) ** 2)) / h_expect.max()
    assert err < 0.08, err


def test_height_resolved_bl_smoke(tmp_path):
    """Oneway_ShallowWater_HeightResolvedBL: balanced vortex spins a BL."""
    gp = GridParameters(
        geometry="RLZ",
        xmin=0.0,
        xmax=2.0e5,
        num_cells=16,
        lDim=16,
        zmin=0.0,
        zmax=2000.0,
        zDim=12,
        BCL={
            "h": BC.R1T1,
            "u": BC.R1T0,
            "v": BC.R1T0,
            "ub": BC.R1T0,
            "vb": BC.R1T0,
            "wb": BC.R1T1,
        },
        BCR={"h": BC.R0, "u": BC.R1T1, "v": BC.R0, "ub": BC.R1T1, "vb": BC.R0},
        vars={"h": 1, "u": 2, "v": 3, "ub": 4, "vb": 5, "wb": 6},
    )
    # explicit vertical diffusion limit: Kv ~ l^2 S up to ~3000 m^2/s with
    # ~35 m min Chebyshev spacing -> dt < ~0.2 s
    model = ModelParameters(
        ts=0.2,
        integration_time=300.0,
        output_interval=300.0,
        equation_set="Oneway_ShallowWater_HeightResolvedBL",
        initial_conditions=str(tmp_path / "ics.csv"),
        output_dir=str(tmp_path / "out"),
        grid_params=gp,
        physical_params={
            "g": 9.81,
            "Kh": 3000.0,
            "Cd": 2.4e-3,
            "Hfree": 2000.0,
            "f": 5.0e-5,
            "Um": 0.0,
            "Vm": 0.0,
        },
    )
    grid = create_grid(gp, jnp.float64)
    pts = grid.gridpoints()
    r, lam, z = pts[:, 0], pts[:, 1], pts[:, 2]
    rm, vm = 5.0e4, 20.0
    f_cor, g = 5.0e-5, 9.81
    v = np.where(r < rm, vm * r / rm, vm * rm / r)
    # gradient-wind-balanced free-layer height: dh/dr = (f v + v^2/r)/g
    r_u = np.unique(r)
    v_u = np.where(r_u < rm, vm * r_u / rm, vm * rm / r_u)
    dhdr_u = (f_cor * v_u + v_u**2 / r_u) / g
    h_u = np.concatenate(
        [[0.0], np.cumsum(0.5 * (dhdr_u[1:] + dhdr_u[:-1]) * np.diff(r_u))]
    )
    h = h_u[np.searchsorted(r_u, r)]
    with open(model.initial_conditions, "w") as f:
        f.write("r,l,z,h,u,v,ub,vb,wb\n")
        for i in range(len(r)):
            f.write(f"{r[i]},{lam[i]},{z[i]},{h[i]},0.0,{v[i]},0.0,{v[i]},0.0\n")
    grid, phys = integrate_model(model, write_outputs=False)
    assert np.isfinite(phys).all()
    # surface drag must decelerate the BL tangential wind at low levels
    vb = phys[4].reshape(grid.spatial_shape)
    v0 = v.reshape(grid.spatial_shape)
    assert vb[:, :, 0].max() < v0[:, :, 0].max()
    # and produce BL inflow (negative ub) somewhere
    assert phys[3].min() < -0.01


def test_slab_tcbl_spindown(tmp_path):
    """Williams (2013) slab TCBL (repaired): drag + imbalance develop
    inflow below a fixed gradient wind."""
    gp = GridParameters(
        geometry="R",
        xmin=0.0,
        xmax=2.0e5,
        num_cells=40,
        BCL={"vgr": BC.R1T0, "u": BC.R1T0, "v": BC.R1T0, "w": BC.R1T1},
        BCR={"vgr": BC.R0, "u": BC.R1T1, "v": BC.R0, "w": BC.R0},
        vars={"vgr": 1, "u": 2, "v": 3, "w": 4},
    )
    model = ModelParameters(
        ts=5.0,
        integration_time=1800.0,
        output_interval=1800.0,
        equation_set="Williams2013_slabTCBL",
        initial_conditions=str(tmp_path / "ics.csv"),
        output_dir=str(tmp_path / "out"),
        grid_params=gp,
        physical_params={"K": 1500.0, "Cd": 2.4e-3, "h": 1000.0, "f": 5.0e-5},
    )
    grid = create_grid(gp, jnp.float64)
    r = grid.gridpoints()[:, 0]
    rm, vm = 5.0e4, 30.0
    vgr = np.where(r < rm, vm * r / rm, vm * rm / r)
    with open(model.initial_conditions, "w") as f:
        f.write("r,vgr,u,v,w\n")
        for i in range(len(r)):
            f.write(f"{r[i]},{vgr[i]},0.0,{vgr[i]},0.0\n")
    grid, phys = integrate_model(model, write_outputs=False)
    assert np.isfinite(phys).all()
    # BL inflow develops (u < 0) and v is reduced below gradient wind
    assert phys[1].min() < -0.5
    assert phys[2].max() < vgr.max()
    # diagnostic w from BL convergence is populated
    assert np.abs(phys[3]).max() > 1e-4


def test_z_geometry_not_implemented():
    with pytest.raises(ValueError):
        create_grid(GridParameters(geometry="Z", vars={"u": 1}))


def test_moist_euler_rlz(tmp_path):
    """Full 3-D cylindrical moist core (BASELINE config 5): balanced state
    stays balanced; an off-axis warm bubble rises, stays finite."""
    import pytest  # noqa: F401

    nz = 24
    gp = GridParameters(
        geometry="RLZ",
        xmin=0.0,
        xmax=10000.0,
        num_cells=8,
        lDim=16,
        zmin=0.0,
        zmax=10000.0,
        zDim=nz,
        BCL={"u": BC.R1T0, "v": BC.R1T0, "w": BC.R1T1},
        BCR={"u": BC.R1T0, "v": BC.R0},
        vars={
            "s": 1, "xi": 2, "mu": 3, "u": 4, "v": 5, "w": 6,
            "mu_c": 7, "mu_r": 8, "qss": 9,
        },
    )
    zs = np.linspace(0.0, 12000.0, 40)
    theta = 300.0 + 0.004 * zs
    qv = 14.0 * np.exp(-zs / 2500.0)
    sounding = tmp_path / "sounding.txt"
    with open(sounding, "w") as f:
        f.write(f"1015.0 {theta[0]} {qv[0]}\n")
        for z, th, q in zip(zs[1:], theta[1:], qv[1:]):
            f.write(f"{z} {th} {q}\n")
    model = ModelParameters(
        ts=0.25,
        integration_time=30.0,
        output_interval=30.0,
        equation_set="MoistEulerRLZ",
        initial_conditions=str(tmp_path / "ics.csv"),
        output_dir=str(tmp_path / "out"),
        ref_state_file=str(sounding),
        grid_params=gp,
        physical_params={"K": 10.0, "f": 5.0e-5},
        options={"semiimplicit": True},
    )
    grid = create_grid(gp, jnp.float64)
    pts = grid.gridpoints()
    r, lam, z = pts[:, 0], pts[:, 1], pts[:, 2]
    # off-axis warm bubble at (r=4km, lam=0, z=2km)
    x = r * np.cos(lam)
    y = r * np.sin(lam)
    rad = np.sqrt(((x - 4000.0) / 1500.0) ** 2 + (y / 1500.0) ** 2 + ((z - 2000.0) / 1500.0) ** 2)
    s_pert = 3.0 * np.maximum(0.0, np.cos(np.pi * np.minimum(rad, 1.0) / 2.0)) ** 2
    names = list(gp.vars)
    with open(model.initial_conditions, "w") as f:
        f.write("r,l,z," + ",".join(names) + "\n")
        for i in range(len(r)):
            vals = {"s": s_pert[i]}
            f.write(
                f"{r[i]},{lam[i]},{z[i]},"
                + ",".join(str(vals.get(n, 0.0)) for n in names) + "\n"
            )
    grid, phys = integrate_model(model, write_outputs=False)
    assert np.isfinite(phys).all()
    w = phys[5]
    assert w.max() > 0.01, w.max()  # bubble rises
    assert np.abs(w).max() < 30.0
    # balanced background far from the bubble stays quiet: opposite side
    W = w.reshape(grid.spatial_shape)
    far = W[:, grid.nl // 2, :]  # lam = pi side
    assert np.abs(far).max() < 0.5 * w.max() + 0.05
