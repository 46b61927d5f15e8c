"""SLZ 3-D global spherical shell: the pole-to-pole moist compressible
core (MoistEulerSLZ).

Measured context (docs/RESULTS.md): the zero-perturbation global state
is preserved to machine zero (|w| ~ 3e-15 after 600 steps / 150 s — the hydrostatic
reference state is spectrally balanced and the spherical metric terms
vanish identically on it), and a mid-latitude warm moist bubble rises
through the column.  The vertical lid here is 15 km; 20 km lids at this
ts blow up under the DEFAULT reference-faithful microphysics because the
explicit qss relaxation rate invtau ~ 1/p crosses the AB3 stability
limit aloft (root cause pinned in tests/test_stiff_relaxation.py, which
also pins the fix: options['stiff_relaxation']='exp' runs the 20 km
column at ts = 1.0).
"""

import tempfile

import numpy as np
import jax.numpy as jnp
import pytest

from scythe_tpu import ZBC, GridParameters, ModelParameters, create_grid
from scythe_tpu import timeintegration as ti
from scythe_tpu.model import build_context, build_step, make_scan
from scythe_tpu.physics import thermodynamics as td

VARS = {
    "s": 1, "xi": 2, "mu": 3, "u": 4, "v": 5, "w": 6,
    "mu_c": 7, "mu_r": 8, "qss": 9,
}


def _sounding(tmp_path):
    zs = np.linspace(0.0, 24000.0, 80)
    theta = np.where(
        zs <= 12000.0,
        300.0 + 43.0 * (zs / 12000.0) ** 1.25,
        343.0 * np.exp(9.81 / (1004.0 * 213.0) * (zs - 12000.0)),
    )
    qv = np.where(zs <= 1200.0, 13.0, 13.0 * np.exp(-(zs - 1200.0) / 2200.0))
    qv = np.where(zs > 9000.0, 0.02, qv)
    p = tmp_path / "snd.txt"
    with open(p, "w") as f:
        f.write(f"1000.0 {theta[0]} {qv[0]}\n")
        for z, th, q in zip(zs[1:], theta[1:], qv[1:]):
            f.write(f"{z} {th} {q}\n")
    return str(p)


def _model(tmp_path, num_cells=12, nl=32, ts=0.25, T=300.0):
    gp = GridParameters(
        geometry="SLZ",
        xmin=-np.pi / 2,
        xmax=np.pi / 2,
        num_cells=num_cells,
        lDim=nl,
        sphere_radius=6.37122e6,
        zmin=0.0,
        zmax=15000.0,
        zDim=24,
        BCB={"s": ZBC.R1T1, "u": ZBC.R1T1, "v": ZBC.R1T1, "mu": ZBC.R1T1,
             "mu_c": ZBC.R1T1, "w": ZBC.R1T0},
        BCT={"s": ZBC.R1T1, "u": ZBC.R1T1, "v": ZBC.R1T1, "mu": ZBC.R1T1,
             "mu_c": ZBC.R1T1, "mu_r": ZBC.R1T1, "w": ZBC.R1T0},
        vars=VARS,
    )
    return ModelParameters(
        ts=ts,
        integration_time=T,
        output_interval=T,
        equation_set="MoistEulerSLZ",
        initial_conditions="unused",
        output_dir=str(tmp_path / "out"),
        ref_state_file=_sounding(tmp_path),
        grid_params=gp,
        physical_params={"K": 100.0},
        options={"semiimplicit": True, "sedimentation": "active"},
    )


def test_slz_global_balance(tmp_path):
    """Zero perturbation on the balanced reference state stays at machine
    zero pole to pole (measured ~3e-15)."""
    model = _model(tmp_path)
    grid = create_grid(model.grid_params, jnp.float64)
    ctx = build_context(model, grid, jnp.float64)
    spec0 = grid.analysis(
        jnp.asarray(np.zeros((grid.nvars,) + grid.spatial_shape))
    )
    state = ti.initial_state(spec0, (grid.nvars,) + grid.spatial_shape, jnp.float64)
    step = build_step(model, grid, ctx, jnp.float64)
    state = make_scan(step, 600)(state)  # 150 s
    phys = np.asarray(grid.synthesis(state.spec)["val"])
    assert np.isfinite(phys).all()
    assert np.abs(phys[5]).max() < 1e-10
    assert np.abs(phys[3]).max() < 1e-10


def test_slz_deep_shell_with_stiff_relaxation(tmp_path):
    """The 20 km whole-stratosphere global shell at ts = 1.0: unstable
    under the default reference-faithful rates (ts*invtau > the AB3
    limit aloft), machine zero with options['stiff_relaxation']='exp'
    (root cause + RZ pins in tests/test_stiff_relaxation.py)."""
    import dataclasses

    m0 = _model(tmp_path, ts=1.0)
    gp = dataclasses.replace(m0.grid_params, zmax=20000.0)
    model = dataclasses.replace(
        m0, grid_params=gp, options={**m0.opts(), "stiff_relaxation": "exp"}
    )
    grid = create_grid(gp, jnp.float64)
    ctx = build_context(model, grid, jnp.float64)
    spec0 = grid.analysis(
        jnp.asarray(np.zeros((grid.nvars,) + grid.spatial_shape))
    )
    state = ti.initial_state(spec0, (grid.nvars,) + grid.spatial_shape, jnp.float64)
    step = build_step(model, grid, ctx, jnp.float64)
    state = make_scan(step, 120)(state)  # 120 s
    phys = np.asarray(grid.synthesis(state.spec)["val"])
    assert np.isfinite(phys).all()
    assert np.abs(phys[5]).max() < 1e-10


def test_slz_midlatitude_bubble_rises(tmp_path):
    """A warm moist thermal at 30N rises through the global column; the
    rest of the sphere stays quiet apart from radiated gravity waves."""
    model = _model(tmp_path)
    grid = create_grid(model.grid_params, jnp.float64)
    ctx = build_context(model, grid, jnp.float64)
    pts = grid.gridpoints()
    phi = pts[:, 0].reshape(grid.spatial_shape)
    lam = pts[:, 1].reshape(grid.spatial_shape)
    z = pts[:, 2].reshape(grid.spatial_shape)
    # bubble sized for the coarse test grid: 0.5 rad ~ 3200 km (two
    # cells) so the spline projection resolves it without meridional
    # ringing swamping the updraft
    rad = np.sqrt(
        ((phi - np.pi / 6) / 0.5) ** 2
        + ((lam - np.pi) / 0.5) ** 2
        + ((z - 1500.0) / 1500.0) ** 2
    )
    shape = np.maximum(0.0, np.cos(np.pi * np.minimum(rad, 1.0) / 2.0)) ** 2
    phys0 = np.zeros((grid.nvars,) + grid.spatial_shape)
    phys0[0] = 10.0 * shape
    qv_bar = np.asarray(
        td.ahyp(ctx.ref_state.mubar[None, None, :, 0])
    ) * np.ones_like(z)
    phys0[2] = np.asarray(
        td.bhyp(jnp.asarray(qv_bar * (1.0 + 0.3 * shape)))
    ) - np.asarray(ctx.ref_state.mubar[None, None, :, 0])
    spec0 = grid.analysis(jnp.asarray(phys0))
    state = ti.initial_state(spec0, (grid.nvars,) + grid.spatial_shape, jnp.float64)
    step = build_step(model, grid, ctx, jnp.float64)
    state = make_scan(step, 1400)(state)  # 350 s
    phys = np.asarray(grid.synthesis(state.spec)["val"])
    assert np.isfinite(phys).all()
    w = phys[VARS["w"] - 1]
    # bounded everywhere (pole-ring metric noise at this very coarse
    # resolution is of the same order as the weak thermal signal; the
    # 24-cell probe separated them cleanly — docs/RESULTS.md).  Bound
    # raised 1.0 -> 1.5 with the exact perturbation-PGF cross term
    # (ctx.vertical_pgf): the corrected buoyancy gives a ~5% stronger
    # updraft (1.05 m/s) on this coarse thermal.
    assert np.abs(w).max() < 1.5, np.abs(w).max()
    # the thermal's latitude band carries a real, elevated updraft
    band = np.abs(np.degrees(grid.r_mish) - 30.0) < 20.0
    wb = w[band]
    ib = np.unravel_index(np.argmax(wb), wb.shape)
    assert wb.max() > 0.01, wb.max()
    assert grid.z_mish[ib[2]] > 500.0, grid.z_mish[ib[2]]


def test_slz_sharding_invariance(tmp_path):
    """Latitude decomposition of the global 3-D core: 4 shards == single
    device to roundoff (psum path)."""
    from scythe_tpu.parallel import sharding as sh

    model = _model(tmp_path)
    grid = create_grid(model.grid_params, jnp.float64)
    ctx = build_context(model, grid, jnp.float64)
    pts = grid.gridpoints()
    phi = pts[:, 0].reshape(grid.spatial_shape)
    z = pts[:, 2].reshape(grid.spatial_shape)
    rad = np.sqrt(((phi - np.pi / 6) / 0.12) ** 2 + ((z - 1500.0) / 1500.0) ** 2)
    phys0 = np.zeros((grid.nvars,) + grid.spatial_shape)
    phys0[0] = 10.0 * np.maximum(0.0, np.cos(np.pi * np.minimum(rad, 1.0) / 2.0)) ** 2
    spec0 = grid.analysis(jnp.asarray(phys0))
    state0 = ti.initial_state(spec0, (grid.nvars,) + grid.spatial_shape, jnp.float64)
    step = build_step(model, grid, ctx, jnp.float64)
    ref = np.asarray(make_scan(step, 30)(state0).spec)

    mesh = sh.make_mesh(4)
    st = sh.shard_state(state0, mesh, "psum")
    sstep = sh.build_sharded_step(model, grid, ctx, jnp.float64, mesh, "psum")
    spec = np.asarray(make_scan(sstep, 30)(st).spec)
    assert np.abs(spec - ref).max() < 1e-11 * np.abs(ref).max()


def test_slz_csv_driver_roundtrip(tmp_path):
    """SLZ through the standard driver: CSV ICs (lat,lon,z schema) ->
    integrate_model -> CSV output -> read back."""
    from scythe_tpu import integrate_model
    from scythe_tpu.io import read_physical_grid

    model = _model(tmp_path, T=5.0).with_(
        initial_conditions=str(tmp_path / "ics.csv"),
        output_dir=str(tmp_path / "out"),
    )
    grid = create_grid(model.grid_params, jnp.float64)
    pts = grid.gridpoints()
    z = pts[:, 2]
    s0 = 0.5 * np.exp(-(((z - 3000.0) / 2000.0) ** 2))
    names = list(model.grid_params.vars)
    with open(model.initial_conditions, "w") as f:
        f.write("lat,lon,z," + ",".join(names) + "\n")
        for i in range(len(z)):
            vals = {"s": s0[i]}
            f.write(
                f"{pts[i,0]},{pts[i,1]},{pts[i,2]},"
                + ",".join(str(vals.get(n, 0.0)) for n in names) + "\n"
            )
    grid2, phys = integrate_model(model)
    assert np.isfinite(phys).all()
    import os

    outs = sorted(os.listdir(model.output_dir))
    assert any(f.startswith("physical_out_5.0") for f in outs), outs
    back = read_physical_grid(
        os.path.join(model.output_dir, "physical_out_5.0.csv"), grid2
    )
    assert np.abs(back - phys).max() < 1e-12
