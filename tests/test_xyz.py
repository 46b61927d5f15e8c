"""Cartesian XYZ box geometry (beyond the reference's four grids).

Validation strategy:
* transform correctness: round trip + exact d/dy, d2/dy2 on an in-space
  function (the dl/dll slots of an XYZ grid are true y derivatives);
* structural reduction: a y-invariant MoistEulerXYZ run with v = 0 and
  f = 0 must reproduce the RZ rainfall_test slab field-for-field (the
  equation set mirrors rainfall_test's term order exactly, so the only
  differences are roundoff-level spurious y modes);
* discrete y-translation equivariance: rolling the ICs by whole grid
  points in the periodic y rolls the solution identically.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from scythe_tpu import BC, ZBC, GridParameters, ModelParameters, create_grid
from scythe_tpu import timeintegration as ti
from scythe_tpu.model import build_context, build_step, make_scan

LX, LY, LZ = 12000.0, 8000.0, 10000.0
XYZ_VARS = {
    "s": 1, "xi": 2, "mu": 3, "u": 4, "v": 5, "w": 6,
    "mu_c": 7, "mu_r": 8, "qss": 9,
}
RZ_VARS = {
    "s": 1, "xi": 2, "mu": 3, "u": 4, "w": 5, "mu_c": 6, "mu_r": 7,
    "qss": 8,
}


def _xyz_grid(dtype=jnp.float64, ny=16, vars_map=None):
    gp = GridParameters(
        geometry="XYZ",
        xmin=0.0,
        xmax=LX,
        num_cells=12,
        lDim=ny,
        ymin=0.0,
        ymax=LY,
        zmin=0.0,
        zmax=LZ,
        zDim=16,
        BCL={"u": BC.R1T0, "w": BC.R1T1},
        BCR={"u": BC.R1T0},
        vars=vars_map or XYZ_VARS,
    )
    return gp, create_grid(gp, dtype)


def test_xyz_roundtrip_and_y_derivatives():
    gp, grid = _xyz_grid(vars_map={"a": 1})
    x = grid.gridpoints()[:, 0].reshape(grid.spatial_shape)
    y = grid.gridpoints()[:, 1].reshape(grid.spatial_shape)
    z = grid.gridpoints()[:, 2].reshape(grid.spatial_shape)
    ky = 2
    f = (
        np.sin(2.0 * np.pi * ky * y / LY)
        * (1.0 + 0.3 * np.cos(2.0 * np.pi * x / LX))
        * (z / LZ)
    )
    spec = grid.analysis(jnp.asarray(f[None]))
    out = grid.synthesis(spec)
    # in-space-ish smooth function: round trip to spline-filter accuracy
    assert np.abs(np.asarray(out["val"][0]) - f).max() < 2e-3 * np.abs(f).max()
    # y-derivatives are exact for resolved Fourier modes: compare against
    # the analytic derivative of the FITTED value field
    fit = np.asarray(out["val"][0])
    dy = np.asarray(out["dl"][0])
    dyy = np.asarray(out["dll"][0])
    k = 2.0 * np.pi * ky / LY
    # fitted field is still a pure ky mode in y => dy == k * quadrature fit
    F = np.fft.rfft(fit, axis=1)
    D = np.fft.rfft(dy, axis=1)
    D2 = np.fft.rfft(dyy, axis=1)
    assert (
        np.abs(D[:, ky, :] - 1j * k * F[:, ky, :]).max()
        < 1e-10 * np.abs(F[:, ky, :]).max()
    )
    assert (
        np.abs(D2[:, ky, :] + k * k * F[:, ky, :]).max()
        < 1e-10 * k * np.abs(F[:, ky, :]).max()
    )
    # no spurious modes
    mask = np.ones(F.shape[1], bool)
    mask[ky] = False
    assert np.abs(D[:, mask, :]).max() < 1e-9 * np.abs(D).max()


def _sounding(tmp_path):
    zs = np.linspace(0.0, 1.2 * LZ, 40)
    theta = 300.0 + 0.004 * zs
    qv = 12.0 * np.exp(-zs / 2500.0)
    p = tmp_path / "snd.txt"
    with open(p, "w") as f:
        f.write(f"1015.0 {theta[0]} {qv[0]}\n")
        for z, th, q in zip(zs[1:], theta[1:], qv[1:]):
            f.write(f"{z} {th} {q}\n")
    return str(p)


def _model(tmp_path, gp, eqset, ics_name):
    return ModelParameters(
        ts=0.2,
        integration_time=12.0,
        output_interval=12.0,
        equation_set=eqset,
        initial_conditions=str(tmp_path / ics_name),
        output_dir=str(tmp_path / "out"),
        ref_state_file=_sounding(tmp_path),
        grid_params=gp,
        physical_params={"K": 20.0},
        options={"semiimplicit": True},
    )


def _bubble_s(x, z):
    rad = np.sqrt(((x - 0.4 * LX) / 2500.0) ** 2 + ((z - 2500.0) / 2000.0) ** 2)
    return 2.0 * np.maximum(0.0, np.cos(np.pi * np.minimum(rad, 1.0) / 2.0)) ** 2


def _run(model, grid, phys0, n_steps):
    dtype = jnp.float64
    ctx = build_context(model, grid, dtype)
    spec0 = grid.analysis(jnp.asarray(phys0, dtype))
    state = ti.initial_state(spec0, (grid.nvars,) + grid.spatial_shape, dtype)
    step = build_step(model, grid, ctx, dtype)
    state = make_scan(step, n_steps)(state)
    return np.asarray(grid.synthesis(state.spec)["val"])


def test_xyz_reduces_to_rz_slab(tmp_path):
    """y-invariant XYZ (v=0, f=0) == the RZ rainfall_test slab."""
    gp_xyz, grid_xyz = _xyz_grid()
    gp_rz = GridParameters(
        geometry="RZ",
        xmin=0.0,
        xmax=LX,
        num_cells=12,
        zmin=0.0,
        zmax=LZ,
        zDim=16,
        BCL={"u": BC.R1T0, "w": BC.R1T1},
        BCR={"u": BC.R1T0},
        vars=RZ_VARS,
    )
    grid_rz = create_grid(gp_rz, jnp.float64)

    pts = grid_rz.gridpoints()
    x2, z2 = pts[:, 0].reshape(grid_rz.spatial_shape), pts[:, 1].reshape(
        grid_rz.spatial_shape
    )
    s2 = _bubble_s(x2, z2)
    phys_rz = np.zeros((gp_rz.nvars,) + grid_rz.spatial_shape)
    phys_rz[0] = s2
    phys_xyz = np.zeros((gp_xyz.nvars,) + grid_xyz.spatial_shape)
    for name in RZ_VARS:
        v2 = phys_rz[gp_rz.var_index(name)]
        phys_xyz[gp_xyz.var_index(name)] = v2[:, None, :]

    # match the vertical-PGF form: rainfall_test defaults to the
    # reference-faithful perturbation PGF, MoistEulerXYZ to the exact
    # cross-term form (ctx.vertical_pgf) — opt the RZ side into the
    # exact form so the reduction compares identical dynamics
    import dataclasses

    m_rz = _model(tmp_path, gp_rz, "rainfall_test", "rz.csv")
    m_rz = dataclasses.replace(
        m_rz, options={**m_rz.opts(), "exact_vertical_pgf": True}
    )
    m_xyz = _model(tmp_path, gp_xyz, "MoistEulerXYZ", "xyz.csv")
    out_rz = _run(m_rz, grid_rz, phys_rz, 60)
    out_xyz = _run(m_xyz, grid_xyz, phys_xyz, 60)

    assert np.isfinite(out_xyz).all()
    # v stays zero to roundoff
    assert np.abs(out_xyz[gp_xyz.var_index("v")]).max() < 1e-8
    for name in RZ_VARS:
        a = out_xyz[gp_xyz.var_index(name)]
        b = out_rz[gp_rz.var_index(name)]
        scale = np.abs(b).max() + 1e-12
        # every y column equals the slab solution
        err = np.abs(a - b[:, None, :]).max()
        assert err < 1e-8 * max(scale, 1.0), (name, err, scale)


@pytest.mark.parametrize("method", ["psum", "halo"])
def test_xyz_sharding_invariance(tmp_path, method):
    """The radial (x) domain decomposition is geometry-agnostic: 4-shard
    XYZ trajectories match single-device to roundoff on both comm paths."""
    from scythe_tpu.parallel import sharding as sh

    n = 4
    gp = GridParameters(
        geometry="XYZ",
        xmin=0.0,
        xmax=16000.0,
        num_cells=16,  # 4 cells/shard (the halo/Schur minimum)
        lDim=16,
        ymin=0.0,
        ymax=LY,
        zmin=0.0,
        zmax=LZ,
        zDim=16,
        BCL={"u": BC.R1T0, "w": BC.R1T1},
        BCR={"u": BC.R1T0},
        vars=XYZ_VARS,
    )
    grid = create_grid(gp, jnp.float64)
    pts = grid.gridpoints()
    x = pts[:, 0].reshape(grid.spatial_shape)
    y = pts[:, 1].reshape(grid.spatial_shape)
    z = pts[:, 2].reshape(grid.spatial_shape)
    phys0 = np.zeros((gp.nvars,) + grid.spatial_shape)
    phys0[0] = _bubble_s(x, z) * (1.0 + 0.3 * np.sin(2.0 * np.pi * y / LY))
    model = _model(tmp_path, gp, "MoistEulerXYZ", "shard.csv")
    dtype = jnp.float64
    ctx = build_context(model, grid, dtype)
    spec0 = grid.analysis(jnp.asarray(phys0, dtype))
    state0 = ti.initial_state(spec0, (gp.nvars,) + grid.spatial_shape, dtype)
    step = build_step(model, grid, ctx, dtype)
    ref = np.asarray(grid.synthesis(make_scan(step, 20)(state0).spec)["val"])

    cl = gp.num_cells // n
    mesh = sh.make_mesh(n)
    st = state0
    if method == "halo":
        st = st._replace(spec=sh.spec_to_blocks(st.spec, n, cl))
    st = sh.shard_state(st, mesh, method)
    sstep = sh.build_sharded_step(model, grid, ctx, dtype, mesh, method)
    spec = make_scan(sstep, 20)(st).spec
    if method == "halo":
        spec = sh.blocks_to_spec(jnp.asarray(np.asarray(spec)), n, cl)
    got = np.asarray(grid.synthesis(jnp.asarray(spec))["val"])
    assert np.abs(got - ref).max() < 1e-12 * np.abs(ref).max()


def test_xyz_y_translation_equivariance(tmp_path):
    gp, grid = _xyz_grid(ny=16)
    pts = grid.gridpoints()
    x = pts[:, 0].reshape(grid.spatial_shape)
    y = pts[:, 1].reshape(grid.spatial_shape)
    z = pts[:, 2].reshape(grid.spatial_shape)
    s = _bubble_s(x, z) * (1.0 + 0.3 * np.sin(2.0 * np.pi * y / LY))
    phys0 = np.zeros((gp.nvars,) + grid.spatial_shape)
    phys0[0] = s
    model = _model(tmp_path, gp, "MoistEulerXYZ", "roll.csv")
    out = _run(model, grid, phys0, 30)
    out_rolled = _run(model, grid, np.roll(phys0, 5, axis=2), 30)
    scale = np.abs(out).max()
    assert np.abs(np.roll(out, 5, axis=2) - out_rolled).max() < 1e-9 * scale
