"""SL spherical-shell geometry + global shallow water (Williamson 1992).

Gates calibrated from measured results (examples/williamson_sphere.py):
case 2 l2(h) = 1.6e-4 after 5 days, spurious v < 5 mm/s; case 6 corr
0.9996 after 1 day.
"""

import importlib.util
import os

import numpy as np
import jax.numpy as jnp
import pytest

from scythe_tpu import GridParameters, create_grid

_HERE = os.path.dirname(__file__)
_spec = importlib.util.spec_from_file_location(
    "williamson_example",
    os.path.join(_HERE, "..", "examples", "williamson_sphere.py"),
)
wm = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(wm)


def _grid(num_cells=32, nl=96):
    gp = GridParameters(
        geometry="SL",
        xmin=-np.pi / 2,
        xmax=np.pi / 2,
        num_cells=num_cells,
        lDim=nl,
        sphere_radius=wm.A_EARTH,
        vars={"h": 1, "u": 2, "v": 3},
    )
    return gp, create_grid(gp, jnp.float64)


def test_sl_transform_roundtrip():
    gp, grid = _grid()
    pts = grid.gridpoints()
    phi = pts[:, 0].reshape(grid.spatial_shape)
    lam = pts[:, 1].reshape(grid.spatial_shape)
    # smooth low-order spherical pattern (resolved everywhere incl. the
    # masked pole rings: zonal structure ~ cos(phi)^k vanishes there)
    f = (
        np.sin(phi) ** 2
        + 0.3 * np.cos(phi) ** 4 * np.cos(4 * lam)
        + 0.1 * np.cos(phi) * np.sin(lam)
    )
    phys = np.stack([f, 0.5 * f, np.zeros_like(f)])
    out = np.asarray(grid.synthesis(grid.analysis(jnp.asarray(phys)))["val"])
    assert np.abs(out[0] - f).max() < 2e-3 * np.abs(f).max()


def test_sl_pole_rings_near_axisymmetric():
    """The a*cos(lat) ring mask forces the pole rings toward zonal
    wavenumbers their circumference can support (the polar r->0
    treatment applied to the sphere)."""
    gp, grid = _grid()
    mask = np.asarray(grid.ring_mask)
    # pole rings keep only a couple of wavenumbers; the equator keeps many
    assert mask[0].sum() <= 5
    assert mask[mask.shape[0] // 2].sum() > 40


@pytest.fixture(scope="module")
def w2_run():
    model = wm.build_model(ts=300.0)
    grid = create_grid(model.grid_params, jnp.float64)
    pts = grid.gridpoints()
    phi = pts[:, 0].reshape(grid.spatial_shape)
    h2, u2, v2 = wm.w2_fields(phi)
    grid, out = wm.run_case(model, np.stack([h2, u2, v2]), 5 * 288, grid=grid)
    return phi, h2, u2, out


def test_williamson2_steady_state(w2_run):
    phi, h2, u2, out = w2_run
    assert np.isfinite(out).all()
    l2 = np.sqrt(np.mean((out[0] - h2) ** 2)) / np.sqrt(np.mean(h2**2))
    assert l2 < 5.0e-4, l2  # measured 1.6e-4 after 5 days
    assert np.abs(out[2]).max() < 0.05, np.abs(out[2]).max()  # v ~ 5 mm/s
    # zonal jet intact
    assert abs(out[1].max() - u2.max()) < 0.2


def test_williamson6_rossby_haurwitz():
    # dt from the pole-ring gravity CFL (example docstring): 300 s NaNs
    model = wm.build_model(ts=150.0)
    grid = create_grid(model.grid_params, jnp.float64)
    pts = grid.gridpoints()
    phi = pts[:, 0].reshape(grid.spatial_shape)
    lam = pts[:, 1].reshape(grid.spatial_shape)
    h6, u6, v6 = wm.w6_fields(phi, lam)
    grid, out = wm.run_case(model, np.stack([h6, u6, v6]), 576, grid=grid)
    assert np.isfinite(out).all()
    h_an, _, _ = wm.w6_fields(phi, lam - wm.w6_phase_speed() * 86400.0)
    corr = np.corrcoef(out[0].ravel(), h_an.ravel())[0, 1]
    assert corr > 0.999, corr  # measured 0.9996
    # and the phase really moved: correlation against the UNSHIFTED IC
    # must be visibly worse than against the advected field
    corr0 = np.corrcoef(out[0].ravel(), h6.ravel())[0, 1]
    assert corr > corr0 + 0.0005, (corr, corr0)
    # global mass conservation (Gauss quadrature in latitude): measured
    # drift ~4e-7/day for the advective-form scheme
    from scythe_tpu.basis import bspline

    w_quad = bspline.mish_weights(
        model.grid_params.xmin, model.grid_params.xmax,
        model.grid_params.num_cells,
    )
    m0 = float((h6 * np.cos(phi) * w_quad[:, None]).sum())
    m1 = float((out[0] * np.cos(phi) * w_quad[:, None]).sum())
    assert abs(m1 - m0) / abs(m0) < 5e-6, (m0, m1)


@pytest.mark.parametrize("method", ["psum", "halo"])
def test_sl_sharding_invariance(method):
    """Latitude decomposition on the sphere: 4-shard == single device to
    roundoff on both comm paths (needs the CFL-safe dt — at a marginally
    unstable dt the roundoff-seeded pole mode decorrelates trajectories)."""
    from scythe_tpu import ModelParameters, timeintegration as ti
    from scythe_tpu.model import build_context, build_step, make_scan
    from scythe_tpu.parallel import sharding as sh

    model = wm.build_model(ts=150.0)
    gp = model.grid_params
    grid = create_grid(gp, jnp.float64)
    ctx = build_context(model, grid, jnp.float64)
    pts = grid.gridpoints()
    phi = pts[:, 0].reshape(grid.spatial_shape)
    lam = pts[:, 1].reshape(grid.spatial_shape)
    h, u, v = wm.w6_fields(phi, lam)
    spec0 = grid.analysis(jnp.asarray(np.stack([h, u, v])))
    state0 = ti.initial_state(spec0, (3,) + grid.spatial_shape, jnp.float64)
    step = build_step(model, grid, ctx, jnp.float64)
    ref = np.asarray(make_scan(step, 40)(state0).spec)

    n = 4
    cl = gp.num_cells // n
    mesh = sh.make_mesh(n)
    st = state0
    if method == "halo":
        st = st._replace(spec=sh.spec_to_blocks(st.spec, n, cl))
    st = sh.shard_state(st, mesh, method)
    sstep = sh.build_sharded_step(model, grid, ctx, jnp.float64, mesh, method)
    spec = make_scan(sstep, 40)(st).spec
    if method == "halo":
        spec = sh.blocks_to_spec(jnp.asarray(np.asarray(spec)), n, cl)
    assert np.abs(np.asarray(spec) - ref).max() < 1e-11 * np.abs(ref).max()


def test_williamson1_cross_polar_advection():
    """Case 1 at alpha = pi/2: the cosine bell rides the solid-body flow
    DIRECTLY over both poles and back to its start in 12 days — the acid
    test of the a*cos(lat) ring-mask pole treatment.  Measured 12-day l2
    (f64): 0.46 / 0.22 / 0.11 at 32 / 48 / 64 cells (≈2nd order), peak
    retention 57 / 81 / 93% — coarse-resolution-typical diffusion, no
    pole artifacts.  The suite runs the 32-cell case."""
    from scythe_tpu import timeintegration as ti
    from scythe_tpu.model import build_context, build_step, make_scan

    a = wm.A_EARTH
    u0 = 2 * np.pi * a / (12 * 86400.0)
    model = wm.build_model(ts=300.0).with_(
        equation_set="AdvectionSphere",
        physical_params={"u0": u0, "alpha": np.pi / 2},
    )
    grid = create_grid(model.grid_params, jnp.float64)
    ctx = build_context(model, grid, jnp.float64)
    pts = grid.gridpoints()
    phi = pts[:, 0].reshape(grid.spatial_shape)
    lam = pts[:, 1].reshape(grid.spatial_shape)
    R = a / 3
    r = a * np.arccos(
        np.clip(np.cos(phi) * np.cos(lam - 1.5 * np.pi), -1, 1)
    )
    h0 = np.where(r < R, 500.0 * (1 + np.cos(np.pi * r / R)), 0.0)
    phys0 = np.zeros((3,) + grid.spatial_shape)
    phys0[0] = h0
    spec0 = grid.analysis(jnp.asarray(phys0))
    state = ti.initial_state(spec0, (3,) + grid.spatial_shape, jnp.float64)
    step = build_step(model, grid, ctx, jnp.float64)
    state = make_scan(step, int(12 * 86400 / 300))(state)
    out = np.asarray(grid.synthesis(state.spec)["val"])
    assert np.isfinite(out).all()
    l2 = np.sqrt(np.mean((out[0] - h0) ** 2)) / np.sqrt(np.mean(h0**2))
    assert l2 < 0.55, l2  # measured 0.46 at this resolution
    assert out[0].max() > 500.0, out[0].max()  # peak 57% retained
    # the bell came back: centroid within a couple of grid lengths
    w = np.maximum(out[0], 0.0)
    lam_c = np.angle(np.sum(w * np.exp(1j * lam))) % (2 * np.pi)
    assert abs(lam_c - 1.5 * np.pi) < 0.25, lam_c
    phi_c = (w * phi).sum() / w.sum()
    assert abs(phi_c) < 0.15, phi_c


def test_williamson5_mountain_flow():
    """Case 5: zonal flow over the conical mountain, 5 days.  No analytic
    solution; gates from the measured 15-day run (docs/RESULTS.md): a lee
    wave train develops, the jet accelerates, mass is conserved."""
    from scythe_tpu import timeintegration as ti
    from scythe_tpu.basis import bspline
    from scythe_tpu.model import build_context, build_step, make_scan

    model = wm.build_model(ts=200.0)
    grid = create_grid(model.grid_params, jnp.float64)
    ctx = build_context(model, grid, jnp.float64)
    pts = grid.gridpoints()
    phi = pts[:, 0].reshape(grid.spatial_shape)
    lam = pts[:, 1].reshape(grid.spatial_shape)
    h5, u5, v5, hs = wm.w5_fields(phi, lam)
    hs_f = wm.setup_topography(grid, ctx, hs)
    grid, out = wm.run_case(model, np.stack([h5, u5, v5]), 5 * 432,
                            grid=grid, ctx=ctx)
    assert np.isfinite(out).all()
    # the FILTERED h_s is what the model feels; the raw cone's kink
    # leaves a static projection residual that would pollute the wave
    # diagnostic
    surf = out[0] + hs_f
    dev = surf - surf.mean(axis=1, keepdims=True)
    rms = float(np.sqrt((dev**2).mean()))
    assert 15.0 < rms < 120.0, rms  # measured ~32 m at day 5
    assert 25.0 < out[1].max() < 45.0, out[1].max()  # jet spin-up
    w_quad = bspline.mish_weights(
        model.grid_params.xmin, model.grid_params.xmax,
        model.grid_params.num_cells,
    )
    m0 = float((h5 * np.cos(phi) * w_quad[:, None]).sum())
    m1 = float((out[0] * np.cos(phi) * w_quad[:, None]).sum())
    assert abs(m1 - m0) / abs(m0) < 1e-5, (m0, m1)


def test_topography_file_driver_path(tmp_path):
    """options['topography_file'] wires the mountain through the standard
    driver (initialize() derives the filtered hs gradient), so case-5
    runs work via integrate_model / the CLI without hand-built contexts."""
    from scythe_tpu import integrate_model

    model = wm.build_model(ts=200.0, t_end=2000.0).with_(
        initial_conditions=str(tmp_path / "ics.csv"),
        output_dir=str(tmp_path / "out"),
        options={"topography_file": str(tmp_path / "topo.csv")},
    )
    grid = create_grid(model.grid_params, jnp.float64)
    pts = grid.gridpoints()
    phi = pts[:, 0].reshape(grid.spatial_shape)
    lam = pts[:, 1].reshape(grid.spatial_shape)
    h5, u5, v5, hs = wm.w5_fields(phi, lam)
    with open(model.initial_conditions, "w") as f:
        f.write("lat,lon,h,u,v\n")
        for a, b, c, d, e in zip(
            pts[:, 0], pts[:, 1], h5.ravel(), u5.ravel(), v5.ravel()
        ):
            f.write(f"{a},{b},{c},{d},{e}\n")
    with open(tmp_path / "topo.csv", "w") as f:
        f.write("lat,lon,hs\n")
        for a, b, c in zip(pts[:, 0], pts[:, 1], hs.ravel()):
            f.write(f"{a},{b},{c}\n")
    grid2, phys = integrate_model(model, write_outputs=False)
    assert np.isfinite(phys).all()
    # the mountain deflects the flow: meridional wind develops near it
    # (with flat terrain v stays ~0 for this zonally-symmetric state)
    assert np.abs(phys[2]).max() > 0.1, np.abs(phys[2]).max()
