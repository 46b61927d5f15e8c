"""Outer Rayleigh sponge: damping behavior + sharding invariance."""

import numpy as np
import jax.numpy as jnp
import pytest

from scythe_tpu import BC, GridParameters, ModelParameters, create_grid
from scythe_tpu.model import build_step, initialize, make_scan
from scythe_tpu.parallel import sharding as sh


def _advection_model(tmp_path, options):
    gp = GridParameters(
        geometry="R",
        xmin=0.0,
        xmax=100.0,
        num_cells=64,
        BCL={"u": BC.PERIODIC},
        BCR={"u": BC.PERIODIC},
        vars={"u": 1},
    )
    model = ModelParameters(
        ts=0.05,
        integration_time=40.0,
        output_interval=40.0,
        equation_set="LinearAdvection1D",
        initial_conditions=str(tmp_path / "ics.csv"),
        output_dir=str(tmp_path / "out"),
        grid_params=gp,
        physical_params={"c_0": 1.0, "K": 0.0},
        options=options,
    )
    grid = create_grid(gp, jnp.float64)
    r = grid.r_mish
    u0 = np.exp(-(((r - 30.0) / 8.0) ** 2))
    with open(model.initial_conditions, "w") as f:
        f.write("r,u\n")
        for a, b in zip(r, u0):
            f.write(f"{a},{b}\n")
    return model


def test_sponge_damps_outer_region(tmp_path):
    """A pulse advecting through the sponge (relaxing to the initial
    state) is strongly damped relative to the sponge-free run."""
    outs = {}
    for label, opts in [
        ("off", {}),
        ("on", {"sponge_width": 30.0, "sponge_tau": 2.0}),
    ]:
        model = _advection_model(tmp_path, opts)
        grid, ctx, state = initialize(model)
        step = build_step(model, grid, ctx, jnp.float64)
        out = make_scan(step, 1200)(state)  # pulse center reaches r=90
        outs[label] = np.asarray(grid.synthesis(out.spec)["val"][0])
    r = create_grid(model.grid_params, jnp.float64).r_mish
    deep = r > 80.0
    peak_off = np.abs(outs["off"][deep]).max()
    peak_on = np.abs(outs["on"][deep]).max()
    assert peak_on < 0.3 * peak_off, (peak_on, peak_off)
    # well upstream of the sponge the solution is essentially unaffected
    # (r < 15 excluded: the periodic wrap of the undamped pulse lands there)
    inner = (r > 15.0) & (r < 40.0)
    assert np.abs(outs["on"][inner] - outs["off"][inner]).max() < 0.05


@pytest.mark.parametrize("method", ["psum", "halo"])
def test_sponge_sharding_invariance(tmp_path, method):
    model = _advection_model(
        tmp_path, {"sponge_width": 30.0, "sponge_tau": 2.0}
    )
    grid, ctx, state = initialize(model)
    step = build_step(model, grid, ctx, jnp.float64)
    ref = make_scan(step, 20)(state)

    mesh = sh.make_mesh(8)
    grid2, ctx2, state2 = sh.initialize_sharded(model, mesh, method=method)
    sstep = sh.build_sharded_step(model, grid2, ctx2, jnp.float64, mesh, method)
    out = make_scan(sstep, 20)(state2)
    spec = np.asarray(out.spec)
    if method == "halo":
        spec = np.asarray(
            sh.blocks_to_spec(out.spec, 8, grid.params.num_cells // 8)
        )
    np.testing.assert_allclose(spec, np.asarray(ref.spec), rtol=1e-12, atol=1e-12)


def test_sponge_without_reference_state_raises():
    """build_step refuses a sponge config when no sponge_ref was set up
    (e.g. integrate_ensemble) rather than silently relaxing to zero."""
    from scythe_tpu.model import build_context
    from scythe_tpu.config import ModelParameters

    gp = GridParameters(
        geometry="R", xmin=0.0, xmax=100.0, num_cells=16,
        BCL={"u": BC.PERIODIC}, BCR={"u": BC.PERIODIC}, vars={"u": 1},
    )
    model = ModelParameters(
        ts=0.05, integration_time=1.0, output_interval=1.0,
        equation_set="LinearAdvection1D",
        grid_params=gp, physical_params={"c_0": 1.0, "K": 0.0},
        options={"sponge_width": 30.0},
    )
    grid = create_grid(gp, jnp.float64)
    ctx = build_context(model, grid, jnp.float64)
    with pytest.raises(ValueError, match="sponge_ref"):
        build_step(model, grid, ctx, jnp.float64)


def _rz_updraft_model(tmp_path, options, tag):
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
    model = ModelParameters(
        ts=0.5,
        integration_time=30.0,
        output_interval=30.0,
        equation_set="LinearAdvectionRZ",
        initial_conditions=str(tmp_path / f"ics_{tag}.csv"),
        output_dir=str(tmp_path / f"out_{tag}"),
        grid_params=gp,
        physical_params={"K": 0.0},
        options=options,
    )
    grid = create_grid(gp, jnp.float64)
    pts = grid.gridpoints()
    r, z = pts[:, 0], pts[:, 1]
    h0 = np.exp(-(((r - 400.0) / 120.0) ** 2) - ((z - 550.0) / 120.0) ** 2)
    with open(model.initial_conditions, "w") as f:
        f.write("r,z,h,u,v,w\n")
        for i in range(len(r)):
            f.write(f"{r[i]},{z[i]},{h0[i]},0.0,0.0,4.0\n")
    return model


def test_top_sponge_damps_rising_blob(tmp_path):
    """options['sponge_top_width']: a blob carried into the top layer by
    a uniform updraft is relaxed toward the (blob-free aloft) initial
    state; without the sponge it arrives at full amplitude (round 5 —
    built for the JW06 polar model-top mode, jw06_r5_probe2.log)."""
    outs = {}
    for label, opts in [
        ("off", {}),
        ("on", {"sponge_top_width": 300.0, "sponge_top_tau": 2.0}),
    ]:
        model = _rz_updraft_model(tmp_path, opts, label)
        grid, ctx, state = initialize(model)
        step = build_step(model, grid, ctx, jnp.float64)
        out = make_scan(step, 180)(state)  # blob center reaches z=910
        outs[label] = np.asarray(
            grid.synthesis(out.spec)["val"][0]
        ).reshape(grid.spatial_shape)
    z = create_grid(model.grid_params, jnp.float64).z_mish
    top = z > 750.0
    peak_off = np.abs(outs["off"][:, top]).max()
    peak_on = np.abs(outs["on"][:, top]).max()
    assert peak_on < 0.35 * peak_off, (peak_on, peak_off)


def test_top_sponge_requires_vertical_axis(tmp_path):
    """A geometry without z must reject sponge_top_width loudly."""
    model = _advection_model(
        tmp_path, {"sponge_top_width": 10.0}
    )
    grid, ctx, state = initialize(model)
    with pytest.raises(ValueError, match="vertical axis"):
        build_step(model, grid, ctx, jnp.float64)


def test_top_sponge_vars_restriction(tmp_path):
    """options['sponge_top_vars']: only the named variables are
    relaxed; the rest advect into the layer untouched."""
    model = _rz_updraft_model(
        tmp_path,
        {"sponge_top_width": 300.0, "sponge_top_tau": 2.0,
         "sponge_top_vars": ("u",)},  # damp u only — h must pass
        "vars",
    )
    grid, ctx, state = initialize(model)
    step = build_step(model, grid, ctx, jnp.float64)
    out = make_scan(step, 180)(state)
    h_on = np.asarray(grid.synthesis(out.spec)["val"][0]).reshape(
        grid.spatial_shape
    )
    model_off = _rz_updraft_model(tmp_path, {}, "vars_off")
    grid2, ctx2, state2 = initialize(model_off)
    step2 = build_step(model_off, grid2, ctx2, jnp.float64)
    out2 = make_scan(step2, 180)(state2)
    h_off = np.asarray(grid2.synthesis(out2.spec)["val"][0]).reshape(
        grid2.spatial_shape
    )
    z = create_grid(model.grid_params, jnp.float64).z_mish
    top = z > 750.0
    # h is NOT in sponge_top_vars: identical evolution to the
    # sponge-free run (u is constant-zero so damping u does nothing)
    assert np.allclose(h_on[:, top], h_off[:, top], atol=1e-10)
