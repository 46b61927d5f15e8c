"""Sommerfeld radiating outer boundary (options['radiation_width']).

A right-going shallow-water gravity-wave pulse hits the closed outer wall
(u = 0, the flagship's BCR) and reflects; with the radiation strip the
tendency in the strip blends to the one-way outgoing wave equation
d(phi')/dt = -c d(phi')/dr, which carries the pulse out instead.  The test
measures the reflected amplitude in the interior after the pulse has left
— a physics assertion the sponge (pure damping) cannot meet at the same
strip width.  Beyond-reference capability (the reference has neither
sponge nor radiation; docs/ROADMAP.md item 5).
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from scythe_tpu import BC, GridParameters, ModelParameters, create_grid
from scythe_tpu.model import build_step, initialize, make_scan
from scythe_tpu.parallel import sharding as sh

L = 100e3
H, G = 1000.0, 9.81
C = float(np.sqrt(G * H))  # ~99 m/s


def _setup(tmp_path, options):
    gp = GridParameters(
        geometry="R",
        xmin=0.0,
        xmax=L,
        num_cells=48,
        BCL={"h": BC.R1T0, "u": BC.R1T1},
        BCR={"h": BC.R1T0, "u": BC.R1T1},  # closed wall: u = 0
        vars={"h": 1, "u": 2},
    )
    # acoustic CFL: min mish spacing ~ L/num_cells/4; ts well under dx/c
    model = ModelParameters(
        ts=1.0,
        integration_time=600.0,
        output_interval=600.0,
        equation_set="LinearShallowWater1D",
        initial_conditions=str(tmp_path / "ics.csv"),
        output_dir=str(tmp_path / "out"),
        grid_params=gp,
        physical_params={"g": G, "H": H, "K": 0.0},
        options=options,
    )
    grid = create_grid(gp)
    r = grid.r_mish
    # h-only pulse at 0.6 L: splits into two +-c pulses of amplitude A/2;
    # the right-going one reaches the wall at t ~ 0.4 L / c ~ 404 s
    h0 = np.exp(-(((r - 0.6 * L) / 6e3) ** 2))
    with open(model.initial_conditions, "w") as f:
        f.write("r,h,u\n")
        for a, b in zip(r, h0):
            f.write(f"{a},{b},0.0\n")
    return model


def _run(tmp_path, options, n_steps=600):
    tmp_path.mkdir(exist_ok=True)
    model = _setup(tmp_path, options)
    grid, ctx, state = initialize(model, jnp.float64)
    step = build_step(model, grid, ctx, jnp.float64)
    out = make_scan(step, n_steps)(state)
    h = np.asarray(grid.synthesis(out.spec)["val"])[0]
    assert np.isfinite(h).all()
    return np.asarray(grid.r_mish), h


def test_radiating_boundary_removes_reflection(tmp_path):
    rad = {"radiation_width": 20e3}  # speed inferred: sqrt(g H)
    r, h_closed = _run(tmp_path / "closed", {}, n_steps=700)
    _, h_rad = _run(tmp_path / "rad", rad, n_steps=700)

    # at t = 700 s: the right pulse (hit the wall at ~404 s) has reflected
    # back to ~ r = L - c*(700-404) ~ 71 km; the left pulse reflected off
    # the inner wall at ~606 s and sits near 9 km.  Interrogate 35-78 km
    # (outside the strip, away from the left pulse).
    sel = (r > 35e3) & (r < L - 22e3)
    refl_closed = np.abs(h_closed[sel]).max()
    refl_rad = np.abs(h_rad[sel]).max()
    # closed wall reflects the full half-pulse (~0.5)
    assert refl_closed > 0.3
    # the radiating strip removes the bulk of it
    assert refl_rad < 0.2 * refl_closed


def test_radiation_speed_override_and_missing_params(tmp_path):
    model = _setup(tmp_path, {"radiation_width": 15e3, "radiation_speed": C})
    grid, ctx, state = initialize(model, jnp.float64)
    build_step(model, grid, ctx, jnp.float64)  # builds fine

    # without g/H and without an explicit speed: a clear error
    model2 = dataclasses.replace(
        _setup(tmp_path, {"radiation_width": 15e3}),
        physical_params={"K": 0.0},
    )
    grid2, ctx2, state2 = initialize(model2, jnp.float64)
    with pytest.raises(ValueError, match="radiation_speed"):
        build_step(model2, grid2, ctx2, jnp.float64)


@pytest.mark.parametrize("method", ["psum", "halo"])
def test_radiation_sharding_invariant(tmp_path, method):
    """The radiation blend uses shard-local coords and a radially sliced
    reference-derivative extra; 8-shard trajectories must match 1-device."""
    options = {"radiation_width": 15e3}
    model = _setup(tmp_path, options)
    n_steps = 40

    grid, ctx, state = initialize(model, jnp.float64)
    step = build_step(model, grid, ctx, jnp.float64)
    ref = make_scan(step, n_steps)(state)

    mesh = sh.make_mesh(8)
    grid2, ctx2, state2 = sh.initialize_sharded(model, mesh, jnp.float64, method=method)
    sstep = sh.build_sharded_step(model, grid2, ctx2, jnp.float64, mesh, method)
    out = make_scan(sstep, n_steps)(state2)

    spec = np.asarray(out.spec)
    if method == "halo":
        spec = np.asarray(
            sh.blocks_to_spec(out.spec, 8, grid2.params.num_cells // 8)
        )
    assert np.abs(spec - np.asarray(ref.spec)).max() < 1e-12
