"""Straka et al. (1993) density-current benchmark (published validation).

Runs the examples/straka_density_current.py configuration at coarse (800 m)
resolution for the full 900 s and checks the two published diagnostics:
the surface cold-pool front location and the minimum potential-temperature
perturbation.  Converged reference solution (25 m grid): front = 15,537 m,
theta'_min = -9.77 K; coarse-grid solutions across the paper's schemes
land at front ~14-17 km and theta'_min ~ -6 to -10 K.  Measured here
(f64 CPU): 800 m -> front 14,310 m, theta'_min -6.35 K; the example's
default 400 m -> front 14,755 m, theta'_min -9.10 K.

Also asserts the discrete x-symmetry of the configuration: a symmetric
cold bubble on the symmetric domain must produce a symmetric theta' and
antisymmetric u (checked at t = 300 s, before chaotic K-H rotor growth
can amplify roundoff asymmetry).
"""

import importlib.util
import os

import numpy as np
import jax.numpy as jnp
import pytest

_HERE = os.path.dirname(__file__)
_spec = importlib.util.spec_from_file_location(
    "straka_example",
    os.path.join(_HERE, "..", "examples", "straka_density_current.py"),
)
straka = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(straka)


@pytest.fixture(scope="module")
def straka_run(tmp_path_factory):
    from scythe_tpu import create_grid
    from scythe_tpu.model import build_context, build_step, initialize, make_scan

    out = str(tmp_path_factory.mktemp("straka"))
    model = straka.build_model(out, num_cells=64, nz=32, ts=0.25, t_end=900.0)
    dtype = jnp.float64
    grid = create_grid(model.grid_params, dtype)
    ctx = build_context(model, grid, dtype)
    straka.write_ics(model, grid, ctx.ref_state)
    grid, ctx, state = initialize(model, dtype)
    step = build_step(model, grid, ctx, dtype)
    snaps = {}
    scan300 = make_scan(step, 1200)  # 300 s
    for t in (300, 600, 900):
        state = scan300(state)
        snaps[t] = np.asarray(grid.synthesis(state.spec)["val"])
    return grid, ctx, snaps


def test_straka_published_diagnostics(straka_run):
    grid, ctx, snaps = straka_run
    phys = snaps[900]
    assert np.isfinite(phys).all()
    thp = straka.theta_pert(phys, grid, ctx.ref_state)
    front = straka.front_location(thp, grid)
    # converged ref: 15,537 m; coarse-grid band ~14-17 km (measured 14,310)
    assert 13000.0 < front < 17500.0, front
    # converged ref: -9.77 K; coarse band ~ -6 to -10 (measured -6.35)
    assert -12.0 < thp.min() < -5.0, thp.min()
    # cold pool is ground-hugging: the minimum sits in the lowest 1.5 km
    _, jmin = np.unravel_index(np.argmin(thp), thp.shape)
    assert grid.z_mish[jmin] < 1500.0, grid.z_mish[jmin]


def test_straka_front_advances(straka_run):
    grid, ctx, snaps = straka_run
    fronts = [
        straka.front_location(
            straka.theta_pert(snaps[t], grid, ctx.ref_state), grid
        )
        for t in (300, 600, 900)
    ]
    assert fronts[0] < fronts[1] < fronts[2], fronts
    # quasi-steady front speed after spin-up: ~10-25 m/s
    speed = (fronts[2] - fronts[1]) / 300.0
    assert 8.0 < speed < 30.0, speed


def test_straka_symmetry(straka_run):
    """x-mirror symmetry of the discretization: theta' even, u odd."""
    grid, ctx, snaps = straka_run
    phys = snaps[300]
    thp = straka.theta_pert(phys, grid, ctx.ref_state)
    u = np.asarray(phys[3]).reshape(grid.spatial_shape)
    # mish points are symmetric about x=0 (xmin = -xmax, same BCs)
    assert np.allclose(grid.r_mish, -grid.r_mish[::-1], atol=1e-9)
    scale = np.abs(thp).max()
    assert np.abs(thp - thp[::-1]).max() < 1e-6 * scale
    assert np.abs(u + u[::-1]).max() < 1e-6 * np.abs(u).max()
