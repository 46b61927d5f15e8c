"""Differentiable-core tests: jax.grad through the full integration.

No reference counterpart (the Julia core has no adjoint path); this is
the JAX-native capability validated here: (1) the reverse-mode gradient
of a trajectory misfit w.r.t. a physical parameter matches central
finite differences, (2) gradient-based calibration recovers the slab-TCBL
drag coefficient from synthetic observations.
"""

import numpy as np
import jax
import jax.numpy as jnp

from scythe_tpu import BC, GridParameters, ModelParameters
from scythe_tpu.adjoint import fit_parameters, make_simulator


def _advection_model(tmp_path, n_cells=30):
    gp = GridParameters(
        geometry="R",
        xmin=-50.0,
        xmax=50.0,
        num_cells=n_cells,
        BCL={"u": BC.PERIODIC},
        BCR={"u": BC.PERIODIC},
        vars={"u": 1},
    )
    model = ModelParameters(
        ts=0.05,
        integration_time=5.0,
        output_interval=5.0,
        equation_set="LinearAdvection1D",
        initial_conditions=str(tmp_path / "unused.csv"),
        output_dir=str(tmp_path / "out"),
        grid_params=gp,
        physical_params={"c_0": 1.0, "K": 0.05},
    )
    return model


def test_grad_matches_finite_difference(tmp_path):
    """d(loss)/d(c_0) by reverse-mode AD through 100 AB3 steps == central
    finite differences to ~sqrt(eps_f64)."""
    model = _advection_model(tmp_path)
    sim, grid, _ = make_simulator(model, jnp.float64)
    r = grid.gridpoints()[:, 0]
    phys0 = np.exp(-((r / 15.0) ** 2))[None, :]
    target = sim({"c_0": jnp.asarray(1.3)}, phys0)

    def loss(c0):
        out = sim({"c_0": c0}, phys0)
        return jnp.mean((out - target) ** 2)

    g_ad = float(jax.grad(loss)(jnp.asarray(1.0)))
    eps = 1e-5
    g_fd = float((loss(jnp.asarray(1.0 + eps)) - loss(jnp.asarray(1.0 - eps))) / (2 * eps))
    assert abs(g_ad - g_fd) <= 1e-6 + 1e-5 * abs(g_fd), (g_ad, g_fd)
    # the misfit gradient at c_0 != c_true must push toward c_true
    assert g_ad < 0.0


def test_chunked_scan_gradient(tmp_path):
    """n_steps past the _pick_chunk cap (384) runs as a scan of bounded
    chunks (CLAUDE.md scan-length rule); the gradient must still match
    finite differences through the chunk nesting."""
    model = _advection_model(tmp_path, n_cells=20)
    sim, grid, _ = make_simulator(model, jnp.float64, n_steps=500)
    r = grid.gridpoints()[:, 0]
    phys0 = np.exp(-((r / 15.0) ** 2))[None, :]
    target = sim({"c_0": jnp.asarray(1.2)}, phys0)

    def loss(c0):
        return jnp.mean((sim({"c_0": c0}, phys0) - target) ** 2)

    g_ad = float(jax.grad(loss)(jnp.asarray(1.0)))
    eps = 1e-5
    g_fd = float((loss(jnp.asarray(1.0 + eps)) - loss(jnp.asarray(1.0 - eps))) / (2 * eps))
    assert abs(g_ad - g_fd) <= 1e-6 + 1e-5 * abs(g_fd), (g_ad, g_fd)


def test_radiation_speed_baked_static(tmp_path):
    """A model with options['radiation_width'] and inferred sqrt(g*H)
    radiation speed must trace under grad with g traced — the speed is
    resolved from the STATIC base params at simulator build time."""
    gp = GridParameters(
        geometry="R",
        xmin=0.0,
        xmax=1.0e5,
        num_cells=24,
        BCL={"h": BC.R1T1, "u": BC.R1T0},
        BCR={"h": BC.R0, "u": BC.R0},
        vars={"h": 1, "u": 2},
    )
    model = ModelParameters(
        ts=2.0,
        integration_time=40.0,
        output_interval=40.0,
        equation_set="LinearShallowWater1D",
        initial_conditions=str(tmp_path / "unused.csv"),
        output_dir=str(tmp_path / "out"),
        grid_params=gp,
        physical_params={"g": 9.81, "H": 1000.0, "K": 0.0},
        options={"radiation_width": 2.0e4},
    )
    sim, grid, _ = make_simulator(model, jnp.float64)
    r = grid.gridpoints()[:, 0]
    phys0 = np.stack([np.exp(-(((r - 3e4) / 8e3) ** 2)), np.zeros_like(r)])

    def loss(g_):
        return jnp.sum(sim({"g": g_}, phys0) ** 2)

    g = jax.grad(loss)(jnp.asarray(9.81))
    assert np.isfinite(float(g))


def test_grad_wrt_initial_conditions(tmp_path):
    """Initial-condition sensitivity (the 4D-Var direction): gradient
    w.r.t. phys0 is finite, correctly shaped, and matches FD along a
    random direction."""
    model = _advection_model(tmp_path, n_cells=20)
    sim, grid, _ = make_simulator(model, jnp.float64, n_steps=40)
    r = grid.gridpoints()[:, 0]
    phys0 = jnp.asarray(np.exp(-((r / 15.0) ** 2))[None, :])
    target = sim({}, 0.9 * phys0)

    def loss(p0):
        out = sim({}, p0)
        return jnp.mean((out - target) ** 2)

    g = jax.grad(loss)(phys0)
    assert g.shape == phys0.shape
    assert np.isfinite(np.asarray(g)).all()
    rng = np.random.default_rng(0)
    d = jnp.asarray(rng.standard_normal(phys0.shape))
    eps = 1e-6
    fd = float((loss(phys0 + eps * d) - loss(phys0 - eps * d)) / (2 * eps))
    ad = float(jnp.vdot(g, d))
    assert abs(ad - fd) <= 1e-9 + 1e-5 * abs(fd), (ad, fd)


def test_recover_drag_coefficient(tmp_path):
    """Calibration demo at test scale: recover Cd in the Williams (2013)
    slab TCBL from synthetic wind observations, via Adam in log-space
    through 60 full nonlinear steps (examples/calibrate_drag.py is the
    production-scale version)."""
    gp = GridParameters(
        geometry="R",
        xmin=0.0,
        xmax=2.0e5,
        num_cells=20,
        BCL={"vgr": BC.R1T0, "u": BC.R1T0, "v": BC.R1T0, "w": BC.R1T1},
        BCR={"vgr": BC.R0, "u": BC.R1T1, "v": BC.R0, "w": BC.R0},
        vars={"vgr": 1, "u": 2, "v": 3, "w": 4},
    )
    model = ModelParameters(
        ts=5.0,
        integration_time=300.0,
        output_interval=300.0,
        equation_set="Williams2013_slabTCBL",
        initial_conditions=str(tmp_path / "unused.csv"),
        output_dir=str(tmp_path / "out"),
        grid_params=gp,
        physical_params={"K": 1500.0, "Cd": 2.4e-3, "h": 1000.0, "f": 5.0e-5},
    )
    sim, grid, _ = make_simulator(model, jnp.float64)
    r = grid.gridpoints()[:, 0]
    rm, vm = 5.0e4, 30.0
    vgr = np.where(r < rm, vm * r / rm, vm * rm / r)
    phys0 = np.stack([vgr, np.zeros_like(r), vgr, np.zeros_like(r)])

    cd_true = 2.4e-3
    obs = sim({"Cd": jnp.asarray(cd_true)}, phys0)[1:3]  # observe (u, v)

    fitted, history = fit_parameters(
        sim,
        {"Cd": 1.0e-3},
        phys0,
        obs,
        steps=60,
        learning_rate=0.08,
        obs_slice=np.s_[1:3],
    )
    assert history[-1] < 1e-6 * (1 + history[0]), history[-1]
    assert abs(fitted["Cd"] - cd_true) / cd_true < 0.05, fitted
