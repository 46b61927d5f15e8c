"""JAX-native capabilities beyond the reference: autodiff through the core
and vmapped ensembles.

The whole model step is a pure jittable function, so gradients of any
objective with respect to initial conditions / parameters, and batched
ensembles, come for free — capabilities the reference architecture
(mutating Julia worker processes) cannot express.
"""

import numpy as np
import jax
import jax.numpy as jnp

from scythe_tpu import BC, GridParameters, ModelParameters, create_grid
from scythe_tpu import timeintegration as ti
from scythe_tpu.model import build_context, build_step


def _advection(tmp_path=None, K=0.05):
    gp = GridParameters(
        geometry="R",
        xmin=-50.0,
        xmax=50.0,
        num_cells=40,
        BCL={"u": BC.PERIODIC},
        BCR={"u": BC.PERIODIC},
        vars={"u": 1},
    )
    model = ModelParameters(
        ts=0.1,
        integration_time=1.0,
        output_interval=1.0,
        equation_set="LinearAdvection1D",
        grid_params=gp,
        physical_params={"c_0": 1.0, "K": K},
    )
    grid = create_grid(gp, jnp.float64)
    ctx = build_context(model, grid, jnp.float64)
    step = build_step(model, grid, ctx, jnp.float64)
    return model, grid, step


def _rollout(step, grid, u0, n):
    spec = grid.analysis(u0[None, :])
    state = ti.initial_state(spec, (1,) + grid.spatial_shape, jnp.float64)

    def body(s, _):
        return step(s), None

    out, _ = jax.lax.scan(body, state, None, length=n)
    return grid.synthesis(out.spec)["val"][0]


def test_gradient_through_time_loop():
    model, grid, step = _advection()
    r = jnp.asarray(grid.r_mish)
    target = jnp.exp(-(((r - 5.0) / 15.0) ** 2))

    def loss(u0):
        uT = _rollout(step, grid, u0, 20)
        return jnp.mean((uT - target) ** 2)

    u0 = jnp.exp(-((r / 15.0) ** 2))
    g = jax.grad(loss)(u0)
    assert np.isfinite(np.asarray(g)).all()
    # the gradient must match finite differences
    v = jnp.asarray(np.random.default_rng(0).normal(size=u0.shape))
    v = v / jnp.linalg.norm(v)
    eps = 1e-6
    fd = (loss(u0 + eps * v) - loss(u0 - eps * v)) / (2 * eps)
    ad = jnp.vdot(g, v)
    assert np.isclose(float(fd), float(ad), rtol=1e-6), (float(fd), float(ad))
    # and a gradient step must reduce the loss
    l0 = float(loss(u0))
    l1 = float(loss(u0 - 1.0 * g / jnp.linalg.norm(g) * 0.1))
    assert l1 < l0


def test_vmapped_ensemble():
    model, grid, step = _advection()
    r = np.asarray(grid.r_mish)
    shifts = np.array([-10.0, 0.0, 5.0, 12.0])
    u0s = jnp.asarray(np.exp(-(((r[None, :] - shifts[:, None]) / 15.0) ** 2)))

    run = jax.jit(jax.vmap(lambda u0: _rollout(step, grid, u0, 10)))
    out = run(u0s)
    assert out.shape == (4,) + grid.spatial_shape
    # each member equals its individual run
    single = _rollout(step, grid, u0s[2], 10)
    np.testing.assert_allclose(np.asarray(out[2]), np.asarray(single), atol=1e-13)


def test_integrate_ensemble_api(tmp_path):
    from scythe_tpu.model import integrate_ensemble

    model, grid, _ = _advection()
    model = model.with_(integration_time=1.0)
    r = np.asarray(grid.r_mish)
    shifts = np.array([-5.0, 0.0, 5.0])
    ics = np.exp(-(((r[None, None, :] - shifts[:, None, None]) / 15.0) ** 2))
    grid2, out = integrate_ensemble(model, ics, dtype=jnp.float64)
    assert out.shape == (3, 1) + grid2.spatial_shape
    assert np.isfinite(out).all()
    # members shift-invariance: member 0 equals member 2 shifted back
    # (periodic domain, same dynamics) -- weak check: same max amplitude
    assert np.allclose(out.max(axis=-1)[:, 0], out.max(axis=-1)[0, 0], atol=1e-8)


def test_integrate_ensemble_sharded_matches_single(tmp_path):
    """Members as a mesh axis (make_ensemble_mesh): XLA partitions the
    vmapped program with zero inter-chip communication; the 8-device
    sharded ensemble must reproduce the unsharded one member-for-member."""
    from scythe_tpu.model import integrate_ensemble
    from scythe_tpu.parallel.sharding import make_ensemble_mesh

    model, grid, _ = _advection()
    model = model.with_(integration_time=1.0)
    r = np.asarray(grid.r_mish)
    shifts = np.linspace(-7.0, 7.0, 8)
    ics = np.exp(-(((r[None, None, :] - shifts[:, None, None]) / 15.0) ** 2))
    _, ref = integrate_ensemble(model, ics, dtype=jnp.float64)
    mesh = make_ensemble_mesh(8)
    _, out = integrate_ensemble(model, ics, dtype=jnp.float64, mesh=mesh)
    np.testing.assert_allclose(out, ref, atol=1e-13)

    import pytest

    with pytest.raises(ValueError, match="divisible"):
        integrate_ensemble(model, ics[:3], dtype=jnp.float64, mesh=mesh)
