"""Ensemble smoother (EnKF-family) data assimilation via vmapped ensembles.

The companion to examples/assimilate_4dvar.py: instead of the adjoint,
use an ensemble of nonlinear forecasts (all members batched through the
same transform GEMMs by `jax.vmap` — the integrate_ensemble execution
model) to estimate the background covariance, and update the initial
conditions with the ensemble Kalman gain computed from initial-time
anomalies against observation-time forecast anomalies (a single-iteration
ensemble smoother, ES/EnKS form).

Twin experiment identical to the 4D-Var one (two-layer TC, background
missing the wavenumber-2 asymmetry at 75% amplitude, sparse noisy v obs
at the analysis time and the window end).  Ensemble perturbations are
drawn from the SAME wavenumber-weighted spectral covariance the 4D-Var
uses as its B^1/2 — the two methods share one background-error model.

Measured (f64 CPU, 64 members): IC v error 2.23 -> 1.19 m/s (-47%),
window-end forecast error 2.21 -> 0.94 m/s (-57%), wave-2 asymmetry
recovered from zero (overshoot ~2.4x — finite-ensemble sampling noise;
the adjoint-based 4D-Var reaches -73%/-79% with a ~1.16x wave-2 on the
same problem, the expected variational-vs-ensemble trade).

Usage:
    python examples/assimilate_enkf.py [--cpu] [--members 64]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

OBS_SIGMA = 0.5
OBS_VAR = 2
SUB = (slice(None, None, 3), slice(None, None, 2))
N_STEPS = 60


def build_case(num_cells=32, nl=32, dtype=None):
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_model, _vortex_phys
    from scythe_tpu.adjoint import make_simulator
    from scythe_tpu.grids.base import create_grid

    model = _flagship_model(num_cells=num_cells, nl=nl)
    dtype = dtype or jnp.float64
    sim, grid, _ = make_simulator(model, dtype, n_steps=N_STEPS)
    truth0 = jnp.asarray(
        _vortex_phys(create_grid(model.grid_params, dtype)), dtype
    )
    bg = np.asarray(truth0)
    bg = 0.75 * bg.mean(axis=2, keepdims=True) * np.ones_like(bg)
    return model, grid, sim, truth0, jnp.asarray(bg)


def obs_operator(x0, xf):
    """Stack subsampled v at the analysis time and the window end."""
    return np.concatenate(
        [
            np.asarray(x0[OBS_VAR])[SUB].ravel(),
            np.asarray(xf[OBS_VAR])[SUB].ravel(),
        ]
    )


def sample_ensemble(grid, bg, n_members, target_spread=2.0, seed0=100):
    """Background ensemble from the 4D-Var-consistent spectral covariance
    (std ~ w_k^{-1/2}, the same wavenumber weighting)."""
    import jax.numpy as jnp

    from scythe_tpu.basis import fourier

    k = fourier.coeff_wavenumbers(grid.nl)
    std_k = 1.0 / np.sqrt((1.0 + (k / 2.0) ** 2) ** 1.5)
    perts = []
    for i in range(n_members):
        r = np.random.default_rng(seed0 + i)
        d = r.normal(size=grid.spectral_shape) * std_k[None, None, :]
        perts.append(
            np.asarray(grid.synthesis(jnp.asarray(d, bg.dtype))["val"])
        )
    perts = np.stack(perts)
    sc = target_spread / np.sqrt((perts[:, OBS_VAR] ** 2).mean())
    return jnp.asarray(np.asarray(bg)[None] + sc * perts)


def smoother_update(X0, HX, y, sigma=OBS_SIGMA):
    """Single-iteration ensemble smoother: update the initial-condition
    ensemble MEAN with the gain built from (IC anomalies) x (obs-space
    forecast anomalies)."""
    n = X0.shape[0]
    X0n = np.asarray(X0).reshape(n, -1)
    x0m = X0n.mean(0)
    A0 = X0n - x0m
    hxm = HX.mean(0)
    Ah = HX - hxm
    S = Ah.T @ Ah / (n - 1) + sigma**2 * np.eye(Ah.shape[1])
    incr = (A0.T @ (Ah @ np.linalg.solve(S, np.asarray(y) - hxm))) / (n - 1)
    return (x0m + incr).reshape(X0.shape[1:])


def assimilate(grid, sim, bg, truth0, n_members=64, seed=0):
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    y0 = obs_operator(truth0, sim({}, truth0))
    y = y0 + rng.normal(0.0, OBS_SIGMA, y0.shape)
    X0 = sample_ensemble(grid, bg, n_members)
    fwd = jax.jit(jax.vmap(lambda x: sim({}, x)))
    Xf = fwd(X0)
    HX = np.stack(
        [obs_operator(X0[i], Xf[i]) for i in range(n_members)]
    )
    return jnp.asarray(smoother_update(X0, HX, y))


def rms(a, b):
    return float(np.sqrt(np.mean((np.asarray(a) - np.asarray(b)) ** 2)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--members", type=int, default=64)
    args = ap.parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    from scythe_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache()
    model, grid, sim, truth0, bg = build_case()
    xa = assimilate(grid, sim, bg, truth0, n_members=args.members)
    fc_t = sim({}, truth0)
    print(
        f"{args.members}-member ensemble smoother:\n"
        f"IC v rms error:       {rms(bg[OBS_VAR], truth0[OBS_VAR]):.3f} -> "
        f"{rms(xa[OBS_VAR], truth0[OBS_VAR]):.3f} m/s\n"
        f"forecast v rms error: "
        f"{rms(sim({}, bg)[OBS_VAR], fc_t[OBS_VAR]):.3f} -> "
        f"{rms(sim({}, xa)[OBS_VAR], fc_t[OBS_VAR]):.3f} m/s"
    )


if __name__ == "__main__":
    main()
