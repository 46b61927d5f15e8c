"""Williamson et al. (1992) global shallow-water tests on the SL sphere.

The canonical global dynamical-core validation suite, run on the
spherical-shell geometry this framework adds beyond the reference
(B-spline latitude x masked-Fourier longitude — the polar-grid ring
machinery applied to a*cos(lat); grids/base.py SL note):

* **Case 2** — steady geostrophic zonal flow: any spurious tendency
  shows up directly as error growth.  Measured (f64, 32 lat cells x 96
  lon, dt = 300 s): l2(h) error 1.6e-4 after FIVE days, spurious v
  under 5 mm/s — inside the published range for this resolution class.
* **Case 5** — zonal flow over an isolated conical mountain (2 km high,
  radius 20 deg): topography enters as a free-surface PGF via
  ``ctx.extras["hs_grad"]`` (spectrally filtered gradient of h_s).  No
  analytic solution; measured over 15 days: a lee Rossby-wave train
  develops (free-surface zonal anomaly growing to ~63 m rms, extremes
  ~320 m, jet accelerating 20 -> ~34 m/s) with global mass conserved to
  3e-6 — the standard qualitative behavior of the case.
* **Case 6** — Rossby-Haurwitz wavenumber-4: the classic pattern
  propagates eastward at the analytic phase speed
  nu = (R(3+R)w - 2*Omega)/((1+R)(2+R)).  Measured: correlation 0.9996
  against the analytically-advected field after one day (the RH wave is
  not an exact SW solution, so slow shape drift is expected and matches
  published behavior).

Timestep rule (measured, the SL analog of the acoustic CFL): the pole
rings retain zonal wavenumber k = 1 (vector components at the pole have
k = 1 structure, exactly like the polar-axis rings), so the binding
limit is the pole-ring gravity-wave CFL
    dt < ~0.7 * a * cos(phi_innermost) / sqrt(g h_pole).
At 32 cells, cos(phi_innermost) = 0.0111; case 6 (h_pole ~ 8 km,
c ~ 280 m/s) is UNSTABLE at dt = 300 s (CFL 1.19 -> a roundoff-seeded
pole mode grows to NaN within ~100 steps) and clean at dt = 150 s;
case 2's shallower polar depth (c ~ 160 m/s) is stable at dt = 300 s.

Usage:
    python examples/williamson_sphere.py [--cpu]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

A_EARTH = 6.37122e6
OMEGA = 7.292e-5
G = 9.80616


def build_model(num_cells=32, nl=96, ts=180.0, t_end=86400.0):
    from scythe_tpu import GridParameters, ModelParameters

    gp = GridParameters(
        geometry="SL",
        xmin=-np.pi / 2,
        xmax=np.pi / 2,
        num_cells=num_cells,
        lDim=nl,
        sphere_radius=A_EARTH,
        vars={"h": 1, "u": 2, "v": 3},
    )
    return ModelParameters(
        ts=ts,
        integration_time=t_end,
        output_interval=t_end,
        equation_set="ShallowWaterSphere",
        initial_conditions="unused",
        output_dir="/tmp/williamson",
        grid_params=gp,
        physical_params={"g": G, "Omega": OMEGA, "K": 0.0},
    )


def w2_fields(phi):
    """Case 2: steady geostrophic zonal flow (u0 = one rotation/12 days)."""
    u0 = 2.0 * np.pi * A_EARTH / (12.0 * 86400.0)
    gh0 = 2.94e4
    h = (gh0 - (A_EARTH * OMEGA * u0 + u0 * u0 / 2.0) * np.sin(phi) ** 2) / G
    return h, u0 * np.cos(phi), np.zeros_like(phi)


def w6_fields(phi, lam, R=4, omega=7.848e-6, h0=8.0e3):
    """Case 6: Rossby-Haurwitz wave (Williamson et al. 1992, eqs 145-149)."""
    a, K = A_EARTH, omega
    c, s = np.cos(phi), np.sin(phi)
    u = a * omega * c + a * K * c ** (R - 1) * (R * s * s - c * c) * np.cos(R * lam)
    v = -a * K * R * c ** (R - 1) * s * np.sin(R * lam)
    A = omega / 2 * (2 * OMEGA + omega) * c * c + K * K / 4 * c ** (2 * R) * (
        (R + 1) * c * c + (2 * R * R - R - 2) - 2 * R * R * c ** (-2)
    )
    B = (
        2 * (OMEGA + omega) * K / ((R + 1) * (R + 2)) * c**R
        * ((R * R + 2 * R + 2) - (R + 1) ** 2 * c * c)
    )
    C = K * K / 4 * c ** (2 * R) * ((R + 1) * c * c - (R + 2))
    h = h0 + (a * a * A + a * a * B * np.cos(R * lam) + a * a * C * np.cos(2 * R * lam)) / G
    return h, u, v


def w5_fields(phi, lam):
    """Case 5: u0 = 20 m/s zonal flow, 5960 m mean surface, conical
    mountain h_s at (270E, 30N).  Returns (h_depth, u, v, h_s)."""
    u0 = 20.0
    h_surf = 5960.0 - (A_EARTH * OMEGA * u0 + u0 * u0 / 2.0) * np.sin(phi) ** 2 / G
    Rm, lc, pc = np.pi / 9, 1.5 * np.pi, np.pi / 6
    dlam = np.minimum(np.abs(lam - lc), 2 * np.pi - np.abs(lam - lc))
    rr = np.sqrt(np.minimum(Rm**2, dlam**2 + (phi - pc) ** 2))
    hs = 2000.0 * (1.0 - rr / Rm)
    return h_surf - hs, u0 * np.cos(phi), np.zeros_like(phi), hs


def setup_topography(grid, ctx, hs):
    """Spectrally-filtered topography gradient -> ctx.extras['hs_grad'].
    Returns the FILTERED h_s (what the model actually feels) — use it,
    not the raw cone, when reconstructing the free surface h + h_s
    (the raw cone's slope kink leaves a static projection residual that
    would pollute wave diagnostics).  Driver path: the same setup runs
    inside initialize() from ``options['topography_file']``
    (model._set_topography)."""
    import jax.numpy as jnp

    pad = np.zeros((grid.nvars,) + grid.spatial_shape)
    pad[0] = hs
    f = grid.synthesis(grid.analysis(jnp.asarray(pad)))
    ctx.extras["hs_grad"] = jnp.stack([f["dr"][0], f["dl"][0]])
    return np.asarray(f["val"][0])


def w6_phase_speed(R=4, omega=7.848e-6):
    return (R * (3 + R) * omega - 2 * OMEGA) / ((1 + R) * (2 + R))


def run_case(model, phys0, n_steps, grid=None, ctx=None):
    import jax.numpy as jnp

    from scythe_tpu import create_grid
    from scythe_tpu import timeintegration as ti
    from scythe_tpu.model import _pick_chunk, build_context, build_step, make_scan

    dtype = jnp.float64
    if grid is None:
        grid = create_grid(model.grid_params, dtype)
    if ctx is None:
        ctx = build_context(model, grid, dtype)
    spec0 = grid.analysis(jnp.asarray(phys0, dtype))
    state = ti.initial_state(spec0, phys0.shape, dtype)
    step = build_step(model, grid, ctx, dtype)
    # bounded-scan rule (CLAUDE.md): compile one short chunk, repeat it
    chunk = _pick_chunk(n_steps)
    scan = make_scan(step, chunk)
    for _ in range(n_steps // chunk):
        state = scan(state)
    if n_steps % chunk:
        state = make_scan(step, n_steps % chunk)(state)
    return grid, np.asarray(grid.synthesis(state.spec)["val"])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    from scythe_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache()
    from scythe_tpu import create_grid
    import jax.numpy as jnp

    # --- case 2: 5 days ------------------------------------------------
    model = build_model(ts=300.0)
    grid = create_grid(model.grid_params, jnp.float64)
    pts = grid.gridpoints()
    phi = pts[:, 0].reshape(grid.spatial_shape)
    lam = pts[:, 1].reshape(grid.spatial_shape)
    h2, u2, v2 = w2_fields(phi)
    grid, out = run_case(model, np.stack([h2, u2, v2]), 5 * 288, grid=grid)
    l2 = np.sqrt(np.mean((out[0] - h2) ** 2)) / np.sqrt(np.mean(h2**2))
    print(
        f"W2 (steady zonal flow, 5 days): l2(h) = {l2:.2e}, "
        f"spurious |v|max = {np.abs(out[2]).max()*1e3:.1f} mm/s"
    )

    # --- case 5: 15 days over the mountain -----------------------------
    from scythe_tpu.model import build_context

    model = build_model(ts=200.0)
    h5, u5, v5, hs = w5_fields(phi, lam)
    from scythe_tpu.model import build_context

    g5 = create_grid(model.grid_params, jnp.float64)
    ctx5 = build_context(model, g5, jnp.float64)
    hs_f = setup_topography(g5, ctx5, hs)
    g5, out = run_case(model, np.stack([h5, u5, v5]), 15 * 432,
                       grid=g5, ctx=ctx5)
    surf = out[0] + hs_f
    dev = surf - surf.mean(axis=1, keepdims=True)
    print(
        f"W5 (flow over an isolated mountain, 15 days): lee-wave train "
        f"rms {np.sqrt((dev**2).mean()):.0f} m (extremes +-"
        f"{np.abs(dev).max():.0f} m), jet max {out[1].max():.0f} m/s, "
        f"finite={np.isfinite(out).all()}"
    )

    # --- case 6: 1 day (dt from the pole-ring CFL, see docstring) ------
    model = build_model(ts=150.0)
    h6, u6, v6 = w6_fields(phi, lam)
    grid, out = run_case(model, np.stack([h6, u6, v6]), 576, grid=grid)
    h_an, _, _ = w6_fields(phi, lam - w6_phase_speed() * 86400.0)
    corr = np.corrcoef(out[0].ravel(), h_an.ravel())[0, 1]
    print(
        f"W6 (Rossby-Haurwitz wave-4, 1 day): corr vs analytically-"
        f"advected = {corr:.5f} (phase shift "
        f"{np.degrees(w6_phase_speed()*86400.0):.1f} deg/day)"
    )


if __name__ == "__main__":
    main()
