"""Straka et al. (1993) density-current benchmark on the RZ grid.

A -15 K cold bubble collapses in a neutrally stratified (theta = 300 K)
dry atmosphere with fixed viscosity K = 75 m^2/s; the resulting cold pool
spreads along the ground as a density current with Kelvin-Helmholtz
rotors.  This is the classic nonhydrostatic-core validation case; the
converged reference solution (25 m grid) puts the front (the surface
theta' = -1 K point) at 15,537 m and theta'_min at -9.77 K at t = 900 s
[Straka, Wilhelmson, Wicker, Anderson & Droegemeier, IJNMF 17, 1993].

The case exercises the same Euler_test perturbation dynamics the
reference ships (testModels.jl:100-215) on a published benchmark the
reference itself never ran.  Cartesian-slab semantics: the RZ grid's
radial coordinate is a Cartesian x here (no curvature terms in
Euler_test), so the domain is the full [-25.6, 25.6] km strip.

Timestep note (CLAUDE.md conventions): the semi-implicit solve absorbs
the vertical acoustic limit; the binding explicit limits at the default
resolution (dx_cell = 400 m -> min mish gap 90 m; zDim = 48 over 6.4 km)
are the radial acoustic CFL (~0.18 s) and the vertical spectral
diffusion limit K * k_max^4-ish ~ 0.19 s at K = 75, so ts = 0.125 s.

Usage:
    python examples/straka_density_current.py [--cpu] [--cells 128]
        [--nz 48] [--ts 0.125] [--time 900]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build_model(out_dir, num_cells=128, nz=48, ts=0.125, t_end=900.0):
    """ModelParameters for the Straka case (sounding + grid + physics)."""
    from scythe_tpu import BC, ZBC, GridParameters, ModelParameters

    os.makedirs(out_dir, exist_ok=True)
    sounding = os.path.join(out_dir, "sounding.txt")
    with open(sounding, "w") as f:
        # isentropic dry atmosphere: theta = 300 K, p_sfc = 1000 hPa
        f.write("1000.0 300.0 0.0\n")
        for z in np.linspace(200.0, 8000.0, 40):
            f.write(f"{z} 300.0 0.0\n")

    gp = GridParameters(
        geometry="RZ",
        xmin=-25600.0,
        xmax=25600.0,
        num_cells=num_cells,
        zmin=0.0,
        zmax=6400.0,
        zDim=nz,
        BCL={"u": BC.R1T0, "w": BC.R1T1},
        BCR={"u": BC.R1T0, "w": BC.R1T1},
        # Straka walls are free-slip and insulated: u_z = 0, s_z = 0 (zero
        # diffusive flux), w = 0 at top and bottom.  An unconstrained (R0)
        # s fit lets K * s_zz pump spurious entropy through the boundary
        # (measured: exponential growth, e-folding ~30 s, at the lowest
        # interior level under the downdraft).
        BCB={"s": ZBC.R1T1, "u": ZBC.R1T1, "mu": ZBC.R1T1, "w": ZBC.R1T0},
        BCT={"s": ZBC.R1T1, "u": ZBC.R1T1, "mu": ZBC.R1T1, "w": ZBC.R1T0},
        vars={"s": 1, "xi": 2, "mu": 3, "u": 4, "w": 5},
    )
    return ModelParameters(
        ts=ts,
        integration_time=t_end,
        output_interval=t_end / 3.0,
        equation_set="Euler_test",
        initial_conditions=os.path.join(out_dir, "ics.csv"),
        output_dir=out_dir,
        ref_state_file=sounding,
        grid_params=gp,
        physical_params={"K": 75.0},
        options={"semiimplicit": True},
    )


def write_ics(model, grid, ref_state):
    """Cold bubble as perturbation (s', xi') fields at constant pressure.

    The bubble is a temperature perturbation dT at unchanged pressure
    (Straka's specification), so in the perturbation variables of
    Euler_test (s = entropy', xi = log dry density'):
        T_new   = Tbar + dT,   rho_new = rhobar * Tbar / T_new  (dry)
        xi'     = ln(Tbar / T_new)
        s'      = entropy(T_new, rho_new, 0) - sbar
    """
    from scythe_tpu.physics import thermodynamics as td

    sbar0 = np.asarray(ref_state.sbar[:, 0], np.float64)
    xibar0 = np.asarray(ref_state.xibar[:, 0], np.float64)
    mubar0 = np.asarray(ref_state.mubar[:, 0], np.float64)
    _, rho_bar, T_bar, _ = (
        np.asarray(a, np.float64)
        for a in td.thermodynamic_tuple(sbar0, xibar0, mubar0)
    )

    pts = grid.gridpoints()
    x = pts[:, 0].reshape(grid.spatial_shape)
    z = pts[:, 1].reshape(grid.spatial_shape)
    L = np.sqrt((x / 4000.0) ** 2 + ((z - 3000.0) / 2000.0) ** 2)
    dT = np.where(L <= 1.0, -15.0 * (np.cos(np.pi * L) + 1.0) / 2.0, 0.0)

    T_new = T_bar[None, :] + dT
    rho_new = rho_bar[None, :] * T_bar[None, :] / T_new
    s_new = np.asarray(td.entropy(T_new, rho_new, 0.0), np.float64)
    s_pert = s_new - sbar0[None, :]
    xi_pert = np.log(T_bar[None, :] / T_new)

    with open(model.initial_conditions, "w") as f:
        f.write("r,z,s,xi,mu,u,w\n")
        xf, zf = x.ravel(), z.ravel()
        sf, xif = s_pert.ravel(), xi_pert.ravel()
        for i in range(len(xf)):
            f.write(f"{xf[i]},{zf[i]},{sf[i]},{xif[i]},0.0,0.0,0.0\n")


def theta_pert(phys, grid, ref_state):
    """theta' [x, z] from the perturbation state."""
    from scythe_tpu.physics import thermodynamics as td

    sbar0 = np.asarray(ref_state.sbar[:, 0], np.float64)[None, :]
    xibar0 = np.asarray(ref_state.xibar[:, 0], np.float64)[None, :]
    mubar0 = np.asarray(ref_state.mubar[:, 0], np.float64)[None, :]
    s = np.asarray(phys[0], np.float64).reshape(grid.spatial_shape)
    xi = np.asarray(phys[1], np.float64).reshape(grid.spatial_shape)
    th = np.asarray(td.potential_temperature(s + sbar0, xi + xibar0, mubar0))
    th_bar = np.asarray(td.potential_temperature(sbar0, xibar0, mubar0))
    return th - th_bar


def front_location(thp, grid, zmax_probe=500.0, thresh=-1.0):
    """Max |x| where theta' < thresh in the lowest ``zmax_probe`` meters
    (the Straka front diagnostic)."""
    zsel = np.asarray(grid.z_mish) <= zmax_probe
    x = grid.r_mish
    cold = (thp[:, zsel] < thresh).any(axis=1)
    return float(np.abs(x[cold]).max()) if cold.any() else 0.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--cells", type=int, default=128)
    ap.add_argument("--nz", type=int, default=48)
    ap.add_argument("--ts", type=float, default=0.125)
    ap.add_argument("--time", type=float, default=900.0)
    args = ap.parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
    from scythe_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache()
    from scythe_tpu import create_grid, integrate_model
    from scythe_tpu.model import build_context, default_dtype

    model = build_model(
        "./straka_out", args.cells, args.nz, args.ts, args.time
    )
    dtype = default_dtype()
    grid = create_grid(model.grid_params, dtype)
    ctx = build_context(model, grid, dtype)
    write_ics(model, grid, ctx.ref_state)

    grid, phys = integrate_model(model)
    thp = theta_pert(phys, grid, ctx.ref_state)
    front = front_location(thp, grid)
    print(
        f"t = {args.time:.0f} s: theta'_min = {thp.min():.2f} K "
        f"(converged ref -9.77), front = {front:.0f} m "
        f"(converged ref 15537; coarse-grid band ~14-17 km)"
    )


if __name__ == "__main__":
    main()
