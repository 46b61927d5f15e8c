"""Cha & Bell (2024) two-layer TC initialization workflow
(ref notebooks/Cha_Bell_WCD2024_initialization.ipynb).

Stages:
  1. build Rankine-vortex initial conditions in gradient-wind balance,
  2. run the 3 h symmetric spinup (Oneway_ShallowWater_Slab),
  3. read the spun-up output, add the elliptical wavenumber-2 perturbation,
  4. write the wave-2 ICs for the 24 h one-way/two-way runs
     (models/cha_bell2024/{oneway,twoway}.py).

Run:  python examples/cha_bell_initialization.py [--quick]
(--quick shrinks the spinup to 10 min of model time for a fast demo.)
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "models", "cha_bell2024"))

RMAX = 50000.0
VMAX = 50.0
F_COR = 5.0e-5
EPSILON = 5000.0
G = 9.81


def rankine_profile(r):
    v0 = VMAX / RMAX
    return np.where(r < RMAX, v0 * r, RMAX * RMAX * v0 / r)


def balanced_height(r_points, v_points):
    """Cumulative gradient-wind balance integration along unique radii
    (ref notebook cell 5's running integral)."""
    dhdr = (F_COR * v_points + v_points**2 / r_points) / G
    r_unique, idx = np.unique(r_points, return_inverse=True)
    dh_u = np.zeros_like(r_unique)
    for i, ru in enumerate(r_unique):
        dh_u[i] = dhdr[idx == i].mean()
    h_u = np.concatenate([[0.0], np.cumsum(0.5 * (dh_u[1:] + dh_u[:-1]) * np.diff(r_unique))])
    h_u += dh_u[0] * r_unique[0]
    return h_u[idx]


def write_rankine_ics(grid, path):
    pts = grid.gridpoints()
    r, lam = pts[:, 0], pts[:, 1]
    v = rankine_profile(r)
    h = balanced_height(r, v)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write("r,l,h,u,v,ub,vb,wb\n")
        for i in range(len(r)):
            f.write(f"{r[i]},{lam[i]},{h[i]},0.0,{v[i]},0.0,{v[i]},0.0\n")


def add_wave2(grid, balanced_csv, out_path):
    """Wavenumber-2 elliptical vorticity perturbation on the spun-up state
    (ref notebook cell 10)."""
    import scythe_tpu.io as sio

    names, data = sio._read_csv(balanced_csv)
    col = {n: data[:, i] for i, n in enumerate(names)}
    r, lam = col["r"], col["l"]
    zeta = 2.0 * VMAX / RMAX
    inner = r < RMAX
    vprime = np.where(
        inner,
        0.5 * zeta * r * (EPSILON * np.cos(2 * lam) / RMAX),
        0.5 * zeta * (RMAX**2 / r) * (-EPSILON * np.cos(2 * lam) * RMAX / r**2),
    )
    uprime = np.where(
        inner,
        0.5 * zeta * r * (EPSILON * np.sin(2 * lam) / RMAX),
        0.5 * zeta * (RMAX**2 / r) * (EPSILON * np.sin(2 * lam) * RMAX / r**2),
    )
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        f.write("r,l,h,u,v,ub,vb,wb\n")
        for i in range(len(r)):
            f.write(
                f"{r[i]},{lam[i]},{col['h'][i]},{col['u'][i] + uprime[i]},"
                f"{col['v'][i] + vprime[i]},{col['ub'][i] + uprime[i]},"
                f"{col['vb'][i] + vprime[i]},{col['wb'][i]}\n"
            )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="10-min spinup demo")
    args = ap.parse_args()

    from oneway_spinup import model
    from scythe_tpu import create_grid, integrate_model

    if args.quick:
        model = model.with_(integration_time=600.0, output_interval=600.0)

    grid = create_grid(model.grid_params)
    print("Writing Rankine ICs ...")
    write_rankine_ics(grid, model.initial_conditions)
    print("Running symmetric spinup ...")
    integrate_model(model)

    t_final = str(round(model.integration_time, 2))
    balanced = os.path.join(model.output_dir, f"physical_out_{t_final}.csv")
    print("Adding wavenumber-2 perturbation ...")
    for outdir in ("./Oneway_SWslab_wave2", "./Twoway_SWslab_wave2"):
        add_wave2(grid, balanced, os.path.join(outdir, "SWslab_wave2.csv"))
    print(
        "Done. Run the 24 h experiments with:\n"
        "  python run_scythe.py models/cha_bell2024/oneway.py\n"
        "  python run_scythe.py models/cha_bell2024/twoway.py"
    )


if __name__ == "__main__":
    main()
