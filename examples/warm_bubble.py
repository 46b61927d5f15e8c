"""Moist warm-bubble demo (BF02-style) on the RZ grid with the
semi-implicit acoustic solve.

Builds a sounding and a 2 K-scale entropy bubble, runs 5 minutes of model
time, and reports the bubble's rise.  Usage:

    python examples/warm_bubble.py [--cpu]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from scythe_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache()

    from scythe_tpu import BC, GridParameters, ModelParameters, create_grid, integrate_model

    out = "./warm_bubble_out"
    os.makedirs(out, exist_ok=True)
    zs = np.linspace(0.0, 12000.0, 50)
    theta = 300.0 + 0.004 * zs
    qv = 14.0 * np.exp(-zs / 2500.0)
    sounding = os.path.join(out, "sounding.txt")
    with open(sounding, "w") as f:
        f.write(f"1015.0 {theta[0]} {qv[0]}\n")
        for z, th, q in zip(zs[1:], theta[1:], qv[1:]):
            f.write(f"{z} {th} {q}\n")

    gp = GridParameters(
        geometry="RZ",
        xmin=0.0,
        xmax=10000.0,
        num_cells=25,
        zmin=0.0,
        zmax=10000.0,
        zDim=40,
        BCL={"u": BC.R1T0, "w": BC.R1T1},
        BCR={"u": BC.R1T0},
        vars={"s": 1, "xi": 2, "mu": 3, "u": 4, "w": 5, "mu_l": 6, "qss": 7},
    )
    model = ModelParameters(
        ts=0.1,
        integration_time=300.0,
        output_interval=60.0,
        equation_set="BF02_test",
        initial_conditions=os.path.join(out, "ics.csv"),
        output_dir=out,
        ref_state_file=sounding,
        grid_params=gp,
        physical_params={"K": 5.0},
        options={"semiimplicit": True},
    )

    grid = create_grid(gp)
    pts = grid.gridpoints()
    r, z = pts[:, 0], pts[:, 1]
    rad = np.sqrt((r / 2000.0) ** 2 + ((z - 2000.0) / 2000.0) ** 2)
    s_pert = 3.0 * np.maximum(0.0, np.cos(np.pi * np.minimum(rad, 1.0) / 2.0)) ** 2
    names = list(gp.vars)
    with open(model.initial_conditions, "w") as f:
        f.write("r,z," + ",".join(names) + "\n")
        for i in range(len(r)):
            vals = {"s": s_pert[i]}
            f.write(f"{r[i]},{z[i]}," + ",".join(str(vals.get(n, 0.0)) for n in names) + "\n")

    grid, phys = integrate_model(model)
    w = phys[gp.var_index("w")]
    s = phys[gp.var_index("s")]
    zc = (s.reshape(grid.spatial_shape) * grid.z_mish[None, :]).sum() / s.sum()
    print(f"after 300 s: w_max = {w.max():.2f} m/s, bubble centroid z = {zc:.0f} m (started 2000 m)")


if __name__ == "__main__":
    main()
