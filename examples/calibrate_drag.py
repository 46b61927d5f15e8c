"""Gradient-based parameter calibration through the full dynamical core.

Recovers the slab boundary-layer drag coefficient Cd (Williams 2013
slab TCBL, ref src/tcblModels.jl) from synthetic wind "observations" by
differentiating the entire nonlinear integration — synthesis, tendencies,
AB3 stepping, analysis, every step — with reverse-mode AD and running
Adam in log-space.  This is a capability the Julia reference does not
have and cannot add cheaply: its core mutates state in place per column;
ours is a pure function of state, so `jax.grad` composes through it for
free (scythe_tpu/adjoint.py).

The experiment: spin a balanced 30 m/s vortex over a slab boundary layer
for one simulated hour with the true Cd = 2.4e-3, keep the final (u, v)
winds as observations, then start from a 2.4x-wrong guess and let the
adjoint pull it back.

Usage:
    python examples/calibrate_drag.py [--cpu] [--steps N]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--steps", type=int, default=80, help="Adam iterations")
    args = ap.parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
    from scythe_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache()

    import jax.numpy as jnp

    from scythe_tpu import BC, GridParameters, ModelParameters
    from scythe_tpu.adjoint import fit_parameters, make_simulator

    gp = GridParameters(
        geometry="R",
        xmin=0.0,
        xmax=4.0e5,
        num_cells=100,
        BCL={"vgr": BC.R1T0, "u": BC.R1T0, "v": BC.R1T0, "w": BC.R1T1},
        BCR={"vgr": BC.R0, "u": BC.R1T1, "v": BC.R0, "w": BC.R0},
        vars={"vgr": 1, "u": 2, "v": 3, "w": 4},
    )
    model = ModelParameters(
        ts=5.0,
        integration_time=3600.0,  # one simulated hour, 720 AB3 steps
        output_interval=3600.0,
        equation_set="Williams2013_slabTCBL",
        initial_conditions="unused.csv",
        output_dir="./calibrate_out/",
        grid_params=gp,
        physical_params={"K": 1500.0, "Cd": 2.4e-3, "h": 1000.0, "f": 5.0e-5},
    )
    dtype = jnp.float64 if args.cpu else jnp.float32
    sim, grid, _ = make_simulator(model, dtype)

    r = grid.gridpoints()[:, 0]
    rm, vm = 5.0e4, 30.0
    vgr = np.where(r < rm, vm * r / rm, vm * rm / r)
    phys0 = np.stack([vgr, np.zeros_like(r), vgr, np.zeros_like(r)])

    cd_true = 2.4e-3
    cd_init = 1.0e-3
    print(f"generating observations with true Cd = {cd_true:.4e} ...")
    t0 = time.time()
    obs = sim({"Cd": jnp.asarray(cd_true, dtype)}, phys0)[1:3]
    print(
        f"  720-step forward run: {time.time() - t0:.2f}s; "
        f"peak inflow {float(obs[0].min()):.2f} m/s, "
        f"peak v {float(obs[1].max()):.2f} m/s"
    )

    print(f"calibrating from Cd = {cd_init:.4e} ({args.steps} Adam steps, log-space) ...")
    t0 = time.time()
    fitted, history = fit_parameters(
        sim,
        {"Cd": cd_init},
        phys0,
        obs,
        steps=args.steps,
        learning_rate=0.08,
        obs_slice=np.s_[1:3],
    )
    dt = time.time() - t0
    for i in range(0, len(history), max(1, len(history) // 10)):
        print(f"  iter {i:3d}  normalized misfit = {history[i]:.3e}")
    cd = fitted["Cd"]
    err = abs(cd - cd_true) / cd_true
    print(
        f"recovered Cd = {cd:.4e} (true {cd_true:.4e}, error {100 * err:.2f}%) "
        f"in {dt:.1f}s ({dt / args.steps:.2f}s per value+grad of the "
        f"720-step integration)"
    )
    if err < 0.05:
        print("SUCCESS: drag coefficient recovered to <5%")
    else:
        print("WARNING: calibration did not converge to 5%")


if __name__ == "__main__":
    main()
