"""Localize the TC-intensification blow-up: per-variable max|field| and
its (r, z) location at fine cadence (examples/tc_intensification_rlz.py
config).  Diagnostic scratch tool, not part of the suite.

Usage: python tools/probe_tc_blowup.py [--cpu] [--hours 8] [--stable]
       [--minutes 15] [--no-fluxes]
"""

import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "examples"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--hours", type=float, default=8.0)
    ap.add_argument("--minutes", type=float, default=15.0)
    ap.add_argument("--stable", action="store_true")
    ap.add_argument("--no-fluxes", action="store_true")
    ap.add_argument("--opt", action="append", default=[],
                    help="extra options as key=value (value eval'd)")
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

    from tc_intensification_rlz import build_model, write_ics

    from scythe_tpu import create_grid
    from scythe_tpu import timeintegration as ti
    from scythe_tpu.io import read_physical_grid
    from scythe_tpu.model import (_pick_chunk, build_context, build_step,
                                  default_dtype, make_scan)

    out = "./tc_probe_out"
    model = build_model(out, t_end=args.hours * 3600.0,
                        fluxes=not args.no_fluxes, stable=args.stable)
    if args.opt:
        import ast
        import dataclasses
        extra = {k: ast.literal_eval(v)
                 for k, v in (o.split("=", 1) for o in args.opt)}
        model = dataclasses.replace(model,
                                    options={**model.opts(), **extra})
    dtype = default_dtype()
    grid = create_grid(model.grid_params, dtype)
    ctx = build_context(model, grid, dtype)
    write_ics(model, grid, ctx.ref_state)
    phys0 = read_physical_grid(model.initial_conditions, grid)
    spec0 = grid.analysis(jnp.asarray(phys0, dtype))
    ctx.extras["sponge_ref"] = grid.synthesis(spec0)["val"]
    state = ti.initial_state(spec0, (grid.nvars,) + grid.spatial_shape,
                             dtype)
    step = build_step(model, grid, ctx, dtype)
    per = int(round(args.minutes * 60.0 / model.ts))
    chunk = _pick_chunk(per)
    scan = make_scan(step, chunk)
    names = list(model.grid_params.vars)
    pts = grid.gridpoints()
    r_km = pts[:, 0].reshape(grid.spatial_shape) / 1e3
    z_km = pts[:, 2].reshape(grid.spatial_shape) / 1e3
    t = 0.0
    nsteps = int(round(args.hours * 3600.0 / model.ts))
    done = 0
    while done < nsteps:
        n = min(per, nsteps - done)
        if n == per:
            for _ in range(per // chunk):
                state = scan(state)
            if per % chunk:
                state = make_scan(step, per % chunk)(state)
        else:
            state = make_scan(step, n)(state)
        done += n
        t = done * model.ts
        phys = np.asarray(grid.synthesis(state.spec)["val"])
        cells = []
        bad = False
        for i, nm in enumerate(names):
            f = phys[i].reshape(grid.spatial_shape)
            a = np.abs(f)
            if not np.isfinite(f).all():
                j = np.unravel_index(np.argmax(~np.isfinite(f)), f.shape)
                cells.append(f"{nm}=NONFIN@r{r_km[j]:.0f}z{z_km[j]:.1f}")
                bad = True
            else:
                j = np.unravel_index(a.argmax(), f.shape)
                cells.append(
                    f"{nm}={f[j]:+.3e}@r{r_km[j]:.0f}z{z_km[j]:.1f}")
        print(f"t={t/60.0:6.1f}min " + " ".join(cells), flush=True)
        if bad:
            break


if __name__ == "__main__":
    main()
