"""Hourly forensics for the JW06 modal-filter blow-up (round 4).

The r4 queue's filtered wave run (--filter-tau 60, axes rl) went
NONFINITE inside day 1 while the unfiltered run survives to day 8 —
so the filter *interacts* with the dynamics (the operator alone is
contractive: 200 applications decay a random SLZ state, measured).
This probe steps hour by hour printing per-variable max|val| and the
location of the growing extremum, to localize the mechanism.

Usage: python tools/jw06_filter_probe.py [--cpu] [--hours 30]
         [--filter-tau 60] [--filter-axes rl] [--steady] [--cells 32]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--hours", type=float, default=30.0)
    ap.add_argument("--cells", type=int, default=32)
    ap.add_argument("--nl", type=int, default=96)
    ap.add_argument("--zdim", type=int, default=24)
    ap.add_argument("--ts", type=float, default=15.0)
    ap.add_argument("--filter-tau", type=float, default=60.0)
    ap.add_argument("--filter-axes", default="rl")
    ap.add_argument("--steady", action="store_true")
    ap.add_argument("--si-scale", type=float, default=None,
                    help="override the example's si_scale (default 1.5)")
    ap.add_argument("--out", default="/tmp/jw06_probe")
    args = ap.parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
    from scythe_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache()
    import importlib.util

    import jax.numpy as jnp

    spec_mod = importlib.util.spec_from_file_location(
        "jw06_example",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "..", "examples", "jw06_baroclinic_slz.py"),
    )
    jw = importlib.util.module_from_spec(spec_mod)
    spec_mod.loader.exec_module(jw)

    from scythe_tpu import create_grid
    from scythe_tpu import timeintegration as ti
    from scythe_tpu.model import (build_context, build_step, default_dtype,
                                  make_scan, _pick_chunk)

    model = jw.build_model(args.out, num_cells=args.cells, nl=args.nl,
                           zdim=args.zdim, ts=args.ts,
                           t_end=args.hours * 3600.0,
                           filter_tau=args.filter_tau,
                           filter_axes=args.filter_axes)
    if args.si_scale is not None:
        opts = dict(model.options)
        opts["si_scale"] = float(args.si_scale)
        model = model.with_(options=opts)
    dtype = default_dtype()
    grid = create_grid(model.grid_params, dtype)
    ctx = build_context(model, grid, dtype)
    phys0 = jw.initial_fields(grid, ctx.ref_state, perturb=not args.steady)
    spec0 = grid.analysis(jnp.asarray(phys0, dtype))
    state = ti.initial_state(spec0, (grid.nvars,) + grid.spatial_shape, dtype)
    step = build_step(model, grid, ctx, dtype)

    per = int(round(3600.0 / model.ts))
    chunk = _pick_chunk(per)
    names = list(model.grid_params.vars)
    lat = np.degrees(np.asarray(grid.r_mish))
    z = np.asarray(grid.z_mish)
    print("hour  " + "  ".join(f"{n:>9s}" for n in names), flush=True)
    for h in range(1, int(args.hours) + 1):
        for _ in range(per // chunk):
            state = make_scan(step, chunk)(state)
        if per % chunk:
            state = make_scan(step, per % chunk)(state)
        val = np.asarray(grid.synthesis(state.spec)["val"])
        mx = np.abs(val).reshape(val.shape[0], -1).max(axis=1)
        print(f"{h:4d}  " + "  ".join(f"{m:9.3e}" for m in mx), flush=True)
        if not np.isfinite(val).all():
            bad = ~np.isfinite(val)
            v, i, j, k = np.unravel_index(bad.argmax(), val.shape)
            print(f"NONFINITE first at var={names[v]} lat={lat[i]:.1f} "
                  f"lon_idx={j} z={z[k]:.0f}")
            break
        # where is the fastest-growing extremum of w?
        iw = names.index("w")
        w = val[iw]
        i_, j_, k_ = np.unravel_index(np.abs(w).argmax(), w.shape)
        print(f"      w_max {w.flat[np.abs(w).argmax()]:9.3e} at "
              f"lat={lat[i_]:.1f} lon_idx={j_} z={z[k_]:.0f}", flush=True)


if __name__ == "__main__":
    main()
