"""Localize the mature-vortex collapse of the TC-intensification run.

The round-3 sweep's best case (rh=0.85, qv0=20, 10 km cells, prognostic
qss, smag Cs=0.25) intensifies to Vmax ~31 m/s / RMW 11 km by h36 and
goes NONFINITE at h38.  This probe reruns that config coarse to
--fine-start, checkpoints the ModelState (npz of the pytree leaves), then
probes at fine cadence printing per-variable extrema + (r, z) location so
the blow-up variable and site are pinned.  Resume from a checkpoint with
--resume to iterate levers without repaying the spin-up.

Usage:
  python tools/tc_probe_mature.py [--cpu] [--fine-start 30] [--hours 40]
      [--fine-min 10] [--resume ck.npz] [--opt key=value ...]
      [--smag 0.25] [--ckpt-dir tc_mature_ck]
"""

import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "examples"))


def save_state(path, state):
    np.savez(path, spec=np.asarray(state.spec),
             expdot_nm1=np.asarray(state.expdot_nm1),
             expdot_nm2=np.asarray(state.expdot_nm2),
             impdot_nm1=np.asarray(state.impdot_nm1),
             impdot_nm2=np.asarray(state.impdot_nm2),
             t=np.asarray(state.t))


def load_state(path, dtype):
    import jax.numpy as jnp
    from scythe_tpu.timeintegration import ModelState
    d = np.load(path)
    return ModelState(
        jnp.asarray(d["spec"], dtype), jnp.asarray(d["expdot_nm1"], dtype),
        jnp.asarray(d["expdot_nm2"], dtype), jnp.asarray(d["impdot_nm1"], dtype),
        jnp.asarray(d["impdot_nm2"], dtype), jnp.asarray(d["t"]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--hours", type=float, default=40.0)
    ap.add_argument("--fine-start", type=float, default=30.0)
    ap.add_argument("--fine-min", type=float, default=10.0)
    ap.add_argument("--resume", default=None)
    ap.add_argument("--smag", type=float, default=0.25)
    ap.add_argument("--ts", type=float, default=2.0)
    ap.add_argument("--cells", type=int, default=50)
    ap.add_argument("--ckpt-dir", default="./tc_mature_ck")
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
    from scythe_tpu.model import (build_context, build_step, default_dtype,
                                  make_scan)

    os.makedirs(args.ckpt_dir, exist_ok=True)
    out = os.path.join(args.ckpt_dir, "run")
    model = build_model(out, num_cells=args.cells, ts=args.ts,
                        t_end=args.hours * 3600.0, fluxes=True,
                        rh=0.85, qv0=20.0, smag=args.smag)
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
    step = build_step(model, grid, ctx, dtype)

    names = list(model.grid_params.vars)
    pts = grid.gridpoints()
    shape = grid.spatial_shape
    r_km = pts[:, 0].reshape(shape) / 1.0e3
    z_km = pts[:, 2].reshape(shape) / 1.0e3

    def report(state, label):
        phys = np.asarray(grid.synthesis(state.spec)["val"])
        ok = np.isfinite(phys).all()
        cells = []
        for i, n in enumerate(names):
            f = phys[i].reshape(shape)
            af = np.abs(f)
            j = np.unravel_index(np.nanargmax(np.where(np.isfinite(af), af, -1.0)), f.shape)
            nf = "" if np.isfinite(f).all() else "*NONFIN*"
            cells.append(f"{n}={f[j]:+.3e}@({r_km[j]:.0f},{z_km[j]:.1f}){nf}")
        print(f"[{label}] " + " ".join(cells), flush=True)
        return ok, phys

    hour = 0.0
    if args.resume:
        state = load_state(args.resume, dtype)
        hour = float(os.path.basename(args.resume).split("_h")[1].split(".npz")[0])
        print(f"resumed at h{hour}")
    else:
        state = ti.initial_state(spec0, (grid.nvars,) + grid.spatial_shape,
                                 dtype)

    per_h = int(round(3600.0 / model.ts))
    chunk = 225 if per_h % 225 == 0 else 200
    scan_h = make_scan(step, chunk)
    n_chunks_h = per_h // chunk
    assert per_h % chunk == 0, per_h
    while hour < args.fine_start - 1e-6 and hour < args.hours - 1e-6:
        for _ in range(n_chunks_h):
            state = scan_h(state)
        hour += 1.0
        ok, _ = report(state, f"h{hour:.0f}")
        if hour % 2 == 0 or not ok:
            save_state(os.path.join(args.ckpt_dir, f"ck_h{hour:.0f}.npz"),
                       state)
        if not ok:
            print("NONFINITE during coarse phase; stopping")
            return

    fine_steps = int(round(args.fine_min * 60.0 / model.ts))
    scan_f = make_scan(step, fine_steps)
    last_good = state
    while hour < args.hours - 1e-6:
        state = scan_f(state)
        hour += args.fine_min / 60.0
        ok, phys = report(state, f"h{hour:.2f}")
        if not ok:
            save_state(os.path.join(args.ckpt_dir, "last_good.npz"),
                       last_good)
            print(f"NONFINITE in ({hour - args.fine_min/60.0:.2f}, "
                  f"{hour:.2f}]; last good state saved")
            # single-step bisection from last_good
            st = last_good
            one = make_scan(step, 1)
            for k in range(fine_steps):
                st = one(st)
                p = np.asarray(grid.synthesis(st.spec)["val"])
                if not np.isfinite(p).all():
                    bad = [names[i] for i in range(len(names))
                           if not np.isfinite(p[i]).all()]
                    print(f"first nonfinite at step +{k+1}: vars {bad}")
                    for i, n in enumerate(names):
                        f = p[i].reshape(shape)
                        m = ~np.isfinite(f)
                        if m.any():
                            jj = np.argwhere(m)
                            print(f"  {n}: {m.sum()} pts, first at "
                                  f"r={r_km[tuple(jj[0])]:.0f} km, "
                                  f"z={z_km[tuple(jj[0])]:.2f} km")
                    break
            return
        last_good = state
    save_state(os.path.join(args.ckpt_dir, f"ck_h{args.hours:.0f}.npz"),
               state)
    print("completed without nonfinite")


if __name__ == "__main__":
    main()
