"""Round-5 JW06 breaking-phase forensic: localize the day 7-8 killer.

Every stabilizer bundle (zsp12+K4, +smag 0.21/0.28, ts10+K4 4.5e16)
dies one day after |v|max crosses ~20 m/s (jw06_r5_wave_win*.log) —
amplitude-triggered, so it rides the breaking front.  This tool runs
the winning config to --coarse-days with daily reports, then switches
to --fine-minutes reporting with per-variable eddy maxima + ring
spectra, keeps the previous state, and on NaN: dumps the last finite
state to npz and single-steps it, checking per-variable finiteness per
step to identify the first channel and location to blow.

Usage: python tools/jw06_r5_forensic.py [--smag 0.0] [--k4 3e16]
"""

from __future__ import annotations

import argparse
import importlib.util
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

_spec = importlib.util.spec_from_file_location(
    "jw06_example",
    os.path.join(os.path.dirname(__file__), "..", "examples",
                 "jw06_baroclinic_slz.py"),
)
jw = importlib.util.module_from_spec(_spec)
sys.modules["jw06_example"] = jw
_spec.loader.exec_module(jw)

VAR_NAMES = ["s", "xi", "mu", "u", "v", "w", "mu_c", "mu_r", "qss"]


def eddy_report(grid, phys, lat, zkm, label):
    sh = grid.spatial_shape
    parts = []
    for vi, name in enumerate(VAR_NAMES[: phys.shape[0]]):
        f = phys[vi].reshape(sh)
        ed = f - f.mean(axis=1, keepdims=True)
        m = float(np.abs(ed).max())
        i, j, k = np.unravel_index(np.abs(ed).argmax(), ed.shape)
        ring = ed[i, :, k]
        ktop = int(np.argsort(np.abs(np.fft.rfft(ring)))[::-1][0])
        parts.append(f"{name}={m:.2e}@({lat[i]:.0f},{zkm[k]:.1f},k{ktop})")
    print(f"  {label} " + " ".join(parts), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cells", type=int, default=48)
    ap.add_argument("--nl", type=int, default=96)
    ap.add_argument("--zdim", type=int, default=24)
    ap.add_argument("--ts", type=float, default=15.0)
    ap.add_argument("--k4", type=float, default=3.0e16)
    ap.add_argument("--smag", type=float, default=0.0)
    ap.add_argument("--sponge-top-km", type=float, default=12.0)
    ap.add_argument("--coarse-days", type=float, default=6.5)
    ap.add_argument("--fine-minutes", type=float, default=30.0)
    ap.add_argument("--fine-days", type=float, default=2.0)
    ap.add_argument("--dump", default="/tmp/jw06_forensic_last.npz")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_enable_x64", True)  # CPU-side balance solve
    from scythe_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp

    from scythe_tpu import create_grid
    from scythe_tpu import timeintegration as ti
    from scythe_tpu.model import (_set_boundary_refs, build_context,
                                  build_step, make_scan)

    dtype = jnp.float32
    model = jw.build_model("/tmp/jw06_forensic", num_cells=args.cells,
                           nl=args.nl, zdim=args.zdim, ts=args.ts,
                           t_end=86400.0, l_q=0.0, k4=args.k4,
                           smag=args.smag,
                           sponge_top=args.sponge_top_km * 1e3)
    grid = create_grid(model.grid_params, dtype)
    ctx = build_context(model, grid, dtype)
    phys0 = jw.initial_fields(grid, ctx.ref_state, perturb=True)

    cache = f"/tmp/jw06_bal_c{args.cells}_z{args.zdim}.npz"
    bal = np.load(cache)["bal"]
    base0 = jw.initial_fields(grid, ctx.ref_state, perturb=False)
    zm = np.asarray(base0).mean(axis=2)
    phys0 = np.asarray(phys0) + (bal - zm)[:, :, None, :]
    spec0 = grid.analysis(jnp.asarray(phys0, dtype))
    state = ti.initial_state(spec0, (grid.nvars,) + grid.spatial_shape,
                             dtype, imp_rows=2)
    _set_boundary_refs(ctx, grid, spec0)
    step = build_step(model, grid, ctx, dtype)

    lat = np.degrees(np.asarray(grid.r_mish))
    zkm = np.asarray(grid.z_mish) / 1e3

    per_day = int(round(86400.0 / args.ts))
    scan_day = make_scan(step, per_day)
    t0 = time.time()
    for d in range(int(args.coarse_days)):
        state = scan_day(state)
        phys = np.asarray(grid.synthesis(state.spec)["val"])
        if not np.isfinite(phys).all():
            print(f"NONFINITE during coarse day {d+1}")
            return
        print(f"day {d+1} |v|max={np.abs(phys[4]).max():.2f} "
              f"({time.time()-t0:.0f}s)", flush=True)
    frac = args.coarse_days - int(args.coarse_days)
    if frac > 0:
        state = make_scan(step, int(round(frac * per_day)))(state)

    per_fine = int(round(args.fine_minutes * 60.0 / args.ts))
    scan_fine = make_scan(step, per_fine)
    nrep = int(round(args.fine_days * 86400.0 / (args.fine_minutes * 60.0)))
    prev_state = state
    for rep in range(1, nrep + 1):
        state = scan_fine(state)
        phys = np.asarray(grid.synthesis(state.spec)["val"])
        hours = args.coarse_days * 24 + rep * args.fine_minutes / 60.0
        if not np.isfinite(phys).all():
            print(f"NONFINITE at h{hours:.1f} — dumping last finite state "
                  f"and single-stepping", flush=True)
            np.savez(args.dump,
                     spec=np.asarray(prev_state.spec, np.float32))
            st = prev_state
            for s_i in range(per_fine):
                st = step(st)
                ph = np.asarray(grid.synthesis(st.spec)["val"])
                bad = [VAR_NAMES[vi] for vi in range(ph.shape[0])
                       if not np.isfinite(ph[vi]).all()]
                if bad:
                    print(f"  step {s_i+1}: first non-finite channels: "
                          f"{bad}")
                    for name in bad:
                        vi = VAR_NAMES.index(name)
                        f = ph[vi].reshape(grid.spatial_shape)
                        fin = np.isfinite(f)
                        ii, jj, kk = np.where(~fin)
                        print(f"    {name}: {(~fin).sum()} bad pts, "
                              f"lat {lat[ii].min():.0f}..{lat[ii].max():.0f} "
                              f"z {zkm[kk].min():.1f}..{zkm[kk].max():.1f} km")
                    break
                if s_i % 20 == 19:
                    vm = float(np.abs(ph[4]).max())
                    wm = float(np.abs(ph[5]).max())
                    print(f"  step {s_i+1}: |v|={vm:.1f} |w|={wm:.2f}")
            return
        eddy_report(grid, phys, lat, zkm, f"h{hours:6.1f}")
        prev_state = state


if __name__ == "__main__":
    main()
