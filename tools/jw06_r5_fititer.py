"""Pure fit-iteration erosion test: is the per-step drift the transform?

jw06_r5_erosion.log shows the zonal-mean erosion is PER-STEP (ts=7.5
doubles the daily rate; K=0 changes nothing).  Candidates: (a) the
analysis->synthesis roundtrip every step (f32 / compensated-bf16
Grid._mm), (b) the SI column refit, (c) tendency assembly.  This tool
iterates ONLY spec -> synthesis -> analysis N times on the balanced
JW06 state (no dynamics) and reports the equatorial T / s-profile /
u_max drift per 1000 iterations, on the ambient device at f32 and
optionally on CPU f64 as control.

Usage: python tools/jw06_r5_fititer.py [--iters 5760] [--cpu]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5760)
    ap.add_argument("--chunk", type=int, default=480)
    ap.add_argument("--cells", type=int, default=48)
    ap.add_argument("--nl", type=int, default=96)
    ap.add_argument("--zdim", type=int, default=24)
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
    import jax.numpy as jnp

    from scythe_tpu import create_grid
    from scythe_tpu.model import build_context

    dtype = jnp.float64 if args.cpu else jnp.float32
    model = jw.build_model("/tmp/jw06_fit", num_cells=args.cells,
                           nl=args.nl, zdim=args.zdim, ts=15.0,
                           t_end=86400.0, l_q=0.0)
    grid = create_grid(model.grid_params, dtype)
    ctx = build_context(model, grid, dtype)
    bal = np.load(f"/tmp/jw06_bal_c{args.cells}_z{args.zdim}.npz")["bal"]
    base_full = bal[:, :, None, :] * np.ones((1, 1, grid.nl, 1))
    spec = grid.analysis(jnp.asarray(base_full, dtype))

    from scythe_tpu.physics import thermodynamics as td

    lat = np.degrees(np.asarray(grid.r_mish))
    jeq = int(np.argmin(np.abs(lat)))
    sh = grid.spatial_shape
    sbar = np.asarray(ctx.ref_state.sbar[:, 0])
    xibar = np.asarray(ctx.ref_state.xibar[:, 0])
    mubar = np.asarray(ctx.ref_state.mubar[:, 0])
    zm = np.asarray(grid.z_mish)

    def report(it, spec):
        phys = np.asarray(grid.synthesis(spec)["val"])
        s_tot = phys[0].reshape(sh).mean(axis=1) + sbar[None, :]
        xi_tot = phys[1].reshape(sh).mean(axis=1) + xibar[None, :]
        mu_tot = phys[2].reshape(sh).mean(axis=1) + mubar[None, :]
        _, _, Tk, _ = (np.asarray(a) for a in
                       td.thermodynamic_tuple(s_tot, xi_tot, mu_tot))
        dsdz = np.gradient(s_tot[jeq], zm)
        print(f"  it {it:6d}: T_eq0={Tk[jeq, 0]:9.4f} "
              f"T_sp0={Tk[0, 0]:9.4f} u_max={phys[3].max():8.4f} "
              f"eq dsdz[.8km]={dsdz[2]:+.3e}", flush=True)

    @jax.jit
    def fit_once(spec):
        return grid.analysis(grid.synthesis(spec)["val"])

    def fit_chunk(spec):
        def body(s, _):
            return fit_once(s), None
        return jax.lax.scan(body, spec, None, length=args.chunk)[0]

    fit_chunk = jax.jit(fit_chunk)
    report(0, spec)
    t0 = time.time()
    done = 0
    while done < args.iters:
        spec = fit_chunk(spec)
        done += args.chunk
        report(done, spec)
    print(f"total {time.time()-t0:.0f}s")


if __name__ == "__main__":
    main()
