"""Round-5 JW06 zonal-mean erosion probe: who cools the tropics?

Forensics (jw06_r5_forensic.log + modeanalysis): every stabilized run
dies of an equatorial surface convective blow-up after the zonal-mean
low-level stratification collapses (total ds/dz at z 0.8-1.5 km: +1e-2
at t=0 -> ~0 by day 7; equatorial T down ~7-16 K; polar surface driven
statically unstable).  The pattern — every column pulled toward the
45-deg reference column — suggests a systematic numerical damping of
the perturbation state, not resolved dynamics.

This probe runs UNPERTURBED arms for --days and prints, daily: the
equatorial total ds/dz profile (z 0.3-3.7 km), equatorial and polar
surface T, polar min ds/dz, u_max.  Arms toggle one knob each; the
sharpest discriminator is ts-dependence (numerical damping rates scale
with ts; resolved advection does not).
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

# name -> build_model overrides (ts pulled out separately).  Every arm
# pins `incremental` explicitly: jw.build_model now defaults it ON.
ARMS = {
    "win": {"sponge_top": 12.0e3, "k4": 3.0e16, "incremental": False},
    "K0": {"sponge_top": 12.0e3, "k4": 3.0e16, "K": 0.0,
           "incremental": False},
    "nok4": {"sponge_top": 12.0e3, "incremental": False},
    "nosponge": {"k4": 3.0e16, "incremental": False},
    "ts7": {"sponge_top": 12.0e3, "k4": 1.5e16, "ts": 7.5,
            "incremental": False},
    # incremental closing analysis (the round-5 erosion fix): the
    # standing state skips the mask-fit contraction + compensated-bf16
    # bias; expect near-zero zonal-mean drift
    "win_inc": {"sponge_top": 12.0e3, "k4": 3.0e16, "incremental": True},
    "inc_only": {"incremental": True},
    "inc_k4": {"k4": 3.0e16, "incremental": True},
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arms", default="win,K0,ts7")
    ap.add_argument("--cells", type=int, default=48)
    ap.add_argument("--nl", type=int, default=96)
    ap.add_argument("--zdim", type=int, default=24)
    ap.add_argument("--days", type=float, default=5.0)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_enable_x64", True)
    from scythe_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp

    from scythe_tpu import create_grid
    from scythe_tpu import timeintegration as ti
    from scythe_tpu.model import (_set_boundary_refs, build_context,
                                  build_step, make_scan)

    dtype = jnp.float32
    cache = f"/tmp/jw06_bal_c{args.cells}_z{args.zdim}.npz"
    bal = np.load(cache)["bal"]

    for arm in args.arms.split(","):
        ov = dict(ARMS[arm])
        ts = float(ov.pop("ts", 15.0))
        model = jw.build_model(f"/tmp/jw06_er_{arm}",
                               num_cells=args.cells, nl=args.nl,
                               zdim=args.zdim, ts=ts, t_end=86400.0,
                               l_q=0.0, **ov)
        grid = create_grid(model.grid_params, dtype)
        ctx = build_context(model, grid, dtype)
        base_full = bal[:, :, None, :] * np.ones((1, 1, grid.nl, 1))
        spec0 = grid.analysis(jnp.asarray(base_full, dtype))
        state = ti.initial_state(
            spec0, (grid.nvars,) + grid.spatial_shape, dtype, imp_rows=2
        )
        _set_boundary_refs(ctx, grid, spec0)
        step = build_step(model, grid, ctx, dtype)
        per = int(round(86400.0 / ts))
        scan = make_scan(step, per)

        lat = np.degrees(np.asarray(grid.r_mish))
        zm = np.asarray(grid.z_mish)
        jeq = int(np.argmin(np.abs(lat)))
        sbar = np.asarray(ctx.ref_state.sbar[:, 0])
        sh = grid.spatial_shape
        k5 = int(np.searchsorted(zm, 5000.0))

        from scythe_tpu.physics import thermodynamics as td

        def report(day, phys, wall):
            s_tot = phys[0].reshape(sh).mean(axis=1) + sbar[None, :]
            dsdz = np.gradient(s_tot, zm, axis=1)
            xiz = (phys[1].reshape(sh).mean(axis=1)
                   + np.asarray(ctx.ref_state.xibar[:, 0])[None, :])
            muz = (phys[2].reshape(sh).mean(axis=1)
                   + np.asarray(ctx.ref_state.mubar[:, 0])[None, :])
            _, _, Tk, _ = (np.asarray(a) for a in
                           td.thermodynamic_tuple(s_tot, xiz, muz))
            lo = dsdz[:, :k5]
            i, k = np.unravel_index(np.argmin(lo), lo.shape)
            veddy = phys[4].reshape(sh)
            print(f"  d{day:4.1f} eq_dsdz[.3/.8/1.5/2.5km]="
                  + "/".join(f"{dsdz[jeq, kk]:+.1e}" for kk in (1, 2, 3, 4))
                  + f" T_eq0={Tk[jeq, 0]:6.2f} T_sp0={Tk[0, 0]:6.2f}"
                  f" T_np0={Tk[-1, 0]:6.2f}"
                  f" min_dsdz={lo[i, k]:+.2e}@({lat[i]:.0f},{zm[k]/1e3:.1f})"
                  f" u_max={phys[3].max():6.2f}"
                  f" |v|={np.abs(veddy).max():7.3f} ({wall:.0f}s)",
                  flush=True)

        print(f"--- arm {arm}: ts={ts} ov={sorted(ov.items())}")
        phys = np.asarray(grid.synthesis(state.spec)["val"])
        report(0.0, phys, 0)
        for d in range(1, int(args.days) + 1):
            t0 = time.time()
            state = scan(state)
            phys = np.asarray(grid.synthesis(state.spec)["val"])
            if not np.isfinite(phys).all():
                print(f"  d{d} NONFINITE")
                break
            report(d, phys, time.time() - t0)


if __name__ == "__main__":
    main()
