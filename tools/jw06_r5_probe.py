"""Round-5 JW06 instability probe: localize and close the fast zonal
mode of the l_q=0 shell.

Measured (jw06_r5_steady.log / _wave_s21.log): the UNPERTURBED,
discretely-balanced 48-cell state grows |v| 0 -> ~3.3 m/s of zonal
asymmetry in one day (e-fold ~70-110 min from the f32 roundoff seed)
and goes non-finite by day 2; horizontal Smagorinsky Cs=0.21 does not
slow it.  The same mode existed all round 4 under l_q=2 (steady |v|
1.0 by day 1, dead day 7) — the contractive fit was damping it ~3x.
It is NOT the baroclinic wave (that e-folds ~1.5 days).

This probe balances ONCE (cached to /tmp), then runs short windows of
each candidate stabilizer, printing after every 3 simulated hours:
|v|_max, its (lat, z) location, the dominant zonal wavenumbers of v at
that ring, and the implied e-fold time — enough to tell a pole-ring
mode (lat ~ +-90, high k) from a stratopause mode (z ~ 25-30 km) from
a jet-core front (lat ~ 45, z < 12 km, k ~ 6-9).

Usage: python tools/jw06_r5_probe.py [--arms base,sis2,...] [--cells 48]
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

ARMS = {
    # name -> (build_model overrides, option patches)
    "base": ({}, {}),
    "sis2": ({}, {"si_scale": 2.0}),
    "lfo8": ({"filter_tau": 60.0, "filter_order": 8,
              "filter_axes": "l"}, {}),
    "smag28_lfo8": ({"smag": 0.28, "filter_tau": 60.0,
                     "filter_order": 8, "filter_axes": "l"}, {}),
    "K5": ({"K": 5.0e5}, {}),
    "ts10": ({"ts": 10.0}, {}),
    # weak masked latitude+longitude filter: if the mode is fine-scaled
    # in LATITUDE (the l_q fit penalty damped it 3x; flow-dependent
    # smag cannot touch a linear mode on a smooth base), a tau far
    # weaker than the polar-stratosphere-forcing strengths should kill
    # it while leaving the k=8 wave untouched (order 8).
    "rlf_w": ({"filter_tau": 600.0, "filter_order": 8,
               "filter_axes": "rl"}, {}),
    "rlf_m": ({"filter_tau": 120.0, "filter_order": 8,
               "filter_axes": "rl"}, {}),
    # top absorbing layer: the measured early mode sits AT the model
    # top over the poles (h3: |v| ~2 at lat 89.6, z = 29.7-30 km, k 0-2)
    "zsp": ({"sponge_top": 8.0e3}, {}),
    "zsp_rlf": ({"sponge_top": 8.0e3, "filter_tau": 600.0,
                 "filter_order": 8, "filter_axes": "rl"}, {}),
    "zsp_s21": ({"sponge_top": 8.0e3, "smag": 0.21}, {}),
    "zsp12": ({"sponge_top": 12.0e3}, {}),
    "zsp_t300": ({"sponge_top": 8.0e3}, {"sponge_top_tau": 300.0}),
    # del^4 hyperdiffusion vs the surface shortwave edge waves (the
    # day-3 killer: surface-trapped s'/u'/v', k 8-44, ~1 km deep)
    "zsp_k4": ({"sponge_top": 8.0e3, "k4": 5.0e16}, {}),
    "zsp_k4s": ({"sponge_top": 8.0e3, "k4": 1.5e17}, {}),
    # AB3 explicit-stability bound: DIAGONAL 2-grid modes see 4x the
    # 1-D del^4 rate — K4*(2*(pi/dx)^2)^2*ts must stay under ~0.545.
    # At 48 cells (dx_lat 139 km, ts 15): 5e16 -> 0.78 (the h78
    # no-precursor detonation of zsp_k4), 2e16 -> 0.31 (safe).
    "zsp_k4b": ({"sponge_top": 8.0e3, "k4": 2.0e16}, {}),
    "zsp_k4c": ({"sponge_top": 8.0e3, "k4": 3.0e16}, {}),
    # probe5 verdict: ALL sponge_top=8km arms detonate h72-78 with no
    # |v|/|w|/u precursor, INDEPENDENT of K4 (2e16/3e16/5e16) and smag
    # — the diagonal-CFL theory is dead.  zsp12 (12 km sponge) sailed
    # past h96; its killer is the VISIBLE equatorial surface mode
    # (k 8-44, e-fold ~7-30 h), which K4=2e16 held bounded in zsp_k4b.
    # The persistent |w|~0.3-0.5 at lat +-86-90, z 18-23 km sits at the
    # 8-km sponge BASE -> polar mode at the sponge base is the abrupt
    # killer; the deeper sponge covers it.  Combine both fixes:
    "zsp12_k4b": ({"sponge_top": 12.0e3, "k4": 2.0e16}, {}),
    "zsp12_k4c": ({"sponge_top": 12.0e3, "k4": 3.0e16}, {}),
    # eddy-only absorber: the full-state top sponge pins s/xi/u to t=0
    # against the interior's slow drift and builds a forcing ring at
    # the sponge base (model.py sponge_top_vars comment) — the likely
    # h72-78 detonation.  The balanced base has v = w = 0, so damping
    # only (v, w) is exactly neutral at ALL times, not just t=0.
    "zspvw_k4b": ({"sponge_top": 8.0e3, "k4": 2.0e16},
                  {"sponge_top_vars": ("v", "w")}),
    "zspvw12_k4b": ({"sponge_top": 12.0e3, "k4": 2.0e16},
                    {"sponge_top_vars": ("v", "w")}),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arms", default="base,sis2,lfo8")
    ap.add_argument("--cells", type=int, default=48)
    ap.add_argument("--nl", type=int, default=96)
    ap.add_argument("--zdim", type=int, default=24)
    ap.add_argument("--hours", type=float, default=12.0,
                    help="window length per arm (sim hours)")
    ap.add_argument("--report-hours", type=float, default=3.0)
    ap.add_argument("--out", default="/tmp/jw06_probe")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_enable_x64", True)  # CPU-side balance solve
    from scythe_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp

    from scythe_tpu import create_grid
    from scythe_tpu import timeintegration as ti
    from scythe_tpu.balance import balance_zonal_state
    from scythe_tpu.model import build_context, build_step, make_scan

    dtype = jnp.float32

    # ---- balance once on the base model, cache the zonal-mean fields
    cache = f"/tmp/jw06_bal_c{args.cells}_z{args.zdim}.npz"
    base_model = jw.build_model(args.out, num_cells=args.cells,
                                nl=args.nl, zdim=args.zdim, ts=15.0,
                                t_end=86400.0, l_q=0.0)
    if os.path.exists(cache):
        bal = np.load(cache)["bal"]
        print(f"balance: loaded {cache}")
    else:
        grid0 = create_grid(base_model.grid_params, jnp.float64)
        ctx0 = build_context(base_model, grid0, jnp.float64)
        base0 = jw.initial_fields(grid0, ctx0.ref_state, perturb=False)
        zm = np.asarray(base0).mean(axis=2)
        t0 = time.time()
        bal, info = balance_zonal_state(base_model, zm, verbose=True)
        print(f"balance: {time.time()-t0:.0f}s, residual "
              + " -> ".join(f"{h:.2e}" for h in info["history"]))
        np.savez(cache, bal=bal)

    for arm in args.arms.split(","):
        overrides, patches = ARMS[arm]
        ts = float(overrides.get("ts", 15.0))
        mk = {k: v for k, v in overrides.items() if k != "ts"}
        model = jw.build_model(args.out + "_" + arm,
                               num_cells=args.cells, nl=args.nl,
                               zdim=args.zdim, ts=ts, t_end=86400.0,
                               l_q=0.0, **mk)
        if patches:
            import dataclasses as dc

            model = dc.replace(
                model, options={**dict(model.options), **patches}
            )
        grid = create_grid(model.grid_params, dtype)
        ctx = build_context(model, grid, dtype)
        base_full = np.asarray(bal)[:, :, None, :] * np.ones(
            (1, 1, grid.nl, 1)
        )
        spec0 = grid.analysis(jnp.asarray(base_full, dtype))
        state = ti.initial_state(
            spec0, (grid.nvars,) + grid.spatial_shape, dtype, imp_rows=2
        )
        from scythe_tpu.model import _set_boundary_refs

        _set_boundary_refs(ctx, grid, spec0)
        step = build_step(model, grid, ctx, dtype)
        per = int(round(args.report_hours * 3600.0 / ts))
        scan = make_scan(step, per)
        lat = np.degrees(np.asarray(grid.r_mish))
        zkm = np.asarray(grid.z_mish) / 1e3
        nrep = int(round(args.hours / args.report_hours))
        print(f"--- arm {arm}: ts={ts} opts={sorted(patches.items())} "
              f"build={sorted(mk.items())}")
        prev = None
        for rep in range(1, nrep + 1):
            t0 = time.time()
            state = scan(state)
            phys = np.asarray(grid.synthesis(state.spec)["val"])
            wall = time.time() - t0
            if not np.isfinite(phys).all():
                print(f"  h{rep*args.report_hours:5.1f} NONFINITE")
                break
            v = phys[4].reshape(grid.spatial_shape)
            w = phys[5].reshape(grid.spatial_shape)
            vmax = float(np.abs(v).max())
            i, j, k = np.unravel_index(np.abs(v).argmax(), v.shape)
            ring = v[i, :, k]
            sp = np.abs(np.fft.rfft(ring))
            top = np.argsort(sp)[::-1][:3]
            # track the upper- and lower-half v maxima separately: the
            # top mode (sponge target) vs the slow surface mode
            nz2 = v.shape[2] // 2
            vlo = float(np.abs(v[:, :, :nz2]).max())
            vhi = float(np.abs(v[:, :, nz2:]).max())
            il, jl, kl = np.unravel_index(
                np.abs(v[:, :, :nz2]).argmax(), v[:, :, :nz2].shape
            )
            wmax = float(np.abs(w).max())
            iw, jw_, kw = np.unravel_index(np.abs(w).argmax(), w.shape)
            # zonal-eddy s and xi: the h72-78 sponge-base detonation has
            # no |v|/|w| precursor — watch the thermodynamic channels
            s_ed = phys[0].reshape(grid.spatial_shape)
            s_ed = s_ed - s_ed.mean(axis=1, keepdims=True)
            x_ed = phys[1].reshape(grid.spatial_shape)
            x_ed = x_ed - x_ed.mean(axis=1, keepdims=True)
            smax = float(np.abs(s_ed).max())
            i_s, j_s, k_s = np.unravel_index(np.abs(s_ed).argmax(),
                                             s_ed.shape)
            xmax = float(np.abs(x_ed).max())
            ef = ""
            if prev and prev > 0 and vmax > prev:
                ef_min = args.report_hours * 60.0 / np.log(vmax / prev)
                ef = f" efold={ef_min:6.0f}min"
            print(f"  h{rep*args.report_hours:5.1f} |v|max={vmax:9.3e} "
                  f"at lat={lat[i]:6.1f} z={zkm[k]:5.1f}km "
                  f"k_top={list(top)}{ef} u_max={phys[3].max():6.2f} "
                  f"lo={vlo:8.2e}@({lat[il]:5.1f},{zkm[kl]:4.1f}) "
                  f"hi={vhi:8.2e} "
                  f"|w|={wmax:8.2e}@({lat[iw]:5.1f},{zkm[kw]:4.1f}) "
                  f"s'={smax:8.2e}@({lat[i_s]:5.1f},{zkm[k_s]:4.1f}) "
                  f"xi'={xmax:8.2e} "
                  f"({wall:.0f}s)", flush=True)
            prev = vmax
            if vmax > 30.0:
                print("  (diverging, stop arm)")
                break


if __name__ == "__main__":
    main()
