"""Replay the r5 diagnostic+ivd quiet NaN from the saved checkpoint and
dissect condensation_adjustment's intermediates at the failing step.

The probe (tools/tc_probe_mature.py) showed s/mu/mu_c going NaN
simultaneously within one 20-minute window of an otherwise quiet run —
exactly the three fields the post-step saturation adjustment writes.
This tool steps from last_good.npz with a step replica that exposes
var_np1 BEFORE the adjustment, finds the first step whose adjusted
output is nonfinite, and prints every intermediate at the offending
points.

Usage: python tools/tc_nan_forensic.py [--ckpt /tmp/tc_r5diag_ck/last_good.npz]
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
    ap.add_argument("--ckpt", default="/tmp/tc_r5diag_ck/last_good.npz")
    ap.add_argument("--cells", type=int, default=100)
    ap.add_argument("--smag", type=float, default=0.2)
    ap.add_argument("--max-steps", type=int, default=1500)
    ap.add_argument("--diag", action="store_true")
    ap.add_argument("--cap", type=float, default=1e-3)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from scythe_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp

    from tc_intensification_rlz import build_model, write_ics
    from tc_probe_mature import load_state

    from scythe_tpu import create_grid
    from scythe_tpu import timeintegration as ti
    from scythe_tpu.equations.common import get_equation_set
    from scythe_tpu.io import read_physical_grid
    from scythe_tpu.model import (build_context, build_implicit_vdiff,
                                  build_step, build_surface_fluxes,
                                  default_dtype, make_scan)
    from scythe_tpu.physics import microphysics as mp
    from scythe_tpu.physics import thermodynamics as td

    import dataclasses

    model = build_model("/tmp/tc_forensic", num_cells=args.cells, ts=2.0,
                        t_end=48 * 3600.0, fluxes=True, smag=args.smag,
                        rh=0.85, qv0=20.0)
    extra = {"implicit_vdiff": True}
    if args.diag:
        extra["condensation"] = "diagnostic"
    extra["condensation_rate_cap"] = args.cap
    model = dataclasses.replace(model, options={**model.opts(), **extra})
    dtype = default_dtype()
    grid = create_grid(model.grid_params, dtype)
    ctx = build_context(model, grid, dtype)
    write_ics(model, grid, ctx.ref_state)
    phys0 = read_physical_grid(model.initial_conditions, grid)
    spec0 = grid.analysis(jnp.asarray(phys0, dtype))
    ctx.extras["sponge_ref"] = grid.synthesis(spec0)["val"]
    step = build_step(model, grid, ctx, dtype)
    state = load_state(args.ckpt, dtype)

    # a step replica exposing var_np1 BEFORE condensation_adjustment:
    # reuse build_step with needs_condensation monkeypatched off is
    # invasive; instead rebuild the pre-adjustment pipeline inline
    # (synthesis -> eqset -> fluxes/sponge -> explicit -> SI -> vdiff),
    # mirroring model.build_step.
    eqset = get_equation_set(model.equation_set)
    sfx = build_surface_fluxes(grid, ctx, dict(model.opts()["surface_fluxes"]), dtype)
    vdiff = build_implicit_vdiff(grid, dtype)
    si_ops = None
    p = grid.params
    si_ops = ti.build_semiimplicit_ops(
        p.zDim, p.zmin, p.zmax, p.b_zDim, float(ctx.ref_state.Pxi_bar),
        model.ts, dtype)
    w_i, xi_i = p.var_index("w"), p.var_index("xi")
    sp_w = float(model.opts().get("sponge_width", 0.0))
    tau = float(model.opts().get("sponge_tau", 600.0))
    r = ctx.coords["r"]
    ramp = jnp.clip((r - (p.xmax - sp_w)) / sp_w, 0.0, 1.0)
    sponge_sigma = (jnp.sin(0.5 * jnp.pi * ramp) ** 2 / tau).astype(dtype)
    sponge_ref = ctx.extras["sponge_ref"]

    import jax as _jax

    @_jax.jit
    def pre_adjustment(state):
        fields = grid.synthesis(state.spec)
        res = eqset(fields, ctx)
        phys = fields["val"]
        expdot = sfx(res.expdot, phys)
        expdot = expdot - sponge_sigma[None] * (phys - sponge_ref)
        var_np1, e1, e2 = ti.explicit_step(
            phys, expdot, state.expdot_nm1, state.expdot_nm2, state.t,
            model.ts)
        impdot = res.impdot
        w_new, xi_new = ti.semiimplicit_adjustment(
            si_ops, var_np1[w_i], var_np1[xi_i], impdot[w_i],
            state.impdot_nm1[w_i], state.impdot_nm2[w_i], impdot[xi_i],
            state.impdot_nm1[xi_i], state.impdot_nm2[xi_i], state.t)
        var_np1 = var_np1.at[w_i].set(w_new).at[xi_i].set(xi_new)
        var_np1 = vdiff(var_np1, res.k_v, model.ts)
        return var_np1

    one = make_scan(step, 1)
    scan20 = make_scan(step, 20)
    k = 0
    while k < args.max_steps:
        # cheap screen in 20-step hops; refine when NaN appears
        nxt = scan20(state)
        bad = not bool(jnp.isfinite(nxt.spec).all())
        if not bad:
            state = nxt
            k += 20
            continue
        print(f"NaN inside steps ({k}, {k+20}]; bisecting...", flush=True)
        for j in range(20):
            var_pre = pre_adjustment(state)
            adj = mp.condensation_adjustment(var_pre, None, ctx)
            pre_ok = bool(jnp.isfinite(var_pre).all())
            adj_ok = bool(jnp.isfinite(adj).all())
            print(f"step {k+j}: pre-adjustment finite={pre_ok}, "
                  f"adjusted finite={adj_ok}", flush=True)
            if pre_ok and not adj_ok:
                dissect(grid, ctx, var_pre, model)
                return
            if not pre_ok:
                badv = [p.vars[i] for i in range(grid.nvars)
                        if not bool(jnp.isfinite(var_pre[i]).all())]
                print(f"  NaN already pre-adjustment in {badv}")
                return
            state = one(state)
            k += 1
        print("NaN did not reproduce at single-step cadence?!")
        return
    print("no NaN within max-steps")


def dissect(grid, ctx, var_np1, model):
    import jax.numpy as jnp

    from scythe_tpu.physics import microphysics as mp
    from scythe_tpu.physics import thermodynamics as td

    vi = ctx.var_index
    rs = ctx.ref_state
    s = var_np1[vi("s")]
    xi = var_np1[vi("xi")]
    mu = var_np1[vi("mu")]
    mu_c = var_np1[vi("mu_c")]
    s_total = s + rs.sbar[None, :, 0]
    xi_total = xi + rs.xibar[None, :, 0]
    mu_total = mu + rs.mubar[None, :, 0]
    q_v, rho_d, Tk, p = td.thermodynamic_tuple(s_total, xi_total, mu_total)
    q_c = td.ahyp(mu_c)
    q_r = td.ahyp(var_np1[vi("mu_r")])
    q_l = q_c + q_r
    q_sat = td.q_sat_liquid(Tk, p)
    Q_s = mp.Q_s_factor(Tk, p, q_v, q_l)
    cap = float(ctx.options.get("condensation_rate_cap", 2e-4)) * ctx.ts
    q_cond = jnp.clip((q_v - q_sat) / (1.0 + Q_s), -cap, cap)
    q_cond = jnp.maximum(-q_c, jnp.minimum(q_v, q_cond))
    dmu = td.dmudq(mu_total, q_v)
    dsrc = ctx.dmudq_source(mu_c, q_c)
    s_c = mp.s_condensation(q_cond, Tk, rho_d, q_v, q_l, p)
    names = {"q_v": q_v, "rho_d": rho_d, "Tk": Tk, "p": p, "q_c": q_c,
             "q_sat": q_sat, "Q_s": Q_s, "q_cond": q_cond, "dmudq": dmu,
             "dmudq_source": dsrc, "s_condensation": s_c}
    import numpy as np

    sh = grid.spatial_shape
    pts = grid.gridpoints()
    r_km = pts[:, 0].reshape(sh) / 1e3
    z_km = pts[:, 2].reshape(sh) / 1e3
    bad_mask = None
    for n, a in names.items():
        a = np.asarray(a)
        m = ~np.isfinite(a)
        print(f"{n}: finite={not m.any()}, range=[{np.nanmin(a):.4e}, "
              f"{np.nanmax(a):.4e}]" + (f", {m.sum()} bad pts" if m.any() else ""))
        if m.any() and bad_mask is None:
            bad_mask = m
            jj = np.argwhere(m)[:5]
            for j in jj:
                print(f"   at r={r_km[tuple(j)]:.1f} km z={z_km[tuple(j)]:.2f} km")
    if bad_mask is not None:
        j = tuple(np.argwhere(bad_mask)[0])
        for n, a in names.items():
            print(f"   {n}[bad0] = {np.asarray(a)[j]}")
        for n in ("s", "xi", "mu", "mu_c", "mu_r", "qss"):
            print(f"   {n}[bad0] = {np.asarray(var_np1[vi(n)])[j]}")


if __name__ == "__main__":
    main()
