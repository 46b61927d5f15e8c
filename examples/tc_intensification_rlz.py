"""Surface-flux-driven tropical-cyclone intensification on the RLZ moist
core (Rotunno & Emanuel 1987-style axisymmetric experiment).

The full WISHE loop on this framework's own physics stack — none of
which exists in the reference (its TC experiments are the two-layer
shallow-water slab): the 3-D moist compressible core (MoistEulerRLZ, run
near-axisymmetric at lDim=4), bulk air-sea enthalpy/momentum fluxes
(options['surface_fluxes'], model.build_surface_fluxes), active rain
sedimentation, the stiff-relaxation limiter that makes the 20 km deep
tropical column integrable at ts ~ 2 s, the semi-implicit vertical
acoustic solve, and a Rayleigh sponge at the open outer boundary.

Setup (RE87-flavored, coarse): f-plane at f = 5e-5 1/s, SST = 28 C over
a Jordan-like mean tropical sounding, initial gradient-balanced warm-rain
-free vortex Vmax = 12 m/s at r = 82.5 km (xi' from linear gradient
balance, d p'/dr = rho_bar (f v + v^2/r), so the spin-up shock is small).
The measure of success is the WISHE loop closing: boundary-layer inflow,
eyewall convection, and a tangential-wind maximum that AMPLIFIES over
the first simulated days while the no-flux control decays.

Usage:
    python examples/tc_intensification_rlz.py [--cpu] [--hours 48]
        [--no-fluxes] [--cells 50]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

VARS = {
    "s": 1, "xi": 2, "mu": 3, "u": 4, "v": 5, "w": 6,
    "mu_c": 7, "mu_r": 8, "qss": 9,
}
F_COR = 5.0e-5
SST = 301.15  # 28 C
RMAX_DOM = 500.0e3
ZTOP = 20.0e3


def jordan_sounding(path, rh=0.7, qv0=16.0):
    """Jordan-like mean tropical sounding: moist BL, conditionally
    unstable troposphere, isothermal ~203 K stratosphere above 15 km.

    The humidity profile is CAPPED at ``rh`` of saturation (vs an
    approximate hydrostatic T/p column): the original flat stratospheric
    qv exceeded q_sat at the 192-205 K upper levels (RH to 2.8), and a
    supersaturated reference column makes condensation fire at t = 0
    over whole layers — the measured blow-up mechanism of this
    experiment's first version (same trap the convective-shower sounding
    documents; the global spectral transform then spreads the top-layer
    runaway everywhere).

    ``rh``/``qv0`` control how close the column sits to saturation.  The
    original 0.7/16 pair gives BL RH ~0.66 — much drier than Jordan's
    observed mean (BL RH ~0.85) — and the round-3 sweep measured that
    under the DIAGNOSTIC condensation scheme (which, unlike prognostic
    qss, only fires at true grid-scale saturation) 72 h of WISHE fluxes
    never saturate a single column from that base: identical
    trajectories at every cap, w_max < 0.4 m/s.  rh=0.85/qv0=20 is the
    observationally honest moistening that gives the diagnostic scheme
    the same ignition chance the qss noise gives the prognostic one."""
    zs = np.linspace(0.0, 24000.0, 97)
    ztr, thtr, ttr = 15000.0, 365.0, 203.0
    theta = np.where(
        zs <= ztr,
        300.0 + (thtr - 300.0) * (zs / ztr) ** 1.25,
        thtr * np.exp(9.81 / (1004.0 * ttr) * (zs - ztr)),
    )
    # Smooth (C-inf) humidity profile: softplus knee at 1 km, 2.7 km
    # decay, super-Gaussian cutoff to ~zero above ~11 km.  Smoothness
    # matters as much as the cap: the reference-state spline/Chebyshev
    # re-integration RINGS around kinks, and at 192-205 K stratospheric
    # temperatures q_sat (~0.015 g/kg) is smaller than the ringing of a
    # kinked profile.
    x = (zs - 1000.0) / 2700.0
    qv = qv0 * np.exp(-(np.logaddexp(0.0, x) - np.logaddexp(0.0, x[0])))
    # floor at a realistic stratospheric 0.003 g/kg (~5 ppmv): EXACTLY
    # zero vapor (the super-Gaussian underflows above ~16 km) still
    # NaNs the moist state functions within steps, floor >> ringing
    qv = np.maximum(qv * np.exp(-((zs / 11000.0) ** 8)), 0.003)
    # approximate hydrostatic column -> Buck saturation -> RH cap
    kappa = 287.0 / 1004.0
    p = np.empty_like(zs)
    T = np.empty_like(zs)
    p[0] = 1015.0e2
    T[0] = theta[0] * (p[0] / 1.0e5) ** kappa
    for i in range(1, len(zs)):
        dz = zs[i] - zs[i - 1]
        Ti = theta[i] * (p[i - 1] / 1.0e5) ** kappa  # provisional
        rho = p[i - 1] / (287.0 * 0.5 * (T[i - 1] + Ti))
        p[i] = p[i - 1] - rho * 9.81 * dz
        T[i] = theta[i] * (p[i] / 1.0e5) ** kappa
    tc = T - 273.15
    es = 6.1121 * np.exp((18.678 - tc / 234.5) * tc / (257.14 + tc))  # hPa
    qsat = 622.0 * es / (p / 100.0 - es)  # g/kg
    qv = np.minimum(qv, rh * qsat)
    with open(path, "w") as f:
        f.write(f"1015.0 {theta[0]} {qv[0]}\n")
        for z, th, q in zip(zs[1:], theta[1:], qv[1:]):
            f.write(f"{z} {th} {q}\n")
    return path


def initial_vortex(r, z, vmax=12.0, rm=82.5e3):
    """RE87-style vortex, tapered to zero at the model top."""
    s = np.maximum(r, 1.0) / rm
    taper = np.cos(0.5 * np.pi * np.minimum(z / ZTOP, 1.0)) ** 2
    return vmax * s * np.exp(1.0 - s) * taper


def build_model(out_dir, num_cells=50, ts=2.0, t_end=48 * 3600.0,
                fluxes=True, stable=False, cap=None, filter_tau=0.0,
                filter_axes="l", rh=0.7, qv0=16.0, smag=0.0, ivd=False,
                cond_tau=0.0):
    from scythe_tpu import BC, ZBC, GridParameters, ModelParameters

    os.makedirs(out_dir, exist_ok=True)
    gp = GridParameters(
        geometry="RLZ",
        xmin=0.0,
        xmax=RMAX_DOM,
        num_cells=num_cells,
        lDim=4,
        zmin=0.0,
        zmax=ZTOP,
        zDim=24,
        BCL={"u": BC.R1T0, "v": BC.R1T0, "w": BC.R1T1},
        BCR={"u": BC.R1T0, "v": BC.R0},
        BCB={"s": ZBC.R1T1, "u": ZBC.R1T1, "v": ZBC.R1T1, "mu": ZBC.R1T1,
             "mu_c": ZBC.R1T1, "w": ZBC.R1T0},
        BCT={"s": ZBC.R1T1, "u": ZBC.R1T1, "v": ZBC.R1T1, "mu": ZBC.R1T1,
             "mu_c": ZBC.R1T1, "mu_r": ZBC.R1T1, "w": ZBC.R1T0},
        vars=VARS,
    )
    options = {
        "semiimplicit": True,
        "sedimentation": "active",
        "stiff_relaxation": "exp",
        "sponge_width": 100.0e3,
        "sponge_tau": 1800.0,
    }
    if stable:
        # Diagnostic condensation ONLY — measured 72 h stable here.  The
        # XYZ-shower stable PAIR does not transfer AT 10 KM CELLS: the
        # balanced vortex core spans a few cells, and the radial ∇⁴
        # modal filter damps the warm-core pressure field on a ~40 min
        # timescale; the resulting gradient-wind imbalance drives
        # spurious inflow and a moist runaway at r ~ 25 km (measured,
        # tools/probe_tc_blowup.py; docs/RESULTS.md).  At 5 km cells the
        # core spans 2x the points and the ∇⁴ factor on core scales is
        # ~16x weaker — the filter becomes admissible again (the round-3
        # sweep measures this; tools/tc_sweep.py).
        options["condensation"] = "diagnostic"
    if cond_tau > 0.0:
        # finite condensation-adjustment timescale: de-impulses the
        # saturation onset (the measured ringing-adjustment resonance;
        # scythe_tpu/physics/microphysics.py condensation_adjustment)
        options["condensation_tau"] = float(cond_tau)
    if cap is not None:
        # with --stable: the diagnostic adjustment's cap; without: the
        # PROGNOSTIC condensation-rate cap (EqContext.cap_condensation)
        # — clips the grid-storm heating spikes (measured 0.3 K/s, 10x
        # physical) while preserving the resolved WISHE heating
        options["condensation_rate_cap"] = float(cap)
    if filter_tau > 0.0:
        options["modal_filter_tau"] = float(filter_tau)
        options["modal_filter_axes"] = filter_axes
    if smag > 0.0:
        # RE87's own subgrid closure class: strain-activated nonlinear
        # eddy viscosity — the vortex-safe (r,z)-plane stabilizer the
        # modal filter cannot be on a balanced vortex
        options["smagorinsky"] = float(smag)
    if ivd:
        # backward-Euler implicit vertical diffusion: frees the closure
        # from the near-wall explicit cap (dz_min ~ 93 m caps explicit
        # K at ~90 m^2/s — an unmixed BL was the measured h32-38
        # collapse precursor: surface v = 60 m/s; docs/NUMERICS.md)
        options["implicit_vdiff"] = True
    if fluxes:
        options["surface_fluxes"] = {
            "sst": SST, "Ck": 1.2e-3, "Cd": 1.5e-3, "depth": 600.0,
            "wind_floor": 2.0,
        }
    return ModelParameters(
        ts=ts,
        integration_time=t_end,
        output_interval=2.0 * 3600.0,
        equation_set="MoistEulerRLZ",
        initial_conditions=os.path.join(out_dir, "ics.csv"),
        output_dir=out_dir,
        ref_state_file=jordan_sounding(os.path.join(out_dir, "snd.txt"),
                                       rh=rh, qv0=qv0),
        grid_params=gp,
        physical_params={"K": 50.0, "f": F_COR},
        options=options,
    )


def write_ics(model, grid, ref_state, bubble=0.0, vmax=12.0,
              moist_core=0.0, moist_core_depth=6000.0):
    """Vortex in approximate gradient balance: xi' = p'/P_xi with
    dp'/dr = rho_bar (f v + v^2/r) integrated inward from the outer
    boundary (linearized about the reference column).

    ``bubble`` (K of theta-equivalent, standard convective-initiation
    practice) adds a warm entropy anomaly centered inside the RMW at
    z = 1.5 km to trigger the first cell — the axisymmetric analog of
    the random BL noise real-case models use."""
    from scythe_tpu.physics import thermodynamics as td

    pts = grid.gridpoints()
    shape = grid.spatial_shape
    r = pts[:, 0].reshape(shape)
    z = pts[:, 2].reshape(shape)
    v0 = initial_vortex(r, z, vmax=vmax)

    rs = ref_state
    q_v, rho_d, Tk, p = (np.asarray(a) for a in td.thermodynamic_tuple(
        np.asarray(rs.sbar[:, 0]), np.asarray(rs.xibar[:, 0]),
        np.asarray(rs.mubar[:, 0])))
    rho_bar = rho_d * (1.0 + q_v)  # [nz]
    pxi = np.asarray(rs.Pxi_prof) * rho_bar  # P_xi = pxi_prof*rho(1+q) [Pa]

    r1 = r[:, 0, :]  # [nr, nz] (l-invariant)
    v1 = v0[:, 0, :]
    integrand = rho_bar[None, :] * (F_COR * v1 + v1 * v1 / np.maximum(r1, 1.0))
    # integrate inward: p'(r) = -int_r^R integrand dr'
    dp = np.zeros_like(r1)
    dr_seg = np.diff(r1, axis=0)
    seg = 0.5 * (integrand[1:, :] + integrand[:-1, :]) * dr_seg
    dp[:-1, :] = -np.cumsum(seg[::-1, :], axis=0)[::-1, :]
    xi_p = dp / pxi[None, :]

    # optional moist-envelope core (standard axisymmetric-TC
    # initialization practice, e.g. Rotunno & Emanuel 1987 follow-ons /
    # Nolan's idealized studies): raise RH toward ``moist_core`` inside
    # (r < 120 km, z < 6 km) with smooth cos^2 edges, so the eyewall
    # region can sustain convection instead of waiting ~1 day of
    # surface fluxes for the first saturated column (sweep-8 forensics:
    # cells fire but the column dries back and the vortex spins down)
    mu_core = np.zeros(shape)
    s_core = np.zeros(shape)
    if moist_core > 0.0:
        q_sat_bar = np.asarray(td.q_sat_liquid(Tk, p))  # [nz]
        envr = np.cos(0.5 * np.pi * np.minimum(r / 120.0e3, 1.0)) ** 2
        envz = np.cos(
            0.5 * np.pi * np.minimum(z / moist_core_depth, 1.0)) ** 2
        frac = moist_core * envr * envz
        q_tgt = q_v[None, None, :] + np.maximum(
            0.0, frac * (q_sat_bar[None, None, :] - q_v[None, None, :]))
        mu_core = (np.asarray(td.bhyp(q_tgt))
                   - np.asarray(td.bhyp(q_v))[None, None, :])
        # moisten at FIXED temperature: entropy carries L_v q/T, so
        # raising q_v at fixed s drops T ~10 K per 4 g/kg and the
        # "moist" core lands at RH ~2-4 (measured) — co-adjust s so the
        # core keeps the reference temperature (a higher-theta_e moist
        # envelope, which is exactly the physical intent)
        s_core = np.asarray(
            td.entropy(Tk[None, None, :], rho_d[None, None, :], q_tgt)
        ) - np.asarray(td.entropy(Tk, rho_d, q_v))[None, None, :]

    # optional warm+moist bubble trigger: ds ~ c_pd * dtheta / theta_bar
    # plus a vapor anomaly toward saturation inside the bubble (a dry warm
    # bubble in an RH ~0.83 environment LOWERS its own relative humidity;
    # the round-4 bubble run needed 34 h of surface fluxes before any
    # saturation — standard convective initiation moistens the trigger)
    s_pert = np.zeros(shape)
    mu_pert = np.zeros(shape)
    if bubble > 0.0:
        rad = np.sqrt(((r - 60.0e3) / 30.0e3) ** 2
                      + ((z - 1500.0) / 1500.0) ** 2)
        env = np.maximum(
            0.0, np.cos(0.5 * np.pi * np.minimum(rad, 1.0))) ** 2
        s_pert = (1004.0 * bubble / 300.0) * env
        q_sat_bar = np.asarray(td.q_sat_liquid(Tk, p))  # [nz]
        q_bub = q_v[None, None, :] + 0.95 * env * (
            q_sat_bar[None, None, :] - q_v[None, None, :])
        mu_pert = np.asarray(td.bhyp(np.maximum(q_bub, q_v[None, None, :]))
                             ) - np.asarray(td.bhyp(q_v))[None, None, :]

    names = list(model.grid_params.vars)
    with open(model.initial_conditions, "w") as f:
        f.write("r,l,z," + ",".join(names) + "\n")
        lam = pts[:, 1]
        v_flat = v0.ravel()
        s_flat = (s_pert + s_core).ravel()
        mu_flat = (mu_pert + mu_core).ravel()
        xi_flat = np.broadcast_to(xi_p[:, None, :], shape).ravel()
        for i in range(pts.shape[0]):
            vals = {"v": v_flat[i], "xi": xi_flat[i], "s": s_flat[i],
                    "mu": mu_flat[i]}
            f.write(
                f"{pts[i,0]},{lam[i]},{pts[i,2]},"
                + ",".join(str(vals.get(n, 0.0)) for n in names) + "\n"
            )


def intensity(grid, phys, ref_state=None):
    """(vmax, r_vmax km, w_max, qr_max, qc_max g/kg, RH_max below ~8 km,
    u_min = strongest BL inflow).  The moisture/RH columns diagnose WHY
    cells live or die (sweep-8 forensics need them in every log)."""
    from scythe_tpu.physics import thermodynamics as td

    sh = grid.spatial_shape
    v = phys[4].reshape(sh)
    w = phys[5].reshape(sh)
    qr = phys[7].reshape(sh)
    qc = phys[6].reshape(sh)
    vmax = float(v.max())
    r_at = grid.gridpoints()[:, 0].reshape(sh)
    j = np.unravel_index(v.argmax(), v.shape)
    rh_max = float("nan")
    if ref_state is not None:
        rs = ref_state
        s_t = phys[0].reshape(sh) + np.asarray(rs.sbar[:, 0])[None, None, :]
        xi_t = phys[1].reshape(sh) + np.asarray(rs.xibar[:, 0])[None, None, :]
        mu_t = phys[2].reshape(sh) + np.asarray(rs.mubar[:, 0])[None, None, :]
        q_v, _, Tk, pp = (np.asarray(a) for a in
                          td.thermodynamic_tuple(s_t, xi_t, mu_t))
        qs = np.asarray(td.q_sat_liquid(Tk, pp))
        z = np.asarray(grid.z_mish)
        low = z < 8000.0
        rh_max = float((q_v[..., low] / qs[..., low]).max())
    u_min = float(phys[3].reshape(sh)[..., 0].min())
    return (vmax, float(r_at[j]) / 1000.0, float(w.max()),
            float(np.maximum(qr, 0).max()),
            float(np.maximum(np.asarray(td.ahyp(qc)), 0).max()),
            rh_max, u_min)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--hours", type=float, default=48.0)
    ap.add_argument("--cells", type=int, default=50)
    ap.add_argument("--no-fluxes", action="store_true")
    ap.add_argument("--stable", action="store_true",
                    help="diagnostic condensation (measured 72 h stable; "
                    "see build_model comment for the filter caveats)")
    ap.add_argument("--cap", type=float, default=None,
                    help="condensation rate cap kg/kg/s (diagnostic "
                    "default 2e-4; also caps the prognostic rate)")
    ap.add_argument("--filter-tau", type=float, default=0.0,
                    help="modal filter e-folding time (0 = off)")
    ap.add_argument("--filter-axes", default="l",
                    help="modal filter axes subset of 'rlz' (default 'l')")
    ap.add_argument("--ts", type=float, default=2.0)
    ap.add_argument("--out", default="./tc_intensification_out")
    ap.add_argument("--rh", type=float, default=0.7,
                    help="sounding RH cap (0.85 = Jordan-like moist BL)")
    ap.add_argument("--qv0", type=float, default=16.0,
                    help="surface vapor mixing ratio g/kg before RH cap")
    ap.add_argument("--bubble", type=float, default=0.0,
                    help="warm+moist bubble trigger amplitude (K "
                    "theta-equiv; also moistens the bubble to ~RH 0.95)")
    ap.add_argument("--cond-tau", type=float, default=0.0,
                    help="diagnostic condensation adjustment timescale s "
                    "(0 = per-step full adjustment)")
    ap.add_argument("--vmax", type=float, default=12.0,
                    help="initial vortex maximum wind (m/s)")
    ap.add_argument("--moist-core", type=float, default=0.0,
                    help="raise core RH toward this fraction of "
                    "saturation inside (r<120 km, z<depth), smooth edges")
    ap.add_argument("--moist-core-depth", type=float, default=6000.0,
                    help="vertical extent (m) of the moist envelope")
    ap.add_argument("--smag", type=float, default=0.0,
                    help="Smagorinsky Cs (0.18-0.25 classic; 0 = off)")
    ap.add_argument("--ivd", action="store_true",
                    help="implicit vertical diffusion (uncapped vertical "
                    "closure; options['implicit_vdiff'])")
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
    from scythe_tpu import timeintegration as ti
    from scythe_tpu.io import read_physical_grid
    from scythe_tpu.model import (_pick_chunk, build_context, build_step,
                                  default_dtype, make_scan)

    out = args.out
    model = build_model(out, num_cells=args.cells, ts=args.ts,
                       t_end=args.hours * 3600.0,
                       fluxes=not args.no_fluxes, stable=args.stable,
                       cap=args.cap, filter_tau=args.filter_tau,
                       filter_axes=args.filter_axes, rh=args.rh,
                       qv0=args.qv0, smag=args.smag, ivd=args.ivd,
                       cond_tau=args.cond_tau)
    dtype = default_dtype()
    grid = create_grid(model.grid_params, dtype)
    ctx = build_context(model, grid, dtype)
    write_ics(model, grid, ctx.ref_state, bubble=args.bubble,
              vmax=args.vmax, moist_core=args.moist_core,
              moist_core_depth=args.moist_core_depth)
    phys0 = read_physical_grid(model.initial_conditions, grid)
    spec0 = grid.analysis(jnp.asarray(phys0, dtype))
    # sponge reference = filtered initial state (far field)
    ctx.extras["sponge_ref"] = grid.synthesis(spec0)["val"]
    state = ti.initial_state(spec0, (grid.nvars,) + grid.spatial_shape, dtype,
                             imp_rows=2)
    step = build_step(model, grid, ctx, dtype)
    per = int(round(2.0 * 3600.0 / model.ts))
    chunk = _pick_chunk(per)
    scan = make_scan(step, chunk)
    print("hour  vmax(m/s)  r_vmax(km)  w_max   qr_max  qc_max"
          "  rh_max  u_sfc_min")
    phys = np.asarray(grid.synthesis(state.spec)["val"])
    vm, rm, wm, qm, qc, rh, um = intensity(grid, phys, ctx.ref_state)
    print(f"{0:5.1f} {vm:9.2f} {rm:10.1f} {wm:7.2f} {qm*1e3:7.2f} "
          f"{qc*1e3:7.2f} {rh:7.3f} {um:9.2f}", flush=True)
    hours = 0.0
    while hours < args.hours - 1e-6:
        for _ in range(per // chunk):
            state = scan(state)
        if per % chunk:
            state = make_scan(step, per % chunk)(state)
        hours += 2.0
        phys = np.asarray(grid.synthesis(state.spec)["val"])
        if not np.isfinite(phys).all():
            print(f"NONFINITE at hour {hours}")
            break
        vm, rm, wm, qm, qc, rh, um = intensity(grid, phys, ctx.ref_state)
        print(f"{hours:5.1f} {vm:9.2f} {rm:10.1f} {wm:7.2f} {qm*1e3:7.2f} "
              f"{qc*1e3:7.2f} {rh:7.3f} {um:9.2f}", flush=True)


if __name__ == "__main__":
    main()
