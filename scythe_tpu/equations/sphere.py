"""Global shallow-water equations on the SL spherical shell.

Beyond the reference (which is a limited-area cylindrical-grid core):
the standard rotating-sphere shallow-water system in advective form,
validated against the Williamson et al. (1992) test suite
(tests/test_sphere.py: case 2 steady geostrophic flow, case 6
Rossby-Haurwitz wave) — the canonical global dynamical-core benchmarks.

Vars: h (fluid depth, full field), u (eastward), v (northward).
Slots on an SL grid: dr = d/dphi (latitude), dl = d/dlambda (longitude
angle); metric factors divide by a*cos(phi) at point of use, mirroring
the polar-grid convention (grids/base.py SL note).

    h_t = -U h_lam - V h_phi - h * div
    u_t = -U u_lam - V u_phi + (f + u tan(phi)/a) v - g/(a cos) h_lam
    v_t = -U v_lam - V v_phi - (f + u tan(phi)/a) u - (g/a) h_phi
    div = u_lam/(a cos) + v_phi/a - v tan(phi)/a
    U = u/(a cos), V = v/a, f = 2 Omega sin(phi)

Optional Laplacian-style diffusion via physical_params['K'] (m^2/s).
"""

from __future__ import annotations

import jax.numpy as jnp

from .common import EqContext, EqResult, equation_set, stack_tendencies


@equation_set(geometry="SL")
def ShallowWaterSphere(fields, ctx: EqContext) -> EqResult:
    g = ctx.p("g", 9.80616)
    Omega = ctx.p("Omega", 7.292e-5)
    K = ctx.p("K", 0.0)
    a = ctx.grid.params.sphere_radius
    phi = ctx.coords["lat"]
    cosp = jnp.cos(phi)
    tanp = jnp.tan(phi)
    f_cor = 2.0 * Omega * jnp.sin(phi)

    val, dp, dpp, dl, dll = (
        fields["val"],
        fields["dr"],
        fields["drr"],
        fields["dl"],
        fields["dll"],
    )
    h, u, v = val[0], val[1], val[2]
    U = u / (a * cosp)  # d/dlambda advection factor
    V = v / a

    div = dl[1] / (a * cosp) + dp[2] / a - v * tanp / a
    curv = f_cor + u * tanp / a

    exp = {}
    exp[0] = -U * dl[0] - V * dp[0] - h * div
    exp[1] = -U * dl[1] - V * dp[1] + curv * v - (g / (a * cosp)) * dl[0]
    exp[2] = -U * dl[2] - V * dp[2] - curv * u - (g / a) * dp[0]
    # optional bottom topography (Williamson case 5): h is fluid DEPTH,
    # the momentum PGF acts on the free surface h + h_s.  The example
    # supplies ctx.extras["hs_grad"] = [2, rDim, nl] (d/dphi, d/dlambda
    # of h_s, spectrally filtered) before build_step.
    hs_grad = ctx.extras.get("hs_grad")
    if hs_grad is not None:
        exp[1] = exp[1] - (g / (a * cosp)) * hs_grad[1]
        exp[2] = exp[2] - (g / a) * hs_grad[0]
    if K > 0.0:
        aa = a * a
        for i in range(3):
            exp[i] = exp[i] + K * (
                dpp[i] / aa + dll[i] / (aa * cosp * cosp) - tanp * dp[i] / aa
            )
    sh, dt = h.shape, h.dtype
    return EqResult(expdot=stack_tendencies(ctx.grid.nvars, sh, dt, exp))


@equation_set(geometry="SL")
def AdvectionSphere(fields, ctx: EqContext) -> EqResult:
    """Solid-body-rotation tracer advection on the sphere (Williamson
    case 1): h advected by the prescribed wind at angle ``alpha`` to the
    polar axis.  ``alpha = pi/2`` sends the flow DIRECTLY over both
    poles — the acid test of the a*cos(lat) ring-mask pole treatment.

        u = u0 (cos(phi) cos(alpha) + sin(phi) cos(lambda) sin(alpha))
        v = -u0 sin(lambda) sin(alpha)

    Vars: h (tracer; u, v are diagnostic/ignored if present).
    physical_params: u0 [m/s], alpha [rad].
    """
    u0 = ctx.p("u0")
    alpha = ctx.p("alpha", 0.0)
    a = ctx.grid.params.sphere_radius
    phi = ctx.coords["lat"]
    lam = ctx.coords["lon"]
    cosp = jnp.cos(phi)
    u = u0 * (cosp * jnp.cos(alpha) + jnp.sin(phi) * jnp.cos(lam) * jnp.sin(alpha))
    v = -u0 * jnp.sin(lam) * jnp.sin(alpha)
    dh = -(u / (a * cosp)) * fields["dl"][0] - (v / a) * fields["dr"][0]
    sh, dt = dh.shape, dh.dtype
    return EqResult(
        expdot=stack_tendencies(ctx.grid.nvars, sh, dt, {0: dh})
    )


@equation_set(geometry="SLZ")
def MoistEulerSLZ(fields, ctx: EqContext) -> EqResult:
    """Global 3-D moist compressible core on the SLZ spherical shell —
    pole to pole, with warm rain and the semi-implicit vertical acoustic
    solve.

    The spherical (shallow-atmosphere) sibling of MoistEulerRLZ: the
    same (s, xi, mu) perturbation thermodynamics vs a hydrostatic
    reference state, Ooyama microphysics, AI2* vertical acoustics, with
    the cylindrical metric terms replaced by spherical ones (1/r ->
    tan(phi)/a curvature, 1/(a cos(phi)) zonal metric, f = 2 Omega
    sin(phi)).  No reference counterpart at any level: the reference is
    a limited-area cylindrical-grid core.

    Vars: s xi mu u v w mu_c mu_r qss  (u eastward, v northward, w up).
    physical_params: K [m^2/s], Omega [1/s] (default Earth's).
    """
    from ..physics import microphysics as mp
    from ..physics import thermodynamics as td

    K = ctx.p("K")
    Omega = ctx.p("Omega", 7.292e-5)
    a = ctx.grid.params.sphere_radius
    rs = ctx.ref_state
    phi = ctx.coords["lat"]
    cosp = jnp.cos(phi)
    tanp = jnp.tan(phi)
    f_cor = 2.0 * Omega * jnp.sin(phi)

    val, dp, dpp, dl, dll, dz, dzz = (
        fields["val"],
        fields["dr"],
        fields["drr"],
        fields["dl"],
        fields["dll"],
        fields["dz"],
        fields["dzz"],
    )
    s, xi, mu = val[0], val[1], val[2]
    u, v, w = val[3], val[4], val[5]
    mu_c, mu_r, qss = val[6], val[7], val[8]

    sbar_z = rs.sbar[None, None, :, 1]
    xibar_z = rs.xibar[None, None, :, 1]
    mubar_z = rs.mubar[None, None, :, 1]
    q_v, rho_d, Tk, p = td.thermodynamic_tuple(
        s + rs.sbar[None, None, :, 0],
        xi + rs.xibar[None, None, :, 0],
        mu + rs.mubar[None, None, :, 0],
    )
    mu_total = mu + rs.mubar[None, None, :, 0]
    q_c = td.ahyp(mu_c)
    q_r = td.ahyp(mu_r)
    q_l = q_c + q_r
    rho_t = rho_d * (1.0 + q_v + q_l)
    mu_fac = td.dmudq(mu_total, q_v)
    rhobar = td.dry_density(rs.xibar[None, None, :, 0]) * (
        1.0
        + td.ahyp(rs.mubar[None, None, :, 0])
        + td.ahyp(rs.mu_lbar[None, None, :, 0])
    )
    rho_p = rho_t - rhobar

    # vectorized advection + spherical Laplacian-style diffusion over the
    # full variable tensor (the MoistEulerRLZ pattern with spherical
    # metrics); barz rows 3.. are zero and x - w*0 == x exactly
    u3, v3, w3 = val[3:4], val[4:5], val[5:6]
    zrow = jnp.zeros_like(sbar_z)
    barz = jnp.stack(
        [sbar_z, xibar_z, mubar_z, zrow, zrow, zrow, zrow, zrow, zrow]
    )
    adv_all = (
        -(u3 / (a * cosp)) * dl - (v3 / a) * dp - w3 * dz - w3 * barz
    )
    lap_mask = jnp.asarray(
        [1.0, 0.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 0.0], dp.dtype
    )[:, None, None, None]
    aa = a * a
    # optional Smagorinsky closure (physics/turbulence.py), spherical
    # metric-scaled derivatives; curvature terms of the strain omitted.
    # options['implicit_vdiff'] moves the vertical K*dzz term into the
    # backward-Euler column solve (model.build_implicit_vdiff).
    # physical_params['K_v']: separate constant VERTICAL diffusivity
    # (default = K).  On planetary grids the horizontal spacing is
    # O(100 km) while the vertical is O(1 km), so the isotropic-K
    # default badly miscalibrates vertical mixing; K_v = 0 with free
    # (R0) vertical fits is the standard dry-core configuration
    # (examples/jw06_baroclinic_slz.py).
    K_v_const = float(ctx.p("K_v", K))
    cs = float(ctx.options.get("smagorinsky", 0.0) or 0.0)
    ivd = bool(ctx.options.get("implicit_vdiff"))
    # options['smagorinsky_axes']: 'rlz' (default, isotropic closure) or
    # 'rl' (horizontal-only — the dry-core breaking-front configuration:
    # 2-D strain, horizontal Delta/cap, NO vertical mixing, so R0-fit
    # vertical fields stay admissible.  The JW06 baroclinic front is the
    # motivating case: the latitude modal filter is structurally
    # unusable on the shell, docs/RESULTS.md "JW06 endgame").
    smag_h = str(ctx.options.get("smagorinsky_axes", "rlz")) == "rl"
    K_eff, Kz_eff, k_v = K, K_v_const, (K_v_const if ivd else None)
    if cs > 0.0:
        from ..physics import turbulence as tb

        acl = a * cosp
        k_t = tb.smagorinsky_viscosity(
            ctx.grid, ctx.ts, cs,
            (dp[3] / a, dl[3] / acl, dz[3]),
            (dp[4] / a, dl[4] / acl, dz[4]),
            (dp[5] / a, dl[5] / acl, dz[5]), dp.dtype,
            n2=None if smag_h else (td.GRAVITY / td.Cpd) * (dz[0] + sbar_z),
            split_vertical=ivd and not smag_h,
            horizontal_only=smag_h,
        )
        if smag_h:
            K_eff = K + k_t
        elif ivd:
            K_eff, k_v = K + k_t[0], K_v_const + k_t[1]
        else:
            K_eff, Kz_eff = K + k_t, K_v_const + k_t
    horiz = dpp / aa + dll / (aa * cosp * cosp) - tanp * dp / aa
    if ivd:
        lap_all = lap_mask * (K_eff * horiz)
    elif K_v_const == K and not smag_h:
        # single-multiply form, bitwise-identical to the pre-K_v path
        lap_all = lap_mask * (K_eff * (horiz + dzz))
    else:
        lap_all = lap_mask * (K_eff * horiz + Kz_eff * dzz)
    # optional horizontal del^4 hyperdiffusion (beyond-reference; the
    # published global dry cores all carry one): dq/dt -= K4*lap(lap q).
    # The second Laplacian comes from FITTING the first (one extra
    # analysis+synthesis round trip) — the fit re-imposes the ring
    # masks, so the pole rings stay in their resolved subspace.  Built
    # for the surface baroclinic shortwave catastrophe of the l_q=0
    # JW06 shell (round 5, tools/jw06_r5_probe.py): grid-scale Eady
    # edge waves grow on ~hour e-folds at the surface and del^2 K=1e5
    # damps k~20 on ~3-day timescales; K4 ~ 5e16 m^4/s kills the grid
    # scale in ~30 min while leaving the k=8 wave a ~25-day e-fold.
    k4 = float(ctx.options.get("hyperdiffusion_k4", 0.0) or 0.0)
    if k4 > 0.0:
        # explicit-stability guard (trace-time): DIAGONAL 2-grid modes
        # see 4x the 1-D del^4 damping rate, and the AB3 real-axis
        # stability limit is ~0.545 — K4 = 5e16 at 48 cells/ts 15 sat
        # at 0.78 and detonated after ~3 days with no precursor
        # (jw06_r5_probe4.log h78).  Fail loudly instead.
        dx_lat = float(jnp.pi) * float(a) / dp.shape[1]
        cfl4 = k4 * (2.0 * (float(jnp.pi) / dx_lat) ** 2) ** 2 * ctx.ts
        if cfl4 > 0.5:
            raise ValueError(
                f"hyperdiffusion_k4: diagonal del^4 CFL {cfl4:.2f} > 0.5 "
                f"(K4={k4:.2e}, dx_lat={dx_lat/1e3:.0f} km, ts={ctx.ts}); "
                "reduce K4 or ts"
            )
        f2 = ctx.grid.synthesis(ctx.grid.analysis(horiz))
        horiz2 = (
            f2["drr"] / aa
            + f2["dll"] / (aa * cosp * cosp)
            - tanp * f2["dr"] / aa
        )
        lap_all = lap_all - lap_mask * (k4 * horiz2)

    # perturbation pressure gradients in all three directions (shared
    # local coefficients), with the vertical carrying the exact
    # reference-gradient cross term (td.reference_pgf_columns): without
    # it the perturbation form is only balanced NEAR the reference
    # column — on a pole-to-pole baroclinic state it measured 1.9 m/s^2
    # of spurious w forcing (docs/NUMERICS.md)
    coeffs = td.pressure_gradient_coeffs(Tk, rho_d, q_v)
    Ps, Pxi, Pqv = coeffs
    dpd_phi = Ps * dp[0] + Pxi * dp[1] + Pqv * (dp[2] / mu_fac)
    dpd_lam = Ps * dl[0] + Pxi * dl[1] + Pqv * (dl[2] / mu_fac)
    dpd_z = ctx.vertical_pgf(coeffs, dz[0], dz[1], dz[2] / mu_fac)

    N_c, r_c = 100.0, 10.0
    cloudtau = ctx.stiff_rate(mp.invtau_condensation(Tk, p, N_c, r_c))
    raintau = ctx.stiff_rate(mp.rain_evaporation(q_r, rho_d, Tk, p))
    q_cond = mp.q_condensation(qss, Tk, p, q_v, q_l, N_c, r_c, invtau=cloudtau)
    q_cond = ctx.cap_condensation(q_cond)
    s_cond = mp.s_condensation(q_cond, Tk, rho_d, q_v, q_l, p)
    q_evap = -qss * raintau
    if ctx.options.get("condensation") == "diagnostic":
        # phase change handled by the post-step full saturation adjustment
        # (condensation_adjustment, same option); rain evaporation becomes
        # the Kessler-style subsaturation form.  s needs no extra source:
        # s is moist entropy, conserved under phase change up to the
        # irreversible correction the adjustment applies.
        q_cond = jnp.zeros_like(Tk)
        s_cond = jnp.zeros_like(Tk)
        q_evap = raintau * jnp.maximum(td.q_sat_liquid(Tk, p) - q_v, 0.0)
    q_auto = mp.autoconversion(q_c, rho_d)
    q_coll = mp.collection(q_c, q_r, rho_d, Tk)
    Vt = ctx.sedimentation(q_r, rho_d, Tk)
    Vt_flux = ctx.grid.column_flux_derivative(q_r * Vt) / rho_d
    Cm = (q_l * td.Cl) / (td.Cvd + q_v * td.Cvv + q_l * td.Cl)
    div3 = dl[3] / (a * cosp) + dp[4] / a - v * tanp / a + dz[5]
    s_div = Cm * (td.Rd + q_v * td.Rv) * div3
    qss_cond = (
        mp.dqsdp(Tk, p, rho_d, q_v, q_l)
        * (
            (u / (a * cosp)) * dpd_lam
            + (v / a) * dpd_phi
            + w * (dpd_z - rhobar * td.GRAVITY)
        )
        - qss * (cloudtau + raintau)
    )
    curv = f_cor + u * tanp / a

    nvars = ctx.grid.nvars
    sh, dt = u.shape, u.dtype
    extra, imp = {}, {}
    extra[0] = s_cond + s_div
    extra[1] = -div3
    imp[1] = -dz[5]
    extra[2] = mu_fac * (q_evap - q_cond)
    imp[2] = q_v
    # NB momentum diffusion here is the plain component-wise scalar
    # Laplacian: the vector-Laplacian metric corrections (the spherical
    # analogue of RLZ's -K u/r^2) are O(K/(a^2 cos^2 phi)) — negligible
    # at planetary radius outside the masked pole rings — and are
    # deliberately omitted.
    extra[3] = curv * v - dpd_lam / (a * cosp * rho_t)
    extra[4] = -curv * u - dpd_phi / (a * rho_t)
    extra[5] = ((-td.GRAVITY * rho_p) - dpd_z) / rho_t
    imp[5] = -(ctx.pxi_si() * dz[1])
    extra[6] = ctx.dmudq_source(mu_c, q_c) * (q_cond - q_auto - q_coll)
    extra[7] = ctx.dmudq_source(mu_r, q_r) * (
        q_auto + q_coll - q_evap - Vt_flux
    )
    extra[8] = qss_cond
    imp[8] = qss
    return EqResult(
        expdot=adv_all + lap_all + stack_tendencies(nvars, sh, dt, extra),
        impdot=stack_tendencies(nvars, sh, dt, imp),
        k_v=jnp.broadcast_to(jnp.asarray(k_v, dt), sh) if ivd else None,
    )
