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
