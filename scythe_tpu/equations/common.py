"""Equation-set interface and registry.

An equation set is a pure function ``f(fields, ctx) -> EqResult`` computing
pointwise tendencies from the synthesized physical fields (value + all
derivative slots).  This replaces the reference's per-column mutating
functions dispatched by name (ref physical_model,
src/semiimplicit.jl:357-363); dispatch by name is preserved via REGISTRY so
``ModelParameters.equation_set`` strings match the reference.

``fields`` is a dict with keys val/dr/drr(/dl/dll)(/dz/dzz), each
``[nvars, *spatial]``.  ``EqResult.overrides`` lets a set overwrite a
diagnostic variable's physical value before the explicit step (the
reference writes diagnostics straight into grid.physical, e.g. the slab
boundary-layer w, src/shallowWaterModels.jl:60-67).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

import jax.numpy as jnp

REGISTRY: dict[str, Callable] = {}


def equation_set(name: str | None = None, geometry: str | None = None):
    def deco(fn):
        fn.geometry = geometry
        REGISTRY[name or fn.__name__] = fn
        return fn

    return deco


@dataclass
class EqContext:
    """Static per-run context handed to equation sets."""

    grid: Any
    coords: dict[str, jnp.ndarray]
    params: dict[str, float]  # physical_params (ref model.physical_params)
    options: dict[str, Any]
    ts: float
    var_index: Callable[[str], int]
    ref_state: Any = None  # physics.reference_state.ReferenceState or None
    extras: dict = field(default_factory=dict)

    def p(self, key: str, default=None) -> float:
        if default is None:
            return self.params[key]
        return self.params.get(key, default)

    def vertical_pgf(self, coeffs, s_z, xi_z, qv_z, default_exact=True):
        """Perturbation-form vertical pressure gradient dp'/dz.

        ``coeffs`` = (P_s, P_xi, P_qv) at the LOCAL state
        (td.pressure_gradient_coeffs); ``s_z``/``xi_z``/``qv_z`` are the
        PERTURBATION vertical derivatives.

        The EXACT form: the chain rule gives dp/dz = P(local)·(pert_z +
        bar_z), so the perturbation gradient is that minus the reference
        column's own discrete gradient P(bar)·bar_z
        (td.reference_pgf_columns).  The correction vanishes identically
        on the reference column and is second-order small for isobaric
        (bubble-type) perturbations — P_s and P_xi are both ~∝ p — but
        first-order in the local PRESSURE departure from the column:
        measured 1.9 m/s^2 of spurious w forcing on the
        Jablonowski-Williamson (2006) pole-to-pole state and O(0.1
        m/s^2) on a mature TC warm core.  The reference omits the term
        (testModels.jl:552 builds dpdz from perturbation derivatives
        alone).

        Defaults per equation-set family (``default_exact``):

        * beyond-reference MoistEuler* sets: EXACT, disabled by
          ``options['reference_quirks']``.  Verified for their
          cloud-free reference columns (the JW06 imbalance measurement).
        * reference-parity sets (Euler_test/BF02_test/rainfall_test):
          reference-faithful, enabled by
          ``options['exact_vertical_pgf']``.  Kept faithful because the
          published BF02 validation (docs/RESULTS.md) holds in that form
          (w_max -> 14.09 vs published ~14.3), while the exact form on
          BF02's CLOUDY reference column (mu_lbar > 0, whose base
          liquid is excluded from the sets' rhobar) measured w_max
          running 14.5 -> 18.3 with resolution — the exact/cloudy
          combination is not yet a validated pairing."""
        from ..physics import thermodynamics as td

        Ps, Pxi, Pqv = coeffs
        base = Ps * s_z + Pxi * xi_z + Pqv * qv_z
        if default_exact:
            exact = not self.options.get("reference_quirks")
        else:
            exact = bool(self.options.get("exact_vertical_pgf"))
        if not exact:
            return base
        rs = self.ref_state
        qbar_z, pgf_bar = td.reference_pgf_columns(rs)
        # [nz] columns broadcast over the trailing (z-last) spatial axis
        return base + (
            Ps * rs.sbar[:, 1] + Pxi * rs.xibar[:, 1] + Pqv * qbar_z
            - pgf_bar
        )

    def stiff_rate(self, rate):
        """Stability limiter for explicit linear relaxation rates (the qss
        condensation/evaporation taus).  Default: identity — the reference
        integrates ``-qss*rate`` explicitly, which is unstable once
        ts*rate exceeds the AB3 real-axis limit (~0.545).  Since
        invtau_condensation ~ 1/p, deep cold columns cross that limit
        aloft (measured: the 20 km-lid blow-up previously misattributed
        to the semi-implicit acoustic split, docs/RESULTS.md).  With
        options['stiff_relaxation']='exp', the exponential-integrator
        effective rate (1-exp(-rate*ts))/ts, capped at 0.4/ts for AB3
        safety: equal to ``rate`` in the resolved limit, unconditionally
        stable in the stiff limit, where it represents relaxation to the
        same quasi-equilibrium over ~2 steps instead of instantaneously.
        Pass the SAME limited rate everywhere the loop's rate appears
        (relaxation term and q_cond/q_evap sources) so equilibria are
        rate-ratio invariant."""
        if self.options.get("stiff_relaxation") != "exp":
            return rate
        return jnp.minimum(-jnp.expm1(-rate * self.ts), 0.4) / self.ts

    def pxi_si(self):
        """Coefficient of the semi-implicit acoustic term -Pxi xi_z.
        Default: the reference's column-mean scalar (ref
        reference_state.jl:127-133).  With options['si_mode']='variable',
        the full per-level profile [zDim] (broadcasts over the z-last
        spatial axes) — the implicit vertical operator then carries the
        reference column's real height-varying acoustics, lifting the
        deep-column timestep ceiling (docs/NUMERICS.md).  Must match the
        coefficient baked into the Helmholtz solve (model.build_step keys
        both off the same option).

        ``options['si_scale']`` (default 1.0) multiplies the implicit
        coefficient — the Simmons-Hoskins-Burridge (1978) robustness
        rule: semi-implicit splitting is stable when the implicit
        reference acoustics EXCEED the local ones everywhere, so a
        horizontally inhomogeneous atmosphere (e.g. a pole-to-pole
        baroclinic state whose polar P_xi/rho runs ~30% above the
        reference column's) needs the coefficient inflated to the
        domain max rather than the column mean.  Measured: the JW06
        steady state is explosively unstable (e-fold ~4 min at the
        polar stratosphere) at si_scale 1 and clean at 1.5
        (examples/jw06_baroclinic_slz.py)."""
        scale = float(self.options.get("si_scale", 1.0))
        if self.options.get("si_mode", "constant") == "variable":
            return scale * self.ref_state.Pxi_prof
        return scale * self.ref_state.Pxi_bar

    def cap_condensation(self, q_cond):
        """Optional symmetric cap on the PROGNOSTIC condensation RATE
        [kg/kg/s] (``options['condensation_rate_cap']`` — the same key
        the diagnostic scheme's post-step adjustment uses).  The
        measured grid-storm runaway heats at ~0.3 K/s (L q_cond / cp —
        10x any physical eyewall); a cap of a few 1e-5 kg/kg/s (~100-300
        K/h) preserves the resolved WISHE heating while clipping the
        spectral-ringing spikes that drive the
        intensifies-then-collapses failure mode (docs/RESULTS.md TC
        sweeps).  No-op when unset or under diagnostic condensation
        (which owns the cap in condensation_adjustment)."""
        if self.options.get("condensation") == "diagnostic":
            return q_cond
        cap = self.options.get("condensation_rate_cap")
        if cap is None:
            return q_cond
        cap = float(cap)
        return jnp.clip(q_cond, -cap, cap)

    def sedimentation(self, q_r, rho_d, Tk):
        """Rain terminal velocity.  Default: the reference's always-zero
        clamp quirk (microphysics.sedimentation).  With
        ``options['sedimentation'] = 'active'``, the unclamped (negative,
        downward) formula — required for long moist-convection runs,
        where the quirk accumulates unbounded rain water (measured,
        docs/RESULTS.md)."""
        from ..physics import microphysics as mp

        if self.options.get("sedimentation") == "active":
            return mp.sedimentation_active(q_r, rho_d, Tk)
        return mp.sedimentation(q_r, rho_d, Tk)

    def dmudq_source(self, mu, q):
        """q->mu source-term Jacobian.  Default: the clamped stability
        guard (physics/thermodynamics.dmudq_source).  With
        ``options['reference_quirks']`` set, the reference's raw Jacobian
        is used instead (microphysics.jl; testModels.jl:363) so parity
        runs compare like-for-like — at the cost of the documented
        mu<0 blow-up mode (PARITY.md quirk table)."""
        from ..physics import thermodynamics as td

        if self.options.get("reference_quirks"):
            return td.dmudq(mu, q)
        return td.dmudq_source(mu, q)


@dataclass
class EqResult:
    expdot: jnp.ndarray  # [nvars, *spatial]
    impdot: jnp.ndarray | None = None
    overrides: dict[int, jnp.ndarray] = field(default_factory=dict)
    # total vertical eddy viscosity [*spatial] for the implicit vertical
    # diffusion solve (options['implicit_vdiff']); None when the option
    # is off (the set then keeps its explicit K*dzz term)
    k_v: jnp.ndarray | None = None


def get_equation_set(name: str) -> Callable:
    # import submodules lazily so registration side effects happen
    from . import shallow_water, sphere, tcbl, test_models  # noqa: F401

    if name not in REGISTRY:
        raise KeyError(
            f"Unknown equation_set {name!r}; known: {sorted(REGISTRY)}"
        )
    return REGISTRY[name]


def stack_tendencies(nvars: int, shape, dtype, terms: dict[int, jnp.ndarray]):
    """Assemble [nvars, *spatial] from a {var_index: tendency} mapping."""
    rows = [
        terms.get(v, jnp.zeros(shape, dtype)) for v in range(nvars)
    ]
    return jnp.stack(rows, axis=0)
