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
        both off the same option)."""
        if self.options.get("si_mode", "constant") == "variable":
            return self.ref_state.Pxi_prof
        return self.ref_state.Pxi_bar

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
