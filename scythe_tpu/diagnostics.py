"""Derived diagnostic fields.

The reference computes no diagnostics itself (analysis happens in notebooks
downstream), but the BASELINE correctness gate names vorticity among the
compared prognostic/derived fields, so the standard cylindrical operators
live here.  All functions take the synthesized ``fields`` dict of a grid
(value + derivative slots) and variable indices.
"""

from __future__ import annotations

import jax.numpy as jnp


def relative_vorticity(fields, r, u_idx: int, v_idx: int) -> jnp.ndarray:
    """zeta = v/r + dv/dr - (1/r) du/dlambda  (cylindrical z-vorticity)."""
    v = fields["val"][v_idx]
    vr = fields["dr"][v_idx]
    ul = fields["dl"][u_idx]
    return v / r + vr - ul / r


def divergence(fields, r, u_idx: int, v_idx: int) -> jnp.ndarray:
    """div = u/r + du/dr + (1/r) dv/dlambda."""
    u = fields["val"][u_idx]
    ur = fields["dr"][u_idx]
    vl = fields["dl"][v_idx]
    return u / r + ur + vl / r


def okubo_weiss(fields, r, u_idx: int, v_idx: int) -> jnp.ndarray:
    """OW = s_n^2 + s_s^2 - zeta^2 (strain vs rotation)."""
    u = fields["val"][u_idx]
    ur = fields["dr"][u_idx]
    ul = fields["dl"][u_idx]
    v = fields["val"][v_idx]
    vr = fields["dr"][v_idx]
    vl = fields["dl"][v_idx]
    sn = ur - (u + vl) / r
    ss = vr - v / r + ul / r
    zeta = v / r + vr - ul / r
    return sn * sn + ss * ss - zeta * zeta


def kinetic_energy(fields, u_idx: int, v_idx: int) -> jnp.ndarray:
    u = fields["val"][u_idx]
    v = fields["val"][v_idx]
    return 0.5 * (u * u + v * v)
