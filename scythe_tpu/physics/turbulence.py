"""Smagorinsky-type nonlinear eddy viscosity (beyond-reference).

The standard convection-permitting subgrid closure (Smagorinsky 1963;
every production cloud model carries a variant): K_t = (Cs*Delta)^2 |S|,
with |S| the strain-rate magnitude.  The reference has only constant
nabla^2 K diffusion, which the mature-cell collapse forensics showed
cannot be raised enough to control a grid-point storm
(docs/RESULTS.md).  Here the closure reuses the first-derivative slots
the transforms already produce (zero extra transforms), is applied as
(K + K_t) * laplacian (the grad-K term is omitted — the usual
stabilizer-form approximation; curvature terms of the strain tensor are
likewise omitted on the cylindrical/spherical grids), and K_t is CAPPED
at a fraction of the explicit diffusive stability limit so the closure
cannot itself violate the AB3 diffusion CFL where the strain explodes
— exactly the regime it exists for.

Enable with ``options['smagorinsky'] = Cs`` (classic Cs ~ 0.18-0.25).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def ring_arc_spacing(grid):
    """Per-ring azimuthal arc spacing [rDim] (static numpy), cached on
    the grid as ``smag_dy`` so the sharded builder can slice it to the
    shard's rows (parallel/sharding._local_grid): a shard-local grid's
    fields no longer span the global rDim, and an unsliced [rDim] dy
    broadcasts against them with a shape error (measured —
    tests/test_sharding.py::test_implicit_vdiff_sharded_matches_single).
    Returns None for structural classes without an azimuthal axis and a
    scalar for the uniform XYZ y axis."""
    cached = getattr(grid, "smag_dy", "unset")
    if not isinstance(cached, str):
        return cached
    p = grid.params
    g = grid._struct
    if g not in ("RL", "RLZ"):
        dy = None
    elif grid.geometry == "XYZ":
        dy = (p.ymax - p.ymin) / max(grid.nl, 1)
    else:
        dx = (p.xmax - p.xmin) / max(p.rDim, 1)
        r = np.asarray(grid.r_mish, np.float64)
        if grid.geometry in ("SL", "SLZ"):
            # spherical shells: x is LATITUDE in radians — both the ring
            # radius and the meridional spacing must be converted to
            # meters (a cos(lat), a dphi).  The unconverted dx left the
            # 4:1 anisotropy cap at ~0.5 m, silently crushing the
            # closure's K_t to ~1e-8 m^2/s on SL/SLZ (found round 5 when
            # Smagorinsky was first tried on the JW06 shell).
            r = p.sphere_radius * np.cos(r)  # ring radius a cos(lat)
            dx = p.sphere_radius * dx
        dy = 2.0 * np.pi * np.maximum(np.abs(r), dx) / max(grid.nl, 1)
        # anisotropy cap: on near-axisymmetric runs (small nl) the
        # ring arc 2 pi r / nl is hundreds of km — a coordinate
        # artifact, not a turbulence filter scale.  Beyond ~4:1 the
        # geometric-mean Delta stops being meaningful (the subgrid
        # eddies it models are bounded by the RESOLVING directions);
        # uncapped it measured as the closure diffusing a balanced
        # TC vortex away (Vmax 12 -> 7.7 m/s by h34 at lDim = 4,
        # round-3 sweep).
        dy = np.minimum(dy, 4.0 * dx)
    grid.smag_dy = dy
    return dy


def length_scales(grid):
    """(dx, dy, dz) physical spacings of the three directions for the
    grid's structural class.  dx is the mean radial mish spacing
    (scalar); dy is the per-ring azimuthal arc spacing ([rDim] array on
    polar/spherical grids — 2 pi r / nl with r the ring radius, clipped
    below at dx — or a scalar for the uniform XYZ y axis); dz is the
    local Chebyshev spacing ([nz]).  Per-ring dy keeps the closure
    shard-invariant (a shard's rows carry the same r values as the
    global grid) and physically scale-aware at the poles/axis."""
    p = grid.params
    g = grid._struct
    dx = (p.xmax - p.xmin) / max(p.rDim, 1)
    if grid.geometry in ("SL", "SLZ"):
        dx = p.sphere_radius * dx  # latitude radians -> meters
    # dy may come back as a shard-local traced slice (see
    # ring_arc_spacing) — all downstream math must stay jnp-safe
    dy = ring_arc_spacing(grid)
    if g in ("RZ", "RLZ"):
        z = np.asarray(grid.z_mish, np.float64)
        dz = np.empty_like(z)
        dz[:-1] = np.abs(np.diff(z))
        dz[-1] = dz[-2]
        dz = np.maximum(dz, 1e-3)
    else:
        dz = None
    return dx, dy, dz


def smagorinsky_viscosity(grid, ts, cs, du, dv, dw, dtype, n2=None,
                          pr=1.0 / 3.0, cap_frac=0.02,
                          split_vertical=False, horizontal_only=False):
    """Capped Smagorinsky viscosity field.

    ``du``/``dv``/``dw``: tuples of the PHYSICAL derivatives of each
    velocity component, (d/dx, d/dy, d/dz) with entries None where the
    direction does not exist.  Returns K_t with the spatial shape of the
    inputs.

    ``n2``: optional squared buoyancy frequency field.  When given, the
    Lilly (1962) Richardson-number factor sqrt(max(1 - Ri/Pr, 0)) scales
    the strain: mixing is ENHANCED in statically unstable layers
    (Ri < 0 — e.g. the superadiabatic surface layer a flux-heated BL
    develops without a PBL scheme) and shut off in strongly stratified
    ones (Ri > Pr).  The moist equation sets pass the dry-entropy
    estimate N^2 = (g/Cpd) d(s_total)/dz.

    ``horizontal_only``: restrict the closure to the horizontal plane —
    2-D strain (du/dx, dv/dy, and the horizontal shear pair only),
    filter scale sqrt(dx*dy), cap at the horizontal diffusive limit —
    and return a single K_h meant to multiply ONLY the horizontal
    Laplacian.  This is the standard dry-dynamical-core configuration
    (options['smagorinsky_axes'] = 'rl'): on a baroclinic-wave grid the
    vertical spacing is O(1 km) against O(100 km) horizontal, so the
    isotropic closure both miscalibrates Delta and switches on vertical
    mixing that R0-fit vertical fields cannot take (wall-flux rule,
    docs/NUMERICS.md).  Mutually exclusive with split_vertical; the
    Richardson factor (n2) is ignored in this mode — it belongs to the
    vertical-mixing physics the mode excludes.

    ``split_vertical``: for options['implicit_vdiff'] configurations —
    returns (k_h, k_v) where k_h is capped at the HORIZONTAL explicit
    diffusive limit only (it multiplies the explicit horizontal
    Laplacian) and k_v is the UNCAPPED closure value (it feeds the
    unconditionally stable backward-Euler vertical solve,
    model.build_implicit_vdiff).  Without the split, the combined cap is
    dominated by the near-wall Chebyshev spacing (dz_min ~ L (pi/nz)^2 /
    2), which capped the closure to O(100 m^2/s) exactly where a TC
    boundary layer needs O(10-100x) more mixing — the measured surface
    v = 60 m/s unmixed-BL failure mode of the round-3 TC runs.
    """
    if split_vertical and horizontal_only:
        raise ValueError("split_vertical and horizontal_only are exclusive")
    dx, dy, dz = length_scales(grid)

    def sq(x):
        return x * x if x is not None else 0.0

    def half(a, b):
        if a is None and b is None:
            return None
        s = (a if a is not None else 0.0) + (b if b is not None else 0.0)
        return 0.5 * s

    s12 = half(du[1], dv[0] if dv else None)
    if horizontal_only:
        smag2 = 2.0 * (
            sq(du[0]) + sq(dv[1] if dv else None)
        ) + 4.0 * sq(s12)
        smag = jnp.sqrt(smag2)
        # dy may be a traced shard-local slice — keep the arithmetic
        # numpy/jnp-agnostic (same rule as the isotropic branch below)
        dy_h = dy if dy is not None else dx
        if getattr(dy_h, "ndim", 0) >= 1:
            dy_h = dy_h[:, None, None] if dz is not None else dy_h[:, None]
        delta_h = (np.asarray(dx, np.float64) * dy_h) ** 0.5
        inv2_hh = 1.0 / dx**2 + (1.0 / (dy_h * dy_h) if dy is not None else 0.0)
        k_t = (cs * jnp.asarray(delta_h, dtype)) ** 2 * smag
        return jnp.minimum(k_t, jnp.asarray(cap_frac / (ts * inv2_hh), dtype))
    s13 = half(du[2], dw[0] if dw else None)
    s23 = half(dv[2] if dv else None, dw[1] if dw else None)
    smag2 = 2.0 * (
        sq(du[0]) + sq(dv[1] if dv else None) + sq(dw[2] if dw else None)
    ) + 4.0 * (sq(s12) + sq(s13) + sq(s23))
    if n2 is not None:
        ri = n2 / jnp.maximum(smag2, 1.0e-12)
        smag2 = smag2 * jnp.maximum(1.0 - ri / pr, 0.0)
    smag = jnp.sqrt(smag2)

    # filter scale: geometric mean of the available spacings, built in
    # broadcastable form against the z-last spatial layout ([r,(l),(z)]).
    # dy may be a per-ring [rDim] array on polar/spherical grids — and a
    # TRACED shard-local slice under the sharded builders, so this block
    # uses operations valid for numpy and jnp alike.
    has_z = dz is not None
    if dy is not None and getattr(dy, "ndim", 0) >= 1:
        dy_b = dy[:, None, None] if has_z else dy[:, None]
    else:
        dy_b = dy  # scalar or None
    if has_z:
        dz_b = dz[None, None, :] if dy is not None else dz[None, :]

    ndirs = 1 + (dy is not None) + has_z
    prod = np.asarray(dx, np.float64)
    inv2 = np.asarray(1.0 / dx**2, np.float64)
    if dy is not None:
        prod = prod * dy_b
        inv2 = inv2 + 1.0 / (dy_b * dy_b)
    inv2_h = inv2
    if has_z:
        prod = prod * dz_b
        inv2 = inv2 + 1.0 / dz_b**2
    delta = prod ** (1.0 / ndirs)
    # diffusive stability of the SPECTRAL scheme: the resolvable
    # wavenumber is k_max ~ pi/Delta, so the explicit limit is
    # K ts (pi/Delta)^2 < ~0.5, i.e. K ts / Delta^2 < ~0.05 — the
    # round-2 cap of 0.2/(ts inv2) sat ~4x above it and measured as a
    # near-wall explicit blow-up within 50 steps once the TC runs
    # actually reached the cap (round-3 sweep forensics)
    k_t = (cs * jnp.asarray(delta, dtype)) ** 2 * smag
    if split_vertical:
        cap_h = cap_frac / (ts * inv2_h)
        return jnp.minimum(k_t, jnp.asarray(cap_h, dtype)), k_t
    cap = cap_frac / (ts * inv2)
    return jnp.minimum(k_t, jnp.asarray(cap, dtype))
