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


def length_scales(grid):
    """(dx, dy, dz[nz]) mean physical spacings of the three directions for
    the grid's structural class; dz is the local Chebyshev spacing."""
    p = grid.params
    g = grid._struct
    dx = (p.xmax - p.xmin) / max(p.rDim, 1)
    if g in ("RL", "RLZ"):
        if grid.geometry == "XYZ":
            dy = (p.ymax - p.ymin) / max(grid.nl, 1)
        else:
            # azimuthal arc at the mid radius (metric spacing varies with
            # r; the cap below uses the same representative value)
            r_mid = 0.5 * (abs(p.xmin) + abs(p.xmax))
            if grid.geometry in ("SL", "SLZ"):
                r_mid = p.sphere_radius * 0.7  # ~cos(45 deg) ring
            dy = 2.0 * np.pi * max(r_mid, dx) / max(grid.nl, 1)
    else:
        dy = None
    if g in ("RZ", "RLZ"):
        z = np.asarray(grid.z_mish, np.float64)
        dz = np.empty_like(z)
        dz[:-1] = np.abs(np.diff(z))
        dz[-1] = dz[-2]
        dz = np.maximum(dz, 1e-3)
    else:
        dz = None
    return dx, dy, dz


def smagorinsky_viscosity(grid, ts, cs, du, dv, dw, dtype):
    """Capped Smagorinsky viscosity field.

    ``du``/``dv``/``dw``: tuples of the PHYSICAL derivatives of each
    velocity component, (d/dx, d/dy, d/dz) with entries None where the
    direction does not exist.  Returns K_t with the spatial shape of the
    inputs.
    """
    dx, dy, dz = length_scales(grid)

    def sq(x):
        return x * x if x is not None else 0.0

    def half(a, b):
        if a is None and b is None:
            return None
        s = (a if a is not None else 0.0) + (b if b is not None else 0.0)
        return 0.5 * s

    s12 = half(du[1], dv[0] if dv else None)
    s13 = half(du[2], dw[0] if dw else None)
    s23 = half(dv[2] if dv else None, dw[1] if dw else None)
    smag2 = 2.0 * (
        sq(du[0]) + sq(dv[1] if dv else None) + sq(dw[2] if dw else None)
    ) + 4.0 * (sq(s12) + sq(s13) + sq(s23))
    smag = jnp.sqrt(smag2)

    # filter scale: geometric mean of the available spacings
    scales = [dx] + ([dy] if dy is not None else [])
    inv2 = 1.0 / dx**2 + (1.0 / dy**2 if dy is not None else 0.0)
    if dz is not None:
        delta = (np.prod(scales) * dz) ** (1.0 / (len(scales) + 1))
        cap = 0.2 / (ts * (inv2 + 1.0 / dz**2))  # [nz]
        delta = jnp.asarray(delta, dtype)
        cap = jnp.asarray(cap, dtype)
    else:
        delta = float(np.prod(scales) ** (1.0 / len(scales)))
        cap = 0.2 / (ts * inv2)
    k_t = (cs * delta) ** 2 * smag
    return jnp.minimum(k_t, cap)
