"""Smagorinsky eddy-viscosity closure (options['smagorinsky'], ROADMAP
item 3's documented remaining lever — physics/turbulence.py)."""

import numpy as np
import jax.numpy as jnp

from scythe_tpu import BC, ZBC, GridParameters, ModelParameters, create_grid
from scythe_tpu.physics import turbulence as tb

VARS = {
    "s": 1, "xi": 2, "mu": 3, "u": 4, "v": 5, "w": 6,
    "mu_c": 7, "mu_r": 8, "qss": 9,
}


def _xyz_grid(nx=12, ny=8, nz=16):
    gp = GridParameters(
        geometry="XYZ",
        xmin=0.0,
        xmax=24000.0,
        num_cells=nx,
        lDim=ny,
        ymin=0.0,
        ymax=8000.0,
        zmin=0.0,
        zmax=10000.0,
        zDim=nz,
        BCL={n: BC.PERIODIC for n in VARS},
        BCR={n: BC.PERIODIC for n in VARS},
        BCB={"s": ZBC.R1T1, "u": ZBC.R1T1, "v": ZBC.R1T1, "mu": ZBC.R1T1,
             "mu_c": ZBC.R1T1, "w": ZBC.R1T0},
        BCT={"s": ZBC.R1T1, "u": ZBC.R1T1, "v": ZBC.R1T1, "mu": ZBC.R1T1,
             "mu_c": ZBC.R1T1, "mu_r": ZBC.R1T1, "w": ZBC.R1T0},
        vars=VARS,
    )
    return create_grid(gp, jnp.float64)


def test_pure_shear_viscosity_formula():
    """du/dz = gamma gives |S| = gamma, so K_t = (Cs*Delta)^2 * gamma
    wherever the cap is not binding."""
    grid = _xyz_grid()
    shape = grid.spatial_shape
    gamma = 1.0e-3
    zero = jnp.zeros(shape)
    sz = jnp.full(shape, gamma)
    kt = np.asarray(
        tb.smagorinsky_viscosity(
            grid, 0.25, 0.18,
            (zero, zero, sz), (zero, zero, zero), (zero, zero, zero),
            jnp.float64,
        )
    )
    dx, dy, dz = tb.length_scales(grid)
    delta = (dx * dy * dz) ** (1.0 / 3.0)  # [nz]
    expect = (0.18 * delta) ** 2 * gamma
    cap = 0.2 / (0.25 * (1.0 / dx**2 + 1.0 / dy**2 + 1.0 / dz**2))
    expect = np.minimum(expect, cap)
    assert np.allclose(kt, expect[None, None, :], rtol=1e-12)
    assert kt.max() > 1.0  # a real viscosity at cloud-model scales

    # zero flow -> zero viscosity
    kt0 = np.asarray(
        tb.smagorinsky_viscosity(
            grid, 0.25, 0.18,
            (zero, zero, zero), (zero, zero, zero), (zero, zero, zero),
            jnp.float64,
        )
    )
    assert kt0.max() == 0.0


def test_viscosity_capped_at_diffusive_cfl():
    """An exploding strain rate must not push K_t past the explicit
    diffusion stability limit — the closure may never destabilize the
    run it exists to stabilize."""
    grid = _xyz_grid()
    shape = grid.spatial_shape
    zero = jnp.zeros(shape)
    huge = jnp.full(shape, 1.0e3)  # absurd 1000/s strain
    ts = 0.25
    kt = np.asarray(
        tb.smagorinsky_viscosity(
            grid, ts, 0.18, (huge, huge, huge), (huge, huge, huge),
            (huge, huge, huge), jnp.float64,
        )
    )
    dx, dy, dz = tb.length_scales(grid)
    # cap_frac = 0.02: the SPECTRAL diffusive limit is K ts (pi/Delta)^2
    # < ~0.5 (k_max ~ pi/Delta, not 1/Delta) — the old 0.2 cap measured
    # as a near-wall explicit blow-up on the TC grid (round 3)
    cap = 0.02 / (ts * (1.0 / dx**2 + 1.0 / dy**2 + 1.0 / dz**2))
    assert (kt <= cap[None, None, :] * (1 + 1e-12)).all()
    # and the cap actually binds for this input
    assert np.isclose(kt.max(), cap.max(), rtol=1e-9)


def test_xyz_bubble_runs_with_closure(tmp_path):
    """End-to-end: the XYZ moist bubble with smagorinsky=0.18 stays
    finite, still rises, and the closure does not amplify the velocity
    extremes relative to the constant-K run (it only ever ADDS
    viscosity)."""
    import dataclasses

    import tests.test_xyz as tx

    gp, grid = tx._xyz_grid()
    pts = grid.gridpoints()
    x = pts[:, 0].reshape(grid.spatial_shape)
    z = pts[:, 2].reshape(grid.spatial_shape)
    phys0 = np.zeros((grid.nvars,) + grid.spatial_shape)
    phys0[0] = tx._bubble_s(x, z)
    outs = {}
    for name, extra in (("base", {}), ("smag", {"smagorinsky": 0.18})):
        model = tx._model(tmp_path, gp, "MoistEulerXYZ", "ics.csv")
        model = dataclasses.replace(model, options={**model.opts(), **extra})
        outs[name] = tx._run(model, grid, phys0, 300)  # 60 s at ts = 0.2
    for name, phys in outs.items():
        assert np.isfinite(phys).all(), name
    w_b, w_s = outs["base"][5], outs["smag"][5]
    assert w_s.max() > 0.01  # bubble still rises
    assert w_s.max() <= w_b.max() * 1.05  # closure does not amplify


def test_richardson_factor_scales_strain():
    """The Lilly (1962) stability factor: n2 = 0 is a no-op, Ri >= Pr
    shuts the closure off, and statically unstable stratification
    enhances it by sqrt(1 - Ri/Pr)."""
    grid = _xyz_grid()
    shape = grid.spatial_shape
    gamma = 1.0e-4  # small enough that the CFL cap never binds
    zero = jnp.zeros(shape)
    sz = jnp.full(shape, gamma)
    du, dv, dw = (zero, zero, sz), (zero, zero, zero), (zero, zero, zero)
    pr = 1.0 / 3.0

    def kt(n2):
        return np.asarray(
            tb.smagorinsky_viscosity(
                grid, 0.25, 0.18, du, dv, dw, jnp.float64, n2=n2, pr=pr
            )
        )

    base = kt(None)
    assert base.max() > 0.0
    assert np.allclose(kt(jnp.zeros(shape)), base, rtol=1e-12)  # neutral
    # Ri = Pr -> exact shutoff; beyond stays zero (no sqrt of a negative)
    assert kt(jnp.full(shape, pr * gamma**2)).max() == 0.0
    far = kt(jnp.full(shape, 100.0 * gamma**2))
    assert far.max() == 0.0 and np.isfinite(far).all()
    # Ri = -3*Pr -> factor sqrt(1 + 3) = 2 on |S|
    assert np.allclose(kt(jnp.full(shape, -3.0 * pr * gamma**2)),
                       2.0 * base, rtol=1e-9)


def test_per_ring_arc_length_scale_polar():
    """Polar grids get a per-ring azimuthal arc spacing 2*pi*max(r,dx)/nl
    (shard-invariant and pole/axis-aware), not a single mid-radius value."""
    gp = GridParameters(
        geometry="RL", xmin=0.0, xmax=3.0e5, num_cells=32, lDim=32,
        BCL={"h": BC.R1T1, "u": BC.R1T0},
        BCR={"h": BC.R0, "u": BC.R1T1},
        vars={"h": 1, "u": 2},
    )
    grid = create_grid(gp, jnp.float64)
    dx, dy, dz = tb.length_scales(grid)
    assert dz is None
    arc = 2.0 * np.pi * np.maximum(np.abs(grid.r_mish), dx) / grid.nl
    # anisotropy cap: the arc spacing saturates at 4*dx (coarse-azimuth
    # rings must not inflate the mixing length past the resolving axis)
    expect = np.minimum(arc, 4.0 * dx)
    assert isinstance(dy, np.ndarray) and dy.shape == (gp.rDim,)
    assert np.allclose(dy, expect)
    # innermost rings are clipped at dx from below, outer ones at 4*dx
    assert np.isclose(dy[0], dx * 2.0 * np.pi / grid.nl, rtol=1e-6) or \
        dy[0] >= dx * 2.0 * np.pi / grid.nl * (1 - 1e-9)
    assert np.isclose(dy[-1], 4.0 * dx, rtol=1e-6)
    # viscosity broadcasts the [rDim] dy over the (r, l) spatial shape
    shape = grid.spatial_shape
    zero = jnp.zeros(shape)
    g = jnp.full(shape, 1.0e-3)
    kt = np.asarray(
        tb.smagorinsky_viscosity(
            grid, 3.0, 0.2, (g, zero, None), (zero, zero, None), None,
            jnp.float64,
        )
    )
    assert kt.shape == shape and np.isfinite(kt).all() and kt.max() > 0.0


def test_horizontal_only_mode():
    """horizontal_only=True: 2-D strain (vertical shear excluded),
    sqrt(dx*dy) filter scale, horizontal-only cap — the dry-core
    breaking-front configuration (options['smagorinsky_axes']='rl')."""
    grid = _xyz_grid()
    shape = grid.spatial_shape
    gamma = 1.0e-3
    zero = jnp.zeros(shape)
    g_f = jnp.full(shape, gamma)

    # pure VERTICAL shear must produce ZERO horizontal viscosity
    kt = np.asarray(
        tb.smagorinsky_viscosity(
            grid, 0.25, 0.18,
            (zero, zero, g_f), (zero, zero, zero), (zero, zero, zero),
            jnp.float64, horizontal_only=True,
        )
    )
    assert np.allclose(kt, 0.0)

    # pure horizontal shear du/dy = gamma: |S|_2D = gamma, K_h =
    # (Cs*sqrt(dx*dy))^2 * gamma below the horizontal cap
    kt = np.asarray(
        tb.smagorinsky_viscosity(
            grid, 0.25, 0.18,
            (zero, g_f, zero), (zero, zero, zero), (zero, zero, zero),
            jnp.float64, horizontal_only=True,
        )
    )
    dx, dy, _ = tb.length_scales(grid)
    expect = (0.18 * np.sqrt(dx * dy)) ** 2 * gamma
    cap = 0.02 / (0.25 * (1.0 / dx**2 + 1.0 / dy**2))
    assert np.allclose(kt, min(expect, cap), rtol=1e-12)
    assert kt.max() > 1.0

    import pytest

    with pytest.raises(ValueError):
        tb.smagorinsky_viscosity(
            grid, 0.25, 0.18,
            (zero, zero, zero), (zero, zero, zero), (zero, zero, zero),
            jnp.float64, horizontal_only=True, split_vertical=True,
        )


def test_slz_smag_axes_rl_leaves_vertical_untouched(tmp_path):
    """On MoistEulerSLZ with smagorinsky_axes='rl': a pure horizontal
    shear flow gets extra horizontal damping but ZERO vertical-mixing
    tendency (K_v=0 preserved), while the default 'rlz' closure would
    switch vertical mixing on — the wall-flux-rule hazard that kept
    Smagorinsky off the JW06 runs (docs/RESULTS.md 'JW06 endgame')."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from examples.jw06_baroclinic_slz import build_model, initial_fields
    from scythe_tpu.model import build_context
    import dataclasses

    out = str(tmp_path / "jw")
    model = build_model(out, num_cells=8, nl=24, zdim=12, ts=15.0)
    base_opts = dict(model.options)

    def tendency(axes):
        opts = dict(base_opts)
        opts.update(smagorinsky=0.25, smagorinsky_axes=axes)
        m = dataclasses.replace(model, options=opts)
        grid = create_grid(m.grid_params, jnp.float64)
        ctx = build_context(m, grid, jnp.float64)
        phys = initial_fields(grid, ctx.ref_state, perturb=True)
        spec = grid.analysis(jnp.asarray(phys))
        fields = grid.synthesis(spec)
        from scythe_tpu.equations.common import get_equation_set
        res = get_equation_set("MoistEulerSLZ")(fields, ctx)
        return np.asarray(res.expdot)

    t_rl = tendency("rl")
    t_rlz = tendency("rlz")
    assert np.isfinite(t_rl).all() and np.isfinite(t_rlz).all()
    # the two closures must actually differ on this sheared state
    assert not np.allclose(t_rl[3], t_rlz[3])


def test_spherical_length_scales_are_meters():
    """SL/SLZ length scales must be METERS: the latitude spacing is
    a*dphi and the equatorial ring arc is ~2 pi a cos(lat)/nl.  Round 5
    found the unconverted radians dx (~0.13) feeding the 4:1 anisotropy
    cap, which clamped dy to ~0.5 m and crushed the closure's K_t to
    ~1e-8 m^2/s on spherical shells."""
    from scythe_tpu import GridParameters, ZBC

    gp = GridParameters(
        geometry="SLZ", xmin=-np.pi / 2, xmax=np.pi / 2, num_cells=8,
        lDim=24, sphere_radius=6.371229e6, zmin=0.0, zmax=3.0e4, zDim=12,
        BCB={"w": ZBC.R1T0}, BCT={"w": ZBC.R1T0}, vars=VARS,
    )
    grid = create_grid(gp, jnp.float64)
    dx, dy, dz = tb.length_scales(grid)
    a = gp.sphere_radius
    assert abs(dx - a * np.pi / grid.params.rDim) < 1.0  # ~834 km
    lat = np.asarray(grid.r_mish)
    i_eq = int(np.argmin(np.abs(lat)))
    arc_eq = 2.0 * np.pi * a * np.cos(lat[i_eq]) / 24
    # equatorial ring arc within the anisotropy cap (4 dx)
    assert abs(dy[i_eq] - min(arc_eq, 4.0 * dx)) < 1.0
    assert dy.min() > 1.0e5  # every ring's scale is O(100 km), not O(1 m)
