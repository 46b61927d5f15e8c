"""Modal filter (options['modal_filter_tau']) + saturation-formula guard.

Both came out of the mature-cell collapse forensics (docs/RESULTS.md):
the collapse ends in a local thermodynamic runaway whose terminal NaN is
the Buck formula's pole at Tk ~ 15.3 K overflowing; upstream, the
grid-scale hot tower grows because the l_q/dealias/∇²K trio is not
scale-selective enough at convection-permitting resolution.
"""

import numpy as np
import jax.numpy as jnp

from scythe_tpu import BC, GridParameters, create_grid
from scythe_tpu.model import build_modal_filter
from scythe_tpu.physics import thermodynamics as td


def _xyz_grid():
    gp = GridParameters(
        geometry="XYZ",
        xmin=0.0,
        xmax=60000.0,
        num_cells=24,
        lDim=8,
        ymin=0.0,
        ymax=20000.0,
        zmin=0.0,
        zmax=15000.0,
        zDim=16,
        BCL={"h": BC.PERIODIC},
        BCR={"h": BC.PERIODIC},
        vars={"h": 1},
    )
    return create_grid(gp, jnp.float64)


def test_modal_filter_scale_selectivity():
    grid = _xyz_grid()
    filt = build_modal_filter(grid, tau=60.0, order=4, ts=0.25, dtype=jnp.float64)
    pts = grid.gridpoints()
    x = pts[:, 0].reshape(grid.spatial_shape)
    z = pts[:, 2].reshape(grid.spatial_shape)

    # large-scale field: survives one full grid-scale e-fold time >99.9%
    smooth = np.sin(2 * np.pi * x / 60000.0) * np.cos(np.pi * z / 15000.0)
    spec = grid.analysis(jnp.asarray(smooth[None]))
    spec_f = spec
    for _ in range(240):  # 60 s at ts = 0.25
        spec_f = filt(spec_f)
    v0 = np.asarray(grid.synthesis(spec)["val"][0])
    v1 = np.asarray(grid.synthesis(spec_f)["val"][0])
    assert np.sqrt(((v1 - v0) ** 2).mean()) < 1e-2 * np.sqrt((v0**2).mean())

    # grid-scale noise: meaningfully damped over the same window
    rng = np.random.default_rng(0)
    noise = rng.standard_normal(grid.spatial_shape)
    spec = grid.analysis(jnp.asarray(noise[None]))
    spec_f = spec
    for _ in range(240):
        spec_f = filt(spec_f)
    n0 = np.asarray(grid.synthesis(spec)["val"][0])
    n1 = np.asarray(grid.synthesis(spec_f)["val"][0])
    assert np.sqrt((n1**2).mean()) < 0.85 * np.sqrt((n0**2).mean())

    # contraction: no factor may amplify (unconditional stability)
    r = rng.standard_normal(spec.shape)
    out = np.asarray(filt(jnp.asarray(r)))
    assert np.linalg.norm(out) <= np.linalg.norm(r) * (1.0 + 1e-12)


def test_modal_filter_fourier_chebyshev_factors():
    """The non-radial factors match the advertised law per mode."""
    grid = _xyz_grid()
    ts, tau, order = 0.25, 60.0, 4
    filt = build_modal_filter(grid, tau=tau, order=order, ts=ts, dtype=jnp.float64)
    # a pure highest-k Fourier mode along y decays by exp(-ts/tau) per call
    spec = jnp.zeros((1,) + grid.spectral_shape[1:])
    from scythe_tpu.basis import fourier

    k = np.abs(fourier.coeff_wavenumbers(grid.nl))
    kidx = int(np.argmax(k))
    spec = spec.at[0, 4, kidx, 0].set(1.0)
    ratio = float(np.asarray(filt(spec))[0, 4, kidx, 0])
    # isolate the Fourier factor from the radial one by comparing the
    # identical radial impulse at k_max vs k = 0
    spec0 = jnp.zeros_like(spec).at[0, 4, 0, 0].set(1.0)
    r0 = float(np.asarray(filt(spec0))[0, 4, 0, 0])
    assert abs(ratio / r0 - np.exp(-ts / tau)) < 1e-12


def test_modal_filter_preserves_boundary_conditions():
    """On a BOUNDED radial basis the filter must not move the state off
    its BC-constraint subspace: the first implementation filtered raw
    coefficients, and the per-step BC violation at the RLZ axis grew
    into a measured runaway (TC-intensification experiment,
    tools/probe_tc_blowup.py).  Pin both the subspace invariance and the
    physical boundary values after many applications."""
    gp = GridParameters(
        geometry="R",
        xmin=0.0,
        xmax=100.0,
        num_cells=20,
        BCL={"u": BC.R1T0, "h": BC.R1T1},
        BCR={"u": BC.R1T1, "h": BC.R0},
        vars={"u": 1, "h": 2},
    )
    grid = create_grid(gp, jnp.float64)
    filt = build_modal_filter(grid, tau=30.0, order=4, ts=1.0,
                              dtype=jnp.float64)
    pts = grid.gridpoints()[:, 0]
    # fields satisfying the BCs: u(0)=0, u'(100)=0; h'(0)=0
    u0 = np.sin(np.pi * pts / 200.0) + 0.1 * np.sin(7 * np.pi * pts / 200.0)
    h0 = np.cos(np.pi * pts / 100.0) + 0.05 * np.cos(4 * np.pi * pts / 100.0)
    spec = grid.analysis(jnp.asarray(np.stack([u0, h0])))
    spec_f = spec
    for _ in range(50):
        spec_f = filt(spec_f)
    # subspace invariance: filtered spec equals its own projection onto
    # each variable's range(T)
    from scythe_tpu.basis import bspline

    sf = np.asarray(spec_f)
    for v in range(2):
        T = bspline.constraint_matrix(gp.num_cells, gp.BCL[v], gp.BCR[v])
        q, _ = np.linalg.qr(T)
        proj = q @ (q.T @ sf[v])
        assert np.allclose(proj, sf[v], atol=1e-12), v
    # physical boundary values: u(0) = 0 and h'(0) = 0 survive filtering
    out = grid.synthesis(spec_f)
    u_end = np.asarray(out["val"][0])
    dh = np.asarray(out["dr"][1])
    # evaluate AT the boundary via the raw basis (mish points are interior)
    phi0 = bspline.collocation_matrix(gp.xmin, gp.xmax, gp.num_cells,
                                      np.array([0.0]), 0)
    phi1 = bspline.collocation_matrix(gp.xmin, gp.xmax, gp.num_cells,
                                      np.array([0.0]), 1)
    assert abs((phi0 @ sf[0])[0]) < 1e-12  # u(0) = 0
    assert abs((phi1 @ sf[1])[0]) < 1e-12  # h'(0) = 0
    # and the filter still contracts
    assert np.linalg.norm(sf) <= np.linalg.norm(np.asarray(spec)) + 1e-12
    del u_end, dh


def test_saturation_formula_guard():
    """Runaway temperatures must produce finite (garbage-but-bounded)
    saturation values instead of Inf/NaN: the Buck fit's pole at
    Tk ~ 15.3 K previously overflowed (p - e_s)^2 to Inf and NaN-poisoned
    the global spectral state in one transform."""
    for T in (1.0, 4.7, 15.3, 16.0, 30.0, 443.0, 2000.0):
        es = float(td.sat_pressure_liquid_buck(jnp.asarray(T), 50.0))
        des = float(td.sat_pressure_liquid_buck_dT(jnp.asarray(T), 50.0))
        ei = float(td.sat_pressure_ice_buck(jnp.asarray(T), 50.0))
        assert np.isfinite([es, des, ei]).all(), T
    # physical range is untouched by the clip
    for T in (180.0, 230.0, 280.0, 330.0):
        Tc = T - 273.15
        raw = (1.0 + 7.2e-4 + 900.0 * (3.20e-6 + 5.9e-10 * Tc**2)) * (
            6.1121 * np.exp((18.729 - Tc / 227.3) * Tc / (Tc + 257.87))
        )
        assert np.isclose(
            float(td.sat_pressure_liquid_buck(jnp.asarray(T), 900.0)), raw,
            rtol=1e-14,
        )


def test_sl_masked_filter_pole_consistency():
    """On SL/SLZ grids the 'r' (latitude) filter factor must keep pole
    rings ring-mask consistent: the unmasked form spreads mid-latitude
    zonal-wavenumber content into pole rows whose circumference cannot
    support it (measured device blow-up in 6 h, round 4 —
    tools/jw06_filter_probe.py).  200 filter applications of a random
    state must leave the pole row's unsupported wavenumbers at the
    radial-LSQ residual level, orders below the supported ones."""
    import jax
    import numpy as np

    from scythe_tpu import GridParameters, create_grid
    from scythe_tpu.model import build_modal_filter

    gp = GridParameters(
        geometry="SL",
        xmin=-np.pi / 2,
        xmax=np.pi / 2,
        num_cells=16,
        lDim=48,
        sphere_radius=6.371e6,
        vars={"h": 1, "u": 2, "v": 3},
    )
    grid = create_grid(gp, jnp.float64)
    filt = jax.jit(build_modal_filter(grid, 60.0, 4, 15.0, jnp.float64,
                                      axes="rl"))
    rng = np.random.default_rng(0)
    phys = rng.standard_normal((grid.nvars,) + grid.spatial_shape)
    s = grid.analysis(jnp.asarray(phys))
    n0 = float(jnp.abs(s).max())
    for _ in range(200):
        s = filt(s)
    assert float(jnp.abs(s).max()) < n0  # contractive
    val = np.asarray(grid.synthesis(s)["val"])
    mask = np.asarray(grid.ring_mask)
    pole = val[0, -1, :]
    hat = np.abs(np.fft.rfft(pole))
    nsup = int(mask[-1].sum())
    # nsup counts real-Fourier coefficient SLOTS (k=0 plus a cos/sin pair
    # per wavenumber), so the highest supported wavenumber is
    # (nsup-1)//2; rfft bins above that are unsupported and must sit at
    # the LSQ-residual floor (measured ~4e-4 of supported on the SLZ
    # production grid)
    kmax = max((nsup - 1) // 2, 0)
    sup = hat[: kmax + 1].max()
    unsup = hat[kmax + 1 :].max()
    assert unsup < 1e-2 * (sup + 1e-30), (sup, unsup)
