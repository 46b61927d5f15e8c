"""Implicit vertical diffusion (options['implicit_vdiff'],
model.build_implicit_vdiff): the backward-Euler column solve that frees
the vertical closure from the near-wall explicit diffusive limit
(dz_min ~ L (pi/nz)^2 / 2 on the Chebyshev column) — the measured
round-3 TC failure mode (unmixed boundary layer, docs/RESULTS.md).
"""

import dataclasses
import os
import sys

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from scythe_tpu import BC, ZBC, GridParameters, ModelParameters, create_grid
from scythe_tpu import timeintegration as ti
from scythe_tpu.basis import chebyshev
from scythe_tpu.model import (build_context, build_implicit_vdiff,
                              build_step, make_scan)

VARS = {"s": 1, "xi": 2, "mu": 3, "u": 4, "v": 5, "w": 6,
        "mu_c": 7, "mu_r": 8, "qss": 9}


def _grid_params(num_cells=8, zdim=16, zmax=10.0e3):
    return GridParameters(
        geometry="RLZ",
        xmin=0.0,
        xmax=100.0e3,
        num_cells=num_cells,
        lDim=4,
        zmin=0.0,
        zmax=zmax,
        zDim=zdim,
        BCL={"u": BC.R1T0, "v": BC.R1T0, "w": BC.R1T1},
        BCR={"u": BC.R1T0, "v": BC.R0},
        BCB={"s": ZBC.R1T1, "u": ZBC.R1T1, "v": ZBC.R1T1, "mu": ZBC.R1T1,
             "mu_c": ZBC.R1T1, "w": ZBC.R1T0},
        BCT={"s": ZBC.R1T1, "u": ZBC.R1T1, "v": ZBC.R1T1, "mu": ZBC.R1T1,
             "mu_c": ZBC.R1T1, "mu_r": ZBC.R1T1, "w": ZBC.R1T0},
        vars=VARS,
    )


def _write_isothermal_sounding(path):
    """Simple stable sounding for the reference state."""
    zs = np.linspace(0.0, 12000.0, 49)
    theta = 300.0 * np.exp(zs * 1.2e-5)
    qv = np.maximum(12.0 * np.exp(-zs / 2500.0), 0.01)
    with open(path, "w") as f:
        f.write(f"1000.0 {theta[0]} {qv[0]}\n")
        for z, th, q in zip(zs[1:], theta[1:], qv[1:]):
            f.write(f"{z} {th} {q}\n")
    return path


def _model(tmp_path, ts, K, extra_opts):
    gp = _grid_params()
    return ModelParameters(
        ts=ts,
        integration_time=100.0,
        output_interval=100.0,
        equation_set="MoistEulerRLZ",
        initial_conditions=str(tmp_path / "ics.csv"),
        output_dir=str(tmp_path),
        ref_state_file=_write_isothermal_sounding(
            str(tmp_path / "snd.txt")
        ),
        grid_params=gp,
        physical_params={"K": K, "f": 0.0},
        options={"semiimplicit": True, "stiff_relaxation": "exp",
                 **extra_opts},
    )


def _flux_form_matrices(p):
    nz = p.zDim
    z0 = chebyshev.build_ops(nz, p.zmin, p.zmax, p.b_zDim)
    d = z0.dsynth @ (z0.constrain @ z0.analysis)
    theta = np.pi * (np.arange(nz) + 0.5) / nz
    wq = 0.5 * (p.zmax - p.zmin) * (np.pi / nz) * np.sin(theta)
    return d, wq


def test_solve_matches_numpy_reference():
    """The batched einsum+LU assembly solves exactly the per-column
    symmetric flux-form system (I + ts W^-1 D^T diag(wq K) D) built
    independently in numpy."""
    gp = _grid_params(num_cells=4, zdim=12)
    grid = create_grid(gp, jnp.float64)
    apply = build_implicit_vdiff(grid, jnp.float64)
    rng = np.random.default_rng(0)
    shape = (grid.nvars,) + grid.spatial_shape
    var = rng.normal(size=shape)
    k_v = np.abs(rng.normal(size=grid.spatial_shape)) * 50.0
    ts = 5.0
    out = np.asarray(apply(jnp.asarray(var), jnp.asarray(k_v), ts))

    p = gp
    nz = p.zDim
    d, wq = _flux_form_matrices(p)
    for v, name in enumerate(p.vars):
        if name in ("xi", "qss"):
            # untouched
            assert np.array_equal(out[v], var[v])
            continue
        flat_k = k_v.reshape(-1, nz)
        flat_v = var[v].reshape(-1, nz)
        expect = np.empty_like(flat_v)
        for c in range(flat_v.shape[0]):
            m = np.eye(nz) + ts * (
                np.diag(1.0 / wq) @ d.T @ np.diag(wq * flat_k[c]) @ d
            )
            expect[c] = np.linalg.solve(m, flat_v[c])
        assert np.allclose(out[v].reshape(-1, nz), expect, atol=1e-10), name


def test_flux_form_conserves_column_integral():
    """The weak form's flux-zero walls conserve the quadrature column
    integral of every diffused variable to roundoff — the property the
    replaced collocation form lacked (and with it, f32 stability)."""
    gp = _grid_params(num_cells=4, zdim=16)
    grid = create_grid(gp, jnp.float64)
    apply = build_implicit_vdiff(grid, jnp.float64)
    rng = np.random.default_rng(1)
    shape = (grid.nvars,) + grid.spatial_shape
    var = rng.normal(size=shape)
    k_v = np.abs(rng.normal(size=grid.spatial_shape)) * 2.0e4
    out = np.asarray(apply(jnp.asarray(var), jnp.asarray(k_v), 30.0))
    _, wq = _flux_form_matrices(gp)
    before = np.tensordot(var[0], wq, axes=(-1, 0))
    after = np.tensordot(out[0], wq, axes=(-1, 0))
    assert np.allclose(after, before, rtol=1e-12, atol=1e-12)


def test_zero_state_stays_zero():
    """phi = 0 must solve to exactly 0 (no injection from the solve)."""
    gp = _grid_params(num_cells=4, zdim=12)
    grid = create_grid(gp, jnp.float64)
    apply = build_implicit_vdiff(grid, jnp.float64)
    var = jnp.zeros((grid.nvars,) + grid.spatial_shape, jnp.float64)
    k_v = jnp.full(grid.spatial_shape, 1.0e4)
    out = np.asarray(apply(var, k_v, 10.0))
    assert np.array_equal(out, np.zeros_like(out))


def test_backward_euler_decay_rate():
    """A single constrained vertical mode decays at the backward-Euler
    factor of its own eigenvalue: solving (I - ts L) phi1 = phi0 with
    phi0 an eigenvector of L (eigenvalue -lam) gives phi0/(1 + ts lam)."""
    gp = _grid_params(num_cells=4, zdim=16)
    grid = create_grid(gp, jnp.float64)
    p = gp
    nz = p.zDim
    d, wq = _flux_form_matrices(p)
    v = p.vars.index("s")
    K = 200.0
    L = -np.diag(1.0 / wq) @ d.T @ np.diag(wq * K) @ d
    w_eig, vecs = np.linalg.eig(L)
    # pick the most-negative real eigenvalue (fastest-decaying real mode)
    real = np.abs(w_eig.imag) < 1e-8 * np.abs(w_eig).max()
    j = int(np.argmin(np.where(real, w_eig.real, np.inf)))
    lam = -w_eig[j].real
    assert lam > 0.0
    mode = vecs[:, j].real
    apply = build_implicit_vdiff(grid, jnp.float64)
    var = np.zeros((grid.nvars,) + grid.spatial_shape)
    var[v] = mode[None, None, :]
    ts = 30.0
    out = np.asarray(
        apply(jnp.asarray(var), jnp.full(grid.spatial_shape, K), ts)
    )
    assert np.allclose(out[v], mode[None, None, :] / (1.0 + ts * lam),
                       atol=1e-9 * np.abs(mode).max())


def test_matches_explicit_in_stable_regime(tmp_path):
    """With constant K small enough for the explicit scheme, implicit
    and explicit vertical diffusion produce closely matching short
    trajectories (split-step backward Euler vs in-tendency AB3: O(ts)
    agreement)."""
    from scythe_tpu.io import read_physical_grid

    K = 20.0
    states = {}
    for ivd in (False, True):
        model = _model(tmp_path, ts=0.5, K=K,
                       extra_opts={"implicit_vdiff": ivd} if ivd else {})
        grid = create_grid(model.grid_params, jnp.float64)
        ctx = build_context(model, grid, jnp.float64)
        pts = grid.gridpoints()
        sh = grid.spatial_shape
        r = pts[:, 0].reshape(sh)
        z = pts[:, 2].reshape(sh)
        phys0 = np.zeros((grid.nvars,) + sh)
        # a smooth warm anomaly to diffuse
        phys0[0] = 3.0 * np.exp(-(((r - 50.0e3) / 20.0e3) ** 2
                                  + ((z - 5000.0) / 2000.0) ** 2))
        spec0 = grid.analysis(jnp.asarray(phys0))
        state = ti.initial_state(spec0, (grid.nvars,) + sh, jnp.float64)
        step = build_step(model, grid, ctx, jnp.float64)
        state = make_scan(step, 200)(state)  # 100 s
        states[ivd] = np.asarray(grid.synthesis(state.spec)["val"])
    a, b = states[False], states[True]
    assert np.isfinite(a).all() and np.isfinite(b).all()
    scale = np.abs(a[0]).max()
    assert scale > 0.1  # the anomaly survived
    assert np.abs(a[0] - b[0]).max() < 0.05 * scale


def test_stable_beyond_explicit_limit(tmp_path):
    """K far above the near-wall explicit diffusive limit: the explicit
    scheme blows up within 100 steps, the implicit one stays finite and
    damps the anomaly."""
    from scythe_tpu.io import read_physical_grid

    # near-wall dz ~ 10e3 * (pi/16)^2 / 2 ~ 190 m; explicit limit
    # K < ~0.05 dz^2/ts ~ 3.6e3 at ts=0.5.  Use 1e5.
    K = 1.0e5
    results = {}
    for ivd in (False, True):
        model = _model(tmp_path, ts=0.5, K=K,
                       extra_opts={"implicit_vdiff": True} if ivd else {})
        grid = create_grid(model.grid_params, jnp.float64)
        ctx = build_context(model, grid, jnp.float64)
        pts = grid.gridpoints()
        sh = grid.spatial_shape
        r = pts[:, 0].reshape(sh)
        z = pts[:, 2].reshape(sh)
        phys0 = np.zeros((grid.nvars,) + sh)
        phys0[0] = 3.0 * np.exp(-(((r - 50.0e3) / 20.0e3) ** 2
                                  + ((z - 5000.0) / 2000.0) ** 2))
        spec0 = grid.analysis(jnp.asarray(phys0))
        state = ti.initial_state(spec0, (grid.nvars,) + sh, jnp.float64)
        step = build_step(model, grid, ctx, jnp.float64)
        state = make_scan(step, 100)(state)
        results[ivd] = np.asarray(grid.synthesis(state.spec)["val"])
    assert not np.isfinite(results[False]).all()  # explicit blows up
    imp = results[True]
    assert np.isfinite(imp).all()
    # mixed toward the column mean (~1.06 = integral of the 3 K anomaly
    # over the 10 km column), never amplified
    assert np.abs(imp[0]).max() < 1.5


def test_rejects_unsupported_equation_set(tmp_path):
    gp = GridParameters(
        geometry="R", xmin=-50.0, xmax=50.0, num_cells=20,
        BCL={"u": BC.PERIODIC}, BCR={"u": BC.PERIODIC}, vars={"u": 1},
    )
    model = ModelParameters(
        ts=0.1, integration_time=1.0, output_interval=1.0,
        equation_set="LinearAdvection1D",
        initial_conditions=str(tmp_path / "x.csv"),
        output_dir=str(tmp_path), grid_params=gp,
        physical_params={"c_0": 1.0, "K": 0.0},
        options={"implicit_vdiff": True},
    )
    grid = create_grid(gp, jnp.float64)
    ctx = build_context(model, grid, jnp.float64)
    with pytest.raises(ValueError, match="implicit_vdiff"):
        build_step(model, grid, ctx, jnp.float64)


def test_kv_separate_vertical_diffusivity(tmp_path):
    """physical_params['K_v']: K_v = 0 must remove vertical diffusion
    (a z-structured anomaly persists) while K_v = K reproduces the
    isotropic default bitwise."""
    import dataclasses

    from scythe_tpu.io import read_physical_grid

    K = 2.0e3
    outs = {}
    for kv in (None, K, 0.0):
        model = _model(tmp_path, ts=0.5, K=K, extra_opts={})
        if kv is not None:
            model = dataclasses.replace(
                model, physical_params={**model.phys(), "K_v": kv}
            )
        grid = create_grid(model.grid_params, jnp.float64)
        ctx = build_context(model, grid, jnp.float64)
        sh = grid.spatial_shape
        z = grid.gridpoints()[:, 2].reshape(sh)
        phys0 = np.zeros((grid.nvars,) + sh)
        phys0[0] = 1.0 * np.exp(-(((z - 5000.0) / 1200.0) ** 2))
        spec0 = grid.analysis(jnp.asarray(phys0))
        state = ti.initial_state(spec0, (grid.nvars,) + sh, jnp.float64)
        step = build_step(model, grid, ctx, jnp.float64)
        state = make_scan(step, 40)(state)
        outs[kv] = np.asarray(grid.synthesis(state.spec)["val"])
    # K_v = K == isotropic default, bitwise
    assert np.array_equal(outs[None], outs[K])
    # K_v = 0 keeps more of the vertical anomaly's structure than K_v = K
    amp_iso = np.abs(outs[K][0]).max()
    amp_kv0 = np.abs(outs[0.0][0]).max()
    assert np.isfinite(amp_kv0) and amp_kv0 > amp_iso * 1.02
