"""Active rain sedimentation (``options['sedimentation'] = 'active'``).

The reference's terminal-velocity formula is clamped to always-zero
(quirk, reproduced by default).  The 'active' option restores the
unclamped (downward) Ooyama fall speed with the sedimentation flux
differentiated under an F(top) = 0 constraint (grids/base.py
column_flux_derivative — the unconstrained fit rings explosively at the
model top, docs/RESULTS.md).

Deterministic rain-shaft test on RZ rainfall_test: a rain blob aloft in
a quiet, dry-stable atmosphere must (a) fall at the formula's terminal
velocity and (b) leave the column through the floor, reducing total rain
mass; with the default quirk it must stay put.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from scythe_tpu import BC, ZBC, GridParameters, ModelParameters, create_grid
from scythe_tpu import timeintegration as ti
from scythe_tpu.model import build_context, build_step, make_scan
from scythe_tpu.physics import microphysics as mp
from scythe_tpu.physics import thermodynamics as td


def _setup(tmp_path, sedimentation):
    zs = np.linspace(0.0, 12000.0, 50)
    theta = 300.0 + 0.004 * zs
    qv = 0.5 * np.exp(-zs / 2500.0)  # very dry: no condensation physics
    snd = tmp_path / "snd.txt"
    with open(snd, "w") as f:
        f.write(f"1000.0 {theta[0]} {qv[0]}\n")
        for z, th, q in zip(zs[1:], theta[1:], qv[1:]):
            f.write(f"{z} {th} {q}\n")
    gp = GridParameters(
        geometry="RZ",
        xmin=0.0,
        xmax=10000.0,
        num_cells=10,
        zmin=0.0,
        zmax=10000.0,
        zDim=40,
        BCL={"u": BC.R1T0, "w": BC.R1T1},
        BCR={"u": BC.R1T0},
        vars={"s": 1, "xi": 2, "mu": 3, "u": 4, "w": 5, "mu_c": 6,
              "mu_r": 7, "qss": 8},
    )
    opts = {"semiimplicit": True}
    if sedimentation:
        opts["sedimentation"] = sedimentation
    model = ModelParameters(
        ts=0.2,
        integration_time=120.0,
        output_interval=120.0,
        equation_set="rainfall_test",
        initial_conditions="unused",
        output_dir=str(tmp_path / "out"),
        ref_state_file=str(snd),
        grid_params=gp,
        physical_params={"K": 5.0},
        options=opts,
    )
    dtype = jnp.float64
    grid = create_grid(gp, dtype)
    ctx = build_context(model, grid, dtype)
    pts = grid.gridpoints()
    z = pts[:, 1].reshape(grid.spatial_shape)
    # rain blob: q_r up to 1 g/kg centered at z = 2 km, uniform in x
    q_r0 = 1.0e-3 * np.exp(-(((z - 2000.0) / 600.0) ** 2))
    phys0 = np.zeros((gp.nvars,) + grid.spatial_shape)
    phys0[6] = np.asarray(td.bhyp(jnp.asarray(q_r0)))
    spec0 = grid.analysis(jnp.asarray(phys0, dtype))
    state = ti.initial_state(spec0, (gp.nvars,) + grid.spatial_shape, dtype)
    step = build_step(model, grid, ctx, dtype)
    return model, grid, ctx, state, step


def _qr_profile(grid, state):
    phys = np.asarray(grid.synthesis(state.spec)["val"])
    q_r = np.asarray(td.ahyp(jnp.asarray(phys[6])))
    return q_r.mean(axis=0), phys  # [nz] column-mean


def test_active_sedimentation_rain_falls_and_exits(tmp_path):
    model, grid, ctx, state, step = _setup(tmp_path, "active")
    z = np.asarray(grid.z_mish)
    prof0, _ = _qr_profile(grid, state)
    zc0 = (prof0 * z).sum() / prof0.sum()
    mass0 = prof0.sum()
    # expected fall speed at q_r = 1 g/kg, rho ~ 0.6 at 6 km: several m/s
    vt = float(
        mp.sedimentation_active(jnp.asarray(1.0e-3), 0.6, 280.0)
    )
    assert vt < -3.0, vt

    state = make_scan(step, 300)(state)  # 60 s
    prof1, phys = _qr_profile(grid, state)
    assert np.isfinite(phys).all()
    zc1 = (prof1 * z).sum() / prof1.sum()
    drop = (zc0 - zc1) / 60.0
    # centroid falls at the formula's terminal velocity (measured ~6 m/s)
    assert 3.0 < drop < 9.0, (zc0, zc1, drop)

    state = make_scan(step, 2100)(state)  # to t = 480 s
    prof2, phys = _qr_profile(grid, state)
    assert np.isfinite(phys).all()
    # the rain has reached the floor and drained out of the domain
    # (measured timeline: pools at the surface ~t=300, then mass falls
    # 6.65e-3 -> 1.24e-3 by t=480)
    assert prof2.sum() < 0.6 * mass0, (prof2.sum(), mass0)
    zc2 = (prof2 * z).sum() / max(prof2.sum(), 1e-12)
    assert zc2 < 500.0, zc2


def test_reference_quirk_rain_stays(tmp_path):
    model, grid, ctx, state, step = _setup(tmp_path, None)
    z = np.asarray(grid.z_mish)
    prof0, _ = _qr_profile(grid, state)
    zc0 = (prof0 * z).sum() / prof0.sum()
    state = make_scan(step, 300)(state)  # 60 s
    prof1, phys = _qr_profile(grid, state)
    assert np.isfinite(phys).all()
    zc1 = (prof1 * z).sum() / prof1.sum()
    # the always-zero quirk: no sedimentation, centroid stays (evaporation
    # in the dry environment may shrink mass, but nothing falls)
    assert abs(zc1 - zc0) < 100.0, (zc0, zc1)
