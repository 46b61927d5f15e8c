"""Moist benchmark smoke tests (BF02_test, rainfall_test) and stepper order."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from scythe_tpu import BC, GridParameters, ModelParameters, create_grid
from scythe_tpu import timeintegration as ti


def _write_sounding(path, zmax=10000.0):
    zs = np.linspace(0.0, zmax * 1.2, 50)
    theta = 300.0 + 0.003 * zs
    qv = 14.0 * np.exp(-zs / 2500.0)
    with open(path, "w") as f:
        f.write(f"1015.0 {theta[0]} {qv[0]}\n")
        for z, th, q in zip(zs[1:], theta[1:], qv[1:]):
            f.write(f"{z} {th} {q}\n")
    return path


def _moist_model(tmp_path, eqset, vars_, ts=0.2):
    gp = GridParameters(
        geometry="RZ",
        xmin=0.0,
        xmax=10000.0,
        num_cells=20,
        zmin=0.0,
        zmax=10000.0,
        zDim=30,
        BCL={"u": BC.R1T0, "w": BC.R1T1},
        BCR={"u": BC.R1T0},
        vars=vars_,
    )
    return ModelParameters(
        ts=ts,
        integration_time=30.0,
        output_interval=30.0,
        equation_set=eqset,
        initial_conditions=str(tmp_path / "ics.csv"),
        output_dir=str(tmp_path / "out"),
        ref_state_file=_write_sounding(str(tmp_path / "sounding.txt")),
        grid_params=gp,
        physical_params={"K": 5.0},
        options={"semiimplicit": True},
    )


def _write_bubble_ics(model):
    grid = create_grid(model.grid_params, jnp.float64)
    pts = grid.gridpoints()
    r, z = pts[:, 0], pts[:, 1]
    rad = np.sqrt((r / 2000.0) ** 2 + ((z - 2000.0) / 2000.0) ** 2)
    s_pert = 3.0 * np.maximum(0.0, np.cos(np.pi * np.minimum(rad, 1.0) / 2.0)) ** 2
    names = list(model.grid_params.vars)
    with open(model.initial_conditions, "w") as f:
        f.write("r,z," + ",".join(names) + "\n")
        for i in range(len(r)):
            vals = {"s": s_pert[i]}
            f.write(
                f"{r[i]},{z[i]},"
                + ",".join(str(vals.get(n, 0.0)) for n in names)
                + "\n"
            )


def test_bf02_moist_bubble(tmp_path):
    # N_c=500 makes the condensation relaxation stiffer than the
    # rainfall set's N_c=100; ts=0.1 respects the explicit stiffness limit
    model = _moist_model(
        tmp_path,
        "BF02_test",
        {"s": 1, "xi": 2, "mu": 3, "u": 4, "w": 5, "mu_l": 6, "qss": 7},
        ts=0.1,
    )
    _write_bubble_ics(model)
    from scythe_tpu import integrate_model

    grid, phys = integrate_model(model, write_outputs=False)
    assert np.isfinite(phys).all()
    assert phys[4].max() > 0.01  # bubble rises


def test_rainfall_warm_rain(tmp_path):
    model = _moist_model(
        tmp_path,
        "rainfall_test",
        {"s": 1, "xi": 2, "mu": 3, "u": 4, "w": 5, "mu_c": 6, "mu_r": 7, "qss": 8},
    )
    _write_bubble_ics(model)
    from scythe_tpu import integrate_model

    grid, phys = integrate_model(model, write_outputs=False)
    assert np.isfinite(phys).all()


# ----------------------------------------------------------------------
# Stepper order of accuracy on a scalar ODE y' = lambda y


def test_ab3_order_of_accuracy():
    """Third order in the AB3 regime: start from the exact multistep
    history so the first-order Euler/AB2 bootstrap (ref
    semiimplicit.jl:682-696, which caps whole-run global order at ~2)
    doesn't mask the asymptotic order."""
    lam = -0.7

    def run(ts, n):
        y = jnp.asarray([[np.exp(2 * lam * ts)]])  # y at t=2*ts
        e1 = jnp.asarray([[lam * np.exp(lam * ts)]])  # f at t=ts
        e2 = jnp.asarray([[lam]])  # f at t=0
        for t in range(3, n + 3):
            f = lam * y
            y, e1, e2 = ti.explicit_step(y, f, e1, e2, jnp.asarray(t), ts)
        return float(y[0, 0])

    errs = []
    for n in (40, 80, 160):
        ts = 1.0 / n
        exact = np.exp(lam * (n + 2) * ts)
        errs.append(abs(run(ts, n) - exact))
    order1 = np.log2(errs[0] / errs[1])
    order2 = np.log2(errs[1] / errs[2])
    assert order1 > 2.7 and order2 > 2.7, (errs, order1, order2)


def test_startup_ramp_is_second_order_overall():
    """With the cold start the global order drops to ~2 — the documented
    behavior of the reference's Euler/AB2/AB3 ramp."""
    lam = -0.7

    def run(ts, n):
        y = jnp.asarray([[1.0]])
        e1 = jnp.zeros_like(y)
        e2 = jnp.zeros_like(y)
        for t in range(1, n + 1):
            f = lam * y
            y, e1, e2 = ti.explicit_step(y, f, e1, e2, jnp.asarray(t), ts)
        return float(y[0, 0])

    exact = np.exp(lam)
    errs = [abs(run(1.0 / n, n) - exact) for n in (40, 80, 160)]
    order = np.log2(errs[0] / errs[1])
    assert 1.7 < order < 3.2, (errs, order)


def test_explicit_increment_weights():
    """explicit_increment adds incr with the current AB leading weight."""
    y = jnp.asarray([[2.0]])
    incr = jnp.asarray([[1.0]])
    ts = 0.1
    assert np.isclose(float(ti.explicit_increment(y, incr, jnp.asarray(1), ts)[0, 0]), 2.0 + 0.1)
    assert np.isclose(
        float(ti.explicit_increment(y, incr, jnp.asarray(2), ts)[0, 0]), 2.0 + 0.15
    )
    assert np.isclose(
        float(ti.explicit_increment(y, incr, jnp.asarray(5), ts)[0, 0]),
        2.0 + 0.1 * 23.0 / 12.0,
    )


def test_slim_impdot_history_bitwise_identical(tmp_path):
    """The slim [w, xi] implicit-history layout (ti.initial_state
    imp_rows=2 — the production carry-cost optimization, round 5) must
    reproduce the full-width trajectory BITWISE: the AI2* corrector
    reads exactly those rows either way."""
    model = _moist_model(
        tmp_path,
        "rainfall_test",
        {"s": 1, "xi": 2, "mu": 3, "u": 4, "w": 5, "mu_c": 6, "mu_r": 7,
         "qss": 8},
    )
    _write_bubble_ics(model)
    from scythe_tpu.model import build_context, build_step
    from scythe_tpu import io as sio

    grid = create_grid(model.grid_params, jnp.float64)
    ctx = build_context(model, grid, jnp.float64)
    phys0 = sio.read_physical_grid(model.initial_conditions, grid)
    spec0 = grid.analysis(jnp.asarray(phys0))
    step = build_step(model, grid, ctx, jnp.float64)
    shape = (grid.nvars,) + grid.spatial_shape
    s_full = ti.initial_state(spec0, shape, jnp.float64)
    s_slim = ti.initial_state(spec0, shape, jnp.float64, imp_rows=2)
    assert s_slim.impdot_nm1.shape[0] == 2
    for _ in range(20):
        s_full = step(s_full)
        s_slim = step(s_slim)
    assert np.array_equal(np.asarray(s_full.spec), np.asarray(s_slim.spec))
    vi = grid.params.var_index
    assert np.array_equal(
        np.asarray(s_full.impdot_nm1)[[vi("w"), vi("xi")]],
        np.asarray(s_slim.impdot_nm1),
    )


def test_slim_impdot_requires_semiimplicit(tmp_path):
    """imp_rows=2 without options['semiimplicit'] is rejected at trace
    time (the slim layout's rows are only defined by the AI2* pair)."""
    import dataclasses

    model = _moist_model(
        tmp_path,
        "rainfall_test",
        {"s": 1, "xi": 2, "mu": 3, "u": 4, "w": 5, "mu_c": 6, "mu_r": 7,
         "qss": 8},
    )
    model = dataclasses.replace(model, options={})
    _write_bubble_ics(model)
    from scythe_tpu.model import build_context, build_step
    from scythe_tpu import io as sio

    grid = create_grid(model.grid_params, jnp.float64)
    ctx = build_context(model, grid, jnp.float64)
    phys0 = sio.read_physical_grid(model.initial_conditions, grid)
    spec0 = grid.analysis(jnp.asarray(phys0))
    step = build_step(model, grid, ctx, jnp.float64)
    shape = (grid.nvars,) + grid.spatial_shape
    s_slim = ti.initial_state(spec0, shape, jnp.float64, imp_rows=2)
    with pytest.raises(ValueError, match="slim impdot"):
        step(s_slim)
